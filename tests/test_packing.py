"""PackedParams (utils/packing.py): round-trip + model-surface tests."""

import numpy as np

import jax
import jax.numpy as jnp

from revisit_anything_tpu.utils.packing import (PackedParams, maybe_unpack,
                                                pack, pack_host,
                                                packed_init, unpack)


def test_pack_unpack_roundtrip(rng):
    tree = {
        "a": jnp.asarray(rng.standard_normal((3, 5)), jnp.float32),
        "b": [jnp.asarray(rng.standard_normal((2,)), jnp.float32),
              {"c": jnp.asarray(rng.integers(0, 9, (4, 1)), jnp.int32),
               "none": None}],
        "d": jnp.asarray(rng.standard_normal((7,)), jnp.bfloat16),
    }
    packed = pack(tree)
    assert len(packed.buffers) == 3          # f32, i32, bf16 groups
    out = unpack(packed)
    for orig, rec in zip(jax.tree_util.tree_leaves(tree),
                         jax.tree_util.tree_leaves(out)):
        assert orig.dtype == rec.dtype
        np.testing.assert_array_equal(np.asarray(orig), np.asarray(rec))
    # structure (incl. the None) survives
    assert out["b"][1]["none"] is None


def test_pack_host_matches_device_pack(rng):
    tree = {"w": rng.standard_normal((4, 4)).astype(np.float32),
            "b": rng.standard_normal((4,)).astype(np.float32)}
    ph = pack_host(tree)
    pd = pack(jax.tree_util.tree_map(jnp.asarray, tree))
    np.testing.assert_array_equal(np.asarray(ph.buffers[0]),
                                  np.asarray(pd.buffers[0]))
    rec = unpack(ph)
    np.testing.assert_array_equal(np.asarray(rec["w"]), tree["w"])


def test_packed_params_through_model_surface(rng):
    """encode_image / decode path accept PackedParams and produce the
    same outputs as the plain pytree."""
    from revisit_anything_tpu.models.sam import (SamArchConfig,
                                                 encode_image,
                                                 init_sam_params)
    cfg = SamArchConfig(encoder_dim=64, encoder_depth=2, encoder_heads=4,
                        global_attn_indexes=(1,), image_size=128,
                        patch_size=16, window_size=4, prompt_dim=32,
                        decoder_heads=4, decoder_mlp_dim=128,
                        iou_head_hidden=32)
    params = init_sam_params(cfg, jax.random.PRNGKey(0))
    packed = jax.jit(pack)(params)
    assert isinstance(maybe_unpack(packed), dict)
    imgs = jnp.asarray(rng.standard_normal((1, 128, 128, 3)), jnp.float32)
    out_plain = np.asarray(encode_image(params, cfg, imgs))
    out_packed = np.asarray(encode_image(packed, cfg, imgs))
    np.testing.assert_array_equal(out_plain, out_packed)


def test_packed_init_matches_plain_init():
    from revisit_anything_tpu.models.sam import (SamArchConfig,
                                                 init_sam_params)
    cfg = SamArchConfig(encoder_dim=64, encoder_depth=2, encoder_heads=4,
                        global_attn_indexes=(1,), image_size=128,
                        patch_size=16, window_size=4, prompt_dim=32,
                        decoder_heads=4, decoder_mlp_dim=128,
                        iou_head_hidden=32)
    key = jax.random.PRNGKey(3)
    plain = init_sam_params(cfg, key)
    packed = packed_init(lambda k: init_sam_params(cfg, k), key)
    assert isinstance(packed, PackedParams)
    rec = unpack(packed)
    for a, b in zip(jax.tree_util.tree_leaves(plain),
                    jax.tree_util.tree_leaves(rec)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
