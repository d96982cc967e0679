"""Mosaic compile sweep: lower+compile every production Pallas-bearing
program at every production shape on the REAL TPU backend.

Why (round-4 verdict item 3): interpret-mode CPU tests cannot catch
Mosaic lane-constraint violations — the r3 pad-row skip shipped a broken
kernel exactly this way (ops/maskhead._pick_block; CLAUDE.md gotcha).
This sweep converts that convention ("probe shape-changing kernels on
real TPU") into a check: for each unique production shape derived from
config.DATASETS it compiles

  - encode_image           (flash attention kernel; one fixed 1024² shape)
  - _decode_batch          (decode_fused / decode_probs / maskhead /
                            maskresize kernels; per (input_hw, sam_hw)
                            with the TPU gh lane rounding applied inside)
  - _dino_desc_device      (DINO attention kernel; per dataset crop)

using ABSTRACT inputs (jax.eval_shape → ShapeDtypeStruct): nothing is
materialized on the chip, so the sweep never competes for HBM and can
run alongside a resident serving process — it costs only compile-server
time. Fresh shapes take 20-400 s each through the tunnel (CLAUDE.md);
cached ones are instant, so re-runs are cheap.

Exit 0 with a one-line JSON summary on success; exit 1 listing every
program that failed to lower/compile.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/compile_sweep.py
        [--stages encode,decode,dino] [--bsz 1024]
"""

import argparse
import json
import sys
import time

from _ab_common import retry


def _wait_for_backend():
    """Bounded SUBPROCESS probe (a failed in-process init is cached by
    jax's backend registry — CLAUDE.md)."""
    import subprocess
    probe = ("import jax; d = jax.devices(); "
             "assert d and d[0].platform == 'tpu', d")
    for attempt in range(8):
        try:
            subprocess.run([sys.executable, "-c", probe], check=True,
                           capture_output=True, timeout=300)
            return True
        except Exception as e:                           # noqa: BLE001
            print(f"[sweep] backend probe failed ({type(e).__name__}); "
                  f"retry {attempt + 1}/8 in 30s", flush=True)
            time.sleep(30)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="encode,decode,dino")
    ap.add_argument("--bsz", type=int, default=1024,
                    help="decode prompt batch (production: 1024)")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    if not _wait_for_backend():
        print("[sweep] no TPU backend available; aborting", flush=True)
        sys.exit(2)

    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.config import DATASETS
    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.models.sam import SAM_VIT_H, init_sam_params
    from revisit_anything_tpu.models.sam.amg import (AmgConfig,
                                                     _decode_batch,
                                                     resize_longest_side)
    from revisit_anything_tpu.models.sam.encoder import encode_image
    from revisit_anything_tpu.models.sam.prompt import (
        dense_positional_embedding)
    from revisit_anything_tpu.pipeline.serve import _dino_desc_device
    from revisit_anything_tpu.utils.packing import pack

    assert jax.default_backend() == "tpu", jax.default_backend()
    cfg = SAM_VIT_H
    f32 = jnp.float32

    # --- abstract inputs: zero device bytes ---
    sam_abs = jax.eval_shape(lambda: pack(init_sam_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)))
    dino_abs = jax.eval_shape(lambda: pack(dn.init_params(
        dn.VIT_G14, jax.random.PRNGKey(1), dtype=jnp.bfloat16)))
    pre_abs = jax.ShapeDtypeStruct(
        (1, cfg.image_size, cfg.image_size, 3), f32)
    emb_abs = jax.eval_shape(
        lambda p, x: encode_image(p, cfg, x)[0], sam_abs, pre_abs)
    pe_abs = jax.eval_shape(
        lambda p: dense_positional_embedding(p, cfg)[0], sam_abs)
    pts_abs = jax.ShapeDtypeStruct((args.bsz, 2), f32)
    amg = AmgConfig(points_per_batch=args.bsz,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)

    # --- unique production shapes from the dataset table ---
    decode_shapes = {}
    dino_shapes = {}
    for ds in DATASETS.values():
        sam_hw = ds.sam_size.hw
        input_hw = resize_longest_side(sam_hw[0], sam_hw[1], cfg.image_size)
        decode_shapes.setdefault((input_hw, sam_hw), []).append(ds.name)
        h, w = ds.size.hw
        hn, wn = (h // 14) * 14, (w // 14) * 14
        top, left = dn.center_crop_offsets(h, w, hn, wn)
        dino_shapes.setdefault(((h, w), (top, left, hn, wn)),
                               []).append(ds.name)

    programs = []
    if "encode" in stages:
        programs.append((
            "encode_image[1024²]",
            lambda: encode_image.lower(sam_abs, cfg, pre_abs).compile()))
    if "decode" in stages:
        for (input_hw, sam_hw), names in sorted(decode_shapes.items()):
            programs.append((
                f"_decode_batch[b={args.bsz} in={input_hw} "
                f"orig={sam_hw}] ({','.join(names)})",
                lambda ihw=input_hw, shw=sam_hw: _decode_batch.lower(
                    sam_abs, cfg, emb_abs, pe_abs, pts_abs, ihw, shw,
                    amg).compile()))
    if "dino" in stages:
        for ((h, w), crop), names in sorted(dino_shapes.items()):
            img_abs = jax.ShapeDtypeStruct((h, w, 3), jnp.uint8)
            programs.append((
                f"_dino_desc_device[{h}x{w} crop={crop}] "
                f"({','.join(names)})",
                lambda ia=img_abs, c=crop: _dino_desc_device.lower(
                    dino_abs, dn.VIT_G14, ia, 31, "value", c).compile()))

    failures = []
    timings = {}
    for name, fn in programs:
        t0 = time.perf_counter()
        try:
            # compile-server drops long compiles under co-tenant load
            # ("Broken pipe"); retry is mandatory (CLAUDE.md)
            retry(f"compile {name}", fn, attempts=3, sleep_s=30)
            dt = time.perf_counter() - t0
            timings[name] = round(dt, 1)
            print(f"[sweep] OK   {name}  ({dt:.1f}s)", flush=True)
        except Exception as e:                           # noqa: BLE001
            dt = time.perf_counter() - t0
            failures.append((name, str(e).splitlines()[0][:200]))
            print(f"[sweep] FAIL {name}  ({dt:.1f}s)\n        "
                  f"{failures[-1][1]}", flush=True)

    print(json.dumps({
        "metric": "mosaic_compile_sweep",
        "programs": len(programs),
        "failures": [n for n, _ in failures],
        "compile_s": timings,
    }))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
