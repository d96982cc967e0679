"""Single-buffer parameter packing for low-overhead dispatch.

Through the axon TPU tunnel, every OUTPUT device buffer of a jit call
(and every ``device_put``) pays ~0.3-1.5 s of materialization overhead —
independent of size and NOT covered by the compilation cache (measured:
a cached 200-output program still takes ~150-300 s to materialize, while
the same bytes as one buffer take ~2 s; BASELINE.md round 3). A model
init returning ~700 parameter leaves therefore dominates serving warmup.

``PackedParams`` stores a whole parameter pytree as ONE buffer per
dtype. Creation is O(#dtypes) buffers; consumers unpack (static row
slice + reshape) INSIDE their jit trace, where it costs nothing. Every
jitted model entry point calls ``maybe_unpack(params)`` first, so packed
and plain pytrees are interchangeable at the API surface.

Layout note: buffers are explicit 2-D ``[rows, 128]`` arrays with every
leaf's start offset aligned to a row boundary. A flat 1-D buffer of
~640M elements trips XLA's TPU layout normalization into a ``[N/4, 4]``
shape whose 4-wide minor dim pads to the 128 lane tile — a 32x HBM blow
up that aborts compilation (measured: a 1.28 GB ViT-H buffer "needs"
41 GB). Row slices of a ``[R, 128]`` array are layout-preserving.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

_LANE = 128


class PackSpec:
    """Static (hashable) description of a packed pytree."""

    __slots__ = ("treedef", "entries", "group_names", "group_rows")

    def __init__(self, treedef, entries: Tuple, group_names: Tuple[str, ...],
                 group_rows: Tuple[int, ...]):
        self.treedef = treedef
        # per leaf: (group_idx, row_offset, shape, dtype_name)
        self.entries = entries
        self.group_names = group_names
        self.group_rows = group_rows

    def __hash__(self):
        return hash((self.treedef, self.entries, self.group_names,
                     self.group_rows))

    def __eq__(self, other):
        return (isinstance(other, PackSpec)
                and self.treedef == other.treedef
                and self.entries == other.entries
                and self.group_names == other.group_names
                and self.group_rows == other.group_rows)


@jax.tree_util.register_pytree_node_class
class PackedParams:
    """A parameter pytree flattened to one [rows, 128] buffer per dtype
    (a pytree itself: jit-transparent, shardable, donatable)."""

    def __init__(self, buffers: Tuple, spec: PackSpec):
        self.buffers = tuple(buffers)
        self.spec = spec

    def tree_flatten(self):
        return self.buffers, self.spec

    @classmethod
    def tree_unflatten(cls, spec, buffers):
        return cls(buffers, spec)


def _leaf_rows(shape) -> int:
    n = int(np.prod(shape)) if shape else 1
    return -(-n // _LANE)


def make_spec(tree) -> PackSpec:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    row_off = {}
    names = []
    entries = []
    for leaf in leaves:
        dt = jnp.dtype(leaf.dtype).name
        if dt not in row_off:
            row_off[dt] = 0
            names.append(dt)
        gi = names.index(dt)
        entries.append((gi, row_off[dt],
                        tuple(int(s) for s in leaf.shape), dt))
        row_off[dt] += _leaf_rows(leaf.shape)
    return PackSpec(treedef, tuple(entries), tuple(names),
                    tuple(row_off[n] for n in names))


def _pad_flat(flat, rows):
    n = flat.shape[0]
    target = rows * _LANE
    if target != n:
        flat = jnp.pad(flat, (0, target - n))
    return flat.reshape(rows, _LANE)


def pack(tree) -> PackedParams:
    """Pack a pytree of (device or traced) arrays. Call this INSIDE a jit
    (e.g. around an init function) so the packed buffer is the only
    materialized output."""
    spec = make_spec(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    parts = [[] for _ in spec.group_names]
    for leaf, (gi, _, shape, _) in zip(leaves, spec.entries):
        parts[gi].append(_pad_flat(jnp.ravel(leaf), _leaf_rows(shape)))
    buffers = tuple(jnp.concatenate(p, axis=0) if len(p) > 1 else p[0]
                    for p in parts)
    return PackedParams(buffers, spec)


def pack_host(tree) -> PackedParams:
    """Pack a pytree of HOST numpy arrays (e.g. a loaded checkpoint) and
    upload it in one ``device_put`` per dtype — instead of one per leaf."""
    spec = make_spec(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    parts = [[] for _ in spec.group_names]
    for leaf, (gi, _, shape, dt) in zip(leaves, spec.entries):
        flat = np.ravel(np.asarray(leaf))
        rows = _leaf_rows(shape)
        if rows * _LANE != flat.shape[0]:
            flat = np.pad(flat, (0, rows * _LANE - flat.shape[0]))
        parts[gi].append(flat.reshape(rows, _LANE))
    buffers = tuple(jax.device_put(np.concatenate(p, axis=0)
                                   if len(p) > 1 else p[0])
                    for p in parts)
    return PackedParams(buffers, spec)


def unpack(packed: PackedParams):
    """Rebuild the original pytree from the packed buffers (static row
    slices + reshapes — free inside a jit trace; avoid calling it eagerly
    on device arrays, which would materialize every leaf)."""
    spec = packed.spec
    leaves = []
    for gi, row_off, shape, _ in spec.entries:
        n = int(np.prod(shape)) if shape else 1
        rows = _leaf_rows(shape)
        block = jax.lax.slice(packed.buffers[gi],
                              (row_off, 0), (row_off + rows, _LANE))
        flat = block.reshape(rows * _LANE)
        if n != rows * _LANE:
            flat = jax.lax.slice(flat, (0,), (n,))
        leaves.append(flat.reshape(shape))
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)


def maybe_unpack(params):
    """Jitted model entry points call this first, making PackedParams and
    plain pytrees interchangeable."""
    if isinstance(params, PackedParams):
        return unpack(params)
    return params


def packed_init(init_fn, key) -> PackedParams:
    """Run ``init_fn(key)`` under one jit whose only outputs are the
    packed buffers — O(#dtypes) device buffers instead of one per leaf.
    The key stays a jit ARGUMENT so the random generation is not
    constant-folded into the executable."""
    return jax.jit(lambda k: pack(init_fn(k)))(key)
