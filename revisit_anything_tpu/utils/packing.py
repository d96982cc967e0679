"""Single-buffer parameter packing for low-overhead dispatch.

Through the axon TPU tunnel, every OUTPUT device buffer of a jit call
(and every ``device_put``) pays ~0.3-1.5 s of materialization overhead —
independent of size and NOT covered by the compilation cache (measured:
a cached 200-output program still takes ~150-300 s to materialize, while
the same bytes as one buffer take ~2 s; BASELINE.md round 3). A model
init returning ~700 parameter leaves therefore dominates serving warmup.

``PackedParams`` stores a whole parameter pytree as ONE flat device
buffer per dtype. Creation is O(#dtypes) buffers; consumers unpack
(static slice + reshape) INSIDE their jit trace, where it costs nothing.
Every jitted model entry point calls ``maybe_unpack(params)`` first, so
packed and plain pytrees are interchangeable at the API surface.
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class PackSpec:
    """Static (hashable) description of a packed pytree."""

    __slots__ = ("treedef", "entries", "group_names", "group_sizes")

    def __init__(self, treedef, entries: Tuple, group_names: Tuple[str, ...],
                 group_sizes: Tuple[int, ...]):
        self.treedef = treedef
        self.entries = entries          # per leaf: (group_idx, offset, shape, dtype_name)
        self.group_names = group_names
        self.group_sizes = group_sizes

    def __hash__(self):
        return hash((self.treedef, self.entries, self.group_names,
                     self.group_sizes))

    def __eq__(self, other):
        return (isinstance(other, PackSpec)
                and self.treedef == other.treedef
                and self.entries == other.entries
                and self.group_names == other.group_names
                and self.group_sizes == other.group_sizes)


@jax.tree_util.register_pytree_node_class
class PackedParams:
    """A parameter pytree flattened to one buffer per dtype (a pytree
    itself: jit-transparent, shardable, donatable)."""

    def __init__(self, buffers: Tuple, spec: PackSpec):
        self.buffers = tuple(buffers)
        self.spec = spec

    def tree_flatten(self):
        return self.buffers, self.spec

    @classmethod
    def tree_unflatten(cls, spec, buffers):
        return cls(buffers, spec)


def make_spec(tree) -> PackSpec:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    offsets = {}
    names = []
    entries = []
    for leaf in leaves:
        dt = jnp.dtype(leaf.dtype).name
        if dt not in offsets:
            offsets[dt] = 0
            names.append(dt)
        gi = names.index(dt)
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        entries.append((gi, offsets[dt], tuple(int(s) for s in leaf.shape),
                        dt))
        offsets[dt] += n
    return PackSpec(treedef, tuple(entries), tuple(names),
                    tuple(offsets[n] for n in names))


def pack(tree) -> PackedParams:
    """Pack a pytree of (device or traced) arrays. Call this INSIDE a jit
    (e.g. around an init function) so the packed buffer is the only
    materialized output."""
    spec = make_spec(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    parts = [[] for _ in spec.group_names]
    for leaf, (gi, _, _, _) in zip(leaves, spec.entries):
        parts[gi].append(jnp.ravel(leaf))
    buffers = tuple(jnp.concatenate(p) if len(p) > 1 else p[0]
                    for p in parts)
    return PackedParams(buffers, spec)


def pack_host(tree) -> PackedParams:
    """Pack a pytree of HOST numpy arrays (e.g. a loaded checkpoint) and
    upload it in one ``device_put`` per dtype — instead of one per leaf."""
    spec = make_spec(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    parts = [[] for _ in spec.group_names]
    for leaf, (gi, _, _, _) in zip(leaves, spec.entries):
        parts[gi].append(np.ravel(np.asarray(leaf)))
    buffers = tuple(jax.device_put(np.concatenate(p) if len(p) > 1
                                   else p[0])
                    for p in parts)
    return PackedParams(buffers, spec)


def unpack(packed: PackedParams):
    """Rebuild the original pytree from the packed buffers (static slices
    + reshapes — free inside a jit trace; avoid calling it eagerly on
    device arrays, which would materialize every leaf)."""
    spec = packed.spec
    leaves = []
    for gi, off, shape, _ in spec.entries:
        n = int(np.prod(shape)) if shape else 1
        leaves.append(jax.lax.slice(packed.buffers[gi], (off,),
                                    (off + n,)).reshape(shape))
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
