"""Multi-host initialization (jax.distributed) — SURVEY §5.8 / §2.7.

The reference has no distributed layer at all (single CUDA device, no
NCCL/MPI). On TPU pods, multi-host runs need exactly one extra step:
``jax.distributed.initialize()`` before first JAX use, after which
``jax.devices()`` spans the whole slice and every mesh built by
parallel/mesh.py (and therefore every sharded path in this framework —
extraction DP, sharded-database kNN, dp×tp training) scales across hosts
with XLA collectives riding ICI/DCN automatically.

Typical pod usage (each host runs the same program):

    from revisit_anything_tpu.parallel import initialize_multihost
    initialize_multihost()                     # TPU pod: all-automatic
    mesh = make_mesh()                         # global-device mesh

On GPU/CPU clusters pass coordinator_address/num_processes/process_id
explicitly (mirrors jax.distributed.initialize's contract).
"""

from __future__ import annotations

from typing import Optional


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         local_device_ids=None) -> bool:
    """Initialize jax.distributed for multi-host execution.

    On TPU pods every argument auto-detects from the environment. Returns
    True when initialization ran, False when it was skipped because the
    runtime is already initialized (idempotent — safe to call from every
    entry point).
    """
    import jax

    if jax.distributed.is_initialized():
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return True


def process_info():
    """(process_index, process_count, local_device_count, global_device
    count) of the current runtime — host-sharding decisions (e.g. which
    image shard this host extracts) key off these."""
    import jax
    return (jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count())


def host_shard(n_items: int) -> slice:
    """The contiguous [start, stop) slice of a length-``n_items`` work
    list owned by this host: multi-host extraction splits the image list
    per host, then data_parallel_apply splits each host's share over its
    local devices."""
    import jax
    pi, pc = jax.process_index(), jax.process_count()
    per = -(-n_items // pc)
    return slice(pi * per, min((pi + 1) * per, n_items))
