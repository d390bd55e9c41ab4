"""Multi-host (multi-process) training support.

The reference is strictly single-device (no torch.distributed anywhere in
`ziggy/`); this layer is the TPU-native scale-out story for pod slices:
one Python process per host, `jax.distributed.initialize` to join the
cluster, a GLOBAL mesh spanning every process's devices, and
process-local data shards assembled into global sharded arrays.  All of
`parallel/dp.py` / `parallel/mp.py` then runs unchanged: jit'd collectives
ride ICI within a host slice and DCN across hosts — XLA picks the routes
from the mesh's device order; nothing here speaks NCCL/MPI.

Usage on a pod slice (one process per host):

    from hipgp_tpu.parallel import multihost
    multihost.initialize()                # env-autodetected on TPU pods
    mesh = multihost.global_mesh(("dp",))
    xg = multihost.global_batch(mesh, x_local)   # local shard -> global array
    ...dp_batch_solve(model, state, xg, ...)

CPU testing: the same entry points drive N local processes with
`initialize(coordinator, num_processes=N, process_id=i)` and
`--xla_force_host_platform_device_count` workers per process —
exercised end-to-end by tests/test_multihost.py.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "initialize",
    "is_initialized",
    "global_mesh",
    "global_batch",
    "global_row_weights",
    "process_slice",
    "on_coordinator",
    "sync_global",
]

_STATE = {"initialized": False}


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join (or create) the distributed runtime.  Must run before any jax
    array op.  With no arguments, TPU pod environments are auto-detected
    (`jax.distributed.initialize()` reads the cloud metadata); explicit
    arguments cover CPU clusters and tests.  Idempotent."""
    import jax

    if _STATE["initialized"]:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    if local_device_ids is not None:
        kwargs.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kwargs)
    _STATE["initialized"] = True


def is_initialized() -> bool:
    return _STATE["initialized"]


def global_mesh(
    axis_names: Tuple[str, ...] = ("dp",),
    shape: Optional[Sequence[int]] = None,
):
    """Mesh over ALL processes' devices (`jax.devices()` is global after
    `initialize`).  Device order keeps each process's devices contiguous,
    so the leading mesh axis maps hosts -> DCN and trailing axes stay
    on-host (ICI) — the layout the scaling recipe wants."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devs).reshape(tuple(shape)), axis_names)


def process_slice(n_global: int) -> slice:
    """Rows of a length-n_global dataset owned by this process: contiguous
    ceil(n/nprocs)-sized blocks (the LAST process's block may be shorter —
    :func:`global_batch` pads it back to the common block size)."""
    import jax

    p, np_ = jax.process_index(), jax.process_count()
    per = -(-n_global // np_)
    lo = min(p * per, n_global)
    hi = min(lo + per, n_global)
    return slice(lo, hi)


def global_batch(mesh, local_rows, mesh_axis: str = "dp",
                 n_global: Optional[int] = None, fill: float = 0.0):
    """Assemble per-process row shards into ONE global array whose leading
    axis is sharded over ``mesh_axis``.  ``local_rows`` is this process's
    block (see :func:`process_slice`).

    ``jax.make_array_from_process_local_data`` infers the global shape from
    equal per-process contributions, so every process MUST pass the same
    block shape — and the global row count must tile over every device on
    ``mesh_axis``.  Pass ``n_global`` (the true row count) whenever it may
    not divide the device count: each block is padded with ``fill`` rows up
    to ceil(n_global/nprocs) rounded to the per-process device count, and
    the pad rows are masked with :func:`global_row_weights`
    (``dp_batch_solve(..., row_weights=...)``).  Use ``fill=1.0`` for
    noise-std arrays so 1/ns^2 stays finite on pads.

    This is the host->device on-ramp for multi-host DP: each host feeds
    only its own rows; no host ever materializes the full dataset."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    local_rows = np.asarray(local_rows)
    if n_global is not None:
        per = _rows_per_process(mesh, mesh_axis, n_global)
        pad = per - local_rows.shape[0]
        if pad:
            width = [(0, pad)] + [(0, 0)] * (local_rows.ndim - 1)
            local_rows = np.pad(local_rows, width, constant_values=fill)
    spec = P(*([mesh_axis] + [None] * (local_rows.ndim - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local_rows
    )


def _rows_per_process(mesh, mesh_axis: str, n_global: int) -> int:
    """Common per-process block size: ceil(n/nprocs), rounded up so the
    assembled global rows tile evenly over every device on ``mesh_axis``."""
    import jax

    nprocs = jax.process_count()
    axis_size = int(mesh.shape[mesh_axis])
    dev_per_proc = max(1, axis_size // nprocs)
    per = -(-n_global // nprocs)
    return -(-per // dev_per_proc) * dev_per_proc


def global_row_weights(mesh, n_global: int, mesh_axis: str = "dp",
                       dtype=np.float64):
    """Global 0/1 weights marking the REAL rows of a
    :func:`global_batch`-assembled array (0 on each process's pad rows)."""
    import jax

    sl = process_slice(n_global)
    local = np.ones((sl.stop - sl.start,), dtype)
    return global_batch(mesh, local, mesh_axis, n_global=n_global, fill=0.0)


def on_coordinator() -> bool:
    """True on process 0 — gate checkpoint writes / CSV logging here."""
    import jax

    return jax.process_index() == 0


def sync_global(x):
    """Cross-process agreement check: psum a scalar over every device and
    return the host value (also acts as a barrier)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import shard_map

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("i",))
    f = jax.jit(
        shard_map(
            lambda v: jax.lax.psum(jnp.sum(v), "i"),
            mesh=mesh,
            in_specs=P("i"),
            out_specs=P(),
        )
    )
    v = jnp.asarray(np.full((len(devs),), float(x), np.float32))
    v = jax.device_put(v, NamedSharding(mesh, P("i")))
    return float(f(v))
