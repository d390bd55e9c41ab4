"""Device-mesh helpers.

The reference is strictly single-device (`ziggy/svi_gp.py:182-184`; no
torch.distributed anywhere).  This layer is the TPU-native addition: a named
`jax.sharding.Mesh` over which batch data is sharded ('dp') and — for grids
beyond one chip's HBM — the whitened/FFT axes are sharded ('grid', see
`fft_sharded.py`).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "P", "NamedSharding", "replicated", "shard_batch"]


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("dp",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, arr, axis: int = 0, mesh_axis: str = "dp"):
    """Place ``arr`` with its ``axis`` sharded across ``mesh_axis``."""
    spec = [None] * arr.ndim
    spec[axis] = mesh_axis
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))
