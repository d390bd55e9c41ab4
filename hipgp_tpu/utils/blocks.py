"""Block-ordering index machinery for the block-diagonal variational family.

Two orderings coexist (parity reference `ziggy/misc/util.py:81-130`):
the TOEPLITZ (C/meshgrid) ordering of grid points, and a BLOCK ordering that
groups spatially-neighboring chunks so each chunk owns one dense covariance
block.  Conversions are pure gathers with precomputed (host/numpy) index
arrays — XLA turns them into cheap dynamic-gathers.

Generalized to any number of grid dimensions (the reference restricts to
2-D/3-D).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["block_indices", "interleaved_block_indices", "to_blocks", "from_blocks"]


def block_indices(dims: Sequence[int], chunk_sizes: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    """Build (blk_idx, inverse) for grouping a C-ordered grid into chunks.

    Args:
      dims: grid shape (m_1, ..., m_D).
      chunk_sizes: chunk edge per dim; each must divide the matching dim.

    Returns:
      blk_idx:  (num_blocks, block_size) int32 — flat Toeplitz-order indices
                of every point in each block (blocks enumerate chunk
                coordinates in C order; within a block, points in C order).
      inverse:  (M,) int32 such that flat_block_order[inverse] restores
                Toeplitz order.
    """
    dims = tuple(int(d) for d in dims)
    chunk_sizes = tuple(int(c) for c in chunk_sizes)
    if len(dims) != len(chunk_sizes):
        raise ValueError(f"dims ndim {len(dims)} != chunk ndim {len(chunk_sizes)}")
    for d, c in zip(dims, chunk_sizes):
        if d % c != 0:
            raise ValueError(f"grid dim {d} not divisible by chunk size {c}")

    M = int(np.prod(dims))
    flat = np.arange(M, dtype=np.int64).reshape(dims)
    # Split each axis into (n_chunks, chunk): dims -> (n1, c1, n2, c2, ...),
    # then move all chunk-count axes to the front.
    nd = len(dims)
    shape = []
    for d, c in zip(dims, chunk_sizes):
        shape.extend([d // c, c])
    split = flat.reshape(shape)
    perm = list(range(0, 2 * nd, 2)) + list(range(1, 2 * nd, 2))
    blk = np.transpose(split, perm).reshape(-1, int(np.prod(chunk_sizes)))

    inverse = np.argsort(blk.reshape(-1), kind="stable")
    return blk.astype(np.int32), inverse.astype(np.int32)


def to_blocks(v: jnp.ndarray, blk_idx: jnp.ndarray) -> jnp.ndarray:
    """(..., M) Toeplitz-order -> (..., num_blocks, block_size) block order."""
    return v[..., blk_idx]


def from_blocks(vb: jnp.ndarray, inverse: jnp.ndarray) -> jnp.ndarray:
    """(..., num_blocks, block_size) block order -> (..., M) Toeplitz order."""
    flat = vb.reshape(vb.shape[:-2] + (-1,))
    return flat[..., inverse]


def interleaved_block_indices(dims: Sequence[int], num_blocks_per_dim: int) -> np.ndarray:
    """Strided (interleaved) block grouping: block (bx, by, ...) owns every
    num_blocks_per_dim-th point starting at its offset.

    The reference keeps this as an unused alternative to neighboring chunks
    (`ziggy/misc/util.py:155-198`); provided for parity.  Returns
    (num_blocks, block_size) int32 flat indices in C order.
    """
    dims = tuple(int(d) for d in dims)
    nb = int(num_blocks_per_dim)
    for d in dims:
        if d % nb != 0:
            raise ValueError(f"grid dim {d} not divisible by {nb}")
    flat = np.arange(int(np.prod(dims)), dtype=np.int64).reshape(dims)
    blocks = []
    from itertools import product

    for offs in product(range(nb), repeat=len(dims)):
        idx = tuple(slice(o, None, nb) for o in offs)
        blocks.append(flat[idx].reshape(-1))
    return np.stack(blocks).astype(np.int32)
