"""Grid-sharded BTTB solves: the model-parallel axis the reference lacks.

For inducing grids whose whitened state outgrows one chip, the expanded
(circulant) grid's leading axis is sharded over a 'grid' mesh axis.  The
key identity: with P the projector onto original-grid positions (an
elementwise mask in expanded space), K v = P C P v — so the whole PCG solve
runs on expanded-space shards where

* the circulant apply C (and C^{-1/2}, C^{-1}) is per-axis real-eigenbasis
  matmuls (see `ops.bttb`) with ONE all_to_all transpose pair per direction
  (the Ulysses-style decomposition: transform local axes, exchange, transform
  the formerly-sharded axis),
* masks and axpys are local,
* CG inner products psum over the grid axis.

2-D grids (the paper's main regime) are supported; the construction extends
to N-D by transposing one sharded axis at a time.

Everything is exact: `sharded_gram_solve` matches the single-device
`ops.gram_solve` to reduction-order precision (tested on an 8-device CPU
mesh).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.bttb import BTTBSpectrum, _full_weights, _real_fourier_basis
from ..ops.cg import pcg

__all__ = ["sharded_gram_solve", "sharded_inv_matmul", "sharded_matmul_by_K"]


def _axis_mm(x, Q, axis, precision):
    """Contract ``axis`` of x with Q, axis kept in place (einsum, no
    materialized transpose)."""
    letters = "abcdefghijklmnopqrstuvwxyz"
    nd = x.ndim
    axis = axis % nd
    subs = letters[:nd]
    out = subs[:axis] + "Z" + subs[axis + 1 :]
    return jnp.einsum(f"{subs},{subs[axis]}Z->{out}", x, Q, precision=precision)


def _sharded_circulant_apply(x, w_local, Q0, Q1, axis_name):
    """C-apply on a (B, L0/n, L1) expanded-space shard.

    Analysis: local minor axis, all_to_all to (B, L0, L1/n), local leading
    axis; scale by the (L0, L1/n) weight shard; synthesis mirrored.
    """
    from ..ops.bttb import MATMUL_DFT_PRECISION as prec

    x = _axis_mm(x, Q1, -1, prec)  # analysis, minor axis (local)
    # (B, L0/n, L1) -> (B, L0, L1/n): exchange row blocks for column blocks
    x = jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)
    x = _axis_mm(x, Q0, -2, prec)  # analysis, leading axis (now local)
    x = x * w_local
    x = _axis_mm(x, Q0.T, -2, prec)  # synthesis, leading axis
    x = jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)
    x = _axis_mm(x, Q1.T, -1, prec)  # synthesis, minor axis
    return x


def _mask_local(spec: BTTBSpectrum, n_shards: int, shard_idx, dtype):
    """(L0/n, L1) mask of original-grid positions for this row shard."""
    L0, L1 = spec.edims
    m0, m1 = spec.dims
    rows_per = L0 // n_shards
    row0 = shard_idx * rows_per
    r = row0 + jnp.arange(rows_per)
    return (
        (r[:, None] < m0) & (jnp.arange(L1)[None, :] < m1)
    ).astype(dtype)


def sharded_matmul_by_K(spec: BTTBSpectrum, v: jnp.ndarray, mesh: Mesh,
                        axis: str = "grid") -> jnp.ndarray:
    """K @ v with the expanded grid sharded over ``axis``; v: (B, M)."""
    return _solve_or_apply(spec, v, mesh, axis, mode="apply")


def sharded_inv_matmul(
    spec: BTTBSpectrum,
    b: jnp.ndarray,
    mesh: Mesh,
    axis: str = "grid",
    maxiter: int = 20,
    tol: float = 1e-8,
) -> jnp.ndarray:
    """K^{-1} b via masked PCG over grid shards; b: (B, M) -> (B, M)."""
    return _solve_or_apply(spec, b, mesh, axis, mode="solve",
                           maxiter=maxiter, tol=tol)


def sharded_gram_solve(
    spec: BTTBSpectrum,
    b: jnp.ndarray,
    mesh: Mesh,
    axis: str = "grid",
    maxiter: int = 20,
    tol: float = 1e-8,
) -> jnp.ndarray:
    """K^{-1/2} b = R^T K^{-1} b, grid-sharded; b: (B, M) -> (B, M')."""
    return _solve_or_apply(spec, b, mesh, axis, mode="whiten",
                           maxiter=maxiter, tol=tol)


def _solve_or_apply(spec, b, mesh, axis, mode, maxiter=20, tol=1e-8):
    if spec.ndim != 2:
        raise NotImplementedError("grid sharding currently supports 2-D grids")
    n = mesh.shape[axis]
    L0, L1 = spec.edims
    if L0 % n:
        raise ValueError(f"expanded leading dim {L0} not divisible by {n} shards")
    m0, m1 = spec.dims
    B = b.shape[0]
    dtype = b.dtype

    # embed (B, M) into expanded space (B, L0, L1), zero-padded
    x = b.reshape(B, m0, m1)
    x = jnp.pad(x, ((0, 0), (0, L0 - m0), (0, L1 - m1)))

    Q0 = _real_fourier_basis(L0, dtype)
    Q1 = _real_fourier_basis(L1, dtype)
    wfull = _full_weights(spec.eigs, L1)  # (L0, L1)

    rows = L0 // n

    def local_fn(xl, w_l, wsqrt_l, winv_l):
        # xl: (B, rows, L1) row shard; w_*: (L0, L1/n) column shards (the
        # scale happens after the all_to_all transpose)
        idx = jax.lax.axis_index(axis)
        mask = _mask_local(spec, n, idx, dtype).reshape(-1)

        # pcg works on flat (B, rows*L1) local vectors so its axpys and
        # reductions stay one-axis; the circulant apply reshapes internally
        def cmul(vflat, w):
            v = vflat.reshape(B, rows, L1)
            out = _sharded_circulant_apply(v, w, Q0, Q1, axis)
            return out.reshape(B, -1)

        def kv(vflat):
            return mask * cmul(vflat * mask, w_l)

        def cinv(vflat):
            return mask * cmul(vflat * mask, winv_l)

        def dot(a_, b_):
            return jax.lax.psum(jnp.sum(a_ * b_, axis=-1), axis)

        xflat = xl.reshape(B, -1)
        if mode == "apply":
            return kv(xflat).reshape(B, rows, L1)
        sol = pcg(kv, xflat * mask, precond=cinv, maxiter=maxiter, tol=tol,
                  dot_fn=dot)
        if mode == "solve":
            return sol.reshape(B, rows, L1)
        # whiten: R^T d = C^{1/2} [d; 0] (full expanded output)
        return cmul(sol * mask, wsqrt_l).reshape(B, rows, L1)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    out = fn(x, wfull, jnp.sqrt(wfull), 1.0 / wfull)

    if mode == "whiten":
        return out.reshape(B, -1)
    # crop back to original grid
    return out[:, :m0, :m1].reshape(B, -1)