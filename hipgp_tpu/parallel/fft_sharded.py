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

from ..ops.bttb import (
    BTTBSpectrum,
    _axis_contract,
    _full_weights,
    _real_fourier_basis,
)
from ..ops.cg import pcg

__all__ = ["sharded_gram_solve", "sharded_inv_matmul", "sharded_matmul_by_K"]


def _axis_mm(x, Q, axis, precision=None):
    """Contract ``axis`` of x with Q, axis kept in place (shared with
    ops.bttb so the contraction rule cannot drift)."""
    del precision  # ops.bttb fixes MATMUL_DFT_PRECISION
    return _axis_contract(x, Q, axis)


def _sharded_circulant_apply(x, w_local, Qs, axis_name):
    """C-apply on a (B, L0/n, L1, ..., L_{d-1}) expanded-space shard.

    Analysis: all trailing axes locally (minor first); one all_to_all pair
    trades the sharded leading axis against the minor axis so it too can be
    transformed locally; scale by the weight shard (sharded on the minor
    axis); synthesis mirrored.
    """
    from ..ops.bttb import MATMUL_DFT_PRECISION as prec

    nd = len(Qs)
    # analysis, local trailing axes, minor first
    for a in range(-1, -nd, -1):
        x = _axis_mm(x, Qs[a], a, prec)
    # (B, L0/n, ..., Lm) -> (B, L0, ..., Lm/n)
    x = jax.lax.all_to_all(x, axis_name, split_axis=x.ndim - 1, concat_axis=1,
                           tiled=True)
    x = _axis_mm(x, Qs[0], -nd, prec)  # leading axis, now local
    x = x * w_local
    x = _axis_mm(x, Qs[0].T, -nd, prec)
    x = jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=x.ndim - 1,
                           tiled=True)
    for a in range(-nd + 1, 0):
        x = _axis_mm(x, Qs[a].T, a, prec)
    return x


def _mask_local(spec: BTTBSpectrum, n_shards: int, shard_idx, dtype):
    """(L0/n, L1, ..., L_{d-1}) mask of original-grid positions for this
    row shard."""
    edims, dims = spec.edims, spec.dims
    rows_per = edims[0] // n_shards
    r = shard_idx * rows_per + jnp.arange(rows_per)
    mask = (r < dims[0]).astype(dtype)
    mask = mask.reshape((rows_per,) + (1,) * (len(dims) - 1))
    for a in range(1, len(dims)):
        ax_mask = (jnp.arange(edims[a]) < dims[a]).astype(dtype)
        shape = [1] * len(dims)
        shape[a] = edims[a]
        mask = mask * ax_mask.reshape(shape)
    return mask


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
    nd = spec.ndim
    if nd < 2:
        raise NotImplementedError("grid sharding needs >= 2 grid dims")
    n = mesh.shape[axis]
    edims = spec.edims
    L0, Lm = edims[0], edims[-1]
    if L0 % n:
        raise ValueError(f"expanded leading dim {L0} not divisible by {n} shards")
    if Lm % n:
        raise ValueError(f"expanded minor dim {Lm} not divisible by {n} shards")
    B = b.shape[0]
    dtype = b.dtype

    # embed (B, M) into expanded space, zero-padded
    x = b.reshape((B,) + spec.dims)
    pad = [(0, 0)] + [(0, e - d) for d, e in zip(spec.dims, edims)]
    x = jnp.pad(x, pad)

    Qs = [_real_fourier_basis(L, dtype) for L in edims]
    wfull = _full_weights(spec.eigs, Lm)  # (*edims)

    rows = L0 // n
    local_edims = (rows,) + edims[1:]

    def local_fn(xl, w_l, wsqrt_l, winv_l):
        # xl: (B, rows, L1, ..., Lm) row shard; w_*: weight shards split on
        # the MINOR axis (the scale happens after the all_to_all transpose)
        idx = jax.lax.axis_index(axis)
        mask = _mask_local(spec, n, idx, dtype).reshape(-1)

        # pcg works on flat (B, local) vectors so its axpys and reductions
        # stay one-axis; the circulant apply reshapes internally
        def cmul(vflat, w):
            v = vflat.reshape((B,) + local_edims)
            out = _sharded_circulant_apply(v, w, Qs, axis)
            return out.reshape(B, -1)

        def kv(vflat):
            return mask * cmul(vflat * mask, w_l)

        def cinv(vflat):
            return mask * cmul(vflat * mask, winv_l)

        def dot(a_, b_):
            return jax.lax.psum(jnp.sum(a_ * b_, axis=-1), axis)

        xflat = xl.reshape(B, -1)
        if mode == "apply":
            return kv(xflat).reshape((B,) + local_edims)
        sol = pcg(kv, xflat * mask, precond=cinv, maxiter=maxiter, tol=tol,
                  dot_fn=dot)
        if mode == "solve":
            return sol.reshape((B,) + local_edims)
        # whiten: R^T d = C^{1/2} [d; 0] (full expanded output)
        return cmul(sol * mask, wsqrt_l).reshape((B,) + local_edims)

    data_spec = P(*([None, axis] + [None] * (nd - 1)))
    w_spec = P(*([None] * (nd - 1) + [axis]))  # weights split on minor axis

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(data_spec, w_spec, w_spec, w_spec),
        out_specs=data_spec,
        check_vma=False,
    )
    out = fn(x, wfull, jnp.sqrt(wfull), 1.0 / wfull)

    if mode == "whiten":
        return out.reshape(B, -1)
    crop = tuple([slice(None)] + [slice(0, d) for d in spec.dims])
    return out[crop].reshape(B, -1)