"""Grid-sharded BTTB solves: the model-parallel axis the reference lacks.

For inducing grids whose whitened state outgrows one chip, the expanded
(circulant) grid is sharded over a 'grid' mesh axis.  The key identity: with
P the projector onto original-grid positions (an elementwise mask in
expanded space), K v = P C P v — so the whole PCG solve runs on
expanded-space shards where

* the circulant apply C (and C^{1/2}, C^{-1}) runs axis-by-axis with ONE
  all_to_all transpose pair per direction (the Ulysses-style decomposition:
  transform local axes, exchange, transform the formerly-sharded axis);
  each per-axis transform is the MXU real-eigenbasis matmul for short axes
  (<= `ops.bttb.MATMUL_DFT_MAX_LEN`) or a local complex FFT for long axes
  (mixing bases is exact because the circulant spectrum is real and EVEN
  along every axis, so the real-basis pair rotation commutes with the
  diagonal weights),
* 1-D grids use the four-step (Cooley–Tukey L = L0*L1) distributed FFT:
  local FFT over one factor, twiddle multiply, all_to_all transpose, local
  FFT over the other factor — with the spectrum pre-permuted into the
  four-step output order,
* masks and axpys are local,
* CG inner products psum over the grid axis.

Any dimensionality is supported.  Divisibility of the leading/minor
embedded axes by the shard count is arranged at spectrum build time —
``make_spectrum(..., multiple_of=shard_multiples(dims, n))`` pads the
embedding (exact: the circulant embedding is valid for ANY length >= 2m-2).

Everything is exact: `sharded_gram_solve` matches the single-device
`ops.gram_solve` to reduction-order precision (tested on an 8-device CPU
mesh, f64).

The ``local_*`` functions are the composable core: they run INSIDE an
ambient `shard_map` (e.g. one that also shards data over a 'dp' axis — see
`parallel/mp.py` for the model-parallel HIPGP built on them).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.bttb import (
    MATMUL_DFT_MAX_LEN,
    BTTBSpectrum,
    _axis_contract,
    _full_weights,
    _real_fourier_basis,
)
from ..ops.cg import pcg

__all__ = [
    "sharded_gram_solve",
    "sharded_inv_matmul",
    "sharded_matmul_by_K",
    "shard_multiples",
    "host_weights",
    "local_circulant_apply",
    "local_spectrum_weights",
    "local_whiten",
    "local_whiten_diff",
    "local_mask",
    "GridShardInfo",
]


# ---------------------------------------------------------------------------
# static shard layout
# ---------------------------------------------------------------------------


class GridShardInfo:
    """Static layout of one expanded grid sharded n ways.

    nd >= 2: the LEADING embedded axis is sharded (rows_per rows per shard);
    the apply trades it against the MINOR axis with one all_to_all pair, so
    both must divide n.  nd == 1: the length L splits as L = L0 * L1
    (four-step FFT view, C order: flat = n0 * L1 + n1) with the L0 axis
    sharded; both factors must divide n.
    """

    def __init__(self, spec: BTTBSpectrum, n_shards: int,
                 matmul_max_len: Optional[int] = None):
        self.dims = spec.dims
        self.edims = spec.edims
        self.n = int(n_shards)
        self.nd = len(spec.dims)
        self.matmul_max_len = (
            MATMUL_DFT_MAX_LEN if matmul_max_len is None else matmul_max_len
        )
        if self.nd == 1:
            L = spec.edims[0]
            self.L0, self.L1 = _split_1d(L, self.n)
            self.rows_per = self.L0 // self.n
            self.local_shape = (self.rows_per, self.L1)  # (n0_local, n1)
            self.Mp_local = L // self.n
        else:
            L0, Lm = spec.edims[0], spec.edims[-1]
            if L0 % self.n:
                raise ValueError(
                    f"expanded leading dim {L0} not divisible by {self.n} "
                    "shards — build the spectrum with "
                    "make_spectrum(..., multiple_of=shard_multiples(dims, n))"
                )
            if Lm % self.n:
                raise ValueError(
                    f"expanded minor dim {Lm} not divisible by {self.n} "
                    "shards — build the spectrum with "
                    "make_spectrum(..., multiple_of=shard_multiples(dims, n))"
                )
            self.rows_per = L0 // self.n
            self.local_shape = (self.rows_per,) + self.edims[1:]
            self.Mp_local = spec.Mprime // self.n


def _split_1d(L: int, n: int) -> Tuple[int, int]:
    """Factor L = L0 * L1 with n | L0, n | L1, L0 as near sqrt(L) as
    possible (balanced four-step)."""
    best = None
    for L0 in range(1, int(math.isqrt(L)) + 1):
        if L % L0:
            continue
        L1 = L // L0
        for a, b in ((L0, L1), (L1, L0)):
            if a % n == 0 and b % n == 0:
                score = abs(math.log(a) - math.log(b))
                if best is None or score < best[0]:
                    best = (score, a, b)
    if best is None:
        raise ValueError(
            f"cannot split L={L} into two factors both divisible by n={n}; "
            "build the spectrum with make_spectrum(..., "
            "multiple_of=shard_multiples(dims, n)) so L is a multiple of n^2"
        )
    return best[1], best[2]


def shard_multiples(dims: Sequence[int], n_shards: int) -> Tuple[int, ...]:
    """Per-axis ``multiple_of`` for `ops.bttb.make_spectrum` so the embedded
    grid shards evenly n ways: leading and minor axes divisible by n (1-D:
    the single axis divisible by n^2 so it splits into two n-divisible
    four-step factors)."""
    nd = len(dims)
    if nd == 1:
        return (n_shards * n_shards,)
    return (n_shards,) + (1,) * (nd - 2) + (n_shards,)


# ---------------------------------------------------------------------------
# host-side weight layout
# ---------------------------------------------------------------------------


def host_weights(spec: BTTBSpectrum, info: GridShardInfo) -> jnp.ndarray:
    """The full (real, even) circulant spectrum arranged for the sharded
    apply; pair with :func:`weights_pspec` as the shard_map in_spec.

    nd >= 2: shape ``edims``, sharded on the MINOR axis (the scale happens
    after the all_to_all transpose).  nd == 1: the four-step output order
    Wt[k0, k1] = W[k1 * L0 + k0], shape (L0, L1), sharded on k0.
    """
    wfull = _full_weights(spec.eigs, spec.edims[-1])
    if info.nd == 1:
        return wfull.reshape(info.L1, info.L0).T
    return wfull


def weights_pspec(info: GridShardInfo, axis: str) -> P:
    if info.nd == 1:
        return P(axis, None)
    return P(*([None] * (info.nd - 1) + [axis]))


# ---------------------------------------------------------------------------
# local (per-shard) circulant apply
# ---------------------------------------------------------------------------


def _axis_transform_local(x, L, axis, dtype, inverse, max_len):
    """One-axis analysis/synthesis: MXU real-basis matmul for short axes,
    local complex FFT for long axes (exact mix — see module docstring)."""
    if L <= max_len:
        Q = _real_fourier_basis(L, dtype)
        if inverse:
            Q = Q.T
        return _axis_contract(x, Q, axis)
    if inverse:
        return jnp.fft.ifft(x, axis=axis)
    return jnp.fft.fft(x, axis=axis)


def local_circulant_apply(
    x,
    w_local,
    info: GridShardInfo,
    axis_name: str,
):
    """C-apply on one expanded-space shard; call inside shard_map.

    x: (B, *info.local_shape) real.  w_local: the :func:`host_weights` shard
    this device received (elementwise functions — sqrt, reciprocal — may be
    applied to it by the caller; they commute with the layout).
    Returns (B, *info.local_shape) real, same dtype.
    """
    if info.nd == 1:
        return _four_step_apply(x, w_local, info, axis_name)
    nd = info.nd
    dtype = x.dtype
    edims = info.edims
    max_len = info.matmul_max_len
    # analysis over the local trailing axes, minor first (contraction order
    # is a measured 13x lever on TPU — see ops/bttb.py)
    for a in range(-1, -nd, -1):
        x = _axis_transform_local(x, edims[a], a, dtype, False, max_len)
    # (B, L0/n, ..., Lm) -> (B, L0, ..., Lm/n)
    x = jax.lax.all_to_all(x, axis_name, split_axis=x.ndim - 1, concat_axis=1,
                           tiled=True)
    x = _axis_transform_local(x, edims[0], -nd, dtype, False, max_len)
    x = x * w_local
    x = _axis_transform_local(x, edims[0], -nd, dtype, True, max_len)
    x = jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=x.ndim - 1,
                           tiled=True)
    for a in range(-nd + 1, 0):
        x = _axis_transform_local(x, edims[a], a, dtype, True, max_len)
    if jnp.iscomplexobj(x):
        x = x.real.astype(dtype)
    return x


def _four_step_twiddle(info: GridShardInfo, axis_name: str, cdtype):
    L0, L1, L = info.L0, info.L1, info.L0 * info.L1
    idx = jax.lax.axis_index(axis_name)
    n1g = idx * (L1 // info.n) + jnp.arange(L1 // info.n)
    k0 = jnp.arange(L0)
    return jnp.exp(
        (-2j * jnp.pi / L) * (k0[:, None] * n1g[None, :])
    ).astype(cdtype)


def _four_step_forward(z, tw, info: GridShardInfo, axis_name: str):
    """Distributed four-step DFT: (B, L0/n, L1) n0-sharded C-order view ->
    (B, L0/n, L1) in the four-step OUTPUT order z[k0_local, k1] with
    X[k1*L0 + k0] = z[k0, k1] (the layout of :func:`host_weights`)."""
    # make n0 local (n1 becomes sharded): (B, L0/n, L1) -> (B, L0, L1/n)
    z = jax.lax.all_to_all(z, axis_name, split_axis=2, concat_axis=1,
                           tiled=True)
    z = jnp.fft.fft(z, axis=1)  # DFT_{L0} over n0 -> [k0, n1_local]
    z = z * tw[None]
    # make n1 local (k0 becomes sharded): (B, L0, L1/n) -> (B, L0/n, L1)
    z = jax.lax.all_to_all(z, axis_name, split_axis=1, concat_axis=2,
                           tiled=True)
    return jnp.fft.fft(z, axis=2)  # DFT_{L1} over n1 -> [k0_local, k1]


def _four_step_inverse(z, tw, info: GridShardInfo, axis_name: str):
    """Inverse of :func:`_four_step_forward` (same layouts, reversed)."""
    z = jnp.fft.ifft(z, axis=2)
    # back: k0 local again, n1 sharded
    z = jax.lax.all_to_all(z, axis_name, split_axis=2, concat_axis=1,
                           tiled=True)
    z = z * jnp.conj(tw)[None]
    z = jnp.fft.ifft(z, axis=1)
    return jax.lax.all_to_all(z, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


def _four_step_apply(x, wt_local, info: GridShardInfo, axis_name: str):
    """1-D circulant apply via the distributed four-step FFT.

    x: (B, rows_per, L1) — the (L0, L1) C-order view of the flat expanded
    vector, rows (n0) sharded.  wt_local: (L0/n, L1) shard of the
    four-step-ordered spectrum Wt[k0, k1] = W[k1*L0 + k0].
    """
    dtype = x.dtype
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    tw = _four_step_twiddle(info, axis_name, cdtype)
    z = _four_step_forward(x.astype(cdtype), tw, info, axis_name)
    z = z * wt_local[None]
    z = _four_step_inverse(z, tw, info, axis_name)
    return z.real.astype(dtype)


def local_spectrum_weights(
    xgrids,
    kernel_fn,
    info: GridShardInfo,
    axis_name: str,
    jitter: float = 1e-3,
    eig_floor: float = 1e-6,
):
    """This shard's slice of the circulant spectrum, built WITHOUT any
    device ever materializing all M' eigenvalues (call inside shard_map).

    Each shard evaluates the stationary kernel only at its own slice of the
    wrapped-lag embedded column (`ops.bttb.make_spectrum` semantics,
    distributed), then one distributed forward DFT — per-axis cosine
    matmuls for short axes / local FFTs plus the all_to_all transpose for
    the leading axis (nd >= 2), or the four-step forward (nd == 1) —
    produces the weights directly in the :func:`host_weights` layout
    (sharded on the minor axis for nd >= 2; four-step order sharded on k0
    for nd == 1).  All jnp ops: differentiable in the hyperparameters
    closed over by ``kernel_fn``.

    Peak per-device memory is O(M'/n) — the round-2 build materialized the
    full spectrum host-side (`host_weights`) before sharding.
    """
    dtype = jnp.asarray(xgrids[0]).dtype
    edims = info.edims
    gidx = jax.lax.axis_index(axis_name)

    def wrapped_lag(flat_idx, L, g):
        g = jnp.asarray(g)
        h = g[1] - g[0]
        lag = jnp.minimum(flat_idx, L - flat_idx).astype(dtype) * h
        return g[0] + lag

    if info.nd == 1:
        L, L1 = edims[0], info.L1
        flat = gidx * info.Mp_local + jnp.arange(info.Mp_local)
        pts = wrapped_lag(flat, L, xgrids[0])[:, None]
        x0 = jnp.asarray(xgrids[0])[:1, None]
        c = kernel_fn(x0, pts)[0]
        c = c + jitter * (flat == 0).astype(dtype)
        z = c.reshape(1, info.rows_per, L1)
        cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
        tw = _four_step_twiddle(info, axis_name, cdtype)
        w = _four_step_forward(z.astype(cdtype), tw, info, axis_name)
        w = w[0].real.astype(dtype)
        return jnp.maximum(w, jnp.asarray(eig_floor, dtype))

    rows_per = info.rows_per
    r = gidx * rows_per + jnp.arange(rows_per)
    coords = [wrapped_lag(r, edims[0], xgrids[0])]
    for g, L in zip(xgrids[1:], edims[1:]):
        coords.append(wrapped_lag(jnp.arange(L), L, g))
    mesh_pts = jnp.meshgrid(*coords, indexing="ij")
    pts = jnp.stack([m.reshape(-1) for m in mesh_pts], axis=-1)
    origin = jnp.stack([jnp.asarray(g)[0] for g in xgrids])[None, :]
    c = kernel_fn(origin, pts)[0]
    is_origin = (r[0] == 0).astype(dtype)
    c = c.at[0].add(jitter * is_origin)
    x = c.reshape((rows_per,) + edims[1:])

    # true DFT per axis (cosine matmul exact for even axes; local FFT for
    # long ones — realness is preserved axis-by-axis because the embedded
    # column is even along every axis), trailing axes local first
    max_len = info.matmul_max_len
    nd = info.nd

    def axis_dft(x, L, axis):
        if L <= max_len:
            from ..ops.bttb import _cosine_matrix

            return _axis_contract(x, _cosine_matrix(L, dtype), axis)
        cplx = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
        return jnp.fft.fft(x.astype(cplx), axis=axis).real.astype(dtype)

    for a in range(-1, -nd, -1):
        x = axis_dft(x, edims[a], a)
    # (L0/n, ..., Lm) -> (L0, ..., Lm/n): the host_weights minor-shard layout
    x = jax.lax.all_to_all(x, axis_name, split_axis=x.ndim - 1,
                           concat_axis=0, tiled=True)
    x = axis_dft(x, edims[0], -nd)
    return jnp.maximum(x, jnp.asarray(eig_floor, dtype))


def local_mask(info: GridShardInfo, shard_idx, dtype) -> jnp.ndarray:
    """(Mp_local,) flat mask of original-grid positions for this shard."""
    dims, edims = info.dims, info.edims
    if info.nd == 1:
        flat = shard_idx * info.Mp_local + jnp.arange(info.Mp_local)
        return (flat < dims[0]).astype(dtype)
    rows_per = info.rows_per
    r = shard_idx * rows_per + jnp.arange(rows_per)
    mask = (r < dims[0]).astype(dtype)
    mask = mask.reshape((rows_per,) + (1,) * (len(dims) - 1))
    for a in range(1, len(dims)):
        ax_mask = (jnp.arange(edims[a]) < dims[a]).astype(dtype)
        shape = [1] * len(dims)
        shape[a] = edims[a]
        mask = mask * ax_mask.reshape(shape)
    return mask.reshape(-1)


def _grid_dot(axis_name):
    def dot(a, b):
        return jax.lax.psum(jnp.sum(a * b, axis=-1), axis_name)

    return dot


def local_whiten(
    x_local: jnp.ndarray,
    w_local: jnp.ndarray,
    info: GridShardInfo,
    axis_name: str,
    maxiter: int = 20,
    tol: float = 1e-8,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """kn = R^T K^{-1} x on expanded-space shards; call inside shard_map.

    x_local: (B, Mp_local) flat local slice of the expanded-space embedding
    of the RHS (original entries in place, padding zeros).  Returns
    (B, Mp_local) — the local slice of the whitened (B, M') result.
    """
    return _local_solve(x_local, w_local, info, axis_name, "whiten",
                        maxiter, tol, mask)


def local_whiten_diff(
    x_local: jnp.ndarray,
    w_local: jnp.ndarray,
    info: GridShardInfo,
    axis_name: str,
    maxiter: int = 20,
    tol: float = 1e-8,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Differentiable :func:`local_whiten`: the solve is wrapped in
    ``lax.custom_linear_solve`` so gradients w.r.t. both the RHS and the
    spectrum (hence kernel hyperparameters) flow implicitly through the
    truncated PCG — the grid-sharded counterpart of `ops.solve.whiten`
    (same implicit-diff structure as `ops.solve.inv_matmul`; replaces
    the reference's `ziggy/misc/_inv_matmul.py`, distributed).

    Call inside shard_map.  x_local: (B, Mp_local).
    """
    B = x_local.shape[0]
    dtype = x_local.dtype
    if mask is None:
        mask = local_mask(info, jax.lax.axis_index(axis_name), dtype)

    def cmul(vflat, w):
        v = vflat.reshape((B,) + info.local_shape)
        return local_circulant_apply(v, w, info, axis_name).reshape(B, -1)

    def kv(vflat):
        # K = P C P: restricted to the masked (original-grid) subspace —
        # CG iterates stay in it because rhs and preconditioner are masked
        return mask * cmul(vflat * mask, w_local)

    w_prec = jax.lax.stop_gradient(w_local)

    def solver(mv, b):
        def cinv(vflat):
            return mask * cmul(vflat * mask, 1.0 / w_prec)

        return pcg(mv, b, precond=cinv, maxiter=maxiter, tol=tol,
                   dot_fn=_grid_dot(axis_name))

    sol = jax.lax.custom_linear_solve(kv, x_local * mask, solver,
                                      symmetric=True)
    return cmul(sol * mask, jnp.sqrt(w_local))


def _local_solve(x_local, w_local, info, axis_name, mode, maxiter, tol,
                 mask=None):
    B = x_local.shape[0]
    dtype = x_local.dtype
    if mask is None:
        mask = local_mask(info, jax.lax.axis_index(axis_name), dtype)

    def cmul(vflat, w):
        v = vflat.reshape((B,) + info.local_shape)
        out = local_circulant_apply(v, w, info, axis_name)
        return out.reshape(B, -1)

    def kv(vflat):
        return mask * cmul(vflat * mask, w_local)

    def cinv(vflat):
        return mask * cmul(vflat * mask, 1.0 / w_local)

    if mode == "apply":
        return kv(x_local)
    sol = pcg(kv, x_local * mask, precond=cinv, maxiter=maxiter, tol=tol,
              dot_fn=_grid_dot(axis_name))
    if mode == "solve":
        return sol
    # whiten: R^T d = C^{1/2} [d; 0] (full expanded output)
    return cmul(sol * mask, jnp.sqrt(w_local))


# ---------------------------------------------------------------------------
# host-level wrappers (full arrays in / out)
# ---------------------------------------------------------------------------


def sharded_matmul_by_K(spec: BTTBSpectrum, v: jnp.ndarray, mesh: Mesh,
                        axis: str = "grid",
                        matmul_max_len: Optional[int] = None) -> jnp.ndarray:
    """K @ v with the expanded grid sharded over ``axis``; v: (B, M)."""
    return _solve_or_apply(spec, v, mesh, axis, mode="apply",
                           matmul_max_len=matmul_max_len)


def sharded_inv_matmul(
    spec: BTTBSpectrum,
    b: jnp.ndarray,
    mesh: Mesh,
    axis: str = "grid",
    maxiter: int = 20,
    tol: float = 1e-8,
    matmul_max_len: Optional[int] = None,
) -> jnp.ndarray:
    """K^{-1} b via masked PCG over grid shards; b: (B, M) -> (B, M)."""
    return _solve_or_apply(spec, b, mesh, axis, mode="solve",
                           maxiter=maxiter, tol=tol,
                           matmul_max_len=matmul_max_len)


def sharded_gram_solve(
    spec: BTTBSpectrum,
    b: jnp.ndarray,
    mesh: Mesh,
    axis: str = "grid",
    maxiter: int = 20,
    tol: float = 1e-8,
    matmul_max_len: Optional[int] = None,
) -> jnp.ndarray:
    """K^{-1/2} b = R^T K^{-1} b, grid-sharded; b: (B, M) -> (B, M')."""
    return _solve_or_apply(spec, b, mesh, axis, mode="whiten",
                           maxiter=maxiter, tol=tol,
                           matmul_max_len=matmul_max_len)


def _embed_full(spec: BTTBSpectrum, b: jnp.ndarray) -> jnp.ndarray:
    """(B, M) -> (B, M') zero-padded expanded-space embedding, flat."""
    B = b.shape[0]
    x = b.reshape((B,) + spec.dims)
    pad = [(0, 0)] + [(0, e - d) for d, e in zip(spec.dims, spec.edims)]
    return jnp.pad(x, pad).reshape(B, -1)


def _crop_full(spec: BTTBSpectrum, y: jnp.ndarray) -> jnp.ndarray:
    """(B, M') expanded flat -> (B, M) original-grid entries."""
    B = y.shape[0]
    y = y.reshape((B,) + spec.edims)
    crop = tuple([slice(None)] + [slice(0, d) for d in spec.dims])
    return y[crop].reshape(B, -1)


def _solve_or_apply(spec, b, mesh, axis, mode, maxiter=20, tol=1e-8,
                    matmul_max_len=None):
    n = mesh.shape[axis]
    info = GridShardInfo(spec, n, matmul_max_len=matmul_max_len)
    x = _embed_full(spec, b)  # (B, M') flat; shard_map splits the last axis
    w = host_weights(spec, info)

    def local_fn(xl, wl):
        out = _local_solve(xl, wl, info, axis, mode, maxiter, tol)
        return out

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis), weights_pspec(info, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    out = fn(x, w)
    if mode == "whiten":
        return out
    return _crop_full(spec, out)
