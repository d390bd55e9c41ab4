"""Model-parallel HIP-GP: the whitened state sharded over a 'grid' mesh axis,
composed with data parallelism over a 'dp' axis.

This is the capability the reference cannot express at all (it is strictly
single-device, `ziggy/svi_gp.py:182-184`): a mean-field HIP-GP whose whitened
state (theta1, theta2, Lambda — all (M',)), cross-covariances kn (N x M'),
and every transform in the PCG whitening solve live in shards of M'/n_grid
per device, while data rows are simultaneously sharded n_dp ways.  Nothing
about the math changes — the whitening semantics are exactly
`ziggy/misc/toeplitz_tensor.py:85-112`, executed distributed:

* Knm is evaluated per-shard directly in the EXPANDED layout: each grid
  shard computes the kernel only against its own slice of inducing rows
  (memory per device: bsz x M'/n_grid, never the full row),
* the whitening PCG runs on expanded-space shards via
  `fft_sharded.local_whiten` (per-axis transforms + all_to_all, psum dots),
* Lambda (diagonal) and b accumulate locally and psum over 'dp' only,
* the optimal-mean system (I + sum_n kn kn^T / s_n^2) m = b is solved by CG
  with the kn stack kept sharded: each matvec is one psum over 'grid'
  (kn @ m) and one over 'dp' (kn^T (ivar u)) — the full M' x M' Lambda is
  never materialized on any device,
* prediction psums the per-row contractions (kn qm, kn.kn, kn^2 S) over
  'grid',
* minibatch natural-gradient TRAINING runs the unchanged single-device
  `elbo_and_grads` code over the sharded global arrays: `make_mp_kn_fn`
  swaps only the whitening solve for the grid-sharded differentiable one
  (`fft_sharded.local_whiten_diff` — implicit diff, so hyperparameter
  learning works through the sharded PCG), and every downstream
  contraction (ELBO terms, natgrad sums, KL) gets its collectives from
  XLA's sharding propagation.  `mp_svigp_fit` is the full training loop.

Supported families: 'mean-field' (diagonal Lambda, O(M') state) and
'block' (block-diagonal Lambda: blocks are independent in Lambda/S/KL, so
the (num_blocks, bs, bs) state shards over 'grid' along the block axis —
`ziggy/hipgp.py:527-690`, distributed).  Alignment requirement for block:
the leading-axis chunk size must divide the per-shard row count
(rows_per = edims[0]/n_grid), so every block lives entirely on one shard
and global block numbering is shard-contiguous.  Full-rank state is dense
in the global dimension and belongs on one chip or in the dp path.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.cg import pcg
from ..ops.solve import spd_inverse
from ..utils import blocks as blk
from .fft_sharded import (
    GridShardInfo,
    host_weights,
    local_circulant_apply,
    local_mask,
    local_spectrum_weights,
    local_whiten,
    local_whiten_diff,
    weights_pspec,
)

__all__ = [
    "mp_batch_solve",
    "mp_predict",
    "mp_shard_state",
    "grid_state_spec",
    "make_mp_kn_fn",
    "mp_elbo_and_grads",
    "mp_svigp_fit",
]

LN2PI = math.log(2.0 * math.pi)


def _check_model(model):
    if model.family not in ("mean-field", "block"):
        raise ValueError(
            "grid-sharded (model-parallel) HIP-GP supports the mean-field "
            f"and block families; got {model.family!r}"
        )
    if model.whitened_type != "ziggy":
        raise ValueError("grid sharding requires whitened_type='ziggy'")


def _local_block_indices(model, info: GridShardInfo):
    """(blk_idx, inverse, nb_local) for the blocks owned by one grid shard.

    Every shard owns the same LOCAL index tables: within a shard, the flat
    layout is the C order of ``(rows_per,) + edims[1:]`` (nd >= 2) or a
    contiguous run of ``Mp_local`` entries (nd == 1, four-step order is
    row-contiguous), so `utils.blocks.block_indices` over the LOCAL dims
    reproduces exactly the shard's slice of the global block enumeration
    (blocks enumerate the leading chunk coordinate slowest, which is the
    sharded coordinate)."""
    sizes = model.block_sizes
    if info.nd == 1:
        local_dims = (info.Mp_local,)
        if info.Mp_local % sizes[0]:
            raise ValueError(
                f"block size {sizes[0]} does not divide the per-shard length "
                f"{info.Mp_local} (= edims[0]/n_grid); choose a block size "
                "dividing it, or fewer shards"
            )
    else:
        local_dims = (info.rows_per,) + info.edims[1:]
        if info.rows_per % sizes[0]:
            raise ValueError(
                f"leading block chunk {sizes[0]} does not divide the "
                f"per-shard row count {info.rows_per} (= edims[0]/n_grid); "
                "choose an aligned block size, or fewer shards"
            )
    bidx, binv = blk.block_indices(local_dims, sizes)
    return jnp.asarray(bidx), jnp.asarray(binv), bidx.shape[0]


def _local_block_mul(S_block, v, bidx, binv):
    """(nb_loc, bs, bs) block-diag applied to (bsz, Mp_local) local vectors."""
    vb = blk.to_blocks(v, bidx)
    Sv = jnp.einsum("nij,bnj->bni", S_block, vb)
    return blk.from_blocks(Sv, binv)


def _full_knm(model, params, xb, integrated_obs, semi_integrated_estimator,
              semi_integrated_samps, key):
    """(bsz, M) ORIGINAL-space cross-covariance — the gram mean solver's
    M-space accumulation unit (replicated over 'grid'; M is small in the
    gram regime, M' is what gets sharded)."""
    if integrated_obs:
        if semi_integrated_estimator == "analytic":
            from ..kernels import k_semi_sqexp

            return k_semi_sqexp(model.xinduce, xb, params).T
        if semi_integrated_estimator == "mc-biased":
            from ..kernels import k_semi_mc

            k = key if key is not None else jax.random.PRNGKey(0)
            return k_semi_mc(k, model.kernel, model.xinduce, xb, params,
                             npts=semi_integrated_samps).T
        raise ValueError(f"unknown estimator {semi_integrated_estimator!r}")
    return model.kernel(xb, model.xinduce, params)


def _local_orig_indices(model, info: GridShardInfo, gidx):
    """(flat original-space indices (Mp_local,), validity mask) for this
    shard's expanded slots: position j of the local expanded slice maps to
    original flat index idx[j] when mask[j], else idx[j] is clipped junk."""
    dims = model.dims
    if info.nd == 1:
        flat = gidx * info.Mp_local + jnp.arange(info.Mp_local)
        return jnp.clip(flat, 0, dims[0] - 1), flat < dims[0]
    rows_per = info.rows_per
    r = gidx * rows_per + jnp.arange(rows_per)
    rvalid = r < dims[0]
    tshape = info.edims[1:]
    tidx = jnp.zeros((), jnp.int32)
    tvalid = jnp.ones((), bool)
    stride = 1
    # trailing original flat index + validity, built axis by axis (C order)
    for a in range(len(dims) - 1, 0, -1):
        j = jnp.arange(tshape[a - 1])
        shape = [1] * (len(dims) - 1)
        shape[a - 1] = tshape[a - 1]
        j = j.reshape(shape)
        tidx = tidx + jnp.minimum(j, dims[a] - 1) * stride
        tvalid = tvalid & (j < dims[a])
        stride *= dims[a]
    idx = jnp.clip(r, 0, dims[0] - 1)[:, None] * stride + tidx.reshape(1, -1)
    valid = rvalid[:, None] & tvalid.reshape(1, -1)
    return idx.reshape(-1), valid.reshape(-1)


def _local_embed_from_orig(v, idx, mask, dtype):
    """(B, M) replicated original-space vectors -> (B, Mp_local) local
    expanded slice (original entries in place, padding zeros)."""
    return v[:, idx] * mask.astype(dtype)[None, :]


def _local_crop_psum(out_local, idx, mask, M, grid_axis):
    """(B, Mp_local) local expanded -> (B, M) original-space, reassembled
    across grid shards (each original slot is owned by exactly one shard)."""
    B = out_local.shape[0]
    vals = out_local * mask.astype(out_local.dtype)[None, :]
    full = jnp.zeros((B, M), out_local.dtype).at[:, idx].add(vals)
    return jax.lax.psum(full, grid_axis)


def grid_state_spec(model, grid_axis: str = "grid"):
    """HIPGPState-shaped PartitionSpec pytree: thetas sharded over the grid
    axis, scalars replicated."""
    from ..models.hipgp import HIPGPState

    return HIPGPState(
        theta1=P(grid_axis),
        theta2=P(grid_axis),
        log_sig2=P(),
        log_ell=P(),
        log_noise2=P(),
    )


def mp_shard_state(state, mesh: Mesh, grid_axis: str = "grid"):
    """Place a mean-field/block state with its theta leaves sharded over
    the grid axis (block theta2 shards on the block axis; scalars
    replicated)."""
    spec = grid_state_spec(None, grid_axis)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), state, spec
    )


def _local_embedded_knm(
    model,
    params,
    xb: jnp.ndarray,
    info: GridShardInfo,
    shard_idx,
    integrated_obs: bool = False,
    semi_integrated_estimator: str = "analytic",
    semi_integrated_samps: int = 10,
    key=None,
) -> jnp.ndarray:
    """The local slice of Knm, evaluated directly in the expanded layout.

    Returns (bsz, Mp_local): rows of the circulant embedding of Knm owned by
    this grid shard — original-grid positions hold k(x_b, z_j), padding
    positions are zero.  Each device touches only M/n_grid inducing points.
    """
    dims = model.dims
    dtype = model.dtype
    bsz = xb.shape[0]

    if info.nd == 1:
        flat = shard_idx * info.Mp_local + jnp.arange(info.Mp_local)
        valid = flat < dims[0]
        g = model.xgrids[0][jnp.clip(flat, 0, dims[0] - 1)]
        pts = g[:, None]
        row_mask = valid.astype(dtype)
        local_dims = (info.Mp_local,)
        local_shape = (info.Mp_local,)
    else:
        rows_per = info.rows_per
        ridx = shard_idx * rows_per + jnp.arange(rows_per)
        valid = ridx < dims[0]
        g0 = model.xgrids[0][jnp.clip(ridx, 0, dims[0] - 1)]
        mesh_pts = jnp.meshgrid(g0, *model.xgrids[1:], indexing="ij")
        pts = jnp.stack([m.reshape(-1) for m in mesh_pts], axis=-1)
        row_mask = valid.astype(dtype)
        local_dims = (rows_per,) + dims[1:]
        local_shape = info.local_shape

    def eval_knm(_):
        if integrated_obs:
            if semi_integrated_estimator == "analytic":
                from ..kernels import k_semi_sqexp

                return k_semi_sqexp(pts, xb, params).T  # (bsz, n_local_pts)
            if semi_integrated_estimator == "mc-biased":
                from ..kernels import k_semi_mc

                k = key if key is not None else jax.random.PRNGKey(0)
                return k_semi_mc(k, model.kernel, pts, xb, params,
                                 npts=semi_integrated_samps).T
            raise ValueError(
                f"unknown estimator {semi_integrated_estimator!r}"
            )
        return model.kernel(xb, pts, params)  # (bsz, n_local_pts)

    # shards entirely inside the circulant padding region (the upper rows of
    # the expanded leading axis — up to HALF the shards) skip the kernel
    # evaluation outright; shard_idx is traced, so this is a real runtime
    # branch, not a compile-time one
    Knm = jax.lax.cond(
        jnp.any(valid),
        eval_knm,
        lambda _: jnp.zeros((bsz, pts.shape[0]), dtype),
        operand=None,
    )

    x = Knm.reshape((bsz,) + local_dims)
    if info.nd == 1:
        x = x * row_mask[None, :]
        return x
    x = x * row_mask.reshape((1, -1) + (1,) * (len(dims) - 1))
    pad = [(0, 0), (0, 0)] + [
        (0, e - d) for d, e in zip(dims[1:], info.edims[1:])
    ]
    x = jnp.pad(x, pad)
    return x.reshape(bsz, -1)


def _local_standard_params(model, theta1_loc, theta2_loc, bidx=None,
                           binv=None):
    """(qm, qS) local slices from the stored parameterization.

    Mean-field: theta2_loc (Mp_local,).  Block: theta2_loc
    (nb_local, bs, bs) — the inverse/multiply are block-local, so the
    conversion needs no collective."""
    if model.parameterization == "standard":
        return theta1_loc, theta2_loc
    if model.family == "mean-field":
        qS = -0.5 / theta2_loc
        return qS * theta1_loc, qS
    qS = spd_inverse(-2.0 * theta2_loc)
    qm = _local_block_mul(qS, theta1_loc[None, :], bidx, binv)[0]
    return qm, qS


def _local_knSkn(model, kn, qS, bidx=None, binv=None):
    """Local contribution to diag(kn S kn^T); caller psums over 'grid'."""
    if model.family == "mean-field":
        return (kn * kn) @ qS
    Skn = _local_block_mul(qS, kn, bidx, binv)
    return jnp.sum(kn * Skn, axis=-1)


def _local_kl(model, qm, qS):
    """Local KL contribution (sum over this shard's coords/blocks);
    caller psums over 'grid'.  Both families' KL terms are sums over
    independent per-coordinate / per-block pieces."""
    if model.family == "mean-field":
        return 0.5 * jnp.sum(qS + qm * qm - 1.0 - jnp.log(qS))
    from ..utils import stats

    return stats.block_kl_to_standard(qm, qS)


def _pad_rows(arrays, total, fills):
    """Leading-axis pad to ``total`` (shared contract with dp's padding)."""
    from .dp import _pad_to

    return _pad_to(total, *arrays, fills=fills)


def _gram_mean_solve(model, info, grid_axis, idx, vmask, wgt, A, bm,
                     maxiter, tol):
    """Woodbury mean solve under the grid sharding: z = (K + A)^{-1} b_m
    with K applied through the sharded circulant apply (PCG vectors (1, M)
    replicated over the whole mesh — every device runs the identical
    iteration), then mhat = R z via the sqrt-weight apply.  Returns
    (z (1, M), mhat (Mp_local,)).  Shared by the 'gram' mean solver in
    `mp_batch_solve` and the factored solver (`_factored_local`); mirrors
    `models/hipgp.py` gram semantics, distributed."""
    dtype = model.dtype

    def apply_w(v, w):
        emb = _local_embed_from_orig(v, idx, vmask, dtype)
        emb = emb.reshape((v.shape[0],) + info.local_shape)
        out = local_circulant_apply(emb, w, info, grid_axis)
        return _local_crop_psum(out.reshape(v.shape[0], -1),
                                idx, vmask, model.M, grid_axis)

    z = pcg(
        lambda v: apply_w(v, wgt) + v @ A,
        bm[None],
        precond=lambda v: apply_w(v, 1.0 / wgt),
        maxiter=maxiter, tol=tol,
    )
    embz = _local_embed_from_orig(z, idx, vmask, dtype)
    embz = embz.reshape((1,) + info.local_shape)
    mhat = local_circulant_apply(
        embz, jnp.sqrt(wgt), info, grid_axis
    ).reshape(-1)
    return z, mhat


def _assemble_theta(model, lam, mhat, bidx, binv, is_block, bs, dtype):
    """(theta1, theta2) from the local family-shaped Lambda and mean, in
    the model's parameterization — the shared tail of every mp solve."""
    if is_block:
        lam_I = lam + jnp.eye(bs, dtype=dtype)
        if model.parameterization == "standard":
            return mhat, spd_inverse(lam_I)
        return (_local_block_mul(lam_I, mhat[None, :], bidx, binv)[0],
                -0.5 * lam_I)
    lam_I = lam + 1.0
    if model.parameterization == "standard":
        return mhat, 1.0 / lam_I
    return mhat * lam_I, -0.5 * lam_I


def _factored_local(
    model, info, gidx, mask, wgt, xb, yb, wb, nsb, kb, *,
    params, ivar_of, local_lam, diag_of, bidx, binv, is_block,
    integrated_obs, semi_integrated_estimator, semi_integrated_samps,
    maxiter_cg, tol, mean_solver_maxiter, mean_solver_tol, factor_jitter,
    compute_elbo, N, dp_axis, grid_axis, ndp, log_noise2,
):
    """Per-device body of the factored mp solve (inside shard_map).

    Mirrors `models/hipgp.py:_batch_solve_factored` distributed: the data
    sweep accumulates only (A, b_m, scalars) — no whitening PCG — psum'd
    over dp; Lambda comes from grid-sharded whitening solves of the factor
    rows of A = L_A L_A^T, with the rows split over dp and the per-shard
    family-shaped Lambda psum'd back; the mean is the gram Woodbury solve;
    the ELBO assembles in closed form.  Returns
    (theta1_local, theta2_local, elbo, trKinvA, sKnn) — the last two feed
    the post-hoc exactness guard in `mp_batch_solve`.
    """
    dtype = model.dtype
    M = model.M

    def stats_of(carry, inp):
        A, bm, sy2, sKnn, slog = carry
        xl, yl, wl, nsl, kl = inp
        Knm = _full_knm(model, params, xl, integrated_obs,
                        semi_integrated_estimator, semi_integrated_samps, kl)
        yv = yl.reshape(-1)
        ivar = ivar_of(wl, nsl)
        logs = (jnp.log(nsl) if nsl is not None
                else 0.5 * log_noise2 * jnp.ones_like(wl))
        # HIGHEST, as in the single-device factored path: the default bf16
        # dot leaves A indefinite at scale
        A = A + jnp.einsum("bi,bj,b->ij", Knm, Knm, ivar,
                           precision=jax.lax.Precision.HIGHEST)
        bm = bm + jnp.einsum("bi,b->i", Knm, ivar * yv,
                             precision=jax.lax.Precision.HIGHEST)
        sy2 = sy2 + jnp.sum(ivar * yv * yv)
        sKnn = sKnn + jnp.sum(ivar * diag_of(xl).reshape(-1))
        slog = slog + jnp.sum(wl * (-logs - 0.5 * LN2PI))
        return (A, bm, sy2, sKnn, slog), None

    zero = jnp.zeros((), dtype)
    carry0 = (jnp.zeros((M, M), dtype), jnp.zeros((M,), dtype),
              zero, zero, zero)
    carry0 = jax.lax.pcast(carry0, (dp_axis, grid_axis), to="varying")
    if nsb is not None:
        carry, _ = jax.lax.scan(stats_of, carry0, (xb, yb, wb, nsb, kb))
    else:
        carry, _ = jax.lax.scan(
            lambda c, i: stats_of(c, (i[0], i[1], i[2], None, i[3])),
            carry0, (xb, yb, wb, kb),
        )
    A, bm, sy2, sKnn, slog = jax.lax.psum(carry, dp_axis)

    eps = factor_jitter * jnp.mean(jnp.diagonal(A))
    L_A = jnp.linalg.cholesky(A + eps * jnp.eye(M, dtype=dtype))

    # G sweep: whitening solves of the factor rows, rows split over dp
    # (each dp shard solves its own slice concurrently), grid-sharded
    # transforms within each solve; zero pad rows contribute exactly zero
    idx, vmask = _local_orig_indices(model, info, gidx)
    dpidx = jax.lax.axis_index(dp_axis)
    rows_per_dp = -(-M // ndp)
    cs = min(rows_per_dp, 512)
    nc = -(-rows_per_dp // cs)
    per_dp = nc * cs
    Lt = L_A.T
    total = ndp * per_dp
    if total != M:
        Lt = jnp.pad(Lt, ((0, total - M), (0, 0)))
    rows_dp = jax.lax.dynamic_slice_in_dim(Lt, dpidx * per_dp, per_dp, 0)
    rows_dp = rows_dp.reshape(nc, cs, M)

    def gstep(carry, rows):
        lam_acc, tr_acc = carry
        emb = _local_embed_from_orig(rows, idx, vmask, dtype)
        Gc = local_whiten(emb, wgt, info, grid_axis,
                          maxiter=maxiter_cg, tol=tol, mask=mask)
        ones = jnp.ones((cs,), dtype)
        return (lam_acc + local_lam(ones, Gc),
                tr_acc + jnp.sum(Gc * Gc)), None

    bs = model.block_size if is_block else 0
    nb_loc = bidx.shape[0] if is_block else 0
    lam0 = (jnp.zeros((nb_loc, bs, bs), dtype) if is_block
            else jnp.zeros((info.Mp_local,), dtype))
    (lam_p, tr_p), _ = jax.lax.scan(gstep, (lam0, zero), rows_dp)
    lam = jax.lax.psum(lam_p, dp_axis)
    trKinvA = jax.lax.psum(jax.lax.psum(tr_p, grid_axis), dp_axis)

    # mean: the gram Woodbury solve m = R (K + A)^{-1} b_m
    z, mhat = _gram_mean_solve(model, info, grid_axis, idx, vmask, wgt,
                               A, bm, mean_solver_maxiter, mean_solver_tol)
    theta1, theta2 = _assemble_theta(model, lam, mhat, bidx, binv,
                                     is_block, bs, dtype)

    if not compute_elbo:
        return theta1, theta2, zero, trKinvA, sKnn, zero

    qm, qS = _local_standard_params(model, theta1, theta2, bidx, binv)
    zv = z.reshape(-1)
    quad = zv @ (A @ zv) - 2.0 * (zv @ bm) + sy2
    sSkn = jax.lax.psum(jnp.sum(qS * lam), grid_axis)
    total_an = -0.5 * (quad + sKnn - trKinvA + sSkn) + slog
    kl = jax.lax.psum(_local_kl(model, qm, qS), grid_axis)
    elbo = total_an / N - kl / model.N
    return theta1, theta2, elbo, trKinvA, sKnn, sSkn


def _sharded_spectrum_kappa(model, state, mesh, info, grid_axis):
    """Spectrum dynamic range under spectrum_mode='sharded', computed
    without any device materializing all M' eigenvalues: each grid shard
    builds its local weights and only the extrema are reduced."""
    params = (jnp.exp(state.log_sig2), jnp.exp(state.log_ell))
    kfun = lambda a, b: model.kernel(a, b, params)
    axes = tuple(mesh.axis_names)

    def local_fn():
        w = local_spectrum_weights(model.xgrids, kfun, info, grid_axis,
                                   jitter=model.jitter)
        return (jax.lax.pmax(jnp.max(w), axes),
                jax.lax.pmin(jnp.min(w), axes))

    hi, lo = jax.jit(
        shard_map(local_fn, mesh=mesh, in_specs=(), out_specs=(P(), P()))
    )()
    return float(hi) / float(lo)


def mp_batch_solve(
    model,
    state,
    xobs: jnp.ndarray,
    yobs: jnp.ndarray,
    noise_std: Optional[jnp.ndarray],
    mesh: Mesh,
    batch_size: int = 1024,
    maxiter_cg: int = 10,
    tol: float = 1e-8,
    mean_solver_maxiter: int = 200,
    mean_solver_tol: float = 1e-8,
    integrated_obs: bool = False,
    semi_integrated_estimator: str = "analytic",
    semi_integrated_samps: int = 10,
    key=None,
    compute_elbo: bool = False,
    mean_solver: str = "cg",
    spectrum_mode: str = "host",
    dp_axis: str = "dp",
    grid_axis: str = "grid",
    factor_jitter: Optional[float] = None,
):
    """Closed-form optimal q (mean-field/block) with M' sharded over ``grid_axis``
    and data rows over ``dp_axis`` (`ziggy/hipgp.py:278-368`, distributed).

    Returns the new state (theta vectors grid-sharded), or
    ``(new_state, elbo)`` when ``compute_elbo``.

    ``mean_solver``:

    * 'cg' (default) — solve (I + sum_n kn kn^T/s_n^2) m = b by CG with the
      kn stack kept sharded both ways: O(N_local x M'/n_grid) memory per
      device; the ELBO pass reuses the stack (no second whitening sweep).
    * 'gram' — the exact Woodbury collapse m = R (K + A)^{-1} b_m
      (`models/hipgp.py` batch_solve, distributed): A = sum_n Knm_n
      Knm_n^T/s_n^2 is an M-space object accumulated over 'dp' (replicated
      over 'grid'); the (K + A) PCG runs with K as the grid-sharded
      circulant apply.  NO kn stack is kept — per-device memory is
      O(M^2 + bsz x M'/n_grid), independent of N and M', so this is the
      path for M' beyond what the stacked-kn profile can hold.  The ELBO
      pass (if requested) recomputes kn batch-by-batch.
    * 'factored' — the O(M)-solve collapse (`models/hipgp.py`
      `_batch_solve_factored`, distributed): the data sweep accumulates
      only (A, b_m, ELBO scalars) with NO whitening PCG at all; Lambda
      comes from grid-sharded whitening solves of the M Cholesky-factor
      columns of A, with the factor ROWS split over 'dp' (each dp shard
      whitens M/n_dp rows concurrently) and the per-shard Lambda psum'd
      over 'dp'; the mean is the gram Woodbury solve; the ELBO is
      assembled in closed form from (z A z, ||G||_F^2, sum S (Lambda-I)).
      The jitter on chol(A) is one-shot (the dtype-scaled default of the
      single-device path — no escalation ladder inside shard_map); the
      tr(K^{-1}A) <= sum ivar Knn exactness guard runs AFTER the jitted
      solve and falls back to 'gram' with a RuntimeWarning on violation.

    ``spectrum_mode``: 'host' builds the full spectrum host-side and
    shards it ('round-2' behavior); 'sharded' builds it in-graph via
    `fft_sharded.local_spectrum_weights` — per-device peak memory O(M'/n),
    no device ever materializes all M' eigenvalues.
    """
    _check_model(model)
    if mean_solver not in ("cg", "gram", "factored"):
        raise ValueError(
            f"mean_solver={mean_solver!r}; choose 'cg' | 'gram' | 'factored'"
        )
    if spectrum_mode not in ("host", "sharded"):
        raise ValueError(f"spectrum_mode={spectrum_mode!r}")
    ndp = mesh.shape[dp_axis]
    ng = mesh.shape[grid_axis]
    if spectrum_mode == "host":
        spec = model.spectrum(state)
        info = GridShardInfo(spec, ng)
        w_host = host_weights(spec, info)
        if (
            mean_solver == "factored"
            and np.dtype(model.dtype) == np.dtype(np.float32)
            and not isinstance(spec.eigs, jax.core.Tracer)
        ):
            # same f32 trust-region pre-check as the single-device factored
            # path (models/hipgp.py: the f32 factor of A cannot resolve the
            # spectral tail beyond kappa ~ 1e3 — measured theta2 error 0.18
            # at kappa 4.1e3, deterministic)
            kap = float(jnp.max(spec.eigs) / jnp.min(spec.eigs))
            if kap > 1e3:
                import warnings

                warnings.warn(
                    "mp factored solve declined: spectrum dynamic range "
                    f"{kap:.2e} exceeds the measured f32 trust region "
                    "(1e3); falling back to the sweep-based 'gram' solver",
                    RuntimeWarning,
                )
                mean_solver = "gram"
    else:
        info = _static_shard_info(model, ng)
        w_host = jnp.zeros((), model.dtype)  # dummy; built per-shard in-graph
        if (
            mean_solver == "factored"
            and np.dtype(model.dtype) == np.dtype(np.float32)
            and not isinstance(state.log_ell, jax.core.Tracer)
        ):
            # the same f32 trust-region pre-check as the host branch above
            # — sharded mode must not silently skip it (the post-hoc
            # tr(K^{-1}A) check alone is insufficient; see models/hipgp.py)
            kap = _sharded_spectrum_kappa(model, state, mesh, info,
                                          grid_axis)
            if kap > 1e3:
                import warnings

                warnings.warn(
                    "mp factored solve declined: spectrum dynamic range "
                    f"{kap:.2e} exceeds the measured f32 trust region "
                    "(1e3); falling back to the sweep-based 'gram' solver",
                    RuntimeWarning,
                )
                mean_solver = "gram"

    N = xobs.shape[0]
    y = yobs.reshape(-1)
    ns = None if noise_std is None else noise_std.reshape(-1)
    dtype = model.dtype

    bsz_loc = -(-min(batch_size, N) // ndp)
    chunk = bsz_loc * ndp
    nsteps = -(-N // chunk)
    total = nsteps * chunk
    w = jnp.ones((N,), dtype)
    x_p, y_p, w_p, ns_p = _pad_rows((xobs, y, w, ns), total,
                                    fills=(0.0, 0.0, 0.0, 1.0))
    x_p = x_p.reshape(nsteps, chunk, -1)
    y_p = y_p.reshape(nsteps, chunk)
    w_p = w_p.reshape(nsteps, chunk)
    ns_p = None if ns_p is None else ns_p.reshape(nsteps, chunk)
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, nsteps)

    params = (jnp.exp(state.log_sig2), jnp.exp(state.log_ell))
    has_ns = ns_p is not None
    is_block = model.family == "block"
    if is_block:
        bidx, binv, nb_loc = _local_block_indices(model, info)
    else:
        bidx = binv = None

    kfun = lambda a, b: model.kernel(a, b, params)
    use_gram = mean_solver == "gram"
    use_factored = mean_solver == "factored"
    if factor_jitter is None:
        factor_jitter = (
            1e-4 if np.dtype(dtype) == np.dtype(np.float32) else 1e-10
        )

    def local_fn(log_noise2, xb, yb, wb, nsb, kb, wgt):
        gidx = jax.lax.axis_index(grid_axis)
        if spectrum_mode == "sharded":
            wgt = local_spectrum_weights(model.xgrids, kfun, info, grid_axis,
                                         jitter=model.jitter)
        mask = local_mask(info, gidx, dtype)
        Mp_loc = info.Mp_local

        def ivar_of(wl, nsl):
            if nsl is not None:
                return wl / (nsl * nsl)
            return wl * jnp.exp(-log_noise2)

        def local_lam(ivar, kn):
            if not is_block:
                return jnp.sum(ivar[:, None] * kn * kn, axis=0)
            knb = blk.to_blocks(kn, bidx)  # (bsz, nb_loc, bs)
            return jnp.einsum("bni,bnj,b->nij", knb, knb, ivar)

        def local_kn(xl, kl):
            knm = _local_embedded_knm(
                model, params, xl, info, gidx,
                integrated_obs, semi_integrated_estimator,
                semi_integrated_samps, kl,
            )
            return local_whiten(knm, wgt, info, grid_axis,
                                maxiter=maxiter_cg, tol=tol, mask=mask)

        def diag_of(x_all):
            if integrated_obs:
                return model.diag_interp(x_all, params)
            return model.kernel.diag(x_all, params)

        if use_factored:
            return _factored_local(
                model, info, gidx, mask, wgt,
                xb, yb, wb, (nsb if has_ns else None), kb,
                params=params, ivar_of=ivar_of, local_lam=local_lam,
                diag_of=diag_of, bidx=bidx, binv=binv, is_block=is_block,
                integrated_obs=integrated_obs,
                semi_integrated_estimator=semi_integrated_estimator,
                semi_integrated_samps=semi_integrated_samps,
                maxiter_cg=maxiter_cg, tol=tol,
                mean_solver_maxiter=mean_solver_maxiter,
                mean_solver_tol=mean_solver_tol,
                factor_jitter=factor_jitter, compute_elbo=compute_elbo,
                N=N, dp_axis=dp_axis, grid_axis=grid_axis, ndp=ndp,
                log_noise2=log_noise2,
            )

        def body(carry, inp):
            xl, yl, wl, nsl, kl = inp
            ivar = ivar_of(wl, nsl)
            kn = local_kn(xl, kl)
            if use_gram:
                lam_a, A_a, bm_a, sy2, sKnnA, sknknA, slogA = carry
                Knm = _full_knm(model, params, xl, integrated_obs,
                                semi_integrated_estimator,
                                semi_integrated_samps, kl)
                # HIGHEST, matching the single-device gram sweep: the bf16
                # default degrades the Woodbury mean through A
                A_a = A_a + jnp.einsum("bi,bj,b->ij", Knm, Knm, ivar,
                                       precision=jax.lax.Precision.HIGHEST)
                bm_a = bm_a + jnp.einsum("bi,b->i", Knm, ivar * yl,
                                         precision=jax.lax.Precision.HIGHEST)
                sy2 = sy2 + jnp.sum(ivar * yl * yl)
                sKnnA = sKnnA + jnp.sum(ivar * diag_of(xl).reshape(-1))
                # grid-partial: kn is this shard's M'/n_grid slice
                sknknA = sknknA + jnp.sum(ivar * jnp.sum(kn * kn, axis=-1))
                logs = (jnp.log(nsl) if nsl is not None
                        else 0.5 * log_noise2 * jnp.ones_like(wl))
                slogA = slogA + jnp.sum(wl * (-logs - 0.5 * LN2PI))
                return (lam_a + local_lam(ivar, kn), A_a, bm_a,
                        sy2, sKnnA, sknknA, slogA), None
            lam_a, b_a = carry
            lam_a = lam_a + local_lam(ivar, kn)
            b_a = b_a + kn.T @ (ivar * yl)
            return (lam_a, b_a), (kn, ivar)

        bs = model.block_size if is_block else 0
        lam0 = (
            jnp.zeros((nb_loc, bs, bs), dtype) if is_block
            else jnp.zeros((Mp_loc,), dtype)
        )
        zscal = jnp.zeros((), dtype)
        if use_gram:
            carry0 = (lam0, jnp.zeros((model.M, model.M), dtype),
                      jnp.zeros((model.M,), dtype),
                      zscal, zscal, zscal, zscal)
        else:
            carry0 = (lam0, jnp.zeros((Mp_loc,), dtype))
        carry0 = jax.lax.pcast(carry0, (dp_axis, grid_axis), to="varying")
        if has_ns:
            carry, ys = jax.lax.scan(body, carry0, (xb, yb, wb, nsb, kb))
        else:
            carry, ys = jax.lax.scan(
                lambda c, i: body(c, (i[0], i[1], i[2], None, i[3])),
                carry0, (xb, yb, wb, kb),
            )
        # information-form sums are over ALL data: reduce over dp
        if use_gram:
            lam, A, bm, sy2, sKnn, sknkn_p, slog = jax.lax.psum(carry, dp_axis)
            sknkn = jax.lax.psum(sknkn_p, grid_axis)
        else:
            (lam, b) = jax.lax.psum(carry, dp_axis)
            kn_stack, ivar_stack = ys
            kn_all = kn_stack.reshape(-1, Mp_loc)  # (N_local, Mp_local)
            ivar_all = ivar_stack.reshape(-1)

        def grid_dot(a, bb):
            return jax.lax.psum(jnp.sum(a * bb, axis=-1), grid_axis)

        if use_gram:
            # Woodbury: m = R (K + A)^{-1} b_m with K the grid-sharded
            # circulant apply (matmul_by_RT semantics, distributed)
            idx, vmask = _local_orig_indices(model, info, gidx)
            z, mhat = _gram_mean_solve(
                model, info, grid_axis, idx, vmask, wgt, A, bm,
                mean_solver_maxiter, mean_solver_tol,
            )
        else:
            # optimal mean: (I + sum_n kn kn^T / s_n^2) m = b by CG with the
            # kn stack sharded both ways; m grid-sharded, replicated over dp
            def big_mv(v):  # v: (1, Mp_local)
                u = jax.lax.psum(kn_all @ v[0], grid_axis)  # (N_local,)
                r = jax.lax.psum(kn_all.T @ (ivar_all * u), dp_axis)
                return v + r[None]

            mhat = pcg(big_mv, b[None], maxiter=mean_solver_maxiter,
                       tol=mean_solver_tol, dot_fn=grid_dot)[0]

        theta1, theta2 = _assemble_theta(model, lam, mhat, bidx, binv,
                                         is_block, bs, dtype)

        if not compute_elbo:
            zero = jnp.zeros((), dtype)
            return theta1, theta2, zero, zero, zero, zero

        qm, qS = _local_standard_params(model, theta1, theta2, bidx, binv)

        def an_of(kn, x_all, y_all, ivar, nsl):
            knm_m = jax.lax.psum(kn @ qm, grid_axis)
            knkn = jax.lax.psum(jnp.sum(kn * kn, axis=-1), grid_axis)
            knSkn = jax.lax.psum(_local_knSkn(model, kn, qS, bidx, binv),
                                 grid_axis)
            log_ns = jnp.log(nsl) if nsl is not None else 0.5 * log_noise2
            return (
                -0.5 * ivar * ((knm_m - y_all) ** 2 + diag_of(x_all)
                               - knkn + knSkn)
                - log_ns
                - 0.5 * LN2PI
            )

        if use_gram:
            # one-sweep closed form (matching the single-device gram
            # rework): the data quadratic collapses onto (A, b_m, z); kn.kn
            # and kn S kn come from the SWEPT kn accumulated in pass 1 —
            # reference-consistent truncation, no second whitening sweep
            zv = z.reshape(-1)
            quad = zv @ (A @ zv) - 2.0 * (zv @ bm) + sy2
            sSkn = jax.lax.psum(jnp.sum(qS * lam), grid_axis)
            total_an = -0.5 * (quad + sKnn - sknkn + sSkn) + slog
        else:
            y_all = yb.reshape(-1)
            w_all = wb.reshape(-1)
            ns_all = nsb.reshape(-1) if has_ns else None
            x_all = xb.reshape(-1, xb.shape[-1])
            an = an_of(kn_all, x_all, y_all, ivar_all, ns_all)
            total_an = jax.lax.psum(jnp.sum(an * w_all), dp_axis)

        kl = jax.lax.psum(_local_kl(model, qm, qS), grid_axis)
        elbo = total_an / N - kl / model.N
        zero = jnp.zeros((), dtype)
        return theta1, theta2, elbo, zero, zero, zero

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(),
            P(None, dp_axis, None),
            P(None, dp_axis),
            P(None, dp_axis),
            (P(None, dp_axis) if has_ns else P()),
            P(),
            (weights_pspec(info, grid_axis) if spectrum_mode == "host"
             else P()),
        ),
        out_specs=(P(grid_axis), P(grid_axis), P(), P(), P(), P()),
        check_vma=False,
    )
    theta1, theta2, elbo, tr_g, sknn_g, sskn_g = jax.jit(fn)(
        state.log_noise2, x_p, y_p, w_p,
        ns_p if has_ns else jnp.zeros((), dtype), keys, w_host,
    )
    if use_factored:
        # post-hoc exactness guard (same identity + thresholds as the
        # single-device path: tr(K^-1 A) <= sum ivar Knn up to 1.2x benign
        # CG-roundoff margin); values are concrete here — on violation,
        # warn and fall back to the sweep-based 'gram' solver
        tr_f, sk_f = float(tr_g), float(sknn_g)
        bracket_bad = compute_elbo and (
            sk_f - tr_f + float(sskn_g) < -1e-3 * sk_f
        )
        if not np.isfinite(tr_f) or tr_f > 1.2 * sk_f + 1e-6 or bracket_bad:
            import warnings

            warnings.warn(
                f"mp factored solve failed its exactness check "
                f"(tr(K^-1 A) = {tr_f:.4e} vs sum ivar Knn = {sk_f:.4e}); "
                "falling back to the sweep-based 'gram' solver",
                RuntimeWarning,
            )
            return mp_batch_solve(
                model, state, xobs, yobs, noise_std, mesh,
                batch_size=batch_size, maxiter_cg=maxiter_cg, tol=tol,
                mean_solver_maxiter=mean_solver_maxiter,
                mean_solver_tol=mean_solver_tol,
                integrated_obs=integrated_obs,
                semi_integrated_estimator=semi_integrated_estimator,
                semi_integrated_samps=semi_integrated_samps,
                key=key, compute_elbo=compute_elbo, mean_solver="gram",
                spectrum_mode=spectrum_mode, dp_axis=dp_axis,
                grid_axis=grid_axis,
            )
    new_state = state.replace(theta1=theta1, theta2=theta2)
    if compute_elbo:
        return new_state, elbo
    return new_state


def mp_predict(
    model,
    state,
    x: jnp.ndarray,
    mesh: Mesh,
    batch_size: int = 1024,
    maxiter_cg: int = 50,
    tol: float = 1e-8,
    var_clamp: float = 1e-5,
    integrated_obs: bool = False,
    semi_integrated_estimator: str = "analytic",
    semi_integrated_samps: int = 10,
    key=None,
    spectrum_mode: str = "host",
    dp_axis: str = "dp",
    grid_axis: str = "grid",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mu*, sig*) with prediction rows sharded over 'dp' and every kn
    contraction sharded over 'grid' (`ziggy/hipgp.py:416-446`, distributed).

    ``spectrum_mode='sharded'`` builds the spectrum in-graph per shard
    (O(M'/n) peak per-device memory) — see `mp_batch_solve`."""
    _check_model(model)
    ndp = mesh.shape[dp_axis]
    ng = mesh.shape[grid_axis]
    if spectrum_mode == "host":
        spec = model.spectrum(state)
        info = GridShardInfo(spec, ng)
        w_host = host_weights(spec, info)
    else:
        info = _static_shard_info(model, ng)
        w_host = jnp.zeros((), model.dtype)
    dtype = model.dtype

    N = x.shape[0]
    bsz_loc = -(-min(batch_size, N) // ndp)
    chunk = bsz_loc * ndp
    nsteps = -(-N // chunk)
    total = nsteps * chunk
    (x_p,) = _pad_rows((x,), total, fills=(0.0,))
    x_p = x_p.reshape(nsteps, chunk, -1)
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, nsteps)

    params = (jnp.exp(state.log_sig2), jnp.exp(state.log_ell))
    if model.family == "block":
        bidx, binv, _ = _local_block_indices(model, info)
    else:
        bidx = binv = None

    def local_fn(theta1_loc, theta2_loc, xb, kb, wgt):
        gidx = jax.lax.axis_index(grid_axis)
        if spectrum_mode == "sharded":
            kfun = lambda a, b: model.kernel(a, b, params)
            wgt = local_spectrum_weights(model.xgrids, kfun, info, grid_axis,
                                         jitter=model.jitter)
        mask = local_mask(info, gidx, dtype)
        qm, qS = _local_standard_params(model, theta1_loc, theta2_loc,
                                        bidx, binv)

        def body(_, inp):
            xl, kl = inp
            knm = _local_embedded_knm(
                model, params, xl, info, gidx,
                integrated_obs, semi_integrated_estimator,
                semi_integrated_samps, kl,
            )
            kn = local_whiten(knm, wgt, info, grid_axis,
                              maxiter=maxiter_cg, tol=tol, mask=mask)
            mu = jax.lax.psum(kn @ qm, grid_axis)
            knkn = jax.lax.psum(jnp.sum(kn * kn, axis=-1), grid_axis)
            knSkn = jax.lax.psum(_local_knSkn(model, kn, qS, bidx, binv),
                                 grid_axis)
            if integrated_obs:
                Knn = model.diag_interp(xl, params)
            else:
                Knn = model.kernel.diag(xl, params)
            ktilde = jnp.maximum(Knn.reshape(-1) - knkn, var_clamp)
            sig = jnp.sqrt(ktilde + knSkn)
            return None, (mu, sig)

        _, (mu, sig) = jax.lax.scan(body, None, (xb, kb))
        return mu, sig

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(grid_axis),
            P(grid_axis),
            P(None, dp_axis, None),
            P(),
            (weights_pspec(info, grid_axis) if spectrum_mode == "host"
             else P()),
        ),
        out_specs=(P(None, dp_axis), P(None, dp_axis)),
        check_vma=False,
    )
    mu, sig = jax.jit(fn)(state.theta1, state.theta2, x_p, keys, w_host)
    return mu.reshape(-1)[:N], sig.reshape(-1)[:N]


# ---------------------------------------------------------------------------
# natural-gradient training under grid sharding
# ---------------------------------------------------------------------------


def _static_shard_info(model, n_shards: int) -> GridShardInfo:
    """GridShardInfo from the model's static grid layout (no spectrum build
    needed: the layout depends only on dims/edims, not hyperparameters)."""
    import types

    spec_like = types.SimpleNamespace(
        dims=model.dims, edims=model.edims, Mprime=model.Mprime
    )
    return GridShardInfo(spec_like, n_shards)


def make_mp_kn_fn(
    model,
    mesh: Mesh,
    maxiter_cg: int = 10,
    tol: float = 1e-8,
    integrated_obs: bool = False,
    semi_integrated_estimator: str = "analytic",
    semi_integrated_samps: int = 10,
    spectrum_mode: str = "host",
    dp_axis: str = "dp",
    grid_axis: str = "grid",
):
    """The grid-sharded whitening solve as an `elbo_and_grads` hook.

    Returns ``kn_fn(st, x, key) -> (kn, Knn_diag)`` where kn is the GLOBAL
    (bsz, M') whitened cross-covariance array laid out P(dp, grid): batch
    rows sharded over ``dp_axis``, whitened columns over ``grid_axis``.
    Each grid shard evaluates the kernel only against its own inducing rows
    (`_local_embedded_knm`) and the PCG whitening runs on expanded-space
    shards (`fft_sharded.local_whiten_diff` — differentiable in the
    hyperparameters via implicit diff, so hyper learning works through the
    sharded solve).  Every downstream contraction (ELBO, natural gradient)
    then runs on the sharded global arrays with XLA-inserted collectives.

    ``spectrum_mode='sharded'`` builds the spectrum in-graph per shard
    (`local_spectrum_weights` — all jnp ops, so hyper grads flow through
    the sharded build too); 'host' (default) materializes it host-side.

    This is the distributed counterpart of `ziggy/hipgp.py:117-146`
    ``compute_kn``; composed with ``elbo_and_grads`` it distributes the
    reference's natgrad step (`ziggy/hipgp.py:194-276`).
    """
    _check_model(model)
    if spectrum_mode not in ("host", "sharded"):
        raise ValueError(f"spectrum_mode={spectrum_mode!r}")
    ng = mesh.shape[grid_axis]
    info = _static_shard_info(model, ng)
    dtype = model.dtype

    # cosine-matmul spectrum build when all embedded axes are short: no FFT
    # custom call inside the partitioned natgrad graph (XLA's CPU fft thunk
    # rejects the layouts such graphs feed it, and tiny FFTs are slow on TPU)
    from ..ops.bttb import MATMUL_DFT_MAX_LEN

    spec_transform = (
        "matmul" if all(e <= MATMUL_DFT_MAX_LEN for e in model.edims)
        else "fft"
    )

    def kn_fn(st, x, key):
        params = (jnp.exp(st.log_sig2), jnp.exp(st.log_ell))
        if spectrum_mode == "host":
            spec = model.spectrum(st, transform=spec_transform)
            w_h = host_weights(spec, info)
        else:
            w_h = jnp.zeros((), dtype)
        if key is None:
            key = jax.random.PRNGKey(0)

        def local_fn(prm, kl, xl, wgt):
            gidx = jax.lax.axis_index(grid_axis)
            if spectrum_mode == "sharded":
                kf = lambda a, b: model.kernel(a, b, prm)
                wgt = local_spectrum_weights(model.xgrids, kf, info,
                                             grid_axis, jitter=model.jitter)
            mask = local_mask(info, gidx, dtype)
            knm = _local_embedded_knm(
                model, prm, xl, info, gidx,
                integrated_obs, semi_integrated_estimator,
                semi_integrated_samps, kl,
            )
            return local_whiten_diff(knm, wgt, info, grid_axis,
                                     maxiter=maxiter_cg, tol=tol, mask=mask)

        fn = shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(dp_axis, None),
                      (weights_pspec(info, grid_axis)
                       if spectrum_mode == "host" else P())),
            out_specs=P(dp_axis, grid_axis),
            check_vma=False,
        )
        kn = fn(params, key, x, w_h)
        if integrated_obs:
            Knn = model.diag_interp(x, params)
        else:
            Knn = model.kernel.diag(x, params)
        return kn, Knn

    return kn_fn


def mp_elbo_and_grads(
    model,
    state,
    x: jnp.ndarray,
    y: jnp.ndarray,
    noise_std: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    maxiter_cg: int = 10,
    tol: float = 1e-8,
    integrated_obs: bool = False,
    semi_integrated_estimator: str = "analytic",
    semi_integrated_samps: int = 10,
    key=None,
    weights: Optional[jnp.ndarray] = None,
    compute_hyper_grads: bool = False,
    spectrum_mode: str = "host",
    dp_axis: str = "dp",
    grid_axis: str = "grid",
):
    """Minibatch ELBO + natural gradient with the whitened state sharded
    over ``grid_axis`` and batch rows over ``dp_axis`` — the model-parallel
    natgrad step the reference's single-device loop cannot express
    (`ziggy/svi_gp.py:282-388` + `ziggy/hipgp.py:194-276`, distributed).

    Semantics are EXACTLY ``model.elbo_and_grads`` (it runs that very code);
    only the whitening solve is overridden with the grid-sharded kn_fn.
    The returned grads' theta leaves are grid-sharded like the state's.
    """
    kn_fn = make_mp_kn_fn(
        model, mesh, maxiter_cg=maxiter_cg, tol=tol,
        integrated_obs=integrated_obs,
        semi_integrated_estimator=semi_integrated_estimator,
        semi_integrated_samps=semi_integrated_samps,
        spectrum_mode=spectrum_mode,
        dp_axis=dp_axis, grid_axis=grid_axis,
    )
    return model.elbo_and_grads(
        state, x, y, noise_std,
        maxiter_cg=maxiter_cg,
        integrated_obs=integrated_obs,
        semi_integrated_estimator=semi_integrated_estimator,
        semi_integrated_samps=semi_integrated_samps,
        key=key, weights=weights,
        compute_hyper_grads=compute_hyper_grads,
        kn_fn=kn_fn,
    )


def mp_svigp_fit(
    model,
    state,
    xtrain,
    ytrain,
    noise_std_train,
    config,
    mesh: Mesh,
    spectrum_mode: str = "host",
    dp_axis: str = "dp",
    grid_axis: str = "grid",
    **fit_kwargs,
):
    """Grid+data-sharded natural-gradient SVI: `infer.svigp_fit` with the
    whitening solve distributed over the mesh (mean-field/block).

    The state's theta vectors are placed grid-sharded, batch rows commit to
    the dp axis, and the jitted epoch scan runs unchanged — every optimizer
    update stays elementwise on the shards.  The global batch size is
    rounded up to a dp multiple so rows shard evenly (padding rows carry
    zero weight, exactly as the single-device path).

    Returns (state, report) matching `infer.svigp_fit`; the returned state's
    thetas remain grid-sharded (use them directly with `mp_predict`).
    """
    from ..infer.fit import svigp_fit
    from .dp import make_dp_data_shard_fn, round_batch_to_mesh

    _check_model(model)
    N = int(np.asarray(xtrain).shape[0])
    config = round_batch_to_mesh(config, mesh, N, axis=dp_axis)

    kn_fn = make_mp_kn_fn(
        model, mesh,
        maxiter_cg=config.maxiter_cg,
        integrated_obs=config.integrated_obs,
        semi_integrated_estimator=config.semi_integrated_estimator,
        semi_integrated_samps=config.num_semi_mc_samples,
        spectrum_mode=spectrum_mode,
        dp_axis=dp_axis, grid_axis=grid_axis,
    )

    state = mp_shard_state(state, mesh, grid_axis)
    return svigp_fit(
        model, state, xtrain, ytrain, noise_std_train, config,
        kn_fn=kn_fn, data_shard_fn=make_dp_data_shard_fn(mesh, dp_axis),
        **fit_kwargs,
    )
