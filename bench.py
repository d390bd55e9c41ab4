"""Headline benchmark: the O(M log M) whitening solve K^{-1/2}v at one
million inducing points on a single chip — with a roofline account and
on-chip numerics regression guards.

Protocol mirrors the reference's pcg-vs-cholesky experiment
(`experiments-hip-gp/run_pcg_vs_cholesky.py`): time ``gram_solve`` (PCG with
circulant preconditioner + R^T multiply, 20 fixed iterations) on a 1-D grid
of M = 2^20 inducing points, batch of 8 right-hand sides, Matern-5/2.

Prints ONE JSON line.  Fields beyond the driver contract
(metric/value/unit/vs_baseline):

* ``vs_baseline`` — MEASURED speedup vs the dense Cholesky whitening at the
  largest M where Cholesky is feasible on this chip (same M both paths; no
  extrapolation).
* ``roofline_frac`` — minimum-HBM-traffic model / measured time.  The solve
  runs 2*maxiter+2 circulant applies; each apply's floor is one read+write
  of the packed complex buffer per FFT direction plus the real in/out.
* ``radix_bound_ms`` — applies x the measured BARRIER-FREE chained
  cropped self-dot apply (the actual PCG-iteration kernel: rectangular
  stage-1 tables, CG inner products emitted as stage-1-inverse partials).
  The CG state updates and scalar gates are NOT added: the solve measures
  ~0.1 ms/iter above the bare applies — they are hidden by pipeline
  overlap (proved in round 3 by the axpy-fusion experiment, whose rider
  kernels removed them outright and LOST 24 ms; RESULTS sec. 10).
  ``at_radix_bound`` means the solve carries no glue beyond our kernels.
  (The round-2 comparator measured against the standalone XLA FFT pair —
  42x slower than the radix kernels that replaced it — and had become
  trivially true; an earlier round-3 comparator added a modeled 9-vector
  state-update floor that double-counted overlapped traffic.)
* ``fft_pair_ms`` — the standalone XLA fwd+scale+inv c64 FFT pair at the
  same shape, kept as the what-XLA-would-give reference point.
* ``mxu2d_whiten20_ms`` / ``..._einsum_ms`` / ``..._speedup`` — the 2-D
  matmul-basis regime every paper-scale fit runs through (3droad sweep
  shape, M=128^2 batch 1024): the fused cropped-sandwich PCG
  (ops/mxu2d.py) vs the einsum chain, with the full 20-iteration solve
  anchored against an f64 numpy PCG+R^T oracle
  (``guards.mxu2d_whiten20_rel_f64``, threshold ``WHITEN_GUARD_RTOL``).
* ``mxu3d_whiten20_ms`` / ``..._einsum_ms`` / ``..._speedup`` — the 3-D
  regime of the dust-map flagship (M = 64x64x32 = 131k, batch 64): the
  fused outer-axis + weight-plane sandwich PCG (ops/mxu3d.py) vs the
  einsum chain, anchored by the same f64 full-solve oracle
  (``guards.mxu3d_whiten20_rel_f64``).
* ``guards`` — on-chip numerics regression checks (f32 device vs f64 numpy
  oracles) for the three measured v5e cliffs encoded in `ops/bttb.py`:
  the MXU matmul-basis transform, the long-axis packed-FFT path, and the
  batched-FFT corruption guard (FFT_SAFE_BATCH chunking) — plus
  ``gram_on_chip_rel``: the one-sweep gram solver (closed-form ELBO,
  HIGHEST data-Gram accumulation) against the dense reference path, and
  ``mp_on_chip_rel``: a 1x1 dp x grid mesh `mp_batch_solve` executed on
  the REAL chip against the single-device solver (the sharded code path's
  Mosaic/collective lowering, not just the CPU-mesh tests).  An XLA
  update silently moving a cliff flips ``guards.all_pass`` to false.

Run-to-run variance through the axon tunnel is ~±3% (measured 99-104 ms
across sessions at the same commit); single-ms deltas between published
numbers are noise, not regressions.
"""
import json
import math
import time

import numpy as np

HBM_BYTES_PER_S = 819e9  # v5e HBM bandwidth
GUARD_RTOL = 1e-4  # f32-vs-f64 oracle; the corruption mode is ~0.3 rel


def chain_time(f, x, reps=5, warm=3):
    """Chained-input steady-state timing (shared impl, utils/timing.py)."""
    from hipgp_tpu.utils.timing import chain_time as _ct

    return _ct(f, x, reps=reps, warmup=warm)


def numpy_circulant_apply_oracle(grid_h, dims, edims, ell, jitter, v):
    """f64 numpy oracle for matmul_by_K on a unit-spaced SqExp grid:
    wrapped-lag embedding -> rfftn eigs (clamped) -> apply -> crop."""
    coords = []
    for L, h in zip(edims, grid_h):
        j = np.arange(L)
        coords.append(np.minimum(j, L - j) * h)
    mesh = np.meshgrid(*coords, indexing="ij")
    d2 = sum((m / ell) ** 2 for m in mesh)
    c = np.exp(-0.5 * d2)
    c.flat[0] += jitter
    eigs = np.maximum(np.fft.rfftn(c), 1e-6)
    B = v.shape[0]
    x = v.reshape((B,) + dims).astype(np.float64)
    pad = [(0, 0)] + [(0, e - d) for d, e in zip(dims, edims)]
    x = np.pad(x, pad)
    y = np.fft.irfftn(eigs * np.fft.rfftn(x, axes=tuple(range(1, len(edims) + 1))),
                      s=edims, axes=tuple(range(1, len(edims) + 1)))
    crop = tuple([slice(None)] + [slice(0, d) for d in dims])
    return y[crop].reshape(B, -1)


def numpy_whiten_oracle_2d(dims, edims, hs, sig2, ell, jitter, v, maxiter):
    """f64 numpy oracle for the FULL 2-D whitening solve kn = R^T K^{-1} v:
    Matern-3/2 wrapped-lag circulant embedding -> clamped rfftn eigenvalues
    -> 20-iteration PCG with the circulant-inverse preconditioner (same
    update order as ops/cg.py) -> full-expanded R^T.  Anchors the fused
    mxu2d PCG absolutely, not just apply-vs-apply."""
    coords = [np.minimum(np.arange(L), L - np.arange(L)) * h
              for L, h in zip(edims, hs)]
    mesh = np.meshgrid(*coords, indexing="ij")
    r = np.sqrt(sum(m**2 for m in mesh)) / ell
    c = sig2 * (1.0 + math.sqrt(3.0) * r) * np.exp(-math.sqrt(3.0) * r)
    c.flat[0] += jitter
    eigs = np.maximum(np.fft.rfftn(c), 1e-6)

    B = v.shape[0]
    pad = [(0, 0)] + [(0, e - d) for d, e in zip(dims, edims)]
    crop = tuple([slice(None)] + [slice(0, d) for d in dims])
    axes = tuple(range(1, len(edims) + 1))

    def apply_w(x, w, out_expanded=False):
        xe = np.pad(x.reshape((B,) + dims).astype(np.float64), pad)
        y = np.fft.irfftn(w * np.fft.rfftn(xe, axes=axes), s=edims, axes=axes)
        if out_expanded:
            return y.reshape(B, -1)
        return y[crop].reshape(B, -1)

    b = v.astype(np.float64).reshape(B, -1)
    x = np.zeros_like(b)
    rres = b.copy()
    z = apply_w(rres, 1.0 / eigs)
    p = z.copy()
    rz = np.sum(rres * z, axis=1)
    for _ in range(maxiter):
        Ap = apply_w(p, eigs)
        pAp = np.sum(p * Ap, axis=1)
        safe = np.abs(pAp) > 0
        alpha = np.where(safe, rz / np.where(safe, pAp, 1.0), 0.0)
        x += alpha[:, None] * p
        rres -= alpha[:, None] * Ap
        z = apply_w(rres, 1.0 / eigs)
        rz_new = np.sum(rres * z, axis=1)
        beta = np.where(safe, rz_new / np.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta[:, None] * p
        rz = rz_new
    return apply_w(x, np.sqrt(eigs), out_expanded=True)


def run_2d_fused(jax, jnp, chain_fn):
    """The 2-D matmul-basis regime every paper-scale fit runs through
    (3droad sweep shape: M = 128^2, batch 1024, Matern-3/2, maxiter 20 —
    `results/repro/mxu2d_probe.py`): fused cropped-sandwich PCG
    (ops/mxu2d.py) vs the einsum-chain path, plus an f64 numpy oracle of
    the FULL whitening solve.  Round-3 measured 61 ms fused / 172 ms
    einsum; a perf regression here was invisible to the driver before."""
    from hipgp_tpu.kernels import Matern
    from hipgp_tpu.ops import bttb, make_spectrum, whiten

    m, B, MAXITER = 128, 1024, 20
    sig2, ell, jitter = 0.1, 0.1, 1e-3
    dtype = jnp.float32
    grids = [jnp.linspace(0.0, 1.0, m, dtype=dtype)] * 2
    kern = Matern(1.5)
    kfun = lambda a, b: kern(a, b, (sig2, ell))
    spec = jax.block_until_ready(
        jax.jit(lambda: make_spectrum(grids, kfun, jitter=jitter))()
    )
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal((B, spec.M)), dtype)

    fused_prev = bttb.USE_MXU2D_PCG
    try:
        bttb.USE_MXU2D_PCG = True
        f_fused = jax.jit(
            lambda v: whiten(spec, v, maxiter=MAXITER, tol=0.0,
                             fixed_iters=True)
        )
        t_fused, kn_fused = chain_fn(f_fused, v, reps=5)
        bttb.USE_MXU2D_PCG = False
        f_einsum = jax.jit(
            lambda v: whiten(spec, v, maxiter=MAXITER, tol=0.0,
                             fixed_iters=True)
        )
        t_einsum, _ = chain_fn(f_einsum, v, reps=5)
    finally:
        bttb.USE_MXU2D_PCG = fused_prev

    # f64 absolute anchor at a small batch (numpy cost, not device cost)
    vb = np.asarray(v[:8], np.float32)
    hs = [1.0 / (m - 1)] * 2
    want = numpy_whiten_oracle_2d(spec.dims, spec.edims, hs, sig2, ell,
                                  jitter, vb, MAXITER)
    got = np.asarray(kn_fused[:8], np.float64)
    rel = float(np.max(np.abs(got - want)) / np.max(np.abs(want)))
    return {
        "mxu2d_whiten20_ms": round(t_fused * 1e3, 1),
        "mxu2d_whiten20_einsum_ms": round(t_einsum * 1e3, 1),
        "mxu2d_whiten20_speedup": round(t_einsum / t_fused, 2),
        "mxu2d_whiten20_rel_f64": rel,
    }


def run_3d_fused(jax, jnp, chain_fn):
    """The 3-D regime of the paper's flagship dust-map experiment
    (sec. 5.5): M = 64x64x32 = 131k inducing points, batch 64, Matern-3/2,
    20-iteration whitening PCG.  Fused outer-axis-einsum + weight-plane
    Pallas sandwich (ops/mxu3d.py) vs the einsum chain, anchored against
    the same f64 numpy full-solve oracle as the 2-D regime (the oracle is
    dimension-generic).  Round-4 measured 98 ms fused / 213 ms einsum."""
    from hipgp_tpu.kernels import Matern
    from hipgp_tpu.ops import bttb, make_spectrum, whiten

    dims, B, MAXITER = (64, 64, 32), 64, 20
    sig2, ell, jitter = 0.1, 0.1, 1e-3
    dtype = jnp.float32
    grids = [jnp.linspace(0.0, 1.0, m, dtype=dtype) for m in dims]
    kern = Matern(1.5)
    kfun = lambda a, b: kern(a, b, (sig2, ell))
    spec = jax.block_until_ready(
        jax.jit(lambda: make_spectrum(grids, kfun, jitter=jitter))()
    )
    rng = np.random.default_rng(4)
    v = jnp.asarray(rng.standard_normal((B, spec.M)), dtype)

    fused_prev = bttb.USE_MXU3D_PCG
    try:
        bttb.USE_MXU3D_PCG = True
        f_fused = jax.jit(
            lambda v: whiten(spec, v, maxiter=MAXITER, tol=0.0,
                             fixed_iters=True)
        )
        t_fused, kn_fused = chain_fn(f_fused, v, reps=5)
        bttb.USE_MXU3D_PCG = False
        f_einsum = jax.jit(
            lambda v: whiten(spec, v, maxiter=MAXITER, tol=0.0,
                             fixed_iters=True)
        )
        t_einsum, _ = chain_fn(f_einsum, v, reps=5)
    finally:
        bttb.USE_MXU3D_PCG = fused_prev

    # f64 absolute anchor at a small batch (numpy cost, not device cost)
    nb = 4
    vb = np.asarray(v[:nb], np.float32)
    hs = [1.0 / (m - 1) for m in dims]
    want = numpy_whiten_oracle_2d(spec.dims, spec.edims, hs, sig2, ell,
                                  jitter, vb, MAXITER)
    got = np.asarray(kn_fused[:nb], np.float64)
    rel = float(np.max(np.abs(got - want)) / np.max(np.abs(want)))
    return {
        "mxu3d_whiten20_ms": round(t_fused * 1e3, 1),
        "mxu3d_whiten20_einsum_ms": round(t_einsum * 1e3, 1),
        "mxu3d_whiten20_speedup": round(t_einsum / t_fused, 2),
        "mxu3d_whiten20_rel_f64": rel,
    }


def run_guards(jax, jnp):
    """On-chip f32 transforms vs f64 numpy oracles; returns dict of relative
    errors (each must stay ~1e-6; the failure mode being guarded is ~0.3)."""
    from hipgp_tpu.ops import make_spectrum, matmul_by_K
    from hipgp_tpu.ops.bttb import FFT_SAFE_BATCH

    guards = {}
    rng = np.random.default_rng(7)

    def check(name, dims, batch, ell_spacings=1.5):
        grids = [jnp.linspace(0.0, 1.0, m, dtype=jnp.float32) for m in dims]
        hs = [1.0 / (m - 1) for m in dims]
        ell = ell_spacings * hs[0]
        kf = lambda a, b: jnp.exp(
            -0.5 * jnp.sum(((a[:, None, :] - b[None, :, :]) / ell) ** 2, -1)
        )
        spec = make_spectrum(grids, kf, jitter=1e-3)
        v = rng.standard_normal((batch, spec.M)).astype(np.float32)
        got = np.asarray(
            jax.jit(lambda v: matmul_by_K(spec, v))(jnp.asarray(v))
        )
        want = numpy_circulant_apply_oracle(hs, spec.dims, spec.edims, ell,
                                            1e-3, v)
        rel = float(np.max(np.abs(got - want)) / np.max(np.abs(want)))
        guards[name] = rel
        return spec

    # 1. MXU matmul-basis transform (all embedded axes <= 512), large batch
    spec1 = check("matmul_2d_b1000_rel", (65, 50), 1000)
    # 1b. fused cropped 2-D sandwich kernel (ops/mxu2d.py — the 2-D PCG
    #     apply) against the same f64 oracle at the same shape
    from hipgp_tpu.ops.bttb import _full_weights
    from hipgp_tpu.ops.mxu2d import sandwich_apply

    v1 = rng.standard_normal((256, spec1.M)).astype(np.float32)
    wfull = _full_weights(spec1.eigs, spec1.edims[-1])
    got1 = np.asarray(
        jax.jit(
            lambda v: sandwich_apply(
                v.reshape((-1,) + spec1.dims), wfull, spec1.dims, spec1.edims
            ).reshape(v.shape[0], -1)
        )(jnp.asarray(v1))
    )
    hs1 = [1.0 / (m - 1) for m in (65, 50)]
    want1 = numpy_circulant_apply_oracle(
        hs1, spec1.dims, spec1.edims, 1.5 * hs1[0], 1e-3, v1
    )
    guards["mxu2d_apply_rel"] = float(
        np.max(np.abs(got1 - want1)) / np.max(np.abs(want1))
    )
    # 2. long-axis packed-FFT path, 1-D (the headline regime), small batch
    check("fft_1d_long_rel", (1 << 17,), 8)
    # 3. batched multi-dim FFT corruption guard: a 2-D grid past the matmul
    #    limit at batch >> FFT_SAFE_BATCH exercises the chunked path
    spec3 = check("fft_2d_chunked_b1000_rel", (300, 5), 1000)
    assert max(spec3.edims) > 512, spec3.edims  # really on the FFT path
    guards["fft_safe_batch"] = FFT_SAFE_BATCH
    guards["gram_on_chip_rel"] = _gram_on_chip_rel(jax, jnp)
    guards["mp_on_chip_rel"] = _mp_on_chip_rel(jax, jnp)
    guards["all_pass"] = bool(
        all(v < GUARD_RTOL for k, v in guards.items() if k.endswith("_rel"))
    )
    return guards


# the full 20-iteration f32 whitening solve vs its f64 oracle: the HIGH
# transform policy's per-apply ~1e-5 compounds to ~1e-3 through truncated
# PCG (RESULTS sec. 11 measured 7.5e-4 at the paper shape); the corruption
# mode being guarded is ~0.3
WHITEN_GUARD_RTOL = 5e-3


def _gram_on_chip_rel(jax, jnp):
    """One-sweep gram solver vs the dense reference path ON THE REAL CHIP:
    theta2 must agree (same per-point kn truncation) and the closed-form
    ELBO must match the dense path's swept ELBO (RESULTS section 13)."""
    from hipgp_tpu.kernels import SqExp
    from hipgp_tpu.models import HIPGP

    rng = np.random.default_rng(5)
    N = 512
    x = jnp.asarray(rng.uniform(0.0, 1.0, (N, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal(N), jnp.float32)
    s = jnp.asarray(rng.uniform(0.1, 0.3, (N,)), jnp.float32)
    model = HIPGP(SqExp(), [jnp.linspace(0.0, 1.0, 12, dtype=jnp.float32)] * 2,
                  num_obs=N, family="mean-field", ell_init=0.1,
                  noise2_init=0.04, dtype=jnp.float32)
    st0 = model.init_state()
    st_d, e_d = model.batch_solve(st0, x, y, s, batch_size=128, maxiter_cg=60,
                                  compute_elbo=True, mean_solver="dense")
    st_g, e_g = model.batch_solve(st0, x, y, s, batch_size=128, maxiter_cg=60,
                                  compute_elbo=True, mean_solver="gram",
                                  mean_solver_maxiter=400)
    t2 = float(jnp.max(jnp.abs(st_g.theta2 - st_d.theta2))
               / jnp.max(jnp.abs(st_d.theta2)))
    eb = abs(float(e_g) - float(e_d)) / max(1.0, abs(float(e_d)))
    return max(t2, eb)


def _mp_on_chip_rel(jax, jnp):
    """Run the grid-sharded mp_batch_solve on a 1x1 dp x grid mesh ON THE
    REAL CHIP and compare against the single-device solver: proves the
    sharded code path (shard_map + collectives + the kernels under it)
    lowers and executes on TPU, not just on the CPU test meshes."""
    from jax.sharding import Mesh

    from hipgp_tpu.kernels import SqExp
    from hipgp_tpu.models import HIPGP
    from hipgp_tpu.parallel import mp_batch_solve
    from hipgp_tpu.parallel.mp import mp_shard_state

    rng = np.random.default_rng(11)
    N = 256
    x = jnp.asarray(rng.uniform(0.0, 1.0, (N, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal(N), jnp.float32)
    s = jnp.full((N,), 0.15, jnp.float32)
    model = HIPGP(SqExp(), [jnp.linspace(0.0, 1.0, 12, dtype=jnp.float32)] * 2,
                  num_obs=N, family="mean-field", ell_init=0.1,
                  noise2_init=0.0225, grid_shards=1, dtype=jnp.float32)
    state = model.init_state()
    # This guard isolates the SHARDED lowering, so the single-device
    # reference must run the same transform arithmetic as the mp path:
    # with the fused mxu2d solver engaged on the reference side the two
    # converged solves differ at the f32 operator-arithmetic class
    # (7.3e-4 theta1, measured) instead of the same-arithmetic 5.4e-5.
    # The fused kernel has its own f64-oracle guard (mxu2d_apply_rel).
    from hipgp_tpu.ops import bttb

    fused_prev = bttb.USE_MXU2D_PCG
    bttb.USE_MXU2D_PCG = False
    try:
        ref = model.batch_solve(state, x, y, s, batch_size=128,
                                maxiter_cg=30, mean_solver="cg",
                                mean_solver_maxiter=200)
        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                    ("dp", "grid"))
        got = mp_batch_solve(model, mp_shard_state(state, mesh), x, y, s,
                             mesh, batch_size=128, maxiter_cg=30,
                             mean_solver_maxiter=200)
    finally:
        bttb.USE_MXU2D_PCG = fused_prev
    num = float(jnp.max(jnp.abs(got.theta1 - ref.theta1)))
    den = float(jnp.max(jnp.abs(ref.theta1)))

    # ... and one grid-sharded natgrad TRAIN step (elbo + natural grads +
    # hyper grads through the sharded implicit-diff solve) on the real
    # chip: the training path's Mosaic/collective lowering, not just the
    # closed-form solve's.
    import optax

    from hipgp_tpu.infer.fit import FitConfig, make_optimizer
    from hipgp_tpu.parallel import mp_elbo_and_grads

    cfg = FitConfig(epochs=1, batch_size=128, lr=1e-3, maxiter_cg=5)
    opt = make_optimizer(state, cfg)

    @jax.jit
    def train_step(st, opt_state, xb, yb, sb, wb):
        elbo, grads = mp_elbo_and_grads(
            model=model, state=st, x=xb, y=yb, noise_std=sb, mesh=mesh,
            maxiter_cg=5, weights=wb, compute_hyper_grads=True,
        )
        updates, opt_state = opt.update(grads, opt_state, st)
        return optax.apply_updates(st, updates), opt_state, elbo

    st0 = mp_shard_state(state, mesh)
    _, _, elbo = jax.block_until_ready(
        train_step(st0, opt.init(st0), x[:128], y[:128], s[:128],
                   jnp.ones((128,), jnp.float32))
    )
    assert np.isfinite(float(elbo)), "on-chip mp train step: non-finite elbo"
    return num / (den + 1e-30)


def main():
    from hipgp_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from hipgp_tpu.kernels import Matern
    from hipgp_tpu.ops import cholesky_whiten, dense_gram, gram_solve, make_spectrum

    dtype = jnp.float32
    M = 1 << 20  # 1,048,576 inducing points
    B = 8
    MAXITER = 20
    kern = Matern(2.5)
    params = (1.0, 5e-5)  # ell ~ a few grid spacings at M=1M on [0,1]

    kfun = lambda a, b: kern(a, b, params)
    grid = jnp.linspace(0.0, 1.0, M, dtype=dtype)

    @jax.jit
    def solve(b):
        spec = make_spectrum([grid], kfun, jitter=1e-3)
        return gram_solve(spec, b, maxiter=MAXITER, tol=0.0, fixed_iters=True)

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((B, M)), dtype)
    ours_s, out = chain_time(solve, b, reps=5)
    ours_ms = ours_s * 1e3
    assert bool(jnp.all(jnp.isfinite(out))), "solve produced non-finite output"

    # --- roofline account -------------------------------------------------
    # applies: init precond (1) + per-iteration matvec+precond (2*MAXITER)
    # + final R^T (1); each apply = packed-complex fwd FFT + scale + inv FFT
    applies = 2 * MAXITER + 2
    L = 2 * M  # embedded (pow2) length
    complex_bytes = (B // 2) * L * 8
    real_bytes = B * M * 4
    # floor: read+write the complex buffer per FFT direction, plus the real
    # embed read and crop write (scale fuses into the FFTs)
    bytes_per_apply = 4 * complex_bytes + 2 * real_bytes
    min_bytes = applies * bytes_per_apply
    roofline_frac = min_bytes / HBM_BYTES_PER_S / ours_s
    eff_bw_gbs = min_bytes / ours_s / 1e9

    # reference point: the standalone XLA fwd+scale+inv pair at this shape
    w = jnp.asarray(rng.uniform(0.5, 2.0, L), jnp.float32)
    zr = jnp.asarray(rng.standard_normal((2, B // 2, L)), jnp.float32)

    @jax.jit
    def fft_pair(zr):
        z = jax.lax.complex(zr[0], zr[1])
        return jnp.fft.ifft(w * jnp.fft.fft(z, axis=-1), axis=-1).real

    pair_s, _ = chain_time(fft_pair, zr, reps=5)

    # our-kernel floor: chained cropped self-dot applies (the actual PCG
    # apply: the CG inner products ride the stage-1 inverse kernel) + the
    # axpy-only skeleton (the dots no longer exist outside the kernels)
    from hipgp_tpu.ops.radix_fft import (
        fused_circulant_apply_cropped_selfdot, make_plan, permute_weights,
        row_multiple)

    plan = make_plan(L, dtype)
    dperm = permute_weights(w, plan)
    rows = M // row_multiple(L)
    assert rows * row_multiple(L) == M
    xr0 = jnp.asarray(rng.standard_normal((B // 2, M)), dtype)

    # Both floor components run BARRIER-FREE (no scalar gates between
    # iterations): the bound assumes perfect overlap of all sync, so the
    # solve-vs-bound gap is exactly the cost of CG's scalar dependencies.
    @jax.jit
    def apply_chain(x):
        def body(c, _):
            yr, yi, _dr, _di = fused_circulant_apply_cropped_selfdot(
                c[0], c[1], dperm, plan, rows, rows)
            return jnp.stack([yr, yi]), None
        y, _ = jax.lax.scan(body, jnp.stack([x, x]), None, length=MAXITER)
        return y

    chain_s, _ = chain_time(apply_chain, xr0, reps=5)
    apply_ms = chain_s / MAXITER * 1e3

    # CG state-update traffic is NOT added to the bound: the solve measures
    # ~0.1 ms/iter above the bare chained applies, i.e. the axpys and
    # scalar gates are almost fully hidden by pipeline overlap (measured
    # round 3 — the axpy-fusion rider kernels that removed them outright
    # LOST 24 ms; RESULTS sec. 10 rejected table).  The modeled 9-vector-IO
    # skeleton is still reported for the traffic account.
    vec_bytes = 2 * (B // 2) * M * 4
    skel_s = MAXITER * 9 * vec_bytes / HBM_BYTES_PER_S
    radix_bound_ms = applies * apply_ms

    # --- measured Cholesky baseline at the same M (no extrapolation) -----
    Mc = 1 << 14  # largest dense-Cholesky size that is comfortably feasible
    gridc = jnp.linspace(0.0, 1.0, Mc, dtype=dtype)
    paramsc = (1.0, 5e-5 * (M / Mc))  # same ell-in-grid-spacings conditioning
    kfc = lambda a, b: kern(a, b, paramsc)
    bc = jnp.asarray(rng.standard_normal((B, Mc)), dtype)

    @jax.jit
    def chol_solve(bc):
        K = dense_gram([gridc], kfc, jitter=1e-3)
        return cholesky_whiten(K, bc)

    @jax.jit
    def ours_at_mc(bc):
        spec = make_spectrum([gridc], kfc, jitter=1e-3)
        return gram_solve(spec, bc, maxiter=MAXITER, tol=0.0, fixed_iters=True)

    chol_s, _ = chain_time(chol_solve, bc, reps=5)
    ours_mc_s, _ = chain_time(ours_at_mc, bc, reps=5)

    guards = run_guards(jax, jnp)
    fused2d = run_2d_fused(jax, jnp, chain_time)
    guards["mxu2d_whiten20_rel_f64"] = fused2d.pop("mxu2d_whiten20_rel_f64")
    fused3d = run_3d_fused(jax, jnp, chain_time)
    guards["mxu3d_whiten20_rel_f64"] = fused3d.pop("mxu3d_whiten20_rel_f64")
    guards["all_pass"] = bool(
        guards["all_pass"]
        and guards["mxu2d_whiten20_rel_f64"] < WHITEN_GUARD_RTOL
        and guards["mxu3d_whiten20_rel_f64"] < WHITEN_GUARD_RTOL
    )

    print(
        json.dumps(
            {
                "metric": "gram_solve_m1m_b8_ms",
                "value": round(ours_ms, 3),
                "unit": "ms",
                # measured at M=16384, same kernel conditioning, same batch
                "vs_baseline": round(chol_s / ours_mc_s, 1),
                "baseline_kind": f"measured cholesky whiten at M={Mc}",
                "cholesky_m16k_ms": round(chol_s * 1e3, 3),
                "ours_m16k_ms": round(ours_mc_s * 1e3, 3),
                "applies": applies,
                "per_apply_ms": round(ours_ms / applies, 3),
                "min_bytes_gb": round(min_bytes / 1e9, 2),
                "roofline_frac": round(roofline_frac, 4),
                "eff_bw_gbs": round(eff_bw_gbs, 1),
                "fft_pair_ms": round(pair_s * 1e3, 3),
                "radix_apply_ms": round(apply_ms, 3),
                "pcg_skeleton_ms": round(skel_s * 1e3, 3),
                "radix_bound_ms": round(radix_bound_ms, 1),
                "at_radix_bound": bool(ours_ms <= 1.15 * radix_bound_ms),
                **fused2d,
                **fused3d,
                "guards": guards,
            }
        )
    )


if __name__ == "__main__":
    main()
