"""Headline benchmark: the O(M log M) whitening solve K^{-1/2}v at one
million inducing points on a single chip.

Protocol mirrors the reference's pcg-vs-cholesky experiment
(`experiments-hip-gp/run_pcg_vs_cholesky.py`): time ``gram_solve`` (PCG with
circulant preconditioner + R^T multiply) on a 1-D grid of M inducing points,
batch of B right-hand sides, Matern-5/2 kernel; compare against the dense
Cholesky whitening path.  Cholesky is measured at a feasible M and
extrapolated by its M^3 factorization cost to the benchmark M (the reference
likewise skips Cholesky above 5e4 points, `run_pcg_vs_cholesky.py:69,134`).

Prints ONE JSON line:
  {"metric": "gram_solve_m1m_b8_ms", "value": <ms>, "unit": "ms",
   "vs_baseline": <cholesky_extrapolated_time / our_time>}
"""
import json
import sys
import time

import numpy as np


def main():
    from hipgp_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from hipgp_tpu.kernels import Matern
    from hipgp_tpu.ops import gram_solve, make_spectrum, cholesky_whiten, dense_gram

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

    out = jax.block_until_ready(solve(b))  # compile
    reps = 5
    # chained warmups: first executions on fresh buffers run far from
    # steady state through the remote-dispatch layer
    for _ in range(3):
        b = b + 1e-9 * out[:, :M]
        out = jax.block_until_ready(solve(b))
    # chain the input through the output so every rep is distinct work
    # (identical dispatches can be cached by the runtime)
    t0 = time.perf_counter()
    for _ in range(reps):
        b = b + 1e-9 * out[:, :M]
        out = solve(b)
    out = jax.block_until_ready(out)
    ours_ms = (time.perf_counter() - t0) / reps * 1e3
    assert bool(jnp.all(jnp.isfinite(out))), "solve produced non-finite output"

    # --- Cholesky reference at a feasible size, extrapolated by M^3 ---
    Mc = 8192
    gridc = jnp.linspace(0.0, 1.0, Mc, dtype=dtype)
    bc = jnp.asarray(rng.standard_normal((B, Mc)), dtype)

    @jax.jit
    def chol_solve(bc):
        K = dense_gram([gridc], kfun, jitter=1e-3)
        return cholesky_whiten(K, bc)

    outc = jax.block_until_ready(chol_solve(bc))
    t0 = time.perf_counter()
    for _ in range(reps):
        bc = bc + 1e-9 * outc
        outc = chol_solve(bc)
    outc = jax.block_until_ready(outc)
    chol_ms = (time.perf_counter() - t0) / reps * 1e3
    # factorization-dominated extrapolation to M points
    chol_extrap_ms = chol_ms * (M / Mc) ** 3

    print(
        json.dumps(
            {
                "metric": "gram_solve_m1m_b8_ms",
                "value": round(ours_ms, 3),
                "unit": "ms",
                "vs_baseline": round(chol_extrap_ms / ours_ms, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
