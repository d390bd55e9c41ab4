"""Transform precision/dtype policy study (SURVEY §7.5).

Sweeps the arithmetic policy of the two circulant-apply regimes on the chip
and reports accuracy (vs an f64 numpy oracle applying the SAME clamped
spectrum) and steady-state wall time, so the shipped defaults
(`ops/bttb.py:MATMUL_DFT_PRECISION/MATMUL_DFT_DTYPE`, `ops/radix_fft`
HIGHEST) are set from data rather than folklore.

Regimes and policies:
  2-D matmul-basis transform (paper shape M=125^2, the synthetic/dust/housing
  experiments' hot op — `ziggy/misc/toeplitz_tensor.py:70-125` behavioral
  twin):
    f32 einsum at HIGHEST / HIGH / DEFAULT dot precision, and bf16 storage
    with f32 accumulation (preferred_element_type).
  1-D long-axis apply (L = 2^21, the `run_pcg_vs_cholesky` headline):
    fused Pallas radix kernel at HIGHEST / DEFAULT, and the XLA-FFT path.

Each policy also reports the end-to-end 20-iteration whitening solve time at
the same shape, since per-apply wins that vanish in the solve are noise.

Run on the TPU: `python -m hipgp_tpu.experiments.precision_study`.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from hipgp_tpu.kernels import SqExp
from hipgp_tpu.ops import bttb
from hipgp_tpu.utils.jaxcache import enable_compilation_cache
from hipgp_tpu.ops import radix_fft
from hipgp_tpu.ops.bttb import make_spectrum, _full_weights
from hipgp_tpu.ops.solve import whiten


def time_fn(f, x, reps=5, warmup=3):
    """Chained-input steady-state timing (shared impl, utils/timing.py)."""
    from hipgp_tpu.utils.timing import chain_time

    secs, _ = chain_time(f, x, reps=reps, warmup=warmup)
    return secs


def _oracle_apply(x: np.ndarray, full_eigs: np.ndarray, dims, edims):
    """f64 numpy circulant apply of the clamped spectrum: pad -> FFT ->
    scale -> iFFT -> crop.  Same operator, exact arithmetic."""
    B = x.shape[0]
    xpad = np.zeros((B,) + tuple(edims))
    sl = (slice(None),) + tuple(slice(0, d) for d in dims)
    xpad[sl] = x.reshape((B,) + tuple(dims))
    axes = tuple(range(1, 1 + len(edims)))
    y = np.fft.ifftn(full_eigs * np.fft.fftn(xpad, axes=axes), axes=axes).real
    return y[sl].reshape(B, -1)


def _rel(a, b):
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def run_2d(bsz: int, reps: int):
    M1 = 125
    grids = [jnp.linspace(0.0, 1.0, M1, dtype=jnp.float32)] * 2
    kern = SqExp()
    spec = make_spectrum(grids, lambda a, b: kern(a, b, (1.0, 0.05)), jitter=1e-3)
    rng = np.random.default_rng(0)
    x64 = rng.standard_normal((bsz, M1 * M1))
    x = jnp.asarray(x64, jnp.float32)
    full = np.asarray(
        jax.device_get(_full_weights(spec.eigs, spec.edims[-1]))
    ).astype(np.float64)
    want = _oracle_apply(x64, full, spec.dims, spec.edims)

    policies = [
        ("f32-HIGHEST", jax.lax.Precision.HIGHEST, None),
        ("f32-HIGH", jax.lax.Precision.HIGH, None),
        ("f32-DEFAULT", jax.lax.Precision.DEFAULT, None),
        ("bf16-f32accum", jax.lax.Precision.DEFAULT, jnp.bfloat16),
    ]
    rows = []
    prec0, sdtype0 = bttb.MATMUL_DFT_PRECISION, bttb.MATMUL_DFT_DTYPE
    for name, prec, sdtype in policies:
        bttb.MATMUL_DFT_PRECISION = prec
        bttb.MATMUL_DFT_DTYPE = sdtype
        try:
            apply_k = jax.jit(lambda v: bttb.bttb_matvec(spec, v, "gram"))
            got = np.asarray(jax.device_get(apply_k(x)), np.float64)
            t_apply = time_fn(apply_k, x, reps=reps)
            solve = jax.jit(lambda v: whiten(spec, v, maxiter=20))
            t_solve = time_fn(solve, x, reps=reps)
            rows.append(
                {
                    "regime": "2d-matmul",
                    "policy": name,
                    "rel_err_vs_f64": _rel(got, want),
                    "apply_ms": 1e3 * t_apply,
                    "whiten20_ms": 1e3 * t_solve,
                }
            )
            print(rows[-1], flush=True)
        finally:
            bttb.MATMUL_DFT_PRECISION = prec0
            bttb.MATMUL_DFT_DTYPE = sdtype0
    return rows


def run_1d(bsz: int, reps: int):
    M = 2**20
    grids = [jnp.linspace(0.0, 1.0, M, dtype=jnp.float32)]
    kern = SqExp()
    ell = 1.0 / M  # reference protocol: one grid spacing
    spec = make_spectrum(grids, lambda a, b: kern(a, b, (0.1, ell)), jitter=1e-3)
    L = spec.edims[0]
    rng = np.random.default_rng(1)
    x64 = rng.standard_normal((bsz, M))
    x = jnp.asarray(x64, jnp.float32)
    full = np.asarray(
        jax.device_get(_full_weights(spec.eigs, L))
    ).astype(np.float64)
    want = _oracle_apply(x64, full, spec.dims, spec.edims)

    rows = []

    def measure(name, use_radix, precision):
        """precision=None measures the SHIPPED policy (HIGH stage-1 +
        bf16 hi/lo HIGH-emulated kernel dots); an explicit precision is
        patched into BOTH the kernel dots and the stage-1 transforms."""
        bttb.USE_RADIX_FFT = use_radix
        radix_fft._get_apply.cache_clear()
        old_default = None
        if use_radix and precision is not None:
            # reach through the bttb call path: patch the default precisions
            # (Pallas-kernel dots AND the stage-1 einsums)
            old_default = radix_fft.fused_circulant_apply.__defaults__
            radix_fft.fused_circulant_apply.__defaults__ = (precision, precision)
        try:
            apply_k = jax.jit(lambda v: bttb.bttb_matvec(spec, v, "gram"))
            got = np.asarray(jax.device_get(apply_k(x)), np.float64)
            t_apply = time_fn(apply_k, x, reps=reps)
            solve = jax.jit(lambda v: whiten(spec, v, maxiter=20))
            t_solve = time_fn(solve, x, reps=reps)
            rows.append(
                {
                    "regime": "1d-long",
                    "policy": name,
                    "rel_err_vs_f64": _rel(got, want),
                    "apply_ms": 1e3 * t_apply,
                    "whiten20_ms": 1e3 * t_solve,
                }
            )
            print(rows[-1], flush=True)
        finally:
            bttb.USE_RADIX_FFT = True
            if old_default is not None:
                radix_fft.fused_circulant_apply.__defaults__ = old_default
            radix_fft._get_apply.cache_clear()

    measure("radix-shipped-HIGH", True, None)
    measure("radix-all-HIGHEST", True, jax.lax.Precision.HIGHEST)
    measure("radix-DEFAULT", True, jax.lax.Precision.DEFAULT)
    measure("xla-fft", False, None)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bsz-2d", type=int, default=256)
    p.add_argument("--bsz-1d", type=int, default=8)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--output-dir", default="results/precision-study")
    p.add_argument("--regime", choices=["2d", "1d", "all"], default="all")
    args = p.parse_args(argv)

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    rows = []
    if args.regime in ("2d", "all"):
        rows += run_2d(args.bsz_2d, args.reps)
    if args.regime in ("1d", "all"):
        rows += run_1d(args.bsz_1d, args.reps)
    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, f"summary_{args.regime}.json")
    with open(out, "w") as f:
        json.dump({"backend": jax.default_backend(), "rows": rows}, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
