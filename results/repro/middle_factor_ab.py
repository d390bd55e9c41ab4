"""Middle-kernel factorization A/B: does a larger lane axis C cut the
per-plane F2/I2 issue latency of the headline 1-D apply?

The middle kernel's F2/I2 run one (B,B)@(B,C) left dot PER ka-PLANE
(A planes per v); the verdict-flagged ~3.4x pocket is per-dot MXU issue
latency.  The factorization fixes the plane count (A) and the per-dot
work (B x C): growing C shrinks A at constant L, halving the number of
issues while doubling per-issue work — no kernel changes, just the plan.

Also sweeps _MIDDLE_R (plane-slab depth) per factorization.

Run on TPU: python results/repro/middle_factor_ab.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from hipgp_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from hipgp_tpu.ops import radix_fft as rf
from hipgp_tpu.utils.timing import chain_time

L = 1 << 21
M = 1 << 20
VB = 4            # (B//2) packed complex planes = batch 8 real RHS
ITERS = 20
dtype = jnp.float32

rng = np.random.default_rng(0)
w_nat = jnp.asarray(np.abs(rng.standard_normal(L)) + 0.1, dtype)
xr0 = jnp.asarray(rng.standard_normal((VB, M)), dtype)


def measure(label):
    plan = rf.make_plan(L, dtype)
    dperm = rf.permute_weights(w_nat, plan)
    rows = M // rf.row_multiple(L)
    assert rows * rf.row_multiple(L) == M

    @jax.jit
    def apply_chain(x):
        def body(c, _):
            yr, yi, _dr, _di = rf.fused_circulant_apply_cropped_selfdot(
                c[0], c[1], dperm, plan, rows, rows)
            return jnp.stack([yr, yi]), None

        y, _ = jax.lax.scan(body, jnp.stack([x, x]), None, length=ITERS)
        return y

    t0 = time.time()
    out = jax.block_until_ready(apply_chain(xr0))
    compile_s = time.time() - t0
    chain_s, out = chain_time(apply_chain, xr0, reps=5)
    print(f"{label}: {chain_s / ITERS * 1e3:.3f} ms/apply "
          f"(compile+first {compile_s:.1f}s)", flush=True)
    return chain_s / ITERS * 1e3, out


def set_factor(abc, middle_r=None, middle_vt=None):
    rf.FACTOR_OVERRIDE.clear()
    if abc is not None:
        rf.FACTOR_OVERRIDE[L] = abc
    rf._plan_arrays.cache_clear()
    rf._MIDDLE_R = middle_r
    rf._MIDDLE_VT = middle_vt


set_factor(None)
base_ms, base_out = measure("base (128,128,128) R=8")
ref = np.asarray(base_out)


def check(out):
    rel = float(np.max(np.abs(np.asarray(out) - ref)) / np.max(np.abs(ref)))
    if rel > 1e-4:
        print(f"   !! output mismatch rel={rel:.2e}")


MODE = sys.argv[1] if len(sys.argv) > 1 else "factor"

if MODE == "factor":
    for abc, r in [
        ((64, 128, 256), 4),
        ((128, 64, 256), None),
    ]:
        try:
            set_factor(abc, middle_r=r)
            ms, out = measure(f"{abc} R={r or 'auto'}")
            check(out)
        except Exception as ex:
            print(f"{abc} R={r}: FAILED {type(ex).__name__}: {ex}")
elif MODE == "concat":
    # F2/I2 lane-concat collapse at the base factorization
    for r, vt in [(None, None), (4, None), (16, 1)]:
        try:
            set_factor(None, middle_r=r, middle_vt=vt)
            rf._MIDDLE_F2_CONCAT = True
            ms, out = measure(f"concat R={r or 'auto'} VT={vt or 'auto'}")
            check(out)
        except Exception as ex:
            print(f"concat R={r}: FAILED {type(ex).__name__}: {ex}")
    rf._MIDDLE_F2_CONCAT = False
elif MODE == "batched":
    for r, vt in [(None, None), (16, 1)]:
        try:
            set_factor(None, middle_r=r, middle_vt=vt)
            rf._MIDDLE_F2_BATCHED = True
            ms, out = measure(f"batched R={r or 'auto'} VT={vt or 'auto'}")
            check(out)
        except Exception as ex:
            print(f"batched R={r}: FAILED {type(ex).__name__}: {ex}")
    rf._MIDDLE_F2_BATCHED = False
elif MODE == "slab":
    for r, vt in [(4, 2), (4, 4), (8, 1), (8, 4), (16, 1), (16, 2), (32, 1)]:
        try:
            set_factor(None, middle_r=r, middle_vt=vt)
            ms, out = measure(f"slab R={r} VT={vt}")
            check(out)
        except Exception as ex:
            print(f"slab R={r} VT={vt}: FAILED {type(ex).__name__}: {ex}")

set_factor(None)
