"""Isolate the fused-CG kernel costs: barrier-free chains of the K-step and
C-step vs the old selfdot apply chain."""
from hipgp_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np

from hipgp_tpu.ops.radix_fft import (
    fused_cg_apply_C, fused_cg_apply_K,
    fused_circulant_apply_cropped_selfdot, make_plan, permute_weights,
    row_multiple)
from hipgp_tpu.utils.timing import chain_time

print("backend:", jax.default_backend())
dtype = jnp.float32
M = 1 << 20
B = 8
V = B // 2
L = 2 * M
ITER = 20
plan = make_plan(L, dtype)
rows = M // row_multiple(L)
BC = plan.B * plan.C
rng = np.random.default_rng(0)
w = jnp.asarray(rng.uniform(0.5, 2.0, L), jnp.float32)
dperm = permute_weights(w, plan)
mask3 = jnp.ones((1, rows, BC), dtype)
s = jnp.asarray(rng.standard_normal((2, V, M)), dtype)
t0 = jnp.asarray(rng.standard_normal((2, V, 8, 128)), dtype) * 1e-3

@jax.jit
def old_chain(x):
    def body(c, _):
        yr, yi, _dr, _di = fused_circulant_apply_cropped_selfdot(
            c[0], c[1], dperm, plan, rows, rows)
        return jnp.stack([yr, yi]), None
    y, _ = jax.lax.scan(body, x, None, length=ITER)
    return y

@jax.jit
def k_chain(x):
    def body(c, _):
        z, p_old, rzn, rzo, pap = c
        p, Ap, pap_new = fused_cg_apply_K(z, p_old, mask3, rzn, rzo, pap,
                                          dperm, plan, rows)
        return (Ap, p, rzn, rzo, pap_new), None
    (y, *_), _ = jax.lax.scan(body, (x, x, t0, t0, t0), None, length=ITER)
    return y

@jax.jit
def c_chain(x):
    def body(c, _):
        xx, r, p, Ap, rz, pap = c
        xn, rn, rr, z, rz_new = fused_cg_apply_C(xx, r, p, Ap, mask3,
                                                 rz, pap, dperm, plan, rows)
        return (xn, rn, p, z, rz_new, pap), None
    (y, *_), _ = jax.lax.scan(body, (x, x, x, x, t0, t0), None, length=ITER)
    return y

for name, f in [("old selfdot apply", old_chain), ("K-step (pupd)", k_chain),
                ("C-step (xrupd)", c_chain)]:
    t, _ = chain_time(f, s, reps=5, warmup=3)
    print(f"{name}: {t/ITER*1e3:.3f} ms/iter")
