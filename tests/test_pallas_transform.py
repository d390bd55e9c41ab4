"""Fused Pallas circulant-apply kernel vs the einsum path (interpret mode on
CPU; compiled on TPU via the verify recipe and the bench guards).

f64 runs the kernel's exact path (the bf16 hi/lo HIGH emulation is
f32-only, `radix_fft._make_dot`); f32 asserts the HIGH-policy error
envelope (~bf16x3, RESULTS §11) against the f64 oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np

from hipgp_tpu.ops.pallas_transform import _apply_einsum, circulant_apply_2d
from hipgp_tpu.ops.bttb import _real_fourier_basis


def _setup(rng, B=4, L0=16, L1=12, dtype=jnp.float64):
    x = jnp.asarray(rng.standard_normal((B, L0, L1)), dtype)
    Q0 = _real_fourier_basis(L0, dtype)
    Q1 = _real_fourier_basis(L1, dtype)
    w = jnp.asarray(np.abs(rng.standard_normal((L0, L1))) + 0.1, dtype)
    return x, Q0, Q1, w


def test_pallas_matches_einsum_interpret_f64(rng):
    x, Q0, Q1, w = _setup(rng)
    got = circulant_apply_2d(x, Q0, Q1, w, True)  # interpret mode
    want = _apply_einsum(x, Q0, Q1, w, jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-12)


def test_pallas_f32_within_high_policy_envelope(rng):
    x, Q0, Q1, w = _setup(rng)
    want = np.asarray(_apply_einsum(x, Q0, Q1, w, jax.lax.Precision.HIGHEST))
    f32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
    got = np.asarray(
        circulant_apply_2d(f32(x), f32(Q0), f32(Q1), f32(w), True), np.float64
    )
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-4, rel  # bf16 hi/lo 3-pass policy: ~1e-5 typical


def test_pallas_vjp_matches_einsum_grads(rng):
    x, Q0, Q1, w = _setup(rng)

    def loss_pallas(x, w):
        return jnp.sum(circulant_apply_2d(x, Q0, Q1, w, True) ** 2)

    def loss_einsum(x, w):
        return jnp.sum(_apply_einsum(x, Q0, Q1, w, jax.lax.Precision.HIGHEST) ** 2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_e, gw_e = jax.grad(loss_einsum, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_e), rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_e), rtol=1e-10, atol=1e-11)
