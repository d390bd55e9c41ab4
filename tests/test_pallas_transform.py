"""Fused Pallas circulant-apply kernel vs the einsum path (interpret mode on
CPU; compiled on TPU via the verify recipe)."""
import jax
import jax.numpy as jnp
import numpy as np

from hipgp_tpu.ops.pallas_transform import _apply_einsum, circulant_apply_2d
from hipgp_tpu.ops.bttb import _real_fourier_basis


def _setup(rng, B=4, L0=16, L1=12, dtype=jnp.float32):
    x = jnp.asarray(rng.standard_normal((B, L0, L1)), dtype)
    Q0 = _real_fourier_basis(L0, dtype)
    Q1 = _real_fourier_basis(L1, dtype)
    w = jnp.asarray(np.abs(rng.standard_normal((L0, L1))) + 0.1, dtype)
    return x, Q0, Q1, w


def test_pallas_matches_einsum_interpret(rng):
    x, Q0, Q1, w = _setup(rng)
    got = circulant_apply_2d(x, Q0, Q1, w, True)  # interpret mode
    want = _apply_einsum(x, Q0, Q1, w, jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_pallas_vjp_matches_einsum_grads(rng):
    x, Q0, Q1, w = _setup(rng)

    def loss_pallas(x, w):
        return jnp.sum(circulant_apply_2d(x, Q0, Q1, w, True) ** 2)

    def loss_einsum(x, w):
        return jnp.sum(_apply_einsum(x, Q0, Q1, w, jax.lax.Precision.HIGHEST) ** 2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_e, gw_e = jax.grad(loss_einsum, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_e), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_e), rtol=1e-4, atol=1e-5)
