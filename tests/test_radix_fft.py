"""Fused radix circulant apply vs FFT oracle (Pallas interpret mode on CPU).

Parity target: the FFT applies of `ziggy/misc/toeplitz_tensor.py:70-125`,
rebuilt as the three-stage MXU kernel in ops/radix_fft.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipgp_tpu.ops.radix_fft import (
    fused_circulant_apply,
    make_plan,
    permute_weights,
    radix_supported,
)


def _even_spectrum(L, rng):
    d = (0.5 + rng.random(L))
    return 0.5 * (d + np.concatenate([d[:1], d[1:][::-1]]))


@pytest.mark.parametrize("L", [8192, 32768])
def test_fused_apply_matches_fft_oracle(L):
    assert radix_supported(L)
    plan = make_plan(L, jnp.float64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2, L))
    d = _even_spectrum(L, rng)
    dperm = permute_weights(jnp.asarray(d), plan)
    yr, yi = fused_circulant_apply(
        jnp.asarray(x[:, 0]), jnp.asarray(x[:, 1]), dperm, plan
    )
    for got, plane in [(yr, 0), (yi, 1)]:
        want = np.fft.ifft(d * np.fft.fft(x[:, plane], axis=-1), axis=-1).real
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-10)


def test_unsupported_lengths_rejected():
    for L in (6144, 1000, 4096):  # non-pow2 / too small
        assert not radix_supported(L)
    assert radix_supported(2**21)


def test_fused_apply_gradients():
    """custom_vjp: x-pullback (symmetric operator) and d_perm cotangent
    against finite differences in f64."""
    L = 8192
    plan = make_plan(L, jnp.float64)
    rng = np.random.default_rng(1)
    xr = jnp.asarray(rng.standard_normal((1, L)))
    xi = jnp.asarray(rng.standard_normal((1, L)))
    d = _even_spectrum(L, rng)
    dperm = permute_weights(jnp.asarray(d), plan)
    w = jnp.asarray(np.cos(np.arange(L) / 7.0))

    def loss(xr, xi, dperm):
        yr, yi = fused_circulant_apply(xr, xi, dperm, plan)
        return jnp.sum(yr * w + 0.3 * yi)

    g = jax.grad(loss, argnums=(0, 1, 2))(xr, xi, dperm)
    eps = 1e-4
    for argi in (0, 1, 2):
        args = [xr, xi, dperm]
        v = np.zeros(np.shape(args[argi]))
        v.flat[:: max(1, v.size // 5)] = 1.0
        vj = jnp.asarray(v)
        hi = list(args)
        hi[argi] = args[argi] + eps * vj
        lo = list(args)
        lo[argi] = args[argi] - eps * vj
        fd = (float(loss(*hi)) - float(loss(*lo))) / (2 * eps)
        an = float(jnp.sum(g[argi] * vj))
        np.testing.assert_allclose(an, fd, rtol=1e-6)


def test_spectrum_evenness_preserved_through_permute():
    """permute_weights is a pure relabeling: sum of weights preserved/L."""
    L = 8192
    plan = make_plan(L, jnp.float64)
    rng = np.random.default_rng(2)
    d = _even_spectrum(L, rng)
    dperm = permute_weights(jnp.asarray(d), plan)
    assert dperm.shape == (plan.A, plan.B, plan.C)
    np.testing.assert_allclose(float(jnp.sum(dperm)) * L, d.sum(), rtol=1e-12)
