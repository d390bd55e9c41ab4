"""Derivative-observation GP parity vs the LIVE reference.

`ziggy/exact_gp_1d_derivatives.py` runs on modern torch via the
`ref_compat` shims (torch.solve / cholesky / triangular_solve); this pins
our functional rebuild (`models/derivative_gp.py`) against it end to end:
the exact joint (latent + derivative) GP prediction, the
derivative-from-latent prediction, and the SVGP batch_solve + posterior
prediction over inducing points, all f64.
"""
import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "ziggy")), reason="reference not present"
)

SIG2, ELL = 0.8, 0.25
D_NOISE, O_NOISE = 0.2, 0.05


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    x = np.sort(rng.uniform(-1, 1, 40))
    y = np.sin(3 * x) + O_NOISE * rng.standard_normal(40)
    xp = np.sort(rng.uniform(-1, 1, 12))
    yp = 3 * np.cos(3 * xp) + D_NOISE * rng.standard_normal(12)
    xt = np.linspace(-0.9, 0.9, 25)
    # 17 inducing points -> minimal embedding 2*17-2 = 32 = 2^5 is smooth,
    # so both stacks build the IDENTICAL circulant and the whitened (m, S)
    # coordinates are directly comparable (they are basis-dependent)
    u = np.linspace(-1.05, 1.05, 17)
    return x, y, xp, yp, xt, u


@pytest.fixture(scope="module")
def zref():
    from hipgp_tpu.experiments.ref_compat import import_ziggy

    import_ziggy()
    import torch
    from ziggy import exact_gp_1d_derivatives as zd

    return torch, zd


def test_exact_joint_gp_prediction_matches_live_reference(data, zref):
    torch, zd = zref
    x, y, xp, yp, xt, u = data
    t = lambda a: torch.tensor(a, dtype=torch.double)
    mu_ref, sig2_ref = zd.exact_gp_prediction(
        t(xt), t(xp), t(yp), t(x), t(y), SIG2, ELL, D_NOISE, O_NOISE
    )

    import jax.numpy as jnp

    from hipgp_tpu.models.derivative_gp import exact_gp_prediction

    mu, sig2 = exact_gp_prediction(
        jnp.asarray(xt), jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(x),
        jnp.asarray(y), SIG2, ELL, D_NOISE, O_NOISE,
    )
    np.testing.assert_allclose(np.asarray(mu), mu_ref.numpy().ravel(),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sig2), sig2_ref.numpy().ravel(),
                               rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("whitened_type", ["ziggy", "cholesky"])
def test_svgp_batch_solve_matches_live_reference(data, zref, whitened_type):
    torch, zd = zref
    x, y, xp, yp, xt, u = data
    t = lambda a: torch.tensor(a, dtype=torch.double)
    m_ref, S_ref = zd.svgp_batch_solve(
        t(u), t(xp), t(yp), t(x), t(y), SIG2, ELL, D_NOISE, O_NOISE,
        whitened_type=whitened_type,
    )
    mu_ref, sig2_ref = zd.posterior_prediction(
        t(xt), t(u), m_ref, S_ref, SIG2, ELL, domain="latent",
        whitened_type=whitened_type,
    )

    import jax.numpy as jnp

    from hipgp_tpu.models.derivative_gp import (posterior_prediction,
                                                svgp_batch_solve)

    # the reference's jitter is inconsistent across branches: 1e-4 in its
    # cholesky path but the ToeplitzTensor default 1e-3 in its ziggy path
    # (`ziggy/exact_gp_1d_derivatives.py:87,94`); ours takes one knob
    jitter = 1e-3 if whitened_type == "ziggy" else 1e-4
    m, S = svgp_batch_solve(
        jnp.asarray(u), jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(x),
        jnp.asarray(y), SIG2, ELL, D_NOISE, O_NOISE,
        whitened_type=whitened_type, jitter=jitter,
    )
    np.testing.assert_allclose(np.asarray(m).ravel(), m_ref.numpy().ravel(),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(S), S_ref.numpy(),
                               rtol=1e-6, atol=1e-9)
    mu, sig2 = posterior_prediction(
        jnp.asarray(xt), jnp.asarray(u), m, S, SIG2, ELL, domain="latent",
        whitened_type=whitened_type, jitter=jitter,
    )
    np.testing.assert_allclose(np.asarray(mu).ravel(), mu_ref.numpy().ravel(),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sig2).ravel(),
                               sig2_ref.numpy().ravel(), rtol=1e-6, atol=1e-9)
