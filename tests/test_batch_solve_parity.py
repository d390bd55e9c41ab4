"""Closed-form batch_solve parity vs the LIVE reference FFT stack.

Round 1 pinned batch_solve against dense numpy oracles; with the
`ref_compat` shims the reference's own `ToeplitzInducingGP.batch_solve`
(`ziggy/hipgp.py:278-368`) runs through its FFT/Toeplitz layer, so the
accumulate-(Lambda, b)-then-solve pipeline of both stacks is compared
end to end on the identical operator (smooth-embedding grid, f64).
"""
import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "ziggy")), reason="reference not present"
)

M1 = 16       # embedding 30 = 2*3*5: identical operator on both stacks
N = 300
ELL = 0.15
NOISE = 0.1


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (N, 2))
    y = np.sin(2.5 * x[:, 0]) * np.cos(1.5 * x[:, 1]) + NOISE * rng.standard_normal(N)
    s = np.full(N, NOISE)
    return x, y, s


@pytest.fixture(scope="module")
def ref_solution(data):
    from hipgp_tpu.experiments.ref_compat import import_ziggy

    import_ziggy()
    import torch
    from ziggy import kernels as zk
    from ziggy.hipgp import MeanFieldToeplitzGP

    x, y, s = data
    grids = [torch.linspace(-1.0, 1.0, M1, dtype=torch.double)] * 2
    mod = MeanFieldToeplitzGP(
        zk.SqExp(), grids, num_obs=N, sig2_init=1.0, ell_init=ELL,
        noise2_init=NOISE ** 2, learn_kernel=False, learn_noise=False,
        dtype=torch.double,
    )
    # The reference's own `batch_solve` is unrunnable as shipped: it reads
    # `noise_std_batch` before assignment (`ziggy/hipgp.py:314`, should be
    # `noise_std`) and raises UnboundLocalError on the first batch.  This
    # drives its lower-level API through the same accumulate-then-solve
    # pipeline (`:302-368` with that one-name fix), using the reference's
    # _make_grams / compute_kn / get_lam / compute_batch_an throughout.
    xt_ = torch.tensor(x)
    yt_ = torch.tensor(y)[:, None]
    st_ = torch.tensor(s)[:, None]
    with torch.no_grad():
        lam = mod.get_identity_for_lam()
        b = 0
        big = torch.eye(mod.Mprime, dtype=torch.double)
        for lo in range(0, N, 100):
            sl = slice(lo, min(lo + 100, N))
            Knm, _ = mod._make_grams(xt_[sl])
            kn = mod.compute_kn(Knm, maxiter_cg=50)
            ivar = 1.0 / st_[sl] ** 2
            lam = lam + mod.get_lam(ivar_noise=ivar, kn=kn, bscale=1.0,
                                    add_identity=False)
            b = b + torch.sum(ivar * yt_[sl] * kn, dim=0)
            big += (ivar * kn).t().matmul(kn)
        mod.global_theta2.data[:] = -0.5 * lam
        mhat, _ = torch.solve(b[:, None], big)
        nhat = mhat.squeeze() * lam.squeeze()
        mod.global_theta1.data[:] = nhat[:, None]
        qm, qS = mod.standard_variational_params()
        elbo = 0.0
        for lo in range(0, N, 100):
            sl = slice(lo, min(lo + 100, N))
            # noise passed (bsz,), not (bsz,1): compute_batch_an's
            # `log_noise_std = torch.log(noise_std_batch)` is never
            # squeezed (`ziggy/hipgp.py:400,411`), so a (bsz,1) noise
            # broadcasts an into a (bsz,bsz) matrix and the summed ELBO
            # inflates by bsz — the flat shape yields the intended
            # per-point an.
            elbo += torch.sum(mod.compute_batch_an(
                xt_[sl], yt_[sl], st_[sl].squeeze(-1), qm=qm, qS=qS,
                maxiter_cg=50))
        elbo = elbo / N - mod.get_kl_to_prior(qm, qS) / mod.N
        mu, sig = mod.predict(torch.tensor(x[:50]), maxiter_cg=50)
    return {
        "theta1": mod.global_theta1.detach().numpy().ravel(),
        "theta2": mod.global_theta2.detach().numpy().ravel(),
        "elbo": float(elbo),
        "mu": mu.squeeze(-1).numpy(),
        "sig": sig.squeeze(-1).numpy(),
    }


def test_batch_solve_matches_live_reference(data, ref_solution):
    import jax
    import jax.numpy as jnp

    from hipgp_tpu.kernels import SqExp
    from hipgp_tpu.models.hipgp import HIPGP

    x, y, s = data
    grids = [jnp.linspace(-1.0, 1.0, M1, dtype=jnp.float64)] * 2
    model = HIPGP(SqExp(), grids, num_obs=N, family="mean-field",
                  sig2_init=1.0, ell_init=ELL, noise2_init=NOISE ** 2)
    new, elbo = model.batch_solve(
        model.init_state(), jnp.asarray(x), jnp.asarray(y), jnp.asarray(s),
        batch_size=100, maxiter_cg=50, compute_elbo=True,
    )
    np.testing.assert_allclose(
        np.asarray(new.theta1), ref_solution["theta1"], rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(new.theta2), ref_solution["theta2"], rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(float(elbo), ref_solution["elbo"], rtol=1e-7)

    mu, sig = model.predict(new, jnp.asarray(x[:50]), maxiter_cg=50)
    np.testing.assert_allclose(np.asarray(mu), ref_solution["mu"], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sig), ref_solution["sig"], rtol=1e-7, atol=1e-9)


def test_integrated_obs_batch_solve_matches_live_reference(data):
    """Line-integral (dust-map) observations through both stacks: kn comes
    from the analytic k_semi on both sides (tight); the ELBO also needs the
    doubly-integrated diagonal, where the reference interpolates
    scipy-quad tables and we interpolate Gauss-Legendre tables — compared
    at the interpolation-accuracy level."""
    from hipgp_tpu.experiments.ref_compat import import_ziggy

    import_ziggy()
    import torch
    from ziggy import kernels as zk
    from ziggy.hipgp import MeanFieldToeplitzGP

    import jax.numpy as jnp

    from hipgp_tpu.kernels import SqExp
    from hipgp_tpu.models.hipgp import HIPGP

    x, y, s = data
    x, y, s = x[:100], y[:100], s[:100]

    grids_t = [torch.linspace(-1.0, 1.0, M1, dtype=torch.double)] * 2
    mod = MeanFieldToeplitzGP(
        zk.SqExp(), grids_t, num_obs=100, sig2_init=1.0, ell_init=ELL,
        noise2_init=NOISE ** 2, learn_kernel=False, learn_noise=False,
        dtype=torch.double,
    )
    xt_ = torch.tensor(x)
    yt_ = torch.tensor(y)[:, None]
    st_ = torch.tensor(s)[:, None]
    with torch.no_grad():
        Knm, _ = mod._make_grams(xt_, integrated_obs=True,
                                 semi_integrated_estimator="analytic")
        kn = mod.compute_kn(Knm, maxiter_cg=50)
        ivar = 1.0 / st_ ** 2
        lam = mod.get_identity_for_lam() + mod.get_lam(
            ivar_noise=ivar, kn=kn, bscale=1.0, add_identity=False)
        b = torch.sum(ivar * yt_ * kn, dim=0)
        big = torch.eye(mod.Mprime, dtype=torch.double) + (ivar * kn).t().matmul(kn)
        mod.global_theta2.data[:] = -0.5 * lam
        mhat, _ = torch.solve(b[:, None], big)
        mod.global_theta1.data[:] = (mhat.squeeze() * lam.squeeze())[:, None]

    grids_j = [jnp.linspace(-1.0, 1.0, M1, dtype=jnp.float64)] * 2
    model = HIPGP(SqExp(), grids_j, num_obs=100, family="mean-field",
                  sig2_init=1.0, ell_init=ELL, noise2_init=NOISE ** 2,
                  support_integrated_obs=True)
    new = model.batch_solve(
        model.init_state(), jnp.asarray(x), jnp.asarray(y), jnp.asarray(s),
        batch_size=-1, maxiter_cg=50, integrated_obs=True,
        semi_integrated_estimator="analytic",
    )
    np.testing.assert_allclose(
        np.asarray(new.theta1), mod.global_theta1.detach().numpy().ravel(),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(new.theta2), mod.global_theta2.detach().numpy().ravel(),
        rtol=1e-6, atol=1e-8,
    )
