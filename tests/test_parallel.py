"""Data parallelism on an 8-virtual-device CPU mesh: sharded results must
match the single-device path bit-for-bit up to reduction order."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipgp_tpu.kernels import SqExp
from hipgp_tpu.models import HIPGP
from hipgp_tpu.parallel import (
    dp_batch_solve,
    dp_elbo_and_grads,
    make_dp_train_step,
    make_mesh,
)


def setup(n=64, family="mean-field", whitened="cholesky"):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.05, 0.95, (n, 2)))
    f = np.sin(4 * np.asarray(x[:, 0]))
    y = jnp.asarray(f + 0.2 * rng.standard_normal(n))
    s = jnp.asarray(np.full(n, 0.2))
    grids = [jnp.linspace(0.0, 1.0, 6)] * 2
    model = HIPGP(SqExp(), grids, num_obs=n, family=family,
                  whitened_type=whitened, ell_init=0.2, noise2_init=0.04)
    return model, model.init_state(), x, y, s


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.parametrize("family", ["mean-field", "full-rank", "block"])
@pytest.mark.parametrize("whitened", ["cholesky", "ziggy"])
def test_dp_batch_solve_matches_single_device(family, whitened):
    if family == "block":
        _, _, x, y, s = setup(family="mean-field", whitened=whitened)
        model = HIPGP(SqExp(), [jnp.linspace(0.0, 1.0, 6)] * 2, num_obs=64,
                      family="block", whitened_type=whitened,
                      block_sizes=(5, 5) if whitened == "ziggy" else (3, 3),
                      ell_init=0.2, noise2_init=0.04)
        st = model.init_state()
    else:
        model, st, x, y, s = setup(family=family, whitened=whitened)
    mesh = make_mesh(8)
    solved_dp = dp_batch_solve(model, st, x, y, s, mesh, maxiter_cg=200)
    # same micro-batch size (64/8 = 8 rows) so the PCG early-exit groups
    # match; then dp must agree to reduction-order precision
    solved_1d = model.batch_solve(st, x, y, s, batch_size=8, maxiter_cg=200)
    np.testing.assert_allclose(
        np.asarray(solved_dp.theta1), np.asarray(solved_1d.theta1), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(solved_dp.theta2), np.asarray(solved_1d.theta2), rtol=1e-8, atol=1e-10
    )


def test_ell_fit_dp_matches_single_device():
    """Mesh-aware ell_fit: the dp-routed grid search picks the same argmax
    lengthscale (and near-identical ELBO curve) as the single-device sweep.
    Mean PCG converged (maxiter 200 at this small shape) so reduction-order
    differences stay below the comparison tolerance (CLAUDE.md trap)."""
    from hipgp_tpu.infer import ell_fit

    model, st, x, y, s = setup(n=64, whitened="ziggy")
    kw = dict(ell_min=0.1, ell_max=0.3, ell_step_size=0.1,
              batch_solve_bsz=8, maxiter_cg=200, verbose=False)
    _, ell_1d, ells_1d, elbos_1d = ell_fit(model, st, x, y, s, **kw)
    mesh = make_mesh(8)
    _, ell_dp, ells_dp, elbos_dp = ell_fit(model, st, x, y, s,
                                           parallel="dp", mesh=mesh, **kw)
    assert ells_dp == ells_1d
    assert ell_dp == ell_1d
    np.testing.assert_allclose(elbos_dp, elbos_1d, rtol=1e-6)


def test_dp_batch_solve_uneven_n():
    """N not divisible by device count: padding/masking keeps it exact."""
    model, st, x, y, s = setup(n=61)
    mesh = make_mesh(8)
    solved_dp = dp_batch_solve(model, st, x, y, s, mesh)
    solved_1d = model.batch_solve(st, x, y, s)
    np.testing.assert_allclose(
        np.asarray(solved_dp.theta1), np.asarray(solved_1d.theta1), rtol=1e-8, atol=1e-10
    )


def test_dp_elbo_and_grads_matches():
    model, st, x, y, s = setup()
    mesh = make_mesh(8)
    step = dp_elbo_and_grads(model, mesh, maxiter_cg=50)
    w = jnp.ones(x.shape[0], model.dtype)
    e_dp, g_dp = step(st, x, y, s, w)
    e_1d, g_1d = model.elbo_and_grads(st, x, y, s, maxiter_cg=50, weights=w)
    np.testing.assert_allclose(float(e_dp), float(e_1d), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_dp.theta1), np.asarray(g_1d.theta1), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(g_dp.theta2), np.asarray(g_1d.theta2), rtol=1e-8, atol=1e-10)


def test_dp_train_step_runs_and_improves():
    import optax
    from hipgp_tpu.infer import FitConfig
    from hipgp_tpu.infer.fit import make_optimizer

    model, st, x, y, s = setup()
    mesh = make_mesh(8)
    cfg = FitConfig(lr=0.05, maxiter_cg=50)
    opt = make_optimizer(st, cfg)
    opt_state = opt.init(st)
    step = make_dp_train_step(model, cfg, opt, mesh)
    w = jnp.ones(x.shape[0], model.dtype)
    elbos = []
    for _ in range(10):
        st, opt_state, elbo = step(st, opt_state, x, y, s, w)
        elbos.append(float(elbo))
    assert elbos[-1] > elbos[0]


def test_dp_svigp_fit_matches_single_device():
    """Full dp fit loop == single-device svigp_fit (same batches, same opt)."""
    from hipgp_tpu.infer import FitConfig, svigp_fit
    from hipgp_tpu.parallel.dp import dp_svigp_fit

    model, st, x, y, s = setup()
    cfg = FitConfig(epochs=3, batch_size=32, lr=0.05, maxiter_cg=50,
                    schedule_lr=True)
    mesh = make_mesh(8)
    st_dp, rep_dp = dp_svigp_fit(model, st, x, y, s, cfg, mesh, verbose=False)
    st_1d, rep_1d = svigp_fit(model, st, x, y, s, cfg, verbose=False)
    np.testing.assert_allclose(np.asarray(st_dp.theta1), np.asarray(st_1d.theta1),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(rep_dp["epoch_elbos"], rep_1d["epoch_elbos"], rtol=1e-8)


def test_dp_svigp_fit_model_noise_matches_single_device():
    """No per-point noise: dp path must use the model's log_noise2 (was a
    bug: silently substituted noise=1.0)."""
    from hipgp_tpu.infer import FitConfig, svigp_fit
    from hipgp_tpu.parallel.dp import dp_svigp_fit

    model, st, x, y, s = setup()
    cfg = FitConfig(epochs=2, batch_size=32, lr=0.05, maxiter_cg=50)
    mesh = make_mesh(8)
    st_dp, _ = dp_svigp_fit(model, st, x, y, None, cfg, mesh, verbose=False)
    st_1d, _ = svigp_fit(model, st, x, y, None, cfg, verbose=False)
    np.testing.assert_allclose(np.asarray(st_dp.theta1), np.asarray(st_1d.theta1),
                               rtol=1e-7, atol=1e-10)
