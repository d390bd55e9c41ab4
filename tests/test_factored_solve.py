"""mean_solver='factored': the O(M)-solve closed-form batch solve.

Checks the factored path (everything computed from the M-space data Gram;
see `HIPGP._batch_solve_factored`) against the reference-semantics 'dense'
sweep path (`ziggy/hipgp.py:278-368` semantics) at near-exact PCG truncation
in f64: same family optimum, same ELBO, for every family / whitening /
observation type.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from hipgp_tpu.kernels import SqExp
from hipgp_tpu.models import HIPGP

N = 400
RNG = np.random.default_rng(0)
X = jnp.asarray(RNG.uniform(0.05, 0.95, (N, 2)))
Y = jnp.asarray(RNG.standard_normal(N))
S = jnp.asarray(RNG.uniform(0.1, 0.3, (N,)))

SOLVE = dict(batch_size=128, maxiter_cg=200, compute_elbo=True)
FACTORED = dict(mean_solver="factored", mean_solver_maxiter=400,
                factor_jitter=1e-12)


def _model(family="mean-field", **kw):
    return HIPGP(SqExp(), [jnp.linspace(0.0, 1.0, 9)] * 2, num_obs=N,
                 family=family, ell_init=0.12, noise2_init=0.04,
                 dtype=jnp.float64, **kw)


def _compare(model, noise=S, rtol=1e-6, **kw):
    st0 = model.init_state()
    st_r, e_r = model.batch_solve(st0, X, Y, noise, mean_solver="dense",
                                  **SOLVE, **kw)
    st_g, e_g = model.batch_solve(st0, X, Y, noise, **FACTORED, **SOLVE, **kw)
    for name in ("theta1", "theta2"):
        a, b = getattr(st_r, name), getattr(st_g, name)
        rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
        assert rel < rtol, f"{name}: rel={rel:.3e}"
    assert abs(float(e_r) - float(e_g)) < rtol * max(1.0, abs(float(e_r)))


@pytest.mark.parametrize(
    "family,kw",
    [
        ("mean-field", {}),
        ("block", {"block_sizes": (4, 4)}),
        ("full-rank", {"parameterization": "standard"}),
        ("full-rank", {}),
    ],
)
def test_factored_matches_dense_all_families(family, kw):
    _compare(_model(family, **kw))


def test_factored_cholesky_whitening():
    _compare(_model(whitened_type="cholesky"), rtol=1e-8)


def test_factored_homoscedastic():
    _compare(_model(), noise=None)


def test_factored_integrated_obs():
    model = HIPGP(SqExp(), [jnp.linspace(0.0, 1.0, 9)] * 2, num_obs=N,
                  family="mean-field", ell_init=0.2, noise2_init=0.04,
                  support_integrated_obs=True, dtype=jnp.float64)
    _compare(model, integrated_obs=True, rtol=1e-5)


def test_factored_uneven_batches():
    # N=400 with bsz=96 pads the last batch; the masked accumulation must
    # reproduce the exact solve
    model = _model()
    st0 = model.init_state()
    st_r, e_r = model.batch_solve(st0, X, Y, S, batch_size=96,
                                  maxiter_cg=200, compute_elbo=True,
                                  mean_solver="dense")
    st_g, e_g = model.batch_solve(st0, X, Y, S, batch_size=96,
                                  maxiter_cg=200, compute_elbo=True,
                                  **FACTORED)
    rel = float(jnp.max(jnp.abs(st_r.theta1 - st_g.theta1))
                / jnp.max(jnp.abs(st_r.theta1)))
    assert rel < 1e-6
    assert abs(float(e_r) - float(e_g)) < 1e-6


def test_factored_default_jitter():
    # the dtype-scaled default factor_jitter must not visibly perturb the
    # optimum (the jitter enters Lambda as eps * diag(W W^T))
    model = _model()
    st0 = model.init_state()
    st_r, e_r = model.batch_solve(st0, X, Y, S, mean_solver="dense", **SOLVE)
    st_g, e_g = model.batch_solve(st0, X, Y, S, mean_solver="factored",
                                  mean_solver_maxiter=400, **SOLVE)
    rel = float(jnp.max(jnp.abs(st_r.theta1 - st_g.theta1))
                / jnp.max(jnp.abs(st_r.theta1)))
    assert rel < 1e-5
    assert abs(float(e_r) - float(e_g)) < 1e-5


def test_factored_inconsistency_fallback_f32():
    """f32 + heavily clamped spectrum (SqExp at ell = 2.5 spacings): the
    factor-column PCG breaks the tr(K^-1 A) <= sum ivar Knn identity; the
    solver must detect it, warn, and fall back to the 'gram' sweep path."""
    rng = np.random.default_rng(3)
    n = 1024
    x32 = jnp.asarray(rng.uniform(0.05, 0.95, (n, 2)), jnp.float32)
    y32 = jnp.asarray(rng.standard_normal(n), jnp.float32)
    s32 = jnp.full((n,), 0.1, jnp.float32)
    model = HIPGP(SqExp(), [jnp.linspace(0.0, 1.0, 32, dtype=jnp.float32)] * 2,
                  num_obs=n, family="mean-field", ell_init=0.08,
                  noise2_init=0.01, dtype=jnp.float32)
    st0 = model.init_state()
    with pytest.warns(RuntimeWarning, match="exactness check"):
        st_f, e_f = model.batch_solve(
            st0, x32, y32, s32, batch_size=512, maxiter_cg=30,
            compute_elbo=True, mean_solver="factored",
        )
    st_g, e_g = model.batch_solve(
        st0, x32, y32, s32, batch_size=512, maxiter_cg=30,
        compute_elbo=True, mean_solver="gram",
    )
    assert float(jnp.max(jnp.abs(st_f.theta2 - st_g.theta2))) < 1e-5
    assert abs(float(e_f) - float(e_g)) < 1e-4


def test_factored_rejects_unknown_solver():
    model = _model()
    with pytest.raises(ValueError):
        model.batch_solve(model.init_state(), X, Y, S, mean_solver="nope")
