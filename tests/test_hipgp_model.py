"""HIP-GP model layer against independent dense oracles.

Oracle strategy (reference test strategy, SURVEY.md section 4): the
'cholesky' whitened type is the exact twin of the 'ziggy' FFT path; the
full-rank family's closed-form batch_solve equals the Titsias-optimal SVGP
posterior, computed here densely in numpy from the math.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipgp_tpu.kernels import SqExp
from hipgp_tpu.models import HIPGP
from hipgp_tpu.utils import blocks as blk

SEED = 0


def make_data(n=60, noise=0.1, rng=None):
    rng = rng or np.random.default_rng(SEED)
    x = rng.uniform(0.05, 0.95, (n, 2))
    f = np.sin(4 * x[:, 0]) * np.cos(3 * x[:, 1])
    y = f + noise * rng.standard_normal(n)
    s = np.full(n, noise)
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(s), f


def make_model(family="full-rank", whitened="cholesky", m=8, **kw):
    grids = [jnp.linspace(0.0, 1.0, m)] * 2
    return HIPGP(
        SqExp(),
        grids,
        num_obs=60,
        family=family,
        whitened_type=whitened,
        ell_init=0.2,
        sig2_init=1.0,
        noise2_init=0.01,
        **kw,
    )


def dense_whitened_oracle(model, state, x, y, s):
    """Independent numpy computation of the whitened optimal q and its
    predictions for the cholesky-whitened full-rank family."""
    sig2, ell = float(jnp.exp(state.log_sig2)), float(jnp.exp(state.log_ell))
    k = SqExp()
    P = (sig2, ell)
    Xi = np.asarray(model.xinduce)
    Kmm = np.asarray(k(jnp.asarray(Xi), jnp.asarray(Xi), P)) + model.jitter * np.eye(len(Xi))
    L = np.linalg.cholesky(Kmm)
    Knm = np.asarray(k(x, jnp.asarray(Xi), P))  # (n, M)
    kn = np.linalg.solve(L, Knm.T).T  # (n, M)
    ivar = 1.0 / np.asarray(s) ** 2
    Lam = np.eye(len(Xi)) + (kn * ivar[:, None]).T @ kn
    S = np.linalg.inv(Lam)
    b = kn.T @ (ivar * np.asarray(y))
    m = S @ b
    mu = kn @ m
    var = np.maximum(sig2 - np.sum(kn * kn, -1), 1e-5) + np.sum((kn @ S) * kn, -1)
    return m, S, mu, np.sqrt(var), kn


def test_fullrank_batch_solve_matches_dense_oracle():
    x, y, s, _ = make_data()
    model = make_model("full-rank", "cholesky")
    st = model.init_state()
    new = model.batch_solve(st, x, y, s, batch_size=16)
    m_or, S_or, mu_or, sig_or, _ = dense_whitened_oracle(model, st, x, y, s)
    np.testing.assert_allclose(np.asarray(new.theta2), -0.5 * np.linalg.inv(S_or), rtol=1e-8, atol=1e-9)
    qm, qS = model.standard_params(new)
    np.testing.assert_allclose(np.asarray(qm), m_or, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(qS), S_or, rtol=1e-7, atol=1e-9)
    mu, sig = model.predict(new, x)
    np.testing.assert_allclose(np.asarray(mu), mu_or, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sig), sig_or, rtol=1e-6, atol=1e-8)


def test_fullrank_ziggy_predictions_match_cholesky():
    """Basis invariance: the full-rank optimum gives identical predictions in
    the circulant-whitened and cholesky-whitened bases."""
    x, y, s, _ = make_data()
    mc = make_model("full-rank", "cholesky")
    mz = make_model("full-rank", "ziggy")
    stc = mc.init_state()
    stz = mz.init_state()
    newc = mc.batch_solve(stc, x, y, s, batch_size=-1)
    newz = mz.batch_solve(stz, x, y, s, batch_size=-1, maxiter_cg=400)
    muc, sigc = mc.predict(newc, x)
    muz, sigz = mz.predict(newz, x, maxiter_cg=400)
    np.testing.assert_allclose(np.asarray(muz), np.asarray(muc), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sigz), np.asarray(sigc), rtol=1e-4, atol=1e-6)


def test_fullrank_mean_matches_titsias():
    """SGPR check: the optimal-q predictive mean equals
    Knm (sigma^2 Kmm + Kmn Knm)^{-1} Kmn y for homoscedastic noise."""
    x, y, s, _ = make_data()
    noise2 = float(s[0]) ** 2
    model = make_model("full-rank", "cholesky")
    st = model.init_state()
    new = model.batch_solve(st, x, y, s, batch_size=-1)
    mu, _ = model.predict(new, x)

    P = (1.0, float(jnp.exp(st.log_ell)))
    k = SqExp()
    Xi = np.asarray(model.xinduce)
    Kmm = np.asarray(k(jnp.asarray(Xi), jnp.asarray(Xi), P)) + model.jitter * np.eye(len(Xi))
    Kmn = np.asarray(k(jnp.asarray(Xi), x, P))
    A = noise2 * Kmm + Kmn @ Kmn.T
    mu_tits = Kmn.T @ np.linalg.solve(A, Kmn @ np.asarray(y))
    np.testing.assert_allclose(np.asarray(mu), mu_tits, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("family", ["mean-field", "block"])
def test_structured_family_elbo_below_fullrank(family):
    """Structured families are restrictions: their optimal ELBO cannot exceed
    the full-rank optimum."""
    x, y, s, _ = make_data()
    kw = {"block_sizes": (4, 4)} if family == "block" else {}
    mf = make_model(family, "cholesky", **kw)
    fr = make_model("full-rank", "cholesky")
    _, elbo_f = fr.batch_solve(fr.init_state(), x, y, s, compute_elbo=True)
    _, elbo_s = mf.batch_solve(mf.init_state(), x, y, s, compute_elbo=True)
    assert float(elbo_s) <= float(elbo_f) + 1e-6


def test_meanfield_batch_solve_formulas():
    """Mean-field closed form: theta2 = -.5 diag(Lambda), mean solves the
    FULL system big_lam m = b (`ziggy/hipgp.py:336-339`)."""
    x, y, s, _ = make_data()
    model = make_model("mean-field", "cholesky")
    st = model.init_state()
    new = model.batch_solve(st, x, y, s, batch_size=20)
    _, _, _, _, kn = dense_whitened_oracle(model, st, x, y, s)
    ivar = 1.0 / np.asarray(s) ** 2
    lam_diag = 1.0 + np.sum(ivar[:, None] * kn * kn, axis=0)
    biglam = np.eye(kn.shape[1]) + (kn * ivar[:, None]).T @ kn
    b = kn.T @ (ivar * np.asarray(y))
    mhat = np.linalg.solve(biglam, b)
    np.testing.assert_allclose(np.asarray(new.theta2), -0.5 * lam_diag, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(new.theta1), mhat * lam_diag, rtol=1e-5, atol=1e-8)


def test_block_family_machinery():
    """Block index round-trip + block Lambda equals dense Lambda restricted
    to blocks."""
    dims = (8, 8)
    bidx, binv = blk.block_indices(dims, (4, 4))
    v = jnp.arange(64.0)[None, :]
    vb = blk.to_blocks(v, jnp.asarray(bidx))
    assert vb.shape == (1, 4, 16)
    np.testing.assert_allclose(np.asarray(blk.from_blocks(vb, jnp.asarray(binv))), np.asarray(v))

    x, y, s, _ = make_data()
    model = make_model("block", "cholesky", block_sizes=(4, 4))
    st = model.init_state()
    kn = jnp.asarray(np.random.default_rng(1).standard_normal((5, model.Mprime)))
    ivar = jnp.asarray(1.0 / np.asarray(s[:5]) ** 2)
    lam_blocks = model.get_lam(ivar, kn, add_identity=False)
    dense = np.einsum("bi,bj,b->ij", np.asarray(kn), np.asarray(kn), np.asarray(ivar))
    for bi in range(model.num_blocks):
        idx = np.asarray(model.blk_idx)[bi]
        np.testing.assert_allclose(
            np.asarray(lam_blocks)[bi], dense[np.ix_(idx, idx)], rtol=1e-8, atol=1e-10
        )


def test_natgrad_step_reaches_fullrank_optimum():
    """One natural-gradient step with lr=1 on the full batch lands exactly on
    the closed-form optimum (full-rank family property)."""
    x, y, s, _ = make_data()
    model = make_model("full-rank", "cholesky")
    st = model.init_state()
    elbo, g = model.elbo_and_grads(st, x, y, s)
    stepped = st.replace(theta1=st.theta1 - g.theta1, theta2=st.theta2 - g.theta2)
    solved = model.batch_solve(st, x, y, s)
    np.testing.assert_allclose(np.asarray(stepped.theta1), np.asarray(solved.theta1), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(stepped.theta2), np.asarray(solved.theta2), rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("family", ["mean-field", "block", "full-rank"])
def test_natgrad_vanishes_at_batch_solve_optimum(family):
    """The natural gradient is zero exactly at the closed-form optimum —
    the sharpest consistency check between elbo_and_grads and batch_solve."""
    x, y, s, _ = make_data()
    kw = {"block_sizes": (4, 4)} if family == "block" else {}
    model = make_model(family, "cholesky", **kw)
    solved = model.batch_solve(model.init_state(), x, y, s)
    _, g = model.elbo_and_grads(solved, x, y, s)
    assert float(jnp.max(jnp.abs(g.theta1))) < 1e-8
    assert float(jnp.max(jnp.abs(g.theta2))) < 1e-8


def test_block_natgrad_converges_to_batch_solve():
    """Iterated full-batch natgrad steps converge to the closed-form optimum
    (block family; mean-field needs tiny lr on correlated data — by design,
    the reference defaults to lr=1e-2 + decay)."""
    x, y, s, _ = make_data()
    model = make_model("block", "cholesky", block_sizes=(4, 4))
    st = model.init_state()

    @jax.jit
    def step(st):
        elbo, g = model.elbo_and_grads(st, x, y, s)
        return st.replace(
            theta1=st.theta1 - 0.5 * g.theta1, theta2=st.theta2 - 0.5 * g.theta2
        ), elbo

    for _ in range(400):
        st, _ = step(st)
    _, elbo_star = model.batch_solve(model.init_state(), x, y, s, compute_elbo=True)
    final_elbo = model.elbo(st, x, y, s)
    assert abs(float(final_elbo) - float(elbo_star)) < 1e-3


def test_elbo_increases_under_natgrad():
    # moderate noise: coordinate-wise (mean-field) natgrad needs a small lr
    # on correlated data, matching the reference's lr=1e-2 default
    x, y, s, _ = make_data(noise=0.5)
    model = make_model("mean-field", "ziggy", m=6)
    st = model.init_state()

    @jax.jit
    def step(st):
        elbo, g = model.elbo_and_grads(st, x, y, s, maxiter_cg=100)
        return st.replace(
            theta1=st.theta1 - 0.05 * g.theta1, theta2=st.theta2 - 0.05 * g.theta2
        ), elbo

    elbos = []
    for _ in range(60):
        st, elbo = step(st)
        elbos.append(float(elbo))
    assert elbos[-1] > elbos[0]
    diffs = np.diff(elbos)
    assert (diffs > -1e-6).mean() > 0.8


def test_hyper_grads_match_fd():
    x, y, s, _ = make_data(n=30)
    model = make_model("mean-field", "ziggy", m=6)
    st = model.init_state()

    _, g = model.elbo_and_grads(st, x, y, s, maxiter_cg=200, compute_hyper_grads=True)
    eps = 1e-5

    def elbo_at(log_ell):
        return float(model.elbo(st.replace(log_ell=jnp.asarray(log_ell, st.log_ell.dtype)), x, y, s, maxiter_cg=200))

    l0 = float(st.log_ell)
    fd = (elbo_at(l0 + eps) - elbo_at(l0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g.log_ell), -fd, rtol=2e-3, atol=1e-6)


def test_weighted_batch_matches_unpadded():
    """Padded+masked batches give the same elbo/natgrad as the raw batch."""
    x, y, s, _ = make_data(n=30)
    model = make_model("mean-field", "cholesky")
    st = model.init_state()
    e1, g1 = model.elbo_and_grads(st, x, y, s)
    pad = 10
    xpad = jnp.concatenate([x, jnp.ones((pad, 2))])
    ypad = jnp.concatenate([y, jnp.zeros(pad)])
    spad = jnp.concatenate([s, jnp.ones(pad)])
    w = jnp.concatenate([jnp.ones(30), jnp.zeros(pad)])
    e2, g2 = model.elbo_and_grads(st, xpad, ypad, spad, weights=w)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g1.theta1), np.asarray(g2.theta1), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g1.theta2), np.asarray(g2.theta2), rtol=1e-8, atol=1e-12)


def test_integrated_obs_pipeline():
    """Line-integral observations flow end-to-end (analytic SqExp k_semi)."""
    rng = np.random.default_rng(2)
    n = 40
    x = jnp.asarray(rng.uniform(0.2, 0.95, (n, 2)))
    y = jnp.asarray(rng.standard_normal(n) * 0.1 + 1.0)
    s = jnp.asarray(np.full(n, 0.1))
    grids = [jnp.linspace(0.0, 1.0, 6)] * 2
    model = HIPGP(
        SqExp(), grids, num_obs=n, family="mean-field", whitened_type="cholesky",
        ell_init=0.3, noise2_init=0.01, support_integrated_obs=True,
    )
    st = model.init_state()
    new, elbo = model.batch_solve(st, x, y, s, integrated_obs=True, compute_elbo=True)
    assert np.isfinite(float(elbo))
    mu, sig = model.predict(new, x, integrated_obs=True)
    assert np.all(np.isfinite(np.asarray(mu))) and np.all(np.asarray(sig) > 0)
    # predicting the LATENT field at points also works
    mu_f, sig_f = model.predict(new, x)
    assert np.all(np.isfinite(np.asarray(mu_f)))


def test_jit_and_vmap_compose():
    """Model methods are pure: jit compiles them, grads flow."""
    x, y, s, _ = make_data(n=20)
    model = make_model("mean-field", "ziggy", m=6)
    st = model.init_state()
    f = jax.jit(lambda st, x, y, s: model.elbo_and_grads(st, x, y, s, maxiter_cg=20))
    e1, g1 = f(st, x, y, s)
    e2, g2 = model.elbo_and_grads(st, x, y, s, maxiter_cg=20)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-6)


@pytest.mark.parametrize("family", ["mean-field", "block"])
def test_batch_solve_cg_mean_solver_matches_dense(family):
    """mean_solver='cg' (no dense M'xM' Gram) matches the dense solve."""
    x, y, s, _ = make_data()
    kw = {"block_sizes": (4, 4)} if family == "block" else {}
    model = make_model(family, "cholesky", **kw)
    st = model.init_state()
    dense = model.batch_solve(st, x, y, s, batch_size=16, maxiter_cg=200)
    cg = model.batch_solve(st, x, y, s, batch_size=16, maxiter_cg=200,
                           mean_solver="cg", mean_solver_maxiter=500,
                           mean_solver_tol=1e-12)
    np.testing.assert_allclose(np.asarray(cg.theta2), np.asarray(dense.theta2), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(cg.theta1), np.asarray(dense.theta1), rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("family", ["mean-field", "block"])
@pytest.mark.parametrize("whitened", ["cholesky", "ziggy"])
def test_batch_solve_gram_mean_solver_matches_dense(family, whitened):
    """mean_solver='gram' (O(M^2) Woodbury collapse m = R (K+A)^{-1} b_m)
    matches the dense M'xM' solve."""
    x, y, s, _ = make_data()
    kw = {"block_sizes": (4, 4)} if family == "block" else {}
    if family == "block" and whitened == "ziggy":
        kw["m"] = 9  # embedded dim 2m-2 = 16 divisible by the block size
    model = make_model(family, whitened, **kw)
    st = model.init_state()
    dense = model.batch_solve(st, x, y, s, batch_size=16, maxiter_cg=300)
    gram = model.batch_solve(st, x, y, s, batch_size=16, maxiter_cg=300,
                             mean_solver="gram", mean_solver_maxiter=800,
                             mean_solver_tol=1e-14)
    np.testing.assert_allclose(np.asarray(gram.theta2), np.asarray(dense.theta2), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(gram.theta1), np.asarray(dense.theta1), rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("family", ["mean-field", "block"])
def test_batch_solve_matfree_matches_gram(family):
    """mean_solver='matfree' (Woodbury mean with the data-Gram matvec
    re-swept per CG iteration — no resident M x M) matches 'gram' at
    converged mean tolerance, including the ELBO."""
    x, y, s, _ = make_data()
    kw = {"block_sizes": (4, 4), "m": 9} if family == "block" else {}
    model = make_model(family, "ziggy", **kw)
    st = model.init_state()
    gram, e_gram = model.batch_solve(
        st, x, y, s, batch_size=16, maxiter_cg=300, mean_solver="gram",
        mean_solver_maxiter=800, mean_solver_tol=1e-14, compute_elbo=True)
    mf, e_mf = model.batch_solve(
        st, x, y, s, batch_size=16, maxiter_cg=300, mean_solver="matfree",
        mean_solver_maxiter=800, mean_solver_tol=1e-14, compute_elbo=True)
    np.testing.assert_allclose(np.asarray(mf.theta2),
                               np.asarray(gram.theta2), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(mf.theta1),
                               np.asarray(gram.theta1), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(float(e_mf), float(e_gram), rtol=1e-6)


def test_batch_solve_matfree_requires_ziggy():
    x, y, s, _ = make_data()
    model = make_model("mean-field", "cholesky")
    st = model.init_state()
    with pytest.raises(ValueError, match="matfree"):
        model.batch_solve(st, x, y, s, batch_size=16, mean_solver="matfree")


def test_batch_solve_gram_mean_solver_elbo_finite():
    """compute_elbo with the gram mean solver (second-sweep path) matches
    the dense path's ELBO."""
    x, y, s, _ = make_data()
    model = make_model("mean-field", "cholesky")
    st = model.init_state()
    _, e_dense = model.batch_solve(st, x, y, s, batch_size=16, maxiter_cg=200,
                                   compute_elbo=True)
    _, e_gram = model.batch_solve(st, x, y, s, batch_size=16, maxiter_cg=200,
                                  mean_solver="gram", mean_solver_maxiter=800,
                                  mean_solver_tol=1e-14, compute_elbo=True)
    np.testing.assert_allclose(float(e_gram), float(e_dense), rtol=1e-6)


def test_batch_solve_gram_sweep_chunking_bit_identical():
    """Chunking the gram sweep into bounded dispatches (the TPU-watchdog
    fix for M beyond 128^2) is bit-identical to the single-dispatch sweep:
    the chunk boundary splits the same sequential accumulation order, and
    the last chunk's zero-weight pad batches contribute nothing."""
    from hipgp_tpu.models import hipgp as hm

    x, y, s, _ = make_data()
    model = make_model("mean-field", "ziggy")
    st = model.init_state()
    orig = hm.GRAM_SWEEP_MAX_BATCHES
    try:
        hm.GRAM_SWEEP_MAX_BATCHES = 10_000  # one dispatch
        one, e_one = model.batch_solve(
            st, x, y, s, batch_size=16, maxiter_cg=100, mean_solver="gram",
            compute_elbo=True)
        model.__dict__.pop("_gram_jit_cache", None)
        hm.GRAM_SWEEP_MAX_BATCHES = 3  # uneven: forces pad batches too
        many, e_many = model.batch_solve(
            st, x, y, s, batch_size=16, maxiter_cg=100, mean_solver="gram",
            compute_elbo=True)
    finally:
        hm.GRAM_SWEEP_MAX_BATCHES = orig
    np.testing.assert_array_equal(np.asarray(one.theta1), np.asarray(many.theta1))
    np.testing.assert_array_equal(np.asarray(one.theta2), np.asarray(many.theta2))
    assert float(e_one) == float(e_many)


def test_fit_resume_roundtrip(tmp_path):
    """Checkpoint every epoch, interrupt, resume: final state identical to
    an uninterrupted run."""
    from hipgp_tpu.infer import FitConfig, svigp_fit

    x, y, s, _ = make_data(n=40)
    model = make_model("mean-field", "cholesky")
    cfg = FitConfig(epochs=6, batch_size=20, lr=0.02, maxiter_cg=20)
    st0 = model.init_state()
    full, _ = svigp_fit(model, st0, x, y, s, cfg, verbose=False)

    cdir = str(tmp_path / "ckpt")
    cfg3 = FitConfig(epochs=3, batch_size=20, lr=0.02, maxiter_cg=20)
    part, _ = svigp_fit(model, st0, x, y, s, cfg3, verbose=False,
                        checkpoint_dir=cdir, checkpoint_every=1)
    resumed, _ = svigp_fit(model, st0, x, y, s, cfg, verbose=False,
                           checkpoint_dir=cdir, resume=True)
    np.testing.assert_allclose(np.asarray(resumed.theta1), np.asarray(full.theta1), rtol=1e-6, atol=1e-9)


def test_batch_solve_cg_mean_solver_elbo_matches_dense():
    """compute_elbo with the CG mean solver (stacked-kn reuse path) matches
    the dense path's ELBO."""
    x, y, s, _ = make_data()
    model = make_model("mean-field", "cholesky")
    st = model.init_state()
    _, e_dense = model.batch_solve(st, x, y, s, batch_size=16, maxiter_cg=200,
                                   compute_elbo=True)
    _, e_cg = model.batch_solve(st, x, y, s, batch_size=16, maxiter_cg=200,
                                mean_solver="cg", mean_solver_maxiter=500,
                                mean_solver_tol=1e-12, compute_elbo=True)
    np.testing.assert_allclose(float(e_cg), float(e_dense), rtol=1e-6)
