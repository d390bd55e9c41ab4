"""Natgrad trajectory parity vs the LIVE reference training loop.

Runs the actual ziggy MeanFieldToeplitzGP natural-gradient loop (via the
torch-2.x API shims in experiments/ref_compat.py) and our svigp_fit with
identical data, init, and settings (`ziggy/svi_gp.py:282-388` semantics:
SGD, shuffle=False, cold expectation-family init), and requires the
per-epoch mean-batch-ELBO and test-RMSE trajectories to agree to f64
precision.  The full protocol artifact lives in
experiments/natgrad_trajectory.py (RESULTS §12).
"""
import os
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "ziggy")), reason="reference not present"
)


def _args(**kw):
    base = dict(
        nobs=400, ntest=200, m1=10, epochs=3, batch_size=100, lr=1e-2,
        schedule_lr=True, step_decay=0.97, maxiter_cg=10,
        predict_maxiter_cg=20, ell=0.2, sig2=0.6, noise=0.1, gridnum=30,
        seed=7, warmstart=False, paper=False,
        family="mean-field", xblock_size=3, learn_kernel=False,
        kernel_lr=1e-3,
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


@pytest.fixture(scope="module")
def trajectories():
    from hipgp_tpu.experiments.natgrad_trajectory import run_jax, run_ref
    from hipgp_tpu.experiments.synthetic_data import make_two_dim_data

    args = _args()
    data = make_two_dim_data(
        Nobs=args.nobs, Ntest=args.ntest, noise_std=args.noise,
        gridnum=args.gridnum, seed=args.seed,
    )
    return run_ref(data, args), run_jax(data, args)


def test_elbo_trajectory_matches_live_reference(trajectories):
    ref, jax_rows = trajectories
    assert len(ref) == len(jax_rows) == 3
    for r, j in zip(ref, jax_rows):
        # truncated-CG iterates differ at the last ulp between the two
        # linear-algebra stacks and compound over epochs; measured ~5e-9
        # rel at 3 epochs (1e-15 at the 16-point reduced protocol)
        np.testing.assert_allclose(j["elbo"], r["elbo"], rtol=1e-6)


def test_rmse_trajectory_matches_live_reference(trajectories):
    ref, jax_rows = trajectories
    for r, j in zip(ref, jax_rows):
        np.testing.assert_allclose(j["rmse"], r["rmse"], rtol=1e-7)


def test_coverage_trajectory_matches_live_reference(trajectories):
    """Per-epoch z-score coverage (|f_true - mu| < s*sig fractions, the
    reference's coverage-table statistic, `ziggy/misc/experiment_util.py:
    696-737`) must match the live reference at every epoch: calibration —
    including the paper-scale conservativeness documented in RESULTS §5 —
    is a property of the SHARED truncated-PCG variance decomposition, not
    a deviation of this rebuild (measured 0.0 deviation at reduced scale,
    results/coverage-parity*/)."""
    ref, jax_rows = trajectories
    for r, j in zip(ref, jax_rows):
        for s in (0.5, 1.0, 2.0, 3.0):
            c = f"cov{s:g}"
            # coverage is a fraction over ntest points: identical z-score
            # vectors give identical fractions; one boundary point may
            # flip on last-ulp sig differences between the linalg stacks
            assert abs(j[c] - r[c]) <= 1.0 / 200 + 1e-12, (c, r[c], j[c])


@pytest.fixture(scope="module")
def svgp_trajectories():
    from hipgp_tpu.experiments.natgrad_trajectory import run_jax_svgp, run_ref_svgp
    from hipgp_tpu.experiments.synthetic_data import make_two_dim_data

    args = _args(nobs=300, ntest=100, m1=5, epochs=3, batch_size=100,
                 maxiter_cg=0)
    data = make_two_dim_data(
        Nobs=args.nobs, Ntest=args.ntest, noise_std=args.noise,
        gridnum=args.gridnum, seed=args.seed,
    )
    return run_ref_svgp(data, args), run_jax_svgp(data, args)


def test_svgp_trajectory_matches_live_reference(svgp_trajectories):
    """Dense-SVGP natgrad vs the live reference (whitened mode; the
    reference's hard-coded 1000/N natgrad rescale and omitted Gaussian
    normalizer are mirrored by the driver — `run_jax_svgp` docstring)."""
    ref, jax_rows = svgp_trajectories
    assert len(ref) == len(jax_rows) == 3
    for r, j in zip(ref, jax_rows):
        # ~2e-10 rel: cholesky/triangular-solve last-ulp differences
        # between the linalg stacks compounding over epochs
        np.testing.assert_allclose(j["elbo"], r["elbo"], rtol=1e-8)
        np.testing.assert_allclose(j["rmse"], r["rmse"], rtol=1e-8)


@pytest.fixture(scope="module")
def block_trajectories():
    from hipgp_tpu.experiments.natgrad_trajectory import run_jax, run_ref
    from hipgp_tpu.experiments.synthetic_data import make_two_dim_data

    args = _args(family="block", m1=10, epochs=2)  # expanded 18 = 2*3*3, /3 blocks
    args.xblock_size = 3
    data = make_two_dim_data(
        Nobs=args.nobs, Ntest=args.ntest, noise_std=args.noise,
        gridnum=args.gridnum, seed=args.seed,
    )
    return run_ref(data, args), run_jax(data, args)


def test_block_family_trajectory_matches_live_reference(block_trajectories):
    """Block-diagonal family natgrad vs the live reference (the third
    family, full-rank, has a broken natgrad in the reference itself:
    `ziggy/hipgp.py:266-270` assigns a (M',M')-broadcast deta1 to the
    (M',1) theta1 grad — unrunnable as shipped; our full-rank natgrad is
    validated against the Titsias optimum in test_hipgp_model instead)."""
    ref, jax_rows = block_trajectories
    for r, j in zip(ref, jax_rows):
        np.testing.assert_allclose(j["elbo"], r["elbo"], rtol=1e-6)
        np.testing.assert_allclose(j["rmse"], r["rmse"], rtol=1e-6)
