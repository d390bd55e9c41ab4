"""Smoke-run every experiment driver at tiny scale."""
import os

import numpy as np
import pandas as pd
import pytest

from hipgp_tpu.experiments import (
    preconditioner_analysis,
    run_3droad,
    run_derivative_1d,
    run_domain,
    run_pcg_vs_cholesky,
    run_solve_kn,
    run_synthetic,
    run_ukhousing,
)


def test_run_solve_kn(tmp_path):
    res = run_solve_kn.main([
        "--gridsizes", "12", "--num-iters", "60", "--bsz", "4",
        "--output-dir", str(tmp_path), "--no-plots", "--f64",
    ])
    df_cg = res[12]["cg"]
    df_pcg = res[12]["pcg"]
    assert (tmp_path / "pcg-trace-grid12.csv").exists()
    # PCG reaches a given error in fewer iterations than CG
    thresh = df_cg["rmse"].values[-1] * 10 + 1e-12
    it_cg = int(np.argmax(df_cg["rmse"].values < thresh))
    it_pcg = int(np.argmax(df_pcg["rmse"].values < thresh))
    assert it_pcg <= it_cg


def test_run_pcg_vs_cholesky(tmp_path):
    res = run_pcg_vs_cholesky.main([
        "--sizes", "256", "1024", "--kernels", "SqExp",
        "--bsz", "2", "--reps", "1", "--output-dir", str(tmp_path), "--f64",
    ])
    df = res["SqExp"]
    assert (tmp_path / "wall_clock_time_summary_pcg_vs_cholesky_SqExp.csv").exists()
    assert np.all(np.isfinite(df["pcg_fft_sec"]))
    assert np.all(np.isfinite(df["cholesky_sec"]))


def test_run_synthetic(tmp_path):
    sdf = run_synthetic.main([
        "--nobs", "300", "--ntest", "60", "--noise-std", "0.1",
        "--function-complexity", "simple",
        "--num-inducing", "8", "--gridnum", "12",
        "--models", "mean-field", "--ell", "0.3",
        "--epochs", "2", "--batch-size", "100", "--maxiter-cg", "20",
        "--output-dir", str(tmp_path), "--f64",
    ])
    assert (tmp_path / "errordf-summary.csv").exists()
    assert float(sdf["rmse-to-std"].iloc[0]) < 5.0


def test_run_derivative_1d(tmp_path):
    df = run_derivative_1d.main([
        "--nlatent", "60", "--nprime", "8", "--num-inducing", "32",
        "--steps", "5", "--maxiter-cg", "40",
        "--whitened-type", "cholesky",
        "--output-dir", str(tmp_path), "--f64",
    ])
    assert (tmp_path / "derivative-1d-summary.csv").exists()
    assert float(df["latent_rmse"].iloc[0]) < 1.0


def test_run_domain_synthetic(tmp_path):
    run_domain.main([
        "--nobs", "200", "--ntest", "40", "--nx", "6", "--nz", "4",
        "--ell", "0.4", "--maxiter-cg", "20", "--eval-grid", "6",
        "--batch-size", "120",
        "--output-dir", str(tmp_path), "--f64",
    ])
    odir = tmp_path / "domain-mean-field"
    assert (odir / "predictions.npz").exists()
    preds = np.load(odir / "predictions.npz")
    assert "emu_test" in preds.files  # integrated predictions
    assert "fmu_grid" in preds.files  # latent field slice
    assert np.all(np.isfinite(preds["emu_test"]))
    # dust-map posterior scatter figures (exp_utils.py:74-252 parity)
    assert (odir / "predict-emu-test-3D.pdf").exists()
    assert (odir / "predict-ez-test-3D.pdf").exists()


def test_run_domain_with_snapshot_truth(tmp_path):
    """--snapshot builds the ground-truth grid by native deposition."""
    rs = np.random.RandomState(3)
    n = 300
    snap = tmp_path / "latte.npz"
    np.savez(
        snap,
        x=rs.uniform(-1, 1, n), y=rs.uniform(-1, 1, n), z=rs.uniform(-1, 1, n),
        density=rs.uniform(0.5, 1.5, n),
        hydrogenneutralfraction=rs.uniform(0, 1, n),
        massfraction=rs.uniform(0.05, 0.3, (n, 2)),
        metallicitytotal=rs.uniform(-1, 0.5, n),
        smoothlength=rs.uniform(0.2, 0.5, n),
        mass=rs.uniform(0.5, 1.5, n),
    )
    # reference-format observation table (no density column -> fgrid must
    # come from the snapshot deposition)
    import pandas as pd
    m = 240
    xyz = rs.uniform(-1, 1, (m, 3))
    xyz = xyz[np.linalg.norm(xyz, axis=1) > 0.2]
    pd.DataFrame({
        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
        "e": np.abs(rs.randn(len(xyz))) + 0.1,
        "e_err": 0.05 * np.ones(len(xyz)),
    }).to_csv(tmp_path / "obs.dat", sep=" ", index=False)
    run_domain.main([
        "--data-path", str(tmp_path / "obs.dat"),
        "--snapshot", str(snap),
        "--ntest", "40", "--nx", "6", "--nz", "4",
        "--ell", "0.4", "--maxiter-cg", "10", "--eval-grid", "6",
        "--batch-size", "100", "--epochs", "2",
        "--output-dir", str(tmp_path), "--f64",
    ])
    preds = np.load(tmp_path / "domain-mean-field" / "predictions.npz")
    assert "fgrid" in preds.files  # snapshot-derived latent truth present
    assert np.all(np.isfinite(preds["fgrid"]))


def test_run_ukhousing_synthetic(tmp_path):
    run_ukhousing.main([
        "--nobs", "400", "--ntest", "80",
        "--num-inducing-x", "10", "--num-inducing-y", "8",
        "--ell", "1.0", "--maxiter-cg", "20",
        "--output-dir", str(tmp_path),
    ])
    assert (tmp_path / "ukhousing-mean-field" / "noise_reduction.csv").exists()


def test_run_3droad_synthetic(tmp_path):
    run_3droad.main([
        "--nobs", "400", "--num-inducing", "8", "--ell", "0.5",
        "--maxiter-cg", "20", "--output-dir", str(tmp_path),
    ])
    odir = tmp_path / "3droad-mean-field"
    preds = np.load(odir / "predictions.npz")
    assert "fmu_valid" in preds.files and "fmu_test" in preds.files


def test_run_3droad_learn_kernel_through_ziggy_whitening(tmp_path):
    """--whitening ziggy + --learn-kernel: hyperparameter gradients flow
    through the iterative PCG whitening (implicit diff), a configuration
    the reference's dense-Cholesky assert rules out
    (`run_3droad_experiment.py:205`)."""
    run_3droad.main([
        "--nobs", "400", "--num-inducing", "8", "--ell", "0.5",
        "--fit-method", "natgrad", "--learn-kernel", "--whitening", "ziggy",
        "--theta2-warmstart", "--epochs", "3", "--batch-size", "128",
        "--kernel-lr", "1e-2", "--maxiter-cg", "20",
        "--output-dir", str(tmp_path),
    ])
    odir = tmp_path / "3droad-mean-field"
    ell = np.load(odir / "ell_trace.npy")
    elbo = np.load(odir / "elbo_trace.npy")
    assert np.isfinite(elbo).all()
    # hyperparameters moved under the through-the-solve gradients
    assert abs(float(ell[-1]) - 0.5) > 1e-4


def test_preconditioner_analysis(tmp_path):
    df = preconditioner_analysis.main([
        "--sizes", "16", "64", "--kernels", "Mat52", "--ells", "0.05",
        "--tol", "1e-5", "--maxiter", "500", "--output-dir", str(tmp_path),
        "--f64",
    ])
    assert (tmp_path / "r_pcg.csv").exists()
    # the preconditioner helps: r_pcg < 1
    assert (df["r_pcg"] <= 1.0).all()


def test_demo_1d(tmp_path):
    from hipgp_tpu.experiments import demo_1d

    res = demo_1d.main(["--n", "150", "--num-inducing", "24",
                        "--out", str(tmp_path / "demo.png")])
    assert (tmp_path / "demo.png").exists()
    assert set(res) == {"SVGP (dense)", "HIP-GP (mean-field)"}
