"""yt-free dust deposition vs brute-force numpy oracles.

Parity target: `ziggy/misc/experiment_util_domain.py:301-367` (genDustDensity).
"""
import numpy as np
import pytest

from hipgp_tpu.experiments.dust_density import (
    cic_deposit,
    cubic_spline_kernel,
    gen_dust_density,
    metal_weighted_dust_density,
    sph_deposit,
)


def _cell_centers(left, right, dims):
    axes = [
        left[d] + (np.arange(dims[d]) + 0.5) * (right[d] - left[d]) / dims[d]
        for d in range(3)
    ]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    return np.column_stack([gx.ravel(), gy.ravel(), gz.ravel()])


def _sph_oracle(pos, vals, m, rho, hs, left, right, dims):
    """Brute force: A(x) = sum_p (m_p/rho_p) A_p W(|x-x_p|, h_p)."""
    centers = _cell_centers(left, right, dims)
    out = np.zeros(len(centers))
    for p in range(len(pos)):
        r = np.linalg.norm(centers - pos[p], axis=1)
        q = r / hs[p]
        w = np.where(
            q < 1.0,
            1 - 1.5 * q**2 + 0.75 * q**3,
            np.where(q < 2.0, 0.25 * (2 - q) ** 3, 0.0),
        ) / (np.pi * hs[p] ** 3)
        out += (m[p] / rho[p]) * vals[p] * w
    return out.reshape(dims)


def test_sph_deposit_matches_bruteforce():
    rs = np.random.RandomState(0)
    n, dims = 40, (6, 5, 4)
    left, right = np.array([-1.0, -1.0, -1.0]), np.array([1.0, 1.0, 1.0])
    pos = rs.uniform(-0.8, 0.8, (n, 3))
    vals = rs.uniform(0.5, 2.0, n)
    m = rs.uniform(0.5, 1.5, n)
    rho = rs.uniform(0.5, 1.5, n)
    hs = rs.uniform(0.15, 0.4, n)  # support 2h <= 0.8 < window reach
    got = sph_deposit(pos, vals, m, rho, hs, left, right, dims, chunk=16, max_window=11)
    want = _sph_oracle(pos, vals, m, rho, hs, left, right, dims)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_sph_deposit_tiny_window_and_h_stay_finite():
    """max_window <= 4 drives the h clip to its quarter-cell floor (it used
    to clip to 0, putting NaN/Inf through r/h and 1/h^3), and h=0 input
    particles deposit as narrow finite blobs instead of NaNs."""
    rs = np.random.RandomState(2)
    n, dims = 20, (6, 6, 6)
    left, right = np.array([-1.0, -1.0, -1.0]), np.array([1.0, 1.0, 1.0])
    pos = rs.uniform(-0.8, 0.8, (n, 3))
    vals = rs.uniform(0.5, 2.0, n)
    m = np.ones(n)
    rho = np.ones(n)
    hs = rs.uniform(0.1, 0.3, n)
    hs[:4] = 0.0  # degenerate smoothing lengths
    for win in (3, 4, 9):
        got = sph_deposit(pos, vals, m, rho, hs, left, right, dims,
                          chunk=8, max_window=win)
        assert np.all(np.isfinite(got)), f"non-finite deposit at window {win}"
        assert got.max() > 0.0


def test_cic_mass_conservation_and_oracle():
    rs = np.random.RandomState(1)
    n, dims = 200, (8, 8, 8)
    left, right = np.array([0.0, 0.0, 0.0]), np.array([2.0, 2.0, 2.0])
    cell = (right - left) / np.array(dims)
    # keep particles >1 cell from the boundary so no mass leaks out
    pos = rs.uniform(0.3, 1.7, (n, 3))
    q = rs.uniform(0.1, 1.0, n)
    grid = cic_deposit(pos, q, left, right, dims, chunk=64)
    vol = float(np.prod(cell))
    np.testing.assert_allclose(grid.sum() * vol, q.sum(), rtol=1e-5)

    # single particle exactly at a cell center deposits only there
    c0 = left + (np.array([2, 3, 4]) + 0.5) * cell
    g1 = cic_deposit(c0[None, :], np.array([3.0]), left, right, dims)
    assert g1[2, 3, 4] == pytest.approx(3.0 / vol, rel=1e-6)
    assert np.count_nonzero(g1) == 1


def test_metal_weighted_density_formula():
    snap = {
        "density": np.array([2.0, 4.0]),
        "hydrogenneutralfraction": np.array([0.5, 0.25]),
        "massfraction": np.array([[0.1, 0.2], [0.05, 0.25]]),
        "metallicitytotal": np.array([0.0, 1.0]),
    }
    got = metal_weighted_dust_density(snap)
    want = np.array([2.0 * 0.7 * 0.5 * 1.0, 4.0 * 0.7 * 0.25 * 10.0])
    np.testing.assert_allclose(got, want)


def test_gen_dust_density_from_synthetic_snapshot(tmp_path):
    """End-to-end genDustDensity parity on a tiny synthetic latte-format npz."""
    rs = np.random.RandomState(2)
    n = 100
    path = tmp_path / "latte.npz"
    np.savez(
        path,
        x=rs.uniform(-1, 1, n), y=rs.uniform(-1, 1, n), z=rs.uniform(-1, 1, n),
        density=rs.uniform(0.5, 1.5, n),
        hydrogenneutralfraction=rs.uniform(0, 1, n),
        massfraction=rs.uniform(0.05, 0.3, (n, 2)),
        metallicitytotal=rs.uniform(-1, 0.5, n),
        smoothlength=rs.uniform(0.2, 0.5, n),
        mass=rs.uniform(0.5, 1.5, n),
    )
    xgrid = rs.uniform(-1, 1, (50, 3))
    for method in ("sph", "cic"):
        grid = gen_dust_density(xgrid, 6, 6, 6, snapshot_path=str(path), method=method)
        assert grid.shape == (6, 6, 6)
        assert np.all(np.isfinite(grid)) and grid.max() > 0


def test_cubic_spline_normalization():
    """int W d^3r = 1: radial quadrature of the normalized kernel."""
    import numpy as np
    r = np.linspace(0, 2, 20001)
    q = r
    w = np.where(q < 1, 1 - 1.5 * q**2 + 0.75 * q**3,
                 np.where(q < 2, 0.25 * (2 - q) ** 3, 0.0)) / np.pi
    integral = np.trapezoid(4 * np.pi * r**2 * w, r)
    np.testing.assert_allclose(integral, 1.0, rtol=1e-6)
    # jax version agrees with numpy branch values
    import jax.numpy as jnp
    np.testing.assert_allclose(
        np.asarray(cubic_spline_kernel(jnp.asarray([0.5, 1.5, 2.5]))),
        [1 - 1.5 * 0.25 + 0.75 * 0.125, 0.25 * 0.5**3, 0.0],
    )
