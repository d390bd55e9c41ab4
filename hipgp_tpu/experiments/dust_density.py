"""yt-free dust-density ground truth for the domain (dust-map) experiment.

The reference builds its ground-truth density grid by loading an SPH galaxy
snapshot (the FIRE "latte" m12f npz) and depositing a derived per-particle
field — metal-weighted neutral-hydrogen density — onto an arbitrary grid via
yt (`ziggy/misc/experiment_util_domain.py:301-367`, ``genDustDensity``).  yt
is unavailable here, so this module reimplements the two pieces natively:

* ``metal_weighted_dust_density`` — the reference's derived field formula
  (`experiment_util_domain.py:305-313`), a pure per-particle expression.
* ``sph_deposit`` — standard SPH scatter of a particle field onto a regular
  grid with the M4 cubic-spline kernel (what yt's ``arbitrary_grid`` does for
  SPH particle fields), written as a jitted JAX scatter-add: each particle
  contributes to a static window of cells around it, so the whole deposition
  is one fused gather/compute/scatter program per particle chunk — no Python
  loop over particles.
* ``cic_deposit`` — cloud-in-cell (trilinear) deposition of a mass-like
  quantity, the cheap alternative when smoothing lengths are absent.
* ``gen_dust_density`` — drop-in equivalent of the reference's
  ``genDustDensity(xgrid, nx, ny, nz)`` reading the same latte npz schema.

Tested against brute-force numpy oracles in ``tests/test_dust_density.py``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "metal_weighted_dust_density",
    "sph_deposit",
    "cic_deposit",
    "gen_dust_density",
    "cubic_spline_kernel",
]


def metal_weighted_dust_density(snapshot: dict) -> np.ndarray:
    """Per-particle dust proxy: metal-weighted neutral-hydrogen density.

    Formula from the reference's yt derived field
    (`experiment_util_domain.py:305-313`):
      fractionH = 1 - massfraction_all - massfraction_he
      rho_dust  = rho * fractionH * hydrogen_neutral_fraction * 10**metallicity

    ``snapshot`` uses the latte npz key schema: ``density``,
    ``hydrogenneutralfraction``, ``massfraction`` (N,2: [all, he]),
    ``metallicitytotal``.
    """
    mf = np.asarray(snapshot["massfraction"], dtype=np.float64)
    frac_h = 1.0 - mf[:, 0] - mf[:, 1]
    rho = np.asarray(snapshot["density"], dtype=np.float64)
    neutral = np.asarray(snapshot["hydrogenneutralfraction"], dtype=np.float64)
    metallicity = np.asarray(snapshot["metallicitytotal"], dtype=np.float64)
    return rho * frac_h * neutral * 10.0**metallicity


def cubic_spline_kernel(q: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized M4 cubic spline w(q), support q in [0, 2).

    3-D normalization is 1/(pi h^3) (applied by the caller)."""
    w1 = 1.0 - 1.5 * q**2 + 0.75 * q**3
    w2 = 0.25 * (2.0 - q) ** 3
    return jnp.where(q < 1.0, w1, jnp.where(q < 2.0, w2, 0.0))


def _window_offsets(w: int) -> np.ndarray:
    """(w^3, 3) integer offsets covering a w-cell cube centered at 0."""
    r = np.arange(w) - (w - 1) // 2
    ox, oy, oz = np.meshgrid(r, r, r, indexing="ij")
    return np.column_stack([ox.ravel(), oy.ravel(), oz.ravel()])


@functools.partial(jax.jit, static_argnames=("dims", "window"))
def _sph_scatter_chunk(
    grid_flat, pos, vals, hs, left, cell, dims, window
):
    """Scatter one particle chunk into the flat grid; returns updated grid.

    pos (B,3), vals (B,) = (m/rho)*A per particle, hs (B,) smoothing lengths.
    Each particle deposits onto a static ``window``^3 cube of cells around its
    base cell; contributions beyond the kernel support or the grid are zeroed
    and routed to index 0 (weight 0), keeping shapes static for XLA.
    """
    offsets = jnp.asarray(_window_offsets(window))  # (W3, 3)
    dims_arr = jnp.asarray(dims)
    # base (nearest-center) cell per particle
    base = jnp.floor((pos - left) / cell - 0.5).astype(jnp.int32)  # (B, 3)
    idx = base[:, None, :] + offsets[None, :, :]  # (B, W3, 3)
    inside = jnp.all((idx >= 0) & (idx < dims_arr), axis=-1)  # (B, W3)
    centers = left + (idx.astype(pos.dtype) + 0.5) * cell  # (B, W3, 3)
    r = jnp.sqrt(jnp.sum((centers - pos[:, None, :]) ** 2, axis=-1))
    h = hs[:, None]
    w = cubic_spline_kernel(r / h) / (jnp.pi * h**3)
    w = jnp.where(inside, w, 0.0) * vals[:, None]  # (B, W3)
    flat_idx = (idx[..., 0] * dims[1] + idx[..., 1]) * dims[2] + idx[..., 2]
    flat_idx = jnp.where(inside, flat_idx, 0)
    return grid_flat.at[flat_idx.reshape(-1)].add(w.reshape(-1))


def sph_deposit(
    positions: np.ndarray,
    values: np.ndarray,
    masses: np.ndarray,
    densities: np.ndarray,
    smoothing_lengths: np.ndarray,
    left_edge,
    right_edge,
    dims,
    chunk: int = 65536,
    max_window: int = 9,
) -> np.ndarray:
    """SPH scatter of a per-particle field onto a regular grid.

    Standard scatter estimate at each cell center x:
      A(x) = sum_p (m_p / rho_p) A_p W(|x - x_p|, h_p)
    with the M4 cubic-spline kernel (support 2h).  Particles whose support
    exceeds ``max_window`` cells are deposited with h clipped to the window
    (they are the smooth background; the clip is reported via the return's
    ``.clipped`` attribute-free design — callers can pre-check h/dx).

    Returns a (nx, ny, nz) numpy array.
    """
    positions = np.asarray(positions, dtype=np.float32)
    vals = np.asarray(
        (np.asarray(masses, np.float64) / np.maximum(np.asarray(densities, np.float64), 1e-300))
        * np.asarray(values, np.float64),
        dtype=np.float32,
    )
    hs = np.asarray(smoothing_lengths, dtype=np.float32)
    left = np.asarray(left_edge, dtype=np.float32)
    right = np.asarray(right_edge, dtype=np.float32)
    dims = tuple(int(d) for d in dims)
    cell = (right - left) / np.asarray(dims, dtype=np.float32)
    # window must cover support radius 2h in cells MEASURED FROM THE
    # PARTICLE, which sits up to one cell past its floor-biased base-cell
    # center — budget one extra cell per side both in the h clip and in the
    # window size, or upper-cell particles lose kernel-tail contributions.
    # Floor the clip at a quarter cell: max_window <= 4 would otherwise
    # drive max_h to 0 and the r/h, 1/h^3 kernel terms to NaN (tiny windows
    # then degrade to nearest-cells deposition with a documented tail loss,
    # they do not blow up).  The same floor keeps h=0 input particles
    # finite — they deposit like narrow blobs instead of vanishing.
    max_h = float(cell.min()) * max(((max_window - 1) // 2 - 1) / 2.0, 0.25)
    hs = np.clip(hs, float(cell.min()) * 0.25, max_h)
    need = (
        (int(np.ceil(2.0 * hs.max() / cell.min())) + 1) * 2 + 1
        if len(hs) else 1
    )
    window = min(max(need, 3), max_window)

    grid = jnp.zeros(int(np.prod(dims)), dtype=jnp.float32)
    cell_j = jnp.asarray(cell)
    left_j = jnp.asarray(left)
    n = len(positions)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        # pad the tail chunk to the static size with zero-weight particles
        p = positions[s:e]
        v = vals[s:e]
        h = hs[s:e]
        if e - s < chunk and n > chunk:
            pad = chunk - (e - s)
            p = np.concatenate([p, np.full((pad, 3), left - 1e3, np.float32)])
            v = np.concatenate([v, np.zeros(pad, np.float32)])
            h = np.concatenate([h, np.full(pad, hs.max() if len(hs) else 1.0, np.float32)])
        grid = _sph_scatter_chunk(
            grid, jnp.asarray(p), jnp.asarray(v), jnp.asarray(h),
            left_j, cell_j, dims, window,
        )
    return np.asarray(grid).reshape(dims)


@functools.partial(jax.jit, static_argnames=("dims",))
def _cic_scatter_chunk(grid_flat, pos, vals, left, cell, dims):
    dims_arr = jnp.asarray(dims)
    u = (pos - left) / cell - 0.5  # cell-center coordinates
    i0 = jnp.floor(u).astype(jnp.int32)
    frac = u - i0
    corners = jnp.asarray(
        [[a, b, c] for a in (0, 1) for b in (0, 1) for c in (0, 1)], dtype=jnp.int32
    )
    idx = i0[:, None, :] + corners[None, :, :]  # (B, 8, 3)
    w = jnp.prod(
        jnp.where(corners[None, :, :] == 1, frac[:, None, :], 1.0 - frac[:, None, :]),
        axis=-1,
    )  # (B, 8)
    inside = jnp.all((idx >= 0) & (idx < dims_arr), axis=-1)
    w = jnp.where(inside, w, 0.0) * vals[:, None]
    flat_idx = (idx[..., 0] * dims[1] + idx[..., 1]) * dims[2] + idx[..., 2]
    flat_idx = jnp.where(inside, flat_idx, 0)
    return grid_flat.at[flat_idx.reshape(-1)].add(w.reshape(-1))


def cic_deposit(positions, quantity, left_edge, right_edge, dims, chunk: int = 262144):
    """Cloud-in-cell deposition: trilinearly spread each particle's quantity
    over its 8 surrounding cell centers, divided by cell volume (so a mass
    quantity deposits a density grid).  Returns (nx, ny, nz) numpy."""
    positions = np.asarray(positions, dtype=np.float32)
    q = np.asarray(quantity, dtype=np.float32)
    left = np.asarray(left_edge, dtype=np.float32)
    right = np.asarray(right_edge, dtype=np.float32)
    dims = tuple(int(d) for d in dims)
    cell = (right - left) / np.asarray(dims, dtype=np.float32)
    vol = float(np.prod(cell))
    grid = jnp.zeros(int(np.prod(dims)), dtype=jnp.float32)
    n = len(positions)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        p, v = positions[s:e], q[s:e]
        if e - s < chunk and n > chunk:
            pad = chunk - (e - s)
            p = np.concatenate([p, np.full((pad, 3), left - 1e3, np.float32)])
            v = np.concatenate([v, np.zeros(pad, np.float32)])
        grid = _cic_scatter_chunk(
            grid, jnp.asarray(p), jnp.asarray(v), jnp.asarray(left), jnp.asarray(cell), dims
        )
    return np.asarray(grid).reshape(dims) / vol


def gen_dust_density(
    xgrid: np.ndarray,
    nx: int,
    ny: int,
    nz: int,
    snapshot_path: str = "latte10kpc_m12f_lsr2_corrected.npz",
    method: str = "sph",
) -> np.ndarray:
    """Drop-in equivalent of the reference's ``genDustDensity``
    (`experiment_util_domain.py:301-367`) without yt.

    Loads the latte-format npz snapshot, derives the per-particle
    metal-weighted neutral-hydrogen density, and deposits it onto the
    [-max|x|, max|x|]^3 grid spanned by ``xgrid`` with ``nx*ny*nz`` cells.
    ``method``: 'sph' (cubic-spline scatter, needs ``smoothlength``) or
    'cic' (trilinear mass deposition / cell volume).
    """
    latte = np.load(snapshot_path)
    pos = np.column_stack([latte["x"], latte["y"], latte["z"]])
    dust_rho = metal_weighted_dust_density(latte)
    scales = np.max(np.abs(np.asarray(xgrid)), axis=0)
    left, right = -scales, scales
    if method == "sph" and "smoothlength" in getattr(latte, "files", []):
        return sph_deposit(
            pos, dust_rho, latte["mass"], latte["density"], latte["smoothlength"],
            left, right, (nx, ny, nz),
        )
    # mass-weighted CIC: deposit dust mass = (m/rho)*rho_dust, get density
    m_dust = np.asarray(latte["mass"], np.float64) / np.maximum(
        np.asarray(latte["density"], np.float64), 1e-300
    ) * dust_rho
    return cic_deposit(pos, m_dust, left, right, (nx, ny, nz))
