"""Plotting helpers (matplotlib, Agg backend).

Parity reference: `ziggy/viz.py` (plot_smooth / plot_comparison /
ax_scatter) plus the epoch-callback figures from
`ziggy/misc/experiment_util.py` (elbo trace, posterior maps, z-score
histogram, QQ).
"""
from __future__ import annotations

import os
from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

__all__ = [
    "plot_smooth",
    "plot_comparison",
    "ax_scatter",
    "plot_elbo_trace",
    "plot_posterior_grid",
    "plot_qq",
    "plot_zscore_histogram",
    "plot_domain_result",
    "plot_error_boxes",
]


def plot_smooth(ax, vals, xlo, xhi, ylo, yhi, vmin=None, vmax=None, cmap="viridis"):
    """imshow a gridded field with physical extent (reference viz.plot_smooth)."""
    im = ax.imshow(
        np.asarray(vals).T,
        origin="lower",
        extent=(xlo, xhi, ylo, yhi),
        vmin=vmin,
        vmax=vmax,
        cmap=cmap,
        aspect="auto",
    )
    return im


def ax_scatter(ax, x, c=None, s=3, **kwargs):
    x = np.asarray(x)
    return ax.scatter(x[:, 0], x[:, 1], c=c, s=s, **kwargs)


def plot_comparison(ftrue_grid, fmu_grid, extent, path=None, titles=("truth", "posterior mean", "error")):
    """Side-by-side truth / posterior / error maps."""
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    vmin = float(np.nanmin(ftrue_grid))
    vmax = float(np.nanmax(ftrue_grid))
    ims = [
        plot_smooth(axes[0], ftrue_grid, *extent, vmin=vmin, vmax=vmax),
        plot_smooth(axes[1], fmu_grid, *extent, vmin=vmin, vmax=vmax),
        plot_smooth(axes[2], np.asarray(fmu_grid) - np.asarray(ftrue_grid), *extent, cmap="RdBu"),
    ]
    for ax, im, t in zip(axes, ims, titles):
        ax.set_title(t)
        fig.colorbar(im, ax=ax)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_elbo_trace(trace, path=None):
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(np.asarray(trace))
    ax.set_xlabel("batch")
    ax.set_ylabel("ELBO")
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_posterior_grid(fmu, fsig, grid_shape, extent, path=None):
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    im0 = plot_smooth(axes[0], np.asarray(fmu).reshape(grid_shape), *extent)
    im1 = plot_smooth(axes[1], np.asarray(fsig).reshape(grid_shape), *extent, cmap="magma")
    axes[0].set_title("posterior mean")
    axes[1].set_title("posterior std")
    fig.colorbar(im0, ax=axes[0])
    fig.colorbar(im1, ax=axes[1])
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_qq(zscores_by_model, path=None):
    from .utils.metrics import qq_data

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot([-3, 3], [-3, 3], "--", c="grey", lw=2, zorder=-1)
    markers = ["o", "s", "d", "^", "3", "4", "8"]
    for (name, z), m in zip(zscores_by_model.items(), markers):
        znorm, zsorted = qq_data(z)
        ax.scatter(znorm[::5], zsorted[::5], s=25, label=name, marker=m)
    ax.legend(fontsize=12, frameon=True, framealpha=0.8)
    ax.set_xlim(-3.2, 3.2)
    ax.set_ylim(-3.2, 3.2)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_zscore_histogram(zscores, name="model", path=None):
    from scipy.stats import norm

    z = np.asarray(zscores).reshape(-1)
    z = z[~np.isnan(z)]
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(z, bins=30, density=True, alpha=0.5, label=name)
    xgrid = np.linspace(-3, 3, 100)
    ax.plot(xgrid, norm.pdf(xgrid), label="N(0,1)")
    ax.set_xlabel("z score")
    ax.set_ylabel("density")
    ax.legend(frameon=True, loc="upper left")
    ax.set_xlim(-3, 3)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_domain_result(odir, pdict, slice_center=0.0, slice_halfwidth=0.05):
    """3-D posterior scatter figures + 2-D z-slice figures for the dust map.

    Parity: `experiments-hip-gp/exp_utils.py:74-252` (plot_domain_rslt) — for
    each of {posterior mean, posterior std, residual, relative error, z-score}
    of the integrated observable e, a 3-D scatter over all test points
    (predict-<q>-test-3D.pdf) and a 2-D scatter of the slice
    |z - slice_center| <= slice_halfwidth (predict-<q>-test-2D.pdf).

    pdict keys: xtest (N,3), etest, emu_test, esig_test (all (N,)).
    Quantities lacking data are skipped (the reference wraps this in a bare
    try/except; here it's explicit).
    """
    xtest = np.asarray(pdict["xtest"])
    if xtest.ndim != 2 or xtest.shape[1] != 3:
        return []
    if not all(k in pdict and pdict[k] is not None for k in ("etest", "emu_test", "esig_test")):
        return []
    etest = np.asarray(pdict["etest"]).reshape(-1)
    emu = np.asarray(pdict["emu_test"]).reshape(-1)
    esig = np.asarray(pdict["esig_test"]).reshape(-1)
    eres = emu - etest
    with np.errstate(divide="ignore", invalid="ignore"):
        erel = eres / etest
        ez = -eres / esig
    quantities = [
        ("emu", emu, "Posterior mean of $e$"),
        ("esig", esig, "Posterior error in $e$"),
        ("eres", eres, "Residual of $e$"),
        ("erel", erel, "Relative error in $e$"),
        ("ez", ez, "Z-score of $e$"),
    ]
    in_slice = np.abs(xtest[:, 2] - slice_center) <= slice_halfwidth
    written = []
    for tag, vals, label in quantities:
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(projection="3d")
        im = ax.scatter(xtest[:, 0], xtest[:, 1], xtest[:, 2], c=vals, s=20)
        cbar = fig.colorbar(im, location="left")
        cbar.set_label(label)
        ax.set_xlabel(r"$x$ (kpc)")
        ax.set_ylabel(r"$y$ (kpc)")
        ax.set_zlabel(r"$z$ (kpc)")
        ax.set_box_aspect([1, 1, 1])
        p3 = os.path.join(odir, f"predict-{tag}-test-3D.pdf")
        fig.savefig(p3, dpi=300, transparent=True)
        plt.close(fig)
        written.append(p3)

        if in_slice.any():
            fig, ax = plt.subplots(figsize=(6, 6))
            im = ax.scatter(xtest[in_slice, 0], xtest[in_slice, 1], c=vals[in_slice])
            cbar = fig.colorbar(im)
            cbar.set_label(label)
            ax.set_xlabel(r"$x$ (kpc)")
            ax.set_ylabel(r"$y$ (kpc)")
            ax.set_aspect("equal")
            fig.tight_layout()
            p2 = os.path.join(odir, f"predict-{tag}-test-2D.pdf")
            fig.savefig(p2, dpi=300, transparent=True)
            plt.close(fig)
            written.append(p2)
    return written


def plot_error_boxes(error_df, error_types=None, path=None):
    """Per-model boxplots of test-error statistics (parity:
    `ziggy/misc/experiment_util.py` make_error_plots, sans seaborn)."""
    import pandas as pd

    if error_types is None:
        error_types = [c for c in ("f mse", "f mae", "f loglike", "f chisq",
                                   "e mse", "e mae", "e loglike", "e chisq")
                       if c in error_df.columns and error_df[c].notna().any()]
    models = list(error_df["model"].unique())
    fig, axes = plt.subplots(1, len(error_types),
                             figsize=(4 * len(error_types), 4), squeeze=False)
    for ax, et in zip(axes[0], error_types):
        data = [error_df.loc[error_df["model"] == m, et].dropna().values
                for m in models]
        ax.boxplot(data, tick_labels=models, showfliers=False)
        ax.set_title(et)
        ax.tick_params(axis="x", rotation=30)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig
