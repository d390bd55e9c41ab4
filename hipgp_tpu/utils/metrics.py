"""Prediction-quality metrics: error dataframes, noise-reduction summary,
z-score coverage tables, QQ data.

Parity reference: `ziggy/misc/experiment_util.py:236-372, 670-737` — rebuilt
as pure functions over in-memory prediction dicts (the reference reads
torch pickles off disk); thin IO wrappers in `utils.checkpoint` persist the
same content.

A "prediction dict" carries (subsets of) keys:
  ftest, fmu_test, fsig_test   — latent-field truth / posterior at test pts
  etest, emu_test, esig_test   — integrated-obs analogues
  fgrid, fmu_grid, fsig_grid   — grid evaluations
  (valid variants with _valid suffix)
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

__all__ = [
    "error_frame",
    "noise_comparison_frame",
    "coverage_table",
    "qq_data",
    "zscore_histogram_data",
]

_LN2PI = math.log(2.0 * math.pi)


def _norm_logpdf(y, loc, scale):
    return -0.5 * _LN2PI - np.log(scale) - 0.5 * ((y - loc) / scale) ** 2


def error_frame(
    predictions: Dict[str, Dict[str, np.ndarray]],
    data_type: str = "test",
) -> pd.DataFrame:
    """Per-point error statistics for one or more models.

    Args:
      predictions: {model_name: prediction dict}.
      data_type: 'test' | 'valid' | 'grid'.

    Columns per target t in {e, f}: 't mse', 't mae', 't loglike',
    't zscore', 't chisq' plus the raw truth/mu/sig columns and 'model'
    (matching `make_error_dataframe`, `experiment_util.py:309-372`).
    """
    suffix = data_type
    subs = [
        f"e{suffix}", f"emu_{suffix}", f"esig_{suffix}",
        f"f{suffix}", f"fmu_{suffix}", f"fsig_{suffix}",
    ]
    dfs = []
    for name, pdict in predictions.items():
        mdf = {}
        n = None
        for sub in subs:
            v = pdict.get(sub)
            if v is not None:
                v = np.asarray(v).reshape(-1)
                n = len(v)
            mdf[sub] = v
        if n is None:
            raise ValueError(f"model {name!r} has no {data_type} predictions")
        for sub in subs:
            if mdf[sub] is None:
                mdf[sub] = np.full(n, np.nan)
        mdf["model"] = name
        dfs.append(pd.DataFrame(mdf))
    df = pd.concat(dfs, axis=0, ignore_index=True)

    for t in ("e", "f"):
        truth = df[f"{t}{suffix}"]
        mu = df[f"{t}mu_{suffix}"]
        sig = df[f"{t}sig_{suffix}"]
        df[f"{t} mse"] = (truth - mu) ** 2
        df[f"{t} mae"] = np.abs(truth - mu)
        df[f"{t} loglike"] = _norm_logpdf(truth, mu, sig)
        df[f"{t} zscore"] = (truth - mu) / sig
        df[f"{t} chisq"] = df[f"{t} zscore"] ** 2
    return df


def noise_comparison_frame(
    pdict: Dict[str, np.ndarray],
    data_noise_std: float,
    integrated_obs: bool = False,
    train_elbo: Optional[float] = None,
    eval_valid: bool = False,
) -> pd.DataFrame:
    """Post-fit RMSE vs the raw observation noise — the headline
    noise-reduction summary (`experiment_util.py:236-301`).

    Rows: post-rmse, post-mae, data-noise, noise-reduction (%),
    rmse-to-std, loglike (+ valid variants).  Columns: fobs (and eobs when
    integrated observations are in play).
    """
    df = error_frame({"m": pdict}, data_type="test")

    def summary(t: str, dt: str = "test", frame=None):
        frame = df if frame is None else frame
        resid = frame[f"{t}{dt}"].values - frame[f"{t}mu_{dt}"].values
        post_rmse = float(np.sqrt(np.nanmean(resid**2)))
        out = {
            "post-rmse": post_rmse,
            "post-mae": float(np.nanmean(np.abs(resid))),
            "data-noise": data_noise_std,
            "noise-reduction": 100.0 * (data_noise_std - post_rmse) / data_noise_std,
            "rmse-to-std": post_rmse / data_noise_std,
            "loglike": float(np.nanmean(frame[f"{t} loglike"].values)),
        }
        return out

    fdict = summary("f")
    if train_elbo is not None:
        fdict["train_elbo"] = float(train_elbo)
    if eval_valid:
        dfv = error_frame({"m": pdict}, data_type="valid")
        v = summary("f", "valid", dfv)
        fdict["post-rmse-valid"] = v["post-rmse"]
        fdict["post-mae-valid"] = v["post-mae"]
        fdict["loglike-valid"] = v["loglike"]

    if integrated_obs:
        edict = summary("e")
        if train_elbo is not None:
            edict["train_elbo"] = float(train_elbo)
        return pd.DataFrame({"fobs": pd.Series(fdict), "eobs": pd.Series(edict)})
    return pd.DataFrame({"fobs": pd.Series(fdict)})


def coverage_table(
    zscores: Dict[str, np.ndarray],
    sigs: Sequence[float] = (0.5, 1.0, 2.0, 3.0),
) -> pd.DataFrame:
    """Fraction of |z| < s per model vs the standard-normal reference
    (`experiment_util.py:696-737`)."""
    from math import erf, sqrt

    table = {
        name: [float(np.nanmean(np.abs(z) < s)) for s in sigs]
        for name, z in zscores.items()
    }
    # P(|Z| < s) for Z ~ N(0,1), computed for the sigmas actually requested
    table["N(0,1)"] = [erf(s / sqrt(2.0)) for s in sigs]
    df = pd.DataFrame(table, index=list(sigs))
    df.index.name = "sigma"
    return df


def qq_data(zscores: np.ndarray):
    """(theoretical_quantiles, sorted_zscores) for a normal QQ plot
    (`experiment_util.py:375-414`)."""
    from scipy.stats import norm

    z = np.asarray(zscores).reshape(-1)
    z = z[~np.isnan(z)]
    pgrid = np.arange(1, len(z) + 1) / (len(z) + 1)
    return norm.ppf(pgrid), np.sort(z)


def zscore_histogram_data(zscores: np.ndarray, bins: int = 30):
    """(hist_density, bin_edges) vs N(0,1) (`experiment_util.py:670-693`)."""
    z = np.asarray(zscores).reshape(-1)
    z = z[~np.isnan(z)]
    return np.histogram(z, bins=bins, density=True)
