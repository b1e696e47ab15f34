"""W6-W8 phenology operators: numpy kernels + Spark applyInPandas round trips."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from geo_epic_spark.operators import phenology as ph


# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------

def test_savgol_reproduces_polynomial_exactly():
    # Savitzky-Golay with polyorder p must be exact on degree-<=p polynomials,
    # including the edge (polynomial-interp) region.
    x = np.arange(50, dtype=float)
    y = 0.5 * x * x - 3.0 * x + 7.0
    sm = ph.savgol_filter(y, window_length=7, polyorder=2)
    np.testing.assert_allclose(sm, y, atol=1e-8)


def test_savgol_coeffs_symmetric_and_normalized():
    w = ph.savgol_coeffs(7, 2)
    assert abs(w.sum() - 1.0) < 1e-12
    np.testing.assert_allclose(w, w[::-1], atol=1e-12)


def test_gaussian_filter_preserves_constant_and_smooths():
    y = np.full(30, 4.2)
    np.testing.assert_allclose(ph.gaussian_filter1d(y, 2.0), y, atol=1e-12)
    rng = np.random.default_rng(0)
    noisy = np.sin(np.linspace(0, 6, 200)) + rng.normal(0, 0.3, 200)
    sm = ph.gaussian_filter1d(noisy, 3.0)
    assert len(sm) == len(noisy)
    assert np.var(np.diff(sm)) < np.var(np.diff(noisy))


def test_find_peaks_height_distance_plateau():
    y = np.array([0, 2, 0, 3, 3, 3, 0, 5, 0, 1, 0], dtype=float)
    # plateau at idx 3..5 -> midpoint 4
    p = ph.find_peaks(y)
    assert p.tolist() == [1, 4, 7, 9]
    p = ph.find_peaks(y, height=2.5)
    assert p.tolist() == [4, 7]
    # distance pruning keeps the higher peak (idx 7, val 5)
    p = ph.find_peaks(y, distance=4)
    assert 7 in p.tolist() and 4 not in p.tolist()


def test_double_logistic_fit_recovers_curve():
    doy = np.arange(1, 366, 8, dtype=float)
    true = np.array([6.0, 0.08, 140.0, 0.09, 260.0])
    y = ph.double_logistic(doy, *true)
    p = ph.fit_double_logistic_np(doy, y)
    pred = ph.double_logistic(doy, *p)
    rmse = np.sqrt(np.mean((pred - y) ** 2))
    assert rmse < 0.05
    em, hv = ph.phenology_dates(p)
    # emergence near green-up onset, harvest near senescence end
    assert 80 < em < 140
    assert 260 < hv < 330


def test_harmonic_fit_exact_on_harmonic_data():
    x = np.arange(0, 365, 5, dtype=float)
    w = 2 * np.pi / 365
    y = 2.0 + 0.01 * x + 0.5 * np.sin(w * x) + 1.5 * np.cos(2 * w * x)
    coef = ph.fit_harmonic_np(x, y)
    np.testing.assert_allclose(coef[0], 2.0, atol=1e-6)
    np.testing.assert_allclose(coef[1], 0.01, atol=1e-8)
    np.testing.assert_allclose(coef[3], 0.5, atol=1e-6)   # sin w
    np.testing.assert_allclose(coef[6], 1.5, atol=1e-6)   # cos 2w


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def _series_pdf(n_sites=3, n=60):
    rows = []
    for s in range(n_sites):
        doy = np.arange(1, 1 + n * 6, 6, dtype=float)
        y = ph.double_logistic(doy, 5.0 + s, 0.08, 130 + 10 * s, 0.1, 250)
        for d, v in zip(doy, y):
            rows.append((s, int(d), float(v)))
    return pd.DataFrame(rows, columns=["site_id", "doy", "ndvi"])


def test_smooth_series_matches_numpy(spark):
    pdf = _series_pdf()
    df = spark.createDataFrame(pdf)
    out = ph.smooth_series(df, "ndvi", by="site_id", order="doy",
                           window_length=7, polyorder=2).toPandas()
    for s, grp in out.groupby("site_id"):
        grp = grp.sort_values("doy")
        want = ph.savgol_filter(grp["ndvi"].to_numpy(), 7, 2)
        np.testing.assert_allclose(grp["ndvi_smoothed"].to_numpy(), want, atol=1e-9)


def test_count_seasons_two_season_sine(spark):
    # two clear peaks per series
    rows = []
    for s in range(2):
        t = np.arange(120)
        y = np.sin(2 * np.pi * t / 60.0) + 1.5
        rows += [(s, int(i), float(v)) for i, v in enumerate(y)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["site_id", "doy", "ndvi"]))
    out = ph.count_seasons(df, "ndvi", by="site_id", order="doy").toPandas()
    assert sorted(out["n_seasons"].tolist()) == [2, 2]


def test_fit_double_logistic_spark(spark):
    df = spark.createDataFrame(_series_pdf(n_sites=2))
    out = ph.fit_double_logistic(df, "ndvi", by="site_id", doy="doy").toPandas()
    assert len(out) == 2
    assert (out["rmse"] < 0.1).all()
    assert (out["emergence_doy"] > 0).all()
    assert (out["harvest_doy"] > out["emergence_doy"]).all()


def test_fit_harmonic_spark(spark):
    df = spark.createDataFrame(_series_pdf(n_sites=2))
    out = ph.fit_harmonic(df, "ndvi", by="site_id", doy="doy").toPandas()
    assert len(out) == 2
    assert set(out.columns) >= {"c1", "c9", "n_seasons"}


def test_asym_gaussian_fit_recovers_curve():
    x = np.arange(1, 366, 8, dtype=float)
    true = (3.0, 190.0, 40.0, 1.5)
    y = ph.asym_gaussian(x, *true)
    p = ph.fit_asym_gaussian_np(x, y)
    np.testing.assert_allclose(p, true, atol=1e-4)
    em, hv = ph.asym_gaussian_dates(p)
    assert 0 < em < hv < 365


def test_asym_gaussian_dates_symmetric_fallback():
    # alpha=0 reduces to a plain Gaussian: d2 maxima at center±sqrt(3)*sigma,
    # single d2 minimum at the center (reference get_dates semantics)
    em, hv = ph.asym_gaussian_dates(np.array([2.0, 220.0, 55.0, 0.0]))
    assert abs(em - (220 - math.sqrt(3) * 55)) <= 2
    assert abs(hv - 220) <= 1


def test_fit_asym_gaussian_spark(spark):
    rows = []
    for s in range(3):
        amp, ctr, sg, al = 2.0 + s, 160.0 + 20 * s, 30.0 + 5 * s, 1.0
        x = np.arange(1, 366, 8, dtype=float)
        y = ph.asym_gaussian(x, amp, ctr, sg, al)
        rows += [(s, float(d), float(v)) for d, v in zip(x, y)]
    df = spark.createDataFrame(rows, "site_id long, doy double, ndvi double")
    out = ph.fit_asym_gaussian(df, "ndvi").toPandas().sort_values("site_id")
    np.testing.assert_allclose(out["amplitude"], [2.0, 3.0, 4.0], atol=1e-3)
    np.testing.assert_allclose(out["center"], [160.0, 180.0, 200.0], atol=0.1)
    assert (out["rmse"] < 1e-4).all()
    assert (out["emergence_doy"] < out["harvest_doy"]).all()
