"""Phenology / per-series curve operators (SURVEY §2.5 W6-W8).

Re-expresses the reference's per-field vegetation-index pipelines —
Savitzky-Golay / Gaussian smoothing (`geoEpic/phenocrop/smooth.py:5-81`),
season counting via peak detection (`geoEpic/phenocrop/detect_season.py:6-41`),
and double-logistic / harmonic curve fitting with phenology-date extraction
(`geoEpic/opc/DoubleLogisticCurve.py:7-120`) — as grouped ``applyInPandas``
operators: one Arrow batch per site/field series, numpy-vectorized inside.

scipy is not available in this environment, so the numeric kernels
(savgol coefficients, gaussian kernel, find_peaks with height+distance,
bounded least squares) are implemented here in pure numpy with
scipy-compatible semantics (tested: savgol reproduces polynomials of degree
<= polyorder exactly; find_peaks matches scipy's plateau-midpoint and
highest-first distance pruning).

Scale shape: ``groupBy(site).applyInPandas`` is one shuffle on the series
key; each task fits/filters thousands of independent series with no
cross-series state, so the stage scales linearly with executors. At 10^12
rows the shuffle is the cost — the series key should be the table's
partition/bucket column so the shuffle collapses to a local sort.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)


# ---------------------------------------------------------------------------
# numpy kernels (scipy-compatible)
# ---------------------------------------------------------------------------

def savgol_coeffs(window_length: int, polyorder: int) -> np.ndarray:
    """Savitzky-Golay filter weights for the window center: the first row of
    the least-squares polynomial-fit hat matrix over positions
    [-m..m]. Convolving with these reproduces any polynomial of degree
    <= polyorder exactly."""
    if window_length % 2 == 0 or window_length <= 0:
        raise ValueError("window_length must be a positive odd integer")
    if polyorder >= window_length:
        raise ValueError("polyorder must be less than window_length")
    m = window_length // 2
    pos = np.arange(-m, m + 1, dtype=np.float64)
    # Vandermonde A[i,j] = pos[i]**j ; weights = e0^T (A^T A)^-1 A^T
    a = np.vander(pos, polyorder + 1, increasing=True)
    # solve (A^T A) x = e0 then weights = A x
    ata = a.T @ a
    e0 = np.zeros(polyorder + 1)
    e0[0] = 1.0
    x = np.linalg.solve(ata, e0)
    return a @ x


def savgol_filter(y: np.ndarray, window_length: int, polyorder: int) -> np.ndarray:
    """scipy.signal.savgol_filter(mode='interp') semantics: convolution in
    the interior, polynomial fit to the first/last window at the edges."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n < window_length:
        raise ValueError("series shorter than window_length")
    w = savgol_coeffs(window_length, polyorder)
    m = window_length // 2
    out = np.convolve(y, w[::-1], mode="same")
    # edges: fit a polynomial to the first/last window_length samples and
    # evaluate it at the edge positions (scipy 'interp' mode)
    pos = np.arange(window_length, dtype=np.float64)
    head = np.polynomial.polynomial.polyfit(pos, y[:window_length], polyorder)
    out[:m] = np.polynomial.polynomial.polyval(pos[:m], head)
    tail = np.polynomial.polynomial.polyfit(pos, y[-window_length:], polyorder)
    out[-m:] = np.polynomial.polynomial.polyval(pos[-m:], tail)
    return out


def gaussian_filter1d(y: np.ndarray, sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage.gaussian_filter1d semantics: normalized gaussian kernel
    of radius int(truncate*sigma + 0.5), 'reflect' (symmetric) padding."""
    y = np.asarray(y, dtype=np.float64)
    r = int(truncate * float(sigma) + 0.5)
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    pad = np.concatenate([y[:r][::-1], y, y[-r:][::-1]]) if r else y
    return np.convolve(pad, k[::-1], mode="valid")


def find_peaks(
    y: np.ndarray,
    height: float | None = None,
    distance: int | None = None,
) -> np.ndarray:
    """scipy.signal.find_peaks subset (height, distance): local maxima with
    plateau-midpoint placement; distance pruning keeps higher peaks first."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    peaks: list[int] = []
    i = 1
    while i < n - 1:
        if y[i - 1] < y[i]:
            # scan plateau
            j = i
            while j < n - 1 and y[j + 1] == y[i]:
                j += 1
            if j < n - 1 and y[j + 1] < y[i]:
                peaks.append((i + j) // 2)
            i = j + 1
        else:
            i += 1
    p = np.array(peaks, dtype=np.int64)
    if height is not None and len(p):
        p = p[y[p] >= height]
    if distance is not None and len(p):
        keep = np.ones(len(p), dtype=bool)
        # highest first; ties by leftmost (scipy uses argsort order reversed)
        order = np.argsort(y[p], kind="stable")[::-1]
        for oi in order:
            if not keep[oi]:
                continue
            close = np.abs(p - p[oi]) < distance
            close[oi] = False
            keep &= ~close
        p = p[keep]
    return np.sort(p)


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def double_logistic(x: np.ndarray, c, k1, x01, k2, x02) -> np.ndarray:
    """c * (sigmoid(k1*(x-x01)) - sigmoid(k2*(x-x02))) — the reference's
    green-up/senescence model (`opc/DoubleLogisticCurve.py:13-15`)."""
    return c * (_sigmoid(k1 * (x - x01)) - _sigmoid(k2 * (x - x02)))


_DL_INIT = np.array([5.5, 0.12, 150.0, 0.12, 250.0])
_DL_LO = np.array([3.0, 0.01, 0.0, 0.01, 50.0])
_DL_HI = np.array([8.5, 0.12, 250.0, 0.15, 365.0])


def fit_double_logistic_np(x: np.ndarray, y: np.ndarray,
                           n_iter: int = 60) -> np.ndarray:
    """Bounded Gauss-Newton (Levenberg damped) fit of the double-logistic,
    with the reference's 5x penalty on under-estimation residuals
    (`opc/DoubleLogisticCurve.py:34-48`). Deterministic: fixed init, fixed
    iteration budget, numeric jacobian."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    p = _DL_INIT.copy()

    def resid(p):
        r = double_logistic(x, *p) - y
        r = np.where(r < 0, r * 5.0, r)
        return r

    lam = 1e-3
    r = resid(p)
    cost = float(r @ r)
    for _ in range(n_iter):
        # numeric jacobian
        jac = np.empty((len(x), 5))
        for j in range(5):
            dp = np.zeros(5)
            dp[j] = max(1e-6, 1e-6 * abs(p[j]))
            jac[:, j] = (resid(p + dp) - r) / dp[j]
        g = jac.T @ r
        h = jac.T @ jac
        try:
            step = np.linalg.solve(h + lam * np.diag(np.diag(h) + 1e-12), -g)
        except np.linalg.LinAlgError:
            break
        p_new = np.clip(p + step, _DL_LO, _DL_HI)
        r_new = resid(p_new)
        cost_new = float(r_new @ r_new)
        if cost_new < cost:
            p, r, cost = p_new, r_new, cost_new
            lam = max(lam * 0.5, 1e-9)
            if abs(step).max() < 1e-9:
                break
        else:
            lam *= 4.0
            if lam > 1e9:
                break
    return p


def phenology_dates(p: np.ndarray) -> tuple[int, int]:
    """Emergence/harvest DOY from the fitted curve: first peak of the third
    derivative and last peak of its negation (`opc/DoubleLogisticCurve.py:55-66`).
    Uses the closed-form third derivative of the logistic,
    s''' = k^3 s(1-s)(1-6s+6s^2), applied to both terms."""
    doy = np.arange(0, 365, dtype=np.float64)
    c, k1, x01, k2, x02 = p

    def s3(k, x0):
        s = _sigmoid(k * (doy - x0))
        return (k ** 3) * s * (1 - s) * (1 - 6 * s + 6 * s * s)

    d3 = c * (s3(k1, x01) - s3(k2, x02))
    up = find_peaks(d3, height=0.0)
    dn = find_peaks(-d3, height=0.0)
    emergence = int(up[0]) if len(up) else -1
    harvest = int(dn[-1]) if len(dn) else -1
    return emergence, harvest


_ERF = np.vectorize(math.erf, otypes=[np.float64])
_SQRT2PI = math.sqrt(2.0 * math.pi)


def asym_gaussian(x: np.ndarray, amplitude, center, sigma, alpha) -> np.ndarray:
    """Skew-normal shape A * phi(z) * Phi(alpha*z), z = (x-center)/sigma —
    the reference's asymmetric-Gaussian vegetation model
    (`opc/AssymetricGaussian.py:11-14`). phi/Phi are the standard normal
    pdf/cdf, built here from libm erf (scipy-free)."""
    z = (np.asarray(x, dtype=np.float64) - center) / sigma
    pdf = np.exp(-0.5 * z * z) / _SQRT2PI
    cdf = 0.5 * (1.0 + _ERF(alpha * z / math.sqrt(2.0)))
    return amplitude * pdf * cdf


_AG_INIT = np.array([1.0, 180.0, 30.0, 0.0])
_AG_LO = np.array([0.0, 0.0, 1e-6, -5.0])
_AG_HI = np.array([10.0, 365.0, 100.0, 5.0])


def fit_asym_gaussian_np(x: np.ndarray, y: np.ndarray, n_iter: int = 80,
                         f_scale: float = 0.5) -> np.ndarray:
    """Bounded Gauss-Newton fit of the asymmetric Gaussian with a Cauchy
    robust loss (IRLS weights 1/(1+(r/f)^2)), mirroring the reference's
    least_squares(loss='cauchy', f_scale=0.5) call
    (`opc/AssymetricGaussian.py:36-41`). Deterministic multi-start: the
    reference's init (1, 180, 30, 0) plus data-driven alpha/center variants
    (the single flat-alpha start stalls in a symmetric local optimum for
    some skewed series); lowest final robust cost wins."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    peak_x = float(x[int(np.argmax(y))]) if len(x) else 180.0
    amp0 = max(float(np.max(y)) * _SQRT2PI, 0.1) if len(x) else 1.0
    inits = [
        _AG_INIT.copy(),
        np.array([amp0, peak_x, 30.0, 1.0]),
        np.array([amp0, peak_x, 30.0, -1.0]),
    ]
    best = None
    for p0 in inits:
        p, c = _fit_asym_gaussian_single(x, y, p0, n_iter, f_scale)
        if best is None or c < best[1]:
            best = (p, c)
    return best[0]


def _fit_asym_gaussian_single(
    x: np.ndarray, y: np.ndarray, p0: np.ndarray, n_iter: int, f_scale: float
) -> tuple[np.ndarray, float]:
    p = np.clip(p0.astype(np.float64), _AG_LO, _AG_HI)

    def resid(p):
        return asym_gaussian(x, *p) - y

    def cost(r):
        # cauchy rho: f^2 * log(1 + (r/f)^2)
        return float(np.sum(f_scale ** 2 * np.log1p((r / f_scale) ** 2)))

    lam = 1e-3
    r = resid(p)
    c = cost(r)
    for _ in range(n_iter):
        wgt = 1.0 / (1.0 + (r / f_scale) ** 2)  # IRLS cauchy weights
        jac = np.empty((len(x), 4))
        for j in range(4):
            dp = np.zeros(4)
            dp[j] = max(1e-6, 1e-6 * abs(p[j]))
            jac[:, j] = (resid(p + dp) - r) / dp[j]
        jw = jac * wgt[:, None]
        g = jw.T @ r
        h = jw.T @ jac
        try:
            step = np.linalg.solve(h + lam * np.diag(np.diag(h) + 1e-12), -g)
        except np.linalg.LinAlgError:
            break
        p_new = np.clip(p + step, _AG_LO, _AG_HI)
        r_new = resid(p_new)
        c_new = cost(r_new)
        if c_new < c:
            p, r, c = p_new, r_new, c_new
            lam = max(lam * 0.5, 1e-9)
            if abs(step).max() < 1e-10:
                break
        else:
            lam *= 4.0
            if lam > 1e9:
                break
    return p, c


def asym_gaussian_dates(p: np.ndarray) -> tuple[int, int]:
    """Emergence/harvest DOY: first peak / last valley of the second
    derivative over DOY 0..364, with the reference's center±sigma fallback
    (`opc/AssymetricGaussian.py:46-62`). The second derivative is evaluated
    numerically (central differences on a 0.5-day grid) from the closed-form
    model — the reference's hand-derived n=2 formula drops an alpha^3 term,
    so matching it symbolically would reproduce the slip, not the curve."""
    amplitude, center, sigma, alpha = p
    doy = np.arange(0, 365, dtype=np.float64)
    hgrid = 0.5
    fine = np.arange(-1.0, 366.0, hgrid)
    f = asym_gaussian(fine, *p)
    d2 = (f[2:] - 2.0 * f[1:-1] + f[:-2]) / (hgrid * hgrid)
    # sample the 2nd derivative at integer DOYs (fine[1:-1] = -0.5..365.5)
    at_doy = d2[np.searchsorted(fine[1:-1], doy)]
    peaks = find_peaks(at_doy)
    valleys = find_peaks(-at_doy)
    if len(peaks) and len(valleys):
        return int(peaks[0]), int(valleys[-1])
    return max(0, int(center - sigma)), min(364, int(center + sigma))


def fit_harmonic_np(x: np.ndarray, y: np.ndarray, order: int = 3) -> np.ndarray:
    """Harmonic regression (`opc/DoubleLogisticCurve.py:69-100` HarmonicCurve):
    linear in its 9 coefficients, so the exact solution is one lstsq —
    no iterative optimizer needed."""
    w = 2.0 * np.pi / 365.0
    cols = [np.ones_like(x), x, x * x]
    for h in range(1, order + 1):
        cols.append(np.sin(h * w * x))
        cols.append(np.cos(h * w * x))
    a = np.stack(cols, axis=1)
    coef, *_ = np.linalg.lstsq(a, y, rcond=None)
    return coef


# ---------------------------------------------------------------------------
# Spark operators (grouped applyInPandas)
# ---------------------------------------------------------------------------

def smooth_series(
    df: DataFrame,
    value: str,
    by: str = "site_id",
    order: str = "date",
    method: str = "savitsky",
    window_length: int = 7,
    polyorder: int = 2,
    sigma: float = 1.0,
) -> DataFrame:
    """W6: per-series smoothing. Output = input columns + ``<value>_smoothed``.

    Grouped pandas UDF: each group is one site's series, sorted by ``order``
    inside the batch (cheap: groups are small relative to partitions)."""
    out_schema = StructType(df.schema.fields + [
        StructField(f"{value}_smoothed", DoubleType()),
    ])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        y = pdf[value].to_numpy(dtype=np.float64)
        if method == "savitsky":
            if len(y) < window_length:
                sm = y.astype(np.float64)
            else:
                sm = savgol_filter(y, window_length, polyorder)
        elif method == "symm_gaussian":
            sm = gaussian_filter1d(y, sigma)
        else:
            raise ValueError(f"method {method!r} not supported")
        pdf[f"{value}_smoothed"] = sm
        return pdf

    return df.groupBy(by).applyInPandas(fn, schema=out_schema)


def count_seasons(
    df: DataFrame,
    value: str,
    by: str = "site_id",
    order: str = "date",
) -> DataFrame:
    """W7: seasons per series = significant peaks — height >= 75th percentile,
    min separation ceil(n/4) (`phenocrop/detect_season.py:33-41`).
    Output: (by, n_seasons, peak_idx array as csv string)."""
    out_schema = StructType([
        df.schema[by],
        StructField("n_seasons", IntegerType()),
        StructField("peak_pos", StringType()),
    ])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        y = pdf[value].dropna().to_numpy(dtype=np.float64)
        if len(y) == 0:
            return pd.DataFrame({by: [pdf[by].iloc[0]], "n_seasons": [0],
                                 "peak_pos": [""]})
        h = float(np.nanquantile(y, 0.75))
        d = math.ceil(len(y) / 4)
        p = find_peaks(y, height=h, distance=d)
        return pd.DataFrame({
            by: [pdf[by].iloc[0]],
            "n_seasons": [int(len(p))],
            "peak_pos": [",".join(map(str, p.tolist()))],
        })

    return df.groupBy(by).applyInPandas(fn, schema=out_schema)


def fit_double_logistic(
    df: DataFrame,
    value: str,
    by: str = "site_id",
    doy: str = "doy",
) -> DataFrame:
    """W8: per-series double-logistic fit + phenology dates.
    Output: (by, c, k1, x01, k2, x02, rmse, emergence_doy, harvest_doy)."""
    out_schema = StructType([
        df.schema[by],
        StructField("c", DoubleType()), StructField("k1", DoubleType()),
        StructField("x01", DoubleType()), StructField("k2", DoubleType()),
        StructField("x02", DoubleType()), StructField("rmse", DoubleType()),
        StructField("emergence_doy", LongType()),
        StructField("harvest_doy", LongType()),
    ])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[doy].to_numpy(dtype=np.float64)
        y = pdf[value].to_numpy(dtype=np.float64)
        p = fit_double_logistic_np(x, y)
        pred = double_logistic(x, *p)
        rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
        em, hv = phenology_dates(p)
        return pd.DataFrame({
            by: [pdf[by].iloc[0]],
            "c": [p[0]], "k1": [p[1]], "x01": [p[2]], "k2": [p[3]],
            "x02": [p[4]], "rmse": [rmse],
            "emergence_doy": [em], "harvest_doy": [hv],
        })

    return df.groupBy(by).applyInPandas(fn, schema=out_schema)


def fit_asym_gaussian(
    df: DataFrame,
    value: str,
    by: str = "site_id",
    doy: str = "doy",
) -> DataFrame:
    """W8c: per-series asymmetric-Gaussian fit + phenology dates
    (`opc/AssymetricGaussian.py:6-62` parity; same applyInPandas shape as
    the double-logistic sibling).
    Output: (by, amplitude, center, sigma, alpha, rmse, emergence_doy,
    harvest_doy)."""
    out_schema = StructType([
        df.schema[by],
        StructField("amplitude", DoubleType()), StructField("center", DoubleType()),
        StructField("sigma", DoubleType()), StructField("alpha", DoubleType()),
        StructField("rmse", DoubleType()),
        StructField("emergence_doy", LongType()),
        StructField("harvest_doy", LongType()),
    ])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[doy].to_numpy(dtype=np.float64)
        y = pdf[value].to_numpy(dtype=np.float64)
        p = fit_asym_gaussian_np(x, y)
        pred = asym_gaussian(x, *p)
        rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
        em, hv = asym_gaussian_dates(p)
        return pd.DataFrame({
            by: [pdf[by].iloc[0]],
            "amplitude": [p[0]], "center": [p[1]], "sigma": [p[2]],
            "alpha": [p[3]], "rmse": [rmse],
            "emergence_doy": [em], "harvest_doy": [hv],
        })

    return df.groupBy(by).applyInPandas(fn, schema=out_schema)


def fit_harmonic(
    df: DataFrame,
    value: str,
    by: str = "site_id",
    doy: str = "doy",
) -> DataFrame:
    """W8b: per-series harmonic regression (3rd-order) + season count from
    fitted-curve peaks (`opc/DoubleLogisticCurve.py:103-120`).
    Output: (by, c1..c9, n_seasons)."""
    out_schema = StructType(
        [df.schema[by]]
        + [StructField(f"c{i}", DoubleType()) for i in range(1, 10)]
        + [StructField("n_seasons", IntegerType())]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[doy].to_numpy(dtype=np.float64)
        y = pdf[value].to_numpy(dtype=np.float64)
        coef = fit_harmonic_np(x, y)
        order = np.argsort(x, kind="mergesort")
        fitted = None
        w = 2.0 * np.pi / 365.0
        xs = x[order]
        cols = [np.ones_like(xs), xs, xs * xs]
        for h in range(1, 4):
            cols.append(np.sin(h * w * xs))
            cols.append(np.cos(h * w * xs))
        fitted = np.stack(cols, axis=1) @ coef
        n_seasons = int(len(find_peaks(fitted)))
        row = {by: [pdf[by].iloc[0]]}
        for i in range(9):
            row[f"c{i + 1}"] = [float(coef[i])]
        row["n_seasons"] = [n_seasons]
        return pd.DataFrame(row)

    return df.groupBy(by).applyInPandas(fn, schema=out_schema)
