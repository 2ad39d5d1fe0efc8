"""Per-series forecasting via ``applyInPandas`` (SURVEY §2.6 M5).

The reference collects 8 feature columns to the *driver* with
``toPandas()`` and scores a pickled SARIMAX there
(``Serving_layer/prediction.py:63-76``) — a hard scale ceiling (single
machine, ``maxResultSize=0``). Here forecasting is grouped-map: each series
(ticker/event_type) is handed to a pandas function on an executor, so 10k
series parallelize across the cluster and no collect happens.

The default model is a deterministic drift forecaster
(``pred = last + (last - first) / (n - 1)``) so tests and the DuckDB oracle
agree bit-for-bit; a SARIMAX/pmdarima backend drops into the same
``forecast_fn`` seam when available (import-gated, never required).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame

FORECAST_SCHEMA = (
    "series string, n_days bigint, first_close double, last_close double, pred_close double"
)


def drift_forecast(pdf: pd.DataFrame) -> pd.DataFrame:
    """1-step-ahead drift forecast for one series, ordered by day."""
    pdf = pdf.sort_values("day")
    close = pdf["close_v"].astype("float64")
    first, last = float(close.iloc[0]), float(close.iloc[-1])
    n = len(pdf)
    pred = last if n == 1 else last + (last - first) / (n - 1)
    return pd.DataFrame(
        {
            "series": [pdf["series"].iloc[0]],
            "n_days": [n],
            "first_close": [first],
            "last_close": [last],
            "pred_close": [pred],
        }
    )


HOLT_ALPHA = 0.5
HOLT_BETA = 0.5


def holt_forecast(pdf: pd.DataFrame) -> pd.DataFrame:
    """Holt linear-trend forecast (1-step) for one series, ordered by day —
    a REAL iterative state-space recursion through the grouped-map seam
    (unlike drift, each step depends on the previous smoothed state):

        l_0 = y_0, b_0 = y_1 - y_0
        l_t = α y_t + (1-α)(l_{t-1} + b_{t-1})
        b_t = β (l_t - l_{t-1}) + (1-β) b_{t-1}
        ŷ_{T+1} = l_T + b_T

    The float expressions are written in exactly the order the DuckDB
    oracle's ``list_reduce`` fold uses, so results are bit-identical
    cross-engine (sequential IEEE ops, no re-association)."""
    pdf = pdf.sort_values("day")
    ys = [float(v) for v in pdf["close_v"]]
    n = len(ys)
    if n == 1:
        pred = ys[0]
    else:
        level, trend = ys[0], ys[1] - ys[0]
        for y in ys[1:]:
            new_level = HOLT_ALPHA * y + (1.0 - HOLT_ALPHA) * (level + trend)
            trend = HOLT_BETA * (new_level - level) + (1.0 - HOLT_BETA) * trend
            level = new_level
        pred = level + trend
    return pd.DataFrame(
        {
            "series": [pdf["series"].iloc[0]],
            "n_days": [n],
            "first_close": [ys[0]],
            "last_close": [ys[-1]],
            "pred_close": [pred],
        }
    )


def sarimax_forecast_fn(model_path: str) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Optional pmdarima/SARIMAX backend with the reference's model shape
    (prediction.py:64-73: ``predict(n_periods=1, X=exog)``). Import-gated:
    raises ImportError at call time if pmdarima is absent."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import pickle

        with open(model_path, "rb") as fh:  # noqa: S301 - user-supplied model
            model = pickle.load(fh)
        pdf = pdf.sort_values("day")
        exog = pdf.drop(columns=["series", "day"]).tail(1)
        pred = float(model.predict(n_periods=1, X=exog)[0])
        close = pdf["close_v"].astype("float64")
        return pd.DataFrame(
            {
                "series": [pdf["series"].iloc[0]],
                "n_days": [len(pdf)],
                "first_close": [float(close.iloc[0])],
                "last_close": [float(close.iloc[-1])],
                "pred_close": [pred],
            }
        )

    return fn


def forecast_per_series(
    daily: DataFrame,
    forecast_fn: Callable[[pd.DataFrame], pd.DataFrame] = drift_forecast,
    schema: str = FORECAST_SCHEMA,
) -> DataFrame:
    """Grouped-map forecast: ``daily`` must have (series, day, close_v, ...).

    One shuffle on ``series``, then per-group pandas on executors — the
    distributed replacement for the reference's driver-side ``toPandas``.
    """
    return daily.groupBy("series").applyInPandas(forecast_fn, schema=schema)
