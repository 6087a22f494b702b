"""Shared pandas/Arrow shims for the stateful streaming operators."""

from __future__ import annotations

import pandas as pd


def series_to_micros(s: pd.Series) -> pd.Series:
    """Timestamp series → int64 epoch microseconds.

    Normalize to ns BEFORE the int cast: pandas 2.x may hand the Arrow
    batch over as datetime64[us], and a bare astype("int64") on that dtype
    would be off by 1000× (the r9 funnel-twin bug class — fix it here,
    once, for every stateful twin)."""
    return pd.to_datetime(s).astype("datetime64[ns]").astype("int64") // 1000
