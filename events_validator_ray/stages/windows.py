"""Windowed aggregates over stream-shaped tables.

The reference is strictly request/response — no windows, watermarks or
cross-event state (SURVEY.md §2.9). This operator covers the stream-shaped
workloads a batch engine still meets (the `events` table): event-time
tumbling / session windows, expressed Dataset-first.

- Tumbling: window id = floor(epoch / size) computed in a vectorized
  map_batches, then an ordinary `groupby(key, window).aggregate(...)` —
  one hash shuffle of (key, window, partial) rows.
- Session: per-key gap-based segmentation needs ordered per-key state →
  `groupby(key)` + a vectorized multi-key pass (same bucketing pattern as
  stages/conversation.py).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window_agg(
    ds,
    key: str,
    ts_col: str,
    window_s: int,
    value_col: str | None = None,
):
    """Per (key, tumbling window) count and optional sum. Returns a Dataset
    with (key, window_start (epoch s), n, sum_value?)."""
    from ray.data.aggregate import Count, Sum

    def add_window(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t[ts_col], pa.int64())  # µs
        win = pc.multiply(
            pc.cast(pc.floor(pc.divide(epoch, float(window_s * 1_000_000))), pa.int64()),
            window_s,
        )
        cols = [key, "window_start"]
        out = pa.table({key: t[key], "window_start": win})
        if value_col:
            out = out.append_column(value_col, t[value_col])
        return out

    aggs = [Count(alias_name="n")]
    if value_col:
        aggs.append(Sum(value_col, alias_name="sum_value"))
    return (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby([key, "window_start"])
        .aggregate(*aggs)
    )


class _SessionizeBucket:
    """Vectorized multi-key sessionizer (one call = one hash bucket of keys)."""

    def __init__(self, key: str, ts_col: str, gap_s: int):
        self.key = key
        self.ts_col = ts_col
        self.gap_s = gap_s
        self.__name__ = type(self).__name__

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([self.key, self.ts_col], kind="stable").reset_index(drop=True)
        ts = pd.to_datetime(df[self.ts_col]).astype("int64")
        if str(pd.to_datetime(df[self.ts_col]).dtype).startswith("datetime64[ns"):
            ts = ts // 1000
        new_key = df[self.key] != df[self.key].shift(1)
        gap = (ts - ts.shift(1)) > self.gap_s * 1_000_000
        session = (new_key | gap).cumsum()
        out = (
            pd.DataFrame({self.key: df[self.key], "_s": session, "_ts": ts})
            .groupby([self.key, "_s"], sort=False)
            .agg(session_start=("_ts", "min"), session_end=("_ts", "max"), n=("_ts", "size"))
            .reset_index()
            .drop(columns="_s")
        )
        return out


def session_window_agg(ds, key: str, ts_col: str, gap_s: int, num_buckets: int = 64):
    """Gap-based session windows per key: (key, session_start µs,
    session_end µs, n). Hash-bucketed so one task sessionizes many keys
    vectorized."""
    from .conversation import _with_bucket

    projected = ds.select_columns([key, ts_col])
    return (
        _with_bucket(projected, num_buckets, cols=(key,))
        .groupby("bucket")
        .map_groups(_SessionizeBucket(key, ts_col, gap_s), batch_format="pandas")
    )
