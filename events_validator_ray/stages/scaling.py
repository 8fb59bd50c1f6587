"""Feature scaling for training-data pipelines: per-group z-score
standardization of a numeric column.

Scale shape: one map-side partial-stats pass (per-batch (group, n, sum,
sum-of-squares) rows — at most groups rows per block), a driver combine
bounded by GROUP CARDINALITY (sources/domains — never corpus rows; same
bound class as the report plane's per-day tables), then a broadcast of the
tiny stats dict and a map-only standardize pass. No shuffle anywhere.

Exactness contract (the DuckDB-twin channel): all moments are exact int64
(n, Σx, Σx²); z_micro = floor(float(x·n − Σx) · 1e6 / floor(sqrt(float(V))))
with V = n·Σx² − (Σx)², evaluated in the SAME operand order on both
engines — every step is an IEEE-754 correctly-rounded op on identical
inputs, so the comparison is bit-exact with no rounding channel.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _stats_partials(col: str, key: str):
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "k": t[key].to_numpy(zero_copy_only=False),
                "x": t[col].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        out = (
            df.assign(xx=df["x"] * df["x"])
            .groupby("k", sort=False)
            .agg(n=("x", "size"), s1=("x", "sum"), s2=("xx", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return partial


def group_zscore(ds, col: str, key: str, id_col: str = "doc_id"):
    """(id, key, z_micro) — per-`key`-group population z-score of `col`,
    scaled to integer micro-units. Degenerate groups (zero variance) emit 0.

    Two passes over the input (stats, then standardize): at 100 TB the
    stats pass is a narrow 2-column projection and the partial rows shrink
    to groups x blocks before the driver combine."""
    partials = (
        ds.select_columns([key, col])
        .map_batches(_stats_partials(col, key), batch_format="pyarrow")
        .take_all()
    )
    agg: dict[str, list[int]] = {}
    for r in partials:
        e = agg.setdefault(r["k"], [0, 0, 0])
        e[0] += int(r["n"])
        e[1] += int(r["s1"])
        e[2] += int(r["s2"])
    # (n, s1, denom): denom = floor(sqrt(float(V))) exactly as DuckDB's
    # floor(sqrt(CAST(V AS DOUBLE))) — int->double and sqrt are both
    # IEEE-correctly-rounded, so the two engines agree bit-for-bit
    stats = {
        k: (n, s1, math.floor(math.sqrt(float(n * s2 - s1 * s1))))
        for k, (n, s1, s2) in agg.items()
    }

    def standardize(t: pa.Table) -> pa.Table:
        keys = t[key].to_numpy(zero_copy_only=False)
        x = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes, uniq = pd.factorize(pd.Series(keys))
        # per-UNIQUE-key dict lookups (group-cardinality-bounded), then a
        # vectorized gather back to rows
        n_u = np.array([stats[k][0] for k in uniq], dtype=np.int64)
        s1_u = np.array([stats[k][1] for k in uniq], dtype=np.int64)
        den_u = np.array([stats[k][2] for k in uniq], dtype=np.float64)
        n, s1, den = n_u[codes], s1_u[codes], den_u[codes]
        num = (x * n - s1).astype(np.float64)
        z = np.where(den > 0, np.floor(num * 1000000.0 / np.where(den > 0, den, 1.0)), 0.0)
        return pa.table(
            {
                id_col: t[id_col],
                key: t[key],
                "z_micro": pa.array(z.astype(np.int64), pa.int64()),
            }
        )

    return ds.select_columns([id_col, key, col]).map_batches(
        standardize, batch_format="pyarrow"
    )
