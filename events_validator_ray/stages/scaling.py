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

Null semantics: rows with a NULL group key or NULL value are EXCLUDED from
both the stats and the output (the SQL twin filters them symmetrically) —
without the filter, pandas groupby silently drops null-key rows from the
stats while factorize hands them code -1, gathering another group's
moments, and a NULL value round-trips through float64 NaN into INT64_MIN.

Magnitude contract: the int64 moment channel is exact only while the
per-batch Σx² and the per-row x·n fit in int64; both are guarded with a
clear error (pre-scale the column) instead of silent wraparound — the SQL
twin's BIGINT SUM promotes to HUGEINT, so a wrapped engine value would
diverge wholesale, not by rounding.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _valid_rows(t: pa.Table, col: str, key: str) -> pa.Table:
    mask = pc.and_(pc.is_valid(t[key]), pc.is_valid(t[col]))
    return t if pc.all(mask).as_py() in (True, None) else t.filter(mask)


def _stats_partials(col: str, key: str):
    def partial(t: pa.Table) -> pa.Table:
        t = _valid_rows(t, col, key)
        x = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x):
            xm = int(np.abs(x).max())
            # per-batch Σx² must fit int64 (the combine above is Python-int
            # exact; only the pandas batch sum can wrap)
            if xm * xm * len(x) >= 2**63:
                raise ValueError(
                    f"group_zscore: |{col}| up to {xm} overflows the exact "
                    "int64 sum-of-squares channel for this batch size — "
                    "pre-scale the column (e.g. to kilo-units) first"
                )
        df = pd.DataFrame({"k": t[key].to_numpy(zero_copy_only=False), "x": x})
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
    scaled to integer micro-units. Degenerate groups (zero variance) emit 0;
    NULL-key / NULL-value rows are excluded (see module docstring).

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
        t = _valid_rows(t, col, key)
        keys = t[key].to_numpy(zero_copy_only=False)
        x = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes, uniq = pd.factorize(pd.Series(keys))
        # per-UNIQUE-key dict lookups (group-cardinality-bounded), then a
        # vectorized gather back to rows
        n_u = np.array([stats[k][0] for k in uniq], dtype=np.int64)
        s1_u = np.array([stats[k][1] for k in uniq], dtype=np.int64)
        den_u = np.array([stats[k][2] for k in uniq], dtype=np.float64)
        if len(x):
            xm, nm = int(np.abs(x).max()), int(n_u.max())
            # x·n − Σx must stay exact int64 before the float conversion
            if xm * nm >= 2**62:
                raise ValueError(
                    f"group_zscore: |{col}|·group_n up to {xm}·{nm} overflows "
                    "the exact int64 numerator — pre-scale the column first"
                )
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
