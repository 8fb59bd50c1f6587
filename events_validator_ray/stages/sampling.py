"""Deterministic sampling operators (training-data ops; the reference's cost
mitigation is "sample events upstream in GTM triggers", README.md:62-64 —
here sampling is a first-class, reproducible engine operator instead of a
client-side trigger setting).

Both operators are pure functions of the data (no RNG), so reruns, resumed
runs and the DuckDB oracle all select the identical rows:

- mod_sample: systematic 1-in-(m/k) sampling on an integer id column
  (`id % m < k`) — a map-only filter, zero shuffle.
- stratified_sample: first `n` rows per stratum under a deterministic total
  order — per-batch combiner (keep <= n per key per batch) bounds the
  shuffle to blocks x keys x n rows, then one groupby(key) finishes
  globally. SQL twin: ROW_NUMBER() OVER (PARTITION BY key ORDER BY ord) <= n.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def mod_sample(ds, id_col: str, modulus: int = 100, keep_below: int = 1):
    """Keep rows where `id_col % modulus < keep_below` (sampling rate
    keep_below/modulus). Deterministic, map-only, SQL-twinnable."""

    def flt(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = (
            pc.cast(t[id_col], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        )
        # fmod keeps the dividend's sign (C / SQL % semantics) — numpy's `%`
        # would keep -9 % 10 == 1 and silently diverge from the twin on
        # negative ids
        return t.filter(pa.array(np.fmod(ids, modulus) < keep_below))

    return ds.map_batches(flt, batch_format="pyarrow")


def stratified_sample(ds, key: str, order_col: str, n_per_key: int):
    """First `n_per_key` rows per `key` stratum ordered by `order_col`
    (which must be a deterministic total order within each stratum — a
    unique id). Balanced-per-class selection for training-data curation.

    Scale shape: the per-batch combiner already reduces each block to at
    most n rows per stratum it contains, so the single groupby(key) shuffle
    moves O(blocks x strata x n) rows — never the corpus."""

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values([key, order_col], kind="stable").groupby(key, sort=False).head(n_per_key)
        )

    combiner.__name__ = "stratified_combiner"

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values([key, order_col], kind="stable").groupby(key, sort=False).head(n_per_key)
        )

    finish.__name__ = "stratified_finish"
    return (
        ds.map_batches(combiner, batch_format="pandas")
        .groupby(key)
        .map_groups(finish, batch_format="pandas")
    )


def quantile_threshold_filter(ds, col: str, q: float):
    """Keep rows with `col` >= the EXACT q-quantile of the corpus (the
    "top-(1-q) by quality score" curation selector).

    Scale shape: one value-count groupby (shuffle bounded by the column's
    cardinality, never the corpus), a tiny driver cumsum to locate the
    quantile_disc threshold (same rank rule as DuckDB: element at rank
    ceil(q*n), 1-based), then a map-only filter — the corpus itself streams
    through a single pushed-down comparison."""
    import numpy as np

    from ray.data.aggregate import Count

    vc = ds.groupby(col).aggregate(Count(alias_name="n")).to_pandas()
    if len(vc):
        # quantile_disc ignores NULLs: drop the null/NaN group from the rank
        vc = vc[vc[col].notna()].sort_values(col).reset_index(drop=True)
    if not len(vc):
        # empty / all-null corpus: SQL's threshold is NULL -> zero rows kept
        return ds.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
    counts = vc["n"].to_numpy()
    cum = np.cumsum(counts)
    total = int(cum[-1])
    rank = max(1, int(np.ceil(q * total)))
    thr = vc[col].iloc[int(np.searchsorted(cum, rank))]
    if isinstance(thr, (int, np.integer)):
        return ds.filter(expr=f"{col} >= {int(thr)}")  # pushdown-friendly
    if isinstance(thr, (float, np.floating)):
        return ds.filter(expr=f"{col} >= {float(thr)!r}")
    # non-numeric thresholds: typed Arrow comparison (no expr-quoting hazards)
    thr_scalar = pa.scalar(thr)

    def flt(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t[col], thr_scalar))

    return ds.map_batches(flt, batch_format="pyarrow")


def grouped_quantiles(ds, key: str, col: str, qs=(0.5, 0.9, 0.99)):
    """EXACT per-group quantiles (quantile_disc rank rule) — per-segment
    distribution stats (e.g. price quantiles per priority class, turn-count
    quantiles per role).

    Scale shape: ONE groupby((key, col)) value-count shuffle (bounded by the
    joint cardinality, never the corpus), then a per-key vectorized rank walk
    inside map_groups. Returns a Dataset (key, q_permille, value)."""
    import numpy as np

    from ray.data.aggregate import Count

    vc = ds.select_columns([key, col]).groupby([key, col]).aggregate(Count(alias_name="n"))

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        group_val = g[key].iloc[0]
        # quantile_disc ignores NULLs (same rule as quantile_threshold_filter)
        g = g[g[col].notna()].sort_values(col, kind="stable")
        if not len(g):
            # all-null group: SQL's quantile is NULL
            return pd.DataFrame(
                [
                    {key: group_val, "q_permille": int(round(q * 1000)), "value": None}
                    for q in qs
                ]
            )
        cum = np.cumsum(g["n"].to_numpy())
        total = int(cum[-1])
        vals = g[col].to_numpy()
        rows = []
        for q in qs:
            rank = max(1, int(np.ceil(q * total)))
            rows.append(
                {
                    key: group_val,
                    "q_permille": int(round(q * 1000)),
                    "value": vals[int(np.searchsorted(cum, rank))],
                }
            )
        return pd.DataFrame(rows)

    per_key.__name__ = "grouped_quantiles"
    return vc.groupby(key).map_groups(per_key, batch_format="pandas")
