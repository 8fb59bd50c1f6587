"""Reporting plane over the violations/log Dataset — the Ray Data analog of
the reference's Streamlit "Validation Report"
(streamlit_ev/app/validation_report.py:59-197).

The reference reads its BigQuery log table for a date range, filters, and
computes two aggregations (SURVEY.md §2.5 A2/A3):
- failures by day × dimension: group_by + len + sort (validation_report.py:110-116)
- daily error rate: 100 · n_unique(event_id | error) / n_unique(event_id)
  (validation_report.py:119-131)

Here the log is a Dataset (error + valid rows); `date_utc` is derived from the
`timestamp` column (the reference materializes it at log time,
loggingHelpers.js:17). Distinct counts are exact two-level groupbys (dedup to
(day, event_id) pairs, then count) — at 10^12 scale swap the inner dedup for
the HLL sketch in stages/sketches.py.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


#: sentinel for rows whose timestamp is NULL — a real string key keeps the
#: group joinable (SQL NULL keys don't equi-join; pandas/Ray group them
#: inconsistently)
NULL_DATE = "(null)"


def _with_date(ds):
    def add_date(t: pa.Table) -> pa.Table:
        d = pc.fill_null(pc.strftime(t["timestamp"], format="%Y-%m-%d"), NULL_DATE)
        return t.append_column("date_utc", d)

    return ds.map_batches(add_date, batch_format="pyarrow")


def failures_by_day(ds, dim: str = "field"):
    """Failures by day × dimension (default: the violated field; the reference
    uses event_name as its dimension, validation_report.py:110-116), sorted by
    day. Returns a Dataset with (date_utc, {dim}, n_failures)."""
    from ray.data.aggregate import Count

    return (
        _with_date(ds.filter(expr="status == 'error'"))
        .groupby(["date_utc", dim])
        .aggregate(Count(alias_name="n_failures"))
        .sort("date_utc")
    )


def daily_error_rate(ds, approx: bool = False, hll_p: int = 14):
    """Per-day total distinct events, distinct error events, and error rate %
    (validation_report.py:119-131). Returns (date_utc, n_events,
    n_error_events, error_rate) sorted by day.

    ``approx=True`` is the 10^12-turn path: per-batch mergeable HLL partials
    per (day, total|error) replace the two-level distinct groupby — the
    shuffle disappears entirely (one tiny partial row per block x day reaches
    the driver; relative error ~1.04/sqrt(2^hll_p), ~0.8% at p=14, asserted
    against the exact mode in tests/test_sketches.py)."""
    if approx:
        return _daily_error_rate_hll(ds, hll_p)
    import numpy as np

    from ..stages.sketches import hash64

    with_date = _with_date(ds).select_columns(["date_utc", "event_id", "status"])

    def batch_dedup(t: pa.Table) -> pa.Table:
        # pre-aggregate within the batch before the shuffle: one row per
        # (date, event_id) with its max is_error flag cuts the shuffle input
        # by ~the batch's duplication factor; the pair rides a single int64
        # hash bucket — groupby([date, event]) at distinct-event cardinality
        # is the documented sort-aggregate hazard (BASELINE.md)
        flags = pc.cast(pc.equal(t["status"], "error"), pa.int64())
        t2 = pa.table(
            {
                "date_utc": t["date_utc"],
                "event_id": t["event_id"],
                "is_error": flags,
            }
        )
        d = t2.group_by(["date_utc", "event_id"]).aggregate([("is_error", "max")])
        # bucket by event_id alone: every copy of a (date, event) pair shares
        # the bucket (sufficient for exact dedup), and the hash stays a cheap
        # vectorized pass over the id column — no per-row string building
        h = hash64(d["event_id"].to_numpy(zero_copy_only=False))
        return d.append_column(
            "_kb", pa.array((h % np.uint64(256)).astype(np.int64))
        )

    def pair_merge(g):
        import pandas as pd

        # exact global dedup (all copies of a pair share the bucket), then
        # per-bucket per-day partial counts — the final shuffle carries
        # buckets × days rows, never the event table
        d = (
            g.groupby(["date_utc", "event_id"], sort=False)["is_error_max"]
            .max()
            .reset_index()
        )
        out = (
            d.groupby("date_utc", sort=False)
            .agg(_n=("event_id", "size"), _e=("is_error_max", "sum"))
            .reset_index()
        )
        out["_n"] = out["_n"].astype("int64")
        out["_e"] = out["_e"].astype("int64")
        return out

    pair_merge.__name__ = "pair_dedup_day_partials"
    partials = (
        with_date.map_batches(batch_dedup, batch_format="pyarrow")
        .groupby("_kb")
        .map_groups(pair_merge, batch_format="pandas")
    )

    import pandas as pd

    # final day sum on the driver: the pull is ≤ buckets × days tiny rows
    # (the HLL path's bound class). A Ray groupby(date).aggregate here
    # measured 28.4s over 359k partial rows / 2136 day groups vs 0.25s for
    # this pull — the sort-aggregate cost, not data volume.
    pdf = partials.to_pandas()
    if pdf.empty:
        # the guard must run BEFORE the groupby: an empty/fully-filtered log
        # loses its columns at to_pandas (the documented Ray empty-Dataset
        # hazard) and pdf.groupby('date_utc') would KeyError
        return pd.DataFrame(
            {
                "date_utc": pd.Series([], dtype=object),
                "n_events": pd.Series([], dtype="int64"),
                "n_error_events": pd.Series([], dtype="int64"),
                "error_rate": pd.Series([], dtype="float64"),
            }
        )
    out = (
        pdf.groupby("date_utc", sort=False)[["_n", "_e"]]
        .sum()
        .reset_index()
        .rename(columns={"_n": "n_events", "_e": "n_error_events"})
    )
    out["n_error_events"] = out["n_error_events"].astype("int64")
    out["error_rate"] = (100.0 * out["n_error_events"] / out["n_events"]).round(6)
    return out.sort_values("date_utc").reset_index(drop=True)


def _daily_error_rate_hll(ds, hll_p: int):
    """HLL-sketched distinct rates: a map-only pass emits one serialized HLL
    partial per (block, day, which in {total, error}); the driver merges the
    partials (blocks x days x 2 tiny rows — never the data, never a shuffle).
    Same execution pattern as the sketch plane (stages/sketches.py)."""
    import pickle

    import numpy as np
    import pandas as pd

    from ..stages.sketches import HLL, hash64

    def partials(t: pa.Table) -> pa.Table:
        dates = t["date_utc"].to_numpy(zero_copy_only=False)
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        errs = pc.equal(t["status"], "error").to_numpy(zero_copy_only=False)
        h = hash64(ids).astype(np.uint64)
        uniq, inv = np.unique(dates, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
        out_d, out_w, out_p = [], [], []
        for k, d in enumerate(uniq):
            seg = order[bounds[k] : bounds[k + 1]]
            hll = HLL(hll_p)
            hll.add_hashes(h[seg])
            out_d.append(d)
            out_w.append("total")
            out_p.append(pickle.dumps(hll))
            seg_e = seg[errs[seg]]
            if seg_e.size:
                hll_e = HLL(hll_p)
                hll_e.add_hashes(h[seg_e])
                out_d.append(d)
                out_w.append("error")
                out_p.append(pickle.dumps(hll_e))
        return pa.table(
            {
                "date_utc": pa.array(out_d, pa.string()),
                "which": pa.array(out_w, pa.string()),
                "payload": pa.array(out_p, pa.binary()),
            }
        )

    def merge_group(g: "pd.DataFrame") -> "pd.DataFrame":
        # REAL distributed reduction keyed by (day, which): a plain chained
        # map_batches would be fused into the partial task (verified — the
        # driver kept pulling blocks x days x 2 payloads); the groupby
        # shuffle collapses to exactly one payload per (day, which)
        acc = None
        for p in g["payload"]:
            h = pickle.loads(p)
            acc = h if acc is None else acc.merge(h)
        return pd.DataFrame(
            {
                "date_utc": [g["date_utc"].iloc[0]],
                "which": [g["which"].iloc[0]],
                "payload": [pickle.dumps(acc)],
            }
        )

    merge_group.__name__ = "merge_hll_group"
    rows = (
        _with_date(ds)
        .select_columns(["date_utc", "event_id", "status"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["date_utc", "which"])
        .map_groups(merge_group, batch_format="pandas")
        .take_all()
    )
    merged: dict[tuple[str, str], HLL] = {}
    for r in rows:
        key = (r["date_utc"], r["which"])
        hll = pickle.loads(r["payload"])
        if key in merged:
            merged[key].merge(hll)
        else:
            merged[key] = hll
    days = sorted({d for d, _ in merged})
    if not days:
        # typed empty frame matching the exact path's contract (a bare
        # pd.DataFrame of empty lists defaults every column to float64)
        return pd.DataFrame(
            {
                "date_utc": pd.Series([], dtype=object),
                "n_events": pd.Series([], dtype="int64"),
                "n_error_events": pd.Series([], dtype="int64"),
                "error_rate": pd.Series([], dtype="float64"),
            }
        )
    n_ev = [int(round(merged[(d, "total")].estimate())) for d in days]
    n_err = [
        # the two sketches estimate independently; clamp so a day where every
        # event errors can't report > 100% from opposite-sign HLL noise
        min(
            int(round(merged[(d, "error")].estimate())) if (d, "error") in merged else 0,
            tot,
        )
        for d, tot in zip(days, n_ev)
    ]
    out = pd.DataFrame({"date_utc": days, "n_events": n_ev, "n_error_events": n_err})
    out["error_rate"] = (100.0 * out["n_error_events"] / out["n_events"]).round(6)
    return out.reset_index(drop=True)


def unique_event_names(ds):
    """Distinct event names (the report's filter widget,
    validation_report.py:85)."""
    return sorted(x for x in ds.unique("event_name") if x is not None)


def worst_offenders(ds, k: int = 20):
    """Top-k (field, error_type) pairs by violation count — 'worst partitions'
    style report view (SURVEY.md §2.6 O5)."""
    from ray.data.aggregate import Count

    return (
        ds.filter(expr="status == 'error'")
        .groupby(["field", "error_type"])
        .aggregate(Count(alias_name="n"))
        # deterministic top-k: ties broken on (field, error_type) so the
        # LIMIT boundary is engine-independent (shares the DuckDB oracle)
        .sort(["n", "field", "error_type"], descending=[True, False, False])
        .limit(k)
    )
