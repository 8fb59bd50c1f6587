"""Per-conversation wide checks: uniqueness, contiguity, timestamp ordering,
first-turn role — the referential/ordering rules mandated by the north rule
(absent from the per-record reference engine; SURVEY.md §2.4 J4, §2.7).

The only required shuffle in the engine: ``groupby("conv_id")`` over a
*projected* dataset (never the wide ``text`` column). Ordering is established
inside each group (sort by ``turn_idx``) — cheaper than a global sort and
sufficient for "per-turn text equality under stable turn ordering".

Check semantics (each SQL-expressible, see __ray_entry__.oracle_sql):

- unique:  one violation per (conv_id, turn_idx) with count n > 1
           (expected '1', actual str(n))
- order/contiguity over DISTINCT turn values: min turn != 0 (expected '0'),
           and each adjacent gap (expected str(prev+1), actual str(cur))
- order/ts: a row violates iff ts < max(ts) over rows with STRICTLY smaller
           turn_idx (null ts ignored) — identical to SQL
           MAX(ts) OVER (PARTITION BY conv ORDER BY turn_idx
                         RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING).
           expected/actual are epoch-microsecond strings (format-stable).
- ref/first_role: no row at the min turn has the required role
           (actual = lexicographic min of non-null roles at the min turn)

Skew: ``salted=True`` runs a two-phase variant — phase 1 groups by
``(conv_id, turn_idx // chunk)`` so a single million-turn conversation never
lands in one task (within-chunk checks are exact because equal turn values
share a chunk); phase 2 merges tiny per-chunk summaries per conversation for
the cross-boundary gaps / first-turn checks, and flags "suspect" chunks whose
min ts undercuts an earlier chunk's max; only those chunks are re-grouped in a
third, tiny pass for exact cross-chunk ts violations. (Two-phase salting per
DS2/ICDE'21, see PAPERS.md.)
"""

from __future__ import annotations

import datetime as _dt
import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..spec import Spec
from .validate import DEFAULT_RUN_TS, VIOLATION_SCHEMA

_NEG_INF = np.iinfo(np.int64).min


def _empty_out() -> dict[str, list]:
    return {name: [] for name in VIOLATION_SCHEMA.names}


def _finish(rows: dict[str, list], run_ts: _dt.datetime) -> pa.Table:
    ts_us = int(run_ts.timestamp() * 1_000_000)
    n = len(rows["event_id"])
    arrays = {}
    for name in VIOLATION_SCHEMA.names:
        typ = VIOLATION_SCHEMA.field(name).type
        if name == "timestamp":
            arrays[name] = pa.array(np.full(n, ts_us, dtype=np.int64), type=typ)
        else:
            arrays[name] = pa.array(rows[name], type=typ)
    return pa.table(arrays, schema=VIOLATION_SCHEMA)


def _emit(rows, eid, field, etype, exp, act, ename, status="error", payload=None):
    rows["event_id"].append(eid)
    rows["field"].append(field)
    rows["error_type"].append(etype)
    rows["expected"].append(exp)
    rows["actual"].append(act)
    rows["timestamp"].append(None)  # filled in _finish
    rows["source_event"].append(None)
    rows["status"].append(status)
    rows["event_name"].append(ename)
    rows["event_data"].append(payload)
    rows["value"].append(None)
    rows["type"].append(None)


def _group_arrays(g: pa.Table):
    turns = g["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts_col = g["ts"]
    ts_valid = ~np.asarray(pc.is_null(ts_col).combine_chunks().to_numpy(zero_copy_only=False))
    ts_us = np.full(len(turns), _NEG_INF, dtype=np.int64)
    if ts_valid.any():
        filled = pc.fill_null(ts_col, pa.scalar(0, type=ts_col.type))
        vals = filled.cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        ts_us[ts_valid] = vals[ts_valid]
    roles = g["role"].to_numpy(zero_copy_only=False) if "role" in g.schema.names else None
    return turns, ts_us, ts_valid, roles


def _check_turn_block(
    rows: dict[str, list],
    conv: str,
    ename: str,
    turns: np.ndarray,
    ts_us: np.ndarray,
    ts_valid: np.ndarray,
    check_min_zero: bool,
    spec: Spec,
):
    """All within-block checks; shared by the unsalted and per-chunk paths."""
    order = spec.table.order
    uq, inv, counts = np.unique(turns, return_inverse=True, return_counts=True)

    if spec.table.unique:
        for t, c in zip(uq[counts > 1], counts[counts > 1]):
            _emit(rows, f"{conv}:{t}", "turn_idx", "unique", "1", str(c), ename)

    if order and order.contiguous:
        if check_min_zero and uq[0] != 0:
            _emit(rows, f"{conv}:{uq[0]}", "turn_idx", "order", "0", str(uq[0]), ename)
        gaps = np.nonzero(np.diff(uq) > 1)[0]
        for gi in gaps:
            _emit(
                rows,
                f"{conv}:{uq[gi + 1]}",
                "turn_idx",
                "order",
                str(uq[gi] + 1),
                str(uq[gi + 1]),
                ename,
            )

    if order and order.ts_monotone and ts_valid.any():
        # max ts per distinct turn (null-aware), prefix-max over smaller turns
        max_per = np.full(len(uq), _NEG_INF, dtype=np.int64)
        np.maximum.at(max_per, inv, ts_us)
        prev_max = np.empty(len(uq), dtype=np.int64)
        prev_max[0] = _NEG_INF
        if len(uq) > 1:
            prev_max[1:] = np.maximum.accumulate(max_per)[:-1]
        pm_row = prev_max[inv]
        viol = ts_valid & (ts_us < pm_row)
        for i in np.nonzero(viol)[0]:
            _emit(
                rows,
                f"{conv}:{turns[i]}",
                "ts",
                "order",
                str(pm_row[i]),
                str(ts_us[i]),
                ename,
            )


def _first_role_info(turns: np.ndarray, roles: np.ndarray, expected: str):
    """(ok, actual) at the block's min turn."""
    at_min = turns == turns.min()
    r = roles[at_min]
    ok = any(x == expected for x in r)
    nn = sorted(x for x in r if x is not None)
    return ok, (nn[0] if nn else None)


class ConversationChecker:
    """map_groups fn for the unsalted path (one group = one conversation)."""

    def __init__(self, spec: Spec, run_ts: _dt.datetime = DEFAULT_RUN_TS):
        self.spec = spec
        self.run_ts = run_ts
        self.__name__ = type(self).__name__  # Ray's map_groups wrapper requires it

    def __call__(self, g: pa.Table) -> pa.Table:
        conv = g["conv_id"][0].as_py()
        ename = self.spec.event_name
        rows = _empty_out()
        turns, ts_us, ts_valid, roles = _group_arrays(g)
        _check_turn_block(rows, conv, ename, turns, ts_us, ts_valid, True, self.spec)
        first = self.spec.table.first_role
        if first and roles is not None:
            ok, actual = _first_role_info(turns, roles, first)
            if not ok:
                _emit(
                    rows,
                    f"{conv}:{turns.min()}",
                    "role",
                    "ref",
                    f"first_role={first}",
                    actual,
                    ename,
                )
        return _finish(rows, self.run_ts)


def _project(ds, spec: Spec):
    cols = ["conv_id", "turn_idx"]
    if spec.table.order and spec.table.order.ts_monotone:
        cols.append(spec.table.order.ts_column)
    if spec.table.first_role:
        cols.append("role")
    return ds.select_columns(cols)


def conversation_violations(ds, spec: Spec, run_ts: _dt.datetime = DEFAULT_RUN_TS):
    """Unsalted path: project → groupby(conv_id) → per-group vectorized checks.
    Use for normal conversation-size distributions."""
    return (
        _project(ds, spec)
        .groupby("conv_id")
        .map_groups(ConversationChecker(spec, run_ts), batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Salted two-phase variant (skew mitigation)
# ---------------------------------------------------------------------------


class _ChunkChecker:
    """Phase 1: per (conv_id, salt-chunk) group — exact within-chunk checks +
    one summary row (status='summary', payload in event_data)."""

    def __init__(self, spec: Spec, run_ts: _dt.datetime, chunk: int):
        self.spec = spec
        self.run_ts = run_ts
        self.chunk = chunk
        self.__name__ = type(self).__name__

    def __call__(self, g: pa.Table) -> pa.Table:
        conv = g["conv_id"][0].as_py()
        ename = self.spec.event_name
        rows = _empty_out()
        turns, ts_us, ts_valid, roles = _group_arrays(g)
        chunk_id = int(turns.min()) // self.chunk
        # within-chunk checks only; the global min-turn==0 check is owned by
        # phase 2 (it sees every chunk's min)
        _check_turn_block(
            rows, conv, ename, turns, ts_us, ts_valid, False, self.spec
        )
        summary = {
            "chunk": chunk_id,
            "min_turn": int(turns.min()),
            "max_turn": int(turns.max()),
            "max_ts": int(ts_us[ts_valid].max()) if ts_valid.any() else None,
            "min_ts": int(ts_us[ts_valid].min()) if ts_valid.any() else None,
        }
        first = self.spec.table.first_role
        if first and roles is not None:
            ok, actual = _first_role_info(turns, roles, first)
            summary["first_ok"] = ok
            summary["min_role"] = actual
        _emit(
            rows,
            f"{conv}:{chunk_id}",
            None,
            "summary",
            None,
            None,
            conv,
            status="summary",
            payload=json.dumps(summary),
        )
        return _finish(rows, self.run_ts)


def _phase2_driver(summaries: "pd.DataFrame", spec: Spec, run_ts: _dt.datetime):
    """Phase 2, vectorized (pandas) over the tiny per-chunk summaries:
    cross-chunk contiguity / min-turn-zero / first-role violations, plus the
    suspect-chunk list for the ts re-scan.

    Runs on the driver: summaries are one row per (conv, chunk) — orders of
    magnitude smaller than the data. At extreme conversation counts the same
    vectorized logic runs distributed (sort by (conv, chunk) + map_batches
    with boundary carry); the sandbox path keeps it driver-side.
    """
    import pandas as pd

    rows = _empty_out()
    ename = spec.event_name
    suspects: list[tuple[str, int, int]] = []  # (conv, chunk, prefix_max)
    if summaries.empty:
        return _finish(rows, run_ts), suspects
    df = summaries.sort_values(["conv", "chunk"]).reset_index(drop=True)
    g = df.groupby("conv", sort=False)
    first_of_conv = g.cumcount() == 0
    order = spec.table.order

    if order and order.contiguous:
        m = first_of_conv & (df["min_turn"] != 0)
        for conv, mt in zip(df.loc[m, "conv"], df.loc[m, "min_turn"]):
            _emit(rows, f"{conv}:{mt}", "turn_idx", "order", "0", str(mt), ename)
        prev_max = g["max_turn"].shift(1)
        m = (~first_of_conv) & (df["min_turn"] - prev_max > 1)
        for conv, mt, pm in zip(
            df.loc[m, "conv"], df.loc[m, "min_turn"], prev_max[m]
        ):
            _emit(
                rows, f"{conv}:{mt}", "turn_idx", "order", str(int(pm) + 1), str(mt), ename
            )

    first = spec.table.first_role
    if first and "first_ok" in df.columns:
        m = first_of_conv & (~df["first_ok"].astype(bool))
        for conv, mt, mr in zip(
            df.loc[m, "conv"], df.loc[m, "min_turn"], df.loc[m, "min_role"]
        ):
            _emit(
                rows,
                f"{conv}:{mt}",
                "role",
                "ref",
                f"first_role={first}",
                None if pd.isna(mr) else mr,
                ename,
            )

    if order and order.ts_monotone:
        max_ts = df["max_ts"].astype("float64")
        prefix = g["max_ts"].apply(lambda s: s.astype("float64").cummax().shift(1)).reset_index(drop=True)
        if isinstance(prefix, pd.DataFrame):  # pandas version quirk
            prefix = prefix.iloc[:, 0]
        prefix.index = df.index
        min_ts = df["min_ts"].astype("float64")
        m = prefix.notna() & min_ts.notna() & (min_ts < prefix)
        for conv, ch, pm in zip(df.loc[m, "conv"], df.loc[m, "chunk"], prefix[m]):
            suspects.append((conv, int(ch), int(pm)))

    return _finish(rows, run_ts), suspects


class _SuspectRescan:
    """Phase 3: exact cross-chunk ts violations inside suspect chunks only.
    Emits rows with ts < prefix_max that were NOT already flagged by the
    within-chunk pass (ts >= within-chunk prev-max)."""

    def __init__(self, spec: Spec, run_ts: _dt.datetime, prefix_max: dict):
        self.spec = spec
        self.run_ts = run_ts
        self.prefix_max = prefix_max  # (conv, chunk) -> prefix max ts_us
        self.__name__ = type(self).__name__

    def __call__(self, g: pa.Table) -> pa.Table:
        conv = g["conv_id"][0].as_py()
        chunk_id = int(g["chunk"][0].as_py())
        pmax = self.prefix_max.get((conv, chunk_id))
        rows = _empty_out()
        if pmax is None:
            return _finish(rows, self.run_ts)
        turns, ts_us, ts_valid, _ = _group_arrays(g)
        uq, inv = np.unique(turns, return_inverse=True)
        max_per = np.full(len(uq), _NEG_INF, dtype=np.int64)
        np.maximum.at(max_per, inv, ts_us)
        prev_max = np.empty(len(uq), dtype=np.int64)
        prev_max[0] = _NEG_INF
        if len(uq) > 1:
            prev_max[1:] = np.maximum.accumulate(max_per)[:-1]
        within_pm = prev_max[inv]
        viol = ts_valid & (ts_us < pmax) & (ts_us >= within_pm)
        eff = np.maximum(within_pm, pmax)
        for i in np.nonzero(viol)[0]:
            _emit(
                rows,
                f"{conv}:{turns[i]}",
                "ts",
                "order",
                str(eff[i]),
                str(ts_us[i]),
                self.spec.event_name,
            )
        return _finish(rows, self.run_ts)


def conversation_violations_salted(
    ds,
    spec: Spec,
    run_ts: _dt.datetime = DEFAULT_RUN_TS,
    chunk: int = 10_000,
):
    """Salted two-phase path. Produces exactly the same violation rows as
    `conversation_violations` (property-tested), but no single task ever holds
    more than ~`chunk` turns of one conversation.

    Partitioning assumption: equal (conv_id, turn_idx) pairs share a salt
    chunk, so uniqueness and within-chunk checks are exact; only boundary
    contiguity and cross-chunk ts ordering need the (tiny) summary merge.
    """
    import pandas as pd
    import pyarrow.compute as _pc
    import ray.data as rd

    projected = _project(ds, spec)

    def add_salt(t: pa.Table) -> pa.Table:
        salt = _pc.cast(
            _pc.floor(_pc.divide(_pc.cast(t["turn_idx"], pa.float64()), chunk)),
            pa.int64(),
        )
        return t.append_column("chunk", salt)

    salted = projected.map_batches(add_salt, batch_format="pyarrow")
    # Phase 1 output = within-chunk violations + per-chunk summaries.
    # Materialized: it is tiny relative to the input and is consumed twice.
    phase1 = (
        salted.groupby(["conv_id", "chunk"])
        .map_groups(_ChunkChecker(spec, run_ts, chunk), batch_format="pyarrow")
        .materialize()
    )
    viol1 = phase1.filter(expr="status == 'error'")
    sum_rows = (
        phase1.filter(expr="status == 'summary'")
        .select_columns(["event_name", "event_data"])
        .take_all()
    )
    summaries = pd.DataFrame(
        [json.loads(r["event_data"]) | {"conv": r["event_name"]} for r in sum_rows]
    )
    viol2_tbl, suspects = _phase2_driver(summaries, spec, run_ts)
    out = viol1
    if viol2_tbl.num_rows:
        out = out.union(rd.from_arrow(viol2_tbl))
    if suspects:
        pmax = {(c, ch): pm for c, ch, pm in suspects}
        suspect_convs = sorted({c for c, _, _ in suspects})
        rescan_src = salted.filter(expr=f"conv_id in {suspect_convs!r}")
        viol3 = rescan_src.groupby(["conv_id", "chunk"]).map_groups(
            _SuspectRescan(spec, run_ts, pmax), batch_format="pyarrow"
        )
        out = out.union(viol3)
    return out
