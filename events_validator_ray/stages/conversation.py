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
- alt (order.alternate): consecutive DISTINCT turns must not repeat a role
           from the set; a turn's role = MIN of its rows' non-null roles
           (deterministic under duplicates); all-null turns are skipped

Skew: ``salted=True`` runs a two-phase variant — phase 1 groups by
``(conv_id, turn_idx // chunk)`` so a single million-turn conversation never
lands in one task (within-chunk checks are exact because equal turn values
share a chunk); phase 2 merges the per-chunk
summaries per conversation DISTRIBUTED (hash-bucketed vectorized boundary
carry — the summary table is conv x chunk and must never be collected) for
the cross-boundary gaps / first-turn / alternation checks. Cross-chunk ts
ordering finalizes INSIDE phase 2: chunk>0 summaries (the split tail — the
only possible suspects, since a chunk with no earlier chunk cannot undercut
one) carry their per-row (turn_idx, ts) payload, and suspect chunks' ts-order
rows are re-emitted there with `expected` = the conversation-global prefix
max — no second corpus scan. Phase 1's within-chunk ts rows for suspect
chunks are dropped (their expected understates the global max). (Two-phase
salting per DS2/ICDE'21, see PAPERS.md.)
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..spec import Spec
from .validate import DEFAULT_RUN_TS, VIOLATION_SCHEMA

_NEG_INF = np.iinfo(np.int64).min

#: packed per-chunk summary layout (phase 1 -> phase 2): SEP-joined values in
#: SUMMARY_FIELDS order, "" = null. Packed/unpacked with VECTORIZED string
#: kernels — replaces the per-row json.dumps/json.loads round trip.
SUMMARY_SEP = "\x1f"
SUMMARY_FIELDS = [
    "min_turn",
    "max_turn",
    "max_ts",
    "min_ts",
    "chunk",
    "first_ok",
    "min_role",
    "alt_first_turn",
    "alt_first_role",
    "alt_last_role",
    # chunk>0 groups only: per-ROW turn_idx / ts-µs CSVs ("" = null ts) in the
    # group. Only chunk>0 groups can ever be ts-order SUSPECTS (a chunk with
    # no earlier chunk cannot undercut one), so carrying their rows lets
    # phase 2 emit the corrected cross-chunk ts violations directly and the
    # old phase-3 full-corpus rescan disappears. Volume is bounded by the
    # split tail (turns beyond each conversation's first chunk) — the rows
    # you pay for are exactly the skew you bought insurance against.
    "ts_turns",
    "ts_vals",
]


def parse_summary_payload(s: str) -> dict:
    """Decode one packed summary payload (tests/debugging)."""
    d = dict(zip(SUMMARY_FIELDS, s.split(SUMMARY_SEP)))
    out: dict = {}
    for k in ("min_turn", "max_turn", "max_ts", "min_ts", "chunk", "alt_first_turn"):
        v = d.get(k, "")
        out[k] = None if v == "" else int(v)
    fo = d.get("first_ok", "")
    out["first_ok"] = None if fo == "" else fo == "1"
    for k in ("min_role", "alt_first_role", "alt_last_role"):
        out[k] = d.get(k) or None
    return out


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
    """map_groups fn for the unsalted path (one group = one conversation).
    Kept as the simple reference implementation; the production path is
    BucketChecker (many conversations per task, fully vectorized)."""

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



class _VecRows:
    """Vectorized violation-row accumulator (numpy object arrays, no per-row
    Python appends)."""

    def __init__(self):
        self.parts: list[dict] = []

    def add(self, eid, field, etype, expected, actual, ename, status="error", payload=None):
        eid = np.asarray(eid, dtype=object)
        n = len(eid)
        if n == 0:
            return

        def arr(x):
            if isinstance(x, (np.ndarray, list)):
                return np.asarray(x, dtype=object)
            if hasattr(x, "to_numpy"):
                return x.to_numpy(dtype=object, na_value=None)
            return np.full(n, x, dtype=object)

        self.parts.append(
            {
                "event_id": eid,
                "field": arr(field),
                "error_type": arr(etype),
                "expected": arr(expected),
                "actual": arr(actual),
                "event_name": arr(ename),
                "status": arr(status),
                "event_data": arr(payload),
            }
        )

    def to_table(self, run_ts: _dt.datetime) -> pa.Table:
        ts_us = int(run_ts.timestamp() * 1_000_000)
        n = sum(len(p["event_id"]) for p in self.parts)
        cols = ("event_id", "field", "error_type", "expected", "actual", "event_name", "status", "event_data")
        cat = {
            c: (np.concatenate([p[c] for p in self.parts]) if self.parts else np.empty(0, dtype=object))
            for c in cols
        }
        arrays = {}
        for name in VIOLATION_SCHEMA.names:
            typ = VIOLATION_SCHEMA.field(name).type
            if name == "timestamp":
                arrays[name] = pa.array(np.full(n, ts_us, dtype=np.int64), type=typ)
            elif name in cat:
                arrays[name] = pa.array(cat[name], type=typ)
            else:
                arrays[name] = pa.nulls(n, type=typ)
        return pa.table(arrays, schema=VIOLATION_SCHEMA)


class BucketChecker:
    """Vectorized multi-conversation checker: one call processes a whole hash
    bucket of conversations with pandas/numpy C kernels (groupby cummax /
    shift), avoiding Ray's per-group UDF dispatch — ~50k tiny conversations
    per second per core instead of ~5k.

    `check_min_zero=False` + `emit_summaries=True` turns it into the salted
    phase-1 worker over (conv_id, chunk) buckets."""

    def __init__(
        self,
        spec: Spec,
        run_ts: _dt.datetime = DEFAULT_RUN_TS,
        check_min_zero: bool = True,
        emit_summaries: bool = False,
        group_cols: tuple[str, ...] = ("conv_id",),
        local_chunk0_checks: bool = False,
    ):
        self.spec = spec
        self.run_ts = run_ts
        self.check_min_zero = check_min_zero
        self.emit_summaries = emit_summaries
        self.group_cols = list(group_cols)
        # salted phase 1: chunk 0 (turns [0, chunk)) always holds the
        # conversation's GLOBAL min turn when it exists, so min-zero and
        # first-role finalize locally there and phase 2 only needs summaries
        # of conversations that are split or start past chunk 0 — shrinking
        # phase-2 volume from every conversation to just the skewed tail.
        # _Phase2Bucket(skip_chunk0_checks=True) is the matching half.
        self.local_chunk0_checks = local_chunk0_checks
        self.__name__ = type(self).__name__

    def __call__(self, df) -> pa.Table:
        import pandas as pd

        spec = self.spec
        ename = spec.event_name
        order = spec.table.order
        out = _VecRows()
        gcols = self.group_cols
        has_role = "role" in df.columns
        ts_name = order.ts_column if order else "ts"
        has_ts = ts_name in df.columns

        if not len(df):
            return out.to_table(self.run_ts)

        # single int64 composite group key: factorized conv_id (+ offset chunk)
        # — every internal sort / groupby / merge runs on int keys; the string
        # conv_id only materializes for the (small) violation/summary outputs
        codes, conv_index = pd.factorize(df["conv_id"], sort=False)
        if (codes < 0).any():
            # defense in depth: _project drops NULL-conv rows before the
            # shuffle, but a direct caller must not hit factorize's -1
            # sentinel (conv_arr[-1] would misattribute to the LAST conv)
            keep = codes >= 0
            df = df[keep].reset_index(drop=True)
            codes = codes[keep]
            if not len(df):
                return out.to_table(self.run_ts)
        if len(gcols) > 1:
            chunk_np = df[gcols[1]].to_numpy()
            chunk_min = int(chunk_np.min())
            factor = int(chunk_np.max()) - chunk_min + 1
            gkey = codes.astype(np.int64) * factor + (chunk_np - chunk_min)
        else:
            chunk_min, factor = 0, 1
            gkey = codes.astype(np.int64)
        df = df.assign(_g=gkey)
        conv_arr = np.asarray(conv_index, dtype=object)

        def conv_of(gvals) -> pd.Series:
            g = np.asarray(gvals, dtype=np.int64)
            return pd.Series(conv_arr[g // factor] if factor > 1 else conv_arr[g])

        def chunk_of(gvals) -> np.ndarray:
            g = np.asarray(gvals, dtype=np.int64)
            return (g % factor) + chunk_min

        df = df.sort_values(["_g", "turn_idx"], kind="stable").reset_index(drop=True)
        if has_ts:
            s = pd.to_datetime(df[ts_name])
            vals = s.astype("int64")
            if str(s.dtype).startswith("datetime64[ns"):
                vals = vals // 1000  # epoch MICROseconds everywhere
            ts = vals.where(s.notna()).astype("float64")
        else:
            ts = pd.Series(np.nan, index=df.index)

        # per-(group, turn) frame: count + max ts (C groupby)
        key = ["_g", "turn_idx"]
        agg = (
            pd.DataFrame({"_g": df["_g"], "turn_idx": df["turn_idx"], "_ts": ts})
            .groupby(key, sort=True)
            .agg(n=("_ts", "size"), max_ts=("_ts", "max"))
            .reset_index()
        )

        def eid_of(frame) -> np.ndarray:
            return (
                conv_of(frame["_g"]).astype(str).to_numpy(dtype=object)
                + ":"
                + frame["turn_idx"].astype(str).to_numpy(dtype=object)
            )

        if spec.table.unique:
            dup = agg[agg["n"] > 1]
            out.add(eid_of(dup), "turn_idx", "unique", "1", dup["n"].astype(str), ename)

        gb = agg.groupby("_g", sort=False)
        if order and order.contiguous:
            prev_turn = gb["turn_idx"].shift(1)
            first_row = prev_turn.isna()
            if self.check_min_zero:
                m = first_row & (agg["turn_idx"] != 0)
                sel = agg[m]
                out.add(eid_of(sel), "turn_idx", "order", "0", sel["turn_idx"].astype(str), ename)
            elif self.local_chunk0_checks and len(gcols) > 1:
                # chunk-0 groups own the conversation's min turn: finalize
                # min-zero here (convs starting past chunk 0 have no chunk-0
                # group and stay a phase-2 responsibility)
                m = first_row & (agg["turn_idx"] != 0) & (chunk_of(agg["_g"]) == 0)
                sel = agg[m]
                out.add(eid_of(sel), "turn_idx", "order", "0", sel["turn_idx"].astype(str), ename)
            m = (~first_row) & (agg["turn_idx"] - prev_turn > 1)
            sel = agg[m]
            out.add(
                eid_of(sel),
                "turn_idx",
                "order",
                (prev_turn[m].astype("int64") + 1).astype(str),
                sel["turn_idx"].astype(str),
                ename,
            )

        if order and order.ts_monotone and has_ts:
            # prefix max of per-turn max ts over strictly smaller turns.
            # fillna(-inf) first: pandas cummax leaves NaN at all-null turns,
            # and shift(1) would then feed NaN prevmax to the next turn,
            # silently masking real disorder there
            filled = agg["max_ts"].fillna(float("-inf"))
            cummax = filled.groupby(agg["_g"], sort=False).cummax()
            agg["prevmax"] = cummax.groupby(agg["_g"], sort=False).shift(1)
            joined = df.merge(agg[key + ["prevmax"]], on=key, how="left", sort=False)
            m = ts.notna().to_numpy() & (ts.to_numpy() < joined["prevmax"].to_numpy())
            sel = joined[m]
            out.add(
                eid_of(sel),
                ts_name,
                "order",
                sel["prevmax"].astype("int64").astype(str),
                ts[m].astype("int64").astype(str),
                ename,
            )

        alt_summary = None
        if order and order.alternate and has_role:
            # role-alternation (J4): the role of a DISTINCT turn is the MIN of
            # its rows' non-null roles; violation when consecutive turns share
            # a role from the alternate set
            nn = df.dropna(subset=["role"])
            tr = (
                nn.groupby(key, sort=True)["role"].min().rename("turn_role").reset_index()
            )
            prev = tr.groupby("_g", sort=False)["turn_role"].shift(1)
            m = (
                tr["turn_role"].notna()
                & prev.notna()
                & (tr["turn_role"] == prev)
                & tr["turn_role"].isin(order.alternate)
            )
            sel = tr[m]
            out.add(
                eid_of(sel),
                "role",
                "alt",
                "alternating " + "|".join(order.alternate),
                sel["turn_role"],
                ename,
            )
            if self.emit_summaries:
                g2 = tr.groupby("_g", sort=False)
                alt_summary = pd.DataFrame(
                    {
                        "alt_first_turn": g2["turn_idx"].first(),
                        "alt_first_role": g2["turn_role"].first(),
                        "alt_last_role": g2["turn_role"].last(),
                    }
                )

        first = spec.table.first_role
        summaries = None
        if (first and has_role and not self.emit_summaries) or self.emit_summaries:
            min_turn = gb["turn_idx"].first().rename("min_turn")  # agg sorted by turn
            heads = agg.merge(min_turn.reset_index(), on="_g", sort=False)
            at_min = df.merge(
                heads.loc[heads["turn_idx"] == heads["min_turn"], key],
                on=key,
                how="inner",
                sort=False,
            )
            if first and has_role:
                am = at_min.assign(_hit=at_min["role"].eq(first))
                gmin2 = am.groupby("_g", sort=False)
                info = gmin2.agg(
                    hit=("_hit", "any"), mturn=("turn_idx", "first")
                )
                # min over NON-NULL roles only (object-dtype min chokes on
                # NaN/str mixes; groups that are all-null stay absent -> None)
                nn = am.dropna(subset=["role"])
                min_role = nn.groupby("_g", sort=False)["role"].min().rename("min_role")
                info = info.join(min_role).reset_index()
                info["min_role"] = info["min_role"].where(info["min_role"].notna(), None)
                if self.emit_summaries:
                    summaries = info.set_index("_g")[["hit", "min_role"]].rename(
                        columns={"hit": "first_ok"}
                    )
                    if self.local_chunk0_checks and len(gcols) > 1:
                        # chunk-0 min turn IS the conversation min turn:
                        # finalize the first-role check locally (phase 2
                        # skips chunk-0-anchored convs via skip_chunk0_checks)
                        bad = info[~info["hit"] & (chunk_of(info["_g"]) == 0)]
                        out.add(
                            (
                                conv_of(bad["_g"]).astype(str).to_numpy(dtype=object)
                                + ":"
                                + bad["mturn"].astype(str).to_numpy(dtype=object)
                            ),
                            "role",
                            "ref",
                            f"first_role={first}",
                            bad["min_role"],
                            ename,
                        )
                else:
                    bad = info[~info["hit"]]
                    out.add(
                        (conv_of(bad["_g"]).astype(str).to_numpy(dtype=object) + ":" + bad["mturn"].astype(str).to_numpy(dtype=object)),
                        "role",
                        "ref",
                        f"first_role={first}",
                        bad["min_role"],
                        ename,
                    )

        if self.emit_summaries:
            stats = pd.DataFrame(
                {
                    "min_turn": gb["turn_idx"].min(),
                    "max_turn": gb["turn_idx"].max(),
                    "max_ts": gb["max_ts"].max(),
                    "min_ts": (
                        pd.DataFrame({"_g": df["_g"], "_ts": ts})
                        .groupby("_g", sort=False)["_ts"]
                        .min()
                    ),
                }
            )
            if summaries is not None:
                stats = stats.join(summaries)
            if alt_summary is not None:
                stats = stats.join(alt_summary)
            if order and order.ts_monotone and has_ts and len(gcols) > 1:
                # chunk>0 groups (the split tail, and the only possible ts
                # suspects) carry their per-row (turn_idx, ts) CSVs so phase 2
                # can finalize cross-chunk ts checks without a corpus rescan
                split_rows = df[gcols[1]].to_numpy() > 0
                if split_rows.any():
                    tsub = ts.to_numpy()[split_rows]
                    vstr = np.where(
                        np.isnan(tsub),
                        "",
                        np.nan_to_num(tsub).astype(np.int64).astype(str),
                    ).astype(object)
                    sub = pd.DataFrame(
                        {
                            "_g": df["_g"].to_numpy()[split_rows],
                            "t": df["turn_idx"].to_numpy()[split_rows].astype(np.int64).astype(str),
                            "v": vstr,
                        }
                    )
                    ts_pack = sub.groupby("_g", sort=False).agg(
                        ts_turns=("t", ",".join), ts_vals=("v", ",".join)
                    )
                    stats = stats.join(ts_pack)
            stats = stats.reset_index()
            n_stats = len(stats)
            gv = stats["_g"].to_numpy(dtype=np.int64)
            conv_vals = conv_arr[gv // factor]
            chunk_col = pd.Series(
                (gv % factor) + chunk_min
                if len(gcols) > 1
                else np.zeros(len(gv), dtype=np.int64)
            )

            def s_int(col, default=""):
                if col not in stats.columns:
                    return np.full(n_stats, default, dtype=object)
                v = pd.to_numeric(stats[col], errors="coerce").to_numpy(dtype="float64")
                mask = np.isnan(v)
                vals = np.where(mask, 0, v).astype(np.int64).astype(str).astype(object)
                vals[mask] = ""
                return vals

            def s_str(col):
                if col not in stats.columns:
                    return np.full(n_stats, "", dtype=object)
                return stats[col].fillna("").astype(str).to_numpy(dtype=object)

            def s_bool(col):
                if col not in stats.columns:
                    return np.full(n_stats, "", dtype=object)
                return np.where(stats[col].astype(bool), "1", "0").astype(object)

            cols = [
                s_int("min_turn"),
                s_int("max_turn"),
                s_int("max_ts"),
                s_int("min_ts"),
                chunk_col.astype(str).to_numpy(dtype=object),
                s_bool("first_ok"),
                s_str("min_role"),
                s_int("alt_first_turn"),
                s_str("alt_first_role"),
                s_str("alt_last_role"),
                s_str("ts_turns"),
                s_str("ts_vals"),
            ]
            payloads = (
                pd.Series(cols[0])
                .str.cat([pd.Series(c) for c in cols[1:]], sep=SUMMARY_SEP)
                .to_numpy(dtype=object)
            )
            conv_str = pd.Series(conv_vals).astype(str).to_numpy(dtype=object)
            eids = conv_str + ":" + chunk_col.astype(str).to_numpy(dtype=object)
            # chunk>0 summaries get a distinct status: their conv set IS the
            # split/skewed tail phase 2 must merge, and tagging here lets the
            # merge task find it on the PACKED rows (no unpack of the full
            # summary table — only hot convs' rows are ever unpacked)
            split_m = (chunk_col > 0).to_numpy()
            for status, m in (("summary", ~split_m), ("summary_split", split_m)):
                if m.any():
                    out.add(
                        eids[m],
                        None,
                        "summary",
                        None,
                        None,
                        conv_vals[m],
                        status=status,
                        payload=payloads[m],
                    )
        return out.to_table(self.run_ts)


def _project(ds, spec: Spec):
    cols = ["conv_id", "turn_idx"]
    if spec.table.order and spec.table.order.ts_monotone:
        cols.append(spec.table.order.ts_column)
    if spec.table.first_role or (spec.table.order and spec.table.order.alternate):
        cols.append("role")
    projected = ds.select_columns(sorted(set(cols), key=cols.index))

    def drop_unplaceable(t: pa.Table) -> pa.Table:
        # rows with NULL conv_id / NULL turn_idx cannot be placed in the
        # uniqueness/order lattice (and pd.factorize would misattribute a
        # NULL conv to the LAST conv in the bucket via its -1 sentinel);
        # each is already a scalar-plane type violation. The SQL twin
        # excludes them symmetrically (sqlgen.conversation_violations_sql).
        import pyarrow.compute as pc

        return t.filter(
            pc.and_(pc.is_valid(t["conv_id"]), pc.is_valid(t["turn_idx"]))
        )

    return projected.map_batches(drop_unplaceable, batch_format="pyarrow")


def _with_bucket(ds, num_buckets: int, cols: tuple[str, ...] = ("conv_id",)):
    """Append `bucket = hash(cols) % num_buckets` — hash co-location of whole
    conversations so one task processes thousands of them vectorized."""
    from ..stages.sketches import hash64

    def add_bucket(t: pa.Table) -> pa.Table:
        h = hash64(t[cols[0]].to_numpy(zero_copy_only=False)).astype(np.uint64)
        for c in cols[1:]:
            extra = t[c].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = h * np.uint64(0x100000001B3) ^ extra
        return t.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def detect_skew(
    ds,
    within: str = "conv_id",
    sample_frac: float = 0.02,
    seed: int = 7,
    top_k: int = 5,
) -> dict:
    """Heavy-hitter probe for the grouping key: sampled value-counts estimate
    the largest group's share of all rows (the 'detect skew from a conv_id
    heavy-hitter sketch' step, SURVEY.md §4.2). Drives the auto choice
    between the plain and salted conversation paths."""
    from .assembly import bucketed_count_per_key

    # ONE execution of the sampled lineage: the distributed value-counts are
    # materialized (object-store, spillable; bounded by distinct keys in the
    # sample) and BOTH total and top-k derive from them — re-executing the
    # seeded random_sample per consumer could mix two different samples if
    # per-task sampling isn't bit-stable across block layouts. Counts via
    # the bucketed reducer: distinct convs in the sample scale with the
    # corpus (the sort-aggregate group-cardinality pathology, CLAUDE.md).
    sample = ds.select_columns([within]).random_sample(sample_frac, seed=seed)
    vc = bucketed_count_per_key(sample, within, "n").materialize()
    total = int(vc.sum("n") or 0)
    # only the top-k rows reach the driver (a 2% sample of 10^12 turns is
    # still 10^10 rows — never collect it)
    top_rows = vc.sort("n", descending=True).limit(top_k).take_all()
    top = [(str(r[within]), int(r["n"])) for r in top_rows]
    return {
        "sampled_rows": total,
        "top": top,
        "max_share": (top[0][1] / total) if (total and top) else 0.0,
    }


def conversation_violations_auto(
    ds,
    spec: Spec,
    run_ts: _dt.datetime = DEFAULT_RUN_TS,
    skew_share_threshold: float = 0.01,
    chunk: int = 10_000,
    num_buckets: int = 64,
):
    """Choose the salted path automatically when the heaviest conversation
    holds more than `skew_share_threshold` of (sampled) rows — i.e. when a
    single group could dominate one task."""
    probe = detect_skew(ds, within=spec.table.order.within if spec.table.order else "conv_id")
    if probe["max_share"] > skew_share_threshold:
        return conversation_violations_salted(ds, spec, run_ts, chunk=chunk)
    return conversation_violations(ds, spec, run_ts, num_buckets=num_buckets)


def conversation_violations(
    ds,
    spec: Spec,
    run_ts: _dt.datetime = DEFAULT_RUN_TS,
    num_buckets: int = 64,
):
    """Unsalted path: project -> hash-bucket by conv_id -> one vectorized
    pass per bucket (complete conversations per bucket by construction).
    Use for normal conversation-size distributions; the salted variant below
    handles pathological single-conversation skew."""
    return (
        _with_bucket(_project(ds, spec), num_buckets)
        .groupby("bucket")
        .map_groups(
            BucketChecker(spec, run_ts, check_min_zero=True),
            batch_format="pandas",
        )
    )


# ---------------------------------------------------------------------------
# Salted two-phase variant (skew mitigation)
# ---------------------------------------------------------------------------


def _violation_table(df: "pd.DataFrame") -> pa.Table:
    """Pandas violation rows -> Arrow in the canonical VIOLATION_SCHEMA (the
    union downstream must never mix pandas- and arrow-backed blocks)."""
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    arrays = {
        name: tbl[name].cast(VIOLATION_SCHEMA.field(name).type)
        for name in VIOLATION_SCHEMA.names
    }
    return pa.table(arrays, schema=VIOLATION_SCHEMA)


def _unpack_summaries(df: "pd.DataFrame") -> "pd.DataFrame":
    """Packed summary rows (event_name=conv, event_data=payload) -> one
    structured frame (vectorized split; no per-row JSON)."""
    import pandas as pd

    # fresh RangeIndex: `out[c] = parts[c]` below aligns BY INDEX, and the
    # driver branch passes a boolean-filtered (gapped-index) frame
    df = df.reset_index(drop=True)
    parts = df["event_data"].str.split(SUMMARY_SEP, expand=True)
    parts.columns = SUMMARY_FIELDS[: parts.shape[1]]
    out = pd.DataFrame({"conv": df["event_name"].to_numpy()})
    for c in ("min_turn", "max_turn", "max_ts", "min_ts", "chunk", "alt_first_turn"):
        # mask-then-to_numeric: `.replace("", nan)` trips the pandas
        # silent-downcasting FutureWarning in every worker
        out[c] = pd.to_numeric(parts[c].where(parts[c] != "")) if c in parts else np.nan
    out["first_ok"] = parts["first_ok"] if "first_ok" in parts else ""
    for c in ("min_role", "alt_first_role", "alt_last_role"):
        out[c] = parts[c].where(parts[c] != "") if c in parts else np.nan
    for c in ("ts_turns", "ts_vals"):
        out[c] = parts[c] if c in parts else ""
    return out


class _Phase2Bucket:
    """DISTRIBUTED phase 2: one task processes a hash bucket of whole
    conversations' per-chunk summaries with vectorized pandas kernels
    (shift / cummax / ffill boundary carry) — cross-chunk contiguity,
    min-turn-zero, first-role and alternation-carry violations, plus
    `status='suspect'` marker rows (event_id=f"{conv}:{chunk}",
    expected=str(prefix_max)) driving the phase-1 suspect ts-row drop, plus
    the corrected cross-chunk ts-order rows re-checked from the chunk>0
    summaries' carried (turn_idx, ts) payloads. Replaces the
    old driver-side merge: at 10^12 turns the summary table (one row per
    conv × chunk) is itself corpus-scale and must never be collected."""

    def __init__(
        self, spec: Spec, run_ts: _dt.datetime, skip_chunk0_checks: bool = False
    ):
        self.spec = spec
        self.run_ts = run_ts
        # True when phase 1 ran with local_chunk0_checks: min-zero and
        # first-role were already finalized for conversations anchored at
        # chunk 0, so only convs starting past chunk 0 need them here — and
        # a single-chunk-0 conversation contributes NOTHING to phase 2,
        # letting the caller drop its summary from the phase-2 input.
        self.skip_chunk0_checks = skip_chunk0_checks
        self.__name__ = type(self).__name__

    def __call__(self, df: "pd.DataFrame") -> pa.Table:
        import pandas as pd

        spec = self.spec
        ename = spec.event_name
        order = spec.table.order
        out = _VecRows()
        df = df.sort_values(["conv", "chunk"]).reset_index(drop=True)
        g = df.groupby("conv", sort=False)
        first = (g.cumcount() == 0).to_numpy()
        conv = df["conv"].astype(str)

        def eid(mask: np.ndarray, turns: "pd.Series") -> np.ndarray:
            return (
                conv[mask] + ":" + turns[mask].astype("int64").astype(str)
            ).to_numpy(dtype=object)

        past0 = (
            (df["chunk"] > 0).to_numpy()
            if self.skip_chunk0_checks
            else np.ones(len(df), dtype=bool)
        )
        if order and order.contiguous:
            m = first & (df["min_turn"] != 0).to_numpy() & past0
            out.add(
                eid(m, df["min_turn"]),
                "turn_idx",
                "order",
                "0",
                df.loc[m, "min_turn"].astype("int64").astype(str),
                ename,
            )
            prev_max = g["max_turn"].shift(1)
            m = (~first) & ((df["min_turn"] - prev_max) > 1).to_numpy()
            out.add(
                eid(m, df["min_turn"]),
                "turn_idx",
                "order",
                (prev_max[m] + 1).astype("int64").astype(str),
                df.loc[m, "min_turn"].astype("int64").astype(str),
                ename,
            )

        fr = spec.table.first_role
        if fr is not None:
            m = first & (df["first_ok"] == "0").to_numpy() & past0
            out.add(
                eid(m, df["min_turn"]),
                "role",
                "ref",
                f"first_role={fr}",
                df.loc[m, "min_role"],
                ename,
            )

        if order and order.alternate:
            expected = "alternating " + "|".join(order.alternate)
            alt_set = sorted(order.alternate)
            fr_col = df["alt_first_role"]
            # carry = last non-null alt_last_role of EARLIER chunks (roleless
            # chunks don't reset it): shift then ffill within the conversation
            prev_last = g["alt_last_role"].shift(1)
            carry = prev_last.groupby(df["conv"], sort=False).ffill()
            m = (
                fr_col.notna()
                & carry.notna()
                & (fr_col == carry)
                & fr_col.isin(alt_set)
            ).to_numpy()
            out.add(
                eid(m, df["alt_first_turn"]),
                "role",
                "alt",
                expected,
                df.loc[m, "alt_first_role"],
                ename,
            )

        if order and order.ts_monotone:
            # fillna(-inf) first: pandas cummax leaves NaN at all-null-ts
            # chunks, and shift(1) would then feed NaN prefix to the NEXT
            # chunk, silently masking real disorder there (same hazard
            # BucketChecker guards within-chunk)
            cm = (
                df["max_ts"]
                .astype("float64")
                .fillna(float("-inf"))
                .groupby(df["conv"], sort=False)
                .cummax()
            )
            prefix = cm.groupby(df["conv"], sort=False).shift(1)
            min_ts = df["min_ts"].astype("float64")
            m = (prefix.notna() & min_ts.notna() & (min_ts < prefix)).to_numpy()
            # suspect markers: drive the drop of phase 1's within-chunk ts
            # rows for these chunks (their `expected` understates the global
            # prefix max)
            out.add(
                (conv[m] + ":" + df.loc[m, "chunk"].astype("int64").astype(str)).to_numpy(
                    dtype=object
                ),
                None,
                "suspect",
                prefix[m].astype("int64").astype(str),
                None,
                conv[m].to_numpy(dtype=object),
                status="suspect",
            )
            # ...and emit the CORRECTED ts-order rows directly from the
            # chunk's carried (turn_idx, ts) payload — the old phase-3
            # full-corpus rescan is gone. Semantics identical to the unsalted
            # path: a row violates iff ts < max(within-chunk prev-turn max,
            # earlier-chunk prefix max), expected = that effective max.
            if m.any() and "ts_turns" in df.columns:
                ts_name = order.ts_column or "ts"
                for tcsv, vcsv, conv_s, P in zip(
                    df.loc[m, "ts_turns"],
                    df.loc[m, "ts_vals"],
                    conv[m],
                    prefix[m].to_numpy(dtype="float64"),
                ):
                    if not isinstance(tcsv, str) or not tcsv:
                        continue
                    turns = np.array(tcsv.split(","), dtype=np.int64)
                    vals = np.array(
                        [float(x) if x else np.nan for x in vcsv.split(",")],
                        dtype=np.float64,
                    )
                    o = np.argsort(turns, kind="stable")
                    st, sv = turns[o], vals[o]
                    uturn, inv = np.unique(st, return_inverse=True)
                    filled = np.where(np.isnan(sv), -np.inf, sv)
                    tmax = np.full(len(uturn), -np.inf)
                    np.maximum.at(tmax, inv, filled)
                    run = np.maximum.accumulate(tmax)
                    prevmax = np.concatenate(([-np.inf], run[:-1]))
                    eff = np.maximum(prevmax[inv], P)
                    bad = ~np.isnan(sv) & (sv < eff)
                    if bad.any():
                        out.add(
                            np.array(
                                [f"{conv_s}:{t}" for t in st[bad]], dtype=object
                            ),
                            ts_name,
                            "order",
                            eff[bad].astype(np.int64).astype(str).astype(object),
                            sv[bad].astype(np.int64).astype(str).astype(object),
                            ename,
                        )
        return out.to_table(self.run_ts)


class _Phase2Packed:
    """Phase 2 over PACKED summary rows: finds the hot (split / past-chunk-0)
    conversations via the `summary_split` status tag, unpacks ONLY their rows
    (the expensive `str.split` runs on the skewed tail, never the full
    summary table) and runs the `_Phase2Bucket` boundary merge. Works both
    coalesced (one task holds all summaries) and per conv-hash bucket —
    a conversation's chunks always co-locate either way."""

    def __init__(self, spec: Spec, run_ts: _dt.datetime):
        self.spec = spec
        self.run_ts = run_ts
        self.__name__ = type(self).__name__

    def __call__(self, df: "pd.DataFrame") -> pa.Table:
        hot = set(df.loc[df["status"] == "summary_split", "event_name"])
        sub = df[df["event_name"].isin(hot)] if hot else df.iloc[0:0]
        if not len(sub):
            return _finish(_empty_out(), self.run_ts)
        return _Phase2Bucket(self.spec, self.run_ts, skip_chunk0_checks=True)(
            _unpack_summaries(sub)
        )



def conversation_violations_salted(
    ds,
    spec: Spec,
    run_ts: _dt.datetime = DEFAULT_RUN_TS,
    chunk: int = 10_000,
    driver_max_rows: int = 500_000,
    driver_max_bytes: int = 256 * 1024 * 1024,
    take_all_max_rows: int = 2_000_000,
    take_all_max_bytes: int = 1024 * 1024 * 1024,
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

    projected = _project(ds, spec)

    def add_salt(t: pa.Table) -> pa.Table:
        salt = _pc.cast(
            _pc.floor(_pc.divide(_pc.cast(t["turn_idx"], pa.float64()), chunk)),
            pa.int64(),
        )
        # clamp to chunk 0: dirty data with NEGATIVE turn_idx must land in
        # the chunk that owns min-turn finalization (floor division would
        # put it in chunk -1, which every chunk-0-anchored assumption —
        # local min-zero/first-role, summary_split tagging, past0 — misses)
        salt = _pc.max_element_wise(salt, pa.scalar(0, pa.int64()))
        return t.append_column("chunk", salt)

    salted = projected.map_batches(add_salt, batch_format="pyarrow")
    # Phase 1 output = within-chunk violations + per-chunk summaries; groups
    # are (conv_id, chunk) hash-bucketed so one task handles many chunks
    # vectorized and no task ever holds more than ~chunk turns of one
    # conversation. Materialized: tiny vs the input, consumed twice.
    phase1 = (
        _with_bucket(salted, 64, cols=("conv_id", "chunk"))
        .groupby("bucket")
        .map_groups(
            BucketChecker(
                spec,
                run_ts,
                check_min_zero=False,
                emit_summaries=True,
                group_cols=("conv_id", "chunk"),
                local_chunk0_checks=True,
            ),
            batch_format="pandas",
        )
        .materialize()
    )
    # phase 2: unpack the packed summaries and merge chunk boundaries per
    # conversation. The summary table is one row per (conv, chunk) — far
    # below the corpus. When the WHOLE phase-1 output is driver-sized
    # (phase1.count() bounds it, free on materialized data), pull it once:
    # phase 2 (including the payload ts re-check), the suspect-row drop and
    # the violation re-emit all happen driver-side, leaving ONE pre-built
    # final block. Corpus-scale phase-1 output (10^12 turns)
    # takes the distributed hash-bucketed path, where only phase 2's OUTPUT
    # (cross-chunk violations + suspect markers, bounded by actual issues)
    # is ever collected.
    import ray.data as _rd

    ts_name = spec.table.order.ts_column if spec.table.order else "ts"
    suspects: list[tuple[str, int, int]] = []
    # gate on BYTES as well as rows: chunk>0 summary rows carry ~chunk-sized
    # (turn_idx, ts) CSV payloads, so row count alone understates the pull
    # at exactly the skew this path targets (one 10^9-turn conversation is
    # ~10^5 summary rows but tens of GB of payload)
    phase1_bytes = phase1.size_bytes() or 0
    driver_branch = (
        phase1.count() <= driver_max_rows and phase1_bytes <= driver_max_bytes
    )
    if driver_branch:
        pdf = phase1.to_pandas()
        if not len(pdf):
            # empty/fully-clean shard: an empty to_pandas loses columns (the
            # documented Ray empty-Dataset schema hazard) — return the typed
            # empty violation table instead of KeyError-ing downstream
            return _rd.from_arrow(
                pa.Table.from_pylist([], schema=VIOLATION_SCHEMA)
            )
        is_sum = pdf["status"].str.startswith("summary")
        viol1_df = pdf[~is_sum]
        p2_tbl = None
        if bool(is_sum.any()):
            # phase 1 finalized chunk-0-anchored convs: unpack and merge only
            # convs that are split or start past chunk 0 (summary_split tag)
            p2_tbl = _Phase2Packed(spec, run_ts)(pdf[is_sum])
        err2 = None
        if p2_tbl is not None and p2_tbl.num_rows:
            err2 = p2_tbl.filter(pc.equal(p2_tbl["status"], "error"))
            sus = p2_tbl.filter(pc.equal(p2_tbl["status"], "suspect"))
            for c_ch, pm in zip(
                sus["event_id"].to_pylist(), sus["expected"].to_pylist()
            ):
                c, ch = c_ch.rsplit(":", 1)
                suspects.append((c, int(ch), int(pm)))
    else:
        viol1 = phase1.filter(expr="status == 'error'")
        out = viol1
        # phase 1 finalized chunk-0-anchored convs, so phase 2's REAL input
        # is only convs with a `summary_split` (chunk>0) row — the skewed /
        # split tail, not every conversation. The merge task finds that tail
        # on the PACKED rows and unpacks only it (`_Phase2Packed`); with a
        # driver-bounded summary table one coalesced task beats a second
        # shuffle, corpus-scale summaries take the conv-hash bucketed merge.
        summaries_raw = phase1.filter(expr="status != 'error'")
        if (
            phase1.count() <= take_all_max_rows
            and phase1_bytes <= take_all_max_bytes
        ):
            # summary rows are a subset of the (materialized, counted) phase-1
            # output: one filter execution ships them to the driver and the
            # boundary merge runs locally — no repartition barrier, no task
            # round-trip for a table this small
            sum_rows = summaries_raw.take_all()
            p2_tbl = (
                _Phase2Packed(spec, run_ts)(pd.DataFrame(sum_rows))
                if sum_rows
                else _finish(_empty_out(), run_ts)
            )
        else:
            # corpus-scale summaries: conv-hash bucketed distributed merge;
            # only its issue-bounded OUTPUT is collected
            p2_ds = (
                _with_bucket(summaries_raw, 64, cols=("event_name",))
                .groupby("bucket")
                .map_groups(_Phase2Packed(spec, run_ts), batch_format="pandas")
            )
            p2_tbl = pa.Table.from_pylist(
                p2_ds.take_all(), schema=VIOLATION_SCHEMA
            )
        err2 = p2_tbl.filter(pc.equal(p2_tbl["status"], "error"))
        # NOTE: err2 is unioned AFTER the suspect-ts drop below — phase 2's
        # corrected ts rows live in suspect chunks by construction, so a
        # drop over the union would erase the very rows that replace the
        # dropped phase-1 ones
        sus = p2_tbl.filter(pc.equal(p2_tbl["status"], "suspect"))
        for c_ch, pm in zip(
            sus["event_id"].to_pylist(), sus["expected"].to_pylist()
        ):
            c, ch = c_ch.rsplit(":", 1)
            suspects.append((c, int(ch), int(pm)))
    suspect_keys = frozenset(f"{c}:{ch}" for (c, ch, _pm) in suspects)
    # phase 2's payload re-check owns ALL ts-order rows for suspect chunks
    # (emitted into err2 above): drop phase 1's (their `expected` is only the
    # WITHIN-chunk prefix max — wrong when an earlier chunk holds the running
    # max).
    if driver_branch:
        if suspects and len(viol1_df):
            is_ts = (viol1_df["field"] == ts_name) & (
                viol1_df["error_type"] == "order"
            )
            if is_ts.any():
                split = viol1_df.loc[is_ts, "event_id"].str.rsplit(":", n=1)
                conv = split.str[0]
                ch = (
                    (split.str[1].astype("int64") // chunk)
                    .clip(lower=0)
                    .astype(str)
                )
                drop = is_ts.copy()
                drop.loc[is_ts] = (conv + ":" + ch).isin(suspect_keys)
                viol1_df = viol1_df[~drop]
        tables = [_violation_table(viol1_df)]
        if err2 is not None and err2.num_rows:
            tables.append(err2)
        out = _rd.from_arrow(pa.concat_tables(tables))
    else:
        if suspects:
            # distributed branch: suspect keys broadcast via the object
            # store, never a literal expression
            import ray as _ray

            suspect_ref = _ray.put(suspect_keys)

            def drop_suspect_ts(df: "pd.DataFrame") -> pa.Table:
                keys = suspect_ref
                if isinstance(keys, _ray.ObjectRef):
                    keys = _ray.get(keys)
                is_ts = (df["field"] == ts_name) & (df["error_type"] == "order")
                if is_ts.any():
                    split = df.loc[is_ts, "event_id"].str.rsplit(":", n=1)
                    conv = split.str[0]
                    ch = (
                        (split.str[1].astype("int64") // chunk)
                        .clip(lower=0)
                        .astype(str)
                    )
                    drop = is_ts.copy()
                    drop.loc[is_ts] = (conv + ":" + ch).isin(keys)
                    df = df[~drop]
                # emit ARROW in the canonical schema so the downstream union
                # mixes no pandas-vs-arrow block representations
                return _violation_table(df)

            out = out.map_batches(drop_suspect_ts, batch_format="pandas")
        # union phase 2's corrected rows only AFTER the drop: they live in
        # suspect chunks by construction and must survive
        if err2.num_rows:
            out = out.union(_rd.from_arrow(err2))
    return out
