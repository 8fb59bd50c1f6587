"""Driver-facing query registry: every implemented operator/pipeline from
SURVEY.md §2 as a named callable over an ``sf_dir``, with a DuckDB oracle-SQL
twin where the semantics are SQL-expressible.

Conventions (driver contract): each callable takes sf_dir and returns a
Dataset / DataFrame / pyarrow Table; computed column names match the SQL
aliases exactly; approximate/stateful ops (HLL, t-digest, drift, dedup
clustering) omit the oracle and get the driver's rows-only check.

The transcript corpus is the deterministic synthetic table from
sources/transcripts.py, cached under /tmp; the oracle SQL reads the SAME
parquet files via read_parquet(), so both engines see identical bytes.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ..spec import Spec, load_spec, transcript_spec
from ..sources.transcripts import ensure_transcripts, sf_from_dir, transcripts_glob
from .sqlgen import (
    column_kinds_for_transcripts,
    conversation_violations_sql,
    scalar_violations_sql,
    valid_rows_condition,
)

VCOLS = ["event_id", "field", "error_type", "expected", "actual", "event_name", "status"]

#: spec for the TPC-H-ish `events` stream table (second schema exercising the
#: same engine; 'error' events are enum violations by design)
EVENTS_SPEC_JSON = {
    "event_id": {"type": "number"},
    "ts": {"type": "timestamp"},
    "user_id": {"type": "number"},
    "event_type": {
        "type": "string",
        "enum": ["click", "view", "purchase", "signup"],
    },
    "value": {"type": "number"},
    "props": {"type": "string", "regex": "^\\{"},
}

EVENTS_COL_KINDS = {
    "event_id": "number",
    "ts": "timestamp",
    "user_id": "number",
    "event_type": "string",
    "value": "number",
    "props": "string",
}


def events_spec() -> Spec:
    return load_spec(EVENTS_SPEC_JSON, event_name="events")


def _tdir(sf_dir: str) -> str:
    return ensure_transcripts(sf_from_dir(sf_dir))


def _read_transcripts(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(_tdir(sf_dir))


def _read_events(sf_dir: str):
    import ray.data as rd
    import os

    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"))


# ---------------------------------------------------------------------------
# Transcript queries
# ---------------------------------------------------------------------------


def q_validate_scalar(sf_dir: str):
    """Core operator (SURVEY.md §2.2 M2-M7): vectorized scalar+ref validation,
    error rows only."""
    from ..stages.validate import ValidateBatch

    ds = _read_transcripts(sf_dir)
    return ds.map_batches(
        ValidateBatch(transcript_spec(), log_valid=False),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(VCOLS)


def q_valid_turns(sf_dir: str):
    """logPassed analog (M8): one valid row per clean turn."""
    from ..stages.validate import ValidateBatch

    ds = _read_transcripts(sf_dir)
    return (
        ds.map_batches(
            ValidateBatch(transcript_spec(), log_valid=True),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .filter(expr="status == 'valid'")
        .select_columns(["event_id", "event_name", "status"])
    )


def q_conversation_checks(sf_dir: str):
    """Wide checks (J4/§2.7): unique, contiguity, ts ordering, first-role."""
    from ..stages.conversation import conversation_violations

    ds = _read_transcripts(sf_dir)
    return conversation_violations(ds, transcript_spec()).select_columns(VCOLS)


def q_conversation_checks_salted(sf_dir: str):
    """Salted two-phase variant — identical rows, skew-safe partitioning."""
    from ..stages.conversation import conversation_violations_salted

    ds = _read_transcripts(sf_dir)
    return conversation_violations_salted(
        ds, transcript_spec(), chunk=1000
    ).select_columns(VCOLS)


def q_failures_by_day(sf_dir: str):
    """Report A2 (validation_report.py:110-116): failures by day × field."""
    from ..pipelines.report import failures_by_day
    from ..stages.validate import ValidateBatch

    ds = _read_transcripts(sf_dir)
    log = ds.map_batches(
        ValidateBatch(transcript_spec(), log_valid=False, date_from="ts"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return failures_by_day(log, dim="field")


def q_error_rate(sf_dir: str):
    """Report A3 (validation_report.py:119-131): per-day distinct totals and
    distinct error events (rate numerator/denominator; ints for exactness)."""
    from ..pipelines.report import daily_error_rate
    from ..stages.validate import ValidateBatch

    ds = _read_transcripts(sf_dir)
    log = ds.map_batches(
        ValidateBatch(transcript_spec(), log_valid=True, date_from="ts"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    df = daily_error_rate(log)
    return df[["date_utc", "n_events", "n_error_events"]]


def q_column_stats(sf_dir: str):
    """Exact column profile (north rule: per-column count/null/min-max) via
    the mergeable-sketch stage."""
    import pandas as pd

    from ..stages.sketches import sketch_dataset

    ds = _read_transcripts(sf_dir)
    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    sk = sketch_dataset(ds, {c: ("stats",) for c in cols})
    rows = []
    for c in cols:
        st = sk[(c, "stats")]
        rows.append(
            {
                "col": c,
                "n_count": st.count,
                "n_nulls": st.nulls,
                "min_str": None if st.min is None else str(st.min),
                "max_str": None if st.max is None else str(st.max),
            }
        )
    return pd.DataFrame(rows)


def q_hll_distinct_conv(sf_dir: str):
    """HLL distinct conversations (approx; rows-only check — accuracy is
    asserted against exact in tests/test_sketches.py)."""
    import pandas as pd

    from ..stages.sketches import sketch_dataset

    ds = _read_transcripts(sf_dir)
    sk = sketch_dataset(ds, {"conv_id": ("hll",)})
    return pd.DataFrame(
        [{"col": "conv_id", "approx_distinct": int(round(sk[("conv_id", "hll")].estimate()))}]
    )


def q_quantiles_turn_idx(sf_dir: str):
    """t-digest quantiles (approx; rows-only check)."""
    import pandas as pd

    from ..stages.sketches import sketch_dataset

    ds = _read_transcripts(sf_dir)
    sk = sketch_dataset(ds, {"turn_idx": ("tdigest",)})
    td = sk[("turn_idx", "tdigest")]
    return pd.DataFrame(
        [{"q": q, "value": td.quantile(q)} for q in (0.5, 0.9, 0.99)]
    )


def q_drift_roles(sf_dir: str):
    """PSI drift of the role histogram vs a fixed reference profile
    (rows-only check; scoring functions unit-tested)."""
    from ..stages.sketches import drift_report, sketch_dataset

    ds = _read_transcripts(sf_dir)
    sk = sketch_dataset(ds, {"role": ("cathist",)})
    reference = {
        "role": {"user": 45, "assistant": 35, "tool": 12, "system": 8}
    }
    return drift_report(sk, reference, method="psi", threshold=0.2)


# ---------------------------------------------------------------------------
# Events-table queries (pre-registered DuckDB view `events`)
# ---------------------------------------------------------------------------


def q_validate_events(sf_dir: str):
    """The same engine over a second schema: the events stream table."""
    from ..stages.validate import ValidateBatch

    ds = _read_events(sf_dir)
    return ds.map_batches(
        ValidateBatch(events_spec(), log_valid=False, id_cols=("event_id",)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(VCOLS)


def q_events_failures_by_day(sf_dir: str):
    from ..pipelines.report import failures_by_day
    from ..stages.validate import ValidateBatch

    ds = _read_events(sf_dir)
    log = ds.map_batches(
        ValidateBatch(events_spec(), log_valid=False, id_cols=("event_id",), date_from="ts"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return failures_by_day(log, dim="field")


def q_events_error_rate(sf_dir: str):
    from ..pipelines.report import daily_error_rate
    from ..stages.validate import ValidateBatch

    ds = _read_events(sf_dir)
    log = ds.map_batches(
        ValidateBatch(events_spec(), log_valid=True, id_cols=("event_id",), date_from="ts"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    df = daily_error_rate(log)
    return df[["date_utc", "n_events", "n_error_events"]]


# ---------------------------------------------------------------------------
# Oracle SQL
# ---------------------------------------------------------------------------


def _transcripts_table_sql(sf: float) -> str:
    return f"read_parquet('{transcripts_glob(sf)}')"


def transcript_oracles(sf: float = 0.01) -> dict[str, str]:
    """Oracle SQL for the transcript queries at the driver's scale factor.
    Generating the corpus here guarantees the files exist before DuckDB runs."""
    ensure_transcripts(sf)
    spec = transcript_spec()
    kinds = column_kinds_for_transcripts()
    t = _transcripts_table_sql(sf)
    scalar = scalar_violations_sql(spec, t, kinds)
    scalar_dated = scalar_violations_sql(spec, t, kinds, date_col="ts")
    valid_cond = valid_rows_condition(spec, kinds)
    conv = conversation_violations_sql(spec, t)
    eid = "conv_id || ':' || CAST(turn_idx AS VARCHAR)"

    stats_branches = []
    for c in ["conv_id", "turn_idx", "role", "text", "tool"]:
        stats_branches.append(
            f"SELECT '{c}' AS col, COUNT(*) AS n_count, "
            f"COUNT(*) - COUNT({c}) AS n_nulls, "
            f"CAST(MIN({c}) AS VARCHAR) AS min_str, "
            f"CAST(MAX({c}) AS VARCHAR) AS max_str FROM {t}"
        )

    return {
        "validate_scalar": scalar,
        "valid_turns": (
            f"SELECT {eid} AS event_id, 'transcript' AS event_name, "
            f"'valid' AS status FROM {t} WHERE {valid_cond}"
        ),
        "conversation_checks": conv,
        "conversation_checks_salted": conv,
        "failures_by_day": (
            f"WITH viol AS ({scalar_dated}) "
            "SELECT date_utc, field, COUNT(*) AS n_failures "
            "FROM viol GROUP BY date_utc, field"
        ),
        "error_rate": (
            f"WITH viol AS ({scalar_dated}), "
            f"valid_rows AS (SELECT {eid} AS event_id, strftime(ts, '%Y-%m-%d') AS date_utc "
            f"FROM {t} WHERE {valid_cond}), "
            "log AS (SELECT event_id, date_utc FROM viol "
            "UNION ALL SELECT event_id, date_utc FROM valid_rows), "
            "tot AS (SELECT date_utc, COUNT(DISTINCT event_id) AS n_events FROM log GROUP BY date_utc), "
            "err AS (SELECT date_utc, COUNT(DISTINCT event_id) AS n_error_events FROM viol GROUP BY date_utc) "
            "SELECT tot.date_utc AS date_utc, tot.n_events AS n_events, "
            "COALESCE(err.n_error_events, 0) AS n_error_events "
            "FROM tot LEFT JOIN err ON tot.date_utc = err.date_utc"
        ),
        "column_stats": "\nUNION ALL\n".join(stats_branches),
    }


def events_oracles() -> dict[str, str]:
    spec = events_spec()
    scalar = scalar_violations_sql(
        spec, "events", EVENTS_COL_KINDS, key_cols=("event_id",)
    )
    scalar_dated = scalar_violations_sql(
        spec, "events", EVENTS_COL_KINDS, key_cols=("event_id",), date_col="ts"
    )
    valid_cond = valid_rows_condition(spec, EVENTS_COL_KINDS)
    return {
        "validate_events": scalar,
        "events_failures_by_day": (
            f"WITH viol AS ({scalar_dated}) "
            "SELECT date_utc, field, COUNT(*) AS n_failures "
            "FROM viol GROUP BY date_utc, field"
        ),
        "events_error_rate": (
            f"WITH viol AS ({scalar_dated}), "
            "valid_rows AS (SELECT CAST(event_id AS VARCHAR) AS event_id, "
            f"strftime(ts, '%Y-%m-%d') AS date_utc FROM events WHERE {valid_cond}), "
            "log AS (SELECT event_id, date_utc FROM viol "
            "UNION ALL SELECT event_id, date_utc FROM valid_rows), "
            "tot AS (SELECT date_utc, COUNT(DISTINCT event_id) AS n_events FROM log GROUP BY date_utc), "
            "err AS (SELECT date_utc, COUNT(DISTINCT event_id) AS n_error_events FROM viol GROUP BY date_utc) "
            "SELECT tot.date_utc AS date_utc, tot.n_events AS n_events, "
            "COALESCE(err.n_error_events, 0) AS n_error_events "
            "FROM tot LEFT JOIN err ON tot.date_utc = err.date_utc"
        ),
    }


def build_queries() -> dict[str, Callable[[str], Any]]:
    return {
        "validate_scalar": q_validate_scalar,
        "valid_turns": q_valid_turns,
        "conversation_checks": q_conversation_checks,
        "conversation_checks_salted": q_conversation_checks_salted,
        "failures_by_day": q_failures_by_day,
        "error_rate": q_error_rate,
        "column_stats": q_column_stats,
        "hll_distinct_conv": q_hll_distinct_conv,
        "quantiles_turn_idx": q_quantiles_turn_idx,
        "drift_roles": q_drift_roles,
        "validate_events": q_validate_events,
        "events_failures_by_day": q_events_failures_by_day,
        "events_error_rate": q_events_error_rate,
    }


def build_oracles(sf: float = 0.01) -> dict[str, str]:
    out = transcript_oracles(sf)
    out.update(events_oracles())
    return out
