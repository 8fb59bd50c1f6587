"""Vectorized nestedSchema validation over typed Arrow list<struct>/struct
columns: differential parity vs the row oracle, the JSON-document path, and
the DuckDB UNNEST twin — plus the wrapped scalar-item path."""

import json
from collections import Counter

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from events_validator_ray.oracle import validate_event
from events_validator_ray.sources.nested import (
    NESTED_SPEC_JSON,
    ensure_nested_events,
    generate_nested_events,
    nested_glob,
)
from events_validator_ray.spec import load_spec
from events_validator_ray.stages.validate import ValidateBatch, ValidateJsonDocs

SF = 0.001


def _spec():
    return load_spec(NESTED_SPEC_JSON, event_name="purchase")


def _viol_multiset(df: pd.DataFrame) -> Counter:
    return Counter(
        zip(df["event_id"].astype(str), df["field"], df["error_type"], df["expected"], df["actual"])
    )


def test_vectorized_nested_equals_row_oracle():
    t = generate_nested_events(3000)
    spec = _spec()
    out = ValidateBatch(spec, log_valid=False, id_cols=("event_id",))(t).to_pandas()
    got = _viol_multiset(out)
    want = Counter()
    for row in t.to_pylist():
        for f, et, exp, act in validate_event(spec.fields, row):
            want[(str(row["event_id"]), f, et, exp, act)] += 1
    assert sum(want.values()) > 500  # injected violations exist
    assert got == want


def test_vectorized_nested_equals_json_mode():
    """The typed columnar path and the JSON-document path (ValidateJsonDocs)
    agree when the JSON serializes every key (Arrow structs are
    present-with-null)."""
    t = generate_nested_events(1500)
    spec = _spec()
    vec = ValidateBatch(spec, log_valid=False, id_cols=("event_id",))(t).to_pandas()

    docs = [
        json.dumps({**row, "event_name": "purchase"}) for row in t.to_pylist()
    ]
    jt = pa.table(
        {
            "event_id": t["event_id"],
            "payload": pa.array(docs, type=pa.string()),
        }
    )
    js = ValidateJsonDocs(
        {"purchase": spec},
        json_col="payload",
        id_cols=("event_id",),
        default_event_name="purchase",
        log_valid=False,
    )(jt).to_pandas()
    assert _viol_multiset(vec) == _viol_multiset(js)


def test_nested_sql_twin(ray_session):
    import ray.data as rd

    from events_validator_ray.pipelines.queries import (
        NESTED_CHILD_KINDS,
        NESTED_FLAT_KINDS,
    )
    from events_validator_ray.pipelines.sqlgen import nested_spec_violations_sql

    ndir = ensure_nested_events(SF)
    spec = _spec()
    got = (
        rd.read_parquet(ndir)
        .map_batches(
            ValidateBatch(spec, log_valid=False, id_cols=("event_id",)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
    )
    sql = nested_spec_violations_sql(
        spec,
        f"read_parquet('{nested_glob(SF)}')",
        NESTED_FLAT_KINDS,
        key_cols=("event_id",),
        nested_kinds=NESTED_CHILD_KINDS,
    )
    want = duckdb.sql(sql).df()
    assert len(got) == len(want) > 100
    assert _viol_multiset(got) == _viol_multiset(want)


def test_wrapped_scalar_items_vectorized():
    """list<string> column with a nestedSchema: scalar items wrap as
    {'': item} — '' rules run per item (trailing-dot paths), other keys are
    per-item missing; null items follow the {'': null} walk."""
    spec = load_spec(
        {
            "id": {"type": "number"},
            "tags": {
                "type": "array",
                "nestedSchema": {"": {"type": "string", "regex": "^t_"}, "k": {"type": "number"}},
            },
        },
        event_name="t",
    )
    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3], type=pa.int64()),
            "tags": pa.array(
                [["t_a", "bad"], None, ["t_b", None]],
                type=pa.list_(pa.string()),
            ),
        }
    )
    out = ValidateBatch(spec, log_valid=False, id_cols=("id",))(tbl).to_pandas()
    got = _viol_multiset(out)
    want = Counter()
    for row in tbl.to_pylist():
        for f, et, exp, act in validate_event(spec.fields, row):
            want[(str(row["id"]), f, et, exp, act)] += 1
    assert got == want
    # spot-check the quirky trailing-dot path and per-item missing keys
    assert ("1", "tags[1].", "regex", "^t_", "bad") in got
    assert ("1", "tags[0].k", "missing", "field present", "field missing") in got
    assert ("2", "tags", "type", "array", "object") in got
    assert ("3", "tags[1].", "type", "string", "object") in got


def test_nested_faster_than_json_mode():
    """The vectorized typed path must beat row-at-a-time JSON parsing by a
    wide margin (soft bound here; BENCH records the real ratio)."""
    import time

    t = generate_nested_events(20_000)
    spec = _spec()
    vec = ValidateBatch(spec, log_valid=False, id_cols=("event_id",))
    vec(t.slice(0, 100))  # compile once
    t0 = time.perf_counter()
    vec(t)
    t_vec = time.perf_counter() - t0

    docs = [json.dumps({**row, "event_name": "purchase"}) for row in t.to_pylist()]
    jt = pa.table({"event_id": t["event_id"], "payload": pa.array(docs)})
    js = ValidateJsonDocs(
        {"purchase": spec}, json_col="payload", id_cols=("event_id",),
        default_event_name="purchase", log_valid=False,
    )
    t0 = time.perf_counter()
    js(jt)
    t_json = time.perf_counter() - t0
    assert t_vec * 3 < t_json, f"vectorized {t_vec:.3f}s vs json {t_json:.3f}s"
