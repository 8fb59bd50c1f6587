"""User-extension surface + JSON-payload (nested-document) mode:
get_by_path, spec directory loading, repo canonicalization, custom check
registration, and the purchase-like nested fixture (FIXTURES.md §4)."""

import json

import numpy as np
import pyarrow as pa
import pytest

from events_validator_ray.oracle import UNDEFINED, get_by_path
from events_validator_ray.sources.specs import (
    canonicalize_param,
    find_impacted_specs,
    list_spec_names,
    load_spec_dir,
    spec_from_repo,
)
from events_validator_ray.spec import load_spec
from events_validator_ray.stages.validate import (
    Branch,
    CUSTOM_CHECKS,
    ValidateBatch,
    ValidateJsonDocs,
    register_check,
)


def test_get_by_path():
    obj = {"data": {"event_name": "x", "items": [{"id": "a"}, {"id": "b"}]}}
    assert get_by_path(obj, "data")["event_name"] == "x"
    assert get_by_path(obj, "data.items[1].id") == "b"
    assert get_by_path(obj, ["data", "event_name"]) == "x"
    assert get_by_path(obj, "data.items[9].id") is UNDEFINED
    assert get_by_path(obj, "nope.deep") is UNDEFINED
    assert get_by_path(obj, "") is obj


def test_spec_dir_and_repo(tmp_path):
    (tmp_path / "purchase.json").write_text(
        json.dumps({"event_name": {"type": "string", "value": "purchase"}})
    )
    (tmp_path / "login.json").write_text(json.dumps({"user": {"type": "string"}}))
    (tmp_path / "repo.json").write_text("{}")
    assert list_spec_names(str(tmp_path)) == ["login", "purchase"]
    specs = load_spec_dir(str(tmp_path))
    assert specs["purchase"].fields["event_name"].value == "purchase"

    param = {"type": "number", "description": "d", "value": "1.5", "regex": "^x$"}
    rule = canonicalize_param(param)
    assert rule == {"type": "number", "description": "d", "value": 1.5}
    assert "regex" not in rule  # construct_schema_definition never emits regex

    repo = {
        "currency": {"usedInSchemas": ["purchase", "refund"], "type": "string"},
        "value": {"usedInSchemas": ["purchase"], "type": "number"},
    }
    assert find_impacted_specs(repo, "currency") == ["purchase", "refund"]
    spec = spec_from_repo(repo, "purchase")
    assert set(spec.fields) == {"currency", "value"}


def test_custom_check_registration():
    def compile_min(rule, raw_val, schema):
        def check(ctx):
            import pyarrow.compute as pc

            from events_validator_ray.functions.kernels import bool_np, take_np
            col = ctx.col(rule.name)
            mask = bool_np(pc.less(col, raw_val)) & ~ctx.skip(rule.name, rule.optional)
            idx = np.nonzero(mask)[0]
            if not idx.size:
                return []
            import pyarrow.compute as pc2
            actual = take_np(pc2.cast(col, pa.string()), idx)
            return [Branch(idx, rule.name, "min", str(raw_val), actual, 50)]

        return check

    register_check("min", compile_min)
    try:
        spec = load_spec({"v": {"type": "number", "min": 10}})
        batch = pa.table({"conv_id": ["a", "b"], "turn_idx": [0, 1], "v": [5, 15]})
        out = ValidateBatch(spec, log_valid=False)(batch)
        rows = out.to_pylist()
        assert len(rows) == 1
        assert rows[0]["error_type"] == "min" and rows[0]["actual"] == "5"
    finally:
        CUSTOM_CHECKS.pop("min", None)


PURCHASE_SPEC = {
    "event_name": {"type": "string", "value": "purchase"},
    "currency": {"type": "string", "length": 3},
    "value": {"type": "number"},
    "items": {
        "type": "array",
        "nestedSchema": {
            "item_id": {"type": "string"},
            "price": {"type": "number"},
            "quantity": {"type": "number", "optional": True},
        },
    },
}


def docs_batch(docs, envelope=False):
    payload = [json.dumps({"data": d} if envelope else d) for d in docs]
    return pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(len(docs))]),
            "turn_idx": pa.array(list(range(len(docs))), pa.int32()),
            "text": pa.array(payload),
        }
    )


def test_json_payload_purchase_fixture():
    specs = {"purchase": load_spec(PURCHASE_SPEC, event_name="purchase")}
    good = {
        "event_name": "purchase",
        "currency": "USD",
        "value": 12.5,
        "items": [{"item_id": "sku1", "price": 9.99, "quantity": 2}],
    }
    bad = {
        "event_name": "purchase",
        "currency": "USDX",  # length 4
        "value": "12",  # type number violated (value rule absent)
        "items": [
            {"item_id": 7, "price": "x"},  # wrong types
            "scalar",  # wrapped as {'': item} -> missing fields
        ],
    }
    unknown = {"event_name": "refund", "value": 1}
    vj = ValidateJsonDocs(specs, json_col="text")
    out = vj(docs_batch([good, bad, unknown])).to_pylist()
    by_eid = {}
    for r in out:
        by_eid.setdefault(r["event_id"], []).append(
            (r["field"], r["error_type"], r["expected"], r["actual"], r["status"])
        )
    assert by_eid["c0:0"] == [(None, None, None, None, "valid")]
    got_bad = {t[:4] for t in by_eid["c1:1"]}
    assert ("currency", "length", "3", "4") in got_bad
    assert ("value", "type", "number", "string") in got_bad
    assert ("items[0].item_id", "type", "string", "number") in got_bad
    assert ("items[0].price", "type", "number", "string") in got_bad
    assert ("items[1].item_id", "missing", "field present", "field missing") in got_bad
    assert ("items[1].price", "missing", "field present", "field missing") in got_bad
    assert by_eid["c2:2"][0][:2] == (None, "schema_not_found")


def test_json_payload_envelope_unwrap():
    specs = {"purchase": load_spec(PURCHASE_SPEC, event_name="purchase")}
    doc = {"event_name": "purchase", "currency": "USD", "value": 1, "items": []}
    vj = ValidateJsonDocs(specs, json_col="text", data_path="data")
    out = vj(docs_batch([doc], envelope=True)).to_pylist()
    assert out[0]["status"] == "valid"
    # missing envelope -> invalid_request (index.js:32-37)
    out2 = vj(docs_batch([doc], envelope=False)).to_pylist()
    assert out2[0]["error_type"] == "invalid_request"
