"""Schema-lifecycle control plane: dry-run rebuild, health report, smart
update with value preservation, batch apply (reference updater.py:95-261 at
HEAD — the reference's own test_updater.py is stale vs its HEAD: HEAD's
dry-run replaces the rule wholesale and keeps value preservation only in
update_schema_full; we match HEAD, per SURVEY §5.1)."""

import json
import os

from events_validator_ray.sources.specs import (
    apply_updates,
    check_spec_health,
    read_spec_doc,
    rebuild_dry_run,
    smart_update,
)


def _write(spec_dir, name, doc):
    os.makedirs(spec_dir, exist_ok=True)
    with open(os.path.join(spec_dir, f"{name}.json"), "w") as f:
        json.dump(doc, f)


def test_rebuild_dry_run_replaces_rule_head_semantics(tmp_path):
    d = str(tmp_path)
    _write(
        d,
        "s1",
        {
            "my_param": {
                "type": "string",
                "value": "initial",
                "description": "old desc",
                "regex": "old regex",
            }
        },
    )
    orig, new = rebuild_dry_run(
        d,
        "s1",
        "my_param",
        {"type": "string", "description": "new desc", "value": "repo default"},
    )
    # HEAD semantics: wholesale replacement by the canonicalized repo rule —
    # value comes from the repo, regex is never emitted
    assert new["my_param"]["description"] == "new desc"
    assert new["my_param"]["value"] == "repo default"
    assert "regex" not in new["my_param"]
    # deep copy: the original is untouched
    assert orig["my_param"]["description"] == "old desc"
    assert orig["my_param"]["regex"] == "old regex"
    # nothing written (dry run)
    assert read_spec_doc(d, "s1")["my_param"]["value"] == "initial"


def test_rebuild_dry_run_missing_and_absent_param(tmp_path):
    d = str(tmp_path)
    assert rebuild_dry_run(d, "nope", "p", {"type": "string"}) == ({}, {})
    _write(d, "s2", {"other": {"type": "string"}})
    orig, new = rebuild_dry_run(d, "s2", "p", {"type": "number"})
    assert new == orig  # param not in the document -> unchanged copy


def test_check_spec_health_critical_and_minor():
    repo = {
        "a": {"type": "string", "description": "da"},
        "b": {"type": "number", "description": "db", "value": 2},
        "c": {"type": "string", "description": "dc"},
        "arr": {
            "type": "array",
            "description": "darr",
            "nestedSchema": {"k": {"type": "string", "description": "dk"}},
        },
    }
    doc = {
        "event_name": {"value": "ev"},
        "version": {"value": 3},
        "a": {"type": "number", "description": "da"},  # type mismatch
        "b": {"type": "number", "description": "db", "value": "2"},  # "2"==2.0
        "c": {"type": "string", "description": "STALE"},  # desc drift
        "arr": {
            "type": "array",
            "description": "darr",
            "nestedSchema": {"k": {"type": "number", "description": "dk"}},
        },  # nested type drift
        "not_in_repo": {"type": "string"},
    }
    h = check_spec_health(doc, repo)
    assert h["critical"] == ["a"]
    assert sorted(h["minor"]) == ["arr", "c"]  # b's "2" vs 2 compares equal


def test_check_spec_health_any_empty_value_normalization():
    repo = {"p": {"type": "string", "description": "d"}}
    doc = {"p": {"type": "string", "description": "d", "value": "Any"}}
    assert check_spec_health(doc, repo) == {"critical": [], "minor": []}


def test_smart_update_preserves_values_on_type_match(tmp_path):
    d = str(tmp_path)
    _write(
        d,
        "ev1",
        {
            "event_name": {"value": "ev1"},
            "p": {"type": "string", "description": "old", "value": "CUSTOM"},
            "q": {"type": "string", "value": "stale-str"},
            "arr": {
                "type": "array",
                "nestedSchema": {
                    "k": {"type": "string", "value": "NKEEP"},
                    "j": {"type": "string", "value": "gone-type"},
                },
            },
        },
    )
    repo = {
        "p": {"type": "string", "description": "new desc", "value": "repo-default"},
        "q": {"type": "number", "value": 7},  # type changed -> repo wins
        "arr": {
            "type": "array",
            "nestedSchema": {
                "k": {"type": "string", "description": "dk"},
                "j": {"type": "number"},
            },
        },
    }
    ok, errs = smart_update(d, "ev1", repo)
    assert ok and errs == []
    doc = read_spec_doc(d, "ev1")
    assert doc["p"] == {
        "type": "string",
        "description": "new desc",
        "value": "CUSTOM",  # preserved: type matched
    }
    assert doc["q"]["type"] == "number" and doc["q"]["value"] == 7  # repo wins
    assert doc["arr"]["nestedSchema"]["k"]["value"] == "NKEEP"  # nested preserved
    assert "value" not in doc["arr"]["nestedSchema"]["j"]  # nested type changed
    assert doc["event_name"] == {"value": "ev1"}  # meta keys untouched


def test_smart_update_missing_schema(tmp_path):
    ok, errs = smart_update(str(tmp_path), "ghost", {"p": {"type": "string"}})
    assert not ok and errs == ["Schema not found"]


def test_sync_spec_dir_bulk(tmp_path):
    from events_validator_ray.sources.specs import sync_spec_dir

    d = str(tmp_path)
    repo = {"p": {"type": "string", "description": "fresh", "value": "dflt"}}
    _write(d, "clean", {"p": {"type": "string", "description": "fresh", "value": "dflt"}})
    _write(d, "stale", {"p": {"type": "string", "description": "old", "value": "KEEP"}})
    rep = sync_spec_dir(d, repo)
    assert rep["clean"]["health"] == {"critical": [], "minor": []}
    assert not rep["clean"]["updated"]
    assert rep["stale"]["health"]["minor"] == ["p"]
    assert rep["stale"]["updated"]
    doc = read_spec_doc(d, "stale")
    assert doc["p"]["description"] == "fresh"  # synced from repo
    assert doc["p"]["value"] == "KEEP"  # preserved: type matched
    # clean doc untouched on disk
    assert read_spec_doc(d, "clean")["p"]["value"] == "dflt"


def test_apply_updates_batch(tmp_path):
    d = str(tmp_path)
    n, errs = apply_updates(
        {"e1": {"p": {"type": "string"}}, "e2": {"q": {"type": "number"}}}, d
    )
    assert n == 2 and errs == []
    assert read_spec_doc(d, "e1")["p"]["type"] == "string"
    assert read_spec_doc(d, "e2")["q"]["type"] == "number"


def test_check_spec_health_non_dict_param_is_critical():
    """A hand-edited document holding a bare scalar where a param definition
    belongs is critical drift, not an AttributeError."""
    from events_validator_ray.sources.specs import check_spec_health

    repo = {"count": {"type": "number", "description": "d", "value": ""}}
    health = check_spec_health({"count": 5}, repo)
    assert health["critical"] == ["count"]


def test_sync_spec_dir_collects_per_document_errors(tmp_path):
    """One malformed spec file must not abort the bulk sweep — its error is
    collected and every other document still gets its report."""
    from events_validator_ray.sources.specs import read_spec_doc, sync_spec_dir

    d = str(tmp_path)
    repo = {"p": {"type": "string", "description": "fresh", "value": "dflt"}}
    _write(d, "good", {"p": {"type": "string", "description": "old", "value": "K"}})
    with open(f"{d}/broken.json", "w") as f:
        f.write("{not json")
    rep = sync_spec_dir(d, repo)
    assert rep["good"]["updated"] and rep["good"]["health"]["minor"] == ["p"]
    assert rep["broken"]["health"] is None and not rep["broken"]["updated"]
    assert "error" in rep["broken"]
    assert read_spec_doc(d, "good")["p"]["description"] == "fresh"


def test_sync_spec_dir_repairs_non_dict_param(tmp_path):
    """A drifted document holding a bare scalar where a param definition
    belongs must flow critical-drift -> smart_update REBUILD (repo
    definition, no value to preserve) instead of crashing the sweep with
    AttributeError and losing the computed health report."""
    from events_validator_ray.sources.specs import read_spec_doc, sync_spec_dir

    d = str(tmp_path)
    repo = {
        "count": {"type": "number", "description": "how many", "value": ""},
        "tags": {
            "type": "array",
            "nestedSchema": {"name": {"type": "string", "description": "n"}},
        },
    }
    _write(d, "drifted", {"count": 5, "tags": {"type": "array", "nestedSchema": {"name": "bare"}}})
    rep = sync_spec_dir(d, repo)
    assert "error" not in rep["drifted"]
    assert rep["drifted"]["health"]["critical"] == ["count"]
    assert rep["drifted"]["updated"]
    doc = read_spec_doc(d, "drifted")
    assert doc["count"] == {"type": "number", "description": "how many"}
    assert doc["tags"]["nestedSchema"]["name"]["type"] == "string"
