"""Source readers: JSON event corpus ingestion with envelope unwrap."""

import json

import pytest

from events_validator_ray.sources.readers import read_json_events, read_transcripts
from events_validator_ray.sources.transcripts import ensure_transcripts


def test_read_json_events(ray_session, tmp_path):
    rows = [
        {"data": {"event_name": "purchase", "value": 12.5}},
        {"data": {"event_name": "login"}},
        {"wrong_envelope": {"event_name": "x"}},
        {"data": {"no_name": True}},
    ]
    p = tmp_path / "events.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    out = read_json_events(str(p)).take_all()  # row order not guaranteed
    names = sorted((r["event_name"] or "") for r in out)
    assert names == ["", "", "login", "purchase"]
    by_name = {r["event_name"]: r for r in out if r["event_name"]}
    assert json.loads(by_name["purchase"]["payload"]) == {
        "event_name": "purchase",
        "value": 12.5,
    }


def test_read_transcripts_pruned(ray_session):
    tdir = ensure_transcripts(0.001)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx"])
    assert set(ds.schema().names) == {"conv_id", "turn_idx"}
    assert ds.count() > 1000
