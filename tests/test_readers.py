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


def test_spec_writer_roundtrip(tmp_path):
    """S8: save_spec_dir -> reload -> identical spec_hash (the schema upload
    analog of gcp.py:62-90); update_repo_usage maintains usedInSchemas."""
    from events_validator_ray.sources.specs import (
        load_spec_dir,
        save_repo,
        save_spec_dir,
        update_repo_usage,
    )
    from events_validator_ray.spec import load_spec

    specs = load_spec_dir("specs")
    assert specs  # fixture dir has documents
    out_dir = str(tmp_path / "specs_out")
    save_spec_dir(specs, out_dir)
    reloaded = load_spec_dir(out_dir)
    assert set(reloaded) == set(specs)
    for name in specs:
        assert reloaded[name].spec_hash() == specs[name].spec_hash()

    # mutate -> write -> reload still faithful
    import json

    mutated = load_spec(
        {"a": {"type": "string", "regex": "^x"}, "b": {"type": "number", "optional": True}},
        event_name="mutant",
    )
    save_spec_dir({"mutant": mutated}, out_dir)
    again = load_spec_dir(out_dir)
    assert again["mutant"].spec_hash() == mutated.spec_hash()

    repo = {"a": {"usedInSchemas": ["other"]}, "c": {"usedInSchemas": ["mutant"]}}
    repo2 = update_repo_usage(repo, mutated)
    assert repo2["a"]["usedInSchemas"] == ["mutant", "other"]
    assert repo2["b"]["usedInSchemas"] == ["mutant"]
    assert repo2["c"]["usedInSchemas"] == []  # no longer used by this schema
    p = save_repo(repo2, str(tmp_path / "repo.json"))
    assert json.load(open(p)) == repo2


def test_schema_markdown_export(tmp_path):
    """S10 analog: the doc exporter renders the reference PDF's structure
    (header + parameter table + per-container nested-key tables) as Markdown."""
    from events_validator_ray.functions.export import (
        export_schema_markdown,
        export_spec_dir_markdown,
    )
    from events_validator_ray.spec import load_spec

    spec = load_spec(
        {
            "version": "1.2",
            "event_name": {"type": "string", "value": "purchase"},
            "currency": {"type": "string", "description": "ISO code | pipe"},
            "items": {
                "type": "array",
                "nestedSchema": {
                    "item_id": {"type": "string", "description": "sku"},
                    "qty": {"type": "number", "optional": True},
                },
            },
        },
        event_name="purchase",
    )
    md = export_schema_markdown(spec)
    assert "# Schema: purchase" in md
    assert "version: 1.2" in md
    assert "| **currency** | string | Yes |  | ISO code \\| pipe |" in md
    assert "## items: nested keys" in md
    assert "| **qty** | number | No |" in md
    paths = export_spec_dir_markdown({"purchase": spec}, str(tmp_path / "docs"))
    assert paths and open(paths[0]).read() == md


def test_schema_pdf_export_structural_roundtrip(tmp_path):
    """S10 real-PDF medium: the stdlib serializer must produce a structurally
    valid PDF — exact xref offsets, Flate content streams that inflate, and
    the document text reachable through Tj operators — including multi-page
    layout for large schemas."""
    import re
    import zlib

    from events_validator_ray.functions.export import (
        export_schema_pdf,
        export_spec_dir_pdf,
    )
    from events_validator_ray.spec import load_spec

    big = {f"field_{i:03d}": {"type": "string", "description": f"desc {i}"} for i in range(80)}
    big["items"] = {
        "type": "array",
        "nestedSchema": {"item_id": {"type": "string"}, "qty": {"type": "number", "optional": True}},
    }
    spec = load_spec(big, event_name="purchase (long) schema")
    pdf = export_schema_pdf(spec)

    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    # xref: every recorded offset must land exactly on "N 0 obj"
    xref_at = int(pdf.rstrip().rsplit(b"startxref", 1)[1].split(b"%%EOF")[0])
    assert pdf[xref_at : xref_at + 4] == b"xref"
    lines = pdf[xref_at:].split(b"\n")
    n_objs = int(lines[1].split()[1])
    offs = [int(l.split()[0]) for l in lines[3 : 2 + n_objs]]
    for i, off in enumerate(offs, start=1):
        assert pdf[off:].startswith(f"{i} 0 obj".encode()), i
    # content streams inflate and carry the text via Tj
    texts = []
    for m in re.finditer(rb"/FlateDecode >>\nstream\n(.*?)\nendstream", pdf, re.S):
        content = zlib.decompress(m.group(1)).decode("latin-1")
        texts += [t for t in re.findall(r"\((.*?)\) Tj", content)]
    joined = " ".join(texts)
    assert "Schema: purchase \\(long\\) schema" in joined  # escaped parens
    assert "field_079" in joined and "item_id" in joined and "nested keys" in joined
    # 81 fields at ~13pt leading cannot fit one letter page
    assert pdf.count(b"/Type /Page ") >= 2

    paths = export_spec_dir_pdf({"purchase": spec}, str(tmp_path / "pdf"))
    assert len(paths) == 1 and paths[0].endswith("purchase.pdf")
    with open(paths[0], "rb") as f:
        assert f.read(8) == b"%PDF-1.4"
