"""Spec lint, valid-field logging, and the CLI runner."""

import json
import subprocess
import sys

import pyarrow as pa
import pytest

from events_validator_ray.functions.lint import spec_lint
from events_validator_ray.spec import load_spec, transcript_spec
from events_validator_ray.stages.validate import ValidateBatch


def test_spec_lint_clean():
    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    findings = spec_lint(transcript_spec(), schema)
    assert not any(f.severity == "critical" for f in findings)


def test_spec_lint_findings():
    spec = load_spec(
        {
            "a": {"type": "number"},
            "gone": {"type": "string"},
            "maybe": {"type": "string", "optional": True},
            "n": {"type": "number", "length": 3},
        }
    )
    schema = pa.schema([("a", pa.string()), ("n", pa.int64()), ("extra", pa.bool_())])
    by_code = {}
    for f in spec_lint(spec, schema):
        by_code.setdefault(f.code, []).append(f)
    assert by_code["type_conflict"][0].field == "a"
    assert by_code["type_conflict"][0].severity == "critical"
    missing = {f.field: f.severity for f in by_code["missing_column"]}
    assert missing == {"gone": "critical", "maybe": "minor"}
    assert by_code["length_on_scalar"][0].field == "n"
    assert by_code["unvalidated_column"][0].field == "extra"


def test_spec_lint_nested_recursion():
    """spec_lint must descend into rule.nested: a child type conflict inside a
    list<struct> or struct column is exactly the 'every non-null row fails'
    class the startup lint exists to pre-flight (VERDICT r4 / review finding)."""
    spec = load_spec(
        {
            "items": {
                "type": "array",
                "nestedSchema": {
                    "price_cents": {"type": "string"},  # conflict: col is int64
                    "sku": {"type": "string"},  # missing from struct
                    "note": {"type": "string", "optional": True},  # missing, optional
                },
            },
            "meta": {
                "type": "object",
                "nestedSchema": {"source": {"type": "number"}},  # conflict: col is string
            },
            "tags": {
                "type": "array",
                # scalar items walk wrapped {'': item}: '' resolves, 'k' never can
                "nestedSchema": {"": {"type": "number"}, "k": {"type": "string"}},
            },
            "payload": {
                # nested over a plain string column = JSON mode: statically unknown
                "type": "object",
                "nestedSchema": {"x": {"type": "number"}},
            },
        }
    )
    schema = pa.schema(
        [
            ("items", pa.list_(pa.struct([("price_cents", pa.int64())]))),
            ("meta", pa.struct([("source", pa.string())])),
            ("tags", pa.list_(pa.string())),
            ("payload", pa.string()),
        ]
    )
    by_code = {}
    for f in spec_lint(spec, schema):
        by_code.setdefault(f.code, []).append(f)
    conflicts = {f.field: f.severity for f in by_code["type_conflict"]}
    # 'payload' top-level object-vs-string conflict is expected; JSON-mode
    # children (payload.x) must NOT be linted — their shape is runtime-only
    assert conflicts == {
        "items[].price_cents": "critical",
        "meta.source": "critical",
        "tags[].": "critical",  # '' rule type 'number' vs string items
        "payload": "critical",
    }
    missing = {f.field: f.severity for f in by_code["missing_column"]}
    assert missing["items[].sku"] == "critical"
    assert missing["items[].note"] == "minor"
    assert missing["tags[].k"] == "critical"  # scalar items: key can never exist
    assert not any(f.field.startswith("payload.") for fs in by_code.values() for f in fs)


def test_spec_lint_dead_nested_schema():
    """A nestedSchema whose rule never passes the runtime compile gate
    (missing/mismatched container type) is silently dead at runtime — the
    lint must flag it; JSON-payload mode (string column) stays exempt."""
    spec = load_spec(
        {
            # forgot "type": "array" over a list<struct> column
            "items": {"nestedSchema": {"price_cents": {"type": "number"}}},
            # container type mismatches the column shape
            "meta": {"type": "array", "nestedSchema": {"source": {"type": "string"}}},
            # JSON mode: nested over a string column is legitimate
            "payload": {"type": "object", "nestedSchema": {"x": {"type": "number"}}},
        }
    )
    schema = pa.schema(
        [
            ("items", pa.list_(pa.struct([("price_cents", pa.int64())]))),
            ("meta", pa.struct([("source", pa.string())])),
            ("payload", pa.string()),
        ]
    )
    by_code = {}
    for f in spec_lint(spec, schema):
        by_code.setdefault(f.code, []).append(f)
    ignored = {f.field for f in by_code["nested_ignored"]}
    assert ignored == {"items", "meta"}
    assert all(f.severity == "minor" for f in by_code["nested_ignored"])
    # 'meta' also gets the critical array-vs-object type_conflict
    assert any(f.field == "meta" for f in by_code["type_conflict"])


def test_valid_field_rows():
    spec = load_spec(
        {"a": {"type": "string"}, "b": {"type": "number"}, "c": {"type": "string", "optional": True}}
    )
    batch = pa.table(
        {
            "conv_id": pa.array(["c1", "c2", "c3"]),
            "turn_idx": pa.array([0, 1, 2]),
            "a": pa.array(["x", "", None]),
            "b": pa.array([1, 2, None], pa.int64()),
            "c": pa.array(["y", None, "z"]),
        }
    )
    out = ValidateBatch(spec, log_valid=False, log_valid_fields=True)(batch)
    vf = out.filter(pa.compute.equal(out["status"], "valid")).to_pylist()
    got = {(r["event_id"], r["field"]): r["value"] for r in vf}
    # a passes only on row 0; b on rows 0,1; c on rows 0,2
    assert set(got) == {
        ("c1:0", "a"),
        ("c1:0", "b"),
        ("c2:1", "b"),
        ("c1:0", "c"),
        ("c3:2", "c"),
    }
    assert got[("c1:0", "a")] == '"string"'  # JSON.stringify(type)
    assert got[("c1:0", "b")] == '"number"'


def test_runner_cli(tmp_path):
    from events_validator_ray.sources.transcripts import ensure_transcripts

    tdir = ensure_transcripts(0.001)
    out = tmp_path / "out"
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "events_validator_ray.runner",
            "--input",
            tdir,
            "--out",
            str(out),
            "--files-per-partition",
            "4",
            "--num-cpus",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["executed"] >= 1
    assert (out / "manifest.jsonl").exists()


def test_runner_lint_only(tmp_path):
    from events_validator_ray.sources.transcripts import ensure_transcripts

    tdir = ensure_transcripts(0.001)
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "events_validator_ray.runner",
            "--input",
            tdir,
            "--out",
            str(tmp_path / "o"),
            "--lint-only",
            "--num-cpus",
            "2",
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert res.returncode == 0, res.stderr[-2000:]


def test_validate_batch_actor_mode(ray_session):
    """Class + fn_constructor_kwargs + concurrency = actor-pool mode (the
    stateful-stage shape documented in SCALE.md)."""
    import ray.data as rd

    from events_validator_ray.sources.transcripts import ensure_transcripts
    from events_validator_ray.spec import transcript_spec

    tdir = ensure_transcripts(0.001)
    out = rd.read_parquet(tdir).map_batches(
        ValidateBatch,
        fn_constructor_kwargs={"spec": transcript_spec(), "log_valid": False},
        batch_format="pyarrow",
        concurrency=2,
    )
    n_actor = out.count()
    out2 = rd.read_parquet(tdir).map_batches(
        ValidateBatch(transcript_spec(), log_valid=False), batch_format="pyarrow"
    )
    assert n_actor == out2.count() > 100


def test_runner_curate_cli(tmp_path):
    """`--curate` runs the training-data curation pipeline end to end from
    the CLI (own Ray session) and prints the per-stage counts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    words = [f"word{i}" for i in range(80)]
    docs = [
        " ".join(rng.choice(words, size=40).tolist()) + f" the of and to a in mark{i}"
        for i in range(30)
    ]
    docs.append(docs[0])   # exact dup
    docs.append("short")   # quality drop
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()), "text": pa.array(docs)}),
        str(d / "p.parquet"),
    )
    out = tmp_path / "out"
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "events_validator_ray.runner",
            "--input",
            str(d),
            "--out",
            str(out),
            "--curate",
            "--num-cpus",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["n_input"] == 32
    assert summary["n_after_quality"] == 31  # 'short' dropped
    assert summary["n_after_exact"] == 30  # exact dup dropped
    assert (out / "manifest.jsonl").exists()


def test_runner_pairs_cli(tmp_path):
    """--pairs exports turn pairs as partitioned parquet with a resumable
    summary marker (second invocation skips)."""
    from events_validator_ray.sources.transcripts import ensure_transcripts

    tdir = ensure_transcripts(0.001)
    out = tmp_path / "out"
    out.mkdir()
    cmd = [
        sys.executable, "-m", "events_validator_ray.runner",
        "--pairs", "--input", tdir, "--out", str(out), "--num-cpus", "4",
    ]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["skipped"] is False and summary["n_pairs"] > 0
    assert (out / "pairs").exists()
    res2 = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert res2.returncode == 0, res2.stderr[-2000:]
    summary2 = json.loads(res2.stdout.strip().splitlines()[-1])
    assert summary2["skipped"] is True and summary2["n_pairs"] == summary["n_pairs"]


def test_runner_diff_cli(tmp_path):
    """--diff classifies conversations between two snapshots and writes the
    status table + summary counts."""
    import pyarrow.parquet as pq

    from events_validator_ray.sources.transcripts import ensure_transcripts

    old_dir = ensure_transcripts(0.001)
    # NEW snapshot: drop one conversation, add one, keep the rest verbatim.
    # Built from the FULL corpus (the generator globally permutes rows before
    # sharding, so a conversation's turns span shards — editing one shard
    # would leave partial conversations behind and misclassify the diff).
    files = sorted(__import__("glob").glob(f"{old_dir}/*.parquet"))
    import pandas as pd
    import pyarrow as pa

    df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
    convs = sorted(df["conv_id"].dropna().unique())
    dropped, copied = convs[0], convs[1]
    new_rows = df[df["conv_id"] == copied].copy()
    new_rows["conv_id"] = new_rows["conv_id"] + "_brand_new"
    new_df = pd.concat([df[df["conv_id"] != dropped], new_rows], ignore_index=True)
    new_dir = tmp_path / "new_snap"
    new_dir.mkdir()
    pq.write_table(pa.Table.from_pandas(new_df, preserve_index=False),
                   str(new_dir / "part-0.parquet"))

    out = tmp_path / "out"
    out.mkdir()
    res = subprocess.run(
        [
            sys.executable, "-m", "events_validator_ray.runner",
            "--diff", "--input", str(new_dir), "--against", old_dir,
            "--out", str(out), "--num-cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["counts"]["added"] == 1
    assert summary["counts"]["removed"] == 1
    assert summary["counts"]["same"] >= 1
    assert (out / "diff").exists()

    # close the incremental loop: revalidate ONLY the added/changed convs
    # straight off the --diff output (the one added conv breaks the conv_id
    # regex, so it must be the only conversation producing violations)
    reval = tmp_path / "reval"
    res2 = subprocess.run(
        [
            sys.executable, "-m", "events_validator_ray.runner",
            "--input", str(new_dir), "--out", str(reval),
            "--only-convs", str(out / "diff"), "--num-cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert res2.returncode == 0, res2.stderr[-2000:]
    summary2 = json.loads(res2.stdout.strip().splitlines()[-1])
    assert summary2["executed"] > 0
    from events_validator_ray.pipelines.validate_pipeline import read_violations

    viols = (
        read_violations(str(reval)).filter(expr="status == 'error'").take_all()
    )
    convs = {r["event_id"].rsplit(":", 1)[0] for r in viols}
    assert convs == {copied + "_brand_new"}


def test_runner_drift_cli(tmp_path):
    """--drift writes both drift tables and reports the top cells; the
    parquet values must match the in-process stage functions exactly."""
    import pandas as pd

    from events_validator_ray.sources.transcripts import ensure_transcripts

    tdir = ensure_transcripts(0.001)
    out = tmp_path / "drift"
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "events_validator_ray.runner",
            "--drift",
            "--input",
            tdir,
            "--out",
            str(out),
            "--num-cpus",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["mode"] == "drift"
    ld = pd.read_parquet(out / "len_drift_days.parquet")
    td = pd.read_parquet(out / "transition_drift.parquet")
    assert summary["n_len_cells"] == len(ld) > 0
    assert summary["n_transition_cells"] == len(td) > 0
    assert (ld["chi_part_micro"] >= 0).all()
    assert set(td.columns) == {"from_role", "to_role", "n_obs", "chi_part_micro"}
    # top cell reported == max of the written table
    assert (
        summary["top_len_drift"][0]["chi_part_micro"]
        == ld["chi_part_micro"].max()
    )
