"""Partitioning invariance: violations must not depend on block layout
(SURVEY.md §5.2 property 3 — pass/fail invariant under repartitioning)."""

from collections import Counter

import pytest

from events_validator_ray.sources.transcripts import ensure_transcripts
from events_validator_ray.spec import transcript_spec
from events_validator_ray.stages.conversation import conversation_violations
from events_validator_ray.stages.validate import ValidateBatch

VCOLS = ["event_id", "field", "error_type", "expected", "actual"]


def _multiset(ds):
    return Counter(tuple(r[c] for c in VCOLS) for r in ds.take_all())


@pytest.mark.parametrize("blocks", [1, 7])
def test_scalar_invariant_under_repartition(ray_session, blocks):
    import ray.data as rd

    tdir = ensure_transcripts(0.001)
    spec = transcript_spec()
    base = rd.read_parquet(tdir).map_batches(
        ValidateBatch(spec, log_valid=False), batch_format="pyarrow", zero_copy_batch=True
    )
    repart = (
        rd.read_parquet(tdir)
        .repartition(blocks)
        .map_batches(
            ValidateBatch(spec, log_valid=False),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    assert _multiset(base) == _multiset(repart)


def test_conversation_invariant_under_repartition_and_buckets(ray_session):
    import ray.data as rd

    tdir = ensure_transcripts(0.001)
    spec = transcript_spec()
    a = conversation_violations(rd.read_parquet(tdir), spec, num_buckets=64)
    b = conversation_violations(
        rd.read_parquet(tdir).repartition(5, shuffle=True), spec, num_buckets=3
    )
    assert _multiset(a) == _multiset(b)


def test_skew_detection_and_auto(ray_session):
    import ray.data as rd

    from events_validator_ray.stages.conversation import (
        conversation_violations,
        conversation_violations_auto,
        detect_skew,
    )

    tdir = ensure_transcripts(0.001)
    ds = rd.read_parquet(tdir)
    probe = detect_skew(ds, sample_frac=0.5)
    # the generator plants one heavy conversation holding ~2% of all turns
    assert probe["max_share"] > 0.01
    assert probe["top"][0][0].startswith("conv_")
    spec = transcript_spec()
    auto = _multiset(conversation_violations_auto(ds, spec, skew_share_threshold=0.01))
    plain = _multiset(conversation_violations(rd.read_parquet(tdir), spec))
    assert auto == plain  # salted path chosen, identical rows


def test_salted_bounds_group_size(ray_session):
    """Structural skew guarantee: with salt chunk K, no phase-1 group spans
    more than K distinct turn values (verified from the summary rows)."""
    import ray.data as rd

    from events_validator_ray.spec import transcript_spec
    from events_validator_ray.stages.conversation import (
        BucketChecker,
        _project,
        _with_bucket,
        parse_summary_payload,
    )
    import pyarrow as pa
    import pyarrow.compute as pc

    K = 5
    tdir = ensure_transcripts(0.001)
    projected = _project(rd.read_parquet(tdir), transcript_spec())

    def add_salt(t: pa.Table) -> pa.Table:
        salt = pc.cast(
            pc.floor(pc.divide(pc.cast(t["turn_idx"], pa.float64()), K)), pa.int64()
        )
        return t.append_column("chunk", salt)

    phase1 = (
        _with_bucket(projected.map_batches(add_salt, batch_format="pyarrow"), 8, cols=("conv_id", "chunk"))
        .groupby("bucket")
        .map_groups(
            BucketChecker(
                transcript_spec(),
                check_min_zero=False,
                emit_summaries=True,
                group_cols=("conv_id", "chunk"),
            ),
            batch_format="pandas",
        )
    )
    sums = [
        parse_summary_payload(r["event_data"])
        for r in phase1.filter(expr="status != 'error'").take_all()
    ]
    assert sums
    assert all(s["max_turn"] - s["min_turn"] < K for s in sums)


def test_bucket_checker_equals_per_conversation_reference(ray_session):
    """Differential: the vectorized multi-conversation BucketChecker must
    reproduce the simple per-conversation ConversationChecker on randomized
    conversations (dups, gaps, ts disorder, null ts/roles)."""
    import datetime as dt

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from events_validator_ray.stages.conversation import (
        BucketChecker,
        ConversationChecker,
    )

    rng = np.random.default_rng(21)
    rows = []
    base = dt.datetime(2024, 1, 1)
    for c in range(60):
        conv = f"conv_{c:08d}"
        n = int(rng.integers(1, 15))
        turns = list(range(n))
        if rng.random() < 0.3 and n > 2:
            turns[rng.integers(1, n)] += int(rng.integers(2, 5))  # gap
        if rng.random() < 0.3:
            turns.append(turns[int(rng.integers(0, n))])  # dup
        if rng.random() < 0.2:
            turns = [t + 1 for t in turns]  # min != 0
        for i, t in enumerate(turns):
            ts = base + dt.timedelta(seconds=int(t) * 10 + int(rng.integers(0, 5)))
            if rng.random() < 0.1:
                ts = base - dt.timedelta(seconds=100)  # disorder
            if rng.random() < 0.05:
                ts = None
            role = rng.choice(["user", "assistant", "tool", None])
            rows.append((conv, t, role, ts))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    spec = transcript_spec()

    got = Counter()
    bc = BucketChecker(spec)
    for r in bc(df).to_pylist():
        got[(r["event_id"], r["field"], r["error_type"], r["expected"], r["actual"])] += 1

    want = Counter()
    cc = ConversationChecker(spec)
    for conv, g in df.groupby("conv_id"):
        tbl = pa.Table.from_pandas(
            g.assign(ts=pd.to_datetime(g["ts"])), preserve_index=False
        ).select(["conv_id", "turn_idx", "role", "ts"])
        tbl = tbl.set_column(
            tbl.schema.get_field_index("ts"), "ts", tbl["ts"].cast(pa.timestamp("us"))
        )
        for r in cc(tbl).to_pylist():
            want[(r["event_id"], r["field"], r["error_type"], r["expected"], r["actual"])] += 1

    assert got == want
