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
