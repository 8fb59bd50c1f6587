"""events_validator_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch batch validation engine over Parquet transcript tables with the
query/data-processing capabilities of the reference `defuseddata/events-validator`
(see SURVEY.md), re-expressed Ray-Data-first:

- ``spec``        — the constraint rule language (JSON) + compiler
- ``oracle``      — row-at-a-time reference semantics (golden oracle; mirrors
                    validator_src/helpers/validationHelpers.js behavior)
- ``stages``      — vectorized map_batches / groupby stages (validate,
                    conversation checks, sketches, dedup, similarity, text,
                    multimodal)
- ``sources``     — readers + deterministic synthetic transcripts generator
- ``pipelines``   — end-to-end pipelines (validation run, reporting plane)
- ``state``       — checkpoint manifest for resumable runs

Nothing in this package calls ``ray.init()``; callers own the Ray session.
"""

__version__ = "0.1.0"

VIOLATION_COLUMNS = [
    # Mirrors the reference BigQuery log table schema
    # (reference: terraform_backend/src/bq_schema/bq_schema.json:1-63) —
    # 12 columns, all nullable strings except `timestamp`.
    "event_id",
    "field",
    "error_type",
    "expected",
    "actual",
    "timestamp",
    "source_event",
    "status",
    "event_name",
    "event_data",
    "value",
    "type",
]
