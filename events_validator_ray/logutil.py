"""Logging helpers for session owners (bench.py, runner CLI, test fixture).

The streaming executor warns "Operator produced a RefBundle with a different
schema ... new schema: ." whenever an AllToAll stage (groupby / sort) emits an
EMPTY output partition — i.e. whenever there are fewer groups than shuffle
partitions. A two-line pure-Ray repro (`from_pandas(...).repartition(24)
.groupby(k).aggregate(Count()).sort(k)`) fires the identical warning, so it is
a Ray-internal artifact of empty partitions, not an engine schema bug; results
are unaffected. We filter ONLY that exact message pattern so any real schema
divergence (two non-empty schemas differing) still surfaces.
"""

from __future__ import annotations

import logging

_PATTERN = "RefBundle with a different schema"
_EMPTY_MARKERS = ("new schema: .", "new schema: PandasBlockSchema(names=[]")


class _EmptyBundleFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        if _PATTERN not in msg:
            return True
        return not any(m in msg for m in _EMPTY_MARKERS)


def suppress_empty_shuffle_partition_warning() -> None:
    """Install the empty-partition RefBundle filter on Ray Data's executor
    logger (idempotent)."""
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    if not any(isinstance(f, _EmptyBundleFilter) for f in logger.filters):
        logger.addFilter(_EmptyBundleFilter())


_SCHEMA_HASH_PATTERN = "Failed to hash the schemas (for deduplication)"


class _SchemaHashFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        return _SCHEMA_HASH_PATTERN not in record.getMessage()


def suppress_schema_hash_warning() -> None:
    """Ray's `unify_schemas` tries `set(schemas)` as an early-exit
    optimization (transform_pyarrow.py:176-181); PandasBlockSchema objects
    aren't hashable, so it logs a warning and falls through to the full
    unification — results unaffected. Filter only that exact message."""
    logger = logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow")
    if not any(isinstance(f, _SchemaHashFilter) for f in logger.filters):
        logger.addFilter(_SchemaHashFilter())
