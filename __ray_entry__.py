"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01 and
compares it against the matching ``oracle_sql()[name]`` via DuckDB.

Neither this module nor the library calls ``ray.init()`` / ``ray.shutdown()``
— the caller owns the session (see tests/conftest.py and bench.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: read transcripts ->
    vectorized scalar validation -> conversation checks -> sketch profile ->
    partitioned violations parquet + checkpoint manifest; returns the
    violations Dataset."""
    import os

    from events_validator_ray.pipelines.validate_pipeline import (
        read_violations,
        run_validation,
    )
    from events_validator_ray.sources.transcripts import DEFAULT_ROOT, ensure_transcripts
    from events_validator_ray.spec import transcript_spec

    tdir = ensure_transcripts(0.001)
    # out dir versioned with the corpus root so stale partitions from older
    # generator versions can never mix into the returned dataset
    out_dir = f"/tmp/graft_entry_out_{os.path.basename(DEFAULT_ROOT)}"
    run_validation(tdir, out_dir, transcript_spec(), files_per_partition=8)
    return read_violations(out_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from events_validator_ray.pipelines.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    # generates/caches the sf0.01 transcript corpus so the SQL's
    # read_parquet() paths exist before DuckDB runs
    from events_validator_ray.pipelines.queries import build_oracles

    return build_oracles(sf=0.01)
