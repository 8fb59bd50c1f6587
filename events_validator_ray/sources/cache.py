"""Shared generate-and-cache machinery for the synthetic corpora.

Both synthetic sources (transcripts.py, nested.py) cache their generated
table as sharded Parquet under /tmp and must follow the same contract:
idempotent via a `_SUCCESS` marker, atomic via tmp-dir + rename, and benign
under concurrent callers (the rename loser deletes its tmp dir). Keeping the
machinery in one place stops the two copies drifting (they already had —
row_group_size existed only in transcripts).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Callable

import pyarrow as pa
import pyarrow.parquet as pq


def ensure_cached_table(
    build: Callable[[], pa.Table],
    out: str,
    prefix: str,
    *,
    n_files: int | None = None,
    shard_rows: int = 50_000,
    max_files: int = 64,
    row_group_size: int | None = None,
    marker_key: str = "n_rows",
) -> str:
    """Write ``build()`` as ``{out}/{prefix}_{i:04d}.parquet`` shards unless the
    ``_SUCCESS`` marker already exists. ``build`` is only called on a cache
    miss. Returns ``out``."""
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    table = build()
    if n_files is None:
        n_files = max(1, min(max_files, len(table) // shard_rows))
    root = os.path.dirname(out) or "."
    os.makedirs(root, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=root, prefix=f".{os.path.basename(out)}_")
    try:
        step = (len(table) + n_files - 1) // n_files
        kwargs = {} if row_group_size is None else {"row_group_size": row_group_size}
        for i in range(n_files):
            chunk = table.slice(i * step, step)
            if len(chunk) == 0:
                break
            pq.write_table(chunk, os.path.join(tmp, f"{prefix}_{i:04d}.parquet"), **kwargs)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write(f"{marker_key}={len(table)}\n")
        try:
            os.rename(tmp, out)
        except OSError:
            # another process won the race
            if not os.path.exists(marker):
                raise
            shutil.rmtree(tmp, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
