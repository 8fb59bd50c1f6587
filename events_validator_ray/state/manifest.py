"""Per-partition checkpoint manifest: lineage + metrics + resume-by-skip.

The reference has no checkpointing anywhere (SURVEY.md §4.1); this implements
the north rule's requirement: every partition writes a lineage record
(partition id, input files, input fingerprint, spec hash, row/violation
counts, output path, wall time) to an append-only JSONL manifest after its
sink completes; a restarted run skips partitions whose fingerprint still
matches. Output directories are written atomically (tmp dir + rename), so a
partition is either fully present or absent — combined with deterministic
event ids this makes retries idempotent (at-least-once write, exactly-once
effect).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from dataclasses import dataclass, field


@dataclass
class PartitionRecord:
    partition_id: str
    input_files: list[str]
    fingerprint: str
    spec_hash: str
    status: str = "pending"  # pending | done | failed
    n_rows: int = 0
    n_violations: int = 0
    n_valid: int = 0
    output_path: str | None = None
    wall_s: float = 0.0
    extra: dict = field(default_factory=dict)


def fingerprint_files(paths: list[str]) -> str:
    """Cheap input fingerprint: (path, size, mtime_ns) per file — detects
    changed/moved inputs without reading them."""
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()[:16]


class Manifest:
    """Append-only JSONL manifest; the last record per partition_id wins."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)
        self._cache: dict[str, PartitionRecord] | None = None

    def load(self) -> dict[str, PartitionRecord]:
        records: dict[str, PartitionRecord] = {}
        if not os.path.exists(self.path):
            return records
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    # a kill mid-append leaves ONE torn trailing line — the
                    # exact crash this manifest exists to survive. Earlier
                    # fsync'd records are intact and last-record-wins makes
                    # the dropped partial harmless (its partition re-runs);
                    # warn and skip instead of making resume impossible.
                    import warnings

                    warnings.warn(
                        f"manifest: skipping unparseable line in {self.path} "
                        "(torn append from a crashed run?)",
                        stacklevel=2,
                    )
                    continue
                records[d["partition_id"]] = PartitionRecord(**d)
        return records

    def append(self, rec: PartitionRecord) -> None:
        # A crash mid-append can leave a torn line with no trailing newline;
        # appending straight after it would merge the new record onto the
        # fragment and lose BOTH to the JSONDecodeError skip in load().
        # Terminate the torn line first so the new record stays parseable.
        needs_sep = False
        try:
            with open(self.path, "rb") as rf:
                rf.seek(-1, os.SEEK_END)
                needs_sep = rf.read(1) != b"\n"
        except OSError:
            pass  # missing or empty file — nothing to repair
        with open(self.path, "a") as f:
            if needs_sep:
                f.write("\n")
            f.write(json.dumps(dataclasses.asdict(rec)) + "\n")
            f.flush()
            os.fsync(f.fileno())
        if self._cache is not None:
            self._cache[rec.partition_id] = rec

    def completed(self, partition_id: str, fingerprint: str, spec_hash: str) -> PartitionRecord | None:
        """The record to skip on, iff done AND inputs/spec unchanged.
        Records are parsed ONCE per Manifest instance and kept in sync by
        append() — re-reading the whole JSONL per call made resume startup
        O(partitions²)."""
        if self._cache is None:
            self._cache = self.load()
        rec = self._cache.get(partition_id)
        if (
            rec
            and rec.status == "done"
            and rec.fingerprint == fingerprint
            and rec.spec_hash == spec_hash
            and (rec.output_path is None or os.path.exists(rec.output_path))
        ):
            return rec
        return None


def atomic_output_dir(final_dir: str):
    """Context manager: yields a tmp dir, renames to `final_dir` on success."""
    import contextlib
    import shutil
    import tempfile

    @contextlib.contextmanager
    def cm():
        parent = os.path.dirname(final_dir.rstrip("/"))
        os.makedirs(parent, exist_ok=True)
        tmp = tempfile.mkdtemp(dir=parent, prefix=".tmp_" + os.path.basename(final_dir) + "_")
        try:
            yield tmp
            if os.path.exists(final_dir):
                shutil.rmtree(final_dir)
            os.rename(tmp, final_dir)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    return cm()
