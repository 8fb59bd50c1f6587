"""The flagship end-to-end pipeline: read -> vectorized scalar validation ->
conversation checks -> sketch profile -> partitioned violations parquet +
checkpoint manifest.

Stage layout (all Ray-Data-native; raw Ray tasks are never needed):

1. scalar stage — per input-file partition: ``read_parquet(files)`` ->
   ``map_batches(ValidateBatch, batch_format='pyarrow', zero_copy_batch=True)``
   -> ``write_parquet(out/part_k)`` (atomic tmp+rename), one manifest record
   per partition. Embarrassingly parallel AND resumable at partition
   granularity.
2. conversation stage — one global ``groupby(conv_id)`` shuffle over the
   PROJECTED key columns (conv_id, turn_idx, ts, role — never `text`);
   written once, its own manifest record (resume skips it wholesale).
3. profile stage — mergeable sketches (stats/HLL/t-digest/cat-hist), partials
   merged to a JSON profile in the manifest directory; drift scored against a
   stored reference profile when provided.

Scale: partition granularity (`files_per_partition`) controls the resume
quantum; within a partition Ray's streaming executor pipelines
read->validate->write with backpressure. At 10^12 turns, one partition ≈ one
cluster-filling wave of blocks.
"""

from __future__ import annotations

import datetime as _dt
import glob as _glob
import hashlib as _hashlib
import json
import os
import pickle
import time

from ..spec import Spec
from ..stages.conversation import (
    conversation_violations,
    conversation_violations_auto,
    conversation_violations_salted,
)
from ..stages.sketches import drift_report, profile_table, sketch_dataset
from ..stages.validate import DEFAULT_RUN_TS, ValidateBatch
from ..state.manifest import (
    Manifest,
    PartitionRecord,
    atomic_output_dir,
    fingerprint_files,
)

DEFAULT_SKETCH_PLAN = {
    "conv_id": ("stats", "hll"),
    "turn_idx": ("stats", "tdigest"),
    "role": ("stats", "cathist"),
    "tool": ("cathist",),
    "ts": ("stats",),
}


def _partitions(files: list[str], files_per_partition: int) -> list[tuple[str, list[str]]]:
    files = sorted(files)
    out = []
    for i in range(0, len(files), files_per_partition):
        out.append((f"part_{i // files_per_partition:05d}", files[i : i + files_per_partition]))
    return out


def run_validation(
    input_path: str,
    out_dir: str,
    spec: Spec,
    run_ts: _dt.datetime = DEFAULT_RUN_TS,
    files_per_partition: int = 8,
    log_valid: bool = True,
    salted: bool | str = "auto",
    salt_chunk: int = 10_000,
    sketch_plan: dict | None = None,
    reference_profile: dict[str, dict[str, int]] | None = None,
    resume: bool = True,
    only_convs=None,
) -> dict:
    """Run the full validation pipeline; returns a summary dict. Safe to
    re-run after a kill: completed partitions (matching fingerprint + spec
    hash) are skipped.

    ``only_convs`` (set/list of conv_id strings) restricts BOTH planes to
    those conversations — the incremental-revalidation path downstream of
    ``changed_conversations`` / ``runner --diff``. The id set is part of
    the resume identity (folded into the spec hash), so a re-run with a
    different set never serves stale partitions. The set is broadcast once
    (ray.put) and applied as a map-side Arrow ``is_in`` filter — fine to
    ~10^7 ids on the driver; beyond that, pre-filter the corpus with
    ``stages.joins.bloom_semi_join`` instead."""
    import ray.data as rd

    files = sorted(_glob.glob(os.path.join(input_path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")
    manifest = Manifest(out_dir)
    spec_hash = spec.spec_hash()
    summary: dict = {"partitions": [], "skipped": 0, "executed": 0}

    # sweep half-written temp dirs/files left by a killed attempt — they must
    # never be readable as output (atomic rename means a partition is either
    # fully present or absent; this removes the "absent" side's debris)
    import shutil as _shutil

    for stale in _glob.glob(os.path.join(out_dir, "violations", ".tmp_*")):
        _shutil.rmtree(stale, ignore_errors=True)
    for stale in _glob.glob(os.path.join(out_dir, "profile_parts", "*.tmp")):
        try:
            os.remove(stale)
        except OSError:
            pass

    # ---- stage 1: scalar validation + sketch partials, per partition
    plan = {c: tuple(k) for c, k in (sketch_plan or DEFAULT_SKETCH_PLAN).items()}
    # the sketch PLAN is part of the resume identity: fold its hash into the
    # spec hash used by every stage-1/profile record, or a re-run with a
    # different plan would silently serve the OLD plan's sidecars/profile
    plan_hash = _hashlib.sha256(
        repr(sorted((c, tuple(k)) for c, k in plan.items())).encode()
    ).hexdigest()[:8]
    spec_hash = f"{spec_hash}+plan:{plan_hash}"
    conv_filter = None
    if only_convs is not None:
        from ..stages.joins import arrow_semi_filter

        conv_list = sorted({c for c in only_convs if c is not None})
        convs_hash = _hashlib.sha256("\x1f".join(conv_list).encode()).hexdigest()[:8]
        # the id set is part of the resume identity, like the sketch plan
        spec_hash = f"{spec_hash}+convs:{convs_hash}"

        import pyarrow as _pa
        import ray as _ray

        # broadcast ONCE — stage 1 filters every partition against this set
        convs_ref = _ray.put(_pa.array(conv_list, type=_pa.string()))

        # keep_nulls: NULL-conv_id rows are invisible to the snapshot diff
        # (no key to match), so the incremental pass must always revalidate
        # them — dropping them would silently skip their violations
        def conv_filter(ds):
            return arrow_semi_filter(ds, convs_ref, on="conv_id", keep_nulls=True)
    parts_dir = os.path.join(out_dir, "profile_parts")
    os.makedirs(parts_dir, exist_ok=True)
    parts = _partitions(files, files_per_partition)
    # reconcile ORPHANED final outputs: a re-run with fewer inputs or a
    # different files_per_partition leaves stale violations/part_* dirs that
    # the read-back plane would double-count — remove any final dir not in
    # the CURRENT partition set (tmp debris was swept above)
    current_ids = {pid for pid, _ in parts}
    for d in _glob.glob(os.path.join(out_dir, "violations", "part_*")):
        if os.path.basename(d) not in current_ids:
            _shutil.rmtree(d, ignore_errors=True)
    for p in _glob.glob(os.path.join(parts_dir, "part_*.pkl")):
        if os.path.basename(p).removesuffix(".pkl") not in current_ids:
            try:
                os.remove(p)
            except OSError:
                pass
    for part_id, part_files in parts:
        fp = fingerprint_files(part_files)
        done = manifest.completed(part_id, fp, spec_hash) if resume else None
        sidecar = os.path.join(parts_dir, f"{part_id}.pkl")
        if done and os.path.exists(sidecar):
            summary["skipped"] += 1
            summary["partitions"].append(done.partition_id)
            continue
        t0 = time.time()
        final_dir = os.path.join(out_dir, "violations", part_id)
        # ONE disk read per partition: materialize the partition's blocks in
        # the object store (partition-bounded — `files_per_partition` sets the
        # quantum; the store spills if needed) and feed validation, sketch
        # partials and counts from there instead of re-reading the files (3x
        # read amplification before).
        src = rd.read_parquet(part_files)
        if conv_filter is not None:
            src = conv_filter(src)
        src = src.materialize()
        n_rows = src.count()
        # mergeable sketch partials for THIS partition (persisted so a resumed
        # run merges without recomputing — SURVEY.md §7.4 item 4)
        part_sketches = sketch_dataset(src, plan)
        out = src.map_batches(
            ValidateBatch(spec, run_ts=run_ts, log_valid=log_valid),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        ).materialize()
        del src  # release the input blocks before writing the log table
        with atomic_output_dir(final_dir) as tmp:
            out.write_parquet(tmp)
        with open(sidecar + ".tmp", "wb") as f:
            pickle.dump(part_sketches, f)
        os.replace(sidecar + ".tmp", sidecar)
        # counts from the in-flight (materialized) log — never re-read the sink
        n_err = out.filter(expr="status == 'error'").count()
        n_valid = out.count() - n_err
        manifest.append(
            PartitionRecord(
                partition_id=part_id,
                input_files=part_files,
                fingerprint=fp,
                spec_hash=spec_hash,
                status="done",
                n_rows=n_rows,
                n_violations=n_err,
                n_valid=n_valid,
                output_path=final_dir,
                wall_s=round(time.time() - t0, 3),
                extra={"profile_part": sidecar},
            )
        )
        summary["executed"] += 1
        summary["partitions"].append(part_id)

    # ---- stage 2: conversation checks (one global shuffle over all inputs)
    conv_fp = fingerprint_files(files)
    conv_done = manifest.completed("conversation", conv_fp, spec_hash) if resume else None
    if conv_done:
        summary["skipped"] += 1
    else:
        t0 = time.time()
        final_dir = os.path.join(out_dir, "violations", "conversation")
        ds = rd.read_parquet(files)
        if conv_filter is not None:
            ds = conv_filter(ds)
        if salted == "auto":
            # heavy-hitter probe picks the salted path only under real skew
            conv = conversation_violations_auto(ds, spec, run_ts, chunk=salt_chunk)
        elif salted:
            conv = conversation_violations_salted(ds, spec, run_ts, chunk=salt_chunk)
        else:
            conv = conversation_violations(ds, spec, run_ts)
        conv = conv.materialize()  # small (violations only); count without re-reading
        with atomic_output_dir(final_dir) as tmp:
            conv.write_parquet(tmp)
        n_err = conv.count()
        manifest.append(
            PartitionRecord(
                partition_id="conversation",
                input_files=files,
                fingerprint=conv_fp,
                spec_hash=spec_hash,
                status="done",
                n_violations=n_err,
                output_path=final_dir,
                wall_s=round(time.time() - t0, 3),
            )
        )
        summary["executed"] += 1

    # ---- stage 3: profile = merge of the per-partition sketch sidecars
    prof_path = _merge_profile_stage(
        manifest,
        files,
        files_per_partition,
        parts_dir,
        out_dir,
        conv_fp,
        spec_hash,
        reference_profile,
        summary,
        resume,
    )

    summary["violations_dir"] = os.path.join(out_dir, "violations")
    summary["profile_path"] = prof_path
    summary["manifest_path"] = manifest.path
    return summary


def _merge_profile_stage(
    manifest: Manifest,
    files: list[str],
    files_per_partition: int,
    parts_dir: str,
    out_dir: str,
    fp: str,
    spec_hash: str,
    reference_profile,
    summary: dict,
    resume: bool,
) -> str:
    """Merge the per-partition sketch sidecars into profile.json (+ drift vs
    a reference) under one manifest record — shared by the full pipeline and
    the profile-only pass."""
    prof_done = manifest.completed("profile", fp, spec_hash) if resume else None
    prof_path = os.path.join(out_dir, "profile.json")
    if prof_done:
        summary["skipped"] += 1
        return prof_path
    t0 = time.time()
    sketches: dict = {}
    for part_id, _pf in _partitions(files, files_per_partition):
        sidecar = os.path.join(parts_dir, f"{part_id}.pkl")
        with open(sidecar, "rb") as f:
            part_sketches = pickle.load(f)
        for key, sk in part_sketches.items():
            if key in sketches:
                sketches[key].merge(sk)
            else:
                sketches[key] = sk
    prof = profile_table(sketches)
    payload = {"profile": prof.to_dict(orient="records")}
    payload["histograms"] = {
        c: sk.counts for (c, kind), sk in sketches.items() if kind == "cathist"
    }
    if reference_profile:
        dr = drift_report(sketches, reference_profile)
        payload["drift"] = dr.to_dict(orient="records")
    with open(prof_path + ".tmp", "w") as f:
        json.dump(payload, f, default=str)
    os.replace(prof_path + ".tmp", prof_path)
    manifest.append(
        PartitionRecord(
            partition_id="profile",
            input_files=files,
            fingerprint=fp,
            spec_hash=spec_hash,
            status="done",
            output_path=prof_path,
            wall_s=round(time.time() - t0, 3),
        )
    )
    summary["executed"] += 1
    return prof_path


def run_profile(
    input_path: str,
    out_dir: str,
    files_per_partition: int = 8,
    sketch_plan: dict | None = None,
    reference_profile: dict[str, dict[str, int]] | None = None,
    resume: bool = True,
) -> dict:
    """Profile-ONLY pass: per-partition mergeable sketch sidecars → merged
    profile.json (+ drift vs a reference), with manifest resume — no
    validation, no shuffle, one map-only read of the corpus.

    This is the cheap way to refresh the FULL-corpus drift profile after an
    incremental revalidation (`--only-convs` runs profile only the
    revalidated conversations; sketches merge but cannot subtract, so an
    exact full profile needs a pass over the corpus — this one costs a
    single projected scan). For corpora updated IN PLACE (new files added,
    few rewritten), the per-partition fingerprints make the refresh cost
    ∝ changed partitions: unchanged sidecars are reused by resume."""
    import ray.data as rd

    files = sorted(_glob.glob(os.path.join(input_path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")
    manifest = Manifest(out_dir)
    plan = {c: tuple(k) for c, k in (sketch_plan or DEFAULT_SKETCH_PLAN).items()}
    plan_hash = _hashlib.sha256(
        repr(sorted((c, tuple(k)) for c, k in plan.items())).encode()
    ).hexdigest()[:8]
    spec_hash = f"profile-only+plan:{plan_hash}"
    summary: dict = {"partitions": [], "skipped": 0, "executed": 0}

    parts_dir = os.path.join(out_dir, "profile_parts")
    os.makedirs(parts_dir, exist_ok=True)
    for stale in _glob.glob(os.path.join(parts_dir, "*.tmp")):
        try:
            os.remove(stale)
        except OSError:
            pass
    for part_id, part_files in _partitions(files, files_per_partition):
        fp = fingerprint_files(part_files)
        done = manifest.completed(part_id, fp, spec_hash) if resume else None
        sidecar = os.path.join(parts_dir, f"{part_id}.pkl")
        if done and os.path.exists(sidecar):
            summary["skipped"] += 1
            summary["partitions"].append(part_id)
            continue
        t0 = time.time()
        # projection to the planned columns happens inside sketch_dataset;
        # map-only (partial → bounded combine), nothing shuffles
        part_sketches = sketch_dataset(rd.read_parquet(part_files), plan)
        with open(sidecar + ".tmp", "wb") as f:
            pickle.dump(part_sketches, f)
        os.replace(sidecar + ".tmp", sidecar)
        manifest.append(
            PartitionRecord(
                partition_id=part_id,
                input_files=part_files,
                fingerprint=fp,
                spec_hash=spec_hash,
                status="done",
                output_path=sidecar,
                wall_s=round(time.time() - t0, 3),
            )
        )
        summary["executed"] += 1
        summary["partitions"].append(part_id)

    prof_path = _merge_profile_stage(
        manifest,
        files,
        files_per_partition,
        parts_dir,
        out_dir,
        fingerprint_files(files),
        spec_hash,
        reference_profile,
        summary,
        resume,
    )
    summary["profile_path"] = prof_path
    summary["manifest_path"] = manifest.path
    return summary


def read_violations(out_dir: str):
    # delegate to the documented S4 reader (sources/readers.py) so the
    # read-back plane has ONE implementation (date pushdown included)
    from ..sources.readers import read_violations_dir

    return read_violations_dir(os.path.join(out_dir, "violations"))


def read_complete_log(run_dir: str):
    """The run's COMPLETE violation log: ``violations_merged`` when the run
    was incremental (its ``violations/`` holds only the revalidated
    conversations), else ``violations/``. This is what the NEXT incremental
    round must use as its merge base — reading the partial ``violations/``
    of a prior incremental run would silently drop every conversation that
    round left untouched."""
    import ray.data as rd

    merged = os.path.join(run_dir, "violations_merged")
    if os.path.isdir(merged):
        return rd.read_parquet(merged)
    return read_violations(run_dir)


def merge_violations(
    base_dir: str,
    stale_convs,
    new_dir: str | None,
    out_path: str,
    drop_null_rows: bool | None = None,
) -> int:
    """Advance the violation log across an incremental revalidation: the
    merged view = the BASE run's rows for conversations the snapshot diff
    did NOT touch (status 'same'), plus ALL of the NEW incremental run's
    rows. This is the artifact the loop exists to maintain — equal, row for
    row, to a full revalidation of the new snapshot (the gold property
    tests/test_incremental_loop.py asserts), and the loop ITERATES: the base
    may itself be an incremental run (its merged log is read, via
    ``read_complete_log``).

    ``stale_convs`` = conv_ids with diff status added/changed/removed: their
    base rows are dropped (removed convs are gone; added/changed convs were
    re-validated into ``new_dir``). When a new run executed (``new_dir`` not
    None), base rows with a NULL event_id are also dropped — event_id is
    NULL iff conv_id was NULL (functions/kernels.py:make_event_id), and
    NULL-conv rows are revalidated unconditionally by ``only_convs`` and
    re-emitted.

    Scale shape: base rows stream through one broadcast anti-filter on the
    event_id conv prefix (the stale set is diff-sized — conversations, not
    turns); the count comes from the in-flight materialized blocks, never a
    re-read of the sink (object-store resident, spills if huge)."""
    from ..stages.joins import arrow_semi_filter
    from ..state.manifest import atomic_output_dir

    if drop_null_rows is None:
        # default: a new run revalidated (and re-emitted) the NULL-conv rows;
        # the runner's short-circuit path overrides this when the diff's
        # NULL_CONV_MARKER says the null rows were REMOVED from the snapshot
        drop_null_rows = new_dir is not None
    stale = sorted({c for c in stale_convs if c is not None})

    def conv_prefix(t):
        import pyarrow.compute as _pc

        return _pc.replace_substring_regex(
            t["event_id"], pattern=":[^:]*$", replacement=""
        )

    merged = arrow_semi_filter(
        read_complete_log(base_dir),
        stale,
        key_of=conv_prefix,
        anti=True,
        # NULL event_id == NULL conv_id (functions/kernels.py:make_event_id)
        keep_nulls=not drop_null_rows,
    )
    if new_dir is not None:
        merged = merged.union(read_violations(new_dir))
    merged = merged.materialize()
    n = merged.count()
    with atomic_output_dir(out_path) as tmp:
        merged.write_parquet(tmp)
    return n
