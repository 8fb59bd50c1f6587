"""Training-data curation pipeline: the composed end-to-end a 100 TB corpus
runs before pretraining — quality filter -> exact dedup -> near-dup dedup ->
clean partitioned parquet + stats manifest.

Stage shapes (all Ray-Data-native, documented partitioning assumptions):

1. quality  — `map_batches(QualityScore)` keep-flag (vectorized ratios);
              dropped docs counted per batch, never collected.
2. exact    — content-hash groupby -> min-id keepers (16 B/row shuffle);
              keeper ids broadcast back as a semi-join filter. The keeper
              set is bounded by DISTINCT surviving docs; at corpora where
              even that outgrows the object store, swap the broadcast for
              `joins.bucketed_hash_join` on doc_id (same output).
3. near-dup — MinHash-LSH clusters (`assembly='auto'`: driver union-find
              below the pair bound, distributed label propagation above);
              only cluster REPRESENTATIVES (min doc id) survive. The
              non-representative id set is bounded by near-duplicate docs.
4. sink     — partitioned parquet (atomic tmp+rename) + one manifest record
              with per-stage counts, resumable via input fingerprint.
"""

from __future__ import annotations

import glob as _glob
import os
import time

from ..state.manifest import Manifest, PartitionRecord, atomic_output_dir, fingerprint_files


def curate_documents(
    input_path: str,
    out_dir: str,
    col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 50,
    max_chars: int = 100_000,
    min_stop_ratio: float = 0.05,
    near_dup_threshold: float = 0.8,
    resume: bool = True,
) -> dict:
    """Run the curation pipeline; returns a summary dict with per-stage
    counts. Idempotent: a completed run with matching input fingerprint is
    skipped wholesale."""
    import ray
    import ray.data as rd

    from ..stages.dedup import exact_dedup, minhash_lsh_dedup
    from ..stages.text import QualityScore

    if os.path.isdir(input_path):
        files = sorted(_glob.glob(os.path.join(input_path, "*.parquet")))
    else:  # explicit file or glob
        files = sorted(_glob.glob(input_path))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")
    manifest = Manifest(out_dir)
    fp = fingerprint_files(files)
    done = manifest.completed("curate", fp, "curate-v1") if resume else None
    if done:
        return {"skipped": True, **done.extra, "output_path": done.output_path}

    t0 = time.time()
    ds = rd.read_parquet(files)
    n_input = ds.count()

    # ---- stage 1: quality keep-flag, joined back by id (broadcast set)
    q = QualityScore(col, min_chars=min_chars, max_chars=max_chars, min_stop_ratio=min_stop_ratio)
    kept_ids = (
        ds.map_batches(q, batch_format="pyarrow")
        .filter(expr="keep == True")
        .select_columns([id_col])
    )
    keep_set = frozenset(r[id_col] for r in kept_ids.take_all())  # bounded by survivors
    n_quality = len(keep_set)
    keep_ref = ray.put(keep_set)

    def keep_quality(df):
        keys = keep_ref
        if isinstance(keys, ray.ObjectRef):
            keys = ray.get(keys)
        return df[df[id_col].isin(keys)]

    survivors = ds.map_batches(keep_quality, batch_format="pandas")

    # ---- stage 2: exact dedup keepers
    exact_ids = frozenset(r[id_col] for r in exact_dedup(survivors, col, id_col).take_all())
    n_exact = len(exact_ids)
    exact_ref = ray.put(exact_ids)

    def keep_exact(df):
        keys = exact_ref
        if isinstance(keys, ray.ObjectRef):
            keys = ray.get(keys)
        return df[df[id_col].isin(keys)]

    survivors = survivors.map_batches(keep_exact, batch_format="pandas")

    # ---- stage 3: near-dup clusters -> drop non-representatives
    clusters = minhash_lsh_dedup(
        survivors, col=col, id_col=id_col, threshold=near_dup_threshold, assembly="auto"
    )
    drop = frozenset(
        int(d) if hasattr(d, "item") else d
        for d, c in zip(clusters[id_col], clusters["cluster"])
        if d != c
    )  # bounded by near-duplicate docs
    n_near_dropped = len(drop)
    drop_ref = ray.put(drop)

    def drop_near(df):
        keys = drop_ref
        if isinstance(keys, ray.ObjectRef):
            keys = ray.get(keys)
        return df[~df[id_col].isin(keys)]

    clean = survivors.map_batches(drop_near, batch_format="pandas")

    # ---- sink
    final_dir = os.path.join(out_dir, "clean")
    with atomic_output_dir(final_dir) as tmp:
        clean.write_parquet(tmp)
    n_out = rd.read_parquet(final_dir).count()
    counts = {
        "n_input": n_input,
        "n_after_quality": n_quality,
        "n_after_exact": n_exact,
        "n_near_dup_dropped": n_near_dropped,
        "n_output": n_out,
    }
    manifest.append(
        PartitionRecord(
            partition_id="curate",
            input_files=files,
            fingerprint=fp,
            spec_hash="curate-v1",
            status="done",
            n_rows=n_input,
            n_valid=n_out,
            output_path=final_dir,
            wall_s=round(time.time() - t0, 3),
            extra=counts,
        )
    )
    return {"skipped": False, "output_path": final_dir, **counts}
