"""End-to-end curation pipeline: quality filter -> exact dedup -> near-dup
dedup -> clean parquet, verified against a pandas reference and resumable."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm "
    "windowsill and the birds sing in the garden under a bright morning sun"
)


@pytest.fixture()
def corpus_dir(tmp_path):
    rng = np.random.default_rng(8)
    words = BASE.split()
    docs = []
    for i in range(60):
        perm = rng.permutation(words).tolist()
        docs.append(" ".join(perm) + f" marker{i}")
    docs.append(docs[0])          # exact dup -> 60
    docs.append(docs[1])          # exact dup -> 61
    near = docs[2].split(); near[5] = "changed"
    docs.append(" ".join(near))   # near dup of 2 -> 62
    docs.append("too short")      # quality drop -> 63
    docs.append("x " * 30)        # no stopwords -> low stop_ratio -> 64
    d = tmp_path / "docs"; d.mkdir()
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()), "text": pa.array(docs)})
    pq.write_table(tbl.slice(0, 33), str(d / "part0.parquet"))
    pq.write_table(tbl.slice(33), str(d / "part1.parquet"))
    return str(d), docs


def test_curate_end_to_end(ray_session, tmp_path, corpus_dir):
    import ray.data as rd

    from events_validator_ray.pipelines.curate import curate_documents

    input_dir, docs = corpus_dir
    out = str(tmp_path / "out")
    summary = curate_documents(input_dir, out, near_dup_threshold=0.7)
    assert summary["skipped"] is False
    assert summary["n_input"] == 65
    # quality drops 63 (short) and 64 (no stopwords)
    assert summary["n_after_quality"] == 63
    # exact dedup drops 60 and 61
    assert summary["n_after_exact"] == 61
    # near-dup drops 62 (cluster rep = 2)
    assert summary["n_near_dup_dropped"] == 1
    assert summary["n_output"] == 60
    kept = set(r["doc_id"] for r in rd.read_parquet(summary["output_path"]).take_all())
    assert kept == set(range(60))

    # resume: identical fingerprint AND parameters -> skipped wholesale
    again = curate_documents(input_dir, out, near_dup_threshold=0.7)
    assert again["skipped"] is True
    assert again["n_output"] == 60


def test_curate_resume_is_parameter_aware(ray_session, tmp_path, corpus_dir):
    """Changing a threshold must NOT hit the resume skip."""
    from events_validator_ray.pipelines.curate import curate_documents

    input_dir, _ = corpus_dir
    out = str(tmp_path / "out2")
    first = curate_documents(input_dir, out, near_dup_threshold=0.7)
    assert first["skipped"] is False
    stricter = curate_documents(input_dir, out, near_dup_threshold=0.99)
    assert stricter["skipped"] is False
    assert stricter["n_near_dup_dropped"] == 0  # 0.99 keeps the near dup
    again = curate_documents(input_dir, out, near_dup_threshold=0.99)
    assert again["skipped"] is True


def test_curate_dup_heavy_anti_join_path_matches_broadcast(ray_session, tmp_path):
    """Forcing the dedup plane's Dataset-label regime (distributed assembly,
    broadcast_max_labels=0), curate must route the near-dup drop through the
    bucketed anti-join and produce identical stage counts."""
    import os

    from events_validator_ray.pipelines.curate import curate_documents

    src = "/root/testdata/sf0.01/documents.parquet"
    a = curate_documents(src, os.path.join(tmp_path, "a"))
    b = curate_documents(
        src,
        os.path.join(tmp_path, "b"),
        dedup_assembly="distributed",
        broadcast_max_labels=0,
    )
    for k in ("n_input", "n_after_quality", "n_after_exact", "n_near_dup_dropped", "n_output"):
        assert a[k] == b[k], k
