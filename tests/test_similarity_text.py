"""ANN search (brute-force exactness vs numpy oracle; IVF recall) and text
stages over the documents table."""

import numpy as np
import pandas as pd
import pytest

from events_validator_ray.stages.similarity import ann_topk, ann_topk_ivf
from events_validator_ray.stages.text import (
    fingerprints,
    lang_id,
    quality_scores,
    token_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF_DIR}/documents.parquet")


def numpy_topk(df: pd.DataFrame, query_ids, k):
    E = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    E = E / np.linalg.norm(E, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy()
    pos = {v: i for i, v in enumerate(ids)}
    out = {}
    for q in query_ids:
        sims = E @ E[pos[q]]
        order = sorted(zip(-sims, ids))[:k]
        out[q] = [(int(i), round(-s, 6)) for s, i in order]
    return out


def test_ann_topk_matches_numpy(emb_ds):
    queries = [0, 1, 2, 3]
    k = 5
    got = ann_topk(emb_ds, queries, k=k)
    want = numpy_topk(emb_ds.to_pandas(), queries, k)
    for q in queries:
        rows = got[got.query_id == q].sort_values("rank")
        got_ids = list(rows.vec_id)
        want_ids = [i for i, _ in want[q]]
        assert got_ids == want_ids, f"query {q}"
        assert got_ids[0] == q  # self is most similar
        np.testing.assert_allclose(rows.score, [s for _, s in want[q]], atol=1e-5)


def test_ann_ivf_recall(emb_ds):
    queries = [0, 5, 10]
    k = 5
    exact = ann_topk(emb_ds, queries, k=k)
    approx = ann_topk_ivf(emb_ds, queries, k=k, n_centroids=16, nprobe=8)
    # recall@k >= 0.6 with half the buckets probed on random data
    hits = 0
    for q in queries:
        e = set(exact[exact.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        hits += len(e & a)
    assert hits / (len(queries) * k) >= 0.6


def test_token_counts(docs_ds):
    got = token_counts(docs_ds).to_pandas().set_index("doc_id")["n_tokens"]
    df = docs_ds.to_pandas()
    import re

    want = df.set_index("doc_id")["text"].map(
        lambda t: len(re.findall(r"[a-z0-9]+", t.lower()))
    )
    pd.testing.assert_series_equal(got.sort_index(), want.sort_index(), check_names=False)


def test_quality_scores(docs_ds):
    q = quality_scores(docs_ds).to_pandas()
    assert {"n_chars", "n_tokens", "punct_ratio", "stop_ratio", "keep"} <= set(q.columns)
    assert (q.n_chars > 0).all()
    assert q.keep.dtype == bool


def test_lang_id_and_fingerprints(docs_ds):
    l = lang_id(docs_ds).to_pandas()
    assert set(l.lang_pred) <= {"en", "es", "de", "fr", "unknown"}
    f = fingerprints(docs_ds).to_pandas()
    assert (f.fingerprint.map(len) > 0).all()
    # fingerprints deterministic
    f2 = fingerprints(docs_ds).to_pandas()
    m = f.sort_values("doc_id").reset_index(drop=True)
    m2 = f2.sort_values("doc_id").reset_index(drop=True)
    assert (m.fingerprint.map(tuple) == m2.fingerprint.map(tuple)).all()


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    from events_validator_ray.stages.multimodal import (
        decode_images,
        synthetic_media,
        SampleFrames,
    )

    media = rd.from_arrow(synthetic_media(48))
    feats = decode_images(media, feature_dim=32, concurrency=2).take_all()
    assert len(feats) == 16  # every 3rd is an image
    assert all(len(r["features"]) == 32 for r in feats)
    # deterministic across runs
    feats2 = decode_images(rd.from_arrow(synthetic_media(48)), feature_dim=32, concurrency=2).take_all()
    a = {r["media_id"]: tuple(r["features"]) for r in feats}
    b = {r["media_id"]: tuple(r["features"]) for r in feats2}
    assert a == b
    frames = (
        media.filter(expr="kind == 'video'")
        .map_batches(SampleFrames(n_frames=3), batch_format="pyarrow", batch_size=8)
        .take_all()
    )
    assert len(frames) == 16 * 3

    from events_validator_ray.stages.multimodal import extract_audio

    audio = extract_audio(rd.from_arrow(synthetic_media(48)), feature_dim=16).take_all()
    assert len(audio) == 16  # every 3rd is audio
    assert all(len(r["features"]) == 16 and r["sample_rate"] == 16_000 for r in audio)
    audio2 = extract_audio(rd.from_arrow(synthetic_media(48)), feature_dim=16).take_all()
    assert {r["media_id"]: tuple(r["features"]) for r in audio} == {
        r["media_id"]: tuple(r["features"]) for r in audio2
    }


def test_fingerprint_vectorized_equals_rowwise_reference():
    """The batch-vectorized winnowing (global sliding min + boundary masks +
    dictionary-encoded token hashing) must equal a straightforward per-row
    implementation of the same gram identity (polynomial token-hash combine),
    including empty/null/short docs."""
    import re

    import pyarrow as pa

    from events_validator_ray.stages.sketches import hash64
    from events_validator_ray.stages.text import TOKEN_PATTERN, Fingerprint

    P = np.uint64(0x100000001B3)
    word_re = re.compile(TOKEN_PATTERN)

    def ref_one(t, k=5, window=8):
        toks = word_re.findall((t or "").lower())
        if not toks:
            return []
        th = hash64(np.array(toks, dtype=object)).astype(np.uint64)
        with np.errstate(over="ignore"):
            if len(toks) < k:
                acc = th[0]
                for v in th[1:]:
                    acc = acc * P ^ v
                grams = np.array([acc], dtype=np.uint64)
            else:
                grams = np.zeros(len(toks) - k + 1, dtype=np.uint64)
                for i in range(len(grams)):
                    acc = th[i]
                    for v in th[i + 1 : i + k]:
                        acc = acc * P ^ v
                    grams[i] = acc
        if grams.size <= window:
            return np.unique(grams.min(keepdims=True)).tolist()
        wv = np.lib.stride_tricks.sliding_window_view(grams, window)
        return np.unique(wv.min(axis=1)).tolist()

    rng = np.random.default_rng(5)
    vocab = np.array([f"tok{i}" for i in range(120)])
    texts = []
    for i in range(800):
        n = int(rng.integers(0, 40))
        texts.append(" ".join(rng.choice(vocab, size=n)) if n else ("" if i % 3 else None))
    texts[7] = "  "
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts))), "text": pa.array(texts, type=pa.string())}
    )
    got = Fingerprint()(tbl)["fingerprint"].tolist()
    want = [ref_one(t) for t in texts]
    assert got == want
