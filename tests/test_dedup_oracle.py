"""Oracle parity for the dedup SQL twins (round-3 item 3): the DuckDB
exact-Jaccard / exact-cosine + recursive-components twins must reproduce the
Ray cluster labels NON-trivially — on corpora with planted near-dups, exact
dups, short docs and empty docs — not just on the testdata corpus (where the
embedding query happens to have zero pairs).

Also asserts the recall-1 precondition the twins rely on: every exact-metric
pair above threshold is found by the banded LSH candidate generation on these
corpora.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from events_validator_ray.pipelines.queries import (
    embedding_components_oracle,
    minhash_components_oracle,
)
from events_validator_ray.stages.dedup import embedding_dedup, minhash_lsh_dedup

SF_DIR = "/root/testdata/sf0.01"


def _planted_docs() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i}" for i in range(300)])
    docs = [" ".join(rng.choice(vocab, size=40, replace=False)) for _ in range(60)]
    docs.append(docs[0])  # exact dup -> 60
    near = docs[1].split()
    near[3] = "changed"
    docs.append(" ".join(near))  # near dup of 1 -> 61
    near2 = docs[2].split()
    near2[0], near2[-1] = "x", "y"
    docs.append(" ".join(near2))  # near dup of 2 -> 62
    docs.append("")  # empty -> 63
    docs.append(None)  # null -> 64 (both zero-token: trivially identical)
    docs.append("only two")  # short doc (one all-token shingle) -> 65
    docs.append("only two")  # its exact dup -> 66
    docs.append("Only, TWO!")  # same tokens after lower/punct-strip -> 67
    return pd.DataFrame({"doc_id": range(len(docs)), "text": docs})


def _run_sql(view: str, path: str, sql: str) -> dict:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW {view} AS SELECT * FROM read_parquet('{path}')")
    df = con.execute(sql).df()
    id_col = [c for c in df.columns if c != "cluster"][0]
    return dict(zip(df[id_col].astype(int), df["cluster"].astype(int)))


def test_minhash_twin_parity_planted(ray_session, tmp_path):
    import ray.data as rd

    df = _planted_docs()
    path = os.path.join(tmp_path, "documents.parquet")
    pq.write_table(pa.Table.from_pandas(df), path)
    full = minhash_lsh_dedup(
        rd.read_parquet(path), threshold=0.8, include_singletons=True
    )
    got = {int(r["doc_id"]): int(r["cluster"]) for r in full.take_all()}
    want = _run_sql("documents", path, minhash_components_oracle())
    assert got == want
    # the planted structure actually clustered (non-trivial parity)
    assert want[60] == 0 and want[61] == 1 and want[62] == 2
    assert want[64] == 63  # two zero-token docs: union 0 -> J = 1
    assert want[66] == 65 and want[67] == 65  # short-doc all-token shingle


def test_embedding_twin_parity_planted(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(23)
    dim = 32
    vecs = rng.standard_normal((80, dim)).astype(np.float32)
    vecs[70] = vecs[0] + rng.standard_normal(dim).astype(np.float32) * 0.01
    vecs[71] = vecs[1]
    vecs[72] = vecs[1] * 3.0  # scaled copy: cosine exactly 1
    df = pd.DataFrame({"vec_id": range(80), "embedding": list(vecs)})
    path = os.path.join(tmp_path, "embeddings.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(df.vec_id, pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in df.embedding], pa.list_(pa.float32())
                ),
            }
        ),
        path,
    )
    full = embedding_dedup(
        rd.read_parquet(path), threshold=0.98, n_bits=8, bands=8, include_singletons=True
    )
    got = {int(r["vec_id"]): int(r["cluster"]) for r in full.take_all()}
    want = _run_sql("embeddings", path, embedding_components_oracle())
    assert got == want
    assert want[70] == 0 and want[71] == 1 and want[72] == 1
    # margin sanity: nothing sits near the 0.98 boundary (twin validity)
    En = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = (En.astype(np.float64) @ En.astype(np.float64).T)[
        np.triu_indices(len(vecs), 1)
    ]
    assert not ((sims > 0.9) & (sims < 0.9799)).any()


def test_minhash_candidate_recall_is_1_on_testdata(ray_session):
    """The twin's precondition on the driver corpus: banded-LSH candidates
    cover every exact-Jaccard >= 0.8 pair, and pairs keep a wide margin off
    the threshold (no engine-boundary flips)."""
    import itertools
    import re

    import ray.data as rd

    from events_validator_ray.stages.dedup import (
        MinHashParams,
        MinHashSignatures,
        _bucket_pairs,
    )

    doc = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    tok = re.compile(r"[a-z0-9]+")

    def shingles(t, n=3):
        ws = tok.findall((t or "").lower())
        if len(ws) >= n:
            return set(tuple(ws[i : i + n]) for i in range(len(ws) - n + 1))
        return {tuple(ws)} if ws else set()

    S = {int(d): shingles(t) for d, t in zip(doc.doc_id, doc.text)}
    exact, margin_ok = set(), True
    for i, j in itertools.combinations(sorted(S), 2):
        u = len(S[i] | S[j])
        jac = (len(S[i] & S[j]) / u) if u else 1.0
        if jac >= 0.8:
            exact.add((i, j))
        margin_ok &= not (0.5 < jac < 0.9)
    assert margin_ok  # planted pairs >= 0.9; background <= 0.5
    ds = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    sig = ds.map_batches(
        MinHashSignatures(MinHashParams(), "text", "doc_id", 3), batch_format="pyarrow"
    )
    cand = {(r["a"], r["b"]) for r in _bucket_pairs(sig, "doc_id").take_all()}
    assert exact <= cand  # recall 1 at the threshold


def test_jaccard_allpairs_join_matches_duckdb_and_fallback(ray_session, tmp_path):
    """The exact all-pairs n-gram Jaccard join must match the DuckDB twin on
    planted dups, and the bucketed-join size-attach fallback must equal the
    broadcast path."""
    import ray.data as rd

    from events_validator_ray.pipelines.queries import jaccard_ngram_pairs_oracle
    from events_validator_ray.stages.dedup import jaccard_allpairs_join

    path = os.path.join(tmp_path, "documents.parquet")
    pq.write_table(pa.Table.from_pandas(_planted_docs()), path)
    ds = rd.read_parquet(path)

    cols = ["a", "b", "inter_sh", "union_sh"]
    got = (
        jaccard_allpairs_join(ds, threshold_millis=500)
        .to_pandas()[cols]
        .astype("int64")
        .sort_values(cols)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    want = (
        con.execute(jaccard_ngram_pairs_oracle())
        .df()[cols]
        .astype("int64")
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert len(got) and got.equals(want)
    # planted near-dups must be found (docs 65-67 have <3 tokens -> zero
    # 3-gram shingles on BOTH engines, so they pair with nothing)
    pairs = set(zip(got["a"], got["b"]))
    assert {(0, 60), (1, 61), (2, 62)} <= pairs

    fallback = (
        jaccard_allpairs_join(ds, threshold_millis=500, broadcast_max_docs=0)
        .to_pandas()[cols]
        .astype("int64")
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert fallback.equals(got)
