"""Join hardening edge cases (round-2 ADVICE): dtype-drifted keys must still
co-bucket, and snowflake-scale int payloads must survive NA-padded unions and
left joins without a float64 round trip."""

import numpy as np
import pandas as pd

from events_validator_ray.stages.joins import asof_join, bucketed_hash_join

BIG = 2**61 + 12345  # not representable in float64 (would round)


def test_bucketed_join_float_key_block_still_matches(ray_session):
    """A key column arriving float64 in one side (int64-with-nulls round
    trip) must land in the same bucket as the int64 side: '5' == '5.0'."""
    import ray.data as rd

    left = pd.DataFrame({"k": np.array([1.0, 2.0, 5.0], dtype="float64"), "lv": [10, 20, 50]})
    right = pd.DataFrame({"k": np.array([1, 2, 5], dtype="int64"), "rv": [100, 200, 500]})
    got = (
        bucketed_hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k", num_buckets=8)
        .to_pandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    assert len(got) == 3
    assert list(got["rv"]) == [100, 200, 500]


def test_bucketed_left_join_preserves_big_ids(ray_session):
    """how='left' with missing matches must not degrade matched right-side
    int64 payloads through float64 (2^61-scale ids round-trip exactly)."""
    import ray.data as rd

    left = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    right = pd.DataFrame({"k": [1, 3], "big_id": [BIG, BIG + 7]})
    got = (
        bucketed_hash_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", num_buckets=4, how="left"
        )
        .to_pandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    assert len(got) == 3
    by_k = got.set_index("k")["big_id"]
    assert int(by_k[1]) == BIG and int(by_k[3]) == BIG + 7
    assert pd.isna(by_k[2])


def test_asof_join_preserves_big_ids(ray_session):
    """asof payload ids above 2^53 survive the tagged union + merge_asof."""
    import ray.data as rd

    left = pd.DataFrame({"u": [1, 1, 2], "t": np.array([5, 9, 5], dtype="int64")})
    right = pd.DataFrame(
        {"u": [1, 1], "t": np.array([4, 8], dtype="int64"), "rid": [BIG, BIG + 1]}
    )
    got = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), on="t", by="u", num_buckets=4)
        .to_pandas()
        .sort_values(["u", "t"])
        .reset_index(drop=True)
    )
    assert len(got) == 3
    assert int(got.loc[0, "rid"]) == BIG  # t=5 -> last right t<=5 is 4
    assert int(got.loc[1, "rid"]) == BIG + 1  # t=9 -> 8
    assert pd.isna(got.loc[2, "rid"])  # u=2 has no right rows


def test_bloom_filter_fp_rate_and_prefilter(ray_session):
    """BloomFilter: zero false negatives, bounded false positives; the
    prefilter pass of bloom_semi_join drops most non-members before the
    exact shuffle."""
    import ray.data as rd

    from events_validator_ray.stages.joins import BloomFilter, bloom_semi_join, build_bloom

    members = np.array([str(i) for i in range(5000)], dtype=object)
    absent = np.array([f"x{i}" for i in range(20000)], dtype=object)
    b = BloomFilter(n_bits_log2=17, k=4).add(members)
    assert b.contains(members).all()  # no false negatives, ever
    fp = b.contains(absent).mean()
    assert fp < 0.05  # 5k keys in 2^17 bits, k=4 -> ~0.2% expected

    # distributed build == local build
    keys_ds = rd.from_pandas(pd.DataFrame({"k": members})).repartition(4)
    db = build_bloom(keys_ds, "k", n_bits_log2=17, k=4)
    assert (db.bits == b.bits).all()

    # exact semi-join parity incl. FP removal
    left = pd.DataFrame({"k": list(members[:100]) + [f"x{i}" for i in range(400)], "v": range(500)})
    got = (
        bloom_semi_join(rd.from_pandas(left).repartition(3), keys_ds, on="k", n_bits_log2=17)
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    assert list(got["v"]) == list(range(100))


def test_stratified_sample_combiner_matches_global(ray_session):
    """stratified_sample over many small blocks equals the single-frame
    ROW_NUMBER semantics regardless of partitioning."""
    import ray.data as rd

    from events_validator_ray.stages.sampling import stratified_sample

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "cls": rng.integers(0, 7, 1000).astype(str),
            "id": rng.permutation(1000),
        }
    )
    got = (
        stratified_sample(rd.from_pandas(df).repartition(9), "cls", "id", 5)
        .to_pandas()
        .sort_values(["cls", "id"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["cls", "id"]).groupby("cls").head(5).sort_values(["cls", "id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mod_sample_negative_ids_match_sql(ray_session):
    """numpy fmod (C/SQL sign semantics) — negative ids select identically in
    the engine and DuckDB."""
    import duckdb
    import ray.data as rd

    from events_validator_ray.stages.sampling import mod_sample

    df = pd.DataFrame({"id": list(range(-25, 25))})
    got = sorted(
        r["id"] for r in mod_sample(rd.from_pandas(df), "id", 10, 3).take_all()
    )
    want = sorted(
        duckdb.sql("SELECT id FROM df WHERE id % 10 < 3").df()["id"].tolist()
    )
    assert got == want
    assert -9 in got  # -9 % 10 = -9 in SQL -> kept (numpy % would drop it)


def test_bloom_semi_join_empty_keys(ray_session):
    """Empty key set -> empty result with the LEFT side's schema (typed empty
    buckets; no schema flips)."""
    import ray.data as rd

    from events_validator_ray.stages.joins import bloom_semi_join

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]}))
    keys = rd.from_pandas(pd.DataFrame({"k": [99]}))
    out = bloom_semi_join(left, keys, on="k").to_pandas()
    # (a fully-empty Ray dataset legitimately reports no columns — the typed
    # empty-bucket guarantee is about per-bucket schema consistency, asserted
    # by the non-empty-case tests above)
    assert len(out) == 0


def test_quantile_threshold_filter_matches_sql(ray_session):
    import duckdb
    import ray.data as rd

    from events_validator_ray.stages.sampling import quantile_threshold_filter

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"id": range(500), "score": rng.integers(0, 80, 500)})
    got = sorted(
        r["id"]
        for r in quantile_threshold_filter(rd.from_pandas(df).repartition(5), "score", 0.9).take_all()
    )
    want = sorted(
        duckdb.sql(
            "SELECT id FROM df WHERE score >= (SELECT quantile_disc(score, 0.9) FROM df)"
        ).df()["id"]
    )
    assert got == want and 0 < len(got) < 500


def test_quantile_filter_nulls_and_empty_match_sql(ray_session):
    """quantile_disc ignores NULLs; empty/all-null input keeps zero rows
    (SQL: col >= NULL is never true)."""
    import duckdb
    import ray.data as rd

    from events_validator_ray.stages.sampling import quantile_threshold_filter

    df = pd.DataFrame(
        {"id": range(10), "score": [1.0, 2, 3, 4, 5, None, None, None, None, None]}
    )
    got = sorted(
        r["id"]
        for r in quantile_threshold_filter(rd.from_pandas(df).repartition(3), "score", 0.5).take_all()
    )
    want = sorted(
        duckdb.sql(
            "SELECT id FROM df WHERE score >= (SELECT quantile_disc(score, 0.5) FROM df)"
        ).df()["id"]
    )
    assert got == want == [2, 3, 4]
    allnull = pd.DataFrame({"id": [1, 2], "score": [None, None]})
    assert quantile_threshold_filter(rd.from_pandas(allnull), "score", 0.5).count() == 0


def test_quantile_filter_continuous_float_bounded_pull(ray_session):
    """The continuous-column path (per-row-distinct float scores — the real
    'top-X% by quality' case): exact vs DuckDB quantile_disc, with the driver
    pull bounded by the BIN COUNT per level plus one ≤ refine_cap exact pass —
    never the column cardinality."""
    import duckdb
    import ray.data as rd

    from events_validator_ray.stages.sampling import quantile_threshold_filter

    rng = np.random.default_rng(7)
    n = 20_000
    df = pd.DataFrame({"id": range(n), "score": rng.normal(0.0, 1.0, n)})
    assert df["score"].nunique() == n  # per-row distinct
    tel = {}
    got = sorted(
        r["id"]
        for r in quantile_threshold_filter(
            rd.from_pandas(df).repartition(8), "score", 0.9,
            bins=64, refine_cap=500, telemetry=tel,
        ).take_all()
    )
    want = sorted(
        duckdb.sql(
            "SELECT id FROM df WHERE score >= (SELECT quantile_disc(score, 0.9) FROM df)"
        ).df()["id"]
    )
    # threshold row itself survives: n - ceil(0.9n) + 1 rows
    assert got == want and len(got) == n - int(np.ceil(0.9 * n)) + 1
    # the refinement actually ran, and the exact pass pulled <= refine_cap
    # value rows — not the 20k-distinct value-count table
    assert tel["levels"] >= 1
    assert tel["exact_rows"] <= 500 < n


def test_quantile_filter_inf_threshold(ray_session):
    """q high enough that the quantile_disc threshold IS +inf: the filter must
    fall through to the typed Arrow comparison (an 'inf' literal in a filter
    expr string is unparseable) and keep exactly the inf rows."""
    import ray.data as rd

    from events_validator_ray.stages.sampling import quantile_threshold_filter

    df = pd.DataFrame(
        {"id": range(8), "score": [1.0, 2.0, 3.0, 4.0, np.inf, np.inf, -np.inf, None]}
    )
    got = sorted(
        r["id"]
        for r in quantile_threshold_filter(
            rd.from_pandas(df).repartition(2), "score", 1.0
        ).take_all()
    )
    # rank ceil(1.0*7)=7 of the 7 non-null values -> +inf; score >= inf keeps
    # only the inf rows
    assert got == [4, 5]
    # -inf threshold: q=0 -> rank 1 -> -inf; every non-null row survives
    got_lo = sorted(
        r["id"]
        for r in quantile_threshold_filter(
            rd.from_pandas(df).repartition(2), "score", 0.0
        ).take_all()
    )
    assert got_lo == [0, 1, 2, 3, 4, 5, 6]


def test_grouped_quantiles_partition_invariant(ray_session):
    import duckdb
    import ray.data as rd

    from events_validator_ray.stages.sampling import grouped_quantiles

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"g": rng.choice(list("abc"), 900), "v": rng.integers(0, 50, 900)}
    )
    got = (
        grouped_quantiles(rd.from_pandas(df).repartition(7), "g", "v", qs=(0.5, 0.9))
        .to_pandas()
        .sort_values(["g", "q_permille"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "SELECT g, 500 AS q_permille, quantile_disc(v, 0.5) AS value FROM df GROUP BY g "
        "UNION ALL SELECT g, 900, quantile_disc(v, 0.9) FROM df GROUP BY g "
        "ORDER BY g, q_permille"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_null_keys_never_equi_join(ray_session):
    """Round-3 ADVICE: SQL equi-joins/IN never match NULL keys, but pandas
    merge matches NaN==NaN — the bucketed paths must drop null-key rows so
    engine results match the DuckDB twins on null-bearing keys."""
    import duckdb
    import ray.data as rd

    from events_validator_ray.stages.joins import bloom_semi_join, range_join

    l = pd.DataFrame({"k": [1.0, 2.0, None, None, 3.0], "lv": [10, 20, 30, 40, 50]})
    r = pd.DataFrame({"k": [1.0, None, 3.0, 3.0], "rv": [100, 200, 300, 400]})

    # inner: null keys on either side never match
    got = (
        bucketed_hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k", num_buckets=4)
        .to_pandas()
        .sort_values(["lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql("SELECT l.k, lv, rv FROM l JOIN r USING (k) ORDER BY lv, rv")
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "lv", "rv"]], want, check_dtype=False)

    # left: left null-key rows survive unmatched; right nulls never attach
    got_l = (
        bucketed_hash_join(
            rd.from_pandas(l), rd.from_pandas(r), on="k", num_buckets=4, how="left"
        )
        .to_pandas()
        .sort_values(["lv"], kind="stable")
        .reset_index(drop=True)
    )
    want_l = (
        duckdb.sql("SELECT l.k, lv, rv FROM l LEFT JOIN r USING (k) ORDER BY lv, rv NULLS FIRST")
        .df()
        .reset_index(drop=True)
    )
    got_l = got_l.sort_values(["lv", "rv"], na_position="first").reset_index(drop=True)
    assert len(got_l) == len(want_l)
    assert got_l["lv"].tolist() == want_l["lv"].tolist()
    assert (
        got_l["rv"].fillna(-1).astype("int64").tolist()
        == want_l["rv"].fillna(-1).astype("int64").tolist()
    )

    # semi: null keys never IN
    got_s = (
        bloom_semi_join(rd.from_pandas(l), rd.from_pandas(r), on="k", num_buckets=4)
        .to_pandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    want_s = duckdb.sql(
        "SELECT * FROM l WHERE k IN (SELECT k FROM r) ORDER BY lv"
    ).df()
    assert got_s["lv"].tolist() == want_s["lv"].tolist()

    # range: null interval keys never match
    lp = pd.DataFrame({"u": [1.0, None, 2.0], "t": [5, 5, 5], "lv": [1, 2, 3]})
    rp = pd.DataFrame({"u": [1.0, None, 2.0], "lo": [0, 0, 6], "hi": [9, 9, 9]})
    got_r = (
        range_join(rd.from_pandas(lp), rd.from_pandas(rp), on="u", point="t", lo="lo", hi="hi", num_buckets=4)
        .to_pandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    want_r = duckdb.sql(
        "SELECT lp.u, t, lv, lo, hi FROM lp JOIN rp ON lp.u = rp.u AND t BETWEEN lo AND hi ORDER BY lv"
    ).df()
    assert got_r["lv"].tolist() == want_r["lv"].tolist()


def test_bloom_anti_join_null_keys_and_fp_pressure(ray_session):
    """NOT EXISTS semantics: NULL-key left rows are kept; a deliberately tiny
    Bloom (high false-positive rate) still yields the exact answer because
    hits go through the exact unmatched check."""
    import duckdb
    import ray.data as rd

    from events_validator_ray.stages.joins import bloom_anti_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "id": np.arange(3000),
            "k": rng.integers(0, 500, 3000).astype("float64"),
        }
    )
    left.loc[left.index % 37 == 5, "k"] = np.nan  # NULL keys -> kept
    keys = pd.DataFrame({"k": np.arange(0, 500, 3).astype("float64")})
    got = (
        bloom_anti_join(
            rd.from_pandas(left).repartition(6),
            rd.from_pandas(keys).repartition(2),
            on="k",
            n_bits_log2=8,  # tiny: forces false positives into the exact pass
            num_buckets=5,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("left_t", left)
    con.register("keys_t", keys)
    want = con.sql(
        "SELECT id FROM left_t l WHERE NOT EXISTS "
        "(SELECT 1 FROM keys_t r WHERE r.k = l.k) ORDER BY id"
    ).df()
    assert list(got["id"].astype("int64")) == list(want["id"].astype("int64"))
    assert left["k"].isna().sum() > 0  # fixture really exercised NULL keys


def test_ordered_prefix_sum_multiblock(ray_session):
    """Exclusive prefix sum across many blocks equals the single-process
    cumsum (block offsets really exchanged, not same-task fused)."""
    import ray.data as rd

    from events_validator_ray.stages.sampling import ordered_prefix_sum, packing_bins

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.permutation(5000), "v": rng.integers(0, 100, 5000)})
    df.loc[df.index % 11 == 3, "v"] = None  # NULLs count as 0
    got = (
        ordered_prefix_sum(rd.from_pandas(df).repartition(13), "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ordered = df.sort_values("k").reset_index(drop=True)
    want = ordered["v"].fillna(0).cumsum() - ordered["v"].fillna(0)
    np.testing.assert_array_equal(got["cum_prev"].to_numpy(), want.to_numpy().astype("int64"))
    bins = (
        packing_bins(rd.from_pandas(df).repartition(13), "k", "v", budget=1000)
        .to_pandas()
        .sort_values("k")["bin"]
        .to_numpy()
    )
    np.testing.assert_array_equal(bins, (want.to_numpy().astype("int64") // 1000))
    assert bins.max() > 10  # many shards -> the offsets really mattered
