"""Scale-path operators: salted joins stay correct under pathological
key skew, and bucketed tables join without a shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table
from lakehouse_for_data_streaming_and_analysis_spark.operators import skew

from .conftest import SF_DIR, SF_DIR_01


def _skewed(spark):
    """90% of rows on one key — the shape AQE skew-split or salting
    must handle."""
    hot = spark.range(9000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(1000).select(
        (F.col("id") % 50).alias("k"), (F.col("id") + 100000).alias("payload")
    )
    return hot.unionByName(cold)


def test_salted_join_matches_plain_join(spark):
    left = _skewed(spark)
    right = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    plain = left.join(right, ["k"]).select("k", "payload", "dim_val")
    salted = skew.salted_join(left, right, ["k"], n_salts=8).select(
        "k", "payload", "dim_val"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    left = _skewed(spark)
    right = spark.range(5).select(  # most keys unmatched
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    plain = left.join(right, ["k"], "left").select("k", "payload", "dim_val")
    salted = skew.salted_join(left, right, ["k"], n_salts=4, how="left").select(
        "k", "payload", "dim_val"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_spreads_hot_key(spark):
    """The hot key's rows must land on multiple (key, salt) groups."""
    left = _skewed(spark)
    salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8))
    )
    groups = (
        salted.filter(F.col("k") == 7)
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(groups) == 8  # all salt values used
    assert max(r["count"] for r in groups) < 9000  # no single straggler


def test_top_hot_keys_diagnostic(spark):
    hot = skew.top_hot_keys(_skewed(spark), ["k"], k=3).collect()
    assert hot[0]["k"] == 7 and hot[0]["share"] > 0.8


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Both sides bucketed on the key => sort-merge join with zero
    Exchange (the write-once-shuffle-never-again contract)."""
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    skew.write_bucketed(o, "b_orders", ["o_orderkey"], 8, path=str(tmp_path / "bo"))
    skew.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        path=str(tmp_path / "bl"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = skew.bucketed_join_ready(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        n_shuffle = sum(
            plan.count(f"Exchange {kind}")
            for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
        )
        assert n_shuffle == 0, plan
        assert joined.count() == li.count()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_lsh_topk_recall_against_brute_force(spark):
    """LSH ANN: deterministic hyperplane buckets; every query finds
    itself (same bucket by construction) and recall@5 against the
    exact top-5 is meaningfully above random."""
    from lakehouse_for_data_streaming_and_analysis_spark.operators import similarity

    emb = load_table(spark, SF_DIR_01, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = similarity.brute_force_topk(emb, queries, k=5).collect()
    approx = similarity.lsh_topk(emb, queries, k=5, n_planes=6, n_tables=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    # self-match guaranteed: query shares its own bucket
    for qid, found in approx_sets.items():
        assert qid in found
    hits = sum(
        len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets
    )
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total
    assert recall >= 0.3, f"recall@5 {recall:.2f}"  # 5/500 random ≈ 0.01


def test_surrogate_keys_distributed_matches_global(spark):
    """The scale-safe keying must produce the same dense deterministic
    ids as the single-partition window for unique order keys."""
    from lakehouse_for_data_streaming_and_analysis_spark.operators import windows as wops

    df = load_table(spark, SF_DIR_01, "customer").select("c_custkey", "c_name")
    a = {
        r["c_custkey"]: r["surrogate_key"]
        for r in wops.surrogate_keys(df, ["c_custkey"], offset=100).collect()
    }
    b = {
        r["c_custkey"]: r["surrogate_key"]
        for r in wops.surrogate_keys_distributed(df, ["c_custkey"], offset=100).collect()
    }
    assert a == b
    assert sorted(a.values()) == list(range(101, 101 + len(a)))


def test_maintenance_history_lists_generations(spark, tmp_path):
    from lakehouse_for_data_streaming_and_analysis_spark.maintenance import optimize

    tdir = _table_for_history(spark, tmp_path)
    optimize.compact(spark, tdir)
    optimize.compact(spark, tdir)
    h = optimize.history(spark, tdir).collect()
    assert [r["generation"] for r in h] == [1, 2]
    assert h[-1]["is_current"] and not h[0]["is_current"]
    assert all(r["n_files"] >= 1 and r["bytes"] > 0 for r in h)


def _table_for_history(spark, tmp_path) -> str:
    tdir = str(tmp_path / "hist")
    load_table(spark, SF_DIR_01, "nation").write.mode("overwrite").parquet(tdir)
    return tdir


def test_two_stage_agg_matches_plain(spark):
    """Salted two-stage aggregation must equal the plain groupBy for
    every supported aggregate (assoc/comm decomposition)."""
    ev = load_table(spark, SF_DIR_01, "events")
    plain = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.sum("value").alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
            F.avg("value").alias("a"),
        )
        .collect()
    }
    staged = {
        r["event_type"]: r
        for r in skew.two_stage_agg(
            ev,
            ["event_type"],
            n_salts=8,
            s=("sum", "value"),
            n=("count", "value"),
            mn=("min", "value"),
            mx=("max", "value"),
            a=("avg", "value"),
        ).collect()
    }
    assert set(plain) == set(staged)
    for k, p in plain.items():
        s = staged[k]
        assert s["n"] == p["n"] and s["mn"] == p["mn"] and s["mx"] == p["mx"]
        assert abs(s["s"] - p["s"]) < 1e-6 * max(abs(p["s"]), 1)
        assert abs(s["a"] - p["a"]) < 1e-9 * max(abs(p["a"]), 1)


def test_star_plan_and_results_scale_linearly(spark, tmp_path):
    """Scale-up rehearsal: replicate the fact side 8x (orderkeys
    shifted so the lineitem->orders join stays valid, dims untouched)
    and re-run the flagship star query. Two invariants of a plan that
    survives 100x growth:
      1. the join strategy is UNCHANGED — dims still broadcast, zero
         sort-merge joins, because dim size does not grow with the
         fact side;
      2. the aggregate is exactly linear — every (nation, month)
         revenue is 8x the base run (the copies share the dimension
         rows), so partial aggregation composed correctly under more
         input splits.
    """
    from lakehouse_for_data_streaming_and_analysis_spark.plans import star

    sf = SF_DIR
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")

    K = 8
    li8 = None
    o8 = None
    for i in range(K):
        li_i = li.withColumn(
            "l_orderkey", F.col("l_orderkey") * K + F.lit(i)
        )
        o_i = o.withColumn("o_orderkey", F.col("o_orderkey") * K + F.lit(i))
        li8 = li_i if li8 is None else li8.unionByName(li_i)
        o8 = o_i if o8 is None else o8.unionByName(o_i)
    # land the scaled copies so the scan shape (file splits) is real
    li8_path, o8_path = str(tmp_path / "li8"), str(tmp_path / "o8")
    li8.write.parquet(li8_path)
    o8.write.parquet(o8_path)
    li8 = spark.read.parquet(li8_path)
    o8 = spark.read.parquet(o8_path)

    base = star.star_revenue_by_nation_month(li, o, c, n, r)
    scaled = star.star_revenue_by_nation_month(li8, o8, c, n, r)

    p = scaled._jdf.queryExecution().executedPlan().toString()
    # The scale invariant is about the DIM side: customer/nation/region
    # stay broadcast because they don't grow with the fact side. The
    # lineitem-orders edge is fact-fact — Spark may legitimately pick a
    # shuffle join for it as the scaled side grows (that IS the right
    # call at 100 TB), so allow at most that one non-broadcast join.
    assert p.count("BroadcastHashJoin") >= 3, p
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") <= 1, p

    # the flagship is top-N; compare on the full aggregate instead
    def full_agg(lidf, odf):
        return (
            lidf.join(odf, lidf.l_orderkey == odf.o_orderkey)
            .join(c, odf.o_custkey == c.c_custkey)
            .join(n, c.c_nationkey == n.n_nationkey)
            .groupBy("n_name", F.date_trunc("month", "o_orderdate").alias("m"))
            .agg(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ).alias("rev")
            )
        )

    base_rows = {(r1["n_name"], r1["m"]): r1["rev"] for r1 in full_agg(li, o).collect()}
    scaled_rows = {
        (r1["n_name"], r1["m"]): r1["rev"] for r1 in full_agg(li8, o8).collect()
    }
    assert set(base_rows) == set(scaled_rows)
    for key, rev in base_rows.items():
        assert scaled_rows[key] == rev * K, (key, rev, scaled_rows[key])


def test_lsh_cosine_pairs_subset_and_recall(spark):
    """Banded near-dup pairs must be a SUBSET of the exact all-pairs
    result (identical cosines — LSH only prunes candidates, never
    invents or perturbs a pair) with recall well above random; misses
    concentrate at the 0.35 threshold boundary by construction."""
    from lakehouse_for_data_streaming_and_analysis_spark.operators import similarity

    emb = load_table(spark, SF_DIR_01, "embeddings").filter(F.col("vec_id") < 300)
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.cosine_pairs(emb, threshold=0.35).collect()
    }
    banded = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.lsh_cosine_pairs(
            emb, threshold=0.35, n_planes=4, n_tables=4, dim=64
        ).collect()
    }
    assert set(banded) <= set(exact), set(banded) - set(exact)
    for pair, cos in banded.items():
        assert cos == exact[pair]
    recall = len(banded) / max(len(exact), 1)
    assert recall >= 0.25, f"recall {recall:.2f} over {len(exact)} pairs"


def test_simhash_pairs_banding_equals_brute_force(spark):
    """The pigeonhole banding is EXACT: on random 16-bit sketches the
    banded operator must return precisely the all-pairs hamming<=3 set
    (recall 1 and no false pairs), including boundary distances."""
    import random

    from lakehouse_for_data_streaming_and_analysis_spark.operators import dedup

    rng = random.Random(42)
    sketches = [(i, rng.getrandbits(16)) for i in range(200)]
    # force some boundary pairs: clones at distance exactly 3 and 4
    sketches += [(1000, sketches[0][1] ^ 0b111)]       # d=3 from id 0
    sketches += [(1001, sketches[1][1] ^ 0b10101000)]  # d=4 from id 1 (excluded)
    df = spark.createDataFrame(sketches, "doc_id int, simhash long")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_pairs(df, "doc_id", max_hamming=3).collect()
    }
    want = set()
    for i, (ida, sa) in enumerate(sketches):
        for idb, sb in sketches[i + 1 :]:
            a, b = (ida, idb) if ida < idb else (idb, ida)
            d = bin((sa ^ sb) & 0xFFFF).count("1")
            if d <= 3:
                want.add((a, b, d))
    assert got == want
    assert any(h == 3 for *_, h in want), "fixture must include a d=3 pair"


def test_pq_topk_recall_beats_random(spark):
    """PQ ADC ranking must carry real signal: its top-5 per query lands
    in the exact-L2 top-20 far above the random baseline (random 5 of
    ~500 would overlap the top-20 by ~0.2 on average; coarse 8x16
    codebooks on random vectors cannot reach exact recall — the pin is
    signal, not perfection)."""
    import numpy as np

    from lakehouse_for_data_streaming_and_analysis_spark.operators import similarity

    emb = load_table(spark, SF_DIR, "embeddings")
    V = {r.vec_id: np.array(r.embedding, dtype=float) for r in emb.collect()}
    got = similarity.pq_topk(emb, emb.filter(F.col("vec_id") < 3), k=5).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r.qid, []).append(r.vec_id)
    assert set(by_q) == {0, 1, 2}
    hits = []
    for qid, picks in by_q.items():
        assert len(picks) == 5
        d = sorted((float(np.sum((V[qid] - V[i]) ** 2)), i) for i in V if i != qid)
        top20 = {i for _, i in d[:20]}
        hits.append(len(set(picks) & top20) / 5)
    assert sum(hits) / len(hits) >= 0.4, hits


# --- ANN recall at 10x vectors (VERDICT r8 ask #7) -------------------
# The 50k corpus is the deterministic hash-noise derivation of
# tools/ann_scale_recall.py (25 near-duplicate replicas per sf0.1
# vector — tight clusters, the classic ANN workload); full sweep
# curves live in ann_recall_50k.json / BASELINE.md. Gates use fewer
# queries than the sweep (suite wall) but the same corpus, k, and
# recall definition; thresholds sit under the measured curve
# (IVF@probe4 = 0.997, LSH@4tables = 0.99 over 100 queries).

def _ann50k(spark):
    from tools.ann_scale_recall import DEST, DIM, build_fixture

    build_fixture()
    corpus = spark.read.parquet(DEST)
    queries = corpus.filter(
        (F.col("vec_id") < 2000) & (F.col("vec_id") % 80 == 0)
    )  # 25 original vectors
    return corpus, queries, DIM


def _recall_at_10(approx, truth) -> float:
    hits = approx.join(truth, ["qid", "vec_id"]).count()
    return hits / truth.count()


def test_ann_recall_gates_at_50k_vectors(spark):
    from lakehouse_for_data_streaming_and_analysis_spark.operators import similarity

    corpus, queries, dim = _ann50k(spark)
    assert corpus.count() == 50_000
    truth = (
        similarity.brute_force_topk(corpus, queries, k=10)
        .select("qid", "vec_id")
        .cache()
    )
    ivf = similarity.ivf_topk(
        corpus, queries, k=10, n_centroids=100, n_probe=4
    ).select("qid", "vec_id")
    r_ivf = _recall_at_10(ivf, truth)
    assert r_ivf >= 0.95, f"IVF recall@10 {r_ivf:.3f} at 50k vectors"

    lsh = similarity.lsh_topk(
        corpus, queries, k=10, n_planes=10, n_tables=4, dim=dim
    ).select("qid", "vec_id")
    r_lsh = _recall_at_10(lsh, truth)
    assert r_lsh >= 0.90, f"LSH recall@10 {r_lsh:.3f} at 50k vectors"
    truth.unpersist()
