"""Similarity search over embedding columns (array<float>).

Two paths:
  - brute_force_topk: exact cosine top-k — the correctness baseline;
    a broadcast of the (small) query set against the full corpus, so
    the corpus is scanned once with no shuffle until the final top-k.
  - lsh_topk: random-hyperplane LSH bucketing — the scale path; the
    corpus is bucketed once (linear), queries probe only their bucket.

Hyperplanes are derived deterministically (md5 of plane|dim) so runs
are reproducible without a seed store.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k per query: crossJoin(broadcast(queries)) ->
    per-row cosine -> windowed rank. Score rounded before ranking so
    rank order is stable across fp summation orders. Norms are computed
    once per vector BEFORE the cross join, so the quadratic stage only
    folds the dot product."""
    q = queries.select(
        F.col(id_col).alias("qid"), vectors.as_double(F.col(vec_col)).alias("qe")
    ).withColumn("qn", vectors.norm(F.col("qe")))
    c = corpus.select(
        F.col(id_col), vectors.as_double(F.col(vec_col)).alias("ce")
    ).withColumn("cn", vectors.norm(F.col("ce")))
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid",
        id_col,
        F.round(
            vectors.dot(F.col("ce"), F.col("qe")) / (F.col("cn") * F.col("qn")),
            round_to,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", id_col, "cosine", "rn")
    )


def cosine_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold
    (all-pairs; restrict the input or LSH-bucket first at scale).

    Norms are computed once per VECTOR before the pair join (linear),
    so the quadratic stage only evaluates the dot product — same
    doubles as computing both norms per pair, a third of the fold
    work."""
    normed = corpus.select(
        F.col(id_col), vectors.as_double(F.col(vec_col)).alias("e")
    ).withColumn("nrm", vectors.norm(F.col("e")))
    a = normed.select(
        F.col(id_col).alias("id_a"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    b = normed.select(
        F.col(id_col).alias("id_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                vectors.dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def lsh_cosine_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Near-duplicate pairs via banded-LSH candidates + exact-cosine
    verify — the scale path that replaces ``cosine_pairs``'s all-pairs
    join (kept only as the recall yardstick, mirroring
    brute_force_topk vs lsh_topk).

    Shape: every vector lands in ``n_tables`` (table, bucket) cells
    (one linear pass, see _table_buckets); candidate pairs come from a
    self-EQUI-join on (table, bucket), so the quadratic work is bounded
    by per-bucket occupancy — at scale pick ``n_planes`` ≈
    log2(n / wanted_bucket_size) to keep cells small. Pairs surfacing
    in several tables dedup on (id_a, id_b) AFTER the map-side cosine
    fold (re-folding a duplicate candidate is cheaper than shuffling
    both vectors through the dedup exchange). Recall < 1 by
    construction for pairs near the threshold (sign-agreement
    probability (1 - theta/pi)^n_planes per table); more tables raise
    recall, more planes cut candidate volume.
    """
    if dim is None:
        dim = corpus.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    normed = corpus.select(
        F.col(id_col), vectors.as_double(F.col(vec_col)).alias("e")
    ).withColumn("nrm", vectors.norm(F.col("e")))
    tb = _table_buckets(normed, "e", n_planes, n_tables, dim)
    a = tb.select(
        F.col(id_col).alias("id_a"), F.col("e").alias("ea"),
        F.col("nrm").alias("na"), "table", "bucket",
    )
    b = tb.select(
        F.col(id_col).alias("id_b"), F.col("e").alias("eb"),
        F.col("nrm").alias("nb"), "table", "bucket",
    )
    scored = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                vectors.dot(F.col("ea"), F.col("eb"))
                / (F.col("na") * F.col("nb")),
                round_to,
            ).alias("cosine"),
        )
    )
    return scored.dropDuplicates(["id_a", "id_b"]).filter(
        F.col("cosine") >= threshold
    )


def _plane_weights(table: int, p: int, dim: int) -> list[float]:
    """Plane p's weight for dimension d: first 6 hex chars of
    md5("table|p|d") as an int in [0, 16^6) mapped into [-1, 1].

    Computed driver-side with hashlib — md5 of the same UTF-8 string
    yields the same hex as Spark's/DuckDB's md5, and int/8388608.0-1.0
    is the same IEEE op as conv(...)::long/8388608.0-1.0, so buckets
    stay bit-identical to the SQL derivation used by the oracle."""
    half = float(16**6 / 2)
    return [
        int(hashlib.md5(f"{table}|{p}|{d}".encode()).hexdigest()[:6], 16) / half - 1.0
        for d in range(dim)
    ]


def _bucket_sql(vec_col: str, table: int, n_planes: int, dim: int) -> str:
    """SQL text for one table's bucket id. Built as a STRING and parsed
    JVM-side with a single expr() — constructing the same tree through
    the Column API costs thousands of py4j round-trips (one per weight
    literal), which dominated wall time. Python float repr round-trips
    exactly through Java's Double.parseDouble, so the weights are
    bit-identical to the driver-side derivation."""
    terms = []
    for p in range(n_planes):
        ws = ",".join(repr(v) + "D" for v in _plane_weights(table, p, dim))
        proj = (
            f"aggregate(zip_with(transform({vec_col}, x -> cast(x as double)), "
            f"array({ws}), (x, w) -> x * w), 0.0D, (acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return "cast(" + " + ".join(terms) + " as int)"


def hyperplane_sign_bits(
    df: DataFrame, vec_col: str, n_planes: int = 8, table: int = 0,
    dim: int | None = None,
) -> DataFrame:
    """Deterministic random-hyperplane bucket id per row.

    Weights depend only on (table, plane, dim), so they are derived
    ONCE on the driver and shipped as array literals — the per-row work
    is n_planes fused dot products, not rows x dims x planes md5 calls.
    Distinct ``table`` values give independent hash tables for banded
    (OR) probing. bucket = sum of sign bits << p.
    """
    if dim is None:
        dim = df.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    return df.withColumn("bucket", F.expr(_bucket_sql(vec_col, table, n_planes, dim)))


def _table_buckets(
    df: DataFrame, vec_col: str, n_planes: int, n_tables: int, dim: int
) -> DataFrame:
    """Every hash table's bucket id in one pass: per row, an array of
    struct(table, bucket) exploded to long form. One projection + one
    explode — no per-table re-scan of the input, and the whole weight
    matrix ships as one parsed SQL expression (see _bucket_sql)."""
    entries = ", ".join(
        f"named_struct('table', {t}, 'bucket', "
        f"{_bucket_sql(vec_col, t, n_planes, dim)})"
        for t in range(n_tables)
    )
    # inline() explodes the struct array straight into (table, bucket)
    # columns: one generator, one analysis pass over the big expression.
    return df.select("*", F.expr(f"inline(array({entries}))"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """ANN: bucket corpus + queries by hyperplane signs, score only
    within the query's bucket. Single-table recall < 1 by construction
    (candidates must share ALL sign bits); ``n_tables`` > 1 ORs
    independent hash tables (banding), trading ~n_tables× candidate
    work for much higher recall — the standard LSH recall knob.

    All tables are probed through ONE (table, bucket) equi-join: each
    row expands to n_tables (table, bucket) entries via a single
    explode, so candidate generation is one broadcast join + one
    distinct regardless of n_tables (vs n_tables joins + union).
    Pass ``dim`` when known to skip the probe job that reads it."""
    if dim is None:
        dim = corpus.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    c_n = corpus.withColumn("_nrm", vectors.norm(vectors.as_double(F.col(vec_col))))
    q_n = queries.withColumn("_nrm", vectors.norm(vectors.as_double(F.col(vec_col))))
    cb = _table_buckets(c_n, vec_col, n_planes, n_tables, dim).select(
        F.col(id_col), F.col(vec_col).alias("ce"), F.col("_nrm").alias("cn"),
        "table", "bucket",
    )
    qb = _table_buckets(q_n, vec_col, n_planes, n_tables, dim).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"),
        F.col("_nrm").alias("qn"), "table", "bucket",
    )
    cands = cb.join(F.broadcast(qb), ["table", "bucket"]).select(
        "qid", id_col, "ce", "cn", "qe", "qn"
    )
    scored = cands.dropDuplicates(["qid", id_col]).select(
        "qid",
        id_col,
        F.round(
            vectors.dot(
                vectors.as_double(F.col("ce")), vectors.as_double(F.col("qe"))
            )
            / (F.col("cn") * F.col("qn")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", id_col, "cosine", "rn")
    )


def ivf_assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine, ties to
    the lowest centroid id). Centroids are broadcast — assignment is
    one scan of the corpus, no shuffle until the argmax window. Norms
    are folded once per vector/centroid, not per (vector, centroid)."""
    c = corpus.select(
        F.col(id_col), vectors.as_double(F.col(vec_col)).alias("e")
    ).withColumn("en", vectors.norm(F.col("e")))
    cents = centroids.select(
        F.col(id_col).alias("cid"), vectors.as_double(F.col(vec_col)).alias("ce")
    ).withColumn("cen", vectors.norm(F.col("ce")))
    scored = c.crossJoin(F.broadcast(cents)).select(
        id_col,
        "e",
        "en",
        "cid",
        F.round(
            vectors.dot(F.col("e"), F.col("ce")) / (F.col("en") * F.col("cen")),
            round_to,
        ).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "e", "en", F.col("cid").alias("cell"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """IVF-flavoured ANN (the scale path next to lsh_topk).

    Coarse quantizer: the ``n_centroids`` lowest-id corpus vectors act
    as centroids (deterministic; a production build would k-means
    them — the query topology is identical). Corpus vectors are
    bucketed into their nearest centroid's inverted list once; each
    query probes its ``n_probe`` nearest centroids and scores only
    those lists. Cost shape: |corpus|·C assignment (broadcast, linear)
    + per-query work proportional to the probed lists, instead of the
    full corpus.
    """
    cents = corpus.orderBy(id_col).limit(n_centroids)
    lists = ivf_assign_cells(corpus, cents, id_col, vec_col, round_to)
    q = queries.select(
        F.col(id_col).alias("qid"), vectors.as_double(F.col(vec_col)).alias("qe")
    ).withColumn("qn", vectors.norm(F.col("qe")))
    qcents = (
        q.crossJoin(
            F.broadcast(
                cents.select(
                    F.col(id_col).alias("cid"),
                    vectors.as_double(F.col(vec_col)).alias("ce"),
                ).withColumn("cen", vectors.norm(F.col("ce")))
            )
        )
        .select(
            "qid",
            "qe",
            "qn",
            "cid",
            F.round(
                vectors.dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cen")),
                round_to,
            ).alias("csim"),
        )
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("cid"))
    probes = (
        qcents.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("qid", "qe", "qn", F.col("cid").alias("cell"))
    )
    scored = lists.join(F.broadcast(probes), "cell").select(
        "qid",
        id_col,
        F.round(
            vectors.dot(F.col("e"), F.col("qe")) / (F.col("en") * F.col("qn")),
            round_to,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", id_col, "cosine", "rn")
    )


# ---------------------------------------------------------------- product
# quantization (Jégou et al. 2011, public) — the memory-compression arm
# of the ANN ladder (brute -> LSH -> IVF -> PQ): vectors become M small
# codes, queries scan codes with per-subspace lookup tables (ADC)
# instead of raw floats. At 100 TB of embeddings this is the difference
# between keeping 256 bytes/vector and 8 bytes/vector hot.


def pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_subspaces: int = 8,
    n_codes: int = 16,
) -> DataFrame:
    """Deterministic codebooks: the ``n_codes`` lowest-id corpus
    vectors donate their subvectors as codewords (same documented
    simplification as ivf_topk's coarse quantizer — production would
    k-means each subspace; encode/ADC mechanics are identical).
    Returns a tiny (m, code, cw) frame, M*K rows — always broadcast.
    """
    spark = corpus.sparkSession
    seed = (
        corpus.orderBy(id_col)
        .limit(n_codes)
        .select(id_col, vectors.as_double(F.col(vec_col)).alias("e"))
        .collect()
    )
    dim = len(seed[0].e)
    width = dim // m_subspaces
    rows = [
        {
            "m": m,
            "code": int(r[id_col]),
            "cw": [float(x) for x in r.e[m * width : (m + 1) * width]],
        }
        for r in seed
        for m in range(m_subspaces)
    ]
    return spark.createDataFrame(
        rows, schema="m int, code int, cw array<double>"
    )


def _subvectors(
    df: DataFrame, id_col: str, vec_col: str, m_subspaces: int, out_id: str
) -> DataFrame:
    """Explode each vector into its M subvectors — set-oriented, so
    encode/ADC are literal-free broadcast joins instead of M*K inlined
    constant folds (which would blow up codegen, kmeans-style)."""
    e = vectors.as_double(F.col(vec_col))
    width = F.floor(F.size(F.col("__e")) / m_subspaces).cast("int")
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(F.sequence(F.lit(0), F.lit(m_subspaces - 1))).alias("m"),
        e.alias("__e"),
    ).select(
        out_id,
        "m",
        F.slice(F.col("__e"), F.col("m") * width + 1, width).alias("sub"),
    )


def _sq_dist(a: Column, b: Column, round_to: int) -> Column:
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
        round_to,
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_subspaces: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """Vector -> M codes: per (vector, subspace), argmin squared
    distance over that subspace's codewords (ties to the lowest code).
    One broadcast join + one (id, m)-grain aggregate; the corpus is
    scanned once and never shuffled at full width again."""
    sub = _subvectors(corpus, id_col, vec_col, m_subspaces, id_col)
    scored = sub.join(F.broadcast(codebooks), "m").select(
        id_col,
        "m",
        "code",
        _sq_dist(F.col("sub"), F.col("cw"), round_to).alias("d2"),
    )
    return scored.groupBy(id_col, "m").agg(
        F.min_by("code", F.struct("d2", "code")).alias("code")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m_subspaces: int = 8,
    n_codes: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: queries stay exact, the corpus
    is its PQ codes. Per query, an M*K subspace distance table is
    computed once (tiny, broadcast); each corpus vector's approximate
    distance is the SUM of M table lookups — a broadcast join on
    (m, code) plus one (qid, vec_id)-grain aggregate. No full-width
    vector math ever touches the corpus side."""
    books = pq_codebooks(corpus, id_col, vec_col, m_subspaces, n_codes)
    codes = pq_encode(corpus, books, id_col, vec_col, m_subspaces, round_to)
    qsub = _subvectors(queries, id_col, vec_col, m_subspaces, "qid")
    qtables = qsub.join(F.broadcast(books), "m").select(
        "qid",
        "m",
        "code",
        _sq_dist(F.col("sub"), F.col("cw"), round_to).alias("qd2"),
    )
    adc = (
        codes.join(F.broadcast(qtables), ["m", "code"])
        .filter(F.col("qid") != F.col(id_col))
        .groupBy("qid", id_col)
        .agg(F.round(F.sum("qd2"), round_to).alias("approx_dist"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("approx_dist"), F.asc(id_col))
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", id_col, "approx_dist", F.col("rn").cast("int").alias("rn"))
    )
