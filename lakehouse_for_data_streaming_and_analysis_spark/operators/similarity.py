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
    rank order is stable across fp summation orders."""
    q = queries.select(
        F.col(id_col).alias("qid"), vectors.as_double(F.col(vec_col)).alias("qe")
    )
    c = corpus.select(
        F.col(id_col), vectors.as_double(F.col(vec_col)).alias("ce")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid",
        id_col,
        F.round(vectors.cosine(F.col("ce"), F.col("qe")), round_to).alias("cosine"),
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
    (all-pairs; restrict the input or LSH-bucket first at scale)."""
    a = corpus.select(
        F.col(id_col).alias("id_a"), vectors.as_double(F.col(vec_col)).alias("ea")
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), vectors.as_double(F.col(vec_col)).alias("eb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(vectors.cosine(F.col("ea"), F.col("eb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def hyperplane_sign_bits(
    df: DataFrame, vec_col: str, n_planes: int = 8, table: int = 0
) -> DataFrame:
    """Deterministic random-hyperplane bucket id per row.

    Plane p's weight for dimension d is derived from md5(table|p|d)
    mapped into [-1, 1] — reproducible with no stored model; distinct
    ``table`` values give independent hash tables for banded (OR)
    probing. bucket = sum of sign bits << p.
    """
    def plane_weight(p: int):
        # first 6 hex chars of md5("t|p|d") as an int in [0, 16^6) -> [-1, 1]
        return lambda x, i: x * (
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "|", F.lit(str(table)), F.lit(str(p)), i.cast("string")
                            )
                        ),
                        1,
                        6,
                    ),
                    16,
                    10,
                ).cast("long")
                / F.lit(float(16**6 / 2))
            )
            - 1.0
        )

    out = df
    bucket = F.lit(0)
    arr = vectors.as_double(F.col(vec_col))
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                arr,
                F.transform(F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
                            lambda i: i),
                plane_weight(p),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out.withColumn("bucket", bucket.cast("int"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 1,
) -> DataFrame:
    """ANN: bucket corpus + queries by hyperplane signs, score only
    within the query's bucket. Single-table recall < 1 by construction
    (candidates must share ALL sign bits); ``n_tables`` > 1 ORs
    independent hash tables (banding), trading ~n_tables× candidate
    work for much higher recall — the standard LSH recall knob."""
    per_table = []
    for t in range(n_tables):
        cb = hyperplane_sign_bits(corpus, vec_col, n_planes, table=t).select(
            F.col(id_col), F.col(vec_col).alias("ce"), "bucket"
        )
        qb = hyperplane_sign_bits(queries, vec_col, n_planes, table=t).select(
            F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"), "bucket"
        )
        per_table.append(
            cb.join(F.broadcast(qb), "bucket").select("qid", id_col, "ce", "qe")
        )
    cands = per_table[0]
    for more in per_table[1:]:
        cands = cands.unionByName(more)
    scored = cands.dropDuplicates(["qid", id_col]).select(
        "qid",
        id_col,
        F.round(
            vectors.cosine(
                vectors.as_double(F.col("ce")), vectors.as_double(F.col("qe"))
            ),
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
    one scan of the corpus, no shuffle until the argmax window."""
    c = corpus.select(F.col(id_col), vectors.as_double(F.col(vec_col)).alias("e"))
    cents = centroids.select(
        F.col(id_col).alias("cid"), vectors.as_double(F.col(vec_col)).alias("ce")
    )
    scored = c.crossJoin(F.broadcast(cents)).select(
        id_col,
        "e",
        "cid",
        F.round(vectors.cosine(F.col("e"), F.col("ce")), round_to).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "e", F.col("cid").alias("cell"))
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
    )
    qcents = (
        q.crossJoin(
            F.broadcast(
                cents.select(
                    F.col(id_col).alias("cid"),
                    vectors.as_double(F.col(vec_col)).alias("ce"),
                )
            )
        )
        .select(
            "qid",
            "qe",
            "cid",
            F.round(vectors.cosine(F.col("qe"), F.col("ce")), round_to).alias("csim"),
        )
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("cid"))
    probes = (
        qcents.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("qid", "qe", F.col("cid").alias("cell"))
    )
    scored = lists.join(F.broadcast(probes), "cell").select(
        "qid",
        id_col,
        F.round(vectors.cosine(F.col("e"), F.col("qe")), round_to).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", id_col, "cosine", "rn")
    )
