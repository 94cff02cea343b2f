#!/usr/bin/env python3
"""Synthesize a larger scale-factor fixture from sf0.1 (default: sf1).

The driver ships sf{0.001,0.01,0.1} (TESTDATA.md, read-only); the
scaling table in BASELINE.md wants one more decade. This derives it
from sf0.1 deterministically — no RNG, no new distributions:

* region/nation: copied (dimensions don't scale in TPC-H either).
* customer/supplier/part/orders/lineitem/events/embeddings: REPLICAS
  offset copies; every key (and foreign key) is shifted by the same
  per-table stride so join fan-in/fan-out per key is IDENTICAL to
  sf0.1 — the workload scales in volume, not in shape.  Two r10
  de-degenerations (VERDICT r9 asks #3/#4): o_custkey is derotated
  per order (bijective replica remap, shape-preserving) so custkey is
  not correlated with orderkey striding, and replica embeddings carry
  deterministic ±0.03 hash-noise so no vector is a verbatim twin.
* documents: each replica DETERMINISTICALLY reorders the words of the
  original doc (per-(replica, doc) rotation). Unigram statistics —
  token counts, TF-IDF, quality metrics — are preserved exactly, but
  word ORDER changes, so shingle/minhash signatures differ across
  replicas and the near-dup pair density stays that of sf0.1 instead
  of exploding quadratically with 10 verbatim copies.

Output goes under the repo (.scratch/ is gitignored); /root/testdata
is never written. ~170 MB at sf1.

Usage::

    python tools/make_sf.py                # sf1 at .scratch/sf1
    python tools/make_sf.py 20 /tmp/sf2    # 20 replicas elsewhere
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
STRIDE = 100_000_000  # > any sf0.1 key; keeps replica key ranges disjoint


def build(out_dir: str, replicas: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT UNNEST(RANGE({replicas})) AS i")

    def emit(name: str, sql: str) -> None:
        dest = os.path.join(out_dir, f"{name}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET, CODEC SNAPPY)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dest}')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM {src(t)}")

    emit(
        "customer",
        f"""SELECT c_custkey + i*{STRIDE} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM {src('customer')}, r""",
    )
    # orders→customer replica DEROTATION: o_custkey joins the customer
    # replica (i + hash(o_orderkey)) % replicas instead of i, so custkey
    # is NOT striding in lockstep with orderkey. Shape is still exact:
    # each base order of customer c lands on every customer replica of
    # c exactly once across the order replicas (the map i -> (i+h) %
    # replicas is a bijection for fixed h), so per-customer order
    # counts, totals, and semi/anti-join membership are IDENTICAL to
    # sf0.1 per key. Without this, an o_orderkey-ranged file layout is
    # perfectly correlated with o_custkey bands and the
    # deltalog_zorder_audit premise (a custkey band matches every
    # orderkey-ranged file before Z-ordering) breaks at sf1
    # (VERDICT r9 ask #4).
    emit(
        "supplier",
        f"""SELECT s_suppkey + i*{STRIDE} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM {src('supplier')}, r""",
    )
    emit(
        "part",
        f"""SELECT p_partkey + i*{STRIDE} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM {src('part')}, r""",
    )
    emit(
        "orders",
        f"""SELECT o_orderkey + i*{STRIDE} AS o_orderkey,
                   o_custkey + CAST((i + hash(o_orderkey) % {replicas})
                                    % {replicas} AS BIGINT)
                             * {STRIDE} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM {src('orders')}, r""",
    )
    emit(
        "lineitem",
        f"""SELECT l_orderkey + i*{STRIDE} AS l_orderkey,
                   l_partkey + i*{STRIDE} AS l_partkey,
                   l_suppkey + i*{STRIDE} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus,
                   l_shipdate
            FROM {src('lineitem')}, r""",
    )
    emit(
        "events",
        f"""SELECT event_id + i*{STRIDE} AS event_id, ts,
                   user_id + i*{STRIDE} AS user_id, event_type, value,
                   props
            FROM {src('events')}, r""",
    )
    # replica embeddings carry deterministic hash-noise (±0.03 per
    # component, the ann_scale_recall.py construction): verbatim
    # 10x-twin vectors are unrealistic (every vector an exact dup of 9
    # others) and made pair-generating oracles blow up on degenerate
    # geometry (VERDICT r9 ask #3). Replica 0 stays the original.
    noise = (
        f"(CAST(hash(vec_id * 1000003 + i * 8191 + j) % 2001 AS DOUBLE)"
        f" - 1000.0) / 1000.0 * 0.03"
    )
    emit(
        "embeddings",
        f"""SELECT vec_id + i*{STRIDE} AS vec_id,
                   CASE WHEN i = 0 THEN embedding
                        ELSE CAST(list_transform(
                               range(1, len(embedding) + 1),
                               j -> embedding[j] + {noise}) AS FLOAT[])
                   END AS embedding,
                   label
            FROM {src('embeddings')}, r""",
    )
    # per-(replica, doc) deterministic SHUFFLE of the word list:
    # replica 0 is the original; others preserve the exact multiset of
    # tokens (and n_chars), so unigram stats — token counts, TF-IDF,
    # quality scores — are identical, while word ORDER is randomized
    # per (doc, replica). A rotation would NOT do: it keeps all but
    # ~n-1 shingles, so minhash signatures survive and near-dup pairs
    # multiply quadratically across replicas; a full shuffle destroys
    # essentially every bigram+ shingle.
    emit(
        "documents",
        f"""WITH base AS (SELECT * FROM {src('documents')}),
            toks AS (
              SELECT doc_id,
                     UNNEST(STRING_SPLIT(text, ' ')) AS w,
                     GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos
              FROM base),
            shuf AS (
              SELECT t.doc_id, r.i,
                     STRING_AGG(
                       t.w, ' '
                       ORDER BY HASH(t.doc_id * 1000003 + r.i * 8191
                                     + t.pos), t.pos
                     ) AS stext
              FROM toks t CROSS JOIN r
              WHERE r.i > 0
              GROUP BY t.doc_id, r.i)
            SELECT b.doc_id + r.i * {STRIDE} AS doc_id,
                   CASE WHEN r.i = 0 THEN b.text ELSE s.stext END AS text,
                   b.lang, b.source, b.n_chars
            FROM base b
            CROSS JOIN r
            LEFT JOIN shuf s ON s.doc_id = b.doc_id AND s.i = r.i""",
    )


if __name__ == "__main__":
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scratch",
            "sf1",
        )
    )
    build(out, replicas)
    print(f"wrote {out}")
