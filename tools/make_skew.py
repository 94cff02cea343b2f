#!/usr/bin/env python3
"""Synthesize a HOT-KEY-SKEWED twin of sf0.1 (VERDICT r7 ask #4).

The driver fixtures have near-uniform keys, so the salted/bucketed
join paths (``operators/skew.py``), AQE's skew-join splitting, and the
stream-stream state joins carry no *measured* hot-key evidence. This
tool derives ``.scratch/sf0.1skew`` from sf0.1 at IDENTICAL row counts
— only the key (or dedup-identity) distribution changes, so any wall
delta between the two fixtures is attributable to skew alone:

* ``orders``: ~30 % of rows reassign ``o_custkey`` to ONE hot customer
  (the star join's probe side gains a hot build key);
* ``customer``: ~30 % of customers reassign ``c_nationkey`` to ONE hot
  nation (the star's group-by gains a hot aggregation key);
* ``events``: ~30 % of rows reassign ``user_id`` to ONE hot user (the
  stream-stream attribution join gains a hot state key);
* ``lineitem``: ~30 % of rows reassign ``l_suppkey`` to ONE hot
  supplier;
* ``documents``: ~30 % of docs get ONE shared text (a single giant
  exact-dedup group);
* everything else copies verbatim.

Row selection is HASH-deterministic (no RNG). /root/testdata is never
written; output lives under the gitignored ``.scratch/``.

Usage::

    python tools/make_skew.py                # .scratch/sf0.1skew
    python tools/make_skew.py /tmp/skewdir
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
SKEW_PCT = 30  # % of rows owned by the hot key


def build(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def emit(name: str, sql: str) -> None:
        dest = os.path.join(out_dir, f"{name}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET, CODEC SNAPPY)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dest}')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    hot_cust = con.execute(
        f"SELECT MIN(c_custkey) FROM {src('customer')}"
    ).fetchone()[0]
    hot_supp = con.execute(
        f"SELECT MIN(s_suppkey) FROM {src('supplier')}"
    ).fetchone()[0]
    hot_user = con.execute(
        f"SELECT MIN(user_id) FROM {src('events')}"
    ).fetchone()[0]
    hot_nation = con.execute(
        f"SELECT MIN(n_nationkey) FROM {src('nation')}"
    ).fetchone()[0]
    hot_text = con.execute(
        f"SELECT text FROM {src('documents')} ORDER BY doc_id LIMIT 1"
    ).fetchone()[0]

    for t in ("region", "nation", "part", "supplier", "embeddings"):
        emit(t, f"SELECT * FROM {src(t)}")

    emit(
        "customer",
        f"""SELECT c_custkey, c_name,
                   CASE WHEN HASH(c_custkey) % 100 < {SKEW_PCT}
                        THEN {hot_nation} ELSE c_nationkey
                   END AS c_nationkey,
                   c_acctbal, c_mktsegment
            FROM {src('customer')}""",
    )
    emit(
        "orders",
        f"""SELECT o_orderkey,
                   CASE WHEN HASH(o_orderkey) % 100 < {SKEW_PCT}
                        THEN {hot_cust} ELSE o_custkey
                   END AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM {src('orders')}""",
    )
    emit(
        "lineitem",
        f"""SELECT l_orderkey, l_partkey,
                   CASE WHEN HASH(l_orderkey * 10 + l_linenumber)
                             % 100 < {SKEW_PCT}
                        THEN {hot_supp} ELSE l_suppkey
                   END AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus,
                   l_shipdate
            FROM {src('lineitem')}""",
    )
    # Only PURCHASE rows reassign to the hot user: a self-join key hot
    # on both sides multiplies the join OUTPUT quadratically (a
    # semantic explosion, not a shuffle pathology — measured 137x more
    # result rows), which would confound the wall ratio. Skewing one
    # side concentrates 30 % of the stream-stream join's state on a
    # single key — the state-store hot-partition scenario — while the
    # output stays comparable to uniform.
    emit(
        "events",
        f"""SELECT event_id, ts,
                   CASE WHEN event_type = 'purchase'
                             AND HASH(event_id) % 100 < {SKEW_PCT}
                        THEN {hot_user} ELSE user_id
                   END AS user_id,
                   event_type, value, props
            FROM {src('events')}""",
    )
    hot_lit = "'" + hot_text.replace("'", "''") + "'"
    emit(
        "documents",
        f"""SELECT doc_id,
                   CASE WHEN HASH(doc_id) % 100 < {SKEW_PCT}
                        THEN {hot_lit} ELSE text
                   END AS text,
                   lang, source, n_chars
            FROM {src('documents')}""",
    )


if __name__ == "__main__":
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scratch",
            "sf0.1skew",
        )
    )
    build(out)
    print(f"wrote {out}")
