"""Star-join analytics (SURVEY.md §2.4 J5/J6, §2.5 A5/A6).

The reference's interactive layer runs 4-way star equi-joins
(fact ⋈ dimdate ⋈ dimcoin ⋈ dimtime) with grouped MAX + time grain +
ORDER BY + LIMIT (reference: Superset dashboard JSON:329,1140 — Trino
SQL). Re-targeted at the fixture star schema:
lineitem (fact) ⋈ orders ⋈ customer ⋈ nation ⋈ region.

Scale design: dims (region/nation/customer-at-dim-scale) are orders of
magnitude smaller than the fact side — each join is explicitly
broadcast-hinted so the 100 TB fact table never shuffles for the star
join; only the final groupBy shuffles, with map-side partial
aggregation. AQE coalesces the post-agg partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def star_revenue_by_nation_month(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    limit: int = 10,
) -> DataFrame:
    """Flagship: revenue + max order value per (nation, month), top-N.

    Mirrors the "Change percent" slice shape (inner star join + GROUP BY
    time grain + outer ORDER BY MAX DESC + row limit,
    reference: dashboard JSON:329).
    """
    # orders is fact-sized — shuffle join on the key (AQE picks the
    # strategy); the true dims below are broadcast.
    joined = (
        lineitem.join(orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
                      lineitem.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.round(F.max("o_totalprice"), 2).alias("max_order_value"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue"), F.asc("nation"), F.asc("month"))
        .limit(limit)
    )


STAR_REVENUE_ORACLE = """
SELECT nation, region, month,
       ROUND(SUM(rev), 2) AS revenue,
       ROUND(MAX(o_totalprice), 2) AS max_order_value,
       COUNT(*) AS n_lineitems
FROM (
  SELECT n.n_name AS nation, r.r_name AS region,
         strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS month,
         l.l_extendedprice * (1 - l.l_discount) AS rev,
         o.o_totalprice
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)
GROUP BY nation, region, month
ORDER BY revenue DESC, nation ASC, month ASC
LIMIT 10
"""


def star_filtered_dim_subquery(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Star join over a filtered-dim subquery (J6): join fact to
    (SELECT ... FROM dim WHERE pred), mirroring the "FACT" virtual
    dataset (reference: dashboard JSON:1140 joins dimcoin filtered to
    is_current='Y'). Here: customers in the BUILDING segment only."""
    dim = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_nationkey"
    )
    return (
        lineitem.join(orders.select("o_orderkey", "o_custkey"),
                      lineitem.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("gross_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("gross_revenue"), F.asc("nation"))
    )


STAR_FILTERED_DIM_ORACLE = """
SELECT n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice), 2) AS gross_revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN (SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING') c
  ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY gross_revenue DESC, nation ASC
"""
