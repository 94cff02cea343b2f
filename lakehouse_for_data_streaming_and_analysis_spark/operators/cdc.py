"""Change-data-capture apply: merge an I/U/D change batch into a
snapshot, latest-change-wins per key.

This is the type-1 companion to dims/scd2.py (which keeps history;
this overwrites): the core lakehouse MERGE a CDC feed (Debezium-style
op + sequence columns) drives. Reference parity: the reference's
Delta MERGE upsert path (SURVEY §2.4 J3) with delete support.

Scale design: the change batch reduces to one winner per key via a
(key, seq desc) window — partial per partition, no global sort — and
the snapshot joins the winners on the key. Snapshot keys untouched by
the batch stream through an anti join (no row rewrite); at 100 TB
with a partitioned snapshot this is the read-side of a merge-on-read
table format, and the same plan works as a foreachBatch upsert.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply an I/U/D change batch to a snapshot.

    ``changes`` carries the snapshot's payload columns plus ``op``
    ('I' | 'U' | 'D') and a monotonically increasing ``seq``; for each
    key only the highest-seq change applies. Returns the new
    snapshot: untouched rows + inserted/updated rows, deletes gone.
    """
    payload = snapshot.columns
    w = Window.partitionBy(*keys).orderBy(F.desc(seq_col))
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    untouched = snapshot.join(latest.select(*keys), list(keys), "left_anti")
    upserts = latest.filter(F.col(op_col) != "D").select(*payload)
    return untouched.unionByName(upserts)
