"""Cross-implementation transaction-log interop (VERDICT r7 ask #3).

``tools/minikernel.py`` is an INDEPENDENT minimal Delta reader —
stdlib + pyarrow, written from the public protocol spec, sharing zero
code with ``lakehouse_for_data_streaming_and_analysis_spark.delta`` — standing in for the real
delta-rs / delta-kernel / Trino readers that are not installable in
this sandbox (reference analogue: the Trino delta connector reading
Spark-written tables, ``data/trino/delta.properties:1-9``).

Both directions are proven here:
  * FORWARD — every feature surface this writer produces (partitioned
    appends, deletion vectors, column mapping + renames, type
    widening, classic/multi-part/v2 checkpoints, log cleanup) is read
    back by the mini-kernel and must match the engine's own read
    row-for-row;
  * REVERSE — a spec-shaped foreign log (nested-STRUCT checkpoint
    cells, the encoding real delta-spark writes, which this engine's
    JSON-string checkpoints deliberately diverge from) handwritten by
    pyarrow is read by BOTH the engine and the mini-kernel.

The no-shared-code property is itself test-enforced, so agreement is
evidence rather than tautology.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.delta import log as dlog
from lakehouse_for_data_streaming_and_analysis_spark.delta.table import DeltaishTable

from tools import minikernel as mk


def _orders(spark, n=60):
    return (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            "o_orderstatus",
        )
        .limit(n)
    )


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def _agree(t: DeltaishTable, version=None):
    """The engine's read and the mini-kernel's read of the same table
    version must agree row-for-row (order- and column-order-
    insensitive, stringified values)."""
    got = mk.sorted_rows(mk.read_table(str(t.path), version))
    want = _spark_rows(t.read(version))
    assert got == want, (
        f"mini-kernel read diverges at version {version}: "
        f"{len(got)} vs {len(want)} rows"
    )
    return len(got)


def test_minikernel_shares_no_code():
    """The interop evidence is only as strong as the independence: the
    mini-kernel module must not import (or even mention) the engine
    package."""
    src = open(os.path.join("tools", "minikernel.py")).read()
    in_code = [
        ln
        for ln in src.splitlines()
        if "lakehouse_for_data_streaming_and_analysis_spark" in ln
        and not ln.lstrip().startswith(("#", '"', "'"))
        and "``" not in ln
    ]
    assert in_code == [], in_code
    import tools.minikernel as m

    assert not any(
        "lakehouse_for_data_streaming" in (getattr(v, "__name__", "") or "")
        for v in vars(m).values()
    )


def test_minikernel_reads_basic_partitioned_and_time_travel(spark, tmp_path):
    df = _orders(spark, 60)
    t = DeltaishTable.create(
        spark, str(tmp_path / "t"), df, partition_by=["o_orderstatus"]
    )
    v0 = t.version
    t.append(df.limit(10).withColumn("o_totalprice", F.lit(1.5)))
    t.delete(F.col("o_orderkey") % 7 == 0)  # copy-on-write rewrite
    assert _agree(t) > 0
    # time travel: the mini-kernel replays to the same past state
    assert mk.sorted_rows(mk.read_table(str(t.path), v0)) == _spark_rows(
        t.read(v0)
    )


def test_minikernel_reads_deletion_vectors(spark, tmp_path):
    df = _orders(spark, 80)
    t = DeltaishTable.create(spark, str(tmp_path / "t"), df)
    t.delete(F.col("o_orderkey") % 3 == 0, mode="merge_on_read")
    snap = t._snapshot()
    assert any(a.get("deletionVector") for a in snap.files.values())
    n = _agree(t)
    assert n == t.read().count()
    # and a second DV pass merges bitmaps — still agree
    t.delete(F.col("o_orderkey") % 5 == 0, mode="merge_on_read")
    _agree(t)


def test_minikernel_reads_column_mapping_and_rename(spark, tmp_path):
    df = _orders(spark, 40)
    t = DeltaishTable.create(spark, str(tmp_path / "t"), df)
    t.enable_column_mapping()
    t.rename_column("o_totalprice", "price_usd")
    t.append(
        _orders(spark, 10).withColumnRenamed("o_totalprice", "price_usd")
    )
    assert _agree(t) == 50
    assert "price_usd" in mk.read_table(str(t.path)).column_names


def test_minikernel_reads_type_widening(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10, 1.5), (2, 20, 2.5)], "id long, qty int, price float"
    )
    t = DeltaishTable.create(spark, str(tmp_path / "t"), df)
    t.widen_column_type("qty", "long")
    t.widen_column_type("price", "double")
    big = 2**40
    t.append(
        spark.createDataFrame(
            [(3, big, 3.5)], "id long, qty long, price double"
        )
    )
    tbl = mk.read_table(str(t.path))
    # the narrow files upcast to the widened logical schema
    assert tbl.schema.field("qty").type == pa.int64()
    assert tbl.schema.field("price").type == pa.float64()
    assert _agree(t) == 3


def test_minikernel_reads_classic_and_multipart_checkpoints(spark, tmp_path):
    df = _orders(spark, 50)
    t = DeltaishTable.create(spark, str(tmp_path / "t"), df)
    for i in range(3):
        t.append(df.limit(5))
    dlog.write_checkpoint(str(t.path), parts=1)
    assert _agree(t) == 65
    dlog.write_checkpoint(str(t.path), parts=3)  # multi-part layout
    assert _agree(t) == 65
    # after log cleanup the checkpoint is the only path to the state
    t.append(df.limit(5))
    t.cleanup_metadata(retention_hours=0)
    assert _agree(t) == 70


def test_minikernel_reads_v2_checkpoint_manifest_sidecars(spark, tmp_path):
    df = _orders(spark, 50)
    t = DeltaishTable.create(spark, str(tmp_path / "t"), df)
    t.enable_v2_checkpoints()
    t.delete(F.col("o_orderkey") % 4 == 0, mode="merge_on_read")
    t.append(df.limit(8))
    t.checkpoint_v2(sidecars=3)
    assert _agree(t) > 0
    # v2 manifest + sidecars survive log cleanup as the sole source
    t.cleanup_metadata(retention_hours=0)
    assert _agree(t) > 0


def test_minikernel_refuses_unknown_reader_feature(spark, tmp_path):
    df = _orders(spark, 10)
    t = DeltaishTable.create(spark, str(tmp_path / "t"), df)
    v = t.version + 1
    dlog.write_commit(
        str(t.path),
        v,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["frobnicationV9"],
                    "writerFeatures": ["frobnicationV9"],
                }
            }
        ],
    )
    with pytest.raises(ValueError, match="frobnicationV9"):
        mk.read_table(str(t.path))


# ------------------------------------------------------------ REVERSE

_SPEC_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_spec_style_table(root):
    """A foreign table whose checkpoint uses the SPEC's nested-struct
    action cells (real delta-spark's encoding) rather than this
    engine's JSON-string cells, plus a post-checkpoint JSON commit.
    Handwritten with pyarrow only."""
    os.makedirs(root / "_delta_log", exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array([0, 1], pa.int64()),
                  "v": pa.array(["a", "b"])}),
        str(root / "part-0.parquet"),
    )
    pq.write_table(
        pa.table({"id": pa.array([2], pa.int64()), "v": pa.array(["c"])}),
        str(root / "part-1.parquet"),
    )
    meta = {
        "id": "spec-style-fixture",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _SPEC_SCHEMA,
        "partitionColumns": [],
        "configuration": {},
    }
    proto = {"minReaderVersion": 1, "minWriterVersion": 2}
    with open(root / "_delta_log" / "00000000000000000000.json", "w") as f:
        for a in (
            {"protocol": proto},
            {"metaData": meta},
            {"add": {"path": "part-0.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 1, "dataChange": True}},
        ):
            f.write(json.dumps(a) + "\n")

    # checkpoint at v0 with TYPED NESTED STRUCT cells
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
        ]
    )
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    cp = pa.table(
        {
            "protocol": pa.array([proto, None, None], proto_t),
            "metaData": pa.array(
                [
                    None,
                    {
                        "id": meta["id"],
                        "schemaString": meta["schemaString"],
                        "partitionColumns": [],
                        "configuration": [],
                    },
                    None,
                ],
                meta_t,
            ),
            "add": pa.array(
                [
                    None,
                    None,
                    {
                        "path": "part-0.parquet",
                        "partitionValues": [],
                        "size": 1,
                        "modificationTime": 1,
                        "dataChange": True,
                    },
                ],
                add_t,
            ),
        }
    )
    pq.write_table(
        cp, str(root / "_delta_log" / "00000000000000000000.checkpoint.parquet")
    )
    with open(root / "_delta_log" / "_last_checkpoint", "w") as f:
        json.dump({"version": 0, "parts": 1}, f)
    # a post-checkpoint commit the replay must layer on top
    with open(root / "_delta_log" / "00000000000000000001.json", "w") as f:
        f.write(
            json.dumps(
                {"add": {"path": "part-1.parquet", "partitionValues": {},
                         "size": 1, "modificationTime": 2,
                         "dataChange": True}}
            )
            + "\n"
        )


def test_both_readers_consume_spec_style_struct_checkpoint(spark, tmp_path):
    """REVERSE direction: a foreign, spec-encoded log (nested-struct
    checkpoint cells) is read identically by the engine and the
    mini-kernel — the engine is not merely round-tripping its own
    serialization habits."""
    root = tmp_path / "foreign"
    _write_spec_style_table(root)
    t = DeltaishTable(spark, str(root))
    engine = _spark_rows(t.read())
    kernel = mk.sorted_rows(mk.read_table(str(root)))
    assert engine == kernel
    assert len(engine) == 3
    # and the engine can continue WRITING the foreign table; the
    # mini-kernel still reads the combined log
    t.append(spark.createDataFrame([(9, "z")], "id long, v string"))
    assert mk.sorted_rows(mk.read_table(str(root))) == _spark_rows(t.read())


def test_minikernel_validates_version_checksums(spark, tmp_path):
    """The writer's VERSION_CHECKSUM (.crc) artifacts validate under
    the INDEPENDENT reader's own replay at every version — including
    after deletes and rewrites — and a tampered crc is refused by
    both implementations."""
    df = _orders(spark, 40)
    t = DeltaishTable.create(spark, str(tmp_path / "t"), df)
    t.append(df.limit(6))
    t.delete(F.col("o_orderkey") % 2 == 0)
    t.overwrite(df.limit(9))
    for v in range(t.version + 1):
        assert mk.validate_crc(str(t.path), v) is True, v
        assert dlog.validate_version_checksum(str(t.path), v) is True, v
    p = dlog.checksum_file(str(t.path), t.version)
    crc = json.load(open(p))
    crc["numFiles"] += 1
    json.dump(crc, open(p, "w"))
    with pytest.raises(ValueError, match="mismatch"):
        mk.validate_crc(str(t.path))
    with pytest.raises(ValueError, match="mismatch"):
        dlog.validate_version_checksum(str(t.path))
