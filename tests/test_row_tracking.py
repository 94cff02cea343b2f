"""Row tracking (protocol writer feature rowTracking + its
domainMetadata dependency): stable unique row ids with backfill at
enablement, fresh-id allocation under OCC, and PRESERVATION through
every rewrite path — update/delete (both modes), merge/merge_into,
OPTIMIZE/Z-ORDER/purge, restore, clones — via hidden materialized
columns. Parity target: the delta-spec's Row Tracking chapter."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.delta import DeltaishTable
from lakehouse_for_data_streaming_and_analysis_spark.delta import log as dlog


def _ids(t, version=None):
    return {
        r.k: (r._row_id, r._row_commit_version)
        for r in t.read_with_row_ids(version=version).collect()
    }


def _table(spark, tmp_path, n=10, name="t"):
    t = DeltaishTable.create(
        spark,
        str(tmp_path / name),
        spark.createDataFrame(
            [(i, float(i)) for i in range(n)], "k long, x double"
        ),
    )
    return t


def test_enable_backfills_and_appends_allocate_fresh(spark, tmp_path):
    t = _table(spark, tmp_path)
    v_en = t.enable_row_tracking()
    snap = t._snapshot()
    assert "rowTracking" in snap.protocol["writerFeatures"]
    assert "domainMetadata" in snap.protocol["writerFeatures"]
    ids = _ids(t)
    assert sorted(i for i, _ in ids.values()) == list(range(10))
    assert all(v == v_en for _, v in ids.values())
    hwm = json.loads(snap.domains["delta.rowTracking"])[
        "rowIdHighWaterMark"
    ]
    assert hwm == 9
    v_app = t.append(
        spark.createDataFrame([(100, 1.0), (101, 2.0)], "k long, x double")
    )
    ids2 = _ids(t)
    assert len(set(i for i, _ in ids2.values())) == 12  # all unique
    assert min(ids2[100][0], ids2[101][0]) == 10  # above old HWM
    assert ids2[100][1] == v_app


def test_update_preserves_id_bumps_version_only_for_modified(
    spark, tmp_path
):
    """THE preservation pin: an UPDATE rewrites whole files, but only
    the MODIFIED row's commit version moves — untouched rows in the
    same rewritten file keep id AND version (materialized columns)."""
    t = _table(spark, tmp_path)
    t.enable_row_tracking()
    before = _ids(t)
    v_upd = t.update("k = 3", {"x": "x + 100.0"})
    after = _ids(t)
    assert after[3] == (before[3][0], v_upd)
    for k in set(before) - {3}:
        assert after[k] == before[k]


def test_delete_and_both_mor_modes_preserve(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.enable_row_tracking()
    before = _ids(t)
    t.delete("k = 5")
    after = _ids(t)
    assert 5 not in after
    assert all(after[k] == before[k] for k in after)
    v_mor = t.update("k = 6", {"x": "x * 2"}, mode="merge_on_read")
    ids2 = _ids(t)
    assert ids2[6] == (before[6][0], v_mor)
    t.purge()  # materializing rewrite shifts row positions
    assert _ids(t) == ids2


def test_merge_update_inherits_insert_allocates(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.enable_row_tracking()
    before = _ids(t)
    v_m = t.merge(
        spark.createDataFrame([(4, 999.0), (300, 1.0)], "k long, x double"),
        ["k"],
    )
    after = _ids(t)
    assert after[4] == (before[4][0], v_m)  # updated row keeps id
    assert after[300][0] > max(i for i, _ in before.values())
    assert len(set(i for i, _ in after.values())) == len(after)
    v_mi = t.merge_into(
        spark.createDataFrame([(7, 0.0), (400, 4.0)], "k long, x double"),
        ["k"],
        when_matched=[{"action": "update_all"}],
        when_not_matched=[{"action": "insert_all"}],
    )
    final = _ids(t)
    assert final[7] == (after[7][0], v_mi)
    assert final[0] == after[0]  # untouched pass-through
    assert len(set(i for i, _ in final.values())) == len(final)


def test_optimize_zorder_preserve_everything(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.enable_row_tracking()
    for lo in (100, 200, 300):
        t.append(
            spark.createDataFrame(
                [(lo + i, float(i)) for i in range(5)], "k long, x double"
            )
        )
    before = _ids(t)
    t.optimize(target_bytes=1 << 30)
    assert _ids(t) == before
    t.zorder_by(["k"], n_files=2)
    assert _ids(t) == before


def test_restore_returns_old_ids(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.enable_row_tracking()
    before = _ids(t)
    v0 = t.version
    t.update("k = 2", {"x": "0.0"})
    t.delete("k = 1")
    t.restore(v0)
    assert _ids(t) == before


def test_concurrent_appends_get_disjoint_id_blocks(
    spark, tmp_path, monkeypatch
):
    """The OCC race: a second writer lands between this append's
    snapshot and its commit. The blind retry re-stamps baseRowId
    above the WINNER's high-water mark, so both commits' ids are
    disjoint — the domainMetadata HWM is the allocation authority."""
    t = _table(spark, tmp_path)
    t.enable_row_tracking()
    orig = DeltaishTable._write_files
    fired = {"done": False}

    def hook(self, df, partition_by=(), **kw):
        out = orig(self, df, partition_by, **kw)
        if not fired["done"]:
            fired["done"] = True
            DeltaishTable(spark, t.path).append(
                spark.createDataFrame(
                    [(500, 5.0), (501, 5.0)], "k long, x double"
                )
            )
        return out

    monkeypatch.setattr(DeltaishTable, "_write_files", hook)
    t.append(
        spark.createDataFrame([(600, 6.0), (601, 6.0)], "k long, x double")
    )
    monkeypatch.setattr(DeltaishTable, "_write_files", orig)
    ids = _ids(t)
    assert len(ids) == 14
    assert len(set(i for i, _ in ids.values())) == 14  # no collisions
    hwm = json.loads(
        t._snapshot().domains["delta.rowTracking"]
    )["rowIdHighWaterMark"]
    assert hwm == 13


def test_domains_survive_checkpoint_truncation(spark, tmp_path):
    t = _table(spark, tmp_path, n=3)
    t.enable_row_tracking()
    for i in range(12):
        t.append(
            spark.createDataFrame([(100 + i, 1.0)], "k long, x double")
        )
    root = str(tmp_path / "t")
    cp = dlog.last_checkpoint_version(root)
    assert cp is not None
    for v in range(0, cp):
        os.remove(dlog.version_file(root, v))
    ids = _ids(t)
    assert len(set(i for i, _ in ids.values())) == 15
    v_next = t.append(
        spark.createDataFrame([(999, 9.0)], "k long, x double")
    )
    ids2 = _ids(t)
    assert len(set(i for i, _ in ids2.values())) == 16
    assert ids2[999][1] == v_next


def test_clone_inherits_protocol_domains_and_ids(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.enable_row_tracking()
    src_ids = _ids(t)
    c = t.shallow_clone(str(tmp_path / "clone"))
    assert "rowTracking" in c._snapshot().protocol["writerFeatures"]
    clone_ids = {
        r.k: (r._row_id, r._row_commit_version)
        for r in c.read_with_row_ids().collect()
    }
    assert {k: v[0] for k, v in clone_ids.items()} == {
        k: v[0] for k, v in src_ids.items()
    }
    c.append(spark.createDataFrame([(777, 7.0)], "k long, x double"))
    ids2 = {
        r.k: r._row_id for r in c.read_with_row_ids().collect()
    }
    assert len(set(ids2.values())) == 11  # fresh id above inherited HWM
    d = t.deep_clone(str(tmp_path / "dclone"))
    d_ids = {
        r.k: r._row_id for r in d.read_with_row_ids().collect()
    }
    assert d_ids == {k: v[0] for k, v in src_ids.items()}


def test_row_tracking_guards(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(Exception):
        t.read_with_row_ids()  # not enabled -> no materialized cols
    t.enable_row_tracking()
    with pytest.raises(ValueError, match="already enabled"):
        t.enable_row_tracking()


def test_merge_matched_update_with_insert_under_cdf(spark, tmp_path):
    """The rt + CDF + matched_update + insert corner: the CDF insert
    image must come from the id-carrying source frame (a bare-source
    select of target columns would fail resolving _row_id)."""
    t = _table(spark, tmp_path)
    t.enable_change_data_feed()
    t.enable_row_tracking()
    before = _ids(t)
    v = t.merge(
        spark.createDataFrame(
            [(3, -1.0), (900, 9.0)], "k long, x double"
        ),
        ["k"],
        matched_update={"x": F.col("s.x")},
        matched_condition=F.col("s.x") < 0,
    )
    after = _ids(t)
    assert after[3] == (before[3][0], v)  # updated: id kept, rcv bumped
    assert after[900][0] not in {i for i, _ in before.values()}
    feed = t.read_change_feed(v - 1, v)
    kinds = sorted(r["_change_type"] for r in feed.collect())
    assert kinds == ["insert", "update_postimage", "update_preimage"]
    assert "_row_id" not in feed.columns
