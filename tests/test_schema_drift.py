"""Schema-drift quarantine (sources/streams.parse_with_quarantine).

A real StreamingQuery over a file replay where batch 2 carries drifted
payloads (new keys + a type conflict): the stream must COMPLETE, parse
the clean rows, and land the drifted rows in the quarantine column
with the raw payload preserved — never fail the query (VERDICT r8 ask
#6's streaming half; batch census twin: schema_drift_audit).
"""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.sources.streams import (
    file_replay,
    parse_with_quarantine,
    write_replay_batches,
)

RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("payload", T.StringType()),
    ]
)

DECLARED = "k bigint, tag string"


def _batches(spark):
    clean1 = spark.createDataFrame(
        [(1, '{"k": 10, "tag": "a"}'), (2, '{"k": 20, "tag": "b"}')],
        RAW_SCHEMA,
    )
    drifted = spark.createDataFrame(
        [
            (3, '{"k": 30, "tag": "c", "sess": "s1", "ver": 2}'),  # new keys
            (4, '{"k": "oops", "tag": "d"}'),  # type conflict on k
            (5, '{"k": null, "tag": "e"}'),  # explicit null: NOT drift
        ],
        RAW_SCHEMA,
    )
    clean2 = spark.createDataFrame([(6, '{"k": 60, "tag": "f"}')], RAW_SCHEMA)
    return [clean1, drifted, clean2]


def test_drifted_batch_quarantined_not_failed(spark, tmp_path):
    src = str(tmp_path / "drift_src")
    write_replay_batches(_batches(spark), src)
    parsed = parse_with_quarantine(
        file_replay(spark, src, RAW_SCHEMA), "payload", DECLARED
    )
    q = (
        parsed.writeStream.format("memory")
        .queryName("drift_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()
    rows = {r.event_id: r for r in spark.table("drift_sink").collect()}
    assert len(rows) == 6

    # clean rows parse and carry no quarantine
    assert rows[1].k == 10 and rows[1].tag == "a"
    assert rows[1].quarantine is None and rows[6].quarantine is None

    # new-key drift: declared fields still parsed, reason names keys
    assert rows[3].k == 30 and rows[3].tag == "c"
    assert rows[3].quarantine.reason == "undeclared_keys:sess,ver"
    assert '"sess": "s1"' in rows[3].quarantine.payload

    # type conflict: field nulled, raw payload preserved for repair
    assert rows[4].k is None and rows[4].tag == "d"
    assert rows[4].quarantine.reason == "type_conflict:k"
    assert rows[4].quarantine.payload == '{"k": "oops", "tag": "d"}'

    # explicit null is a VALUE, not drift
    assert rows[5].k is None and rows[5].quarantine is None


def test_combined_reasons_and_batch_parity(spark):
    """Both drift classes in one payload produce both reasons, ';'
    joined in a stable order; batch and streaming DataFrames produce
    identical results (same pure-expression plan)."""
    df = spark.createDataFrame(
        [(7, '{"k": "bad", "tag": "g", "extra": 1}')], RAW_SCHEMA
    )
    out = parse_with_quarantine(df, "payload", DECLARED).collect()[0]
    assert out.quarantine.reason == (
        "undeclared_keys:extra;type_conflict:k"
    )
    assert out.k is None and out.tag == "g"


def test_unrepresentable_payload_quarantined_not_clean(spark):
    """Payloads the probe cannot represent must land in quarantine,
    not slip through as clean rows with all-null declared fields
    (ADVICE r9: NULL probe map made size(undeclared) NULL).  The probe
    keeps nested values as raw JSON strings, so a nested value on a
    declared field is handled by the TYPE branches: it coerces when
    the declared type can hold it (string) and flags type_conflict
    when it cannot (bigint).  Only malformed JSON and non-object
    documents null the probe — those take the new
    'unparseable_payload' branch."""
    df = spark.createDataFrame(
        [
            (1, '{"k": 1, "tag": {"nested": true}}'),  # nested on string
            (2, '{"k": [1, 2], "tag": "x"}'),  # nested on bigint
            (3, "not json at all"),  # malformed
            (4, "[1, 2, 3]"),  # non-object document
            (5, None),  # absent payload: NOT drift
            (6, '{"k": 6, "tag": "ok"}'),  # clean control
        ],
        RAW_SCHEMA,
    )
    rows = {
        r.event_id: r
        for r in parse_with_quarantine(df, "payload", DECLARED).collect()
    }
    # nested object coerces into the declared STRING field — clean
    assert rows[1].quarantine is None and rows[1].k == 1
    assert rows[1].tag == '{"nested":true}'
    # nested array cannot be a BIGINT — type conflict, raw preserved
    assert rows[2].quarantine.reason == "type_conflict:k"
    assert rows[2].k is None and rows[2].tag == "x"
    # probe-null classes: quarantined loudly, never "clean all-null"
    for eid in (3, 4):
        assert rows[eid].quarantine is not None, eid
        assert rows[eid].quarantine.reason == "unparseable_payload", eid
    assert rows[4].quarantine.payload == "[1, 2, 3]"
    assert rows[5].quarantine is None  # null payload is absence, not drift
    assert rows[6].quarantine is None and rows[6].k == 6


def test_quarantine_plan_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, '{"k": 1}')], RAW_SCHEMA)
    parsed = parse_with_quarantine(df, "payload", DECLARED)
    plan = parsed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # map-only: no shuffle introduced
