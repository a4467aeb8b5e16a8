"""CDC changelog merge, SCD2 history, and RRF fusion contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skrub_spark.operators.cdc import (
    apply_changes,
    latest_changes,
    scd2_history,
)
from skrub_spark.operators.fusion import rrf_fuse, to_ranking


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, val double",
    )


def _ch(spark, rows):
    return spark.createDataFrame(
        rows, "id long, name string, val double, op string, seq long"
    )


def test_apply_changes_upsert_delete(spark, base):
    ch = _ch(spark, [
        (2, "b2", 22.0, "U", 1),     # update existing
        (3, None, None, "D", 1),     # delete existing
        (4, "d", 40.0, "I", 1),      # insert new
        (5, None, None, "D", 1),     # delete nonexistent: no-op
        (6, "f", 60.0, "U", 1),      # update nonexistent: upsert
    ])
    got = {r["id"]: (r["name"], r["val"])
           for r in apply_changes(base, ch, "id", "seq").collect()}
    assert got == {
        1: ("a", 10.0), 2: ("b2", 22.0), 4: ("d", 40.0), 6: ("f", 60.0),
    }


def test_apply_changes_latest_wins_and_tiebreak(spark, base):
    ch = _ch(spark, [
        (2, "x", 1.0, "U", 1),
        (2, "y", 2.0, "U", 5),       # latest seq wins
        (3, "z", 3.0, "U", 7),
        (3, None, None, "D", 7),     # same seq: D beats U
    ])
    got = {r["id"]: r["name"]
           for r in apply_changes(base, ch, "id", "seq").collect()}
    assert got == {1: "a", 2: "y"}
    last = {r["id"]: r["op"]
            for r in latest_changes(ch, "id", "seq").collect()}
    assert last[3] == "D"


def test_scd2_intervals(spark):
    ch = _ch(spark, [
        (1, "v1", 1.0, "U", 10),
        (1, "v2", 2.0, "U", 20),
        (1, "v3", 3.0, "U", 30),
        (2, "w1", 9.0, "U", 5),
        (2, None, None, "D", 8),     # terminal delete
    ])
    h = {(r["id"], r["seq"]): (r["valid_from"], r["valid_to"], r["is_current"])
         for r in scd2_history(ch, "id", "seq").collect()}
    assert h[(1, 10)] == (10, 20, False)
    assert h[(1, 20)] == (20, 30, False)
    assert h[(1, 30)] == (30, None, True)
    assert h[(2, 5)] == (5, 8, False)
    assert h[(2, 8)] == (8, None, False)  # deleted: not current


def test_scd2_lookup_asof_and_strict(spark):
    from skrub_spark.operators.cdc import scd2_history, scd2_lookup

    ch = _ch(spark, [
        (1, "v1", 1.0, "U", 10),
        (1, "v2", 2.0, "U", 20),
        (1, "v3", 3.0, "U", 30),
    ])
    hist = scd2_history(ch, "id", "seq").select(
        "id", F.col("name").alias("state"), "valid_from", "valid_to"
    )
    facts = spark.createDataFrame(
        [(1, 10), (1, 15), (1, 20), (1, 35), (2, 10)], "id long, ts long"
    )
    asof = {(r["id"], r["ts"]): r["state"]
            for r in scd2_lookup(facts, hist, "id", "ts").collect()}
    # state AS OF ts: the change at ts is visible
    assert asof == {(1, 10): "v1", (1, 15): "v1", (1, 20): "v2",
                    (1, 35): "v3", (2, 10): None}
    strict = {(r["id"], r["ts"]): r["state"]
              for r in scd2_lookup(facts, hist, "id", "ts",
                                   strict=True).collect()}
    # leakage-safe: the change AT ts is NOT visible
    assert strict == {(1, 10): None, (1, 15): "v1", (1, 20): "v1",
                      (1, 35): "v3", (2, 10): None}
    # every fact matched at most one interval
    assert scd2_lookup(facts, hist, "id", "ts").count() == 5


def test_streaming_cdc_cross_batch_state(spark, tmp_path):
    """The state store must carry each key's best (seq, op) ACROSS
    micro-batches: a later-batch change below the earlier max is
    emitted applied=False; a genuinely newer one applies; a same-seq
    delete wins its tie within a batch."""
    from skrub_spark.streaming.ops import streaming_apply_changes

    d = tmp_path / "in"
    d.mkdir()
    schema = "id long, seq long, op string, val double"
    spark.createDataFrame(
        [(1, 10, "U", 1.0), (1, 12, "U", 1.2), (2, 5, "U", 2.0)], schema
    ).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(
        # key 1: seq 11 < state 12 -> not applied; key 2: 7 applies;
        # key 3 new: same-seq U/D tie -> D wins the batch and applies
        [(1, 11, "U", 1.1), (2, 7, "U", 2.7),
         (3, 9, "U", 3.0), (3, 9, "D", None)], schema
    ).coalesce(1).write.parquet(str(d / "f2"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d / "*"))
    )
    q = (
        streaming_apply_changes(stream, "id", "seq")
        .writeStream.format("memory")
        .queryName("cdc_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["id"], r["seq"], r["op"]): r["applied"]
           for r in spark.table("cdc_test").collect()}
    assert got[(1, 10, "U")] is False      # lost within batch 1
    assert got[(1, 12, "U")] is True
    assert got[(1, 11, "U")] is False      # beaten by cross-batch state
    assert got[(2, 5, "U")] is True
    assert got[(2, 7, "U")] is True
    assert got[(3, 9, "D")] is True        # tombstone wins the tie
    assert got[(3, 9, "U")] is False
    assert len(got) == 7                   # every change row emitted


def test_rrf_fusion_hand_computed(spark):
    a = spark.createDataFrame([(10, 0.9), (11, 0.8), (12, 0.7)],
                              "id long, s double")
    b = spark.createDataFrame([(11, 5.0), (13, 4.0)], "id long, s double")
    fused = {r["id"]: (r["n_lists"], r["rrf_score"])
             for r in rrf_fuse(
                 [to_ranking(a, "id", "s"), to_ranking(b, "id", "s")],
                 k=60).collect()}
    assert fused[10] == (1, 1.0 / 61)
    assert fused[11] == (2, 1.0 / 62 + 1.0 / 61)   # rank 2 in a, 1 in b
    assert fused[12] == (1, 1.0 / 63)
    assert fused[13] == (1, 1.0 / 62)
    # consensus doc 11 outranks either single-list doc
    assert fused[11][1] > fused[10][1]


def test_rrf_topn_and_ranking_ties(spark):
    # equal scores tie-break by id in to_ranking
    a = spark.createDataFrame([(7, 1.0), (3, 1.0), (5, 1.0)],
                              "id long, s double")
    ranks = {r["id"]: r["rank"] for r in to_ranking(a, "id", "s").collect()}
    assert ranks == {3: 1, 5: 2, 7: 3}
    top = rrf_fuse([to_ranking(a, "id", "s", limit=2)], topn=1).collect()
    assert [r["id"] for r in top] == [3]
