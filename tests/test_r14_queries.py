"""i65 model-based quality classifier (registered round 14 — graduated
from the r10 staging module per the SURVEY §7.12 ledger's named fate):
the pure-Python independent reference and the zero-exchange plan pin,
migrated from tests/test_staged_r10.py.  Oracle parity runs through the
registry-wide differential suite (tests/test_differential.py) like
every registered query."""

from __future__ import annotations

from csv_to_parquet_aws_datalake_spark import registry
from csv_to_parquet_aws_datalake_spark.plans.checks import physical_plan

registry.load_all()


def test_i65_matches_pure_python_classifier(spark, sf_dir):
    # independent reference: the whole scorer recomputed in Python from
    # raw text (the shared-formula hazard guard — the oracle SQL mirrors
    # the Spark expressions, so a both-engines-wrong transcription would
    # pass the differential without this)
    import hashlib

    fn = registry.QUERIES["i65_quality_classifier"]
    got = {r["doc_id"]: (r["n_toks"], r["score_e4"], r["keep"])
           for r in fn(spark, sf_dir).collect()}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").collect()
    want = {}
    for r in docs:
        if r["text"] is None:
            continue
        toks = r["text"].split(" ")
        sw = sum(int(hashlib.md5(t.encode()).hexdigest()[:2], 16) - 128
                 for t in toks)
        n = len(toks)
        score = ((sw + 128 * n) * 10000) // (n * 256)  # operands >= 0
        want[r["doc_id"]] = (n, score, score >= 5000)
    assert got == want
    # the threshold must split the corpus (a one-sided keep gate would
    # mean the fixture never exercises the other branch)
    keeps = {v[2] for v in want.values()}
    assert keeps == {True, False}


def test_i65_plan_is_map_side_only(spark, sf_dir):
    # the i25/i56 idiom: no explode, no exchange at all — one
    # scan+project is the whole 100 TB cost
    fn = registry.QUERIES["i65_quality_classifier"]
    plan = physical_plan(fn(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Generate explode" not in plan
    assert "BatchEvalPython" not in plan  # pure JVM expressions


def test_streaming_session_drops_pre_epoch_sessions(spark, tmp_path):
    # the r14 pre-1970 probe's find, pinned at its root: Spark's
    # event-time watermark is born at epoch 0 and the session-window
    # state path filters late rows against it unconditionally (even in
    # complete mode, unlike tumbling/sliding aggs), so a pre-epoch
    # session is evicted as late-before-birth.  BATCH session_window
    # keeps it — the j03 contract (ts >= epoch on both engines) exists
    # precisely because of this batch/streaming asymmetry.
    import datetime
    import uuid

    from pyspark.sql import functions as F

    rows = [
        (1, datetime.datetime(1969, 6, 1, 10, 0, 0)),
        (1, datetime.datetime(1969, 6, 1, 10, 10, 0)),
        (2, datetime.datetime(2024, 1, 1, 10, 0, 0)),
        (2, datetime.datetime(2024, 1, 1, 10, 10, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    sess = lambda d: (d.groupBy(  # noqa: E731
        F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n")))
    assert {r["user_id"] for r in sess(df).collect()} == {1, 2}  # batch

    src = str(tmp_path / "preepoch")
    df.write.parquet(src)
    sink = "preepoch_" + uuid.uuid4().hex[:8]
    q = (sess(spark.readStream.schema(df.schema).parquet(src)
              .withWatermark("ts", "1 hour"))
         .writeStream.outputMode("complete").format("memory")
         .queryName(sink).trigger(availableNow=True).start())
    q.awaitTermination()
    assert {r["user_id"] for r in spark.table(sink).collect()} == {2}
