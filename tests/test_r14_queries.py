"""Round-14 additions: i65 model-based quality classifier (registered
this round — graduated from the r10 staging module per the SURVEY §7.12
ledger's named fate): the pure-Python independent reference and the
zero-exchange plan pin, migrated from tests/test_staged_r10.py.  Oracle
parity runs through the registry-wide differential suite
(tests/test_differential.py) like every registered query.  Plus the
round's edge-probe pins: the pre-epoch streaming session drop and the
non-finite-measure-is-missing contract (k03/k04), each on a constructed
frame at the mechanism level (the corpus-stripe sweeps prove parity;
these pin WHICH semantics and the pandas/Arrow behaviors they rest
on)."""

from __future__ import annotations

import numpy as np
import pandas as pd

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


def test_nonfinite_measure_is_missing_on_constructed_frame(spark):
    # the r14 non-finite measure probe's contract, pinned at its exact
    # semantics (the fixture stripes prove parity; this pins WHICH
    # semantics both engines agreed on): a NaN/Inf value contributes
    # nothing to k04's numerator but its weight STAYS in the denominator
    # — identical to a NULL measure — and an all-missing group is NULL,
    # not 0/den.  k03 masks non-finite out of the group statistics and
    # emits NULL z for those rows.
    import math

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    rows = [
        ("a", 10.0, 1), ("a", float("nan"), 2),
        ("a", float("inf"), 3), ("a", None, 4),
        ("b", float("-inf"), 5), ("b", float("nan"), 5),
    ]
    df = spark.createDataFrame(rows, "g string, value double, k int")

    @F.pandas_udf(T.DoubleType())
    def wmean(v: pd.Series, w: pd.Series) -> float:
        v = v.where(np.isfinite(v))
        if v.count() == 0:
            return None
        return float((v * w).sum() / w.sum())

    got = {r["g"]: r["m"] for r in
           df.groupBy("g").agg(wmean("value", "k").alias("m")).collect()}
    assert got["a"] == 1.0          # 10*1 / (1+2+3+4)
    assert got["b"] is None         # all measures missing -> NULL

    # k03: only moment-safe rows (|v| < 1e150, which sweeps NaN/Inf too)
    # enter mean/std; masked rows emit NULL
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].where(np.abs(pdf["value"]) < 1e150)
        std = v.std(ddof=1)
        if len(pdf) < 2 or pd.isna(std) or std == 0.0:
            z = pd.array([pd.NA] * len(pdf), dtype="Float64")
        else:
            z = (v - v.mean()) / std
        return pd.DataFrame({"k": pdf["k"], "z": z})

    frame = [("a", 1.0, 1), ("a", 3.0, 2), ("a", float("inf"), 3)]
    zdf = spark.createDataFrame(frame, "g string, value double, k int")
    zs = {r["k"]: r["z"] for r in
          zdf.groupBy("g").applyInPandas(zscore, "k int, z double").collect()}
    rt2 = math.sqrt(2.0) / 2.0
    assert abs(zs[1] + rt2) < 1e-12 and abs(zs[2] - rt2) < 1e-12
    assert zs[3] is None            # Inf row excluded, emits NULL


def test_landing_capacity_guards_on_constructed_frame(spark):
    # the r14 extreme-magnitude probe's contract, pinned at the mechanism:
    # a FINITE value the landing type cannot represent is MISSING, same
    # as a non-finite one.  Probed crash modes: Spark NUMERIC_VALUE_OUT_
    # OF_RANGE summing 1e300 into DECIMAL(18,4), ARITHMETIC_OVERFLOW in
    # e07's fixed-point multiply, CAST_OVERFLOW on int landings (DuckDB
    # hard-errors in each spot too), ceil CLAMPING to Long.Max, and
    # DuckDB stddev erroring past ~1e154 (x*x overflow).  Value-level
    # hash parity at these magnitudes is NOT in contract (sub-ULP
    # decimal conversion + fold-order ULP noise are inherent to IEEE
    # doubles); crash-robustness is.
    from pyspark.sql import functions as F

    from csv_to_parquet_aws_datalake_spark.functions.scalar import (
        BIGINT_BOUND, DECIMAL18_4_BOUND, MOMENT_BOUND, representable_or_null)

    df = spark.createDataFrame(
        [(0, 1e300), (1, -1e300), (2, float("nan")), (3, float("inf")),
         (4, 12345.6789), (5, 3.3e13), (6, None), (7, 1e100)],
        "i int, v double")
    out = df.select(
        "i",
        representable_or_null("v", DECIMAL18_4_BOUND)
        .cast("decimal(18,4)").alias("dec"),
        representable_or_null("v", BIGINT_BOUND).alias("big"),
        representable_or_null("v", MOMENT_BOUND).alias("mom"),
        F.col("v").try_cast("int").alias("ti"),
    ).collect()
    got = {r["i"]: (float(r["dec"]) if r["dec"] is not None else None,
                    r["big"], r["mom"], r["ti"]) for r in out}
    assert got[0] == (None, None, None, None)        # 1e300: x*x overflows too
    assert got[1] == (None, None, None, None)
    assert got[2] == (None, None, None, None)        # NaN masked everywhere
    assert got[3] == (None, None, None, None)        # Inf masked everywhere
    assert got[4] == (12345.6789, 12345.6789, 12345.6789, 12345)
    # 3.3e13 fits DECIMAL(18,4) (14 integer digits) and the double
    # bounds, but not INT: the try_cast landing alone masks it
    assert got[5][0] is not None and abs(got[5][0] - 3.3e13) < 1.0
    assert got[5][1:] == (3.3e13, 3.3e13, None)
    assert got[6] == (None, None, None, None)        # NULL stays NULL
    assert got[7] == (None, None, 1e100, None)       # moment-safe tier only
    # the whole DECIMAL landing is total: summing junk cannot raise
    s = df.select(representable_or_null("v", DECIMAL18_4_BOUND)
                  .cast("decimal(18,4)").alias("d")) \
          .agg(F.sum("d").alias("s")).collect()[0]["s"]
    assert abs(float(s) - (12345.6789 + 3.3e13)) < 1.0


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


def test_stream_resumes_from_checkpoint_exactly_once(spark, tmp_path):
    # the recovery property the j-family's fresh-checkpoint runs don't
    # exercise: a file-sink query killed after a partial run must RESUME
    # from its checkpoint and deliver exactly-once — the union of both
    # runs' outputs, no duplicates, no loss.  This is the property a
    # 1000-executor job leans on when a driver dies mid-ingest; Spark's
    # contract is checkpointed source offsets + transactional file-sink
    # commit log, and this pins that the plumbing (our scratch/session
    # settings included) actually delivers it.
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(lo, hi):
        spark.range(lo, hi).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 7).cast("double").alias("value"),
        ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        q = (spark.readStream
             .schema("event_id long, value double").parquet(src)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    write_batch(0, 500)
    run_once()                      # "crash" = clean stop after run 1
    first = spark.read.parquet(out).count()
    assert first == 500

    write_batch(500, 800)           # data that arrived while "down"
    run_once()                      # resume from the SAME checkpoint

    back = spark.read.parquet(out)
    assert back.count() == 800      # no loss, no replay of run 1's rows
    ids = [r["event_id"] for r in back.select("event_id").collect()]
    assert len(set(ids)) == 800 and min(ids) == 0 and max(ids) == 799


def test_stateful_agg_state_survives_restart(spark, tmp_path):
    # the STATE-STORE half of recovery (the file-sink test above covers
    # source offsets + sink commit log): a windowed aggregation's
    # partial state must survive a stop/restart so windows spanning the
    # two runs finalize with the SAME counts a single batch pass gives.
    # Run 1 sees the first half of a window's rows, run 2 the rest plus
    # later windows that advance the watermark past it — the finalized
    # window must count rows from BOTH runs (HDFS-backed state store
    # restored from checkpoint).
    import datetime

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def rows(lo, hi):
        return [(i, t0 + datetime.timedelta(minutes=i)) for i in range(lo, hi)]

    def write_batch(lo, hi):
        spark.createDataFrame(rows(lo, hi), "event_id long, ts timestamp") \
            .coalesce(1).write.mode("append").parquet(src)

    def run_once():
        q = (spark.readStream.schema("event_id long, ts timestamp")
             .parquet(src)
             .withWatermark("ts", "10 minutes")
             .groupBy(F.window("ts", "30 minutes").alias("w"))
             .agg(F.count(F.lit(1)).alias("n"))
             .select(F.col("w.start").alias("ws"), "n")
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    write_batch(0, 15)      # first half of window [10:00, 10:30)
    run_once()              # nothing finalizes: watermark at 10:04
    write_batch(15, 120)    # rest of it + enough to close later windows
    run_once()              # resume: state for [10:00,10:30) must be back

    got = {r["ws"].replace(tzinfo=None): r["n"]
           for r in spark.read.parquet(out).collect()}
    # window [10:00, 10:30) spans both runs: 15 rows from run 1's state
    # + 15 from run 2.  If state were lost on restart it would emit 15.
    assert got[t0] == 30
    # later fully-closed windows for completeness (watermark allows
    # finalization up to 11:49 - 10m -> windows ending <= 11:30)
    assert got[t0 + datetime.timedelta(minutes=30)] == 30
    assert got[t0 + datetime.timedelta(minutes=60)] == 30
