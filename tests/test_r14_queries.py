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

    # k03: only the finite rows enter mean/std; non-finite rows emit NULL
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].where(np.isfinite(pdf["value"]))
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
