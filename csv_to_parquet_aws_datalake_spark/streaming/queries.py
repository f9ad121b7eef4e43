"""Structured Streaming operators (SURVEY.md §2.10, rows j01-j06, plus
the extension rows j07-j12 — stateful custom ops, stream-stream joins,
TTL dedup, and the j12 streaming-x-LSH ingest check).

Testability strategy (§2.10): stream FROM the driver parquet itself via
``readStream.schema(...).parquet(...)`` with ``trigger(availableNow=True)``
— deterministic, terminating, and for time-window aggregations equal to the
batch answer, so the batch SQL is the oracle.

Each callable runs the stream to completion synchronously, then returns the
materialized result as a batch DataFrame (the driver collects DataFrames).

Scale notes: these plans are the production shapes — tumbling/sliding/
session windows with watermark-gated state eviction.  On a cluster the
memory sink becomes Kafka/parquet and the state store becomes RocksDB; the
logical plan is unchanged (§7.4).
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..loader import load_table
from ..registry import query
from ..session import configure
from ..sources.io_paths import schedule_tag, scratch_dir

def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the file stream source requires a DIRECTORY; expose the single events
    # parquet through a scratch dir (hard link when possible, else copy)
    configure(spark)
    src = f"{sf_dir}/events.parquet"
    stream_dir = scratch_dir("stream_src", sf_dir)
    dst = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(dst):
        try:
            os.link(src, dst)
        except OSError:
            shutil.copyfile(src, dst)
    # readStream needs an explicit schema; take it from the file footer so the
    # stream tracks the driver's physical layout (timestamp[ns]-as-long in
    # early rounds, untagged timestamp[us] now) instead of hardcoding one.
    raw_schema = spark.read.parquet(src).schema
    raw = spark.readStream.schema(raw_schema).parquet(stream_dir)
    if dict(raw.dtypes).get("ts") == "bigint":  # nanosAsLong layout
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dict(raw.dtypes).get("ts") == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def _run_to_memory(agg: DataFrame, name: str, mode: str,
                   state_partitions: int | None = None,
                   no_data_batch: bool = True) -> DataFrame:
    """Drain ``agg`` through an availableNow memory sink.

    Both tuning confs below are captured by the stream's CLONED session
    at ``start()`` (StreamExecution clones the session state), so the
    set-then-restore around ``start()`` scopes them to this one stream.

    ``state_partitions`` sizes ``spark.sql.shuffle.partitions``, which
    becomes the stream's STATE partition count.  Stateful operators pay
    a per-partition fixed cost every micro-batch — one state-store
    instance (FOUR for a stream-stream join: keyToNumValues +
    keyWithIndexToValue per side) with its own checkpoint delta files —
    so a state-heavy stream sizes partitions to STATE VOLUME (the
    standard production target is ~100 MB-1 GB of state per store), not
    to scan parallelism; the default 32 here means 128 KB-scale stores
    for j08's fixture and the store overhead dominates runtime
    (measured sf0.01: 13.1 s at 32 partitions, 7.2 s at 8).  At 100 TB
    the same knob goes UP for the same reason.  Results are
    partitioning-invariant, so oracles are unaffected.

    ``no_data_batch=False`` disables the trailing no-data micro-batch
    (``spark.sql.streaming.noDataMicroBatches.enabled``).  That batch
    exists to advance the watermark once more so append-mode windowed
    aggregations EMIT windows finalized by the last data batch — a
    query whose output depends on it (j05's late-drop contract) must
    keep the default.  Streams whose every output row is produced
    inside data batches (update-mode stateful ops, stream-stream INNER
    joins — the no-data batch only evicts their state) skip it: the
    eviction pass costs a full state-store open/commit cycle across all
    partitions and produces nothing the drain can observe (measured
    sf0.01 on j08: 10.1 s with it, 3.3 s without)."""
    spark = agg.sparkSession
    sink = f"{name}_{uuid.uuid4().hex[:8]}"
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_ndb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    if not no_data_batch:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
                       "false")
    try:
        q = (agg.writeStream.outputMode(mode).format("memory")
             .queryName(sink).trigger(availableNow=True).start())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
                       old_ndb)
    q.awaitTermination()
    return spark.table(sink)


@query(
    "j01_stream_tumbling",
    oracle="""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
               count(*) AS n, round(sum(value), 2) AS sv
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
    streaming=True,
)
def j01_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    # un-timestamped events cannot enter an event-time window — Spark's
    # window()/watermark machinery already drops them; the filter (and
    # the oracles' WHERE ts IS NOT NULL) makes the contract explicit on
    # both engines (r13 null-ts probe: the batch oracle otherwise
    # buckets them into a NULL window group)
    ev = _events_stream(spark, sf_dir).filter(F.col("ts").isNotNull())
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sv")
    )
    return _run_to_memory(agg, "j01", "complete")


@query(
    "j02_stream_sliding",
    oracle="""
        SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS ws,
               event_type, count(*) AS n
        FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
        WHERE ts IS NOT NULL
        GROUP BY 1, 2
    """,
    streaming=True,
)
def j02_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1-hour window sliding every 15 min: each event lands in 4 windows;
    # the oracle reproduces the window set with an explicit slide-offset join
    ev = _events_stream(spark, sf_dir).filter(F.col("ts").isNotNull())
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    return _run_to_memory(agg, "j02", "complete")


@query(
    "j03_stream_session",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
            FROM flagged
        )
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_last,
               count(*) AS n_events
        FROM sessions GROUP BY user_id, sess
    """,
    streaming=True,
)
def j03_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30-min gap).  session_window's end is
    last-event + gap, so `session_last = end - 30 min`; the oracle is the
    batch gaps-and-islands formulation (e10), which produces identical
    session splits.

    PRE-EPOCH event times are out of the streaming session domain on
    both engines (r14 probe): Spark's event-time watermark is BORN at
    epoch 0, and the session-window state path filters late rows
    against it unconditionally — even in complete mode, unlike the
    tumbling/sliding aggregates — so a pre-1970 session is silently
    evicted as late-before-birth.  The filter below documents that
    contract on the Spark side (a no-op — the state operator already
    drops them) and the oracle mirrors it with ts >= epoch, exactly
    the r13 NULL-event-time treatment one class further out (pinned on
    a constructed frame in tests/test_r14_queries.py)."""
    ev = (_events_stream(spark, sf_dir)
          .filter(F.col("ts").isNotNull()
                  & (F.col("ts") >= F.lit("1970-01-01").cast("timestamp"))))
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            (F.col("w.end") - F.expr("INTERVAL 30 MINUTES")).alias("session_last"),
            "n_events",
        )
    )
    return _run_to_memory(agg, "j03", "complete")


@query(
    "j04_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    streaming=True,
)
def j04_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # streaming dedup with state eviction bounded by the watermark; a single
    # availableNow drain sees every duplicate, so batch DISTINCT is the oracle
    ev = _events_stream(spark, sf_dir)
    dedup = (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    # every first-seen row emits inside its data batch; the trailing
    # no-data batch only expires dedup state (see _run_to_memory)
    return _run_to_memory(dedup, "j04", "append", state_partitions=8,
                          no_data_batch=False)


# ---- j11: streaming dedup with TTL re-emission (registered round 16,
# ---- from the r16 staging bank — the §7.12 ledger's named move)

#: the j11 arrival schedule, shared by engine and oracle: all times are
#: minute offsets from T0; the TTL (watermark delay) is 10 minutes.
_J11_T0 = "2024-01-01 00:00:00"
_J11_ECHO_MIN = 5        # duplicate echo inside the TTL -> dropped
_J11_FILLERS = ((999001, 5), (999002, 90), (999003, 150))  # (key, minute)
_J11_BURST1_MIN = 180    # recurrence far past eviction -> re-emits


def _j11_ts(minutes: int) -> str:
    return (f"timestamp'{_J11_T0}'"
            f" + INTERVAL {minutes} MINUTES")


def j11_fixture_dir(sf_dir: str) -> str:
    """The j11 arrival fixture's scratch directory — shared with the
    fixture-order test so the schedule-tag inputs cannot drift apart
    (fixture identity tracks the schedule constants; ADVICE r15)."""
    from ..sources.io_paths import schedule_tag
    return scratch_dir(
        "j11", sf_dir,
        "ttl_arrivals_" + schedule_tag(
            _J11_T0, _J11_ECHO_MIN, _J11_FILLERS, _J11_BURST1_MIN,
            (3, 1, 2)))


@query(
    "j11_stream_dedup_ttl",
    oracle=f"""
        WITH keys AS (SELECT DISTINCT user_id % 20 AS key FROM events)
        SELECT key, TIMESTAMP '{_J11_T0}' AS ts FROM keys
        UNION ALL
        SELECT key, TIMESTAMP '{_J11_T0}'
                    + INTERVAL {_J11_BURST1_MIN} MINUTES FROM keys
        UNION ALL
        SELECT * FROM (VALUES
            {", ".join(f"(CAST({k} AS BIGINT), TIMESTAMP '{_J11_T0}'"
                       f" + INTERVAL {m} MINUTES)"
                       for k, m in _J11_FILLERS)}
        ) f(key, ts)
    """,
    streaming=True,
)
def j11_stream_dedup_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with a TTL: ``dropDuplicatesWithinWatermark``
    suppresses recurrences of a key only while its state lives (event
    time within the 10-minute watermark delay); once the watermark
    passes the first sighting's expiry the state is EVICTED and the
    next recurrence re-emits.  j04 proves the suppress side in a single
    drain; this query replays a deterministic 5-file arrival schedule
    (maxFilesPerTrigger=1 -> 5 micro-batches) that makes the whole TTL
    lifecycle observable and value-deterministic:

      file 0  burst 0: every key x3 identical rows at T0      -> emit 1
      file 1  echo: every key at T0+5min (inside the TTL)     -> DROPPED
              + filler 999001 (advances the watermark)
      file 2  filler 999002 at T0+90min   -- two watermark-advancing
      file 3  filler 999003 at T0+150min  -- batches guarantee burst-0
              state eviction BEFORE burst 1 arrives, independent of
              whether the store evicts at batch start or commit (the
              watermark for batch k derives from batches <= k-1, so
              eviction lags one batch behind the data that justifies it)
      file 4  burst 1: every key x2 at T0+180min              -> RE-EMIT

    Every emission carries a value-unique (key, ts) — replicas inside a
    burst are byte-identical rows — so although WHICH replica emits is
    task-order-dependent, the output multiset is deterministic and the
    batch oracle is exact: one row per key per burst plus the fillers.

    Scale shape: the dedup state is one entry per live key, bounded by
    the TTL window's key cardinality (NOT history — the point of the
    operator); state partitions are sized to state volume and the
    trailing no-data batch is skipped because every output row emits
    inside its data batch (the j04/r15 tuning contract).  The arrival
    fixture derives from the events table with no collect()."""
    import glob

    from ..loader import load_table
    ev = load_table(spark, sf_dir, "events")
    src = j11_fixture_dir(sf_dir)
    n_files = 5
    expected = [os.path.join(src, f"{i:02d}.parquet") for i in range(n_files)]
    if not all(os.path.exists(p) for p in expected):
        shutil.rmtree(src, ignore_errors=True)
        os.makedirs(src)
        keys = ev.select((F.col("user_id") % 20).alias("key")).distinct()

        def burst(minutes: int, replicas: int) -> DataFrame:
            return (keys
                    .withColumn("ts", F.expr(_j11_ts(minutes)))
                    .crossJoin(F.broadcast(
                        spark.range(replicas).select(F.lit(1).alias("_r"))))
                    .drop("_r"))

        def filler(key: int, minutes: int) -> DataFrame:
            return spark.range(1).select(
                F.lit(key).cast("long").alias("key"),
                F.expr(_j11_ts(minutes)).alias("ts"))

        files = [
            burst(0, 3),
            burst(_J11_ECHO_MIN, 1).unionByName(
                filler(*_J11_FILLERS[0])),
            filler(*_J11_FILLERS[1]),
            filler(*_J11_FILLERS[2]),
            burst(_J11_BURST1_MIN, 2),
        ]
        # sequential writes: the file stream source replays in
        # (mtime, path) order, so both orders agree with the schedule
        for i, df in enumerate(files):
            d = os.path.join(src, f"f{i:02d}")
            df.coalesce(1).write.mode("overwrite").parquet(d)
            parts = glob.glob(os.path.join(d, "part-*.parquet"))
            if not parts:
                raise RuntimeError(f"j11 fixture file {i} wrote no part")
            os.rename(parts[0], expected[i])
            shutil.rmtree(d)

    stream = (spark.readStream.schema("key long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(src))
    dedup = (stream.withWatermark("ts", "10 minutes")
             .dropDuplicatesWithinWatermark(["key"])
             .select("key", "ts"))
    return _run_to_memory(dedup, "j11", "append", state_partitions=8,
                          no_data_batch=False)


@query("j05_stream_late_drop", streaming=True)  # batch-boundary-dependent -> rows-only (§7.3/7)
def j05_stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-row dropping, observable only across micro-batches:
    events are replayed as 4 arrival-ordered files (≈5% shifted to arrive
    two files late), maxFilesPerTrigger=2 forces 2 batches — a +2-file
    shift moves chunk-0/1 events exactly one batch after their peers,
    while chunk-2/3 shifts clamp (F.least) into file 3, the same batch 2
    as their unshifted peers, so only the first two chunks' shifted
    events actually arrive late (ADVICE r14) — and a 30-min
    watermark in append mode drops rows older than watermark and withholds
    unfinalized windows.  Two batches are the MINIMUM that observes a
    drop (batch 1 advances the watermark, batch 2 delivers rows behind
    it) and prove the identical invariant the earlier 5-batch replay did
    at 2.5x the state-store churn (r14 suite-time work, VERDICT r13
    item 2; the leaf name hashes the schedule constants so fixture
    identity tracks the contract — ADVICE r15)."""
    from ..loader import load_table
    from ..sources.io_paths import schedule_tag
    ev = load_table(spark, sf_dir, "events")
    n_files = 4
    src = scratch_dir("j05", sf_dir,
                      "arrivals_" + schedule_tag(n_files, 20, 2))
    expected = [os.path.join(src, f"{i:02d}.parquet") for i in range(n_files)]
    if not all(os.path.exists(p) for p in expected):
        # deterministic arrival schedule: chunk by event_id; every 20th
        # event arrives two chunks later (late by event time).  The fixture
        # is content-deterministic, so an existing one is reused as-is.
        shutil.rmtree(src, ignore_errors=True)
        os.makedirs(src)
        total = ev.count()
        chunk = max(1, total // n_files)
        arrival = ev.withColumn(
            "file_idx",
            F.least(F.lit(n_files - 1),
                    F.expr(f"event_id div {chunk}")
                    + F.when(F.col("event_id") % 20 == 0, 2).otherwise(0)))
        import glob
        for i in range(n_files):
            d = os.path.join(src, f"f{i:02d}")
            (arrival.filter(F.col("file_idx") == i).drop("file_idx")
             .coalesce(1).write.mode("overwrite").parquet(d))
            # flatten the single-file dir into an ordered file name: the
            # file stream source replays files in (mtime, path) order
            part = glob.glob(os.path.join(d, "part-*.parquet"))[0]
            os.rename(part, expected[i])
            shutil.rmtree(d)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2).parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    return _run_to_memory(agg, "j05", "append")


@query(
    "j08_stream_stream_join",
    oracle="""
        SELECT p.event_id AS pid, c.event_id AS cid
        FROM events p JOIN events c
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE
                      AND p.ts + INTERVAL 10 MINUTE
    """,
    streaming=True,
)
def j08_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: purchases joined to clicks of the same
    user within ±10 minutes.  Both sides carry watermarks and the join has
    an event-time range condition, which is exactly what lets Spark bound
    the join STATE — each side buffers only rows younger than
    watermark + range, the crux of stream joins at production scale.  One
    availableNow batch sees everything, so the batch join is the oracle."""
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select("user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid"))
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .select(F.col("user_id").alias("c_user"),
                F.col("ts").alias("cts"), F.col("event_id").alias("cid"))
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & F.col("cts").between(
            F.col("pts") - F.expr("INTERVAL 10 MINUTES"),
            F.col("pts") + F.expr("INTERVAL 10 MINUTES"),
        ),
        "inner",
    ).select("pid", "cid")
    # 4 state stores per partition (two per buffered side) — size the
    # state partition count to the join state, not the scan; inner-join
    # output is complete without the trailing eviction-only no-data
    # batch (see _run_to_memory)
    return _run_to_memory(joined, "j08", "append", state_partitions=8,
                          no_data_batch=False)


# ---- j13: stream-stream LEFT OUTER join (flush-sentinel bounded;
# ---- registered round 19 from the r16 staging bank — the §7.17
# ---- ledger's named move) ---------------------------------------------------

#: sentinel lead over the last real event: far past any join window, so
#: the sentinel pair can only match each other (filtered post-drain).
_J13_SENTINEL_DAYS = 30


@query(
    "j13_stream_outer_join",
    oracle="""
        SELECT p.event_id AS pid, c.event_id AS cid
        FROM events p LEFT OUTER JOIN events c
          ON p.user_id = c.user_id
         AND c.event_type = 'click'
         AND c.ts IS NOT NULL
         AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE
                      AND p.ts + INTERVAL 10 MINUTE
        WHERE p.event_type = 'purchase' AND p.ts IS NOT NULL
    """,
    streaming=True,
)
def j13_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: purchases joined to clicks of the
    same user within ±10 minutes, UNMATCHED purchases emitting a
    NULL-padded row — the semantics j08 (inner) cannot observe.  The
    outer row for purchase p emits only when the watermark PROVES no
    click can still arrive (wm > p.ts + range), so a naive availableNow
    drain is not batch-equal: the final watermark stalls at
    max_real_ts - delay and every purchase in the last delay+range of
    event time would stay in state, its outer row withheld.  The fix is
    the production flush-sentinel (punctuation/heartbeat) pattern: one
    far-future row per side (_J13_SENTINEL_DAYS days past the last
    real event, negative ids, self-matching only each other) appended
    as a SECOND micro-batch file, driving the final watermark past
    every real eviction time; the sentinel self-match is dropped from
    the drained table post-hoc (a batch filter on the memory sink —
    deliberately NOT a streaming-side filter, which Catalyst could push
    below the watermark node and silently unflush the stream).  With
    the flush, the batch LEFT JOIN is an exact oracle.

    The trailing no-data batch stays ENABLED (unlike j04/j08/j11): the
    watermark for batch k derives from batches <= k-1, so the evictions
    the sentinel justifies — and the outer emissions they produce —
    happen one batch AFTER the sentinel's data batch (j05's class).

    Scale shape: identical to j08 — both sides buffer only rows younger
    than watermark + range (the range condition is what bounds join
    state), 4 state stores per partition sized to state volume.  The
    sentinel costs one row per side per drain; on a real cluster the
    same row is a scheduled heartbeat topic, the standard way to close
    windows over quiet partitions.  The shuffle shape is gated by the
    BATCH-TWIN plan pin in tests/test_r19_queries.py (stream drains are
    skipped by the exchange-budget sweep by design)."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("ts").isNotNull()))
    cols = ["event_id", "user_id", "event_type", "ts"]
    src = scratch_dir(
        "j13", sf_dir,
        "outer_arrivals_" + schedule_tag(_J13_SENTINEL_DAYS, tuple(cols)))
    expected = [os.path.join(src, f"{i:02d}.parquet") for i in range(2)]
    if not all(os.path.exists(p) for p in expected):
        shutil.rmtree(src, ignore_errors=True)
        os.makedirs(src)
        real = ev.select(*cols)
        # sentinel rows derived frame-side from the max-ts aggregate —
        # no driver collect() (the j11 fixture convention), one row per
        # side so BOTH watermarks advance
        sentinel = (real.agg(F.max("ts").alias("mt"))
                    .select(F.explode(F.array(
                        F.lit("purchase"), F.lit("click"))).alias("event_type"),
                        F.col("mt"))
                    .select(
                        F.when(F.col("event_type") == "purchase", -1)
                        .otherwise(-2).cast("long").alias("event_id"),
                        F.lit(-1).cast("long").alias("user_id"),
                        "event_type",
                        (F.col("mt") + F.expr(
                            f"INTERVAL {_J13_SENTINEL_DAYS} DAYS")).alias("ts"))
                    .select(*cols))
        for i, df in enumerate([real, sentinel]):
            d = os.path.join(src, f"f{i:02d}")
            df.coalesce(1).write.mode("overwrite").parquet(d)
            parts = glob.glob(os.path.join(d, "part-*.parquet"))
            if not parts:
                raise RuntimeError(f"j13 fixture file {i} wrote no part")
            os.rename(parts[0], expected[i])
            shutil.rmtree(d)

    stream = (spark.readStream
              .schema("event_id long, user_id long,"
                      " event_type string, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(src))
    purchases = (stream.filter(F.col("event_type") == "purchase")
                 .withWatermark("ts", "1 hour")
                 .select("user_id", F.col("ts").alias("pts"),
                         F.col("event_id").alias("pid")))
    clicks = (stream.filter(F.col("event_type") == "click")
              .withWatermark("ts", "1 hour")
              .select(F.col("user_id").alias("c_user"),
                      F.col("ts").alias("cts"),
                      F.col("event_id").alias("cid")))
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & F.col("cts").between(F.col("pts") - F.expr("INTERVAL 10 MINUTES"),
                               F.col("pts") + F.expr("INTERVAL 10 MINUTES")),
        "left_outer").select("pid", "cid")
    out = _run_to_memory(joined, "j13", "append", state_partitions=8)
    # post-drain batch filter over the memory sink (see docstring); the
    # PRE-filter drained table rides along as an attribute of the
    # returned frame — the sentinel pin must prove the filter removed
    # EXACTLY the (-1, -2) self-match (asserting on the filtered output
    # alone is vacuous, ADVICE r16), and an attached attribute scopes
    # that test surface to the frame's lifetime instead of a module
    # global retaining DataFrames for the process (ADVICE r17); the pin
    # asserts hasattr loudly, so a wrapper dropping it fails with a
    # message, not an AttributeError (ADVICE r18)
    filtered = out.filter(F.col("pid") >= 0)
    filtered.j13_pre_filter = out
    return filtered


# ---- j14: state-store inspection (streaming-state observability;
# ---- pulled forward from the r16 staging bank's spares in round 19 —
# ---- the r15/r16/r17/r18 pull-forward precedent) ----------------------------

@query(
    "j14_state_store_inspection",
    oracle="""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
               count(*) AS n
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
    streaming=True,
)
def j14_state_store_inspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-state OBSERVABILITY: drain a windowed aggregation
    through a real checkpoint, then read the checkpoint's state store
    back as a DataFrame with Spark's `statestore` reader — the
    production ops tool for inspecting (and debugging) a live stream's
    state without stopping it, and the registry's first consumer of
    the state-reader data source.  The correctness claim is the
    operator's point: after a complete-mode availableNow drain the
    checkpointed state IS the aggregation — every (window, event_type)
    group with its running count — so the batch j01 aggregate is an
    exact oracle for a frame read from STATE, not from the sink.

    The stream writes to a `noop` sink on purpose: nothing is read
    back from any sink, proving the state reader alone reconstructs
    the full aggregate (complete mode holds every window in state; an
    append-mode stream's state would hold only unfinalized windows —
    a different, watermark-dependent observable).

    Scale shape: the state read is partition-parallel over the
    checkpoint's state files (one task per state partition — the same
    8 partitions the drain wrote, sized to state volume per the
    _run_to_memory contract); at 100 TB the same read pattern powers
    state-size dashboards and skew forensics on RocksDB checkpoints."""
    ev = _events_stream(spark, sf_dir).filter(F.col("ts").isNotNull())
    # fresh checkpoint per run (the j06 convention: a reused checkpoint
    # would replay nothing; the state read must see THIS drain's state)
    base = scratch_dir("j14", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    ck = os.path.join(base, "ckpt")

    agg = (ev.withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n")))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (agg.writeStream.outputMode("complete").format("noop")
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    q.awaitTermination()

    state = spark.read.format("statestore").load(ck)
    return state.select(
        F.col("key.window.start").alias("ws"),
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("n"))


@query(
    "j07_stateful_custom",
    oracle="SELECT user_id, count(*) AS n FROM events GROUP BY 1",
    streaming=True,
)
def j07_stateful_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState: a
    per-user running event counter held in explicit GroupState — the
    extension point for operators Spark's built-in aggregates can't express
    (the north star's 'custom stateful operators').  One availableNow batch
    drains everything, so the batch groupBy is the oracle."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def count_events(key, pdf_iter, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    ev = _events_stream(spark, sf_dir)
    counted = (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            count_events,
            outputStructType="user_id long, n long",
            stateStructType="n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    # per-user GroupState is KB-scale here — size the state partition
    # count to it; update-mode output needs no trailing no-data batch
    # (NoTimeout state, nothing watermark-driven to emit — see
    # _run_to_memory)
    return _run_to_memory(counted, "j07", "update", state_partitions=8,
                          no_data_batch=False)


@query(
    "j06_stream_sink_parquet",
    oracle="""
        SELECT event_type, count(*) AS n, round(sum(value), 2) AS sv
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1
    """,
    streaming=True,
)
def j06_stream_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    # end-to-end stream -> parquet files + checkpoint (exactly-once file
    # sink); the curated output is re-read and aggregated against the batch
    # oracle.  Fresh checkpoint per run: a reused checkpoint would replay
    # nothing and emit an empty table.
    ev = _events_stream(spark, sf_dir)
    # stable dir, wiped per run: deletion gives the fresh-checkpoint
    # guarantee without accumulating uuid-named orphans in .scratch
    base = scratch_dir("j06", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    q = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .select("event_id", "event_type", "value")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))


@query(
    "j09_foreach_batch",
    oracle="""
        SELECT event_type, count(*) AS n, round(sum(value), 2) AS sv
        FROM events GROUP BY 1
    """,
    streaming=True,
)
def j09_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch — the production sink escape hatch: each micro-batch
    arrives as a BATCH DataFrame inside a user callback, which is how
    streams reach sinks with no streaming writer (JDBC upserts, MERGE
    INTO).  Idempotence discipline: the batch writes to a batch_id-named
    partition with mode=overwrite, so a replayed batch after failure
    overwrites its own output instead of duplicating — exactly-once at the
    sink built from at-least-once delivery + deterministic batch ids.
    The read-back aggregate must equal the batch answer."""
    ev = _events_stream(spark, sf_dir)
    base = scratch_dir("j09", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .parquet(os.path.join(out, f"batch_id={batch_id}")))

    q = (ev.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sv"))


@query(
    "j10_stream_static_join",
    oracle="""
        SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS sv
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY 1
    """,
    streaming=True,
)
def j10_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: enrich a stream with a batch dimension (the
    single most common streaming-ETL shape — events against a user/device
    table).  The static side is re-planned per micro-batch; it carries NO
    broadcast hint (r11 broadcast-bound audit) because customer is
    SF-PROPORTIONAL, not a bounded dimension: the planner sizes it off
    the parquet scan each micro-batch, auto-broadcasting while it fits
    (keeping the stream side shuffle-free) and key-shuffling beyond the
    broadcast budget — a forced hint would pin every micro-batch onto a
    100 TB OOM.  State is only needed for the downstream aggregate, not
    the join itself (unlike j08's stream-stream case).  availableNow
    drains everything in one batch, so the batch join+groupBy is the
    oracle."""
    ev = _events_stream(spark, sf_dir)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment")
    joined = ev.join(cust, ev.user_id == cust.c_custkey)
    agg = (joined.groupBy("c_mktsegment")
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("sv")))
    return _run_to_memory(agg, "j10", "complete")


# ---- j12: streaming near-dup ingest check (stream-vs-corpus LSH;
# ---- registered round 17 from the r16 staging bank — the §7.15
# ---- ledger's named move) --------------------------------------------------

#: per-ROW MinHash signature expressions — the i34 slot contract
#: (slot k = min over distinct shingles of hex digits [8*(k%4)+1, +8)
#: of md5(seed(k//4) || shingle)) restated as map-side higher-order
#: functions: a STREAM cannot run i34's shingle-explode + groupBy-min
#: (a per-doc streaming aggregation would need watermark state), but
#: min-over-a-row's-own-shingles needs no aggregation at all —
#: array_min(transform(...)) is stateless, so the signature computes
#: inside any micro-batch.  Equality with the registered kernel's
#: groupBy formulation is pinned in tests.
_ROW_SHINGLES = ("array_distinct(transform(sequence(1, size(t) - 2),"
                 " i -> concat_ws(' ', slice(t, i, 3))))")


def _row_sig_cols() -> list[str]:
    return [
        f"array_min(transform(shd, sh -> substring(md5(concat('{k // 4}|',"
        f" sh)), {(k % 4) * 8 + 1}, 8))) AS s{k}"
        for k in range(8)
    ]


#: re-keying offset for the simulated re-crawl batch: src19 documents
#: re-submitted under new ids, so every batch doc is GUARANTEED to
#: collide with its corpus original (identical text -> identical
#: shingles -> identical bands, the minhash_band_pairs no-false-negative
#: guarantee) — the output is non-empty at every SF by construction,
#: plus whatever genuine near-dups banding surfaces.  1 << 40 is the
#: repo's shard_offset convention (every other id-amplification path
#: offsets by rep * 2^40), far above any real doc_id space — a small
#: additive constant could collide batch ids with genuine corpus ids
#: at larger scale factors (ADVICE r15).
_J12_REKEY = 1 << 40



def j12_bands_frame(frame: DataFrame) -> DataFrame:
    """(doc_id, b, bk) LSH band keys of a (doc_id, text) frame via the
    per-ROW signature formulation — stateless map-side expressions, so
    it applies unchanged to a STREAM (no aggregation before the band
    join) and to the static corpus side; the batch-twin plan pin in
    tests/test_r17_queries.py builds on it too."""
    sig = (frame
           .withColumn("t", F.split("text", " "))
           .filter(F.size("t") >= 3)
           .withColumn("shd", F.expr(_ROW_SHINGLES))
           .selectExpr("doc_id", *_row_sig_cols()))
    return sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("b"),
                F.md5(F.concat(F.col(f"s{2*j}"),
                               F.col(f"s{2*j+1}"))).alias("bk"))
            for j in range(4)
        ])).alias("band"),
    ).select("doc_id", "band.b", "band.bk")


def _j12_oracle() -> str:
    mins = ",\n                   ".join(
        f"min(substr(h{k // 4}, {(k % 4) * 8 + 1}, 8)) AS s{k}"
        for k in range(8))
    bands = "\n            UNION ALL ".join(
        f"SELECT doc_id, source, {j} AS b, md5(s{2*j} || s{2*j+1}) AS bk"
        f" FROM sig" for j in range(4))
    return f"""
        WITH toks AS (
            SELECT doc_id, source, string_split(text, ' ') AS t
            FROM documents
            WHERE text IS NOT NULL
              AND len(string_split(text, ' ')) >= 3
        ), sh AS (
            SELECT DISTINCT doc_id, source,
                   unnest(list_transform(range(1, len(t) - 1),
                          i -> array_to_string(t[i:i+2], ' '))) AS sh
            FROM toks
        ), hashed AS (
            SELECT doc_id, source, md5('0|' || sh) AS h0,
                   md5('1|' || sh) AS h1
            FROM sh
        ), sig AS (
            SELECT doc_id, source,
                   {mins}
            FROM hashed GROUP BY 1, 2
        ), bands AS (
            {bands}
        )
        SELECT n.doc_id + {_J12_REKEY} AS batch_doc,
               c.doc_id AS corpus_doc,
               CAST(count(*) AS BIGINT) AS n_band_hits
        FROM bands n JOIN bands c ON n.b = c.b AND n.bk = c.bk
        WHERE n.source = 'src19'
        GROUP BY 1, 2
    """


@query("j12_stream_neardup_ingest", oracle=_j12_oracle(), streaming=True)
def j12_stream_neardup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-on-ingest: a STREAMED batch of re-crawled documents (the
    i35 convention's src19 slice, re-submitted under new ids — the
    `_J12_REKEY` offset) is checked for near-duplicates against the
    static corpus via MinHash LSH banding — the production pattern that
    keeps an ingestion pipeline from re-admitting near-copies of what
    the corpus already holds, and the registry's first streaming x LSH
    composition (j04/j11 dedup exact keys in-stream; i34/i35 dedup in
    batch).  Every re-crawled doc is guaranteed to surface its corpus
    original (identical text -> identical bands, n_band_hits = 4), so
    the check is non-vacuous at every SF.

    Mechanics: the corpus side's (band, key) frame is computed ONCE in
    batch and pinned (localCheckpoint — a stream-static join re-reads
    the static side every micro-batch, so an unpinned plan would
    re-shingle the whole corpus per trigger); the stream side computes
    per-row signatures with the map-side `_ROW_SIG_COLS` formulation
    (no streaming aggregation — see `_ROW_SHINGLES`), explodes its 4
    band keys statelessly, inner-joins the static bands, and counts
    band hits per (batch_doc, corpus_doc) as a complete-mode streaming
    aggregation drained through availableNow in 2 micro-batches
    (row-number-parity file split, maxFilesPerTrigger=1 — the count state
    accumulates across batches, proving the aggregation is genuinely
    streaming, and complete mode makes the final table chunk-invariant).

    Scale shape: band equi-join (never all-pairs, the i34 guarantee);
    the stream side's per-row work is O(tokens) map-side; state is one
    counter per candidate PAIR — bounded by band-collision counts, the
    LSH knob.  State partitions sized to state volume; the trailing
    no-data batch is skipped (complete-mode aggs emit with the data —
    the j04/r15 tuning contract)."""
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()))
    corpus_bands = j12_bands_frame(d).localCheckpoint()

    # fixture identity tracks the schedule constants (ADVICE r15): any
    # edit to the rekey offset, source slice, or split scheme lands in a
    # fresh directory instead of silently replaying a stale fixture
    src = scratch_dir(
        "j12", sf_dir,
        f"ingest_batch_{schedule_tag(_J12_REKEY, 'src19', 'rownum-parity')}")
    expected = [os.path.join(src, f"{i:02d}.parquet") for i in range(2)]
    if not all(os.path.exists(p) for p in expected):
        shutil.rmtree(src, ignore_errors=True)
        os.makedirs(src)
        # split by row_number parity, not doc_id parity: a scale factor
        # whose src19 slice is single-parity would leave one micro-batch
        # file empty and silently degrade the 2-batch contract (ADVICE
        # r15); row_number guarantees both shards non-empty whenever the
        # slice has >= 2 docs, and fewer fails loudly below
        batch = (d.filter(F.col("source") == "src19")
                 .select((F.col("doc_id") + _J12_REKEY).alias("doc_id"),
                         "text")
                 .withColumn("_rn", F.row_number().over(
                     Window.orderBy("doc_id"))))
        if batch.count() < 2:
            raise RuntimeError(
                "j12 ingest fixture needs >= 2 src19 docs to fill both "
                "micro-batch files")
        for i in range(2):
            part_dir = os.path.join(src, f"f{i:02d}")
            (batch.filter(F.col("_rn") % 2 == i).drop("_rn")
             .coalesce(1).write.mode("overwrite").parquet(part_dir))
            parts = glob.glob(os.path.join(part_dir, "part-*.parquet"))
            if not parts:
                raise RuntimeError(f"j12 fixture shard {i} wrote no file")
            os.rename(parts[0], expected[i])
            shutil.rmtree(part_dir)

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    hits = (j12_bands_frame(stream)
            .withColumnRenamed("doc_id", "batch_doc")
            .join(corpus_bands.withColumnRenamed("doc_id", "corpus_doc"),
                  ["b", "bk"])
            .groupBy("batch_doc", "corpus_doc")
            .agg(F.count(F.lit(1)).alias("n_band_hits")))
    return _run_to_memory(hits, "j12", "complete", state_partitions=8,
                          no_data_batch=False)


