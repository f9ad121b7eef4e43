"""Table loading with schema normalization.

All ten driver tables (TESTDATA.md / FIXTURES.md §1) load through here so
timestamp-layout normalization is applied exactly once.  The driver has
shipped two physical layouts across rounds; both must land as microsecond
``TimestampType`` (oracle-equal to DuckDB's naive read under UTC):

- ``timestamp[ns]`` (rounds 1-3): with ``nanosAsLong`` the column arrives as
  long nanos and is converted via ``timestamp_micros(ts div 1000)`` — integer
  ``div``, never ``/`` (float division of ~1.7e18 exceeds double's 2^53 exact
  range; SURVEY.md §1.3).
- untagged ``timestamp[us]`` (round 4+): ``inferTimestampNTZ`` is disabled in
  session.py so these read directly as TimestampType; if a host session locks
  that conf, the NTZ cast below restores it.

At 100 TB the equivalent of this module is the catalog: the conversion is a
zero-shuffle map expression, fully fused into the scan by codegen.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure

_LOG = logging.getLogger(__name__)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


# (session-id, ntz-conf, sf_dir, name) -> (session, DataFrame).  A
# spark.read.parquet costs ~75 ms per call (driver-side footer/schema job),
# and every fresh query build loads 1-3 tables — memoizing the immutable
# source DataFrames takes that off every rebuild (bench times a fresh build
# per run).  The NTZ conf is part of the key because it changes what the
# read returns (and the normalization branch taken); testdata paths are
# immutable within a round.  The value tuple holds the session object
# DELIBERATELY: it pins the session alive so CPython can never reuse
# id(spark) for a different session while its entries exist (id-keyed
# caches are unsound without this).  Entries are never evicted — bounded in
# practice by (sessions x 10 tables x sf_dirs), a few dozen tiny plan
# objects per process; a process cycling many sessions pays that retention.
_TABLE_CACHE: dict[tuple, tuple[SparkSession, DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    ntz = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    key = (id(spark), ntz, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached[1]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # untagged parquet timestamp[us] arrives as TIMESTAMP_NTZ when the host
    # session locked inferTimestampNTZ on; cast back to TimestampType (value-
    # preserving under the UTC session zone) so every downstream schema and
    # oracle hash sees microsecond TIMESTAMP regardless of host confs.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    _TABLE_CACHE[key] = (spark, df)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


#: Extensions whose files Spark cannot split by byte range: the whole
#: file is one task regardless of size, so the byte-derived estimate
#: below would over-report their parallelism (ADVICE r9a; ``.snappy``
#: added r10 ADVICE — Hadoop's SnappyCodec is equally non-splittable
#: for text sources, unlike snappy-in-parquet which compresses per
#: page and never reaches this path).
_NON_SPLITTABLE_EXTS = (".gz", ".zst", ".bz2", ".deflate", ".lz4", ".xz",
                        ".snappy")


def scan_split_estimate(df: DataFrame) -> int:
    """Metadata-only estimate of a frame's scan parallelism (public
    loader API since r12 — ADVICE r11: i37 sizes its salt modulus from
    it at plan-build time, so the cross-module dependency is part of
    the loader's contract, not a private detail; r9: replaces
    the ``df.rdd.getNumPartitions()`` probe, which built a plan-to-RDD
    lineage on the driver per call).

    File-rooted frames: ``ceil(total_bytes / maxPartitionBytes)`` — a
    LOWER bound on the planned task count (Spark may split finer via
    bytesPerCore, never coarser), so a "healthy" verdict is trustworthy
    in both directions the raw file COUNT is not (r9 review): one large
    splittable file estimates large (no spurious at-scale widening), and
    many tiny packed files estimate 1 (the single-task explode hazard is
    caught).  When any input file carries a non-splittable-codec
    extension (gzip CSV/JSON etc.), byte-range splittability no longer
    holds — each such file executes as ONE task however large — so the
    estimate is computed PER FILE CLASS (ADVICE r9a, refined per r10
    ADVICE for mixed directories): every oversized (> maxPartitionBytes)
    non-splittable file is exactly one task; everything else — small
    non-splittable files, which Spark still PACKS multiple-per-task, plus
    all splittable bytes — contributes one shared ``ceil(bytes /
    maxPartitionBytes)`` term (shared, not summed per class, so two
    half-full remainders can't round up to a count bin-packing would
    achieve in one task — the lower-bound contract survives).  An
    all-gzip scan of few huge files reads as narrow, and a directory
    mixing one huge gzip with many splittable parquet files no longer
    charges the parquet side the gzip side's per-file cap.  Codec
    assumption:
    a large single-ROW-GROUP parquet file is equally unsplittable in
    practice but is undetectable without footer reads; callers get the
    documented lower-bound contract only for multi-row-group parquet
    (the driver corpus) and uncompressed/splittable text.
    Sizes come from the local filesystem; non-local schemes
    fall back to the file count (a real remote corpus has many files).
    Non-file frames: the planned output partitioning, where 0 is
    Catalyst's UnknownPartitioning — "don't know", reported as 0 so the
    caller treats it as healthy (an unknowable narrow in-memory frame is
    the caller's contract to avoid, documented there; a debug line marks
    the path so a contract-violating call site is discoverable, ADVICE
    r9b)."""
    import math
    import os
    from urllib.parse import unquote, urlparse

    files = df.inputFiles()
    if not files:
        n = (df._jdf.queryExecution().executedPlan()
             .outputPartitioning().numPartitions())
        if n == 0:
            _LOG.debug(
                "scan_split_estimate: no input files and Unknown "
                "partitioning — treating as healthy per the scan-rooted "
                "call-site contract (widen_if_narrow docstring)")
        return n
    sized = []
    for f in files:
        if not f.startswith("file:"):
            return len(files)
        try:
            sized.append((f, os.path.getsize(unquote(urlparse(f).path))))
        except OSError:
            return len(files)
    conf = df.sparkSession.conf.get(
        "spark.sql.files.maxPartitionBytes", "128MB")
    try:
        max_pb = int(df.sparkSession.sparkContext._jvm
                     .org.apache.spark.network.util.JavaUtils
                     .byteStringAsBytes(conf))
    except Exception:
        max_pb = 128 * 1024 * 1024
    whole_file_tasks = 0
    packable_bytes = 0
    for f, size in sized:
        if f.lower().endswith(_NON_SPLITTABLE_EXTS) and size > max_pb:
            whole_file_tasks += 1  # one task exactly, however large
        else:
            packable_bytes += size
    est = whole_file_tasks + (
        math.ceil(packable_bytes / max_pb) if packable_bytes else 0)
    return max(1, est)


def widen_if_narrow(df: DataFrame, *key: str) -> DataFrame:
    """Repartition ``df`` to cluster width ONLY when the scan is under-
    parallel (fewer splits than cores).

    A single small parquet file is one row group and therefore ONE scan task
    no matter what ``maxPartitionBytes`` says — locally that serializes any
    CPU-heavy map work (e.g. 8 hashes per shingle in i34) onto one core.
    The guard makes this a no-op at production scale: a 100 TB scan has
    thousands of splits, so the corpus never pays a redistribution shuffle
    just to widen (that WOULD be a scale anti-pattern); locally the payload
    is one small file, so the shuffle is negligible.  Passing hash ``key``
    columns lets a downstream groupBy on the same keys reuse the exchange.
    """
    # threshold min(4, defaultParallelism): only a degenerate few-split scan
    # on a wider host should redistribute.  A real corpus scan (hundreds+ of
    # splits) never matches, even on a cluster whose core count dwarfs its
    # split count — and on a host narrower than the scan (parallelism < splits)
    # a repartition could only REDUCE parallelism while paying a shuffle.
    #
    # The split count comes from scan_split_estimate (metadata only, no
    # RDD conversion — r7 brief item 5, r9 review for the size-based
    # form).  Call-site contract: hand this helper a SCAN-ROOTED frame
    # (projection/filter above a file scan is fine, an exchange or an
    # in-memory localCheckpoint upstream is not) — for a non-file frame
    # whose planned partitioning is Unknown the estimate is 0, treated
    # as healthy, so a narrow constructed frame would silently skip
    # widening.  Every current caller (i34/i48/i51/i54, the stress pins)
    # passes a scan-rooted frame.
    par = df.sparkSession.sparkContext.defaultParallelism
    splits = scan_split_estimate(df)
    if splits == 0 or splits >= min(4, par):
        return df
    return df.repartition(par, *key) if key else df.repartition(par)
