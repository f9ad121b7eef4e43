"""Round-18 additions: a19 XML roundtrip (registered this round —
graduated from the r16 staging module per the SURVEY §7.16 ledger's
named fate): the byte-exact frame-fidelity and hostile-content pins,
migrated from tests/test_staged_r16.py.  Also i68 LSH calibration
census (pulled forward from the bank's spares — the r15/r16/r17
precedent): its bucket-invariant and exact-duplicate pins, migrated
likewise.  Oracle parity runs through the registry-wide differential
suite (tests/test_differential.py) like every registered query."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_to_parquet_aws_datalake_spark import registry

registry.load_all()

#: (name, sf_dir) -> collected rows, shared across this module's pins so
#: a query executes once per module run (the test_staged_r16 convention)
_ROWS_MEMO: dict[tuple[str, str], list] = {}


def _query_rows(name: str, spark, sf_dir: str) -> list:
    key = (name, sf_dir)
    if key not in _ROWS_MEMO:
        _ROWS_MEMO[key] = registry.QUERIES[name](spark, sf_dir).collect()
    return _ROWS_MEMO[key]


def test_a19_roundtrip_is_byte_exact(spark, sf_dir):
    # frame-level fidelity, stronger than the census: the roundtripped
    # frame must equal the original ROW FOR ROW (the census's md5
    # min/max/distinct would catch most corruption; this catches all)
    from csv_to_parquet_aws_datalake_spark.operators.scans import (
        _A19_SCHEMA,
    )
    from csv_to_parquet_aws_datalake_spark.sources.io_paths import (
        scratch_dir,
    )

    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .select("doc_id", "lang",
                 F.struct("source", "n_chars").alias("meta"), "text"))
    registry.QUERIES["a19_xml_roundtrip"](spark, sf_dir)  # writes the xml dir
    back = (spark.read.schema(_A19_SCHEMA)
            .option("rowTag", "doc")
            .option("ignoreSurroundingSpaces", "false")
            .xml(scratch_dir("a19", sf_dir, "xml")))
    want = sorted(map(tuple, d.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want


def test_a19_survives_hostile_xml_content(spark, tmp_path):
    # the corpus may not contain every escaping class — prove the
    # roundtrip on a crafted frame: markup characters, entities that
    # must NOT double-escape, surrounding whitespace (the
    # ignoreSurroundingSpaces=false contract), newlines, tabs,
    # multibyte text, empty string, NULL
    rows = [
        (1, "a < b & c > d"),
        (2, "already &amp; escaped &lt;text&gt;"),
        (3, "  surrounded  "),
        (4, "line1\nline2\tand tab"),
        (5, "<doc>fake closing tag</doc>"),
        (6, "émoji \U0001F600 ünïcode"),
        (7, ""),
        (8, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "xml")
    df.write.mode("overwrite").option("rowTag", "doc").xml(out)
    back = (spark.read.schema("doc_id long, text string")
            .option("rowTag", "doc")
            .option("ignoreSurroundingSpaces", "false").xml(out))
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == dict(rows)


def test_i68_calibration_invariants(spark, sf_dir):
    # mechanism pins behind the oracle: (1) banding candidates share at
    # least one full band, so every bucket is in [2, 8]; (2) the
    # corpus's near-duplicate pairs populate the top bucket (the
    # banding fixture is non-vacuous); (3) estimates are calibrated in
    # DIRECTION: the mean exact Jaccard in bucket 8 exceeds the mean in
    # the lowest populated bucket.  (The corpus carries no byte-exact
    # text duplicates at the test SFs — probed — so the exact-dup
    # jacc = 1.0 identity is pinned on a crafted frame instead.)
    rows = {r["n_sig_match"]: r
            for r in _query_rows("i68_lsh_calibration", spark, sf_dir)}
    assert rows and all(2 <= b <= 8 for b in rows)
    assert 8 in rows
    lo = min(rows)
    if lo < 8:
        assert rows[8]["mean_jacc_e6"] > rows[lo]["mean_jacc_e6"]


def test_i68_exact_duplicates_land_in_bucket_8(spark):
    # the MinHash no-false-negative identity through the calibration
    # lens, on a crafted frame (the corpus has no byte-exact dups):
    # identical texts must bucket at n_sig_match = 8 with exact
    # Jaccard 1.0; the unrelated filler must never reach their bucket
    from csv_to_parquet_aws_datalake_spark.operators.llm_text import (
        _SHINGLES_SPARK,
        lsh_calibration_frame,
        minhash_band_pairs,
    )

    d = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "a completely different document about spark engines")],
        "doc_id long, text string")
    # 3 rows through 32-partition shuffles is pure task overhead (the
    # r17 census suite-cost lesson; profiled 7.5 s in-suite before)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        pairs = minhash_band_pairs(d)
        docs = d.withColumn("t", F.split("text", " "))
        sh = docs.select("doc_id", F.explode(
            F.array_distinct(F.expr(_SHINGLES_SPARK))).alias("sh"))
        counts = {r["doc_id"]: r["n"] for r in
                  sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
                  .collect()}
        got = {(r["da"], r["db"]): r["n_sig_match"]
               for r in pairs.collect()}
        assert got == {(1, 2): 8}
        assert counts[1] == counts[2]  # identical shingles -> J = 1.0
        # and through the REGISTERED kernel end to end: the one
        # candidate pair lands in bucket 8 with exact Jaccard 1.0 e6
        cal = {r["n_sig_match"]: r
               for r in lsh_calibration_frame(d).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert set(cal) == {8}
    assert cal[8]["n_pairs"] == 1
    assert cal[8]["mean_jacc_e6"] == cal[8]["min_jacc_e6"] \
        == cal[8]["max_jacc_e6"] == 1_000_000
