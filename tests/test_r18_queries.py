"""Round-18 additions: a19 XML roundtrip (registered this round —
graduated from the r16 staging module per the SURVEY §7.16 ledger's
named fate): the byte-exact frame-fidelity and hostile-content pins,
migrated from tests/test_staged_r16.py.  Oracle parity runs through the
registry-wide differential suite (tests/test_differential.py) like
every registered query."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_to_parquet_aws_datalake_spark import registry

registry.load_all()


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
