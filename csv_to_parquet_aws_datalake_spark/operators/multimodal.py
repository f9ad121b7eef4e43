"""Multimodal column plumbing (BASELINE.json north star: image/audio/video
as opaque binary + typed metadata).

The container has no image/audio codecs, so the DECODE step is a
deterministic stub (mean-byte "feature") — but everything Spark-side is
real and tested: binary columns, typed metadata structs, Arrow-batched
``mapInPandas`` with the exact signature a real decoder would use
(iterator of pandas batches in, schema-declared batches out).  Swapping the
stub for PIL/ffmpeg changes one function body, not the plan.

At 100 TB: binary payloads ride the columnar format untouched (parquet
binary), the decode UDF is map-side only, and batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch — no shuffle anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..loader import load_table
from ..registry import query


@query(
    "k06_multimodal_meta",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               hex(encode(substring(text, 1, 4))) AS head_hex,
               'utf8_text' AS media_kind
        FROM documents
    """,
)
def k06_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # opaque binary payload + typed metadata, all JVM-side expressions
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        # substring BEFORE encode: DuckDB has no BLOB substring, and for the
        # oracle's sake both sides must slice identically (ASCII => same bytes)
        F.hex(F.encode(F.substring("text", 1, 4), "utf-8")).alias("head_hex"),
        F.lit("utf8_text").alias("media_kind"),
    )


@query(
    "k07_multimodal_decode",
    oracle="""
        WITH b AS (
            SELECT doc_id,
                   octet_length(encode(text)) AS n_bytes,
                   list_sum(list_transform(range(1, length(text) + 1),
                            i -> ord(substr(text, i, 1)))) AS bsum
            FROM documents
        )
        SELECT doc_id, n_bytes,
               CAST(CASE WHEN n_bytes = 0 THEN 0 ELSE bsum // n_bytes END
                    AS BIGINT) AS mean_byte,
               CASE WHEN n_bytes = 0 THEN 'empty' ELSE 'stub_ok' END AS decode_status
        FROM b
    """,
)
def k07_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode / feature-extract over binary payloads via mapInPandas.
    The stub computes mean byte value; a real decoder (image resize, audio
    frame-sample) would replace `_stub_decode` only.  The oracle recomputes
    the byte arithmetic in SQL (ASCII text => codepoint == byte)."""
    import numpy as np

    def _stub_decode(payload: bytes) -> tuple[int, int, str]:
        arr = np.frombuffer(payload, dtype=np.uint8)
        if len(arr) == 0:
            # zero-byte blobs are routine for a real decoder; degrade, don't die
            return 0, 0, "empty"
        return len(arr), int(arr.sum()) // len(arr), "stub_ok"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_stub_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": [d[0] for d in decoded],
                "mean_byte": [d[1] for d in decoded],
                "decode_status": [d[2] for d in decoded],
            })

    d = load_table(spark, sf_dir, "documents")
    binary = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return binary.mapInPandas(
        decode_batches,
        "doc_id long, n_bytes long, mean_byte long, decode_status string",
    )
