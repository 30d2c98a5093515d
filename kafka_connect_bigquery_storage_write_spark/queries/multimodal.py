"""Multimodal query entries: binary-column plumbing, driver-checked.

The multimodal operators (operators/multimodal.py) move opaque binary
payloads through Arrow batches; their codec stages are stubbed (no
PIL/ffmpeg in this environment) but the plumbing — binary columns over
Arrow, typed metadata, streaming iterators — is real. These entries pin
that plumbing against a SQL oracle: the payload is the UTF-8 encoding of
fixture text (the one binary both engines can construct bit-identically),
and the metadata kernel runs in Python over the Arrow-delivered bytes, so
any corruption, truncation, or encoding drift in the binary path shows up
as a hash mismatch.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_storage_write_spark.operators.partitioning import ensure_compute_parallelism
from kafka_connect_bigquery_storage_write_spark.queries import query
from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table


@query(
    "q47_multimodal_binary_metadata",
    oracle="""
    SELECT doc_id,
           'text/' || lang              AS mime,
           octet_length(encode(text))   AS n_bytes,
           sha256(text)                 AS sha_hex
    FROM documents
    ORDER BY doc_id
    """,
)
def q47_multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> typed metadata, end to end through Arrow.

    documents.text is encoded to a binary payload column JVM-side, then a
    mapInPandas kernel (the multimodal decode shape,
    operators/multimodal.py) computes byte length and sha256 over the raw
    bytes in Python. The oracle recomputes both in SQL — equality proves
    the binary column crosses the JVM->Arrow->pandas boundary byte-exact,
    which is the property every real decode kernel depends on.
    """
    import hashlib

    docs = ensure_compute_parallelism(load_table(spark, sf_dir, "documents"))
    media = docs.select(
        "doc_id",
        F.concat(F.lit("text/"), F.col("lang")).alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("mime", T.StringType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("sha_hex", T.StringType(), False),
        ]
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            raw = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(b) for b in raw],
                    "sha_hex": [hashlib.sha256(b).hexdigest() for b in raw],
                }
            )

    return media.mapInPandas(kernel, schema=out_schema).orderBy("doc_id")
