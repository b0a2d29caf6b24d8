"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

The Spark-side mechanics (schema, Arrow-batched mapInPandas, partition
sizing) are real and tested; the actual codec work is stubbed behind
``DECODERS`` because image/audio libraries are not in this container —
swap in PIL/torchaudio decoders by registering a function of
``bytes -> dict``.

Design for 100 TB: binaries ride in their own column so column pruning
skips them unless referenced; `mapInPandas` processes Arrow batches
(not rows), and `maxRecordsPerBatch` bounds executor memory against
large blobs.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),      # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("data", T.BinaryType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])

# kind -> decoder(bytes, mime) -> dict(width, height, duration_ms, feature)
DECODERS: dict[str, Callable] = {}


def _stub_decode(data: bytes, mime: str) -> dict:
    """Deterministic fake decode: real pipelines register PIL/ffmpeg
    decoders into DECODERS; the fake keeps the plumbing testable."""
    n = len(data) if data else 0
    return {
        "width": (n % 640) + 1,
        "height": (n % 480) + 1,
        "duration_ms": n,
        "feature": [float((n >> i) & 0xFF) for i in range(0, 32, 8)],
    }


def extract_features(media: DataFrame,
                     batch_size: int = 64) -> DataFrame:
    """Decode + feature-extract over Arrow batches via mapInPandas.

    This is the one place the engine intentionally goes to Python: codec
    work is not expressible in Spark SQL. Batches (not rows) cross the
    Arrow boundary; binary payloads never hit the driver.
    """
    import pandas as pd  # noqa: F401

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                decoder = DECODERS.get(r["kind"], _stub_decode)
                d = decoder(r["data"], r["mime"])
                rows.append({
                    "media_id": r["media_id"],
                    "kind": r["kind"],
                    "n_bytes": len(r["data"]) if r["data"] is not None else 0,
                    "width": d.get("width"),
                    "height": d.get("height"),
                    "duration_ms": d.get("duration_ms"),
                    "feature": d.get("feature"),
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table for tests (binary payload =
    repeated md5 bytes; schema identical to a real ingest)."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"),
                             F.lit("video")),
                     (F.col("id") % 3 + 1).cast("int")).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.repeat(F.unbase64(F.base64(F.encode(
            F.md5(F.col("id").cast("string")), "utf-8"))),
            (F.col("id") % 7 + 1).cast("int")).cast("binary").alias("data"),
        F.create_map(F.lit("src"), F.lit("synthetic")).alias("meta"),
    )
    return base
