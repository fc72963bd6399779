"""Multimodal (image/audio/video) column plumbing.

Media rides as opaque `binary` columns with typed metadata structs;
decode / feature-extraction / resize / frame-sampling run as
Arrow-batched pandas functions over `mapInPandas` — the only operators
in this engine where Python in the data path is justified (C-speed
media libs). The media libraries are NOT present in this environment,
so the decode kernels are deterministic stubs behind `_HAS_*` guards;
the Spark-side plumbing (schema, batch iteration, partitioning,
metadata extraction) is real and tested.

At 100 TB: binaries live in parquet alongside metadata; filters on the
typed metadata (width, duration, mime) push down to the scan so decode
only ever sees the matching subset; `mapInPandas` streams Arrow batches
without materializing whole partitions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not in this environment
    import PIL.Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def attach_binary_column(
    df: DataFrame, text_col: str, id_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Build a media-shaped frame from any source column (test harness:
    encodes text as the opaque payload)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(mime).alias("mime"),
        F.col(text_col).cast("binary").alias("content"),
        F.create_map(
            F.lit("origin"), F.lit(text_col), F.lit("codec"), F.lit("raw")
        ).alias("meta"),
    )


FEATURE_SCHEMA = (
    "media_id long, mime string, n_bytes long, sha256 string, feature array<float>"
)


def _stub_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake embedding from the payload digest — stands in
    for a real image/audio encoder (marked stub; see module docstring)."""
    d = hashlib.sha256(payload).digest()
    return [(d[i] / 255.0) * 2.0 - 1.0 for i in range(dim)]


def extract_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + featurize media via mapInPandas (Arrow batches).

    Real pipeline shape: per-batch vectorized decode; here the decode
    kernel is the deterministic stub above unless PIL is installed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["content"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda b: _stub_feature(b or b"")),
                }
            )
            yield out

    return df.mapInPandas(run, FEATURE_SCHEMA)


def decode_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image decode+resize — requires a real codec library."""
    if not _HAS_PIL:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires PIL/pillow (not in this environment); "
            "plumbing validated via extract_features stub path"
        )
    raise NotImplementedError("real decode path intentionally unimplemented here")


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video payloads — metadata-level selection:
    keeps every Nth media row per (mime) group ordered by media_id.
    Real frame extraction would decode inside mapInPandas as above."""
    from pyspark.sql import Window

    w = Window.partitionBy("mime").orderBy("media_id")
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") - 1) % every_n == 0)
        .drop("__rn")
    )
