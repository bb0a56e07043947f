"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extraction run as Arrow-batched `mapInPandas` stages
so the Python boundary is per-batch, not per-row. The actual codec
libraries are NOT in this container, so `decode_stub` computes
deterministic pseudo-features (byte length, md5, an 8-bin byte
histogram) — the Spark-side plumbing (schema, batch shape, partition
behavior) is real and tested; swap `_decode_batch` for a real decoder
(PIL/ffmpeg) on a cluster that has one.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("hist", T.ArrayType(T.LongType()), True),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque media payload
    (the container has no image/audio fixtures; the binary-column
    path is identical)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a real decoder. A real image decoder
    would go here (e.g. PIL.Image.open over payload bytes) — keep the
    signature: one pandas batch in, one feature batch out."""
    out = {
        "media_id": pdf["media_id"],
        "byte_len": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
        "content_md5": pdf["payload"].map(
            lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
        ),
        "hist": pdf["payload"].map(
            lambda b: [0] * 8
            if b is None
            else [sum(1 for x in bytes(b) if x >> 5 == i) for i in range(8)]
        ),
    }
    return pd.DataFrame(out)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas keeps partitioning intact (no shuffle); at 100 TB the
    payload column should be read lazily (parquet column pruning keeps
    other columns off the wire when features are all a query needs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explodes a deterministic frame
    index per media row (real decoder would emit actual frames).
    Demonstrates the fan-out schema (media_id, frame_idx, frame_bytes)."""
    n_frames = F.greatest(
        (F.coalesce(F.col("meta.duration_ms"), F.length(F.col("payload")))
         / F.lit(every_ms)).cast("int"),
        F.lit(1),
    )
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_bytes", F.lit(None).cast("binary"))


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_stub(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image-resize plumbing as an Arrow-batched mapInPandas stage.

    A real implementation decodes payload bytes, resamples to
    (width, height) and re-encodes; the stub emits a deterministic
    payload of the right order of magnitude (w*h bytes derived from the
    source md5) so downstream schema/partitioning/size behavior is
    exercised for real. No shuffle: resize is per-row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            def fake_resize(b):
                if b is None:
                    return None
                seed = hashlib.md5(bytes(b)).digest()
                return (seed * (n // len(seed) + 1))[:n]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(fake_resize),
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def decode_real(media: DataFrame) -> DataFrame:
    """Real decode path — requires codec libs not present in this
    container."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "use extract_media_features (deterministic stub) or run on a "
        "cluster with PIL/ffmpeg installed"
    )


EMBED_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
    ]
)


def embed_stub(media: DataFrame, dim: int = 16) -> DataFrame:
    """Media -> embedding plumbing: an Arrow-batched `mapInPandas`
    stage mapping each binary payload to a dense vector, exactly where
    a CLIP/CLAP-style encoder slots in on a GPU cluster (same schema,
    same batch grain, same no-shuffle property).

    The stand-in encoder is deterministic md5 arithmetic (dim values
    in [-1, 1), each an exact n/2^31 - 1 with n < 2^32 — exact in
    float64), so identical payloads get identical embeddings and the
    whole media -> embed -> ANN chain has an exact SQL oracle. Output
    columns are (vec_id, embedding) — directly consumable by every
    operator in operators/similarity.py.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    ids.append(mid)
                    vecs.append(None)
                    continue
                h = hashlib.md5(bytes(payload)).hexdigest()
                vecs.append(
                    [
                        int(
                            hashlib.md5(f"{h}|{i}".encode()).hexdigest()[:8],
                            16,
                        )
                        / 2**31
                        - 1.0
                        for i in range(dim)
                    ]
                )
                ids.append(mid)
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return media.mapInPandas(run, EMBED_SCHEMA)
