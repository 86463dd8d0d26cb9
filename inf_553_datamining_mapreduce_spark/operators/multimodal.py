"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata (schemas.MEDIA_ASSET), processed through
Arrow-batched ``mapInPandas`` kernels.

The decode step is STUBBED in this container (no image/audio libraries are
installed): ``decode_image`` raises NotImplementedError, and the pipeline
runs with a deterministic fake feature extractor instead, so the Spark-side
contract — schema, partitioning, UDF signature, Arrow batch shape — is real
and tested even though pixel decoding is not.

Scale notes: payloads never pass through Python row-at-a-time; batches
arrive as Arrow buffers. Feature extraction repartitions by asset_id so
batch sizes stay bounded regardless of upstream file layout
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds them further).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from inf_553_datamining_mapreduce_spark.deploy import ensure_worker_imports

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("payload_bytes", LongType(), True),
        StructField("payload_sha256", StringType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("frame_sha256", StringType(), True),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real pixel decode — requires an imaging library not present in this
    container. The pipeline below uses ``fake_features`` instead."""
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. Pillow); "
        "not available in this environment — wire it here when present"
    )


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature vector: sha256-seeded values in [0, 1).
    Stable across processes, so tests can assert exact outputs."""
    digest = hashlib.sha256(payload).digest()
    out = []
    for i in range(dim):
        pair = digest[(2 * i) % len(digest)], digest[(2 * i + 1) % len(digest)]
        out.append((pair[0] * 256 + pair[1]) / 65536.0)
    return out


def extract_features(assets: DataFrame) -> DataFrame:
    """Per-asset feature extraction over Arrow batches. With a real decoder
    installed, swap ``fake_features`` for decode+embed; the Spark plumbing is
    unchanged."""
    ensure_worker_imports(assets.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "payload_bytes": [len(p) for p in payloads],
                    "payload_sha256": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                    "features": [fake_features(p) for p in payloads],
                }
            )

    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        kernel, FEATURE_SCHEMA
    )


def sample_frames(assets: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video payloads: deterministic byte-stride chunking
    standing in for time-based frame extraction. One output row per sampled
    'frame' — the UDTF (explode) shape a real decoder would produce."""
    ensure_worker_imports(assets.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                for i in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                    chunk = p[i * every_n_bytes : (i + 1) * every_n_bytes]
                    ids.append(int(aid))
                    idxs.append(i)
                    hashes.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {"asset_id": ids, "frame_index": idxs, "frame_sha256": hashes}
            )

    return (
        assets.filter(F.col("media_type") == "video")
        .select("asset_id", "payload")
        .mapInPandas(kernel, FRAME_SCHEMA)
    )
