"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` payloads with typed metadata; the Spark-side
plumbing — schema, partition-friendly batch iteration, Arrow batch
shape — is real and tested. The codec step itself is STUBBED with a
deterministic fake (the container ships no image/audio libraries): a
production deployment swaps `_fake_decode` for PIL/ffmpeg calls inside
the same mapInPandas iterator without touching any plan shape.

asset table schema:
  asset_id long, kind string(image|audio|video), payload binary,
  meta map<string,string>
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINDS = ["image", "audio", "video"]

FEATURE_SCHEMA = (
    "asset_id long, kind string, n_bytes long, payload_md5 string, "
    "width int, height int, duration_ms int, n_frames int"
)


def assets_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic synthetic assets: payload = utf-8 bytes of text,
    kind = doc_id % 3. Stands in for a real media table while keeping
    every downstream shape (binary column, metadata map) honest."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for the real codec. Derives pseudo
    dimensions from payload length only (no randomness). A real decoder
    raises NotImplementedError here when the media lib is missing."""
    n = len(payload)
    if kind == "image":
        return {"width": n % 640 + 1, "height": n % 480 + 1, "duration_ms": 0, "n_frames": 1}
    if kind == "audio":
        return {"width": 0, "height": 0, "duration_ms": n * 8, "n_frames": 0}
    return {"width": n % 1280 + 1, "height": n % 720 + 1, "duration_ms": n * 40, "n_frames": n % 250 + 1}


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, one feature row
    per asset out. This is the real production shape for decode /
    resize / frame-sample stages — per-batch vectorized, no per-row
    Python UDF dispatch, safe to repartition upstream."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_decode(bytes(p), k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            out.insert(2, "n_bytes", [len(bytes(p)) for p in pdf["payload"]])
            out.insert(
                3,
                "payload_md5",
                [hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]],
            )
            yield out

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)
