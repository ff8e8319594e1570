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


RESIZE_SCHEMA = (
    "asset_id long, kind string, src_width int, src_height int, "
    "out_width int, out_height int, resized_md5 string"
)


def resize_assets(assets: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """Aspect-preserving resize plan for image/video assets (audio rows
    drop). All arithmetic is integer floor-division so the target
    dimensions are bit-identical across engines; the pixel resample
    itself is the STUBBED step (resized_md5 = md5(payload_md5#WxH) —
    a real deployment calls PIL/ffmpeg inside this same mapInPandas
    iterator, touching no plan shape)."""
    import hashlib

    def dims(w: int, h: int) -> tuple[int, int]:
        if w <= max_w and h <= max_h:
            return w, h
        out_w = min(w, max_w)
        out_h = (h * out_w) // w
        if out_h > max_h:
            out_h = max_h
            out_w = (w * max_h) // h
        return max(out_w, 1), max(out_h, 1)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, p, k in zip(pdf["asset_id"], pdf["payload"], pdf["kind"]):
                if k == "audio":
                    continue
                d = _fake_decode(bytes(p), k)
                w, h = d["width"], d["height"]
                ow, oh = dims(w, h)
                src_md5 = hashlib.md5(bytes(p)).hexdigest()
                rows.append(
                    {
                        "asset_id": aid, "kind": k,
                        "src_width": w, "src_height": h,
                        "out_width": ow, "out_height": oh,
                        "resized_md5": hashlib.md5(
                            f"{src_md5}#{ow}x{oh}".encode()
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "kind", "src_width", "src_height",
                         "out_width", "out_height", "resized_md5"],
            )

    return assets.mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "asset_id long, frame_no int, frame_ts_ms int, frame_md5 string"
)


def sample_frames(assets: DataFrame, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video assets: every k-th frame with
    k = max(1, n_frames // max_frames) — a 1-to-N mapInPandas (one
    input asset emits a variable number of frame rows; the Arrow batch
    contract handles the fan-out without an explode shuffle). The
    frame decode is the stubbed step (frame_md5 = md5(payload_md5#i);
    the fake codec's 40 ms/frame clock gives frame_ts_ms)."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, p, k in zip(pdf["asset_id"], pdf["payload"], pdf["kind"]):
                if k != "video":
                    continue
                n_frames = _fake_decode(bytes(p), k)["n_frames"]
                step = max(1, n_frames // max_frames)
                src_md5 = hashlib.md5(bytes(p)).hexdigest()
                for i in range(0, n_frames, step):
                    rows.append(
                        {
                            "asset_id": aid,
                            "frame_no": i,
                            "frame_ts_ms": i * 40,
                            "frame_md5": hashlib.md5(
                                f"{src_md5}#{i}".encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_no", "frame_ts_ms", "frame_md5"]
            )

    return assets.mapInPandas(batches, schema=FRAME_SCHEMA)
