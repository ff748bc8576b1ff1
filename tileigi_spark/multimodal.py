"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested; the codec step is stubbed
behind import-guards because decode libraries (PIL/torchaudio/av) are not
in this container. With libraries present, only `_decode_image` /
`_decode_audio` bodies change — batch shapes and partitioning are already
production-form.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, functions as F

IMAGE_META_SCHEMA = ("doc_id long, width int, height int, channels int, "
                     "format string, feature binary")


def _decode_image(data: bytes):
    """Stub decode: returns deterministic fake (width, height, channels,
    format) parsed from a tiny header convention, or raises. Replace with
    PIL.Image.open in production."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        # deterministic fake derived from content — keeps the pipeline
        # testable and byte-stable
        h = hashlib.sha256(data).digest()
        return (64 + h[0] % 512, 64 + h[1] % 512, 3, "fake")
    raise NotImplementedError("real decode path: PIL available but stub "
                              "not replaced")


def image_features(df: DataFrame, bin_col: str = "html",
                   id_col: str = "doc_id") -> DataFrame:
    """Decode/feature-extract over binary columns via mapInPandas. The
    feature is a 32-byte content digest standing in for an embedding; the
    Arrow batch shape (one row per asset, bounded batch bytes via
    maxRecordsPerBatch) is the production contract."""

    def run(iterator):
        for pdf in iterator:
            out = {"doc_id": [], "width": [], "height": [], "channels": [],
                   "format": [], "feature": []}
            for did, data in zip(pdf[id_col], pdf[bin_col]):
                if data is None:
                    continue
                b = bytes(data)
                w, h, c, fmt = _decode_image(b)
                out["doc_id"].append(int(did))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["format"].append(fmt)
                out["feature"].append(hashlib.sha256(b).digest())
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=IMAGE_META_SCHEMA)


def frame_sample(df: DataFrame, bin_col: str = "html",
                 id_col: str = "doc_id", every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (doc_id, frame_idx, frame
    digest) rows — the 1->N explode shape of real frame extraction, with a
    deterministic fake sampler (content-seeded frame count)."""
    schema = "doc_id long, frame_idx int, frame_sha string"

    def run(iterator):
        for pdf in iterator:
            rows = {"doc_id": [], "frame_idx": [], "frame_sha": []}
            for did, data in zip(pdf[id_col], pdf[bin_col]):
                if data is None:
                    continue
                b = bytes(data)
                n_frames = 1 + hashlib.sha256(b).digest()[0] % 5
                for i in range(0, n_frames, max(1, every_n // 10)):
                    rows["doc_id"].append(int(did))
                    rows["frame_idx"].append(i)
                    rows["frame_sha"].append(
                        hashlib.sha256(b + i.to_bytes(4, "little")).hexdigest())
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=schema)
