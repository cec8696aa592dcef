"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs.

The Spark-side machinery — schemas, partitioning, Arrow batch shapes,
``mapInPandas`` UDF signatures — is real and tested. The actual media
decode is STUBBED (`decode_stub=True` produces a deterministic fake;
``decode_stub=False`` raises NotImplementedError) because the codec
libraries (Pillow/ffmpeg/librosa) are not in this container; swapping
the stub for a real decoder changes only the body of the batch
function, never the pipeline.

Ops:
- :func:`attach_metadata`   binary → (n_bytes, sha256, magic sniff)
- :func:`decode_features`   binary → fixed-dim float feature vector (stubbed)
- :func:`resize_images`     binary → binary (stub passthrough with target dims)
- :func:`sample_frames`     binary "video" → N frame rows (UDTF-shaped explode)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

FEATURE_DIM = 16

META_SCHEMA = "id long, n_bytes long, sha256 string, magic string"
FEAT_SCHEMA = f"id long, features array<float>"
FRAME_SCHEMA = "id long, frame_index int, frame_bytes binary"

MAGIC = {
    b"\x89PN": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIF": "riff",
    b"ID3": "mp3",
}


def binarize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Driver-table helper: treat encoded text as the opaque media blob
    (the shape is what matters; real pipelines read binaryFile/Iceberg
    binary columns directly)."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.encode(F.col(text_col), "utf-8").alias("blob"),
    )


def attach_metadata(blobs: DataFrame) -> DataFrame:
    """(id, n_bytes, sha256, magic): pure columnar — no UDF needed even
    for binary columns (length / sha2 / substring work on binary)."""
    return blobs.select(
        "id",
        F.length("blob").alias("n_bytes"),
        F.sha2("blob", 256).alias("sha256"),
        F.hex(F.substring("blob", 1, 3)).alias("magic"),
    )


def decode_features(blobs: DataFrame, decode_stub: bool = True) -> DataFrame:
    """binary → FEATURE_DIM float vector via Arrow-batched mapInPandas.

    Stub: deterministic per-blob pseudo-features from the sha256 digest
    (so downstream ANN / dedup stages exercise real distributions).
    Real decoders drop in by replacing `_featurize`.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def _featurize(blob: bytes) -> list[float]:
            if not decode_stub:
                raise NotImplementedError(
                    "media decode requires codec libs absent from this image"
                )
            d = hashlib.sha256(blob).digest()
            return [
                int.from_bytes(d[2 * i : 2 * i + 2], "big") / 65535.0
                for i in range(FEATURE_DIM)
            ]

        for pdf in it:
            out = pd.DataFrame(
                {
                    "id": pdf["id"],
                    "features": pdf["blob"].map(_featurize),
                }
            )
            yield out

    return blobs.mapInPandas(batches, schema=FEAT_SCHEMA)


def resize_images(
    blobs: DataFrame, width: int = 64, height: int = 64, decode_stub: bool = True
) -> DataFrame:
    """binary → binary resize. Stub keeps bytes, records target dims —
    the batch contract (binary in/out through Arrow) is the tested part."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError("image resize requires Pillow")
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "blob": pdf["blob"],
                    "width": width,
                    "height": height,
                }
            )

    return blobs.mapInPandas(batches, schema="id long, blob binary, width int, height int")


def sample_frames(
    blobs: DataFrame, n_frames: int = 4, decode_stub: bool = True
) -> DataFrame:
    """'video' → N frames (UDTF-shaped: one input row → n output rows).
    Stub slices the blob into n_frames byte windows — the explode shape,
    schema, and batch iteration are the real contract."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        import numpy as np

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError("frame sampling requires ffmpeg")
            # vectorized explode: repeat ids/blobs n_frames times, slice
            # each blob by its per-row stride — no per-row Python loop
            ids = pdf["id"].to_numpy().repeat(n_frames)
            blobs_rep = pdf["blob"].to_numpy().repeat(n_frames)
            idx = np.tile(np.arange(n_frames, dtype=np.int32), len(pdf))
            steps = np.maximum(
                1, pdf["blob"].map(len).to_numpy() // n_frames
            ).repeat(n_frames)
            lo = idx * steps
            frames = [b[l : l + s] for b, l, s in zip(blobs_rep, lo, steps)]
            yield pd.DataFrame(
                {"id": ids, "frame_index": idx, "frame_bytes": frames}
            )

    return blobs.mapInPandas(batches, schema=FRAME_SCHEMA)
