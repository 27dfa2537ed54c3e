"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real decode libraries (PIL/librosa/ffmpeg) are NOT in this container, so the
decode kernels are stubbed (clearly marked) behind a deterministic fake —
but the Spark-side shape is real and tested: binary columns, Arrow-batched
``mapInPandas`` with an explicit output schema, partition-sized batches,
and metadata structs. Swapping the fake for a real decoder changes ONE
function body and nothing in the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def synthesize_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Turn a text table into a fake media table (binary payload column) —
    the test stand-in for reading real image/audio bytes."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.when(F.col(id_col) % 2 == 0, "image/png").otherwise("audio/wav").alias("media_type"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB — stands in for a real image decode (PIL not in container).

    Deterministic fake dimensions derived from the payload checksum. A real
    implementation raises NotImplementedError or calls the codec here; the
    mapInPandas plumbing around it is production-shaped either way.
    """
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 4, resize_to: int = 64) -> DataFrame:
    """Frame sampling + resize for video payloads — 1→N row expansion via
    mapInPandas (NOT a driver-side loop; each batch expands inside its
    task, so a 100 TB video corpus fans out by partition).

    Decode/resize are STUBBED (no codec libs in this container): "frames"
    are deterministic byte slices and "resize" rewrites the metadata — the
    plumbing (schema, batching, row expansion, binary handling) is the real
    production shape; swap _decode_stub/slicing for a codec call to go live.
    """
    import pandas as pd

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_no", "frame_bytes", "width", "height")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                # stub "frames": 16-byte strides standing in for decoded frames
                n_frames = max(1, len(data) // 16)
                for frame_no in range(0, n_frames, every_n):
                    chunk = data[frame_no * 16 : frame_no * 16 + 16]
                    out["media_id"].append(mid)
                    out["frame_no"].append(frame_no)
                    out["frame_bytes"].append(chunk)
                    out["width"].append(resize_to)
                    out["height"].append(resize_to)
            yield pd.DataFrame(out)

    return media.mapInPandas(batch_fn, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` processes partition-sized record batches — at scale this
    is the pattern for any per-item decode: no collect, no per-row Python
    UDF overhead, schema declared up front.
    """
    import pandas as pd

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            dims = [_decode_stub(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )

    return media.mapInPandas(batch_fn, schema=FEATURE_SCHEMA)
