"""Multimodal column plumbing (north-star operator).

Images/audio/video ride as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas`` so a
1000-executor cluster streams record-batches through the Python worker
without ever materializing a partition in one object.

The actual decoders (PIL/librosa/av) are NOT in this container, so
``extract_features(..., fake=True)`` substitutes a deterministic
byte-level feature (documented below) while keeping every Spark-side
contract — schema, batch iteration, partitioning — real and tested;
``fake=False`` raises NotImplementedError at the decode step, marking
exactly where a real decoder plugs in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType(
            [
                T.StructField("kind", T.StringType()),      # image | audio | video
                T.StructField("n_bytes", T.LongType()),
                T.StructField("source", T.StringType()),
            ]
        )),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feat_sum", T.LongType()),
        T.StructField("feat_head", T.LongType()),
    ]
)


def to_media_table(docs: DataFrame, id_col: str, text_col: str, source_col: str) -> DataFrame:
    """Stand-in media table: utf-8 bytes of the text as the opaque payload
    (deterministic; real pipelines load the bytes from object storage with
    the same schema). Conforms to MEDIA_SCHEMA."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.octet_length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow record batches).

    fake=True: features are byte-level — ``feat_sum`` = sum of payload
    bytes, ``feat_head`` = big-endian int of the first 4 bytes (0-padded) —
    deterministic and oracle-checkable, exercising the exact same batch
    shape a real decoder would. fake=False: NotImplementedError at the
    decode boundary (no image/audio libs in this container).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/av — not available; "
                    "plug the decoder in here (payload bytes -> features)"
                )
            payloads = pdf["payload"]
            meta = pdf["meta"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [m["kind"] for m in meta],
                    "source": [m["source"] for m in meta],
                    "n_bytes": [m["n_bytes"] for m in meta],
                    "feat_sum": [int(sum(bytearray(p))) for p in payloads],
                    "feat_head": [
                        int.from_bytes(bytes(p[:4]).ljust(4, b"\0"), "big") for p in payloads
                    ],
                }
            )
            yield out

    return media.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8,
                 fake: bool = True) -> DataFrame:
    """Frame sampling via ``mapInPandas`` — one output row per sampled
    frame (the row-expanding shape a video pipeline needs; a real decoder
    yields every k-th decoded frame here). fake=True samples fixed-width
    byte windows of the payload as stand-in frames, deterministic and
    schema-faithful; fake=False raises at the decode boundary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires av/ffmpeg — not available; "
                    "plug the demuxer in here (payload -> frames)"
                )
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p)
                for i in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(raw[i * every_n_bytes:(i + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(batches, FRAME_SCHEMA)


def resize(media: DataFrame, target_bytes: int = 256, fake: bool = True) -> DataFrame:
    """Resize via ``mapInPandas`` — payload-in/payload-out, schema
    preserved (MEDIA_SCHEMA with updated n_bytes). fake=True truncates/pads
    the byte payload to ``target_bytes`` (deterministic stand-in for a real
    image resample); fake=False raises at the decode boundary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real resize requires PIL — not available; "
                    "plug the resampler in here (payload -> payload)"
                )
            resized = [bytes(p)[:target_bytes].ljust(target_bytes, b"\0") for p in pdf["payload"]]
            meta = [
                {"kind": m["kind"], "n_bytes": target_bytes, "source": m["source"]}
                for m in pdf["meta"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": resized, "meta": meta})

    return media.mapInPandas(batches, MEDIA_SCHEMA)
