"""Multimodal column plumbing (north-star operator).

Images/audio/video ride as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas`` so a
1000-executor cluster streams record-batches through the Python worker
without ever materializing a partition in one object.

Decoding is two-tier. PNG images and PCM WAV audio decode FOR REAL via
the stdlib-only ``codecs`` module (zlib IDAT inflate + scanline unfilter;
RIFF/struct PCM parsing) — no PIL/librosa needed. Video is the one
modality whose demuxer (av/ffmpeg) genuinely isn't in this container, so
it keeps an honest ``NotImplementedError`` seam. ``fake=True`` remains as
the byte-level contract mode (deterministic features over opaque bytes,
exercising the same batch shape with zero codec cost).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flinkrealtimedatawarehouse_spark.datapipeline import codecs

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

PNG_WIDTH = 32  # fixed row width for text->grayscale-PNG bridging


def to_png_media(docs: DataFrame, id_col: str, text_col: str,
                 source_col: str) -> DataFrame:
    """REAL image payloads without an image library: each document's
    utf-8 bytes become the pixels of an 8-bit grayscale PNG
    (width=PNG_WIDTH, height=ceil(n/width), zero-padded tail row; empty
    docs get one zero row). Encoded via ``codecs.encode_png`` inside
    ``mapInPandas``; the scanline filter rotates over media_id % 5 so a
    downstream decode exercises ALL five unfilter branches. Oracle-
    friendly by construction: decoded pixel_sum == sum of text bytes
    (padding is zeros), so DuckDB can check a real zlib round-trip with
    plain SQL over the text column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads, metas = [], [], []
            for mid, text, src in zip(pdf[id_col], pdf[text_col], pdf[source_col]):
                raw = (text or "").encode("utf-8")
                h = max(1, math.ceil(len(raw) / PNG_WIDTH))
                px = raw.ljust(PNG_WIDTH * h, b"\0")
                png = codecs.encode_png(
                    PNG_WIDTH, h, px, color_type=0, filter_type=int(mid) % 5
                )
                ids.append(mid)
                payloads.append(png)
                metas.append({"kind": "image", "n_bytes": len(png), "source": src})
            yield pd.DataFrame({"media_id": ids, "payload": payloads, "meta": metas})

    return docs.select(id_col, text_col, source_col).mapInPandas(batches, MEDIA_SCHEMA)


def to_wav_media(docs: DataFrame, id_col: str, text_col: str,
                 source_col: str, sample_rate: int = 16000) -> DataFrame:
    """REAL audio payloads: each document's utf-8 bytes become one PCM-16
    mono sample each (values 0-255), encoded as a RIFF/WAVE file. The
    decoded sample_sum equals the byte sum, so the same SQL oracle that
    checks the PNG branch checks the PCM round-trip."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads, metas = [], [], []
            for mid, text, src in zip(pdf[id_col], pdf[text_col], pdf[source_col]):
                raw = (text or "").encode("utf-8")
                wav = codecs.encode_wav(list(raw), sample_rate=sample_rate)
                ids.append(mid)
                payloads.append(wav)
                metas.append({"kind": "audio", "n_bytes": len(wav), "source": src})
            yield pd.DataFrame({"media_id": ids, "payload": payloads, "meta": metas})

    return docs.select(id_col, text_col, source_col).mapInPandas(batches, MEDIA_SCHEMA)


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


def _real_features(payload: bytes, kind: str) -> tuple[int, int]:
    """(feat_sum, feat_head) over DECODED content: pixel bytes for PNG,
    samples for WAV. feat_head = first four decoded units, big-endian —
    the decoded twin of the fake mode's raw-byte head."""
    container = codecs.sniff_kind(payload)
    if container == "png":
        px = codecs.decode_png(payload)["pixels"]
        return int(sum(px)), int.from_bytes(px[:4].ljust(4, b"\0"), "big")
    if container == "wav":
        samples = codecs.decode_wav(payload)["samples"]
        head = 0
        for s in list(samples[:4]) + [0] * (4 - min(4, len(samples))):
            head = (head << 8) | (s & 0xFF)
        return int(sum(samples)), head
    if kind == "video":
        raise NotImplementedError(
            "video demux requires av/ffmpeg — not available; "
            "plug the demuxer in here (payload bytes -> frames -> features)"
        )
    raise ValueError(f"undecodable payload for kind={kind!r} (not PNG/WAV)")


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow record batches).

    fake=True: features are byte-level — ``feat_sum`` = sum of payload
    bytes, ``feat_head`` = big-endian int of the first 4 bytes (0-padded) —
    deterministic and oracle-checkable, exercising the exact same batch
    shape a real decoder would. fake=False: REAL decode — PNG via
    zlib-inflate + scanline unfilter, WAV via RIFF/PCM struct parsing
    (``codecs`` module, stdlib-only); features are computed over the
    DECODED pixels/samples. Video alone raises NotImplementedError (no
    demuxer in this container).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            meta = pdf["meta"]
            if fake:
                sums = [int(sum(bytearray(p))) for p in payloads]
                heads = [
                    int.from_bytes(bytes(p[:4]).ljust(4, b"\0"), "big") for p in payloads
                ]
            else:
                pairs = [
                    _real_features(bytes(p), m["kind"])
                    for p, m in zip(payloads, meta)
                ]
                sums = [s for s, _ in pairs]
                heads = [h for _, h in pairs]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [m["kind"] for m in meta],
                    "source": [m["source"] for m in meta],
                    "n_bytes": [m["n_bytes"] for m in meta],
                    "feat_sum": sums,
                    "feat_head": heads,
                }
            )

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
