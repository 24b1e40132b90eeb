"""Multimodal column plumbing (north-star operator).

Images/audio/video ride as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas`` so a
1000-executor cluster streams record-batches through the Python worker
without ever materializing a partition in one object.

Decoding is two-tier. All three modalities decode FOR REAL via the
stdlib-only ``codecs`` module — PNG (zlib IDAT inflate + scanline
unfilter), PCM WAV (RIFF/struct parsing), and uncompressed YUV4MPEG2
video (header tokens + FRAME-marker demux) — no PIL/librosa/ffmpeg
needed. Compressed video containers (mp4/webm) would still need a real
demuxer; Y4M is the uncompressed interchange form ffmpeg itself
round-trips to. ``fake=True`` remains as the byte-level contract mode
(deterministic features over opaque bytes, exercising the same batch
shape with zero codec cost).
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


Y4M_FRAME_W, Y4M_FRAME_H = 8, 8  # mono frame dims for text->video bridging


def to_y4m_media(docs: DataFrame, id_col: str, text_col: str,
                 source_col: str) -> DataFrame:
    """REAL video payloads without ffmpeg: each document's utf-8 bytes
    become the luma pixels of consecutive 8x8 Cmono YUV4MPEG2 frames
    (zero-padded tail; empty docs get one zero frame). Same oracle
    invariant as the PNG/WAV bridges: decoded frame-byte sum == sum of
    text bytes, so DuckDB checks the demux round-trip with plain SQL."""
    frame_px = Y4M_FRAME_W * Y4M_FRAME_H

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads, metas = [], [], []
            for mid, text, src in zip(pdf[id_col], pdf[text_col], pdf[source_col]):
                raw = (text or "").encode("utf-8")
                n_frames = max(1, math.ceil(len(raw) / frame_px))
                padded = raw.ljust(frame_px * n_frames, b"\0")
                frames = [padded[i * frame_px:(i + 1) * frame_px]
                          for i in range(n_frames)]
                y4m = codecs.encode_y4m(Y4M_FRAME_W, Y4M_FRAME_H, frames,
                                        colorspace="Cmono")
                ids.append(mid)
                payloads.append(y4m)
                metas.append({"kind": "video", "n_bytes": len(y4m), "source": src})
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
    if container == "y4m":
        frames = codecs.decode_y4m(payload)["frames"]
        first = frames[0] if frames else b""
        return (
            int(sum(sum(f) for f in frames)),
            int.from_bytes(first[:4].ljust(4, b"\0"), "big"),
        )
    raise ValueError(f"undecodable payload for kind={kind!r} (not PNG/WAV/Y4M)")


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow record batches).

    fake=True: features are byte-level — ``feat_sum`` = sum of payload
    bytes, ``feat_head`` = big-endian int of the first 4 bytes (0-padded) —
    deterministic and oracle-checkable, exercising the exact same batch
    shape a real decoder would. fake=False: REAL decode — PNG via
    zlib-inflate + scanline unfilter, WAV via RIFF/PCM struct parsing,
    Y4M video via header/FRAME demux (``codecs`` module, stdlib-only);
    features are computed over the DECODED pixels/samples/frames.
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


def _real_frames(payload: bytes, every_n_bytes: int, max_frames: int) -> list[bytes]:
    """Decoded frame list per container: Y4M demuxes to its actual frames
    (frame_idx = decoded frame number, capped at max_frames); a PNG is its
    single decoded pixel buffer; WAV frames are consecutive sample windows
    of ``every_n_bytes`` bytes of PCM (the audio-framing convention)."""
    container = codecs.sniff_kind(payload)
    if container == "y4m":
        return codecs.decode_y4m(payload)["frames"][:max_frames]
    if container == "png":
        return [codecs.decode_png(payload)["pixels"]]
    if container == "wav":
        pcm = codecs.decode_wav(payload)["samples"].tobytes()
        n = min(max_frames, max(1, len(pcm) // every_n_bytes))
        return [pcm[i * every_n_bytes:(i + 1) * every_n_bytes] for i in range(n)]
    raise ValueError("undecodable payload (not PNG/WAV/Y4M)")


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8,
                 fake: bool = True) -> DataFrame:
    """Frame sampling via ``mapInPandas`` — one output row per sampled
    frame (the row-expanding shape a video pipeline needs). fake=True
    samples fixed-width byte windows of the payload as stand-in frames,
    deterministic and schema-faithful; fake=False DECODES — Y4M payloads
    demux to their real frames, PNG to its pixel buffer, WAV to PCM
    sample windows (``_real_frames``)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p)
                if fake:
                    fr = [raw[i * every_n_bytes:(i + 1) * every_n_bytes]
                          for i in range(min(max_frames,
                                             max(1, len(raw) // every_n_bytes)))]
                else:
                    fr = _real_frames(raw, every_n_bytes, max_frames)
                for i, f in enumerate(fr):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(f)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(batches, FRAME_SCHEMA)


def _nn_resize_interleaved(px: bytes, w: int, h: int, ch: int,
                           new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample of interleaved-channel pixels."""
    out = bytearray(new_w * new_h * ch)
    for y in range(new_h):
        sy = min(h - 1, (y * h) // new_h)
        for x in range(new_w):
            sx = min(w - 1, (x * w) // new_w)
            src = (sy * w + sx) * ch
            dst = (y * new_w + x) * ch
            out[dst:dst + ch] = px[src:src + ch]
    return bytes(out)


def _real_resize(payload: bytes, target_bytes: int) -> bytes:
    """Real resample to roughly ``target_bytes`` of DECODED content,
    re-encoded in the same container: PNG -> nearest-neighbor pixel
    resample; WAV -> nearest-neighbor sample-rate decimation/stretch;
    Y4M -> per-plane nearest-neighbor on every frame (Cmono/C420/C444).
    The re-encoded payload's byte size varies with compression — meta
    n_bytes is set from the actual output."""
    container = codecs.sniff_kind(payload)
    if container == "png":
        img = codecs.decode_png(payload)
        w, h, ch = img["width"], img["height"], img["channels"]
        # bytes per PIXEL, not per channel: a 16-bit sample is 2 bytes,
        # and the nearest-neighbor kernel moves whole pixel groups — at
        # depth 8 this degenerates to the old ch-byte grouping
        bpp = ch * (img["bit_depth"] // 8)
        s = math.sqrt(target_bytes / max(1, w * h * bpp))
        new_w = max(1, round(w * s))
        new_h = max(1, round(h * s))
        ctype = {1: 0, 3: 2, 2: 4, 4: 6}[ch]
        return codecs.encode_png(
            new_w, new_h,
            _nn_resize_interleaved(img["pixels"], w, h, bpp, new_w, new_h),
            color_type=ctype, bit_depth=img["bit_depth"],
        )
    if container == "wav":
        a = codecs.decode_wav(payload)
        frames = a["samples"]
        nch, n = a["n_channels"], a["n_samples"]
        n_target = max(1, target_bytes // (2 * nch))
        picked = []
        for i in range(n_target):
            src = min(n - 1, (i * n) // n_target) * nch
            picked.extend(frames[src:src + nch])
        return codecs.encode_wav(picked, sample_rate=a["sample_rate"],
                                 n_channels=nch)
    if container == "y4m":
        v = codecs.decode_y4m(payload)
        w, h, cs = v["width"], v["height"], v["colorspace"]
        fsize = len(v["frames"][0]) if v["frames"] else 1
        s = math.sqrt(target_bytes / max(1, fsize * max(1, v["n_frames"])))
        new_w = max(2, round(w * s)) & ~1 if not cs == "Cmono" else max(1, round(w * s))
        new_h = max(2, round(h * s)) & ~1 if cs.startswith("C420") else max(1, round(h * s))
        out_frames = []
        for f in v["frames"]:
            if cs == "Cmono":
                out_frames.append(codecs.resample_plane(f, w, h, new_w, new_h))
            elif cs.startswith("C420"):
                yn = w * h
                cw, chh = w // 2, h // 2
                ncw, nch_ = new_w // 2, new_h // 2
                planes = [
                    codecs.resample_plane(f[:yn], w, h, new_w, new_h),
                    codecs.resample_plane(f[yn:yn + cw * chh], cw, chh, ncw, nch_),
                    codecs.resample_plane(f[yn + cw * chh:], cw, chh, ncw, nch_),
                ]
                out_frames.append(b"".join(planes))
            elif cs == "C444":
                yn = w * h
                out_frames.append(b"".join(
                    codecs.resample_plane(f[i * yn:(i + 1) * yn], w, h, new_w, new_h)
                    for i in range(3)
                ))
            else:
                raise ValueError(f"resize unsupported for colorspace {cs}")
        return codecs.encode_y4m(new_w, new_h, out_frames, fps=v["fps"],
                                 colorspace=cs)
    raise ValueError("undecodable payload (not PNG/WAV/Y4M)")


def resize(media: DataFrame, target_bytes: int = 256, fake: bool = True) -> DataFrame:
    """Resize via ``mapInPandas`` — payload-in/payload-out, schema
    preserved (MEDIA_SCHEMA with updated n_bytes). fake=True truncates/pads
    the byte payload to ``target_bytes`` (deterministic stand-in);
    fake=False REALLY resamples — nearest-neighbor pixel/plane resample
    for PNG/Y4M, sample decimation for WAV — and re-encodes the container
    (``_real_resize``; n_bytes reflects the actual re-encoded size)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:
                resized = [bytes(p)[:target_bytes].ljust(target_bytes, b"\0")
                           for p in pdf["payload"]]
            else:
                resized = [_real_resize(bytes(p), target_bytes) for p in pdf["payload"]]
            meta = [
                {"kind": m["kind"], "n_bytes": len(p) if not fake else target_bytes,
                 "source": m["source"]}
                for m, p in zip(pdf["meta"], resized)
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": resized, "meta": meta})

    return media.mapInPandas(batches, MEDIA_SCHEMA)
