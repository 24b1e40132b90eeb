"""Stdlib-only media codecs for the multimodal harness (dp12).

The container has no PIL/librosa/av, but PNG, WAV, and uncompressed
YUV4MPEG2 video are simple enough to decode with ``zlib`` + ``struct`` +
byte slicing alone — so all three modality halves of
``multimodal.extract_features`` run a REAL decode (bytes -> pixels /
samples / frames). Compressed video (mp4/webm) would still need a real
demuxer; Y4M is the uncompressed interchange format ffmpeg round-trips.

PNG (ISO/IEC 15948): 8-byte signature, length-typed chunks; pixel data is
the zlib-deflated concatenation of per-scanline ``filter_type + bytes``
rows. Supported here: bit depths 8 and 16, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA), sequential AND Adam7-interlaced row order —
with ALL five scanline filters (None/Sub/Up/Average/Paeth) implemented in
``_unfilter``. (Out of scope: palette color type 3 and sub-byte depths
1/2/4 — bit-packed indexed forms the synthetic corpus never produces.)

WAV (RIFF): ``RIFF<size>WAVE`` then ``fmt ``/``data`` chunks; PCM 16-bit
little-endian samples via the ``array`` module (stdlib, C-speed).

Y4M (YUV4MPEG2, mjpegtools): ASCII stream header + per-frame ``FRAME``
markers with fixed-size raw planar payloads; colorspaces C420*/C422/
C444/Cmono.

Everything is per-record and pure-Python by design: these run INSIDE the
Arrow-batched ``mapInPandas`` decoders in ``multimodal``, so the cluster
parallelism comes from Spark partitioning, not from the codec.
"""

from __future__ import annotations

import struct
import sys
import zlib
from array import array

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


# --- PNG ------------------------------------------------------------------

# Adam7 pass grid (spec §8.2): per pass (x0, y0, dx, dy) — pass k holds the
# pixels at (x0 + i*dx, y0 + j*dy). Each non-empty pass is filtered as an
# independent sub-image inside the single zlib stream.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _adam7_passes(w: int, h: int):
    """Non-empty Adam7 passes as (x0, y0, dx, dy, pass_w, pass_h)."""
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw and ph:
            yield x0, y0, dx, dy, pw, ph


def _filter_rows(rows, bpp: int, ft: int) -> bytearray:
    """Forward-filter a sub-image's rows into filter_byte+row scanlines
    (prev starts at the zero row — each pass/image filters independently)."""
    raw = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for row in rows:
        raw.append(ft)
        raw.extend(_filter_row(ft, row, prev, bpp))
        prev = row
    return raw


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 0,
               filter_type: int = 0, bit_depth: int = 8,
               interlace: bool = False) -> bytes:
    """Minimal PNG encoder (fixtures + fake->real payload bridges).

    ``pixels``: raw rows, ``width * channels * bit_depth/8`` bytes each
    (16-bit samples big-endian per spec), no filtering applied by the
    caller. ``filter_type`` stamps every scanline with one filter (0-4)
    so tests can exercise each ``_unfilter`` branch; ``interlace`` emits
    the seven Adam7 passes instead of sequential rows."""
    if bit_depth not in (8, 16):
        raise ValueError(f"unsupported bit depth {bit_depth} (8/16)")
    ch = _CHANNELS[color_type]
    bpp = ch * (bit_depth // 8)
    stride = width * bpp
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} pixel bytes, got {len(pixels)}")
    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy, pw, ph in _adam7_passes(width, height):
            rows = []
            for j in range(ph):
                src = (y0 + j * dy) * stride
                rows.append(b"".join(
                    pixels[src + (x0 + i * dx) * bpp:
                           src + (x0 + i * dx) * bpp + bpp]
                    for i in range(pw)
                ))
            raw.extend(_filter_rows(rows, bpp, filter_type))
    else:
        raw = _filter_rows(
            [pixels[y * stride:(y + 1) * stride] for y in range(height)],
            bpp, filter_type,
        )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       0, 0, int(interlace))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _filter_row(ft: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    if ft == 0:
        return row
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 1:
            out[i] = (x - a) & 0xFF
        elif ft == 2:
            out[i] = (x - b) & 0xFF
        elif ft == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ft == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown filter {ft}")
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(ft: int, cur: bytearray, prev: bytes, bpp: int) -> None:
    """In-place reverse of one scanline filter (spec §9 'Reconstruction')."""
    if ft == 0:
        return
    n = len(cur)
    if ft == 1:  # Sub
        for i in range(bpp, n):
            cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
    elif ft == 2:  # Up
        for i in range(n):
            cur[i] = (cur[i] + prev[i]) & 0xFF
    elif ft == 3:  # Average
        for i in range(n):
            a = cur[i - bpp] if i >= bpp else 0
            cur[i] = (cur[i] + (a + prev[i]) // 2) & 0xFF
    elif ft == 4:  # Paeth
        for i in range(n):
            a = cur[i - bpp] if i >= bpp else 0
            c = prev[i - bpp] if i >= bpp else 0
            cur[i] = (cur[i] + _paeth(a, prev[i], c)) & 0xFF
    else:
        raise ValueError(f"unknown filter {ft}")


def _unfilter_rows(raw: bytes, pos: int, n_rows: int, stride: int, bpp: int):
    """Unfilter ``n_rows`` scanlines starting at ``raw[pos]``; returns
    (rows, new_pos). prev starts at the zero row (sub-image boundary)."""
    if pos + (stride + 1) * n_rows > len(raw):
        raise ValueError("IDAT size does not match dimensions")
    rows, prev = [], bytes(stride)
    for _ in range(n_rows):
        ft = raw[pos]
        cur = bytearray(raw[pos + 1:pos + 1 + stride])
        _unfilter(ft, cur, prev, bpp)
        rows.append(bytes(cur))
        prev = rows[-1]
        pos += stride + 1
    return rows, pos


def decode_png(data: bytes) -> dict:
    """Real PNG decode: chunk walk -> IDAT zlib inflate -> scanline
    unfilter (Adam7 passes deinterlaced when IHDR says so). Returns
    {width, height, channels, bit_depth, pixels} with ``pixels`` the
    reconstructed raw bytes (row-major, 16-bit samples big-endian, no
    padding)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, bytearray(), None
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth not in (8, 16):
                raise ValueError(f"unsupported bit depth {depth} (8/16)")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if interlace not in (0, 1):
                raise ValueError(f"unknown interlace method {interlace}")
            meta = (w, h, _CHANNELS[ctype], depth, interlace)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + body + crc
    if meta is None:
        raise ValueError("no IHDR chunk")
    w, h, ch, depth, interlace = meta
    bpp = ch * (depth // 8)
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if interlace:
        out, rpos = bytearray(stride * h), 0
        for x0, y0, dx, dy, pw, ph in _adam7_passes(w, h):
            rows, rpos = _unfilter_rows(raw, rpos, ph, pw * bpp, bpp)
            for j, row in enumerate(rows):
                dst_row = (y0 + j * dy) * stride
                for i in range(pw):
                    dst = dst_row + (x0 + i * dx) * bpp
                    out[dst:dst + bpp] = row[i * bpp:(i + 1) * bpp]
        if rpos != len(raw):
            raise ValueError("IDAT size does not match dimensions")
        pixels = bytes(out)
    else:
        if len(raw) != (stride + 1) * h:
            raise ValueError("IDAT size does not match dimensions")
        rows, _ = _unfilter_rows(raw, 0, h, stride, bpp)
        pixels = b"".join(rows)
    return {"width": w, "height": h, "channels": ch, "bit_depth": depth,
            "pixels": pixels}


# --- WAV ------------------------------------------------------------------

def encode_wav(samples, sample_rate: int = 16000, n_channels: int = 1) -> bytes:
    """Minimal PCM-16 WAV encoder; ``samples`` are interleaved ints in
    [-32768, 32767]."""
    pcm = array("h", samples)
    if sys.byteorder == "big":
        pcm.byteswap()
    body = pcm.tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate,
                      n_channels * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )


def decode_wav(data: bytes) -> dict:
    """Real WAV decode: RIFF chunk walk, PCM-16 only. Returns
    {sample_rate, n_channels, bit_depth, n_samples, samples} with
    ``samples`` an ``array('h')`` of interleaved frames."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, body = 12, None, None
    while pos + 8 <= len(data):
        tag, length = data[pos:pos + 4], struct.unpack("<I", data[pos + 4:pos + 8])[0]
        chunk = data[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif tag == b"data":
            body = chunk
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or body is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_channels, sample_rate, _rate, _align, bit_depth = fmt
    if audio_fmt != 1 or bit_depth != 16:
        raise ValueError(f"only PCM-16 supported (fmt={audio_fmt}, bits={bit_depth})")
    pcm = array("h")
    pcm.frombytes(body[:len(body) - (len(body) % 2)])
    if sys.byteorder == "big":
        pcm.byteswap()
    return {"sample_rate": sample_rate, "n_channels": n_channels,
            "bit_depth": 16, "n_samples": len(pcm) // n_channels,
            "samples": pcm}


# --- Y4M (YUV4MPEG2) ------------------------------------------------------
#
# The uncompressed video interchange format (mjpegtools; what ffmpeg emits
# with `-f yuv4mpeg`): one ASCII stream header `YUV4MPEG2 W<w> H<h>
# F<n>:<d> ...\n`, then per frame an ASCII `FRAME...\n` marker followed by
# raw planar YUV bytes. Header+raw-planes makes it stdlib-parseable the
# same way WAV was — this closes the video half of dp12's decode seam.

Y4M_SIG = b"YUV4MPEG2 "

_Y4M_PLANES = {  # colorspace tag -> frame size in bytes as fn(w, h)
    "C420": lambda w, h: w * h + 2 * ((w // 2) * (h // 2)),
    "C420jpeg": lambda w, h: w * h + 2 * ((w // 2) * (h // 2)),
    "C420mpeg2": lambda w, h: w * h + 2 * ((w // 2) * (h // 2)),
    "C420paldv": lambda w, h: w * h + 2 * ((w // 2) * (h // 2)),
    "C422": lambda w, h: w * h + 2 * ((w // 2) * h),
    "C444": lambda w, h: 3 * w * h,
    "Cmono": lambda w, h: w * h,
}


def _y4m_frame_size(width: int, height: int, colorspace: str) -> int:
    if colorspace not in _Y4M_PLANES:
        raise ValueError(f"unsupported Y4M colorspace {colorspace!r}")
    if colorspace.startswith(("C420", "C422")) and (width % 2 or
                                                    colorspace.startswith("C420") and height % 2):
        raise ValueError(f"{colorspace} requires even dimensions, got {width}x{height}")
    return _Y4M_PLANES[colorspace](width, height)


def encode_y4m(width: int, height: int, frames, fps: tuple[int, int] = (25, 1),
               colorspace: str = "C420jpeg") -> bytes:
    """Minimal YUV4MPEG2 encoder (fixtures). ``frames``: iterable of raw
    planar frame bytes, each exactly the colorspace's frame size."""
    size = _y4m_frame_size(width, height, colorspace)
    head = f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n"
    out = bytearray(head.encode("ascii"))
    for f in frames:
        if len(f) != size:
            raise ValueError(f"frame must be {size} bytes, got {len(f)}")
        out.extend(b"FRAME\n")
        out.extend(f)
    return bytes(out)


def decode_y4m(data: bytes) -> dict:
    """Real Y4M decode: stream-header token parse, then FRAME-marker walk
    slicing fixed-size planar payloads. Returns {width, height, fps,
    colorspace, n_frames, frames} with ``frames`` a list of raw planar
    bytes (Y plane first, then subsampled U/V per the colorspace)."""
    if data[:10] != Y4M_SIG:
        raise ValueError("not a YUV4MPEG2 stream (bad signature)")
    nl = data.index(b"\n")
    width = height = None
    fps = (25, 1)
    colorspace = "C420jpeg"  # the spec's default when no C tag is present
    for tok in data[10:nl].split(b" "):
        t = tok.decode("ascii", errors="replace")
        if t.startswith("W"):
            width = int(t[1:])
        elif t.startswith("H"):
            height = int(t[1:])
        elif t.startswith("F"):
            n, d = t[1:].split(":")
            fps = (int(n), int(d))
        elif t.startswith("C"):
            colorspace = t
    if width is None or height is None:
        raise ValueError("Y4M header missing W/H")
    size = _y4m_frame_size(width, height, colorspace)
    frames = []
    pos = nl + 1
    while pos < len(data):
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        fnl = data.index(b"\n", pos)  # FRAME may carry its own params
        body = data[fnl + 1:fnl + 1 + size]
        if len(body) != size:
            raise ValueError("truncated frame payload")
        frames.append(bytes(body))
        pos = fnl + 1 + size
    return {"width": width, "height": height, "fps": fps,
            "colorspace": colorspace, "n_frames": len(frames), "frames": frames}


# --- resampling (nearest-neighbor, stdlib) --------------------------------

def resample_plane(plane: bytes, w: int, h: int, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample of one row-major byte plane — the real
    (if basic) kernel behind image/video resize; PIL would do the same
    math with a better filter."""
    if new_w <= 0 or new_h <= 0:
        raise ValueError("target dimensions must be positive")
    out = bytearray(new_w * new_h)
    for y in range(new_h):
        sy = min(h - 1, (y * h) // new_h)
        row = sy * w
        orow = y * new_w
        for x in range(new_w):
            out[orow + x] = plane[row + min(w - 1, (x * w) // new_w)]
    return bytes(out)


def sniff_kind(data: bytes) -> str:
    """Container detection by magic bytes — what a real ingest pipeline
    does before routing to a decoder."""
    if data[:8] == PNG_SIG:
        return "png"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:10] == Y4M_SIG:
        return "y4m"
    return "unknown"
