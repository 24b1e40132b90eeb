"""Stdlib PNG/WAV codec correctness: hand-computed fixtures (bytes built
chunk-by-chunk, NOT via our own encoder) plus encoder round-trips per
filter type, and the mapInPandas real-decode path end-to-end."""

import struct
import zlib

import pytest

from flinkrealtimedatawarehouse_spark.datapipeline import codecs, multimodal


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _hand_png(raw_scanlines: bytes, w: int, h: int, ctype: int = 0,
              depth: int = 8, interlace: int = 0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (codecs.PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw_scanlines)) + _chunk(b"IEND", b""))


def test_png_decode_hand_built_filter0():
    # 2x2 gray, pixels 10 20 / 30 40, filter None on both rows
    png = _hand_png(b"\x00\x0a\x14\x00\x1e\x28", 2, 2)
    d = codecs.decode_png(png)
    assert (d["width"], d["height"], d["channels"]) == (2, 2, 1)
    assert d["pixels"] == bytes([10, 20, 30, 40])


def test_png_decode_hand_built_sub_and_up():
    # Row 1 Sub-filtered BY HAND: pixels 10,20 -> deltas 10,10.
    # Row 2 Up-filtered BY HAND: pixels 30,40 minus prev 10,20 -> 20,20.
    png = _hand_png(b"\x01\x0a\x0a\x02\x14\x14", 2, 2)
    assert codecs.decode_png(png)["pixels"] == bytes([10, 20, 30, 40])


def test_png_decode_hand_built_average_and_paeth():
    # Row 1 Average: pixel p at (x): stored = p - (left + 0)//2.
    #   pixels 100, 110 -> stored 100, 110 - 100//2 = 60.
    # Row 2 Paeth: predictor of (a=left, b=up, c=up-left).
    #   pixels 120, 130; x=0: a=0,b=100,c=0 -> pred=100, stored 20;
    #   x=1: a=120,b=110,c=100 -> p=130, pa=10,pb=20,pc=30 -> pred=a=120,
    #   stored 10.
    png = _hand_png(b"\x03\x64\x3c\x04\x14\x0a", 2, 2)
    assert codecs.decode_png(png)["pixels"] == bytes([100, 110, 120, 130])


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ctype", [0, 2, 4, 6])
def test_png_roundtrip_every_filter_and_colortype(ft, ctype):
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    w, h = 5, 4
    pixels = bytes((i * 37 + 11) % 256 for i in range(w * h * ch))
    d = codecs.decode_png(codecs.encode_png(w, h, pixels, ctype, ft))
    assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
    assert d["pixels"] == pixels


def test_png_decode_hand_built_adam7():
    """Byte-exact hand-built Adam7 stream: 3x3 gray, pixels 1..9. The
    non-empty passes for 3x3 are 1 (0,0), 4 (2,0), 5 ((0,2),(2,2)),
    6 ((1,0),(1,2)), 7 (row y=1) — laid out BY HAND in pass order with
    filter-0 scanlines, so the deinterlace scatter is pinned against the
    spec's pixel-extraction grid, not against our own encoder."""
    raw = (b"\x00\x01"              # pass 1: (0,0)=1
           b"\x00\x03"              # pass 4: (2,0)=3
           b"\x00\x07\x09"          # pass 5: (0,2)=7 (2,2)=9
           b"\x00\x02" b"\x00\x08"  # pass 6: (1,0)=2 then (1,2)=8
           b"\x00\x04\x05\x06")     # pass 7: row y=1 = 4 5 6
    d = codecs.decode_png(_hand_png(raw, 3, 3, interlace=1))
    assert (d["width"], d["height"], d["channels"]) == (3, 3, 1)
    assert d["pixels"] == bytes(range(1, 10))


def test_png_decode_hand_built_16bit_sub_filter():
    """16-bit gray: bpp is 2, so the Sub filter's left neighbor is the
    byte TWO back. 2x1 pixels 0x0102 0x0304 sub-filtered by hand:
    stored = 01 02 (03-01) (04-02)."""
    png = _hand_png(b"\x01\x01\x02\x02\x02", 2, 1, depth=16)
    d = codecs.decode_png(png)
    assert (d["bit_depth"], d["channels"]) == (16, 1)
    assert d["pixels"] == b"\x01\x02\x03\x04"


def test_png_adam7_roundtrip_edge_dims():
    """Interlaced encode->decode across dims that exercise empty passes
    (w or h below the pass grid's offsets) and the single-pixel corner."""
    for w, h in [(1, 1), (3, 3), (8, 8), (9, 10), (2, 16), (16, 2), (5, 1)]:
        px = bytes((i * 31 + 7) % 256 for i in range(w * h))
        out = codecs.decode_png(codecs.encode_png(w, h, px, 0, 4, interlace=True))
        assert out["pixels"] == px, (w, h)


def test_png_rejects_garbage_and_bad_depth():
    with pytest.raises(ValueError, match="signature"):
        codecs.decode_png(b"not a png at all")
    ihdr = struct.pack(">IIBBBBB", 1, 1, 4, 0, 0, 0, 0)  # sub-byte depth
    bad = codecs.PNG_SIG + _chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="depth"):
        codecs.decode_png(bad)
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 2)  # unknown interlace
    bad = codecs.PNG_SIG + _chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="interlace"):
        codecs.decode_png(bad)


def test_wav_decode_hand_built():
    # Hand-packed PCM-16 mono @ 8000 Hz, samples -1 and 258
    body = b"\xff\xff\x02\x01"  # little-endian int16: -1, 258
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(body)) + body)
    d = codecs.decode_wav(wav)
    assert d["sample_rate"] == 8000 and d["n_channels"] == 1
    assert list(d["samples"]) == [-1, 258]


def test_wav_roundtrip_stereo():
    samples = [0, 32767, -32768, 5, -5, 1000]
    d = codecs.decode_wav(codecs.encode_wav(samples, 44100, n_channels=2))
    assert list(d["samples"]) == samples
    assert d["n_samples"] == 3 and d["n_channels"] == 2


def test_wav_total_size_is_closed_form():
    # the dp12 oracle relies on len(wav) == 44 + 2 * n_samples
    for n in (0, 1, 7, 100):
        assert len(codecs.encode_wav(list(range(n)))) == 44 + 2 * n


def test_sniff_kind():
    assert codecs.sniff_kind(codecs.encode_png(1, 1, b"\x05")) == "png"
    assert codecs.sniff_kind(codecs.encode_wav([1])) == "wav"
    assert codecs.sniff_kind(codecs.encode_y4m(2, 2, [b"\0" * 4],
                                               colorspace="Cmono")) == "y4m"
    assert codecs.sniff_kind(b"\x00\x01\x02") == "unknown"


def test_y4m_decode_hand_built():
    """Byte-exact hand-built YUV4MPEG2 stream: 2x2 mono, two frames."""
    raw = (b"YUV4MPEG2 W2 H2 F30:1 Ip A1:1 Cmono\n"
           b"FRAME\n\x01\x02\x03\x04"
           b"FRAME\n\x05\x06\x07\x08")
    v = codecs.decode_y4m(raw)
    assert (v["width"], v["height"], v["fps"]) == (2, 2, (30, 1))
    assert v["colorspace"] == "Cmono" and v["n_frames"] == 2
    assert v["frames"] == [b"\x01\x02\x03\x04", b"\x05\x06\x07\x08"]


def test_y4m_c420_roundtrip_and_frame_params():
    """C420 plane sizing (w*h + 2*(w/2*h/2)) and FRAME markers that carry
    their own parameters (allowed by the spec) both decode."""
    w, h = 4, 2
    size = w * h + 2 * ((w // 2) * (h // 2))
    f0 = bytes(range(size))
    enc = codecs.encode_y4m(w, h, [f0], fps=(25, 1), colorspace="C420jpeg")
    assert codecs.decode_y4m(enc)["frames"] == [f0]
    # inject per-frame params after the FRAME tag
    patched = enc.replace(b"FRAME\n", b"FRAME Xsome=param\n")
    assert codecs.decode_y4m(patched)["frames"] == [f0]


def test_y4m_rejects_bad_input():
    with pytest.raises(ValueError):
        codecs.decode_y4m(b"not a video")
    with pytest.raises(ValueError):
        codecs.decode_y4m(b"YUV4MPEG2 F25:1\nFRAME\n")  # no W/H
    with pytest.raises(ValueError):
        codecs.encode_y4m(3, 3, [b"\0" * 9], colorspace="C420jpeg")  # odd dims
    with pytest.raises(ValueError):
        codecs.encode_y4m(2, 2, [b"\0" * 3], colorspace="Cmono")  # short frame
    # truncated payload
    good = codecs.encode_y4m(2, 2, [b"\x01\x02\x03\x04"], colorspace="Cmono")
    with pytest.raises(ValueError):
        codecs.decode_y4m(good[:-1])


def test_resample_plane_nearest_neighbor_hand_computed():
    # 4x2 -> 2x1: picks src (0,0) and (0,2)
    plane = bytes([10, 20, 30, 40,
                   50, 60, 70, 80])
    assert codecs.resample_plane(plane, 4, 2, 2, 1) == bytes([10, 30])
    # upscale 2x1 -> 4x2 duplicates
    assert codecs.resample_plane(bytes([1, 2]), 2, 1, 4, 2) == bytes(
        [1, 1, 2, 2, 1, 1, 2, 2])


@pytest.mark.slow
def test_real_features_match_fake_features_per_doc(spark):
    """decode(encode(text)) == text bytes: the real-decode features must
    equal the fake byte-level features doc-for-doc, across all five
    scanline filters (media_id % 5 rotation) including an empty doc and
    a short (<4 byte) doc."""
    rows = [(0, "hello world", "a"), (1, "x", "a"), (2, "", "b"),
            (3, "longer text " * 20, "b"), (4, "five!", "c"),
            (5, "\x01\x02\x7f", "c")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    fake = {
        r["media_id"]: r
        for r in multimodal.extract_features(
            multimodal.to_media_table(docs, "doc_id", "text", "source"), fake=True
        ).collect()
    }
    for builder in (multimodal.to_png_media, multimodal.to_wav_media,
                    multimodal.to_y4m_media):
        real = {
            r["media_id"]: r
            for r in multimodal.extract_features(
                builder(docs, "doc_id", "text", "source"), fake=False
            ).collect()
        }
        assert set(real) == set(fake)
        for mid, fr in fake.items():
            assert real[mid]["feat_sum"] == fr["feat_sum"], (builder, mid)
            assert real[mid]["feat_head"] == fr["feat_head"], (builder, mid)


def test_undecodable_payload_raises(spark):
    """A payload that is no known container must fail loudly in real
    mode (no silent fake fallback), whatever the claimed kind."""
    docs = spark.createDataFrame([(1, "clip", "v")],
                                 "doc_id long, text string, source string")
    media = multimodal.to_media_table(docs, "doc_id", "text", "source").select(
        "media_id", "payload",
        multimodal.F.struct(
            multimodal.F.lit("video").alias("kind"),
            multimodal.F.col("meta.n_bytes").alias("n_bytes"),
            multimodal.F.col("meta.source").alias("source"),
        ).alias("meta"),
    )
    with pytest.raises(Exception, match="(?i)undecodable"):
        multimodal.extract_features(media, fake=False).collect()


def test_real_frame_sample_demuxes_y4m(spark):
    """fake=False frame sampling returns the ACTUAL decoded frames: text
    bytes chunked into 8x8 luma planes, zero-padded tail, capped at
    max_frames."""
    text = "".join(chr(65 + (i % 26)) for i in range(150))  # 3 frames of 64
    docs = spark.createDataFrame([(7, text, "v")],
                                 "doc_id long, text string, source string")
    media = multimodal.to_y4m_media(docs, "doc_id", "text", "source")
    rows = sorted(
        multimodal.frame_sample(media, max_frames=2, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    raw = text.encode()
    assert [r.frame_idx for r in rows] == [0, 1]  # capped below the 3rd
    assert bytes(rows[0].frame) == raw[:64]
    assert bytes(rows[1].frame) == raw[64:128]

    # PNG -> its single pixel buffer; WAV -> PCM windows
    png = multimodal.to_png_media(docs, "doc_id", "text", "source")
    prow = multimodal.frame_sample(png, fake=False).collect()
    assert len(prow) == 1 and bytes(prow[0].frame).rstrip(b"\0") == raw
    wav = multimodal.to_wav_media(docs, "doc_id", "text", "source")
    wrows = multimodal.frame_sample(wav, every_n_bytes=64, max_frames=99,
                                    fake=False).collect()
    assert len(wrows) == len(raw) * 2 // 64  # PCM-16: 2 bytes per text byte


def test_real_resize_resamples_all_containers(spark):
    """fake=False resize really resamples: decoded content shrinks toward
    target_bytes and the result is a valid container of the same type."""
    text = "resize me " * 40  # 400 bytes
    docs = spark.createDataFrame([(3, text, "r")],
                                 "doc_id long, text string, source string")
    for builder, container in [(multimodal.to_png_media, "png"),
                               (multimodal.to_wav_media, "wav"),
                               (multimodal.to_y4m_media, "y4m")]:
        media = builder(docs, "doc_id", "text", "source")
        out = multimodal.resize(media, target_bytes=64, fake=False).collect()
        assert len(out) == 1
        payload = bytes(out[0].payload)
        assert codecs.sniff_kind(payload) == container
        assert out[0].meta.n_bytes == len(payload)
        if container == "png":
            img = codecs.decode_png(payload)
            assert 0 < img["width"] * img["height"] <= 100  # ~64 target
        elif container == "wav":
            assert codecs.decode_wav(payload)["n_samples"] == 32  # 64 // 2
        else:
            v = codecs.decode_y4m(payload)
            assert v["n_frames"] == 7  # frame count preserved
            assert 0 < v["width"] * v["height"] < 64  # each frame shrank


def test_real_resize_nearest_neighbor_values_hand_computed():
    """The resample kernel itself, end-to-end through a PNG payload:
    4x4 gray gradient -> 2x2 picks the (0,0),(0,2),(2,0),(2,2) pixels."""
    px = bytes(range(16))
    png = codecs.encode_png(4, 4, px, color_type=0)
    out = multimodal._real_resize(png, target_bytes=4)
    img = codecs.decode_png(out)
    assert (img["width"], img["height"]) == (2, 2)
    assert img["pixels"] == bytes([0, 2, 8, 10])


# --- property tests (hypothesis, pure-Python — no Spark) -------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_CODEC_SETTINGS = dict(max_examples=60, deadline=None)


@st.composite
def _y4m_streams(draw):
    cs = draw(st.sampled_from(sorted(codecs._Y4M_PLANES)))
    # C420* needs even w AND h, C422 even w; sample even and odd candidates
    w = draw(st.integers(1, 8).map(lambda v: v * 2))
    h = draw(st.integers(1, 8).map(lambda v: v * 2))
    if cs in ("C444", "Cmono"):
        w += draw(st.integers(0, 1))  # odd dims legal here
        h += draw(st.integers(0, 1))
    elif cs == "C422":
        h += draw(st.integers(0, 1))
    size = codecs._y4m_frame_size(w, h, cs)
    n = draw(st.integers(0, 4))
    frames = [bytes(draw(st.binary(min_size=size, max_size=size))) for _ in range(n)]
    fps = (draw(st.integers(1, 120)), draw(st.integers(1, 2)))
    return w, h, cs, fps, frames


@given(_y4m_streams())
@settings(**_CODEC_SETTINGS)
def test_y4m_roundtrip_property(stream):
    """encode->decode recovers every header field and every frame byte,
    for all 7 colorspaces, odd dims where legal, and 0..4 frames."""
    w, h, cs, fps, frames = stream
    v = codecs.decode_y4m(codecs.encode_y4m(w, h, frames, fps=fps, colorspace=cs))
    assert (v["width"], v["height"], v["fps"], v["colorspace"]) == (w, h, fps, cs)
    assert v["frames"] == frames


@given(
    w=st.integers(1, 12), h=st.integers(1, 12),
    new_w=st.integers(1, 12), new_h=st.integers(1, 12),
    data=st.data(),
)
@settings(**_CODEC_SETTINGS)
def test_resample_plane_property(w, h, new_w, new_h, data):
    """Nearest-neighbor invariants for arbitrary dims: output size is
    new_w*new_h, every output byte exists in the input, corner pixels map
    to corner pixels, and same-size resample is the identity."""
    plane = bytes(data.draw(st.binary(min_size=w * h, max_size=w * h)))
    out = codecs.resample_plane(plane, w, h, new_w, new_h)
    assert len(out) == new_w * new_h
    assert set(out) <= set(plane)
    assert out[0] == plane[0]  # top-left maps to top-left (floor indexing)
    if (new_w, new_h) == (w, h):
        assert out == plane


@given(
    w=st.integers(1, 9), h=st.integers(1, 9),
    ctype=st.sampled_from([0, 2, 4, 6]), ft=st.integers(0, 4),
    depth=st.sampled_from([8, 16]), interlace=st.booleans(),
    data=st.data(),
)
@settings(**_CODEC_SETTINGS)
def test_png_roundtrip_property(w, h, ctype, ft, depth, interlace, data):
    """PNG encode->decode is lossless for random pixel bytes across all
    supported color types x filter types x bit depths x row orders
    (sequential + Adam7) and arbitrary small dims (the parametrized test
    pins one fixed 5x4 image; this walks the dim grid where filter byte
    offsets and empty interlace passes are most error-prone: w=1, h=1)."""
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    n = w * h * ch * (depth // 8)
    px = bytes(data.draw(st.binary(min_size=n, max_size=n)))
    d = codecs.decode_png(
        codecs.encode_png(w, h, px, ctype, ft, bit_depth=depth, interlace=interlace)
    )
    assert (d["width"], d["height"], d["channels"], d["bit_depth"]) == (w, h, ch, depth)
    assert d["pixels"] == px


@given(st.integers(0, 40), st.integers(1, 2), st.data())
@settings(**_CODEC_SETTINGS)
def test_wav_roundtrip_property(n, n_ch, data):
    """WAV PCM-16 encode->decode recovers samples, channel count, and the
    closed-form container size (44 + 2*n) for any sample values incl.
    the int16 extremes."""
    samples = data.draw(st.lists(st.integers(-32768, 32767), min_size=n, max_size=n))
    if n % n_ch:
        samples = samples[: n - (n % n_ch)]
    raw = codecs.encode_wav(samples, n_channels=n_ch)
    assert len(raw) == 44 + 2 * len(samples)
    d = codecs.decode_wav(raw)
    assert list(d["samples"]) == samples and d["n_channels"] == n_ch
