"""REAL media bytes through the multimodal operators, distributed.

The oracle queries exercise the stub branch (synthesized payloads);
these tests build genuine PNG and PCM-WAV bytes with the stdlib
(zlib/struct/wave), ship them through the Arrow-batched mapInPandas
operators, and check the decoded features against locally computed
ground truth — proving the real decode path, not just the plumbing.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

from oil_wells_data_wrangling_spark.operators.multimodal import (
    decode_png,
    decode_wav,
    nn_resize,
    resize_features,
    wav_chunk_features,
)


# ----------------------------------------------------------- encoders (tests)

def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Minimal PNG writer: 8-bit, one row filter per scanline cycling
    through all five filter types so the decoder's unfiltering is
    genuinely exercised."""
    colortype = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0)
    stride = width * channels
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        line = bytearray(pixels[y * stride : (y + 1) * stride])
        f = y % 5
        filt = bytearray(stride)
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if f == 0:
                filt[i] = line[i]
            elif f == 1:
                filt[i] = (line[i] - a) & 0xFF
            elif f == 2:
                filt[i] = (line[i] - b) & 0xFF
            elif f == 3:
                filt[i] = (line[i] - (a + b) // 2) & 0xFF
            else:
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[i] = (line[i] - pr) & 0xFF
        raw.append(f)
        raw += filt
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def encode_wav(sample_rate: int, samples: list[int], channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(channels)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def _gradient(width: int, height: int, channels: int = 3) -> bytes:
    return bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(height)
        for x in range(width)
        for c in range(channels)
    )


# ------------------------------------------------------------------ unit round-trip

def test_png_roundtrip_all_filters():
    px = _gradient(6, 10)
    img = decode_png(encode_png(6, 10, px))
    assert img is not None
    assert (img["width"], img["height"], img["channels"]) == (6, 10, 3)
    assert img["pixels"] == px


def test_wav_roundtrip_mono_and_stereo():
    mono = [((i * 37) % 2000) - 1000 for i in range(800)]
    a = decode_wav(encode_wav(8000, mono))
    assert a is not None
    assert a["sample_rate"] == 8000 and a["n_frames"] == 800
    assert list(a["samples"]) == mono
    stereo = [v for i in range(400) for v in (i % 100, -(i % 100))]
    b = decode_wav(encode_wav(8000, stereo, channels=2))
    assert b is not None and b["n_frames"] == 400
    # integer average of (v, -v) floors toward -inf for odd v
    assert list(b["samples"]) == [
        (i % 100 + -(i % 100)) // 2 for i in range(400)
    ]


# ----------------------------------------------------------- distributed real decode

def test_resize_features_decodes_real_png_distributed(spark):
    sizes = [(10, 4), (300, 50), (16, 224), (64, 64), (5, 301)]
    rows = []
    expect = {}
    for doc_id, (w, h) in enumerate(sizes):
        px = _gradient(w, h)
        payload = encode_png(w, h, px)
        # metadata dims are WRONG on purpose: the real header must win
        rows.append((doc_id, bytearray(payload), 999, 111))
        new_w = 224 if w >= h else (w * 224) // h
        new_h = 224 if h >= w else (h * 224) // w
        thumb = nn_resize(px, w, h, 3, new_w, new_h)
        expect[doc_id] = (w, h, new_w, new_h, hashlib.md5(thumb).hexdigest())
    # a non-PNG payload keeps metadata dims and a NULL fingerprint
    rows.append((99, bytearray(b"not a png"), 40, 30))
    expect[99] = (40, 30, 224, 168, None)

    media = spark.createDataFrame(
        rows, "doc_id long, payload binary, w int, h int"
    ).repartition(4)
    got = {
        r["doc_id"]: (r["w"], r["h"], r["new_w"], r["new_h"], r["thumb_fp"])
        for r in resize_features(media).collect()
    }
    assert got == expect


def test_wav_chunk_features_decodes_real_wav_distributed(spark):
    sr = 8000
    rows = []
    expect = {}
    for doc_id, dur_s in enumerate([0.25, 1.0, 5.0, 12.5]):
        n = int(sr * dur_s)
        samples = [((i * 31 + doc_id * 7) % 4001) - 2000 for i in range(n)]
        rows.append((doc_id, bytearray(encode_wav(sr, samples))))
        chunk = 5 * sr
        n_chunks = max(1, (n + chunk - 1) // chunk)
        level_sum = 0
        for ci in range(n_chunks):
            part = samples[ci * chunk : (ci + 1) * chunk]
            if part:
                level_sum += sum(abs(x) for x in part) // len(part)
        expect[doc_id] = (sr, n * 1000 // sr, n_chunks, level_sum)
    rows.append((99, bytearray(b"RIFFxxxxJUNK")))  # RIFF but not WAVE
    expect[99] = (None, None, None, None)

    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(3)
    got = {
        r["doc_id"]: (r["sample_rate"], r["dur_ms"], r["n_chunks"], r["level_sum"])
        for r in wav_chunk_features(df).collect()
    }
    assert got == expect


def test_audio_envelope_gain_invariant_on_real_wav(spark):
    """The mm_audio_neardup claim on GENUINE bytes: a 2x-amplitude
    remaster of the same recording — re-encoded as real PCM WAV and
    decoded with the stdlib ``wave`` path — produces the IDENTICAL
    envelope fingerprint, while a different recording does not. Levels
    are per-window integer mean-abs amplitude (wav_chunk_features'
    arithmetic at envelope granularity)."""
    from oil_wells_data_wrangling_spark.operators.multimodal import (
        decode_wav,
        envelope_bits,
    )

    sr, n = 8000, 8000
    orig = [((i * 131 + 17) % 2001) - 1000 for i in range(n)]
    loud = [max(-32768, min(32767, 2 * x)) for x in orig]
    other = [((i * 997 + 5) % 2001) - 1000 for i in range(n)]

    def fp(samples: list[int]) -> int:
        dec = decode_wav(encode_wav(sr, samples))
        assert dec is not None
        s = dec["samples"]
        win = max(1, len(s) // 64)
        levels = [
            sum(abs(x) for x in s[i * win : (i + 1) * win]) // win
            for i in range(64)
        ]
        return envelope_bits(levels)

    assert fp(orig) == fp(loud), "gain must not change the envelope"
    assert fp(orig) != fp(other), "different audio must fingerprint apart"


# ------------------------------------------------------ property round-trips

from hypothesis import given, settings, strategies as st  # noqa: E402


@st.composite
def png_case(draw):
    w = draw(st.integers(1, 24))
    h = draw(st.integers(1, 24))
    channels = draw(st.sampled_from([1, 3, 4]))
    pixels = bytes(
        draw(
            st.lists(
                st.integers(0, 255),
                min_size=w * h * channels,
                max_size=w * h * channels,
            )
        )
    )
    return w, h, channels, pixels


@settings(max_examples=40, deadline=None)
@given(png_case())
def test_png_roundtrip_property(case):
    """decode(encode(img)) == img for ANY dims/channels/pixel content —
    the unfiltering must be exact for every filter type the encoder
    cycles through, including 1-pixel-wide edge cases."""
    w, h, channels, pixels = case
    img = decode_png(encode_png(w, h, pixels, channels=channels))
    assert img is not None
    assert (img["width"], img["height"], img["channels"]) == (w, h, channels)
    assert img["pixels"] == pixels


@settings(max_examples=25, deadline=None)
@given(
    st.integers(8000, 48000),
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=500),
)
def test_wav_roundtrip_property(sr, samples):
    a = decode_wav(encode_wav(sr, samples))
    assert a is not None
    assert a["sample_rate"] == sr
    assert list(a["samples"]) == samples


# ------------------------------------------------- malformed-payload contract

def test_decode_png_malformed_returns_none_not_raise():
    """ADVICE r5 (medium): payloads passing the magic check but corrupt
    past it must return None (the documented fallback contract), never
    raise — a raise inside mapInPandas kills the whole batch."""
    good = encode_png(6, 5, _gradient(6, 5))
    cases = [
        good[:20],                                   # truncated mid-IHDR
        good[:60],                                   # truncated mid-IDAT
        good[:33] + b"\x00\x00\x00\x08IDAT\x01\x02\x03\x04\x05\x06\x07\x08"
        + b"\x00\x00\x00\x00",                       # garbage (non-zlib) IDAT
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 16,         # magic then junk
    ]
    # a valid header whose IDAT inflates short (height lies)
    lying = encode_png(6, 5, _gradient(6, 5))
    lying = lying.replace(struct.pack(">II", 6, 5), struct.pack(">II", 6, 500), 1)
    cases.append(lying)
    for i, payload in enumerate(cases):
        assert decode_png(payload) is None, f"case {i} should degrade to None"


def test_decode_wav_malformed_returns_none_not_raise():
    good = encode_wav(8000, list(range(-50, 50)))
    cases = [
        good[:16],                # truncated header (wave raises EOFError)
        good[:30],                # truncated fmt chunk
        b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 8,   # magic then junk
    ]
    for i, payload in enumerate(cases):
        assert decode_wav(payload) is None, f"case {i} should degrade to None"
    # a truncated DATA chunk (odd byte count) may legitimately decode
    # to the readable prefix — it must just never raise
    partial = decode_wav(good[:-11])
    assert partial is None or partial["sample_rate"] == 8000


def test_resize_features_tolerates_malformed_rows_distributed(spark):
    """A batch mixing a good PNG with a corrupt one (magic intact) must
    still succeed: the good row decodes (thumb_fp set, header dims win),
    the bad row falls back to the stub path (metadata dims, no fp)."""
    from pyspark.sql import Row

    good = encode_png(8, 6, _gradient(8, 6))
    bad = good[:40]  # passes the magic check, truncated IDAT
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(good), w=99, h=77),
         Row(doc_id=2, payload=bytearray(bad), w=99, h=77)],
        "doc_id bigint, payload binary, w int, h int",
    ).repartition(2)
    out = {r.doc_id: r for r in resize_features(df).collect()}
    assert len(out) == 2
    assert out[1].thumb_fp is not None and (out[1].w, out[1].h) == (8, 6)
    assert out[2].thumb_fp is None and (out[2].w, out[2].h) == (99, 77)


# --------------------------------------------------------------- APNG (video)

def encode_apng(frames: list[bytes], width: int, height: int,
                channels: int = 3) -> bytes:
    """Minimal valid APNG writer: acTL + per-frame fcTL, first frame in
    IDAT, subsequent frames in fdAT (zlib, filter-0 scanlines)."""
    colortype = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0)
    stride = width * channels

    def _scanlines(px: bytes) -> bytes:
        raw = bytearray()
        for y in range(height):
            raw.append(0)  # filter None
            raw += px[y * stride : (y + 1) * stride]
        return zlib.compress(bytes(raw))

    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for i, px in enumerate(frames):
        fctl = struct.pack(
            ">IIIIIHHBB", seq, width, height, 0, 0, 1, 10, 0, 0
        )
        out += _chunk(b"fcTL", fctl)
        seq += 1
        z = _scanlines(px)
        if i == 0:
            out += _chunk(b"IDAT", z)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + z)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def test_apng_roundtrip():
    from oil_wells_data_wrangling_spark.operators.multimodal import decode_apng

    w, h = 6, 4
    frames = [
        bytes((x * 3 + y * 5 + f * 17) % 256 for _ in [0] for y in range(h)
              for x in range(w) for _c in range(3))
        for f in range(5)
    ]
    vid = decode_apng(encode_apng(frames, w, h))
    assert vid is not None
    assert (vid["width"], vid["height"], vid["channels"]) == (w, h, 3)
    assert vid["frames"] == frames


def test_apng_malformed_or_out_of_profile_returns_none():
    from oil_wells_data_wrangling_spark.operators.multimodal import (
        decode_apng,
        decode_png,
    )

    w, h = 4, 3
    px = _gradient(w, h)
    good = encode_apng([px, px], w, h)
    # still PNG (no acTL) is not an animation
    assert decode_apng(encode_png(w, h, px)) is None
    # truncated mid-fdAT / junk after magic degrade to None
    assert decode_apng(good[:50]) is None
    assert decode_apng(b"\x89PNG\r\n\x1a\n" + b"\x00" * 12) is None
    # sub-frame fcTL (offset != 0) is out of profile
    bad = good.replace(
        struct.pack(">IIIIIHHBB", 0, w, h, 0, 0, 1, 10, 0, 0),
        struct.pack(">IIIIIHHBB", 0, w - 2, h, 2, 0, 1, 10, 0, 0),
        1,
    )
    assert decode_apng(bad) is None
    # an APNG is still a valid single-frame PNG to the still decoder
    assert decode_png(good) is not None


def test_frame_sample_decodes_real_apng_distributed(spark):
    """Real video-container bytes through the distributed sampler: the
    APNG rows report the container's own frame count and a pixel-level
    sample fingerprint; a stub row in the same batch still takes the
    md5-chain path."""
    import hashlib

    from pyspark.sql import Row

    from oil_wells_data_wrangling_spark.operators.multimodal import (
        frame_sample_features,
    )

    w, h = 8, 5
    mk = lambda f: bytes(
        (x * 7 + y * 11 + f * 29) % 256
        for y in range(h) for x in range(w) for _ in range(3)
    )
    vids = {1: [mk(i) for i in range(6)], 2: [mk(i + 50) for i in range(3)]}
    rows = [
        Row(doc_id=d, payload=bytearray(encode_apng(fs, w, h)),
            text="unused", n_frames=99)
        for d, fs in vids.items()
    ]
    rows.append(Row(doc_id=3, payload=None, text="stubby", n_frames=4))
    df = spark.createDataFrame(
        rows, "doc_id bigint, payload binary, text string, n_frames int"
    ).repartition(3)

    got = {r.doc_id: r for r in frame_sample_features(df).collect()}
    for d, fs in vids.items():
        assert got[d].n_frames == len(fs)  # container count, not metadata
        assert got[d].n_sampled == (len(fs) + 1) // 2
        assert got[d].sample_fp == hashlib.md5(b"".join(fs[::2])).hexdigest()
    stub_kept = [
        hashlib.md5(f"stubby_{i}".encode()).hexdigest() for i in range(4)
    ][::2]
    assert got[3].n_frames == 4 and got[3].n_sampled == 2
    assert got[3].sample_fp == hashlib.md5("".join(stub_kept).encode()).hexdigest()


def test_pil_gate_contract_with_fake_module(monkeypatch):
    """decode_image must route: stdlib PNG first (deterministic path
    always wins, even with PIL present), PIL for compressed formats it
    claims, None for garbage — driven by a FAKE PIL so the gate's
    contract is pinned on hosts without the real library."""
    import sys
    import types

    from oil_wells_data_wrangling_spark.operators import multimodal as mm

    opened = []

    class FakeImg:
        def __init__(self, mode, size):
            self.mode = mode
            self.width, self.height = size

        def convert(self, mode):
            return FakeImg(mode, (self.width, self.height))

        def tobytes(self):
            n = {"L": 1, "RGB": 3, "RGBA": 4}[self.mode]
            return bytes(self.width * self.height * n)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class FakeImageModule(types.ModuleType):
        @staticmethod
        def open(buf):
            data = buf.read()
            opened.append(data[:2])
            if data[:2] == b"\xff\xd8":  # JPEG SOI
                return FakeImg("CMYK", (10, 6))  # odd mode -> RGB convert
            raise OSError("cannot identify image file")

    fake_pkg = types.ModuleType("PIL")
    fake_img = FakeImageModule("PIL.Image")
    fake_pkg.Image = fake_img
    monkeypatch.setitem(sys.modules, "PIL", fake_pkg)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_img)
    monkeypatch.setattr(mm, "_HAS_PIL", True)

    # PNG payload: stdlib decoder wins, PIL never consulted
    png = encode_png(3, 2, bytes(range(3 * 2 * 3)))
    got = mm.decode_image(png)
    assert got is not None and (got["width"], got["height"]) == (3, 2)
    assert opened == []

    # JPEG payload: PIL path, odd mode normalized to RGB
    jpg = b"\xff\xd8" + b"\x00" * 16
    got = mm.decode_image(jpg)
    assert got == {
        "width": 10,
        "height": 6,
        "channels": 3,
        "pixels": bytes(10 * 6 * 3),
    }
    assert opened == [b"\xff\xd8"]

    # garbage: PIL refuses -> None (degrade, not raise)
    assert mm.decode_image(b"\x00\x01\x02\x03") is None

    # gate closed: PIL path unreachable even with the module present
    monkeypatch.setattr(mm, "_HAS_PIL", False)
    assert mm.decode_image(jpg) is None


# --------------------------------------------------------------- JPEG headers


def encode_jpeg_headers(
    width: int, height: int, channels: int = 3, progressive: bool = False
) -> bytes:
    """A structurally genuine JPEG marker stream (SOI, APP0/JFIF, DQT,
    SOF, DHT, SOS, entropy filler, EOI) with real segment lengths — what
    any camera/encoder emits, minus meaningful entropy data. Header
    parsing must treat it exactly like a real photo."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(64)
    comp = b"".join(
        bytes([cid + 1, 0x11 if cid == 0 else 0x22, 0x00])
        for cid in range(channels)
    )
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = (
        b"\x08"
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([channels])
        + comp
    )
    dht = b"\x00" + bytes(16) + b""
    sos = bytes([channels]) + b"".join(
        bytes([cid + 1, 0x00]) for cid in range(channels)
    ) + b"\x00\x3f\x00"

    def seg(marker: bytes, body: bytes) -> bytes:
        return marker + (len(body) + 2).to_bytes(2, "big") + body

    return (
        b"\xff\xd8"
        + seg(b"\xff\xe0", app0)
        + seg(b"\xff\xdb", dqt)
        + seg(sof_marker, sof)
        + seg(b"\xff\xc4", dht)
        + seg(b"\xff\xda", sos)
        + b"\x12\x34\x56\x78"  # entropy-coded filler
        + b"\xff\xd9"
    )


def test_jpeg_dims_parses_genuine_headers_and_rejects_noise():
    from oil_wells_data_wrangling_spark.operators.multimodal import jpeg_dims

    for w, h, ch, prog in [
        (640, 480, 3, False),
        (1, 1, 1, False),
        (8192, 33, 3, True),  # progressive SOF2
        (17, 90, 4, False),
    ]:
        got = jpeg_dims(encode_jpeg_headers(w, h, ch, progressive=prog))
        assert got == {
            "width": w, "height": h, "channels": ch, "pixels": None
        }, (w, h, ch, prog)

    # 16-byte md5-style payloads can never collide (length gate)
    assert jpeg_dims(b"\xff\xd8" + bytes(14)) is None
    # SOI + garbage marker stream
    assert jpeg_dims(b"\xff\xd8" + b"\x00" * 40) is None
    # SOS before any SOF is malformed
    soi_sos = b"\xff\xd8" + b"\xff\xda\x00\x08" + bytes(38)
    assert jpeg_dims(soi_sos) is None
    # truncated mid-segment
    real = encode_jpeg_headers(100, 50)
    assert jpeg_dims(real[:20]) is None
    # PNG is not a JPEG
    assert jpeg_dims(encode_png(3, 2, bytes(18))) is None


def test_resize_features_reads_genuine_jpeg_dims_distributed(spark):
    """Genuine JPEG bytes through the registered resize plumbing on a
    PIL-less host: the SOF frame size must override the (wrong)
    metadata dims, the box fit must use the TRUE size, and the
    fingerprint stays NULL (no pixel decode without PIL)."""
    sizes = [(640, 480), (33, 467), (224, 224)]
    rows = []
    expect = {}
    for doc_id, (w, h) in enumerate(sizes):
        rows.append(
            (doc_id, bytearray(encode_jpeg_headers(w, h)), 999, 111)
        )
        new_w = 224 if w >= h else (w * 224) // h
        new_h = 224 if h >= w else (h * 224) // w
        expect[doc_id] = (w, h, new_w, new_h, None)
    media = spark.createDataFrame(
        rows, "doc_id long, payload binary, w int, h int"
    ).repartition(3)
    got = {
        r["doc_id"]: (r["w"], r["h"], r["new_w"], r["new_h"], r["thumb_fp"])
        for r in resize_features(media).collect()
    }
    assert got == expect


_FAKE_PIL_IMAGE_SRC = '''
"""Fake PIL.Image for the distributed import-gate test: decodes ONLY the
FAKEJPG container (SOI + b"FAKEJPG" + w:2 + h:2 + raw RGB bytes) and
refuses everything else, so no other payload shape in the test session
can ever route through it."""
import io


class _Img:
    def __init__(self, mode, width, height, data):
        self.mode, self.width, self.height, self._data = mode, width, height, data

    def convert(self, mode):
        return self

    def tobytes(self):
        return self._data

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def open(fp):
    data = fp.read() if hasattr(fp, "read") else bytes(fp)
    if data[:2] != b"\\xff\\xd8" or data[2:9] != b"FAKEJPG":
        raise OSError("cannot identify image file")
    w = int.from_bytes(data[9:11], "big")
    h = int.from_bytes(data[11:13], "big")
    px = data[13 : 13 + w * h * 3]
    if len(px) != w * h * 3:
        raise OSError("truncated")
    return _Img("RGB", w, h, px)
'''


def test_resize_features_jpeg_pixels_via_gated_pil_distributed(tmp_path):
    """The PIL pixel path end-to-end ON EXECUTORS: a fake PIL package is
    made importable via PYTHONPATH in a fresh subprocess SparkSession
    (driver AND workers), compressed payloads decode + thumbnail
    distributed, and each fingerprint matches a local nn_resize replay
    bit-for-bit. Runs isolated so the fake module can't leak into this
    session's import state."""
    import os
    import subprocess
    import sys
    import textwrap

    pil_dir = tmp_path / "fake_pil"
    (pil_dir / "PIL").mkdir(parents=True)
    (pil_dir / "PIL" / "__init__.py").write_text("from . import Image\n")
    (pil_dir / "PIL" / "Image.py").write_text(_FAKE_PIL_IMAGE_SRC)

    probe = textwrap.dedent(
        """
        import hashlib, sys, os
        sys.path.insert(0, os.environ["REPO"])
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.sql.shuffle.partitions", "2")
                 .config("spark.ui.enabled", "false").getOrCreate())
        from oil_wells_data_wrangling_spark.operators import multimodal as mm
        assert mm._HAS_PIL, "fake PIL not importable on the driver"
        sizes = [(10, 4), (7, 31)]
        rows, expect = [], {}
        for doc_id, (w, h) in enumerate(sizes):
            px = bytes((doc_id * 7 + i) % 251 for i in range(w * h * 3))
            payload = (b"\\xff\\xd8" + b"FAKEJPG"
                       + w.to_bytes(2, "big") + h.to_bytes(2, "big") + px)
            rows.append((doc_id, bytearray(payload), 999, 111))
            new_w = 224 if w >= h else (w * 224) // h
            new_h = 224 if h >= w else (h * 224) // w
            thumb = mm.nn_resize(px, w, h, 3, new_w, new_h)
            expect[doc_id] = (w, h, new_w, new_h,
                              hashlib.md5(thumb).hexdigest())
        media = spark.createDataFrame(
            rows, "doc_id long, payload binary, w int, h int").repartition(2)
        got = {r["doc_id"]: (r["w"], r["h"], r["new_w"], r["new_h"],
                             r["thumb_fp"])
               for r in mm.resize_features(media).collect()}
        assert got == expect, (got, expect)
        print("PIL_DISTRIBUTED_OK")
        """
    )
    env = dict(os.environ)
    env["REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = str(pil_dir) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    out = subprocess.run(
        [sys.executable, "-c", probe],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "PIL_DISTRIBUTED_OK" in out.stdout


def test_phash_identical_across_uniform_rescale_distributed(spark):
    """dHash must be INVARIANT under integer upscaling (the 9×8 sample
    grid lands on the same relative pixels) and must separate genuinely
    different images; payloads no decoder claims take the stub path.
    Run distributed through the real mapInPandas chain."""
    from oil_wells_data_wrangling_spark.operators.multimodal import (
        nn_resize,
        phash64,
        phash_features,
    )

    w, h = 18, 16
    px = _gradient(w, h)
    base = encode_png(w, h, px)
    up = encode_png(
        w * 2, h * 2, nn_resize(px, w, h, 3, w * 2, h * 2)
    )
    # a genuinely different image: gradient with axes transposed
    other_px = bytes(
        px[((x * h // w) * w + (y * w // h)) * 3 + c]
        for y in range(h) for x in range(w) for c in range(3)
    )
    other = encode_png(w, h, other_px)
    stub = b"\x07\x01" * 8  # not a PNG: stub path
    media = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(up)),
         (3, bytearray(other)), (4, bytearray(stub))],
        "doc_id long, payload binary",
    ).repartition(2)
    got = {r.doc_id: r.phash for r in phash_features(media).collect()}
    assert got[1] == got[2], "uniform 2x rescale changed the dHash"
    assert got[1] != got[3], "transposed image collided"
    assert got[4] == int.from_bytes(stub[:7], "big")
    # and the local hash agrees with the distributed one
    from oil_wells_data_wrangling_spark.operators.multimodal import (
        decode_png,
    )

    assert got[1] == phash64(decode_png(base))


def test_phash_neardup_catches_perturbed_png():
    """A lightly perturbed image (a few pixels brightened) must land
    within a small Hamming distance of its source — the property the
    banded near-dup join exists to catch — while a structurally
    different image must sit far away."""
    from oil_wells_data_wrangling_spark.operators.multimodal import (
        decode_png,
        phash64,
    )

    w, h = 18, 16
    px = bytearray(_gradient(w, h))
    base = phash64(decode_png(encode_png(w, h, bytes(px))))
    # brighten one 2x2 patch by a small delta
    for y in (5, 6):
        for x in (7, 8):
            for c in range(3):
                i = (y * w + x) * 3 + c
                px[i] = min(255, px[i] + 24)
    pert = phash64(decode_png(encode_png(w, h, bytes(px))))
    other_px = bytes(
        px[((x * h // w) * w + (y * w // h)) * 3 + c]
        for y in range(h) for x in range(w) for c in range(3)
    )
    other = phash64(decode_png(encode_png(w, h, other_px)))

    def ham(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(base, pert) <= 6, f"perturbation moved hash {ham(base, pert)} bits"
    assert ham(base, other) > 6
