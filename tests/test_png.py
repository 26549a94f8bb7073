"""Pure-stdlib PNG codec + real-pixel perceptual hash (VERDICT r3 #6)."""

from __future__ import annotations

import zlib

import pytest

from mlops_pipelines_featurestore_gcp_spark.functions import png
from mlops_pipelines_featurestore_gcp_spark.operators import multimodal


def _gradient(w, h):
    return bytes(((x * 255) // max(w - 1, 1)) for _ in range(h) for x in range(w))


def test_roundtrip_gray():
    samples = _gradient(16, 12)
    blob = png.encode_png(16, 12, samples, channels=1)
    assert png.is_png(blob)
    w, h, ch, out = png.decode_png(blob)
    assert (w, h, ch) == (16, 12, 1)
    assert out == samples


def test_roundtrip_rgb_and_rgba():
    rgb = bytes((x * 11 + c * 37) % 256 for x in range(6 * 4) for c in range(3))
    blob = png.encode_png(6, 4, rgb, channels=3)
    assert png.decode_png(blob)[:3] == (6, 4, 3)
    assert png.decode_png(blob)[3] == rgb
    rgba = bytes((x * 7 + c * 13) % 256 for x in range(3 * 5) for c in range(4))
    blob4 = png.encode_png(3, 5, rgba, channels=4)
    assert png.decode_png(blob4)[3] == rgba


def _encode_with_filter(width, height, samples, filt):
    """Hand-build a grayscale PNG using one specific filter on every row
    (encode_png always emits filter 0) to exercise the decoder's unfilter
    paths."""
    import struct

    stride = width
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        line = bytearray(samples[y * stride : (y + 1) * stride])
        enc = bytearray(stride)
        for i in range(stride):
            left = line[i - 1] if i >= 1 else 0
            ul = prev[i - 1] if i >= 1 else 0
            if filt == 0:
                enc[i] = line[i]
            elif filt == 1:
                enc[i] = (line[i] - left) & 0xFF
            elif filt == 2:
                enc[i] = (line[i] - prev[i]) & 0xFF
            elif filt == 3:
                enc[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
            elif filt == 4:
                enc[i] = (line[i] - png._paeth(left, prev[i], ul)) & 0xFF
        raw.append(filt)
        raw += enc
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_decode_all_scanline_filters(filt):
    samples = bytes((x * 31 + y * 17) % 256 for y in range(9) for x in range(7))
    blob = _encode_with_filter(7, 9, samples, filt)
    w, h, ch, out = png.decode_png(blob)
    assert (w, h, ch) == (7, 9, 1)
    assert out == samples


def test_decode_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError):
        png.decode_png(b"JFIF not a png")
    import struct

    # 16-bit depth header
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError):
        png.decode_png(blob)


def test_gray_8x8_known_image():
    # left half black, right half white, 32x32 → cells 0..3 dark, 4..7 light
    samples = bytes(0 if x < 16 else 255 for _ in range(32) for x in range(32))
    blob = png.encode_png(32, 32, samples, channels=1)
    cells = png.gray_8x8(blob)
    assert len(cells) == 64
    for r in range(8):
        assert all(cells[r * 8 + c] == 0 for c in range(4))
        assert all(cells[r * 8 + c] == 255 for c in range(4, 8))


def test_perceptual_hash_real_codecs_on_real_png(spark):
    # a known image through the REAL decode path: half-black/half-white →
    # aHash = bits set exactly on the light half of each row
    samples = bytes(0 if x < 16 else 255 for _ in range(32) for x in range(32))
    blob = png.encode_png(32, 32, samples, channels=1)
    expected = 0
    for i in range(multimodal.PHASH_BITS):
        if (i % 8) >= 4:  # right half of the 8-wide grid exceeds the mean
            expected |= 1 << i
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, payload binary")
    out = multimodal.perceptual_hash(df, use_real_codecs=True).collect()
    assert out[0].phash == expected


def test_decode_media_real_codecs_png_dimensions(spark):
    blob = png.encode_png(20, 10, _gradient(20, 10), channels=1)
    rgb = bytes((x * 3 + c) % 256 for x in range(6 * 4) for c in range(3))
    blob_rgb = png.encode_png(6, 4, rgb, channels=3)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(blob_rgb))], "doc_id long, payload binary"
    )
    got = {r.doc_id: (r.width, r.height, r.channels) for r in
           multimodal.decode_media(df, use_real_codecs=True).collect()}
    assert got == {1: (20, 10, 1), 2: (6, 4, 3)}


def test_image_neardup_real_codecs_finds_noisy_duplicate(spark):
    # same scene ± mild noise → small hamming; inverted scene → far
    base = bytearray(0 if x < 16 else 255 for _ in range(32) for x in range(32))
    noisy = bytearray(base)
    for i in range(0, len(noisy), 97):
        noisy[i] = min(255, noisy[i] + 30)
    inverted = bytes(255 - v for v in base)
    rows = [
        (1, bytearray(png.encode_png(32, 32, bytes(base), channels=1))),
        (2, bytearray(png.encode_png(32, 32, bytes(noisy), channels=1))),
        (3, bytearray(png.encode_png(32, 32, inverted, channels=1))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = multimodal.image_neardup_pairs(
        df, "doc_id", max_hamming=8, use_real_codecs=True
    ).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert (1, 2) in got and got[(1, 2)] <= 8
    assert (1, 3) not in got and (2, 3) not in got


# --- property tests (pure Python, no Spark) --------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _dims = st.tuples(st.integers(1, 24), st.integers(1, 24))

    @given(
        dims=_dims,
        channels=st.sampled_from([1, 3, 4]),
        data=st.data(),
    )
    @settings(max_examples=40, deadline=None)
    def test_roundtrip_property(dims, channels, data):
        w, h = dims
        n = w * h * channels
        samples = bytes(data.draw(st.binary(min_size=n, max_size=n)))
        blob = png.encode_png(w, h, samples, channels=channels)
        gw, gh, gch, out = png.decode_png(blob)
        assert (gw, gh, gch) == (w, h, channels)
        assert out == samples

    @given(dims=_dims, filt=st.integers(0, 4), data=st.data())
    @settings(max_examples=40, deadline=None)
    def test_unfilter_property(dims, filt, data):
        w, h = dims
        samples = bytes(data.draw(st.binary(min_size=w * h, max_size=w * h)))
        blob = _encode_with_filter(w, h, samples, filt)
        assert png.decode_png(blob)[3] == samples

    @given(data=st.binary(min_size=0, max_size=64))
    @settings(max_examples=40, deadline=None)
    def test_garbage_raises_cleanly(data):
        # arbitrary bytes must raise the documented ValueError (the magic
        # check front-runs everything), never an uncontrolled IndexError /
        # struct.error from deeper in the parser
        with pytest.raises(ValueError):
            png.decode_png(data)

except ImportError:  # hypothesis not installed — property tests skip
    pass


def test_zero_dimension_rejected():
    with pytest.raises(ValueError):
        png.encode_png(0, 0, b"")
    with pytest.raises(ValueError):
        png.encode_png(3, 0, b"")


def test_palette_index_out_of_range_raises():
    import struct

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    plte = bytes([10, 20, 30])  # one entry; pixel indexes 0 and 5
    raw = bytes([0, 0, 5])

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette index"):
        png.decode_png(blob)


def test_corrupt_idat_raises_valueerror_not_zlib_error():
    """A valid signature + IHDR with a garbage IDAT must keep the documented
    ValueError contract (callers catch ValueError to fall back) instead of
    leaking zlib.error (ADVICE r4)."""
    import struct

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", b"\xde\xad\xbe\xef") + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IDAT"):
        png.decode_png(blob)


def test_encode_unsupported_channels_raises_valueerror():
    """channels=2 (gray+alpha) is decodable but not encodable — the writer
    must say so with the module's ValueError convention, not a KeyError
    (ADVICE r4)."""
    with pytest.raises(ValueError, match="channels"):
        png.encode_png(1, 1, b"\x00\x00", channels=2)
