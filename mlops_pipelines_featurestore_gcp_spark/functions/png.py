"""Minimal pure-stdlib PNG codec (zlib + struct): real pixels in-sandbox.

The container ships no image codec library, but PNG's baseline format is
fully decodable with the stdlib: zlib inflate + the five scanline filters.
This module gives the multimodal operators an actual decode path — width,
height, channels, and SAMPLES — so the perceptual-hash dedup evidence runs
on real pixels rather than digest-derived stand-ins, while PIL (when
present) remains the preferred route for every other format.

Supported: 8-bit samples, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced, any number of IDAT chunks.
That covers what `encode_png` (the test-fixture writer) and typical
screenshot/diagram corpora emit. 16-bit, interlace, and sub-8-bit depths
raise ``ValueError`` — callers fall back to the stub decoder explicitly.

This runs INSIDE Arrow-batched Pandas UDFs: per-payload Python cost is the
same order as the hashlib stubs it replaces, and nothing here touches the
driver.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"

# samples per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(blob: bytes) -> bool:
    return blob[:8] == _MAGIC


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(blob: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, samples) — samples row-major, 8-bit.

    Palette images are expanded to RGB (channels=3). Raises ``ValueError``
    on non-PNG input or unsupported variants (16-bit, interlaced).
    """
    if not is_png(blob):
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    plte = b""
    while pos + 8 <= len(blob):
        (length,), ctype = struct.unpack(">I", blob[pos : pos + 4]), blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc (crc not verified)
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")
    if width < 1 or height < 1:
        raise ValueError(f"invalid dimensions {width}x{height} (PNG requires >= 1)")
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth} (8-bit only)")
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    ch = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # keep the documented bad-input contract: callers catch ValueError
        raise ValueError(f"bad IDAT deflate stream: {e}") from e
    stride = width * ch
    expected = (stride + 1) * height
    if len(raw) < expected:
        raise ValueError("truncated IDAT stream")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        filt = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if filt == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif filt == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif filt != 0:
            raise ValueError(f"bad filter byte {filt}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    if color_type == 3:  # palette → RGB
        if not plte:
            raise ValueError("palette image without PLTE")
        n_entries = len(plte) // 3
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(out):
            if idx >= n_entries:
                # a short slice here would silently SHRINK the buffer and
                # corrupt every later pixel — bad input must raise
                raise ValueError(f"palette index {idx} >= PLTE size {n_entries}")
            rgb[3 * i : 3 * i + 3] = plte[3 * idx : 3 * idx + 3]
        return width, height, 3, bytes(rgb)
    return width, height, ch, bytes(out)


def encode_png(width: int, height: int, samples: bytes, *, channels: int = 1) -> bytes:
    """Baseline PNG writer (filter 0, one IDAT) — test fixtures and the
    media sink. ``samples`` is row-major 8-bit, gray (1), RGB (3) or
    RGBA (4)."""
    if channels not in (1, 3, 4):
        raise ValueError(f"unsupported channels {channels} (supported: 1, 3, 4)")
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    if width < 1 or height < 1:
        raise ValueError(f"invalid dimensions {width}x{height} (PNG requires >= 1)")
    stride = width * channels
    if len(samples) != stride * height:
        raise ValueError(f"need {stride * height} samples, got {len(samples)}")
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += samples[y * stride : (y + 1) * stride]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def luma(samples: bytes, channels: int) -> bytes:
    """8-bit grayscale via integer ITU-R 601 weights (alpha ignored)."""
    if channels == 1:
        return samples
    if channels == 2:  # gray + alpha
        return samples[::2]
    out = bytearray(len(samples) // channels)
    for i in range(len(out)):
        o = i * channels
        out[i] = (299 * samples[o] + 587 * samples[o + 1] + 114 * samples[o + 2]) // 1000
    return bytes(out)


def gray_8x8(blob: bytes) -> list[int]:
    """PNG → 8×8 box-averaged grayscale grid (the aHash input).

    Each output cell averages its pixel bin (index-range binning handles
    dimensions that aren't multiples of 8); matches what
    ``PIL.convert("L").resize((8, 8))`` computes up to rounding.
    """
    width, height, ch, samples = decode_png(blob)
    g = luma(samples, ch)
    cells = []
    for gy in range(8):
        y0, y1 = gy * height // 8, max((gy + 1) * height // 8, gy * height // 8 + 1)
        for gx in range(8):
            x0, x1 = gx * width // 8, max((gx + 1) * width // 8, gx * width // 8 + 1)
            acc = n = 0
            for y in range(min(y0, height - 1), min(y1, height)):
                row = y * width
                for x in range(min(x0, width - 1), min(x1, width)):
                    acc += g[row + x]
                    n += 1
            cells.append(acc // max(n, 1))
    return cells


def box_resize(
    width: int, height: int, channels: int, samples: bytes, out_w: int, out_h: int
) -> bytes:
    """Box-average resample to (out_w, out_h), any channel count — the
    :func:`gray_8x8` index-range binning generalized (each output pixel
    averages its input bin per channel; bins never empty because the
    range is clamped to at least one source pixel). Returns row-major
    8-bit samples with the INPUT's channel count."""
    if out_w < 1 or out_h < 1:
        raise ValueError(f"invalid target {out_w}x{out_h} (requires >= 1)")
    out = bytearray(out_w * out_h * channels)
    for gy in range(out_h):
        y0 = gy * height // out_h
        y1 = max((gy + 1) * height // out_h, y0 + 1)
        for gx in range(out_w):
            x0 = gx * width // out_w
            x1 = max((gx + 1) * width // out_w, x0 + 1)
            accs = [0] * channels
            n = 0
            for y in range(min(y0, height - 1), min(y1, height)):
                row = y * width * channels
                for x in range(min(x0, width - 1), min(x1, width)):
                    base = row + x * channels
                    for c in range(channels):
                        accs[c] += samples[base + c]
                    n += 1
            obase = (gy * out_w + gx) * channels
            for c in range(channels):
                out[obase + c] = accs[c] // max(n, 1)
    return bytes(out)
