"""Default media codecs for the multimodal operators — REAL decoders
with zero third-party dependencies, plus an optional Pillow hook.

The container policy is "no pip installs", so the default image path is
a from-scratch PNG codec (stdlib zlib + struct: chunk parse, inflate,
scanline unfilter for all five filter types, nearest-neighbor resample,
re-encode) and the default audio path is stdlib `wave`. Installing the
`maggma_spark[images]` extra upgrades `decode_image`/`resize_image` to
Pillow transparently (every format PIL knows), keeping the same
injection contract: the multimodal operators take `decoder=`/`resizer=`
callables, and these are merely the defaults.

PNG support: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha)
and 6 (RGBA), interlace 0 — the shapes the PNG spec calls the common
path. Anything else raises with a pointer to the Pillow extra.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

try:  # optional extra: maggma_spark[images]
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - default in this container
    _PILImage = None


class DecodedImage:
    """Minimal decoded-image carrier: width, height, channels, and a
    flat bytearray of 8-bit samples in row-major RGBA-ish order."""

    __slots__ = ("width", "height", "channels", "pixels")

    def __init__(self, width: int, height: int, channels: int,
                 pixels: bytearray):
        self.width, self.height = width, height
        self.channels, self.pixels = channels, pixels


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> DecodedImage:
    """Parse + inflate + unfilter a non-interlaced 8-bit PNG."""
    if not payload or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or color not in _CHANNELS or interlace != 0:
                raise ValueError(
                    f"PNG depth={depth} color={color} "
                    f"interlace={interlace} is outside the stdlib "
                    "codec's common path; install maggma_spark[images]")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    expect = (stride + 1) * height
    if len(raw) < expect:
        raise ValueError("PNG IDAT truncated")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        row = bytearray(raw[row_start + 1:row_start + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y * stride:(y + 1) * stride] = row
        prev = row
    return DecodedImage(width, height, ch, out)


def encode_png(img: DecodedImage) -> bytes:
    """Re-encode a DecodedImage as a filter-0, 8-bit PNG."""
    color = {1: 0, 3: 2, 2: 4, 4: 6}[img.channels]
    stride = img.width * img.channels

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + \
            struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", img.width, img.height, 8, color,
                       0, 0, 0)
    raw = bytearray()
    for y in range(img.height):
        raw.append(0)
        raw.extend(img.pixels[y * stride:(y + 1) * stride])
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))


def resize_nearest(img: DecodedImage, width: int,
                   height: int) -> DecodedImage:
    """Nearest-neighbor resample (the classic pixel-mapping formula)."""
    ch = img.channels
    src_stride = img.width * ch
    out = bytearray(width * height * ch)
    for y in range(height):
        sy = min(img.height - 1, (y * img.height) // height)
        dst = y * width * ch
        src = sy * src_stride
        for x in range(width):
            sx = min(img.width - 1, (x * img.width) // width)
            out[dst + x * ch:dst + (x + 1) * ch] = \
                img.pixels[src + sx * ch:src + (sx + 1) * ch]
    return DecodedImage(width, height, ch, out)


def decode_image_default(payload: bytes) -> DecodedImage:
    """Default image decoder: Pillow when the [images] extra is
    installed (any PIL-supported format), stdlib PNG codec otherwise."""
    if payload is None:
        raise ValueError("null payload")
    payload = bytes(payload)
    if _PILImage is not None:
        import io

        with _PILImage.open(io.BytesIO(payload)) as im:
            im = im.convert({1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}.get(
                len(im.getbands()), "RGB"))
            ch = len(im.getbands())
            return DecodedImage(im.width, im.height, ch,
                                bytearray(im.tobytes()))
    return decode_png(payload)


def resize_image_default(payload: bytes, width: int,
                         height: int) -> bytes:
    """Default resizer: decode -> nearest-neighbor -> PNG re-encode
    (Pillow path uses its own resample + format round-trip)."""
    if _PILImage is not None:
        import io

        with _PILImage.open(io.BytesIO(bytes(payload))) as im:
            buf = io.BytesIO()
            im.resize((width, height)).save(buf, format="PNG")
            return buf.getvalue()
    return encode_png(resize_nearest(decode_png(bytes(payload)),
                                     width, height))


def image_features(payload: bytes) -> list[float]:
    """Real 8-dim image feature vector from the default decoder:
    [width, height, channels, global mean/255, global std/255,
    first-channel mean/255, last-channel mean/255, row-energy] —
    deterministic and codec-backed, suitable as the default
    `decoder=` for feature_extract."""
    img = decode_image_default(payload)
    n = len(img.pixels)
    if n == 0:
        raise ValueError("empty image")
    total = sum(img.pixels)
    mean = total / n
    var = sum((b - mean) ** 2 for b in img.pixels) / n
    ch = img.channels
    first = img.pixels[0::ch]
    last = img.pixels[ch - 1::ch]
    stride = img.width * ch
    row_means = [sum(img.pixels[y * stride:(y + 1) * stride])
                 / max(1, stride) for y in range(img.height)]
    row_energy = (sum(abs(a - b) for a, b in zip(row_means,
                                                 row_means[1:]))
                  / max(1, len(row_means) - 1)) / 255.0
    return [float(img.width), float(img.height), float(ch),
            mean / 255.0, (var ** 0.5) / 255.0,
            (sum(first) / len(first)) / 255.0,
            (sum(last) / len(last)) / 255.0, row_energy]


def decode_wav(payload: bytes):
    """Stdlib `wave` decode: (framerate, channels, list of int
    samples). 8/16/32-bit PCM."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(payload))) as wf:
        rate, ch, sw = wf.getframerate(), wf.getnchannels(), \
            wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if sw == 1:
        samples = [b - 128 for b in frames]
    elif sw == 2:
        samples = list(struct.unpack(f"<{len(frames) // 2}h", frames))
    elif sw == 4:
        samples = list(struct.unpack(f"<{len(frames) // 4}i", frames))
    else:
        raise ValueError(f"WAV sample width {sw} unsupported")
    return rate, ch, samples


def audio_features(payload: bytes) -> list[float]:
    """Real 8-dim audio feature vector via the stdlib WAV decoder:
    [duration_s, framerate/1e5, channels, mean, rms, min, max,
    zero-crossing rate], amplitudes normalized to [-1, 1]."""
    rate, ch, samples = decode_wav(payload)
    if not samples:
        raise ValueError("empty audio")
    scale = float(max(1, max(abs(s) for s in samples)))
    norm = [s / scale for s in samples]
    n = len(norm)
    mean = sum(norm) / n
    rms = (sum(s * s for s in norm) / n) ** 0.5
    zc = sum(1 for a, b in zip(norm, norm[1:]) if (a < 0) != (b < 0))
    return [n / (rate * ch), rate / 1e5, float(ch), mean, rms,
            min(norm), max(norm), zc / max(1, n - 1)]


def make_test_png(width: int, height: int, channels: int = 3,
                  seed: int = 0) -> bytes:
    """Deterministic PNG fixture (gradient + seed-hash texture)."""
    px = bytearray(width * height * channels)
    i = 0
    for y in range(height):
        for x in range(width):
            for c in range(channels):
                px[i] = (x * 7 + y * 13 + c * 29 + seed * 31) & 0xFF
                i += 1
    return encode_png(DecodedImage(width, height, channels, px))


def make_test_wav(n_frames: int = 800, rate: int = 8000,
                  freq: float = 440.0) -> bytes:
    """Deterministic 16-bit mono sine WAV fixture."""
    import io
    import math
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"".join(
            struct.pack("<h", int(20000 * math.sin(
                2 * math.pi * freq * i / rate)))
            for i in range(n_frames)))
    return buf.getvalue()


def grayscale(img: DecodedImage) -> DecodedImage:
    """ITU-R BT.601 luma (integer weights) — single-channel output;
    alpha channels are ignored."""
    ch = img.channels
    if ch == 1:
        return img
    px = img.pixels
    out = bytearray(img.width * img.height)
    use = min(ch, 3)
    for i in range(img.width * img.height):
        base = i * ch
        if use == 2:  # gray + alpha
            out[i] = px[base]
        else:
            out[i] = (299 * px[base] + 587 * px[base + 1]
                      + 114 * px[base + 2]) // 1000
    return DecodedImage(img.width, img.height, 1, out)


def dhash64(payload: bytes, hash_size: int = 8) -> int:
    """Perceptual difference hash (dHash, the classic public
    algorithm): decode -> grayscale -> resample to
    (hash_size+1) x hash_size -> one bit per horizontal gradient
    (left pixel < right pixel). 64 bits at the default size; visually
    near-identical images land within a few bits, so Hamming banding
    (operators/dedup.py::hamming_band_pairs) finds near-duplicates
    without an all-pairs comparison. Returned as a SIGNED 64-bit int
    so it stores in a Spark `bigint`."""
    img = grayscale(decode_image_default(payload))
    small = resize_nearest(img, hash_size + 1, hash_size)
    bits = 0
    i = 0
    for y in range(hash_size):
        row = y * (hash_size + 1)
        for x in range(hash_size):
            if small.pixels[row + x] < small.pixels[row + x + 1]:
                bits |= 1 << i
            i += 1
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def audio_fingerprint64(payload: bytes, segments: int = 64) -> int:
    """Perceptual audio fingerprint (the dHash idea on the energy
    envelope): decode -> mean |amplitude| over segments+1 equal time
    slices -> one bit per envelope gradient (left < right). The sign
    of the gradient is invariant to overall gain, so re-scaled copies
    fingerprint identically; near-identical audio lands within a few
    bits and Hamming banding finds it without an all-pairs join.
    Returned as a SIGNED 64-bit int (Spark `bigint`)."""
    _rate, _ch, samples = decode_wav(payload)
    n = len(samples)
    if n < segments + 1:
        raise ValueError(
            f"audio too short for {segments + 1} envelope segments")
    env = []
    for i in range(segments + 1):
        lo = (i * n) // (segments + 1)
        hi = ((i + 1) * n) // (segments + 1)
        seg = samples[lo:hi]
        env.append(sum(abs(s) for s in seg) / max(1, len(seg)))
    bits = 0
    for i in range(segments):
        if env[i] < env[i + 1]:
            bits |= 1 << i
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits
