"""Real default media codecs (operators/codecs.py): a from-scratch
stdlib PNG codec + stdlib WAV decode, wired as the multimodal
operators' default `decoder=`/`resizer=`. These run the ACTUAL byte
formats — not the deterministic fakes — so the decode contract is
covered even without the optional Pillow extra."""

from __future__ import annotations

import math

import pytest

from maggma_spark.operators.codecs import (
    DecodedImage,
    audio_features,
    decode_png,
    decode_wav,
    encode_png,
    image_features,
    make_test_png,
    make_test_wav,
    resize_nearest,
)


def test_png_roundtrip_all_color_types():
    for ch in (1, 2, 3, 4):
        payload = make_test_png(13, 7, channels=ch, seed=ch)
        img = decode_png(payload)
        assert (img.width, img.height, img.channels) == (13, 7, ch)
        # pixel-exact round-trip through the encoder
        again = decode_png(encode_png(img))
        assert bytes(again.pixels) == bytes(img.pixels)


def test_png_filters_decode():
    """Exercise filter reconstruction: zlib level-9 output of a
    gradient re-encoded with explicit per-row filters decodes back to
    the same pixels."""
    import struct
    import zlib

    base = decode_png(make_test_png(16, 8, channels=3, seed=1))
    stride = base.width * 3
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(base.height):
        row = base.pixels[y * stride:(y + 1) * stride]
        ftype = y % 5  # cycle through None/Sub/Up/Average/Paeth
        enc = bytearray(row)
        if ftype == 1:
            for i in range(stride - 1, 2, -1):
                enc[i] = (row[i] - row[i - 3]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                enc[i] = (row[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                left = row[i - 3] if i >= 3 else 0
                enc[i] = (row[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            from maggma_spark.operators.codecs import _paeth

            for i in range(stride):
                left = row[i - 3] if i >= 3 else 0
                ul = prev[i - 3] if i >= 3 else 0
                enc[i] = (row[i] - _paeth(left, prev[i], ul)) & 0xFF
        raw.append(ftype)
        raw.extend(enc)
        prev = row

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + \
            struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", base.width, base.height, 8, 2, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    got = decode_png(payload)
    assert bytes(got.pixels) == bytes(base.pixels)


def test_png_rejects_garbage_and_exotic():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")
    # 16-bit depth -> points at the Pillow extra
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    crc = zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    payload = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr))
               + b"IHDR" + ihdr + struct.pack(">I", crc))
    with pytest.raises(ValueError, match="images"):
        decode_png(payload)


def test_resize_nearest_shape_and_content():
    img = decode_png(make_test_png(12, 12, channels=3))
    small = resize_nearest(img, 4, 4)
    assert (small.width, small.height) == (4, 4)
    assert len(small.pixels) == 4 * 4 * 3
    # nearest-neighbor maps (0,0) to the original corner pixel
    assert bytes(small.pixels[:3]) == bytes(img.pixels[:3])
    big = resize_nearest(small, 8, 8)
    assert len(big.pixels) == 8 * 8 * 3


def test_wav_decode_and_features():
    payload = make_test_wav(n_frames=800, rate=8000, freq=440.0)
    rate, ch, samples = decode_wav(payload)
    assert (rate, ch, len(samples)) == (8000, 1, 800)
    feats = audio_features(payload)
    assert len(feats) == 8
    assert math.isclose(feats[0], 0.1, rel_tol=1e-6)  # 800/8000 s
    assert abs(feats[3]) < 0.01          # sine mean ~ 0
    assert 0.6 < feats[4] < 0.8          # sine rms ~ 1/sqrt(2)
    # zero-crossing rate of a 440 Hz tone at 8 kHz ~ 2*440/8000
    assert 0.09 < feats[7] < 0.13


def test_image_features_shape_and_determinism():
    p = make_test_png(20, 10, channels=3, seed=7)
    a, b = image_features(p), image_features(p)
    assert a == b and len(a) == 8
    assert a[:3] == [20.0, 10.0, 3.0]
    assert 0.0 <= a[3] <= 1.0


def test_feature_extract_runs_real_codec_on_spark(spark):
    """The multimodal operator end-to-end with the REAL default
    decoder: PNG payloads through Arrow-batched mapInPandas, corrupt
    payload captured per-row, never failing the job."""
    from maggma_spark.operators.multimodal import feature_extract

    rows = [(f"img{i}", bytearray(make_test_png(8 + i, 6, channels=3,
                                                seed=i)))
            for i in range(4)]
    rows.append(("bad", bytearray(b"not a png at all")))
    df = spark.createDataFrame(rows, "path string, content binary")
    out = {r["key"]: r for r in
           feature_extract(df, decoder=None).collect()}
    assert len(out) == 5
    for i in range(4):
        r = out[f"img{i}"]
        assert r["error"] is None and r["feat_dim"] == 8
        assert r["feature"][0] == float(8 + i)  # real decoded width
    assert out["bad"]["error"] is not None
    assert out["bad"]["feature"] is None


def test_resize_images_real_codec_on_spark(spark):
    from maggma_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [("a", bytearray(make_test_png(10, 10, channels=4)))],
        "path string, content binary")
    r = resize_images(df, 5, 4).first()
    assert r["error"] is None and (r["width"], r["height"]) == (5, 4)
    round_trip = decode_png(bytes(r["content"]))
    assert (round_trip.width, round_trip.height,
            round_trip.channels) == (5, 4, 4)


def test_dhash_and_image_neardup(spark):
    """Perceptual dHash: exact copies hash identically; a lightly
    perturbed copy stays within a few bits; distinct noise textures
    are far apart; the banded join surfaces planted pairs and the
    recall guarantee check raises when max_hamming >= chunks."""
    import hashlib

    import pytest as _pt

    from maggma_spark.operators.codecs import (
        DecodedImage,
        dhash64,
        encode_png,
    )
    from maggma_spark.operators.multimodal import (
        image_neardup_candidates,
    )

    def noise(seed, w=16, h=16, flip=None):
        need = w * h * 3
        out = bytearray()
        b = 0
        while len(out) < need:
            out += hashlib.md5(f"{seed}:{b}".encode()).digest()
            b += 1
        px = out[:need]
        if flip is not None:
            px[flip] = px[flip] ^ 0xFF
        return encode_png(DecodedImage(w, h, 3, px))

    a, a2 = noise(1), noise(1)
    assert dhash64(a) == dhash64(a2)
    # a single flipped byte moves few gradient bits
    near = noise(1, flip=40)
    d = bin((dhash64(a) ^ dhash64(near)) & ((1 << 64) - 1)).count("1")
    assert d <= 6
    far = noise(2)
    dfar = bin((dhash64(a) ^ dhash64(far)) & ((1 << 64) - 1)).count("1")
    assert dfar > 10

    rows = [(i, bytearray(noise(i))) for i in range(20)]
    rows.append((100, bytearray(noise(3))))          # exact copy of 3
    rows.append((101, bytearray(noise(5, flip=40))))  # near copy of 5
    df = spark.createDataFrame(rows, "key bigint, payload binary")
    pairs = {(r["key_a"], r["key_b"]): r["hamming"]
             for r in image_neardup_candidates(
                 df, "payload", "key", max_hamming=6,
                 chunks=8).collect()}
    assert pairs[(3, 100)] == 0
    assert (5, 101) in pairs and pairs[(5, 101)] <= 6

    with _pt.raises(ValueError, match="max_hamming < chunks"):
        image_neardup_candidates(df, "payload", "key",
                                 max_hamming=8, chunks=8)


def test_audio_fingerprint_and_neardup(spark):
    """Envelope-gradient audio fingerprint: gain-invariant (re-scaled
    copies hash identically), distinct noise clips far apart; the
    banded join surfaces planted pairs."""
    import hashlib
    import io
    import struct
    import wave

    from maggma_spark.operators.codecs import audio_fingerprint64
    from maggma_spark.operators.multimodal import (
        audio_neardup_candidates,
    )

    def noise_wav(seed, n=2000):
        out = bytearray()
        b = 0
        while len(out) < n * 2:
            out += hashlib.md5(f"wav{seed}:{b}".encode()).digest()
            b += 1
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(bytes(out[:n * 2]))
        return buf.getvalue()

    def scaled(payload, div):
        with wave.open(io.BytesIO(payload)) as wf:
            params = wf.getparams()
            frames = wf.readframes(wf.getnframes())
        samples = struct.unpack(f"<{len(frames) // 2}h", frames)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as out:
            out.setparams(params)
            out.writeframes(b"".join(struct.pack("<h", s // div)
                                     for s in samples))
        return buf.getvalue()

    a = noise_wav(1)
    assert audio_fingerprint64(a) == audio_fingerprint64(scaled(a, 2))
    d = bin((audio_fingerprint64(a) ^ audio_fingerprint64(noise_wav(2)))
            & ((1 << 64) - 1)).count("1")
    assert d > 10

    rows = [(i, bytearray(noise_wav(i))) for i in range(12)]
    rows.append((100, bytearray(scaled(noise_wav(4), 3))))
    df = spark.createDataFrame(rows, "key bigint, payload binary")
    pairs = {(r["key_a"], r["key_b"]): r["hamming"]
             for r in audio_neardup_candidates(
                 df, "payload", "key", max_hamming=2,
                 chunks=8).collect()}
    assert pairs.get((4, 100)) == 0
