"""Stdlib PNG codec: spec-subset decode (all five filter types, four
color types) verified against hand-built streams, our encoder, Pillow
(where installed), and end-to-end through the multimodal operator."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from databricks_end_to_end_streaming_spark.operators.multimodal import (
    decode_stub,
)
from databricks_end_to_end_streaming_spark.operators.png_stdlib import (
    decode_png,
    encode_png,
)


def _png_from_raw(w, h, color_type, raw_scanlines: bytes) -> bytes:
    """Assemble a PNG from pre-filtered scanline bytes (tests pick the
    filter bytes themselves to hit every filter path)."""

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw_scanlines))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_all_color_types(channels):
    rng = np.random.default_rng(channels)
    arr = rng.integers(0, 256, size=(5, 7, channels), dtype=np.uint8)
    got = decode_png(encode_png(arr))
    assert got.shape == arr.shape
    assert (got == arr).all()


def test_filter_sub_up_average_paeth():
    """Craft one image per filter type and check against a reference
    unfilter done with plain ints."""
    w, h, ch = 4, 3, 3
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)

    def filt(ftype):
        raw = bytearray()
        flat = img.reshape(h, w * ch).astype(int)
        prev = [0] * (w * ch)
        for y in range(h):
            raw.append(ftype)
            for x in range(w * ch):
                a = flat[y][x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                raw.append((flat[y][x] - pred) % 256)
            prev = list(flat[y])
        return bytes(raw)

    for ftype in (1, 2, 3, 4):
        data = _png_from_raw(w, h, 2, filt(ftype))
        got = decode_png(data)
        assert (got == img).all(), f"filter {ftype}"


def test_unsupported_variants_raise():
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    ok = bytearray(encode_png(arr))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOPE" + bytes(ok[4:]))
    # 16-bit depth: patch IHDR bit-depth byte (offset 8+8+8+8=24 -> IHDR
    # body starts at 16; bit depth is body[8], i.e. abs offset 24)
    bad_depth = bytearray(ok)
    bad_depth[24] = 16
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(bytes(bad_depth))
    bad_ct = bytearray(ok)
    bad_ct[25] = 3  # palette
    with pytest.raises(NotImplementedError, match="color types"):
        decode_png(bytes(bad_ct))
    bad_il = bytearray(ok)
    bad_il[28] = 1  # Adam7
    with pytest.raises(NotImplementedError, match="non-interlaced"):
        decode_png(bytes(bad_il))


def test_multidat_chunks_concatenate():
    """IDAT may be split arbitrarily; the zlib stream spans chunks."""
    arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    data = encode_png(arr)
    # split the single IDAT into two chunks
    sig, rest = data[:8], data[8:]
    (ilen,) = struct.unpack(">I", rest[0:4])
    ihdr = rest[: 12 + ilen]
    rest2 = rest[12 + ilen :]
    (dlen,) = struct.unpack(">I", rest2[0:4])
    body = rest2[8 : 8 + dlen]
    iend = rest2[12 + dlen :]

    def chunk(ctype, b):
        return (
            struct.pack(">I", len(b))
            + ctype
            + b
            + struct.pack(">I", zlib.crc32(ctype + b) & 0xFFFFFFFF)
        )

    half = len(body) // 2
    split = sig + ihdr + chunk(b"IDAT", body[:half]) + chunk(b"IDAT", body[half:]) + iend
    assert (decode_png(split) == arr).all()


def test_matches_pillow_when_available():
    """Cross-check vs Pillow (skipped in this container)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    buf = io.BytesIO()
    PIL_Image.fromarray(arr, "RGB").save(buf, format="PNG")
    assert (decode_png(buf.getvalue()) == arr).all()
    # and Pillow reads our encoder's output
    back = np.asarray(PIL_Image.open(io.BytesIO(encode_png(arr))))
    assert (back == arr).all()


def test_real_png_through_decode_stub_and_feature_stats(spark):
    """A real PNG payload through the multimodal path in-container:
    decode_stub routes png -> stdlib decoder when Pillow is absent, and
    the Arrow-batched feature-stats operator consumes it."""
    from databricks_end_to_end_streaming_spark.operators.multimodal import (
        image_feature_stats,
    )

    arr = np.tile(
        np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)[:, :, None],
        (1, 1, 3),
    )
    payload = encode_png(arr)
    got = decode_stub(payload, {"format": "png"})
    assert got.shape == (2, 3, 3)
    assert (got == arr).all()

    media = spark.createDataFrame(
        [
            (
                7,
                "image",
                bytearray(payload),
                {"width": 3, "height": 2, "channels": 3, "format": "png"},
            )
        ],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int, height:int, channels:int, format:string>",
    )
    row = image_feature_stats(media).collect()[0]
    assert row["media_id"] == 7
    assert row["min_intensity"] == 10
    assert row["max_intensity"] == 60
    assert row["mean_intensity"] == pytest.approx(35.0)


def test_hypothesis_roundtrip_random_images():
    """Property sweep: arbitrary sizes/channels/content round-trip
    through encode -> decode bit-exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        ch=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(w, h, ch, seed):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        got = decode_png(encode_png(arr))
        assert got.shape == arr.shape and (got == arr).all()

    roundtrip()
