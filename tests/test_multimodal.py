"""Multimodal decode tests: REAL pure-stdlib decoders (PPM/PGM/WAV) through
the Arrow mapInPandas plumbing, plus the honest PIL gate."""

from __future__ import annotations

import struct

import pytest

from flink_1_6_0_spark.pipeline import multimodal as mm


def _ppm(w, h, pixels, magic=b"P6", maxval=255):
    return magic + b"\n# a comment\n" + f"{w} {h}\n{maxval}\n".encode() + bytes(pixels)


def _wav(samples, channels=1, rate=8000, bits=16):
    import array

    pcm = array.array("h", samples).tobytes()
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_ppm_and_pgm_kernels():
    # 2x1 RGB: red pixel + blue pixel -> mean r=127.5, g=0, b=127.5
    img = _ppm(2, 1, [255, 0, 0, 0, 0, 255])
    d = mm.decode_ppm(img)
    assert (d["width"], d["height"], d["channels"]) == (2, 1, 3)
    assert (d["mean_c0"], d["mean_c1"], d["mean_c2"]) == (127.5, 0.0, 127.5)
    g = mm.decode_ppm(_ppm(2, 2, [0, 100, 200, 56], magic=b"P5"))
    assert (g["width"], g["height"], g["channels"], g["mean_c0"]) == (2, 2, 1, 89.0)
    with pytest.raises(ValueError):
        mm.decode_ppm(b"P3\n1 1\n255\n0 0 0")  # ASCII netpbm: not supported


def test_decode_wav_kernel():
    d = mm.decode_wav(_wav([100, -100, 300, -300], rate=16000))
    assert d["sample_rate"] == 16000 and d["n_samples"] == 4 and d["channels"] == 1
    assert d["mean_c0"] == 200.0
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFXjunk")


def test_decode_media_distributed(spark):
    """The production path: binary column + format metadata → mapInPandas
    dispatch → one decoded row per object, image and audio in one frame."""
    import pyspark.sql.functions as F

    rows = [
        (1, bytearray(_ppm(2, 1, [255, 0, 0, 0, 0, 255])), "ppm"),
        (2, bytearray(_wav([100, -100, 300, -300])), "wav"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary, fmt string").select(
        "doc_id", "media",
        F.struct(F.col("fmt").alias("format"), F.length("media").alias("n_bytes")).alias("meta"),
    )
    got = {r["doc_id"]: r for r in mm.decode_media(df).collect()}
    assert got[1]["kind"] == "image" and got[1]["width"] == 2 and got[1]["mean_c2"] == 127.5
    assert got[2]["kind"] == "audio" and got[2]["n_samples"] == 4 and got[2]["mean_c0"] == 200.0

    bad = spark.createDataFrame([(3, bytearray(b"\xff\xd8jpeg"), "jpeg")], "doc_id long, media binary, fmt string").select(
        "doc_id", "media",
        F.struct(F.col("fmt").alias("format"), F.length("media").alias("n_bytes")).alias("meta"),
    )
    with pytest.raises(Exception, match="external decoder"):
        mm.decode_media(bad).collect()


def test_decode_image_real_gate():
    with pytest.raises(NotImplementedError, match="pillow"):
        mm.decode_image_real(None)


def test_ahash_pgm_p5_p6_and_empty():
    """ahash bit semantics: strictly-above-mean, MSB-first; P6 reduces to
    per-pixel channel sums; zero-pixel images hash to None."""
    from flink_1_6_0_spark.pipeline.multimodal import ahash_pgm

    # P5 3x1, pixels 10,20,30: mean=20 -> bits (10>20)=0,(20>20)=0,(30>20)=1 -> 0b001
    assert ahash_pgm(b"P5\n3 1\n255\n" + bytes([10, 20, 30])) == 0b001
    # P6 2x1, pixel sums (3, 300): mean=151.5 -> bits 0,1 -> 0b01
    assert ahash_pgm(b"P6\n2 1\n255\n" + bytes([1, 1, 1, 100, 100, 100])) == 0b01
    # zero pixels -> None, not an exception
    assert ahash_pgm(b"P5\n0 1\n255\n") is None
    # n_bits truncation: 4 pixels, keep the first 2 bits only
    assert ahash_pgm(b"P5\n4 1\n255\n" + bytes([9, 1, 1, 1]), n_bits=2) == 0b10


def test_ahash_bit63_arrow_safe(spark):
    """A >=64px image whose first pixel is above the mean sets bit 63: the
    hash must arrive as a SIGNED long through Arrow (two's-complement
    reinterpretation), not crash the conversion."""
    from flink_1_6_0_spark.pipeline.multimodal import ahash_pgm, media_ahash

    px = bytes([255] + [0] * 63)  # pixel 0 far above mean -> bit 63 set
    img = b"P5\n64 1\n255\n" + px
    h = ahash_pgm(img)
    assert h < 0  # wrapped
    assert (h + (1 << 64)) >> 63 == 1
    df = spark.createDataFrame([(1, bytearray(img))], "doc_id long, media binary")
    got = media_ahash(df).collect()
    assert got[0]["ahash"] == h  # end-to-end through Arrow


def test_netpbm_16bit_rejected():
    import pytest

    from flink_1_6_0_spark.pipeline.multimodal import ahash_pgm, decode_ppm

    img16 = b"P5\n2 1\n65535\n" + bytes(4)
    with pytest.raises(ValueError, match="16-bit"):
        decode_ppm(img16)
    with pytest.raises(ValueError, match="16-bit"):
        ahash_pgm(img16)


def test_minhash_bands_validated(spark):
    import pytest

    from flink_1_6_0_spark.pipeline.dedup import minhash_lsh_pairs

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(df, "doc_id", "text", num_hashes=16, bands=32)
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(df, "doc_id", "text", num_hashes=16, bands=5)


def test_frame_sample_zero_byte_media_no_phantom(spark):
    """Zero-byte media emits NO frames (review finding: the sequence clamp
    fabricated a frame_offset=0 row)."""
    from flink_1_6_0_spark.pipeline import multimodal as mm

    docs = spark.createDataFrame([(1, ""), (2, "abcdef" * 30)], "doc_id long, text string")
    out = mm.frame_sample(mm.attach_binary(docs, "doc_id", "text")).collect()
    ids = {r["doc_id"] for r in out}
    assert 1 not in ids and 2 in ids


def test_media_ahash_isolates_corrupt_blobs(spark):
    """One corrupt / non-netpbm blob yields a NULL hash for that row, never
    a job-wide PythonException (review finding)."""
    import pyspark.sql.functions as F

    from flink_1_6_0_spark.pipeline import multimodal as mm

    df = spark.createDataFrame(
        [(1, bytearray(b"not an image")), (2, bytearray(b""))],
        "doc_id long, media binary",
    )
    rows = {r["doc_id"]: r["ahash"] for r in mm.media_ahash(df).collect()}
    assert rows == {1: None, 2: None}


def test_resize_box_pgm_and_ppm():
    """resize_box: exact integer box means, P5 and P6, floor dims for
    non-divisible edges (the 5th column / 3rd row are dropped at 2x2)."""
    from flink_1_6_0_spark.pipeline.multimodal import _netpbm_header, resize_box

    # P5 5x3 grayscale, rows 10..14 / 20..24 / 30..34
    px = bytes(list(range(10, 15)) + list(range(20, 25)) + list(range(30, 35)))
    pgm = b"P5\n5 3\n255\n" + px
    out = resize_box(pgm, 2, 2)
    magic, w, h, maxval, ch, body = _netpbm_header(out)
    assert (magic, w, h, ch) == (b"P5", 2, 1, 1)
    # boxes: {10,11,20,21}->15, {12,13,22,23}->17
    assert list(out[body:]) == [15, 17]

    # P6 2x2 RGB: channel-wise box means
    rgb = bytes([0, 100, 200, 4, 104, 204, 8, 108, 208, 12, 112, 212])
    ppm = b"P6\n2 2\n255\n" + rgb
    out2 = resize_box(ppm, 2, 2)
    magic2, w2, h2, _, ch2, body2 = _netpbm_header(out2)
    assert (magic2, w2, h2, ch2) == (b"P6", 1, 1, 3)
    assert list(out2[body2:]) == [6, 106, 206]


def test_resize_media_plumbing(spark):
    """resize_media keeps the opaque-binary + typed-metadata contract and
    the resized image round-trips through the real decoder."""
    import pyspark.sql.functions as F
    from flink_1_6_0_spark.pipeline.multimodal import decode_media, resize_media

    px = bytes(range(16))  # 4x4 ramp
    src = spark.createDataFrame([(1, b"P5\n4 4\n255\n" + px)], "doc_id long, media binary").select(
        "doc_id", "media",
        F.struct(F.lit("pgm").alias("format"), F.length("media").alias("n_bytes")).alias("meta"),
    )
    resized = resize_media(src, 2, 2)
    row = resized.collect()[0]
    assert (row["width"], row["height"]) == (2, 2)
    dec = decode_media(resized).collect()[0]
    # boxes: {0,1,4,5}->2, {2,3,6,7}->4, {8,9,12,13}->10, {10,11,14,15}->12
    assert (dec["width"], dec["height"]) == (2, 2)
    assert dec["mean_c0"] == (2 + 4 + 10 + 12) / 4
