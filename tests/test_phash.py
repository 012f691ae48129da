"""Perceptual-hash visual dedup: codecs.phash64 invariances,
dedup.hamming_pairs banding over arbitrary 64-bit hashes, and the
phash_images -> hamming_pairs -> dedup_clusters pipeline."""

from __future__ import annotations

import numpy as np

from kafka_streams_plumber_spark.operators.codecs import encode_png, phash64
from kafka_streams_plumber_spark.operators.dedup import hamming_pairs
from kafka_streams_plumber_spark.operators.multimodal import phash_images


def _gradient(h, w, tilt=1.0):
    # values stay <= 179 so the +40 brightness shift below never clips
    # (saturation would break the DC-only-shift invariance being tested)
    y = np.arange(h)[:, None]
    x = np.arange(w)[None, :]
    g = (x * 3 + tilt * y * 5) % 180
    return np.dstack([g, g, g]).astype(np.uint8)


def _hamming(a, b):
    return bin(a ^ b).count("1")


def test_phash_brightness_invariant():
    img = _gradient(64, 64)
    brighter = np.clip(img.astype(int) + 40, 0, 255).astype(np.uint8)
    # +c shifts only the DC coefficient, which the hash excludes
    assert phash64(img) == phash64(brighter)


def test_phash_rescale_tolerant_and_discriminative():
    img = _gradient(64, 64)
    up = img.repeat(2, axis=0).repeat(2, axis=1)  # 128x128 upscale
    assert _hamming(phash64(img), phash64(up)) <= 6
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, size=(64, 64, 3)).astype(np.uint8)
    assert _hamming(phash64(img), phash64(noise)) > 12


def test_phash_grayscale_2d_input():
    img = _gradient(32, 48)
    assert phash64(img[:, :, 0]) == phash64(img)


def test_hamming_pairs_banded(spark):
    rows = [
        (1, 0b1111000011110000),
        (2, 0b1111000011110001),  # hamming 1 from id 1
        (3, 0b1111000011110000 ^ (0b1 << 40)),  # hamming 1 from id 1
        (4, (1 << 62) - 12345),  # far from everything
    ]
    df = spark.createDataFrame(rows, "id long, h long")
    pairs = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in hamming_pairs(df, "id", "h", max_hamming=4).collect()
    }
    assert pairs[(1, 2)] == 1 and pairs[(1, 3)] == 1 and pairs[(2, 3)] == 2
    assert not any(4 in p for p in pairs)


def test_hamming_pairs_guaranteed_recall_regime(spark):
    """Pigeonhole contract, pinned adversarially: with the default
    derived banding (max_hamming=7 -> 8 bands of 8 bits), a pair at
    hamming exactly bands-1 = 7 is ALWAYS found, while a pair at
    hamming = bands = 8 constructed to flip one bit in EVERY band
    shares no band and is only reachable via the explicit
    allow_probabilistic opt-in (where it is legitimately missed)."""
    h0 = 0
    # 7 flipped bits in 7 distinct bands -> one band (the last) agrees
    h7 = 0
    for band in range(7):
        h7 ^= 1 << (band * 8)
    # 8 flipped bits, one per band -> NO band agrees with h0
    h8 = 0
    for band in range(8):
        h8 ^= 1 << (band * 8)
    df = spark.createDataFrame(
        [(1, h0), (2, h7), (3, h8)], "id long, h long"
    )
    found = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in hamming_pairs(df, "id", "h").collect()
    }
    assert found[(1, 2)] == 7  # guaranteed regime: always found
    assert (1, 3) not in found  # hamming 8 > max_hamming 7: filtered
    # opting into the probabilistic regime at the same banding: the
    # all-bands-differ pair is structurally invisible to the banding
    prob = {
        (r["a_id"], r["b_id"])
        for r in hamming_pairs(
            df, "id", "h", max_hamming=8, bands=8, allow_probabilistic=True
        ).collect()
    }
    assert (1, 2) in prob and (1, 3) not in prob
    # and WITHOUT the opt-in, an under-guaranteed banding refuses
    import pytest as _pytest

    with _pytest.raises(ValueError, match="allow_probabilistic"):
        hamming_pairs(df, "id", "h", max_hamming=8, bands=8)
    # derived banding for max_hamming=8 (16 bands of 4 bits) FINDS the
    # one-bit-per-8-bit-band pair: two adjacent 4-bit halves agree
    der = {
        (r["a_id"], r["b_id"])
        for r in hamming_pairs(df, "id", "h", max_hamming=8).collect()
    }
    assert (1, 3) in der and (1, 2) in der


def test_hamming_pairs_bucket_cap(spark):
    # 50 identical hashes with cap 10: the degenerate bucket is dropped
    df = spark.createDataFrame([(i, 42) for i in range(50)], "id long, h long")
    out = hamming_pairs(df, "id", "h", max_bucket_size=10).collect()
    assert out == []


def test_phash_images_pipeline(spark):
    base = _gradient(48, 48)
    dup = np.clip(base.astype(int) + 25, 0, 255).astype(np.uint8)  # brightness
    other = _gradient(48, 48, tilt=-2.0)
    rows = []
    for i, img in ((1, base), (2, dup), (3, other)):
        rows.append(
            (
                i,
                {
                    "mime": "image/png",
                    "data": encode_png(img),
                    "width": 48,
                    "height": 48,
                    "duration_ms": None,
                },
            )
        )
    df = spark.createDataFrame(
        rows,
        "doc_id long, media struct<mime:string,data:binary,width:int,"
        "height:int,duration_ms:long>",
    )
    hashes = phash_images(df, fake=None)
    pairs = hamming_pairs(hashes, "doc_id", "phash", max_hamming=6).collect()
    got = {(r["a_id"], r["b_id"]) for r in pairs}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_phash_images_fake_mode_is_content_addressed(spark):
    rows = [
        (1, {"mime": "image/png", "data": b"AAA", "width": 1, "height": 1,
             "duration_ms": None}),
        (2, {"mime": "image/png", "data": b"AAA", "width": 1, "height": 1,
             "duration_ms": None}),
        (3, {"mime": "image/png", "data": b"BBB", "width": 1, "height": 1,
             "duration_ms": None}),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, media struct<mime:string,data:binary,width:int,"
        "height:int,duration_ms:long>",
    )
    got = {r["doc_id"]: r["phash"] for r in phash_images(df).collect()}
    assert got[1] == got[2] != got[3]
    assert all(h >= 0 for h in got.values())  # 63-bit, sign bit clear
