"""End-to-end multimodal curation: mixed media bytes -> triaged,
decoded, visually-deduped, thumbnailed corpus.

Every step is a real kernel from this repo — the media never leaves
Spark, and no codec library is required (PNG/JPEG/GIF/BMP/WAV decode
via the stdlib codecs in operators/codecs.py):

  1. MIME triage         (multimodal.sniff_mime: magic-byte CASE,
                          codegen — trusts bytes, not upload labels)
  2. byte-level triage   (multimodal.byte_stats: entropy/NUL/printable
                          — drops empties and text masquerading as
                          media before any decode cost)
  3. partition sizing    (repartition_by_media_size: partitions sized
                          by payload bytes, not row counts)
  4. decode + featurize  (decode_and_featurize_images: PNG, baseline
                          JPEG, GIF, BMP and raw buffers onto one
                          grid-pool embedding)
  5. visual near-dedup   (similarity.embedding_dup_pairs_exact over
                          the image embeddings: the same picture
                          re-encoded in another container collides;
                          then the scale path — codecs.phash64 +
                          dedup.hamming_pairs banded bucket join,
                          no all-pairs stage)
  6. thumbnails          (resize_images: NN resample, re-encoded into
                          the input container)
  7. audio features      (extract_audio_features: WAV + raw PCM through
                          the same FFT-mel MFCC DSP)

Run: python examples/media/example.py
(self-contained: synthesizes its corpus with the codec encoders).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
)

import numpy as np
from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.codecs import (
    encode_bmp,
    encode_gif,
    encode_jpeg,
    encode_mp4,
    encode_png,
    encode_wav,
)
from kafka_streams_plumber_spark.operators.multimodal import (
    byte_stats,
    decode_and_featurize_images,
    extract_audio_features,
    pack_media,
    probe_media,
    repartition_by_media_size,
    resize_images,
    sample_video_frames,
    sniff_mime,
)
from kafka_streams_plumber_spark.operators.similarity import (
    embedding_dup_pairs_exact,
)
from kafka_streams_plumber_spark.plans.session import get_spark


def _corpus() -> list[tuple[int, bytes, str, int | None, int | None]]:
    """(doc_id, bytes, claimed_mime, width, height) — the claimed mime
    is wrong or missing for several rows, as uploads always are."""
    rng = np.random.default_rng(42)
    base = (rng.integers(0, 6, (48, 64), dtype=np.uint8) * 42)
    base3 = np.repeat(base[:, :, None], 3, axis=2)
    noisy = base3.copy()
    noisy[::9, ::9] = 255  # a visually-near copy
    # structurally different content (a gradient), not just other noise:
    # grid-pooled fingerprints of uniform noise are near-parallel by
    # construction — exactly why real corpora threshold high
    other = np.repeat(
        np.linspace(0, 255, 48 * 64).astype(np.uint8).reshape(48, 64)[:, :, None],
        3,
        axis=2,
    )
    tone = (
        np.sin(2 * np.pi * 440 * np.arange(8000) / 16000) * 12000
    ).astype(np.int16)
    return [
        (1, encode_png(base3), "image/png", None, None),
        (2, encode_bmp(base3), "application/octet-stream", None, None),  # mislabeled
        (3, encode_gif(noisy), "image/gif", None, None),
        (4, encode_png(other), "image/png", None, None),
        (5, base3.tobytes(), "image/x-raw", 64, 48),
        (10, encode_jpeg(base3), "image/jpeg", None, None),  # lossy re-encode
        (11, encode_mp4([b"fake-nal-%d" % i for i in range(6)],
                        width=64, height=48, sample_delta=500,
                        sync=[1, 3, 5]), "video/mp4", None, None),
        (6, encode_wav(np.stack([tone, tone], axis=1), 16000), "audio/wav", None, None),
        (7, tone.tobytes(), "audio/x-raw-s16le", None, None),
        (8, b"just some text pretending", "image/png", None, None),  # triaged out
        (9, b"", "image/png", None, None),  # empty
    ]


def main() -> None:
    spark = get_spark("media-example", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.createDataFrame(
        _corpus(), "doc_id long, raw binary, claimed string, w int, h int"
    )

    # 1. trust magic bytes over the claimed label (falls back to the
    #    claim for raw buffers, which have no container signature)
    sniffed = df.withColumn("sniffed", sniff_mime(F.col("raw"))).withColumn(
        "mime",
        F.when(F.col("sniffed") != "application/octet-stream", F.col("sniffed"))
        .otherwise(F.col("claimed")),
    )

    # 2. byte triage before any decode: empties and printable text are
    #    not media whatever the label says
    stats = byte_stats(sniffed.select("doc_id", F.col("raw").alias("data")), "data")
    keep = stats.filter(
        (F.col("n_bytes") > 0) & ~((F.col("printable_ratio") > 0.95))
    ).select("doc_id")
    media = (
        sniffed.join(keep, "doc_id")
        .select(
            "doc_id",
            pack_media(
                F.col("raw"), F.col("mime"), width=F.col("w"), height=F.col("h")
            ).alias("media"),
        )
    )

    # 2.5 header-only probe: dims/duration/codec for every container
    #     WITHOUT decoding payloads — the triage that routes the rest
    print("== header probe (no decode) ==")
    probe_media(media).orderBy("doc_id").show()

    # 3. decode-stage partitions sized by payload, not rows
    media = repartition_by_media_size(media, target_partition_bytes=1 << 20)

    imgs = media.filter(F.col("media.mime").startswith("image/"))
    auds = media.filter(F.col("media.mime").startswith("audio/"))

    # 4. one embedding kernel for every container + raw buffers
    feats = decode_and_featurize_images(imgs, fake=None).cache()
    print("== image features ==")
    feats.select("doc_id", "width", "height").orderBy("doc_id").show()

    # 5. the same picture across lossless containers collides at 1.0,
    #    the JPEG re-encode and the dotted GIF copy land just under,
    #    unrelated content stays far
    pairs = embedding_dup_pairs_exact(
        feats, id_col="doc_id", vec_col="embedding", threshold=0.999
    )
    print("== visual near-dup pairs (cos >= 0.999) ==")
    pairs.orderBy("a_id", "b_id").show()

    # 5.5 the scale path for the same question: DCT-median pHash +
    #     banded Hamming bucket join — no all-pairs stage, brightness-
    #     and container-invariant
    from kafka_streams_plumber_spark.operators.dedup import hamming_pairs
    from kafka_streams_plumber_spark.operators.multimodal import phash_images

    hashes = phash_images(imgs, fake=None)
    print("== pHash near-dup pairs (hamming <= 10) ==")
    hamming_pairs(hashes, "doc_id", "phash", max_hamming=10).orderBy(
        "a_id", "b_id"
    ).show()

    # 6. thumbnails re-encoded into their input container
    thumbs = resize_images(imgs, max_side=16, fake=None)
    print("== thumbnails ==")
    thumbs.select(
        "doc_id", "width", "height", F.length("data").alias("bytes")
    ).orderBy("doc_id").show()

    # 6.5 MP4 keyframes demuxed from the sample tables — payloads stay
    #     encoded for a downstream codec stage
    vids = media.filter(F.col("media.mime") == "video/mp4")
    print("== mp4 keyframes (encoded payloads) ==")
    sample_video_frames(vids, every_ms=900, fake=None).select(
        "doc_id", "frame_idx", F.length("frame").alias("bytes")
    ).orderBy("frame_idx").show()

    # 7. WAV header rate + stereo downmix == raw PCM path
    print("== audio features ==")
    extract_audio_features(auds, fake=None).select(
        "doc_id", "duration_ms", "sample_rate", F.round("loudness", 4).alias("rms")
    ).orderBy("doc_id").show()

    spark.stop()


if __name__ == "__main__":
    main()
