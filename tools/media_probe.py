"""Multimodal scale probes (r10) — the shapes the fixed-size driver
corpora cannot exercise:

1. AUDIO DEDUP PATHOLOGY — the audio twin of the r9 image probe:
   ``family``-many clips collapsing into 48 byte-identical families
   (synth_wav id_mod). Raw banding would put ~family/48 members in
   every bucket (star caps engage, cross-family star pairs fail the
   verify — the family-loss pathology); ``audio_dup_groups``'s
   exact-hash-class collapse must keep coverage COMPLETE.
2. JPEG DECODE THROUGHPUT — the honest cost of the per-block Python
   Huffman loop: decode ``n_jpeg`` grayscale thumbnails through the
   real dispatch and report wall-clock (the documented Pillow seam is
   where a bulk crawl would plug in; this number is what it buys).
3. MJPEG SPLIT+DECODE THROUGHPUT — per-frame decode over ``n_vid``
   3-frame streams.

Usage:
    python tools/media_probe.py [family] [n_jpeg] [n_vid]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from toy_vector_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    family = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_jpeg = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_vid = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    spark = get_spark("media-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from toy_vector_db_spark.operators.audiodup import audio_dup_groups
    from toy_vector_db_spark.operators.jpeg import synth_jpeg_gray
    from toy_vector_db_spark.operators.media import decode_media, synth_wav
    from toy_vector_db_spark.operators.video import (
        decode_video_frames, synth_mjpeg)

    # 1. audio pathology: full coverage through the class collapse
    corpus = synth_wav(spark, n=family, id_mod=48).localCheckpoint()
    t0 = time.time()
    grouped = audio_dup_groups(corpus)
    n_rows, n_groups = grouped.agg(
        F.count(F.lit(1)), F.countDistinct("group_id")).collect()[0]
    print(f"audio-groups: {n_rows}/{family} covered in {n_groups} "
          f"groups, {time.time() - t0:.1f}s")
    assert n_rows == family, "family-loss pathology regressed"

    # 2. jpeg decode throughput (real per-block Huffman in Python)
    jp = synth_jpeg_gray(spark, n=n_jpeg).localCheckpoint()
    t0 = time.time()
    n_ok = decode_media(jp).filter(F.col("width") == 32).count()
    dt = time.time() - t0
    print(f"jpeg-decode: {n_ok}/{n_jpeg} 32x16 thumbnails in {dt:.1f}s "
          f"({n_jpeg / dt:.0f} img/s on local[32])")

    # 3. mjpeg per-frame decode
    vids = synth_mjpeg(spark, n=n_vid).localCheckpoint()
    t0 = time.time()
    n_frames = decode_video_frames(vids).filter("decoded").count()
    dt = time.time() - t0
    print(f"mjpeg-decode: {n_frames} frames from {n_vid} streams in "
          f"{dt:.1f}s ({n_frames / dt:.0f} frames/s)")

    # 4. backend A/B at MEGAPIXEL scale (r11, VERDICT r10 Next #2):
    # single-process decode of one ~1.05-megapixel block-constant
    # gray JPEG, both backends — what the Pillow seam buys per image
    # (the Spark fan-out above multiplies either number by the core
    # count). Skips the pil lane when Pillow is absent.
    import numpy as np

    from toy_vector_db_spark.operators.jpeg import encode_jpeg_planes
    from toy_vector_db_spark.operators.media import _HAVE_PIL, _decode_jpeg
    yv = (np.add.outer(np.arange(128) * 7, np.arange(128) * 11) % 251) \
        .astype(np.float64)
    mega = encode_jpeg_planes([np.repeat(np.repeat(yv, 8, 0), 8, 1)],
                              [(1, 1)], (1024, 1024))
    lanes = ["numpy"] + (["pil"] if _HAVE_PIL else [])
    for lane in lanes:
        t0 = time.time()
        px = _decode_jpeg(mega, lane)
        dt = time.time() - t0
        mpx = px.shape[0] * px.shape[1] / 1e6
        print(f"jpeg-megapixel[{lane}]: {mpx:.2f} MP in {dt:.3f}s "
              f"({mpx / dt:.1f} MP/s single-core)")
    if not _HAVE_PIL:
        print("jpeg-megapixel[pil]: SKIPPED (Pillow not installed — "
              "seam auto-selects numpy)")
    spark.stop()


if __name__ == "__main__":
    main()
