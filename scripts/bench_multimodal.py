#!/usr/bin/env python
"""Multimodal decode throughput at two parallelism levels (round 5).

Measures the REAL decode paths end-to-end — PNG (imaging.py codec),
baseline JPEG (jpeg.py, 64x64 q85 4:2:0 natural patterns), WAV/PCM
(audio.py), and MJPEG/AVI video with every-2nd frame sampling
(video.py + jpeg.py) — inside the multimodal mapInPandas operators.
Generation is measured separately so the decode numbers aren't
inflated.  Run at local[8] and local[32] on the same materialized
media tables for the north-rule two-parallelism evidence on this
operator family.

Usage: python scripts/bench_multimodal.py [n_images]
  env WRS_MM_ROOT (default /tmp/wrs_mm_bench)
Prints one JSON line.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.environ.get("WRS_MM_ROOT", "/tmp/wrs_mm_bench")
N = (
    int(sys.argv[1])
    if len(sys.argv) > 1 and not sys.argv[1].startswith("-")
    else 200_000
)


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def session(cores):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(max(32, cores * 2)))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName(f"mmbench-{cores}")
        .getOrCreate()
    )


def main():
    media_path = os.path.join(ROOT, f"media_{N}")
    results = {"metric": "multimodal_decode_bench", "n_images": N}

    # generate once at 32 cores (measured, but not the headline number)
    if not os.path.isdir(media_path):
        spark = session(32)
        spark.sparkContext.setLogLevel("ERROR")
        from whoosh_reloaded_spark.multimodal import synthetic_media

        ids = spark.range(0, N).withColumnRenamed("id", "doc_id")
        t0 = time.perf_counter()
        synthetic_media(ids).repartition(128).write.mode(
            "overwrite"
        ).parquet(media_path)
        results["generate_sec"] = round(time.perf_counter() - t0, 1)
        spark.stop()

    audio_path = os.path.join(ROOT, f"audio_{N}")
    if not os.path.isdir(audio_path):
        spark = session(32)
        spark.sparkContext.setLogLevel("ERROR")
        from whoosh_reloaded_spark.multimodal import synthetic_audio

        ids = spark.range(0, N).withColumnRenamed("id", "doc_id")
        t0 = time.perf_counter()
        synthetic_audio(ids).repartition(128).write.mode(
            "overwrite"
        ).parquet(audio_path)
        results["generate_audio_sec"] = round(time.perf_counter() - t0, 1)
        spark.stop()

    # JPEG leg: natural-pattern 64x64 q85 4:2:0 images through the real
    # baseline JPEG encoder (the entropy decode is ~20x the work of a
    # small PNG, so the corpus is N/4 images)
    n_jpeg = max(1000, N // 4)
    jpeg_path = os.path.join(ROOT, f"jpeg_{n_jpeg}")
    if not os.path.isdir(jpeg_path):
        spark = session(32)
        spark.sparkContext.setLogLevel("ERROR")
        from pyspark.sql import functions as F  # noqa: F401

        ids = spark.range(0, n_jpeg).withColumnRenamed("id", "doc_id")
        t0 = time.perf_counter()
        _synthetic_jpeg(ids).repartition(128).write.mode(
            "overwrite"
        ).parquet(jpeg_path)
        results["generate_jpeg_sec"] = round(time.perf_counter() - t0, 1)
        spark.stop()

    # video leg: 8-frame 16x16 MJPEG/AVI containers, every-2nd sampled
    n_vid = max(1000, N // 8)
    video_path = os.path.join(ROOT, f"video_{n_vid}")
    if not os.path.isdir(video_path):
        spark = session(32)
        spark.sparkContext.setLogLevel("ERROR")
        from whoosh_reloaded_spark.multimodal import synthetic_video

        ids = spark.range(0, n_vid).withColumnRenamed("id", "doc_id")
        t0 = time.perf_counter()
        synthetic_video(ids).repartition(64).write.mode(
            "overwrite"
        ).parquet(video_path)
        results["generate_video_sec"] = round(time.perf_counter() - t0, 1)
        spark.stop()

    import subprocess

    # decode at each level in a fresh process/JVM
    legs = (
        ("", media_path, "image"),
        ("audio_", audio_path, "audio"),
        ("jpeg_", jpeg_path, "jpeg"),
        ("video_", video_path, "video"),
    )
    for cores in (8, 32):
        for prefix, path, kind in legs:
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--decode-worker",
                    str(cores),
                    path,
                    kind,
                ],
                capture_output=True,
                text=True,
            )
            line = [
                l for l in out.stdout.splitlines() if l.startswith("{")
            ]
            assert line, out.stderr[-2000:]
            results[f"{prefix}decode_{cores}"] = json.loads(line[-1])

    for prefix in ("", "audio_", "jpeg_", "video_"):
        lo = results[f"{prefix}decode_8"]
        hi = results[f"{prefix}decode_32"]
        results[f"{prefix}eff_8_to_32"] = round(
            (hi["images_per_sec"] / lo["images_per_sec"]) / 4.0, 3
        )
    print(json.dumps(results))


def _synthetic_jpeg(df):
    """Deterministic natural-pattern JPEGs (64x64 RGB, q85 4:2:0) —
    sinusoid fields compress like photos, unlike uniform fixtures."""
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from whoosh_reloaded_spark.multimodal import _ship_imaging_by_value

    _ship_imaging_by_value()
    from whoosh_reloaded_spark.jpeg import jpeg_encode

    src = df.select(F.col("doc_id").cast("long").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        y, x = np.mgrid[0:64, 0:64]
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf["media_id"]:
                d = int(mid)
                img = np.clip(
                    np.stack([
                        128 + 60 * np.sin(x / 9 + d) + 40 * np.cos(y / 13),
                        128 + 50 * np.sin((x + y) / 11 + d),
                        128 + 45 * np.cos(x / 7 + d) - 30 * np.sin(y / 10),
                    ], axis=2),
                    0, 255,
                ).astype(np.uint8)
                ids.append(d)
                payloads.append(jpeg_encode(img, quality=85))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return src.mapInPandas(gen, "media_id long, payload binary")


def decode_worker(cores, media_path, kind="image"):
    spark = session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from whoosh_reloaded_spark.multimodal import (
        decode_audio,
        decode_images,
        decode_video,
    )

    media = spark.read.parquet(media_path)
    n_bytes = media.select(F.sum(F.length("payload"))).collect()[0][0]
    la0 = loadavg()
    t0 = time.perf_counter()
    if kind == "audio":
        dec = decode_audio(media)
        checksum_col = "sum_sq"
    elif kind == "video":
        dec = decode_video(media, every_nth=2)
        checksum_col = "pixel_sum"
    else:  # image / jpeg both route through the sniffing image decoder
        dec = decode_images(media, with_thumbnail=False)
        checksum_col = "pixel_sum"
    agg = dec.agg(
        F.count(F.when(F.col("ok"), 1)).alias("n_ok"),
        F.sum(checksum_col).alias("checksum"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "n_ok": int(agg["n_ok"]),
                "checksum": int(agg["checksum"]),
                "wall_sec": round(wall, 2),
                "images_per_sec": round(agg["n_ok"] / wall, 1),
                "mb_per_sec": round(n_bytes / wall / 1e6, 1),
                "loadavg": [la0, loadavg()],
            }
        )
    )


if __name__ == "__main__":
    if "--decode-worker" in sys.argv:
        i = sys.argv.index("--decode-worker")
        decode_worker(
            int(sys.argv[i + 1]),
            sys.argv[i + 2],
            sys.argv[i + 3] if len(sys.argv) > i + 3 else "image",
        )
    else:
        main()
