#!/usr/bin/env python
"""Multimodal decode throughput at two parallelism levels (round 5).

Measures the REAL PNG decode path (imaging.py codec inside
multimodal.decode_images mapInPandas) end-to-end: synthetic-PNG
generation is measured separately so the decode number isn't inflated
by generation.  Run at local[8] and local[32] on the same materialized
media table for the north-rule two-parallelism evidence on this
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

    import subprocess

    # decode at each level in a fresh process/JVM
    for cores in (8, 32):
        for kind, path in (("", media_path), ("audio_", audio_path)):
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--decode-worker",
                    str(cores),
                    path,
                    "audio" if kind else "image",
                ],
                capture_output=True,
                text=True,
            )
            line = [
                l for l in out.stdout.splitlines() if l.startswith("{")
            ]
            assert line, out.stderr[-2000:]
            results[f"{kind}decode_{cores}"] = json.loads(line[-1])

    d8, d32 = results["decode_8"], results["decode_32"]
    results["eff_8_to_32"] = round(
        (d32["images_per_sec"] / d8["images_per_sec"]) / 4.0, 3
    )
    a8, a32 = results["audio_decode_8"], results["audio_decode_32"]
    results["audio_eff_8_to_32"] = round(
        (a32["images_per_sec"] / a8["images_per_sec"]) / 4.0, 3
    )
    print(json.dumps(results))


def decode_worker(cores, media_path, kind="image"):
    spark = session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from whoosh_reloaded_spark.multimodal import decode_audio, decode_images

    media = spark.read.parquet(media_path)
    n_bytes = media.select(F.sum(F.length("payload"))).collect()[0][0]
    la0 = loadavg()
    t0 = time.perf_counter()
    if kind == "audio":
        dec = decode_audio(media)
        checksum_col = "sum_sq"
    else:
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
