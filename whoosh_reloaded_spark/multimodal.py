"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100-TB training-data pipeline carries media as `binary` columns with
structured metadata.  The Spark-side plumbing — schemas, Arrow batch
shape, partition sizing — AND the image decode itself are real here:
:func:`decode_images` sniffs the container and runs the
:mod:`whoosh_reloaded_spark.imaging` PNG codec (chunk parse, zlib
inflate, scanline unfilter, full color-type/depth matrix) or the
:mod:`whoosh_reloaded_spark.jpeg` codec (baseline AND progressive
SOF2: Huffman + successive approximation + IDCT + chroma upsampling)
inside mapInPandas, then luma / perceptual hash / thumbnail.  The
remaining exotica (arithmetic-coded JPEG, H.264-class video codecs)
route to a C-backed library through the same ``decode_fn`` hook; the
per-row error columns keep one corrupt payload from killing a 100-TB
job.

Patterns:
- mapInPandas for decode/feature-extract (streaming batches, bounded
  memory per task, media bytes never collected to the driver)
- metadata extraction stays JVM-side (length, magic-byte sniffing)
- repartition by byte-size budget before heavy decode so one task's batch
  fits executor memory
- per-row try/except -> (ok, err) columns: corrupt media is data, not an
  exception, at scale
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, n_bytes long, magic string, kind string"
)

FEATURE_SCHEMA = (
    "media_id long, width int, height int, n_frames int, feature array<float>"
)


def media_metadata(df: DataFrame, id_col: str = "media_id",
                   bin_col: str = "payload") -> DataFrame:
    """JVM-side metadata: size + magic-byte container sniffing (no Python)."""
    magic = F.hex(F.substring(F.col(bin_col), 1, 4))
    riff_form = F.hex(F.substring(F.col(bin_col), 9, 4))
    kind = (
        F.when(magic.startswith("89504E47"), "png")
        .when(magic.startswith("FFD8"), "jpeg")
        .when(
            magic.startswith("52494646"),
            # RIFF form type: WAVE / 'AVI ' / other
            F.when(riff_form == "57415645", "wav")
            .when(riff_form == "41564920", "avi")
            .otherwise("riff"),
        )
        .when(magic.startswith("1A45DFA3"), "mkv")
        .otherwise("unknown")
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        F.length(F.col(bin_col)).cast("long").alias("n_bytes"),
        magic.alias("magic"),
        kind.alias("kind"),
    )


def _fake_decode(payload: bytes):
    """Deterministic stand-in for containers without a real decoder here
    (JPEG/RIFF/...).

    Emits (width, height, n_frames, 8-dim feature) derived purely from the
    bytes, so tests exercise the exact batch/schema path a real decoder
    would use.  Replace via `decode_fn`.
    """
    n = len(payload or b"")
    w = 16 + (n % 64)
    h = 16 + ((n // 64) % 64)
    frames = 1 + (n % 3)
    feat = [((payload[i % n] if n else 0) + i) / 255.0 for i in range(8)]
    return w, h, frames, feat


def _ship_imaging_by_value() -> None:
    """Register the imaging + jpeg modules for by-value cloudpickle
    shipping, so closures capturing their functions run on executors
    that do NOT have this package on their PYTHONPATH (the same
    no---py-files guarantee the analyzers make by capturing only plain
    data).  Idempotent."""
    try:
        from pyspark import cloudpickle

        from whoosh_reloaded_spark import imaging, jpeg, video

        if hasattr(cloudpickle, "register_pickle_by_value"):
            cloudpickle.register_pickle_by_value(imaging)
            cloudpickle.register_pickle_by_value(jpeg)
            cloudpickle.register_pickle_by_value(video)
    except Exception:
        pass  # fall back to --py-files deployments


def _make_default_decode():
    """Factory for the default :func:`extract_features` decoder: PNG
    payloads go through the REAL :mod:`imaging` codec and JPEG through
    the REAL :mod:`jpeg` baseline codec (feature = the 8 leading aHash
    block means, normalized); other containers fall back to the
    deterministic plumbing stand-in (same formula as
    :func:`_fake_decode`).  Built as a closure capturing the decoding
    functions so cloudpickle ships everything by value."""
    from whoosh_reloaded_spark.imaging import block_means, luma, png_decode
    from whoosh_reloaded_spark.jpeg import jpeg_decode

    def decode(payload: bytes):
        payload = bytes(payload) if payload else b""
        arr = None
        try:
            if payload[:8] == b"\x89PNG\r\n\x1a\n":
                arr = png_decode(payload)
            elif payload[:2] == b"\xff\xd8":
                arr = jpeg_decode(payload)
        except Exception:
            # corrupt/unsupported -> deterministic stand-in.  Catch-all
            # on purpose: zlib.error (CRC-valid but corrupt deflate),
            # struct.error etc. must not kill the Spark task either.
            arr = None
        if arr is not None and arr.shape[0] >= 8 and arr.shape[1] >= 8:
            h, w = arr.shape[:2]
            means = block_means(luma(arr), 8).reshape(-1)
            return w, h, 1, [float(v) / 255.0 for v in means[:8]]
        n = len(payload or b"")
        return (
            16 + (n % 64),
            16 + ((n // 64) % 64),
            1 + (n % 3),
            [((payload[i % n] if n else 0) + i) / 255.0 for i in range(8)],
        )

    return decode


def default_decode(payload: bytes):
    """Driver-side convenience wrapper around :func:`_make_default_decode`."""
    return _make_default_decode()(payload)


def _estimate_total_bytes(df: DataFrame, bin_col: str,
                          sample_rows: int = 1000) -> int:
    """Estimated total payload bytes WITHOUT scanning every media blob.

    A full `sum(length(payload))` pre-scan reads all media bytes once just
    to pick a partition count — at 100 TB that doubles I/O.  Instead: row
    count from table metadata (parquet footer stats, no payload read) x the
    mean payload length of the first `sample_rows` rows (reads only enough
    partitions to fill the sample).  Partition sizing only needs an
    order-of-magnitude estimate.
    """
    n_rows = df.count()
    if n_rows == 0:
        return 1
    sample = df.select(F.length(bin_col).alias("b")).head(sample_rows)
    if not sample:
        return 1
    avg = sum((r["b"] or 0) for r in sample) / len(sample)
    return max(1, int(avg * n_rows))


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    bin_col: str = "payload",
    decode_fn: Optional[Callable] = None,
    batch_target_bytes: int = 64 << 20,
) -> DataFrame:
    """Decode + featurize media via mapInPandas (Arrow-batched).

    `decode_fn(payload: bytes) -> (w, h, n_frames, feature list[float])`.
    The input is repartitioned so each task handles roughly
    `batch_target_bytes` of payload — the knob that keeps decode tasks
    memory-bounded at 100 TB.
    """
    _ship_imaging_by_value()
    decode = decode_fn or _make_default_decode()

    total = _estimate_total_bytes(df, bin_col)
    parts = max(1, int(total / batch_target_bytes))
    src = df.select(F.col(id_col).alias("media_id"), F.col(bin_col).alias("_p"))
    if parts > src.rdd.getNumPartitions():
        src = src.repartition(parts)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, fr, feats = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["_p"]):
                w, h, nf, feat = decode(bytes(payload) if payload is not None else b"")
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                fr.append(nf)
                feats.append(feat)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": ws,
                    "height": hs,
                    "n_frames": fr,
                    "feature": feats,
                }
            )

    return src.mapInPandas(run, FEATURE_SCHEMA)


DECODE_SCHEMA = (
    "media_id long, ok boolean, err string, width int, height int, "
    "channels int, pixel_sum long, luma_sum long, ahash string, "
    "thumb_png binary, orientation int"
)


def decode_images(
    df: DataFrame,
    id_col: str = "media_id",
    bin_col: str = "payload",
    batch_target_bytes: int = 64 << 20,
    hash_size: int = 8,
    with_thumbnail: bool = True,
) -> DataFrame:
    """REAL image decode over mapInPandas: container-sniffed PNG
    (:mod:`imaging` — chunk parse + inflate + unfilter) or baseline JPEG
    (:mod:`jpeg` — Huffman + IDCT + upsample), then dims / channel count
    / integer pixel and luma checksums / aHash perceptual hash / PNG
    thumbnail per row.

    100-TB design: payloads are repartitioned to ~`batch_target_bytes`
    per task before the heavy decode (bounded executor memory), all
    byte-handling happens executor-side in Arrow batches (nothing
    collected), and a corrupt/unsupported payload becomes an
    ``ok=false`` row with the error text instead of failing the stage —
    at scale some fraction of media is always broken.

    ``pixel_sum``/``luma_sum`` are integer invariants of the decoded
    array: any bug in inflate/unfilter changes them, which is what the
    driver oracle checks against a closed-form expected table.
    """
    _ship_imaging_by_value()
    from whoosh_reloaded_spark.imaging import (
        average_hash,
        luma as _luma,
        png_decode,
        thumbnail_png,
    )
    from whoosh_reloaded_spark.jpeg import exif_orientation, jpeg_decode

    def _decode_any(payload: bytes):
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return png_decode(payload)
        if payload[:2] == b"\xff\xd8":
            return jpeg_decode(payload)
        raise ValueError("unsupported image container")

    total = _estimate_total_bytes(df, bin_col)
    parts = max(1, int(total / batch_target_bytes))
    src = df.select(F.col(id_col).alias("media_id"), F.col(bin_col).alias("_p"))
    if parts > src.rdd.getNumPartitions():
        src = src.repartition(parts)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["_p"]):
                try:
                    raw = bytes(payload) if payload is not None else b""
                    arr = _decode_any(raw)
                    h, w = arr.shape[:2]
                    ch = 1 if arr.ndim == 2 else arr.shape[2]
                    rows.append(
                        {
                            "media_id": mid,
                            "ok": True,
                            "err": None,
                            "width": w,
                            "height": h,
                            "channels": ch,
                            "pixel_sum": int(arr.sum(dtype="int64")),
                            "luma_sum": int(_luma(arr).sum(dtype="int64")),
                            "ahash": average_hash(arr, hash_size),
                            "thumb_png": (
                                thumbnail_png(arr, hash_size)
                                if with_thumbnail
                                else None
                            ),
                            "orientation": exif_orientation(raw),
                        }
                    )
                except Exception as e:  # corrupt media is data at scale
                    rows.append(
                        {
                            "media_id": mid,
                            "ok": False,
                            "err": f"{type(e).__name__}: {e}",
                            "width": None,
                            "height": None,
                            "channels": None,
                            "pixel_sum": None,
                            "luma_sum": None,
                            "ahash": None,
                            "thumb_png": None,
                            "orientation": None,
                        }
                    )
            yield pd.DataFrame(rows, columns=[
                "media_id", "ok", "err", "width", "height", "channels",
                "pixel_sum", "luma_sum", "ahash", "thumb_png",
                "orientation",
            ])

    return src.mapInPandas(run, DECODE_SCHEMA)


def ahash_near_dup_pairs(decoded: DataFrame, id_col: str = "media_id",
                         hash_col: str = "ahash", max_hamming: int = 3,
                         bands: int = 4, max_bucket: int = 0) -> DataFrame:
    """Near-duplicate IMAGES via banded LSH over the aHash perceptual
    hash: (media_a, media_b, hamming) with hamming <= ``max_hamming``.

    The image twin of textops.minhash_lsh_pairs: the hex hash splits
    into ``bands`` substrings; candidates collide on any equal band and
    only candidates pay the exact hamming check (two 32-bit ``conv`` +
    ``bit_count(xor)`` per hash chunk, all JVM-side — no Python in the
    pipeline).  By pigeonhole, ``max_hamming < bands`` guarantees every
    qualifying pair shares at least one unchanged band, so recall is
    EXACT (not probabilistic) at the default settings.  ``max_bucket``
    drops oversized band buckets before the self-join — the web-scale
    guard against boilerplate images (logos, spacer gifs) forming
    quadratic buckets; with it set, mega-bucket-only pairs are missed
    (use exact ahash groupBy first for those).
    """
    rows = decoded.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
    )
    # band split on the hex string (length inferred relationally)
    band_cols = []
    for b in range(bands):
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.expr(
                    f"substring(_h, 1 + {b} * (length(_h) DIV {bands}),"
                    f" length(_h) DIV {bands})"
                ).alias("band_hash"),
            )
        )
    band_rows = rows.select(
        "_id", "_h", F.explode(F.array(*band_cols)).alias("band")
    ).select("_id", "_h", "band.band_id", "band.band_hash")

    if max_bucket > 0:
        big = (
            band_rows.groupBy("band_id", "band_hash")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_bucket)
            .select("band_id", "band_hash")
        )
        band_rows = band_rows.join(
            big, ["band_id", "band_hash"], "left_anti"
        )

    a = band_rows.select(
        F.col("_id").alias("media_a"), F.col("_h").alias("_ha"),
        "band_id", "band_hash",
    )
    b = band_rows.select(
        F.col("_id").alias("media_b"), F.col("_h").alias("_hb"),
        "band_id", "band_hash",
    )
    cand = (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "_ha", "_hb")
        .dropDuplicates(["media_a", "media_b"])
    )
    # exact hamming over 8-hex-char (32-bit) chunks, JVM bit ops only;
    # hashes in one frame share a length, so chunks past the end yield
    # '' -> conv NULL -> coalesce 0 and contribute nothing
    ham = None
    for c in range(8):  # up to 256-bit hashes
        term = F.expr(
            "bit_count("
            f"coalesce(cast(conv(substring(_ha, {1 + c * 8}, 8), 16, 10)"
            " as bigint), 0L)"
            f" ^ coalesce(cast(conv(substring(_hb, {1 + c * 8}, 8), 16,"
            " 10) as bigint), 0L))"
        )
        ham = term if ham is None else ham + term
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("media_a", "media_b", "hamming")
    )


def synthetic_jpeg_media(df: DataFrame, id_col: str = "doc_id",
                         progressive: bool = True) -> DataFrame:
    """Deterministic synthetic JPEGs: per id, a uniform 16x16 GRAYSCALE
    image of shade (d*37) % 256 at quality 100 — single component (no
    YCbCr rounding) and uniform block -> DC only with all-ones quant
    tables, so the roundtrip is bit-exact and pixel_sum has the closed
    form 256 * shade an SQL oracle can state.  (Uniform RGB is NOT
    exact: the color transform itself rounds +-1 per channel — the
    color path is pinned instead by the exact progressive==baseline
    cross-path unit tests.)  ``progressive=True`` encodes with the SOF2
    multi-scan script, putting the progressive decode machinery under
    the driver's oracle gate."""
    _ship_imaging_by_value()
    import numpy as np

    from whoosh_reloaded_spark.jpeg import (
        jpeg_encode,
        jpeg_encode_progressive,
    )

    enc = jpeg_encode_progressive if progressive else jpeg_encode
    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf["media_id"]:
                d = int(mid)
                img = np.full((16, 16), (d * 37) % 256, np.uint8)
                ids.append(d)
                payloads.append(
                    enc(img, quality=100, subsampling="4:4:4")
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return src.mapInPandas(gen, "media_id long, payload binary")


def synthetic_media(df: DataFrame, id_col: str = "doc_id",
                    scale: int = 1) -> DataFrame:
    """Deterministic synthetic PNG per id — the test/benchmark media
    table (no external data; the brief's input is text-only).

    For id d: width = 8*scale*(1 + d%2), height = 8*scale*(1 +
    (d//2)%2), RGB pixel (y, x, c) = (d*7 + x*5 + y*3 + c*11) % 256,
    encoded with scanline filter d%5 (cycling all five PNG filter types
    across rows of the table, so decoding the table exercises every
    unfilter path).  The pixel formula is closed-form, so an SQL oracle
    can compute the expected dims/checksums without any image library
    (the oracle pins scale=1; larger scales are for throughput benches
    at realistic image sizes).
    """
    import numpy as np

    _ship_imaging_by_value()
    from whoosh_reloaded_spark.imaging import png_encode

    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf["media_id"]:
                d = int(mid)
                w = 8 * scale * (1 + d % 2)
                h = 8 * scale * (1 + (d // 2) % 2)
                y, x, c = np.indices((h, w, 3))
                arr = ((d * 7 + x * 5 + y * 3 + c * 11) % 256).astype(
                    "uint8"
                )
                ids.append(d)
                payloads.append(png_encode(arr, filter_type=d % 5))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return src.mapInPandas(gen, "media_id long, payload binary")


AUDIO_SCHEMA = (
    "media_id long, ok boolean, err string, sample_rate int, "
    "channels int, n_frames long, duration_ms long, sum_sq long, "
    "rms double, peak int, energy_hash string"
)


def decode_audio(
    df: DataFrame,
    id_col: str = "media_id",
    bin_col: str = "payload",
    batch_target_bytes: int = 64 << 20,
    n_windows: int = 16,
) -> DataFrame:
    """REAL audio decode over mapInPandas: RIFF/WAVE PCM parse
    (:mod:`whoosh_reloaded_spark.audio`) -> rate / channels / duration /
    integer sum-of-squares (the oracle-checkable decode invariant) /
    RMS / peak / windowed energy fingerprint per clip.  Same 100-TB
    shape as :func:`decode_images`: byte-budget repartition, per-row
    ok/err, nothing collected."""
    try:
        from pyspark import cloudpickle

        from whoosh_reloaded_spark import audio as _audio_mod

        if hasattr(cloudpickle, "register_pickle_by_value"):
            cloudpickle.register_pickle_by_value(_audio_mod)
    except Exception:
        pass
    from whoosh_reloaded_spark.audio import audio_features

    total = _estimate_total_bytes(df, bin_col)
    parts = max(1, int(total / batch_target_bytes))
    src = df.select(F.col(id_col).alias("media_id"), F.col(bin_col).alias("_p"))
    if parts > src.rdd.getNumPartitions():
        src = src.repartition(parts)

    cols = [
        "media_id", "ok", "err", "sample_rate", "channels", "n_frames",
        "duration_ms", "sum_sq", "rms", "peak", "energy_hash",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["_p"]):
                try:
                    f = audio_features(
                        bytes(payload) if payload is not None else b"",
                        n_windows,
                    )
                    rows.append(
                        {"media_id": mid, "ok": True, "err": None, **f}
                    )
                except Exception as e:
                    rows.append(
                        {
                            "media_id": mid,
                            "ok": False,
                            "err": f"{type(e).__name__}: {e}",
                            **{
                                k: None
                                for k in cols[3:]
                            },
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(run, AUDIO_SCHEMA)


def synthetic_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic PCM WAV per id (no external data): for id
    d — mono 16-bit, rate 8000*(1 + d%3), n = 800 + (d%5)*200 frames,
    sample[i] = ((d*13 + i*7) % 201) - 100.  The closed-form samples
    make duration/sum-of-squares recomputable without an audio library
    (the audio analogue of synthetic_media's pixel formula)."""
    import numpy as np

    try:
        from pyspark import cloudpickle

        from whoosh_reloaded_spark import audio as _audio_mod

        if hasattr(cloudpickle, "register_pickle_by_value"):
            cloudpickle.register_pickle_by_value(_audio_mod)
    except Exception:
        pass
    from whoosh_reloaded_spark.audio import wav_encode

    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf["media_id"]:
                d = int(mid)
                n = 800 + (d % 5) * 200
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 13 + i * 7) % 201) - 100
                ids.append(d)
                payloads.append(
                    wav_encode(samples, sample_rate=8000 * (1 + d % 3))
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return src.mapInPandas(gen, "media_id long, payload binary")


def sample_frames(df: DataFrame, every_nth: int = 2, id_col: str = "media_id",
                  frames_col: str = "n_frames") -> DataFrame:
    """Frame sampling plan: (media_id, frame_no) rows for every Nth frame —
    pure JVM explode, the downstream decode then targets only these."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col(frames_col) - 1, F.lit(0)), F.lit(every_nth)
            )
        ).alias("frame_no"),
    )


VIDEO_SCHEMA = (
    "media_id long, ok boolean, err string, n_frames int, width int, "
    "height int, fps double, frame_no int, pixel_sum long, ahash string"
)


def decode_video(
    df: DataFrame,
    id_col: str = "media_id",
    bin_col: str = "payload",
    every_nth: int = 2,
    max_frames: int = 0,
    batch_target_bytes: int = 64 << 20,
    hash_size: int = 8,
) -> DataFrame:
    """REAL video decode over mapInPandas: MJPEG/AVI container walk
    (:mod:`video` — RIFF chunk grammar) + per-sampled-frame baseline
    JPEG decode (:mod:`jpeg`), emitting one row per sampled frame with
    dims / pixel checksum / aHash.  Skipped frames are never decoded —
    at 100 TB the sampling rate is the dominant cost knob, so it must
    bind *before* the expensive step, not after.

    Same scale contract as :func:`decode_images`: byte-budgeted
    repartition before the heavy decode, everything executor-side, a
    corrupt container or frame becomes an ``ok=false`` row (one row per
    container when the container itself is bad)."""
    _ship_imaging_by_value()
    from whoosh_reloaded_spark.imaging import average_hash
    from whoosh_reloaded_spark.jpeg import jpeg_decode
    from whoosh_reloaded_spark.video import avi_info, avi_sample_frames

    total = _estimate_total_bytes(df, bin_col)
    parts = max(1, int(total / batch_target_bytes))
    src = df.select(F.col(id_col).alias("media_id"), F.col(bin_col).alias("_p"))
    if parts > src.rdd.getNumPartitions():
        src = src.repartition(parts)

    cols = [
        "media_id", "ok", "err", "n_frames", "width", "height", "fps",
        "frame_no", "pixel_sum", "ahash",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["_p"]):
                try:
                    data = bytes(payload) if payload is not None else b""
                    info = avi_info(data)
                    sampled = avi_sample_frames(data, every_nth, max_frames)
                    for fno, fbytes in sampled:
                        arr = jpeg_decode(fbytes)
                        h, w = arr.shape[:2]
                        rows.append({
                            "media_id": mid, "ok": True, "err": None,
                            "n_frames": info["n_frames"],
                            "width": w, "height": h, "fps": info["fps"],
                            "frame_no": fno,
                            "pixel_sum": int(arr.sum(dtype="int64")),
                            "ahash": average_hash(arr, hash_size),
                        })
                    if not sampled:
                        # valid container, no video frames (audio-only
                        # AVI): keep one-row-per-container accounting
                        rows.append({
                            "media_id": mid, "ok": True, "err": None,
                            "n_frames": info["n_frames"],
                            "width": None, "height": None,
                            "fps": info["fps"], "frame_no": None,
                            "pixel_sum": None, "ahash": None,
                        })
                except Exception as e:  # corrupt media is data at scale
                    rows.append({
                        "media_id": mid, "ok": False,
                        "err": f"{type(e).__name__}: {e}",
                        "n_frames": None, "width": None, "height": None,
                        "fps": None, "frame_no": None, "pixel_sum": None,
                        "ahash": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(run, VIDEO_SCHEMA)


def synthetic_video(df: DataFrame, id_col: str = "doc_id",
                    n_frames: int = 8, quality: int = 100) -> DataFrame:
    """Deterministic MJPEG/AVI fixtures: per doc_id, ``n_frames``
    uniform 16x16 frames whose shade ramps with the frame index,
    encoded with the real JPEG encoder into a real AVI container —
    executor-side, like :func:`synthetic_media`.  At the default
    quality=100 a uniform frame roundtrips bit-exact, so sampled-frame
    ``pixel_sum`` is the closed form ``256 * ((d*31 + f*16) % 256)``
    an SQL oracle can state."""
    _ship_imaging_by_value()
    import numpy as np

    from whoosh_reloaded_spark.jpeg import jpeg_encode
    from whoosh_reloaded_spark.video import avi_encode_mjpeg

    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf["media_id"]:
                d = int(mid)
                frames = []
                for f in range(n_frames):
                    shade = (d * 31 + f * 16) % 256
                    img = np.full((16, 16), shade, np.uint8)
                    frames.append(
                        jpeg_encode(img, quality=quality)
                    )
                ids.append(d)
                payloads.append(
                    avi_encode_mjpeg(frames, 16, 16, fps=10 + d % 5)
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return src.mapInPandas(gen, "media_id long, payload binary")
