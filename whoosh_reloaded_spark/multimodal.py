"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100-TB training-data pipeline carries media as `binary` columns with
structured metadata; the Spark-side plumbing — schemas, Arrow batch shape,
partition sizing — is real here, while the codec step itself is STUBBED
(image/audio libraries are not in this container): `decode_fn=None` uses a
deterministic fake decoder so the pipeline is testable end-to-end, and a
real decoder drops in without touching the plumbing.

Patterns:
- mapInPandas for decode/feature-extract (streaming batches, bounded
  memory per task, media bytes never collected to the driver)
- metadata extraction stays JVM-side (length, magic-byte sniffing)
- repartition by byte-size budget before heavy decode so one task's batch
  fits executor memory
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
    kind = (
        F.when(magic.startswith("89504E47"), "png")
        .when(magic.startswith("FFD8"), "jpeg")
        .when(magic.startswith("52494646"), "riff")
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
    """Deterministic stand-in for a real image/audio decoder.

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
    decode = decode_fn or _fake_decode

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
