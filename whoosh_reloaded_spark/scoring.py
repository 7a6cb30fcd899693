"""Weighting models as vectorized Spark column expressions.

The reference's WeightingModel/Scorer protocol (src/whoosh/scoring.py) pulls a
score per posting from a Python iterator; here every model is a factory that
returns a single Column expression evaluated inside whole-stage codegen over
the (query-term × posting) frame — no per-row Python.

Replicated formulas (behavior parity, re-derived from the published BM25/DFR
literature and verified against the reference's tests):

- idf = log(N / (df + 1)) + 1                    (ref scoring.py:51-57)
- BM25: idf * (w*(K1+1)) / (w + K1*((1-B) + B*fl/avgfl))
                                                 (ref scoring.py:264-271)
  with B=0.75, K1=1.2 defaults (scoring.py:277), fl = BYTE-DECODED doc field
  length (lossy quantization — lengths.py), avgfl = exact total/doccount
  (searching.py:277-280).
- TF_IDF: w * idf                                (ref scoring.py:459-484)
- Frequency: w                                   (ref scoring.py:453-456)
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict

from pyspark.sql import Column
from pyspark.sql import functions as F

from whoosh_reloaded_spark.lengths import byte_to_length_expr


def idf_value(doc_count: int, df: int) -> float:
    """Driver-side idf (cached per searcher like searching.py:334-351)."""
    return math.log(doc_count / (df + 1)) + 1.0


@dataclass
class BM25F:
    """Default weighting (ref scoring.py:274-329). ``quantized=False`` scores
    with exact lengths — used for SQL-oracle cross-checks, NOT for
    whoosh-parity (which requires the byte-decoded lengths)."""

    B: float = 0.75
    K1: float = 1.2
    quantized: bool = True
    field_B: Dict[str, float] = None  # per-field B overrides (<field>_B)

    def score_col(
        self,
        weight: Column,
        len_byte: Column,
        length: Column,
        idf: Column,
        avgfl: float,
        fieldname: str = "text",
    ) -> Column:
        B = (self.field_B or {}).get(fieldname, self.B)
        K1 = self.K1
        fl = byte_to_length_expr(len_byte) if self.quantized else length.cast("double")
        w = weight
        return idf * (
            (w * (K1 + 1.0)) / (w + K1 * ((1.0 - B) + B * fl / F.lit(avgfl)))
        )


@dataclass
class TF_IDF:
    quantized: bool = True  # unused; uniform interface

    def score_col(self, weight, len_byte, length, idf, avgfl, fieldname="text"):
        return weight * idf


@dataclass
class Frequency:
    quantized: bool = True

    def score_col(self, weight, len_byte, length, idf, avgfl, fieldname="text"):
        return weight.cast("double")
