"""Charset folding maps — byte-identical to the reference's CharsetFilter
inputs (analysis/filters.py:365-416, support/charset.py).

Two public tables, decoded from charset_data.py:

- ``default_charmap()``: the Sphinx charset_table resolved to the exact
  ``str.translate`` dict ``charset_table_to_dict(default_charset)``
  produces in the reference (codepoints absent from the dict pass through
  ``str.translate`` unchanged, same as the reference).
- ``accent_charmap()``: Carlos Bueno's accent-folding map (the
  ``accent_map`` object the reference documents for CharsetFilter).

``fold_text(text, charmap)`` is the CharsetFilter operation itself:
``text.translate(charmap)``.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Optional

from whoosh_reloaded_spark.charset_data import (
    ACCENT_MAP_PAIRS,
    DEFAULT_TABLE_RLE,
)


@lru_cache(maxsize=1)
def default_charmap() -> Dict[int, Optional[str]]:
    """The resolved Sphinx default charset table (RLE-decoded)."""
    out: Dict[int, Optional[str]] = {}
    for line in DEFAULT_TABLE_RLE.splitlines():
        if not line:
            continue
        mode, a, b, d = line.split(",")
        a, b, d = int(a, 16), int(b, 16), int(d, 16)
        if mode == "i":
            for off in range(b - a + 1):
                out[a + off] = chr(d + off)
        else:
            for src in range(a, b + 1):
                out[src] = chr(d)
    return out


@lru_cache(maxsize=1)
def accent_charmap() -> Dict[int, str]:
    out: Dict[int, str] = {}
    for line in ACCENT_MAP_PAIRS.splitlines():
        if not line:
            continue
        k, v = line.split(" ")
        out[int(k, 16)] = v
    return out


def fold_text(text: str, charmap: Dict[int, Optional[str]]) -> str:
    """CharsetFilter.__call__ body (filters.py:411-416)."""
    return text.translate(charmap)
