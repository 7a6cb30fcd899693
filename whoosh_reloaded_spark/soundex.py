"""Quasi-phonetic encoders (reference lang/phonetic.py): English
soundex, Sebastian Ferreyra's Spanish coder, and Tammam Koujan's Arabic
soundex — the last uncovered importable reference module.

Observed-behavior parity, quirks mirrored:

- ``soundex_ar`` skips appending a non-Arabic character's code but
  REMEMBERS it as ``prevcode`` only when the char is in the table; a
  char outside the table reuses the previous iteration's ``code``
  value for dedup purposes (phonetic.py:108-116 leaves ``code``
  unassigned), so e.g. a digit between two identical consonants does
  NOT split them; mirrored by carrying ``code`` across iterations.

Documented deviations (crash paths only): the reference raises
TypeError when ``soundex_en`` gets a word with no a-z characters
(``fc`` stays None), IndexError/UnboundLocalError when ``soundex_ar``
gets an empty word or a word whose second character is non-Arabic
before any Arabic one — these return ``""``/the partial code instead.
"""

from __future__ import annotations

import re

__all__ = ["soundex_en", "soundex_esp", "soundex_ar"]

_EN_CODES = "01230120022455012623010202"


def soundex_en(word: str) -> str:
    """Classic soundex over a-z (phonetic.py:13-33): first letter +
    deduplicated consonant codes (zeros kept, like the reference)."""
    out = []
    first = None
    prev = None
    for ch in word.lower():
        o = ord(ch)
        if 97 <= o <= 122:
            if first is None:
                first = ch
            code = _EN_CODES[o - 97]
            if code != prev:
                out.append(code)
            prev = code
    if first is None:
        return ""  # deviation: reference TypeErrors on no-alpha words
    return first + "".join(out)[1:]


_ESP_CODES = tuple(
    (re.compile(pat), repl)
    for pat, repl in (
        (r"\Aw?[uh]?([aeiou])", ""),
        (r"c[eiéí]|z|ll|sh|ch|sch|cc|y[aeiouáéíóú]|ps|bs|x|j|g[eiéí]", "s"),
        (r"[aeiouhwáéíóúü]+", ""),
        (r"y", ""),
        (r"ñ|gn", "n"),
        (r"[dpc]t", "t"),
        (r"c[aouáóú]|ck|q", "k"),
        (r"v", "b"),
        (r"d$", "t"),
    )
)


def soundex_esp(word: str) -> str:
    """Spanish quasi-phonetic coder (phonetic.py:55-77): longest-rule
    scanner with duplicate-code suppression."""
    word = word.lower()
    out = []
    prev = None
    i = 0
    n = len(word)
    while i < n:
        code = None
        for expr, ecode in _ESP_CODES:
            m = expr.match(word, i)
            if m:
                i = m.end()
                code = ecode
                break
        if code is None:
            code = word[i]
            i += 1
        if code != prev:
            out.append(code)
        prev = code
    return "".join(out)


_AR_CODES = {}
for _chars, _code in (
    ("اأإآحخهعغشوي", "0"),
    ("فب", "1"),
    ("جزسصظقك", "2"),
    ("تثدذضط", "3"),
    ("ل", "4"),
    ("من", "5"),
    ("ر", "6"),
):
    for _ch in _chars:
        _AR_CODES[_ch] = _code


def soundex_ar(word: str) -> str:
    """Arabic soundex (phonetic.py:100-116): drop a leading alef form,
    discard the first remaining character, append deduplicated
    non-vowel codes onto a leading '0'."""
    if not word:
        return ""  # deviation: reference IndexErrors
    if word[0] in "اأإآ":
        word = word[1:]
    out = ["0"]
    prev = "0"
    code = None
    if len(word) > 1:
        for ch in word[1:]:
            if ch in _AR_CODES:
                code = _AR_CODES[ch]
            elif code is None:
                # deviation: reference UnboundLocalErrors when the
                # first examined char is non-Arabic; skip it instead
                continue
            if code != prev:
                if code != "0":
                    out.append(code)
            prev = code
    return "".join(out)
