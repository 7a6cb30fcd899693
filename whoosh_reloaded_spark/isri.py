"""ISRI Arabic stemmer (reference lang/isri.py — the NLTK port of
Taghva, Elkhoury & Coombs 2005, "Arabic Stemming without a root
dictionary" — importable public API with zero callers/tests in the
reference; implemented here for complete surface parity).

A functional rewrite (stem value threaded through pure helpers instead
of the reference's mutable ``self.stm``), mirroring the reference's
OBSERVED behavior exactly, including its quirks:

- ``pre32``/``suf32`` (isri.py:241-264) nest the 2-char check inside
  the 3-char loop's ``elif``, so the effective order is: first 3-char
  affix ONLY, then all 2-char affixes, then the remaining 3-char
  affixes; mirrored.
- ``pro_w64`` (isri.py:428) tests ``(stm[0] and stm[4]) == alef`` —
  ``and`` returns ``stm[4]``, so only position 4 is actually checked;
  mirrored.
- hamza normalization runs AFTER affix stripping and only on the
  initial character (the reference's documented deviation from the
  published algorithm); diacritic stripping runs before the stop-word
  check.

Affix/pattern/stop-word tables are the published algorithm data,
serialized from the reference with a one-off script.
"""

from __future__ import annotations

import re

__all__ = ["isri_stem", "ISRIStemmer"]

P3 = ('كال', 'بال', 'ولل', 'وال')
P2 = ('ال', 'لل')
P1 = ('ل', 'ب', 'ف', 'س', 'و', 'ي', 'ت', 'ن', 'ا')
S3 = ('تمل', 'همل', 'تان', 'تين', 'كمل')
S2 = ('ون', 'ات', 'ان', 'ين', 'تن', 'كم', 'هن', 'نا', 'يا', 'ها', 'تم', 'كن', 'ني', 'وا', 'ما', 'هم')
S1 = ('ة', 'ه', 'ي', 'ك', 'ت', 'ا', 'ن')
PR4 = ('م', 'ا', 'اوي', 'ة')
PR53 = ('ات', 'ايو', 'اتم', 'ميت', 'مت', 'او', 'ام')
STOP_WORDS = frozenset( ('يكون', 'وليس', 'وكان', 'كذلك', 'التي', 'وبين', 'عليها', 'مساء', 'الذي', 'وكانت', 'ولكن', 'والتي', 'تكون', 'اليوم', 'اللذين', 'عليه', 'كانت', 'لذلك', 'أمام', 'هناك', 'منها', 'مازال', 'لازال', 'لايزال', 'مايزال', 'اصبح', 'أصبح', 'أمسى', 'امسى', 'أضحى', 'اضحى', 'مابرح', 'مافتئ', 'ماانفك', 'لاسيما', 'ولايزال', 'الحالي', 'اليها', 'الذين', 'فانه', 'والذي', 'وهذا', 'لهذا', 'فكان', 'ستكون', 'اليه', 'يمكن', 'بهذا', 'الذى') )
RE_SHORT_VOWELS = '[ً-ْ]'
RE_INITIAL_HAMZA = '^[آأإ]'

_ALEF = "ا"
_TEH_MARBUTA = "ة"
_RE_SHORT_VOWELS = re.compile(RE_SHORT_VOWELS)
_RE_INITIAL_HAMZA = re.compile(RE_INITIAL_HAMZA)


def _pre32(w: str) -> str:
    """3- then 2-char prefixes, with the reference's interleaved order
    (first p3 entry, then p2, then remaining p3 entries)."""
    if len(w) >= 6:
        if w.startswith(P3[0]):
            return w[3:]
        for p2 in P2:  # len(w) >= 5 implied
            if w.startswith(p2):
                return w[2:]
        for p3 in P3[1:]:
            if w.startswith(p3):
                return w[3:]
    # words shorter than 6 keep their prefixes (the reference's outer
    # len >= 6 guard)
    return w


def _suf32(w: str) -> str:
    if len(w) >= 6:
        if w.endswith(S3[0]):
            return w[:-3]
        for s2 in S2:
            if w.endswith(s2):
                return w[:-2]
        for s3 in S3[1:]:
            if w.endswith(s3):
                return w[:-3]
    return w


def _waw(w: str) -> str:
    if len(w) >= 4 and w.startswith("وو"):
        return w[1:]
    return w


def _suf1(w: str) -> str:
    for s1 in S1:
        if w.endswith(s1):
            return w[:-1]
    return w


def _pre1(w: str) -> str:
    for p1 in P1:
        if w.startswith(p1):
            return w[1:]
    return w


def _pro_w4(w: str) -> str:
    if w[0] in PR4[0]:
        return w[1:]
    if w[1] in PR4[1]:
        return w[0] + w[2:]
    if w[2] in PR4[2]:
        return w[:2] + w[3]
    if w[3] in PR4[3]:
        return w[:-1]
    w = _suf1(w)
    if len(w) == 4:
        w = _pre1(w)
    return w


# length-5 -> 3-root patterns: (checks, extraction) where checks are
# (position, membership-string) pairs and extraction lists the kept
# positions (isri.py:293-358 branch order preserved)
_W53_RULES = (
    (((2, PR53[0]), (0, _ALEF)), (1, 3, 4)),
    (((3, PR53[1]), (0, "م")), (1, 2, 4)),
    (((0, PR53[2]), (4, _TEH_MARBUTA)), (1, 2, 3)),
    (((0, PR53[3]), (2, "ت")), (1, 3, 4)),
    (((0, PR53[4]), (2, _ALEF)), (1, 3, 4)),
    (((2, PR53[5]), (4, _TEH_MARBUTA)), (0, 1, 3)),
    (((0, PR53[6]), (1, "ن")), (2, 3, 4)),
    (((3, _ALEF), (0, _ALEF)), (1, 2, 4)),
    (((4, "ن"), (3, _ALEF)), (0, 1, 2)),
    (((3, "ي"), (0, "ت")), (1, 2, 4)),
    (((3, "و"), (1, _ALEF)), (0, 2, 4)),
    (((2, _ALEF), (1, "و")), (0, 3, 4)),
    (((3, "ئ"), (2, _ALEF)), (0, 1, 4)),
    (((4, _TEH_MARBUTA), (1, _ALEF)), (0, 2, 3)),
    (((4, "ي"), (2, _ALEF)), (0, 1, 3)),
)


def _pro_w53(w: str) -> str:
    for checks, keep in _W53_RULES:
        if all(w[p] in s for p, s in checks):
            return "".join(w[i] for i in keep)
    w = _suf1(w)
    if len(w) == 5:
        w = _pre1(w)
    return w


def _pro_w54(w: str) -> str:
    if w[0] in PR53[2]:
        return w[1:]
    if w[4] == _TEH_MARBUTA:
        return w[:4]
    if w[2] == _ALEF:
        return w[:2] + w[3:]
    return w


def _end_w5(w: str) -> str:
    if len(w) == 4:
        return _pro_w4(w)
    if len(w) == 5:
        return _pro_w54(w)
    return w


def _pro_w6(w: str) -> str:
    if w.startswith("است") or w.startswith(
        "مست"
    ):
        return w[3:]
    if w[0] == "م" and w[3] == _ALEF and w[5] == _TEH_MARBUTA:
        return w[1:3] + w[4]
    if w[0] == _ALEF and w[2] == "ت" and w[4] == _ALEF:
        return w[1] + w[3] + w[5]
    if w[0] == _ALEF and w[3] == "و" and w[2] == w[4]:
        return w[1] + w[4:]
    if w[0] == "ت" and w[2] == _ALEF and w[4] == "ي":
        return w[1] + w[3] + w[5]
    w = _suf1(w)
    if len(w) == 6:
        w = _pre1(w)
    return w


def _pro_w64(w: str) -> str:
    # QUIRK PARITY (isri.py:428): `(stm[0] and stm[4]) == alef` only
    # checks position 4
    if w[4] == _ALEF:
        return w[1:4] + w[5]
    if w.startswith("مت"):
        return w[2:]
    return w


def _end_w6(w: str) -> str:
    if len(w) == 5:
        return _end_w5(_pro_w53(w))
    if len(w) == 6:
        return _pro_w64(w)
    return w


def isri_stem(token: str) -> str:
    """Arabic root of ``token`` (reference isri.py stem())."""
    w = _RE_SHORT_VOWELS.sub("", token)
    if w in STOP_WORDS:
        return w
    w = _pre32(w)
    w = _suf32(w)
    w = _waw(w)
    w = _RE_INITIAL_HAMZA.sub(_ALEF, w)
    if len(w) <= 3:
        return w
    if len(w) == 4:
        return _pro_w4(w)
    if len(w) == 5:
        return _end_w5(_pro_w53(w))
    if len(w) == 6:
        return _end_w6(_pro_w6(w))
    if len(w) == 7:
        w = _suf1(w)
        if len(w) == 7:
            w = _pre1(w)
        if len(w) == 6:
            return _end_w6(_pro_w6(w))
    return w


class ISRIStemmer:
    """Class facade matching the reference's API shape."""

    def stem(self, token: str) -> str:
        return isri_stem(token)
