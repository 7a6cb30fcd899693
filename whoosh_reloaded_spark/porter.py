"""Porter stemming with behavior parity to the reference's variant.

The reference ships a regex-form Porter (lang/porter.py) whose measure
conditions treat every non-initial 'y' as a vowel and whose step-1b
adjustment rules only fire on whole-word matches (anchored `.match`) — both
departures from the canonical 1980 algorithm.  Since the goal is
rank-identical search against the reference, this module reproduces that
OBSERVABLE behavior (verified over ~7k vocabulary words in tests), written
as a table-driven step runner.

The measure/condition tests are the published regex formulation of Porter's
m-count: [C](VC)^m[V] with C=[^aeiouy]+, V=[aeiou]+ (y counts as a vowel in
single-char tests, as a consonant in runs).
"""

from __future__ import annotations

import re

_M_GT_0 = re.compile(r"^([^aeiouy]+)?[aeiou]+[^aeiouy]")
_M_EQ_1 = re.compile(r"^([^aeiouy]+)?[aeiou]+[^aeiouy]+([aeiou]+)?$")
_M_GT_1 = re.compile(r"^([^aeiouy]+)?[aeiou]+[^aeiouy]+[aeiou]+[^aeiouy]")
_HAS_VOWEL = re.compile(r"^([^aeiouy]+)?[aeiouy]")
_ENDS_CVC = re.compile(r"^[^aeiouy]+[aeiouy][^aeiouwxy]$")
_ED_ING = re.compile(r"^(.*)(ed|ing)$")
_DOUBLE2 = re.compile(r"^([^aeiouylsz])\1$")

_STEP2 = {
    "ational": "ate", "tional": "tion", "enci": "ence", "anci": "ance",
    "izer": "ize", "bli": "ble", "alli": "al", "entli": "ent", "eli": "e",
    "ousli": "ous", "ization": "ize", "ation": "ate", "ator": "ate",
    "alism": "al", "iveness": "ive", "fulness": "ful", "ousness": "ous",
    "aliti": "al", "iviti": "ive", "biliti": "ble", "logi": "log",
}
_STEP2_RE = re.compile(r"^(.+?)(%s)$" % "|".join(_STEP2))

_STEP3 = {
    "icate": "ic", "ative": "", "alize": "al", "iciti": "ic",
    "ical": "ic", "ful": "", "ness": "",
}
_STEP3_RE = re.compile(r"^(.+?)(%s)$" % "|".join(_STEP3))

_STEP4_RE = re.compile(
    r"^(.+?)(al|ance|ence|er|ic|able|ible|ant|ement|ment|ent|ou|ism|ate"
    r"|iti|ous|ive|ize)$"
)
_STEP4_ION_RE = re.compile(r"^(.+?)(s|t)(ion)$")
_STEP5_RE = re.compile(r"^(.+?)e$")


def stem(w: str) -> str:
    if len(w) < 3:
        return w
    y_first = w.startswith("y")
    if y_first:
        w = "Y" + w[1:]

    # 1a: plural stripping
    if w.endswith("s"):
        if w.endswith("sses") or w.endswith("ies"):
            w = w[:-2]
        elif w[-2] != "s":
            w = w[:-1]

    # 1b: -eed / -ed / -ing
    if w.endswith("eed"):
        if _M_GT_0.match(w[:-3]):
            w = w[:-1]
    else:
        m = _ED_ING.match(w)
        if m and _HAS_VOWEL.match(m.group(1)):
            w = m.group(1)
            if w in ("at", "bl", "iz"):
                w += "e"
            elif _DOUBLE2.match(w):
                w = w[:-1]
            elif _ENDS_CVC.match(w):
                w += "e"

    # 1c: -y -> -i
    if w.endswith("y") and _HAS_VOWEL.match(w[:-1]):
        w = w[:-1] + "i"

    # 2 and 3: suffix maps gated on m>0
    for rx, table in ((_STEP2_RE, _STEP2), (_STEP3_RE, _STEP3)):
        m = rx.match(w)
        if m and _M_GT_0.match(m.group(1)):
            w = m.group(1) + table[m.group(2)]

    # 4: bare suffix drop gated on m>1 (with the (s|t)ion special case)
    m = _STEP4_RE.match(w)
    if m:
        if _M_GT_1.match(m.group(1)):
            w = m.group(1)
    else:
        m = _STEP4_ION_RE.match(w)
        if m:
            st = m.group(1) + m.group(2)
            if _M_GT_1.match(st):
                w = st

    # 5a: trailing -e
    m = _STEP5_RE.match(w)
    if m:
        st = m.group(1)
        if _M_GT_1.match(st) or (_M_EQ_1.match(st) and not _ENDS_CVC.match(st)):
            w = st
    # 5b: -ll -> -l at m>1
    if w.endswith("ll") and _M_GT_1.match(w):
        w = w[:-1]

    if y_first:
        w = "y" + w[1:]
    return w
