"""Double Metaphone phonetic coding — Lawrence Philips's published algorithm
(Dr. Dobb's, June 2000), behavior-parity with the reference's Python port
(lang/dmetaphone.py, the Atkinson/Collins translation) including that port's
quirks, verified by the fuzz test in tests/test_dmetaphone.py:

* codes are NOT truncated to 4 characters (the port returns full codes);
* the port's ``next`` variable leaks across loop iterations in two G+H gaps
  (no assignment made), re-applying the PREVIOUS letter's action — kept via
  the REPEAT sentinel so e.g. 'high'/'weigh' code identically;
* a dead ``text[pos+1:pos+2] == "ER"`` comparison in the -ger- rule means
  that branch only fires on Y (a 1-char slice never equals 'ER') — kept.

Organized as per-letter handler methods on a stateful coder (structurally
unlike the port's single 300-statement function): each handler returns
(primary_add, secondary_add, advance) or REPEAT.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

_VOWELS = frozenset("AEIOUY")
_SLAVO = re.compile("W|K|CZ|WITZ")
_SILENT = re.compile("GN|KN|PN|WR|PS")

REPEAT = object()  # sentinel: reuse the previous action (port's stale `next`)


class _Coder:
    def __init__(self, word: str):
        up = word.upper()
        self.sg = bool(_SLAVO.search(up))
        self.n = len(up)
        self.s = "--" + up + "     "
        self.first = 2
        self.last = self.first + self.n - 1

    # -- tiny accessors -----------------------------------------------------

    def seg(self, a: int, b: int) -> str:
        return self.s[a:b]

    def ch(self, i: int) -> str:
        return self.s[i]

    # -- driver -------------------------------------------------------------

    def encode(self) -> Tuple[str, Optional[str]]:
        pos = self.first
        if _SILENT.match(self.s, pos):
            pos += 1
        primary = secondary = ""
        act = (None, None, 1)
        while pos < self.n + 2:
            c = self.s[pos]
            if c in _VOWELS:
                add = "A" if pos == self.first else None
                act = (add, add, 1)
            else:
                h = getattr(self, "h_" + c, None) if c.isalpha() else None
                if c == "\xc7":
                    act = ("S", "S", 1)
                elif c == "\xd1":
                    act = ("N", "N", 1)
                elif h is None:
                    act = (None, None, 1)
                else:
                    r = h(pos)
                    if r is not REPEAT:
                        act = r
            p_add, s_add, adv = act
            if p_add:
                primary += p_add
            if s_add:
                secondary += s_add
            pos += adv
        if primary == secondary:
            return primary, None
        return primary, secondary

    # -- per-letter handlers ------------------------------------------------

    def h_B(self, p):
        return ("P", "P", 2 if self.ch(p + 1) == "B" else 1)

    def h_C(self, p):
        s, f = self.s, self.first
        # germanic -ACH- with non-vowel two back ('bacher', 'macher')
        if (
            p > f + 1
            and s[p - 2] not in _VOWELS
            and self.seg(p - 1, p + 2) == "ACH"
            and (
                s[p + 2] not in "IE"
                or self.seg(p - 2, p + 4) in ("BACHER", "MACHER")
            )
        ):
            return ("K", "K", 2)
        if p == f and self.seg(f, f + 6) == "CAESAR":
            return ("S", "S", 2)
        if self.seg(p, p + 4) == "CHIA":  # 'chianti'
            return ("K", "K", 2)
        if self.seg(p, p + 2) == "CH":
            if p > f and self.seg(p, p + 4) == "CHAE":  # 'michael'
                return ("K", "X", 2)
            if (
                p == f
                and (
                    self.seg(p + 1, p + 6) in ("HARAC", "HARIS")
                    or self.seg(p + 1, p + 4) in ("HOR", "HYM", "HIA", "HEM")
                )
                and self.seg(f, f + 5) != "CHORE"
            ):
                return ("K", "K", 2)
            if (
                self.seg(f, f + 4) in ("VAN ", "VON ")
                or self.seg(f, f + 3) == "SCH"
                or self.seg(p - 2, p + 4) in ("ORCHES", "ARCHIT", "ORCHID")
                or s[p + 2] in "TS"
                or (
                    (s[p - 1] in "AOUE" or p == f)
                    and s[p + 2] in "LRNMBHFVW "
                )
            ):
                return ("K", "K", 1)
            if p > f:
                if self.seg(f, f + 2) == "MC":
                    return ("K", "K", 2)
                return ("X", "K", 2)
            return ("X", "X", 2)
        if self.seg(p, p + 2) == "CZ" and self.seg(p - 2, p + 2) != "WICZ":
            return ("S", "X", 2)  # 'czerny'
        if self.seg(p + 1, p + 4) == "CIA":  # 'focaccia'
            return ("X", "X", 3)
        if self.seg(p, p + 2) == "CC" and not (p == f + 1 and s[f] == "M"):
            # 'bellocchio' vs 'bacchus'
            if s[p + 2] in "IEH" and self.seg(p + 2, p + 4) != "HU":
                if (p == f + 1 and s[f] == "A") or self.seg(
                    p - 1, p + 4
                ) in ("UCCEE", "UCCES"):
                    return ("KS", "KS", 3)  # 'accident', 'succeed'
                return ("X", "X", 3)  # 'bacci'
            return ("K", "K", 2)
        if self.seg(p, p + 2) in ("CK", "CG", "CQ"):
            return ("K", "K", 2)
        if self.seg(p, p + 2) in ("CI", "CE", "CY"):
            if self.seg(p, p + 3) in ("CIO", "CIE", "CIA"):
                return ("S", "X", 2)
            return ("S", "S", 2)
        if self.seg(p + 1, p + 3) in (" C", " Q", " G"):  # 'mac caffrey'
            return ("K", "K", 3)
        if s[p + 1] in "CKQ" and self.seg(p + 1, p + 3) not in ("CE", "CI"):
            return ("K", "K", 2)
        return ("K", "K", 1)

    def h_D(self, p):
        if self.seg(p, p + 2) == "DG":
            if self.s[p + 2] in "IEY":  # 'edge'
                return ("J", "J", 3)
            return ("TK", "TK", 2)
        if self.seg(p, p + 2) in ("DT", "DD"):
            return ("T", "T", 2)
        return ("T", "T", 1)

    def h_F(self, p):
        return ("F", "F", 2 if self.ch(p + 1) == "F" else 1)

    def h_G(self, p):
        s, f = self.s, self.first
        if s[p + 1] == "H":
            if p > f and s[p - 1] not in _VOWELS:
                return ("K", "K", 2)
            if p < f + 3:
                if p == f:  # 'ghislane', 'ghiradelli'
                    if s[p + 2] == "I":
                        return ("J", "J", 2)
                    return ("K", "K", 2)
                return REPEAT  # port gap: `next` carries over
            if (
                (p > f + 1 and s[p - 2] in "BHD")
                or (p > f + 2 and s[p - 3] in "BHD")
                or (p > f + 3 and s[p - 4] in "BH")
            ):
                return (None, None, 2)  # Parker's rule, e.g. 'hugh'
            if p > f + 2 and s[p - 1] == "U" and s[p - 3] in "CGLRT":
                return ("F", "F", 2)  # 'laugh', 'cough', 'rough'
            if p > f and s[p - 1] != "I":
                return ("K", "K", 2)
            return REPEAT  # port gap: -IGH- carries the previous action
        if s[p + 1] == "N":
            if p == f + 1 and s[f] in _VOWELS and not self.sg:
                return ("KN", "N", 2)
            if (
                self.seg(p + 2, p + 4) != "EY"
                and s[p + 1] != "Y"
                and not self.sg
            ):
                return ("N", "KN", 2)
            return ("KN", "KN", 2)  # e.g. 'cagney'
        if self.seg(p + 1, p + 3) == "LI" and not self.sg:  # 'tagliaro'
            return ("KL", "L", 2)
        if p == f and (
            s[p + 1] == "Y"
            or self.seg(p + 1, p + 3)
            in ("ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI",
                "ER")
        ):
            return ("K", "J", 2)  # -ges-, -gep- ... at beginning
        if (
            (self.seg(p + 1, p + 2) == "ER" or s[p + 1] == "Y")
            and self.seg(f, f + 6) not in ("DANGER", "RANGER", "MANGER")
            and s[p - 1] not in "EI"
            and self.seg(p - 1, p + 2) not in ("RGY", "OGY")
        ):
            # NOTE: the 1-char slice=='ER' arm is dead (port parity)
            return ("K", "J", 2)
        if s[p + 1] in "EIY" or self.seg(p - 1, p + 3) in ("AGGI", "OGGI"):
            if (
                self.seg(f, f + 4) in ("VON ", "VAN ")
                or self.seg(f, f + 3) == "SCH"
                or self.seg(p + 1, p + 3) == "ET"
            ):
                return ("K", "K", 2)  # obvious germanic
            if self.seg(p + 1, p + 5) == "IER ":
                return ("J", "J", 2)  # french ending
            return ("J", "K", 2)  # 'biaggi'
        if s[p + 1] == "G":
            return ("K", "K", 2)
        return ("K", "K", 1)

    def h_H(self, p):
        s, f = self.s, self.first
        # keep only if word-initial before a vowel or between two vowels
        if (p == f or s[p - 1] in _VOWELS) and s[p + 1] in _VOWELS:
            return ("H", "H", 2)
        return (None, None, 1)

    def h_J(self, p):
        s, f = self.s, self.first
        adv = 2 if s[p + 1] == "J" else 1
        if self.seg(p, p + 4) == "JOSE" or self.seg(f, f + 4) == "SAN ":
            if (p == f and s[p + 4] == " ") or self.seg(f, f + 4) == "SAN ":
                return ("H", "H", adv)
            return ("J", "H", adv)
        if p == f and self.seg(p, p + 4) != "JOSE":
            return ("J", "A", adv)  # Yankelovich / Jankelowicz
        if s[p - 1] in _VOWELS and not self.sg and s[p + 1] in "AO":
            return ("J", "H", adv)  # spanish 'bajador'
        if p == self.last:
            return ("J", " ", adv)
        if s[p + 1] not in "LTKSNMBZ" and s[p - 1] not in "SKL":
            return ("J", "J", adv)
        return (None, None, adv)

    def h_K(self, p):
        return ("K", "K", 2 if self.ch(p + 1) == "K" else 1)

    def h_L(self, p):
        s, last = self.s, self.last
        if s[p + 1] == "L":
            # spanish 'cabrillo', 'gallegos'
            if (
                p == last - 2
                and self.seg(p - 1, p + 3) in ("ILLO", "ILLA", "ALLE")
            ) or (
                (self.seg(last - 1, last + 1) in ("AS", "OS")
                 or s[last] in "AO")
                and self.seg(p - 1, p + 3) == "ALLE"
            ):
                return ("L", "", 2)
            return ("L", "L", 2)
        return ("L", "L", 1)

    def h_M(self, p):
        s = self.s
        if (
            self.seg(p + 1, p + 4) == "UMB"
            and (p + 1 == self.last or self.seg(p + 2, p + 4) == "ER")
            or s[p + 1] == "M"
        ):
            return ("M", "M", 2)
        return ("M", "M", 1)

    def h_N(self, p):
        return ("N", "N", 2 if self.ch(p + 1) == "N" else 1)

    def h_P(self, p):
        c = self.ch(p + 1)
        if c == "H":
            return ("F", "F", 2)
        if c in "PB":  # 'campbell', 'raspberry'
            return ("P", "P", 2)
        return ("P", "P", 1)

    def h_Q(self, p):
        return ("K", "K", 2 if self.ch(p + 1) == "Q" else 1)

    def h_R(self, p):
        adv = 2 if self.ch(p + 1) == "R" else 1
        # french 'rogier' but not 'hochmeier'
        if (
            p == self.last
            and not self.sg
            and self.seg(p - 2, p) == "IE"
            and self.seg(p - 4, p - 2) not in ("ME", "MA")
        ):
            return ("", "R", adv)
        return ("R", "R", adv)

    def h_S(self, p):
        s, f, last = self.s, self.first, self.last
        if self.seg(p - 1, p + 2) in ("ISL", "YSL"):  # 'island', 'isle'
            return (None, None, 1)
        if p == f and self.seg(f, f + 5) == "SUGAR":
            return ("X", "S", 1)
        if self.seg(p, p + 2) == "SH":
            if self.seg(p + 1, p + 5) in ("HEIM", "HOEK", "HOLM", "HOLZ"):
                return ("S", "S", 2)  # germanic
            return ("X", "X", 2)
        if self.seg(p, p + 3) in ("SIO", "SIA") or self.seg(p, p + 4) == "SIAN":
            if not self.sg:
                return ("S", "X", 3)
            return ("S", "S", 3)
        if (p == f and s[p + 1] in "MNLW") or s[p + 1] == "Z":
            # 'smith' ~ 'schmidt'; slavic -sz-
            return ("S", "X", 2 if s[p + 1] == "Z" else 1)
        if self.seg(p, p + 2) == "SC":
            if s[p + 2] == "H":  # Schlesinger's rule
                if self.seg(p + 3, p + 5) in ("OO", "ER", "EN", "UY", "ED",
                                              "EM"):
                    if self.seg(p + 3, p + 5) in ("ER", "EN"):
                        return ("X", "SK", 3)  # 'schermerhorn'
                    return ("SK", "SK", 3)  # 'school'
                if p == f and s[f + 3] not in _VOWELS and s[f + 3] != "W":
                    return ("X", "S", 3)
                return ("X", "X", 3)
            if s[p + 2] in "IEY":
                return ("S", "S", 3)
            return ("SK", "SK", 3)
        if p == last and self.seg(p - 2, p) in ("AI", "OI"):
            return ("", "S", 1)  # french 'resnais', 'artois'
        return ("S", "S", 2 if s[p + 1] in "SZ" else 1)

    def h_T(self, p):
        s, f = self.s, self.first
        if self.seg(p, p + 4) == "TION":
            return ("X", "X", 3)
        if self.seg(p, p + 3) in ("TIA", "TCH"):
            return ("X", "X", 3)
        if self.seg(p, p + 2) == "TH" or self.seg(p, p + 3) == "TTH":
            if (
                self.seg(p + 2, p + 4) in ("OM", "AM")  # 'thomas', 'thames'
                or self.seg(f, f + 4) in ("VON ", "VAN ")
                or self.seg(f, f + 3) == "SCH"
            ):
                return ("T", "T", 2)
            return ("0", "T", 2)
        if s[p + 1] in "TD":
            return ("T", "T", 2)
        return ("T", "T", 1)

    def h_V(self, p):
        return ("F", "F", 2 if self.ch(p + 1) == "V" else 1)

    def h_W(self, p):
        s, f, last = self.s, self.first, self.last
        if self.seg(p, p + 2) == "WR":
            return ("R", "R", 2)
        if p == f and (s[p + 1] in _VOWELS or self.seg(p, p + 2) == "WH"):
            if s[p + 1] in _VOWELS:  # Wasserman ~ Vasserman
                return ("A", "F", 1)
            return ("A", "A", 1)
        if (
            (p == last and s[p - 1] in _VOWELS)  # Arnow ~ Arnoff
            or self.seg(p - 1, p + 5) in ("EWSKI", "EWSKY", "OWSKI", "OWSKY")
            or self.seg(f, f + 3) == "SCH"
        ):
            return ("", "F", 1)
        if self.seg(p, p + 4) in ("WICZ", "WITZ"):  # polish 'filipowicz'
            return ("TS", "FX", 4)
        return (None, None, 1)

    def h_X(self, p):
        adv = 2 if self.ch(p + 1) in "CX" else 1
        # french 'breaux': silent final X
        if p == self.last and (
            self.seg(p - 3, p) in ("IAU", "EAU")
            or self.seg(p - 2, p) in ("AU", "OU")
        ):
            return (None, None, adv)
        return ("KS", "KS", adv)

    def h_Z(self, p):
        s = self.s
        adv = 2 if s[p + 1] == "Z" else 1
        if s[p + 1] == "H":  # pinyin 'zhao'
            return ("J", "J", adv)
        if self.seg(p + 1, p + 3) in ("ZO", "ZI", "ZA") or (
            self.sg and p > self.first and s[p - 1] != "T"
        ):
            return ("S", "TS", adv)
        return ("S", "S", adv)


def double_metaphone(word: str) -> Tuple[str, Optional[str]]:
    """(primary, secondary) codes; secondary is None when identical."""
    return _Coder(word).encode()
