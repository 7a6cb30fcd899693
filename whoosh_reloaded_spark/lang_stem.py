"""Lovins and Paice-Husk stemmers (reference lang/lovins.py,
lang/paicehusk.py — importable public API with zero callers/tests in
the reference, implemented here for complete surface parity).

Both mirror the REFERENCE'S OBSERVED behavior, quirks included, because
a user switching engines must get identical tokens:

- Lovins condition S (lovins.py:112-115) compares ``base[-2]`` (one
  char) against two-char strings, so its "after dr" branch is dead and
  "unless tt" never fires — S is effectively "ends with t"; mirrored.
- Paice-Husk protect rules (num=0, e.g. ``nee0.``) compute
  ``stem[:0-0]`` = '' (paicehusk.py:121) and WIPE the stem instead of
  protecting it ("seen" -> ""); chains like "classification" also end
  empty; mirrored (verified live).

Documented deviations (crash paths only): where the reference raises —
ValueError on aeiou-less words in Paice-Husk first_vowel
(paicehusk.py:67 ``min([])``; here y or end-of-word is the fallback
vowel position and stemming proceeds), IndexError on short bases in
Lovins conditions K/X (``base[-3]`` before the length check; here the
condition just fails) and on empty input (here returned unchanged).

Data tables are the published algorithm constants (Lovins 1968
Appendix A ending/condition list + transformation rules; Paice/Husk
1990 default rule set), serialized from the reference with a one-off
script into the compact layouts below.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

__all__ = ["lovins_stem", "paicehusk_stem", "PaiceHuskStemmer"]

# -- Lovins -------------------------------------------------------------------

# condition predicates (Lovins 1968; letter names match the paper).
# Quirk parity: S mirrors the reference's one-char comparison (see
# module docstring); K/X short-circuit the length guard instead of
# crashing (documented deviation).
_COND = {
    "A": lambda b: True,
    "B": lambda b: len(b) > 2,
    "C": lambda b: len(b) > 3,
    "D": lambda b: len(b) > 4,
    "E": lambda b: not b.endswith("e"),
    "F": lambda b: len(b) > 2 and not b.endswith("e"),
    "G": lambda b: len(b) > 2 and b.endswith("f"),
    "H": lambda b: b.endswith("t") or b.endswith("ll"),
    "I": lambda b: b[-1] not in "oe",
    "J": lambda b: b[-1] not in "ae",
    "K": lambda b: len(b) > 2
    and (b[-1] in "li" or (b.endswith("e") and b[-3] == "u")),
    "L": lambda b: b[-1] not in "ux" and (b[-1] != "s" or b.endswith("os")),
    "M": lambda b: b[-1] not in "acem",
    "N": lambda b: len(b) > 3 or (len(b) == 3 and b[-1] != "s"),
    "O": lambda b: b[-1] in "li",
    "P": lambda b: b[-1] != "c",
    "Q": lambda b: len(b) > 2 and b[-1] not in "ln",
    "R": lambda b: b[-1] in "nr",
    # reference S: base[-2] is ONE char, so 'rd'/'tt' never match
    "S": lambda b: b[-1] == "t",
    "T": lambda b: b[-1] == "s" or (b.endswith("t") and not b.endswith("ot")),
    "U": lambda b: b[-1] in "lmnr",
    "V": lambda b: b[-1] == "c",
    "W": lambda b: b[-1] not in "su",
    "X": lambda b: len(b) > 2
    and (b[-1] in "li" or (b.endswith("e") and b[-3] == "u")),
    "Y": lambda b: b.endswith("in"),
    "Z": lambda b: b[-1] != "f",
    "a": lambda b: b[-1] in "dflt"
    or b[-2:] in ("ph", "th", "er", "or", "es"),
    "b": lambda b: len(b) > 2
    and not (b.endswith("met") or b.endswith("ryst")),
    "c": lambda b: b[-1] == "l",
}

# ending:condition pairs, longest first (Lovins 1968 Appendix A)
_ENDINGS_DATA = """\
alistically:B arizability:A izationally:B antialness:A arisations:A arizations:A
entialness:A allically:C antaneous:A antiality:A arisation:A arization:A
ationally:B ativeness:A eableness:E entations:A entiality:A entialize:A
entiation:A ionalness:A istically:A itousness:A izability:A izational:A
ableness:A arizable:A entation:A entially:A eousness:A ibleness:A
icalness:A ionalism:A ionality:A ionalize:A iousness:A izations:A
lessness:A ability:A aically:A alistic:B alities:A ariness:E
aristic:A arizing:A ateness:A atingly:A ational:B atively:A
ativism:A elihood:E encible:A entally:A entials:A entiate:A
entness:A fulness:A ibility:A icalism:A icalist:A icality:A
icalize:A ication:G icianry:A ination:A ingness:A ionally:A
isation:A ishness:A istical:A iteness:A iveness:A ivistic:A
ivities:A ization:F izement:A oidally:A ousness:A aceous:A
acious:B action:G alness:A ancial:A ancies:A ancing:B
ariser:A arized:A arizer:A atable:A ations:B atives:A
eature:Z efully:A encies:A encing:A ential:A enting:C
entist:A eously:A ialist:A iality:A ialize:A ically:A
icance:A icians:A icists:A ifully:A ionals:A ionate:D
ioning:A ionist:A iously:A istics:A izable:E lessly:A
nesses:A oidism:A acies:A acity:A aging:B aical:A
alism:B alist:A ality:A alize:A allic:b anced:B
ances:B antic:C arial:A aries:A arily:A arity:B
arize:A aroid:A ately:A ating:I ation:B ative:A
ators:A atory:A ature:E early:Y ehood:A eless:A
elily:A ement:A enced:A ences:A eness:E ening:E
ental:A ented:C ently:A fully:A ially:A icant:A
ician:A icide:A icism:A icist:A icity:A idine:I
iedly:A ihood:A inate:A iness:A ingly:B inism:J
inity:c ional:A ioned:A ished:A istic:A ities:A
itous:A ively:A ivity:A izers:F izing:F oidal:A
oides:A otide:A ously:A able:A ably:A ages:B
ally:B ance:B ancy:B ants:B aric:A arly:K
ated:I ates:A atic:B ator:A ealy:Y edly:E
eful:A eity:A ence:A ency:A ened:E enly:E
eous:A hood:A ials:A ians:A ible:A ibly:A
ical:A ides:L iers:A iful:A ines:M ings:N
ions:B ious:A isms:B ists:A itic:H ized:F
izer:F less:A lily:A ness:A ogen:A ward:A
wise:A ying:B yish:A acy:A age:B aic:A
als:b ant:B ars:O ary:F ata:A ate:A
eal:Y ear:Y ely:E ene:E ent:C ery:E
ese:A ful:A ial:A ian:A ics:A ide:L
ied:A ier:A ies:P ily:A ine:M ing:N
ion:Q ish:C ism:B ist:A ite:a ity:A
ium:A ive:A ize:F oid:A one:R ous:A
's:A ae:A al:b ar:X as:B ed:E
en:F es:E ia:A ic:A is:A ly:B
on:S or:T s':A um:U us:V yl:R
a:A e:A i:A o:A s:W y:B
"""

_TRANSFORM_DATA = (('iev', 'ief'), ('uct', 'uc'), ('iev', 'ief'), ('uct', 'uc'), ('umpt', 'um'), ('rpt', 'rb'), ('urs', 'ur'), ('istr', 'ister'), ('metr', 'meter'), ('olv', 'olut'), ('ul', 'l', 'aoi'), ('bex', 'bic'), ('dex', 'dic'), ('pex', 'pic'), ('tex', 'tic'), ('ax', 'ac'), ('ex', 'ec'), ('ix', 'ic'), ('lux', 'luc'), ('uad', 'uas'), ('vad', 'vas'), ('cid', 'cis'), ('lid', 'lis'), ('erid', 'eris'), ('pand', 'pans'), ('end', 'ens', 's'), ('ond', 'ons'), ('lud', 'lus'), ('rud', 'rus'), ('her', 'hes', 'pt'), ('mit', 'mis'), ('ent', 'ens', 'm'), ('ert', 'ers'), ('et', 'es', 'n'), ('yt', 'ys'), ('yz', 'ys'))

# per-length lookup built from the flat table
_BY_LEN: Dict[int, Dict[str, str]] = {}
for _pair in _ENDINGS_DATA.split():
    _e, _c = _pair.split(":")
    _BY_LEN.setdefault(len(_e), {})[_e] = _c

_DOUBLES = ("dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt")

_TRANSFORM_BY_LAST: Dict[str, List[Tuple]] = {}
for _rule in _TRANSFORM_DATA:
    _TRANSFORM_BY_LAST.setdefault(_rule[0][-1], []).append(_rule)


def _lovins_remove(word: str) -> str:
    """Longest-match ending removal: lengths 11..1, base must keep >1
    chars, ending's condition must accept the base (lovins.py:491-503)."""
    n = len(word)
    for el in range(min(11, n - 2), 0, -1):
        table = _BY_LEN.get(el)
        if not table:
            continue
        cond = table.get(word[n - el:])
        if cond:
            base = word[: n - el]
            try:
                ok = _COND[cond](base)
            except IndexError:  # deviation: reference crashes here
                ok = False
            if ok:
                return base
    return word


def _lovins_fix(word: str) -> str:
    """Undouble + transformation rules (lovins.py:552-569): longest
    matching target with an optional except-after character set."""
    if word[-2:] in _DOUBLES:
        word = word[:-1]
    for rule in _TRANSFORM_BY_LAST.get(word[-1], ()):
        target, newend = rule[0], rule[1]
        if word.endswith(target):
            if len(rule) > 2 and len(word) > len(target):
                if word[-(len(target) + 1)] in rule[2]:
                    return word
            return word[: len(word) - len(target)] + newend
    return word


def lovins_stem(word: str) -> str:
    """Lovins stem of ``word`` (reference lang/lovins.py stem())."""
    if not word:
        return word  # deviation: reference IndexErrors on ""
    return _lovins_fix(_lovins_remove(word))


# -- Paice-Husk ---------------------------------------------------------------


class PaiceHuskStemmer:
    """Paice-Husk stemmer with a custom rule table (reference
    lang/paicehusk.py:21-130).  Rule syntax: reversed ending, optional
    ``*`` (intact only), digits to remove, optional append, ``.`` stop /
    ``>`` continue."""

    _RULE = re.compile(r"^(\w+)([*]?)(\d+)(\w*)([.>])")
    _PREFIXES = (
        "kilo", "micro", "milli", "intra", "ultra", "mega", "nano",
        "pico", "pseudo",
    )

    def __init__(self, ruletable: str):
        self.rules: Dict[str, List[Tuple[str, bool, int, str, bool]]] = {}
        for line in ruletable.splitlines():
            line = line.strip()
            if not line:
                continue
            m = self._RULE.match(line)
            if not m:
                raise ValueError(f"bad Paice-Husk rule: {line!r}")
            ending = m.group(1)[::-1]
            self.rules.setdefault(ending[-1], []).append(
                (
                    ending,
                    m.group(2) == "*",
                    int(m.group(3)),
                    m.group(4),
                    m.group(5) == ">",
                )
            )

    @staticmethod
    def _first_vowel(word: str) -> int:
        """Position of the first vowel; y after position 0 counts when
        it precedes every aeiou.  Deviation: aeiou-less words fall back
        to the y position (or the word length) and stem normally,
        instead of the reference's ValueError (paicehusk.py:67
        ``min([])``)."""
        positions = [p for p in (word.find(v) for v in "aeiou") if p > -1]
        vp = min(positions) if positions else len(word)
        yp = word.find("y")
        if 0 < yp < vp:
            return yp
        return vp

    def stem(self, word: str) -> str:
        m = re.match(r"^\w+", word)
        if not m:
            return word
        stem = m.group(0)
        for prefix in self._PREFIXES:
            if stem.startswith(prefix):
                stem = stem[len(prefix):]
                break
        intact = True
        running = True
        while running and stem:
            running = False
            pfv = self._first_vowel(stem)
            for ending, need_intact, num, append, cont in self.rules.get(
                stem[-1], ()
            ):
                if not stem.endswith(ending):
                    continue
                if need_intact and not intact:
                    continue
                newlen = len(stem) - num + len(append)
                # vowel-initial stems keep >=2 chars, consonant-initial
                # >=3 (Paice/Husk acceptability conditions)
                if (pfv == 0 and newlen < 2) or (pfv > 0 and newlen < 3):
                    continue
                intact = False
                # QUIRK PARITY (paicehusk.py:121): num=0 "protect" rules
                # compute stem[:0-0] = '' and WIPE the stem
                stem = (stem[:-num] if num else "") + append
                running = cont
                break
        return stem


# Paice/Husk 1990 default rule set (published algorithm data)
DEFAULT_RULES = """\
ai*2.
a*1.
bb1.
city3s.
ci2>
cn1t>
dd1.
dei3y>
deec2ss.
dee1.
de2>
dooh4>
e1>
feil1v.
fi2>
gni3>
gai3y.
ga2>
gg1.
ht*2.
hsiug5ct.
hsi3>
i*1.
i1y>
ji1d.
juf1s.
ju1d.
jo1d.
jeh1r.
jrev1t.
jsim2t.
jn1d.
j1s.
lbaifi6.
lbai4y.
lba3>
lbi3.
lib2l>
lc1.
lufi4y.
luf3>
lu2.
lai3>
lau3>
la2>
ll1.
mui3.
mu*2.
msi3>
mm1.
nois4j>
noix4ct.
noi3>
nai3>
na2>
nee0.
ne2>
nn1.
pihs4>
pp1.
re2>
rae0.
ra2.
ro2>
ru2>
rr1.
rt1>
rei3y>
sei3y>
sis2.
si2>
ssen4>
ss0.
suo3>
su*2.
s*1>
s0.
tacilp4y.
ta2>
tnem4>
tne3>
tna3>
tpir2b.
tpro2b.
tcud1.
tpmus2.
tpec2iv.
tulo2v.
tsis0.
tsi3>
tt1.
uqi3.
ugo1.
vis3j>
vie0.
vi2>
ylb1>
yli3y>
ylp0.
yl2>
ygo1.
yhp1.
ymo1.
ypo1.
yti3>
yte3>
ytl2.
yrtsi5.
yra3>
yro3>
yfi3.
ycn2t>
yca3>
zi2>
zy1s.
"""

_default = PaiceHuskStemmer(DEFAULT_RULES)


def paicehusk_stem(word: str) -> str:
    """Paice-Husk stem with the default rule set (reference
    lang/paicehusk.py stem())."""
    return _default.stem(word)
