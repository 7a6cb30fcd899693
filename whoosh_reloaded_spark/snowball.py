"""Snowball stemmers for all 13 of the reference's snowball languages
(de es fr it pt ru da no sv nl fi hu ro).

Martin Porter's published Snowball algorithms
(https://snowball.tartarus.org/algorithms/{german,spanish,french}/stemmer.html),
implemented as plain functions for use inside executor closures.  The
reference ships the NLTK translation of the same algorithms
(lang/snowball/*.py — Apache-2.0 NLTK port); for
token-stream parity we replicate that port's OBSERVABLE behavior, including
its documented quirks where it deviates from the pure spec:

- region tests that use substring containment (``suffix in r2``) instead of
  endswith (French step 1, reference french.py:195-340);
- ``str.replace`` rewrites that touch the FIRST occurrence (Spanish
  logía/ución/encia, reference spanish.py:322-331);
- sequential in-place vowel-protection loops whose later iterations see
  earlier replacements (German/French pre-passes);
- the French step-4 ``rv[-4]`` probe is length-guarded here; the port
  raises IndexError on degenerate short RVs — the only intentional
  divergence (a crash is not a behavior worth preserving).

Parity is enforced by fuzz tests against the reference stemmers
(tests/test_language_analyzers.py).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# German — snowball.tartarus.org/algorithms/german/stemmer.html
# ---------------------------------------------------------------------------

_DE_VOWELS = "aeiouy\xe4\xf6\xfc"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"
_DE_STEP1 = ("ern", "em", "er", "en", "es", "e", "s")
_DE_STEP2 = ("est", "en", "er", "st")
_DE_STEP3 = ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik")


def _r1r2(word: str, vowels: str):
    """Standard R1/R2 regions (snowball.tartarus.org/texts/r1r2.html)."""
    r1 = ""
    r2 = ""
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = word[i + 1:]
            break
    for i in range(1, len(r1)):
        if r1[i] not in vowels and r1[i - 1] in vowels:
            r2 = r1[i + 1:]
            break
    return r1, r2


def stem_de(word: str) -> str:
    vowels = _DE_VOWELS
    word = word.lower().replace("\xdf", "ss")
    # protect u/y between vowels; sequential updates are visible to later
    # iterations (port behavior)
    for i in range(1, len(word) - 1):
        if word[i - 1] in vowels and word[i + 1] in vowels:
            if word[i] == "u":
                word = word[:i] + "U" + word[i + 1:]
            elif word[i] == "y":
                word = word[:i] + "Y" + word[i + 1:]

    r1, r2 = _r1r2(word, vowels)
    # R1 must leave >= 3 chars before it
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            if 0 < len(word[: i + 1]) < 3:
                r1 = word[3:]
            break

    for suffix in _DE_STEP1:
        if r1.endswith(suffix):
            n = len(suffix)
            if suffix in ("en", "es", "e") and word[-n - 4: -n] == "niss":
                word, r1, r2 = word[: -n - 1], r1[: -n - 1], r2[: -n - 1]
            elif suffix == "s":
                if word[-2] in _DE_S_END:
                    word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
            else:
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    for suffix in _DE_STEP2:
        if r1.endswith(suffix):
            if suffix == "st":
                if word[-3] in _DE_ST_END and len(word[:-3]) >= 3:
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            else:
                n = len(suffix)
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    for suffix in _DE_STEP3:
        if r2.endswith(suffix):
            n = len(suffix)
            if suffix in ("end", "ung"):
                if "ig" in r2[-n - 2: -n] and "e" not in r2[-n - 3: -n - 2]:
                    word = word[: -n - 2]
                else:
                    word = word[:-n]
            elif suffix in ("ig", "ik", "isch"):
                if "e" not in r2[-n - 1: -n]:
                    word = word[:-n]
            elif suffix in ("lich", "heit"):
                if "er" in r1[-n - 2: -n] or "en" in r1[-n - 2: -n]:
                    word = word[: -n - 2]
                else:
                    word = word[:-n]
            elif suffix == "keit":
                if "lich" in r2[-n - 4: -n]:
                    word = word[: -n - 4]
                elif "ig" in r2[-n - 2: -n]:
                    word = word[: -n - 2]
                else:
                    word = word[:-n]
            break

    return (
        word.replace("\xe4", "a").replace("\xf6", "o").replace("\xfc", "u")
        .replace("U", "u").replace("Y", "y")
    )


# ---------------------------------------------------------------------------
# Spanish — snowball.tartarus.org/algorithms/spanish/stemmer.html
# ---------------------------------------------------------------------------

_ES_VOWELS = "aeiou\xe1\xe9\xed\xf3\xfa\xfc"
_ES_STEP0 = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)
_ES_STEP1 = (
    "amientos", "imientos", "amiento", "imiento", "aciones", "uciones",
    "adoras", "adores", "ancias", "log\xedas", "encias", "amente",
    "idades", "anzas", "ismos", "ables", "ibles", "istas", "adora",
    "aci\xf3n", "antes", "ancia", "log\xeda", "uci\xf3n", "encia",
    "mente", "anza", "icos", "icas", "ismo", "able", "ible", "ista",
    "osos", "osas", "ador", "ante", "idad", "ivas", "ivos", "ico",
    "ica", "oso", "osa", "iva", "ivo",
)
_ES_STEP2A = (
    "yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
    "ya", "ye", "yo", "y\xf3",
)
_ES_STEP2B = (
    "ar\xedamos", "er\xedamos", "ir\xedamos", "i\xe9ramos", "i\xe9semos",
    "ar\xedais", "aremos", "er\xedais", "eremos", "ir\xedais", "iremos",
    "ierais", "ieseis", "asteis", "isteis", "\xe1bamos", "\xe1ramos",
    "\xe1semos", "ar\xedan", "ar\xedas", "ar\xe9is", "er\xedan",
    "er\xedas", "er\xe9is", "ir\xedan", "ir\xedas", "ir\xe9is",
    "ieran", "iesen", "ieron", "iendo", "ieras", "ieses", "abais",
    "arais", "aseis", "\xe9amos", "ar\xe1n", "ar\xe1s", "ar\xeda",
    "er\xe1n", "er\xe1s", "er\xeda", "ir\xe1n", "ir\xe1s", "ir\xeda",
    "iera", "iese", "aste", "iste", "aban", "aran", "asen", "aron",
    "ando", "abas", "adas", "idas", "aras", "ases", "\xedais", "ados",
    "idos", "amos", "imos", "emos", "ar\xe1", "ar\xe9", "er\xe1",
    "er\xe9", "ir\xe1", "ir\xe9", "aba", "ada", "ida", "ara", "ase",
    "\xedan", "ado", "ido", "\xedas", "\xe1is", "\xe9is", "\xeda",
    "ad", "ed", "id", "an", "i\xf3", "ar", "er", "ir", "as", "\xeds",
    "en", "es",
)
_ES_STEP3 = ("os", "a", "e", "o", "\xe1", "\xe9", "\xed", "\xf3")


def _rv_standard(word: str, vowels: str) -> str:
    """RV per the NLTK port (bases.py:96-133) — NOTE the ``word[:2] in
    vowels`` branch is a SUBSTRING test of the vowel string, a port quirk
    replicated for parity (the spec says "first two letters are vowels")."""
    rv = ""
    if len(word) >= 2:
        if word[1] not in vowels:
            for i in range(2, len(word)):
                if word[i] in vowels:
                    rv = word[i + 1:]
                    break
        elif word[:2] in vowels:
            for i in range(2, len(word)):
                if word[i] not in vowels:
                    rv = word[i + 1:]
                    break
        else:
            rv = word[3:]
    return rv


def _deaccent_es(s: str) -> str:
    return (
        s.replace("\xe1", "a").replace("\xe9", "e").replace("\xed", "i")
    )


def stem_es(word: str) -> str:
    vowels = _ES_VOWELS
    word = word.lower()
    step1_success = False
    r1, r2 = _r1r2(word, vowels)
    rv = _rv_standard(word, vowels)

    # STEP 0: attached pronoun
    for suffix in _ES_STEP0:
        if word.endswith(suffix):
            n = len(suffix)
            if rv.endswith(suffix):
                if rv[:-n].endswith(
                    ("i\xe9ndo", "\xe1ndo", "\xe1r", "\xe9r", "\xedr")
                ):
                    word = _deaccent_es(word[:-n])
                    r1 = _deaccent_es(r1[:-n])
                    r2 = _deaccent_es(r2[:-n])
                    rv = _deaccent_es(rv[:-n])
                elif rv[:-n].endswith(("ando", "iendo", "ar", "er", "ir")):
                    word, r1, r2, rv = word[:-n], r1[:-n], r2[:-n], rv[:-n]
                elif rv[:-n].endswith("yendo") and word[:-n].endswith("uyendo"):
                    word, r1, r2, rv = word[:-n], r1[:-n], r2[:-n], rv[:-n]
            break

    # STEP 1: standard suffixes
    for suffix in _ES_STEP1:
        if word.endswith(suffix):
            n = len(suffix)
            if suffix == "amente" and r1.endswith(suffix):
                step1_success = True
                word, r2, rv = word[:-6], r2[:-6], rv[:-6]
                if r2.endswith("iv"):
                    word, r2, rv = word[:-2], r2[:-2], rv[:-2]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                elif r2.endswith(("os", "ic", "ad")):
                    word, rv = word[:-2], rv[:-2]
            elif r2.endswith(suffix):
                step1_success = True
                if suffix in (
                    "adora", "ador", "aci\xf3n", "adoras", "adores",
                    "aciones", "ante", "antes", "ancia", "ancias",
                ):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith("ic"):
                        word, rv = word[:-2], rv[:-2]
                elif suffix in ("log\xeda", "log\xedas"):
                    # first-occurrence replace: port quirk
                    word = word.replace(suffix, "log")
                    rv = rv.replace(suffix, "log")
                elif suffix in ("uci\xf3n", "uciones"):
                    word = word.replace(suffix, "u")
                    rv = rv.replace(suffix, "u")
                elif suffix in ("encia", "encias"):
                    word = word.replace(suffix, "ente")
                    rv = rv.replace(suffix, "ente")
                elif suffix == "mente":
                    word, r2, rv = word[:-5], r2[:-5], rv[:-5]
                    if r2.endswith(("ante", "able", "ible")):
                        word, rv = word[:-4], rv[:-4]
                elif suffix in ("idad", "idades"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    for pre in ("abil", "ic", "iv"):
                        if r2.endswith(pre):
                            word = word[: -len(pre)]
                            rv = rv[: -len(pre)]
                elif suffix in ("ivo", "iva", "ivos", "ivas"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                else:
                    word, rv = word[:-n], rv[:-n]
            break

    # STEP 2a: verb suffixes beginning 'y' (preceded by 'u')
    if not step1_success:
        for suffix in _ES_STEP2A:
            n = len(suffix)
            if rv.endswith(suffix) and word[-n - 1: -n] == "u":
                word, rv = word[:-n], rv[:-n]
                break

        for suffix in _ES_STEP2B:
            if rv.endswith(suffix):
                n = len(suffix)
                word, rv = word[:-n], rv[:-n]
                if suffix in ("en", "es", "\xe9is", "emos"):
                    if word.endswith("gu"):
                        word = word[:-1]
                    if rv.endswith("gu"):
                        rv = rv[:-1]
                break

    # STEP 3: residual suffix
    for suffix in _ES_STEP3:
        if rv.endswith(suffix):
            n = len(suffix)
            if suffix in ("e", "\xe9"):
                word, rv = word[:-n], rv[:-n]
                if len(word) >= 2 and word[-2:] == "gu" and rv and rv[-1] == "u":
                    word = word[:-1]
            else:
                word = word[:-n]
            break

    return (
        word.replace("\xe1", "a").replace("\xe9", "e").replace("\xed", "i")
        .replace("\xf3", "o").replace("\xfa", "u")
    )


# ---------------------------------------------------------------------------
# French — snowball.tartarus.org/algorithms/french/stemmer.html
# ---------------------------------------------------------------------------

_FR_VOWELS = "aeiouy\xe2\xe0\xeb\xe9\xea\xe8\xef\xee\xf4\xfb\xf9"
_FR_STEP1 = (
    "issements", "issement", "atrices", "atrice", "ateurs", "ations",
    "logies", "usions", "utions", "ements", "amment", "emment", "ances",
    "iqUes", "ismes", "ables", "istes", "ateur", "ation", "logie",
    "usion", "ution", "ences", "ement", "euses", "ments", "ance",
    "iqUe", "isme", "able", "iste", "ence", "it\xe9s", "ives", "eaux",
    "euse", "ment", "eux", "it\xe9", "ive", "ifs", "aux", "if",
)
_FR_STEP2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
    "irais", "irait", "irent", "iriez", "irons", "iront", "isses",
    "issez", "\xeemes", "\xeetes", "irai", "iras", "irez", "isse",
    "ies", "ira", "\xeet", "ie", "ir", "is", "it", "i",
)
_FR_STEP2B = (
    "eraIent", "assions", "erions", "assent", "assiez", "\xe8rent",
    "erais", "erait", "eriez", "erons", "eront", "aIent", "antes",
    "asses", "ions", "erai", "eras", "erez", "\xe2mes", "\xe2tes",
    "ante", "ants", "asse", "\xe9es", "era", "iez", "ais", "ait",
    "ant", "\xe9e", "\xe9s", "er", "ez", "\xe2t", "ai", "as",
    "\xe9", "a",
)
_FR_STEP4 = ("i\xe8re", "I\xe8re", "ion", "ier", "Ier", "e", "\xeb")
_FR_2B_ER_GROUP = (
    "eraIent", "erions", "\xe8rent", "erais", "erait", "eriez",
    "erons", "eront", "erai", "eras", "erez", "\xe9es", "era", "iez",
    "\xe9e", "\xe9s", "er", "ez", "\xe9",
)
_FR_2B_A_GROUP = (
    "assions", "assent", "assiez", "aIent", "antes", "asses",
    "\xe2mes", "\xe2tes", "ante", "ants", "asse", "ais", "ait",
    "ant", "\xe2t", "ai", "as", "a",
)


def _rv_french(word: str, vowels: str) -> str:
    rv = ""
    if len(word) >= 2:
        if word.startswith(("par", "col", "tap")) or (
            word[0] in vowels and word[1] in vowels
        ):
            rv = word[3:]
        else:
            for i in range(1, len(word)):
                if word[i] in vowels:
                    rv = word[i + 1:]
                    break
    return rv


def stem_fr(word: str) -> str:
    vowels = _FR_VOWELS
    word = word.lower()
    step1_success = False
    rv_ending_found = False
    step2a_success = False
    step2b_success = False

    # protect qu, intervocalic u/i, vowel-adjacent y (sequential updates)
    for i in range(1, len(word)):
        if word[i - 1] == "q" and word[i] == "u":
            word = word[:i] + "U" + word[i + 1:]
    for i in range(1, len(word) - 1):
        if word[i - 1] in vowels and word[i + 1] in vowels:
            if word[i] == "u":
                word = word[:i] + "U" + word[i + 1:]
            elif word[i] == "i":
                word = word[:i] + "I" + word[i + 1:]
        if word[i - 1] in vowels or word[i + 1] in vowels:
            if word[i] == "y":
                word = word[:i] + "Y" + word[i + 1:]

    r1, r2 = _r1r2(word, vowels)
    rv = _rv_french(word, vowels)

    # STEP 1 — note the substring (`in r2`) region tests: port behavior
    for suffix in _FR_STEP1:
        if word.endswith(suffix):
            n = len(suffix)
            if suffix == "eaux":
                word = word[:-1]
                step1_success = True
            elif suffix in ("euse", "euses"):
                if suffix in r2:
                    word = word[:-n]
                    step1_success = True
                elif suffix in r1:
                    word = word[:-n] + "eux"
                    step1_success = True
            elif suffix in ("ement", "ements") and suffix in rv:
                word = word[:-n]
                step1_success = True
                if word[-2:] == "iv" and "iv" in r2:
                    word = word[:-2]
                    if word[-2:] == "at" and "at" in r2:
                        word = word[:-2]
                elif word[-3:] == "eus":
                    if "eus" in r2:
                        word = word[:-3]
                    elif "eus" in r1:
                        word = word[:-1] + "x"
                elif word[-3:] in ("abl", "iqU"):
                    if "abl" in r2 or "iqU" in r2:
                        word = word[:-3]
                elif word[-3:] in ("i\xe8r", "I\xe8r"):
                    if "i\xe8r" in rv or "I\xe8r" in rv:
                        word = word[:-3] + "i"
            elif suffix == "amment" and suffix in rv:
                word = word[:-6] + "ant"
                rv = rv[:-6] + "ant"
                rv_ending_found = True
            elif suffix == "emment" and suffix in rv:
                word = word[:-6] + "ent"
                rv_ending_found = True
            elif (
                suffix in ("ment", "ments")
                and suffix in rv
                and not rv.startswith(suffix)
                and rv[rv.rindex(suffix) - 1] in vowels
            ):
                word = word[:-n]
                rv = rv[:-n]
                rv_ending_found = True
            elif suffix == "aux" and suffix in r1:
                word = word[:-2] + "l"
                step1_success = True
            elif (
                suffix in ("issement", "issements")
                and suffix in r1
                and word[-n - 1] not in vowels
            ):
                word = word[:-n]
                step1_success = True
            elif suffix in (
                "ance", "iqUe", "isme", "able", "iste", "eux",
                "ances", "iqUes", "ismes", "ables", "istes",
            ) and suffix in r2:
                word = word[:-n]
                step1_success = True
            elif suffix in (
                "atrice", "ateur", "ation", "atrices", "ateurs", "ations",
            ) and suffix in r2:
                word = word[:-n]
                step1_success = True
                if word[-2:] == "ic":
                    if "ic" in r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
            elif suffix in ("logie", "logies") and suffix in r2:
                word = word[:-n] + "log"
                step1_success = True
            elif suffix in (
                "usion", "ution", "usions", "utions",
            ) and suffix in r2:
                word = word[:-n] + "u"
                step1_success = True
            elif suffix in ("ence", "ences") and suffix in r2:
                word = word[:-n] + "ent"
                step1_success = True
            elif suffix in ("it\xe9", "it\xe9s") and suffix in r2:
                word = word[:-n]
                step1_success = True
                if word[-4:] == "abil":
                    if "abil" in r2:
                        word = word[:-4]
                    else:
                        word = word[:-2] + "l"
                elif word[-2:] == "ic":
                    if "ic" in r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
                elif word[-2:] == "iv":
                    if "iv" in r2:
                        word = word[:-2]
            elif suffix in ("if", "ive", "ifs", "ives") and suffix in r2:
                word = word[:-n]
                step1_success = True
                if word[-2:] == "at" and "at" in r2:
                    word = word[:-2]
                    if word[-2:] == "ic":
                        if "ic" in r2:
                            word = word[:-2]
                        else:
                            word = word[:-2] + "iqU"
            break

    # STEP 2a: verb suffixes beginning 'i'
    if not step1_success or rv_ending_found:
        for suffix in _FR_STEP2A:
            if word.endswith(suffix):
                if (
                    suffix in rv
                    and len(rv) > len(suffix)
                    and rv[rv.rindex(suffix) - 1] not in vowels
                ):
                    word = word[: -len(suffix)]
                    step2a_success = True
                break

        if not step2a_success:
            for suffix in _FR_STEP2B:
                if rv.endswith(suffix):
                    if suffix == "ions" and "ions" in r2:
                        word = word[:-4]
                        step2b_success = True
                    elif suffix in _FR_2B_ER_GROUP:
                        word = word[: -len(suffix)]
                        step2b_success = True
                    elif suffix in _FR_2B_A_GROUP:
                        word = word[: -len(suffix)]
                        rv = rv[: -len(suffix)]
                        step2b_success = True
                        if rv.endswith("e"):
                            word = word[:-1]
                    break

    if step1_success or step2a_success or step2b_success:
        # STEP 3
        if word[-1] == "Y":
            word = word[:-1] + "i"
        elif word[-1] == "\xe7":
            word = word[:-1] + "c"
    else:
        # STEP 4: residual suffixes
        if len(word) >= 2 and word[-1] == "s" and word[-2] not in "aiou\xe8s":
            word = word[:-1]
        for suffix in _FR_STEP4:
            if word.endswith(suffix):
                if suffix in rv:
                    if (
                        suffix == "ion"
                        and suffix in r2
                        and len(rv) >= 4  # port raises IndexError here
                        and rv[-4] in "st"
                    ):
                        word = word[:-3]
                    elif suffix in ("ier", "i\xe8re", "Ier", "I\xe8re"):
                        word = word[: -len(suffix)] + "i"
                    elif suffix == "e":
                        word = word[:-1]
                    elif suffix == "\xeb" and word[-3:-1] == "gu":
                        word = word[:-1]
                    break

    # STEP 5: undouble
    if word.endswith(("enn", "onn", "ett", "ell", "eill")):
        word = word[:-1]

    # STEP 6: un-accent the last vowel if non-final
    for i in range(1, len(word)):
        if word[-i] in vowels:
            if i != 1 and word[-i] in ("\xe9", "\xe8"):
                word = word[:-i] + "e" + word[-i + 1:]
            break

    return word.replace("I", "i").replace("U", "u").replace("Y", "y")


# ---------------------------------------------------------------------------
# Italian — snowball.tartarus.org/algorithms/italian/stemmer.html
# ---------------------------------------------------------------------------

_IT_VOWELS = "aeiou\xe0\xe8\xec\xf2\xf9"
_IT_STEP0 = (
    "gliela", "gliele", "glieli", "glielo", "gliene", "sene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
    "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
    "veli", "velo", "vene", "gli", "ci", "la", "le", "li", "lo", "mi",
    "ne", "si", "ti", "vi",
)
_IT_STEP1 = (
    "atrice", "atrici", "azione", "azioni", "uzione", "uzioni",
    "usione", "usioni", "amento", "amenti", "imento", "imenti",
    "amente", "abile", "abili", "ibile", "ibili", "mente", "atore",
    "atori", "logia", "logie", "anza", "anze", "iche", "ichi", "ismo",
    "ismi", "ista", "iste", "isti", "ist\xe0", "ist\xe8", "ist\xec",
    "ante", "anti", "enza", "enze", "ico", "ici", "ica", "ice", "oso",
    "osi", "osa", "ose", "it\xe0", "ivo", "ivi", "iva", "ive",
)
_IT_STEP2 = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
    "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
    "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
    "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
    "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo", "enda",
    "ende", "endi", "endo", "erai", "erei", "Yamo", "iamo", "immo",
    "irai", "irei", "isca", "isce", "isci", "isco", "ano", "are",
    "ata", "ate", "ati", "ato", "ava", "avi", "avo", "er\xe0", "ere",
    "er\xf2", "ete", "eva", "evi", "evo", "ir\xe0", "ire", "ir\xf2",
    "ita", "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta",
    "ute", "uti", "uto", "ar", "ir",
)


def stem_it(word: str) -> str:
    vowels = _IT_VOWELS
    word = word.lower()
    step1_success = False

    # acute accents -> grave
    word = (
        word.replace("\xe1", "\xe0").replace("\xe9", "\xe8")
        .replace("\xed", "\xec").replace("\xf3", "\xf2")
        .replace("\xfa", "\xf9")
    )
    for i in range(1, len(word)):
        if word[i - 1] == "q" and word[i] == "u":
            word = word[:i] + "U" + word[i + 1:]
    for i in range(1, len(word) - 1):
        if word[i - 1] in vowels and word[i + 1] in vowels:
            if word[i] == "u":
                word = word[:i] + "U" + word[i + 1:]
            elif word[i] == "i":
                word = word[:i] + "I" + word[i + 1:]

    r1, r2 = _r1r2(word, vowels)
    rv = _rv_standard(word, vowels)

    # STEP 0: attached pronoun
    for suffix in _IT_STEP0:
        if rv.endswith(suffix):
            n = len(suffix)
            if rv[-n - 4: -n] in ("ando", "endo"):
                word, r1, r2, rv = word[:-n], r1[:-n], r2[:-n], rv[:-n]
            elif rv[-n - 2: -n] in ("ar", "er", "ir"):
                word = word[:-n] + "e"
                r1 = r1[:-n] + "e"
                r2 = r2[:-n] + "e"
                rv = rv[:-n] + "e"
            break

    # STEP 1
    for suffix in _IT_STEP1:
        if word.endswith(suffix):
            n = len(suffix)
            if suffix == "amente" and r1.endswith(suffix):
                step1_success = True
                word, r2, rv = word[:-6], r2[:-6], rv[:-6]
                if r2.endswith("iv"):
                    word, r2, rv = word[:-2], r2[:-2], rv[:-2]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                elif r2.endswith(("os", "ic")):
                    word, rv = word[:-2], rv[:-2]
                elif r2.endswith("abil"):
                    word, rv = word[:-4], rv[:-4]
            elif (
                suffix in ("amento", "amenti", "imento", "imenti")
                and rv.endswith(suffix)
            ):
                step1_success = True
                word, rv = word[:-6], rv[:-6]
            elif r2.endswith(suffix):
                step1_success = True
                if suffix in ("azione", "azioni", "atore", "atori"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith("ic"):
                        word, rv = word[:-2], rv[:-2]
                elif suffix in ("logia", "logie"):
                    # port quirk: rv is rebound to word[:-2], not rv[:-2]
                    word = word[:-2]
                    rv = word[:-2]
                elif suffix in ("uzione", "uzioni", "usione", "usioni"):
                    word, rv = word[:-5], rv[:-5]
                elif suffix in ("enza", "enze"):
                    word = word[:-2] + "te"
                    rv = rv[:-2] + "te"
                elif suffix == "it\xe0":
                    word, r2, rv = word[:-3], r2[:-3], rv[:-3]
                    if r2.endswith(("ic", "iv")):
                        word, rv = word[:-2], rv[:-2]
                    elif r2.endswith("abil"):
                        word, rv = word[:-4], rv[:-4]
                elif suffix in ("ivo", "ivi", "iva", "ive"):
                    word, r2, rv = word[:-3], r2[:-3], rv[:-3]
                    if r2.endswith("at"):
                        word, r2, rv = word[:-2], r2[:-2], rv[:-2]
                        if r2.endswith("ic"):
                            word, rv = word[:-2], rv[:-2]
                else:
                    word, rv = word[:-n], rv[:-n]
            break

    # STEP 2: verb suffixes
    if not step1_success:
        for suffix in _IT_STEP2:
            if rv.endswith(suffix):
                word, rv = word[: -len(suffix)], rv[: -len(suffix)]
                break

    # STEP 3a
    if rv.endswith(("a", "e", "i", "o", "\xe0", "\xe8", "\xec", "\xf2")):
        word, rv = word[:-1], rv[:-1]
        if rv.endswith("i"):
            word, rv = word[:-1], rv[:-1]

    # STEP 3b
    if rv.endswith(("ch", "gh")):
        word = word[:-1]

    return word.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Portuguese — snowball.tartarus.org/algorithms/portuguese/stemmer.html
# ---------------------------------------------------------------------------

_PT_VOWELS = "aeiou\xe1\xe9\xed\xf3\xfa\xe2\xea\xf4"
_PT_STEP1 = (
    "amentos", "imentos", "uciones", "amento", "imento", "adoras",
    "adores", "a\xe7o~es", "log\xedas", "\xeancias", "amente",
    "idades", "ismos", "istas", "adora", "a\xe7a~o", "antes",
    "\xe2ncia", "log\xeda", "uci\xf3n", "\xeancia", "mente",
    "idade", "ezas", "icos", "icas", "ismo", "\xe1vel", "\xedvel",
    "ista", "osos", "osas", "ador", "ante", "ivas", "ivos", "iras",
    "eza", "ico", "ica", "oso", "osa", "iva", "ivo", "ira",
)
_PT_STEP2 = (
    "ar\xedamos", "er\xedamos", "ir\xedamos", "\xe1ssemos",
    "\xeassemos", "\xedssemos", "ar\xedeis", "er\xedeis",
    "ir\xedeis", "\xe1sseis", "\xe9sseis", "\xedsseis",
    "\xe1ramos", "\xe9ramos", "\xedramos", "\xe1vamos", "aremos",
    "eremos", "iremos", "ariam", "eriam", "iriam", "assem", "essem",
    "issem", "ara~o", "era~o", "ira~o", "arias", "erias", "irias",
    "ardes", "erdes", "irdes", "asses", "esses", "isses", "astes",
    "estes", "istes", "\xe1reis", "areis", "\xe9reis", "ereis",
    "\xedreis", "ireis", "\xe1veis", "\xedamos", "armos", "ermos",
    "irmos", "aria", "eria", "iria", "asse", "esse", "isse", "aste",
    "este", "iste", "arei", "erei", "irei", "aram", "eram", "iram",
    "avam", "arem", "erem", "irem", "ando", "endo", "indo", "adas",
    "idas", "ar\xe1s", "aras", "er\xe1s", "eras", "ir\xe1s", "avas",
    "ares", "eres", "ires", "\xedeis", "ados", "idos", "\xe1mos",
    "amos", "emos", "imos", "iras", "ada", "ida", "ar\xe1", "ara",
    "er\xe1", "era", "ir\xe1", "ava", "iam", "ado", "ido", "ias",
    "ais", "eis", "ira", "ia", "ei", "am", "em", "ar", "er", "ir",
    "as", "es", "is", "eu", "iu", "ou",
)
_PT_STEP4 = ("os", "a", "i", "o", "\xe1", "\xed", "\xf3")


def stem_pt(word: str) -> str:
    vowels = _PT_VOWELS
    word = word.lower()
    step1_success = False
    step2_success = False

    # nasalized vowels get an ASCII digraph spelling during stemming
    word = word.replace("\xe3", "a~").replace("\xf5", "o~")

    r1, r2 = _r1r2(word, vowels)
    rv = _rv_standard(word, vowels)

    # STEP 1
    for suffix in _PT_STEP1:
        if word.endswith(suffix):
            n = len(suffix)
            if suffix == "amente" and r1.endswith(suffix):
                step1_success = True
                word, r2, rv = word[:-6], r2[:-6], rv[:-6]
                if r2.endswith("iv"):
                    word, r2, rv = word[:-2], r2[:-2], rv[:-2]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                elif r2.endswith(("os", "ic", "ad")):
                    word, rv = word[:-2], rv[:-2]
            elif (
                suffix in ("ira", "iras")
                and rv.endswith(suffix)
                and word[-n - 1: -n] == "e"
            ):
                step1_success = True
                word = word[:-n] + "ir"
                rv = rv[:-n] + "ir"
            elif r2.endswith(suffix):
                step1_success = True
                if suffix in ("log\xeda", "log\xedas"):
                    word, rv = word[:-2], rv[:-2]
                elif suffix in ("uci\xf3n", "uciones"):
                    word = word[:-n] + "u"
                    rv = rv[:-n] + "u"
                elif suffix in ("\xeancia", "\xeancias"):
                    word = word[:-n] + "ente"
                    rv = rv[:-n] + "ente"
                elif suffix == "mente":
                    word, r2, rv = word[:-5], r2[:-5], rv[:-5]
                    if r2.endswith(("ante", "avel", "\xedvel")):
                        word, rv = word[:-4], rv[:-4]
                elif suffix in ("idade", "idades"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith(("ic", "iv")):
                        word, rv = word[:-2], rv[:-2]
                    elif r2.endswith("abil"):
                        word, rv = word[:-4], rv[:-4]
                elif suffix in ("iva", "ivo", "ivas", "ivos"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                else:
                    word, rv = word[:-n], rv[:-n]
            break

    # STEP 2: verb suffixes
    if not step1_success:
        for suffix in _PT_STEP2:
            if rv.endswith(suffix):
                step2_success = True
                word, rv = word[: -len(suffix)], rv[: -len(suffix)]
                break

    # STEP 3
    if (step1_success or step2_success) and rv.endswith("i") and word[-2] == "c":
        word, rv = word[:-1], rv[:-1]

    # STEP 4: residual suffix
    if not step1_success and not step2_success:
        for suffix in _PT_STEP4:
            if rv.endswith(suffix):
                word, rv = word[: -len(suffix)], rv[: -len(suffix)]
                break

    # STEP 5
    if rv.endswith(("e", "\xe9", "\xea")):
        word, rv = word[:-1], rv[:-1]
        if (word.endswith("gu") and rv.endswith("u")) or (
            word.endswith("ci") and rv.endswith("i")
        ):
            word = word[:-1]
    elif word.endswith("\xe7"):
        word = word[:-1] + "c"

    return word.replace("a~", "\xe3").replace("o~", "\xf5")





# ---------------------------------------------------------------------------
# Russian — snowball.tartarus.org/algorithms/russian/stemmer.html
# (engine over the transliterated tables in lang_ru_data.py)
# ---------------------------------------------------------------------------


def _ru_regions(word: str):
    """RV + R2 with i^a/i^u/e` masked to single letters during region
    finding (reference russian.py:646-691)."""
    vowels = ("A", "U", "E", "a", "e", "i", "o", "u", "y")
    w = word.replace("i^a", "A").replace("i^u", "U").replace("e`", "E")
    r1 = ""
    r2 = ""
    rv = ""
    for i in range(1, len(w)):
        if w[i] not in vowels and w[i - 1] in vowels:
            r1 = w[i + 1:]
            break
    for i in range(1, len(r1)):
        if r1[i] not in vowels and r1[i - 1] in vowels:
            r2 = r1[i + 1:]
            break
    for i in range(len(w)):
        if w[i] in vowels:
            rv = w[i + 1:]
            break
    unmask = lambda s: s.replace("A", "i^a").replace("U", "i^u").replace("E", "e`")
    return unmask(rv), unmask(r2)


def stem_ru(word: str) -> str:
    from whoosh_reloaded_spark import lang_ru_data as D

    cyrillic = any(ord(c) > 255 for c in word)
    if cyrillic:
        for a, b in D.CYR_TO_ROM:
            word = word.replace(a, b)

    step1_success = False
    adjectival_removed = False
    verb_removed = False
    undouble_success = False
    superlative_removed = False

    rv, r2 = _ru_regions(word)

    def _a_ok(suffix):
        # removal conditioned on a preceding i^a or a (russian.py:402-405)
        n = len(suffix)
        return rv[-n - 3: -n] == "i^a" or rv[-n - 1: -n] == "a"

    # Step 1: perfective gerund
    for suffix in D.PERFECTIVE_GERUND:
        if rv.endswith(suffix):
            if suffix in D.PERFECTIVE_A_GROUP:
                if _a_ok(suffix):
                    n = len(suffix)
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    step1_success = True
                    break
            else:
                n = len(suffix)
                word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                step1_success = True
                break

    if not step1_success:
        for suffix in D.REFLEXIVE:
            if rv.endswith(suffix):
                n = len(suffix)
                word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                break
        for suffix in D.ADJECTIVAL:
            if rv.endswith(suffix):
                if suffix in D.ADJECTIVAL_A_GROUP:
                    if _a_ok(suffix):
                        n = len(suffix)
                        word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                        adjectival_removed = True
                        break
                else:
                    n = len(suffix)
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    adjectival_removed = True
                    break
        if not adjectival_removed:
            for suffix in D.VERB:
                if rv.endswith(suffix):
                    if suffix in D.VERB_A_GROUP:
                        if _a_ok(suffix):
                            n = len(suffix)
                            word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                            verb_removed = True
                            break
                    else:
                        n = len(suffix)
                        word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                        verb_removed = True
                        break
        if not adjectival_removed and not verb_removed:
            for suffix in D.NOUN:
                if rv.endswith(suffix):
                    n = len(suffix)
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    break

    # Step 2: remove trailing i
    if rv.endswith("i"):
        word, r2 = word[:-1], r2[:-1]

    # Step 3: derivational (in R2)
    for suffix in D.DERIVATIONAL:
        if r2.endswith(suffix):
            word = word[: -len(suffix)]
            break

    # Step 4: undouble nn / superlative / soft sign
    if word.endswith("nn"):
        word = word[:-1]
        undouble_success = True
    if not undouble_success:
        for suffix in D.SUPERLATIVE:
            if word.endswith(suffix):
                word = word[: -len(suffix)]
                superlative_removed = True
                break
        if word.endswith("nn"):
            word = word[:-1]
    if not undouble_success and not superlative_removed:
        if word.endswith("'"):
            word = word[:-1]

    if cyrillic:
        for a, b in D.ROM_TO_CYR:
            word = word.replace(a, b)
    return word


# ---------------------------------------------------------------------------
# Scandinavian (Danish / Norwegian / Swedish) + Dutch
# snowball.tartarus.org/algorithms/{danish,norwegian,swedish,dutch}/stemmer.html
# ---------------------------------------------------------------------------


def _r1_scandinavian(word: str, vowels: str) -> str:
    """R1 with the 3-letter-prefix floor (bases.py:13-45)."""
    r1 = ""
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            if 0 < len(word[: i + 1]) < 3:
                r1 = word[3:]
            elif len(word[: i + 1]) >= 3:
                r1 = word[i + 1:]
            else:
                return word
            break
    return r1


_DA_VOWELS = "aeiouy\xe6\xe5\xf8"
_DA_DOUBLE_CONS = (
    "bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk", "ll", "mm", "nn",
    "pp", "qq", "rr", "ss", "tt", "vv", "ww", "xx", "zz",
)
_DA_S_END = "abcdfghjklmnoprtvyz\xe5"
_DA_STEP1 = (
    "erendes", "erende", "hedens", "ethed", "erede", "heden", "heder",
    "endes", "ernes", "erens", "erets", "ered", "ende", "erne", "eren",
    "erer", "heds", "enes", "eres", "eret", "hed", "ene", "ere", "ens",
    "ers", "ets", "en", "er", "es", "et", "e", "s",
)
_DA_STEP2 = ("gd", "dt", "gt", "kt")
_DA_STEP3 = ("elig", "l\xf8st", "lig", "els", "ig")


def stem_da(word: str) -> str:
    word = word.lower()
    r1 = _r1_scandinavian(word, _DA_VOWELS)
    for suffix in _DA_STEP1:
        if r1.endswith(suffix):
            if suffix == "s":
                if word[-2] in _DA_S_END:
                    word, r1 = word[:-1], r1[:-1]
            else:
                n = len(suffix)
                word, r1 = word[:-n], r1[:-n]
            break
    for suffix in _DA_STEP2:
        if r1.endswith(suffix):
            word, r1 = word[:-1], r1[:-1]
            break
    if r1.endswith("igst"):
        word, r1 = word[:-2], r1[:-2]
    for suffix in _DA_STEP3:
        if r1.endswith(suffix):
            if suffix == "l\xf8st":
                word, r1 = word[:-1], r1[:-1]
            else:
                n = len(suffix)
                word, r1 = word[:-n], r1[:-n]
                if r1.endswith(_DA_STEP2):
                    word, r1 = word[:-1], r1[:-1]
            break
    for dc in _DA_DOUBLE_CONS:
        if word.endswith(dc) and len(word) > 3:
            word = word[:-1]
            break
    return word


_NO_VOWELS = "aeiouy\xe6\xe5\xf8"
_NO_S_END = "bcdfghjlmnoprtvyz"
_NO_STEP1 = (
    "hetenes", "hetene", "hetens", "heter", "heten", "endes", "ande",
    "ende", "edes", "enes", "erte", "ede", "ane", "ene", "ens", "ers",
    "ets", "het", "ast", "ert", "en", "ar", "er", "as", "es", "et",
    "a", "e", "s",
)
_NO_STEP2 = ("dt", "vt")
_NO_STEP3 = (
    "hetslov", "eleg", "elig", "elov", "slov", "leg", "eig", "lig",
    "els", "lov", "ig",
)


def stem_no(word: str) -> str:
    word = word.lower()
    r1 = _r1_scandinavian(word, _NO_VOWELS)
    for suffix in _NO_STEP1:
        if r1.endswith(suffix):
            if suffix in ("erte", "ert"):
                n = len(suffix)
                word = word[:-n] + "er"
                r1 = r1[:-n] + "er"
            elif suffix == "s":
                if word[-2] in _NO_S_END or (
                    word[-2] == "k" and word[-3] not in _NO_VOWELS
                ):
                    word, r1 = word[:-1], r1[:-1]
            else:
                n = len(suffix)
                word, r1 = word[:-n], r1[:-n]
            break
    for suffix in _NO_STEP2:
        if r1.endswith(suffix):
            word, r1 = word[:-1], r1[:-1]
            break
    for suffix in _NO_STEP3:
        if r1.endswith(suffix):
            word = word[: -len(suffix)]
            break
    return word


_SV_VOWELS = "aeiouy\xe4\xe5\xf6"
_SV_S_END = "bcdfghjklmnoprtvy"
_SV_STEP1 = (
    "heterna", "hetens", "heter", "heten", "anden", "arnas", "ernas",
    "ornas", "andes", "andet", "arens", "arna", "erna", "orna", "ande",
    "arne", "aste", "aren", "ades", "erns", "ade", "are", "ern", "ens",
    "het", "ast", "ad", "en", "ar", "er", "or", "as", "es", "at",
    "a", "e", "s",
)
_SV_STEP2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_STEP3 = ("fullt", "l\xf6st", "els", "lig", "ig")


def stem_sv(word: str) -> str:
    word = word.lower()
    r1 = _r1_scandinavian(word, _SV_VOWELS)
    for suffix in _SV_STEP1:
        if r1.endswith(suffix):
            if suffix == "s":
                if word[-2] in _SV_S_END:
                    word, r1 = word[:-1], r1[:-1]
            else:
                n = len(suffix)
                word, r1 = word[:-n], r1[:-n]
            break
    for suffix in _SV_STEP2:
        if r1.endswith(suffix):
            word, r1 = word[:-1], r1[:-1]
            break
    for suffix in _SV_STEP3:
        if r1.endswith(suffix):
            if suffix in ("els", "lig", "ig"):
                word = word[: -len(suffix)]
            elif suffix in ("fullt", "l\xf6st"):
                word = word[:-1]
            break
    return word


_NL_VOWELS = "aeiouy\xe8"
_NL_STEP1 = ("heden", "ene", "en", "se", "s")
_NL_STEP3B = ("baar", "lijk", "bar", "end", "ing", "ig")


def stem_nl(word: str) -> str:
    vowels = _NL_VOWELS
    word = word.lower()
    step2_success = False
    word = (
        word.replace("\xe4", "a").replace("\xe1", "a")
        .replace("\xeb", "e").replace("\xe9", "e")
        .replace("\xed", "i").replace("\xef", "i")
        .replace("\xf6", "o").replace("\xf3", "o")
        .replace("\xfc", "u").replace("\xfa", "u")
    )
    if word.startswith("y"):
        word = "Y" + word[1:]
    for i in range(1, len(word)):
        if word[i - 1] in vowels and word[i] == "y":
            word = word[:i] + "Y" + word[i + 1:]
    for i in range(1, len(word) - 1):
        if word[i - 1] in vowels and word[i] == "i" and word[i + 1] in vowels:
            word = word[:i] + "I" + word[i + 1:]

    r1, r2 = _r1r2(word, vowels)
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            if 0 < len(word[: i + 1]) < 3:
                r1 = word[3:]
            break

    # STEP 1
    for suffix in _NL_STEP1:
        if r1.endswith(suffix):
            n = len(suffix)
            if suffix == "heden":
                word = word[:-5] + "heid"
                r1 = r1[:-5] + "heid"
                if r2.endswith("heden"):
                    r2 = r2[:-5] + "heid"
            elif (
                suffix in ("ene", "en")
                and not word.endswith("heden")
                and word[-n - 1] not in vowels
                and word[-n - 3: -n] != "gem"
            ):
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
                if word.endswith(("kk", "dd", "tt")):
                    word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
            elif (
                suffix in ("se", "s")
                and word[-n - 1] not in vowels
                and word[-n - 1] != "j"
            ):
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    # STEP 2
    if r1.endswith("e") and word[-2] not in vowels:
        step2_success = True
        word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
        if word.endswith(("kk", "dd", "tt")):
            word, r1, r2 = word[:-1], r1[:-1], r2[:-1]

    # STEP 3a
    if r2.endswith("heid") and word[-5] != "c":
        word, r1, r2 = word[:-4], r1[:-4], r2[:-4]
        if (
            r1.endswith("en")
            and word[-3] not in vowels
            and word[-5:-2] != "gem"
        ):
            word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            if word.endswith(("kk", "dd", "tt")):
                word, r1, r2 = word[:-1], r1[:-1], r2[:-1]

    # STEP 3b
    for suffix in _NL_STEP3B:
        if r2.endswith(suffix):
            if suffix in ("end", "ing"):
                word, r2 = word[:-3], r2[:-3]
                if r2.endswith("ig") and word[-3] != "e":
                    word = word[:-2]
                else:
                    if word.endswith(("kk", "dd", "tt")):
                        word = word[:-1]
            elif suffix == "ig" and word[-3] != "e":
                word = word[:-2]
            elif suffix == "lijk":
                word, r1 = word[:-4], r1[:-4]
                if r1.endswith("e") and word[-2] not in vowels:
                    word = word[:-1]
                    if word.endswith(("kk", "dd", "tt")):
                        word = word[:-1]
            elif suffix == "baar":
                word = word[:-4]
            elif suffix == "bar" and step2_success:
                word = word[:-3]
            break

    # STEP 4: undouble vowel
    if len(word) >= 4:
        if word[-1] not in vowels and word[-1] != "I":
            if word[-3:-1] in ("aa", "ee", "oo", "uu"):
                if word[-4] not in vowels:
                    word = word[:-3] + word[-3] + word[-1]

    return word.replace("I", "i").replace("Y", "y")


# ---------------------------------------------------------------------------
# Finnish — snowball.tartarus.org/algorithms/finnish/stemmer.html
# ---------------------------------------------------------------------------

_FI_VOWELS = "aeiouy\xe4\xf6"
_FI_RESTRICTED = "aeiou\xe4\xf6"
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "\xe4\xe4", "\xf6\xf6")
_FI_CONS = "bcdfghjklmnpqrstvwxz"
_FI_DOUBLE_CONS = (
    "bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk", "ll", "mm", "nn",
    "pp", "qq", "rr", "ss", "tt", "vv", "ww", "xx", "zz",
)
_FI_STEP1 = (
    "kaan", "k\xe4\xe4n", "sti", "kin", "han", "h\xe4n", "ko",
    "k\xf6", "pa", "p\xe4",
)
_FI_STEP2 = ("nsa", "ns\xe4", "mme", "nne", "si", "ni", "an", "\xe4n", "en")
_FI_STEP3 = (
    "siin", "tten", "seen", "han", "hen", "hin", "hon", "h\xe4n",
    "h\xf6n", "den", "tta", "tt\xe4", "ssa", "ss\xe4", "sta",
    "st\xe4", "lla", "ll\xe4", "lta", "lt\xe4", "lle", "ksi", "ine",
    "ta", "t\xe4", "na", "n\xe4", "a", "\xe4", "n",
)
_FI_STEP4 = (
    "impi", "impa", "imp\xe4", "immi", "imma", "imm\xe4", "mpi",
    "mpa", "mp\xe4", "mmi", "mma", "mm\xe4", "eja", "ej\xe4",
)


def stem_fi(word: str) -> str:
    vowels = _FI_VOWELS
    word = word.lower()
    step3_success = False
    r1, r2 = _r1r2(word, vowels)

    # STEP 1: particles
    for suffix in _FI_STEP1:
        if r1.endswith(suffix):
            n = len(suffix)
            if suffix == "sti":
                if suffix in r2:  # substring test, port behavior
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
            else:
                if word[-n - 1] in "ntaeiouy\xe4\xf6":
                    word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    # STEP 2: possessives
    for suffix in _FI_STEP2:
        if r1.endswith(suffix):
            if suffix == "si":
                if word[-3] != "k":
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            elif suffix == "ni":
                word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
                if word.endswith("kse"):
                    word = word[:-3] + "ksi"
                if r1.endswith("kse"):
                    r1 = r1[:-3] + "ksi"
                if r2.endswith("kse"):
                    r2 = r2[:-3] + "ksi"
            elif suffix == "an":
                if word[-4:-2] in ("ta", "na") or word[-5:-2] in (
                    "ssa", "sta", "lla", "lta",
                ):
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            elif suffix == "\xe4n":
                if word[-4:-2] in ("t\xe4", "n\xe4") or word[-5:-2] in (
                    "ss\xe4", "st\xe4", "ll\xe4", "lt\xe4",
                ):
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            elif suffix == "en":
                if word[-5:-2] in ("lle", "ine"):
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            else:
                word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
            break

    # STEP 3: cases
    for suffix in _FI_STEP3:
        if r1.endswith(suffix):
            n = len(suffix)
            if suffix in ("han", "hen", "hin", "hon", "h\xe4n", "h\xf6n"):
                if (
                    (suffix == "han" and word[-4] == "a")
                    or (suffix == "hen" and word[-4] == "e")
                    or (suffix == "hin" and word[-4] == "i")
                    or (suffix == "hon" and word[-4] == "o")
                    or (suffix == "h\xe4n" and word[-4] == "\xe4")
                    or (suffix == "h\xf6n" and word[-4] == "\xf6")
                ):
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
                    step3_success = True
            elif suffix in ("siin", "den", "tten"):
                if (
                    word[-n - 1] == "i"
                    and word[-n - 2] in _FI_RESTRICTED
                ):
                    word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
                    step3_success = True
                else:
                    continue
            elif suffix == "seen":
                if word[-6:-4] in _FI_LONG:
                    word, r1, r2 = word[:-4], r1[:-4], r2[:-4]
                    step3_success = True
                else:
                    continue
            elif suffix in ("a", "\xe4"):
                if word[-2] in vowels and word[-3] in _FI_CONS:
                    word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
                    step3_success = True
            elif suffix in ("tta", "tt\xe4"):
                if word[-4] == "e":
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
                    step3_success = True
            elif suffix == "n":
                word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
                step3_success = True
                if word[-2:] == "ie" or word[-2:] in _FI_LONG:
                    word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
            else:
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
                step3_success = True
            break

    # STEP 4: other endings (in R2)
    for suffix in _FI_STEP4:
        if r2.endswith(suffix):
            if suffix in ("mpi", "mpa", "mp\xe4", "mmi", "mma", "mm\xe4"):
                if word[-5:-3] != "po":
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
            else:
                n = len(suffix)
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    # STEP 5: plurals
    if step3_success and len(r1) >= 1 and r1[-1] in "ij":
        word, r1 = word[:-1], r1[:-1]
    elif (
        not step3_success
        and len(r1) >= 2
        and r1[-1] == "t"
        and r1[-2] in vowels
    ):
        word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
        if r2.endswith("imma"):
            word, r1 = word[:-4], r1[:-4]
        elif r2.endswith("mma") and r2[-5:-3] != "po":
            word, r1 = word[:-3], r1[:-3]

    # STEP 6: tidying
    if r1[-2:] in _FI_LONG:
        word, r1 = word[:-1], r1[:-1]
    if len(r1) >= 2 and r1[-2] in _FI_CONS and r1[-1] in "a\xe4ei":
        word, r1 = word[:-1], r1[:-1]
    if r1.endswith(("oj", "uj")):
        word, r1 = word[:-1], r1[:-1]
    if r1.endswith("jo"):
        word, r1 = word[:-1], r1[:-1]

    # undouble: double consonant followed by zero or more vowels
    for i in range(1, len(word)):
        if word[-i] in vowels:
            continue
        if i == 1:
            if word[-i - 1:] in _FI_DOUBLE_CONS:
                word = word[:-1]
        else:
            if word[-i - 1: -i + 1] in _FI_DOUBLE_CONS:
                word = word[:-i] + word[-i + 1:]
        break
    return word


# ---------------------------------------------------------------------------
# Hungarian — snowball.tartarus.org/algorithms/hungarian/stemmer.html
# ---------------------------------------------------------------------------

_HU_VOWELS = "aeiou\xf6\xfc\xe1\xe9\xed\xf3\xf5\xfa\xfb"
_HU_DIGRAPHS = ("cs", "dz", "dzs", "gy", "ly", "ny", "ty", "zs")
_HU_DOUBLE_CONS = (
    "bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk", "ll",
    "lly", "mm", "nn", "nny", "pp", "rr", "ss", "ssz", "tt", "tty",
    "vv", "zz", "zzs",
)
_HU_STEP1 = ("al", "el")
_HU_STEP2 = (
    "k\xe9ppen", "onk\xe9nt", "enk\xe9nt", "ank\xe9nt", "k\xe9pp",
    "k\xe9nt", "ban", "ben", "nak", "nek", "val", "vel", "t\xf3l",
    "t\xf5l", "r\xf3l", "r\xf5l", "b\xf3l", "b\xf5l", "hoz",
    "hez", "h\xf6z", "n\xe1l", "n\xe9l", "\xe9rt", "kor", "ba",
    "be", "ra", "re", "ig", "at", "et", "ot", "\xf6t", "ul",
    "\xfcl", "v\xe1", "v\xe9", "en", "on", "an", "\xf6n", "n", "t",
)
_HU_STEP3 = ("\xe1nk\xe9nt", "\xe1n", "\xe9n")
_HU_STEP4 = (
    "astul", "est\xfcl", "\xe1stul", "\xe9st\xfcl", "stul", "st\xfcl",
)
_HU_STEP5 = ("\xe1", "\xe9")
_HU_STEP6 = (
    "ok\xe9", "\xf6k\xe9", "ak\xe9", "ek\xe9", "\xe1k\xe9",
    "\xe1\xe9i", "\xe9k\xe9", "\xe9\xe9i", "k\xe9", "\xe9i",
    "\xe9\xe9", "\xe9",
)
_HU_STEP7 = (
    "\xe1juk", "\xe9j\xfck", "\xfcnk", "unk", "juk", "j\xfck",
    "\xe1nk", "\xe9nk", "nk", "uk", "\xfck", "em", "om", "am",
    "od", "ed", "ad", "\xf6d", "ja", "je", "\xe1m", "\xe1d",
    "\xe9m", "\xe9d", "m", "d", "a", "e", "o", "\xe1", "\xe9",
)
_HU_STEP8 = (
    "jaitok", "jeitek", "jaink", "jeink", "aitok", "eitek",
    "\xe1itok", "\xe9itek", "jaim", "jeim", "jaid", "jeid", "eink",
    "aink", "itek", "jeik", "jaik", "\xe1ink", "\xe9ink", "aim",
    "eim", "aid", "eid", "jai", "jei", "ink", "aik", "eik",
    "\xe1im", "\xe1id", "\xe1ik", "\xe9im", "\xe9id", "\xe9ik",
    "im", "id", "ai", "ei", "ik", "\xe1i", "\xe9i", "i",
)
_HU_STEP9 = ("\xe1k", "\xe9k", "\xf6k", "ok", "ek", "ak", "k")


def _r1_hungarian(word: str) -> str:
    """R1 per the port (hungarian.py:330-352) — NOTE the digraph branch
    slices after the first occurrence of the digraph's LAST LETTER anywhere
    in the word (word.index(digraph[-1])), a port quirk kept for parity."""
    vowels = _HU_VOWELS
    r1 = ""
    if word[0] in vowels:
        for digraph in _HU_DIGRAPHS:
            if digraph in word[1:]:
                return word[word.index(digraph[-1]) + 1:]
        for i in range(1, len(word)):
            if word[i] not in vowels:
                r1 = word[i + 1:]
                break
    else:
        for i in range(1, len(word)):
            if word[i] in vowels:
                r1 = word[i + 1:]
                break
    return r1


def stem_hu(word: str) -> str:
    word = word.lower()
    if not word:
        return word
    r1 = _r1_hungarian(word)

    # STEP 1: instrumental case (undouble before -al/-el)
    if r1.endswith(_HU_STEP1):
        for dc in _HU_DOUBLE_CONS:
            if word[-2 - len(dc): -2] == dc:
                word = word[:-4] + word[-3]
                if r1[-2 - len(dc): -2] == dc:
                    r1 = r1[:-4] + r1[-3]
                break

    # STEP 2: frequent cases
    for suffix in _HU_STEP2:
        if word.endswith(suffix):
            if r1.endswith(suffix):
                n = len(suffix)
                word, r1 = word[:-n], r1[:-n]
                if r1.endswith("\xe1"):
                    word = word[:-1] + "a"
                    r1 = r1[:-1] + "a"
                elif r1.endswith("\xe9"):
                    word = word[:-1] + "e"
                    r1 = r1[:-1] + "e"
            break

    # STEP 3: special cases
    for suffix in _HU_STEP3:
        if r1.endswith(suffix):
            if suffix == "\xe9n":
                word = word[:-2] + "e"
                r1 = r1[:-2] + "e"
            else:
                n = len(suffix)
                word = word[:-n] + "a"
                r1 = r1[:-n] + "a"
            break

    # STEP 4: other cases
    for suffix in _HU_STEP4:
        if r1.endswith(suffix):
            if suffix == "\xe1stul":
                word = word[:-5] + "a"
                r1 = r1[:-5] + "a"
            elif suffix == "\xe9st\xfcl":
                word = word[:-5] + "e"
                r1 = r1[:-5] + "e"
            else:
                n = len(suffix)
                word, r1 = word[:-n], r1[:-n]
            break

    # STEP 5: factive case (undouble before final accent)
    for suffix in _HU_STEP5:
        if r1.endswith(suffix):
            for dc in _HU_DOUBLE_CONS:
                if word[-1 - len(dc): -1] == dc:
                    word = word[:-3] + word[-2]
                    if r1[-1 - len(dc): -1] == dc:
                        r1 = r1[:-3] + r1[-2]
                    break

    # STEP 6: owned
    for suffix in _HU_STEP6:
        if r1.endswith(suffix):
            n = len(suffix)
            if suffix in ("\xe1k\xe9", "\xe1\xe9i"):
                word = word[:-3] + "a"
                r1 = r1[:-3] + "a"
            elif suffix in ("\xe9k\xe9", "\xe9\xe9i", "\xe9\xe9"):
                word = word[:-n] + "e"
                r1 = r1[:-n] + "e"
            else:
                word, r1 = word[:-n], r1[:-n]
            break

    # STEP 7: singular owner
    for suffix in _HU_STEP7:
        if word.endswith(suffix):
            if r1.endswith(suffix):
                n = len(suffix)
                if suffix in ("\xe1nk", "\xe1juk", "\xe1m", "\xe1d", "\xe1"):
                    word = word[:-n] + "a"
                    r1 = r1[:-n] + "a"
                elif suffix in ("\xe9nk", "\xe9j\xfck", "\xe9m", "\xe9d", "\xe9"):
                    word = word[:-n] + "e"
                    r1 = r1[:-n] + "e"
                else:
                    word, r1 = word[:-n], r1[:-n]
            break

    # STEP 8: plural owner
    for suffix in _HU_STEP8:
        if word.endswith(suffix):
            if r1.endswith(suffix):
                n = len(suffix)
                if suffix in ("\xe1im", "\xe1id", "\xe1i", "\xe1ink",
                              "\xe1itok", "\xe1ik"):
                    word = word[:-n] + "a"
                    r1 = r1[:-n] + "a"
                elif suffix in ("\xe9im", "\xe9id", "\xe9i", "\xe9ink",
                                "\xe9itek", "\xe9ik"):
                    word = word[:-n] + "e"
                    r1 = r1[:-n] + "e"
                else:
                    word, r1 = word[:-n], r1[:-n]
            break

    # STEP 9: plural
    for suffix in _HU_STEP9:
        if word.endswith(suffix):
            if r1.endswith(suffix):
                if suffix == "\xe1k":
                    word = word[:-2] + "a"
                elif suffix == "\xe9k":
                    word = word[:-2] + "e"
                else:
                    word = word[: -len(suffix)]
            break
    return word


# ---------------------------------------------------------------------------
# Romanian — snowball.tartarus.org/algorithms/romanian/stemmer.html
# ---------------------------------------------------------------------------

_RO_VOWELS = "aeiou\u0103\xe2\xee"
_RO_STEP0 = (
    "iilor", "ului", "elor", "iile", "ilor", "atei", "a\u0163ie",
    "a\u0163ia", "aua", "ele", "iua", "iei", "ile", "ul", "ea", "ii",
)
_RO_STEP1 = (
    "abilitate", "abilitati", "abilit\u0103\u0163i", "ibilitate",
    "abilit\u0103i", "ivitate", "ivitati", "ivit\u0103\u0163i",
    "icitate", "icitati", "icit\u0103\u0163i", "icatori",
    "ivit\u0103i", "icit\u0103i", "icator", "a\u0163iune",
    "atoare", "\u0103toare", "i\u0163iune", "itoare", "iciva",
    "icive", "icivi", "iciv\u0103", "icala", "icale", "icali",
    "ical\u0103", "ativa", "ative", "ativi", "ativ\u0103", "atori",
    "\u0103tori", "itiva", "itive", "itivi", "itiv\u0103", "itori",
    "iciv", "ical", "ativ", "ator", "\u0103tor", "itiv", "itor",
)
_RO_STEP2 = (
    "abila", "abile", "abili", "abil\u0103", "ibila", "ibile",
    "ibili", "ibil\u0103", "atori", "itate", "itati",
    "it\u0103\u0163i", "abil", "ibil", "oasa", "oas\u0103", "oase",
    "anta", "ante", "anti", "ant\u0103", "ator", "it\u0103i",
    "iune", "iuni", "isme", "ista", "iste", "isti", "ist\u0103",
    "i\u015fti", "ata", "at\u0103", "ati", "ate", "uta",
    "ut\u0103", "uti", "ute", "ita", "it\u0103", "iti", "ite",
    "ica", "ice", "ici", "ic\u0103", "osi", "o\u015fi", "ant",
    "iva", "ive", "ivi", "iv\u0103", "ism", "ist", "at", "ut",
    "it", "ic", "os", "iv",
)
_RO_STEP3 = (
    "seser\u0103\u0163i", "aser\u0103\u0163i", "iser\u0103\u0163i",
    "\xe2ser\u0103\u0163i", "user\u0103\u0163i", "seser\u0103m",
    "aser\u0103m", "iser\u0103m", "\xe2ser\u0103m", "user\u0103m",
    "ser\u0103\u0163i", "sese\u015fi", "seser\u0103", "easc\u0103",
    "ar\u0103\u0163i", "ur\u0103\u0163i", "ir\u0103\u0163i",
    "\xe2r\u0103\u0163i", "ase\u015fi", "aser\u0103", "ise\u015fi",
    "iser\u0103", "\xe2se\u015fi", "\xe2ser\u0103", "use\u015fi",
    "user\u0103", "ser\u0103m", "sesem", "indu", "\xe2ndu",
    "eaz\u0103", "e\u015fti", "e\u015fte", "\u0103\u015fti",
    "\u0103\u015fte", "ea\u0163i", "ia\u0163i", "ar\u0103m",
    "ur\u0103m", "ir\u0103m", "\xe2r\u0103m", "asem", "isem",
    "\xe2sem", "usem", "se\u015fi", "ser\u0103", "sese", "are",
    "ere", "ire", "\xe2re", "ind", "\xe2nd", "eze", "ezi", "esc",
    "\u0103sc", "eam", "eai", "eau", "iam", "iai", "iau",
    "a\u015fi", "ar\u0103", "u\u015fi", "ur\u0103", "i\u015fi",
    "ir\u0103", "\xe2\u015fi", "\xe2r\u0103", "ase", "ise",
    "\xe2se", "use", "a\u0163i", "e\u0163i", "i\u0163i",
    "\xe2\u0163i", "sei", "ez", "am", "ai", "au", "ea", "ia", "ui",
    "\xe2i", "\u0103m", "em", "im", "\xe2m", "se",
)
_RO_3_SIMPLE = (
    "seser\u0103\u0163i", "seser\u0103m", "ser\u0103\u0163i",
    "sese\u015fi", "seser\u0103", "ser\u0103m", "sesem",
    "se\u015fi", "ser\u0103", "sese", "a\u0163i", "e\u0163i",
    "i\u0163i", "\xe2\u0163i", "sei", "\u0103m", "em", "im",
    "\xe2m", "se",
)


def stem_ro(word: str) -> str:
    vowels = _RO_VOWELS
    word = word.lower()
    step1_success = False
    step2_success = False

    for i in range(1, len(word) - 1):
        if word[i - 1] in vowels and word[i + 1] in vowels:
            if word[i] == "u":
                word = word[:i] + "U" + word[i + 1:]
            elif word[i] == "i":
                word = word[:i] + "I" + word[i + 1:]

    r1, r2 = _r1r2(word, vowels)
    rv = _rv_standard(word, vowels)

    # STEP 0 — note the `suffix in r1`/`in rv` SUBSTRING tests (port quirk)
    for suffix in _RO_STEP0:
        if word.endswith(suffix):
            if suffix in r1:
                n = len(suffix)
                if suffix in ("ul", "ului"):
                    word = word[:-n]
                    rv = rv[:-n] if suffix in rv else ""
                elif (
                    suffix == "aua"
                    or suffix == "atei"
                    or (suffix == "ile" and word[-5:-3] != "ab")
                ):
                    word = word[:-2]
                elif suffix in ("ea", "ele", "elor"):
                    word = word[:-n] + "e"
                    rv = (rv[:-n] + "e") if suffix in rv else ""
                elif suffix in ("ii", "iua", "iei", "iile", "iilor", "ilor"):
                    word = word[:-n] + "i"
                    rv = (rv[:-n] + "i") if suffix in rv else ""
                elif suffix in ("a\u0163ie", "a\u0163ia"):
                    word = word[:-1]
            break

    # STEP 1: combining suffixes, reapplied until no replacement
    while True:
        replacement_done = False
        for suffix in _RO_STEP1:
            if word.endswith(suffix):
                n = len(suffix)
                if suffix in r1:
                    step1_success = True
                    replacement_done = True
                    if suffix in ("abilitate", "abilitati", "abilit\u0103i",
                                  "abilit\u0103\u0163i"):
                        word = word[:-n] + "abil"
                    elif suffix == "ibilitate":
                        word = word[:-5]
                    elif suffix in ("ivitate", "ivitati", "ivit\u0103i",
                                    "ivit\u0103\u0163i"):
                        word = word[:-n] + "iv"
                    elif suffix in (
                        "icitate", "icitati", "icit\u0103i",
                        "icit\u0103\u0163i", "icator", "icatori", "iciv",
                        "iciva", "icive", "icivi", "iciv\u0103", "ical",
                        "icala", "icale", "icali", "ical\u0103",
                    ):
                        word = word[:-n] + "ic"
                    elif suffix in (
                        "ativ", "ativa", "ative", "ativi", "ativ\u0103",
                        "a\u0163iune", "atoare", "ator", "atori",
                        "\u0103toare", "\u0103tor", "\u0103tori",
                    ):
                        word = word[:-n] + "at"
                        if suffix in r2:
                            r2 = r2[:-n] + "at"
                    elif suffix in (
                        "itiv", "itiva", "itive", "itivi", "itiv\u0103",
                        "i\u0163iune", "itoare", "itor", "itori",
                    ):
                        word = word[:-n] + "it"
                        if suffix in r2:
                            r2 = r2[:-n] + "it"
                else:
                    step1_success = False
                break
        if not replacement_done:
            break

    # STEP 2: standard suffixes
    for suffix in _RO_STEP2:
        if word.endswith(suffix):
            if suffix in r2:
                step2_success = True
                if suffix in ("iune", "iuni"):
                    if word[-5] == "\u0163":
                        word = word[:-5] + "t"
                elif suffix in ("ism", "isme", "ist", "ista", "iste",
                                "isti", "ist\u0103", "i\u015fti"):
                    word = word[: -len(suffix)] + "ist"
                else:
                    word = word[: -len(suffix)]
            break

    # STEP 3: verb suffixes — rv.index (FIRST occurrence), port quirk
    if not step1_success and not step2_success:
        for suffix in _RO_STEP3:
            if word.endswith(suffix):
                if suffix in rv:
                    if suffix in _RO_3_SIMPLE:
                        word = word[: -len(suffix)]
                        rv = rv[: -len(suffix)]
                    else:
                        if (
                            not rv.startswith(suffix)
                            and rv[rv.index(suffix) - 1]
                            not in "aeio\u0103\xe2\xee"
                        ):
                            word = word[: -len(suffix)]
                    break

    # STEP 4: final vowel
    for suffix in ("ie", "a", "e", "i", "\u0103"):
        if word.endswith(suffix):
            if suffix in rv:
                word = word[: -len(suffix)]
            break

    return word.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# English — snowball.tartarus.org/algorithms/english/stemmer.html (porter2)
# ---------------------------------------------------------------------------

_EN_VOWELS = "aeiouy"
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_LI_END = "cdeghkmnrt"
# exceptional forms + invariants + -eed family (porter2 exception list)
_EN_SPECIAL = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
    "news": "news", "howe": "howe", "atlas": "atlas", "cosmos": "cosmos",
    "bias": "bias", "andes": "andes",
}
for _w in ("inning", "outing", "canning", "herring", "earring"):
    _EN_SPECIAL[_w] = _w
    _EN_SPECIAL[_w + "s"] = _w
for _w in ("proceed", "exceed", "succeed"):
    for _suf in ("", "s", "ed", "ing"):
        _EN_SPECIAL[_w + _suf] = _w
del _w, _suf

# step 2/3/4 suffix maps, in the port's match order (longest-first).
# Each entry is (suffix, drop, replacement, r2_fallback): drop chars are
# removed and `replacement` appended (None = plain deletion); r2_fallback
# feeds _en_replace's region-collapse quirk.
_EN_STEP2 = (
    ("ization", 7, "ize", ""), ("ational", 7, "ate", "e"),
    ("fulness", 4, None, ""), ("ousness", 7, "ous", ""),
    ("iveness", 7, "ive", "e"), ("tional", 2, None, ""),
    ("biliti", 6, "ble", ""), ("lessli", 2, None, ""),
    ("entli", 2, None, ""), ("ation", 5, "ate", "e"),
    ("alism", 5, "al", ""), ("aliti", 5, "al", ""),
    ("ousli", 5, "ous", ""), ("iviti", 5, "ive", "e"),
    ("fulli", 2, None, ""), ("enci", 1, "e", ""), ("anci", 1, "e", ""),
    ("abli", 1, "e", ""), ("izer", 4, "ize", ""), ("ator", 4, "ate", "e"),
    ("alli", 4, "al", ""), ("bli", 3, "ble", ""), ("ogi", 1, None, ""),
    ("li", 2, None, ""),
)
_EN_STEP3 = (
    ("ational", 7, "ate", ""), ("tional", 2, None, ""),
    ("alize", 3, None, ""), ("icate", 5, "ic", ""), ("iciti", 5, "ic", ""),
    ("ative", 5, None, ""), ("ical", 4, "ic", ""), ("ness", 4, None, ""),
    ("ful", 3, None, ""),
)
_EN_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ism",
    "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
)


def _en_cut(word: str, r1: str, r2: str, n: int):
    """Drop n chars from the word and both regions in parallel; slicing a
    region shorter than n leaves '' (the port's unguarded r[:-n])."""
    return word[:-n], r1[:-n], r2[:-n]


def _en_replace(word: str, r1: str, r2: str, n: int, rep: str,
                r2_fallback: str = ""):
    """Replace an n-char suffix with `rep`, mirroring the port's guarded
    parallel region updates (english.py:340-420): a region SHORTER than the
    suffix collapses to '' for R1 but to `r2_fallback` for R2 — the port
    hardcodes 'e' there for the ate/ive families, a quirk kept for parity."""
    word = word[:-n] + rep
    r1 = (r1[:-n] + rep) if len(r1) >= n else ""
    r2 = (r2[:-n] + rep) if len(r2) >= n else r2_fallback
    return word, r1, r2


def stem_en(word: str) -> str:
    """Snowball English (porter2).  Behavior-parity reimplementation of the
    reference's NLTK port (lang/snowball/english.py:143-517), exercised by
    a hypothesis fuzz; the reference's stemmer_for_language routes plain
    'en' here (lang/__init__.py:139-159), while 'en_porter' keeps the
    classic porter algorithm."""
    word = word.lower()
    if word in _EN_SPECIAL:
        return _EN_SPECIAL[word]
    word = (
        word.replace("’", "'").replace("‘", "'")
        .replace("‛", "'")
    )
    if word.startswith("'"):
        word = word[1:]
    return _en_core(word)


def porter2_stem(word: str) -> str:
    """The reference's standalone porter2 module (lang/porter2.py:319-346;
    zero callers there — public API kept for completeness).  Fuzz-identical
    to the snowball English core on its reachable inputs; only the prologue
    differs: a <=2-length early return, no lowercasing, no unicode-
    apostrophe mapping, and the exception lookup happens after the initial
    apostrophe strip."""
    if len(word) <= 2:
        return word
    if word.startswith("'"):
        word = word[1:]
    if word in _EN_SPECIAL:
        return _EN_SPECIAL[word]
    return _en_core(word)


def _en_core(word: str) -> str:
    # consonant-y protection: initial y and y-after-vowel become Y
    if word.startswith("y"):
        word = "Y" + word[1:]
    for i in range(1, len(word)):
        if word[i] == "y" and word[i - 1] in _EN_VOWELS:
            word = word[:i] + "Y" + word[i + 1:]
    # R1/R2, with the gener/commun/arsen prefix override
    if word.startswith(("gener", "commun", "arsen")):
        r1 = word[6:] if word.startswith("commun") else word[5:]
        r2 = ""
        for i in range(1, len(r1)):
            if r1[i] not in _EN_VOWELS and r1[i - 1] in _EN_VOWELS:
                r2 = r1[i + 1:]
                break
    else:
        r1, r2 = _r1r2(word, _EN_VOWELS)

    # step 0: possessives
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word, r1, r2 = _en_cut(word, r1, r2, len(suf))
            break

    # step 1a: plural-ish endings
    for suf in ("sses", "ied", "ies", "us", "ss", "s"):
        if not word.endswith(suf):
            continue
        if suf == "sses":
            word, r1, r2 = _en_cut(word, r1, r2, 2)
        elif suf in ("ied", "ies"):
            n = 2 if len(word) > len(suf) + 1 else 1
            word, r1, r2 = _en_cut(word, r1, r2, n)
        elif suf == "s" and any(c in _EN_VOWELS for c in word[:-2]):
            word, r1, r2 = _en_cut(word, r1, r2, 1)
        break

    # step 1b: eed/ed/ing families
    for suf in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if not word.endswith(suf):
            continue
        if suf in ("eed", "eedly"):
            if r1.endswith(suf):
                word, r1, r2 = _en_replace(word, r1, r2, len(suf), "ee")
        elif any(c in _EN_VOWELS for c in word[:-len(suf)]):
            word, r1, r2 = _en_cut(word, r1, r2, len(suf))
            if word.endswith(("at", "bl", "iz")):
                word += "e"
                r1 += "e"
                # port quirk: r2 only gets the 'e' on longer stems
                # (english.py:265-268)
                if len(word) > 5 or len(r1) >= 3:
                    r2 += "e"
            elif word.endswith(_EN_DOUBLES):
                word, r1, r2 = _en_cut(word, r1, r2, 1)
            elif (
                r1 == ""
                and len(word) >= 3
                and word[-1] not in _EN_VOWELS
                and word[-1] not in "wxY"
                and word[-2] in _EN_VOWELS
                and word[-3] not in _EN_VOWELS
            ) or (
                r1 == ""
                and len(word) == 2
                and word[0] in _EN_VOWELS
                and word[1] not in _EN_VOWELS
            ):
                # short-word: restore the e; regions only if non-empty
                word += "e"
                if r1:
                    r1 += "e"
                if r2:
                    r2 += "e"
        break

    # step 1c: final y -> i after a consonant
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _EN_VOWELS:
        word = word[:-1] + "i"
        r1 = (r1[:-1] + "i") if r1 else ""
        r2 = (r2[:-1] + "i") if r2 else ""

    # step 2 (R1): derivational suffix map
    for suf, drop, rep, fb in _EN_STEP2:
        if not word.endswith(suf):
            continue
        if r1.endswith(suf):
            if rep is None:
                if suf == "ogi":
                    if word[-4] == "l":
                        word, r1, r2 = _en_cut(word, r1, r2, drop)
                elif suf != "li" or word[-3] in _EN_LI_END:
                    word, r1, r2 = _en_cut(word, r1, r2, drop)
            else:
                word, r1, r2 = _en_replace(word, r1, r2, drop, rep, fb)
        break

    # step 3 (R1; ative needs R2)
    for suf, drop, rep, fb in _EN_STEP3:
        if not word.endswith(suf):
            continue
        if r1.endswith(suf):
            if rep is None:
                if suf != "ative" or r2.endswith(suf):
                    word, r1, r2 = _en_cut(word, r1, r2, drop)
            else:
                word, r1, r2 = _en_replace(word, r1, r2, drop, rep, fb)
        break

    # step 4 (R2)
    for suf in _EN_STEP4:
        if not word.endswith(suf):
            continue
        if r2.endswith(suf):
            if suf == "ion":
                if word[-4] in "st":
                    word, r1, r2 = _en_cut(word, r1, r2, 3)
            else:
                word, r1, r2 = _en_cut(word, r1, r2, len(suf))
        break

    # step 5: trailing e / double l
    if r2.endswith("l") and word[-2] == "l":
        word = word[:-1]
    elif r2.endswith("e"):
        word = word[:-1]
    elif r1.endswith("e") and len(word) >= 4 and (
        word[-2] in _EN_VOWELS
        or word[-2] in "wxY"
        or word[-3] not in _EN_VOWELS
        or word[-4] in _EN_VOWELS
    ):
        word = word[:-1]

    return word.replace("Y", "y")


STEMMERS = {"de": stem_de, "es": stem_es, "fr": stem_fr, "it": stem_it,
            "pt": stem_pt, "ru": stem_ru, "da": stem_da, "no": stem_no,
            "sv": stem_sv, "nl": stem_nl, "fi": stem_fi, "hu": stem_hu,
            "ro": stem_ro, "en": stem_en}


def stemmer_for(lang: str):
    """Stemming function for a language code, or None (lang/__init__.py
    stemmer_for_language:139-159 analogue): 'en' routes to the snowball
    English stemmer (porter2), 'en_porter' to the faster classic porter,
    'ar' to ISRI — matching the reference's routing exactly."""
    if lang == "en_porter":
        from whoosh_reloaded_spark.porter import stem

        return stem
    code = lang.split("_")[0]
    if code == "ar":
        from whoosh_reloaded_spark.isri import ISRIStemmer

        return ISRIStemmer().stem
    return STEMMERS.get(code)
