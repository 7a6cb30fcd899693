"""Golden token-stream parity: LanguageAnalyzer(de/es/fr) + snowball
stemmers vs the reference (analysis/analyzers.py:277-315,
lang/snowball/{german,spanish,french}.py)."""

import random

import pytest

from tests.conftest import reference_importable

pytestmark = pytest.mark.skipif(
    not reference_importable(), reason="reference not importable"
)

SENTENCES = {
    "de": [
        "Die Katzen liefen schnell durch die dunklen Straßen der Städte",
        "Freundlichkeit und Ehrlichkeit sind wichtige Eigenschaften",
        "Das Verständnis wissenschaftlicher Erkenntnisse wächst täglich",
        "kleiner kleines kleinem kleinen Haus Häuser Häusern",
    ],
    "es": [
        "Los gatos corrían rápidamente por las calles oscuras",
        "La felicidad y la amabilidad son cualidades importantes",
        "comiéndoselo dándoselas levantándose lógicamente",
        "canciones universidades posibilidades ecología",
    ],
    "fr": [
        "Les chats couraient rapidement dans les rues sombres",
        "La gentillesse et l'honnêteté sont des qualités importantes",
        "nationalement heureusement continuellement vraiment",
        "chevaux journaux amicaux issements conditionnellement",
    ],
}


def ref_tokens(lang, text):
    from whoosh.analysis import LanguageAnalyzer as RefLA

    ana = RefLA(lang)
    return [(t.text, t.pos) for t in ana(text, positions=True)]


def our_tokens(lang, text):
    from whoosh_reloaded_spark.analyzers import LanguageAnalyzer

    return LanguageAnalyzer(lang)(text)


@pytest.mark.parametrize("lang", ["de", "es", "fr"])
def test_sentence_parity(lang):
    for s in SENTENCES[lang]:
        assert our_tokens(lang, s) == ref_tokens(lang, s), (lang, s)


@pytest.mark.parametrize(
    "lang,charset",
    [
        ("en", "abcdefghilmnoprstuvwxyz'"),
        ("de", "abcdefghiklmnorstuwyäöüß"),
        ("es", "abcdeghilmnopqrstuvyáéíóúü"),
        ("fr", "abcdefghilmnopqrstuvyâàëéêèïîôûùç"),
        ("it", "abcdeghilmnopqrstuvzàèìòùáéíóú"),
        ("pt", "abcdeghilmnopqrstuvzãõçáéíóúâêô"),
        ("ru", "абвгдежзийклмнопрстуфхцчшщъыьэюяё"),
        ("da", "abcdefghijklmnoprstuvyzæåø"),
        ("no", "abcdefghijklmnoprstuvyzæåø"),
        ("sv", "abcdefghijklmnoprstuvyzäåö"),
        ("nl", "abcdefghijklmnoprstuvwyzèéëïöü"),
        ("fi", "abdeghijklmnoprstuvyäö"),
        ("hu", "abcdeghijklmnoprstuvyzöüáéíóõúû"),
        ("ro", "abcdeghilmnoprstuvzăâîşţ"),
    ],
)
def test_stemmer_fuzz_parity(lang, charset):
    from whoosh.lang.snowball.french import FrenchStemmer
    from whoosh.lang.snowball.german import GermanStemmer
    from whoosh.lang.snowball.italian import ItalianStemmer
    from whoosh.lang.snowball.portugese import PortugueseStemmer
    from whoosh.lang.snowball.danish import DanishStemmer
    from whoosh.lang.snowball.finnish import FinnishStemmer
    from whoosh.lang.snowball.hungarian import HungarianStemmer
    from whoosh.lang.snowball.romanian import RomanianStemmer
    from whoosh.lang.snowball.dutch import DutchStemmer
    from whoosh.lang.snowball.norwegian import NorwegianStemmer
    from whoosh.lang.snowball.russian import RussianStemmer
    from whoosh.lang.snowball.swedish import SwedishStemmer
    from whoosh.lang.snowball.spanish import SpanishStemmer

    from whoosh.lang.snowball.english import EnglishStemmer

    from whoosh_reloaded_spark.snowball import stemmer_for

    ref = {
        "en": EnglishStemmer().stem,
        "de": GermanStemmer().stem,
        "es": SpanishStemmer().stem,
        "fr": FrenchStemmer().stem,
        "it": ItalianStemmer().stem,
        "pt": PortugueseStemmer().stem,
        "ru": RussianStemmer().stem,
        "da": DanishStemmer().stem,
        "no": NorwegianStemmer().stem,
        "sv": SwedishStemmer().stem,
        "nl": DutchStemmer().stem,
        "fi": FinnishStemmer().stem,
        "hu": HungarianStemmer().stem,
        "ro": RomanianStemmer().stem,
    }[lang]
    ours = stemmer_for(lang)
    rng = random.Random(1234)
    checked = 0
    for _ in range(4000):
        w = "".join(rng.choice(charset) for _ in range(rng.randint(1, 12)))
        try:
            want = ref(w)
        except Exception:
            continue  # reference IndexError corner (documented divergence)
        assert ours(w) == want, w
        checked += 1
    assert checked > 3900


def test_stop_only_language():
    # a language with a stop list but no stemmer here: stop filtering active
    from whoosh_reloaded_spark.analyzers import LanguageAnalyzer

    toks = LanguageAnalyzer("tr")("ve kedi evde oturuyor")
    texts = [t for t, _ in toks]
    assert "ve" not in texts and "kedi" in texts


def test_german_index_rank_parity(spark, tmp_path_factory):
    """End-to-end: German-analyzed index, BM25 rank+score parity."""
    from whoosh import analysis as wana
    from whoosh import fields, index
    from whoosh.query import Term as WT

    from whoosh_reloaded_spark.analyzers import LanguageAnalyzer
    from whoosh_reloaded_spark.index import build_index
    from whoosh_reloaded_spark.query import Searcher, Term

    docs = [
        "Die Katzen liefen schnell durch die Straßen",
        "Eine Katze lief durch den dunklen Wald",
        "Die Straße war voller schneller Autos",
        "Der Wald ist dunkel und still in der Nacht",
        "Schnelle Katzen jagen in dunklen Straßen",
        "Autos fahren schnell auf der Straße durch die Stadt",
    ]
    schema = fields.Schema(
        url=fields.ID(stored=True, unique=True),
        text=fields.TEXT(analyzer=wana.LanguageAnalyzer("de")),
    )
    d = tmp_path_factory.mktemp("whoosh_de")
    wix = index.create_in(str(d), schema)
    w = wix.writer()
    for i, t in enumerate(docs):
        w.add_document(url=f"{i:03d}", text=t)
    w.commit()

    df = spark.createDataFrame(
        [(f"{i:03d}", t) for i, t in enumerate(docs)], "url string, text string"
    )
    s = Searcher(build_index(df, analyzer=LanguageAnalyzer("de")))

    # query via the stemmed form ('katz', 'strass') — both engines agree
    from whoosh_reloaded_spark.snowball import stem_de

    for word in ("katzen", "straße", "schnell", "dunklen"):
        q = stem_de(word)
        with wix.searcher() as ws:
            theirs = [(h["url"], h.score) for h in ws.search(WT("text", q), limit=10)]
        ours = [(u, sc) for _, u, sc in s.search_list(Term(q), 10)]
        assert [u for u, _ in ours] == [u for u, _ in theirs], word
        for (u1, s1), (u2, s2) in zip(ours, theirs):
            assert s1 == pytest.approx(s2, rel=1e-9), (word, u1)


def test_stemmer_routing_parity():
    """stemmer_for mirrors the reference's stemmer_for_language routing
    (lang/__init__.py:139-159): plain 'en' -> snowball English (porter2),
    'en_porter' -> classic porter, 'ar' -> ISRI."""
    from whoosh_reloaded_spark.porter import stem as porter_stem
    from whoosh_reloaded_spark.snowball import stem_en, stemmer_for

    assert stemmer_for("en") is stem_en
    assert stemmer_for("en_US") is stem_en
    assert stemmer_for("en_porter") is porter_stem
    # porter2 vs porter discriminator: 'generously' (gener- R1 override)
    assert stem_en("generously") == "generous"
    assert porter_stem("generously") == "gener"
    ar = stemmer_for("ar")
    assert ar is not None and ar("الكتاب") == "كتب"


def test_porter2_standalone_parity():
    """porter2_stem mirrors the reference's standalone lang/porter2.py
    (zero callers there, public API): same core as snowball English but
    with porter2's prologue — <=2-length early return, no lowercasing,
    apostrophe strip before the exception lookup."""
    import random
    import string

    from whoosh.lang.porter2 import stem as ref_p2

    from whoosh_reloaded_spark.snowball import porter2_stem

    for w in ["proceeding", "proceeded", "exceeds", "innings",
              "Generously", "EARLY", "'twas", "skis", "'d", "s'"]:
        assert porter2_stem(w) == ref_p2(w), w
    rng = random.Random(11)
    cs = string.ascii_letters + "'y"
    checked = 0
    for _ in range(6000):
        w = "".join(rng.choice(cs) for _ in range(rng.randint(1, 14)))
        try:
            want = ref_p2(w)
        except Exception:
            continue
        assert porter2_stem(w) == want, repr(w)
        checked += 1
    assert checked > 5900
