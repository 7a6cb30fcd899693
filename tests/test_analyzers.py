"""Parity of the extended analyzer family vs the reference token streams,
plus end-to-end index builds with non-default analyzers."""

import pytest

from tests.conftest import reference_importable
from whoosh_reloaded_spark.analyzers import (
    IDAnalyzer,
    KeywordAnalyzer,
    NgramAnalyzer,
    PathAnalyzer,
    RegexAnalyzer,
    SimpleAnalyzer,
    SubstitutionAnalyzer,
)

pytestmark = pytest.mark.skipif(
    not reference_importable(), reason="reference not importable"
)

TEXTS = [
    "hi there big-time, what's up",
    "/usr/local/share/doc",
    "The Quick.Brown fox",
    "a,b, c ,  d,",
    "straße café 3.14",
    "",
]


def _ref_stream(tokenizer, text, **kw):
    return [(t.text, t.pos) for t in tokenizer(text, positions=True, **kw)]


def test_id_analyzer_parity():
    from whoosh.analysis import IDTokenizer

    ana = IDAnalyzer()
    for txt in TEXTS:
        if txt == "":
            continue  # reference yields one empty token; ours drops empties
        assert ana(txt) == _ref_stream(IDTokenizer(), txt), txt


def test_space_separated_parity():
    from whoosh.analysis import SpaceSeparatedTokenizer

    ana = KeywordAnalyzer()
    for txt in TEXTS:
        assert ana(txt) == _ref_stream(SpaceSeparatedTokenizer(), txt), txt


def test_comma_separated_parity():
    from whoosh.analysis import CommaSeparatedTokenizer

    ana = KeywordAnalyzer(commas=True)
    for txt in TEXTS:
        theirs = [(t, p) for t, p in _ref_stream(CommaSeparatedTokenizer(), txt) if t]
        # reference keeps empty tokens after strip; ours drops them — compare
        # against the non-empty stream with its original positions
        ours = ana(txt)
        assert [t for t, _ in ours] == [t for t, _ in theirs], txt


def test_path_tokenizer_parity():
    from whoosh.analysis import PathTokenizer

    ana = PathAnalyzer()
    for txt in ["/a/b/c", "/usr/local/share", "rel/path/x", "single"]:
        assert ana(txt) == _ref_stream(PathTokenizer(), txt), txt


def test_ngram_tokenizer_parity():
    from whoosh.analysis import NgramTokenizer

    for mn, mx in [(2, 2), (3, 5), (4, 4)]:
        ana = NgramAnalyzer(mn, mx, lowercase=False)
        for txt in ["hi there", "abc", "ab", "abcdefg"]:
            assert ana(txt) == _ref_stream(NgramTokenizer(mn, mx), txt), (mn, mx, txt)


def test_simple_analyzer_parity():
    from whoosh.analysis import SimpleAnalyzer as WSimple

    ana = SimpleAnalyzer()
    for txt in TEXTS:
        theirs = [(t.text, t.pos) for t in WSimple()(txt, positions=True)]
        assert ana(txt) == theirs, txt


def test_substitution_analyzer():
    # space-separated keeps hyphens inside tokens; substitution strips them
    ana = SubstitutionAnalyzer(KeywordAnalyzer(), r"-", "")
    assert [t for t, _ in ana("big-time no-op")] == ["bigtime", "noop"]


def test_ngram_index_end_to_end(spark):
    """NGRAM field equivalent: build an index with the ngram analyzer and
    match a partial-word query (fields.py:1228-1330 use case)."""
    from whoosh_reloaded_spark.corpus import PAGES_SCHEMA, generate_rows
    from whoosh_reloaded_spark.index import build_index
    from whoosh_reloaded_spark.query import Searcher, Term

    rows = list(generate_rows(60))
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    ix = build_index(df, analyzer=NgramAnalyzer(3, 3)).persist()
    s = Searcher(ix)
    # 'end' is a trigram inside 'render*' words
    hits = s.search_list(Term("end"), 10)
    assert hits
    # any hit's text contains the trigram
    texts = {r[0]: r[3] for r in rows}
    for _, uid, _ in hits:
        assert "end" in texts[uid].lower()


def test_keyword_index_end_to_end(spark):
    from whoosh_reloaded_spark.corpus import PAGES_SCHEMA, generate_rows
    from whoosh_reloaded_spark.index import build_index
    from whoosh_reloaded_spark.query import Searcher, Term

    rows = list(generate_rows(40))
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    ix = build_index(df, analyzer=KeywordAnalyzer(lowercase=True)).persist()
    s = Searcher(ix)
    assert s.search_list(Term("alfa"), 10)


def test_porter_parity_vocab():
    import gzip
    import re as _re

    from whoosh.lang.porter import stem as ref_stem

    from whoosh_reloaded_spark.porter import stem as my_stem

    words = set()
    with gzip.open(
        "/root/reference/tests/english-words.10.gz", "rt", encoding="latin-1"
    ) as f:
        for line in f:
            w = line.strip().lower()
            if _re.fullmatch(r"[a-z]+", w):
                words.add(w)
    for sfx in ("ing", "ed", "s", "ational", "fulness", "ization", "eed", "y"):
        words.update(w + sfx for w in list(words)[:500])
    for w in words:
        assert my_stem(w) == ref_stem(w), w


def test_stemming_analyzer_matches_reference_stream():
    from whoosh.analysis import StemmingAnalyzer as WStem

    from whoosh_reloaded_spark.analyzers import StemmingAnalyzer

    ana = StemmingAnalyzer()
    for txt in [
        "The fundamentally rationalized organizations were running quickly",
        "hopping hoped hopes conflated sky flying dying agreed",
        "traditional apologizing controlling possession",
    ]:
        theirs = [(t.text, t.pos) for t in WStem()(txt, positions=True)]
        assert ana(txt) == theirs, txt


def test_stemming_index_end_to_end(spark):
    from whoosh_reloaded_spark.analyzers import StemmingAnalyzer
    from whoosh_reloaded_spark.corpus import PAGES_SCHEMA, generate_rows
    from whoosh_reloaded_spark.index import build_index
    from whoosh_reloaded_spark.query import Searcher, Term

    rows = list(generate_rows(60))
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    ix = build_index(df, analyzer=StemmingAnalyzer()).persist()
    s = Searcher(ix)
    # 'render', 'rendered', 'rendering' all stem to 'render'
    hits = s.search_list(Term("render"), 20)
    texts = {r[0]: r[3].lower() for r in rows}
    assert hits
    assert any("rendering" in texts[uid] or "rendered" in texts[uid]
               for _, uid, _ in hits)


def test_accent_folding():
    from whoosh_reloaded_spark.analyzers import AccentFoldingAnalyzer

    ana = AccentFoldingAnalyzer(SimpleAnalyzer())
    toks = [t for t, _ in ana("café naïve straße Frantiśek øre")]
    assert toks == ["cafe", "naive", "strase", "frantisek", "ore"]


def test_shingle_biword_parity():
    from whoosh.analysis import BiWordFilter, RegexTokenizer, ShingleFilter

    from whoosh_reloaded_spark.analyzers import BiWordAnalyzer, ShingleAnalyzer

    texts = ["the sign of four", "better a witty fool than a foolish wit", "one"]
    inner = RegexAnalyzer(lowercase=False)
    for txt in texts:
        theirs = [
            (t.text, t.pos)
            for t in (RegexTokenizer() | BiWordFilter())(txt, positions=True)
        ]
        assert BiWordAnalyzer(inner)(txt) == theirs, txt
        theirs3 = [
            (t.text, t.pos)
            for t in (RegexTokenizer() | ShingleFilter(3, " "))(txt, positions=True)
        ]
        assert ShingleAnalyzer(inner, 3, " ")(txt) == theirs3, txt


def test_intraword_parity_fuzz():
    import random
    import string

    from whoosh.analysis import IntraWordFilter, LowercaseFilter, RegexTokenizer

    from whoosh_reloaded_spark.analyzers import IntraWordAnalyzer

    rng = random.Random(3)
    texts = [
        "WikiWord", "PowerShot SD500", "Super-Duper-XL500-42-AutoCoder!",
        "mb500", "po4life", "o2f1x", "A1B2", "abc123def", "O'Neil's car",
        "A's+B's&C's", "wi-fi WiFi 802.11b", "--lead trail-- mid--dle", "x", "",
    ]
    alph = string.ascii_letters + string.digits + "-_'.!x "
    for _ in range(120):
        texts.append("".join(rng.choice(alph) for _ in range(rng.randint(1, 25))))
    for mw, mn in [(False, False), (True, True), (True, False), (False, True)]:
        ref = (
            RegexTokenizer(r"\S+")
            | IntraWordFilter(mergewords=mw, mergenums=mn)
            | LowercaseFilter()
        )
        ana = IntraWordAnalyzer(mergewords=mw, mergenums=mn)
        for txt in texts:
            theirs = [(t.text, t.pos) for t in ref(txt, positions=True)]
            assert ana(txt) == theirs, (mw, mn, txt)


def test_multi_mode_analyzer(spark):
    from whoosh_reloaded_spark.analyzers import (
        IntraWordAnalyzer,
        MultiModeAnalyzer,
    )
    from whoosh_reloaded_spark.corpus import PAGES_SCHEMA
    from whoosh_reloaded_spark.index import build_index
    from whoosh_reloaded_spark.query import Searcher, Term
    from whoosh_reloaded_spark.query.parser import QueryParser

    ana = MultiModeAnalyzer(
        IntraWordAnalyzer(mergewords=True, mergenums=True),
        IntraWordAnalyzer(mergewords=False, mergenums=False),
    )
    import datetime as dt

    rows = [
        (f"u{i}", dt.datetime(2026, 1, 1), b"", t, "en")
        for i, t in enumerate(["the WiFi router", "plain wifi word", "wi-fi dongle"])
    ]
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    ix = build_index(df, analyzer=ana).persist()
    s = Searcher(ix)
    # merged index token 'wifi' matches all three docs ('wifi' merged from
    # WiFi and wi-fi at index time, literal in doc 1)
    assert len(s.search_list(Term("wifi"), 10)) == 3
    # query-mode parsing does NOT merge: "wi-fi" parses to wi AND fi, which
    # matches the docs with split subwords (WiFi, wi-fi) but not the one
    # that only has the literal merged token
    q = QueryParser(analyzer=ana).parse("wi-fi")
    hits = {u for _, u, _ in s.search_list(q, 10)}
    assert hits == {"u0", "u2"}


def test_charset_tables_byte_identical():
    """Both fold tables must be byte-identical to the reference's
    (support/charset.py accent_map + charset_table_to_dict(default_charset)),
    and the filter output must match CharsetFilter per token over unicode
    fixtures."""
    import pytest as _pt

    from tests.conftest import reference_importable

    if not reference_importable():
        _pt.skip("reference not importable")
    from whoosh.support.charset import (
        accent_map,
        charset_table_to_dict,
        default_charset,
    )

    from whoosh_reloaded_spark.charset import accent_charmap, default_charmap

    assert accent_charmap() == dict(accent_map)
    ref_tab = {
        k: v for k, v in charset_table_to_dict(default_charset).items()
        if v is not None
    }
    assert default_charmap() == ref_tab

    from whoosh.analysis import CharsetFilter, RegexTokenizer

    fixtures = [
        "café naïve straße Frantiśek øre",
        "ÀÁÂÃÄÅ àáâãäå ČĆ čć ĐĎ đď Łł Ñ ñ ŠŚ šś Žž",
        "Ελληνικά Русский 日本語 한국어",
        "ﬁﬂ ½ ² Ⅷ №",
    ]
    for cm, mode in ((accent_map, "accent"),):
        chain = RegexTokenizer() | CharsetFilter(cm)
        from whoosh_reloaded_spark.analyzers import (
            AccentFoldingAnalyzer,
            RegexAnalyzer,
        )

        ana = AccentFoldingAnalyzer(RegexAnalyzer(lowercase=False), mode=mode)
        for text in fixtures:
            theirs = [t.text for t in chain(text)]
            ours = [t for t, _ in ana(text)]
            assert ours == theirs, (mode, text)


def test_ngramword_parity():
    """NgramWordAnalyzer vs the reference (index + query modes), all `at`
    variants."""
    import pytest as _pt

    from tests.conftest import reference_importable

    if not reference_importable():
        _pt.skip("reference not importable")
    from whoosh.analysis import NgramWordAnalyzer as RefNWA

    from whoosh_reloaded_spark.analyzers import NgramWordAnalyzer

    texts = ["hello there", "a bc def ghij klmno", "Tokenization RULES ok"]
    for minsize, maxsize, at in [(4, None, None), (2, 4, None),
                                 (3, 5, "start"), (3, 5, "end"), (2, 2, None)]:
        ref = RefNWA(minsize, maxsize=maxsize, at=at)
        ours = NgramWordAnalyzer(minsize, maxsize=maxsize, at=at)
        for text in texts:
            theirs_ix = [(t.text, t.pos) for t in ref(text, positions=True)]
            assert ours(text) == theirs_ix, ("index", minsize, maxsize, at, text)
            theirs_q = [t.text for t in ref(text, mode="query", positions=True)]
            assert ours.query_terms(text) == theirs_q, (
                "query", minsize, maxsize, at, text)


def test_delimited_boost_parity(spark):
    """Per-token boosts (DelimitedAttributeFilter, filters.py:419-482):
    posting weights sum boosts; BM25 rank+score parity vs the reference."""
    import pytest as _pt

    from tests.conftest import reference_importable

    if not reference_importable():
        _pt.skip("reference not importable")
    from whoosh import fields, index
    from whoosh.analysis import (
        DelimitedAttributeFilter,
        LowercaseFilter,
        RegexTokenizer,
    )
    from whoosh.query import Term as WT

    from whoosh_reloaded_spark.analyzers import DelimitedBoostAnalyzer
    from whoosh_reloaded_spark.index import build_index
    from whoosh_reloaded_spark.query import Searcher, Term

    docs = [
        "image render^2 file^0.5 render",
        "render file image^3",
        "file file render^4 image",
        "image image image render",
    ]
    ana = RegexTokenizer(r"\S+") | LowercaseFilter() | DelimitedAttributeFilter()
    schema = fields.Schema(
        url=fields.ID(stored=True, unique=True),
        text=fields.TEXT(analyzer=ana),
    )
    import tempfile

    d = tempfile.mkdtemp()
    wix = index.create_in(d, schema)
    w = wix.writer()
    for i, t in enumerate(docs):
        w.add_document(url=f"{i:03d}", text=t)
    w.commit()

    df = spark.createDataFrame(
        [(f"{i:03d}", t) for i, t in enumerate(docs)], "url string, text string"
    )
    ours_ana = DelimitedBoostAnalyzer(RegexAnalyzer(expression=r"\S+"))
    s = Searcher(build_index(df, analyzer=ours_ana))

    for word in ("render", "image", "file"):
        with wix.searcher() as ws:
            theirs = [(h["url"], h.score) for h in ws.search(WT("text", word), limit=10)]
        ours = [(u, sc) for _, u, sc in s.search_list(Term(word), 10)]
        assert [u for u, _ in ours] == [u for u, _ in theirs], word
        for (u1, s1), (u2, s2) in zip(ours, theirs):
            import pytest as _pt2

            assert s1 == _pt2.approx(s2, rel=1e-9), (word, u1)
