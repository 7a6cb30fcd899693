"""Golden parity for the corrector object family (reference
spelling.py:39-173): ListCorrector, MultiCorrector, ReaderCorrector as a
composable object, and the self-inclusion behavior of suggest."""

import gzip
import os

import pytest

from tests.conftest import reference_importable
from whoosh_reloaded_spark.corpus import PAGES_SCHEMA
from whoosh_reloaded_spark.index import build_index
from whoosh_reloaded_spark.query import Searcher
from whoosh_reloaded_spark.spelling import (
    ListCorrector,
    MultiCorrector,
    levenshtein_distance,
)

pytestmark = pytest.mark.skipif(
    not reference_importable(), reason="reference not importable"
)

# the reference's test_spelling.py word list
_wordlist = sorted(
    """
    render animation animate shader shading zebra koala
    ready kismet reaction page delete quick fox jumped
    over lazy dog wicked erase red team yellow under interest
    open print acrid sear deaf feed grow heal jolly kilt
    low zone xylophone crown vale brown neat meat reduction
    blunder preaction lamppost
    """.split()
)


def test_levenshtein_matches_reference():
    from whoosh.support.levenshtein import levenshtein

    words = _wordlist + ["reoction", "kaola", "specail", ""]
    for a in words:
        for b in words:
            assert levenshtein_distance(a, b) == levenshtein(a, b), (a, b)
            for lim in (1, 2):
                d = levenshtein_distance(a, b, lim)
                ref = levenshtein(a, b)
                assert (d <= lim) == (ref <= lim), (a, b, lim)


@pytest.mark.parametrize(
    "typo,kwargs",
    [
        ("reoction", dict(maxdist=2)),
        ("reoction", dict(maxdist=2, limit=20)),
        ("reoction", dict(maxdist=1)),
        ("zebra", dict(maxdist=2)),        # word present in the list
        ("redu", dict(maxdist=2, prefix=2)),
        ("shade", dict(maxdist=2, prefix=1, limit=10)),
        ("lampost", dict(maxdist=1)),
        ("xxxx", dict(maxdist=1)),          # no matches
    ],
)
def test_list_corrector_parity(typo, kwargs):
    from whoosh import spelling as wsp

    theirs = wsp.ListCorrector(_wordlist).suggest(typo, **kwargs)
    ours = ListCorrector(_wordlist).suggest(typo, **kwargs)
    assert ours == theirs, (typo, kwargs)


def test_list_corrector_wordfile_parity():
    """The reference's test_wordfile shape over its bundled 10k-word
    english list (tests/english-words.10.gz)."""
    from whoosh import spelling as wsp

    path = "/root/reference/tests/english-words.10.gz"
    if not os.path.exists(path):
        pytest.skip("reference word file missing")
    with gzip.open(path, "rb") as f:
        words = sorted(line.decode("latin1").strip().lower() for line in f)
    ours = ListCorrector(words)
    theirs = wsp.ListCorrector(words)
    for typo in ("specail", "receeve", "teh", "wrod"):
        assert ours.suggest(typo) == theirs.suggest(typo), typo


def test_multi_corrector_parity():
    """MultiCorrector merging two ListCorrectors with max/min ops
    (reference spelling.py:155-173)."""
    from whoosh import spelling as wsp

    la, lb = sorted(_wordlist[: len(_wordlist) // 2 + 4]), sorted(
        _wordlist[len(_wordlist) // 2 - 4:]
    )
    class FixedMulti(wsp.MultiCorrector):
        # the reference's _suggestions returns (sug, score) items into a
        # (score, sug) protocol and crashes; reuse its merge, fix the order
        def _suggestions(self, text, maxdist, prefix):
            for sug, score in wsp.MultiCorrector._suggestions(
                self, text, maxdist, prefix
            ):
                yield (score, sug)

    for op in (max, min):
        theirs = FixedMulti(
            [wsp.ListCorrector(la), wsp.ListCorrector(lb)], op
        )
        ours = MultiCorrector([ListCorrector(la), ListCorrector(lb)], op)
        for typo in ("reoction", "zebra", "shade", "kaola"):
            assert ours.suggest(typo, maxdist=2) == theirs.suggest(
                typo, maxdist=2
            ), (typo, op)


@pytest.fixture(scope="module")
def corrector_rows():
    # the reference's test_reader_corrector corpus, as pages rows
    texts = [
        "render zorro kaori postal",
        "reader zebra koala pastry",
        "leader libra oola paster",
        "feeder lorry zoala baster",
    ]
    from datetime import datetime

    ts = datetime(2025, 1, 1)
    return [
        (f"https://sp{i}.test/", ts, b"", t, "en")
        for i, t in enumerate(texts)
    ]


@pytest.fixture(scope="module")
def whoosh_corr_ix(corrector_rows, tmp_path_factory):
    from whoosh import fields, index

    schema = fields.Schema(
        url=fields.ID(stored=True, unique=True), text=fields.TEXT
    )
    d = tmp_path_factory.mktemp("whoosh_corr")
    ix = index.create_in(str(d), schema)
    w = ix.writer()
    for url, ts, html, text, lang in corrector_rows:
        w.add_document(url=url, text=text)
    w.commit()
    return ix


def test_reader_corrector_self_inclusion(spark, corrector_rows,
                                         whoosh_corr_ix):
    """The reference's test_reader_corrector shapes: a word present in the
    lexicon IS among its own suggestions (observed reference behavior —
    terms_within yields distance-0 matches)."""
    df = spark.createDataFrame(corrector_rows, PAGES_SCHEMA)
    s = Searcher(build_index(df).persist())
    corr = s.corrector()
    with whoosh_corr_ix.searcher() as ws_:
        theirs_c = ws_.corrector("text")
        for word, maxdist in [("koala", 1), ("kaola", 2), ("paster", 1)]:
            theirs = theirs_c.suggest(word, maxdist=maxdist)
            ours = corr.suggest(word, maxdist=maxdist)
            assert ours == theirs, (word, maxdist)
    assert "koala" in corr.suggest("koala", maxdist=1)


def test_multi_corrector_with_reader(spark, corrector_rows, whoosh_corr_ix):
    """ReaderCorrector composed with a ListCorrector through
    MultiCorrector — the commented-out reference test_multicorrector
    shape, golden against the reference's own composition."""
    from whoosh import spelling as wsp

    # leading sentinel: the reference's DFA Skipper never yields the FIRST
    # word of the list (see test_list_corrector_first_word_quirk), so keep
    # a never-matching word at position 0 for an apples-to-apples golden
    wordlist = sorted(
        ["aardvark", "zebra", "koala", "zealot", "pasta", "koalas"]
    )
    df = spark.createDataFrame(corrector_rows, PAGES_SCHEMA)
    s = Searcher(build_index(df).persist())
    ours = MultiCorrector(
        [s.corrector(), ListCorrector(wordlist)], max
    )
    class FixedMulti(wsp.MultiCorrector):
        def _suggestions(self, text, maxdist, prefix):
            for sug, score in wsp.MultiCorrector._suggestions(
                self, text, maxdist, prefix
            ):
                yield (score, sug)

    with whoosh_corr_ix.searcher() as ws_:
        theirs = FixedMulti(
            [ws_.corrector("text"), wsp.ListCorrector(wordlist)], max
        )
        for typo in ("kaola", "zebra", "paster"):
            assert ours.suggest(typo, maxdist=2) == theirs.suggest(
                typo, maxdist=2
            ), typo


def test_list_corrector_first_word_quirk():
    """Documented deviation: the reference's ListCorrector DFA walk drops
    matches at wordlist[0] (its Skipper state machine skips the first
    entry; invisible in the reference's own test because its first word
    'acrid' never matches).  The reference's test_list_corrector defines
    brute-force Levenshtein as the intended behavior, which we implement —
    so ours DOES yield a first-word match."""
    from whoosh import spelling as wsp

    wl = ["koala", "zebra"]
    assert list(wsp.ListCorrector(wl)._suggestions("kaola", 2, 0)) == []
    assert ListCorrector(wl).suggest("kaola", maxdist=2) == ["koala"]
    # with any non-matching word in front the two implementations agree
    wl2 = ["aaa"] + wl
    assert ListCorrector(wl2).suggest("kaola", maxdist=2) == \
        wsp.ListCorrector(wl2).suggest("kaola", maxdist=2) == ["koala"]


def test_levenshtein_fuzz_vs_reference():
    """Property fuzz: the banded DP (with and without limit) agrees with
    the reference's published implementation on random word pairs."""
    from hypothesis import given, settings, strategies as st

    from whoosh.support.levenshtein import levenshtein

    alphabet = "abcdez"  # small alphabet → high collision/edit density

    @settings(max_examples=400, deadline=None)
    @given(
        st.text(alphabet=alphabet, max_size=12),
        st.text(alphabet=alphabet, max_size=12),
        st.integers(min_value=1, max_value=3),
    )
    def check(a, b, lim):
        ref = levenshtein(a, b)
        assert levenshtein_distance(a, b) == ref
        banded = levenshtein_distance(a, b, lim)
        assert (banded <= lim) == (ref <= lim)
        if ref <= lim:
            assert banded == ref

    check()
