"""Highlight pipeline golden parity: every fragmenter × formatter shape
from the reference's tests/test_highlighting.py must render byte-identical
output, verified BOTH against the literal expected strings and against
the live reference highlight() on the same inputs."""

import pytest

from tests.conftest import reference_importable
from whoosh_reloaded_spark.highlight import (
    ContextFragmenter,
    HtmlFormatter,
    SentenceFragmenter,
    UppercaseFormatter,
    WholeFragmenter,
    highlight,
    top_fragments,
)

_DOC = "alfa bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"


def _ref(text, terms, fragmenter_name, formatter_name, fkw=None, hkw=None,
         stoplist="default"):
    from whoosh import analysis, highlight as rh

    sa = (
        analysis.StandardAnalyzer(stoplist=None)
        if stoplist is None
        else analysis.StandardAnalyzer()
    )
    frag = getattr(rh, fragmenter_name)(**(fkw or {}))
    fmt = getattr(rh, formatter_name)(**(hkw or {}))
    return rh.highlight(text, frozenset(terms), sa, frag, fmt)


needs_ref = pytest.mark.skipif(
    not reference_importable(), reason="reference not importable"
)


@needs_ref
def test_whole_uppercase():
    ours = highlight(
        _DOC, {"bravo", "india"}, None, WholeFragmenter(),
        UppercaseFormatter(),
    )
    assert ours == (
        "alfa BRAVO charlie delta echo foxtrot golf hotel INDIA juliet "
        "kilo lima"
    )
    assert ours == _ref(_DOC, {"bravo", "india"}, "WholeFragmenter",
                        "UppercaseFormatter")


@needs_ref
def test_sentence_fragmenter():
    text = (
        "This is the first sentence. This one doesn't have the word. "
        "This sentence is the second. Third sentence here."
    )
    ours = highlight(
        text, ("sentence",), None, SentenceFragmenter(),
        UppercaseFormatter(),
    )
    assert ours == (
        "This is the first SENTENCE...This SENTENCE is the second..."
        "Third SENTENCE here"
    )
    assert ours == _ref(text, ("sentence",), "SentenceFragmenter",
                        "UppercaseFormatter", stoplist=None)


@needs_ref
def test_context_fragmenter():
    ours = highlight(
        _DOC, {"bravo", "india"}, None, ContextFragmenter(surround=6),
        UppercaseFormatter(),
    )
    assert ours == "alfa BRAVO charlie...hotel INDIA juliet"
    assert ours == _ref(_DOC, {"bravo", "india"}, "ContextFragmenter",
                        "UppercaseFormatter", fkw={"surround": 6})


@needs_ref
def test_context_at_start():
    ours = highlight(
        _DOC, {"alfa"}, None, ContextFragmenter(surround=15),
        UppercaseFormatter(),
    )
    assert ours == "ALFA bravo charlie delta echo foxtrot"
    assert ours == _ref(_DOC, {"alfa"}, "ContextFragmenter",
                        "UppercaseFormatter", fkw={"surround": 15})


@needs_ref
def test_html_format():
    ours = highlight(
        _DOC, {"bravo", "india"}, None, ContextFragmenter(surround=6),
        HtmlFormatter(),
    )
    assert ours == (
        'alfa <strong class="match term0">bravo</strong> charlie...'
        'hotel <strong class="match term1">india</strong> juliet'
    )
    assert ours == _ref(_DOC, {"bravo", "india"}, "ContextFragmenter",
                        "HtmlFormatter", fkw={"surround": 6})


@needs_ref
def test_html_escape():
    text = 'alfa <bravo "charlie"> delta'
    ours = highlight(
        text, {"bravo"}, None, WholeFragmenter(), HtmlFormatter()
    )
    assert ours == (
        'alfa &lt;<strong class="match term0">bravo</strong> '
        '"charlie"&gt; delta'
    )
    assert ours == _ref(text, {"bravo"}, "WholeFragmenter",
                        "HtmlFormatter")


@needs_ref
def test_maxclasses():
    terms = frozenset(("alfa", "bravo", "charlie", "delta", "echo"))
    kw = {"tagname": "b", "termclass": "t", "maxclasses": 2}
    ours = highlight(
        _DOC, terms, None, ContextFragmenter(surround=6),
        HtmlFormatter(**kw),
    )
    assert ours == (
        '<b class="match t0">alfa</b> <b class="match t1">bravo</b> '
        '<b class="match t0">charlie</b>...<b class="match t1">delta</b> '
        '<b class="match t0">echo</b> foxtrot'
    )
    assert ours == _ref(_DOC, terms, "ContextFragmenter", "HtmlFormatter",
                        fkw={"surround": 6}, hkw=kw)


@needs_ref
def test_pinpoint_fragmenter():
    """Golden vs the reference's fragment_matches path (fresh Token
    objects — the path Characters-format highlighting actually takes; the
    reference's bare highlight()+PinpointFragmenter retokenizing path has
    a token-aliasing bug [no t.copy()] we deliberately don't replicate)."""
    from whoosh import highlight as rh
    from whoosh.analysis.acore import Token

    from whoosh_reloaded_spark.chars import char_spans
    from whoosh_reloaded_spark.highlight import (
        PinpointFragmenter,
        highlight_spans,
    )

    terms = {"bravo", "india", "juliet"}
    spans = [
        (t, sc, ec) for t, p, sc, ec in char_spans(_DOC) if t in terms
    ]
    for kw in ({"surround": 6}, {"surround": 20, "autotrim": True},
               {"maxchars": 30, "surround": 10}):
        ref_toks = []
        for t, sc, ec in spans:
            tok = Token(chars=True)
            tok.text, tok.startchar, tok.endchar = t, sc, ec
            tok.matched, tok.boost = True, 1.0
            ref_toks.append(tok)
        frags = list(
            rh.PinpointFragmenter(**kw).fragment_matches(_DOC, ref_toks)
        )
        theirs = rh.UppercaseFormatter()(
            _DOC,
            rh.top_fragments(frags, 3, rh.BasicFragmentScorer(), rh.FIRST),
        )
        ours = highlight_spans(
            _DOC, spans, formatter=UppercaseFormatter(),
            fragmenter=PinpointFragmenter(**kw),
        )
        assert ours == theirs, kw


def test_highlight_spans_no_retokenize():
    """highlight_spans over stored (term, sc, ec) triples matches the
    retokenized PinpointFragmenter path for the same matched terms."""
    from whoosh_reloaded_spark.chars import char_spans
    from whoosh_reloaded_spark.highlight import (
        PinpointFragmenter,
        highlight_spans,
    )

    terms = {"bravo", "india"}
    spans = [
        (t, sc, ec) for t, p, sc, ec in char_spans(_DOC) if t in terms
    ]
    ours = highlight_spans(
        _DOC, spans, formatter=UppercaseFormatter(),
        fragmenter=PinpointFragmenter(surround=6),
    )
    via_tokens = highlight(
        _DOC, terms, None, PinpointFragmenter(surround=6),
        UppercaseFormatter(),
    )
    assert ours == via_tokens and "BRAVO" in ours


def test_top_and_order():
    """top=1 keeps the best-scoring fragment; no matches -> empty."""
    ours = highlight(
        _DOC, {"bravo", "india"}, None, ContextFragmenter(surround=6),
        UppercaseFormatter(), top=1,
    )
    assert ours in ("alfa BRAVO charlie", "hotel INDIA juliet")
    assert highlight(_DOC, {"zulu"}, None, WholeFragmenter(),
                     UppercaseFormatter()) == ""


# -- GenshiEventFormatter (event-stream) ---------------------------------------


def test_genshi_event_formatter_token_events():
    """format_token emits the reference's START/TEXT/END triple
    (highlight.py:881-891) with the (None,-1,-1) placeholder pos."""
    from whoosh_reloaded_spark.highlight import (
        STREAM_END,
        STREAM_START,
        STREAM_TEXT,
        GenshiEventFormatter,
        Tok,
    )

    f = GenshiEventFormatter()
    text = "alpha beta gamma"
    tok = Tok("beta", 6, 10, True)
    assert f.format_token(text, tok) == [
        (STREAM_START, ("strong", ()), (None, -1, -1)),
        (STREAM_TEXT, "beta", (None, -1, -1)),
        (STREAM_END, "strong", (None, -1, -1)),
    ]


def test_genshi_event_formatter_fragment_and_merge():
    """Fragment events: plain text between matches becomes merged TEXT
    events (reference _add_text, highlight.py:874-878); the `between`
    separator merges into the next fragment's leading TEXT."""
    from whoosh_reloaded_spark.highlight import (
        STREAM_END,
        STREAM_START,
        STREAM_TEXT,
        Fragment,
        GenshiEventFormatter,
        Tok,
        render_event_stream,
    )

    text = "alpha beta gamma beta tail"
    toks = [Tok("beta", 6, 10, True), Tok("beta", 17, 21, True)]
    frag = Fragment(text, toks)
    f = GenshiEventFormatter(qname="em", between="|")
    ev = f.format_fragment(frag)
    assert ev == [
        (STREAM_TEXT, "alpha ", (None, -1, -1)),
        (STREAM_START, ("em", ()), (None, -1, -1)),
        (STREAM_TEXT, "beta", (None, -1, -1)),
        (STREAM_END, "em", (None, -1, -1)),
        (STREAM_TEXT, " gamma ", (None, -1, -1)),
        (STREAM_START, ("em", ()), (None, -1, -1)),
        (STREAM_TEXT, "beta", (None, -1, -1)),
        (STREAM_END, "em", (None, -1, -1)),
        (STREAM_TEXT, " tail", (None, -1, -1)),
    ]
    assert render_event_stream(ev) == (
        "alpha <em>beta</em> gamma <em>beta</em> tail"
    )

    # two fragments: "| " separator TEXT merges with the next fragment's
    # leading text into ONE event, like Stream concatenation
    f2 = Fragment("beta again", [Tok("beta", 0, 4, True)])
    ev2 = f.format([frag, f2])
    # the separator merges into the PREVIOUS fragment's trailing TEXT
    # (the reference adds `between` via the same shared _add_text)
    assert (STREAM_TEXT, " tail|", (None, -1, -1)) in ev2
    f3 = Fragment("x beta", [Tok("beta", 2, 6, True)])
    ev3 = f.format([frag, f3])
    assert (STREAM_TEXT, " tail|x ", (None, -1, -1)) in ev3
    assert render_event_stream(ev3) == (
        "alpha <em>beta</em> gamma <em>beta</em> tail|x <em>beta</em>"
    )


def test_genshi_event_formatter_windowed_fragment():
    """Documented deviation: the tail TEXT stops at fragment.endchar (the
    reference's text[index:] would leak the rest of the document)."""
    from whoosh_reloaded_spark.highlight import (
        Fragment,
        GenshiEventFormatter,
        Tok,
        render_event_stream,
    )

    text = "aa bb match cc dd THIS MUST NOT APPEAR"
    frag = Fragment(text, [Tok("match", 6, 11, True)], startchar=3,
                    endchar=14)
    ev = GenshiEventFormatter(qname="b").format_fragment(frag)
    assert render_event_stream(ev) == "bb <b>match</b> cc"


def test_genshi_event_formatter_no_empty_tail_event():
    """Round-5 ADVICE fix: when the last match ends at/after
    fragment.endchar but before the end of the document, no spurious
    empty TEXT event is appended (guard now matches the windowed
    slice)."""
    from whoosh_reloaded_spark.highlight import (
        STREAM_TEXT,
        Fragment,
        GenshiEventFormatter,
        Tok,
    )

    text = "aa match TRAILING DOCUMENT TEXT"
    # window ends exactly where the match ends; document continues
    frag = Fragment(text, [Tok("match", 3, 8, True)], startchar=0,
                    endchar=8)
    ev = GenshiEventFormatter(qname="b").format_fragment(frag)
    assert all(not (k == STREAM_TEXT and t == "") for k, t, _ in ev)
    assert ev[-1][0] != STREAM_TEXT or ev[-1][1] != ""


# -- hypothesis fuzz (round 5): random text x terms x fragmenter x formatter --

from hypothesis import given, settings
from hypothesis import strategies as hst

_HVOCAB = ["alfa", "bravo", "charlie", "delta", "echo", "foxtrot",
           "golf", "hotel", "india", "juliet", "kilo", "lima", "the",
           "and", "renders", "rendering"]

_hsentence = hst.lists(
    hst.sampled_from(_HVOCAB), min_size=1, max_size=9
).map(lambda ws: " ".join(ws))

_htext = hst.lists(_hsentence, min_size=1, max_size=4).map(
    lambda ss: ". ".join(ss) + "."
)

_hterms = hst.sets(hst.sampled_from(_HVOCAB), min_size=1, max_size=3)

_hfragmenter = hst.one_of(
    hst.just(("WholeFragmenter", {})),
    hst.just(("SentenceFragmenter", {})),
    hst.tuples(hst.integers(10, 60), hst.integers(2, 20)).map(
        lambda t: ("ContextFragmenter", {"maxchars": t[0], "surround": t[1]})
    ),
)

_hformatter = hst.one_of(
    hst.just(("UppercaseFormatter", {})),
    hst.just(("HtmlFormatter", {"classname": "m"})),
)


@needs_ref
@settings(max_examples=600, deadline=None)
@given(text=_htext, terms=_hterms, frag=_hfragmenter, fmt=_hformatter,
       top=hst.integers(1, 4))
def test_highlight_fuzz(text, terms, frag, fmt, top):
    """Byte-identical highlight output vs the live reference across
    random text/term/fragmenter/formatter/top combinations (Pinpoint
    excluded: documented reference token-aliasing bug)."""
    import whoosh_reloaded_spark.highlight as oh

    fragmenter = getattr(oh, frag[0])(**frag[1])
    formatter = getattr(oh, fmt[0])(**fmt[1])
    ours = highlight(text, terms, None, fragmenter, formatter, top=top)

    from whoosh import analysis
    from whoosh import highlight as rh

    ref = rh.highlight(
        text,
        frozenset(terms),
        analysis.StandardAnalyzer(),
        getattr(rh, frag[0])(**frag[1]),
        getattr(rh, fmt[0])(**fmt[1]),
        top=top,
    )
    assert ours == ref, (text, terms, frag, fmt, top)
