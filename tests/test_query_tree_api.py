"""Query-tree traversal/combinator API parity (reference qcore.py:48-471):
children/is_leaf/leaves/apply/accept/replace/all_terms/iter_all_terms/
tokens/all_tokens/with_boost/field/has_terms/is_range, the &/|/- operators,
and the module utilities error_query/token_lists/BooleanQuery/Lowest/Highest.

Where behavior is cheap to cross-check (pure tree ops, no index), the same
shape is built with BOTH libraries and the results compared directly.
"""

import pytest

from tests.conftest import reference_importable

from whoosh_reloaded_spark.query import (
    And,
    AndMaybe,
    AndNot,
    BooleanQuery,
    FuzzyTerm,
    Highest,
    Lowest,
    Not,
    NullQuery,
    Or,
    Phrase,
    Prefix,
    Term,
    TermRange,
    error_query,
    token_lists,
)


def _tree():
    return And(
        [
            Term("alfa"),
            Or([Term("bravo"), Not(Term("charlie"))]),
            Phrase(["delta", "echo"]),
        ]
    )


def _ref_tree():
    from whoosh import query as wq

    return wq.And(
        [
            wq.Term("text", "alfa"),
            wq.Or([wq.Term("text", "bravo"), wq.Not(wq.Term("text", "charlie"))]),
            wq.Phrase("text", ["delta", "echo"]),
        ]
    )


def test_all_terms_and_leaves():
    q = _tree()
    assert q.all_terms() == {
        ("text", w) for w in ["alfa", "bravo", "charlie", "delta", "echo"]
    }
    # phrases=False drops the Phrase words (positional.py:187-190)
    assert q.all_terms(phrases=False) == {
        ("text", w) for w in ["alfa", "bravo", "charlie"]
    }
    assert [type(l).__name__ for l in q.leaves()] == [
        "Term", "Term", "Term", "Phrase",
    ]
    assert not q.is_leaf() and Term("x").is_leaf()
    assert list(Term("x").children()) == []
    assert [type(c).__name__ for c in q.children()] == ["Term", "Or", "Phrase"]


@pytest.mark.skipif(not reference_importable(), reason="reference not importable")
def test_all_terms_parity_vs_reference():
    q, wq = _tree(), _ref_tree()
    assert q.all_terms() == wq.all_terms()
    assert q.all_terms(phrases=False) == wq.all_terms(phrases=False)
    assert set(q.iter_all_terms()) == set(wq.iter_all_terms())
    assert [type(l).__name__ for l in q.leaves()] == [
        type(l).__name__ for l in wq.leaves()
    ]
    assert q.is_leaf() == wq.is_leaf()
    assert q.field() == wq.field() if wq.field() else q.field() is None
    # token streams agree on (fieldname, text, boost)
    ours = [(t.fieldname, t.text, t.boost) for t in q.all_tokens()]
    theirs = [(t.fieldname, t.text, t.boost) for t in wq.all_tokens()]
    assert ours == theirs
    # has_terms per node class
    for mine, ref in zip(q.leaves(), wq.leaves()):
        assert mine.has_terms() == ref.has_terms()
    assert FuzzyTerm("alfa").has_terms()  # ExpandingTerm, terms.py:428-429
    assert not Prefix("alf").has_terms()
    assert TermRange("a", "b").is_range()
    assert not Term("a").is_range()


def test_replace_and_apply_accept():
    q = _tree()
    r = q.replace("text", "alfa", "zulu")
    assert ("text", "zulu") in r.all_terms()
    assert ("text", "alfa") not in r.all_terms()
    assert ("text", "alfa") in q.all_terms()  # original untouched

    # apply: Term -> Prefix of first 3 chars (the qcore.py:252 example shape)
    def term2prefix(node):
        if isinstance(node, Term):
            return Prefix(node.text[:3], node.fieldname)
        return node.apply(term2prefix)

    p = term2prefix(q)
    assert [type(l).__name__ for l in p.leaves()] == [
        "Prefix", "Prefix", "Prefix", "Phrase",
    ]

    # accept: bottom-up; double every Phrase boost (qcore.py:273-277 example)
    def boost_phrases(node):
        if isinstance(node, Phrase):
            import dataclasses

            return dataclasses.replace(node, boost=node.boost * 2.0)
        return node

    b = q.accept(boost_phrases)
    ph = [l for l in b.leaves() if isinstance(l, Phrase)][0]
    assert ph.boost == 2.0


@pytest.mark.skipif(not reference_importable(), reason="reference not importable")
def test_operators_parity():
    from whoosh import query as wq

    # & -> And, | -> Or, - -> And([a, Not(b)]) (qcore.py:178-203)
    ours = Term("a") & Term("b")
    ref = wq.Term("text", "a") & wq.Term("text", "b")
    assert type(ours).__name__ == type(ref).__name__ == "And"
    ours = Term("a") | Term("b")
    ref = wq.Term("text", "a") | wq.Term("text", "b")
    assert type(ours).__name__ == type(ref).__name__ == "Or"
    ours = Term("a") - Term("b")
    ref = wq.Term("text", "a") - wq.Term("text", "b")
    assert type(ours).__name__ == type(ref).__name__ == "And"
    assert type(tuple(ours.children())[1]).__name__ == "Not"
    assert type(list(ref.children())[1]).__name__ == "Not"


def test_with_boost_set_semantics():
    # with_boost SETS (qcore.py:502-511): existing boost is replaced
    assert Term("a", boost=5.0).with_boost(2.0).boost == 2.0
    # AndNot forwards into a only (compound.py:555-556)
    q = AndNot(Term("a", boost=5.0), Term("b")).with_boost(3.0)
    assert q.a.boost == 3.0 and q.b.boost == 1.0
    # AndMaybe forwards into both (compound.py:527-528)
    q = AndMaybe(Term("a"), Term("b")).with_boost(3.0)
    assert q.a.boost == 3.0 and q.b.boost == 3.0
    # a group boost never reaches Not
    q = Not(Term("a"))
    assert q.with_boost(4.0) == q


def test_module_utilities():
    e = error_query("oops")
    assert isinstance(e, NullQuery) and e.error == "oops"
    e2 = error_query("bad", Term("x"))
    assert e2.error == "bad" and e2 == Term("x")

    tl = token_lists(_tree())
    # top level: alfa token, [bravo, charlie], [delta, echo]
    assert tl[0].text == "alfa"
    assert [t.text for t in tl[1]] == ["bravo", "charlie"]
    assert [t.text for t in tl[2]] == ["delta", "echo"]

    bq = BooleanQuery([Term("a")], [Term("b")], [Term("c")])
    assert type(bq).__name__ == "AndNot"  # compound.py:657-658 shape

    lo, hi = Lowest(), Highest()
    assert lo < 0 and lo < "z" and not (lo > 1) and lo == Lowest()
    assert hi > 10**9 and hi > "z" and not (hi < 1) and hi == Highest()
    # usable as sort keys for mixed None-ish values
    assert sorted([(hi,), (3,), (lo,)], key=lambda t: t[0].__class__ is Highest
                  )[-1][0] is hi
