"""Logical query tree + normalization rewrites.

Mirrors the reference's Query classes (src/whoosh/query/{qcore,terms,compound,
ranges,positional}.py) as plain dataclasses.  `normalize()` applies the same
logical rewrites the reference applies (compound.py:116-184): flatten nested
same-type And/Or, push boosts down, dedup identical subqueries, drop
NullQuery, collapse singleton groups.  Catalyst then handles predicate-level
optimization of the physical DataFrame plan.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, replace
from typing import Iterator, List, Optional, Set, Tuple


@dataclass(frozen=True)
class Token:
    """`analysis.Token` analogue yielded by Query.tokens()/all_tokens()
    (reference qcore.py:454-471): fieldname/text/boost set; startchar/
    endchar populated only where the source tracks character offsets."""

    fieldname: Optional[str]
    text: str
    boost: float = 1.0
    startchar: Optional[int] = None
    endchar: Optional[int] = None


@dataclass(frozen=True)
class Query:
    def normalize(self) -> "Query":
        return self

    # -- tree traversal / transformation surface (qcore.py:178-471).
    # The reference implements these per-class on mutable objects; our
    # frozen dataclasses allow ONE generic implementation driven by the
    # dataclass fields (a Query-valued field or tuple of Querys is a
    # child edge), with identical observable behavior.

    def children(self) -> Iterator["Query"]:
        """Iterator of direct subqueries (qcore.py:218-221)."""
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, Query):
                yield v
            elif isinstance(v, tuple):
                for x in v:
                    if isinstance(x, Query):
                        yield x

    def is_leaf(self) -> bool:
        """True when this node has no subqueries (qcore.py:211-216)."""
        return next(self.children(), None) is None

    def is_range(self) -> bool:
        return False

    def has_terms(self) -> bool:
        """True when this node targets specific term(s) — Term/Phrase
        yes; patterns (Wildcard/Prefix/Fuzzy) no (qcore.py:228-236)."""
        return False

    def leaves(self) -> Iterator["Query"]:
        """Depth-first leaf nodes (qcore.py:402-411)."""
        if self.is_leaf():
            yield self
        else:
            for c in self.children():
                yield from c.leaves()

    def apply(self, fn) -> "Query":
        """Copy of this node with fn applied to each direct child; leaf
        nodes return self (qcore.py:243-268)."""
        if self.is_leaf():
            return self
        changes = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, Query):
                changes[f.name] = fn(v)
            elif isinstance(v, tuple) and any(
                isinstance(x, Query) for x in v
            ):
                changes[f.name] = tuple(
                    fn(x) if isinstance(x, Query) else x for x in v
                )
        return replace(self, **changes) if changes else self

    def accept(self, fn) -> "Query":
        """Bottom-up transform: fn over subqueries, then this node
        (qcore.py:270-293)."""

        def fn_wrapper(q):
            return fn(q.apply(fn_wrapper))

        return fn_wrapper(self)

    def replace(self, fieldname: str, oldtext: str, newtext: str) -> "Query":
        """Copy with oldtext -> newtext wherever (fieldname, oldtext) is
        queried (qcore.py:295-308; terms.py:102-106 leaf rule).  Frozen
        dataclasses make the no-op copy free."""
        if self.is_leaf():
            if (
                getattr(self, "fieldname", None) == fieldname
                and getattr(self, "text", None) == oldtext
            ):
                return dataclasses.replace(self, text=newtext)
            return self
        return self.apply(
            lambda q: q.replace(fieldname, oldtext, newtext)
        )

    def copy(self) -> "Query":
        """Reference parity helper (qcore.py:310-313); frozen dataclasses
        are safely shareable, so this is the identity."""
        return self

    def with_boost(self, boost: float) -> "Query":
        """Copy with the boost SET to the given value; boost-less nodes
        forward into their scored children (qcore.py:502-511 + the
        binary overrides, compound.py:527-528,555-556,610-611)."""
        return _set_boost(self, boost)

    def field(self) -> Optional[str]:
        """The single field this query matches in, or None
        (qcore.py:495-500)."""
        return getattr(self, "fieldname", None)

    def terms(self, phrases: bool = False) -> Iterator[Tuple[str, str]]:
        """(fieldname, text) pairs queried by THIS node (qcore.py:327-335;
        Phrase emits its words only when phrases=True,
        positional.py:187-190)."""
        return iter(())

    def iter_all_terms(self, phrases: bool = True) -> Iterator[Tuple[str, str]]:
        """Walk the tree yielding (fieldname, text) for every leaf
        (qcore.py:413-436)."""
        for leaf in self.leaves():
            yield from leaf.terms(phrases=phrases)

    def all_terms(self, phrases: bool = True) -> Set[Tuple[str, str]]:
        """Set of all terms in the tree (qcore.py:315-325)."""
        return set(self.iter_all_terms(phrases=phrases))

    def tokens(self, boost: float = 1.0) -> Iterator[Token]:
        """Token objects for the terms searched by this node
        (qcore.py:454-471)."""
        for fieldname, text in self.terms(phrases=True):
            yield Token(
                fieldname=fieldname,
                text=text,
                boost=boost * getattr(self, "boost", 1.0),
            )

    def all_tokens(self, boost: float = 1.0) -> Iterator[Token]:
        """Tokens for every leaf in the tree (qcore.py:438-452)."""
        for leaf in self.leaves():
            yield from leaf.tokens(boost=boost)

    # -- combinator operators (qcore.py:178-203)

    def __or__(self, other: "Query") -> "Query":
        return Or([self, other]).normalize()

    def __and__(self, other: "Query") -> "Query":
        return And([self, other]).normalize()

    def __sub__(self, other: "Query") -> "Query":
        return And([self, Not(other)]).normalize()


@dataclass(frozen=True)
class NullQuery(Query):
    """Matches nothing (qcore.py:593-648)."""


@dataclass(frozen=True)
class Every(Query):
    """Matches every document, score 1*boost (qcore.py:650-737).

    ``fieldname=None`` is the reference's unfielded ``Every()`` (the
    ``*:*`` EveryPlugin form): inside an And/Or it collapses the WHOLE
    compound to a bare ``Every()`` in normalize (compound.py:132-134).
    A fielded Every (a parsed ``*``, which is Wildcard('*') normalized
    with the default field) collapses only same-field siblings
    (compound.py:136-169)."""

    boost: float = 1.0
    fieldname: Optional[str] = None


@dataclass(frozen=True)
class Term(Query):
    """Documents containing `text` in `fieldname` (query/terms.py:39-146)."""

    text: str
    fieldname: str = "text"
    boost: float = 1.0

    def has_terms(self) -> bool:
        return True  # terms.py:85-86

    def terms(self, phrases: bool = False):
        yield (self.fieldname, self.text)  # terms.py:98-100


class _ChildTuple(tuple):
    """Tuple of subqueries that is ALSO callable: compound nodes store
    children in a field named `children`, which would otherwise shadow
    Query.children() — calling the attribute yields the reference's
    iterator API (qcore.py:218-221) while tuple access keeps working."""

    def __call__(self):
        return iter(self)


class _Compound(Query):
    def field(self) -> Optional[str]:
        """CompoundQuery.field (compound.py:91-96): the common field of
        all subqueries, or None — what the Every collapse keys on."""
        kids = tuple(self.children)
        if kids:
            f = kids[0].field()
            if all(k.field() == f for k in kids[1:]):
                return f
        return None


def _apply_boost(q: Query, boost: float) -> Query:
    """Push a wrapper/group boost into q on collapse — the reference's
    with_boost.  Binary nodes forward into their scored side(s)
    (compound.py:527-528 both, :555-556/:610-611 a only), which is
    OBSERVABLE when that side is a multiterm whose singleton expansion
    drops its own boost ('(alfa ANDMAYBE alfa~)^2' scores 2*alfa +
    1*fuzzy in the reference).  Everything else multiplies its own
    boost (compound.py:179-181); a boost-less node keeps a single-child
    And wrapper so the boost isn't silently dropped."""
    if boost == 1.0 or isinstance(q, (NullQuery, Not)):
        # Not: NotNode.has_boost is False in the reference parser, so a
        # group boost never reaches a Not — '(alfa NOT bravo)^2' boosts
        # only alfa, and the Not's +1.0 surviving-doc bonus is fixed
        # (round-5 mf fuzz golden)
        return q
    if isinstance(q, (AndNot, Require)):
        return replace(q, a=_set_boost(q.a, q.boost * boost), boost=1.0)
    if isinstance(q, (AndMaybe, Otherwise)):
        g = q.boost * boost
        return replace(
            q, a=_set_boost(q.a, g), b=_set_boost(q.b, g), boost=1.0
        )
    if hasattr(q, "boost"):
        return replace(q, boost=q.boost * boost)
    return And((q,), boost)


def _set_boost(q: Query, boost: float) -> Query:
    """The reference's qcore.Query.with_boost SETS the copy's boost
    rather than multiplying (qcore.py:502-511) — observable when the
    side already carries one: '(alfa^2 ANDNOT bravo)^3' ends with
    a.boost == 3, not 6 (round-5 fuzz, verified live).  Binary nodes
    forward into their scored side(s) (compound.py:527-528,:555-556,
    :610-611); Not is untouched (its boost never reaches scoring)."""
    if isinstance(q, (NullQuery, Not)):
        return q
    if isinstance(q, (AndNot, Require)):
        return replace(q, a=_set_boost(q.a, boost), boost=1.0)
    if isinstance(q, (AndMaybe, Otherwise)):
        return replace(
            q, a=_set_boost(q.a, boost), b=_set_boost(q.b, boost), boost=1.0
        )
    if hasattr(q, "boost"):
        return replace(q, boost=boost)
    return And((q,), boost)


def _flatten(cls, children: Tuple[Query, ...], boost: float) -> List[Query]:
    """Flatten same-class children, multiplying boosts down
    (compound.py:116-126); dedup identical subqueries (compound.py:160-169);
    drop NullQuery (compound.py:171-184)."""
    out: List[Query] = []
    for c in children:
        c = c.normalize()
        if isinstance(c, NullQuery):
            continue
        if isinstance(c, cls):
            for gc in c.children:
                # compound.py:122-124 hoists with ss.with_boost(ss.boost *
                # s.boost) UNCONDITIONALLY — and BinaryQuery.with_boost
                # SETS both sides (compound.py:527-528), so hoisting an
                # AndNot through a same-class group CLOBBERS its sides'
                # own boosts even when every group boost is 1.0:
                # 'text:([alfa TO alfa]^2 ANDNOT bravo x)' ends with the
                # range's ^2 wiped (round-5 or-mode fuzz, verified live)
                out.append(
                    _set_boost(gc, getattr(gc, "boost", 1.0) * c.boost)
                )
        else:
            out.append(c)
    seen, dedup = set(), []
    for c in out:
        key = repr(c)
        if key not in seen:
            seen.add(key)
            dedup.append(c)
    return dedup


def _range_cmp_start(r):
    """Comparable start key mirroring the reference's _comparable_start
    (ranges.py:81-86): None = Lowest; exclusive sorts after inclusive."""
    if r.start is None:
        return ((0,), 0)
    return ((1, r.start), 1 if r.startexcl else 0)


def _range_cmp_end(r):
    """ranges.py:88-93: None = Highest; exclusive sorts before inclusive."""
    if r.end is None:
        return ((2,), 0)
    return ((1, r.end), -1 if r.endexcl else 0)


def _ranges_overlap(a, b) -> bool:
    """ranges.py:95-111 (same class + same field only)."""
    if type(a) is not type(b) or a.fieldname != b.fieldname:
        return False
    s1, e1 = _range_cmp_start(a), _range_cmp_end(a)
    s2, e2 = _range_cmp_start(b), _range_cmp_end(b)
    return (
        (s2 <= s1 <= e2)
        or (s2 <= e1 <= e2)
        or (s1 <= s2 <= e1)
        or (s1 <= e2 <= e1)
    )


def _merge_two_ranges(a, b, intersect: bool):
    """Mirror of RangeMixin.merge (ranges.py:113-150) INCLUDING its
    containment branch, which returns the ENCLOSING range even when
    intersect=True — so ``And([a TO b], [a TO c])`` normalizes to the
    WIDER ``[a TO c]`` exactly like the reference (quirk kept for parse
    parity; callers wanting true intersection keep the un-normalized
    And).  Found by the round-5 parser fuzz."""
    s1, e1 = _range_cmp_start(a), _range_cmp_end(a)
    s2, e2 = _range_cmp_start(b), _range_cmp_end(b)
    if s1 >= s2 and e1 <= e2:
        s, e = s2, e2
    elif s2 >= s1 and e2 <= e1:
        s, e = s1, e1
    elif intersect:
        s, e = max(s1, s2), min(e1, e2)
    else:
        s, e = min(s1, s2), max(e1, e2)
    return replace(
        a,
        start=None if s[0] == (0,) else s[0][1],
        startexcl=s[1] == 1,
        end=None if e[0] == (2,) else e[0][1],
        endexcl=e[1] == -1,
        boost=max(a.boost, b.boost),
    )


def _collapse_every(kids: List[Query]) -> List[Query]:
    """compound.py:136-169 Every handling in And/Or normalize: the FIRST
    Every for a field survives; every LATER same-field child (even another
    Every) is popped in the merge loop, and every EARLIER same-field
    non-Every child is dropped in the dedup loop.  '* AND alfa' and
    'alfa AND *' both normalize to Every('text') — whoosh treats a
    fielded Every as absorbing the whole field, for Or AND And alike."""
    everyfields: Set[Optional[str]] = set()
    out: List[Query] = []
    for q in kids:
        f = q.field()
        if f in everyfields:
            continue
        if isinstance(q, Every) and q.fieldname is not None:
            everyfields.add(q.fieldname)
        out.append(q)
    if everyfields:
        out = [
            q for q in out
            if isinstance(q, Every) or q.field() not in everyfields
        ]
    return out


def _merge_ranges(kids: List[Query], intersect: bool) -> List[Query]:
    """compound.py:137-152: within an And/Or, same-field overlapping
    TermRange/NumericRange children collapse into one merged range
    (intersect for And, union for Or), then re-normalize; a merged range
    that normalizes to NullQuery is dropped like any Null child."""
    out = list(kids)
    i = 0
    while i < len(out):
        q = out[i]
        if isinstance(q, (TermRange, NumericRange)):
            j = i + 1
            while j < len(out):
                if _ranges_overlap(q, out[j]):
                    q = _merge_two_ranges(q, out.pop(j), intersect)
                else:
                    j += 1
            q = q.normalize()
            if isinstance(q, NullQuery):
                out.pop(i)
                continue
            out[i] = q
        i += 1
    return out


@dataclass(frozen=True)
class And(_Compound):
    children: Tuple[Query, ...]
    boost: float = 1.0

    def __init__(self, children, boost: float = 1.0):
        object.__setattr__(self, "children", _ChildTuple(children))
        object.__setattr__(self, "boost", boost)

    def normalize(self) -> Query:
        kids = _flatten(And, self.children, self.boost)
        # an unfielded Every absorbs the whole compound, boost and all
        # (compound.py:132-134 returns a FRESH Every())
        if any(isinstance(q, Every) and q.fieldname is None for q in kids):
            return Every()
        kids = _collapse_every(_merge_ranges(kids, intersect=True))
        if not kids:
            return NullQuery()
        if len(kids) == 1:
            # single survivor collapses out — INCLUDING a bare Not
            # (compound.py:186-192 returns subqs[0] unconditionally):
            # '{alfa TO alfa} NOT alfa' is Not(alfa) at the root, scored
            # as the plain 1.0 complement with NO coordination wrapper
            # (round-5 or-mode fuzz, verified live)
            return _apply_boost(kids[0], self.boost)
        return And(tuple(kids), self.boost)


@dataclass(frozen=True)
class Or(_Compound):
    children: Tuple[Query, ...]
    boost: float = 1.0
    scale: Optional[float] = None  # coordination bonus (matching/wrappers.py:532+)

    def __init__(self, children, boost: float = 1.0, scale: Optional[float] = None):
        object.__setattr__(self, "children", _ChildTuple(children))
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "scale", scale)

    def normalize(self) -> Query:
        kids = _flatten(Or, self.children, self.boost)
        # compound.py:132-134: unfielded Every absorbs the compound
        if any(isinstance(q, Every) and q.fieldname is None for q in kids):
            return Every()
        kids = _collapse_every(_merge_ranges(kids, intersect=False))
        if not kids:
            return NullQuery()
        if len(kids) == 1:
            # see And.normalize: a lone Not collapses out too
            return _apply_boost(kids[0], self.boost)
        return Or(tuple(kids), self.boost, self.scale)


@dataclass(frozen=True)
class DisjunctionMax(_Compound):
    """score = max(sub) + tiebreak*(sum(others)) (compound.py:446-490)."""

    children: Tuple[Query, ...]
    boost: float = 1.0
    tiebreak: float = 0.0

    def __init__(self, children, boost: float = 1.0, tiebreak: float = 0.0):
        object.__setattr__(self, "children", _ChildTuple(children))
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "tiebreak", tiebreak)

    def normalize(self) -> Query:
        kids = [c.normalize() for c in self.children]
        kids = [c for c in kids if not isinstance(c, NullQuery)]
        if not kids:
            return NullQuery()
        if len(kids) == 1:
            # single-child collapse keeps the boost (compound.py:179-181)
            return _apply_boost(kids[0], self.boost)
        return DisjunctionMax(tuple(kids), self.boost, self.tiebreak)


@dataclass(frozen=True)
class Not(Query):
    """Complement; only meaningful nested under And/Or (wrappers.py:76-145)."""

    child: Query
    boost: float = 1.0

    def normalize(self) -> Query:
        c = self.child.normalize()
        if isinstance(c, NullQuery):
            return NullQuery()
        return Not(c, self.boost)


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    """Wraps a query; every matching doc gets the fixed `score` instead of
    the child's scores (reference query/wrappers.py:146-181: matcher is a
    ListMatcher over the child's doc ids with ``all_weights=score``) — the
    filter-clause optimization where scoring a branch is wasted work.  In
    the DataFrame plan the child's score column is simply replaced by a
    literal, which lets Catalyst prune the scoring expressions from the
    child's scan."""

    child: Query
    score: float = 1.0

    def normalize(self) -> Query:
        c = self.child.normalize()
        if isinstance(c, NullQuery):
            return NullQuery()
        return ConstantScoreQuery(c, self.score)


@dataclass(frozen=True)
class WeightingQuery(Query):
    """Wraps a query; the subtree is scored with `weighting` (a
    WeightingModel) instead of the searcher's model (reference
    query/wrappers.py:184-199: matcher() re-plans the child with
    ``context.set(weighting=...)``) — per-clause weighting, complementing
    MultiWeighting's per-field dispatch."""

    child: Query
    weighting: object = None  # scoring.WeightingModel

    def normalize(self) -> Query:
        c = self.child.normalize()
        if isinstance(c, NullQuery):
            return NullQuery()
        return WeightingQuery(c, self.weighting)


@dataclass(frozen=True)
class AndNot(Query):
    """In a but not b; scored by a (compound.py:548-577) → left-anti join.

    `boost` models the reference's AndNot.with_boost pushing a group
    boost into the a side only (compound.py:555-556) — the b side never
    scores, so a carried node boost scaling the final score is
    equivalent."""

    a: Query
    b: Query
    boost: float = 1.0

    def normalize(self) -> Query:
        a, b = self.a.normalize(), self.b.normalize()
        if isinstance(a, NullQuery):
            return NullQuery()
        if isinstance(b, NullQuery):
            return _apply_boost(a, self.boost)
        return AndNot(a, b, self.boost)


@dataclass(frozen=True)
class Require(Query):
    """Docs in both, scored only by a (compound.py:592-628) → left-semi.

    `boost` models Require.with_boost's a-side push (compound.py:610-611);
    b never scores, so the node boost scales the final score."""

    a: Query
    b: Query
    boost: float = 1.0

    def normalize(self) -> Query:
        a, b = self.a.normalize(), self.b.normalize()
        if isinstance(a, NullQuery) or isinstance(b, NullQuery):
            return NullQuery()
        return Require(a, b, self.boost)


@dataclass(frozen=True)
class AndMaybe(Query):
    """Docs of a; b's score added when present (compound.py:629+) → left join.

    `boost` models BinaryQuery.with_boost pushing into BOTH sides
    (compound.py:527-528): (a*k) + (b*k) == (a+b)*k, so a carried node
    boost scaling the final score is equivalent."""

    a: Query
    b: Query
    boost: float = 1.0

    def normalize(self) -> Query:
        a, b = self.a.normalize(), self.b.normalize()
        if isinstance(a, NullQuery):
            return NullQuery()
        if isinstance(b, NullQuery):
            return _apply_boost(a, self.boost)
        return AndMaybe(a, b, self.boost)


@dataclass(frozen=True)
class Otherwise(Query):
    """a if it has any hits, else b (compound.py:578-591).

    `boost` models BinaryQuery.with_boost pushing into both sides
    (compound.py:527-528): whichever branch runs is scaled by it."""

    a: Query
    b: Query
    boost: float = 1.0


def _binary_field(self) -> Optional[str]:
    """BinaryQuery.field (compound.py:522-526): the common field of the
    two sides, or None — lets e.g. '(alfa ANDNOT bravo) AND *' collapse
    to Every('text') in the sibling Every sweep."""
    f = self.a.field()
    if self.b.field() == f:
        return f
    return None


AndNot.field = Require.field = AndMaybe.field = Otherwise.field = _binary_field


def _wrapper_field(self) -> Optional[str]:
    """WrappingQuery.field delegates to the child (wrappers.py:60-61)."""
    return self.child.field()


ConstantScoreQuery.field = WeightingQuery.field = _wrapper_field


@dataclass(frozen=True)
class Phrase(Query):
    """Terms adjacent in order, slop=1 (positional.py:134-277).

    Normalization: single-word phrase collapses to Term
    (positional.py:208-215)."""

    words: Tuple[str, ...]
    fieldname: str = "text"
    slop: int = 1
    boost: float = 1.0

    def __init__(self, words, fieldname="text", slop=1, boost=1.0):
        object.__setattr__(self, "words", tuple(words))
        object.__setattr__(self, "fieldname", fieldname)
        object.__setattr__(self, "slop", slop)
        object.__setattr__(self, "boost", boost)

    def normalize(self) -> Query:
        if not self.words:
            return NullQuery()
        if len(self.words) == 1:
            return Term(self.words[0], self.fieldname, self.boost)
        return self

    def has_terms(self) -> bool:
        return True  # positional.py:184-185

    def terms(self, phrases: bool = False):
        # phrase words surface only when phrases=True (positional.py:187-190)
        if phrases:
            for word in self.words:
                yield (self.fieldname, word)


@dataclass(frozen=True)
class Sequence(Query):
    """Subqueries matching at consecutive positions (positional.py:36-133).
    Terms-only form — equivalent to Phrase with per-term boosts."""

    words: Tuple[str, ...]
    fieldname: str = "text"
    slop: int = 1
    boost: float = 1.0

    def __init__(self, words, fieldname="text", slop=1, boost=1.0):
        object.__setattr__(self, "words", tuple(words))
        object.__setattr__(self, "fieldname", fieldname)
        object.__setattr__(self, "slop", slop)
        object.__setattr__(self, "boost", boost)

    def normalize(self) -> Query:
        if not self.words:
            return NullQuery()
        if len(self.words) == 1:
            return Term(self.words[0], self.fieldname, self.boost)
        return Phrase(self.words, self.fieldname, self.slop, self.boost)

    def has_terms(self) -> bool:
        return True

    def terms(self, phrases: bool = False):
        if phrases:
            for word in self.words:
                yield (self.fieldname, word)


@dataclass(frozen=True)
class Ordered(Query):
    """Terms appearing in increasing position order, any distance
    (query/positional.py Ordered / span ordering semantics)."""

    words: Tuple[str, ...]
    fieldname: str = "text"
    boost: float = 1.0

    def __init__(self, words, fieldname="text", boost=1.0):
        object.__setattr__(self, "words", tuple(words))
        object.__setattr__(self, "fieldname", fieldname)
        object.__setattr__(self, "boost", boost)

    def normalize(self) -> Query:
        if not self.words:
            return NullQuery()
        if len(self.words) == 1:
            return Term(self.words[0], self.fieldname, self.boost)
        return self

    def has_terms(self) -> bool:
        return True

    def terms(self, phrases: bool = False):
        if phrases:
            for word in self.words:
                yield (self.fieldname, word)


# ---- multi-term (lexicon-expanding) queries (query/terms.py:150-520) --------


@dataclass(frozen=True)
class _MultiTerm(Query):
    pass


@dataclass(frozen=True)
class Prefix(_MultiTerm):
    text: str
    fieldname: str = "text"
    boost: float = 1.0


@dataclass(frozen=True)
class Wildcard(_MultiTerm):
    """Glob pattern with * and ? (terms.py:333-376)."""

    text: str
    fieldname: str = "text"
    boost: float = 1.0

    def normalize(self) -> Query:
        # pattern without wildcards is a plain Term; trailing-star-only is a
        # Prefix (same rewrites the reference applies in Wildcard.normalize)
        t = self.text
        if t == "*":
            # terms.py:352-355: a bare-star Wildcard IS the field's Every
            return Every(self.boost, self.fieldname)
        if "*" not in t and "?" not in t:
            return Term(t, self.fieldname, self.boost)
        if t.endswith("*") and "*" not in t[:-1] and "?" not in t:
            return Prefix(t[:-1], self.fieldname, self.boost)
        return self


@dataclass(frozen=True)
class Regex(_MultiTerm):
    text: str
    fieldname: str = "text"
    boost: float = 1.0


@dataclass(frozen=True)
class Variations(_MultiTerm):
    """Morphological variations of an English word present in the lexicon
    (query/terms.py:522-561; generator lang/morph_en.py:1107)."""

    text: str
    fieldname: str = "text"
    boost: float = 1.0

    # ExpandingTerm: has_terms True and terms() yields the SOURCE word
    # (terms.py:425-433)
    def has_terms(self) -> bool:
        return True

    def terms(self, phrases: bool = False):
        yield (self.fieldname, self.text)


@dataclass(frozen=True)
class FuzzyTerm(_MultiTerm):
    """Terms within plain-Levenshtein maxdist (terms.py:436-520).  The
    reference's docstrings say Damerau-Levenshtein, but its expansion
    (terms_within -> automata/lev.py) builds no transposition edges —
    see planner.levenshtein_distance."""

    text: str
    fieldname: str = "text"
    boost: float = 1.0
    maxdist: int = 1
    prefixlength: int = 1

    # ExpandingTerm (terms.py:425-433): the source word is a term
    def has_terms(self) -> bool:
        return True

    def terms(self, phrases: bool = False):
        yield (self.fieldname, self.text)


@dataclass(frozen=True)
class NumericRange(Query):
    """Numeric range over a docmeta column (ranges.py:253-404).  The
    reference re-indexes numbers as tiered terms for this; native column
    predicates make the tiering unnecessary — Catalyst pushes the range
    into the scan.  Matches score 1*boost (constant, like the reference's
    multiterm constant-score path on ranges)."""

    fieldname: str
    start: Optional[float] = None
    end: Optional[float] = None
    startexcl: bool = False
    endexcl: bool = False
    boost: float = 1.0

    def is_range(self) -> bool:
        return True  # ranges.py RangeMixin


@dataclass(frozen=True)
class DateRange(NumericRange):
    """DateRange (ranges.py:405-450): NumericRange over a timestamp col."""


@dataclass(frozen=True)
class ColumnQuery(Query):
    """Predicate over a per-doc column (query/qcolumns.py:32-118): an
    arbitrary SQL expression string evaluated against docmeta."""

    expr: str
    boost: float = 1.0


@dataclass(frozen=True)
class TermRange(_MultiTerm):
    """Lexicographic term range (query/ranges.py:153-252)."""

    start: Optional[str]
    end: Optional[str]
    fieldname: str = "text"
    startexcl: bool = False
    endexcl: bool = False
    boost: float = 1.0

    def is_range(self) -> bool:
        return True  # ranges.py RangeMixin

    def normalize(self) -> Query:
        if self.start is None and self.end is None:
            return Every(self.boost, self.fieldname)  # ranges.py:190-208
        if self.start is not None and self.start == self.end:
            if self.startexcl or self.endexcl:
                return NullQuery()
            return Term(self.start, self.fieldname, self.boost)
        return self


# ---- nested (block-join) query classes (reference query/nested.py) ----------


@dataclass(frozen=True)
class NestedParent(Query):
    """Parents (universe selected by `parents`) whose CHILDREN match q;
    score = per-parent aggregate of child scores, default ``best``
    (reference query/nested.py:33-208).  Class surface over
    nested.nested_parent — the positional parent-bitset design is
    replaced by the docmeta `parent_uid` equi-join (see nested.py)."""

    parents: Query
    q: Query
    score_fn: str = "best"


@dataclass(frozen=True)
class NestedChildren(Query):
    """CHILDREN of parents matching q (within the `parents` universe),
    each child scored by its parent (reference query/nested.py:209+)."""

    parents: Query
    q: Query
    boost: float = 1.0


# ---- module-level utilities (qcore.py:48-140, compound.py:657-658) ----------


def error_query(msg: str, q: Optional[Query] = None) -> Query:
    """Returns q (or a NullQuery) with its `error` attribute set to msg
    (qcore.py:48-57) — the parser surface for reporting bad syntax while
    still returning a runnable query."""
    if q is None:
        q = NullQuery()
    object.__setattr__(q, "error", msg)
    return q


def token_lists(q: Query, phrases: bool = True):
    """The terms in the query tree with the hierarchy represented as
    nested lists; single-element sublists are inlined (qcore.py:60-78)."""
    if q.is_leaf():
        if phrases or not isinstance(q, Phrase):
            return list(q.tokens())
        return []
    ls = []
    for qq in q.children():
        t = token_lists(qq, phrases=phrases)
        if len(t) == 1:
            t = t[0]
        if t:
            ls.append(t)
    return ls


def BooleanQuery(required, should, prohibited) -> Query:
    """required AND (maybe should) AND NOT prohibited
    (compound.py:657-658)."""
    return AndNot(
        AndMaybe(And(tuple(required)), Or(tuple(should))),
        Or(tuple(prohibited)),
    ).normalize()


class Lowest:
    """Sentinel comparing lower than everything except itself
    (qcore.py:84-111) — usable as a missing-value sort key."""

    def __eq__(self, other):
        return type(other) is Lowest

    def __ne__(self, other):
        return not self.__eq__(other)

    def __lt__(self, other):
        return type(other) is not Lowest

    def __gt__(self, other):
        return False

    def __le__(self, other):
        return True

    def __ge__(self, other):
        return self.__eq__(other)

    def __hash__(self):
        return hash(Lowest)


class Highest:
    """Sentinel comparing higher than everything except itself
    (qcore.py:113-140)."""

    def __eq__(self, other):
        return type(other) is Highest

    def __ne__(self, other):
        return not self.__eq__(other)

    def __gt__(self, other):
        return type(other) is not Highest

    def __lt__(self, other):
        return False

    def __ge__(self, other):
        return True

    def __le__(self, other):
        return self.__eq__(other)

    def __hash__(self):
        return hash(Highest)
