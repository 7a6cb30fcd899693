"""WordNet thesaurus: synonym lookup + query expansion.

Analogue of the reference's ``lang/wordnet.py`` (Thesaurus,
parse_file, synonyms — reference wordnet.py:40-241), re-expressed for
Spark: the persisted form is a plain parquet table ``(word string,
syns array<string>)`` instead of a Whoosh index, so at scale the
synonym table is broadcast-joinable against a token column.

Parsing semantics mirror the reference byte for byte on well-formed
``wn_s.pl`` lines: only ``s(`` lines count, the synset number is the
first integer, the word is the first single-quoted string lowercased,
and non-``isalpha`` words are skipped (reference wordnet.py:48-63).
``synonyms`` unions the word's synsets and removes the word itself,
sorted (reference wordnet.py:84-96).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

__all__ = ["parse_file", "synonyms", "Thesaurus"]


def parse_file(f):
    """Parse a WordNet ``wn_s.pl`` prolog file-like object into
    ``(word2nums, num2words)`` dicts (reference wordnet.py:40-65).

    Accepts text or binary mode file objects.
    """
    word2nums: Dict[str, List[int]] = defaultdict(list)
    num2words: Dict[int, List[str]] = defaultdict(list)
    for line in f:
        if isinstance(line, bytes):
            line = line.decode("utf-8", "replace")
        if not line.startswith("s("):
            continue
        body = line[2:]
        comma = body.find(",")
        q1 = body.find("'")
        if comma < 0 or q1 < 0:
            continue
        num = int(body[:comma])
        q2 = body.find("'", q1 + 1)
        if q2 < 0:
            continue
        word = body[q1 + 1:q2].lower()
        if not word.isalpha():
            continue
        word2nums[word].append(num)
        num2words[num].append(word)
    return word2nums, num2words


def synonyms(word2nums, num2words, word: str) -> List[str]:
    """Synonyms of ``word``: union of its synsets minus the word itself,
    sorted (reference wordnet.py:84-96)."""
    syns = set()
    for num in word2nums.get(word, ()):
        syns.update(num2words.get(num, ()))
    syns.discard(word)
    return sorted(syns)


class Thesaurus:
    """Synonym database for lookup and query expansion (reference
    wordnet.py:99-241).

    Two modes, like the reference: in-memory dicts parsed from the
    prolog file (``from_file`` / ``from_filename``), or persisted —
    here a parquet ``(word, syns)`` table (``to_storage`` /
    ``from_storage`` take ``(spark, path)`` instead of a Whoosh
    Storage).  The persisted form is the 100-TB shape: a corpus-wide
    synonym expansion is a broadcast join of this table against the
    token column, never a per-row dict lookup in Python.
    """

    def __init__(self):
        self.w2n = None
        self.n2w = None
        self._table = None  # driver-side dict word -> syns (loaded mode)

    # -- construction ----------------------------------------------------

    @classmethod
    def from_file(cls, fileobj) -> "Thesaurus":
        t = cls()
        t.w2n, t.n2w = parse_file(fileobj)
        return t

    @classmethod
    def from_filename(cls, filename: str) -> "Thesaurus":
        with open(filename, "rb") as f:
            return cls.from_file(f)

    @classmethod
    def from_storage(cls, spark, path: str) -> "Thesaurus":
        """Load a thesaurus persisted by :meth:`to_storage` (parquet
        ``word, syns`` — analogue of the reference's THES index)."""
        t = cls()
        rows = spark.read.parquet(path).collect()
        t._table = {r["word"]: list(r["syns"]) for r in rows}
        return t

    def to_storage(self, spark, path: str) -> None:
        """Persist as parquet ``(word string, syns array<string>)``."""
        if not self.w2n or not self.n2w:
            raise Exception("No synonyms loaded")
        rows = [
            (w, synonyms(self.w2n, self.n2w, w)) for w in sorted(self.w2n)
        ]
        spark.createDataFrame(
            rows, "word string, syns array<string>"
        ).write.mode("overwrite").parquet(path)

    # -- lookup / expansion ----------------------------------------------

    def synonyms(self, word: str) -> List[str]:
        """Sorted synonyms of ``word`` (reference wordnet.py:230-241)."""
        word = word.lower()
        if self._table is not None:
            return self._table.get(word, [])
        return synonyms(self.w2n, self.n2w, word)

    def to_dataframe(self, spark):
        """The synonym table as a DataFrame — broadcast-join this
        against a token column for corpus-scale expansion."""
        if self._table is not None:
            rows = sorted(self._table.items())
        else:
            if not self.w2n:
                raise Exception("No synonyms loaded")
            rows = [
                (w, synonyms(self.w2n, self.n2w, w))
                for w in sorted(self.w2n)
            ]
        return spark.createDataFrame(rows, "word string, syns array<string>")

    def expand(self, word: str, fieldname: str = "text", boost: float = 1.0):
        """Query expansion: ``Or([Term(word), Term(syn), ...])`` — the
        use case the reference module documents ("performing query
        expansion") but never shipped an API for."""
        from whoosh_reloaded_spark.query.ast import Or, Term

        terms = [Term(word.lower(), fieldname, boost=boost)]
        terms += [
            Term(s, fieldname, boost=boost) for s in self.synonyms(word)
        ]
        return Or(tuple(terms)) if len(terms) > 1 else terms[0]
