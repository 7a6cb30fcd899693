"""English morphological variation expansion (LiteMorph algorithm).

Behavior-parity engine for the reference's ``variations()``
(lang/morph_en.py:1107-1147), driving the Variations query
(query/terms.py:522-561): expand a word by suffix add/remove rules, then
the planner keeps only expansions present in the term dictionary.

Engine semantics replicated exactly:

- exception families short-circuit rules (morph_en.py:598-605);
- rules are compiled in 20-rule partitions into one alternation regex per
  partition, each alternative anchored ``(rule)$`` and found with
  ``search`` (morph_en.py:1098-1104) — so within a partition, the rule
  whose match starts EARLIEST in the word wins, with rule order breaking
  position ties.  Partitions are tried in order;
- ``&`` results double the root's final consonant (morph_en.py:1136-1137);
- ``*`` results are a NO-OP: the reference calls ``out.union(...)`` and
  discards the result (morph_en.py:1139 — ``set.union`` is not in-place),
  so recursive re-expansion never actually happens.  Replicated faithfully,
  since parity with the reference's observable output is the contract;
- no matching rule returns ``[word]`` (morph_en.py:1147).

Rule/exception DATA lives in lang_morph_data.py (Sun's public LiteMorph_en
tables — see that module's provenance note).
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

from whoosh_reloaded_spark.lang_morph_data import EXCEPTIONS, RULES

_PARTITION_SIZE = 20  # named-group limit workaround, morph_en.py:1094-1098


def _load():
    exdict: Dict[str, str] = {}
    for line in EXCEPTIONS.splitlines():
        line = line.strip()
        if line:
            for w in line.split(" "):
                exdict[w] = line
    rules: List[Tuple[str, str]] = []
    for line in RULES.splitlines():
        if line:
            pat, results = line.split("\t")
            rules.append((pat, results))
    partitions = []
    for p in range(0, len(rules) // _PARTITION_SIZE + 1):
        chunk = rules[p * _PARTITION_SIZE:(p + 1) * _PARTITION_SIZE]
        pattern = "|".join(f"(?P<_g{i}>{r[0]})$" for i, r in enumerate(chunk))
        partitions.append(re.compile(pattern))
    return exdict, rules, partitions


_EXDICT, _RULES, _PARTITIONS = _load()


def variations(word: str) -> Sequence[str]:
    """Morphological variations of an English word (may contain non-words;
    callers filter against the lexicon)."""
    if word in _EXDICT:
        return _EXDICT[word].split(" ")

    for i, p in enumerate(_PARTITIONS):
        match = p.search(word)
        if match:
            num = int(
                [
                    k
                    for k, v in match.groupdict().items()
                    if v is not None and k.startswith("_g")
                ][0][2:]
            )
            groups = [g for g in match.groups() if g is not None]
            ending = groups[-1]
            root = word[: 0 - len(ending)] if ending else word

            out = {word}
            results = _RULES[i * _PARTITION_SIZE + num][1]
            for result in results.split(","):
                if result.startswith("&"):
                    out.add(root + root[-1] + result[1:])
                elif result.startswith("*"):
                    pass  # reference no-op (discarded set.union) — see module doc
                else:
                    out.add(root + result)
            return set(out)

    return [word]
