"""Text-quality analysis for training-data pipelines.

All JVM-side column expressions (no Python in the hot path):

- quality_scores: per-doc length / token / stopword / punctuation / digit
  ratios + a composite score
- language_id: stopword-list n-gram heuristic — score per language =
  fraction of tokens in that language's marker list; argmax with
  deterministic tie-break (higher score, then language name)
- doc_fingerprint: canonical-form fingerprint (sorted distinct tokens ->
  md5), the classic fingerprint dedup method
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoosh_reloaded_spark.textops.dedup import _tokens

# Small public marker-word lists (top function words per language).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "den", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "que", "dans"],
    "es": ["el", "la", "los", "las", "es", "no", "una", "con", "por", "para"],
}


def quality_scores(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_tokens, avg_token_len, stopword_ratio, alnum_ratio,
    quality) — composite in [0,1]."""
    from whoosh_reloaded_spark.analysis import STOP_WORDS

    toks = _tokens(text_col)
    stops_arr = F.lit(sorted(STOP_WORDS))  # one py4j call, not 33
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stops_arr, x)))
    avg_token_len = F.when(n_tokens > 0, tok_chars / n_tokens).otherwise(0.0)
    stopword_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0)
    alnum_ratio = F.when(
        n_chars > 0, tok_chars / n_chars
    ).otherwise(0.0)
    # composite: reward mid-range token lengths, some stopwords, high alnum
    quality = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.25
        + F.least(stopword_ratio * F.lit(4.0), F.lit(1.0)) * 0.25
        + alnum_ratio * 0.5
    )
    return docs.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(avg_token_len, 6).alias("avg_token_len"),
        F.round(stopword_ratio, 6).alias("stopword_ratio"),
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, pred_lang, lang_score) — marker-word ratio argmax."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)

    def _in_markers(markers_col):
        def pred(x):
            return F.array_contains(markers_col, x)

        return pred

    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.lit(list(LANG_MARKERS[lang]))
        n_hit = F.size(F.filter(toks, _in_markers(markers)))
        score = F.when(n_tokens > 0, n_hit / n_tokens).otherwise(0.0)
        scores.append(F.struct(F.round(score, 6).alias("score"), F.lit(lang).alias("lang")))
    # argmax with tie-break = alphabetically-first language: take the max
    # rounded score, then the min lang among entries equal to it
    arr = F.array(*scores)
    best_score = F.array_max(F.transform(arr, lambda s: s["score"]))

    def _is_best(bs):
        def pred(s):
            return s["score"] == bs

        return pred

    pred = F.array_min(
        F.transform(F.filter(arr, _is_best(best_score)), lambda s: s["lang"])
    )
    return docs.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        best_score.alias("lang_score"),
    )


def doc_fingerprint(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, fingerprint) — md5 of space-joined sorted distinct tokens."""
    toks = _tokens(text_col)
    canon = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    return docs.select(
        F.col(id_col), F.md5(canon).alias("fingerprint")
    )


# GPT-2-style pre-tokenizer pattern, simplified to be lookahead-free so the
# SAME regex runs in Spark (Java) and DuckDB (RE2): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs.  A cheap
# LLM-token ESTIMATOR for budget planning — not a real BPE encoder (that
# needs the merges table); counts correlate with tokenizer output because
# BPE merges never cross these pre-token boundaries.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def repetition_scores(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 2) -> DataFrame:
    """Gopher-style repetition signals per doc (token-occurrence form of
    the published "duplicate / top n-gram fraction" quality filters):

    - ``n_ngrams``       — number of token n-gram occurrences;
    - ``dup_ngram_frac`` — fraction of occurrences whose n-gram appears
      more than once in the doc;
    - ``top_ngram_frac`` — occurrences of the single most-frequent n-gram
      over all occurrences.

    Scales as a (doc, gram) count shuffle with map-side combine plus the
    per-doc reduce — work linear in doc length (no O(len^2) HOF scan),
    so a 10k-token web page costs the same per token as a tweet.  Docs
    with < n tokens report zeros."""
    toks = _tokens(text_col)
    grams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        # 2-param HOF lambda: i is the 0-based index (deliberate — see
        # the slice bound above); gram = tokens[i+1 .. i+n] joined
        lambda x, i: F.concat_ws(
            " ",
            F.array(
                *[
                    F.element_at(toks, i + F.lit(j + 1))
                    for j in range(n)
                ]
            ),
        ),
    )
    g = docs.select(F.col(id_col), F.explode(grams).alias("gram"))
    counts = g.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    agg = counts.groupBy(id_col).agg(
        F.sum("c").alias("_tot"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("_dup"),
        F.max("c").alias("_mx"),
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_tot"), F.lit(0)).cast("long").alias("n_ngrams"),
            F.round(
                F.coalesce(F.col("_dup") / F.col("_tot"), F.lit(0.0)), 6
            ).alias("dup_ngram_frac"),
            F.round(
                F.coalesce(F.col("_mx") / F.col("_tot"), F.lit(0.0)), 6
            ).alias("top_ngram_frac"),
        )
    )


# conservative dialect-portable patterns (no lookaround — valid in both
# Java regex and RE2-style engines)
SCRUB_PATTERNS = {
    "email": (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    "url": (r"https?://[^\s]+", "<URL>"),
    "phone": (r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
}


def scrub(docs: DataFrame, id_col: str = "doc_id",
          text_col: str = "text",
          kinds=("email", "url", "phone")) -> DataFrame:
    """PII/URL scrubbing for training pipelines: replace emails, URLs and
    phone-like runs with typed placeholder tokens, then collapse the
    leftover whitespace.  Pure JVM ``regexp_replace`` chain — no UDF, no
    shuffle; at 100 TB this is a map-only pass."""
    col = F.col(text_col)
    for kind in kinds:
        pat, repl = SCRUB_PATTERNS[kind]
        col = F.regexp_replace(col, pat, repl)
    col = F.trim(F.regexp_replace(col, r"\s+", " "))
    return docs.select(F.col(id_col), col.alias("text"))


def clean_corpus(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 min_tokens: int = 20, max_tokens: int = 100_000,
                 max_dup_frac: float = 0.6, max_top_frac: float = 0.3,
                 allowed_langs=None,
                 drop_exact_dups: bool = True) -> DataFrame:
    """Composed C4/Gopher-style cleaning pipeline: per doc,
    ``(id, keep, reasons)`` where `reasons` is the sorted
    comma-joined list of violated rules —

    - ``too_short`` / ``too_long``   — token-count bounds;
    - ``repetitive_dup`` / ``repetitive_top`` — duplicate / top n-gram
      occurrence fractions over the thresholds (repetition_scores);
    - ``lang``                       — detected language (language_id)
      not in `allowed_langs` (rule skipped when None);
    - ``duplicate``                  — exact duplicate text, keeping the
      lowest id of each group (rule skipped when drop_exact_dups=False).

    Every component is the already-verified relational op; the
    composition is joins on the id — no new shuffles beyond the
    components' own (each is one agg or window)."""
    q = quality_scores(docs, id_col, text_col).select(id_col, "n_tokens")
    rep = repetition_scores(docs, id_col, text_col).select(
        id_col, "dup_ngram_frac", "top_ngram_frac"
    )
    base = docs.select(id_col, text_col).join(q, id_col).join(rep, id_col)
    checks = [
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short")),
        F.when(F.col("n_tokens") > max_tokens, F.lit("too_long")),
        F.when(
            F.col("dup_ngram_frac") > max_dup_frac,
            F.lit("repetitive_dup"),
        ),
        F.when(
            F.col("top_ngram_frac") > max_top_frac,
            F.lit("repetitive_top"),
        ),
    ]
    if allowed_langs is not None:
        lang = language_id(docs, id_col, text_col).select(
            id_col, F.col("pred_lang").alias("_det_lang")
        )
        base = base.join(lang, id_col)
        checks.append(
            F.when(
                ~F.col("_det_lang").isin(list(allowed_langs)),
                F.lit("lang"),
            )
        )
    if drop_exact_dups:
        from pyspark.sql import Window

        w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
        base = base.withColumn("_dup_rn", F.row_number().over(w))
        checks.append(
            F.when(F.col("_dup_rn") > 1, F.lit("duplicate"))
        )
    reasons = F.array_sort(
        F.filter(F.array(*checks), lambda x: x.isNotNull())
    )
    return base.select(
        F.col(id_col),
        (F.size(reasons) == 0).alias("keep"),
        F.array_join(reasons, ",").alias("reasons"),
    )


def token_count_bpe(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_bpe_tokens): pre-tokenizer match count per document —
    the training-pipeline token-budget estimate, fully JVM-side."""
    from pyspark.sql import functions as F

    return docs.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(BPE_SPLIT_PATTERN))
        .cast("long")
        .alias("n_bpe_tokens"),
    )
