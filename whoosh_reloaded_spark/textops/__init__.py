from whoosh_reloaded_spark.textops.dedup import (  # noqa: F401
    decontaminate,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_vs_doc,
    simhash,
    with_shingles,
)
from whoosh_reloaded_spark.textops.quality import (  # noqa: F401
    clean_corpus,
    doc_fingerprint,
    language_id,
    quality_scores,
    repetition_scores,
    scrub,
    token_count_bpe,
)
from whoosh_reloaded_spark.textops.similarity import cosine_topk  # noqa: F401
