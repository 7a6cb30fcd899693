from whoosh_reloaded_spark.textops.dedup import (  # noqa: F401
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_vs_doc,
    simhash,
    with_shingles,
)
from whoosh_reloaded_spark.textops.quality import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_scores,
    token_count_bpe,
)
from whoosh_reloaded_spark.textops.similarity import cosine_topk  # noqa: F401
