from whoosh_reloaded_spark.index.build import (  # noqa: F401
    InvertedIndex,
    assign_docids,
    build_index,
    load_index,
    save_index,
)
