from whoosh_reloaded_spark.index.build import (  # noqa: F401
    FORMAT_VERSION,
    InvertedIndex,
    assign_docids,
    build_index,
    exists_in,
    last_modified,
    load_index,
    save_index,
    version_in,
)
