from newsleak_spark.indexing.build import (
    IndexConfig,
    append_index,
    build_index,
    compact_index,
    list_deltas,
)
from newsleak_spark.indexing.manifest import Manifest

__all__ = [
    "IndexConfig",
    "append_index",
    "build_index",
    "compact_index",
    "list_deltas",
    "Manifest",
]
