from newsleak_spark.indexing.build import IndexConfig, build_index
from newsleak_spark.indexing.manifest import Manifest

__all__ = ["IndexConfig", "build_index", "Manifest"]
