from newsleak_spark.query.spec import QuerySpec, parse_query_string, parse_time_range
from newsleak_spark.query.brute import bm25_topk, bm25_topk_oracle_sql

__all__ = [
    "QuerySpec",
    "parse_query_string",
    "parse_time_range",
    "bm25_topk",
    "bm25_topk_oracle_sql",
]
