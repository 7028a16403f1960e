"""newsleak_spark — a from-scratch PySpark-native fulltext index + BM25
query engine with the query/data-processing capabilities of
uhh-lt/newsleak (reference at /root/reference, cited per-module).

Subpackages:
  analysis     tokenize/normalize contract (newsleak A1-A7 analyzers)
  transcripts  the transcript input table (BASELINE input_hint)
  indexing     inverted-index build: postings, segments, manifest, resume
  query        QuerySpec IR (Facets analog), brute-force + segment BM25
  facets       terms/cardinality/date-histogram aggs, co-occurrence net
  textops      training-data ops: dedup family, lang-id, quality, counts
  similarity   embedding ANN: brute cosine top-k + LSH buckets
  multimodal   binary-column decode/feature plumbing (stubbed codecs)
"""

__version__ = "0.1.0"
