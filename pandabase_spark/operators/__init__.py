"""Large-scale training-data-pipeline operators.

The reference (notsambeck/pandabase) stops at keyed-table storage; these
modules are the extension surface a 100 TB LLM-data pipeline needs
(SURVEY.md §7 step 9), built Spark-first:

- :mod:`.dedup` — exact, content-hash, n-gram Jaccard, MinHash+LSH,
  SimHash, and embedding-cosine near-duplicate detection;
- :mod:`.similarity` — cosine top-k search and random-hyperplane LSH
  approximate nearest neighbors over ``array<float>`` columns;
- :mod:`.text_analysis` — per-document stats/quality/language tables;
- :mod:`.json_ops` — typed extraction over JSON string columns;
- :mod:`.multimodal` — binary-payload plumbing (metadata JVM-side,
  decode stubbed behind mapInPandas).

Design rules: no all-pairs joins outside LSH buckets; shuffles only on
explicit group keys (hash, shingle, bucket); Python only in the
multimodal decode stub (Arrow-batched).
"""

from pandabase_spark.operators.dedup import (
    dedup_exact,
    dedup_by_content_hash,
    duplicate_groups,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash_pairs,
    embedding_near_dup_pairs,
    connected_components,
)
from pandabase_spark.operators.timeseries import resample, fill_gaps
from pandabase_spark.operators.similarity import (
    cosine_topk,
    hyperplane_buckets,
    ann_topk_lsh,
)
from pandabase_spark.operators.text_analysis import (
    document_profile,
    corpus_language_summary,
)
from pandabase_spark.operators.json_ops import (
    extract_json_fields,
    events_enriched,
)
from pandabase_spark.operators.joins import (
    asof_join,
    range_join,
    salted_join,
    semi_join,
    anti_join,
)

__all__ = [
    "dedup_exact",
    "dedup_by_content_hash",
    "duplicate_groups",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_near_dup_pairs",
    "cosine_topk",
    "hyperplane_buckets",
    "ann_topk_lsh",
    "document_profile",
    "corpus_language_summary",
    "extract_json_fields",
    "events_enriched",
    "asof_join",
    "range_join",
    "salted_join",
    "semi_join",
    "anti_join",
    "connected_components",
    "resample",
    "fill_gaps",
]
