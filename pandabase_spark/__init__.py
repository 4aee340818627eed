"""pandabase_spark — a PySpark-native keyed-table + pipeline engine.

A from-scratch re-expression of the capabilities of notsambeck/pandabase
(reference at /root/reference, cited as ``reference:path:line`` in
docstrings) on top of Apache Spark, plus the operator surface a
large-scale training-data pipeline needs:

- keyed relational tables (primary-key semantics) stored as
  hash-bucketed parquet segments under a manifest commit log with
  atomic snapshot commits, three write modes (``create_only`` /
  ``append`` / ``upsert``) — :mod:`.io`;
- schema inference + narrowing + coercion rules — :mod:`.types`;
- primary-key range reads with filter pushdown and point-lookup bucket
  pruning — :mod:`.io`;
- catalog utilities (has/drop/list/describe/vacuum) over the Hadoop
  FileSystem API — :mod:`.io`, :mod:`.fs`;
- a tolerance-based distributed DataFrame comparator (``companda``)
  — :mod:`.compare`;
- dedup (exact / content-hash / n-gram Jaccard / MinHash+LSH / SimHash
  / embedding-cosine) — :mod:`.operators.dedup`;
- similarity search (exact cosine top-k, hyperplane-LSH ANN)
  — :mod:`.operators.similarity`;
- text analysis (tokens, quality, language-ID, fingerprints)
  — :mod:`.operators.text_analysis`, :mod:`.functions.text`;
- JSON column ops — :mod:`.operators.json_ops`;
- multimodal binary-payload plumbing with REAL dependency-free codecs
  through the decode seam (PPM, PNG incl. inflate+unfilter, PCM WAV,
  baseline JPEG incl. huffman entropy decode + IDCT, AVI container
  demux with real frame sampling, magic-byte
  auto-dispatch and mixed-modality embedding for heterogeneous
  corpora; PIL/ffmpeg formats stay behind a lazy-import seam)
  — :mod:`.operators.multimodal`;
- Structured Streaming: foreachBatch upsert, watermarked windows,
  stream dedup, stateful sessionization — :mod:`.streaming`;
- CSV ingestion — :mod:`.sources`.

Design stance: declare logical plans with the DataFrame API and let
Catalyst/Tungsten choose physical strategy; Python appears only at the
multimodal decode seam (Arrow-batched mapInPandas) and the stateful
sessionizer (applyInPandasWithState) — never row-at-a-time.
"""

from pandabase_spark.names import clean_name
from pandabase_spark.session import engine_builder, get_spark
from pandabase_spark.io import KeyedCatalog, IntegrityError, TableMeta
from pandabase_spark.compare import companda, companda_report, Companda

__version__ = "0.2.0"

__all__ = [
    "clean_name",
    "engine_builder",
    "get_spark",
    "KeyedCatalog",
    "IntegrityError",
    "TableMeta",
    "companda",
    "companda_report",
    "Companda",
    "__version__",
]
