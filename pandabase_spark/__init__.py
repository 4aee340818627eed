"""pandabase_spark — a PySpark-native keyed-table engine.

A from-scratch re-expression of the capabilities of notsambeck/pandabase
(reference at /root/reference, cited as ``reference:path:line`` in
docstrings) on top of Apache Spark:

- keyed relational tables (primary-key semantics) stored as
  hash-bucketed Parquet, with three write modes
  (``create_only`` / ``append`` / ``upsert``) — see :mod:`.io`;
- schema inference + narrowing + coercion rules — see :mod:`.types`;
- primary-key range reads with filter pushdown — see :mod:`.io`;
- catalog utilities (has/drop/list/describe) — see :mod:`.catalog`;
- a tolerance-based distributed DataFrame comparator (``companda``)
  — see :mod:`.compare`;
- large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing, streaming upsert) under
  :mod:`.operators`, :mod:`.functions`, :mod:`.streaming`.

Design stance: declare logical plans with the DataFrame API and let
Catalyst/Tungsten choose physical strategy; Python UDFs only where the
built-ins genuinely cannot express the semantics (and then Arrow-batched).
"""

from pandabase_spark.names import clean_name
from pandabase_spark.session import get_spark
from pandabase_spark.io import KeyedCatalog
from pandabase_spark.compare import companda, Companda

__version__ = "0.1.0"

__all__ = [
    "clean_name",
    "get_spark",
    "KeyedCatalog",
    "companda",
    "Companda",
    "__version__",
]
