"""mldb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of MLDB (mldbai/mldb), rebuilt Spark-first.

Nothing here is a port: the reference's C++ execution engine
(columnar chunks, thread pools, hand-rolled sort-merge joins) is
replaced wholesale by Catalyst + Tungsten; this package contributes
the semantics layer (MLDB dialect constructs, virtual dataset
operators, procedures, text/dedup/similarity pipelines) expressed as
DataFrame plans.

Layout (mirrors SURVEY.md §7.1):
  session    — tuned SparkSession factory
  catalog    — named datasets over parquet dirs (testdata or user paths)
  functions/ — scalar function families (SURVEY §2.9)
  operators/ — virtual datasets + procedures (SURVEY §2.1-2.8, §2.13)
  dedup      — exact/minhash/simhash/ngram dedup (beyond-reference)
  similarity — embedding ANN / brute-force cosine top-k
"""

from mldb_spark.session import get_spark  # noqa: F401
from mldb_spark.catalog import Catalog  # noqa: F401

__version__ = "0.1.0"
