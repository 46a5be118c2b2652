"""Scalar function families (SURVEY.md §2.9).

Everything here returns pyspark Columns built from JVM-side built-ins
(whole-stage-codegen friendly); Python/Pandas UDFs appear only where
built-ins genuinely cannot express the semantics (signal/fft, image).
"""

from mldb_spark.functions.core import (  # noqa: F401
    binomial_lb_80,
    binomial_ub_80,
    clamp,
    geo_distance,
    jaccard_index,
    quantize,
    replace_not_finite,
    row_hash,
)
from mldb_spark.functions.text import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
    tokenize,
)
from mldb_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    normalize,
)
