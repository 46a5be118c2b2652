"""fetcher: URL/file → blob column with error-as-column.

Reference: builtin/fetcher.cc:188 and doc ValueExpression.md §fetcher
— returns {content: BLOB, error: STRING}; a failed fetch populates
`error` instead of failing the query (the same convention
multimodal.decode_images uses downstream).

Implemented as an Arrow-batched pandas UDF over urllib: each Python
worker fetches its partition's URLs. Scale notes: fetches are
I/O-bound — repartition the URL table to set fetch parallelism
(partitions × executors concurrent requests), and keep a per-row
timeout so one dead host can't stall a partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FETCH_TYPE = T.StructType(
    [
        T.StructField("content", T.BinaryType()),
        T.StructField("error", T.StringType()),
    ]
)


def fetcher(url: Column, timeout_s: float = 10.0, max_bytes: int = 64 << 20) -> Column:
    """fetcher(url) → struct(content BINARY, error STRING)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_FETCH_TYPE)
    def _fetch(urls: pd.Series) -> pd.DataFrame:
        import urllib.request

        contents, errors = [], []
        for u in urls:
            try:
                if u is None:
                    raise ValueError("null url")
                with urllib.request.urlopen(u, timeout=timeout_s) as resp:
                    data = resp.read(max_bytes + 1)
                if len(data) > max_bytes:
                    raise ValueError(f"response exceeds {max_bytes} bytes")
                contents.append(data)
                errors.append(None)
            except Exception as e:  # error-as-column, never fail the job
                contents.append(None)
                errors.append(f"{type(e).__name__}: {e}")
        return pd.DataFrame({"content": contents, "error": errors})

    return _fetch(url)


def fetch_dataset(
    urls: DataFrame, url_col: str = "url", parallelism: int | None = None
) -> DataFrame:
    """Apply fetcher over a URL table; optional repartition sets the
    concurrent-fetch fan-out."""
    df = urls if parallelism is None else urls.repartition(parallelism)
    return df.withColumn("fetched", fetcher(F.col(url_col))).select(
        "*",
        F.col("fetched.content").alias("content"),
        F.col("fetched.error").alias("error"),
    ).drop("fetched")
