"""Signal functions (SURVEY §2.9): fft / amplitude / phase / real /
imag over embedding-style arrays.

Reference: sql/builtin_signal_functions.cc (308 LoC). Numpy FFT via
an Arrow-batched pandas UDF — the canonical "genuinely can't express
in built-ins" case. Output is a struct of (real, imag) arrays so the
amplitude/phase accessors stay JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_FFT_TYPE = T.StructType(
    [
        T.StructField("re", T.ArrayType(T.DoubleType())),
        T.StructField("im", T.ArrayType(T.DoubleType())),
    ]
)


@pandas_udf(_FFT_TYPE)
def fft(v: pd.Series) -> pd.DataFrame:
    """Forward FFT of a numeric array column (vectorized per Arrow
    batch; rows may have differing lengths)."""
    res = [np.fft.fft(np.asarray(x, dtype=np.float64)) if x is not None else None for x in v]
    return pd.DataFrame(
        {
            "re": [None if r is None else r.real.tolist() for r in res],
            "im": [None if r is None else r.imag.tolist() for r in res],
        }
    )


@pandas_udf(T.ArrayType(T.DoubleType()))
def ifft_real(re: pd.Series, im: pd.Series) -> pd.Series:
    """Inverse FFT of an (re, im) pair back to the REAL signal —
    fft(x, 'backward') in the reference's round-trip idiom
    (MLDB-1972's fft(fft(impulse(32), 'forward'), 'backward'))."""
    out = []
    for r, i in zip(re, im):
        if r is None:
            out.append(None)
            continue
        spec = np.asarray(r, dtype=np.float64) + 1j * np.asarray(
            i, dtype=np.float64
        )
        out.append(np.fft.ifft(spec).real.tolist())
    return pd.Series(out)


def amplitude(fft_col: Column) -> Column:
    """|X_k| per bin — JVM-side zip_with over the struct arrays."""
    return F.zip_with(
        fft_col["re"], fft_col["im"], lambda a, b: F.sqrt(a * a + b * b)
    )


def phase(fft_col: Column) -> Column:
    return F.zip_with(fft_col["re"], fft_col["im"], lambda a, b: F.atan2(b, a))


def real(fft_col: Column) -> Column:
    return fft_col["re"]


def imag(fft_col: Column) -> Column:
    return fft_col["im"]


def impulse(length: int, position: int = 0) -> Column:
    """Unit impulse array literal (reference impulse/shifted_impulse)."""
    return F.array(
        *[F.lit(1.0) if i == position else F.lit(0.0) for i in range(length)]
    )


def shifted_impulse(length: int, position: int) -> Column:
    """shifted_impulse(len, pos) (sql/builtin_signal_functions.cc):
    the named shifted form — impulse with an explicit position."""
    return impulse(length, position)
