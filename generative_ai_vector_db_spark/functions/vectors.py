"""Vector math over ``array<float>`` columns via Spark higher-order fns.

The reference delegates all vector math to Chroma/hnswlib (L2 metric,
``app.py:73-76``, k=13 search at ``app.py:409``). Here the same semantics
are Spark SQL expressions: ``zip_with`` + ``aggregate`` folds, evaluated
JVM-side — no UDF, no Arrow crossing, codegen-friendly.

Numeric policy (oracle-critical): every float32 element is widened to
double BEFORE any arithmetic (exact conversion), and folds run strictly
left-to-right in index order — the same order DuckDB's ``list_sum`` over
a list comprehension uses — so Spark and the oracle produce bit-identical
doubles, and ``round(_, 4)`` canonicalization is stable.

At 100 TB: these are narrow per-row expressions (no shuffle). The scan
cost is dominated by reading the embedding column; callers should prune
other columns. For search, pair them with the pruning strategies in
``operators/vector.py`` (broadcast query side, LSH/IVF bucketing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _fold_sum(arr: Column) -> Column:
    """Strict left-to-right sum of a double array (deterministic order)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def l2_sq(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return _fold_sum(F.transform(d, lambda x: x * x))


def l2(a: Column, b: Column) -> Column:
    return F.sqrt(l2_sq(a, b))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---------------------------------------------------------------------------
# Arrow-vectorized scorers — the fast path for LARGE pair sets.
#
# Spark higher-order functions are interpreted (no codegen), so the fold
# above costs ~1 us/element; these pandas_udfs move Arrow batches into
# numpy instead (measured 2.4x on the sf0.1 similarity join). They are
# BIT-IDENTICAL to the folds: elementwise ops in float64 followed by
# np.cumsum, which accumulates strictly left-to-right in index order —
# the same sequence of double additions as aggregate()/list_sum
# (asserted in tests/test_vector.py::test_arrow_scorers_bit_identical).
#
# INPUT CONTRACT (all scorers below): both array columns must be
# NON-NULL with a FIXED per-call dimension — np.stack raises on null
# or ragged elements (a task crash), where the interpreted folds they
# replaced would have propagated null. Every caller scores arrays
# produced by the fixture loaders / _int8_codes, which are non-null
# fixed-dim by construction; a new caller with nullable arrays must
# filter or coalesce BEFORE scoring.
# ---------------------------------------------------------------------------
def l2_arrow() -> "Column":
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _l2(a, b):
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        return pd.Series(np.sqrt(np.cumsum((A - B) ** 2, axis=1)[:, -1]))

    return _l2


def cosine_arrow() -> "Column":
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a, b):
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        dot = np.cumsum(A * B, axis=1)[:, -1]
        na = np.sqrt(np.cumsum(A * A, axis=1)[:, -1])
        nb = np.sqrt(np.cumsum(B * B, axis=1)[:, -1])
        return pd.Series(dot / (na * nb))

    return _cos


def int_dot_arrow() -> "Column":
    """Vectorized int64 dot over two integer-array columns. Unlike the
    float scorers above, no accumulation-order discipline is needed:
    integer addition is exact and associative, so a plain row-wise
    product-sum equals the zip_with/aggregate fold bit-for-bit (the
    |code| <= 127, dim <= a few thousand regime is ~2^24 per dot —
    nowhere near int64). Used by the q347 NN-descent pair scoring,
    where the N*R^2 candidate mass makes the interpreted fold a
    per-pair cost that grows with N while the build's per-round job
    cadence stays constant."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _idot(a, b):
        A = np.stack(a.to_numpy()).astype(np.int64)
        B = np.stack(b.to_numpy()).astype(np.int64)
        return pd.Series((A * B).sum(axis=1))

    return _idot
