"""Arrow-vectorized UDF surface — SURVEY §2.B Q35 (the reference's R13
embedding stage shape: batch inference over Arrow batches,
``app.py:46-48`` + ``helper/multiple_document_upload.py:161-168``).

Q35 normalizes ``events.value`` with constants baked as literals
(mu=100, sigma=50) so the result is deterministic and oracle-matched —
proving the Arrow round-trip bit-preserves doubles. The same
``pandas_udf`` shape carries real model inference in
sources/embedding_stage.py.

Scale: pandas_udf transfers columnar Arrow batches (zero-copy on the
JVM side) — 10-100x over row-at-a-time Python UDFs; batch size bounded
by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..tables import load

MU = 100.0
SIGMA = 50.0


def _zscore_udf():
    # created lazily: parsing the DDL return type needs an active session
    @pandas_udf("double")
    def _zscore(v: pd.Series) -> pd.Series:
        return (v - MU) / SIGMA

    return _zscore


def q35_pandas_udf_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    _zscore = _zscore_udf()
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.round(_zscore("value"), 4).alias("zvalue"),
        )
        .orderBy("event_id")
    )


Q35_SQL = f"""
SELECT event_id,
       round((value - {MU}) / {SIGMA}, 4) AS zvalue
FROM events
ORDER BY event_id
"""


QUERIES = {
    "q35_pandas_udf_zscore": q35_pandas_udf_zscore,
}

ORACLE = {
    "q35_pandas_udf_zscore": Q35_SQL,
}
