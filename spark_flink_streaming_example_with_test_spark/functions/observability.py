"""Pipeline data-quality metrics via the Observation API.

``df.observe`` attaches aggregate metrics to a plan that are computed
DURING the action that materializes it — no second scan, no extra
job. That is the 100 TB way to monitor a pipeline: a separate
``df.count()`` / ``df.agg(...)`` for metrics would re-read the input
(another full scan of the corpus); an observation is free at the
point the data already flows.

Batch here; on streaming queries the same metrics surface per
micro-batch through ``StreamingQueryListener`` progress events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_corpus_clean(
    df: DataFrame,
    text_col: str = "text",
    min_chars: int = 1,
) -> tuple[DataFrame, Observation]:
    """Attach standard corpus-hygiene metrics to a cleaning step:
    rows seen, rows with null/empty text, total characters. Returns
    (filtered frame, observation); read ``observation.get`` AFTER an
    action has run the frame.
    """
    obs = Observation("corpus_clean")
    is_bad = F.col(text_col).isNull() | (F.length(text_col) < min_chars)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(is_bad.cast("long")).alias("rows_dropped"),
        F.sum(F.coalesce(F.length(text_col), F.lit(0))).alias("total_chars"),
    )
    return observed.filter(~is_bad), obs
