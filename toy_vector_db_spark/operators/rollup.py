"""Hypertable-style multi-resolution time rollup.

Beyond-parity operator (the reference has no time types at all,
SURVEY §1.2): aggregate an event stream into several time resolutions
in ONE pass using grouping sets — the expand happens map-side, so
there is a single shuffle regardless of how many resolutions are
requested (vs one scan+shuffle per resolution with a union approach).

At 100 TB this is the continuous-aggregate pattern: run it over each
ingest increment and MERGE into the rollup table keyed by
(resolution, bucket, dims).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RESOLUTIONS = {"minute": 60, "hour": 3600, "day": 86400}


def time_bucket(ts: Column, resolution: str) -> Column:
    """Epoch-aligned bucket start in epoch seconds (tz-independent).
    Pure arithmetic rather than F.window: Spark allows only one
    window() expression per projection, and a multi-resolution rollup
    needs one bucket column per resolution."""
    secs = RESOLUTIONS[resolution]
    return (F.floor(F.unix_timestamp(ts) / secs) * secs).cast("bigint")


def multi_rollup(events: DataFrame, resolutions: list[str] | None = None,
                 ts_col: str = "ts", dims: list[str] | None = None,
                 value_col: str = "value") -> DataFrame:
    """One-pass rollup at several resolutions.

    Output: (resolution, bucket_epoch, *dims, n_events, sum_value) —
    one row group per (resolution, bucket, dims). Uses GROUPING SETS:
    each input row expands to len(resolutions) grouping rows before the
    single hash shuffle; partial aggregation still combines map-side.
    """
    resolutions = resolutions or ["hour", "day"]
    dims = dims if dims is not None else ["event_type"]
    ts = F.col(ts_col)
    bucketed = events.select(
        *[time_bucket(ts, r).alias(f"__b_{r}") for r in resolutions],
        *dims, F.col(value_col))
    sets = [[F.col(f"__b_{r}"), *[F.col(d) for d in dims]] for r in resolutions]
    agg = (bucketed.groupingSets(sets,
                                 *[F.col(f"__b_{r}") for r in resolutions],
                                 *[F.col(d) for d in dims])
           .agg(F.count("*").alias("n_events"),
                F.round(F.sum(value_col), 2).alias("sum_value")))
    resolution = F.coalesce(*[
        F.when(F.col(f"__b_{r}").isNotNull(), F.lit(r)) for r in resolutions])
    bucket = F.coalesce(*[F.col(f"__b_{r}") for r in resolutions])
    return agg.select(resolution.alias("resolution"),
                      bucket.alias("bucket_epoch"),
                      *dims, "n_events", "sum_value") \
              .filter(F.col("bucket_epoch").isNotNull())
