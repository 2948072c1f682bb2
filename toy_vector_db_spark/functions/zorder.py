"""Z-order (Morton) clustering keys for multi-dimensional file skipping.

A single-key sorted layout (`plans/catalog.compact(sort_by=...)`, the
reference's write-through store has no layout control at all —
pkg/storage/storage.go keeps insertion order) makes parquet min/max
stats selective for ONE column; predicates on a second column still
touch every file. Interleaving the bits of several columns' bucket
ids (the Morton curve — the same construction behind Delta/Iceberg
``OPTIMIZE ZORDER``) gives every interleaved column partial
selectivity: a box predicate on d dimensions intersects
O(files^(1-1/d)) files instead of all of them.

Two deliberate simplifications versus the lakehouse implementations,
both documented because they matter at skew:

  * **Fixed-width buckets, not range ids.** Each column is bucketed
    as ``(v - min) * B / (max - min + 1)`` with exact integer
    arithmetic — engine-portable (the DuckDB oracle replays it bit
    for bit), but a heavily skewed column wastes bucket resolution
    where no data lives. Delta's range-id variant (approx quantiles
    → equi-depth buckets) fixes skew at the cost of a
    sampling-dependent, non-replayable key.
  * **min/max via one driver-fetched aggregate row** (2 values per
    column — bounded, the same pattern as the ANN fit samples), not
    a window: joining a frame to its own aggregate trips Catalyst's
    self-join disambiguation, and a global window over the CORPUS is
    a real scale smell (unlike the tiny frames where this repo uses
    one).

Everything else is pure Column expressions inside codegen: shift /
mask / or per bit, ``2 * bits_per_col`` terms total.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 6) -> Column:
    """Morton-interleave the low ``bits`` of each column (non-negative
    ints): column j contributes its bit i at output position
    ``i * len(cols) + j``. len(cols) * bits must fit a BIGINT (<= 62)."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds bigint range")
    terms = [
        F.shiftleft(F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1)),
                    i * n + j)
        for i in range(bits) for j, c in enumerate(cols)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def fixed_width_bucket(col: Column, vmin: int, vmax: int,
                       buckets: int) -> Column:
    """Fixed-width bucket id in [0, buckets): floor of
    ``(v - vmin) * buckets / (vmax - vmin + 1)``. The division is
    IEEE double in Spark and DuckDB alike — exact while
    ``span * buckets < 2^53`` — and the ``least`` guard pins the top
    edge against any rounding at extreme spans."""
    span = max(int(vmax) - int(vmin) + 1, 1)
    raw = ((col.cast("bigint") - F.lit(int(vmin)))
           * F.lit(int(buckets)) / F.lit(span)).cast("bigint")
    return F.least(raw, F.lit(int(buckets) - 1))


def z_value(df: DataFrame, cols: list[str], buckets: int = 64,
            out_col: str = "__z") -> DataFrame:
    """Append the Morton key over ``cols`` (numeric / date / timestamp
    — dates are bucketed on their day number). One aggregate computes
    every column's exact min/max; the single result row is fetched to
    the driver (bounded: 2 values per column) and baked into the
    bucket expressions, so the key computation itself is map-only.
    ``buckets`` rounds UP to the next power of two (bit interleaving
    needs whole bits)."""
    bits = max(1, (int(buckets) - 1).bit_length())

    def as_long(c: str) -> Column:
        t = dict(df.dtypes)[c]
        if t == "date":
            return F.datediff(F.col(c), F.lit("1970-01-01").cast("date")) \
                .cast("bigint")
        if t.startswith("timestamp"):
            return F.unix_timestamp(F.col(c)).cast("bigint")
        return F.col(c).cast("bigint")

    aggs = []
    for c in cols:
        aggs += [F.min(as_long(c)).alias(f"__min_{c}"),
                 F.max(as_long(c)).alias(f"__max_{c}")]
    stats = df.agg(*aggs).first()
    dead = [c for c in cols if stats[f"__min_{c}"] is None]
    if dead:
        # empty input, or a column with no non-null values: there is
        # no range to bucket — fail here with the real cause instead
        # of the bare TypeError int(None) would raise below
        raise ValueError(
            f"z_value: no non-null values for column(s) {dead} "
            "(empty input or all-null column) — no Morton key range "
            "can be derived")
    # a null VALUE in an interleave column lands in the MIN bucket:
    # coalesce to vmin BEFORE bucketing (inside fixed_width_bucket,
    # Spark's null-skipping least() would otherwise quietly send null
    # raws to the TOP bucket), so the row keeps a real key and sorts
    # with the column's smallest values instead of a null __z
    parts = [fixed_width_bucket(
                F.coalesce(as_long(c), F.lit(int(stats[f"__min_{c}"]))),
                stats[f"__min_{c}"], stats[f"__max_{c}"], 1 << bits)
             for c in cols]
    return df.withColumn(out_col, interleave_bits(parts, bits))


def write_zordered(df: DataFrame, path: str, by: list[str],
                   target_files: int, buckets: int = 64) -> None:
    """Write ``df`` as a z-ordered parquet layout: range-partition and
    sort on the Morton key over ``by``, drop the key, write
    ``target_files`` files. Every column in ``by`` keeps partially
    selective file-level min/max stats, so readers' multi-dimensional
    predicates prune files (the OPTIMIZE ZORDER write path; the
    versioned catalog exposes the same layout via
    ``compact(zorder_by=...)``)."""
    out = z_value(df, by, buckets)
    (out.repartitionByRange(target_files, F.col("__z"))
        .sortWithinPartitions("__z").drop("__z")
        .write.mode("overwrite").parquet(path))
