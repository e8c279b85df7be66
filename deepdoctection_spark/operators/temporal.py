"""Temporal joins Spark lacks as built-ins: as-of join and interval range
join, both expressed as single-shuffle DataFrame plans.

The reference has no temporal-join surface (its dataflows are per-document);
these are the training-pipeline operators the engine needs for transcript /
event alignment at scale (join each model response to the most recent prior
config change; join events into incident windows). Both avoid the naive
O(left x right) theta-join Spark would otherwise plan:

- :func:`asof_join` — the union-window formulation: tag both sides, union,
  one hash shuffle on the key, and a running ``last(..., ignorenulls)``
  window carries the most recent right-side payload forward onto left rows.
  Zero joins, zero fanout; the shuffle is the same one an equi-join on the
  key would pay. This is the standard big-data as-of shape (kdb's ``aj`` /
  pandas ``merge_asof`` semantics, distributed).
- :func:`range_join_intervals` — bucketed containment join: intervals are
  exploded to the fixed-width buckets they overlap (bounded fanout
  ``len/width + 1``), points carry their single bucket, and the join is a
  plain equi-join on (key, bucket) refined by the exact BETWEEN predicate.
  Each (interval, point) pair meets in exactly one bucket — the point's —
  so no post-join dedup is needed. At 100 TB both sides shuffle once on
  (key, bucket); AQE handles residual bucket skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    strict: bool = False,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` (``<`` when ``strict``) within the same
    ``on`` group; left rows with no prior right row keep nulls.

    Plan: union with a side tag, one window over (on ORDER BY ts, side)
    with ``last(payload, ignorenulls=True)`` rows-unbounded-preceding —
    right rows sort before left rows at equal ts (after, when strict), so
    the running last is exactly the as-of match. One shuffle, no join node.

    When several RIGHT rows share the same ``right_ts`` within a group,
    pass ``right_tiebreak`` (a right payload/ID column) to pick the row
    with the greatest tiebreak value deterministically; without it the
    winner among exact-ts duplicates is partition-order-dependent.

    All payload columns travel as ONE struct carried by a single
    ``last(ignorenulls=True)``: a matched right row's legitimately-NULL
    payload field stays NULL in the output (merge_asof / ASOF JOIN
    semantics) instead of being backfilled per-column from an older row.
    """
    # right rows must be visible to a left row at the same ts iff not strict
    right_side, left_side = (0, 1) if not strict else (2, 1)
    rsel = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias("_ts"),
        F.lit(right_side).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in right_payload]).alias("_r"),
    )
    left_cols = left.columns
    lsel = left.select(
        F.col(on).alias(on),
        F.col(left_ts).alias("_ts"),
        F.lit(left_side).alias("_side"),
        F.lit(None).cast(rsel.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
    )
    rsel = rsel.select(
        on,
        "_ts",
        "_side",
        "_r",
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left_cols],
    )
    order = ["_ts", "_side"]
    if right_tiebreak is not None:
        if right_tiebreak not in right_payload:
            raise ValueError("right_tiebreak must be a right_payload column")
        # left rows carry a null struct; nulls-first keeps them ordered
        # before any real right row at the same (_ts, _side) — irrelevant
        # for correctness (sides differ) but deterministic
        order.append(F.col("_r").getField(right_tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lsel.unionByName(rsel).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_m")
    )
    out = carried.filter(F.col("_side") == left_side).select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col("_m").getField(c).alias(f"{c}_right") for c in right_payload],
    )
    return out


def range_join_intervals(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join every point to every interval (same ``on`` key) with
    ``start_ts <= point_ts <= end_ts``. Timestamps are integral (e.g.
    epoch micros); ``bucket_width`` is in the same unit and should be at
    least the typical interval length (fanout per interval is
    ``len/width + 1`` replicas).

    Plan: intervals explode to the bucket ids they overlap (sequence),
    points compute one bucket id, equi-join on (key, bucket), refine with
    the exact BETWEEN. A (point, interval) pair can only meet in the
    point's bucket, so matches are already distinct."""
    ivals = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(start_ts) / bucket_width).cast("long"),
                (F.col(end_ts) / bucket_width).cast("long"),
            )
        ),
    )
    pts = points.withColumn(
        "_bucket", (F.col(point_ts) / bucket_width).cast("long")
    )
    joined = pts.join(ivals, on=[on, "_bucket"], how="inner").filter(
        (F.col(point_ts) >= F.col(start_ts))
        & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.drop("_bucket")
