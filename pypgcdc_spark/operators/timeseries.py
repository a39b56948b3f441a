"""Time-series utilities over the fact tables: calendar-spine gap
filling — the dense-date primitive every daily dashboard, forecast
feature pipeline, and SLA monitor needs (a day with zero orders must be
a ROW, not an absence).

Reference parity: no counterpart — the reference (pypgcdc) is a CDC
client; time-series shaping is part of the query surface this engine
adds (SURVEY §0).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pypgcdc_spark.queries import load, query

SPINE_DAYS = 60  # first N calendar days of the order history


@query(
    "timeseries_gap_fill",
    oracle=f"""
    -- Dense daily order series over the first {SPINE_DAYS} calendar days:
    -- a generated date spine LEFT JOINs the daily aggregate, so zero-
    -- order days materialize with is_gap = true and zero totals.
    WITH b AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS d0 FROM orders),
    spine AS (
      SELECT CAST(unnest(generate_series(d0, d0 + {SPINE_DAYS - 1},
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM b),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             COUNT(*) AS n_orders,
             ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)::DOUBLE AS revenue
      FROM orders, b
      WHERE CAST(o_orderdate AS DATE) BETWEEN d0 AND d0 + {SPINE_DAYS - 1}
      GROUP BY 1)
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           COALESCE(d.n_orders, 0) AS n_orders,
           COALESCE(d.revenue, 0.0) AS revenue,
           (d.day IS NULL) AS is_gap
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
)
def timeseries_gap_fill(spark, sf_dir):
    """Calendar gap filling: aggregate orders per day over the history's
    first {SPINE_DAYS} days, then LEFT JOIN a generated date spine so
    missing days appear explicitly (n_orders = 0, is_gap = true).

    Scale shape: the spine is a generated in-memory array (one row per
    day — thousands of rows for decades), broadcast against the daily
    aggregate; the fact table contributes one date-bounded, pushed-down
    scan plus a single groupBy(day) with map-side combine.  At 100 TB
    the spine side never grows with data volume — only with calendar
    time."""
    (orders,) = load(spark, sf_dir, "orders")
    b = orders.agg(F.min(F.to_date("o_orderdate")).alias("d0"))
    spine = b.select(
        F.explode(
            F.expr(f"sequence(d0, date_add(d0, {SPINE_DAYS - 1}), interval 1 day)")
        ).alias("day")
    )
    daily = (
        orders.join(F.broadcast(b))
        .filter(
            F.to_date("o_orderdate").between(
                F.col("d0"), F.date_add(F.col("d0"), SPINE_DAYS - 1)
            )
        )
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )
    return (
        spine.join(daily.withColumnRenamed("day", "dday"), spine.day == F.col("dday"), "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.col("dday").isNull().alias("is_gap"),
        )
    )
