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
    first 60 days, then LEFT JOIN a generated date spine so
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


@query(
    "timeseries_rolling_stats",
    oracle=f"""
    -- Trailing 7-day rolling mean + relative-deviation anomaly flag over
    -- the DENSE (gap-filled) daily series: rolling windows are only
    -- correct over a dense spine — a missing day would silently widen
    -- the ROWS frame's time span.  All arithmetic runs on already-
    -- rounded daily revenues through exact decimal sums.
    WITH b AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS d0 FROM orders),
    spine AS (
      SELECT CAST(unnest(generate_series(d0, d0 + {SPINE_DAYS - 1},
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM b),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)::DOUBLE AS revenue
      FROM orders, b
      WHERE CAST(o_orderdate AS DATE) BETWEEN d0 AND d0 + {SPINE_DAYS - 1}
      GROUP BY 1),
    dense AS (
      SELECT s.day, COALESCE(d.revenue, 0.0) AS revenue
      FROM spine s LEFT JOIN daily d ON s.day = d.day),
    roll AS (
      SELECT day, revenue,
             ROUND(CAST(SUM(CAST(revenue AS DECIMAL(18,4))) OVER w AS DOUBLE)
                   / COUNT(*) OVER w, 2) AS avg7
      FROM dense
      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT strftime(day, '%Y-%m-%d') AS day, revenue, avg7,
           CASE WHEN avg7 = 0 THEN 0.0
                ELSE ROUND((revenue - avg7) / avg7 * 100, 2) END AS dev_pct,
           (avg7 <> 0 AND abs((revenue - avg7) / avg7) > 0.5) AS is_anomaly
    FROM roll
    """,
)
def timeseries_rolling_stats(spark, sf_dir):
    """Rolling 7-day trailing mean and anomaly flag (|deviation| > 50% of
    the trailing mean) over the dense daily revenue series — the
    monitoring layer on top of gap filling, and the reason gap filling
    exists: a ROWS frame over a sparse series would silently span a
    variable amount of calendar time.

    Scale shape: one window over the spine-sized series (rows ∝ calendar
    days, not data volume), fed by the same pushed-down bounded scan +
    map-side-combined daily agg as timeseries_gap_fill."""
    from pyspark.sql import Window

    dense = timeseries_gap_fill(spark, sf_dir).select("day", "revenue")
    w = Window.orderBy("day").rowsBetween(-6, 0)
    roll = dense.select(
        "day",
        "revenue",
        F.round(
            F.sum(F.col("revenue").cast("decimal(18,4)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            2,
        ).alias("avg7"),
    )
    dev = (F.col("revenue") - F.col("avg7")) / F.col("avg7")
    return roll.select(
        "day",
        "revenue",
        "avg7",
        F.when(F.col("avg7") == 0, F.lit(0.0))
        .otherwise(F.round(dev * 100, 2))
        .alias("dev_pct"),
        ((F.col("avg7") != 0) & (F.abs(dev) > 0.5)).alias("is_anomaly"),
    )
