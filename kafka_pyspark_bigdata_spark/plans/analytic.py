"""Analytic window-frame operators: moving aggregates and ntile ranking.

Complements plans.advanced (row_number/lag/running-sum) with the two
remaining window families an analytics engine needs: sliding ROWS frames
(moving averages) and bucketed ranking (NTILE). Both shuffle once on the
partition key and run linear per-key passes; the moving sum accumulates in
DECIMAL (functions.numeric rationale) so frame values are engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import dsum, dsum_sql
from ..sources.batch import load_table

# Microsecond-precision events CTE (same rationale as plans.advanced).
_EV_US = "ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events)"

MAVG_WINDOW = 5  # current row + 4 preceding


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 5-event moving average of ``value`` per user — the sliding
    ROWS frame operator. The frame sum is decimal-accumulated then divided
    by the frame count in double, so the result is bit-identical across
    engines regardless of frame evaluation order."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(MAVG_WINDOW - 1), 0)
    )
    mavg = (
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
        / F.count("value").over(w)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "value",
        mavg.alias("moving_avg"),
    ).orderBy("user_id", "ts", "event_id")


Q_MOVING_AVG_SQL = f"""
WITH {_EV_US}
SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
         / COUNT(value) OVER w AS moving_avg
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {MAVG_WINDOW - 1} PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts, event_id
"""


def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) price quartiles per order priority, rolled up to quartile
    stats — bucketed ranking with a deterministic total order (price +
    orderkey tiebreak), then one partial-agg shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderpriority", "quartile")
    )


Q_NTILE_SQL = f"""
SELECT o_orderpriority, quartile, COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS sum_price,
       MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
FROM (
  SELECT o_orderpriority, o_totalprice,
         CAST(NTILE(4) OVER (
           PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
         ) AS INTEGER) AS quartile
  FROM orders
)
GROUP BY o_orderpriority, quartile
ORDER BY o_orderpriority, quartile
"""


QUERIES = {
    "q_moving_avg": q_moving_avg,
    "q_ntile_quartiles": q_ntile_quartiles,
}

ORACLES = {
    "q_moving_avg": Q_MOVING_AVG_SQL,
    "q_ntile_quartiles": Q_NTILE_SQL,
}
