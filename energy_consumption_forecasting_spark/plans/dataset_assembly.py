"""EP2 — modeling-dataset assembly (reference normalization notebook,
cells 5-18; SURVEY §3 EP2).

Dataflow: hourly balance + monthly consumption-by-fuel + daily weather
→ daily means (A1) → date join (J2) → monthly totals (A2) → daily share
of month (W18 numerator) → monthly→daily disaggregated consumption
target (W18) → final join → dataset.

The reference's right-join + forward-fill dance (N:450-451,631-633)
collapses to month-key windows/joins; the monthly side is always tiny
and broadcast."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# W19 unit factors (normalization.ipynb:70-74,134-137): BTU→MWh.
COAL_MWH_PER_KTON = 1760.0
PETROL_LIQ_FACTOR = 12.9 / 42.0
PETROL_COKE_FACTOR = 2360.0
NATGAS_FACTOR = 0.13


def daily_means(hourly: DataFrame, ts_col: str, value_cols: list[str]) -> DataFrame:
    """A1: hourly → daily means, rounded to integral MW (N:183-205)."""
    return hourly.groupBy(F.to_date(ts_col).alias("date")).agg(
        *[F.round(F.avg(c), 0).alias(c) for c in value_cols]
    )


def monthly_consumption_target(consumption: DataFrame) -> DataFrame:
    """W19: fuel columns → one total_consumption (MWh) per month.
    'NM' sentinels must already be nulled/zeroed at scan (W15)."""
    return consumption.select(
        F.trunc("date", "MM").alias("month"),
        (
            F.col("coal") * COAL_MWH_PER_KTON
            + F.col("petroleum_liquids") * PETROL_LIQ_FACTOR
            + F.col("petroleum_coke") * PETROL_COKE_FACTOR
            + F.col("natural_gas") * NATGAS_FACTOR
        ).alias("total_consumption"),
    )


def disaggregate_monthly(
    daily: DataFrame, monthly: DataFrame, demand_col: str = "demand"
) -> DataFrame:
    """W18: daily_consumption = monthly target × day's share of month
    demand — one month window + one broadcast join (N:450-452,631-635)."""
    shares = daily.withColumn("month", F.trunc("date", "MM")).withColumn(
        "month_demand",
        F.sum(demand_col).over(Window.partitionBy("month")),
    )
    return (
        shares.join(F.broadcast(monthly), "month")
        .withColumn(
            "consumption",
            F.round(
                F.col("total_consumption")
                * (F.col(demand_col) / F.col("month_demand")),
                0,
            ),
        )
        .drop("month", "month_demand", "total_consumption")
    )


def assemble_dataset(
    hourly_balance: DataFrame,
    consumption_monthly: DataFrame,
    weather_daily: DataFrame,
    ts_col: str,
    balance_value_cols: list[str],
    weather_value_cols: list[str],
) -> DataFrame:
    """The full EP2 chain → one daily modeling table (dataset.csv shape)."""
    features = daily_means(hourly_balance, ts_col, balance_value_cols).join(
        weather_daily.groupBy(F.to_date("DATE").alias("date")).agg(
            *[F.round(F.avg(c), 0).alias(c) for c in weather_value_cols]
        ),
        "date",
    )
    monthly = monthly_consumption_target(consumption_monthly)
    return disaggregate_monthly(features, monthly).orderBy("date")
