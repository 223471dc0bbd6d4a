"""EP1b — the flagship weather ETL (reference ``generate_weather``,
ETL.py:317-330).

Dataflow: station fixed-width scan → US filter + polygon semi-join →
per-station daily files union (semi-join on MISO station list) → drop
FLAG columns + year range → melt 31 day-columns → pivot on ELEMENT →
sentinel nulls → per-station bounded gap-fill → calendar validity →
station-metadata broadcast join → sort.

Spark shape notes (SURVEY §3 EP1): the per-file loop is a glob scan;
the per-station fill loop is one ``partitionBy(ID)`` window; the
hand-rolled 2016-2024 leap lists (ETL.py:244-293) are replaced by real
calendar semantics (invalid dates parse to null)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.spatial import filter_in_polygon

WEATHER_ELEMENTS = [
    "TMAX", "TMIN", "TOBS", "PRCP", "SNOW", "SNWD", "WESD", "WSFG",
    "DAPR", "MDPR", "SN52", "SN53", "SX52", "SX53",
    "WT01", "WT03", "WT04", "WT05", "WT06", "WT11",
]

SENTINEL = -9999.0


def miso_stations(
    stations: DataFrame, ring: list[tuple[float, float]]
) -> DataFrame:
    """F6 + F8/J6: US stations inside the footprint polygon.  The cheap
    string predicate runs first (Catalyst can't reorder across the
    Python UDF)."""
    return filter_in_polygon(
        stations.filter(F.col("ID").contains("US")), "long", "lat", ring
    )


def melt_days(wide: DataFrame) -> DataFrame:
    """W4: 31 VALUE columns → long (ID, YEAR, MONTH, ELEMENT, DAY, value).
    ``unpivot`` is row-local; FLAG columns are pruned beforehand (F2) so
    they never leave the scan."""
    keep = ["ID", "YEAR", "MONTH", "ELEMENT"]
    day_cols = [f"VALUE{d}" for d in range(1, 32)]
    melted = wide.select(*keep, *day_cols).unpivot(
        keep, day_cols, "day_col", "value"
    )
    return melted.withColumn(
        "DAY", F.regexp_replace("day_col", r"\D", "").cast("int")
    ).drop("day_col")


def pivot_elements(
    long_df: DataFrame, elements: list[str] = WEATHER_ELEMENTS
) -> DataFrame:
    """A3: deterministic pivot — explicit value list, no distinct job,
    stable column order (SURVEY §4.2.5).  MIN replaces the reference's
    order-dependent 'first'."""
    return (
        long_df.groupBy("ID", "YEAR", "MONTH", "DAY")
        .pivot("ELEMENT", elements)
        .agg(F.min("value"))
    )


def clean_sentinels(df: DataFrame, cols: list[str]) -> DataFrame:
    """W15 + F11: −9999 → null, then drop all-null rows."""
    for c in cols:
        df = df.withColumn(c, F.when(F.col(c) == SENTINEL, None).otherwise(F.col(c)))
    return df.na.drop(how="all", subset=cols)


def gap_fill(df: DataFrame, cols: list[str], limit: int = 7) -> DataFrame:
    """W1: per-station ffill(limit).bfill(limit) — bounded window fills
    partitioned by ID, ordered by date; the reference's Python loop over
    stations (ETL.py:228-242) becomes executor-parallel partitions."""
    w = Window.partitionBy("ID").orderBy("YEAR", "MONTH", "DAY")
    for c in cols:
        ff = F.last(c, ignorenulls=True).over(w.rowsBetween(-limit, 0))
        bf = F.first(c, ignorenulls=True).over(w.rowsBetween(0, limit))
        df = df.withColumn(c, F.coalesce(F.col(c), ff, bf))
    return df


def valid_dates(df: DataFrame) -> DataFrame:
    """W13/W14: assemble DATE; invalid calendar combinations (Feb 30,
    Apr 31, non-leap Feb 29) parse to null and are dropped — replacing
    the reference's hard-coded leap-year lists."""
    assembled = F.to_date(
        F.expr(
            "try_to_timestamp(printf('%04d-%02d-%02d', YEAR, MONTH, DAY), 'yyyy-MM-dd')"
        )
    )
    return df.withColumn("DATE", assembled).filter(F.col("DATE").isNotNull())


def weather_pipeline(
    stations: DataFrame,
    daily_wide: DataFrame,
    ring: list[tuple[float, float]],
    year_range: tuple[int, int] = (2016, 2024),
    elements: list[str] = WEATHER_ELEMENTS,
) -> DataFrame:
    """The full EP1b chain (ETL.py:317-330 re-expressed)."""
    in_footprint = miso_stations(stations, ring)
    # J5: semi-join the daily data on the footprint station set (the
    # station list is small → broadcast semi-join, no shuffle of facts).
    scoped = daily_wide.join(
        F.broadcast(in_footprint.select("ID")), "ID", "left_semi"
    ).filter(F.col("YEAR").between(*year_range))
    long_df = melt_days(scoped)
    wide = pivot_elements(long_df, elements)
    cleaned = clean_sentinels(wide, elements)
    filled = gap_fill(cleaned, elements)
    dated = valid_dates(filled)
    # J1: broadcast the station dimension back on (adds lat/long/elev/city).
    enriched = dated.join(
        F.broadcast(in_footprint.select("ID", "lat", "long", "elev", "city")), "ID"
    )
    return enriched.orderBy("ID", "DATE")
