"""Spatial predicate — SURVEY F8/J6: point-in-polygon semi-join.

Reference: ``in_miso`` Shapely contains() per station row
(ETL.py:143-162), MISO GeoJSON polygon (ETL.py:153).

Spark-first: the polygon is tiny and broadcast; containment is an
even-odd ray-casting test.  Preferred order: shapely prepared geometry
inside an Arrow pandas UDF when shapely is installed; otherwise the
same ray-casting algorithm vectorized in numpy — still a pandas UDF, so
the hot loop is C either way.  Catalyst cannot reorder predicates
across a Python UDF (SURVEY §4.2.1), so ``filter_in_polygon`` applies
the cheap string/range predicates FIRST by taking an already-filtered
input."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:
    from shapely.geometry import Point, shape  # type: ignore
    from shapely.prepared import prep  # type: ignore

    _HAS_SHAPELY = True
except ImportError:
    _HAS_SHAPELY = False


def load_polygon(path: str) -> list[tuple[float, float]]:
    """Driver-side GeoJSON load (S5) → exterior ring [(lon, lat), ...].

    Accepts Polygon or MultiPolygon (first polygon's exterior)."""
    with open(path) as f:
        gj = json.load(f)
    geom = gj["features"][0]["geometry"] if "features" in gj else gj
    if geom["type"] == "Polygon":
        ring = geom["coordinates"][0]
    elif geom["type"] == "MultiPolygon":
        ring = geom["coordinates"][0][0]
    else:
        raise ValueError(f"unsupported geometry {geom['type']}")
    return [(float(x), float(y)) for x, y in ring]


def _ray_cast(lon: np.ndarray, lat: np.ndarray, ring: list[tuple[float, float]]) -> np.ndarray:
    """Vectorized even-odd point-in-polygon (standard published test)."""
    inside = np.zeros(len(lon), dtype=bool)
    n = len(ring)
    x, y = lon, lat
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        crosses = (y1 > y) != (y2 > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (y - y1) / (y2 - y1) + x1
        inside ^= crosses & (x < xint)
    return inside


def in_polygon_udf(spark: SparkSession, ring: list[tuple[float, float]]):
    """Arrow-batched (lon, lat) → bool containment UDF; the ring rides
    the closure (a broadcast-equivalent for a small literal)."""
    if _HAS_SHAPELY:
        poly = prep(shape({"type": "Polygon", "coordinates": [list(ring)]}))

        @F.pandas_udf(T.BooleanType())
        def contains(lon: pd.Series, lat: pd.Series) -> pd.Series:
            return pd.Series([poly.contains(Point(x, y)) for x, y in zip(lon, lat)])

    else:

        @F.pandas_udf(T.BooleanType())
        def contains(lon: pd.Series, lat: pd.Series) -> pd.Series:
            return pd.Series(
                _ray_cast(lon.to_numpy(float), lat.to_numpy(float), ring)
            )

    return contains


def filter_in_polygon(
    df: DataFrame, lon_col: str, lat_col: str, ring: list[tuple[float, float]]
) -> DataFrame:
    """Spatial semi-join of rows against one polygon (J6).  A bounding-
    box pre-filter runs first as a plain Catalyst predicate (pushed to
    the scan); the exact UDF test only sees candidates."""
    lons = [p[0] for p in ring]
    lats = [p[1] for p in ring]
    boxed = df.filter(
        F.col(lon_col).between(min(lons), max(lons))
        & F.col(lat_col).between(min(lats), max(lats))
    )
    contains = in_polygon_udf(df.sparkSession, ring)
    return boxed.filter(contains(F.col(lon_col), F.col(lat_col)))
