"""energy_consumption_forecasting_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference project ``lmg1404/Energy-Consumption-Forecasting``
(energy-demand ETL + time-series forecasting), plus the LLM-training-data
pipeline operators (dedup / similarity search / text analysis / multimodal
columns) a 100 TB-scale deployment needs.

Design principles (see ARCHITECTURE.md):

* **DataFrame-first.** Every operator is a lazy DataFrame transform so
  Catalyst gets the whole plan: predicate pushdown, column pruning, join
  reordering, AQE are free.
* **Shuffle-aware.** Small dimensions are broadcast; per-key windows
  partition by the series key; aggregations are expressed so map-side
  partial aggregation applies.
* **JVM-side by default.** ``pyspark.sql.functions`` everywhere; Python
  only via Arrow-batched pandas UDFs / ``applyInPandas`` for per-series
  model fitting (ARIMA, DTW, wavelets) where no built-in exists.
* **No driver-side data loops.** Scalars (thresholds, column stats) may
  reduce to the driver; row data never does.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .tables import TABLE_NAMES, load_table, register_views  # noqa: F401
