"""Sources & sinks (SURVEY §2.1).

The reference's ingest surface re-expressed Spark-first: schema-on-read
CSV (S1/S2), fixed-width text projections (S3/S4), GeoJSON polygon
broadcast (S5), path-glob directory scans (S6), Parquet/CSV sinks (S7),
and driver-side JSON parameter stores (S8/S9).
"""
