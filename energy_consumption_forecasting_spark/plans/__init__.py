"""End-to-end pipeline plans (SURVEY §3: EP1 ETL, EP2 dataset assembly).

Each reference pipeline stage becomes a lazy DataFrame transform;
Catalyst plans the whole chain, and the only materialization points are
explicit ``write_stage`` calls between pipelines (Parquet, replacing the
reference's CSV handoffs)."""
