"""Incremental ANN ingest: streamed codes == one-shot batch encode
under the same frozen quantizers, and search sees appended vectors."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_consumption_forecasting_spark.functions.vectors import as_double
from energy_consumption_forecasting_spark.sources.ann_index import (
    build_ann_index,
    load_ann_index,
    search_ann_index,
)
from energy_consumption_forecasting_spark.streaming.ann_ingest import (
    ingest_vectors_available_now,
)
from energy_consumption_forecasting_spark.tables import load_table

SF_SMALL = "/root/testdata/sf0.001"


def _emb(spark):
    return load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )


def test_streamed_ingest_matches_batch_encode(spark, tmp_path):
    e = _emb(spark)
    base = e.filter(F.col("vec_id") < 400)
    newer = e.filter(F.col("vec_id") >= 400)

    # full index built in one shot = ground truth codes
    full_idx = str(tmp_path / "full")
    build_ann_index(e, full_idx, n_cells=8)

    # base index + streamed remainder under the SAME frozen quantizers
    # (quantizer training samples the first 2048 rows sorted by limit —
    # identical between the two builds only if the corpus prefix is the
    # same, so train on the full set and re-encode the base)
    incr_idx = str(tmp_path / "incr")
    build_ann_index(e, incr_idx, n_cells=8)
    # drop the codes of the "future" vectors to simulate a base index
    import shutil

    codes_dir = f"{incr_idx}/codes"
    base_codes = (
        spark.read.parquet(codes_dir).filter(F.col("vec_id") < 400)
    ).collect()
    shutil.rmtree(codes_dir)
    spark.createDataFrame(
        base_codes, "vec_id long, code array<int>, cell int"
    ).write.partitionBy("cell").parquet(codes_dir)

    # stage the newer vectors as parquet files and stream them in
    vec_dir = str(tmp_path / "arrivals")
    newer.select(
        "vec_id", F.col("v").cast("array<float>").alias("embedding")
    ).coalesce(2).write.parquet(vec_dir)
    ingest_vectors_available_now(spark, incr_idx, vec_dir)

    want = {
        (r["vec_id"]): (list(r["code"]), r["cell"])
        for r in spark.read.parquet(f"{full_idx}/codes").collect()
    }
    got = {
        (r["vec_id"]): (list(r["code"]), r["cell"])
        for r in spark.read.parquet(codes_dir).collect()
    }
    assert got == want and len(got) == 500


def test_search_sees_ingested_vectors(spark, tmp_path):
    e = _emb(spark)
    idx = str(tmp_path / "searchidx")
    build_ann_index(e.filter(F.col("vec_id") < 450), idx, n_cells=8)
    vec_dir = str(tmp_path / "late")
    e.filter(F.col("vec_id") >= 450).select(
        "vec_id", F.col("v").cast("array<float>").alias("embedding")
    ).coalesce(1).write.parquet(vec_dir)
    ingest_vectors_available_now(spark, idx, vec_dir)

    codes, _meta = load_ann_index(spark, idx)
    assert codes.count() == 500
    # a late vector queried against the index retrieves itself
    q = e.filter(F.col("vec_id") == 499)
    got = search_ann_index(spark, idx, q, k_neighbors=3).collect()
    assert any(r["vec_id"] == 499 for r in got)


def test_sq8_streaming_ingest_matches_batch_codes(spark, tmp_path):
    """Streaming SQ8 ingest under frozen min/max ranges produces the
    identical codes the batch build writes."""
    from pyspark.sql import functions as F

    from energy_consumption_forecasting_spark.functions.vectors import as_double
    from energy_consumption_forecasting_spark.sources.ann_index import (
        build_ann_index,
        load_ann_index,
    )
    from energy_consumption_forecasting_spark.streaming.ann_ingest import (
        encode_with_meta,
    )

    e = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", as_double("embedding").alias("v"))
    )
    idx = str(tmp_path / "sq8_idx")
    build_ann_index(e, idx, kind="sq8", n_cells=8)
    codes, meta = load_ann_index(spark, idx)
    batch_codes = {r.vec_id: (list(r.code), r.cell) for r in codes.collect()}

    stream_codes = {
        r.vec_id: (list(r.code), r.cell)
        for r in encode_with_meta(e, meta).collect()
    }
    assert stream_codes == batch_codes


def test_replayed_ingest_does_not_duplicate_codes(spark, tmp_path):
    """Re-draining the same vectors with fresh checkpoints (same batch
    ids — the engine-replay shape) must leave the codes table
    unchanged: the batch txn log + deterministic file names make the
    append exactly-once."""
    from energy_consumption_forecasting_spark.functions.vectors import as_double
    from energy_consumption_forecasting_spark.sources.ann_index import (
        build_ann_index,
        load_ann_index,
    )
    from energy_consumption_forecasting_spark.streaming.ann_ingest import (
        ingest_vectors_available_now,
    )

    e = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", as_double("embedding").alias("v"))
    )
    idx = str(tmp_path / "idx")
    build_ann_index(e, idx, kind="sq8", n_cells=None)
    base = spark.read.parquet(f"{idx}/codes").count()

    ingest_vectors_available_now(spark, idx, "/root/testdata/sf0.001",
                                 glob="embeddings.parquet")
    codes1, _ = load_ann_index(spark, idx)
    n1 = codes1.count()
    assert n1 == 2 * base  # one clean append on top of the build
    ids1 = sorted(r.vec_id for r in codes1.select("vec_id").collect())

    # replay: same source, fresh checkpoint -> same batch ids
    ingest_vectors_available_now(spark, idx, "/root/testdata/sf0.001",
                                 glob="embeddings.parquet")
    codes2, _ = load_ann_index(spark, idx)
    assert codes2.count() == n1
    assert sorted(r.vec_id for r in codes2.select("vec_id").collect()) == ids1
