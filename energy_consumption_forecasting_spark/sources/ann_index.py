"""Persisted ANN index — build once, query many.

The missing lifecycle piece around operators/ann.py: a production
similarity service does not re-train the quantizers per query.  The
index is two artifacts:

* ``codes/`` — parquet of (vec_id, code[, cell]): the compressed
  corpus, written distributed, re-read with column pruning and (for
  IVF) cell-partition pruning;
* ``meta.json`` — the KB-sized driver constants (PQ codebooks, OPQ
  rotation, IVF centroids, shape params) that broadcast at query time.

Layout intentionally mirrors the FAISS split (big codes / small
metadata), expressed as parquet + JSON so any Spark session — or any
other engine — can read it back.  Queries run through
``operators/ann.py::pq_topk_table``: the query side stays a DataFrame
end-to-end.

Scale notes: codes are written ``partitionBy("cell")`` when an IVF
quantizer is present, so a probe-limited search prunes whole partitions
at the scan (PartitionFilters, not a post-filter).  At 100 TB of
vectors the codes table is ~N × (8 bytes + id) — the only corpus-sized
artifact; everything else rides the driver/broadcast.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_ann_index(
    emb: DataFrame,
    index_dir: str,
    m: int = 8,
    k: int = 16,
    n_cells: int | None = 16,
    opq: bool = False,
    kind: str = "pq",
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> None:
    """Train quantizers, encode the corpus, persist the index.

    ``kind="pq"`` (default) stores m-byte PQ codes; ``kind="sq8"``
    stores per-dimension uint8 scalar-quantized codes — the
    deterministic tier (exact min/max quantizer, Catalyst-only
    encode), same codes/meta.json layout."""
    from ..operators.ann import (
        build_ivf,
        pq_encode,
        rotate_vectors,
        sq8_encode,
        sq8_train,
        train_opq_rotation,
        train_pq_codebooks,
    )

    if kind == "sq8":
        if opq:
            raise ValueError("OPQ rotation applies to the PQ tier only")
        mins, maxs = sq8_train(emb, vec_col=vec_col)
        meta = {"kind": "sq8", "mins": mins, "maxs": maxs, "n_cells": n_cells}
        encoded = sq8_encode(emb, mins, maxs, vec_col=vec_col, id_col=id_col)
    elif kind == "pq":
        meta = {"kind": "pq", "m": m, "k": k, "opq": opq, "n_cells": n_cells}
        enc_input = emb
        R = None
        if opq:
            R, books = train_opq_rotation(emb, m=m, k=k)
            enc_input = rotate_vectors(emb, R)
            meta["rotation"] = R.tolist()
        else:
            books = train_pq_codebooks(emb, m=m, k=k)
        meta["codebooks"] = books.tolist()
        encoded = pq_encode(enc_input, books, id_col=id_col, vec_col=vec_col)
    else:
        raise ValueError(f"unknown index kind {kind!r}")
    writer_cols = [id_col, "code"]
    if n_cells:
        assigned, model = build_ivf(emb, vec_col=vec_col, n_cells=n_cells)
        meta["centroids"] = [
            [float(x) for x in c] for c in model.clusterCenters()
        ]
        encoded = encoded.join(assigned.select(id_col, "cell"), id_col)
        writer_cols.append("cell")

    w = encoded.select(*writer_cols).write.mode("overwrite")
    if n_cells:
        w = w.partitionBy("cell")
    w.parquet(os.path.join(index_dir, "codes"))
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_ann_index(
    spark: SparkSession, index_dir: str
) -> tuple[DataFrame, dict]:
    """(codes df, meta with ndarrays restored)."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("codebooks") is not None:
        meta["codebooks"] = np.asarray(meta["codebooks"], dtype=np.float64)
    if meta.get("rotation") is not None:
        meta["rotation"] = np.asarray(meta["rotation"], dtype=np.float64)
    if meta.get("centroids") is not None:
        meta["centroids"] = np.asarray(meta["centroids"], dtype=np.float64)
    codes = spark.read.parquet(os.path.join(index_dir, "codes"))
    return codes, meta


def search_ann_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k_neighbors: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Top-k against a persisted index; queries stay a DataFrame.

    PQ indexes score via ADC table lookups; SQ8 indexes decode the
    probed cells and rescore asymmetrically (raw query vs
    reconstructed corpus)."""
    from ..operators.ann import pq_topk_table, sq8_ivf_topk, sq8_topk

    codes, meta = load_ann_index(spark, index_dir)
    if meta.get("kind") == "sq8":
        if meta.get("centroids") is not None:
            return sq8_ivf_topk(
                codes,
                queries,
                meta["centroids"],
                meta["mins"],
                meta["maxs"],
                k=k_neighbors,
                nprobe=nprobe,
                id_col=id_col,
                vec_col=vec_col,
            ).withColumnRenamed("neighbor_id", id_col)
        return sq8_topk(
            codes,
            queries,
            meta["mins"],
            meta["maxs"],
            k=k_neighbors,
            id_col=id_col,
            vec_col=vec_col,
        ).withColumnRenamed("neighbor_id", id_col)
    return pq_topk_table(
        codes,
        queries,
        meta["codebooks"],
        k_neighbors=k_neighbors,
        id_col=id_col,
        vec_col=vec_col,
        rotation=meta.get("rotation"),
        centroids=meta.get("centroids"),
        nprobe=nprobe,
    )
