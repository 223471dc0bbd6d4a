"""Streaming MinHash near-duplicate detection — the stream twin of
``queries/dedup.py::dedup_minhash_lsh`` (no reference analog; the
LLM-ingest shape: documents arrive continuously, near-duplicates must
be flagged online against everything already admitted, not in a
nightly batch).

Pipeline:

* **Row-local sketching on the stream** — the SAME column expressions
  as the batch operator (``tokens_frame`` → ``shingle_arrays_frame`` →
  ``minhash_sigs_frame`` → ``_band_rows``), so stream signatures are
  bit-identical to batch; nothing is recomputed differently online.
* **First-writer-wins per LSH bucket** — ``applyInPandasWithState``
  keyed by (band, bucket): state is ONE long (the first admitted
  doc_id), so the store size is O(buckets) regardless of stream
  length.  Each batch emits (doc_id, dup_of=first) for every later
  arrival in an occupied bucket.
* A doc colliding in ANY band is a near-dup candidate; consumers
  reduce to one verdict per doc (min dup_of), which the drain harness
  does — the batch equivalence contract is pinned in
  tests/test_minhash_stream.py.

Same scale rules as batch: the shuffle key is the 32-hex bucket id,
never document text, and a poisoned mega-bucket costs one stored long
plus per-arrival emissions, not a pairwise blow-up.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .source import docs_stream

STATE_SCHEMA = "first LONG"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("dup_of", T.LongType()),
    ]
)


def _first_writer_wins(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    band = int(key[0])
    ids: list[int] = []
    for pdf in pdfs:
        ids.extend(int(x) for x in pdf["doc_id"])
    if not ids:
        return
    ids.sort()
    # first-writer-wins by ARRIVAL: an earlier micro-batch's admit is
    # never displaced by a smaller id arriving later (online semantics;
    # a single-batch drain reduces to min doc_id = the batch contract)
    first = int(state.get[0]) if state.exists else ids[0]
    state.update((first,))
    dups = [i for i in ids if i != first]
    if dups:
        yield pd.DataFrame(
            {"doc_id": dups, "band": band, "dup_of": first}
        )


def minhash_collisions_stream(
    spark: SparkSession,
    docs_dir: str,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming (doc_id, band, dup_of) collision events."""
    from ..queries.dedup import (
        _band_rows,
        minhash_sigs_frame,
        shingle_arrays_frame,
        tokens_frame,
    )

    docs = docs_stream(
        spark, docs_dir, glob, maxFilesPerTrigger=max_files_per_trigger
    ).select("doc_id", "text")
    bands = _band_rows(minhash_sigs_frame(shingle_arrays_frame(tokens_frame(docs))))
    return bands.groupBy("band", "bucket").applyInPandasWithState(
        _first_writer_wins,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_minhash_dedup_available_now(
    spark: SparkSession,
    docs_dir: str,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain a static directory; one verdict per flagged doc:
    (doc_id, dup_of = smallest first-writer across its colliding bands)."""
    from . import drain_available_now

    return drain_available_now(
        minhash_collisions_stream(spark, docs_dir, glob, max_files_per_trigger),
        "mhstream",
        "update",
        finish=lambda table, _ckpt: table.groupBy("doc_id").agg(
            F.min("dup_of").alias("dup_of")
        ),
    )
