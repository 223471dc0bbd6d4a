"""Python UDTF surface (Spark 4): table-valued expansion with lateral
join — completes the §2.8 UDF inventory (scalar udf / pandas_udf /
applyInPandas / mapInPandas / applyInPandasWithState / udtf)."""

from __future__ import annotations

import pytest


def test_udtf_token_windows(spark):
    from pyspark.sql.functions import col, lit, udtf

    @udtf(returnType="win_idx int, chunk string")
    class TokenWindows:
        """Overlapping token windows — the chunking shape as a UDTF."""

        def eval(self, text: str, size: int, stride: int):
            toks = [t for t in (text or "").split() if t]
            i, idx = 0, 0
            while i < len(toks):
                yield idx, " ".join(toks[i : i + size])
                if i + size >= len(toks):
                    break
                i += stride
                idx += 1

    spark.udtf.register("token_windows", TokenWindows)
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, None)], "id long, text string"
    )
    df.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        """
        SELECT id, t.win_idx, t.chunk
        FROM udtf_docs, LATERAL token_windows(text, 3, 2) t
        ORDER BY id, t.win_idx
        """
    ).collect()
    got = [(r.id, r.win_idx, r.chunk) for r in out]
    assert got == [
        (1, 0, "a b c"),
        (1, 1, "c d e"),
        (2, 0, "x y"),
        # id 3: None text -> zero rows (lateral join drops it)
    ]


def test_udtf_terminate_emits_summary(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="kind string, value int")
    class CountAndSum:
        def __init__(self):
            self.n = 0
            self.s = 0

        def eval(self, row):
            # TABLE(...) arguments arrive as a Row per input record
            self.n += 1
            self.s += row["id"]

        def terminate(self):
            yield "count", self.n
            yield "sum", self.s

    spark.udtf.register("count_and_sum", CountAndSum)
    # one UDTF instance per input partition — pin to a single partition
    # so terminate() emits ONE global summary (range(start, end, step,
    # numPartitions)); empty partitions also trip a Spark NPE edge here.
    rows = spark.sql(
        "SELECT * FROM count_and_sum(TABLE(SELECT id FROM range(0, 5, 1, 1)))"
    ).collect()
    got = {r.kind: r.value for r in rows}
    assert got == {"count": 5, "sum": 10}
