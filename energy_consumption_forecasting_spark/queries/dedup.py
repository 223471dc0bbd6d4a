"""Deduplication operators for training-data pipelines (SURVEY §7 phase 5).

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup — each fully distributed:

* Shingling is a row-local array transform (no shuffle, no window).
* Candidate generation is an equi join on shingle / LSH bucket — the
  only shuffles, and they key on content hashes, which distribute
  uniformly.  Stop-shingles (appearing in > MAX_DOC_FREQ docs) are
  dropped before the self-join; without that cap the hottest shingle
  produces an O(df²) pair explosion at 100 TB.
* Hashes are md5 hex strings (identical on every engine); "different
  hash functions" are seeded by prefixing the hash index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from ..functions.vectors import as_double, cosine
from ._util import tbl

MAX_DOC_FREQ = 100  # stop-shingle cap for candidate generation
N_HASHES = 8
BAND_ROWS = 2  # → 4 bands of 2 rows

# ---------------------------------------------------------------------------
# Shared shingling (3-word shingles, distinct per doc)
# ---------------------------------------------------------------------------

_SHINGLES_SQL = """
    toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS a
      FROM documents
    ),
    shingles AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(a) - 1),
                    i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS sh
      FROM toks WHERE len(a) >= 3
    )
"""


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("a"),
    )


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 3-word shingles per doc — row-local, shuffle-free."""
    toks = _tokens(spark, sf_dir).filter(F.size("a") >= 3)
    idx = F.sequence(F.lit(1), F.size("a") - 2)
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at("a", i),
            F.element_at("a", i + 1),
            F.element_at("a", i + 2),
        ),
    )
    return toks.select("doc_id", F.explode(sh).alias("sh")).distinct()


# --- exact dedup: hash-groupBy ----------------------------------------------
@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keyed on md5(text), not the raw text: the shuffle key
    is 32 bytes regardless of document size — at 100 TB that is the
    difference between shuffling hashes and shuffling the corpus."""
    return (
        tbl(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


# --- n-gram Jaccard near-dup --------------------------------------------------
@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    df AS (
      SELECT sh FROM shingles GROUP BY sh HAVING COUNT(*) <= {MAX_DOC_FREQ}
    ),
    filtered AS (SELECT s.* FROM shingles s JOIN df USING (sh)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM filtered a JOIN filtered b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           common / (sa.n + sb.n - common) AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE common / (sa.n + sb.n - common) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard near-dup pairs (≥ 0.5): shingle self-join candidate
    generation with a stop-shingle document-frequency cap, then exact
    Jaccard from intersection/size counts.  Set semantics throughout —
    no per-pair re-scan of the documents."""
    sh = _shingles(spark, sf_dir)
    df_ok = sh.groupBy("sh").count().filter(F.col("count") <= MAX_DOC_FREQ).select("sh")
    filtered = sh.join(df_ok, "sh")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = filtered.alias("a")
    b = filtered.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("common") / (F.col("sa.n") + F.col("sb.n") - F.col("common"))
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


# --- MinHash + LSH banding -----------------------------------------------------
_MINHASH_SQL = f"""
    hashes AS (
      SELECT doc_id, h, MIN(md5(CAST(h AS VARCHAR) || '|' || sh)) AS mh
      FROM shingles, range({N_HASHES}) t(h)
      GROUP BY doc_id, h
    ),
    bands AS (
      SELECT doc_id, h // {BAND_ROWS} AS band,
             md5(string_agg(mh, ',' ORDER BY h)) AS bucket
      FROM hashes
      GROUP BY doc_id, h // {BAND_ROWS}
    )
"""


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    {_MINHASH_SQL},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           (SELECT COUNT(*) FROM hashes ha JOIN hashes hb
              ON ha.h = hb.h AND ha.mh = hb.mh
            WHERE ha.doc_id = doc_a AND hb.doc_id = doc_b) / {N_HASHES} AS est_jaccard
    FROM cand
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash({N} seeded md5 permutations) → {B}-row LSH bands → bucket
    equi-join candidates → signature-agreement Jaccard estimate.

    The full pairwise matrix never materializes: only docs sharing an
    LSH bucket meet, so cost scales with collisions, not corpus².
    """
    sh = _shingles(spark, sf_dir)
    hashed = (
        sh.select(
            "doc_id", F.explode(F.sequence(F.lit(0), F.lit(N_HASHES - 1))).alias("h"), "sh"
        )
        .groupBy("doc_id", "h")
        .agg(F.min(F.md5(F.concat(F.col("h").cast("string"), F.lit("|"), F.col("sh")))).alias("mh"))
    )
    bands = (
        hashed.withColumn("band", (F.col("h") / BAND_ROWS).cast("long"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("h", "mh"))),
                        lambda s: s["mh"],
                    ),
                    ",",
                )
            ).alias("bucket")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ha = hashed.alias("ha")
    hb = hashed.alias("hb")
    agree = (
        ha.join(
            hb,
            (F.col("ha.h") == F.col("hb.h"))
            & (F.col("ha.mh") == F.col("hb.mh"))
            & (F.col("ha.doc_id") < F.col("hb.doc_id")),
        )
        .groupBy(
            F.col("ha.doc_id").alias("doc_a"), F.col("hb.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_agree"))
    )
    return (
        cand.join(agree, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            (F.coalesce(F.col("n_agree"), F.lit(0)) / N_HASHES).alias("est_jaccard"),
        )
    )


# --- SimHash signatures -----------------------------------------------------------
@query(
    "dedup_simhash",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS a
      FROM documents
    ),
    words AS (SELECT doc_id, unnest(a) AS w FROM toks),
    bits AS (
      SELECT doc_id, j,
             SUM(CASE WHEN strpos('0123456789abcdef', substr(md5(w), j + 1, 1)) - 1 >= 8
                      THEN 1 ELSE -1 END) AS weight
      FROM words, range(16) t(j)
      GROUP BY doc_id, j
    )
    SELECT doc_id,
           string_agg(CASE WHEN weight >= 0 THEN '1' ELSE '0' END, '' ORDER BY j)
             AS simhash
    FROM bits
    GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over the token multiset: bit j comes from the sign
    of the summed ±1 contributions of each token's md5 hex digit j.
    Near-dups differ in few bits; grouping by signature (or banding
    substrings) finds them without pairwise comparison."""
    words = _tokens(spark, sf_dir).select("doc_id", F.explode("a").alias("w"))
    bits = (
        words.select(
            "doc_id", "w", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j")
        )
        .groupBy("doc_id", "j")
        .agg(
            F.sum(
                F.when(
                    F.instr(
                        F.lit("0123456789abcdef"),
                        F.substring(F.md5("w"), F.col("j") + 1, 1),
                    )
                    - 1
                    >= 8,
                    1,
                ).otherwise(-1)
            ).alias("weight")
        )
    )
    return (
        bits.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "j",
                                F.when(F.col("weight") >= 0, "1").otherwise("0").alias(
                                    "bit"
                                ),
                            )
                        )
                    ),
                    lambda s: s["bit"],
                ),
                "",
            ).alias("simhash")
        )
    )


# --- embedding-cosine near-dup ------------------------------------------------------
@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
             AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
          >= 0.3
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.3) via sequential-fold dot
    products (functions/vectors.py) — bit-identical across engines, no
    Python UDF.  This is the verification baseline; the LSH-bucketed
    scale path is queries/similarity.py::sim_lsh_bucketed."""
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.3)
    )
