"""LLM training-data pipeline operators: chunking, contamination
screening, deterministic stratified sampling, PII scrubbing, and
mixture-weight planning over the ``documents`` corpus.

These are the corpus-preparation steps between raw ingest and
tokenization.  Shared discipline with queries/dedup.py: tokenize with
the repo-wide whitespace rule, never shuffle raw text (hashes only),
and keep every decision a pure function of the row so both engines —
and any two cluster runs — agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import query
from ._util import fanout, shared_plan, tbl


def _tokens(c):
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


_TOKENS_SQL = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"

CHUNK_SIZE = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


# --- document chunking (overlapping token windows) -----------------------------
@query(
    "pipeline_chunk_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS a FROM documents
    ), sized AS (
      SELECT doc_id, a,
             GREATEST(1, CAST(CEIL((len(a) - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0)
                              AS INT) + 1) AS n_chunks
      FROM toks
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           CAST(i * {CHUNK_STRIDE} + 1 AS INT) AS chunk_start,
           CAST(len(a[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_SIZE}])
                AS INT) AS chunk_tokens,
           md5(array_to_string(
               a[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_SIZE}],
               ' ')) AS chunk_hash
    FROM sized, LATERAL unnest(generate_series(0, n_chunks - 1)) AS t(i)
    """,
)
def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into overlapping {CHUNK_SIZE}-token windows
    with stride {CHUNK_STRIDE} — the context-window prep step before
    tokenizer sharding.  Entirely row-local (transform + posexplode, no
    shuffle at all); emits the chunk *hash*, never chunk text, so
    nothing wide survives past the scan."""
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("a")
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size("a") - CHUNK_SIZE) / F.lit(float(CHUNK_STRIDE))).cast("int")
        + 1,
    )
    sized = docs.select("doc_id", "a", n_chunks.alias("n_chunks"))
    exploded = sized.select(
        "doc_id",
        "a",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("i"),
    )
    chunk = F.slice(F.col("a"), F.col("i") * CHUNK_STRIDE + 1, CHUNK_SIZE)
    return exploded.select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_idx"),
        (F.col("i") * CHUNK_STRIDE + 1).cast("int").alias("chunk_start"),
        F.size(chunk).cast("int").alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


# --- train/eval contamination screen ------------------------------------------
@query(
    "pipeline_contamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS a FROM documents
    ), grams AS (
      SELECT doc_id, md5(array_to_string(a[i : i + 4], ' ')) AS g
      FROM toks, LATERAL unnest(generate_series(1, len(a) - 4)) AS t(i)
      WHERE len(a) >= 5
    ),
    eval_g AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
    train_g AS (SELECT doc_id, g FROM grams WHERE doc_id % 50 <> 0)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct_grams
    FROM train_g JOIN eval_g USING (g)
    GROUP BY doc_id
    """,
)
def pipeline_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: flag training documents sharing
    any 5-gram with the held-out eval slice (doc_id % 50 == 0 — the
    stand-in for a benchmark set).  Plan: grams are md5 hashes (16
    bytes cross the shuffle, not text); the eval gram set is distinct
    → tiny → broadcast, so the screen is one broadcast semi-probe per
    training gram — no all-pairs doc comparison anywhere."""
    toks = (
        tbl(spark, sf_dir, "documents")
        .select("doc_id", _tokens(F.col("text")).alias("a"))
        .filter(F.size("a") >= 5)
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("a") - 4),
                lambda i: F.md5(F.array_join(F.slice(F.col("a"), i, 5), " ")),
            )
        ).alias("g"),
    )
    eval_g = grams.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    train_g = grams.filter(F.col("doc_id") % 50 != 0)
    return (
        train_g.join(F.broadcast(eval_g), "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.countDistinct("g").alias("n_distinct_grams"),
        )
    )


# --- deterministic stratified sampling ----------------------------------------
_STRATA_RATES = {"en": "4000", "de": "8000", "es": "8000", "fr": "8000", "zh": "8000"}


@query(
    "pipeline_stratified_sample",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substring(md5(text), 1, 4) <
          CASE lang WHEN 'en' THEN '4000' ELSE '8000' END
    """,
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a document iff the
    first 16 bits of its content md5 fall under the stratum's hex
    threshold (en 25%, other langs 50% — rebalancing the
    en-dominant corpus).  Content-hash gating instead of rand(): the
    sample is reproducible across engines, runs, and partitionings,
    and re-sampling after new ingest keeps prior decisions stable —
    the property a 100-TB incremental pipeline actually needs."""
    docs = tbl(spark, sf_dir, "documents")
    thr = F.when(F.col("lang") == "en", F.lit(_STRATA_RATES["en"])).otherwise(
        F.lit("8000")
    )
    return docs.filter(F.substring(F.md5("text"), 1, 4) < thr).select(
        "doc_id", "lang", "source"
    )


# --- PII scrub ----------------------------------------------------------------
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"555-[0-9]{3,4}"


@query(
    "pipeline_pii_scrub",
    oracle=f"""
    WITH aug AS (
      -- the corpus is synthetic word salad with no PII, so inject a
      -- deterministic email+phone per doc, then scrub it back out
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-' || CAST(doc_id % 1000 + 100 AS VARCHAR)
               AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS scrub_hash
    FROM aug
    """,
)
def pipeline_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction (emails, phone-shaped strings) with per-doc
    detection counts and a hash of the scrubbed text.  The corpus is
    synthetic, so each doc first gets one deterministic email+phone
    appended — the scrub then provably removes exactly what was
    injected (plus anything that was already there).  Patterns stay in
    the RE2 ∩ Java-regex common subset so both engines agree.  Pure
    row-local projection: zero shuffle."""
    docs = tbl(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            (F.col("doc_id") % 1000 + 100).cast("string"),
        ).alias("t"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace("t", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.md5(scrubbed).alias("scrub_hash"),
    )


# --- mixture-weight planning --------------------------------------------------
@query(
    "pipeline_mixture_weights",
    oracle="""
    WITH per_lang AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_langs
      FROM per_lang
    )
    SELECT lang, n_docs,
           CAST(n_docs AS DOUBLE) / total AS nat_frac,
           (CAST(1 AS DOUBLE) / n_langs)
             / (CAST(n_docs AS DOUBLE) / total) AS multiplier
    FROM per_lang, tot
    """,
)
def pipeline_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture planning: per-language natural fraction and the
    resampling multiplier that would flatten the mixture to uniform —
    the weights a data loader feeds its per-source samplers.  Two
    integer aggregates and identical double divisions on both engines;
    the totals row is a broadcast scalar."""
    per_lang = (
        tbl(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )
    tot = per_lang.agg(
        F.sum("n_docs").alias("total"), F.count("*").alias("n_langs")
    )
    nat = F.col("n_docs").cast("double") / F.col("total")
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        nat.alias("nat_frac"),
        ((F.lit(1).cast("double") / F.col("n_langs")) / nat).alias("multiplier"),
    )


# --- substring-level (passage) dedup -------------------------------------------
SUBSTR_WINDOW = 20


@query(
    "pipeline_substring_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS a FROM documents
    ), wins AS (
      SELECT doc_id,
             md5(array_to_string(a[i : i + {SUBSTR_WINDOW - 1}], ' ')) AS h
      FROM toks, LATERAL unnest(
             generate_series(1, len(a) - {SUBSTR_WINDOW - 1})) AS t(i)
      WHERE len(a) >= {SUBSTR_WINDOW}
    ), dup AS (
      SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
    ), hits AS (
      SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows
      FROM wins w JOIN dup USING (h) GROUP BY w.doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.a) - {SUBSTR_WINDOW - 1} AS BIGINT) AS n_windows,
           COALESCE(h.n_dup_windows, 0) AS n_dup_windows,
           CAST(COALESCE(h.n_dup_windows, 0) AS DOUBLE)
             / (len(t.a) - {SUBSTR_WINDOW - 1}) AS dup_ratio
    FROM toks t LEFT JOIN hits h ON t.doc_id = h.doc_id
    WHERE len(t.a) >= {SUBSTR_WINDOW}
    """,
)
def pipeline_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level dedup signal (the substring-dedup shape of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better" — public method): every 20-token sliding window is hashed;
    windows whose hash occurs in MORE THAN ONE document mark repeated
    passages, and each document reports its duplicated-window ratio —
    the score a pipeline thresholds to cut boilerplate.  Plan: window
    hashes (16 bytes) are the only thing shuffled; the dup-hash set is
    the HAVING>1 aggregate, broadcast back; per-doc re-agg + one left
    join for zero-hit docs."""
    # fanout (r10): the per-window md5 projection is the query's CPU —
    # at sf1 the 2-row-group parquet ran it as TWO tasks (8.7 s of the
    # wall on 2 of 32 cores, twice — both `wins` consumers recompute
    # it); spread the scan before the heavy row-local work.
    docs = (
        fanout(tbl(spark, sf_dir, "documents"))
        .select("doc_id", _tokens(F.col("text")).alias("a"))
        .filter(F.size("a") >= SUBSTR_WINDOW)
    )
    wins = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("a") - (SUBSTR_WINDOW - 1)),
                lambda i: F.md5(
                    F.array_join(F.slice(F.col("a"), i, SUBSTR_WINDOW), " ")
                ),
            )
        ).alias("h"),
    )
    dup = (
        wins.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("h")
    )
    # ONE pass over `wins` scores everything (r10, guide §2.4): a LEFT
    # broadcast join against the dup-hash set counts total windows
    # (count(*)) and duplicated windows (count of matches) in the same
    # per-doc aggregate — the old shape joined `wins` to dup, re-agged,
    # then joined a THIRD pass over the docs scan back in for
    # n_windows/zero-hit docs.  Every doc passing the length filter has
    # >= 1 window, so per-doc count(*) over wins IS n_windows and no
    # docs re-join is needed.
    return (
        wins.join(
            F.broadcast(dup.withColumn("__d", F.lit(1))), "h", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.count("__d").alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            (
                F.col("n_dup_windows").cast("double") / F.col("n_windows")
            ).alias("dup_ratio"),
        )
    )


@query(
    "pipeline_substring_dedup_exact",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {{tokens}} AS a FROM documents
    ), wins AS (
      SELECT doc_id, CAST(i AS INT) AS i,
             md5(array_to_string(a[i : i + {SUBSTR_WINDOW - 1}], ' ')) AS h
      FROM toks, LATERAL unnest(
             generate_series(1, len(a) - {SUBSTR_WINDOW - 1})) AS t(i)
      WHERE len(a) >= {SUBSTR_WINDOW}
    ), dup AS (
      SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2
    ), seeds AS (
      SELECT w.doc_id, w.i FROM wins w JOIN dup USING (h)
    ), marked AS (
      SELECT doc_id, i,
             CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i)
                       <= {SUBSTR_WINDOW} THEN 0 ELSE 1 END AS brk
      FROM seeds
    ), grp AS (
      SELECT doc_id, i,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY i) AS g
      FROM marked
    )
    SELECT doc_id,
           CAST(MIN(i) AS BIGINT) AS span_start,
           CAST(MAX(i) + {SUBSTR_WINDOW - 1} AS BIGINT) AS span_end,
           CAST(MAX(i) + {SUBSTR_WINDOW - 1} - MIN(i) + 1 AS BIGINT)
             AS span_tokens
    FROM grp GROUP BY doc_id, g
    """.replace("{tokens}", _TOKENS_SQL),
)
def pipeline_substring_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT duplicated-span extraction — the suffix-array tier of Lee
    et al. 2022's ExactSubstr dedup beside the ratio-only approximation
    above (r3 verdict item 5).  Output: one row per MAXIMAL duplicated
    token span (doc_id, span_start, span_end, span_tokens), the ranges
    ExactSubstr cuts from training data.

    Equivalence to the suffix-array scan, at match resolution
    L={SUBSTR_WINDOW}: a substring of >= L tokens occurs twice in the
    corpus iff every one of its length-L windows occurs twice, so the
    union of duplicated L-window positions IS the exact token coverage
    of all duplicated substrings >= L — what the suffix array's
    LCP >= L runs produce.  The distributed shape replaces the
    monolithic suffix sort with a HASHED-SHARD suffix grouping: each
    suffix is keyed by the md5 of its first L tokens (the suffix
    array's depth-L bucket), a corpus-wide count >= 2 (same-doc repeats
    INCLUDED — the approximation above counts distinct docs only) marks
    duplicate groups, and a per-doc gaps-and-islands pass (window by
    doc_id, break when the seed gap exceeds L) merges overlapping or
    abutting windows into maximal spans.

    Scale: only 16-byte window hashes shuffle (the group key); the
    islands window partitions by doc_id (document-sized partitions,
    never corpus-global); seed join is co-keyed with the counting
    shuffle.  At 100 TB this is 2 hash shuffles + 1 bounded window —
    no suffix array ever materializes on one machine."""
    docs = (
        tbl(spark, sf_dir, "documents")
        .select("doc_id", _tokens(F.col("text")).alias("a"))
        .filter(F.size("a") >= SUBSTR_WINDOW)
    )
    wins = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("a") - (SUBSTR_WINDOW - 1)),
                lambda i: F.md5(
                    F.array_join(F.slice(F.col("a"), i, SUBSTR_WINDOW), " ")
                ),
            )
        ).alias("pos0", "h"),
    ).select("doc_id", (F.col("pos0") + 1).cast("int").alias("i"), "h")
    dup = (
        wins.groupBy("h")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("h")
    )
    seeds = wins.join(dup, "h").select("doc_id", "i")
    w_doc = Window.partitionBy("doc_id").orderBy("i")
    brk = F.when(
        F.col("i") - F.lag("i").over(w_doc) <= SUBSTR_WINDOW, F.lit(0)
    ).otherwise(F.lit(1))
    grouped = seeds.withColumn("brk", brk).withColumn(
        "g", F.sum("brk").over(w_doc)
    )
    span_end = F.max("i") + (SUBSTR_WINDOW - 1)
    return grouped.groupBy("doc_id", "g").agg(
        F.min("i").cast("long").alias("span_start"),
        span_end.cast("long").alias("span_end"),
        (span_end - F.min("i") + 1).cast("long").alias("span_tokens"),
    ).drop("g")


# --- apply the mixture: deterministic replication/thinning ----------------------
@query(
    "pipeline_apply_mixture",
    oracle="""
    WITH per_lang AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_langs
      FROM per_lang
    ), mult AS (
      SELECT lang,
             (CAST(1 AS DOUBLE) / n_langs)
               / (CAST(n_docs AS DOUBLE) / total) AS m
      FROM per_lang, tot
    ), gated AS (
      SELECT d.doc_id, d.lang,
             CAST(FLOOR(m) AS INT)
             + CASE WHEN (
                   (strpos('0123456789abcdef', substr(md5(d.text), 1, 1)) - 1) * 4096
                 + (strpos('0123456789abcdef', substr(md5(d.text), 2, 1)) - 1) * 256
                 + (strpos('0123456789abcdef', substr(md5(d.text), 3, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substr(md5(d.text), 4, 1)) - 1)
               ) / 65536.0 < m - FLOOR(m) THEN 1 ELSE 0 END AS n_copies
      FROM documents d JOIN mult USING (lang)
    )
    SELECT doc_id, lang, CAST(c AS INT) AS copy_id
    FROM gated, LATERAL unnest(generate_series(1, n_copies)) AS t(c)
    """,
)
def pipeline_apply_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enforce the mixture plan (pipeline_mixture_weights) on the
    corpus: each document is replicated floor(multiplier) times plus
    one more iff its content-hash fraction falls under the fractional
    part — deterministic stochastic rounding, so the resampled corpus
    hits the target mixture in expectation AND is bit-reproducible
    (same doc -> same copy count on any engine, run, or partitioning).
    The multiplier table is langs-sized -> broadcast; replication is a
    row-local explode."""
    docs = tbl(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    tot = per_lang.agg(
        F.sum("n_docs").alias("total"), F.count("*").alias("n_langs")
    )
    mult = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        (
            (F.lit(1).cast("double") / F.col("n_langs"))
            / (F.col("n_docs").cast("double") / F.col("total"))
        ).alias("m"),
    )
    h16 = F.conv(F.substring(F.md5("text"), 1, 4), 16, 10).cast("long")
    n_copies = F.floor("m").cast("int") + F.when(
        (h16 / F.lit(65536.0)) < (F.col("m") - F.floor("m")), 1
    ).otherwise(0)
    gated = docs.join(F.broadcast(mult), "lang").select(
        "doc_id", "lang", n_copies.alias("n_copies")
    )
    return (
        gated.filter(F.col("n_copies") >= 1)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_id"),
        )
        .select("doc_id", "lang", F.col("copy_id").cast("int").alias("copy_id"))
    )


# --- the full corpus-prep pipeline, end to end ----------------------------------
@query(
    "pipeline_corpus_prep",
    oracle=f"""
    WITH survivors AS (
      SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id
      FROM documents GROUP BY md5(text)
    ), cleaned AS (
      SELECT d.doc_id, d.lang, d.text
      FROM documents d JOIN survivors USING (doc_id)
      WHERE d.n_chars >= 50
    ), sampled AS (
      SELECT doc_id, lang, text FROM cleaned
      WHERE substring(md5(text), 1, 4) <
            CASE lang WHEN 'en' THEN '4000' ELSE '8000' END
    ), toks AS (
      SELECT doc_id, lang, {_TOKENS_SQL} AS a FROM sampled
    ), sized AS (
      SELECT doc_id, lang, a,
             GREATEST(1, CAST(CEIL((len(a) - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0)
                              AS INT) + 1) AS n_chunks
      FROM toks
    )
    SELECT doc_id, lang,
           CAST(i AS INT) AS chunk_idx,
           md5(array_to_string(
               a[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_SIZE}],
               ' ')) AS chunk_hash
    FROM sized, LATERAL unnest(generate_series(0, n_chunks - 1)) AS t(i)
    """,
)
def pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end corpus-prep pipeline a pretraining run would
    materialize, as one lazy composition: exact dedup (canonical
    survivor per content hash) → quality gate (length) → deterministic
    stratified sampling (content-hash gate, en thinned) → overlapping
    {CHUNK_SIZE}-token chunking.  Every stage is the registered
    operator's logic verbatim, so the oracle is their CTE composition.
    Plan: one hash-groupBy + one semi join up front (the only
    shuffles); sampling and chunking are row-local, so the whole tail
    is a single narrow stage — at 100 TB this pipeline is two shuffles
    of 16-byte keys plus a map-only pass, with chunk hashes (not
    text) as the output."""
    docs = tbl(spark, sf_dir, "documents")
    survivors = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    cleaned = docs.join(survivors, "doc_id", "left_semi").filter(
        F.col("n_chars") >= 50
    )
    thr = F.when(F.col("lang") == "en", F.lit("4000")).otherwise(F.lit("8000"))
    sampled = cleaned.filter(F.substring(F.md5("text"), 1, 4) < thr).select(
        "doc_id", "lang", _tokens(F.col("text")).alias("a")
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size("a") - CHUNK_SIZE) / F.lit(float(CHUNK_STRIDE))).cast("int")
        + 1,
    )
    exploded = sampled.select(
        "doc_id",
        "lang",
        "a",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i"),
    )
    chunk = F.slice(F.col("a"), F.col("i") * CHUNK_STRIDE + 1, CHUNK_SIZE)
    return exploded.select(
        "doc_id",
        "lang",
        F.col("i").cast("int").alias("chunk_idx"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


# --- exact-k per-stratum hash reservoir ---------------------------------------
@query(
    "pipeline_reservoir_topk",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rnk
      FROM documents
    )
    SELECT doc_id, lang, source, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 20
    """,
)
def pipeline_reservoir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY k=20 documents per language, deterministically: rank by
    md5 of the key inside each stratum and keep the first k — the
    distributed form of per-stratum reservoir sampling.  Unlike the
    rate-based hash filter (pipeline_stratified_sample) the output size
    is exact, which is what curriculum mixes with hard per-source quotas
    need.  One shuffle on the stratum key; the md5 ranking makes the
    choice reproducible across engines, partitionings, and reruns —
    never ORDER BY rand()."""
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        tbl(spark, sf_dir, "documents")
        .select(
            "doc_id", "lang", "source",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 20)
    )


# --- SCD Type-2 merge ---------------------------------------------------------------
@query(
    "pipeline_scd2_merge",
    oracle="""
    WITH changes AS (
      SELECT c_custkey,
             'SEG_' || CAST(c_custkey % 3 AS VARCHAR) AS new_segment
      FROM customer WHERE c_custkey % 10 = 3
    )
    SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment,
           DATE '1995-01-01' AS valid_from,
           CASE WHEN ch.c_custkey IS NOT NULL THEN DATE '1998-01-01' END
             AS valid_to,
           ch.c_custkey IS NULL AS is_current
    FROM customer c LEFT JOIN changes ch USING (c_custkey)
    UNION ALL
    SELECT c_custkey, new_segment, DATE '1998-01-01', CAST(NULL AS DATE), TRUE
    FROM changes
    """,
)
def pipeline_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2: a change batch closes the
    affected rows (valid_to = effective date, no longer current) and
    appends new current rows, while untouched rows pass through — full
    history stays queryable by validity range, the warehouse-standard
    complement to the Type-1 CDC upsert (pipeline_incremental_merge).

    Scale: one left join on the dim key (changes side is batch-sized →
    broadcast) + one append; history never rewrites unaffected rows.
    The change batch is derived deterministically from the key so both
    engines build the identical scenario."""
    eff = F.lit("1998-01-01").cast("date")
    epoch = F.lit("1995-01-01").cast("date")
    cust = tbl(spark, sf_dir, "customer")
    changes = cust.filter(F.col("c_custkey") % 10 == 3).select(
        "c_custkey",
        F.concat(F.lit("SEG_"), (F.col("c_custkey") % 3).cast("string")).alias(
            "new_segment"
        ),
    )
    marked = cust.join(
        F.broadcast(changes.select("c_custkey", F.lit(True).alias("chg"))),
        "c_custkey",
        "left",
    )
    closed = marked.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        epoch.alias("valid_from"),
        F.when(F.col("chg"), eff).alias("valid_to"),
        F.col("chg").isNull().alias("is_current"),
    )
    opened = changes.select(
        F.col("c_custkey").alias("custkey"),
        F.col("new_segment").alias("segment"),
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionByName(opened)


# --- weak-supervision quality classifier (fasttext-filter analog) ----------------
@query("pipeline_quality_classifier")
def pipeline_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality classifier in the CCNet/fastText-filter shape:
    train a logistic model on WEAK labels (a cheap heuristic rule), then
    score every document — the standard bootstrap when no human labels
    exist at corpus scale.

    Distributed shape, both directions: features are pure column
    expressions (one scan), MLlib LogisticRegression trains on the
    assembled vectors (distributed L-BFGS), and inference does NOT go
    back through the model object — the fitted coefficients (a tiny
    driver-side array) are re-applied as a closed-form sigmoid column
    expression, so scoring is a codegen'd projection that an executor
    fleet runs at scan speed, with no Python or JVM-model call per row.

    Rows-only gate: L-BFGS converges to solver-precision doubles.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from .text import STOPWORDS

    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    docs = (
        tbl(spark, sf_dir, "documents")
        .select("doc_id", "text", toks.alias("a"))
        .select(
            "doc_id",
            F.size("a").cast("double").alias("n_tokens"),
            (
                F.size(F.filter("a", lambda w: w.isin(STOPWORDS)))
                / F.greatest(F.size("a"), F.lit(1))
            ).alias("stop_ratio"),
            (
                F.size(F.array_distinct("a"))
                / F.greatest(F.size("a"), F.lit(1))
            ).alias("distinct_ratio"),
            (
                F.length(F.regexp_replace("text", r"[^0-9]", ""))
                / F.greatest(F.length("text"), F.lit(1))
            ).alias("digit_frac"),
        )
    )
    # Weak label: "high quality" = has a sane stopword ratio AND is not
    # dominated by repeats — a rule a human would write in 5 minutes.
    labeled = docs.withColumn(
        "label",
        (
            (F.col("stop_ratio") >= 0.05) & (F.col("distinct_ratio") >= 0.5)
        ).cast("double"),
    )
    feat_cols = ["n_tokens", "stop_ratio", "distinct_ratio", "digit_frac"]
    assembled = VectorAssembler(
        inputCols=feat_cols, outputCol="features"
    ).transform(labeled)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=25,
        regParam=0.01,
        standardization=True,
    )
    model = lr.fit(assembled)
    coefs = [float(c) for c in model.coefficients]
    b = float(model.intercept)
    margin = F.lit(b)
    for c, col in zip(coefs, feat_cols):
        margin = margin + F.lit(c) * F.col(col)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return labeled.select(
        "doc_id",
        F.col("label").cast("int").alias("weak_label"),
        F.round(p, 6).alias("p_high_quality"),
        (p >= 0.5).cast("int").alias("pred"),
    )


PACK_CAPACITY = 512


# --- sequence packing (concat-and-split) -------------------------------------------
@query(
    "pipeline_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM toks
    )
    SELECT CAST((cum - n_tokens) // {PACK_CAPACITY} AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM cum GROUP BY 1
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training efficiency: documents are
    concatenated in a fixed order and cut into {PACK_CAPACITY}-token
    training sequences (the GPT-style "concat-and-split" packed-dataset
    layout); each document is assigned to the bin where its first token
    lands.  The output is the shard plan: docs / tokens / doc-range per
    bin.

    The global running token count — the packing decision — is
    ``operators/ranking.global_prefix_sum_lazy`` (r8: the dense
    monotone ``doc_id div 8192`` bucket makes the whole prefix one
    lazy plan — per-bucket window ≤8192 rows at any corpus size,
    offsets a bucket-count-sized broadcast subtree, zero construction
    jobs).  NO single-partition window anywhere, which is what makes
    this plannable over a 100-TB corpus (the naive
    cumsum-over-everything window is the flagged scale-killer
    shape)."""
    from ..operators.ranking import global_prefix_sum_lazy

    # r10 (guide §2.4): the lazy prefix sum reads its input twice
    # (bucket partials + main pass) — checkpoint the 2-longs-per-doc
    # frame so the corpus tokenize runs once, spread by fanout instead
    # of the parquet's row-group count.
    toks = (
        fanout(tbl(spark, sf_dir, "documents")).select("doc_id", "text")
        .select(
            "doc_id",
            F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
        .transform(shared_plan)
    )
    cum = global_prefix_sum_lazy(
        toks,
        ["doc_id"],
        "n_tokens",
        cum_col="cum",
        # doc_id div is monotone: bucket offsets, no sampling pass
        bucket=F.expr("doc_id div 8192"),
    )
    start = F.col("cum") - F.col("n_tokens")
    return (
        cum.groupBy(F.floor(start / PACK_CAPACITY).cast("long").alias("bin_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# --- deterministic epoch shuffle ---------------------------------------------------
@query(
    "pipeline_epoch_shuffle",
    oracle="""
    SELECT CAST(row_number() OVER (ORDER BY md5('ep1:' || doc_id), doc_id)
                AS BIGINT) AS position,
           doc_id
    FROM documents
    """,
)
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle: every document gets a
    pseudo-random but REPRODUCIBLE global position (order by
    md5(seed || doc_id)) — the standard shuffle-before-epoch step of a
    training-data pipeline, seeded so re-runs and resumed jobs see the
    identical order.

    The global position is the two-pass distributed rank
    (operators/ranking.py): range-shuffle on the hash key, local
    row_number, broadcast offsets — never a single-partition window.
    Downstream, pipeline_pack_sequences can consume this order instead
    of doc_id order to decorrelate neighboring documents."""
    from ..operators.ranking import global_row_number_lazy

    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit("ep1:"), F.col("doc_id").cast("string"))).alias(
            "hk"
        ),
    )
    # a string PREFIX is monotone in the string order: the first two
    # hex chars of the hash key give 256 near-uniform buckets; the
    # lazy path folds the offsets into the same job (no count action)
    ranked = global_row_number_lazy(
        docs,
        ["hk", "doc_id"],
        rn_col="position",
        bucket=F.substring("hk", 1, 2),
    )
    return ranked.select(F.col("position").cast("long"), "doc_id")


# --- quality-weighted sampling -----------------------------------------------------
@query(
    "pipeline_weighted_sample",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             LEAST(1.0, n_chars / 2000.0) AS p
      FROM documents
    )
    SELECT doc_id, lang, p
    FROM scored
    WHERE substring(md5('ws:' || doc_id), 1, 4)
            < printf('%04x', CAST(FLOOR(p * 65535) AS INT))
    """,
)
def pipeline_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document weighted sampling with DETERMINISTIC coin flips:
    keep a document with probability proportional to its quality
    weight (here length-based, capped at 1) by comparing a seeded
    content-hash uniform against the weight — the high-quality-upweight
    step of corpus curation, reproducible across engines, runs, and
    partitionings (same property as pipeline_stratified_sample; rand()
    would be none of those).

    Plan: pure row-local projection + filter — zero shuffles at any
    scale; the hash gate and the weight threshold are both column
    expressions shared textually with the oracle."""
    docs = tbl(spark, sf_dir, "documents")
    p = F.least(F.lit(1.0), F.col("n_chars") / F.lit(2000.0))
    thr = F.lpad(
        F.lower(F.hex(F.floor(p * 65535).cast("int"))), 4, "0"
    )
    u = F.substring(
        F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 4
    )
    return (
        docs.withColumn("p", p)
        .filter(u < thr)
        .select("doc_id", "lang", "p")
    )


# --- per-source frequency capping --------------------------------------------------
SOURCE_CAP = 15  # max documents retained per source/domain
_CAP_SALTS = 8  # sub-buckets per source in the partial top-k pass


SOURCE_CAP_ORACLE = f"""
    WITH keyed AS (
      SELECT doc_id, source,
             md5(COALESCE(text, '')) || '-'
               || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS k
      FROM documents
    ), ranked AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY k) AS r
      FROM keyed
    )
    SELECT source, CAST(r AS INT) AS keep_rank, doc_id
    FROM ranked WHERE r <= {SOURCE_CAP}
    """


@query("pipeline_source_cap", oracle=SOURCE_CAP_ORACLE)
def pipeline_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (domain) frequency capping: keep at most
    {SOURCE_CAP} documents per source, chosen by content-hash order so
    the kept set is deterministic and stable under re-partitioning and
    incremental re-runs — the domain-frequency-cap step every
    web-corpus pipeline applies before mixing (over-crawled domains
    would otherwise dominate the token budget).

    Plan — skew-spread two-level top-k: level 1 ranks inside
    (source, salt) sub-buckets and keeps only the {SOURCE_CAP}
    smallest keys, so a mega-domain's sort is spread across
    ``_CAP_SALTS`` tasks and each is a SORT-based window (spills to
    disk under pressure — unlike a collect_list aggregate, which
    buffers every key in memory before any truncation); level 2 ranks
    the survivors per source over at most salts × cap rows — a
    provably tiny partition.  The sort key is md5(text) ‖ zero-padded
    doc_id (NULL text coalesces to '' on both engines so no row can
    vanish from one side only).  Exactness: the global top-cap keys
    each rank ≤ cap within their own sub-bucket, so level 1 never
    discards a winner."""
    from pyspark.sql import Window

    docs = tbl(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.concat(
            F.md5(F.coalesce(F.col("text"), F.lit(""))),
            F.lit("-"),
            F.lpad(F.col("doc_id").cast("string"), 12, "0"),
        ).alias("k"),
        F.pmod(F.xxhash64("doc_id"), F.lit(_CAP_SALTS)).alias("salt"),
    )
    w1 = Window.partitionBy("source", "salt").orderBy("k")
    pruned = (
        docs.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= SOURCE_CAP)
    )
    w2 = Window.partitionBy("source").orderBy("k")
    return (
        pruned.withColumn("keep_rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("keep_rank") <= SOURCE_CAP)
        .select("source", "keep_rank", "doc_id")
    )


# --- chunking as a Python UDTF (the §2.8 table-function surface, gated) ---------------
@query(
    "pipeline_udtf_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS a FROM documents
    ), sized AS (
      SELECT doc_id, a,
             GREATEST(1, CAST(CEIL((len(a) - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0)
                              AS INT) + 1) AS n_chunks
      FROM toks
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           CAST(len(a[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_SIZE}])
                AS INT) AS chunk_tokens,
           md5(array_to_string(
               a[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_SIZE}],
               ' ')) AS chunk_hash
    FROM sized, LATERAL unnest(generate_series(0, n_chunks - 1)) AS t(i)
    """,
)
def pipeline_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunking semantics of pipeline_chunk_documents re-expressed
    as a PYTHON UDTF consumed through SQL LATERAL — the §2.8
    table-function surface as a hash-checked gate, not just a pytest.
    Same windows, same md5 chunk hashes, shared oracle shape.

    Scale note: the UDTF is the Python slow path (row-at-a-time eval);
    the production form stays the built-in sequence+slice explode one
    gate up — this gate pins that the two agree exactly."""
    import hashlib
    import math
    import re

    from pyspark.sql.functions import udtf

    size, stride = CHUNK_SIZE, CHUNK_STRIDE
    # ASCII whitespace ONLY: Python's \s is Unicode-wide, but both the
    # Java-regex tokenizer (_tokens) and the DuckDB RE2 oracle
    # (_TOKENS_SQL) treat \s as ASCII — match their set exactly so a
    # non-breaking space can never split here and not there.
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @udtf(returnType="chunk_idx int, chunk_tokens int, chunk_hash string")
    class ChunkWindows:
        def eval(self, text: str):
            toks = [t for t in ws.split(text or "") if t]
            n = max(1, (math.ceil((len(toks) - size) / stride) + 1)
                    if len(toks) > size else 1)
            for i in range(n):
                c = toks[i * stride : i * stride + size]
                yield i, len(c), hashlib.md5(
                    " ".join(c).encode()
                ).hexdigest()

    spark.udtf.register("ecf_chunk_windows", ChunkWindows)
    tbl(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).createOrReplaceTempView("v_docs_udtf")
    return spark.sql(
        """
        SELECT doc_id, t.chunk_idx, t.chunk_tokens, t.chunk_hash
        FROM v_docs_udtf, LATERAL ecf_chunk_windows(text) t
        """
    )


# --- T5-style span corruption (Raffel et al. 2020, §3.1.4) --------------------------
SPAN_BLOCK = 8  # tokens per block
SPAN_LEN = 3  # masked span length at the head of a selected block


@query(
    "pipeline_span_corruption",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS_SQL} AS a FROM documents
    ),
    marked AS (
      SELECT doc_id, a, len(a) AS n,
             list_transform(range(1, len(a) + 1), i ->
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || '#'
                                       || CAST((i - 1) // {SPAN_BLOCK} AS VARCHAR)),
                                   1, 1) IN ('0','1','2','3')
                         AND (i - 1) % {SPAN_BLOCK} < {SPAN_LEN}
                    THEN 1 ELSE 0 END) AS m
      FROM t WHERE len(a) > 0
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(list_aggregate(
             list_transform(range(1, n + 1), i ->
               CASE WHEN m[i] = 1 AND (i - 1) % {SPAN_BLOCK} = 0
                    THEN 1 ELSE 0 END), 'sum') AS BIGINT) AS n_spans,
           CAST(list_aggregate(m, 'sum') AS BIGINT) AS n_masked,
           NULLIF(array_to_string(list_filter(
             list_transform(range(1, n + 1), i ->
               CASE WHEN m[i] = 0 THEN a[i]
                    WHEN (i - 1) % {SPAN_BLOCK} = 0
                    THEN '<extra_id_' || CAST((i - 1) // {SPAN_BLOCK} AS VARCHAR) || '>'
                    ELSE NULL END),
             x -> x IS NOT NULL), ' '), '') AS input_text,
           NULLIF(array_to_string(list_filter(
             list_transform(range(1, n + 1), i ->
               CASE WHEN m[i] = 0 THEN NULL
                    WHEN (i - 1) % {SPAN_BLOCK} = 0
                    THEN '<extra_id_' || CAST((i - 1) // {SPAN_BLOCK} AS VARCHAR)
                         || '> ' || a[i]
                    ELSE a[i] END),
             x -> x IS NOT NULL), ' '), '') AS target_text
    FROM marked
    """,
)
def pipeline_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span-corruption objective preparation: deterministic ~25% of
    {SPAN_BLOCK}-token blocks have their leading {SPAN_LEN} tokens
    replaced by a sentinel in the encoder input, and the sentinel +
    masked tokens become the decoder target.  Span selection is a pure
    hash of (doc_id, block) — no RNG, so any two cluster runs (and the
    oracle) produce byte-identical training pairs, and a resumed job
    can't double-mask.  Sentinels carry the block index, keeping
    input/target alignment checkable downstream.

    Plan: entirely row-local HOF string work — zero shuffles, linear
    scan, the same shape at 100 TB."""
    t = tbl(spark, sf_dir, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("a")
    )
    n = F.size("a")
    def masked_flag(i):
        b = F.floor((i - 1) / SPAN_BLOCK).cast("int")
        sel = F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit("#"), b.cast("string")
                )
            ),
            1,
            1,
        ).isin("0", "1", "2", "3")
        return F.when(sel & ((i - 1) % SPAN_BLOCK < SPAN_LEN), 1).otherwise(0)

    idx = F.sequence(F.lit(1), n)
    marked = t.filter(n > 0).select(
        "doc_id",
        "a",
        n.alias("n"),
        F.transform(idx, masked_flag).alias("m"),
    )

    def at(arr, i):
        return F.element_at(arr, i.cast("int"))

    def sentinel(i):
        return F.concat(
            F.lit("<extra_id_"),
            F.floor((i - 1) / SPAN_BLOCK).cast("int").cast("string"),
            F.lit(">"),
        )

    idx2 = F.sequence(F.lit(1), F.col("n"))
    span_start = lambda i: (i - 1) % SPAN_BLOCK == 0  # noqa: E731
    input_arr = F.filter(
        F.transform(
            idx2,
            lambda i: F.when(at(F.col("m"), i) == 0, at(F.col("a"), i))
            .when(span_start(i), sentinel(i))
            .otherwise(F.lit(None).cast("string")),
        ),
        lambda x: x.isNotNull(),
    )
    target_arr = F.filter(
        F.transform(
            idx2,
            lambda i: F.when(
                at(F.col("m"), i) == 0, F.lit(None).cast("string")
            )
            .when(
                span_start(i),
                F.concat(sentinel(i), F.lit(" "), at(F.col("a"), i)),
            )
            .otherwise(at(F.col("a"), i)),
        ),
        lambda x: x.isNotNull(),
    )
    n_spans = F.aggregate(
        F.transform(
            idx2,
            lambda i: F.when(
                (at(F.col("m"), i) == 1) & span_start(i), 1
            ).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_masked = F.aggregate(F.col("m"), F.lit(0), lambda acc, x: acc + x)
    return marked.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        n_spans.cast("long").alias("n_spans"),
        n_masked.cast("long").alias("n_masked"),
        F.nullif(F.array_join(input_arr, " "), F.lit("")).alias("input_text"),
        F.nullif(F.array_join(target_arr, " "), F.lit("")).alias(
            "target_text"
        ),
    )


# --- corpus data card (Datasheets for Datasets, Gebru et al. 2021) ------------------
@query(
    "pipeline_data_card",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source, n_chars,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x <> '')) AS n_tokens,
             md5(text) AS h
      FROM documents
    ),
    dup AS (
      SELECT CAST(SUM(cnt - 1) AS BIGINT) AS n_exact_dups
      FROM (SELECT h, COUNT(*) AS cnt FROM t GROUP BY h)
    )
    SELECT t.lang, t.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(t.n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(t.n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(t.n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(t.n_tokens) AS BIGINT) AS max_tokens,
           (SELECT n_exact_dups FROM dup) AS corpus_exact_dups
    FROM t GROUP BY t.lang, t.source
    """,
)
def pipeline_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-query corpus datasheet (Gebru et al., 'Datasheets for
    Datasets'): per (lang, source) cell — document/token/char counts
    and token-length extremes — plus the corpus-wide exact-duplicate
    count, the summary table a dataset release ships.  All exact
    integers; two hash aggregates plus one scalar dup count broadcast
    onto every cell."""
    t = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
        F.md5("text").alias("h"),
    )
    dup = (
        t.groupBy("h")
        .agg(F.count("*").alias("cnt"))
        .agg(F.sum(F.col("cnt") - 1).cast("long").alias("n_exact_dups"))
    )
    card = t.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
    )
    return card.crossJoin(F.broadcast(dup)).withColumnRenamed(
        "n_exact_dups", "corpus_exact_dups"
    )


# --- deterministic hash-based dataset split --------------------------------------------
# Shared split rule: first md5 nibble of 'split:<doc_id>' — 13/16 train,
# 1/16 val, 2/16 test.  pipeline_dataset_split_hash AND the cross-split
# leakage gate (queries/dedup.py::pipeline_split_leakage) build from
# these two fragments so the assignment can never drift between them.
SPLIT_CASE_SQL = """CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1) < 'd'
                  THEN 'train'
                  WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
                  THEN 'val'
                  ELSE 'test' END"""


def split_col():
    """Spark twin of ``SPLIT_CASE_SQL`` (expects a ``doc_id`` column)."""
    c = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 1
    )
    return (
        F.when(c < "d", F.lit("train"))
        .when(c < "e", F.lit("val"))
        .otherwise(F.lit("test"))
    )


@query(
    "pipeline_dataset_split_hash",
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id, lang, source, {SPLIT_CASE_SQL} AS split
      FROM documents
    )
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM tagged GROUP BY split, lang
    """,
)
def pipeline_dataset_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by key hash — the split
    every training pipeline needs to be REPRODUCIBLE and stable under
    corpus growth: a document's split is a pure function of its id
    (first md5 nibble: 13/16 train, 1/16 val, 2/16 test), so re-runs,
    backfills, and incremental ingests never migrate an example across
    splits (the leakage mode random splits suffer).  The gate reports
    the per-split × language composition the pipeline would log.

    Row-local hash + CASE, ONE map-side-combinable groupBy; bucket
    keys stay hex-character arithmetic (the CMS convention), identical
    on both engines at any scale."""
    tagged = tbl(spark, sf_dir, "documents").select(
        "lang", "source", split_col().alias("split")
    )
    return tagged.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )


# --- contrastive triplet construction ---------------------------------------------------
@query(
    "pipeline_contrastive_triplets",
    oracle="""
    WITH ranked AS (
      SELECT vec_id, CAST(label AS INT) AS label,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) AS r,
             COUNT(*) OVER (PARTITION BY label) AS n
      FROM embeddings
    ),
    labels AS (
      SELECT CAST(label AS INT) AS label,
             ROW_NUMBER() OVER (ORDER BY label) AS li,
             COUNT(*) OVER () AS nl
      FROM (SELECT DISTINCT label FROM embeddings)
    ),
    pos AS (
      SELECT a.vec_id AS anchor_id, a.label,
             b.vec_id AS pos_id, a.r, a.n
      FROM ranked a JOIN ranked b
        ON b.label = a.label AND b.r = (a.r % a.n) + 1
      WHERE a.n >= 2
    ),
    neg AS (
      SELECT p.anchor_id, p.label, p.pos_id, nb.vec_id AS neg_id,
             nb.label AS neg_label
      FROM pos p
      JOIN labels la ON la.label = p.label
      JOIN labels ln ON ln.li = (la.li % la.nl) + 1
      JOIN ranked nb ON nb.label = ln.label
        AND nb.r = ((p.r - 1) % nb.n) + 1
    )
    SELECT anchor_id, CAST(label AS INT) AS label, pos_id, neg_id,
           CAST(neg_label AS INT) AS neg_label
    FROM neg
    """,
)
def pipeline_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, negative) triplet construction for
    contrastive/metric learning over the embedding corpus — the
    dataset-prep step behind triplet-loss training: positive = the
    next vector (cyclically) within the anchor's label, negative = the
    rank-aligned vector from the NEXT label (cyclically), so every
    anchor gets exactly one deterministic triplet, reproducible across
    runs and engines (no sampling RNG anywhere).

    Plan: two per-label windows (label-partitioned — label-bounded
    state), a label directory small enough to broadcast, and two
    equi-joins on (label, rank) — at 100 TB everything shuffles on the
    label/rank keys; the cyclic wrap is modulo arithmetic, not a self
    cross-join.  Labels with one member yield no triplet (no positive
    exists) on both engines."""
    emb = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("int").alias("label")
    )
    wl = Window.partitionBy("label").orderBy("vec_id")
    ranked = emb.select(
        "vec_id",
        "label",
        F.row_number().over(wl).alias("r"),
        F.count("*").over(Window.partitionBy("label")).alias("n"),
    ).transform(shared_plan)
    labels = (
        emb.select("label")
        .distinct()
        .select(
            "label",
            F.row_number().over(Window.orderBy("label")).alias("li"),
            F.count("*").over(Window.partitionBy()).alias("nl"),
        )
    )
    b = ranked.select(
        F.col("label").alias("bl"), F.col("r").alias("br"),
        F.col("vec_id").alias("pos_id"),
    )
    pos = (
        ranked.filter(F.col("n") >= 2)
        .join(
            b,
            (F.col("bl") == F.col("label"))
            & (F.col("br") == (F.col("r") % F.col("n")) + 1),
        )
        .select(
            F.col("vec_id").alias("anchor_id"), "label", "pos_id", "r"
        )
    )
    la = labels.select(
        F.col("label").alias("al"), F.col("li").alias("ali"), "nl"
    )
    ln = labels.select(
        F.col("label").alias("neg_label"), F.col("li").alias("nli")
    )
    nb = ranked.select(
        F.col("label").alias("nbl"), F.col("r").alias("nbr"),
        F.col("n").alias("nbn"), F.col("vec_id").alias("neg_id"),
    )
    return (
        pos.join(F.broadcast(la), F.col("al") == F.col("label"))
        .join(
            F.broadcast(ln),
            F.col("nli") == (F.col("ali") % F.col("nl")) + 1,
        )
        .join(
            nb,
            (F.col("nbl") == F.col("neg_label"))
            & (
                F.col("nbr")
                == ((F.col("r") - 1) % F.col("nbn")) + 1
            ),
        )
        .select("anchor_id", "label", "pos_id", "neg_id", "neg_label")
    )


# --- DSIR: data selection via importance resampling ---------------------------------
# Xie et al. 2023 ("Data Selection for Language Models via Importance
# Resampling"): estimate target vs raw distributions over HASHED n-gram
# features, weight every raw example by its importance ratio, and
# resample the highest-weight examples.  Cross-engine exactness forces
# two published-faithful substitutions, both documented where they
# matter: (1) the per-bucket ratio is fixed-point integer arithmetic
# (ln() is not bit-stable across engines — the bm25 rule), so each
# bigram contributes the CENTERED ratio (r − 1)·SCALE — the first-order
# surrogate of ln r, sign-faithful and length-unbiased where the raw
# ratio-sum is length-dominated (measured rho = −0.99 raw vs +0.9996
# centered against the paper's log-pooled weight;
# tests/test_scale_ops.py pins it); (2) resampling is the deterministic
# argmax (top-k by weight, doc_id tie-break) rather than gumbel-noised
# sampling, the reproducible form a data pipeline actually ships.
DSIR_SCALE = 10**6  # fixed-point ratio quantum
DSIR_TOPK = 100
# 256 hashed feature buckets = the first two hex chars of md5(bigram)
# — the engine-portable hash family every dedup sketch here uses.
_DSIR_BG_SQL = r"""docs AS (
      SELECT doc_id,
             substr(md5('dsir:' || source), 1, 1) < '4' AS is_target,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> x <> '') AS a
      FROM documents
    ),
    bg AS (
      SELECT doc_id, is_target,
             substr(md5(a[CAST(i AS INT)] || ' ' ||
                        a[CAST(i + 1 AS INT)]), 1, 2) AS b
      FROM docs, unnest(range(1, len(a))) t(i)
    ),
    ct AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM bg
      WHERE is_target GROUP BY b
    ),
    cr AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM bg
      WHERE NOT is_target GROUP BY b
    ),
    u AS (
      SELECT COALESCE(ct.b, cr.b) AS b,
             ((COALESCE(ct, 0) + 1) * CAST(1000000 AS BIGINT))
               // (COALESCE(cr, 0) + 1)
               - CAST(1000000 AS BIGINT) AS u
      FROM ct FULL JOIN cr ON ct.b = cr.b
    ),
    scored AS (
      SELECT d.doc_id,
             d.is_target,
             CAST(COUNT(u.b) AS BIGINT) AS n_bigrams,
             CAST(COALESCE(SUM(u.u), 0) AS BIGINT) AS score_fp
      FROM docs d
      LEFT JOIN (SELECT bg.doc_id, bg.b, u.u FROM bg JOIN u ON u.b = bg.b)
        u ON u.doc_id = d.doc_id
      GROUP BY d.doc_id, d.is_target
    )"""


def _dsir_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared DSIR scoring frame: (doc_id, is_target, n_bigrams,
    score_fp).

    Scale shape: bigram hashing is row-local (one explode), the two
    distribution estimates are 256-row aggregates, the per-bucket
    ratio table broadcast-joins back onto the bigram stream, and one
    groupBy(doc_id) finishes — shuffles carry (2-hex-char, count)
    pairs and doc ids, never text.  Fixed-point bounds: u[b] <=
    (|target bigrams|+1)·1e6 and score <= n_bigrams·max(u) — int64 at
    every gate SF; a 100-TB run raises DSIR_SCALE precision by
    computing u in DECIMAL(38,0) (documented, not needed here)."""
    docs = (
        fanout(tbl(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            (
                F.substring(
                    F.md5(F.concat(F.lit("dsir:"), F.col("source"))), 1, 1
                )
                < "4"
            ).alias("is_target"),
            F.filter(
                F.split(F.lower("text"), r"\s+"), lambda x: x != ""
            ).alias("a"),
        )
        .transform(shared_plan)
    )
    # sequence(1, 0) is DESCENDING in Spark — guard short docs with an
    # explicit empty array (the cross-engine rule in queries/__init__)
    bigram_hashes = F.when(
        F.size("a") >= 2,
        F.expr(
            "transform(sequence(1, size(a) - 1), i -> "
            "substring(md5(concat(element_at(a, i), ' ', "
            "element_at(a, i + 1))), 1, 2))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = docs.select(
        "doc_id", "is_target", F.explode(bigram_hashes).alias("b")
    )
    # r10 (guide §2.4): the two distribution estimates used to be two
    # separate consumers of the occurrence stream (two md5 expansion
    # passes) stitched back with a full outer join; ONE conditional
    # aggregate over the 256-bucket key produces both counts in one
    # pass with no join (groupBy(b) covers exactly the buckets either
    # side of the old full join saw; the conditional sums give 0
    # where the old coalesce(_, 0) did).
    u = (
        bg.groupBy("b")
        .agg(
            F.sum(F.col("is_target").cast("long")).alias("ct"),
            F.sum((~F.col("is_target")).cast("long")).alias("cr"),
        )
        .select(
            "b",
            (
                F.expr(
                    f"((coalesce(ct, 0L) + 1L) * {DSIR_SCALE}L)"
                    " div (coalesce(cr, 0L) + 1L)"
                )
                - DSIR_SCALE
            ).alias("u"),
        )
    )
    per_doc = (
        bg.join(F.broadcast(u), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("u").alias("score_fp"),
        )
    )
    return docs.select("doc_id", "is_target").join(
        per_doc, "doc_id", "left"
    ).select(
        "doc_id",
        "is_target",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("score_fp", F.lit(0)).cast("long").alias("score_fp"),
    )


@query(
    "pipeline_dsir_weights",
    oracle=f"""
    WITH {_DSIR_BG_SQL}
    SELECT doc_id, is_target, n_bigrams, score_fp FROM scored
    """,
)
def pipeline_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023) over hashed word
    bigrams: the target distribution is estimated from the documents
    of a deterministic quarter of the sources (the 'curated corpus'
    stand-in: md5-hash-selected, reproducible on any engine), the raw
    distribution from the rest; every document scores the Laplace-
    smoothed target/raw ratio of each of its bigram buckets, summed in
    exact fixed point (see _dsir_scored for the ln()-free estimator
    note and the 100-TB bounds)."""
    return _dsir_scored(spark, sf_dir)


@query(
    "pipeline_dsir_resample",
    oracle=f"""
    WITH {_DSIR_BG_SQL},
    sel AS (
      SELECT doc_id, score_fp FROM scored WHERE NOT is_target
      ORDER BY score_fp DESC, doc_id LIMIT {DSIR_TOPK}
    )
    SELECT CAST(row_number() OVER (ORDER BY score_fp DESC, doc_id)
                AS BIGINT) AS rank,
           doc_id, score_fp
    FROM sel
    """,
)
def pipeline_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection step: the top-{k} raw-pool documents by
    importance weight (deterministic argmax form; doc_id tie-break).

    Plan: distributed top-k (TakeOrderedAndProject — never a global
    sort), then ranks minted by posexplode over the k-row collected
    aggregate (bounded by construction, the repo's top-k rank
    idiom)."""
    sel = (
        _dsir_scored(spark, sf_dir)
        .filter(~F.col("is_target"))
        .select("doc_id", "score_fp")
        .orderBy(F.desc("score_fp"), "doc_id")
        .limit(DSIR_TOPK)
    )
    packed = sel.agg(
        F.array_sort(
            F.collect_list(F.struct((-F.col("score_fp")).alias("ns"), "doc_id"))
        ).alias("xs")
    )
    return packed.select(
        F.posexplode("xs").alias("pos", "x")
    ).select(
        (F.col("pos") + 1).cast("long").alias("rank"),
        F.col("x.doc_id").alias("doc_id"),
        (-F.col("x.ns")).cast("long").alias("score_fp"),
    )


# --- FIM: fill-in-the-middle transformation ------------------------------------------
# Bavarian et al. 2022 ("Efficient Training of Language Models to Fill
# in the Middle"): with rate p, a document is split into (prefix,
# middle, suffix) at uniform positions and re-serialized in PSM order
# with sentinel tokens, teaching an autoregressive model to infill.
# Deterministic engine form: the apply decision and BOTH split points
# derive from md5(doc_id) (the paper's 0.5 rate), so the transform is
# reproducible across engines, partitionings, and reruns — the same
# discipline as pipeline_span_corruption / epoch_shuffle.
FIM_RATE_HEX = "8"  # first md5 hex char < '8' => 50% of docs


def _hex4_sql(s: str) -> str:
    """First 16 bits of md5(s) as an integer, in portable SQL (the
    strpos hex-digit idiom the simhash oracle uses)."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5({s}), {k + 1}, 1)) - 1)"
            f" * {16 ** (3 - k)}"
            for k in range(4)
        )
        + ")"
    )


@query(
    "pipeline_fim_transform",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             COALESCE(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  x -> x <> ''), []) AS a,
             substr(md5('fim:' || CAST(doc_id AS VARCHAR)), 1, 1)
               < '{FIM_RATE_HEX}' AS chosen
      FROM documents
    ),
    sized AS (SELECT *, len(a) AS n FROM d),
    split AS (
      SELECT doc_id, a, n, chosen AND n >= 1 AS fim_applied,
             1 + ({_hex4_sql("'fim_i:' || CAST(doc_id AS VARCHAR)")} % GREATEST(n, 1)) AS p1,
             1 + ({_hex4_sql("'fim_j:' || CAST(doc_id AS VARCHAR)")} % GREATEST(n, 1)) AS p2
      FROM sized
    ),
    pts AS (
      SELECT doc_id, a, n, fim_applied,
             LEAST(p1, p2) AS i, GREATEST(p1, p2) AS j
      FROM split
    )
    SELECT doc_id,
           fim_applied,
           CAST(n AS BIGINT) AS n_tokens,
           CASE WHEN fim_applied
                THEN CAST(j - i + 1 AS BIGINT) ELSE 0 END AS middle_len,
           CASE WHEN fim_applied
                THEN '<fim_pre> '
                     || COALESCE(array_to_string(a[1:CAST(i - 1 AS INT)], ' '), '')
                     || ' <fim_suf> '
                     || COALESCE(array_to_string(a[CAST(j + 1 AS INT):CAST(n AS INT)], ' '), '')
                     || ' <fim_mid> '
                     || COALESCE(array_to_string(a[CAST(i AS INT):CAST(j AS INT)], ' '), '')
                ELSE COALESCE(array_to_string(a, ' '), '') END AS input_text
    FROM pts
    """,
)
def pipeline_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIM/PSM training transform (Bavarian et al. 2022): half the
    corpus (md5-selected) is re-serialized as
    ``<fim_pre> prefix <fim_suf> suffix <fim_mid> middle`` with both
    split points drawn deterministically from md5(doc_id); the rest
    passes through untouched (the paper's mixed AR+FIM objective).

    Entirely row-local — one projection over the scan, no shuffle at
    all: the 100-TB cost is exactly one pass."""
    # NULL text must mirror the oracle's COALESCE-to-empty (NULL would
    # otherwise poison size() to -1 and the joined string to NULL)
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != ""),
            F.array().cast("array<string>"),
        ).alias("a"),
        (
            F.substring(
                F.md5(F.concat(F.lit("fim:"), F.col("doc_id").cast("string"))),
                1,
                1,
            )
            < FIM_RATE_HEX
        ).alias("chosen"),
    )

    def hex4(prefix: str):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(prefix), F.col("doc_id").cast("string"))
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")

    n = F.size("a").cast("long")
    p1 = 1 + hex4("fim_i:") % F.greatest(n, F.lit(1))
    p2 = 1 + hex4("fim_j:") % F.greatest(n, F.lit(1))
    sized = docs.select(
        "doc_id",
        "a",
        n.alias("n"),
        (F.col("chosen") & (n >= 1)).alias("fim_applied"),
        F.least(p1, p2).alias("i"),
        F.greatest(p1, p2).alias("j"),
    )
    i, j, nn = F.col("i").cast("int"), F.col("j").cast("int"), F.col("n").cast("int")
    psm = F.concat(
        F.lit("<fim_pre> "),
        F.array_join(F.slice("a", 1, F.greatest(i - 1, F.lit(0))), " "),
        F.lit(" <fim_suf> "),
        F.array_join(
            F.slice("a", j + 1, F.greatest(nn - j, F.lit(0))), " "
        ),
        F.lit(" <fim_mid> "),
        F.array_join(F.slice("a", i, j - i + 1), " "),
    )
    return sized.select(
        "doc_id",
        "fim_applied",
        F.col("n").alias("n_tokens"),
        F.when(F.col("fim_applied"), (F.col("j") - F.col("i") + 1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("middle_len"),
        F.when(F.col("fim_applied"), psm)
        .otherwise(F.array_join("a", " "))
        .alias("input_text"),
    )


# --- curriculum ordering -------------------------------------------------------------
CURRICULUM_BUCKETS = 8


@query(
    "pipeline_curriculum_order",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> x <> '') AS a
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             CAST(LEAST((len(list_distinct(a)) * {CURRICULUM_BUCKETS})
                        // GREATEST(len(a), 1),
                        {CURRICULUM_BUCKETS} - 1) AS BIGINT) AS difficulty
      FROM f
    )
    SELECT CAST(row_number() OVER (
             ORDER BY difficulty,
                      md5('curr:' || CAST(doc_id AS VARCHAR)),
                      doc_id) AS BIGINT) AS position,
           doc_id, difficulty
    FROM scored
    """,
)
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for LM pretraining (easy→hard scheduling,
    Bengio et al. 2009's curriculum applied to corpus ordering):
    difficulty = lexical diversity (distinct-token ratio, quantized to
    {k} integer buckets — exact fixed point), documents stream in
    ascending difficulty with a deterministic md5 shuffle INSIDE each
    bucket (so each phase is still i.i.d.-ish, the standard curriculum
    construction).

    The global position comes from ``global_row_number_lazy`` with a
    COMPOSITE bucket: difficulty (the order's leading key) sub-divided
    by a 4096-way md5 band (the next 3 hex chars of the in-bucket
    shuffle key — lexicographic hex order IS its numeric order, so the
    composite stays monotone in the full sort order).  {k}·4096 evenly
    loaded buckets keep the per-bucket window a ~1/32768 slice of the
    corpus at any scale (a bare difficulty bucket capped parallelism
    at {k} — review catch), with ZERO driver actions: construction
    stays pure."""
    from ..operators.ranking import global_row_number_lazy

    docs = fanout(tbl(spark, sf_dir, "documents")).select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "").alias(
            "a"
        ),
    )
    # r10 (guide §2.4): the lazy rank consumes its input twice (bucket
    # counts + main pass) — without the checkpoint the tokenize +
    # array_distinct subtree ran once per consumer; the checkpointed
    # frame is 2 longs/doc.  fanout spreads the single-row-group scan
    # so the distinct-ratio HOF work isn't serialized on 2 tasks.
    scored = docs.select(
        "doc_id",
        F.least(
            F.expr(
                f"(size(array_distinct(a)) * {CURRICULUM_BUCKETS})"
                " div greatest(size(a), 1)"
            ),
            F.lit(CURRICULUM_BUCKETS - 1),
        )
        .cast("long")
        .alias("difficulty"),
    ).transform(shared_plan)
    shuffle_key = F.md5(
        F.concat(F.lit("curr:"), F.col("doc_id").cast("string"))
    )
    band = F.conv(F.substring(shuffle_key, 1, 3), 16, 10).cast("long")
    ranked = global_row_number_lazy(
        scored,
        [shuffle_key, F.col("doc_id")],
        bucket=F.col("difficulty") * 4096 + band,
        rn_col="position",
    )
    return ranked.select(
        F.col("position").cast("long").alias("position"),
        "doc_id",
        "difficulty",
    )


# --- length-bucketed batching report -------------------------------------------------
LB_BATCH = 32  # sequences per training batch


@query(
    "pipeline_length_buckets",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             len(COALESCE(list_filter(
               regexp_split_to_array(lower(text), '\\s+'),
               x -> x <> ''), [])) AS n
      FROM documents
    ),
    banded AS (
      SELECT doc_id, n,
             CAST(FLOOR(LOG2(GREATEST(n, 1))) AS BIGINT) AS band
      FROM toks
    ),
    stats AS (
      SELECT band,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n) AS BIGINT) AS band_tokens,
             CAST(MAX(n) AS BIGINT) AS max_len,
             CAST((COUNT(*) + {LB_BATCH} - 1) // {LB_BATCH} AS BIGINT)
               AS n_batches
      FROM banded GROUP BY band
    )
    SELECT band, n_docs, band_tokens, max_len, n_batches,
           CAST((1000000 * (n_batches * {LB_BATCH} * max_len - band_tokens))
                // NULLIF(n_batches * {LB_BATCH} * max_len, 0) AS BIGINT)
             AS padding_waste_ppm
    FROM stats
    """,
)
def pipeline_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching report — the efficiency audit behind
    bucketed batching (group sequences of similar length so each
    training batch pads to its bucket's max, not the corpus max): per
    log2 length band, the document/token volume, the
    {b}-sequences-per-batch batch count, and the exact padding-waste
    fraction (ppm, integer arithmetic) if every batch pads to the
    band's max length.  Comparing waste across band granularities is
    how a pipeline picks its bucketing.

    One scan + one {B}-row aggregate: the tokenize/length projection is
    row-local and the band count is bounded (log2 of the longest doc),
    so the report costs a single map-side-combinable pass at any
    corpus size.

    CAVEAT (exactness): floor(log2(n)) uses FLOAT log2 on both engines
    — exact at powers of two and everywhere else for n < 2^40 because
    log2 of an exactly-representable small integer is computed on the
    same IEEE double grid; the band boundary cannot flip between
    engines for token counts this universe produces."""
    # NULL text coalesces to the empty token array (the module's FIM
    # contract: a NULL array poisons size() to -1 and diverges from the
    # oracle's NULL-ignoring aggregates — review catch)
    toks = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.coalesce(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != ""),
                F.array().cast("array<string>"),
            )
        ).cast("long").alias("n"),
    )
    banded = toks.select(
        "doc_id",
        "n",
        F.floor(F.log2(F.greatest("n", F.lit(1)))).cast("long").alias("band"),
    )
    stats = banded.groupBy("band").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").cast("long").alias("band_tokens"),
        F.max("n").alias("max_len"),
        F.expr(f"CAST((count(1) + {LB_BATCH} - 1) div {LB_BATCH} AS BIGINT)")
        .alias("n_batches"),
    )
    cap = F.col("n_batches") * LB_BATCH * F.col("max_len")
    return stats.select(
        "band",
        "n_docs",
        "band_tokens",
        "max_len",
        "n_batches",
        # NULLIF: an all-empty band has max_len 0 — both engines must
        # agree on NULL waste, not Spark-NULL vs DuckDB division error
        F.expr(
            f"CAST((1000000 * (n_batches * {LB_BATCH} * max_len - band_tokens))"
            f" div NULLIF(n_batches * {LB_BATCH} * max_len, 0) AS BIGINT)"
        ).alias("padding_waste_ppm"),
    )


# --- token-budget allocation ----------------------------------------------------------
TB_BUDGET_DEN = 2   # budget = total_tokens div 2
TB_CAP_DEN = 4      # per-source cap = budget div 4 (anti-domination)


@query(
    "pipeline_token_budget",
    oracle=f"""
    WITH toks AS (
      SELECT source,
             CAST(SUM(len(COALESCE(list_filter(
               regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''),
               []))) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total FROM toks)
    SELECT source, tokens,
           CAST((1000000 * tokens) // total AS BIGINT) AS share_ppm,
           LEAST(tokens,
                 (total // {TB_BUDGET_DEN}) // {TB_CAP_DEN},
                 CAST((CAST(tokens AS HUGEINT) * (total // {TB_BUDGET_DEN}))
                      // total AS BIGINT))
             AS alloc_tokens,
           tokens > (total // {TB_BUDGET_DEN}) // {TB_CAP_DEN} AS capped
    FROM toks, tot
    """,
)
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation across sources — the quota step of a
    Chinchilla-style data plan (fix a total training-token budget, give
    each source its proportional share, and CAP any single source so
    no domain dominates): budget = total div {bd}, per-source cap =
    budget div {cd}, allocation = min(available, cap, proportional
    share) — every quantity exact integer division, so the plan is
    bit-identical on any engine and any partitioning.  The single-pass
    min(avail, cap, prop) form deliberately UNDER-spends rather than
    iteratively re-distributing capped surplus (waterfilling) — a
    pipeline re-runs the allocator on the residual budget when it
    wants the next tranche, keeping every tranche reproducible.

    One scan + one source-cardinality aggregate + a broadcast 1-row
    total."""
    toks = (
        tbl(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(
                F.size(
                    F.coalesce(
                        F.filter(
                            F.split(F.lower("text"), r"\s+"),
                            lambda x: x != "",
                        ),
                        F.array().cast("array<string>"),
                    )
                ).cast("long")
            ).alias("tokens")
        )
    )
    tot = toks.agg(F.sum("tokens").cast("long").alias("total"))
    j = toks.crossJoin(F.broadcast(tot))
    budget = F.expr(f"total div {TB_BUDGET_DEN}")
    cap = F.expr(f"(total div {TB_BUDGET_DEN}) div {TB_CAP_DEN}")
    # DECIMAL(38,0) product: tokens * budget exceeds int64 once the
    # corpus passes ~4e9 tokens (review catch — the docstring's
    # bit-identical claim must hold at corpus scale; the oracle uses
    # HUGEINT for the same product)
    prop = F.expr(
        f"CAST((CAST(tokens AS DECIMAL(38,0))"
        f" * (total div {TB_BUDGET_DEN})) div total AS BIGINT)"
    )
    return j.select(
        "source",
        "tokens",
        F.expr("CAST((1000000 * tokens) div total AS BIGINT)").alias(
            "share_ppm"
        ),
        F.least(F.col("tokens"), cap, prop).alias("alloc_tokens"),
        (F.col("tokens") > cap).alias("capped"),
    )


# --- temperature-based mixture sampling (mC4 / XLM-R alpha rule) ----------------
#
# Multilingual/multi-source pretraining corpora are rebalanced with
# q_i ∝ p_i^alpha (Conneau & Lample 2019; Conneau et al. 2020 "XLM-R"
# sec. 3.1; mC4 in Xue et al. 2021): temperature alpha < 1 upsamples
# the tail without letting the head drown it.  alpha = 1/2 here so the
# weight is sqrt(n) — IEEE sqrt is CORRECTLY ROUNDED, so both engines
# compute the identical double and the q4 quantization below is exact
# cross-engine (the ln/pow route is not bit-stable; see ARCHITECTURE
# "numeric determinism").  Keep decisions use a 16-bit md5 coin (the
# _hex4_sql idiom; modulus 65536 literal on both sides).


@query(
    "pipeline_temperature_mixture",
    oracle=f"""
    WITH per_source AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    wts AS (
      SELECT source, n_docs,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 10000) AS BIGINT)
               AS w_q4
      FROM per_source
    ),
    tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS n_tot,
             CAST(SUM(w_q4) AS BIGINT) AS w_tot
      FROM wts
    ),
    ref AS (
      SELECT n_docs AS n_ref, w_q4 AS w_ref
      FROM wts ORDER BY n_docs, source LIMIT 1
    ),
    shares AS (
      SELECT source, n_docs, w_q4,
             (1000000 * n_docs) // n_tot AS nat_ppm,
             (1000000 * w_q4) // w_tot AS share_ppm,
             CAST((CAST(1000000 AS HUGEINT) * w_q4 * n_ref)
                  // (CAST(w_ref AS HUGEINT) * n_docs) AS BIGINT)
               AS keep_ppm
      FROM wts, tot, ref
    ),
    kept AS (
      SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM documents d JOIN shares s USING (source)
      WHERE {_hex4_sql('d.text')} * 1000000 < s.keep_ppm * 65536
      GROUP BY d.source
    )
    SELECT s.source AS source, s.n_docs, s.w_q4, s.nat_ppm, s.share_ppm,
           s.keep_ppm, COALESCE(k.n_kept, 0) AS n_kept
    FROM shares s LEFT JOIN kept k USING (source)
    """,
)
def pipeline_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha = 1/2) mixture plan + its deterministic
    one-pass realization.

    Plan: per-source weight w = floor(sqrt(n)·1e4) (q4 fixed point,
    exact cross-engine), temperature share share_ppm = 1e6·w // Σw
    next to the natural share.  Realization by DOWNSAMPLING only:
    keep fraction f_i ∝ share_i / n_i, normalized so the largest is 1
    — and since share ∝ sqrt(n), f is maximal at the SMALLEST source,
    so the reference scalar is one ORDER BY n LIMIT 1 over the
    source-cardinality aggregate.  keep_ppm = 1e6·w_i·n_ref //
    (w_ref·n_i) in DECIMAL(38,0) (overflow headroom at corpus scale),
    and each document's keep decision is the md5 content coin under
    the per-source threshold — reproducible across engines, runs,
    partitionings, and incremental re-ingest (the stratified-sample
    contract).  Scale: two corpus passes (count agg + coin filter),
    everything else source-cardinality scalars broadcast back."""
    docs = tbl(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    wts = per_source.select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 10000)
        .cast("long")
        .alias("w_q4"),
    )
    tot = wts.agg(
        F.sum("n_docs").alias("n_tot"), F.sum("w_q4").alias("w_tot")
    )
    ref = (
        wts.orderBy("n_docs", "source")
        .limit(1)
        .select(F.col("n_docs").alias("n_ref"), F.col("w_q4").alias("w_ref"))
    )
    shares = (
        wts.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ref))
        .select(
            "source",
            "n_docs",
            "w_q4",
            F.expr("(1000000 * n_docs) div n_tot").alias("nat_ppm"),
            F.expr("(1000000 * w_q4) div w_tot").alias("share_ppm"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * w_q4 * n_ref)"
                " div (CAST(w_ref AS DECIMAL(38,0)) * n_docs) AS BIGINT)"
            ).alias("keep_ppm"),
        )
    )
    coin = F.conv(F.substring(F.md5("text"), 1, 4), 16, 10).cast("long")
    kept = (
        docs.select("source", coin.alias("coin"))
        .join(F.broadcast(shares.select("source", "keep_ppm")), "source")
        .filter(F.col("coin") * 1_000_000 < F.col("keep_ppm") * 65536)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return shares.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "w_q4",
        "nat_ppm",
        "share_ppm",
        "keep_ppm",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


# --- UL2 mixture-of-denoisers accounting -----------------------------------------
#
# UL2 (Tay et al. 2022, "UL2: Unifying Language Learning Paradigms")
# trains on a MIXTURE of denoising objectives, each example tagged with
# its paradigm sentinel: R (regular short spans, T5-like), S
# (sequential / prefix-LM: corrupt a suffix), X (extreme: long spans /
# high corruption).  This query is the mixture's deterministic
# assignment + per-paradigm mask accounting: the md5(doc_id) coin
# splits the corpus ~5/16 R, ~5/16 S, 6/16 X; the R/X span rules reuse
# the T5 block algebra (pipeline_span_corruption) at their published
# relative rates (X doubles both the block-selection rate and the span
# length), and S masks the final quarter (suffix prefix-LM).  All
# selection is hash-deterministic and every statistic is an integer,
# so the oracle hash-matches; the transformed text itself is the
# pipeline_span_corruption machinery and is not re-emitted here.
UL2_X_SPAN = 2 * SPAN_LEN  # X-denoiser: double-length spans


@query(
    "pipeline_ul2_mix",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS_SQL} AS a FROM documents
    ),
    tagged AS (
      SELECT doc_id, a, len(a) AS n,
             CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4') THEN 'R'
                  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                       IN ('5','6','7','8','9') THEN 'S'
                  ELSE 'X' END AS denoiser
      FROM t WHERE len(a) > 0
    ),
    stats AS (
      SELECT doc_id, denoiser, n,
             CASE denoiser
               WHEN 'S' THEN n // 4
               WHEN 'R' THEN CAST(list_aggregate(
                 list_transform(range(1, n + 1), i ->
                   CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || '#'
                                  || CAST((i - 1) // {SPAN_BLOCK} AS VARCHAR)),
                                  1, 1) IN ('0','1','2','3')
                             AND (i - 1) % {SPAN_BLOCK} < {SPAN_LEN}
                        THEN 1 ELSE 0 END), 'sum') AS BIGINT)
               ELSE CAST(list_aggregate(
                 list_transform(range(1, n + 1), i ->
                   CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || '#'
                                  || CAST((i - 1) // {SPAN_BLOCK} AS VARCHAR)),
                                  1, 1) IN ('0','1','2','3','4','5','6','7')
                             AND (i - 1) % {SPAN_BLOCK} < {UL2_X_SPAN}
                        THEN 1 ELSE 0 END), 'sum') AS BIGINT)
             END AS n_masked
      FROM tagged
    )
    SELECT doc_id, denoiser,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(n_masked AS BIGINT) AS n_masked,
           (1000000 * n_masked) // n AS mask_ppm
    FROM stats
    """,
)
def pipeline_ul2_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic UL2 R/S/X mixture assignment with per-document
    mask accounting (see the paradigm rules in the block comment).

    Plan: one scan, row-local HOF arithmetic, zero shuffles — the same
    shape at 100 TB; the assignment is a doc_id hash, so a resumed or
    re-sharded job reproduces the identical mixture."""
    t = tbl(spark, sf_dir, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("a")
    )
    n = F.size("a")
    first_hex = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    denoiser = (
        F.when(first_hex.isin("0", "1", "2", "3", "4"), F.lit("R"))
        .when(first_hex.isin("5", "6", "7", "8", "9"), F.lit("S"))
        .otherwise(F.lit("X"))
    )

    def span_masked(i, rate_hexes, span_len):
        b = F.floor((i - 1) / SPAN_BLOCK).cast("int")
        sel = F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit("#"), b.cast("string")
                )
            ),
            1,
            1,
        ).isin(*rate_hexes)
        return F.when(sel & ((i - 1) % SPAN_BLOCK < span_len), 1).otherwise(0)

    idx = F.sequence(F.lit(1), n)
    r_masked = F.aggregate(
        F.transform(idx, lambda i: span_masked(i, list("0123"), SPAN_LEN)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    x_masked = F.aggregate(
        F.transform(idx, lambda i: span_masked(i, list("01234567"), UL2_X_SPAN)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    tagged = t.filter(n > 0).select(
        "doc_id",
        denoiser.alias("denoiser"),
        n.cast("long").alias("n_tokens"),
        F.when(denoiser == "S", F.expr("size(a) div 4").cast("long"))
        .when(denoiser == "R", r_masked)
        .otherwise(x_masked)
        .alias("n_masked"),
    )
    return tagged.select(
        "doc_id",
        "denoiser",
        "n_tokens",
        "n_masked",
        F.expr("(1000000 * n_masked) div n_tokens").alias("mask_ppm"),
    )


# --- FFD (no-split) sequence packing --------------------------------------------------
FFD_SHARD_DOCS = 8192  # docs per packing shard (bounded FFD work unit)


def ffd_assign(lengths: list[int], capacity: int) -> list[int]:
    """First-fit-decreasing bin assignment for an ALREADY
    descending-sorted length list: each item goes to the first bin
    with room, else opens a new bin.  Pure function, factored so the
    hypothesis property test drives the identical core the Spark
    packer runs per shard."""
    remaining: list[int] = []
    assign: list[int] = []
    for n in lengths:
        n = int(n)
        for b, r in enumerate(remaining):
            if r >= n:
                remaining[b] = r - n
                assign.append(b)
                break
        else:
            remaining.append(capacity - n)
            assign.append(len(remaining) - 1)
    return assign


def _ffd_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared shape for the FFD packer + its eval gate: per-(shard,
    bin) totals from a deterministic first-fit-decreasing pack."""
    toks = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.least(
            F.size(_tokens(F.col("text"))).cast("long"),
            F.lit(PACK_CAPACITY),
        ).alias("n_tokens"),
        F.expr(f"doc_id div {FFD_SHARD_DOCS}").alias("shard"),
    )

    def pack(pdf):
        import pandas as pd

        from energy_consumption_forecasting_spark.queries.pipeline_ops import (
            ffd_assign,
        )

        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        assign = ffd_assign(list(pdf["n_tokens"]), PACK_CAPACITY)
        return pd.DataFrame(
            {
                "shard": pdf["shard"].to_numpy(),
                "bin_id": assign,
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_tokens": pdf["n_tokens"].to_numpy(),
            }
        )

    packed = toks.groupBy("shard").applyInPandas(
        pack, "shard long, bin_id long, doc_id long, n_tokens long"
    )
    return packed.groupBy("shard", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query("pipeline_pack_ffd")
def pipeline_pack_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-split sequence packing by first-fit-decreasing — the
    padding-minimizing layout for models that must not cut documents
    (Krell et al. 2021 'efficient sequence packing without
    cross-contamination'; complements pipeline_pack_sequences'
    GPT-style concat-and-split).  Docs are clamped to PACK_CAPACITY,
    sharded by ``doc_id div 8192`` (a deterministic, bounded FFD work
    unit — this is how production packers run: pack per shard in
    parallel, never a global sequential pass), and FFD runs inside
    one Arrow-batched applyInPandas per shard.  Rows-only: the bin
    layout is algorithm-defined; pipeline_pack_ffd_eval pins the
    invariants hash-exactly."""
    return _ffd_bins(spark, sf_dir)


@query(
    "pipeline_pack_ffd_eval",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             LEAST(CAST(len({_TOKENS_SQL}) AS BIGINT), {PACK_CAPACITY})
               AS n_tokens,
             doc_id // {FFD_SHARD_DOCS} AS shard
      FROM documents
    ),
    per_shard AS (
      SELECT shard, SUM(n_tokens) AS shard_tokens,
             CAST(CEIL(CAST(SUM(n_tokens) AS DOUBLE) / {PACK_CAPACITY})
                  AS BIGINT) AS lb
      FROM toks GROUP BY shard
    )
    SELECT CAST((SELECT COUNT(*) FROM toks) AS BIGINT) AS n_docs,
           CAST((SELECT SUM(n_tokens) FROM toks) AS BIGINT) AS total_tokens,
           CAST((SELECT SUM(lb) FROM per_shard) AS BIGINT) AS bins_lower_bound,
           TRUE AS docs_conserved,
           TRUE AS tokens_conserved,
           TRUE AS capacity_ok,
           TRUE AS lower_bound_ok,
           TRUE AS half_full_ok
    """,
)
def pipeline_pack_ffd_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-exact invariants of the FFD pack, re-derived FROM THE
    PACKED OUTPUT (the eval-gate pattern): doc and token totals are
    conserved, no bin exceeds PACK_CAPACITY, per-shard bin counts
    respect the ceil(tokens/capacity) lower bound, and the first-fit
    guarantee holds — AT MOST ONE bin per shard ends less than half
    full (if two were, the later bin's contents would have fit the
    earlier one).  The oracle recomputes the corpus-side numbers
    directly and pins the verdicts TRUE."""
    bins = _ffd_bins(spark, sf_dir)
    toks = tbl(spark, sf_dir, "documents").select(
        F.least(
            F.size(_tokens(F.col("text"))).cast("long"),
            F.lit(PACK_CAPACITY),
        ).alias("n_tokens"),
        F.expr(f"doc_id div {FFD_SHARD_DOCS}").alias("shard"),
    )
    corpus = toks.groupBy("shard").agg(
        F.count("*").alias("c_docs"),
        F.sum("n_tokens").alias("c_tokens"),
        F.ceil(F.sum("n_tokens") / PACK_CAPACITY).cast("long").alias("lb"),
    )
    per_shard = bins.groupBy("shard").agg(
        F.sum("n_docs").alias("p_docs"),
        F.sum("bin_tokens").alias("p_tokens"),
        F.count("*").alias("n_bins"),
        F.max("bin_tokens").alias("max_bin"),
        F.sum(
            F.when(F.col("bin_tokens") < PACK_CAPACITY / 2, 1).otherwise(0)
        ).alias("under_half"),
    )
    j = per_shard.join(corpus, "shard")
    return j.agg(
        F.sum("c_docs").alias("n_docs"),
        F.sum("c_tokens").alias("total_tokens"),
        F.sum("lb").alias("bins_lower_bound"),
        F.min(F.col("p_docs") == F.col("c_docs")).alias("docs_conserved"),
        F.min(F.col("p_tokens") == F.col("c_tokens")).alias(
            "tokens_conserved"
        ),
        F.min(F.col("max_bin") <= PACK_CAPACITY).alias("capacity_ok"),
        F.min(F.col("n_bins") >= F.col("lb")).alias("lower_bound_ok"),
        F.min(F.col("under_half") <= 1).alias("half_full_ok"),
    )
