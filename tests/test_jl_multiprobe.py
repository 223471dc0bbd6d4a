"""Unit invariants for the r10 JL projection and multi-probe LSH.

Parity with the DuckDB oracles is covered by tools/check_parity.py;
these tests pin the algorithmic contracts that parity alone cannot
see: exact sequential-fold arithmetic vs an independent Python loop,
the probe-bucket geometry (Hamming distance, distinctness, lowest-
margin bit selection), and the JL concentration sanity band.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_SMALL


def test_jl_signs_shape_and_balance():
    from energy_consumption_forecasting_spark.queries._jl_signs import JL_SIGNS

    assert len(JL_SIGNS) == 16
    assert all(len(r) == 64 for r in JL_SIGNS)
    assert all(x in (-1, 1) for r in JL_SIGNS for x in r)
    # seeded Bernoulli rows should be near-balanced (no degenerate row)
    for r in JL_SIGNS:
        assert abs(sum(r)) <= 24


def test_jl_projection_matches_sequential_python(spark):
    """The Spark fold and a left-to-right Python loop accumulate in
    the same order -> bit-exact equality, not approximate."""
    from energy_consumption_forecasting_spark.queries._jl_signs import JL_SIGNS
    from energy_consumption_forecasting_spark.queries.similarity import (
        emb_jl_projection,
    )

    rows = emb_jl_projection(spark, SF_SMALL).filter("vec_id = 0").collect()
    assert len(rows) == 16
    import pandas as pd

    v = [
        float(x)
        for x in pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
        .set_index("vec_id")
        .loc[0, "embedding"]
    ]
    for r in rows:
        acc = 0.0
        for x, s in zip(v, JL_SIGNS[r.k]):
            acc = acc + x * float(s)
        assert r.p == acc / 4.0, (r.k, r.p, acc / 4.0)


def test_jl_distortion_band(spark):
    from energy_consumption_forecasting_spark.queries.similarity import (
        emb_jl_distortion,
    )

    rows = emb_jl_distortion(spark, SF_SMALL).collect()
    assert len(rows) == 32 * 31 // 2
    ratios = [r.ratio for r in rows if r.ratio is not None]
    assert all(r > 0 for r in ratios)
    # E[ratio] = 1 for the +-1/sqrt(k) ensemble; the sample mean over
    # 496 pairs concentrates well inside [0.6, 1.6] at k=16
    mean = sum(ratios) / len(ratios)
    assert 0.6 < mean < 1.6, mean
    # the registered band is a loose outlier screen, not a tight bound
    assert sum(r.within_jl_band for r in rows) >= 0.9 * len(rows)


def _bits(v, planes):
    return [
        1 if sum(x * p for x, p in zip(v, row)) >= 0 else 0 for row in planes
    ]


def test_multiprobe_probe_geometry(spark):
    """Every emitted neighbor's bucket is within Hamming distance 2 of
    its query's bucket, and probe_id encodes WHICH low-margin bits
    differ (0 = same bucket, 1/2 = one flipped bit, 3 = both)."""
    import pandas as pd

    from energy_consumption_forecasting_spark.queries._lsh_planes import PLANES
    from energy_consumption_forecasting_spark.queries.similarity import (
        sim_multiprobe_lsh,
    )

    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet").set_index("vec_id")
    bits = {
        vid: _bits([float(x) for x in row.embedding], PLANES)
        for vid, row in emb.iterrows()
    }
    margins = {
        vid: sorted(
            range(8),
            key=lambda i: (
                abs(
                    sum(
                        float(x) * p
                        for x, p in zip(emb.loc[vid].embedding, PLANES[i])
                    )
                ),
                i,
            ),
        )[:2]
        for vid in (0, 1, 2, 3, 4)
    }

    rows = sim_multiprobe_lsh(spark, SF_SMALL).collect()
    assert rows, "multiprobe returned nothing at sf0.001"
    for r in rows:
        qb, nb = bits[r.query_id], bits[r.neighbor_id]
        diff = {i for i in range(8) if qb[i] != nb[i]}
        i1, i2 = margins[r.query_id]
        expected = [set(), {i1}, {i2}, {i1, i2}][r.probe_id]
        assert diff == expected, (r.query_id, r.neighbor_id, r.probe_id, diff)
        assert 1 <= r.topk_rank <= 5


def test_multiprobe_dominates_single_bucket(spark):
    """Multi-probe candidates are a SUPERSET of same-bucket candidates,
    so after the top-5 cut the i-th best multiprobe cosine must be >=
    the i-th best single-bucket cosine for every query (a base
    candidate can be displaced from the top-5 only by something
    strictly better from a flipped bucket)."""
    from pyspark.sql import functions as F

    from energy_consumption_forecasting_spark.queries.similarity import (
        sim_lsh_hyperplane,
        sim_multiprobe_lsh,
    )

    mp_rows = sim_multiprobe_lsh(spark, SF_SMALL).collect()
    mp = {}
    for r in mp_rows:
        mp.setdefault(r.query_id, []).append((r.topk_rank, r.cos_sim))
    base = sim_lsh_hyperplane(spark, SF_SMALL).filter(
        (F.col("vec_a") < 5) | (F.col("vec_b") < 5)
    )
    base_cands: dict[int, list[float]] = {q: [] for q in range(5)}
    for r in base.collect():
        if r.vec_a < 5:
            base_cands[r.vec_a].append(r.cos_sim)
        if r.vec_b < 5:
            base_cands[r.vec_b].append(r.cos_sim)
    for q in range(5):
        bc = sorted(base_cands[q], reverse=True)[:5]
        mc = [c for _, c in sorted(mp.get(q, []))]
        assert len(mc) >= len(bc), (q, len(mc), len(bc))
        for i, c in enumerate(bc):
            assert mc[i] >= c - 1e-12, (q, i, mc[i], c)


def test_token_entropy_matches_python(spark):
    import math as m

    import pandas as pd

    from energy_consumption_forecasting_spark.queries.text import (
        text_token_entropy,
    )

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    got = {
        r.doc_id: r
        for r in text_token_entropy(spark, SF_SMALL).collect()
    }
    assert len(got) == len(docs)
    for _, row in docs.head(20).iterrows():
        toks = [t for t in row.text.lower().split() if t]
        n = len(toks)
        from collections import Counter

        cnt = Counter(toks)
        ent = m.log(n) - sum(c * m.log(c) for c in cnt.values()) / n
        r = got[row.doc_id]
        assert r.n_tokens == n and r.n_types == len(cnt)
        assert r.entropy == pytest.approx(ent, abs=1e-8)
        assert r.ttr == pytest.approx(len(cnt) / n, abs=1e-8)


def test_multiprobe_recall_invariant(spark):
    """hits_multi >= hits_single per query (candidate superset +
    displacement-only-by-true-neighbors), truth_k == 5."""
    from energy_consumption_forecasting_spark.queries.similarity import (
        sim_multiprobe_recall,
    )

    rows = sim_multiprobe_recall(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.truth_k == 5
        assert 0 <= r.hits_single <= r.hits_multi <= 5


def test_jl_rerank_exact_on_pool(spark):
    """Stage-2 cosines are the exact 64-dim values: for every emitted
    (query, neighbor) the cos_exact matches a sequential Python fold,
    and ranks are 1..5 without gaps."""
    import pandas as pd

    from energy_consumption_forecasting_spark.queries.similarity import (
        sim_jl_rerank_topk,
    )

    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet").set_index("vec_id")

    def seq_cos(a, b):
        d = n1 = n2 = 0.0
        for x, y in zip(a, b):
            x, y = float(x), float(y)
            d += x * y
            n1 += x * x
            n2 += y * y
        return d / (math.sqrt(n1) * math.sqrt(n2))

    rows = sim_jl_rerank_topk(spark, SF_SMALL).collect()
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.topk_rank)
        got = seq_cos(emb.loc[r.query_id].embedding, emb.loc[r.neighbor_id].embedding)
        assert r.cos_exact == pytest.approx(got, abs=1e-12)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)


def test_source_divergence_matches_python(spark):
    """KL and TVD per source vs an independent Python computation
    (Counter-based), plus the distribution-theory invariants:
    KL >= 0, 0 <= TVD <= 1, token totals partition the corpus."""
    from collections import Counter

    import pandas as pd

    from energy_consumption_forecasting_spark.queries.text import (
        text_source_divergence,
    )

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    corpus = Counter()
    per_src: dict[str, Counter] = {}
    for _, row in docs.iterrows():
        toks = [t for t in row.text.lower().split() if t]
        corpus.update(toks)
        per_src.setdefault(row.source, Counter()).update(toks)
    n_corpus = sum(corpus.values())

    rows = {r.source: r for r in text_source_divergence(spark, SF_SMALL).collect()}
    assert set(rows) == set(per_src)
    assert sum(r.n_tokens for r in rows.values()) == n_corpus
    for src, cnt in per_src.items():
        n_s = sum(cnt.values())
        kl = sum(
            (c / n_s) * math.log((c * n_corpus) / (n_s * corpus[w]))
            for w, c in cnt.items()
        )
        tv_present = sum(
            abs(c / n_s - corpus[w] / n_corpus) for w, c in cnt.items()
        )
        pc_present = sum(corpus[w] / n_corpus for w in cnt)
        tvd = 0.5 * (tv_present + (1.0 - pc_present))
        r = rows[src]
        assert r.n_tokens == n_s and r.n_types == len(cnt)
        assert r.kl_vs_corpus == pytest.approx(kl, abs=1e-7)
        assert r.kl_vs_corpus >= -1e-9
        assert r.tvd_vs_corpus == pytest.approx(tvd, abs=1e-7)
        assert -1e-9 <= r.tvd_vs_corpus <= 1.0 + 1e-9


def test_periodogram_matches_python(spark):
    """power_frac per period vs an independent numpy DFT on the same
    centered daily series; weekly ordinate dominates annual on this
    short fixture only if the data says so — we assert the values,
    not a shape."""
    import numpy as np
    import pandas as pd

    from energy_consumption_forecasting_spark.queries.quality import (
        ts_periodogram,
    )

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    daily = (
        ev.assign(d=pd.to_datetime(ev.ts).dt.date)
        .groupby("d")["value"]
        .apply(lambda s: int(round(sum(round(float(v) * 100) for v in s))))
        .sort_index()
    )
    # exact centering mirror: c_t = n*v_t - total (scaled residual)
    n = len(daily)
    tot = daily.sum()
    c = (n * daily - tot).astype(float).values
    t = np.array(
        [(d - daily.index[0]).days for d in daily.index], dtype=float
    )
    den = float((c * c).sum())
    got = {r.period: r for r in ts_periodogram(spark, SF_SMALL).collect()}
    assert set(got) == {7, 30, 91, 365}
    for T in (7, 30, 91, 365):
        ang = 6.283185307179586 * t / float(T)
        sc, ss = float((c * np.cos(ang)).sum()), float((c * np.sin(ang)).sum())
        want = (sc * sc + ss * ss) / (n * den)
        r = got[T]
        assert r.n_days == n
        assert r.power_frac == pytest.approx(want, abs=1e-7)
        assert 0.0 <= r.power_frac <= 2.0
