"""Deterministic HLL: accuracy vs exact, mergeability, plan shape."""

import __spark_entry__ as em
from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators import sketch
from lightcurvesclassifier_spark.sources import testdata
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_hll_estimate_within_error_bound(spark):
    docs = testdata.load_table(spark, SF_ORACLE, "documents")
    est = sketch.hll_distinct(docs, n=3).collect()[0].distinct_est
    exact = (
        docs.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(F.split("text", " ")) - 2),
                    lambda i: F.array_join(
                        F.slice(F.split("text", " "), i, 3), " "
                    ),
                )
            ).alias("s")
        )
        .distinct()
        .count()
    )
    # m=256 → σ ≈ 6.5 %; assert within 3σ
    assert abs(est - exact) / exact < 0.2, (est, exact)


def test_hll_registers_merge_composes(spark):
    """Union two halves' registers with max-per-bucket == whole-corpus
    registers — the property that makes the sketch shardable."""
    docs = testdata.load_table(spark, SF_ORACLE, "documents")
    lo = docs.filter(F.col("doc_id") % 2 == 0)
    hi = docs.filter(F.col("doc_id") % 2 == 1)
    merged = (
        sketch.hll_registers(lo, n=3)
        .unionByName(sketch.hll_registers(hi, n=3))
        .groupBy("bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    whole = sketch.hll_registers(docs, n=3)
    got = {(r.bucket, r.max_rank) for r in merged.collect()}
    want = {(r.bucket, r.max_rank) for r in whole.collect()}
    assert got == want


def test_hll_small_range_uses_linear_counting(spark):
    # 31-token vocabulary at n=1 → V>0 → the linear-counting branch;
    # the estimate must still be close for tiny cardinalities
    docs = testdata.load_table(spark, SF_ORACLE, "documents")
    row = sketch.hll_distinct(docs, n=1).collect()[0]
    exact = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .count()
    )
    assert row.n_registers < 256
    assert abs(row.distinct_est - exact) / exact < 0.25, (row, exact)


def test_hll_registers_plan_single_shuffle_no_python(spark):
    plan = (
        em.queries()["hll_registers"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one aggregate exchange (the 256-key register groupBy); the only
    # other allowed exchange is the r6 expansion-aware spread of the
    # single-partition local scan (REPARTITION_BY_NUM, a no-op at scale)
    agg_ex = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "REPARTITION_BY_NUM" not in ln
    ]
    assert len(agg_ex) == 1, plan
    assert "Python" not in plan


def test_hll_grouped_rollup_composes_to_global(spark):
    """Grouped registers are a true rollup level: max-merging the
    per-lang register tables over (bucket) reproduces the GLOBAL
    register table exactly, hence the global estimate — the
    hierarchy-rollup property that makes the sketch usable at 100 TB.
    Per-group estimates land within the ~6.5% HLL error of exact."""
    docs = testdata.load_table(spark, SF_ORACLE, "documents")
    grouped = sketch.hll_grouped(docs, "lang", n=3).toPandas()
    exact = (
        docs.select(
            "lang",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(F.split("text", " ")) - 2),
                    lambda i: F.array_join(
                        F.slice(F.split(F.col("text"), " "), i, 3), " "
                    ),
                )
            ).alias("term"),
        )
        .groupBy("lang")
        .agg(F.count_distinct("term").alias("n"))
        .toPandas()
        .set_index("lang")["n"]
    )
    for _, r in grouped.iterrows():
        rel = abs(r.distinct_est - exact[r.lang]) / exact[r.lang]
        assert rel < 0.2, (r.lang, r.distinct_est, exact[r.lang], rel)

    # register-level composability: per-group regs max-merged == global
    from lightcurvesclassifier_spark.operators.dedup import _ngram_rows

    terms = _ngram_rows(
        docs, 3, "text", "lang",
        key_fn=lambda s: s, empty_type="string", out_col="term",
        distinct=False,
    )
    from lightcurvesclassifier_spark.operators.sketch import _hll_parts

    bucket, rank = _hll_parts(F.col("term"))
    per_group = (
        terms.select(F.col("lang"), bucket.alias("bucket"), rank.alias("rank"))
        .groupBy("lang", "bucket")
        .agg(F.max("rank").alias("max_rank"))
    )
    merged = (
        per_group.groupBy("bucket").agg(F.max("max_rank").alias("max_rank"))
        .toPandas().set_index("bucket").sort_index()
    )
    global_regs = (
        sketch.hll_registers(docs, n=3).toPandas()
        .set_index("bucket").sort_index()
    )
    assert merged.equals(global_regs)
    est_merged = sketch.hll_estimate(
        sketch.hll_registers(docs, n=3)
    ).toPandas()
    assert len(est_merged) == 1


def test_cms_never_underestimates_and_bounds_overshoot(spark):
    docs = testdata.load_table(spark, SF_ORACLE, "documents")
    est = sketch.cms_point_estimates(docs, n=2).toPandas()
    exact = (
        docs.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(F.split("text", " ")) - 1),
                    lambda i: F.array_join(
                        F.slice(F.split("text", " "), i, 2), " "
                    ),
                )
            ).alias("term")
        )
        .groupBy("term")
        .count()
        .toPandas()
    )
    j = est.merge(exact, on="term")
    assert len(j) == len(est)
    assert (j.est >= j["count"]).all()
    n_stream = exact["count"].sum()
    # CMS guarantee: overshoot <= e*N/w with prob 1-e^-d; assert the
    # loose deterministic-ish bound 3*e*N/w on the max
    import math

    assert (j.est - j["count"]).max() <= 3 * math.e * n_stream / sketch.CMS_W


def test_cms_counters_merge_composes(spark):
    docs = testdata.load_table(spark, SF_ORACLE, "documents")
    lo = docs.filter(F.col("doc_id") % 2 == 0)
    hi = docs.filter(F.col("doc_id") % 2 == 1)
    merged = (
        sketch.cms_counters(lo, n=2)
        .unionByName(sketch.cms_counters(hi, n=2))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = sketch.cms_counters(docs, n=2)
    got = {(r.row, r.col, r.cnt) for r in merged.collect()}
    want = {(r.row, r.col, r.cnt) for r in whole.collect()}
    assert got == want


def test_cms_probe_is_join_free_literal_lookup(spark):
    """r10 shape: the probe side is map-only after the term DISTINCT —
    the ≤ d·w counter table rides the plan as a constant-folded array
    literal, so there is no join, no probe explode, and exactly one
    exchange (the distinct)."""
    plan = (
        em.queries()["cms_point_est"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    # exactly ONE Generate: the n-gram tokenizer explode — the 4-way
    # probe-coordinate explode of the join form is gone
    assert plan.count("Generate") == 1, plan
    assert "Python" not in plan


def test_cms_point_lookup_equals_join(spark):
    """The literal-lookup estimate must equal the broadcast-join +
    min(cnt) baseline row for row (every coordinate of every distinct
    term is in the counter table by construction, so the join never
    misses and min == least-of-lookups)."""
    docs = testdata.load_table(spark, SF_ORACLE, "documents")
    fast = sketch.cms_point_estimates(docs, n=2).toPandas()
    join = sketch.cms_point_estimates_join(docs, n=2).toPandas()
    fast = fast.sort_values("term").reset_index(drop=True)
    join = join.sort_values("term").reset_index(drop=True)
    assert fast.equals(join)


def test_bloom_no_false_negatives_and_low_fp(spark):
    """Soundness: every doc that truly shares a 5-gram with the eval
    set must have maybe_frac > 0 covering those shingles; docs sharing
    nothing should probe near zero (FP ≈ 0.1 % at m=16384)."""
    docs = testdata.load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", "text"
    )
    ev = testdata.contamination_eval(spark, SF_ORACLE)
    probe = sketch.bloom_probe(docs, ev, n=5).toPandas().set_index("doc_id")

    # ground truth via exact shingle join
    from lightcurvesclassifier_spark.operators.dedup import _ngram_rows

    tr = _ngram_rows(
        docs, 5, "text", "doc_id",
        key_fn=lambda s: s, empty_type="string", out_col="shingle",
    )
    evs = _ngram_rows(
        ev, 5, "text", "doc_id",
        key_fn=lambda s: s, empty_type="string", out_col="shingle",
    ).select("shingle").distinct()
    truth = (
        tr.join(evs, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_true"))
        .toPandas()
        .set_index("doc_id")
    )
    for doc_id, row in truth.iterrows():
        assert probe.loc[doc_id, "n_maybe"] >= row.n_true, doc_id
    clean = probe.drop(index=truth.index)
    # false-positive shingle fraction across clean docs stays tiny
    fp_rate = clean.n_maybe.sum() / clean.n_shingles.sum()
    assert fp_rate < 0.01, fp_rate


def test_bloom_exploded_bits_match_definitional_array(spark):
    """The staged production plan (_exploded_bits: md5 hex → (h1, h2)
    columns → k-element array, one digest per term) must emit exactly
    the positions of the definitional _bloom_bit_array formula — pins
    the Kirsch–Mitzenmacher factoring against silent drift."""
    terms = spark.createDataFrame(
        [(i, f"term {i} x") for i in range(50)], "doc_id long, t string"
    )
    staged = (
        sketch._exploded_bits(terms, "t", ["doc_id"])
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("bit")).alias("bits"))
    )
    definitional = terms.select(
        "doc_id",
        F.sort_array(sketch._bloom_bit_array(F.col("t"))).alias("bits"),
    )
    s = staged.toPandas().set_index("doc_id").sort_index()
    d = definitional.toPandas().set_index("doc_id").sort_index()
    for i in s.index:
        assert list(s.loc[i, "bits"]) == list(d.loc[i, "bits"]), i
        # odd stride on power-of-two m ⇒ pairwise-distinct positions
        assert len(set(s.loc[i, "bits"])) == sketch.BLOOM_K


def test_bloom_merge_is_bit_union(spark):
    ev = testdata.contamination_eval(spark, SF_ORACLE)
    lo = ev.filter(F.col("doc_id") % 2 == 0)
    hi = ev.filter(F.col("doc_id") % 2 == 1)
    merged = (
        sketch.bloom_bits(lo).unionByName(sketch.bloom_bits(hi)).distinct()
    )
    whole = sketch.bloom_bits(ev)
    assert {r.bit for r in merged.collect()} == {
        r.bit for r in whole.collect()
    }


def test_bloom_probe_plan_broadcasts_filter_no_python(spark):
    plan = (
        em.queries()["bloom_probe"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "Python" not in plan


def test_bloom_probe_fast_equals_join_form_and_is_map_only(spark):
    docs = testdata.load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", "text"
    )
    ev = testdata.contamination_eval(spark, SF_ORACLE)
    slow = sketch.bloom_probe(docs, ev, n=5).toPandas()
    fast = sketch.bloom_probe_fast(docs, ev, n=5).toPandas()
    cols = sorted(slow.columns)
    s = slow[cols].sort_values("doc_id").reset_index(drop=True)
    f = fast[cols].sort_values("doc_id").reset_index(drop=True)
    assert s.equals(f)
    plan = (
        em.queries()["bloom_probe_fast"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly ONE exchange allowed: the documented expansion-aware
    # input spread (keyed on doc_id, volume = input rows, a no-op at
    # real scale).  No broadcast, no aggregate/join exchange — the
    # probe itself stays map-only.
    assert plan.count("Exchange") <= 1, plan
    assert "BroadcastExchange" not in plan
    assert "Python" not in plan


def test_bloom_probe_fast_rejects_over_budget_bitmap(spark, monkeypatch):
    """Raising BLOOM_M past the documented codegen-literal budget must
    fail loudly and point at the join-based bloom_probe fallback — the
    one way the otherwise-bounded plan literal could grow unbounded."""
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    monkeypatch.setattr(sketch, "BLOOM_M", sketch.BLOOM_FAST_MAX_M + 1)
    with _pytest.raises(ValueError, match="bloom_probe"):
        sketch.bloom_probe_fast(docs, docs, n=5)


def test_histogram_quantiles_within_bin_width_of_exact(spark):
    docs = testdata.load_table(spark, SF_ORACLE, "documents")
    from lightcurvesclassifier_spark.operators import text

    scored = text.quality_features(docs).select(
        "doc_id", F.col("stopword_ratio").alias("score")
    )
    approx = (
        sketch.histogram_quantiles(scored, "score", n_quantiles=10)
        .toPandas()
        .sort_values("q")
    )
    assert list(approx.q) == list(range(1, 10))
    # the sketch's guarantee is one bin width vs the ORDER-STATISTIC
    # quantile (the ceil(qN/10)-th smallest value); the interpolated
    # percentile() can sit farther away on tied/discrete data
    vals = sorted(r.score for r in scored.select("score").collect())
    n = len(vals)
    lo, hi = vals[0], vals[-1]
    bin_w = (hi - lo) / sketch.HISTQ_BINS
    import math

    for q, b in zip(approx.q, approx.boundary):
        kth = vals[math.ceil(n * q / 10) - 1]
        assert abs(b - kth) <= bin_w + 1e-6, (q, b, kth)


def test_histogram_quantiles_degenerate_constant_column(spark):
    df = spark.createDataFrame(
        [(i, 3.5) for i in range(20)], "doc_id long, score double"
    )
    out = sketch.histogram_quantiles(df, "score", n_quantiles=4).toPandas()
    # all mass in bin 0; every boundary is the (degenerate) upper edge
    assert list(sorted(out.q)) == [1, 2, 3]
    assert (out.boundary == 3.5).all()


def test_histogram_quantiles_ignores_null_scores(spark):
    rows = [(i, None) for i in range(5)] + [
        (10 + i, float(i + 1)) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = sketch.histogram_quantiles(df, "score", n_quantiles=4).toPandas()
    assert out.boundary.notna().all()
    # boundaries derive from the 5 non-null values only
    assert out.boundary.min() >= 1.0 and out.boundary.max() <= 5.0 + 1e-3


def test_grouped_quantiles_match_per_group_global_sketch(spark):
    """Each group's boundaries equal running the global sketch on that
    group alone — per-key composition is exact."""
    docs = testdata.load_table(spark, SF_ORACLE, "documents")
    from lightcurvesclassifier_spark.operators.text import stopword_ratio

    scored = docs.select(
        "lang", F.round(stopword_ratio(F.col("text")), 6).alias("score")
    )
    grouped = sketch.grouped_histogram_quantiles(
        scored, "lang", "score", n_quantiles=4
    ).toPandas()
    langs = [r.lang for r in scored.select("lang").distinct().collect()]
    assert set(grouped.lang) == set(langs)
    for lang in langs:
        solo = sketch.histogram_quantiles(
            scored.filter(F.col("lang") == lang), "score", n_quantiles=4
        ).toPandas()
        g = grouped[grouped.lang == lang].sort_values("q").reset_index(
            drop=True
        )[["q", "boundary"]]
        s = solo.sort_values("q").reset_index(drop=True)
        assert g.equals(s), (lang, g, s)


def test_cms_heavy_hitters_equals_exact_and_prunes(spark):
    """The sketch stage is a pure PRUNE: the candidate set (CMS est >=
    phi*N) is a superset of the true heavy hitters, and the verified
    output equals the exact phi-frequent set."""
    docs = testdata.load_table(spark, SF_ORACLE, "documents")
    out = sketch.cms_heavy_hitters(docs, phi=0.02, n=1).toPandas()
    # exact reference computed directly
    toks = docs.select(F.explode(F.split("text", " ")).alias("term"))
    total = toks.count()
    exact = (
        toks.groupBy("term").count()
        .filter(F.col("count") >= 0.02 * total)
        .toPandas()
    )
    assert set(out["term"]) == set(exact["term"])
    m = out.merge(exact, on="term")
    assert (m["cnt"] == m["count"]).all()
    # the rare planted token must NOT appear
    assert "dup" not in set(out["term"])
    # freq is the rounded exact ratio
    for _, r in m.iterrows():
        assert abs(r["freq"] - round(r["cnt"] / total, 6)) < 1e-12


def test_cms_heavy_hitters_catches_borderline_phi(spark):
    """phi at the uniform-vocabulary frequency keeps every uniform term;
    a phi above it empties the result (no false positives survive the
    exact verify even though CMS overestimates)."""
    docs = testdata.load_table(spark, SF_SMOKE, "documents")
    hi = sketch.cms_heavy_hitters(docs, phi=0.2, n=1)
    assert hi.count() == 0
