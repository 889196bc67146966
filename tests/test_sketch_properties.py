"""Property-based sketch invariants over randomized corpora (hypothesis
drives the corpus shapes; the Spark session is reused per test run).

These pin the *mathematical* guarantees — CMS never underestimates,
HLL/CMS/Bloom merge exactly, Bloom never false-negatives — on inputs
the fixed-fixture tests don't reach (empty docs, 1-token docs, heavy
duplication, unicode-ish tokens)."""

import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators import sketch

# compact token alphabet → heavy collisions/duplication by construction
_token = st.sampled_from(["a", "bb", "ccc", "Ж", "—", "z9"])
_doc = st.lists(_token, min_size=0, max_size=8).map(" ".join)
_corpus = st.lists(_doc, min_size=0, max_size=12)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, docs):
    if not docs:
        return spark.createDataFrame([], "doc_id long, text string")
    return spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )


@given(docs=_corpus)
@_SETTINGS
def test_cms_never_underestimates_property(spark, docs):
    df = _df(spark, docs)
    est = {r.term: r.est for r in sketch.cms_point_estimates(df, n=1).collect()}
    exact = {}
    for d in docs:
        for t in d.split(" "):
            exact[t] = exact.get(t, 0) + 1
    assert set(est) == set(exact)
    for t, c in exact.items():
        assert est[t] >= c, (t, est[t], c)


@given(docs=_corpus)
@_SETTINGS
def test_hll_merge_equals_whole_property(spark, docs):
    df = _df(spark, docs)
    lo = df.filter(F.col("doc_id") % 2 == 0)
    hi = df.filter(F.col("doc_id") % 2 == 1)
    merged = (
        sketch.hll_registers(lo, n=1)
        .unionByName(sketch.hll_registers(hi, n=1))
        .groupBy("bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    whole = sketch.hll_registers(df, n=1)
    assert {(r.bucket, r.max_rank) for r in merged.collect()} == {
        (r.bucket, r.max_rank) for r in whole.collect()
    }


@given(docs=_corpus)
@_SETTINGS
def test_hll_estimate_defined_and_sane_property(spark, docs):
    df = _df(spark, docs)
    row = sketch.hll_distinct(df, n=1).collect()[0]
    exact = len({t for d in docs for t in d.split(" ")})
    assert row.distinct_est is not None
    if exact == 0:
        assert row.distinct_est == 0.0
    else:
        # m=256 linear counting at this scale is tight; allow 3σ-ish
        assert abs(row.distinct_est - exact) <= max(3, 0.3 * exact)


@given(docs=_corpus, evals=_corpus)
@_SETTINGS
def test_bloom_never_false_negative_property(spark, docs, evals):
    tr = _df(spark, docs)
    ev = _df(spark, evals)
    probe = {
        r.doc_id: r
        for r in sketch.bloom_probe(tr, ev, n=2).collect()
    }
    ev_shingles = {
        " ".join(toks[i : i + 2])
        for d in evals
        for toks in [d.split(" ")]
        for i in range(len(toks) - 1)
    }
    for doc_id, d in enumerate(docs):
        toks = d.split(" ")
        sh = {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}
        truly_shared = len(sh & ev_shingles)
        if sh:
            assert probe[doc_id].n_maybe >= truly_shared, (doc_id, d)


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=40,
    )
)
@_SETTINGS
def test_histogram_quantile_brackets_order_stat_property(spark, vals):
    df = spark.createDataFrame(
        list(enumerate(vals)), "doc_id long, score double"
    )
    out = sketch.histogram_quantiles(df, "score", n_quantiles=4).toPandas()
    svals = sorted(round(v, 6) for v in vals)
    n = len(svals)
    lo, hi = svals[0], svals[-1]
    bin_w = (hi - lo) / sketch.HISTQ_BINS
    for q, b in zip(out.q, out.boundary):
        kth = svals[math.ceil(n * q / 4) - 1]
        assert abs(b - kth) <= bin_w + 1e-6, (q, b, kth)
