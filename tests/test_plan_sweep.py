"""Query-agnostic plan-hygiene sweep over EVERY ``queries()`` entry:

1. No row-at-a-time Python (``BatchEvalPython``) anywhere, ever.
2. Arrow-batched Python (pandas UDFs / applyInPandas / mapInPandas)
   only in the operators whose semantics genuinely need array-at-a-time
   work — the whitelist below IS the complete inventory of Python in
   the engine's data plane.
3. ``Exchange SinglePartition`` only where the input is bounded by
   construction (single-row finals, broadcast totals, ≤4096-row sketch
   tables, documented exact-percentile trade-offs).

A new query that silently adds row-Python, an unexpected pandas stage,
or an unbounded single-partition window fails here rather than in a
plan audit."""

import pytest

import __spark_entry__ as em
from tests.conftest import SF_SMOKE

# The complete inventory of Arrow-batched Python stages (imperative
# kernels the JVM can't express: SAX word assembly + sliding MINDIST,
# exact ekvi-PAA fill recurrence, variogram binning, blocked GEMM
# scoring, multimodal codecs, MLlib-side pipelines).
ARROW_OK = {
    "comp_curves_noslide",
    "comp_hist_shape",
    "comp_variogram_shape",
    "comp_curves_shape",
    "stars_filter_pipeline",
    "lda_holdout",  # Gaussian-decider pandas-UDF scoring + 1-row final
    "ekvi_paa_exact",
    "variogram_slope",
    "embedding_topk",
    "ann_recall",  # exact leg = embedding_topk's blocked-GEMM mapInPandas
    "embedding_neardup",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frames",
    "multimodal_audio",  # WAV codec decode in executors (mapInPandas)
    "multimodal_video",  # AVI codec decode in executors (mapInPandas)
    "semantic_dedup_gemm",  # GEMM assignment + per-cell pairwise GEMM
}

# Bounded-input single-partition finals: one-row results, broadcast
# totals, sketch tables ≤4096 rows, or the two documented
# exact-percentile trade-offs whose mergeable-sketch alternative
# exists (score_quantiles).
SINGLE_OK = {
    "hll_distinct",       # 256-register table → one estimate row
    "unigram_logprob",    # broadcast corpus total
    "score_quantiles",    # ≤4096-bin sketch walk
    "quality_buckets",    # documented exact-percentile trade-off
    "table_profile",      # documented exact-percentile trade-off
    "temperature_sample", # per-stratum weight normalization (|strata|)
    "tfidf_top_terms",    # broadcast corpus size N
    "confusion_stats",    # single-row stats
    "dq_audit",           # union of one-row check aggregates
    "small_qty_revenue",  # single-row final
    "session_concurrency_sweep",  # bounded day-axis cumulative window
    # r9 map-side IVF assignment: the n_cells-row cell table folds into
    # ONE array row (_cells_arr collect_list global agg) before being
    # broadcast — bounded by the index-metadata contract
    "embedding_ivf_flat_topk",
    "semantic_dedup",
    # r9 session 2: bounded finals of the new queries
    "ccnet_ppl_buckets",  # inherits unigram_logprob's broadcast total
    "lsh_recall",    # four one-row count aggregates crossJoined
    "dsir_weights",  # k-th-key threshold: ≤k rows reduce to one
}

QUERIES = sorted(em.queries().keys())


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in em.queries().items():
        out[name] = (
            fn(spark, SF_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    return out


@pytest.mark.parametrize("name", QUERIES)
def test_no_row_python_anywhere(plans, name):
    assert "BatchEvalPython" not in plans[name], name


@pytest.mark.parametrize("name", QUERIES)
def test_arrow_python_only_where_documented(plans, name):
    has_arrow = any(
        tok in plans[name]
        for tok in ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas")
    )
    if name not in ARROW_OK:
        assert not has_arrow, f"{name}: undocumented pandas stage"


@pytest.mark.parametrize("name", QUERIES)
def test_single_partition_only_on_bounded_inputs(plans, name):
    if name not in SINGLE_OK and name not in ARROW_OK:
        assert "Exchange SinglePartition" not in plans[name], (
            f"{name}: unbounded single-partition exchange"
        )


def test_whitelists_not_stale():
    """Every whitelisted name must still be a real query — a renamed
    or removed query must not leave a silent hole in the sweep."""
    qs = set(em.queries().keys())
    assert ARROW_OK <= qs
    assert SINGLE_OK <= qs
