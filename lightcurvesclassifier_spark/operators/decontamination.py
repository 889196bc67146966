"""Benchmark decontamination — n-gram containment of an eval set in a
training corpus.

The canonical pre-training hygiene pass: before training on a corpus,
find documents that contain benchmark/eval text so they can be dropped
(or the benchmark marked contaminated). Published recipes (GPT-3
appendix C, The Pile, FineWeb) all reduce to the same relational shape:
token n-gram overlap between every training doc and every eval doc,
scored as *containment* |shingles(eval) ∩ shingles(train)| /
|shingles(eval)| — asymmetric by design: a 100-word eval question fully
quoted inside a 10k-word web page is 100% contaminated even though the
Jaccard similarity is tiny.

Scale shape: the eval side is small by contract (benchmarks are MBs,
the corpus is TBs), so its shingle table and sizes are **broadcast**;
the training corpus is exploded to shingles once and hash-joined
against the broadcast — work ∝ true shingle collisions, the corpus
never shuffles on anything but its own aggregation key, and no O(n²)
pair enumeration exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lightcurvesclassifier_spark.operators.dedup import (
    SHINGLE_N,
    shingles_hashed,
)


def contamination_pairs(
    train: DataFrame,
    evals: DataFrame,
    n: int = SHINGLE_N,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(train_id, eval_id, containment) for every train/eval pair whose
    shingle containment of the eval doc reaches ``threshold``.

    Eval docs shorter than ``n`` tokens have no shingles and can never
    be flagged (same guard as the dedup shingle paths).

    |shingles(eval)| — the containment denominator — rides ON the
    broadcast eval rows (``dedup._ngram_rows_counted``: computed
    map-side from the same array the explode consumes), so the pair
    aggregate reads it with ``first`` instead of re-deriving it with a
    separate per-eval aggregate + a second broadcast join (r7, the
    jaccard-plan trade: one 8-byte column on the broadcast payload
    replaces two plan stages).

    Precondition: ``id_col`` must be UNIQUE per document in BOTH inputs
    — duplicate id rows double-count the intersection (same map-side
    shingle-distinct contract as ``dedup.ngram_jaccard_pairs``)."""
    from .dedup import _ngram_rows_counted

    tr = shingles_hashed(train, n, text_col, id_col).withColumnRenamed(
        id_col, "train_id"
    )
    ev = _ngram_rows_counted(
        evals, n, text_col, id_col, F.xxhash64, "bigint", "shingle"
    ).select(
        F.col(id_col).alias("eval_id"), "shingle", F.col("n_sh").alias("n_ev")
    )
    inter = (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("train_id", "eval_id")
        .agg(
            F.count("*").alias("n_inter"),
            F.first("n_ev").alias("n_ev"),
        )
    )
    containment = F.round(F.col("n_inter") / F.col("n_ev"), 6)
    return (
        inter.withColumn("containment", containment)
        .filter(F.col("containment") >= threshold)
        .select("train_id", "eval_id", "containment")
    )


def contamination_sql(
    train_sql: str,
    evals_sql: str,
    n: int = SHINGLE_N,
    threshold: float = 0.8,
) -> str:
    """DuckDB mirror (string shingles; the engine's xxhash64 keys are a
    pure join-width optimization, not a semantic)."""
    return f"""
WITH train AS ({train_sql}),
evals AS ({evals_sql}),
tr_t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM train),
ev_t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM evals),
tr_sh AS (
  SELECT DISTINCT doc_id AS train_id,
         array_to_string(tk[g:g+{n - 1}], ' ') AS shingle
  FROM tr_t, unnest(generate_series(1, len(tk) - {n - 1})) AS t(g)
),
ev_sh AS (
  SELECT DISTINCT doc_id AS eval_id,
         array_to_string(tk[g:g+{n - 1}], ' ') AS shingle
  FROM ev_t, unnest(generate_series(1, len(tk) - {n - 1})) AS t(g)
),
ev_sizes AS (SELECT eval_id, count(*) AS n_ev FROM ev_sh GROUP BY eval_id),
inter AS (
  SELECT t.train_id, e.eval_id, count(*) AS n_inter
  FROM tr_sh t JOIN ev_sh e USING (shingle)
  GROUP BY t.train_id, e.eval_id
)
SELECT i.train_id, i.eval_id,
       round(i.n_inter / s.n_ev, 6) AS containment
FROM inter i JOIN ev_sizes s USING (eval_id)
WHERE round(i.n_inter / s.n_ev, 6) >= {threshold}
"""
