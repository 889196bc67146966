"""Composed pre-training data pipeline — the engine's operators
chained into ONE declarative plan.

Every stage exists as a standalone operator with its own oracle; this
module demonstrates (and pins) that they COMPOSE: quality gate →
exact-dedup keep → benchmark decontamination, as a single DataFrame
expression Catalyst optimizes end-to-end (the quality filter pushes
into the scan feeding BOTH the dedup aggregate and the shingle
explode; the eval side stays broadcast; nothing materializes between
stages).

The full chain carries a complete DuckDB oracle built from the same
SQL fragments the stage oracles use — the entire pipeline, not just
its stages, is value-checked.

Scale shape: stage costs are the stage operators' costs — one hash
aggregate for dedup (keyed by content fingerprint), one broadcast
shingle join for decontamination; the final anti-join is against the
(tiny, broadcast) contaminated-id set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .decontamination import contamination_pairs
from .dedup import SHINGLE_N
from .text import token_count

MIN_TOKENS = 5
CONTAM_THRESHOLD = 0.8


def pretraining_corpus(
    corpus: DataFrame,
    evals: DataFrame,
    min_tokens: int = MIN_TOKENS,
    threshold: float = CONTAM_THRESHOLD,
) -> DataFrame:
    """corpus → quality gate → exact-dedup canonical keep →
    decontaminated keep-list: (doc_id, n_tokens, fingerprint)."""
    from pyspark.sql import Window

    q = corpus.select(
        "doc_id",
        "text",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.md5(F.col("text")).alias("fingerprint"),
    ).filter(F.col("n_tokens") >= min_tokens)
    # canonical keep as ONE fingerprint-keyed window: doc_id is unique,
    # so "doc_id in (min(doc_id) per fingerprint)" is exactly "this row
    # IS its group's min" — one exchange, where the aggregate + join-back
    # shape paid the fingerprint exchange PLUS a doc_id join and
    # re-evaluated the q subtree on both sides (Catalyst does not CSE)
    kept = (
        q.withColumn(
            "_min_id", F.min("doc_id").over(Window.partitionBy("fingerprint"))
        )
        .filter(F.col("doc_id") == F.col("_min_id"))
        .drop("_min_id")
    )
    contaminated = (
        contamination_pairs(
            kept.select("doc_id", "text"), evals, threshold=threshold
        )
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
    )
    final = kept.join(F.broadcast(contaminated), "doc_id", "left_anti")
    return final.select("doc_id", "n_tokens", "fingerprint")


def pretraining_corpus_sql(
    corpus_sql: str,
    evals_sql: str,
    min_tokens: int = MIN_TOKENS,
    threshold: float = CONTAM_THRESHOLD,
    n: int = SHINGLE_N,  # single-sourced: must match contamination_pairs
) -> str:
    """DuckDB mirror of :func:`pretraining_corpus` (same stages, same
    fragments as the per-stage oracles)."""
    return f"""
WITH corpus AS ({corpus_sql}),
q AS (
  SELECT doc_id, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(text) AS fingerprint
  FROM corpus
  WHERE len(string_split(text, ' ')) >= {min_tokens}
),
canon AS (
  SELECT min(doc_id) AS doc_id FROM q GROUP BY fingerprint
),
kept AS (
  SELECT q.* FROM q JOIN canon USING (doc_id)
),
evals AS ({evals_sql}),
tr_t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM kept),
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
),
contaminated AS (
  SELECT DISTINCT i.train_id AS doc_id
  FROM inter i JOIN ev_sizes s USING (eval_id)
  WHERE round(i.n_inter / s.n_ev, 6) >= {threshold}
)
SELECT k.doc_id, k.n_tokens, k.fingerprint
FROM kept k
WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = k.doc_id)
"""
