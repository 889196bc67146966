"""Streaming DSIR gate — score arrivals against the nightly
log-importance-ratio artifact (the ingest-time face of
``operators/corpus.dsir_weights``, Xie et al. 2023).

The batch job owns the heavy part: ``corpus.dsir_ratio`` reduces the
raw and target corpora to a ≤ ``n_buckets``-row (bucket, llr) table —
a nightly artifact like the MinHash band table or the decontamination
Bloom bits. The gate is then a PURE ROW EXPRESSION: the ratio table
rides as a plan-literal array (128 doubles), each arrival's hashed
bigrams index into it, and the document's log importance weight is one
in-row fold — stateless, zero shuffle, runs unchanged on an unbounded
stream at any rate. ``keep`` thresholds the weight (production sets
the threshold from the batch job's selection boundary, e.g. the k-th
weight of the last nightly run).

Parity note (pinned in tests): the fold sums a document's bucket llrs
sequentially, the batch scorer sums the same doubles through a shuffle
— same multiset, different addition order, so raw weights can differ
by ~1e-13 ULP noise. Both sides round to 6 decimals; the pin allows
one rounding ULP.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bigrams(text_col: str) -> Column:
    """Adjacent-token bigrams of a document as ONE row-level array
    expression — EXACTLY ``dedup._ngram_rows``'s n=2 token multiset
    (plain ``split(text, ' ')``, empty tokens from doubled spaces kept,
    occurrence counting, short-doc guard) without the explode, so the
    gate's weight equals the batch scorer's on any text.  The one
    residual semantic difference is documented, not hidden: a < 2-token
    document has NO bigram rows, so batch ``dsir_weights`` omits it
    entirely, while the gate — which must emit a verdict for every
    arrival — emits it with ``n_feats = 0`` and ``dsir_weight = 0.0``
    (pinned in test_dsir_gate_stream)."""
    tk = F.split(F.col(text_col), " ")
    return F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.concat(
                F.element_at(tk, i), F.lit(" "), F.element_at(tk, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dsir_gate(
    docs: DataFrame,
    llr: dict[int, float] | list[float],
    n_buckets: int = 128,
    min_weight: float = 0.0,
    text_col: str = "text",
) -> DataFrame:
    """Add (n_feats, dsir_weight, keep) to each arrival.

    ``llr``: the nightly ratio artifact as bucket→llr (a dict from
    ``dsir_ratio(...).collect()`` or a dense list) — bounded by
    contract, shipped as a plan literal so the gate stays a stateless
    projection (the same trick as the MinHash gate's row-expression
    signatures). Buckets absent from the dict contribute 0.0 (an
    empty-corpus bucket's smoothed llr is ln(1)−ln(1) relative terms —
    the batch builder always emits all buckets, so this only matters
    for hand-built tables)."""
    if isinstance(llr, dict):
        dense = [float(llr.get(b, 0.0)) for b in range(n_buckets)]
    else:
        dense = [float(x) for x in llr]
        if len(dense) != n_buckets:
            raise ValueError(
                f"llr list has {len(dense)} entries, expected {n_buckets}"
            )
    arr = F.array(*[F.lit(x) for x in dense])
    bg = _bigrams(text_col)
    vals = F.transform(
        bg,
        lambda f: F.element_at(
            arr,
            (
                F.conv(F.substring(F.md5(f), 1, 4), 16, 10).cast("long")
                % n_buckets
                + 1
            ).cast("int"),
        ),
    )
    weight = F.round(
        F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x), 6
    )
    return docs.select(
        "*",
        F.size(bg).cast("long").alias("n_feats"),
        weight.alias("dsir_weight"),
        (weight >= min_weight).alias("keep"),
    )
