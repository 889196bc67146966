"""Streaming embedding near-dup gate — arrivals' vectors probed against
the AT-REST corpus via SRP-LSH buckets (the cosine analog of
``minhash_gate_stream``; streaming suite #14).

Composition — every step stateless, so it runs on an unbounded stream
with no state store:

1. the arrival's bucket per LSH table is a pure row expression
   (``similarity._srp_buckets`` — sign of a deterministic Rademacher
   projection per bit, folded as one ``F.expr`` string; SRP signs are
   scale-invariant, so no normalization pass is needed for bucketing);
2. bucket rows stream-static join the at-rest BUCKET table on
   (table, bucket) — compact: one (id, table, bucket) row per table per
   at-rest vector, rebuilt nightly alongside the at-rest dedup pass and
   re-read per micro-batch;
3. collided candidates fetch the at-rest vector by id from the at-rest
   VECTOR table (second stream-static join — the vector never rides the
   T-times-replicated bucket table) and verify EXACT cosine map-side
   (``aggregate(zip_with(...))`` — JVM codegen, no Python);
4. ``gate_verdicts`` reduces the per-table duplicate collisions to one
   row per (arrival, at-rest) pair per micro-batch in a foreachBatch
   sink (a stateless stream cannot ``dropDuplicates`` without a
   watermark, and the gate's contract is per-batch anyway).

The gate's guarantee mirrors the batch ``lsh_topk`` pruning: a flagged
pair IS a verified cosine near-dup (no false positives — exact verify);
recall is the SRP collision probability (1−θ/π)^bits per table across
``num_tables`` tables — identical hyperplanes to the batch operator, so
streaming flags equal the batch bucket-collision-then-verify pair set
exactly (pinned in tests). Exact duplicates always collide (same
vector ⇒ same buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..operators.similarity import LSH_BITS, LSH_TABLES, _lsh_signs, _srp_buckets

EMB_STREAM_SCHEMA = "vec_id long, embedding array<double>, event_time timestamp"


def vec_stream(spark, vecs_dir: str) -> DataFrame:
    """File-source stream of embedding batches (json lines with
    vec_id / embedding / event_time) — the enqueue side of an
    embedding-bearing ingest feed."""
    return (
        spark.readStream.schema(EMB_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(vecs_dir)
    )


def with_srp_buckets(
    df: DataFrame,
    num_tables: int = LSH_TABLES,
    bits: int = LSH_BITS,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, t, bucket) — one row per (vector, LSH table), computed
    entirely as row expressions (works identically on a static frame
    and a stream). The vector rides along for the verify step."""
    signs = _lsh_signs(num_tables, bits, dim, seed)
    keyed = df.select(
        F.col(id_col), F.col(vec_col).alias("_arr")
    ).select(F.col(id_col), "_arr", *_srp_buckets("_arr", signs))
    pairs = F.array(
        *[
            F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("bucket"))
            for t in range(num_tables)
        ]
    )
    return keyed.select(
        id_col, "_arr", F.explode(pairs).alias("_tb")
    ).select(id_col, "_arr", "_tb.t", "_tb.bucket")


def srp_bucket_table(
    corpus: DataFrame,
    num_tables: int = LSH_TABLES,
    bits: int = LSH_BITS,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The AT-REST bucket side: (at_rest_id, t, bucket) — compact (no
    vectors), write to parquet on each nightly pass."""
    return with_srp_buckets(
        corpus, num_tables, bits, dim, seed, id_col, vec_col
    ).select(F.col(id_col).alias("at_rest_id"), "t", "bucket")


def _cos(a: str, b: str) -> Column:
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
    na = f"sqrt(aggregate(zip_with({a}, {a}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x))"
    nb = f"sqrt(aggregate(zip_with({b}, {b}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x))"
    return F.expr(f"({dot}) / nullif(({na}) * ({nb}), 0.0D)")


def embedding_gate_stream(
    vecs: DataFrame,
    bucket_table: DataFrame,
    at_rest_vectors: DataFrame,
    threshold: float = 0.95,
    num_tables: int = LSH_TABLES,
    bits: int = LSH_BITS,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Unbounded embedding stream → (vec_id, at_rest_id, cos) verified
    near-dup rows, one per (pair, colliding table) — reduce per batch
    with :func:`gate_verdicts`.

    ``at_rest_vectors`` is the compact (vec_id, embedding) at-rest
    table; it joins by id AFTER the bucket collision, so the wide
    vector column is fetched once per candidate, never replicated into
    the bucket table. Zero-norm at-rest vectors verify as NULL cosine
    and are dropped by the threshold filter. Self-pairs (same id at
    rest) are excluded."""
    stream_b = with_srp_buckets(
        vecs, num_tables, bits, dim, seed, id_col, vec_col
    )
    rest = at_rest_vectors.select(
        F.col(id_col).alias("at_rest_id"), F.col(vec_col).alias("_rarr")
    )
    cand = (
        stream_b.join(bucket_table, ["t", "bucket"])
        .filter(F.col(id_col) != F.col("at_rest_id"))
        .join(rest, "at_rest_id")
    )
    return (
        cand.withColumn("cos", F.round(_cos("_arr", "_rarr"), 6))
        .filter(F.col("cos") >= threshold)
        .select(id_col, "at_rest_id", "cos")
    )


def gate_verdicts(candidates: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Per micro-batch reduction for a foreachBatch sink: one row per
    flagged (arrival, at-rest) pair — a pair colliding in several LSH
    tables emits several identical verified rows upstream."""
    return candidates.groupBy(id_col, "at_rest_id").agg(
        F.first("cos").alias("cos")
    )
