"""Physical-layout operators for 100 TB scale: bucketing and salting.

Nothing here exists in the reference (its data fits in Python lists —
SURVEY.md §6); these are the layout tools a cluster deployment of the
same workload needs:

- **Bucketed star tables**: `observations`/`stars` written bucketed and
  sorted by ``star_id`` join and aggregate WITHOUT a shuffle — the
  exchange happens once at write time and every downstream
  star-keyed operation (curve features, crossmatch ident side,
  searcher ledger) reuses it. This is the storage layout for the
  "repartition once, reuse across stages" rule.
- **Salted join**: when one join key dominates (a mega-star with 10⁸
  observations, a stopword shingle), AQE's skew split handles most
  cases; explicit salting is the deterministic fallback for the
  dimension-join shape — the big side's hot key is split across
  ``n_salts`` sub-keys, the small side is exploded to match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "star_id",
    buckets: int = 64,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist a star-keyed table bucketed (and optionally sorted) by the
    key. Downstream equi-joins/aggregations on ``key`` between tables
    with the same bucket spec run shuffle-free (verified in
    tests/test_layout.py by asserting no Exchange in the join plan).

    ``path`` makes it an external table at that location (bucketing
    metadata requires the catalog, so this is ``saveAsTable``, not a
    bare parquet write)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_ivf_layout(
    corpus: DataFrame,
    path: str,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> "np.ndarray":
    """Persist an embedding corpus partitioned by IVF cell — the
    at-rest form of the inverted-file index: ``path/_cell=<c>/...``
    parquet, one directory per coarse-quantizer cell. A probed ANN
    query then reads only ``n_probe/n_lists`` of the FILES (partition
    pruning, visible as PartitionFilters in the scan node) instead of
    filtering after a full scan — the difference between touching 100 TB
    and touching 6 TB per query batch at scale. Returns the centroid
    matrix (persist it next to the data; it IS the index metadata)."""
    from .similarity import _train_quantizer

    centroids = _train_quantizer(corpus, vec_col, n_lists, seed, id_col=id_col)
    b_cent = corpus.sparkSession.sparkContext.broadcast(centroids)

    def assign(batches):
        import numpy as np
        import pandas as pd

        cent = b_cent.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            d2 = (
                (mat * mat).sum(axis=1)[:, None]
                - 2.0 * (mat @ cent.T)
                + (cent * cent).sum(axis=1)[None, :]
            )
            pdf = pdf.copy()
            pdf["_cell"] = d2.argmin(axis=1).astype("int32")
            yield pdf

    from pyspark.sql import types as T

    schema = T.StructType(
        list(corpus.schema.fields) + [T.StructField("_cell", T.IntegerType())]
    )
    assigned = corpus.mapInPandas(assign, schema=schema)
    assigned.write.mode("overwrite").partitionBy("_cell").parquet(path)
    return centroids


def ivf_layout_topk(
    spark: SparkSession,
    path: str,
    centroids: "np.ndarray",
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k against an IVF-partitioned corpus: the probe-cell
    filter is a PARTITION filter, so unprobed cells' files are never
    opened. Same probe/re-rank semantics as ``similarity.ivf_topk``."""
    import numpy as np

    from .similarity import cosine

    from pyspark.sql import Window

    q_pdf = queries.select(id_col, vec_col).toPandas()
    q_ids = q_pdf[id_col].to_numpy()
    q_mat = np.vstack(q_pdf[vec_col].to_numpy()).astype(np.float64)
    q_unit = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    d2 = ((q_unit[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(d2, axis=1)[:, :n_probe]
    probes = spark.createDataFrame(
        [
            (int(q_ids[i]), q_mat[i].tolist(), int(c))
            for i in range(len(q_ids))
            for c in probe[i]
        ],
        "query_id long, q_vec array<double>, _cell int",
    )
    probed_cells = sorted({int(c) for row in probe for c in row})
    corpus = spark.read.parquet(path).filter(F.col("_cell").isin(probed_cells))
    cand = corpus.join(F.broadcast(probes), "_cell").filter(
        F.col("query_id") != F.col(id_col)
    )
    arr = F.col(vec_col).cast("array<double>")
    scored = cand.select(
        "query_id",
        id_col,
        F.round(cosine(F.col("q_vec"), arr), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", id_col, "cos", F.col("_rk").alias("rank"))
    )


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant big ⋈ dim equi-join.

    The big side assigns each row a pseudo-random salt in [0, n_salts)
    (derived from monotonically_increasing_id, so it varies with the
    physical partition layout — the JOIN RESULT is layout-independent,
    the salt assignment is not); the dim side is exploded n_salts× (dim
    is small by contract). The join key becomes (key, salt), splitting
    any hot key across ``n_salts`` reducers. For inner/left joins the
    result rows are identical to the plain join — only the partitioning
    changes. right/full outer are NOT supported: an unmatched dim key
    would surface once per exploded copy (n_salts null-extended rows
    instead of one), so those modes raise.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left joins, got how={how!r}: "
            "a right/full outer join would emit every unmatched dim key "
            "once per salt copy"
        )
    salt = F.pmod(
        F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(n_salts)
    ).cast("int")
    big_s = big.withColumn("_salt", salt)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(dim_s, [key, "_salt"], how)
    return out.drop("_salt")


# Morton (Z-order) geometry: bits per axis. 12 bits ≈ 0.09° cells in RA
# — fine enough that a typical cone's key range touches a handful of
# cells, coarse enough that the 24-bit interleaved key fits easily in a
# BIGINT and file min/max stats stay selective.
ZORDER_BITS = 12


def sky_zorder_key(
    ra: "F.Column", dec: "F.Column", bits: int = ZORDER_BITS
) -> "F.Column":
    """Interleaved Morton key of (ra, dec): bit i of the quantized RA
    lands at position 2i, of dec at 2i+1 — points close on the sky get
    close keys, so sorting by the key clusters neighbours into the same
    parquet files and a box/cone query prunes on file min/max stats.

    Pure integer shift/mask arithmetic (exact in both engines; the
    DuckDB mirror is the same expression).  Quantization clamps to
    [0, 2^bits) so dec=+90 and ra→360⁻ stay in range."""
    scale = 1 << bits
    # clamp BOTH edges: a catalog in the (-180, 180] RA convention
    # would otherwise quantize negative, and arithmetic shiftright of a
    # negative long scrambles every interleaved bit
    qx = F.greatest(
        F.lit(0),
        F.least(
            F.lit(scale - 1), F.floor(ra / F.lit(360.0) * scale).cast("long")
        ),
    )
    qy = F.greatest(
        F.lit(0),
        F.least(
            F.lit(scale - 1),
            F.floor((dec + F.lit(90.0)) / F.lit(180.0) * scale).cast("long"),
        ),
    )
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(qy, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return key


def sky_zorder_sql(
    stars_sql: str, bits: int = ZORDER_BITS
) -> str:
    """DuckDB mirror of :func:`sky_zorder_key` over a star catalog
    (same quantization, same interleave)."""
    scale = 1 << bits
    qx = (
        f"greatest(0, least({scale - 1}, "
        f"CAST(floor(ra_deg / 360.0 * {scale}) AS BIGINT)))"
    )
    qy = (
        f"greatest(0, least({scale - 1}, "
        f"CAST(floor((dec_deg + 90.0) / 180.0 * {scale}) AS BIGINT)))"
    )
    terms = " + ".join(
        f"(((qx >> {i}) & 1) << {2 * i}) + (((qy >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )
    return f"""
WITH s AS ({stars_sql}),
q AS (SELECT star_id, ra_deg, dec_deg, {qx} AS qx, {qy} AS qy FROM s)
SELECT star_id, CAST({terms} AS BIGINT) AS zkey FROM q
"""


def write_zorder_layout(
    df: DataFrame,
    path: str,
    ra_col: str = "ra_deg",
    dec_col: str = "dec_deg",
    bits: int = ZORDER_BITS,
    prefix_bits: int = 4,
) -> None:
    """Write a star catalog Z-order-clustered: partitioned by the top
    ``prefix_bits`` of the Morton key (directory pruning) and sorted by
    the full key within partitions (parquet row-group min/max pruning).
    A box query filtered on ``zprefix`` reads only the matching
    directories — asserted in tests/test_layout.py."""
    zkey = sky_zorder_key(F.col(ra_col), F.col(dec_col), bits)
    out = df.withColumn("zkey", zkey).withColumn(
        "zprefix", F.shiftright(F.col("zkey"), 2 * bits - prefix_bits)
    )
    (
        # sort on (zprefix, zkey): the partitioned writer REQUIRES child
        # ordering on zprefix, and only a sort whose prefix satisfies it
        # avoids an extra planner-inserted zprefix-only sort that would
        # leave the within-file zkey order to sort-stability luck
        out.repartition("zprefix")
        .sortWithinPartitions("zprefix", "zkey")
        .write.mode("overwrite")
        .partitionBy("zprefix")
        .parquet(path)
    )


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) of every data file under ``path`` (recursive,
    Hadoop FS — works on any supported filesystem, not just local).

    Hidden names are excluded at EVERY path level below the base, not
    just the leaf — a crashed write's ``_temporary/.../part-*.parquet``
    must not count, matching what ``spark.read`` itself would scan."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    base = fs.makeQualified(p).toString().rstrip("/")
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().toString()
        rel = name[len(base):].lstrip("/") if name.startswith(base) else name
        if not any(part.startswith(("_", ".")) for part in rel.split("/")):
            out.append((name, int(st.getLen())))
    return out


def compact_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_mb: int = 128,
) -> int:
    """Small-file compaction: rewrite a parquet dataset so output files
    approach ``target_mb`` — the maintenance job every long-lived table
    needs (file listings, footers and task scheduling all scale with
    file COUNT; a 100 TB table of 1 MB files is unqueryable).

    Only one metadata call is driver-side (``getContentSummary`` — a
    single RPC even on object stores, vs a recursive listing the read
    will do anyway); the data itself is rewritten by one distributed
    no-shuffle job (``coalesce`` merges whole input splits).  Compaction
    only MERGES: the requested bin count ⌈total_bytes/target⌉ is capped
    at the read's split count, because ``coalesce`` cannot split
    partitions — a ``target_mb`` below the read split size therefore
    yields read-split-sized files, not smaller ones.  Returns the
    actual output-file count."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    total = int(fs.getContentSummary(p).getLength())
    n_bins = max(1, -(-total // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    n_out = max(1, min(n_bins, df.rdd.getNumPartitions()))
    df.coalesce(n_out).write.mode("overwrite").parquet(out_path)
    return n_out
