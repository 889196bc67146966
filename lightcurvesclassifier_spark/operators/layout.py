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
    n_iter: int | None = None,
    train_size: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Persist an embedding corpus partitioned by IVF cell — the
    at-rest form of the inverted-file index: ``path/_cell=<c>/...``
    parquet, one directory per coarse-quantizer cell. A probed ANN
    query then reads only ``n_probe/n_lists`` of the FILES (partition
    pruning, visible as PartitionFilters in the scan node) instead of
    filtering after a full scan — the difference between touching 100 TB
    and touching 6 TB per query batch at scale. Returns the centroid
    rows ``[(cell_idx, [floats])]`` (JSON-serializable — persist them
    next to the data; they ARE the index metadata).

    The write is map-only: cell assignment is an argmax over n_lists
    centroid LITERALS (same rule as ``similarity.ivf_topk``), so the
    corpus is scanned once with no shuffle before the partitioned
    write. Zero-norm vectors are dropped (no direction → no cell)."""
    from . import similarity as sim

    kw = {}
    if n_iter is not None:
        kw["n_iter"] = n_iter
    if train_size is not None:
        kw["train_size"] = train_size
    v = sim._vec_rows(corpus, id_col, vec_col)
    cell_rows = sim.lloyd_cell_rows(v, n_cells=n_lists, id_col=id_col, **kw)
    arr = F.col(vec_col).cast("array<double>")
    encs = [
        F.round(sim.cosine(arr, F.array(*[F.lit(x) for x in vec])), 6)
        - F.lit(j * 1e-9)
        for j, vec in cell_rows
    ]
    enc_arr = F.array(*encs)
    assigned = corpus.filter(
        F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x) > 0.0
    ).withColumn(
        "_cell",
        (F.array_position(enc_arr, F.array_max(enc_arr)) - 1).cast("int"),
    )
    assigned.write.mode("overwrite").partitionBy("_cell").parquet(path)
    return cell_rows


def ivf_layout_topk(
    spark: SparkSession,
    path: str,
    centroids: list[tuple[int, list[float]]],
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k against an IVF-partitioned corpus: the probe-cell
    filter is a PARTITION filter, so unprobed cells' files are never
    opened. Probe ranking and re-rank use the same engine-side rounded
    -cosine expressions as ``similarity.ivf_topk`` (never numpy — its
    half-to-even rounding could flip a probe at the 1e-6 boundary), so
    the result is bit-identical to the in-memory operator for the same
    centroids."""
    from .similarity import _topk_rank, _vec_rows, cosine

    cells_df = spark.createDataFrame(
        [(int(j), [float(x) for x in vec]) for j, vec in centroids],
        "cell_idx int, _cell_v array<double>",
    )
    from pyspark.sql import Window

    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("_pcos").desc(), F.col("cell_idx")
    )
    probes = (
        _vec_rows(queries, id_col, vec_col)
        .select(F.col(id_col).alias("query_id"), F.col("_v").alias("_q"))
        .crossJoin(F.broadcast(cells_df))
        .withColumn("_pcos", F.round(cosine(F.col("_q"), F.col("_cell_v")), 6))
        .withColumn("_pr", F.row_number().over(w_probe))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "_q", F.col("cell_idx").alias("_cell"))
    )
    # bounded driver collect: |queries|·n_probe cell ids, to drive the
    # partition-pruning filter on the scan
    probed_cells = sorted(
        {int(r["_cell"]) for r in probes.select("_cell").distinct().collect()}
    )
    corpus = spark.read.parquet(path).filter(F.col("_cell").isin(probed_cells))
    cand = corpus.join(F.broadcast(probes), "_cell").filter(
        F.col("query_id") != F.col(id_col)
    )
    arr = F.col(vec_col).cast("array<double>")
    scored = cand.select(
        "query_id",
        id_col,
        F.round(cosine(F.col("_q"), arr), 6).alias("cos"),
    )
    return _topk_rank(scored, k, id_col)


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
