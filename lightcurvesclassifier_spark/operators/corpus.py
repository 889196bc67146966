"""Corpus-assembly operators: stratified sampling and sequence packing.

The two steps between "filtered documents" and "training batches" in an
LLM data pipeline: draw a per-stratum balanced sample (by language,
source, quality bucket, ...), then pack the token stream into fixed-
length sequences. Both are expressed as windowed SQL so they run
JVM-side and mirror into the DuckDB oracle exactly.

Scale shape: every window here partitions by a bounded key (stratum or
shard), so each is ONE shuffle keyed by that column and the per-
partition state is a running counter — no global sort, no driver
involvement, and shards/strata are embarrassingly parallel, which is
exactly how production packing jobs are laid out (shard first, pack
within shards independently).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def stratified_sample(
    df: DataFrame, stratum_col: str, key: str, n_per_stratum: int
) -> DataFrame:
    """Deterministic fixed-``n`` sample per stratum: order each stratum
    by the engine-portable md5 permutation of the key (the same seeded
    shuffle trick as ``sample_head``) and keep the first ``n``.

    PRECONDITION: ``key`` must be unique within each stratum — it is the
    total order. Duplicate keys tie in (md5(key), key) and the
    row_number tie-break is then arbitrary per run and engine.

    One shuffle on the stratum column; within each stratum the window is
    a streaming rank, so memory is O(1) per partition. Strata smaller
    than ``n`` are returned whole (the usual semantics for balanced
    sampling)."""
    h = F.md5(F.col(key).cast("string").cast("binary"))
    w = Window.partitionBy(stratum_col).orderBy(h, F.col(key))
    return (
        df.withColumn(
            "stratum_rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("stratum_rank") <= n_per_stratum)
    )


def stratified_sample_sql(
    table_sql: str, stratum_col: str, key: str, n_per_stratum: int,
    select_cols: str,
) -> str:
    """DuckDB mirror of :func:`stratified_sample`."""
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY {stratum_col}
      ORDER BY md5(CAST({key} AS VARCHAR)), {key}) AS stratum_rank
  FROM ({table_sql})
)
SELECT {select_cols}, stratum_rank FROM ranked
WHERE stratum_rank <= {n_per_stratum}
"""


def pack_sequences(
    df: DataFrame,
    seq_len: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style sequence packing: shard the corpus, concatenate each
    shard's documents in deterministic (id) order into one token
    stream, and cut the stream into fixed ``seq_len`` blocks. Documents
    span block boundaries (that is the point — zero padding waste), so
    the packing decision per document is just its token *offset* in the
    shard stream: emitted as (start_tok, first_chunk, last_chunk).

    A running-sum window per shard = one shuffle on the shard key, then
    pure arithmetic. Shards are independent, so a 1000-executor job
    packs 1000 shards concurrently; ``n_shards`` is the parallelism
    knob, and chunk ids are globally unique via (shard, chunk)."""
    # bigint to match the oracle's len() (DuckDB list len is BIGINT)
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    shard = F.col(id_col) % n_shards
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(F.col(id_col), shard.alias("shard"), n_tok.alias("n_tokens"))
        .withColumn("start_tok", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .select(
            id_col,
            "shard",
            "n_tokens",
            "start_tok",
            F.expr(f"start_tok div {seq_len}").alias("first_chunk"),
            F.expr(f"(start_tok + n_tokens - 1) div {seq_len}").alias("last_chunk"),
        )
    )


def pack_sequences_sql(
    table_sql: str, seq_len: int = 512, n_shards: int = 8
) -> str:
    """DuckDB mirror of :func:`pack_sequences`."""
    return f"""
WITH sized AS (
  SELECT doc_id, doc_id % {n_shards} AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM ({table_sql})
),
offs AS (
  -- DuckDB promotes window sums to HUGEINT; CAST back to BIGINT so the
  -- typed value-hash matches Spark's LongType output.
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_tok
  FROM sized
)
SELECT doc_id, shard, n_tokens, start_tok,
       CAST(start_tok // {seq_len} AS BIGINT) AS first_chunk,
       CAST((start_tok + n_tokens - 1) // {seq_len} AS BIGINT) AS last_chunk
FROM offs
"""


def mixture_sample(
    df: DataFrame, stratum_col: str, key: str, weights: dict[str, float]
) -> DataFrame:
    """Domain-mixture sampling: keep each stratum at its own Bernoulli
    rate (the data-mixing knob of an LLM pipeline — e.g. upsample books,
    downsample web). Deterministic md5-threshold per row, so it is a
    pure filter: no shuffle, no RNG state, reproducible across engines
    and runs; strata missing from ``weights`` are dropped (rate 0)."""
    h = F.substring(F.md5(F.col(key).cast("string").cast("binary")), 1, 8)
    bound = F.lit("00000000")
    for stratum, w in sorted(weights.items()):
        b = _hex_bound(w)
        bound = F.when(F.col(stratum_col) == stratum, F.lit(b)).otherwise(bound)
    return df.filter(h < bound)


def _hex_bound(w: float) -> str:
    """Lexicographic threshold for an 8-hex-char md5 prefix.  w >= 1.0
    must keep the stratum in FULL: int(1.0 * 16**8) formats to 9 hex
    chars and the string compare would silently drop ~15/16 of the rows,
    so return 'g' — it sorts after every hex digit, keeping all rows
    exactly (unlike 'ffffffff', which drops hash == 'ffffffff')."""
    if not 0.0 <= w <= 1.0:
        raise ValueError(f"mixture weight must be in [0, 1], got {w}")
    if w >= 1.0:
        return "g"
    return format(int(w * 16**8), "08x")


def mixture_sample_sql(
    table_sql: str, stratum_col: str, key: str, weights: dict[str, float],
    select_cols: str,
) -> str:
    """DuckDB mirror of :func:`mixture_sample`."""
    cases = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN '{_hex_bound(w)}'"
        for s, w in sorted(weights.items())
    )
    return f"""
SELECT {select_cols}
FROM ({table_sql})
WHERE substring(md5(CAST({key} AS VARCHAR)), 1, 8)
      < (CASE {cases} ELSE '00000000' END)
"""


# Power-of-two bucket floors for length-grouped batching; 2**10 covers any
# document in the synthetic corpus (docs are ~10-100 tokens) and the CASE
# chain keeps the bucket rule exact-integer in both engines (a float
# log2() could land on either side of a power-of-two boundary).
LENGTH_BUCKET_FLOORS = tuple(2**b for b in range(10, -1, -1))


def length_buckets(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sequence-length bucketing — the batch-shaping pass of a training
    pipeline: group documents into power-of-two token-length buckets
    (the T5 / packing-efficiency trick) and report, per bucket, the
    document count, total tokens, and the padding fraction that would be
    wasted if every doc were padded to the bucket cap (2·floor − 1).

    Map-only bucket assignment + one aggregate; at 100 TB this is a scan
    with map-side partial aggregation into ≤ ~30 groups."""
    n = F.size(F.split(F.col(text_col), " "))
    # build ASCENDING so the largest floor's test ends outermost — the
    # nested whens then check 1024 first, matching the SQL CASE chain
    bucket = F.lit(1)
    for floor_ in sorted(LENGTH_BUCKET_FLOORS):
        if floor_ == 1:
            continue
        bucket = F.when(n >= floor_, F.lit(floor_)).otherwise(bucket)
    cap = 2 * F.col("bucket_floor") - 1
    return (
        df.select(bucket.cast("long").alias("bucket_floor"), n.cast("long").alias("n"))
        .groupBy("bucket_floor")
        .agg(F.count("*").alias("n_docs"), F.sum("n").alias("sum_tokens"))
        .select(
            "bucket_floor",
            "n_docs",
            "sum_tokens",
            # clamped at 0: the TOP bucket is open-ended, so documents
            # longer than its 2·floor−1 cap would otherwise drive the
            # "waste" negative (nonsense — they'd be split, not padded)
            F.greatest(
                F.lit(0.0),
                F.round(
                    1.0 - F.col("sum_tokens") / (F.col("n_docs") * cap), 6
                ),
            ).alias("pad_waste_frac"),
        )
    )


def length_buckets_sql(table_sql: str = "SELECT text FROM documents") -> str:
    """DuckDB mirror of :func:`length_buckets` (same CASE chain)."""
    cases = " ".join(
        f"WHEN len(string_split(text, ' ')) >= {f} THEN {f}"
        for f in LENGTH_BUCKET_FLOORS
        if f > 1
    )
    return f"""
WITH corpus AS ({table_sql}),
sized AS (
  SELECT CAST(CASE {cases} ELSE 1 END AS BIGINT) AS bucket_floor,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM corpus
),
agg AS (
  SELECT bucket_floor, count(*) AS n_docs, sum(n) AS sum_tokens
  FROM sized GROUP BY bucket_floor
)
SELECT bucket_floor, n_docs, CAST(sum_tokens AS BIGINT) AS sum_tokens,
       greatest(0.0e0,
         round(1.0 - sum_tokens / (n_docs * (2 * bucket_floor - 1)), 6))
         AS pad_waste_frac
FROM agg
"""


# Shared hex alphabet for portable md5-prefix arithmetic (the DuckDB
# mirror has no base-conv builtin, so it uses instr() digit lookups).
_HEX = "0123456789abcdef"


def shuffle_shards(
    df: DataFrame, key: str = "doc_id", n_shards: int = 16,
    seed: str = "s0",
) -> DataFrame:
    """Deterministic global corpus shuffle — the write path of a training
    run: every row gets a shard (which output file) and a position
    (write order within the file), both pure functions of (seed, key).
    Changing ``seed`` is the epoch reshuffle; same seed = byte-identical
    shard files on any cluster size.

    shard = first byte of md5(seed_key) mod n_shards (uniform, portable);
    pos = rank of md5(seed_key) within the shard. ONE shuffle keyed by
    shard; the per-shard window is a streaming rank, so at 100 TB each
    shard sorts independently — parallelism = n_shards, no global sort,
    no driver involvement.

    ``n_shards`` must be ≤ 256 (shard is drawn from one hash byte);
    production jobs shard by thousands, which would extend the prefix to
    2 bytes the same way."""
    if not 1 <= n_shards <= 256:
        raise ValueError(f"n_shards must be in [1, 256], got {n_shards}")
    h = F.md5(
        F.concat(F.lit(f"{seed}_"), F.col(key).cast("string")).cast("binary")
    )
    # F.conv returns a string; the value is 0-255 so the cast is safe
    shard = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % n_shards
    w = Window.partitionBy("shard").orderBy("h", key)
    return (
        df.select(F.col(key), h.alias("h"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(key, "shard", "pos")
    )


def shuffle_shards_sql(
    table_sql: str, key: str = "doc_id", n_shards: int = 16,
    seed: str = "s0",
) -> str:
    """DuckDB mirror of :func:`shuffle_shards` (instr() digit lookup in
    place of Spark's conv())."""
    d1 = f"(instr('{_HEX}', substring(h, 1, 1)) - 1)"
    d2 = f"(instr('{_HEX}', substring(h, 2, 1)) - 1)"
    return f"""
WITH x AS (
  SELECT {key}, md5('{seed}_' || CAST({key} AS VARCHAR)) AS h
  FROM ({table_sql})
),
s AS (
  SELECT {key}, h, ({d1} * 16 + {d2}) % {n_shards} AS shard
  FROM x
)
SELECT {key}, CAST(shard AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, {key})
            AS BIGINT) AS pos
FROM s
"""


def temperature_sample(
    df: DataFrame, stratum_col: str = "lang", key: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based corpus rebalancing (the mT5 / UniMax recipe,
    Xue et al. 2021 §3.2): sample language l with probability
    proportional to share_l^alpha, alpha < 1 flattening the Zipf head.
    Realized as per-stratum acceptance rates normalized so the rarest
    stratum keeps 100% and dominant strata are down-sampled:
    rate_l = share_l^(alpha-1) / max_l' share_l'^(alpha-1).

    Per-row acceptance is the deterministic md5-prefix fraction (same
    scheme as mixture_sample), so the draw is reproducible across
    engines and runs. Plan shape: one tiny stratum-count aggregate
    (map-side partial into |langs| groups), rates broadcast back, then
    a map-only filter — the corpus itself never shuffles."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    cnt = df.groupBy(F.col(stratum_col).alias("_stratum")).agg(
        F.count("*").alias("_c")
    )
    w_all = Window.partitionBy()
    share = F.col("_c") / F.sum("_c").over(w_all)
    # two levels: windows cannot nest (DuckDB binder rule; mirrored here
    # so the expression order is identical on both engines)
    boosted = cnt.select(
        "_stratum", F.pow(share, F.lit(alpha - 1.0)).alias("_boost")
    )
    rates = boosted.select(
        "_stratum",
        F.round(F.col("_boost") / F.max("_boost").over(w_all), 9).alias("rate"),
    )
    h = F.md5(F.col(key).cast("string").cast("binary"))
    frac = F.conv(F.substring(h, 1, 6), 16, 10).cast("long") / F.lit(16**6)
    return (
        df.join(
            F.broadcast(rates),
            F.col(stratum_col) == F.col("_stratum"),
        )
        .filter(frac < F.col("rate"))
        .select(key, stratum_col, "rate")
    )


def temperature_sample_sql(
    table_sql: str, stratum_col: str = "lang", key: str = "doc_id",
    alpha: float = 0.5,
) -> str:
    """DuckDB mirror of :func:`temperature_sample` (same rate formula
    and expression order; md5 fraction via instr() digit lookups)."""
    exp = repr(alpha - 1.0)
    digits = " + ".join(
        f"(instr('{_HEX}', substring(hh, {i}, 1)) - 1) * {16 ** (6 - i)}"
        for i in range(1, 7)
    )
    return f"""
WITH corpus AS ({table_sql}),
cnt AS (
  SELECT {stratum_col} AS stratum, count(*) AS _c FROM corpus GROUP BY 1
),
b AS (
  SELECT stratum,
         pow(_c / CAST(sum(_c) OVER () AS BIGINT),
             CAST('{exp}' AS DOUBLE)) AS _boost
  FROM cnt
),
r AS (
  SELECT stratum, round(_boost / max(_boost) OVER (), 9) AS rate FROM b
),
hashed AS (
  SELECT {key}, {stratum_col},
         md5(CAST({key} AS VARCHAR)) AS hh
  FROM corpus
)
SELECT hashed.{key}, hashed.{stratum_col}, r.rate
FROM hashed JOIN r ON hashed.{stratum_col} = r.stratum
WHERE ({digits}) / {16 ** 6}.0 < r.rate
"""


def quality_buckets(
    df: DataFrame, score_col: str = "score", id_col: str = "doc_id",
    n_buckets: int = 10, exact: bool | None = None,
) -> DataFrame:
    """Quality-curriculum binning: assign each document its corpus-wide
    score quantile bucket (decile by default) — the selection key for
    quality-thresholded corpora and curriculum ordering.

    The naive form is ``ntile()`` over a GLOBAL sort — a single-partition
    window that dies at 100 TB. Instead: ONE reduce computes the exact
    quantile boundaries, the (n_buckets-1)-value row is broadcast, and
    bucket assignment is a map-only comparison count — so the corpus is
    scanned twice but never shuffled or globally sorted, and the second
    scan fuses into whatever runs next. Scores and boundaries are
    rounded to 6 decimals before comparison so the rule is
    engine-portable. bucket = 1 + #(boundaries below score) ∈ [1, n].

    ``exact``: True = sort-based boundary percentiles (bit-matches the
    DuckDB oracle), False = t-digest sketch boundaries (mergeable,
    bounded memory — the boundary reduce never funnels raw scores
    through one partition), None = auto by input row count
    (``profile.EXACT_PERCENTILE_MAX_ROWS``) so the 100 TB path is the
    default without breaking small-SF oracle parity. The sketch path's
    boundaries are rank-based (no interpolation) within the sketch
    error bound of the exact ones — bucket agreement vs exact is
    pinned in tests at oracle scale."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    from .profile import _auto_exact

    exact = _auto_exact(df, exact)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    score = F.round(F.col(score_col), 6)
    perc = F.percentile if exact else F.percentile_approx
    bounds = df.select(score.alias("_s")).agg(
        perc(F.col("_s"), F.lit(qs)).alias("_b")
    )
    bucket = F.lit(1) + F.size(
        F.filter(F.col("_b"), lambda v: score > F.round(v, 6))
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .select(
            id_col,
            score.alias("score"),
            bucket.cast("long").alias("bucket"),
        )
    )


def quality_buckets_sql(
    scored_sql: str, n_buckets: int = 10
) -> str:
    """DuckDB mirror of :func:`quality_buckets`. ``scored_sql`` must
    yield (doc_id, score)."""
    qs = ", ".join(repr(i / n_buckets) for i in range(1, n_buckets))
    return f"""
WITH s AS (
  SELECT doc_id, round(score, 6) AS score FROM ({scored_sql})
),
b AS (
  SELECT quantile_cont(score, [{qs}]) AS _b FROM s
)
SELECT s.doc_id, s.score,
       CAST(1 + len(list_filter(b._b, v -> s.score > round(v, 6)))
            AS BIGINT) AS bucket
FROM s CROSS JOIN b
"""


def token_budget_sample(
    df: DataFrame, budget: int, stratum_col: str | None = None,
    key: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Deterministic sampling to an exact token budget — "give me N
    tokens of this source", the quota step of corpus mixing. Documents
    are taken in the engine-portable md5(key) shuffle order until the
    running token count reaches ``budget``; the document that crosses
    the boundary is KEPT (budgets are met, never undershot), so the
    selection is the unique deterministic prefix with cum_tokens'
    previous value < budget.

    With ``stratum_col`` the budget applies per stratum (per language /
    source). One shuffle keyed by the stratum (or a single partition
    for the global case — at 100 TB always pass a stratum; the window
    is a streaming running sum either way)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    h = F.md5(F.col(key).cast("string").cast("binary"))
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    part = [stratum_col] if stratum_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy("_h", key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out_cols = [key] + part + ["n_tokens", "cum_tokens"]
    return (
        df.select(
            F.col(key), *part, h.alias("_h"), n_tok.alias("n_tokens")
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < budget)
        .select(*out_cols)
    )


def token_budget_sample_sql(
    table_sql: str, budget: int, stratum_col: str | None = None,
    key: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`token_budget_sample`."""
    part = f"PARTITION BY {stratum_col} " if stratum_col else ""
    strat = f"{stratum_col}, " if stratum_col else ""
    return f"""
WITH sized AS (
  SELECT {key}, {strat}md5(CAST({key} AS VARCHAR)) AS _h,
         len(string_split(text, ' ')) AS n_tokens
  FROM ({table_sql})
),
summed AS (
  SELECT {key}, {strat}n_tokens,
         CAST(sum(n_tokens) OVER ({part}ORDER BY _h, {key}
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM sized
)
SELECT {key}, {strat}n_tokens, cum_tokens
FROM summed WHERE cum_tokens - n_tokens < {budget}
"""


def weighted_sample(
    df: DataFrame, weight_col: str, k: int = 100,
    key: str = "doc_id", seed: str = "w0",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of ``k`` rows — the
    Efraimidis–Spirakis exponential-key scheme (A-ES): each row draws
    the deterministic uniform u = md5-fraction(seed, key) and gets the
    key ``u^(1/w)``; the k LARGEST keys are the sample, which is
    exactly weighted sampling without replacement.

    Everything is a pure row-local expression + one distributed
    TakeOrdered (each partition ships its local top-k) — no RNG state,
    no shuffle of the corpus, reproducible across engines, cluster
    sizes and runs; ``seed`` reshuffles the draw.  Rows with w <= 0 are
    excluded (their key is 0, i.e. never competitive — dropped
    explicitly so the k-th slot is never wasted).

    The sort key is ln(u)/w (monotone with u^(1/w), numerically
    flatter); output carries it rounded to 6 so the DuckDB mirror's
    ranking is value-checked, not just membership."""
    h = F.substring(
        F.md5(
            F.concat(F.lit(f"{seed}_"), F.col(key).cast("string")).cast(
                "binary"
            )
        ),
        1,
        8,
    )
    # u in (0, 1]: (int(h) + 1) / 16^8 — the +1 keeps ln defined
    u = (F.conv(h, 16, 10).cast("double") + 1.0) / F.lit(float(16**8))
    w = F.col(weight_col).cast("double")
    es_key = F.round(F.log(u) / w, 6)
    return (
        df.filter(w > 0)
        .select(F.col(key), w.alias("weight"), es_key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), F.col(key))
        .limit(k)
    )


def weighted_sample_sql(
    table_sql: str, weight_col: str, k: int = 100,
    key: str = "doc_id", seed: str = "w0",
) -> str:
    """DuckDB mirror of :func:`weighted_sample` (same md5 uniform, same
    ln(u)/w key, same tie-break)."""
    from .sketch import _hex_to_int_sql

    digits = _hex_to_int_sql("h", 8)
    return f"""
WITH x AS (
  SELECT {key}, CAST({weight_col} AS DOUBLE) AS weight,
         md5('{seed}_' || CAST({key} AS VARCHAR)) AS h
  FROM ({table_sql})
  WHERE {weight_col} > 0
),
keyed AS (
  SELECT {key}, weight,
         round(ln((({digits}) + 1.0) / {float(16 ** 8)}) / weight, 6)
           AS es_key
  FROM x
)
SELECT {key}, weight, es_key FROM keyed
ORDER BY es_key DESC, {key} LIMIT {k}
"""


def _dsir_bucket(n_buckets: int):
    """Hashed-bigram bucket function shared by the batch scorer and the
    streaming gate: md5 top-4-hex → int mod n_buckets."""

    def bfn(s: Column) -> Column:
        h = F.conv(F.substring(F.md5(s), 1, 4), 16, 10).cast("long")
        return h % n_buckets

    return bfn


def dsir_ratio(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
    _rf: DataFrame | None = None,
) -> DataFrame:
    """The DSIR log-importance-ratio table — (bucket, llr), one row per
    hash bucket: add-1-smoothed ln(p_target/p_raw). This is the
    nightly artifact a streaming DSIR gate broadcasts
    (``streaming.dsir_gate_stream``); :func:`dsir_weights` builds it
    in-plan. Bounded: ≤ ``n_buckets`` rows regardless of corpus size.
    """
    from .dedup import _ngram_rows

    spark = raw.sparkSession
    bfn = _dsir_bucket(n_buckets)
    rf = _rf if _rf is not None else _ngram_rows(
        raw, 2, text_col, id_col,
        key_fn=bfn, empty_type="long", out_col="bucket", distinct=False,
    )
    tf = _ngram_rows(
        target, 2, text_col, id_col,
        key_fn=bfn, empty_type="long", out_col="bucket", distinct=False,
    )
    rc = rf.groupBy("bucket").agg(F.count("*").alias("cr"))
    tc = tf.groupBy("bucket").agg(F.count("*").alias("ct"))
    buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    probs = (
        buckets.join(rc, "bucket", "left")
        .join(tc, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("cr", F.lit(0)).alias("cr"),
            F.coalesce("ct", F.lit(0)).alias("ct"),
        )
    )
    tot = probs.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    return probs.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log(F.col("ct") + 1)
            - F.log(F.col("nt") + n_buckets)
            - F.log(F.col("cr") + 1)
            + F.log(F.col("nr") + n_buckets)
        ).alias("llr"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 128,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023): score every raw document by how much its hashed-bigram
    profile looks like the *target* corpus, and select the top ``k``.

    Per the paper: features are n-grams hashed into ``n_buckets``
    buckets (here bigrams via the shared md5 hasher); the bucket
    unigram models ``p_target`` / ``p_raw`` get add-1 smoothing; a
    document's log importance weight is Σ_f log(p_target(f)/p_raw(f))
    over its feature OCCURRENCES. (The paper then Gumbel-samples by
    weight; the deterministic top-``k`` here is its argmax variant so
    the oracle is exact.)

    Scale shape: two bigram explodes (map-only, the shared
    ``dedup._ngram_rows`` skeleton), two bucket aggregates whose
    reduce fan-in is ≤ ``n_buckets`` keys at any corpus size, the
    log-ratio table BROADCAST back onto the exploded raw side (the
    corpus-sized side never shuffles for the join), and one doc-keyed
    aggregate. Selection is TakeOrdered (per-partition local
    top-k, no global sort): the k-th compound key reduces to one row
    and broadcasts back as a threshold compare — no unbounded
    single-partition exchange anywhere in the plan.
    """
    from .dedup import _ngram_rows

    bfn = _dsir_bucket(n_buckets)
    rf = _ngram_rows(
        raw, 2, text_col, id_col,
        key_fn=bfn, empty_type="long", out_col="bucket", distinct=False,
    )
    ratio = dsir_ratio(raw, target, n_buckets, text_col, id_col, _rf=rf)
    scored = (
        rf.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.round(F.sum("llr"), 6).alias("weight"),
        )
        # feeds the k-th-row threshold AND the final projection
        .localCheckpoint(eager=False)
    )
    # top-k WITHOUT a global row_number window (that would be an
    # unbounded single-partition sort of every doc): orderBy().limit(k)
    # compiles to TakeOrderedAndProject (each partition ships only its
    # local top-k), the k-th (weight DESC, id ASC) key — encoded as a
    # struct whose ASC order is that compound order, doubles negate
    # exactly — reduces to ONE row, and selection is a broadcast
    # compare. The only single-partition exchange left holds ≤ k rows.
    key = F.struct(
        (-F.col("weight")).alias("nw"), F.col(id_col).alias("tid")
    )
    kth = (
        scored.select(key.alias("_key"))
        .orderBy("_key")
        .limit(k)
        .agg(F.max("_key").alias("_kth"))
    )
    return (
        scored.crossJoin(F.broadcast(kth))
        .select(
            id_col,
            "n_feats",
            "weight",
            (key <= F.col("_kth")).alias("selected"),
        )
    )


def dsir_weights_sql(
    raw_sql: str,
    target_sql: str,
    n_buckets: int = 128,
    k: int = 50,
) -> str:
    """DuckDB mirror of :func:`dsir_weights` — same md5-hex bucket
    hash, same smoothing constants, same ln expression order."""
    from .sketch import _hex_to_int_sql

    bucket = f"({_hex_to_int_sql('md5(f)', 4)}) % {n_buckets}"

    def feats(src: str) -> str:
        return f"""
  SELECT doc_id, {bucket} AS bucket FROM (
    SELECT doc_id,
           unnest(list_transform(
             list_zip(tk[1:len(tk) - 1], tk[2:len(tk)]),
             p -> p[1] || ' ' || p[2])) AS f
    FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM ({src}))
  )"""

    return f"""
WITH rf AS ({feats(raw_sql)}),
tf AS ({feats(target_sql)}),
rc AS (SELECT bucket, count(*) AS cr FROM rf GROUP BY bucket),
tc AS (SELECT bucket, count(*) AS ct FROM tf GROUP BY bucket),
b AS (SELECT unnest(range({n_buckets})) AS bucket),
probs AS (
  SELECT b.bucket, coalesce(cr, 0) AS cr, coalesce(ct, 0) AS ct
  FROM b LEFT JOIN rc USING (bucket) LEFT JOIN tc USING (bucket)
),
tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM probs),
ratio AS (
  SELECT bucket,
         ln(ct + 1) - ln(nt + {n_buckets})
           - ln(cr + 1) + ln(nr + {n_buckets}) AS llr
  FROM probs, tot
),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         round(sum(llr), 6) AS weight
  FROM rf JOIN ratio USING (bucket) GROUP BY doc_id
)
SELECT doc_id, n_feats, weight,
       (row_number() OVER (ORDER BY weight DESC, doc_id) <= {k})
         AS selected
FROM scored
"""


def unimax_budget(
    df: DataFrame,
    total_budget: int,
    max_epochs: int = 4,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining", ICLR) — split a total character budget
    across languages so every language is repeated at most
    ``max_epochs`` times, with the leftover shared as equally as the
    caps allow.

    The paper's algorithm is sequential (ascending-size greedy: each
    language takes min(cap, remaining/languages_left)), which is
    exactly WATER-FILLING and therefore has a closed windowed form —
    under the ascending (cap, lang) order the capped languages are a
    prefix, a row is capped iff its cap fits its own as-if-everyone-
    from-here-split-equally share, and every uncapped language gets
    the same residual share.  That makes the whole allocation ONE
    bounded-key aggregate (|langs| rows at any corpus size) plus
    single-partition window arithmetic over those rows — no driver
    loop, no collect, and a digit-for-digit DuckDB mirror.  Pinned
    against a pure-Python transcription of the paper's sequential loop
    in test_corpus_ops (hypothesis-randomized budgets/caps).

    Output: one row per language —
    (lang, n_chars, cap_chars, budget_chars, epochs); integer
    char-count arithmetic stays BIGINT-exact on both engines, the two
    divisions happen in the same operand order, and float outputs are
    rounded to 6.
    """
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    counts = df.groupBy(lang_col).agg(
        F.sum(F.length(text_col)).cast("long").alias("n_chars")
    )
    capped_demand = (F.lit(int(max_epochs)) * F.col("n_chars")).cast("long")
    w = Window.orderBy("cap_chars", lang_col)
    full = Window.orderBy("cap_chars", lang_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = (
        counts.withColumn("cap_chars", capped_demand)
        .withColumn("_i", F.row_number().over(w))
        .withColumn(
            "_prefix",
            F.coalesce(
                F.sum("cap_chars").over(
                    Window.orderBy("cap_chars", lang_col).rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn("_L", F.count("*").over(full))
    )
    # capped iff cap * (languages from here on) fits the budget left
    # after every smaller language took its cap — exact BIGINT compare
    is_capped = (
        F.col("cap_chars") * (F.col("_L") - F.col("_i") + 1)
        <= F.lit(int(total_budget)) - F.col("_prefix")
    )
    t = t.withColumn("_capped", is_capped).withColumn(
        "_capped_total",
        F.coalesce(
            F.sum(F.when(F.col("_capped"), F.col("cap_chars"))).over(full),
            F.lit(0).cast("long"),
        ),
    ).withColumn(
        "_n_uncapped",
        F.col("_L") - F.sum(F.col("_capped").cast("long")).over(full),
    )
    residual_share = (
        F.lit(int(total_budget)) - F.col("_capped_total")
    ) / F.col("_n_uncapped")
    budget = F.when(F.col("_capped"), F.col("cap_chars").cast("double")).otherwise(
        residual_share
    )
    return t.select(
        lang_col,
        "n_chars",
        "cap_chars",
        F.round(budget, 6).alias("budget_chars"),
        F.round(budget / F.col("n_chars"), 6).alias("epochs"),
    )


def unimax_budget_sql(
    corpus_sql: str,
    total_budget: int | str,
    max_epochs: int = 4,
) -> str:
    """DuckDB mirror of :func:`unimax_budget` — same BIGINT prefix
    arithmetic, same division operand order, same rounding.

    ``total_budget``: an int literal, or a SQL expression string (e.g.
    a scalar subquery deriving the budget from the corpus) inlined
    parenthesized."""
    if isinstance(total_budget, str):
        B = f"({total_budget})"
    else:
        B = str(int(total_budget))
    return f"""
WITH corpus AS ({corpus_sql}),
counts AS (
  SELECT lang, CAST(sum(length(text)) AS BIGINT) AS n_chars
  FROM corpus GROUP BY lang
),
t AS (
  SELECT lang, n_chars,
         CAST({int(max_epochs)} * n_chars AS BIGINT) AS cap_chars,
         row_number() OVER (ORDER BY {int(max_epochs)} * n_chars, lang)
           AS _i,
         coalesce(sum(CAST({int(max_epochs)} * n_chars AS BIGINT)) OVER (
           ORDER BY {int(max_epochs)} * n_chars, lang
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS _prefix,
         count(*) OVER () AS _L
  FROM counts
),
c AS (
  SELECT *,
         (cap_chars * (_L - _i + 1) <= {B} - _prefix)
           AS _capped
  FROM t
),
g AS (
  SELECT *,
         coalesce(sum(CASE WHEN _capped THEN cap_chars END) OVER (), 0)
           AS _capped_total,
         _L - sum(CASE WHEN _capped THEN 1 ELSE 0 END) OVER ()
           AS _n_uncapped
  FROM c
)
SELECT lang, n_chars, cap_chars,
       round(CASE WHEN _capped THEN CAST(cap_chars AS DOUBLE)
                  ELSE ({B} - _capped_total)
                       / CAST(_n_uncapped AS DOUBLE) END, 6)
         AS budget_chars,
       round(CASE WHEN _capped THEN CAST(cap_chars AS DOUBLE)
                  ELSE ({B} - _capped_total)
                       / CAST(_n_uncapped AS DOUBLE) END / n_chars, 6)
         AS epochs
FROM g
"""
