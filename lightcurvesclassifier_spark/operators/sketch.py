"""Deterministic distributed sketches: a cross-engine HyperLogLog.

Counting distinct tokens across a 100 TB corpus with an exact
``groupBy(term)`` shuffles the full token stream; the sketch shape
shuffles 256 numbers per partition instead.  Spark's built-in
``approx_count_distinct`` is exactly this — but its xxhash-based
registers aren't reproducible in another engine, so it can't be
value-checked.  This HLL derives every register from ``md5(term)``,
which both Spark and DuckDB compute identically, so the whole sketch —
registers AND estimate — has an exact SQL oracle (the estimate math is
all exact-in-IEEE arithmetic except one ``ln``, which both engines take
from libm and which is rounded away at 3 decimals).

Register scheme (m = 256): ``bucket`` = first 2 hex chars of
``md5(token)``; ``rank`` = 1 + number of leading zero bits in the next
48 bits (12 hex chars), computed portably as ``49 - length(bin(v))``
(both engines' ``bin`` drops leading zeros).  Estimator is the standard
Flajolet HLL with linear-counting small-range correction.

Plan shape: explode tokens (map-only) → per-bucket ``max(rank)`` with
map-side combine (the shuffle carries ≤ 256 rows *per map partition*,
independent of corpus size) → a 256-row final aggregate.  This is the
canonical mergeable-sketch dataflow; at 1000 executors the reduce input
is ~256k tiny rows regardless of data volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

HLL_M = 256  # registers = one md5 byte; std error ≈ 1.04/√m ≈ 6.5 %
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

# Hex alphabet for the DuckDB mirror's instr() digit lookup (DuckDB has
# no base-conv builtin) — same convention as corpus._HEX.
_HEX = "0123456789abcdef"


def _hll_parts(term: Column) -> tuple[Column, Column]:
    """(bucket, rank) register coordinates for one token."""
    h = F.md5(term.cast("binary"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    v = F.conv(F.substring(h, 3, 12), 16, 10).cast("long")  # 48 bits
    rank = F.when(v == 0, F.lit(49)).otherwise(
        F.lit(49) - F.length(F.bin(v))
    )
    return bucket, rank.cast("long")


def hll_registers(
    df: DataFrame, text_col: str = "text", n: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """The HLL register table over the corpus's whitespace token
    ``n``-grams: (bucket, max_rank), ≤ 256 rows.  Mergeable state —
    union two corpora's registers with ``max`` per bucket and the
    estimate composes."""
    from .dedup import _ngram_rows

    terms = _ngram_rows(
        df, n, text_col, id_col,
        key_fn=lambda s: s, empty_type="string", out_col="term",
        distinct=False,
    )
    bucket, rank = _hll_parts(F.col("term"))
    return (
        terms.select(bucket.alias("bucket"), rank.alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def _hll_est_cols() -> list:
    """The shared estimator projection over (n_present, z_present)
    columns: Flajolet raw estimator with linear counting below 2.5·m.
    One definition serves the global, grouped and streaming paths so
    all report identically."""
    m = float(HLL_M)
    v = F.lit(m) - F.col("n_present")  # empty registers
    # coalesce: an empty register table (corpus with no n-grams at all)
    # gives sum=NULL; treating it as 0 routes V=m into linear counting,
    # whose m·ln(m/m) = 0 is the correct cardinality
    z = F.coalesce(F.col("z_present"), F.lit(0.0)) + v
    raw = F.lit(_HLL_ALPHA * m * m) / z
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(m) * F.log(F.lit(m) / v)
    ).otherwise(raw)
    return [
        F.col("n_present").cast("long").alias("n_registers"),
        F.round(est, 3).alias("distinct_est"),
    ]


def hll_estimate(regs: DataFrame) -> DataFrame:
    """Register table → single-row estimate.  Shared by the batch path
    and the streaming foreachBatch sink, so both report identically."""
    agg = regs.agg(
        F.count("*").alias("n_present"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("z_present"),
    )
    return agg.select(*_hll_est_cols())


def hll_grouped_registers(
    df: DataFrame, group_col: str = "lang", text_col: str = "text",
    n: int = 1,
) -> DataFrame:
    """Register tables keyed (group, bucket) — the grouped sketch
    STATE, shared by the batch estimate (:func:`hll_grouped`) and the
    streaming form (``streaming/sketch_stream.hll_grouped_register_
    stream``): ≤ m rows per group forever, mergeable with ``max``."""
    from .dedup import _ngram_rows

    terms = _ngram_rows(
        df, n, text_col, group_col,
        key_fn=lambda s: s, empty_type="string", out_col="term",
        distinct=False,
    )
    bucket, rank = _hll_parts(F.col("term"))
    return (
        terms.select(F.col(group_col), bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(group_col, "bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_grouped(
    df: DataFrame, group_col: str = "lang", text_col: str = "text",
    n: int = 1,
) -> DataFrame:
    """Per-GROUP distinct-n-gram estimates — the rollup shape: register
    tables keyed (group, bucket), then the shared estimator per group.
    This is how sketch state rolls up a hierarchy at 100 TB: the
    shuffle carries ≤ m rows per (map partition, group) whatever the
    corpus size, and a coarser level's registers are the ``max`` merge
    of its children's (max is associative/idempotent), so group→global
    composes exactly — pinned in tests against :func:`hll_distinct`."""
    regs = hll_grouped_registers(df, group_col, text_col, n)
    agg = regs.groupBy(group_col).agg(
        F.count("*").alias("n_present"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("z_present"),
    )
    return agg.select(F.col(group_col), *_hll_est_cols())


def hll_distinct(
    df: DataFrame, text_col: str = "text", n: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Single-row distinct-``n``-gram estimate for a corpus."""
    return hll_estimate(hll_registers(df, text_col, n, id_col))


def _hex_to_int_sql(expr: str, n_digits: int) -> str:
    """DuckDB hex→int via instr() digit lookups (mirrors Spark conv)."""
    terms = [
        f"(instr('{_HEX}', substring({expr}, {i + 1}, 1)) - 1) "
        f"* {16 ** (n_digits - 1 - i)}"
        for i in range(n_digits)
    ]
    return "(" + " + ".join(terms) + ")"


def _hll_registers_sql(
    corpus_sql: str, n: int, group_col: str | None = None
) -> str:
    """ONE definition of the register scheme serves the global AND the
    grouped mirrors (r5 review: a drifting copy of the hash-slice /
    rank rule would silently break grouped↔global composability, the
    dq_audit lesson). ``group_col`` threads a grouping column through
    every CTE and into the register key."""
    g = f"{group_col}, " if group_col else ""
    return f"""
WITH tk0 AS (
  SELECT {g}string_split(text, ' ') AS tk FROM ({corpus_sql})
),
toks AS (
  SELECT {g}array_to_string(tk[g:g+{n - 1}], ' ') AS term
  FROM tk0, unnest(generate_series(1, len(tk) - {n - 1})) AS t(g)
),
hashed AS (SELECT {g}md5(term) AS h FROM toks)
{_hll_coords_sql("SELECT * FROM hashed", group_col)}
"""


def _hll_coords_sql(hashed_sql: str, group_col: str | None = None) -> str:
    """Register table from a ``hashed(h[, group])`` source — THE
    hash-slice + rank rule (2-hex-char bucket, 12-hex-char 48-bit value,
    rank 49 − bitlength, 49 at zero).  Single-sourced so the sketch
    family and every other HLL consumer (string_profile) cannot drift —
    a stale copy of this rule breaks grouped↔global composability."""
    g = f"{group_col}, " if group_col else ""
    bucket = _hex_to_int_sql("substring(h, 1, 2)", 2)
    v = _hex_to_int_sql("substring(h, 3, 12)", 12)
    return f"""SELECT {g}bucket, max(rank) AS max_rank FROM (
  SELECT {g}CAST({bucket} AS BIGINT) AS bucket,
         CAST(CASE WHEN {v} = 0 THEN 49
              ELSE 49 - length(bin(CAST({v} AS BIGINT))) END AS BIGINT)
           AS rank
  FROM ({hashed_sql})
) GROUP BY {g}bucket"""


def _hll_estimate_sql(regs_sql: str, group_col: str | None = None) -> str:
    """ONE definition of the estimator (constants, linear-counting
    branch, 3-decimal rounding) for the global and grouped mirrors."""
    m = float(HLL_M)
    g = f"{group_col}, " if group_col else ""
    gb = f" GROUP BY {group_col}" if group_col else ""
    return f"""
WITH regs AS ({regs_sql}),
agg AS (
  SELECT {g}count(*) AS n_present,
         coalesce(sum(pow(2.0, -max_rank)), 0.0) AS z_present
  FROM regs{gb}
)
SELECT {g}CAST(n_present AS BIGINT) AS n_registers,
       round(CASE WHEN {_HLL_ALPHA * m * m} / (z_present + ({m} - n_present))
                       <= {2.5 * m}
                  AND {m} - n_present > 0
             THEN {m} * ln({m} / ({m} - n_present))
             ELSE {_HLL_ALPHA * m * m} / (z_present + ({m} - n_present))
             END, 3) AS distinct_est
FROM agg
"""


def hll_registers_sql(
    corpus_sql: str = "SELECT doc_id, text FROM documents", n: int = 1
) -> str:
    """DuckDB mirror of :func:`hll_registers`."""
    return _hll_registers_sql(corpus_sql, n)


def hll_grouped_sql(
    corpus_sql: str = "SELECT lang, text FROM documents",
    group_col: str = "lang",
    n: int = 1,
) -> str:
    """DuckDB mirror of :func:`hll_grouped` — generated from the SAME
    register-scheme and estimator builders as the global mirror."""
    return _hll_estimate_sql(
        _hll_registers_sql(corpus_sql, n, group_col), group_col
    )


def hll_distinct_sql(
    corpus_sql: str = "SELECT doc_id, text FROM documents", n: int = 1
) -> str:
    """DuckDB mirror of :func:`hll_distinct` (same estimator constants,
    same correction branch, rounded to 3 decimals)."""
    return _hll_estimate_sql(_hll_registers_sql(corpus_sql, n))


# Count-min geometry: d=4 independent md5-salted hash rows × w=512
# columns. Additive overestimate ≤ e·N/w with prob 1−e^−d; at w=512
# that is ~0.5 % of the stream length — heavy-hitter accurate while the
# counter table stays ≤ d·w rows no matter the corpus size.
CMS_D = 4
CMS_W = 512


def _cms_col(term: Column, row: int) -> Column:
    """Column index of ``term`` in hash row ``row``: first 8 hex chars
    of the salted md5, mod w — portable to DuckDB digit-by-digit."""
    h = F.md5(F.concat(F.lit(f"cms{row}_"), term).cast("binary"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")) % CMS_W


def _cms_coords(term: Column) -> Column:
    """All d (row, col) coordinates of one term as an array of structs —
    exploded by callers so the input is scanned ONCE, not d times
    (Spark does not CSE identical subtrees across union branches)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("row"),
                _cms_col(term, i).alias("col"),
            )
            for i in range(CMS_D)
        ]
    )


def cms_counters(
    df: DataFrame, text_col: str = "text", n: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """The count-min counter table over whitespace token ``n``-grams:
    (row, col, cnt), ≤ d·w non-zero rows.  Mergeable by summing
    counters; the reduce fan-in is ≤ d·w keys independent of scale."""
    from .dedup import _ngram_rows

    terms = _ngram_rows(
        df, n, text_col, id_col,
        key_fn=lambda s: s, empty_type="string", out_col="term",
        distinct=False,
    )
    return (
        terms.select(F.explode(_cms_coords(F.col("term"))).alias("c"))
        .select(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .groupBy("row", "col")
        .agg(F.count("*").alias("cnt"))
    )


def _cms_collect(counters: DataFrame) -> list[int]:
    """Collect a counter table into the flat d·w cell array — the
    bounded-sketch-to-driver contract (2 KiB·d at the default geometry,
    independent of corpus size)."""
    arr = [0] * (CMS_D * CMS_W)
    for r in counters.collect():  # ≤ d·w rows by construction
        arr[int(r["row"]) * CMS_W + int(r["col"])] = int(r["cnt"])
    return arr


def _cms_lookup_expr(arr: list[int], term_col: str = "term") -> Column:
    """CMS point estimate of ``term_col`` as a MAP-ONLY expression:
    each term's d cells are O(1) ``element_at`` lookups into the
    constant-folded array literal (built as ONE expr string — a single
    py4j round trip — and collapsed by ConstantFolding before codegen).
    Returns the ``least`` over the d salted rows."""
    cnt_arr = F.expr("array(" + ",".join(f"{x}L" for x in arr) + ")")
    return F.least(
        *[
            F.element_at(
                cnt_arr,
                (F.lit(i * CMS_W) + _cms_col(F.col(term_col), i) + 1).cast(
                    "int"
                ),
            )
            for i in range(CMS_D)
        ]
    )


def cms_point_estimates(
    df: DataFrame, text_col: str = "text", n: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frequency estimate for every distinct ``n``-gram: the min over
    the d salted counters — (term, est).  est ≥ true count always;
    the overshoot is bounded by e·N/w per the CMS guarantee.

    Plan shape (r10): the counter table is COLLECTED (≤ d·w integer
    cells — the same bounded-sketch contract as
    :func:`cms_heavy_hitters`) and the estimate of each distinct term
    is a constant-folded array-literal lookup (``least`` over the d
    salted positions) — the probe side is map-only after the term
    DISTINCT.  Every coordinate of every distinct term is present in
    the counter table by construction (the term itself incremented
    those cells), so the lookup equals the former broadcast-join +
    ``min`` aggregate row for row (pinned by
    ``test_cms_point_lookup_equals_join``); the join build, the 4×
    probe explode, and the final groupBy(term) exchange all drop out.

    Contract note (r11, per the r10 advice): building this query is
    EAGER — the collect runs Spark jobs at call time (inside the timed
    window when benched) and embeds a d·w-element literal per
    invocation — and the input must therefore be a BATCH frame;
    streaming callers should use :func:`cms_point_estimates_join`,
    whose lazy broadcast-join formulation composes onto readStream
    (:func:`cms_heavy_hitters` has always shared this eager
    bounded-sketch-to-driver contract)."""
    from .dedup import _ngram_rows

    counters = cms_counters(df, text_col, n, id_col)
    terms = (
        _ngram_rows(
            df, n, text_col, id_col,
            key_fn=lambda s: s, empty_type="string", out_col="term",
            distinct=False,
        )
        .select("term")
        .distinct()
    )
    return terms.select(
        "term", _cms_lookup_expr(_cms_collect(counters)).alias("est")
    )


def cms_point_estimates_join(
    df: DataFrame, text_col: str = "text", n: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """The broadcast-join formulation of :func:`cms_point_estimates`
    (the pre-r10 default), kept as the no-plan-literal baseline and
    pinned value-identical to the lookup form: each term explodes into
    its d (row, col) probes, joins the broadcast ≤ d·w counter table,
    and takes ``min(cnt)`` per term."""
    from .dedup import _ngram_rows

    counters = cms_counters(df, text_col, n, id_col)
    terms = (
        _ngram_rows(
            df, n, text_col, id_col,
            key_fn=lambda s: s, empty_type="string", out_col="term",
            distinct=False,
        )
        .select("term")
        .distinct()
    )
    probes = terms.select(
        "term", F.explode(_cms_coords(F.col("term"))).alias("c")
    ).select("term", F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    est = (
        probes.join(F.broadcast(counters), ["row", "col"])
        .groupBy("term")
        .agg(F.min("cnt").alias("est"))
    )
    return est


def _cms_col_sql(term: str, row: int) -> str:
    h8 = _hex_to_int_sql(f"substring(md5('cms{row}_' || {term}), 1, 8)", 8)
    return f"(CAST({h8} AS BIGINT) % {CMS_W})"


def _cms_terms_sql(corpus_sql: str, n: int) -> str:
    return f"""
tk0 AS (SELECT string_split(text, ' ') AS tk FROM ({corpus_sql})),
terms AS (
  SELECT array_to_string(tk[g:g+{n - 1}], ' ') AS term
  FROM tk0, unnest(generate_series(1, len(tk) - {n - 1})) AS t(g)
)"""


def cms_counters_sql(
    corpus_sql: str = "SELECT doc_id, text FROM documents", n: int = 1
) -> str:
    """DuckDB mirror of :func:`cms_counters`."""
    unions = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS row, {_cms_col_sql('term', i)} AS col "
        "FROM terms"
        for i in range(CMS_D)
    )
    return f"""
WITH {_cms_terms_sql(corpus_sql, n)},
coords AS ({unions})
SELECT row, col, count(*) AS cnt FROM coords GROUP BY row, col
"""


def cms_point_estimates_sql(
    corpus_sql: str = "SELECT doc_id, text FROM documents", n: int = 1
) -> str:
    """DuckDB mirror of :func:`cms_point_estimates`."""
    counter_unions = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS row, {_cms_col_sql('term', i)} AS col "
        "FROM terms"
        for i in range(CMS_D)
    )
    probe_unions = " UNION ALL ".join(
        f"SELECT term, CAST({i} AS BIGINT) AS row, "
        f"{_cms_col_sql('term', i)} AS col FROM dterms"
        for i in range(CMS_D)
    )
    return f"""
WITH {_cms_terms_sql(corpus_sql, n)},
coords AS ({counter_unions}),
counters AS (SELECT row, col, count(*) AS cnt FROM coords GROUP BY row, col),
dterms AS (SELECT DISTINCT term FROM terms),
probes AS ({probe_unions})
SELECT p.term, min(c.cnt) AS est
FROM probes p JOIN counters c USING (row, col)
GROUP BY p.term
"""


def cms_heavy_hitters(
    df: DataFrame, phi: float = 0.01, text_col: str = "text", n: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frequent ``n``-grams (count ≥ φ·N) by the classic two-pass
    sketch-prune-then-verify plan (Cormode & Muthukrishnan 2005 §4):

    * pass 1: the CMS counter table — ≤ d·w integer cells, COLLECTED
      (the same bounded-sketch-to-driver contract as
      ``bloom_probe_fast``'s bitmap literal; 2 KiB·d at the default
      geometry, independent of corpus size). N falls out for free: every
      occurrence increments exactly one column of every row, so N =
      Σ row 0 — no separate counting pass;
    * pass 2, MAP-ONLY prune: each term OCCURRENCE's estimate is a
      constant-folded array-literal lookup (``least`` over the d salted
      positions), filtered against φ·N BEFORE any shuffle. CMS only
      overestimates, so the survivors are a superset of the true heavy
      hitters' occurrences (no false negatives; for φ meaningfully
      above e/w the overshoot ≤ e·N/w keeps it a small superset);
    * exact verify: ONE groupBy over only the surviving occurrences +
      the exact φ·N filter.

    The output EQUALS the exact heavy-hitter set — the sketch buys the
    pruning, not an approximation — which is why the DuckDB oracle
    (:func:`cms_heavy_hitters_sql`) is the plain exact SQL. The
    full-domain term groupBy genuinely never happens: the corpus is
    scanned twice map-only, and the ONLY shuffle in the returned plan
    carries the φ-bounded candidate occurrences.
    """
    from .dedup import _ngram_rows

    arr = _cms_collect(cms_counters(df, text_col, n, id_col))
    n_total = sum(arr[:CMS_W])  # Σ row 0 = total occurrences
    spark = df.sparkSession
    if n_total == 0:
        return spark.createDataFrame([], "term string, cnt long, freq double")
    terms = _ngram_rows(
        df, n, text_col, id_col,
        key_fn=lambda s: s, empty_type="string", out_col="term",
        distinct=False,
    ).select("term")
    est = _cms_lookup_expr(arr)
    thresh = F.lit(float(phi)) * F.lit(float(n_total))
    exact = (
        terms.filter(est >= thresh)  # map-only CMS prune
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    return exact.filter(F.col("cnt") >= thresh).select(
        "term",
        F.col("cnt").cast("long").alias("cnt"),
        F.round(F.col("cnt") / F.lit(float(n_total)), 6).alias("freq"),
    )


def cms_heavy_hitters_sql(
    corpus_sql: str = "SELECT doc_id, text FROM documents",
    phi: float = 0.01,
    n: int = 1,
) -> str:
    """DuckDB mirror of :func:`cms_heavy_hitters` — the EXACT
    heavy-hitter set (the Spark plan's sketch stage only prunes; its
    verify pass restores exactness, so the mirror needs no CMS)."""
    return f"""
WITH {_cms_terms_sql(corpus_sql, n)},
tot AS (SELECT count(*) AS n_total FROM terms),
cnt AS (SELECT term, count(*) AS cnt FROM terms GROUP BY 1)
SELECT term, CAST(cnt AS BIGINT) AS cnt,
       round(cnt / n_total, 6) AS freq
FROM cnt, tot WHERE cnt >= {float(phi)!r} * n_total
"""


# Bloom geometry: m=16384 bits (2 KiB), k=5 positions via
# Kirsch–Mitzenmacher double hashing: bit_i = (h1 + i·h2) mod m from
# exactly TWO md5s per term instead of k (Kirsch & Mitzenmacher 2006
# prove the asymptotic FP rate is unchanged; h2 is forced odd so the
# stride generates k distinct positions on the power-of-two m).  FP
# rate for n_keys set elements ≈ (1 − e^(−k·n/m))^k — ~0.1 % at the
# sf0.01 eval set's ~1k distinct shingles; the filter is m bits at ANY
# eval-set size, which is the point: the broadcast side of a
# contamination probe stops growing with the benchmark suite.
BLOOM_M = 16384
BLOOM_K = 5
# bloom_probe_fast embeds an m-char bitmap literal in the plan; beyond
# ~1 MiB the codegen constant (and the py4j command string carrying it)
# stops being a sensible trade — the join-based bloom_probe takes over
BLOOM_FAST_MAX_M = 1 << 23


def _bloom_hex(term: Column) -> Column:
    """ONE md5 per term — h1 and h2 are two disjoint 32-bit slices of
    it (md5 output bits are independent, the standard way to get the
    KM pair from a single digest).  Per-term hash work is therefore one
    md5 total, vs k salted md5s in the r6 scheme."""
    return F.md5(F.concat(F.lit("bf_"), term).cast("binary"))


def _bloom_h1(hx: Column) -> Column:
    """First probe position from hex chars 1-8 of :func:`_bloom_hex`."""
    return F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % BLOOM_M


def _bloom_h2(hx: Column) -> Column:
    """KM stride from hex chars 9-16 — odd by construction: on the
    power-of-two m an odd stride is a unit, so the k probe positions
    are pairwise distinct."""
    return (
        F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % (BLOOM_M // 2)
    ) * 2 + 1


def _bloom_bit(term: Column, i: int) -> Column:
    hx = _bloom_hex(term)
    return (_bloom_h1(hx) + i * _bloom_h2(hx)) % BLOOM_M


def _bloom_bit_array(term: Column) -> Column:
    """All k bit positions of one term — the definitional form (tests
    pin it equal to the staged plans below).  NOTE the two md5s appear
    k times each in the element expressions; production paths instead
    go through :func:`_exploded_bits` (h1/h2 materialized as columns,
    so each md5 is evaluated exactly once per term regardless of
    whether the consuming node runs codegen subexpression
    elimination — Generate nodes don't)."""
    return F.array(*[_bloom_bit(term, i) for i in range(BLOOM_K)])


def _exploded_bits(df: DataFrame, term_col: str, keep: list[str]) -> DataFrame:
    """``keep`` columns + one ``bit`` row per Kirsch–Mitzenmacher probe
    position of ``term_col`` — THE shared explode plan of the batch
    filter build, the join-form probe, and the streaming form.  The
    (h1, h2) pair is a separate projection so each md5 runs once per
    term (CollapseProject keeps multi-referenced non-cheap aliases in
    their own Project; k array elements reference both)."""
    hx = df.select(*keep, _bloom_hex(F.col(term_col)).alias("_hx"))
    km = hx.select(
        *keep,
        _bloom_h1(F.col("_hx")).alias("_h1"),
        _bloom_h2(F.col("_hx")).alias("_h2"),
    )
    arr = F.array(
        *[
            (F.col("_h1") + i * F.col("_h2")) % BLOOM_M
            for i in range(BLOOM_K)
        ]
    )
    return km.select(*keep, F.explode(arr).alias("bit"))


def _distinct_shingles(
    df: DataFrame, text_col: str, n: int, id_col: str
) -> DataFrame:
    from .dedup import _ngram_rows

    return _ngram_rows(
        df, n, text_col, id_col,
        key_fn=lambda s: s, empty_type="string", out_col="shingle",
        distinct=True,
    )


def bloom_bits(
    df: DataFrame, text_col: str = "text", n: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """The set bits of a Bloom filter over the corpus's distinct token
    ``n``-grams: one row per set bit, ≤ m rows.  Mergeable by union —
    OR-ing two filters is exactly the distinct union of their bits.

    Plan shape (r7): per-doc-distinct shingles (map-only) → explode k
    bits → ONE distinct on ``bit``, whose partial aggregate collapses
    each map partition to ≤ m rows before the exchange.  The r6 shape
    first ran a corpus-wide DISTINCT on the shingle strings — a shuffle
    that grows with the corpus; this one's shuffle is ≤ m·partitions
    rows at ANY corpus size (cross-doc duplicate shingles are re-hashed
    map-side instead of deduped cluster-wide, the right trade: md5 of a
    short string is ns, an exchanged row is µs)."""
    sh = _distinct_shingles(df, text_col, n, id_col)
    return _exploded_bits(sh, "shingle", []).distinct()


def bloom_probe(
    train: DataFrame,
    evals: DataFrame,
    text_col: str = "text",
    n: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Probe every train document's ``n``-grams against a Bloom filter
    built from the eval set: (doc_id, n_shingles, n_maybe, maybe_frac),
    where a shingle is *maybe contained* iff all k of its bits are set.

    No false negatives ever (a truly shared shingle always probes
    positive) — so this is a sound cheap prefilter for the exact
    contamination join: at 100 TB the filter is a 2 KiB broadcast, the
    train side is map-only + one per-doc aggregate, and only flagged
    docs proceed to the exact containment pass."""
    bits = bloom_bits(evals, text_col, n, id_col)
    return bloom_probe_bits(train, bits, text_col, n, id_col)


def bloom_probe_bits(
    train: DataFrame,
    bits: DataFrame,
    text_col: str = "text",
    n: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`bloom_probe` against a PRECOMPUTED set-bit table — the
    nightly-artifact contract: build :func:`bloom_bits` once per eval
    refresh, persist the ≤ m rows, and point every probe (batch or a
    streaming ingest gate's foreachBatch) at it. Identical output to
    :func:`bloom_probe`, which delegates here."""
    tr = _distinct_shingles(train, text_col, n, id_col)
    # no DISTINCT on the exploded rows (the r6 plan exchanged the full
    # 5× (doc, shingle, bit) table to dedup collided positions): "all k
    # rows hit" ⟺ "all distinct positions set" whether or not two of
    # the k positions coincide — a repeated row is hit exactly iff its
    # (shared) bit is set — and the KM odd stride makes the k positions
    # pairwise-distinct anyway.  The per-(doc, shingle) aggregate below
    # is now the FIRST exchange of the train side, map-side-combined to
    # one row per shingle.
    probe = _exploded_bits(tr, "shingle", [id_col, "shingle"])
    per_shingle = (
        probe.join(
            F.broadcast(bits.withColumn("_hit", F.lit(1))), "bit", "left"
        )
        .groupBy(id_col, "shingle")
        .agg(
            F.count("*").alias("n_bits"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_bits_set"),
        )
    )
    maybe = (
        per_shingle.withColumn(
            "maybe",
            (F.col("n_bits_set") == F.col("n_bits")).cast("long"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum("maybe").alias("n_maybe"),
        )
        .withColumn(
            "maybe_frac", F.round(F.col("n_maybe") / F.col("n_shingles"), 6)
        )
    )
    return maybe


def _bloom_bit_sql(term: str, i: int) -> str:
    """DuckDB mirror of :func:`_bloom_bit` — same Kirsch–Mitzenmacher
    double hashing off one md5, digit-for-digit."""
    h1 = _hex_to_int_sql(f"substring(md5('bf_' || {term}), 1, 8)", 8)
    h2 = _hex_to_int_sql(f"substring(md5('bf_' || {term}), 9, 8)", 8)
    return (
        f"(((CAST({h1} AS BIGINT) % {BLOOM_M}) + {i} * "
        f"((CAST({h2} AS BIGINT) % {BLOOM_M // 2}) * 2 + 1)) % {BLOOM_M})"
    )


def _shingle_cte_sql(corpus_sql: str, n: int, prefix: str) -> str:
    return f"""
{prefix}_tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM ({corpus_sql})),
{prefix}_sh AS (
  SELECT DISTINCT doc_id, array_to_string(tk[g:g+{n - 1}], ' ') AS shingle
  FROM {prefix}_tk, unnest(generate_series(1, len(tk) - {n - 1})) AS t(g)
)"""


def _bits_union_sql(src: str) -> str:
    return " UNION ALL ".join(
        f"SELECT shingle, {_bloom_bit_sql('shingle', i)} AS bit FROM {src}"
        for i in range(BLOOM_K)
    )


def bloom_bits_sql(corpus_sql: str, n: int = 5) -> str:
    """DuckDB mirror of :func:`bloom_bits`."""
    return f"""
WITH {_shingle_cte_sql(corpus_sql, n, "ev")},
dsh AS (SELECT DISTINCT shingle FROM ev_sh),
coords AS ({_bits_union_sql("dsh")})
SELECT DISTINCT bit FROM coords
"""


def bloom_probe_sql(train_sql: str, evals_sql: str, n: int = 5) -> str:
    """DuckDB mirror of :func:`bloom_probe`."""
    return f"""
WITH {_shingle_cte_sql(evals_sql, n, "ev")},
{_shingle_cte_sql(train_sql, n, "tr").lstrip()},
ev_dsh AS (SELECT DISTINCT shingle FROM ev_sh),
bits AS (SELECT DISTINCT bit FROM ({_bits_union_sql("ev_dsh")})),
probe2 AS (
  SELECT DISTINCT doc_id, shingle, bit FROM (
    {" UNION ALL ".join(f"SELECT doc_id, shingle, {_bloom_bit_sql('shingle', i)} AS bit FROM tr_sh" for i in range(BLOOM_K))}
  )
),
nb AS (SELECT doc_id, shingle, count(*) AS n_bits FROM probe2 GROUP BY 1, 2),
hit AS (
  SELECT p.doc_id, p.shingle, count(*) AS n_bits_set
  FROM probe2 p JOIN bits b USING (bit)
  GROUP BY 1, 2
),
per_sh AS (
  SELECT nb.doc_id, nb.shingle,
         CASE WHEN coalesce(h.n_bits_set, 0) = nb.n_bits THEN 1 ELSE 0 END
           AS maybe
  FROM nb LEFT JOIN hit h ON h.doc_id = nb.doc_id AND h.shingle = nb.shingle
)
SELECT doc_id, count(*) AS n_shingles,
       CAST(sum(maybe) AS BIGINT) AS n_maybe,
       round(sum(maybe) / count(*), 6) AS maybe_frac
FROM per_sh GROUP BY doc_id
"""


def bloom_probe_fast(
    train: DataFrame,
    evals: DataFrame,
    text_col: str = "text",
    n: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Map-only :func:`bloom_probe`: identical output, no
    data-dependent shuffle on the train side (the only exchange is the
    documented expansion-aware input spread below).

    The filter is materialized once into an m-element char-array plan
    constant (the eval side is collected, which is the whole point of a
    Bloom prefilter: it is O(m) regardless of eval-suite size) and each
    document's distinct shingles are tested with a higher-order
    ``filter`` doing k O(1) ``element_at`` lookups — whole-stage-
    codegen, no explode, no join, no aggregate.  The only Spark job
    before the scan is the eval-side bit build.  (A '0'/'1' string
    bitmap probed with ``substring`` was the first version — UTF8String
    indexing is O(offset), measured 50× slower at sf0.1: every probe
    scanned half the 16 KiB bitmap.)

    This is the shape that runs at 100 TB; :func:`bloom_probe` is the
    join-based formulation kept as the cross-engine-oracled baseline
    (both are value-checked equal — see tests/test_sketch.py).

    Precondition: ``id_col`` must be unique (one row per document, the
    contract of every corpus here).  Duplicate ids would give one
    output row per input row, while the join form's groupBy would merge
    them over the union of their shingles.

    Bound: the collect and the literal are both ≤ BLOOM_M bits BY
    CONSTRUCTION (bloom_bits emits distinct set bits) — independent of
    eval-suite size.  The budget check below guards the one way the
    bound can grow: raising BLOOM_M past what a codegen plan constant
    tolerates.  Past the budget, use :func:`bloom_probe` — the
    broadcast-join formulation with no plan literal."""
    if BLOOM_M > BLOOM_FAST_MAX_M:
        raise ValueError(
            f"bloom_probe_fast embeds an m-char bitmap literal in the plan: "
            f"BLOOM_M={BLOOM_M} exceeds the {BLOOM_FAST_MAX_M}-bit budget "
            "(~1 MiB of codegen constant). Use bloom_probe (broadcast-join "
            "formulation, no plan literal) for larger filters."
        )
    # ONE map-only collect for the eval-side bits (r11, r10 verdict
    # directive #5): the eval suite is bounded by contract, so the
    # corpus-facing spread repartition and the ≤ m-row DISTINCT each
    # cost an AQE exchange job to save driver work that a set() absorbs
    # for free — measured 3 collect jobs → 1 (rows collected =
    # k·|eval shingles|, eval-bounded; the bitset is identical, so the
    # plan literal and every output are unchanged).  bloom_bits stays
    # the declared corpus-side query with its spread + distinct.
    from .dedup import _ngram_rows

    sh = _ngram_rows(
        evals, n, text_col, id_col,
        key_fn=lambda s: s, empty_type="string", out_col="shingle",
        distinct=True, spread=False,
    )
    bit_rows = _exploded_bits(sh, "shingle", []).collect()
    bitset = set(r.bit for r in bit_rows)
    # ONE string literal shipped over py4j, split server-side into a
    # char array that ConstantFolding collapses to a single array
    # literal before codegen.  (F.lit(list) would instead build 16384
    # individual py4j literal calls — measured ~8 s of plan build.)
    bitmap = F.split(
        F.lit("".join("1" if i in bitset else "0" for i in range(BLOOM_M))),
        "",
    )

    tk = F.col("_toks")
    grams = F.when(
        F.size(tk) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - (n - 1)),
                lambda i: F.array_join(F.slice(tk, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))

    # Higher-order lambdas are INTERPRETED (no codegen, so no
    # subexpression elimination): hashing inside the probe lambda would
    # re-run the digest once per (shingle, i) term.  Instead two
    # transform passes stage the work — md5 hex (ONE digest per
    # distinct shingle; r6 shipped 5, one per probe position), then the
    # Kirsch–Mitzenmacher (h1, h2) pair as a struct — and the probe
    # lambda is pure arithmetic + k O(1) element_at lookups.
    def _km_pair(hx: Column) -> Column:
        return F.struct(
            _bloom_h1(hx).alias("h1"), _bloom_h2(hx).alias("h2")
        )

    def _in_filter(s: Column) -> Column:
        cond = None
        for i in range(BLOOM_K):
            bit = (s["h1"] + i * s["h2"]) % BLOOM_M
            c = F.element_at(bitmap, (bit + 1).cast("int")) == "1"
            cond = c if cond is None else cond & c
        return cond

    maybe = F.size(
        F.filter(
            F.transform(
                F.transform(F.col("_sh"), _bloom_hex), _km_pair
            ),
            _in_filter,
        )
    )
    # Expansion-aware input spread (the periodogram/_ngram_rows idiom):
    # the per-doc HOF chain below is this query's entire cost, and a
    # single-row-group parquet scan arrives as ONE partition locally —
    # without the spread the whole corpus probes on one core (measured
    # 1.16 → ~0.3 s at sf0.1).  Keyed on the doc id; a no-op at real
    # scale where the scan already has ≥ cluster-parallelism splits.
    # This is the ONLY exchange in the plan (pinned in tests) and it is
    # an input-scheduling fix, not a data-dependent shuffle: its volume
    # is the input row count, never the exploded shingle count.
    if not train.isStreaming:
        sc = train.sparkSession.sparkContext
        if train.rdd.getNumPartitions() < sc.defaultParallelism:
            train = train.repartition(
                sc.defaultParallelism, F.col(id_col)
            )
    return (
        train.withColumn("_toks", F.split(F.col(text_col), " "))
        # grams is non-empty exactly when the doc has >= n tokens;
        # filtering on the token count keeps the (non-cheap) shingle
        # transform out of the Filter node so it is built once, in the
        # projection, where its two references block CollapseProject
        .filter(F.size("_toks") >= n)
        .withColumn("_sh", grams)
        .select(
            id_col,
            F.size("_sh").cast("long").alias("n_shingles"),
            maybe.cast("long").alias("n_maybe"),
        )
        .withColumn(
            "maybe_frac", F.round(F.col("n_maybe") / F.col("n_shingles"), 6)
        )
    )


# Histogram-quantile geometry: G fine-grained bins over the observed
# [min, max]. Error ≤ one bin width = range/G; state is ≤ G counters —
# a mergeable sketch, unlike an exact percentile whose aggregation
# buffer holds every value of the group.
HISTQ_BINS = 4096


def histogram_quantiles(
    df: DataFrame, value_col: str = "score", n_quantiles: int = 10,
    n_bins: int = HISTQ_BINS,
) -> DataFrame:
    """Approximate quantile boundaries from a fixed-grid histogram:
    (q, boundary) rows for q = 1/n … (n-1)/n.

    Three bounded-state passes — min/max (2 values), bin counts (≤ G
    rows, map-side combined), cumulative walk over the G-row histogram
    — versus the exact ``percentile``'s single reducer buffering every
    value. Guarantee: within one bin width ((max−min)/G) of the
    ⌈q·N⌉-th order statistic; ties/discrete data can put the
    *interpolated* percentile farther away.  Boundary = the upper edge
    of the first
    bin where the cumulative count reaches ⌈q·N⌉, all exact integer +
    deterministic double arithmetic, so the DuckDB mirror matches
    bit-for-bit."""
    v = F.round(F.col(value_col), 6)
    # NULL scores are excluded up front: a NULL bin would sort FIRST in
    # Spark's cumulative window but LAST in DuckDB, and its rows are
    # not in the count(v) the targets derive from
    df = df.filter(v.isNotNull())
    mm = df.agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi"),
        F.count(v).alias("_n"),
    )
    # bin index: clamp to [0, G-1]; degenerate range (all equal) → bin 0
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    idx = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.floor((v - F.col("_lo")) / width).cast("int"),
        )
    )
    hist = (
        df.crossJoin(F.broadcast(mm))
        .select(idx.alias("bin"), "_lo", "_hi", "_n")
        .groupBy("bin")
        .agg(
            F.count("*").alias("cnt"),
            F.first("_lo").alias("_lo"),
            F.first("_hi").alias("_hi"),
            F.first("_n").alias("_n"),
        )
    )
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    targets = F.array(
        *[
            F.struct(
                F.lit(q).cast("int").alias("q"),
                F.ceil(F.col("_n") * q / n_quantiles).cast("long").alias(
                    "target"
                ),
            )
            for q in range(1, n_quantiles)
        ]
    )
    hit = (
        cum.select("bin", "cum", "_lo", "_hi", "_n", F.explode(targets).alias("t"))
        .filter(
            (F.col("cum") >= F.col("t.target"))
            & (F.col("cum") - F.col("cnt") < F.col("t.target"))
        )
    )
    boundary = F.round(
        F.col("_lo")
        + (F.col("bin") + 1)
        * (F.col("_hi") - F.col("_lo"))
        / F.lit(float(n_bins)),
        6,
    )
    return hit.select(
        F.col("t.q").alias("q"), boundary.alias("boundary")
    )


def histogram_quantiles_sql(
    scored_sql: str, n_quantiles: int = 10, n_bins: int = HISTQ_BINS
) -> str:
    """DuckDB mirror of :func:`histogram_quantiles` (same bin rule,
    same ceil target, same boundary arithmetic). ``scored_sql`` must
    yield a ``score`` column."""
    g = n_bins
    return f"""
WITH s AS (
  SELECT round(score, 6) AS v FROM ({scored_sql}) WHERE score IS NOT NULL
),
mm AS (SELECT min(v) AS lo, max(v) AS hi, count(v) AS n FROM s),
binned AS (
  SELECT CASE WHEN hi = lo THEN 0
         ELSE least({g} - 1,
                    CAST(floor((v - lo) / ((hi - lo) / {float(g)})) AS INT))
         END AS bin
  FROM s, mm
),
hist AS (SELECT bin, count(*) AS cnt FROM binned GROUP BY bin),
cum AS (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
),
targets AS (
  SELECT q, CAST(ceil(n * q / {n_quantiles}) AS BIGINT) AS target
  FROM mm, unnest(generate_series(1, {n_quantiles - 1})) t(q)
),
hit AS (
  SELECT t.q, c.bin FROM cum c, targets t
  WHERE c.cum >= t.target AND c.cum - c.cnt < t.target
)
SELECT CAST(q AS INT) AS q,
       round(lo + (bin + 1) * (hi - lo) / {float(g)}, 6) AS boundary
FROM hit, mm
"""


def grouped_histogram_quantiles(
    df: DataFrame, group_col: str, value_col: str = "score",
    n_quantiles: int = 10, n_bins: int = HISTQ_BINS,
) -> DataFrame:
    """Per-group quantile boundaries from per-group fixed-grid
    histograms: (group, q, boundary) — the per-language / per-domain
    quality-threshold table a mixture pipeline applies group-wise.

    Same three bounded-state passes as :func:`histogram_quantiles`, all
    keyed by the group: per-group min/max/count (one aggregate, tiny
    output for dimension-like groups — broadcast back), per-(group,
    bin) counts, and a cumulative window PARTITIONED by group (≤ G rows
    per group, never a global sort).  State per group is ≤ G counters,
    so a thousand-language corpus costs ~4M counters total where a
    per-group exact percentile would buffer every value."""
    v = F.round(F.col(value_col), 6)
    df = df.filter(v.isNotNull())
    mm = df.groupBy(group_col).agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi"), F.count(v).alias("_n")
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    idx = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.floor((v - F.col("_lo")) / width).cast("int"),
        )
    )
    hist = (
        df.join(F.broadcast(mm), group_col)
        .select(F.col(group_col), idx.alias("bin"), "_lo", "_hi", "_n")
        .groupBy(group_col, "bin")
        .agg(
            F.count("*").alias("cnt"),
            F.first("_lo").alias("_lo"),
            F.first("_hi").alias("_hi"),
            F.first("_n").alias("_n"),
        )
    )
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy(group_col)
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    targets = F.array(
        *[
            F.struct(
                F.lit(q).cast("int").alias("q"),
                F.ceil(F.col("_n") * q / n_quantiles).cast("long").alias(
                    "target"
                ),
            )
            for q in range(1, n_quantiles)
        ]
    )
    hit = cum.select(
        F.col(group_col), "bin", "cum", "cnt", "_lo", "_hi",
        F.explode(targets).alias("t"),
    ).filter(
        (F.col("cum") >= F.col("t.target"))
        & (F.col("cum") - F.col("cnt") < F.col("t.target"))
    )
    boundary = F.round(
        F.col("_lo")
        + (F.col("bin") + 1) * (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins)),
        6,
    )
    return hit.select(
        F.col(group_col), F.col("t.q").alias("q"), boundary.alias("boundary")
    )


def grouped_histogram_quantiles_sql(
    scored_sql: str, group_col: str = "lang",
    n_quantiles: int = 10, n_bins: int = HISTQ_BINS,
) -> str:
    """DuckDB mirror of :func:`grouped_histogram_quantiles`.
    ``scored_sql`` must yield (group_col, score)."""
    g = n_bins
    return f"""
WITH s AS (
  SELECT {group_col}, round(score, 6) AS v
  FROM ({scored_sql}) WHERE score IS NOT NULL
),
mm AS (
  SELECT {group_col}, min(v) AS lo, max(v) AS hi, count(v) AS n
  FROM s GROUP BY {group_col}
),
binned AS (
  SELECT s.{group_col},
         CASE WHEN hi = lo THEN 0
         ELSE least({g} - 1,
                    CAST(floor((v - lo) / ((hi - lo) / {float(g)})) AS INT))
         END AS bin
  FROM s JOIN mm USING ({group_col})
),
hist AS (
  SELECT {group_col}, bin, count(*) AS cnt
  FROM binned GROUP BY {group_col}, bin
),
cum AS (
  SELECT {group_col}, bin, cnt,
         sum(cnt) OVER (PARTITION BY {group_col} ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
),
targets AS (
  SELECT {group_col}, q,
         CAST(ceil(n * q / {n_quantiles}) AS BIGINT) AS target,
         lo, hi
  FROM mm, unnest(generate_series(1, {n_quantiles - 1})) t(q)
),
hit AS (
  SELECT t.{group_col}, t.q, c.bin, t.lo, t.hi
  FROM cum c JOIN targets t USING ({group_col})
  WHERE c.cum >= t.target AND c.cum - c.cnt < t.target
)
SELECT {group_col}, CAST(q AS INT) AS q,
       round(lo + (bin + 1) * (hi - lo) / {float(g)}, 6) AS boundary
FROM hit
"""
