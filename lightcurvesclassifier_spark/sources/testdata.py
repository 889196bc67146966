"""Loaders for the driver's synthetic parquet testdata (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under ``{sf_dir}/``.

The astronomy-shaped views are derived deterministically so the DuckDB
oracle can reproduce them with plain SQL:

- ``observations``: the ``events`` table as a photometric time series
  (user → star, ts → t in days since 2024-01-01, value → mag). The
  reference's analog is one light curve per star
  (lcc/entities/light_curve.py).
- ``stars``: the ``customer`` table as a star catalog with synthetic
  sky coordinates derived from the key (golden-angle spiral — evenly
  spreads points over the sphere, deterministic in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Nano-epoch of 2024-01-01 UTC; events ts → float days since then.
# events.ts is parquet TIMESTAMP(NANOS). Depending on the Spark build it
# resolves either as long nanos (spark.sql.legacy.parquet.nanosAsLong,
# honored through 4.0) or as timestamp_ntz (4.1+, where the legacy conf
# no longer takes effect). DuckDB reads it as TIMESTAMP_NS. observations()
# branches on the loaded dtype so both reader behaviors yield the same t;
# the testdata generator emits whole-microsecond stamps (ns % 1000 == 0,
# asserted in tests), so the microsecond path is bit-exact vs epoch_ns.
_EPOCH_NS = 1_704_067_200_000_000_000
_NS_PER_DAY = 86_400_000_000_000.0
_EPOCH_US = 1_704_067_200_000_000
_US_PER_DAY = 86_400_000_000.0

# SQL fragment the DuckDB oracle uses for the same observations view.
OBS_SQL = (
    "SELECT user_id AS star_id, event_type AS band, "
    f"(epoch_ns(ts) - {_EPOCH_NS}) / {_NS_PER_DAY} AS t, "
    "value AS mag FROM events"
)

# Synthetic star catalog from `customer`: golden-angle RA, key-spread dec.
# `e0` suffixes force DOUBLE literals in DuckDB (it parses bare decimal
# literals as DECIMAL, which would diverge from Spark's double arithmetic).
STARS_SQL = (
    "SELECT c_custkey AS star_id, c_name AS name, "
    "fmod(c_custkey * 137.508e0, 360.0e0) AS ra_deg, "
    "fmod(c_custkey * 61.803e0, 180.0e0) - 90.0e0 AS dec_deg, "
    "c_mktsegment AS star_class, c_acctbal AS acctbal "
    "FROM customer"
)


# Deterministic `more` properties layered onto the star catalog, so the
# map-typed open-schema path (Star.more, lcc/entities/star.py:40-45) is
# exercisable with an exact SQL oracle. Some keys are deliberately missing
# for some stars (NULL map values) to cover the pass_not_found / ifnot
# default paths of ColorIndexDescr / PropertyDescr.
#   b_mag  : 10 + (key % 97)/10, missing when key % 11 == 0
#   v_mag  : 10 + (key % 89)/10, always present
#   period : 0.5 + (key % 40)/8, missing when key % 3 == 1
B_MAG_SQL = "CASE WHEN c_custkey % 11 <> 0 THEN 10.0e0 + (c_custkey % 97) / 10.0e0 END"
V_MAG_SQL = "10.0e0 + (c_custkey % 89) / 10.0e0"
PERIOD_SQL = "CASE WHEN c_custkey % 3 <> 1 THEN 0.5e0 + (c_custkey % 40) / 8.0e0 END"

PERIODS_SQL = (
    f"SELECT c_custkey AS star_id, 0.5e0 + (c_custkey % 40) / 8.0e0 AS period "
    "FROM customer WHERE c_custkey % 3 <> 1"
)


def stars_more(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star catalog + open-schema ``more`` map (MapType path of the engine).

    Values are derived from the key so DuckDB can mirror the *contents*
    (B_MAG_SQL / V_MAG_SQL / PERIOD_SQL) without needing map types."""
    k = F.col("star_id")
    b_mag = F.when(k % 11 != 0, 10.0 + (k % 97) / F.lit(10.0))
    v_mag = 10.0 + (k % 89) / F.lit(10.0)
    period = F.when(k % 3 != 1, 0.5 + (k % 40) / F.lit(8.0))
    return stars(spark, sf_dir).withColumn(
        "more",
        F.create_map(
            F.lit("b_mag"), b_mag, F.lit("v_mag"), v_mag, F.lit("period"), period
        ),
    )


def periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small (star_id, period) dimension for phase folding — broadcast side."""
    sm = stars_more(spark, sf_dir)
    return sm.select(
        "star_id", F.element_at("more", "period").alias("period")
    ).filter(F.col("period").isNotNull())


# Synthetic detection catalog from `orders`: each order is a "detection" of
# its customer's star, jittered by a deterministic sub-arcsecond offset —
# some within the 0.5″ crossmatch EPS, some beyond (exercises the refine).
DETECTIONS_SQL = (
    "SELECT o_orderkey AS det_id, o_custkey AS star_id, "
    "fmod(o_custkey * 137.508e0, 360.0e0) + ((o_orderkey % 7) - 3) * 7e-5 AS ra_deg, "
    "fmod(o_custkey * 61.803e0, 180.0e0) - 90.0e0 + ((o_orderkey % 5) - 2) * 4e-5 AS dec_deg "
    "FROM orders"
)


# Dedup test corpus: documents ∪ exact copies (doc_id % 7) ∪ near-dup
# copies with ' zz' appended (doc_id % 10). Deterministic planted
# duplicates so dedup operators have a non-trivial, oracle-checkable
# answer (the raw documents table contains no duplicates).
DEDUP_CORPUS_SQL = (
    "SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0 "
    "UNION ALL SELECT doc_id + 1000000 AS doc_id, text || ' zz' AS text "
    "FROM documents WHERE doc_id % 10 = 0"
)

# same synthetic dup structure, carrying the language stratum (the
# stratified cluster-safe split needs a stratum column on the corpus)
DEDUP_CORPUS_LANG_SQL = (
    "SELECT doc_id, text, lang FROM documents "
    "UNION ALL SELECT doc_id + 2000000 AS doc_id, text, lang FROM documents WHERE doc_id % 7 = 0 "
    "UNION ALL SELECT doc_id + 1000000 AS doc_id, text || ' zz' AS text, lang "
    "FROM documents WHERE doc_id % 10 = 0"
)


def dedup_corpus_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`dedup_corpus` carrying the ``lang`` stratum column."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    exact = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text", "lang"
    )
    near = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        "lang",
    )
    return d.unionByName(exact).unionByName(near)


def dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    near = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    return d.unionByName(exact).unionByName(near)


# Synthetic per-star calibration epochs (an as-of-join dimension): 14
# epochs every 50 days, phase-offset per star so some early events have
# no prior epoch (exercising the left-join null path); gain drifts
# deterministically per (star, epoch). `e0` suffixes force DOUBLE in
# DuckDB (same convention as STARS_SQL).
CALIB_SQL = (
    "SELECT s.star_id, "
    "CAST(k * 50.0e0 + (s.star_id % 7) AS DOUBLE) AS calib_t, "
    "round(1.0e0 + (s.star_id % 5) * 0.01e0 + k * 0.001e0, 6) AS gain "
    f"FROM (SELECT DISTINCT user_id AS star_id FROM events) s, "
    "unnest(generate_series(0, 13)) t(k)"
)


def calibrations(spark: SparkSession, sf_dir: str) -> DataFrame:
    stars = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("star_id"))
        .distinct()
    )
    k = F.explode(F.sequence(F.lit(0), F.lit(13))).alias("k")
    sid = F.col("star_id")
    return stars.select("star_id", k).select(
        "star_id",
        (F.col("k") * 50.0 + (sid % 7)).cast("double").alias("calib_t"),
        F.round(1.0 + (sid % 5) * 0.01 + F.col("k") * 0.001, 6).alias("gain"),
    )


# Planted-PII corpus: deterministic email / IPv4 / phone insertions so the
# redaction operator has a non-trivial, oracle-checkable answer (the raw
# documents contain no PII-shaped strings).
PII_CORPUS_SQL = (
    "SELECT doc_id, CASE "
    "WHEN doc_id % 11 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' "
    "WHEN doc_id % 11 = 1 THEN text || ' server at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.17 port' "
    "WHEN doc_id % 11 = 2 THEN text || ' call +1 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR) || ' today' "
    "ELSE text END AS text FROM documents"
)


def pii_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    text = (
        F.when(
            did % 11 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            did % 11 == 1,
            F.concat(
                F.col("text"),
                F.lit(" server at 10.0."),
                (did % 256).cast("string"),
                F.lit(".17 port"),
            ),
        )
        .when(
            did % 11 == 2,
            F.concat(
                F.col("text"),
                F.lit(" call +1 555-"),
                (1000 + did % 9000).cast("string"),
                F.lit(" today"),
            ),
        )
        .otherwise(F.col("text"))
    )
    return d.select("doc_id", text.alias("text"))


# Planted-URL corpus: deterministic http(s) URL insertions so the
# domain-extraction operator has a non-trivial, oracle-checkable answer
# (the raw documents contain no URL-shaped strings). Domains repeat
# (doc_id % 5) so the per-domain rollup has real aggregation to do.
URL_CORPUS_SQL = (
    "SELECT doc_id, CASE "
    "WHEN doc_id % 9 = 0 THEN text || ' see https://cdn' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/a' || CAST(doc_id AS VARCHAR) || ' now' "
    "WHEN doc_id % 9 = 1 THEN text || ' via http://www.site' || CAST(doc_id % 5 AS VARCHAR) || '.test/x and https://cdn' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/b' "
    "ELSE text END AS text FROM documents"
)


def url_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    text = (
        F.when(
            did % 9 == 0,
            F.concat(
                F.col("text"),
                F.lit(" see https://cdn"),
                (did % 5).cast("string"),
                F.lit(".example.org/a"),
                did.cast("string"),
                F.lit(" now"),
            ),
        )
        .when(
            did % 9 == 1,
            F.concat(
                F.col("text"),
                F.lit(" via http://www.site"),
                (did % 5).cast("string"),
                F.lit(".test/x and https://cdn"),
                (did % 5).cast("string"),
                F.lit(".example.org/b"),
            ),
        )
        .otherwise(F.col("text"))
    )
    return d.select("doc_id", text.alias("text"))


# Synthetic benchmark/eval set for decontamination: "contaminated" eval
# rows are verbatim 18-token slices of training docs (doc_id % 13 == 0,
# containment 1.0 by construction); "clean" rows are the same slices
# token-reversed (doc_id % 13 == 1) — their shingles (almost surely)
# appear nowhere in the corpus, so they fall under any threshold.
CONTAM_EVAL_SQL = (
    "SELECT doc_id + 5000000 AS doc_id, "
    "array_to_string((string_split(text, ' '))[4:21], ' ') AS text "
    "FROM documents WHERE doc_id % 13 = 0 "
    "UNION ALL SELECT doc_id + 6000000 AS doc_id, "
    "array_to_string(list_reverse((string_split(text, ' '))[4:21]), ' ') AS text "
    "FROM documents WHERE doc_id % 13 = 1"
)


def contamination_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    sliced = F.slice(toks, 4, 18)
    contaminated = d.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.array_join(sliced, " ").alias("text"),
    )
    clean = d.filter(F.col("doc_id") % 13 == 1).select(
        (F.col("doc_id") + 6000000).alias("doc_id"),
        F.array_join(F.reverse(sliced), " ").alias("text"),
    )
    return contaminated.unionByName(clean)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet stores TIMESTAMP(NANOS). On Spark ≤4.0 it is only
    # readable with nanosAsLong (raw longs); on 4.1+ that conf is a no-op
    # and the column resolves as timestamp_ntz. Set the conf defensively
    # (harmless where ignored) and pin the session timezone to UTC so the
    # ntz→timestamp cast in observations() is wall-clock-exact even for
    # sessions built outside session.get_spark (e.g. a driver harness).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → OBSERVATIONS long format. t is float days since 2024-01-01,
    computed from integer nanoseconds so Spark and DuckDB agree bit-for-bit.
    """
    e = load_table(spark, sf_dir, "events")
    ts_type = dict(e.dtypes)["ts"]
    if ts_type.startswith("timestamp"):
        # 4.1+ path: ts is timestamp/timestamp_ntz. unix_micros needs a
        # TIMESTAMP; the ntz→timestamp cast uses the session timezone,
        # which load_table pins to UTC, so this is exact (stamps are
        # whole microseconds — see _EPOCH_NS comment).
        t = (
            F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(_EPOCH_US)
        ) / F.lit(_US_PER_DAY)
    else:
        # ≤4.0 path: nanosAsLong gave us raw int64 nanoseconds.
        t = (F.col("ts") - F.lit(_EPOCH_NS)) / F.lit(_NS_PER_DAY)
    return e.select(
        F.col("user_id").alias("star_id"),
        F.col("event_type").alias("band"),
        t.alias("t"),
        F.col("value").alias("mag"),
        F.lit(None).cast("double").alias("err"),
    )


def stars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → synthetic star catalog with deterministic coordinates.

    ``ra_deg = (key * 137.508) mod 360`` (golden angle) and
    ``dec_deg = (key * 61.803) mod 180 - 90`` give a deterministic
    pseudo-uniform sky scatter reproducible in ANSI SQL (``fmod``).
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("star_id"),
        F.col("c_name").alias("name"),
        (F.col("c_custkey") * F.lit(137.508) % F.lit(360.0)).alias("ra_deg"),
        ((F.col("c_custkey") * F.lit(61.803) % F.lit(180.0)) - F.lit(90.0)).alias(
            "dec_deg"
        ),
        F.col("c_mktsegment").alias("star_class"),
        F.col("c_acctbal").alias("acctbal"),
    )


def detections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → jittered re-detections of the customer stars (see
    DETECTIONS_SQL). Used to exercise the crossmatch join."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("det_id"),
        F.col("o_custkey").alias("star_id"),
        (
            (F.col("o_custkey") * F.lit(137.508) % F.lit(360.0))
            + ((F.col("o_orderkey") % 7) - 3) * F.lit(7e-5)
        ).alias("ra_deg"),
        (
            (F.col("o_custkey") * F.lit(61.803) % F.lit(180.0))
            - F.lit(90.0)
            + ((F.col("o_orderkey") % 5) - 2) * F.lit(4e-5)
        ).alias("dec_deg"),
    )


# Ident-carrying variants for the full Star.__eq__ crossmatch: every
# star's ident is {"main": name}; every third detection carries an ident
# pointing at a DIFFERENT star (key+7) — matches the ident path without
# (usually) matching the coordinate path, so both join halves do work.
STARS_IDENT_SQL = (
    "SELECT *, printf('Customer#%09d', star_id) AS ident_name "
    f"FROM ({STARS_SQL})"
)
DETECTIONS_IDENT_SQL = (
    "SELECT *, CASE WHEN det_id % 3 = 0 "
    "THEN printf('Customer#%09d', (star_id + 7)) END AS ident_name "
    f"FROM ({DETECTIONS_SQL})"
)


def stars_ident(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = stars(spark, sf_dir)
    return st.withColumn(
        "ident", F.create_map(F.lit("main"), F.col("name"))
    )


def detections_ident(spark: SparkSession, sf_dir: str) -> DataFrame:
    det = detections(spark, sf_dir)
    name = F.format_string("Customer#%09d", F.col("star_id") + 7)
    return det.withColumn(
        "ident",
        F.when(
            F.col("det_id") % 3 == 0, F.create_map(F.lit("main"), name)
        ),
    )


def curves(
    spark: SparkSession, sf_dir: str, per_band: bool = False,
    spread: bool = False,
) -> DataFrame:
    """Collected array view of ``observations`` for per-curve kernels.

    One row per star (or per star+band): time/mag arrays sorted by t.
    This is the scale-sensitive step — `collect_list` after an explicit
    in-partition sort; group sizes are bounded by per-star sample counts
    (thousands), not by table size, so it shards cleanly at 100 TB.

    ``spread=True`` is for consumers whose per-curve work is COMPUTE
    heavy but byte light (SAX words, variogram kernels, sliding
    comparatives): AQE coalesces the groupBy's shuffle read by BYTES
    (advisoryPartitionSizeInBytes), so a small-scale curves table lands
    in one or two partitions and the downstream Python/interpreted-fold
    stage runs nearly single-threaded (r10 measured: the comparative
    family spent its whole budget on 1-2-task stages).  The fix pins
    the SAME shuffle the groupBy already needs to defaultParallelism
    via a keyed repartition — no extra exchange (the aggregate reuses
    the clustering), and the pin is applied only when the upstream scan
    has fewer partitions than the cluster (the repo's expansion-aware
    spread idiom): at real scale the scan is wide and AQE's byte-based
    sizing is the right call, so this is a no-op there.
    """
    obs = observations(spark, sf_dir)
    keys = ["star_id", "band"] if per_band else ["star_id"]
    if spread and not obs.isStreaming:
        sc = spark.sparkContext
        if obs.rdd.getNumPartitions() < sc.defaultParallelism:
            obs = obs.repartition(
                sc.defaultParallelism, *[F.col(k) for k in keys]
            )
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col("t"), F.col("mag")))
    )
    return (
        obs.groupBy(*keys)
        .agg(pairs.alias("pairs"))
        .select(
            *keys,
            F.col("pairs.t").alias("time"),
            F.col("pairs.mag").alias("mag"),
        )
    )


# Messy-text corpus for the normalization operator: deterministic noise
# classes planted per doc_id residue — typographic quotes/dashes, NBSP,
# shouting caps, CR/LF and tab debris, doubled spaces — so
# text.normalize_text has real work, identically on both engines.
NOISY_CORPUS_SQL = (
    "SELECT doc_id, CASE "
    "WHEN doc_id % 8 = 0 THEN '  ' || chr(9) || '“' || text || '”' "
    "|| chr(160) || '— fin ' "
    "WHEN doc_id % 8 = 1 THEN upper(text) || chr(13) || chr(10) "
    "WHEN doc_id % 8 = 2 THEN replace(text, ' ', '  ') "
    "WHEN doc_id % 8 = 3 THEN '‘' || text || '’' || chr(9) || chr(9) "
    "ELSE text END AS text FROM documents"
)


def noisy_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    t = F.col("text")
    text = (
        F.when(
            did % 8 == 0,
            F.concat(
                F.lit("  \t“"), t, F.lit("” — fin ")
            ),
        )
        .when(did % 8 == 1, F.concat(F.upper(t), F.lit("\r\n")))
        .when(did % 8 == 2, F.replace(t, F.lit(" "), F.lit("  ")))
        .when(
            did % 8 == 3,
            F.concat(F.lit("‘"), t, F.lit("’\t\t")),
        )
        .otherwise(t)
    )
    return d.select("doc_id", text.alias("text"))


# Multi-line corpus with planted cross-document boilerplate: every doc
# becomes 3 newline-separated lines — a unique head (the original
# text), a middle that is shared boilerplate for doc_id % 3 == 0, and
# a tail that is shared boilerplate for doc_id % 2 == 0 — so a C4-style
# line-level dedup has real work with an exact oracle.
BOILER_A = "subscribe to our newsletter for daily updates"
BOILER_B = "all rights reserved contact us for licensing"
LINES_CORPUS_SQL = (
    "SELECT doc_id, text || chr(10) || "
    f"CASE WHEN doc_id % 3 = 0 THEN '{BOILER_A}' "
    "ELSE 'middle section ' || CAST(doc_id AS VARCHAR) END || chr(10) || "
    f"CASE WHEN doc_id % 2 = 0 THEN '{BOILER_B}' "
    "ELSE 'closing note ' || CAST(doc_id AS VARCHAR) END AS text "
    "FROM documents"
)


def lines_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    mid = F.when(did % 3 == 0, F.lit(BOILER_A)).otherwise(
        F.concat(F.lit("middle section "), did.cast("string"))
    )
    tail = F.when(did % 2 == 0, F.lit(BOILER_B)).otherwise(
        F.concat(F.lit("closing note "), did.cast("string"))
    )
    text = F.concat(
        F.col("text"), F.lit("\n"), mid, F.lit("\n"), tail
    )
    return d.select("doc_id", text.alias("text"))


# Web-page-shaped corpus for the C4 cleaning rules (Raffel et al. 2020
# §2.2): every doc becomes 4 newline-separated "lines" with planted
# rule triggers — a head line whose terminal punctuation varies by
# doc_id, a short "click here" line (under the 5-word minimum) for
# doc_id % 5 == 0, a javascript boilerplate line for doc_id % 7 == 0,
# and a closing line that plants the doc-level poisons ("lorem ipsum"
# for % 11 == 0, a '{' for % 13 == 0) — so every C4 rule fires on a
# known doc subset with an exact oracle.
C4_CORPUS_SQL = (
    "SELECT doc_id, "
    "array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ') || "
    "CASE WHEN doc_id % 4 = 3 THEN '' WHEN doc_id % 4 = 2 THEN '!' "
    "ELSE '.' END || chr(10) || "
    "CASE WHEN doc_id % 5 = 0 THEN 'click here' "
    "ELSE 'the quick survey of section ' || CAST(doc_id AS VARCHAR) "
    "|| ' is complete.' END || chr(10) || "
    "CASE WHEN doc_id % 7 = 0 "
    "THEN 'please enable javascript to continue reading this page.' "
    "ELSE 'archived notes for record ' || CAST(doc_id AS VARCHAR) "
    "|| ' follow below.' END || chr(10) || "
    "CASE WHEN doc_id % 11 = 0 THEN 'lorem ipsum dolor sit amet.' "
    "WHEN doc_id % 13 = 0 THEN 'config = { verbose } done.' "
    "ELSE 'standard closing statement for document ' "
    "|| CAST(doc_id AS VARCHAR) || '.' END AS text "
    "FROM documents"
)


def c4_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    ds = did.cast("string")
    head = F.concat(
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " "),
        F.when(did % 4 == 3, F.lit(""))
        .when(did % 4 == 2, F.lit("!"))
        .otherwise(F.lit(".")),
    )
    l2 = F.when(did % 5 == 0, F.lit("click here")).otherwise(
        F.concat(
            F.lit("the quick survey of section "), ds,
            F.lit(" is complete."),
        )
    )
    l3 = F.when(
        did % 7 == 0,
        F.lit("please enable javascript to continue reading this page."),
    ).otherwise(
        F.concat(
            F.lit("archived notes for record "), ds, F.lit(" follow below.")
        )
    )
    l4 = (
        F.when(did % 11 == 0, F.lit("lorem ipsum dolor sit amet."))
        .when(did % 13 == 0, F.lit("config = { verbose } done."))
        .otherwise(
            F.concat(
                F.lit("standard closing statement for document "), ds,
                F.lit("."),
            )
        )
    )
    text = F.concat_ws("\n", head, l2, l3, l4)
    return d.select("doc_id", text.alias("text"))
