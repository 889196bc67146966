"""Text-analysis operators for the training-data pipeline surface.

These extend the reference's feature-extraction model (descriptors over
light curves) to document tables: language-ID, quality scoring, token
counting, and fingerprinting over a ``documents(doc_id, text, ...)``
table. Everything is built-in Spark SQL (split / higher-order functions /
md5) so Catalyst vectorizes it and the DuckDB oracle can mirror each
expression exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# A small closed stopword list (shared with the SQL oracle).
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# Language marker tokens for the n-gram/keyword language-ID heuristic.
# Deterministic argmax with alphabetical tie-break.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist"],
    "en": ["the", "a", "and", "is", "of"],
    "es": ["el", "la", "los", "es", "y"],
    "fr": ["le", "la", "les", "est", "et"],
    "zh": ["de", "shi", "bu", "le", "zai"],
}


def _tokens(col: Column) -> Column:
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(_tokens(col))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality signals per document.

    All ratios are exact rational arithmetic over integer counts (then one
    double division), so the SQL oracle reproduces them bit-for-bit.
    """
    t = F.col(text_col)
    toks = _tokens(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    punct = n_chars - F.length(F.regexp_replace(t, "[.,!?;:]", ""))
    # guards: an empty text has n_chars=0, and under Spark 4's default
    # ANSI mode a bare x/0 throws DIVIDE_BY_ZERO and kills the job; the
    # DuckDB oracle returns NULL for the same row — emit NULL explicitly
    # on both engines. (n_tokens is never 0: split('') yields [''].)
    return df.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(n_chars / n_tokens, 6).alias("avg_token_len"),
        F.round(stop_hits / n_tokens, 6).alias("stopword_ratio"),
        F.when(n_chars > 0, F.round(punct / n_chars, 6)).alias("punct_ratio"),
    )


def quality_features_sql(stopwords: list[str] | None = None) -> str:
    sw = ", ".join(f"'{w}'" for w in (stopwords or STOPWORDS))
    return f"""
SELECT doc_id,
       length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens,
       round(length(text) / len(string_split(text, ' ')), 6) AS avg_token_len,
       round(len(list_filter(string_split(text, ' '), x -> x IN ({sw})))
             / len(string_split(text, ' ')), 6) AS stopword_ratio,
       CASE WHEN length(text) > 0 THEN
         round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
               / length(text), 6) END AS punct_ratio
FROM documents
"""


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language ID: count markers per language, argmax with
    alphabetical tie-break. A heuristic operator (the real signal on
    natural text), expressed as pure columnar counts."""
    toks = _tokens(F.col(text_col))
    counts = {
        lang: F.size(F.filter(toks, lambda x: x.isin(markers))).alias(f"c_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    # the ground-truth label is optional — prediction must work on an
    # unlabeled corpus; lang_actual is only emitted when present
    has_label = "lang" in df.columns
    label = [F.col("lang").alias("lang_actual")] if has_label else []
    out = df.select("doc_id", *label, *counts.values())
    # argmax with alphabetical tie-break: fold over langs in sorted order,
    # strictly-greater replaces — earlier (alphabetically smaller) wins ties.
    langs = sorted(LANG_MARKERS)
    best_lang = F.lit(langs[0])
    best_cnt = F.col(f"c_{langs[0]}")
    for lang in langs[1:]:
        c = F.col(f"c_{lang}")
        best_lang = F.when(c > best_cnt, F.lit(lang)).otherwise(best_lang)
        best_cnt = F.when(c > best_cnt, c).otherwise(best_cnt)
    return out.select(
        "doc_id",
        *(["lang_actual"] if has_label else []),
        best_lang.alias("lang_pred"),
        best_cnt.cast("long").alias("marker_hits"),
    )


def lang_id_sql() -> str:
    langs = sorted(LANG_MARKERS)
    count_exprs = ",\n       ".join(
        "len(list_filter(string_split(text, ' '), x -> x IN ({}))) AS c_{}".format(
            ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]), lang
        )
        for lang in langs
    )
    # same fold: strictly-greater replaces, alphabetical first wins ties
    pred = f"'{langs[0]}'"
    cnt = f"c_{langs[0]}"
    for lang in langs[1:]:
        pred = f"CASE WHEN c_{lang} > {cnt} THEN '{lang}' ELSE {pred} END"
        cnt = f"CASE WHEN c_{lang} > {cnt} THEN c_{lang} ELSE {cnt} END"
    return f"""
WITH counts AS (
  SELECT doc_id, lang AS lang_actual,
       {count_exprs}
  FROM documents
)
SELECT doc_id, lang_actual, {pred} AS lang_pred, {cnt} AS marker_hits
FROM counts
"""


# Regex shared by both engines (Java regex and RE2 agree on this
# subset): letter runs, digit runs, or single punctuation marks — the
# BPE-pretokenizer shape (word/number/symbol boundaries).
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting, twice: whitespace tokens and a BPE-ish regex
    pretokenization (letters/digits/punct split) — the usual
    cost-estimation signals for training-data pipelines. Pure JVM
    regexp_count, no Python."""
    t = F.col(text_col)
    return df.select(
        "doc_id",
        token_count(t).cast("long").alias("ws_tokens"),
        F.regexp_count(t, F.lit(BPE_TOKEN_RE)).cast("long").alias("bpe_tokens"),
    )


BPE_TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS bpe_tokens
FROM documents
"""


def rolling_fingerprint(
    df: DataFrame, window: int = 8, text_col: str = "text"
) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-style): hash every
    sliding ``window``-token span, keep the minimum — robust to local
    edits anywhere outside the minimizing span, unlike the whole-text
    md5. Built-ins only: sequence → transform(md5 of each span) →
    array_min; md5-hex ordering is shared with the oracle."""
    # tokens pre-materialized: Catalyst does not CSE expressions inside
    # a transform() lambda, so an inline split would re-split the text
    # once per span position (see dedup.shingles)
    tk = F.col("_toks")
    n = F.size(tk)
    spans = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (window - 1), F.lit(1))),
        lambda i: F.md5(F.array_join(F.slice(tk, i, window), " ")),
    )
    return df.withColumn("_toks", _tokens(F.col(text_col))).select(
        "doc_id", F.array_min(spans).alias("rolling_fp")
    )


def rolling_fingerprint_sql(window: int = 8) -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
SELECT doc_id,
       list_min(list_transform(
         generate_series(1, greatest(len(tk) - {window - 1}, 1)),
         i -> md5(array_to_string(tk[i:i+{window - 1}], ' ')))) AS rolling_fp
FROM toks
"""


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the case-folded, whitespace-collapsed
    text (content-defined identity for exact dedup; both engines share
    md5)."""
    # explicit class, not \\s: Java regex counts U+000B as whitespace,
    # DuckDB's RE2 does not — the oracles must agree byte-for-byte
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[ \\t\\n\\r\\f]+", " ")
    return df.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.substring(F.md5(norm), 1, 16).alias("fingerprint16"),
    )


FINGERPRINT_SQL = """
SELECT doc_id,
       md5(regexp_replace(lower(text), '[ \\t\\n\\r\\f]+', ' ', 'g')) AS fingerprint,
       substr(md5(regexp_replace(lower(text), '[ \\t\\n\\r\\f]+', ' ', 'g')), 1, 16) AS fingerprint16
FROM documents
"""


def tfidf_top_terms(
    df: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF (the sklearn
    formula: ``tf * (ln((1+N)/(1+df)) + 1)``).

    The classic three-stage relational dataflow: term frequencies
    (shuffle on (doc, term)), document frequencies (shuffle on term —
    the natural reduce-side join key; a hot stopword is the skew risk
    and AQE's skew-join splits it), then a per-doc top-k window
    (shuffle on doc). The corpus size ``N`` is a one-row aggregate,
    broadcast — never a driver round-trip. Ties are broken by term
    (ascending) on the *rounded* score so both engines rank
    identically.
    """
    from pyspark.sql import Window

    tf = (
        df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    idf = F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(F.col("tf") * idf, 6))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(
            id_col,
            F.col("term_rank").cast("long").alias("term_rank"),
            "term",
            "tf",
            "tfidf",
        )
    )


def tfidf_top_terms_sql(k: int = 5) -> str:
    """DuckDB mirror of :func:`tfidf_top_terms` (same expression order)."""
    return f"""
WITH tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf,
         round(t.tf * (ln((1.0 + n.n_docs) / (1.0 + d.df)) + 1.0), 6) AS tfidf
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tf, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS term_rank
  FROM scored
)
SELECT doc_id, term_rank, term, tf, tfidf FROM ranked WHERE term_rank <= {k}
"""


# PII patterns shared by both engines (Java regex and RE2 agree on this
# subset — character classes, bounded repeats, \b word boundaries).
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PII_PHONE_RE = "\\+1 555-[0-9]{4}"


def pii_redacted_text(col: Column) -> Column:
    """The redaction chain (email → IP → phone, order is contract) as a
    reusable Column — shared by the batch operator and the streaming
    scrub so the two can never desynchronize."""
    red = F.regexp_replace(col, PII_EMAIL_RE, "[EMAIL]")
    red = F.regexp_replace(red, PII_IPV4_RE, "[IP]")
    return F.regexp_replace(red, PII_PHONE_RE, "[PHONE]")


def pii_counts(col: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) count columns for ``col``."""
    return (
        F.regexp_count(col, F.lit(PII_EMAIL_RE)).cast("long"),
        F.regexp_count(col, F.lit(PII_IPV4_RE)).cast("long"),
        F.regexp_count(col, F.lit(PII_PHONE_RE)).cast("long"),
    )


def stopword_ratio(col: Column) -> Column:
    """Stopword fraction of the whitespace tokens of ``col``."""
    toks = _tokens(col)
    return F.size(F.filter(toks, lambda x: x.isin(STOPWORDS))) / F.size(toks)


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrub: count and redact emails / IPv4s / phone patterns.

    The standard pre-training privacy pass. Pure JVM regexp (no Python),
    embarrassingly parallel — no shuffle at all; at 100 TB this is a
    map-only stage fused into the scan. Redaction order (email → ip →
    phone) is part of the contract, mirrored in the oracle."""
    t = F.col(text_col)
    n_em, n_ip, n_ph = pii_counts(t)
    return df.select(
        "doc_id",
        n_em.alias("n_emails"),
        n_ip.alias("n_ips"),
        n_ph.alias("n_phones"),
        F.md5(pii_redacted_text(t)).alias("redacted_md5"),
    )


def pii_redact_sql(corpus_sql: str) -> str:
    e, i, p = PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE
    return f"""
WITH corpus AS ({corpus_sql})
SELECT doc_id,
       len(regexp_extract_all(text, '{e}')) AS n_emails,
       len(regexp_extract_all(text, '{i}')) AS n_ips,
       len(regexp_extract_all(text, '{p}')) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(
           text, '{e}', '[EMAIL]', 'g'), '{i}', '[IP]', 'g'),
           '{p}', '[PHONE]', 'g')) AS redacted_md5
FROM corpus
"""


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals: duplicate-token fraction (a
    zero-shuffle array expression) and top-bigram fraction (explode →
    count → per-doc max; shuffle keyed (doc, bigram) with map-side
    combine — the honest MapReduce shape for the heavy-hitter count)."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    dup_frac = F.round((n - F.size(F.array_distinct(toks))) / n, 6)
    base = df.select("doc_id", dup_frac.alias("dup_token_frac"),
                     n.cast("long").alias("n_tokens"))
    # guard: a 1-token doc would make sequence(1, 0) DESCEND and slice()
    # throw (same failure class as the dedup shingle paths); the oracle's
    # generate_series is empty for the same doc, so the guard keeps the
    # engines aligned (doc then drops out of the inner join on both sides)
    # tokens pre-materialized: no CSE inside transform() lambdas — an
    # inline _tokens() would re-split the text once per bigram position
    tk = F.col("_toks")
    bgs = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.array_join(F.slice(tk, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bigrams = df.withColumn("_toks", _tokens(F.col(text_col))).select(
        "doc_id", F.explode(bgs).alias("bigram")
    )
    top = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("total_c"))
        .select(
            "doc_id",
            F.round(F.col("top_c") / F.col("total_c"), 6).alias("top_bigram_frac"),
        )
    )
    return base.join(top, "doc_id").select(
        "doc_id", "n_tokens", "dup_token_frac", "top_bigram_frac"
    )


REPETITION_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
base AS (
  SELECT doc_id, len(tk) AS n_tokens,
         round((len(tk) - len(list_distinct(tk))) / len(tk), 6) AS dup_token_frac
  FROM toks
),
bg AS (
  SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS bigram
  FROM toks, unnest(generate_series(1, len(tk) - 1)) AS t(i)
),
cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram),
top AS (
  SELECT doc_id, round(max(c) / sum(c), 6) AS top_bigram_frac
  FROM cnt GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens, b.dup_token_frac, t.top_bigram_frac
FROM base b JOIN top t USING (doc_id)
"""


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking — the RAG/pretraining segmenter:
    fixed ``chunk_size``-token windows advancing by ``chunk_size -
    overlap`` tokens, last window clamped at the document end.

    Pure JVM: one sequence-explode + array slice per document, no
    shuffle at all (map-only — every chunk row derives from its own
    document row), so at 100 TB this is a pass-through projection that
    parallelizes with the scan. Chunk text is emitted as its md5 (the
    compact, oracle-hashable identity; a real pipeline would keep the
    slice itself — same plan shape).
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(overlap)) / F.lit(float(stride))).cast("int"),
    )
    sized = df.select(
        F.col(id_col), toks.alias("_tk"), n.alias("_n"), n_chunks.alias("_nc")
    )
    i = F.col("_i")
    start = i * stride
    chunk = F.slice(F.col("_tk"), start + 1, chunk_size)
    return (
        sized.select(
            id_col,
            "_tk",
            "_n",
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("_i"),
        )
        .select(
            id_col,
            i.cast("long").alias("chunk_idx"),
            start.cast("long").alias("start_tok"),
            F.least(F.lit(chunk_size), F.col("_n") - start)
            .cast("long")
            .alias("n_chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
        )
    )


def chunk_documents_sql(
    chunk_size: int = 64, overlap: int = 16, table: str = "documents"
) -> str:
    """DuckDB mirror of :func:`chunk_documents` (1-based inclusive list
    slicing mirrors Spark's slice(start, length) clamping)."""
    stride = chunk_size - overlap
    return f"""
WITH sized AS (
  SELECT doc_id, string_split(text, ' ') AS tk,
         len(string_split(text, ' ')) AS n,
         greatest(1, CAST(ceil((len(string_split(text, ' ')) - {overlap})
                               / {float(stride)!r}) AS INT)) AS nc
  FROM {table}
),
expanded AS (
  SELECT doc_id, tk, n, unnest(generate_series(0, nc - 1)) AS i
  FROM sized
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * {stride} AS BIGINT) AS start_tok,
       CAST(least({chunk_size}, n - i * {stride}) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(tk[i * {stride} + 1 : i * {stride} + {chunk_size}], ' '))
         AS chunk_md5
FROM expanded
"""


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram log-probability quality score — the perplexity-proxy
    filter of CCNet-style pipelines (score docs by how typical their
    tokens are of the corpus; outliers in either direction are low
    quality or boilerplate).

    Two aggregates: corpus token counts (one shuffle on token), then a
    token→logprob BROADCAST join back onto the exploded docs and a
    per-doc mean (one shuffle on doc id). The vocabulary is bounded by
    distinct tokens, not corpus size — broadcasting it keeps the huge
    exploded-token side completely unshuffled by the join (without the
    hint the plan sort-merge-joins on `tok`, shuffling the whole token
    stream)."""
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    counts = tok.groupBy("tok").agg(F.count("*").alias("c"))
    total = counts.agg(F.sum("c").alias("n_total"))
    vocab = counts.crossJoin(F.broadcast(total)).select(
        "tok", (F.log(F.col("c")) - F.log(F.col("n_total"))).alias("lp")
    )
    return (
        tok.join(F.broadcast(vocab), "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("mean_logprob"),
        )
    )


def unigram_logprob_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`unigram_logprob` (identical expression
    order: ln(c) − ln(N), averaged per doc, rounded to 6)."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM {table}
),
counts AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
total AS (SELECT sum(c) AS n_total FROM counts),
vocab AS (SELECT tok, ln(c) - ln(n_total) AS lp FROM counts, total)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(v.lp), 6) AS mean_logprob
FROM tok t JOIN vocab v USING (tok)
GROUP BY t.doc_id
"""


# host part of an http(s) URL; kept RE2-simple so the Java and DuckDB
# regex engines agree byte-for-byte (no backrefs, no lookaround)
URL_HOST_RE = r"https?://([^/ ]+)"


def domain_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-domain URL rollup — the crawl-corpus provenance pass (domain
    mixing/blocklists key on exactly this): extract every http(s) URL
    host, explode, and aggregate URL count + distinct-document count per
    domain.

    Map-only extraction (JVM regexp, no Python) + one aggregate keyed by
    domain; at 100 TB the domain key is Zipf-skewed, which is the
    textbook case for AQE skew handling or the salted aggregate in
    operators/skew.py."""
    hosts = F.regexp_extract_all(F.col(text_col), F.lit(URL_HOST_RE), 1)
    return (
        df.select("doc_id", F.explode(hosts).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )


def domain_stats_sql(corpus_sql: str) -> str:
    """DuckDB mirror of :func:`domain_stats`."""
    return f"""
WITH corpus AS ({corpus_sql}),
hosts AS (
  SELECT doc_id, unnest(regexp_extract_all(text, 'https?://([^/ ]+)', 1)) AS domain
  FROM corpus
)
SELECT domain, count(*) AS n_urls, count(DISTINCT doc_id) AS n_docs
FROM hosts GROUP BY domain
"""


# Typographic-to-ASCII character map for normalization: curly quotes,
# en/em dashes, and NBSP.  translate() is a per-character map in both
# engines, so FROM and TO must be the same length in CHARACTERS.
NORM_TRANSLATE_FROM = "\u2019\u2018\u201c\u201d\u2013\u2014\u00a0"
NORM_TRANSLATE_TO = "''\"\"-- "


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Text normalization — the first scrub pass of a training pipeline:
    fold typographic punctuation to ASCII, lowercase, replace control
    characters with spaces (deleting them would weld adjacent words),
    and collapse whitespace runs.  Emits per-doc before/after lengths
    and an md5 of the normalized text so the result stays compact while
    still value-checking the full output byte-for-byte.

    Map-only JVM expressions (translate / lower / regexp) — zero
    shuffles; at 100 TB this is a pure scan stage that fuses into
    whole-stage codegen with whatever runs next."""
    t = F.col(text_col)
    norm = F.translate(t, NORM_TRANSLATE_FROM, NORM_TRANSLATE_TO)
    # \x00-\x1f covers tab/CR/LF too, so one collapse pass on ' +' after
    # this replacement handles every whitespace class
    norm = F.regexp_replace(F.lower(norm), "[\\x00-\\x1f\\x7f]", " ")
    norm = F.trim(F.regexp_replace(norm, " +", " "))
    return df.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars_raw"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        F.md5(norm.cast("binary")).alias("norm_md5"),
    )


def normalize_text_sql(corpus_sql: str) -> str:
    """DuckDB mirror of :func:`normalize_text` (same translate map,
    same regex source strings — DuckDB's RE2 and Java's regex agree on
    these simple character classes)."""
    # chr()-concat keeps the quote characters out of the SQL literal
    frm = "'’‘“”–—' || chr(160)"
    to = "$$''\"\"--$$ || ' '"
    return f"""
WITH corpus AS ({corpus_sql}),
n AS (
  SELECT doc_id, text,
         trim(regexp_replace(
           regexp_replace(lower(translate(text, {frm}, {to})),
                          '[\\x00-\\x1f\\x7f]', ' ', 'g'),
           ' +', ' ', 'g')) AS norm
  FROM corpus
)
SELECT doc_id,
       length(text) AS n_chars_raw,
       length(norm) AS n_chars_norm,
       md5(norm) AS norm_md5
FROM n
"""


def bigram_counts(
    df: DataFrame, k: int = 30, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide top-``k`` bigram heavy hitters.

    The n-gram statistic every corpus audit runs (boilerplate
    detection, template mining): adjacent whitespace-token pairs,
    counted globally, top-``k`` by (count desc, bigram asc).

    Scale shape: bigram expansion is map-only (the shared
    ``dedup._ngram_rows`` explode — no Python), the count is a
    partial+final aggregate on
    the bigram key, and the global top-k is ``orderBy().limit(k)``,
    which Spark executes as TakeOrderedAndProject — every partition
    ships only its local top-k to the driver, no global sort.  A hot
    template bigram skews the count's reduce key; AQE's skew handling
    (or pre-aggregation, which the map-side combine already is)
    absorbs it.
    """
    from .dedup import _ngram_rows

    pairs = _ngram_rows(
        df, 2, text_col, id_col,
        key_fn=lambda s: s, empty_type="string", out_col="bigram",
        distinct=False,
    )
    return (
        pairs.select("bigram")
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram").asc())
        .limit(k)
    )


def bigram_counts_sql(k: int = 30) -> str:
    """DuckDB mirror: same slice/zip pairing, count and tie-break."""
    return f"""
WITH toks AS (SELECT string_split(text, ' ') AS tk FROM documents),
pairs AS (
  SELECT unnest(list_transform(
           list_zip(tk[1:len(tk) - 1], tk[2:len(tk)]),
           p -> p[1] || ' ' || p[2])) AS bigram
  FROM toks
)
SELECT bigram, count(*) AS cnt FROM pairs
GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT {k}
"""


def corpus_diff(
    old: DataFrame, new: DataFrame, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Snapshot delta between two corpus versions: one row per doc_id
    seen in either, with status ``added`` / ``removed`` / ``changed`` /
    ``unchanged`` by content fingerprint (the :func:`fingerprint`
    identity, so whitespace/case-only edits are 'unchanged').

    The audit every dataset release runs — what moved between v(n) and
    v(n+1).  Plan: two map-only fingerprint projections and ONE
    full-outer shuffle join on the id (both sides hash-partition the
    same key; no corpus text moves, only (id, 32-char md5))."""
    # presence is tracked with explicit markers, NOT fingerprint
    # nullity — a NULL-text document has a NULL fingerprint while being
    # genuinely present (and two NULL-text versions are 'unchanged',
    # hence the null-safe comparison for the change test)
    norm_old = fingerprint(old.select(id_col, text_col), text_col).select(
        id_col,
        F.col("fingerprint").alias("_fp_old"),
        F.lit(1).alias("_in_old"),
    )
    norm_new = fingerprint(new.select(id_col, text_col), text_col).select(
        id_col,
        F.col("fingerprint").alias("_fp_new"),
        F.lit(1).alias("_in_new"),
    )
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(~F.col("_fp_old").eqNullSafe(F.col("_fp_new")), "changed")
        .otherwise("unchanged")
    )
    return (
        norm_old.join(norm_new, id_col, "full_outer")
        .select(
            id_col,
            status.alias("status"),
            F.coalesce("_fp_new", "_fp_old").alias("fingerprint"),
        )
    )


def corpus_diff_sql(old_sql: str, new_sql: str) -> str:
    """DuckDB mirror of :func:`corpus_diff` (same fingerprint rule)."""
    fp = "md5(regexp_replace(lower(text), '[ \\t\\n\\r\\f]+', ' ', 'g'))"
    return f"""
WITH o AS (SELECT doc_id, {fp} AS fp_old FROM ({old_sql})),
n AS (SELECT doc_id, {fp} AS fp_new FROM ({new_sql}))
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN fp_old IS DISTINCT FROM fp_new THEN 'changed'
            ELSE 'unchanged' END AS status,
       coalesce(fp_new, fp_old) AS fingerprint
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
"""


def line_scrub(
    df: DataFrame, min_docs: int = 10, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4/RefinedWeb-style line-level boilerplate removal: any LINE
    that appears in ≥ ``min_docs`` distinct documents (nav chrome,
    subscribe prompts, license footers) is dropped from every document;
    per-doc line order is preserved on re-assembly.

    Shape at 100 TB: explode lines → per-line distinct-doc count (the
    boilerplate table is tiny — lines crossing the threshold — and is
    BROADCAST back) → anti-filter + ordered re-assembly under one
    doc_id aggregation. The corpus shuffles once on the line hash and
    once on doc_id; no pairwise comparison anywhere (this is what
    makes line dedup tractable where doc-level near-dup needs LSH).

    Output covers EVERY input document: a doc whose every line is
    boilerplate comes back as (n_kept=0, md5('')) via the final left
    join from the input id set, so callers can tell 'fully scrubbed'
    from 'absent' (r4 advice item — previously such docs silently
    vanished from the result)."""
    lines = df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("line")
    )
    kept = lines.join(F.broadcast(boiler), "line", "left_anti")
    parts = F.array_sort(
        F.collect_list(F.struct(F.col("pos"), F.col("line")))
    )
    scrubbed = (
        kept.groupBy(id_col)
        .agg(
            F.count("line").alias("n_kept"),
            parts.alias("_parts"),
        )
        .select(
            id_col,
            "n_kept",
            F.md5(
                F.array_join(F.col("_parts.line"), "\n")
            ).alias("clean_md5"),
        )
    )
    return df.select(id_col).join(scrubbed, id_col, "left").select(
        id_col,
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
    )


def line_scrub_sql(
    corpus_sql: str, min_docs: int = 10
) -> str:
    """DuckDB mirror of :func:`line_scrub` (same newline split, same
    distinct-doc threshold, same ordered re-assembly)."""
    return f"""
WITH corpus AS ({corpus_sql}),
lines_t AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos,
         unnest(string_split(text, chr(10))) AS line
  FROM corpus
),
boiler AS (
  SELECT line FROM lines_t
  GROUP BY line HAVING count(DISTINCT doc_id) >= {min_docs}
),
kept AS (
  SELECT l.* FROM lines_t l
  WHERE NOT EXISTS (SELECT 1 FROM boiler b WHERE b.line = l.line)
),
scrubbed AS (
  SELECT doc_id, count(line) AS n_kept,
         md5(string_agg(line, chr(10) ORDER BY pos)) AS clean_md5
  FROM kept GROUP BY doc_id
)
SELECT c.doc_id,
       coalesce(s.n_kept, 0) AS n_kept,
       coalesce(s.clean_md5, md5('')) AS clean_md5
FROM (SELECT doc_id FROM corpus) c LEFT JOIN scrubbed s USING (doc_id)
"""


# Gopher rule thresholds (Rae et al. 2021, arXiv:2112.11446, Table A1),
# rescaled where the paper's web-scale bounds are degenerate on this
# corpus (docs are 10-99 tokens; the paper filters 50-100k-word pages):
# the RULES are the paper's, the numbers are honest corpus-scale knobs.
GOPHER_DEFAULTS = {
    "min_words": 20,
    "max_words": 100_000,
    "min_avg_word_len": 3.0,
    "max_avg_word_len": 10.0,
    "max_symbol_ratio": 0.1,
    "min_distinct_stopwords": 1,
    "max_dup_token_frac": 0.6,
    # the paper's remaining §A1.1 rules (r9): hash/ellipsis symbols per
    # WORD, bullet-started line fraction, ellipsis-ended line fraction,
    # alphabetic-word fraction — thresholds verbatim from Rae et al.
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "min_alpha_word_frac": 0.8,
}


def gopher_quality_filter(
    df: DataFrame, text_col: str = "text", **overrides
) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1) as
    one map-only projection: per-document booleans for each rule plus
    the conjunction ``keep``.

    Rules carried from the paper: word-count bounds, mean-word-length
    bounds, symbol-to-character ratio cap, minimum distinct stopwords
    (the paper's "stop word" requirement), and a repetition cap (the
    paper's duplicate-fraction family, here the duplicate-token
    fraction — the zero-shuffle member of ``repetition_features``).
    Every signal is exact integer arithmetic over one projection — no
    shuffle anywhere, the 100 TB shape of a keep/drop gate — and every
    expression is shared verbatim with the DuckDB mirror.
    """
    p = {**GOPHER_DEFAULTS, **overrides}
    t = F.col(text_col)
    toks = _tokens(t)
    n = F.size(toks)
    n_chars = F.length(t)
    # TRUE mean word length: separators excluded — a single-space-joined
    # text has exactly n-1 separator chars, so sum(len(word)) =
    # n_chars - (n-1). (quality_features' avg_token_len keeps the
    # chars-per-token convention; the Gopher rule is about WORDS.)
    avg_len = (n_chars - (n - 1)) / n
    symbols = n_chars - F.length(F.regexp_replace(t, "[.,!?;:]", ""))
    dstop = F.size(
        F.array_distinct(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    )
    dup_frac = (n - F.size(F.array_distinct(toks))) / n
    r_words = (n >= p["min_words"]) & (n <= p["max_words"])
    r_avg = (avg_len >= p["min_avg_word_len"]) & (
        avg_len <= p["max_avg_word_len"]
    )
    r_sym = F.when(
        n_chars > 0, (symbols / n_chars) <= p["max_symbol_ratio"]
    ).otherwise(F.lit(False))
    r_stop = dstop >= p["min_distinct_stopwords"]
    r_dup = dup_frac <= p["max_dup_token_frac"]
    # the paper's remaining rules (r9), all map-only integer counts over
    # the same projection — lines split on \n (the synthetic fixture is
    # single-line, where these pass trivially; the unit tests plant
    # line-structured docs), non-overlapping '...' runs counted by
    # length difference / 3 (both engines scan left-to-right)
    lines = F.split(t, "\n")
    n_lines = F.size(lines)  # ≥ 1 always: split("") = [""]
    bullets = F.size(
        F.filter(lines, lambda x: x.rlike("^\\s*[-*•]"))
    )
    ell_lines = F.size(
        F.filter(lines, lambda x: x.rlike("(\\.\\.\\.|…)\\s*$"))
    )
    hashes = n_chars - F.length(F.regexp_replace(t, "#", ""))
    ells = (
        n_chars - F.length(F.regexp_replace(t, "\\.\\.\\.", ""))
    ) / 3 + (n_chars - F.length(F.regexp_replace(t, "…", "")))
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    # n / n_lines are ≥ 1 for any non-null string (split('') = ['']),
    # but a NULL text makes them NULL — the same n>0 guard r_sym uses
    # keeps every rule a real boolean instead of a null (r9 advice).
    r_symw = F.when(
        n > 0, (hashes + ells) / n <= p["max_symbol_word_ratio"]
    ).otherwise(F.lit(False))
    r_bullet = F.when(
        n_lines > 0, bullets / n_lines <= p["max_bullet_line_frac"]
    ).otherwise(F.lit(False))
    r_ell = F.when(
        n_lines > 0, ell_lines / n_lines <= p["max_ellipsis_line_frac"]
    ).otherwise(F.lit(False))
    r_alpha = F.when(
        n > 0, alpha_words / n >= p["min_alpha_word_frac"]
    ).otherwise(F.lit(False))
    # NULL text nulls every count, so every rule coalesces to a real
    # False — a keep/drop gate must emit booleans, never NULLs (r9
    # advice); the division guards above additionally keep the ratio
    # rules ANSI-safe.
    def _b(c: Column) -> Column:
        return F.coalesce(c, F.lit(False))

    return df.select(
        "doc_id",
        F.coalesce(n, F.lit(0)).cast("long").alias("n_tokens"),
        _b(r_words).alias("pass_word_count"),
        _b(r_avg).alias("pass_avg_word_len"),
        _b(r_sym).alias("pass_symbol_ratio"),
        _b(r_symw).alias("pass_symbol_words"),
        _b(r_bullet).alias("pass_bullet_lines"),
        _b(r_ell).alias("pass_ellipsis_lines"),
        _b(r_alpha).alias("pass_alpha_words"),
        _b(r_stop).alias("pass_stopwords"),
        _b(r_dup).alias("pass_repetition"),
        _b(
            r_words & r_avg & r_sym & r_symw & r_bullet & r_ell
            & r_alpha & r_stop & r_dup
        ).alias("keep"),
    )


def gopher_quality_filter_sql(
    corpus_sql: str = "SELECT doc_id, text FROM documents", **overrides
) -> str:
    """DuckDB mirror of :func:`gopher_quality_filter` — same integer
    counts, same comparison points."""
    p = {**GOPHER_DEFAULTS, **overrides}
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH corpus AS ({corpus_sql}),
f AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
           AS symbols,
         length(text) - length(regexp_replace(text, '#', '', 'g')) AS hashes,
         (length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3
           + (length(text) - length(regexp_replace(text, '…', '', 'g')))
           AS ells,
         len(string_split(text, chr(10))) AS n_lines,
         len(list_filter(string_split(text, chr(10)),
                         x -> regexp_matches(x, '^\\s*[-*•]'))) AS bullets,
         len(list_filter(string_split(text, chr(10)),
                         x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*$')))
           AS ell_lines,
         len(list_filter(string_split(text, ' '),
                         x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
         len(list_distinct(list_filter(string_split(text, ' '),
                                       x -> x IN ({sw})))) AS dstop,
         len(string_split(text, ' '))
           - len(list_distinct(string_split(text, ' '))) AS dups
  FROM corpus
),
rules AS (
  SELECT doc_id, n,
         coalesce(n >= {p["min_words"]} AND n <= {p["max_words"]}, FALSE)
           AS pass_word_count,
         coalesce((n_chars - (n - 1)) / n >= {p["min_avg_word_len"]!r}
          AND (n_chars - (n - 1)) / n <= {p["max_avg_word_len"]!r}, FALSE)
           AS pass_avg_word_len,
         coalesce(CASE WHEN n_chars > 0
              THEN symbols / n_chars <= {p["max_symbol_ratio"]!r}
              ELSE FALSE END, FALSE) AS pass_symbol_ratio,
         coalesce(CASE WHEN n > 0
              THEN (hashes + ells) / n <= {p["max_symbol_word_ratio"]!r}
              ELSE FALSE END, FALSE) AS pass_symbol_words,
         coalesce(CASE WHEN n_lines > 0
              THEN bullets / n_lines <= {p["max_bullet_line_frac"]!r}
              ELSE FALSE END, FALSE) AS pass_bullet_lines,
         coalesce(CASE WHEN n_lines > 0
              THEN ell_lines / n_lines <= {p["max_ellipsis_line_frac"]!r}
              ELSE FALSE END, FALSE) AS pass_ellipsis_lines,
         coalesce(CASE WHEN n > 0
              THEN alpha_words / n >= {p["min_alpha_word_frac"]!r}
              ELSE FALSE END, FALSE) AS pass_alpha_words,
         coalesce(dstop >= {p["min_distinct_stopwords"]}, FALSE)
           AS pass_stopwords,
         coalesce(dups / n <= {p["max_dup_token_frac"]!r}, FALSE)
           AS pass_repetition
  FROM f
)
SELECT doc_id, CAST(coalesce(n, 0) AS BIGINT) AS n_tokens,
       pass_word_count, pass_avg_word_len, pass_symbol_ratio,
       pass_symbol_words, pass_bullet_lines, pass_ellipsis_lines,
       pass_alpha_words, pass_stopwords, pass_repetition,
       (pass_word_count AND pass_avg_word_len AND pass_symbol_ratio
        AND pass_symbol_words AND pass_bullet_lines
        AND pass_ellipsis_lines AND pass_alpha_words
        AND pass_stopwords AND pass_repetition) AS keep
FROM rules
"""


def c4_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2, "Colossal Clean
    Crawled Corpus") as one map-only projection — the line-level rules
    rebuild the page from its retained lines, the page-level rules
    decide ``keep``:

    * retain a line only if it ends in terminal punctuation
      (``. ! ? "``), has ≥ 5 words, and does not mention "javascript";
    * drop the page if fewer than 3 lines survive (the paper's
      ≥-3-sentences floor), if it contains "lorem ipsum", or if it
      contains a curly brace (code markers).

    (The paper's bad-word list and its 3-sentence cross-page dedup are
    separate operators here: `line_scrub` covers cross-page line dedup;
    a word-list gate is `gopher_quality_filter`'s stopword machinery
    with a different list.)  Zero shuffle — the same 100 TB keep/drop
    gate shape as :func:`gopher_quality_filter`, and every expression
    is shared verbatim with the DuckDB mirror.

    Reference parity note: the reference engine has no corpus surface;
    this extends its filter model (lcc/entities/filters) to the
    training-data pipeline per SURVEY §2.9.
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept = F.filter(
        lines,
        lambda x: x.rlike('[.!?"]$')
        & (F.size(F.split(x, " ")) >= 5)
        & ~F.contains(F.lower(x), F.lit("javascript")),
    )
    n_kept = F.size(kept)
    p_lines = n_kept >= 3
    p_lorem = ~F.contains(F.lower(t), F.lit("lorem ipsum"))
    p_brace = ~F.contains(t, F.lit("{"))
    return df.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_lines_kept"),
        p_lines.alias("pass_min_lines"),
        p_lorem.alias("pass_lorem_ipsum"),
        p_brace.alias("pass_no_brace"),
        (p_lines & p_lorem & p_brace).alias("keep"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def c4_filter_sql(corpus_sql: str) -> str:
    """DuckDB mirror of :func:`c4_filter` — same line predicate, same
    page rules, same rebuilt text."""
    line_pred = (
        "x -> regexp_matches(x, '[.!?\"]$') "
        "AND len(string_split(x, ' ')) >= 5 "
        "AND NOT contains(lower(x), 'javascript')"
    )
    return f"""
WITH corpus AS ({corpus_sql}),
f AS (
  SELECT doc_id, text,
         string_split(text, chr(10)) AS lines,
         list_filter(string_split(text, chr(10)), {line_pred}) AS kept
  FROM corpus
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_lines_kept,
       (len(kept) >= 3) AS pass_min_lines,
       (NOT contains(lower(text), 'lorem ipsum')) AS pass_lorem_ipsum,
       (NOT contains(text, '{{')) AS pass_no_brace,
       (len(kept) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(text, '{{')) AS keep,
       array_to_string(kept, chr(10)) AS clean_text
FROM f
"""


def ccnet_ppl_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3):
    score each document with the corpus unigram LM
    (:func:`unigram_logprob`, the perplexity proxy), then split every
    language into head / middle / tail terciles — the paper's quality
    partition that downstream pipelines sample from (head = most
    LM-typical text).

    Scale shape: the LM score is the existing two-aggregate plan
    (bounded vocab broadcast); the tercile is ``ntile(3)`` PARTITIONED
    BY language — one shuffle on a bounded key over doc-level rows,
    deterministic via the (score, id) tiebreak. At 100 TB replace the
    per-language sort with cutoffs from a quantile sketch
    (``sketch.quantile_sketch``) and a map-side compare; ntile is the
    oracle-exact form.
    """
    from pyspark.sql import Window

    lp = unigram_logprob(df, text_col, id_col)
    j = lp.join(df.select(id_col, lang_col), id_col)
    w = Window.partitionBy(lang_col).orderBy(
        F.desc("mean_logprob"), F.col(id_col)
    )
    b = F.ntile(3).over(w)
    return j.select(
        id_col,
        lang_col,
        "n_tokens",
        "mean_logprob",
        F.round(F.exp(-F.col("mean_logprob")), 6).alias("perplexity"),
        b.cast("long").alias("ppl_bucket"),
        F.when(b == 1, "head")
        .when(b == 2, "middle")
        .otherwise("tail")
        .alias("ppl_label"),
    )


def ccnet_ppl_buckets_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`ccnet_ppl_buckets` (same LM, same
    tercile ordering and labels)."""
    return f"""
WITH base AS ({unigram_logprob_sql(table)}),
j AS (
  SELECT b.doc_id, d.lang, b.n_tokens, b.mean_logprob
  FROM base b JOIN {table} d USING (doc_id)
),
t AS (
  SELECT *,
         ntile(3) OVER (PARTITION BY lang
                        ORDER BY mean_logprob DESC, doc_id) AS nt
  FROM j
)
SELECT doc_id, lang, n_tokens, mean_logprob,
       round(exp(-mean_logprob), 6) AS perplexity,
       CAST(nt AS BIGINT) AS ppl_bucket,
       CASE WHEN nt = 1 THEN 'head' WHEN nt = 2 THEN 'middle'
            ELSE 'tail' END AS ppl_label
FROM t
"""


def url_blocklist_filter(
    df: DataFrame, blocked: list[str], text_col: str = "text"
) -> DataFrame:
    """URL-blocklist gate (the RefinedWeb / C4 provenance filter: drop
    a page if any of its URLs points at a blocked domain, where a
    blocklist entry matches the exact host AND every subdomain —
    ``example.org`` blocks ``cdn3.example.org`` but NOT
    ``notexample.org``).

    Map-only: JVM regex host extraction (the shared
    :data:`URL_HOST_RE`) + one row-level ``exists`` over a bounded
    literal blocklist — zero shuffle, the keep/drop gate shape, and it
    runs unchanged on a stream. At 100 TB a real blocklist (UT1 is
    ~4M domains) ships as a broadcast join against the exploded hosts
    instead of a literal chain; the fixture-scale literal keeps the
    oracle exact.
    """
    bl = sorted(set(b.lower() for b in blocked))
    hosts = F.regexp_extract_all(F.col(text_col), F.lit(URL_HOST_RE), 1)

    def is_blocked(h: Column) -> Column:
        lh = F.lower(h)
        cond = F.lit(False)
        for b in bl:
            cond = cond | (lh == b) | lh.endswith("." + b)
        return cond

    n_blocked = F.size(F.filter(hosts, is_blocked))
    return df.select(
        "doc_id",
        F.size(hosts).cast("long").alias("n_urls"),
        n_blocked.cast("long").alias("n_blocked_urls"),
        (n_blocked == 0).alias("keep"),
    )


def url_blocklist_filter_sql(corpus_sql: str, blocked: list[str]) -> str:
    """DuckDB mirror of :func:`url_blocklist_filter` — same regex, same
    exact-or-dot-suffix rule."""
    bl = sorted(set(b.lower() for b in blocked))
    pred = " OR ".join(
        f"lower(h) = '{b}' OR suffix(lower(h), '.{b}')" for b in bl
    )
    return f"""
WITH corpus AS ({corpus_sql}),
f AS (
  SELECT doc_id,
         regexp_extract_all(text, 'https?://([^/ ]+)', 1) AS hosts
  FROM corpus
)
SELECT doc_id,
       CAST(len(hosts) AS BIGINT) AS n_urls,
       CAST(len(list_filter(hosts, h -> {pred})) AS BIGINT)
         AS n_blocked_urls,
       (len(list_filter(hosts, h -> {pred})) = 0) AS keep
FROM f
"""
