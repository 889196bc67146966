"""Comparative (template) join — the reference's ComparativeBase at scale.

Reference (lcc/stars_processing/utilities/compare.py:39-107): every
inspected star is scored against every template star with a SAX-based
dissimilarity kernel, then reduced per star: ``closest`` → min,
``average`` → mean, ``best<n>`` → mean of the n smallest (n integer or
fraction of the template count).

Spark-first shape: templates are small by construction (the reference
holds them in a Python list), so the pair space is
``inspected.crossJoin(broadcast(templates))`` — no shuffle of the big
side at all; the scoring kernel is an Arrow-batched pandas UDF; the
reduce is one hash aggregate on ``star_id`` (the only shuffle).
At 100 TB of inspected curves this stays a single pass: broadcast ×
map-side score × one aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F, types as T

from ..functions import sax as sax_mod


KERNELS = {
    "curves_shape": sax_mod.compare_curves_sax,
    "hist_shape": sax_mod.compare_hists_sax,
    "variogram_shape": sax_mod.compare_variograms_sax,
}

_SERIES_FNS = {
    "hist_shape": lambda t, m, bins: sax_mod.histogram(t, m, bins_num=bins)[0],
    "variogram_shape": lambda t, m, bins: sax_mod.variogram(t, m, bins=bins)[1],
}


def _word_udf(kind: str, bins: int, alphabet_size: int):
    """Per-STAR representation: derived series → SAX word + scaling.
    Computed once per star, not once per pair — at T templates this cuts
    kernel work by 2T/(T+1)× and is the scale path (words are tiny;
    the pair stage then touches only strings)."""
    series_fn = _SERIES_FNS[kind]

    @F.pandas_udf(T.StructType([
        T.StructField("word", T.StringType()),
        T.StructField("scale", T.DoubleType()),
    ]))
    def to_word(time: pd.Series, mag: pd.Series) -> pd.DataFrame:
        words, scales = [], []
        for i in range(len(time)):
            series = series_fn(
                np.asarray(time[i], dtype=float), np.asarray(mag[i], dtype=float), bins
            )
            w, s = sax_mod.sax_word(series, bins, alphabet_size)
            words.append(w)
            scales.append(s)
        return pd.DataFrame({"word": words, "scale": scales})

    return to_word


def comparative_scores(
    inspected: DataFrame,
    templates: DataFrame,
    kind: str = "curves_shape",
    **params,
) -> DataFrame:
    """Pair scores: one row per (inspected star × template).

    Both inputs are in ``curves`` layout (star_id, time ARRAY, mag ARRAY).
    Returns (star_id, template_id, score).

    hist/variogram kinds precompute the per-star SAX word once and score
    pairs on words alone (the reference recomputes everything per pair —
    compare.py:100-107); ``curves_shape`` with ``slide`` falsy does the
    same (its word size is pair-independent — each curve's own timespan
    via compute_bins — so the per-pair kernel reduces to a prefix
    MINDIST on precomputed words); only the *sliding* curves_shape path
    keeps per-pair raw-curve access, because it re-SAXes windows of the
    longer curve with the pair-dependent word size
    (curves_shape_descr.py:95-150).
    """
    word_path = kind in _SERIES_FNS or (
        kind == "curves_shape" and not params.get("slide", 0.25)
    )
    if word_path:
        alphabet_size = params["alphabet_size"]
        slide = bool(params.get("slide", False)) if kind in _SERIES_FNS else False
        if kind in _SERIES_FNS:
            word = _word_udf(kind, params["bins"], alphabet_size)
        else:
            days_per_bin = params["days_per_bin"]

            @F.pandas_udf(T.StructType([
                T.StructField("word", T.StringType()),
                T.StructField("scale", T.DoubleType()),
            ]))
            def word(time: pd.Series, mag: pd.Series) -> pd.DataFrame:
                words, scales = [], []
                for i in range(len(time)):
                    t = np.asarray(time[i], dtype=float)
                    m = np.asarray(mag[i], dtype=float)
                    ws = sax_mod.compute_bins(t, days_per_bin)
                    w, s = sax_mod.sax_word(m, ws, alphabet_size)
                    words.append(w)
                    scales.append(s)
                return pd.DataFrame({"word": words, "scale": scales})

        i_words = inspected.select(
            "star_id", word(F.col("time"), F.col("mag")).alias("_w")
        ).select("star_id", F.col("_w.word").alias("word"))
        t_words = templates.select(
            F.col("star_id").alias("template_id"),
            word(F.col("time"), F.col("mag")).alias("_w"),
        ).select(
            "template_id",
            F.col("_w.word").alias("t_word"),
            F.col("_w.scale").alias("t_scale"),
        )

        @F.pandas_udf(T.DoubleType())
        def pair_score(wa: pd.Series, wb: pd.Series, sb: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    sax_mod._safe_shift(wa[i], wb[i], alphabet_size, sb[i], slide)
                    for i in range(len(wa))
                ]
            )

        pairs = i_words.crossJoin(F.broadcast(t_words))
        return pairs.select(
            "star_id",
            "template_id",
            pair_score(F.col("word"), F.col("t_word"), F.col("t_scale")).alias(
                "score"
            ),
        )

    kernel = KERNELS[kind]
    # Templates are a handful by contract (the reference holds them in a
    # list): collect once, broadcast as plain arrays, and stream each
    # inspected curve through Arrow exactly ONCE, scoring all templates
    # per row — versus the crossJoin shape, which copies every star's
    # arrays through Arrow once per template. Same kernel, same scores.
    t_rows = templates.select("star_id", "time", "mag").collect()
    t_data = [
        (
            r["star_id"],
            np.asarray(r["time"], dtype=float),
            np.asarray(r["mag"], dtype=float),
        )
        for r in t_rows
    ]
    b_templates = inspected.sparkSession.sparkContext.broadcast(t_data)

    def score_batches(batches):
        for pdf in batches:
            out_sid, out_tid, out_score = [], [], []
            for i in range(len(pdf)):
                ta = np.asarray(pdf["time"].iloc[i], dtype=float)
                ma = np.asarray(pdf["mag"].iloc[i], dtype=float)
                sid = pdf["star_id"].iloc[i]
                for tid, tt, tm in b_templates.value:
                    out_sid.append(sid)
                    out_tid.append(tid)
                    out_score.append(kernel(ta, ma, tt, tm, **params))
            yield pd.DataFrame(
                {"star_id": out_sid, "template_id": out_tid, "score": out_score}
            )

    return inspected.select("star_id", "time", "mag").mapInPandas(
        score_batches, schema="star_id long, template_id long, score double"
    )


def comparative_noslide_sql(
    obs_sql: str,
    template_ids: list[int],
    days_per_bin: float = 2.0,
    alphabet_size: int = 10,
    eps: float = 1e-6,
) -> str:
    """DuckDB oracle for ``curves_shape`` with ``slide=False``, averaged
    over templates — the full SAX chain in SQL: per-star word size from
    the timespan (compute_bins, data_analysis.py:318-344), population-std
    normalize (:164), quirky-frame PAA (:45-50), Gaussian-breakpoint
    letters (sax.py:59-105), prefix MINDIST with the template-side
    scaling factor (symbolic_representation.py:65-94)."""
    beta = sax_mod.BREAKPOINTS[int(alphabet_size)]
    beta_sql = "[" + ", ".join(repr(float(b)) for b in beta) + "]"
    tpl = ", ".join(str(int(t)) for t in template_ids)
    return f"""
WITH obs AS ({obs_sql}),
curves AS (
  SELECT star_id, list(mag ORDER BY t, mag) AS mags,
         list(t ORDER BY t, mag) AS ts,
         CAST(count(*) AS INT) AS n
  FROM obs GROUP BY star_id
),
sized AS (
  SELECT star_id, mags, n,
         GREATEST(5, CAST(round((list_max(ts) - list_min(ts)) / {float(days_per_bin)!r}) AS INT)) AS ws
  FROM curves
),
stats AS (
  SELECT star_id, mags, n, ws, list_avg(mags) AS m FROM sized
),
stats2 AS (
  SELECT *, sqrt(list_avg(list_transform(mags, x -> (x - m) * (x - m)))) AS s
  FROM stats
),
norm AS (
  SELECT star_id, n, ws,
         CASE WHEN s < {eps!r} THEN list_transform(mags, x -> 0.0e0)
              ELSE list_transform(mags, x -> (x - m) / s) END AS nm
  FROM stats2
),
idx AS (
  SELECT star_id, n, ws, nm,
         unnest(generate_series(0, CAST(2 * ws + 1 AS BIGINT))) AS i
  FROM norm
),
frames AS (
  SELECT star_id, n, ws, nm, i,
         CAST(ceil(CAST(n AS DOUBLE) / ws) AS INT) AS width,
         CAST(floor(CAST(i AS DOUBLE) * (CAST(n AS DOUBLE) / ws)) AS INT) AS start
  FROM idx
),
paa AS (
  SELECT star_id, n, ws, i,
         list_reduce(list_slice(nm, start + 1, start + width),
                     (acc, x) -> acc + x) / CAST(width AS DOUBLE) AS v
  FROM frames WHERE start <= n - width
),
lett AS (
  SELECT star_id, n, ws, i,
         len(list_filter({beta_sql}, b -> v >= b)) AS code
  FROM paa
),
words AS (
  SELECT star_id, any_value(n) AS n, any_value(ws) AS ws,
         list(code ORDER BY i) AS word
  FROM lett GROUP BY star_id
),
t_words AS (
  SELECT star_id AS template_id, word AS t_word,
         sqrt(CAST(n AS DOUBLE) / ws) AS t_scale
  FROM words WHERE star_id IN ({tpl})
),
pairs AS (
  SELECT w.star_id, t.template_id, t.t_scale,
         LEAST(len(w.word), len(t.t_word)) AS L,
         w.word AS wa, t.t_word AS wb
  FROM words w, t_words t
),
scores AS (
  SELECT star_id, template_id,
         t_scale * sqrt(list_sum(list_transform(
           generate_series(1, L),
           k -> CASE WHEN abs(wa[k] - wb[k]) <= 1 THEN 0.0e0
                ELSE power({beta_sql}[GREATEST(wa[k], wb[k])]
                           - {beta_sql}[LEAST(wa[k], wb[k]) + 1], 2) END
         ))) AS score
  FROM pairs
)
SELECT star_id, round(avg(score), 6) AS feature
FROM scores GROUP BY star_id
"""


def reduce_scores(
    scores: DataFrame, meth: str = "average", n_templates: int | None = None
) -> DataFrame:
    """Per-star reduce of pair scores (compare.py:53-83).

    ``best<n>``: n an integer count or a (0,1) fraction of the template
    count — fraction needs ``n_templates`` (the reference uses
    ``len(coords)``, the number of scored templates).
    """
    valid = scores.filter(F.col("score").isNotNull() & ~F.isnan("score"))
    if meth == "closest":
        return valid.groupBy("star_id").agg(F.min("score").alias("feature"))
    if meth == "average":
        return valid.groupBy("star_id").agg(F.avg("score").alias("feature"))
    if meth.startswith("best"):
        raw = meth[4:]
        frac = float(raw)
        if 0 < frac < 1:
            if n_templates is None:
                raise ValueError("fractional best-n needs n_templates")
            n = int(n_templates * frac)
        else:
            n = int(frac)
        w = Window.partitionBy("star_id").orderBy(F.col("score").asc())
        return (
            valid.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n)
            .groupBy("star_id")
            .agg(F.avg("score").alias("feature"))
        )
    raise ValueError(f"unknown reduce method: {meth}")
