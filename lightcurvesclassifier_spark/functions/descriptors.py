"""Simple descriptors as declarative column expressions + SQL mirrors.

Each function returns a DataFrame whose plan stays entirely inside
Catalyst (no Python UDFs): map access, coalesce defaults, higher-order
array functions. The paired ``*_SQL`` strings are the DuckDB oracle
formulations with identical expression order, so value hashes match.

Reference semantics covered (cited file:line into /root/reference/):

- ColorIndexDescr        lcc/stars_processing/descriptors/color_index_descr.py:5-98
- PropertyDescr          lcc/stars_processing/descriptors/property_desc.py:4-70
- PositionDescriptor     lcc/stars_processing/descriptors/position_descriptor.py:4-29
- CurveDescr (PAA curve) lcc/stars_processing/descriptors/curve_descr.py:12-121
- to_PAA frame rule      lcc/utils/data_analysis.py:14-51
- phase folding          lcc/db_tier/vizier_tap_base.py:268-298 (server-side
                         ``P=period`` fold re-expressed as a column formula)
- ``:N`` shuffled slice  lcc/cli/stars_handling.py:123-170 (re-expressed as a
                         deterministic hash-ordered sample so it is
                         reproducible across engines and at scale)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


# ---------------------------------------------------------------------------
# Map-typed property descriptors


def color_index(
    stars: DataFrame,
    colors: list[tuple[str, str]] | None = None,
    more_col: str = "more",
) -> DataFrame:
    """ColorIndexDescr: ``more[m2] - more[m1]`` per color pair — the
    reference's sign (color_index_descr.py:91 appends
    ``float(mag2) - float(mag1)``, i.e. v−b for the ('b_mag','v_mag')
    pair).

    Stars missing either magnitude yield null (the reference's
    ``pass_not_found`` keeps such stars with a None coordinate; a
    downstream ``na.drop`` removes them — same composition here).
    """
    colors = colors or [("b_mag", "v_mag")]
    cols: list[Column] = [F.col("star_id")]
    for m1, m2 in colors:
        cols.append(
            F.round(
                F.element_at(F.col(more_col), m2)
                - F.element_at(F.col(more_col), m1),
                6,
            ).alias(f"{m1}_{m2}")
        )
    return stars.select(*cols)


def property_descr(
    stars: DataFrame,
    attribute_names: list[str],
    ifnot: float | None = -1.0,
    more_col: str = "more",
) -> DataFrame:
    """PropertyDescr: ``float(more[k])`` with a default for missing keys."""
    cols: list[Column] = [F.col("star_id")]
    for k in attribute_names:
        v = F.element_at(F.col(more_col), k).cast("double")
        if ifnot is not None:
            v = F.coalesce(v, F.lit(float(ifnot)))
        cols.append(F.round(v, 6).alias(k))
    return stars.select(*cols)


def position_descr(stars: DataFrame) -> DataFrame:
    """PositionDescriptor: (ra, dec) degrees as the feature pair."""
    return stars.select(
        "star_id",
        F.round("ra_deg", 6).alias("ra_deg"),
        F.round("dec_deg", 6).alias("dec_deg"),
    )


# ---------------------------------------------------------------------------
# PAA curve reduction (CurveDescr) — pure higher-order functions, JVM-side


def _bins_expr(bins: float, n) -> "F.Column":
    """``bins`` ∈ (0, 1] is a *fraction* of the curve length — the
    to_ekvi_PAA rule (data_analysis.py:86-87) the reference's CurveDescr
    inherits; ``int()`` truncation kept, floored at 1 (the reference
    would divide by zero there — documented divergence)."""
    if 0 < bins <= 1:
        return F.greatest(
            F.lit(1), F.floor(n.cast("double") * F.lit(float(bins))).cast("int")
        )
    return F.lit(int(bins))


def paa_curve(curves: DataFrame, bins: float, mag_col: str = "mag") -> DataFrame:
    """to_PAA over each star's (t,mag)-sorted magnitude array, long format.

    Reproduces the reference's quirky frame rule exactly
    (lcc/utils/data_analysis.py:45-50): frame width ``ceil(n/bins)``,
    frame starts ``int(i * (n/bins))`` in *double* arithmetic (so frames
    may overlap and the frame count may differ from ``bins``), loop while
    ``start <= n - width``. Mean = strict left-fold sum / width, matching
    the DuckDB ``list_reduce`` fold bit-for-bit. ``bins`` ∈ (0, 1] is a
    per-star fraction of the curve length (:func:`_bins_expr`).
    """
    n = F.size(F.col(mag_col))
    bins_c = _bins_expr(bins, n).cast("double")
    width = F.ceil(n.cast("double") / bins_c).cast("int")
    start = F.floor(
        F.col("i").cast("double") * (n.cast("double") / bins_c)
    ).cast("int")
    frames = curves.select(
        "star_id",
        F.col(mag_col),
        F.explode(
            F.sequence(F.lit(0), (F.lit(2) * bins_c + 1).cast("int"))
        ).alias("i"),
    ).filter(start <= n - width)
    frame = F.slice(F.col(mag_col), start + 1, width)
    mean = F.aggregate(
        frame, F.lit(0.0), lambda acc, x: acc + x
    ) / width.cast("double")
    return frames.select(
        "star_id", F.col("i").cast("long").alias("bin"), mean.alias("paa")
    )


def paa_curve_sql(obs_sql: str, bins: float) -> str:
    """DuckDB mirror of :func:`paa_curve` (same fold order; same
    fractional-bins rule via a lateral range)."""
    if 0 < bins <= 1:
        nbins = (
            "GREATEST(1, CAST(floor(CAST(n AS DOUBLE) * "
            f"CAST('{float(bins)!r}' AS DOUBLE)) AS INT))"
        )
    else:
        nbins = str(int(bins))
    return f"""
WITH obs AS ({obs_sql}),
curves AS (
  SELECT star_id, list(mag ORDER BY t, mag) AS mags,
         CAST(count(*) AS INT) AS n
  FROM obs GROUP BY star_id
),
sized AS (
  SELECT star_id, mags, n, CAST({nbins} AS DOUBLE) AS nbins FROM curves
),
idx AS (
  -- range()/generate_series table functions reject lateral column
  -- args; the scalar generate_series returns a per-row list instead
  SELECT star_id, mags, n, nbins,
         unnest(generate_series(0, CAST(2 * nbins + 1 AS BIGINT))) AS i
  FROM sized
),
frames AS (
  SELECT star_id, i AS bin, mags, n,
         CAST(ceil(CAST(n AS DOUBLE) / nbins) AS INT) AS width,
         CAST(floor(CAST(i AS DOUBLE) * (CAST(n AS DOUBLE) / nbins)) AS INT) AS start
  FROM idx
)
SELECT star_id, bin,
       list_reduce(list_slice(mags, start + 1, start + width),
                   (acc, x) -> acc + x) / CAST(width AS DOUBLE) AS paa
FROM frames WHERE start <= n - width
"""


def _paa_list_sql(prefix: str, src: str, bins: int) -> str:
    """CTE fragment: PAA (quirky frame rule) over a per-star LIST column.
    ``src`` must expose (star_id, vals, m); emits CTE ``{prefix}`` with
    (star_id, paa) where paa is the frame-mean list in frame order."""
    return f"""
{prefix}_idx AS (
  SELECT star_id, vals, m,
         unnest(generate_series(0, {2 * bins + 1})) AS i
  FROM {src}
),
{prefix}_frames AS (
  SELECT star_id, i, vals, m,
         CAST(ceil(CAST(m AS DOUBLE) / {bins}.0) AS INT) AS width,
         CAST(floor(CAST(i AS DOUBLE) * (CAST(m AS DOUBLE) / {bins}.0)) AS INT) AS start
  FROM {prefix}_idx
),
{prefix} AS (
  SELECT star_id,
         list(list_reduce(list_slice(vals, start + 1, start + width),
                          (acc, x) -> acc + x) / CAST(width AS DOUBLE)
              ORDER BY i) AS paa
  FROM {prefix}_frames WHERE start <= m - width GROUP BY star_id
)"""


def ekvi_fill_ctes_sql(obs_sql: str, bins_expr: str) -> str:
    """CTE chain (no final SELECT) for exact-parity to_ekvi_PAA incl.
    fix_missing (data_analysis.py:54-140, :354-412), ending in
    ``filled(star_id, bin, x, y)``. ``bins_expr`` is a SQL expression
    over the per-star aggregate (may reference ``cnt`` = curve length —
    the bins=n identity case the histogram kernel uses).

    The sequential interior-NaN fill has a closed form per NaN run: with
    L/R the bracketing valid values and ``w_k = Δt_left/(Δt_left+Δt_right)``
    (Δt_right measured to the run's next-valid time), the recurrence
    ``y_i = w_i·y_{i-1} + (1−w_i)·R`` telescopes to
    ``y_i = R + (L−R)·Π_{k≤i} w_k`` — a windowed ``product()`` over the
    run partition (run id = count of valid rows so far). Border NaNs copy
    the first/last valid value (replace_at_borders=True)."""
    borders = (
        "list_transform(generate_series(0, nbins), "
        "i -> (tmin - h) + i * ((tmax + h) - (tmin - h)) / CAST(nbins AS DOUBLE))"
    )
    return f"""
WITH obs AS ({obs_sql}),
spans0 AS (
  SELECT star_id, min(t) AS tmin, max(t) AS tmax,
         CAST(count(*) AS INT) AS cnt
  FROM obs GROUP BY star_id
),
spans AS (
  SELECT star_id, tmin, tmax, cnt,
         CAST({bins_expr} AS INT) AS nbins,
         (tmax - tmin) / CAST({bins_expr} AS DOUBLE) / 2.0 AS h
  FROM spans0
),
binned AS (
  SELECT o.star_id, o.t, o.mag,
         LEAST(nbins - 1, GREATEST(0,
           len(list_filter({borders}, bd -> o.t >= bd)) - 1)) AS bin
  FROM obs o JOIN spans s USING (star_id)
),
agg AS (
  SELECT star_id, bin, count(*) AS c, sum(t) AS st, sum(mag) AS sm
  FROM binned GROUP BY star_id, bin
),
dense AS (
  SELECT star_id, tmin, tmax, h, nbins,
         unnest(generate_series(0, nbins - 1)) AS bin
  FROM spans
),
grid AS (
  SELECT d.star_id, d.bin,
         CASE WHEN a.c > 0 THEN a.st / a.c
              ELSE ({borders}[d.bin + 1] + {borders}[d.bin + 2]) / 2.0
         END AS x,
         CASE WHEN a.c > 0 THEN a.sm / a.c END AS y
  FROM dense d
  LEFT JOIN agg a ON a.star_id = d.star_id AND a.bin = d.bin
),
ctx AS (
  SELECT star_id, bin, x, y,
         count(y) OVER w_pre AS run,
         last_value(y IGNORE NULLS) OVER w_pre AS l_val,
         first_value(y IGNORE NULLS) OVER w_post AS r_val,
         first_value(CASE WHEN y IS NOT NULL THEN x END IGNORE NULLS)
           OVER w_post AS x_r,
         lag(x) OVER w AS x_prev
  FROM grid
  WINDOW
    w AS (PARTITION BY star_id ORDER BY bin),
    w_pre AS (PARTITION BY star_id ORDER BY bin
              ROWS UNBOUNDED PRECEDING),
    w_post AS (PARTITION BY star_id ORDER BY bin
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
weighted AS (
  SELECT *,
         CASE WHEN y IS NULL AND run > 0 AND r_val IS NOT NULL
              THEN (x - x_prev) / (x_r - x_prev) END AS w
  FROM ctx
),
filled AS (
  SELECT star_id, bin, x,
         CASE
           WHEN y IS NOT NULL THEN y
           WHEN run = 0 THEN r_val
           WHEN r_val IS NULL THEN l_val
           ELSE r_val + (l_val - r_val) * product(w)
                OVER (PARTITION BY star_id, run ORDER BY bin
                      ROWS UNBOUNDED PRECEDING)
         END AS y
  FROM weighted
)"""


def ekvi_paa_exact_sql(obs_sql: str, bins: int) -> str:
    """DuckDB oracle for the ``ekvi_paa_exact`` contract query: the
    :func:`ekvi_fill_ctes_sql` chain, rounded. ``bins`` is capped at
    the curve length per star — the kernel applies
    ``if bins > len(x): bins = len(x)``, so a literal bin count would
    emit phantom rows for curves shorter than ``bins``. (bins must be
    > 1: the kernel maps bins=1 through the fraction rule to n.)"""
    assert int(bins) > 1, "bins=1 means 'fraction' to the kernel"
    return f"""{ekvi_fill_ctes_sql(obs_sql, f"LEAST({int(bins)}, cnt)")}
SELECT star_id, CAST(bin AS INT) AS bin,
       round(x, 6) AS t_red, round(y, 6) AS mag_red
FROM filled
"""


def variogram_slope_sql(obs_sql: str, bins: int = 20) -> str:
    """DuckDB oracle for the variogram slope — the whole chain of
    kernels.variogram/variogram_slope (data_analysis.py:196-246 +
    variogram_slope_descr.py:41-53) in SQL: PAA both axes, all ordered
    pairs i≠j (lags double-counted, i-major order), sort by lag (ties
    carry equal values, so the unstable-argsort permutation is
    value-equivalent), PAA both sorted series, log10/log10, then the
    closed-form OLS slope (numerically ≡ polyfit deg 1 at 6 decimals)."""
    return f"""
WITH obs AS ({obs_sql}),
curves AS (
  SELECT star_id, list(t ORDER BY t, mag) AS ts,
         list(mag ORDER BY t, mag) AS mags,
         CAST(count(*) AS INT) AS n
  FROM obs GROUP BY star_id
),
px_src AS (SELECT star_id, ts AS vals, n AS m FROM curves),
{_paa_list_sql("px", "px_src", bins)},
py_src AS (SELECT star_id, mags AS vals, n AS m FROM curves),
{_paa_list_sql("py", "py_src", bins)},
xy AS (
  SELECT px.star_id, px.paa AS xp, py.paa AS yp, len(px.paa) AS np
  FROM px JOIN py USING (star_id)
),
pair_k AS (
  SELECT star_id, xp, yp, np,
         unnest(generate_series(0, np * np - 1)) AS k
  FROM xy
),
pairs AS (
  SELECT star_id, k,
         abs(xp[CAST(k // np AS INT) + 1] - xp[CAST(k % np AS INT) + 1]) AS lag,
         (yp[CAST(k // np AS INT) + 1] - yp[CAST(k % np AS INT) + 1])
         * (yp[CAST(k // np AS INT) + 1] - yp[CAST(k % np AS INT) + 1]) AS val
  FROM pair_k
  WHERE CAST(k // np AS INT) <> CAST(k % np AS INT)
),
sorted AS (
  SELECT star_id,
         list(lag ORDER BY lag, k) AS lags,
         list(val ORDER BY lag, k) AS vals_s,
         CAST(count(*) AS INT) AS m
  FROM pairs GROUP BY star_id
),
pl_src AS (SELECT star_id, lags AS vals, m FROM sorted),
{_paa_list_sql("pl", "pl_src", bins)},
pv_src AS (SELECT star_id, vals_s AS vals, m FROM sorted),
{_paa_list_sql("pv", "pv_src", bins)},
pts AS (
  -- guarded log10: DuckDB hard-errors on log10(0) (zero lags happen
  -- whenever duplicated PAA frames produce equal time means; zero vals
  -- for constant curves), which would abort the WHOLE oracle query.
  -- The engine's UDF emits NaN for such a star; the per-star no-null
  -- gate below mirrors that as NULL.
  SELECT pl.star_id,
         unnest(list_transform(pl.paa,
           v -> CASE WHEN v > 0 THEN log10(v) END)) AS lx,
         unnest(list_transform(pv.paa,
           v -> CASE WHEN v > 0 THEN log10(v) END)) AS ly
  FROM pl JOIN pv USING (star_id)
)
SELECT star_id,
       CASE WHEN count(*) = count(lx) AND count(*) = count(ly) THEN
         round((count(*) * sum(lx * ly) - sum(lx) * sum(ly))
               / (count(*) * sum(lx * lx) - sum(lx) * sum(lx)), 6)
       END AS variogram_slope
FROM pts GROUP BY star_id
"""


def curve_descr(
    curves: DataFrame, bins: float, height: int | None = None
) -> DataFrame:
    """CurveDescr: PAA-reduced curve scaled to unit range, mean-centered
    (curve_descr.py:12-121's vector feature, long format: one row per
    (star, bin) so the oracle hash is well-defined).

    DOCUMENTED DIVERGENCE: the reference first resamples through
    ``to_ekvi_PAA`` onto time-equidistant bins (curve_descr.py:74-76)
    before the PAA; this operator PAAs the (t-sorted) magnitudes
    directly — for irregular sampling the features differ. The
    time-equidistant path is available as ``ekvi_paa_bins`` /
    ``curve_udfs.ekvi_paa_exact`` and composes in front when
    reference-identical values are required.

    ``height`` is the reference's magnitude-axis quantization
    (curve_descr.py:78-81): ``round(height · paa / (max − min))`` —
    note *no* min-shift before rounding (the reference divides by the
    range without subtracting the minimum; with rounding the shift is
    not equivalent, so it must be preserved) — then mean-centered.
    Rounding is HALF_UP on both engine and oracle (PAA means are
    positive here); CPython's banker's rounding differs only on exact
    halves — documented divergence. ``bins`` ∈ (0, 1] is a per-star
    fraction of the curve length."""
    from pyspark.sql.window import Window

    paa = paa_curve(curves, bins)
    w = Window.partitionBy("star_id")
    rng = F.max("paa").over(w) - F.min("paa").over(w)
    if height:
        q = F.round(F.lit(float(height)) * F.col("paa") / rng, 0)
        out = paa.select("star_id", "bin", q.alias("scaled"))
    else:
        scaled = (F.col("paa") - F.min("paa").over(w)) / rng
        out = paa.select("star_id", "bin", scaled.alias("scaled"))
    return out.select(
        "star_id",
        "bin",
        F.round(F.col("scaled") - F.avg("scaled").over(w), 6).alias("value"),
    )


def curve_descr_sql(obs_sql: str, bins: float, height: int | None = None) -> str:
    if height:
        scaled = (
            f"round({float(height)!r} * paa / "
            "(max(paa) OVER (PARTITION BY star_id) "
            "- min(paa) OVER (PARTITION BY star_id)))"
        )
    else:
        scaled = (
            "(paa - min(paa) OVER (PARTITION BY star_id)) "
            "/ (max(paa) OVER (PARTITION BY star_id) "
            "- min(paa) OVER (PARTITION BY star_id))"
        )
    return f"""
WITH paa AS ({paa_curve_sql(obs_sql, bins)}),
scaled AS (
  SELECT star_id, bin, {scaled} AS scaled
  FROM paa
)
SELECT star_id, bin,
       round(scaled - avg(scaled) OVER (PARTITION BY star_id), 6) AS value
FROM scaled
"""


# ---------------------------------------------------------------------------
# Time-equidistant PAA (ekvi-PAA) and magnitude histogram — declarative.
#
# These are the JVM-side formulations of the two binning kernels
# (lcc/utils/data_analysis.py:54-140 to_ekvi_PAA, :249-299 histogram):
# the bin-assignment rule is the reference's exactly (bins equal time
# bins over [min-h, max+h], h = span/bins/2); empty bins are dropped
# rather than NaN-interpolated (the fix_missing variant lives in the
# pandas-UDF path, functions/kernels.py:226-263, where sequential fills
# are natural). Both stay entirely inside whole-stage codegen: one
# window + one hash aggregate, partitioned on star_id, no Python.


def ekvi_paa_bins(obs: DataFrame, bins: int) -> DataFrame:
    """Per-star time-equidistant binning: bin index + per-bin mean time
    and magnitude. The window (min/max t) and the groupBy share the
    star_id partitioning, so the plan has a single Exchange."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("star_id")
    tmin = F.min("t").over(w)
    tmax = F.max("t").over(w)
    h = (tmax - tmin) / F.lit(float(bins)) / F.lit(2.0)
    lo = tmin - h
    step = ((tmax + h) - lo) / F.lit(float(bins))
    b = obs.select(
        "star_id",
        "t",
        "mag",
        F.floor((F.col("t") - lo) / step).alias("bin"),
    )
    return (
        b.groupBy("star_id", "bin")
        .agg(
            F.count("mag").alias("n_in_bin"),
            F.round(F.avg("t"), 6).alias("t_mean"),
            F.round(F.avg("mag"), 6).alias("mag_mean"),
        )
    )


def ekvi_paa_bins_sql(obs_sql: str, bins: int) -> str:
    return f"""
WITH obs AS ({obs_sql}),
b AS (
  SELECT star_id, t, mag,
         min(t) OVER (PARTITION BY star_id) AS tmin,
         max(t) OVER (PARTITION BY star_id) AS tmax
  FROM obs
),
z AS (
  SELECT star_id, t, mag,
         CAST(floor((t - (tmin - (tmax - tmin) / {bins}.0 / 2.0))
              / (((tmax + (tmax - tmin) / {bins}.0 / 2.0)
                  - (tmin - (tmax - tmin) / {bins}.0 / 2.0)) / {bins}.0))
              AS BIGINT) AS bin
  FROM b
)
SELECT star_id, bin, count(mag) AS n_in_bin,
       round(avg(t), 6) AS t_mean, round(avg(mag), 6) AS mag_mean
FROM z GROUP BY star_id, bin
"""


def mag_histogram(obs: DataFrame, bins: int) -> DataFrame:
    """Per-star normalized magnitude histogram (histogram kernel,
    data_analysis.py:249-299): equal-width buckets over [min, max],
    dense counts (empty bins = 0), then population-std normalize
    (normalize, data_analysis.py:143-164; zeros when std < 1e-6).

    DOCUMENTED DIVERGENCE from the reference kernel: no to_ekvi_PAA
    resample in front, and ``bins`` here is the BUCKET count (the
    reference's ``bins_num`` is the edge count → bins_num−1 buckets).
    The engine↔oracle contract is exact; reference-identical histograms
    compose ``ekvi_paa_bins`` first and pass ``bins_num - 1``.

    Scale shape: one aggregate for bounds+counts, a broadcast of the
    per-star bounds against a `bins`-row range (rows = stars × bins,
    never obs × bins), one window for the normalize.
    """
    from pyspark.sql.window import Window

    spark = obs.sparkSession
    bounds = obs.groupBy("star_id").agg(
        F.min("mag").alias("mmin"), F.max("mag").alias("mmax")
    )
    width = (F.col("mmax") - F.col("mmin")) / F.lit(float(bins))
    bucket = F.least(
        F.floor((F.col("mag") - F.col("mmin")) / width), F.lit(bins - 1)
    )
    counts = (
        obs.join(bounds, "star_id")
        .select("star_id", bucket.alias("bin"))
        .groupBy("star_id", "bin")
        .agg(F.count("*").alias("cnt"))
    )
    dense = bounds.select("star_id").crossJoin(
        F.broadcast(spark.range(bins).select(F.col("id").alias("bin")))
    )
    filled = dense.join(counts, ["star_id", "bin"], "left").select(
        "star_id", "bin", F.coalesce("cnt", F.lit(0)).cast("double").alias("cnt")
    )
    w = Window.partitionBy("star_id")
    mean = F.sum("cnt").over(w) / F.lit(float(bins))
    msq = F.sum(F.col("cnt") * F.col("cnt")).over(w) / F.lit(float(bins))
    std = F.sqrt(msq - mean * mean)
    value = F.when(std < 1e-6, F.lit(0.0)).otherwise(
        (F.col("cnt") - mean) / std
    )
    return filled.select(
        "star_id", "bin", F.round(value, 6).alias("value")
    )


def mag_histogram_sql(obs_sql: str, bins: int) -> str:
    return f"""
WITH obs AS ({obs_sql}),
bounds AS (
  SELECT star_id, min(mag) AS mmin, max(mag) AS mmax
  FROM obs GROUP BY star_id
),
counts AS (
  SELECT o.star_id,
         least(CAST(floor((o.mag - b.mmin) / ((b.mmax - b.mmin) / {bins}.0))
                    AS BIGINT), {bins - 1}) AS bin,
         count(*) AS cnt
  FROM obs o JOIN bounds b USING (star_id)
  GROUP BY 1, 2
),
dense AS (
  SELECT b.star_id, r.i AS bin,
         CAST(coalesce(c.cnt, 0) AS DOUBLE) AS cnt
  FROM bounds b
  CROSS JOIN range({bins}) r(i)
  LEFT JOIN counts c ON c.star_id = b.star_id AND c.bin = r.i
),
norm AS (
  SELECT star_id, bin, cnt,
         sum(cnt) OVER (PARTITION BY star_id) / {bins}.0 AS mean,
         sum(cnt * cnt) OVER (PARTITION BY star_id) / {bins}.0 AS msq
  FROM dense
)
SELECT star_id, bin,
       round(CASE WHEN sqrt(msq - mean * mean) < 1e-6 THEN 0.0
                  ELSE (cnt - mean) / sqrt(msq - mean * mean) END, 6) AS value
FROM norm
"""


# ---------------------------------------------------------------------------
# Phase folding


def phase_fold(
    obs: DataFrame, periods: DataFrame, t_col: str = "t"
) -> DataFrame:
    """Fold each observation time by its star's period:
    ``phase = (t mod P) / P``. ``periods`` is a small (star_id, period)
    dim — broadcast so the join never shuffles the observation fact."""
    joined = obs.join(F.broadcast(periods), "star_id")
    phase = F.pmod(F.col(t_col), F.col("period")) / F.col("period")
    return joined.select(
        "star_id",
        F.round(t_col, 6).alias("t"),
        F.round(phase, 6).alias("phase"),
    )


def phase_curve(
    obs: DataFrame,
    periods: DataFrame,
    n_bins: int = 20,
    t_col: str = "t",
    mag_col: str = "mag",
) -> DataFrame:
    """Folded-binned light-curve template: fold by the star's period
    (broadcast dim, fact never shuffles for the join), bin the phase,
    and aggregate each bin's magnitude — the phase curve a classifier
    or a plot reads instead of raw points. One partial→final aggregate
    on (star, bin); output is |stars|·n_bins rows at any input size.

    Phase/bin arithmetic is pure double ops on values both engines hold
    bit-identically, so bin assignment is engine-deterministic (same
    discipline as pdm_theta)."""
    joined = obs.join(F.broadcast(periods), "star_id")
    phase = F.pmod(F.col(t_col), F.col("period")) / F.col("period")
    pbin = F.least(F.floor(phase * n_bins), F.lit(n_bins - 1)).cast("int")
    m = F.col(mag_col)
    agg = (
        joined.select("star_id", pbin.alias("pbin"), m.alias("m"))
        .groupBy("star_id", "pbin")
        .agg(
            F.count("m").alias("n_obs"),
            F.sum("m").alias("_s1"),
            F.sum(F.col("m") * F.col("m")).alias("_s2"),
        )
    )
    n = F.col("n_obs")
    mean = F.col("_s1") / n
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / n) / n
    return agg.select(
        "star_id",
        "pbin",
        "n_obs",
        F.round(mean, 6).alias("mean_mag"),
        # clamp like the SQL mirror's greatest(..., 0): float
        # cancellation on a constant phase bin makes var ~ -1e-14 and
        # an unguarded sqrt a NaN the oracle's 0.0 can never match
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("std_mag"),
    )


def cmd_histogram(
    stars_more: DataFrame, mag_width: float = 0.5, color_width: float = 0.25
) -> DataFrame:
    """Color–magnitude diagram density: the 2-D (B−V color, V magnitude)
    binned star count — the classic population diagnostic plot, here as
    the aggregation table a plotting tier reads. Stars missing B (the
    open-schema ``more`` map's null path) are excluded, mirroring
    ColorIndexDescr's pass_not_found=False behavior.

    One partial→final aggregate; bin ids are ``floor(x / width)`` on
    doubles both engines hold identically, so the cells are
    engine-deterministic. Output is |occupied cells| rows (≪ |stars|)."""
    b = F.element_at("more", "b_mag")
    v = F.element_at("more", "v_mag")
    rows = stars_more.select(b.alias("_b"), v.alias("_v")).filter(
        F.col("_b").isNotNull()
    )
    vbin = F.floor(F.col("_v") / mag_width).cast("int")
    cbin = F.floor((F.col("_b") - F.col("_v")) / color_width).cast("int")
    return (
        rows.groupBy(vbin.alias("vbin"), cbin.alias("cbin"))
        .agg(F.count(F.lit(1)).alias("n_stars"))
        .select(
            "vbin",
            "cbin",
            F.round(F.col("vbin") * mag_width, 6).alias("v_lo"),
            F.round(F.col("cbin") * color_width, 6).alias("color_lo"),
            "n_stars",
        )
    )


def cmd_histogram_sql(
    mag_width: float = 0.5, color_width: float = 0.25
) -> str:
    """DuckDB mirror of :func:`cmd_histogram` (same derived b/v mags —
    testdata.B_MAG_SQL/V_MAG_SQL — and the same floor bins)."""
    from ..sources.testdata import B_MAG_SQL, V_MAG_SQL

    mw, cw = repr(float(mag_width)), repr(float(color_width))
    return f"""
WITH bv AS (
  SELECT {B_MAG_SQL} AS b, {V_MAG_SQL} AS v FROM customer
),
binned AS (
  SELECT CAST(floor(v / {mw}) AS INTEGER) AS vbin,
         CAST(floor((b - v) / {cw}) AS INTEGER) AS cbin
  FROM bv WHERE b IS NOT NULL
)
SELECT vbin, cbin,
       round(vbin * {mw}, 6) AS v_lo,
       round(cbin * {cw}, 6) AS color_lo,
       count(*) AS n_stars
FROM binned GROUP BY vbin, cbin
"""


def phase_curve_sql(
    obs_sql: str, periods_sql: str, n_bins: int = 20
) -> str:
    """DuckDB mirror of :func:`phase_curve` (same pmod/bin arithmetic —
    DuckDB ``fmod`` matches Spark ``pmod`` for positive operands — and
    the same power-sum derivation order)."""
    return f"""
WITH obs AS ({obs_sql}), periods AS ({periods_sql}),
binned AS (
  SELECT o.star_id, o.mag AS m,
         CAST(least(floor((fmod(o.t, p.period) / p.period) * {n_bins}),
                    {n_bins - 1}) AS INTEGER) AS pbin
  FROM obs o JOIN periods p USING (star_id)
),
agg AS (
  SELECT star_id, pbin, count(m) AS n_obs,
         sum(m) AS s1, sum(m * m) AS s2
  FROM binned GROUP BY star_id, pbin
)
SELECT star_id, pbin, n_obs,
       round(s1 / n_obs, 6) AS mean_mag,
       round(sqrt(greatest(s2 - s1 * s1 / n_obs, 0.0e0) / n_obs), 6) AS std_mag
FROM agg
"""


# ---------------------------------------------------------------------------
# Deterministic sampling (the ':N' / '%frac' slices, scale-safe)


def sample_head(df: DataFrame, key: str, n: int) -> DataFrame:
    """The reference's ``folder:N`` slice shuffles then takes N
    (stars_handling.py:123-133) — i.e. a random-N sample. Re-expressed
    deterministically: order by md5(key) (a seeded pseudo-random but
    engine-portable permutation) and take N. Scale note: Spark executes
    this as a TakeOrderedAndProject (per-partition top-N + merge), never
    a global sort."""
    h = F.md5(F.col(key).cast("string").cast("binary"))
    return df.orderBy(h, F.col(key)).limit(n)


def sample_fraction(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """``folder%frac`` Bernoulli sample, deterministic across engines:
    keep rows whose md5(key) falls below the fraction of the hex space.
    Embarrassingly parallel — no shuffle, no driver involvement."""
    # one definition of the subtle 8-hex-char threshold (incl. the
    # w>=1 'g' full-keep sentinel) — a private copy here once risked
    # drifting from the corpus sampling semantics
    from ..operators.corpus import _hex_bound

    bound = _hex_bound(fraction)
    h = F.substring(F.md5(F.col(key).cast("string").cast("binary")), 1, 8)
    return df.filter(h < F.lit(bound))
