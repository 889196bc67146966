"""SAX (Symbolic Aggregate approXimation) word + MINDIST kernels.

Mirrors lcc/stars_processing/utilities/sax.py and
symbolic_representation.py semantics (cited per function), written fresh
as pure functions. The Gaussian breakpoint table is the standard
published SAX table (Lin, Keogh, Lonardi & Chiu 2003).

The reference mutates ``SAX.scaling_factor`` on every
``to_letter_rep`` call and scores pairs with whichever SAX object was
built *last* (symbolic_representation.py:35-51) — here that statefulness
is made explicit: every function returns/accepts its scaling factor.
"""

from __future__ import annotations

import math

import numpy as np

from .kernels import compute_bins, histogram, normalize, to_paa, variogram

# Standard SAX Gaussian breakpoints, alphabet sizes 3..20
# (lcc/stars_processing/utilities/sax.py:203-233 holds the same table).
BREAKPOINTS: dict[int, list[float]] = {
    3: [-0.43, 0.43],
    4: [-0.67, 0, 0.67],
    5: [-0.84, -0.25, 0.25, 0.84],
    6: [-0.97, -0.43, 0, 0.43, 0.97],
    7: [-1.07, -0.57, -0.18, 0.18, 0.57, 1.07],
    8: [-1.15, -0.67, -0.32, 0, 0.32, 0.67, 1.15],
    9: [-1.22, -0.76, -0.43, -0.14, 0.14, 0.43, 0.76, 1.22],
    10: [-1.28, -0.84, -0.52, -0.25, 0, 0.25, 0.52, 0.84, 1.28],
    11: [-1.34, -0.91, -0.6, -0.35, -0.11, 0.11, 0.35, 0.6, 0.91, 1.34],
    12: [-1.38, -0.97, -0.67, -0.43, -0.21, 0, 0.21, 0.43, 0.67, 0.97, 1.38],
    13: [-1.43, -1.02, -0.74, -0.5, -0.29, -0.1, 0.1, 0.29, 0.5, 0.74, 1.02, 1.43],
    14: [-1.47, -1.07, -0.79, -0.57, -0.37, -0.18, 0, 0.18, 0.37, 0.57, 0.79,
         1.07, 1.47],
    15: [-1.5, -1.11, -0.84, -0.62, -0.43, -0.25, -0.08, 0.08, 0.25, 0.43,
         0.62, 0.84, 1.11, 1.5],
    16: [-1.53, -1.15, -0.89, -0.67, -0.49, -0.32, -0.16, 0, 0.16, 0.32, 0.49,
         0.67, 0.89, 1.15, 1.53],
    17: [-1.56, -1.19, -0.93, -0.72, -0.54, -0.38, -0.22, -0.07, 0.07, 0.22,
         0.38, 0.54, 0.72, 0.93, 1.19, 1.56],
    18: [-1.59, -1.22, -0.97, -0.76, -0.59, -0.43, -0.28, -0.14, 0, 0.14, 0.28,
         0.43, 0.59, 0.76, 0.97, 1.22, 1.59],
    19: [-1.62, -1.25, -1, -0.8, -0.63, -0.48, -0.34, -0.2, -0.07, 0.07, 0.2,
         0.34, 0.48, 0.63, 0.8, 1, 1.25, 1.62],
    20: [-1.64, -1.28, -1.04, -0.84, -0.67, -0.52, -0.39, -0.25, -0.13, 0,
         0.13, 0.25, 0.39, 0.52, 0.67, 0.84, 1.04, 1.28, 1.64],
}

MAX_ITER = 500  # sliding-compare cap (curves_shape_descr.py:42)


def sax_word(x: np.ndarray, word_size: int, alphabet_size: int) -> tuple[str, float]:
    """Series → (SAX word, scaling factor).

    normalize → PAA to ``word_size`` → letters by Gaussian breakpoints;
    letter j is the first with value < beta[j], last letter otherwise
    (sax.py:59-105). Scaling factor = sqrt(len(x)/word_size) (sax.py:77).
    """
    beta = np.asarray(BREAKPOINTS[int(alphabet_size)], dtype=float)
    paa = to_paa(normalize(x), word_size)
    letters = np.searchsorted(beta, paa, side="right")
    word = "".join(chr(ord("a") + int(i)) for i in letters)
    return word, math.sqrt(len(x) / word_size)


def letter_distance(i: int, j: int, beta: np.ndarray) -> float:
    """0 for adjacent/equal letters, else beta[hi-1] - beta[lo]
    (sax.py:154-174)."""
    if abs(i - j) <= 1:
        return 0.0
    hi, lo = max(i, j), min(i, j)
    return float(beta[hi - 1] - beta[lo])


def _dist2_table(alphabet_size: int) -> np.ndarray:
    """Squared letter-distance lookup (alphabet × alphabet) — lets
    MINDIST and the sliding compare run as table-gather sums instead of
    per-character Python loops (~10× on the comparative hot path)."""
    tbl = _DIST2_CACHE.get(alphabet_size)
    if tbl is None:
        beta = np.asarray(BREAKPOINTS[int(alphabet_size)], dtype=float)
        a = alphabet_size
        tbl = np.zeros((a, a))
        for i in range(a):
            for j in range(a):
                tbl[i, j] = letter_distance(i, j, beta) ** 2
        _DIST2_CACHE[alphabet_size] = tbl
    return tbl


_DIST2_CACHE: dict[int, np.ndarray] = {}


def _codes(word: str) -> np.ndarray:
    return np.frombuffer(word.encode("ascii"), dtype=np.uint8) - ord("a")


def mindist(word_a: str, word_b: str, alphabet_size: int, scaling_factor: float) -> float:
    """MINDIST: scaling * sqrt(Σ per-position letter-distance²)
    (sax.py:107-133). Words must have equal length."""
    if len(word_a) != len(word_b):
        raise ValueError("words must have equal length")
    d2 = _dist2_table(int(alphabet_size))
    s = float(d2[_codes(word_a), _codes(word_b)].sum())
    return scaling_factor * math.sqrt(s)


def _shift_compare(
    word_star: str,
    word_comp: str,
    alphabet_size: int,
    scaling_factor: float,
    slide: bool,
) -> float:
    """Shift the shorter word through the longer, take the min score;
    without ``slide`` only offset 0 is scored
    (symbolic_representation.py:65-94)."""
    if len(word_comp) < len(word_star):
        short, long_ = word_comp, word_star
    else:
        short, long_ = word_star, word_comp
    if not slide:
        return mindist(long_[: len(short)], short, alphabet_size, scaling_factor)
    d2 = _dist2_table(int(alphabet_size))
    lc, sc = _codes(long_), _codes(short)
    windows = np.lib.stride_tricks.sliding_window_view(lc, len(short))
    sums = d2[windows, sc[None, :]].sum(axis=1)
    return scaling_factor * math.sqrt(float(sums.min()))


def compare_curves_sax(
    time_a: np.ndarray,
    mag_a: np.ndarray,
    time_b: np.ndarray,
    mag_b: np.ndarray,
    days_per_bin: float,
    alphabet_size: int,
    slide: float | None = 0.25,
) -> float:
    """CurvesShapeDescr.compareTwoStars for one (inspected a, template b)
    pair (curves_shape_descr.py:80-150 + symbolic_representation.py:15-47).

    Word sizes derive from each curve's timespan via ``compute_bins``.
    With ``slide`` falsy or equal word sizes the plain path runs; with
    differing word sizes the longer curve is re-SAXed over sliding raw
    windows (window = n_long * ws_short / ws_long, advance by
    window*(1-slide), ≤ MAX_ITER windows) and the best (min) MINDIST wins.
    The scaling factor in each path follows the reference's last-built-SAX
    rule (see module docstring).
    """
    ws_a = compute_bins(time_a, days_per_bin)
    ws_b = compute_bins(time_b, days_per_bin)

    if not slide:
        word_a, _ = sax_word(mag_a, ws_a, alphabet_size)
        word_b, scale_b = sax_word(mag_b, ws_b, alphabet_size)
        return _safe_shift(word_a, word_b, alphabet_size, scale_b, slide=False)

    # slide path: getWords(comp_star=b, star=a) (curves_shape_descr.py:95-150)
    if ws_a == ws_b:
        one_word, _ = sax_word(mag_b, ws_b, alphabet_size)
        other, scale_a = sax_word(mag_a, ws_a, alphabet_size)
        words = [other]
        scale = scale_a
    else:
        # longer/shorter by word size across the (b, a) pair
        if ws_b >= ws_a:
            long_mag, ws_long = mag_b, ws_b
            short_mag, ws_short = mag_a, ws_a
        else:
            long_mag, ws_long = mag_a, ws_a
            short_mag, ws_short = mag_b, ws_b
        window = len(long_mag) * ws_short / float(ws_long)
        advance = int(window - slide * window)
        words = []
        from_i = 0
        for _ in range(MAX_ITER):
            to_i = int(from_i + window)
            if to_i > len(long_mag):
                break
            words.append(sax_word(long_mag[from_i:to_i], ws_short, alphabet_size)[0])
            from_i += advance
        one_word, scale = sax_word(short_mag, ws_short, alphabet_size)
    # PAA frame rule can yield a shorter word than requested; those
    # windows are skipped (the reference's ValueError path)
    comparable = [w for w in words if len(w) == len(one_word)]
    if not comparable:
        return 1e9
    d2 = _dist2_table(int(alphabet_size))
    mat = np.vstack([_codes(w) for w in comparable])
    sums = d2[mat, _codes(one_word)[None, :]].sum(axis=1)
    return scale * math.sqrt(float(sums.min()))


def _safe_shift(word_a, word_b, alphabet_size, scale, slide):
    try:
        return _shift_compare(word_a, word_b, alphabet_size, scale, slide)
    except ValueError:
        return float("nan")


def compare_hists_sax(
    time_a, mag_a, time_b, mag_b, bins: int, alphabet_size: int, slide: bool = False
) -> float:
    """HistShapeDescr.compareTwoStars: SAX over magnitude histograms,
    fixed word size = ``bins`` (hist_shape_descr.py:80-88)."""
    ha = histogram(time_a, mag_a, bins_num=bins)[0]
    hb = histogram(time_b, mag_b, bins_num=bins)[0]
    word_a, _ = sax_word(ha, bins, alphabet_size)
    word_b, scale_b = sax_word(hb, bins, alphabet_size)
    return _safe_shift(word_a, word_b, alphabet_size, scale_b, slide)


def compare_variograms_sax(
    time_a, mag_a, time_b, mag_b, bins: int, alphabet_size: int, slide: bool = False
) -> float:
    """VariogramShapeDescr.compareTwoStars: SAX over log-log variograms,
    fixed word size = ``bins`` (variogram_shape_descr.py:76-84)."""
    va = variogram(time_a, mag_a, bins=bins)[1]
    vb = variogram(time_b, mag_b, bins=bins)[1]
    word_a, _ = sax_word(va, bins, alphabet_size)
    word_b, scale_b = sax_word(vb, bins, alphabet_size)
    return _safe_shift(word_a, word_b, alphabet_size, scale_b, slide)
