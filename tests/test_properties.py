"""Property-based kernel invariants (hypothesis) — generalizing the
reference's hand-rolled randomized loops
(test/utils/test_data_analysis.py) to generated inputs."""

import numpy as np
from hypothesis import given, settings, strategies as st

from lightcurvesclassifier_spark.functions import kernels

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=200, deadline=None)
@given(
    xs=st.lists(finite, min_size=2, max_size=400),
    bins=st.integers(min_value=1, max_value=60),
)
def test_paa_output_bounded_by_bins_plus_margin(xs, bins):
    out = kernels.to_paa(np.array(xs), bins)
    # reference invariant (test_data_analysis.py:~20): output length is
    # within [bins - 1, bins + 1] whenever n >= bins; when n < bins the
    # quirky frame rule may emit up to n duplicated frames
    if len(xs) >= bins:
        assert bins - 1 <= len(out) <= bins + 1
    else:
        assert len(out) <= max(len(xs), bins) + 1
    if len(out):
        assert np.isfinite(out).all()
        assert out.min() >= min(xs) - 1e-9 and out.max() <= max(xs) + 1e-9


@settings(max_examples=100, deadline=None)
@given(
    n=st.integers(min_value=3, max_value=300),
    bins=st.integers(min_value=2, max_value=100),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_ekvi_paa_mean_preservation(n, bins, seed):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 100, n))
    y = rng.normal(10, 2, n)
    xr, yr = kernels.to_ekvi_paa(x, y, bins=bins)
    # reference invariant: reduced means track raw means (tolerance 0.1
    # of std, test_data_analysis.py:~40) — bin means weight each bin
    # equally so allow a loose band
    assert len(xr) == len(yr) <= max(bins, 1)
    assert np.isfinite(yr).all()
    assert abs(np.mean(yr) - np.mean(y)) < max(2.0 * np.std(y), 1e-6)


@settings(max_examples=100, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=200),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_normalize_properties(n, seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, rng.uniform(0.5, 5), n)
    out = kernels.normalize(x)
    if np.std(x) >= 1e-6:
        assert abs(out.mean()) < 1e-9
        assert abs(out.std() - 1.0) < 1e-9
    else:
        assert (out == 0).all()


@settings(max_examples=100, deadline=None)
@given(
    n=st.integers(min_value=4, max_value=500),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_abbe_bounds_for_noise(n, seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, n)
    a = kernels.abbe(x, n)
    assert 0 < a < 3  # Abbe of i.i.d. noise concentrates near 1
