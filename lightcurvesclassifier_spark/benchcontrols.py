"""Single source for the bench contention controls.

Three untouched queries whose plans no round has changed since r5,
with their committed quiet-box floors (best-of-3, sf0.1 local[32],
tools/time_queries.py provenance). Every timing artifact (bench.py,
tools/time_queries.py, tools/scaling_probe.py) measures these in-run
and reports the mean best/floor ratio, so a bar claim is adjudicable
from one artifact: controls near 1.0× mean quiet-box numbers.
Re-baseline a floor ONLY if its control's plan changes — and then
note the provenance here.
"""

CONTROL_FLOORS = {
    "pricing_summary": 0.37,
    "lc_smooth": 0.48,
    "detrend": 0.68,
}


def contention_ratio(best_times: dict) -> float | None:
    """Mean best/floor over the controls present in ``best_times``."""
    present = [n for n in CONTROL_FLOORS if n in best_times]
    if not present:
        return None
    return round(
        sum(best_times[n] / CONTROL_FLOORS[n] for n in present)
        / len(present),
        3,
    )
