"""Stats/ROC file artifacts — the StatsManager analog.

Reference (lcc/stars_processing/tools/stats_manager.py:8-136): collect a
list of stats dicts, sort the (fpr, tpr) pairs into a ROC, save
``roc_curve.dat`` (tab-separated, "%.2f", ``#fp<TAB>tp`` header), save
the stats table, optionally render a matplotlib plot.

The data side lives in ``StarsFilter.roc``/``statistics`` (already
distributed aggregates); this module carries only the *artifact*
formats. Outputs are driver-side file writes — the inputs are per-run
aggregate rows (30 thresholds, a handful of stats), never data-plane.
The plot is gated behind a matplotlib import-try (not installed here).
"""

from __future__ import annotations

import json
import os


def roc_points(stats: list[dict]) -> list[tuple[float, float]]:
    """(fpr, tpr) pairs sorted by fpr (stats_manager.getROC)."""
    pts = [
        (s.get("false_positive_rate"), s.get("true_positive_rate"))
        for s in stats
    ]
    # None fprs sort last; the sentinel keeps the key comparable when two
    # or more points have fpr=None (None < None raises)
    return sorted(
        pts, key=lambda p: (p[0] is None, 0.0 if p[0] is None else p[0])
    )


def save_roc_file(
    stats: list[dict], path: str, file_name: str = "roc_curve.dat",
    delim: str = "\t",
) -> str:
    """``#fp<delim>tp`` header + "%.2f"-formatted rows — byte-compatible
    with the reference's saveROCfile output."""
    os.makedirs(path, exist_ok=True)
    target = os.path.join(path, file_name)
    with open(target, "w") as f:
        f.write(f"#fp{delim}tp\n")
        for fp, tp in roc_points(stats):
            if fp is None or tp is None:
                continue  # undefined rates (e.g. zero-denominator runs)
            f.write(f"{fp:.2f}{delim}{tp:.2f}\n")
    return target


def save_stats(
    stats: list[dict], path: str, file_name: str = "stats.dat",
    delim: str = "\t",
) -> str:
    """Tab-separated stats table with a ``#``-prefixed header row — the
    StatusResolver.save_query shape the reference delegates to; a JSON
    sidecar carries the same rows losslessly."""
    os.makedirs(path, exist_ok=True)
    target = os.path.join(path, file_name)
    keys = list(stats[0].keys()) if stats else []
    with open(target, "w") as f:
        f.write("#" + delim.join(keys) + "\n")
        for s in stats:
            f.write(delim.join(str(s.get(k)) for k in keys) + "\n")
    with open(target + ".json", "w") as f:
        json.dump(stats, f, indent=2, default=float)
    return target


def plot_roc(
    stats: list[dict], path: str = ".", file_name: str = "roc_plot.png",
    title: str = "ROC curve",
) -> str | None:
    """Render the ROC plot when matplotlib is importable; otherwise
    return None (this container has no plotting stack — the data
    artifacts above carry the same information)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt
    except ImportError:
        return None
    pts = [p for p in roc_points(stats) if p[0] is not None and p[1] is not None]
    plt.plot([p[0] for p in pts], [p[1] for p in pts], "b-", linewidth=2)
    plt.plot([0, 1], [0, 1], "r--")
    plt.title(title)
    plt.xlabel("False positive rate")
    plt.ylabel("True positive rate")
    target = os.path.join(path, file_name)
    plt.savefig(target)
    plt.clf()
    return target
