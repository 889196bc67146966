"""``lcc make_filter`` — tune and persist a star filter.

Mirrors lcc/bin/make_filter.py:34-390: load searched + contamination
samples, expand the tuned-parameter combinations from the status file,
train a StarsFilter per combo on a seeded train/test split, keep the
best by precision, and write the filter + stats/ROC/coords artifacts
under ``FILTERS/<name>/``.

Spark shape: the combo loop is the driver-side outer dimension (as the
reference's process pool); every fit/score inside it is a distributed
DataFrame job. The train/test split is a seeded randomSplit on the
distinct star ids so each star's whole curve lands on one side.
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import functions as F

from ..ml.deciders import make_decider
from ..ml.stars_filter import StarsFilter
from ..ml import persistence, stats_artifacts
from ..sources import files
from . import descriptors as descr_registry
from . import stars_io


def _parse_combo(row: dict) -> dict:
    """``{'VariogramSlopeDescr:bins': '9'}`` → nested typed dict
    (lcc/cli/input_parse.parse_tun_query analog)."""
    combo: dict = {}
    for key, value in row.items():
        if ":" in key:
            obj, param = key.split(":", 1)
        else:
            obj, param = "", key
        try:
            typed = int(value)
        except (TypeError, ValueError):
            try:
                typed = float(value)
            except (TypeError, ValueError):
                typed = value
        combo.setdefault(obj, {})[param] = typed
    return combo


def main(project_settings, argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="lcc make_filter",
        description="Tune a star filter (reference: bin/make_filter.py).",
    )
    p.add_argument("-i", "--input", required=True,
                   help="tuning-combination file under TUN_PARAMS")
    p.add_argument("-n", "--name", dest="filt_name", default="Unnamed")
    p.add_argument("-f", "--descriptor", action="append", default=[],
                   dest="descriptors")
    p.add_argument("-s", "--searched", action="append", default=[])
    p.add_argument("-c", "--contamination", action="append", default=[],
                   dest="cont")
    p.add_argument("-d", "--decider", action="append", default=[],
                   dest="deciders")
    p.add_argument("-p", "--split", dest="split_ratio", default="3:1")
    opts = p.parse_args(argv)

    if not opts.descriptors or not opts.deciders:
        raise ValueError("at least one descriptor (-f) and decider (-d) required")

    from ..session import get_spark

    spark = get_spark("lcc-make-filter")

    searched = stars_io.load_specs(
        spark, opts.searched, project_settings.INP_LCS, project_settings.QUERIES
    ).cache()
    others = stars_io.load_specs(
        spark, opts.cont, project_settings.INP_LCS, project_settings.QUERIES
    ).cache()

    combos_df = files.load_query_file(
        spark, os.path.join(project_settings.TUN_PARAMS, opts.input)
    )
    combos = [_parse_combo(r.asDict()) for r in combos_df.collect()]
    if not combos:
        raise ValueError("Empty parameters file")

    ratios = [int(x) for x in opts.split_ratio.split(":")]
    train_frac = ratios[0] / sum(ratios[:2])

    def split_ids(obs):
        ids = obs.select("star_id").distinct()
        return ids.randomSplit([train_frac, 1 - train_frac], seed=42)

    s_train_ids, s_test_ids = split_ids(searched)
    o_train_ids, o_test_ids = split_ids(others)

    results, best = [], None
    for combo in combos:
        feats_s, cols = descr_registry.featurize(searched, opts.descriptors, combo)
        feats_o, _ = descr_registry.featurize(others, opts.descriptors, combo)
        # decider params from the combo file reach the constructor too
        # ('NeuronDecider:alpha' rows were silently discarded before —
        # every combo trained an identical filter)
        filt = StarsFilter(
            [make_decider(d, **combo.get(d, {})) for d in opts.deciders], cols
        )
        filt.learn(
            feats_s.join(s_train_ids, "star_id"),
            feats_o.join(o_train_ids, "star_id"),
        )
        s_test = feats_s.join(s_test_ids, "star_id").cache()
        o_test = feats_o.join(o_test_ids, "star_id").cache()
        stats = dict(filt.statistics(s_test, o_test))
        stats["params"] = combo
        results.append(stats)
        # a zero-denominator fold yields precision None — rank it below
        # every real score instead of raising on `None > float`
        prec = stats["precision"]
        prec = float("-inf") if prec is None else prec
        if best is None or prec > best[0]:
            if best is not None:
                best[3].unpersist()
                best[4].unpersist()
            best = (prec, filt, combo, s_test, o_test, feats_s, feats_o)
        else:
            # losing combo: its cached test frames are no longer needed
            s_test.unpersist()
            o_test.unpersist()

    precision, filt, combo, s_test, o_test, feats_s, feats_o = best
    filt_name = opts.filt_name.rsplit(".", 1)[0] if "." in opts.filt_name else opts.filt_name
    filter_dir = os.path.join(project_settings.FILTERS, filt_name)
    os.makedirs(filter_dir, exist_ok=True)

    persistence.save_filter(filt, os.path.join(filter_dir, filt_name + ".filter"))

    # descriptor configuration the winning filter was TRAINED with —
    # filter_stars must featurize with the same params or the deciders
    # score a differently-distributed feature (train/serve skew)
    import json

    with open(os.path.join(filter_dir, "descr_params.json"), "w") as f:
        json.dump(
            {"descriptors": opts.descriptors, "params": combo}, f, indent=2
        )

    roc = filt.roc(s_test, o_test, n_thresholds=30)
    roc_stats = [
        {"threshold": thr, "false_positive_rate": fpr, "true_positive_rate": tpr}
        for thr, fpr, tpr in roc
    ]
    stats_artifacts.save_roc_file(roc_stats, filter_dir, file_name="ROC_data.dat")
    stats_artifacts.save_stats(
        [{k: v for k, v in r.items() if k != "params"} for r in results],
        filter_dir,
        file_name="stats.dat",
    )

    # searched/contam coords — the tuned feature vectors (make_filter.py:374-379)
    for df, fname in ((feats_s, "searched_coords.dat"), (feats_o, "contam_coords.dat")):
        pdf = df.select(*filt.feature_cols).toPandas()
        with open(os.path.join(filter_dir, fname), "w") as f:
            f.write("# " + "\t".join(filt.feature_cols) + "\n")
            for _, row in pdf.iterrows():
                f.write("\t".join(f"{v:.3f}" for v in row.to_numpy()) + "\n")

    print(
        f"Done. Best combo {combo} (precision {precision}); "
        f"filter saved to {filter_dir}"
    )
    return 0
