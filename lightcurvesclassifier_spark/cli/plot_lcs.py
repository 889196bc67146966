"""``lcc plot_lcs`` — render light-curve images from a dat folder.

Mirrors lcc/bin/plot_lcs.py:23-99: load every curve under ``-p``, save
one image per star into ``-o`` (default ``<path>/images``). The curve
load is the distributed dat scan; rendering is matplotlib and therefore
import-gated like ml/stats_artifacts.plot_roc — in a container without
a plotting stack the command writes the per-star plot DATA as
``<star>.plot.dat`` (t/mag pairs, sorted) so the artifact pipeline stays
testable and a matplotlib-equipped host produces PNGs from the same
code path.
"""

from __future__ import annotations

import argparse
import os


def main(project_settings=None, argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="lcc plot_lcs",
        description="Plot light curves from a folder of dat files "
        "(reference: bin/plot_lcs.py).",
    )
    p.add_argument("-p", "--path", required=True,
                   help="folder of .dat light curves")
    p.add_argument("-o", "--output", default=None,
                   help="image output folder (default <path>/images)")
    opts = p.parse_args(argv)

    save_path = opts.output or os.path.join(opts.path, "images")
    os.makedirs(save_path, exist_ok=True)

    from ..session import get_spark
    from ..sources import files

    spark = get_spark("lcc-plot-lcs")
    obs = files.load_dat_curves(spark, opts.path)
    pdf = obs.orderBy("star_id", "t").toPandas()
    n_stars = pdf["star_id"].nunique()
    print(f"There are {n_stars} stars in the folder; saving into {save_path}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        plt = None

    for sid, grp in pdf.groupby("star_id"):
        if plt is not None:
            fig, ax = plt.subplots(figsize=(8, 4))
            ax.plot(grp["t"], grp["mag"], "k.", markersize=3)
            ax.invert_yaxis()  # magnitudes: brighter is smaller
            ax.set_xlabel("t [days]")
            ax.set_ylabel("mag")
            ax.set_title(str(sid))
            fig.savefig(os.path.join(save_path, f"{sid}.png"), dpi=100)
            plt.close(fig)
        else:
            with open(os.path.join(save_path, f"{sid}.plot.dat"), "w") as f:
                f.write("# t mag\n")
                for _, r in grp.iterrows():
                    f.write(f"{r['t']} {r['mag']}\n")

    print(f"Images of light curves in {opts.path} were saved into {save_path}")
    return 0
