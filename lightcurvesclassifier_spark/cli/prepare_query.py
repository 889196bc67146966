"""``lcc prepare_query`` — generate query / tuning-combination files.

Mirrors lcc/bin/prepare_query.py:24-175: ``-p name -r range`` pairs are
expanded to the cartesian product and written in the StatusResolver
``#a;b;c`` + ``;``-delimited format (sources/files.save_query_file).
Range grammar (prepare_query.py:107-140): ``a,b,c`` enumerations,
``from:to`` integer ranges, ``from:to:step`` numeric ranges, or a
single literal value.
"""

from __future__ import annotations

import argparse
import itertools
import os


def _parse_range(text: str) -> list:
    if "," in text:
        return [t.strip() for t in text.split(",")]
    parts = text.split(":")
    if len(parts) == 1:
        return [text]
    if len(parts) == 2:
        parts.append("1")  # from:to defaults the step (reference :119-124)
    if len(parts) == 3:
        try:
            return list(range(int(parts[0]), int(parts[1]), int(parts[2])))
        except ValueError:
            # float endpoints — the reference's arange fallback
            # (prepare_query.py:129-136)
            import numpy as np

            return np.arange(
                float(parts[0]), float(parts[1]), float(parts[2])
            ).tolist()
    raise ValueError(f"range {text!r} has more than two ':' separators")


def main(project_settings=None, argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="lcc prepare_query",
        description="Generate a query / tuning-parameters file "
        "(reference: bin/prepare_query.py).",
    )
    p.add_argument("-o", "--output", default="my_query.txt")
    p.add_argument("-p", "--param", action="append", default=[])
    p.add_argument("-r", "--range", action="append", default=[])
    p.add_argument("-d", "--delim", default=";")
    p.add_argument(
        "-f",
        "--folder",
        default=".",
        help="'q' = project queries dir, 't' = project tun_params dir, "
        "else a path",
    )
    opts = p.parse_args(argv)

    if len(opts.param) != len(opts.range):
        raise ValueError("Number of parameters and ranges have to be the same")
    if not opts.param:
        p.print_help()
        return 1

    values = [_parse_range(r) for r in opts.range]
    if opts.folder == "q":
        path = project_settings.QUERIES
    elif opts.folder == "t":
        path = project_settings.TUN_PARAMS
    else:
        path = opts.folder

    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, opts.output)
    with open(out, "w") as f:
        f.write("#" + opts.delim.join(opts.param) + "\n")
        for combo in itertools.product(*values):
            f.write(opts.delim.join(str(v) for v in combo) + "\n")
    print(f"Done. File {opts.output} was saved into {path}")
    return 0
