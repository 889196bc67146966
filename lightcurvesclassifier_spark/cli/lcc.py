"""``lcc`` dispatcher — mirrors lcc/cli/lcc.py:10-48.

Usage: ``python -m lightcurvesclassifier_spark.cli.lcc <command> [args]``
with commands ``create_project``, ``make_filter``, ``filter_stars``,
``prepare_query``. All but create_project require a
``project_settings.py`` in the working directory (or ``path``).
"""

from __future__ import annotations

import sys

from .project import create_project, load_project_settings

USAGE = (
    "Light Curves Classifier (Spark): use one of the following commands: "
    "create_project, make_filter, filter_stars, prepare_query, plot_lcs"
)

COMMANDS = (
    "create_project",
    "make_filter",
    "filter_stars",
    "prepare_query",
    "plot_lcs",
)


def main(argv: list[str] | None = None, path: str | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(USAGE)
        return 0

    option, rest = argv[0], argv[1:]
    if option == "create_project":
        project_dir = create_project(rest)
        print(f"Project created at {project_dir}")
        return 0

    if option not in COMMANDS:
        sys.stderr.write(
            "Invalid option. Parameter of lcc has to be 'create_project', "
            "'make_filter', 'filter_stars', 'prepare_query' or 'plot_lcs'\n"
        )
        return 2

    if option == "plot_lcs":
        # standalone like the reference's bin/plot_lcs.py — raw paths,
        # no project_settings needed
        from .plot_lcs import main as run

        return run(None, rest)

    project_settings = load_project_settings(path)

    if option == "make_filter":
        from .make_filter import main as run

        return run(project_settings, rest)
    if option == "filter_stars":
        from .filter_stars import main as run

        return run(project_settings, rest)
    from .prepare_query import main as run

    return run(project_settings, rest)


if __name__ == "__main__":
    sys.exit(main())
