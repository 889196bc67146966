"""Command-line surface of the engine — the reference's documented UX.

``lcc`` dispatcher (lcc/cli/lcc.py:10-48) with the four sub-commands:
``create_project`` (lcc/bin/create_project.py:10-51), ``prepare_query``
(lcc/bin/prepare_query.py:24-175), ``make_filter``
(lcc/bin/make_filter.py:34-390) and ``filter_stars``
(lcc/bin/filter_stars.py:21-216) — thin argv wrappers over the
Spark-first operators; no logic of their own beyond argument parsing,
project-settings resolution, and artifact placement.
"""

from .lcc import main  # noqa: F401
