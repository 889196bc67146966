"""Project scaffolding + settings loading.

Mirrors lcc/bin/create_project.py:10-51 (directory tree + generated
``project_settings.py``) and lcc/cli/lcc.py:20-28 (importlib load of the
settings module from the working directory).
"""

from __future__ import annotations

import importlib.util
import os

# The reference's tree (create_project.py:36-41); query_results holds
# per-run output folders.
PROJECT_DIRS = ("inp_lcs", "tun_params", "queries", "filters", "query_results")

SETTINGS_TEMPLATE = """import os

project_dir = {project_dir!r}

# Input locations
INP_LCS = os.path.join(project_dir, 'inp_lcs')
TUN_PARAMS = os.path.join(project_dir, 'tun_params')
QUERIES = os.path.join(project_dir, 'queries')
FILTERS = os.path.join(project_dir, 'filters')
RESULTS = os.path.join(project_dir, 'query_results')
"""


def create_project(argv: list[str] | None = None) -> str:
    """``lcc create_project [name] [path]`` — returns the project dir."""
    argv = argv or []
    cwd = os.getcwd()
    if not argv:
        path, name = cwd, "project"
    elif len(argv) == 1:
        path, name = cwd, argv[0]
    elif len(argv) == 2:
        name = argv[0]
        path = argv[1] if argv[1].startswith("/") else os.path.join(cwd, argv[1])
    else:
        raise ValueError("Invalid number of parameters")

    project_dir = os.path.join(path, name)
    for d in PROJECT_DIRS:
        os.makedirs(os.path.join(project_dir, d), exist_ok=True)
    with open(os.path.join(project_dir, "project_settings.py"), "w") as f:
        f.write(SETTINGS_TEMPLATE.format(project_dir=project_dir))
    return project_dir


def load_project_settings(path: str | None = None):
    """Import ``project_settings.py`` from ``path`` (default: cwd)."""
    path = path or os.getcwd()
    settings_file = os.path.join(path, "project_settings.py")
    if not os.path.exists(settings_file):
        raise IOError(
            "There is no 'project_settings.py' in the current directory. "
            "Create a project first with 'lcc create_project'."
        )
    spec = importlib.util.spec_from_file_location("project_settings", settings_file)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
