"""CLI smoke: create_project → prepare_query → make_filter →
filter_stars driven purely from argv (mirrors the reference's documented
workflow, lcc/cli/lcc.py + bin/*.py). Light-curve fixtures are written
from the driver testdata so the shapes match the engine's own samples."""

import os

import pytest
from pyspark.sql import functions as F

from lightcurvesclassifier_spark.cli import lcc as cli
from lightcurvesclassifier_spark.sources import files, testdata
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def project(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cliproj")
    rc = cli.main(["create_project", "proj", str(root)], path=str(root))
    assert rc == 0
    proj = str(root / "proj")

    # two labelled samples: variable-looking vs flat curves, as dat files
    obs = testdata.observations(spark, SF_SMOKE).filter(F.col("band") == "view")
    searched_dir = os.path.join(proj, "inp_lcs", "searched")
    contam_dir = os.path.join(proj, "inp_lcs", "contam")
    os.makedirs(searched_dir, exist_ok=True)
    os.makedirs(contam_dir, exist_ok=True)
    files.save_dat_curves(obs, searched_dir)
    # smooth monotone trends → low Abbe value, separable from the noisy
    # originals (abbe ≈ 1.2 on the testdata curves)
    flat = obs.select(
        F.concat(F.lit("flat"), F.col("star_id")).alias("star_id"),
        "t",
        (10.0 + F.col("t") * 0.01).alias("mag"),
        "err",
    )
    files.save_dat_curves(flat, contam_dir)
    return proj


def test_create_project_tree(project):
    for d in ("inp_lcs", "tun_params", "queries", "filters", "query_results"):
        assert os.path.isdir(os.path.join(project, d))
    assert os.path.isfile(os.path.join(project, "project_settings.py"))


def test_prepare_query_cartesian(project):
    rc = cli.main(
        [
            "prepare_query",
            "-o", "tune.txt",
            "-p", "VariogramSlopeDescr:bins",
            "-r", "10,20",
            "-f", "t",
        ],
        path=project,
    )
    assert rc == 0
    lines = open(os.path.join(project, "tun_params", "tune.txt")).read().splitlines()
    assert lines[0] == "#VariogramSlopeDescr:bins"
    assert lines[1:] == ["10", "20"]


def test_prepare_query_range_grammar(project):
    rc = cli.main(
        [
            "prepare_query",
            "-o", "q.txt",
            "-p", "starid", "-r", "5:12:3",
            "-p", "target", "-r", "lmc,smc",
            "-f", "q",
        ],
        path=project,
    )
    assert rc == 0
    lines = open(os.path.join(project, "queries", "q.txt")).read().splitlines()
    # reference example (prepare_query.py:37-55): cartesian product
    assert lines[0] == "#starid;target"
    assert len(lines) == 1 + 3 * 2
    assert lines[1] == "5;lmc"


def test_make_filter_then_filter_stars(project):
    # self-contained: (re)generate the tuning file
    assert cli.main(
        ["prepare_query", "-o", "tune.txt",
         "-p", "VariogramSlopeDescr:bins", "-r", "10,20", "-f", "t"],
        path=project,
    ) == 0
    rc = cli.main(
        [
            "make_filter",
            "-i", "tune.txt",
            "-n", "SmokeFilter",
            "-f", "AbbeValueDescr",
            "-s", "searched",
            "-c", "contam",
            "-d", "GaussianNBDec",
        ],
        path=project,
    )
    assert rc == 0
    fdir = os.path.join(project, "filters", "SmokeFilter")
    # a saved filter is a directory artifact with a JSON manifest
    assert os.path.isfile(
        os.path.join(fdir, "SmokeFilter.filter", "filter.json")
    )
    assert os.path.isfile(os.path.join(fdir, "ROC_data.dat"))
    assert os.path.isfile(os.path.join(fdir, "stats.dat"))
    assert open(os.path.join(fdir, "ROC_data.dat")).readline() == "#fp\ttp\n"
    coords = open(os.path.join(fdir, "searched_coords.dat")).read().splitlines()
    assert coords[0].startswith("#") and len(coords) > 1

    # query file pointing FileManager at both folders
    qfile = os.path.join(project, "queries", "search.txt")
    with open(qfile, "w") as f:
        f.write("#path\nsearched\ncontam\n")

    rc = cli.main(
        [
            "filter_stars",
            "-r", "run1",
            "-q", "search.txt",
            "-d", "FileManager",
            "-f", "SmokeFilter",
        ],
        path=project,
    )
    assert rc == 0
    run_dir = os.path.join(project, "query_results", "run1")
    status = open(os.path.join(run_dir, "query_status.txt")).read().splitlines()
    assert status[0] == "#query_id;star_id;found;passed"
    assert len(status) > 1
    # the variable (searched-like) stars pass, the flat contaminants don't
    passed = [l for l in status[1:] if l.endswith(";True")]
    flat_passed = [l for l in passed if ";flat" in l]
    assert passed and not flat_passed
    # passed stars' curves written as dat files
    lcs = os.listdir(os.path.join(run_dir, "lcs"))
    assert len(lcs) == len(passed)
    assert os.path.isfile(os.path.join(run_dir, "coords.dat"))


def test_unknown_command_errors(project, capsys):
    assert cli.main(["bogus"], path=project) == 2


def test_plot_lcs(project, tmp_path):
    out = tmp_path / "imgs"
    rc = cli.main(
        [
            "plot_lcs",
            "-p", os.path.join(project, "inp_lcs", "searched"),
            "-o", str(out),
        ],
        path=project,
    )
    assert rc == 0
    arts = os.listdir(out)
    # matplotlib absent in this container → plot-data artifacts; with
    # matplotlib present the same path writes PNGs
    assert arts and all(a.endswith((".png", ".plot.dat")) for a in arts)


def test_filter_stars_overlapping_queries(project):
    """A star matched by several query rows must not duplicate its
    observations (feature skew: doubled curve_density, halved abbe
    diffs) nor its ledger/(lcs) artifacts — one feature row per star,
    one ledger row per (query, star), single-copy dat files."""
    qfile = os.path.join(project, "queries", "overlap.txt")
    with open(qfile, "w") as f:
        f.write("#path\nsearched\nsearched\n")
    rc = cli.main(
        [
            "filter_stars",
            "-r", "run_overlap",
            "-q", "overlap.txt",
            "-d", "FileManager",
            "-f", "SmokeFilter",
        ],
        path=project,
    )
    assert rc == 0
    run_dir = os.path.join(project, "query_results", "run_overlap")
    status = open(os.path.join(run_dir, "query_status.txt")).read().splitlines()
    body = status[1:]
    # one row per (query, star): both queries see every star, no dups
    assert len(body) == len(set(body))
    stars = {l.split(";")[1] for l in body}
    assert len(body) == 2 * len(stars)
    # passed stars identical under both queries (star-level decision)
    passed_by_q = {}
    for l in body:
        q, s, _, p = l.split(";")
        passed_by_q.setdefault(q, set())
        if p == "True":
            passed_by_q[q].add(s)
    assert passed_by_q["0"] == passed_by_q["1"]
    # single-copy dat files: same content as the source curve
    lcs_dir = os.path.join(run_dir, "lcs")
    a_star = sorted(passed_by_q["0"])[0]
    out_lines = open(os.path.join(lcs_dir, f"{a_star}.dat")).read().splitlines()
    src_lines = (
        open(os.path.join(project, "inp_lcs", "searched", f"{a_star}.dat"))
        .read()
        .splitlines()
    )
    assert len(out_lines) == len(src_lines)
