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


def test_query_file_custom_delimiter_round_trip(project, spark):
    """prepare_query honors -d; load_query_file must sniff the
    delimiter instead of collapsing a ','-written file into one
    column."""
    rc = cli.main(
        [
            "prepare_query",
            "-o", "qcomma.txt",
            "-p", "a", "-r", "1:3",
            "-p", "b", "-r", "x,y",
            "-f", "q",
            "-d", ",",
        ],
        path=project,
    )
    assert rc == 0
    df = files.load_query_file(
        spark, os.path.join(project, "queries", "qcomma.txt")
    )
    assert df.columns == ["a", "b"]
    assert df.count() == 4


def test_query_value_coercion():
    """Query-file strings must reach the remote predicate builders as
    numbers ('10' / 3600.0 raised; '9.0' compiled to string ADQL)."""
    from lightcurvesclassifier_spark.cli.stars_io import coerce_query_values

    out = coerce_query_values(
        [{"ra": "297.8", "dec": "46.5", "delta": "10", "target": "lmc"}]
    )[0]
    assert out == {"ra": 297.8, "dec": 46.5, "delta": 10, "target": "lmc"}
    assert isinstance(out["delta"], int)


def test_text_lc_response_parses_to_obs():
    """LC endpoints (Asas CGI / Macho Vgraph) answer plain text, not
    TAP JSON — the transport's fallback parser must yield obs dicts."""
    from lightcurvesclassifier_spark.cli.stars_io import _parse_text_obs

    body = (
        "# HJD mag err\n"
        "<!-- html noise -->\n"
        "2450001.5 14.23 0.05\n"
        "2450002.5 14.31 0.04\n"
        "bad line\n"
        "2450003.5 14.19\n"
    )
    obs = _parse_text_obs(body)
    assert [o["t"] for o in obs] == [2450001.5, 2450002.5, 2450003.5]
    assert obs[0]["err"] == 0.05 and obs[2]["err"] is None


def test_featurize_single_band_and_shared_pass(spark):
    """Multi-band curves must not interleave into one pseudo-curve
    (abbe's successive diffs would measure B−R color), and shared-
    family descriptors must come from ONE aggregation."""
    from lightcurvesclassifier_spark.cli import descriptors as dr

    b = [(1, "B", float(t), 10.0 + 0.001 * t) for t in range(40)]
    r = [(1, "R", float(t) + 0.01, 15.0 + (t % 2)) for t in range(40)]
    obs = spark.createDataFrame(
        b + r, "star_id long, band string, t double, mag double"
    )
    feats, cols = dr.featurize(
        obs, ["AbbeValueDescr", "CurveDensityDescr"], {}
    )
    row = feats.collect()[0]
    assert cols == ["abbe", "curve_density"]
    # B-band only: a smooth trend → tiny abbe; interleaved B+R would
    # alternate ±5 mag and drive abbe toward ~2
    assert row.abbe < 0.2, row
    only_b = dr.featurize(
        obs.filter(F.col("band") == "B").drop("band"),
        ["AbbeValueDescr"],
        {},
    )[0].collect()[0]
    assert abs(row.abbe - only_b.abbe) < 1e-12


def test_filter_stars_unresolved_feature_guard(project, spark, tmp_path):
    """A filter needing a mix of resolvable and unresolvable features
    must fail with the clear message, not an AnalysisException later."""
    from lightcurvesclassifier_spark.cli import filter_stars as fs
    from lightcurvesclassifier_spark.ml.deciders import make_decider
    from lightcurvesclassifier_spark.ml.persistence import save_filter
    from lightcurvesclassifier_spark.ml.stars_filter import StarsFilter

    class Settings:
        QUERIES = os.path.join(project, "queries")
        FILTERS = str(tmp_path)
        RESULTS = os.path.join(project, "query_results")
        INP_LCS = os.path.join(project, "inp_lcs")

    dec = make_decider("CustomDecider", ranges={"abbe": (None, 0.95)})
    filt = StarsFilter([dec], ["abbe", "cmp_distance"])
    filt.learned = True
    os.makedirs(os.path.join(tmp_path, "Mixed"), exist_ok=True)
    save_filter(filt, os.path.join(tmp_path, "Mixed", "Mixed.filter"))
    with open(os.path.join(Settings.QUERIES, "one.txt"), "w") as f:
        f.write("#path\nsearched\n")
    with pytest.raises(ValueError, match="cmp_distance"):
        fs.main(
            Settings,
            ["-r", "runx", "-q", "one.txt", "-d", "FileManager",
             "-f", "Mixed"],
        )
