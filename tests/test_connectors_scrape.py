"""Connector parse logic against recorded-response fixtures, fully
offline — reproducing the golden shapes of the reference's
test/db_tier/test_connectors.py:29-58 (3 OGLE-II stars with light
curves; Kepler KIC name + 1624 clean samples; OGLE-III cross-database
identifiers)."""

import numpy as np
import pytest

from lightcurvesclassifier_spark.sources import connectors, fits


# ---------------------------------------------------------------------------
# Recorded-response fixtures (photdb HTML format as served by
# ogledb.astrouw.edu.pl; values synthetic)


def _photdb_html(header, rows, tmpdir=None):
    head = "<html><body>\n<form>\n"
    if tmpdir:
        head += f"<input type='hidden' name='tmpdir' value='{tmpdir}'>\n"
    table = "<p><table border=1>\n<tr>" + "".join(
        f"<th>{h}</th>" for h in header
    ) + "</tr>\n"
    for row in rows:
        table += "<tr>" + "".join(
            f"<td>{c}</td>" if c is not None else "<td>&nbsp;</td>" for c in row
        ) + "</tr>\n"
    return head + table + "</table>\n</body></html>\n"


OGLE2_HEADER = ["No", "Field", "StarID", "RA", "Decl", "V", "I", "B"]
# starid query: 1 star; cone (lmc target): 2 stars; smc/bul: empty
OGLE2_STARID_HTML = _photdb_html(
    OGLE2_HEADER,
    [["1", "LMC_SC1", "2", "5.545575", "-70.55272", "17.34", "16.92", "17.81"]],
    tmpdir="tmp_ab12",
)
OGLE2_CONE_HTML = _photdb_html(
    OGLE2_HEADER,
    [
        ["1", "LMC_SC1", "152248", "5.545575", "-70.55272", "18.20", "17.55", None],
        ["2", "LMC_SC1", "152249", "5.545580", "-70.55270", "19.01", "18.40", "19.31"],
    ],
    tmpdir="tmp_cd34",
)
OGLE2_EMPTY_HTML = "<html><body>\nNo entries found\n</body></html>\n"

OGLE3_HEADER = [
    "No", "ID", "Field", "StarID", "RA", "Decl", "Type", "Subtype",
    "I", "V", "P_1", "A_1", "ID_OGLE_II", "ID_MACHO", "ID_ASAS",
    "ID_GCVS", "ID_OTHER", "Remarks",
]
OGLE3_HTML = _photdb_html(
    OGLE3_HEADER,
    [
        [
            "1", "OGLE-LMC-CEP-1274", "LMC135.5", "19670", "4.85336",
            "-69.00918", "Cep", "F", "15.53", "16.12", "3.118", "0.31",
            "LMC_SC1_152248", "79.5628.1274", None, None, None, None,
        ]
    ],
)


def _dat_lc(n, t0=2450000.0):
    lines = []
    for i in range(n):
        lines.append(f"{t0 + i * 1.37:.5f} {17.0 + 0.01 * (i % 7):.4f} {0.005:.4f}")
    return "\n".join(lines) + "\n"


def _kepler_fits(n=1700, n_nan=76):
    t = 131.5 + np.arange(n) * 0.0204
    flux = 4.1e5 + 100.0 * np.sin(np.arange(n) / 50.0)
    err = np.full(n, 12.5)
    flux[5 : 5 + n_nan] = np.nan  # Kepler gaps → NaN flux rows
    return fits.write_table_fits(
        {"OBJECT": "KIC 9787239"},
        [("LIGHTCURVE", {"TIME": t, "SAP_FLUX": flux, "SAP_FLUX_ERR": err})],
    )


KEPLER_STAR_JSON = {
    "_name": "9787239",
    "kic_degree_ra": 297.8399,
    "kic_dec": 46.57427,
    "kic_2mass_id": "19512136+4634274",
    "kic_jmag": 11.04,
    "kic_hmag": 10.68,
    "kic_kmag": 10.59,
    "kic_teff": 5135.0,
}

CATALINA_HTML = (
    "<html><script>\n"
    "var dataSet0 = {label: 'CSS_J001234', color: '#ff0000', "
    "data: [[53464.163, 14.28, 0.06], [53464.172, 14.31, 0.06]]}\n"
    "</script>\n"
    "<a href='http://nesssi.cacr.caltech.edu/cgi?ID=1109065026725&PLOT=plot'>plot</a>\n"
    "</html>"
)


# ---------------------------------------------------------------------------
# Parse-level golden checks


def test_photdb_table_and_tmpdir():
    header, rows, tmpdir = connectors.parse_photdb_response(OGLE2_CONE_HTML)
    assert header == OGLE2_HEADER
    assert len(rows) == 2 and rows[0][1] == "LMC_SC1"
    assert rows[1][7] == "19.31"
    assert tmpdir == "tmp_cd34"
    h, r, t = connectors.parse_photdb_response(OGLE2_EMPTY_HTML)
    assert (h, r, t) == ([], [], None)


def test_ogle2_query_normalization_and_params():
    qs = connectors.ogle2_normalize_queries(
        [
            {"starid": 2, "field_num": 1, "target": "lmc"},
            {"ra": 5.545575 * 15, "dec": -70.55272, "delta": 3},
        ]
    )
    # starid query kept, cone fans out to the three bvi targets
    assert len(qs) == 4
    assert qs[0]["field"] == "LMC_SC1"
    assert {q["target"] for q in qs[1:]} == {"lmc", "smc", "bul"}
    params = connectors.ogle2_form_params(qs[0])
    assert params["use_starid"] is True and params["val_starid"] == 2
    assert "use_ra" not in params  # no falsy/off keys survive
    cone_params = connectors.ogle2_form_params(qs[1])
    # RA bounds are served in hours (deg/15)
    assert cone_params["valmax_ra"] == pytest.approx(
        (5.545575 * 15 + 3 / 3600.0) / 15.0
    )


def test_ogle2_star_parse_golden():
    stars, tmpdir = connectors.ogle2_parse_stars(OGLE2_STARID_HTML)
    assert tmpdir == "tmp_ab12"
    (s,) = stars
    assert s["name"] == "LMC_SC1_2"
    assert s["ra_deg"] == pytest.approx(5.545575 * 15)  # hours → degrees
    assert s["dec_deg"] == pytest.approx(-70.55272)
    assert s["more"] == {
        "i_mag": 16.92, "b_mag": 17.81, "v_mag": 17.34,
    }
    assert s["ident"]["OgleII"] == "LMC_SC1_2"
    assert s["ident"]["OgleII.field"] == "LMC_SC1"


def test_ogle3_star_parse_cross_db_idents():
    stars, _ = connectors.ogle3_parse_stars(OGLE3_HTML)
    (s,) = stars
    assert s["name"] == "OGLE-LMC-CEP-1274"
    assert s["star_class"] == "Cep"
    # cross-database identifiers incl. split db_ident parts
    assert s["ident"]["Macho"] == "79.5628.1274"
    assert s["ident"]["Macho.Field"] == "79"
    assert s["ident"]["Macho.Tile"] == "5628"
    assert s["ident"]["OgleII"] == "LMC_SC1_152248"
    assert s["ident"]["OgleII.field"] == "LMC_SC1"
    assert s["ident"]["OgleII.starid"] == "152248"
    assert "Asas" not in s["ident"]  # &nbsp; columns skipped
    assert s["more"]["period"] == pytest.approx(3.118)
    assert s["more"]["i_mag"] == pytest.approx(15.53)
    # LC bucket: last two digits of the star number
    assert connectors.ogle3_lc_url("OGLE-LMC-CEP-1274").endswith(
        "data/I/74/OGLE-LMC-CEP-1274.dat"
    )


def test_ogle3_types_filter_params():
    params = connectors.ogle3_form_params({"target": "lmc", "types": ["DPV"]})
    assert params["use_type"] == "on" and params["val_typeDPV"] == "on"
    with pytest.raises(ValueError, match="Invalid star type"):
        connectors.ogle3_normalize_queries([{"types": ["NotAType"]}])


def test_kepler_query_params_range_tokens():
    p = connectors.kepler_query_params(
        {"ra": 297.8399, "dec": 46.57427, "delta": 10}
    )
    d = 10 / 3600.0
    assert p["kic_degree_ra"] == f"{297.8399 - d:f}..{297.8399 + d:f}"
    p2 = connectors.kepler_query_params({"kic_jkcolor": (0.3, 0.4), "max_records": 2})
    assert p2 == {"kic_jkcolor": "0.3..0.4", "max_records": 2}


def test_kepler_star_and_lc_golden():
    s = connectors.kepler_parse_star(KEPLER_STAR_JSON)
    assert s["name"] == "KIC_9787239"
    # the 2MASS designation stays verbatim (kic_ prefixes KIC ids only —
    # a prefixed designation could never ident-match a real 2MASS entry)
    assert s["ident"] == {
        "2mass": "19512136+4634274", "kepler": "kic_9787239",
    }
    assert s["more"]["teff"] == 5135.0
    lc = connectors.kepler_parse_lc(_kepler_fits())
    assert len(lc) == 1624  # the reference's golden sample count
    assert not any(np.isnan(v) for row in lc for v in row)


def test_catalina_js_blob_parse():
    (s,) = connectors.catalina_parse_star(CATALINA_HTML)
    assert s["name"] == "CSS_J001234"
    assert s["ident"] == {"CRST": "1109065026725"}
    assert s["_lc"] == [[53464.163, 14.28, 0.06], [53464.172, 14.31, 0.06]]
    assert connectors.catalina_parse_star("<html>nothing</html>") == []


def test_catalina_query_routing():
    params, root = connectors.catalina_normalize_query(
        {"ra": 10.08, "dec": -39.625, "delta": 20}
    )
    assert root == connectors.CATALINA_COO_ROOT
    assert params["Rad"] == pytest.approx(20 / 60.0)  # arcsec → arcmin
    params, root = connectors.catalina_normalize_query({"id": "1109065026725"})
    assert root == connectors.CATALINA_ID_ROOT
    assert params["ID"] == "1109065026725"


# ---------------------------------------------------------------------------
# Spark stages: the reference's test_OgleII / test_Kepler shapes


def test_ogle2_spark_fetch_golden(spark):
    # bind fixtures to locals: the closure must pickle by value (the test
    # module isn't importable on executors)
    starid_html, cone_html, empty_html = (
        OGLE2_STARID_HTML, OGLE2_CONE_HTML, OGLE2_EMPTY_HTML,
    )
    lc_text = _dat_lc(40)

    def transport(url, params):
        if url.endswith(".dat"):
            return lc_text
        if "getobj.php" in url:
            return ""
        assert params["db_target"] in ("lmc", "smc", "bul")
        if params.get("use_starid"):
            return starid_html
        if params["db_target"] == "lmc":
            return cone_html
        return empty_html

    stars = connectors.fetch_stars_scraped(
        spark,
        "OgleII",
        [
            {"starid": 2, "field_num": 1, "target": "lmc"},
            {"ra": 5.545575 * 15, "dec": -70.55272, "delta": 3},
        ],
        transport,
    )
    rows = stars.collect()
    assert len(rows) == 3  # the reference's golden star count
    assert {r["name"] for r in rows} == {
        "LMC_SC1_2", "LMC_SC1_152248", "LMC_SC1_152249",
    }
    assert all(r["origin"] == "OgleII" for r in rows)
    obs = connectors.fetch_light_curves_scraped(stars, "OgleII", transport)
    counts = {
        r["star_id"]: r["n"]
        for r in obs.groupBy("star_id").count().withColumnRenamed("count", "n").collect()
    }
    assert counts == {
        "LMC_SC1_2": 40, "LMC_SC1_152248": 40, "LMC_SC1_152249": 40,
    }
    assert obs.select("band").distinct().collect()[0]["band"] == "I"


def test_kepler_spark_fetch_golden(spark):
    lc_bytes = _kepler_fits()
    star_json = dict(KEPLER_STAR_JSON)

    def transport(url, params):
        if url == "kplr:stars":
            return [star_json]
        if url.startswith("kplr:lc:"):
            return lc_bytes
        raise AssertionError(url)

    stars = connectors.fetch_stars_scraped(
        spark, "Kepler", [{"kic_num": 9787239}], transport
    )
    (srow,) = stars.collect()
    assert srow["name"] == "KIC_9787239"
    obs = connectors.fetch_light_curves_scraped(stars, "Kepler", transport)
    assert obs.count() == 1624
    # max_bins ekvi-PAA downsample at ingest (the CoRoT read path)
    reduced = connectors.fetch_light_curves_scraped(
        stars, "Kepler", transport, max_bins=100
    )
    assert reduced.count() == 100
    # downsampled magnitudes stay within the raw flux envelope
    stats = reduced.agg({"mag": "min"}).collect()[0][0]
    assert stats > 4.0e5


def test_catalina_spark_fetch(spark):
    html = CATALINA_HTML

    def transport(url, params):
        return html

    stars = connectors.fetch_stars_scraped(
        spark, "Catalina", [{"id": "1109065026725"}], transport
    )
    (row,) = stars.collect()
    assert row["name"] == "CSS_J001234"
    obs = connectors.fetch_light_curves_scraped(stars, "Catalina", transport)
    got = obs.orderBy("t").collect()
    assert [(r["t"], r["mag"]) for r in got] == [
        (53464.163, 14.28), (53464.172, 14.31),
    ]


def test_ogle3_spark_fetch(spark):
    html = OGLE3_HTML
    lc_text = _dat_lc(25)

    def transport(url, params):
        if url.endswith(".dat"):
            return lc_text
        return html

    stars = connectors.fetch_stars_scraped(
        spark, "OgleIII", [{"field": "LMC135.5", "starid": 19670}], transport
    )
    (row,) = stars.collect()
    assert row["star_class"] == "Cep"
    assert row["ident"]["Macho.Seqn"] == "1274"
    obs = connectors.fetch_light_curves_scraped(stars, "OgleIII", transport)
    assert obs.count() == 25
    # .dat loader rounds to (4, 3, 3) as the reference does
    first = obs.orderBy("t").first()
    assert first["t"] == round(first["t"], 4)


def test_catalina_multiline_blob_and_second_dataset():
    """Live CRTS responses are not guaranteed single-line; the dataSet
    regex must span lines (DOTALL) and stop at the FIRST closing brace
    (non-greedy) so a second dataSet cannot corrupt the capture."""
    html = (
        "<html><script>\n"
        "var dataSet0 = {label: 'CSS_J9',\n"
        " color: '#ff0000',\n"
        " data: [[53464.163, 14.28, 0.06]]}\n"
        "; var dataSet1 = {label: 'other', data: []}\n"
        "</script></html>"
    )
    (s,) = connectors.catalina_parse_star(html)
    assert s["name"] == "CSS_J9"
    assert s["_lc"] == [[53464.163, 14.28, 0.06]]


def test_ogle3_gcvs_id_param_spelled_consistently():
    """The GCVS constraint key is 'gcvs_id' everywhere else in the
    module; the form builder read 'gvcs_id' and silently dropped the
    filter (full-catalog result for a one-star query)."""
    params = connectors.ogle3_form_params({"gcvs_id": "RW Dor"})
    assert params.get("val_id_gcvs") == "RW Dor"
