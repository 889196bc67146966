"""Archive connector parse logic: OGLE-II, OGLE-III, Kepler, Catalina.

The reference's most-used entry point is a live archive query whose
response is HTML (OGLE photdb result tables — ogleII.py:201-318,
ogleIII.py:216-263), a kplr-style JSON + FITS pair (kepler.py:111-205),
or a JS blob (catalina.py:120-151). This module ports that *parse
logic* — pure text → records, no bs4/kplr/astropy needed — behind the
same injectable-transport seam `sources/remote.py` established, so
tests run fully offline against recorded responses and production wires
a real HTTP session.

Spark split (same as remote.py): the catalog query is control-plane —
one POST per user query, a handful of rows — parsed on the driver into
the unified ``stars`` DataFrame; the per-star light-curve fetch is the
data plane and runs distributed via ``mapInPandas``, with the optional
``max_bins`` ekvi-PAA downsample applied executor-side at ingest (the
CoRoT read path, corot.py:58-115) so oversampled curves never reach the
shuffle at full length.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Any, Callable, Iterator, Mapping, Sequence

import numpy as np

from pyspark.sql import DataFrame, SparkSession

from ..functions.kernels import to_ekvi_paa

# ---------------------------------------------------------------------------
# Transport seam

ScrapeTransport = Callable[[str, Mapping[str, Any] | None], "str | bytes"]
"""(url, form_params_or_None) → response body. POST when params given,
GET otherwise. Must be picklable (module-level function / partial) —
the light-curve stage ships it to executors."""


# ---------------------------------------------------------------------------
# photdb HTML result table (ogleII.py:201-246 — line scan for the first
# <p><table ...>...</table> block plus the tmpdir hidden input; the bs4
# soup of the reference becomes a stdlib HTMLParser)


class _FirstTable(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.header: list[str] = []
        self.rows: list[list[str | None]] = []
        self._in_table = self._done = False
        self._cell: list[str] | None = None
        self._row: list[str | None] | None = None
        self._is_th = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if self._done:
            return
        if tag == "table" and not self._in_table:
            self._in_table = True
        elif self._in_table and tag == "tr":
            self._row = []
        elif self._in_table and tag in ("td", "th"):
            self._cell = []
            self._is_th = tag == "th"

    def handle_endtag(self, tag: str) -> None:
        if self._done or not self._in_table:
            return
        if tag == "table":
            self._done = True
        elif tag == "tr" and self._row is not None:
            if self._row and not self._is_th:
                self.rows.append(self._row)
            self._row = None
        elif tag in ("td", "th") and self._cell is not None:
            text = "".join(self._cell)
            # bs4's td.find(text=True): first text node, None when empty
            value = text if text else None
            if self._is_th:
                self.header.append(text.strip())
            elif self._row is not None:
                self._row.append(value)
            self._cell = None

    def handle_data(self, data: str) -> None:
        if self._cell is not None:
            self._cell.append(data)


_TMPDIR_RE = re.compile(r"<input type='hidden' name='tmpdir' value='(.*)'>")


def parse_photdb_response(
    html: str,
) -> tuple[list[str], list[list[str | None]], str | None]:
    """(header, rows, lc_tmpdir) from a photdb query response. The row
    scan mirrors the reference: content before the first ``<p><table``
    is skipped, the table ends at the first ``</table>``, and the
    ``tmpdir`` hidden input (present only when light curves were
    requested) is captured from the preamble."""
    tmpdir = None
    m = _TMPDIR_RE.search(html)
    if m:
        tmpdir = m.group(1)
    start = html.find("<p><table")
    if start < 0:
        return [], [], tmpdir
    p = _FirstTable()
    p.feed(html[start + len("<p>") :])
    return p.header, p.rows, tmpdir


def parse_dat_lc(text: str) -> list[list[float]]:
    """photdb ``.dat`` light curve: ``t mag err`` per line, rounded to
    (4, 3, 3) decimals exactly as the reference loads it
    (ogleII.py:300-316)."""
    out = []
    for line in text.splitlines():
        # split on any whitespace run — photdb dat files are often
        # column-aligned with multiple spaces (split(" ") left empty
        # tokens that crashed float(""))
        parts = line.split()
        if len(parts) < 3:
            continue
        out.append(
            [
                round(float(parts[0]), 4),
                round(float(parts[1]), 3),
                round(float(parts[2]), 3),
            ]
        )
    return out


# ---------------------------------------------------------------------------
# OGLE-II (ogleII.py)

OGLE2_ROOT = "http://ogledb.astrouw.edu.pl/~ogle/photdb"
OGLE2_COL_MAP = {
    "Field": "field",
    "StarID": "starid",
    "RA": "ra",
    "Decl": "dec",
    "V": "v_mag",
    "I": "i_mag",
    "B": "b_mag",
}
OGLE2_BVI_TARGETS = ["lmc", "smc", "bul"]
OGLE2_PHOT_TARGETS = ["lmc", "smc", "bul", "car"]
OGLE2_QUERY_TYPES = ["bvi", "phot"]


def _get_ranges(ra, dec, delta):
    """Cone box (base_query._getRanges): ra/dec ± delta arcsec → deg."""
    if ra is None or dec is None or delta is None:
        return "", "", "", ""
    d = float(delta) / 3600.0
    return ra - d, ra + d, dec - d, dec + d


def ogle2_normalize_queries(
    queries: Sequence[Mapping[str, Any]],
) -> list[dict]:
    """The reference's _parseQueries fan-out (ogleII.py:159-199):
    default db, coordinate queries fan out to one query per survey
    target, starid queries resolve their target from the field name."""
    queries = [dict(q) for q in queries]
    todel, new = [], []
    for i, q in enumerate(queries):
        q.setdefault("db", OGLE2_QUERY_TYPES[0])
        if "ra" in q and "dec" in q and "target" not in q:
            todel.append(i)
            targets = (
                OGLE2_PHOT_TARGETS if q["db"] == "phot" else OGLE2_BVI_TARGETS
            )
            for target in targets:
                z = dict(q)
                z["target"] = target
                new.append(z)
        elif "starid" in q:
            if "field" in q:
                q["target"] = q["field"][:3].lower()
            elif "field_num" in q and "target" in q:
                q["field"] = q["target"].upper() + "_SC" + str(q["field_num"])
            else:
                raise ValueError("Unresolved target")
        if q["db"] not in OGLE2_QUERY_TYPES:
            raise ValueError(
                f"Invalid db. Available OgleII databases: {OGLE2_QUERY_TYPES}"
            )
    return [q for i, q in enumerate(queries) if i not in todel] + new


def ogle2_form_params(query: Mapping[str, Any]) -> dict:
    """The photdb POST payload (ogleII.py:105-148), falsy/"off" entries
    dropped; RA bounds are served in *hours* (ogleII.py:109-111)."""
    vmin_ra, vmax_ra, vmin_dec, vmax_dec = _get_ranges(
        query.get("ra"), query.get("dec"), query.get("delta")
    )
    if vmax_ra:
        vmax_ra = vmax_ra / 15.0
        vmin_ra = vmin_ra / 15.0
    params = {
        "db_target": query.get("target"),
        "dbtyp": "dia2",
        "sort": "field",
        "use_field": "field" in query,
        "val_field": query.get("field"),
        "use_starid": "starid" in query,
        "val_starid": query.get("starid"),
        "disp_ra": "on",
        "use_ra": vmin_ra != "",
        "valmin_ra": vmin_ra,
        "valmax_ra": vmax_ra,
        "disp_decl": "on",
        "use_decl": vmin_dec != "",
        "valmin_decl": vmin_dec,
        "valmax_decl": vmax_dec,
        "disp_imean": "on",
        "use_imean": "mag_i_min" in query,
        "valmin_imean": query.get("mag_i_min"),
        "valmax_imean": query.get("mag_i_max"),
        "disp_bmean": "on",
        "disp_vmean": "on",
        "sorting": "ASC",
        "pagelen": int(1e10),
    }
    # drop unset flags (None/False/''/'off') but KEEP numeric zeros —
    # a legitimate bound of 0/0.0 must stay in the payload (plain
    # truthiness silently unbounded the filter)
    return {
        k: v for k, v in params.items()
        if v is not None and v is not False and v != "" and v != "off"
    }


def _header_col_map(header: Sequence[str], col_map: Mapping[str, str]) -> dict:
    return {col_map[c]: i for i, c in enumerate(header) if c in col_map}


def ogle2_parse_stars(html: str) -> tuple[list[dict], str | None]:
    """Result rows → star records (ogleII.py:247-285): name is
    ``field_starid``, RA is served in hours → degrees, B/V/I magnitudes
    land in ``more``."""
    header, rows, tmpdir = parse_photdb_response(html)
    cols = _header_col_map(header, OGLE2_COL_MAP)
    stars = []
    for row in rows:
        field = str(row[cols["field"]])
        starid = int(row[cols["starid"]])
        more = {}
        for c in ("i_mag", "b_mag", "v_mag"):
            # presence test, not truthiness: a magnitude column at header
            # index 0 is still present (real photdb responses lead with a
            # 'No' column, but don't rely on it)
            if c in cols:
                try:
                    more[c] = float(row[cols[c]])
                except (TypeError, ValueError):
                    pass
        name = f"{field}_{starid}"
        stars.append(
            {
                "name": name,
                "ra_deg": float(row[cols["ra"]]) * 15.0,
                "dec_deg": float(row[cols["dec"]]),
                "ident": {
                    "OgleII": name,
                    "OgleII.field": field,
                    "OgleII.starid": str(starid),
                },
                "more": more,
                "star_class": None,
                "field": field,
                "starid": str(starid),
            }
        )
    return stars, tmpdir


def ogle2_fetch_lc(
    transport: ScrapeTransport, field: str, starid: str, tmpdir: str,
    root: str = OGLE2_ROOT,
) -> list[list[float]]:
    """Two-step photdb LC fetch (ogleII.py:288-318): POST getobj.php to
    materialize the tmp file, then GET the ``.dat``."""
    transport(
        f"{root}/getobj.php",
        {
            "field": field,
            "starid": starid,
            "tmpdir": tmpdir,
            "db": "DIA",
            "points": "good",
        },
    )
    body = transport(
        f"{root}/data/{tmpdir}/{field.lower()}_i_{starid}.dat", None
    )
    if isinstance(body, bytes):
        body = body.decode()
    return parse_dat_lc(body)


# ---------------------------------------------------------------------------
# OGLE-III (ogleIII.py)

OGLE3_ROOT = "http://ogledb.astrouw.edu.pl/~ogle/CVS/"
OGLE3_COL_MAP = {
    "Field": "field",
    "StarID": "starid",
    "RA": "ra",
    "Decl": "dec",
    "V": "v_mag",
    "I": "i_mag",
    "Type": "type",
    "Subtype": "subtype",
    "P_1": "period",
    "A_1": "i_ampl",
    "ID_OGLE_II": "ogle_ii_id",
    "ID_MACHO": "macho_id",
    "ID_ASAS": "asas_id",
    "ID_GCVS": "gcvs_id",
    "ID_OTHER": "other_id",
    "Remarks": "remarks",
    "ID": "name",
}
OGLE3_MORE = ["i_mag", "type", "subtype", "remarks", "i_ampl", "period", "v_mag"]
OGLE3_TYPES = ["Cep", "ACep", "LPV", "T2Cep", "RRLyr", "RCB", "DSCT", "DPV"]
_NBSP = "\xa0"


def ogle3_normalize_queries(
    queries: Sequence[Mapping[str, Any]],
) -> list[dict]:
    """ogleIII.py:181-215: coordinate queries default delta/target,
    starid queries resolve the target, star types are validated."""
    out = []
    for q in queries:
        q = dict(q)
        if "ra" in q and "dec" in q:
            q.setdefault("delta", 10)
            q.setdefault("target", "all")
        elif "starid" in q:
            if "field" in q:
                q["target"] = q["field"][:3].lower()
            elif "field_num" in q and "target" in q:
                q["field"] = q["target"].upper() + "_SC" + str(q["field_num"])
            else:
                raise ValueError("Unresolved target")
        if "types" in q:
            if isinstance(q["types"], str):
                # the form-params branch accepts a bare string; treat it
                # as a single type, not an iterable of characters
                q["types"] = [q["types"]]
            bad = [t for t in q["types"] if t not in OGLE3_TYPES]
            if bad:
                raise ValueError(
                    f"Invalid star type in the query. Available types: {OGLE3_TYPES}"
                )
        out.append(q)
    return out


def ogle3_form_params(query: Mapping[str, Any]) -> dict:
    """The CVS catalog POST payload (ogleIII.py:104-168) including the
    per-type ``val_type<T>`` switches."""
    vmin_ra, vmax_ra, vmin_dec, vmax_dec = _get_ranges(
        query.get("ra"), query.get("dec"), query.get("delta")
    )
    if vmax_ra:
        vmax_ra = vmax_ra / 15.0
        vmin_ra = vmin_ra / 15.0
    params = {
        "db_target": query.get("target"),
        "dbtyp": "dia2",
        "sort": "field",
        "use_field": "field" in query,
        "val_field": query.get("field"),
        "disp_field": "on",
        "use_starid": "starid" in query,
        "val_starid": query.get("starid"),
        "disp_starid": "on",
        "disp_type": "on",
        "disp_subtype": "on",
        "disp_ra": "on",
        "use_ra": vmin_ra != "",
        "valmin_ra": vmin_ra,
        "valmax_ra": vmax_ra,
        "disp_decl": "on",
        "use_decl": vmin_dec != "",
        "valmin_decl": vmin_dec,
        "valmax_decl": vmax_dec,
        "disp_imean": "on",
        "use_imean": "mag_i_min" in query,
        "valmin_i": query.get("mag_i_min"),
        "valmax_i": query.get("mag_i_max"),
        "valmin_v": query.get("mag_v_min"),
        "valmax_v": query.get("mag_v_max"),
        "disp_p1": "on",
        "valmin_p1": query.get("p1_min"),
        "valmax_p1": query.get("p1_max"),
        "disp_id_ogle_ii": "on",
        "val_id_ogle_ii": query.get("ogleii_id"),
        "disp_id_macho": "on",
        "val_id_macho": query.get("macho_id"),
        "disp_id_asas": "on",
        "val_id_asas": query.get("asas_id"),
        "disp_id_gcvs": "on",
        "val_id_gcvs": query.get("gcvs_id"),
        "disp_id_other": "on",
        "disp_remarsk": "on",
        "val_remarks": query.get("remarks"),
        "disp_vmean": "on",
        "disp_i": "on",
        "disp_v": "on",
        "sorting": "ASC",
        "pagelen": int(1e10),
    }
    if "types" in query:
        types = query["types"]
        if not hasattr(types, "__iter__") or isinstance(types, str):
            types = [types]
        params["use_type"] = "on"
        for t in types:
            params[f"val_type{t}"] = "on"
    # drop unset flags (None/False/''/'off') but KEEP numeric zeros —
    # a legitimate bound of 0/0.0 must stay in the payload (plain
    # truthiness silently unbounded the filter)
    return {
        k: v for k, v in params.items()
        if v is not None and v is not False and v != "" and v != "off"
    }


def _ogle3_db_ident(db: str, name: str) -> dict | None:
    """Cross-database identifier split (ogleIII.py:339-351)."""
    if db == "Macho":
        parts = name.split(".")
        if len(parts) == 3:
            return {"Field": parts[0], "Tile": parts[1], "Seqn": parts[2]}
    elif db == "OgleII":
        parts = name.split("_")
        if len(parts) == 3:
            return {"field": parts[0] + "_" + parts[1], "starid": parts[2]}
    return None


def ogle3_parse_stars(html: str) -> tuple[list[dict], str | None]:
    """CVS result rows → star records with cross-database identifiers
    (ogleIII.py:264-323): the Macho/Asas/OgleII/GCVS columns become
    ident entries (dotted keys carry the split db_ident parts), typed
    catalog values land in ``more``, the Type column is the class."""
    header, rows, tmpdir = parse_photdb_response(html)
    cols = _header_col_map(header, OGLE3_COL_MAP)
    stars = []
    for row in rows:
        field = str(row[cols["field"]])
        starid = str(row[cols["starid"]])
        name = str(row[cols["name"]])
        ident = {
            "OgleIII": name,
            "OgleIII.field": field,
            "OgleIII.starid": starid,
        }
        for db, key in (
            ("Macho", "macho_id"),
            ("Asas", "asas_id"),
            ("OgleII", "ogle_ii_id"),
            ("GCVS", "gcvs_id"),
        ):
            if key not in cols:
                continue
            val = row[cols[key]]
            if val is not None and val != _NBSP:
                ident[db] = str(val)
                parts = _ogle3_db_ident(db, str(val))
                if parts:
                    for k, v in parts.items():
                        ident[f"{db}.{k}"] = v
        more = {}
        for c in OGLE3_MORE:
            if c in cols:
                val = row[cols[c]]
                if val is None or val == _NBSP:
                    continue
                try:
                    more[c] = float(val)
                except (TypeError, ValueError):
                    pass  # unified `more` map is numeric; strings stay in ident/class
        stars.append(
            {
                "name": name,
                "ra_deg": float(row[cols["ra"]]) * 15.0,
                "dec_deg": float(row[cols["dec"]]),
                "ident": ident,
                "more": more,
                "star_class": str(row[cols["type"]]) if "type" in cols else None,
                "field": field,
                "starid": starid,
            }
        )
    return stars, tmpdir


def ogle3_lc_url(name: str, root: str = OGLE3_ROOT) -> str:
    """I-band LC location (ogleIII.py:325-337): bucketed by the last two
    digits of the star number."""
    num = name.split("-")[-1][-2:]
    return f"{root}data/I/{num}/{name}.dat"


# ---------------------------------------------------------------------------
# Kepler (kepler.py — the kplr API's JSON rows + FITS light curves)

KEPLER_STAR_MORE_MAP = {
    "kic_zmag": "z_mag",
    "kic_umag": "u_mag",
    "kic_kmag": "k_mag",
    "kic_jmag": "j_mag",
    "kic_hmag": "h_mag",
    "kic_imag": "i_mag",
    "kic_gmag": "g_mag",
    "kic_teff": "teff",
}
KEPLER_IDENTIFIER = {"kic_2mass_id": "2mass", "_name": "kepler"}


def kepler_query_params(query: Mapping[str, Any]) -> dict:
    """kplr search params (kepler.py:108-137): coordinate queries become
    ``lo..hi`` range tokens on kic_degree_ra/kic_dec; iterable values
    become range tokens too."""
    q = dict(query)
    ra, dec, delta = q.pop("ra", None), q.pop("dec", None), q.pop("delta", None)
    q.pop("nearest", None)
    if ra is not None and dec is not None and delta is not None:
        d = float(delta) / 3600.0
        return {
            "kic_degree_ra": f"{ra - d:f}..{ra + d:f}",
            "kic_dec": f"{dec - d:f}..{dec + d:f}",
        }
    out = {}
    for key, value in q.items():
        if hasattr(value, "__iter__") and not isinstance(value, str):
            out[key] = f"{value[0]}..{value[1]}"
        else:
            out[key] = value
    return out


def kepler_parse_star(data: Mapping[str, Any]) -> dict:
    """kplr star JSON → unified record (kepler.py:144-172): mapped
    ``kic_*`` magnitudes into ``more``, 2MASS + KIC identifiers, name
    ``KIC_<kepid>``."""
    more = {}
    ident = {}
    for key, value in data.items():
        if key in KEPLER_STAR_MORE_MAP and value is not None:
            try:
                more[KEPLER_STAR_MORE_MAP[key]] = float(value)
            except (TypeError, ValueError):
                pass
        elif key in KEPLER_IDENTIFIER and value is not None:
            target = KEPLER_IDENTIFIER[key]
            # kic_ prefixes KIC numbers only; a 2MASS designation must
            # stay verbatim or ident-based crossmatch can never match
            ident[target] = f"kic_{value}" if target == "kepler" else str(value)
    name = "KIC_" + str(data.get("_name", ""))
    return {
        "name": name,
        "ra_deg": float(data["kic_degree_ra"]),
        "dec_deg": float(data["kic_dec"]),
        "ident": ident,
        "more": more,
        "star_class": None,
        "field": None,
        "starid": str(data.get("_name", "")),
    }


def kepler_parse_lc(payload: bytes) -> list[list[float]]:
    """Kepler long-cadence FITS → [t, flux, err] rows with any
    NaN-carrying observation dropped (kepler.py:174-205: TIME /
    SAP_FLUX / SAP_FLUX_ERR from HDU 1, then _cleanLc)."""
    from .fits import read_table_fits

    _, tables = read_table_fits(payload)
    if not tables:
        return []
    _, cols = tables[0]
    by_name = {k.upper(): v for k, v in cols.items()}
    t = np.asarray(by_name["TIME"], dtype=float)
    f = np.asarray(by_name["SAP_FLUX"], dtype=float)
    e = np.asarray(by_name["SAP_FLUX_ERR"], dtype=float)
    keep = ~(np.isnan(t) | np.isnan(f) | np.isnan(e))
    return np.column_stack([t[keep], f[keep], e[keep]]).tolist()


# ---------------------------------------------------------------------------
# Catalina / CRTS (catalina.py — JS-blob response)

CATALINA_COO_ROOT = "http://nunuku.caltech.edu/cgi-bin/getcssconedb_release_img.cgi"
CATALINA_ID_ROOT = "http://nesssi.cacr.caltech.edu/cgi-bin/getcssconedb_id.cgi"
CATALINA_COO_BASE = {
    "IMG": "nun", "DB": "photcat", ".submit": "Submit",
    "OUT": "csv", "SHORT": "short", "PLOT": "plot",
}
CATALINA_ID_BASE = {
    ".submit": "Submit", "OUT": "csv", "SHORT": "short", "PLOT": "plot",
}
_CATALINA_RENAME = [("ra", "RA"), ("dec", "Dec"), ("delta", "Rad"), ("id", "ID")]
_CATALINA_QUOTE = ["label", "color", "data"]
_DATASET_RE = re.compile(
    r"var dataSet0 = {(?P<json_data>.*?)}", re.DOTALL
)
_STARID_RE = re.compile(r"ID=(?P<name>.*)&PLOT=plot")


def catalina_normalize_query(query: Mapping[str, Any]) -> tuple[dict, str]:
    """(request params, root url). catalina.py:92-112 + 153-176: user
    keys rename to the CGI's, delta converts arcsec → arcmin, and the
    query routes to the cone or the id endpoint."""
    q = dict(query)
    for src, dst in _CATALINA_RENAME:
        if src in q:
            q[dst] = q.pop(src)
    if "Rad" in q:
        q["Rad"] = q["Rad"] / 60.0
    if "RA" in q and "Dec" in q:
        q.update(CATALINA_COO_BASE)
        return q, CATALINA_COO_ROOT
    if "ID" in q:
        q.update(CATALINA_ID_BASE)
        return q, CATALINA_ID_ROOT
    raise ValueError("Unresolved query type")


def catalina_parse_star(raw_html: str) -> list[dict]:
    """CRTS response: the ``var dataSet0 = {...}`` JS blob carries the
    label and the [t, mag, err] triples; the star id comes from the
    plot link (catalina.py:120-151). The reference ``eval``s the blob
    after quoting bare keys; here a literal-safe ast parse."""
    import ast

    m = _DATASET_RE.search(raw_html)
    if not m:
        return []
    blob = m.group("json_data")
    for key in _CATALINA_QUOTE:
        # quote only the KEY position (identifier followed by ':') — a
        # blind replace corrupted values containing the keyword
        blob = re.sub(rf"\b{key}\b(?=\s*:)", f'"{key}"', blob)
    data = ast.literal_eval("{%s}" % blob)
    sid = _STARID_RE.search(raw_html)
    star_id = sid.group("name") if sid else None
    return [
        {
            "name": data.get("label"),
            "ra_deg": None,
            "dec_deg": None,
            "ident": {"CRST": star_id} if star_id else {},
            "more": {},
            "star_class": None,
            "field": None,
            "starid": star_id,
            "_lc": [list(p) for p in data.get("data", [])],
        }
    ]


# ---------------------------------------------------------------------------
# Spark stages

STARS_SCHEMA = (
    "query_id long, name string, ra_deg double, dec_deg double, "
    "ident map<string,string>, more map<string,double>, "
    "star_class string, field string, starid string, lc_tmp string"
)
OBS_SCHEMA = "star_id string, band string, t double, mag double, err double"


def fetch_stars_scraped(
    spark: SparkSession,
    db: str,
    queries: Sequence[Mapping[str, Any]],
    transport: ScrapeTransport,
) -> DataFrame:
    """Catalog query → unified stars DataFrame. Control-plane: one POST
    per (normalized) user query, a handful of catalog rows each; the
    engine-side cone refine (operators/cone_search.py) runs after, as in
    the reference's getStar flow."""
    rows = []
    if db == "OgleII":
        for qid, q in enumerate(ogle2_normalize_queries(queries)):
            url = f"{OGLE2_ROOT}/query.php?qtype={q.get('db')}&first=1"
            body = transport(url, ogle2_form_params(q))
            stars, tmpdir = ogle2_parse_stars(
                body.decode() if isinstance(body, bytes) else body
            )
            rows += [{**s, "query_id": qid, "lc_tmp": tmpdir} for s in stars]
        origin = "OgleII"
    elif db == "OgleIII":
        for qid, q in enumerate(ogle3_normalize_queries(queries)):
            url = f"{OGLE3_ROOT}query.php?first=1&qtype=catalog"
            body = transport(url, ogle3_form_params(q))
            stars, tmpdir = ogle3_parse_stars(
                body.decode() if isinstance(body, bytes) else body
            )
            rows += [{**s, "query_id": qid, "lc_tmp": tmpdir} for s in stars]
        origin = "OgleIII"
    elif db == "Kepler":
        for qid, q in enumerate(queries):
            body = transport("kplr:stars", kepler_query_params(q))
            star_rows = body if isinstance(body, list) else []
            rows += [
                {**kepler_parse_star(r), "query_id": qid, "lc_tmp": None}
                for r in star_rows
            ]
        origin = "Kepler"
    elif db == "Catalina":
        for qid, q in enumerate(queries):
            params, root = catalina_normalize_query(q)
            body = transport(root, params)
            for s in catalina_parse_star(
                body.decode() if isinstance(body, bytes) else body
            ):
                s.pop("_lc", None)
                rows.append({**s, "query_id": qid, "lc_tmp": None})
        origin = "Catalina"
    else:
        raise ValueError(f"no scrape connector for {db!r}")
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            tuple(
                r.get(f)
                for f in (
                    "query_id name ra_deg dec_deg ident more "
                    "star_class field starid lc_tmp"
                ).split()
            )
            for r in rows
        ],
        STARS_SCHEMA,
    )
    return df.withColumn("origin", F.lit(origin))


def fetch_light_curves_scraped(
    stars: DataFrame,
    db: str,
    transport: ScrapeTransport,
    max_bins: int | float | None = None,
) -> DataFrame:
    """Distributed per-star LC fetch → long observations.

    Data-plane stage: ``mapInPandas`` over star rows so a wide sweep
    fans out across executors. ``max_bins`` applies the reference's
    ingest-side ekvi-PAA downsample (corot.py:110-115) per curve
    *inside the executor*, before rows enter the engine — an oversampled
    curve never hits the shuffle at full length. Band labels follow the
    survey (OGLE serves I-band difference photometry; Kepler SAP flux)."""
    import pandas as pd

    def reduce_lc(lc: list[list[float]]) -> tuple[list, list, list]:
        if not lc:
            return [], [], []
        arr = np.asarray(lc, dtype=float)
        t, mag = arr[:, 0], arr[:, 1]
        err = arr[:, 2] if arr.shape[1] > 2 else np.zeros(len(arr))
        if max_bins and len(t) > max_bins:
            rt, rmag = to_ekvi_paa(t, mag, bins=max_bins)
            _, rerr = to_ekvi_paa(t, err, bins=max_bins)
            return rt.tolist(), rmag.tolist(), rerr.tolist()
        return t.tolist(), mag.tolist(), err.tolist()

    def fetch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"star_id": [], "band": [], "t": [], "mag": [], "err": []}
            for _, row in pdf.iterrows():
                if db == "OgleII":
                    lc = ogle2_fetch_lc(
                        transport, row["field"], row["starid"], row["lc_tmp"]
                    )
                    band = "I"
                elif db == "OgleIII":
                    body = transport(ogle3_lc_url(row["name"]), None)
                    if isinstance(body, bytes):
                        body = body.decode()
                    lc = parse_dat_lc(body)
                    band = "I"
                elif db == "Kepler":
                    body = transport(f"kplr:lc:{row['starid']}", None)
                    lc = kepler_parse_lc(body) if body else []
                    band = "SAP_FLUX"
                elif db == "Catalina":
                    # the CRTS id endpoint serves the LC in the same
                    # JS-blob response as the catalog row
                    params = dict(CATALINA_ID_BASE)
                    params["ID"] = row["starid"]
                    body = transport(CATALINA_ID_ROOT, params)
                    if isinstance(body, bytes):
                        body = body.decode()
                    parsed = catalina_parse_star(body) if body else []
                    lc = parsed[0]["_lc"] if parsed else []
                    band = "V"
                else:
                    raise ValueError(f"no LC endpoint for {db!r}")
                t, mag, err = reduce_lc(lc)
                out["star_id"] += [row["name"]] * len(t)
                out["band"] += [band] * len(t)
                out["t"] += t
                out["mag"] += mag
                out["err"] += err
            yield pd.DataFrame(out)

    cols = ["name", "field", "starid", "lc_tmp"]
    return stars.select(*cols).mapInPandas(fetch, schema=OBS_SCHEMA)
