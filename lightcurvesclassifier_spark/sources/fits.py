"""Minimal FITS reader/writer + distributed scan — no astropy needed.

The reference persists stars as FITS (primary header carrying
identifiers/coords/class/properties, one BINTABLE extension per light
curve with Time/Magnitudes/error columns — lcc/db_tier/connectors/
file_manager.py:255-404). This container has no astropy, so this module
implements the required *subset* of the public FITS standard directly
(2880-byte blocks, 80-char header cards, big-endian BINTABLE payloads;
NASA FITS 4.0 spec): enough for a faithful round trip of the layout the
reference writes, swap-in point for astropy on a cluster that has it.

Spark integration: ``spark.read.format("binaryFile")`` over a glob →
``mapInPandas`` parse (whole-file payloads stream through Arrow in
bounded batches) → long observations + a per-star header map. There is
no built-in FITS DataSource; binaryFile + UDF is the idiomatic shape
(SURVEY.md §2.1).
"""

from __future__ import annotations

import io
import os
from typing import Iterator

import numpy as np

BLOCK = 2880
CARD = 80

_TFORM_DTYPE = {"E": ">f4", "D": ">f8", "J": ">i4", "K": ">i8", "I": ">i2"}


# ---------------------------------------------------------------------------
# Card-level encode/decode


def _fmt_value(v) -> str:
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(float(v))
    return str(v)


def _card(key: str, value, comment: str = "") -> bytes:
    if len(key) <= 8 and key.isupper() and all(
        c.isalnum() or c in "-_" for c in key
    ):
        head = f"{key:<8}= "
    else:
        head = f"HIERARCH {key} = "
    body = head + _fmt_value(value)
    if comment:
        body += f" / {comment}"
    if len(body) > CARD:
        # refuse rather than silently truncate — a cut value can drop
        # its closing quote and corrupt the whole header on read-back
        raise ValueError(
            f"FITS card overflows 80 bytes: {key}={value!r} "
            "(CONTINUE cards are not implemented)"
        )
    try:
        return body.ljust(CARD).encode("ascii")
    except UnicodeEncodeError as e:
        raise ValueError(
            f"FITS headers are ASCII-only; {key}={value!r}"
        ) from e


def _tform_field(name: str, form: str):
    """(name, dtype[, shape]) for one TFORM: optional repeat count +
    type letter (e.g. '11J', '20A', 'E'). 'A' repeats are a byte string
    of that length; numeric repeats become subarray fields — both size
    correctly against NAXIS1 (ignoring the repeat misaligned the whole
    stream)."""
    form = form.strip()
    i = 0
    while i < len(form) and form[i].isdigit():
        i += 1
    repeat = int(form[:i]) if i else 1
    letter = form[i : i + 1] or "E"
    if letter == "A":
        return (name, f"S{repeat}")
    base = _TFORM_DTYPE.get(letter)
    if base is None:
        raise ValueError(f"unsupported TFORM {form!r} for column {name}")
    if repeat == 1:
        return (name, base)
    return (name, base, (repeat,))


def _parse_value(raw: str):
    raw = raw.strip()
    if raw.startswith("'"):
        return raw[1:].rsplit("'", 1)[0].replace("''", "'").rstrip()
    if raw in ("T", "F"):
        return raw == "T"
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        return raw


def _parse_header(buf: io.BytesIO) -> dict:
    header: dict = {}
    while True:
        block = buf.read(BLOCK)
        if len(block) < BLOCK:
            raise ValueError("truncated FITS header")
        done = False
        for i in range(0, BLOCK, CARD):
            card = block[i : i + CARD].decode("ascii", errors="replace")
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if key in ("", "COMMENT", "HISTORY"):
                continue
            if key == "HIERARCH":
                k, _, v = card[9:].partition("=")
                header[k.strip()] = _parse_value(v.split(" / ")[0])
                continue
            if card[8:10] != "= ":
                continue
            header[key] = _parse_value(card[10:].split(" / ")[0])
        if done:
            return header


# ---------------------------------------------------------------------------
# Whole-file write/read


def write_star_fits(
    header: dict,
    curves: list[dict],
) -> bytes:
    """Serialize one star. ``header``: scalar cards for the primary HDU
    (identifiers, coords, class, ``more`` properties). ``curves``: each
    ``{"band": str, "time": arr, "mag": arr, "err": arr|None}`` becomes a
    BINTABLE extension with Time/Magnitudes/error float32 columns — the
    reference's layout (file_manager.py:350-404)."""
    out = bytearray()
    cards = [
        _card("SIMPLE", True, "conforms to FITS standard"),
        _card("BITPIX", 8),
        _card("NAXIS", 0),
        _card("EXTEND", True),
    ]
    for k, v in header.items():
        cards.append(_card(k, v))
    cards.append(b"END".ljust(CARD))
    head = b"".join(cards)
    out += head.ljust((len(head) + BLOCK - 1) // BLOCK * BLOCK)

    for curve in curves:
        time = np.asarray(curve["time"], dtype=">f4")
        mag = np.asarray(curve["mag"], dtype=">f4")
        err = curve.get("err")
        cols = [("Time", "days", time), ("Magnitudes", "mag", mag)]
        if err is not None:
            cols.append(("error", "mag", np.asarray(err, dtype=">f4")))
        n = len(time)
        row_bytes = 4 * len(cols)
        cards = [
            _card("XTENSION", "BINTABLE", "binary table extension"),
            _card("BITPIX", 8),
            _card("NAXIS", 2),
            _card("NAXIS1", row_bytes),
            _card("NAXIS2", n),
            _card("PCOUNT", 0),
            _card("GCOUNT", 1),
            _card("TFIELDS", len(cols)),
        ]
        for i, (name, unit, _) in enumerate(cols, start=1):
            cards.append(_card(f"TTYPE{i}", name))
            cards.append(_card(f"TFORM{i}", "E"))
            cards.append(_card(f"TUNIT{i}", unit))
        cards.append(_card("EXTNAME", str(curve.get("band", "lc"))))
        cards.append(b"END".ljust(CARD))
        head = b"".join(cards)
        out += head.ljust((len(head) + BLOCK - 1) // BLOCK * BLOCK)
        data = np.empty(
            n, dtype=[(name, ">f4") for name, _, _ in cols]
        )
        for (name, _, arr) in cols:
            data[name] = arr
        raw = data.tobytes()
        out += raw.ljust((len(raw) + BLOCK - 1) // BLOCK * BLOCK, b"\x00")
    return bytes(out)


def read_star_fits(payload: bytes) -> tuple[dict, list[dict]]:
    """Inverse of :func:`write_star_fits` (also reads the reference's own
    float32 Time/Magnitudes/error layout)."""
    buf = io.BytesIO(payload)
    primary = _parse_header(buf)
    curves = []
    while buf.tell() < len(payload):
        try:
            ext = _parse_header(buf)
        except ValueError:
            break
        if ext.get("XTENSION", "").strip() != "BINTABLE":
            # Skip this HDU's data blocks before reading the next header,
            # else raw data bytes get parsed as header cards. FITS data
            # size = |BITPIX|/8 × GCOUNT × (PCOUNT + ∏NAXISn), rounded up
            # to the 2880-byte block (zero when NAXIS = 0).
            naxis = int(ext.get("NAXIS", 0))
            shape = 1
            for i in range(1, naxis + 1):
                shape *= int(ext.get(f"NAXIS{i}", 0))
            nbytes = (
                abs(int(ext.get("BITPIX", 8))) // 8
                * int(ext.get("GCOUNT", 1))
                * (int(ext.get("PCOUNT", 0)) + (shape if naxis else 0))
            )
            buf.read(nbytes + ((-nbytes) % BLOCK))
            continue
        n = int(ext["NAXIS2"])
        tfields = int(ext["TFIELDS"])
        names = [str(ext.get(f"TTYPE{i}", f"col{i}")) for i in range(1, tfields + 1)]
        forms = [str(ext.get(f"TFORM{i}", "E")).strip() for i in range(1, tfields + 1)]
        dtype = np.dtype(
            [_tform_field(names[i], forms[i]) for i in range(tfields)]
        )
        naxis1 = int(ext.get("NAXIS1", dtype.itemsize))
        if dtype.itemsize != naxis1:
            # a TFORM we mis-sized would misalign the whole stream and
            # parse data bytes as the next header — refuse loudly
            raise ValueError(
                f"BINTABLE row size mismatch: TFORMs {forms} -> "
                f"{dtype.itemsize} bytes but NAXIS1={naxis1}"
            )
        nbytes = dtype.itemsize * n
        raw = buf.read(nbytes)
        buf.read((-nbytes) % BLOCK)  # skip padding
        rec = np.frombuffer(raw, dtype=dtype)
        by_name = {
            nm.lower(): rec[nm].astype(float)
            for nm in names
            if rec[nm].dtype.kind in "fiu" and rec[nm].ndim == 1
        }
        curves.append(
            {
                "band": str(ext.get("EXTNAME", "lc")),
                "time": by_name.get("time"),
                "mag": by_name.get("magnitudes"),
                "err": by_name.get("error"),
            }
        )
    return primary, curves


# ---------------------------------------------------------------------------
# Generic BINTABLE round trip (arbitrary column names — e.g. Kepler's
# TIME / SAP_FLUX / SAP_FLUX_ERR layout, kepler.py:184-193 in the
# reference reads these via astropy; here the same subset codec serves)


def write_table_fits(
    primary: dict, tables: list[tuple[str, dict[str, np.ndarray]]]
) -> bytes:
    """Primary header + one BINTABLE extension per ``(extname, columns)``;
    columns are written float32 big-endian in dict order."""
    out = bytearray()
    cards = [
        _card("SIMPLE", True, "conforms to FITS standard"),
        _card("BITPIX", 8),
        _card("NAXIS", 0),
        _card("EXTEND", True),
    ]
    for k, v in primary.items():
        cards.append(_card(k, v))
    cards.append(b"END".ljust(CARD))
    head = b"".join(cards)
    out += head.ljust((len(head) + BLOCK - 1) // BLOCK * BLOCK)
    for extname, columns in tables:
        names = list(columns)
        arrs = [np.asarray(columns[nm], dtype=">f4") for nm in names]
        n = len(arrs[0]) if arrs else 0
        cards = [
            _card("XTENSION", "BINTABLE", "binary table extension"),
            _card("BITPIX", 8),
            _card("NAXIS", 2),
            _card("NAXIS1", 4 * len(names)),
            _card("NAXIS2", n),
            _card("PCOUNT", 0),
            _card("GCOUNT", 1),
            _card("TFIELDS", len(names)),
        ]
        for i, nm in enumerate(names, start=1):
            cards.append(_card(f"TTYPE{i}", nm))
            cards.append(_card(f"TFORM{i}", "E"))
        cards.append(_card("EXTNAME", extname))
        cards.append(b"END".ljust(CARD))
        head = b"".join(cards)
        out += head.ljust((len(head) + BLOCK - 1) // BLOCK * BLOCK)
        data = np.empty(n, dtype=[(nm, ">f4") for nm in names])
        for nm, arr in zip(names, arrs):
            data[nm] = arr
        raw = data.tobytes()
        out += raw.ljust((len(raw) + BLOCK - 1) // BLOCK * BLOCK, b"\x00")
    return bytes(out)


def read_table_fits(payload: bytes) -> tuple[dict, list[tuple[dict, dict]]]:
    """Inverse of :func:`write_table_fits`: primary header + per-extension
    ``(ext_header, {column_name: float64 array})``; column names keep
    their original case."""
    buf = io.BytesIO(payload)
    primary = _parse_header(buf)
    tables = []
    while buf.tell() < len(payload):
        try:
            ext = _parse_header(buf)
        except ValueError:
            break
        naxis = int(ext.get("NAXIS", 0))
        shape = 1
        for i in range(1, naxis + 1):
            shape *= int(ext.get(f"NAXIS{i}", 0))
        if ext.get("XTENSION", "").strip() != "BINTABLE":
            nbytes = (
                abs(int(ext.get("BITPIX", 8))) // 8
                * int(ext.get("GCOUNT", 1))
                * (int(ext.get("PCOUNT", 0)) + (shape if naxis else 0))
            )
            buf.read(nbytes + ((-nbytes) % BLOCK))
            continue
        n = int(ext["NAXIS2"])
        tfields = int(ext["TFIELDS"])
        names = [str(ext.get(f"TTYPE{i}", f"col{i}")) for i in range(1, tfields + 1)]
        forms = [str(ext.get(f"TFORM{i}", "E")).strip() for i in range(1, tfields + 1)]
        dtype = np.dtype(
            [_tform_field(names[i], forms[i]) for i in range(tfields)]
        )
        naxis1 = int(ext.get("NAXIS1", dtype.itemsize))
        if dtype.itemsize != naxis1:
            raise ValueError(
                f"BINTABLE row size mismatch: TFORMs {forms} -> "
                f"{dtype.itemsize} bytes but NAXIS1={naxis1}"
            )
        raw = buf.read(dtype.itemsize * n)
        buf.read((-dtype.itemsize * n) % BLOCK)
        rec = np.frombuffer(raw, dtype=dtype)
        tables.append(
            (
                ext,
                {
                    nm: rec[nm].astype(float)
                    for nm in names
                    if rec[nm].dtype.kind in "fiu" and rec[nm].ndim == 1
                },
            )
        )
    return primary, tables


# ---------------------------------------------------------------------------
# Spark-level scan / sink


FITS_OBS_SCHEMA = (
    "star_id string, band string, t double, mag double, err double"
)


def load_fits_curves(spark, path_glob: str):
    """Distributed FITS scan: binaryFile source → parse UDF → long obs.

    Column pruning note: binaryFile pushes a path filter but always
    ships `content`; partition count follows
    spark.sql.files.maxPartitionBytes, so many small FITS files batch
    into few tasks instead of one task per file.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                name = os.path.basename(row["path"]).rsplit(".", 1)[0]
                primary, curves = read_star_fits(bytes(row["content"]))
                sid = str(primary.get("IDENT", name))
                for c in curves:
                    time, mag = c["time"], c["mag"]
                    err = c["err"]
                    for i in range(len(time)):
                        rows.append(
                            {
                                "star_id": sid,
                                "band": c["band"],
                                "t": float(time[i]),
                                "mag": float(mag[i]),
                                "err": float(err[i]) if err is not None else None,
                            }
                        )
            yield pd.DataFrame(
                rows, columns=["star_id", "band", "t", "mag", "err"]
            )

    return files.select("path", "content").mapInPandas(
        parse, schema=FITS_OBS_SCHEMA
    )


def save_fits_curves(curves_df, path: str) -> None:
    """Write one ``<star_id>.fits`` per star from the array-typed curves
    view — executor-side via foreachPartition (the FITS sink,
    file_manager.py:350-404 / utils/stars.py:15-50)."""
    os.makedirs(path, exist_ok=True)

    def write_partition(rows) -> None:
        for r in rows:
            d = r.asDict()
            payload = write_star_fits(
                {"IDENT": str(d["star_id"])},
                [
                    {
                        "band": str(d.get("band", "lc")),
                        "time": d["time"],
                        "mag": d["mag"],
                        "err": d.get("err"),
                    }
                ],
            )
            # include the band in the name when present — a per-band
            # curves view has several rows per star, and keying on
            # star_id alone made the last writer win (and risked two
            # tasks writing the same path concurrently)
            band = d.get("band")
            fname = (
                f"{d['star_id']}_{band}.fits" if band else f"{d['star_id']}.fits"
            )
            with open(os.path.join(path, fname), "wb") as f:
                f.write(payload)

    curves_df.foreachPartition(write_partition)
