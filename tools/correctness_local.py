"""Emit CORRECTNESS_LOCAL.json — the pre-snapshot t2 sweep's results for
EVERY queries() entry, in the external driver's CORRECTNESS_r{N}.json
format — so each round ships machine-readable value-check evidence for
all 122 queries even though the driver's own window covers only the
first 50 (it needs 3 rounds of rotation for full coverage).

Comparison semantics match the driver: row count, column set, and
order-insensitive value equality with columns sorted by name — here at
atol=0 (exact), the repo's stricter discipline. On top of the pandas
value compare (where Spark NULL and NaN both arrive as NaN in float
columns and would mask each other), a per-column engine-side NULL
COUNT is compared between Spark and DuckDB, so a NULL-vs-NaN
divergence that changes either side's null population fails the check
instead of slipping through.

Run from the repo root: python tools/correctness_local.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF = "/root/testdata/sf0.01"


def main() -> None:
    import duckdb
    import numpy as np

    import __spark_entry__ as em
    from lightcurvesclassifier_spark.session import get_spark
    from lightcurvesclassifier_spark.sources.testdata import TABLES

    spark = get_spark("correctness-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    oracles = em.oracle_sql()
    out: dict[str, dict] = {}
    for name, fn in em.queries().items():
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = fn(spark, SF)
            s = sdf.toPandas()
            rec["spark_rows"] = int(len(s))
            sql = oracles.get(name)
            if sql is None:
                rec["err"] = "no_oracle"
                out[name] = rec
                continue
            o = con.execute(sql).df()
            # engine-side NULL counts per column: pandas can't tell a
            # Spark NULL from a NaN in a float column, so this is the
            # only check that catches the NULL-vs-NaN divergence class
            from pyspark.sql import functions as SF_

            s_nulls = sdf.select(
                *[
                    SF_.count(SF_.when(SF_.col(c).isNull(), 1)).alias(c)
                    for c in sdf.columns
                ]
            ).collect()[0].asDict()
            o_nulls = con.execute(
                "SELECT "
                + ", ".join(
                    f'count(*) FILTER (WHERE "{c}" IS NULL) AS "{c}"'
                    for c in sdf.columns
                )
                + f" FROM ({sql})"
            ).df().iloc[0].to_dict()
            null_ok = all(
                int(s_nulls[c]) == int(o_nulls[c]) for c in sdf.columns
            )
            rec["oracle_rows"] = int(len(o))
            rec["rows_match"] = len(s) == len(o)
            rec["schema_match"] = sorted(s.columns) == sorted(o.columns)
            if rec["rows_match"] and rec["schema_match"]:
                cols = sorted(s.columns)
                s2 = s[cols].sort_values(by=cols).reset_index(drop=True)
                o2 = o[cols].sort_values(by=cols).reset_index(drop=True)
                ok = True
                for c in cols:
                    if s2[c].dtype.kind == "f" or o2[c].dtype.kind == "f":
                        ok &= bool(
                            np.allclose(
                                s2[c].astype(float), o2[c].astype(float),
                                rtol=0, atol=0, equal_nan=True,
                            )
                        )
                    else:
                        ok &= bool(
                            (s2[c].to_numpy() == o2[c].to_numpy()).all()
                        )
                rec["hash_match"] = ok and null_ok
                if ok and not null_ok:
                    rec["err"] = "null_count_mismatch"
            else:
                rec["hash_match"] = False
        except Exception as e:  # record, don't abort the sweep
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        out[name] = rec

    path = ROOT / "CORRECTNESS_LOCAL.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    n_green = sum(
        1 for r in out.values()
        if r["rows_match"] and r["schema_match"] and r["hash_match"]
    )
    print(f"wrote {path}: {n_green}/{len(out)} green")
    spark.stop()


if __name__ == "__main__":
    main()
