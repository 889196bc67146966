"""Focused oracle check: verify the named queries() entries against
their DuckDB value oracles at sf0.001 AND sf0.01 (same comparison
semantics as tools/correctness_local.py, atol=0).

Usage: python tools/check_queries.py q1 q2 ...
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def main() -> None:
    names = sys.argv[1:]
    import duckdb
    import numpy as np

    import __spark_entry__ as em
    from pyspark.sql import functions as SF_
    from lightcurvesclassifier_spark.session import get_spark
    from lightcurvesclassifier_spark.sources.testdata import TABLES

    spark = get_spark("check-queries")
    qs = em.queries()
    oracles = em.oracle_sql()
    fail = 0
    for sf in SFS:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
        for name in names:
            sdf = qs[name](spark, sf)
            s = sdf.toPandas()
            o = con.execute(oracles[name]).df()
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
                + f" FROM ({oracles[name]})"
            ).df().iloc[0].to_dict()
            ok = len(s) == len(o) and sorted(s.columns) == sorted(o.columns)
            if ok:
                cols = sorted(s.columns)
                s2 = s[cols].sort_values(by=cols).reset_index(drop=True)
                o2 = o[cols].sort_values(by=cols).reset_index(drop=True)
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
                ok &= all(
                    int(s_nulls[c]) == int(o_nulls[c]) for c in sdf.columns
                )
            status = "OK " if ok else "FAIL"
            if not ok:
                fail += 1
            print(f"{status} {name} @ {os.path.basename(sf)} "
                  f"(spark={len(s)} oracle={len(o)})", flush=True)
        con.close()
    spark.stop()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
