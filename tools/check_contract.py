"""Local twin of the driver's correctness gate: run every
__spark_entry__.queries()[k] on Spark and oracle_sql()[k] on DuckDB at
sf0.01, compare row count + column names + order-insensitive values.

Usage: python tools/check_contract.py [key ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from crawlfront.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def canon(df) -> tuple[int, list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(r[c]) for c in cols) for _, r in df[cols].iterrows()]
    return len(rows), cols, sorted(rows, key=repr)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = 0
    for k, fn in qs.items():
        if only and k not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {k}: spark error: {e}")
            bad += 1
            continue
        if k not in osql:
            print(f"ROWS-ONLY {k}: {len(sdf)} rows, cols={sorted(sdf.columns)}")
            continue
        try:
            ddf = con.execute(osql[k]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {k}: duckdb error: {e}")
            bad += 1
            continue
        sn, sc, sv = canon(sdf)
        dn, dc, dv = canon(ddf)
        if sc != dc:
            print(f"FAIL {k}: columns differ spark={sc} duck={dc}")
            bad += 1
        elif sn != dn:
            print(f"FAIL {k}: rowcount spark={sn} duck={dn}")
            bad += 1
        elif sv != dv:
            diff = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
            print(f"FAIL {k}: values differ; first diffs (spark vs duck): {diff}")
            bad += 1
        else:
            print(f"OK   {k}: {sn} rows")
    spark.stop()
    print("ALL OK" if bad == 0 else f"{bad} FAILURES")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
