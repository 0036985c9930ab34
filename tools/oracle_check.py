"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry at a given sf against its oracle_sql()
via DuckDB; compare row count, schema width, and order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                hasattr(v, "__len__") and not isinstance(v, (str, bytes))
                else v)
    key = df.apply(lambda r: repr(tuple(r)), axis=1)
    return df.iloc[key.argsort().to_numpy()].reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from tbl_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            continue
        odf = con.execute(oracles[name]).df()
        a, b = normalize(sdf), normalize(odf)
        status = []
        if len(a) != len(b):
            status.append(f"rowcount {len(a)} != {len(b)}")
        elif list(a.columns) != list(b.columns):
            status.append(f"columns {list(a.columns)} != {list(b.columns)}")
        else:
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=True)
            except AssertionError as e:
                status.append("values: " + str(e).splitlines()[-1][:160])
        if status:
            print(f"FAIL  {name}: {'; '.join(status)}")
            failures += 1
        else:
            print(f"OK    {name}: {len(a)} rows match")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
