#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only; the
shipped library is pure Scala/Spark).

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
  python3 tools/check.py <sfDir> <outDir>

Compares each <outDir>/<name> parquet against the oracle SQL in
<outDir>/oracle_sql.json run by DuckDB over the sfDir tables.

IMPORTANT: canonicalization goes through pandas dtypes, exactly like the
driver's comparator, NOT through Python repr of raw fetchall() values.
Round 1 lesson: DuckDB SUM(integer) returns HUGEINT which pandas
renders float64 (15.0 != Spark's int64 15), and raw array cells crash
pandas sort_values — a repr()-based local gate passes both cases that
the driver fails.
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # numpy scalar -> python scalar so int64 renders "15", float64 "15.0"
    if hasattr(v, "item"):
        try:
            v = v.item()
        except Exception:
            pass
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def canon(df):
    """Mimic the driver: sort columns by name, sort_values over all
    columns (raises TypeError on unhashable cells like arrays — that is
    the point), then render each cell via its pandas dtype."""
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols)  # raises on ndarray cells, like driver
    rows = [tuple(norm_cell(v) for v in rec) for rec in df.itertuples(index=False)]
    rows.sort()
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = n_rowsonly = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        got_df = con.execute(
            f"SELECT * FROM '{os.path.join(out_dir, name)}/*.parquet'").df()
        if name not in oracles:
            status = "ROWS_ONLY" if len(got_df) > 0 else "ROWS_ONLY_EMPTY!"
            n_rowsonly += 1
            print(f"{status:18s} {name} rows={len(got_df)}")
            continue
        try:
            exp_df = con.execute(oracles[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"{'ORACLE_ERROR':18s} {name}: {e}")
            continue
        try:
            gc, gr = canon(got_df)
            ec, er = canon(exp_df)
        except Exception as e:
            n_fail += 1
            print(f"{'CANON_ERROR':18s} {name}: {type(e).__name__}: {e}")
            continue
        if gc != ec:
            n_fail += 1
            print(f"{'SCHEMA_MISMATCH':18s} {name}: spark={gc} duckdb={ec}")
        elif gr != er:
            n_fail += 1
            print(f"{'HASH_MISMATCH':18s} {name}: rows spark={len(gr)} "
                  f"duckdb={len(er)}")
            only_g = [r for r in gr if r not in set(er)][:3]
            only_e = [r for r in er if r not in set(gr)][:3]
            for r in only_g:
                print(f"    spark-only:  {r}")
            for r in only_e:
                print(f"    duckdb-only: {r}")
        else:
            n_pass += 1
            print(f"{'PASS':18s} {name} rows={len(gr)}")
    print(f"\n{n_pass} pass / {n_fail} fail / {n_rowsonly} rows-only "
          f"of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
