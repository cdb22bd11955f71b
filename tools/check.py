#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only; the
shipped library is pure Scala/Spark).

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
  python3 tools/check.py <sfDir> <outDir>

Compares each <outDir>/<name> parquet against the oracle SQL in
<outDir>/oracle_sql.json run by DuckDB over the sfDir tables; column
order normalized by name, row order by sorting all cells.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return sorted(c for c in cols), out


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
        res = con.execute(
            f"SELECT * FROM '{os.path.join(out_dir, name)}/*.parquet'")
        got_cols = [d[0] for d in res.description]
        got = res.fetchall()
        if name not in oracles:
            status = "ROWS_ONLY" if len(got) > 0 else "ROWS_ONLY_EMPTY!"
            n_rowsonly += 1
            print(f"{status:18s} {name} rows={len(got)}")
            continue
        try:
            ores = con.execute(oracles[name])
            exp_cols = [d[0] for d in ores.description]
            exp = ores.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"{'ORACLE_ERROR':18s} {name}: {e}")
            continue
        gc, gr = canon(got, got_cols)
        ec, er = canon(exp, exp_cols)
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
