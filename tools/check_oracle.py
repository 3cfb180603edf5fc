#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over views
named after the TESTDATA tables, and compares: column names (sorted), row
counts, and values (rows sorted, NaN-safe, float-exact). Exit 1 on any
mismatch; prints a per-query PASS/FAIL table with first-diff details.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_of(rel):
    cols = [c.lower() for c in rel.columns]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # The driver's hash is type-sensitive (HUGEINT != BIGINT even when the
    # values are integer-equal), so carry the DuckDB type of each column in
    # column-sorted order and compare it alongside names and values.
    types = [str(rel.types[i]) for i in order]
    data = rel.fetchall()
    rows = [tuple(norm(r[i]) for i in order) for r in data]
    return sorted(cols), types, sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written dir (ScaleUp/Reseed output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):  # driver's single-file layout
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results, failed = [], []
    qdirs = sorted(d for d in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(d))
    for qd in qdirs:
        name = os.path.basename(qd)
        files = glob.glob(os.path.join(qd, "*.parquet"))
        if not files:
            results.append((name, "EMPTY-OUT", "no parquet written"))
            failed.append(name)
            continue
        got_cols, got_types, got_rows = rows_of(con.sql(
            f"SELECT * FROM read_parquet({files!r})"))
        if name not in oracle:
            results.append((name, "ROWS-ONLY", f"{len(got_rows)} rows"))
            continue
        try:
            exp_cols, exp_types, exp_rows = rows_of(con.sql(oracle[name]))
        except Exception as e:
            results.append((name, "ORACLE-ERR", str(e).splitlines()[0][:100]))
            failed.append(name)
            continue
        if got_cols != exp_cols:
            results.append((name, "FAIL-COLS", f"spark={got_cols} duckdb={exp_cols}"))
            failed.append(name)
        elif got_types != exp_types:
            results.append((name, "FAIL-TYPES",
                            f"spark={list(zip(got_cols, got_types))} "
                            f"duckdb={list(zip(exp_cols, exp_types))}"))
            failed.append(name)
        elif len(got_rows) != len(exp_rows):
            results.append((name, "FAIL-COUNT", f"spark={len(got_rows)} duckdb={len(exp_rows)}"))
            failed.append(name)
        else:
            diff = next((i for i, (g, e) in enumerate(zip(got_rows, exp_rows)) if g != e), None)
            if diff is None:
                results.append((name, "PASS", f"{len(got_rows)} rows"))
            else:
                results.append((name, "FAIL-VALS",
                                f"row {diff}: spark={got_rows[diff]} duckdb={exp_rows[diff]}"))
                failed.append(name)
    w = max(len(n) for n, _, _ in results) if results else 10
    for n, st, detail in results:
        print(f"{n:<{w}}  {st:<10}  {detail}")
    print(f"\n{len(results) - len(failed)}/{len(results)} ok; "
          f"{sum(1 for _, s, _ in results if s == 'PASS')} oracle-matched")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
