#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB oracle results, column-name-sorted, row-sorted,
exact-value equality (what a hash compare sees)."""
import duckdb, json, sys, glob, math

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    if isinstance(v, bytes): return v.hex()
    if isinstance(v, list): return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]

# DuckDB output types the driver's pandas canonicalizer cannot digest:
# HUGEINT/DECIMAL render differently from Spark's BIGINT/DOUBLE, and
# LIST/STRUCT/MAP cells crash pandas sort_values (unhashable ndarray).
# Every oracle must emit only these driver-safe scalar types.
SAFE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
              "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "BLOB",
              "TIMESTAMP WITH TIME ZONE"}

def lint(con, name, sql, spark_files):
    """Returns a list of lint errors for one oracle query: unsafe output
    dtypes, plus name-sorted dtype mismatches vs the Spark parquet output
    (int-width differences are tolerated — pandas renders them alike)."""
    errs = []
    otypes = {r[0]: r[1] for r in con.sql(f"DESCRIBE {sql}").fetchall()}
    for c, t in otypes.items():
        if t not in SAFE_TYPES:
            errs.append(f"oracle column {c} has driver-unsafe type {t}")
    if spark_files:
        stypes = {r[0]: r[1] for r in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet({spark_files!r})").fetchall()}
        ints = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT"}
        flts = {"DOUBLE", "FLOAT"}
        for c in sorted(set(otypes) & set(stypes)):
            a, b = otypes[c], stypes[c]
            if a == b or ({a, b} <= ints) or ({a, b} <= flts): continue
            errs.append(f"column {c} dtype mismatch: oracle={a} spark={b}")
    return errs

def main(sfdir, outdir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        try:
            lerrs = lint(con, name, sql,
                         glob.glob(f"{outdir}/{name}/*.parquet"))
        except Exception as e:
            lerrs = [f"lint failed: {e}"]
        if lerrs:
            for e in lerrs: print(f"LINT     {name}: {e}")
            n_bad += 1; continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output"); n_bad += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
            want = con.sql(sql)
            wrows, wcols = want.fetchall(), [d[0] for d in want.description]
        except Exception as e:
            print(f"ERROR    {name}: {e}"); n_bad += 1; continue
        g, gc = canon(grows, gcols)
        w, wc = canon(wrows, wcols)
        if gc != wc:
            print(f"SCHEMA   {name}: spark={gc} oracle={wc}"); n_bad += 1; continue
        if len(g) != len(w):
            print(f"ROWS     {name}: spark={len(g)} oracle={len(w)}"); n_bad += 1; continue
        if g != w:
            diffs = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"VALUES   {name}: first diffs {diffs}"); n_bad += 1; continue
        print(f"OK       {name} ({len(g)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
