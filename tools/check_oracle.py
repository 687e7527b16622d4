#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json), runs each
oracle SQL in DuckDB against the same sf parquet tables, and compares:
row count, column names/types (approximately), and a value hash computed on
columns sorted by name. Exit code 1 if any query mismatches.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # repr keeps full double precision; -0.0 normalized
        if v == 0.0:
            v = 0.0
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = ["\x01".join(canon(r[i]) for i in order) for r in rows]
    lines.sort()
    import hashlib
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures, passed, rows_only = [], 0, []
    result_dirs = sorted(d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    for rd in result_dirs:
        name = os.path.basename(rd)
        got = con.sql(f"SELECT * FROM '{rd}/*.parquet'")
        grows, gcols = got.fetchall(), got.columns
        if name not in oracles:
            rows_only.append((name, len(grows)))
            continue
        try:
            exp = con.sql(oracles[name])
            erows, ecols = exp.fetchall(), exp.columns
            # Output-type lint (the s18 bug class): an uncast integer
            # sum() surfaces as HUGEINT -> Arrow decimal128, which a
            # driver harness may canonicalize differently from int64
            # even when the values match. Flag it loudly.
            for cn, ct in zip(exp.columns, exp.types):
                if "HUGEINT" in str(ct) or "DECIMAL" in str(ct):
                    failures.append((name,
                        f"oracle output column {cn} has type {ct}: CAST it "
                        "(BIGINT/DOUBLE) so the driver hash sees int64/float64"))
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        if sorted(gcols) != sorted(ecols):
            failures.append((name, f"columns differ: spark={sorted(gcols)} oracle={sorted(ecols)}"))
            continue
        if len(grows) != len(erows):
            failures.append((name, f"row count differ: spark={len(grows)} oracle={len(erows)}"))
            continue
        gh, eh = table_hash(grows, gcols), table_hash(erows, ecols)
        if gh != eh:
            # show first differing canonical line for debugging
            def lines(rows, cols):
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                return sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
            gl, el = lines(grows, gcols), lines(erows, ecols)
            diff = next((i for i, (a, b) in enumerate(zip(gl, el)) if a != b), -1)
            detail = f"hash differ; first diff line {diff}:\n  spark : {gl[diff][:300]}\n  oracle: {el[diff][:300]}" if diff >= 0 else "hash differ (no line diff?)"
            failures.append((name, detail))
            continue
        passed += 1
        print(f"  PASS {name} ({len(grows)} rows)")

    for name, n in rows_only:
        print(f"  ROWS-ONLY {name} ({n} rows)")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    print(f"\n{passed} passed, {len(failures)} failed, {len(rows_only)} rows-only")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
