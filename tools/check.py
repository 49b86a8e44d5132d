#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares row count, schema (column names), and values (columns sorted by
name, exact equality). Dev tool only — not part of the shipped library.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = [os.path.basename(p) for p in sorted(glob.glob(os.path.join(out_dir, "*")))
             if os.path.isdir(p)]
    n_pass = n_fail = n_weak = 0
    for name in names:
        # Verify writes <name>/_ERROR (and no parquet) when a query throws,
        # so a broken query shows up as an explicit FAIL here instead of
        # vanishing from the report (round-7 postmortem)
        err_marker = os.path.join(out_dir, name, "_ERROR")
        if os.path.exists(err_marker):
            msg = open(err_marker).read().strip().splitlines()
            print(f"FAIL  {name}: query threw: {msg[0] if msg else '(no message)'}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL  {name}: unreadable output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"WEAK  {name}: rows={len(got)} (no oracle, rows-only)")
            n_weak += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL  {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            ok = False
        elif len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} != {len(exp)}")
            ok = False
        else:
            g = got[sorted(got.columns)].reset_index(drop=True)
            e = exp[sorted(exp.columns)].reset_index(drop=True)
            for c in g.columns:
                gc, ec = g[c], e[c]
                # the driver's hash tolerates int-width differences but NOT
                # float-vs-int (e.g. DuckDB sum(BIGINT) -> HUGEINT -> float64
                # stringifies "95.0" vs Spark's "95") — treat kind skew as FAIL
                if gc.dtype.kind in "if" and ec.dtype.kind in "if" \
                        and gc.dtype.kind != ec.dtype.kind:
                    print(f"FAIL  {name}: col {c} dtype kind skew: "
                          f"got={gc.dtype} exp={ec.dtype} (driver hash-mismatch)")
                    ok = False
                    break
                try:
                    same = (gc.values == ec.values) | (gc.isna().values & ec.isna().values)
                except Exception:
                    same = gc.astype(str).values == ec.astype(str).values
                if not same.all():
                    i = int((~same).argmax())
                    print(f"FAIL  {name}: col {c} row {i}: got={gc.iloc[i]!r} exp={ec.iloc[i]!r} "
                          f"(dtype got={gc.dtype} exp={ec.dtype})")
                    ok = False
                    break
        if ok:
            print(f"PASS  {name}: {len(got)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_weak} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
