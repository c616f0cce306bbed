#!/usr/bin/env python3
"""Local differ: replays the driver's DuckDB-oracle comparison so mismatches
are caught before the round gate. Mirrors FIXTURES.md §4 canonicalization:
columns sorted by name, floats rounded to 6 (no trailing zeros, -0.0 -> 0.0),
timestamps rendered to seconds in UTC, NULL literal, row order preserved.

Usage: python3 tools/oracle_diff.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        if r == 0.0:
            r = 0.0  # normalize -0.0
        s = f"{r:.6f}".rstrip("0").rstrip(".")
        return s if s not in ("-0", "") else "0"
    if hasattr(v, "strftime"):  # datetime/date
        try:
            return v.strftime("%Y-%m-%d %H:%M:%S")
        except Exception:
            return str(v)
    return str(v)


def canon_rows(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    return [tuple(canon_value(r[i]) for i in order) for r in rows]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISSING   {name}: no engine output")
            n_fail += 1
            continue
        engine_tbl = pq.read_table(files[0])
        e_names = engine_tbl.column_names
        e_rows = [tuple(r[c] for c in e_names) for r in engine_tbl.to_pylist()]
        try:
            cur = con.execute(sql)
            o_names = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as ex:
            print(f"ORA-ERR   {name}: {ex}")
            n_fail += 1
            continue
        ce, co = canon_rows(e_names, e_rows), canon_rows(o_names, o_rows)
        if sorted(e_names) != sorted(o_names):
            print(f"SCHEMA    {name}: engine={sorted(e_names)} oracle={sorted(o_names)}")
            n_fail += 1
        elif ce == co:
            print(f"OK        {name} ({len(ce)} rows)")
            n_pass += 1
        else:
            print(f"MISMATCH  {name}: engine {len(ce)} rows vs oracle {len(co)} rows")
            for i, (a, b) in enumerate(zip(ce, co)):
                if a != b:
                    print(f"   first diff row {i}:\n    engine: {a}\n    oracle: {b}")
                    break
            if len(ce) != len(co):
                only = ce[len(co):] if len(ce) > len(co) else co[len(ce):]
                print(f"   extra rows ({'engine' if len(ce)>len(co) else 'oracle'}): {only[:3]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
