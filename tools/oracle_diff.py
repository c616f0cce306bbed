#!/usr/bin/env python3
"""Local differ: replays the driver's DuckDB-oracle comparison so mismatches
are caught before the round gate.

STRICTNESS (tightened after round 1, where the loose renderer hid a driver
failure): the oracle is fetched through Arrow (`.arrow()`), NOT `fetchall()`
— DuckDB's Python fetch path collapses HUGEINT to Python int, which is
exactly how `SUM(int)` typed decimal128 in the driver while looking like a
plain int here. Values are rendered at full precision with explicit typing:

- Decimal is tagged distinctly from int ("decimal:3" vs "3") — a DuckDB
  HUGEINT/DECIMAL aggregate never silently matches a Spark BIGINT.
- Timestamps render str(value) at native precision (pandas Timestamp keeps
  nanoseconds), tz-normalized to naive UTC — a TIMESTAMP(NANOS) column read
  at ns by DuckDB no longer matches Spark's µs truncation by accident.
- Floats keep the FIXTURES §4 contract: round 6, no trailing zeros, -0→0.
- Lists/structs/binary canonicalize recursively instead of str(repr).

Usage: python3 tools/oracle_diff.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, os, datetime
from decimal import Decimal
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

_UTC = datetime.timezone.utc


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        return "decimal:" + str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        if r == 0.0:
            r = 0.0  # normalize -0.0
        s = f"{r:.6f}".rstrip("0").rstrip(".")
        return s if s not in ("-0", "") else "0"
    if isinstance(v, datetime.datetime):  # incl. pandas Timestamp (ns kept)
        if v.tzinfo is not None:
            v = v.astimezone(_UTC).replace(tzinfo=None)
        return str(v)
    if isinstance(v, datetime.date):
        # Promote to midnight-timestamp form: the driver passes entries where
        # the engine emits TIMESTAMP and the oracle DATE for the same value
        # (Spark DATE_TRUNC returns timestamp, DuckDB returns date — s21b).
        return v.isoformat() + " 00:00:00"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon_value(x)}"
                              for k, x in sorted(v.items())) + "}"
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
            o_tbl = con.execute(sql).arrow()  # Arrow path: sees HUGEINT/ns
            o_names = o_tbl.column_names
            o_rows = [tuple(r[c] for c in o_names) for r in o_tbl.to_pylist()]
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
