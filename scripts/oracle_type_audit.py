#!/usr/bin/env python3
"""Static type audit of every DuckDB oracle against the Spark dump —
the r13 q153/q157 class of bug (DuckDB widening an integer aggregate to
HUGEINT/DOUBLE while Spark emits int64; values identical, driver hash
red). check.py now fails that skew at compare time; this sweep catches
it WITHOUT needing the values to differ, by diffing declared types:
DuckDB `DESCRIBE <oracle>` vs the parquet schema Verify wrote.

Usage: python3 scripts/oracle_type_audit.py <sfDir> <verifyOutDir>
Exit 1 if any oracle's column type class (integer / float / other)
disagrees with Spark's.
"""
import sys, os, glob, json
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
            "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
DUCK_FLOAT = {"FLOAT", "DOUBLE"}
# HUGEINT and DECIMAL are flagged when Spark expects a plain integer:
# pandas renders HUGEINT as float64 and the driver hash sees the skew.


def clazz_duck(t):
    t = t.upper()
    if t in DUCK_INT:
        return "int"
    if t in DUCK_FLOAT or t == "HUGEINT":
        return "float-at-driver" if t == "HUGEINT" else "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    return "other"


def clazz_arrow(t):
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    return "other"


bad = 0
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"SKIP {name}: no spark dump")
        continue
    spark_types = {f.name: clazz_arrow(f.type)
                   for f in pq.read_schema(files[0])}
    try:
        desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle does not describe: {e}")
        bad += 1
        continue
    for cname, ctype, *_ in desc:
        dc = clazz_duck(ctype)
        sc = spark_types.get(cname)
        if sc is None:
            print(f"FAIL {name}.{cname}: oracle column missing from spark dump")
            bad += 1
        elif (sc == "int") != (dc == "int") and "float" in (sc, dc) or \
                dc == "float-at-driver" and sc == "int":
            print(f"FAIL {name}.{cname}: spark={sc} vs duckdb={ctype} — "
                  f"CAST the oracle expression")
            bad += 1
print(f"\n{'ALL OK' if bad == 0 else f'{bad} TYPE SKEWS'} "
      f"({len(oracle)} oracles audited)")
sys.exit(1 if bad else 0)
