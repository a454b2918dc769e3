#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load Verify's parquet
dumps, run each oracle SQL in DuckDB over the same sf tables, compare
(column-name-sorted, row-sorted, floats rounded). Usage:
  python3 scripts/check.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(df):
    import datetime
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            nn = df[c].dropna()
            if len(nn) and isinstance(nn.iloc[0],
                                      (datetime.date, datetime.datetime)):
                df[c] = pd.to_datetime(df[c])
        if str(df[c].dtype).startswith('datetime64'):
            df[c] = df[c].astype('datetime64[us]')
        if df[c].dtype.kind == 'f':
            df[c] = df[c].round(4)
        # normalize ints to int64 for cross-engine compare
        if df[c].dtype.kind in 'iub':
            df[c] = df[c].astype('int64')
    return df.sort_values(by=list(df.columns),
                          na_position='last').reset_index(drop=True)

fails = 0
results = {}
def rec(name, rows_match, schema_match, hash_match, spark_rows, oracle_rows, err):
    results[name] = {"rows_match": rows_match, "schema_match": schema_match,
                     "hash_match": hash_match, "spark_rows": spark_rows,
                     "oracle_rows": oracle_rows, "err": err}
names = sorted(d for d in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, d)))
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no parquet output"); fails += 1
        rec(name, False, False, False, 0, None, "no parquet output"); continue
    got = pd.concat([pd.read_parquet(f) for f in files])
    if name not in oracle:
        status = "rows-only" if len(got) > 0 else "FAIL rows=0"
        if "FAIL" in status: fails += 1
        print(f"{status:9s} {name} rows={len(got)}")
        rec(name, len(got) > 0, None, None, len(got), None,
            None if len(got) > 0 else "rows=0")
        continue
    try:
        want = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1
        rec(name, False, False, False, len(got), None, f"oracle error {e}"[:300]); continue
    g, w = norm(got.copy()), norm(want.copy())
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
        fails += 1
        rec(name, len(g) == len(w), False, False, len(g), len(w),
            f"columns {list(g.columns)} vs {list(w.columns)}"[:300]); continue
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); fails += 1
        rec(name, False, True, False, len(g), len(w), "row count mismatch"); continue
    try:
        # dtype-skew guard (driver-hash parity): the driver hashes raw
        # values, so int64 150000 vs float64 150000.0 mismatches even when
        # every value is numerically identical. DuckDB silently widens
        # sum(BIGINT) to HUGEINT (float64 in pandas); without this guard
        # the tolerant float branch below masks exactly that class of bug
        # (bit r13: q153/q157 red at the driver, green locally). An
        # integer column on one side with a float column on the other is
        # a FAIL here, never a tolerant compare.
        for c in g.columns:
            gk, wk = g[c].dtype.kind, w[c].dtype.kind
            if (gk in 'iu') != (wk in 'iu') and 'f' in (gk, wk):
                raise AssertionError(
                    f"dtype skew on '{c}': spark={got[c].dtype} vs "
                    f"oracle={want[c].dtype} — integer-vs-float would pass "
                    f"here but fail the driver hash; CAST the oracle "
                    f"(DuckDB sum(BIGINT) is HUGEINT)")
        # floats: tolerant compare; everything else (incl. big ints, where
        # rtol would mask µs/ns truncation bugs): exact
        for c in g.columns:
            if g[c].dtype.kind == 'f' or w[c].dtype.kind == 'f':
                pd.testing.assert_series_equal(
                    g[c].astype('float64'), w[c].astype('float64'),
                    check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6)
            else:
                pd.testing.assert_series_equal(g[c], w[c], check_dtype=False,
                                               check_exact=True)
        print(f"OK        {name} rows={len(g)}")
        rec(name, True, True, True, len(g), len(w), None)
    except AssertionError as e:
        print(f"FAIL {name}: {str(e)[:300]}"); fails += 1
        rec(name, True, True, False, len(g), len(w), str(e)[:300])
print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'} "
      f"({len(names)} queries, {len(oracle)} oracled)")
if len(sys.argv) > 3:
    json.dump(results, open(sys.argv[3], 'w'), indent=2)
    print(f"wrote {sys.argv[3]}")
sys.exit(1 if fails else 0)
