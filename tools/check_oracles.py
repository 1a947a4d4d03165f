#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate:
reads Verify output parquet per query, runs the oracle SQL in DuckDB over
the same sf tables, sorts columns by name + rows by value, and compares.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir> [query...]
"""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
# A requested name with NO oracle entry must fail loudly: iterating only
# the oracle keys silently skipped it and printed ALL GREEN having
# compared nothing (the round-9 "vacuous subset green" trap, regrown).
for name in sorted(only - set(oracle)):
    print(f"FAIL {name}: no oracle SQL registered for this query")
    fail += 1
for name in sorted(oracle):
    if only and name not in only:
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}"); fail += 1; continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); fail += 1; continue
    # The DRIVER's gate sorts with pandas sort_values, which throws on
    # array/struct cells (unhashable ndarray in factorize). astype(str)
    # below would mask exactly that (the round-12 q127 dev-green /
    # driver-red gap), so fail loudly on any non-scalar cell first.
    def nonscalar_cols(df):
        import numpy as np
        bad = []
        for c in df.columns:
            col = df[c]
            # scan EVERY value, not just row 0: a column whose first row
            # is None/scalar but whose later rows hold lists would slip
            # a first-row-only check and hit the same driver failure
            # (result frames are small, the full scan is cheap)
            if col.dtype == object and len(col) > 0 and col.map(
                    lambda v: isinstance(v, (list, dict, tuple, np.ndarray))
                ).any():
                bad.append(c)
        return bad
    ns = nonscalar_cols(spark_df) + nonscalar_cols(duck_df)
    if ns:
        print(f"FAIL {name}: non-scalar columns {sorted(set(ns))} — the "
              f"driver's pandas sort cannot factorize these; emit JSON "
              f"strings (to_json) in the public projection")
        fail += 1; continue
    sv = sorted(map(tuple, s.astype(str).values.tolist()))
    dv = sorted(map(tuple, d.astype(str).values.tolist()))
    if sv != dv:
        diffs = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
        print(f"FAIL {name}: value mismatch, e.g. {diffs}"); fail += 1; continue
    # dtype check (loose): report but don't fail on int64 vs int32 etc.
    dt = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
          if str(s[c].dtype) != str(d[c].dtype)]
    note = f"  [dtype diff: {dt}]" if dt else ""
    print(f"OK   {name} ({len(s)} rows){note}")
print(f"{'ALL GREEN' if fail == 0 else str(fail) + ' FAILURES'}")
sys.exit(1 if fail else 0)
