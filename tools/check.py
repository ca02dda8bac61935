#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
shipped library is pure Scala). Usage:
  python3 tools/check.py <sfDir> <outDir>
after `sbt "runMain graft.Verify <sfDir> <outDir>"`.
Loads each <outDir>/<name> parquet result, runs the matching oracle SQL in
DuckDB against the raw tables, sorts columns by name + rows, and diffs.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: timestamps -> utc-naive, floats stay
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result"); fail += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); fail += 1; continue
        gs = got.sort_values(list(got.columns)).reset_index(drop=True) if len(got) else got
        es = exp.sort_values(list(exp.columns)).reset_index(drop=True) if len(exp) else exp
        if list(gs.columns) != list(es.columns):
            print(f"FAIL {name}: cols got={list(gs.columns)} exp={list(es.columns)}"); fail += 1; continue
        if len(gs) != len(es):
            print(f"FAIL {name}: rows got={len(gs)} exp={len(es)}"); fail += 1; continue
        # Driver gate hashes *rendered* values, so an integer column vs a
        # float column (4 vs 4.0) is a mismatch even when values are equal.
        # Mirror that: numeric kind (int vs float) must agree per column.
        kind_drift = [c for c in gs.columns
                      if {gs[c].dtype.kind, es[c].dtype.kind} == {"i", "f"}
                      or {gs[c].dtype.kind, es[c].dtype.kind} == {"u", "f"}]
        if kind_drift:
            print(f"FAIL {name}: numeric dtype drift (int vs float) in cols "
                  f"{[(c, str(gs[c].dtype), str(es[c].dtype)) for c in kind_drift]}")
            fail += 1; continue
        try:
            pd.testing.assert_frame_equal(gs, es, check_dtype=False, check_exact=True)
            print(f"ok   {name} ({len(gs)} rows)"); ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[-1][:300]}")
            # show first differing cells
            for c in gs.columns:
                neq = ~(gs[c].eq(es[c]) | (gs[c].isna() & es[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"     col={c} row={i} got={gs[c][i]!r} exp={es[c][i]!r}")
            fail += 1
    print(f"== {ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
