#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify (already done
via sbt, producing outDir/<name>.parquet + oracle_sql.json), then execute each
oracle SQL in DuckDB over the sf tables and compare rows/schema/values.

Usage: python3 tools/localverify.py <sfDir> <outDir> [queryFilter...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize away engine-specific dtypes: everything through repr strings
    def cell(v):
        if isinstance(v, float):
            # repr() keeps the trailing ".0" so an int64-vs-float64 dtype
            # drift FAILS here exactly like the driver's hash (round-3
            # lesson: format(v, ".10g") hid 11 such rows)
            return repr(v)
        if isinstance(v, (list, tuple)):
            return str(list(v))
        s = str(v)
        if s.endswith(" 00:00:00"):  # date vs midnight-timestamp rendering
            s = s[:-9]
        return s
    return df.apply(lambda c: c.map(cell))

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    filters = sys.argv[3:]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noorc = 0
    for name in names:
        if filters and not any(f in name for f in filters):
            continue
        # sorted: part-00000, part-00001, ... must concatenate in the
        # engine's global sort order for row-order-sensitive compares
        files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
        spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracles:
            print(f"  {name}: NO_ORACLE (spark_rows={len(spark_df)})")
            n_noorc += 1
            continue
        try:
            ora_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  {name}: ORACLE_SQL_ERROR {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(ora_df)
        rows_ok = len(a) == len(b)
        schema_ok = list(a.columns) == list(b.columns)
        vals_ok = rows_ok and schema_ok and a.reset_index(drop=True).equals(
            b.reset_index(drop=True))
        if rows_ok and schema_ok and vals_ok:
            print(f"  {name}: PASS ({len(a)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  {name}: FAIL rows {len(a)} vs {len(b)}, "
                  f"schema_ok={schema_ok} spark_cols={list(a.columns)} "
                  f"ora_cols={list(b.columns)}")
            if rows_ok and schema_ok:
                neq = (a.reset_index(drop=True) != b.reset_index(drop=True))
                bad = neq.any(axis=1)
                print("   first diffs (spark vs oracle):")
                print(a.reset_index(drop=True)[bad].head(3))
                print(b.reset_index(drop=True)[bad].head(3))
    print(f"pass={n_pass} fail={n_fail} no_oracle={n_noorc}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
