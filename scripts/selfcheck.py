#!/usr/bin/env python3
"""Self-check: compare Verify output parquet against DuckDB oracle SQL.

Mimics the driver's correctness gate: for each query in oracle_sql.json,
run the SQL in DuckDB over the sf parquet tables, sort columns by name,
sort rows, and compare against the Spark-written parquet.

Usage: selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(con, rel_sql):
    df = con.execute(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:  # dtype-normalize: int widths / float widths
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("Int64")
        elif str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(con, f"SELECT * FROM read_parquet({files!r})")
            want = canon(con, f"SELECT * FROM ({oracle[name]})")
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        # driver-hash hazard: the driver reads spark parquet and the
        # oracle through different decimal value paths, so ANY decimal
        # gate column hash-mismatches even when values are equal (r11:
        # q207/q214/q232 — the only three decimal-output gates were the
        # only three hash fails). pandas fetchdf would mask it (decimal
        # → float64), so check the parquet schema directly.
        import pyarrow.parquet as pq
        decs = [f"{n}:{t}" for n, t in zip(pq.read_schema(files[0]).names,
                                           pq.read_schema(files[0]).types)
                if "decimal" in str(t)]
        if decs:
            print(f"FAIL {name}: DECIMAL gate column(s) {decs} — cast to "
                  f"double/bigint in gate AND oracle"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        eq = got.equals(want)
        if not eq:
            # locate first differing cell for diagnostics
            diffcols = [c for c in got.columns if not got[c].equals(want[c])]
            print(f"FAIL {name}: value mismatch in {diffcols}")
            for c in diffcols[:2]:
                neq = got[c] != want[c]
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"   {c}[{i}]: spark={got[c][i]!r} oracle={want[c][i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    queries_no_oracle = set(os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)) - set(oracle)
    for name in sorted(queries_no_oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"ROWS-ONLY {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
