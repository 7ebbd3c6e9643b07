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

def operator_scan(repo="."):
    """Fail on any PUBLIC operator in src/main that is neither wired
    into SparkEntry (gate) nor referenced by any test source.

    This is the structural fix for the closing-wave slip (rounds 9, 12,
    13 all shipped an operator with no gate/spec in the final commit):
    a public `def` that nothing gates and nothing tests is unverified
    by this repo's own bar and fails the round here.
    """
    import re
    main_glob = glob.glob(f"{repo}/src/main/scala/graft/**/*.scala",
                          recursive=True)
    harness = {"SparkEntry.scala", "Verify.scala", "Bench.scala"}
    # names that are structural, not operators
    ignore = {"main", "apply", "unapply", "toString", "equals",
              "hashCode"}
    defs = {}  # name -> file:line of first public def
    for path in sorted(main_glob):
        base = os.path.basename(path)
        if base in harness or "/tmp/" in path.replace("\\", "/"):
            continue
        for i, line in enumerate(open(path), 1):
            # member-level (2-space) public defs only: deeper indents
            # are local helpers, `override` implements a Spark
            # interface (not a graft operator), private/protected are
            # internal by construction
            m = re.match(r"  def\s+([a-zA-Z]\w*)", line)
            if not m:
                continue
            name = m.group(1)
            if name in ignore or name in defs:
                continue
            defs[name] = f"{path}:{i}"
    refs = ""
    for path in glob.glob(f"{repo}/src/test/scala/**/*.scala",
                          recursive=True):
        refs += open(path).read()
    for base in harness:
        p = f"{repo}/src/main/scala/graft/{base}"
        if os.path.exists(p):
            refs += open(p).read()
    missing = {n: w for n, w in sorted(defs.items())
               if not re.search(rf"\b{re.escape(n)}\b", refs)}
    for n, w in missing.items():
        print(f"UNGATED OPERATOR {n} ({w}): no SparkEntry wiring and "
              f"no test reference — gate it or cut it")
    if not missing:
        print(f"operator scan: {len(defs)} public defs, all referenced "
              f"by gates or tests")
    return 1 if missing else 0

if __name__ == "__main__":
    if sys.argv[1] == "--operators":
        sys.exit(operator_scan())
    rc = operator_scan(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) or ".")
    sys.exit(main(sys.argv[1], sys.argv[2]) or rc)
