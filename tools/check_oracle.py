#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate:
runs each oracle_sql.json query against the sfDir parquet tables and
compares (schema-insensitively by sorted column name, value-hash) with the
engine's parquet output under the verify outDir."""
import sys, json, glob
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"[ORACLE-ERR] {name}: {e}")
        fail += 1
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"[NO-OUTPUT] {name}")
        fail += 1
        continue
    got = pq.read_table(files[0])
    exp_cols = sorted(exp.column_names)
    got_cols = sorted(got.column_names)
    if exp_cols != got_cols:
        print(f"[SCHEMA] {name}: oracle={exp_cols} engine={got_cols}")
        fail += 1
        continue
    exp_d = exp.to_pydict(); got_d = got.to_pydict()
    schema_mismatch = []
    for c in exp_cols:
        et = str(exp.schema.field(c).type); gt = str(got.schema.field(c).type)
        if et != gt:
            schema_mismatch.append(f"{c}: oracle {et} vs engine {gt}")
    # row-set compare, sorted rows of sorted columns
    exp_rows = sorted(zip(*[[str(v) for v in exp_d[c]] for c in exp_cols])) if exp.num_rows else []
    got_rows = sorted(zip(*[[str(v) for v in got_d[c]] for c in got_cols])) if got.num_rows else []
    if exp_rows != got_rows:
        print(f"[VALUES] {name}: oracle {len(exp_rows)} rows, engine {len(got_rows)} rows")
        for i, (a, b) in enumerate(zip(exp_rows, got_rows)):
            if a != b:
                print(f"  first diff at row {i}: oracle={a} engine={b}")
                break
        if len(exp_rows) != len(got_rows):
            onlye = set(exp_rows) - set(got_rows)
            onlyg = set(got_rows) - set(exp_rows)
            if onlye: print(f"  only-in-oracle sample: {list(onlye)[:3]}")
            if onlyg: print(f"  only-in-engine sample: {list(onlyg)[:3]}")
        fail += 1
    elif schema_mismatch:
        print(f"[TYPE] {name}: {schema_mismatch} (values match)")
        fail += 1
    else:
        print(f"[OK] {name} ({exp.num_rows} rows)")
        ok += 1
rows_only = len([q for q in glob.glob(out_dir+'/*') if not q.endswith('.json')]) - len(oracle)
print(f"\n{ok} ok, {fail} failed, {rows_only} rows-only")
# machine-citable artifact line: BASELINE.md quotes THIS, not a hand-bumped
# count (the r4 prose drifted twice when gates were added)
print(f"GATES: {ok}/{ok+fail} hash-verified, {rows_only} rows-only")
