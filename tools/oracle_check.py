#!/usr/bin/env python3
"""Local differential check: Spark (graft.Verify output) vs DuckDB oracle.

Dev tool only (mirrors the driver's t2 gate; not part of the library).
Usage:
    python3 tools/oracle_check.py <sfDir> <verifyOut> [skip1,skip2] [report.json]
Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.

Arg 3 (optional): comma-separated query names to SKIP (recorded, not
counted) — the 10x sweep excludes the recursive transitive-closure
oracles, superquadratic in DuckDB at that scale. Arg 4 (optional):
path for a JSON report of per-query verdicts (the committed sweep
evidence).
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_of(rel):
    cols = rel.columns
    types = [str(t) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    rows = [tuple(norm(r[i]) for i in order) for r in data]
    return sorted(cols), [types[i] for i in order], sorted(rows, key=lambda t: tuple(
        (x is None, str(type(x)), str(x)) for x in t))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    skips = set()
    if len(sys.argv) > 3 and sys.argv[3]:
        skips = {s for s in sys.argv[3].split(",") if s}
    report_path = sys.argv[4] if len(sys.argv) > 4 else None
    report = {}
    # In-memory DuckDB has NO spill target by default: at sweep
    # multipliers a list-rollup oracle (q_span_dedup's kept_text
    # reconstruction) peaked at ~122 GB RSS and nearly OOM'd the box.
    # A temp_directory + memory_limit lets those operators offload.
    con = duckdb.connect(config={
        "memory_limit": os.environ.get("ORACLE_MEM", "48GB"),
        "temp_directory": "/tmp/duckdb_oracle_spill"})
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (the scaled sweep dirs)
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):  # driver-written single file
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if name in skips:
            print(f"SKIP {name} (excluded by caller)")
            report[name] = "skip"; n_skip += 1; continue
        spath = f"{out_dir}/{name}"
        if not os.path.isdir(spath):
            print(f"FAIL {name}: no spark output")
            report[name] = "fail:no-output"; n_fail += 1; continue
        try:
            scols, stypes, srows = rows_of(con.sql(f"SELECT * FROM '{spath}/*.parquet'"))
            ocols, otypes, orows = rows_of(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            report[name] = f"fail:exec"; n_fail += 1; continue
        if scols != ocols:
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}")
            report[name] = "fail:cols"; n_fail += 1
            continue
        # Round-1 lesson: the driver gate hashes typed values, so a DuckDB
        # HUGEINT vs Spark BIGINT mismatch fails even when values agree.
        if stypes != otypes:
            print(f"FAIL {name}: types spark={stypes} oracle={otypes}")
            report[name] = "fail:types"; n_fail += 1; continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            report[name] = "fail:rowcount"; n_fail += 1; continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first @{i}:")
            print(f"  spark : {a}\n  oracle: {b}")
            report[name] = "fail:values"; n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            report[name] = f"pass:{len(srows)}"; n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail / {n_skip} skip ==")
    if report_path:
        with open(report_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "out_dir": out_dir,
                       "pass": n_pass, "fail": n_fail, "skip": n_skip,
                       "queries": report}, f, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
