#!/usr/bin/env python3
"""Local differential check: Spark (graft.Verify output) vs DuckDB oracle.

Dev tool only (mirrors the driver's t2 gate; not part of the library).
Usage:
    python3 tools/oracle_check.py <sfDir> <verifyOut> [skip1,skip2] [report.json]
Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.

Arg 3 (optional): comma-separated query names to SKIP (recorded, not
counted). Arg 4 (optional): path for a JSON report of per-query
verdicts (the committed sweep evidence).

The transitive-closure family (q_dedup_groups and consumers) no longer
needs skipping at sweep multipliers: the recursive `reach` CTE is
rewritten to an independent Python union-find over the exported
candidate edges (see rewrite_closure) — linear in |E|, value-exact.
"""
import sys, os, json, math, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The transitive-closure family (q_dedup_groups and its consumers)
# registers a recursive `reach` CTE oracle, whose closure materializes
# O(n·m) pairs — fine at sf0.01, superquadratic at sweep multipliers
# (the round-9 sweep had to skip all four). The harness therefore
# rewrites that CTE block to read a `groups` table computed HERE by an
# independent union-find over the exported candidate edges: DuckDB still
# evaluates the whole MinHash/banding candidate chain (the part worth
# diffing), and the closure itself is O(|E| α(n)) in Python instead of
# O(n·m) in SQL. The union-find is a genuinely independent second
# implementation of the fixpoint (path-halving + min-root union, vs
# Spark's pointer-doubling label propagation).
REACH_BLOCK = re.compile(
    r"reach\(src, dst\) AS \(.*?GROUP BY n\.doc\)", re.DOTALL)
REACH_SENTINEL = "reach(src, dst) AS ("


def uf_groups(con, sql, cache):
    """min-label connected components of the oracle's `edges` CTE.

    Returns the name of a temp table (doc_id, dup_group) with one row
    per node that appears in at least one near-dup edge — the exact
    contract of the `groups` CTE it replaces. Memoized on the edge-CTE
    prefix: all four family members share it, so the expensive MinHash
    chain runs once per harness invocation, not four times.
    """
    prefix = sql[:sql.index(REACH_SENTINEL)].rstrip().rstrip(",")
    if prefix in cache:
        return cache[prefix]
    edges = con.sql(prefix + " SELECT src, dst FROM edges WHERE src < dst")
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            parent[r] = parent[parent[r]]  # path halving
            r = parent[r]
        return r

    while True:
        batch = edges.fetchmany(1_000_000)
        if not batch:
            break
        for a, b in batch:
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:  # min id becomes the root == the group label
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
    name = f"uf_groups_{len(cache)}"
    con.execute(f"CREATE TEMP TABLE {name}(doc_id BIGINT, dup_group BIGINT)")
    rows = [(x, find(x)) for x in parent]
    con.executemany(f"INSERT INTO {name} VALUES (?, ?)", rows)
    cache[prefix] = name
    return name


def rewrite_closure(con, sql, cache):
    """Swap the recursive reach/nodes/groups CTE block for the
    union-find table; no-op for oracles without the block."""
    if REACH_SENTINEL not in sql:
        return sql
    table = uf_groups(con, sql, cache)
    out, n = REACH_BLOCK.subn(
        f"groups AS (SELECT doc_id, dup_group FROM {table})", sql)
    if n != 1:
        raise RuntimeError("transitive-closure oracle shape changed; "
                           "update REACH_BLOCK in oracle_check.py")
    return out


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
    uf_cache = {}
    # Several queries register byte-identical oracle SQL (the lastfm
    # ingest family shares one 5 ways; q_components/q_sql_components by
    # contract). Memoize the oracle-side result for those only — an
    # unconditional memo would pin the ~20M-row pair outputs in RAM for
    # the whole run for zero reuse — and EVICT each entry after its
    # last consumer: the borderline list-rollup oracles (q_span_dedup's
    # kept_text reconstruction) need every byte of headroom, and the
    # run is memory-bound, not time-bound.
    sql_counts = {}
    for s in oracle.values():
        sql_counts[s] = sql_counts.get(s, 0) + 1
    oracle_memo = {}

    def consume(sql):
        # EVERY path that retires a query name must land here — a skip
        # or failure that bypassed the decrement used to pin a memoized
        # shared-oracle result (~20M rows for the pair family) in RAM
        # for the rest of the run, exactly when headroom mattered most.
        sql_counts[sql] -= 1
        if sql_counts[sql] == 0:
            oracle_memo.pop(sql, None)

    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if name in skips:
            print(f"SKIP {name} (excluded by caller)")
            report[name] = "skip"; n_skip += 1; consume(sql); continue
        spath = f"{out_dir}/{name}"
        if not os.path.isdir(spath):
            print(f"FAIL {name}: no spark output")
            report[name] = "fail:no-output"; n_fail += 1; consume(sql); continue
        try:
            scols, stypes, srows = rows_of(con.sql(f"SELECT * FROM '{spath}/*.parquet'"))
            if sql in oracle_memo:
                ocols, otypes, orows = oracle_memo[sql]
            else:
                ocols, otypes, orows = rows_of(con.sql(rewrite_closure(con, sql, uf_cache)))
                if sql_counts[sql] > 1:
                    oracle_memo[sql] = (ocols, otypes, orows)
            consume(sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            report[name] = f"fail:exec"; n_fail += 1; consume(sql); continue
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
            print(f"PASS {name} ({len(srows)} rows)", flush=True)
            report[name] = f"pass:{len(srows)}"; n_pass += 1
        # the pair-family outputs run to ~20M tuples per side; release
        # them before the next query's oracle allocates its own peak
        del srows, orows
        import gc
        gc.collect()
    print(f"== {n_pass} pass / {n_fail} fail / {n_skip} skip ==")
    if report_path:
        with open(report_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "out_dir": out_dir,
                       "pass": n_pass, "fail": n_fail, "skip": n_skip,
                       "queries": report}, f, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
