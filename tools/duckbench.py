#!/usr/bin/env python3
"""Time the DuckDB oracle SQL for headline relational keys — the
single-node baseline the brief asks graft to match-or-beat.

Usage: python3 tools/duckbench.py <verify_out_dir> <sf_dir> [key ...]

Reads <verify_out_dir>/oracle_sql.json (written by graft.Verify), runs
each selected oracle in DuckDB over the same sf_dir parquet the Spark
bench reads, and prints per-key seconds plus a JSON summary line.
Pair the output with BENCH_FULL.json (the Spark sweep at the same SF)
to compute spark/duckdb ratios — see the table in BENCH_FULL.md.

Methodology mirrors Bench.scala: one warm-up execution per key (pays
DuckDB's own optimizer/IO caches), then the timed steady-state run
materializes the full result (fetchall). DuckDB gets the whole
machine (default thread count), exactly as the single-node reference
deployment would.

Default key set: the relational/aggregation headliners whose oracle
SQL is a faithful re-derivation of the same computation (dedup/ANN
keys are excluded — their oracles are either absent or re-derive via
different algorithms, so a timing ratio would compare apples to
oranges).
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Relational/agg headliners with apples-to-apples oracle SQL.
DEFAULT_KEYS = [
    "q01_pricing_summary", "q03_decoded_view", "q05_fleet_search",
    "q06_owner_summary", "q08_top_makers", "q09_dup_rank",
    "q10_distinct_count", "q12_conditional_agg", "q13_monthly_volume",
    "q18_percentiles", "q19_rollup", "q21_pivot", "q23_rolling_window",
    "q26_cube_grouping", "q27_range_window", "q34_rank_family",
    "q35_column_profile", "q36_histogram", "q39_grouped_topk",
    "q41_hourly_dedup", "q42_canonical_record", "q43_skew_profile",
    "t01_token_stats", "t03_lang_id", "t13_stopword_detect",
]


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    keys = sys.argv[3:] or DEFAULT_KEYS
    oracles = json.loads((out_dir / "oracle_sql.json").read_text())

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    failed = []
    for key in keys:
        sql = oracles.get(key)
        if sql is None:
            print(f"SKIP  {key}: no oracle SQL", file=sys.stderr)
            continue
        try:
            con.execute(sql).fetchall()          # warm-up
            t0 = time.perf_counter()
            rows = con.execute(sql).fetchall()   # steady state
            dt = time.perf_counter() - t0
            results[key] = dt
            print(f"{dt:8.3f}s  {key}  ({len(rows)} rows)")
        except Exception as e:                   # noqa: BLE001
            failed.append(key)
            print(f"FAIL  {key}: {e}", file=sys.stderr)

    total = sum(results.values())
    line = {
        "metric": "duckdb_total", "value": round(total, 3), "unit": "sec",
        "n": len(results), "sf": sf_dir,
        "queries": {k: round(v, 4) for k, v in sorted(results.items())},
        "failed": sorted(failed),
    }
    print(json.dumps(line))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
