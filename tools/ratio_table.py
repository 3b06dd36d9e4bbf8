#!/usr/bin/env python3
"""Emit BENCH_FULL.md's Spark-vs-DuckDB ratio table FROM the committed
artifacts, so the prose can never drift from the files again (the
round-12 verdict found the sf0.1 row quoting numbers that existed in
no committed artifact).

Usage:
  python3 tools/ratio_table.py <label> <bench.json> <duckbench.txt> \
      [<label2> <bench2.json> <duckbench2.txt> ...]

Each triple becomes two table rows (all oracle keys, batch-only).
<bench.json> is graft.Bench's JSON line (or BENCH_FULL.json);
<duckbench.txt> is tools/duckbench.py's output whose LAST line is the
duckdb_total JSON summary. The batch-only composition uses the same
exclusion rule duckbench.py documents: streaming/stateful e-keys and
every p-key (Spark runs a real micro-batch fold there; the oracle is
its batch re-derivation, not the same workload).
"""
import json
import sys

STREAMING = {
    "e04_streaming_counts", "e05_stateful_sessions",
    "e08_streaming_file_sink", "e09_stream_stream_join",
    "e10_streaming_dedup", "e14_streaming_upsert",
}


def is_streaming(key):
    return key in STREAMING or key.startswith("p")


def load_duck(path):
    for line in reversed(open(path).read().splitlines()):
        line = line.strip()
        if line.startswith("{") and '"duckdb_total"' in line:
            return json.loads(line)
    raise SystemExit(f"{path}: no duckdb_total JSON line found")


def main():
    args = sys.argv[1:]
    if not args or len(args) % 3:
        raise SystemExit(__doc__)
    print("| SF | keys | Spark | DuckDB | ratio |")
    print("|---|---|---|---|---|")
    for i in range(0, len(args), 3):
        label, bench_path, duck_path = args[i:i + 3]
        spark = json.loads(open(bench_path).read())["queries"]
        duck = load_duck(duck_path)["queries"]
        keys = sorted(set(spark) & set(duck))
        batch = [k for k in keys if not is_streaming(k)]
        for name, ks in ((f"{len(keys)} oracle", keys),
                         (f"batch-only {len(batch)}", batch)):
            s = sum(spark[k] for k in ks)
            d = sum(duck[k] for k in ks)
            print(f"| {label} | {name} | {s:.1f} s | {d:.1f} s "
                  f"| {s / d:.2f}x |")
        print(f"<!-- {label}: spark={bench_path} duck={duck_path} "
              f"(sums recomputed from the committed files) -->")


if __name__ == "__main__":
    main()
