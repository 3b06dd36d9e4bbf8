#!/usr/bin/env python3
"""Merge two bench JSONs (Spark graft.Bench or tools/duckbench.py
output at the same SF/HEAD) into a per-key MIN composition — the
repo's isolated-rerun rule applied symmetrically to BOTH engines, so
neither side's numbers carry one-off host-contention inflation the
other side dodged.

Usage: python3 tools/minmerge.py <a.json> <b.json> > merged.json

The merged file recomputes the totals from the per-key mins and
records its composition in-file. Works for either engine's schema
(duckdb_total output also recomputes value_batch_only with the same
streaming-key exclusion duckbench.py uses).
"""
import json
import sys

EXCLUDED = {
    "e04_streaming_counts", "e05_stateful_sessions",
    "e08_streaming_file_sink", "e09_stream_stream_join",
    "e10_streaming_dedup", "e14_streaming_upsert",
}


def is_streaming(key):
    return key in EXCLUDED or key.startswith("p")


def main():
    a = json.loads(open(sys.argv[1]).read())
    b = json.loads(open(sys.argv[2]).read())
    assert a.get("sf") == b.get("sf"), "merging different SFs"
    keys = set(a["queries"]) & set(b["queries"])
    dropped = set(a["queries"]) ^ set(b["queries"])
    if dropped:
        print(f"# dropped (present in one sweep only): {sorted(dropped)}",
              file=sys.stderr)
    merged = {k: min(a["queries"][k], b["queries"][k]) for k in sorted(keys)}
    out = dict(a)
    out["queries"] = merged
    out["value"] = round(sum(merged.values()), 3)
    out["n"] = len(merged)
    if "value_batch_only" in a:
        out["value_batch_only"] = round(
            sum(v for k, v in merged.items() if not is_streaming(k)), 3)
        out["n_batch_only"] = sum(
            1 for k in merged if not is_streaming(k))
    out["composition"] = (
        "per-key min of two adjacent sweeps at the same HEAD "
        f"(sources: {sys.argv[1]}, {sys.argv[2]})")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
