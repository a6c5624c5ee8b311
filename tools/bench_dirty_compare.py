#!/usr/bin/env python3
"""Compare a dirty-fixture bench sweep against a clean sweep at the same
SF, per query FAMILY (prefix before the first '_'), and emit one JSON
artifact. A family whose dirty/clean ratio exceeds the bound marks a
pathological-input perf cliff (null-heavy groupings, CRLF tokenizers,
whitespace dup storms) that the correctness differential alone cannot
see.

Usage: bench_dirty_compare.py <clean_bench_last.json> <dirty_bench_last.json> <out.json> [bound]

Family ratios are computed over SUMMED family seconds (not per-query:
sub-100ms entries jitter past any ratio), and families whose clean sum
is under 0.5 s are reported but exempt from the bound for the same
reason. Exit code 1 when any bounded family exceeds the bound.
"""
import json
import sys
from collections import defaultdict


def families(queries):
    fams = defaultdict(float)
    for name, sec in queries.items():
        if sec >= 0:  # -1.0 = failure sentinel, counted separately
            fams[name.split("_", 1)[0]] += sec
    return fams


def main():
    clean_path, dirty_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    bound = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
    clean = json.load(open(clean_path))
    dirty = json.load(open(dirty_path))
    cf, df = families(clean["queries"]), families(dirty["queries"])
    cfail = sorted(k for k, v in clean["queries"].items() if v < 0)
    dfail = sorted(k for k, v in dirty["queries"].items() if v < 0)
    rows, breaches = {}, []
    for fam in sorted(set(cf) | set(df)):
        c, d = cf.get(fam, 0.0), df.get(fam, 0.0)
        ratio = (d / c) if c > 0 else None
        exempt = c < 0.5
        rows[fam] = {"clean_sec": round(c, 3), "dirty_sec": round(d, 3),
                     # `is not None`, not truthiness: a fully-failed dirty
                     # family sums to 0.0 and must record ratio 0.0, not
                     # masquerade as "clean sum was zero, undefined"
                     "ratio": round(ratio, 3) if ratio is not None else None,
                     "exempt_small": exempt}
        if ratio is not None and not exempt and ratio > bound:
            breaches.append(fam)
    out = {
        "metric": "bench_dirty_vs_clean",
        "bound": bound,
        "clean_total_sec": round(clean["total_sec"], 3),
        "dirty_total_sec": round(dirty["total_sec"], 3),
        "clean_canary_sec": clean.get("canary_sec"),
        "dirty_canary_sec": dirty.get("canary_sec"),
        "n_queries": clean["n_queries"],
        "clean_failures": cfail,
        "dirty_failures": dfail,
        "families": rows,
        "breaches": breaches,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"clean {out['clean_total_sec']}s dirty {out['dirty_total_sec']}s; "
          f"breaches past {bound}x: {breaches or 'none'}; "
          f"failures clean={len(cfail)} dirty={len(dfail)}")
    sys.exit(1 if breaches or dfail != cfail else 0)


if __name__ == "__main__":
    main()
