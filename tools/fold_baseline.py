#!/usr/bin/env python3
"""Fold one or more bench_last.json sweeps into bench_baseline.json
(dev tool, not part of the Scala library).

Every folded entry is a MEASURED number: per-query minimum across the
given sweeps, which must all carry the same sf tag. canary_sec is the
minimum canary among the sweeps — the fastest observed machine state of
the SAME epoch family the minima came from — so the runtime's epoch
calibration (Bench.epochRatio) scales every entry consistently. This
replaces the older cross-epoch synthesis that round 12's verdict flagged
(ratio-derived "fast-epoch" entries made the 2x tripwire fire at ~2.7x
for some rows).

Usage: fold_baseline.py OUT IN1 [IN2 ...]
"""
import json, sys


def main(out, ins):
    sweeps = [json.load(open(p)) for p in ins]
    sfs = {s["sf"] for s in sweeps}
    assert len(sfs) == 1, f"cross-SF fold is meaningless: {sfs}"
    canaries = [s["canary_sec"] for s in sweeps if s.get("canary_sec", -1) > 0]
    assert canaries, "no sweep carries a measured canary"
    names = set()
    for s in sweeps:
        names |= set(s["queries"])
    folded = {}
    for n in sorted(names):
        # sentinel -1.0 = that sweep's failure; a query must have at
        # least one real sample to enter the baseline
        samples = [s["queries"][n] for s in sweeps
                   if n in s["queries"] and s["queries"][n] >= 0]
        assert samples, f"{n} failed in every folded sweep"
        folded[n] = min(samples)
    total = sum(folded.values())
    qs = ",".join(f'"{k}":{v}' for k, v in folded.items())
    text = (f'{{"metric":"bench_last","total_sec":{total},'
            f'"n_queries":{len(folded)},"fatal":false,'
            f'"canary_sec":{min(canaries)},"sf":"{sfs.pop()}",\n'
            f'"queries":{{{qs}}}}}\n')
    with open(out, "w") as f:
        f.write(text)
    print(f"folded {len(ins)} sweeps -> {out}: {len(folded)} queries, "
          f"total {total:.1f}s, canary {min(canaries):.3f}s")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
