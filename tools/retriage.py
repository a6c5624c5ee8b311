#!/usr/bin/env python3
"""Re-triage a bench sweep's raw >=2x rows with isolated re-runs
(dev tool, not part of the Scala library).

Every round so far, a handful of sweep rows read >=2x of baseline purely
from run-order/JIT variance (the sweep's measured pass shares one JVM
with 180+ other queries; a query scheduled after a heavy streaming
neighbor inherits its evicted caches), and every round the adjudication
was the same by-hand loop: re-run exactly those names in isolation via
`runMain graft.Bench <names>` and read the settled number. This tool IS
that loop, so the verdict stops being re-litigated manually.

Usage:
  retriage.py SWEEP.json [BASELINE.json] [--threshold 2.0] [--out OUT.json]
              [--dry-run]

Reads the sweep and the baseline (default: bench_baseline.json next to
this repo root), finds rows whose raw sweep/baseline ratio >= threshold,
re-runs just those through `sbt -batch "runMain graft.Bench <names>"`
with SPARK_GRAFT_SF_DIR taken from the sweep's own sf tag, and emits a
verdict JSON: per flagged query the sweep number, the isolated number,
both ratios, and cleared/regressed (cleared = isolated ratio < threshold).
Failures (sentinel -1.0) are listed separately and never "cleared" by a
timing. bench_last.json (clobbered by the subset run) is restored.

The isolated run keeps Bench's own warmup-pass semantics, so the number
it settles on is steady-state — the same basis the baseline minima were
folded from.
"""
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path):
    """Load either a bench_last.json-style flat sweep, or the driver's
    BENCH_r{N}.json wrapper (captured stdout tail with chunked
    queries_chunk lines + a bench_last trailer), normalized to the flat
    shape. The tail's HEAD may be truncated — a clipped first chunk line
    is skipped, which is exactly why the trailer carries the totals.

    Also recovers PER-CHUNK canaries (round 16: the sweep samples the
    CPU canary after every chunk, so each query can be normalized by
    the epoch it actually ran in) as `chunk_canary_by_query`."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        by_query = {}
        ccs = d.get("chunk_canaries") or []
        if ccs:
            names = list(d["queries"])  # registration order (Bench emits it)
            # chunk size is RECORDED by Bench (chunk_size); the default 20
            # is Bench.ChunkSize. Never infer ceil(n/chunks): a short last
            # chunk shifts every boundary query into the wrong epoch.
            cs = int(d.get("chunk_size") or 20)
            for i, n in enumerate(names):
                by_query[n] = ccs[min(i // cs, len(ccs) - 1)]
        # remeasured rows' emitted times came from sweep-END re-runs, so
        # their chunk's canary does not price them — drop them from the
        # pre-normalization map (they keep the isolated-rerun path)
        for n in d.get("remeasured") or []:
            by_query.pop(n, None)
        d["chunk_canary_by_query"] = by_query
        return d
    queries, trailer, by_query = {}, None, {}
    for line in d.get("tail", "").splitlines():
        i = line.find('{"metric"')
        if i < 0:
            continue
        try:
            obj = json.loads(line[i:])
        except json.JSONDecodeError:
            continue  # head-truncated chunk line
        if obj.get("metric") == "queries_chunk":
            queries.update(obj["queries"])
            if obj.get("canary_sec"):
                for n in obj["queries"]:
                    by_query[n] = obj["canary_sec"]
        elif obj.get("metric") in ("bench_last", "total"):
            trailer = obj
    assert trailer, f"{path}: no bench trailer line found"
    trailer.setdefault("total_sec", trailer.get("value"))
    trailer.setdefault("n_queries", len(queries))
    trailer.setdefault("queries", {})
    trailer["queries"].update(queries)
    remeasured = trailer.get("remeasured") or []
    if "..." in remeasured:
        # clipped list (tail-safety cap): provenance unknown for the
        # rest — disable pre-normalization entirely rather than risk
        # clearing a sweep-end sample against the wrong chunk's epoch
        by_query = {}
    for n in remeasured:
        by_query.pop(n, None)
    trailer["chunk_canary_by_query"] = by_query
    return trailer


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    flags = [a for a in argv if a.startswith("--")]
    if not args:
        print(__doc__, file=sys.stderr)
        return 2
    sweep_path = args[0]
    base_path = args[1] if len(args) > 1 else os.path.join(REPO, "bench_baseline.json")
    threshold = 2.0
    out_path = None
    dry = "--dry-run" in flags
    for f in flags:
        if f.startswith("--threshold"):
            threshold = float(f.split("=", 1)[1]) if "=" in f else 2.0
        if f.startswith("--out="):
            out_path = f.split("=", 1)[1]

    sweep, base = load(sweep_path), load(base_path)
    sq, bq = sweep["queries"], base["queries"]
    chunk_cc = sweep.get("chunk_canary_by_query") or {}
    base_canary = base.get("canary_sec")

    # Per-chunk pre-normalization (round 16): when the sweep carries a
    # canary for the chunk a query ran in, the flag is born NORMALIZED —
    # a row that reads 2.1x raw inside a 1.5x-slow chunk is ~1.4x in
    # that chunk's epoch and never enters the isolated-rerun queue.
    def chunk_epoch(name):
        # both sides must be real positive samples: canary_sec:-1.0 is
        # writeBenchLast's "not measured" sentinel and must neutralize
        # normalization, never produce a negative epoch that clears
        # every flag
        cc = chunk_cc.get(name)
        return (cc / base_canary) if (cc and cc > 0 and base_canary
                                      and base_canary > 0) else None

    failures = sorted(n for n, v in sq.items() if v < 0)
    flagged, prenormalized = [], []
    for n, v in sorted(sq.items()):
        if v < 0 or n not in bq or bq[n] <= 0:
            continue
        raw = v / bq[n]
        if raw < threshold:
            continue
        ep = chunk_epoch(n)
        norm = raw / ep if ep else None
        if norm is not None and norm < threshold:
            prenormalized.append((n, v, bq[n], raw, ep, norm))
        else:
            flagged.append((n, v, bq[n], raw))

    declared = sweep.get("n_queries") or len(sq)
    if len(sq) < declared:
        print(f"WARNING: sweep carries per-query rows for only {len(sq)} of "
              f"{declared} queries (driver tail truncation) — triage covers "
              f"only the surviving rows; prefer bench_last.json from a local "
              f"sweep for full coverage")
    print(f"sweep: {declared} queries, {len(failures)} failures, "
          f"{len(prenormalized)} raw flags cleared by their chunk canary, "
          f"{len(flagged)} rows still >= {threshold}x after chunk "
          f"normalization (or with no chunk canary)")
    for n, v, b, raw, ep, norm in prenormalized:
        print(f"  {n}: {norm:.2f}x in its chunk's epoch ({ep:.2f}x) -> "
              f"CLEARED without re-run")
    for n, v, b, r in flagged:
        ep = chunk_epoch(n)
        tag = f" ({r / ep:.2f}x in its chunk's {ep:.2f}x epoch)" if ep else ""
        print(f"  {n}: sweep {v:.2f}s vs baseline {b:.2f}s = {r:.2f}x{tag}")
    if failures:
        print(f"FAILURES (no timing can clear these): {', '.join(failures)}")

    verdict = {
        "threshold": threshold,
        "sweep": sweep_path,
        "baseline": base_path,
        "failures": failures,
        "prenormalized_cleared": [
            {"query": n, "sweep_sec": v, "baseline_sec": b,
             "raw_ratio": round(raw, 3), "chunk_epoch": round(ep, 3),
             "normalized_ratio": round(norm, 3), "verdict": "cleared"}
            for n, v, b, raw, ep, norm in prenormalized],
        "flagged": [],
    }
    if flagged and not dry:
        names = ",".join(n for n, *_ in flagged)
        sf_dir = sweep["sf"]
        # the subset run clobbers bench_last.json in the repo root —
        # stash and restore so the committed sweep artifact survives
        last = os.path.join(REPO, "bench_last.json")
        stash = None
        if os.path.exists(last):
            stash = tempfile.mktemp(suffix=".json")
            shutil.copy(last, stash)
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        print(f"re-running isolated: sbt 'runMain graft.Bench {names}' "
              f"(SPARK_GRAFT_SF_DIR={sf_dir})")
        # subset runs deliberately do NOT write bench_last.json (a dev
        # subset would masquerade as a collapsed query surface), so the
        # timings must come from the emitted queries_chunk stdout lines
        proc = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Bench {names}"],
            cwd=REPO, env=env, check=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        iso = {}
        for line in proc.stdout.splitlines():
            i = line.find('{"metric"')
            if i < 0:
                continue
            try:
                obj = json.loads(line[i:])
            except json.JSONDecodeError:
                continue
            if obj.get("metric") == "queries_chunk":
                iso.update(obj["queries"])
        # epoch calibration: the isolated run's canary vs the baseline's
        # prices the machine's CURRENT speed — a row that is 2.1x raw on
        # a 1.5x-slow epoch is ~1.4x normalized, not a regression
        # sbt interleaves the JVM's stderr into its own stdout, so look
        # in both streams for the canary line
        m = re.search(r"\[bench\] canary ([0-9.]+) s",
                      proc.stdout + "\n" + proc.stderr)
        iso_canary = float(m.group(1)) if m else None
        base_canary = base.get("canary_sec")
        epoch = (iso_canary / base_canary
                 if iso_canary and base_canary and base_canary > 0 else None)
        verdict["isolated_canary_sec"] = iso_canary
        verdict["epoch_ratio"] = round(epoch, 3) if epoch else None
        if epoch:
            print(f"isolated-run epoch: canary {iso_canary:.3f}s = "
                  f"{epoch:.2f}x of baseline canary {base_canary:.3f}s")
        if stash:
            shutil.move(stash, last)
        for n, v, b, r in flagged:
            iv = iso.get(n, -1.0)
            ir = iv / b if iv >= 0 else None
            nr = (ir / epoch) if (ir is not None and epoch) else ir
            cleared = nr is not None and nr < threshold
            verdict["flagged"].append({
                "query": n, "sweep_sec": v, "baseline_sec": b,
                "sweep_ratio": round(r, 3), "isolated_sec": iv,
                "isolated_ratio": round(ir, 3) if ir is not None else None,
                "normalized_ratio": round(nr, 3) if nr is not None else None,
                "verdict": "cleared" if cleared else "regressed",
            })
            tag = "CLEARED" if cleared else "REGRESSED"
            print(f"  {n}: isolated {iv:.2f}s = {ir:.2f}x raw"
                  + (f" / {nr:.2f}x epoch-normalized" if epoch else "")
                  + f" -> {tag}" if ir is not None
                  else f"  {n}: isolated run FAILED -> REGRESSED")
    elif flagged:
        verdict["flagged"] = [
            {"query": n, "sweep_sec": v, "baseline_sec": b,
             "sweep_ratio": round(r, 3), "verdict": "not-rerun (--dry-run)"}
            for n, v, b, r in flagged]

    regressed = [f for f in verdict["flagged"]
                 if f.get("verdict") == "regressed"] + failures
    verdict["clean"] = not regressed
    if out_path:
        with open(out_path, "w") as f:
            json.dump(verdict, f, indent=2)
        print(f"verdict written to {out_path}")
    print("VERDICT:", "clean" if verdict["clean"]
          else f"{len(regressed)} regressed/failed")
    return 0 if verdict["clean"] else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
