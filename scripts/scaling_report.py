"""Summarize the durable scaling-sample pool + round-5 campaign runs into
the numbers BASELINE.md quotes: pooled per-level minima, pooled N->4N
efficiencies (8/32 and 4/16), and the per-run gated-pair table."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
POOL = os.path.join(REPO, "bench_artifacts", "scaling_samples.jsonl")
RUNS = os.path.join(REPO, "bench_artifacts", "scaling_runs_r5.jsonl")


def markdown() -> None:
    """Emit the two tables BASELINE.md's round-5 scaling section quotes."""
    n_events = 12_000_000
    samples = []
    with open(POOL) as f:
        for line in f:
            if line.strip():
                s = json.loads(line)
                if s.get("n_events") == n_events:
                    samples.append(s)
    by = {}
    for s in samples:
        by.setdefault(s["ncpu"], []).append(s["sec"])
    print("| level (cpus) | samples | pooled min (s) | median (s) | events/s at min |")
    print("|---|---|---|---|---|")
    for n, v in sorted(by.items()):
        print(f"| {n} | {len(v)} | {min(v):.2f} | {sorted(v)[len(v)//2]:.2f} "
              f"| {n_events/min(v):,.0f} |")
    mins = {n: min(v) for n, v in by.items()}
    print()
    for lo, hi in ((4, 16), (8, 32)):
        if lo in mins and hi in mins:
            eff = (mins[lo] / mins[hi]) / (hi / lo)
            print(f"pooled {lo}->{hi}: **{eff:.3f}** "
                  f"(sec_{lo}={mins[lo]:.2f}, sec_{hi}={mins[hi]:.2f})")
    print()
    print("| run (UTC) | levels | same-run pair eff | pre-run 32-alloc probe (MB/s) | seconds |")
    print("|---|---|---|---|---|")
    with open(RUNS) as f:
        for line in f:
            if not line.strip():
                continue
            r = json.loads(line)
            eff = r.get("scaling_efficiency")
            secs = ", ".join(f"{k[4:]}cpu {v:.1f}" for k, v in r.items()
                             if k.startswith("sec_"))
            print(f"| {r.get('ts','?')[11:]} | {'/'.join(map(str, r['levels']))} "
                  f"| {'**%.3f**' % eff if eff else '—'} "
                  f"| {r.get('pre_probe_alloc32_mb_s')} | {secs} |")


def main() -> None:
    if "--markdown" in sys.argv:
        markdown()
        return
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    samples = []
    with open(POOL) as f:
        for line in f:
            if line.strip():
                s = json.loads(line)
                if s.get("n_events") == n_events:
                    samples.append(s)
    by = {}
    for s in samples:
        by.setdefault(s["ncpu"], []).append(s["sec"])
    mins = {n: min(v) for n, v in sorted(by.items())}
    print(f"pool: {len(samples)} samples @ {n_events} events")
    for n, v in sorted(by.items()):
        print(f"  ncpu={n:>2}: {len(v):>3} samples, min {min(v):.2f}s, "
              f"median {sorted(v)[len(v)//2]:.2f}s")
    for lo, hi in ((8, 32), (4, 16)):
        if lo in mins and hi in mins:
            eff = (mins[lo] / mins[hi]) / (hi / lo)
            print(f"pooled efficiency {lo}->{hi}: {eff:.3f} "
                  f"(sec_{lo}={mins[lo]:.2f}, sec_{hi}={mins[hi]:.2f})")
    if os.path.exists(RUNS):
        print("\nround-5 campaign runs (gated pairs and bursts):")
        with open(RUNS) as f:
            for line in f:
                if not line.strip():
                    continue
                r = json.loads(line)
                lv = r.get("levels")
                eff = r.get("scaling_efficiency")
                print(f"  {r.get('ts','?')} levels={lv} eff={eff} "
                      f"pre_probe={r.get('pre_probe_alloc32_mb_s')} "
                      f"gate={r.get('phase_gate_alloc_mb_s')} "
                      + " ".join(f"{k}={v}" for k, v in r.items()
                                 if k.startswith("sec_")))


if __name__ == "__main__":
    main()
