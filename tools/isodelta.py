#!/usr/bin/env python3
"""Isolation-vs-context bench deltas, per query family.

The full-suite bench number for a query can drift away from what the
same query costs alone in a fresh JVM (r6's d07 ran 5x slower
in-context; r7's p07 drifted +35%). This tool makes that delta a
first-class measurement instead of a per-round archaeology exercise:

  1. take a FULL-CONTEXT bench JSON (the driver's BENCH_r{N}.json or a
     local `runMain graft.Bench` line);
  2. for each requested family (d, s, p, ...), run the bench again in a
     FRESH JVM restricted to that family via SPARK_GRAFT_ONLY='<fam>*'
     (Bench's prefix-glob filter);
  3. print per-query context/isolation/ratio plus per-family sums, and
     flag queries whose context number exceeds isolation by more than
     the threshold (default 1.5x and >0.5s absolute).

Usage:
  python3 tools/isodelta.py /tmp/bench_full.log d s p
  python3 tools/isodelta.py BENCH_r08.json p          # driver JSON ok
  SPARK_GRAFT_SF_DIR=... overrides the data dir (default sf0.1).

Notes: family isolation still shares the JVM across the family's
queries (that IS the point — a family is the unit a real pipeline
submits together); single-query isolation is SPARK_GRAFT_ONLY=<name>
by hand. The box's wall clock is ~±20% noisy, so treat ratios under
~1.4 as noise (NOTES.md).
"""
import json
import os
import re
import subprocess
import sys

THRESH_RATIO = 1.5
THRESH_ABS = 0.5


def load_bench(path):
    """Parse a bench JSON line out of a log file or a driver JSON."""
    text = open(path).read()
    # driver BENCH_r*.json: {"parsed": {...}} or the raw line itself
    for candidate in re.findall(r'\{"metric".*\}', text):
        try:
            d = json.loads(candidate)
            return d["queries"]
        except (json.JSONDecodeError, KeyError):
            continue
    d = json.loads(text)
    if "queries" in d:
        return d["queries"]
    if "parsed" in d and d["parsed"]:
        return d["parsed"]["queries"]
    raise SystemExit(f"no bench line found in {path}")


def run_family(fam, sf_dir):
    env = dict(os.environ, SPARK_GRAFT_ONLY=f"{fam}*",
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    for line in out.stdout.splitlines():
        m = re.search(r'\{"metric".*\}', line)
        if m:
            return json.loads(m.group(0))["queries"]
    raise SystemExit(
        f"family {fam}: no bench line (stderr tail: {out.stderr[-500:]})")


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    ctx = load_bench(sys.argv[1])
    fams = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    flagged = []
    for fam in fams:
        iso = run_family(fam, sf_dir)
        keys = sorted(k for k in iso if k in ctx)
        if not keys:
            print(f"-- family {fam}: no overlapping keys --")
            continue
        csum = sum(ctx[k] for k in keys if ctx[k] >= 0)
        isum = sum(iso[k] for k in keys if iso[k] >= 0)
        print(f"-- family {fam}: context {csum:.1f}s vs isolation "
              f"{isum:.1f}s (x{csum / max(isum, 0.01):.2f}) --")
        for k in keys:
            c, i = ctx[k], iso[k]
            ratio = c / max(i, 0.01)
            mark = ""
            if c - i > THRESH_ABS and ratio > THRESH_RATIO:
                mark = "  <-- DRIFT"
                flagged.append((k, c, i, ratio))
            print(f"  {k:8s} ctx {c:6.2f}  iso {i:6.2f}  x{ratio:4.2f}{mark}")
    print()
    if flagged:
        print("DRIFTING (context > {}x isolation and > {}s):".format(
            THRESH_RATIO, THRESH_ABS))
        for k, c, i, r in flagged:
            print(f"  {k}: {c:.2f}s vs {i:.2f}s (x{r:.2f})")
    else:
        print("no query drifts beyond the threshold — the context bench "
              "tracks isolation.")


if __name__ == "__main__":
    main()
