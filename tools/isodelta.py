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
  python3 tools/isodelta.py --write-baseline bench.log d s p q m t st g
      # ...additionally merges the measured isolation numbers into
      # tools/iso_baseline.json, which graft.Bench reads to emit
      # per-query "drift" flags in its JSON line
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


def write_baseline(sf_dir, iso_all):
    """Merge measured isolation numbers into tools/iso_baseline.json
    (keyed by the bench's short keys; graft.Bench only applies them to
    runs over the same SF dir basename)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "iso_baseline.json")
    base = {"sf": os.path.basename(sf_dir), "queries": {}}
    if os.path.isfile(path):
        try:
            old = json.load(open(path))
            if old.get("sf") == base["sf"]:
                base["queries"] = old.get("queries", {})
        except json.JSONDecodeError:
            pass
    base["queries"].update(
        {k: round(v, 2) for k, v in iso_all.items() if v >= 0})
    with open(path, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
    print(f"baseline written: {path} ({len(base['queries'])} queries)")


def main():
    args = sys.argv[1:]
    write = "--write-baseline" in args
    if write:
        args.remove("--write-baseline")
    if len(args) < 2:
        raise SystemExit(__doc__)
    ctx = load_bench(args[0])
    fams = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    flagged = []
    iso_all = {}
    for fam in fams:
        iso = run_family(fam, sf_dir)
        iso_all.update(iso)
        keys = sorted(k for k in iso if k in ctx)
        if not keys:
            print(f"-- family {fam}: no overlapping keys --")
            continue
        csum = sum(ctx[k] for k in keys if ctx[k] >= 0 and iso[k] >= 0)
        isum = sum(iso[k] for k in keys if ctx[k] >= 0 and iso[k] >= 0)
        print(f"-- family {fam}: context {csum:.1f}s vs isolation "
              f"{isum:.1f}s (x{csum / max(isum, 0.01):.2f}) --")
        for k in keys:
            c, i = ctx[k], iso[k]
            # a -1 marker means that run FAILED — call it out instead of
            # computing a nonsense ratio / spurious drift flag
            if c < 0 or i < 0:
                side = "ctx" if c < 0 else "iso"
                print(f"  {k:8s} ctx {c:6.2f}  iso {i:6.2f}  "
                      f"FAILED ({side} run)")
                continue
            ratio = c / max(i, 0.01)
            mark = ""
            if c - i > THRESH_ABS and ratio > THRESH_RATIO:
                mark = "  <-- DRIFT"
                flagged.append((k, c, i, ratio))
            print(f"  {k:8s} ctx {c:6.2f}  iso {i:6.2f}  x{ratio:4.2f}{mark}")
    if write and iso_all:
        write_baseline(sf_dir, iso_all)
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
