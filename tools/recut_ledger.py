#!/usr/bin/env python3
"""Regenerate BENCH_BASELINE.json from three full-suite bench runs.

Usage: python3 tools/recut_ledger.py <full1.json> <full2.json> <full3.json> <note>

Per-query sample rule (the round-9/10 steal correction): when a run
FLAGGED a query (its artifact carries a retime for it), that run's
sample is the same-JVM retime, not the steal-inflated first timing —
so no median carries a contention burst. Median of the three samples
per query; _meta records provenance.

Dev harness only — the shipped Scala library has no Python dependency.
"""
import json
import statistics
import sys


def main(paths, note):
    runs = [json.load(open(p)) for p in paths]
    sfs = {r["sf"] for r in runs}
    if len(sfs) != 1:
        sys.exit(f"refusing to blend scale factors: {sfs}")
    names = set()
    for r in runs:
        names.update(r["queries"].keys())
    out = {}
    replaced = []
    partial = []
    for q in sorted(names):
        samples = []
        for i, r in enumerate(runs):
            entry = r["queries"].get(q)
            if entry is None or entry["sec"] < 0:
                continue
            flag = r.get("flagged", {}).get(q)
            if flag and flag.get("retime", -1) > 0:
                samples.append(flag["retime"])
                replaced.append(f"{q}@run{i+1}")
            else:
                samples.append(entry["sec"])
        # A 2-sample "median" is a midpoint the host never measured;
        # still recorded (better than no entry) but flagged loudly so
        # the _meta note / operator can call it out.
        if 0 < len(samples) < len(runs):
            partial.append(f"{q}({len(samples)}/{len(runs)})")
        if samples:
            out[q] = round(statistics.median(samples), 3)
    if partial:
        print(f"WARNING: entries from fewer than {len(runs)} samples "
              f"(errored/missing runs): {', '.join(partial)}", file=sys.stderr)
    totals = [round(r["value"], 1) for r in runs]
    meta = {
        "sf": runs[0]["sf"],
        "cpus": 32,
        "samples": len(runs),
        "note": note.format(n=len(out), totals="/".join(map(str, totals)),
                            replaced=", ".join(replaced) or "none"),
    }
    doc = {"_meta": meta}
    doc.update(out)
    with open("BENCH_BASELINE.json", "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"wrote {len(out)} medians; totals {totals}; "
          f"retime-replaced: {replaced or 'none'}")


if __name__ == "__main__":
    # Hard argv contract (review finding): exactly three run files plus
    # a note. A missing note previously died with a raw IndexError, and
    # two run files silently produced a two-sample "median" baseline.
    if len(sys.argv) != 5:
        sys.exit("usage: recut_ledger.py <full1.json> <full2.json> "
                 "<full3.json> <note>  (exactly three full-suite runs)")
    main(sys.argv[1:4], sys.argv[4])
