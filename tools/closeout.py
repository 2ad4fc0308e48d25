#!/usr/bin/env python3
"""Round CLOSE-OUT gate — refuses the round summary on unexplained
latency breaches (dev tooling, driver-side python).

Usage: python3 tools/closeout.py [--repo <dir>] [--curr <bench.json>]
       [--factor 1.4] [--min-secs 0.5]

1. Picks the budget baseline: the LATEST committed FULL builder record
   (tools/bench_history/r{N}_builder_full*.json — every registered
   query, not just the driver's slowest-35 tail), falling back to the
   latest driver bench (BENCH_r{N}.json) if no full record exists.
   Full-record budgets mean EVERY query carries a round-over-round
   budget; the driver tail alone lets a mid-pack query triple silently.
2. Runs the latency guard (latency_guard.compute — per-query
   local-sentinel normalization) against the current bench, default
   target/bench_full.json (Bench.scala's full per-query record).
3. Every breach must carry a COMMITTED explanation in
   tools/bench_history/explained.json:

       { "<query>": { "baseline": "BENCH_r08.json",
                      "note": "isolated min-of-5 A/B at HEAD shows ..." } }

   The entry's `baseline` must name the exact BENCH file the guard
   compared against — an explanation written for one round can never
   silently waive a NEW regression against a later baseline.

Exit 0 = clean or fully explained (explained breaches print WAIVED).
Exit 1 = at least one unexplained breach: the round summary is refused
until the breach is reclaimed or an A/B note is committed. This is the
wiring the guard lacked in round 8, when three breaches rode a green
gate into the round summary with no note.
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import latency_guard  # noqa: E402


def latest_driver_bench(repo):
    best, best_n = None, -1
    for f in os.listdir(repo):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", f)
        if m and int(m.group(1)) > best_n:
            best, best_n = f, int(m.group(1))
    return best


def latest_full_record(repo):
    """Latest committed full builder record: r{N}_builder_full{Q}.json,
    highest round first, then most queries within a round."""
    hist = os.path.join(repo, "tools", "bench_history")
    if not os.path.isdir(hist):
        return None
    best, best_key = None, (-1, -1)
    for f in os.listdir(hist):
        m = re.fullmatch(r"r(\d+)_builder_full(\d+)\.json", f)
        if m and (int(m.group(1)), int(m.group(2))) > best_key:
            best, best_key = f, (int(m.group(1)), int(m.group(2)))
    return best


def main(argv):
    args, opts = latency_guard.parse_args(argv, __doc__)
    if args:
        raise SystemExit(__doc__)
    repo = opts.get("--repo", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    curr_path = opts.get("--curr", os.path.join(repo, "target", "bench_full.json"))
    factor = float(opts.get("--factor", "1.4"))
    min_secs = float(opts.get("--min-secs", "0.5"))

    full_name = latest_full_record(repo)
    if full_name is not None:
        prev_name = full_name
        prev_path = os.path.join(repo, "tools", "bench_history", full_name)
    else:
        prev_name = latest_driver_bench(repo)
        if prev_name is None:
            print("INFO no bench baseline yet — nothing to guard")
            return 0
        prev_path = os.path.join(repo, prev_name)
    if not os.path.exists(curr_path):
        print(f"FAIL current bench {curr_path} missing — run graft.Bench first")
        return 1
    prev = latency_guard.load(prev_path)
    curr = latency_guard.load(curr_path)
    print(f"== close-out guard: {prev_name} -> {curr_path}")
    breaches, _, _, _ = latency_guard.compute(prev, curr, factor, min_secs)
    common = len(set(prev["queries"]) & set(curr["queries"]))
    print(f"== budgets checked for {common} common queries "
          f"({len(prev['queries'])} in baseline, {len(curr['queries'])} current)")

    explained = {}
    exp_path = os.path.join(repo, "tools", "bench_history", "explained.json")
    if os.path.exists(exp_path):
        with open(exp_path) as f:
            explained = json.load(f)

    unexplained = []
    for name, p, c, r, drift in sorted(breaches, key=lambda b: -b[3]):
        e = explained.get(name)
        if e and e.get("baseline") == prev_name and e.get("note"):
            print(f"WAIVED {name}: {p:.2f}s -> {c:.2f}s ({r:.2f}x) — {e['note']}")
        else:
            why = ("no entry in explained.json" if not e else
                   f"entry baseline {e.get('baseline')!r} != {prev_name!r}")
            print(f"FAIL {name}: {p:.2f}s -> {c:.2f}s ({r:.2f}x, "
                  f"local sentinel drift {drift:.2f}x) — {why}")
            unexplained.append(name)
    if unexplained:
        print(f"\n== ROUND SUMMARY REFUSED: {len(unexplained)} unexplained "
              f"breach(es): {', '.join(unexplained)}")
        print(f"Reclaim each, or commit an A/B note to {exp_path} "
              f"with baseline={prev_name!r}.")
        return 1
    n = len(breaches)
    print(f"== close-out clean: {n} breach(es), all explained"
          if n else "== close-out clean: no breaches")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
