#!/usr/bin/env python3
"""Round CLOSE-OUT gate — refuses the round summary on unexplained
latency breaches (dev tooling, driver-side python).

Usage: python3 tools/closeout.py [--repo <dir>] [--curr <bench.json>]
       [--factor 1.4] [--min-secs 0.5] [--drift-cap 1.2] [--ceiling 12]

Three gates, all of which must pass:
  1. stepwise budgets vs the LATEST committed full record;
  2. the same budgets vs the previous ROUND's committed record (the
     compound-drift anchor — stepwise re-baselining can't launder a
     cumulative 1.6x);
  3. an absolute per-query ceiling (default 12 s): any query above it
     needs a committed {"<query>": {"ceiling": "<note>"}} waiver.

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


def prev_round_anchor(repo):
    """The previous ROUND's committed full record — the compound-drift
    anchor. Stepwise continuation close-outs within a round re-baseline
    to each other (r10 ran 349→359→367→368), which let a query drift
    1.6x across steps with every single step passing; anchoring every
    close-out to the last record committed by a PRIOR round makes the
    cumulative drift visible no matter how many steps this round runs.
    Current round = latest driver BENCH_r{N}.json's N + 1 (the driver
    writes BENCH at round end), so the anchor is the newest full record
    with round <= N."""
    drv = latest_driver_bench(repo)
    if drv is None:
        return None
    curr_round = int(re.fullmatch(r"BENCH_r(\d+)\.json", drv).group(1)) + 1
    hist = os.path.join(repo, "tools", "bench_history")
    if not os.path.isdir(hist):
        return None
    best, best_key = None, (-1, -1)
    for f in os.listdir(hist):
        m = re.fullmatch(r"r(\d+)_builder_full(\d+)\.json", f)
        if m and int(m.group(1)) < curr_round and \
                (int(m.group(1)), int(m.group(2))) > best_key:
            best, best_key = f, (int(m.group(1)), int(m.group(2)))
    return best


def waiver_baselines(entry):
    """A waiver's named baselines, as a list. Accepts both the scalar
    'baseline' key and a 'baselines' list — a query that breaches BOTH
    gate 1 (stepwise) and gate 2 (round anchor) needs one committed
    entry naming both baseline files, which a single scalar key could
    never satisfy (one entry could match at most one gate)."""
    bl = entry.get("baselines")
    if isinstance(bl, list):
        return bl
    b = entry.get("baseline")
    return [b] if b else []


def sentinel_spread(doc):
    """Intra-run sentinel spread (max/min) of a bench record, across the
    pass-head series and every per-family series. A spread above the
    drift cap means the record was taken on a degrading box and its
    per-query numbers mix fast-phase and slow-phase samples."""
    vals = list(doc.get("sentinel_secs") or [])
    for xs in (doc.get("sentinel_by_family") or {}).values():
        vals.extend(xs)
    vals = [v for v in vals if v and v > 0]
    return (max(vals) / min(vals)) if vals else 1.0


def check_breaches(prev, curr, prev_name, factor, min_secs, explained,
                   exp_path, drift_cap):
    breaches, _, _, _ = latency_guard.compute(prev, curr, factor, min_secs,
                                              drift_cap)
    common = len(set(prev["queries"]) & set(curr["queries"]))
    print(f"== budgets checked for {common} common queries "
          f"({len(prev['queries'])} in baseline, {len(curr['queries'])} current)")
    unexplained = []
    for name, p, c, r, drift in sorted(breaches, key=lambda b: -b[3]):
        e = explained.get(name)
        if e and prev_name in waiver_baselines(e) and e.get("note"):
            print(f"WAIVED {name}: {p:.2f}s -> {c:.2f}s ({r:.2f}x) — {e['note']}")
        else:
            why = ("no entry in explained.json" if not e else
                   f"entry baselines {waiver_baselines(e)!r} lack {prev_name!r}")
            print(f"FAIL {name}: {p:.2f}s -> {c:.2f}s ({r:.2f}x, "
                  f"local sentinel drift {drift:.2f}x) — {why}")
            unexplained.append(name)
    return len(breaches), unexplained


def main(argv):
    args, opts = latency_guard.parse_args(argv, __doc__)
    if args:
        raise SystemExit(__doc__)
    repo = opts.get("--repo", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    curr_path = opts.get("--curr", os.path.join(repo, "target", "bench_full.json"))
    factor = float(opts.get("--factor", "1.4"))
    min_secs = float(opts.get("--min-secs", "0.5"))
    # sentinel normalization cap: a box-load excuse may forgive at most
    # 1.2x — a 1.6x query drift can no longer ride a hot sentinel sample
    # (round 10's e20/e11/e15/g20 compound-drift loophole)
    drift_cap = float(opts.get("--drift-cap", "1.2"))
    # absolute per-query ceiling: a NEW gate landing above it needs an
    # explicit committed waiver at birth, not at the next round's autopsy
    ceiling = float(opts.get("--ceiling", "12.0"))

    if not os.path.exists(curr_path):
        print(f"FAIL current bench {curr_path} missing — run graft.Bench first")
        return 1
    curr = latency_guard.load(curr_path)
    explained = {}
    exp_path = os.path.join(repo, "tools", "bench_history", "explained.json")
    if os.path.exists(exp_path):
        with open(exp_path) as f:
            explained = json.load(f)

    total_breaches, unexplained = 0, []

    # gate 1: stepwise baseline — the latest committed full record
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
    prev = latency_guard.load(prev_path)
    print(f"== close-out guard (stepwise): {prev_name} -> {curr_path}")
    n, un = check_breaches(prev, curr, prev_name, factor, min_secs,
                           explained, exp_path, drift_cap)
    total_breaches += n
    unexplained += un

    # gate 2: round anchor — the previous ROUND's committed full record,
    # so stepwise re-baselining can't launder compound drift
    anchor_name = prev_round_anchor(repo)
    if anchor_name is not None and anchor_name != prev_name:
        anchor = latency_guard.load(
            os.path.join(repo, "tools", "bench_history", anchor_name))
        # A degrading-box anchor (its OWN intra-run sentinel spread over
        # the drift cap — r11's swung 7.4x) mixes fast-phase samples that
        # no clean run can reproduce; per query, raise its base to the
        # stepwise baseline's value so only drift visible against BOTH
        # records breaches the anchor gate. Genuine compound drift still
        # fails: a query slower than both baselines breaches gate 1.
        spread = sentinel_spread(anchor)
        if spread > drift_cap:
            sq = prev["queries"]
            lifted = {q: max(s, sq[q]) for q, s in anchor["queries"].items()
                      if q in sq and sq[q] > s}
            if lifted:
                anchor = dict(anchor)
                anchor["queries"] = {**anchor["queries"], **lifted}
                print(f"== anchor {anchor_name} intra-run sentinel spread "
                      f"{spread:.1f}x exceeds the {drift_cap}x cap — "
                      f"{len(lifted)} fast-phase bases lifted to the "
                      f"stepwise baseline's floor")
        print(f"== close-out guard (round anchor): {anchor_name} -> {curr_path}")
        n, un = check_breaches(anchor, curr, anchor_name, factor, min_secs,
                               explained, exp_path, drift_cap)
        total_breaches += n
        unexplained += un

    # gate 3: absolute ceiling — every query, not just regressions
    over = sorted(((q, s) for q, s in curr["queries"].items() if s > ceiling),
                  key=lambda x: -x[1])
    for q, s in over:
        e = explained.get(q)
        if e and e.get("ceiling"):
            print(f"WAIVED {q}: {s:.2f}s over {ceiling:.0f}s ceiling — "
                  f"{e['ceiling']}")
        else:
            print(f"FAIL {q}: {s:.2f}s exceeds the {ceiling:.0f}s per-query "
                  f"ceiling — no 'ceiling' waiver in explained.json")
            unexplained.append(q)
    print(f"== ceiling check: {len(over)} of {len(curr['queries'])} queries "
          f"above {ceiling:.0f}s")

    unexplained = sorted(set(unexplained))
    if unexplained:
        print(f"\n== ROUND SUMMARY REFUSED: {len(unexplained)} unexplained "
              f"breach(es): {', '.join(unexplained)}")
        print(f"Reclaim each, or commit an A/B note to {exp_path} "
              f"naming the exact baseline (or a 'ceiling' waiver).")
        return 1
    print(f"== close-out clean: {total_breaches} budget breach(es) + "
          f"{len(over)} ceiling exceedance(s), all explained"
          if total_breaches or over else "== close-out clean: no breaches")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
