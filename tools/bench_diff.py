#!/usr/bin/env python3
"""Mechanical bench regression gate (VERDICT r12 #6).

Compares two BENCH_FULL.tsv tables (name\tseconds[\tFAILED] rows) and
FAILS (exit 1) on any per-query regression worse than RATIO x that also
lands above FLOOR seconds — the filter that would have auto-flagged the
r12 join_shuffle_hash 1.8x drift while ignoring sub-second rerun noise.

Usage:
  tools/bench_diff.py                     # old = git HEAD's committed table,
                                          # new = ./BENCH_FULL.tsv
  tools/bench_diff.py OLD.tsv NEW.tsv     # explicit files
  tools/bench_diff.py --ratio 2.0 --floor 1.0

Also reports added/removed queries (informational) and the common-subset
total delta. Run it as part of the end-of-round checklist AFTER the
driver-scale bench, BEFORE committing the new BENCH_FULL.tsv.

Calibration normalization (VERDICT r15 #1): Bench writes fixed-work
`_calib_compute` / `_calib_scan` control rows (min-of-3, min of pre/post
sweep) to the same table. When BOTH tables carry them, every new time is
divided by the measured container ratio (geometric mean of the per-kind
calib ratios) before the regression gate — so a 1.7x-slower container
doesn't read as 380 phantom per-query regressions, while a genuine plan
regression still trips the gate because the calib rows didn't move.
--raw restores gating on unnormalized times. The driver's contract total
stays the raw number either way — this is attribution, not excuse
manufacturing; the raw common-subset total is always printed.
"""
import argparse
import subprocess
import sys

# Contract gate anchor (VERDICT r17 #1b ruling): the r16 driver sweep is
# the first calib-bearing anchor — BENCH_r16.json, 653.038 s / 389
# queries at calib compute 0.210 / scan 0.200 (local[32], sf0.1). The
# BENCH_r04 number (125.7 s / 133 q) predates the calibration controls
# and can never be normalized; it stays in BASELINE.md as history. The
# gate divides the new table's per-query rate by the measured container
# ratio (geomean of per-kind calib ratios, CLAMPED at 1.0 — the r17
# faster-box rule: normalization may excuse a slower container, never
# demand proportional speedups from a faster one) and fails above
# --anchor-ratio (default 2.0, the original contract multiplier).
ANCHOR = {
    "name": "BENCH_r16 (driver, sf0.1, local[32])",
    "total": 653.038, "n_queries": 389,
    "calib_compute": 0.210, "calib_scan": 0.200, "sf": "0.1",
}


def load(text):
    out = {}
    for line in text.splitlines():
        parts = line.rstrip("\n").split("\t")
        if len(parts) >= 2:
            try:
                out[parts[0]] = (float(parts[1]), len(parts) > 2)
            except ValueError:
                pass
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old", nargs="?", default=None,
                    help="old table (default: git show HEAD:BENCH_FULL.tsv)")
    ap.add_argument("new", nargs="?", default="BENCH_FULL.tsv")
    ap.add_argument("--ratio", type=float, default=2.0,
                    help="fail when new > ratio * old (default 2.0)")
    ap.add_argument("--floor", type=float, default=1.0,
                    help="ignore regressions whose new time <= floor sec")
    ap.add_argument("--raw", action="store_true",
                    help="gate on raw times even when calib rows exist")
    ap.add_argument("--anchor-ratio", type=float, default=2.0,
                    help="fail when the calib-normalized per-query rate "
                         "exceeds this multiple of the anchor rate")
    ap.add_argument("--no-anchor", action="store_true",
                    help="skip the contract-anchor rate gate")
    args = ap.parse_args()

    if args.old is None:
        try:
            old_text = subprocess.run(
                ["git", "show", "HEAD:BENCH_FULL.tsv"],
                capture_output=True, text=True, check=True).stdout
            old_name = "HEAD:BENCH_FULL.tsv"
        except subprocess.CalledProcessError:
            print("no committed BENCH_FULL.tsv at HEAD - nothing to diff")
            return 0
    else:
        old_text = open(args.old).read()
        old_name = args.old
    new_text = open(args.new).read()

    old_all = load(old_text)
    new_all = load(new_text)
    # cross-scale guard: comparing an sf0.001 smoke table against an
    # sf0.1 table reads as hundreds of phantom regressions (this exact
    # clobber shipped in r16 before the guard) - refuse outright
    sf_old = old_all.pop("_sf", None)
    sf_new = new_all.pop("_sf", None)
    if sf_old and sf_new and sf_old[0] != sf_new[0]:
        print(f"ERROR: tables are from different scale factors "
              f"(old sf={sf_old[0]:g}, new sf={sf_new[0]:g}) - not comparable")
        return 1
    # underscore-prefixed rows are controls, not queries (_calib_* =
    # fixed-work calibration, _phase_* = lifecycle-row phase splits):
    # pull them out before any added/removed/common accounting
    old = {k: v for k, v in old_all.items() if not k.startswith("_")}
    new = {k: v for k, v in new_all.items() if not k.startswith("_")}
    calib_ratio = 1.0
    calib_note = "no calib rows in both tables - ratios are raw"
    kinds = [k for k in ("_calib_compute", "_calib_scan")
             if k in old_all and k in new_all
             and old_all[k][0] > 0 and new_all[k][0] > 0]
    if kinds:
        import math
        per_kind = {k: new_all[k][0] / old_all[k][0] for k in kinds}
        calib_ratio = math.exp(sum(math.log(r) for r in per_kind.values())
                               / len(per_kind))
        # kind-specific drift breaks the blended mean's attribution
        # (ADVICE r16): a pure-scan query normalized by a compute-driven
        # factor over/under-states its regression. When the per-kind
        # ratios diverge beyond 1.3x, gate with the CONSERVATIVE (least
        # excusing) ratio instead of the geomean and say so - a real
        # regression still trips, and the printed divergence tells the
        # reader which kind moved.
        divergent = (len(per_kind) > 1 and
                     max(per_kind.values()) > 1.3 * min(per_kind.values()))
        if divergent:
            calib_ratio = min(per_kind.values())
        # Normalization may only EXCUSE a slower container, never demand
        # proportional speedups from a faster one: per-row costs are not
        # linear in calib (fixed micro-batch/codegen/IO overheads), so
        # dividing by a <1 ratio flags every overhead-bound row as a
        # phantom normalized regression (observed: 164 flags on a 2.3x
        # FASTER box with raw times all improved). Clamp the gating
        # ratio at 1.0; a sub-1 measured ratio is still printed, with
        # the masking caveat it implies (a real plan regression smaller
        # than the container speedup hides in raw times - accepted, the
        # next same-speed container exposes it).
        faster_box = calib_ratio < 1.0
        raw_ratio = calib_ratio
        calib_ratio = max(1.0, calib_ratio)
        calib_note = ("container calib ratio %.2fx%s%s (%s)" % (
            raw_ratio,
            " [per-kind ratios diverge >1.3x - using conservative min,"
            " not geomean]" if divergent else "",
            " [new container FASTER - gating on raw times; regressions"
            " below the speedup factor may be masked]" if faster_box
            else "",
            ", ".join(f"{k.removeprefix('_calib_')} {r:.2f}x"
                      for k, r in per_kind.items())))
        spread = [(k, new_all[f"{k}_pre"][0], new_all[f"{k}_post"][0])
                  for k in kinds
                  if f"{k}_pre" in new_all and f"{k}_post" in new_all]
        for k, pre, post in spread:
            if max(pre, post) > 1.5 * min(pre, post):
                calib_note += (f"; DRIFT WINDOW: {k} pre {pre:.2f}s vs "
                               f"post {post:.2f}s")
    normalize = bool(kinds) and not args.raw
    print(calib_note + (" - gating on calib-normalized times"
                        if normalize else ""))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    common = sorted(set(old) & set(new))
    if added:
        print(f"added ({len(added)}): {', '.join(added[:10])}"
              + (" ..." if len(added) > 10 else ""))
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed[:10])}"
              + (" ..." if len(removed) > 10 else ""))

    regressions = []
    failures = []
    for name in common:
        (t_old, old_failed), (t_new, failed) = old[name], new[name]
        if failed:
            failures.append(name)
        # an old FAILED row timed an exception, not the query - using it
        # as a ratio baseline would flag the honest fixed run as a
        # phantom regression
        if old_failed or failed:
            continue
        t_gate = t_new / calib_ratio if normalize else t_new
        if t_gate > args.ratio * t_old and t_gate > args.floor:
            regressions.append((name, t_old, t_new, t_gate))
    tot_old = sum(old[n][0] for n in common)
    tot_new = sum(new[n][0] for n in common)
    print(f"common subset: {len(common)} queries, "
          f"{tot_old:.1f}s ({old_name}) -> {tot_new:.1f}s raw "
          f"({tot_new / tot_old:.2f}x raw, "
          f"{tot_new / calib_ratio / tot_old:.2f}x calib-normalized)"
          if tot_old else "no common queries")

    # Contract-anchor rate gate (VERDICT r17 #1b): new table's per-query
    # rate vs the calib-bearing r16 anchor, normalized by the measured
    # container ratio (clamped at 1.0). Runs only on same-sf tables with
    # calib rows — a smoke-sf table or a calib-less table can't speak to
    # the contract.
    anchor_fail = False
    if not args.no_anchor:
        if sf_new and sf_new[0] != float(ANCHOR["sf"]):
            print(f"anchor gate: skipped (table sf={sf_new[0]:g}, "
                  f"anchor sf={ANCHOR['sf']})")
        elif new and all(f"_calib_{k}" in new_all and new_all[f"_calib_{k}"][0] > 0
                         for k in ("compute", "scan")):
            import math
            per_kind = {k: new_all[f"_calib_{k}"][0] / ANCHOR[f"calib_{k}"]
                        for k in ("compute", "scan")}
            a_ratio = math.exp(sum(math.log(r) for r in per_kind.values())
                               / len(per_kind))
            if max(per_kind.values()) > 1.3 * min(per_kind.values()):
                a_ratio = min(per_kind.values())
            a_ratio = max(1.0, a_ratio)
            rate_new = sum(v[0] for v in new.values()) / len(new)
            rate_anchor = ANCHOR["total"] / ANCHOR["n_queries"]
            gate_rate = rate_new / a_ratio
            verdict_ratio = gate_rate / rate_anchor
            print(f"anchor gate vs {ANCHOR['name']}: "
                  f"{rate_new:.3f} s/q raw over {len(new)} queries, "
                  f"container ratio {a_ratio:.2f}x -> {gate_rate:.3f} s/q "
                  f"normalized = {verdict_ratio:.2f}x anchor rate "
                  f"({rate_anchor:.3f} s/q); limit {args.anchor_ratio:.1f}x")
            if verdict_ratio > args.anchor_ratio:
                anchor_fail = True
        else:
            print("anchor gate: skipped (no positive calib rows in new table)")

    for name, t_old, t_new, t_gate in sorted(
            regressions, key=lambda r: -r[3] / r[1]):
        print(f"REGRESSION {name}: {t_old:.2f}s -> {t_new:.2f}s raw / "
              f"{t_gate:.2f}s normalized ({t_gate / t_old:.1f}x)")
    for name in failures:
        print(f"FAILED {name}")
    if regressions or failures or anchor_fail:
        print(f"\n{len(regressions)} regression(s) > {args.ratio}x above "
              f"{args.floor}s, {len(failures)} failure(s)"
              + (", ANCHOR GATE EXCEEDED" if anchor_fail else ""))
        return 1
    print(f"no regressions > {args.ratio}x above {args.floor}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
