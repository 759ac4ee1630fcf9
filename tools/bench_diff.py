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
"""
import argparse
import subprocess
import sys


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

    old = load(old_text)
    new = load(new_text)
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
        if t_new > args.ratio * t_old and t_new > args.floor:
            regressions.append((name, t_old, t_new))
    tot_old = sum(old[n][0] for n in common)
    tot_new = sum(new[n][0] for n in common)
    print(f"common subset: {len(common)} queries, "
          f"{tot_old:.1f}s ({old_name}) -> {tot_new:.1f}s "
          f"({tot_new / tot_old:.2f}x)" if tot_old else "no common queries")

    for name, t_old, t_new in sorted(regressions, key=lambda r: -r[2] / r[1]):
        print(f"REGRESSION {name}: {t_old:.2f}s -> {t_new:.2f}s "
              f"({t_new / t_old:.1f}x)")
    for name in failures:
        print(f"FAILED {name}")
    if regressions or failures:
        print(f"\n{len(regressions)} regression(s) > {args.ratio}x above "
              f"{args.floor}s, {len(failures)} failure(s)")
        return 1
    print(f"no regressions > {args.ratio}x above {args.floor}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
