#!/usr/bin/env python3
"""Round-over-round bench regression report.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [threshold]

Compares the per-query maps of two bench snapshots (BENCH_LOCAL_r*.json
/ bench_full.json format) and reports entries slower than `threshold`x
(default 2.0), plus added/removed entries and headline movement.
Exit code 1 if any entry regressed past the threshold — usable as a
gate. Times under 0.3 s are floor-dominated noise and are skipped.

Contention gate: if either snapshot carries a `sentinel` block (the
fixed trivial probe Bench times throughout the run) and its spread
(max/min) is >= 2 — or is non-positive, which means the probe floor
collapsed to 0 or the block is malformed, either way not evidence of
a quiet host — the run was taken under external host load: the tool
reports the dirty sentinel and REFUSES to declare regressions.

Exit codes (for gate callers): 0 = clean diff, no regressions past
the threshold; 1 = at least one regression declared (both snapshots
had credible sentinels); 2 = refused to judge — a sentinel was dirty
or unreadable, so the diff says nothing about plans. Treat 2 as
"re-measure", not as "regressed".
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("queries", {}), float(d.get("value", -1)), d.get("sentinel")


def dirty(label, sentinel, limit=2.0):
    if not sentinel:
        return False  # pre-sentinel snapshot: nothing to gate on
    spread = float(sentinel.get("spread", -1))
    # spread <= 0 with a PRESENT sentinel block is never clean: Bench
    # emits spread=-1 when the probe floor collapsed to 0 (maximal
    # contention), and a block missing the key entirely is malformed —
    # recompute from min/max when possible rather than waving it through
    if spread <= 0:
        mn = float(sentinel.get("min", 0) or 0)
        mx = float(sentinel.get("max", -1) or -1)
        if mn > 0 and mx > 0:
            spread = mx / mn
        else:
            print(f"DIRTY {label}: sentinel block present but unreadable "
                  f"({sentinel}) — cannot certify a quiet host; not declaring regressions")
            return True
    if spread >= limit:
        print(f"DIRTY {label}: sentinel spread {spread:.2f}x "
              f"(min {sentinel.get('min')}s, max {sentinel.get('max')}s, "
              f"n {sentinel.get('n')}) — host was contended; not declaring regressions")
        return True
    return False


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    old, old_total, old_sent = load(old_path)
    new, new_total, new_sent = load(new_path)
    if dirty(old_path, old_sent) | dirty(new_path, new_sent):
        sys.exit(2)
    # spread only sees VARIANCE within a run; a uniformly loaded host
    # passes the spread gate with every number inflated. The sentinel
    # MIN is the machine's quiet floor — compare it across snapshots
    # and annotate (not refuse: a >25% floor shift means totals are
    # not comparable 1:1, but per-query ratios remain informative)
    if old_sent and new_sent:
        of, nf = float(old_sent.get("min", 0) or 0), float(new_sent.get("min", 0) or 0)
        if of > 0 and nf > 0 and max(of, nf) / min(of, nf) >= 1.25:
            print(f"FLOOR DRIFT: sentinel min {of}s -> {nf}s "
                  f"({nf / of:.2f}x) — the host's quiet floor moved between "
                  f"snapshots; interpret total deltas with that scale in mind")
    common = sorted(set(old) & set(new))
    regressed = []
    for name in common:
        a, b = old[name], new[name]
        if a <= 0 or b <= 0:
            continue  # failed entries are reported by the bench itself
        if a < 0.3 and b < 0.3:
            continue  # both under the session-overhead floor
        if b / a >= threshold:
            regressed.append((name, a, b, b / a))
    for name, a, b, r in sorted(regressed, key=lambda x: -x[3]):
        print(f"REGRESSED {name}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    for name in sorted(set(new) - set(old)):
        print(f"ADDED {name}: {new[name]:.2f}s")
    for name in sorted(set(old) - set(new)):
        print(f"REMOVED {name}")
    if old_total > 0 and new_total > 0:
        print(f"headline: {old_total:.2f}s -> {new_total:.2f}s "
              f"({new_total / old_total:.2f}x, {len(old)} -> {len(new)} entries)")
    print(f"{len(regressed)} regressions >= {threshold}x over {len(common)} common entries")
    sys.exit(1 if regressed else 0)


if __name__ == "__main__":
    main()
