#!/usr/bin/env python3
"""Mechanical bench-delta classifier: plan change vs box noise.

Compares two bench artifacts (the full JSON graft.Bench writes to
bench_out.json) per query. A time delta only matters if either
(a) the physical-plan fingerprint changed — a real plan difference —
or (b) the ratio exceeds the noise band with the SAME fingerprint
AND survives the absolute floor (sub-0.1 s deltas on this box are
pure jitter; the measured noise band is ±20–30 %, see SCALE.md).
Fingerprints are comparable only within one SF (scan paths and
stats-dependent choices legitimately differ across SFs).

Usage: tools/bench_diff.py <old_bench.json> <new_bench.json>
       [--band 1.35] [--floor 0.25]

Exit code: 0 always (a report, not a gate) — the CLASSIFICATION is
the output; feed `plan_changed` rows to plan review and ignore
`noise` rows instead of re-flagging them round after round.
"""
import argparse, json, sys


def load(path):
    """Accept either the full graft.Bench artifact (has `queries`) or a
    driver BENCH_r{N}.json wrapper, whose `tail` holds a (possibly
    truncated) fragment of the bench stdout line — recover what query
    times survive in the fragment via regex."""
    import re
    with open(path) as f:
        d = json.load(f)
    # a driver wrapper whose `parsed` holds the full bench line is the
    # lossless path — prefer it over regex tail recovery
    if "queries" not in d and isinstance(d.get("parsed"), dict) \
            and "queries" in d["parsed"]:
        d = d["parsed"]
    if "queries" not in d and isinstance(d.get("tail"), str):
        qs = {}
        # a time is either a %.3f float or the bare failure sentinel -1
        # (never a bare positive int — those are rerun counts, which this
        # pattern therefore cannot match); first match wins by position
        for m in re.finditer(r'"(q[^"]+)":(-1\b|[0-9]+\.[0-9]+)', d["tail"]):
            qs.setdefault(m.group(1), float(m.group(2)))
        fps = {m.group(1): m.group(2) for m in
               re.finditer(r'"(q[^"]+)":"([0-9a-f]{8,12})"', d["tail"])}
        d = {"queries": qs, "plan_fp": fps, "sf": str(d.get("sf", "?"))}
    # Key spellings differ by artifact generation: driver wrappers carry
    # short ids (q12), the full bench artifact full names
    # (q12_lineitem_agg). Normalize both to the short id so cross-form
    # diffs (BENCH_r{N}.json vs committed bench_out.json) line up.
    def short(name):
        return name.split("_", 1)[0]
    for key in ("queries", "plan_fp"):
        if key in d and isinstance(d[key], dict):
            m = {}
            for k, v in d[key].items():
                m[short(k)] = v
            if len(m) == len(d[key]):  # collision-free: safe to normalize
                d[key] = m
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--band", type=float, default=1.35,
                    help="same-plan ratio above this is flagged (default 1.35)")
    ap.add_argument("--floor", type=float, default=0.25,
                    help="absolute delta (s) below this is never flagged")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    # normalize "0.1" vs "/root/testdata/sf0.1" spellings before warning
    def sfkey(v):
        s = str(v)
        return s.rsplit("sf", 1)[-1] if "sf" in s else s
    if sfkey(old.get("sf")) != sfkey(new.get("sf")):
        print(f"WARNING: different SFs ({old.get('sf')} vs {new.get('sf')}) — "
              "fingerprints are NOT comparable across SFs; "
              "time ratios reflect data size, not regressions.")
    oq, nq = old["queries"], new["queries"]
    ofp, nfp = old.get("plan_fp", {}), new.get("plan_fp", {})

    rows = []
    for q in sorted(set(oq) & set(nq)):
        t0, t1 = oq[q], nq[q]
        # Bench records -1 for a failed query — a status, not a time.
        # Distinguish a NEW breakage from a long-standing one so known
        # failures stop re-reading as regressions every diff.
        if t0 < 0 or t1 < 0:
            cls = ("still-failed" if t0 < 0 and t1 < 0
                   else "FAILED(new)" if t1 < 0 else "recovered")
            rows.append((q, t0, t1, float("nan"), cls))
            continue
        ratio = t1 / t0 if t0 > 0 else float("inf")
        fp_changed = q in ofp and q in nfp and ofp[q] != nfp[q]
        if fp_changed:
            cls = "plan_changed"
        elif abs(t1 - t0) < args.floor:
            cls = "ok"
        elif ratio > args.band or ratio < 1 / args.band:
            cls = "noise?"  # same plan, outside band: rerun before believing
        else:
            cls = "ok"
        rows.append((q, t0, t1, ratio, cls))

    flagged = [r for r in rows if r[4] != "ok"]
    for q, t0, t1, ratio, cls in flagged:
        print(f"{cls:13s} {q:32s} {t0:7.3f}s -> {t1:7.3f}s  ({ratio:5.2f}x)")
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print("removed:", ", ".join(only_old))
    if only_new:
        print("added:  ", ", ".join(only_new))
    timed = [q for q in set(oq) & set(nq) if oq[q] >= 0 and nq[q] >= 0]
    tot0 = sum(oq[q] for q in timed)
    tot1 = sum(nq[q] for q in timed)
    if not timed or tot0 == 0:
        print("no timed queries in common — nothing to compare")
        return
    print(f"comparable subset: {len(timed)} queries, "
          f"{tot0:.1f}s -> {tot1:.1f}s ({tot1 / tot0:.2f}x); "
          f"{len([r for r in rows if r[4] == 'plan_changed'])} plan-changed, "
          f"{len([r for r in rows if r[4] == 'noise?'])} same-plan outliers "
          f"(rerun via graft.TimeTool before acting — SCALE.md noise band)")


if __name__ == "__main__":
    main()
