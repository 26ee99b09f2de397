"""Cross-round bench triage: medians vs noise bands, mechanized.

Implements the v6 methodology's regression rule (SURVEY §2J.3 / r7
verdict What's-wrong #1): a section has REGRESSED only when its new
MEDIAN falls outside the old run's min..max band (and vice versa for
IMPROVED); anything inside either band is NOISE on this host. Older
payloads without a ``dispersion`` block fall back to point numbers
with an explicit "no band — point compare only" caveat.

Usage: python tools/bench_compare.py OLD.json NEW.json [top_n]
"""

from __future__ import annotations

import json
import sys

# (label, dispersion key, higher_is_better)
SECTIONS = (
    ("query sweep (s)", "sweep_total_sec", False),
    ("fhir (rec/s)", "fhir_rec_per_sec", True),
    ("streaming (ev/s)", "streaming_ev_per_sec", True),
    ("streaming default (ev/s)", "streaming_default_ev_per_sec", True),
    ("streaming tuned (ev/s)", "streaming_tuned_ev_per_sec", True),
    ("shards (docs/s)", "shards_docs_per_sec", True),
)

# dispersion keys absent from pre-v7.1 payloads fall back to the
# section's point value (r9 verdict ask #6: the raw session-default
# drain — the naive-user path — had no triage row; through v7 it was
# a ONE-SHOT number, so old payloads can only contribute a
# zero-width "band")
POINT_FALLBACK = {
    "streaming_default_ev_per_sec": (
        "streaming",
        "streaming_events_per_sec_default_basis",
    ),
    # tuned drain was one-shot through v7.1 (banded per-rep in v7.2,
    # r10 verdict ask #4)
    "streaming_tuned_ev_per_sec": (
        "streaming",
        "streaming_events_per_sec_tuned_basis",
    ),
}


def _band(payload: dict, key: str):
    d = (payload.get("dispersion") or {}).get(key)
    if d:
        return d, False
    if key in POINT_FALLBACK:
        sec, k = POINT_FALLBACK[key]
        v = (payload.get(sec) or {}).get(k)
        if v is not None:
            return {"median": v, "min": v, "max": v}, True
    return None, False


def verdict(old: dict | None, new: dict | None, higher_better: bool) -> str:
    if not old or not new:
        return "no band — point compare only"
    worse = (
        new["median"] < old["min"] if higher_better else new["median"] > old["max"]
    )
    better = (
        new["median"] > old["max"] if higher_better else new["median"] < old["min"]
    )
    if worse:
        return "REGRESSION (new median outside old band)"
    if better:
        return "improved (new median outside old band)"
    return "noise (medians inside bands)"


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    old = json.load(open(old_path))
    new = json.load(open(new_path))

    print(f"# {old_path} -> {new_path}")
    vo = (old.get("methodology") or {}).get("version")
    vn = (new.get("methodology") or {}).get("version")
    if vo != vn:
        print(
            f"NOTE: methodology v{vo} -> v{vn} — bands may not be "
            f"like-for-like (v7 warms all sections before rep 1, so "
            f"v6 bands are cold-inflated; a v7 median inside a v6 "
            f"band is weak evidence of 'no change')"
        )
    for label, key, hib in SECTIONS:
        o, o_pt = _band(old, key)
        n, n_pt = _band(new, key)
        caveat = " [point fallback: one-shot value, zero-width band]" \
            if (o_pt or n_pt) else ""
        if o and n:
            print(
                f"{label:25s} median {o['median']:>9} -> {n['median']:>9}  "
                f"bands [{o['min']}..{o['max']}] / [{n['min']}..{n['max']}]  "
                f"=> {verdict(o, n, hib)}{caveat}"
            )
        else:
            print(f"{label:25s} {verdict(o, n, hib)}{caveat}")

    qo, qn = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(qo) & set(qn), key=lambda k: qn[k] - qo[k])
    added = sorted(set(qn) - set(qo))
    if common:
        print(f"\nper-query min deltas (common {len(common)}; +new is slower):")
        worst = [k for k in reversed(common[-top_n:])]
        best = common[:3]
        for k in worst:
            print(f"  {k:32s} {qo[k]:6.2f} -> {qn[k]:6.2f}  ({qn[k]-qo[k]:+.2f}s)")
        print("  ...")
        for k in best:
            print(f"  {k:32s} {qo[k]:6.2f} -> {qn[k]:6.2f}  ({qn[k]-qo[k]:+.2f}s)")
        tot_o = sum(qo[k] for k in common)
        tot_n = sum(qn[k] for k in common)
        print(f"  common-query total: {tot_o:.1f}s -> {tot_n:.1f}s")
    if added:
        print(
            f"first-time queries (+{sum(qn[k] for k in added):.1f}s): "
            + ", ".join(added)
        )


if __name__ == "__main__":
    main()
