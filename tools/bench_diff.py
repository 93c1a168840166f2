"""Per-entry bench diff with the measured noise band built in.

Raw BENCH totals are a BAND, not a point: three same-code ISOLATED r13
runs read 277.2 / 253.4 / 232.9 s (OS page-cache state dominates), and
the per-entry figure's run-to-run band is ~25% on >2 s entries. Diffing
two artifacts by eyeballing totals therefore manufactures phantom
regressions — this tool does the comparison the round logs prescribe:
per-entry headline figures (min-of-k since r13, medians in r12),
classified against the noise band, slowest regressions first, with the
sentinel/contamination context of each run printed alongside.

Accepts both artifact shapes:
  * the full one-line JSON that bench.py prints (local runs), and
  * the driver's BENCH_rN.json wrapper, which keeps only a ~2000-char
    TAIL fragment of that line — the tool recovers the tail_* headline
    scalars (the truncation-proofing guarantees they survive) plus any
    per-entry figures/samples visible in the fragment, and reports the
    recovered coverage so a fragment diff is never mistaken for a full
    one.

Usage: python tools/bench_diff.py NEW.json OLD.json [noise_band]
  noise_band: relative band treated as noise on >=1 s entries
  (default 0.25, the measured r13 cross-run band).
"""

from __future__ import annotations

import json
import re
import sys

# a JSON float after a quoted key, or a short list of them (a samples row)
_PAIR = re.compile(r'"([A-Za-z_][\w]*)":\s*(\d+(?:\.\d+)?)(?=[,}])')
_SAMPLES = re.compile(r'"([A-Za-z_][\w]*)":\s*\[([0-9.,\s]+)\]')
_SCALARS = (
    "tail_total_sec",
    "tail_n_queries",
    "tail_n_errors",
    "tail_sentinel_max_over_median",
    "tail_sentinel_p90_over_median",
    "tail_sentinel_final_over_median",
    "value",
    "first_pass_total_sec",
    "median_blended_total_sec",
    "sentinel_max_over_median",
    "sentinel_p90_over_median",
    "sentinel_final_over_median",
    "loadavg_1m",
)
# head-of-artifact numeric keys that are NOT per-entry query figures (r14
# ADVICE: a fragment spanning the artifact HEAD instead of the tail would
# otherwise misread these as query entries); sentinel_series is a list the
# samples regex would also swallow
_NON_QUERY = frozenset(_SCALARS) | {
    "n_queries",
    "n_errors",
    "sampled_entries_n",
    "heavy_samples_k",
    "noise_rel_spread_median",
    "noise_rel_spread_max",
    "sf",
    "sentinel_series",
}
# the contamination verdict is a JSON bool/null, not a number — recover it
# from the fragment separately (r13 ADVICE: a fragment must be able to
# prove its own pass was clean)
_CONTAMINATED = re.compile(r'"(?:tail_)?sentinel_contaminated":\s*(true|false|null)')


def _collapse_mirrors(scalars: dict) -> dict:
    """One canonical key per mirrored sentinel scalar (r14 ADVICE): a full
    artifact carries both sentinel_x and tail_sentinel_x with the same
    value, which printed twice — prefer the non-tail key, keep the tail
    one (renamed) only when the head copy is missing (tail fragments)."""
    out = {}
    for k, v in scalars.items():
        if k.startswith("tail_sentinel_"):
            base = k[len("tail_") :]
            if base not in scalars:
                out[base] = v
        else:
            out[k] = v
    return out


def load(path: str) -> dict:
    """Return {queries, scalars, coverage, sentinel} from either shape."""
    raw = json.load(open(path))
    if "tail" in raw and "queries" not in raw:  # driver wrapper
        frag = raw.get("tail") or ""
        scalars = {}
        queries: dict[str, float] = {}
        for name, nums in _SAMPLES.findall(frag):
            if name in _NON_QUERY:  # e.g. a head fragment's sentinel_series
                continue
            draws = [float(x) for x in nums.split(",") if x.strip()]
            if draws:
                queries[name] = min(draws)  # the r13 headline estimator
        for name, num in _PAIR.findall(frag):
            if name in _SCALARS:
                scalars[name] = float(num)
            elif name in _NON_QUERY:
                continue  # head-of-artifact scalar, not a query figure
            else:
                # a bare per-entry figure from whichever map the fragment
                # caught; keep the SMALLEST occurrence regardless of key
                # order (first_pass >= min; the headline estimator is min)
                v = float(num)
                queries[name] = min(v, queries.get(name, v))
        verdicts = _CONTAMINATED.findall(frag)
        contaminated = (
            None
            if not verdicts or verdicts[-1] == "null"
            else verdicts[-1] == "true"
        )
        return {
            "queries": queries,
            "scalars": _collapse_mirrors(scalars),
            "coverage": f"FRAGMENT ({len(queries)} entries recovered)",
            "contaminated": contaminated,
        }
    contaminated = raw.get("sentinel_contaminated")
    if contaminated is None:
        contaminated = raw.get("tail_sentinel_contaminated")
    return {
        "queries": dict(raw.get("queries", {})),
        "scalars": _collapse_mirrors({k: raw[k] for k in _SCALARS if k in raw}),
        "coverage": f"full ({len(raw.get('queries', {}))} entries)",
        "contaminated": contaminated,
    }


def diff(new: dict, old: dict, band: float) -> dict:
    qn, qo = new["queries"], old["queries"]
    common = sorted(set(qn) & set(qo))
    rows = []
    for name in common:
        a, b = qo[name], qn[name]
        base = max(a, 1e-9)
        rel = (b - a) / base
        # sub-second entries drift by milliseconds that read as huge
        # percentages; classify them by absolute drift instead
        noisy = abs(rel) <= band if a >= 1.0 else abs(b - a) <= 0.5
        rows.append({"entry": name, "old": a, "new": b, "rel": rel, "noise": noisy})
    regressions = sorted(
        (r for r in rows if not r["noise"] and r["rel"] > 0),
        key=lambda r: -(r["new"] - r["old"]),
    )
    improvements = sorted(
        (r for r in rows if not r["noise"] and r["rel"] < 0),
        key=lambda r: r["new"] - r["old"],
    )
    return {
        "compared": len(common),
        "only_new": sorted(set(qn) - set(qo)),
        "only_old": sorted(set(qo) - set(qn)),
        "regressions": regressions,
        "improvements": improvements,
        "within_noise": sum(r["noise"] for r in rows),
    }


_ROUND = re.compile(r"BENCH_r(\d+)\.json$")


def orient(new_path: str, old_path: str) -> tuple[str, str, bool]:
    """Auto-orient a NEW OLD pair of driver artifacts (r15 VERDICT #7):
    an inverted call silently reads regressions as improvements — the
    output labels the files but nothing in it screams "swapped". When
    BOTH filenames carry the driver's _rNN round stamp, orientation is
    knowable: warn-and-swap if the first is the older round. Unstamped
    paths (local runs named freely) pass through untouched — the usage
    line stays the contract there."""
    mn, mo = _ROUND.search(new_path), _ROUND.search(old_path)
    if mn and mo and int(mn.group(1)) < int(mo.group(1)):
        print(
            f"WARNING: argument order is NEW OLD but r{mn.group(1)} predates "
            f"r{mo.group(1)} — swapping so the diff reads newest-vs-oldest"
        )
        return old_path, new_path, True
    return new_path, old_path, False


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    band = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    new_path, old_path, _ = orient(sys.argv[1], sys.argv[2])
    new, old = load(new_path), load(old_path)
    d = diff(new, old, band)
    print(f"new: {new_path} — {new['coverage']}, "
          f"contaminated={new['contaminated']}, scalars={new['scalars']}")
    print(f"old: {old_path} — {old['coverage']}, "
          f"contaminated={old['contaminated']}, scalars={old['scalars']}")
    print(f"\ncompared {d['compared']} common entries at noise band {band:.0%} "
          f"(abs 0.5s under 1s); {d['within_noise']} within noise")
    for label, names in (("new", d["only_new"]), ("old", d["only_old"])):
        if names:
            shown = ", ".join(names[:8])
            more = f" … +{len(names) - 8} more" if len(names) > 8 else ""
            print(f"only in {label} ({len(names)}): {shown}{more}")
    for title, rows in (("REGRESSIONS", d["regressions"]),
                        ("improvements", d["improvements"])):
        print(f"\n{title} ({len(rows)}):")
        for r in rows[:15]:
            print(f"  {r['entry']:<28} {r['old']:>8.3f} -> {r['new']:>8.3f} "
                  f"({r['rel']:+.0%})")
    if new["contaminated"] or old["contaminated"]:
        print("\nWARNING: a compared run is marked sentinel-contaminated — "
              "treat its figures as inflated, not regressed.")
        # r14 VERDICT #3: the p90/final ratios say WHICH KIND of
        # contamination — one transient spike (p90 near 1) leaves most
        # figures usable; sustained load (p90 also elevated) poisons all
        for label, run in (("new", new), ("old", old)):
            if not run["contaminated"]:
                continue
            p90 = run["scalars"].get("sentinel_p90_over_median")
            fin = run["scalars"].get("sentinel_final_over_median")
            if p90 is None:
                # absent ratios can mean an old artifact OR a fragment
                # whose truncation cut (or nulled) the pair — the tool
                # cannot tell vintage from absence, so it must not claim
                kind = ("no p90/final pair recovered (pre-r15 artifact, "
                        "or the fragment cut/nulled it)")
            elif p90 <= 1.5:
                kind = "TRANSIENT spike (p90/median near 1)"
            else:
                kind = "SUSTAINED load (p90/median also elevated)"
            print(f"  {label}: {kind} — p90/med={p90}, final/med={fin}")


if __name__ == "__main__":
    main()
