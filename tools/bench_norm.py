"""Rebuild BENCH_NORM.json — the round-over-round NORMALIZED bench record
(VERDICT r11 #3 / r10 #6).

Problem: the driver's per-round BENCH_r{N}.json captures RAW wall clock
under whatever hypervisor weather the round got; the contention-corrected
comparison (host_cal normalization) lived only in BASELINE.md prose and
ad-hoc sidecars, so every round-over-round claim re-litigated the weather.
This tool makes the normalized series a first-class, regenerable artifact:

    python tools/bench_norm.py        # writes BENCH_NORM.json

Sources (all committed):
- BENCH_r*.json      driver-recorded stdout payload per round ("parsed")
- BENCH_RUN_LAST.json  the most recent local run (healthy flag included)
- BENCH_LOCAL.json   the quiet-window per-query minima store (min-merge
                     rule: only healthy-calibration runs persist), whose
                     ref_commit is the provenance for per-query entries

Methodology (same arithmetic bench.py applies at run time):
  factor = min(1, ref_single/obs_single, ref_par/obs_par), capped at 1x —
  normalization corrects a stolen window, never awards bonus speed.
  norm_total = raw_total * factor. Rounds before the calibration machinery
  (r1-r5) carry raw-only entries: no modeled numbers without evidence.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _factor(host_cal, ref) -> float | None:
    """Best-single-window capped factor (VERDICT r12 #1): the artifact's
    totals are per-query MINIMA across passes, so the least-contended
    calibration window bounds the legitimate correction — averaging both
    windows double-corrects when one pass was badly stolen (r12's own
    host_cal_norm_total field, 96.4s, is that artifact; ignore it)."""
    if not host_cal or not ref:
        return None
    return min(
        1.0,
        max(
            min(1.0, ref[0] / max(s, 1e-9), ref[1] / max(p, 1e-9))
            for s, p in host_cal
        ),
    )


def build() -> dict:
    rounds = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        # full suffix as the tag: BENCH_r14_c8.json (the driver's low-core
        # scaling run) must not overwrite the r14 main-run row
        tag = re.search(r"(r\d+(?:_[a-z0-9]+)?)", os.path.basename(path)).group(1)
        try:
            p = (json.load(open(path)) or {}).get("parsed")
        except Exception:
            p = None
        if not p or p.get("value") is None:
            rounds[tag] = {"raw_total_s": None, "note": "artifact unparsed/truncated"}
            continue
        raw, nq = p["value"], p.get("n_queries")
        f = _factor(p.get("host_cal"), p.get("host_cal_ref"))
        # recompute from host_cal with the best-window form rather than
        # trusting the artifact's host_cal_norm_total (pre-r13 bench.py
        # stamped the averaged-window form, which overcorrects min-of-N)
        norm = round(raw * f, 3) if f is not None else p.get("host_cal_norm_total")
        rounds[tag] = {
            "raw_total_s": raw,
            "n_queries": nq,
            "raw_s_per_query": round(raw / nq, 4) if nq else None,
            "host_cal": p.get("host_cal"),
            "host_cal_ref": p.get("host_cal_ref"),
            "norm_factor": round(f, 4) if f is not None else None,
            "norm_total_s": norm,
            "norm_s_per_query": round(norm / nq, 4) if (norm and nq) else None,
            "source": os.path.basename(path),
        }
    per_query = {}
    prov = None
    local_path = os.path.join(REPO, "BENCH_LOCAL.json")
    if os.path.exists(local_path):
        local = json.load(open(local_path))
        try:
            commit = subprocess.run(
                ["git", "-C", REPO, "log", "-n", "1", "--format=%h", "--", "BENCH_LOCAL.json"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip() or None
        except Exception:
            commit = None
        prov = {
            "source": "BENCH_LOCAL.json",
            "commit": commit,
            "host_cal_ref": local.get("host_cal_ref"),
            "rule": "min across healthy-calibration runs only (factor >= 0.85); "
                    "impl-hash-keyed so a rewritten query restarts its minimum",
        }
        per_query = {k: round(v, 3) for k, v in sorted(local.get("queries", {}).items())}
    return {
        "doc": "Round-over-round bench record normalized for hypervisor contention; "
               "methodology in BASELINE.md ('Normalized bench record'). Regenerate "
               "with: python tools/bench_norm.py",
        "normalization": "norm_total = raw_total * min(1, ref_single/obs_single, "
                         "ref_par/obs_par); host_cal_ref = quietest window observed "
                         "on this host; capped at 1x",
        "rounds": rounds,
        "per_query_quiet_minima": {"provenance": prov, "seconds": per_query},
    }


if __name__ == "__main__":
    out = build()
    with open(os.path.join(REPO, "BENCH_NORM.json"), "w") as f:
        json.dump(out, f, indent=1)
    rs = {t: (r.get("raw_total_s"), r.get("norm_total_s"), r.get("n_queries"))
          for t, r in out["rounds"].items()}
    print(json.dumps(rs, indent=0))
    print(f"per-query quiet minima: {len(out['per_query_quiet_minima']['seconds'])}")
