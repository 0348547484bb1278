"""Distribution-drift checks vs a baseline snapshot.

North rule: compare per-partition KLL-sketch quantiles of content length and
lang frequency vectors against a baseline snapshot (SURVEY.md §2.E). The
baseline is a tiny JSON artifact (quantiles + frequencies) written by a
previous run; drift is flagged when

* any tracked quantile of the length distribution moved by more than
  ``rel_tol`` relative, or
* the L1 distance between normalized frequency vectors exceeds ``freq_tol``
  (total variation distance * 2).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

from rayschema.sketches import KLL

# inner quantiles use the tight tolerance; the TAIL (q0.99) is compared too,
# but against its own wider tolerance — KLL tail-estimate variance across
# merge orders (k=400) would otherwise flag false drift on identical data,
# while a gross tail shift (e.g. a truncation-cap change) still trips it
QS = (0.1, 0.25, 0.5, 0.75, 0.9)
QS_TAIL = (0.99,)


def snapshot_from_stats(stats: Dict[str, dict], length_col: str,
                        freq_col: str,
                        per_partition: Optional[Dict] = None) -> Dict:
    """Build a drift baseline from a dataset_stats() result; ``per_partition``
    optionally maps partition_id -> KLL (or object with .quantile) for the
    north rule's per-partition quantile comparison."""
    qcol = stats.get(length_col, {})
    quant = qcol.get("quantiles") or {}
    freq = (stats.get(freq_col, {}) or {}).get("freq") or {}
    total = sum(freq.values()) or 1
    snap = {
        "length_col": length_col,
        "freq_col": freq_col,
        "quantiles": {str(q): quant.get(str(q)) for q in QS + QS_TAIL
                      if quant.get(str(q)) is not None},
        "freq": {k: v / total for k, v in freq.items()},
        "count": qcol.get("count", 0),
    }
    if per_partition:
        snap["per_partition"] = {
            str(pid): {str(q): kll.quantile(q) for q in QS + QS_TAIL}
            for pid, kll in per_partition.items() if getattr(kll, "n", 0) > 0
        }
    return snap


def _tol_for(q: str, rel_tol: float, tail_rel_tol: float) -> float:
    try:
        return tail_rel_tol if float(q) > 0.9 else rel_tol
    except ValueError:
        return rel_tol


def compare(baseline: Dict, current: Dict, rel_tol: float = 0.2,
            freq_tol: float = 0.1, tail_rel_tol: float = 0.5) -> Dict:
    """Drift verdict comparing two snapshots (same schema as
    snapshot_from_stats output). Tail quantiles (> 0.9) are held to
    ``tail_rel_tol`` — wide enough for KLL merge-order variance, tight
    enough to catch gross tail shifts."""
    flags = []
    qdrift = {}
    for q, b in (baseline.get("quantiles") or {}).items():
        c = (current.get("quantiles") or {}).get(q)
        if b is None or c is None or b == 0:
            continue
        rel = abs(c - b) / abs(b)
        qdrift[q] = round(rel, 4)
        if rel > _tol_for(q, rel_tol, tail_rel_tol):
            flags.append(f"quantile {q}: {b:.1f} -> {c:.1f} ({rel:+.1%})")
    bf = baseline.get("freq") or {}
    cf = current.get("freq") or {}
    keys = set(bf) | set(cf)
    l1 = sum(abs(bf.get(k, 0.0) - cf.get(k, 0.0)) for k in keys)
    if l1 > freq_tol:
        flags.append(f"freq L1 distance {l1:.3f} > {freq_tol}")
    # per-partition quantiles (only partitions present in BOTH snapshots)
    pp_drift = {}
    bpp = baseline.get("per_partition") or {}
    cpp = current.get("per_partition") or {}
    for pid in sorted(set(bpp) & set(cpp)):
        for q, bvq in bpp[pid].items():
            cvq = cpp[pid].get(q)
            if bvq in (None, 0) or cvq is None:
                continue
            rel = abs(cvq - bvq) / abs(bvq)
            if rel > _tol_for(q, rel_tol, tail_rel_tol):
                pp_drift.setdefault(pid, []).append(f"q{q}: {bvq:.1f}->{cvq:.1f}")
    if pp_drift:
        flags.append(f"per-partition drift in {len(pp_drift)} partition(s)")
    return {"drifted": bool(flags), "flags": flags,
            "quantile_rel_change": qdrift, "freq_l1": round(l1, 4),
            "per_partition_drift": pp_drift}


def load_baseline(path: str) -> Optional[Dict]:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def save_baseline(path: str, snap: Dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(snap, f, indent=1)
    os.replace(tmp, path)
