"""Per-column statistics: null fraction, min/max, HLL distinct counts, length
histograms, KLL quantiles, low-cardinality value frequencies.

Implemented as a Ray Data ``AggregateFn`` (SURVEY.md §2.E): the accumulator is
a small dict of mergeable states updated VECTORIZED per block (accumulate_block)
and tree-merged — the partial/combiner pattern, so the driver only ever sees
O(#partials) sketch bytes, never row data. At 100 TB this is the difference
between a metadata-sized reduce and an all-to-all shuffle.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayschema.sketches import KLL, HyperLogLog, hash64


class ColumnStats:
    """Mergeable per-column accumulator."""

    __slots__ = ("count", "nulls", "min", "max", "hll", "kll", "freq",
                 "len_hist", "len_edges")

    def __init__(self, hll_p: int = 12, kll_k: int = 400,
                 track_freq: bool = False,
                 len_edges: Optional[Sequence[float]] = None):
        self.count = 0
        self.nulls = 0
        self.min = None
        self.max = None
        self.hll = HyperLogLog(hll_p)
        # fixed seed: reproducible quantiles for identical single-stream runs
        # (merge order across actors can still perturb tail estimates — drift
        # comparison holds inner quantiles to rel_tol and q0.99 to the
        # wider tail tolerance, see drift.QS / QS_TAIL)
        self.kll = KLL(kll_k, seed=12345)
        self.freq: Optional[Counter] = Counter() if track_freq else None
        self.len_edges = np.asarray(
            len_edges if len_edges is not None
            else [0, 16, 64, 256, 1024, 4096, 16384, 65536, 1 << 40], dtype=np.float64)
        self.len_hist = np.zeros(len(self.len_edges) - 1, dtype=np.int64)

    # -------------------------------------------------------------- update
    def update(self, arr: pa.Array) -> None:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        self.count += n
        self.nulls += arr.null_count
        if n == arr.null_count:
            return
        t = arr.type
        valid = arr.drop_null()
        # min / max
        try:
            mm = pc.min_max(arr)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            self.min = lo if self.min is None else min(self.min, lo)
            self.max = hi if self.max is None else max(self.max, hi)
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid, TypeError):
            pass
        # distinct (HLL) over raw values
        try:
            vals = valid.to_numpy(zero_copy_only=False)
            self.hll.update_hashes(hash64(vals))
        except (pa.ArrowInvalid, TypeError):
            pass
        # numeric / length distribution (KLL + histogram)
        num: Optional[np.ndarray] = None
        if pa.types.is_integer(t) or pa.types.is_floating(t):
            num = valid.cast(pa.float64()).to_numpy(zero_copy_only=False)
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            num = pc.utf8_length(valid).cast(pa.float64()).to_numpy(zero_copy_only=False)
        if num is not None and num.size:
            self.kll.update(num)
            h, _ = np.histogram(num, bins=self.len_edges)
            self.len_hist += h
        # frequencies for low-cardinality columns
        if self.freq is not None:
            vc = valid.value_counts()
            for entry in vc.to_pylist():
                self.freq[entry["values"]] += entry["counts"]

    # -------------------------------------------------------------- merge
    def merge(self, other: "ColumnStats") -> "ColumnStats":
        self.count += other.count
        self.nulls += other.nulls
        for attr, op in (("min", min), ("max", max)):
            a, b = getattr(self, attr), getattr(other, attr)
            setattr(self, attr, b if a is None else (a if b is None else op(a, b)))
        self.hll.merge(other.hll)
        self.kll.merge(other.kll)
        if self.freq is not None and other.freq is not None:
            self.freq.update(other.freq)
        self.len_hist += other.len_hist
        return self

    # -------------------------------------------------------------- report
    def summary(self) -> dict:
        qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
        return {
            "count": self.count,
            "nulls": self.nulls,
            "null_frac": (self.nulls / self.count) if self.count else 0.0,
            "min": self.min,
            "max": self.max,
            "distinct_hll": round(self.hll.estimate(), 1),
            "quantiles": {str(q): self.kll.quantile(q) for q in qs} if self.kll.n else None,
            "len_hist": self.len_hist.tolist(),
            "len_edges": self.len_edges.tolist()[:-1],
            "freq": dict(self.freq.most_common(50)) if self.freq is not None else None,
        }


def table_stats_update(acc: Dict[str, ColumnStats], block: pa.Table,
                       columns: Sequence[str], freq_columns: Sequence[str]) -> Dict[str, ColumnStats]:
    for c in columns:
        if c not in block.schema.names:
            continue
        if c not in acc:
            acc[c] = ColumnStats(track_freq=c in freq_columns)
        acc[c].update(block.column(c))
    return acc


def verdict_update(acc: Dict, block: pa.Table, shard_col: str = "shard") -> Dict:
    """Per-shard verdict counters + a per-shard content-length KLL sketch
    (north rule: PER-PARTITION quantiles for the drift check), folded into
    the same aggregate pass as the column stats."""
    import pandas as pd

    need = {shard_col, "valid", "sha_ok", "n_violations"}
    if not need.issubset(block.schema.names):
        return acc
    has_len = "content_len" in block.schema.names
    df = pd.DataFrame({
        "shard": block.column(shard_col).to_pandas(),
        "valid": block.column("valid").to_pandas(),
        "sha_ok": block.column("sha_ok").to_pandas(),
        "nv": block.column("n_violations").to_pandas(),
    })
    if has_len:
        df["clen"] = block.column("content_len").to_pandas()
    g = df.groupby("shard")
    for shard, sub in g:
        rec = acc.setdefault(shard, {"rows": 0, "passed": 0, "sha_mismatch": 0,
                                     "violations": 0,
                                     "len_kll": KLL(200, seed=777)})
        rec["rows"] += int(len(sub))
        rec["passed"] += int(sub["valid"].sum())
        rec["sha_mismatch"] += int((~sub["sha_ok"]).sum())
        rec["violations"] += int(sub["nv"].sum())
        if has_len:
            rec["len_kll"].update(sub["clen"].dropna().to_numpy(dtype=float))
    return acc


def merge_verdicts(a: Dict, b: Dict) -> Dict:
    for shard, rec in b.items():
        dst = a.setdefault(shard, {"rows": 0, "passed": 0, "sha_mismatch": 0,
                                   "violations": 0, "len_kll": KLL(200, seed=777)})
        for k, v in rec.items():
            if k == "len_kll":
                dst["len_kll"].merge(v)
            else:
                dst[k] += v
    return a


def make_stats_aggregate(columns: Sequence[str], freq_columns: Sequence[str] = (),
                         with_verdicts: bool = False):
    """A ray.data AggregateFn computing all column stats in one pass.

    The accumulator crosses task boundaries as pickled bytes: Ray Data
    materializes aggregation state into blocks, and an Arrow-opaque Python
    object there triggers conversion warnings/fallbacks."""
    import pickle

    from ray.data.aggregate import AggregateFn

    cols = list(columns)
    freq = list(freq_columns)

    def acc_block(acc: bytes, block) -> bytes:
        state = pickle.loads(acc)
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        state["cols"] = table_stats_update(state.get("cols", {}), block, cols, freq)
        if with_verdicts:
            state["verdicts"] = verdict_update(state.get("verdicts", {}), block)
        return pickle.dumps(state)

    def merge(a: bytes, b: bytes) -> bytes:
        sa, sb = pickle.loads(a), pickle.loads(b)
        out = {"cols": _merge_acc(sa.get("cols", {}), sb.get("cols", {}))}
        if with_verdicts:
            out["verdicts"] = merge_verdicts(sa.get("verdicts", {}), sb.get("verdicts", {}))
        return pickle.dumps(out)

    return AggregateFn(
        init=lambda k: pickle.dumps({}),
        accumulate_block=acc_block,
        merge=merge,
        name="column_stats",
    )


def _merge_acc(a: Dict[str, ColumnStats], b: Dict[str, ColumnStats]) -> Dict[str, ColumnStats]:
    for k, v in b.items():
        if k in a:
            a[k].merge(v)
        else:
            a[k] = v
    return a


def dataset_stats(ds, columns: Sequence[str], freq_columns: Sequence[str] = (),
                  with_verdicts: bool = False):
    """Compute column stats (and optionally per-shard verdict counters) for a
    Ray Dataset in ONE streaming pass."""
    import pickle

    agg = make_stats_aggregate(columns, freq_columns, with_verdicts=with_verdicts)
    res = ds.aggregate(agg)
    acc = res["column_stats"] if isinstance(res, dict) else res
    if isinstance(acc, bytes):
        acc = pickle.loads(acc)
    summaries = {k: v.summary() for k, v in acc.get("cols", {}).items()}
    if with_verdicts:
        return summaries, acc.get("verdicts", {})
    return summaries
