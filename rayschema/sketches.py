"""Mergeable sketches: HyperLogLog (distinct count) and KLL (quantiles).

Engine-side aggregation state (SURVEY.md §2.E): each map_batches actor keeps
one sketch per tracked column, updates it vectorized per batch, and the tiny
per-actor/per-batch sketches are merged associatively in a final reduce —
the partial/combiner pattern that avoids an all-to-all shuffle.

Public-knowledge algorithms:
* HyperLogLog: Flajolet et al., "HyperLogLog: the analysis of a near-optimal
  cardinality estimation algorithm" (2007), with the standard bias correction
  for small/large ranges.
* KLL: Karnin, Lang, Liberty, "Optimal Quantile Approximation in Streams"
  (FOCS 2016) — compactor-stack quantile sketch (PAPERS.md: KLL±, VLDB 2021).

Hashing: pandas.util.hash_array (vectorized, deterministic across processes —
it is keyed by a fixed string key, not PYTHONHASHSEED).
"""

from __future__ import annotations

import pickle
from typing import Iterable, List, Optional, Sequence

import numpy as np
import pandas as pd


def hash64(values) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a numpy/arrow-ish array."""
    arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        arr = arr.astype(object)
    return pd.util.hash_array(arr, categorize=False)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (6-step binary search)."""
    x = x.astype(np.uint64, copy=True)
    n = np.full(x.shape, 64, dtype=np.int64)
    shift = np.uint64(32)
    for s in (32, 16, 8, 4, 2, 1):
        s64 = np.uint64(s)
        y = x >> s64
        has = y != 0
        n = np.where(has, n - s, n)
        x = np.where(has, y, x)
    return np.where(x != 0, n - 1, n)


class HyperLogLog:
    """Dense HLL with 2^p registers. Relative error ~1.04/sqrt(2^p)
    (p=14 -> ~0.8%)."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update_hashes(self, h: np.ndarray) -> "HyperLogLog":
        if len(h) == 0:
            return self
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h << np.uint64(self.p)
        rho = np.minimum(_clz64(w), 64 - self.p).astype(np.uint8) + 1
        np.maximum.at(self.registers, idx, rho)
        return self

    def update(self, values) -> "HyperLogLog":
        return self.update_hashes(hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        est = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting, small range
        elif est > (1 << 64) / 30.0:
            est = -(2.0**64) * np.log(1 - est / 2.0**64)
        return float(est)

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.p, self.registers))

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        p, regs = pickle.loads(b)
        out = cls(p)
        out.registers = np.asarray(regs, dtype=np.uint8)
        return out


class KLL:
    """KLL quantile sketch over float64 values.

    Compactor stack: level i holds items with weight 2^i; when a level
    overflows its capacity, it is sorted and every other item (random parity)
    is promoted to level i+1. Deterministic when seeded (tests); merge is
    concatenate-levels + compact.
    """

    __slots__ = ("k", "levels", "n", "_rng", "_min", "_max")

    def __init__(self, k: int = 200, seed: Optional[int] = None):
        self.k = k
        self.levels: List[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._rng = np.random.default_rng(seed)
        self._min = np.inf
        self._max = -np.inf

    def _capacity(self, level: int, num_levels: int) -> int:
        # capacity shrinks geometrically for lower levels: c * (2/3)^depth
        depth = num_levels - level - 1
        return max(2, int(np.ceil(self.k * (2.0 / 3.0) ** depth)))

    def update(self, values) -> "KLL":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.n += v.size
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            cap = self._capacity(i, len(self.levels))
            lvl = self.levels[i]
            if lvl.size <= cap:
                i += 1
                continue
            srt = np.sort(lvl)
            start = int(self._rng.integers(0, 2))
            promoted = srt[start::2]
            self.levels[i] = np.empty(0, dtype=np.float64)
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, lvl in enumerate(other.levels):
            if lvl.size:
                self.levels[i] = np.concatenate([self.levels[i], lvl])
        self.n += other.n
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._compress()
        return self

    def _weighted_items(self):
        items, weights = [], []
        for i, lvl in enumerate(self.levels):
            if lvl.size:
                items.append(lvl)
                weights.append(np.full(lvl.size, 1 << i, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def quantile(self, q: float) -> float:
        it, w = self._weighted_items()
        if it.size == 0:
            return float("nan")
        cw = np.cumsum(w)
        target = q * cw[-1]
        idx = int(np.searchsorted(cw, target, side="left"))
        idx = min(idx, it.size - 1)
        if q <= 0.0:
            return float(self._min)
        if q >= 1.0:
            return float(self._max)
        return float(it[idx])

    def quantiles(self, qs: Sequence[float]) -> List[float]:
        return [self.quantile(q) for q in qs]

    def cdf(self, x: float) -> float:
        it, w = self._weighted_items()
        if it.size == 0:
            return float("nan")
        cw = np.cumsum(w)
        idx = int(np.searchsorted(it, x, side="right"))
        return float(cw[idx - 1] / cw[-1]) if idx > 0 else 0.0

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.k, self.levels, self.n, self._min, self._max))

    @classmethod
    def from_bytes(cls, b: bytes) -> "KLL":
        k, levels, n, mn, mx = pickle.loads(b)
        out = cls(k)
        out.levels, out.n, out._min, out._max = levels, n, mn, mx
        return out


def merge_hlls(sketches: Iterable[HyperLogLog], p: int = 14) -> HyperLogLog:
    out = HyperLogLog(p)
    for s in sketches:
        out.merge(s)
    return out


def merge_klls(sketches: Iterable[KLL], k: int = 200) -> KLL:
    out = KLL(k)
    for s in sketches:
        out.merge(s)
    return out


class MisraGries:
    """Misra-Gries heavy-hitters summary (Misra & Gries, "Finding repeated
    elements", 1982; merge rule from Agarwal et al., "Mergeable Summaries",
    PODS 2012): at most ``budget`` counters; every item with true frequency
    > n / (budget + 1) is GUARANTEED to be present, and each reported count
    undercounts the truth by at most the sketch's ``error_bound()``.

    The engine's bounded-memory complement to the exact value-count paths
    (vocabulary_top_words caps the broadcast vocabulary; this sketch caps
    the aggregation STATE — the right tool when the key domain itself
    cannot fit anywhere at 100 TB). Same partial/merge discipline as
    HLL/KLL: vectorized per-batch update, associative merge."""

    def __init__(self, budget: int = 64):
        self.budget = int(budget)
        self.counts: dict = {}
        self.n = 0
        self._decremented = 0

    def update(self, values: Sequence) -> "MisraGries":
        u, c = np.unique(np.asarray(values, dtype=object), return_counts=True)
        for v, k in zip(u.tolist(), c.tolist()):
            self.counts[v] = self.counts.get(v, 0) + int(k)
        self.n += int(c.sum())
        self._shrink()
        return self

    def _shrink(self) -> None:
        over = len(self.counts) - self.budget
        if over <= 0:
            return
        # decrement all by the (over+1)-th largest count's floor — the
        # classic batched decrement: kth smallest survivor boundary
        vals = np.fromiter(self.counts.values(), dtype=np.int64)
        d = int(np.partition(vals, over - 1)[over - 1])
        self._decremented += d
        self.counts = {k: v - d for k, v in self.counts.items() if v > d}

    def merge(self, other: "MisraGries") -> "MisraGries":
        for v, k in other.counts.items():
            self.counts[v] = self.counts.get(v, 0) + int(k)
        self.n += other.n
        self._decremented += other._decremented
        self._shrink()
        return self

    def error_bound(self) -> int:
        """Upper bound on the undercount of any reported item (and on the
        true count of any unreported item)."""
        return self._decremented

    def items(self):
        """(value, lower-bound count) sorted by count desc, value asc."""
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], str(kv[0])))

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.budget, self.counts, self.n,
                             self._decremented))

    @classmethod
    def from_bytes(cls, b: bytes) -> "MisraGries":
        budget, counts, n, dec = pickle.loads(b)
        out = cls(budget)
        out.counts, out.n, out._decremented = counts, n, dec
        return out


def merge_mgs(sketches: Iterable["MisraGries"],
              budget: int = 64) -> "MisraGries":
    out = MisraGries(budget)
    for s in sketches:
        out.merge(s)
    return out
