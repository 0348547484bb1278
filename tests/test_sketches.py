"""HLL / KLL sketch accuracy and merge-associativity tests."""

import numpy as np

from rayschema.sketches import KLL, HyperLogLog, hash64, merge_hlls, merge_klls


def test_hash64_deterministic():
    a = hash64(np.array(["x", "y", "z"], dtype=object))
    b = hash64(np.array(["x", "y", "z"], dtype=object))
    assert (a == b).all()
    assert a.dtype == np.uint64


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 500_000, 300_000)
    true = len(np.unique(vals))
    h = HyperLogLog(14).update(vals)
    assert abs(h.estimate() - true) / true < 0.02
    parts = [HyperLogLog(14).update(c) for c in np.array_split(vals, 7)]
    merged = merge_hlls(parts, p=14)
    assert merged.estimate() == h.estimate()  # register-max merge is exact


def test_hll_small_range_linear_counting():
    h = HyperLogLog(14).update(np.arange(100))
    assert abs(h.estimate() - 100) < 3


def test_hll_strings_and_serde():
    h = HyperLogLog(12).update(np.array([f"k{i % 1000}" for i in range(5000)], dtype=object))
    est = h.estimate()
    assert abs(est - 1000) / 1000 < 0.05
    h2 = HyperLogLog.from_bytes(h.to_bytes())
    assert h2.estimate() == est


def test_kll_quantiles():
    rng = np.random.default_rng(11)
    data = rng.lognormal(5, 1.0, 200_000)
    k = KLL(200, seed=5)
    for c in np.array_split(data, 20):
        k.update(c)
    for q in (0.1, 0.5, 0.9):
        est, true = k.quantile(q), float(np.quantile(data, q))
        assert abs(est - true) / true < 0.1, (q, est, true)
    assert k.quantile(0.0) == data.min()
    assert k.quantile(1.0) == data.max()


def test_kll_merge_and_serde():
    rng = np.random.default_rng(13)
    data = rng.normal(100, 15, 100_000)
    parts = [KLL(200, seed=i).update(c) for i, c in enumerate(np.array_split(data, 5))]
    m = merge_klls(parts)
    assert m.n == 100_000
    assert abs(m.quantile(0.5) - 100) < 2
    m2 = KLL.from_bytes(m.to_bytes())
    assert m2.quantile(0.5) == m.quantile(0.5)
    assert abs(m.cdf(100.0) - 0.5) < 0.03


def test_kll_nan_and_empty():
    k = KLL(50)
    k.update(np.array([np.nan, np.nan]))
    assert k.n == 0 and np.isnan(k.quantile(0.5))
    k.update(np.array([1.0, np.nan, 3.0]))
    assert k.n == 2


def test_misra_gries_guarantee_and_bounds():
    """Every item with true freq > n/(budget+1) is reported; reported
    counts undercount by at most error_bound(); unreported items' true
    counts are at most error_bound()."""
    from collections import Counter

    from rayschema.sketches import MisraGries

    rng = np.random.RandomState(3)
    # zipf-ish: a few heavy keys over a long tail
    data = [f"k{int(v)}" for v in rng.zipf(1.6, size=20000) if v < 10000]
    truth = Counter(data)
    n = len(data)
    budget = 16
    mg = MisraGries(budget)
    for i in range(0, n, 700):            # streamed in uneven chunks
        mg.update(data[i:i + 700])
    reported = dict(mg.items())
    eb = mg.error_bound()
    assert eb <= n // (budget + 1)
    for v, true_c in truth.items():
        if true_c > n / (budget + 1):
            assert v in reported, v
        if v in reported:
            assert 0 <= true_c - reported[v] <= eb, v
        else:
            assert true_c <= eb, v


def test_misra_gries_merge_and_roundtrip():
    from collections import Counter

    from rayschema.sketches import MisraGries, merge_mgs

    rng = np.random.RandomState(11)
    data = [f"w{int(v)}" for v in rng.zipf(1.5, size=30000) if v < 5000]
    truth = Counter(data)
    n = len(data)
    budget = 24
    parts = []
    for i in range(0, n, 1111):           # one sketch per partition
        parts.append(MisraGries(budget).update(data[i:i + 1111]))
    merged = merge_mgs(parts, budget)
    assert merged.n == n
    eb = merged.error_bound()
    reported = dict(merged.items())
    for v, true_c in truth.items():
        if true_c > n / (budget + 1) + eb:   # merged guarantee (slack = eb)
            assert v in reported, v
        if v in reported:
            assert 0 <= true_c - reported[v] <= eb, v
    # serialization round-trips the exact state
    back = MisraGries.from_bytes(merged.to_bytes())
    assert back.items() == merged.items()
    assert back.error_bound() == eb and back.n == merged.n
