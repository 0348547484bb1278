"""rayschema.graph: integer-exact PageRank supersteps on Ray Data."""

import numpy as np
import pandas as pd
import pyarrow as pa

import pytest

from rayschema.graph import PR_BASE, PR_DAMP_DEN, PR_DAMP_NUM, PR_INIT, \
    pagerank


def _edges_ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, dtype=np.int64)),
        "dst": pa.array(np.asarray(dst, dtype=np.int64))}))


def _pagerank_ref(src, dst, iters):
    """Driver-side numpy mirror of the documented recurrence."""
    src, dst = np.asarray(src, np.int64), np.asarray(dst, np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    deg = np.zeros(len(nodes), np.int64)
    us, cs = np.unique(src, return_counts=True)
    deg[np.searchsorted(nodes, us)] = cs
    pr = np.full(len(nodes), PR_INIT, dtype=np.int64)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    for _ in range(iters):
        contrib = pr[si] // np.maximum(deg[si], 1)
        s = np.zeros(len(nodes), np.int64)
        np.add.at(s, di, contrib)
        pr = PR_BASE + (PR_DAMP_NUM * s) // PR_DAMP_DEN
    return pd.DataFrame({"node": nodes, "pr": pr})


def test_pagerank_star_planted(ray_session):
    # undirected star: hub 0 <-> spokes 1..5; hub must rank strictly highest
    spokes = np.arange(1, 6, dtype=np.int64)
    src = np.concatenate([np.zeros(5, np.int64), spokes])
    dst = np.concatenate([spokes, np.zeros(5, np.int64)])
    out = pagerank(_edges_ds(src, dst), iters=3).sort_values("node") \
        .reset_index(drop=True)
    ref = _pagerank_ref(src, dst, 3)
    pd.testing.assert_frame_equal(out, ref)
    hub = int(out.loc[out["node"] == 0, "pr"].iloc[0])
    assert all(hub > int(p) for p in out.loc[out["node"] != 0, "pr"])
    # spokes are symmetric: identical ranks
    assert out.loc[out["node"] != 0, "pr"].nunique() == 1


def test_pagerank_source_and_sink_nodes(ray_session):
    # 7 -> 8 -> 9 chain plus a 2-cycle: node 7 has no in-edges (lands on
    # exactly PR_BASE after step 1), node 9 has no out-edges (dangling)
    src = [7, 8, 1, 2]
    dst = [8, 9, 2, 1]
    out = pagerank(_edges_ds(src, dst), iters=4).sort_values("node") \
        .reset_index(drop=True)
    ref = _pagerank_ref(src, dst, 4)
    pd.testing.assert_frame_equal(out, ref)
    assert int(out.loc[out["node"] == 7, "pr"].iloc[0]) == PR_BASE


def test_pagerank_join_path_matches_broadcast(ray_session):
    rng = np.random.RandomState(7)
    src = rng.randint(0, 40, size=300).astype(np.int64)
    dst = rng.randint(0, 40, size=300).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    a = pagerank(_edges_ds(src, dst), iters=3).sort_values("node") \
        .reset_index(drop=True)
    b = pagerank(_edges_ds(src, dst), iters=3, node_cap=0,
                 num_partitions=4).sort_values("node") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, _pagerank_ref(src, dst, 3))


@pytest.mark.parametrize("seed", [1, 2])
def test_pagerank_fuzz_vs_reference(ray_session, seed):
    rng = np.random.RandomState(seed)
    n_edges = rng.randint(20, 120)
    src = rng.randint(0, 25, size=n_edges).astype(np.int64)
    dst = rng.randint(0, 25, size=n_edges).astype(np.int64)
    out = pagerank(_edges_ds(src, dst), iters=5).sort_values("node") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out, _pagerank_ref(src, dst, 5))


def _pairs_ds(a, b):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "a": pa.array(np.asarray(a, dtype=np.int64)),
        "b": pa.array(np.asarray(b, dtype=np.int64))}))


def _tri_ref(a, b):
    """Brute-force per-node triangle counts over distinct edges a < b."""
    es = set(zip(map(int, a), map(int, b)))
    nodes = sorted({x for e in es for x in e})
    cnt = {n: 0 for n in nodes}
    ns = list(nodes)
    for i, x in enumerate(ns):
        for y in ns[i + 1:]:
            if (x, y) not in es:
                continue
            for z in ns:
                if z <= y:
                    continue
                if (x, z) in es and (y, z) in es:
                    cnt[x] += 1
                    cnt[y] += 1
                    cnt[z] += 1
    return pd.DataFrame({"node": [n for n in nodes if cnt[n]],
                         "n_triangles": [cnt[n] for n in nodes if cnt[n]]})


def test_triangle_counts_planted(ray_session):
    from rayschema.graph import triangle_counts

    # K4 on {0,1,2,3} (every node in 3 triangles) + pendant edge 3-9
    a = [0, 0, 0, 1, 1, 2, 3]
    b = [1, 2, 3, 2, 3, 3, 9]
    out = (triangle_counts(_pairs_ds(a, b)).to_pandas()
           .sort_values("node").reset_index(drop=True))
    assert dict(zip(out["node"], out["n_triangles"])) == \
        {0: 3, 1: 3, 2: 3, 3: 3}


@pytest.mark.parametrize("seed", [3, 4])
def test_triangle_counts_fuzz_vs_bruteforce(ray_session, seed):
    from rayschema.graph import triangle_counts

    rng = np.random.RandomState(seed)
    n = 18
    prob = 0.35
    aa, bb = [], []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.rand() < prob:
                aa.append(i)
                bb.append(j)
    out = (triangle_counts(_pairs_ds(aa, bb)).to_pandas()
           .sort_values("node").reset_index(drop=True))
    ref = _tri_ref(aa, bb).astype({"node": np.int64,
                                   "n_triangles": np.int64})
    pd.testing.assert_frame_equal(out.astype({"node": np.int64,
                                              "n_triangles": np.int64}),
                                  ref)


def test_triangle_counts_marker_path_matches_broadcast(ray_session):
    from rayschema.graph import triangle_counts

    rng = np.random.RandomState(9)
    aa, bb = [], []
    for i in range(16):
        for j in range(i + 1, 16):
            if rng.rand() < 0.4:
                aa.append(i)
                bb.append(j)
    fast = (triangle_counts(_pairs_ds(aa, bb)).to_pandas()
            .sort_values("node").reset_index(drop=True))
    scan = (triangle_counts(_pairs_ds(aa, bb), edge_broadcast_cap=0)
            .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, scan)
    pd.testing.assert_frame_equal(
        fast.astype({"node": np.int64, "n_triangles": np.int64}),
        _tri_ref(aa, bb).astype({"node": np.int64,
                                 "n_triangles": np.int64}))


def _hits_ref(src, dst, iters):
    from rayschema.graph import PR_INIT

    src, dst = np.asarray(src, np.int64), np.asarray(dst, np.int64)
    hubs = np.unique(src)
    auths = np.unique(dst)
    h = np.full(len(hubs), PR_INIT, dtype=np.int64)
    si = np.searchsorted(hubs, src)
    di = np.searchsorted(auths, dst)

    def den(raw):
        return max((int(raw.max()) + PR_INIT - 1) // PR_INIT, 1)

    a = np.zeros(len(auths), np.int64)
    for _ in range(iters):
        raw = np.zeros(len(auths), np.int64)
        np.add.at(raw, di, h[si])
        a = raw // den(raw)
        raw = np.zeros(len(hubs), np.int64)
        np.add.at(raw, si, a[di])
        h = raw // den(raw)
    return pd.DataFrame({
        "node": np.concatenate([hubs, auths]),
        "side": ["hub"] * len(hubs) + ["auth"] * len(auths),
        "score": np.concatenate([h, a])})


def test_hits_planted_bipartite(ray_session):
    from rayschema.graph import hits

    # hub 0 links every auth; hubs 2,4 link one each -> 0 is the top hub,
    # the auth linked by all three (11) the top authority
    src = [0, 0, 0, 2, 4]
    dst = [11, 13, 15, 11, 11]
    out = hits(_edges_ds(src, dst), iters=2)
    ref = _hits_ref(src, dst, 2)
    pd.testing.assert_frame_equal(
        out.sort_values(["side", "node"]).reset_index(drop=True),
        ref.sort_values(["side", "node"]).reset_index(drop=True))
    hub = out[out["side"] == "hub"].set_index("node")["score"]
    auth = out[out["side"] == "auth"].set_index("node")["score"]
    assert hub[0] > hub[2] and hub[0] > hub[4]
    assert auth[11] > auth[13] and auth[11] > auth[15]


@pytest.mark.parametrize("seed", [5, 6])
def test_hits_join_path_and_fuzz(ray_session, seed):
    from rayschema.graph import hits

    rng = np.random.RandomState(seed)
    n_edges = rng.randint(30, 120)
    src = (rng.randint(0, 15, size=n_edges) * 2).astype(np.int64)
    dst = (rng.randint(0, 12, size=n_edges) * 2 + 1).astype(np.int64)
    # distinct edges (the contract)
    pk = np.unique((src << np.int64(32)) | dst)
    src, dst = pk >> np.int64(32), pk & np.int64((1 << 32) - 1)
    a = hits(_edges_ds(src, dst), iters=2) \
        .sort_values(["side", "node"]).reset_index(drop=True)
    b = hits(_edges_ds(src, dst), iters=2, node_cap=0,
             num_partitions=4) \
        .sort_values(["side", "node"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(
        a, _hits_ref(src, dst, 2).sort_values(["side", "node"])
        .reset_index(drop=True))


def test_graph_algos_empty_edges(ray_session):
    from rayschema.graph import hits, pagerank, triangle_counts

    empty = _edges_ds([], [])
    assert len(pagerank(empty, iters=2)) == 0
    assert len(hits(empty, iters=2)) == 0
    assert triangle_counts(_pairs_ds([], [])).to_pandas().empty


def _lpa_ref(src, dst, iters):
    """Driver-side mirror of the documented LPA recurrence."""
    src, dst = np.asarray(src, np.int64), np.asarray(dst, np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    lab = {int(n): int(n) for n in nodes}
    for _ in range(iters):
        votes = {}
        for u, v in zip(src, dst):
            d = votes.setdefault(int(v), {})
            d[lab[int(u)]] = d.get(lab[int(u)], 0) + 1
        new = dict(lab)
        for v, d in votes.items():
            new[v] = max(d.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        lab = new
    return pd.DataFrame({"node": nodes,
                         "label": np.array([lab[int(n)] for n in nodes],
                                           dtype=np.int64)})


def test_lpa_two_cliques_with_bridge(ray_session):
    from rayschema.graph import label_propagation

    # two 4-cliques {0..3} and {10..13} joined by one bridge edge 3-10:
    # after a few rounds each clique converges to its min node id
    def clique(ns):
        ns = np.asarray(ns, np.int64)
        i, j = np.meshgrid(ns, ns)
        m = i != j
        return i[m], j[m]
    s1, d1 = clique([0, 1, 2, 3])
    s2, d2 = clique([10, 11, 12, 13])
    src = np.concatenate([s1, s2, [3, 10]])
    dst = np.concatenate([d1, d2, [10, 3]])
    out = label_propagation(_edges_ds(src, dst), iters=4) \
        .sort_values("node").reset_index(drop=True)
    ref = _lpa_ref(src, dst, 4)
    pd.testing.assert_frame_equal(out, ref)
    assert set(out.loc[out["node"] <= 3, "label"]) == {0}
    assert set(out.loc[out["node"] >= 10, "label"]) == {10}


def test_lpa_keeps_label_without_in_edges(ray_session):
    from rayschema.graph import label_propagation

    # directed 5 -> 6: node 5 has no in-edges and must keep label 5
    out = label_propagation(_edges_ds([5], [6]), iters=3) \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, _lpa_ref([5], [6], 3))
    assert out.loc[out["node"] == 5, "label"].iloc[0] == 5
    assert out.loc[out["node"] == 6, "label"].iloc[0] == 5


@pytest.mark.parametrize("seed", [0, 1])
def test_lpa_join_path_and_fuzz(ray_session, seed):
    from rayschema.graph import label_propagation

    rng = np.random.default_rng(seed)
    m = 120
    src = rng.integers(0, 25, size=m).astype(np.int64)
    dst = rng.integers(0, 25, size=m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    bc = label_propagation(_edges_ds(src, dst), iters=3) \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, _lpa_ref(src, dst, 3))
    # node_cap=0 forces the edges-join-labels scale path: bit-identical
    jn = label_propagation(_edges_ds(src, dst), iters=3, node_cap=0,
                           num_partitions=4) \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(jn, bc)


def test_lpa_empty_edges(ray_session):
    from rayschema.graph import label_propagation

    assert len(label_propagation(_edges_ds([], []), iters=2)) == 0


def _kcore_ref(src, dst, k, rounds):
    """Driver-side numpy mirror of the documented bounded peel."""
    src, dst = np.asarray(src, np.int64), np.asarray(dst, np.int64)
    alive = np.unique(src)

    def deg(a):
        m = np.isin(src, a) & np.isin(dst, a)
        return np.unique(dst[m], return_counts=True)

    for _ in range(rounds):
        nd, dg = deg(alive)
        alive = nd[dg >= k]
    nd, dg = deg(alive)
    return pd.DataFrame({"node": nd, "core_deg": dg.astype(np.int64)})


def _sym(src, dst):
    src, dst = np.asarray(src, np.int64), np.asarray(dst, np.int64)
    return np.concatenate([src, dst]), np.concatenate([dst, src])


def test_kcore_cascade_planted(ray_session):
    from rayschema.graph import kcore

    # 4-clique {0..3} + a pendant chain 3-4, 4-5: k=2 peels 5 in round 1,
    # THEN 4 in round 2 (its degree drops to 1 only after 5 dies) — a
    # genuine multi-round cascade; the clique survives with degree 3
    s, d = _sym([0, 0, 0, 1, 1, 2, 3, 4], [1, 2, 3, 2, 3, 3, 4, 5])
    out = kcore(_edges_ds(s, d), k=2, rounds=3)
    ref = _kcore_ref(s, d, 2, 3)
    pd.testing.assert_frame_equal(out, ref)
    assert set(out["node"]) == {0, 1, 2, 3}
    assert set(out["core_deg"]) == {3}
    # one round is NOT enough: node 4 still alive after round 1
    partial = kcore(_edges_ds(s, d), k=2, rounds=1)
    assert set(partial["node"]) == {0, 1, 2, 3, 4}


def test_kcore_whole_graph_peels_to_empty(ray_session):
    from rayschema.graph import kcore

    s, d = _sym([0, 1], [1, 2])     # path graph: max degree 2 < k=3
    out = kcore(_edges_ds(s, d), k=3, rounds=2)
    assert len(out) == 0
    assert list(out.columns) == ["node", "core_deg"]


@pytest.mark.parametrize("seed", [0, 1])
def test_kcore_join_path_and_fuzz(ray_session, seed):
    from rayschema.graph import kcore

    rng = np.random.default_rng(seed)
    m = 150
    a = rng.integers(0, 30, size=m).astype(np.int64)
    b = rng.integers(0, 30, size=m).astype(np.int64)
    keep = a != b
    pk = np.unique((np.minimum(a, b)[keep] << np.int64(32))
                   | np.maximum(a, b)[keep])
    s, d = _sym(pk >> np.int64(32), pk & np.int64((1 << 32) - 1))
    bc = kcore(_edges_ds(s, d), k=4, rounds=3)
    pd.testing.assert_frame_equal(bc, _kcore_ref(s, d, 4, 3))
    jn = kcore(_edges_ds(s, d), k=4, rounds=3, node_cap=0,
               num_partitions=4)
    pd.testing.assert_frame_equal(jn, bc)


def test_kcore_empty_edges(ray_session):
    from rayschema.graph import kcore

    assert len(kcore(_edges_ds([], []), k=2, rounds=2)) == 0


def _edges_w_ds(src, dst, w):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, dtype=np.int64)),
        "dst": pa.array(np.asarray(dst, dtype=np.int64)),
        "w": pa.array(np.asarray(w, dtype=np.int64))}))


def _wpagerank_ref(src, dst, w, iters):
    src, dst = np.asarray(src, np.int64), np.asarray(dst, np.int64)
    w = np.asarray(w, np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    wout = np.zeros(len(nodes), np.int64)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    np.add.at(wout, si, w)
    pr = np.full(len(nodes), PR_INIT, dtype=np.int64)
    for _ in range(iters):
        contrib = (pr[si] * w) // np.maximum(wout[si], 1)
        s = np.zeros(len(nodes), np.int64)
        np.add.at(s, di, contrib)
        pr = PR_BASE + (PR_DAMP_NUM * s) // PR_DAMP_DEN
    return pd.DataFrame({"node": nodes, "pr": pr})


def test_weighted_pagerank_planted_and_unweighted_parity(ray_session):
    # weight-5 edge into node 2 dominates the weight-1 edge into node 3
    src = [0, 0, 2, 3]
    dst = [2, 3, 0, 0]
    w = [5, 1, 1, 1]
    out = pagerank(_edges_w_ds(src, dst, w), iters=3, weight_col="w") \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, _wpagerank_ref(src, dst, w, 3))
    pr2 = int(out.loc[out["node"] == 2, "pr"].iloc[0])
    pr3 = int(out.loc[out["node"] == 3, "pr"].iloc[0])
    assert pr2 > pr3
    # all-ones weights are bit-identical to the unweighted recurrence
    ones = pagerank(_edges_w_ds(src, dst, [1, 1, 1, 1]), iters=3,
                    weight_col="w").sort_values("node") \
        .reset_index(drop=True)
    unw = pagerank(_edges_ds(src, dst), iters=3).sort_values("node") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(ones, unw)


@pytest.mark.parametrize("seed", [0, 1])
def test_weighted_pagerank_join_path_and_fuzz(ray_session, seed):
    rng = np.random.default_rng(seed)
    m = 100
    src = rng.integers(0, 20, size=m).astype(np.int64)
    dst = rng.integers(0, 20, size=m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, 9, size=len(src)).astype(np.int64)
    bc = pagerank(_edges_w_ds(src, dst, w), iters=3, weight_col="w") \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, _wpagerank_ref(src, dst, w, 3))
    jn = pagerank(_edges_w_ds(src, dst, w), iters=3, weight_col="w",
                  node_cap=0, num_partitions=4) \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(jn, bc)


def _kcore_w_ref(src, dst, w, k, rounds):
    src, dst = np.asarray(src, np.int64), np.asarray(dst, np.int64)
    w = np.asarray(w, np.int64)
    alive = np.unique(src)

    def deg(a):
        m = np.isin(src, a) & np.isin(dst, a)
        nd, inv = np.unique(dst[m], return_inverse=True)
        return nd, np.bincount(inv, weights=w[m]).astype(np.int64)

    for _ in range(rounds):
        nd, dg = deg(alive)
        alive = nd[dg >= k]
    nd, dg = deg(alive)
    return pd.DataFrame({"node": nd, "core_deg": dg})


def test_score_weighted_peel_and_unweighted_parity(ray_session):
    from rayschema.graph import kcore

    # triangle 0-1-2 with heavy weights + pendant 2-3 with weight 1:
    # k=3 on strength peels 3 (strength 1), then nothing else
    s, d = _sym([0, 1, 0, 2], [1, 2, 2, 3])
    w = np.array([5, 5, 5, 1, 5, 5, 5, 1], dtype=np.int64)
    out = kcore(_edges_w_ds(s, d, w), k=3, rounds=2, weight_col="w")
    pd.testing.assert_frame_equal(out, _kcore_w_ref(s, d, w, 3, 2))
    assert set(out["node"]) == {0, 1, 2}
    assert set(out["core_deg"]) == {10}
    # all-ones weights == unweighted peel bit for bit
    ones = kcore(_edges_w_ds(s, d, np.ones(8, np.int64)), k=2,
                 rounds=2, weight_col="w")
    unw = kcore(_edges_ds(s, d), k=2, rounds=2)
    pd.testing.assert_frame_equal(ones, unw)


@pytest.mark.parametrize("seed", [0])
def test_score_join_path_and_fuzz(ray_session, seed):
    from rayschema.graph import kcore

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 25, size=120).astype(np.int64)
    b = rng.integers(0, 25, size=120).astype(np.int64)
    keep = a != b
    pk = np.unique((np.minimum(a, b)[keep] << np.int64(32))
                   | np.maximum(a, b)[keep])
    s, d = _sym(pk >> np.int64(32), pk & np.int64((1 << 32) - 1))
    w = rng.integers(1, 6, size=len(s) // 2).astype(np.int64)
    w = np.concatenate([w, w])
    bc = kcore(_edges_w_ds(s, d, w), k=10, rounds=3, weight_col="w")
    pd.testing.assert_frame_equal(bc, _kcore_w_ref(s, d, w, 10, 3))
    jn = kcore(_edges_w_ds(s, d, w), k=10, rounds=3, weight_col="w",
               node_cap=0, num_partitions=4)
    pd.testing.assert_frame_equal(jn, bc)


@pytest.mark.parametrize("seed", [0, 1])
def test_lpa_vote_cap_paths_equal(ray_session, seed):
    """vote_cap=0 forces the groupby-Max winner path; default uses the
    single-exchange driver lexsort — bit-identical results."""
    from rayschema.graph import label_propagation

    rng = np.random.default_rng(seed + 40)
    m = 140
    src = rng.integers(0, 30, size=m).astype(np.int64)
    dst = rng.integers(0, 30, size=m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    fast = label_propagation(_edges_ds(src, dst), iters=3) \
        .sort_values("node").reset_index(drop=True)
    slow = label_propagation(_edges_ds(src, dst), iters=3, vote_cap=0) \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)
    pd.testing.assert_frame_equal(fast, _lpa_ref(src, dst, 3))


def test_pagerank_fold_cap_paths_equal(ray_session):
    """fold_cap=0 forces the per-superstep groupby path; the default
    driver contrib fold is bit-identical."""
    rng = np.random.default_rng(9)
    src = rng.integers(0, 20, size=80).astype(np.int64)
    dst = rng.integers(0, 20, size=80).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    fast = pagerank(_edges_ds(src, dst), iters=3) \
        .sort_values("node").reset_index(drop=True)
    slow = pagerank(_edges_ds(src, dst), iters=3, fold_cap=0) \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)
    pd.testing.assert_frame_equal(fast, _pagerank_ref(src, dst, 3))


def test_hits_fold_cap_paths_equal(ray_session):
    from rayschema.graph import hits

    rng = np.random.default_rng(13)
    src = (rng.integers(0, 12, size=60) * 2).astype(np.int64)
    dst = (rng.integers(0, 12, size=60) * 2 + 1).astype(np.int64)
    fast = hits(_edges_ds(src, dst), iters=2) \
        .sort_values(["side", "node"]).reset_index(drop=True)
    slow = hits(_edges_ds(src, dst), iters=2, fold_cap=0) \
        .sort_values(["side", "node"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)


def test_clustering_coeff_planted(ray_session, tmp_path):
    """K4 plus a pendant: clique nodes have cc = 1 (deg 3, 3 triangles),
    the bridge node's coefficient dilutes, the pendant (deg 1) is
    excluded."""
    import os

    import pyarrow.parquet as _pq

    from rayschema.queries import clustering_coeff_parts

    # orders: one order per edge of K4 {1,2,3,4} + edge 4-5 (pendant 5)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    ok = np.repeat(np.arange(1, len(edges) + 1, dtype=np.int64), 2)
    pk = np.array([p for e in edges for p in e], dtype=np.int64)
    _pq.write_table(pa.table({"l_orderkey": pa.array(ok),
                              "l_partkey": pa.array(pk)}),
                    os.path.join(tmp_path, "lineitem.parquet"))
    got = clustering_coeff_parts(str(tmp_path)).set_index("part_key")
    assert 5 not in got.index                 # deg 1 excluded
    for n in (1, 2, 3):
        assert got.loc[n, "cc_ppm"] == 1_000_000
        assert got.loc[n, "deg"] == 3 and got.loc[n, "n_triangles"] == 3
    # node 4: deg 4, 3 triangles -> 2*3/(4*3) = 0.5
    assert got.loc[4, "cc_ppm"] == 500_000


def test_bfs_hops_planted_chain_and_unreached(ray_session):
    from rayschema.graph import bfs_hops

    # undirected path 0-1-2-3 plus a disconnected 2-cycle {10, 11}:
    # hops follow the chain, the island never appears
    src = [0, 1, 1, 2, 2, 3, 10, 11]
    dst = [1, 0, 2, 1, 3, 2, 11, 10]
    out = bfs_hops(_edges_ds(src, dst), max_hops=6)
    exp = pd.DataFrame({"node": np.arange(4, dtype=np.int64),
                        "hops": np.arange(4, dtype=np.int64)})
    pd.testing.assert_frame_equal(out, exp)
    # bounded hop count truncates the frontier expansion
    out2 = bfs_hops(_edges_ds(src, dst), max_hops=2)
    assert out2["hops"].max() == 2 and len(out2) == 3
    # explicit source overrides the min-src default
    out3 = bfs_hops(_edges_ds(src, dst), source=10, max_hops=6)
    assert out3["node"].tolist() == [10, 11]
    assert out3["hops"].tolist() == [0, 1]


@pytest.mark.parametrize("seed", [0, 1])
def test_bfs_hops_join_path_matches_broadcast(ray_session, seed):
    from rayschema.graph import bfs_hops

    rng = np.random.default_rng(seed)
    src = rng.integers(0, 30, size=120).astype(np.int64)
    dst = rng.integers(0, 30, size=120).astype(np.int64)
    src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    bcast = bfs_hops(_edges_ds(src, dst), max_hops=3)
    joined = bfs_hops(_edges_ds(src, dst), max_hops=3, node_cap=1,
                      num_partitions=4)
    pd.testing.assert_frame_equal(bcast, joined)


def test_bfs_hops_empty_edges(ray_session):
    from rayschema.graph import bfs_hops

    out = bfs_hops(_edges_ds([], []))
    assert len(out) == 0 and list(out.columns) == ["node", "hops"]


def test_ppr_two_node_planted(ray_session):
    """Hand-traced 2 supersteps of personalized PageRank on 0 <-> 3,
    seed 0: iter1 -> (150000000, 850000000), iter2 ->
    (872500000, 127500000); all teleport mass returns to the seed."""
    out = pagerank(_edges_ds([0, 3], [3, 0]), iters=2, seed=0) \
        .sort_values("node").reset_index(drop=True)
    assert out["node"].tolist() == [0, 3]
    assert out["pr"].tolist() == [872_500_000, 127_500_000]


def test_ppr_join_path_matches_broadcast(ray_session):
    """node_cap=0 forces the join scale path; the personalized ranks
    must be bit-identical to the broadcast fold."""
    spokes = np.arange(1, 6, dtype=np.int64)
    src = np.concatenate([np.zeros(5, np.int64), spokes])
    dst = np.concatenate([spokes, np.zeros(5, np.int64)])
    a = pagerank(_edges_ds(src, dst), iters=3, seed=0) \
        .sort_values("node").reset_index(drop=True)
    b = pagerank(_edges_ds(src, dst), iters=3, seed=0, node_cap=0,
                 num_partitions=4) \
        .sort_values("node").reset_index(drop=True)
    assert a["pr"].tolist() == b["pr"].tolist()


def test_ppr_none_seed_unchanged(ray_session):
    """seed=None must stay bit-identical to the uniform recurrence."""
    spokes = np.arange(1, 6, dtype=np.int64)
    src = np.concatenate([np.zeros(5, np.int64), spokes])
    dst = np.concatenate([spokes, np.zeros(5, np.int64)])
    got = pagerank(_edges_ds(src, dst), iters=3).sort_values("node") \
        .reset_index(drop=True)
    ref = _pagerank_ref(src, dst, 3)
    assert got["pr"].tolist() == ref["pr"].tolist()
