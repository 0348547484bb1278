"""Distributed graph analytics on Ray Data.

A graph is an edge ``Dataset`` with int64 ``src``/``dst`` columns (directed;
emit both directions for an undirected graph). Algorithms run as synchronous
Pregel-style supersteps, each expressed as ONE ``map_batches`` partial
aggregate over the edge stream plus ONE node-keyed ``groupby`` — the edge
set never concentrates anywhere, and per-superstep state is O(nodes), not
O(edges).

All arithmetic is integer fixed-point (ppb rank units, floor division) so a
run is bit-exact under any partitioning and any batch order, and the whole
iteration can be mirrored verbatim in ANSI SQL for oracle checks (DuckDB
``//`` truncates, which equals floor on the all-positive values used here).

Scale notes: the rank/degree vectors are the classic broadcast candidates —
one ``ray.put`` per superstep, O(nodes) bytes. Past ``NODE_BROADCAST_CAP``
nodes the same superstep runs as a hash join of the edge stream against a
rank Dataset (equality-tested against the broadcast path), so node state is
never required to fit on the driver. Per-batch partial sums use
``np.bincount`` float64 weights, exact while node mass stays under 2**53
(~9e6 nodes at the default ppb scale); the cap enforces that bound.

Under ``fold_cap`` edges (10M default) the broadcast-path superstep skips
the all-to-all entirely: the node-bounded per-batch partials pull to the
driver and fold with int64 ``np.add.at`` — a pull of
min(edges, blocks x nodes) rows, the same order the rank broadcast already
implies (measured ~2-3x per-superstep on this box's fixed exchange
latency). Past the cap the groupby exchange returns, equality-tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

NODE_BROADCAST_CAP = 8_000_000   # nodes; keeps float64 partial sums exact
PR_INIT = 1_000_000_000          # rank_0 in parts-per-billion units
PR_BASE = 150_000_000            # (1 - d) * PR_INIT with d = 0.85
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def _np64(col) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def pagerank(edges, iters: int = 5, node_cap: int = NODE_BROADCAST_CAP,
             num_partitions: int = 32, init: int = PR_INIT,
             base: int = PR_BASE, weight_col: str = None,
             fold_cap: int = 10_000_000, seed: int = None) -> pd.DataFrame:
    """Integer-exact PageRank over an edge Dataset (src, dst int64).

    With ``seed`` set this is PERSONALIZED PageRank: pr_0(v) = init only
    at the seed (0 elsewhere) and the per-superstep teleport ``base``
    lands only on the seed — pr_{t+1}(v) = (base if v == seed else 0)
    + (85 * sum contrib) // 100. ``seed=None`` is bit-identical to the
    uniform recurrence below.

    Semantics (mirrorable in unrolled SQL CTEs; ``init``/``base`` pick the
    fixed-point unit — ppb by default, millionths for the near-dup-graph
    query whose oracle predates this module)::

        pr_0(v)     = init                                     for every node
        contrib(u)  = pr_t(u) // outdeg(u)                     (floor)
        pr_{t+1}(v) = base + (85 * sum_{u->v} contrib(u)) // 100

    With ``weight_col`` (int64 edge weights), outdeg becomes the weight
    SUM over u's out-edges and each edge contributes
    ``(pr_t(u) * w_e) // wout(u)`` — the floor is PER EDGE, exactly what
    ``sum((p.pr * e.w) // d.wout)`` computes in SQL. ``weight_col=None``
    is bit-identical to the unweighted recurrence above (w_e = 1).
    Weight bound: pr * w must stay under 2^63 (ppb rank x weight —
    ~9e9/init weight units per edge).

    Nodes are the union of src and dst endpoints; a node with no in-edges
    lands on exactly PR_BASE after the first superstep and keeps
    contributing from there, a node with no out-edges (dangling) absorbs
    mass without redistributing it — both choices are stated so the SQL
    oracle can reproduce them keyword for keyword.

    Under ``node_cap`` nodes the degree and rank vectors broadcast via ONE
    ``ray.put`` per superstep and each superstep is a single edge-stream
    pass (map_batches partial bincount -> groupby(dst).Sum). Past the cap
    the identical superstep runs join-side: edges ⋈ ranks on src (hash
    exchange), then the same groupby — O(nodes) never touches the driver.
    Returns a pandas DataFrame (node, pr) for the broadcast path and a
    node-count-bounded collect of the join path's final rank table.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    edges = edges.materialize()
    m_edges = edges.count()
    if m_edges == 0:
        return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                             "pr": pd.Series([], dtype=np.int64)})

    # node universe + out-degree in ONE partial-aggregated pass: src
    # endpoints carry their batch-local count, dst endpoints a 0 marker
    # (so a dst-only node — receives, never gives — still lands a row)
    def _deg_partial(b: pa.Table) -> pa.Table:
        s, d = _np64(b.column("src")), _np64(b.column("dst"))
        if weight_col is None:
            us, cs = np.unique(s, return_counts=True)
        else:
            w = _np64(b.column(weight_col))
            us, inv = np.unique(s, return_inverse=True)
            cs = np.bincount(inv, weights=w).astype(np.int64)
        ud = np.unique(d)
        return pa.table({
            "node": pa.array(np.concatenate([us, ud])),
            "dp": pa.array(np.concatenate(
                [cs.astype(np.int64), np.zeros(len(ud), np.int64)]))})

    deg_ds = None
    if m_edges <= fold_cap:
        # degree fold on the driver (partials are <= 2 x edges rows and
        # the contrib folds below already pull the same bound) — saves
        # the per-call node groupby shuffle
        dp = edges.map_batches(_deg_partial, batch_format="pyarrow") \
            .to_pandas()
        dd = dp.groupby("node", as_index=False)["dp"].sum() \
            .rename(columns={"dp": "deg"})
        n_nodes = len(dd)
    else:
        deg_ds = (edges.map_batches(_deg_partial, batch_format="pyarrow")
                  .groupby("node").aggregate(Sum("dp", alias_name="deg"))
                  ).materialize()
        n_nodes = deg_ds.count()

    if n_nodes <= node_cap:
        if deg_ds is not None:
            dd = deg_ds.to_pandas()
        dd = dd.sort_values("node")
        nodes = dd["node"].to_numpy(np.int64)
        deg = dd["deg"].to_numpy(np.int64)
        pr = np.full(len(nodes), init, dtype=np.int64) if seed is None \
            else np.where(nodes == seed, init, 0).astype(np.int64)
        tele = base if seed is None \
            else np.where(nodes == seed, base, 0).astype(np.int64)
        for _ in range(iters):
            ref = ray.put((nodes, deg, pr))

            def contrib(b: pa.Table, _r=ref) -> pa.Table:
                nd, dg, rk = ray.get(_r)
                s, d = _np64(b.column("src")), _np64(b.column("dst"))
                p = np.searchsorted(nd, s)
                num = rk[p] if weight_col is None \
                    else rk[p] * _np64(b.column(weight_col))
                c = num // np.maximum(dg[p], 1)     # deg>=1: s is a src
                ud, inv = np.unique(d, return_inverse=True)
                return pa.table({
                    "dst": pa.array(ud),
                    "c": pa.array(np.bincount(inv, weights=c)
                                  .astype(np.int64))})

            s = np.zeros(len(nodes), dtype=np.int64)
            if m_edges <= fold_cap:
                # driver contrib fold: per-batch (dst, c) partials are
                # node-bounded per block, so the pull is
                # <= min(edges, blocks x nodes) — np.add.at replaces
                # the per-superstep all-to-all (int64-exact, no float
                # mass bound involved)
                parts = (edges.map_batches(contrib,
                                           batch_format="pyarrow")
                         .to_pandas())
                np.add.at(s, np.searchsorted(
                    nodes, parts["dst"].to_numpy(np.int64)),
                    parts["c"].to_numpy(np.int64))
            else:
                agg = (edges.map_batches(contrib, batch_format="pyarrow")
                       .groupby("dst").aggregate(Sum("c", alias_name="s"))
                       .to_pandas())
                s[np.searchsorted(nodes,
                                  agg["dst"].to_numpy(np.int64))] = \
                    agg["s"].to_numpy(np.int64)
            pr = tele + (PR_DAMP_NUM * s) // PR_DAMP_DEN
        return pd.DataFrame({"node": nodes, "pr": pr})

    # ---- join scale path: node state never concentrates on the driver
    if deg_ds is None:
        # corner: edges under fold_cap but node universe over node_cap —
        # the folded degree table (edge-bounded) seeds the join path
        deg_ds = rd.from_arrow(pa.table({
            "node": pa.array(dd["node"].to_numpy(np.int64)),
            "deg": pa.array(dd["deg"].to_numpy(np.int64))})) \
            .repartition(num_partitions)
    nodes_ds = deg_ds.select_columns(["node"]).materialize()
    edeg = edges.join(deg_ds, join_type="inner",
                      num_partitions=num_partitions,
                      on=("src",), right_on=("node",),
                      right_suffix="_d").materialize()
    def _init_rank(b: pa.Table, _i=init, _s=seed) -> pa.Table:
        nd = _np64(b.column("node"))
        p = np.full(len(b), _i, dtype=np.int64) if _s is None \
            else np.where(nd == _s, _i, 0).astype(np.int64)
        return b.append_column("pr", pa.array(p))

    rank_ds = nodes_ds.map_batches(
        _init_rank, batch_format="pyarrow").materialize()
    for _ in range(iters):
        def contrib_j(b: pa.Table) -> pa.Table:
            d = _np64(b.column("dst"))
            num = _np64(b.column("pr")) if weight_col is None \
                else _np64(b.column("pr")) * _np64(b.column(weight_col))
            c = num // np.maximum(_np64(b.column("deg")), 1)
            ud, inv = np.unique(d, return_inverse=True)
            return pa.table({
                "dst": pa.array(ud),
                "c": pa.array(np.bincount(inv, weights=c)
                              .astype(np.int64))})

        agg = (edeg.join(rank_ds, join_type="inner",
                         num_partitions=num_partitions,
                         on=("src",), right_on=("node",))
               .map_batches(contrib_j, batch_format="pyarrow")
               .groupby("dst")
               .aggregate(Sum("c", alias_name="s")))
        # left join from the node universe keeps zero-in-degree nodes
        rank_ds = (nodes_ds.join(agg, join_type="left_outer",
                                 num_partitions=num_partitions,
                                 on=("node",), right_on=("dst",))
                   .map_batches(_fold_rank, batch_format="pyarrow",
                                fn_kwargs={"base": base, "seed": seed})
                   ).materialize()
    return (rank_ds.to_pandas().sort_values("node")
            .reset_index(drop=True))


def _fold_rank(b: pa.Table, base: int = PR_BASE,
               seed: int = None) -> pa.Table:
    import pyarrow.compute as pc

    s = pc.fill_null(b.column("s"), 0).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    tele = base if seed is None \
        else np.where(_np64(b.column("node")) == seed, base, 0) \
        .astype(np.int64)
    return pa.table({
        "node": b.column("node"),
        "pr": pa.array(tele + (PR_DAMP_NUM * s) // PR_DAMP_DEN)})


def _pair_index(sizes: np.ndarray):
    """Vectorized within-group combination indices: for contiguous groups of
    ``sizes`` rows, returns global (i, j) row indices for every unordered
    pair inside each group (i < j, row-order). Pure numpy — no Python loop
    over groups."""
    sizes = sizes.astype(np.int64)
    row_start = np.cumsum(sizes) - sizes
    n_rows = int(sizes.sum())
    if n_rows == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    rows = np.arange(n_rows, dtype=np.int64)
    local = rows - np.repeat(row_start, sizes)
    cnt_i = np.repeat(sizes, sizes) - 1 - local     # pairs each row starts
    total = int(cnt_i.sum())
    if total == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    i_idx = np.repeat(rows, cnt_i)
    off = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(cnt_i) - cnt_i, cnt_i)
    return i_idx, i_idx + 1 + off


def _csr_oriented(ea: np.ndarray, eb: np.ndarray):
    """Driver-side prep shared by every triangle path that has the DISTINCT
    edge list (a < b) in hand: node universe + degrees, the sorted packed
    edge-key membership array, and the degree-oriented CSR adjacency
    (orient each edge from its (deg, id)-smaller endpoint, bounding
    out-degree by O(sqrt(2m)) and total wedge volume by O(m^1.5)).
    Returns (nodes, degrees, indptr, adj, edge_keys)."""
    nd, dg = np.unique(np.concatenate([ea, eb]), return_counts=True)
    epk = np.sort((ea << np.int64(32)) | eb)
    da = dg[np.searchsorted(nd, ea)]
    db = dg[np.searchsorted(nd, eb)]
    a_first = da <= db            # a < b: (deg, id) order = degree compare
    s = np.where(a_first, ea, eb)
    d = np.where(a_first, eb, ea)
    order = np.lexsort((d, s))               # src-major, dst ascending
    s, d = s[order], d[order]
    si = np.searchsorted(nd, s)
    indptr = np.concatenate([
        np.searchsorted(si, np.arange(len(nd), dtype=np.int64)),
        [len(si)]]).astype(np.int64)
    return nd, dg, indptr, d, epk


def _close_wedges(nodes: np.ndarray, ptr: np.ndarray, adj: np.ndarray,
                  ek: np.ndarray, ords: np.ndarray):
    """Wedge generation + sorted-membership closure for a RANGE of source
    ordinals over the _csr_oriented structure — the per-block kernel of
    both the distributed broadcast path and the driver fold. Returns
    (node, tri) partial count arrays (every triangle credits its three
    corners exactly once: the orientation is acyclic, so each triangle
    has exactly one wedge apex)."""
    st, en = ptr[ords], ptr[ords + 1]
    sizes = en - st
    tot = int(sizes.sum())
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if not tot:
        return empty
    take = (np.repeat(st, sizes)
            + (np.arange(tot, dtype=np.int64)
               - np.repeat(np.cumsum(sizes) - sizes, sizes)))
    cd = adj[take]
    apex_per_row = np.repeat(nodes[ords], sizes)
    i_idx, j_idx = _pair_index(sizes)
    v, w = cd[i_idx], cd[j_idx]              # dst ascending: v < w
    pk = (v << np.int64(32)) | w
    pos = np.clip(np.searchsorted(ek, pk), 0, len(ek) - 1)
    hit = ek[pos] == pk
    allnodes = np.concatenate([apex_per_row[i_idx][hit], v[hit], w[hit]])
    if not len(allnodes):
        return empty
    u, inv = np.unique(allnodes, return_inverse=True)
    return u, np.bincount(inv).astype(np.int64)


def triangle_fold_arrays(ea: np.ndarray, eb: np.ndarray, blocks: int = 64):
    """Per-node triangle counts for DRIVER-RESIDENT distinct edges
    (a < b): the CSR structure broadcasts once and the wedge closure —
    the only data-sized work — runs as ONE rd.range map_batches whose
    node-bounded (node, tri) partials fold on the driver (the pagerank
    fold rationale: partials are <= blocks x nodes rows, the same O(nodes)
    pull the caller's degree/cc math already implies). Callers hold the
    edges already (the under-cap pair-distinct fold), so this adds ONE Ray
    execution total. Returns (nodes, degrees, n_triangles) aligned numpy
    arrays covering the full node universe (zero for triangle-free
    nodes)."""
    import ray
    import ray.data as rd

    if len(ea) == 0:
        z = np.empty(0, np.int64)
        return z, z, z
    nd, dg, indptr, adj, epk = _csr_oriented(ea, eb)
    ref = ray.put((nd, indptr, adj, epk))

    def count_range(b: pa.Table, _r=ref) -> pa.Table:
        nodes, ptr, adj_, ek = ray.get(_r)
        ords = b.column("id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        u, c = _close_wedges(nodes, ptr, adj_, ek, ords)
        return pa.table({"node": pa.array(u), "tri": pa.array(c)})

    pp = rd.range(len(nd), override_num_blocks=blocks).map_batches(
        count_range, batch_format="pyarrow").to_pandas()
    tri = np.zeros(len(nd), dtype=np.int64)
    if len(pp):
        u, inv = np.unique(pp["node"].to_numpy(np.int64),
                           return_inverse=True)
        cnt = np.bincount(inv, weights=pp["tri"].to_numpy(np.int64)) \
            .astype(np.int64)
        tri[np.searchsorted(nd, u)] = cnt
    return nd, dg, tri


def triangle_counts(pairs, node_cap: int = NODE_BROADCAST_CAP,
                    edge_broadcast_cap: int = 10_000_000):
    """Per-node triangle counts over an undirected graph given as a Dataset
    of DISTINCT edges (a < b, int64). Classic degree-oriented distributed
    algorithm (Cohen 2009 / Suri & Vassilvitskii 2011, public):

    1. degree per endpoint (one partial-aggregated groupby; the (node, deg)
       vector broadcasts once — O(nodes), ``node_cap`` documents the same
       bound pagerank's rank vector carries);
    2. orient every edge from its (deg, id)-smaller endpoint — out-degree
       is then O(sqrt(2m)), bounding wedge volume by O(m^1.5) total;
    3. wedges + closure, ADAPTIVE on edge count:
       - up to ``edge_broadcast_cap`` edges, the sorted packed edge-key
         array broadcasts once (8 B/edge) and each block of the single
         src-keyed sorted_group_scan closes its own wedges by
         searchsorted membership — wedges NEVER leave the worker; only
         per-block (node, count) partials (node-bounded) shuffle into the
         final groupby.Sum;
       - past the cap, wedges (packed v-w key, apex) UNION edge-marker
         rows (apex = -1) flow through a second pk-keyed scan — a wedge
         closes iff its group holds the marker. O(m^1.5) shuffle, no
         O(m) broadcast: the web-scale path.
       Each triangle decomposes uniquely (a triangle's orientation is
       acyclic, so exactly one vertex is its wedge apex), so both paths
       count every triangle exactly once per corner.

    Endpoint ids must fit 32 bits for the packed keys (documented — the
    same packing q20 and the pair-distinct stages use)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from rayschema.dedup import sorted_group_scan

    pairs = pairs.materialize()
    m = pairs.count()
    if m == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], type=pa.int64()),
            "n_triangles": pa.array([], type=pa.int64())}))

    if m <= edge_broadcast_cap:
        # ---- CSR-broadcast fast path: the edge list is O(m)-bounded, so
        # pull it ONCE, build the degree-oriented CSR adjacency + sorted
        # membership array on the driver, ray.put the lot, and stream the
        # node ordinals through ONE map_batches — no sort, no shuffle of
        # edges at all; only node-bounded (node, tri) partials move into
        # the final groupby (the exact_jaccard_pairs broadcast-plus-
        # streamed-ordinal-grid shape).
        edf = pairs.to_pandas()
        ea = edf["a"].to_numpy(np.int64)
        eb = edf["b"].to_numpy(np.int64)
        nd, dg, indptr, adj, epk = _csr_oriented(ea, eb)
        ref = ray.put((nd, indptr, adj, epk))

        def count_range(b: pa.Table, _r=ref) -> pa.Table:
            nodes, ptr, adj_, ek = ray.get(_r)
            ords = b.column("id").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            u, c = _close_wedges(nodes, ptr, adj_, ek, ords)
            return pa.table({"node": pa.array(u), "tri": pa.array(c)})

        counted = rd.range(len(nd), override_num_blocks=64).map_batches(
            count_range, batch_format="pyarrow")
        # per-block partials are unique-per-node, so the driver fold is
        # <= blocks x nodes rows — the same O(nodes) pull this path's CSR
        # broadcast already makes; ~10x cheaper than the node-keyed hash
        # groupby it replaces (the graph-family fold discipline)
        parts = counted.to_pandas()
        u, inv = np.unique(parts["node"].to_numpy(np.int64),
                           return_inverse=True)
        t = np.bincount(inv, weights=parts["tri"].to_numpy(np.int64)) \
            .astype(np.int64)
        return rd.from_arrow(pa.table({
            "node": pa.array(u), "n_triangles": pa.array(t)}))

    def deg_partial(b: pa.Table) -> pa.Table:
        both = np.concatenate([_np64(b.column("a")),
                               _np64(b.column("b"))])
        u, c = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(u),
                         "dp": pa.array(c.astype(np.int64))})

    dd = (pairs.map_batches(deg_partial, batch_format="pyarrow")
          .groupby("node").aggregate(Sum("dp", alias_name="deg"))
          .to_pandas().sort_values("node"))
    dref = ray.put((dd["node"].to_numpy(np.int64),
                    dd["deg"].to_numpy(np.int64)))

    def orient(b: pa.Table, _d=dref) -> pa.Table:
        nd, dg = ray.get(_d)
        a, bb = _np64(b.column("a")), _np64(b.column("b"))
        da, db = dg[np.searchsorted(nd, a)], dg[np.searchsorted(nd, bb)]
        # a < b always, so (deg, id) order reduces to a degree compare
        a_first = da <= db
        return pa.table({"src": pa.array(np.where(a_first, a, bb)),
                         "dst": pa.array(np.where(a_first, bb, a))})

    oriented = pairs.map_batches(orient, batch_format="pyarrow")
    cnt_schema = pa.schema([("node", pa.int64()), ("tri", pa.int64())])

    def _gather(starts, ends):
        sizes = (ends - starts).astype(np.int64)
        tot = int(sizes.sum())
        take = (np.repeat(starts, sizes)
                + (np.arange(tot, dtype=np.int64)
                   - np.repeat(np.cumsum(sizes) - sizes, sizes))) \
            if tot else np.empty(0, np.int64)
        return take, sizes

    # ---- marker-join closure: no O(m) broadcast (the web-scale path)
    wedge_schema = pa.schema([("pk", pa.int64()), ("apex", pa.int64())])

    def wedge_block(b: pa.Table, starts, ends, want) -> pa.Table:
        src = _np64(b.column("src"))
        dst = _np64(b.column("dst"))
        take, sizes = _gather(starts[want], ends[want])
        cd, cs = dst[take], src[take]
        i_idx, j_idx = _pair_index(sizes)
        v, w = cd[i_idx], cd[j_idx]   # dst sorted within group: v < w
        return pa.table({"pk": pa.array((v << np.int64(32)) | w),
                         "apex": pa.array(cs[i_idx])})

    def wedge_group(g: pa.Table) -> pa.Table:
        dst = np.sort(_np64(g.column("dst")))
        src = _np64(g.column("src"))
        i_idx, j_idx = _pair_index(np.array([len(dst)]))
        v, w = dst[i_idx], dst[j_idx]
        return pa.table({"pk": pa.array((v << np.int64(32)) | w),
                         "apex": pa.array(
                             np.full(len(v), src[0], dtype=np.int64))})

    wedges = sorted_group_scan(
        oriented, ["src"], wedge_group, wedge_schema,
        group_filter=lambda b, s, e: (e - s) >= 2,
        block_fn=wedge_block, sort_blocks=32, order_cols=["dst"])

    markers = pairs.map_batches(
        lambda b: pa.table({
            "pk": pa.array((_np64(b.column("a")) << np.int64(32))
                           | _np64(b.column("b"))),
            "apex": pa.array(np.full(b.num_rows, -1, dtype=np.int64))}),
        batch_format="pyarrow")

    def close_block(b: pa.Table, starts, ends, want) -> pa.Table:
        pk = _np64(b.column("pk"))
        apex = _np64(b.column("apex"))
        # marker sorts first within the group (apex ordered ascending)
        has_marker = apex[starts] == -1
        w = want & has_marker & ((ends - starts) >= 2)
        s, e = starts[w], ends[w]
        if not len(s):
            return None
        k = (e - s) - 1                       # triangles closing this edge
        a, bb = pk[s] >> np.int64(32), pk[s] & np.int64((1 << 32) - 1)
        tot = int(k.sum())
        take = (np.repeat(s + 1, k)
                + (np.arange(tot, dtype=np.int64)
                   - np.repeat(np.cumsum(k) - k, k)))
        return pa.table({
            "node": pa.array(np.concatenate([a, bb, apex[take]])),
            "tri": pa.array(np.concatenate(
                [k, k, np.ones(len(take), dtype=np.int64)]))})

    def close_group(g: pa.Table) -> pa.Table:
        apex = np.sort(_np64(g.column("apex")))
        pk = _np64(g.column("pk"))
        if len(apex) < 2 or apex[0] != -1:
            return None
        apexes = apex[1:]
        k = np.int64(len(apexes))
        a, bb = pk[0] >> np.int64(32), pk[0] & np.int64((1 << 32) - 1)
        return pa.table({
            "node": pa.array(np.concatenate([[a, bb], apexes])),
            "tri": pa.array(np.concatenate(
                [[k, k], np.ones(len(apexes), dtype=np.int64)]))})

    closed = sorted_group_scan(
        wedges.union(markers), ["pk"], close_group, cnt_schema,
        group_filter=lambda b, s, e: (e - s) >= 2,
        block_fn=close_block, sort_blocks=32, order_cols=["apex"])

    return (closed.groupby("node")
            .aggregate(Sum("tri", alias_name="n_triangles")))


def hits(edges, iters: int = 2, node_cap: int = NODE_BROADCAST_CAP,
         num_partitions: int = 32,
         fold_cap: int = 10_000_000) -> pd.DataFrame:
    """Integer-exact HITS (Kleinberg 1999, public) over a DIRECTED edge
    Dataset (src = hub side, dst = authority side). Semantics, mirrorable
    in unrolled SQL CTEs::

        h_0(u)   = PR_INIT                                 for every src node
        raw_a(v) = sum_{u->v} h(u)
        a(v)     = raw_a(v) // den,  den = (max raw_a + PR_INIT - 1) // PR_INIT
        raw_h(u) = sum_{u->v} a(v)
        h(u)     = raw_h(u) // den_h                       (same rule)

    The divide-by-ceil normalization keeps every value <= ~PR_INIT in
    int64 — no overflow at any graph size (the textbook multiply-then-
    divide would overflow int64 at ~10^4 nodes) — and floor division
    makes every iteration bit-reproducible. Each half-step is ONE
    edge-stream pass + ONE node-keyed groupby; score vectors broadcast
    per half-step under ``node_cap`` nodes, and past the cap the same
    half-step runs as edges ⋈ scores hash joins with a distributed
    ``Dataset.max`` for the denominator (equality-tested against the
    broadcast path). Returns (node, side, score) with side 'hub' for
    src nodes and 'auth' for dst nodes."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    edges = edges.materialize()
    m_edges = edges.count()
    if m_edges == 0:
        return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                             "side": pd.Series([], dtype=str),
                             "score": pd.Series([], dtype=np.int64)})

    def _side_partial(b: pa.Table) -> pa.Table:
        us = np.unique(_np64(b.column("src")))
        ud = np.unique(_np64(b.column("dst")))
        return pa.table({
            "node": pa.array(np.concatenate([us, ud])),
            "side": pa.array(np.concatenate(
                [np.zeros(len(us), np.int64),
                 np.ones(len(ud), np.int64)]))})

    sides = None
    if m_edges <= fold_cap:
        # side-universe fold on the driver (edge-bounded partials) —
        # saves the per-call (node, side) groupby shuffle
        sp = edges.map_batches(_side_partial, batch_format="pyarrow") \
            .to_pandas()
        sd = sp.drop_duplicates(["node", "side"])
        n_nodes = len(sd)
    else:
        sides = (edges.map_batches(_side_partial, batch_format="pyarrow")
                 .groupby(["node", "side"])
                 .aggregate(Count(alias_name="_n"))).materialize()
        n_nodes = sides.count()

    def _den(mx: int) -> int:
        return max((int(mx) + PR_INIT - 1) // PR_INIT, 1)

    if n_nodes <= node_cap:
        if sides is not None:
            sd = sides.to_pandas()
        hubs = np.sort(sd.loc[sd["side"] == 0, "node"]
                       .to_numpy(np.int64))
        auths = np.sort(sd.loc[sd["side"] == 1, "node"]
                        .to_numpy(np.int64))
        h = np.full(len(hubs), PR_INIT, dtype=np.int64)
        a = np.zeros(len(auths), dtype=np.int64)

        def _half(key_in, key_out, nodes_in, score_in, nodes_out):
            ref = ray.put((nodes_in, score_in))

            def part(b: pa.Table, _r=ref, _ki=key_in,
                     _ko=key_out) -> pa.Table:
                nd, sc = ray.get(_r)
                src = _np64(b.column(_ki))
                dst = _np64(b.column(_ko))
                c = sc[np.searchsorted(nd, src)]
                ud, inv = np.unique(dst, return_inverse=True)
                return pa.table({
                    "k": pa.array(ud),
                    "c": pa.array(np.bincount(inv, weights=c)
                                  .astype(np.int64))})

            raw = np.zeros(len(nodes_out), dtype=np.int64)
            if m_edges <= fold_cap:
                # driver fold of node-bounded per-batch partials —
                # no all-to-all per half-step (pagerank's fold_cap
                # rationale; int64-exact np.add.at)
                parts = (edges.map_batches(part, batch_format="pyarrow")
                         .to_pandas())
                np.add.at(raw, np.searchsorted(
                    nodes_out, parts["k"].to_numpy(np.int64)),
                    parts["c"].to_numpy(np.int64))
            else:
                agg = (edges.map_batches(part, batch_format="pyarrow")
                       .groupby("k").aggregate(Sum("c", alias_name="s"))
                       .to_pandas())
                raw[np.searchsorted(nodes_out,
                                    agg["k"].to_numpy(np.int64))] = \
                    agg["s"].to_numpy(np.int64)
            return raw // _den(raw.max())

        for _ in range(iters):
            a = _half("src", "dst", hubs, h, auths)
            h = _half("dst", "src", auths, a, hubs)
        return pd.DataFrame({
            "node": np.concatenate([hubs, auths]),
            "side": ["hub"] * len(hubs) + ["auth"] * len(auths),
            "score": np.concatenate([h, a])})

    # ---- join scale path: score vectors never touch the driver
    if sides is None:
        # corner: edges under fold_cap but node universe over node_cap
        sides = rd.from_arrow(pa.table({
            "node": pa.array(sd["node"].to_numpy(np.int64)),
            "side": pa.array(sd["side"].to_numpy(np.int64))})) \
            .repartition(num_partitions)
    hub_ds = (sides.filter(expr="side == 0").select_columns(["node"])
              ).materialize()
    auth_ds = (sides.filter(expr="side == 1").select_columns(["node"])
               ).materialize()

    def _with_score(ds, val: int):
        return ds.map_batches(
            lambda b, _v=val: b.append_column("score", pa.array(
                np.full(len(b), _v, dtype=np.int64))),
            batch_format="pyarrow").materialize()

    def _half_join(score_ds, key_in: str, key_out: str, out_nodes_ds):
        def part(b: pa.Table, _ko=key_out) -> pa.Table:
            dst = _np64(b.column(_ko))
            c = _np64(b.column("score"))
            ud, inv = np.unique(dst, return_inverse=True)
            return pa.table({
                "k": pa.array(ud),
                "c": pa.array(np.bincount(inv, weights=c)
                              .astype(np.int64))})

        agg = (edges.join(score_ds, join_type="inner",
                          num_partitions=num_partitions,
                          on=(key_in,), right_on=("node",))
               .map_batches(part, batch_format="pyarrow")
               .groupby("k").aggregate(Sum("c", alias_name="s"))
               ).materialize()
        den = _den(agg.max("s"))
        return (out_nodes_ds.join(agg, join_type="left_outer",
                                  num_partitions=num_partitions,
                                  on=("node",), right_on=("k",))
                .map_batches(_fold_score, batch_format="pyarrow",
                             fn_kwargs={"den": den})).materialize()

    h_ds = _with_score(hub_ds, PR_INIT)
    a_ds = None
    for _ in range(iters):
        a_ds = _half_join(h_ds, "src", "dst", auth_ds)
        h_ds = _half_join(a_ds, "dst", "src", hub_ds)
    hp = h_ds.to_pandas().sort_values("node")
    ap = a_ds.to_pandas().sort_values("node")
    return pd.DataFrame({
        "node": np.concatenate([hp["node"].to_numpy(np.int64),
                                ap["node"].to_numpy(np.int64)]),
        "side": ["hub"] * len(hp) + ["auth"] * len(ap),
        "score": np.concatenate([hp["score"].to_numpy(np.int64),
                                 ap["score"].to_numpy(np.int64)])})


def _fold_score(b: pa.Table, den: int = 1) -> pa.Table:
    import pyarrow.compute as pc

    s = pc.fill_null(b.column("s"), 0).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    return pa.table({"node": b.column("node"),
                     "score": pa.array(s // den)})


M32 = np.int64((1 << 32) - 1)   # packed-key label mask (ids must fit 31 bits)


def label_propagation(edges, iters: int = 3,
                      node_cap: int = NODE_BROADCAST_CAP,
                      num_partitions: int = 32,
                      vote_cap: int = 10_000_000) -> pd.DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007, public) over an
    edge Dataset (src, dst int64), made bit-deterministic so the whole
    iteration mirrors verbatim into unrolled SQL CTEs:

        lab_0(v)     = v
        lab_{t+1}(v) = the label with the highest count among
                       {lab_t(u) : u -> v}, smallest label on ties;
                       a node with no in-edges keeps lab_t(v)

    The (count-max, label-min) argmax is ONE integer Max per node: each
    (node, label, n) row packs ``n * 2^32 + (2^32 - 1 - label)`` and
    ``max`` of that key recovers the winning label exactly — the same
    trick DuckDB can run keyword for keyword. Requires node ids < 2^31
    and per-(node,label) in-counts < 2^31 (both documented bounds shared
    with the module's other packed keys).

    Each superstep is one edge-stream pass (per-batch partial counts on
    the packed (dst, label) key), one (pk) groupby.Sum and one (dst)
    groupby.Max — no O(edges) state anywhere. Under ``node_cap`` nodes
    the label vector broadcasts via ONE ``ray.put`` per superstep; past
    the cap the identical superstep runs as edges ⋈ labels hash joins
    with a left-outer fold back onto the node universe (equality-tested
    against the broadcast path). On the broadcast path, when the
    distinct (dst, label) vote table fits ``vote_cap`` rows the winner
    argmax runs as ONE driver lexsort on the already-aggregated counts
    instead of the second Max groupby — one all-to-all per superstep
    instead of two (equality-tested; force ``vote_cap=0`` for the
    groupby path). Returns pandas (node, label)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    edges = edges.materialize()
    m_edges = edges.count()
    if m_edges == 0:
        return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                             "label": pd.Series([], dtype=np.int64)})

    def _node_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([_np64(b.column("src")),
                                      _np64(b.column("dst"))]))
        return pa.table({"node": pa.array(u)})

    nodes_ds = None
    if m_edges <= vote_cap:
        # node-universe fold on the driver (edge-bounded partials,
        # the same O(m) pull the vote fold below already makes)
        nodes_arr = np.unique(
            edges.map_batches(_node_partial, batch_format="pyarrow")
            .to_pandas()["node"].to_numpy(np.int64))
        n_nodes = len(nodes_arr)
    else:
        nodes_ds = (edges.map_batches(_node_partial,
                                      batch_format="pyarrow")
                    .groupby("node").aggregate(Count(alias_name="_n"))
                    .select_columns(["node"])).materialize()
        n_nodes = nodes_ds.count()

    def _unpack_votes(b: pa.Table) -> pa.Table:
        pk = _np64(b.column("pk"))
        n = _np64(b.column("n"))
        lab = pk & M32
        return pa.table({
            "dst": pa.array(pk >> np.int64(32)),
            "key": pa.array((n << np.int64(32)) | (M32 - lab))})

    if n_nodes <= node_cap:
        if nodes_ds is not None:
            nodes_arr = np.sort(nodes_ds.to_pandas()["node"]
                                .to_numpy(np.int64))
        nodes = nodes_arr
        lab = nodes.copy()
        for _ in range(iters):
            ref = ray.put((nodes, lab))

            def votes(b: pa.Table, _r=ref) -> pa.Table:
                nd, lb = ray.get(_r)
                s, d = _np64(b.column("src")), _np64(b.column("dst"))
                ls = lb[np.searchsorted(nd, s)]
                pk, n = np.unique((d << np.int64(32)) | ls,
                                  return_counts=True)
                return pa.table({"pk": pa.array(pk),
                                 "n": pa.array(n.astype(np.int64))})

            if m_edges <= vote_cap:
                # edge-capped fast path (the triangle-count distinct
                # finding: driver np fold ~10x the Ray hash groupby at
                # ~1M keys): per-batch pre-aggregated (pk, n) partials
                # pull straight to the driver — NO all-to-all per
                # superstep; partial volume is <= edges, the same O(m)
                # bound the CSR triangle broadcast carries
                parts = (edges.map_batches(votes, batch_format="pyarrow")
                         .to_pandas())
                rk = parts["pk"].to_numpy(np.int64)
                rn = parts["n"].to_numpy(np.int64)
                pk_, inv = np.unique(rk, return_inverse=True)
                n_ = np.bincount(inv, weights=rn).astype(np.int64)
                dst = pk_ >> np.int64(32)
                lb_ = pk_ & M32
                key = (n_ << np.int64(32)) | (M32 - lb_)
                order = np.lexsort((-key, dst))
                first = np.ones(len(order), dtype=bool)
                ds_ = dst[order]
                first[1:] = ds_[1:] != ds_[:-1]
                new = lab.copy()
                new[np.searchsorted(nodes, ds_[first])] = \
                    M32 - (key[order][first] & M32)
                lab = new
                continue
            cnts = (edges.map_batches(votes, batch_format="pyarrow")
                    .groupby("pk").aggregate(Sum("n", alias_name="n"))
                    ).materialize()
            if cnts.count() <= vote_cap:
                # ADAPTIVE single-exchange winner: the distinct
                # (dst, label) table fits the same O(·)-bounded pull the
                # label broadcast already implies, so the argmax is one
                # driver lexsort instead of a second all-to-all Max
                # groupby (halves the per-superstep barrier count;
                # measured 24.6 -> ~14 s at sf0.1). Bit-identical: the
                # packed key ordering IS (count desc, label asc).
                vd = cnts.to_pandas()
                pk = vd["pk"].to_numpy(np.int64)
                n = vd["n"].to_numpy(np.int64)
                dst = pk >> np.int64(32)
                lb_ = pk & M32
                key = (n << np.int64(32)) | (M32 - lb_)
                order = np.lexsort((-key, dst))   # dst asc, key desc
                first = np.ones(len(order), dtype=bool)
                ds_ = dst[order]
                first[1:] = ds_[1:] != ds_[:-1]
                win_dst = ds_[first]
                win_lab = M32 - (key[order][first] & M32)
            else:
                agg = (cnts
                       .map_batches(_unpack_votes,
                                    batch_format="pyarrow")
                       .groupby("dst")
                       .aggregate(Max("key", alias_name="k"))
                       .to_pandas())
                win_dst = agg["dst"].to_numpy(np.int64)
                win_lab = M32 - (agg["k"].to_numpy(np.int64) & M32)
            new = lab.copy()
            new[np.searchsorted(nodes, win_dst)] = win_lab
            lab = new
        return pd.DataFrame({"node": nodes, "label": lab})

    # ---- join scale path: the label vector never touches the driver
    if nodes_ds is None:
        # corner: edges under vote_cap but node universe over node_cap
        nodes_ds = rd.from_arrow(pa.table({
            "node": pa.array(nodes_arr)})).repartition(num_partitions)
    lab_ds = nodes_ds.map_batches(
        lambda b: b.append_column("label", b.column("node")),
        batch_format="pyarrow").materialize()
    for _ in range(iters):
        def votes_j(b: pa.Table) -> pa.Table:
            d = _np64(b.column("dst"))
            ls = _np64(b.column("label"))
            pk, n = np.unique((d << np.int64(32)) | ls,
                              return_counts=True)
            return pa.table({"pk": pa.array(pk),
                             "n": pa.array(n.astype(np.int64))})

        agg = (edges.join(lab_ds, join_type="inner",
                          num_partitions=num_partitions,
                          on=("src",), right_on=("node",))
               .map_batches(votes_j, batch_format="pyarrow")
               .groupby("pk").aggregate(Sum("n", alias_name="n"))
               .map_batches(_unpack_votes, batch_format="pyarrow")
               .groupby("dst").aggregate(Max("key", alias_name="k")))
        lab_ds = (lab_ds.join(agg, join_type="left_outer",
                              num_partitions=num_partitions,
                              on=("node",), right_on=("dst",))
                  .map_batches(_fold_label, batch_format="pyarrow")
                  ).materialize()
    return (lab_ds.to_pandas().sort_values("node")
            .reset_index(drop=True))


def _fold_label(b: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    k = b.column("k")
    won = pc.is_valid(k).to_numpy(zero_copy_only=False)
    kv = pc.fill_null(k, 0).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    old = _np64(b.column("label"))
    return pa.table({
        "node": b.column("node"),
        "label": pa.array(np.where(won, M32 - (kv & M32), old))})


def kcore(edges, k: int, rounds: int = 3,
          node_cap: int = NODE_BROADCAST_CAP,
          num_partitions: int = 32, weight_col: str = None) -> pd.DataFrame:
    """Bounded-round k-core peeling (Seidman 1983 / Batagelj–Zaveršnik,
    public) over an edge Dataset (src, dst int64; emit both directions
    for an undirected graph). The round count is part of the operator's
    contract so the whole run mirrors verbatim into unrolled SQL CTEs
    (unbounded fixpoint peeling is not expressible in one ANSI query)::

        alive_0 = every node that appears as a src
        deg_r(v)  = |{u -> v : u, v both in alive_{r-1}}|
        alive_r   = {v : deg_r(v) >= k}          for r = 1..rounds
        output    = (v, core_deg) for v in alive_rounds, core_deg the
                    in-degree over the alive_rounds-induced subgraph
                    (a survivor whose induced in-degree is zero is
                    dropped — both paths and the SQL mirror agree)

    With ``weight_col`` (int64 edge weights) every degree above becomes
    the weight SUM (strength) over surviving in-edges — the s-core
    generalization (Eidsaa & Almaas 2013, public); ``weight_col=None``
    is bit-identical to the unweighted peel (w_e = 1).

    (On the symmetric graphs this module targets, src-universe = node
    universe and in-degree = degree; peeling converges in <= rounds
    supersteps whenever the cascade is that shallow, making the bounded
    answer the true k-core.)

    Each round is one edge-stream pass: per-batch partial in-degree
    counts over edges whose BOTH endpoints survive, one groupby.Sum and
    a >= k cut. Under ``node_cap`` nodes the alive set broadcasts as a
    sorted id array via ONE ``ray.put`` per round; past the cap the
    same round runs as edges semi-joined against the alive Dataset on
    src then dst (equality-tested against the broadcast path), so the
    membership vector never touches the driver. Returns pandas
    (node, core_deg) sorted by node."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    empty = pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                          "core_deg": pd.Series([], dtype=np.int64)})
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return empty

    if n_edges <= node_cap:
        # node universe <= edge count <= cap: distinct srcs fold on the
        # driver (per-batch unique partials, one np.unique) — no shuffle
        def _src_part(b: pa.Table) -> pa.Table:
            return pa.table({"src": pa.array(
                np.unique(_np64(b.column("src"))))})

        alive = np.unique(edges.map_batches(_src_part,
                                            batch_format="pyarrow")
                          .to_pandas()["src"].to_numpy(np.int64))
        n_nodes = len(alive)
    else:
        nodes_ds = (edges.groupby("src").aggregate(Count(alias_name="_n"))
                    .select_columns(["src"])).materialize()
        n_nodes = nodes_ds.count()

    if n_nodes <= node_cap:
        if n_edges > node_cap:   # distinct ran distributed; pull once
            alive = np.sort(nodes_ds.to_pandas()["src"]
                            .to_numpy(np.int64))

        def _deg(alive_arr: np.ndarray) -> pd.DataFrame:
            ref = ray.put(alive_arr)

            def part(b: pa.Table, _r=ref) -> pa.Table:
                av = ray.get(_r)
                s, d = _np64(b.column("src")), _np64(b.column("dst"))
                if not len(av):
                    keep = np.zeros(len(s), dtype=bool)
                else:
                    ps = np.minimum(np.searchsorted(av, s), len(av) - 1)
                    pd_ = np.minimum(np.searchsorted(av, d), len(av) - 1)
                    keep = (av[ps] == s) & (av[pd_] == d)
                if weight_col is None:
                    ud, cnt = np.unique(d[keep], return_counts=True)
                else:
                    w = _np64(b.column(weight_col))[keep]
                    ud, inv = np.unique(d[keep], return_inverse=True)
                    cnt = np.bincount(inv, weights=w).astype(np.int64)
                return pa.table({"node": pa.array(ud),
                                 "dp": pa.array(cnt.astype(np.int64))})

            # under node_cap the alive set already fits the driver, so
            # the per-block (node, dp) partials (<= nodes x blocks rows)
            # fold in a driver bincount instead of a per-round groupby
            # shuffle — 4 shuffles saved per kcore call
            part_df = edges.map_batches(part, batch_format="pyarrow") \
                .to_pandas()
            g = part_df.groupby("node", as_index=False)["dp"].sum() \
                .rename(columns={"dp": "deg"})
            g["node"] = g["node"].astype(np.int64)
            g["deg"] = g["deg"].astype(np.int64)
            return g

        for _ in range(rounds):
            dd = _deg(alive)
            alive = np.sort(dd.loc[dd["deg"] >= k, "node"]
                            .to_numpy(np.int64))
            if not len(alive):
                return empty
        out = _deg(alive)   # both-endpoints-alive filter: node set ⊆ alive
        return (out.rename(columns={"deg": "core_deg"})
                .sort_values("node").reset_index(drop=True))

    # ---- join scale path: the alive set never touches the driver
    alive_ds = nodes_ds.materialize()

    def _deg_ds(alive_in):
        surv = (edges.join(alive_in, join_type="inner",
                           num_partitions=num_partitions,
                           on=("src",), right_on=("src",),
                           right_suffix="_a")
                .join(alive_in.map_batches(
                    lambda b: b.rename_columns(["node"]),
                    batch_format="pyarrow"),
                    join_type="inner", num_partitions=num_partitions,
                    on=("dst",), right_on=("node",)))

        def part(b: pa.Table) -> pa.Table:
            if weight_col is None:
                ud, cnt = np.unique(_np64(b.column("dst")),
                                    return_counts=True)
            else:
                w = _np64(b.column(weight_col))
                ud, inv = np.unique(_np64(b.column("dst")),
                                    return_inverse=True)
                cnt = np.bincount(inv, weights=w).astype(np.int64)
            return pa.table({"node": pa.array(ud),
                             "dp": pa.array(cnt.astype(np.int64))})

        return (surv.map_batches(part, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("dp", alias_name="deg"))
                ).materialize()

    for _ in range(rounds):
        deg_ds = _deg_ds(alive_ds)
        alive_ds = (deg_ds.filter(expr=f"deg >= {int(k)}")
                    .select_columns(["node"])
                    .map_batches(lambda b: b.rename_columns(["src"]),
                                 batch_format="pyarrow")).materialize()
        if alive_ds.count() == 0:
            return empty
    out = _deg_ds(alive_ds).to_pandas()
    return (out.rename(columns={"deg": "core_deg"})
            .sort_values("node").reset_index(drop=True))


def bfs_hops(edges, source: int = None, max_hops: int = 6,
             node_cap: int = NODE_BROADCAST_CAP,
             num_partitions: int = 32) -> pd.DataFrame:
    """BFS hop distance from ``source`` (default: the smallest node id
    appearing as a src endpoint) over an edge Dataset (src, dst int64;
    emit both directions for an undirected graph). Classic synchronous
    frontier expansion (Pregel, Malewicz et al. 2010 — public): dist of
    the source is 0, and superstep h marks every UNVISITED dst whose
    src sits in the hop-(h-1) frontier with dist h, stopping on an
    empty frontier or after ``max_hops`` supersteps. The bounded hop
    count is part of the operator contract so the whole run mirrors
    verbatim into a ``WITH RECURSIVE`` SQL walk: UNION-deduplicated
    (node, hops) rows capped at hops < max_hops, then min(hops) per
    node — the minimum over all discovery levels IS the first-visit
    level a synchronous BFS assigns.

    Each superstep is ONE edge-stream pass: the sorted frontier array
    broadcasts via ``ray.put`` (O(frontier) <= O(nodes) bytes, the
    bound every algorithm in this module already accepts for its rank
    or label vector), each batch emits its distinct frontier-adjacent
    dsts, one node-keyed groupby dedups them, and the visited vector
    folds on the driver with setdiff1d — O(nodes) driver state. Past
    ``node_cap`` nodes the same superstep runs join-side: the frontier
    Dataset semi-joins the edge stream on src, the distinct dsts
    left-outer-join the visited Dataset and keep the null side
    (equality-tested against the broadcast path), so no node vector
    ever touches the driver. Returns pandas (node, hops) for every
    REACHED node, sorted by node."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    empty = pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                          "hops": pd.Series([], dtype=np.int64)})
    edges = edges.materialize()
    if edges.count() == 0:
        return empty
    if source is None:
        source = int(edges.min("src"))

    nodes_ds = (edges.groupby("src").aggregate(Count(alias_name="_n"))
                .select_columns(["src"])).materialize()
    n_nodes = nodes_ds.count()

    if n_nodes <= node_cap:
        visited = np.array([source], dtype=np.int64)
        hops = np.array([0], dtype=np.int64)
        frontier = visited
        for h in range(1, max_hops + 1):
            if not len(frontier):
                break
            ref = ray.put(np.sort(frontier))

            def part(b: pa.Table, _r=ref) -> pa.Table:
                f = ray.get(_r)
                s, d = _np64(b.column("src")), _np64(b.column("dst"))
                p = np.minimum(np.searchsorted(f, s), len(f) - 1)
                return pa.table({
                    "node": pa.array(np.unique(d[f[p] == s]))})

            nxt = (edges.map_batches(part, batch_format="pyarrow")
                   .groupby("node").aggregate(Count(alias_name="_n"))
                   .to_pandas()["node"].to_numpy(np.int64))
            new = np.setdiff1d(nxt, visited)
            if not len(new):
                break
            visited = np.concatenate([visited, new])
            hops = np.concatenate(
                [hops, np.full(len(new), h, dtype=np.int64)])
            frontier = new
        order = np.argsort(visited)
        return pd.DataFrame({"node": visited[order],
                             "hops": hops[order]})

    # ---- join scale path: frontier/visited stay distributed
    visited_ds = rd.from_arrow(pa.table({
        "node": pa.array([source], type=pa.int64()),
        "hops": pa.array([0], type=pa.int64())})).materialize()
    frontier_ds = visited_ds.select_columns(["node"]).materialize()
    for h in range(1, max_hops + 1):
        if frontier_ds.count() == 0:
            break
        cand = (edges.join(frontier_ds, join_type="inner",
                           num_partitions=num_partitions,
                           on=("src",), right_on=("node",),
                           right_suffix="_f")
                .groupby("dst").aggregate(Count(alias_name="_n"))
                .select_columns(["dst"])
                .map_batches(lambda b: b.rename_columns(["node"]),
                             batch_format="pyarrow"))
        def keep_unvisited(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return b.filter(pc.is_null(b.column("hops"))) \
                .select(["node"])

        new = (cand.join(visited_ds, join_type="left_outer",
                         num_partitions=num_partitions,
                         on=("node",), right_on=("node",),
                         right_suffix="_v")
               .map_batches(keep_unvisited,
                            batch_format="pyarrow")).materialize()
        if new.count() == 0:
            break

        def stamp(b: pa.Table, _h=h) -> pa.Table:
            return b.append_column(
                "hops", pa.array(np.full(b.num_rows, _h, np.int64)))

        visited_ds = visited_ds.union(
            new.map_batches(stamp, batch_format="pyarrow")).materialize()
        frontier_ds = new
    out = visited_ds.to_pandas()   # O(reached nodes), caller-bounded
    return out.sort_values("node").reset_index(drop=True)
