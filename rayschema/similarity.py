"""Similarity search over an embedding column (list<float>).

* ``brute_force_topk``: the exactness baseline — the query matrix is broadcast
  via ``ray.put`` ONCE; each batch computes a numpy matmul of its vectors
  against all queries and emits only its local top-k candidates (k rows per
  query per batch); the driver merges candidate sets (O(batches * k), tiny).
  No shuffle, reads stream.
* ``ivf_topk``: the scale path — a coarse k-means codebook trained on a small
  sample (driver-side), vectors assigned to their nearest centroid in a
  map_batches pass (written bucketed); queries probe only the ``nprobe``
  nearest centroid buckets. At 100 TB the bucket assignment is a one-off
  partitioned write and each query touches a fraction of the data.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def list_column_matrix(col) -> np.ndarray:
    """Arrow list<float> column -> (n, d) float64 matrix WITHOUT the
    per-row Python loop ``np.stack(col.to_numpy())`` pays: equal-width
    lists reshape the flat values buffer directly (one memcpy at most).
    Ragged or null-bearing columns fall back to np.stack."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count == 0:
        if pa.types.is_fixed_size_list(col.type):
            d = col.type.list_size
            vals = col.values.to_numpy(zero_copy_only=False)
            return vals.reshape(len(col), d).astype(np.float64, copy=False)
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            offs = col.offsets.to_numpy()
            widths = np.diff(offs)
            if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
                vals = col.values.to_numpy(zero_copy_only=False)
                return vals[offs[0]:offs[-1]] \
                    .reshape(len(col), int(widths[0])) \
                    .astype(np.float64, copy=False)
    return np.stack(col.to_numpy(zero_copy_only=False)).astype(np.float64)


class BatchTopK:
    """Actor stage: per-batch cosine top-k against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int = 10, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = _normalize(list_column_matrix(col))
        ids = np.asarray(batch.column(self.id_col).to_pylist())
        sims = mat @ self.q.T                      # (n, nq)
        n, nq = sims.shape
        k = min(self.k, n)
        top = np.argpartition(-sims, k - 1, axis=0)[:k]   # (k, nq)
        out_q, out_id, out_sim = [], [], []
        for qi in range(nq):
            sel = top[:, qi]
            out_q.append(np.full(k, qi, dtype=np.int64))
            out_id.append(ids[sel])
            out_sim.append(sims[sel, qi])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            self.id_col: pa.array(np.concatenate(out_id)),
            "cosine": pa.array(np.concatenate(out_sim)),
        })


BRUTE_TOPK_INPROC_CAP = 20_000   # corpus vectors under which the scan runs
#                                  in-process through the SAME BatchTopK
#                                  kernel (the minhash-inproc discipline);
#                                  the actor-pool stream stays the path at
#                                  scale


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     concurrency=(1, 8), n_rows: int = None) -> pd.DataFrame:
    """Exact cosine top-k for each query row; returns a DataFrame
    (query_id, vec_id, cosine, rank) with deterministic tie-break on id.
    ``n_rows`` (a parquet-footer count from the caller) gates a fused
    in-process path for small corpora."""
    import ray

    if n_rows is not None and n_rows <= BRUTE_TOPK_INPROC_CAP:
        t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
        stage = BatchTopK(np.asarray(queries, dtype=np.float64), k=k,
                          id_col=id_col, vec_col=vec_col)
        df = stage(t).to_pandas()
    else:
        qref = ray.put(np.asarray(queries, dtype=np.float64))
        cand = ds.map_batches(
            BatchTopK,
            fn_constructor_kwargs=dict(queries_ref=qref, k=k,
                                       id_col=id_col, vec_col=vec_col),
            batch_format="pyarrow", concurrency=concurrency)
        df = cand.to_pandas()                    # O(batches * k * nq) — small
    df = df.sort_values(["query_id", "cosine", id_col],
                        ascending=[True, False, True], kind="mergesort")
    df = df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    from rayschema.dedup import round_half_away
    df["cosine"] = round_half_away(df["cosine"].to_numpy(), 6)
    return df


# --------------------------------------------------------------------------- distributed k-means
def kmeans_quantized(ds, k: int = 4, iters: int = 2, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     init_cent: np.ndarray = None) -> pd.DataFrame:
    """DISTRIBUTED Lloyd k-means whose every step is integer-exact, so even
    this iterative algorithm gets a full DuckDB oracle (most engines settle
    for a rows-only check on iterative ML):

    * vectors quantized to 1e-6 integers (round half-away = SQL round);
    * assignment by squared EUCLIDEAN distance in pure int64 (argmin with
      lowest-cluster tie-break == row_number() ORDER BY dist, cluster);
    * centroid update = per-dim rounded integer mean
      sign(s) * ((2|s| + n) // (2n)) — no float division on either side;
    * deterministic init: the quantized vectors of ``id_col`` 0..k-1.

    Each iteration is ONE streaming pass: an actor-free map_batches emits
    per-batch per-cluster (count, dim-sum) partials — k x (dim+1) numbers
    per batch — and the driver folds them and broadcasts the updated
    centroid matrix via ray.put. At 100 TB that is iters sequential scans
    with metadata-sized driver state; no shuffle at any point.

    Returns long-form (cluster, d, c, n_members): d is the 1-based
    dimension, c the quantized centroid component after the final update,
    n_members the final assignment's cluster size.

    ``init_cent`` (k, dim) int64 skips the init fetch when the caller
    already holds the quantized vectors of ids 0..k-1 (PQ trains m
    codebooks off ONE prefetched init read instead of m filter scans)."""
    import ray

    from rayschema.dedup import round_half_away

    if init_cent is not None:
        cent = np.asarray(init_cent, dtype=np.int64).copy()   # (k, dim)
        if cent.shape[0] != k:
            raise ValueError(f"init_cent has {cent.shape[0]} rows, need {k}")
    else:
        init = (ds.filter(expr=f"{id_col} < {k}").to_pandas()
                .sort_values(id_col))
        if list(init[id_col]) != list(range(k)):
            raise ValueError(
                f"kmeans_quantized init needs {id_col} 0..{k - 1} present "
                f"(the deterministic-init/oracle contract); found "
                f"{list(init[id_col])[:k + 2]}")
        # float64 BEFORE the 1e6 scale: the stored vectors are float32, and
        # scaling in float32 rounds differently than SQL's ::DOUBLE promotion
        cent = round_half_away(
            np.stack(init[vec_col].to_numpy()).astype(np.float64) * 1e6, 0) \
            .astype(np.int64)                                   # (k, dim)
    dim = cent.shape[1]
    counts = np.zeros(k, dtype=np.int64)

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(b: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            col = b.column(vec_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if len(col) == 0:          # empty block (repartition/filter)
                return pa.table({
                    "cluster": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.list_(pa.int64()))})
            q = round_half_away(
                list_column_matrix(col) * 1e6, 0).astype(np.int64)
            qq = (q * q).sum(axis=1)
            cc = (c * c).sum(axis=1)
            dist = qq[:, None] - 2 * (q @ c.T) + cc[None, :]   # int64 exact
            assign = dist.argmin(axis=1)       # first min = lowest cluster
            cnt = np.bincount(assign, minlength=len(c)).astype(np.int64)
            sums = np.zeros((len(c), q.shape[1]), dtype=np.int64)
            np.add.at(sums, assign, q)
            return pa.table({
                "cluster": pa.array(np.arange(len(c), dtype=np.int64)),
                "cnt": pa.array(cnt),
                "s": pa.array(list(sums), type=pa.list_(pa.int64())),
            })

        part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.int64)
        for cl, cnt, s in zip(part["cluster"], part["cnt"], part["s"]):
            counts[int(cl)] += int(cnt)
            sums[int(cl)] += np.asarray(s, dtype=np.int64)
        nz = counts > 0
        n = counts[nz][:, None]
        s = sums[nz]
        cent[nz] = np.sign(s) * ((2 * np.abs(s) + n) // (2 * n))
        # empty clusters keep their previous centroid

    return pd.DataFrame({
        "cluster": np.repeat(np.arange(k, dtype=np.int64), dim),
        "d": np.tile(np.arange(1, dim + 1, dtype=np.int64), k),
        "c": cent.reshape(-1),
        "n_members": np.repeat(counts, dim),
    })


# --------------------------------------------------------------------------- IVF
def train_codebook(sample: np.ndarray, n_clusters: int = 16, iters: int = 10,
                   seed: int = 99) -> np.ndarray:
    """Tiny Lloyd's k-means on a driver-side sample (cosine space)."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        sim = x @ cent.T
        assign = sim.argmax(axis=1)
        for c in range(len(cent)):
            sel = x[assign == c]
            if len(sel):
                cent[c] = sel.mean(axis=0)
        cent = _normalize(cent)
    return cent


class IvfAssign:
    """Actor stage: nearest-centroid bucket id per vector."""

    def __init__(self, codebook_ref, vec_col: str = "embedding", out: str = "ivf_bucket"):
        import ray

        cb = ray.get(codebook_ref) if not isinstance(codebook_ref, np.ndarray) else codebook_ref
        self.cent = _normalize(np.asarray(cb, dtype=np.float64))
        self.vec_col = vec_col
        self.out = out

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = _normalize(list_column_matrix(col))
        assign = (mat @ self.cent.T).argmax(axis=1).astype(np.int32)
        return batch.append_column(self.out, pa.array(assign))


def ivf_topk(ds, queries: np.ndarray, k: int = 10, n_clusters: int = 16,
             nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
             sample_size: int = 2048, concurrency=(1, 8), seed: int = 99) -> pd.DataFrame:
    """Approximate top-k: probe only the nprobe nearest IVF buckets per query.

    Returns (query_id, vec_id, cosine, rank). Recall < 1 by design; the
    brute-force path is the correctness baseline."""
    import ray

    # UNIFORM random sample for the codebook (a head sample is biased on
    # sorted / clustered-by-file corpora and wrecks tail recall)
    n_total = ds.count()
    frac = min(1.0, (sample_size * 1.25) / max(n_total, 1))
    sample = (ds.select_columns([vec_col]).random_sample(frac, seed=seed)
              .limit(sample_size).to_pandas()[vec_col])
    if len(sample) < n_clusters:
        sample = ds.limit(max(n_clusters, sample_size)).to_pandas()[vec_col]
    cb = train_codebook(np.stack(sample.to_numpy()), n_clusters, seed=seed)
    cbref = ray.put(cb)
    assigned = ds.map_batches(IvfAssign,
                              fn_constructor_kwargs=dict(codebook_ref=cbref, vec_col=vec_col),
                              batch_format="pyarrow", concurrency=concurrency)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ cb.T), axis=1)[:, :nprobe]        # (nq, nprobe)
    wanted = sorted({int(b) for row in probe for b in row})
    # materialize ONLY the probed-bucket subset: both the top-k pass and the
    # per-hit bucket lookup below read it without re-executing assignment,
    # and nothing larger than the probed fraction ever reaches the driver
    flt = assigned.filter(expr=f"ivf_bucket in {wanted}" if len(wanted) > 1
                          else f"ivf_bucket == {wanted[0]}").materialize()
    # over-fetch: the subset union covers ALL queries' probed buckets, so a
    # query's strict top-k there can sit in buckets it did not probe and be
    # filtered below — fetch 4k candidates, trim to k after the probe filter
    df = brute_force_topk(flt, queries, k=4 * k, id_col=id_col, vec_col=vec_col,
                          concurrency=concurrency)
    # drop hits from buckets a given query did not probe — vectorized:
    # a (nq, n_clusters) probe mask indexed by (query_id, bucket) per hit
    probe_mask = np.zeros((len(q), len(cb)), dtype=bool)
    for qi in range(len(q)):
        probe_mask[qi, probe[qi]] = True
    id_bucket = flt.select_columns([id_col, "ivf_bucket"]).to_pandas()
    merged = df.merge(id_bucket, on=id_col, how="left")
    buckets = merged["ivf_bucket"].fillna(-1).to_numpy().astype(np.int64)
    qids = merged["query_id"].to_numpy().astype(np.int64)
    keep = (buckets >= 0) & probe_mask[qids, np.maximum(buckets, 0)]
    out = df[keep].groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    if len(out):
        out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


class SrpBander:
    """Actor stage: DETERMINISTIC sign-random-projection LSH bands over an
    embedding column — every arithmetic step is SQL-mirrorable, so the
    driver oracle can recompute the exact same buckets:

    * embeddings quantized to 1e-6 integers (round half-away, DuckDB round
      semantics) — projections become EXACT integer sums, immune to float
      summation-order differences between numpy and SQL;
    * hyperplane j's ±1 pattern is the fixed integer formula
      ``((i * (j+1) * 2654435761) % 97) % 2`` over 1-based dimension i;
    * ``bits`` sign bits are packed into ``bits // band_width`` band columns
      ``srp_band_{k}`` (two vectors are LSH-matched when ANY band is equal).

    The quality trade vs HyperplaneLSH (gaussian planes) is modest — ±1
    planes are standard SRP — and in exchange the recall of the whole scheme
    becomes a DuckDB-checkable quantity (queries.lsh_recall_report)."""

    def __init__(self, id_col: str = "vec_id", vec_col: str = "embedding",
                 bits: int = 16, band_width: int = 4):
        assert bits % band_width == 0
        self.id_col = id_col
        self.vec_col = vec_col
        self.bits = bits
        self.band_width = band_width
        self._signs = None   # (bits, dim), built on first batch

    def _get_signs(self, dim: int) -> np.ndarray:
        if self._signs is None or self._signs.shape[1] != dim:
            i = np.arange(1, dim + 1, dtype=np.int64)
            rows = []
            for j in range(self.bits):
                rows.append(np.where(((i * (j + 1) * 2654435761) % 97) % 2 == 0,
                                     1, -1).astype(np.int64))
            self._signs = np.stack(rows)
        return self._signs

    def __call__(self, batch: pa.Table) -> pa.Table:
        from rayschema.dedup import round_half_away

        col = batch.column(self.vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = list_column_matrix(col)
        q = round_half_away(mat * 1e6, 0).astype(np.int64)
        signs = self._get_signs(mat.shape[1])
        dots = q @ signs.T                                   # (n, bits) exact
        n_bands = self.bits // self.band_width
        out = {self.id_col: batch.column(self.id_col)}
        for k in range(n_bands):
            bb = np.zeros(len(mat), dtype=np.int64)
            for r in range(self.band_width):
                j = k * self.band_width + r
                bb |= (dots[:, j] >= 0).astype(np.int64) << r
            out[f"srp_band_{k}"] = pa.array(bb)
        return pa.table(out)


# --------------------------------------------------------------------------- product quantization


def _slice_vec_ds(ds, lo: int, hi: int, id_col: str = "vec_id",
                  vec_col: str = "embedding"):
    """Derive a dataset whose vector column is dims [lo, hi) of the
    source's — float32 preserved so the downstream 1e6 quantization's
    float64 promotion matches SQL ``embedding[i]::DOUBLE`` exactly."""

    def sl(b: pa.Table) -> pa.Table:
        col = b.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                vec_col: pa.array([], type=pa.list_(pa.float32()))})
        mat = np.stack(col.to_numpy(zero_copy_only=False))[:, lo:hi]
        return pa.table({
            id_col: b.column(id_col).cast(pa.int64()),
            vec_col: pa.array(list(mat), type=pa.list_(pa.float32()))})

    return ds.map_batches(sl, batch_format="pyarrow")


def pq_train_codebooks(ds, m: int, sub_dims: int, k: int = 4,
                       iters: int = 2, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> np.ndarray:
    """Train one integer-exact k-means codebook per PQ subspace (the
    kmeans_quantized contract per chunk). Runs the m trainings as
    separate scan sets for clarity; at 100 TB you'd fold all subspaces'
    per-cluster partials into ONE pass per Lloyd iteration (the partial
    tables are independent, so the fusion is mechanical) or train on a
    sample — the full-corpus form here is what the oracle unrolls.
    Returns (m, k, sub_dims) int64 centroids.

    FUSED: all m subspaces train in the SAME scan — each Lloyd iteration
    is ONE map_batches pass emitting (sub, cluster, cnt, sums) partials
    for every subspace (m·k·(sub_dims+2) numbers per batch), so training
    costs ``iters`` corpus scans total instead of ``m · iters``. The
    per-subspace integer sums are order-free, so the result is
    bit-identical to m separate kmeans_quantized runs (equality-tested).
    """
    import ray

    from rayschema.dedup import round_half_away

    # ONE init fetch for all subspaces (slicing commutes with the
    # float64-promote + 1e6 quantization, so per-subspace init values are
    # identical to fetching each sliced dataset separately)
    init = (ds.filter(expr=f"{id_col} < {k}").to_pandas()
            .sort_values(id_col))
    if list(init[id_col]) != list(range(k)):
        raise ValueError(
            f"pq_train_codebooks init needs {id_col} 0..{k - 1} present; "
            f"found {list(init[id_col])[:k + 2]}")
    init_q = round_half_away(
        np.stack(init[vec_col].to_numpy()).astype(np.float64) * 1e6, 0) \
        .astype(np.int64)                                   # (k, m*sub)
    cents = np.stack([init_q[:, mi * sub_dims:(mi + 1) * sub_dims]
                      for mi in range(m)])                  # (m, k, sub)

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(b: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)                               # (m, k, sub)
            col = b.column(vec_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if len(col) == 0:
                return pa.table({
                    "sub": pa.array([], type=pa.int64()),
                    "cluster": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.list_(pa.int64()))})
            q = round_half_away(
                list_column_matrix(col) * 1e6, 0).astype(np.int64)
            subs, clus, cnts, sums_l = [], [], [], []
            for mi in range(len(c)):
                qs = q[:, mi * sub_dims:(mi + 1) * sub_dims]
                cm = c[mi]
                dist = ((qs * qs).sum(axis=1)[:, None] - 2 * (qs @ cm.T)
                        + (cm * cm).sum(axis=1)[None, :])
                assign = dist.argmin(axis=1)
                cnt = np.bincount(assign, minlength=k).astype(np.int64)
                sm = np.zeros((k, sub_dims), dtype=np.int64)
                np.add.at(sm, assign, qs)
                subs.append(np.full(k, mi, dtype=np.int64))
                clus.append(np.arange(k, dtype=np.int64))
                cnts.append(cnt)
                sums_l.extend(list(sm))
            return pa.table({
                "sub": pa.array(np.concatenate(subs)),
                "cluster": pa.array(np.concatenate(clus)),
                "cnt": pa.array(np.concatenate(cnts)),
                "s": pa.array(sums_l, type=pa.list_(pa.int64()))})

        part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        counts = np.zeros((m, k), dtype=np.int64)
        sums = np.zeros((m, k, sub_dims), dtype=np.int64)
        for mi, cl, cnt, s in zip(part["sub"], part["cluster"],
                                  part["cnt"], part["s"]):
            counts[int(mi), int(cl)] += int(cnt)
            sums[int(mi), int(cl)] += np.asarray(s, dtype=np.int64)
        nz = counts > 0
        n = counts[nz][:, None]
        s = sums[nz]
        cents[nz] = np.sign(s) * ((2 * np.abs(s) + n) // (2 * n))
        # empty clusters keep their previous centroid (same rule as
        # kmeans_quantized)

    return cents


def pq_encode(ds, cents: np.ndarray, id_col: str = "vec_id",
              vec_col: str = "embedding"):
    """Encode every vector to its per-subspace nearest-centroid codes plus
    the total integer squared-euclidean quantization error — ONE stateless
    streaming pass with the (m, k, sub_dims) codebook broadcast via
    ray.put (at 1e6-quantized magnitudes the per-vector error stays far
    inside int64). Emits (vec_id, code_1..code_m, pq_err)."""
    import ray

    from rayschema.dedup import round_half_away

    m, _, sub_dims = cents.shape
    ref = ray.put(cents)

    def encode(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        col = b.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        cols = {id_col: pa.array([], type=pa.int64())}
        for mi in range(m):
            cols[f"code_{mi + 1}"] = pa.array([], type=pa.int64())
        cols["pq_err"] = pa.array([], type=pa.int64())
        if n == 0:
            return pa.table(cols)
        q = round_half_away(
            list_column_matrix(col) * 1e6, 0).astype(np.int64)
        out = {id_col: b.column(id_col).cast(pa.int64())}
        err = np.zeros(n, dtype=np.int64)
        rows = np.arange(n)
        for mi in range(m):
            sub = q[:, mi * sub_dims:(mi + 1) * sub_dims]
            cm = c[mi]
            dist = ((sub * sub).sum(axis=1)[:, None] - 2 * (sub @ cm.T)
                    + (cm * cm).sum(axis=1)[None, :])
            a = dist.argmin(axis=1)            # first min = lowest code
            out[f"code_{mi + 1}"] = pa.array(a.astype(np.int64))
            err += dist[rows, a]
        out["pq_err"] = pa.array(err)
        return pa.table(out)

    return ds.map_batches(encode, batch_format="pyarrow")


def semdedup(ds, k: int = 4, iters: int = 2, threshold: float = 0.4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             concurrency=(1, 8), strategy: str = "scan"):
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding corpus with the
    integer-exact distributed k-means (``kmeans_quantized``), then inside
    each cluster drop every vector that has a LOWER-id member at exact
    cosine >= ``threshold``. Clustering makes the quadratic cosine check
    local: at scale only same-cluster pairs are ever compared.

    Every stage is deterministic and SQL-mirrorable, so the whole
    pipeline gets a full DuckDB oracle (k-means CTE chain + integer
    argmin assignment + list_cosine_similarity within-cluster pairs):

    * codebook: ``kmeans_quantized`` (quantized vectors, int64 argmin,
      rounded-integer-mean updates);
    * assignment: the SAME int64 squared-euclidean argmin with
      lowest-cluster tie-break, computed once and broadcast so the pair
      scan and the output agree row for row;
    * verify: exact float64 cosine of the normalized vectors (the
      convention the ``embedding_near_dup`` oracle hash-matches).

    Two equality-tested execution strategies (identical output rows):

    * ``strategy="scan"`` (DEFAULT — the 100-TB path): assignment is a
      stateless map (only the k x dim integer codebook broadcasts), then
      ONE cluster-keyed ``sorted_group_scan`` co-locates each cluster and
      runs the lower-id cosine removal inside the group, chunked so the
      similarity block never exceeds 4096 x cluster_size. Driver state is
      the codebook plus the <=2-groups-per-block boundary residual; no
      corpus matrix ever materializes. Partitioning assumption: one
      cluster's vectors fit a worker block — at scale you grow ``k`` with
      the corpus (SemDeDup uses cluster sizes of ~10^3-10^4), which also
      keeps the quadratic in-cluster check bounded.
    * ``strategy="broadcast"``: the small-input baseline — the normalized
      corpus matrix + assignment ship once via ray.put and each batch
      streams a block-row of the similarity matrix (bound ~10^7 x 10^2
      dims, same as ``embedding_cosine_pairs_exact``).

    Returns a Dataset of KEPT rows ``(id_col, cluster)``.
    """
    import ray

    from rayschema.dedup import round_half_away, sorted_group_scan

    km = kmeans_quantized(ds, k=k, iters=iters, id_col=id_col,
                          vec_col=vec_col)
    cent = (km.sort_values(["cluster", "d"])["c"]
            .to_numpy(np.int64).reshape(k, -1))

    if strategy == "scan":
        cent_ref = ray.put(cent)

        def assign(b: pa.Table, _cref=cent_ref) -> pa.Table:
            c = ray.get(_cref)
            col = b.column(vec_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if len(col) == 0:
                return pa.table({
                    id_col: pa.array([], type=pa.int64()),
                    "cluster": pa.array([], type=pa.int64()),
                    vec_col: b.column(vec_col)})
            mat = list_column_matrix(col)
            q = round_half_away(mat * 1e6, 0).astype(np.int64)
            dist = ((q * q).sum(axis=1)[:, None] - 2 * (q @ c.T)
                    + (c * c).sum(axis=1)[None, :])
            return pa.table({
                id_col: b.column(id_col).cast(pa.int64()),
                "cluster": pa.array(dist.argmin(axis=1).astype(np.int64)),
                vec_col: col})

        tagged = ds.select_columns([id_col, vec_col]) \
            .map_batches(assign, batch_format="pyarrow")
        out_schema = pa.schema([(id_col, pa.int64()),
                                ("cluster", pa.int64())])

        def cluster_group(t: pa.Table):
            ids = t.column(id_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            col = t.column(vec_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            m = _normalize(list_column_matrix(col))
            keep = np.ones(len(ids), dtype=bool)
            for s in range(0, len(ids), 4096):
                e = min(s + 4096, len(ids))
                sims = m[s:e] @ m.T
                hit = (sims >= threshold) & (ids[None, :] < ids[s:e, None])
                keep[s:e] = ~hit.any(axis=1)
            ka = pa.array(keep)
            return pa.table({
                id_col: t.column(id_col).cast(pa.int64()).filter(ka),
                "cluster": t.column("cluster").filter(ka)})

        return sorted_group_scan(tagged, ["cluster"], cluster_group,
                                 out_schema, order_cols=[id_col])

    full = (ds.select_columns([id_col, vec_col]).to_pandas()
            .sort_values(id_col))
    ids = full[id_col].to_numpy(np.int64)
    mat = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    q = round_half_away(mat * 1e6, 0).astype(np.int64)
    dist = ((q * q).sum(axis=1)[:, None] - 2 * (q @ cent.T)
            + (cent * cent).sum(axis=1)[None, :])
    corp_cluster = dist.argmin(axis=1).astype(np.int64)
    ref = ray.put((ids, corp_cluster, _normalize(mat)))

    def scan(b: pa.Table, _ref=ref) -> pa.Table:
        cids, ccl, cmat = ray.get(_ref)
        col = b.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "cluster": pa.array([], type=pa.int64())})
        rid = b.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rows = _normalize(list_column_matrix(col))
        # assignment looked up from the broadcast (batch and corpus rows
        # agree by construction — no recompute drift)
        bcl = ccl[np.searchsorted(cids, rid)]
        sims = rows @ cmat.T                               # (b, N)
        mask = ((sims >= threshold)
                & (ccl[None, :] == bcl[:, None])
                & (cids[None, :] < rid[:, None]))
        keep = ~mask.any(axis=1)
        return pa.table({id_col: pa.array(rid[keep]),
                         "cluster": pa.array(bcl[keep])})

    return ds.map_batches(scan, batch_format="pyarrow")
