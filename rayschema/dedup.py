"""Deduplication family for training-data pipelines:

* exact dedup            — content-hash groupby (see also rayschema.unique)
* MinHash + LSH near-dup — shingle -> minhash signature -> band buckets ->
                           groupby(band) -> candidate pairs -> Jaccard verify
* SimHash near-dup       — 64-bit weighted-bit signature, Hamming buckets
* n-gram Jaccard         — exact verify kernel (used by the LSH verify stage)
* embedding near-dup     — cosine over normalized vectors, hyperplane-LSH
                           bucketed

Pipelines follow the canonical Ray Data shape (ray_guide): signatures are
computed vectorized per batch in an ACTOR POOL (permutation matrices / random
hyperplanes built once per actor), then exploded to (bucket_key, doc_id) rows,
and the only shuffle is a groupby on bucket keys whose groups are tiny;
candidate pairs are verified per group. Union-find/connected components run on
the driver only over the (small) candidate-pair set.

MinHash/LSH: Broder, "On the resemblance and containment of documents" (1997);
Leskovec-Rajaraman-Ullman, "Mining of Massive Datasets" ch.3 (public).
SimHash: Charikar, "Similarity estimation techniques from rounding
algorithms" (2002).
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from rayschema.sketches import hash64

_MERSENNE = np.uint64((1 << 61) - 1)


_FNV = np.uint64(1099511628211)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates the polynomial rolling hash."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingle hash set of one document — vectorized polynomial
    rolling hash over the raw bytes (no substring objects): k shifted adds
    with wrap-around uint64 arithmetic, then a splitmix64 mix."""
    if not text or len(text) < k:
        return _mix64(hash64(np.array([text or ""], dtype=object)))
    b = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        return _mix64(hash64(np.array([text], dtype=object)))
    n = len(b) - k + 1
    with np.errstate(over="ignore"):   # wrap-around is the hash arithmetic
        pw = np.empty(k, dtype=np.uint64)
        pw[k - 1] = 1
        for j in range(k - 2, -1, -1):
            pw[j] = pw[j + 1] * _FNV
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc += b[j:j + n] * pw[j]
    return np.unique(_mix64(acc))


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact n-gram Jaccard similarity between two documents."""
    ha, hb = char_shingles(a, k), char_shingles(b, k)
    if ha.size == 0 and hb.size == 0:
        return 1.0
    inter = np.intersect1d(ha, hb, assume_unique=True).size
    union = ha.size + hb.size - inter
    return inter / union if union else 1.0


class MinHasher:
    """Actor stage: per-doc MinHash signature + LSH band keys.

    Signatures use one-permutation hashing with fixed bin modulus, so they are
    globally consistent across actors with no shared state. __call__ explodes
    each doc into ``bands`` rows (band_id, band_hash, doc_id) ready for the
    bucket groupby."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                 seed: int = 4242, explode: bool = True):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.id_col = id_col
        self.text_col = text_col
        self.explode = explode

    def signature(self, text: Optional[str]) -> np.ndarray:
        """One-permutation hashing (Shrivastava & Li, ICML 2014): bin the
        shingle hashes into num_perm buckets by modulus, take the min per
        bucket, densify empty buckets from the next non-empty one — O(n)
        per doc instead of the O(n * num_perm) permutation matrix."""
        sh = char_shingles(text or "", self.shingle_k)
        p = self.num_perm
        bins = (sh % np.uint64(p)).astype(np.int64)
        sig = np.full(p, np.iinfo(np.uint64).max, dtype=np.uint64)
        np.minimum.at(sig, bins, sh)
        empty = sig == np.iinfo(np.uint64).max
        if empty.any():
            if empty.all():
                return np.zeros(p, dtype=np.uint64)
            # rotational densification: borrow from the next filled bucket
            idx = np.arange(p)
            filled = ~empty
            last = -1
            order = np.concatenate([idx, idx])
            fill_from = np.empty(p, dtype=np.int64)
            for i in order[::-1]:
                if filled[i]:
                    last = i
                fill_from[i] = last
            sig = sig.copy()
            sig[empty] = _mix64(sig[fill_from[empty]] + np.uint64(1))
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) if ids else \
            np.empty((0, self.num_perm), dtype=np.uint64)
        if not self.explode:
            return pa.table({
                self.id_col: pa.array(ids),
                "minhash": pa.array([s.tolist() for s in sigs],
                                    type=pa.list_(pa.uint64())),
            })
        n = len(ids)
        band_ids = np.tile(np.arange(self.bands, dtype=np.int32), n)
        doc_ids = np.repeat(np.asarray(ids), self.bands)
        bh = np.empty(n * self.bands, dtype=np.uint64)
        for b in range(self.bands):
            seg = sigs[:, b * self.rows_per_band:(b + 1) * self.rows_per_band]
            h = np.zeros(n, dtype=np.uint64)
            for c in range(seg.shape[1]):
                h = h * np.uint64(1_000_000_007) + seg[:, c]
            bh[b::self.bands] = h
        return pa.table({
            "band_id": pa.array(band_ids),
            "band_hash": pa.array(bh, type=pa.uint64()),
            self.id_col: pa.array(doc_ids),
        })


def _pairs_from_groups(g: pd.DataFrame, id_col: str, max_group: int = 64) -> pd.DataFrame:
    """All candidate pairs within one LSH bucket (cap pathological buckets)."""
    ids = np.sort(np.unique(g[id_col].to_numpy()))[:max_group]
    if len(ids) < 2:
        return pd.DataFrame({"id_a": [], "id_b": []})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})


def minhash_candidate_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                            num_perm: int = 64, bands: int = 16,
                            shingle_k: int = 5, concurrency=(1, 8),
                            distinct_on_driver: bool = True):
    """documents -> distinct candidate pairs (id_a < id_b) from LSH buckets.

    One shuffle total: the (band_id, band_hash) bucket groupby. Candidate
    pairs are orders of magnitude fewer than documents, so pair-dedup runs on
    the driver by default; pass distinct_on_driver=False for a distributed
    pair-dedup groupby when the candidate set itself is huge."""
    exploded = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col,
                                   num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k),
        batch_format="pyarrow", concurrency=concurrency)
    pairs = (exploded
             .groupby(["band_id", "band_hash"])
             .map_groups(lambda g: _pairs_from_groups(g, id_col),
                         batch_format="pandas"))
    if distinct_on_driver:
        df = pairs.to_pandas()
        return df.drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)
    # distinct pairs (a pair can match in several bands)
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.iloc[:1], batch_format="pandas")


def verify_pairs_jaccard(pairs_df: pd.DataFrame, texts: Dict[int, str],
                         threshold: float = 0.8, shingle_k: int = 5) -> pd.DataFrame:
    """Exact-Jaccard verification of candidate pairs (driver-side or
    per-bucket; ``texts`` is a lookup of the candidate docs only). Shingle
    sets are computed once per doc, not once per pair."""
    cache: Dict[int, np.ndarray] = {}

    def sh(i: int) -> np.ndarray:
        if i not in cache:
            cache[i] = char_shingles(texts.get(i, ""), shingle_k)
        return cache[i]

    def jac(a: int, b: int) -> float:
        ha, hb = sh(int(a)), sh(int(b))
        inter = np.intersect1d(ha, hb, assume_unique=True).size
        union = ha.size + hb.size - inter
        return inter / union if union else 1.0

    sims = [jac(a, b) for a, b in zip(pairs_df["id_a"], pairs_df["id_b"])]
    out = pairs_df.copy()
    out["jaccard"] = np.round(sims, 6)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


# --------------------------------------------------------------------------- SimHash
class SimHasher:
    """Actor stage: 64-bit SimHash over word tokens; emits ``simhash`` plus
    ``sim_bucket_{i}`` columns (4 x 16-bit bands) so near signatures (<=3
    differing bits typically) collide in at least one band."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self.word = re.compile(r"\w+")

    def sim64(self, text: Optional[str]) -> int:
        toks = self.word.findall(text or "")
        if not toks:
            return 0
        hs = hash64(np.array(toks, dtype=object))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
        acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sh = np.array([self.sim64(t) for t in texts], dtype=np.uint64)
        out = batch.append_column("simhash", pa.array(sh, type=pa.uint64()))
        for i in range(4):
            band = (sh >> np.uint64(16 * i)) & np.uint64(0xFFFF)
            out = out.append_column(f"sim_bucket_{i}", pa.array(band, type=pa.uint64()))
        return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def simhash_near_dups(ds, id_col: str = "doc_id", text_col: str = "text",
                      max_hamming: int = 3, concurrency=(1, 8)):
    """SimHash near-dup pairs: band buckets -> per-bucket Hamming verify."""
    sigs = ds.map_batches(SimHasher,
                          fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
                          batch_format="pyarrow", concurrency=concurrency) \
             .select_columns([id_col, "simhash", "sim_bucket_0", "sim_bucket_1",
                              "sim_bucket_2", "sim_bucket_3"])

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy()
        order = np.argsort(ids)
        ids, hs = ids[order], hs[order]
        if len(ids) < 2 or len(ids) > 256:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        hd = hamming64(hs[ia], hs[ib])
        keep = hd <= max_hamming
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "hamming": hd[keep]})

    parts = []
    for i in range(4):
        parts.append(sigs.groupby(f"sim_bucket_{i}")
                     .map_groups(bucket_pairs, batch_format="pandas"))
    allp = parts[0].union(*parts[1:])
    return allp.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.iloc[:1], batch_format="pandas")


# --------------------------------------------------------------------------- embedding near-dup
class HyperplaneLSH:
    """Actor stage: sign-random-projection bucket for embedding vectors;
    the hyperplane matrix is drawn once per actor from a fixed seed."""

    def __init__(self, vec_col: str = "embedding", dim: int = 0, bits: int = 16,
                 seed: int = 777, out: str = "lsh_bucket"):
        self.vec_col = vec_col
        self.bits = bits
        self.seed = seed
        self.out = out
        self._planes = None
        self.dim = dim

    def _get_planes(self, dim: int) -> np.ndarray:
        if self._planes is None or self._planes.shape[1] != dim:
            rng = np.random.default_rng(self.seed)
            self._planes = rng.standard_normal((self.bits, dim))
        return self._planes

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = np.stack(col.to_numpy(zero_copy_only=False))
        planes = self._get_planes(mat.shape[1])
        signs = (mat @ planes.T) > 0
        bucket = np.zeros(len(mat), dtype=np.uint64)
        for i in range(self.bits):
            bucket |= signs[:, i].astype(np.uint64) << np.uint64(i)
        return batch.append_column(self.out, pa.array(bucket, type=pa.uint64()))


def embedding_near_dups(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                        cos_threshold: float = 0.95, bits: int = 12,
                        concurrency=(1, 8)):
    """Embedding-cosine near-dup pairs via hyperplane-LSH buckets + exact
    cosine verify inside each bucket."""
    bucketed = ds.map_batches(HyperplaneLSH,
                              fn_constructor_kwargs=dict(vec_col=vec_col, bits=bits),
                              batch_format="pyarrow", concurrency=concurrency)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > 512:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        g = g.iloc[order]
        ids = ids[order]
        mat = np.stack(g[vec_col].to_numpy())
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.maximum(norms, 1e-12)
        sim = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        cs = sim[ia, ib]
        keep = cs >= cos_threshold
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "cosine": np.round(cs[keep], 6)})

    return bucketed.groupby("lsh_bucket").map_groups(verify, batch_format="pandas")


# --------------------------------------------------------------------------- clusters
def connected_components(pairs: pd.DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b") -> pd.DataFrame:
    """Near-duplicate clusters from verified pairs: union-find on the driver
    (sound because candidate pairs are orders of magnitude fewer than docs —
    the ray_guide pattern; for a huge pair set run a few rounds of min-label
    propagation with groupby instead). Returns (doc_id, cluster_id) where
    cluster_id = min doc id of the component."""
    parent: Dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]   # path halving
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id root keeps cluster_id deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for a, b in zip(pairs[id_a], pairs[id_b]):
        union(int(a), int(b))
    rows = sorted({x: find(x) for x in parent}.items())
    return pd.DataFrame({"doc_id": [r[0] for r in rows],
                         "cluster_id": [r[1] for r in rows]})


def near_dup_clusters(ds, id_col: str = "doc_id", text_col: str = "text",
                      jaccard_threshold: float = 0.8, num_perm: int = 64,
                      bands: int = 16, concurrency=(1, 8)) -> pd.DataFrame:
    """End-to-end near-dup clustering: MinHash-LSH candidates -> exact-Jaccard
    verify -> connected components. Returns (doc_id, cluster_id) for every doc
    in a multi-doc cluster; docs absent from the result are unique."""
    pairs = minhash_candidate_pairs(ds, id_col=id_col, text_col=text_col,
                                    num_perm=num_perm, bands=bands,
                                    concurrency=concurrency)
    if not len(pairs):
        return pd.DataFrame({"doc_id": [], "cluster_id": []})
    import ray

    wanted = np.array(sorted(set(pairs["id_a"]) | set(pairs["id_b"])), dtype=np.int64)
    wref = ray.put(wanted)

    def pick(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        ws = ray.get(wref)
        pos = np.searchsorted(ws, ids)
        sel = (pos < len(ws)) & (ws[np.minimum(pos, len(ws) - 1)] == ids)
        return b.filter(pa.array(sel))

    texts = {int(r[id_col]): r[text_col]
             for r in ds.map_batches(pick, batch_format="pyarrow").take_all()}
    verified = verify_pairs_jaccard(pairs, texts, threshold=jaccard_threshold)
    return connected_components(verified)
