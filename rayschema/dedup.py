"""Deduplication family for training-data pipelines:

* exact dedup            — content-hash groupby (see also rayschema.unique)
* MinHash + LSH near-dup — shingle -> minhash signature -> band buckets ->
                           groupby(band) -> candidate pairs -> Jaccard verify
* SimHash near-dup       — 64-bit weighted-bit signature, Hamming buckets
* n-gram Jaccard         — exact verify kernel (used by the LSH verify stage)
* embedding near-dup     — cosine over normalized vectors, hyperplane-LSH
                           bucketed (scale path) + exact all-pairs baseline

Pipelines follow the canonical Ray Data shape (ray_guide): signatures are
computed vectorized per batch in an ACTOR POOL (one rolling-hash pass over the
batch's raw Arrow string buffer — no per-doc Python), then exploded to
(bucket_key, doc_id) rows, and the narrow shuffles are groupbys on bucket keys
/ pair ids. Pair verification is DISTRIBUTED: candidate texts are co-located
with their pairs via hash joins, never materialized on the driver.
Union-find/connected components run on the driver only over the (small)
VERIFIED-pair set.

MinHash/LSH: Broder, "On the resemblance and containment of documents" (1997);
Leskovec-Rajaraman-Ullman, "Mining of Massive Datasets" ch.3 (public).
One-permutation hashing: Shrivastava & Li (ICML 2014).
SimHash: Charikar, "Similarity estimation techniques from rounding
algorithms" (2002).
"""

from __future__ import annotations

import logging
import re
import threading
from contextlib import contextmanager
from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rayschema.sketches import hash64

_log = logging.getLogger("rayschema.dedup")

_FNV = np.uint64(1099511628211)

_U64MAX = np.iinfo(np.uint64).max


def round_half_away(x, d: int = 6) -> np.ndarray:
    """Round-half-away-from-zero — DuckDB's round() semantics. Oracle-matched
    query outputs use this instead of np.round (banker's rounding) so exact
    rational values landing on a .5 decimal boundary (jaccard = p/q!) round
    identically on both sides."""
    m = 10.0 ** d
    ax = np.abs(np.asarray(x, dtype=np.float64))
    r = np.floor(ax * m + 0.5) / m
    return np.where(np.asarray(x, dtype=np.float64) < 0, -r, r)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates the polynomial rolling hash."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _shingle_powers(k: int) -> np.ndarray:
    with np.errstate(over="ignore"):   # wrap-around is the hash arithmetic
        pw = np.empty(k, dtype=np.uint64)
        pw[k - 1] = 1
        for j in range(k - 2, -1, -1):
            pw[j] = pw[j + 1] * _FNV
    return pw


def _rolling_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """Mixed polynomial rolling hash of every length-k byte window of
    ``data`` — one vectorized pass, identical values to char_shingles."""
    n = len(data) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    pw = _shingle_powers(k)
    b = data.astype(np.uint64)
    with np.errstate(over="ignore"):
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(k):
            acc += b[j:j + n] * pw[j]
    return _mix64(acc)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingle hash set of one document — vectorized polynomial
    rolling hash over the CODEPOINT sequence (no substring objects).

    Shingling by codepoints (utf-32 view), not utf-8 bytes, keeps every
    Jaccard path in the engine on the SAME unit as the exact ground truth
    (_ExactJaccardPairs' Python-str slices) and the DuckDB substr() oracle —
    multi-byte text gets identical jaccard values everywhere. On ASCII the
    codepoint values equal the byte values, so hashes are unchanged there."""
    if not text or len(text) < k:
        return _mix64(hash64(np.array([text or ""], dtype=object)))
    b = np.frombuffer(text.encode("utf-32-le", "surrogatepass"), dtype=np.uint32)
    return np.unique(_rolling_hashes(b, k))


def _sorted_intersect_count(ha: np.ndarray, hb: np.ndarray) -> int:
    """|ha ∩ hb| for SORTED UNIQUE uint64 arrays — O(m log n) searchsorted
    membership, ~4x faster than np.intersect1d's sort-merge for the shingle
    set sizes the verify stage sees."""
    if len(ha) == 0 or len(hb) == 0:
        return 0
    if len(hb) < len(ha):
        ha, hb = hb, ha
    pos = np.searchsorted(hb, ha)
    pos = np.minimum(pos, len(hb) - 1)
    return int(np.count_nonzero(hb[pos] == ha))


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact n-gram Jaccard similarity between two documents."""
    ha, hb = char_shingles(a, k), char_shingles(b, k)
    if ha.size == 0 and hb.size == 0:
        return 1.0
    inter = np.intersect1d(ha, hb, assume_unique=True).size
    union = ha.size + hb.size - inter
    return inter / union if union else 1.0


# --------------------------------------------------------------------------- batch-level shingling
def _string_parts(arr):
    """(combined arrow array, offsets int64, data uint8, valid bool) of a
    string column — the zero-copy pieces for one rolling-hash pass over the
    whole batch."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    odt = np.int64 if (pa.types.is_large_string(arr.type)
                       or pa.types.is_large_binary(arr.type)) else np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.zeros(0, dtype=np.uint8))
    if arr.null_count:
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
    else:
        valid = np.ones(len(arr), dtype=bool)
    return arr, off, data, valid


def _codepoint_parts(arr):
    """(combined arrow array, codepoint offsets int64, codepoints uint32,
    valid bool): the batch's whole text buffer decoded ONCE into a flat
    codepoint array (two C-speed transcoding passes), so the rolling hash
    shingles by CODEPOINTS — the same unit as char_shingles and the DuckDB
    substr() oracle. Byte offsets are mapped to codepoint offsets by a prefix
    count of utf-8 start bytes."""
    arr, off, data, valid = _string_parts(arr)
    if len(data) == 0:
        return arr, np.zeros(len(off), dtype=np.int64), \
            np.empty(0, dtype=np.uint32), valid
    is_start = (data & np.uint8(0xC0)) != np.uint8(0x80)
    pref = np.concatenate([[0], np.cumsum(is_start)]).astype(np.int64)
    cps = np.frombuffer(
        data.tobytes().decode("utf-8", "surrogatepass")
        .encode("utf-32-le", "surrogatepass"), dtype=np.uint32)
    return arr, pref[off], cps, valid


def _densify_oph(sig: np.ndarray) -> np.ndarray:
    """Vectorized rotational densification of a (n_docs, p) OPH matrix:
    each empty bin borrows from the cyclically-next filled bin (mixed with a
    +1 salt); all-empty rows become zeros. Bit-identical to the per-doc loop
    in MinHasher.signature."""
    empty = sig == _U64MAX
    if not empty.any():
        return sig
    n, p = sig.shape
    filled = ~empty
    big = 3 * p
    a = np.where(filled, np.arange(p, dtype=np.int64)[None, :], big)
    # second copy offset by +p so the suffix-min respects CYCLIC order (the
    # nearest filled bin at-or-after j, wrapping) instead of the global min
    twice = np.concatenate([a, np.where(filled, a + p, big)], axis=1)
    nxt = np.minimum.accumulate(twice[:, ::-1], axis=1)[:, ::-1][:, :p]
    fill_from = nxt % p
    rows = np.arange(n, dtype=np.int64)[:, None]
    with np.errstate(over="ignore"):
        borrowed = _mix64(sig[rows, fill_from] + np.uint64(1))
    out = sig.copy()
    out[empty] = borrowed[empty]
    out[~filled.any(axis=1)] = 0
    return out


def oph_signatures(arr, k: int, p: int) -> np.ndarray:
    """(n_docs, p) one-permutation-hashing MinHash signatures for a whole
    Arrow string column in ONE rolling-hash pass over the raw data buffer:
    per-position doc assignment via searchsorted on the offsets, then a
    single scatter-min into (doc, bin) cells. Shingle windows are CODEPOINT
    k-grams (see _codepoint_parts) so batch signatures agree with
    char_shingles on multi-byte text. Per-doc results are identical to
    MinHasher.signature (tested); docs shorter than k characters (or null)
    fall back to a whole-text hash, as in char_shingles."""
    arr, off, data, valid = _codepoint_parts(arr)
    n = len(arr)
    sig = np.full((n, p), _U64MAX, dtype=np.uint64)
    if n == 0:
        return sig
    clen = pc.fill_null(pc.utf8_length(arr), 0).to_numpy(zero_copy_only=False)
    short = (~valid) | (clen < k)
    flat = sig.reshape(-1)
    if (~short).any() and len(data) >= k:
        h = _rolling_hashes(data, k)
        pos = np.arange(len(h), dtype=np.int64)
        # sliced arrays share the parent's data buffer: keep only positions
        # inside [off[0], off[-1]) before assigning windows to docs
        inside = (pos >= off[0]) & (pos + k <= off[-1])
        h, pos = h[inside], pos[inside]
        doc = np.searchsorted(off, pos, side="right") - 1
        ok = (pos + k <= off[doc + 1]) & (~short[doc])
        h, doc = h[ok], doc[ok]
        key = doc * p + (h % np.uint64(p)).astype(np.int64)
        np.minimum.at(flat, key, h)
    if short.any():
        idx = np.nonzero(short)[0]
        texts = np.array([arr[int(i)].as_py() or "" for i in idx], dtype=object)
        hs = _mix64(hash64(texts))
        key = idx * p + (hs % np.uint64(p)).astype(np.int64)
        np.minimum.at(flat, key, hs)
    return _densify_oph(sig)


class MinHasher:
    """Actor stage: per-doc MinHash signature + LSH band keys.

    Signatures use one-permutation hashing with fixed bin modulus, so they are
    globally consistent across actors with no shared state. __call__ explodes
    each doc into ``bands`` rows (band_id, band_hash, doc_id) ready for the
    bucket groupby; signature computation is one vectorized pass per batch
    (oph_signatures), not a per-doc loop."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                 seed: int = 4242, explode: bool = True,
                 emit_bkey: bool = False):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.id_col = id_col
        self.text_col = text_col
        self.explode = explode
        self.emit_bkey = emit_bkey     # emit the mixed sort key directly

    def signature(self, text: Optional[str]) -> np.ndarray:
        """Single-doc reference path (one-permutation hashing + rotational
        densification) — oph_signatures is the batch equivalent."""
        sh = char_shingles(text or "", self.shingle_k)
        p = self.num_perm
        bins = (sh % np.uint64(p)).astype(np.int64)
        sig = np.full(p, _U64MAX, dtype=np.uint64)
        np.minimum.at(sig, bins, sh)
        return _densify_oph(sig[None, :])[0]

    def band_hashes(self, sigs: np.ndarray) -> np.ndarray:
        """(n * bands,) uint64 band hashes, band-major interleaved."""
        n = len(sigs)
        bh = np.empty(n * self.bands, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b in range(self.bands):
                seg = sigs[:, b * self.rows_per_band:(b + 1) * self.rows_per_band]
                h = np.zeros(n, dtype=np.uint64)
                for c in range(seg.shape[1]):
                    h = h * np.uint64(1_000_000_007) + seg[:, c]
                bh[b::self.bands] = h
        return bh

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = len(ids)
        sigs = oph_signatures(batch.column(self.text_col), self.shingle_k,
                              self.num_perm) if n else \
            np.empty((0, self.num_perm), dtype=np.uint64)
        if not self.explode:
            return pa.table({
                self.id_col: ids,
                "minhash": pa.array([s.tolist() for s in sigs],
                                    type=pa.list_(pa.uint64())),
            })
        band_ids = np.tile(np.arange(self.bands, dtype=np.int32), n)
        doc_ids = ids.take(pa.array(np.repeat(np.arange(n), self.bands)))
        bh = self.band_hashes(sigs)
        if self.emit_bkey:
            # fold the bucket-key mix into the signature stage: one fewer
            # operator pass over the (docs x bands) exploded rows
            with np.errstate(over="ignore"):
                key = _mix64(bh + (band_ids.astype(np.uint64) + np.uint64(1))
                             * np.uint64(0x9E3779B97F4A7C15))
            return pa.table({"bkey": pa.array(key.view(np.int64)),
                             self.id_col: doc_ids})
        return pa.table({
            "band_id": pa.array(band_ids),
            "band_hash": pa.array(bh, type=pa.uint64()),
            self.id_col: doc_ids,
        })


def _pairs_from_groups(g: pd.DataFrame, id_col: str, max_group: int = 256) -> pd.DataFrame:
    """All candidate pairs within one LSH bucket (DataFrame wrapper around
    _emit_group_pairs).

    Oversized buckets are SALT-SPLIT, not truncated: full pairs within each
    <=max_group chunk plus a star link from the global min id to each chunk's
    min keep every doc attached to the bucket (no silently dropped docs —
    logged). Cross-chunk pairs are left to the other bands."""
    ids = np.unique(np.asarray(g[id_col].to_numpy(), dtype=np.int64))
    got = _emit_group_pairs(ids, max_group)
    if got is None:
        return pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                             "id_b": np.array([], dtype=np.int64)})
    return pd.DataFrame({"id_a": got[0], "id_b": got[1]})


def _emit_group_pairs(ids: np.ndarray, max_group: int = 256,
                      salt: int = 0):
    """(ia, ib) index-free pair arrays for one bucket's UNIQUE sorted ids,
    salt-split beyond max_group.

    ``salt`` (pass the bucket/band key) PERMUTES the chunk assignment before
    splitting: with a band-specific salt, each band splits a giant
    near-identical cluster differently, so cross-chunk pairs missed by one
    band are recovered by the others instead of being lost by every band
    identically (deterministic id-order chunking would repeat the same split
    16 times). Connectivity is additionally guaranteed by a star link from
    the global min id into every chunk."""
    if len(ids) < 2:
        return None
    if len(ids) <= max_group:
        ia, ib = np.triu_indices(len(ids), k=1)
        return ids[ia], ids[ib]
    n_chunks = int(np.ceil(len(ids) / max_group))
    _log.warning(
        "LSH bucket of %d docs salt-split into %d chunks of <=%d "
        "(band-salted split: other bands recover different cross-chunk pairs)",
        len(ids), n_chunks, max_group)
    with np.errstate(over="ignore"):
        order = np.argsort(_mix64(ids.astype(np.uint64) + np.uint64(salt)),
                           kind="stable")
    perm = ids[order]
    gmin = ids[0]                      # ids are sorted unique -> global min
    outs_a, outs_b = [], []
    for c in range(n_chunks):
        chunk = np.sort(perm[c * max_group:(c + 1) * max_group])
        ia, ib = np.triu_indices(len(chunk), k=1)
        outs_a.append(chunk[ia])
        outs_b.append(chunk[ib])
        if chunk[0] != gmin:           # star link keeps the cluster connected
            outs_a.append(np.array([gmin], dtype=ids.dtype))
            outs_b.append(chunk[:1])
    return np.concatenate(outs_a), np.concatenate(outs_b)


_POLARS_SORT_LOCK = threading.Lock()
_POLARS_SORT_DEPTH = 0
_POLARS_SORT_SAVED = False


@contextmanager
def _polars_sort_guard(ctx):
    """Refcounted enable of DataContext.use_polars_sort (a process-global
    flag). The first in-flight scan saves the prior value and turns it on;
    only the last one restores. A plain save/restore pair is wrong under
    concurrent scans (ann_recall_report runs several in a thread pool):
    interleaved windows would restore each other's saved state and leak
    the flag for the rest of the session."""
    global _POLARS_SORT_DEPTH, _POLARS_SORT_SAVED
    with _POLARS_SORT_LOCK:
        if _POLARS_SORT_DEPTH == 0:
            _POLARS_SORT_SAVED = getattr(ctx, "use_polars_sort", False)
            ctx.use_polars_sort = True
        _POLARS_SORT_DEPTH += 1
    try:
        yield
    finally:
        with _POLARS_SORT_LOCK:
            _POLARS_SORT_DEPTH -= 1
            if _POLARS_SORT_DEPTH == 0:
                ctx.use_polars_sort = _POLARS_SORT_SAVED


def sorted_group_scan(ds, key_cols, group_fn, out_schema: pa.Schema,
                      group_filter=None, block_fn=None, extra_emit=None,
                      sort_blocks: Optional[int] = None,
                      order_cols: Sequence[str] = ()):
    """The engine's shared bucketed-scan primitive: ONE global sort of ``ds``
    by ``key_cols`` (numeric columns — the cheapest all-to-all for narrow
    rows, measured ~4x faster than Ray's sort-based groupby + per-group
    Python at 2M rows), then ``group_fn`` applied to every COMPLETE key-group
    inside each sorted block. The first and last group of every block (the
    only groups that can straddle a block boundary) are re-grouped exactly on
    the driver and fed through the same ``group_fn`` — a bounded residual of
    <= 2 groups per block, independent of dataset size.

    ``group_fn(pa.Table) -> Optional[pa.Table]`` receives one group's rows
    (all key/payload columns) and returns rows matching ``out_schema``.

    ``group_filter(block, starts, ends) -> bool mask`` is the VECTORIZED
    pre-filter that keeps the per-group Python cost off the fast path: with
    billions of singleton groups (most LSH buckets hold one doc), group_fn
    must only be invoked for the rare interesting groups — e.g.
    ``lambda b, s, e: (e - s) >= 2``. Residual (boundary) groups bypass the
    filter and are re-checked by group_fn itself on the driver (bounded).

    ``block_fn(block, starts, ends, want) -> Optional[pa.Table]``, when
    given, replaces the per-group loop entirely: ONE vectorized call per
    block handling every group where ``want`` is True (boundary groups are
    already masked out of ``want``). Use it when groups are numerous and
    small — per-group pa.Table slicing costs ~50 µs/group, which dominates
    wall time at 10^5+ groups per block. group_fn is still required: it
    verifies the driver-side boundary residuals.

    ``extra_emit(block, starts, ends) -> Optional[bytes]``, when given, lets
    each block ship one opaque side-channel payload (e.g. a packed candidate
    bitmap chunk) back to the driver ON the existing residual pull — no extra
    Dataset execution. The return value becomes (out, [payload, ...]).

    ``order_cols`` adds WITHIN-GROUP ordering: the sort key is
    key_cols + order_cols but group boundaries are still key_cols only, so
    a group's rows arrive time-ordered (the as-of join / sessionization
    shape). The driver residual re-sort honors the same ordering.

    Used by the MinHash band buckets, SimHash bands, embedding-LSH buckets,
    and both co-location stages of the fused near-dup verify."""
    import ray.data as rd
    from ray.data import DataContext

    key_cols = list(key_cols)
    order_cols = list(order_cols)
    out_names = [f.name for f in out_schema]

    def _empty_mixed(in_schema: pa.Schema) -> pa.Table:
        cols = {f.name: pa.array([], type=f.type) for f in out_schema}
        for f in in_schema:
            cols["_in_" + f.name] = pa.array([], type=f.type)
        cols["_kind"] = pa.array([], type=pa.int8())
        if extra_emit is not None:
            cols["_extra"] = pa.array([], type=pa.large_binary())
        return pa.table(cols)

    def block_scan(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return _empty_mixed(b.schema)
        keys = [b.column(k).to_numpy(zero_copy_only=False) for k in key_cols]
        neq = np.zeros(n - 1, dtype=bool)
        for kc in keys:
            neq |= kc[1:] != kc[:-1]
        cuts = np.flatnonzero(neq) + 1
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [n]])
        want = (group_filter(b, starts, ends) if group_filter is not None
                else np.ones(len(starts), dtype=bool))
        outs, resid = [], []
        boundary = (starts == 0) | (ends == n)
        for s, e in zip(starts[boundary], ends[boundary]):
            resid.append((s, e))       # possibly straddles a block boundary
        if block_fn is not None:
            t = block_fn(b, starts, ends, want & ~boundary)
            if t is not None and t.num_rows:
                outs.append(t)
        else:
            for gi, (s, e) in enumerate(zip(starts, ends)):
                if boundary[gi] or not want[gi]:
                    continue
                t = group_fn(b.slice(s, e - s))
                if t is not None and t.num_rows:
                    outs.append(t)
        parts = []
        if outs:
            o = pa.concat_tables(outs)
            cols = {name: o.column(name) for name in out_names}
            for f in b.schema:
                cols["_in_" + f.name] = pa.nulls(o.num_rows, f.type)
            cols["_kind"] = pa.array(np.zeros(o.num_rows, dtype=np.int8))
            if extra_emit is not None:
                cols["_extra"] = pa.nulls(o.num_rows, pa.large_binary())
            parts.append(pa.table(cols))
        if resid:
            rt = pa.concat_tables([b.slice(s, e - s) for s, e in resid])
            cols = {f.name: pa.nulls(rt.num_rows, f.type) for f in out_schema}
            for f in b.schema:
                cols["_in_" + f.name] = rt.column(f.name)
            cols["_kind"] = pa.array(np.ones(rt.num_rows, dtype=np.int8))
            if extra_emit is not None:
                cols["_extra"] = pa.nulls(rt.num_rows, pa.large_binary())
            parts.append(pa.table(cols))
        if extra_emit is not None:
            payload = extra_emit(b, starts, ends)
            if payload is not None:
                cols = {f.name: pa.nulls(1, f.type) for f in out_schema}
                for f in b.schema:
                    cols["_in_" + f.name] = pa.nulls(1, f.type)
                cols["_kind"] = pa.array(np.full(1, 2, dtype=np.int8))
                cols["_extra"] = pa.array([payload], type=pa.large_binary())
                parts.append(pa.table(cols))
        return pa.concat_tables(parts) if parts else _empty_mixed(b.schema)

    # polars-backed block sort: measured 3x faster than the default on the
    # band-key sort, bit-identical ordering for these numeric keys. The
    # flag is process-global on DataContext, and concurrent scans (e.g.
    # ann_recall_report's thread pool) overlap their set/restore windows —
    # so the flag is managed by a REFCOUNTED guard: it turns on with the
    # first in-flight scan and restores the saved value only when the last
    # one finishes (a plain save/restore pair would let interleaved scans
    # restore each other's state and leak the flag for the whole session).
    ctx = DataContext.get_current()
    with _polars_sort_guard(ctx):
        srt = ds.sort(key_cols + order_cols)
        if sort_blocks:
            # Ray's sort emits as many blocks as its input had; a small input
            # (one block) would make the scan SERIAL. The order-preserving
            # repartition (verified: global order survives) restores scan
            # parallelism without a shuffle.
            srt = srt.repartition(sort_blocks)
        mixed = (srt.map_batches(block_scan, batch_format="pyarrow")
                 .materialize())
    out = _proj(mixed.filter(expr="_kind == 0"),
                {name: name for name in out_names})
    # residual rows come back as ARROW batches (no pandas round-trip — it
    # would degrade int64-with-null and list columns); bounded volume:
    # <= 2 key-groups per sorted block (+ one _extra side-channel row each)
    rbatches = [pa.Table.from_batches([rb]) if isinstance(rb, pa.RecordBatch) else rb
                for rb in mixed.filter(expr="_kind > 0")
                .iter_batches(batch_format="pyarrow")]
    resid_tbl = (pa.concat_tables(rbatches) if rbatches
                 else _empty_mixed(pa.schema([])))
    extras = []
    if extra_emit is not None and resid_tbl.num_rows:
        kind = resid_tbl.column("_kind").to_numpy(zero_copy_only=False)
        extras = [v for v in resid_tbl.column("_extra")
                  .take(pa.array(np.flatnonzero(kind == 2))).to_pylist()]
        resid_tbl = resid_tbl.take(pa.array(np.flatnonzero(kind == 1)))
    if resid_tbl.num_rows:
        rt = pa.table({n[4:]: resid_tbl.column(n).combine_chunks()
                       for n in resid_tbl.schema.names if n.startswith("_in_")})
        sarrs = [rt.column(k).to_numpy(zero_copy_only=False)
                 for k in key_cols + order_cols]
        order = np.lexsort(sarrs[::-1])
        rt = rt.take(pa.array(order))
        karrs = [rt.column(k).to_numpy(zero_copy_only=False) for k in key_cols]
        m = rt.num_rows
        neq = np.zeros(m - 1, dtype=bool)
        for kc in karrs:
            neq |= kc[1:] != kc[:-1]
        cuts = np.flatnonzero(neq) + 1
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [m]])
        extra = []
        for s, e in zip(starts, ends):
            t = group_fn(rt.slice(s, e - s))
            if t is not None and t.num_rows:
                extra.append(t)
        if extra:
            out = out.union(rd.from_arrow(pa.concat_tables(extra)))
    if extra_emit is not None:
        return out, extras
    return out


def _bitmap_hash(ids: np.ndarray, bits: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (_mix64(ids.astype(np.uint64))
                >> np.uint64(64 - bits)).astype(np.int64)


def _bitmap_member(ids: np.ndarray, packed: np.ndarray, bits: int) -> np.ndarray:
    """Vectorized membership test against a np.packbits bitmap."""
    h = _bitmap_hash(ids, bits)
    return ((packed[h >> 3] >> (7 - (h & 7))) & 1).astype(bool)


def _bucket_pairs_sorted(exploded, id_col: str, max_group: int = 256,
                         bitmap_bits: Optional[int] = None,
                         has_bkey: bool = False):
    """Candidate pairs from LSH buckets WITHOUT a groupby: combine
    (band_id, band_hash) into one 8-byte bucket key, then the shared
    sorted_group_scan (one narrow (key, id) sort; bounded driver residual of
    ids only). The chunk split of oversized buckets is salted by the bucket
    key, so each band splits a giant cluster differently.

    With ``bitmap_bits``, each scanned block also ships a packed hashed
    bitmap of its multi-member-group ids (a SUPERSET of candidate pair
    endpoints — boundary-group ids included so driver-residual pairs are
    covered) through the side channel, and the return value becomes
    (pairs, n_interior_pair_ids, OR-reduced bitmap bytes).

    A mixed-key collision merging two buckets only ADDS candidate pairs,
    which exact verification then discards — never drops one."""
    import struct

    def keyed(b: pa.Table) -> pa.Table:
        bh = b.column("band_hash").to_numpy(zero_copy_only=False)
        bi = b.column("band_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            key = _mix64(bh + (bi + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15))
        return pa.table({"bkey": pa.array(key.view(np.int64)),
                         id_col: b.column(id_col)})

    def group_fn(t: pa.Table) -> Optional[pa.Table]:
        ids = np.unique(t.column(id_col).to_numpy(zero_copy_only=False)
                        .astype(np.int64))
        salt = int(t.column("bkey")[0].as_py()) & 0xFFFFFFFFFFFFFFFF
        got = _emit_group_pairs(ids, max_group, salt=salt)
        if got is None:
            return None
        return pa.table({"id_a": pa.array(got[0]), "id_b": pa.array(got[1])})

    def bm_emit(b: pa.Table, starts, ends) -> Optional[bytes]:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sizes = ends - starts
        boundary = (starts == 0) | (ends == len(ids))
        keep_g = (sizes >= 2) | boundary
        grp = np.repeat(np.arange(len(starts)), sizes)
        sel = ids[keep_g[grp]]
        interior = ids[((sizes >= 2) & ~boundary)[grp]]
        if not len(sel):
            return None
        m = np.zeros(1 << bitmap_bits, dtype=bool)
        m[_bitmap_hash(sel, bitmap_bits)] = True
        return struct.pack("<q", len(interior)) + np.packbits(m).tobytes()

    out_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    if has_bkey:
        exploded_keyed = exploded      # MinHasher(emit_bkey=True) upstream
    else:
        exploded_keyed = exploded.map_batches(keyed, batch_format="pyarrow")
    size2 = lambda b, s, e: (e - s) >= 2   # noqa: E731
    if bitmap_bits is None:
        return sorted_group_scan(exploded_keyed, ["bkey"], group_fn,
                                 out_schema, group_filter=size2)
    pairs, chunks = sorted_group_scan(exploded_keyed, ["bkey"], group_fn,
                                      out_schema, group_filter=size2,
                                      extra_emit=bm_emit)
    acc = np.zeros((1 << bitmap_bits) // 8, dtype=np.uint8)
    n_interior = 0
    for chunk in chunks:
        n_interior += struct.unpack("<q", chunk[:8])[0]
        acc |= np.frombuffer(chunk[8:], dtype=np.uint8)
    return pairs, n_interior, acc


def _distinct_pairs(pairs_ds):
    """Distributed pair-dedup: per-batch drop_duplicates (removes the bulk —
    a near-dup pair matches in MANY bands) then one narrow groupby shuffle of
    the 16-byte pair keys. The distinct itself is a native Count aggregate
    (sort-based, no per-group Python — map_groups would pay a Python call per
    pair)."""
    from ray.data.aggregate import Count

    def local(b: pa.Table) -> pa.Table:
        # Arrow-native distinct (no pandas round-trip): group_by with no
        # aggregates yields one row per (id_a, id_b)
        return b.group_by(["id_a", "id_b"]).aggregate([])

    return (pairs_ds.map_batches(local, batch_format="pyarrow")
            .groupby(["id_a", "id_b"])
            .aggregate(Count("id_a", alias_name="_n"))
            .drop_columns(["_n"]))


def minhash_candidate_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                            num_perm: int = 64, bands: int = 16,
                            shingle_k: int = 5, concurrency=(1, 8),
                            distinct_on_driver: bool = False,
                            distinct: bool = True,
                            bitmap_bits: Optional[int] = None):
    """documents -> candidate pairs (id_a < id_b) from LSH buckets.

    Narrow shuffles only: one 8-byte-key SORT for the bucket scan (and one
    pair groupby when ``distinct``) — document text never moves. Returns a
    DATASET of (id_a, id_b); ``distinct_on_driver=True`` is a small-input
    fast path that returns a pandas DataFrame instead (never use it on a
    dup-heavy corpus — the candidate set itself can be huge).
    ``distinct=False`` skips the pair-dedup shuffle: LSH candidates are
    ~97% unique already (dup-band pairs are exactly the rare true near-dups),
    so callers that verify anyway dedup the far smaller verified set.
    ``bitmap_bits`` (implies the raw non-distinct path) additionally returns
    the stage's candidate-id bitmap side channel:
    (pairs, n_interior_pair_ids, packed bitmap)."""
    exploded = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col,
                                   num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k,
                                   emit_bkey=bitmap_bits is not None),
        batch_format="pyarrow", concurrency=concurrency)
    if bitmap_bits is not None:
        return _bucket_pairs_sorted(exploded, id_col, bitmap_bits=bitmap_bits,
                                    has_bkey=True)
    pairs = _bucket_pairs_sorted(exploded, id_col)
    if distinct_on_driver:
        df = pairs.to_pandas()
        return df.drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)
    if distinct:
        return _distinct_pairs(pairs)
    return pairs


def verify_pairs_jaccard(pairs_df: pd.DataFrame, texts: Dict[int, str],
                         threshold: float = 0.8, shingle_k: int = 5) -> pd.DataFrame:
    """Exact-Jaccard verification of candidate pairs against an in-memory
    text lookup (small-input fast path; the scale path is
    verify_pairs_jaccard_ds). Shingle sets are computed once per doc."""
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


class _PairJaccard:
    """Actor stage: exact Jaccard over (text_a, text_b) pair rows; shingle
    sets cached per doc id within a batch."""

    def __init__(self, threshold: float = 0.8, shingle_k: int = 5):
        self.threshold = threshold
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_a = batch.column("id_a").to_numpy(zero_copy_only=False)
        ids_b = batch.column("id_b").to_numpy(zero_copy_only=False)
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        cache: Dict[int, np.ndarray] = {}

        def sh(i: int, t: Optional[str]) -> np.ndarray:
            got = cache.get(i)
            if got is None:
                got = cache[i] = char_shingles(t or "", self.k)
            return got

        sims = np.empty(len(ids_a), dtype=np.float64)
        for r in range(len(ids_a)):
            ha = sh(int(ids_a[r]), ta[r])
            hb = sh(int(ids_b[r]), tb[r])
            inter = _sorted_intersect_count(ha, hb)
            union = ha.size + hb.size - inter
            sims[r] = inter / union if union else 1.0
        keep = sims >= self.threshold
        return pa.table({
            "id_a": pa.array(ids_a[keep]),
            "id_b": pa.array(ids_b[keep]),
            "jaccard": pa.array(round_half_away(sims[keep], 6)),
        })


def _proj(ds, mapping):
    """Arrow-native projection/rename (robust across pandas/arrow blocks —
    Dataset.rename_columns chokes on pandas blocks from map_groups)."""
    items = list(mapping.items())

    def f(b: pa.Table) -> pa.Table:
        return pa.table({dst: b.column(src) for src, dst in items})

    return ds.map_batches(f, batch_format="pyarrow")


def verify_pairs_jaccard_ds(pairs_ds, docs_ds, id_col: str = "doc_id",
                            text_col: str = "text", threshold: float = 0.8,
                            shingle_k: int = 5, num_partitions: int = 8,
                            concurrency=(1, 8)):
    """DISTRIBUTED exact-Jaccard verification — no candidate text ever
    reaches the driver:

    1. distinct candidate ids (narrow union + groupby of 8-byte ids)
    2. docs ⋈ candidate-ids hash join — the ONE shuffle that moves text,
       and only candidate docs survive it
    3. pairs ⋈ texts on id_a, then on id_b (both sides candidate-sized)
    4. vectorized-per-doc Jaccard inside map_batches, filter >= threshold

    Returns a Dataset (id_a, id_b, jaccard).

    Stage boundaries: the NARROW intermediates (candidate ids, candidate
    docs, pairs+text_a) are materialized — each is candidate-sized, and the
    boundaries keep each hash join a separate short execution instead of one
    giant streaming DAG (Ray's executor thrashes workers when several
    shuffle operators contend for a small CPU pool)."""
    from ray.data.aggregate import Count

    pairs_arrow = _proj(pairs_ds, {"id_a": "id_a", "id_b": "id_b"})
    cand = (_proj(pairs_ds, {"id_a": "cid"})
            .union(_proj(pairs_ds, {"id_b": "cid"}))
            .groupby("cid").aggregate(Count("cid", alias_name="_n"))
            .drop_columns(["_n"])
            .materialize())
    cand_docs = (docs_ds.select_columns([id_col, text_col])
                 .join(cand, join_type="inner", num_partitions=num_partitions,
                       on=(id_col,), right_on=("cid",))
                 .materialize())
    docs_a = _proj(cand_docs, {id_col: "id_a", text_col: "text_a"})
    docs_b = _proj(cand_docs, {id_col: "id_b", text_col: "text_b"})
    j = pairs_arrow.join(docs_a, join_type="inner",
                         num_partitions=num_partitions, on=("id_a",))
    jj = j.join(docs_b, join_type="inner",
                num_partitions=num_partitions, on=("id_b",))
    return jj.map_batches(_PairJaccard,
                          fn_constructor_kwargs=dict(threshold=threshold,
                                                     shingle_k=shingle_k),
                          batch_format="pyarrow", concurrency=concurrency)


def minhash_near_dups_joined(ds, id_col: str = "doc_id", text_col: str = "text",
                             num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                             threshold: float = 0.8, concurrency=(1, 8),
                             num_partitions: int = 8):
    """Join-based distributed MinHash-LSH near-dup pairs (the round-2 path,
    kept as the equality reference for the fused default): LSH candidates ->
    hash-join text co-location -> exact-Jaccard verify -> pair-dedup of the
    verified set. ~6 shuffle executions; minhash_near_dups (fused) computes
    the identical result in 3."""
    from ray.data.aggregate import Min

    pairs = minhash_candidate_pairs(
        ds, id_col=id_col, text_col=text_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, concurrency=concurrency,
        distinct_on_driver=False, distinct=False).materialize()
    if pairs.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64())}))
    verified = verify_pairs_jaccard_ds(
        pairs, ds, id_col=id_col, text_col=text_col, threshold=threshold,
        shingle_k=shingle_k, num_partitions=num_partitions,
        concurrency=concurrency)
    return (verified.groupby(["id_a", "id_b"])
            .aggregate(Min("jaccard", alias_name="jaccard")))


MINHASH_INPROC_CAP = 20_000   # corpus rows under which the fused in-process
#                               path runs (the _ppjoin_driver discipline):
#                               at this size the distributed plan's three
#                               sort executions are pure scheduling overhead
#                               (sf0.1's 5k-doc table: ~5.8s of orchestration
#                               for ~0.2s of signature compute). Text bytes
#                               on the driver are bounded by cap x doc size,
#                               the same bound _ppjoin_driver documents.


def _minhash_inproc(df, id_col: str, text_col: str, num_perm: int, bands: int,
                    shingle_k: int, threshold: float, max_group: int = 256):
    """Fused in-process MinHash-LSH + exact-Jaccard verify for a SMALL
    corpus (<= MINHASH_INPROC_CAP rows, footer-gated by the caller):
    IDENTICAL candidate semantics to the distributed path — the same
    oph signatures, the same band-key mix (so the bucket-key salt that
    drives oversized-bucket splitting matches bit-for-bit), the same
    _emit_group_pairs — and the same round_half_away exact-Jaccard
    verify. Equality-tested against the distributed path in
    tests/test_dedup_similarity.py; the distributed plan stays the
    design above the cap."""
    import ray.data as rd

    empty = pa.table({
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
        "jaccard": pa.array([], type=pa.float64())})
    n = len(df)
    if n < 2:
        return rd.from_arrow(empty)
    ids = df[id_col].to_numpy().astype(np.int64)
    texts = df[text_col].tolist()
    mh = MinHasher(id_col=id_col, text_col=text_col, num_perm=num_perm,
                   bands=bands, shingle_k=shingle_k)
    sigs = oph_signatures(pa.Array.from_pandas(df[text_col]), shingle_k,
                          num_perm)
    bh = mh.band_hashes(sigs)                       # doc-major, band inner
    band_ids = np.tile(np.arange(bands, dtype=np.uint64), n)
    doc_ids = np.repeat(ids, bands)
    with np.errstate(over="ignore"):
        key = _mix64(bh + (band_ids + np.uint64(1))
                     * np.uint64(0x9E3779B97F4A7C15))
    order = np.argsort(key, kind="stable")
    key, doc_ids = key[order], doc_ids[order]
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    ends = np.r_[starts[1:], len(key)]
    pa_l, pb_l = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        got = _emit_group_pairs(np.unique(doc_ids[s:e]), max_group,
                                salt=int(key[s]))
        if got is not None:
            pa_l.append(got[0])
            pb_l.append(got[1])
    if not pa_l:
        return rd.from_arrow(empty)
    ia = np.concatenate(pa_l)
    ib = np.concatenate(pb_l)
    order = np.lexsort((ib, ia))                    # candidate pair dedup
    ia, ib = ia[order], ib[order]
    keep = np.ones(len(ia), dtype=bool)
    keep[1:] = (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])
    ia, ib = ia[keep], ib[keep]
    sorter = np.argsort(ids, kind="stable")
    ids_sorted = ids[sorter]
    cache: Dict[int, np.ndarray] = {}

    def sh(i: int) -> np.ndarray:
        got = cache.get(i)
        if got is None:
            row = int(sorter[np.searchsorted(ids_sorted, i)])
            got = cache[i] = char_shingles(texts[row] or "", shingle_k)
        return got

    out_a, out_b, out_j = [], [], []
    for a, b in zip(ia, ib):
        ha, hb = sh(int(a)), sh(int(b))
        inter = _sorted_intersect_count(ha, hb)
        union = ha.size + hb.size - inter
        jac = inter / union if union else 1.0
        if jac >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(jac)
    if not out_a:
        return rd.from_arrow(empty)
    return rd.from_arrow(pa.table({
        "id_a": pa.array(np.asarray(out_a, dtype=np.int64)),
        "id_b": pa.array(np.asarray(out_b, dtype=np.int64)),
        "jaccard": pa.array(round_half_away(
            np.asarray(out_j, dtype=np.float64), 6)),
    }))


def minhash_near_dups(ds, id_col: str = "doc_id", text_col: str = "text",
                      num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                      threshold: float = 0.8, concurrency=(1, 8),
                      num_partitions: int = 8, n_rows: Optional[int] = None):
    """End-to-end distributed MinHash-LSH near-dup pairs in THREE shuffle
    executions (the fused path; equality-tested against the join path and
    the driver path):

    1. band-bucket sort-scan -> candidate pairs (8-byte keys only move)
    2. text co-location sort on doc id: docs ∪ exploded pair ENDPOINTS,
       one group per doc id — the group's doc row carries the text, its
       endpoint rows say which pairs need it. Emits (id_a, id_b, side,
       text); duplicate candidates (a pair hit in many bands) are deduped
       HERE for free, so no final pair groupby is needed.
    3. pair co-location sort on (id_a, id_b): each group holds the pair's
       two texts; exact char-k-gram Jaccard, filter >= threshold.

    Per-stage text movement is the optimum for a verify that must read both
    texts of every candidate pair: corpus text moves once (stage 2) and
    candidate text twice (stage 3) — the join path moved the same bytes
    across ~6 executions. The driver only ever sees the bounded
    sorted_group_scan boundary residuals (<= 2 groups per block)."""
    import os
    import time as _time

    import ray.data as rd

    if n_rows is not None and n_rows <= MINHASH_INPROC_CAP:
        return _minhash_inproc(ds.to_pandas(), id_col, text_col, num_perm,
                               bands, shingle_k, threshold)

    _dbg = os.environ.get("RAYSCHEMA_TIMING")
    _t0 = _time.time()

    def _tick(label):
        nonlocal _t0
        if _dbg:
            print(f"[minhash] {label}: {_time.time() - _t0:.2f}s", flush=True)
        _t0 = _time.time()

    # Stage 1 also ships a fixed-size (2 MB) hashed BITMAP of the candidate
    # endpoint ids through the scan's side channel (no extra execution). The
    # stage-2 sort then moves only candidate texts (+ ~1-2% false positives,
    # which attach to zero endpoints and are dropped by the group filter)
    # instead of the whole corpus. Unlike a driver id-set, the bitmap stays
    # 2 MB no matter how dup-heavy the crawl.
    import ray

    BM_BITS = 24
    pairs, n_interior, acc = minhash_candidate_pairs(
        ds, id_col=id_col, text_col=text_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, concurrency=concurrency,
        distinct_on_driver=False, distinct=False, bitmap_bits=BM_BITS)
    _tick("stage1 candidates+bitmap")

    empty = pa.table({
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
        "jaccard": pa.array([], type=pa.float64())})

    # emptiness: no interior pair ids anywhere, and (rare: every group was a
    # block-boundary group) no driver-residual pairs either
    if n_interior == 0 and pairs.count() == 0:
        return rd.from_arrow(empty)
    bm_ref = ray.put(acc)

    # ---- stage 2: co-locate each candidate doc's text with its pair endpoints
    def docrows(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        hit = _bitmap_member(ids, ray.get(bm_ref), BM_BITS)
        b = b.filter(pa.array(hit))
        n = b.num_rows
        return pa.table({
            "sid": b.column(id_col).cast(pa.int64()),
            "id_a": pa.array(np.full(n, -1, dtype=np.int64)),
            "id_b": pa.array(np.full(n, -1, dtype=np.int64)),
            "side": pa.array(np.full(n, -1, dtype=np.int8)),
            "text": b.column(text_col).cast(pa.large_string()),
        })

    def endpoints(b: pa.Table) -> pa.Table:
        ia = b.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        ib = b.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ia)
        return pa.table({
            "sid": pa.array(np.concatenate([ia, ib])),
            "id_a": pa.array(np.concatenate([ia, ia])),
            "id_b": pa.array(np.concatenate([ib, ib])),
            "side": pa.array(np.concatenate([np.zeros(n, dtype=np.int8),
                                             np.ones(n, dtype=np.int8)])),
            "text": pa.nulls(2 * n, pa.large_string()),
        })

    tagged = ds.map_batches(docrows, batch_format="pyarrow").union(
        pairs.map_batches(endpoints, batch_format="pyarrow"))

    def attach_text(t: pa.Table) -> Optional[pa.Table]:
        side = t.column("side").to_numpy(zero_copy_only=False)
        doc_idx = np.flatnonzero(side == -1)
        if len(doc_idx) == 0:          # endpoint of an id absent from docs
            return None
        ep = np.flatnonzero(side >= 0)
        if len(ep) == 0:
            return None
        ia = t.column("id_a").to_numpy(zero_copy_only=False)[ep]
        ib = t.column("id_b").to_numpy(zero_copy_only=False)[ep]
        sd = side[ep]
        # dedup (pair, side): the same candidate arrives once per matching band
        order = np.lexsort((sd, ib, ia))
        ia, ib, sd = ia[order], ib[order], sd[order]
        keep = np.ones(len(ia), dtype=bool)
        keep[1:] = (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1]) | (sd[1:] != sd[:-1])
        ia, ib, sd = ia[keep], ib[keep], sd[keep]
        text = t.column("text")[int(doc_idx[0])].as_py()
        return pa.table({
            "id_a": pa.array(ia), "id_b": pa.array(ib),
            "side": pa.array(sd),
            "text": pa.array([text] * len(ia), type=pa.large_string()),
        })

    def has_endpoints(b: pa.Table, starts, ends) -> np.ndarray:
        # vectorized: only doc-id groups that received endpoint rows are
        # interesting — candidate docs, a tiny fraction of the corpus
        is_ep = (b.column("side").to_numpy(zero_copy_only=False) >= 0) \
            .astype(np.int64)
        return np.add.reduceat(is_ep, starts) > 0

    def attach_block(b: pa.Table, starts, ends, want) -> Optional[pa.Table]:
        """Whole-block vectorized attach: no per-group Python. Each kept
        endpoint row learns the index of its group's doc row via a scatter,
        texts come out in ONE arrow take."""
        side = b.column("side").to_numpy(zero_copy_only=False)
        grp = np.repeat(np.arange(len(starts)), ends - starts)
        doc_of = np.full(len(starts), -1, dtype=np.int64)
        dmask = side == -1
        doc_of[grp[dmask]] = np.flatnonzero(dmask)
        sel = np.flatnonzero((side >= 0) & want[grp] & (doc_of[grp] >= 0))
        if not len(sel):
            return None
        ia = b.column("id_a").to_numpy(zero_copy_only=False)[sel]
        ib = b.column("id_b").to_numpy(zero_copy_only=False)[sel]
        sd = side[sel]
        # dedup (pair, side): (id_a, id_b, side) determines sid, so a global
        # lexsort-dedup equals the per-group dedup
        order = np.lexsort((sd, ib, ia))
        ia, ib, sd, sel = ia[order], ib[order], sd[order], sel[order]
        keep = np.ones(len(ia), dtype=bool)
        keep[1:] = (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1]) | (sd[1:] != sd[:-1])
        ia, ib, sd, sel = ia[keep], ib[keep], sd[keep], sel[keep]
        tcol = b.column("text")
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        texts = tcol.take(pa.array(doc_of[grp[sel]]))
        return pa.table({"id_a": pa.array(ia), "id_b": pa.array(ib),
                         "side": pa.array(sd), "text": texts})

    stage2_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                               ("side", pa.int8()), ("text", pa.large_string())])
    located = sorted_group_scan(tagged, ["sid"], attach_text, stage2_schema,
                                group_filter=has_endpoints,
                                block_fn=attach_block, sort_blocks=32)
    _tick("stage2 locate")

    # ---- stage 3: both texts of a pair are now in one (id_a, id_b) group
    shingle_cache: Dict[int, np.ndarray] = {}

    def verify(t: pa.Table) -> Optional[pa.Table]:
        side = t.column("side").to_numpy(zero_copy_only=False)
        i0 = np.flatnonzero(side == 0)
        i1 = np.flatnonzero(side == 1)
        if len(i0) == 0 or len(i1) == 0:
            return None
        ia = int(t.column("id_a")[0].as_py())
        ib = int(t.column("id_b")[0].as_py())
        if len(shingle_cache) > 100_000:   # bound worker memory
            shingle_cache.clear()
        ha = shingle_cache.get(ia)
        if ha is None:
            ha = shingle_cache[ia] = char_shingles(
                t.column("text")[int(i0[0])].as_py() or "", shingle_k)
        hb = shingle_cache.get(ib)
        if hb is None:
            hb = shingle_cache[ib] = char_shingles(
                t.column("text")[int(i1[0])].as_py() or "", shingle_k)
        inter = _sorted_intersect_count(ha, hb)
        union = ha.size + hb.size - inter
        jac = inter / union if union else 1.0
        if jac < threshold:
            return None
        return pa.table({
            "id_a": pa.array([ia], type=pa.int64()),
            "id_b": pa.array([ib], type=pa.int64()),
            "jaccard": pa.array(round_half_away(np.array([jac]), 6)),
        })

    def verify_block(b: pa.Table, starts, ends, want) -> Optional[pa.Table]:
        """Whole-block verify: texts pulled once per block, shingle sets
        cached per doc id, one output table. Only the unavoidable per-pair
        set intersection loops."""
        side = b.column("side").to_numpy(zero_copy_only=False)
        ids_a = b.column("id_a").to_numpy(zero_copy_only=False)
        ids_b = b.column("id_b").to_numpy(zero_copy_only=False)
        sizes = ends - starts
        g = np.flatnonzero(want & (sizes == 2))
        s = starts[g]
        first0 = side[s] == 0
        i0 = np.where(first0, s, s + 1)
        i1 = np.where(first0, s + 1, s)
        ok = (side[i0] == 0) & (side[i1] == 1)
        i0, i1 = i0[ok], i1[ok]
        # any group of size != 2 (a lost endpoint) has no partner text: skip,
        # same as the per-group path
        texts = b.column("text").to_pylist()
        cache: Dict[int, np.ndarray] = {}

        def sh(i: int, row: int) -> np.ndarray:
            got = cache.get(i)
            if got is None:
                got = cache[i] = char_shingles(texts[row] or "", shingle_k)
            return got

        out_a, out_b, out_j = [], [], []
        for r0, r1 in zip(i0, i1):
            ha = sh(int(ids_a[r0]), int(r0))
            hb = sh(int(ids_b[r1]), int(r1))
            inter = _sorted_intersect_count(ha, hb)
            union = ha.size + hb.size - inter
            jac = inter / union if union else 1.0
            if jac >= threshold:
                out_a.append(ids_a[r0])
                out_b.append(ids_b[r1])
                out_j.append(jac)
        if not out_a:
            return None
        return pa.table({
            "id_a": pa.array(np.asarray(out_a, dtype=np.int64)),
            "id_b": pa.array(np.asarray(out_b, dtype=np.int64)),
            "jaccard": pa.array(round_half_away(
                np.asarray(out_j, dtype=np.float64), 6)),
        })

    out = sorted_group_scan(located, ["id_a", "id_b"], verify,
                            pa.schema([("id_a", pa.int64()),
                                       ("id_b", pa.int64()),
                                       ("jaccard", pa.float64())]),
                            block_fn=verify_block, sort_blocks=32)
    _tick("stage3 verify")
    return out


# --------------------------------------------------------------------------- SimHash
SIMHASH_MOD = 2147483647        # Mersenne 2^31-1: poly mul stays in int64
SIMHASH_MUL1 = 1000003
SIMHASH_MUL2 = 999983


def poly_token_hash(toks) -> np.ndarray:
    """Deterministic SQL-mirrorable 62-bit token hash: two codepoint
    polynomial folds ``h = (h*MUL + cp + 1) % (2^31-1)`` with different
    multipliers, packed as ``h1 * 2^31 + h2``. DuckDB recomputes it
    bit-identically with list_reduce over unicode() codepoints (tested),
    which is what makes the whole SimHash family ORACLE-CHECKABLE.
    Vectorized by character position: one masked fused multiply-add pass
    per position over the (shrinking) still-active token set."""
    n = len(toks)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
    joined = "".join(toks)
    cps = np.frombuffer(joined.encode("utf-32-le", "surrogatepass"),
                        dtype=np.uint32).astype(np.int64)
    offs = np.zeros(n, dtype=np.int64)
    if n > 1:
        offs[1:] = np.cumsum(lens)[:-1]
    h1 = np.zeros(n, dtype=np.int64)
    h2 = np.zeros(n, dtype=np.int64)
    maxl = int(lens.max()) if n else 0
    for p in range(maxl):
        m = lens > p
        cp = cps[offs[m] + p]
        h1[m] = (h1[m] * SIMHASH_MUL1 + cp + 1) % SIMHASH_MOD
        h2[m] = (h2[m] * SIMHASH_MUL2 + cp + 1) % SIMHASH_MOD
    return (h1.astype(np.uint64) << np.uint64(31)) | h2.astype(np.uint64)


class SimHasher:
    """Actor stage: SimHash over word tokens; emits ``simhash`` plus
    ``sim_bucket_{i}`` columns (4 x 16-bit bands) so near signatures (<=3
    differing bits typically) collide in at least one band.

    Round 4: the token hash is ``poly_token_hash`` (62-bit packed
    codepoint polynomials) and the tokenizer is the explicit ASCII word
    class ``[A-Za-z0-9_]+`` — both exactly reproducible in DuckDB
    (regexp_extract_all + list_reduce + bit ops), so
    ``simhash_near_dup_documents`` is hash-checked against a full SQL
    recomputation of every signature, not rows-only. Signature bits
    62/63 are structurally 0 (token hashes are < 2^62; a -1-only
    accumulator never sets a bit), so the 4x16 band fold still covers
    hamming<=3 by pigeonhole.

    Signatures are computed BATCH-LEVEL: one regex pass over the batch's
    concatenated text (token -> owning doc via searchsorted on doc start
    offsets), one vectorized poly hash over all tokens, and a single
    scatter-add of per-token ±1 bit contributions into the (doc, bit)
    accumulator — no per-document Python loop. ``sim64`` is the per-doc
    reference path; batch_sim64 is bit-identical to it (tested)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self.word = re.compile(r"[A-Za-z0-9_]+")
        self._shifts = np.arange(64, dtype=np.uint64)

    def sim64(self, text: Optional[str]) -> int:
        """Single-doc reference path — batch_sim64 is the batch equivalent."""
        toks = self.word.findall(text or "")
        if not toks:
            return 0
        hs = poly_token_hash(toks)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
        acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def batch_sim64(self, texts) -> np.ndarray:
        """(n,) uint64 SimHash signatures for a whole batch in one tokenizer
        pass. Texts are joined with '\\n' (never inside a \\w+ token, so the
        token stream is identical to per-doc findall); token positions map to
        docs via searchsorted on the cumulative start offsets. Sum order per
        (doc, bit) differs from the per-doc path but ±1 integer addition is
        associative — results are bit-identical."""
        n = len(texts)
        safe = [t or "" for t in texts]
        if n == 0:
            return np.empty(0, dtype=np.uint64)
        joined = "\n".join(safe)
        starts = np.zeros(n, dtype=np.int64)
        if n > 1:
            lens = np.fromiter((len(s) + 1 for s in safe), dtype=np.int64, count=n)
            starts[1:] = np.cumsum(lens)[:-1]
        toks, pos = [], []
        for m in self.word.finditer(joined):
            toks.append(m.group(0))
            pos.append(m.start())
        if not toks:
            return np.zeros(n, dtype=np.uint64)
        doc = np.searchsorted(starts, np.asarray(pos, dtype=np.int64),
                              side="right") - 1
        hs = poly_token_hash(toks)
        # tokens arrive in DOC ORDER (finditer scans the joined text left to
        # right), so per-doc ±1 sums are a segment reduceat — ~10x faster
        # than the np.add.at scatter it replaces, bit-identical (integer
        # addition is associative). Chunked so the (tokens, 64) int32
        # expansion stays bounded; a doc split across chunks merges exactly
        # via the (tiny) per-segment scatter-add.
        acc = np.zeros((n, 64), dtype=np.int64)
        CH = 1 << 18
        for s in range(0, len(hs), CH):
            e = min(s + CH, len(hs))
            d = doc[s:e]
            bits = ((hs[s:e, None] >> self._shifts[None, :])
                    & np.uint64(1)).astype(np.int32)
            contrib = 2 * bits - 1
            b = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            sums = np.add.reduceat(contrib, b, axis=0)
            np.add.at(acc, d[b], sums)
        return ((acc > 0).astype(np.uint64) << self._shifts[None, :]).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sh = self.batch_sim64(texts)
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


def _simhash_bucket_pairs(ids: np.ndarray, hs: np.ndarray, salt: int,
                          max_bucket: int, max_hamming: int):
    """One SimHash band bucket -> (id_a, id_b, hamming) arrays, salt-split
    beyond max_bucket (shared by the distributed scan's group_fn and the
    in-process path, so the two can never drift)."""
    order = np.argsort(ids)
    ids, hs = ids[order], hs[order]
    keep = np.ones(len(ids), dtype=bool)
    keep[1:] = ids[1:] != ids[:-1]
    ids, hs = ids[keep], hs[keep]
    if len(ids) < 2:
        return None
    n_chunks = int(np.ceil(len(ids) / max_bucket))
    if n_chunks > 1:
        _log.warning("SimHash bucket of %d docs salt-split into %d chunks",
                     len(ids), n_chunks)
        # band-salted permutation: each band chunks a giant bucket
        # differently, recovering cross-chunk pairs the others miss
        with np.errstate(over="ignore"):
            order = np.argsort(_mix64(ids.astype(np.uint64) + np.uint64(salt)),
                               kind="stable")
        ids, hs = ids[order], hs[order]
    fa, fb, fh = [], [], []
    for c in range(n_chunks):
        sl = slice(c * max_bucket, (c + 1) * max_bucket)
        cid, chs = ids[sl], hs[sl]
        co = np.argsort(cid)
        cid, chs = cid[co], chs[co]
        ia, ib = np.triu_indices(len(cid), k=1)
        hd = hamming64(chs[ia].view(np.uint64), chs[ib].view(np.uint64))
        k = hd <= max_hamming
        fa.append(cid[ia][k])
        fb.append(cid[ib][k])
        fh.append(hd[k])
    return np.concatenate(fa), np.concatenate(fb), np.concatenate(fh)


def _simhash_inproc(df, id_col: str, text_col: str, max_hamming: int,
                    max_bucket: int):
    """Fused in-process SimHash near-dup pairs for a SMALL corpus
    (<= MINHASH_INPROC_CAP rows, footer-gated by the caller): the same
    batch_sim64 signatures, the same band-key mix and salt, the same
    _simhash_bucket_pairs — one process instead of a sort execution whose
    scheduling overhead dominates at this size. Equality-tested against
    the distributed path."""
    import ray.data as rd

    empty = pa.table({
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
        "hamming": pa.array([], type=pa.int64())})
    n = len(df)
    if n < 2:
        return rd.from_arrow(empty)
    hasher = SimHasher(id_col=id_col, text_col=text_col)
    sh = hasher.batch_sim64(df[text_col].tolist())
    ids = df[id_col].to_numpy().astype(np.int64)
    gold = np.uint64(0x9E3779B97F4A7C15)
    keys, oid, osh = [], [], []
    with np.errstate(over="ignore"):
        for i in range(4):
            bucket = (sh >> np.uint64(16 * i)) & np.uint64(0xFFFF)
            keys.append(_mix64(bucket + np.uint64(i + 1) * gold))
            oid.append(ids)
            osh.append(sh.view(np.int64))
    key = np.concatenate(keys)
    dids = np.concatenate(oid)
    shs = np.concatenate(osh)
    order = np.argsort(key, kind="stable")
    key, dids, shs = key[order], dids[order], shs[order]
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    ends = np.r_[starts[1:], len(key)]
    fa, fb, fh = [], [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        got = _simhash_bucket_pairs(dids[s:e], shs[s:e], int(key[s]),
                                    max_bucket, max_hamming)
        if got is not None:
            fa.append(got[0])
            fb.append(got[1])
            fh.append(got[2])
    if not fa:
        return rd.from_arrow(empty)
    ia = np.concatenate(fa)
    ib = np.concatenate(fb)
    hd = np.concatenate(fh)
    order = np.lexsort((hd, ib, ia))       # distinct pair, Min(hamming)
    ia, ib, hd = ia[order], ib[order], hd[order]
    keep = np.ones(len(ia), dtype=bool)
    keep[1:] = (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])
    return rd.from_arrow(pa.table({
        "id_a": pa.array(ia[keep]), "id_b": pa.array(ib[keep]),
        "hamming": pa.array(hd[keep])}))


def simhash_near_dups(ds, id_col: str = "doc_id", text_col: str = "text",
                      max_hamming: int = 3, concurrency=(1, 8),
                      max_bucket: int = 1024, n_rows: Optional[int] = None):
    """SimHash near-dup pairs: the 4 x 16-bit band buckets are folded into
    ONE 8-byte bucket-key sort (band id mixed into the key) scanned by the
    shared sorted_group_scan — one narrow all-to-all replaces four
    groupby+per-group-Python passes; block-edge buckets are stitched exactly
    on the driver (ids+sigs only). Oversized buckets are salt-split with a
    band-keyed permutation (other bands recover different cross-chunk
    pairs), not dropped. Below MINHASH_INPROC_CAP rows (footer-gated via
    ``n_rows``) the fused in-process path runs instead (_simhash_inproc,
    equality-tested)."""
    from ray.data.aggregate import Min

    if n_rows is not None and n_rows <= MINHASH_INPROC_CAP:
        return _simhash_inproc(ds.to_pandas(), id_col, text_col,
                               max_hamming, max_bucket)

    sigs = ds.map_batches(SimHasher,
                          fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
                          batch_format="pyarrow", concurrency=concurrency)
    gold = np.uint64(0x9E3779B97F4A7C15)

    def explode(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sh = b.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        keys, oid, osh = [], [], []
        with np.errstate(over="ignore"):
            for i in range(4):
                bucket = b.column(f"sim_bucket_{i}").to_numpy(
                    zero_copy_only=False).astype(np.uint64)
                keys.append(_mix64(bucket + np.uint64(i + 1) * gold))
                oid.append(ids)
                osh.append(sh)
        return pa.table({
            "bkey": pa.array(np.concatenate(keys).view(np.int64)),
            id_col: pa.array(np.concatenate(oid)),
            "sh": pa.array(np.concatenate(osh).view(np.int64)),
        })

    def group_fn(t: pa.Table) -> Optional[pa.Table]:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        shs = t.column("sh").to_numpy(zero_copy_only=False)
        salt = int(t.column("bkey")[0].as_py()) & 0xFFFFFFFFFFFFFFFF
        got = _simhash_bucket_pairs(ids, shs, salt, max_bucket, max_hamming)
        if got is None:
            return None
        return pa.table({"id_a": pa.array(got[0]), "id_b": pa.array(got[1]),
                         "hamming": pa.array(got[2])})

    out_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                            ("hamming", pa.int64())])
    allp = sorted_group_scan(
        sigs.map_batches(explode, batch_format="pyarrow"),
        ["bkey"], group_fn, out_schema,
        group_filter=lambda b, s, e: (e - s) >= 2)
    return (allp.groupby(["id_a", "id_b"])
            .aggregate(Min("hamming", alias_name="hamming")))


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
        from rayschema.similarity import list_column_matrix
        mat = list_column_matrix(col)
        planes = self._get_planes(mat.shape[1])
        signs = (mat @ planes.T) > 0
        bucket = np.zeros(len(mat), dtype=np.uint64)
        for i in range(self.bits):
            bucket |= signs[:, i].astype(np.uint64) << np.uint64(i)
        return batch.append_column(self.out, pa.array(bucket, type=pa.uint64()))


def embedding_near_dups(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                        cos_threshold: float = 0.95, bits: int = 12,
                        concurrency=(1, 8), max_bucket: int = 2048):
    """Embedding-cosine near-dup pairs via hyperplane-LSH buckets + exact
    cosine verify inside each bucket — the 100-TB scale path, now on the
    same shared sorted_group_scan as the MinHash/SimHash buckets (one narrow
    (bucket, id, vec) sort; recall is governed by ``bits``). Oversized
    buckets are split on id order (single banding — a salted permutation has
    no second band to recover cross-chunk pairs), not dropped."""
    bucketed = ds.map_batches(HyperplaneLSH,
                              fn_constructor_kwargs=dict(vec_col=vec_col, bits=bits),
                              batch_format="pyarrow", concurrency=concurrency)

    def keyed(b: pa.Table) -> pa.Table:
        bk = b.column("lsh_bucket").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        return pa.table({"bkey": pa.array(bk.view(np.int64)),
                         id_col: b.column(id_col),
                         vec_col: b.column(vec_col)})

    def group_fn(t: pa.Table) -> Optional[pa.Table]:
        if t.num_rows < 2:
            return None
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        vcol = t.column(vec_col)
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        vecs = vcol.to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, vecs = ids[order], vecs[order]
        n_chunks = int(np.ceil(len(ids) / max_bucket))
        if n_chunks > 1:
            _log.warning("LSH embedding bucket of %d vecs salt-split into %d chunks",
                         len(ids), n_chunks)
        fa, fb, fc = [], [], []
        for c in range(n_chunks):
            sl = slice(c * max_bucket, (c + 1) * max_bucket)
            cid = ids[sl]
            mat = np.stack(vecs[sl]).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat / np.maximum(norms, 1e-12)
            sim = mat @ mat.T
            ia, ib = np.triu_indices(len(cid), k=1)
            cs = sim[ia, ib]
            keep = cs >= cos_threshold
            fa.append(cid[ia][keep])
            fb.append(cid[ib][keep])
            fc.append(np.round(cs[keep], 6))
        return pa.table({"id_a": pa.array(np.concatenate(fa)),
                         "id_b": pa.array(np.concatenate(fb)),
                         "cosine": pa.array(np.concatenate(fc))})

    out_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                            ("cosine", pa.float64())])
    return sorted_group_scan(
        bucketed.map_batches(keyed, batch_format="pyarrow"),
        ["bkey"], group_fn, out_schema,
        group_filter=lambda b, s, e: (e - s) >= 2)


class _CosinePairScan:
    """Actor stage: batch rows x broadcast corpus matrix; emits exact cosine
    pairs (id_a < id_b) at or above the threshold."""

    def __init__(self, corpus_ref, id_col: str, vec_col: str, threshold: float):
        import ray

        ids, mat = ray.get(corpus_ref) if not isinstance(corpus_ref, tuple) else corpus_ref
        self.ids = np.asarray(ids, dtype=np.int64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        self.mat = mat / np.maximum(norms, 1e-12)
        self.id_col = id_col
        self.vec_col = vec_col
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        from rayschema.similarity import list_column_matrix
        rows = list_column_matrix(col)
        rows = rows / np.maximum(np.linalg.norm(rows, axis=1, keepdims=True), 1e-12)
        rid = batch.column(self.id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sims = rows @ self.mat.T                         # (b, N)
        ri, cj = np.nonzero(sims >= self.threshold)
        keep = rid[ri] < self.ids[cj]                    # id_a < id_b, no self
        ri, cj = ri[keep], cj[keep]
        return pa.table({
            "id_a": pa.array(rid[ri]),
            "id_b": pa.array(self.ids[cj]),
            "cosine": pa.array(round_half_away(sims[ri, cj], 6)),
        })


def embedding_cosine_pairs_exact(ds, id_col: str = "vec_id",
                                 vec_col: str = "embedding",
                                 threshold: float = 0.4, concurrency=(1, 8)):
    """EXACT all-pairs cosine >= threshold — the correctness baseline for the
    LSH variant (and the DuckDB-oracle-checked query). The normalized corpus
    matrix is broadcast ONCE via ray.put and each batch streams a block-row
    of the similarity matrix; requires the embedding matrix to fit in worker
    memory (fine up to ~10^7 x 10^2 dims — beyond that use
    embedding_near_dups)."""
    import ray

    full = ds.select_columns([id_col, vec_col]).to_pandas()
    mat = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    ref = ray.put((full[id_col].to_numpy().astype(np.int64), mat))
    return ds.map_batches(_CosinePairScan,
                          fn_constructor_kwargs=dict(corpus_ref=ref, id_col=id_col,
                                                     vec_col=vec_col,
                                                     threshold=threshold),
                          batch_format="pyarrow", concurrency=concurrency)


# --------------------------------------------------------------------------- exact char-gram Jaccard
class _ExactJaccardPairs:
    """Actor stage over a pair-index range: decodes upper-triangle linear
    indices to (i, j), computes exact character-k-gram Jaccard from the
    broadcast (small) doc subset. Character substrings (codepoints, not
    bytes) so the DuckDB substr() oracle mirrors it exactly — and since
    char_shingles also shingles by codepoints, the LSH verify kernel agrees
    with this ground truth on multi-byte text too (recall measured against
    it is pure LSH loss, not a shingle-unit mismatch)."""

    def __init__(self, docs_ref, k: int, threshold: float):
        import ray

        ids, texts = ray.get(docs_ref) if not isinstance(docs_ref, tuple) else docs_ref
        self.ids = np.asarray(ids, dtype=np.int64)
        self.sets = [frozenset(t[i:i + k] for i in range(len(t) - k + 1))
                     for t in texts]
        self.n = len(ids)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        lin = batch.column("id").to_numpy(zero_copy_only=False).astype(np.float64)
        n = self.n
        i = np.floor((2 * n - 1 - np.sqrt((2 * n - 1) ** 2 - 8 * lin)) / 2).astype(np.int64)
        j = (lin.astype(np.int64) - i * (2 * n - i - 1) // 2 + i + 1)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(i, j):
            sa, sb = self.sets[a], self.sets[b]
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            jac = inter / union if union else 1.0
            if jac >= self.threshold:
                out_a.append(self.ids[a])
                out_b.append(self.ids[b])
                out_j.append(jac)
        return pa.table({
            "id_a": pa.array(np.asarray(out_a, dtype=np.int64)),
            "id_b": pa.array(np.asarray(out_b, dtype=np.int64)),
            "jaccard": pa.array(round_half_away(np.asarray(out_j, dtype=np.float64), 6)),
        })


def exact_jaccard_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                        id_limit: int = 300, k: int = 5, threshold: float = 0.5,
                        concurrency=(1, 8)):
    """Exact all-pairs character-k-gram Jaccard over the deterministic doc
    subset ``id < id_limit`` (the ground truth the LSH recall is measured
    against, and the DuckDB-mirrorable query). The bounded subset is
    broadcast once; the O(n^2) pair grid is streamed as a range dataset."""
    import ray
    import ray.data as rd

    sub = (ds.select_columns([id_col, text_col])
           .filter(expr=f"{id_col} < {id_limit}")
           .to_pandas())
    sub = sub[sub[text_col].notna() & (sub[text_col].str.len() >= k)]
    sub = sub.sort_values(id_col).reset_index(drop=True)
    n = len(sub)
    if n < 2:
        return rd.from_arrow(pa.table({"id_a": pa.array([], type=pa.int64()),
                                       "id_b": pa.array([], type=pa.int64()),
                                       "jaccard": pa.array([], type=pa.float64())}))
    ref = ray.put((sub[id_col].to_numpy(), list(sub[text_col])))
    n_pairs = n * (n - 1) // 2
    return rd.range(n_pairs).map_batches(
        _ExactJaccardPairs,
        fn_constructor_kwargs=dict(docs_ref=ref, k=k, threshold=threshold),
        batch_format="pyarrow", batch_size=8192, concurrency=concurrency)


# --------------------------------------------------------------------------- clusters
def connected_components_ds(pairs_ds, id_a: str = "id_a", id_b: str = "id_b",
                            max_iter: int = 64, num_partitions: int = 8):
    """DISTRIBUTED connected components over a verified-pair Dataset by
    iterated MIN-LABEL PROPAGATION — the scale fallback for pair sets too
    large for the driver union-find (billions of pairs on a dup-heavy
    crawl). Each round: every node's current label flows across every edge
    (hash join), then each node keeps the min of its own and all received
    labels (groupby-min). The total label sum is strictly decreasing until
    fixpoint, so convergence is detected with one cheap aggregate per round;
    rounds needed = graph diameter (near-dup clusters are shallow).

    Returns a Dataset (doc_id, cluster_id), cluster_id = min doc id of the
    component — identical rows to connected_components (equality-tested).
    Mirrors the recursive min-label CTE oracle used by
    near_dup_clusters_exact (__ray_entry__.oracle_sql)."""
    from ray.data.aggregate import Min, Sum

    edges = (_proj(pairs_ds, {id_a: "src", id_b: "dst"})
             .union(_proj(pairs_ds, {id_b: "src", id_a: "dst"}))
             .materialize())

    def self_rows(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("src"), "dst": b.column("src")})

    labels = _proj(
        edges.union(edges.map_batches(self_rows, batch_format="pyarrow"))
        .groupby("src").aggregate(Min("dst", alias_name="label")),
        {"src": "node", "label": "label"}).materialize()
    # an EMPTY hash partition reaches the Acero join as a schemaless
    # block and ArrowInvalid's on the key lookup — cap partitions so each
    # expects >= 16 keys (tiny graphs run 1 partition; at billions of
    # labels the requested count is untouched). A fully EMPTY graph
    # (zero verified pairs — e.g. the sf0.1 oracle scope) loses its
    # schema entirely, so short-circuit before any join.
    if labels.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "cluster_id": pa.array([], type=pa.int64())}))
    n_parts = int(max(1, min(num_partitions, labels.count() // 16)))
    prev = labels.aggregate(Sum("label", alias_name="s")).get("s")
    for it in range(max_iter):
        msgs = edges.join(labels, join_type="inner",
                          num_partitions=n_parts,
                          on=("src",), right_on=("node",))
        cand = labels.union(_proj(msgs, {"dst": "node", "label": "label"}))
        labels = cand.groupby("node") \
            .aggregate(Min("label", alias_name="label")).materialize()
        cur = labels.aggregate(Sum("label", alias_name="s")).get("s")
        if cur == prev:                # labels monotone: fixpoint reached
            break
        prev = cur
    else:
        _log.warning("connected_components_ds: no fixpoint after %d rounds",
                     max_iter)
    return _proj(labels, {"node": "doc_id", "label": "cluster_id"})


def connected_components(pairs: pd.DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b") -> pd.DataFrame:
    """Near-duplicate clusters from verified pairs: union-find on the driver
    (sound because VERIFIED pairs are orders of magnitude fewer than docs —
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
                      bands: int = 16, concurrency=(1, 8),
                      driver_pair_cap: int = 2_000_000,
                      n_rows: Optional[int] = None) -> pd.DataFrame:
    """End-to-end near-dup clustering: MinHash-LSH candidates -> DISTRIBUTED
    exact-Jaccard verify -> connected components over the verified pairs.
    Up to ``driver_pair_cap`` verified pairs the components run as driver
    union-find (verified TRUE near-dup pairs only — never candidate texts);
    beyond the cap they run fully distributed via min-label propagation
    (connected_components_ds, equality-tested against the driver path).
    Returns (doc_id, cluster_id) for every doc in a multi-doc cluster; docs
    absent from the result are unique."""
    verified = minhash_near_dups(ds, id_col=id_col, text_col=text_col,
                                 num_perm=num_perm, bands=bands,
                                 threshold=jaccard_threshold,
                                 concurrency=concurrency,
                                 n_rows=n_rows).materialize()
    n_pairs = verified.count()
    if n_pairs == 0:
        return pd.DataFrame({"doc_id": [], "cluster_id": []})
    if n_pairs > driver_pair_cap:
        return (connected_components_ds(verified).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
    return connected_components(verified.to_pandas())


# --------------------------------------------------------------------------- PPJoin (prefix-filtered exact similarity join)


PPJOIN_PREFIX_GROUP_CAP = 4096   # warn threshold for one prefix-token bucket
# driver-path pair-generation memory budget: at most this many candidate
# pairs are materialized at once per bucket (anchor rows sliced to fit)
PPJOIN_DRIVER_PAIR_BUDGET = 1 << 22
PPJOIN_DRIVER_CAP = 20_000       # scoped-doc count under which the fused
#                                  in-process path runs (text bytes bounded
#                                  by cap x doc size — the near_dup_clusters
#                                  driver_pair_cap discipline)


def _ppjoin_driver(sub, id_col: str, text_col: str, threshold: float,
                   shingle_k: int):
    """Fused in-process PPJoin for a SMALL scoped input (<=
    PPJOIN_DRIVER_CAP docs after the id filter): the same prefix-filter
    candidate generation and the same exact-Jaccard verify, but one
    driver pass instead of ~8 short Ray executions whose fixed
    scheduling overhead dominates at this size. Returns identical rows
    to the distributed path (both generate a candidate SUPERSET and
    verify exactly — equality-tested in tests); the distributed path
    stays the design above the cap."""
    import math

    import ray.data as rd

    empty = rd.from_arrow(pa.table({
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
        "jaccard": pa.array([], type=pa.float64())}))
    df = sub.to_pandas()
    profiles = []
    for i, t in zip(df[id_col].tolist(), df[text_col].tolist()):
        if i is None or t is None or len(t) < shingle_k:
            continue
        profiles.append((int(i), char_shingles(t, shingle_k).view(np.int64)))
    if len(profiles) < 2:
        return empty
    # global rarity order (df ascending, shingle tie-break) — the same
    # prefix ordering the distributed path broadcasts
    allsh = np.concatenate([h for _, h in profiles])
    vocab, dfc = np.unique(allsh, return_counts=True)
    ex_sh, ex_id, ex_n, ex_pos = [], [], [], []
    for i, hs in profiles:
        n = hs.size
        p = n - int(math.ceil(threshold * n - 1e-9)) + 1
        if p <= 0:
            p = 1
        order = np.lexsort((hs, dfc[np.searchsorted(vocab, hs)]))[:p]
        ex_sh.append(hs[order])
        ex_id.append(np.full(p, i, dtype=np.int64))
        ex_n.append(np.full(p, n, dtype=np.int64))
        ex_pos.append(np.arange(p, dtype=np.int64))
    sh = np.concatenate(ex_sh)
    ids = np.concatenate(ex_id)
    ns = np.concatenate(ex_n)
    pos = np.concatenate(ex_pos)
    # bucket by prefix token, pairs vectorized per bucket (the group_fn
    # length + positional filters, same tolerances)
    order = np.lexsort((ids, sh))
    sh, ids, ns, pos = sh[order], ids[order], ns[order], pos[order]
    starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
    ends = np.r_[starts[1:], len(sh)]
    pa_l, pb_l = [], []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if m > PPJOIN_PREFIX_GROUP_CAP:
            # same warning the distributed group_fn emits: a hot shared
            # shingle makes this bucket O(m^2) pairs; still exact
            _log.warning(
                "ppjoin driver prefix bucket has %d entries (> cap %d); "
                "O(m^2) candidate generation, chunked to bound memory",
                m, PPJOIN_PREFIX_GROUP_CAP)
        gi, gn, gp = ids[s:e], ns[s:e], pos[s:e]
        # iterate the anchor row in slices so driver memory stays
        # O(chunk * m), not O(m^2), on adversarial hot buckets
        chunk = max(1, PPJOIN_DRIVER_PAIR_BUDGET // max(m, 1))
        for a0 in range(0, m - 1, chunk):
            a1 = min(a0 + chunk, m - 1)
            ia = np.repeat(np.arange(a0, a1), m - 1 - np.arange(a0, a1))
            ib = np.concatenate(
                [np.arange(i + 1, m) for i in range(a0, a1)]) \
                if a1 > a0 else np.array([], dtype=np.int64)
            lo = np.minimum(gn[ia], gn[ib]).astype(np.float64)
            hi = np.maximum(gn[ia], gn[ib]).astype(np.float64)
            keep = lo + 1e-9 >= threshold * hi
            need = np.ceil(threshold / (1.0 + threshold)
                           * (gn[ia] + gn[ib]).astype(np.float64)
                           - 1e-9)
            remain = np.minimum(gn[ia] - gp[ia], gn[ib] - gp[ib]) \
                .astype(np.float64)
            keep &= remain >= need
            keep &= gi[ia] != gi[ib]
            if keep.any():
                pa_l.append(gi[ia[keep]])
                pb_l.append(gi[ib[keep]])
    if not pa_l:
        return empty
    a = np.concatenate(pa_l)
    b = np.concatenate(pb_l)
    aa, bb = np.minimum(a, b), np.maximum(a, b)
    cand = np.unique(np.stack([aa, bb], axis=1), axis=0)
    cand = [(int(x), int(y)) for x, y in cand]
    prof = {i: np.sort(h) for i, h in profiles}
    out_a, out_b, out_j = [], [], []
    for ia, ib in sorted(cand):
        ha, hb = prof[ia], prof[ib]
        inter = _sorted_intersect_count(ha, hb)
        union = ha.size + hb.size - inter
        j = inter / union if union else 1.0
        if j >= threshold:
            out_a.append(ia)
            out_b.append(ib)
            out_j.append(j)
    return rd.from_arrow(pa.table({
        "id_a": pa.array(out_a, type=pa.int64()),
        "id_b": pa.array(out_b, type=pa.int64()),
        "jaccard": pa.array(round_half_away(np.array(out_j, dtype=np.float64),
                                            6))}))


def ppjoin_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                 threshold: float = 0.5, shingle_k: int = 5,
                 id_limit: Optional[int] = None, concurrency=(1, 8),
                 num_partitions: int = 8,
                 driver_cap: Optional[int] = None):
    """PPJoin-style EXACT set-similarity self-join via PREFIX FILTERING
    (Chaudhuri et al. 2006 SSJoin / Xiao et al. 2008 PPJoin — public
    algorithms): all document pairs with character-``shingle_k``-gram
    Jaccard >= ``threshold``, with NO LSH recall loss and NO all-pairs
    grid. The third member of the near-dup family (exact_jaccard_pairs =
    quadratic ground truth, minhash_near_dups = approximate LSH, this =
    exact at scale).

    Prefix-filter principle: order every document's shingle set by one
    GLOBAL rarity order (ascending document frequency, shingle hash as
    the tie-break); if Jaccard(A, B) >= t, then A and B must share at
    least one shingle inside their first ``|set| - ceil(t * |set|) + 1``
    shingles under that order — so only prefix shingles are ever
    exploded, and candidate buckets are keyed by the RAREST shingles
    (bucket size ~ df of a rare token, not corpus size).

    Stages (all distributed):
    1. document-frequency pass: per-batch distinct-shingle partials ->
       one groupby — the df table is shingle-vocabulary-bounded and
       broadcasts once (same Zipf assumption as the vocabulary ops;
       Misra-Gries pruning is the heavier-corpus fallback).
    2. prefix emit: stateless map — per doc, order shingles by
       (df, shingle), emit the prefix as (bkey=shingle, id, n=set size,
       pos=prefix position).
    3. candidate pairs: ONE bkey-keyed ``sorted_group_scan``; inside a
       bucket the LENGTH FILTER (min_n >= t * max_n) and the PPJoin
       POSITIONAL FILTER (min(n_a - pos_a, n_b - pos_b) >=
       ceil(t / (1 + t) * (n_a + n_b)) — safe because a qualifying
       pair's FIRST shared prefix token always satisfies it) prune
       pairs that could never reach t. Buckets past
       PPJOIN_PREFIX_GROUP_CAP log a warning but still emit exactly
       (prefix tokens are df-ordered rare, so a giant bucket means a
       degenerate corpus).
    4. pair dedup + the shared DISTRIBUTED exact-Jaccard verify
       (verify_pairs_jaccard_ds) — text moves once, candidates only.

    Adaptive small-scope path: when the scoped input is <=
    ``driver_cap`` docs (default PPJOIN_DRIVER_CAP, 0 disables) the
    same prefix filter + exact verify run fused in ONE driver pass
    (_ppjoin_driver) — at that size the ~8 short Ray executions above
    are pure scheduling overhead (measured 10.1 s -> 1.2 s on the
    300-doc oracle scope). Both paths verify exactly, so their final
    rows are identical (equality-tested).

    Returns a Dataset (id_a, id_b, jaccard), identical rows to
    exact_jaccard_pairs on the same scope (equality-tested)."""
    import math

    import ray
    from ray.data.aggregate import Sum

    sub = ds.select_columns([id_col, text_col])
    if id_limit is not None:
        sub = sub.filter(expr=f"{id_col} < {id_limit}")
    sub = sub.materialize()

    cap = PPJOIN_DRIVER_CAP if driver_cap is None else driver_cap
    if cap and sub.count() <= cap:
        return _ppjoin_driver(sub, id_col, text_col, threshold, shingle_k)

    def _doc_shingles(b: pa.Table):
        ids = b.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        texts = b.column(text_col).to_pylist()
        per = []
        for i, t in zip(ids, texts):
            if t is None or len(t) < shingle_k:
                continue
            # consistent int64 VIEW of the uint64 hashes everywhere
            # (vocab sort, prefix lexsort, bkey) so the global order and
            # the searchsorted lookups agree
            per.append((i, char_shingles(t, shingle_k).view(np.int64)))
        return per

    def df_partial(b: pa.Table) -> pa.Table:
        per = _doc_shingles(b)
        if not per:
            return pa.table({"sh": pa.array([], type=pa.int64()),
                             "df": pa.array([], type=pa.int64())})
        allsh = np.concatenate([hs for _, hs in per])
        us, cnt = np.unique(allsh, return_counts=True)
        return pa.table({"sh": pa.array(us),
                         "df": pa.array(cnt.astype(np.int64))})

    dftab = (sub.map_batches(df_partial, batch_format="pyarrow")
             .groupby("sh").aggregate(Sum("df", alias_name="df"))
             .to_pandas())
    if not len(dftab):
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64())}))
    dftab = dftab.sort_values("sh")
    ref = ray.put((dftab["sh"].to_numpy(np.int64),
                   dftab["df"].to_numpy(np.int64)))

    def prefix_emit(b: pa.Table, _ref=ref) -> pa.Table:
        vocab, dfv = ray.get(_ref)
        per = _doc_shingles(b)
        out_sh, out_id, out_n = [], [], []
        for i, hs in per:
            n = hs.size
            # ceil with a tolerance so float error can only LENGTHEN the
            # prefix (never drop a correct candidate)
            p = n - int(math.ceil(threshold * n - 1e-9)) + 1
            if p <= 0:
                p = 1
            d = dfv[np.searchsorted(vocab, hs)]
            order = np.lexsort((hs, d))[:p]
            out_sh.append(hs[order])
            out_id.append(np.full(p, i, dtype=np.int64))
            # pack (set size, prefix position) into one rider column
            out_n.append(np.full(p, n << 20, dtype=np.int64)
                         + np.arange(p, dtype=np.int64))
        if not out_sh:
            return pa.table({"bkey": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        return pa.table({"bkey": pa.array(np.concatenate(out_sh)),
                         id_col: pa.array(np.concatenate(out_id)),
                         "n": pa.array(np.concatenate(out_n))})

    exploded = sub.map_batches(prefix_emit, batch_format="pyarrow")
    out_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])

    def group_fn(t: pa.Table):
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        packed = t.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, packed = ids[order], packed[order]
        ns, pos = packed >> 20, packed & ((1 << 20) - 1)
        if len(ids) > PPJOIN_PREFIX_GROUP_CAP:
            _log.warning(
                "ppjoin prefix bucket of %d docs (> cap %d): emitting "
                "exactly anyway", len(ids), PPJOIN_PREFIX_GROUP_CAP)
        ia, ib = np.triu_indices(len(ids), k=1)
        lo = np.minimum(ns[ia], ns[ib]).astype(np.float64)
        hi = np.maximum(ns[ia], ns[ib]).astype(np.float64)
        keep = lo + 1e-9 >= threshold * hi
        # positional filter: remaining tokens from this position on must
        # still be able to reach the required overlap; a qualifying
        # pair's FIRST shared prefix token always passes, so per-token
        # pruning + pair-dedup loses nothing
        need = np.ceil(threshold / (1.0 + threshold)
                       * (ns[ia] + ns[ib]).astype(np.float64) - 1e-9)
        remain = np.minimum(ns[ia] - pos[ia], ns[ib] - pos[ib]) \
            .astype(np.float64)
        keep &= remain >= need
        if not keep.any():
            return None
        return pa.table({"id_a": pa.array(ids[ia[keep]]),
                         "id_b": pa.array(ids[ib[keep]])})

    pairs = sorted_group_scan(exploded, ["bkey"], group_fn, out_schema,
                              group_filter=lambda b, s, e: (e - s) >= 2)
    cand = _distinct_pairs(pairs)
    return verify_pairs_jaccard_ds(
        cand, sub, id_col=id_col, text_col=text_col, threshold=threshold,
        shingle_k=shingle_k, num_partitions=num_partitions,
        concurrency=concurrency)


# --------------------------------------------------------------------------- edit-distance pairs (q-gram filter + banded DP)


def _qgram_profile(text: str, q: int = 4):
    """Sorted distinct q-gram hashes + multiplicities (multiset profile)."""
    if len(text) < q:
        h = _mix64(hash64(np.array([text], dtype=object))).view(np.int64)
        return h, np.ones(1, dtype=np.int64)
    b = np.frombuffer(text.encode("utf-32-le", "surrogatepass"),
                      dtype=np.uint32)
    hs = _rolling_hashes(b, q).view(np.int64)
    return np.unique(hs, return_counts=True)


def _multiset_intersect(da, ca, db, cb) -> int:
    """Multiset intersection size of two (distinct, counts) profiles."""
    pos = np.searchsorted(da, db)
    posc = np.minimum(pos, len(da) - 1) if len(da) else pos
    hit = (pos < len(da)) & (da[posc] == db) if len(da) \
        else np.zeros(len(db), dtype=bool)
    return int(np.minimum(ca[posc[hit]], cb[hit]).sum()) if hit.any() else 0


def _banded_levenshtein(a: np.ndarray, b: np.ndarray, k: int) -> int:
    """Exact unit-cost Levenshtein if <= k, else any value > k (banded
    Ukkonen DP, band width 2k+1, one numpy row per character of ``a``)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if la == 0 or lb == 0:
        return max(la, lb)
    BIG = k + 1
    prev = np.arange(lb + 1, dtype=np.int64)
    prev[prev > BIG] = BIG
    for i in range(1, la + 1):
        lo = max(1, i - k)
        hi = min(lb, i + k)
        cur = np.full(lb + 1, BIG, dtype=np.int64)
        cur[0] = min(i, BIG)
        seg_b = b[lo - 1:hi]
        sub = prev[lo - 1:hi] + (seg_b != a[i - 1])
        dele = prev[lo:hi + 1] + 1
        m = np.minimum(sub, dele)
        # insertion needs a left-to-right scan: cur[j] = min(m[j], cur[j-1]+1)
        run = np.minimum(m, BIG)
        acc = cur[lo - 1]
        out = np.empty(hi - lo + 1, dtype=np.int64)
        for j in range(hi - lo + 1):
            acc = min(run[j], acc + 1)
            out[j] = acc
        cur[lo:hi + 1] = out
        prev = cur
        if prev.min() > k:     # whole band exceeded k: can never recover
            return k + 1
    return int(prev[lb])


class _EditDistancePairs:
    """Actor for the bounded-scope exact edit-distance pair grid: q-gram
    profiles and codepoint arrays built ONCE per actor from the broadcast
    scope; per batch of pair ordinals -> length filter -> q-gram multiset
    COUNT filter (Ukkonen: ed(a,b) <= k implies shared q-grams >=
    max(|a|,|b|) - q + 1 - k*q, a necessary condition so no true pair is
    ever dropped) -> banded DP verify."""

    def __init__(self, docs_ref, k: int, q: int):
        import ray

        ids, texts = ray.get(docs_ref)
        self.ids = ids
        self.k, self.q = k, q
        self.cp = [np.frombuffer(
            (t or "").encode("utf-32-le", "surrogatepass"),
            dtype=np.uint32) for t in texts]
        self.lens = np.array([len(c) for c in self.cp], dtype=np.int64)
        self.prof = [_qgram_profile(t or "", q) for t in texts]
        n = len(ids)
        # row starts of the upper-triangle pair ordinal space
        self.row_start = np.cumsum(
            np.concatenate([[0], (n - 1) - np.arange(n - 1)]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ords = batch.column("id").to_numpy(zero_copy_only=False)
        ia = np.searchsorted(self.row_start, ords, side="right") - 1
        ib = (ords - self.row_start[ia] + ia + 1).astype(np.int64)
        la, lb = self.lens[ia], self.lens[ib]
        cand = np.abs(la - lb) <= self.k
        out_a, out_b, out_d = [], [], []
        for ai, bi in zip(ia[cand], ib[cand]):
            da, ca = self.prof[ai]
            db, cb = self.prof[bi]
            need = max(self.lens[ai], self.lens[bi]) - self.q + 1 \
                - self.k * self.q
            if need > 0 and _multiset_intersect(da, ca, db, cb) < need:
                continue
            d = _banded_levenshtein(self.cp[ai], self.cp[bi], self.k)
            if d <= self.k:
                out_a.append(self.ids[ai])
                out_b.append(self.ids[bi])
                out_d.append(d)
        return pa.table({
            "id_a": pa.array(np.array(out_a, dtype=np.int64)),
            "id_b": pa.array(np.array(out_b, dtype=np.int64)),
            "edit_distance": pa.array(np.array(out_d, dtype=np.int64))})


def edit_distance_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                        id_limit: int = 200, k: int = 10, q: int = 4,
                        concurrency=(1, 8)):
    """Exact edit-distance near-dup pairs over the deterministic
    ``id < id_limit`` oracle scope: every pair with unit-cost Levenshtein
    <= ``k``. Candidates prune through the LENGTH filter and the Ukkonen
    q-gram COUNT filter (both necessary conditions — zero false
    dismissals), survivors verify with an exact banded DP (O(k * n) per
    pair). The bounded subset broadcasts once and the O(n^2) ordinal grid
    streams as a range dataset (the exact_jaccard_pairs shape); the scale
    path for unbounded corpora is length-bucket + q-gram blocking feeding
    the same verify actor. Emits (id_a, id_b, edit_distance)."""
    import ray
    import ray.data as rd

    sub = (ds.select_columns([id_col, text_col])
           .filter(expr=f"{id_col} < {id_limit}")
           .to_pandas())
    sub = sub[sub[text_col].notna()].sort_values(id_col) \
        .reset_index(drop=True)
    n = len(sub)
    if n < 2:
        return rd.from_arrow(pa.table({
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "edit_distance": pa.array([], type=pa.int64())}))
    ref = ray.put((sub[id_col].to_numpy(np.int64), list(sub[text_col])))
    return rd.range(n * (n - 1) // 2).map_batches(
        _EditDistancePairs,
        fn_constructor_kwargs=dict(docs_ref=ref, k=k, q=q),
        batch_format="pyarrow", batch_size=8192, concurrency=concurrency)


class _ExactContainmentPairs:
    """Actor stage over a pair-index range: decodes upper-triangle linear
    indices to (i, j) and emits BOTH directed containments
    C(src->dst) = |S_src ∩ S_dst| / |S_src| that clear the threshold —
    the asymmetric near-dup metric that catches quotes/subsets symmetric
    Jaccard dilutes (a short doc fully contained in a long one scores
    low Jaccard but containment 1). Integer floor-ppm, matching SQL
    (1000000 * ni) // n_src bit for bit; codepoint k-grams so the DuckDB
    substr() oracle mirrors exactly (same unit as _ExactJaccardPairs)."""

    def __init__(self, docs_ref, k: int, threshold_ppm: int):
        import ray

        ids, texts = ray.get(docs_ref) \
            if not isinstance(docs_ref, tuple) else docs_ref
        self.ids = np.asarray(ids, dtype=np.int64)
        self.sets = [frozenset(t[i:i + k] for i in range(len(t) - k + 1))
                     for t in texts]
        self.n = len(ids)
        self.threshold_ppm = int(threshold_ppm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lin = batch.column("id").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = self.n
        i = np.floor((2 * n - 1 - np.sqrt((2 * n - 1) ** 2 - 8 * lin))
                     / 2).astype(np.int64)
        j = (lin.astype(np.int64) - i * (2 * n - i - 1) // 2 + i + 1)
        src, dst, ni_o, ns_o, cp_o = [], [], [], [], []
        for a, b in zip(i, j):
            sa, sb = self.sets[a], self.sets[b]
            inter = len(sa & sb)
            if not inter:
                continue
            for (x, y, s_sz) in ((a, b, len(sa)), (b, a, len(sb))):
                ppm = (1_000_000 * inter) // s_sz
                if ppm >= self.threshold_ppm:
                    src.append(self.ids[x])
                    dst.append(self.ids[y])
                    ni_o.append(inter)
                    ns_o.append(s_sz)
                    cp_o.append(ppm)
        return pa.table({
            "id_src": pa.array(np.asarray(src, dtype=np.int64)),
            "id_dst": pa.array(np.asarray(dst, dtype=np.int64)),
            "n_inter": pa.array(np.asarray(ni_o, dtype=np.int64)),
            "n_src": pa.array(np.asarray(ns_o, dtype=np.int64)),
            "cont_ppm": pa.array(np.asarray(cp_o, dtype=np.int64))})


def containment_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                      id_limit: int = 300, k: int = 5,
                      threshold_ppm: int = 800_000,
                      concurrency=(1, 8)):
    """Exact all-pairs k-gram CONTAINMENT join over the deterministic doc
    subset ``id < id_limit`` (the bounded oracle scope shared with
    exact_jaccard_pairs; the scale path for full corpora is the same
    PPJoin prefix-filter machinery with the containment-specific length
    bound |A| * t <= |B| — documented, not duplicated here). The subset
    broadcasts once; the O(n^2) grid streams as a range dataset."""
    import ray
    import ray.data as rd

    sub = (ds.select_columns([id_col, text_col])
           .filter(expr=f"{id_col} < {id_limit}")
           .to_pandas())
    sub = sub[sub[text_col].notna() & (sub[text_col].str.len() >= k)]
    sub = sub.sort_values(id_col).reset_index(drop=True)
    n = len(sub)
    empty = pa.table({"id_src": pa.array([], type=pa.int64()),
                      "id_dst": pa.array([], type=pa.int64()),
                      "n_inter": pa.array([], type=pa.int64()),
                      "n_src": pa.array([], type=pa.int64()),
                      "cont_ppm": pa.array([], type=pa.int64())})
    if n < 2:
        return rd.from_arrow(empty)
    ref = ray.put((sub[id_col].to_numpy(), list(sub[text_col])))
    n_pairs = n * (n - 1) // 2
    return rd.range(n_pairs).map_batches(
        _ExactContainmentPairs,
        fn_constructor_kwargs=dict(docs_ref=ref, k=k,
                                   threshold_ppm=threshold_ppm),
        batch_format="pyarrow", batch_size=8192, concurrency=concurrency)
