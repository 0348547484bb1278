"""Sequence packing over a distributed global prefix sum.

The concat-then-cut packing discipline of GPT-style pretraining (public
method): all documents are laid out in a deterministic global order
(doc_id), their token streams concatenated, and fixed-length training
sequences cut at ``seq_len`` boundaries. Each document's placement is fully
determined by the EXCLUSIVE global running sum of token counts — so packing
reduces to a distributed prefix sum:

1. token counts per doc (the engine's SQL-mirrored whitespace formula) and a
   shard key ``doc_id // shard_size``;
2. per-batch PARTIAL shard sums -> one tiny groupby-sum shuffle -> the
   driver computes the exclusive prefix over the (metadata-sized, one row
   per ``shard_size`` docs) shard-sum table and broadcasts it via ray.put;
3. one ``sorted_group_scan`` keyed by shard (ordered by doc_id within the
   group) adds the within-shard exclusive cumsum to the broadcast shard
   base — a single vectorized kernel per block.

At 100 TB the shard-sum table is corpus_rows / shard_size rows; raise
``shard_size`` (or add a second hierarchy level of the same two steps) to
keep it driver-sized — the stages are unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_SHARD = 4096


def token_counts_with_shard(batch: pa.Table, id_col: str, text_col: str,
                            shard_size: int) -> pa.Table:
    """(doc_id, tok, shard) per non-null-text row; tok is the engine's one
    SQL-mirrored whitespace formula (text.token_count_batch — single source
    of truth for the count(' ')+1 / empty->0 oracle contract)."""
    from rayschema.text import token_count_batch

    batch = batch.filter(pc.is_valid(batch.column(text_col)))
    n = (token_count_batch(batch, text_col=text_col, out="tok")
         .column("tok"))
    ids = batch.column(id_col).cast(pa.int64())
    shard = pc.divide(pc.subtract(ids, pc.if_else(
        pc.less(ids, 0), shard_size - 1, 0)), shard_size)
    # doc ids are non-negative in every corpus here; the if_else keeps the
    # floor-division semantics honest should a negative id ever appear
    return pa.table({"doc_id": ids, "tok": n, "shard": shard})


def pack_sequences(ds, seq_len: int = 512, id_col: str = "doc_id",
                   text_col: str = "text", shard_size: int = DEFAULT_SHARD):
    """Assign every document its packed position: returns a Dataset of
    (doc_id, tok, seq_id, offset_in_seq) where seq_id = global_offset //
    seq_len and offset_in_seq = global_offset % seq_len, global_offset
    being the exclusive running token sum in doc_id order."""
    import ray

    from rayschema.dedup import sorted_group_scan

    # materialized: consumed twice (the shard-sum pull below AND the
    # sorted_group_scan's sort) — without this the read+count re-executes
    toks = ds.map_batches(
        lambda b: token_counts_with_shard(b, id_col, text_col, shard_size),
        batch_format="pyarrow").materialize()

    # -- stage 1: shard sums (partial per batch, then a tiny groupby-sum)
    def partial(b: pa.Table) -> pa.Table:
        sh = b.column("shard").to_numpy(zero_copy_only=False)
        tk = b.column("tok").to_numpy(zero_copy_only=False)
        u, inv = np.unique(sh, return_inverse=True)
        sums = np.zeros(len(u), dtype=np.int64)
        np.add.at(sums, inv, tk)
        return pa.table({"shard": pa.array(u, type=pa.int64()),
                         "s": pa.array(sums)})

    shard_sums = (toks.map_batches(partial, batch_format="pyarrow")
                  .groupby("shard").sum("s").to_pandas())
    shard_sums = shard_sums.sort_values("shard")
    shard_ids = shard_sums["shard"].to_numpy(np.int64)
    totals = shard_sums["sum(s)"].to_numpy(np.int64)
    bases = np.concatenate([[0], np.cumsum(totals)[:-1]])
    base_ref = ray.put((shard_ids, bases))

    # -- stage 2: within-shard exclusive cumsum + broadcast shard base
    out_schema = pa.schema([("doc_id", pa.int64()), ("tok", pa.int64()),
                            ("seq_id", pa.int64()),
                            ("offset_in_seq", pa.int64())])

    def _emit(ids, tk, off):
        return pa.table({
            "doc_id": pa.array(ids), "tok": pa.array(tk),
            "seq_id": pa.array(off // seq_len),
            "offset_in_seq": pa.array(off % seq_len)})

    def block_fn(b: pa.Table, starts, ends, want):
        lookup_ids, lookup_bases = ray.get(base_ref)
        if not want.any():
            return None
        tk = b.column("tok").to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        sh = b.column("shard").to_numpy(zero_copy_only=False)
        excl = np.cumsum(tk) - tk
        s, e = starts[want], ends[want]
        grp = np.repeat(np.arange(len(s)), e - s)
        pos = np.concatenate([np.arange(a, z) for a, z in zip(s, e)]) \
            if len(s) else np.empty(0, np.int64)
        within = excl[pos] - excl[s][grp]
        base = lookup_bases[np.searchsorted(lookup_ids, sh[s])][grp]
        return _emit(ids[pos], tk[pos], base + within)

    def group_fn(g: pa.Table):
        lookup_ids, lookup_bases = ray.get(base_ref)
        tk = g.column("tok").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        sh = int(g.column("shard")[0].as_py())
        off = (np.cumsum(tk) - tk
               + lookup_bases[np.searchsorted(lookup_ids, sh)])
        return _emit(ids, tk, off)

    return sorted_group_scan(toks, ["shard"], group_fn, out_schema,
                             block_fn=block_fn, order_cols=["doc_id"])
