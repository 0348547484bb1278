"""Custom join operators Ray Data lacks natively.

``asof_join``: for every LEFT row, attach the payload of the LAST RIGHT row
with the same key whose timestamp is <= the left row's timestamp (backward
as-of; ties on timestamp broken by the largest ``tie`` value). The classic
point-in-time lookup of feature/state tables for event streams.

Ray-Data-first shape (no native asof in Dataset): both sides are tagged and
UNIONED into one narrow stream, then ONE sorted_group_scan co-locates each
key's rows time-ordered (sort by key + (t, kind, tie); kind places right
rows before left rows at equal timestamps, making the bound inclusive). The
block kernel is fully vectorized: a running maximum over right-row positions
(np.maximum.accumulate) gives every left row its latest preceding right row
in O(n); payload columns come out in one Arrow take, so they can be any
type. Partitioning assumption: one KEY's rows fit one group (same as
sessionization); a pathological hot key should be range-chunked first.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import pyarrow as pa

from rayschema.dedup import sorted_group_scan


def _asof_kernel(tbl: pa.Table, starts: np.ndarray, ends: np.ndarray,
                 want: np.ndarray, left_cols: Sequence[str],
                 right_cols: Sequence[str]) -> Optional[pa.Table]:
    """Vectorized as-of match over one sorted block: rows are ordered by
    (key, t, kind, tie) with kind 0 = right, 1 = left."""
    kind = tbl.column("_kind_asof").to_numpy(zero_copy_only=False)
    n = len(kind)
    pos = np.arange(n, dtype=np.int64)
    sizes = ends - starts
    seg = np.repeat(starts, sizes)              # group start of every row
    grp_want = np.repeat(want, sizes)
    o_pos = np.where(kind == 0, pos, -1)
    last = np.maximum.accumulate(o_pos)         # latest right row so far
    li = np.flatnonzero((kind == 1) & grp_want)
    if not len(li):
        return None
    match = last[li]
    ok = match >= seg[li]                       # right row is in SAME group
    cols = {}
    for c in left_cols:
        cols[c] = tbl.column(c).take(pa.array(li))
    midx = pa.array([int(m) if o else None for m, o in zip(match, ok)],
                    type=pa.int64())
    for c in right_cols:
        cols[c] = tbl.column(c).take(midx)      # null index -> null payload
    return pa.table(cols)


def asof_join(left, right, key_col: str, left_ts_col: str, right_ts_col: str,
              left_keep: Dict[str, pa.DataType],
              right_keep: Dict[str, pa.DataType],
              tie_col: Optional[str] = None, sort_blocks: int = 32):
    """Backward as-of join (see module docstring). ``left_keep`` /
    ``right_keep`` map output column names to their Arrow types (the union
    stream needs both sides' columns present, null-filled on the other
    side). Timestamps must be int64-castable (e.g. epoch microseconds).
    Returns a Dataset with left_keep + right_keep columns; unmatched left
    rows keep null right columns (LEFT semantics)."""
    lk, rk = dict(left_keep), dict(right_keep)

    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "_k_asof": b.column(key_col).cast(pa.int64()),
            "_t_asof": b.column(left_ts_col).cast(pa.int64()),
            "_kind_asof": pa.array(np.ones(n, dtype=np.int8)),
            "_tie_asof": pa.array(np.zeros(n, dtype=np.int64)),
        }
        for c, t in lk.items():
            cols[c] = b.column(c).cast(t)
        for c, t in rk.items():
            cols[c] = pa.nulls(n, t)
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        tie = (b.column(tie_col).cast(pa.int64()) if tie_col
               else pa.array(np.zeros(n, dtype=np.int64)))
        cols = {
            "_k_asof": b.column(key_col).cast(pa.int64()),
            "_t_asof": b.column(right_ts_col).cast(pa.int64()),
            "_kind_asof": pa.array(np.zeros(n, dtype=np.int8)),
            "_tie_asof": tie,
        }
        for c, t in lk.items():
            cols[c] = pa.nulls(n, t)
        for c, t in rk.items():
            cols[c] = b.column(c).cast(t)
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    out_schema = pa.schema([(c, t) for c, t in {**lk, **rk}.items()])

    def block_fn(b, starts, ends, want):
        return _asof_kernel(b, starts, ends, want, list(lk), list(rk))

    def group_fn(t: pa.Table) -> Optional[pa.Table]:
        n = t.num_rows
        return _asof_kernel(t, np.array([0]), np.array([n]),
                            np.array([True]), list(lk), list(rk))

    def has_lefts(b: pa.Table, starts, ends) -> np.ndarray:
        is_left = (b.column("_kind_asof").to_numpy(zero_copy_only=False)
                   == 1).astype(np.int64)
        return np.add.reduceat(is_left, starts) > 0

    return sorted_group_scan(tagged, ["_k_asof"], group_fn, out_schema,
                             group_filter=has_lefts, block_fn=block_fn,
                             sort_blocks=sort_blocks,
                             order_cols=["_t_asof", "_kind_asof", "_tie_asof"])


def _range_kernel(tbl: pa.Table, starts: np.ndarray, ends: np.ndarray,
                  want: np.ndarray, left_cols: Sequence[str],
                  right_cols: Sequence[str]) -> Optional[pa.Table]:
    """Sweep-line over one sorted block: rows ordered by (key, t, kind, iid)
    with kind 0 = interval OPEN, 1 = left point, 2 = interval CLOSE. The
    active-interval dict resets per group; output is one row per
    (left point, open interval) pair."""
    kind = tbl.column("_kind_rj").to_numpy(zero_copy_only=False)
    iid = tbl.column("_iid_rj").to_numpy(zero_copy_only=False)
    out_l, out_r = [], []
    for gi in np.flatnonzero(want):
        active: dict = {}
        for pos in range(int(starts[gi]), int(ends[gi])):
            k = kind[pos]
            if k == 0:
                active[iid[pos]] = pos
            elif k == 2:
                active.pop(iid[pos], None)
            else:
                for rp in active.values():
                    out_l.append(pos)
                    out_r.append(rp)
    if not out_l:
        return None
    li = pa.array(np.asarray(out_l, dtype=np.int64))
    ri = pa.array(np.asarray(out_r, dtype=np.int64))
    cols = {}
    for c in left_cols:
        cols[c] = tbl.column(c).take(li)
    for c in right_cols:
        cols[c] = tbl.column(c).take(ri)
    return pa.table(cols)


def range_join(left, right, key_col: str, left_ts_col: str,
               right_start_col: str, right_end_col: str, right_id_col: str,
               left_keep: Dict[str, pa.DataType],
               right_keep: Dict[str, pa.DataType], sort_blocks: int = 32):
    """INTERVAL (range) join — the second custom join Ray Data lacks: emit
    one row per (left row, right interval) where the left timestamp falls in
    the right row's CLOSED interval [start, end], same key.

    Ray-Data-first shape: each right row explodes into an OPEN event at
    ``start`` and a CLOSE event at ``end``, unioned with the left points,
    then ONE key+time sort (sorted_group_scan order_cols) feeds a sweep-line
    kernel that maintains the per-key active-interval set — O(rows + output)
    instead of the O(lefts x rights-per-key) nested loop. Event order at
    equal timestamps (open < point < close) makes both bounds inclusive.
    ``right_id_col`` must identify right rows uniquely per key (it pairs
    each CLOSE with its OPEN). INNER semantics: lefts inside no interval
    emit nothing. Timestamps int64 (e.g. epoch microseconds)."""
    lk, rk = dict(left_keep), dict(right_keep)

    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "_k_rj": b.column(key_col).cast(pa.int64()),
            "_t_rj": b.column(left_ts_col).cast(pa.int64()),
            "_kind_rj": pa.array(np.ones(n, dtype=np.int8)),
            "_iid_rj": pa.array(np.zeros(n, dtype=np.int64)),
        }
        for c, t in lk.items():
            cols[c] = b.column(c).cast(t)
        for c, t in rk.items():
            cols[c] = pa.nulls(n, t)
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        k = b.column(key_col).cast(pa.int64())
        iid = b.column(right_id_col).cast(pa.int64())
        t0 = b.column(right_start_col).cast(pa.int64())
        t1 = b.column(right_end_col).cast(pa.int64())
        base = {c: b.column(c).cast(t) for c, t in rk.items()}
        opens = {"_k_rj": k, "_t_rj": t0,
                 "_kind_rj": pa.array(np.zeros(n, dtype=np.int8)),
                 "_iid_rj": iid}
        closes = {"_k_rj": k, "_t_rj": t1,
                  "_kind_rj": pa.array(np.full(n, 2, dtype=np.int8)),
                  "_iid_rj": iid}
        for c, t in lk.items():
            opens[c] = pa.nulls(n, t)
            closes[c] = pa.nulls(n, t)
        for c, t in rk.items():
            opens[c] = base[c]
            closes[c] = pa.nulls(n, t)     # payload rides the OPEN only
        return pa.concat_tables([pa.table(opens), pa.table(closes)])

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    out_schema = pa.schema([(c, t) for c, t in {**lk, **rk}.items()])

    def block_fn(b, starts, ends, want):
        return _range_kernel(b, starts, ends, want, list(lk), list(rk))

    def group_fn(t: pa.Table) -> Optional[pa.Table]:
        n = t.num_rows
        return _range_kernel(t, np.array([0]), np.array([n]),
                             np.array([True]), list(lk), list(rk))

    def has_lefts(b: pa.Table, starts, ends) -> np.ndarray:
        is_left = (b.column("_kind_rj").to_numpy(zero_copy_only=False)
                   == 1).astype(np.int64)
        return np.add.reduceat(is_left, starts) > 0

    return sorted_group_scan(tagged, ["_k_rj"], group_fn, out_schema,
                             group_filter=has_lefts, block_fn=block_fn,
                             sort_blocks=sort_blocks,
                             order_cols=["_t_rj", "_kind_rj", "_iid_rj"])
