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
