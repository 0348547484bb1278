"""Uniqueness / exact-dedup and referential-integrity checks.

North-rule engine checks (SURVEY.md §2.E, §7.3):

* Uniqueness on a composite key, e.g. ``(repo, path, commit)``: vectorized
  64-bit key hash added per batch, then a hash-partitioned
  ``groupby(key_hash)`` — only the key columns move through the shuffle, never
  the payload. Duplicate groups emit violation rows.
* Referential check (``lang`` -> registry): BROADCAST semi/anti join — the
  registry is tiny, shipped once via ``ray.put`` and read per actor, evaluated
  with ``pc.is_in`` inside ``map_batches``; no shuffle at all
  (the engine analog of the reference's $ref->definition lookup,
  /root/reference/context.go:331-339 — a compile-time dictionary, not a join).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rayschema.sketches import hash64


def key_hash(batch: pa.Table, cols: Sequence[str]) -> np.ndarray:
    """Vectorized composite-key hash (uint64): combine per-column hashes."""
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for i, c in enumerate(cols):
        arr = batch.column(c)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vals = arr.to_numpy(zero_copy_only=False)
        hc = hash64(vals)
        h = (h * np.uint64(1_000_000_007)) ^ (hc + np.uint64(0x9E3779B97F4A7C15 + i))
    return h


def add_key_hash(batch: pa.Table, cols: Sequence[str], out: str = "uk") -> pa.Table:
    return batch.append_column(out, pa.array(key_hash(batch, cols), type=pa.uint64()))


def find_duplicates(ds, cols: Sequence[str], keep_cols: Optional[Sequence[str]] = None):
    """Rows whose composite key occurs more than once (all occurrences beyond
    the first, in arbitrary order — duplicates are violation rows).

    groupby on the 64-bit key hash: near-unique keys -> no skew; only
    ``keep_cols`` travel through the shuffle."""
    cols = list(cols)
    keep = list(keep_cols) if keep_cols is not None else cols
    keep = list(dict.fromkeys(keep + cols))  # key cols needed for exact verify

    def emit_dupes(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) <= 1:
            return g.iloc[0:0]
        # exact string-key verification within the hash group: a 64-bit
        # collision between distinct keys must not produce a false duplicate
        return g[g.duplicated(subset=cols, keep="first")]

    return (ds.map_batches(lambda b: add_key_hash(b, cols).select(keep + ["uk"]),
                           batch_format="pyarrow")
              .groupby("uk")
              .map_groups(emit_dupes, batch_format="pandas")
              .drop_columns(["uk"]))


def duplicate_key_counts(ds, cols: Sequence[str]):
    """(key cols..., n) for keys with n > 1 — partial-aggregated: per-batch
    combine first, then the groupby shuffle moves only (key, partial_count)."""
    cols = list(cols)

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(cols).to_pandas()
        g = df.groupby(cols, sort=False, dropna=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(cols).aggregate(Sum("n", alias_name="n")))
    return out.filter(expr="n > 1")


def duplicate_key_counts_hashed(ds, cols: Sequence[str], uk_col: str = "uk"):
    """Scale path for duplicate detection when a 64-bit key hash column is
    already present (stage 1 stamps it for free):

    1. per-batch value_counts of the HASH only -> (uk, n) partials
    2. groupby(uk).sum — the shuffle moves 16 bytes/row, not key strings
    3. broadcast the (tiny) duplicate-hash set, filter matching rows, and do
       the EXACT string-key groupby on just those rows (also resolves any
       64-bit hash collision).

    Returns (cols..., n) with n > 1 — same shape as duplicate_key_counts."""
    import ray
    from ray.data.aggregate import Sum

    cols = list(cols)

    def partial(b: pa.Table) -> pa.Table:
        arr = b.column(uk_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_unsigned_integer(arr.type):
            arr = pa.Array.from_buffers(pa.int64(), len(arr),
                                        arr.buffers())  # bit-identical view
        vc = arr.value_counts()
        return pa.table({uk_col: vc.field("values"), "n": vc.field("counts")})

    counts = (ds.select_columns([uk_col])
                .map_batches(partial, batch_format="pyarrow")
                .groupby(uk_col).aggregate(Sum("n", alias_name="n"))
                .filter(expr="n > 1"))
    counts_df = counts.to_pandas()
    dup_uks = counts_df[uk_col].to_numpy() if uk_col in counts_df.columns \
        else np.empty(0, dtype=np.int64)
    if len(dup_uks) == 0:
        import pandas as _pd

        return _pd.DataFrame({**{c: [] for c in cols}, "n": []})
    if dup_uks.dtype == np.uint64:
        dup_uks = dup_uks.view(np.int64)
    ref = ray.put(np.sort(dup_uks))

    def pick(b: pa.Table) -> pa.Table:
        uks = b.column(uk_col).to_numpy(zero_copy_only=False)
        if uks.dtype == np.uint64:
            uks = uks.view(np.int64)
        dset = ray.get(ref)
        sel = np.searchsorted(dset, uks)
        sel = (sel < len(dset)) & (dset[np.minimum(sel, len(dset) - 1)] == uks)
        keep = b.select(cols).filter(pa.array(sel))
        return keep.append_column(uk_col, pa.array(uks[sel], type=pa.int64()))

    return _exact_counts_by_hash_group(
        ds.map_batches(pick, batch_format="pyarrow"), cols, uk_col)


def _exact_counts_by_hash_group(picked, cols: Sequence[str], uk_col: str):
    """DISTRIBUTED exact verification of duplicate candidates: the
    candidate-filtered rows are grouped by their 64-bit key hash (narrow —
    only candidate rows shuffle), each group does the exact string-key count
    (which also resolves any hash collision), and only the final
    (key cols..., n>1) result rows reach the driver — never the candidate
    rows themselves."""
    cols = list(cols)

    def count_group(g: pd.DataFrame) -> pd.DataFrame:
        cnt = (g.groupby(cols, as_index=False, dropna=False)
               .size().rename(columns={"size": "n"}))
        return cnt[cnt["n"] > 1]

    out = (picked.groupby(uk_col)
           .map_groups(count_group, batch_format="pandas")
           .to_pandas())
    if not len(out):
        return pd.DataFrame({**{c: [] for c in cols}, "n": []})
    return out[cols + ["n"]].reset_index(drop=True)


def duplicate_key_counts_sorted(ds, cols: Sequence[str], uk_col: str = "uk"):
    """Fastest scale path: global sort of ONLY the 8-byte key-hash column,
    then a vectorized adjacent-equal scan per sorted block. Block-boundary
    duplicates are caught by also collecting each block's first/last value
    (a boundary dup appears >= twice in that multiset); all candidates get an
    exact string-key verification, which also resolves hash collisions.

    A sort of the hash column moves 8 bytes/row — the theoretical minimum for
    a global uniqueness check — and avoids the per-group aggregate machinery
    (measured ~4x faster than groupby(uk).sum at 2M rows)."""
    import ray

    cols = list(cols)
    srt = ds.select_columns([uk_col]).sort(uk_col)

    def block_cands(b: pa.Table) -> pa.Table:
        u = b.column(uk_col)
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        un = u.to_numpy(zero_copy_only=False)
        if un.dtype == np.uint64:
            un = un.view(np.int64)   # bit-identical, arrow-int64-safe
        if len(un) == 0:
            return pa.table({"v": pa.array([], type=pa.int64()),
                             "kind": pa.array([], type=pa.int8())})
        dups = np.unique(un[1:][un[1:] == un[:-1]])
        vals = np.concatenate([dups, [un[0], un[-1]]])
        kind = np.concatenate([np.zeros(len(dups), dtype=np.int8),
                               np.array([1, 1], dtype=np.int8)])
        return pa.table({"v": pa.array(vals, type=pa.int64()),
                         "kind": pa.array(kind)})

    cand_df = srt.map_batches(block_cands, batch_format="pyarrow").to_pandas()
    in_block = cand_df.loc[cand_df["kind"] == 0, "v"].to_numpy()
    bounds = cand_df.loc[cand_df["kind"] == 1, "v"].to_numpy()
    bv, bc = np.unique(bounds, return_counts=True)
    cand = np.unique(np.concatenate([in_block, bv[bc >= 2]]))
    import pandas as _pd

    if len(cand) == 0:
        return _pd.DataFrame({**{c: [] for c in cols}, "n": []})
    ref = ray.put(cand)

    def pick(b: pa.Table) -> pa.Table:
        uks = b.column(uk_col).to_numpy(zero_copy_only=False)
        if uks.dtype == np.uint64:
            uks = uks.view(np.int64)
        dset = ray.get(ref)
        pos = np.searchsorted(dset, uks)
        sel = (pos < len(dset)) & (dset[np.minimum(pos, len(dset) - 1)] == uks)
        keep = b.select(cols).filter(pa.array(sel))
        return keep.append_column(uk_col, pa.array(uks[sel], type=pa.int64()))

    return _exact_counts_by_hash_group(
        ds.map_batches(pick, batch_format="pyarrow"), cols, uk_col)


UNIQUE_DRIVER_MERGE_CAP = 50_000_000    # rows; ~400 MB distinct-uk merge


def duplicate_key_counts_adaptive(ds, cols: Sequence[str],
                                  uk_col: str = "uk",
                                  n_rows: Optional[int] = None):
    """ADAPTIVE uniqueness check: under ``UNIQUE_DRIVER_MERGE_CAP`` rows
    the candidate hashes come from ONE stateless pass (per-batch distinct
    uks + within-batch dup flags merged by a driver np.unique — no
    all-to-all at all; measured ~3x the sorted path's stage-2 wall at 2M
    rows); past the cap the 8-byte global sort takes over
    (duplicate_key_counts_sorted — the provably-minimal-traffic 100-TB
    path, since a driver distinct-merge is row-bounded state). Both paths
    share the exact string-key verification tail, so output is identical
    (equality-tested)."""
    import ray

    cols = list(cols)
    if n_rows is None:
        n_rows = ds.count()
    if n_rows > UNIQUE_DRIVER_MERGE_CAP:
        return duplicate_key_counts_sorted(ds, cols, uk_col=uk_col)

    def partial(b: pa.Table) -> pa.Table:
        uks = b.column(uk_col).to_numpy(zero_copy_only=False)
        if uks.dtype == np.uint64:
            uks = uks.view(np.int64)
        u, c = np.unique(uks, return_counts=True)
        return pa.table({"v": pa.array(u, type=pa.int64()),
                         "d": pa.array((c >= 2).astype(np.int8))})

    part = ds.select_columns([uk_col]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(part):
        import pandas as _pd

        return _pd.DataFrame({**{c: [] for c in cols}, "n": []})
    v = part["v"].to_numpy(np.int64)
    u2, c2 = np.unique(v, return_counts=True)
    cand = np.unique(np.concatenate(
        [u2[c2 >= 2], part.loc[part["d"] == 1, "v"].to_numpy(np.int64)]))
    import pandas as _pd

    if len(cand) == 0:
        return _pd.DataFrame({**{c: [] for c in cols}, "n": []})
    ref = ray.put(cand)

    def pick(b: pa.Table) -> pa.Table:
        uks = b.column(uk_col).to_numpy(zero_copy_only=False)
        if uks.dtype == np.uint64:
            uks = uks.view(np.int64)
        dset = ray.get(ref)
        pos = np.searchsorted(dset, uks)
        sel = (pos < len(dset)) & (dset[np.minimum(pos, len(dset) - 1)]
                                   == uks)
        keep = b.select(cols).filter(pa.array(sel))
        return keep.append_column(uk_col,
                                  pa.array(uks[sel], type=pa.int64()))

    return _exact_counts_by_hash_group(
        ds.map_batches(pick, batch_format="pyarrow"), cols, uk_col)


def distinct_rows(ds, cols: Sequence[str]):
    """Exact dedup: first row per composite key (hash-partitioned)."""
    cols = list(cols)
    return (ds.map_batches(lambda b: add_key_hash(b, cols), batch_format="pyarrow")
              .groupby("uk")
              .map_groups(lambda g: g.iloc[:1], batch_format="pandas")
              .drop_columns(["uk"]))


# --------------------------------------------------------------------------- broadcast joins
class BroadcastMembership:
    """Actor-pool stage: semi/anti join against a broadcast key set.

    The set is put in the object store ONCE (ray.put on the driver); each actor
    resolves it in __init__ (zero-copy read), and per batch it's one pc.is_in.
    """

    def __init__(self, ref, column: str, mode: str = "semi", flag: Optional[str] = None):
        import ray

        values = ray.get(ref) if not isinstance(ref, (list, set, tuple)) else ref
        self.value_set = pa.array(sorted(set(values)))
        self.column = column
        self.mode = mode
        self.flag = flag

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        member = pc.is_in(col, value_set=self.value_set)
        member = pc.fill_null(member, False)
        if self.flag is not None:
            return batch.append_column(self.flag, member)
        keep = member if self.mode == "semi" else pc.invert(member)
        return batch.filter(keep)


def referential_violations(ds, column: str, allowed_ref, keep_cols: Optional[Sequence[str]] = None):
    """Anti-join: rows whose ``column`` value is not in the broadcast registry
    (violation keyword ``referential``, FIXTURES.md F2)."""
    out = ds.map_batches(BroadcastMembership, fn_constructor_args=(allowed_ref, column, "anti"),
                         batch_format="pyarrow", concurrency=(1, 8))
    if keep_cols:
        out = out.select_columns(list(keep_cols))
    return out
