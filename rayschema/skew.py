"""Skew handling: salted split for hot keys before a shuffle.

SURVEY.md §4: the corpus has a hot repo (~20% of rows). A bare
``groupby("repo")`` would put a fifth of the dataset in one reduce task.
``salted_key`` derives ``key_salted = key + '#' + (hash(salt_col) % k)`` for
keys in a (small, broadcast) hot set, so the hot group splits into k
sub-groups; ``unsalt`` merges the k partial aggregates afterwards — a
two-stage aggregation whose second stage is O(#hot_keys * k).

Hot keys are discovered cheaply from a per-batch partial count (no shuffle of
row data): ``hot_keys(ds, col, threshold)``.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Set

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rayschema.sketches import hash64


def hot_keys(ds, col: str, frac_threshold: float = 0.01, top: int = 64) -> Dict[str, int]:
    """Approximate per-key row counts via per-batch partial value_counts ->
    tiny groupby; returns {key: count} for keys above frac_threshold of rows."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        arr = b.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vc = arr.drop_null().value_counts()
        return pa.table({col: vc.field("values"), "n": vc.field("counts")})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(col).aggregate(Sum("n", alias_name="n")))
    df = counts.sort("n", descending=True).limit(top).to_pandas()
    total = int(df["n"].sum())  # lower bound on total; fine for thresholding
    full_total = None
    try:
        full_total = ds.count()
    except Exception:
        pass
    denom = full_total or total or 1
    return {str(r[col]): int(r["n"]) for _, r in df.iterrows()
            if r["n"] >= frac_threshold * denom}


class SaltedKey:
    """map_batches stage: append a salted key column for hot keys."""

    def __init__(self, hot: Set[str], col: str, salt_col: str, k: int = 16,
                 out: str = None):
        self.hot = set(hot)
        self.col = col
        self.salt_col = salt_col
        self.k = k
        self.out = out or f"{col}_salted"

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        keys_np = keys.to_numpy(zero_copy_only=False).astype(object)
        salt_src = batch.column(self.salt_col)
        if isinstance(salt_src, pa.ChunkedArray):
            salt_src = salt_src.combine_chunks()
        salts = (hash64(salt_src.to_numpy(zero_copy_only=False)) % np.uint64(self.k)).astype(np.int64)
        is_hot = np.asarray([k in self.hot for k in keys_np], dtype=bool)
        salted = np.where(
            is_hot,
            np.char.add(np.char.add(keys_np.astype("U120"), "#"), salts.astype("U3")),
            keys_np.astype("U124"))
        return batch.append_column(self.out, pa.array(salted.astype(object), type=pa.string()))


def unsalt(df: pd.DataFrame, salted_col: str, out_col: str) -> pd.DataFrame:
    """Strip the '#<salt>' suffix so the k partial aggregates can be re-merged."""
    df[out_col] = df[salted_col].str.replace(r"#\d+$", "", regex=True)
    return df


def salted_groupby_sum(ds, key_col: str, salt_col: str, value_cols: Sequence[str],
                       hot: Set[str], k: int = 16):
    """groupby(key).sum(values) with hot keys salted into k sub-groups and
    re-merged: stage 1 shuffles on the salted key, stage 2 is a driver-light
    pandas merge of only the hot rows."""
    from ray.data.aggregate import Sum

    salted = ds.map_batches(SaltedKey, fn_constructor_args=(hot, key_col, salt_col, k),
                            batch_format="pyarrow", concurrency=(1, 8))
    aggs = [Sum(c, alias_name=c) for c in value_cols]
    part = salted.groupby(f"{key_col}_salted").aggregate(*aggs).to_pandas()
    part = unsalt(part, f"{key_col}_salted", key_col)
    return part.groupby(key_col, as_index=False)[list(value_cols)].sum()
