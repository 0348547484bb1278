"""Skew handling: salted split for hot keys before a shuffle.

SURVEY.md §4: the corpus has a hot repo (~20% of rows). A bare
``groupby("repo")`` would put a fifth of the dataset in one reduce task.
``SaltedKey`` derives an INTEGER salt column (``hash(salt_col) % k`` for keys
in a small broadcast hot set, 0 otherwise); aggregations group by
``[key, salt]`` so the hot group splits into k sub-groups, and the tiny
per-(key, salt) partials are re-merged by key afterwards — a two-stage
aggregation whose second stage is O(#keys * k). Grouping on (key, int salt)
instead of a mangled string key keeps keys of any length/content safe.

Hot keys are discovered cheaply from a per-batch partial count (no shuffle of
row data): ``hot_keys(ds, col, threshold)``.
"""

from __future__ import annotations

from typing import Dict, Sequence, Set

import numpy as np
import pandas as pd
import pyarrow as pa

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
    """map_batches stage: append an integer salt column (``hash(salt_col) % k``
    for hot keys, 0 otherwise). Group by ``[key, out]`` downstream."""

    def __init__(self, hot: Set[str], col: str, salt_col: str, k: int = 16,
                 out: str = "_salt"):
        self.hot = set(hot)
        self.col = col
        self.salt_col = salt_col
        self.k = k
        self.out = out

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        keys_np = keys.to_numpy(zero_copy_only=False).astype(object)
        salt_src = batch.column(self.salt_col)
        if isinstance(salt_src, pa.ChunkedArray):
            salt_src = salt_src.combine_chunks()
        salts = (hash64(salt_src.to_numpy(zero_copy_only=False))
                 % np.uint64(self.k)).astype(np.int64)
        is_hot = np.asarray([key in self.hot for key in keys_np], dtype=bool)
        salts = np.where(is_hot, salts, 0)
        return batch.append_column(self.out, pa.array(salts, type=pa.int64()))


def salted_groupby_sum(ds, key_col: str, salt_col: str, value_cols: Sequence[str],
                       hot: Set[str], k: int = 16) -> pd.DataFrame:
    """groupby(key).sum(values) with hot keys salted into k sub-groups: the
    shuffle is on (key, salt) so no reduce group exceeds ~1/k of a hot key;
    the per-(key, salt) partials are tiny and re-merge by key on the driver."""
    from ray.data.aggregate import Sum

    salted = ds.map_batches(SaltedKey, fn_constructor_args=(hot, key_col, salt_col, k),
                            batch_format="pyarrow", concurrency=(1, 8))
    aggs = [Sum(c, alias_name=c) for c in value_cols]
    part = salted.groupby([key_col, "_salt"]).aggregate(*aggs).to_pandas()
    return part.groupby(key_col, as_index=False)[list(value_cols)].sum()
