"""Driver-contract query pipelines over the /root/testdata tables.

Each function takes ``sf_dir`` and returns a Dataset / DataFrame / Table;
``__ray_entry__.queries()`` maps names to these, and
``__ray_entry__.oracle_sql()`` holds the DuckDB mirror for the SQL-expressible
ones. Conventions that make the driver's value-hash comparison exact:

* Money sums use integer cents: ``sum(round(x*100)::bigint)`` on both sides —
  float summation order can never perturb the result.
* Top-k sorts always carry a deterministic tie-break key.
* Column names match the oracle SQL exactly (aliased on both sides).

Scale notes: aggregations pre-combine per batch before the groupby shuffle;
joins with a small side broadcast it; sorts are limited to top-k results.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rayschema.compile import compile_validator
from rayschema.serde import schema_from_json

DOCS_SCHEMA_JSON = """{
 "type": "object",
 "required": ["doc_id", "text", "lang", "source", "n_chars"],
 "properties": {
   "doc_id": {"type": "integer", "minimum": 0},
   "text":   {"type": "string", "minLength": 50},
   "lang":   {"type": "string", "enum": ["en", "de", "fr", "es", "zh"]},
   "source": {"type": "string", "pattern": "^src[0-9]+$"},
   "n_chars": {"type": "integer", "minimum": 0, "maximum": 100000}
 }
}"""

LANG_REGISTRY = ["en", "de", "fr", "es"]  # zh intentionally absent -> violations


def _read(sf_dir: str, table: str, columns: List[str] = None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# re-exported from unique.py so the two adaptive gates can never drift
from rayschema.unique import UNIQUE_DRIVER_MERGE_CAP as \
    TRIPLE_DRIVER_MERGE_CAP  # noqa: N811


def _table_rows(sf_dir: str, table: str):
    """_parquet_row_count (the shared footer-metadata counter), but
    returning None instead of raising when footers can't be read — the
    caller must treat None as UNKNOWN and take its scale path, never
    the driver-merge one."""
    try:
        return _parquet_row_count(sf_dir, table)
    except Exception:
        return None


def _cents(x) -> np.ndarray:
    return np.round(np.asarray(x, dtype=np.float64) * 100).astype(np.int64)

def _pandas_typed(ds, cols):
    """Dataset -> pandas with a GUARANTEED schema: an empty Ray Dataset
    materializes with no columns at all (aggregates/map_batches that
    emitted zero blocks), which breaks the driver's column compare on
    legitimately-empty results (e.g. the doc_id<300 near-dup scopes have
    zero pairs at sf0.1). cols = {name: dtype}."""
    df = ds.to_pandas()
    if len(df) == 0 and list(df.columns) != list(cols):
        return pd.DataFrame({c: pd.Series([], dtype=t)
                             for c, t in cols.items()})
    return df



# --------------------------------------------------------------------------- validation
class _DocsValidator:
    """Actor: compiled draft-07 validator for the documents table."""

    def __init__(self):
        self.v = compile_validator(schema_from_json(DOCS_SCHEMA_JSON))

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = self.v.probe(batch)   # mask only; no violation attribution cost
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
            "valid": pa.array(mask),
        })


def validate_documents_verdicts(sf_dir: str):
    """Per-lang pass/fail counts through the full constraint suite."""
    ds = _read(sf_dir, "documents")
    verdicts = ds.map_batches(_DocsValidator, batch_format="pyarrow",
                              concurrency=(1, 16))

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"lang": b.column("lang").to_pandas(),
                           "valid": b.column("valid").to_pandas()})
        g = df.groupby("lang", dropna=False).agg(
            n_rows=("valid", "size"), passed=("valid", "sum")).reset_index()
        # null lang rows must keep their group (oracle GROUP BY keeps a NULL
        # group) but Ray's sort-based groupby cannot order null keys — carry
        # them through the shuffle as a sentinel string, restored in finish()
        return pa.table({
            "lang": pa.array(["__null__" if pd.isna(x) else x for x in g["lang"]],
                             type=pa.string()),
            "n_rows": pa.array(g["n_rows"].astype("int64")),
            "passed": pa.array(g["passed"].astype("int64")),
        })

    # langs are a bounded dimension, so the per-block partials fold on the
    # driver (<= blocks x langs rows — the source_scorecard fold rationale);
    # no lang-keyed shuffle
    parts = verdicts.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("lang", as_index=False)[["n_rows", "passed"]].sum()
    rows = g["n_rows"].to_numpy(np.int64)
    passed = g["passed"].to_numpy(np.int64)
    return pd.DataFrame({
        "lang": [None if x == "__null__" else x for x in g["lang"]],
        "n_rows": rows,
        "passed": passed,
        "failed": rows - passed,
    })


class _DocsViolations:
    """Actor: flatten per-keyword violations to (doc_id, keyword) rows
    (leaf keywords only; the 'properties'/'required' wrapper rows of the
    flagship pipeline are aggregated differently here to stay SQL-mirrorable)."""

    LEAF = {"minimum", "maximum", "minLength", "enum", "pattern", "required"}

    def __init__(self):
        self.v = compile_validator(schema_from_json(DOCS_SCHEMA_JSON))

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, viols = self.v.validate(batch)
        ids_arr = batch.column("doc_id")
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        # arrow take preserves the int64 type and nulls (numpy would degrade
        # null-bearing batches to float64/NaN and split the output schema)
        out_ids, out_kw, out_col = [], [], []
        for v in viols:
            if v.keyword not in self.LEAF:
                continue
            idx = np.nonzero(v.fail_mask)[0]
            if not idx.size:
                continue
            column = v.path.split("/")[-1] if "/" in v.path else v.path
            out_ids.append(ids_arr.take(pa.array(idx)))
            out_kw.append(np.full(idx.size, v.keyword, dtype=object))
            out_col.append(np.full(idx.size, column, dtype=object))
        if not out_ids:
            return pa.table({"doc_id": pa.array([], type=ids_arr.type),
                             "keyword": pa.array([], type=pa.string()),
                             "column_name": pa.array([], type=pa.string())})
        return pa.table({
            "doc_id": pa.concat_arrays(out_ids),
            "keyword": pa.array(np.concatenate(out_kw), type=pa.string()),
            "column_name": pa.array(np.concatenate(out_col), type=pa.string()),
        })


def validate_documents_violations(sf_dir: str):
    """Violation rows (doc_id, keyword, column_name)."""
    return _read(sf_dir, "documents").map_batches(
        _DocsViolations, batch_format="pyarrow", concurrency=(1, 16))


def referential_docs_lang(sf_dir: str):
    """Anti-join vs the broadcast lang registry (zh not registered)."""
    import ray

    from rayschema.unique import referential_violations

    ref = ray.put(LANG_REGISTRY)
    return referential_violations(
        _read(sf_dir, "documents", columns=["doc_id", "lang"]),
        "lang", ref, keep_cols=["doc_id", "lang"])


# --------------------------------------------------------------------------- stats
def column_stats_lang(sf_dir: str):
    """Exact single-column profile of documents.lang."""
    from ray.data.aggregate import Count, Max, Min

    ds = _read(sf_dir, "documents", columns=["lang"])
    agg = ds.aggregate(Count("lang", alias_name="n", ignore_nulls=False),
                       Count("lang", alias_name="nn", ignore_nulls=True),
                       Min("lang", alias_name="min_v"),
                       Max("lang", alias_name="max_v"))
    distinct = ds.unique("lang")
    return pd.DataFrame([{
        "n": int(agg["n"]), "nulls": int(agg["n"] - agg["nn"]),
        "n_distinct": int(len(distinct)),
        "min_v": agg["min_v"], "max_v": agg["max_v"],
    }])


def column_stats_quantity(sf_dir: str):
    """Exact numeric profile of lineitem.l_quantity (sum in deci-units)."""
    from ray.data.aggregate import Count, Max, Min

    ds = _read(sf_dir, "lineitem", columns=["l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([len(q)], type=pa.int64()),
            "nulls": pa.array([int(np.isnan(q).sum())], type=pa.int64()),
            "min_v": pa.array([np.nanmin(q) if len(q) else None]),
            "max_v": pa.array([np.nanmax(q) if len(q) else None]),
            "sum_deci": pa.array(
                [int(np.round(q[~np.isnan(q)] * 10).astype(np.int64).sum())],
                type=pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .aggregate(Sum("n", alias_name="n"), Sum("nulls", alias_name="nulls"),
                        Min("min_v", alias_name="min_v"), Max("max_v", alias_name="max_v"),
                        Sum("sum_deci", alias_name="sum_deci")))
    return pd.DataFrame([agg])


def stats_documents_sketch(sf_dir: str):
    """Approximate profile via HLL + KLL sketches (rows-only check: sketch
    estimates are not SQL-reproducible)."""
    from rayschema.stats import dataset_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "source", "n_chars"])
    stats = dataset_stats(ds, ["doc_id", "text", "lang", "source", "n_chars"],
                          freq_columns=["lang"])
    rows = []
    for col, s in stats.items():
        rows.append({
            "column_name": col, "n": s["count"], "nulls": s["nulls"],
            "distinct_hll": s["distinct_hll"],
            "q50": (s["quantiles"] or {}).get("0.5"),
            "q90": (s["quantiles"] or {}).get("0.9"),
        })
    return pd.DataFrame(sorted(rows, key=lambda r: r["column_name"]))


# --------------------------------------------------------------------------- dedup / uniqueness
def duplicate_events(sf_dir: str):
    """(user_id, event_type, n) keys occurring more than once."""
    from rayschema.unique import duplicate_key_counts

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return duplicate_key_counts(ds, ["user_id", "event_type"])


def _dedup_partial(b: pa.Table) -> pa.Table:
    """Pre-shuffle projection of the exact-dedup pipeline: per-batch
    (text_hash, min_id, n) partials — 24 bytes/row into the shuffle, never
    the text (narrowness asserted by test_dedup_shuffle_is_narrow)."""
    from rayschema.sketches import hash64

    df = pd.DataFrame({"doc_id": b.column("doc_id").to_pandas(),
                       "text": b.column("text").to_pandas()})
    df["uk"] = hash64(df["text"].to_numpy()).view(np.int64)
    g = (df.groupby("uk", as_index=False)
           .agg(doc_id=("doc_id", "min"), n=("doc_id", "size")))
    return pa.Table.from_pandas(g, preserve_index=False)


def exact_dedup_documents(sf_dir: str):
    """Exact dedup on text: keep min doc_id per distinct text; returns kept
    ids (see _exact_dedup_core for the distributed design)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return _exact_dedup_core(ds, emit="kept",
                             n_rows=_table_rows(sf_dir, "documents"))


EXACT_DEDUP_INPROC_CAP = 20_000   # rows (or a footer UPPER BOUND on rows)
#                                   under which the dedup is one driver
#                                   GROUP BY text — the MINHASH_INPROC_CAP
#                                   discipline; the 24-byte-shuffle plan
#                                   below stays the path at scale


def _exact_dedup_core(ds, emit: str = "kept", n_rows=None):
    """Exact dedup on text over a (doc_id, text) Dataset.

    emit="kept"  -> the doc_ids that survive (min doc_id per distinct text);
    emit="losers" -> the doc_ids removed (every non-min member of a
    duplicate-text group) — the removal set a downstream broadcast
    anti-join consumes (removal-sized, i.e. proportional to the duplicate
    mass, never the corpus).

    ``n_rows`` (an upper bound is fine — callers pass the parquet footer
    count of the source table) gates the small-corpus in-process path:
    one pull, one pandas GROUP BY text, identical result by construction
    (equality-tested against the distributed plan).

    Scale path: the groupby shuffle moves ONLY (text_hash, min_id, n) —
    24 bytes/row, never the text. Hash groups with more than one row (same
    text seen in several batches, or a 64-bit collision between different
    texts) are exactly re-verified DISTRIBUTED: the dup-hash set is
    broadcast as a fixed-size hashed BITMAP (2 MB no matter how dup-heavy
    the corpus — no driver key set), matching rows are sort-grouped by hash,
    and each group picks min doc_id per distinct text inside the scan. The
    driver never materializes candidate texts (bounded block-boundary
    residuals aside). Result is identical to a full GROUP BY text."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from rayschema.dedup import _bitmap_member, sorted_group_scan
    from rayschema.sketches import hash64

    if n_rows is not None and n_rows <= EXACT_DEDUP_INPROC_CAP:
        df = ds.to_pandas()
        if emit == "kept":
            ids = (df.groupby("text", dropna=False, as_index=False)
                   ["doc_id"].min()["doc_id"].to_numpy())
        else:
            mins = df.groupby("text", dropna=False)["doc_id"] \
                .transform("min")
            ids = df.loc[df["doc_id"] != mins, "doc_id"].to_numpy()
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(ids.astype(np.int64))}))

    BM_BITS = 24
    agg = (ds.map_batches(_dedup_partial, batch_format="pyarrow")
             .groupby("uk")
             .aggregate(Min("doc_id", alias_name="doc_id"),
                        Sum("n", alias_name="n"))
             .materialize())
    singles = agg.filter(expr="n == 1").select_columns(["doc_id"])

    from rayschema.dedup import _bitmap_hash

    def bm_partial(b: pa.Table) -> pa.Table:
        uks = b.column("uk").to_numpy(zero_copy_only=False)
        m = np.zeros(1 << BM_BITS, dtype=bool)
        m[_bitmap_hash(uks, BM_BITS)] = True
        return pa.table({"chunk": pa.array([np.packbits(m).tobytes()],
                                           type=pa.large_binary())})

    acc = np.zeros((1 << BM_BITS) // 8, dtype=np.uint8)
    chunks = (agg.filter(expr="n > 1").select_columns(["uk"])
              .map_batches(bm_partial, batch_format="pyarrow").to_pandas())
    # an empty upstream produces zero batches -> a schema-less empty frame
    for chunk in (chunks["chunk"] if "chunk" in chunks.columns else ()):
        acc |= np.frombuffer(chunk, dtype=np.uint8)
    if not acc.any():
        if emit == "losers":
            return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
        return singles
    ref = ray.put(acc)

    def pick(b: pa.Table) -> pa.Table:
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        uks = hash64(txt.to_numpy(zero_copy_only=False)).view(np.int64)
        sel = _bitmap_member(uks, ray.get(ref), BM_BITS)
        return pa.table({"uk": pa.array(uks[sel]),
                         "doc_id": b.column("doc_id").filter(pa.array(sel)),
                         "text": txt.filter(pa.array(sel))})

    def _resolve(df: pd.DataFrame, keys) -> pa.Table:
        if emit == "kept":
            ids = (df.groupby(keys, dropna=False, as_index=False)["doc_id"]
                   .min()["doc_id"].to_numpy())
        else:
            mins = df.groupby(keys, dropna=False)["doc_id"].transform("min")
            ids = df.loc[df["doc_id"] != mins, "doc_id"].to_numpy()
        return pa.table({"doc_id": pa.array(ids, type=pa.int64())})

    def verify_group(t: pa.Table) -> pa.Table:
        # a 1-row group is a bitmap false positive: its hash group was
        # unique, so its doc_id is already in `singles` (and has no losers)
        if t.num_rows < 2:
            return None
        df = pd.DataFrame({"doc_id": t.column("doc_id").to_pandas(),
                           "text": t.column("text").to_pandas()})
        return _resolve(df, ["text"])

    def verify_block(b: pa.Table, starts, ends, want) -> pa.Table:
        # whole-block vectorized verify: ONE grouped min over (uk, text) for
        # every complete hash group with >= 2 rows (dup-heavy corpora put
        # most of the corpus here — per-group pandas would pay ms per group)
        grp = np.repeat(np.arange(len(starts)), ends - starts)
        sel = want[grp] & ((ends - starts) >= 2)[grp]
        if not sel.any():
            return None
        t = b.filter(pa.array(sel))
        df = pd.DataFrame({"uk": t.column("uk").to_pandas(),
                           "doc_id": t.column("doc_id").to_pandas(),
                           "text": t.column("text").to_pandas()})
        return _resolve(df, ["uk", "text"])

    verified = sorted_group_scan(
        ds.map_batches(pick, batch_format="pyarrow"),
        ["uk"], verify_group, pa.schema([("doc_id", pa.int64())]),
        group_filter=lambda b, s, e: (e - s) >= 2,
        block_fn=verify_block, sort_blocks=32)
    if emit == "losers":
        return verified
    return singles.union(verified)


def minhash_near_dup_documents(sf_dir: str):
    """MinHash-LSH candidate pairs + DISTRIBUTED exact-Jaccard verification
    (>= 0.5): candidate texts are joined to their pairs, never materialized
    on the driver (rayschema.dedup.minhash_near_dups)."""
    from rayschema.dedup import minhash_near_dups

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_near_dups(ds, num_perm=64, bands=16, threshold=0.5,
                             n_rows=_table_rows(sf_dir, "documents"))


def minhash_near_dup_exact(sf_dir: str):
    """Ground truth for the LSH family: exact all-pairs character-5-gram
    Jaccard (>= 0.5) over the deterministic doc_id < 300 subset — mirrored
    exactly by a DuckDB substr/self-join oracle."""
    from rayschema.dedup import exact_jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return _pandas_typed(
        exact_jaccard_pairs(ds, id_limit=300, k=5, threshold=0.5),
        {"id_a": "int64", "id_b": "int64", "jaccard": "float64"})


def near_dup_clusters_documents(sf_dir: str):
    """Full near-dup clustering: LSH candidates -> Jaccard verify ->
    connected components (doc_id, cluster_id); rows-only."""
    from rayschema.dedup import near_dup_clusters

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return near_dup_clusters(ds, jaccard_threshold=0.5,
                             n_rows=_table_rows(sf_dir, "documents"))


def near_dup_clusters_exact(sf_dir: str):
    """Clusters over the EXACT char-5-gram Jaccard pairs (doc_id < 300,
    >= 0.5) — connected components with min-id cluster labels, mirrored by a
    recursive min-label-propagation DuckDB oracle."""
    from rayschema.dedup import connected_components, exact_jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = exact_jaccard_pairs(ds, id_limit=300, k=5, threshold=0.5).to_pandas()
    if not len(pairs):
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "cluster_id": pd.Series([], dtype="int64")})
    cc = connected_components(pairs)
    return cc.astype({"doc_id": "int64", "cluster_id": "int64"})


def dedup_corpus_exact(sf_dir: str):
    """The user-facing dedup operator: the KEPT corpus after near-dup removal
    (one representative — the min id — per exact-Jaccard cluster) over the
    deterministic doc_id < 300 subset. Removal set is broadcast (tiny: only
    docs losing to a smaller cluster id); the corpus itself streams."""
    import ray

    from rayschema.dedup import connected_components, exact_jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = exact_jaccard_pairs(ds, id_limit=300, k=5, threshold=0.5).to_pandas()
    removed = np.array([], dtype=np.int64)
    if len(pairs):
        cc = connected_components(pairs)
        removed = cc.loc[cc["cluster_id"] < cc["doc_id"], "doc_id"] \
            .to_numpy().astype(np.int64)
    rref = ray.put(np.sort(removed))

    def keep(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        tl = pc.fill_null(pc.utf8_length(txt), 0).to_numpy(zero_copy_only=False)
        ok = (ids < 300) & (tl >= 5)
        rem = ray.get(rref)
        if len(rem):
            pos = np.searchsorted(rem, ids)
            hit = (pos < len(rem)) \
                & (rem[np.minimum(pos, len(rem) - 1)] == ids)
        else:          # no duplicates found (e.g. sf0.1 scope): keep all
            hit = np.zeros(len(ids), dtype=bool)
        return pa.table({"doc_id": pa.array(ids[ok & ~hit])})

    return ds.map_batches(keep, batch_format="pyarrow")


CURATION_LANGS = ["en", "de", "fr", "es", "zh"]
CURATION_REMOVAL_BROADCAST_CAP = 10_000_000   # loser ids; ~80 MB ceiling


def curation_pipeline_documents(sf_dir: str):
    """End-to-end curation — the composed pipeline a training-data user
    actually runs, with a full SQL oracle:

      quality gate (lang registry + n_chars >= 50 + >= 10 tokens +
      duplicate-word fraction < 0.5, all in ONE stateless pass)
      -> exact-text dedup (keep min doc_id; the removal set comes from the
         distributed hash-group verify and is duplicate-mass-sized)
      -> deterministic train/val/test split (doc_id % 10: 0=test, 1=val).

    The passing subset is materialized once (object-store resident,
    spillable) because both the dedup pass and the final labeling consume
    it; content text never reaches the driver."""
    import ray

    from rayschema.text import repetition_stats_batch

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang", "n_chars"])

    def gate(b: pa.Table) -> pa.Table:
        text = b.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ok = pc.and_(pc.and_(
            pc.is_valid(text),
            pc.fill_null(pc.is_in(b.column("lang"),
                                  value_set=pa.array(CURATION_LANGS)), False)),
            pc.fill_null(pc.greater_equal(b.column("n_chars"), 50), False))
        t = b.filter(ok)
        rep = repetition_stats_batch(t)   # row-aligned: t has no null texts
        nw = rep.column("n_words").to_numpy(zero_copy_only=False)
        nd = rep.column("n_dup_words").to_numpy(zero_copy_only=False)
        keep = (nw >= 10) & (nd * 2 < nw)
        t = t.filter(pa.array(keep))
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "text": t.column("text"),
            "lang": t.column("lang"),
            "n_tok": pa.array(nw[keep].astype(np.int64)),
        })

    passing = ds.map_batches(gate, batch_format="pyarrow").materialize()
    losers_ds = _exact_dedup_core(
        passing, emit="losers",
        n_rows=_table_rows(sf_dir, "documents")).materialize()

    def _split_col(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        m = ids % 10
        split = np.where(m == 0, "test", np.where(m == 1, "val", "train"))
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "lang": t.column("lang"),
            "n_tok": t.column("n_tok"),
            "split": pa.array(split, type=pa.string()),
        })

    if losers_ds.count() <= CURATION_REMOVAL_BROADCAST_CAP:
        # removal set is dup-mass-sized: broadcast while it fits
        losers = losers_ds.to_pandas()
        rem = np.sort(losers["doc_id"].to_numpy(np.int64)) if len(losers) \
            else np.array([], dtype=np.int64)
        rref = ray.put(rem)

        def finish(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            r = ray.get(rref)
            hit = np.zeros(len(ids), dtype=bool)
            if len(r):
                pos = np.searchsorted(r, ids)
                posc = np.minimum(pos, len(r) - 1)
                hit = (pos < len(r)) & (r[posc] == ids)
            return _split_col(b.filter(pa.array(~hit)))

        return passing.map_batches(finish, batch_format="pyarrow")

    # past the cap: DISTRIBUTED anti-join — narrow survivors and loser ids
    # union into ONE doc_id-keyed sorted scan; any group holding a loser
    # row drops entirely. No removal set ever reaches the driver.
    from rayschema.dedup import sorted_group_scan

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "lang": b.column("lang"),
            "n_tok": b.column("n_tok").cast(pa.int64()),
            "is_loser": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
        })

    def loser_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "lang": pa.nulls(n, pa.string()),
            "n_tok": pa.array(np.zeros(n, dtype=np.int64)),
            "is_loser": pa.array(np.ones(n, dtype=np.int8)),
        })

    union = passing.map_batches(narrow, batch_format="pyarrow").union(
        losers_ds.map_batches(loser_rows, batch_format="pyarrow"))
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("lang", pa.string()),
                            ("n_tok", pa.int64()),
                            ("split", pa.string())])

    def group_fn(t: pa.Table):
        fl = t.column("is_loser").to_numpy(zero_copy_only=False)
        if (fl == 1).any():
            return None
        return _split_col(t)

    def block_fn(block, starts, ends, want):
        fl = block.column("is_loser").to_numpy(zero_copy_only=False)
        sizes = ends - starts
        has_loser = np.add.reduceat(
            (fl == 1).astype(np.int64), starts) > 0 if len(starts) \
            else np.zeros(0, dtype=bool)
        sel = np.repeat(want.astype(bool) & ~has_loser, sizes)
        t = block.filter(pa.array(sel))
        return _split_col(t) if t.num_rows else None

    return sorted_group_scan(union, ["doc_id"], group_fn, out_schema,
                             block_fn=block_fn, sort_blocks=32)


SAMPLE_RATES = {"en": 47, "de": 31, "fr": 23, "es": 61, "zh": 13}  # % kept


def stratified_sample_documents(sf_dir: str):
    """Deterministic per-language stratified sampling — the training-mixture
    weighting primitive: keep a row iff
    ``(doc_id % 100003) * 2654435761 % 100 < rate[lang]``. Pure arithmetic on
    BIGINTs (never overflows, no hash library), so the DuckDB oracle computes
    the identical keep set; no shuffle — a stateless map_batches filter."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def keep(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        langs = b.column("lang")
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        # dictionary-encode: one rate lookup per DISTINCT lang, not per row
        enc = langs.dictionary_encode()
        lut = np.array([SAMPLE_RATES.get(v, 0) for v in enc.dictionary.to_pylist()]
                       + [0], dtype=np.int64)     # sentinel slot for null lang
        codes = pc.fill_null(enc.indices, len(lut) - 1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        rate = lut[codes]
        bucket = (ids % 100003) * 2654435761 % 100
        sel = pa.array(bucket < rate)
        return pa.table({
            "doc_id": pa.array(ids).filter(sel),
            "lang": langs.filter(sel),
        })

    return ds.map_batches(keep, batch_format="pyarrow")


def split_by_cluster(sf_dir: str):
    """Leakage-safe train/val/test split: the split of a document follows its
    near-dup CLUSTER representative (min id), so near-duplicates can never
    straddle splits. Deterministic modular rule on the representative
    (80/10/10); clusters broadcast; mirrored exactly in SQL via the recursive
    cluster CTE + CASE. Scope: the doc_id < 300 exact-pair subset."""
    import ray

    from rayschema.dedup import connected_components, exact_jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = exact_jaccard_pairs(ds, id_limit=300, k=5, threshold=0.5).to_pandas()
    # broadcast the rep map as PARALLEL SORTED ARRAYS: the per-batch lookup is
    # one vectorized searchsorted, never a per-row dict.get
    if len(pairs):
        cc = connected_components(pairs).sort_values("doc_id")
        rep_keys = cc["doc_id"].to_numpy().astype(np.int64)
        rep_vals = cc["cluster_id"].to_numpy().astype(np.int64)
    else:
        rep_keys = rep_vals = np.array([], dtype=np.int64)
    ref = ray.put((rep_keys, rep_vals))

    def assign(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        tl = pc.fill_null(pc.utf8_length(txt), 0).to_numpy(zero_copy_only=False)
        ok = (ids < 300) & (tl >= 5)
        keys, vals = ray.get(ref)
        if len(keys):
            pos = np.searchsorted(keys, ids)
            posc = np.minimum(pos, len(keys) - 1)
            hit = (pos < len(keys)) & (keys[posc] == ids)
            rep = np.where(hit, vals[posc], ids)
        else:
            rep = ids
        bucket = (rep % 100003) * 2654435761 % 10
        split = np.where(bucket < 8, "train", np.where(bucket == 8, "val", "test"))
        return pa.table({
            "doc_id": pa.array(ids[ok]),
            "cluster_rep": pa.array(rep[ok]),
            "split": pa.array(split[ok], type=pa.string()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def keep_best_per_cluster(sf_dir: str):
    """Canonical-document selection: from each near-dup cluster keep ONE
    doc — the longest text, min doc_id on ties (the FineWeb-style
    "collapse every duplicate cluster to its best member" step; length is
    the integer-exact stand-in for a quality rank). Singleton docs pass
    through untouched. Cluster members are compared via 24-byte
    (doc_id, rep, n_len) triples only — text never leaves the workers;
    the winner-id set broadcasts back as one sorted array. Scope: the
    doc_id < 300 exact-pair subset (the oracle-checkable cluster scope).
    Emits (doc_id, cluster_rep, n_len) for every kept doc."""
    import ray

    from rayschema.dedup import connected_components, exact_jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = exact_jaccard_pairs(ds, id_limit=300, k=5,
                                threshold=0.5).to_pandas()
    if len(pairs):
        cc = connected_components(pairs).sort_values("doc_id")
        rep_keys = cc["doc_id"].to_numpy().astype(np.int64)
        rep_vals = cc["cluster_id"].to_numpy().astype(np.int64)
    else:
        rep_keys = rep_vals = np.array([], dtype=np.int64)
    ref = ray.put((rep_keys, rep_vals))

    def _scope(b: pa.Table):
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        tl = pc.fill_null(pc.utf8_length(txt), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        null = pc.is_null(b.column("text")).to_numpy(zero_copy_only=False)
        ok = (ids < 300) & (tl >= 5) & ~null
        return ids, tl, ok

    def members(b: pa.Table) -> pa.Table:
        """Candidate triples for docs that belong to a nontrivial cluster.
        neg_len rides along so the winner scan's within-group order
        (ascending neg_len, doc_id) = (max n_len, min doc_id)."""
        keys, vals = ray.get(ref)
        ids, tl, ok = _scope(b)
        if len(keys) == 0:
            ok &= False
        else:
            pos = np.searchsorted(keys, ids)
            posc = np.minimum(pos, len(keys) - 1)
            ok &= (pos < len(keys)) & (keys[posc] == ids)
            rep = vals[posc]
        if not ok.any():
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "rep": pa.array([], type=pa.int64()),
                             "neg_len": pa.array([], type=pa.int64())})
        return pa.table({"doc_id": pa.array(ids[ok]),
                         "rep": pa.array(rep[ok]),
                         "neg_len": pa.array(-tl[ok])})

    # winner per rep = first row of each rep group under the
    # (neg_len, doc_id) within-group order — ONE rep-keyed sorted scan
    # over 24-byte triples; the driver only ever holds the O(#clusters)
    # winner-id array it must broadcast anyway (never the dup-mass-sized
    # member triples).
    if len(rep_keys):
        from rayschema.dedup import sorted_group_scan

        cand = ds.map_batches(members, batch_format="pyarrow")
        win_schema = pa.schema([("doc_id", pa.int64())])

        def win_group(t: pa.Table) -> pa.Table:
            return pa.table({"doc_id": t.column("doc_id").slice(0, 1)})

        def win_block(block, starts, ends, want):
            idx = starts[want.astype(bool)] if len(starts) else starts
            return pa.table(
                {"doc_id": block.column("doc_id").take(pa.array(idx))})

        winners = sorted_group_scan(cand, ["rep"], win_group, win_schema,
                                    block_fn=win_block,
                                    order_cols=["neg_len", "doc_id"])
        win_ids = np.sort(winners.to_pandas()["doc_id"]
                          .to_numpy(np.int64))
    else:
        win_ids = np.array([], dtype=np.int64)
    wref = ray.put(win_ids)

    def keep(b: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        wins = ray.get(wref)
        ids, tl, ok = _scope(b)
        if len(keys):
            pos = np.searchsorted(keys, ids)
            posc = np.minimum(pos, len(keys) - 1)
            hit = (pos < len(keys)) & (keys[posc] == ids)
            rep = np.where(hit, vals[posc], ids)
        else:
            hit = np.zeros(len(ids), dtype=bool)
            rep = ids
        if len(wins):
            wp = np.searchsorted(wins, ids)
            wpc = np.minimum(wp, len(wins) - 1)
            is_win = (wp < len(wins)) & (wins[wpc] == ids)
        else:
            is_win = np.zeros(len(ids), dtype=bool)
        ok &= ~hit | is_win            # singletons OR cluster winners
        return pa.table({"doc_id": pa.array(ids[ok]),
                         "cluster_rep": pa.array(rep[ok]),
                         "n_len": pa.array(tl[ok])})

    return ds.map_batches(keep, batch_format="pyarrow")


def simhash_near_dup_documents(sf_dir: str):
    from rayschema.dedup import simhash_near_dups

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_near_dups(ds, max_hamming=3,
                             n_rows=_table_rows(sf_dir, "documents"))


def embedding_near_dup(sf_dir: str):
    """EXACT all-pairs cosine >= 0.4 (the synthetic embeddings hold no pairs
    above ~0.52, so a usable threshold sits below that) — broadcast-matrix
    block scan, mirrored by a DuckDB list_cosine_similarity self-join."""
    from rayschema.dedup import embedding_cosine_pairs_exact

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_cosine_pairs_exact(ds, threshold=0.4)


def embedding_near_dup_lsh(sf_dir: str):
    """Hyperplane-LSH bucketed near-dup pairs — the 100-TB scale path
    (recall < 1 by design; rows-only for the driver, recall vs the exact
    query is unit-tested on planted near-identical vectors)."""
    from rayschema.dedup import embedding_near_dups

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dups(ds, cos_threshold=0.4, bits=4)


def lsh_recall_report(sf_dir: str):
    """ORACLE-CHECKED LSH recall: the deterministic SRP bands
    (similarity.SrpBander — integer-exact, SQL-mirrorable) are joined onto
    the exact cosine>=0.4 pair set; a pair is 'found' when ANY band matches.
    Emits ONE row (method, n_exact, n_found, recall) that DuckDB recomputes
    from scratch — approximate-path recall as a hash-checked quantity, not
    just a pytest assertion."""
    from ray.data.aggregate import Sum

    from rayschema.dedup import _proj, embedding_cosine_pairs_exact, round_half_away
    from rayschema.similarity import SrpBander

    N_BANDS = 4
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    bands = ds.map_batches(SrpBander, batch_format="pyarrow",
                           concurrency=(1, 8)).materialize()
    ba = _proj(bands, {"vec_id": "id_a",
                       **{f"srp_band_{k}": f"a{k}" for k in range(N_BANDS)}})
    bc = _proj(bands, {"vec_id": "id_b",
                       **{f"srp_band_{k}": f"c{k}" for k in range(N_BANDS)}})
    pairs = _proj(embedding_cosine_pairs_exact(ds, threshold=0.4),
                  {"id_a": "id_a", "id_b": "id_b"})
    j = (pairs.join(ba, join_type="inner", num_partitions=8, on=("id_a",))
         .join(bc, join_type="inner", num_partitions=8, on=("id_b",)))

    def partial(b: pa.Table) -> pa.Table:
        found = np.zeros(b.num_rows, dtype=bool)
        for k in range(N_BANDS):
            found |= (b.column(f"a{k}").to_numpy(zero_copy_only=False)
                      == b.column(f"c{k}").to_numpy(zero_copy_only=False))
        return pa.table({"n": pa.array([b.num_rows], type=pa.int64()),
                         "f": pa.array([int(found.sum())], type=pa.int64())})

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="n"), Sum("f", alias_name="f")))
    n = int(agg.get("n") or 0)
    f = int(agg.get("f") or 0)
    return pd.DataFrame([{
        "method": "srp_lsh_4x4",
        "n_exact": np.int64(n), "n_found": np.int64(f),
        "recall": float(round_half_away(np.array([f / max(n, 1)]), 6)[0]),
    }])


def _pair_recall(exact_ds, found_ds, cols=("id_a", "id_b")):
    """DISTRIBUTED pair-set recall: (n_exact, n_intersect) without driver
    pair sets. Both sides map to a packed 8-byte pair key + side tag, the
    union goes through ONE key-sorted scan whose block kernel marks each
    key group (exact-present, both-present) via reduceat, and two Sums
    fold the per-group flags — driver state is two scalars regardless of
    pair-list size (the round-3 verdict's unbounded-set fix)."""
    from ray.data.aggregate import Sum

    from rayschema.dedup import sorted_group_scan

    ca, cb = cols

    def tag(ds, t):
        def f(b: pa.Table) -> pa.Table:
            a = b.column(ca).to_numpy(zero_copy_only=False).astype(np.int64)
            bb = b.column(cb).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "k": pa.array((a << 32) | bb),
                "tag": pa.array(np.full(len(a), t, dtype=np.int8))})
        return ds.map_batches(f, batch_format="pyarrow")

    union = tag(exact_ds, 0).union(tag(found_ds, 1))
    out_schema = pa.schema([("n_exact", pa.int64()),
                            ("n_inter", pa.int64())])

    def group_fn(t: pa.Table):
        tags = t.column("tag").to_numpy(zero_copy_only=False)
        has0, has1 = bool((tags == 0).any()), bool((tags == 1).any())
        return pa.table({"n_exact": pa.array([int(has0)]),
                         "n_inter": pa.array([int(has0 and has1)])})

    def block_fn(block, starts, ends, want):
        if not len(starts):
            return None
        tags = block.column("tag").to_numpy(zero_copy_only=False)
        e0 = np.add.reduceat((tags == 0).astype(np.int64), starts) > 0
        e1 = np.add.reduceat((tags == 1).astype(np.int64), starts) > 0
        w = want.astype(bool)
        return pa.table({
            "n_exact": pa.array(e0[w].astype(np.int64)),
            "n_inter": pa.array((e0 & e1)[w].astype(np.int64))})

    flags = sorted_group_scan(union, ["k"], group_fn, out_schema,
                              block_fn=block_fn)
    agg = flags.aggregate(Sum("n_exact", alias_name="n_exact"),
                          Sum("n_inter", alias_name="n_inter"))
    return (int(agg["n_exact"] or 0), int(agg["n_inter"] or 0))


def ann_recall_report(sf_dir: str):
    """Rows-only recall panel for the approximate paths, each measured
    against its own already-oracle-checked exact query: MinHash-LSH vs the
    exact char-5-gram pairs (doc_id < 300), hyperplane-LSH embedding pairs
    vs exact cosine, and IVF top-10 vs brute force. Pair-set intersections
    run DISTRIBUTED (``_pair_recall``: packed-key sorted scan + Sum) — the
    driver only ever holds (n_exact, n_inter) scalars per panel row, so
    the audit stays bounded at any corpus size.

    The panel runs 6 small pipelines whose wall time is dominated by the
    ~1 s fixed cost per Dataset execution, so the two shared inputs are
    materialized ONCE and the three independent recall computations run on
    a thread pool — each Ray Dataset has its own streaming executor, so
    overlapping them collapses the fixed latencies without changing any
    result."""
    from concurrent.futures import ThreadPoolExecutor

    import ray.data as rd

    from rayschema.dedup import (
        embedding_cosine_pairs_exact,
        embedding_near_dups,
        exact_jaccard_pairs,
        minhash_near_dups,
        round_half_away,
    )
    from rayschema.similarity import brute_force_topk, ivf_topk

    docs_sub = (_read(sf_dir, "documents", columns=["doc_id", "text"])
                .filter(expr="doc_id < 300").materialize())
    emb = (_read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
           .materialize())

    def jaccard_recall():
        return _pair_recall(
            exact_jaccard_pairs(docs_sub, id_limit=300, k=5, threshold=0.5),
            minhash_near_dups(docs_sub, threshold=0.5,
                              n_rows=docs_sub.count()))

    def cosine_recall():
        return _pair_recall(
            embedding_cosine_pairs_exact(emb, threshold=0.4),
            embedding_near_dups(emb, cos_threshold=0.4, bits=4))

    def ivf_recall():
        q = _query_vecs(sf_dir, ["vec_id", "embedding"])
        queries = np.stack(q["embedding"].to_numpy())
        bf = brute_force_topk(emb, queries, k=10)
        ivf = ivf_topk(emb, queries, k=10, n_clusters=8, nprobe=3)
        cols = ["query_id", "vec_id"]
        return _pair_recall(rd.from_pandas(bf[cols]),
                            rd.from_pandas(ivf[cols]),
                            cols=("query_id", "vec_id"))

    with ThreadPoolExecutor(max_workers=3) as ex:
        f_j = ex.submit(jaccard_recall)
        f_c = ex.submit(cosine_recall)
        f_i = ex.submit(ivf_recall)
        panel = [("minhash_lsh_16x4", *f_j.result()),
                 ("hyperplane_lsh_4bit", *f_c.result()),
                 ("ivf_nprobe3of8", *f_i.result())]

    rows = []
    for method, n_exact, inter in panel:
        rows.append({
            "method": method,
            "n_exact": np.int64(n_exact),
            "n_found": np.int64(inter),
            "recall": float(round_half_away(
                np.array([inter / max(n_exact, 1)]), 6)[0]),
        })
    return pd.DataFrame(rows)


# --------------------------------------------------------------------------- similarity
def _query_vecs(sf_dir: str, columns, ids=(0, 1, 2)):
    """Driver-side row-filtered parquet read of the fixed ANN query vectors
    (the top_revenue_customers row-filtered-read pattern): fetching three
    rows must not pay a full Ray filter execution."""
    import pyarrow.dataset as pads

    return (pads.dataset(os.path.join(sf_dir, "embeddings.parquet"))
            .to_table(columns=list(columns),
                      filter=pads.field("vec_id").isin(list(ids)))
            .to_pandas().sort_values("vec_id").reset_index(drop=True))


def knn_bruteforce(sf_dir: str):
    """Exact cosine top-10 for 3 fixed query vectors (vec_id 0,1,2)."""
    from rayschema.similarity import brute_force_topk

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _query_vecs(sf_dir, ["vec_id", "embedding"])
    queries = np.stack(q["embedding"].to_numpy())
    return brute_force_topk(ds, queries, k=10,
                            n_rows=_table_rows(sf_dir, "embeddings"))


def knn_ivf(sf_dir: str):
    """IVF-bucketed approximate top-10 (recall checked against brute force
    in tests; rows-only for the driver)."""
    from rayschema.similarity import ivf_topk

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _query_vecs(sf_dir, ["vec_id", "embedding"])
    queries = np.stack(q["embedding"].to_numpy())
    return ivf_topk(ds, queries, k=10, n_clusters=8, nprobe=3)


def hard_negative_mining(sf_dir: str, k: int = 5):
    """Contrastive hard-negative mining (embedding-training data prep):
    for each query vector (vec_id 0-2), the top-k most-cosine-similar
    vectors carrying a DIFFERENT label. The (query matrix, query labels)
    broadcast once via ray.put; each batch computes a masked local top-k
    (same-label rows excluded vectorized), and the driver merges the
    bounded batches x k x n_queries candidate set — the knn_bruteforce
    shape plus the label mask. Emits (query_id, vec_id, neg_label,
    cosine, rank)."""
    import ray

    from rayschema.dedup import round_half_away
    from rayschema.similarity import _normalize

    ds = _read(sf_dir, "embeddings",
               columns=["vec_id", "embedding", "label"])
    q = _query_vecs(sf_dir, ["vec_id", "embedding", "label"])
    qmat = _normalize(np.stack(q["embedding"].to_numpy())
                      .astype(np.float64))
    ref = ray.put((q["vec_id"].to_numpy(np.int64),
                   q["label"].to_numpy(np.int64), qmat))

    def scan(b: pa.Table, _ref=ref) -> pa.Table:
        qids, qlab, qm = ray.get(_ref)
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        empty = pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "neg_label": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64())})
        if len(col) == 0:
            return empty
        rows = _normalize(np.stack(col.to_numpy(zero_copy_only=False))
                          .astype(np.float64))
        rid = b.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rlab = b.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sims = rows @ qm.T                                  # (b, nq)
        sims[rlab[:, None] == qlab[None, :]] = -2.0
        qs, vs, ls, cs = [], [], [], []
        for qi in range(len(qids)):
            col_s = sims[:, qi]
            m = min(k, len(col_s))
            loc = np.argpartition(-col_s, m - 1)[:m]
            keep = col_s[loc] > -1.5
            loc = loc[keep]
            qs.append(np.full(len(loc), qids[qi], dtype=np.int64))
            vs.append(rid[loc])
            ls.append(rlab[loc])
            cs.append(col_s[loc])
        return pa.table({"query_id": pa.array(np.concatenate(qs)),
                         "vec_id": pa.array(np.concatenate(vs)),
                         "neg_label": pa.array(np.concatenate(ls)),
                         "cosine": pa.array(np.concatenate(cs))})

    cand = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["query_id", "cosine", "vec_id"],
                            ascending=[True, False, True],
                            kind="mergesort")
    out = cand.groupby("query_id", as_index=False).head(k) \
        .reset_index(drop=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out["cosine"] = round_half_away(out["cosine"].to_numpy(), 6)
    return out


def _knn_label_predict_cluster(sf_dir: str, k: int = 5,
                               n_clusters: int = 4, iters: int = 2):
    """The cluster-localized scale path of knn_label_predict: integer-exact
    k-means centroids broadcast (k x dim ints), stateless assignment, ONE
    cluster-keyed sorted scan running the LOO vote inside each co-located
    cluster (similarity blocks chunked at 4096 rows)."""
    import ray

    from rayschema.dedup import round_half_away, sorted_group_scan
    from rayschema.similarity import _normalize, kmeans_quantized

    ds = _read(sf_dir, "embeddings",
               columns=["vec_id", "embedding", "label"])
    km = kmeans_quantized(ds, k=n_clusters, iters=iters)
    cent = (km.sort_values(["cluster", "d"])["c"]
            .to_numpy(np.int64).reshape(n_clusters, -1))
    cent_ref = ray.put(cent)

    def assign(b: pa.Table, _cref=cent_ref) -> pa.Table:
        c = ray.get(_cref)
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({
                "vec_id": pa.array([], type=pa.int64()),
                "label": pa.array([], type=pa.int64()),
                "cluster": pa.array([], type=pa.int64()),
                "embedding": col})
        mat = np.stack(col.to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        q = round_half_away(mat * 1e6, 0).astype(np.int64)
        dist = ((q * q).sum(axis=1)[:, None] - 2 * (q @ c.T)
                + (c * c).sum(axis=1)[None, :])
        return pa.table({
            "vec_id": b.column("vec_id").cast(pa.int64()),
            "label": b.column("label").cast(pa.int64()),
            "cluster": pa.array(dist.argmin(axis=1).astype(np.int64)),
            "embedding": col})

    tagged = ds.map_batches(assign, batch_format="pyarrow")
    out_schema = pa.schema([("vec_id", pa.int64()),
                            ("true_label", pa.int64()),
                            ("pred_label", pa.int64()),
                            ("correct", pa.int64())])

    def cluster_group(t: pa.Table):
        ids = t.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        labs = t.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        m = _normalize(np.stack(col.to_numpy(zero_copy_only=False))
                       .astype(np.float64))
        n = len(ids)
        kk = min(k, n - 1)
        if kk <= 0:
            pred = labs.copy()        # singleton cluster: echo own label
        else:
            n_labels = int(labs.max()) + 1
            pred = np.empty(n, dtype=np.int64)
            for s in range(0, n, 4096):
                e = min(s + 4096, n)
                sims = m[s:e] @ m.T
                sims[np.arange(e - s), np.arange(s, e)] = -2.0
                topidx = np.argsort(-sims, axis=1,
                                    kind="stable")[:, :kk]
                votes = labs[topidx]
                counts = np.zeros((e - s, n_labels), dtype=np.int64)
                np.add.at(counts,
                          (np.repeat(np.arange(e - s), votes.shape[1]),
                           votes.ravel()), 1)
                pred[s:e] = counts.argmax(axis=1)
        return pa.table({"vec_id": pa.array(ids),
                         "true_label": pa.array(labs),
                         "pred_label": pa.array(pred),
                         "correct": pa.array(
                             (pred == labs).astype(np.int64))})

    return sorted_group_scan(tagged, ["cluster"], cluster_group,
                             out_schema, order_cols=["vec_id"])


def knn_label_predict(sf_dir: str, k: int = 5,
                      strategy: str = "broadcast"):
    """Leave-one-out k-NN label prediction — the standard embedding-quality
    probe: each vector's label predicted by majority vote of its k cosine
    nearest neighbors (self excluded), smallest label on vote ties
    (row_number semantics). Neighbor order inside a cosine tie follows
    ascending vec_id. Emits (vec_id, true_label, pred_label, correct).

    * ``strategy="broadcast"`` (the oracled default): the corpus (ids,
      labels, normalized matrix) broadcasts once — the <=10^7-vector
      baseline shared with embedding_cosine_pairs_exact.
    * ``strategy="cluster"`` (the 100-TB path, IMPLEMENTED): k-means
      localization exactly like semdedup's scan — stateless centroid
      assignment, ONE cluster-keyed sorted scan, the SAME vote kernel
      restricted to same-cluster neighbors. Approximate at cluster
      boundaries by construction (recall asserted on planted clusters in
      tests; identical to broadcast when true neighbors share clusters)."""
    if strategy == "cluster":
        return _knn_label_predict_cluster(sf_dir, k=k)
    import ray

    from rayschema.similarity import _normalize

    ds = _read(sf_dir, "embeddings",
               columns=["vec_id", "embedding", "label"])
    full = ds.to_pandas().sort_values("vec_id")
    cids = full["vec_id"].to_numpy(np.int64)
    clabs = full["label"].to_numpy(np.int64)
    cmat = _normalize(np.stack(full["embedding"].to_numpy())
                      .astype(np.float64))
    n_labels = int(clabs.max()) + 1 if len(clabs) else 1
    ref = ray.put((cids, clabs, cmat))

    def scan(b: pa.Table, _ref=ref) -> pa.Table:
        cids_, clabs_, cm = ray.get(_ref)
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        empty = pa.table({
            "vec_id": pa.array([], type=pa.int64()),
            "true_label": pa.array([], type=pa.int64()),
            "pred_label": pa.array([], type=pa.int64()),
            "correct": pa.array([], type=pa.int64())})
        if len(col) == 0:
            return empty
        rows = _normalize(np.stack(col.to_numpy(zero_copy_only=False))
                          .astype(np.float64))
        rid = b.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rlab = b.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sims = rows @ cm.T                                   # (b, N)
        pos = np.searchsorted(cids_, rid)
        sims[np.arange(len(rid)), pos] = -2.0                # exclude self
        # stable argsort on -sims: corpus is id-ascending, so float ties
        # resolve by vec_id exactly like the oracle's row_number
        topidx = np.argsort(-sims, axis=1, kind="stable")[:, :k]
        votes = clabs_[topidx]                               # (b, k)
        counts = np.zeros((len(rid), n_labels), dtype=np.int64)
        np.add.at(counts, (np.repeat(np.arange(len(rid)), votes.shape[1]),
                           votes.ravel()), 1)
        pred = counts.argmax(axis=1).astype(np.int64)        # min label wins
        return pa.table({
            "vec_id": pa.array(rid),
            "true_label": pa.array(rlab),
            "pred_label": pa.array(pred),
            "correct": pa.array((pred == rlab).astype(np.int64))})

    return ds.map_batches(scan, batch_format="pyarrow")


# --------------------------------------------------------------------------- text ops
def token_counts_documents(sf_dir: str):
    from rayschema.text import token_count_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (ds.map_batches(token_count_batch, batch_format="pyarrow")
              .select_columns(["doc_id", "token_count"]))


def langid_documents(sf_dir: str):
    from rayschema.text import LangId

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return (ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 16))
              .select_columns(["doc_id", "lang", "lang_pred", "lang_conf"]))


def bpeish_token_counts(sf_dir: str):
    """Regex (word + punctuation) token count — the BPE-ish approximation,
    SQL-mirrored via len(regexp_extract_all(...)) on the same RE2 pattern."""
    from rayschema.text import BpeishTokenCounter

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (ds.map_batches(BpeishTokenCounter, batch_format="pyarrow",
                           concurrency=(1, 16))
              .select_columns(["doc_id", "bpeish_tokens"]))


def char_class_counts(sf_dir: str):
    """Per-document character-class counts (alpha/digit/punct) — the exact
    integer core of the quality signals, SQL-mirrorable via regexp_replace."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def counts(b: pa.Table) -> pa.Table:
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()

        def c(pattern: str):
            # null text -> null counts (matches the SQL NULL arithmetic)
            return pc.count_substring_regex(col, pattern).cast(pa.int64())

        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_alpha": c(r"[A-Za-z]"),
            "n_digit": c(r"[0-9]"),
            "n_space": c(r" "),
        })

    return ds.map_batches(counts, batch_format="pyarrow")


def quality_documents(sf_dir: str):
    """Quality signals, SQL-mirrored: ratios and the composite score use the
    same float64 op order as the DuckDB oracle, rounded half-away (DuckDB
    round semantics) to 6 decimals."""
    from rayschema.dedup import round_half_away
    from rayschema.text import quality_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = (ds.map_batches(quality_batch, batch_format="pyarrow")
             .select_columns(["doc_id", "q_len", "alpha_ratio", "quality"]))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "q_len": b.column("q_len"),
            "alpha_ratio": pa.array(round_half_away(
                b.column("alpha_ratio").to_numpy(zero_copy_only=False), 6)),
            "quality": pa.array(round_half_away(
                b.column("quality").to_numpy(zero_copy_only=False), 6)),
        })

    return out.map_batches(fin, batch_format="pyarrow")


def fingerprint_documents(sf_dir: str):
    from rayschema.text import Fingerprinter

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (ds.map_batches(Fingerprinter, batch_format="pyarrow", concurrency=(1, 16))
              .select_columns(["doc_id", "fingerprint"]))


def repetition_stats_documents(sf_dir: str):
    """Within-document repetition signals (Gopher/C4 quality-filter style):
    per doc the word count, duplicate-word count, max word frequency and
    duplicate word-2-gram count — all from one split kernel + numpy
    lexsort per batch. Stateless map; no shuffle."""
    from rayschema.text import repetition_stats_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(repetition_stats_batch, batch_format="pyarrow")


def gopher_quality_flags(sf_dir: str):
    """Gopher-rule quality flags per document — stateless map, no shuffle;
    pass/fail decided on integer cross-products so the oracle matches
    exactly (see text.gopher_flags_batch)."""
    from rayschema.text import gopher_flags_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(gopher_flags_batch, batch_format="pyarrow")


# Deterministic seeded shuffle-shard for training output: multiplicative
# hashing (Knuth / xxhash-prime mixers) kept within 2^32 so the DuckDB
# oracle reproduces every value with HUGEINT modular arithmetic.
SHUF_KNUTH = 2654435761
SHUF_MIX = 2246822519
SHUF_MOD = 2 ** 32
SHUF_SEED = 42
SHUF_N_SHARDS = 16


def _parquet_row_count(sf_dir: str, table: str) -> int:
    """Row count straight from parquet footer metadata — no dataset
    execution (the adaptive-path gate used to cost an extra ds.count()
    run; footers are metadata-sized at any corpus scale)."""
    import glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                             recursive=True)) if os.path.isdir(path) \
        else [path]
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def shuffle_shard_documents(sf_dir: str, n_shards: int = SHUF_N_SHARDS,
                            seed: int = SHUF_SEED):
    """Deterministic seeded global shuffle + shard assignment — the
    trainer-facing "shuffle 100 TB into S shards" primitive without a
    random_shuffle all-to-all: shard = hash(doc_id, seed) % S and the
    within-shard order is a second mix hash, so the operator is a pure
    stateless map over ids plus ONE rank pass per shard. Only 24 B/row
    (id, shard, h2) ever moves — text never shuffles; the writer stage
    would co-read text by id per shard. Emits (doc_id, shard, pos)."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return _shuffle_shard_rank(ds, n_shards, seed,
                               n_rows=_parquet_row_count(sf_dir,
                                                         "documents"))


def _shuffle_shard_rank(ds, n_shards: int = SHUF_N_SHARDS,
                        seed: int = SHUF_SEED, n_rows: int = None):
    """Shared seeded shard + within-shard rank over a (doc_id) Dataset —
    the rank core of shuffle_shard_documents, also the shard-placement
    stage of trainer_export_pipeline. ``n_rows`` (when known from parquet
    metadata) picks the adaptive path without an extra execution."""

    def assign(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        h1 = (ids * np.uint64(SHUF_KNUTH) + np.uint64(seed)) \
            % np.uint64(SHUF_MOD)
        h2 = (h1 * np.uint64(SHUF_MIX)) % np.uint64(SHUF_MOD)
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64)),
            "shard": pa.array((h1 % np.uint64(n_shards)).astype(np.int64)),
            "h2": pa.array(h2.astype(np.int64)),
        })

    # ADAPTIVE rank: below the cap a shard fits one in-memory group and
    # the single-shuffle groupby(shard).map_groups is cheapest; above it
    # (a shard is 1/S of the corpus — 10^10 rows at 100 TB) the
    # two-phase shape takes over: phase 1 histograms (shard, h2-bucket)
    # counts (metadata: S x 65k rows) and prefix-sums exact within-shard
    # offsets; phase 2 is ONE narrow (shard, bucket, h2, id) sort whose
    # block kernel adds offset + within-group position. No group ever
    # exceeds a bucket. Both paths emit identical rows (equality-tested).
    if n_rows is None:
        n_rows = ds.count()
    if n_rows <= n_shards * SHUF_GROUP_CAP:
        def rank(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["h2", "doc_id"]).reset_index(drop=True)
            g["pos"] = np.arange(len(g), dtype=np.int64)
            return g[["doc_id", "shard", "pos"]]

        return (ds.map_batches(assign, batch_format="pyarrow")
                .groupby("shard").map_groups(rank, batch_format="pandas"))

    from rayschema.dedup import sorted_group_scan

    BUCKET_SHIFT = 16          # bucket = h2 >> 16 -> <= 65k buckets/shard

    def bucketed(b: pa.Table) -> pa.Table:
        t = assign(b)
        h2 = t.column("h2").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((h2 >> BUCKET_SHIFT).astype(np.int64)))

    tagged = ds.map_batches(bucketed, batch_format="pyarrow")

    def hpartial(b: pa.Table) -> pa.Table:
        g = b.group_by(["shard", "bucket"]).aggregate([([], "count_all")])
        return g.select(['shard', 'bucket', 'count_all']).rename_columns(["shard", "bucket", "cnt"])

    hist = (tagged.map_batches(hpartial, batch_format="pyarrow")
            .to_pandas().groupby(["shard", "bucket"], as_index=False)
            ["cnt"].sum().sort_values(["shard", "bucket"]))
    sh = hist["shard"].to_numpy(np.int64)
    bk = hist["bucket"].to_numpy(np.int64)
    cnt = hist["cnt"].to_numpy(np.int64)
    cum = np.cumsum(cnt)
    ex = np.concatenate([[0], cum[:-1]])          # global exclusive prefix
    shard_first = np.ones(len(sh), dtype=bool)
    shard_first[1:] = sh[1:] != sh[:-1]
    # within-shard exclusive offset = global prefix minus the shard's
    # first-entry prefix (carried forward; ex is nondecreasing)
    base = np.maximum.accumulate(np.where(shard_first, ex, 0))
    off = ex - base
    packed = (sh << (BUCKET_SHIFT + 1)) | bk
    order = np.argsort(packed)
    packed, off = packed[order], off[order]

    def block_fn(block: pa.Table, starts, ends, want):
        sizes = (ends - starts).astype(np.int64)
        row_start = np.repeat(starts, sizes)
        pos_in = np.arange(len(block), dtype=np.int64) - row_start
        s = block.column("shard").to_numpy(zero_copy_only=False)
        b2 = block.column("bucket").to_numpy(zero_copy_only=False)
        key = (s << (BUCKET_SHIFT + 1)) | b2
        pos = off[np.searchsorted(packed, key)] + pos_in
        keep = np.repeat(want, sizes)
        return pa.table({
            "doc_id": block.column("doc_id").filter(pa.array(keep)),
            "shard": block.column("shard").filter(pa.array(keep)),
            "pos": pa.array(pos[keep])})

    def group_fn(t: pa.Table):
        s = t.column("shard").to_numpy(zero_copy_only=False)
        b2 = t.column("bucket").to_numpy(zero_copy_only=False)
        key = (s << (BUCKET_SHIFT + 1)) | b2
        pos = off[np.searchsorted(packed, key)] \
            + np.arange(len(t), dtype=np.int64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "shard": t.column("shard"),
                         "pos": pa.array(pos)})

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("shard", pa.int64()),
                            ("pos", pa.int64())])
    return sorted_group_scan(tagged, ["shard", "bucket"], group_fn,
                             out_schema, block_fn=block_fn,
                             order_cols=["h2", "doc_id"])


SHUF_GROUP_CAP = 5_000_000   # rows per shard the map_groups path may hold


MIXTURE_CAP_DIVISOR = 2    # per-source token cap = total_tokens // (2*n_src)


def source_mixture_weights(sf_dir: str):
    """Per-source sampling weights for a token-budget mixture (the
    "cap every source at an equal share" step of corpus mixing):
    weight_millionths = min(1e6, cap*1e6 // src_tokens) with
    cap = total_tokens // (2 * n_sources) — all integer arithmetic, so
    the oracle is exact. Per-batch partials (source -> tokens, docs) are
    combined on the driver: sources are a few-hot-groups dimension (the
    cap_per_source shape), so the merge table is O(n_sources), never
    O(rows)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        src = b.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # whitespace tokens = single-space count + 1 (len(string_split))
        toks = pc.add(pc.count_substring(b.column("text"), " "), 1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        return pa.table({
            "source": enc.dictionary,
            "n_tokens": pa.array(np.bincount(codes, weights=toks,
                                             minlength=k).astype(np.int64)),
            "n_docs": pa.array(np.bincount(codes, minlength=k)
                               .astype(np.int64)),
        })

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = part.groupby("source", as_index=False).sum()
    total = int(agg["n_tokens"].sum())
    cap = total // (MIXTURE_CAP_DIVISOR * len(agg))
    # Python big-int per source (O(n_sources)): cap*1e6 can pass 2^63 on a
    # real corpus, where a numpy int64 floor-div would overflow
    agg["weight_millionths"] = np.array(
        [min(10 ** 6, cap * 10 ** 6 // int(t)) for t in agg["n_tokens"]],
        dtype=np.int64)
    return agg.sort_values("source").reset_index(drop=True)


def events_hourly_anomaly(sf_dir: str):
    """Monitoring primitive: flag hours whose global event count deviates
    more than 2 sigma from the mean — with the z-test done in EXACT
    integer cross-multiplied form ((H·c - S)^2 > 4·(H·SS - S^2), i.e.
    (c - mean)^2 > 4·var with denominators cleared), so the flag is
    oracle-checkable with no float variance semantics. Distributed
    per-batch hour bincounts merge on the driver (hours are a bounded
    few-hot-groups dimension); the threshold math runs in Python big
    ints — immune to overflow at any corpus size."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        u, c = np.unique(ts // 3_600_000_000, return_counts=True)
        return pa.table({"hour_bucket": pa.array(u.astype(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (part.groupby("hour_bucket", as_index=False)["n"].sum()
           .sort_values("hour_bucket").reset_index(drop=True))
    counts = [int(x) for x in agg["n"]]
    big_h, s = len(counts), sum(counts)
    ss = sum(c * c for c in counts)
    thr = 4 * (big_h * ss - s * s)
    flags = [1 if (big_h * c - s) ** 2 > thr else 0 for c in counts]
    return pd.DataFrame({
        "hour_bucket": agg["hour_bucket"].astype(np.int64),
        "n_events": agg["n"].astype(np.int64),
        "is_anomaly": np.array(flags, dtype=np.int64),
    })


def lang_source_residuals(sf_dir: str):
    """Contingency-table INDEPENDENCE residuals for (lang, source) — the
    chi-square numerator in denominator-cleared integer form: per cell,
    ``resid_num = N·O − R·C`` (observed minus expected, scaled by N·R·C's
    common denominator N), positive = over-represented. The pivot gives
    the table; this gives the statistic, all integer so the oracle is a
    window-sum recomputation. Distribution: per-batch (lang, source)
    count partials fold through a tiny groupby (bounded dims); the
    residual math is driver arithmetic over the metadata-sized table.
    Emits (lang, source, n_docs, resid_num, total)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("lang")),
                             pc.is_valid(b.column("source"))))
        g = b.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return g.select(['lang', 'source', 'count_all']).rename_columns(["lang", "source", "n"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["lang", "source"])
           .aggregate(Sum("n", alias_name="n"))).to_pandas()
    if not len(agg):
        return pd.DataFrame({c: [] for c in
                             ("lang", "source", "n_docs", "resid_num",
                              "total")})
    total = int(agg["n"].sum())
    rsum = agg.groupby("lang")["n"].transform("sum").astype(np.int64)
    csum = agg.groupby("source")["n"].transform("sum").astype(np.int64)
    out = pd.DataFrame({
        "lang": agg["lang"],
        "source": agg["source"],
        "n_docs": agg["n"].astype(np.int64),
        "resid_num": (total * agg["n"].astype(np.int64)
                      - rsum * csum).astype(np.int64),
        "total": np.int64(total),
    })
    return out.reset_index(drop=True)


def hourly_trend_slope(sf_dir: str):
    """Per-event-type activity TREND: the least-squares slope of hourly
    counts over time, emitted as the EXACT integer rational
    ``(n·Σxy − Σx·Σy, n·Σx² − (Σx)²)`` with x = hour index within the
    type's observed range and y = that hour's count — the regression
    primitive in denominator-cleared form so no float division exists on
    either side. Distribution: per-batch (type, hour) bincount partials
    fold through a tiny groupby (types × hours is a bounded dimension);
    the closed-form sums run on the metadata-sized series. Emits
    (event_type, slope_num, slope_den, n_hours)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("event_type")))
        et = b.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        hrs = (b.column("ts").cast(pa.int64())
               .to_numpy(zero_copy_only=False) // 3_600_000_000)
        df = pd.DataFrame({"event_type": et.to_pandas(), "hour": hrs})
        g = df.groupby(["event_type", "hour"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["event_type", "hour"])
           .aggregate(Sum("n", alias_name="n"))).to_pandas()
    rows = []
    for t, g in agg.groupby("event_type"):
        g = g.sort_values("hour")
        # x = hour offset from the type's first observed hour; MISSING
        # hours inside the range count as y=0 (a real zero-activity hour)
        h0, h1 = int(g["hour"].min()), int(g["hour"].max())
        n = h1 - h0 + 1
        y = np.zeros(n, dtype=np.int64)
        y[g["hour"].to_numpy(np.int64) - h0] = g["n"].to_numpy(np.int64)
        x = np.arange(n, dtype=np.int64)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        sxx = int((x * x).sum())
        rows.append({"event_type": t,
                     "slope_num": np.int64(n * sxy - sx * sy),
                     "slope_den": np.int64(n * sxx - sx * sx),
                     "n_hours": np.int64(n)})
    return pd.DataFrame(rows)


CUSUM_K_NUM, CUSUM_K_DEN = 1, 1     # drift allowance k = mean * 1/1... see fn
CUSUM_H_MULT = 8                    # alarm threshold h = H_MULT * mean


def events_cusum_change(sf_dir: str):
    """Sequential change-point detection (CUSUM) on global hourly event
    counts — the streaming-monitoring complement of the 2-sigma z-test:
    ``S_t = max(0, S_{t-1} + (c_t*H - S))`` with the drift allowance = the
    EXACT integer mean (counts scaled by H so mean = S clears the
    denominator) and alarm when ``S_t > 8*S``. All integers, so the
    DuckDB oracle replays the recurrence with a RECURSIVE CTE over the
    ordered hours. Distribution shape: per-batch hour bincounts (the
    bounded few-hot-groups dimension) fold on the driver; the sequential
    scan runs over the metadata-sized hour series. Emits
    (hour_bucket, n_events, cusum, is_alarm)."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        u, c = np.unique(ts // 3_600_000_000, return_counts=True)
        return pa.table({"hour_bucket": pa.array(u.astype(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (part.groupby("hour_bucket", as_index=False)["n"].sum()
           .sort_values("hour_bucket").reset_index(drop=True))
    counts = [int(x) for x in agg["n"]]
    big_h = len(counts)
    s_tot = sum(counts)
    cus, alarms = [], []
    s = 0
    for c in counts:
        s = max(0, s + (c * big_h - s_tot))
        cus.append(s)
        alarms.append(1 if s > CUSUM_H_MULT * s_tot else 0)
    return pd.DataFrame({
        "hour_bucket": agg["hour_bucket"].astype(np.int64),
        "n_events": agg["n"].astype(np.int64),
        "cusum": np.array(cus, dtype=np.int64),
        "is_alarm": np.array(alarms, dtype=np.int64),
    })


BIGRAM_TOP_N = 20


def _bigram_pair_counts(ds) -> pd.DataFrame:
    """Corpus-wide adjacent-word-pair counts: per-batch partials (shared
    flatten kernel + one lexsort of dictionary codes) merged on the
    driver — the distinct-bigram table is vocabulary-bounded, the natural
    driver-state shape; past that the Misra-Gries sketch or a (w1,w2)
    groupby takes over (documented). Returns (w1, w2, c)."""
    from rayschema.text import _flatten_words_arrow

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        empty = pa.table({"w1": pa.array([], type=pa.string()),
                          "w2": pa.array([], type=pa.string()),
                          "c": pa.array([], type=pa.int64())})
        if len(col) == 0:
            return empty
        flat, _, doc_idx = _flatten_words_arrow(col)
        if len(flat) < 2:
            return empty
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        same = doc_idx[1:] == doc_idx[:-1]
        a, bb = codes[:-1][same], codes[1:][same]
        if len(a) == 0:
            return empty
        order = np.lexsort((bb, a))
        a_s, b_s = a[order], bb[order]
        new = np.ones(len(a_s), dtype=bool)
        new[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(a_s)))
        d = enc.dictionary
        return pa.table({"w1": d.take(pa.array(a_s[starts])),
                         "w2": d.take(pa.array(b_s[starts])),
                         "c": pa.array(cnt.astype(np.int64))})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(part) == 0:
        return pd.DataFrame({"w1": pd.Series([], dtype=object),
                             "w2": pd.Series([], dtype=object),
                             "c": pd.Series([], dtype=np.int64)})
    return part.groupby(["w1", "w2"], as_index=False)["c"].sum()


def bigram_next_word(sf_dir: str):
    """Corpus bigram language model, surfaced as "most likely next word"
    for the top-20 first-words: exact (pair_count, w1_count) rationals,
    lexicographic tie-breaks; counts via _bigram_pair_counts."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = _bigram_pair_counts(ds)
    if len(pairs) == 0:
        return pd.DataFrame({"w1": [], "w1_count": [],
                             "next_word": [], "pair_count": []})
    firsts = (pairs.groupby("w1", as_index=False)["c"].sum()
              .rename(columns={"c": "w1_count"})
              .sort_values(["w1_count", "w1"], ascending=[False, True])
              .head(BIGRAM_TOP_N))
    best = (pairs.sort_values(["w1", "c", "w2"],
                              ascending=[True, False, True])
            .groupby("w1", as_index=False).first()
            .rename(columns={"w2": "next_word", "c": "pair_count"}))
    out = firsts.merge(best, on="w1").reset_index(drop=True)
    out["w1_count"] = out["w1_count"].astype(np.int64)
    out["pair_count"] = out["pair_count"].astype(np.int64)
    return out[["w1", "w1_count", "next_word", "pair_count"]]


PQ_SUBSPACES, PQ_SUB_DIMS = 4, 16     # 64-dim embeddings -> 4 x 16


def pq_encode_embeddings(sf_dir: str):
    """Product quantization of the embedding table — the vector-compression
    step that makes billion-vector ANN feasible (codes are M small ints vs
    dim floats). Codebooks are the integer-exact distributed k-means per
    16-dim subspace (k=4, 2 Lloyd iterations), the encode is one stateless
    streaming pass, and EVERY output — the 4 codes and the integer
    quantization error — is hash-exact against a DuckDB oracle that
    unrolls all four subspace k-means chains."""
    from rayschema.similarity import pq_encode, pq_train_codebooks

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cents = pq_train_codebooks(ds, m=PQ_SUBSPACES, sub_dims=PQ_SUB_DIMS)
    return pq_encode(ds, cents)


DECONTAM_MOD = 17          # bench set = doc_id % 17 == 7  (deterministic)
DECONTAM_SNIPPET_LEN = 32  # codepoints, mirrors SQL substr(text, 1, 32)


def _decontaminate(sf_dir: str, mod: int, residue: int):
    """Shared snippet-decontamination core: bench set = first 32 codepoints
    of every doc with doc_id % mod == residue; Decontaminator flags the
    carriers (auto-selecting match_substring vs the anchored Rabin-Karp
    index by snippet count)."""
    import ray

    from rayschema.text import Decontaminator

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pick_bench(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        text = b.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        long_enough = pc.fill_null(pc.greater_equal(
            pc.utf8_length(text), DECONTAM_SNIPPET_LEN), False)
        mask = (ids % mod == residue) & \
            long_enough.to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(mask))
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        return pa.table({
            "bench_id": t.column("doc_id").cast(pa.int64()),
            "snippet": pc.utf8_slice_codeunits(text, 0, DECONTAM_SNIPPET_LEN),
        })

    n_docs_cap = _table_rows(sf_dir, "documents")
    if n_docs_cap is not None and n_docs_cap <= EXACT_DEDUP_INPROC_CAP:
        # bench-set derivation off a driver parquet read under the
        # inproc cap (the _query_vecs row-filtered-read pattern, SAME
        # pick_bench kernel) — saves a whole Ray execution; the corpus
        # pass below stays distributed either way
        import pyarrow.dataset as pads

        bench = pick_bench(
            pads.dataset(os.path.join(sf_dir, "documents.parquet"))
            .to_table(columns=["doc_id", "text"])).to_pandas()
    else:
        bench = ds.map_batches(pick_bench,
                               batch_format="pyarrow").to_pandas()
    ref = ray.put((bench["bench_id"].to_numpy(np.int64),
                   list(bench["snippet"])))
    # no trailing sort: the verdict rows are set-compared downstream (the
    # driver compare sorts), so a doc_id sort would be a pure all-to-all tax
    return ds.map_batches(Decontaminator, batch_format="pyarrow",
                          fn_constructor_kwargs=dict(snippets_ref=ref),
                          concurrency=(1, 8))


def decontaminate_documents(sf_dir: str):
    """Benchmark decontamination: flag documents containing any snippet of
    the (deterministically-derived) benchmark set. The snippet set is
    metadata-sized (n/17 rows x 32 chars), pulled once on the driver and
    broadcast via ray.put; the corpus scan is one match_substring kernel
    per snippet per batch at this snippet count — past 100 snippets the
    Decontaminator automatically switches to its anchored Rabin-Karp
    index (see decontaminate_rk_documents, which drives that path)."""
    return _decontaminate(sf_dir, DECONTAM_MOD, 7)


def decontaminate_rk_documents(sf_dir: str):
    """The SAME snippet-containment semantics with a bench set sized past
    DECON_SCAN_MAX_SNIPPETS (doc_id % 4 == 1 -> n/4 snippets: 125 at
    sf0.01), so the driver check exercises the anchored Rabin-Karp
    multi-pattern path against the exact contains() oracle — the scale
    path as a hash-checked quantity, not just a unit test."""
    return _decontaminate(sf_dir, 4, 1)


NGRAM_DECONTAM_N = 8


def _doc_window_hashes(b: pa.Table, n: int):
    """(window_hash, doc_index) for every full n-token window of a batch
    (shared by ngram decontamination and the trainer export pipeline):
    words hash via the batch dictionary (hash the small dictionary once,
    map codes), windows via one rolling-hash pass, cross-doc windows
    masked out."""
    from rayschema.dedup import _rolling_hashes
    from rayschema.sketches import hash64
    from rayschema.text import _flatten_words_arrow

    col = b.column("text")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat, _, doc_idx = _flatten_words_arrow(col)
    if len(flat) < n:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    th = hash64(enc.dictionary.to_numpy(zero_copy_only=False))[codes]
    wh = _rolling_hashes(th, n)
    pos = np.arange(len(wh), dtype=np.int64)
    same_doc = doc_idx[pos] == doc_idx[pos + n - 1]
    return wh[same_doc], doc_idx[pos[same_doc]]


def ngram_decontaminate_documents(sf_dir: str, n: int = NGRAM_DECONTAM_N):
    """Token-n-gram decontamination — the GPT-3/13-gram-style scalable
    variant of benchmark decontamination: a doc is contaminated when any
    of its ``n``-token windows appears in ANY benchmark doc. Where the
    substring Decontaminator scans once per snippet (fine for a
    metadata-sized snippet set), this path is O(1) per window regardless
    of benchmark size: the benchmark's window HASHES broadcast as one
    sorted array, and the corpus pass does a vectorized searchsorted
    membership test. Output (doc_id, n_hit_windows) for contaminated
    NON-benchmark docs; window = 8 whitespace tokens joined by one space,
    so the oracle can rebuild the exact window TEXT via list slicing
    (64-bit hash collisions are the same accepted risk as
    dup_span_stats)."""
    import ray

    from rayschema.dedup import _rolling_hashes
    from rayschema.sketches import hash64
    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def window_hashes(b: pa.Table):
        return _doc_window_hashes(b, n)

    def _mod_mask(b: pa.Table, is_bench: bool) -> np.ndarray:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        m = ids % DECONTAM_MOD == 7
        return m if is_bench else ~m

    def bench_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(
            pc.is_valid(b.column("text")),
            pa.array(_mod_mask(b, True))))
        wh, _ = window_hashes(b)
        return pa.table({"h": pa.array(np.unique(wh).view(np.int64))})

    bench = (ds.map_batches(bench_partial, batch_format="pyarrow")
             .to_pandas())
    bench_h = np.unique(bench["h"].to_numpy(np.int64)) if len(bench) \
        else np.empty(0, np.int64)
    ref = ray.put(bench_h)

    def scan(b: pa.Table) -> pa.Table:
        bh = ray.get(ref)
        b = b.filter(pc.and_(
            pc.is_valid(b.column("text")),
            pa.array(_mod_mask(b, False))))
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "n_hit_windows": pa.array([], type=pa.int64())})
        if b.num_rows == 0 or len(bh) == 0:
            return empty
        wh, dd = window_hashes(b)
        if len(wh) == 0:
            return empty
        whs = wh.view(np.int64)
        p = np.searchsorted(bh, whs)
        p = np.clip(p, 0, len(bh) - 1)
        hit = bh[p] == whs
        if not hit.any():
            return empty
        counts = np.bincount(dd[hit], minlength=b.num_rows)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = counts > 0
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "n_hit_windows": pa.array(counts[keep].astype(np.int64)),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


REDACT_PATTERN = r"\b(key|hash)\b"   # stand-in PII pattern present in corpus
REDACT_REPLACEMENT = "<R>"


def regex_redact_documents(sf_dir: str):
    """Pattern scrubbing (the PII-redaction primitive): RE2 count + global
    replace, emitting (doc_id, n_matches, redacted_len). Demonstrated on a
    token pattern that actually occurs in this corpus; an email/phone
    pattern is the same one-kernel stage."""
    from functools import partial as fpartial

    from rayschema.text import redact_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        fpartial(redact_batch, pattern=REDACT_PATTERN,
                 replacement=REDACT_REPLACEMENT),
        batch_format="pyarrow")


def tfidf_top_term(sf_dir: str):
    """Per-document top TF-IDF term (idf = N/df variant so the ranking is a
    RATIONAL tf/df — reproducible bit-exactly in SQL float division).
    Stage 1 builds the corpus document-frequency table distributed
    (per-batch distinct (doc, word) -> partial df counts -> tiny groupby
    sum) and broadcasts it via ray.put; stage 2 is one stateless pass:
    per-batch (doc, word) tf counts, df lookup by searchsorted, argmax per
    doc with lexicographic tie-break. At web scale the df table is pruned
    to the top-K vocabulary before broadcast (documented cap)."""
    import ray

    from rayschema.text import _distinct_word_pairs, _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _doc_word(b: pa.Table):
        b = b.filter(pc.is_valid(b.column("text")))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return None, None, None
        flat, _, doc_idx = _flatten_words_arrow(col)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)[doc_idx]
        return _distinct_word_pairs(flat, ids)

    def df_partial(b: pa.Table) -> pa.Table:
        di, wi, _ = _doc_word(b)
        if di is None:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "df": pa.array([], type=pa.int64())})
        u, counts = np.unique(wi, return_counts=True)
        return pa.table({"word": pa.array(u, type=pa.string()),
                         "df": pa.array(counts.astype(np.int64))})

    df_tbl = (ds.map_batches(df_partial, batch_format="pyarrow")
              .groupby("word").sum("df").to_pandas())
    vocab = df_tbl["word"].to_numpy(object)
    dfs = df_tbl["sum(df)"].to_numpy(np.int64)
    order = np.argsort(vocab)
    vocab, dfs = vocab[order], dfs[order]
    ref = ray.put((vocab, dfs))

    def top_term(b: pa.Table) -> pa.Table:
        vocab_s, dfs_s = ray.get(ref)
        di, wi, tf = _doc_word(b)
        if di is None:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "top_word": pa.array([], type=pa.string()),
                             "tf": pa.array([], type=pa.int64()),
                             "df": pa.array([], type=pa.int64())})
        uw, inv = np.unique(wi, return_inverse=True)
        wrank = np.searchsorted(vocab_s, uw)[inv]
        df = dfs_s[wrank]
        score = tf / df   # float64 division == SQL tf::DOUBLE / df
        # primary doc asc, then score desc, then word asc (wrank IS the
        # lexicographic rank because vocab_s is sorted)
        o = np.lexsort((wrank, -score, di))
        d_s = di[o]
        first = np.ones(len(d_s), dtype=bool)
        first[1:] = d_s[1:] != d_s[:-1]
        sel = o[first]
        return pa.table({
            "doc_id": pa.array(di[sel], type=pa.int64()),
            "top_word": pa.array(wi[sel], type=pa.string()),
            "tf": pa.array(tf[sel]),
            "df": pa.array(df[sel]),
        })

    return ds.map_batches(top_term, batch_format="pyarrow")


P90_NUM, P90_DEN = 9, 10   # threshold rule: cum*DEN >= total*NUM (integer-exact)


def length_quantile_filter(sf_dir: str):
    """Docs at or above the exact corpus P90 of n_chars. The quantile is
    computed EXACTLY from a distributed value-count histogram (n_chars has
    a bounded domain): per-batch partial counts -> tiny groupby-sum ->
    driver cumulative scan picks the smallest L with cum*10 >= total*9
    (integer arithmetic, no float quantile semantics to match) -> the
    threshold pushes down into a stateless filter pass. The exact-histogram
    complement of the KLL sketch path in rayschema.sketches."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        v = b.column("n_chars").to_numpy(zero_copy_only=False)
        v = v[~pd.isna(v)].astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"n_chars": pa.array(u),
                         "cnt": pa.array(c.astype(np.int64))})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("n_chars").sum("cnt").to_pandas()
            .sort_values("n_chars"))
    counts = hist["sum(cnt)"].to_numpy(np.int64)
    vals = hist["n_chars"].to_numpy(np.int64)
    cum = np.cumsum(counts)
    total = int(cum[-1])
    thresh = int(vals[np.nonzero(cum * P90_DEN >= total * P90_NUM)[0][0]])

    def keep(b: pa.Table) -> pa.Table:
        v = b.column("n_chars")
        return b.filter(pc.fill_null(pc.greater_equal(v, thresh), False))

    return ds.map_batches(keep, batch_format="pyarrow")


CAP_PER_SOURCE = 50


def cap_per_source(sf_dir: str, cap: int = CAP_PER_SOURCE):
    """Per-source quota sampling: keep each source's ``cap`` lowest doc_ids
    (the deterministic domain-cap step of C4-style curation). Sources are
    FEW and HOT — each group spans many blocks — so a group shuffle (or a
    sorted_group_scan, whose boundary residual would be the whole corpus)
    is the wrong shape. Instead: a per-batch partial top-``cap`` combiner
    feeds a driver merge of at most blocks x sources x cap candidate ids;
    the per-source ``cap``-th-smallest doc_id thresholds broadcast into ONE
    stateless filter pass. No all-to-all at any scale; with unique doc_ids
    the threshold filter is exactly row_number() <= cap."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def partial(b: pa.Table) -> pa.Table:
        src = b.column("source").to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, src))
        s_s, i_s = src[order], ids[order]
        new = np.ones(len(s_s), dtype=bool)
        new[1:] = s_s[1:] != s_s[:-1]
        starts = np.flatnonzero(new)
        seg = np.repeat(starts, np.diff(np.append(starts, len(s_s))))
        keep = (np.arange(len(s_s)) - seg) < cap
        return pa.table({"source": pa.array(s_s[keep], type=pa.string()),
                         "doc_id": pa.array(i_s[keep])})

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    thr = (cand.sort_values(["source", "doc_id"])
           .groupby("source", sort=True)["doc_id"]
           .apply(lambda s: int(s.iloc[:cap].max())))
    srcs = thr.index.to_numpy(object)          # sorted by groupby(sort=True)
    ths = thr.to_numpy(np.int64)

    def keep_rows(b: pa.Table) -> pa.Table:
        src = b.column("source").to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(srcs, src)
        # every row's source appeared in its own batch partial, so the
        # lookup always hits; the clip only guards a pathological re-read
        pos = np.clip(pos, 0, len(srcs) - 1)
        ok = (srcs[pos] == src) & (ids <= ths[pos])
        return b.take(pa.array(np.flatnonzero(ok)))

    return ds.map_batches(keep_rows, batch_format="pyarrow")


def doc_rarity_score(sf_dir: str):
    """Per-doc commonness signal: the sum of corpus-wide occurrence counts
    over the doc's word positions plus its word count — the exact-rational
    (cf_sum / n_words) form of a mean-corpus-frequency quality score
    (integer outputs so the oracle hash-matches bit-for-bit; consumers
    divide). Stage 1 builds the corpus frequency table distributed
    (per-batch partial counts -> tiny groupby sum) and broadcasts the
    vocabulary via ray.put; stage 2 is one stateless pass with an Arrow
    index_in lookup + per-doc segment sum (C++ hash kernels end to end,
    no numpy-object strings). At web scale the vocab broadcast is pruned
    to the top-K words (documented cap, as in tfidf_top_term)."""
    import ray

    from rayschema.text import _flatten_words_arrow as _flat_words_arrow

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def cf_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "cf": pa.array([], type=pa.int64())})
        flat, _, _ = _flat_words_arrow(col)
        vc = pc.value_counts(flat)            # C++ hash table, zero-copy in
        return pa.table({"word": vc.field("values"),
                         "cf": vc.field("counts").cast(pa.int64())})

    cf_tbl = (ds.map_batches(cf_partial, batch_format="pyarrow")
              .groupby("word").sum("cf").to_pandas())
    vocab = pa.array(cf_tbl["word"], type=pa.string())
    cfs = cf_tbl["sum(cf)"].to_numpy(np.int64)
    ref = ray.put((vocab, cfs))

    def score(b: pa.Table) -> pa.Table:
        vocab_s, cfs_s = ray.get(ref)
        b = b.filter(pc.is_valid(b.column("text")))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "cf_sum": pa.array([], type=pa.int64()),
                             "n_words": pa.array([], type=pa.int64())})
        flat, n_words, doc_idx = _flat_words_arrow(col)
        # vectorized vocab lookup in C++ (every word is in the vocab by
        # construction, so no null handling needed on the indices)
        w_cf = cfs_s[pc.index_in(flat, value_set=vocab_s)
                     .to_numpy(zero_copy_only=False)]
        sums = np.zeros(n, dtype=np.int64)
        np.add.at(sums, doc_idx, w_cf)
        return pa.table({
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "cf_sum": pa.array(sums),
            "n_words": pa.array(n_words.astype(np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def kmeans_embeddings(sf_dir: str):
    """Distributed 2-iteration Lloyd k-means (k=4) over the embeddings
    table in the integer-exact quantized form — the iterative-ML-on-Ray
    pattern with a FULL DuckDB oracle (two unrolled assign/update CTE
    rounds); see similarity.kmeans_quantized for the arithmetic contract."""
    from rayschema.similarity import kmeans_quantized

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kmeans_quantized(ds, k=4, iters=2)


def knn_ivf_kmeans(sf_dir: str):
    """IVF ANN that is FULLY oracle-checked end to end — normally the IVF
    path only gets a rows-only check because sampling/float k-means make
    the buckets irreproducible in SQL. Here the codebook is the
    integer-exact distributed k-means (kmeans_embeddings), the
    vector-to-bucket assignment AND the per-query probe choice (nprobe=2
    of k=4) are integer squared-euclidean argmins with lowest-cluster
    tie-breaks, and the within-probe ranking is the exact-cosine
    convention the knn_bruteforce oracle already hash-matches. ONE
    streaming pass over the corpus computes assignment + probe-filtered
    local top-k per batch; the driver merges candidate sets (O(batches x
    k x queries))."""
    import ray

    from rayschema.dedup import round_half_away
    from rayschema.similarity import _normalize, kmeans_quantized

    K, NPROBE, TOPK = 4, 2, 10
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    km = kmeans_quantized(ds, k=K, iters=2)
    cent = (km.sort_values(["cluster", "d"])["c"]
            .to_numpy(np.int64).reshape(K, -1))

    qdf = _query_vecs(sf_dir, ["vec_id", "embedding"])
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qq = round_half_away(qmat * 1e6, 0).astype(np.int64)
    qdist = ((qq[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(qdist, axis=1, kind="stable")[:, :NPROBE]
    qn = _normalize(qmat)
    qids = qdf["vec_id"].to_numpy(np.int64)
    ref = ray.put((cent, probe, qn, qids))

    def topk(b: pa.Table) -> pa.Table:
        cent_, probe_, qn_, qids_ = ray.get(ref)
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        mat = np.stack(col.to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        qv = round_half_away(mat * 1e6, 0).astype(np.int64)
        dist = ((qv * qv).sum(axis=1)[:, None] - 2 * (qv @ cent_.T)
                + (cent_ * cent_).sum(axis=1)[None, :])
        assign = dist.argmin(axis=1)
        sims = _normalize(mat) @ qn_.T                      # (n, nq)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        out_q, out_id, out_cs = [], [], []
        for qi in range(len(qn_)):
            mask = np.isin(assign, probe_[qi])
            if not mask.any():
                continue
            vid, cs = ids[mask], sims[mask, qi]
            order = np.lexsort((vid, -cs))[:TOPK]
            out_q.append(np.full(len(order), qids_[qi], dtype=np.int64))
            out_id.append(vid[order])
            out_cs.append(cs[order])
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_id)),
                         "cosine": pa.array(np.concatenate(out_cs))})

    df = ds.map_batches(topk, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["query_id", "cosine", "vec_id"],
                        ascending=[True, False, True], kind="mergesort")
    df = df.groupby("query_id", as_index=False).head(TOPK) \
        .reset_index(drop=True)
    df["rank"] = (df.groupby("query_id").cumcount() + 1).astype(np.int64)
    df["cosine"] = round_half_away(df["cosine"].to_numpy(), 6)
    return df


def split_leakage_audit(sf_dir: str):
    """Driver-checked invariant: under the leakage-safe split no verified
    near-dup pair may straddle splits — the split follows the cluster
    representative BY CONSTRUCTION, and this query PROVES the property
    holds on the actual output (n_cross_split must be 0) instead of
    asserting it in prose. Composes split_by_cluster with the exact
    char-5-gram pair ground truth on the same doc_id < 300 scope; the
    oracle chains the same CTEs."""
    from rayschema.dedup import exact_jaccard_pairs

    sp = split_by_cluster(sf_dir).to_pandas()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = exact_jaccard_pairs(ds, id_limit=300, k=5,
                                threshold=0.5).to_pandas()
    n_cross = 0
    if len(pairs):
        m = dict(zip(sp["doc_id"].to_numpy(np.int64), sp["split"]))
        sa = pairs["id_a"].map(m)
        sb = pairs["id_b"].map(m)
        n_cross = int((sa != sb).sum())
    return pd.DataFrame([{"n_pairs": np.int64(len(pairs)),
                          "n_cross_split": np.int64(n_cross),
                          "n_docs": np.int64(len(sp))}])


CHUNK_SIZE, CHUNK_STRIDE = 200, 150


def chunk_documents(sf_dir: str, size: int = CHUNK_SIZE,
                    stride: int = CHUNK_STRIDE):
    """Fixed-size overlapping character chunking (the RAG / long-doc
    preprocessing step): doc i emits chunks starting at codepoints
    0, stride, 2*stride, ... while the start is inside the text, each
    ``size`` codepoints long (the last ones shorter). Fully stateless and
    shuffle-free; vectorized BY CHUNK ORDINAL — chunk j of every doc
    shares the same (start, stop), so each ordinal is one Arrow
    utf8_slice_codeunits call (codepoint slicing == SQL substr) over the
    docs still long enough. Max ordinal count is len/stride, so the loop
    is short and the per-call work is batch-wide."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = pc.utf8_length(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        parts = []
        j = 0
        while True:
            start = j * stride
            sel = np.flatnonzero(n > start)
            if len(sel) == 0:
                break
            idx = pa.array(sel)
            txt = pc.utf8_slice_codeunits(pc.take(col, idx),
                                          start=start, stop=start + size)
            parts.append(pa.table({
                "doc_id": pa.array(ids[sel]),
                "chunk_id": pa.array(np.full(len(sel), j, dtype=np.int64)),
                "chunk_text": txt,
            }))
            j += 1
        if not parts:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "chunk_id": pa.array([], type=pa.int64()),
                             "chunk_text": pa.array([], type=pa.string())})
        return pa.concat_tables(parts)

    return ds.map_batches(chunks, batch_format="pyarrow")


DUP_SPAN_K = 20


def dup_span_stats(sf_dir: str, k: int = DUP_SPAN_K):
    """Per-doc duplicated-span fraction in exact integer form — the
    cross-document substring-duplication signal of Lee et al.,
    "Deduplicating Training Data Makes Language Models Better" (2022,
    public): for every doc, the number of char ``k``-gram window POSITIONS
    whose window text occurs in >= 2 distinct documents, plus the total
    window count (consumers divide for the fraction).

    Pipeline: (1) one vectorized pass rolls a codepoint hash over each
    batch's flat text buffer and reduces to distinct (window-hash, doc,
    n_positions) rows — 24 B each, content never shuffles; (2) ONE
    sorted_group_scan on the 8-byte hash emits (doc, n_positions) for
    every hash held by >= 2 docs; (3) a tiny groupby-sum of those dup
    counts broadcasts into a stateless final pass that computes
    n_windows = max(len - k + 1, 0) per doc. At 100 TB step 3's broadcast
    (docs-with-dups ids+counts) becomes a hash join on doc_id — steps 1-2
    are unchanged. Codepoint windows == DuckDB substr windows, so the
    oracle is exact (64-bit hash collisions are the standard accepted
    risk, ~1e-9 at these scales)."""
    import ray

    from rayschema.dedup import (
        _codepoint_parts,
        _rolling_hashes,
        sorted_group_scan,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def windows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        empty = pa.table({"h": pa.array([], type=pa.int64()),
                          "doc_id": pa.array([], type=pa.int64()),
                          "npos": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        _, cpo, cps, _ = _codepoint_parts(col)
        if len(cps) < k:
            return empty
        hh = _rolling_hashes(cps, k)
        pos = np.arange(len(hh), dtype=np.int64)
        # same sliced-buffer guard as oph_signatures: positions outside
        # [cpo[0], cpo[-1]) belong to no row of THIS batch view and must
        # be masked BEFORE cpo[dd + 1] is indexed
        inside = (pos >= cpo[0]) & (pos + k <= cpo[-1])
        hh, pos = hh[inside], pos[inside]
        dd = np.searchsorted(cpo, pos, side="right") - 1
        ok = (dd >= 0) & (dd < b.num_rows) & (pos + k <= cpo[dd + 1])
        h, doc = hh[ok].view(np.int64), dd[ok]
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[doc]
        order = np.lexsort((h, ids))
        i_s, h_s = ids[order], h[order]
        new = np.ones(len(i_s), dtype=bool)
        new[1:] = (i_s[1:] != i_s[:-1]) | (h_s[1:] != h_s[:-1])
        starts = np.nonzero(new)[0]
        npos = np.diff(np.append(starts, len(i_s))).astype(np.int64)
        return pa.table({"h": pa.array(h_s[new]),
                         "doc_id": pa.array(i_s[new]),
                         "npos": pa.array(npos)})

    n_docs_cap = _table_rows(sf_dir, "documents")
    if n_docs_cap is not None and n_docs_cap <= EXACT_DEDUP_INPROC_CAP:
        # fused in-process path (the minhash-inproc discipline): the
        # SAME windows kernel over one table pull; a doc's text lives in
        # one batch either way, so ">= 2 rows per hash" means ">= 2
        # distinct docs" in both plans. Distributed scan stays past cap.
        import ray.data as rd

        t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
        w = windows(t)
        h = w.column("h").to_numpy(zero_copy_only=False)
        doc = w.column("doc_id").to_numpy(zero_copy_only=False)
        npos = w.column("npos").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        grp = np.ones(len(hs), dtype=bool)
        grp[1:] = hs[1:] != hs[:-1]
        starts = np.nonzero(grp)[0]
        sizes = np.diff(np.append(starts, len(hs)))
        sel = order[np.repeat(sizes >= 2, sizes)]
        dd, dn = doc[sel], npos[sel]
        if len(dd):
            ud, inv = np.unique(dd, return_inverse=True)
            sums = np.bincount(inv, weights=dn).astype(np.int64)
        else:
            ud = np.empty(0, np.int64)
            sums = np.empty(0, np.int64)
        tf = t.filter(pc.is_valid(t.column("text")))
        n_cp = pc.utf8_length(tf.column("text")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ids = tf.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ndup = np.zeros(len(ids), dtype=np.int64)
        if len(ud):
            p = np.clip(np.searchsorted(ud, ids), 0, len(ud) - 1)
            hit = ud[p] == ids
            ndup[hit] = sums[p[hit]]
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(ids),
            "n_windows": pa.array(np.maximum(n_cp - (k - 1), 0)),
            "n_dup_windows": pa.array(ndup)}))

    out_schema = pa.schema([("doc_id", pa.int64()), ("npos", pa.int64())])

    def block_fn(b: pa.Table, starts, ends, want) -> pa.Table:
        sizes = ends - starts
        sel = np.repeat(want, sizes)
        idx = pa.array(np.flatnonzero(sel))
        return pa.table({"doc_id": b.column("doc_id").take(idx),
                         "npos": b.column("npos").take(idx)})

    def group_fn(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return None
        return pa.table({"doc_id": t.column("doc_id"),
                         "npos": t.column("npos")})

    dup = sorted_group_scan(
        ds.map_batches(windows, batch_format="pyarrow"),
        ["h"], group_fn, out_schema,
        group_filter=lambda b, s, e: (e - s) >= 2,
        block_fn=block_fn, sort_blocks=32)
    dup_pd = dup.groupby("doc_id").sum("npos").to_pandas()
    if len(dup_pd):
        dup_ids = dup_pd["doc_id"].to_numpy(np.int64)
        o = np.argsort(dup_ids)
        dup_ids = dup_ids[o]
        dup_n = dup_pd["sum(npos)"].to_numpy(np.int64)[o]
    else:
        dup_ids = np.empty(0, np.int64)
        dup_n = np.empty(0, np.int64)
    ref = ray.put((dup_ids, dup_n))

    def finalize(b: pa.Table) -> pa.Table:
        ids_s, dups_s = ray.get(ref)
        b = b.filter(pc.is_valid(b.column("text")))
        n_cp = pc.utf8_length(b.column("text")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n_windows = np.maximum(n_cp - (k - 1), 0)
        ndup = np.zeros(len(ids), dtype=np.int64)
        if len(ids_s):
            p = np.searchsorted(ids_s, ids)
            p = np.clip(p, 0, len(ids_s) - 1)
            hit = ids_s[p] == ids
            ndup[hit] = dups_s[p[hit]]
        return pa.table({"doc_id": pa.array(ids),
                         "n_windows": pa.array(n_windows),
                         "n_dup_windows": pa.array(ndup)})

    return ds.map_batches(finalize, batch_format="pyarrow")


def dup_span_removal(sf_dir: str, k: int = DUP_SPAN_K,
                     id_limit: int = 300):
    """ExactSubstr span REMOVAL — the dedup step of Lee et al. 2022
    (dup_span_stats is its audit): every codepoint covered by a char
    ``k``-gram window whose text occurs in >= 2 distinct documents is cut,
    and the document is rebuilt from the uncovered codepoints. Emits
    (doc_id, clean_text, n_removed) for every scoped doc.

    Three passes, none of which ships text to the driver:
    1. the dup_span_stats window pass reduced further to distinct
       (window-hash, doc) 16-byte rows;
    2. ONE 8-byte-hash sorted scan emits each hash held by >= 2 docs;
    3. the dup-hash set broadcasts as one sorted array (dup-mass-sized;
       at 100 TB this side becomes a hash join / bloom pre-filter — the
       window pass is unchanged) into a stateless rebuild pass: re-roll
       each doc's window hashes, mark covered intervals with a
       diff-array cumsum (vectorized interval union), slice the
       surviving codepoints back into text.

    Scope doc_id < ``id_limit`` (the oracle-checkable scope, as for
    exact_jaccard_pairs: the oracle reconstructs clean_text itself via
    substr chars, so both sides stay tractable). Codepoint windows ==
    DuckDB substr windows; 64-bit hash collisions are the standard
    accepted risk."""
    import ray

    from rayschema.dedup import (
        _codepoint_parts,
        _rolling_hashes,
        sorted_group_scan,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def scoped(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pc.and_(pc.is_valid(b.column("text")),
                                pa.array(ids < id_limit)))

    def win_hashes(b: pa.Table):
        """(hash, position, doc-row) of every in-doc k-window of a batch."""
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        _, cpo, cps, _ = _codepoint_parts(col)
        if len(cps) < k:
            return None, cpo, cps
        hh = _rolling_hashes(cps, k)
        pos = np.arange(len(hh), dtype=np.int64)
        inside = (pos >= cpo[0]) & (pos + k <= cpo[-1])
        hh, pos = hh[inside], pos[inside]
        dd = np.searchsorted(cpo, pos, side="right") - 1
        ok = (dd >= 0) & (dd < b.num_rows) & (pos + k <= cpo[dd + 1])
        return (hh[ok].view(np.int64), pos[ok], dd[ok]), cpo, cps

    def distinct_pairs(b: pa.Table) -> pa.Table:
        b = scoped(b)
        empty = pa.table({"h": pa.array([], type=pa.int64()),
                          "doc_id": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        got, _, _ = win_hashes(b)
        if got is None:
            return empty
        h, _, doc = got
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[doc]
        order = np.lexsort((h, ids))
        i_s, h_s = ids[order], h[order]
        new = np.ones(len(i_s), dtype=bool)
        new[1:] = (i_s[1:] != i_s[:-1]) | (h_s[1:] != h_s[:-1])
        return pa.table({"h": pa.array(h_s[new]),
                         "doc_id": pa.array(i_s[new])})

    out_schema = pa.schema([("h", pa.int64())])

    def group_fn(t: pa.Table):
        if t.num_rows < 2:
            return None
        return pa.table({"h": t.column("h").slice(0, 1)})

    def block_fn(b: pa.Table, starts, ends, want):
        idx = starts[want.astype(bool)] if len(starts) else starts
        return pa.table({"h": b.column("h").take(pa.array(idx))})

    dup = sorted_group_scan(
        ds.map_batches(distinct_pairs, batch_format="pyarrow"),
        ["h"], group_fn, out_schema,
        group_filter=lambda b, s, e: (e - s) >= 2,
        block_fn=block_fn, sort_blocks=32)
    dup_h = np.sort(dup.to_pandas()["h"].to_numpy(np.int64))
    ref = ray.put(dup_h)

    def rebuild(b: pa.Table, _ref=ref) -> pa.Table:
        dh = ray.get(_ref)
        b = scoped(b)
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "clean_text": pa.array([], type=pa.string()),
                          "n_removed": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        got, cpo, cps = win_hashes(b)
        covered = np.zeros(len(cps) + 1, dtype=np.int64)
        if got is not None and len(dh):
            h, pos, _ = got
            p = np.clip(np.searchsorted(dh, h), 0, len(dh) - 1)
            hit = dh[p] == h
            dpos = pos[hit]
            np.add.at(covered, dpos, 1)
            np.add.at(covered, dpos + k, -1)
        cov = np.cumsum(covered[:-1]) > 0
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        texts, removed = [], []
        for i in range(b.num_rows):
            s, e = cpo[i], cpo[i + 1]
            m = cov[s:e]
            removed.append(int(m.sum()))
            kept = cps[s:e][~m]
            texts.append(kept.astype("<u4").tobytes()
                         .decode("utf-32-le") if len(kept) else "")
        return pa.table({"doc_id": pa.array(ids),
                         "clean_text": pa.array(texts, type=pa.string()),
                         "n_removed": pa.array(removed, type=pa.int64())})

    return ds.map_batches(rebuild, batch_format="pyarrow")


def inverted_index_words(sf_dir: str):
    """Mini inverted index: per word its document frequency and the full
    posting list (sorted doc_ids, comma-joined so the driver hash compare
    sees a scalar). Per-batch distinct (word, doc) pairs feed ONE
    sorted_group_scan keyed by the 64-bit word hash; each complete hash
    group assembles its words' postings in a vectorized pandas groupby
    (hash collisions sub-grouped by word). At web scale the same stage caps
    postings per word (top-K doc_ids) — the plumbing is unchanged."""
    from rayschema.dedup import sorted_group_scan
    from rayschema.sketches import hash64
    from rayschema.text import _distinct_word_pairs, _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({"uk": pa.array([], type=pa.int64()),
                             "word": pa.array([], type=pa.string()),
                             "doc_id": pa.array([], type=pa.int64())})
        flat, _, doc_idx = _flatten_words_arrow(col)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)[doc_idx]
        di, wi, _ = _distinct_word_pairs(flat, ids)
        return pa.table({
            "uk": pa.array(hash64(wi).view(np.int64)),
            "word": pa.array(wi, type=pa.string()),
            "doc_id": pa.array(di.astype(np.int64)),
        })

    def build_group(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"word": t.column("word").to_pandas(),
                           "doc_id": t.column("doc_id").to_pandas()})
        df = df.sort_values(["word", "doc_id"])
        g = df.groupby("word", sort=True)["doc_id"]
        agg = g.agg(df_cnt="size",
                    postings=lambda s: ",".join(map(str, s)))
        return pa.table({
            "word": pa.array(agg.index.to_numpy(object), type=pa.string()),
            "df": pa.array(agg["df_cnt"].to_numpy(np.int64)),
            "postings": pa.array(agg["postings"].to_numpy(object),
                                 type=pa.string()),
        })

    out_schema = pa.schema([("word", pa.string()), ("df", pa.int64()),
                            ("postings", pa.string())])
    return sorted_group_scan(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["uk"], build_group, out_schema,
        block_fn=lambda b, s, e, want: build_group(
            b.filter(pa.array(want[np.repeat(np.arange(len(s)), e - s)])))
        if want.any() else None)


EMB_SUM_DIMS = 8
EMB_Q = 1_000_000   # quantization: round(x * 1e6) -> BIGINT, order-free sums


def embedding_mean_by_lang(sf_dir: str):
    """Per-language embedding aggregate over the documents ⋈ embeddings
    hash join: row count + INTEGER-QUANTIZED component sums for the first 8
    dims (round(x*1e6)::BIGINT — summation-order-free, so the distributed
    sum hash-matches SQL exactly; the mean is sum/(n*1e6) downstream).
    Per-batch partial sums shrink the shuffle to (#langs x 10) rows."""
    from ray.data.aggregate import Sum

    from rayschema.dedup import _proj, round_half_away

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    docs = _proj(_read(sf_dir, "documents", columns=["doc_id", "lang"]),
                 {"doc_id": "vec_id", "lang": "lang"})

    def quant(b: pa.Table) -> pa.Table:
        # quantize BEFORE the join: the exchange then moves 8 BIGINTs per
        # row instead of the 64-float list (which Acero joins also reject
        # as a non-key payload type)
        mat = np.stack(b.column("embedding").to_pandas().to_numpy())
        q = round_half_away(mat[:, :EMB_SUM_DIMS].astype(np.float64) * EMB_Q,
                            0).astype(np.int64)
        return pa.table({"vec_id": b.column("vec_id").cast(pa.int64()),
                         **{f"q{k}": pa.array(q[:, k])
                            for k in range(EMB_SUM_DIMS)}})

    j = (emb.map_batches(quant, batch_format="pyarrow")
         .join(docs, join_type="inner", num_partitions=8, on=("vec_id",)))

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("lang")))
        if b.num_rows == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             **{f"s{k}": pa.array([], type=pa.int64())
                                for k in range(EMB_SUM_DIMS)}})
        q = np.stack([b.column(f"q{k}").to_numpy(zero_copy_only=False)
                      for k in range(EMB_SUM_DIMS)], axis=1)
        langs = b.column("lang").to_numpy(zero_copy_only=False)
        u, inv = np.unique(langs, return_inverse=True)
        sums = np.zeros((len(u), EMB_SUM_DIMS), dtype=np.int64)
        np.add.at(sums, inv, q)
        return pa.table({
            "lang": pa.array(u, type=pa.string()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            **{f"s{k}": pa.array(sums[:, k]) for k in range(EMB_SUM_DIMS)},
        })

    return (j.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("n", alias_name="n"),
                       *[Sum(f"s{k}", alias_name=f"s{k}")
                         for k in range(EMB_SUM_DIMS)]))


def pack_sequences_documents(sf_dir: str):
    """Sequence packing (concat-then-cut, GPT-style pretraining layout):
    every doc's (seq_id, offset_in_seq) under 512-token sequences, computed
    by the distributed global prefix sum in rayschema.pack — shard sums +
    driver exclusive prefix + one within-shard cumsum scan."""
    from rayschema.pack import pack_sequences

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return pack_sequences(ds, seq_len=512)


def vocabulary_top_words(sf_dir: str):
    """Corpus vocabulary build: global per-(lang, word) frequencies with
    per-batch PARTIAL counts before the (tiny, #langs x #words groups)
    groupby-sum shuffle, then per-lang top-10 by (count desc, word asc).
    The explode+count heavy phase is fully distributed; the ranked final
    table is metadata-sized by construction (distinct words, not rows)."""
    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("text")),
                             pc.is_valid(b.column("lang"))))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "word": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        flat, _, doc_idx = _flatten_words_arrow(col)
        langs = pc.take(b.column("lang"), pa.array(doc_idx))
        # Arrow's C++ hash aggregation — no pandas object-groupby detour
        g = (pa.table({"lang": langs, "word": flat})
             .group_by(["lang", "word"]).aggregate([([], "count_all")]))
        return pa.table({"lang": g.column("lang"),
                         "word": g.column("word"),
                         "n": g.column("count_all").cast(pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["lang", "word"]).sum("n"))
    # final ranking over the metadata-sized (lang, word) count table
    df = agg.to_pandas().rename(columns={"sum(n)": "n"})
    df = df.sort_values(["lang", "n", "word"],
                        ascending=[True, False, True], kind="mergesort")
    df["rk"] = df.groupby("lang").cumcount() + 1
    out = df[df["rk"] <= 10].reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    out["rk"] = out["rk"].astype(np.int64)
    return out[["lang", "word", "n", "rk"]]


# --------------------------------------------------------------------------- relational coverage
def pricing_summary(sf_dir: str):
    """TPC-H Q1 analog with exact integer-cents sums; partial agg per batch
    before the (6-group) shuffle."""
    from ray.data.aggregate import Sum

    import pyarrow.dataset as pads
    import ray.data as rd

    # row filter pushed to the parquet read: only matching row groups/rows
    # are decoded (the date cut prunes at the scan, not in a later stage).
    # The cutoff scalar is built FROM THE FILE SCHEMA so the pushdown adapts
    # to however l_shipdate was written (timestamp[us/ns], date32, tz-aware)
    # instead of pinning timestamp[us] and failing the read on other units.
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "lineitem.parquet")
    ship_t = pq.read_schema(path).field("l_shipdate").type
    if pa.types.is_date(ship_t):
        import datetime as _dt

        cutoff_scalar = pa.scalar(_dt.date(1998, 9, 1), type=ship_t)
    elif pa.types.is_timestamp(ship_t):
        cutoff_scalar = pa.scalar(
            pd.Timestamp("1998-09-01", tz=ship_t.tz), type=ship_t)
    else:   # stored as string or something exotic: no pushdown, filter later
        cutoff_scalar = None
    kw = {} if cutoff_scalar is None else dict(
        filter=pads.field("l_shipdate") <= cutoff_scalar)
    ds = rd.read_parquet(
        path,
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"], **kw)

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        ship = pd.to_datetime(df["l_shipdate"])
        cutoff = pd.Timestamp("1998-09-01")
        tz = getattr(ship.dt, "tz", None)
        if tz is not None:
            cutoff = cutoff.tz_localize(tz)
        df = df[ship <= cutoff]
        if not len(df):
            return pa.table({"l_returnflag": pa.array([], type=pa.string()),
                             "l_linestatus": pa.array([], type=pa.string()),
                             "sum_qty": pa.array([], type=pa.int64()),
                             "sum_base_price_cents": pa.array([], type=pa.int64()),
                             "sum_disc_price_e4": pa.array([], type=pa.int64()),
                             "count_order": pa.array([], type=pa.int64())})
        df["sum_qty"] = np.floor(df["l_quantity"].to_numpy()).astype(np.int64)
        df["sum_base_price_cents"] = _cents(df["l_extendedprice"])
        disc = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64) * \
            np.round((1 - df["l_discount"].to_numpy()) * 100).astype(np.int64)
        df["sum_disc_price_e4"] = disc
        g = (df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
               .agg(sum_qty=("sum_qty", "sum"),
                    sum_base_price_cents=("sum_base_price_cents", "sum"),
                    sum_disc_price_e4=("sum_disc_price_e4", "sum"),
                    count_order=("l_returnflag", "size")))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["l_returnflag", "l_linestatus"])
              .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                         Sum("sum_base_price_cents", alias_name="sum_base_price_cents"),
                         Sum("sum_disc_price_e4", alias_name="sum_disc_price_e4"),
                         Sum("count_order", alias_name="count_order")))


def top_revenue_customers(sf_dir: str):
    """Orders aggregated per customer (integer cents), customer names joined
    from the BROADCAST small side, top 10 by revenue (tie-break c_custkey)."""
    import ray
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"o_custkey": b.column("o_custkey").to_pandas()})
        df["revenue_cents"] = _cents(b.column("o_totalprice").to_pandas())
        g = df.groupby("o_custkey", as_index=False)["revenue_cents"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_cust = (orders.map_batches(partial, batch_format="pyarrow")
                .groupby("o_custkey")
                .aggregate(Sum("revenue_cents", alias_name="revenue_cents")))
    top = per_cust.sort(["revenue_cents", "o_custkey"], descending=[True, False]).limit(10)
    # name lookup AFTER the limit: only the 10 winner keys are read
    # back, and the customer read is row-filtered to exactly those
    # keys — never a whole-table dict broadcast for a 10-row result
    top_tab = pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
    winners = top_tab.column("o_custkey").to_pylist()
    import pyarrow.dataset as pads
    import ray.data as rd

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
        filter=pads.field("c_custkey").isin(winners)).to_pandas()
    lookup = dict(zip(cust["c_custkey"], cust["c_name"]))
    names = [lookup.get(k) for k in winners]
    out = (top_tab.rename_columns(["c_custkey", "revenue_cents"])
           .append_column("c_name", pa.array(names, type=pa.string())))
    return rd.from_arrow(out)


def events_hourly_window(sf_dir: str):
    """Tumbling 1-hour window per user: event count + integer-cents value sum."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = ts // 3_600_000_000
        df = pd.DataFrame({
            "user_id": b.column("user_id").to_pandas(),
            "hour_bucket": hour,
            "value_cents": _cents(b.column("value").to_pandas()),
        })
        g = (df.groupby(["user_id", "hour_bucket"], as_index=False)
               .agg(n_events=("value_cents", "size"),
                    sum_value_cents=("value_cents", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["user_id", "hour_bucket"])
              .aggregate(Sum("n_events", alias_name="n_events"),
                         Sum("sum_value_cents", alias_name="sum_value_cents")))


def events_sliding_window(sf_dir: str):
    """SLIDING window per user: 2-hour windows advancing 1 hour — each event
    lands in two windows (start = its hour, and the hour before). Implemented
    as a per-batch window explode + partial aggregate before the one
    (user_id, window_start) shuffle; SQL mirror is a UNION ALL self-append."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = ts // 3_600_000_000
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        cents = _cents(b.column("value").to_pandas())
        df = pd.DataFrame({
            "user_id": np.concatenate([uid, uid]),
            "window_start": np.concatenate([hour, hour - 1]),
            "cents": np.concatenate([cents, cents]),
        })
        g = (df.groupby(["user_id", "window_start"], as_index=False)
               .agg(n_events=("cents", "size"), sum_value_cents=("cents", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["user_id", "window_start"])
              .aggregate(Sum("n_events", alias_name="n_events"),
                         Sum("sum_value_cents", alias_name="sum_value_cents")))


def part_brand_stats(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _read(sf_dir, "part", columns=["p_brand", "p_size", "p_retailprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": b.column("p_brand"),
            "p_size": b.column("p_size").cast(pa.int64()),
            "price_cents": pa.array(_cents(b.column("p_retailprice").to_pandas())),
        })

    return (ds.map_batches(prep, batch_format="pyarrow")
              .groupby("p_brand")
              .aggregate(Count("p_size", alias_name="n", ignore_nulls=True),
                         Min("p_size", alias_name="min_size"),
                         Max("p_size", alias_name="max_size"),
                         Sum("price_cents", alias_name="sum_price_cents")))


def nation_region_join(sf_dir: str):
    """Broadcast hash join: every nation with its region name."""
    import ray

    region = _read(sf_dir, "region").to_pandas()
    ref = ray.put(dict(zip(region["r_regionkey"], region["r_name"])))

    def attach(b: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        rk = b.column("n_regionkey").to_pylist()
        return pa.table({
            "n_name": b.column("n_name"),
            "r_name": pa.array([lookup.get(k) for k in rk], type=pa.string()),
        })

    return _read(sf_dir, "nation").map_batches(attach, batch_format="pyarrow")


def lineitem_topk(sf_dir: str):
    """Top 10 line items by extended price (deterministic tie-break)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_linenumber": b.column("l_linenumber").cast(pa.int64()),
            "price_cents": pa.array(_cents(b.column("l_extendedprice").to_pandas())),
        })

    return (ds.map_batches(prep, batch_format="pyarrow")
              .sort(["price_cents", "l_orderkey", "l_linenumber"],
                    descending=[True, False, False])
              .limit(10))


def distinct_mktsegment(sf_dir: str):
    import ray.data as rd

    vals = _read(sf_dir, "customer", columns=["c_mktsegment"]).unique("c_mktsegment")
    return pd.DataFrame({"c_mktsegment": sorted(vals)})


def orders_priority_count(sf_dir: str):
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Count

    # predicate pushed into the parquet scan (row-group pruning at the read)
    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderpriority", "o_totalprice"],
                         filter=pads.field("o_totalprice") > 100000.0)
    return (ds.filter(expr="o_totalprice > 100000.0")
              .groupby("o_orderpriority")
              .aggregate(Count("o_totalprice", alias_name="n")))


def order_revenue_join(sf_dir: str):
    """Large-large HASH JOIN: lineitem ⋈ orders on o_orderkey (both sides
    shuffle-partitioned by Ray's Dataset.join), then revenue per order
    priority. At 100 TB this is the hash-partitioned exchange path; small
    dimension tables use the broadcast path instead (nation_region_join)."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])

    def li_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "price_cents": pa.array(_cents(b.column("l_extendedprice").to_pandas())),
        })

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    # partition count scales with input size (~128 MB of build+probe bytes
    # per partition, parquet metadata only — no read), not a fixed knob
    est_bytes = (li.size_bytes() or 0) + (orders.size_bytes() or 0)
    n_parts = int(min(256, max(8, est_bytes // (128 << 20) + 8)))
    joined = li.map_batches(li_prep, batch_format="pyarrow").join(
        orders, join_type="inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"o_orderpriority": b.column("o_orderpriority").to_pandas(),
                           "revenue_cents": b.column("price_cents").to_pandas()})
        g = (df.groupby("o_orderpriority", as_index=False)
               .agg(revenue_cents=("revenue_cents", "sum"), n_items=("revenue_cents", "size")))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                       Sum("n_items", alias_name="n_items")))


def events_orders_asof(sf_dir: str):
    """AS-OF JOIN (backward, inclusive): each event looks up the LATEST
    order of its user at-or-before the event's cut time — the point-in-time
    feature-lookup primitive Ray Data lacks natively (rayschema.joins.
    asof_join: one union + one key/time sort, vectorized running-max match).
    Because the synthetic order dates (1995-2001) all precede the event
    timestamps (2024), the cut time is derived deterministically from the
    event ts MAPPED INTO the order-date window (pure epoch-µs arithmetic,
    mirrored exactly in SQL) so matches genuinely vary per event. Ties on
    order date break to the max orderkey. LEFT semantics: events whose cut
    precedes their user's first order keep null order columns."""
    from rayschema.joins import asof_join

    BASE = pd.Timestamp("1995-01-01").value // 1000
    SPAN = pd.Timestamp("2001-08-02").value // 1000 - BASE

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def prep_e(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "k": b.column("user_id").cast(pa.int64()),
            "cut_us": pa.array(BASE + (ts % SPAN)),
            "event_id": b.column("event_id").cast(pa.int64()),
        })

    od = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def prep_o(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": b.column("o_custkey").cast(pa.int64()),
            "ots_us": b.column("o_orderdate").cast(pa.int64()),
            "asof_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "asof_price_cents": pa.array(_cents(
                b.column("o_totalprice").to_pandas())),
        })

    return asof_join(
        ev.map_batches(prep_e, batch_format="pyarrow"),
        od.map_batches(prep_o, batch_format="pyarrow"),
        key_col="k", left_ts_col="cut_us", right_ts_col="ots_us",
        left_keep={"event_id": pa.int64()},
        right_keep={"asof_orderkey": pa.int64(),
                    "asof_price_cents": pa.int64()},
        tie_col="asof_orderkey")


def events_orders_range(sf_dir: str):
    """RANGE (interval) join: each event matched to EVERY order of its user
    whose 180-day window [o_orderdate, o_orderdate + 180d] contains the
    event's cut time (same deterministic cut mapping as events_orders_asof).
    rayschema.joins.range_join: one union + one key/time sort + a sweep-line
    kernel over per-key open intervals — O(rows + output), not a nested
    loop. INNER semantics; mirrored by a DuckDB BETWEEN join."""
    from rayschema.joins import range_join

    BASE = pd.Timestamp("1995-01-01").value // 1000
    SPAN = pd.Timestamp("2001-08-02").value // 1000 - BASE
    WIN_US = 180 * 86_400_000_000

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def prep_e(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "k": b.column("user_id").cast(pa.int64()),
            "cut_us": pa.array(BASE + (ts % SPAN)),
            "event_id": b.column("event_id").cast(pa.int64()),
        })

    od = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def prep_o(b: pa.Table) -> pa.Table:
        start = b.column("o_orderdate").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "k": b.column("o_custkey").cast(pa.int64()),
            "start_us": pa.array(start),
            "end_us": pa.array(start + WIN_US),
            "range_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "range_price_cents": pa.array(_cents(
                b.column("o_totalprice").to_pandas())),
        })

    return range_join(
        ev.map_batches(prep_e, batch_format="pyarrow"),
        od.map_batches(prep_o, batch_format="pyarrow"),
        key_col="k", left_ts_col="cut_us",
        right_start_col="start_us", right_end_col="end_us",
        right_id_col="range_orderkey",
        left_keep={"event_id": pa.int64()},
        right_keep={"range_orderkey": pa.int64(),
                    "range_price_cents": pa.int64()})


def top_orders_per_customer(sf_dir: str):
    """Top-3 orders by price PER CUSTOMER (the grouped top-N window
    pattern): one (custkey, -price, orderkey) sort via sorted_group_scan,
    then a fully vectorized first-3-per-group slice in the block kernel —
    no per-group Python, no full materialization; mirrored by a
    row_number() oracle."""
    from rayschema.dedup import sorted_group_scan

    N = 3
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        cents = _cents(b.column("o_totalprice").to_pandas())
        return pa.table({
            "o_custkey": b.column("o_custkey").cast(pa.int64()),
            "neg_price": pa.array(-cents),
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "price_cents": pa.array(cents),
        })

    def block_fn(b: pa.Table, starts, ends, want) -> pa.Table:
        sizes = ends - starts
        seg = np.repeat(starts, sizes)
        offs = np.arange(len(seg), dtype=np.int64) - seg
        sel = (offs < N) & np.repeat(want, sizes)
        idx = pa.array(np.flatnonzero(sel))
        return pa.table({
            "o_custkey": b.column("o_custkey").take(idx),
            "o_orderkey": b.column("o_orderkey").take(idx),
            "price_cents": b.column("price_cents").take(idx),
            "rank": pa.array(offs[np.flatnonzero(sel)] + 1),
        })

    def group_fn(t: pa.Table) -> pa.Table:
        m = min(N, t.num_rows)
        return pa.table({
            "o_custkey": t.column("o_custkey").slice(0, m),
            "o_orderkey": t.column("o_orderkey").slice(0, m),
            "price_cents": t.column("price_cents").slice(0, m),
            "rank": pa.array(np.arange(1, m + 1, dtype=np.int64)),
        })

    out_schema = pa.schema([("o_custkey", pa.int64()),
                            ("o_orderkey", pa.int64()),
                            ("price_cents", pa.int64()),
                            ("rank", pa.int64())])
    return sorted_group_scan(ds.map_batches(prep, batch_format="pyarrow"),
                             ["o_custkey"], group_fn, out_schema,
                             block_fn=block_fn, sort_blocks=32,
                             order_cols=["neg_price", "o_orderkey"])


def quality_rank_in_source(sf_dir: str):
    """FULL-cardinality per-group window rank — the "rank every doc by
    quality within its source" step of a per-source budget cut (the
    head-only variant is top_orders_per_customer; global_sort_rank is the
    ungrouped variant). Emits (doc_id, source, rnk, n_in_source) for
    every doc: rnk = 1-based rank of (-n_chars, doc_id) within source,
    n_in_source = the group size (so a consumer keeps rnk <= quota *
    n_in_source without another pass). ONE (source, -n_chars, doc_id)
    sort via sorted_group_scan; ranks and group sizes are vectorized per
    block. Mirrors a row_number()/count() OVER (PARTITION BY source)
    oracle."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "source", "n_chars"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("source")),
                             pc.is_valid(b.column("n_chars"))))
        nc = b.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "source": b.column("source"),
            "neg_chars": pa.array(-nc),
            "doc_id": b.column("doc_id").cast(pa.int64()),
        })

    def block_fn(b: pa.Table, starts, ends, want) -> pa.Table:
        sizes = ends - starts
        sel = np.repeat(want, sizes)
        seg = np.repeat(starts, sizes)
        rnk = np.arange(len(seg), dtype=np.int64) - seg + 1
        nsz = np.repeat(sizes.astype(np.int64), sizes)
        idx = pa.array(np.flatnonzero(sel))
        neg = b.column("neg_chars").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b.column("doc_id").take(idx),
            "source": b.column("source").take(idx),
            "n_chars": pa.array(-neg[np.flatnonzero(sel)]),
            "rnk": pa.array(rnk[np.flatnonzero(sel)]),
            "n_in_source": pa.array(nsz[np.flatnonzero(sel)]),
        })

    def group_fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        neg = t.column("neg_chars").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "source": t.column("source"),
            "n_chars": pa.array(-neg),
            "rnk": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "n_in_source": pa.array(np.full(n, n, dtype=np.int64)),
        })

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("source", pa.string()),
                            ("n_chars", pa.int64()),
                            ("rnk", pa.int64()),
                            ("n_in_source", pa.int64())])
    return sorted_group_scan(ds.map_batches(prep, batch_format="pyarrow"),
                             ["source"], group_fn, out_schema,
                             block_fn=block_fn, sort_blocks=32,
                             order_cols=["neg_chars", "doc_id"])


def value_quartile_by_type(sf_dir: str):
    """NTILE(4) value quartiles within each event_type, aggregated to
    (event_type, quartile, n_events, sum_cents). Event types are FEW and
    HOT — a type-keyed group scan would pull every boundary group (the
    whole corpus) to the driver — so this composes the two-phase
    histogram rank (the shuffle_shard shape): phase 1 folds (type,
    cents-bucket) counts to exact per-bucket exclusive offsets + per-type
    NTILE cumulative boundaries (extra rows to earlier buckets, DuckDB
    semantics); phase 2 is ONE (type, bucket)-keyed sorted scan ordered
    by (cents, event_id) whose block kernel turns offset + position into
    the exact global rank, maps it through the broadcast boundaries, and
    emits per-(type, quartile) partials — <= 4 x n_types rows per block,
    folded by a tiny groupby."""
    from ray.data.aggregate import Sum

    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["event_type", "value", "event_id"])
    types = sorted(t for t in ds.unique("event_type") if t is not None)
    tpos = {t: i for i, t in enumerate(types)}
    BSHIFT = 8

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("event_type")),
                             pc.is_valid(b.column("value"))))
        et = b.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        lut = np.array([tpos.get(v, -1) for v in
                        enc.dictionary.to_pylist()] + [-1], dtype=np.int64)
        idx = pc.fill_null(enc.indices, len(lut) - 1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tc = lut[idx]
        cents = np.round(b.column("value").to_numpy(zero_copy_only=False)
                         .astype(np.float64) * 100).astype(np.int64)
        t = pa.table({"tc": pa.array(tc),
                      "bucket": pa.array(cents >> BSHIFT),
                      "cents": pa.array(cents),
                      "event_id": b.column("event_id").cast(pa.int64())})
        return t.filter(pc.greater_equal(t.column("tc"), 0))

    tagged = ds.map_batches(prep, batch_format="pyarrow")

    def hpartial(b: pa.Table) -> pa.Table:
        g = b.group_by(["tc", "bucket"]).aggregate([([], "count_all")])
        return g.select(['tc', 'bucket', 'count_all']).rename_columns(["tc", "bucket", "cnt"])

    hist = (tagged.map_batches(hpartial, batch_format="pyarrow")
            .to_pandas().groupby(["tc", "bucket"], as_index=False)
            ["cnt"].sum().sort_values(["tc", "bucket"]))
    tcs = hist["tc"].to_numpy(np.int64)
    bks = hist["bucket"].to_numpy(np.int64)
    cnts = hist["cnt"].to_numpy(np.int64)
    cum = np.cumsum(cnts)
    ex = np.concatenate([[0], cum[:-1]])
    first = np.ones(len(tcs), dtype=bool)
    first[1:] = tcs[1:] != tcs[:-1]
    base = np.maximum.accumulate(np.where(first, ex, 0))
    off = ex - base                    # within-type exclusive offset
    packed = (tcs << 32) | bks
    order = np.argsort(packed)
    packed_s, off_s = packed[order], off[order]
    # per-type totals -> NTILE(4) cumulative boundaries
    n_type = np.zeros(len(types), dtype=np.int64)
    np.add.at(n_type, tcs, cnts)
    bounds = np.zeros((len(types), 4), dtype=np.int64)
    for t in range(len(types)):
        n = int(n_type[t])
        small, rem = divmod(n, 4)
        sizes = np.array([small + 1] * rem + [small] * (4 - rem),
                         dtype=np.int64)
        bounds[t] = np.cumsum(sizes)

    def block_fn(block: pa.Table, starts, ends, want):
        sizes = (ends - starts).astype(np.int64)
        sel = np.repeat(want.astype(bool), sizes)
        if not sel.any():
            return None
        seg = np.repeat(starts, sizes)
        pos_in = np.arange(len(seg), dtype=np.int64) - seg
        tc = block.column("tc").to_numpy(zero_copy_only=False)
        bk = block.column("bucket").to_numpy(zero_copy_only=False)
        cents = block.column("cents").to_numpy(zero_copy_only=False)
        key = (tc << 32) | bk
        rank = off_s[np.searchsorted(packed_s, key)] + pos_in + 1
        quart = np.empty(len(tc), dtype=np.int64)
        for t in np.unique(tc):
            m = tc == t
            quart[m] = np.searchsorted(bounds[t], rank[m], side="left") + 1
        t4 = tc[sel] * 4 + (quart[sel] - 1)
        n_cells = len(types) * 4
        cnt = np.bincount(t4, minlength=n_cells).astype(np.int64)
        csum = np.zeros(n_cells, dtype=np.int64)
        np.add.at(csum, t4, cents[sel])
        nz = cnt > 0
        cells = np.flatnonzero(nz)
        return pa.table({
            "event_type": pa.array([types[c // 4] for c in cells],
                                   type=pa.string()),
            "quartile": pa.array(cells % 4 + 1),
            "n_events": pa.array(cnt[nz]),
            "sum_cents": pa.array(csum[nz])})

    def group_fn(t: pa.Table):
        n = t.num_rows
        starts = np.array([0], dtype=np.int64)
        ends = np.array([n], dtype=np.int64)
        return block_fn(t, starts, ends, np.array([True]))

    out_schema = pa.schema([("event_type", pa.string()),
                            ("quartile", pa.int64()),
                            ("n_events", pa.int64()),
                            ("sum_cents", pa.int64())])
    parts = sorted_group_scan(tagged, ["tc", "bucket"], group_fn,
                              out_schema, block_fn=block_fn,
                              sort_blocks=32,
                              order_cols=["cents", "event_id"])
    return (parts.groupby(["event_type", "quartile"])
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("sum_cents", alias_name="sum_cents")))


WEIGHTED_SAMPLE_K = 200


def weighted_sample_documents(sf_dir: str, k: int = WEIGHTED_SAMPLE_K):
    """Deterministic WEIGHTED sampling without replacement — the
    integer-exact surrogate of the A-ES/A-ExpJ priority rule (keys
    u^(1/w)): priority = (hash(doc_id) * n_chars) with hash the 32-bit
    multiplicative mix used by shuffle-shard, so longer docs win
    proportionally more often yet the draw is reproducible and
    SQL-recomputable in pure BIGINT arithmetic. Keep the global top-k by
    (priority DESC, doc_id): per-block local top-k partials -> blocks x k
    driver merge (the lineitem_topk shape, no global sort). Emits
    (doc_id, priority)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def prio(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("n_chars")))
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        w = b.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = ((ids * np.uint64(SHUF_KNUTH) + np.uint64(SHUF_SEED))
             % np.uint64(SHUF_MOD)).astype(np.int64)
        keep = w > 0
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64)[keep]),
            "priority": pa.array((h * w)[keep]),
        })

    return (ds.map_batches(prio, batch_format="pyarrow")
            .sort(["priority", "doc_id"], descending=[True, False])
            .limit(k))


BM25_TERMS = ("key", "hash", "table", "sort", "batch")
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(sf_dir: str):
    """BM25 retrieval scoring for a fixed query — the inverted-index
    family's ranking step. LOG-FREE variant: idf is the raw Robertson
    ratio (2N-2df+1)/(2df+1) instead of its logarithm, so every operation
    on both sides is IEEE +,*,/ over integer-derived doubles evaluated in
    the identical order — bit-deterministic without trusting two libm
    implementations to agree (ln is the only non-exactly-rounded piece of
    standard BM25).

    Two passes: (1) per-batch (df per term, n_docs, sum_dl) partials fold
    on the driver (11 numbers) and broadcast; (2) a stateless pass
    computes tf via one split kernel + index_in, dl, and the 5-term score
    summed left-to-right exactly as the SQL expression. Emits every doc
    matching >= 1 term as (doc_id, bm25) rounded half-away to 6."""
    import ray

    from rayschema.dedup import round_half_away
    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    terms = pa.array(list(BM25_TERMS))

    def stats_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        if b.num_rows == 0:
            z = np.zeros(1, dtype=np.int64)
            return pa.table({"n": pa.array(z), "s": pa.array(z),
                             **{f"df{i}": pa.array(z)
                                for i in range(len(BM25_TERMS))}})
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, n_words, doc_idx = _flatten_words_arrow(col)
        ti = pc.index_in(flat, value_set=terms) \
            .to_numpy(zero_copy_only=False)
        out = {"n": pa.array([np.int64(b.num_rows)]),
               "s": pa.array([n_words.astype(np.int64).sum()])}
        for i in range(len(BM25_TERMS)):
            m = ti == i
            out[f"df{i}"] = pa.array(
                [np.int64(len(np.unique(doc_idx[m])))])
        return pa.table(out)

    st = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_docs = int(st["n"].sum())
    sum_dl = int(st["s"].sum())
    dfs = [int(st[f"df{i}"].sum()) for i in range(len(BM25_TERMS))]
    ref = ray.put((n_docs, sum_dl, dfs))

    def score(b: pa.Table, _ref=ref) -> pa.Table:
        N, S, df = ray.get(_ref)
        b = b.filter(pc.is_valid(b.column("text")))
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "bm25": pa.array([], type=pa.float64())})
        if b.num_rows == 0 or N == 0:
            return empty
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, n_words, doc_idx = _flatten_words_arrow(col)
        dl = n_words.astype(np.float64)
        avgdl = S * 1.0 / N
        ti = pc.index_in(flat, value_set=terms) \
            .to_numpy(zero_copy_only=False)
        total = np.zeros(b.num_rows, dtype=np.float64)
        any_tf = np.zeros(b.num_rows, dtype=bool)
        # left-to-right term sum, each term the EXACT SQL expression
        for i in range(len(BM25_TERMS)):
            tf = np.bincount(doc_idx[ti == i],
                             minlength=b.num_rows).astype(np.float64)
            idf = (2.0 * N - 2.0 * df[i] + 1.0) / (2.0 * df[i] + 1.0)
            denom = tf + BM25_K1 * (0.25 + BM25_B * (dl / avgdl))
            term = np.where(tf > 0.0, idf * (tf * 2.2) / denom, 0.0)
            total = total + term
            any_tf |= tf > 0.0
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids[any_tf]),
            "bm25": pa.array(round_half_away(total[any_tf], 6))})

    return ds.map_batches(score, batch_format="pyarrow")


def event_type_cooccurrence(sf_dir: str):
    """Market-basket support counts: for every unordered event-type pair
    (a < b lexicographically), the number of USERS that emitted both —
    the association-mining primitive. ONE user-keyed sorted scan computes
    each complete user's distinct-type BITMASK (types dictionary-encoded
    against the sorted global type list, reduceat OR via add on distinct
    flags), then per-batch pair partials (<= 10 pairs here) fold through
    a tiny groupby. Integer-exact; user sets never leave the workers."""
    from ray.data.aggregate import Sum

    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    # global type list: tiny distinct (few event types by construction)
    types = sorted(t for t in
                   ds.unique("event_type") if t is not None)
    tpos = {t: i for i, t in enumerate(types)}
    nt = len(types)

    def prep(b: pa.Table) -> pa.Table:
        et = b.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        code = np.full(b.num_rows, -1, dtype=np.int64)
        enc = et.dictionary_encode()
        lut = np.array([tpos.get(v, -1) for v in
                        enc.dictionary.to_pylist()] + [-1], dtype=np.int64)
        idx = pc.fill_null(enc.indices, len(lut) - 1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        code = lut[idx]
        t = pa.table({"user_id": b.column("user_id").cast(pa.int64()),
                      "code": pa.array(code)})
        return t.filter(pc.greater_equal(t.column("code"), 0))

    def _masks(code, starts, want):
        bit = np.int64(1) << code
        masks = np.bitwise_or.reduceat(bit, starts) if len(starts) \
            else np.empty(0, dtype=np.int64)
        masks = masks[want]
        if not len(masks):
            return None
        rows_a, rows_b, rows_n = [], [], []
        for a in range(nt):
            for b2 in range(a + 1, nt):
                both = np.int64((1 << a) | (1 << b2))
                n = int(((masks & both) == both).sum())
                if n:
                    rows_a.append(types[a])
                    rows_b.append(types[b2])
                    rows_n.append(n)
        if not rows_n:
            return None
        return pa.table({"type_a": pa.array(rows_a, type=pa.string()),
                         "type_b": pa.array(rows_b, type=pa.string()),
                         "n_users": pa.array(np.asarray(rows_n,
                                                        np.int64))})

    def block_fn(block, starts, ends, want):
        return _masks(block.column("code").to_numpy(zero_copy_only=False),
                      starts, want.astype(bool))

    def group_fn(t: pa.Table):
        return _masks(t.column("code").to_numpy(zero_copy_only=False),
                      np.array([0], dtype=np.int64), np.array([True]))

    out_schema = pa.schema([("type_a", pa.string()),
                            ("type_b", pa.string()),
                            ("n_users", pa.int64())])
    per_block = sorted_group_scan(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"], group_fn, out_schema, block_fn=block_fn,
        sort_blocks=32)
    return (per_block.groupby(["type_a", "type_b"])
            .aggregate(Sum("n_users", alias_name="n_users")))


FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000


def funnel_view_purchase(sf_dir: str):
    """Funnel conversion — the product-analytics primitive: per user, the
    FIRST 'view' event, and whether a 'purchase' by the same user follows
    within 24 h. Emits per first-view day (day, n_users, n_converted).

    ONE user-keyed sorted scan (order: ts, event_id for deterministic
    equal-ts handling) whose block kernel computes each complete user's
    first-view timestamp (minimum.reduceat over masked positions) and the
    windowed purchase existence (reduceat over a vectorized mask) — no
    per-user Python; boundary users stitch exactly on the driver. The
    per-user rows are day-bucketed partials (<= days x 2 numbers per
    block), folded by a tiny groupby."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type", "event_id"])

    def prep(b: pa.Table) -> pa.Table:
        et = b.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        code = np.zeros(b.num_rows, dtype=np.int8)
        code[pc.equal(et, "view").to_numpy(zero_copy_only=False)] = 1
        code[pc.equal(et, "purchase").to_numpy(zero_copy_only=False)] = 2
        return pa.table({"user_id": b.column("user_id").cast(pa.int64()),
                         "ts_us": _ts_us_col(b.column("ts")),
                         "event_id": b.column("event_id").cast(pa.int64()),
                         "code": pa.array(code)})

    BIG = np.int64(2 ** 62)

    def _funnel(uid, ts, code, starts, sizes, want):
        if len(starts) == 0:
            return None
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        row_start = np.repeat(starts, sizes)
        # first view ts per group
        tsv = np.where(code == 1, ts, BIG)
        fv = np.minimum.reduceat(tsv, starts)
        fv_row = fv[seg]
        conv_m = ((code == 2) & (ts > fv_row)
                  & (ts <= fv_row + FUNNEL_WINDOW_US))
        conv = np.add.reduceat(conv_m.astype(np.int64), starts) > 0
        keep = want & (fv < BIG)
        if not keep.any():
            return None
        day = fv[keep] - fv[keep] % 86_400_000_000
        return pa.table({
            "day": pa.array(day).cast(pa.timestamp("us")),
            "n_users": pa.array(np.ones(keep.sum(), dtype=np.int64)),
            "n_converted": pa.array(conv[keep].astype(np.int64))})

    def block_fn(block: pa.Table, starts, ends, want):
        sizes = (ends - starts).astype(np.int64)
        return _funnel(
            block.column("user_id").to_numpy(zero_copy_only=False),
            block.column("ts_us").to_numpy(zero_copy_only=False),
            block.column("code").to_numpy(zero_copy_only=False),
            starts.astype(np.int64), sizes, want.astype(bool))

    def group_fn(t: pa.Table):
        n = t.num_rows
        return _funnel(
            t.column("user_id").to_numpy(zero_copy_only=False),
            t.column("ts_us").to_numpy(zero_copy_only=False),
            t.column("code").to_numpy(zero_copy_only=False),
            np.array([0], dtype=np.int64), np.array([n], dtype=np.int64),
            np.array([True]))

    out_schema = pa.schema([("day", pa.timestamp("us")),
                            ("n_users", pa.int64()),
                            ("n_converted", pa.int64())])
    per_user = sorted_group_scan(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"], group_fn, out_schema,
        block_fn=block_fn, sort_blocks=32,
        order_cols=["ts_us", "event_id"])
    from ray.data.aggregate import Sum

    return (per_user.groupby("day")
            .aggregate(Sum("n_users", alias_name="n_users"),
                       Sum("n_converted", alias_name="n_converted")))


def events_sessionization(sf_dir: str):
    """Session windows per user (gap > 30 min closes a session) on the
    shared sorted scan: one narrow (user, ts, cents) sort, then session
    boundaries / per-session (start, count, cents-sum) as ONE vectorized
    block kernel (gap mask + bincount segments) — no per-user Python.
    Oracle mirrors with lag()/sum() window functions; session stats are
    invariant to equal-ts tie order."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        cents = np.round(b.column("value").to_numpy(zero_copy_only=False)
                         .astype(np.float64) * 100).astype(np.int64)
        return pa.table({"user_id": b.column("user_id").cast(pa.int64()),
                         "ts_us": _ts_us_col(b.column("ts")),
                         "cents": pa.array(cents)})

    GAP_US = 1_800_000_000

    def _sessions(uid, ts, cents, row_start, want_row=None):
        n = len(ts)
        if n == 0:
            return None
        p = np.arange(n, dtype=np.int64)
        new_s = (p == row_start)
        prev = np.empty(n, dtype=np.int64)
        prev[0], prev[1:] = ts[0], ts[:-1]
        new_s |= (ts - prev) > GAP_US
        sid = np.cumsum(new_s) - 1
        starts_idx = np.flatnonzero(new_s)
        n_ev = np.bincount(sid).astype(np.int64)
        s_cents = np.zeros(len(starts_idx), dtype=np.int64)
        np.add.at(s_cents, sid, cents)
        keep = (want_row[starts_idx] if want_row is not None
                else np.ones(len(starts_idx), dtype=bool))
        return pa.table({
            "user_id": pa.array(uid[starts_idx][keep]),
            "session_start": pa.array(ts[starts_idx][keep])
            .cast(pa.timestamp("us")),
            "n_events": pa.array(n_ev[keep]),
            "sum_value_cents": pa.array(s_cents[keep])})

    def block_fn(block: pa.Table, starts, ends, want):
        sizes = (ends - starts).astype(np.int64)
        return _sessions(
            block.column("user_id").to_numpy(zero_copy_only=False),
            block.column("ts_us").to_numpy(zero_copy_only=False),
            block.column("cents").to_numpy(zero_copy_only=False),
            np.repeat(starts, sizes), np.repeat(want, sizes))

    def group_fn(t: pa.Table):
        return _sessions(
            t.column("user_id").to_numpy(zero_copy_only=False),
            t.column("ts_us").to_numpy(zero_copy_only=False),
            t.column("cents").to_numpy(zero_copy_only=False),
            np.zeros(t.num_rows, dtype=np.int64))

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("session_start", pa.timestamp("us")),
                            ("n_events", pa.int64()),
                            ("sum_value_cents", pa.int64())])
    return sorted_group_scan(ds.map_batches(prep, batch_format="pyarrow"),
                             ["user_id"], group_fn, out_schema,
                             block_fn=block_fn, order_cols=["ts_us"])


def customer_running_totals(sf_dir: str):
    """Per-customer running order totals (window-function analog) on the
    shared sorted scan: one narrow (custkey, orderdate, orderkey, cents)
    sort, then running sums as ONE vectorized block kernel (cumsum minus
    the group-start prefix) — replaces the groupby().map_groups shape
    that paid a Python call per customer."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_orderdate",
                        "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b.column("o_custkey").cast(pa.int64()),
            "date_us": _ts_us_col(b.column("o_orderdate")),
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "price_cents": pa.array(_cents(
                b.column("o_totalprice").to_numpy(zero_copy_only=False)))})

    def block_fn(block: pa.Table, starts, ends, want):
        sizes = (ends - starts).astype(np.int64)
        row_start = np.repeat(starts, sizes)
        cents = block.column("price_cents") \
            .to_numpy(zero_copy_only=False)
        cum = np.cumsum(cents)
        base = np.where(row_start > 0, cum[np.maximum(row_start - 1, 0)], 0)
        run = cum - base
        keep = np.repeat(want, sizes)
        return pa.table({
            "o_custkey": block.column("o_custkey").filter(pa.array(keep)),
            "o_orderkey": block.column("o_orderkey").filter(pa.array(keep)),
            "running_cents": pa.array(run[keep])})

    def group_fn(t: pa.Table):
        cents = t.column("price_cents").to_numpy(zero_copy_only=False)
        return pa.table({"o_custkey": t.column("o_custkey"),
                         "o_orderkey": t.column("o_orderkey"),
                         "running_cents": pa.array(np.cumsum(cents))})

    out_schema = pa.schema([("o_custkey", pa.int64()),
                            ("o_orderkey", pa.int64()),
                            ("running_cents", pa.int64())])
    return sorted_group_scan(ds.map_batches(prep, batch_format="pyarrow"),
                             ["o_custkey"], group_fn, out_schema,
                             block_fn=block_fn,
                             order_cols=["date_us", "o_orderkey"])


def salted_lang_chars(sf_dir: str):
    """Salted-shuffle aggregation demo: every lang treated as a hot key,
    salted into 4 sub-groups before the groupby, partials re-merged —
    result must equal the plain groupby (and the SQL oracle)."""
    from rayschema.skew import salted_groupby_sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "lang": b.column("lang"),
            "doc_id": b.column("doc_id").cast(pa.string()),
            "n_chars": b.column("n_chars").cast(pa.int64()),
        })

    ds2 = ds.map_batches(prep, batch_format="pyarrow")
    hot = {"en", "de", "fr", "es", "zh"}
    out = salted_groupby_sum(ds2, "lang", "doc_id", ["n_chars"], hot=hot, k=4)
    out = out.rename(columns={"n_chars": "sum_chars"})
    return out[["lang", "sum_chars"]]


def drift_lang_by_source(sf_dir: str):
    """Distribution drift as a driver-checked query: each ``source``
    partition's lang-frequency vector vs the whole-corpus baseline, the
    drift family's freq-L1 rule (drift.compare) in EXACT INTEGER form so
    DuckDB reproduces it bit-for-bit:

        l1 = sum_k |c_k/n_s - b_k/N|  ==  l1_num / denom,
        l1_num = sum_k |c_k*N - b_k*n_s|,  denom = n_s*N,
        drifted  <=>  l1 > 0.1  <=>  10*l1_num > denom.

    The shuffle moves only (source, lang, partial n) — the classic
    pre-aggregated combine; the final grid is (sources x langs), tiny."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": b.column("source").to_pandas(),
                           "lang": b.column("lang").to_pandas()})
        df["source"] = df["source"].fillna("__null__")
        df["lang"] = df["lang"].fillna("__null__")
        g = df.groupby(["source", "lang"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["source", "lang"])
              .aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    N = int(counts["n"].sum())
    base = counts.groupby("lang")["n"].sum().astype(np.int64)
    per_src = counts.groupby("source")["n"].sum().astype(np.int64)
    cell = counts.set_index(["source", "lang"])["n"]
    rows = []
    for src in sorted(per_src.index):
        ns = int(per_src[src])
        l1_num = 0
        for lang, bn in base.items():
            cn = int(cell.get((src, lang), 0))
            l1_num += abs(cn * N - int(bn) * ns)
        denom = ns * N
        rows.append({"source": src, "l1_num": np.int64(l1_num),
                     "denom": np.int64(denom),
                     "drifted": bool(10 * l1_num > denom)})
    return pd.DataFrame(rows)


PROPS_SCHEMA_JSON = """{
 "type": "object", "required": ["k"],
 "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 50}}
}"""


def validate_events_props(sf_dir: str):
    """Dynamic JSON column validation: events.props parsed per row, then the
    same compiled vectorized validator as every static column."""
    from rayschema.jsoncol import validate_json_column

    ds = _read(sf_dir, "events", columns=["event_id", "props"])
    return validate_json_column(ds, PROPS_SCHEMA_JSON, json_col="props",
                                keep_cols=["event_id"], concurrency=(1, 16)) \
        .select_columns(["event_id", "valid"])


def schema_docs_analysis(sf_dir: str):
    """Schema documents as rows: distributed parse + triviality + round-trip
    stability over a deterministic corpus of draft-07 documents (rows-only:
    result is a pure function of the seed)."""
    import ray.data as rd

    from rayschema.schemadocs import analyze_schema_docs, synth_schema_docs

    ds = rd.from_arrow(synth_schema_docs(2000))
    return analyze_schema_docs(ds)


def multimodal_features(sf_dir: str):
    """Binary media pipeline: synthetic media table -> actor-pool decode ->
    feature columns (rows-only check). Every kind runs a REAL pure-numpy
    decode: PPM images, RIFF/WAVE PCM audio, YUV4MPEG2 video (the fake
    codec remains only for compressed containers needing external libs)."""
    import ray.data as rd

    from rayschema.multimodal import MediaFeatureStage, default_decode, synth_media_table

    t = synth_media_table(256)
    ds = rd.from_arrow(t)
    return ds.map_batches(MediaFeatureStage,
                          fn_constructor_kwargs=dict(decode_fn=default_decode),
                          batch_format="pyarrow", batch_size=64,
                          concurrency=(1, 2)) \
             .select_columns(["media_id", "kind", "payload_sha256",
                              "payload_bytes", "feat_mean", "feat_dim"])


def multimodal_pipeline(sf_dir: str):
    """Kind-routed media pipeline: image resize / audio framing / video
    frame sampling as separate actor-pool stages, unioned (rows-only
    check). All three kinds decode REAL payloads (PPM / PCM WAV / Y4M)."""
    import ray.data as rd

    from rayschema.multimodal import (
        default_decode,
        media_feature_pipeline,
        synth_media_table,
    )

    ds = rd.from_arrow(synth_media_table(256))
    return media_feature_pipeline(ds, decode_fn=default_decode, concurrency=(1, 2))


# --------------------------------------------------------------------- session-5 operators

def semdedup_embeddings(sf_dir: str):
    """SemDeDup semantic dedup over the embeddings table: integer-exact
    k-means clusters (k=4, 2 Lloyd iterations) localize the exact-cosine
    near-dup check; inside each cluster every vector with a lower-id
    member at cosine >= 0.4 is dropped. Returns the KEPT (vec_id,
    cluster) rows. Fully DuckDB-oracled: k-means CTE chain + integer
    argmin assignment + within-cluster list_cosine_similarity pairs."""
    from rayschema.similarity import semdedup

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return semdedup(ds, k=4, iters=2, threshold=0.4)


BIGRAM_COVERAGE_TOP_K = 1000


def bigram_coverage_score(sf_dir: str):
    """Model-based quality scoring with the corpus's own bigram LM: each
    document is scored by how many of its adjacent word pairs appear in
    the corpus-wide top-1000 bigram table (the exact-rational
    (n_hits, n_pairs) form of "fraction of n-grams the LM knows" — the
    KenLM-style filter without float log-probs, so the DuckDB oracle
    hash-matches). The table is built by the same per-batch partial
    counts as bigram_next_word; the top-K pair STRINGS broadcast once via
    ray.put and the scan is one Arrow is_in hash kernel per batch — at
    100 TB the broadcast is K strings regardless of corpus size."""
    import ray

    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = _bigram_pair_counts(ds)
    top = (pairs.sort_values(["c", "w1", "w2"],
                             ascending=[False, True, True])
           .head(BIGRAM_COVERAGE_TOP_K))
    # words cannot contain the split char, so "w1 w2" is injective
    joined = (top["w1"] + " " + top["w2"]).to_numpy(dtype=object)
    ref = ray.put(pa.array(joined, type=pa.string()))

    def score(b: pa.Table, _ref=ref) -> pa.Table:
        vs = ray.get(_ref)
        b = b.filter(pc.is_valid(b.column("text")))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "n_pairs": pa.array([], type=pa.int64()),
                          "n_hits": pa.array([], type=pa.int64())})
        if len(col) == 0:
            return empty
        flat, _, doc_idx = _flatten_words_arrow(col)
        if len(flat) < 2:
            return empty
        same = doc_idx[1:] == doc_idx[:-1]
        ia = np.flatnonzero(same)
        if len(ia) == 0:
            return empty
        g = pc.binary_join_element_wise(flat.take(pa.array(ia)),
                                        flat.take(pa.array(ia + 1)), " ")
        hits = pc.is_in(g, value_set=vs).to_numpy(zero_copy_only=False)
        pair_doc = doc_idx[ia]
        n_pairs = np.bincount(pair_doc, minlength=len(b)).astype(np.int64)
        n_hits = np.bincount(pair_doc, weights=hits.astype(np.float64),
                             minlength=len(b)).astype(np.int64)
        keep = n_pairs > 0
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"doc_id": pa.array(ids[keep]),
                         "n_pairs": pa.array(n_pairs[keep]),
                         "n_hits": pa.array(n_hits[keep])})

    return ds.map_batches(score, batch_format="pyarrow")


BPE_TOP_PAIRS = 20


def bpe_top_pairs(sf_dir: str):
    """Tokenizer-training primitive: the first BPE merge step's statistics
    — corpus-wide counts of adjacent codepoint pairs WITHIN words (split
    on space), surfaced as the top-20 pairs by (count desc, pair lex).
    One batch-level kernel: the whole batch text decodes to a flat
    codepoint array once (_codepoint_parts), within-word adjacency is a
    vectorized mask (neither side a space, not a row boundary), and the
    per-batch partial is a bincount over packed (cp1 << 21 | cp2) keys.
    Driver state is the distinct-pair table — bounded by the alphabet
    squared, never by the corpus."""
    from rayschema.dedup import _codepoint_parts

    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        empty = pa.table({"k": pa.array([], type=pa.int64()),
                          "c": pa.array([], type=pa.int64())})
        if len(col) == 0:
            return empty
        _, off, cps, _ = _codepoint_parts(col)
        if len(cps) < 2:
            return empty
        left, right = cps[:-1], cps[1:]
        ok = np.ones(len(cps) - 1, dtype=bool)
        inner = off[1:-1]                      # row starts after the first
        inner = inner[(inner > 0) & (inner < len(cps))]
        ok[inner - 1] = False                  # pair straddles two rows
        mask = ok & (left != 32) & (right != 32)
        if not mask.any():
            return empty
        keys = (left[mask].astype(np.int64) << 21) | right[mask]
        uk, cnt = np.unique(keys, return_counts=True)
        return pa.table({"k": pa.array(uk),
                         "c": pa.array(cnt.astype(np.int64))})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(part) == 0:
        return pd.DataFrame({"c1": [], "c2": [], "n": [], "rk": []})
    agg = part.groupby("k", as_index=False)["c"].sum()
    # packed-key ascending == (cp1, cp2) lexicographic == SQL VARCHAR order
    agg = (agg.sort_values(["c", "k"], ascending=[False, True])
           .head(BPE_TOP_PAIRS).reset_index(drop=True))
    ks = agg["k"].to_numpy(np.int64)
    return pd.DataFrame({
        "c1": [chr(int(k) >> 21) for k in ks],
        "c2": [chr(int(k) & ((1 << 21) - 1)) for k in ks],
        "n": agg["c"].to_numpy(np.int64),
        "rk": np.arange(1, len(ks) + 1, dtype=np.int64)})


def chars_quartiles_by_lang(sf_dir: str):
    """Grouped EXACT quantiles without a sort: per-batch (lang, n_chars)
    value-count partials (Arrow group_by — state bounded by langs x
    distinct lengths, not rows) merge on the driver into per-lang
    histograms; p25/p50/p75 are the integer lower-quantile rule
    (smallest v with cum * 4 >= q * total), so the DuckDB oracle
    hash-matches. The grouped complement of length_quantile_filter."""
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("lang")),
                    pc.is_valid(b.column("n_chars")))
        b = b.filter(m)
        if b.num_rows == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "n_chars": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        g = b.group_by(["lang", "n_chars"]).aggregate([([], "count_all")])
        return g.select(['lang', 'n_chars', 'count_all']).rename_columns(["lang", "n_chars", "cnt"])

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(part) == 0:
        return pd.DataFrame({"lang": [], "p25": [], "p50": [],
                             "p75": [], "n": []})
    agg = (part.groupby(["lang", "n_chars"], as_index=False)["cnt"].sum()
           .sort_values(["lang", "n_chars"]))
    rows = []
    for lang, grp in agg.groupby("lang", sort=True):
        v = grp["n_chars"].to_numpy(np.int64)
        cum = np.cumsum(grp["cnt"].to_numpy(np.int64))
        tot = int(cum[-1])
        q = [int(v[np.searchsorted(cum * 4, qi * tot)])
             for qi in (1, 2, 3)]
        rows.append((lang, q[0], q[1], q[2], tot))
    out = pd.DataFrame(rows, columns=["lang", "p25", "p50", "p75", "n"])
    for c in ("p25", "p50", "p75", "n"):
        out[c] = out[c].astype(np.int64)
    return out


def _pq_schema_scalar(path: str, col: str, ts: pd.Timestamp):
    """Pushdown-filter scalar built FROM THE FILE SCHEMA so the parquet
    row filter adapts to however the column was written (date32,
    timestamp any unit, tz-aware); None for exotic storage — callers
    filter post-read instead (same convention as pricing_summary)."""
    import pyarrow.parquet as _pqm

    t = _pqm.read_schema(path).field(col).type
    if pa.types.is_date(t):
        return pa.scalar(ts.date(), type=t)
    if pa.types.is_timestamp(t):
        v = ts if t.tz is None else ts.tz_localize(t.tz)
        return pa.scalar(v, type=t)
    return None


Q3_BROADCAST_CAP = 10_000_000    # keys; ~80 MB broadcast ceiling


def q3_shipping_priority(sf_dir: str):
    """TPC-H Q3-shaped THREE-way join (customer ⋈ orders ⋈ lineitem)
    with ADAPTIVE join-strategy selection: when the segment-filtered
    customer key set fits the broadcast cap it ships once via ray.put
    and the custkey join becomes a stateless semi-join filter (one fewer
    all-to-all); past the cap it falls back to the hash exchange
    (Dataset.join — the order_revenue_join path). The orders result then
    hash-joins shipdate-filtered lineitem on orderkey, exact integer-e4
    revenue per (l_orderkey, o_orderdate), distributed top-10. Both date
    cuts push down to the parquet scan. The final top-k is per-block
    local top-10 + a blocks x 10 driver merge — no global sort. (The
    synthetic orders table carries no o_shippriority; the
    join/aggregate/topk shape is Q3's.)"""
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    cut = pd.Timestamp("1995-03-15")
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .filter(expr="c_mktsegment == 'BUILDING'") \
        .select_columns(["c_custkey"])

    opath = os.path.join(sf_dir, "orders.parquet")
    ot = _pq_schema_scalar(opath, "o_orderdate", cut)
    okw = {} if ot is None else dict(filter=pads.field("o_orderdate") < ot)
    orders = rd.read_parquet(
        opath, columns=["o_orderkey", "o_custkey", "o_orderdate"], **okw)
    if ot is None:
        orders = orders.filter(
            lambda r: r["o_orderdate"] < cut.to_datetime64())

    lpath = os.path.join(sf_dir, "lineitem.parquet")
    lt = _pq_schema_scalar(lpath, "l_shipdate", cut)
    lkw = {} if lt is None else dict(filter=pads.field("l_shipdate") > lt)
    li = rd.read_parquet(
        lpath,
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"], **lkw)
    if lt is None:      # exotic storage: apply the cut post-read
        li = li.filter(lambda r: r["l_shipdate"] > cut.to_datetime64())

    def li_prep(b: pa.Table) -> pa.Table:
        price = _cents(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False))
        disc = np.round((1.0 - b.column("l_discount").to_numpy(
            zero_copy_only=False).astype(np.float64)) * 100).astype(np.int64)
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "rev_e4": pa.array(price * disc)})

    est = (cust.size_bytes() or 0) + (orders.size_bytes() or 0) \
        + (li.size_bytes() or 0)
    n_parts = int(min(256, max(8, est // (128 << 20) + 8)))
    cust = cust.materialize()   # one execution: count + pull share blocks
    n_cust = cust.count()
    if n_cust <= Q3_BROADCAST_CAP:
        import ray

        keys = np.sort(cust.to_pandas()["c_custkey"].to_numpy(np.int64))
        kref = ray.put(keys)

        def semi(b: pa.Table, _kref=kref) -> pa.Table:
            ks = ray.get(_kref)
            ck = b.column("o_custkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if len(ks) == 0:    # segment matched no customer: empty result
                mask = np.zeros(len(ck), dtype=bool)
            else:
                pos = np.searchsorted(ks, ck)
                pos_c = np.minimum(pos, len(ks) - 1)
                mask = ks[pos_c] == ck
            return pa.table({
                "o_orderkey": b.column("o_orderkey").filter(pa.array(mask)),
                "o_orderdate": b.column("o_orderdate")
                .filter(pa.array(mask))})

        co = orders.map_batches(semi, batch_format="pyarrow")
    else:
        co = orders.join(cust, join_type="inner", num_partitions=n_parts,
                         on=("o_custkey",), right_on=("c_custkey",)) \
            .select_columns(["o_orderkey", "o_orderdate"])
    liq = li.map_batches(li_prep, batch_format="pyarrow")
    co = co.materialize()
    n_co = co.count()
    n_li_total = _table_rows(sf_dir, "lineitem")
    if n_co <= Q3_BROADCAST_CAP:
        # the filtered orders side fits the broadcast cap: the second
        # join becomes a stateless lookup with per-batch pre-aggregated
        # (orderkey, date) partials — the q10 adaptive discipline
        import ray

        codf = co.to_pandas().sort_values("o_orderkey")
        oref2 = ray.put((codf["o_orderkey"].to_numpy(np.int64),
                         codf["o_orderdate"].to_numpy()))

        def lookup(b: pa.Table, _o=oref2) -> pa.Table:
            ok, od = ray.get(_o)
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            rev = b.column("rev_e4").to_numpy(zero_copy_only=False)
            if len(ok):
                p = np.clip(np.searchsorted(ok, lk), 0, len(ok) - 1)
                hit = ok[p] == lk
            else:
                hit = np.zeros(len(lk), dtype=bool)
                p = np.zeros(len(lk), dtype=np.int64)
            lk2, rev2, pos2 = lk[hit], rev[hit], p[hit]
            uk, inv = np.unique(lk2, return_inverse=True)
            upos = np.zeros(len(uk), dtype=np.int64)
            upos[inv] = pos2              # orderdate is functional on key
            return pa.table({
                "l_orderkey": pa.array(uk),
                "o_orderdate": pa.array(od[upos]),
                "revenue_e4": pa.array(
                    np.bincount(inv, weights=rev2).astype(np.int64))})

        parts = liq.map_batches(lookup, batch_format="pyarrow")
        if n_li_total is not None and n_li_total <= TRADE_PAIR_FOLD_CAP:
            # partial totals bounded by matched lineitem rows: fold on
            # the driver (TRADE_PAIR_FOLD_CAP discipline), no shuffle
            agg = (parts.to_pandas()
                   .groupby(["l_orderkey", "o_orderdate"],
                            as_index=False)["revenue_e4"].sum())
            out = (agg.sort_values(["revenue_e4", "l_orderkey"],
                                   ascending=[False, True],
                                   kind="mergesort")
                   .head(10).reset_index(drop=True))
            out["revenue_e4"] = out["revenue_e4"].astype(np.int64)
            return out[["l_orderkey", "o_orderdate", "revenue_e4"]]
        agg = (parts                      # pragma: no cover - scale path
               .groupby(["l_orderkey", "o_orderdate"])
               .aggregate(Sum("revenue_e4", alias_name="revenue_e4")))
    else:                                 # pragma: no cover - scale path
        j = liq.join(co, join_type="inner", num_partitions=n_parts,
                     on=("l_orderkey",), right_on=("o_orderkey",))

        def partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "l_orderkey": b.column("l_orderkey").to_pandas(),
                "o_orderdate": b.column("o_orderdate").to_pandas(),
                "revenue_e4": b.column("rev_e4").to_pandas()})
            g = (df.groupby(["l_orderkey", "o_orderdate"],
                            as_index=False)["revenue_e4"].sum())
            return pa.Table.from_pandas(g, preserve_index=False)

        agg = (j.map_batches(partial, batch_format="pyarrow")
               .groupby(["l_orderkey", "o_orderdate"])
               .aggregate(Sum("revenue_e4", alias_name="revenue_e4")))

    def local_top(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["revenue_e4", "l_orderkey"], ascending=[False, True],
            kind="mergesort").head(10)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (agg.map_batches(local_top, batch_format="pyarrow").to_pandas()
           .sort_values(["revenue_e4", "l_orderkey"],
                        ascending=[False, True], kind="mergesort")
           .head(10).reset_index(drop=True))
    out["revenue_e4"] = out["revenue_e4"].astype(np.int64)
    return out[["l_orderkey", "o_orderdate", "revenue_e4"]]



def _ts_us_col(col):
    """Timestamp column -> int64 MICROSECONDS regardless of the stored
    resolution (pandas-written fixtures are timestamp[ns]; the driver
    testdata is timestamp[us])."""
    t = col.type
    if pa.types.is_timestamp(t) and t.unit != "us":
        col = col.cast(pa.timestamp("us", tz=t.tz))
    return col.cast(pa.int64())

def events_rolling_window(sf_dir: str):
    """Bounded ROWS-window aggregate: per-user rolling 3-row sum/count of
    event value cents, ordered by (ts, event_id) — the moving-average
    primitive. One narrow (user_id, ts, event_id, cents) sort via the
    shared sorted_group_scan with within-group ordering; the rolling
    arithmetic is ONE vectorized block kernel (cumsum minus its 3-lag
    with per-group resets), no per-group Python on the fast path."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        cents = np.round(b.column("value").to_numpy(zero_copy_only=False)
                         .astype(np.float64) * 100).astype(np.int64)
        return pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "ts_us": _ts_us_col(b.column("ts")),
            "event_id": b.column("event_id").cast(pa.int64()),
            "cents": pa.array(cents)})

    W = 3

    def _roll(cents: np.ndarray, row_start: np.ndarray):
        cum = np.cumsum(cents)
        p = np.arange(len(cents), dtype=np.int64)
        back = np.maximum(p - W, row_start - 1)
        roll = cum - np.where(back >= 0, cum[np.maximum(back, 0)], 0)
        n = p - np.maximum(p - W, row_start - 1)
        return roll, n

    def block_fn(block: pa.Table, starts, ends, want):
        sizes = (ends - starts).astype(np.int64)
        row_start = np.repeat(starts, sizes)
        cents = block.column("cents").to_numpy(zero_copy_only=False)
        roll, n = _roll(cents, row_start)
        keep = np.repeat(want, sizes)
        return pa.table({
            "event_id": block.column("event_id").filter(pa.array(keep)),
            "roll_cents": pa.array(roll[keep]),
            "roll_n": pa.array(n[keep])})

    def group_fn(t: pa.Table):
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        roll, n = _roll(cents, np.zeros(len(cents), dtype=np.int64))
        return pa.table({"event_id": t.column("event_id"),
                         "roll_cents": pa.array(roll),
                         "roll_n": pa.array(n)})

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("roll_cents", pa.int64()),
                            ("roll_n", pa.int64())])
    return sorted_group_scan(ds.map_batches(prep, batch_format="pyarrow"),
                             ["user_id"], group_fn, out_schema,
                             block_fn=block_fn,
                             order_cols=["ts_us", "event_id"])


PIVOT_LANGS = ["en", "de", "fr", "es", "zh"]


def lang_source_pivot(sf_dir: str):
    """Pivot / crosstab: per-source document counts spread into one
    column per language (+ n_other for anything else incl. NULL). The
    long (source, lang, count) partials are Arrow group_by per batch;
    the driver pivots a sources x langs table — O(groups), never rows."""
    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        src = b.column("source")
        lang = b.column("lang")
        t = pa.table({
            "source": pc.coalesce(src, pa.scalar("__null__")),
            "lang": pc.coalesce(lang, pa.scalar("__null__"))})
        g = t.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return g.select(['source', 'lang', 'count_all']).rename_columns(["source", "lang", "cnt"])

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = part.groupby(["source", "lang"], as_index=False)["cnt"].sum()
    known = set(PIVOT_LANGS)
    agg["lang"] = [l if l in known else "__other__" for l in agg["lang"]]
    agg = agg.groupby(["source", "lang"], as_index=False)["cnt"].sum()
    wide = (agg.pivot_table(index="source", columns="lang", values="cnt",
                            aggfunc="sum", fill_value=0)
            .reset_index())
    for l in PIVOT_LANGS + ["__other__"]:
        if l not in wide.columns:
            wide[l] = 0
    out = pd.DataFrame({"source": wide["source"]})
    for l in PIVOT_LANGS:
        out[f"n_{l}"] = wide[l].astype(np.int64)
    out["n_other"] = wide["__other__"].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


RANGE_PARTS = 16


def range_partition_bounds(sf_dir: str):
    """Equi-depth range-partitioner planning: the 15 exact boundaries
    splitting documents into 16 equal-count buckets by n_chars (the
    planning step of a distributed range sort / write). Same value-count
    histogram partials as chars_quartiles_by_lang; boundary i is the
    smallest value whose cumulative count reaches i/16 of the total —
    integer-exact, so the oracle hash-matches."""
    ds = _read(sf_dir, "documents", columns=["n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("n_chars")))
        if b.num_rows == 0:
            return pa.table({"n_chars": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        g = b.group_by(["n_chars"]).aggregate([([], "count_all")])
        return g.select(['n_chars', 'count_all']).rename_columns(["n_chars", "cnt"])

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (part.groupby("n_chars", as_index=False)["cnt"].sum()
           .sort_values("n_chars"))
    v = agg["n_chars"].to_numpy(np.int64)
    cum = np.cumsum(agg["cnt"].to_numpy(np.int64))
    tot = int(cum[-1])
    idx = [int(v[np.searchsorted(cum * RANGE_PARTS, i * tot)])
           for i in range(1, RANGE_PARTS)]
    return pd.DataFrame({
        "bucket": np.arange(1, RANGE_PARTS, dtype=np.int64),
        "bound": np.asarray(idx, dtype=np.int64)})


def global_sort_rank(sf_dir: str):
    """DISTRIBUTED TOTAL-ORDER SORT RANK — the two-phase external-sort
    pattern (plan offsets, then range-partitioned local order), with an
    exact row_number oracle over the global (n_chars, doc_id) order:

    1. plan: one value-count histogram pass (the same partial as
       chars_quartiles_by_lang) gives the EXACT count of rows per
       n_chars value; the exclusive prefix sum over the sorted value
       domain is every value-group's global starting rank — driver
       state is the distinct-value table (the length_quantile_filter
       bound), never rows;
    2. execute: ONE narrow (n_chars, doc_id) sort via sorted_group_scan
       keyed by n_chars and ordered by doc_id within the group; a
       vectorized block kernel adds the broadcast value-offset to the
       within-group position. The value key is order-monotone, so
       per-group ranks concatenate into the exact global ranking —
       the same shape as pack_sequences' distributed prefix sum.

    No node holds more than a value-group; the only all-to-all is the
    one narrow sort."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def hpartial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("n_chars")))
        if b.num_rows == 0:
            return pa.table({"n_chars": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        g = b.group_by(["n_chars"]).aggregate([([], "count_all")])
        return g.select(['n_chars', 'count_all']).rename_columns(["n_chars", "cnt"])

    part = ds.map_batches(hpartial, batch_format="pyarrow").to_pandas()
    agg = (part.groupby("n_chars", as_index=False)["cnt"].sum()
           .sort_values("n_chars"))
    vals = agg["n_chars"].to_numpy(np.int64)
    cnt = agg["cnt"].to_numpy(np.int64)
    offsets = np.concatenate([[0], np.cumsum(cnt)[:-1]])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("n_chars")))
        return pa.table({"n_chars": b.column("n_chars").cast(pa.int64()),
                         "doc_id": b.column("doc_id").cast(pa.int64())})

    def _ranks(nc, row_start):
        pos = np.arange(len(nc), dtype=np.int64) - row_start
        return offsets[np.searchsorted(vals, nc)] + pos + 1

    def block_fn(block: pa.Table, starts, ends, want):
        sizes = (ends - starts).astype(np.int64)
        nc = block.column("n_chars").to_numpy(zero_copy_only=False)
        rank = _ranks(nc, np.repeat(starts, sizes))
        keep = np.repeat(want, sizes)
        return pa.table({
            "doc_id": block.column("doc_id").filter(pa.array(keep)),
            "n_chars": block.column("n_chars").filter(pa.array(keep)),
            "global_rank": pa.array(rank[keep])})

    def group_fn(t: pa.Table):
        nc = t.column("n_chars").to_numpy(zero_copy_only=False)
        rank = _ranks(nc, np.zeros(len(nc), dtype=np.int64))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_chars": t.column("n_chars"),
                         "global_rank": pa.array(rank)})

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_chars", pa.int64()),
                            ("global_rank", pa.int64())])
    return sorted_group_scan(ds.map_batches(prep, batch_format="pyarrow"),
                             ["n_chars"], group_fn, out_schema,
                             block_fn=block_fn, order_cols=["doc_id"])


def first_event_per_day(sf_dir: str):
    """Windowed (keyed) deduplication: keep only the FIRST event per
    (user_id, event_type, day) — the at-most-once-per-window rule of
    stream compaction. One narrow sort via sorted_group_scan keyed by
    (user_id, day) and ordered by (ts, event_id); within each group a
    vectorized first-per-type kernel (dictionary codes + one lexsort)
    picks survivors — event text/type never shuffles beyond its group
    row."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        ts_us = _ts_us_col(b.column("ts"))
        # integer floor-division, the events_hourly_anomaly convention
        day = ts_us.to_numpy(zero_copy_only=False) // 86_400_000_000
        return pa.table({"user_id": b.column("user_id").cast(pa.int64()),
                         "day": pa.array(day.astype(np.int64)),
                         "ts_us": ts_us,
                         "event_id": b.column("event_id").cast(pa.int64()),
                         "event_type": b.column("event_type")})

    def _first_per_type(codes: np.ndarray, row_start: np.ndarray):
        n = len(codes)
        order = np.lexsort((np.arange(n), codes, row_start))
        rs, cs = row_start[order], codes[order]
        new = np.ones(n, dtype=bool)
        new[1:] = (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])
        return order[new]            # original row indices of survivors

    def block_fn(block: pa.Table, starts, ends, want):
        sizes = (ends - starts).astype(np.int64)
        row_start = np.repeat(starts, sizes)
        et = block.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = et.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        keep_rows = _first_per_type(codes, row_start)
        keep_rows = keep_rows[np.repeat(want, sizes)[keep_rows]]
        keep_rows.sort()
        idx = pa.array(keep_rows)
        return pa.table({"event_id": block.column("event_id").take(idx),
                         "user_id": block.column("user_id").take(idx),
                         "day": block.column("day").take(idx),
                         "event_type": et.take(idx)})

    def group_fn(t: pa.Table):
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = et.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _first_per_type(codes, np.zeros(len(codes), dtype=np.int64))
        keep.sort()
        idx = pa.array(keep)
        return pa.table({"event_id": t.column("event_id").take(idx),
                         "user_id": t.column("user_id").take(idx),
                         "day": t.column("day").take(idx),
                         "event_type": et.take(idx)})

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("day", pa.int64()),
                            ("event_type", pa.string())])
    return sorted_group_scan(ds.map_batches(prep, batch_format="pyarrow"),
                             ["user_id", "day"], group_fn, out_schema,
                             block_fn=block_fn,
                             order_cols=["ts_us", "event_id"])


def lang_source_rollup(sf_dir: str):
    """GROUP BY ROLLUP (source, lang): doc counts at all three grouping
    levels — (source, lang), (source), grand total — from ONE partial
    count pass; the coarser levels are driver-side sums over the
    metadata-sized (source, lang) table, never a second scan. NULL group
    members surface as '__all__' so the column stays a plain string."""
    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "source": pc.coalesce(b.column("source"),
                                  pa.scalar("__null__")),
            "lang": pc.coalesce(b.column("lang"), pa.scalar("__null__"))})
        g = t.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return g.select(['source', 'lang', 'count_all']).rename_columns(["source", "lang", "cnt"])

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    fine = part.groupby(["source", "lang"], as_index=False)["cnt"].sum()
    mid = fine.groupby("source", as_index=False)["cnt"].sum()
    mid["lang"] = "__all__"
    top = pd.DataFrame({"source": ["__all__"], "lang": ["__all__"],
                        "cnt": [int(fine["cnt"].sum())]})
    out = pd.concat([fine, mid[["source", "lang", "cnt"]], top],
                    ignore_index=True)
    out = out.rename(columns={"cnt": "n"})
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["source", "lang"]).reset_index(drop=True)


def normalize_text_documents(sf_dir: str):
    """Text normalization (the cleanup step before hashing/dedup):
    lowercase -> squash runs of spaces -> trim edge spaces, all as Arrow
    C++ kernels (utf8_lower / RE2 replace / utf8_trim), stateless and
    shuffle-free. TEXT-exact against the DuckDB
    lower/regexp_replace/trim oracle (parity verified on the full
    charset, CJK included)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def norm(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        nt = pc.utf8_trim(pc.replace_substring_regex(
            pc.utf8_lower(b.column("text")), " +", " "), " ")
        return pa.table({"doc_id": b.column("doc_id").cast(pa.int64()),
                         "norm_text": nt,
                         "n_norm_chars": pc.utf8_length(nt)
                         .cast(pa.int64())})

    return ds.map_batches(norm, batch_format="pyarrow")


def q4_priority_exists(sf_dir: str):
    """TPC-H-Q4-shaped EXISTS semi-join: count orders per priority (one
    quarter of 1996) having AT LEAST ONE returned line item
    (l_returnflag = 'R'). The qualifying orderkey set comes from a
    filtered+distinct narrow lineitem pass (per-batch unique partials ->
    driver np.unique under Q3_BROADCAST_CAP, hash join past it); the
    orders side prunes both date cuts at the parquet scan and applies the
    broadcast membership as a stateless filter — EXISTS without moving
    order rows. Emits (o_orderpriority, n_orders)."""
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def lk_partial(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("l_returnflag"), "R")
        t = b.filter(pc.fill_null(m, False))
        ks = np.unique(t.column("l_orderkey")
                       .to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"k": pa.array(ks)})

    keys_ds = li.map_batches(lk_partial,
                             batch_format="pyarrow").materialize()

    opath = os.path.join(sf_dir, "orders.parquet")
    olo = _pq_schema_scalar(opath, "o_orderdate", lo)
    ohi = _pq_schema_scalar(opath, "o_orderdate", hi)
    okw = {} if olo is None else dict(
        filter=(pads.field("o_orderdate") >= olo)
        & (pads.field("o_orderdate") < ohi))
    orders = rd.read_parquet(
        opath, columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
        **okw)
    if olo is None:
        orders = orders.filter(
            lambda r: lo.to_datetime64() <= r["o_orderdate"]
            < hi.to_datetime64())

    if keys_ds.count() <= Q3_BROADCAST_CAP:
        kdf = keys_ds.to_pandas()
        keys = np.unique(kdf["k"].to_numpy(np.int64)) if len(kdf) \
            else np.empty(0, np.int64)
        kref = ray.put(keys)

        def semi(b: pa.Table, _kref=kref) -> pa.Table:
            ks = ray.get(_kref)
            ok_ = b.column("o_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if len(ks) == 0:
                keep = np.zeros(len(ok_), dtype=bool)
            else:
                p = np.clip(np.searchsorted(ks, ok_), 0, len(ks) - 1)
                keep = ks[p] == ok_
            return pa.table({"o_orderpriority":
                             b.column("o_orderpriority").filter(
                                 pa.array(keep))})

        matched = orders.map_batches(semi, batch_format="pyarrow")
    else:
        # per-batch-distinct keys may still repeat ACROSS batches: globally
        # dedupe with a tiny groupby before the semi hash join
        kd = keys_ds.groupby("k").count().select_columns(["k"])
        est = (orders.size_bytes() or 0) + (keys_ds.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))
        matched = orders.join(
            kd, join_type="inner", num_partitions=n_parts,
            on=("o_orderkey",), right_on=("k",)) \
            .select_columns(["o_orderpriority"])

    return (matched.groupby("o_orderpriority")
            .aggregate(Count("o_orderpriority", alias_name="n_orders")))


def q5_local_supplier_volume(sf_dir: str, region: str = "ASIA"):
    """TPC-H Q5-shaped SIX-table join — the engine's deepest relational
    composition: region -> nation (metadata-sized, resolved on the
    driver), customer semi-filtered to in-region nations (stateless
    searchsorted against the broadcast nation-key array), orders with the
    one-year date cut PUSHED TO THE PARQUET SCAN, the orders⋈customer
    custkey join (adaptive: broadcast (custkey -> nationkey) arrays under
    Q3_BROADCAST_CAP, Dataset.join hash exchange past it), the big
    lineitem⋈orders orderkey HASH join, then a stateless supplier lookup
    enforcing Q5's "local supplier" rule c_nationkey == s_nationkey
    (suppliers are a dimension table — broadcast sorted arrays), and a
    per-batch per-nation partial fold into the <= 25-row final aggregate.
    Revenue in exact integer e4 (the q3 convention). Emits
    (n_name, revenue_e4)."""
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")

    reg = _read(sf_dir, "region").to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"]
                .astype(np.int64))
    nat = _read(sf_dir, "nation").to_pandas()
    nat = nat[nat["n_regionkey"].astype(np.int64).isin(rkeys)] \
        .sort_values("n_nationkey")
    nkeys = nat["n_nationkey"].to_numpy(np.int64)
    nnames = nat["n_name"].tolist()

    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey"]).to_pandas() \
        .sort_values("s_suppkey")
    skeys = sup["s_suppkey"].to_numpy(np.int64)
    snat = sup["s_nationkey"].to_numpy(np.int64)
    nref = ray.put(nkeys)
    sref = ray.put((skeys, snat))

    def cust_filter(b: pa.Table, _nref=nref) -> pa.Table:
        nk = ray.get(_nref)
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cn = b.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(nk) == 0:
            keep = np.zeros(len(ck), dtype=bool)
        else:
            p = np.clip(np.searchsorted(nk, cn), 0, len(nk) - 1)
            keep = nk[p] == cn
        return pa.table({"c_custkey": pa.array(ck[keep]),
                         "c_nationkey": pa.array(cn[keep])})

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]) \
        .map_batches(cust_filter, batch_format="pyarrow")

    opath = os.path.join(sf_dir, "orders.parquet")
    olo = _pq_schema_scalar(opath, "o_orderdate", lo)
    ohi = _pq_schema_scalar(opath, "o_orderdate", hi)
    okw = {} if olo is None else dict(
        filter=(pads.field("o_orderdate") >= olo)
        & (pads.field("o_orderdate") < ohi))
    orders = rd.read_parquet(
        opath, columns=["o_orderkey", "o_custkey", "o_orderdate"], **okw)
    if olo is None:
        orders = orders.filter(
            lambda r: lo.to_datetime64() <= r["o_orderdate"]
            < hi.to_datetime64())
    orders = orders.select_columns(["o_orderkey", "o_custkey"])

    cust = cust.materialize()   # one execution: count + pull share blocks
    n_cust = cust.count()
    if n_cust <= Q3_BROADCAST_CAP:
        cdf = cust.to_pandas().sort_values("c_custkey")
        cref = ray.put((cdf["c_custkey"].to_numpy(np.int64),
                        cdf["c_nationkey"].to_numpy(np.int64)))

        def o_lookup(b: pa.Table, _cref=cref) -> pa.Table:
            ck, cn = ray.get(_cref)
            ok_ = b.column("o_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            oc = b.column("o_custkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if len(ck) == 0:
                keep = np.zeros(len(ok_), dtype=bool)
                nk = oc
            else:
                p = np.clip(np.searchsorted(ck, oc), 0, len(ck) - 1)
                keep = ck[p] == oc
                nk = cn[p]
            return pa.table({"o_orderkey": pa.array(ok_[keep]),
                             "c_nationkey": pa.array(nk[keep])})

        ord_nat = orders.map_batches(o_lookup, batch_format="pyarrow")
    else:
        est = (orders.size_bytes() or 0) + (cust.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))
        ord_nat = orders.join(
            cust, join_type="inner", num_partitions=n_parts,
            on=("o_custkey",), right_on=("c_custkey",)) \
            .select_columns(["o_orderkey", "c_nationkey"])

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])

    def li_prep(b: pa.Table) -> pa.Table:
        price = _cents(b.column("l_extendedprice")
                       .to_numpy(zero_copy_only=False))
        disc = np.round((1.0 - b.column("l_discount")
                         .to_numpy(zero_copy_only=False)
                         .astype(np.float64)) * 100).astype(np.int64)
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "l_suppkey": b.column("l_suppkey"),
                         "rev_e4": pa.array(price * disc)})

    liq = li.map_batches(li_prep, batch_format="pyarrow")
    ord_nat = ord_nat.materialize()
    n_on = ord_nat.count()
    if n_on <= Q3_BROADCAST_CAP:
        # the date+region-filtered (orderkey -> nationkey) side fits
        # the broadcast cap: the big join becomes a stateless lookup
        # (the q3/q10 adaptive discipline); hash exchange kept past it
        odf = ord_nat.to_pandas().sort_values("o_orderkey")
        onref = ray.put((odf["o_orderkey"].to_numpy(np.int64),
                         odf["c_nationkey"].to_numpy(np.int64)))

        def join_lookup(b: pa.Table, _on=onref) -> pa.Table:
            ok_, onat = ray.get(_on)
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if len(ok_):
                p = np.clip(np.searchsorted(ok_, lk), 0, len(ok_) - 1)
                hit = ok_[p] == lk
                nk2 = onat[p]
            else:
                hit = np.zeros(len(lk), dtype=bool)
                nk2 = lk
            m = pa.array(hit)
            return pa.table({
                "l_suppkey": b.column("l_suppkey").filter(m),
                "c_nationkey": pa.array(nk2[hit]),
                "rev_e4": b.column("rev_e4").filter(m)})

        joined = liq.map_batches(join_lookup, batch_format="pyarrow")
    else:                                 # pragma: no cover - scale path
        est = (li.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))
        joined = liq.join(
            ord_nat, join_type="inner", num_partitions=n_parts,
            on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table, _sref=sref, _nref=nref) -> pa.Table:
        sk, sn = ray.get(_sref)
        nk = ray.get(_nref)
        if b.num_rows == 0 or len(sk) == 0 or len(nk) == 0:
            return pa.table({"nationkey": pa.array([], type=pa.int64()),
                             "revenue_e4": pa.array([], type=pa.int64())})
        ls = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cn = b.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rev = b.column("rev_e4").to_numpy(zero_copy_only=False)
        p = np.clip(np.searchsorted(sk, ls), 0, len(sk) - 1)
        keep = (sk[p] == ls) & (sn[p] == cn)     # local-supplier rule
        cn, rev = cn[keep], rev[keep]
        q = np.clip(np.searchsorted(nk, cn), 0, len(nk) - 1)
        sums = np.zeros(len(nk), dtype=np.int64)
        np.add.at(sums, q, rev)
        nz = sums != 0
        return pa.table({"nationkey": pa.array(nk[nz]),
                         "revenue_e4": pa.array(sums[nz])})

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({"n_name": pd.Series([], dtype=object),
                             "revenue_e4": pd.Series([], dtype=np.int64)})
    agg = parts.groupby("nationkey", as_index=False)["revenue_e4"].sum()
    name_of = dict(zip(nkeys, nnames))
    agg["n_name"] = agg["nationkey"].map(name_of)
    agg = agg[agg["revenue_e4"] != 0]
    return (agg[["n_name", "revenue_e4"]]
            .sort_values("revenue_e4", ascending=False)
            .reset_index(drop=True))


def supplier_nation_balance(sf_dir: str):
    """Dimension-table enrichment for the one table no other query
    touches: suppliers per nation with exact integer-cents account
    balance aggregates, via a BROADCAST join (nation is metadata-sized
    — the complement of the hash-join path order_revenue_join takes)."""
    import ray

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]) \
        .to_pandas()
    nmap_keys = nation["n_nationkey"].to_numpy(np.int64)
    order = np.argsort(nmap_keys)
    nmap_keys = nmap_keys[order]
    nmap_names = nation["n_name"].to_numpy(dtype=object)[order]
    ref = ray.put((nmap_keys, nmap_names))

    ds = _read(sf_dir, "supplier",
               columns=["s_suppkey", "s_nationkey", "s_acctbal"])

    def partial(b: pa.Table, _ref=ref) -> pa.Table:
        keys, names = ray.get(_ref)
        nk = b.column("s_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = _cents(b.column("s_acctbal").to_numpy(zero_copy_only=False))
        # inner-join semantics: clamp then verify the key actually matches;
        # a supplier with no nation row is dropped, not mis-attributed
        if len(keys) == 0:
            df = pd.DataFrame({"n_name": np.array([], dtype=object),
                               "cents": np.array([], dtype=np.int64)})
        else:
            pos = np.minimum(np.searchsorted(keys, nk), len(keys) - 1)
            hit = keys[pos] == nk
            df = pd.DataFrame({"n_name": names[pos][hit],
                               "cents": cents[hit]})
        g = (df.groupby("n_name", as_index=False)
             .agg(n_suppliers=("cents", "size"),
                  sum_acctbal_cents=("cents", "sum"),
                  min_acctbal_cents=("cents", "min"),
                  max_acctbal_cents=("cents", "max")))
        return pa.Table.from_pandas(g, preserve_index=False)

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (part.groupby("n_name", as_index=False)
           .agg(n_suppliers=("n_suppliers", "sum"),
                sum_acctbal_cents=("sum_acctbal_cents", "sum"),
                min_acctbal_cents=("min_acctbal_cents", "min"),
                max_acctbal_cents=("max_acctbal_cents", "max")))
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("n_name").reset_index(drop=True)


def near_dup_degree(sf_dir: str):
    """Graph-shaped view of the verified near-dup pairs: per-document
    DEGREE in the exact char-5-gram Jaccard >= 0.5 pair graph (the
    doc_id < 300 oracle scope shared with near_dup_clusters_exact).
    Pairs explode to both endpoints and a 16-byte groupby counts —
    metadata-sized all the way; the oracle chains the same pair CTEs."""
    from rayschema.dedup import exact_jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = exact_jaccard_pairs(ds, id_limit=300, k=5, threshold=0.5)

    def explode(b: pa.Table) -> pa.Table:
        a = b.column("id_a").to_numpy(zero_copy_only=False)
        c = b.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(
            np.concatenate([a, c]).astype(np.int64))})

    from ray.data.aggregate import Count

    return _pandas_typed(
        pairs.map_batches(explode, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Count("doc_id", alias_name="degree")),
        {"doc_id": "int64", "degree": "int64"})


def near_dup_triangles(sf_dir: str):
    """Per-node TRIANGLE counts in the verified near-dup pair graph (the
    clustering-coefficient numerator — how clique-like each dup
    neighborhood is; degree and connected components are the existing
    graph views). Edges (a < b) come from the oracle-scope exact pair
    set at jaccard >= 0.25 — a denser similarity graph than the 0.5
    dedup threshold, where transitive structure actually exists; the
    driver builds a higher-neighbor CSR + sorted edge-key array
    (verified-pair-mass-sized, the same bound the cluster union-find
    accepts) and broadcasts once; ONE stateless pass over the edge
    dataset closes wedges vectorized — for edge (a, b), candidates c in
    adjHigh[b] close iff (a, c) is an edge (searchsorted membership) —
    counting each triangle once at a < b < c and emitting per-node
    partials folded by a tiny groupby. Emits (doc_id, n_triangles)."""
    import ray
    from ray.data.aggregate import Sum

    from rayschema.dedup import exact_jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = exact_jaccard_pairs(ds, id_limit=300, k=5,
                                threshold=0.25).materialize()
    pdf = pairs.to_pandas()
    if len(pdf):
        ea = pdf["id_a"].to_numpy(np.int64)
        eb = pdf["id_b"].to_numpy(np.int64)
        keys = np.sort((ea << 32) | eb)
        # higher-neighbor adjacency CSR over compacted node ids
        nodes = np.unique(np.concatenate([ea, eb]))
        aa = np.searchsorted(nodes, ea)
        order = np.lexsort((eb, aa))
        aa_s, c_s = aa[order], eb[order]
        deg = np.bincount(aa_s, minlength=len(nodes)).astype(np.int64)
        off = np.zeros(len(nodes) + 1, dtype=np.int64)
        off[1:] = np.cumsum(deg)
        ref = ray.put((keys, nodes, off, c_s))
    else:
        ref = ray.put((np.empty(0, np.int64), np.empty(0, np.int64),
                       np.zeros(1, np.int64), np.empty(0, np.int64)))

    def close(b: pa.Table, _ref=ref) -> pa.Table:
        keys, nodes, off, adj = ray.get(_ref)
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "n_triangles": pa.array([], type=pa.int64())})
        if b.num_rows == 0 or not len(keys):
            return empty
        a = b.column("id_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bb = b.column("id_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bi = np.searchsorted(nodes, bb)
        has = (bi < len(nodes)) & (nodes[np.minimum(bi, len(nodes) - 1)]
                                   == bb)
        deg = np.where(has, off[np.minimum(bi, len(nodes) - 1) + 1]
                       - off[np.minimum(bi, len(nodes) - 1)], 0)
        total = int(deg.sum())
        if total == 0:
            return empty
        rep = np.repeat(np.arange(len(a)), deg)
        first = np.repeat(off[np.minimum(bi, len(nodes) - 1)], deg)
        pos = np.arange(total, dtype=np.int64) \
            - np.repeat(np.cumsum(deg) - deg, deg)
        c = adj[first + pos]
        key = (a[rep] << 32) | c
        p = np.clip(np.searchsorted(keys, key), 0, len(keys) - 1)
        hit = keys[p] == key
        if not hit.any():
            return empty
        tri_nodes = np.concatenate([a[rep][hit], bb[rep][hit], c[hit]])
        u, cnt = np.unique(tri_nodes, return_counts=True)
        return pa.table({"doc_id": pa.array(u),
                         "n_triangles": pa.array(cnt.astype(np.int64))})

    return (pairs.map_batches(close, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Sum("n_triangles", alias_name="n_triangles")))


PAGERANK_SCALE = 1_000_000


def near_dup_pagerank(sf_dir: str, iters: int = 2):
    """INTEGER-EXACT PageRank over the jaccard >= 0.25 similarity graph —
    the graph-iterative analog of the oracled k-means. Scores live in
    integer millionths; the recurrence and both execution paths (per-
    superstep broadcast fold under NODE_BROADCAST_CAP, edges ⋈ ranks
    hash join past it) are rayschema.graph.pagerank — ONE edge-stream
    pass + ONE node-keyed groupby per superstep, bit-reproducible, so
    the DuckDB oracle unrolls the rounds as CTEs. Emits
    (doc_id, pagerank) for graph nodes."""
    from rayschema.dedup import exact_jaccard_pairs
    from rayschema.graph import pagerank

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = exact_jaccard_pairs(ds, id_limit=300, k=5,
                                threshold=0.25).materialize()
    if pairs.count() == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "pagerank": pd.Series([], dtype=np.int64)})

    def both(b: pa.Table) -> pa.Table:
        a = b.column("id_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = b.column("id_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([a, c])),
                         "dst": pa.array(np.concatenate([c, a]))})

    edges = pairs.map_batches(both, batch_format="pyarrow")
    pr = pagerank(edges, iters=iters, init=PAGERANK_SCALE,
                  base=150_000)
    return pd.DataFrame({"doc_id": pr["node"].to_numpy(np.int64),
                         "pagerank": pr["pr"].to_numpy(np.int64)})


def token_log2_histogram(sf_dir: str):
    """Distribution analysis: histogram of per-doc token counts in
    power-of-two buckets (bucket = floor(log2(tokens)), integer-exact
    via frexp exponents — no float log ambiguity at exact powers).
    Per-batch bincount partials; driver merge is O(64)."""
    from rayschema.text import token_count_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        tok = (token_count_batch(b, text_col="text", out="tok")
               .column("tok").to_numpy(zero_copy_only=False)
               .astype(np.int64))
        tok = tok[tok >= 1]
        if len(tok) == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "n_docs": pa.array([], type=pa.int64()),
                             "min_tok": pa.array([], type=pa.int64()),
                             "max_tok": pa.array([], type=pa.int64())})
        bucket = (np.frexp(tok.astype(np.float64))[1] - 1).astype(np.int64)
        u, inv = np.unique(bucket, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        mn = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.zeros(len(u), dtype=np.int64)
        np.minimum.at(mn, inv, tok)
        np.maximum.at(mx, inv, tok)
        return pa.table({"bucket": pa.array(u), "n_docs": pa.array(n),
                         "min_tok": pa.array(mn), "max_tok": pa.array(mx)})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (part.groupby("bucket", as_index=False)
           .agg(n_docs=("n_docs", "sum"), min_tok=("min_tok", "min"),
                max_tok=("max_tok", "max")))
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("bucket").reset_index(drop=True)


def jsonl_roundtrip(sf_dir: str):
    """The JSONL sink+source surfaced as a driver-checked query: documents
    (incl. the unicode text column) stream to JSONL shards, are read back
    through the JSON source, and per-lang (n_rows, id_sum, text_chars)
    aggregates of the ROUND-TRIPPED rows are returned — the oracle
    computes the same from the original parquet, so any JSON
    escape/encoding infidelity breaks the hash."""
    import shutil
    import tempfile

    from ray.data.aggregate import Sum

    from rayschema.sources import read_corpus, write_corpus

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    out_dir = os.path.join(tempfile.gettempdir(),
                           f"rayschema_jsonl_{os.getpid()}")
    shutil.rmtree(out_dir, ignore_errors=True)
    write_corpus(ds, out_dir, fmt="json")
    back = read_corpus(out_dir, fmt="json")

    def partial(b: pa.Table) -> pa.Table:
        lang = b.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tlen = pc.fill_null(pc.utf8_length(b.column("text")), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({"lang": lang, "ids": pa.array(ids),
                      "tlen": pa.array(tlen),
                      "one": pa.array(np.ones(len(ids), dtype=np.int64))})
        g = t.group_by("lang").aggregate(
            [("ids", "sum"), ("tlen", "sum"), ("one", "sum")])
        return g.select(['lang', 'ids_sum', 'tlen_sum', 'one_sum']).rename_columns(["lang", "id_sum", "text_chars", "n_rows"])

    return (back.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("n_rows", alias_name="n_rows"),
                       Sum("id_sum", alias_name="id_sum"),
                       Sum("text_chars", alias_name="text_chars")))


def partitioned_write_roundtrip(sf_dir: str):
    """The SINK surfaced as a driver-checked query: documents stream to a
    lang-partitioned hive parquet layout (the resumable 100-TB output
    shape — one directory per partition, idempotent overwrite), the
    partition dirs are listed, each partition is read back with
    partition-column pruning, and the per-lang (n_docs, sum_chars)
    aggregates of what was WRITTEN are returned — so the oracle checks
    the sink round-trip, not just the aggregate."""
    import tempfile

    import ray.data as rd

    from rayschema.sources import write_corpus

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("lang")),
                             pc.is_valid(b.column("n_chars"))))
        return b

    out_dir = os.path.join(tempfile.gettempdir(),
                           f"rayschema_part_sink_{os.getpid()}")
    write_corpus(ds.map_batches(prep, batch_format="pyarrow"), out_dir,
                 fmt="parquet", partition_cols=["lang"])
    back = rd.read_parquet(out_dir)

    def partial(b: pa.Table) -> pa.Table:
        lang = b.column("lang")
        if pa.types.is_dictionary(lang.type):
            lang = lang.cast(pa.string())
        t = pa.table({"lang": lang,
                      "n_chars": b.column("n_chars").cast(pa.int64())})
        g = t.group_by(["lang"]).aggregate([("n_chars", "sum"),
                                            ([], "count_all")])
        return g.select(['lang', 'n_chars_sum', 'count_all']).rename_columns(["lang", "sum_chars", "n_docs"])

    part = back.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (part.groupby("lang", as_index=False)
           .agg(sum_chars=("sum_chars", "sum"), n_docs=("n_docs", "sum")))
    out["sum_chars"] = out["sum_chars"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    return out.sort_values("lang").reset_index(drop=True)


INCR_OLD_LIMIT = 250      # "already-ingested" snapshot: doc_id < 250
INCR_NEW_LIMIT = 500      # new batch: 250 <= doc_id < 500


def dedup_incremental(sf_dir: str):
    """INCREMENTAL ingest dedup — the continuous-crawl pattern: a new
    batch (doc_id in [250, 500)) is deduplicated against the
    already-ingested corpus (doc_id < 250) WITHOUT re-reading old text
    wholesale: the old snapshot contributes a FIXED-SIZE hashed content
    bitmap (2 MB at any corpus size, broadcast via ray.put), the new
    batch is deduped
    within itself by the engine's _exact_dedup_core (24-byte shuffle,
    distributed verify), and old-vs-new hash matches are exactly
    text-verified by pulling ONLY the matched rows from each side —
    dup-rate-sized, never corpus-sized. Hash collisions therefore cannot
    cause a false drop. Returns the surviving new doc_ids."""
    import ray

    from rayschema.dedup import _bitmap_hash, _bitmap_member, _mix64
    from rayschema.sketches import hash64

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def drop_null(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b.column("text")))

    old = ds.filter(expr=f"doc_id < {INCR_OLD_LIMIT}") \
        .map_batches(drop_null, batch_format="pyarrow")
    new = ds.filter(expr=f"doc_id >= {INCR_OLD_LIMIT} "
                         f"and doc_id < {INCR_NEW_LIMIT}") \
        .map_batches(drop_null, batch_format="pyarrow")

    # fixed-size hashed bitmap (2 MB at 24 bits) instead of the raw hash
    # array: constant broadcast no matter how large the ingested corpus;
    # bitmap false positives only ADD candidates, which the exact text
    # verify below removes — no false drops possible
    BM_BITS = 24
    acc = np.zeros((1 << BM_BITS) // 8, dtype=np.uint8)

    def old_bits(b: pa.Table) -> pa.Table:
        txt = np.asarray(b.column("text").to_pylist(), dtype=object)
        uk = _mix64(hash64(txt)).view(np.int64)
        h = _bitmap_hash(uk, BM_BITS)
        chunk = np.zeros(1 << BM_BITS, dtype=np.uint8)
        chunk[h] = 1
        return pa.table({"bm": pa.array([np.packbits(chunk).tobytes()],
                                        type=pa.large_binary())})

    for row in old.map_batches(old_bits, batch_format="pyarrow") \
            .to_pandas()["bm"]:
        acc |= np.frombuffer(row, dtype=np.uint8)
    uref = ray.put(acc)

    # within-new exact dedup (min id per distinct text), fully distributed
    kept_ids = set(_exact_dedup_core(
        new, emit="kept",
        n_rows=_table_rows(sf_dir, "documents")).to_pandas()
                   ["doc_id"].to_numpy(np.int64))

    def cand(b: pa.Table, _uref=uref) -> pa.Table:
        bm = ray.get(_uref)
        txt = np.asarray(b.column("text").to_pylist(), dtype=object)
        uk = _mix64(hash64(txt)).view(np.int64)
        m = pa.array(_bitmap_member(uk, bm, BM_BITS)) if len(uk) else \
            pa.array(np.zeros(0, dtype=bool))
        return pa.table({"doc_id": b.column("doc_id").cast(pa.int64())
                         .filter(m),
                         "text": b.column("text").filter(m)})

    cands = new.map_batches(cand, batch_format="pyarrow").to_pandas()
    bad_ids: set = set()
    if len(cands):
        cuks = np.sort(np.unique(
            _mix64(hash64(np.asarray(cands["text"], dtype=object)))
            .view(np.int64)))
        cref = ray.put(cuks)

        def old_match(b: pa.Table, _cref=cref) -> pa.Table:
            ks = ray.get(_cref)
            txt = np.asarray(b.column("text").to_pylist(), dtype=object)
            uk = _mix64(hash64(txt)).view(np.int64)
            pos = np.minimum(np.searchsorted(ks, uk), len(ks) - 1)
            m = pa.array(ks[pos] == uk)
            return pa.table({"text": b.column("text").filter(m)})

        old_texts = set(old.map_batches(old_match, batch_format="pyarrow")
                        .to_pandas()["text"])
        bad_ids = set(cands.loc[[t in old_texts for t in cands["text"]],
                                "doc_id"].to_numpy(np.int64))
    final = np.sort(np.array(sorted(kept_ids - bad_ids), dtype=np.int64))
    return pd.DataFrame({"doc_id": final})


def trending_event_types(sf_dir: str):
    """Streaming-analytics "trending" shape: the most frequent event_type
    per hour (count desc, type lex on ties). Per-batch Arrow group_by
    (hour, type) partials -> metadata-sized driver merge (hours x types)
    -> per-hour argmax; no row-level shuffle at all."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        hr = _ts_us_col(b.column("ts")).to_numpy(zero_copy_only=False) \
            // 3_600_000_000
        t = pa.table({"hour_bucket": pa.array(hr.astype(np.int64)),
                      "event_type": b.column("event_type")})
        g = t.group_by(["hour_bucket", "event_type"]) \
            .aggregate([([], "count_all")])
        return g.select(['hour_bucket', 'event_type', 'count_all']).rename_columns(["hour_bucket", "event_type", "cnt"])

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (part.groupby(["hour_bucket", "event_type"], as_index=False)
           ["cnt"].sum())
    best = (agg.sort_values(["hour_bucket", "cnt", "event_type"],
                            ascending=[True, False, True], kind="mergesort")
            .groupby("hour_bucket", as_index=False).first()
            .rename(columns={"event_type": "top_type", "cnt": "n"}))
    best["n"] = best["n"].astype(np.int64)
    best["hour_bucket"] = best["hour_bucket"].astype(np.int64)
    return best[["hour_bucket", "top_type", "n"]]


RETENTION_DAYS = 7


def cohort_retention_d7(sf_dir: str):
    """Cohort retention: for every user, the first active UTC day and
    whether they were active again exactly 7 days later. One narrow
    (user, day) sort via the shared sorted scan; first-day and the
    day+7 membership test are ONE vectorized block kernel (rows of a
    group arrive day-ordered; duplicates are harmless to min and
    membership, so no distinct pass is needed)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        day = _ts_us_col(b.column("ts")).to_numpy(zero_copy_only=False) \
            // 86_400_000_000
        return pa.table({"user_id": b.column("user_id").cast(pa.int64()),
                         "day": pa.array(day.astype(np.int64))})

    def _retention(uid, day, row_start, want_row=None):
        n = len(day)
        if n == 0:
            return None
        first = day[row_start]                     # per-row group first day
        hit = day == first + RETENTION_DAYS
        starts_idx = np.flatnonzero(
            np.arange(n, dtype=np.int64) == row_start)
        gid = np.cumsum(np.arange(n, dtype=np.int64) == row_start) - 1
        ret = np.zeros(len(starts_idx), dtype=np.int64)
        np.maximum.at(ret, gid, hit.astype(np.int64))
        keep = (want_row[starts_idx] if want_row is not None
                else np.ones(len(starts_idx), dtype=bool))
        return pa.table({
            "user_id": pa.array(uid[starts_idx][keep]),
            "first_day": pa.array(day[starts_idx][keep]),
            "retained_d7": pa.array(ret[keep])})

    def block_fn(block: pa.Table, starts, ends, want):
        sizes = (ends - starts).astype(np.int64)
        return _retention(
            block.column("user_id").to_numpy(zero_copy_only=False),
            block.column("day").to_numpy(zero_copy_only=False),
            np.repeat(starts, sizes), np.repeat(want, sizes))

    def group_fn(t: pa.Table):
        return _retention(
            t.column("user_id").to_numpy(zero_copy_only=False),
            t.column("day").to_numpy(zero_copy_only=False),
            np.zeros(t.num_rows, dtype=np.int64))

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("first_day", pa.int64()),
                            ("retained_d7", pa.int64())])
    return sorted_group_scan(ds.map_batches(prep, batch_format="pyarrow"),
                             ["user_id"], group_fn, out_schema,
                             block_fn=block_fn, order_cols=["day"])


def near_dup_clusters_distributed(sf_dir: str):
    """The DISTRIBUTED min-label-propagation clustering path (the
    billions-of-pairs fallback that near_dup_clusters auto-selects past
    driver_pair_cap), driver-checked against the SAME recursive
    min-label CTE oracle as near_dup_clusters_exact — so the scale path
    itself is hash-verified, not just equality-tested in pytest."""
    from rayschema.dedup import connected_components_ds, exact_jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = exact_jaccard_pairs(ds, id_limit=300, k=5, threshold=0.5) \
        .select_columns(["id_a", "id_b"])
    out = connected_components_ds(pairs).to_pandas()
    if not len(out):
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "cluster_id": pd.Series([], dtype="int64")})
    return out.astype({"doc_id": "int64", "cluster_id": "int64"}) \
        .sort_values("doc_id").reset_index(drop=True)


ZORDER_BITS = 20


def zorder_documents(sf_dir: str):
    """Z-ORDER (Morton) clustering keys over (n_chars, doc_id) — the
    multi-dimensional data-layout primitive lakehouse engines use to
    co-locate rows for multi-column pruning. Bit interleaving is one
    vectorized numpy pass per batch (stateless, shuffle-free); the
    DuckDB oracle recomputes the interleave with a generate_series bit
    sum, so the keys are hash-exact. Emits (doc_id, zkey, zbucket) with
    zbucket = top 8 bits (the partition a Z-sorted writer would route
    the row to)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def zmap(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("doc_id")),
                             pc.is_valid(b.column("n_chars"))))
        x = b.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        y = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        z = np.zeros(len(x), dtype=np.int64)
        for i in range(ZORDER_BITS):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return pa.table({"doc_id": pa.array(y),
                         "zkey": pa.array(z),
                         "zbucket": pa.array(z >> (2 * ZORDER_BITS - 8))})

    return ds.map_batches(zmap, batch_format="pyarrow")


def trainer_export_pipeline(sf_dir: str):
    """The COMPOSED end-to-end trainer export — the second full-chain
    pipeline (the first, curation_pipeline_documents, gates on
    repetition + validity): Gopher quality rules -> token-8-gram
    benchmark decontamination -> exact dedup -> deterministic
    shuffle-shard placement, all with a single full-chain DuckDB oracle.

    Stages and their shapes (each proven green standalone):
    1. ONE pass computes Gopher pass flags (vectorized split kernel) and
       window-hash contamination against the broadcast benchmark-hash
       array (searchsorted); survivors keep only (doc_id, text);
    2. `_exact_dedup_core` keeps min-id per distinct text (24-byte
       shuffle, distributed verify);
    3. kept ids go through the SHARED seeded shard + within-shard rank
       (`_shuffle_shard_rank` — the exact rank core of
       shuffle_shard_documents, with its adaptive map_groups ↔ two-phase
       histogram-offset switch), so driver state is O(1): no kept id
       ever lands on the driver.
    Emits (doc_id, shard, pos)."""
    import ray

    from rayschema.text import gopher_flags_batch

    n = NGRAM_DECONTAM_N
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        b = b.filter(pc.and_(pc.is_valid(b.column("text")),
                             pa.array(ids % DECONTAM_MOD == 7)))
        wh, _ = _doc_window_hashes(b, n)
        return pa.table({"h": pa.array(np.unique(wh).view(np.int64))})

    bench = ds.map_batches(bench_partial, batch_format="pyarrow").to_pandas()
    bench_h = np.unique(bench["h"].to_numpy(np.int64)) if len(bench) \
        else np.empty(0, np.int64)
    ref = ray.put(bench_h)

    def gate(b: pa.Table, _ref=ref) -> pa.Table:
        bh = ray.get(_ref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        b = b.filter(pc.and_(pc.is_valid(b.column("text")),
                             pa.array(ids % DECONTAM_MOD != 7)))
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "text": pa.array([], type=pa.string())})
        g = gopher_flags_batch(b)
        passed = np.zeros(b.num_rows, dtype=bool)
        # gopher emits one row per non-null text (split_pattern mirrors
        # SQL string_split: even "" yields one empty word) but filters
        # null texts itself — align by id rather than assume same order
        gid = g.column("doc_id").to_numpy(zero_copy_only=False)
        bid = b.column("doc_id").to_numpy(zero_copy_only=False)
        gp = g.column("gopher_pass").to_numpy(zero_copy_only=False) \
            .astype(bool)
        pos = np.searchsorted(np.sort(bid), gid)
        order = np.argsort(bid)
        passed[order[pos]] = gp
        wh, widx = _doc_window_hashes(b, n)
        if len(wh) and len(bh):
            p = np.minimum(np.searchsorted(bh, wh.view(np.int64)),
                           len(bh) - 1)
            hit = bh[p] == wh.view(np.int64)
            passed[np.unique(widx[hit])] = False
        m = pa.array(passed)
        return pa.table({"doc_id": b.column("doc_id").cast(pa.int64())
                         .filter(m),
                         "text": b.column("text").filter(m)})

    survivors = ds.map_batches(gate, batch_format="pyarrow")
    kept = _exact_dedup_core(survivors, emit="kept",
                             n_rows=_table_rows(sf_dir, "documents"))
    # narrow to ids and materialize ONCE (8 B/row in the object store,
    # distributed/spillable) so the rank's adaptive row-count gate and its
    # shuffle don't re-execute the gate+dedup chain
    kept_ids = kept.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id").cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    return _shuffle_shard_rank(kept_ids, n_rows=kept_ids.count())


def fuzzy_word_pairs(sf_dir: str):
    """SymSpell-style fuzzy vocabulary matching (Garbe's deletion-
    neighborhood method, public algorithm): every DISTINCT corpus-word pair
    within Levenshtein distance <= 2 — the typo-clustering / fuzzy-join
    primitive (vocabulary normalization before token counting, OCR-noise
    dedup). Scale shape:

    1. distributed distinct vocabulary (per-batch Arrow group_by partials,
       then one vocab-sized groupby — the only corpus-wide pass; words of
       4..20 codepoints);
    2. each distinct word emits its <=2-deletion key set (deletion_keys —
       one vectorized slice+join kernel per deletion position over the
       vocabulary, never the corpus), keys packed to the 62-bit
       SQL-mirrorable poly hash (hash collisions only add candidates);
    3. ONE key-hash sort + sorted_group_scan: complete key groups emit
       their C(g,2) candidate pairs (group_filter skips the singleton
       majority; groups are alphabet-bounded, no hot-key salt needed at
       the 4-codepoint length floor);
    4. candidate pairs dedupe on a pair-sized groupby, then ONE
       levenshtein_batch verify pass — the DP is vectorized ACROSS pairs
       (L^2 numpy ops total), keeps dist <= 2.

    The SymSpell guarantee (ED(a,b) <= 2 => the <=2-deletion sets
    intersect) makes step 3's candidates a superset of the answer, so the
    exact verify yields precisely DuckDB's levenshtein() pairs."""
    from rayschema.dedup import poly_token_hash, sorted_group_scan
    from rayschema.text import deletion_keys, levenshtein_batch

    ds = _read(sf_dir, "documents", columns=["text"])

    def vocab_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({"word": pa.array([], type=pa.string())})
        from rayschema.text import _flatten_words_arrow
        flat, _, _ = _flatten_words_arrow(col)
        ln = pc.utf8_length(flat)
        flat = flat.filter(pc.and_(pc.greater_equal(ln, 4),
                                   pc.less_equal(ln, 20)))
        g = pa.table({"word": flat}).group_by(["word"]) \
            .aggregate([([], "count_all")])
        return pa.table({"word": g.column("word")})

    vocab = (ds.map_batches(vocab_partial, batch_format="pyarrow")
             .groupby("word").count()
             .select_columns(["word"]))

    def keygen(b: pa.Table) -> pa.Table:
        w = b.column("word")
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        if len(w) == 0:
            return pa.table({"kh": pa.array([], type=pa.int64()),
                             "word": pa.array([], type=pa.string())})
        keys, idx = deletion_keys(w, max_del=2)
        kh = poly_token_hash(keys.to_pylist()).astype(np.int64)
        # same-word duplicate keys ('aab' deleting either 'a') collapse
        # here; each distinct word lives in exactly one batch, so this
        # per-batch dedup is global
        g = (pa.table({"kh": pa.array(kh),
                       "word": w.take(pa.array(idx))})
             .group_by(["kh", "word"]).aggregate([([], "count_all")]))
        return pa.table({"kh": g.column("kh"), "word": g.column("word")})

    cand = vocab.map_batches(keygen, batch_format="pyarrow")
    out_schema = pa.schema([("word_a", pa.string()),
                            ("word_b", pa.string())])

    def pair_group(t: pa.Table) -> pa.Table:
        words = sorted(set(t.column("word").to_pylist()))
        if len(words) < 2:
            return pa.table({"word_a": pa.array([], type=pa.string()),
                             "word_b": pa.array([], type=pa.string())})
        arr = np.asarray(words, dtype=object)
        ia, ib = np.triu_indices(len(arr), 1)
        return pa.table({"word_a": pa.array(arr[ia], type=pa.string()),
                         "word_b": pa.array(arr[ib], type=pa.string())})

    pairs = sorted_group_scan(
        cand, ["kh"], pair_group, out_schema,
        group_filter=lambda b, s, e: (e - s) >= 2)

    def verify(b: pa.Table) -> pa.Table:
        wa = b.column("word_a").to_pylist()
        wb = b.column("word_b").to_pylist()
        d = levenshtein_batch(wa, wb)
        m = pa.array(d <= 2)
        return pa.table({"word_a": b.column("word_a").filter(m),
                         "word_b": b.column("word_b").filter(m),
                         "dist": pa.array(d[d <= 2])})

    return (pairs.groupby(["word_a", "word_b"]).count()
            .select_columns(["word_a", "word_b"])
            .map_batches(verify, batch_format="pyarrow"))


def benford_digit_audit(sf_dir: str):
    """Benford first-significant-digit audit (Newcomb 1881 / Benford 1938,
    the classic numeric-data-quality screen): distribution of the first
    digit of positive order totals in integer cents, with the chi-square
    numerator against the Benford expectation in CLEARED-INTEGER form
    (1e6-scaled expected millionths are hardcoded constants on both sides,
    so no float log ever crosses the engine/oracle boundary). One stateless
    vectorized pass (log10-free first-digit: divide by 10 until < 10, done
    as a digit-count via the string length of the integer — an Arrow
    kernel) + a 9-row groupby."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        cents = _cents(b.column("o_totalprice").to_numpy(
            zero_copy_only=False))
        cents = cents[cents > 0]
        if len(cents) == 0:
            return pa.table({"digit": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        # first significant digit = n // 10^(ndigits-1); vectorized via
        # the decimal digit count (same arithmetic the SQL oracle uses)
        nd = np.floor(np.log10(cents.astype(np.float64))).astype(np.int64)
        # float log10 can be off by one ulp at exact powers of ten —
        # correct exactly in integer space
        p = np.power(10, nd, dtype=np.int64)
        nd = np.where(p > cents, nd - 1, nd)
        nd = np.where(10 * np.power(10, nd, dtype=np.int64) <= cents,
                      nd + 1, nd)
        digit = cents // np.power(10, nd, dtype=np.int64)
        cnt = np.bincount(digit, minlength=10)[1:10]
        return pa.table({"digit": pa.array(np.arange(1, 10)),
                         "n": pa.array(cnt.astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("digit").aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    agg = agg[agg["n"] > 0].sort_values("digit").reset_index(drop=True)
    total = int(agg["n"].sum())
    # Benford expected probability in millionths: round(log10(1+1/d)*1e6)
    exp_m = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
             6: 66947, 7: 57992, 8: 51153, 9: 45757}
    agg["expected_millionths"] = agg["digit"].map(exp_m).astype(np.int64)
    # chi-square numerator per digit, cleared of the float denominator:
    # (1e6 * n - total * expected_millionths)^2 stays exact in int64?
    # n <= 1e9 at 100 TB -> 1e6*n ~ 1e15, square overflows int64 — keep
    # the RESIDUAL (not its square) integer-exact instead
    agg["resid_millionths"] = (1_000_000 * agg["n"].astype(np.int64)
                               - total * agg["expected_millionths"])
    agg["n"] = agg["n"].astype(np.int64)
    agg["digit"] = agg["digit"].astype(np.int64)
    return agg[["digit", "n", "expected_millionths", "resid_millionths"]]


def fd_audit_source_lang(sf_dir: str):
    """Functional-dependency audit source -> lang (the profiling primitive
    behind referential/consistency checks: does each source publish in one
    language?): per source, the number of distinct languages, the modal
    (most frequent, ties broken lexicographically) language, and how many
    rows deviate from it — i.e. the minimum repair size. Distributed
    shape: per-batch (source, lang) partial counts -> one pair-domain-sized
    groupby -> per-source vectorized argmax on the driver-sized pair table
    (|sources| x |langs| rows, metadata-sized at any corpus scale)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("source")),
                             pc.is_valid(b.column("lang"))))
        g = (pa.table({"source": b.column("source"),
                       "lang": b.column("lang")})
             .group_by(["source", "lang"]).aggregate([([], "count_all")]))
        return pa.table({"source": g.column("source"),
                         "lang": g.column("lang"),
                         "n": g.column("count_all").cast(pa.int64())})

    pairs = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["source", "lang"]).aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    pairs = pairs.sort_values(["source", "n", "lang"],
                              ascending=[True, False, True],
                              kind="mergesort")
    g = pairs.groupby("source", as_index=False)
    out = g.agg(n_langs=("lang", "size"), n_rows=("n", "sum"))
    head = pairs.drop_duplicates("source", keep="first")
    out = out.merge(head[["source", "lang", "n"]], on="source")
    out = out.rename(columns={"lang": "modal_lang"})
    out["n_violations"] = (out["n_rows"] - out["n"]).astype(np.int64)
    out["n_langs"] = out["n_langs"].astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return out[["source", "n_langs", "n_rows", "modal_lang",
                "n_violations"]].sort_values("source") \
        .reset_index(drop=True)


def value_mad_outliers(sf_dir: str):
    """Robust per-group outlier screen (median absolute deviation, the
    classic drift/anomaly primitive): per event type, the exact integer
    lower-median of value-cents, the MAD (lower-median of |x - med|), and
    how many rows sit beyond 3 x MAD. Two distributed histogram passes
    (same bounded-state shape as chars_quartiles_by_lang — per-batch
    (type, cents) value-count partials; driver state is the distinct-value
    histogram per type, never rows): pass 1 -> medians; pass 2 with the
    broadcast median table -> deviation histograms, from which BOTH the
    MAD and the outlier count read off on the driver (no third pass).
    The lower-quantile rule (smallest v with 2*cum >= n) is exactly
    DuckDB's quantile_disc(0.5), so the oracle hash-matches."""
    import ray

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def hist_partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("event_type")),
                    pc.is_valid(b.column("value")))
        b = b.filter(m)
        if b.num_rows == 0:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "cents": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        cents = _cents(b.column("value").to_numpy(zero_copy_only=False))
        g = (pa.table({"event_type": b.column("event_type"),
                       "cents": pa.array(cents)})
             .group_by(["event_type", "cents"]).aggregate([([], "count_all")]))
        return g.select(['event_type', 'cents', 'count_all']).rename_columns(["event_type", "cents", "cnt"])

    def lower_median(vals: np.ndarray, cnts: np.ndarray) -> int:
        o = np.argsort(vals)
        v, c = vals[o], cnts[o]
        cum = np.cumsum(c)
        return int(v[np.searchsorted(cum * 2, cum[-1])])

    h1 = (ds.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
          .groupby(["event_type", "cents"], as_index=False)["cnt"].sum())
    meds = {t: lower_median(g["cents"].to_numpy(np.int64),
                            g["cnt"].to_numpy(np.int64))
            for t, g in h1.groupby("event_type", sort=True)}
    mkeys = np.array(sorted(meds), dtype=object)
    mvals = np.array([meds[k] for k in mkeys], dtype=np.int64)
    ref = ray.put((mkeys, mvals))

    def dev_partial(b: pa.Table, _ref=ref) -> pa.Table:
        keys, vals = ray.get(_ref)
        m = pc.and_(pc.is_valid(b.column("event_type")),
                    pc.is_valid(b.column("value")))
        b = b.filter(m)
        if b.num_rows == 0 or len(keys) == 0:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "dev": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        cents = _cents(b.column("value").to_numpy(zero_copy_only=False))
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(keys, et), len(keys) - 1)
        # every type was seen in pass 1 by construction; verify anyway so a
        # racing writer can never mis-attribute a row to the wrong median
        hit = keys[pos] == et
        dev = np.abs(cents[hit] - vals[pos][hit])
        g = (pa.table({"event_type": b.column("event_type")
                       .filter(pa.array(hit)),
                       "dev": pa.array(dev)})
             .group_by(["event_type", "dev"]).aggregate([([], "count_all")]))
        return g.select(['event_type', 'dev', 'count_all']).rename_columns(["event_type", "dev", "cnt"])

    h2 = (ds.map_batches(dev_partial, batch_format="pyarrow").to_pandas()
          .groupby(["event_type", "dev"], as_index=False)["cnt"].sum())
    rows = []
    for t, g in h2.groupby("event_type", sort=True):
        dv = g["dev"].to_numpy(np.int64)
        cn = g["cnt"].to_numpy(np.int64)
        mad = lower_median(dv, cn)
        n_out = int(cn[dv > 3 * mad].sum())
        rows.append((t, int(cn.sum()), int(meds[t]), mad, n_out))
    out = pd.DataFrame(rows, columns=["event_type", "n", "med_cents",
                                      "mad_cents", "n_outliers"])
    for c in ("n", "med_cents", "mad_cents", "n_outliers"):
        out[c] = out[c].astype(np.int64)
    return out


# --------------------------------------------------------------------------- skyline / cube / entropy / Q17 / Q13


def _skyline_2d(key: np.ndarray, price: np.ndarray,
                size: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D Pareto frontier (minimize price,
    maximize size) in original row order. A row is dominated iff some row
    has price <= / size >= with at least one strict. One lexsort
    (price asc, size desc) + a grouped prefix-max scan: within a price
    group the first row holds the group's max size, and the running max
    over STRICTLY cheaper groups gives the best size any cheaper point
    achieves — both dominance tests become two vectorized compares."""
    n = len(key)
    if n == 0:
        return np.zeros(0, dtype=bool)
    o = np.lexsort((key, -size.astype(np.int64), price))
    p, s = price[o], size[o].astype(np.int64)
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = p[1:] != p[:-1]
    gidx = np.cumsum(new_grp) - 1
    gmax = s[new_grp]                      # max size per price group
    acc = np.maximum.accumulate(gmax)      # best size at price <= group's
    cheaper = np.concatenate(
        ([np.iinfo(np.int64).min], acc[:-1]))  # best at STRICTLY cheaper
    dominated = (cheaper[gidx] >= s) | (s < gmax[gidx])
    keep = np.zeros(n, dtype=bool)
    keep[o] = ~dominated
    return keep


def part_skyline(sf_dir: str):
    """Distributed 2-D skyline (Pareto frontier: minimize p_retailprice,
    maximize p_size) — the classic local-skyline-then-merge plan: every
    block computes its own frontier with the vectorized _skyline_2d kernel
    (survivors of an independently-distributed block are O(log n) in
    expectation), dominated rows die IN PLACE so only frontier candidates
    ever leave a block, and one repartition(1) pass runs the identical
    kernel over the frontier-sized union for the global answer — no
    all-to-all shuffle and no driver materialization. Prices compare as
    integer cents. Emits (p_partkey, price_cents, p_size)."""
    ds = _read(sf_dir, "part",
               columns=["p_partkey", "p_retailprice", "p_size"])

    def local(b: pa.Table) -> pa.Table:
        k = b.column("p_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price = _cents(b.column("p_retailprice")
                       .to_numpy(zero_copy_only=False))
        size = b.column("p_size").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _skyline_2d(k, price, size)
        return pa.table({"p_partkey": pa.array(k[m]),
                         "price_cents": pa.array(price[m]),
                         "p_size": pa.array(size[m])})

    def merge(b: pa.Table) -> pa.Table:
        k = b.column("p_partkey").to_numpy(zero_copy_only=False)
        price = b.column("price_cents").to_numpy(zero_copy_only=False)
        size = b.column("p_size").to_numpy(zero_copy_only=False)
        m = _skyline_2d(k, price, size)
        return pa.table({"p_partkey": pa.array(k[m]),
                         "price_cents": pa.array(price[m]),
                         "p_size": pa.array(size[m])})

    return (ds.map_batches(local, batch_format="pyarrow")
            .repartition(1)
            .map_batches(merge, batch_size=None, batch_format="pyarrow"))


def lang_source_cube(sf_dir: str):
    """GROUP BY CUBE (lang, source): doc count + char sum at all FOUR
    grouping sets from ONE partial-aggregate pass — the three coarser sets
    are derived on the driver from the metadata-sized (lang, source) fine
    table (|langs| x |sources| rows), never by rescanning. Rows with a
    NULL group member are excluded on both sides so the '__all__' sentinel
    stays unambiguous. Emits (lang, source, n_docs, sum_chars)."""
    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("lang")),
                    pc.is_valid(b.column("source")))
        t = b.filter(m)
        g = t.group_by(["lang", "source"]).aggregate(
            [([], "count_all"), ("n_chars", "sum")])
        return g.select(['lang', 'source', 'count_all', 'n_chars_sum']).rename_columns(["lang", "source", "n", "sc"])

    fine = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
            .groupby(["lang", "source"], as_index=False)
            .agg(n=("n", "sum"), sc=("sc", "sum")))
    by_lang = fine.groupby("lang", as_index=False).agg(
        n=("n", "sum"), sc=("sc", "sum"))
    by_lang["source"] = "__all__"
    by_src = fine.groupby("source", as_index=False).agg(
        n=("n", "sum"), sc=("sc", "sum"))
    by_src["lang"] = "__all__"
    top = pd.DataFrame({"lang": ["__all__"], "source": ["__all__"],
                        "n": [int(fine["n"].sum())],
                        "sc": [int(fine["sc"].sum())]})
    cols = ["lang", "source", "n", "sc"]
    out = pd.concat([fine[cols], by_lang[cols], by_src[cols], top[cols]],
                    ignore_index=True)
    out = out.rename(columns={"n": "n_docs", "sc": "sum_chars"})
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["sum_chars"] = out["sum_chars"].astype(np.int64)
    return out.sort_values(["lang", "source"]).reset_index(drop=True)


def char_entropy_documents(sf_dir: str):
    """Per-document character-unigram Shannon entropy — an
    information-theoretic quality signal (low-entropy docs are repeated
    boilerplate / padding). One batch-level utf-32 transcode gives the
    flat codepoint array (dedup._codepoint_parts); per-doc counts come
    from ONE np.unique over (doc_index << 21 | codepoint) packed keys, so
    the stage is a stateless vectorized map with no shuffle. Entropy is
    emitted as floor(millibits) computed from exact integer counts with
    the same expression the DuckDB oracle uses. Emits
    (doc_id, n_cp, n_distinct, entropy_mbits)."""
    from rayschema.dedup import _codepoint_parts

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ent(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(
            pc.is_valid(b.column("text")),
            pc.greater(pc.utf8_length(b.column("text")), 0)))
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(ids)
        if n == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_cp": pa.array([], type=pa.int64()),
                             "n_distinct": pa.array([], type=pa.int64()),
                             "entropy_mbits": pa.array([], type=pa.int64())})
        arr = b.column("text")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        _, cpo, cps, _ = _codepoint_parts(arr)
        ncp = (cpo[1:] - cpo[:-1]).astype(np.int64)
        didx = np.repeat(np.arange(n, dtype=np.int64), ncp)
        key = (didx.astype(np.uint64) << np.uint64(21)) \
            | cps.astype(np.uint64)
        uk, cnt = np.unique(key, return_counts=True)
        ud = (uk >> np.uint64(21)).astype(np.int64)
        n_dist = np.bincount(ud, minlength=n).astype(np.int64)
        s = np.bincount(ud, weights=cnt * np.log2(cnt), minlength=n)
        h = np.log2(ncp.astype(np.float64)) - s / ncp
        return pa.table({
            "doc_id": pa.array(ids),
            "n_cp": pa.array(ncp),
            "n_distinct": pa.array(n_dist),
            "entropy_mbits": pa.array(
                np.floor(h * 1000.0).astype(np.int64)),
        })

    return ds.map_batches(ent, batch_format="pyarrow")


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#13"):
    """TPC-H-Q17-shaped correlated-average filter: yearly revenue lost if
    small-quantity orders (below 20% of the part's average quantity) for
    one brand were dropped. Three broadcast-narrow stages, no shuffle
    join: (1) the brand's partkeys (part is ~1/1000 of lineitem at any
    scale) per-batch-unique -> ray.put sorted array; (2) one narrow
    (partkey, qty) pass pre-aggregates per-part (sum_qty, cnt) partials ->
    tiny groupby -> broadcast arrays; (3) the filter 5*qty*cnt < sum_qty
    is an exact INTEGER cross-product (qty is integral), and revenue sums
    as integer cents. Emits one row (n_li, avg_yearly)."""
    import ray
    from ray.data.aggregate import Sum

    pt = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def pkeys(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("p_brand"), brand)
        ks = np.unique(b.filter(pc.fill_null(m, False))
                       .column("p_partkey")
                       .to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"k": pa.array(ks)})

    kdf = pt.map_batches(pkeys, batch_format="pyarrow").to_pandas()
    keys = np.unique(kdf["k"].to_numpy(np.int64)) if len(kdf) \
        else np.empty(0, np.int64)
    kref = ray.put(keys)

    def member(ids: np.ndarray, ks: np.ndarray) -> np.ndarray:
        if len(ks) == 0:
            return np.zeros(len(ids), dtype=bool)
        p = np.clip(np.searchsorted(ks, ids), 0, len(ks) - 1)
        return ks[p] == ids

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])

    def qty_partial(b: pa.Table, _k=kref) -> pa.Table:
        ids = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = member(ids, ray.get(_k))
        ids = ids[m]
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)[m] \
            .astype(np.int64)
        up, inv = np.unique(ids, return_inverse=True)
        return pa.table({
            "p": pa.array(up),
            "sq": pa.array(np.bincount(inv, weights=q).astype(np.int64)),
            "cnt": pa.array(np.bincount(inv).astype(np.int64))})

    ag = (li.map_batches(qty_partial, batch_format="pyarrow")
          .groupby("p").aggregate(Sum("sq", alias_name="sq"),
                                  Sum("cnt", alias_name="cnt"))
          .to_pandas().sort_values("p"))
    ap = ag["p"].to_numpy(np.int64)
    asq = ag["sq"].to_numpy(np.int64)
    acnt = ag["cnt"].to_numpy(np.int64)
    aref = ray.put((ap, asq, acnt))

    li2 = _read(sf_dir, "lineitem",
                columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def rev_partial(b: pa.Table, _a=aref) -> pa.Table:
        ap_, asq_, acnt_ = ray.get(_a)
        ids = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = member(ids, ap_)
        ids = ids[m]
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)[m] \
            .astype(np.int64)
        cents = _cents(b.column("l_extendedprice")
                       .to_numpy(zero_copy_only=False)[m])
        pos = np.searchsorted(ap_, ids)
        sel = 5 * q * acnt_[pos] < asq_[pos]
        return pa.table({"n": pa.array([int(sel.sum())]),
                         "c": pa.array([int(cents[sel].sum())])})

    tot = (li2.map_batches(rev_partial, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="n"), Sum("c", alias_name="c")))
    n = int(tot.get("sum(n)", tot.get("n", 0)) or 0)
    c = int(tot.get("sum(c)", tot.get("c", 0)) or 0)
    return pd.DataFrame({"n_li": np.array([n], dtype=np.int64),
                         "avg_yearly": [(c / 100.0) / 7.0]})


def q13_customer_distribution(sf_dir: str, priority: str = "1-URGENT"):
    """TPC-H-Q13-shaped outer-join distribution: how many customers
    placed exactly k orders of one priority class — INCLUDING the
    zero-order customers a plain inner groupby would drop. One narrow
    (custkey) pass pre-counts per batch, one small groupby sums
    per-customer counts, a second tiny groupby builds the distribution,
    and the zero bucket is total customers (parquet footer metadata — no
    second scan) minus sum(custdist). Emits (c_count, custdist)."""
    from ray.data.aggregate import Sum

    od = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("o_orderpriority"), priority)
        ids = b.filter(pc.fill_null(m, False)).column("o_custkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        uc, cnt = np.unique(ids, return_counts=True)
        return pa.table({"c": pa.array(uc),
                         "n": pa.array(cnt.astype(np.int64))})

    per_cust = (od.map_batches(partial, batch_format="pyarrow")
                .groupby("c").aggregate(Sum("n", alias_name="c_count")))

    def dist_partial(b: pa.Table) -> pa.Table:
        cc = b.column("c_count").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uv, cnt = np.unique(cc, return_counts=True)
        return pa.table({"c_count": pa.array(uv),
                         "d": pa.array(cnt.astype(np.int64))})

    dist = (per_cust.map_batches(dist_partial, batch_format="pyarrow")
            .groupby("c_count").aggregate(Sum("d", alias_name="custdist"))
            .to_pandas())
    dist["c_count"] = dist["c_count"].astype(np.int64)
    dist["custdist"] = dist["custdist"].astype(np.int64)
    n_total = _parquet_row_count(sf_dir, "customer")
    zero = n_total - int(dist["custdist"].sum())
    if zero > 0:
        dist = pd.concat([dist, pd.DataFrame(
            {"c_count": np.array([0], dtype=np.int64),
             "custdist": np.array([zero], dtype=np.int64)})],
            ignore_index=True)
    return dist.sort_values("c_count").reset_index(drop=True)


# --------------------------------------------------------------------------- Q14 / Q22 / Q10 / Q7 / TTR / token runs


def q14_promo_revenue(sf_dir: str):
    """TPC-H-Q14-shaped promotion-revenue share for one shipping month:
    what fraction of discounted revenue came from PROMO-type parts. The
    part side is a dimension table — its PROMO partkeys broadcast ONCE as
    a sorted array (ray.put) and membership is a stateless searchsorted
    per batch, so the big lineitem side never shuffles; the month cut is
    PUSHED TO THE PARQUET SCAN. Revenue folds as exact integer e4
    (cents x (100 - disc_pct)) and the share is emitted with a CLEARED
    DENOMINATOR — promo_ppm = floor(promo_e4 * 1e6 / total_e4) — so no
    float division crosses the oracle boundary. Emits one row
    (promo_rev_e4, total_rev_e4, promo_ppm)."""
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo, hi = pd.Timestamp("1996-03-01"), pd.Timestamp("1996-04-01")

    pt = _read(sf_dir, "part", columns=["p_partkey", "p_type"])

    def pkeys(b: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.equal(b.column("p_type"), "PROMO"), False)
        ks = np.unique(b.filter(m).column("p_partkey")
                       .to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"k": pa.array(ks)})

    kdf = pt.map_batches(pkeys, batch_format="pyarrow").to_pandas()
    keys = np.unique(kdf["k"].to_numpy(np.int64)) if len(kdf) \
        else np.empty(0, np.int64)
    kref = ray.put(keys)

    lpath = os.path.join(sf_dir, "lineitem.parquet")
    llo = _pq_schema_scalar(lpath, "l_shipdate", lo)
    lhi = _pq_schema_scalar(lpath, "l_shipdate", hi)
    lkw = {} if llo is None else dict(
        filter=(pads.field("l_shipdate") >= llo)
        & (pads.field("l_shipdate") < lhi))
    li = rd.read_parquet(
        lpath, columns=["l_partkey", "l_extendedprice", "l_discount",
                        "l_shipdate"], **lkw)
    if llo is None:
        li = li.filter(lambda r: lo.to_datetime64() <= r["l_shipdate"]
                       < hi.to_datetime64())

    def fold(b: pa.Table, _k=kref) -> pa.Table:
        ks = ray.get(_k)
        price = _cents(b.column("l_extendedprice")
                       .to_numpy(zero_copy_only=False))
        disc = np.round((1.0 - b.column("l_discount")
                         .to_numpy(zero_copy_only=False)
                         .astype(np.float64)) * 100).astype(np.int64)
        rev = price * disc
        ids = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(ks):
            p = np.clip(np.searchsorted(ks, ids), 0, len(ks) - 1)
            promo = ks[p] == ids
        else:
            promo = np.zeros(len(ids), dtype=bool)
        return pa.table({"p": pa.array([int(rev[promo].sum())]),
                         "t": pa.array([int(rev.sum())])})

    tot = (li.map_batches(fold, batch_format="pyarrow")
           .aggregate(Sum("p", alias_name="p"), Sum("t", alias_name="t")))
    pv = int(tot.get("sum(p)", tot.get("p", 0)) or 0)
    tv = int(tot.get("sum(t)", tot.get("t", 0)) or 0)
    ppm = (pv * 1_000_000) // tv if tv else 0
    return pd.DataFrame({"promo_rev_e4": np.array([pv], dtype=np.int64),
                         "total_rev_e4": np.array([tv], dtype=np.int64),
                         "promo_ppm": np.array([ppm], dtype=np.int64)})


def q22_no_order_customers(sf_dir: str, priority: str = "1-URGENT"):
    """TPC-H-Q22-shaped global-sales-opportunity scan: customers whose
    account balance exceeds the average POSITIVE balance yet who placed
    no URGENT orders, counted per market segment. (The synthetic orders
    table covers EVERY custkey, so Q22's plain "no orders" anti-join is
    empty by construction — the priority cut keeps the anti-join
    selective while preserving the exact Q22 plan shape.) The wealth
    threshold is an EXACT RATIONAL compare (cents * n_pos >
    sum_pos_cents — no float average crosses the oracle boundary)
    computed from one metadata-sized fold; the anti-join is a
    distinct-custkey broadcast (one narrow filtered orders pass, q4's
    EXISTS shape inverted — past the broadcast cap the distributed
    keyed anti-join scan of curation_pipeline_documents is the
    documented fallback shape). Emits
    (c_mktsegment, n_cust, sum_bal_cents)."""
    import ray
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_acctbal", "c_mktsegment"])

    def bal_fold(b: pa.Table) -> pa.Table:
        cents = _cents(b.column("c_acctbal").to_numpy(zero_copy_only=False))
        pos = cents > 0
        return pa.table({"s": pa.array([int(cents[pos].sum())]),
                         "n": pa.array([int(pos.sum())])})

    tot = cust.map_batches(bal_fold, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    sum_pos = int(tot.get("sum(s)", tot.get("s", 0)) or 0)
    n_pos = int(tot.get("sum(n)", tot.get("n", 0)) or 0)

    od = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def okeys(b: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.equal(b.column("o_orderpriority"), priority),
                         False)
        ks = np.unique(b.filter(m).column("o_custkey")
                       .to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"k": pa.array(ks)})

    okdf = od.map_batches(okeys, batch_format="pyarrow").to_pandas()
    okeys_arr = np.unique(okdf["k"].to_numpy(np.int64)) if len(okdf) \
        else np.empty(0, np.int64)
    oref = ray.put(okeys_arr)

    def fold(b: pa.Table, _o=oref, _s=sum_pos, _n=n_pos) -> pa.Table:
        ok = ray.get(_o)
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = _cents(b.column("c_acctbal").to_numpy(zero_copy_only=False))
        rich = cents * _n > _s          # exact rational threshold
        if len(ok):
            p = np.clip(np.searchsorted(ok, ck), 0, len(ok) - 1)
            has_order = ok[p] == ck
        else:
            has_order = np.zeros(len(ck), dtype=bool)
        keep = rich & ~has_order
        seg = b.column("c_mktsegment").to_numpy(zero_copy_only=False)[keep]
        cents = cents[keep]
        df = pd.DataFrame({"c_mktsegment": seg, "c": cents})
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n_cust=("c", "size"), sum_bal_cents=("c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (cust.map_batches(fold, batch_format="pyarrow")
           .groupby("c_mktsegment")
           .aggregate(Sum("n_cust", alias_name="n_cust"),
                      Sum("sum_bal_cents", alias_name="sum_bal_cents"))
           .to_pandas())
    if "n_cust" not in out.columns:      # empty aggregate -> empty frame
        return pd.DataFrame({"c_mktsegment": pd.Series([], dtype=object),
                             "n_cust": pd.Series([], dtype=np.int64),
                             "sum_bal_cents": pd.Series([], dtype=np.int64)})
    out["n_cust"] = out["n_cust"].astype(np.int64)
    out["sum_bal_cents"] = out["sum_bal_cents"].astype(np.int64)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def q10_returned_items(sf_dir: str):
    """TPC-H-Q10-shaped returned-item report: top-20 customers by revenue
    lost to 'R'-flagged lineitems for orders placed in one quarter. The
    quarter cut is PUSHED TO THE ORDERS SCAN; the returnflag cut prunes
    lineitem at the read via a parquet row filter. The orderkey join is
    adaptive (broadcast orderkey->custkey arrays under Q3_BROADCAST_CAP,
    Dataset.join hash exchange past it), revenue folds per custkey as
    exact integer e4, the top-20 is per-block local top-20 + a
    blocks x 20 driver merge (no global sort), and only the 20 winner
    custkeys ever touch the customer/nation dimension lookups. Emits
    (c_custkey, c_name, n_name, revenue_e4)."""
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")

    opath = os.path.join(sf_dir, "orders.parquet")
    olo = _pq_schema_scalar(opath, "o_orderdate", lo)
    ohi = _pq_schema_scalar(opath, "o_orderdate", hi)
    okw = {} if olo is None else dict(
        filter=(pads.field("o_orderdate") >= olo)
        & (pads.field("o_orderdate") < ohi))
    orders = rd.read_parquet(
        opath, columns=["o_orderkey", "o_custkey", "o_orderdate"], **okw)
    if olo is None:
        orders = orders.filter(
            lambda r: lo.to_datetime64() <= r["o_orderdate"]
            < hi.to_datetime64())
    orders = orders.select_columns(["o_orderkey", "o_custkey"])

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
        filter=pads.field("l_returnflag") == "R")

    def li_prep(b: pa.Table) -> pa.Table:
        price = _cents(b.column("l_extendedprice")
                       .to_numpy(zero_copy_only=False))
        disc = np.round((1.0 - b.column("l_discount")
                         .to_numpy(zero_copy_only=False)
                         .astype(np.float64)) * 100).astype(np.int64)
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "rev_e4": pa.array(price * disc)})

    liq = li.map_batches(li_prep, batch_format="pyarrow")

    orders = orders.materialize()
    n_ord = orders.count()
    if n_ord <= Q3_BROADCAST_CAP:
        odf = orders.to_pandas().sort_values("o_orderkey")
        oref = ray.put((odf["o_orderkey"].to_numpy(np.int64),
                        odf["o_custkey"].to_numpy(np.int64)))

        def lookup(b: pa.Table, _o=oref) -> pa.Table:
            ok, oc = ray.get(_o)
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            rev = b.column("rev_e4").to_numpy(zero_copy_only=False)
            if len(ok):
                p = np.clip(np.searchsorted(ok, lk), 0, len(ok) - 1)
                hit = ok[p] == lk
                ck = oc[p]
            else:
                hit = np.zeros(len(lk), dtype=bool)
                ck = lk
            ck, rev = ck[hit], rev[hit]
            uc, inv = np.unique(ck, return_inverse=True)
            return pa.table({
                "c_custkey": pa.array(uc),
                "rev_e4": pa.array(
                    np.bincount(inv, weights=rev).astype(np.int64))})

        per_cust = (liq.map_batches(lookup, batch_format="pyarrow")
                    .groupby("c_custkey")
                    .aggregate(Sum("rev_e4", alias_name="rev_e4")))
    else:
        est = (liq.size_bytes() or 0) + (orders.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))
        per_cust = (liq.join(orders, join_type="inner",
                             num_partitions=n_parts,
                             on=("l_orderkey",), right_on=("o_orderkey",))
                    .groupby("o_custkey")
                    .aggregate(Sum("rev_e4", alias_name="rev_e4")))
        per_cust = per_cust.map_batches(
            lambda b: b.rename_columns(["c_custkey", "rev_e4"]),
            batch_format="pyarrow")

    def local_top(b: pa.Table) -> pa.Table:
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rv = b.column("rev_e4").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        o = np.lexsort((ck, -rv))[:20]
        return pa.table({"c_custkey": pa.array(ck[o]),
                         "rev_e4": pa.array(rv[o])})

    cand = (per_cust.map_batches(local_top, batch_format="pyarrow")
            .to_pandas()
            .sort_values(["rev_e4", "c_custkey"], ascending=[False, True])
            .head(20))
    win = np.sort(cand["c_custkey"].to_numpy(np.int64))
    wref = ray.put(win)

    def name_lookup(b: pa.Table, _w=wref) -> pa.Table:
        w = ray.get(_w)
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(w):
            p = np.clip(np.searchsorted(w, ck), 0, len(w) - 1)
            hit = w[p] == ck
        else:
            hit = np.zeros(len(ck), dtype=bool)
        return b.filter(pa.array(hit))

    names = (_read(sf_dir, "customer",
                   columns=["c_custkey", "c_name", "c_nationkey"])
             .map_batches(name_lookup, batch_format="pyarrow").to_pandas())
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    out = cand.merge(names, on="c_custkey", how="inner")
    out["c_nationkey"] = out["c_nationkey"].astype(np.int64)
    nat["n_nationkey"] = nat["n_nationkey"].astype(np.int64)
    out = out.merge(nat, left_on="c_nationkey", right_on="n_nationkey",
                    how="left")
    out = out.rename(columns={"rev_e4": "revenue_e4"})
    out["revenue_e4"] = out["revenue_e4"].astype(np.int64)
    return (out[["c_custkey", "c_name", "n_name", "revenue_e4"]]
            .sort_values(["revenue_e4", "c_custkey"],
                         ascending=[False, True])
            .reset_index(drop=True))


def q7_volume_shipping(sf_dir: str, nation_a: str = "NATION_1",
                       nation_b: str = "NATION_2"):
    """TPC-H-Q7-shaped cross-nation volume: discounted revenue shipped
    between two nations (supplier in one, customer in the other, both
    directions) grouped by (supp_nation, cust_nation, ship_year). Both
    dimension sides broadcast (supplier suppkey->nationkey; nation keys
    resolve on the driver); the orders⋈customer custkey join is adaptive
    exactly like q5; the big lineitem side joins orderkey->cust-nation
    via ONE hash exchange and everything after is stateless per-batch
    kernels: supplier lookup, pair filter, year extraction, and a
    <= 2 x years fold. Revenue in exact integer e4. Emits
    (supp_nation, cust_nation, l_year, revenue_e4)."""
    import ray

    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    sel = nat[nat["n_name"].isin([nation_a, nation_b])] \
        .sort_values("n_nationkey")
    nkeys = sel["n_nationkey"].to_numpy(np.int64)
    name_of = dict(zip(sel["n_nationkey"].astype(np.int64),
                       sel["n_name"]))
    if len(nkeys) < 2:
        return pd.DataFrame({"supp_nation": pd.Series([], dtype=object),
                             "cust_nation": pd.Series([], dtype=object),
                             "l_year": pd.Series([], dtype=np.int64),
                             "revenue_e4": pd.Series([], dtype=np.int64)})

    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey"]).to_pandas() \
        .sort_values("s_suppkey")
    sref = ray.put((sup["s_suppkey"].to_numpy(np.int64),
                    sup["s_nationkey"].to_numpy(np.int64)))
    nref = ray.put(nkeys)

    def cust_filter(b: pa.Table, _n=nref) -> pa.Table:
        nk = ray.get(_n)
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cn = b.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = np.clip(np.searchsorted(nk, cn), 0, len(nk) - 1)
        keep = nk[p] == cn
        return pa.table({"c_custkey": pa.array(ck[keep]),
                         "c_nationkey": pa.array(cn[keep])})

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]) \
        .map_batches(cust_filter, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    cust = cust.materialize()   # one execution: count + pull share blocks
    n_cust = cust.count()
    if n_cust <= Q3_BROADCAST_CAP:
        cdf = cust.to_pandas().sort_values("c_custkey")
        cref = ray.put((cdf["c_custkey"].to_numpy(np.int64),
                        cdf["c_nationkey"].to_numpy(np.int64)))

        def o_lookup(b: pa.Table, _c=cref) -> pa.Table:
            ck, cn = ray.get(_c)
            ok_ = b.column("o_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            oc = b.column("o_custkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if len(ck):
                p = np.clip(np.searchsorted(ck, oc), 0, len(ck) - 1)
                keep = ck[p] == oc
                nk = cn[p]
            else:
                keep = np.zeros(len(ok_), dtype=bool)
                nk = oc
            return pa.table({"o_orderkey": pa.array(ok_[keep]),
                             "c_nationkey": pa.array(nk[keep])})

        ord_nat = orders.map_batches(o_lookup, batch_format="pyarrow")
    else:
        est = (orders.size_bytes() or 0) + (cust.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))
        ord_nat = orders.join(
            cust, join_type="inner", num_partitions=n_parts,
            on=("o_custkey",), right_on=("c_custkey",)) \
            .select_columns(["o_orderkey", "c_nationkey"])

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount", "l_shipdate"])

    def li_prep(b: pa.Table, _s=sref, _n=nref) -> pa.Table:
        sk, sn = ray.get(_s)
        nk = ray.get(_n)
        ls = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = np.clip(np.searchsorted(sk, ls), 0, len(sk) - 1)
        keep = (sk[p] == ls)
        snat = sn[p]
        q = np.clip(np.searchsorted(nk, snat), 0, len(nk) - 1)
        keep &= nk[q] == snat            # supplier in one of the 2 nations
        price = _cents(b.column("l_extendedprice")
                       .to_numpy(zero_copy_only=False))
        disc = np.round((1.0 - b.column("l_discount")
                         .to_numpy(zero_copy_only=False)
                         .astype(np.float64)) * 100).astype(np.int64)
        year = pd.DatetimeIndex(
            b.column("l_shipdate").to_pandas()).year.to_numpy(np.int64)
        lk = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"l_orderkey": pa.array(lk[keep]),
                         "s_nationkey": pa.array(snat[keep]),
                         "l_year": pa.array(year[keep]),
                         "rev_e4": pa.array((price * disc)[keep])})

    liq = li.map_batches(li_prep, batch_format="pyarrow")

    # the lineitem⋈orders orderkey join is adaptive too: ord_nat is only
    # the 2-nation customers' orders, so at small scale it broadcasts as
    # (orderkey -> cust-nation) arrays and the join is a stateless lookup;
    # past the cap it's the hash exchange.
    ord_nat = ord_nat.materialize()
    n_ord = ord_nat.count()
    if n_ord <= Q3_BROADCAST_CAP:
        odf = ord_nat.to_pandas().sort_values("o_orderkey")
        onref = ray.put((odf["o_orderkey"].to_numpy(np.int64),
                         odf["c_nationkey"].to_numpy(np.int64)))

        def attach(b: pa.Table, _o=onref) -> pa.Table:
            ok, cn = ray.get(_o)
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if len(ok):
                p = np.clip(np.searchsorted(ok, lk), 0, len(ok) - 1)
                hit = ok[p] == lk
                cnat = cn[p]
            else:
                hit = np.zeros(len(lk), dtype=bool)
                cnat = lk
            return pa.table({
                "s_nationkey": b.column("s_nationkey").filter(
                    pa.array(hit)),
                "l_year": b.column("l_year").filter(pa.array(hit)),
                "rev_e4": b.column("rev_e4").filter(pa.array(hit)),
                "c_nationkey": pa.array(cnat[hit])})

        joined = liq.map_batches(attach, batch_format="pyarrow")
    else:
        est = (li.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))
        joined = liq.join(
            ord_nat, join_type="inner", num_partitions=n_parts,
            on=("l_orderkey",), right_on=("o_orderkey",))

    def fold(b: pa.Table) -> pa.Table:
        sn = b.column("s_nationkey").to_numpy(zero_copy_only=False)
        cn = b.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = sn != cn                  # cross-nation only
        yr = b.column("l_year").to_numpy(zero_copy_only=False)[keep]
        rev = b.column("rev_e4").to_numpy(zero_copy_only=False)[keep]
        df = pd.DataFrame({"s": sn[keep], "c": cn[keep], "y": yr,
                           "r": rev})
        g = df.groupby(["s", "c", "y"], as_index=False)["r"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = joined.map_batches(fold, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({"supp_nation": pd.Series([], dtype=object),
                             "cust_nation": pd.Series([], dtype=object),
                             "l_year": pd.Series([], dtype=np.int64),
                             "revenue_e4": pd.Series([], dtype=np.int64)})
    agg = parts.groupby(["s", "c", "y"], as_index=False)["r"].sum()
    agg["supp_nation"] = agg["s"].map(name_of)
    agg["cust_nation"] = agg["c"].map(name_of)
    agg = agg.rename(columns={"y": "l_year", "r": "revenue_e4"})
    agg["l_year"] = agg["l_year"].astype(np.int64)
    agg["revenue_e4"] = agg["revenue_e4"].astype(np.int64)
    return (agg[["supp_nation", "cust_nation", "l_year", "revenue_e4"]]
            .sort_values(["supp_nation", "cust_nation", "l_year"])
            .reset_index(drop=True))


def ttr_documents(sf_dir: str):
    """Per-document lexical-richness profile: token count, distinct-type
    count, hapax count (types occurring exactly once in the doc), and
    type-token ratio in EXACT integer millionths (floor(types*1e6/tokens)
    — no float division crosses the oracle boundary). Tokens are the
    space-split convention shared with tfidf/vocabulary (empty strings
    from consecutive spaces count, mirroring SQL string_split). The whole
    stage is ONE stateless vectorized map: Arrow dictionary_encode hashes
    every occurrence and per-(doc, type) multiplicities come from one
    int-code lexsort — no shuffle, nothing on the driver. Emits
    (doc_id, n_tokens, n_types, n_hapax, ttr_ppm)."""
    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def prof(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(ids)
        if n == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_tokens": pa.array([], type=pa.int64()),
                             "n_types": pa.array([], type=pa.int64()),
                             "n_hapax": pa.array([], type=pa.int64()),
                             "ttr_ppm": pa.array([], type=pa.int64())})
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, counts, didx = _flatten_words_arrow(col)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        key = didx * (int(codes.max()) + 1 if len(codes) else 1) + codes
        uk, mult = np.unique(key, return_counts=True)
        ud = uk // (int(codes.max()) + 1 if len(codes) else 1)
        n_types = np.bincount(ud, minlength=n).astype(np.int64)
        n_hapax = np.bincount(ud[mult == 1], minlength=n).astype(np.int64)
        n_tok = counts.astype(np.int64)
        ppm = np.where(n_tok > 0, (n_types * 1_000_000) // np.maximum(
            n_tok, 1), 0).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids),
                         "n_tokens": pa.array(n_tok),
                         "n_types": pa.array(n_types),
                         "n_hapax": pa.array(n_hapax),
                         "ttr_ppm": pa.array(ppm)})

    return ds.map_batches(prof, batch_format="pyarrow")


def max_token_run_documents(sf_dir: str):
    """Per-document longest run of the SAME consecutive token — the
    run-length repetition signal ('batch batch batch' boilerplate) that
    complements the n-gram repetition metrics: Gopher's dup-fraction
    misses short high-multiplicity runs. One stateless vectorized map:
    tokens dictionary_encode to int codes, run boundaries are one
    adjacent-compare (codes differ OR doc changes), per-run lengths come
    from boundary diffs, and the per-doc max + the lexicographically
    SMALLEST token achieving it (deterministic tie-break) fall out of one
    lexsort over (doc, -len, token_rank). Emits
    (doc_id, max_run, run_token)."""
    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def runs(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(ids)
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "max_run": pa.array([], type=pa.int64()),
                          "run_token": pa.array([], type=pa.string())})
        if n == 0:
            return empty
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, counts, didx = _flatten_words_arrow(col)
        if len(didx) == 0:
            return empty
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dic = enc.dictionary.to_numpy(zero_copy_only=False)
        # lexicographic rank of each dictionary entry (tie-break key)
        rank = np.empty(len(dic), dtype=np.int64)
        rank[np.argsort(dic, kind="stable")] = np.arange(len(dic))
        new_run = np.empty(len(codes), dtype=bool)
        new_run[0] = True
        new_run[1:] = (codes[1:] != codes[:-1]) | (didx[1:] != didx[:-1])
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(codes))
        rlen = (ends - starts).astype(np.int64)
        rdoc = didx[starts]
        rcode = codes[starts]
        rrank = rank[rcode]
        # per doc: max run length, smallest token rank among ties
        o = np.lexsort((rrank, -rlen, rdoc))
        first = np.empty(len(o), dtype=bool)
        first[0] = True
        first[1:] = rdoc[o][1:] != rdoc[o][:-1]
        sel = o[first]
        toks = dic[rcode[sel]]
        return pa.table({"doc_id": pa.array(ids[rdoc[sel]]),
                         "max_run": pa.array(rlen[sel]),
                         "run_token": pa.array(toks, type=pa.string())})

    return ds.map_batches(runs, batch_format="pyarrow")


# --------------------------------------------------------------------------- Bloom-filter semi-join


BLOOM_BITS = 20           # 2^20 bits = 128 KB packed broadcast
BLOOM_K = 4               # hash functions; fp ~ (1-e^{-kn/m})^k


def _bloom_positions(ids: np.ndarray, bits: int, k: int) -> np.ndarray:
    """(len(ids), k) bit positions via double hashing h1 + i*h2 — the
    standard Kirsch-Mitzenmacher construction, all vectorized uint64."""
    from rayschema.dedup import _mix64

    with np.errstate(over="ignore"):
        x = ids.astype(np.uint64)
        h1 = _mix64(x)
        h2 = _mix64(x ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        i = np.arange(k, dtype=np.uint64)
        pos = (h1[:, None] + i[None, :] * h2[:, None]) \
            & np.uint64((1 << bits) - 1)
    return pos.astype(np.int64)


def _bloom_build(ids: np.ndarray, bits: int = BLOOM_BITS,
                 k: int = BLOOM_K) -> np.ndarray:
    """Packed (uint8) Bloom filter of the id set."""
    m = np.zeros(1 << bits, dtype=bool)
    if len(ids):
        m[_bloom_positions(ids, bits, k).ravel()] = True
    return np.packbits(m)


def _bloom_member(ids: np.ndarray, packed: np.ndarray,
                  bits: int = BLOOM_BITS, k: int = BLOOM_K) -> np.ndarray:
    """Vectorized maybe-membership (no false negatives)."""
    if not len(ids):
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(ids, bits, k)
    bit = (packed[pos >> 3] >> (7 - (pos & 7))) & 1
    return bit.all(axis=1)


def bloom_semi_join_orders(sf_dir: str, segment: str = "BUILDING",
                           verify_cap: int = None):
    """EXACT semi-join via a Bloom pre-filter — the membership-join shape
    for when the key-set side outgrows a raw sorted-array broadcast:
    (1) one filtered customer pass builds per-batch 128 KB packed Bloom
    partials (2^20 bits, k=4 double-hashing) OR-reduced on the driver —
    driver state is the FIXED filter size, never O(keys); (2) the big
    orders side drops every definite non-member per batch (no false
    negatives, fp ~1e-4 at 30k keys); (3) only the candidate RESIDUE is
    exactly verified — broadcast sorted-key searchsorted under the cap,
    hash-exchange semi-join past it — so the expensive exact machinery
    touches ~selectivity x rows instead of all rows. Result is EXACT
    (Bloom errs only toward extra verify work). Emits per-priority
    (o_orderpriority, n_orders, sum_total_cents)."""
    import ray
    from ray.data.aggregate import Sum

    cap = Q3_BROADCAST_CAP if verify_cap is None else verify_cap

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"])

    def bloom_partial(b: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.equal(b.column("c_mktsegment"), segment),
                         False)
        ks = b.filter(m).column("c_custkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"bloom": pa.array([_bloom_build(ks).tobytes()],
                                           type=pa.binary()),
                         "n": pa.array([len(ks)])})

    def or_within(b: pa.Table) -> pa.Table:
        acc = np.zeros((1 << BLOOM_BITS) // 8, dtype=np.uint8)
        n = 0
        for blob, k in zip(b.column("bloom").to_pylist(),
                           b.column("n").to_pylist()):
            acc |= np.frombuffer(blob, dtype=np.uint8)
            n += int(k)
        return pa.table({"bloom": pa.array([acc.tobytes()],
                                           type=pa.binary()),
                         "n": pa.array([n])})

    # tree OR-reduce: per-block partials fold to <= 32 before the driver
    # sees them — driver bytes stay O(32 x filter size), not O(blocks)
    parts = (cust.map_batches(bloom_partial, batch_format="pyarrow")
             .repartition(32)
             .map_batches(or_within, batch_size=None,
                          batch_format="pyarrow")
             .to_pandas())
    acc = np.zeros((1 << BLOOM_BITS) // 8, dtype=np.uint8)
    n_keys = 0
    for blob, n in zip(parts["bloom"], parts["n"]):
        acc |= np.frombuffer(blob, dtype=np.uint8)
        n_keys += int(n)
    bref = ray.put(acc)

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderpriority", "o_totalprice"])

    def prefilter(b: pa.Table, _b=bref) -> pa.Table:
        packed = ray.get(_b)
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        maybe = _bloom_member(ck, packed)
        t = b.filter(pa.array(maybe))
        cents = _cents(t.column("o_totalprice")
                       .to_numpy(zero_copy_only=False))
        return pa.table({"o_custkey": t.column("o_custkey"),
                         "o_orderpriority": t.column("o_orderpriority"),
                         "cents": pa.array(cents)})

    cand = orders.map_batches(prefilter, batch_format="pyarrow")

    if n_keys <= cap:
        # exact verify: broadcast the true sorted key set once
        def true_keys(b: pa.Table) -> pa.Table:
            m = pc.fill_null(pc.equal(b.column("c_mktsegment"), segment),
                             False)
            ks = np.unique(b.filter(m).column("c_custkey")
                           .to_numpy(zero_copy_only=False)
                           .astype(np.int64))
            return pa.table({"k": pa.array(ks)})

        kdf = cust.map_batches(true_keys, batch_format="pyarrow") \
            .to_pandas()
        keys = np.unique(kdf["k"].to_numpy(np.int64)) if len(kdf) \
            else np.empty(0, np.int64)
        kref = ray.put(keys)

        def verify(b: pa.Table, _k=kref) -> pa.Table:
            ks = ray.get(_k)
            ck = b.column("o_custkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if len(ks):
                p = np.clip(np.searchsorted(ks, ck), 0, len(ks) - 1)
                hit = ks[p] == ck
            else:
                hit = np.zeros(len(ck), dtype=bool)
            t = b.filter(pa.array(hit))
            df = pd.DataFrame({
                "o_orderpriority": t.column("o_orderpriority")
                .to_numpy(zero_copy_only=False),
                "cents": t.column("cents").to_numpy(zero_copy_only=False)})
            g = df.groupby("o_orderpriority", as_index=False).agg(
                n_orders=("cents", "size"),
                sum_total_cents=("cents", "sum"))
            return pa.Table.from_pandas(g, preserve_index=False)

        folded = cand.map_batches(verify, batch_format="pyarrow")
    else:
        ckeys = cust.filter(
            expr=f"c_mktsegment == '{segment}'") \
            .select_columns(["c_custkey"])
        est = (cand.size_bytes() or 0) + (ckeys.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))
        joined = cand.join(ckeys, join_type="inner",
                           num_partitions=n_parts,
                           on=("o_custkey",), right_on=("c_custkey",))

        def fold(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "o_orderpriority": b.column("o_orderpriority")
                .to_numpy(zero_copy_only=False),
                "cents": b.column("cents").to_numpy(zero_copy_only=False)})
            g = df.groupby("o_orderpriority", as_index=False).agg(
                n_orders=("cents", "size"),
                sum_total_cents=("cents", "sum"))
            return pa.Table.from_pandas(g, preserve_index=False)

        folded = joined.map_batches(fold, batch_format="pyarrow")

    out = (folded.groupby("o_orderpriority")
           .aggregate(Sum("n_orders", alias_name="n_orders"),
                      Sum("sum_total_cents", alias_name="sum_total_cents"))
           .to_pandas())
    if "n_orders" not in out.columns:
        return pd.DataFrame({"o_orderpriority": pd.Series([], dtype=object),
                             "n_orders": pd.Series([], dtype=np.int64),
                             "sum_total_cents": pd.Series([],
                                                          dtype=np.int64)})
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["sum_total_cents"] = out["sum_total_cents"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def distinct_users_per_type(sf_dir: str):
    """Exact grouped COUNT DISTINCT at scale: unique users per event
    type. The classic two-level plan: each batch first collapses to its
    LOCAL distinct (event_type, user_id) pairs (one packed-key np.unique
    — at 100 TB this is the big reduction: a user's events cluster in
    time-ordered blocks), the narrow pair stream then dedups globally via
    ONE pair-keyed groupby count (the only shuffle — 16 B rows), and the
    distinct-pair stream folds to per-type counts with batch partials +
    a type-cardinality-sized final aggregate. No sketch error (HLL is the
    documented approximate alternative, sketches.py), no driver state.
    Emits (event_type, n_users)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def local_pairs(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(pc.is_valid(b.column("event_type")),
                             pc.is_valid(b.column("user_id"))))
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        users = t.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        key = (codes.astype(np.uint64) << np.uint64(48)) \
            | users.astype(np.uint64)
        uk = np.unique(key)
        ucodes = (uk >> np.uint64(48)).astype(np.int64)
        uusers = (uk & np.uint64((1 << 48) - 1)).astype(np.int64)
        dic = enc.dictionary.to_numpy(zero_copy_only=False)
        return pa.table({"event_type": pa.array(dic[ucodes],
                                                type=pa.string()),
                         "user_id": pa.array(uusers)})

    pairs = (ds.map_batches(local_pairs, batch_format="pyarrow")
             .groupby(["event_type", "user_id"]).count())

    def fold(b: pa.Table) -> pa.Table:
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": et})
        g = df.groupby("event_type", as_index=False).size() \
            .rename(columns={"size": "n_users"})
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (pairs.map_batches(fold, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n_users", alias_name="n_users"))
           .to_pandas())
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def q19_discounted_revenue(sf_dir: str):
    """TPC-H-Q19-shaped disjunctive-predicate revenue: an OR of three
    (brand, size-range, quantity-window) conjunction arms — the classic
    'predicate too twisty for scan pushdown' case. The part side is a
    dimension table: per-partkey (brand-id, size) attributes broadcast
    ONCE as sorted arrays, and the whole disjunction evaluates as three
    vectorized boolean arms per lineitem batch — no join, no shuffle;
    only the final 1-row integer-e4 fold aggregates. Emits
    (n_li, revenue_e4)."""
    import ray
    from ray.data.aggregate import Sum

    ARMS = [("Brand#11", 1, 5, 1, 11),     # (brand, size_lo, size_hi,
            ("Brand#22", 1, 10, 10, 20),   #  qty_lo, qty_hi)
            ("Brand#33", 1, 15, 20, 30)]

    pt = _read(sf_dir, "part",
               columns=["p_partkey", "p_brand", "p_size"]).to_pandas() \
        .sort_values("p_partkey")
    pkeys = pt["p_partkey"].to_numpy(np.int64)
    brands = [a[0] for a in ARMS]
    bid = np.full(len(pt), -1, dtype=np.int64)
    for i, b in enumerate(brands):
        bid[(pt["p_brand"] == b).to_numpy()] = i
    psize = pt["p_size"].to_numpy(np.int64)
    pref = ray.put((pkeys, bid, psize))

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])

    def fold(b: pa.Table, _p=pref) -> pa.Table:
        pk, pb, ps = ray.get(_p)
        ids = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.clip(np.searchsorted(pk, ids), 0, len(pk) - 1)
        hit = pk[pos] == ids
        ab, asz = pb[pos], ps[pos]
        q = b.column("l_quantity").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sel = np.zeros(len(ids), dtype=bool)
        for i, (_, slo, shi, qlo, qhi) in enumerate(ARMS):
            sel |= (hit & (ab == i) & (asz >= slo) & (asz <= shi)
                    & (q >= qlo) & (q <= qhi))
        price = _cents(b.column("l_extendedprice")
                       .to_numpy(zero_copy_only=False))
        disc = np.round((1.0 - b.column("l_discount")
                         .to_numpy(zero_copy_only=False)
                         .astype(np.float64)) * 100).astype(np.int64)
        rev = (price * disc)[sel]
        return pa.table({"n": pa.array([int(sel.sum())]),
                         "r": pa.array([int(rev.sum())])})

    tot = (li.map_batches(fold, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="n"), Sum("r", alias_name="r")))
    n = int(tot.get("sum(n)", tot.get("n", 0)) or 0)
    r = int(tot.get("sum(r)", tot.get("r", 0)) or 0)
    return pd.DataFrame({"n_li": np.array([n], dtype=np.int64),
                         "revenue_e4": np.array([r], dtype=np.int64)})


def q12_late_shipments(sf_dir: str, late_days: int = 90):
    """TPC-H-Q12-shaped shipping-delay audit: per order priority, how
    many lineitems shipped late (l_shipdate > o_orderdate + late_days)
    vs on time. The orderkey->（orderdate, priority) side is adaptive
    (broadcast sorted arrays under the cap — orderdate as int64 epoch-days
    so the compare is pure integer — hash exchange past it); the lineitem
    pass is stateless. Priorities are a bounded domain, so partials fold
    per batch into a <= |priorities| final aggregate. Emits
    (o_orderpriority, n_late, n_ontime)."""
    import ray
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    orders = orders.materialize()
    n_ord = orders.count()
    if n_ord <= Q3_BROADCAST_CAP:
        odf = orders.to_pandas().sort_values("o_orderkey")
        okeys = odf["o_orderkey"].to_numpy(np.int64)
        odays = pd.DatetimeIndex(odf["o_orderdate"]).values \
            .astype("datetime64[D]").astype(np.int64)
        uprio, pid = np.unique(odf["o_orderpriority"].to_numpy(object),
                               return_inverse=True)
        oref = ray.put((okeys, odays, pid.astype(np.int64)))
        prios = [str(p) for p in uprio]

        def fold(b: pa.Table, _o=oref, _np=len(prios)) -> pa.Table:
            ok, od, opr = ray.get(_o)
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            sd = pd.DatetimeIndex(b.column("l_shipdate").to_pandas()) \
                .values.astype("datetime64[D]").astype(np.int64)
            pos = np.clip(np.searchsorted(ok, lk), 0, len(ok) - 1)
            hit = ok[pos] == lk
            late = hit & (sd > od[pos] + late_days)
            ontime = hit & ~late
            pr = opr[pos]
            nl = np.bincount(pr[late], minlength=_np).astype(np.int64)
            no = np.bincount(pr[ontime], minlength=_np).astype(np.int64)
            return pa.table({"p": pa.array(np.arange(_np, dtype=np.int64)),
                             "n_late": pa.array(nl),
                             "n_ontime": pa.array(no)})

        agg = (li.map_batches(fold, batch_format="pyarrow")
               .groupby("p")
               .aggregate(Sum("n_late", alias_name="n_late"),
                          Sum("n_ontime", alias_name="n_ontime"))
               .to_pandas())
        agg["o_orderpriority"] = agg["p"].map(dict(enumerate(prios)))
    else:
        est = (li.size_bytes() or 0) + (orders.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))
        joined = li.join(orders, join_type="inner",
                         num_partitions=n_parts,
                         on=("l_orderkey",), right_on=("o_orderkey",))

        def jfold(b: pa.Table) -> pa.Table:
            sd = pd.DatetimeIndex(b.column("l_shipdate").to_pandas()) \
                .values.astype("datetime64[D]").astype(np.int64)
            od = pd.DatetimeIndex(b.column("o_orderdate").to_pandas()) \
                .values.astype("datetime64[D]").astype(np.int64)
            late = sd > od + late_days
            df = pd.DataFrame({
                "o_orderpriority": b.column("o_orderpriority")
                .to_numpy(zero_copy_only=False),
                "n_late": late.astype(np.int64),
                "n_ontime": (~late).astype(np.int64)})
            g = df.groupby("o_orderpriority", as_index=False).agg(
                n_late=("n_late", "sum"), n_ontime=("n_ontime", "sum"))
            return pa.Table.from_pandas(g, preserve_index=False)

        agg = (joined.map_batches(jfold, batch_format="pyarrow")
               .groupby("o_orderpriority")
               .aggregate(Sum("n_late", alias_name="n_late"),
                          Sum("n_ontime", alias_name="n_ontime"))
               .to_pandas())

    agg = agg[(agg["n_late"] + agg["n_ontime"]) > 0]
    agg["n_late"] = agg["n_late"].astype(np.int64)
    agg["n_ontime"] = agg["n_ontime"].astype(np.int64)
    return (agg[["o_orderpriority", "n_late", "n_ontime"]]
            .sort_values("o_orderpriority").reset_index(drop=True))


def q8_market_share(sf_dir: str, nation: str = "NATION_5",
                    region: str = "AFRICA"):
    """TPC-H-Q8-shaped market share: the target nation's share of a
    region's yearly customer revenue, supplier-side attributed. Reuses
    the q5/q7 adaptive join skeleton — region->nations resolved on the
    driver, in-region customers semi-filtered statelessly, the custkey
    and orderkey joins adaptive broadcast-vs-hash — then per-batch
    partials fold (year, total_e4, nation_e4) into a <= |years| result.
    The share ships as floor-ppm with a CLEARED DENOMINATOR (no float
    division crosses the oracle). Emits
    (o_year, total_e4, nation_e4, share_ppm)."""
    import ray
    from ray.data.aggregate import Sum

    reg = _read(sf_dir, "region").to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"]
                .astype(np.int64))
    nat = _read(sf_dir, "nation").to_pandas()
    in_region = nat[nat["n_regionkey"].astype(np.int64).isin(rkeys)] \
        .sort_values("n_nationkey")
    nkeys = in_region["n_nationkey"].to_numpy(np.int64)
    tgt = nat.loc[nat["n_name"] == nation, "n_nationkey"]
    tgt_key = int(tgt.iloc[0]) if len(tgt) else -1

    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey"]).to_pandas() \
        .sort_values("s_suppkey")
    sref = ray.put((sup["s_suppkey"].to_numpy(np.int64),
                    sup["s_nationkey"].to_numpy(np.int64)))
    nref = ray.put(nkeys)

    def cust_filter(b: pa.Table, _n=nref) -> pa.Table:
        nk = ray.get(_n)
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cn = b.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(nk):
            p = np.clip(np.searchsorted(nk, cn), 0, len(nk) - 1)
            keep = nk[p] == cn
        else:
            keep = np.zeros(len(ck), dtype=bool)
        return pa.table({"c_custkey": pa.array(ck[keep])})

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]) \
        .map_batches(cust_filter, batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    cust = cust.materialize()   # one execution: count + pull share blocks
    n_cust = cust.count()
    if n_cust <= Q3_BROADCAST_CAP:
        ckeys = np.sort(cust.to_pandas()["c_custkey"].to_numpy(np.int64))
        cref = ray.put(ckeys)

        def o_pick(b: pa.Table, _c=cref) -> pa.Table:
            ck = ray.get(_c)
            oc = b.column("o_custkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if len(ck):
                p = np.clip(np.searchsorted(ck, oc), 0, len(ck) - 1)
                keep = ck[p] == oc
            else:
                keep = np.zeros(len(oc), dtype=bool)
            ok_ = b.column("o_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            yr = pd.DatetimeIndex(
                b.column("o_orderdate").to_pandas()).year \
                .to_numpy(np.int64)
            return pa.table({"o_orderkey": pa.array(ok_[keep]),
                             "o_year": pa.array(yr[keep])})

        ord_y = orders.map_batches(o_pick, batch_format="pyarrow")
    else:
        est = (orders.size_bytes() or 0) + (cust.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))

        def add_year(b: pa.Table) -> pa.Table:
            yr = pd.DatetimeIndex(
                b.column("o_orderdate").to_pandas()).year \
                .to_numpy(np.int64)
            return pa.table({"o_orderkey": b.column("o_orderkey"),
                             "o_custkey": b.column("o_custkey"),
                             "o_year": pa.array(yr)})

        ord_y = orders.map_batches(add_year, batch_format="pyarrow") \
            .join(cust, join_type="inner", num_partitions=n_parts,
                  on=("o_custkey",), right_on=("c_custkey",)) \
            .select_columns(["o_orderkey", "o_year"])

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])

    def li_prep(b: pa.Table, _s=sref) -> pa.Table:
        sk, sn = ray.get(_s)
        ls = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = np.clip(np.searchsorted(sk, ls), 0, len(sk) - 1)
        hit = sk[p] == ls
        price = _cents(b.column("l_extendedprice")
                       .to_numpy(zero_copy_only=False))
        disc = np.round((1.0 - b.column("l_discount")
                         .to_numpy(zero_copy_only=False)
                         .astype(np.float64)) * 100).astype(np.int64)
        lk = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"l_orderkey": pa.array(lk[hit]),
                         "s_nationkey": pa.array(sn[p][hit]),
                         "rev_e4": pa.array((price * disc)[hit])})

    liq = li.map_batches(li_prep, batch_format="pyarrow")

    ord_y = ord_y.materialize()
    n_ord = ord_y.count()
    if n_ord <= Q3_BROADCAST_CAP:
        odf = ord_y.to_pandas().sort_values("o_orderkey")
        onref = ray.put((odf["o_orderkey"].to_numpy(np.int64),
                         odf["o_year"].to_numpy(np.int64)))

        def attach(b: pa.Table, _o=onref) -> pa.Table:
            ok, oy = ray.get(_o)
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if len(ok):
                p = np.clip(np.searchsorted(ok, lk), 0, len(ok) - 1)
                hit = ok[p] == lk
                yr = oy[p]
            else:
                hit = np.zeros(len(lk), dtype=bool)
                yr = lk
            return pa.table({
                "s_nationkey": b.column("s_nationkey").filter(
                    pa.array(hit)),
                "rev_e4": b.column("rev_e4").filter(pa.array(hit)),
                "o_year": pa.array(yr[hit])})

        joined = liq.map_batches(attach, batch_format="pyarrow")
    else:
        est = (liq.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))
        joined = liq.join(ord_y, join_type="inner",
                          num_partitions=n_parts,
                          on=("l_orderkey",), right_on=("o_orderkey",))

    def fold(b: pa.Table, _t=tgt_key) -> pa.Table:
        yr = b.column("o_year").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rev = b.column("rev_e4").to_numpy(zero_copy_only=False)
        sn = b.column("s_nationkey").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"o_year": yr, "total_e4": rev,
                           "nation_e4": np.where(sn == _t, rev, 0)})
        g = df.groupby("o_year", as_index=False).agg(
            total_e4=("total_e4", "sum"), nation_e4=("nation_e4", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (joined.map_batches(fold, batch_format="pyarrow")
           .groupby("o_year")
           .aggregate(Sum("total_e4", alias_name="total_e4"),
                      Sum("nation_e4", alias_name="nation_e4"))
           .to_pandas())
    if "total_e4" not in out.columns:
        return pd.DataFrame({"o_year": pd.Series([], dtype=np.int64),
                             "total_e4": pd.Series([], dtype=np.int64),
                             "nation_e4": pd.Series([], dtype=np.int64),
                             "share_ppm": pd.Series([], dtype=np.int64)})
    out["o_year"] = out["o_year"].astype(np.int64)
    out["total_e4"] = out["total_e4"].astype(np.int64)
    out["nation_e4"] = out["nation_e4"].astype(np.int64)
    out["share_ppm"] = np.where(
        out["total_e4"] > 0,
        (out["nation_e4"] * 1_000_000) // np.maximum(out["total_e4"], 1),
        0).astype(np.int64)
    return out.sort_values("o_year").reset_index(drop=True)


def parts_supplier_diversity(sf_dir: str):
    """Grouped COUNT DISTINCT over a join (TPC-H Q16's shape without the
    partsupp table): how many DISTINCT suppliers ship each (p_brand,
    p_size) part class, measured from lineitem. Per-batch local distinct
    (brand-id, size, suppkey) triples (packed-key np.unique against the
    BROADCAST part-attribute arrays — no join shuffle), then an ADAPTIVE
    global dedup: driver np.unique merge of the distinct partials under
    TRIPLE_DRIVER_MERGE_CAP rows, 8-byte-key sort + boundary-corrected
    per-block distinct counts past it. Emits
    (p_brand, p_size, n_suppliers)."""
    import ray

    pt = _read(sf_dir, "part",
               columns=["p_partkey", "p_brand", "p_size"]).to_pandas() \
        .sort_values("p_partkey")
    pkeys = pt["p_partkey"].to_numpy(np.int64)
    ubrand, bcode = np.unique(pt["p_brand"].to_numpy(object),
                              return_inverse=True)
    psize = pt["p_size"].to_numpy(np.int64)
    pref = ray.put((pkeys, bcode.astype(np.int64), psize))
    brands = [str(b) for b in ubrand]

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def local_triples(b: pa.Table, _p=pref) -> pa.Table:
        pk, pb, ps = ray.get(_p)
        ids = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sup = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.clip(np.searchsorted(pk, ids), 0, len(pk) - 1)
        hit = pk[pos] == ids
        bb, ss, sp = pb[pos][hit], ps[pos][hit], sup[hit]
        key = (bb.astype(np.uint64) << np.uint64(56)) \
            | (ss.astype(np.uint64) << np.uint64(40)) \
            | sp.astype(np.uint64)
        # ship ONE packed int64 key per locally-distinct triple
        return pa.table({"k": pa.array(np.unique(key).astype(np.int64))})

    part = li.map_batches(local_triples, batch_format="pyarrow",
                          batch_size=65536)
    # ADAPTIVE distinct-count fold (the duplicate_key_counts_adaptive
    # discipline, unique.py:223). Under the cap: one driver np.unique
    # over the per-batch distinct partials replaces BOTH Ray Aggregate
    # exchanges (measured 4.3 s -> <1 s at sf0.1; the per-group Python
    # fold in groupby().count() costs ~134us/group). Past the cap: an
    # 8-byte-key global sort, per-block (bs, distinct-count) partials,
    # and an exact boundary correction — driver state is
    # O(blocks + brand*size cells), never triple-count-sized.
    n_li = _table_rows(sf_dir, "lineitem")
    # UNKNOWN row count (None) must take the bounded-scale path, never
    # the driver merge
    if n_li is not None and n_li <= TRIPLE_DRIVER_MERGE_CAP:
        parts_ = part.to_pandas()
        k = np.unique(parts_["k"].to_numpy(np.int64)).astype(np.uint64)
        bs = (k >> np.uint64(40)).astype(np.int64)  # (brand<<16)|size
        ub, cnt = np.unique(bs, return_counts=True)
    else:                                   # pragma: no cover - scale path
        srt = part.sort("k")

        def block_partial(b: pa.Table) -> pa.Table:
            u = b.column("k").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if len(u) == 0:
                return pa.table({"bs": pa.array([], type=pa.int64()),
                                 "n": pa.array([], type=pa.int64()),
                                 "kind": pa.array([], type=pa.int8())})
            d = np.concatenate([u[:1], u[1:][u[1:] != u[:-1]]])
            dbs = (d.view(np.uint64) >> np.uint64(40)).astype(np.int64)
            ub_, c_ = np.unique(dbs, return_counts=True)
            # kind 0: per-block distinct counts folded by bs;
            # kind 1/2: the block's first/last key for the driver's
            # boundary overcount correction
            return pa.table({
                "bs": pa.array(np.concatenate([ub_, [u[0], u[-1]]])),
                "n": pa.array(np.concatenate(
                    [c_, [1, 1]]).astype(np.int64)),
                "kind": pa.array(np.concatenate(
                    [np.zeros(len(ub_), dtype=np.int8),
                     np.array([1, 2], dtype=np.int8)]))})

        pdf = srt.map_batches(block_partial,
                              batch_format="pyarrow").to_pandas()
        cells = pdf[pdf["kind"] == 0]
        firsts = np.sort(pdf.loc[pdf["kind"] == 1, "bs"].to_numpy(np.int64))
        lasts = np.sort(pdf.loc[pdf["kind"] == 2, "bs"].to_numpy(np.int64))
        agg = cells.groupby("bs")["n"].sum()
        ub = agg.index.to_numpy(np.int64)
        cnt = agg.to_numpy(np.int64)
        # a key spanning j adjacent sorted blocks was counted j times;
        # j = #blocks whose [first,last] key range contains it
        bvals = np.unique(np.concatenate([firsts, lasts]))
        over = (np.searchsorted(firsts, bvals, side="right")
                - np.searchsorted(lasts, bvals, side="left") - 1)
        bvals, over = bvals[over > 0], over[over > 0]
        obs = (bvals.view(np.uint64) >> np.uint64(40)).astype(np.int64)
        sub = pd.Series(over).groupby(obs).sum()
        pos = np.searchsorted(ub, sub.index.to_numpy(np.int64))
        cnt[pos] -= sub.to_numpy(np.int64)
        ub, cnt = ub[cnt > 0], cnt[cnt > 0]

    out = pd.DataFrame({"bs": ub, "n_suppliers": cnt.astype(np.int64)})
    bsv = out["bs"].to_numpy(np.int64)
    out["p_brand"] = pd.Series(bsv >> 16).map(dict(enumerate(brands)))
    out["p_size"] = pd.Series(bsv & 0xFFFF).astype(np.int64)
    out["n_suppliers"] = out["n_suppliers"].astype(np.int64)
    return (out[["p_brand", "p_size", "n_suppliers"]]
            .sort_values(["p_brand", "p_size"]).reset_index(drop=True))


def snapshot_diff_documents(sf_dir: str):
    """Corpus snapshot diff (set ops between two table versions): classify
    every doc_id as added / removed / changed / unchanged between v1 (the
    documents table) and a DETERMINISTICALLY derived v2 (doc_id % 7 == 0
    dropped; doc_id % 5 == 0 gets text+'!' and n_chars+1; doc_id % 11 == 0
    re-added under doc_id + 10_000_000 — so all four classes occur). Both
    sides tag a side bit and UNION into ONE doc_id-keyed sorted_group_scan;
    a vectorized block kernel classifies complete groups (size-1 groups
    split by side; size-2 groups compare payload equality) and ships only
    <= 4 (class, n) partial rows per block. At 100 TB the payload compare
    would ride an 8-byte content fingerprint (fingerprint_documents) so
    text never shuffles; at audit scale the exact string compare keeps the
    oracle boundary trivial. Emits (class, n_docs)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def v1(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id"),
                         "text": b.column("text"),
                         "n_chars": b.column("n_chars"),
                         "side": pa.array(
                             np.zeros(b.num_rows, dtype=np.int64))})

    def v2(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = ids % 7 != 0
        t = b.filter(pa.array(keep))
        kids = ids[keep]
        mod = kids % 5 == 0
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        bumped = pc.binary_join_element_wise(txt, pa.scalar("!"),
                                             pa.scalar(""))
        new_txt = pc.if_else(pa.array(mod), bumped, txt)
        nch = t.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64) + mod.astype(np.int64)
        base = pa.table({"doc_id": pa.array(kids),
                         "text": new_txt,
                         "n_chars": pa.array(nch),
                         "side": pa.array(np.ones(len(kids),
                                                  dtype=np.int64))})
        adds = kids % 11 == 0
        extra = pa.table({"doc_id": pa.array(kids[adds] + 10_000_000),
                          "text": new_txt.filter(pa.array(adds)),
                          "n_chars": pa.array(nch[adds]),
                          "side": pa.array(np.ones(int(adds.sum()),
                                                   dtype=np.int64))})
        return pa.concat_tables([base, extra])

    both = (ds.map_batches(v1, batch_format="pyarrow")
            .union(ds.map_batches(v2, batch_format="pyarrow")))

    out_schema = pa.schema([("class", pa.string()), ("n", pa.int64())])
    CLASSES = np.array(["added", "removed", "changed", "unchanged"],
                       dtype=object)

    def classify(side, texts, nchars, starts, ends):
        """Vectorized class codes for groups given by [starts, ends)."""
        size = ends - starts
        code = np.empty(len(starts), dtype=np.int64)
        one = size == 1
        code[one] = np.where(side[starts[one]] == 1, 0, 1)
        two = ~one
        a, bidx = starts[two], starts[two] + 1
        if len(a):
            eq_t = pc.equal(texts.take(pa.array(a)),
                            texts.take(pa.array(bidx)))
            eq_t = pc.fill_null(eq_t, False).to_numpy(
                zero_copy_only=False)
            same = eq_t & (nchars[a] == nchars[bidx])
            code[two] = np.where(same, 3, 2)
        return code

    def block_fn(block, starts, ends, want):
        s, e = starts[want], ends[want]
        if not len(s):
            return None
        side = block.column("side").to_numpy(zero_copy_only=False)
        nch = block.column("n_chars").to_numpy(zero_copy_only=False)
        txt = block.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        code = classify(side, txt, nch, s, e)
        cnt = np.bincount(code, minlength=4).astype(np.int64)
        nz = cnt > 0
        return pa.table({"class": pa.array(CLASSES[nz]),
                         "n": pa.array(cnt[nz])})

    def group_fn(g: pa.Table):
        side = g.column("side").to_numpy(zero_copy_only=False)
        nch = g.column("n_chars").to_numpy(zero_copy_only=False)
        txt = g.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        code = classify(side, txt, nch, np.array([0]),
                        np.array([g.num_rows]))
        return pa.table({"class": pa.array(CLASSES[code]),
                         "n": pa.array(np.ones(1, dtype=np.int64))})

    parts = sorted_group_scan(both, ["doc_id"], group_fn, out_schema,
                              block_fn=block_fn).to_pandas()
    out = parts.groupby("class", as_index=False)["n"].sum() \
        .rename(columns={"n": "n_docs"})
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out.sort_values("class").reset_index(drop=True)


def q6_forecast_revenue(sf_dir: str):
    """TPC-H-Q6-shaped forecasting filter-aggregate: revenue delta from
    lineitems in one year with discount in a band and small quantity —
    the pure scan-and-fold query: year cut PUSHED TO THE PARQUET SCAN,
    discount band as an exact integer-percent compare (round(d*100) in
    [5, 7]), quantity < 24, revenue = price_cents x disc_pct summed as
    one e6 integer. One stateless pass, one 1-row fold. Emits
    (n_li, revenue_e6)."""
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    lpath = os.path.join(sf_dir, "lineitem.parquet")
    llo = _pq_schema_scalar(lpath, "l_shipdate", lo)
    lhi = _pq_schema_scalar(lpath, "l_shipdate", hi)
    lkw = {} if llo is None else dict(
        filter=(pads.field("l_shipdate") >= llo)
        & (pads.field("l_shipdate") < lhi))
    li = rd.read_parquet(
        lpath, columns=["l_quantity", "l_extendedprice", "l_discount",
                        "l_shipdate"], **lkw)
    if llo is None:
        li = li.filter(lambda r: lo.to_datetime64() <= r["l_shipdate"]
                       < hi.to_datetime64())

    def fold(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        dpct = np.round(b.column("l_discount")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        sel = (q < 24) & (dpct >= 5) & (dpct <= 7)
        price = _cents(b.column("l_extendedprice")
                       .to_numpy(zero_copy_only=False))
        rev = (price * dpct)[sel]
        return pa.table({"n": pa.array([int(sel.sum())]),
                         "r": pa.array([int(rev.sum())])})

    tot = (li.map_batches(fold, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="n"), Sum("r", alias_name="r")))
    n = int(tot.get("sum(n)", tot.get("n", 0)) or 0)
    r = int(tot.get("sum(r)", tot.get("r", 0)) or 0)
    return pd.DataFrame({"n_li": np.array([n], dtype=np.int64),
                         "revenue_e6": np.array([r], dtype=np.int64)})


def q15_top_supplier(sf_dir: str):
    """TPC-H-Q15-shaped top supplier: the supplier(s) with MAX revenue in
    one quarter — the max-with-ties pattern (Q15's view + HAVING = MAX
    subquery). One narrow quarter-cut lineitem pass pre-aggregates
    (suppkey, rev_e4) partials, one small groupby folds per supplier, and
    the global max + the tied winners resolve from the supplier-sized
    result with names looked up only for winners. Emits
    (s_suppkey, s_name, total_revenue_e4)."""
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")
    lpath = os.path.join(sf_dir, "lineitem.parquet")
    llo = _pq_schema_scalar(lpath, "l_shipdate", lo)
    lhi = _pq_schema_scalar(lpath, "l_shipdate", hi)
    lkw = {} if llo is None else dict(
        filter=(pads.field("l_shipdate") >= llo)
        & (pads.field("l_shipdate") < lhi))
    li = rd.read_parquet(
        lpath, columns=["l_suppkey", "l_extendedprice", "l_discount",
                        "l_shipdate"], **lkw)
    if llo is None:
        li = li.filter(lambda r: lo.to_datetime64() <= r["l_shipdate"]
                       < hi.to_datetime64())

    def partial(b: pa.Table) -> pa.Table:
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price = _cents(b.column("l_extendedprice")
                       .to_numpy(zero_copy_only=False))
        disc = np.round((1.0 - b.column("l_discount")
                         .to_numpy(zero_copy_only=False)
                         .astype(np.float64)) * 100).astype(np.int64)
        rev = price * disc
        us, inv = np.unique(sk, return_inverse=True)
        return pa.table({"s": pa.array(us),
                         "r": pa.array(np.bincount(inv, weights=rev)
                                       .astype(np.int64))})

    per_supp = (li.map_batches(partial, batch_format="pyarrow")
                .groupby("s").aggregate(Sum("r", alias_name="r"))
                .to_pandas())
    if not len(per_supp):
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=object),
                             "total_revenue_e4": pd.Series([],
                                                           dtype=np.int64)})
    best = int(per_supp["r"].max())
    win = per_supp[per_supp["r"] == best].sort_values("s")
    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_name"]).to_pandas()
    out = win.merge(sup, left_on="s", right_on="s_suppkey", how="left")
    out = out.rename(columns={"r": "total_revenue_e4"})
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    out["total_revenue_e4"] = out["total_revenue_e4"].astype(np.int64)
    return (out[["s_suppkey", "s_name", "total_revenue_e4"]]
            .sort_values("s_suppkey").reset_index(drop=True))


def q18_large_volume_customers(sf_dir: str, qty_threshold: int = 250):
    """TPC-H-Q18-shaped large-volume customer report: orders whose TOTAL
    lineitem quantity exceeds a threshold, with customer and order
    attributes. Plan: one narrow (orderkey, qty) lineitem pass
    pre-aggregates per-batch partials -> one 16 B-row groupby -> the
    qualifying orderkey set (HAVING sum > T) broadcasts as a sorted
    array (Q4's EXISTS shape — it shrinks ~1000x past the threshold) ->
    one orders pass attaches (custkey, orderdate cents) statelessly ->
    customer names looked up only for the qualifying rows. Emits
    (c_custkey, c_name, o_orderkey, total_cents, sum_qty)."""
    import ray
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        q = b.column("l_quantity").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uo, inv = np.unique(ok, return_inverse=True)
        return pa.table({"o": pa.array(uo),
                         "q": pa.array(np.bincount(inv, weights=q)
                                       .astype(np.int64))})

    per_order = (li.map_batches(partial, batch_format="pyarrow")
                 .groupby("o").aggregate(Sum("q", alias_name="q")))

    # HAVING filter stays DISTRIBUTED — only qualifying orders (the
    # ~1000x-smaller residue) ever reach the driver, never the per-order
    # aggregate itself
    def having(b: pa.Table, _t=qty_threshold) -> pa.Table:
        q = b.column("q").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(q > _t))

    big = (per_order.map_batches(having, batch_format="pyarrow")
           .to_pandas().sort_values("o"))
    okeys = big["o"].to_numpy(np.int64)
    oqty = big["q"].to_numpy(np.int64)
    oref = ray.put((okeys, oqty))

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def attach(b: pa.Table, _o=oref) -> pa.Table:
        ok, oq = ray.get(_o)
        keys = b.column("o_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(ok):
            p = np.clip(np.searchsorted(ok, keys), 0, len(ok) - 1)
            hit = ok[p] == keys
        else:
            hit = np.zeros(len(keys), dtype=bool)
            p = np.zeros(len(keys), dtype=np.int64)
        t = b.filter(pa.array(hit))
        cents = _cents(t.column("o_totalprice")
                       .to_numpy(zero_copy_only=False))
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "c_custkey": t.column("o_custkey"),
                         "total_cents": pa.array(cents),
                         "sum_qty": pa.array(oq[p[hit]])})

    rows = orders.map_batches(attach, batch_format="pyarrow").to_pandas()
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_name"]).to_pandas()
    out = rows.merge(cust, on="c_custkey", how="left")
    for c in ("c_custkey", "o_orderkey", "total_cents", "sum_qty"):
        out[c] = out[c].astype(np.int64)
    return (out[["c_custkey", "c_name", "o_orderkey", "total_cents",
                 "sum_qty"]]
            .sort_values(["sum_qty", "o_orderkey"],
                         ascending=[False, True])
            .reset_index(drop=True))


def out_of_order_events(sf_dir: str):
    """Streaming-ingestion disorder audit: per user, how many events
    ARRIVED out of timestamp order (arrival order = event_id) and the
    worst disorder in microseconds — the watermark-lag statistic a
    streaming sink needs to size its reorder buffer. ONE user-keyed
    sorted_group_scan ordered by event_id; the block kernel computes the
    per-user running max via pandas' C-speed groupby cummax + shift (no
    per-group Python), so each block emits one row per complete user.
    Emits (user_id, n_events, n_late, max_disorder_us)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def narrow(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(pc.is_valid(b.column("user_id")),
                             pc.is_valid(b.column("ts"))))
        us = pd.DatetimeIndex(t.column("ts").to_pandas()).values \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({
            "user_id": pa.array(t.column("user_id")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64)),
            "event_id": pa.array(t.column("event_id")
                                 .to_numpy(zero_copy_only=False)
                                 .astype(np.int64)),
            "ts_us": pa.array(us)})

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_events", pa.int64()),
                            ("n_late", pa.int64()),
                            ("max_disorder_us", pa.int64())])

    def _profile(uid, ts):
        """(per-row gidx-keyed) disorder stats via pandas C kernels."""
        s = pd.Series(ts)
        g = s.groupby(uid)
        prev_max = g.cummax().groupby(uid).shift(1)
        late = s < prev_max
        dis = (prev_max - s).where(late, 0).fillna(0).astype(np.int64)
        df = pd.DataFrame({"u": uid, "late": late.astype(np.int64),
                           "dis": dis})
        agg = df.groupby("u", as_index=False).agg(
            n_events=("late", "size"), n_late=("late", "sum"),
            max_disorder_us=("dis", "max"))
        return agg

    def block_fn(block, starts, ends, want):
        if not want.any():
            return None
        uid = block.column("user_id").to_numpy(zero_copy_only=False)
        ts = block.column("ts_us").to_numpy(zero_copy_only=False)
        # complete-group row mask via one diff-array cumsum (no group loop)
        flags = np.zeros(len(uid) + 1, dtype=np.int64)
        np.add.at(flags, starts[want], 1)
        np.add.at(flags, ends[want], -1)
        keep = np.cumsum(flags[:-1]) > 0
        agg = _profile(uid[keep], ts[keep])
        return pa.Table.from_pandas(
            agg.rename(columns={"u": "user_id"}), preserve_index=False) \
            .cast(out_schema)

    def group_fn(g: pa.Table):
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        agg = _profile(uid, ts)
        return pa.Table.from_pandas(
            agg.rename(columns={"u": "user_id"}), preserve_index=False) \
            .cast(out_schema)

    res = sorted_group_scan(ds.map_batches(narrow, batch_format="pyarrow"),
                            ["user_id"], group_fn, out_schema,
                            block_fn=block_fn, order_cols=["event_id"])
    return res


def sliding_distinct_users(sf_dir: str, window_hours: int = 24,
                           fold_cap: int = None):
    """Sliding-window COUNT DISTINCT: distinct active users over the
    trailing 24 h ending at each observed hour — the rolling-reach metric
    a plain rolling SUM of hourly distinct counts gets WRONG (users span
    hours). Exact plan with bounded expansion: (1) per-batch distinct
    (hour, user) pairs; (2) ONE global pair dedup (narrow 16 B rows —
    the only shuffle); (3) each distinct pair fans out to the <= W
    windows it is visible in (vectorized np.repeat, W = 24); (4) a
    second (window, user) dedup + per-window count. Total intermediate
    volume is W x distinct-pairs regardless of raw event count. Emits
    (hour_ts, n_users) for every hour with >= 1 active user in-window."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def pairs(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(pc.is_valid(b.column("ts")),
                             pc.is_valid(b.column("user_id"))))
        hrs = pd.DatetimeIndex(t.column("ts").to_pandas()).values \
            .astype("datetime64[h]").astype(np.int64)
        users = t.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        key = (hrs.astype(np.uint64) << np.uint64(40)) \
            | users.astype(np.uint64)
        uk = np.unique(key)
        return pa.table({
            "h": pa.array((uk >> np.uint64(40)).astype(np.int64)),
            "u": pa.array((uk & np.uint64((1 << 40) - 1))
                          .astype(np.int64))})

    # ADAPTIVE merge (the part_price_dispersion fold discipline): under
    # a 20M-event footer gate the per-batch-distinct pairs fold in ONE
    # single task — user-MAJOR key packing makes users slice-disjoint
    # after the sort, so the window expansion runs in bounded-memory
    # user slices and per-window counts simply add across slices; the
    # two ~|hours x users|-group Ray groupbys (the real 16 s cost at
    # sf0.1) stay as the >cap scale path.
    n_ev_rows = _table_rows(sf_dir, "events")
    cap = 20_000_000 if fold_cap is None else fold_cap
    if n_ev_rows is not None and n_ev_rows <= cap:
        W = int(window_hours)

        def upack(b: pa.Table) -> pa.Table:
            t = b.filter(pc.and_(pc.is_valid(b.column("ts")),
                                 pc.is_valid(b.column("user_id"))))
            hrs = pd.DatetimeIndex(t.column("ts").to_pandas()).values \
                .astype("datetime64[h]").astype(np.int64)
            users = t.column("user_id").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            key = (users.astype(np.uint64) << np.uint64(24)) \
                | hrs.astype(np.uint64)   # hours-since-epoch < 2^24
            return pa.table({"k": pa.array(
                np.unique(key).astype(np.int64))})

        def fold(b: pa.Table, _w=W) -> pa.Table:
            empty = pa.table({"w": pa.array([], type=pa.int64()),
                              "n_users": pa.array([], type=pa.int64())})
            if b.num_rows == 0:
                return empty
            k = np.unique(b.column("k").to_numpy(zero_copy_only=False)
                          .astype(np.uint64))
            h_all = (k & np.uint64((1 << 24) - 1)).astype(np.int64)
            obs = np.unique(h_all)
            hi = int(obs.max())
            counts: Dict[int, int] = {}
            step = max(1, 4_000_000 // _w)
            # slice boundaries MUST fall on user changes — a user split
            # across slices would double-count its (window, user) pairs
            u_all = (k >> np.uint64(24)).astype(np.int64)
            cuts = [0]
            while cuts[-1] < len(k):
                nxt = min(cuts[-1] + step, len(k))
                while nxt < len(k) and u_all[nxt] == u_all[nxt - 1]:
                    nxt += 1
                cuts.append(nxt)
            for s0, s1 in zip(cuts[:-1], cuts[1:]):
                ks = k[s0:s1]
                u = (ks >> np.uint64(24)).astype(np.int64)
                h = (ks & np.uint64((1 << 24) - 1)).astype(np.int64)
                span = np.minimum(h + _w - 1, hi) - h + 1
                wend = np.repeat(h, span) + _concat_ranges(span)
                uu = np.repeat(u, span)
                pos = np.clip(np.searchsorted(obs, wend), 0, len(obs) - 1)
                keep = obs[pos] == wend
                wk = np.unique((uu[keep].astype(np.uint64)
                                << np.uint64(24))
                               | wend[keep].astype(np.uint64))
                ww = (wk & np.uint64((1 << 24) - 1)).astype(np.int64)
                uw, cnt = np.unique(ww, return_counts=True)
                for wv, cv in zip(uw, cnt):
                    counts[int(wv)] = counts.get(int(wv), 0) + int(cv)
            items = sorted(counts.items())
            return pa.table({
                "w": pa.array([i[0] for i in items], type=pa.int64()),
                "n_users": pa.array([i[1] for i in items],
                                    type=pa.int64())})

        out = (ds.map_batches(upack, batch_format="pyarrow")
               .repartition(1)
               .map_batches(fold, batch_format="pyarrow",
                            batch_size=None).to_pandas())
        if not len(out):
            return pd.DataFrame({
                "hour_ts": pd.Series([], dtype="datetime64[us]"),
                "n_users": pd.Series([], dtype=np.int64)})
        out["hour_ts"] = pd.to_datetime(out["w"].astype(np.int64),
                                        unit="h")
        out["n_users"] = out["n_users"].astype(np.int64)
        return out[["hour_ts", "n_users"]].sort_values("hour_ts") \
            .reset_index(drop=True)

    dpairs = (ds.map_batches(pairs, batch_format="pyarrow")
              .groupby(["h", "u"]).count())

    # observed hour set: windows only END at hours that saw >= 1 event
    # (the oracle's semantics). Hours are metadata-sized — <= 8760/year —
    # so one distinct fold + a sorted-array broadcast is bounded forever.
    import ray

    def hour_partial(b: pa.Table) -> pa.Table:
        return pa.table({"h": pa.array(np.unique(
            b.column("h").to_numpy(zero_copy_only=False)))})

    hdf = dpairs.map_batches(hour_partial, batch_format="pyarrow") \
        .to_pandas()
    if not len(hdf):
        return pd.DataFrame({"hour_ts": pd.Series([], dtype="datetime64[us]"),
                             "n_users": pd.Series([], dtype=np.int64)})
    hours = np.unique(hdf["h"].to_numpy(np.int64))
    h_hi = int(hours.max())
    href = ray.put(hours)

    W = int(window_hours)

    def expand(b: pa.Table, _hi=h_hi, _w=W, _h=href) -> pa.Table:
        obs = ray.get(_h)
        h = b.column("h").to_numpy(zero_copy_only=False)
        u = b.column("u").to_numpy(zero_copy_only=False)
        # pair (h,u) is visible in windows ending at h .. min(h+W-1, hi)
        span = np.minimum(h + _w - 1, _hi) - h + 1
        wend = np.repeat(h, span) + _concat_ranges(span)
        uu = np.repeat(u, span)
        pos = np.clip(np.searchsorted(obs, wend), 0, len(obs) - 1)
        keep = obs[pos] == wend          # observed window-end hours only
        wend, uu = wend[keep], uu[keep]
        key = (wend.astype(np.uint64) << np.uint64(40)) \
            | uu.astype(np.uint64)
        uk = np.unique(key)
        return pa.table({
            "w": pa.array((uk >> np.uint64(40)).astype(np.int64)),
            "u": pa.array((uk & np.uint64((1 << 40) - 1))
                          .astype(np.int64))})

    wpairs = (dpairs.map_batches(expand, batch_format="pyarrow")
              .groupby(["w", "u"]).count())

    def fold(b: pa.Table) -> pa.Table:
        w = b.column("w").to_numpy(zero_copy_only=False)
        uw, cnt = np.unique(w, return_counts=True)
        return pa.table({"w": pa.array(uw),
                         "n": pa.array(cnt.astype(np.int64))})

    out = (wpairs.map_batches(fold, batch_format="pyarrow")
           .groupby("w").aggregate(Sum("n", alias_name="n_users"))
           .to_pandas())
    out["hour_ts"] = pd.to_datetime(out["w"].astype(np.int64), unit="h")
    out["n_users"] = out["n_users"].astype(np.int64)
    return out[["hour_ts", "n_users"]].sort_values("hour_ts") \
        .reset_index(drop=True)


def _concat_ranges(lengths: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated — vectorized ragged arange."""
    if len(lengths) == 0:
        return np.zeros(0, dtype=np.int64)
    total = int(lengths.sum())
    out = np.ones(total, dtype=np.int64)
    out[0] = 0
    starts = np.cumsum(lengths)[:-1]
    out[starts] = 1 - lengths[:-1]
    return np.cumsum(out)


def _format_roundtrip(sf_dir: str, fmt: str):
    """Shared body of the ORC / Feather sink+source round-trip queries
    (the jsonl_roundtrip shape): documents stream out through
    write_corpus, back in through read_corpus, and per-lang
    (n_rows, id_sum, text_chars) aggregates of the round-tripped rows
    must hash-match the oracle computed on the original parquet."""
    import shutil
    import tempfile

    from ray.data.aggregate import Sum

    from rayschema.sources import read_corpus, write_corpus

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    out_dir = os.path.join(tempfile.gettempdir(),
                           f"rayschema_{fmt}_{os.getpid()}")
    shutil.rmtree(out_dir, ignore_errors=True)
    write_corpus(ds, out_dir, fmt=fmt)
    back = read_corpus(out_dir, fmt=fmt)

    def partial(b: pa.Table) -> pa.Table:
        lang = b.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tlen = pc.fill_null(pc.utf8_length(b.column("text")), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({"lang": lang, "ids": pa.array(ids),
                      "tlen": pa.array(tlen),
                      "one": pa.array(np.ones(len(ids), dtype=np.int64))})
        g = t.group_by("lang").aggregate(
            [("ids", "sum"), ("tlen", "sum"), ("one", "sum")])
        return g.select(['lang', 'ids_sum', 'tlen_sum', 'one_sum']).rename_columns(["lang", "id_sum", "text_chars", "n_rows"])

    return (back.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("n_rows", alias_name="n_rows"),
                       Sum("id_sum", alias_name="id_sum"),
                       Sum("text_chars", alias_name="text_chars")))


def orc_roundtrip(sf_dir: str):
    """ORC sink+source round trip (columnar interchange with the Hadoop
    world) — distributed on both sides: per-block pyarrow.orc writes,
    one decode task per file on the way back."""
    return _format_roundtrip(sf_dir, "orc")


def feather_roundtrip(sf_dir: str):
    """Feather / Arrow-IPC sink+source round trip (zero-copy interchange
    with Arrow-native tools) — same distributed shape as the ORC path."""
    return _format_roundtrip(sf_dir, "feather")


def avro_roundtrip(sf_dir: str):
    """Avro OCF sink+source round trip — the Kafka/Hadoop streaming-dump
    format, via the repo's own pure-Python OCF codec (rayschema/avro.py:
    zigzag varints, nullable unions, raw-deflate blocks, deterministic
    sync markers). Distributed on both sides like the ORC path; the
    oracle computes the same aggregates from the original parquet, so
    any encode/decode infidelity (unicode, nulls, varint edges) breaks
    the value hash."""
    return _format_roundtrip(sf_dir, "avro")


def _bigram_lm_score_ds(sf_dir: str, with_lang: bool = False):
    """Shared scorer behind bigram_lm_perplexity / perplexity_bucket_filter
    (CCNet, Wenzek et al. 2020): cross-entropy of every doc under the
    corpus-trained bigram LM; ``with_lang`` threads the lang column
    through for the per-language bucket cut."""
    import ray

    from rayschema.text import _flatten_words_arrow

    cols = ["doc_id", "text"] + (["lang"] if with_lang else [])
    ds = _read(sf_dir, "documents", columns=cols)
    pairs = _bigram_pair_counts(ds)

    def vocab_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({"w": pa.array([], type=pa.string())})
        flat, _, _ = _flatten_words_arrow(col)
        return pa.table({"w": pc.unique(flat)})

    vdf = (ds.map_batches(vocab_partial, batch_format="pyarrow")
           .to_pandas())
    vocab = np.unique(vdf["w"].to_numpy(dtype=object)) if len(vdf) \
        else np.empty(0, dtype=object)
    nv = len(vocab)
    if nv == 0 or len(pairs) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "n_bigrams": pd.Series([], dtype=np.int64),
                             "cost_mbits": pd.Series([], dtype=np.int64)})

    vocab_pa = pa.array(vocab, type=pa.string())
    # word -> vocab index for the model tables
    w1_idx = np.searchsorted(vocab, pairs["w1"].to_numpy(dtype=object))
    w2_idx = np.searchsorted(vocab, pairs["w2"].to_numpy(dtype=object))
    c = pairs["c"].to_numpy(np.int64)
    # bigram-start counts ca(w) = sum of pair counts with w1 = w
    ca = np.zeros(nv, dtype=np.int64)
    np.add.at(ca, w1_idx, c)
    pk = w1_idx.astype(np.int64) * nv + w2_idx.astype(np.int64)
    order = np.argsort(pk)
    pk, cab = pk[order], c[order]
    ref = ray.put((vocab_pa, ca, pk, cab))

    def score(b: pa.Table, _ref=ref) -> pa.Table:
        vpa, ca_a, pk_a, cab_a = ray.get(_ref)
        nvv = len(vpa)
        b = b.filter(pc.is_valid(b.column("text")))
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(ids)
        ecols = {"doc_id": pa.array([], type=pa.int64()),
                 "n_bigrams": pa.array([], type=pa.int64()),
                 "cost_mbits": pa.array([], type=pa.int64())}
        if with_lang:
            ecols["lang"] = pa.array([], type=pa.string())
        empty = pa.table(ecols)
        if n == 0:
            return empty
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, _, didx = _flatten_words_arrow(col)
        if len(flat) < 2:
            return empty
        codes = pc.index_in(flat, value_set=vpa) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        same = didx[1:] == didx[:-1]
        i1, i2 = codes[:-1][same], codes[1:][same]
        d = didx[:-1][same]
        if len(i1) == 0:
            return empty
        key = i1 * nvv + i2
        pos = np.minimum(np.searchsorted(pk_a, key), len(pk_a) - 1)
        # every scored bigram exists in the corpus model by construction
        cab_v = cab_a[pos]
        mb = np.floor(1000.0 * (np.log2((ca_a[i1] + nvv)
                                        .astype(np.float64))
                                - np.log2((cab_v + 1)
                                          .astype(np.float64)))) \
            .astype(np.int64)
        nb = np.bincount(d, minlength=n).astype(np.int64)
        cost = np.bincount(d, weights=mb, minlength=n).astype(np.int64)
        keep = nb > 0
        out = {"doc_id": pa.array(ids[keep]),
               "n_bigrams": pa.array(nb[keep]),
               "cost_mbits": pa.array(cost[keep])}
        if with_lang:
            lang = b.column("lang")
            if isinstance(lang, pa.ChunkedArray):
                lang = lang.combine_chunks()
            out["lang"] = lang.filter(pa.array(keep))
        return pa.table(out)

    return ds.map_batches(score, batch_format="pyarrow")


def bigram_lm_perplexity(sf_dir: str):
    """CCNet-style language-model quality scoring (Wenzek et al. 2020,
    public method): score every document by its cross-entropy under a
    bigram LM trained on the corpus itself, so boilerplate scores low
    and anomalous word soup scores high — the standard "perplexity
    bucket" filter of large-scale web-corpus curation.

    Integer-exact end to end: the per-position add-one cost
    ``floor(1000 * (log2(ca + V) - log2(cab + 1)))`` millibits is ONE
    identical float expression on both the engine and the DuckDB oracle
    (single log2 calls on exact integer counts — same libm bits), and
    the per-document score is a sum of those INTEGER costs, so summation
    order can never move the hash.

    Shapes: the model pass reuses ``_bigram_pair_counts`` (per-batch
    lexsort partials; distinct-bigram table is vocabulary-bounded — the
    documented Zipf assumption, with min-count pruning or Misra-Gries
    as the heavier-corpus fallback); the model broadcasts ONCE via
    ray.put as three sorted arrays (vocab, bigram-start counts, packed
    pair keys) and scoring is a stateless vectorized map: pc.index_in
    against the vocab dictionary, one searchsorted per batch for pair
    counts, bincount per doc. Emits (doc_id, n_bigrams, cost_mbits)
    for every doc with at least one bigram."""
    return _bigram_lm_score_ds(sf_dir, with_lang=False)


def corr_quantity_price(sf_dir: str):
    """Grouped Pearson correlation between quantity and unit price per
    return flag — the drift/sanity statistic for paired numeric columns.
    ONE stateless pass folds the six exact integer moments
    (n, Σx, Σy, Σxy, Σx², Σy²) per flag into per-batch partials; a
    <=|flags|-row groupby merges them. x and y are exact cents floored
    to whole units (integer // — no float tie ambiguity), so every
    moment is integer-exact at any scale, and the final corr_ppm is one
    fixed-order float64 expression both sides evaluate identically."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        flag = b.column("l_returnflag")
        if isinstance(flag, pa.ChunkedArray):
            flag = flag.combine_chunks()
        x = _cents(b.column("l_quantity").to_numpy(
            zero_copy_only=False)) // 100
        y = _cents(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)) // 100
        t = pa.table({"l_returnflag": flag,
                      "n": pa.array(np.ones(len(x), dtype=np.int64)),
                      "sum_x": pa.array(x), "sum_y": pa.array(y),
                      "sum_xy": pa.array(x * y),
                      "sum_x2": pa.array(x * x),
                      "sum_y2": pa.array(y * y)})
        g = t.group_by("l_returnflag").aggregate(
            [("n", "sum"), ("sum_x", "sum"), ("sum_y", "sum"),
             ("sum_xy", "sum"), ("sum_x2", "sum"), ("sum_y2", "sum")])
        return g.select(['l_returnflag', 'n_sum', 'sum_x_sum', 'sum_y_sum', 'sum_xy_sum', 'sum_x2_sum', 'sum_y2_sum']).rename_columns(["l_returnflag", "n", "sum_x", "sum_y",
                                 "sum_xy", "sum_x2", "sum_y2"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("l_returnflag")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sum_x", alias_name="sum_x"),
                      Sum("sum_y", alias_name="sum_y"),
                      Sum("sum_xy", alias_name="sum_xy"),
                      Sum("sum_x2", alias_name="sum_x2"),
                      Sum("sum_y2", alias_name="sum_y2"))
           .to_pandas())
    n = out["n"].to_numpy(np.float64)
    sx = out["sum_x"].to_numpy(np.float64)
    sy = out["sum_y"].to_numpy(np.float64)
    num = n * out["sum_xy"].to_numpy(np.float64) - sx * sy
    a = n * out["sum_x2"].to_numpy(np.float64) - sx * sx
    bb = n * out["sum_y2"].to_numpy(np.float64) - sy * sy
    den = np.sqrt(a * bb)
    ppm = np.where(den > 0.0,
                   np.floor(1000000.0 * num / np.where(den > 0, den, 1.0)),
                   0.0).astype(np.int64)
    out["corr_ppm"] = ppm
    for cn in ["n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"]:
        out[cn] = out[cn].astype(np.int64)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def _emb_qmat(b: pa.Table, vec_col: str = "embedding") -> np.ndarray:
    """Batch embeddings -> quantized int64 matrix (rows x dim), the
    kmeans_quantized convention: float32 -> float64 -> round-half-away
    millionths (SQL round(e[i]::DOUBLE * 1000000)::BIGINT)."""
    from rayschema.dedup import round_half_away

    col = b.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    mat = np.stack(col.to_numpy(zero_copy_only=False)).astype(np.float64)
    return round_half_away(mat * 1e6, 0).astype(np.int64)


def _cov_sum_by_key(b: pa.Table) -> pa.Table:
    """Combiner: fold dense (k, s_q12, n_vecs) grid partials within one
    coalesced batch — each input grid is labels x dim^2 rows, so summing
    j grids in one batch cuts shuffle volume by j before the final
    single-key groupby."""
    g = b.group_by("k").aggregate([("s_q12", "sum"), ("n_vecs", "sum")])
    return g.select(['k', 's_q12_sum', 'n_vecs_sum']).rename_columns(["k", "s_q12", "n_vecs"])


def embedding_covariance_by_label(sf_dir: str):
    """Per-label second-moment (uncentered covariance) matrix of the
    embedding corpus — the first stage of distributed PCA / whitening /
    per-class Mahalanobis screens. ONE stateless pass computes each
    coalesced batch's per-label Q^T Q (rows never leave the worker;
    dim x dim x labels numbers per batch), with the three group keys
    packed into ONE int64 ``k = label*2^24 + (d1-1)*2^12 + (d2-1)`` so
    the exchange moves a single fixed-width key column instead of a
    3-column comparator sort. Dense grids then tree-fold: a combiner
    ``map_batches`` sums grids within each coalesced batch (volume
    shrinks from B x grid to ~B/coalesce x grid for B source batches —
    add log-depth combine levels as B grows), and a final single-task
    pyarrow group_by finishes the fold (C++ hash aggregation, NOT
    Ray's groupby.aggregate, whose per-group Python fold measured
    ~134us/group = 5.5 s on this 40,960-group grid); a stateless
    unpack restores (label, d1, d2). All moments are exact int64 over
    millionths-quantized values, so the full 64 x 64 x labels grid
    hash-matches a DuckDB self-join oracle. Emits
    (label, d1, d2, s_q12, n_vecs), dims 1-based; requires dim <= 4096
    (packed 12-bit dims; labels may be any int64, floor-div decode)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding",
                                              "label"])

    def partial(b: pa.Table) -> pa.Table:
        labs = b.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(labs)
        if n == 0:
            return pa.table({"k": pa.array([], type=pa.int64()),
                             "s_q12": pa.array([], type=pa.int64()),
                             "n_vecs": pa.array([], type=pa.int64())})
        q = _emb_qmat(b)
        dim = q.shape[1]
        assert dim <= 4096
        grid = np.arange(dim, dtype=np.int64)
        idx = (np.repeat(grid, dim) << 12) | np.tile(grid, dim)
        outs = []
        for lab in np.unique(labs):
            ql = q[labs == lab]
            m = ql.T @ ql          # int64 exact: |q|<=1e6, rows<=block
            outs.append(pa.table({
                "k": pa.array((lab << 24) + idx),
                "s_q12": pa.array(m.reshape(-1)),
                "n_vecs": pa.array(np.full(dim * dim,
                                           len(ql), dtype=np.int64))}))
        return pa.concat_tables(outs)

    def unpack(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        rem = np.mod(k, 1 << 24)           # nonneg for any label sign
        return pa.table({
            "label": pa.array(np.floor_divide(k, 1 << 24)),
            "d1": pa.array((rem >> 12) + 1),
            "d2": pa.array((rem & 4095) + 1),
            "s_q12": b.column("s_q12"),
            "n_vecs": b.column("n_vecs")})

    # final fold: repartition(1) leaves ONE block, and batch_size=None
    # feeds it to the combiner as ONE batch — so the fold is exact at
    # any combined-grid size (a bounded batch_size here would silently
    # emit per-batch partial sums once the stream outgrew it)
    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=8192)
            .map_batches(_cov_sum_by_key, batch_format="pyarrow",
                         batch_size=1 << 20)
            .repartition(1)
            .map_batches(_cov_sum_by_key, batch_format="pyarrow",
                         batch_size=None)
            .map_batches(unpack, batch_format="pyarrow"))


PCA_ITERS = 2


def pca_project_embeddings(sf_dir: str):
    """Distributed PCA, first principal direction: (1) ONE stateless
    pass folds the global 64 x 64 integer second-moment matrix (the
    embedding_covariance_by_label kernel without the label key — driver
    state is exactly dim^2 numbers at any corpus size); (2) the driver
    runs ``PCA_ITERS`` integer power-iteration rounds in arbitrary-
    precision Python ints (matvec + max-|component| renormalization to
    millionths, explicit-sign floor division — the kmeans_quantized
    discipline, so the DuckDB oracle replays it in HUGEINT); (3) the
    unit-millionths direction broadcasts via ray.put and the projection
    is a second stateless pass (int64 dot per row). Emits
    (vec_id, pc1_q) — the integer projection in millionths^2 units."""
    import ray

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"k": pa.array([], type=pa.int64()),
                             "s_q12": pa.array([], type=pa.int64())})
        q = _emb_qmat(b)
        dim = q.shape[1]
        assert dim <= 4096
        grid = np.arange(dim, dtype=np.int64)
        m = q.T @ q
        # packed 12-bit (d1,d2) key: one int64 column through the
        # exchange, same convention as embedding_covariance_by_label
        return pa.table({"k": pa.array((np.repeat(grid, dim) << 12)
                                       | np.tile(grid, dim)),
                         "s_q12": pa.array(m.reshape(-1))})

    def sum_by_key(b: pa.Table) -> pa.Table:
        g = b.group_by("k").aggregate([("s_q12", "sum")])
        return g.select(['k', 's_q12_sum']).rename_columns(["k", "s_q12"])

    # batch_size=None on the single post-repartition block keeps the
    # final fold exact at any combined-grid size (see covariance note)
    mom = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=8192)
           .map_batches(sum_by_key, batch_format="pyarrow",
                        batch_size=1 << 20)
           .repartition(1)
           .map_batches(sum_by_key, batch_format="pyarrow",
                        batch_size=None)
           .to_pandas())
    mom["d1"] = (mom["k"].to_numpy() >> 12) + 1
    mom["d2"] = (mom["k"].to_numpy() & 4095) + 1
    mom = mom.sort_values(["d1", "d2"])
    dim = int(mom["d1"].max()) if len(mom) else 0
    if dim == 0:
        return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                             "pc1_q": pd.Series([], dtype=np.int64)})
    # arbitrary-precision integer matrix: matvec entries exceed int64
    mat = [[int(v) for v in row]
           for row in mom["s_q12"].to_numpy().reshape(dim, dim)]
    v = [10 ** 6] * dim
    for _ in range(PCA_ITERS):
        w = [sum(mat[i][j] * v[j] for j in range(dim))
             for i in range(dim)]
        mx = max(abs(x) for x in w)
        if mx == 0:
            break
        v = [(abs(x) * 10 ** 6 // mx) * (1 if x >= 0 else -1)
             for x in w]
    vref = ray.put(np.array(v, dtype=np.int64))

    def project(b: pa.Table, _vref=vref) -> pa.Table:
        vv = ray.get(_vref)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "pc1_q": pa.array([], type=pa.int64())})
        q = _emb_qmat(b)
        return pa.table({"vec_id": pa.array(ids),
                         "pc1_q": pa.array(q @ vv)})

    return ds.map_batches(project, batch_format="pyarrow")


def events_props_extract(sf_dir: str):
    """Semi-structured ELT: pull the integer ``k`` field out of the
    ``props`` JSON column and aggregate it per event type — the
    schema-on-read extraction step every event pipeline runs before
    relational work. Parsing is the jsoncol.extract_int_field kernel
    (ONE vectorized C++ regex pass for the flat machine-written shape,
    exact json.loads only for the rows that deviate), then per-batch
    (type, n, sum, min, max, missing) partials fold through a
    <=|types|-row groupby. All outputs are exact integers."""
    from ray.data.aggregate import Max, Min, Sum

    from rayschema.jsoncol import extract_int_field

    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("event_type")))
        et = b.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        n = len(et)
        if n == 0:
            return pa.table({
                "event_type": pa.array([], type=pa.string()),
                "n_events": pa.array([], type=pa.int64()),
                "sum_k": pa.array([], type=pa.int64()),
                "min_k": pa.array([], type=pa.int64()),
                "max_k": pa.array([], type=pa.int64()),
                "n_missing": pa.array([], type=pa.int64())})
        vals, ok = extract_int_field(b.column("props"), "k")
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ntypes = len(enc.dictionary)
        n_ev = np.bincount(codes, minlength=ntypes).astype(np.int64)
        s = np.bincount(codes[ok], weights=vals[ok],
                        minlength=ntypes).astype(np.int64)
        miss = np.bincount(codes[~ok], minlength=ntypes).astype(np.int64)
        mn = np.full(ntypes, np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(ntypes, np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(mn, codes[ok], vals[ok])
        np.maximum.at(mx, codes[ok], vals[ok])
        # partials with no valid k for a type keep the +-INF sentinels so
        # they can never pollute the global Min/Max fold; the sentinel is
        # cleaned up after the final aggregate
        return pa.table({
            "event_type": enc.dictionary,
            "n_events": pa.array(n_ev), "sum_k": pa.array(s),
            "min_k": pa.array(mn), "max_k": pa.array(mx),
            "n_missing": pa.array(miss)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("sum_k", alias_name="sum_k"),
                      Min("min_k", alias_name="min_k"),
                      Max("max_k", alias_name="max_k"),
                      Sum("n_missing", alias_name="n_missing")))

    def clean(b: pa.Table) -> pa.Table:
        none = pc.equal(b.column("n_missing"), b.column("n_events"))
        z = pa.array(np.zeros(len(b), dtype=np.int64))
        return b.set_column(
            b.schema.get_field_index("min_k"), "min_k",
            pc.if_else(none, z, b.column("min_k"))).set_column(
            b.schema.get_field_index("max_k"), "max_k",
            pc.if_else(none, z, b.column("max_k")))

    return agg.map_batches(clean, batch_format="pyarrow")


def user_hourly_locf(sf_dir: str):
    """Time-series gap-fill resample: each user's event stream becomes a
    dense HOURLY series from their first to their last active hour, with
    missing hours forward-filled by the last observed value (LOCF — the
    standard sensor/metric resample before feature extraction). The
    observation of an hour is its LAST event by (ts, event_id).

    ONE user-keyed ``sorted_group_scan`` ordered by (hour, ts, event_id);
    the block kernel is fully vectorized ACROSS users: run-boundary masks
    pick each hour's last event, ``_concat_ranges`` materializes all
    ragged user grids at once, and the forward fill is one global
    ``np.maximum.accumulate`` over observed-index sentinels (safe across
    segment joins because every user's first grid hour is observed by
    construction). Per-user state never exists; grid volume is
    sum-of-spans, emitted streaming per block. Emits
    (user_id, hour_bucket, value_cents, is_observed)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_id", "ts", "value"])

    def narrow(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(pc.and_(
            pc.is_valid(b.column("user_id")),
            pc.is_valid(b.column("ts"))),
            pc.is_valid(b.column("value"))))
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": pa.array(t.column("user_id")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64)),
            "h": pa.array(us // 3_600_000_000),
            "ts_us": pa.array(us),
            "event_id": pa.array(t.column("event_id")
                                 .to_numpy(zero_copy_only=False)
                                 .astype(np.int64)),
            "cents": pa.array(_cents(t.column("value")
                                     .to_numpy(zero_copy_only=False)))})

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("hour_bucket", pa.int64()),
                            ("value_cents", pa.int64()),
                            ("is_observed", pa.int64())])

    def _locf(uid, h, cents):
        n = len(uid)
        if n == 0:
            return None
        last = np.ones(n, dtype=bool)
        last[:-1] = (uid[1:] != uid[:-1]) | (h[1:] != h[:-1])
        lu, lh, lc = uid[last], h[last], cents[last]
        ufirst = np.ones(len(lu), dtype=bool)
        ufirst[1:] = lu[1:] != lu[:-1]
        ustart = np.flatnonzero(ufirst)
        uend = np.append(ustart[1:], len(lu))
        h0, h1 = lh[ustart], lh[uend - 1]
        span = (h1 - h0 + 1).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(span)[:-1]])
        total = int(span.sum())
        nrows = uend - ustart
        grid_u = np.repeat(lu[ustart], span)
        grid_h = _concat_ranges(span) + np.repeat(h0, span)
        pos = np.repeat(offs, nrows) + (lh - np.repeat(h0, nrows))
        vals = np.zeros(total, dtype=np.int64)
        obs = np.zeros(total, dtype=bool)
        vals[pos] = lc
        obs[pos] = True
        idx = np.where(obs, np.arange(total), -1)
        np.maximum.accumulate(idx, out=idx)
        return pa.table({"user_id": pa.array(grid_u),
                         "hour_bucket": pa.array(grid_h),
                         "value_cents": pa.array(vals[idx]),
                         "is_observed": pa.array(obs.astype(np.int64))})

    def block_fn(block, starts, ends, want):
        if not want.any():
            return None
        flags = np.zeros(block.num_rows + 1, dtype=np.int64)
        np.add.at(flags, starts[want], 1)
        np.add.at(flags, ends[want], -1)
        keep = np.cumsum(flags[:-1]) > 0
        return _locf(
            block.column("user_id").to_numpy(zero_copy_only=False)[keep],
            block.column("h").to_numpy(zero_copy_only=False)[keep],
            block.column("cents").to_numpy(zero_copy_only=False)[keep])

    def group_fn(g: pa.Table):
        return _locf(g.column("user_id").to_numpy(zero_copy_only=False),
                     g.column("h").to_numpy(zero_copy_only=False),
                     g.column("cents").to_numpy(zero_copy_only=False))

    return sorted_group_scan(ds.map_batches(narrow, batch_format="pyarrow"),
                             ["user_id"], group_fn, out_schema,
                             block_fn=block_fn,
                             order_cols=["h", "ts_us", "event_id"])


def perplexity_bucket_filter(sf_dir: str):
    """The CCNet selection step (Wenzek et al. 2020): per LANGUAGE,
    keep the best-perplexity quarter of the corpus — the filter that
    turns LM scores into an actual training set. Mean millibits per
    bigram is the integer ``(cost_mbits * 1000) // n_bigrams``; the
    per-lang cutoff is the exact DuckDB ``quantile_disc(0.25)`` value
    (rank ``ceil(n/4)`` in value order), computed from a bounded
    (lang, mean)-histogram fold — driver state is languages x distinct
    mean values, never rows. Scores materialize ONCE (narrow 5-column
    rows) and both the histogram and the filter stream over them.
    Emits kept (doc_id, lang, mean_mbits)."""
    import ray
    from ray.data.aggregate import Sum

    scores = _bigram_lm_score_ds(sf_dir, with_lang=True).materialize()

    def hpartial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("lang")))
        if b.num_rows == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "mean_mbits": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        cost = b.column("cost_mbits").to_numpy(zero_copy_only=False)
        nb = b.column("n_bigrams").to_numpy(zero_copy_only=False)
        t = pa.table({"lang": b.column("lang"),
                      "mean_mbits": pa.array(cost * 1000 // nb),
                      "one": pa.array(np.ones(b.num_rows,
                                              dtype=np.int64))})
        g = t.group_by(["lang", "mean_mbits"]).aggregate([("one", "sum")])
        return g.select(['lang', 'mean_mbits', 'one_sum']).rename_columns(["lang", "mean_mbits", "cnt"])

    hist = (scores.map_batches(hpartial, batch_format="pyarrow")
            .groupby(["lang", "mean_mbits"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas().sort_values(["lang", "mean_mbits"]))
    cuts: dict = {}
    for lang, sub in hist.groupby("lang"):
        c = sub["cnt"].to_numpy(np.int64)
        cum = np.cumsum(c)
        rank = (cum[-1] + 3) // 4          # ceil(n * 0.25)
        cuts[lang] = int(sub["mean_mbits"].to_numpy(np.int64)[
            np.searchsorted(cum, rank)])
    cref = ray.put(cuts)

    def keep(b: pa.Table, _cref=cref) -> pa.Table:
        cm = ray.get(_cref)
        b = b.filter(pc.is_valid(b.column("lang")))
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "lang": pa.array([], type=pa.string()),
                             "mean_mbits": pa.array([], type=pa.int64())})
        lang = b.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        cost = b.column("cost_mbits").to_numpy(zero_copy_only=False)
        nb = b.column("n_bigrams").to_numpy(zero_copy_only=False)
        mean = cost * 1000 // nb
        enc = lang.dictionary_encode()
        lut = np.array([cm.get(v, np.iinfo(np.int64).min)
                        for v in enc.dictionary.to_pylist()],
                       dtype=np.int64)
        thr = lut[enc.indices.to_numpy(zero_copy_only=False)
                  .astype(np.int64)]
        m = mean <= thr
        return pa.table({
            "doc_id": pa.array(b.column("doc_id")
                               .to_numpy(zero_copy_only=False)
                               .astype(np.int64)[m]),
            "lang": lang.filter(pa.array(m)),
            "mean_mbits": pa.array(mean[m])})

    return scores.map_batches(keep, batch_format="pyarrow")


def orders_reconciliation_audit(sf_dir: str):
    """Cross-table financial reconciliation — the ledger audit every
    warehouse runs: does each order's header total equal the sum of its
    line items under the pricing formula
    ``sum(extendedprice * (1 - discount) * (1 + tax))``? Both sides are
    exact e6 integers (cents x percent x percent), so a mismatch is a
    true discrepancy, never float noise. Plan: both sides tag a side bit
    and UNION into ONE orderkey-keyed sorted_group_scan — per-batch
    pre-aggregated lineitem e6 partials (16-byte rows) plus order
    headers, sorted once; the vectorized block kernel reconciles every
    complete order group (cumsum-difference group sums, header row last
    via the side order column) and ships <= |statuses| partial rows per
    block, with boundary-straddling groups re-checked exactly on the
    driver (<= 2/block). LEFT OUTER semantics: orders with no line
    items are header-only groups (surface as unreconcilable); lineitem
    orphans have no header and emit nothing. Replaced the previous
    groupby + hash-join plan (TWO all-to-all exchanges) with ONE sort —
    half the shuffle volume at scale; below the shared footer-gated
    fold cap the whole audit is one driver argsort+reduceat fold
    (parity-tested), the sort plan staying the path past it. Emits (o_orderstatus, n_orders,
    n_no_lineitems, n_mismatched, sum_absdiff_e6)."""
    from rayschema.dedup import sorted_group_scan

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_tax"])

    def li_partial(b: pa.Table) -> pa.Table:
        price = _cents(b.column("l_extendedprice")
                       .to_numpy(zero_copy_only=False))
        disc = np.round((1.0 - b.column("l_discount")
                         .to_numpy(zero_copy_only=False)
                         .astype(np.float64)) * 100).astype(np.int64)
        tax = np.round((1.0 + b.column("l_tax")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64)) * 100).astype(np.int64)
        # no per-batch group_by: orderkeys are scattered across batches,
        # so local aggregation barely dedups (600k -> 581k measured) and
        # its CPU loses to just sorting the raw 24-byte rows
        n = b.num_rows
        return pa.table({"k": b.column("l_orderkey").cast(pa.int64()),
                         "side": pa.array(np.zeros(n, dtype=np.int64)),
                         "e6": pa.array(price * disc * tax),
                         "total_e6": pa.array(np.zeros(n, dtype=np.int64)),
                         "status": pa.nulls(n, pa.string())})

    def ord_narrow(b: pa.Table) -> pa.Table:
        st = b.column("o_orderstatus")
        if isinstance(st, pa.ChunkedArray):
            st = st.combine_chunks()
        n = b.num_rows
        return pa.table({
            "k": b.column("o_orderkey").cast(pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int64)),
            "e6": pa.array(np.zeros(n, dtype=np.int64)),
            "total_e6": pa.array(_cents(
                b.column("o_totalprice")
                .to_numpy(zero_copy_only=False)) * 10000),
            "status": st})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    mixed = (li.map_batches(li_partial, batch_format="pyarrow")
             .union(orders.map_batches(ord_narrow, batch_format="pyarrow")))

    out_schema = pa.schema([("o_orderstatus", pa.string()),
                            ("n_orders", pa.int64()),
                            ("n_no_lineitems", pa.int64()),
                            ("n_mismatched", pa.int64()),
                            ("sum_absdiff_e6", pa.int64())])

    def _rows(status_arr, sizes, diffs) -> pa.Table:
        df = pd.DataFrame({"s": status_arr,
                           "no_li": (sizes == 1).astype(np.int64),
                           "mis": (diffs != 0).astype(np.int64),
                           "d": diffs})
        agg = df.groupby("s", as_index=False, sort=False).agg(
            n_orders=("d", "size"), n_no_lineitems=("no_li", "sum"),
            n_mismatched=("mis", "sum"), sum_absdiff_e6=("d", "sum"))
        return pa.table({
            "o_orderstatus": pa.array(agg["s"], type=pa.string()),
            "n_orders": pa.array(agg["n_orders"].to_numpy(np.int64)),
            "n_no_lineitems": pa.array(
                agg["n_no_lineitems"].to_numpy(np.int64)),
            "n_mismatched": pa.array(
                agg["n_mismatched"].to_numpy(np.int64)),
            "sum_absdiff_e6": pa.array(
                agg["sum_absdiff_e6"].to_numpy(np.int64))})

    n_li_rows = _table_rows(sf_dir, "lineitem")
    n_or_rows = _table_rows(sf_dir, "orders")
    if n_li_rows is not None and n_or_rows is not None \
            and n_li_rows + n_or_rows <= TRADE_PAIR_FOLD_CAP:
        # footer-gated in-process fold (TRADE_PAIR_FOLD_CAP discipline):
        # one argsort+reduceat replaces the union sort; the ONE-sort
        # distributed plan stays the path past the cap
        ldf = li.to_pandas()
        odf = orders.to_pandas()
        price = _cents(ldf["l_extendedprice"].to_numpy())
        disc = np.round((1.0 - ldf["l_discount"].to_numpy()
                         .astype(np.float64)) * 100).astype(np.int64)
        tax = np.round((1.0 + ldf["l_tax"].to_numpy()
                        .astype(np.float64)) * 100).astype(np.int64)
        e6 = price * disc * tax
        lk = ldf["l_orderkey"].to_numpy().astype(np.int64)
        order = np.argsort(lk, kind="stable")
        lk_s, e6_s = lk[order], e6[order]
        if len(lk_s):
            uk, start = np.unique(lk_s, return_index=True)
            sums = np.add.reduceat(e6_s, start)
            cnts = np.diff(np.append(start, len(lk_s)))
        else:
            uk = np.empty(0, np.int64)
            sums = cnts = np.empty(0, np.int64)
        ok_arr = odf["o_orderkey"].to_numpy().astype(np.int64)
        tot_arr = _cents(odf["o_totalprice"].to_numpy()) * 10000
        st_arr = odf["o_orderstatus"].to_numpy(object)
        if len(uk):
            pos = np.clip(np.searchsorted(uk, ok_arr), 0, len(uk) - 1)
            hit = uk[pos] == ok_arr
            li_sum = np.where(hit, sums[pos], 0)
            nli = np.where(hit, cnts[pos], 0)
        else:
            li_sum = np.zeros(len(ok_arr), np.int64)
            nli = np.zeros(len(ok_arr), np.int64)
        scan = _rows(st_arr, nli + 1,
                     np.abs(li_sum - tot_arr)).to_pandas()
        agg = scan.groupby("o_orderstatus", as_index=False).sum()
        for cn in ["n_orders", "n_no_lineitems", "n_mismatched",
                   "sum_absdiff_e6"]:
            agg[cn] = agg[cn].astype(np.int64)
        return agg.sort_values("o_orderstatus").reset_index(drop=True)

    def block_fn(block, starts, ends, want):
        if not want.any():
            return None
        side = block.column("side").to_numpy(zero_copy_only=False)
        e6 = block.column("e6").to_numpy(zero_copy_only=False)
        tot = block.column("total_e6").to_numpy(zero_copy_only=False)
        cs = np.concatenate([[0], np.cumsum(e6)])
        # side orders the header (side=1) LAST within each group
        m = want & (side[ends - 1] == 1)
        if not m.any():
            return None
        s_, e_ = starts[m], ends[m]
        diffs = np.abs((cs[e_] - cs[s_]) - tot[e_ - 1])
        status = block.column("status").take(pa.array(e_ - 1)) \
            .to_numpy(zero_copy_only=False)
        return _rows(status, e_ - s_, diffs)

    def group_fn(g: pa.Table):
        side = g.column("side").to_numpy(zero_copy_only=False)
        if len(side) == 0 or side[-1] != 1:
            return None          # no order header: lineitem orphan
        e6 = g.column("e6").to_numpy(zero_copy_only=False)
        tot = g.column("total_e6").to_numpy(zero_copy_only=False)
        diffs = np.abs(np.array([e6.sum() - tot[-1]]))
        status = np.array([g.column("status")[-1].as_py()], dtype=object)
        return _rows(status, np.array([g.num_rows]), diffs)

    scan = sorted_group_scan(mixed, ["k"], group_fn, out_schema,
                             order_cols=["side"],
                             block_fn=block_fn).to_pandas()
    agg = scan.groupby("o_orderstatus", as_index=False).sum()
    for cn in ["n_orders", "n_no_lineitems", "n_mismatched",
               "sum_absdiff_e6"]:
        agg[cn] = agg[cn].astype(np.int64)
    return agg.sort_values("o_orderstatus").reset_index(drop=True)


def throttled_events(sf_dir: str):
    """Streaming debounce / rate-limit audit: an event is KEPT when it
    is the first for its (user, event_type) or arrives >= 1 hour after
    the PREVIOUS event of that key (lag semantics — each event compares
    to its immediate predecessor in time order, the alert-throttling
    rule). ONE (user, type)-keyed sorted scan ordered by (ts, event_id);
    the block kernel is a shifted compare — no per-group Python. Emits
    per-key (user_id, event_type, n_events, n_kept)."""
    from rayschema.dedup import sorted_group_scan

    GAP_US = 3_600_000_000
    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])

    def narrow(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(pc.is_valid(b.column("user_id")),
                             pc.and_(pc.is_valid(b.column("event_type")),
                                     pc.is_valid(b.column("ts")))))
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return pa.table({
            "user_id": pa.array(t.column("user_id")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64)),
            "event_type": et,
            "ts_us": pa.array(t.column("ts").cast(pa.int64())
                              .to_numpy(zero_copy_only=False)),
            "event_id": pa.array(t.column("event_id")
                                 .to_numpy(zero_copy_only=False)
                                 .astype(np.int64))})

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("event_type", pa.string()),
                            ("n_events", pa.int64()),
                            ("n_kept", pa.int64())])

    def _fold(uid, et_np, ts):
        first = np.ones(len(uid), dtype=bool)
        first[1:] = (uid[1:] != uid[:-1]) | (et_np[1:] != et_np[:-1])
        gap = np.ones(len(uid), dtype=bool)
        gap[1:] = (ts[1:] - ts[:-1]) >= GAP_US
        kept = (first | gap).astype(np.int64)
        df = pd.DataFrame({"u": uid, "t": et_np, "k": kept})
        agg = df.groupby(["u", "t"], as_index=False, sort=False).agg(
            n_events=("k", "size"), n_kept=("k", "sum"))
        return pa.table({"user_id": pa.array(agg["u"].to_numpy(np.int64)),
                         "event_type": pa.array(agg["t"], type=pa.string()),
                         "n_events": pa.array(agg["n_events"]
                                              .to_numpy(np.int64)),
                         "n_kept": pa.array(agg["n_kept"]
                                            .to_numpy(np.int64))})

    def block_fn(block, starts, ends, want):
        if not want.any():
            return None
        flags = np.zeros(block.num_rows + 1, dtype=np.int64)
        np.add.at(flags, starts[want], 1)
        np.add.at(flags, ends[want], -1)
        keep = np.cumsum(flags[:-1]) > 0
        uid = block.column("user_id").to_numpy(zero_copy_only=False)[keep]
        et_np = block.column("event_type") \
            .to_numpy(zero_copy_only=False)[keep]
        ts = block.column("ts_us").to_numpy(zero_copy_only=False)[keep]
        if len(uid) == 0:
            return None
        return _fold(uid, et_np, ts)

    def group_fn(g: pa.Table):
        return _fold(g.column("user_id").to_numpy(zero_copy_only=False),
                     g.column("event_type").to_numpy(zero_copy_only=False),
                     g.column("ts_us").to_numpy(zero_copy_only=False))

    # string group key: sorted_group_scan sorts by (user, type) with
    # within-group (ts, event_id) ordering
    return sorted_group_scan(ds.map_batches(narrow,
                                            batch_format="pyarrow"),
                             ["user_id", "event_type"], group_fn,
                             out_schema,
                             order_cols=["ts_us", "event_id"],
                             block_fn=block_fn)


def value_median_interp_by_type(sf_dir: str):
    """Grouped INTERPOLATED median (the percentile_cont complement of the
    engine's lower-quantile rule): per event type, the median in doubled
    units ``med2 = lower_mid + upper_mid`` stays a pure integer, so an
    even-count group's half-cent midpoint crosses the oracle boundary
    without any float. Per-batch (type, cents) value-count partials fold
    into per-type histograms (state = types x distinct cents, never
    rows); ranks (n-1)//2 and n//2 read off the cumsum. Emits
    (event_type, n, med2_cents)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("event_type")),
                             pc.is_valid(b.column("value"))))
        if b.num_rows == 0:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "cents": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        t = pa.table({"event_type": b.column("event_type"),
                      "cents": pa.array(_cents(
                          b.column("value")
                          .to_numpy(zero_copy_only=False)))})
        g = t.group_by(["event_type", "cents"]).aggregate(
            [([], "count_all")])
        return g.select(['event_type', 'cents', 'count_all']).rename_columns(["event_type", "cents", "cnt"])

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .to_pandas()
            .groupby(["event_type", "cents"], as_index=False)["cnt"]
            .sum().sort_values(["event_type", "cents"]))
    rows = []
    for et, sub in hist.groupby("event_type"):
        v = sub["cents"].to_numpy(np.int64)
        c = sub["cnt"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        lo = v[np.searchsorted(cum, (n - 1) // 2 + 1)]
        hi = v[np.searchsorted(cum, n // 2 + 1)]
        rows.append((et, n, int(lo + hi)))
    return pd.DataFrame(rows, columns=["event_type", "n", "med2_cents"]) \
        .sort_values("event_type").reset_index(drop=True)


PSI_BSHIFT = 8


def psi_value_drift(sf_dir: str):
    """Population Stability Index — the model-monitoring drift metric —
    of each event type's value distribution against the GLOBAL value
    distribution, with +1 smoothing over the global bucket domain.
    Each bucket's contribution
    ``floor(1e6 * (p - q) * (log2((na+1)(NB+K)) - log2((nb+1)(NA+K))))``
    is ONE identical float expression over exact integer counts (the
    bigram-LM discipline: integer per-term floors -> order-proof sums
    downstream). ONE pass folds (type, bucket) count partials; the
    bounded (types x buckets) grid finishes on the driver. Emits
    (event_type, bucket, n_type, n_global, psi_contrib_micro)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("event_type")),
                             pc.is_valid(b.column("value"))))
        if b.num_rows == 0:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "bucket": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        cents = _cents(b.column("value").to_numpy(zero_copy_only=False))
        t = pa.table({"event_type": b.column("event_type"),
                      "bucket": pa.array(cents >> PSI_BSHIFT)})
        g = t.group_by(["event_type", "bucket"]).aggregate(
            [([], "count_all")])
        return g.select(['event_type', 'bucket', 'count_all']).rename_columns(["event_type", "bucket", "cnt"])

    grid = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "bucket"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas())
    glob = grid.groupby("bucket", as_index=False)["cnt"].sum() \
        .rename(columns={"cnt": "nb"})
    k = len(glob)
    nb_total = int(glob["nb"].sum())
    types = sorted(grid["event_type"].unique())
    # full (type x global-bucket) grid: unobserved cells still contribute
    # through the +1 smoothing
    full = pd.MultiIndex.from_product(
        [types, glob["bucket"].to_numpy(np.int64)],
        names=["event_type", "bucket"]).to_frame(index=False)
    full = full.merge(grid, on=["event_type", "bucket"], how="left") \
        .fillna({"cnt": 0})
    full = full.merge(glob, on="bucket")
    na = full["cnt"].to_numpy(np.int64)
    nb = full["nb"].to_numpy(np.int64)
    na_tot = full["event_type"].map(
        grid.groupby("event_type")["cnt"].sum()).to_numpy(np.int64)
    p = (na + 1.0) / (na_tot + k)
    q = (nb + 1.0) / (nb_total + k)
    lg = (np.log2((na + 1.0) * (nb_total + k))
          - np.log2((nb + 1.0) * (na_tot + k)))
    full["psi_contrib_micro"] = np.floor(
        1000000.0 * ((p - q) * lg)).astype(np.int64)
    full["n_type"] = na
    full["n_global"] = nb
    return full[["event_type", "bucket", "n_type", "n_global",
                 "psi_contrib_micro"]] \
        .sort_values(["event_type", "bucket"]).reset_index(drop=True)


PMI_MIN_COUNT = 5
PMI_TOP_N = 40


def pmi_top_pairs(sf_dir: str):
    """Collocation mining: top-40 adjacent word pairs by pointwise
    mutual information ``log2(c_ab * N / (ca * cb))`` in floor-millibits
    (one identical float expression over exact integer counts), with a
    min-count floor of 5 against rare-pair noise. Counts come from the
    shared ``_bigram_pair_counts`` partials; ca/cb are the pair-start /
    pair-end marginals, N the total bigram mass — the whole ranking
    finishes on the vocabulary-bounded driver table. Emits
    (w1, w2, pair_count, pmi_mbits)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = _bigram_pair_counts(ds)
    if len(pairs) == 0:
        return pd.DataFrame({"w1": [], "w2": [], "pair_count": [],
                             "pmi_mbits": []})
    nt = int(pairs["c"].sum())
    ca = pairs.groupby("w1")["c"].sum()
    cb = pairs.groupby("w2")["c"].sum()
    sub = pairs[pairs["c"] >= PMI_MIN_COUNT].copy()
    a = sub["w1"].map(ca).to_numpy(np.int64)
    b = sub["w2"].map(cb).to_numpy(np.int64)
    c = sub["c"].to_numpy(np.int64)
    sub["pmi_mbits"] = np.floor(
        1000.0 * (np.log2(c.astype(np.float64) * nt)
                  - np.log2(a.astype(np.float64) * b))).astype(np.int64)
    sub = sub.sort_values(["pmi_mbits", "w1", "w2"],
                          ascending=[False, True, True],
                          kind="mergesort").head(PMI_TOP_N)
    out = sub.rename(columns={"c": "pair_count"}).reset_index(drop=True)
    out["pair_count"] = out["pair_count"].astype(np.int64)
    return out[["w1", "w2", "pair_count", "pmi_mbits"]]


# ------------------------------------------------------------------ session-5 operators
def normalized_exact_dedup(sf_dir: str):
    """CCNet-style fuzzy-exact dedup: normalize text (Unicode lowercase,
    strip every char outside [a-z ], collapse space runs, trim), then
    EXACT dedup on the normalized form — the standard web-corpus step
    that catches case/punctuation/digit variants MinHash would score as
    near- rather than exact duplicates. Normalization is three RE2
    kernels per batch (zero Python rows); the dedup is the shared
    _exact_dedup_core distributed plan (24 B/row shuffle, bitmap
    broadcast, sorted-scan exact verify — the text itself never reaches
    the driver). Emits the kept doc_ids (min doc_id per normalized
    form), matching GROUP BY trim(regexp_replace(...)) in the oracle."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def norm(b: pa.Table) -> pa.Table:
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        low = pc.utf8_lower(txt)
        stripped = pc.replace_substring_regex(
            low, pattern="[^a-z ]", replacement="")
        collapsed = pc.replace_substring_regex(
            stripped, pattern=" +", replacement=" ")
        return pa.table({"doc_id": b.column("doc_id"),
                         "text": pc.utf8_trim(collapsed, characters=" ")})

    return _exact_dedup_core(ds.map_batches(norm, batch_format="pyarrow"),
                             emit="kept",
                             n_rows=_table_rows(sf_dir, "documents"))


WINSOR_LO_PCT = 5     # p5 / p95, percentile_disc rule
WINSOR_HI_PCT = 95


def winsorize_events(sf_dir: str):
    """Per-type winsorization audit — the outlier-clipping step of a
    numeric feature pipeline, with EXACT integer quantiles. ONE
    stateless pass folds per-batch (type, cents, count) value-histogram
    partials (state = types x distinct cents — value-space bounded,
    never row-count bounded; a combiner map_batches level slots in if
    distinct cents ever grows); the driver reads p5/p95 off each
    type's cumulative histogram with the percentile_disc rule (smallest
    value whose cumulative count reaches ceil(q*n), integer compare —
    no floats), and the clipped sum is computed FROM the histogram, so
    there is no second data pass. Emits
    (event_type, n, lo_cents, hi_cents, sum_clipped_cents)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("event_type")),
                             pc.is_valid(b.column("value"))))
        if b.num_rows == 0:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "cents": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        t = pa.table({"event_type": b.column("event_type"),
                      "cents": pa.array(_cents(
                          b.column("value")
                          .to_numpy(zero_copy_only=False)))})
        g = t.group_by(["event_type", "cents"]).aggregate(
            [([], "count_all")])
        return g.select(['event_type', 'cents', 'count_all']).rename_columns(["event_type", "cents", "cnt"])

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .to_pandas()
            .groupby(["event_type", "cents"], as_index=False)["cnt"]
            .sum())
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("cents")
        c = g["cents"].to_numpy(np.int64)
        cnt = g["cnt"].to_numpy(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        # percentile_disc(q): smallest value with 100*cum >= q*100*n
        lo = int(c[np.searchsorted(cum * 100, WINSOR_LO_PCT * n)])
        hi = int(c[np.searchsorted(cum * 100, WINSOR_HI_PCT * n)])
        clipped = np.clip(c, lo, hi)
        rows.append((et, n, lo, hi, int((clipped * cnt).sum())))
    return pd.DataFrame(rows, columns=["event_type", "n", "lo_cents",
                                       "hi_cents", "sum_clipped_cents"])


def token_fertility_by_lang(sf_dir: str):
    """Tokenizer fertility audit per language — BPE-ish regex tokens per
    whitespace word, the standard multilingual-tokenizer health metric
    (a high ratio means the tokenizer fragments that language). ONE
    stateless pass computes BOTH counts per batch (two RE2 kernels) and
    folds <= |langs| integer partial rows; fertility is an exact
    floor((1e6 * sum_bpe) / sum_words) the DuckDB oracle replays in
    integer division. Emits (lang, n_docs, sum_words, sum_bpe,
    fertility_ppm)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("lang")),
                             pc.is_valid(b.column("text"))))
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        spaces = pc.count_substring(txt, " ").cast(pa.int64())
        words = pc.if_else(pc.equal(pc.utf8_length(txt), 0),
                           pa.scalar(0, type=pa.int64()),
                           pc.add(spaces, pa.scalar(1, type=pa.int64())))
        bpe = pc.count_substring_regex(txt, r"\w+|[^\w\s]") \
            .cast(pa.int64())
        t = pa.table({"lang": b.column("lang"), "w": words, "bpe": bpe,
                      "one": pa.array(np.ones(b.num_rows,
                                              dtype=np.int64))})
        g = t.group_by("lang").aggregate(
            [("one", "sum"), ("w", "sum"), ("bpe", "sum")])
        return g.select(['lang', 'one_sum', 'w_sum', 'bpe_sum']).rename_columns(["lang", "n_docs", "sum_words",
                                 "sum_bpe"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("lang")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("sum_words", alias_name="sum_words"),
                      Sum("sum_bpe", alias_name="sum_bpe"))
           .to_pandas())
    # arbitrary-precision Python ints: 1e6 * sum_bpe would wrap int64
    # past ~9.2e12 tokens (inside the 100-TB envelope); the oracle is
    # HUGEINT, so the driver fold must be exact too
    out["fertility_ppm"] = np.array(
        [(1_000_000 * int(b)) // int(w) if int(w) > 0 else 0
         for b, w in zip(out["sum_bpe"], out["sum_words"])],
        dtype=np.int64)
    for cn in ["n_docs", "sum_words", "sum_bpe"]:
        out[cn] = out[cn].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


CURRICULUM_BINS = 4


def curriculum_bins(sf_dir: str):
    """Curriculum binning: NTILE(4) over whitespace token count within
    each source — the "order training data easy-to-hard per domain"
    prep step. Per-batch (source, tok, count) histogram partials fold
    on the driver (state = sources x distinct token counts — value-
    space bounded); each source's exact NTILE split (first n%4 buckets
    take the extra row, ties share a token count so the per-bin
    aggregate is histogram-derivable without doc identity) yields
    (source, bin, n_docs, sum_tokens). Matches an
    NTILE(4) OVER (PARTITION BY source ORDER BY tok, doc_id) oracle."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("source")),
                             pc.is_valid(b.column("text"))))
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        spaces = pc.count_substring(txt, " ").cast(pa.int64())
        tok = pc.if_else(pc.equal(pc.utf8_length(txt), 0),
                         pa.scalar(0, type=pa.int64()),
                         pc.add(spaces, pa.scalar(1, type=pa.int64())))
        t = pa.table({"source": b.column("source"), "tok": tok})
        g = t.group_by(["source", "tok"]).aggregate([([], "count_all")])
        return g.select(['source', 'tok', 'count_all']).rename_columns(["source", "tok", "cnt"])

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .to_pandas()
            .groupby(["source", "tok"], as_index=False)["cnt"].sum())
    rows = []
    k = CURRICULUM_BINS
    for src, g in hist.groupby("source", sort=True):
        g = g.sort_values("tok")
        tok = g["tok"].to_numpy(np.int64)
        cnt = g["cnt"].to_numpy(np.int64)
        n = int(cnt.sum())
        q, r = divmod(n, k)
        # NTILE bucket b covers ranks (prefix(b-1), prefix(b)]
        bounds = np.cumsum([q + 1 if i < r else q for i in range(k)])
        lo_rank = 0
        cum = np.cumsum(cnt)
        for b_i, hi_rank in enumerate(bounds, start=1):
            if hi_rank == lo_rank:
                continue
            # rows with rank in (lo_rank, hi_rank]: split histogram cells
            take = np.clip(np.minimum(cum, hi_rank)
                           - np.minimum(cum - cnt, hi_rank), 0, None) \
                - np.clip(np.minimum(cum, lo_rank)
                          - np.minimum(cum - cnt, lo_rank), 0, None)
            rows.append((src, b_i, int(take.sum()),
                         int((take * tok).sum())))
            lo_rank = hi_rank
    return pd.DataFrame(rows, columns=["source", "bin", "n_docs",
                                       "sum_tokens"])


OLS_HOUR_BASE = 490_000   # epoch hours (~2025-11); keeps h small


def ols_value_on_hour(sf_dir: str):
    """Grouped integer OLS — per event type, the least-squares slope of
    value (cents) on event hour, the trend-regression step of a metric
    monitor. ONE stateless pass folds exact int64 moment partials
    (n, sum_h, sum_y, sum_hh, sum_hy) per type (hours are rebased by a
    FIXED constant so every moment stays within int64 at 10^12 rows);
    the driver computes slope_ppm = sign(num) * ((1e6*|num|) // den)
    with num = n*sum_hy - sum_h*sum_y, den = n*sum_hh - sum_h^2 in
    arbitrary-precision Python ints — the kmeans_quantized explicit-sign
    floor-division discipline, replayed by the oracle in HUGEINT.
    Emits (event_type, n, sum_h, sum_y, slope_ppm)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("event_type")),
                             pc.and_(pc.is_valid(b.column("ts")),
                                     pc.is_valid(b.column("value")))))
        if b.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "sum_h": pa.array([], type=pa.int64()),
                "sum_y": pa.array([], type=pa.int64()),
                "sum_hh": pa.array([], type=pa.int64()),
                "sum_hy": pa.array([], type=pa.int64())})
        h = (b.column("ts").cast(pa.int64())
             .to_numpy(zero_copy_only=False) // 3_600_000_000) \
            - OLS_HOUR_BASE
        y = _cents(b.column("value").to_numpy(zero_copy_only=False))
        t = pa.table({"event_type": b.column("event_type"),
                      "n": pa.array(np.ones(len(h), dtype=np.int64)),
                      "sum_h": pa.array(h), "sum_y": pa.array(y),
                      "sum_hh": pa.array(h * h),
                      "sum_hy": pa.array(h * y)})
        g = t.group_by("event_type").aggregate(
            [("n", "sum"), ("sum_h", "sum"), ("sum_y", "sum"),
             ("sum_hh", "sum"), ("sum_hy", "sum")])
        return g.select(['event_type', 'n_sum', 'sum_h_sum', 'sum_y_sum', 'sum_hh_sum', 'sum_hy_sum']).rename_columns(["event_type", "n", "sum_h", "sum_y",
                                 "sum_hh", "sum_hy"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sum_h", alias_name="sum_h"),
                      Sum("sum_y", alias_name="sum_y"),
                      Sum("sum_hh", alias_name="sum_hh"),
                      Sum("sum_hy", alias_name="sum_hy"))
           .to_pandas())
    slopes = []
    for _, row in out.iterrows():
        n, sh, sy = int(row["n"]), int(row["sum_h"]), int(row["sum_y"])
        num = n * int(row["sum_hy"]) - sh * sy
        den = n * int(row["sum_hh"]) - sh * sh
        if den == 0:
            slopes.append(0)
        else:
            s = 1 if num >= 0 else -1
            slopes.append(s * ((1_000_000 * abs(num)) // den))
    out["slope_ppm"] = np.array(slopes, dtype=np.int64)
    for cn in ["n", "sum_h", "sum_y"]:
        out[cn] = out[cn].astype(np.int64)
    return (out[["event_type", "n", "sum_h", "sum_y", "slope_ppm"]]
            .sort_values("event_type").reset_index(drop=True))


def label_conflict_audit(sf_dir: str):
    """Data-quality audit: doc_ids whose EXACT text appears under more
    than one lang label — conflicting annotations that poison langid
    training. Stage 1 ships only (text_hash, lang) pairs (per-batch
    distinct) into one hash-keyed sorted scan that flags hash groups
    with >= 2 distinct langs; stage 2 broadcasts the candidate-hash
    BITMAP (fixed 2 MB) and re-verifies candidates EXACTLY on
    co-located (text, lang) — hash collisions between different texts
    can never fabricate a conflict. Emits the conflicted doc_ids
    (doc_id, lang)."""
    import ray

    from rayschema.dedup import (_bitmap_hash, _bitmap_member,
                                 sorted_group_scan)
    from rayschema.sketches import hash64

    BM_BITS = 24
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def pairs(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("text")),
                             pc.is_valid(b.column("lang"))))
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        df = pd.DataFrame({
            "uk": hash64(txt.to_numpy(zero_copy_only=False))
            .view(np.int64),
            "lang": b.column("lang").to_numpy(zero_copy_only=False)})
        g = df.drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False)

    # stage 1: candidate hashes = hash groups with >= 2 distinct langs
    def cand_group(g: pa.Table):
        langs = g.column("lang").to_numpy(zero_copy_only=False)
        if len(np.unique(langs)) < 2:
            return None
        return pa.table({"uk": g.column("uk").slice(0, 1)})

    def cand_block(b: pa.Table, starts, ends, want):
        if not want.any():
            return None
        # a multi-row (uk, lang)-distinct group has >= 2 distinct langs
        # by construction ONLY if the same uk appears with two langs;
        # per-batch distinct rows may still repeat across batches, so
        # re-check distinctness vectorized
        uk = b.column("uk").to_numpy(zero_copy_only=False)
        lang = b.column("lang").to_numpy(zero_copy_only=False)
        sel = np.repeat(want, ends - starts)
        df = pd.DataFrame({"uk": uk[sel], "lang": lang[sel]})
        nun = df.groupby("uk")["lang"].nunique()
        cand = nun.index[nun >= 2].to_numpy(np.int64)
        if len(cand) == 0:
            return None
        return pa.table({"uk": pa.array(cand)})

    cands = sorted_group_scan(
        ds.map_batches(pairs, batch_format="pyarrow"), ["uk"],
        cand_group, pa.schema([("uk", pa.int64())]),
        group_filter=lambda b, s, e: (e - s) >= 2,
        block_fn=cand_block).to_pandas()
    if len(cands) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "lang": pd.Series([], dtype=object)})
    acc = np.zeros(1 << BM_BITS, dtype=bool)
    acc[_bitmap_hash(cands["uk"].to_numpy(np.int64), BM_BITS)] = True
    ref = ray.put(np.packbits(acc))

    def pick(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("text")),
                             pc.is_valid(b.column("lang"))))
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        uks = hash64(txt.to_numpy(zero_copy_only=False)).view(np.int64)
        sel = _bitmap_member(uks, ray.get(ref), BM_BITS)
        return pa.table({"uk": pa.array(uks[sel]),
                         "doc_id": b.column("doc_id").filter(
                             pa.array(sel)),
                         "text": txt.filter(pa.array(sel)),
                         "lang": b.column("lang").filter(pa.array(sel))})

    # stage 2: exact verify on co-located text (resolves collisions)
    def verify_group(g: pa.Table):
        df = pd.DataFrame({
            "doc_id": g.column("doc_id").to_pandas(),
            "text": g.column("text").to_pandas(),
            "lang": g.column("lang").to_pandas()})
        nun = df.groupby("text")["lang"].transform("nunique")
        hit = df[nun >= 2]
        if not len(hit):
            return None
        return pa.table({"doc_id": pa.array(hit["doc_id"].to_numpy(),
                                            type=pa.int64()),
                         "lang": pa.array(hit["lang"],
                                          type=pa.string())})

    out = sorted_group_scan(
        ds.map_batches(pick, batch_format="pyarrow"), ["uk"],
        verify_group, pa.schema([("doc_id", pa.int64()),
                                 ("lang", pa.string())]),
        group_filter=lambda b, s, e: (e - s) >= 2).to_pandas()
    return out.sort_values(["doc_id", "lang"]).reset_index(drop=True)


AB_CUTOFF_US = 1_705_363_200_000_000   # 2024-01-16T00:00:00Z, mid-corpus


def ab_test_value_audit(sf_dir: str):
    """Pre/post A/B shift audit — per event type, Welch's t^2 between
    value (cents) before and after a FIXED cutoff timestamp, the
    metric-regression gate of an experiment pipeline. ONE stateless
    pass folds exact int64 moment partials per (type, arm) — count,
    sum, sum-of-squares — and the driver (and the oracle, from the SAME
    integers cast to DOUBLE in the SAME operation order) computes
    t2 = (ma-mb)^2 / (va/na + vb/nb) with population variances; the
    value hash compares at 6 decimals. Emits (event_type, n_a, sum_a,
    n_b, sum_b, t2)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("event_type")),
                             pc.and_(pc.is_valid(b.column("ts")),
                                     pc.is_valid(b.column("value")))))
        if b.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], type=pa.string()),
                "n_a": pa.array([], type=pa.int64()),
                "sum_a": pa.array([], type=pa.int64()),
                "ss_a": pa.array([], type=pa.int64()),
                "n_b": pa.array([], type=pa.int64()),
                "sum_b": pa.array([], type=pa.int64()),
                "ss_b": pa.array([], type=pa.int64())})
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = _cents(b.column("value").to_numpy(zero_copy_only=False))
        a = (ts < AB_CUTOFF_US).astype(np.int64)
        bb = 1 - a
        t = pa.table({"event_type": b.column("event_type"),
                      "n_a": pa.array(a), "sum_a": pa.array(a * y),
                      "ss_a": pa.array(a * y * y),
                      "n_b": pa.array(bb), "sum_b": pa.array(bb * y),
                      "ss_b": pa.array(bb * y * y)})
        g = t.group_by("event_type").aggregate(
            [("n_a", "sum"), ("sum_a", "sum"), ("ss_a", "sum"),
             ("n_b", "sum"), ("sum_b", "sum"), ("ss_b", "sum")])
        return g.select(['event_type', 'n_a_sum', 'sum_a_sum', 'ss_a_sum', 'n_b_sum', 'sum_b_sum', 'ss_b_sum']).rename_columns(["event_type", "n_a", "sum_a", "ss_a",
                                 "n_b", "sum_b", "ss_b"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n_a", alias_name="n_a"),
                      Sum("sum_a", alias_name="sum_a"),
                      Sum("ss_a", alias_name="ss_a"),
                      Sum("n_b", alias_name="n_b"),
                      Sum("sum_b", alias_name="sum_b"),
                      Sum("ss_b", alias_name="ss_b"))
           .to_pandas())
    na = out["n_a"].to_numpy(np.float64)
    nb = out["n_b"].to_numpy(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ma = out["sum_a"].to_numpy(np.float64) / na
        mb = out["sum_b"].to_numpy(np.float64) / nb
        va = out["ss_a"].to_numpy(np.float64) / na - ma * ma
        vb = out["ss_b"].to_numpy(np.float64) / nb - mb * mb
        den = va / na + vb / nb
        t2 = np.where((na > 0) & (nb > 0) & (den > 0),
                      (ma - mb) * (ma - mb) / np.where(den > 0, den, 1.0),
                      0.0)
    out["t2"] = t2
    for cn in ["n_a", "sum_a", "n_b", "sum_b"]:
        out[cn] = out[cn].astype(np.int64)
    return (out[["event_type", "n_a", "sum_a", "n_b", "sum_b", "t2"]]
            .sort_values("event_type").reset_index(drop=True))


def inter_event_gap_quantiles(sf_dir: str):
    """Inter-arrival-time distribution: exact p50/p90/p99 of the gap (in
    whole seconds) between each user's consecutive events — the
    heartbeat/SLA audit of an event stream. ONE user-keyed sorted scan
    (order ts, event_id); the block kernel computes same-user shifted
    diffs vectorized and ships (gap_s, count) HISTOGRAM partials (state
    = distinct gap values, never rows); the driver folds the histogram
    and reads the quantiles off the cumulative counts with the
    percentile_disc rule (integer compare). Emits ONE row
    (n_gaps, p50_s, p90_s, p99_s)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def narrow(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("user_id")),
                             pc.is_valid(b.column("ts"))))
        return pa.table({
            "user_id": pa.array(b.column("user_id")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64)),
            "ts_us": pa.array(b.column("ts").cast(pa.int64())
                              .to_numpy(zero_copy_only=False)),
            "event_id": pa.array(b.column("event_id")
                                 .to_numpy(zero_copy_only=False)
                                 .astype(np.int64))})

    out_schema = pa.schema([("gap_s", pa.int64()), ("cnt", pa.int64())])

    def _hist(gaps: np.ndarray):
        if len(gaps) == 0:
            return None
        u, c = np.unique(gaps, return_counts=True)
        return pa.table({"gap_s": pa.array(u),
                         "cnt": pa.array(c.astype(np.int64))})

    def block_fn(b: pa.Table, starts, ends, want):
        if not want.any():
            return None
        ts = b.column("ts_us").to_numpy(zero_copy_only=False)
        n = b.num_rows
        in_want = np.repeat(want, ends - starts)
        is_start = np.zeros(n, dtype=bool)
        is_start[starts] = True
        valid = in_want & ~is_start
        idx = np.flatnonzero(valid)
        return _hist((ts[idx] - ts[idx - 1]) // 1_000_000)

    def group_fn(g: pa.Table):
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        if len(ts) < 2:
            return None
        return _hist((ts[1:] - ts[:-1]) // 1_000_000)

    hist = sorted_group_scan(
        ds.map_batches(narrow, batch_format="pyarrow"), ["user_id"],
        group_fn, out_schema, order_cols=["ts_us", "event_id"],
        block_fn=block_fn).to_pandas()
    if not len(hist):
        return pd.DataFrame({"n_gaps": [0], "p50_s": [0],
                             "p90_s": [0], "p99_s": [0]})
    g = hist.groupby("gap_s", as_index=True)["cnt"].sum().sort_index()
    vals = g.index.to_numpy(np.int64)
    cum = np.cumsum(g.to_numpy(np.int64))
    n = int(cum[-1])
    # percentile_disc(q): smallest value with 100*cum >= q*100*n
    q = {p: int(vals[np.searchsorted(cum * 100, p * n)])
         for p in (50, 90, 99)}
    return pd.DataFrame({"n_gaps": [n], "p50_s": [q[50]],
                         "p90_s": [q[90]], "p99_s": [q[99]]})


ATTRIB_WINDOW_US = 3_600_000_000   # 1 h last-touch window


def last_touch_attribution(sf_dir: str):
    """Marketing-style last-touch attribution: every purchase is
    credited to the user's most recent PRIOR view-or-click within one
    hour (lag semantics over (ts, event_id) order), else 'none' — the
    sessionized join every event warehouse runs. ONE user-keyed sorted
    scan; the block kernel computes a SEGMENTED last-touch index with
    one np.maximum.accumulate (touch positions from an earlier user
    group are < this group's start, so a start-bound compare kills the
    carry-over — no per-group Python), and ships <= 3 partial rows per
    block. Emits (attributed, n_purchases)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])

    def narrow(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("user_id")),
                             pc.and_(pc.is_valid(b.column("ts")),
                                     pc.is_valid(b.column("event_type")))))
        et = b.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        # 0 = other, 1 = view, 2 = click, 3 = purchase
        code = np.zeros(b.num_rows, dtype=np.int64)
        etn = et.to_numpy(zero_copy_only=False)
        code[etn == "view"] = 1
        code[etn == "click"] = 2
        code[etn == "purchase"] = 3
        return pa.table({
            "user_id": pa.array(b.column("user_id")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64)),
            "ts_us": pa.array(b.column("ts").cast(pa.int64())
                              .to_numpy(zero_copy_only=False)),
            "event_id": pa.array(b.column("event_id")
                                 .to_numpy(zero_copy_only=False)
                                 .astype(np.int64)),
            "code": pa.array(code)})

    out_schema = pa.schema([("attributed", pa.string()),
                            ("n_purchases", pa.int64())])
    NAMES = np.array(["none", "view", "click"], dtype=object)

    def _attr_rows(code, ts, starts_of_rows, keep=None):
        """code/ts: rows in (user, ts, event_id) order; starts_of_rows:
        per-row index of its group's first row (bounds the segmented
        cummax carry-over); keep: optional per-row mask limiting which
        groups' purchases count. Returns per-attributed counts."""
        n = len(code)
        if n == 0:
            return None
        pos = np.arange(n, dtype=np.int64)
        touch = (code == 1) | (code == 2)
        last_touch = np.maximum.accumulate(np.where(touch, pos, -1))
        # lag semantics: the row itself can't be its own touch
        prev = np.empty(n, dtype=np.int64)
        prev[0] = -1
        prev[1:] = last_touch[:-1]
        pmask = code == 3
        if keep is not None:
            pmask &= keep
        pur = np.flatnonzero(pmask)
        if len(pur) == 0:
            return None
        t_idx = prev[pur]
        ok = ((t_idx >= starts_of_rows[pur])      # same user group
              & (t_idx >= 0)
              & (ts[pur] - ts[np.maximum(t_idx, 0)] <= ATTRIB_WINDOW_US))
        lab = np.where(ok, code[np.maximum(t_idx, 0)], 0)
        u, c = np.unique(lab, return_counts=True)
        return pa.table({"attributed": pa.array(NAMES[u]),
                         "n_purchases": pa.array(c.astype(np.int64))})

    def block_fn(b: pa.Table, starts, ends, want):
        if not want.any():
            return None
        sizes = ends - starts
        return _attr_rows(b.column("code").to_numpy(zero_copy_only=False),
                          b.column("ts_us").to_numpy(zero_copy_only=False),
                          np.repeat(starts, sizes),
                          keep=np.repeat(want, sizes))

    def group_fn(g: pa.Table):
        code = g.column("code").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        return _attr_rows(code, ts,
                          np.zeros(len(code), dtype=np.int64))

    scan = sorted_group_scan(
        ds.map_batches(narrow, batch_format="pyarrow"), ["user_id"],
        group_fn, out_schema, order_cols=["ts_us", "event_id"],
        block_fn=block_fn).to_pandas()
    agg = scan.groupby("attributed", as_index=False)["n_purchases"].sum()
    agg["n_purchases"] = agg["n_purchases"].astype(np.int64)
    return agg.sort_values("attributed").reset_index(drop=True)


K_ANON_THRESHOLD = 5
K_ANON_BUCKET = 100


def k_anonymity_audit(sf_dir: str):
    """Privacy k-anonymity audit over the quasi-identifier
    (lang, source, n_chars//100): combos with fewer than K=5 members
    re-identify their documents — the release gate of a data-sharing
    pipeline. Per-batch partial counts fold through one small groupby
    (state = |langs| x |sources| x |buckets| cells, value-space
    bounded); the driver filters n < K. Emits
    (lang, source, bucket, n)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("lang")),
                             pc.and_(pc.is_valid(b.column("source")),
                                     pc.is_valid(b.column("n_chars")))))
        if b.num_rows == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "source": pa.array([], type=pa.string()),
                             "bucket": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        bk = (b.column("n_chars").to_numpy(zero_copy_only=False)
              .astype(np.int64)) // K_ANON_BUCKET
        t = pa.table({"lang": b.column("lang"),
                      "source": b.column("source"),
                      "bucket": pa.array(bk)})
        g = t.group_by(["lang", "source", "bucket"]).aggregate(
            [([], "count_all")])
        return g.select(['lang', 'source', 'bucket', 'count_all']).rename_columns(["lang", "source", "bucket", "n"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["lang", "source", "bucket"])
           .aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    out = out[out["n"] < K_ANON_THRESHOLD].copy()
    out["n"] = out["n"].astype(np.int64)
    out["bucket"] = out["bucket"].astype(np.int64)
    return (out.sort_values(["lang", "source", "bucket"])
            .reset_index(drop=True))


ENUM_SUGGEST_CAP = 32    # suggest enum only for low-cardinality columns


def suggest_constraints_documents(sf_dir: str):
    """Schema induction — the inverse of validation: profile the corpus
    and emit draft-07 constraint candidates a schema author would adopt
    (bounds from observed min/max, minLength from the shortest text,
    enum lists for low-cardinality string columns). ONE stateless pass
    folds per-batch partials: integer min/max aggregates plus per-batch
    DISTINCT string sets CAPPED at ENUM_SUGGEST_CAP values per batch (a
    batch over the cap ships one overflow marker instead of its value
    set, so driver state is <= (cap+1) x batches rows and a
    high-cardinality column yields NO enum row instead of driver
    blowup; the driver re-checks the cap on the merged set).
    Emits (column_name, keyword, value) with values rendered exactly as
    the DuckDB oracle renders them (comma-joined sorted enum lists,
    decimal integers)."""
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang", "source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        # per-column null handling matches the oracle's min()/max()
        # null-skip: each stat is computed over its column's non-null
        # values only (pc.min/max skip nulls; ints come via drop_null)
        tlen = pc.min(pc.utf8_length(txt)).as_py()
        ids = pc.drop_null(b.column("doc_id")) \
            .to_numpy(zero_copy_only=False)
        nch = pc.drop_null(b.column("n_chars")) \
            .to_numpy(zero_copy_only=False)
        langs = pc.unique(pc.drop_null(b.column("lang"))).to_pylist()
        srcs = pc.unique(pc.drop_null(b.column("source"))).to_pylist()
        # honest per-batch cap: a high-cardinality column ships ONE
        # overflow marker instead of its value set, so driver state is
        # <= (cap+1) x batches rows no matter the column's cardinality
        if len(langs) > ENUM_SUGGEST_CAP:
            langs = ["\x00OVERFLOW"]
        if len(srcs) > ENUM_SUGGEST_CAP:
            srcs = ["\x00OVERFLOW"]
        imin = np.iinfo(np.int64)
        rows = {
            "kind": ["doc_id_min", "doc_id_max", "n_chars_min",
                     "n_chars_max", "text_minlen"],
            "iv": [int(np.min(ids)) if len(ids) else imin.max,
                   int(np.max(ids)) if len(ids) else imin.min,
                   int(np.min(nch)) if len(nch) else imin.max,
                   int(np.max(nch)) if len(nch) else imin.min,
                   int(tlen) if tlen is not None else imin.max],
            "sv": ["", "", "", "", ""]}
        for v in langs:
            rows["kind"].append("lang_enum")
            rows["iv"].append(0)
            rows["sv"].append(v)
        for v in srcs:
            rows["kind"].append("source_enum")
            rows["iv"].append(0)
            rows["sv"].append(v)
        return pa.table({"kind": pa.array(rows["kind"]),
                         "iv": pa.array(rows["iv"], type=pa.int64()),
                         "sv": pa.array(rows["sv"], type=pa.string())})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    g = part.groupby("kind")
    iv = {k: v for k, v in g["iv"].min().items()}
    ivmax = {k: v for k, v in g["iv"].max().items()}
    out.append(("doc_id", "minimum", str(int(iv.get("doc_id_min", 0)))))
    out.append(("doc_id", "maximum",
                str(int(ivmax.get("doc_id_max", 0)))))
    out.append(("n_chars", "minimum",
                str(int(iv.get("n_chars_min", 0)))))
    out.append(("n_chars", "maximum",
                str(int(ivmax.get("n_chars_max", 0)))))
    out.append(("text", "minLength",
                str(int(iv.get("text_minlen", 0)))))
    for kind, col in (("lang_enum", "lang"), ("source_enum", "source")):
        vals = sorted(part.loc[part["kind"] == kind, "sv"].unique())
        if "\x00OVERFLOW" in vals:
            continue    # some batch exceeded the cap: no enum suggestion
        if 0 < len(vals) <= ENUM_SUGGEST_CAP:
            out.append((col, "enum", ",".join(vals)))
    return pd.DataFrame(out, columns=["column_name", "keyword", "value"])


def value_mode_by_type(sf_dir: str):
    """Grouped MODE with a deterministic tie rule — per event type the
    most frequent cents value, ties to the SMALLEST value (SQL mode()
    leaves ties unspecified, so the oracle uses an explicit
    (count desc, value asc) row_number — both sides share the rule).
    Per-batch (type, cents, count) histogram partials fold through one
    bounded groupby; the driver picks each type's argmax. Emits
    (event_type, mode_cents, n_mode, n_total)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("event_type")),
                             pc.is_valid(b.column("value"))))
        if b.num_rows == 0:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "cents": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        t = pa.table({"event_type": b.column("event_type"),
                      "cents": pa.array(_cents(
                          b.column("value")
                          .to_numpy(zero_copy_only=False)))})
        g = t.group_by(["event_type", "cents"]).aggregate(
            [([], "count_all")])
        return g.select(['event_type', 'cents', 'count_all']).rename_columns(["event_type", "cents", "cnt"])

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .to_pandas()
            .groupby(["event_type", "cents"], as_index=False)["cnt"]
            .sum())
    hist = hist.sort_values(["event_type", "cnt", "cents"],
                            ascending=[True, False, True],
                            kind="mergesort")
    tot = hist.groupby("event_type")["cnt"].sum()
    top = hist.groupby("event_type", as_index=False).first()
    top["n_total"] = top["event_type"].map(tot).astype(np.int64)
    top = top.rename(columns={"cents": "mode_cents", "cnt": "n_mode"})
    top["mode_cents"] = top["mode_cents"].astype(np.int64)
    top["n_mode"] = top["n_mode"].astype(np.int64)
    return (top[["event_type", "mode_cents", "n_mode", "n_total"]]
            .sort_values("event_type").reset_index(drop=True))


PATH_TOP_N = 20


def _narrow_events(b: pa.Table) -> pa.Table:
    """Shared narrow projection for the user-keyed event scans
    (trigrams, transitions, churn): null-filtered
    (user_id, ts_us, event_id, event_type) int64/us rows."""
    b = b.filter(pc.and_(pc.is_valid(b.column("user_id")),
                         pc.and_(pc.is_valid(b.column("ts")),
                                 pc.is_valid(b.column("event_type")))))
    et = b.column("event_type")
    if isinstance(et, pa.ChunkedArray):
        et = et.combine_chunks()
    return pa.table({
        "user_id": pa.array(b.column("user_id")
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
        "ts_us": pa.array(b.column("ts").cast(pa.int64())
                          .to_numpy(zero_copy_only=False)),
        "event_id": pa.array(b.column("event_id")
                             .to_numpy(zero_copy_only=False)
                             .astype(np.int64)),
        "event_type": et})


def session_path_trigrams(sf_dir: str):
    """Behavioral path mining: the top-20 (t1 -> t2 -> t3) event-type
    trigrams over each user's time-ordered stream — the "common user
    journeys" report. ONE user-keyed sorted scan; the block kernel
    builds trigrams with two shifted compares (no Python loops),
    masks window positions that cross a user boundary, and ships
    (t1, t2, t3, count) partials; a bounded (|types|^3 worst case)
    fold ranks by (count desc, t1, t2, t3). Matches a LEAD x 2
    window oracle."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])

    narrow = _narrow_events

    out_schema = pa.schema([("t1", pa.string()), ("t2", pa.string()),
                            ("t3", pa.string()), ("cnt", pa.int64())])

    def _tri(et: np.ndarray, same23: np.ndarray):
        """et: types in order; same23[i] true when rows i, i+1, i+2 all
        belong to one user group."""
        idx = np.flatnonzero(same23)
        if len(idx) == 0:
            return None
        df = pd.DataFrame({"t1": et[idx], "t2": et[idx + 1],
                           "t3": et[idx + 2]})
        g = (df.groupby(["t1", "t2", "t3"], as_index=False)
             .size().rename(columns={"size": "cnt"}))
        return pa.table({"t1": pa.array(g["t1"], type=pa.string()),
                         "t2": pa.array(g["t2"], type=pa.string()),
                         "t3": pa.array(g["t3"], type=pa.string()),
                         "cnt": pa.array(g["cnt"].to_numpy(np.int64))})

    def block_fn(b: pa.Table, starts, ends, want):
        if not want.any():
            return None
        n = b.num_rows
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        erow = np.repeat(ends, ends - starts)      # group end per row
        keep = np.repeat(want, ends - starts)
        pos = np.arange(n, dtype=np.int64)
        ok = keep & (pos + 2 < erow)               # trigram fits in group
        return _tri(et, ok[:n])

    def group_fn(g: pa.Table):
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        n = len(et)
        if n < 3:
            return None
        ok = np.zeros(n, dtype=bool)
        ok[:n - 2] = True
        return _tri(et, ok)

    scan = sorted_group_scan(
        ds.map_batches(narrow, batch_format="pyarrow"), ["user_id"],
        group_fn, out_schema, order_cols=["ts_us", "event_id"],
        block_fn=block_fn).to_pandas()
    agg = (scan.groupby(["t1", "t2", "t3"], as_index=False)["cnt"].sum()
           .sort_values(["cnt", "t1", "t2", "t3"],
                        ascending=[False, True, True, True],
                        kind="mergesort")
           .head(PATH_TOP_N).reset_index(drop=True))
    agg["cnt"] = agg["cnt"].astype(np.int64)
    return agg


def order_fulfillment_latency(sf_dir: str):
    """Fulfillment-latency distribution — per order priority the exact
    p50/p90/max of the ship delay in whole days (l_shipdate date minus
    o_orderdate date), the SLA report of an order pipeline. The
    orderkey -> (orderdate-day, priority) side is ADAPTIVE (broadcast
    sorted int64 arrays under Q3_BROADCAST_CAP, hash exchange past it —
    the q12 discipline); the lineitem pass ships (priority, delay_days,
    count) HISTOGRAM partials (state = |priorities| x distinct delay
    days, a value-space bound), and the driver reads the quantiles off
    cumulative counts with the percentile_disc rule. Emits
    (o_orderpriority, n, p50_days, p90_days, max_days)."""
    import ray
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    # parquet-footer count, no materialize pass (the q12 gate
    # discipline); fall back to a real count only without footers
    n_ord = _table_rows(sf_dir, "orders")
    if n_ord is None:                      # pragma: no cover
        orders = orders.materialize()
        n_ord = orders.count()
    if n_ord == 0:    # inner-join semantics: no orders -> 0 result rows
        return pd.DataFrame({
            "o_orderpriority": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            "p50_days": pd.Series([], dtype=np.int64),
            "p90_days": pd.Series([], dtype=np.int64),
            "max_days": pd.Series([], dtype=np.int64)})
    if n_ord <= Q3_BROADCAST_CAP:
        odf = orders.to_pandas().sort_values("o_orderkey")
        okeys = odf["o_orderkey"].to_numpy(np.int64)
        odays = pd.DatetimeIndex(odf["o_orderdate"]).values \
            .astype("datetime64[D]").astype(np.int64)
        uprio, pid = np.unique(odf["o_orderpriority"].to_numpy(object),
                               return_inverse=True)
        oref = ray.put((okeys, odays, pid.astype(np.int64)))
        prios = [str(p) for p in uprio]

        def fold(b: pa.Table, _o=oref) -> pa.Table:
            ok, od, opr = ray.get(_o)
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            sd = pd.DatetimeIndex(b.column("l_shipdate").to_pandas()) \
                .values.astype("datetime64[D]").astype(np.int64)
            pos = np.clip(np.searchsorted(ok, lk), 0, len(ok) - 1)
            hit = ok[pos] == lk
            d = sd[hit] - od[pos][hit]
            pr = opr[pos][hit]
            # packed-key np.unique fold (the covariance-fold numpy
            # discipline): p << 24 | (d + 2^20) — |d| < 2^20 days
            key = (pr << 24) + (d + (1 << 20))
            uk, cnt = np.unique(key, return_counts=True)
            return pa.table({
                "p": pa.array(uk >> 24),
                "d": pa.array((uk & ((1 << 24) - 1)) - (1 << 20)),
                "cnt": pa.array(cnt.astype(np.int64))})

        # (p, d) is a bounded dimension grid (|priorities| x delay-day
        # values), so the per-block partials fold on the driver — the
        # verdicts/scorecard fold rationale; no groupby shuffle
        parts = li.map_batches(fold, batch_format="pyarrow").to_pandas()
        hist = parts.groupby(["p", "d"], as_index=False)["cnt"].sum()
        hist["o_orderpriority"] = hist["p"].map(dict(enumerate(prios)))
    else:                                   # pragma: no cover - scale path
        est = (li.size_bytes() or 0) + (orders.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))
        joined = li.join(orders, join_type="inner",
                         num_partitions=n_parts,
                         on=("l_orderkey",), right_on=("o_orderkey",))

        def jfold(b: pa.Table) -> pa.Table:
            sd = pd.DatetimeIndex(b.column("l_shipdate").to_pandas()) \
                .values.astype("datetime64[D]").astype(np.int64)
            od = pd.DatetimeIndex(b.column("o_orderdate").to_pandas()) \
                .values.astype("datetime64[D]").astype(np.int64)
            pr = b.column("o_orderpriority")
            if isinstance(pr, pa.ChunkedArray):
                pr = pr.combine_chunks()
            df = pd.DataFrame({
                "o_orderpriority": pr.to_numpy(zero_copy_only=False),
                "d": sd - od})
            g = (df.groupby(["o_orderpriority", "d"], as_index=False)
                 .size().rename(columns={"size": "cnt"}))
            return pa.Table.from_pandas(g, preserve_index=False)

        hist = (joined.map_batches(jfold, batch_format="pyarrow")
                .groupby(["o_orderpriority", "d"])
                .aggregate(Sum("cnt", alias_name="cnt"))
                .to_pandas())

    rows = []
    for pri, g in hist.groupby("o_orderpriority", sort=True):
        g = g.sort_values("d")
        dv = g["d"].to_numpy(np.int64)
        cnt = g["cnt"].to_numpy(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        p50 = int(dv[np.searchsorted(cum * 100, 50 * n)])
        p90 = int(dv[np.searchsorted(cum * 100, 90 * n)])
        rows.append((pri, n, p50, p90, int(dv[-1])))
    return pd.DataFrame(rows, columns=["o_orderpriority", "n",
                                       "p50_days", "p90_days",
                                       "max_days"])


def event_transition_matrix(sf_dir: str):
    """First-order Markov transition matrix over each user's
    time-ordered event stream: (t1 -> t2) counts plus the row-normalized
    transition probability as an exact floor-ppm integer — the
    behavioral-model fit step. Same one-keyed-scan shape as
    session_path_trigrams with a single shifted compare; the bounded
    (|types|^2) fold and the ppm division happen on the driver in
    arbitrary-precision ints (1e6 * n never wraps). Emits
    (t1, t2, n, p_ppm)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])

    narrow = _narrow_events

    out_schema = pa.schema([("t1", pa.string()), ("t2", pa.string()),
                            ("n", pa.int64())])

    def _pairs(et: np.ndarray, ok: np.ndarray):
        idx = np.flatnonzero(ok)
        if len(idx) == 0:
            return None
        df = pd.DataFrame({"t1": et[idx], "t2": et[idx + 1]})
        g = (df.groupby(["t1", "t2"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return pa.table({"t1": pa.array(g["t1"], type=pa.string()),
                         "t2": pa.array(g["t2"], type=pa.string()),
                         "n": pa.array(g["n"].to_numpy(np.int64))})

    def block_fn(b: pa.Table, starts, ends, want):
        if not want.any():
            return None
        n = b.num_rows
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        erow = np.repeat(ends, ends - starts)
        keep = np.repeat(want, ends - starts)
        pos = np.arange(n, dtype=np.int64)
        return _pairs(et, keep & (pos + 1 < erow))

    def group_fn(g: pa.Table):
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        if len(et) < 2:
            return None
        ok = np.zeros(len(et), dtype=bool)
        ok[:-1] = True
        return _pairs(et, ok)

    scan = sorted_group_scan(
        ds.map_batches(narrow, batch_format="pyarrow"), ["user_id"],
        group_fn, out_schema, order_cols=["ts_us", "event_id"],
        block_fn=block_fn).to_pandas()
    agg = scan.groupby(["t1", "t2"], as_index=False)["n"].sum()
    row_tot = agg.groupby("t1")["n"].sum()
    agg["p_ppm"] = np.array(
        [(1_000_000 * int(nv)) // int(row_tot[t1])
         for t1, nv in zip(agg["t1"], agg["n"])], dtype=np.int64)
    agg["n"] = agg["n"].astype(np.int64)
    return agg.sort_values(["t1", "t2"]).reset_index(drop=True)


PARETO_TOP_PCT = 10


def revenue_pareto_share(sf_dir: str):
    """Revenue-concentration (80/20) audit: what share of total order
    revenue do the top 10% of customers hold? Per-batch per-customer
    cents partials fold through one narrow groupby (24 B rows); the
    top-decile cut is EXACT — customers ranked by (revenue desc,
    custkey asc), the top ceil(n/10) taken, share as floor-ppm in
    arbitrary-precision ints. Per-customer revenue is
    customer-cardinality state on the driver at sf scale; past
    UNIQUE_DRIVER_MERGE_CAP customers the rank would ride the
    shuffle-shard two-phase histogram (documented, not needed here).
    Emits ONE row (n_customers, top_customers, top_cents, total_cents,
    share_ppm)."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"o_custkey": b.column("o_custkey").cast(pa.int64()),
                      "cents": pa.array(_cents(
                          b.column("o_totalprice")
                          .to_numpy(zero_copy_only=False)))})
        g = t.group_by("o_custkey").aggregate([("cents", "sum")])
        return g.select(['o_custkey', 'cents_sum']).rename_columns(["o_custkey", "cents"])

    per_cust = (orders.map_batches(partial, batch_format="pyarrow")
                .groupby("o_custkey")
                .aggregate(Sum("cents", alias_name="cents"))
                .to_pandas())
    n = len(per_cust)
    if n == 0:    # the oracle's cross join over empty r emits 0 rows
        return pd.DataFrame({
            "n_customers": pd.Series([], dtype=np.int64),
            "top_customers": pd.Series([], dtype=np.int64),
            "top_cents": pd.Series([], dtype=np.int64),
            "total_cents": pd.Series([], dtype=np.int64),
            "share_ppm": pd.Series([], dtype=np.int64)})
    k = -(-n * PARETO_TOP_PCT // 100)     # ceil(n * pct / 100)
    per_cust = per_cust.sort_values(["cents", "o_custkey"],
                                    ascending=[False, True],
                                    kind="mergesort")
    top = int(per_cust["cents"].head(k).sum())
    total = int(per_cust["cents"].sum())
    return pd.DataFrame({
        "n_customers": [n], "top_customers": [int(k)],
        "top_cents": [top], "total_cents": [total],
        "share_ppm": [(1_000_000 * top) // total if total else 0]})


def langid_confusion_matrix(sf_dir: str):
    """Classifier-quality cross-tab: labeled lang x predicted lang
    counts over the whole corpus — the confusion matrix every langid
    deployment is judged by. The predictor is the engine's stateful
    LangId actor pool (patterns compiled once per actor); per-batch
    (label, pred) counts fold through one bounded (<= |langs|^2)
    groupby. The oracle replays the EXACT same n-gram heuristic in SQL
    (the langid_documents mirror) and GROUP BYs it. Emits
    (lang, lang_pred, n)."""
    from ray.data.aggregate import Sum

    from rayschema.text import LangId

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    pred = ds.map_batches(LangId, batch_format="pyarrow",
                          concurrency=(1, 16))

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"lang": b.column("lang"),
                      "lang_pred": b.column("lang_pred")})
        g = t.group_by(["lang", "lang_pred"]).aggregate(
            [([], "count_all")])
        return g.select(['lang', 'lang_pred', 'count_all']).rename_columns(["lang", "lang_pred", "n"])

    # (lang, pred) cells are a bounded |langs|^2 grid: per-block partials
    # fold on the driver (the verdicts/scorecard fold rationale)
    parts = pred.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["lang", "lang_pred"], as_index=False,
                        dropna=False)["n"].sum()
    out["n"] = out["n"].astype(np.int64)
    return (out.sort_values(["lang", "lang_pred"])
            .reset_index(drop=True))


CHURN_WINDOW_US = 36 * 3_600_000_000   # 36 hours


def churned_users_by_last_event(sf_dir: str):
    """Churn audit: users whose LAST event is older than 36 hours before
    the corpus's newest event, counted by that last event's type (what
    were churned users doing last?). Pass 1 is a trivial global max(ts)
    aggregate (the cutoff broadcasts as a closure constant); pass 2 is
    ONE user-keyed scan ordered by (ts, event_id) whose block kernel
    takes each complete group's LAST row vectorized (ends-1) and ships
    <= |types| (type, count) partials per block. Emits
    (event_type, n_churned)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])
    # pass 1 on a ts-only read: the aggregate would otherwise decode
    # all four projected columns just to find one timestamp
    mx = _read(sf_dir, "events", columns=["ts"]).max("ts")
    cutoff = int(pd.Timestamp(mx).value // 1000) - CHURN_WINDOW_US

    narrow = _narrow_events

    out_schema = pa.schema([("event_type", pa.string()),
                            ("n_churned", pa.int64())])

    def _counts(types):
        if len(types) == 0:
            return None
        u, c = np.unique(types, return_counts=True)
        return pa.table({"event_type": pa.array(u, type=pa.string()),
                         "n_churned": pa.array(c.astype(np.int64))})

    def block_fn(b: pa.Table, starts, ends, want):
        if not want.any():
            return None
        ts = b.column("ts_us").to_numpy(zero_copy_only=False)
        last = ends[want] - 1
        hit = last[ts[last] < cutoff]
        if len(hit) == 0:
            return None
        et = b.column("event_type").take(pa.array(hit)) \
            .to_numpy(zero_copy_only=False)
        return _counts(et)

    def group_fn(g: pa.Table):
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        if len(ts) == 0 or ts[-1] >= cutoff:
            return None
        return _counts(np.array(
            [g.column("event_type")[-1].as_py()], dtype=object))

    scan = sorted_group_scan(
        ds.map_batches(narrow, batch_format="pyarrow"), ["user_id"],
        group_fn, out_schema, order_cols=["ts_us", "event_id"],
        block_fn=block_fn).to_pandas()
    if not len(scan):
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "n_churned": pd.Series([], dtype=np.int64)})
    agg = scan.groupby("event_type", as_index=False)["n_churned"].sum()
    agg["n_churned"] = agg["n_churned"].astype(np.int64)
    return agg.sort_values("event_type").reset_index(drop=True)


def dup_cluster_size_histogram(sf_dir: str):
    """Duplicate-mass report: the histogram of exact-duplicate group
    sizes (how many texts appear once, twice, ...) — the first chart of
    any dedup writeup. Narrow plan mirroring _exact_dedup_core: the
    hash groupby's (uk, n) table gives candidate sizes; hash groups with
    n >= 2 are re-verified EXACTLY on co-located text (a 64-bit
    collision would otherwise merge two different texts into one
    oversized group), with the verified per-text sizes emitted from the
    scan and singles counted from the hash table. Emits
    (group_size, n_groups)."""
    import ray
    from ray.data.aggregate import Sum

    from rayschema.dedup import (_bitmap_hash, _bitmap_member,
                                 sorted_group_scan)
    from rayschema.sketches import hash64

    BM_BITS = 24
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    agg = (ds.map_batches(_dedup_partial, batch_format="pyarrow")
           .groupby("uk")
           .aggregate(Sum("n", alias_name="n"))
           .materialize())
    n_singles = agg.filter(expr="n == 1").count()

    dups = agg.filter(expr="n > 1").select_columns(["uk"]).to_pandas()
    if not len(dups):
        if int(n_singles) == 0:    # empty corpus: the oracle emits 0 rows
            return pd.DataFrame({
                "group_size": pd.Series([], dtype=np.int64),
                "n_groups": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"group_size": [1],
                             "n_groups": [int(n_singles)]})
    acc = np.zeros(1 << BM_BITS, dtype=bool)
    acc[_bitmap_hash(dups["uk"].to_numpy(np.int64), BM_BITS)] = True
    ref = ray.put(np.packbits(acc))

    def pick(b: pa.Table) -> pa.Table:
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        uks = hash64(txt.to_numpy(zero_copy_only=False)).view(np.int64)
        sel = _bitmap_member(uks, ray.get(ref), BM_BITS)
        return pa.table({"uk": pa.array(uks[sel]),
                         "text": txt.filter(pa.array(sel))})

    out_schema = pa.schema([("group_size", pa.int64()),
                            ("n_groups", pa.int64())])

    def _sizes(uk, text):
        df = pd.DataFrame({"uk": uk, "text": text})
        sizes = df.groupby(["uk", "text"], dropna=False).size()
        u, c = np.unique(sizes.to_numpy(np.int64), return_counts=True)
        return pa.table({"group_size": pa.array(u),
                         "n_groups": pa.array(c.astype(np.int64))})

    def block_fn(b: pa.Table, starts, ends, want):
        sel = np.repeat(want, ends - starts)
        if not sel.any():
            return None
        t = b.filter(pa.array(sel))
        return _sizes(t.column("uk").to_pandas(),
                      t.column("text").to_pandas())

    def group_fn(g: pa.Table):
        # 1-row uk group = bitmap false positive: that text's uk had
        # n == 1, so it is already counted in n_singles (mirrors
        # _exact_dedup_core.verify_group)
        if g.num_rows < 2:
            return None
        return _sizes(g.column("uk").to_pandas(),
                      g.column("text").to_pandas())

    scan = sorted_group_scan(
        ds.map_batches(pick, batch_format="pyarrow"), ["uk"],
        group_fn, out_schema,
        group_filter=lambda b, s, e: (e - s) >= 2,
        block_fn=block_fn).to_pandas()
    hist = scan.groupby("group_size", as_index=True)["n_groups"].sum() \
        if len(scan) else pd.Series(dtype=np.int64)
    hist = hist.to_dict()
    # a multi-row hash group CAN split into size-1 text groups under a
    # 64-bit collision — those are real singleton texts NOT in
    # n_singles, so the scan's size-1 rows and the hash-side singles
    # add; never emit a zero-count row (the oracle has no such group)
    ones = int(hist.get(1, 0)) + int(n_singles)
    if ones > 0:
        hist[1] = ones
    else:
        hist.pop(1, None)
    out = pd.DataFrame(sorted(hist.items()),
                       columns=["group_size", "n_groups"])
    out["group_size"] = out["group_size"].astype(np.int64)
    out["n_groups"] = out["n_groups"].astype(np.int64)
    return out


# --------------------------------------------------------------------------- TPC-H Q2/Q9/Q20/Q21 shapes


def q2_best_supplier_per_part(sf_dir: str):
    """TPC-H-Q2-shaped per-part argmax over a join: for every size-15
    part, the best ASIA-region supplier that actually ships it (the
    part<->supplier relation comes from lineitem — the synthetic corpus
    has no partsupp table), best = max s_acctbal, min s_suppkey on ties
    (Q2 uses min ps_supplycost; acctbal is the stand-in). The argmax
    DISTRIBUTES as a single Ray ``groupby.Max`` over a monotone-packed
    int64 ((acctbal_e2 + 2^25) << 24 | (2^24-1 - s_suppkey)) so ties
    resolve inside the shuffle — no distinct-pair materialization, no
    window. Both dimension sides broadcast (part keys; eligible-supplier
    balance arrays); duplicate (part, supplier) lineitems collapse
    per-batch before the exchange. Packing assumption (documented):
    s_suppkey < 2^24 and |s_acctbal| < $335k — shard the supplier id
    space past that. Emits the full ranked result
    (p_partkey, s_suppkey, s_name, n_name, s_acctbal_cents), Q2's
    LIMIT applied by the caller if desired."""
    import ray
    from ray.data.aggregate import Max

    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name", "n_regionkey"]) \
        .to_pandas()
    reg = _read(sf_dir, "region",
                columns=["r_regionkey", "r_name"]).to_pandas()
    asia = set(reg[reg["r_name"] == "ASIA"]["r_regionkey"]
               .astype(np.int64))
    nat = nat[nat["n_regionkey"].astype(np.int64).isin(asia)]
    nmap = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))

    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey", "s_name",
                         "s_acctbal"]).to_pandas()
    sup = sup[sup["s_nationkey"].astype(np.int64).isin(nmap)] \
        .sort_values("s_suppkey")
    skeys = sup["s_suppkey"].to_numpy(np.int64)
    sbal = _cents(sup["s_acctbal"].to_numpy())

    pt = _read(sf_dir, "part", columns=["p_partkey", "p_size"]) \
        .to_pandas()
    pkeys = np.sort(pt[pt["p_size"] == 15]["p_partkey"]
                    .to_numpy(np.int64))

    out_cols = ["p_partkey", "s_suppkey", "s_name", "n_name",
                "s_acctbal_cents"]
    if len(pkeys) == 0 or len(skeys) == 0:
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c in ("s_name", "n_name") else np.int64)
            for c in out_cols})

    ref = ray.put((pkeys, skeys, sbal))
    OFF, SHIFT = 1 << 25, 24

    def partial(b: pa.Table, _ref=ref) -> pa.Table:
        pk_set, sk_set, bal = ray.get(_ref)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pp = np.clip(np.searchsorted(pk_set, pk), 0, len(pk_set) - 1)
        sp = np.clip(np.searchsorted(sk_set, sk), 0, len(sk_set) - 1)
        keep = (pk_set[pp] == pk) & (sk_set[sp] == sk)
        if not keep.any():
            return pa.table({"p_partkey": pa.array([], type=pa.int64()),
                             "packed": pa.array([], type=pa.int64())})
        pk, sk, sp = pk[keep], sk[keep], sp[keep]
        packed = ((bal[sp] + OFF) << SHIFT) | ((1 << SHIFT) - 1 - sk)
        # local argmax per part: one shuffle row per (part in batch)
        us, inv = np.unique(pk, return_inverse=True)
        best = np.full(len(us), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(best, inv, packed)
        return pa.table({"p_partkey": pa.array(us),
                         "packed": pa.array(best)})

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    win = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("p_partkey")
           .aggregate(Max("packed", alias_name="packed"))
           .to_pandas())
    if not len(win):
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c in ("s_name", "n_name") else np.int64)
            for c in out_cols})
    packed = win["packed"].to_numpy(np.int64)
    win["s_suppkey"] = ((1 << SHIFT) - 1 - (packed & ((1 << SHIFT) - 1))) \
        .astype(np.int64)
    win["s_acctbal_cents"] = ((packed >> SHIFT) - OFF).astype(np.int64)
    dec = sup.set_index(sup["s_suppkey"].astype(np.int64))
    win["s_name"] = dec["s_name"].reindex(win["s_suppkey"]).to_numpy()
    win["n_name"] = dec["s_nationkey"].reindex(win["s_suppkey"]) \
        .astype(np.int64).map(nmap).to_numpy()
    win["p_partkey"] = win["p_partkey"].astype(np.int64)
    return (win[out_cols]
            .sort_values(["s_acctbal_cents", "s_name", "p_partkey"],
                         ascending=[False, True, True])
            .reset_index(drop=True))


def q9_profit_by_nation_year(sf_dir: str):
    """TPC-H-Q9-shaped profit rollup: exact integer-e4 discounted
    revenue of every 'widget' lineitem, grouped by (supplier nation,
    order year). No partsupp/supplycost in the corpus, so profit =
    extendedprice x (1-discount) — the join/grouping shape is Q9's
    (part filter, supplier->nation, order->year, wide fact scan).
    Dimension sides broadcast (widget partkeys; suppkey->nationkey);
    the orderkey->year lookup is ADAPTIVE: broadcast arrays under
    Q3_BROADCAST_CAP, hash exchange past it. The fold is a dense
    (nation x year) integer grid summed per batch — the shuffle carries
    only grid partials. Emits (n_name, o_year, profit_e4)."""
    import ray
    from ray.data.aggregate import Sum

    pt = _read(sf_dir, "part", columns=["p_partkey", "p_name"]) \
        .to_pandas()
    pkeys = np.sort(
        pt[pt["p_name"].str.split(" ").str[1] == "widget"]["p_partkey"]
        .to_numpy(np.int64))
    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey"]).to_pandas() \
        .sort_values("s_suppkey")
    skeys = sup["s_suppkey"].to_numpy(np.int64)
    snat = sup["s_nationkey"].to_numpy(np.int64)
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"])
    n_ord = _table_rows(sf_dir, "orders")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"])

    def rev_of(b: pa.Table):
        price = _cents(b.column("l_extendedprice")
                       .to_numpy(zero_copy_only=False))
        disc = np.round((1.0 - b.column("l_discount")
                         .to_numpy(zero_copy_only=False)
                         .astype(np.float64)) * 100).astype(np.int64)
        return price * disc

    YW = 64  # years-per-nation stride in the packed (nation, year) key

    if n_ord is not None and n_ord <= Q3_BROADCAST_CAP:
        odf = orders.to_pandas().sort_values("o_orderkey")
        okeys = odf["o_orderkey"].to_numpy(np.int64)
        oyear = odf["o_orderdate"].dt.year.to_numpy(np.int64)
        ref = ray.put((pkeys, skeys, snat, okeys, oyear))

        def partial(b: pa.Table, _ref=ref) -> pa.Table:
            pk_set, sk, sn, ok_, oy = ray.get(_ref)
            pk = b.column("l_partkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            pp = np.clip(np.searchsorted(pk_set, pk), 0,
                         max(len(pk_set) - 1, 0))
            keep = len(pk_set) > 0
            keep = (pk_set[pp] == pk) if keep else np.zeros(len(pk), bool)
            if not keep.any():
                return pa.table({"g": pa.array([], type=pa.int64()),
                                 "profit_e4": pa.array([],
                                                       type=pa.int64())})
            rev = rev_of(b)[keep]
            lsk = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)[keep]
            lok = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)[keep]
            spos = np.clip(np.searchsorted(sk, lsk), 0, len(sk) - 1)
            opos = np.clip(np.searchsorted(ok_, lok), 0, len(ok_) - 1)
            ok_hit = (sk[spos] == lsk) & (ok_[opos] == lok)
            g = sn[spos] * YW + (oy[opos] - 1990)
            g, rev = g[ok_hit], rev[ok_hit]
            us, inv = np.unique(g, return_inverse=True)
            return pa.table({
                "g": pa.array(us),
                "profit_e4": pa.array(np.bincount(inv, weights=rev)
                                      .astype(np.int64))})

        folded = (li.map_batches(partial, batch_format="pyarrow")
                  .groupby("g")
                  .aggregate(Sum("profit_e4", alias_name="profit_e4"))
                  .to_pandas())
    else:
        ref = ray.put((pkeys, skeys, snat))

        def li_prep(b: pa.Table, _ref=ref) -> pa.Table:
            pk_set, sk, sn = ray.get(_ref)
            pk = b.column("l_partkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            pp = np.clip(np.searchsorted(pk_set, pk), 0,
                         max(len(pk_set) - 1, 0))
            keep = (pk_set[pp] == pk) if len(pk_set) \
                else np.zeros(len(pk), bool)
            lsk = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            spos = np.clip(np.searchsorted(sk, lsk), 0, len(sk) - 1)
            keep &= sk[spos] == lsk
            return pa.table({
                "l_orderkey": b.column("l_orderkey")
                .filter(pa.array(keep)),
                "nat": pa.array(sn[spos][keep]),
                "rev_e4": pa.array(rev_of(b)[keep])})

        est = (li.size_bytes() or 0) + (orders.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))
        j = li.map_batches(li_prep, batch_format="pyarrow").join(
            orders, join_type="inner", num_partitions=n_parts,
            on=("l_orderkey",), right_on=("o_orderkey",))

        def grid(b: pa.Table) -> pa.Table:
            yr = pd.DatetimeIndex(
                b.column("o_orderdate").to_pandas()).year \
                .to_numpy(np.int64)
            g = b.column("nat").to_numpy(zero_copy_only=False) * YW \
                + (yr - 1990)
            rev = b.column("rev_e4").to_numpy(zero_copy_only=False)
            us, inv = np.unique(g, return_inverse=True)
            return pa.table({
                "g": pa.array(us),
                "profit_e4": pa.array(np.bincount(inv, weights=rev)
                                      .astype(np.int64))})

        folded = (j.map_batches(grid, batch_format="pyarrow")
                  .groupby("g")
                  .aggregate(Sum("profit_e4", alias_name="profit_e4"))
                  .to_pandas())

    if not len(folded):
        return pd.DataFrame({"n_name": pd.Series([], dtype=object),
                             "o_year": pd.Series([], dtype=np.int64),
                             "profit_e4": pd.Series([], dtype=np.int64)})
    g = folded["g"].to_numpy(np.int64)
    out = pd.DataFrame({
        "n_name": pd.Series(g // YW).map(nmap).to_numpy(),
        "o_year": (g % YW + 1990).astype(np.int64),
        "profit_e4": folded["profit_e4"].astype(np.int64)})
    return out.sort_values(["n_name", "o_year"]).reset_index(drop=True)


def q20_heavy_shippers(sf_dir: str):
    """TPC-H-Q20-shaped excess-inventory probe: suppliers that shipped
    MORE THAN 60 total units of any single 'red' part during 1997 (Q20's
    availqty > half-year-shipments test, restated against the corpus's
    lineitem-derived relation). The per-(supplier, part) quantity sum
    DISTRIBUTES as one Ray groupby.Sum over a packed int64 pair key
    (partkey << 22 | suppkey — documented assumption suppkey < 2^22;
    shard the id space past that); the year cut pushes down to the
    parquet scan and the red-part key set broadcasts. Emits DISTINCT
    qualifying suppliers (s_suppkey, s_name, n_name), s_name-ordered."""
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    QTY_MIN = 60
    pt = _read(sf_dir, "part", columns=["p_partkey", "p_name"]) \
        .to_pandas()
    pkeys = np.sort(
        pt[pt["p_name"].str.startswith("red ")]["p_partkey"]
        .to_numpy(np.int64))

    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    lpath = os.path.join(sf_dir, "lineitem.parquet")
    llo = _pq_schema_scalar(lpath, "l_shipdate", lo)
    lhi = _pq_schema_scalar(lpath, "l_shipdate", hi)
    lkw = {} if llo is None else dict(
        filter=(pads.field("l_shipdate") >= llo)
        & (pads.field("l_shipdate") < lhi))
    li = rd.read_parquet(
        lpath, columns=["l_partkey", "l_suppkey", "l_quantity",
                        "l_shipdate"], **lkw)
    if llo is None:
        li = li.filter(lambda r: lo.to_datetime64() <= r["l_shipdate"]
                       < hi.to_datetime64())

    out_cols = ["s_suppkey", "s_name", "n_name"]
    if len(pkeys) == 0:
        return pd.DataFrame({
            "s_suppkey": pd.Series([], dtype=np.int64),
            "s_name": pd.Series([], dtype=object),
            "n_name": pd.Series([], dtype=object)})

    ref = ray.put(pkeys)
    SHIFT = 22

    def partial(b: pa.Table, _ref=ref) -> pa.Table:
        pk_set = ray.get(_ref)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pp = np.clip(np.searchsorted(pk_set, pk), 0, len(pk_set) - 1)
        keep = pk_set[pp] == pk
        if not keep.any():
            return pa.table({"pk": pa.array([], type=pa.int64()),
                             "qty": pa.array([], type=pa.int64())})
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        qty = np.round(b.column("l_quantity")
                       .to_numpy(zero_copy_only=False)
                       .astype(np.float64)[keep]).astype(np.int64)
        key = (pk[keep] << SHIFT) | sk
        us, inv = np.unique(key, return_inverse=True)
        return pa.table({"pk": pa.array(us),
                         "qty": pa.array(np.bincount(inv, weights=qty)
                                         .astype(np.int64))})

    pairs = (li.map_batches(partial, batch_format="pyarrow")
             .groupby("pk").aggregate(Sum("qty", alias_name="qty")))

    def winners(b: pa.Table) -> pa.Table:
        q = b.column("qty").to_numpy(zero_copy_only=False)
        pk = b.column("pk").to_numpy(zero_copy_only=False)
        sk = np.unique(pk[q > QTY_MIN] & ((1 << SHIFT) - 1))
        return pa.table({"s_suppkey": pa.array(sk.astype(np.int64))})

    sids = np.unique(
        pairs.map_batches(winners, batch_format="pyarrow")
        .to_pandas()["s_suppkey"].to_numpy(np.int64))
    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_name", "s_nationkey"]) \
        .to_pandas()
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    out = sup[sup["s_suppkey"].astype(np.int64).isin(set(sids))].copy()
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    out["n_name"] = out["s_nationkey"].astype(np.int64).map(nmap)
    return (out[out_cols].sort_values("s_name").reset_index(drop=True))


def q21_sole_blocker(sf_dir: str):
    """TPC-H-Q21-shaped 'suppliers who kept orders waiting': within each
    finished ('F') multi-supplier order, the supplier whose lineitems
    ALONE reach the order's latest ship date (the corpus has no
    commit/receipt dates; latest-shipper-is-sole-blocker keeps Q21's
    exists/not-exists window semantics). ONE orderkey-keyed
    ``sorted_group_scan`` ordered by (l_suppkey): per block, supplier
    runs fold with maximum.reduceat, a run is a blocker iff its max
    equals the group max, and a group emits iff it has >= 2 supplier
    runs and EXACTLY ONE blocker run — all vectorized at the run level;
    boundary groups re-verify on the driver through the same pandas
    group_fn. The order-status filter is the adaptive broadcast
    semi-join. Counts per supplier then fold in one small groupby; top
    20 by (numwait desc, s_suppkey). Emits (s_suppkey, s_name,
    numwait)."""
    import ray
    from ray.data.aggregate import Sum

    from rayschema.dedup import sorted_group_scan

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderstatus"]) \
        .filter(expr="o_orderstatus == 'F'") \
        .select_columns(["o_orderkey"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    orders = orders.materialize()
    n_f = orders.count()
    if n_f <= Q3_BROADCAST_CAP:
        fkeys = np.sort(orders.to_pandas()["o_orderkey"]
                        .to_numpy(np.int64))
        fref = ray.put(fkeys)

        def semi(b: pa.Table, _f=fref) -> pa.Table:
            fk = ray.get(_f)
            ok_ = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if len(fk) == 0:
                m = np.zeros(len(ok_), dtype=bool)
            else:
                p = np.clip(np.searchsorted(fk, ok_), 0, len(fk) - 1)
                m = fk[p] == ok_
            mm = pa.array(m)
            return pa.table({
                "l_orderkey": b.column("l_orderkey").filter(mm),
                "l_suppkey": b.column("l_suppkey").filter(mm),
                "sd": b.column("l_shipdate").cast(pa.int64()).filter(mm)})

        flt = li.map_batches(semi, batch_format="pyarrow")
    else:
        est = (li.size_bytes() or 0) + (orders.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))

        def to_i64(b: pa.Table) -> pa.Table:
            return pa.table({
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "sd": b.column("l_shipdate").cast(pa.int64())})

        flt = (li.map_batches(to_i64, batch_format="pyarrow")
               .join(orders, join_type="inner", num_partitions=n_parts,
                     on=("l_orderkey",), right_on=("o_orderkey",)))

    out_schema = pa.schema([("s_suppkey", pa.int64())])

    def group_fn(g: pa.Table):
        df = g.to_pandas()
        runs = df.groupby("l_suppkey")["sd"].max()
        if len(runs) < 2:
            return None
        mx = runs.max()
        at = runs[runs == mx]
        if len(at) != 1:
            return None
        return pa.table({"s_suppkey": pa.array(
            [np.int64(at.index[0])])})

    def block_fn(block, starts, ends, want):
        sk = block.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sd = block.column("sd").to_numpy(zero_copy_only=False)
        n = len(sk)
        if n == 0:
            return None
        gid = np.zeros(n, dtype=np.int64)
        gid[starts] = 1
        gid = np.cumsum(gid) - 1
        run_first = np.ones(n, dtype=bool)
        run_first[1:] = (sk[1:] != sk[:-1]) | (gid[1:] != gid[:-1])
        run_starts = np.flatnonzero(run_first)
        run_max = np.maximum.reduceat(sd, run_starts)
        run_gid = gid[run_starts]
        run_sk = sk[run_starts]
        # per group (over runs): run count, group max, blocker count
        grp_first = np.ones(len(run_starts), dtype=bool)
        grp_first[1:] = run_gid[1:] != run_gid[:-1]
        gstarts = np.flatnonzero(grp_first)
        nruns = np.diff(np.append(gstarts, len(run_starts)))
        gmax = np.maximum.reduceat(run_max, gstarts)
        at_max = run_max == np.repeat(gmax, nruns)
        nblock = np.add.reduceat(at_max, gstarts)
        ok_grp = (nruns >= 2) & (nblock == 1) \
            & want[run_gid[gstarts]].astype(bool)
        if not ok_grp.any():
            return None
        # winner run = the at_max run inside each ok group
        grp_of_run = np.repeat(np.arange(len(gstarts)), nruns)
        sel = at_max & ok_grp[grp_of_run]
        return pa.table({"s_suppkey": pa.array(run_sk[sel])})

    hits = sorted_group_scan(flt, ["l_orderkey"], group_fn, out_schema,
                             group_filter=lambda b, s, e: (e - s) >= 2,
                             block_fn=block_fn,
                             order_cols=["l_suppkey"])

    def cnt(b: pa.Table) -> pa.Table:
        sk = b.column("s_suppkey").to_numpy(zero_copy_only=False)
        us, c = np.unique(sk, return_counts=True)
        return pa.table({"s_suppkey": pa.array(us.astype(np.int64)),
                         "numwait": pa.array(c.astype(np.int64))})

    per_supp = (hits.map_batches(cnt, batch_format="pyarrow")
                .groupby("s_suppkey")
                .aggregate(Sum("numwait", alias_name="numwait"))
                .to_pandas())
    if not len(per_supp):
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=object),
                             "numwait": pd.Series([], dtype=np.int64)})
    top = per_supp.sort_values(["numwait", "s_suppkey"],
                               ascending=[False, True],
                               kind="mergesort").head(20)
    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_name"]).to_pandas()
    out = top.merge(sup, on="s_suppkey", how="left")
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    out["numwait"] = out["numwait"].astype(np.int64)
    return out[["s_suppkey", "s_name", "numwait"]].reset_index(drop=True)


def ppjoin_near_dup_exact(sf_dir: str):
    """PPJoin prefix-filtered EXACT near-dup pairs — the scale path for
    exact similarity joins (no LSH recall loss, no quadratic grid):
    char-5-gram Jaccard >= 0.5 on the doc_id < 300 oracle scope, same
    rows as minhash_near_dup_exact's ground-truth oracle (and
    equality-tested against exact_jaccard_pairs)."""
    from rayschema.dedup import ppjoin_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return _pandas_typed(
        ppjoin_pairs(ds, threshold=0.5, shingle_k=5, id_limit=300),
        {"id_a": "int64", "id_b": "int64", "jaccard": "float64"})


def naive_bayes_langid(sf_dir: str):
    """Distributed multinomial Naive Bayes language classifier, trained
    and evaluated inside the engine (the classic trainable counterpart
    of the heuristic ``langid_confusion_matrix``): TRAIN on the
    even-doc_id half (word counts per language — one vocabulary-bounded
    groupby), PREDICT the odd-doc_id half, emit the confusion matrix
    (lang, pred_lang, n_docs).

    Integer-exact end to end, the bigram-LM recipe: the per-word
    add-one cost ``floor(1000 * (log2(ct_lang + V) - log2(c_lw + 1)))``
    millibits and the per-language prior
    ``floor(1000 * (log2(N + L) - log2(n_lang + 1)))`` are single float
    expressions over exact integer counts (same libm bits on the engine
    and the DuckDB oracle); a document's score per language is a SUM of
    those integer costs, so summation order can never move the result;
    argmin ties break on ascending language code. The model broadcasts
    ONCE as (vocab, L x V millibit matrix, miss costs, priors) and
    prediction is a stateless vectorized map: index_in against the
    vocab dictionary + one bincount per language."""
    import ray
    from ray.data.aggregate import Sum

    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def train_partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(b.column("text")),
                            pc.is_valid(b.column("lang"))),
                    pc.equal(pc.bit_wise_and(b.column("doc_id"),
                                             pa.scalar(1)), 0))
        b = b.filter(m)
        if b.num_rows == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "w": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64()),
                             "nd": pa.array([], type=pa.int64())})
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, _, didx = _flatten_words_arrow(col)
        lang = b.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        wl = lang.take(pa.array(didx))
        t = pa.table({"lang": wl, "w": flat})
        g = t.group_by(["lang", "w"]).aggregate([("w", "count")])
        return pa.table({
            "lang": g.column("lang"),
            "w": g.column("w"),
            "c": g.column("w_count").cast(pa.int64())})

    def doc_count_partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(b.column("text")),
                            pc.is_valid(b.column("lang"))),
                    pc.equal(pc.bit_wise_and(b.column("doc_id"),
                                             pa.scalar(1)), 0))
        lang = b.filter(m).column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        g = pa.table({"lang": lang}).group_by("lang") \
            .aggregate([("lang", "count")])
        return pa.table({"lang": g.column("lang"),
                         "nd": g.column("lang_count").cast(pa.int64())})

    ds = ds.materialize()   # shared by the two train passes + predict
    wc = (ds.map_batches(train_partial, batch_format="pyarrow")
          .groupby(["lang", "w"])
          .aggregate(Sum("c", alias_name="c"))
          .to_pandas())
    nd = (ds.map_batches(doc_count_partial, batch_format="pyarrow")
          .groupby("lang").aggregate(Sum("nd", alias_name="nd"))
          .to_pandas())
    out_empty = pd.DataFrame({"lang": pd.Series([], dtype=object),
                              "pred_lang": pd.Series([], dtype=object),
                              "n_docs": pd.Series([], dtype=np.int64)})
    if not len(wc) or not len(nd):
        return out_empty
    docs_per = nd.set_index("lang")["nd"].astype(np.int64)
    langs = np.array(sorted(docs_per.index))
    L = len(langs)
    vocab = np.unique(wc["w"].to_numpy(dtype=object))
    V = len(vocab)
    if V == 0:
        return out_empty
    N = int(docs_per.sum())
    # L x V token-count matrix -> millibit cost matrix + miss costs
    li = np.searchsorted(langs, wc["lang"].to_numpy(dtype=object))
    wi = np.searchsorted(vocab, wc["w"].to_numpy(dtype=object))
    cmat = np.zeros((L, V), dtype=np.int64)
    cmat[li, wi] = wc["c"].to_numpy(np.int64)
    ct = cmat.sum(axis=1)
    denom = np.log2((ct + V).astype(np.float64))[:, None]
    mb = np.floor(1000.0 * (denom - np.log2(
        (cmat + 1).astype(np.float64)))).astype(np.int64)
    miss = np.floor(1000.0 * (denom[:, 0])).astype(np.int64)
    prior = np.floor(1000.0 * (np.log2(float(N + L))
                               - np.log2((docs_per.reindex(langs)
                                          .to_numpy(np.int64) + 1)
                                         .astype(np.float64)))) \
        .astype(np.int64)
    vocab_pa = pa.array(vocab, type=pa.string())
    ref = ray.put((vocab_pa, mb, miss, prior, langs))

    def predict(b: pa.Table, _ref=ref) -> pa.Table:
        vpa, mb_a, miss_a, prior_a, langs_a = ray.get(_ref)
        m = pc.and_(pc.and_(pc.is_valid(b.column("text")),
                            pc.is_valid(b.column("lang"))),
                    pc.equal(pc.bit_wise_and(b.column("doc_id"),
                                             pa.scalar(1)), 1))
        b = b.filter(m)
        n = b.num_rows
        if n == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "pred_lang": pa.array([], type=pa.string()),
                             "n_docs": pa.array([], type=pa.int64())})
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, _, didx = _flatten_words_arrow(col)
        codes = pc.index_in(flat, value_set=vpa) \
            .to_numpy(zero_copy_only=False)
        hit = ~np.isnan(codes.astype(np.float64)) \
            if codes.dtype.kind == "f" else codes != -1
        codes = np.nan_to_num(codes.astype(np.float64), nan=0) \
            .astype(np.int64)
        nl = len(langs_a)
        cost = np.tile(prior_a.astype(np.int64)[None, :], (n, 1))
        for k in range(nl):
            wcost = np.where(hit, mb_a[k][codes], miss_a[k])
            cost[:, k] += np.bincount(didx, weights=wcost,
                                      minlength=n).astype(np.int64)
        pred = np.argmin(cost, axis=1)   # ties -> lowest index = asc lang
        lang = b.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        t = pa.table({"lang": lang,
                      "pred_lang": pa.array(langs_a[pred],
                                            type=pa.string())})
        g = t.group_by(["lang", "pred_lang"]).aggregate([("lang", "count")])
        return pa.table({"lang": g.column("lang"),
                         "pred_lang": g.column("pred_lang"),
                         "n_docs": g.column("lang_count")
                        .cast(pa.int64())})

    out = (ds.map_batches(predict, batch_format="pyarrow")
           .groupby(["lang", "pred_lang"])
           .aggregate(Sum("n_docs", alias_name="n_docs"))
           .to_pandas())
    if not len(out):
        return out_empty
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out.sort_values(["lang", "pred_lang"]).reset_index(drop=True)


def edit_distance_pairs_documents(sf_dir: str):
    """Exact Levenshtein near-dup pairs (edit distance <= 10) over the
    doc_id < 200 oracle scope — the character-level complement of the
    set-based Jaccard family (catches transpositions/typos that shingle
    Jaccard scores low). Ukkonen q-gram count + length filters prune,
    banded DP verifies; DuckDB's levenshtein() mirrors it exactly."""
    from rayschema.dedup import edit_distance_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return _pandas_typed(
        edit_distance_pairs(ds, id_limit=200, k=10, q=4),
        {"id_a": "int64", "id_b": "int64", "edit_distance": "int64"})


def record_linkage_clusters(sf_dir: str):
    """Entity-resolution pipeline: BLOCK (q-gram count + length filters)
    -> MATCH (exact banded Levenshtein <= 10) -> CLUSTER (connected
    components, min-id label) over the doc_id < 200 scope — the standard
    record-linkage composition (Fellegi-Sunter shape with a
    deterministic distance rule), built from the engine's
    edit_distance_pairs + union-find/min-label machinery. Emits every
    matched doc's (doc_id, cluster_id); singletons stay out (they linked
    to nothing). Oracle: recursive min-label CTE over DuckDB
    levenshtein() pairs."""
    from rayschema.dedup import connected_components, edit_distance_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = edit_distance_pairs(ds, id_limit=200, k=10, q=4).to_pandas()
    if not len(pairs):
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "cluster_id": pd.Series([], dtype=np.int64)})
    cc = connected_components(pairs)
    cc["doc_id"] = cc["doc_id"].astype(np.int64)
    cc["cluster_id"] = cc["cluster_id"].astype(np.int64)
    return cc.sort_values("doc_id").reset_index(drop=True)


TRADE_PAIR_FOLD_CAP = 10_000_000   # lineitem rows (>= distinct pairs):
#                                    under it the distinct folds on the
#                                    driver (8 B/pair; the frequent_triples
#                                    fold_cap discipline), past it the
#                                    8-byte-key groupby shuffle runs


def _trade_pair_keys(sf_dir: str):
    """Distinct customer–supplier trade pairs as packed node keys
    (c_node<<32 | s_node with c_node = 2*custkey, s_node = 2*suppkey + 1
    — the documented 2^31-key packing q20 uses), from orders ⋈ lineitem.
    The orderkey→custkey side is adaptive: broadcast arrays under
    Q3_BROADCAST_CAP (gated on parquet metadata row counts — no extra
    execution), Dataset.join hash exchange past it. The cross-block
    DISTINCT is adaptive too: per-batch uniques fold through one driver
    np.unique under TRADE_PAIR_FOLD_CAP candidate rows (gated on the
    lineitem footer count — pairs can't exceed source rows; the
    ~590k-pair sf0.1 graph paid a 3-4 s 8-byte groupby shuffle for a
    4.7 MB driver fold), the groupby shuffle past the cap
    (equality-tested). Shared by the PageRank and HITS trade-graph
    queries."""
    import ray
    from ray.data.aggregate import Count

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    n_li = _table_rows(sf_dir, "lineitem")
    n_ord = _table_rows(sf_dir, "orders")
    if n_ord is not None and n_ord <= Q3_BROADCAST_CAP:
        odf = orders.to_pandas().sort_values("o_orderkey")
        oref = ray.put((odf["o_orderkey"].to_numpy(np.int64),
                        odf["o_custkey"].to_numpy(np.int64)))

        def pack(b: pa.Table, _o=oref) -> pa.Table:
            ok, oc = ray.get(_o)
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            sk = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if not len(ok):
                return pa.table({"ekey": pa.array([], type=pa.int64())})
            p = np.clip(np.searchsorted(ok, lk), 0, len(ok) - 1)
            hit = ok[p] == lk
            ck, sk = oc[p][hit], sk[hit]
            ekey = np.unique((ck * 2) << np.int64(32) | (sk * 2 + 1))
            return pa.table({"ekey": pa.array(ekey)})

        packed = li.map_batches(pack, batch_format="pyarrow")
        if n_li is not None and n_li <= TRADE_PAIR_FOLD_CAP:
            import ray.data as rd

            uk = np.unique(packed.to_pandas()["ekey"].to_numpy(np.int64))
            return rd.from_arrow(pa.table({"ekey": pa.array(uk)}))
        return (packed.groupby("ekey").aggregate(Count(alias_name="_n"))
                .select_columns(["ekey"]))

    est = (li.size_bytes() or 0) + (orders.size_bytes() or 0)
    n_parts = int(min(256, max(8, est // (128 << 20) + 8)))
    joined = li.join(orders, join_type="inner",
                     num_partitions=n_parts,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def pack_j(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ekey = np.unique((ck * 2) << np.int64(32) | (sk * 2 + 1))
        return pa.table({"ekey": pa.array(ekey)})

    return (joined.map_batches(pack_j, batch_format="pyarrow")
            .groupby("ekey").aggregate(Count(alias_name="_n"))
            .select_columns(["ekey"]))


def pagerank_customer_supplier(sf_dir: str, iters: int = 4):
    """PageRank over the customer–supplier trade graph: distinct
    (custkey, suppkey) pairs from orders ⋈ lineitem (_trade_pair_keys),
    doubled into a symmetric edge list (suppliers serving many
    well-connected customers rank high). The iteration is
    rayschema.graph.pagerank — one edge-stream pass + one node-keyed
    groupby per superstep, integer ppb fixed-point — so every rank bit
    matches the unrolled SQL CTEs. Emits the top-20 nodes: (node_id,
    node_type, entity_key, pagerank, rk) with deterministic integer
    ties."""
    from rayschema.graph import pagerank

    pairs = _trade_pair_keys(sf_dir)

    def unpack(b: pa.Table) -> pa.Table:
        ek = b.column("ekey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c, s = ek >> np.int64(32), ek & np.int64((1 << 32) - 1)
        return pa.table({
            "src": pa.array(np.concatenate([c, s])),
            "dst": pa.array(np.concatenate([s, c]))})

    edges = pairs.map_batches(unpack, batch_format="pyarrow")
    pr = pagerank(edges, iters=iters)

    # top-20 over the node-count-bounded rank vector (O(nodes) driver
    # state, same bound the rank broadcast already requires)
    node = pr["node"].to_numpy(np.int64)
    rank = pr["pr"].to_numpy(np.int64)
    order = np.lexsort((node, -rank))[:20]
    node, rank = node[order], rank[order]
    return pd.DataFrame({
        "node_id": node,
        "node_type": np.where(node % 2 == 0, "customer", "supplier"),
        "entity_key": node // 2,
        "pagerank": rank,
        "rk": np.arange(1, len(node) + 1, dtype=np.int64)})


def _part_pair_edges(sf_dir: str):
    """Distinct part co-purchase edges (a < b int64) from ONE
    l_orderkey-keyed sorted_group_scan (within-order partkey dedup +
    vectorized pair emission) folded distinct by packed pair key —
    driver np.unique under the 10M pair-instance cap, hash groupby past
    it. Shared by the triangle-count and clustering-coefficient
    queries."""
    from ray.data.aggregate import Count

    from rayschema.dedup import sorted_group_scan
    from rayschema.graph import _pair_index

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    pk_schema = pa.schema([("pk", pa.int64())])

    def pair_block(b: pa.Table, starts, ends, want) -> pa.Table:
        pkeys = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s, e = starts[want], ends[want]
        sizes = (e - s).astype(np.int64)
        tot = int(sizes.sum())
        if not tot:
            return None
        take = (np.repeat(s, sizes)
                + (np.arange(tot, dtype=np.int64)
                   - np.repeat(np.cumsum(sizes) - sizes, sizes)))
        cp = pkeys[take]
        gstart = np.cumsum(sizes) - sizes
        first = np.zeros(tot, dtype=bool)
        first[gstart] = True
        keep = first | (cp != np.roll(cp, 1))   # partkey sorted in-group
        dedup_sizes = np.add.reduceat(keep.astype(np.int64), gstart)
        cp = cp[keep]
        i_idx, j_idx = _pair_index(dedup_sizes)
        v, w = cp[i_idx], cp[j_idx]             # ascending: v < w
        return pa.table({"pk": pa.array((v << np.int64(32)) | w)})

    def pair_group(g: pa.Table) -> pa.Table:
        u = np.unique(g.column("l_partkey").to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        i_idx, j_idx = _pair_index(np.array([len(u)]))
        v, w = u[i_idx], u[j_idx]
        return pa.table({"pk": pa.array((v << np.int64(32)) | w)})

    pair_keys = sorted_group_scan(
        li, ["l_orderkey"], pair_group, pk_schema,
        group_filter=lambda b, s, e: (e - s) >= 2,
        block_fn=pair_block, sort_blocks=32, order_cols=["l_partkey"])

    def _decode(b: pa.Table) -> pa.Table:
        pk = b.column("pk").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"a": pa.array(pk >> np.int64(32)),
                         "b": pa.array(pk & np.int64((1 << 32) - 1))})

    from rayschema.graph import NODE_BROADCAST_CAP as _EDGE_CAP

    pair_keys = pair_keys.materialize()
    if pair_keys.count() <= 10_000_000:
        # pair-instance count fits triangle_counts' own edge-broadcast
        # bound, so the distinct is a driver np.unique on the same
        # O(m)-bounded pull (measured 10x faster than the hash groupby
        # at 1.2M keys); past the cap the distinct stays a groupby
        import ray.data as rd

        pk = np.unique(pair_keys.to_pandas()["pk"].to_numpy(np.int64))
        edges = rd.from_arrow(_decode(pa.table({"pk": pa.array(pk)})))
    else:
        edges = (pair_keys.groupby("pk")
                 .aggregate(Count(alias_name="_n"))
                 .map_batches(_decode, batch_format="pyarrow"))
    return edges


def triangle_parts_copurchase(sf_dir: str, top_n: int = 15):
    """Per-part triangle counts over the part co-purchase graph
    (_part_pair_edges distinct pairs); the count itself is
    rayschema.graph.triangle_counts — degree-oriented wedge generation
    bounding wedge volume at O(m^1.5), closure by a marker-join on a
    second keyed scan, per-node fold as ONE groupby.Sum. Emits the
    top-15 (part_key, n_triangles, rk), deterministic integer ties.
    Oracle: 3-way self-join on the distinct-edge CTE."""
    from rayschema.graph import triangle_counts

    edges = _part_pair_edges(sf_dir)
    cnt = triangle_counts(edges).to_pandas()   # O(parts) driver state
    node = cnt["node"].to_numpy(np.int64)
    tri = cnt["n_triangles"].to_numpy(np.int64)
    order = np.lexsort((node, -tri))[:top_n]
    node, tri = node[order], tri[order]
    return pd.DataFrame({
        "part_key": node,
        "n_triangles": tri,
        "rk": np.arange(1, len(node) + 1, dtype=np.int64)})


def clustering_coeff_parts(sf_dir: str, top_n: int = 15):
    """Local clustering coefficient (Watts–Strogatz, public) per part
    over the co-purchase graph: cc(v) = 2*tri(v) / (deg(v)*(deg(v)-1))
    as the exact floor-ppm integer, deg >= 2 only. Triangles come from
    the shared rayschema.graph.triangle_counts; degrees from one partial
    groupby over the same _part_pair_edges Dataset — both folds are
    O(parts). Emits the top-15 (part_key, deg, n_triangles, cc_ppm, rk)
    by (cc_ppm desc, part asc)."""
    from ray.data.aggregate import Sum

    from rayschema.graph import triangle_counts

    edges = _part_pair_edges(sf_dir).materialize()
    tri = triangle_counts(edges).to_pandas()

    def deg_partial(b: pa.Table) -> pa.Table:
        both = np.concatenate([
            b.column("a").to_numpy(zero_copy_only=False).astype(np.int64),
            b.column("b").to_numpy(zero_copy_only=False).astype(np.int64)])
        u, c = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(u),
                         "dp": pa.array(c.astype(np.int64))})

    dp = edges.map_batches(deg_partial, batch_format="pyarrow")
    if edges.count() <= 10_000_000:
        # edges are under triangle_counts' own broadcast bound, so the
        # node-unique per-block partials fold on the driver (<= blocks x
        # nodes rows) instead of paying a node-keyed hash groupby
        pp = dp.to_pandas()
        u, inv = np.unique(pp["node"].to_numpy(np.int64),
                           return_inverse=True)
        deg = pd.DataFrame({
            "node": u,
            "deg": np.bincount(inv, weights=pp["dp"].to_numpy(np.int64))
            .astype(np.int64)})
    else:
        deg = (dp.groupby("node").aggregate(Sum("dp", alias_name="deg"))
               .to_pandas())
    df = deg.merge(tri, on="node", how="left")
    df["n_triangles"] = df["n_triangles"].fillna(0).astype(np.int64)
    df = df[df["deg"] >= 2]
    d = df["deg"].to_numpy(np.int64)
    t = df["n_triangles"].to_numpy(np.int64)
    cc = (2_000_000 * t) // (d * (d - 1))
    node = df["node"].to_numpy(np.int64)
    order = np.lexsort((node, -cc))[:top_n]
    return pd.DataFrame({
        "part_key": node[order],
        "deg": d[order],
        "n_triangles": t[order],
        "cc_ppm": cc[order],
        "rk": np.arange(1, len(order) + 1, dtype=np.int64)})


def hits_trade_graph(sf_dir: str, iters: int = 2):
    """HITS hubs/authorities over the DIRECTED customer→supplier trade
    graph (customers are hubs, suppliers authorities). Edges are the
    shared _trade_pair_keys distinct pairs; the iteration is
    rayschema.graph.hits — integer ppb scores with overflow-safe
    divide-by-ceil normalization, ONE edge pass + ONE groupby per
    half-step — so every score bit matches the unrolled SQL CTEs. Emits
    the top-10 of each side: (side, entity_key, score, rk),
    deterministic integer ties."""
    from rayschema.graph import hits

    pairs = _trade_pair_keys(sf_dir)

    def unpack(b: pa.Table) -> pa.Table:
        ek = b.column("ekey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "src": pa.array(ek >> np.int64(32)),
            "dst": pa.array(ek & np.int64((1 << 32) - 1))})

    edges = pairs.map_batches(unpack, batch_format="pyarrow")
    df = hits(edges, iters=iters)

    outs = []
    for side in ("hub", "auth"):
        part = df[df["side"] == side]
        node = part["node"].to_numpy(np.int64)
        sc = part["score"].to_numpy(np.int64)
        order = np.lexsort((node, -sc))[:10]
        node, sc = node[order], sc[order]
        outs.append(pd.DataFrame({
            "side": side,
            "entity_key": node // 2,
            "score": sc,
            "rk": np.arange(1, len(node) + 1, dtype=np.int64)}))
    return pd.concat(outs, ignore_index=True)


def lpa_communities_trade(sf_dir: str, iters: int = 3):
    """Community detection by synchronous label propagation over the
    symmetric customer–supplier trade graph (same _trade_pair_keys edges
    as pagerank). The iteration is rayschema.graph.label_propagation —
    per superstep ONE edge-stream pass of packed (dst, label) vote
    partials, one Sum groupby and one packed-key Max groupby, with the
    deterministic (count desc, label asc) winner — so every label bit
    matches the unrolled SQL CTEs. Emits the top-20 communities by size:
    (community_id, n_members, rk) with deterministic integer ties."""
    from rayschema.graph import label_propagation

    pairs = _trade_pair_keys(sf_dir)

    def unpack(b: pa.Table) -> pa.Table:
        ek = b.column("ekey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c, s = ek >> np.int64(32), ek & np.int64((1 << 32) - 1)
        return pa.table({
            "src": pa.array(np.concatenate([c, s])),
            "dst": pa.array(np.concatenate([s, c]))})

    edges = pairs.map_batches(unpack, batch_format="pyarrow")
    lp = label_propagation(edges, iters=iters)

    # community sizes over the node-count-bounded label vector (O(nodes)
    # driver state, the same bound the label broadcast already requires)
    lab, cnt = np.unique(lp["label"].to_numpy(np.int64),
                         return_counts=True)
    order = np.lexsort((lab, -cnt))[:20]
    lab, cnt = lab[order], cnt[order].astype(np.int64)
    return pd.DataFrame({
        "community_id": lab,
        "n_members": cnt,
        "rk": np.arange(1, len(lab) + 1, dtype=np.int64)})


def kcore_trade_graph(sf_dir: str, k: int = 12, rounds: int = 3):
    """k-core of the symmetric customer–supplier trade graph: bounded
    peel via rayschema.graph.kcore — per round ONE edge-stream pass of
    both-endpoints-alive in-degree partials plus a groupby.Sum and a
    >= k cut, alive set broadcast under the node cap / semi-joined past
    it. Emits the top-20 surviving nodes by induced degree:
    (node_id, node_type, entity_key, core_deg, rk), deterministic
    integer ties."""
    from rayschema.graph import kcore

    pairs = _trade_pair_keys(sf_dir)

    def unpack(b: pa.Table) -> pa.Table:
        ek = b.column("ekey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c, s = ek >> np.int64(32), ek & np.int64((1 << 32) - 1)
        return pa.table({
            "src": pa.array(np.concatenate([c, s])),
            "dst": pa.array(np.concatenate([s, c]))})

    edges = pairs.map_batches(unpack, batch_format="pyarrow")
    core = kcore(edges, k=k, rounds=rounds)

    node = core["node"].to_numpy(np.int64)
    deg = core["core_deg"].to_numpy(np.int64)
    order = np.lexsort((node, -deg))[:20]
    node, deg = node[order], deg[order]
    return pd.DataFrame({
        "node_id": node,
        "node_type": np.where(node % 2 == 0, "customer", "supplier"),
        "entity_key": node // 2,
        "core_deg": deg,
        "rk": np.arange(1, len(node) + 1, dtype=np.int64)})


def value_gini_by_type(sf_dir: str):
    """Gini concentration of event value per event_type, integer-exact:
    ONE map_batches pass folds per-batch (event_type, cents) histogram
    partials, one groupby.Sum merges them, and the closed form over the
    value histogram gives the exact rank-weighted sum without a global
    sort — a cents bucket with count c and e smaller-valued rows in its
    type contributes v * (c*e + c*(c+1)/2) to S1 = sum(rank*value), the
    same value row_number() produces for ANY tie order (equal values
    swap ranks without changing the sum). gini_ppm =
    floor(1e6 * (2*S1 - (n+1)*S) / (n*S)), computed in Python
    arbitrary-precision ints from per-type (n, S, S1) — the histogram
    fold is O(distinct (type, cents)) driver state, bounded by the
    VALUE DOMAIN (cents spread), not the dataset size; per-element
    int64 products bound exactness at ~4e8 rows/type at these value
    scales (the SQL mirror widens to HUGEINT). Emits one row per type:
    (event_type, n_events, sum_cents, gini_ppm)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def part(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pandas(),
            "cents": _cents(b.column("value").to_numpy(
                zero_copy_only=False))})
        g = df.groupby(["event_type", "cents"], as_index=False).size()
        return pa.table({"event_type": pa.array(g["event_type"]),
                         "cents": pa.array(g["cents"].to_numpy(np.int64)),
                         "n": pa.array(g["size"].to_numpy(np.int64))})

    hist = (ds.map_batches(part, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())          # domain-bounded: <= types x cents-domain

    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("cents")
        v = g["cents"].to_numpy(np.int64)
        c = g["n"].to_numpy(np.int64)
        e = np.cumsum(c) - c
        n = int(c.sum())
        s = int((v * c).sum())
        s1 = int((v * (c * e + c * (c + 1) // 2)).sum())
        gini_ppm = (1_000_000 * (2 * s1 - (n + 1) * s)) // (n * s)
        rows.append((et, n, s, int(gini_ppm)))
    return pd.DataFrame(rows, columns=["event_type", "n_events",
                                       "sum_cents", "gini_ppm"]) \
        .astype({"n_events": np.int64, "sum_cents": np.int64,
                 "gini_ppm": np.int64})


def assortativity_trade_graph(sf_dir: str):
    """Degree assortativity (Newman 2002, public) of the symmetric
    customer–supplier trade graph, integer-exact: one groupby folds the
    degree vector (O(nodes), the same broadcast bound the graph module's
    rank vectors carry), then ONE edge-stream pass accumulates the four
    edge moments M, sum(j*k), sum(j), sum(j^2) with j/k the endpoint
    degrees. On a symmetric edge list the j- and k-marginals coincide,
    so Pearson r reduces to the exact integer ratio
    (M*sum_jk - sum_j^2) / (M*sum_j2 - sum_j^2); r_ppm is that ratio in
    parts-per-million TRUNCATED TOWARD ZERO (matching SQL integer
    division on a possibly-negative numerator — trade graphs are
    disassortative: high-degree suppliers serve low-degree customers).
    Emits ONE row: (n_edges, sum_jk, sum_j, sum_j2, assort_num,
    assort_den, r_ppm)."""
    import ray
    from ray.data.aggregate import Sum

    pairs = _trade_pair_keys(sf_dir)

    def unpack(b: pa.Table) -> pa.Table:
        ek = b.column("ekey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c, s = ek >> np.int64(32), ek & np.int64((1 << 32) - 1)
        return pa.table({
            "src": pa.array(np.concatenate([c, s])),
            "dst": pa.array(np.concatenate([s, c]))})

    edges = pairs.map_batches(unpack, batch_format="pyarrow") \
        .materialize()

    def deg_part(b: pa.Table) -> pa.Table:
        u, cnt = np.unique(b.column("src").to_numpy(zero_copy_only=False)
                           .astype(np.int64), return_counts=True)
        return pa.table({"node": pa.array(u),
                         "dp": pa.array(cnt.astype(np.int64))})

    dd = (edges.map_batches(deg_part, batch_format="pyarrow")
          .groupby("node").aggregate(Sum("dp", alias_name="deg"))
          .to_pandas().sort_values("node"))
    ref = ray.put((dd["node"].to_numpy(np.int64),
                   dd["deg"].to_numpy(np.int64)))

    def moments(b: pa.Table, _r=ref) -> pa.Table:
        nd, dg = ray.get(_r)
        s = b.column("src").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = b.column("dst").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        j, k = dg[np.searchsorted(nd, s)], dg[np.searchsorted(nd, d)]
        return pa.table({
            "m": pa.array([np.int64(len(j))]),
            "sjk": pa.array([(j * k).sum()]),
            "sj": pa.array([j.sum()]),
            "sj2": pa.array([(j * j).sum()])})

    part = edges.map_batches(moments, batch_format="pyarrow").to_pandas()
    m = int(part["m"].sum())
    sjk, sj, sj2 = (int(part[c].sum()) for c in ("sjk", "sj", "sj2"))
    num = m * sjk - sj * sj
    den = m * sj2 - sj * sj
    scaled = 1_000_000 * num
    r_ppm = 0 if den == 0 else (
        scaled // den if scaled >= 0 else -((-scaled) // den))
    return pd.DataFrame({
        "n_edges": [m], "sum_jk": [sjk], "sum_j": [sj], "sum_j2": [sj2],
        "assort_num": [num], "assort_den": [den], "r_ppm": [r_ppm]}) \
        .astype(np.int64)


def source_vocab_overlap(sf_dir: str):
    """Pairwise vocabulary Jaccard between sources, integer-exact and
    NEVER pairwise over words: one distributed distinct on
    (source, word), a broadcast source→bit mapping, one
    groupby.Sum("bit") folding each word's sources into a bitmask
    (exact OR because the pairs are distinct), then a mask histogram
    whose driver fold is bounded by distinct masks (≤ 2^#sources —
    documented ≤ 62 sources for the int64 mask; past that, emit
    per-pair rows per word and groupby the pair key instead). From the
    histogram every |A_i|, |A_i ∩ A_j| and the exact floor-ppm Jaccard
    follow in O(masks · pairs) driver work. Emits one row per
    intersecting pair (source_a < source_b): (source_a, source_b,
    n_inter, n_union, jaccard_ppm), sorted by the pair."""
    import ray
    from ray.data.aggregate import Count, Sum

    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("text")),
                             pc.is_valid(b.column("source"))))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "word": pa.array([], type=pa.string())})
        flat, _, doc_idx = _flatten_words_arrow(col)
        srcs = pc.take(b.column("source"), pa.array(doc_idx))
        g = (pa.table({"source": srcs, "word": flat})
             .group_by(["source", "word"]).aggregate([([], "count_all")]))
        return pa.table({"source": g.column("source"),
                         "word": g.column("word")})

    pairs = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["source", "word"])
             .aggregate(Count(alias_name="_n"))
             .select_columns(["source", "word"])).materialize()

    src_list = np.sort(pairs.groupby("source")
                       .aggregate(Count(alias_name="_n"))
                       .to_pandas()["source"].to_numpy(object))
    if len(src_list) > 62:
        raise NotImplementedError(
            "int64 mask path holds <= 62 sources; use the per-pair "
            "emission fallback documented above")
    sref = ray.put(src_list)

    def to_bit(b: pa.Table, _s=sref) -> pa.Table:
        sl = ray.get(_s)
        idx = np.searchsorted(sl, b.column("source").to_numpy(
            zero_copy_only=False).astype(object))
        return pa.table({"word": b.column("word"),
                         "bit": pa.array(np.int64(1) << idx.astype(
                             np.int64))})

    def mask_hist(b: pa.Table) -> pa.Table:
        m, n = np.unique(_np64_col(b, "mask"), return_counts=True)
        return pa.table({"mask": pa.array(m),
                         "n": pa.array(n.astype(np.int64))})

    hist = (pairs.map_batches(to_bit, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("bit", alias_name="mask"))
            .map_batches(mask_hist, batch_format="pyarrow")
            .groupby("mask").aggregate(Sum("n", alias_name="n"))
            .to_pandas())          # <= distinct masks: domain-bounded

    masks = hist["mask"].to_numpy(np.int64)
    cnts = hist["n"].to_numpy(np.int64)
    k = len(src_list)
    has = [(masks >> i) & 1 == 1 for i in range(k)]
    size = [int(cnts[has[i]].sum()) for i in range(k)]
    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            ni = int(cnts[has[i] & has[j]].sum())
            if ni == 0:
                continue
            nu = size[i] + size[j] - ni
            rows.append((src_list[i], src_list[j], ni, nu,
                         (1_000_000 * ni) // nu))
    out = pd.DataFrame(rows, columns=["source_a", "source_b", "n_inter",
                                      "n_union", "jaccard_ppm"])
    return (out.astype({"n_inter": np.int64, "n_union": np.int64,
                        "jaccard_ppm": np.int64})
            .sort_values(["source_a", "source_b"])
            .reset_index(drop=True))


def _np64_col(b: pa.Table, name: str) -> np.ndarray:
    return b.column(name).to_numpy(zero_copy_only=False).astype(np.int64)


def copurchase_lift_pairs(sf_dir: str, minsup: int = 2, top_n: int = 20):
    """Market-basket lift over part co-purchases (classic association-
    rule scoring, Agrawal et al. 1993 shape): lift(a,b) =
    P(a,b) / (P(a) P(b)) over orders, ranked as the exact floor-ppm
    integer (1e6 * n_ab * N) // (n_a * n_b) — no floats anywhere.
    n_ab comes from the SAME one-orderkey-keyed pair-emission scan the
    triangle count uses (within-order dedup built in) folded by packed
    pair key; n_a (distinct orders per part) and N (distinct orders)
    ride the SAME scan — interior groups ship per-block part-frequency
    partials through the extra_emit side channel, boundary groups emit
    typed marker rows (kind=1 per distinct (order, part), kind=2 per
    order) that the driver folds — so ONE sort is the query's only
    all-to-all. Part frequencies broadcast once (O(parts), the usual
    node-vector bound), each block ranks its own candidates and only
    blocks x top_n rows reach the driver merge. int64 exactness bound: 1e6 * n_ab * N < 2^63
    (wider corpora: widen to the HUGEINT mirror). Emits the top-20:
    (part_a, part_b, n_both, n_a, n_b, lift_ppm, rk), deterministic
    (lift desc, part_a, part_b) ties."""
    import ray
    from ray.data.aggregate import Count

    from rayschema.dedup import sorted_group_scan
    from rayschema.graph import _pair_index

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    # ---- ONE sorted scan yields pairs AND the n_a / N side data:
    # interior groups ship per-block part-frequency partials + the interior
    # order count through the extra_emit side channel; boundary (residual)
    # groups — stitched exactly once on the driver — emit typed MARKER rows
    # (kind=1: one distinct (order, part), kind=2: one distinct order)
    # alongside their kind=0 pairs. This folds what used to be a second
    # (l_orderkey, l_partkey) groupby shuffle plus a third lineitem pass
    # into the scan the pair emission already pays for.
    import struct

    pk_schema = pa.schema([("pk", pa.int64()), ("kind", pa.int8())])

    def pair_block(b: pa.Table, starts, ends, want) -> pa.Table:
        pkeys = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s, e = starts[want], ends[want]
        sizes = (e - s).astype(np.int64)
        tot = int(sizes.sum())
        if not tot:
            return None
        take = (np.repeat(s, sizes)
                + (np.arange(tot, dtype=np.int64)
                   - np.repeat(np.cumsum(sizes) - sizes, sizes)))
        cp = pkeys[take]
        gstart = np.cumsum(sizes) - sizes
        first = np.zeros(tot, dtype=bool)
        first[gstart] = True
        keep = first | (cp != np.roll(cp, 1))
        dedup_sizes = np.add.reduceat(keep.astype(np.int64), gstart)
        cp = cp[keep]
        i_idx, j_idx = _pair_index(dedup_sizes)
        v, w = cp[i_idx], cp[j_idx]
        return pa.table({"pk": pa.array((v << np.int64(32)) | w),
                         "kind": pa.array(np.zeros(len(v), dtype=np.int8))})

    def pair_group(g: pa.Table) -> pa.Table:
        # residual (boundary) groups, driver-stitched: pairs + one kind=1
        # marker per distinct part + one kind=2 marker for the order itself
        u = np.unique(g.column("l_partkey").to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        ok = int(g.column("l_orderkey")[0].as_py())
        i_idx, j_idx = _pair_index(np.array([len(u)]))
        v, w = u[i_idx], u[j_idx]
        pk = np.concatenate([(v << np.int64(32)) | w, u,
                             np.array([ok], dtype=np.int64)])
        kind = np.concatenate([np.zeros(len(v), dtype=np.int8),
                               np.ones(len(u), dtype=np.int8),
                               np.full(1, 2, dtype=np.int8)])
        return pa.table({"pk": pa.array(pk), "kind": pa.array(kind)})

    def freq_emit(b: pa.Table, starts, ends):
        # interior-group part frequencies (rows are part-sorted within each
        # group, so dedup is the same first|diff pass pair_block uses) and
        # the interior order count, packed as one side-channel payload
        pkeys = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nrow = b.num_rows
        boundary = (starts == 0) | (ends == nrow)
        s, e = starts[~boundary], ends[~boundary]
        n_int = len(s)
        if n_int == 0:
            return None
        sizes = (e - s).astype(np.int64)
        tot = int(sizes.sum())
        take = (np.repeat(s, sizes)
                + (np.arange(tot, dtype=np.int64)
                   - np.repeat(np.cumsum(sizes) - sizes, sizes)))
        cp = pkeys[take]
        gstart = np.cumsum(sizes) - sizes
        first = np.zeros(tot, dtype=bool)
        first[gstart] = True
        cp = cp[first | (cp != np.roll(cp, 1))]
        u, c = np.unique(cp, return_counts=True)
        return (struct.pack("<q", n_int)
                + u.tobytes() + c.astype(np.int64).tobytes())

    pair_inst, payloads = sorted_group_scan(
        li, ["l_orderkey"], pair_group, pk_schema,
        group_filter=lambda b, s, e: (e - s) >= 2,
        block_fn=pair_block, sort_blocks=32,
        order_cols=["l_partkey"], extra_emit=freq_emit)
    pair_inst = pair_inst.materialize()

    # ---- fold n_a and N from the side channel + boundary markers
    n_orders = 0
    us, cs = [], []
    for p in payloads:
        n_orders += struct.unpack("<q", p[:8])[0]
        rest = np.frombuffer(p[8:], dtype=np.int64)
        half = len(rest) // 2
        us.append(rest[:half])
        cs.append(rest[half:])
    mk = pair_inst.filter(expr="kind > 0").to_pandas()   # O(blocks) rows
    if len(mk):
        u1, c1 = np.unique(mk.loc[mk["kind"] == 1, "pk"].to_numpy(np.int64),
                           return_counts=True)
        us.append(u1)
        cs.append(c1.astype(np.int64))
        n_orders += int((mk["kind"] == 2).sum())
    uall = np.concatenate(us) if us else np.array([], dtype=np.int64)
    call = np.concatenate(cs) if cs else np.array([], dtype=np.int64)
    pf_parts, inv = np.unique(uall, return_inverse=True)
    pf_counts = (np.bincount(inv, weights=call).astype(np.int64)
                 if len(uall) else np.array([], dtype=np.int64))

    if pair_inst.count() - len(mk) <= 10_000_000:
        # pair instances fit the triangle-count distinct bound: one
        # driver np fold replaces the ~1M-key hash groupby (measured
        # ~10x there); per-batch partial pre-counts keep the pull <= m
        def pk_partial(b: pa.Table) -> pa.Table:
            m = b.column("kind").to_numpy(zero_copy_only=False) == 0
            u, c = np.unique(b.column("pk").to_numpy(
                zero_copy_only=False).astype(np.int64)[m],
                return_counts=True)
            return pa.table({"pk": pa.array(u),
                             "n_both": pa.array(c.astype(np.int64))})

        pp = pair_inst.map_batches(pk_partial,
                                   batch_format="pyarrow").to_pandas()
        uk, inv = np.unique(pp["pk"].to_numpy(np.int64),
                            return_inverse=True)
        nb = np.bincount(inv, weights=pp["n_both"].to_numpy(np.int64)) \
            .astype(np.int64)
        keep = nb >= int(minsup)
        import ray.data as rd
        pair_counts = rd.from_arrow(pa.table({
            "pk": pa.array(uk[keep]), "n_both": pa.array(nb[keep])}))
    else:
        pair_counts = (pair_inst.filter(expr="kind == 0").groupby("pk")
                       .aggregate(Count(alias_name="n_both"))
                       .filter(expr=f"n_both >= {int(minsup)}"))

    ref = ray.put((pf_parts, pf_counts, int(n_orders)))

    def block_top(b: pa.Table, _r=ref) -> pa.Table:
        parts, np_, nord = ray.get(_r)
        pk = b.column("pk").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nab = b.column("n_both").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pa_, pb_ = pk >> np.int64(32), pk & np.int64((1 << 32) - 1)
        na = np_[np.searchsorted(parts, pa_)]
        nb = np_[np.searchsorted(parts, pb_)]
        lift = (1_000_000 * nab * nord) // (na * nb)
        order = np.lexsort((pb_, pa_, -lift))[:top_n]
        return pa.table({
            "part_a": pa.array(pa_[order]), "part_b": pa.array(pb_[order]),
            "n_both": pa.array(nab[order]), "n_a": pa.array(na[order]),
            "n_b": pa.array(nb[order]), "lift_ppm": pa.array(lift[order])})

    cand = pair_counts.map_batches(block_top, batch_format="pyarrow") \
        .to_pandas()           # blocks x top_n rows only
    cand = cand.sort_values(["lift_ppm", "part_a", "part_b"],
                            ascending=[False, True, True],
                            kind="mergesort").head(top_n) \
        .reset_index(drop=True)
    cand["rk"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    return cand.astype({c: np.int64 for c in cand.columns})


def perceptron_train_langid(sf_dir: str, iters: int = 3):
    """Distributed integer-exact BATCH perceptron (Rosenblatt rule,
    full-batch variant — updates sum over ALL currently-misclassified
    rows, so each iteration is ONE order-independent pass and the run
    is bit-exact under any partitioning, mirrorable in unrolled SQL):

        y      = +1 if lang == 'en' else -1
        x      = (1, n_chars, n_spacewords, n_digits)   (all integer)
        mis_t  = {i : y_i * (w_{t-1} . x_i) <= 0}
        w_t    = w_{t-1} + sum_{i in mis_t} y_i * x_i,   w_0 = 0

    Per iteration: broadcast the 4-int weight vector, one map_batches
    pass emits per-batch partial (n_mis, sum y*x) rows, driver folds
    O(blocks) partials — the kmeans/pagerank superstep profile. Feature
    extraction is Arrow-kernel only (utf8_length, count_substring);
    n_spacewords = spaces + 1 = len(split(' ')), matching the SQL
    string_split convention used across the contract. Emits one row
    per iteration: (iter, n_mis, w_bias, w_chars, w_words, w_digits)
    with n_mis counted at the iteration's ENTRY weights."""
    import ray

    ds = _read(sf_dir, "documents", columns=["lang", "text"]) \
        .materialize()

    def feats(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("text")),
                             pc.is_valid(b.column("lang"))))
        t = b.column("text")
        y = np.where(pc.equal(b.column("lang"), "en").to_numpy(
            zero_copy_only=False), np.int64(1), np.int64(-1))
        x1 = pc.utf8_length(t).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x2 = pc.count_substring(t, " ").to_numpy(zero_copy_only=False) \
            .astype(np.int64) + 1
        x3 = np.zeros(len(y), dtype=np.int64)
        for dch in "0123456789":
            x3 += pc.count_substring(t, dch).to_numpy(
                zero_copy_only=False).astype(np.int64)
        return pa.table({"y": pa.array(y), "x1": pa.array(x1),
                         "x2": pa.array(x2), "x3": pa.array(x3)})

    fx = ds.map_batches(feats, batch_format="pyarrow").materialize()

    w = np.zeros(4, dtype=np.int64)
    rows = []
    for it in range(1, iters + 1):
        ref = ray.put(w)

        def part(b: pa.Table, _r=ref) -> pa.Table:
            wv = ray.get(_r)
            y = b.column("y").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            xs = [np.ones(len(y), dtype=np.int64)] + [
                b.column(c).to_numpy(zero_copy_only=False)
                .astype(np.int64) for c in ("x1", "x2", "x3")]
            score = sum(wv[i] * xs[i] for i in range(4))
            mis = (y * score) <= 0
            ym = y[mis]
            return pa.table({
                "n_mis": pa.array([np.int64(mis.sum())]),
                "u0": pa.array([(ym * xs[0][mis]).sum()]),
                "u1": pa.array([(ym * xs[1][mis]).sum()]),
                "u2": pa.array([(ym * xs[2][mis]).sum()]),
                "u3": pa.array([(ym * xs[3][mis]).sum()])})

        p = fx.map_batches(part, batch_format="pyarrow").to_pandas()
        n_mis = int(p["n_mis"].sum())
        w = w + np.array([int(p[f"u{i}"].sum()) for i in range(4)],
                         dtype=np.int64)
        rows.append((it, n_mis, int(w[0]), int(w[1]), int(w[2]),
                     int(w[3])))
    return pd.DataFrame(rows, columns=[
        "iter", "n_mis", "w_bias", "w_chars", "w_words", "w_digits"]) \
        .astype(np.int64)


def _trade_weighted_edges(sf_dir: str):
    """Symmetric weighted trade edges (src, dst, w int64): w = number of
    DISTINCT ORDERS pairing the customer and supplier (trade intensity,
    not mere adjacency) — distinct (order, pair) triples from one narrow
    groupby folded to per-pair order counts, doubled both directions.
    Shared by the weighted PageRank and s-core trade queries."""
    import ray
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    n_ord = _table_rows(sf_dir, "orders")
    if n_ord is not None and n_ord <= Q3_BROADCAST_CAP:
        odf = orders.to_pandas().sort_values("o_orderkey")
        oref = ray.put((odf["o_orderkey"].to_numpy(np.int64),
                        odf["o_custkey"].to_numpy(np.int64)))

        def trip(b: pa.Table, _o=oref) -> pa.Table:
            ok, oc = ray.get(_o)
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            sk = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if not len(ok):
                return pa.table({"okey": pa.array([], type=pa.int64()),
                                 "ekey": pa.array([], type=pa.int64())})
            p = np.clip(np.searchsorted(ok, lk), 0, len(ok) - 1)
            hit = ok[p] == lk
            ck, sk, lk = oc[p][hit], sk[hit], lk[hit]
            ekey = (ck * 2) << np.int64(32) | (sk * 2 + 1)
            u = np.unique(np.stack([lk, ekey], axis=1), axis=0)
            return pa.table({"okey": pa.array(u[:, 0]),
                             "ekey": pa.array(u[:, 1])})

        trips = li.map_batches(trip, batch_format="pyarrow")
    else:
        est = (li.size_bytes() or 0) + (orders.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))
        joined = li.join(orders, join_type="inner",
                         num_partitions=n_parts,
                         on=("l_orderkey",), right_on=("o_orderkey",))

        def trip_j(b: pa.Table) -> pa.Table:
            ck = b.column("o_custkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            sk = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            ekey = (ck * 2) << np.int64(32) | (sk * 2 + 1)
            u = np.unique(np.stack([lk, ekey], axis=1), axis=0)
            return pa.table({"okey": pa.array(u[:, 0]),
                             "ekey": pa.array(u[:, 1])})

        trips = joined.map_batches(trip_j, batch_format="pyarrow")

    n_li = _table_rows(sf_dir, "lineitem")
    if n_li is not None and n_li <= 10_000_000:
        # triple volume fits the 10M driver-fold bound (the triangle
        # distinct / LPA vote-fold finding): one np.unique over the
        # batch-deduped (okey, ekey) pulls replaces TWO hash groupbys
        td = trips.to_pandas()
        pairs2 = np.unique(np.stack(
            [td["okey"].to_numpy(np.int64),
             td["ekey"].to_numpy(np.int64)], axis=1), axis=0)
        ek, w = np.unique(pairs2[:, 1], return_counts=True)
        w = w.astype(np.int64)
        c, s = ek >> np.int64(32), ek & np.int64((1 << 32) - 1)
        src = np.concatenate([c, s])
        dst = np.concatenate([s, c])
        ww = np.concatenate([w, w])
        # CHUNKED from_arrow: a single-block edge dataset would make
        # every downstream per-superstep edge pass single-threaded
        import ray.data as rd
        n_chunks = max(1, min(32, len(src) // 4096))
        cuts = np.linspace(0, len(src), n_chunks + 1).astype(np.int64)
        return rd.from_arrow([
            pa.table({"src": pa.array(src[a:b]),
                      "dst": pa.array(dst[a:b]),
                      "w": pa.array(ww[a:b])})
            for a, b in zip(cuts[:-1], cuts[1:])])
    else:
        def w_partial(b: pa.Table) -> pa.Table:
            u, c = np.unique(b.column("ekey")
                             .to_numpy(zero_copy_only=False)
                             .astype(np.int64), return_counts=True)
            return pa.table({"ekey": pa.array(u),
                             "wp": pa.array(c.astype(np.int64))})

        weights = (trips.groupby(["okey", "ekey"])
                   .aggregate(Count(alias_name="_n"))
                   .map_batches(w_partial, batch_format="pyarrow")
                   .groupby("ekey").aggregate(Sum("wp", alias_name="w")))

    def unpack(b: pa.Table) -> pa.Table:
        ek = b.column("ekey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        w = b.column("w").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c, s = ek >> np.int64(32), ek & np.int64((1 << 32) - 1)
        return pa.table({
            "src": pa.array(np.concatenate([c, s])),
            "dst": pa.array(np.concatenate([s, c])),
            "w": pa.array(np.concatenate([w, w]))})

    return weights.map_batches(unpack, batch_format="pyarrow")


def weighted_pagerank_trade(sf_dir: str, iters: int = 3):
    """Weighted PageRank over the customer–supplier trade graph
    (_trade_weighted_edges: w = distinct orders pairing the parties).
    The iteration is rayschema.graph.pagerank with ``weight_col`` —
    per-edge floor of pr*w/wout, so every rank bit matches the unrolled
    weighted CTEs. Emits the top-20
    (node_id, node_type, entity_key, pagerank, rk)."""
    from rayschema.graph import pagerank

    pr = pagerank(_trade_weighted_edges(sf_dir), iters=iters,
                  weight_col="w")

    node = pr["node"].to_numpy(np.int64)
    rank = pr["pr"].to_numpy(np.int64)
    order = np.lexsort((node, -rank))[:20]
    node, rank = node[order], rank[order]
    return pd.DataFrame({
        "node_id": node,
        "node_type": np.where(node % 2 == 0, "customer", "supplier"),
        "entity_key": node // 2,
        "pagerank": rank,
        "rk": np.arange(1, len(node) + 1, dtype=np.int64)})


def containment_pairs_documents(sf_dir: str):
    """Directed containment near-dup pairs (quote / subset detection):
    C(src->dst) = |k-grams(src) ∩ k-grams(dst)| / |k-grams(src)| >= 0.8
    over the deterministic doc_id < 300 oracle scope —
    rayschema.dedup.containment_pairs (broadcast subset + streamed pair
    grid, exact integer floor-ppm). Sorted (id_src, id_dst)."""
    from rayschema.dedup import containment_pairs

    cols = ["id_src", "id_dst", "n_inter", "n_src", "cont_ppm"]
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = containment_pairs(ds).to_pandas()
    if out.empty:   # a zero-pair pull can lose the column names
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    return (out.sort_values(["id_src", "id_dst"])
            .reset_index(drop=True)
            .astype({c: np.int64 for c in cols})[cols])


def _jl_signs(dim: int, n_proj: int) -> np.ndarray:
    """Deterministic ±1 Achlioptas-style sign matrix, 1-based (d, k)
    arithmetic both numpy and SQL compute identically:
    +1 iff ((d*2654435761 + k*97) % 1000003) % 2 == 0."""
    d = np.arange(1, dim + 1, dtype=np.int64)[:, None]
    k = np.arange(1, n_proj + 1, dtype=np.int64)[None, :]
    return np.where(((d * 2654435761 + k * 97) % 1000003) % 2 == 0,
                    np.int64(1), np.int64(-1))


def jl_project_embeddings(sf_dir: str, n_proj: int = 8):
    """Signed random projection (Johnson–Lindenstrauss / Achlioptas 2003,
    public) of the 64-dim embeddings onto 8 ±1 directions — the integer
    building block under SimHash and JL sketches. The sign matrix is a
    deterministic arithmetic hash (no RNG state), computed identically
    by numpy and the SQL oracle, so the projection is bit-exact: ONE
    stateless map_batches pass, per batch q = round(vec*1e6) @ S with a
    single int64 matmul (bound: 1e6 · dim < 2^63 — vast headroom).
    Emits (vec_id, p1..p8) for every vector, STREAMING (the result is
    a Dataset — the projection never concentrates anywhere)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def part(b: pa.Table, _n=n_proj) -> pa.Table:
        q = _emb_qmat(b)
        s = _jl_signs(q.shape[1], _n)
        p = q @ s
        cols = {"vec_id": b.column("vec_id")}
        for k in range(_n):
            cols[f"p{k + 1}"] = pa.array(p[:, k])
        return pa.table(cols)

    return ds.map_batches(part, batch_format="pyarrow")


def score_trade_graph(sf_dir: str, k: int = 32, rounds: int = 3):
    """s-core (weighted k-core) of the trade graph: bounded peel on node
    STRENGTH (sum of distinct-order edge weights, _trade_weighted_edges)
    via rayschema.graph.kcore with ``weight_col`` — both-endpoints-alive
    weighted in-degree passes, >= k cut, broadcast/semi-join paths.
    Emits the top-20 survivors by induced strength:
    (node_id, node_type, entity_key, core_strength, rk)."""
    from rayschema.graph import kcore

    core = kcore(_trade_weighted_edges(sf_dir), k=k, rounds=rounds,
                 weight_col="w")
    node = core["node"].to_numpy(np.int64)
    st = core["core_deg"].to_numpy(np.int64)
    order = np.lexsort((node, -st))[:20]
    node, st = node[order], st[order]
    return pd.DataFrame({
        "node_id": node,
        "node_type": np.where(node % 2 == 0, "customer", "supplier"),
        "entity_key": node // 2,
        "core_strength": st,
        "rk": np.arange(1, len(node) + 1, dtype=np.int64)})


def events_ewma_anomaly(sf_dir: str):
    """Exponentially-weighted moving-average anomaly monitor on hourly
    counts PER EVENT TYPE (the smoothing complement of the CUSUM change
    detector): integer milli-unit recurrence with alpha = 1/4,

        e_1 = c_1 * 1000
        e_t = (250 * c_t * 1000 + 750 * e_{t-1}) // 1000
        anomaly_t = [ 2*|c_t*1000 - e_{t-1}| > e_{t-1} ]   (t >= 2)

    — deviation over 50% of the current smoothed level flags, all
    integers, so the DuckDB oracle replays the recurrence with ONE
    recursive CTE partitioned by type. Distribution shape identical to
    events_cusum_change: per-batch (type, hour) bincount partials fold
    on the driver, the sequential scan runs over the metadata-sized
    (types x hours) grid; observed hours only (gap hours are absent on
    both sides by construction). Emits
    (event_type, hour_bucket, n_events, ewma_milli, is_anomaly)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pandas(),
            "hour_bucket": (ts // 3_600_000_000).astype(np.int64)})
        g = df.groupby(["event_type", "hour_bucket"],
                       as_index=False).size()
        return pa.table({
            "event_type": pa.array(g["event_type"]),
            "hour_bucket": pa.array(g["hour_bucket"].to_numpy(np.int64)),
            "n": pa.array(g["size"].to_numpy(np.int64))})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (part.groupby(["event_type", "hour_bucket"], as_index=False)
           ["n"].sum()
           .sort_values(["event_type", "hour_bucket"])
           .reset_index(drop=True))
    out_e, out_a = [], []
    for _, g in agg.groupby("event_type", sort=True):
        e = None
        for c in g["n"]:
            c = int(c)
            if e is None:
                e = c * 1000
                out_a.append(0)
            else:
                out_a.append(1 if 2 * abs(c * 1000 - e) > e else 0)
                e = (250 * c * 1000 + 750 * e) // 1000
            out_e.append(e)
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "hour_bucket": agg["hour_bucket"].astype(np.int64),
        "n_events": agg["n"].astype(np.int64),
        "ewma_milli": np.array(out_e, dtype=np.int64),
        "is_anomaly": np.array(out_a, dtype=np.int64)})


def hapax_ratio_by_source(sf_dir: str):
    """Vocabulary-richness audit: per source, the hapax-legomena share —
    words occurring EXACTLY ONCE within the source (high hapax ratio =
    diverse/long-tail text, low = templated boilerplate). One
    (source, word) count groupby (per-batch Arrow partials, the
    vocabulary_top_words shape), then a stateless per-batch fold to
    (source, n_distinct, n_hapax) partials — each (source, word) row
    exists exactly once post-groupby, so the partials sum exactly;
    driver state is O(sources). Emits
    (source, n_distinct, n_hapax, hapax_ppm) sorted by source."""
    from ray.data.aggregate import Sum

    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("text")),
                             pc.is_valid(b.column("source"))))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "word": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        flat, _, doc_idx = _flatten_words_arrow(col)
        srcs = pc.take(b.column("source"), pa.array(doc_idx))
        g = (pa.table({"source": srcs, "word": flat})
             .group_by(["source", "word"]).aggregate([([], "count_all")]))
        return pa.table({"source": g.column("source"),
                         "word": g.column("word"),
                         "n": g.column("count_all").cast(pa.int64())})

    wc = (ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["source", "word"]).aggregate(Sum("n", alias_name="n")))

    def fold(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": b.column("source").to_pandas(),
            "one": (b.column("n").to_numpy(zero_copy_only=False)
                    .astype(np.int64) == 1).astype(np.int64)})
        g = df.groupby("source", as_index=False).agg(
            d=("one", "size"), h=("one", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    part = wc.map_batches(fold, batch_format="pyarrow").to_pandas()
    out = (part.groupby("source", as_index=False)
           .agg(n_distinct=("d", "sum"), n_hapax=("h", "sum"))
           .sort_values("source").reset_index(drop=True))
    out["hapax_ppm"] = (1_000_000 * out["n_hapax"]) // out["n_distinct"]
    return out.astype({"n_distinct": np.int64, "n_hapax": np.int64,
                       "hapax_ppm": np.int64})


def quantile_normalize_chars(sf_dir: str):
    """Quantile normalization across sources (the classic
    distribution-alignment transform, Bolstad et al. 2003 shape with
    nearest-rank target): every doc's n_chars is replaced by the GLOBAL
    value at its source-relative quantile — doc at within-source rank r
    of n_s maps to the global value at rank ceil(r*N/n_s), ties ordered
    by (n_chars, doc_id) so the mapping is bit-deterministic. Two-phase
    histogram rank (the value_quartile_by_type shape, sources are FEW
    and HOT so a source-keyed group scan would pull whole sources to the
    driver): phase 1 folds (source, chars-bucket) counts into exact
    per-bucket exclusive offsets, per-source totals, and the global
    value-at-rank cumulative (all DOMAIN-bounded: distinct chars values,
    not rows); phase 2 is ONE (source, bucket)-keyed sorted scan ordered
    by (n_chars, doc_id) turning offset + position into the exact rank
    and reading the target value off the broadcast cumulative. Emits
    (doc_id, n_chars, qnorm_chars) per doc."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "source", "n_chars"])
    sources = sorted(s for s in ds.unique("source") if s is not None)
    spos = {s: i for i, s in enumerate(sources)}
    BSHIFT = 6

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("source")),
                             pc.is_valid(b.column("n_chars"))))
        src = b.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        lut = np.array([spos.get(v, -1) for v in
                        enc.dictionary.to_pylist()] + [-1],
                       dtype=np.int64)
        idx = pc.fill_null(enc.indices, len(lut) - 1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sc = lut[idx]
        ch = b.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        t = pa.table({"sc": pa.array(sc),
                      "bucket": pa.array(ch >> BSHIFT),
                      "n_chars": pa.array(ch),
                      "doc_id": b.column("doc_id").cast(pa.int64())})
        return t.filter(pc.greater_equal(t.column("sc"), 0))

    tagged = ds.map_batches(prep, batch_format="pyarrow")

    def hpartial(b: pa.Table) -> pa.Table:
        g = b.group_by(["sc", "n_chars"]).aggregate([([], "count_all")])
        return g.select(['sc', 'n_chars', 'count_all']).rename_columns(["sc", "n_chars", "cnt"])

    hist = (tagged.map_batches(hpartial, batch_format="pyarrow")
            .to_pandas().groupby(["sc", "n_chars"], as_index=False)
            ["cnt"].sum().sort_values(["sc", "n_chars"]))
    scs = hist["sc"].to_numpy(np.int64)
    chs = hist["n_chars"].to_numpy(np.int64)
    cnts = hist["cnt"].to_numpy(np.int64)
    # global value-at-rank cumulative (domain-bounded)
    gdf = (hist.groupby("n_chars", as_index=False)["cnt"].sum()
           .sort_values("n_chars"))
    gvals = gdf["n_chars"].to_numpy(np.int64)
    gcum = np.cumsum(gdf["cnt"].to_numpy(np.int64))
    n_total = int(gcum[-1])
    # per-source totals + per-(sc, bucket) exclusive offsets
    n_src = np.zeros(len(sources), dtype=np.int64)
    np.add.at(n_src, scs, cnts)
    bks = chs >> BSHIFT
    bdf = pd.DataFrame({"sc": scs, "bk": bks, "cnt": cnts}) \
        .groupby(["sc", "bk"], as_index=False)["cnt"].sum() \
        .sort_values(["sc", "bk"])
    bsc = bdf["sc"].to_numpy(np.int64)
    bbk = bdf["bk"].to_numpy(np.int64)
    bcnt = bdf["cnt"].to_numpy(np.int64)
    cum = np.cumsum(bcnt)
    ex = np.concatenate([[0], cum[:-1]])
    first = np.ones(len(bsc), dtype=bool)
    first[1:] = bsc[1:] != bsc[:-1]
    base = np.maximum.accumulate(np.where(first, ex, 0))
    off = ex - base
    packed_s = (bsc << 32) | bbk    # sorted: sc-major, bucket ascending

    def block_fn(block: pa.Table, starts, ends, want):
        sizes = (ends - starts).astype(np.int64)
        sel = np.repeat(want.astype(bool), sizes)
        if not sel.any():
            return None
        seg = np.repeat(starts, sizes)
        pos_in = np.arange(len(seg), dtype=np.int64) - seg
        sc = block.column("sc").to_numpy(zero_copy_only=False)
        bk = block.column("bucket").to_numpy(zero_copy_only=False)
        ch = block.column("n_chars").to_numpy(zero_copy_only=False)
        ids = block.column("doc_id").to_numpy(zero_copy_only=False)
        key = (sc << 32) | bk
        r = off[np.searchsorted(packed_s, key)] + pos_in + 1
        g = (r * n_total + n_src[sc] - 1) // n_src[sc]
        qn = gvals[np.searchsorted(gcum, g, side="left")]
        return pa.table({"doc_id": pa.array(ids[sel]),
                         "n_chars": pa.array(ch[sel]),
                         "qnorm_chars": pa.array(qn[sel])})

    def group_fn(t: pa.Table):
        n = t.num_rows
        return block_fn(t, np.array([0], dtype=np.int64),
                        np.array([n], dtype=np.int64),
                        np.array([True]))

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_chars", pa.int64()),
                            ("qnorm_chars", pa.int64())])
    return sorted_group_scan(tagged, ["sc", "bucket"], group_fn,
                             out_schema, block_fn=block_fn,
                             sort_blocks=32,
                             order_cols=["n_chars", "doc_id"])


def event_burstiness_fano(sf_dir: str):
    """Burstiness audit: the Fano factor (variance-to-mean ratio of
    hourly counts, index-of-dispersion — 1 for a Poisson stream, > 1
    bursty, < 1 regular) per event type, integer-exact with the cleared
    denominator: over a type's observed-hour counts c_1..c_H,
    fano_ppm = floor(1e6 * (H*Σc² - (Σc)²) / (H*Σc)). ONE per-batch
    (type, hour) bincount pass folds on the driver over the
    metadata-sized grid (the CUSUM/EWMA shape). Emits
    (event_type, n_hours, n_events, fano_ppm) sorted by type."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pandas(),
            "hour_bucket": (ts // 3_600_000_000).astype(np.int64)})
        g = df.groupby(["event_type", "hour_bucket"],
                       as_index=False).size()
        return pa.table({
            "event_type": pa.array(g["event_type"]),
            "hour_bucket": pa.array(g["hour_bucket"].to_numpy(np.int64)),
            "n": pa.array(g["size"].to_numpy(np.int64))})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (part.groupby(["event_type", "hour_bucket"], as_index=False)
           ["n"].sum())
    rows = []
    for et, g in agg.groupby("event_type", sort=True):
        c = g["n"].to_numpy(np.int64)
        h, s, s2 = len(c), int(c.sum()), int((c * c).sum())
        fano = (1_000_000 * (h * s2 - s * s)) // (h * s)
        rows.append((et, h, s, int(fano)))
    return pd.DataFrame(rows, columns=["event_type", "n_hours",
                                       "n_events", "fano_ppm"]) \
        .astype({"n_hours": np.int64, "n_events": np.int64,
                 "fano_ppm": np.int64})


BPE_SEP = "\x1f"


def bpe_train_merges(sf_dir: str, rounds: int = 3):
    """The actual iterative BPE trainer (Sennrich et al. 2016, public) —
    extends bpe_top_pairs (round-0 statistics only) to the full merge
    loop: per round, count adjacent TOKEN pairs across the corpus
    weighted by word frequency, merge the (count desc, pair lex asc)
    winner everywhere, repeat. Token sequences are separator-joined
    strings (US = chr(31); merged tokens concatenate WITHOUT the
    separator, so a pair always splits unambiguously) and the merge is
    str.replace — non-overlapping left-to-right, the SAME semantics as
    SQL replace(), so every round mirrors verbatim into unrolled CTEs.

    Distribution shape: word counting is the standard vocabulary-bounded
    distributed groupby; each training round is ONE map_batches pass
    over the (word, c) vocab Dataset (apply the broadcast merge list,
    emit per-batch pair-count partials) + one pair groupby.Sum + a
    per-block top-1 -> blocks x 1 driver merge. Driver state is O(1)
    per round (the winner); the pair table never concentrates. Words of
    length < 2 or containing US are excluded on both sides. Emits one
    row per round: (rnd, merge_left, merge_right, n)."""
    import ray
    from ray.data.aggregate import Sum

    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["text"])

    def wc_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        flat, _, _ = _flatten_words_arrow(col)
        keep = pc.and_(pc.greater_equal(pc.utf8_length(flat), 2),
                       pc.invert(pc.match_substring(flat, BPE_SEP)))
        g = (pa.table({"word": flat.filter(keep)}).group_by(["word"])
             .aggregate([([], "count_all")]))
        return pa.table({"word": g.column("word"),
                         "c": g.column("count_all").cast(pa.int64())})

    vocab = (ds.map_batches(wc_partial, batch_format="pyarrow")
             .groupby("word").aggregate(Sum("c", alias_name="c"))
             ).materialize()

    merges: list = []
    out = []
    for rnd in range(1, rounds + 1):
        mref = ray.put(list(merges))

        def pair_partial(b: pa.Table, _m=mref) -> pa.Table:
            ms = ray.get(_m)
            words = b.column("word").to_pylist()
            cs = b.column("c").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            counts: dict = {}
            for word, c in zip(words, cs):
                seq = BPE_SEP.join(word)
                for a, bb in ms:
                    seq = seq.replace(a + BPE_SEP + bb, a + bb)
                toks = seq.split(BPE_SEP)
                for i in range(len(toks) - 1):
                    p = toks[i] + BPE_SEP + toks[i + 1]
                    counts[p] = counts.get(p, 0) + int(c)
            return pa.table({
                "pair": pa.array(list(counts.keys()), type=pa.string()),
                "n": pa.array(np.fromiter(counts.values(), np.int64,
                                          len(counts)))})

        def block_top1(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            df = pd.DataFrame({
                "pair": b.column("pair").to_pandas(),
                "n": b.column("n").to_numpy(zero_copy_only=False)
                .astype(np.int64)})
            df = df.sort_values(["n", "pair"],
                                ascending=[False, True]).head(1)
            return pa.Table.from_pandas(df, preserve_index=False)

        cand = (vocab.map_batches(pair_partial, batch_format="pyarrow")
                .groupby("pair").aggregate(Sum("n", alias_name="n"))
                .map_batches(block_top1, batch_format="pyarrow")
                .to_pandas())        # blocks x 1 rows
        if cand.empty:
            break
        cand = cand.sort_values(["n", "pair"],
                                ascending=[False, True]).iloc[0]
        a, bb = cand["pair"].split(BPE_SEP)
        merges.append((a, bb))
        out.append((rnd, a, bb, int(cand["n"])))
    return pd.DataFrame(out, columns=["rnd", "merge_left",
                                      "merge_right", "n"]) \
        .astype({"rnd": np.int64, "n": np.int64})


def bfs_hops_trade(sf_dir: str, max_hops: int = 6):
    """BFS hop-distance profile of the symmetric customer–supplier
    trade graph from its smallest node id (the lowest trading customer
    — deterministic and SQL-computable): rayschema.graph.bfs_hops runs
    one frontier-broadcast edge pass per superstep (O(nodes) driver
    state, join path past the cap), and the reached set folds to a
    (hops, node_type) histogram. On a connected bipartite trade graph
    customers sit on even hops and suppliers on odd — the output shape
    the oracle's WITH RECURSIVE walk reproduces exactly. Emits
    (hops, node_type, n_nodes) sorted by hops, node_type."""
    from rayschema.graph import bfs_hops

    pairs = _trade_pair_keys(sf_dir)

    def unpack(b: pa.Table) -> pa.Table:
        ek = b.column("ekey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c, s = ek >> np.int64(32), ek & np.int64((1 << 32) - 1)
        return pa.table({
            "src": pa.array(np.concatenate([c, s])),
            "dst": pa.array(np.concatenate([s, c]))})

    edges = pairs.map_batches(unpack, batch_format="pyarrow")
    dist = bfs_hops(edges, max_hops=max_hops)

    node = dist["node"].to_numpy(np.int64)
    df = pd.DataFrame({
        "hops": dist["hops"].to_numpy(np.int64),
        "node_type": np.where(node % 2 == 0, "customer", "supplier")})
    out = (df.groupby(["hops", "node_type"], as_index=False)
           .size().rename(columns={"size": "n_nodes"}))
    out["n_nodes"] = out["n_nodes"].astype(np.int64)
    return (out.sort_values(["hops", "node_type"])
            .reset_index(drop=True))


MARKOV_SCALE = 10 ** 12


def markov_stationary_events(sf_dir: str, iters: int = 5):
    """Stationary distribution of the first-order user-journey Markov
    chain (PageRank's cousin on the behavioral transition matrix) by
    BOUNDED power iteration in exact scaled integers, so every digit
    mirrors into unrolled SQL CTEs. The transition counts come from
    event_transition_matrix's distributed sorted-group pair scan — the
    only data-sized work; the iteration itself runs on the
    |types|^2-bounded driver matrix (metadata-sized). Contract: states
    are the event types with >= 1 OUTGOING transition; transitions into
    non-states drop and rows keep their kept-mass row totals (the
    recurrent core, stated so the oracle reproduces it); p_0(i) =
    SCALE // n_states and p_{k+1}(j) = sum_i (p_k(i) * n_ij) // r_i
    with the floor PER (i, j) TERM — exactly what
    sum((p.p * c.n) // rt.r) computes in the SQL mirror. Emits one row
    per state: (event_type, stat_p12, rk) — parts-per-10^12 mass after
    ``iters`` supersteps, deterministic (mass desc, type asc) rank."""
    tm = event_transition_matrix(sf_dir)
    if tm.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "stat_p12": pd.Series([], dtype=np.int64),
                             "rk": pd.Series([], dtype=np.int64)})
    states = np.sort(tm["t1"].unique())
    core = tm[tm["t2"].isin(states)]
    rtot = core.groupby("t1")["n"].sum()
    si = {s: i for i, s in enumerate(states)}
    n_s = len(states)
    # (i, j, n, r) triples in arbitrary-precision Python ints: p * n is
    # ~SCALE x count and must not wrap at any corpus size
    trips = [(si[a], si[b], int(n), int(rtot[a]))
             for a, b, n in zip(core["t1"], core["t2"], core["n"])]
    p = [MARKOV_SCALE // n_s] * n_s
    for _ in range(iters):
        q = [0] * n_s
        for i, j, n, r in trips:
            q[j] += (p[i] * n) // r
        p = q
    out = pd.DataFrame({"event_type": states,
                        "stat_p12": np.array(p, dtype=np.int64)})
    out = out.sort_values(["stat_p12", "event_type"],
                          ascending=[False, True]).reset_index(drop=True)
    out["rk"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


AUC_SCALE = 1_000_000


def auc_en_by_chars(sf_dir: str):
    """Model-evaluation primitive: tie-corrected Mann-Whitney AUC of the
    score ``n_chars`` for the label ``lang == 'en'``, per source — how
    well document length separates English from the rest. EXACT in
    integers end to end: ONE map_batches pass folds per-batch
    (source, n_chars) -> (n_pos, n_total) histogram partials through a
    tiny groupby (driver state bounded by the VALUE DOMAIN — sources x
    distinct n_chars — never the row count, the value_gini_by_type
    bound); the closed form over the sorted histogram gives the doubled
    positive rank-sum 2R = sum_v pos_v * (2*e_v + c_v + 1) (e_v = rows
    below value v, c_v = rows at v — the average-rank tie correction
    with the halves cleared), and auc_ppm =
    floor(1e6 * (2R - n_pos*(n_pos+1)) / (2*n_pos*n_neg)) in Python
    big ints. Sources with a degenerate class (n_pos or n_neg = 0)
    drop, mirroring the oracle's HAVING. Emits one row per source:
    (source, n_pos, n_neg, auc_ppm)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "lang", "n_chars"])

    def part(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(b.column("source")),
                            pc.is_valid(b.column("lang"))),
                    pc.is_valid(b.column("n_chars")))
        b = b.filter(m)
        df = pd.DataFrame({
            "source": b.column("source").to_pandas(),
            "v": b.column("n_chars").cast(pa.int64()).to_pandas(),
            "y": pc.equal(b.column("lang"), "en").to_pandas()
            .astype(np.int64)})
        g = (df.groupby(["source", "v"], as_index=False)
             .agg(pos=("y", "sum"), c=("y", "size")))
        return pa.table({"source": pa.array(g["source"]),
                         "v": pa.array(g["v"].to_numpy(np.int64)),
                         "pos": pa.array(g["pos"].to_numpy(np.int64)),
                         "c": pa.array(g["c"].to_numpy(np.int64))})

    hist = (ds.map_batches(part, batch_format="pyarrow")
            .groupby(["source", "v"])
            .aggregate(Sum("pos", alias_name="pos"),
                       Sum("c", alias_name="c"))
            .to_pandas())
    rows = []
    for src, g in hist.groupby("source", sort=True):
        g = g.sort_values("v")
        c = g["c"].to_numpy(np.int64)
        p = g["pos"].to_numpy(np.int64)
        e = np.cumsum(c) - c
        n_pos = int(p.sum())
        n_neg = int(c.sum()) - n_pos
        if n_pos == 0 or n_neg == 0:
            continue
        r2 = sum(int(pv) * (2 * int(ev) + int(cv) + 1)
                 for pv, ev, cv in zip(p, e, c))
        auc_ppm = (AUC_SCALE * (r2 - n_pos * (n_pos + 1))) \
            // (2 * n_pos * n_neg)
        rows.append((src, n_pos, n_neg, int(auc_ppm)))
    return pd.DataFrame(rows, columns=["source", "n_pos", "n_neg",
                                       "auc_ppm"]) \
        .astype({"n_pos": np.int64, "n_neg": np.int64,
                 "auc_ppm": np.int64})


def isotonic_hourly_value(sf_dir: str):
    """Isotonic (monotone non-decreasing) calibration of mean event value
    over hour-of-day — the PAVA fit by its EXACT minimax characterization
    g(i) = max_{j<=i} min_{k>=i} mean(values in hours j..k) (Barlow et
    al. 1972, public). All data-sized work is ONE map_batches pass
    folding per-batch (hour, sum_cents, n) partials to a <=24-row table;
    the minimax runs on the driver over the <=300 contiguous hour
    intervals, with each interval mean floored to integer MICRO-CENTS
    ((1e6 * sum) // cnt) — floor is monotone, so the minimax of floored
    means IS the floored minimax and both sides agree digit for digit.
    Negative values are filtered on BOTH sides (value >= 0) so the
    non-negative means keep DuckDB's truncating // and Python's
    flooring // identical. Emits one row per present hour: (hour,
    n_events, sum_cents, iso_ucents) with iso_ucents non-decreasing in
    hour."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def part(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(b.column("ts")),
                            pc.is_valid(b.column("value"))),
                    pc.greater_equal(pc.coalesce(b.column("value"), -1.0),
                                     0.0))
        b = b.filter(m)
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (ts // 3_600_000_000) % 24
        cents = _cents(b.column("value").to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"hour": hour, "cents": cents})
        g = (df.groupby("hour", as_index=False)
             .agg(s=("cents", "sum"), n=("cents", "size")))
        return pa.table({"hour": pa.array(g["hour"].to_numpy(np.int64)),
                         "s": pa.array(g["s"].to_numpy(np.int64)),
                         "n": pa.array(g["n"].to_numpy(np.int64))})

    part_df = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if part_df.empty:
        return pd.DataFrame({"hour": pd.Series([], dtype=np.int64),
                             "n_events": pd.Series([], dtype=np.int64),
                             "sum_cents": pd.Series([], dtype=np.int64),
                             "iso_ucents": pd.Series([], dtype=np.int64)})
    agg = (part_df.groupby("hour", as_index=False)
           .agg(s=("s", "sum"), n=("n", "sum"))
           .sort_values("hour").reset_index(drop=True))
    s = [int(x) for x in agg["s"]]
    n = [int(x) for x in agg["n"]]
    h = len(s)
    m = {}
    for j in range(h):
        acc_s = acc_n = 0
        for k in range(j, h):
            acc_s += s[k]
            acc_n += n[k]
            m[(j, k)] = (1_000_000 * acc_s) // acc_n
    fit = [max(min(m[(j, k)] for k in range(i, h))
               for j in range(i + 1)) for i in range(h)]
    return pd.DataFrame({
        "hour": agg["hour"].astype(np.int64),
        "n_events": agg["n"].astype(np.int64),
        "sum_cents": agg["s"].astype(np.int64),
        "iso_ucents": np.array(fit, dtype=np.int64)})


SHANNON_TOP_K = 30


def shannon_vocab_codes(sf_dir: str):
    """Tokenizer/storage sizing primitive: Shannon code lengths for the
    top-30 corpus words — per word the smallest integer l with
    count * 2^l >= total_words (= ceil(log2(1/p)), the optimal
    prefix-free code length bound; Shannon 1948, public), plus the
    exact bit cost n * l of coding that word's occurrences. The word
    counts ride the vocabulary_top_words distributed fold (per-batch
    Arrow hash-count partials, one word-bounded groupby); total and the
    bit search are driver arithmetic over the metadata-sized count
    table in Python big ints. Emits (word, n, code_len, bits, rk) for
    the top 30 by (n desc, word asc)."""
    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        flat, _, _ = _flatten_words_arrow(col)
        g = (pa.table({"word": flat}).group_by(["word"])
             .aggregate([([], "count_all")]))
        return pa.table({"word": g.column("word"),
                         "n": g.column("count_all").cast(pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("word").sum("n").to_pandas()
           .rename(columns={"sum(n)": "n"}))
    total = int(agg["n"].sum())
    agg = agg.sort_values(["n", "word"], ascending=[False, True],
                          kind="mergesort").head(SHANNON_TOP_K) \
        .reset_index(drop=True)
    lens = []
    for cnt in agg["n"]:
        cnt = int(cnt)
        l = 0
        while cnt << l < total:
            l += 1
        lens.append(l)
    out = pd.DataFrame({
        "word": agg["word"],
        "n": agg["n"].astype(np.int64),
        "code_len": np.array(lens, dtype=np.int64)})
    out["bits"] = (out["n"] * out["code_len"]).astype(np.int64)
    out["rk"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


RRF_K = 60
RRF_SCALE = 1_000_000_000
RRF_TERMS_A = ("join", "scan")
RRF_TERMS_B = ("hash", "merge")
RRF_LIST_DEPTH = 100
RRF_TOP = 20


def rrf_fuse_keyword_rankings(sf_dir: str):
    """Metasearch fusion: Reciprocal Rank Fusion (Cormack et al. 2009,
    public) of two keyword-frequency document rankings — list A ranks
    docs by total occurrences of {join, scan}, list B by {hash, merge},
    both (tf desc, doc_id asc) so every rank is deterministic. A doc in
    a list's top-100 contributes floor(1e9 / (60 + rank)); fused top-20
    by (score desc, doc_id asc). Distribution: ONE stateless pass
    computes both tf columns (split kernel + two is_in bincounts) and
    emits only each batch's top-100 under EACH ordering (a correct
    partial for a global top-k); the driver merges the bounded
    batches x 200 candidate set, takes the two global top-100s, and
    fuses — no global sort, no all-to-all. Emits (doc_id, rrf_e9,
    rk)."""
    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    terms_a = pa.array(list(RRF_TERMS_A))
    terms_b = pa.array(list(RRF_TERMS_B))

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "tfa": pa.array([], type=pa.int64()),
                          "tfb": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, _, doc_idx = _flatten_words_arrow(col)
        n = b.num_rows
        ma = pc.is_in(flat, value_set=terms_a).to_numpy(
            zero_copy_only=False)
        mb = pc.is_in(flat, value_set=terms_b).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({
            "doc_id": b.column("doc_id").cast(pa.int64()).to_pandas(),
            "tfa": np.bincount(doc_idx[ma], minlength=n).astype(np.int64),
            "tfb": np.bincount(doc_idx[mb], minlength=n).astype(np.int64),
        })
        top_a = df.sort_values(["tfa", "doc_id"], ascending=[False, True],
                               kind="mergesort").head(RRF_LIST_DEPTH)
        top_b = df.sort_values(["tfb", "doc_id"], ascending=[False, True],
                               kind="mergesort").head(RRF_LIST_DEPTH)
        cand = (pd.concat([top_a, top_b])
                .drop_duplicates("doc_id"))
        return pa.Table.from_pandas(cand, preserve_index=False)

    cand = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "rrf_e9": pd.Series([], dtype=np.int64),
                             "rk": pd.Series([], dtype=np.int64)})
    score = {}
    for col in ("tfa", "tfb"):
        top = cand.sort_values([col, "doc_id"], ascending=[False, True],
                               kind="mergesort").head(RRF_LIST_DEPTH)
        for r, did in enumerate(top["doc_id"], start=1):
            score[int(did)] = score.get(int(did), 0) \
                + RRF_SCALE // (RRF_K + r)
    out = pd.DataFrame({"doc_id": np.array(list(score.keys()),
                                           dtype=np.int64),
                        "rrf_e9": np.array(list(score.values()),
                                           dtype=np.int64)})
    out = out.sort_values(["rrf_e9", "doc_id"],
                          ascending=[False, True]).head(RRF_TOP) \
        .reset_index(drop=True)
    out["rk"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def langid_f1_by_class(sf_dir: str):
    """Per-class precision / recall / F1 from the langid confusion
    matrix — the eval table a classifier deployment actually reads.
    All data-sized work is langid_confusion_matrix's stateful-actor
    predict pass + bounded (|langs|^2) count fold; this derives, per
    LABELED class, TP = n(x, x), FP = sum_{l != x} n(l, x),
    FN = sum_{p != x} n(x, p) and the three floor-ppm ratios
    (precision 1e6*TP // (TP+FP), recall 1e6*TP // (TP+FN),
    f1 = 1e6*2TP // (2TP+FP+FN)) in Python big ints — zero denominators
    emit 0, mirroring the oracle's CASE. Emits one row per labeled
    class: (lang, tp, fp, fn, precision_ppm, recall_ppm, f1_ppm)."""
    cm = langid_confusion_matrix(sf_dir)
    if cm.empty:
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in [
            ("lang", object), ("tp", np.int64), ("fp", np.int64),
            ("fn", np.int64), ("precision_ppm", np.int64),
            ("recall_ppm", np.int64), ("f1_ppm", np.int64)]})
    labels = np.sort(cm["lang"].unique())
    rows = []
    for x in labels:
        tp = int(cm.loc[(cm["lang"] == x) & (cm["lang_pred"] == x),
                        "n"].sum())
        fp = int(cm.loc[(cm["lang"] != x) & (cm["lang_pred"] == x),
                        "n"].sum())
        fn = int(cm.loc[(cm["lang"] == x) & (cm["lang_pred"] != x),
                        "n"].sum())
        prec = (1_000_000 * tp) // (tp + fp) if tp + fp else 0
        rec = (1_000_000 * tp) // (tp + fn) if tp + fn else 0
        f1 = (2_000_000 * tp) // (2 * tp + fp + fn) \
            if 2 * tp + fp + fn else 0
        rows.append((x, tp, fp, fn, prec, rec, f1))
    return pd.DataFrame(rows, columns=["lang", "tp", "fp", "fn",
                                       "precision_ppm", "recall_ppm",
                                       "f1_ppm"]) \
        .astype({c: np.int64 for c in ["tp", "fp", "fn", "precision_ppm",
                                       "recall_ppm", "f1_ppm"]})


def simpson_diversity_by_source(sf_dir: str):
    """Label-diversity audit: Simpson's diversity index of the lang mix
    within each source, exact — D_ppm = 1e6 - floor(1e6 *
    sum_i n_i(n_i-1) / (N(N-1))), the probability two random docs from
    the source differ in lang. Per-batch (source, lang) count partials
    fold through one bounded groupby; the index is driver arithmetic
    over the |sources| x |langs| table in Python big ints. Sources with
    N < 2 drop (the index is undefined), mirroring the oracle's
    HAVING. Emits (source, n_docs, simpson_ppm)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def part(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("source")),
                    pc.is_valid(b.column("lang")))
        t = b.filter(m).select(["source", "lang"])
        g = t.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return pa.table({"source": g.column("source"),
                         "lang": g.column("lang"),
                         "n": g.column("count_all").cast(pa.int64())})

    agg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby(["source", "lang"])
           .aggregate(Sum("n", alias_name="n")).to_pandas())
    rows = []
    for src, g in agg.groupby("source", sort=True):
        n_tot = int(g["n"].sum())
        if n_tot < 2:
            continue
        same = sum(int(c) * (int(c) - 1) for c in g["n"])
        ppm = 1_000_000 - (1_000_000 * same) // (n_tot * (n_tot - 1))
        rows.append((src, n_tot, ppm))
    return pd.DataFrame(rows,
                        columns=["source", "n_docs", "simpson_ppm"]) \
        .astype({"n_docs": np.int64, "simpson_ppm": np.int64})


COVERAGE_ROUNDS = 5


def coverage_select_documents(sf_dir: str):
    """Diversity-maximizing curation: GREEDY facility-location selection
    of 5 documents maximizing cumulative distinct-word coverage
    (the 1-1/e guarantee greedy; Nemhauser et al. 1978, public). Each
    round is ONE stateless corpus pass: the covered word set (bounded
    by the words of <= 5 picked docs) broadcasts via ray.put, each
    batch scores every unpicked doc's marginal gain (#distinct words
    not yet covered — one split kernel + is_in) and emits only its
    top-1 (gain desc, doc_id asc) WITH that doc's uncovered words, so
    the driver merges #batches candidate rows, crowns the global winner
    and extends the covered set without re-reading any text. Ties at
    gain 0 still pick min doc_id, mirroring the unrolled SQL. Below
    EXACT_DEDUP_INPROC_CAP corpus rows (parquet-footer gated) all
    rounds run in-process off ONE table pull and one word
    factorization — 1 execution instead of 5; the per-round stateless
    corpus pass stays the design at scale. Emits (round, doc_id,
    gain)."""
    import ray

    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    n_docs_cap = _table_rows(sf_dir, "documents")
    if n_docs_cap is not None and n_docs_cap <= EXACT_DEDUP_INPROC_CAP:
        t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
        t = t.filter(pc.is_valid(t.column("text")))
        ids = t.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, _, doc_idx = _flatten_words_arrow(col)
        wdf = pd.DataFrame({
            "i": doc_idx,
            "w": flat.to_numpy(zero_copy_only=False)}).drop_duplicates()
        codes, uniq = pd.factorize(wdf["w"], sort=False)
        di = wdf["i"].to_numpy()
        covered_m = np.zeros(len(uniq), dtype=bool)
        picked_m = np.zeros(t.num_rows, dtype=bool)
        out = []
        for rnd in range(1, COVERAGE_ROUNDS + 1):
            if t.num_rows == 0 or picked_m.all():
                break
            new = ~covered_m[codes] if len(codes) else \
                np.zeros(0, dtype=bool)
            gain = np.bincount(di[new], minlength=t.num_rows) \
                .astype(np.int64)
            # picked docs leave the candidate pool entirely (the
            # distributed scan's ~isin filter)
            gain_adj = np.where(picked_m, np.int64(-1), gain)
            best = int(np.lexsort((ids, -gain_adj))[0])
            out.append((rnd, int(ids[best]), int(gain[best])))
            picked_m[best] = True
            if len(codes):
                covered_m[codes[di == best]] = True
        return pd.DataFrame(out, columns=["round", "doc_id", "gain"]) \
            .astype({"round": np.int64, "doc_id": np.int64,
                     "gain": np.int64})

    def make_scan(cov_ref, picked_ref):
        def scan(b: pa.Table) -> pa.Table:
            covered, picked = ray.get(cov_ref), ray.get(picked_ref)
            b = b.filter(pc.is_valid(b.column("text")))
            empty = pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "gain": pa.array([], type=pa.int64()),
                "words": pa.array([], type=pa.list_(pa.string()))})
            if b.num_rows == 0:
                return empty
            ids = b.column("doc_id").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            keep = ~np.isin(ids, picked)
            if not keep.any():
                return empty
            b = b.filter(pa.array(keep))
            ids = ids[keep]
            col = b.column("text")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat, _, doc_idx = _flatten_words_arrow(col)
            # distinct (doc, word): drop duplicate words within a doc
            wdf = pd.DataFrame({"i": doc_idx,
                                "w": flat.to_numpy(zero_copy_only=False)})
            wdf = wdf.drop_duplicates()
            new = ~wdf["w"].isin(covered).to_numpy()
            gain = np.bincount(wdf["i"].to_numpy()[new],
                               minlength=b.num_rows).astype(np.int64)
            best = np.lexsort((ids, -gain))[0]
            wmask = new & (wdf["i"].to_numpy() == best)
            ws = wdf["w"].to_numpy()[wmask].tolist()
            return pa.table({
                "doc_id": pa.array([ids[best]], type=pa.int64()),
                "gain": pa.array([gain[best]], type=pa.int64()),
                "words": pa.array([ws], type=pa.list_(pa.string()))})
        return scan

    covered: set = set()
    picked: list = []
    out = []
    for rnd in range(1, COVERAGE_ROUNDS + 1):
        cov_ref = ray.put(pd.Series(sorted(covered), dtype=object))
        picked_ref = ray.put(np.array(picked, dtype=np.int64))
        cand = (ds.map_batches(make_scan(cov_ref, picked_ref),
                               batch_format="pyarrow").to_pandas())
        if cand.empty:
            break
        cand = cand.sort_values(["gain", "doc_id"],
                                ascending=[False, True],
                                kind="mergesort")
        win = cand.iloc[0]
        out.append((rnd, int(win["doc_id"]), int(win["gain"])))
        picked.append(int(win["doc_id"]))
        covered.update(win["words"])
    return pd.DataFrame(out, columns=["round", "doc_id", "gain"]) \
        .astype({"round": np.int64, "doc_id": np.int64,
                 "gain": np.int64})


def dup_cross_source_matrix(sf_dir: str):
    """Duplicate-provenance audit: for every unordered source pair, how
    many DISTINCT texts occur verbatim in both — where the dup mass
    actually flows between feeds. Below EXACT_DEDUP_INPROC_CAP corpus
    rows (parquet-footer gated) the whole audit is one in-process
    GROUP BY text over a single table pull — the exact-dedup inproc
    discipline. Scale path mirrors _exact_dedup_core:
    stage 1 shuffles only (text_hash, source) distinct pairs (narrow
    rows) and marks hashes seen under >= 2 sources in a fixed 2 MB
    hashed bitmap; stage 2 sort-groups ONLY the candidate rows (dup-
    mass-sized, the exact-dedup verify acceptance) by hash with their
    texts and emits per-DISTINCT-TEXT source pairs — a 64-bit collision
    between different texts is therefore harmless, exactly as in
    exact dedup. The final matrix is |sources|^2-bounded. Emits
    (src_a, src_b, n_texts) with src_a < src_b."""
    import ray
    from ray.data.aggregate import Count, Sum

    from rayschema.dedup import (_bitmap_hash, _bitmap_member,
                                 sorted_group_scan)
    from rayschema.sketches import hash64

    BM_BITS = 24
    ds = _read(sf_dir, "documents", columns=["text", "source"])

    def _text_source_pairs(tdf):
        # per-DISTINCT-TEXT unordered source pairs — the ONE pair
        # kernel both the in-process and distributed plans go through
        rows = []
        for _, tg in tdf.groupby("text", sort=False):
            srcs = sorted(tg["source"].unique())
            for i in range(len(srcs)):
                for j in range(i + 1, len(srcs)):
                    rows.append((srcs[i], srcs[j]))
        return rows

    n_docs_cap = _table_rows(sf_dir, "documents")
    if n_docs_cap is not None and n_docs_cap <= EXACT_DEDUP_INPROC_CAP:
        df = ds.to_pandas().dropna(subset=["text", "source"])
        pairs = df.drop_duplicates()          # distinct (text, source)
        nsrc = pairs.groupby("text", sort=False)["source"].transform("size")
        rows = _text_source_pairs(pairs[nsrc >= 2])
        if not rows:
            return pd.DataFrame({
                "src_a": pd.Series([], dtype=object),
                "src_b": pd.Series([], dtype=object),
                "n_texts": pd.Series([], dtype=np.int64)})
        out = (pd.DataFrame(rows, columns=["src_a", "src_b"])
               .groupby(["src_a", "src_b"], as_index=False).size()
               .rename(columns={"size": "n_texts"}))
        out["n_texts"] = out["n_texts"].astype(np.int64)
        return out.sort_values(["src_a", "src_b"]).reset_index(drop=True)

    def pair_partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("text")),
                    pc.is_valid(b.column("source")))
        b = b.filter(m)
        df = pd.DataFrame({"source": b.column("source").to_pandas(),
                           "text": b.column("text").to_pandas()})
        df["uk"] = hash64(df["text"].to_numpy()).view(np.int64)
        g = df[["uk", "source"]].drop_duplicates()
        return pa.table({"uk": pa.array(g["uk"].to_numpy(np.int64)),
                         "source": pa.array(g["source"])})

    multi = (ds.map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["uk", "source"])
             .aggregate(Count("uk", alias_name="nn"))
             .groupby("uk")
             .aggregate(Count("uk", alias_name="n_src"))
             .filter(expr="n_src >= 2").select_columns(["uk"]))

    def bm_partial(b: pa.Table) -> pa.Table:
        uks = b.column("uk").to_numpy(zero_copy_only=False)
        m = np.zeros(1 << BM_BITS, dtype=bool)
        m[_bitmap_hash(uks, BM_BITS)] = True
        return pa.table({"chunk": pa.array(
            [np.packbits(m).tobytes()], type=pa.large_binary())})

    acc = np.zeros((1 << BM_BITS) // 8, dtype=np.uint8)
    chunks = multi.map_batches(bm_partial,
                               batch_format="pyarrow").to_pandas()
    for chunk in (chunks["chunk"] if "chunk" in chunks.columns else ()):
        acc |= np.frombuffer(chunk, dtype=np.uint8)
    empty = pd.DataFrame({"src_a": pd.Series([], dtype=object),
                          "src_b": pd.Series([], dtype=object),
                          "n_texts": pd.Series([], dtype=np.int64)})
    if not acc.any():
        return empty
    bm_ref = ray.put(acc)

    def cand_filter(b: pa.Table, _ref=bm_ref) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("text")),
                    pc.is_valid(b.column("source")))
        b = b.filter(m)
        uk = hash64(b.column("text").to_numpy(zero_copy_only=False)) \
            .view(np.int64)
        hit = _bitmap_member(uk, ray.get(_ref), BM_BITS)
        b = b.filter(pa.array(hit))
        return b.append_column("uk", pa.array(uk[hit]))

    out_schema = pa.schema([("src_a", pa.string()),
                            ("src_b", pa.string()),
                            ("n", pa.int64())])

    def group_fn(g: pa.Table) -> pa.Table:
        df = pd.DataFrame({"text": g.column("text").to_pandas(),
                           "source": g.column("source").to_pandas()}) \
            .drop_duplicates()
        rows = _text_source_pairs(df)
        if not rows:
            return None
        p = pd.DataFrame(rows, columns=["src_a", "src_b"]) \
            .groupby(["src_a", "src_b"], as_index=False).size()
        return pa.table({"src_a": pa.array(p["src_a"]),
                         "src_b": pa.array(p["src_b"]),
                         "n": pa.array(p["size"].to_numpy(np.int64))})

    scan = sorted_group_scan(
        ds.map_batches(cand_filter, batch_format="pyarrow"), ["uk"],
        group_fn, out_schema,
        group_filter=lambda b, s, e: (e - s) >= 2)
    res = scan.to_pandas()
    if res.empty:
        return empty
    out = (res.groupby(["src_a", "src_b"], as_index=False)["n"].sum()
           .rename(columns={"n": "n_texts"}))
    out["n_texts"] = out["n_texts"].astype(np.int64)
    return out.sort_values(["src_a", "src_b"]).reset_index(drop=True)


KS_SRC_A = "src0"
KS_SRC_B = "src1"


def ks_chars_two_sources(sf_dir: str):
    """Exact two-sample Kolmogorov-Smirnov distance between the n_chars
    distributions of two named sources — the distribution-drift test
    with the supremum taken EXACTLY: over the pooled distinct values,
    D_num = max |n_b * cumA(v) - n_a * cumB(v)| in cleared-denominator
    integers (D = D_num / (n_a * n_b)). ONE map_batches pass folds
    per-batch (value, count_a, count_b) histogram partials through a
    domain-bounded groupby (the value_gini_by_type bound); the cumsum
    sweep is driver arithmetic in Python big ints. Emits ONE row
    (n_a, n_b, d_num, ks_ppm); empty if either source is absent."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def part(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("n_chars")),
                    pc.is_in(b.column("source"),
                             value_set=pa.array([KS_SRC_A, KS_SRC_B])))
        b = b.filter(m)
        df = pd.DataFrame({
            "v": b.column("n_chars").cast(pa.int64()).to_pandas(),
            "a": pc.equal(b.column("source"), KS_SRC_A).to_pandas()
            .astype(np.int64)})
        g = (df.groupby("v", as_index=False)
             .agg(ca=("a", "sum"), n=("a", "size")))
        return pa.table({"v": pa.array(g["v"].to_numpy(np.int64)),
                         "ca": pa.array(g["ca"].to_numpy(np.int64)),
                         "cb": pa.array((g["n"] - g["ca"])
                                        .to_numpy(np.int64))})

    hist = (ds.map_batches(part, batch_format="pyarrow")
            .groupby("v")
            .aggregate(Sum("ca", alias_name="ca"),
                       Sum("cb", alias_name="cb"))
            .to_pandas().sort_values("v"))
    empty = pd.DataFrame({"n_a": pd.Series([], dtype=np.int64),
                          "n_b": pd.Series([], dtype=np.int64),
                          "d_num": pd.Series([], dtype=np.int64),
                          "ks_ppm": pd.Series([], dtype=np.int64)})
    if hist.empty:
        return empty
    na = int(hist["ca"].sum())
    nb = int(hist["cb"].sum())
    if na == 0 or nb == 0:
        return empty
    cum_a = cum_b = 0
    d_num = 0
    for ca, cb in zip(hist["ca"], hist["cb"]):
        cum_a += int(ca)
        cum_b += int(cb)
        d_num = max(d_num, abs(nb * cum_a - na * cum_b))
    return pd.DataFrame({
        "n_a": [na], "n_b": [nb], "d_num": [d_num],
        "ks_ppm": [(1_000_000 * d_num) // (na * nb)]}) \
        .astype(np.int64)


def ppr_trade_graph(sf_dir: str, iters: int = 4):
    """PERSONALIZED PageRank from the lowest customer node — the
    similar-entities / recommendation primitive (random walk with
    restart at one seed): rayschema.graph.pagerank with ``seed`` set,
    so pr_0 puts all mass on the seed and the 15% teleport returns
    there every superstep, in the same integer ppb fixed-point as the
    global ranks (floors per edge, mirrorable CTE for CTE). The seed is
    (min ekey) >> 32 — the packed key's high word, i.e. min customer
    node — computed by one tiny Min aggregate. Emits the top-15
    (node_id, node_type, entity_key, ppr, rk)."""
    from ray.data.aggregate import Min

    from rayschema.graph import pagerank

    pairs = _trade_pair_keys(sf_dir).materialize()
    mn = pairs.aggregate(Min("ekey"))["min(ekey)"]
    empty = pd.DataFrame({
        "node_id": pd.Series([], dtype=np.int64),
        "node_type": pd.Series([], dtype=object),
        "entity_key": pd.Series([], dtype=np.int64),
        "ppr": pd.Series([], dtype=np.int64),
        "rk": pd.Series([], dtype=np.int64)})
    if mn is None:
        return empty
    seed = int(mn) >> 32

    def unpack(b: pa.Table) -> pa.Table:
        ek = b.column("ekey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c, s = ek >> np.int64(32), ek & np.int64((1 << 32) - 1)
        return pa.table({
            "src": pa.array(np.concatenate([c, s])),
            "dst": pa.array(np.concatenate([s, c]))})

    edges = pairs.map_batches(unpack, batch_format="pyarrow")
    pr = pagerank(edges, iters=iters, seed=seed)
    node = pr["node"].to_numpy(np.int64)
    rank = pr["pr"].to_numpy(np.int64)
    order = np.lexsort((node, -rank))[:15]
    node, rank = node[order], rank[order]
    return pd.DataFrame({
        "node_id": node,
        "node_type": np.where(node % 2 == 0, "customer", "supplier"),
        "entity_key": node // 2,
        "ppr": rank,
        "rk": np.arange(1, len(node) + 1, dtype=np.int64)})


def readability_fk_documents(sf_dir: str):
    """Flesch-Kincaid grade level per document as an EXACT RATIONAL —
    grade = (39*W^2 + 1180*Y*S - 1559*S*W) / (100*S*W) with W = words
    (space-split), S = sentence runs of [.!?] clamped >= 1, Y = vowel
    runs (the public FK formula 0.39 W/S + 11.8 Y/W - 15.59 cleared to
    one numerator/denominator pair, so NO division happens and no
    float/floor semantics can diverge; consumers divide when they want
    the float). ONE stateless Arrow pass: three count kernels per
    batch, no shuffle. Emits (doc_id, n_words, n_sentences,
    n_vowel_runs, fk_num, fk_den) for non-empty texts."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def part(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("text")),
                    pc.greater(pc.utf8_length(
                        pc.coalesce(b.column("text"), "")), 0))
        b = b.filter(m)
        t = b.column("text")
        w = pc.add(pc.count_substring(t, pattern=" "), 1) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        s = pc.count_substring_regex(t, pattern=r"[.!?]+") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        s = np.maximum(s, 1)
        y = pc.count_substring_regex(t, pattern=r"(?i)[aeiouy]+") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        num = 39 * w * w + 1180 * y * s - 1559 * s * w
        return pa.table({
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "n_words": pa.array(w),
            "n_sentences": pa.array(s),
            "n_vowel_runs": pa.array(y),
            "fk_num": pa.array(num),
            "fk_den": pa.array(100 * s * w)})

    return ds.map_batches(part, batch_format="pyarrow")


HOLT_SCALE = 1000


def _trunc_div(a: int, b: int) -> int:
    """SQL-style integer division truncating toward zero (DuckDB //
    on a possibly-negative numerator), vs Python's flooring //."""
    q = abs(a) // b
    return q if a >= 0 else -q


def holt_forecast_events(sf_dir: str):
    """Holt double-exponential (level + trend) forecast of hourly event
    counts per type — the trend-aware sibling of the EWMA monitor, in
    exact milli-units with alpha = beta = 1/2 and SQL-truncating
    division (toward zero — trends go negative, so the Python fold
    emulates DuckDB's // exactly):

        l_1 = c_1 * 1000,  b_1 = (c_2 - c_1) * 1000
        l_t = trunc((c_t * 1000 + l_{t-1} + b_{t-1}) / 2)
        b_t = trunc((l_t - l_{t-1} + b_{t-1}) / 2)

    over each type's PRESENT hour buckets in order (gap hours absent on
    both sides, the events_ewma_anomaly convention); the one-step-ahead
    forecast is l_T + b_T. Distribution identical to EWMA: per-batch
    (type, hour) bincount partials, sequential fold over the bounded
    types x hours grid on the driver. Types with < 2 observed hours
    drop. Emits (event_type, n_hours, level_milli, trend_milli,
    forecast_milli)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pandas(),
            "hour_bucket": (ts // 3_600_000_000).astype(np.int64)})
        g = df.groupby(["event_type", "hour_bucket"],
                       as_index=False).size()
        return pa.table({
            "event_type": pa.array(g["event_type"]),
            "hour_bucket": pa.array(g["hour_bucket"].to_numpy(np.int64)),
            "n": pa.array(g["size"].to_numpy(np.int64))})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if part.empty:
        return pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "n_hours": pd.Series([], dtype=np.int64),
            "level_milli": pd.Series([], dtype=np.int64),
            "trend_milli": pd.Series([], dtype=np.int64),
            "forecast_milli": pd.Series([], dtype=np.int64)})
    agg = (part.groupby(["event_type", "hour_bucket"], as_index=False)
           ["n"].sum()
           .sort_values(["event_type", "hour_bucket"])
           .reset_index(drop=True))
    rows = []
    for et, g in agg.groupby("event_type", sort=True):
        cs = [int(x) for x in g["n"]]
        if len(cs) < 2:
            continue
        lv = cs[0] * HOLT_SCALE
        tr = (cs[1] - cs[0]) * HOLT_SCALE
        for c in cs[1:]:
            lv_new = _trunc_div(c * HOLT_SCALE + lv + tr, 2)
            tr = _trunc_div(lv_new - lv + tr, 2)
            lv = lv_new
        rows.append((et, len(cs), lv, tr, lv + tr))
    return pd.DataFrame(rows, columns=["event_type", "n_hours",
                                       "level_milli", "trend_milli",
                                       "forecast_milli"]) \
        .astype({c: np.int64 for c in ["n_hours", "level_milli",
                                       "trend_milli", "forecast_milli"]})


def join_fanout_histogram(sf_dir: str):
    """Join-cardinality audit: the distribution of lineitem children per
    order — the fan-out histogram that predicts join blow-up before you
    run the join. Per-batch orderkey bincount partials fold through one
    narrow groupby to (orderkey, n_children) — 16 B rows — then a
    SECOND bounded groupby histograms the counts (driver state = max
    fanout, single digits here); childless orders land in the fanout-0
    bucket via two scalar counts (total orders - matched orders), never
    an anti-join. Emits (fanout, n_orders)."""
    from ray.data.aggregate import Count, Sum

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def part(b: pa.Table) -> pa.Table:
        k = b.column("l_orderkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        u, c = np.unique(k, return_counts=True)
        return pa.table({"k": pa.array(u), "n": pa.array(
            c.astype(np.int64))})

    n_orders_total = _table_rows(sf_dir, "orders")
    if n_orders_total is not None and n_orders_total <= 10_000_000:
        # orderkey-clustered batches make the per-batch partials roughly
        # orders-sized, and orders are under the shared 10M driver-fold
        # cap: one np.unique/bincount fold replaces BOTH groupby shuffles
        parts = li.map_batches(part, batch_format="pyarrow").to_pandas()
        u, inv = np.unique(parts["k"].to_numpy(np.int64),
                           return_inverse=True)
        per = np.bincount(inv, weights=parts["n"].to_numpy(np.int64)) \
            .astype(np.int64)
        fu, fc = np.unique(per, return_counts=True)
        hist = pd.DataFrame({"fanout": fu.astype(np.int64),
                             "n_orders": fc.astype(np.int64)})
    else:
        per_key = (li.map_batches(part, batch_format="pyarrow")
                   .groupby("k").aggregate(Sum("n", alias_name="n")))

        def hist_part(b: pa.Table) -> pa.Table:
            u, c = np.unique(b.column("n").to_numpy(zero_copy_only=False),
                             return_counts=True)
            return pa.table({"fanout": pa.array(u.astype(np.int64)),
                             "n_orders": pa.array(c.astype(np.int64))})

        # the fanout histogram is a bounded dimension — fold the per-block
        # partials on the driver instead of a second groupby
        hp = (per_key.map_batches(hist_part, batch_format="pyarrow")
              .to_pandas())
        hist = hp.groupby("fanout", as_index=False)["n_orders"].sum()
    if n_orders_total is None:
        n_orders_total = _read(sf_dir, "orders",
                               columns=["o_orderkey"]).count()
    matched = int(hist["n_orders"].sum())
    if n_orders_total - matched > 0:
        hist = pd.concat([pd.DataFrame(
            {"fanout": [0], "n_orders": [n_orders_total - matched]}),
            hist])
    hist["fanout"] = hist["fanout"].astype(np.int64)
    hist["n_orders"] = hist["n_orders"].astype(np.int64)
    return hist.sort_values("fanout").reset_index(drop=True)


def seasonal_index_by_type(sf_dir: str):
    """Hour-of-day seasonality index per event type: how far each hour's
    traffic sits above/below the type's uniform share, exact —
    idx_ppm = floor(1e6 * 24 * n_th / n_t) (1e6 x the ratio of observed
    to uniform-across-24-hours mass; 1,000,000 = exactly flat). One
    bounded (types x 24) groupby over per-batch bincount partials;
    driver does the ppm division in Python big ints. Emits
    (event_type, hour, n_events, idx_ppm)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def part(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pandas(),
            "hour": ((ts // 3_600_000_000) % 24).astype(np.int64)})
        g = df.groupby(["event_type", "hour"], as_index=False).size()
        return pa.table({
            "event_type": pa.array(g["event_type"]),
            "hour": pa.array(g["hour"].to_numpy(np.int64)),
            "n": pa.array(g["size"].to_numpy(np.int64))})

    agg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby(["event_type", "hour"])
           .aggregate(Sum("n", alias_name="n")).to_pandas())
    if agg.empty:
        return pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "hour": pd.Series([], dtype=np.int64),
            "n_events": pd.Series([], dtype=np.int64),
            "idx_ppm": pd.Series([], dtype=np.int64)})
    tot = agg.groupby("event_type")["n"].sum()
    agg = agg.sort_values(["event_type", "hour"]).reset_index(drop=True)
    agg["idx_ppm"] = np.array(
        [(24_000_000 * int(n)) // int(tot[t])
         for t, n in zip(agg["event_type"], agg["n"])], dtype=np.int64)
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "hour": agg["hour"].astype(np.int64),
        "n_events": agg["n"].astype(np.int64),
        "idx_ppm": agg["idx_ppm"]})


def q11_important_stock(sf_dir: str):
    """TPC-H-Q11-shaped important-stock scan (no partsupp in the corpus,
    so 'stock value' = sum of cents(extendedprice) x floor(quantity)
    over NATION_1-supplied lineitems — Q11's join/threshold shape on
    the fact table): parts whose national supply value exceeds 1/1000
    of the national total. The NATION_1 supplier key set broadcasts
    (metadata-sized); per-batch (partkey, value) partials fold through
    one narrow groupby; the total is one Sum aggregate broadcast into a
    distributed threshold filter, so only the few survivors reach the
    driver for ranking. Emits (l_partkey, value_cq, rk) by
    (value desc, partkey asc)."""
    import ray
    from ray.data.aggregate import Sum

    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    nk = set(nation.loc[nation["n_name"] == "NATION_1", "n_nationkey"]
             .astype(np.int64))
    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey"]).to_pandas()
    ks = np.sort(sup.loc[sup["s_nationkey"].astype(np.int64).isin(nk),
                         "s_suppkey"].to_numpy(np.int64))
    empty = pd.DataFrame({"l_partkey": pd.Series([], dtype=np.int64),
                          "value_cq": pd.Series([], dtype=np.int64),
                          "rk": pd.Series([], dtype=np.int64)})
    if len(ks) == 0:
        return empty
    ref = ray.put(ks)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity",
                        "l_extendedprice"])

    def part(b: pa.Table, _ref=ref) -> pa.Table:
        keys = ray.get(_ref)
        sk = b.column("l_suppkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(keys, sk), 0, len(keys) - 1)
        hit = keys[pos] == sk
        b = b.filter(pa.array(hit))
        price = _cents(b.column("l_extendedprice")
                       .to_numpy(zero_copy_only=False))
        qty = np.floor(b.column("l_quantity")
                       .to_numpy(zero_copy_only=False)).astype(np.int64)
        df = pd.DataFrame({
            "l_partkey": b.column("l_partkey").cast(pa.int64())
            .to_pandas(),
            "v": price * qty})
        g = df.groupby("l_partkey", as_index=False)["v"].sum()
        return pa.table({"l_partkey": pa.array(
            g["l_partkey"].to_numpy(np.int64)),
            "v": pa.array(g["v"].to_numpy(np.int64))})

    per_part = (li.map_batches(part, batch_format="pyarrow")
                .groupby("l_partkey")
                .aggregate(Sum("v", alias_name="v"))
                .materialize())
    tot = per_part.aggregate(Sum("v"))["sum(v)"]
    if not tot:
        return empty

    def thresh(b: pa.Table, _t=int(tot)) -> pa.Table:
        v = b.column("v").to_numpy(zero_copy_only=False)
        # int64 * 1000 can overflow at extreme scale: object-int compare
        keep = np.array([1000 * int(x) > _t for x in v], dtype=bool)
        return b.filter(pa.array(keep))

    surv = per_part.map_batches(thresh,
                                batch_format="pyarrow").to_pandas()
    if surv.empty:
        return empty
    surv = surv.sort_values(["v", "l_partkey"],
                            ascending=[False, True],
                            kind="mergesort").reset_index(drop=True)
    return pd.DataFrame({
        "l_partkey": surv["l_partkey"].astype(np.int64),
        "value_cq": surv["v"].astype(np.int64),
        "rk": np.arange(1, len(surv) + 1, dtype=np.int64)})


Q16_SIZES = (1, 5, 9, 14, 23, 36, 45, 49)
Q16_EXCLUDED_BRAND = "Brand#13"


def q16_supplier_cnt(sf_dir: str):
    """TPC-H-Q16-shaped supplier-count rollup: DISTINCT suppliers able
    to supply each (brand, type, size) combination — brand != Brand#13,
    size in the 8-value Q16 set, suppliers 'with complaints' modeled as
    s_acctbal < 0 (the corpus has no comment column). The part-supplier
    relation is the distinct (l_partkey, l_suppkey) projection of
    lineitem (the q2/q9 convention); part dims and the bad-supplier set
    broadcast sorted (dimension-sized, the q9 pattern); per-batch
    distinct (brand, type, size, suppkey) partials dedup through one
    narrow groupby; the final count table is bounded by
    |brands| x |types| x 8. Emits (p_brand, p_type, p_size,
    supplier_cnt) by (cnt desc, brand, type, size)."""
    import ray
    from ray.data.aggregate import Count

    pt = _read(sf_dir, "part",
               columns=["p_partkey", "p_brand", "p_type", "p_size"]) \
        .to_pandas()
    pt = pt[(pt["p_brand"] != Q16_EXCLUDED_BRAND)
            & (pt["p_size"].astype(np.int64).isin(Q16_SIZES))] \
        .sort_values("p_partkey")
    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_acctbal"]).to_pandas()
    bad = np.sort(sup.loc[sup["s_acctbal"] < 0, "s_suppkey"]
                  .to_numpy(np.int64))
    ref = ray.put((pt["p_partkey"].to_numpy(np.int64),
                   pt["p_brand"].to_numpy(object),
                   pt["p_type"].to_numpy(object),
                   pt["p_size"].to_numpy(np.int64), bad))

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def part(b: pa.Table, _ref=ref) -> pa.Table:
        pk, brand, ptype, size, badk = ray.get(_ref)
        lp = b.column("l_partkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ls = b.column("l_suppkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if len(badk):
            bp = np.clip(np.searchsorted(badk, ls), 0, len(badk) - 1)
            ok = badk[bp] != ls
            lp, ls = lp[ok], ls[ok]
        if len(pk) == 0 or len(lp) == 0:
            return pa.table({
                "p_brand": pa.array([], type=pa.string()),
                "p_type": pa.array([], type=pa.string()),
                "p_size": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.int64())})
        pos = np.clip(np.searchsorted(pk, lp), 0, len(pk) - 1)
        hit = pk[pos] == lp
        pos, ls = pos[hit], ls[hit]
        df = pd.DataFrame({"p_brand": brand[pos], "p_type": ptype[pos],
                           "p_size": size[pos], "s": ls}) \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = li.map_batches(part, batch_format="pyarrow")
    n_li = _table_rows(sf_dir, "lineitem")
    if n_li is not None and n_li <= TRADE_PAIR_FOLD_CAP:
        # per-batch-distinct partials are <= lineitem rows of narrow
        # dims; under the shared fold cap they dedup + count on the
        # driver (the TRADE_PAIR_FOLD_CAP discipline), dropping both
        # groupby shuffles
        pdf = parts.to_pandas().drop_duplicates()
        agg = (pdf.groupby(["p_brand", "p_type", "p_size"],
                           as_index=False)["s"].nunique()
               .rename(columns={"s": "supplier_cnt"}))
    else:                                   # pragma: no cover - scale path
        agg = (parts
               .groupby(["p_brand", "p_type", "p_size", "s"])
               .aggregate(Count("s", alias_name="nn"))
               .groupby(["p_brand", "p_type", "p_size"])
               .aggregate(Count("s", alias_name="supplier_cnt"))
               .to_pandas())
    agg["p_size"] = agg["p_size"].astype(np.int64)
    agg["supplier_cnt"] = agg["supplier_cnt"].astype(np.int64)
    return (agg.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True], kind="mergesort")
        .reset_index(drop=True)
        [["p_brand", "p_type", "p_size", "supplier_cnt"]])


def cumulative_gains_en(sf_dir: str):
    """Cumulative-gains (lift-chart) table for the n_chars score on the
    lang == 'en' label: per decile of the (score desc, doc_id asc)
    ranking, how many positives the top ceil(k*N/10) rows capture —
    EXACT by the engine's two-phase histogram rank: phase 1 folds the
    domain-bounded (value, pos, total) histogram; only the <= 10
    decile boundaries that land INSIDE a tie group trigger phase 2,
    ONE filtered pass pulling just those boundary-value rows (tie-mass
    bounded) to resolve the doc_id order. No global sort, no per-row
    ranks. Emits (decile, depth, n_pos_cum, gain_ppm)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "lang", "n_chars"])

    def part(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("lang")),
                    pc.is_valid(b.column("n_chars")))
        b = b.filter(m)
        df = pd.DataFrame({
            "v": b.column("n_chars").cast(pa.int64()).to_pandas(),
            "y": pc.equal(b.column("lang"), "en").to_pandas()
            .astype(np.int64)})
        g = (df.groupby("v", as_index=False)
             .agg(pos=("y", "sum"), c=("y", "size")))
        return pa.table({"v": pa.array(g["v"].to_numpy(np.int64)),
                         "pos": pa.array(g["pos"].to_numpy(np.int64)),
                         "c": pa.array(g["c"].to_numpy(np.int64))})

    hist = (ds.map_batches(part, batch_format="pyarrow")
            .groupby("v")
            .aggregate(Sum("pos", alias_name="pos"),
                       Sum("c", alias_name="c"))
            .to_pandas().sort_values("v", ascending=False)
            .reset_index(drop=True))
    empty = pd.DataFrame({"decile": pd.Series([], dtype=np.int64),
                          "depth": pd.Series([], dtype=np.int64),
                          "n_pos_cum": pd.Series([], dtype=np.int64),
                          "gain_ppm": pd.Series([], dtype=np.int64)})
    if hist.empty:
        return empty
    c = hist["c"].to_numpy(np.int64)
    p = hist["pos"].to_numpy(np.int64)
    v = hist["v"].to_numpy(np.int64)
    n_total = int(c.sum())
    p_total = int(p.sum())
    if p_total == 0:
        return empty
    cum_c = np.cumsum(c)
    cum_p = np.cumsum(p)
    depths = [(k * n_total + 9) // 10 for k in range(1, 11)]
    # which boundaries land inside a tie group (need phase-2 rows)?
    need = {}
    for k, depth in enumerate(depths, start=1):
        idx = int(np.searchsorted(cum_c, depth))
        before_c = int(cum_c[idx - 1]) if idx else 0
        extra = depth - before_c
        if 0 < extra < int(c[idx]):
            need.setdefault(int(v[idx]), []).append((k, extra))
    tie_rows = {}
    if need:
        vals = sorted(need)

        def pull(b: pa.Table, _vals=tuple(vals)) -> pa.Table:
            m = pc.and_(pc.is_valid(b.column("lang")),
                        pc.is_valid(b.column("n_chars")))
            b = b.filter(m)
            keep = pc.is_in(b.column("n_chars").cast(pa.int64()),
                            value_set=pa.array(list(_vals),
                                               type=pa.int64()))
            b = b.filter(keep)
            return pa.table({
                "v": b.column("n_chars").cast(pa.int64()),
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "y": pc.equal(b.column("lang"), "en").cast(pa.int64())})

        tr = ds.map_batches(pull, batch_format="pyarrow").to_pandas()
        for val, g in tr.groupby("v"):
            g = g.sort_values("doc_id")
            tie_rows[int(val)] = np.cumsum(
                g["y"].to_numpy(np.int64))
    rows = []
    for k, depth in enumerate(depths, start=1):
        idx = int(np.searchsorted(cum_c, depth))
        before_c = int(cum_c[idx - 1]) if idx else 0
        before_p = int(cum_p[idx - 1]) if idx else 0
        extra = depth - before_c
        if extra == 0:
            np_cum = before_p
        elif extra == int(c[idx]):
            np_cum = before_p + int(p[idx])
        else:
            np_cum = before_p + int(tie_rows[int(v[idx])][extra - 1])
        rows.append((k, depth, np_cum,
                     (1_000_000 * np_cum) // p_total))
    return pd.DataFrame(rows, columns=["decile", "depth", "n_pos_cum",
                                       "gain_ppm"]).astype(np.int64)


def hoover_value_by_type(sf_dir: str):
    """Hoover (Robin Hood) inequality index of event value per type —
    the share of total value that would have to move to equalize all
    events, exact: H_ppm = floor(1e6 * sum_v c_v*|n*v - S| / (2*n*S))
    from the SAME domain-bounded (type, cents) histogram fold as
    value_gini_by_type (one map_batches pass + one tiny groupby; the
    closed form is driver arithmetic in Python big ints — |n*v - S| is
    all-integer, so no float deviation semantics exist). Emits one row
    per type: (event_type, n_events, sum_cents, hoover_ppm)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def part(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pandas(),
            "cents": _cents(b.column("value").to_numpy(
                zero_copy_only=False))})
        g = df.groupby(["event_type", "cents"], as_index=False).size()
        return pa.table({"event_type": pa.array(g["event_type"]),
                         "cents": pa.array(g["cents"].to_numpy(np.int64)),
                         "n": pa.array(g["size"].to_numpy(np.int64))})

    hist = (ds.map_batches(part, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        v = [int(x) for x in g["cents"]]
        c = [int(x) for x in g["n"]]
        n = sum(c)
        s = sum(vi * ci for vi, ci in zip(v, c))
        if s == 0:
            continue
        d = sum(ci * abs(n * vi - s) for vi, ci in zip(v, c))
        rows.append((et, n, s, (1_000_000 * d) // (2 * n * s)))
    return pd.DataFrame(rows, columns=["event_type", "n_events",
                                       "sum_cents", "hoover_ppm"]) \
        .astype({"n_events": np.int64, "sum_cents": np.int64,
                 "hoover_ppm": np.int64})


def autocorr_hourly_by_type(sf_dir: str):
    """Lag-1 autocorrelation of the hourly event-count series per type,
    emitted as the EXACT INTEGER Pearson components (num, den_x, den_y;
    r = num / sqrt(den_x * den_y) for the consumer) over consecutive
    observed buckets in order — the readability_fk trick: no sqrt or
    division happens, so nothing can diverge. Per-batch (type, hour)
    bincount partials fold over the bounded types x hours grid; the
    lag pairing and the five moment sums are driver big-int arithmetic.
    Types with < 3 observed hours drop (r is degenerate). Emits
    (event_type, n_pairs, num, den_x, den_y)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pandas(),
            "hour_bucket": (ts // 3_600_000_000).astype(np.int64)})
        g = df.groupby(["event_type", "hour_bucket"],
                       as_index=False).size()
        return pa.table({
            "event_type": pa.array(g["event_type"]),
            "hour_bucket": pa.array(g["hour_bucket"].to_numpy(np.int64)),
            "n": pa.array(g["size"].to_numpy(np.int64))})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in [
            ("event_type", object), ("n_pairs", np.int64),
            ("num", np.int64), ("den_x", np.int64),
            ("den_y", np.int64)]})
    agg = (part.groupby(["event_type", "hour_bucket"], as_index=False)
           ["n"].sum()
           .sort_values(["event_type", "hour_bucket"])
           .reset_index(drop=True))
    rows = []
    for et, g in agg.groupby("event_type", sort=True):
        cs = [int(x) for x in g["n"]]
        if len(cs) < 3:
            continue
        x, y = cs[:-1], cs[1:]
        m = len(x)
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx = sum(a * a for a in x)
        syy = sum(b * b for b in y)
        rows.append((et, m, m * sxy - sx * sy,
                     m * sxx - sx * sx, m * syy - sy * sy))
    return pd.DataFrame(rows, columns=["event_type", "n_pairs", "num",
                                       "den_x", "den_y"]) \
        .astype({c: np.int64 for c in ["n_pairs", "num", "den_x",
                                       "den_y"]})


KENDALL_DEPTH = 50


def kendall_tau_keyword_rankings(sf_dir: str):
    """Rank-agreement audit between the two keyword-tf rankings the RRF
    query fuses: Kendall tau-b COMPONENTS over the docs common to both
    top-50 lists — concordant / discordant / tie counts as exact
    integers (tau-b's sqrt never happens engine-side; the consumer
    computes (C - D) / sqrt((C+D+Ta)(C+D+Tb))). The tf scan and
    per-batch top-50 partials are the rrf_fuse_keyword_rankings shape;
    the pair loop runs on the driver over the <= C(50,2) bounded
    intersection. Emits ONE row (n_common, concordant, discordant,
    ties_a, ties_b, ties_both)."""
    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    terms_a = pa.array(list(RRF_TERMS_A))
    terms_b = pa.array(list(RRF_TERMS_B))

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "tfa": pa.array([], type=pa.int64()),
                          "tfb": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, _, doc_idx = _flatten_words_arrow(col)
        n = b.num_rows
        ma = pc.is_in(flat, value_set=terms_a).to_numpy(
            zero_copy_only=False)
        mb = pc.is_in(flat, value_set=terms_b).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({
            "doc_id": b.column("doc_id").cast(pa.int64()).to_pandas(),
            "tfa": np.bincount(doc_idx[ma], minlength=n).astype(np.int64),
            "tfb": np.bincount(doc_idx[mb], minlength=n).astype(np.int64),
        })
        top_a = df.sort_values(["tfa", "doc_id"], ascending=[False, True],
                               kind="mergesort").head(KENDALL_DEPTH)
        top_b = df.sort_values(["tfb", "doc_id"], ascending=[False, True],
                               kind="mergesort").head(KENDALL_DEPTH)
        return pa.Table.from_pandas(
            pd.concat([top_a, top_b]).drop_duplicates("doc_id"),
            preserve_index=False)

    cand = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if cand.empty:
        # one all-zero row: the oracle's aggregate over zero pairs
        return pd.DataFrame({c: [0] for c in [
            "n_common", "concordant", "discordant", "ties_a", "ties_b",
            "ties_both"]}).astype(np.int64)
    tops = {}
    for col in ("tfa", "tfb"):
        tops[col] = set(
            cand.sort_values([col, "doc_id"], ascending=[False, True],
                             kind="mergesort").head(KENDALL_DEPTH)
            ["doc_id"].astype(np.int64))
    common = sorted(tops["tfa"] & tops["tfb"])
    sub = cand[cand["doc_id"].isin(common)].sort_values("doc_id")
    a = sub["tfa"].to_numpy(np.int64)
    b_ = sub["tfb"].to_numpy(np.int64)
    conc = disc = ta = tb = tboth = 0
    for i in range(len(a)):
        for j in range(i + 1, len(a)):
            sa = int(np.sign(a[i] - a[j]))
            sb = int(np.sign(b_[i] - b_[j]))
            if sa == 0 and sb == 0:
                tboth += 1
            elif sa == 0:
                ta += 1
            elif sb == 0:
                tb += 1
            elif sa == sb:
                conc += 1
            else:
                disc += 1
    return pd.DataFrame({"n_common": [len(common)],
                         "concordant": [conc], "discordant": [disc],
                         "ties_a": [ta], "ties_b": [tb],
                         "ties_both": [tboth]}).astype(np.int64)


def user_hourly_lerp(sf_dir: str):
    """Time-series gap filling by LINEAR interpolation (the lerp sibling
    of user_hourly_locf): for every MISSING hour bucket strictly inside
    a user's observed span, the straight line between the neighboring
    observed hourly cent-sums, in milli-cents with DuckDB-truncating
    division — lerp = pv*1000 + trunc((nv - pv)*1000*(h - ph)/(nh - ph))
    (slopes go negative, so the fold emulates toward-zero). The
    per-batch (user, hour) cent-sum partials feed ONE user-keyed
    sorted_group_scan directly (duplicate hour rows merge inside the
    group kernel — no pre-groupby shuffle) which emits only the gap rows — per-group
    work bounded by the user's span, nothing user-level ever
    concentrates on the driver. Emits (user_id, hour_bucket,
    lerp_milli) for gap hours only."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def part(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(b.column("user_id")),
                            pc.is_valid(b.column("ts"))),
                    pc.is_valid(b.column("value")))
        b = b.filter(m)
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": b.column("user_id").cast(pa.int64()).to_pandas(),
            "hb": (ts // 3_600_000_000).astype(np.int64),
            "cents": _cents(b.column("value").to_numpy(
                zero_copy_only=False))})
        g = df.groupby(["user_id", "hb"], as_index=False)["cents"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    # no (user, hb) pre-groupby shuffle: the user-keyed scan below sorts
    # anyway, so per-batch partials go straight in and duplicate hb rows
    # merge inside group_fn — ONE all-to-all instead of two
    obs = ds.map_batches(part, batch_format="pyarrow")

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("hour_bucket", pa.int64()),
                            ("lerp_milli", pa.int64())])

    def group_fn(g: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "hb": g.column("hb").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "cents": g.column("cents").to_numpy(
                zero_copy_only=False).astype(np.int64)}) \
            .groupby("hb", as_index=False)["cents"].sum() \
            .sort_values("hb")
        uid = int(g.column("user_id")[0].as_py())
        hbs = df["hb"].to_numpy()
        vs = df["cents"].to_numpy()
        hs, ls = [], []
        for i in range(len(hbs) - 1):
            ph, nh = int(hbs[i]), int(hbs[i + 1])
            if nh - ph <= 1:
                continue
            pv, nv = int(vs[i]), int(vs[i + 1])
            for h in range(ph + 1, nh):
                hs.append(h)
                ls.append(pv * 1000 + _trunc_div(
                    (nv - pv) * 1000 * (h - ph), nh - ph))
        if not hs:
            return None
        return pa.table({
            "user_id": pa.array(np.full(len(hs), uid, dtype=np.int64)),
            "hour_bucket": pa.array(np.array(hs, dtype=np.int64)),
            "lerp_milli": pa.array(np.array(ls, dtype=np.int64))})

    scan = sorted_group_scan(obs, ["user_id"], group_fn, out_schema,
                             order_cols=["hb"])
    res = scan.to_pandas()
    if res.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in
                             ["user_id", "hour_bucket", "lerp_milli"]})
    return (res.sort_values(["user_id", "hour_bucket"])
            .reset_index(drop=True))


MMR_POOL = 20
MMR_PICKS = 5
MMR_REL_TERMS = ("join", "hash")


def mmr_rerank_documents(sf_dir: str):
    """Maximal Marginal Relevance diversified re-ranking (Carbonell &
    Goldstein 1998, public) at lambda = 1/2 over the top-20 keyword
    pool: greedy picks maximize score = rel_ppm - max_sim_ppm, where
    rel_ppm = floor(1e6 * tf / max_tf) normalizes the {join, hash}
    term frequency and sim is exact distinct-word Jaccard in floor-ppm
    against the already-picked set (round 1 has no picks, so it is the
    pure relevance argmax). ONE stateless corpus pass emits per-batch
    top-20 candidates WITH their distinct word lists, so the driver
    merges a bounded batches x 20 pool and the 20 x 20 Jaccard matrix +
    5 greedy rounds are metadata-sized arithmetic in Python big ints.
    Ties break (score desc, doc_id asc). Emits (round, doc_id,
    mmr_score)."""
    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    terms = pa.array(list(MMR_REL_TERMS))

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        empty = pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "rel": pa.array([], type=pa.int64()),
            "words": pa.array([], type=pa.list_(pa.string()))})
        if b.num_rows == 0:
            return empty
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, _, doc_idx = _flatten_words_arrow(col)
        n = b.num_rows
        m = pc.is_in(flat, value_set=terms).to_numpy(
            zero_copy_only=False)
        rel = np.bincount(doc_idx[m], minlength=n).astype(np.int64)
        ids = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -rel))[:MMR_POOL]
        wdf = pd.DataFrame({"i": doc_idx,
                            "w": flat.to_numpy(zero_copy_only=False)}) \
            .drop_duplicates()
        wi = wdf["i"].to_numpy()
        ww = wdf["w"].to_numpy()
        return pa.table({
            "doc_id": pa.array(ids[order]),
            "rel": pa.array(rel[order]),
            "words": pa.array([ww[wi == i].tolist() for i in order],
                              type=pa.list_(pa.string()))})

    cand = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame({"round": pd.Series([], dtype=np.int64),
                          "doc_id": pd.Series([], dtype=np.int64),
                          "mmr_score": pd.Series([], dtype=np.int64)})
    if cand.empty:
        return empty
    pool = cand.sort_values(["rel", "doc_id"], ascending=[False, True],
                            kind="mergesort").head(MMR_POOL) \
        .reset_index(drop=True)
    ids = pool["doc_id"].astype(np.int64).tolist()
    rel = pool["rel"].astype(np.int64).tolist()
    wsets = [set(w) for w in pool["words"]]
    max_rel = max(rel) if rel else 0
    rel_ppm = [(1_000_000 * r) // max_rel if max_rel else 0
               for r in rel]

    def jac_ppm(a: set, b: set) -> int:
        u = len(a | b)
        return (1_000_000 * len(a & b)) // u if u else 0

    picked, out = [], []
    for rnd in range(1, MMR_PICKS + 1):
        best = None
        for i in range(len(ids)):
            if i in picked:
                continue
            ms = max((jac_ppm(wsets[i], wsets[j]) for j in picked),
                     default=0)
            sc = rel_ppm[i] - ms
            key = (-sc, ids[i])
            if best is None or key < best[0]:
                best = (key, i, sc)
        if best is None:
            break
        _, i, sc = best
        picked.append(i)
        out.append((rnd, ids[i], sc))
    return pd.DataFrame(out, columns=["round", "doc_id", "mmr_score"]) \
        .astype(np.int64)


MUTUAL_NN_SCOPE = 200


def mutual_nn_embeddings(sf_dir: str):
    """Mutual nearest-neighbor pairs by cosine over the vec_id < 200
    ground-truth scope (the exact_jaccard_pairs convention: an oracled
    audit at a stated bound — the scale path for full-corpus mutual NN
    is the broadcast-query brute_force_topk shape): a and b pair iff
    each is the other's top-1 (cosine desc, vec_id asc) among the
    scope. The scoped matrix is metadata-sized by construction; cosine
    is the knn_bruteforce normalized-dot convention that hash-matches
    DuckDB's list_cosine_similarity. Emits (vec_a, vec_b, cosine)
    with vec_a < vec_b, rounded half-away to 6."""
    from rayschema.dedup import round_half_away
    from rayschema.similarity import _normalize

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sub = (ds.filter(expr=f"vec_id < {MUTUAL_NN_SCOPE}").to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    empty = pd.DataFrame({"vec_a": pd.Series([], dtype=np.int64),
                          "vec_b": pd.Series([], dtype=np.int64),
                          "cosine": pd.Series([], dtype=np.float64)})
    if len(sub) < 2:
        return empty
    ids = sub["vec_id"].to_numpy(np.int64)
    mat = _normalize(np.stack(sub["embedding"].to_numpy())
                     .astype(np.float64))
    sims = mat @ mat.T
    np.fill_diagonal(sims, -np.inf)
    # top-1 with vec_id-asc tie-break: argmax scans ascending ids first
    nn = sims.argmax(axis=1)
    rows = []
    for i in range(len(ids)):
        j = int(nn[i])
        if int(nn[j]) == i and ids[i] < ids[j]:
            rows.append((int(ids[i]), int(ids[j]),
                         float(sims[i, j])))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["vec_a", "vec_b", "cosine"])
    out["cosine"] = round_half_away(out["cosine"].to_numpy(), 6)
    return (out.astype({"vec_a": np.int64, "vec_b": np.int64})
            .sort_values("vec_a").reset_index(drop=True))


SELF_OVERLAP_N = 8


def self_overlap_documents(sf_dir: str, n: int = SELF_OVERLAP_N):
    """Per-document corpus self-overlap (memorization / diversity audit,
    the self-BLEU cousin): what fraction of a doc's 8-token windows
    also occur in at least one OTHER document. Pass 1 shuffles only the
    16 B (window_hash, doc_id) distinct pairs (the shared
    _doc_window_hashes rolling-hash kernel) through one narrow groupby
    to find hashes spanning >= 2 docs; the shared-hash set broadcasts
    sorted (shared-window-mass-sized — the ngram_decontaminate bench
    bound; the 100-TB path is a hash-keyed sort-merge membership join
    instead). Pass 2 is stateless: per-doc window counts + searchsorted
    membership, overlap as floor-ppm int64 per row. 64-bit collisions
    are the ngram_decontaminate accepted risk (the oracle compares
    window TEXT). Below EXACT_DEDUP_INPROC_CAP corpus rows
    (parquet-footer gated) both passes run fused in-process over ONE
    table pull through the SAME p1/p2 kernels — the minhash-inproc
    discipline; the two-execution plan stays the path at scale. Emits
    (doc_id, n_windows, n_shared, overlap_ppm) for docs with >= 1 full
    window."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def p1(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        wh, di = _doc_window_hashes(b, n)
        ids = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"h": wh.view(np.int64),
                           "d": ids[di]}).drop_duplicates()
        return pa.table({"h": pa.array(df["h"].to_numpy(np.int64)),
                         "d": pa.array(df["d"].to_numpy(np.int64))})

    def p2(b: pa.Table, sh: np.ndarray) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        wh, di = _doc_window_hashes(b, n)
        ids = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        nw = np.bincount(di, minlength=b.num_rows).astype(np.int64)
        h = wh.view(np.int64)
        if len(sh):
            pos = np.clip(np.searchsorted(sh, h), 0, len(sh) - 1)
            hit = sh[pos] == h
        else:
            hit = np.zeros(len(h), dtype=bool)
        ns = np.bincount(di[hit], minlength=b.num_rows).astype(np.int64)
        keep = nw > 0
        nw, ns, ids = nw[keep], ns[keep], ids[keep]
        return pa.table({
            "doc_id": pa.array(ids),
            "n_windows": pa.array(nw),
            "n_shared": pa.array(ns),
            "overlap_ppm": pa.array((1_000_000 * ns) // nw)})

    n_docs = _table_rows(sf_dir, "documents")
    if n_docs is not None and n_docs <= EXACT_DEDUP_INPROC_CAP:
        t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
        hv = p1(t).column("h").to_numpy(zero_copy_only=False)
        uh, cnt = np.unique(hv, return_counts=True)
        return rd.from_arrow(p2(t, uh[cnt >= 2]))

    shared_ds = (ds.map_batches(p1, batch_format="pyarrow")
                 .groupby("h").aggregate(Count("h", alias_name="nd"))
                 .filter(expr="nd >= 2").select_columns(["h"])
                 .to_pandas())
    shared = np.sort(shared_ds["h"].to_numpy(np.int64)) \
        if len(shared_ds) else np.empty(0, np.int64)
    ref = ray.put(shared)

    def p2_dist(b: pa.Table, _ref=ref) -> pa.Table:
        return p2(b, ray.get(_ref))

    return ds.map_batches(p2_dist, batch_format="pyarrow")


def ngram_doc_frequency_histogram(sf_dir: str, n: int = SELF_OVERLAP_N):
    """Corpus-diversity summary: for each distinct 8-token window, in
    how many documents does it occur — histogrammed (1 doc, 2 docs,
    ...). The same pass-1 distinct (hash, doc) shuffle as
    self_overlap_documents, one Count groupby, then a SECOND bounded
    groupby histograms the doc counts (driver state = max doc
    frequency). 64-bit collisions are the accepted ngram_decontaminate
    risk vs the text-equality oracle. Below EXACT_DEDUP_INPROC_CAP
    corpus rows (parquet-footer gated) the distinct-pair pass and both
    groupbys fold in-process over ONE table pull through the same p1
    kernel; the distributed plan stays the path at scale. Emits
    (n_docs, n_grams)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def p1(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        wh, di = _doc_window_hashes(b, n)
        ids = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"h": wh.view(np.int64),
                           "d": ids[di]}).drop_duplicates()
        return pa.table({"h": pa.array(df["h"].to_numpy(np.int64)),
                         "d": pa.array(df["d"].to_numpy(np.int64))})

    n_docs_cap = _table_rows(sf_dir, "documents")
    if n_docs_cap is not None and n_docs_cap <= EXACT_DEDUP_INPROC_CAP:
        t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
        hv = p1(t).column("h").to_numpy(zero_copy_only=False)
        _, nd = np.unique(hv, return_counts=True)
        u, c = np.unique(nd, return_counts=True)
        return (pd.DataFrame({"n_docs": u.astype(np.int64),
                              "n_grams": c.astype(np.int64)})
                .sort_values("n_docs").reset_index(drop=True))

    per_hash = (ds.map_batches(p1, batch_format="pyarrow")
                .groupby("h").aggregate(Count("h", alias_name="nd")))

    def hist_part(b: pa.Table) -> pa.Table:
        u, c = np.unique(b.column("nd").to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"n_docs": pa.array(u.astype(np.int64)),
                         "n_grams": pa.array(c.astype(np.int64))})

    out = (per_hash.map_batches(hist_part, batch_format="pyarrow")
           .groupby("n_docs")
           .aggregate(Sum("n_grams", alias_name="n_grams"))
           .to_pandas())
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_grams"] = out["n_grams"].astype(np.int64)
    return out.sort_values("n_docs").reset_index(drop=True)


def max_event_type_run(sf_dir: str):
    """Behavioral gaps-and-islands audit: each user's LONGEST run of
    consecutive same-type events in (ts, event_id) order — rage-click /
    retry-storm shape detection. ONE user-keyed sorted_group_scan (the
    sessionization shape): per group, run boundaries fall out of one
    vectorized neighbor compare on the dictionary codes, run lengths
    from diff of boundary indices, winner by (len desc, type asc) —
    mirroring the oracle's rn - rn_by_type island trick. Emits
    (user_id, max_run, run_type)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("max_run", pa.int64()),
                            ("run_type", pa.string())])

    def group_fn(g: pa.Table) -> pa.Table:
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        uid = int(g.column("user_id")[0].as_py())
        n = len(et)
        if n == 0:
            return None
        # boundary where the type changes; runs = segments between
        starts = np.flatnonzero(
            np.concatenate([[True], et[1:] != et[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        lens = (ends - starts).astype(np.int64)
        types = et[starts]
        order = np.lexsort((types, -lens))[0]
        return pa.table({
            "user_id": pa.array([uid], type=pa.int64()),
            "max_run": pa.array([int(lens[order])], type=pa.int64()),
            "run_type": pa.array([str(types[order])],
                                 type=pa.string())})

    scan = sorted_group_scan(
        ds.map_batches(_narrow_events, batch_format="pyarrow"),
        ["user_id"], group_fn, out_schema,
        order_cols=["ts_us", "event_id"])
    return (scan.to_pandas().sort_values("user_id")
            .reset_index(drop=True))


REORDER_TOP = 20


def part_reorder_gap(sf_dir: str, broadcast_cap: int = None):
    """Inventory-velocity audit: per part, the mean gap in days between
    consecutive DISTINCT order dates of its lineitems — the
    fastest-moving top-20 by (floor-milli mean gap asc, partkey asc).
    Consecutive-distinct gaps TELESCOPE (their sum is max_day -
    min_day), so after the narrow distinct (part, day) groupby ONE
    Min/Max/Count aggregate replaces any sort: n_gaps = n_distinct - 1,
    sum_gap_days = max - min, mean_milli = 1000*sum // n — no
    all-to-all sort anywhere, O(parts) driver state (dimension-
    bounded). The orderkey -> orderdate side is ADAPTIVE (the
    q10_returned_items discipline): sorted broadcast arrays under
    Q3_BROADCAST_CAP gated on the parquet footer row count, a
    Dataset.join hash exchange past it — orders is fact-scale, so an
    unconditional driver pull would be a multi-billion-row broadcast
    at 100 TB. Parts with < 2 distinct dates drop. Emits (l_partkey,
    n_gaps, sum_gap_days, mean_gap_milli, rk)."""
    import ray
    from ray.data.aggregate import Count, Max, Min

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_orderkey"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"])

    def _odays(col) -> np.ndarray:
        # datetime64[D] = whole days since epoch, unit-independent of
        # how the timestamp materialized (matches epoch_us // 86400e6);
        # np.asarray handles pandas Series and pyarrow columns alike
        return (np.asarray(col).astype("datetime64[D]")
                .astype(np.int64))

    cap = Q3_BROADCAST_CAP if broadcast_cap is None else broadcast_cap
    n_ord = _table_rows(sf_dir, "orders")
    if n_ord is not None and n_ord <= cap:
        od = orders.to_pandas()
        ok = od["o_orderkey"].to_numpy(np.int64)
        order_sort = np.argsort(ok)
        ok = ok[order_sort]
        odays = _odays(od["o_orderdate"])[order_sort]
        ref = ray.put((ok, odays))

        def proj(b: pa.Table, _ref=ref) -> pa.Table:
            keys, days = ray.get(_ref)
            lk = b.column("l_orderkey").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            lp = b.column("l_partkey").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            if len(keys) == 0:
                return pa.table(
                    {"l_partkey": pa.array([], type=pa.int64()),
                     "day": pa.array([], type=pa.int64())})
            pos = np.clip(np.searchsorted(keys, lk), 0, len(keys) - 1)
            hit = keys[pos] == lk
            df = pd.DataFrame({"l_partkey": lp[hit],
                               "day": days[pos][hit]}).drop_duplicates()
            return pa.Table.from_pandas(df, preserve_index=False)

        pd_days = li.map_batches(proj, batch_format="pyarrow")
    else:
        def oday_prep(b: pa.Table) -> pa.Table:
            return pa.table({
                "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
                "day": pa.array(_odays(b.column("o_orderdate")))})

        odays_ds = orders.map_batches(oday_prep, batch_format="pyarrow")
        est = (li.size_bytes() or 0) + (odays_ds.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))

        def narrow(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "l_partkey": b.column("l_partkey").cast(pa.int64())
                .to_numpy(zero_copy_only=False),
                "day": b.column("day").to_numpy(zero_copy_only=False)
            }).drop_duplicates()
            return pa.Table.from_pandas(df, preserve_index=False)

        pd_days = (li.join(odays_ds, join_type="inner",
                           num_partitions=n_parts,
                           on=("l_orderkey",), right_on=("o_orderkey",))
                   .map_batches(narrow, batch_format="pyarrow"))

    # adaptive merge (the part_price_dispersion discipline): the block
    # partials are already per-block-distinct (part, day) pairs, so
    # under a 50M-lineitem footer gate ONE single-task packed-key
    # np.unique + reduceat replaces the two Ray groupbys whose
    # ~|parts| group fan-out dominated wall time; the distributed
    # groupby chain stays the >cap scale path
    n_li_rows = _table_rows(sf_dir, "lineitem")
    if n_li_rows is not None and n_li_rows <= 50_000_000:
        def fold(b: pa.Table) -> pa.Table:
            empty = pa.table({c: pa.array([], type=pa.int64())
                              for c in ("l_partkey", "mn", "mx", "nd")})
            if b.num_rows == 0:
                return empty
            pk = b.column("l_partkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            day = b.column("day").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            # pack (pk, day): day = whole days since epoch, < 2^20 for
            # any timestamp this side of year 4800
            pack = np.unique((pk << 21) | (day + (1 << 20)))
            pks = pack >> 21
            days = (pack & ((1 << 21) - 1)) - (1 << 20)
            starts = np.flatnonzero(np.r_[True, pks[1:] != pks[:-1]])
            return pa.table({
                "l_partkey": pa.array(pks[starts]),
                "mn": pa.array(np.minimum.reduceat(days, starts)),
                "mx": pa.array(np.maximum.reduceat(days, starts)),
                "nd": pa.array(np.diff(np.r_[starts, len(pks)])
                               .astype(np.int64))})

        agg = (pd_days.repartition(1)
               .map_batches(fold, batch_format="pyarrow",
                            batch_size=None).to_pandas())
    else:                                  # pragma: no cover - scale path
        agg = (pd_days
               .groupby(["l_partkey", "day"])
               .aggregate(Count("day", alias_name="nn"))
               .groupby("l_partkey")
               .aggregate(Min("day", alias_name="mn"),
                          Max("day", alias_name="mx"),
                          Count("day", alias_name="nd"))
               .to_pandas())
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in [
        "l_partkey", "n_gaps", "sum_gap_days", "mean_gap_milli", "rk"]})
    agg = agg[agg["nd"] >= 2]
    if agg.empty:
        return empty
    res = pd.DataFrame({
        "l_partkey": agg["l_partkey"].astype(np.int64),
        "n_gaps": (agg["nd"] - 1).astype(np.int64),
        "sum_gap_days": (agg["mx"] - agg["mn"]).astype(np.int64)})
    res["mean_gap_milli"] = (1000 * res["sum_gap_days"]) \
        // res["n_gaps"]
    res = res.sort_values(["mean_gap_milli", "l_partkey"],
                          kind="mergesort").head(REORDER_TOP) \
        .reset_index(drop=True)
    res["rk"] = np.arange(1, len(res) + 1, dtype=np.int64)
    return res



CMS_W = 64
# multiplicative high-bits hashing (Knuth/xxhash-style public primes):
# h_j(u) = (((u * a_j) mod 2^32) // 2^16) mod W — the 32-bit wrap mixes
# high bits so keys congruent mod W land in DIFFERENT buckets per plane
# (an affine hash mod W would depend only on u mod W, making the depth
# useless); numpy uint64 wrap-multiply and SQL HUGEINT % 4294967296
# compute the identical value
CMS_CFG = ((0, 2654435761), (1, 2246822519),
           (2, 3266489917), (3, 668265263))


def _mix_hash(u: np.ndarray, a: int, w: int) -> np.ndarray:
    return ((((u.astype(np.uint64) * np.uint64(a))
              % np.uint64(1 << 32)) >> np.uint64(16))
            % np.uint64(w)).astype(np.int64)


def cms_user_event_counts(sf_dir: str):
    """Count-Min sketch CERTIFICATION — the rare sketch with a full SQL
    oracle: depth-4 x width-64 CMS over integer user_ids using
    multiplicative high-bits hashes (see CMS_CFG note), so
    cell sums are pure GROUP BY arithmetic on both sides and the
    one-sided error guarantee (est >= true, est <= true + eps*N w.h.p.;
    Cormode & Muthukrishnan 2005, public) is checkable digit for digit.
    CMS adds commute, so per-batch 4x64 int64 partial tables fold on
    the driver order-independently — the sketch IS the shuffle-free
    aggregation. Emits the top-10 users by true count:
    (user_id, true_count, cms_est, overcount) with overcount >= 0 by
    construction. The uint64 wrap-multiply is exact vs SQL
    HUGEINT arithmetic at any id."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("user_id")))
        u = b.column("user_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cells = np.zeros((len(CMS_CFG), CMS_W), dtype=np.int64)
        for j, a in CMS_CFG:
            cells[j] = np.bincount(_mix_hash(u, a, CMS_W),
                                   minlength=CMS_W)
        # true-count partials ride along: (user, n) per batch
        uu, cc = np.unique(u, return_counts=True)
        t = pa.table({
            "kind": pa.array(np.concatenate(
                [np.zeros(cells.size, np.int64),
                 np.ones(len(uu), np.int64)])),
            "k1": pa.array(np.concatenate(
                [np.repeat(np.arange(len(CMS_CFG), dtype=np.int64),
                           CMS_W), uu])),
            "k2": pa.array(np.concatenate(
                [np.tile(np.arange(CMS_W, dtype=np.int64),
                         len(CMS_CFG)),
                 np.zeros(len(uu), np.int64)])),
            "n": pa.array(np.concatenate(
                [cells.ravel(), cc.astype(np.int64)]))})
        return t

    raw = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if raw.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in
                             ["user_id", "true_count", "cms_est",
                              "overcount"]})
    agg = raw.groupby(["kind", "k1", "k2"], as_index=False)["n"].sum()
    cells = np.zeros((len(CMS_CFG), CMS_W), dtype=np.int64)
    cm = agg[agg["kind"] == 0]
    cells[cm["k1"].to_numpy(np.int64),
          cm["k2"].to_numpy(np.int64)] = cm["n"].to_numpy(np.int64)
    tc = agg[agg["kind"] == 1][["k1", "n"]] \
        .rename(columns={"k1": "user_id", "n": "true_count"})
    tc = tc.sort_values(["true_count", "user_id"],
                        ascending=[False, True],
                        kind="mergesort").head(10).reset_index(drop=True)
    ests = []
    for u in tc["user_id"]:
        uu = np.array([int(u)], dtype=np.int64)
        ests.append(min(int(cells[j][_mix_hash(uu, a, CMS_W)[0]])
                        for j, a in CMS_CFG))
    out = pd.DataFrame({
        "user_id": tc["user_id"].astype(np.int64),
        "true_count": tc["true_count"].astype(np.int64),
        "cms_est": np.array(ests, dtype=np.int64)})
    out["overcount"] = (out["cms_est"] - out["true_count"]) \
        .astype(np.int64)
    return out


BLOOM_M = 256
BLOOM_CFG = ((0, 2654435761), (1, 2246822519), (2, 3266489917))


def bloom_fpr_audit(sf_dir: str):
    """Bloom-filter false-positive-rate CERTIFICATION with a full SQL
    oracle (same arithmetic-hash trick as the CMS cert): a 256-bit,
    k=3 filter over the customers WITH orders, probed by every
    customer — a non-member testing all-bits-set is a false positive,
    and both sides enumerate the identical bit set. Per-batch partial
    bitmaps OR-fold on the driver (96 B each); the probe pass is one
    vectorized membership test. Emits ONE row (n_members, n_probes,
    n_false_pos, fpr_ppm = 1e6*fp // max(non_members, 1))."""
    import ray

    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def bits_part(b: pa.Table) -> pa.Table:
        u = np.unique(b.column("o_custkey").cast(pa.int64())
                      .to_numpy(zero_copy_only=False))
        m = np.zeros(BLOOM_M * len(BLOOM_CFG), dtype=bool)
        for j, a in BLOOM_CFG:
            m[j * BLOOM_M + _mix_hash(u, a, BLOOM_M)] = True
        return pa.table({"bits": pa.array(
            [np.packbits(m).tobytes()], type=pa.large_binary()),
            "keys": pa.array([u.tobytes()], type=pa.large_binary())})

    parts = orders.map_batches(bits_part,
                               batch_format="pyarrow").to_pandas()
    acc = np.zeros(BLOOM_M * len(BLOOM_CFG) // 8, dtype=np.uint8)
    members = []
    for bts, ks in zip(parts["bits"], parts["keys"]):
        acc |= np.frombuffer(bts, dtype=np.uint8)
        members.append(np.frombuffer(ks, dtype=np.int64))
    member_keys = np.unique(np.concatenate(members)) if members \
        else np.empty(0, np.int64)
    bits = np.unpackbits(acc).astype(bool)
    ref = ray.put((bits, member_keys))

    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def probe(b: pa.Table, _ref=ref) -> pa.Table:
        bts, mk = ray.get(_ref)
        u = b.column("c_custkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        hit = np.ones(len(u), dtype=bool)
        for j, a in BLOOM_CFG:
            hit &= bts[j * BLOOM_M + _mix_hash(u, a, BLOOM_M)]
        if len(mk):
            pos = np.clip(np.searchsorted(mk, u), 0, len(mk) - 1)
            is_mem = mk[pos] == u
        else:
            is_mem = np.zeros(len(u), dtype=bool)
        return pa.table({
            "n_probes": pa.array([np.int64(len(u))]),
            "n_members": pa.array([np.int64(is_mem.sum())]),
            "n_fp": pa.array([np.int64((hit & ~is_mem).sum())])})

    agg = cust.map_batches(probe, batch_format="pyarrow").to_pandas()
    n_probes = int(agg["n_probes"].sum())
    n_mem = int(agg["n_members"].sum())
    n_fp = int(agg["n_fp"].sum())
    non_mem = max(n_probes - n_mem, 1)
    return pd.DataFrame({
        "n_members": [len(member_keys)], "n_probes": [n_probes],
        "n_false_pos": [n_fp],
        "fpr_ppm": [(1_000_000 * n_fp) // non_mem]}).astype(np.int64)


TRIPLE_MINSUP = 2
TRIPLE_TOP = 15
TRIPLE_PACK_BITS = 21           # 3 x 21-bit part keys in one int64
TRIPLE_FOLD_CAP = 10_000_000    # triple instances; past it -> groupby


def frequent_triples_parts(sf_dir: str, fold_cap: int = TRIPLE_FOLD_CAP):
    """Frequent 3-itemsets over order baskets (the Apriori step past
    copurchase_lift_pairs' pairs): triples of parts bought together in
    >= 2 distinct orders, top-15 by (support desc, keys asc). ONE
    l_orderkey-keyed sorted_group_scan (the shared pair-edge shape)
    emits each order's within-order-deduped triples — baskets are
    single-digit here so emission is C(s,3)-bounded per order; for
    fat-basket corpora the documented Apriori path prunes emission to
    triples whose three pairs are frequent (broadcast frequent-pair
    set) before the count. Counting follows the pair-builder contract:
    when part keys fit 21 bits AND triple instances <= fold_cap, each
    triple packs into ONE int64 and a driver sort/reduceat fold
    replaces the ~|triples|-group all-to-all (measured 20 -> ~6 s at
    sf0.1); either bound failing falls back to the 3-key hash groupby,
    equality-tested. Emits (part_a, part_b, part_c, support, rk)."""
    from itertools import combinations

    from ray.data.aggregate import Sum

    from rayschema.dedup import sorted_group_scan

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    pmax = _read(sf_dir, "lineitem", columns=["l_partkey"]) \
        .max("l_partkey")
    packed = pmax is not None and int(pmax) < (1 << TRIPLE_PACK_BITS)

    if packed:
        out_schema = pa.schema([("tk", pa.int64()), ("n", pa.int64())])
    else:
        out_schema = pa.schema([("pa_", pa.int64()),
                                ("pb_", pa.int64()),
                                ("pc_", pa.int64()), ("n", pa.int64())])

    B = np.int64(TRIPLE_PACK_BITS)

    def _emit(cp: np.ndarray, sizes: np.ndarray):
        """Triples for concatenated sorted-dedup groups of ``sizes``."""
        outs = ([], [], [])
        gstart = np.cumsum(sizes) - sizes
        for s in np.unique(sizes):
            if s < 3:
                continue
            rows = gstart[sizes == s]
            mat = cp[rows[:, None] + np.arange(s)]
            for i, j, k in combinations(range(int(s)), 3):
                outs[0].append(mat[:, i])
                outs[1].append(mat[:, j])
                outs[2].append(mat[:, k])
        if not outs[0]:
            return None
        a = np.concatenate(outs[0])
        b = np.concatenate(outs[1])
        c = np.concatenate(outs[2])
        if packed:
            tk = (a << (2 * B)) | (b << B) | c
            u, cnt = np.unique(tk, return_counts=True)
            return pa.table({"tk": pa.array(u),
                             "n": pa.array(cnt.astype(np.int64))})
        df = (pd.DataFrame({"pa_": a, "pb_": b, "pc_": c})
              .groupby(["pa_", "pb_", "pc_"], as_index=False).size())
        return pa.table({"pa_": pa.array(df["pa_"].to_numpy(np.int64)),
                         "pb_": pa.array(df["pb_"].to_numpy(np.int64)),
                         "pc_": pa.array(df["pc_"].to_numpy(np.int64)),
                         "n": pa.array(df["size"].to_numpy(np.int64))})

    def block_fn(b: pa.Table, starts, ends, want):
        keep = want & (ends - starts >= 3)
        if not keep.any():
            return None
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s, e = starts[keep], ends[keep]
        sizes = (e - s).astype(np.int64)
        tot = int(sizes.sum())
        take = (np.repeat(s, sizes)
                + (np.arange(tot, dtype=np.int64)
                   - np.repeat(np.cumsum(sizes) - sizes, sizes)))
        cp = pk[take]
        gstart = np.cumsum(sizes) - sizes
        first = np.zeros(tot, dtype=bool)
        first[gstart] = True
        kp = first | (cp != np.roll(cp, 1))
        dsizes = np.add.reduceat(kp.astype(np.int64), gstart)
        return _emit(cp[kp], dsizes)

    def group_fn(g: pa.Table):
        u = np.unique(g.column("l_partkey")
                      .to_numpy(zero_copy_only=False).astype(np.int64))
        if len(u) < 3:
            return None
        return _emit(u, np.array([len(u)], dtype=np.int64))

    scan = sorted_group_scan(
        li, ["l_orderkey"], group_fn, out_schema,
        group_filter=lambda b, s, e: (e - s) >= 3,
        block_fn=block_fn, order_cols=["l_partkey"])

    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in [
        "part_a", "part_b", "part_c", "support", "rk"]})
    if packed:
        scan = scan.materialize()
        if scan.count() <= fold_cap:
            part = scan.to_pandas()
            if part.empty:
                return empty
            tks = part["tk"].to_numpy(np.int64)
            ns = part["n"].to_numpy(np.int64)
            order = np.argsort(tks, kind="mergesort")
            tks, ns = tks[order], ns[order]
            firsts = np.concatenate(
                [[True], tks[1:] != tks[:-1]])
            starts = np.flatnonzero(firsts)
            sup = np.add.reduceat(ns, starts)
            tks = tks[starts]
            mask = np.int64((1 << TRIPLE_PACK_BITS) - 1)
            agg = pd.DataFrame({"pa_": tks >> (2 * B),
                                "pb_": (tks >> B) & mask,
                                "pc_": tks & mask,
                                "support": sup})
            agg = agg[agg["support"] >= TRIPLE_MINSUP]
        else:
            def decode(bt: pa.Table) -> pa.Table:
                tk = bt.column("tk").to_numpy(zero_copy_only=False)
                mask = np.int64((1 << TRIPLE_PACK_BITS) - 1)
                return pa.table({
                    "pa_": pa.array(tk >> (2 * B)),
                    "pb_": pa.array((tk >> B) & mask),
                    "pc_": pa.array(tk & mask),
                    "n": bt.column("n")})

            agg = (scan.map_batches(decode, batch_format="pyarrow")
                   .groupby(["pa_", "pb_", "pc_"])
                   .aggregate(Sum("n", alias_name="support"))
                   .filter(expr=f"support >= {TRIPLE_MINSUP}")
                   .to_pandas())
    else:
        agg = (scan.groupby(["pa_", "pb_", "pc_"])
               .aggregate(Sum("n", alias_name="support"))
               .filter(expr=f"support >= {TRIPLE_MINSUP}")
               .to_pandas())
    if agg.empty:
        return empty
    agg = agg.sort_values(["support", "pa_", "pb_", "pc_"],
                          ascending=[False, True, True, True],
                          kind="mergesort").head(TRIPLE_TOP) \
        .reset_index(drop=True)
    out = pd.DataFrame({
        "part_a": agg["pa_"].astype(np.int64),
        "part_b": agg["pb_"].astype(np.int64),
        "part_c": agg["pc_"].astype(np.int64),
        "support": agg["support"].astype(np.int64)})
    out["rk"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def mrr_knn_labels(sf_dir: str):
    """Mean-Reciprocal-Rank retrieval metric for the 3 fixed query
    vectors: the rank (over ALL other vectors, cosine-6dp desc, vec_id
    asc) of the first SAME-LABEL neighbor, rr_ppm = 1e6 // rank. Two
    stateless passes with the query matrix broadcast: pass 1 merges
    per-batch same-label top-1 candidates (bounded batches x 3 rows);
    pass 2 counts vectors strictly ahead of that winner — both sides
    compare on the knn convention round-6 cosine, so the count is the
    oracle's row_number minus one. Emits (query_id, best_vec_id,
    "rank", rr_ppm)."""
    import ray

    from rayschema.dedup import round_half_away
    from rayschema.similarity import _normalize

    ds = _read(sf_dir, "embeddings",
               columns=["vec_id", "embedding", "label"])
    q = _query_vecs(sf_dir, ["vec_id", "embedding", "label"])
    if q.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in
                             ["query_id", "best_vec_id", "rank",
                              "rr_ppm"]})
    qmat = _normalize(np.stack(q["embedding"].to_numpy())
                      .astype(np.float64))
    qref = ray.put((q["vec_id"].to_numpy(np.int64),
                    q["label"].to_numpy(np.int64), qmat))

    def scan1(b: pa.Table, _ref=qref) -> pa.Table:
        qids, qlabs, qm = ray.get(_ref)
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = _normalize(np.stack(col.to_numpy(zero_copy_only=False))
                         .astype(np.float64))
        ids = b.column("vec_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        labs = b.column("label").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        sims = round_half_away(mat @ qm.T, 6)
        oq, oid, oc = [], [], []
        for qi in range(len(qids)):
            m = (labs == qlabs[qi]) & (ids != qids[qi])
            if not m.any():
                continue
            # best by (cos6 desc, vec_id asc)
            sel = np.flatnonzero(m)
            best = sel[np.lexsort((ids[sel], -sims[sel, qi]))[0]]
            oq.append(qids[qi])
            oid.append(ids[best])
            oc.append(sims[best, qi])
        return pa.table({"query_id": pa.array(np.array(oq, np.int64)),
                         "vec_id": pa.array(np.array(oid, np.int64)),
                         "cos6": pa.array(np.array(oc, np.float64))})

    cand = ds.map_batches(scan1, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in
                             ["query_id", "best_vec_id", "rank",
                              "rr_ppm"]})
    best = (cand.sort_values(["query_id", "cos6", "vec_id"],
                             ascending=[True, False, True],
                             kind="mergesort")
            .groupby("query_id", as_index=False).head(1))
    bref = ray.put((best["query_id"].to_numpy(np.int64),
                    best["vec_id"].to_numpy(np.int64),
                    best["cos6"].to_numpy(np.float64)))

    def scan2(b: pa.Table, _q=qref, _b=bref) -> pa.Table:
        qids, qlabs, qm = ray.get(_q)
        bq, bid, bc = ray.get(_b)
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = _normalize(np.stack(col.to_numpy(zero_copy_only=False))
                         .astype(np.float64))
        ids = b.column("vec_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        sims = round_half_away(mat @ qm.T, 6)
        rows = []
        for k in range(len(bq)):
            qi = int(np.flatnonzero(qids == bq[k])[0])
            s = sims[:, qi]
            better = (ids != bq[k]) & (
                (s > bc[k]) | ((s == bc[k]) & (ids < bid[k])))
            rows.append((int(bq[k]), int(better.sum())))
        t = pd.DataFrame(rows, columns=["query_id", "nb"])
        return pa.Table.from_pandas(t, preserve_index=False)

    counts = (ds.map_batches(scan2, batch_format="pyarrow").to_pandas()
              .groupby("query_id", as_index=False)["nb"].sum())
    out = best.merge(counts, on="query_id")
    out["rank"] = (out["nb"] + 1).astype(np.int64)
    out["rr_ppm"] = (1_000_000 // out["rank"]).astype(np.int64)
    return pd.DataFrame({
        "query_id": out["query_id"].astype(np.int64),
        "best_vec_id": out["vec_id"].astype(np.int64),
        "rank": out["rank"],
        "rr_ppm": out["rr_ppm"]}).sort_values("query_id") \
        .reset_index(drop=True)


XCORR_MAX_LAG = 12
XCORR_TYPE_X = "view"
XCORR_TYPE_Y = "purchase"


def xcorr_peak_lag(sf_dir: str):
    """Lead-lag detection between two behavioral series: the integer
    cross-correlation sum(x_t * y_{t+L}) of hourly 'view' vs 'purchase'
    counts at every lag L in [-12, +12] — the peak lag says how far
    purchases trail views. Per-batch hour bincount partials fold to the
    bounded <= 720-hour grid; the 25 lag sums are driver big-int
    arithmetic (missing hours contribute nothing on either side, the
    observed-grid convention). Emits (lag, xcorr, rk) ranked by
    (xcorr desc, lag asc)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    tset = pa.array([XCORR_TYPE_X, XCORR_TYPE_Y])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("event_type"), value_set=tset))
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({
            "is_x": pc.equal(b.column("event_type"), XCORR_TYPE_X)
            .to_pandas().astype(np.int64),
            "hb": (ts // 3_600_000_000).astype(np.int64)})
        g = df.groupby(["is_x", "hb"], as_index=False).size()
        return pa.table({"is_x": pa.array(g["is_x"].to_numpy(np.int64)),
                         "hb": pa.array(g["hb"].to_numpy(np.int64)),
                         "n": pa.array(g["size"].to_numpy(np.int64))})

    agg = (ds.map_batches(part, batch_format="pyarrow").to_pandas())
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in
                          ["lag", "xcorr", "rk"]})
    if agg.empty:
        return empty
    agg = agg.groupby(["is_x", "hb"], as_index=False)["n"].sum()
    x = {int(h): int(n) for h, n in
         zip(agg.loc[agg["is_x"] == 1, "hb"],
             agg.loc[agg["is_x"] == 1, "n"])}
    y = {int(h): int(n) for h, n in
         zip(agg.loc[agg["is_x"] == 0, "hb"],
             agg.loc[agg["is_x"] == 0, "n"])}
    rows = []
    for lag in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1):
        s = sum(nx * y.get(h + lag, 0) for h, nx in x.items())
        rows.append((lag, s))
    out = pd.DataFrame(rows, columns=["lag", "xcorr"])
    out = out.sort_values(["xcorr", "lag"], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    out["rk"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out.sort_values("lag").reset_index(drop=True) \
        .astype(np.int64)


def nation_revenue_share(sf_dir: str):
    """Ratio-to-report rollup: each nation's order revenue as an exact
    floor-ppm SHARE of its region's total — the percent-of-parent
    window pattern. The customer -> nation map broadcasts sorted (the
    q5 dimension convention; the adaptive hash-join path past
    Q3_BROADCAST_CAP is the documented scale route), per-batch
    per-nation cents partials fold to the <= 25-row grid, and the
    region shares are driver big-int arithmetic over nation/region
    metadata. Emits (r_name, n_name, revenue_cents, share_ppm)."""
    import ray

    nat = _read(sf_dir, "nation").to_pandas()
    reg = _read(sf_dir, "region").to_pandas()
    rmap = dict(zip(reg["r_regionkey"].astype(np.int64),
                    reg["r_name"]))
    nmap = nat.sort_values("n_nationkey")
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).to_pandas() \
        .sort_values("c_custkey")
    ckeys = cust["c_custkey"].to_numpy(np.int64)
    cnat = cust["c_nationkey"].to_numpy(np.int64)
    ref = ray.put((ckeys, cnat))

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_totalprice"])

    def part(b: pa.Table, _ref=ref) -> pa.Table:
        keys, nk = ray.get(_ref)
        ck = b.column("o_custkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cents = _cents(b.column("o_totalprice")
                       .to_numpy(zero_copy_only=False))
        if len(keys) == 0:
            return pa.table({"nkey": pa.array([], type=pa.int64()),
                             "cents": pa.array([], type=pa.int64())})
        pos = np.clip(np.searchsorted(keys, ck), 0, len(keys) - 1)
        hit = keys[pos] == ck
        df = pd.DataFrame({"nkey": nk[pos][hit], "cents": cents[hit]})
        g = df.groupby("nkey", as_index=False)["cents"].sum()
        return pa.table({"nkey": pa.array(g["nkey"].to_numpy(np.int64)),
                         "cents": pa.array(
                             g["cents"].to_numpy(np.int64))})

    agg = (orders.map_batches(part, batch_format="pyarrow")
           .to_pandas())
    empty = pd.DataFrame({
        "r_name": pd.Series([], dtype=object),
        "n_name": pd.Series([], dtype=object),
        "revenue_cents": pd.Series([], dtype=np.int64),
        "share_ppm": pd.Series([], dtype=np.int64)})
    if agg.empty:
        return empty
    agg = agg.groupby("nkey", as_index=False)["cents"].sum()
    nk2 = dict(zip(nmap["n_nationkey"].astype(np.int64),
                   zip(nmap["n_name"],
                       nmap["n_regionkey"].astype(np.int64))))
    rows = []
    for nkey, cents in zip(agg["nkey"], agg["cents"]):
        if int(nkey) not in nk2:
            continue
        nname, rkey = nk2[int(nkey)]
        rows.append((rmap.get(int(rkey)), nname, int(cents), int(rkey)))
    df = pd.DataFrame(rows, columns=["r_name", "n_name",
                                     "revenue_cents", "rkey"])
    rtot = df.groupby("rkey")["revenue_cents"].sum()
    df["share_ppm"] = np.array(
        [(1_000_000 * int(c)) // int(rtot[rk])
         for c, rk in zip(df["revenue_cents"], df["rkey"])],
        dtype=np.int64)
    return (df.drop(columns=["rkey"])
            .astype({"revenue_cents": np.int64})
            .sort_values(["r_name", "n_name"]).reset_index(drop=True))


def quarterly_order_growth(sf_dir: str):
    """Reporting rollup with sequential deltas: orders and exact
    integer-cents revenue per calendar quarter, plus the change vs the
    PREVIOUS OBSERVED quarter (the EWMA observed-grid convention — the
    first quarter drops, having no predecessor). Per-batch
    (year, quarter) partials fold to the bounded quarter grid; deltas
    are driver arithmetic. Emits (o_year, o_quarter, n_orders,
    rev_cents, delta_n, delta_cents)."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("o_orderdate")))
        d = b.column("o_orderdate")
        yr = pc.year(d).to_numpy(zero_copy_only=False).astype(np.int64)
        q = ((pc.month(d).to_numpy(zero_copy_only=False)
              .astype(np.int64) - 1) // 3) + 1
        cents = _cents(b.column("o_totalprice")
                       .to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"y": yr, "q": q, "cents": cents})
        g = (df.groupby(["y", "q"], as_index=False)
             .agg(n=("cents", "size"), s=("cents", "sum")))
        return pa.table({"y": pa.array(g["y"].to_numpy(np.int64)),
                         "q": pa.array(g["q"].to_numpy(np.int64)),
                         "n": pa.array(g["n"].to_numpy(np.int64)),
                         "s": pa.array(g["s"].to_numpy(np.int64))})

    agg = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in [
        "o_year", "o_quarter", "n_orders", "rev_cents", "delta_n",
        "delta_cents"]})
    if agg.empty:
        return empty
    agg = (agg.groupby(["y", "q"], as_index=False)
           .agg(n=("n", "sum"), s=("s", "sum"))
           .sort_values(["y", "q"]).reset_index(drop=True))
    if len(agg) < 2:
        return empty
    out = agg.iloc[1:].reset_index(drop=True)
    prev = agg.iloc[:-1].reset_index(drop=True)
    return pd.DataFrame({
        "o_year": out["y"].astype(np.int64),
        "o_quarter": out["q"].astype(np.int64),
        "n_orders": out["n"].astype(np.int64),
        "rev_cents": out["s"].astype(np.int64),
        "delta_n": (out["n"] - prev["n"]).astype(np.int64),
        "delta_cents": (out["s"] - prev["s"]).astype(np.int64)})


def value_moments_by_type(sf_dir: str):
    """Full moment profile of event value per type — the exact-integer
    power sums s1..s4 of FLOOR-DOLLAR values (consumers derive
    variance/skewness/kurtosis from raw moments; the dollar floor keeps
    v^4 sums int64-emittable at any realistic sf — the driver folds in
    Python big ints off the same domain-bounded (type, value) histogram
    as value_gini_by_type and would raise rather than wrap; the SQL
    mirror widens to HUGEINT). Emits (event_type, n_events, s1, s2,
    s3, s4)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        v = np.floor(b.column("value").to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        df = pd.DataFrame({"event_type": b.column("event_type")
                           .to_pandas(), "v": v})
        g = df.groupby(["event_type", "v"], as_index=False).size()
        return pa.table({"event_type": pa.array(g["event_type"]),
                         "v": pa.array(g["v"].to_numpy(np.int64)),
                         "n": pa.array(g["size"].to_numpy(np.int64))})

    hist = (ds.map_batches(part, batch_format="pyarrow")
            .groupby(["event_type", "v"])
            .aggregate(Sum("n", alias_name="n")).to_pandas())
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        vs = [int(x) for x in g["v"]]
        cs = [int(x) for x in g["n"]]
        n = sum(cs)
        s = [sum(c * v ** k for v, c in zip(vs, cs))
             for k in (1, 2, 3, 4)]
        rows.append((et, n, *s))
    return pd.DataFrame(rows, columns=["event_type", "n_events",
                                       "s1", "s2", "s3", "s4"]) \
        .astype({c: np.int64 for c in ["n_events", "s1", "s2",
                                       "s3", "s4"]})


def funnel3_view_click_purchase(sf_dir: str):
    """Three-step STRICT-ORDER funnel (view -> click -> purchase, each
    step strictly after the previous step's FIRST occurrence): the
    sequential-pattern extension of funnel_view_purchase. ONE
    user-keyed time-ordered sorted_group_scan; the per-block path is
    fully vectorized — first-view timestamps per group via
    minimum.reduceat, then clicks strictly later than that view, then
    purchases strictly later than that click, no per-group Python.
    Emits ONE row (n_users, n_view, n_view_click, n_full)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])

    out_schema = pa.schema([("n_users", pa.int64()),
                            ("n_view", pa.int64()),
                            ("n_vc", pa.int64()),
                            ("n_full", pa.int64())])
    BIG = np.int64(2 ** 62)

    def block_fn(b: pa.Table, starts, ends, want):
        if not want.any():
            return None
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        ts = b.column("ts_us").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sizes = (ends - starts).astype(np.int64)
        grp = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        gstart = np.cumsum(sizes) - sizes

        def first_after(mask, after_per_group):
            cand = np.where(mask & (ts > after_per_group[grp]),
                            ts, BIG)
            return np.minimum.reduceat(cand, gstart)

        neg = np.full(len(starts), np.int64(-2 ** 62))
        tv = first_after(et == "view", neg)
        tc = first_after(et == "click", tv)
        tp = first_after(et == "purchase", tc)
        w = want
        return pa.table({
            "n_users": pa.array([np.int64(w.sum())]),
            "n_view": pa.array([np.int64((tv[w] < BIG).sum())]),
            "n_vc": pa.array([np.int64((tc[w] < BIG).sum())]),
            "n_full": pa.array([np.int64((tp[w] < BIG).sum())])})

    def group_fn(g: pa.Table) -> pa.Table:
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False) \
            .astype(np.int64)

        def first_after(mask, after):
            c = ts[mask & (ts > after)]
            return int(c.min()) if len(c) else None

        tv = first_after(et == "view", -2 ** 62)
        tc = first_after(et == "click", tv) if tv is not None else None
        tp = first_after(et == "purchase", tc) \
            if tc is not None else None
        return pa.table({
            "n_users": pa.array([np.int64(1)]),
            "n_view": pa.array([np.int64(tv is not None)]),
            "n_vc": pa.array([np.int64(tc is not None)]),
            "n_full": pa.array([np.int64(tp is not None)])})

    scan = sorted_group_scan(
        ds.map_batches(_narrow_events, batch_format="pyarrow"),
        ["user_id"], group_fn, out_schema,
        order_cols=["ts_us", "event_id"], block_fn=block_fn)
    agg = scan.to_pandas()
    if agg.empty:
        return pd.DataFrame({c: [0] for c in ["n_users", "n_view",
                                              "n_view_click",
                                              "n_full"]}) \
            .astype(np.int64)
    return pd.DataFrame({
        "n_users": [int(agg["n_users"].sum())],
        "n_view": [int(agg["n_view"].sum())],
        "n_view_click": [int(agg["n_vc"].sum())],
        "n_full": [int(agg["n_full"].sum())]}).astype(np.int64)


TARGET_ENC_ALPHA = 1


def target_encode_source(sf_dir: str):
    """Categorical target encoding (ML feature engineering): per source,
    the Laplace-smoothed P(lang = 'en') as floor-ppm —
    (n_en + alpha) * 1e6 // (n + 2*alpha), alpha = 1 — the leakage-safe
    prior-blended encoding. One bounded (source) fold of per-batch
    (n, n_en) partials. Emits (source, n_docs, n_en, enc_ppm)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def part(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("source")),
                    pc.is_valid(b.column("lang")))
        b = b.filter(m)
        df = pd.DataFrame({
            "source": b.column("source").to_pandas(),
            "y": pc.equal(b.column("lang"), "en").to_pandas()
            .astype(np.int64)})
        g = (df.groupby("source", as_index=False)
             .agg(n=("y", "size"), n_en=("y", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("n", alias_name="n_docs"),
                      Sum("n_en", alias_name="n_en"))
           .to_pandas())
    if agg.empty:
        return pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "n_docs": pd.Series([], dtype=np.int64),
            "n_en": pd.Series([], dtype=np.int64),
            "enc_ppm": pd.Series([], dtype=np.int64)})
    a = TARGET_ENC_ALPHA
    agg["enc_ppm"] = np.array(
        [(1_000_000 * (int(e) + a)) // (int(n) + 2 * a)
         for n, e in zip(agg["n_docs"], agg["n_en"])], dtype=np.int64)
    return (agg.astype({"n_docs": np.int64, "n_en": np.int64})
            .sort_values("source").reset_index(drop=True))


def lorenz_points_by_type(sf_dir: str):
    """Lorenz-curve points for event value per type: at each population
    decile (the poorest ceil(k*N/10) events by value, ties split by
    sharing the SAME value so no tie order exists to resolve), the
    cumulative value share in floor-ppm — the curve whose area is the
    Gini the engine already reports. Off the shared domain-bounded
    (type, cents) histogram fold: boundary buckets split EXACTLY as
    extra_rows * v because every row in a bucket carries the identical
    value — the rare two-phase rank that needs NO phase 2. Emits
    (event_type, decile, depth, cum_cents, share_ppm)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pandas(),
            "cents": _cents(b.column("value").to_numpy(
                zero_copy_only=False))})
        g = df.groupby(["event_type", "cents"], as_index=False).size()
        return pa.table({"event_type": pa.array(g["event_type"]),
                         "cents": pa.array(g["cents"].to_numpy(np.int64)),
                         "n": pa.array(g["size"].to_numpy(np.int64))})

    hist = (ds.map_batches(part, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("n", alias_name="n")).to_pandas())
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("cents")
        v = [int(x) for x in g["cents"]]
        c = [int(x) for x in g["n"]]
        n = sum(c)
        tot = sum(vi * ci for vi, ci in zip(v, c))
        if n == 0 or tot == 0:
            continue
        cum_c, cum_v, idx = 0, 0, 0
        for k in range(1, 11):
            depth = (k * n + 9) // 10
            while idx < len(v) and cum_c + c[idx] <= depth:
                cum_c += c[idx]
                cum_v += v[idx] * c[idx]
                idx += 1
            extra = depth - cum_c
            cv = cum_v + (extra * v[idx] if extra > 0 else 0)
            rows.append((et, k, depth, cv,
                         (1_000_000 * cv) // tot))
    return pd.DataFrame(rows, columns=["event_type", "decile", "depth",
                                       "cum_cents", "share_ppm"]) \
        .astype({c: np.int64 for c in ["decile", "depth", "cum_cents",
                                       "share_ppm"]})


HAAR_GRID = 32          # hours 0..23 zero-padded to the dyadic grid


def haar_hourly_decompose(sf_dir: str):
    """Multiresolution time-series decomposition: the UNNORMALIZED
    integer Haar transform (pair sums and differences — no division, so
    every coefficient is exact) of the global hour-of-day event-count
    curve, zero-padded to the 32-slot dyadic grid. Three detail levels
    (16 + 8 + 4 coefficients) plus the 4 level-3 smooth sums — the
    denoising / burst-localization primitive. ONE bincount fold to the
    24-value grid; the transform is driver integer arithmetic. Emits
    (kind, idx, coef) with kind in d1/d2/d3/s3."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("ts")))
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        h = (ts // 3_600_000_000) % 24
        u, c = np.unique(h, return_counts=True)
        return pa.table({"hour": pa.array(u.astype(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    agg = (ds.map_batches(part, batch_format="pyarrow").to_pandas())
    x = np.zeros(HAAR_GRID, dtype=np.int64)
    if not agg.empty:
        g = agg.groupby("hour")["n"].sum()
        x[g.index.to_numpy(np.int64)] = g.to_numpy(np.int64)
    rows = []
    cur = x
    for level in (1, 2, 3):
        s = cur[0::2] + cur[1::2]
        d = cur[0::2] - cur[1::2]
        for i, dv in enumerate(d):
            rows.append((f"d{level}", i, int(dv)))
        cur = s
    for i, sv in enumerate(cur):
        rows.append(("s3", i, int(sv)))
    return pd.DataFrame(rows, columns=["kind", "idx", "coef"]) \
        .astype({"idx": np.int64, "coef": np.int64}) \
        .sort_values(["kind", "idx"]).reset_index(drop=True)


VOCAB_COVERAGE_RANKS = (10, 100, 1000)


def vocab_coverage_curve(sf_dir: str):
    """Zipf coverage audit for tokenizer sizing: what share of ALL token
    occurrences do the top-10 / top-100 / top-1000 words (by count
    desc, word asc) cover — exact floor-ppm off the distributed
    vocabulary fold (word-bounded driver state, the
    vocabulary_top_words shape). Emits (top_k, n_words_at_k,
    covered, total, coverage_ppm) — n_words_at_k < top_k when the
    vocabulary is smaller."""
    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        flat, _, _ = _flatten_words_arrow(col)
        g = (pa.table({"word": flat}).group_by(["word"])
             .aggregate([([], "count_all")]))
        return pa.table({"word": g.column("word"),
                         "n": g.column("count_all").cast(pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("word").sum("n").to_pandas()
           .rename(columns={"sum(n)": "n"}))
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in [
        "top_k", "n_words_at_k", "covered", "total", "coverage_ppm"]})
    if agg.empty:
        return empty
    agg = agg.sort_values(["n", "word"], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    total = int(agg["n"].sum())
    cum = np.cumsum(agg["n"].to_numpy(np.int64))
    rows = []
    for k in VOCAB_COVERAGE_RANKS:
        kk = min(k, len(agg))
        cov = int(cum[kk - 1])
        rows.append((k, kk, cov, total, (1_000_000 * cov) // total))
    return pd.DataFrame(rows, columns=["top_k", "n_words_at_k",
                                       "covered", "total",
                                       "coverage_ppm"]) \
        .astype(np.int64)


SURVIVAL_MAX_DAY = 29


def user_lifetime_survival(sf_dir: str):
    """Empirical survival curve of user lifetimes (Kaplan-Meier with no
    censoring reduces to this): for each day d in 0..29, how many users
    have lifetime floor((last_ts - first_ts) / 1 day) >= d, as
    floor-ppm of all users. One narrow Min/Max groupby per user, then a
    bounded 30-slot driver fold. Emits (day, n_surviving,
    survival_ppm)."""
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def narrow(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("user_id")),
                    pc.is_valid(b.column("ts")))
        b = b.filter(m)
        return pa.table({
            "user_id": pa.array(b.column("user_id")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64)),
            "ts_us": b.column("ts").cast(pa.int64())})

    agg = (ds.map_batches(narrow, batch_format="pyarrow")
           .groupby("user_id")
           .aggregate(Min("ts_us", alias_name="mn"),
                      Max("ts_us", alias_name="mx"))
           .to_pandas())
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in [
        "day", "n_surviving", "survival_ppm"]})
    if agg.empty:
        return empty
    life = ((agg["mx"].to_numpy(np.int64)
             - agg["mn"].to_numpy(np.int64))
            // 86_400_000_000).astype(np.int64)
    n = len(life)
    rows = []
    for d in range(SURVIVAL_MAX_DAY + 1):
        surv = int((life >= d).sum())
        rows.append((d, surv, (1_000_000 * surv) // n))
    return pd.DataFrame(rows, columns=["day", "n_surviving",
                                       "survival_ppm"]).astype(np.int64)


SPEARMAN_FOLD_CAP = 10_000_000   # rows; past it the histogram groupby runs


def spearman_quantity_price(sf_dir: str):
    """Tie-aware SPEARMAN rank correlation between lineitem quantity
    (whole units) and extended price (floor dollars) — the
    scale-robust complement of corr_quantity_price's Pearson and
    kendall_tau's concordance: Pearson over DOUBLED average ranks
    r2(v) = 2*cnt_less(v) + cnt_eq(v) + 1, which are pure integers, so
    all six moment sums are exact and the mirror is digit-for-digit.
    Two passes:

    1. ONE stateless pass folds BOTH marginal (value, count)
       histograms (rows tagged var 0/1 into a single domain-bounded
       groupby); driver cumsums turn each into its r2 rank map
       (r2 = 2*cum - cnt + 1), broadcast once via ray.put;
    2. a second stateless pass looks ranks up with two searchsorted
       probes and folds the six moment partials (one row per batch;
       the driver sums tens of rows).

    Emits ONE row (n, sum_x, sum_y, sum_xy, sum_x2, sum_y2) of the
    doubled-rank moments; rho = (n*sxy - sx*sy) /
    sqrt((n*sx2 - sx^2) * (n*sy2 - sy^2)) for the consumer. Component
    magnitudes are O(n^3) — int64-exact through ~10^6 rows (the tested
    tier; the SQL mirror runs HUGEINT throughout), past which the
    consumer derives rho from n-scaled floats."""
    import ray

    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice"])

    def xy(b: pa.Table) -> pa.Table:
        return pa.table({
            "x": pa.array(_cents(b.column("l_quantity").to_numpy(
                zero_copy_only=False)) // 100),
            "y": pa.array(_cents(b.column("l_extendedprice").to_numpy(
                zero_copy_only=False)) // 100)})

    # 16 B/row projection materialized ONCE: both passes stream it from
    # the object store instead of re-reading + re-decoding the parquet
    base = ds.map_batches(xy, batch_format="pyarrow").materialize()

    def hist_part(b: pa.Table) -> pa.Table:
        ux, cx = np.unique(b.column("x").to_numpy(zero_copy_only=False),
                           return_counts=True)
        uy, cy = np.unique(b.column("y").to_numpy(zero_copy_only=False),
                           return_counts=True)
        return pa.table({
            "var": pa.array(np.concatenate([
                np.zeros(len(ux), np.int64), np.ones(len(uy), np.int64)])),
            "val": pa.array(np.concatenate([ux, uy]).astype(np.int64)),
            "cnt": pa.array(np.concatenate([cx, cy]).astype(np.int64))})

    # histogram merge: per-block partials are value-domain-bounded, so
    # under the cap a driver pandas fold (~0.5 s) replaces the ~100k-group
    # all-to-all (~5 s measured at sf0.1) — the frequent_triples fold_cap
    # discipline; the distributed groupby takes over past it
    n_rows = _table_rows(sf_dir, "lineitem")
    parts_ds = base.map_batches(hist_part, batch_format="pyarrow")
    if n_rows is not None and n_rows <= SPEARMAN_FOLD_CAP:
        hist = (parts_ds.to_pandas()
                .groupby(["var", "val"], as_index=False)["cnt"].sum()
                .sort_values(["var", "val"]))
    else:
        from ray.data.aggregate import Sum

        hist = (parts_ds
                .groupby(["var", "val"]).aggregate(Sum("cnt", alias_name="cnt"))
                .to_pandas().sort_values(["var", "val"]))
    maps = []
    for v in (0, 1):
        sub = hist[hist["var"] == v]
        vals = sub["val"].to_numpy(np.int64)
        cnt = sub["cnt"].to_numpy(np.int64)
        cum = np.cumsum(cnt)
        maps.append((vals, 2 * cum - cnt + 1))
    ref = ray.put(tuple(maps))

    def moments(b: pa.Table, _ref=ref) -> pa.Table:
        (xv, xr), (yv, yr) = ray.get(_ref)
        rx = xr[np.searchsorted(
            xv, b.column("x").to_numpy(zero_copy_only=False))]
        ry = yr[np.searchsorted(
            yv, b.column("y").to_numpy(zero_copy_only=False))]
        return pa.table({k: pa.array([np.int64(s)]) for k, s in [
            ("n", len(rx)), ("sum_x", rx.sum()), ("sum_y", ry.sum()),
            ("sum_xy", (rx * ry).sum()), ("sum_x2", (rx * rx).sum()),
            ("sum_y2", (ry * ry).sum())]})

    part = base.map_batches(moments, batch_format="pyarrow").to_pandas()
    out = part.sum().to_frame().T.astype(np.int64)
    return out.reset_index(drop=True)


CHI2_MIN_DF = 5          # global doc-frequency floor for scored words
CHI2_TOP_K = 10


def chi2_word_lang(sf_dir: str):
    """Chi-squared FEATURE SELECTION: the top-10 words most positively
    associated with each language by the 2x2 chi-squared statistic over
    doc-level presence (the classic vocabulary/feature-selection step
    before training a lang classifier; Manning & Schuetze ch. 5). For
    word w and lang L with a = docs of L containing w, dfw = docs
    containing w, nl = docs of L, N = all docs:
    chi2_ppm = floor(1e6 * N * (a*d - b*c)^2 / (dfw*(N-dfw)*nl*(N-nl)))
    with b = dfw-a, c = nl-a, d = N-nl-b — every factor an exact count,
    the division one floor both sides compute in big ints (HUGEINT in
    the mirror). ONE pass folds per-batch DISTINCT (word, lang) doc
    counts (an Arrow group_by per batch, then a vocab x langs groupby
    — the vocabulary_top_words driver bound); lang totals ride the
    same fold as the per-lang distinct-doc sum. Scored words need
    global doc-freq >= 5, presence in not-all docs, and positive
    association (a*d > b*c). Emits (lang, word, n_docs, chi2_ppm, rk),
    rk = rank by (chi2 desc, word asc) within lang, top-10."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def present(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("text")),
                             pc.is_valid(b.column("lang"))))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "lang": pa.array([], type=pa.string()),
                             "a": pa.array([], type=pa.int64())})
        from rayschema.text import _flatten_words_arrow
        flat, _, didx = _flatten_words_arrow(col)
        lang = b.column("lang").to_numpy(zero_copy_only=False)
        t = pa.table({"word": flat,
                      "doc": pa.array(didx.astype(np.int64)),
                      "lang": pa.array(lang[didx])})
        # distinct (doc, word) -> per-(word, lang) doc counts; each doc
        # lives in exactly one batch so per-batch distinct is global
        g = t.group_by(["word", "doc", "lang"]).aggregate([([], "count_all")])
        g2 = pa.table({"word": g.column("word"), "lang": g.column("lang")}) \
            .group_by(["word", "lang"]).aggregate([([], "count_all")])
        return g2.select(['word', 'lang', 'count_all']).rename_columns(["word", "lang", "a"])

    wl = (ds.map_batches(present, batch_format="pyarrow")
          .groupby(["word", "lang"]).aggregate(Sum("a", alias_name="a"))
          .to_pandas())
    # lang doc totals: tiny exact fold over the same null contract
    def lang_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("text")),
                             pc.is_valid(b.column("lang"))))
        g = pa.table({"lang": b.column("lang")}).group_by(["lang"]) \
            .aggregate([([], "count_all")])
        return g.select(['lang', 'count_all']).rename_columns(["lang", "nl"])

    lt = (ds.map_batches(lang_part, batch_format="pyarrow")
          .groupby("lang").aggregate(Sum("nl", alias_name="nl"))
          .to_pandas())
    nl_map = dict(zip(lt["lang"], lt["nl"].astype(int)))
    n_total = int(lt["nl"].sum())
    cols = ["lang", "word", "n_docs", "chi2_ppm", "rk"]
    if wl.empty or n_total == 0:
        return pd.DataFrame({c: pd.Series(
            [], dtype=(object if c in ("lang", "word") else np.int64))
            for c in cols})
    dfw_map = wl.groupby("word")["a"].sum().astype(int).to_dict()
    rows = []
    for word, lang, a in wl[["word", "lang", "a"]].itertuples(index=False):
        a = int(a)
        dfw, nl = dfw_map[word], nl_map[lang]
        if dfw < CHI2_MIN_DF or dfw >= n_total or nl >= n_total:
            continue
        b_ = dfw - a
        c_ = nl - a
        d_ = n_total - nl - b_
        delta = a * d_ - b_ * c_
        if delta <= 0:
            continue
        chi2 = (1_000_000 * n_total * delta * delta) \
            // (dfw * (n_total - dfw) * nl * (n_total - nl))
        rows.append((lang, word, a, chi2))
    if not rows:
        return pd.DataFrame({c: pd.Series(
            [], dtype=(object if c in ("lang", "word") else np.int64))
            for c in cols})
    df = pd.DataFrame(rows, columns=["lang", "word", "n_docs", "chi2_ppm"])
    df = df.sort_values(["lang", "chi2_ppm", "word"],
                        ascending=[True, False, True], kind="mergesort")
    df["rk"] = df.groupby("lang").cumcount() + 1
    df = df[df["rk"] <= CHI2_TOP_K].reset_index(drop=True)
    return df.astype({"n_docs": np.int64, "chi2_ppm": np.int64,
                      "rk": np.int64})


def gini_stump_value_purchase(sf_dir: str):
    """Decision-STUMP training: the best threshold on event value (in
    exact cents) separating purchases from the rest by weighted Gini
    impurity — the split-scoring primitive of every tree learner, run
    as one distributed histogram fold. Minimizing weighted Gini
    n_L/n*(1-pL^2-qL^2) + n_R/n*(...) is minimizing the integer-exact
    fraction (aL*bL*nR + aR*bR*nL) / (nL*nR) (a = purchases,
    b = non-purchases); candidates are 'value <= t' at every distinct
    observed cents with a non-empty right side. The per-candidate
    score is emitted as floor(1e12 * num / den) — big-int on the
    driver, HUGEINT in the mirror — and the winner is
    (score asc, threshold asc), so both sides resolve identically.
    ONE map_batches pass folds the (cents, n, purchases) histogram
    (domain-bounded driver state); the cumsum scan over distinct
    values is driver arithmetic. Emits ONE row (threshold_cents,
    n_left, n_purchase_left, n_right, n_purchase_right, score_p12)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        if b.num_rows == 0:
            return pa.table({"cents": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "a": pa.array([], type=pa.int64())})
        cents = _cents(b.column("value").to_numpy(zero_copy_only=False))
        et = b.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        isp = (et.to_numpy(zero_copy_only=False) == "purchase") \
            .astype(np.int64)
        df = pd.DataFrame({"cents": cents, "a": isp})
        g = df.groupby("cents", as_index=False).agg(
            n=("a", "size"), a=("a", "sum"))
        return pa.table({"cents": pa.array(g["cents"].to_numpy(np.int64)),
                         "n": pa.array(g["n"].to_numpy(np.int64)),
                         "a": pa.array(g["a"].to_numpy(np.int64))})

    hist = (ds.map_batches(part, batch_format="pyarrow")
            .groupby("cents")
            .aggregate(Sum("n", alias_name="n"), Sum("a", alias_name="a"))
            .to_pandas().sort_values("cents"))
    cols = ["threshold_cents", "n_left", "n_purchase_left", "n_right",
            "n_purchase_right", "score_p12"]
    if hist.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    v = hist["cents"].to_numpy(np.int64)
    n = hist["n"].to_numpy(np.int64)
    a = hist["a"].to_numpy(np.int64)
    nt, at = int(n.sum()), int(a.sum())
    nl_c, al_c = np.cumsum(n), np.cumsum(a)
    best = None
    for i in range(len(v) - 1):          # right side must be non-empty
        nl, al = int(nl_c[i]), int(al_c[i])
        nr, ar = nt - nl, at - al
        num = al * (nl - al) * nr + ar * (nr - ar) * nl
        score = (10 ** 12 * num) // (nl * nr)
        key = (score, int(v[i]))
        if best is None or key < best[0]:
            best = (key, (int(v[i]), nl, al, nr, ar, score))
    if best is None:                     # single distinct value: no split
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    return pd.DataFrame([best[1]], columns=cols).astype(np.int64)


def conversion_latency_quartiles(sf_dir: str):
    """Funnel LATENCY profile: minutes from each user's FIRST view to
    their FIRST purchase (users whose first purchase follows their
    first view), summarized as exact interpolated quartiles in
    QUADRUPLED minutes — pos4 = (n-1)*q splits into lo = pos4 // 4 and
    remainder r, and gap4 = g[lo]*(4-r) + g[lo+1]*r is a pure integer,
    so percentile_cont semantics cross the oracle with no float (the
    med2 trick generalized to quarters). ONE groupby(user) with two
    sentinel Min aggregates finds the firsts (24 B/user shuffle); the
    per-user gaps fold to a (gap_min, count) histogram partial pass,
    and the quartile reads off the driver cumsum. Emits one row per
    q in 1..3: (q, n_users, gap4_min)."""
    from ray.data.aggregate import Min

    SENT = np.int64(2 ** 62)
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def narrow(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("user_id")),
                             pc.is_valid(b.column("ts"))))
        et = b.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        etn = et.to_numpy(zero_copy_only=False)
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": pa.array(b.column("user_id")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64)),
            "v_us": pa.array(np.where(etn == "view", ts, SENT)),
            "p_us": pa.array(np.where(etn == "purchase", ts, SENT))})

    firsts = (ds.map_batches(narrow, batch_format="pyarrow")
              .groupby("user_id")
              .aggregate(Min("v_us", alias_name="v"),
                         Min("p_us", alias_name="p")))

    def gap_hist(b: pa.Table) -> pa.Table:
        v = b.column("v").to_numpy(zero_copy_only=False)
        p = b.column("p").to_numpy(zero_copy_only=False)
        ok = (v < SENT) & (p < SENT) & (p > v)
        gaps = (p[ok] - v[ok]) // 60_000_000
        u, c = np.unique(gaps, return_counts=True)
        return pa.table({"gap_min": pa.array(u.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    from ray.data.aggregate import Sum

    hist = (firsts.map_batches(gap_hist, batch_format="pyarrow")
            .groupby("gap_min").aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas().sort_values("gap_min"))
    cols = ["q", "n_users", "gap4_min"]
    if hist.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    g = hist["gap_min"].to_numpy(np.int64)
    c = hist["cnt"].to_numpy(np.int64)
    cum = np.cumsum(c)
    n = int(cum[-1])
    rows = []
    for q in (1, 2, 3):
        pos4 = (n - 1) * q
        lo, r = pos4 // 4, pos4 % 4
        glo = int(g[np.searchsorted(cum, lo + 1)])
        ghi = int(g[np.searchsorted(cum, min(lo + (1 if r else 0),
                                             n - 1) + 1)])
        rows.append((q, n, glo * (4 - r) + ghi * r))
    return pd.DataFrame(rows, columns=cols).astype(np.int64)


FEATHASH_K = 64


def feature_hash_buckets(sf_dir: str):
    """Hashing-trick feature audit: the global signed feature-hash
    histogram over word tokens — each token lands in bucket ``h % 64``
    with sign +1/-1 from bit 6 of the SQL-mirrorable 62-bit
    codepoint-polynomial token hash (dedup.poly_token_hash, the SimHash
    family hash), so the per-doc hashed vectors a trainer would emit
    fold into exactly these totals (collision mass, sign balance and
    doc reach per feature slot — the audit that sizes the hash width).
    ONE stateless pass: per block a 64-bin bincount triple (token
    count, signed sum, distinct-doc count — a doc never spans batches),
    64-row partials folded on the driver. Emits
    (bucket, n_tokens, signed_sum, n_docs) for non-empty buckets."""
    import re

    from rayschema.dedup import poly_token_hash

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    word = re.compile(r"[A-Za-z0-9_]+")
    k = FEATHASH_K

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        toks, lens = [], []
        for t in b.column("text").to_pylist():
            w = word.findall(t)
            toks.extend(w)
            lens.append(len(w))
        empty = pa.table({"bucket": pa.array([], type=pa.int64()),
                          "n_tokens": pa.array([], type=pa.int64()),
                          "signed_sum": pa.array([], type=pa.int64()),
                          "n_docs": pa.array([], type=pa.int64())})
        if not toks:
            return empty
        h = poly_token_hash(toks)
        bucket = (h % np.uint64(k)).astype(np.int64)
        sgn = 1 - 2 * ((h >> np.uint64(6)) & np.uint64(1)).astype(np.int64)
        n_tok = np.bincount(bucket, minlength=k)
        s_sum = np.bincount(bucket, weights=sgn, minlength=k) \
            .astype(np.int64)
        di = np.repeat(np.arange(len(lens), dtype=np.int64),
                       np.asarray(lens, dtype=np.int64))
        pairs = np.unique(di * k + bucket)
        n_doc = np.bincount(pairs % k, minlength=k)
        return pa.table({"bucket": pa.array(np.arange(k, dtype=np.int64)),
                         "n_tokens": pa.array(n_tok.astype(np.int64)),
                         "signed_sum": pa.array(s_sum),
                         "n_docs": pa.array(n_doc.astype(np.int64))})

    agg = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    cols = ["bucket", "n_tokens", "signed_sum", "n_docs"]
    if agg.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    g = agg.groupby("bucket", as_index=False).sum()
    g = g[g["n_tokens"] > 0].sort_values("bucket").reset_index(drop=True)
    return g[cols].astype(np.int64)


def scd2_user_state(sf_dir: str):
    """Warehouse SCD2 (slowly-changing-dimension type 2) derivation:
    each user's event_type timeline collapsed to validity intervals —
    one row per consecutive same-type run in (ts, event_id) order with
    valid_from_us = the run's first timestamp, valid_to_us = the NEXT
    run's first timestamp (-1 for the still-open current state), and
    the run's event count. ONE user-keyed sorted_group_scan (the
    sessionization shape); run boundaries are one vectorized neighbor
    compare per group — mirrors the oracle's rn - rn_by_type island
    trick + LEAD. Emits (user_id, scd_rn, event_type, valid_from_us,
    valid_to_us, n_events)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("scd_rn", pa.int64()),
                            ("event_type", pa.string()),
                            ("valid_from_us", pa.int64()),
                            ("valid_to_us", pa.int64()),
                            ("n_events", pa.int64())])

    def group_fn(g: pa.Table) -> pa.Table:
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        uid = int(g.column("user_id")[0].as_py())
        n = len(et)
        if n == 0:
            return None
        starts = np.flatnonzero(
            np.concatenate([[True], et[1:] != et[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        vf = ts[starts].astype(np.int64)
        vt = np.concatenate([vf[1:], [-1]]).astype(np.int64)
        r = len(starts)
        return pa.table({
            "user_id": pa.array(np.full(r, uid, dtype=np.int64)),
            "scd_rn": pa.array(np.arange(1, r + 1, dtype=np.int64)),
            "event_type": pa.array([str(x) for x in et[starts]],
                                   type=pa.string()),
            "valid_from_us": pa.array(vf),
            "valid_to_us": pa.array(vt),
            "n_events": pa.array((ends - starts).astype(np.int64))})

    scan = sorted_group_scan(
        ds.map_batches(_narrow_events, batch_format="pyarrow"),
        ["user_id"], group_fn, out_schema,
        order_cols=["ts_us", "event_id"])
    return (scan.to_pandas().sort_values(["user_id", "scd_rn"])
            .reset_index(drop=True))


# month-index grid for the in-flight sweep: months since 1990-01,
# 240 slots (1990-01 .. 2009-12) — generously brackets the synthetic
# order-date range (1995-2001); out-of-grid dates raise, never clip.
FLIGHT_BASE_M = (1990 - 1970) * 12
FLIGHT_SLOTS = 240


def orders_in_flight_monthly(sf_dir: str):
    """Interval sweep-line: how many orders are IN FLIGHT (placed but
    not yet fully shipped: o_orderdate <= d <= max l_shipdate) at each
    month start — the WIP/backlog curve. Per-order intervals come from
    ONE orderkey-keyed exchange: per-block partial max(shipdate) from
    lineitem unioned with (orderkey, orderdate) from orders, folded on
    the driver under the shared merge cap (orderkey-bounded state;
    groupby(orderkey).max past it — same adaptive gate as
    exact-dedup). The sweep itself never materializes per-day rows:
    each interval contributes +1/-1 to a 240-slot month-grid delta
    histogram inside map_batches; the driver folds and prefix-sums 240
    ints. Orders with no lineitems drop (inner-join semantics). Emits
    (yr, mon, n_open) for months with n_open > 0."""
    from ray.data.aggregate import Max

    day_us = 86_400_000_000

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"])

    def li_part(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        e = (b.column("l_shipdate").cast(pa.int64())
             .to_numpy(zero_copy_only=False) // day_us)
        df = pd.DataFrame({"ok": ok, "d": e}) \
            .groupby("ok", as_index=False).max()
        return pa.table({"ok": pa.array(df["ok"].to_numpy(np.int64)),
                         "s_day": pa.array(np.full(len(df), -1,
                                                   dtype=np.int64)),
                         "e_day": pa.array(df["d"].to_numpy(np.int64))})

    def o_part(b: pa.Table) -> pa.Table:
        ok = b.column("o_orderkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        s = (b.column("o_orderdate").cast(pa.int64())
             .to_numpy(zero_copy_only=False) // day_us)
        return pa.table({"ok": pa.array(ok),
                         "s_day": pa.array(s.astype(np.int64)),
                         "e_day": pa.array(np.full(len(ok), -1,
                                                   dtype=np.int64))})

    both = (li.map_batches(li_part, batch_format="pyarrow")
            .union(orders.map_batches(o_part, batch_format="pyarrow")))

    def delta_of(s_day: np.ndarray, e_day: np.ndarray) -> np.ndarray:
        """+1/-1 month-grid delta histogram for [s, e] day intervals."""
        s = s_day.astype("datetime64[D]")
        e = e_day.astype("datetime64[D]")
        s_m = s.astype("datetime64[M]")
        a = (s_m.astype(np.int64)
             + (s != s_m.astype("datetime64[D]")).astype(np.int64)
             - FLIGHT_BASE_M)
        bnd = e.astype("datetime64[M]").astype(np.int64) - FLIGHT_BASE_M
        if len(a) and (a.min() < 0 or bnd.max() >= FLIGHT_SLOTS):
            raise ValueError(
                "order dates outside the 1990-2009 sweep grid")
        delta = np.zeros(FLIGHT_SLOTS + 1, dtype=np.int64)
        keep = a <= bnd
        np.add.at(delta, a[keep], 1)
        np.add.at(delta, bnd[keep] + 1, -1)
        return delta

    n_orders = _table_rows(sf_dir, "orders")
    if n_orders is not None and n_orders <= TRIPLE_DRIVER_MERGE_CAP:
        iv = both.to_pandas().groupby("ok", as_index=False).max()
        iv = iv[(iv["s_day"] >= 0) & (iv["e_day"] >= 0)]
        delta = delta_of(iv["s_day"].to_numpy(np.int64),
                         iv["e_day"].to_numpy(np.int64))
    else:
        # scale path: intervals never reach the driver — each grouped
        # block folds to one 241-int delta partial inside map_batches
        def block_delta(b: pa.Table) -> pa.Table:
            s = b.column("s_day").to_numpy(zero_copy_only=False)
            e = b.column("e_day").to_numpy(zero_copy_only=False)
            m = (s >= 0) & (e >= 0)
            d = delta_of(s[m].astype(np.int64), e[m].astype(np.int64))
            return pa.table({
                "idx": pa.array(np.arange(FLIGHT_SLOTS + 1,
                                          dtype=np.int64)),
                "d": pa.array(d)})

        parts = (both.groupby("ok")
                 .aggregate(Max("s_day", alias_name="s_day"),
                            Max("e_day", alias_name="e_day"))
                 .map_batches(block_delta, batch_format="pyarrow")
                 .to_pandas())
        delta = np.zeros(FLIGHT_SLOTS + 1, dtype=np.int64)
        if not parts.empty:
            g = parts.groupby("idx")["d"].sum()
            delta[g.index.to_numpy(np.int64)] = g.to_numpy(np.int64)
    n_open = np.cumsum(delta[:FLIGHT_SLOTS])
    idx = np.flatnonzero(n_open > 0)
    months = idx + FLIGHT_BASE_M
    return pd.DataFrame({
        "yr": months // 12 + 1970,
        "mon": months % 12 + 1,
        "n_open": n_open[idx]}).astype(np.int64)


DBSCAN_SCOPE = 300
DBSCAN_EPS2 = 1_420_000_000_000   # eps^2 on 1e-6-quantized coordinates
DBSCAN_MIN_PTS = 5                # neighborhood count INCLUDING the point


def dbscan_embeddings(sf_dir: str):
    """Density-based clustering (DBSCAN) over the vec_id < 300
    ground-truth scope (the mutual_nn / exact_jaccard convention: an
    oracled audit at a stated bound — the full-corpus scale path is
    LSH-bucketed neighbor candidates + the distributed union-find that
    near_dup_clusters_distributed already ships). Distances are exact
    integer squared euclidean on 1e-6-quantized coordinates (the
    kmeans_quantized convention), so core/border/noise and the
    min-vec-id component labels are all hash-checkable: core iff
    |N_eps(p)| >= 5 (self included), clusters = connected components
    of the core-core eps-graph labeled by min core id, border points
    take the min label among their core neighbors, noise labels -1.
    Emits (vec_id, role, cluster)."""
    from rayschema.dedup import round_half_away

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sub = (ds.filter(expr=f"vec_id < {DBSCAN_SCOPE}").to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    cols = ["vec_id", "role", "cluster"]
    if sub.empty:
        return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                             "role": pd.Series([], dtype=object),
                             "cluster": pd.Series([], dtype=np.int64)})
    ids = sub["vec_id"].to_numpy(np.int64)
    q = round_half_away(np.stack(sub["embedding"].to_numpy())
                        .astype(np.float64) * 1e6, 0).astype(np.int64)
    d2 = ((q[:, None, :] - q[None, :, :]) ** 2).sum(-1)
    near = d2 <= DBSCAN_EPS2                      # includes self (d2=0)
    core = near.sum(1) >= DBSCAN_MIN_PTS
    n = len(ids)
    # min-label components over the core-core eps-graph (path halving)
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    ci = np.flatnonzero(core)
    for a in ci:
        for b in np.flatnonzero(near[a] & core):
            ra, rb = find(a), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)   # min-id root wins
    label = np.full(n, -1, dtype=np.int64)
    for a in ci:
        label[a] = ids[find(a)]
    role = np.where(core, "core", "noise").astype(object)
    for a in np.flatnonzero(~core):
        cn = near[a] & core
        if cn.any():
            role[a] = "border"
            label[a] = label[np.flatnonzero(cn)].min()
    return pd.DataFrame({"vec_id": ids, "role": role,
                         "cluster": label})[cols] \
        .astype({"vec_id": np.int64, "cluster": np.int64})


BOOT_B = 16                  # bootstrap replicates
BOOT_MOD = 1000003           # weight-hash modulus (prime)
BOOT_MUL = 2654435761        # Knuth multiplicative constant


def bootstrap_ci_value(sf_dir: str):
    """Deterministic multiplier bootstrap for the mean event value per
    type: 16 replicates with integer weights w = ((event_id * K + b*97)
    % 1000003) % 3 in {0,1,2} (E[w]=1 — the Poisson-bootstrap shape
    with a reproducible hash instead of RNG, so resampling inference
    becomes oracle-checkable). ONE stateless pass: each block emits 16
    (type, b, sum_w, sum_w*cents) partials per type — no 16x row
    expansion anywhere (the oracle pays the cross join; the engine
    does 16 vectorized fused passes per block); a types*16-row groupby
    folds them. The replicate spread IS the CI: read the 2.5%/97.5%
    replicate means off the 16 rows. event_id reduces mod 1000003
    BEFORE the multiply (congruence-identical, overflow-safe at any
    id). Emits (event_type, b, n_eff, mean_milli_cents)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("value")),
                             pc.is_valid(b.column("event_type"))))
        eid = b.column("event_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False) % BOOT_MOD
        cents = _cents(b.column("value").to_numpy(zero_copy_only=False))
        codes, uniq = pd.factorize(
            b.column("event_type").to_numpy(zero_copy_only=False),
            sort=True)
        k = len(uniq)
        # one factorize + 2 bincounts per replicate — no per-rep
        # DataFrame churn (16 pandas groupbys cost ~4x this)
        ws = np.empty((BOOT_B, k), dtype=np.int64)
        wvs = np.empty((BOOT_B, k), dtype=np.int64)
        for rep in range(BOOT_B):
            w = ((eid * BOOT_MUL + rep * 97) % BOOT_MOD) % 3
            ws[rep] = np.bincount(codes, weights=w, minlength=k)
            wvs[rep] = np.bincount(codes, weights=w * cents,
                                   minlength=k)
        reps = np.repeat(np.arange(BOOT_B, dtype=np.int64), k)
        return pa.table({
            "event_type": pa.array([str(u) for u in uniq] * BOOT_B),
            "b": pa.array(reps),
            "w": pa.array(ws.ravel()),
            "wv": pa.array(wvs.ravel())})

    agg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby(["event_type", "b"])
           .aggregate(Sum("w", alias_name="w"),
                      Sum("wv", alias_name="wv")).to_pandas())
    cols = ["event_type", "b", "n_eff", "mean_milli_cents"]
    if agg.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "b": pd.Series([], dtype=np.int64),
                             "n_eff": pd.Series([], dtype=np.int64),
                             "mean_milli_cents": pd.Series(
                                 [], dtype=np.int64)})
    agg = agg[agg["w"] > 0]
    agg["n_eff"] = agg["w"].astype(np.int64)
    # floor division toward -inf matches the SQL // convention only for
    # non-negative sums; values are non-negative cents so wv >= 0
    agg["mean_milli_cents"] = (1000 * agg["wv"].astype(np.int64)
                               // agg["n_eff"])
    return (agg[cols].astype({"b": np.int64, "n_eff": np.int64,
                              "mean_milli_cents": np.int64})
            .sort_values(["event_type", "b"]).reset_index(drop=True))


HLL_M = 64                    # registers (top-6-bit split of a 32-bit hash)
HLL_WBITS = 26                # low-bit window scanned for the leading 1


def hll_registers_cert(sf_dir: str):
    """HyperLogLog register certification over event user ids (the
    CMS/Bloom discipline: make the sketch construction itself
    SQL-mirrorable, then the engine's distributed build is checkable
    hash-for-hash instead of rows-only). h = (user_id * 2654435761)
    mod 2^32 (the cms_user_event_counts multiplicative plane);
    register = top 6 bits, rho = leading zeros of the low-26-bit
    window + 1 (27 when the window is 0). Duplicate users can't move a
    max, so the pass needs NO distinct: each block folds to <= 64
    (register, max_rho) partials, the driver folds 64 ints. The
    harmonic estimate is one driver expression over these registers —
    the certified artifact is the register vector. Emits
    (register, max_rho)."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    def part(b: pa.Table) -> pa.Table:
        u = b.column("user_id")
        u = pc.drop_null(u).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(u) == 0:
            return pa.table({"register": pa.array([], type=pa.int64()),
                             "max_rho": pa.array([], type=pa.int64())})
        h = (u * np.uint64(2654435761)) % np.uint64(1 << 32)
        reg = (h >> np.uint64(HLL_WBITS)).astype(np.int64)
        w = (h & np.uint64((1 << HLL_WBITS) - 1)).astype(np.int64)
        # frexp exponent == bit_length, exact for ints < 2^53; w == 0
        # gives exponent 0 -> rho 27 (all-zero window)
        rho = HLL_WBITS + 1 - np.frexp(w.astype(np.float64))[1]
        mx = np.zeros(HLL_M, dtype=np.int64)
        np.maximum.at(mx, reg, rho)
        keep = np.flatnonzero(mx > 0)
        return pa.table({"register": pa.array(keep.astype(np.int64)),
                         "max_rho": pa.array(mx[keep])})

    agg = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if agg.empty:
        return pd.DataFrame({"register": pd.Series([], dtype=np.int64),
                             "max_rho": pd.Series([], dtype=np.int64)})
    g = (agg.groupby("register", as_index=False)["max_rho"].max()
         .sort_values("register").reset_index(drop=True))
    return g.astype(np.int64)


def twap_user_value(sf_dir: str):
    """Time-weighted average value per user (the TWAP / LOCF-integral:
    each event's value holds until the next event, so the average is
    sum(cents_i * dt_i) / sum(dt_i) over consecutive gaps — the metric
    that ignores burst sampling). ONE user-keyed sorted_group_scan in
    (ts, event_id) order; per group the numerator is one vectorized
    dot of cents[:-1] with the us gaps (int64-exact while max_cents *
    user_span_us < 2^63 — ~6e13 dollar-years; the HUGEINT-style object
    fold is the documented wider-corpus path), floor-milli at the end.
    Users whose events all share one timestamp (zero duration) drop.
    Emits (user_id, dur_us, twa_milli_cents)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "value"])

    def narrow(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("user_id")),
                             pc.and_(pc.is_valid(b.column("ts")),
                                     pc.is_valid(b.column("value")))))
        return pa.table({
            "user_id": pa.array(b.column("user_id")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64)),
            "ts_us": pa.array(b.column("ts").cast(pa.int64())
                              .to_numpy(zero_copy_only=False)),
            "event_id": pa.array(b.column("event_id")
                                 .to_numpy(zero_copy_only=False)
                                 .astype(np.int64)),
            "cents": pa.array(_cents(b.column("value")
                                     .to_numpy(zero_copy_only=False)))})

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("dur_us", pa.int64()),
                            ("twa_milli_cents", pa.int64())])

    def group_fn(g: pa.Table) -> pa.Table:
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        c = g.column("cents").to_numpy(zero_copy_only=False)
        if len(ts) < 2:
            return None
        dt = np.diff(ts)
        den = int(dt.sum())
        if den == 0:
            return None
        num = int((c[:-1] * dt).sum())
        uid = int(g.column("user_id")[0].as_py())
        return pa.table({
            "user_id": pa.array([uid], type=pa.int64()),
            "dur_us": pa.array([den], type=pa.int64()),
            "twa_milli_cents": pa.array([(1000 * num) // den],
                                        type=pa.int64())})

    scan = sorted_group_scan(
        ds.map_batches(narrow, batch_format="pyarrow"),
        ["user_id"], group_fn, out_schema,
        order_cols=["ts_us", "event_id"])
    return (scan.to_pandas().sort_values("user_id")
            .reset_index(drop=True))


KCENTER_K = 8


def kcenter_select_embeddings(sf_dir: str, k: int = KCENTER_K):
    """k-center greedy (farthest-point-first) coreset selection over
    the FULL embedding table — the diversity-sampling / active-learning
    primitive: seed with the min vec_id, then 7 rounds each adding the
    point farthest from the selected set (max min-distance, min vec_id
    on ties). Distances are exact integer squared euclidean on
    1e-6-quantized coords (the kmeans_quantized convention). The
    quantized projection materializes ONCE (the spearman two-pass
    discipline); each round is ONE stateless broadcast pass whose
    per-block partial carries the best candidate AND its vector, so the
    driver holds O(k x dim + blocks) state, never O(points). Emits
    (rnd, vec_id, d2) with d2 = squared distance to the prior
    selection (-1 for the seed)."""
    from rayschema.dedup import round_half_away

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def quant(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "q": pa.array([], type=pa.list_(
                                 pa.int64()))})
        m = round_half_away(np.stack(
            b.column("embedding").to_pandas().to_numpy())
            .astype(np.float64) * 1e6, 0).astype(np.int64)
        return pa.table({"vec_id": pa.array(ids),
                         "q": pa.array(list(m),
                                       type=pa.list_(pa.int64()))})

    proj = ds.map_batches(quant, batch_format="pyarrow").materialize()
    empty_out = pd.DataFrame({"rnd": pd.Series([], dtype=np.int64),
                              "vec_id": pd.Series([], dtype=np.int64),
                              "d2": pd.Series([], dtype=np.int64)})

    _EMPTY = pa.table({"vec_id": pa.array([], type=pa.int64()),
                       "d2": pa.array([], type=pa.int64()),
                       "q": pa.array([], type=pa.list_(pa.int64()))})

    def round_pass(sel_mat, sel_ids_sorted):
        """One block-parallel pass: per block, the best candidate
        (max d2-to-selection, min id; seed round: min id) + its
        quantized vector."""

        def score(b: pa.Table) -> pa.Table:
            ids = b.column("vec_id").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if len(ids) == 0:
                return _EMPTY
            qm = np.stack(b.column("q").to_pandas().to_numpy()) \
                .astype(np.int64)
            if sel_mat is None:
                i = int(np.argmin(ids))
                d = -1
            else:
                dmin = ((qm[:, None, :] - sel_mat[None, :, :]) ** 2) \
                    .sum(-1).min(1)
                cand = ~np.isin(ids, sel_ids_sorted)
                if not cand.any():
                    return _EMPTY
                j = np.lexsort((ids[cand], -dmin[cand]))[0]
                i = int(np.flatnonzero(cand)[j])
                d = int(dmin[i])
            return pa.table({"vec_id": pa.array([int(ids[i])]),
                             "d2": pa.array([d], type=pa.int64()),
                             "q": pa.array([list(qm[i])],
                                           type=pa.list_(pa.int64()))})

        got = proj.map_batches(score, batch_format="pyarrow") \
            .to_pandas()
        if got.empty:
            return None
        if sel_mat is None:
            got = got.sort_values("vec_id")
        else:
            got = got.sort_values(["d2", "vec_id"],
                                  ascending=[False, True])
        w = got.iloc[0]
        return int(w["vec_id"]), int(w["d2"]), \
            np.asarray(w["q"], dtype=np.int64)

    first = round_pass(None, None)
    if first is None:
        return empty_out
    rows = [(1, first[0], -1)]
    sel_mat = first[2][None, :]
    sel_ids = [first[0]]
    for rnd in range(2, k + 1):
        nxt = round_pass(sel_mat, np.sort(np.asarray(sel_ids,
                                                     dtype=np.int64)))
        if nxt is None:
            break
        rows.append((rnd, nxt[0], nxt[1]))
        sel_mat = np.vstack([sel_mat, nxt[2][None, :]])
        sel_ids.append(nxt[0])
    return pd.DataFrame(rows, columns=["rnd", "vec_id", "d2"]) \
        .astype(np.int64)


# (name, integer-scaling) for the lineitem correlation matrix: whole
# quantity units, whole price dollars, discount/tax basis points —
# every moment stays int64-exact past sf1000
CORRM_VARS = ("qty", "price", "disc", "tax")


def corr_matrix_lineitem(sf_dir: str):
    """Full Pearson correlation matrix over the four lineitem numerics
    (quantity units, whole price dollars, discount bp, tax bp) — the
    multicollinearity screen before any modeling. ONE stateless pass:
    each block folds X^T X once (4x4 integer moments via one matmul)
    and emits six per-pair partial rows; a 6-key groupby merges. The
    corr_ppm is the corr_quantity_price fixed-order float64 expression.
    Emits (var_a, var_b, n, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
    corr_ppm) for the six unordered pairs."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice",
                        "l_discount", "l_tax"])

    pairs = [(i, j) for i in range(4) for j in range(i + 1, 4)]

    def partial(b: pa.Table) -> pa.Table:
        X = np.column_stack([
            _cents(b.column("l_quantity").to_numpy(
                zero_copy_only=False)) // 100,
            _cents(b.column("l_extendedprice").to_numpy(
                zero_copy_only=False)) // 100,
            np.round(b.column("l_discount").to_numpy(
                zero_copy_only=False) * 10000).astype(np.int64),
            np.round(b.column("l_tax").to_numpy(
                zero_copy_only=False) * 10000).astype(np.int64)])
        s = X.sum(0)
        m = X.T @ X
        n = len(X)
        rows = {"var_a": [], "var_b": [], "n": [], "sum_x": [],
                "sum_y": [], "sum_xy": [], "sum_x2": [], "sum_y2": []}
        for i, j in pairs:
            rows["var_a"].append(CORRM_VARS[i])
            rows["var_b"].append(CORRM_VARS[j])
            rows["n"].append(n)
            rows["sum_x"].append(int(s[i]))
            rows["sum_y"].append(int(s[j]))
            rows["sum_xy"].append(int(m[i, j]))
            rows["sum_x2"].append(int(m[i, i]))
            rows["sum_y2"].append(int(m[j, j]))
        return pa.table({k: pa.array(v, type=pa.int64())
                         if k not in ("var_a", "var_b")
                         else pa.array(v, type=pa.string())
                         for k, v in rows.items()})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["var_a", "var_b"])
           .aggregate(*[Sum(c, alias_name=c)
                        for c in ("n", "sum_x", "sum_y", "sum_xy",
                                  "sum_x2", "sum_y2")])
           .to_pandas())
    n = out["n"].to_numpy(np.float64)
    sx = out["sum_x"].to_numpy(np.float64)
    sy = out["sum_y"].to_numpy(np.float64)
    num = n * out["sum_xy"].to_numpy(np.float64) - sx * sy
    a = n * out["sum_x2"].to_numpy(np.float64) - sx * sx
    bb = n * out["sum_y2"].to_numpy(np.float64) - sy * sy
    den = np.sqrt(a * bb)
    out["corr_ppm"] = np.where(
        den > 0.0,
        np.floor(1000000.0 * num / np.where(den > 0, den, 1.0)),
        0.0).astype(np.int64)
    for cn in ["n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"]:
        out[cn] = out[cn].astype(np.int64)
    return (out.sort_values(["var_a", "var_b"])
            .reset_index(drop=True))


def revenue_recognition_monthly(sf_dir: str):
    """Calendarized revenue recognition: each order's total price
    (cents) spread EVENLY across the month starts it is in flight
    (the orders_in_flight_monthly interval: orderdate .. max lineitem
    shipdate), integer remainder cents going to the earliest months —
    conservation is exact, no float proration. The per-month fold is
    two +/- delta histograms over the bounded 240-slot grid (one
    weighted by the per-order base share, one marking the first `rem`
    months), so blocks fold to 241-int partials and the driver
    prefix-sums — the orders_in_flight sweep discipline with weights.
    Orders whose span contains no month start drop on both sides.
    Emits (yr, mon, recognized_cents)."""
    from ray.data.aggregate import Max

    day_us = 86_400_000_000

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate", "o_totalprice"])

    def li_part(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        e = (b.column("l_shipdate").cast(pa.int64())
             .to_numpy(zero_copy_only=False) // day_us)
        df = pd.DataFrame({"ok": ok, "d": e}) \
            .groupby("ok", as_index=False).max()
        z = len(df)
        return pa.table({"ok": pa.array(df["ok"].to_numpy(np.int64)),
                         "s_day": pa.array(np.full(z, -1, np.int64)),
                         "e_day": pa.array(df["d"].to_numpy(np.int64)),
                         "cents": pa.array(np.full(z, -1, np.int64))})

    def o_part(b: pa.Table) -> pa.Table:
        ok = b.column("o_orderkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        s = (b.column("o_orderdate").cast(pa.int64())
             .to_numpy(zero_copy_only=False) // day_us)
        c = _cents(b.column("o_totalprice").to_numpy(
            zero_copy_only=False))
        return pa.table({"ok": pa.array(ok),
                         "s_day": pa.array(s.astype(np.int64)),
                         "e_day": pa.array(np.full(len(ok), -1,
                                                   np.int64)),
                         "cents": pa.array(c)})

    both = (li.map_batches(li_part, batch_format="pyarrow")
            .union(orders.map_batches(o_part, batch_format="pyarrow")))

    def deltas_of(s_day, e_day, cents):
        s = s_day.astype("datetime64[D]")
        e = e_day.astype("datetime64[D]")
        s_m = s.astype("datetime64[M]")
        a = (s_m.astype(np.int64)
             + (s != s_m.astype("datetime64[D]")).astype(np.int64)
             - FLIGHT_BASE_M)
        bnd = e.astype("datetime64[M]").astype(np.int64) - FLIGHT_BASE_M
        keep = a <= bnd
        a, bnd, cents = a[keep], bnd[keep], cents[keep]
        if len(a) and (a.min() < 0 or bnd.max() >= FLIGHT_SLOTS):
            raise ValueError(
                "order dates outside the 1990-2009 sweep grid")
        length = bnd - a + 1
        base = cents // length
        rem = cents % length
        d = np.zeros(FLIGHT_SLOTS + 1, dtype=np.int64)
        np.add.at(d, a, base)
        np.add.at(d, bnd + 1, -base)
        dr = np.zeros(FLIGHT_SLOTS + 1, dtype=np.int64)
        np.add.at(dr, a, 1)
        np.add.at(dr, a + rem, -1)
        # dr cumsum marks months getting the +1 remainder cent ONLY
        # for the first `rem` months of each order — but different
        # orders overlap, so the +1 weight must stay per-order: the
        # unit delta works because each order contributes exactly +1
        # over [a, a+rem) and the histogram is additive across orders
        return d, dr

    n_orders = _table_rows(sf_dir, "orders")
    if n_orders is not None and n_orders <= TRIPLE_DRIVER_MERGE_CAP:
        iv = both.to_pandas().groupby("ok", as_index=False).max()
        iv = iv[(iv["s_day"] >= 0) & (iv["e_day"] >= 0)]
        d, dr = deltas_of(iv["s_day"].to_numpy(np.int64),
                          iv["e_day"].to_numpy(np.int64),
                          iv["cents"].to_numpy(np.int64))
    else:
        def block_delta(b: pa.Table) -> pa.Table:
            s = b.column("s_day").to_numpy(zero_copy_only=False)
            e = b.column("e_day").to_numpy(zero_copy_only=False)
            c = b.column("cents").to_numpy(zero_copy_only=False)
            m = (s >= 0) & (e >= 0)
            dd, ddr = deltas_of(s[m].astype(np.int64),
                                e[m].astype(np.int64),
                                c[m].astype(np.int64))
            return pa.table({
                "idx": pa.array(np.arange(FLIGHT_SLOTS + 1,
                                          dtype=np.int64)),
                "d": pa.array(dd), "dr": pa.array(ddr)})

        parts = (both.groupby("ok")
                 .aggregate(Max("s_day", alias_name="s_day"),
                            Max("e_day", alias_name="e_day"),
                            Max("cents", alias_name="cents"))
                 .map_batches(block_delta, batch_format="pyarrow")
                 .to_pandas())
        d = np.zeros(FLIGHT_SLOTS + 1, dtype=np.int64)
        dr = np.zeros(FLIGHT_SLOTS + 1, dtype=np.int64)
        if not parts.empty:
            g = parts.groupby("idx")[["d", "dr"]].sum()
            d[g.index.to_numpy(np.int64)] = g["d"].to_numpy(np.int64)
            dr[g.index.to_numpy(np.int64)] = g["dr"].to_numpy(np.int64)
    rec = np.cumsum(d[:FLIGHT_SLOTS]) + np.cumsum(dr[:FLIGHT_SLOTS])
    idx = np.flatnonzero(rec > 0)
    months = idx + FLIGHT_BASE_M
    return pd.DataFrame({
        "yr": months // 12 + 1970,
        "mon": months % 12 + 1,
        "recognized_cents": rec[idx]}).astype(np.int64)


def _ntile5(order_pos: np.ndarray, n: int) -> np.ndarray:
    """SQL ntile(5) bucket (1-based) for 0-based order positions:
    the first n%5 buckets get n//5 + 1 rows."""
    q, rem = n // 5, n % 5
    big = rem * (q + 1)
    r = order_pos
    return np.where(r < big, r // (q + 1) + 1,
                    rem + (r - big) // max(q, 1) + 1).astype(np.int64)


def rfm_user_scores(sf_dir: str):
    """RFM segmentation (recency / frequency / monetary — the classic
    churn-feature triple) per user: recency in days vs the corpus's
    last active day, event count, cents sum (null values count 0), and
    three deterministic ntile(5) scores (ties broken by user_id, so
    the SQL window is reproducible bit for bit; score 1 = most recent /
    frequent / valuable). One distributed groupby folds the per-user
    triple; scoring runs on the user-bounded frame (the shuffle-shard
    rank discipline: user-dimension driver state, two-phase histogram
    rank documented as the wider-corpus path). Emits (user_id,
    recency_days, freq, monetary_cents, r_score, f_score, m_score,
    rfm)."""
    from ray.data.aggregate import Count, Max, Sum

    day_us = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def narrow(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("user_id")),
                             pc.is_valid(b.column("ts"))))
        v = b.column("value").to_numpy(zero_copy_only=False)
        cents = np.where(np.isnan(v), 0, np.round(v * 100)) \
            .astype(np.int64)
        return pa.table({
            "user_id": pa.array(b.column("user_id")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64)),
            "day": pa.array(b.column("ts").cast(pa.int64())
                            .to_numpy(zero_copy_only=False) // day_us),
            "cents": pa.array(cents)})

    u = (ds.map_batches(narrow, batch_format="pyarrow")
         .groupby("user_id")
         .aggregate(Max("day", alias_name="last_day"),
                    Count(alias_name="freq"),
                    Sum("cents", alias_name="monetary_cents"))
         .to_pandas())
    cols = ["user_id", "recency_days", "freq", "monetary_cents",
            "r_score", "f_score", "m_score", "rfm"]
    if u.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    u = u.sort_values("user_id").reset_index(drop=True)
    uid = u["user_id"].to_numpy(np.int64)
    last = u["last_day"].to_numpy(np.int64)
    f = u["freq"].to_numpy(np.int64)
    m = u["monetary_cents"].to_numpy(np.int64)
    rec = last.max() - last
    n = len(u)

    def score(key, asc: bool):
        order = np.lexsort((uid, key if asc else -key))
        pos = np.empty(n, dtype=np.int64)
        pos[order] = np.arange(n)
        return _ntile5(pos, n)

    rs, fs, ms = score(rec, True), score(f, False), score(m, False)
    return pd.DataFrame({
        "user_id": uid, "recency_days": rec, "freq": f,
        "monetary_cents": m, "r_score": rs, "f_score": fs,
        "m_score": ms, "rfm": 100 * rs + 10 * fs + ms}) \
        .astype(np.int64)


def cohort_retention_matrix(sf_dir: str):
    """Full weekly cohort retention triangle (the d7 query generalized):
    users grouped by first-active week, counted in every later week
    they return — the growth-accounting staple. Distinct (user, week)
    pairs come from ONE narrow groupby (user-bounded x weeks rows —
    the shuffle-shard rank discipline for driver state); the driver
    derives each user's cohort (min week) and folds the triangle.
    Weeks are absolute epoch-weeks (day // 7). Emits
    (cohort_week, offset_weeks, n_users)."""
    from ray.data.aggregate import Count

    week_us = 86_400_000_000 * 7
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def narrow(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("user_id")),
                             pc.is_valid(b.column("ts"))))
        return pa.table({
            "user_id": pa.array(b.column("user_id")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64)),
            "wk": pa.array(b.column("ts").cast(pa.int64())
                           .to_numpy(zero_copy_only=False) // week_us)})

    pairs = (ds.map_batches(narrow, batch_format="pyarrow")
             .groupby(["user_id", "wk"])
             .aggregate(Count(alias_name="n")).to_pandas())
    cols = ["cohort_week", "offset_weeks", "n_users"]
    if pairs.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    cw = pairs.groupby("user_id")["wk"].transform("min")
    tri = (pd.DataFrame({"cohort_week": cw.to_numpy(np.int64),
                         "offset_weeks": (pairs["wk"] - cw)
                         .to_numpy(np.int64)})
           .groupby(["cohort_week", "offset_weeks"], as_index=False)
           .size().rename(columns={"size": "n_users"}))
    return (tri.sort_values(["cohort_week", "offset_weeks"])
            .reset_index(drop=True).astype(np.int64))


def session_length_histogram(sf_dir: str):
    """Session-size distribution + bounce rate: how many 30-min-gap
    sessions contain exactly k events (bounce = the k=1 row). Rides the
    shared events_sessionization scan (same islands, same tie
    invariance) and folds per-block histograms of n_events — histogram
    keys are session-length-bounded, so the driver fold is tiny. Emits
    (n_events, n_sessions, share_ppm) with floor-ppm of all sessions."""
    sess = events_sessionization(sf_dir)

    def hist(b: pa.Table) -> pa.Table:
        n = b.column("n_events").to_numpy(zero_copy_only=False)
        u, c = np.unique(n, return_counts=True)
        return pa.table({"n_events": pa.array(u.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    agg = sess.map_batches(hist, batch_format="pyarrow").to_pandas()
    cols = ["n_events", "n_sessions", "share_ppm"]
    if agg.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    g = (agg.groupby("n_events", as_index=False)["cnt"].sum()
         .sort_values("n_events").reset_index(drop=True))
    tot = int(g["cnt"].sum())
    g["share_ppm"] = (1_000_000 * g["cnt"].astype(np.int64)) // tot
    return g.rename(columns={"cnt": "n_sessions"})[cols] \
        .astype(np.int64)


def silhouette_kmeans(sf_dir: str):
    """Per-point silhouette for the established integer k-means
    clustering (the cluster-quality eval): a = mean squared distance to
    own-cluster peers, b = min over other clusters of mean squared
    distance, s = (b - a) / max(a, b). The engine NEVER materializes
    pairs: sum of squared distances from x to cluster c is the
    aggregate identity n_c*||x||^2 - 2<x, S_c> + Q_c, so after the
    assignment pass folds k x (dim + 2) cluster aggregates, scoring is
    ONE stateless broadcast pass (the oracle pays the pairwise join).
    Means are floor-milli integers; s_ppm uses truncate-toward-zero
    division (DuckDB's BIGINT // semantics — pinned by test).
    Singleton clusters score 0 (sklearn convention). int64-safe while
    n_c * max||x||^2 < 2^63 (~15k vectors at these magnitudes; the
    HUGEINT-style object fold is the documented wider path). Emits
    (vec_id, cluster, a_milli, b_milli, s_ppm)."""
    import ray

    from rayschema.similarity import kmeans_quantized

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent_long = kmeans_quantized(ds, k=4, iters=2)
    k = 4
    dim = int(cent_long["d"].max())
    cent = np.zeros((k, dim), dtype=np.int64)
    for _, r in cent_long.iterrows():
        cent[int(r["cluster"]), int(r["d"]) - 1] = int(r["c"])
    cent_ref = ray.put(cent)

    def assign_of(qm: np.ndarray, c: np.ndarray) -> np.ndarray:
        d2 = ((qm[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        return d2.argmin(1)     # ties -> lowest cluster (argmin scans up)

    def agg_pass(b: pa.Table, _c=cent_ref) -> pa.Table:
        c = ray.get(_c)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"cluster": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "q2": pa.array([], type=pa.int64()),
                             "svec": pa.array([], type=pa.list_(
                                 pa.int64()))})
        qm = _emb_qmat(b)
        a = assign_of(qm, c)
        rows = {"cluster": [], "n": [], "q2": [], "svec": []}
        for ci in range(len(c)):
            m = a == ci
            if not m.any():
                continue
            rows["cluster"].append(ci)
            rows["n"].append(int(m.sum()))
            rows["q2"].append(int((qm[m] ** 2).sum()))
            rows["svec"].append([int(x) for x in qm[m].sum(0)])
        return pa.table({"cluster": pa.array(rows["cluster"],
                                             type=pa.int64()),
                         "n": pa.array(rows["n"], type=pa.int64()),
                         "q2": pa.array(rows["q2"], type=pa.int64()),
                         "svec": pa.array(rows["svec"],
                                          type=pa.list_(pa.int64()))})

    parts = ds.map_batches(agg_pass, batch_format="pyarrow").to_pandas()
    cols = ["vec_id", "cluster", "a_milli", "b_milli", "s_ppm"]
    if parts.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    n_c = np.zeros(k, dtype=np.int64)
    q_c = np.zeros(k, dtype=np.int64)
    s_c = np.zeros((k, dim), dtype=np.int64)
    for _, r in parts.iterrows():
        ci = int(r["cluster"])
        n_c[ci] += int(r["n"])
        q_c[ci] += int(r["q2"])
        s_c[ci] += np.asarray(r["svec"], dtype=np.int64)
    stats_ref = ray.put((n_c, q_c, s_c))

    def score_pass(b: pa.Table, _c=cent_ref, _s=stats_ref) -> pa.Table:
        c = ray.get(_c)
        n_c, q_c, s_c = ray.get(_s)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        empty = pa.table({cn: pa.array([], type=pa.int64())
                          for cn in cols})
        if len(ids) == 0:
            return empty
        qm = _emb_qmat(b)
        a = assign_of(qm, c)
        x2 = (qm ** 2).sum(1)
        # sumd[i, c] = n_c*||x||^2 - 2<x, S_c> + Q_c
        sumd = (n_c[None, :] * x2[:, None]
                - 2 * (qm @ s_c.T) + q_c[None, :])
        rows_n = len(ids)
        pick = np.arange(rows_n)
        n_own = n_c[a]
        a_sum = sumd[pick, a]
        a_milli = np.where(n_own > 1,
                           (1000 * a_sum) // np.maximum(n_own - 1, 1),
                           0).astype(np.int64)
        mean_c = np.where(n_c[None, :] > 0,
                          (1000 * sumd) // np.maximum(n_c[None, :], 1),
                          np.iinfo(np.int64).max)
        mean_c[pick, a] = np.iinfo(np.int64).max
        b_milli = mean_c.min(1)
        has_b = b_milli != np.iinfo(np.int64).max
        b_milli = np.where(has_b, b_milli, 0).astype(np.int64)
        mx = np.maximum(a_milli, b_milli)
        # 1e6 * milli-means exceeds int64 (the oracle widens to
        # HUGEINT) — the final per-row division runs on Python ints
        num = (b_milli.astype(object) - a_milli.astype(object)) \
            * 1_000_000
        den = np.maximum(mx, 1).astype(object)
        trunc = np.array([int(n) // int(d) if n >= 0
                          else -((-int(n)) // int(d))
                          for n, d in zip(num, den)], dtype=np.int64)
        s_ppm = np.where((n_own == 1) | ~has_b | (mx == 0), 0, trunc)
        return pa.table({"vec_id": pa.array(ids),
                         "cluster": pa.array(a.astype(np.int64)),
                         "a_milli": pa.array(a_milli),
                         "b_milli": pa.array(b_milli),
                         "s_ppm": pa.array(s_ppm.astype(np.int64))})

    return (ds.map_batches(score_pass, batch_format="pyarrow")
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
            .astype(np.int64))


DEBOUNCE_US = 5_000_000


def debounced_events(sf_dir: str):
    """Telemetry debounce audit: an event drops when the SAME
    (user, event_type) fired within the previous 5 s (gap to the raw
    predecessor — the LAG semantics, SQL-mirrorable; chained
    debounce-against-last-kept is the documented non-SQL variant).
    ONE user-keyed sorted scan; per group one lexsort by (type, ts,
    event_id) and a vectorized same-type neighbor gap test; per-type
    counts fold on the (types x users)-bounded driver frame. Emits
    (event_type, n_total, n_kept, n_dropped)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])

    out_schema = pa.schema([("event_type", pa.string()),
                            ("n_total", pa.int64()),
                            ("n_kept", pa.int64()),
                            ("n_dropped", pa.int64())])

    def group_fn(g: pa.Table) -> pa.Table:
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        n = len(et)
        if n == 0:
            return None
        codes, uniq = pd.factorize(et, sort=True)
        order = np.lexsort((eid, ts, codes))
        c, t = codes[order], ts[order]
        same = np.zeros(n, dtype=bool)
        if n > 1:
            same[1:] = (c[1:] == c[:-1]) \
                & ((t[1:] - t[:-1]) <= DEBOUNCE_US)
        drop_per_type = np.bincount(c[same], minlength=len(uniq))
        tot_per_type = np.bincount(c, minlength=len(uniq))
        return pa.table({
            "event_type": pa.array([str(u) for u in uniq]),
            "n_total": pa.array(tot_per_type.astype(np.int64)),
            "n_kept": pa.array((tot_per_type
                                - drop_per_type).astype(np.int64)),
            "n_dropped": pa.array(drop_per_type.astype(np.int64))})

    scan = sorted_group_scan(
        ds.map_batches(_narrow_events, batch_format="pyarrow"),
        ["user_id"], group_fn, out_schema,
        order_cols=["ts_us", "event_id"])
    agg = scan.to_pandas()
    cols = ["event_type", "n_total", "n_kept", "n_dropped"]
    if agg.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             **{c: pd.Series([], dtype=np.int64)
                                for c in cols[1:]}})
    g = (agg.groupby("event_type", as_index=False).sum()
         .sort_values("event_type").reset_index(drop=True))
    return g[cols].astype({c: np.int64 for c in cols[1:]})


def wau_stickiness(sf_dir: str):
    """Weekly active users + stickiness (mean DAU / WAU — the
    product-health ratio): distinct (user, day) pairs through one
    narrow groupby (user x day bounded), folded to per-week DAU sums
    and distinct-user WAU on the driver (the cohort-triangle
    discipline). stickiness_ppm = 1e6 * sum_dau // (7 * wau) — the
    7-day-normalized mean DAU share. Emits
    (wk, wau, sum_dau, stickiness_ppm)."""
    from ray.data.aggregate import Count

    day_us = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def narrow(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("user_id")),
                             pc.is_valid(b.column("ts"))))
        return pa.table({
            "user_id": pa.array(b.column("user_id")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64)),
            "day": pa.array(b.column("ts").cast(pa.int64())
                            .to_numpy(zero_copy_only=False) // day_us)})

    pairs = (ds.map_batches(narrow, batch_format="pyarrow")
             .groupby(["user_id", "day"])
             .aggregate(Count(alias_name="n")).to_pandas())
    cols = ["wk", "wau", "sum_dau", "stickiness_ppm"]
    if pairs.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    pairs["wk"] = pairs["day"].to_numpy(np.int64) // 7
    wau = pairs.groupby("wk")["user_id"].nunique()
    dau = pairs.groupby("wk").size()      # distinct (user, day) pairs
    out = pd.DataFrame({"wk": wau.index.to_numpy(np.int64),
                        "wau": wau.to_numpy(np.int64),
                        "sum_dau": dau.to_numpy(np.int64)})
    out["stickiness_ppm"] = (1_000_000 * out["sum_dau"]) \
        // (7 * out["wau"])
    return out.sort_values("wk").reset_index(drop=True) \
        .astype(np.int64)


def embedding_norm_audit(sf_dir: str):
    """Vector-QA audit per label: count, zero-vector count and the
    min/max/sum of exact integer squared norms on the shared 1e-6
    quantization — the broken-embedding detector (NaN/zero/degenerate
    norms) run before any ANN build. ONE stateless pass, label-bounded
    partials. Emits (label, n, n_zero, min_n2, max_n2, sum_n2)."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding",
                                              "label"])

    def part(b: pa.Table) -> pa.Table:
        lab = b.column("label").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if len(lab) == 0:
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in ("label", "n", "n_zero",
                                       "min_n2", "max_n2", "sum_n2")})
        qm = _emb_qmat(b)
        n2 = (qm ** 2).sum(1)
        df = pd.DataFrame({"label": lab, "n2": n2,
                           "z": (n2 == 0).astype(np.int64)})
        g = df.groupby("label").agg(
            n=("n2", "size"), n_zero=("z", "sum"),
            min_n2=("n2", "min"), max_n2=("n2", "max"),
            sum_n2=("n2", "sum")).reset_index()
        return pa.Table.from_pandas(g.astype(np.int64),
                                    preserve_index=False)

    out = (ds.map_batches(part, batch_format="pyarrow")
           .groupby("label")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("n_zero", alias_name="n_zero"),
                      Min("min_n2", alias_name="min_n2"),
                      Max("max_n2", alias_name="max_n2"),
                      Sum("sum_n2", alias_name="sum_n2"))
           .to_pandas())
    return (out.sort_values("label").reset_index(drop=True)
            .astype(np.int64))


def _hourly_counts(sf_dir: str) -> np.ndarray:
    """Shared 24-slot hour-of-day event-count fold (the haar shape):
    one distributed bincount pass, 24-int driver state."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("ts")))
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        h = (ts // 3_600_000_000) % 24
        u, c = np.unique(h, return_counts=True)
        return pa.table({"hour": pa.array(u.astype(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    agg = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    x = np.zeros(24, dtype=np.int64)
    if not agg.empty:
        g = agg.groupby("hour")["n"].sum()
        x[g.index.to_numpy(np.int64)] = g.to_numpy(np.int64)
    return x


SEG_K = 3


def optimal_segmentation_hourly(sf_dir: str):
    """Optimal 3-segment partition of the 24-slot hour-of-day
    event-count curve (exact change-point detection, the piecewise-
    constant fit): minimize the sum of per-segment floor-milli SSE
    cost(a, b) = (1000 * (len * Q - S^2)) // len (integer — both sides
    share the floor, so the optimum is bit-reproducible; ties pick the
    lexicographically smallest boundaries). The data-sized work is the
    shared distributed hourly fold; the C(23,2) boundary search is
    driver arithmetic on 24 ints (the oracle enumerates the same
    pairs). Emits (seg, start_h, end_h, n_events, cost_milli)."""
    x = _hourly_counts(sf_dir)
    S = np.zeros(25, dtype=np.int64)
    Q = np.zeros(25, dtype=np.int64)
    S[1:] = np.cumsum(x)
    Q[1:] = np.cumsum(x * x)

    def cost(a: int, b: int) -> int:
        ln = b - a
        s = int(S[b] - S[a])
        q = int(Q[b] - Q[a])
        return (1000 * (ln * q - s * s)) // ln

    best = None
    for b1 in range(1, 23):
        for b2 in range(b1 + 1, 24):
            tot = cost(0, b1) + cost(b1, b2) + cost(b2, 24)
            key = (tot, b1, b2)
            if best is None or key < best:
                best = key
    tot, b1, b2 = best
    segs = [(1, 0, b1), (2, b1, b2), (3, b2, 24)]
    return pd.DataFrame(
        [(s, a, b, int(S[b] - S[a]), cost(a, b)) for s, a, b in segs],
        columns=["seg", "start_h", "end_h", "n_events",
                 "cost_milli"]).astype(np.int64)


def theil_sen_hourly(sf_dir: str):
    """Theil-Sen robust slope of the hour-of-day event-count curve:
    the lower median of the C(24,2) pairwise slopes, each floored to
    milli-events/hour ((1000 * dy) // dx — integer, so the median is
    order-unambiguous on both sides). One distributed hourly fold; the
    276 slopes are driver arithmetic. Emits
    (n_pairs, median_slope_milli)."""
    x = _hourly_counts(sf_dir)
    slopes = []
    for i in range(24):
        for j in range(i + 1, 24):
            dy, dx = 1000 * int(x[j] - x[i]), j - i
            # truncate toward zero — DuckDB's BIGINT // (pinned)
            slopes.append(dy // dx if dy >= 0 else -((-dy) // dx))
    slopes.sort()
    n = len(slopes)
    return pd.DataFrame({"n_pairs": [n],
                         "median_slope_milli": [slopes[(n - 1) // 2]]
                         }).astype(np.int64)


def user_activity_gini(sf_dir: str):
    """Concentration-of-activity audit: the exact Gini coefficient of
    the events-per-user distribution (is traffic a few whales or a
    broad base?) — floor-ppm of sum((2i - n - 1) * x_(i)) / (n * sum x)
    over ascending per-user counts (tie-invariant: coefficients are
    linear in rank and tied values are equal). ONE distributed user
    groupby; the sorted fold runs on the user-bounded frame. Emits
    (n_users, total_events, gini_ppm)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", columns=["user_id"])

    def narrow(b: pa.Table) -> pa.Table:
        u = pc.drop_null(b.column("user_id")).cast(pa.int64())
        return pa.table({"user_id": u})

    cnt = (ds.map_batches(narrow, batch_format="pyarrow")
           .groupby("user_id")
           .aggregate(Count(alias_name="n")).to_pandas())
    cols = ["n_users", "total_events", "gini_ppm"]
    if cnt.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    x = np.sort(cnt["n"].to_numpy(np.int64))
    n = len(x)
    tot = int(x.sum())
    i = np.arange(1, n + 1, dtype=np.int64)
    num = int(((2 * i - n - 1) * x).sum())
    return pd.DataFrame({"n_users": [n], "total_events": [tot],
                         "gini_ppm": [(1_000_000 * num) // (n * tot)]
                         }).astype(np.int64)


PAD_LADDER = (128, 256, 512, 1024, 2048, 4096, 8192, 16384)


def padding_waste_audit(sf_dir: str):
    """Trainer batch-padding efficiency: bucket each doc's whitespace
    token count (the token_counts_documents convention) to the
    power-of-two ladder 128..16384 and report per-bucket padding waste
    — the audit that picks sequence-length buckets before packing.
    ONE stateless pass, 8-row partials. Emits
    (bucket, n_docs, sum_tokens, padded_tokens, waste_ppm)."""
    from rayschema.text import token_count_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ladder = np.asarray(PAD_LADDER, dtype=np.int64)

    def part(b: pa.Table) -> pa.Table:
        t = token_count_batch(b)
        tc = t.column("token_count")
        tc = pc.drop_null(tc).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        idx = np.searchsorted(ladder, np.minimum(tc, ladder[-1]))
        n_d = np.bincount(idx, minlength=len(ladder))
        s_t = np.bincount(idx, weights=np.minimum(tc, ladder[-1]),
                          minlength=len(ladder)).astype(np.int64)
        keep = np.flatnonzero(n_d > 0)
        return pa.table({
            "bucket": pa.array(ladder[keep]),
            "n_docs": pa.array(n_d[keep].astype(np.int64)),
            "sum_tokens": pa.array(s_t[keep])})

    agg = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    cols = ["bucket", "n_docs", "sum_tokens", "padded_tokens",
            "waste_ppm"]
    if agg.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    g = (agg.groupby("bucket", as_index=False).sum()
         .sort_values("bucket").reset_index(drop=True))
    g["padded_tokens"] = (g["bucket"] * g["n_docs"]
                          - g["sum_tokens"]).astype(np.int64)
    g["waste_ppm"] = (1_000_000 * g["padded_tokens"]) \
        // (g["bucket"] * g["n_docs"])
    return g[cols].astype(np.int64)


VENN_TYPES = ("view", "click", "purchase")


def user_type_venn(sf_dir: str):
    """Three-set Venn audit over user behavior: how many users fall in
    each of the 7 regions of (ever viewed, ever clicked, ever
    purchased) — the engagement-overlap picture one query deep. Per
    block: per-user 3-bit masks OR-fold (duplicates can't move an OR,
    so no distinct pass); one user-keyed groupby Max folds the masks;
    the 7-bin bincount is driver arithmetic. Emits
    (mask, region, n_users) with region like 'view+click'."""
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("user_id")),
                             pc.is_valid(b.column("event_type"))))
        u = b.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        # one 0/1 column per set: max IS bitwise OR per bit, so the
        # per-block pandas groupby().max() (vectorized) and the global
        # Ray Max aggregate compose into an exact distributed OR-fold
        df = pd.DataFrame({"user_id": u})
        hit = np.zeros(len(u), dtype=bool)
        for i, t in enumerate(VENN_TYPES):
            m = et == t
            df[f"b{i}"] = m.astype(np.int64)
            hit |= m
        df = df[hit]
        if df.empty:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             **{f"b{i}": pa.array([], type=pa.int64())
                                for i in range(3)}})
        g = df.groupby("user_id", as_index=False).max()
        return pa.Table.from_pandas(g.astype(np.int64),
                                    preserve_index=False)

    folded = (ds.map_batches(part, batch_format="pyarrow")
              .groupby("user_id")
              .aggregate(Max("b0", alias_name="b0"),
                         Max("b1", alias_name="b1"),
                         Max("b2", alias_name="b2")).to_pandas())
    cols = ["mask", "region", "n_users"]
    if folded.empty:
        return pd.DataFrame({"mask": pd.Series([], dtype=np.int64),
                             "region": pd.Series([], dtype=object),
                             "n_users": pd.Series([], dtype=np.int64)})
    mask = (folded["b0"].to_numpy(np.int64)
            + 2 * folded["b1"].to_numpy(np.int64)
            + 4 * folded["b2"].to_numpy(np.int64))
    cnt = np.bincount(mask, minlength=8)
    rows = []
    for m in range(1, 8):
        if cnt[m] == 0:
            continue
        region = "+".join(t for i, t in enumerate(VENN_TYPES)
                          if m >> i & 1)
        rows.append((m, region, int(cnt[m])))
    return pd.DataFrame(rows, columns=cols) \
        .astype({"mask": np.int64, "n_users": np.int64})


AGING_EDGES = (30, 60, 90)


def orders_aging_buckets(sf_dir: str):
    """Receivables-style aging report: OPEN orders (o_orderstatus 'O')
    bucketed by age in days relative to the corpus's max order date
    (0-30 / 31-60 / 61-90 / 90+), with order counts and open value.
    ONE pass: each block emits a per-DAY (n, cents) partial plus its
    local max date; the driver folds the day-bounded histogram, reads
    the as-of anchor off the same fold, and buckets ages once — no
    second scan to find the anchor. Emits
    (bucket, age_lo, age_hi, n_orders, open_cents); age_hi -1 = open
    top bucket."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderstatus", "o_orderdate",
                        "o_totalprice"])
    day_us = 86_400_000_000

    def part(b: pa.Table) -> pa.Table:
        st = b.column("o_orderstatus").to_numpy(zero_copy_only=False)
        m = st == "O"
        d = (b.column("o_orderdate").cast(pa.int64())
             .to_numpy(zero_copy_only=False) // day_us)
        c = _cents(b.column("o_totalprice").to_numpy(
            zero_copy_only=False))
        dm, cm = d[m], c[m]
        # (day, n, cents) partials: day-bounded (the order-date span),
        # so the driver fold is a small histogram — and the global max
        # day falls out of the same fold
        df = pd.DataFrame({"day": dm, "cents": cm})
        g = df.groupby("day").agg(n=("cents", "size"),
                                  cents=("cents", "sum")).reset_index()
        days = g["day"].to_numpy(np.int64)
        ns = g["n"].to_numpy(np.int64)
        cs = g["cents"].to_numpy(np.int64)
        # the as-of anchor folds over ALL orders (open or closed) — a
        # block with no open orders must STILL ship its local max, so
        # every non-empty block emits at least a zero-count carrier row
        if len(d) and len(days) == 0:
            days = np.array([-1], dtype=np.int64)
            ns = np.zeros(1, dtype=np.int64)
            cs = np.zeros(1, dtype=np.int64)
        return pa.table({
            "day": pa.array(days),
            "n": pa.array(ns),
            "cents": pa.array(cs),
            "maxday": pa.array(np.full(len(days), int(d.max())
                                       if len(d) else -1, np.int64))})

    agg = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    cols = ["bucket", "age_lo", "age_hi", "n_orders", "open_cents"]
    if agg.empty:
        return pd.DataFrame({"bucket": pd.Series([], dtype=object),
                             **{c: pd.Series([], dtype=np.int64)
                                for c in cols[1:]}})
    anchor = int(agg["maxday"].max())
    agg = agg[agg["day"] >= 0]          # drop anchor-carrier rows
    if agg.empty:
        return pd.DataFrame({"bucket": pd.Series([], dtype=object),
                             **{c: pd.Series([], dtype=np.int64)
                                for c in cols[1:]}})
    g = agg.groupby("day")[["n", "cents"]].sum().reset_index()
    age = anchor - g["day"].to_numpy(np.int64)
    edges = np.asarray(AGING_EDGES, dtype=np.int64)
    idx = np.searchsorted(edges, age)        # 0..3
    rows = []
    labels = ["0-30", "31-60", "61-90", "90+"]
    los = [0, 31, 61, 91]
    his = [30, 60, 90, -1]
    for i in range(4):
        m = idx == i
        if not m.any():
            continue
        rows.append((labels[i], los[i], his[i],
                     int(g["n"].to_numpy(np.int64)[m].sum()),
                     int(g["cents"].to_numpy(np.int64)[m].sum())))
    return pd.DataFrame(rows, columns=cols) \
        .astype({c: np.int64 for c in cols[1:]})


def customer_order_cadence(sf_dir: str):
    """Repeat-purchase cadence per customer: order count, active span
    in days and the mean gap between consecutive orders — consecutive
    gaps TELESCOPE (their sum is max - min), so ONE Min/Max/Count
    groupby replaces any sort (the part_reorder_gap discipline on the
    customer axis). Distinct order DATES define the gaps (same-day
    orders are one cadence point); customers with < 2 distinct dates
    drop. mean_gap_milli = 1000 * span // (n_dates - 1). Emits
    (o_custkey, n_orders, n_dates, span_days, mean_gap_milli)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    day_us = 86_400_000_000
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def part(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        d = (b.column("o_orderdate").cast(pa.int64())
             .to_numpy(zero_copy_only=False) // day_us)
        df = pd.DataFrame({"ck": ck, "day": d})
        g = df.groupby(["ck", "day"], as_index=False).size()
        return pa.table({"ck": pa.array(g["ck"].to_numpy(np.int64)),
                         "day": pa.array(g["day"].to_numpy(np.int64)),
                         "n": pa.array(g["size"].to_numpy(np.int64))})

    agg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby(["ck", "day"])
           .aggregate(Sum("n", alias_name="n"))
           .groupby("ck")
           .aggregate(Sum("n", alias_name="n_orders"),
                      Count(alias_name="n_dates"),
                      Min("day", alias_name="d0"),
                      Max("day", alias_name="d1")).to_pandas())
    cols = ["o_custkey", "n_orders", "n_dates", "span_days",
            "mean_gap_milli"]
    if agg.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    agg = agg[agg["n_dates"] >= 2].copy()
    agg["o_custkey"] = agg["ck"].astype(np.int64)
    agg["span_days"] = (agg["d1"] - agg["d0"]).astype(np.int64)
    agg["mean_gap_milli"] = (1000 * agg["span_days"]) \
        // (agg["n_dates"] - 1)
    return (agg[cols].astype(np.int64).sort_values("o_custkey")
            .reset_index(drop=True))


def tfrecord_roundtrip(sf_dir: str):
    """TFRecord sink+source round trip — the TensorFlow training-input
    container (length-framed records, double masked CRC-32C), via the
    repo's pure-numpy codec (rayschema/tfrecord.py: table-lookup CRC
    vectorized ACROSS records, canonical-JSON payloads, checksum
    verification on read). Distributed on both sides like the ORC
    path; any framing/CRC/unicode infidelity breaks the value hash."""
    return _format_roundtrip(sf_dir, "tfrecord")


def hhi_customer_concentration(sf_dir: str, broadcast_cap: int = None):
    """Herfindahl-Hirschman concentration of order revenue across
    customers WITHIN each nation (is a nation's demand one whale or
    many small buyers?): hhi_ppm = 1e6 * sum(c_i^2) // (sum c_i)^2
    over per-customer revenue cents — exact, computed with Python ints
    on the customer-bounded fold (c_i^2 sums exceed int64 at scale;
    the oracle widens to HUGEINT). Revenue folds per customer through
    one distributed groupby; the customer -> nation map resolves
    ADAPTIVELY (the q10_returned_items discipline): broadcast sorted
    arrays with miss-verification under Q3_BROADCAST_CAP gated on the
    customer parquet footer count — customer scales with the corpus —
    a Dataset.join hash exchange past it. Customers with no orders
    contribute nothing (inner join). Emits
    (n_nationkey, n_cust, total_cents, hhi_ppm)."""
    import ray
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey",
                                              "o_totalprice"])

    cap = Q3_BROADCAST_CAP if broadcast_cap is None else broadcast_cap
    n_cust_rows = _table_rows(sf_dir, "customer")
    if n_cust_rows is not None and n_cust_rows <= cap:
        cust = _read(sf_dir, "customer",
                     columns=["c_custkey", "c_nationkey"]).to_pandas()
        ck = cust["c_custkey"].to_numpy(np.int64)
        order_ = np.argsort(ck)
        ck = ck[order_]
        nk = cust["c_nationkey"].to_numpy(np.int64)[order_]
        ref = ray.put((ck, nk))

        def part(b: pa.Table, _ref=ref) -> pa.Table:
            keys, nats = ray.get(_ref)
            c = b.column("o_custkey").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            cents = _cents(b.column("o_totalprice").to_numpy(
                zero_copy_only=False))
            if len(keys) == 0 or len(c) == 0:
                return pa.table(
                    {"ck": pa.array([], type=pa.int64()),
                     "nk": pa.array([], type=pa.int64()),
                     "cents": pa.array([], type=pa.int64())})
            pos = np.clip(np.searchsorted(keys, c), 0, len(keys) - 1)
            ok = keys[pos] == c      # drop orders w/ unknown customer
            df = pd.DataFrame({"ck": c[ok], "nk": nats[pos[ok]],
                               "cents": cents[ok]})
            g = df.groupby(["ck", "nk"], as_index=False).sum()
            return pa.Table.from_pandas(g.astype(np.int64),
                                        preserve_index=False)

        joined = orders.map_batches(part, batch_format="pyarrow")
    else:
        cust_ds = _read(sf_dir, "customer",
                        columns=["c_custkey", "c_nationkey"])

        def oprep(b: pa.Table) -> pa.Table:
            return pa.table({
                "o_custkey": b.column("o_custkey").cast(pa.int64()),
                "cents": pa.array(_cents(
                    b.column("o_totalprice").to_numpy(
                        zero_copy_only=False)))})

        oc = orders.map_batches(oprep, batch_format="pyarrow")
        est = (oc.size_bytes() or 0) + (cust_ds.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))

        def rename(b: pa.Table) -> pa.Table:
            return pa.table({
                "ck": b.column("o_custkey").cast(pa.int64()),
                "nk": b.column("c_nationkey").cast(pa.int64()),
                "cents": b.column("cents")})

        joined = (oc.join(cust_ds, join_type="inner",
                          num_partitions=n_parts,
                          on=("o_custkey",), right_on=("c_custkey",))
                  .map_batches(rename, batch_format="pyarrow"))

    per_cust = (joined
                .groupby(["ck", "nk"])
                .aggregate(Sum("cents", alias_name="cents"))
                .to_pandas())
    cols = ["n_nationkey", "n_cust", "total_cents", "hhi_ppm"]
    if per_cust.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    rows = []
    for nat, g in per_cust.groupby("nk", sort=True):
        cs = [int(x) for x in g["cents"]]
        tot = sum(cs)
        if tot == 0:
            continue
        hhi = (1_000_000 * sum(c * c for c in cs)) // (tot * tot)
        rows.append((int(nat), len(cs), tot, hhi))
    return pd.DataFrame(rows, columns=cols).astype(np.int64)


JOURNEY_TOP = 20


def journey_archetypes(sf_dir: str):
    """Behavioral archetypes: each user's journey = their event types
    in FIRST-OCCURRENCE order (dedup after the first appearance),
    joined with '>' — then the top-20 archetypes by user count (count
    desc, journey asc). ONE user-keyed sorted scan in (ts, event_id)
    order; first-seen type order inside a group is pd.unique on the
    sorted types (== the oracle's (min ts, min event_id at that ts)
    ordering). The archetype fold is bounded by distinct journeys
    (<= types! permutations x prefixes). Emits (journey, n_users, rk)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])

    out_schema = pa.schema([("journey", pa.string()),
                            ("n", pa.int64())])

    def group_fn(g: pa.Table) -> pa.Table:
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        if len(et) == 0:
            return None
        seq = ">".join(str(t) for t in pd.unique(et))
        return pa.table({"journey": pa.array([seq]),
                         "n": pa.array([1], type=pa.int64())})

    scan = sorted_group_scan(
        ds.map_batches(_narrow_events, batch_format="pyarrow"),
        ["user_id"], group_fn, out_schema,
        order_cols=["ts_us", "event_id"])
    agg = scan.to_pandas()
    cols = ["journey", "n_users", "rk"]
    if agg.empty:
        return pd.DataFrame({"journey": pd.Series([], dtype=object),
                             "n_users": pd.Series([], dtype=np.int64),
                             "rk": pd.Series([], dtype=np.int64)})
    g = (agg.groupby("journey", as_index=False)["n"].sum()
         .rename(columns={"n": "n_users"})
         .sort_values(["n_users", "journey"],
                      ascending=[False, True])
         .head(JOURNEY_TOP).reset_index(drop=True))
    g["rk"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g[cols].astype({"n_users": np.int64, "rk": np.int64})


def table_format_time_travel(sf_dir: str):
    """Versioned-table (Iceberg/Delta-style snapshot) capability proof:
    commit even-doc_id documents as v1, APPEND the odd half as v2, then
    time-travel read BOTH versions and emit per-version
    (version, n_rows, id_sum, text_chars). Manifests are O(files)
    metadata and the commit point is one atomic rename
    (rayschema/tableformat.py); the reads are ordinary pruned parquet
    scans over each snapshot's file list. The oracle recomputes both
    snapshots' aggregates straight from the documents table, so a
    wrong file list, a leaked partial write, or an append that
    rewrites history all break the hash."""
    import shutil
    import tempfile

    from rayschema.tableformat import commit_version, read_version

    root = os.path.join(tempfile.gettempdir(),
                        f"rayschema_tblfmt_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def half(parity: int):
        def fn(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 2 == parity))
        return fn

    commit_version(root, ds.map_batches(half(0),
                                        batch_format="pyarrow"),
                   mode="overwrite")
    commit_version(root, ds.map_batches(half(1),
                                        batch_format="pyarrow"),
                   mode="append")

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tl = pc.fill_null(pc.utf8_length(b.column("text")), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"n_rows": pa.array([len(ids)],
                                            type=pa.int64()),
                         "id_sum": pa.array([int(ids.sum())],
                                            type=pa.int64()),
                         "text_chars": pa.array([int(tl.sum())],
                                                type=pa.int64())})

    rows = []
    for v in (1, 2):
        agg = (read_version(root, v)
               .map_batches(partial, batch_format="pyarrow")
               .to_pandas().sum())
        rows.append((v, int(agg["n_rows"]), int(agg["id_sum"]),
                     int(agg["text_chars"])))
    return pd.DataFrame(rows, columns=["version", "n_rows", "id_sum",
                                       "text_chars"]).astype(np.int64)


TOKEN_BUDGET_DIV = 2          # per-lang budget = total tokens // 2
TB_BUCKET_BITS = 16


def token_budget_sample(sf_dir: str):
    """Budget-capped deterministic sampling: per language, keep the
    hash-ordered prefix of documents whose RUNNING token total stays
    within budget (= half that language's tokens — self-normalizing).
    The classic down-sample-to-token-budget step, done WITHOUT a
    global sort: pass 1 folds a (lang, hash-bucket) token/doc
    histogram (<= langs x 2^16 bounded driver state); whole buckets
    below the cutoff are kept by arithmetic alone; ONLY the single
    boundary bucket's docs are pulled and prefix-resolved exactly (the
    two-phase histogram-rank discipline on a weighted prefix). Order
    key h = (doc_id % 100003) * 2654435761 % 2^32, ties by doc_id.
    Docs with NULL text don't participate. Emits
    (lang, total_tokens, budget, n_kept, tokens_kept)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "lang", "text"])

    def narrow(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("text")),
                             pc.is_valid(b.column("lang"))))
        ids = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        txt = b.column("text")
        spaces = pc.subtract(
            pc.utf8_length(txt),
            pc.utf8_length(pc.replace_substring(txt, " ", ""))) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tlen = pc.utf8_length(txt).to_numpy(
            zero_copy_only=False).astype(np.int64)
        toks = np.where(tlen == 0, 0, spaces + 1)
        h = ((ids % 100003) * SHUF_KNUTH) % (1 << 32)
        lang = b.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        return pa.table({"lang": lang, "doc_id": pa.array(ids),
                         "h": pa.array(h.astype(np.int64)),
                         "bkt": pa.array((h >> TB_BUCKET_BITS)
                                         .astype(np.int64)),
                         "toks": pa.array(toks)})

    proj = ds.map_batches(narrow, batch_format="pyarrow")
    hist = (proj.groupby(["lang", "bkt"])
            .aggregate(Sum("toks", alias_name="toks"),
                       Count(alias_name="n")).to_pandas())
    cols = ["lang", "total_tokens", "budget", "n_kept", "tokens_kept"]
    if hist.empty:
        return pd.DataFrame({"lang": pd.Series([], dtype=object),
                             **{c: pd.Series([], dtype=np.int64)
                                for c in cols[1:]}})
    rows = []
    boundary = {}          # lang -> (bucket, prefix_toks, prefix_n)
    for lang, g in hist.groupby("lang", sort=True):
        g = g.sort_values("bkt")
        tot = int(g["toks"].sum())
        budget = tot // TOKEN_BUDGET_DIV
        cum_t, cum_n, cut = 0, 0, None
        for _, r in g.iterrows():
            t = int(r["toks"])
            if cum_t + t > budget:
                cut = (int(r["bkt"]), cum_t, cum_n)
                break
            cum_t += t
            cum_n += int(r["n"])
        if cut is None:
            rows.append((lang, tot, budget, cum_n, cum_t))
        else:
            boundary[lang] = cut
            rows.append([lang, tot, budget, cum_n, cum_t])

    if boundary:
        import ray

        bref = ray.put(boundary)

        def pull(b: pa.Table, _b=bref) -> pa.Table:
            bd = ray.get(_b)
            lang = b.column("lang").to_numpy(zero_copy_only=False)
            bkt = b.column("bkt").to_numpy(zero_copy_only=False)
            m = np.zeros(len(lang), dtype=bool)
            for lg, (cb, _, _) in bd.items():
                m |= (lang == lg) & (bkt == cb)
            return b.filter(pa.array(m))

        bd = (proj.map_batches(pull, batch_format="pyarrow")
              .to_pandas())
        out = {}
        for lg, g in bd.groupby("lang"):
            cb, pre_t, pre_n = boundary[lg]
            g = g.sort_values(["h", "doc_id"])
            cum = pre_t + g["toks"].cumsum().to_numpy(np.int64)
            budget = next(r for r in rows if r[0] == lg)[2]
            keep = cum <= budget
            out[lg] = (pre_n + int(keep.sum()),
                       int(cum[keep][-1]) if keep.any() else pre_t)
        for r in rows:
            if r[0] in out:
                r[3], r[4] = out[r[0]]
    return pd.DataFrame([tuple(r) for r in rows], columns=cols) \
        .astype({c: np.int64 for c in cols[1:]})


def cms_join_size_estimate(sf_dir: str):
    """Sketch-based join planning: estimate the events-x-events
    SELF-join size on user_id (sum of squared key frequencies — THE
    quantity a planner needs to spot a skewed/exploding join) from
    Count-Min cells alone: per plane, dot = sum(cell^2) >= true size
    (collisions only add — the AGMS/CMS inner-product bound, Cormode &
    Muthukrishnan 2005), est = min over the 4 planes. One stateless
    pass folds the 4x64 cells; the exact size folds beside it off the
    user-bounded count table, so the certificate (est >= true, gap
    quantified) is hash-checkable. Emits per plane
    (plane, dot_product, true_size, overcount) — overcount >= 0 by
    construction."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("user_id")))
        u = b.column("user_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cells = np.zeros((len(CMS_CFG), CMS_W), dtype=np.int64)
        for j, a in CMS_CFG:
            cells[j] = np.bincount(_mix_hash(u, a, CMS_W),
                                   minlength=CMS_W)
        uu, cc = np.unique(u, return_counts=True)
        return pa.table({
            "kind": pa.array(np.concatenate(
                [np.zeros(cells.size, np.int64),
                 np.ones(len(uu), np.int64)])),
            "k1": pa.array(np.concatenate(
                [np.repeat(np.arange(len(CMS_CFG), dtype=np.int64),
                           CMS_W),
                 uu.astype(np.int64)])),
            "k2": pa.array(np.concatenate(
                [np.tile(np.arange(CMS_W, dtype=np.int64),
                         len(CMS_CFG)),
                 np.zeros(len(uu), np.int64)])),
            "v": pa.array(np.concatenate(
                [cells.ravel(), cc.astype(np.int64)]))})

    agg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby(["kind", "k1", "k2"])
           .aggregate(Sum("v", alias_name="v")).to_pandas())
    cols = ["plane", "dot_product", "true_size", "overcount"]
    if agg.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    cells = agg[agg["kind"] == 0]
    counts = agg[agg["kind"] == 1]["v"].to_numpy(np.int64)
    true_size = int(sum(int(c) * int(c) for c in counts))
    rows = []
    for j in range(len(CMS_CFG)):
        cj = cells[cells["k1"] == j]["v"].to_numpy(np.int64)
        dot = int(sum(int(x) * int(x) for x in cj))
        rows.append((j, dot, true_size, dot - true_size))
    return pd.DataFrame(rows, columns=cols).astype(np.int64)


DEDUP_CURVE_DEPTHS = tuple(1000 * (1 << k) for k in range(11))


def dedup_rate_curve(sf_dir: str):
    """Corpus-planning artifact: how duplication grows with corpus
    size — at each ingestion-order prefix (doc_id < depth, fixed
    1k/2k/.../1024k grid), the distinct-text count and duplicate ppm.
    The curve that decides how much dedup budget a bigger crawl needs.
    First occurrences come from ONE md5-keyed groupby (min doc_id per
    text hash — md5 is SQL-identical so the oracle needs no text
    shuffle); both histograms then fold to the 11-slot depth grid
    inside map_batches — driver state is 11 ints, never
    O(distinct docs). Emits (depth, n_docs, n_distinct, dup_ppm) for
    non-empty depths."""
    import hashlib

    from ray.data.aggregate import Min

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    depths = np.asarray(DEDUP_CURVE_DEPTHS, dtype=np.int64)

    def hash_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        ids = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        hs = [hashlib.md5(t.encode("utf-8")).hexdigest()
              for t in b.column("text").to_pylist()]
        # local pre-fold: one row per distinct hash per block
        df = pd.DataFrame({"h": hs, "fid": ids}) \
            .groupby("h", as_index=False).min()
        return pa.table({"h": pa.array(df["h"]),
                         "fid": pa.array(df["fid"]
                                         .to_numpy(np.int64))})

    def depth_hist(col: str):
        def fn(b: pa.Table) -> pa.Table:
            v = b.column(col).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(depths, v, side="right")
            keep = idx < len(depths)
            cnt = np.bincount(idx[keep], minlength=len(depths))
            # a doc at depth slot k is inside EVERY depth >= k: emit
            # the raw slot histogram; the driver prefix-sums
            return pa.table({"slot": pa.array(np.arange(
                len(depths), dtype=np.int64)),
                "n": pa.array(cnt.astype(np.int64))})
        return fn

    firsts = (ds.map_batches(hash_part, batch_format="pyarrow")
              .groupby("h").aggregate(Min("fid", alias_name="fid")))
    h_first = (firsts.map_batches(depth_hist("fid"),
                                  batch_format="pyarrow").to_pandas()
               .groupby("slot")["n"].sum())

    def ids_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        ids = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        idx = np.searchsorted(depths, ids, side="right")
        keep = idx < len(depths)
        cnt = np.bincount(idx[keep], minlength=len(depths))
        return pa.table({"slot": pa.array(np.arange(
            len(depths), dtype=np.int64)),
            "n": pa.array(cnt.astype(np.int64))})

    h_all = (ds.map_batches(ids_part, batch_format="pyarrow")
             .to_pandas().groupby("slot")["n"].sum())
    n_all = np.zeros(len(depths), dtype=np.int64)
    n_fst = np.zeros(len(depths), dtype=np.int64)
    if len(h_all):
        n_all[h_all.index.to_numpy(np.int64)] = \
            h_all.to_numpy(np.int64)
    if len(h_first):
        n_fst[h_first.index.to_numpy(np.int64)] = \
            h_first.to_numpy(np.int64)
    cum_all = np.cumsum(n_all)
    cum_fst = np.cumsum(n_fst)
    rows = []
    for i, dep in enumerate(depths):
        if cum_all[i] == 0:
            continue
        nd, nf = int(cum_all[i]), int(cum_fst[i])
        rows.append((int(dep), nd, nf,
                     (1_000_000 * (nd - nf)) // nd))
    return pd.DataFrame(rows, columns=["depth", "n_docs",
                                       "n_distinct", "dup_ppm"]) \
        .astype(np.int64)


JACCARD_SWEEP_PCTS = (20, 30, 40, 50, 60, 70, 80)


def jaccard_threshold_sweep(sf_dir: str):
    """Near-dup threshold sensitivity: how many pairs (and distinct
    docs) survive at each Jaccard cutoff 0.2..0.8 — the tuning curve
    that justifies a production threshold, computed from ONE exact
    all-pairs pass at the doc_id < 300 ground-truth scope (base cutoff
    0.2 on the raw ratio, sweep cuts on the shared round-6 convention
    — both mirrored by the oracle). Emits
    (threshold_pct, n_pairs, n_docs)."""
    from rayschema.dedup import exact_jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = exact_jaccard_pairs(ds, id_limit=300, k=5,
                                threshold=0.2).to_pandas()
    rows = []
    for t in JACCARD_SWEEP_PCTS:
        if pairs.empty:
            rows.append((t, 0, 0))
            continue
        m = pairs["jaccard"].to_numpy() >= t / 100.0
        sel = pairs[m]
        docs = len(set(sel["id_a"]).union(sel["id_b"]))
        rows.append((t, int(m.sum()), docs))
    return pd.DataFrame(rows, columns=["threshold_pct", "n_pairs",
                                       "n_docs"]).astype(np.int64)


DOCS_SCHEMA_V2_JSON = """{
 "type": "object",
 "required": ["doc_id", "text", "lang", "source", "n_chars"],
 "properties": {
   "doc_id": {"type": "integer", "minimum": 0},
   "text":   {"type": "string", "minLength": 200},
   "lang":   {"type": "string", "enum": ["en", "de", "fr", "es"]},
   "source": {"type": "string", "pattern": "^src[0-9]+$"},
   "n_chars": {"type": "integer", "minimum": 0, "maximum": 5000}
 }
}"""


class _MigrationValidator:
    """Actor: BOTH schema versions compiled once; one pass emits
    per-lang v1/v2 verdict partials."""

    def __init__(self):
        from rayschema.compile import compile_validator
        from rayschema.serde import schema_from_json

        self.v1 = compile_validator(schema_from_json(DOCS_SCHEMA_JSON))
        self.v2 = compile_validator(
            schema_from_json(DOCS_SCHEMA_V2_JSON))

    def __call__(self, b: pa.Table) -> pa.Table:
        m1 = np.asarray(self.v1.probe(b), dtype=bool)
        m2 = np.asarray(self.v2.probe(b), dtype=bool)
        lang = b.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        t = pa.table({
            "lang": pc.fill_null(lang, "NULL"),
            "n": pa.array(np.ones(len(m1), dtype=np.int64)),
            "valid_v1": pa.array(m1.astype(np.int64)),
            "valid_v2": pa.array(m2.astype(np.int64)),
            "newly_invalid": pa.array((m1 & ~m2).astype(np.int64))})
        g = t.group_by("lang").aggregate(
            [("n", "sum"), ("valid_v1", "sum"), ("valid_v2", "sum"),
             ("newly_invalid", "sum")])
        return g.select(['lang', 'n_sum', 'valid_v1_sum', 'valid_v2_sum', 'newly_invalid_sum']).rename_columns(["lang", "n", "valid_v1", "valid_v2",
                                 "newly_invalid"])


def schema_migration_impact(sf_dir: str):
    """Schema-evolution impact audit — the question every schema change
    raises at 100 TB: which rows that pass TODAY's contract would fail
    the PROPOSED one (v2 tightens text minLength 50 -> 200, drops 'zh'
    from the lang enum, caps n_chars at 5000)? BOTH draft-07 validators
    compile ONCE per actor (the ValidateStage discipline) and score
    each batch in the same pass, so migration what-if costs one scan —
    never a second validation job. Emits per lang (NULL langs bucket
    as 'NULL'): (lang, n, valid_v1, valid_v2, newly_invalid)."""
    ds = _read(sf_dir, "documents")
    # langs are a bounded dimension: per-block partials fold on the driver
    # (<= blocks x langs rows — the verdicts/scorecard fold rationale)
    parts = (ds.map_batches(_MigrationValidator,
                            batch_format="pyarrow",
                            concurrency=(1, 8))
             .to_pandas())
    ints = ["n", "valid_v1", "valid_v2", "newly_invalid"]
    out = parts.groupby("lang", as_index=False)[ints].sum()
    return (out.sort_values("lang").reset_index(drop=True)
            .astype({c: np.int64 for c in ints}))


def dedup_waterfall(sf_dir: str):
    """Dedup waterfall report: how many docs each successive
    normalization stage collapses — raw exact text, then
    lower+whitespace-squash (the normalize_text convention), then the
    aggressive strip-to-[a-z ] form (the normalized_exact_dedup
    convention). Each stage's key is a FUNCTION of the previous
    stage's (equal raw => equal normalized => equal stripped), so the
    waterfall is exactly three distinct-counts — ONE pass emits
    per-block distinct (stage, md5) pairs (32 B keys, never text) and
    one narrow groupby dedups globally; stage survivor counts fold as
    3 ints. Emits (stage, label, docs_in, n_distinct, removed)."""
    import hashlib

    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def keys(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        raw = b.column("text")
        s2 = pc.utf8_trim(pc.replace_substring_regex(
            pc.utf8_lower(raw), " +", " "), " ")
        s3 = pc.utf8_trim(pc.replace_substring_regex(
            pc.replace_substring_regex(pc.utf8_lower(raw),
                                       "[^a-z ]", ""),
            " +", " "), " ")
        outs, stages = [], []
        for i, col in enumerate((raw, s2, s3), start=1):
            hs = {hashlib.md5(t.encode("utf-8")).hexdigest()
                  for t in col.to_pylist()}
            outs.extend(sorted(hs))
            stages.extend([i] * len(hs))
        return pa.table({"stage": pa.array(
            np.asarray(stages, dtype=np.int64)),
            "k": pa.array(outs, type=pa.string())})

    def totals(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        return pa.table({"n": pa.array([len(b)], type=pa.int64())})

    n_total = int(ds.map_batches(totals, batch_format="pyarrow")
                  .to_pandas()["n"].sum())
    dist = (ds.map_batches(keys, batch_format="pyarrow")
            .groupby(["stage", "k"])
            .aggregate(Count(alias_name="c"))
            .map_batches(lambda b: pa.table({
                "stage": b.column("stage"),
                "one": pa.array(np.ones(len(b), dtype=np.int64))}),
                batch_format="pyarrow")
            .to_pandas().groupby("stage")["one"].sum())
    labels = {1: "exact", 2: "lower+ws", 3: "alpha-only"}
    rows, docs_in = [], n_total
    for s in (1, 2, 3):
        nd = int(dist.get(s, 0))
        rows.append((s, labels[s], docs_in, nd, docs_in - nd))
        docs_in = nd
    return pd.DataFrame(rows, columns=["stage", "label", "docs_in",
                                       "n_distinct", "removed"]) \
        .astype({"stage": np.int64, "docs_in": np.int64,
                 "n_distinct": np.int64, "removed": np.int64})


PRICE_DISP_TOP = 20


def part_price_dispersion(sf_dir: str):
    """Pricing-consistency audit: per part, the spread of realized
    unit prices across its lineitems (floor-milli unit price =
    1000 * price_cents // qty_units; rows with zero quantity drop) —
    top-20 by (dispersion_ppm desc, partkey asc), where
    dispersion_ppm = 1e6 * (max - min) // max. Per-block partial
    min/max/count per part via argsort + ufunc.reduceat; the merge is
    ADAPTIVE: under a 10M-part footer gate the block partials (each
    <= |parts| rows) fold in ONE single-task numpy reduceat pass — the
    embedding_covariance_by_label discipline; Ray's per-group aggregate
    at ~200k part groups was the real 5 s cost at sf0.1, not the
    partial — with the part-keyed Ray groupby kept as the >cap scale
    path (path parity asserted by the oracle). Emits (l_partkey,
    n_lines, min_unit_milli, max_unit_milli, dispersion_ppm)."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def part(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        qty = _cents(b.column("l_quantity").to_numpy(
            zero_copy_only=False)) // 100
        cents = _cents(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False))
        m = qty > 0
        unit = (1000 * cents[m]) // qty[m]
        pk = pk[m]
        if len(pk) == 0:
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in ("pk", "n", "lo", "hi")})
        order = np.argsort(pk, kind="stable")
        pk_s, u_s = pk[order], unit[order]
        starts = np.flatnonzero(np.r_[True, pk_s[1:] != pk_s[:-1]])
        return pa.table({
            "pk": pa.array(pk_s[starts]),
            "n": pa.array(np.diff(np.r_[starts, len(pk_s)])
                          .astype(np.int64)),
            "lo": pa.array(np.minimum.reduceat(u_s, starts)),
            "hi": pa.array(np.maximum.reduceat(u_s, starts))})

    partials = ds.map_batches(part, batch_format="pyarrow")
    n_parts_rows = _table_rows(sf_dir, "part")
    if n_parts_rows is not None and n_parts_rows <= 10_000_000:
        def fold(b: pa.Table) -> pa.Table:
            pk = b.column("pk").to_numpy(zero_copy_only=False)
            if len(pk) == 0:
                return pa.table({c: pa.array([], type=pa.int64())
                                 for c in ("pk", "n_lines",
                                           "min_unit_milli",
                                           "max_unit_milli")})
            n = b.column("n").to_numpy(zero_copy_only=False)
            lo = b.column("lo").to_numpy(zero_copy_only=False)
            hi = b.column("hi").to_numpy(zero_copy_only=False)
            order = np.argsort(pk, kind="stable")
            pk_s = pk[order]
            starts = np.flatnonzero(np.r_[True, pk_s[1:] != pk_s[:-1]])
            return pa.table({
                "pk": pa.array(pk_s[starts]),
                "n_lines": pa.array(
                    np.add.reduceat(n[order], starts).astype(np.int64)),
                "min_unit_milli": pa.array(
                    np.minimum.reduceat(lo[order], starts)),
                "max_unit_milli": pa.array(
                    np.maximum.reduceat(hi[order], starts))})

        agg = (partials.repartition(1)
               .map_batches(fold, batch_format="pyarrow",
                            batch_size=None).to_pandas())
    else:                                  # pragma: no cover - scale path
        agg = (partials.groupby("pk")
               .aggregate(Sum("n", alias_name="n_lines"),
                          Min("lo", alias_name="min_unit_milli"),
                          Max("hi", alias_name="max_unit_milli"))
               .to_pandas())
    cols = ["l_partkey", "n_lines", "min_unit_milli",
            "max_unit_milli", "dispersion_ppm"]
    if agg.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    agg = agg[agg["max_unit_milli"] > 0].copy()
    agg["dispersion_ppm"] = (
        1_000_000 * (agg["max_unit_milli"] - agg["min_unit_milli"])
        // agg["max_unit_milli"])
    agg = agg.rename(columns={"pk": "l_partkey"})
    agg = agg.sort_values(["dispersion_ppm", "l_partkey"],
                          ascending=[False, True]) \
        .head(PRICE_DISP_TOP).reset_index(drop=True)
    return agg[cols].astype(np.int64)


def retention_by_first_type(sf_dir: str):
    """Acquisition-quality audit: does the FIRST thing a user does
    predict whether they come back? Users cohorted by their first
    event's type ((ts, event_id) order); retained = any event on days
    first_day+1 .. first_day+7. ONE user-keyed sorted scan emits
    (first_type, retained) per user; a type-bounded fold computes
    rates in floor-ppm. Emits (first_type, n_users, n_retained,
    retention_ppm)."""
    from rayschema.dedup import sorted_group_scan

    day_us = 86_400_000_000
    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])

    out_schema = pa.schema([("first_type", pa.string()),
                            ("retained", pa.int64())])

    def group_fn(g: pa.Table) -> pa.Table:
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        if len(et) == 0:
            return None
        d0 = ts[0] // day_us
        days = ts // day_us
        ret = int(((days >= d0 + 1) & (days <= d0 + 7)).any())
        return pa.table({"first_type": pa.array([str(et[0])]),
                         "retained": pa.array([ret],
                                              type=pa.int64())})

    scan = sorted_group_scan(
        ds.map_batches(_narrow_events, batch_format="pyarrow"),
        ["user_id"], group_fn, out_schema,
        order_cols=["ts_us", "event_id"])
    agg = scan.to_pandas()
    cols = ["first_type", "n_users", "n_retained", "retention_ppm"]
    if agg.empty:
        return pd.DataFrame({"first_type": pd.Series([], dtype=object),
                             **{c: pd.Series([], dtype=np.int64)
                                for c in cols[1:]}})
    g = agg.groupby("first_type").agg(
        n_users=("retained", "size"),
        n_retained=("retained", "sum")).reset_index()
    g["retention_ppm"] = (1_000_000 * g["n_retained"]) // g["n_users"]
    return (g.sort_values("first_type").reset_index(drop=True)
            [cols].astype({c: np.int64 for c in cols[1:]}))


def blocking_quality_audit(sf_dir: str):
    """Record-linkage blocking evaluation (the pair-completeness /
    reduction-ratio pair from the ER literature): blocks on
    (lang, source, n_chars) — how many candidate pairs does blocking
    generate, what fraction of TRUE duplicate pairs (same text) does
    it retain, and how much of the all-pairs grid does it prune? No
    pair ever materializes: every number is sum over groups of
    C(group, 2), folded from three narrow groupby counts (md5 keys for
    the text groups), with the final arithmetic in Python ints (pair
    counts pass int64 at corpus scale; the oracle widens to HUGEINT).
    Emits (n_docs, cand_pairs, true_pairs, found_pairs,
    completeness_ppm, reduction_ppm)."""
    import hashlib

    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang", "source",
                        "n_chars"])

    def keys(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(
            pc.is_valid(b.column("text")),
            pc.and_(pc.is_valid(b.column("lang")),
                    pc.and_(pc.is_valid(b.column("source")),
                            pc.is_valid(b.column("n_chars"))))))
        hs = [hashlib.md5(t.encode("utf-8")).hexdigest()
              for t in b.column("text").to_pylist()]
        lang = b.column("lang").to_numpy(zero_copy_only=False)
        src = b.column("source").to_numpy(zero_copy_only=False)
        nc = b.column("n_chars").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        blk = [f"{lg}|{s}|{n}" for lg, s, n in zip(lang, src, nc)]
        return pa.table({"h": pa.array(hs, type=pa.string()),
                         "blk": pa.array(blk, type=pa.string())})

    proj = ds.map_batches(keys, batch_format="pyarrow").materialize()

    def pair_mass(grouped, cols):
        cnt = grouped.groupby(cols).aggregate(
            Count(alias_name="c"))

        def part(b: pa.Table) -> pa.Table:
            c = b.column("c").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            # per-block partial of sum C(c, 2) — Python-int exact
            tot = sum(int(x) * (int(x) - 1) // 2 for x in c)
            return pa.table({"p": pa.array([tot], type=pa.int64()),
                             "n": pa.array([int(c.sum())],
                                           type=pa.int64())})

        f = cnt.map_batches(part, batch_format="pyarrow").to_pandas()
        return int(f["p"].sum()), int(f["n"].sum())

    cand, n_docs = pair_mass(proj, ["blk"])
    true_p, _ = pair_mass(proj, ["h"])
    found, _ = pair_mass(proj, ["blk", "h"])
    total = n_docs * (n_docs - 1) // 2
    comp = (1_000_000 * found) // true_p if true_p else 1_000_000
    red = (1_000_000 * (total - cand)) // total if total else 0
    return pd.DataFrame([(n_docs, cand, true_p, found, comp, red)],
                        columns=["n_docs", "cand_pairs", "true_pairs",
                                 "found_pairs", "completeness_ppm",
                                 "reduction_ppm"]).astype(np.int64)


class _ScorecardStage:
    """Actor: langid predictor + Gopher rules fused — ONE pass emits
    per-source quality partials (the reporting join that would
    otherwise cost three scans)."""

    def __init__(self):
        from rayschema.text import LangId

        self.langid = LangId()

    def __call__(self, b: pa.Table) -> pa.Table:
        from rayschema.text import gopher_flags_batch

        b = b.filter(pc.is_valid(b.column("text")))
        empty = pa.table({"source": pa.array([], type=pa.string()),
                          **{c: pa.array([], type=pa.int64())
                             for c in ("n", "chars", "mism",
                                       "gpass")}})
        if len(b) == 0:
            return empty
        lid = self.langid(b)
        pred = lid.column("lang_pred").to_numpy(zero_copy_only=False)
        lang = b.column("lang").to_numpy(zero_copy_only=False)
        lang_valid = pc.is_valid(b.column("lang")).to_numpy(
            zero_copy_only=False)
        mism = (lang_valid & (pred != lang)).astype(np.int64)
        gf = gopher_flags_batch(b)
        gpass = gf.column("gopher_pass").to_numpy(
            zero_copy_only=False).astype(np.int64)
        chars = pc.utf8_length(b.column("text")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        src = b.column("source").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"source": src, "n": 1, "chars": chars,
                           "mism": mism, "gpass": gpass})
        g = df.groupby("source", as_index=False).sum()
        return pa.table({"source": pa.array(g["source"]),
                         **{c: pa.array(g[c].to_numpy(np.int64))
                            for c in ("n", "chars", "mism",
                                      "gpass")}})


class _ScorecardFusedStage(_ScorecardStage):
    """One-pass variant for the footer-gated small-corpus path: the
    per-source quality partials (kind=0) AND the per-batch-distinct
    (source, md5) rows for dup mass (kind=1) ride the SAME scan — a
    typed kind marker, the copurchase side-channel discipline — so the
    scorecard costs ONE execution instead of two."""

    def __call__(self, b: pa.Table) -> pa.Table:
        import hashlib

        part = _ScorecardStage.__call__(self, b)
        bf = b.filter(pc.is_valid(b.column("text")))
        src = bf.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        hs = [hashlib.md5(t.encode("utf-8")).hexdigest()
              for t in bf.column("text").to_pylist()]
        hd = pd.DataFrame({"source": src.to_numpy(zero_copy_only=False),
                           "h": hs}).drop_duplicates()
        n0, n1 = part.num_rows, len(hd)
        zeros1 = np.zeros(n1, dtype=np.int64)
        return pa.table({
            "kind": pa.array(np.concatenate([
                np.zeros(n0, dtype=np.int64),
                np.ones(n1, dtype=np.int64)])),
            "source": pa.array(
                part.column("source").to_pylist() +
                hd["source"].tolist(), type=pa.string()),
            **{c: pa.array(np.concatenate([
                part.column(c).to_numpy(zero_copy_only=False), zeros1]))
               for c in ("n", "chars", "mism", "gpass")},
            "h": pa.array([None] * n0 + hd["h"].tolist(),
                          type=pa.string())})


def source_scorecard(sf_dir: str):
    """Per-source quality scorecard — the one-row-per-source reporting
    join a curation team reads daily: volume, char mass, exact-dup
    ppm, declared-vs-predicted language mismatch ppm (the shared
    langid predictor), and Gopher pass ppm. TWO passes total: the
    fused langid+Gopher actor partials, and the narrow (source, md5)
    distinct fold for dup mass. Docs with NULL text are out of scope
    on both sides; NULL declared lang never counts as a mismatch.
    Emits (source, n_docs, chars_sum, dup_ppm, langid_mismatch_ppm,
    gopher_pass_ppm)."""
    import hashlib

    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang", "source"])

    # per-block partials are O(sources) rows each, so the source-keyed
    # fold is a driver pandas groupby over blocks x sources rows — no
    # all-to-all (sources are a bounded dimension, the nation/region
    # fold rationale)
    cols = ["source", "n_docs", "chars_sum", "dup_ppm",
            "langid_mismatch_ppm", "gopher_pass_ppm"]
    n_docs_total = _table_rows(sf_dir, "documents")
    if n_docs_total is not None and n_docs_total <= 1_000_000:
        # footer-gated ONE-pass path: quality partials and the
        # per-batch-distinct (source, md5) rows ride the same scan
        # (kind-marked, _ScorecardFusedStage); driver splits + folds
        rows = (ds.map_batches(_ScorecardFusedStage,
                               batch_format="pyarrow",
                               concurrency=(1, 8)).to_pandas())
        agg = (rows[rows["kind"] == 0]
               .groupby("source", as_index=False)[
                   ["n", "chars", "mism", "gpass"]].sum())
        if agg.empty:
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 **{c: pd.Series([], dtype=np.int64)
                                    for c in cols[1:]}})
        hp = rows.loc[rows["kind"] == 1, ["source", "h"]] \
            .drop_duplicates()
        dist = hp.groupby("source")["h"].count()
    else:
        agg = (ds.map_batches(_ScorecardStage, batch_format="pyarrow",
                              concurrency=(1, 8))
               .to_pandas())
        agg = agg.groupby("source", as_index=False)[
            ["n", "chars", "mism", "gpass"]].sum()
        if agg.empty:
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 **{c: pd.Series([], dtype=np.int64)
                                    for c in cols[1:]}})

        def hkeys(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_valid(b.column("text")))
            hs = [hashlib.md5(t.encode("utf-8")).hexdigest()
                  for t in b.column("text").to_pylist()]
            src = b.column("source")
            if isinstance(src, pa.ChunkedArray):
                src = src.combine_chunks()
            return pa.table({"source": src,
                             "h": pa.array(hs, type=pa.string())})

        dist = (ds.map_batches(hkeys, batch_format="pyarrow")
                .groupby(["source", "h"])
                .aggregate(Count(alias_name="c"))
                .map_batches(lambda b: pa.table({
                    "source": b.column("source"),
                    "one": pa.array(np.ones(len(b), dtype=np.int64))}),
                    batch_format="pyarrow")
                .to_pandas().groupby("source")["one"].sum())
    agg = agg.sort_values("source").reset_index(drop=True)
    nd = agg["source"].map(dist).fillna(0).astype(np.int64)
    n = agg["n"].astype(np.int64)
    agg["n_docs"] = n
    agg["chars_sum"] = agg["chars"].astype(np.int64)
    agg["dup_ppm"] = (1_000_000 * (n - nd)) // n
    agg["langid_mismatch_ppm"] = (1_000_000
                                  * agg["mism"].astype(np.int64)) // n
    agg["gopher_pass_ppm"] = (1_000_000
                              * agg["gpass"].astype(np.int64)) // n
    return agg[cols].astype({c: np.int64 for c in cols[1:]})


SAMPLE_FIDELITY_MOD = 100003
SAMPLE_FIDELITY_PCT = 10


def sample_fidelity_audit(sf_dir: str):
    """Sampling QA: does the deterministic 10% hash sample actually
    look like the corpus? Exact two-sample KS distance between the
    n_chars distributions of the sample (doc_id-hash bucket < 10 of
    100 — the weighted_sample bucket convention) and the FULL corpus,
    in cleared-denominator integers (the ks_chars_two_sources sweep:
    D_num = max |n_s * cumF(v) - n_f * cumS(v)|, D = D_num /
    (n_f * n_s)). ONE histogram pass; driver big-int cumsums. Emits
    (n_full, n_sample, d_num, ks_ppm)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("n_chars")))
        ids = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        v = b.column("n_chars").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        in_s = ((ids % SAMPLE_FIDELITY_MOD) * SHUF_KNUTH % 100
                < SAMPLE_FIDELITY_PCT).astype(np.int64)
        df = pd.DataFrame({"v": v, "cs": in_s})
        g = (df.groupby("v", as_index=False)
             .agg(cs=("cs", "sum"), cf=("cs", "size")))
        return pa.table({"v": pa.array(g["v"].to_numpy(np.int64)),
                         "cs": pa.array(g["cs"].to_numpy(np.int64)),
                         "cf": pa.array(g["cf"].to_numpy(np.int64))})

    hist = (ds.map_batches(part, batch_format="pyarrow")
            .groupby("v")
            .aggregate(Sum("cs", alias_name="cs"),
                       Sum("cf", alias_name="cf"))
            .to_pandas().sort_values("v"))
    cols = ["n_full", "n_sample", "d_num", "ks_ppm"]
    if hist.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    cs = [int(x) for x in hist["cs"]]
    cf = [int(x) for x in hist["cf"]]
    n_s, n_f = sum(cs), sum(cf)
    if n_s == 0 or n_f == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    d_num, as_, af = 0, 0, 0
    for s, f in zip(cs, cf):
        as_ += s
        af += f
        d_num = max(d_num, abs(n_s * af - n_f * as_))
    return pd.DataFrame([(n_f, n_s, d_num,
                          (1_000_000 * d_num) // (n_f * n_s))],
                        columns=cols).astype(np.int64)


def validation_drift_by_day(sf_dir: str):
    """Data-quality drift monitor: the props-contract pass rate PER
    EVENT DAY — the ops dashboard that catches a producer shipping
    malformed payloads on day N (a global verdict hides it). Same
    compiled dynamic-JSON validator as validate_events_props, with the
    day riding through the batch; day-bounded verdict partials fold
    through one narrow groupby. Emits (day, n_events, n_valid,
    valid_ppm)."""
    from ray.data.aggregate import Sum

    from rayschema.jsoncol import validate_json_column

    day_us = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "props"])

    def add_day(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("ts")))
        return pa.table({
            "event_id": b.column("event_id").cast(pa.int64()),
            "props": b.column("props"),
            "day": pa.array(b.column("ts").cast(pa.int64())
                            .to_numpy(zero_copy_only=False)
                            // day_us)})

    validated = validate_json_column(
        ds.map_batches(add_day, batch_format="pyarrow"),
        PROPS_SCHEMA_JSON, json_col="props",
        keep_cols=["event_id", "day"], concurrency=(1, 16))

    def part(b: pa.Table) -> pa.Table:
        d = b.column("day").to_numpy(zero_copy_only=False)
        v = b.column("valid").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        df = pd.DataFrame({"day": d, "n": 1, "nv": v})
        g = df.groupby("day", as_index=False).sum()
        return pa.Table.from_pandas(g.astype(np.int64),
                                    preserve_index=False)

    agg = (validated.map_batches(part, batch_format="pyarrow")
           .groupby("day")
           .aggregate(Sum("n", alias_name="n_events"),
                      Sum("nv", alias_name="n_valid")).to_pandas())
    cols = ["day", "n_events", "n_valid", "valid_ppm"]
    if agg.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    agg["valid_ppm"] = (1_000_000 * agg["n_valid"].astype(np.int64)
                        ) // agg["n_events"].astype(np.int64)
    return (agg.sort_values("day").reset_index(drop=True)
            [cols].astype(np.int64))


def region_quarter_lift(sf_dir: str, broadcast_cap: int = None):
    """Contingency lift on a MEASURE (not counts): revenue share of
    each (region, quarter) cell vs what independence predicts —
    lift_ppm = 1e6 * obs * total // (row_total * col_total), exact in
    Python big ints over the bounded region x quarter grid (the
    lang_source_residuals idea applied to cents mass). Customer ->
    nation resolves ADAPTIVELY (the q10_returned_items discipline:
    broadcast sorted map under Q3_BROADCAST_CAP gated on the customer
    parquet footer count — customer scales with the corpus — a
    Dataset.join hash exchange past it); nation -> region is a 25-row
    always-broadcast map. Misses drop like the inner join; per-block
    (region, quarter, cents) partials fold through one tiny groupby.
    Emits (r_regionkey, yr, q, cents, lift_ppm)."""
    import ray
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate",
                            "o_totalprice"])
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_regionkey"]).to_pandas()
    nk = nat["n_nationkey"].to_numpy(np.int64)
    o2 = np.argsort(nk)
    nk = nk[o2]
    nrk = nat["n_regionkey"].to_numpy(np.int64)[o2]

    def _oq(b: pa.Table):
        cents = _cents(b.column("o_totalprice").to_numpy(
            zero_copy_only=False))
        d = b.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[M]").astype(np.int64)
        return d // 12 + 1970, (d % 12) // 3 + 1, cents

    def _nat_to_region(nkey, _nk=nk, _nrk=nrk):
        pos2 = np.clip(np.searchsorted(_nk, nkey), 0, len(_nk) - 1)
        return _nrk[pos2], _nk[pos2] == nkey

    cap = Q3_BROADCAST_CAP if broadcast_cap is None else broadcast_cap
    n_cust = _table_rows(sf_dir, "customer")
    if n_cust is not None and n_cust <= cap:
        cust = _read(sf_dir, "customer",
                     columns=["c_custkey", "c_nationkey"]).to_pandas()
        ck = cust["c_custkey"].to_numpy(np.int64)
        o_ = np.argsort(ck)
        ck = ck[o_]
        cnk = cust["c_nationkey"].to_numpy(np.int64)[o_]
        ref = ray.put((ck, cnk))

        def part(b: pa.Table, _ref=ref) -> pa.Table:
            ck, cnk = ray.get(_ref)
            empty = pa.table({c: pa.array([], type=pa.int64())
                              for c in ("rk", "yr", "q", "cents")})
            c = b.column("o_custkey").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            if len(ck) == 0 or len(c) == 0 or len(nk) == 0:
                return empty
            yr, q, cents = _oq(b)
            pos = np.clip(np.searchsorted(ck, c), 0, len(ck) - 1)
            ok = ck[pos] == c
            rk, hit = _nat_to_region(cnk[pos])
            ok &= hit
            df = pd.DataFrame({"rk": rk[ok], "yr": yr[ok],
                               "q": q[ok], "cents": cents[ok]})
            g = df.groupby(["rk", "yr", "q"], as_index=False).sum()
            return pa.Table.from_pandas(g.astype(np.int64),
                                        preserve_index=False)

        cells = orders.map_batches(part, batch_format="pyarrow")
    else:
        cust_ds = _read(sf_dir, "customer",
                        columns=["c_custkey", "c_nationkey"])

        def oprep(b: pa.Table) -> pa.Table:
            yr, q, cents = _oq(b)
            return pa.table({
                "o_custkey": b.column("o_custkey").cast(pa.int64()),
                "yr": pa.array(yr), "q": pa.array(q),
                "cents": pa.array(cents)})

        oq = orders.map_batches(oprep, batch_format="pyarrow")
        est = (oq.size_bytes() or 0) + (cust_ds.size_bytes() or 0)
        n_parts = int(min(256, max(8, est // (128 << 20) + 8)))

        def region_part(b: pa.Table) -> pa.Table:
            empty = pa.table({c: pa.array([], type=pa.int64())
                              for c in ("rk", "yr", "q", "cents")})
            if b.num_rows == 0 or len(nk) == 0:
                return empty
            nkey = b.column("c_nationkey").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            rk, hit = _nat_to_region(nkey)
            df = pd.DataFrame({
                "rk": rk[hit],
                "yr": b.column("yr").to_numpy(
                    zero_copy_only=False)[hit],
                "q": b.column("q").to_numpy(zero_copy_only=False)[hit],
                "cents": b.column("cents").to_numpy(
                    zero_copy_only=False)[hit]})
            g = df.groupby(["rk", "yr", "q"], as_index=False).sum()
            return pa.Table.from_pandas(g.astype(np.int64),
                                        preserve_index=False)

        cells = (oq.join(cust_ds, join_type="inner",
                         num_partitions=n_parts,
                         on=("o_custkey",), right_on=("c_custkey",))
                 .map_batches(region_part, batch_format="pyarrow"))

    agg = (cells
           .groupby(["rk", "yr", "q"])
           .aggregate(Sum("cents", alias_name="cents")).to_pandas())
    cols = ["r_regionkey", "yr", "q", "cents", "lift_ppm"]
    if agg.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    total = int(agg["cents"].sum())
    row = agg.groupby("rk")["cents"].sum()
    col = agg.groupby(["yr", "q"])["cents"].sum()
    lifts = []
    for _, r in agg.iterrows():
        obs = int(r["cents"])
        rt = int(row[r["rk"]])
        ct = int(col[(r["yr"], r["q"])])
        lifts.append((1_000_000 * obs * total) // (rt * ct))
    agg["lift_ppm"] = np.asarray(lifts, dtype=np.int64)
    agg = agg.rename(columns={"rk": "r_regionkey"})
    return (agg.sort_values(["r_regionkey", "yr", "q"])
            .reset_index(drop=True)[cols].astype(np.int64))


def repeat_revenue_share(sf_dir: str):
    """Loyalty economics: what share of each quarter's revenue comes
    from REPEAT orders (the customer already ordered strictly earlier
    in (orderdate, orderkey) order)? Each customer's first order packs
    into one int64 (day * 2^40 + orderkey — lexicographic min under
    one Min aggregate; orderkey < 2^40 documented), broadcast sorted
    (customer-bounded, the supplier_nation_balance discipline); the
    second pass is a stateless flag + quarter-grid fold. Emits
    (yr, q, total_cents, repeat_cents, repeat_ppm)."""
    import ray
    from ray.data.aggregate import Min, Sum

    day_us = 86_400_000_000
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"])

    def packed(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = b.column("o_orderkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        day = (b.column("o_orderdate").cast(pa.int64())
               .to_numpy(zero_copy_only=False) // day_us)
        return pa.table({"ck": pa.array(ck),
                         "pack": pa.array((day << 40) | ok)})

    firsts = (orders.map_batches(packed, batch_format="pyarrow")
              .groupby("ck")
              .aggregate(Min("pack", alias_name="fp")).to_pandas())
    fk = firsts["ck"].to_numpy(np.int64)
    o_ = np.argsort(fk)
    fk = fk[o_]
    fp = firsts["fp"].to_numpy(np.int64)[o_]
    ref = ray.put((fk, fp))

    def part(b: pa.Table, _ref=ref) -> pa.Table:
        fk, fp = ray.get(_ref)
        empty = pa.table({c: pa.array([], type=pa.int64())
                          for c in ("yr", "q", "cents", "rep")})
        ck = b.column("o_custkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if len(ck) == 0 or len(fk) == 0:
            return empty
        ok = b.column("o_orderkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        day = (b.column("o_orderdate").cast(pa.int64())
               .to_numpy(zero_copy_only=False) // day_us)
        cents = _cents(b.column("o_totalprice").to_numpy(
            zero_copy_only=False))
        pack = (day << 40) | ok
        pos = np.clip(np.searchsorted(fk, ck), 0, len(fk) - 1)
        rep = ((fk[pos] == ck) & (pack > fp[pos])).astype(np.int64)
        m = (b.column("o_orderdate").to_numpy(zero_copy_only=False)
             .astype("datetime64[M]").astype(np.int64))
        df = pd.DataFrame({"yr": m // 12 + 1970,
                           "q": (m % 12) // 3 + 1,
                           "cents": cents, "rep": rep * cents})
        g = df.groupby(["yr", "q"], as_index=False).sum()
        return pa.Table.from_pandas(g.astype(np.int64),
                                    preserve_index=False)

    agg = (orders.map_batches(part, batch_format="pyarrow")
           .groupby(["yr", "q"])
           .aggregate(Sum("cents", alias_name="total_cents"),
                      Sum("rep", alias_name="repeat_cents"))
           .to_pandas())
    cols = ["yr", "q", "total_cents", "repeat_cents", "repeat_ppm"]
    if agg.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    agg = agg[agg["total_cents"] > 0].copy()
    agg["repeat_ppm"] = (1_000_000
                         * agg["repeat_cents"].astype(np.int64)
                         ) // agg["total_cents"].astype(np.int64)
    return (agg.sort_values(["yr", "q"]).reset_index(drop=True)
            [cols].astype(np.int64))


def vocab_growth_curve(sf_dir: str):
    """Heaps'-law audit: vocabulary size at each ingestion-order
    prefix (the dedup_rate_curve grid) — how fast new words keep
    arriving decides tokenizer retraining cadence. Each word's first
    occurrence is min doc_id over ONE (word, min) groupby of per-block
    distinct pairs (the shared whitespace-word convention); first-ids
    and doc-ids then fold to the 11-slot depth grid inside map_batches
    (driver state 11 ints). Emits (depth, n_docs, vocab_size,
    words_per_kdoc)."""
    from ray.data.aggregate import Min

    from rayschema.text import _flatten_words_arrow

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    depths = np.asarray(DEDUP_CURVE_DEPTHS, dtype=np.int64)

    def pairs(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({"w": pa.array([], type=pa.string()),
                             "fid": pa.array([], type=pa.int64())})
        flat, lens, _ = _flatten_words_arrow(col)
        ids = np.repeat(b.column("doc_id").cast(pa.int64())
                        .to_numpy(zero_copy_only=False), lens)
        df = pd.DataFrame({"w": flat.to_pandas(), "fid": ids}) \
            .groupby("w", as_index=False).min()
        return pa.table({"w": pa.array(df["w"]),
                         "fid": pa.array(df["fid"]
                                         .to_numpy(np.int64))})

    def slot_hist(col: str):
        def fn(b: pa.Table) -> pa.Table:
            v = b.column(col).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(depths, v, side="right")
            keep = idx < len(depths)
            cnt = np.bincount(idx[keep], minlength=len(depths))
            return pa.table({"slot": pa.array(np.arange(
                len(depths), dtype=np.int64)),
                "n": pa.array(cnt.astype(np.int64))})
        return fn

    firsts = (ds.map_batches(pairs, batch_format="pyarrow")
              .groupby("w").aggregate(Min("fid", alias_name="fid")))
    hf = (firsts.map_batches(slot_hist("fid"), batch_format="pyarrow")
          .to_pandas().groupby("slot")["n"].sum())

    def docs_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        ids = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        idx = np.searchsorted(depths, ids, side="right")
        keep = idx < len(depths)
        cnt = np.bincount(idx[keep], minlength=len(depths))
        return pa.table({"slot": pa.array(np.arange(
            len(depths), dtype=np.int64)),
            "n": pa.array(cnt.astype(np.int64))})

    hd = (ds.map_batches(docs_part, batch_format="pyarrow")
          .to_pandas().groupby("slot")["n"].sum())
    n_doc = np.zeros(len(depths), dtype=np.int64)
    n_voc = np.zeros(len(depths), dtype=np.int64)
    if len(hd):
        n_doc[hd.index.to_numpy(np.int64)] = hd.to_numpy(np.int64)
    if len(hf):
        n_voc[hf.index.to_numpy(np.int64)] = hf.to_numpy(np.int64)
    cd, cv = np.cumsum(n_doc), np.cumsum(n_voc)
    rows = [(int(dep), int(cd[i]), int(cv[i]),
             (1000 * int(cv[i])) // int(cd[i]))
            for i, dep in enumerate(depths) if cd[i] > 0]
    return pd.DataFrame(rows, columns=["depth", "n_docs",
                                       "vocab_size",
                                       "words_per_kdoc"]) \
        .astype(np.int64)


def user_gap_median_histogram(sf_dir: str):
    """Engagement-rhythm distribution: each user's MEDIAN inter-event
    gap (lower median in whole seconds — percentile_disc(0.5)
    semantics, no interpolation), bucketed by bit length (log2 bands:
    0s, 1s, 2-3s, 4-7s, ...) — the user-rhythm histogram that sizes
    session-gap thresholds empirically. ONE user-keyed sorted scan
    emits a single (median_s) row per multi-event user; the log-band
    fold is bit-length arithmetic (the HLL frexp trick). Emits
    (band, lo_s, n_users)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    out_schema = pa.schema([("med_s", pa.int64())])

    def group_fn(g: pa.Table) -> pa.Table:
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        if len(ts) < 2:
            return None
        gaps = np.sort(np.diff(ts) // 1_000_000)
        med = int(gaps[(len(gaps) - 1) // 2])
        return pa.table({"med_s": pa.array([med], type=pa.int64())})

    scan = sorted_group_scan(
        ds.map_batches(_narrow_events, batch_format="pyarrow"),
        ["user_id"], group_fn, out_schema,
        order_cols=["ts_us", "event_id"])
    meds = scan.to_pandas()
    cols = ["band", "lo_s", "n_users"]
    if meds.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    m = meds["med_s"].to_numpy(np.int64)
    band = np.frexp(m.astype(np.float64))[1]      # bit length; 0 -> 0
    u, c = np.unique(band, return_counts=True)
    return pd.DataFrame({"band": u.astype(np.int64),
                         "lo_s": np.where(u == 0, 0,
                                          1 << np.maximum(u - 1, 0))
                         .astype(np.int64),
                         "n_users": c.astype(np.int64)}) \
        .astype(np.int64)


def discount_by_qty_band(sf_dir: str):
    """Price-elasticity table: mean discount by quantity band (1-10,
    11-20, ... — does buying more actually earn deeper discounts?).
    Exact integer mean in micro-units: 1e6 * sum_bp // n over discount
    basis points. ONE stateless histogram pass, band-bounded fold.
    Emits (band_lo, band_hi, n_lines, sum_disc_bp, mean_disc_micro)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_discount"])

    def part(b: pa.Table) -> pa.Table:
        qty = _cents(b.column("l_quantity").to_numpy(
            zero_copy_only=False)) // 100
        bp = np.round(b.column("l_discount").to_numpy(
            zero_copy_only=False) * 10000).astype(np.int64)
        band = np.maximum((qty - 1) // 10, 0)
        df = pd.DataFrame({"band": band, "n": 1, "bp": bp})
        g = df.groupby("band", as_index=False).sum()
        return pa.Table.from_pandas(g.astype(np.int64),
                                    preserve_index=False)

    agg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby("band")
           .aggregate(Sum("n", alias_name="n_lines"),
                      Sum("bp", alias_name="sum_disc_bp"))
           .to_pandas())
    cols = ["band_lo", "band_hi", "n_lines", "sum_disc_bp",
            "mean_disc_micro"]
    if agg.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    b = agg["band"].to_numpy(np.int64)
    agg["band_lo"] = b * 10 + 1
    agg["band_hi"] = b * 10 + 10
    # bp are 1e-4 fractions: x100 scales the mean to micro-fractions
    agg["mean_disc_micro"] = (100
                              * agg["sum_disc_bp"].astype(np.int64)
                              ) // agg["n_lines"].astype(np.int64)
    return (agg.sort_values("band_lo").reset_index(drop=True)
            [cols].astype(np.int64))


def stuttered_events(sf_dir: str):
    """Producer-bug audit: CONSECUTIVE events of a user repeating the
    identical (event_type, cents) payload regardless of gap — the
    double-fire signature a time-window debounce misses when the
    retry lands late. One user-keyed sorted scan, vectorized neighbor
    compare per group; per-type counts fold on the bounded frame.
    Emits (event_type, n_events, n_stutters)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id",
                        "value"])

    def narrow(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(
            pc.is_valid(b.column("user_id")),
            pc.and_(pc.is_valid(b.column("ts")),
                    pc.is_valid(b.column("event_type")))))
        v = b.column("value").to_numpy(zero_copy_only=False)
        cents = np.where(np.isnan(v), -1, np.round(v * 100)) \
            .astype(np.int64)
        et = b.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return pa.table({
            "user_id": pa.array(b.column("user_id")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64)),
            "ts_us": pa.array(b.column("ts").cast(pa.int64())
                              .to_numpy(zero_copy_only=False)),
            "event_id": pa.array(b.column("event_id")
                                 .to_numpy(zero_copy_only=False)
                                 .astype(np.int64)),
            "event_type": et,
            "cents": pa.array(cents)})

    out_schema = pa.schema([("event_type", pa.string()),
                            ("n_events", pa.int64()),
                            ("n_stutters", pa.int64())])

    def group_fn(g: pa.Table) -> pa.Table:
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        c = g.column("cents").to_numpy(zero_copy_only=False)
        n = len(et)
        if n == 0:
            return None
        codes, uniq = pd.factorize(et, sort=True)
        stut = np.zeros(n, dtype=bool)
        if n > 1:
            stut[1:] = (codes[1:] == codes[:-1]) & (c[1:] == c[:-1])
        tot = np.bincount(codes, minlength=len(uniq))
        st = np.bincount(codes[stut], minlength=len(uniq))
        return pa.table({
            "event_type": pa.array([str(u) for u in uniq]),
            "n_events": pa.array(tot.astype(np.int64)),
            "n_stutters": pa.array(st.astype(np.int64))})

    scan = sorted_group_scan(
        ds.map_batches(narrow, batch_format="pyarrow"),
        ["user_id"], group_fn, out_schema,
        order_cols=["ts_us", "event_id"])
    agg = scan.to_pandas()
    cols = ["event_type", "n_events", "n_stutters"]
    if agg.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             **{c: pd.Series([], dtype=np.int64)
                                for c in cols[1:]}})
    g = (agg.groupby("event_type", as_index=False).sum()
         .sort_values("event_type").reset_index(drop=True))
    return g[cols].astype({c: np.int64 for c in cols[1:]})


def hour_of_week_profile(sf_dir: str):
    """Weekly seasonality fingerprint per event type: the 168-slot
    hour-of-week histogram reduced to its extremes — peak slot, trough
    slot (lowest NONZERO-aware: min over all 168 slots including
    zeros), and peak/mean ratio in ppm (how spiky is the week). Epoch
    us anchors to Thursday, so slot = (epoch_hours + 96) % 168 makes
    slot 0 = Monday 00:00 (pinned by test). ONE bincount pass over the
    bounded grid; extremes are driver arithmetic. Ties take the
    earliest slot. Emits (event_type, peak_slot, peak_n, trough_slot,
    trough_n, peak_over_mean_ppm)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("ts")),
                             pc.is_valid(b.column("event_type"))))
        h = (b.column("ts").cast(pa.int64())
             .to_numpy(zero_copy_only=False) // 3_600_000_000)
        slot = (h + 96) % 168
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": et, "slot": slot})
        g = df.groupby(["event_type", "slot"], as_index=False).size()
        return pa.table({
            "event_type": pa.array(g["event_type"]),
            "slot": pa.array(g["slot"].to_numpy(np.int64)),
            "n": pa.array(g["size"].to_numpy(np.int64))})

    hist = (ds.map_batches(part, batch_format="pyarrow")
            .groupby(["event_type", "slot"])
            .aggregate(Sum("n", alias_name="n")).to_pandas())
    cols = ["event_type", "peak_slot", "peak_n", "trough_slot",
            "trough_n", "peak_over_mean_ppm"]
    if hist.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             **{c: pd.Series([], dtype=np.int64)
                                for c in cols[1:]}})
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        full = np.zeros(168, dtype=np.int64)
        full[g["slot"].to_numpy(np.int64)] = g["n"].to_numpy(np.int64)
        tot = int(full.sum())
        peak = int(full.argmax())
        trough = int(full.argmin())
        rows.append((et, peak, int(full[peak]), trough,
                     int(full[trough]),
                     (1_000_000 * 168 * int(full[peak])) // tot))
    return pd.DataFrame(rows, columns=cols) \
        .astype({c: np.int64 for c in cols[1:]})


def lang_trigram_cosine(sf_dir: str):
    """Language distance matrix: cosine similarity between the
    character-TRIGRAM count vectors of each declared-language pair —
    the classic q-gram profile distance (Cavnar-Trenkle family).
    Exact integer dot products and squared norms fold from ONE
    (lang, packed-trigram) groupby (trigrams pack into one int64 —
    3 x 21-bit codepoints — and the space is charset-bounded); the
    cos_ppm is the shared fixed-order float64 floor expression, so
    even the float step hash-matches. Emits per pair (lang_a, lang_b,
    dot, norm_a2, norm_b2, cos_ppm) with lang_a < lang_b."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("text")),
                             pc.is_valid(b.column("lang"))))
        empty = pa.table({"lang": pa.array([], type=pa.string()),
                          "tri": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        if len(b) == 0:
            return empty
        texts = b.column("text").to_pylist()
        langs = b.column("lang").to_numpy(zero_copy_only=False)
        joined = "".join(texts)
        if len(joined) < 3:
            return empty
        cps = np.frombuffer(joined.encode("utf-32-le",
                                          "surrogatepass"),
                            dtype=np.uint32).astype(np.int64)
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                           count=len(texts))
        di = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        # trigram packs into one int64 (3 x 21-bit codepoints — the
        # frequent_triples key trick); valid iff it stays in one doc
        code = ((cps[:-2] << 42) | (cps[1:-1] << 21) | cps[2:])
        ok = di[:-2] == di[2:]
        df = pd.DataFrame({"lang": langs[di[:-2][ok]],
                           "tri": code[ok]})
        g = df.groupby(["lang", "tri"], as_index=False).size()
        return pa.table({
            "lang": pa.array(g["lang"], type=pa.string()),
            "tri": pa.array(g["tri"].to_numpy(np.int64)),
            "n": pa.array(g["size"].to_numpy(np.int64))})

    hist = (ds.map_batches(part, batch_format="pyarrow")
            .groupby(["lang", "tri"])
            .aggregate(Sum("n", alias_name="n")).to_pandas())
    cols = ["lang_a", "lang_b", "dot", "norm_a2", "norm_b2",
            "cos_ppm"]
    if hist.empty:
        return pd.DataFrame({"lang_a": pd.Series([], dtype=object),
                             "lang_b": pd.Series([], dtype=object),
                             **{c: pd.Series([], dtype=np.int64)
                                for c in cols[2:]}})
    vecs = {lg: dict(zip(g["tri"], g["n"].astype(int)))
            for lg, g in hist.groupby("lang")}
    langs = sorted(vecs)
    rows = []
    for i, a in enumerate(langs):
        for bl in langs[i + 1:]:
            va, vb = vecs[a], vecs[bl]
            dot = sum(int(va[t]) * int(vb[t])
                      for t in va.keys() & vb.keys())
            na = sum(int(x) * int(x) for x in va.values())
            nb = sum(int(x) * int(x) for x in vb.values())
            den = np.sqrt(np.float64(na) * np.float64(nb))
            cp = int(np.floor(1_000_000.0 * dot / den)) \
                if den > 0 else 0
            rows.append((a, bl, dot, na, nb, cp))
    return pd.DataFrame(rows, columns=cols) \
        .astype({c: np.int64 for c in cols[2:]})


def label_centroid_cosine(sf_dir: str):
    """Embedding-space class geometry: cosine similarity between the
    SUM vectors of every label pair (same direction as mean centroids
    — the n factors cancel in cosine, so no division enters until the
    final shared float floor). ONE pass folds per-label
    (n, sum-vector) on the 1e-6 quantization; pair arithmetic is
    exact Python ints over the label-bounded matrix. Emits
    (label_a, label_b, n_a, n_b, dot, cos_ppm)."""
    ds = _read(sf_dir, "embeddings", columns=["embedding", "label"])

    def part(b: pa.Table) -> pa.Table:
        lab = b.column("label").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if len(lab) == 0:
            return pa.table({"label": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "svec": pa.array([], type=pa.list_(
                                 pa.int64()))})
        qm = _emb_qmat(b)
        rows = {"label": [], "n": [], "svec": []}
        for lv in np.unique(lab):
            m = lab == lv
            rows["label"].append(int(lv))
            rows["n"].append(int(m.sum()))
            rows["svec"].append([int(x) for x in qm[m].sum(0)])
        return pa.table({"label": pa.array(rows["label"],
                                           type=pa.int64()),
                         "n": pa.array(rows["n"], type=pa.int64()),
                         "svec": pa.array(rows["svec"],
                                          type=pa.list_(pa.int64()))})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    cols = ["label_a", "label_b", "n_a", "n_b", "dot", "cos_ppm"]
    if parts.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    agg = {}
    for _, r in parts.iterrows():
        lv = int(r["label"])
        n, s = agg.get(lv, (0, None))
        v = np.asarray(r["svec"], dtype=object)
        agg[lv] = (n + int(r["n"]),
                   v if s is None else s + v)
    labels = sorted(agg)
    rows = []
    for i, a in enumerate(labels):
        for bl in labels[i + 1:]:
            na, sa = agg[a]
            nb, sb = agg[bl]
            dot = int(sum(int(x) * int(y) for x, y in zip(sa, sb)))
            qa = int(sum(int(x) * int(x) for x in sa))
            qb = int(sum(int(x) * int(x) for x in sb))
            den = np.sqrt(np.float64(qa) * np.float64(qb))
            cp = int(np.floor(1_000_000.0 * dot / den)) \
                if den > 0 else 0
            rows.append((a, bl, na, nb, dot, cp))
    return pd.DataFrame(rows, columns=cols).astype(np.int64)


BOILERPLATE_PREFIX_LEN = 32
BOILERPLATE_TOP = 20


def common_prefix_boilerplate(sf_dir: str):
    """Boilerplate detector: the top-20 most repeated 32-char document
    PREFIXES (shared headers/templates are the #1 boilerplate source a
    prefix scan catches for free). One narrow (prefix) groupby of
    per-block partial counts; only prefixes repeating >= 2 times
    surface. Docs shorter than 32 chars use their full text. Emits
    (prefix, n_docs, rk) by (n desc, prefix asc)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["text"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        pref = pc.utf8_slice_codeunits(b.column("text"), 0,
                                       BOILERPLATE_PREFIX_LEN)
        t = pa.table({"prefix": pref})
        g = t.group_by("prefix").aggregate([("prefix", "count")])
        return g.select(['prefix', 'prefix_count']).rename_columns(["prefix", "n"])

    agg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby("prefix")
           .aggregate(Sum("n", alias_name="n_docs")).to_pandas())
    cols = ["prefix", "n_docs", "rk"]
    if agg.empty:
        return pd.DataFrame({"prefix": pd.Series([], dtype=object),
                             "n_docs": pd.Series([], dtype=np.int64),
                             "rk": pd.Series([], dtype=np.int64)})
    agg = agg[agg["n_docs"] >= 2].sort_values(
        ["n_docs", "prefix"], ascending=[False, True]) \
        .head(BOILERPLATE_TOP).reset_index(drop=True)
    agg["rk"] = np.arange(1, len(agg) + 1, dtype=np.int64)
    return agg[cols].astype({"n_docs": np.int64, "rk": np.int64})


def purchase_value_trend_users(sf_dir: str):
    """Within-user spend trajectory: per user with >= 2 purchase
    events, compare the FIRST and LAST purchase value ((ts, event_id)
    order) and bucket users into up / down / flat — the simplest
    honest LTV-direction signal. One user-keyed sorted scan emits a
    single trend row per qualifying user; a 3-bin fold finishes.
    Emits (trend, n_users, sum_first_cents, sum_last_cents)."""
    from rayschema.dedup import sorted_group_scan

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id",
                        "value"])

    def narrow(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(
            pc.and_(pc.is_valid(b.column("user_id")),
                    pc.is_valid(b.column("ts"))),
            pc.and_(pc.equal(b.column("event_type"), "purchase"),
                    pc.is_valid(b.column("value")))))
        return pa.table({
            "user_id": pa.array(b.column("user_id")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64)),
            "ts_us": pa.array(b.column("ts").cast(pa.int64())
                              .to_numpy(zero_copy_only=False)),
            "event_id": pa.array(b.column("event_id")
                                 .to_numpy(zero_copy_only=False)
                                 .astype(np.int64)),
            "cents": pa.array(_cents(b.column("value")
                                     .to_numpy(zero_copy_only=False)))
        })

    out_schema = pa.schema([("trend", pa.string()),
                            ("first_c", pa.int64()),
                            ("last_c", pa.int64())])

    def group_fn(g: pa.Table) -> pa.Table:
        c = g.column("cents").to_numpy(zero_copy_only=False)
        if len(c) < 2:
            return None
        f, l = int(c[0]), int(c[-1])
        trend = "up" if l > f else ("down" if l < f else "flat")
        return pa.table({"trend": pa.array([trend]),
                         "first_c": pa.array([f], type=pa.int64()),
                         "last_c": pa.array([l], type=pa.int64())})

    scan = sorted_group_scan(
        ds.map_batches(narrow, batch_format="pyarrow"),
        ["user_id"], group_fn, out_schema,
        order_cols=["ts_us", "event_id"])
    agg = scan.to_pandas()
    cols = ["trend", "n_users", "sum_first_cents", "sum_last_cents"]
    if agg.empty:
        return pd.DataFrame({"trend": pd.Series([], dtype=object),
                             **{c: pd.Series([], dtype=np.int64)
                                for c in cols[1:]}})
    g = agg.groupby("trend").agg(
        n_users=("first_c", "size"),
        sum_first_cents=("first_c", "sum"),
        sum_last_cents=("last_c", "sum")).reset_index()
    return (g.sort_values("trend").reset_index(drop=True)
            [cols].astype({c: np.int64 for c in cols[1:]}))


# ------------------------------------------------------------- round-4 session-13 wave

def wds_roundtrip(sf_dir: str):
    """WebDataset tar-shard sink+source round trip (the training-job
    loader format: one tar per shard, one member group per sample —
    Aizman et al.'s public WebDataset convention). The engine writes
    one shard per block (text as the raw ``.txt`` member, the other
    columns in the ``.json`` sidecar, schema pinned by a header
    member) and reads one decode task per shard
    (rayschema/sources.py: write_wds_shard / read_wds_shard). Same
    per-lang aggregate contract as the ORC/Feather/Avro round trips,
    so any codec infidelity (unicode, nulls, member grouping) breaks
    the value hash."""
    return _format_roundtrip(sf_dir, "wds")


def table_format_upsert(sf_dir: str):
    """Versioned-table MERGE (upsert): commit the documents table as
    v1, then upsert a changed batch (every doc_id % 7 == 0 row becomes
    lang='xx' with n_chars + 1000 — the late-correction ingest shape).
    The ingest batch is the small side: its keys broadcast once as a
    sorted array, the v1 snapshot streams through ONE stateless
    anti-join filter (searchsorted + verify, no shuffle), and the
    union commits as v2 (rayschema/tableformat.py:upsert_version);
    v1 stays readable (time travel). Emits per-lang
    (lang, n_rows, id_sum, chars_sum) of the v2 snapshot — a dropped
    old row, a lost unmatched row, or a double-applied update all
    break the hash."""
    import shutil
    import tempfile

    from ray.data.aggregate import Sum

    from rayschema.tableformat import (commit_version, read_version,
                                       upsert_version)

    root = os.path.join(tempfile.gettempdir(),
                        f"rayschema_upsert_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    commit_version(root, ds, mode="overwrite")

    def changed(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = pa.array(ids % 7 == 0)
        b = b.filter(keep)
        n = b.num_rows
        nc = b.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64) + 1000
        return pa.table({"doc_id": b.column("doc_id").cast(pa.int64()),
                         "lang": pa.array(["xx"] * n, type=pa.string()),
                         "n_chars": pa.array(nc)})

    upsert_version(root, ds.map_batches(changed, batch_format="pyarrow"),
                   key_col="doc_id")

    def partial(b: pa.Table) -> pa.Table:
        lang = b.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nc = b.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        t = pa.table({"lang": lang, "ids": pa.array(ids),
                      "nc": pa.array(nc),
                      "one": pa.array(np.ones(len(ids), dtype=np.int64))})
        g = t.group_by("lang").aggregate(
            [("ids", "sum"), ("nc", "sum"), ("one", "sum")])
        return g.select(['lang', 'ids_sum', 'nc_sum', 'one_sum']).rename_columns(["lang", "id_sum", "chars_sum", "n_rows"])

    return (read_version(root)
            .map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("n_rows", alias_name="n_rows"),
                       Sum("id_sum", alias_name="id_sum"),
                       Sum("chars_sum", alias_name="chars_sum")))


def table_format_compact(sf_dir: str):
    """Snapshot-preserving small-files compaction: commit the documents
    table as MANY small files (v1), bin-pack + merge them into few
    files as v2 (rayschema/tableformat.py:compact_version — plan from
    manifest metadata only, one Ray task per bin, row conservation
    verified before the commit), then time-travel read BOTH versions.
    Emits (version, n_rows, id_sum, chars_sum) twice — identical
    aggregates by construction, and the oracle recomputes them from
    the source table, so a compaction that drops, duplicates or
    corrupts rows in EITHER version breaks the hash. The
    files-actually-shrank assertion lives in
    tests/test_sources.py::test_table_format_compact_shrinks_files."""
    import shutil
    import tempfile

    from rayschema.tableformat import (commit_version, compact_version,
                                       read_version)

    root = os.path.join(tempfile.gettempdir(),
                        f"rayschema_compact_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"]) \
        .repartition(24)
    commit_version(root, ds, mode="overwrite")
    compact_version(root, target_rows=10_000_000)

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nc = b.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"n_rows": pa.array([len(ids)], type=pa.int64()),
                         "id_sum": pa.array([int(ids.sum())],
                                            type=pa.int64()),
                         "chars_sum": pa.array([int(nc.sum())],
                                               type=pa.int64())})

    rows = []
    for v in (1, 2):
        agg = (read_version(root, v)
               .map_batches(partial, batch_format="pyarrow")
               .to_pandas().sum())
        rows.append((v, int(agg["n_rows"]), int(agg["id_sum"]),
                     int(agg["chars_sum"])))
    return pd.DataFrame(rows, columns=["version", "n_rows", "id_sum",
                                       "chars_sum"]).astype(np.int64)


ZONEMAP_LO, ZONEMAP_HI = 150, 300    # n_chars predicate window


def zonemap_pruned_stats(sf_dir: str):
    """Zone-map (min/max) file pruning — the lakehouse data-skipping
    primitive: write a COPY of documents clustered by n_chars (sorted
    -> 16 files, so each file covers a narrow value range), build
    per-file zone maps from PARQUET FOOTER metadata only (row-group
    min/max — no data read), and answer
    ``n_chars in [ZONEMAP_LO, ZONEMAP_HI)`` by scanning ONLY the files
    whose zone overlaps the window (exact row filter inside the
    survivors). Emits one row (n_rows, id_sum, chars_sum); the oracle
    computes the same aggregate with a plain WHERE over the original
    table, so pruning that skips a file it needed — or reads a row it
    shouldn't — breaks the hash. The files-actually-pruned assertion
    lives in tests/test_sources.py::test_zonemap_prunes_files."""
    agg, _, _ = _zonemap_scan(sf_dir)
    return agg


def _zonemap_scan(sf_dir: str):
    """Shared body of zonemap_pruned_stats (+ its pruning test):
    returns (one-row DataFrame, n_files_total, n_files_read)."""
    import glob as _glob
    import shutil
    import tempfile

    import pyarrow.parquet as pq
    import ray.data as rd

    root = os.path.join(tempfile.gettempdir(),
                        f"rayschema_zonemap_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    # cluster by the pruning column, then write one file per block
    ds.sort("n_chars").repartition(16).write_parquet(root)

    files = sorted(_glob.glob(os.path.join(root, "*.parquet")))
    keep = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            ci = next(i for i in range(rgm.num_columns)
                      if rgm.column(i).path_in_schema == "n_chars")
            st = rgm.column(ci).statistics
            if st is None or not st.has_min_max:
                fmin = None                     # no stats: cannot prune
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is None or (fmax >= ZONEMAP_LO and fmin < ZONEMAP_HI):
            keep.append(f)

    def partial(b: pa.Table) -> pa.Table:
        nc = b.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = (nc >= ZONEMAP_LO) & (nc < ZONEMAP_HI)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[m]
        return pa.table({"n_rows": pa.array([int(m.sum())],
                                            type=pa.int64()),
                         "id_sum": pa.array([int(ids.sum())],
                                            type=pa.int64()),
                         "chars_sum": pa.array([int(nc[m].sum())],
                                               type=pa.int64())})

    if keep:
        agg = (rd.read_parquet(keep, columns=["doc_id", "n_chars"],
                               override_num_blocks=len(keep))
               .map_batches(partial, batch_format="pyarrow")
               .to_pandas().sum())
        out = pd.DataFrame([[int(agg["n_rows"]), int(agg["id_sum"]),
                             int(agg["chars_sum"])]],
                           columns=["n_rows", "id_sum", "chars_sum"]) \
            .astype(np.int64)
    else:
        out = pd.DataFrame([[0, 0, 0]],
                           columns=["n_rows", "id_sum", "chars_sum"]) \
            .astype(np.int64)
    return out, len(files), len(keep)


L_DIV_BUCKET = 50
L_DIV_THRESHOLD = 3


def l_diversity_audit(sf_dir: str):
    """Privacy l-diversity audit — k-anonymity's companion gate: a
    quasi-identifier group can be large (k-anonymous) yet still leak
    its SENSITIVE attribute if every member shares one value. QI =
    (lang, n_chars // 50), sensitive = source; emits groups with
    fewer than L=3 distinct sources as (lang, bucket, n_rows, l).
    One pass folds per-batch DISTINCT (lang, bucket, source) triples
    with their row counts, one narrow groupby merges them, and a
    value-space-bounded second fold counts distinct sources per QI
    cell — the distinct_users_per_type local-dedup discipline, no
    row-level shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b.column("lang")),
                             pc.and_(pc.is_valid(b.column("source")),
                                     pc.is_valid(b.column("n_chars")))))
        if b.num_rows == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "bucket": pa.array([], type=pa.int64()),
                             "source": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        bk = (b.column("n_chars").to_numpy(zero_copy_only=False)
              .astype(np.int64)) // L_DIV_BUCKET
        t = pa.table({"lang": b.column("lang"),
                      "bucket": pa.array(bk),
                      "source": b.column("source")})
        g = t.group_by(["lang", "bucket", "source"]).aggregate(
            [([], "count_all")])
        return g.select(['lang', 'bucket', 'source', 'count_all']).rename_columns(["lang", "bucket", "source", "n"])

    triples = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["lang", "bucket", "source"])
               .aggregate(Sum("n", alias_name="n"))
               .to_pandas())       # |langs| x |buckets| x |sources| cells
    if triples.empty:
        return pd.DataFrame({"lang": pd.Series([], dtype=object),
                             "bucket": pd.Series([], dtype=np.int64),
                             "n_rows": pd.Series([], dtype=np.int64),
                             "l": pd.Series([], dtype=np.int64)})
    g = (triples.groupby(["lang", "bucket"], as_index=False)
         .agg(n_rows=("n", "sum"), l=("source", "nunique")))
    g = g[g["l"] < L_DIV_THRESHOLD].copy()
    for c in ("bucket", "n_rows", "l"):
        g[c] = g[c].astype(np.int64)
    return g.sort_values(["lang", "bucket"]).reset_index(drop=True)


MG_BUDGET = 256          # Misra-Gries counters per partial sketch
MG_HH_DENOM = 200        # heavy hitter = user with > n/200 of all events


def mg_heavy_hitters_events(sf_dir: str):
    """Misra-Gries heavy hitters with EXACT verification — the missing
    member of the certified-sketch family (HLL registers, CMS planes,
    Bloom membership are already driver-checked). Pass 1: each block
    folds to a <= MG_BUDGET-counter Misra-Gries summary (Agarwal et
    al.'s mergeable-summaries rule); partials merge on the driver
    (<= budget x blocks bounded rows). Every user with true frequency
    > n/(budget+1) is GUARANTEED present, and budget 256 > denom 200,
    so the candidate set provably contains every heavy hitter. Pass
    2: exact counts of the <= 256 candidates only (broadcast sorted id
    array + per-batch searchsorted bincount), keep those with
    MG_HH_DENOM * cnt > n_total. Emits (user_id, n_events) — the
    sketch prunes the key space, the exact pass makes the answer
    SQL-checkable."""
    import ray

    from rayschema.sketches import MisraGries

    ds = _read(sf_dir, "events", columns=["user_id"])

    def part(b: pa.Table) -> pa.Table:
        u = pc.drop_null(b.column("user_id")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        mg = MisraGries(budget=MG_BUDGET)
        if len(u):
            mg.update(u)
        ks = np.fromiter(mg.counts.keys(), dtype=np.int64,
                         count=len(mg.counts))
        vs = np.fromiter(mg.counts.values(), dtype=np.int64,
                         count=len(mg.counts))
        # a dedicated marker column carries this block's raw count so
        # the driver can recover n_total without a second pass (NOT a
        # magic user_id sentinel — negative user ids stay first-class)
        return pa.table({"user_id": pa.array(np.r_[ks, 0]),
                         "c": pa.array(np.r_[vs, len(u)]
                                       .astype(np.int64)),
                         "is_total": pa.array(np.r_[
                             np.zeros(len(ks), dtype=np.int64), 1])})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                             "n_events": pd.Series([], dtype=np.int64)})
    n_total = int(parts.loc[parts["is_total"] == 1, "c"].sum())
    cnt = parts[parts["is_total"] == 0].groupby("user_id")["c"].sum()
    # flat merge of all block summaries (any merge tree preserves the
    # n/(budget+1) undercount bound — Agarwal et al. 2012): counter-wise
    # sum, then ONE batched decrement back to the budget
    merged = MisraGries(budget=MG_BUDGET)
    merged.counts = {int(k): int(v) for k, v in cnt.items()}
    merged.n = n_total
    merged._shrink()
    cand = np.sort(np.fromiter(merged.counts.keys(), dtype=np.int64,
                               count=len(merged.counts)))
    if len(cand) == 0 or n_total == 0:
        return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                             "n_events": pd.Series([], dtype=np.int64)})
    cref = ray.put(cand)

    def exact(b: pa.Table, _c=cref) -> pa.Table:
        ks = ray.get(_c)
        u = pc.drop_null(b.column("user_id")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        pos = np.clip(np.searchsorted(ks, u), 0, len(ks) - 1)
        hit = ks[pos] == u
        cnt = np.bincount(pos[hit], minlength=len(ks)).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"user_id": pa.array(ks[nz]),
                         "cnt": pa.array(cnt[nz])})

    ex = ds.map_batches(exact, batch_format="pyarrow").to_pandas()
    g = ex.groupby("user_id", as_index=False)["cnt"].sum()
    g = g[MG_HH_DENOM * g["cnt"] > n_total]
    out = g.rename(columns={"cnt": "n_events"}).astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def elasticity_by_brand(sf_dir: str):
    """Grouped price-elasticity proxy: per part BRAND, the exact OLS
    slope of quantity on discount (does a deeper discount move more
    units for this brand?). Discounts quantize to basis points and
    quantities are whole units, so the five moments (n, Sd, Sq, Sdq,
    Sdd) are exact int64 per-batch partials folded through one
    25-row groupby; the slope
    sign * (1e6 * |n*Sdq - Sd*Sq|) // (n*Sdd - Sd*Sd) is arbitrary-
    precision integer arithmetic on the driver (the ols_value_on_hour
    convention, HUGEINT-replayed by the oracle). Brand rides via the
    broadcast part->brand map (part is metadata-sized; misses verified
    and dropped — inner-join semantics). Emits
    (p_brand, n, slope_ppm); zero-variance brands drop."""
    import ray

    part_tab = _read(sf_dir, "part", columns=["p_partkey", "p_brand"]) \
        .to_pandas()
    pk = part_tab["p_partkey"].to_numpy(np.int64)
    order = np.argsort(pk)
    pk = pk[order]
    brands = part_tab["p_brand"].to_numpy(dtype=object)[order]
    ref = ray.put((pk, brands))

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_discount", "l_quantity"])

    def partial(b: pa.Table, _ref=ref) -> pa.Table:
        keys, br = ray.get(_ref)
        b = b.filter(pc.and_(pc.is_valid(b.column("l_partkey")),
                             pc.and_(pc.is_valid(b.column("l_discount")),
                                     pc.is_valid(b.column("l_quantity")))))
        if b.num_rows == 0 or len(keys) == 0:
            return pa.table({"p_brand": pa.array([], type=pa.string()),
                             **{c: pa.array([], type=pa.int64())
                                for c in ("n", "sd", "sq", "sdq", "sdd")}})
        lk = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = np.round(b.column("l_discount")
                     .to_numpy(zero_copy_only=False) * 10000) \
            .astype(np.int64)
        q = np.round(b.column("l_quantity")
                     .to_numpy(zero_copy_only=False)).astype(np.int64)
        pos = np.clip(np.searchsorted(keys, lk), 0, len(keys) - 1)
        hit = keys[pos] == lk
        d, q, pos = d[hit], q[hit], pos[hit]
        gb = pd.DataFrame({"p_brand": br[pos], "n": 1, "sd": d, "sq": q,
                           "sdq": d * q, "sdd": d * d})
        g = gb.groupby("p_brand", as_index=False).sum()
        for c in ("n", "sd", "sq", "sdq", "sdd"):
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    mom = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("p_brand")
           .aggregate(*[Sum(c, alias_name=c)
                        for c in ("n", "sd", "sq", "sdq", "sdd")])
           .to_pandas())
    rows = []
    for _, r in mom.iterrows():
        n, sd, sq, sdq, sdd = (int(r["n"]), int(r["sd"]), int(r["sq"]),
                               int(r["sdq"]), int(r["sdd"]))
        den = n * sdd - sd * sd
        if den <= 0:
            continue
        num = n * sdq - sd * sq
        sign = 1 if num >= 0 else -1
        rows.append((r["p_brand"], n,
                     sign * ((10 ** 6 * abs(num)) // den)))
    return (pd.DataFrame(rows, columns=["p_brand", "n", "slope_ppm"])
            .astype({"n": np.int64, "slope_ppm": np.int64})
            .sort_values("p_brand").reset_index(drop=True))
