"""The flagship end-to-end validation pipeline.

north_star (BASELINE.json): read the source-code Parquet corpus -> vectorized
draft-07 constraint evaluation over zero-copy Arrow batches (actor pool holding
the compiled validator) -> per-partition pass/fail verdicts + violation rows +
column stats + uniqueness + referential + drift + checkpoint manifest.

Physical plan (SURVEY.md §3.4):

  stage 1 (per shard of input files; heavy, streaming, content never shuffled):
    read_parquet(shard) -> map_batches(ValidateStage actor pool) ->
    write_parquet(out/validated/shard=K)  # keys+flags+violations, NO content
  stage 2 (over the small validated dataset):
    verdicts per shard (groupby shard), violation-row flattening,
    column stats (AggregateFn tree merge), uniqueness (key-hash groupby),
    drift snapshot/compare; manifest updated after every shard (exact resume).

Sharding the input file list (driver-side, metadata only) is what makes
checkpoint/resume exact: a shard either fully wrote its validated output and
is recorded "done", or it reruns idempotently (same deterministic output).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayschema.compile import compile_validator
from rayschema.corpus import CORPUS_SCHEMA_JSON, LANGS
from rayschema.drift import compare, load_baseline, save_baseline, snapshot_from_stats
from rayschema.manifest import Manifest, PartitionRecord
from rayschema.serde import schema_from_json
from rayschema.stats import dataset_stats
from rayschema.unique import duplicate_key_counts

KEY_COLS = ("repo", "path", "commit")


class ValidateStage:
    """Actor-pool map_batches stage: compiled validator + referential set +
    sha256 stamp, built ONCE per actor (__init__), applied per Arrow batch.

    The engine analog of the reference's cross-call Reflector caches
    (/root/reference/reflect.go:93-98): compile once, reuse for every batch.
    """

    def __init__(self, schema_json: str = CORPUS_SCHEMA_JSON,
                 registry: Optional[Sequence[str]] = None,
                 content_col: str = "content",
                 sha_col: str = "content_sha256",
                 ref_col: str = "lang",
                 shard: str = "all"):
        self.validator = compile_validator(schema_from_json(schema_json))
        self.registry = pa.array(sorted(registry)) if registry is not None else None
        self.content_col = content_col
        self.sha_col = sha_col
        self.ref_col = ref_col
        self.shard = shard

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        mask, viols = self.validator.validate(batch)

        # referential: ref_col value must be in the broadcast registry
        ref_ok = np.ones(n, dtype=bool)
        if self.registry is not None and self.ref_col in batch.schema.names:
            col = _arr(batch, self.ref_col)
            member = pc.fill_null(pc.is_in(col, value_set=self.registry), False)
            ref_ok = member.to_numpy(zero_copy_only=False).astype(bool)
            if not ref_ok.all():
                from rayschema.compile import Violation
                viols = viols + [Violation(f"$.{self.ref_col}", "referential", ~ref_ok,
                                           f"{self.ref_col} not in registry")]

        # per-row invariant: sha256(content) equality (BASELINE.json input_hint)
        content = _arr(batch, self.content_col) if self.content_col in batch.schema.names else None
        sha_hex: List[Optional[str]] = [None] * n
        if content is not None:
            buf = content.cast(pa.large_binary())
            for i in range(n):
                v = buf[i].as_py()
                if v is not None:
                    sha_hex[i] = hashlib.sha256(v).hexdigest()
        sha_ok = np.ones(n, dtype=bool)
        if self.sha_col in batch.schema.names:
            expected = _arr(batch, self.sha_col).to_pylist()
            sha_ok = np.asarray([e == g for e, g in zip(expected, sha_hex)], dtype=bool)

        content_len = (pc.utf8_length(content).cast(pa.int64())
                       if content is not None
                       else pa.nulls(n, type=pa.int64()))

        viol_col, n_viol = _violations_list_column(viols, n)
        out = {
            "shard": pa.array([self.shard] * n, type=pa.string()),
            "schema_valid": pa.array(mask),
            "ref_valid": pa.array(ref_ok),
            "sha_ok": pa.array(sha_ok),
            "valid": pa.array(mask & ref_ok & sha_ok),
            "n_violations": pa.array(n_viol, type=pa.int32()),
            "violations": viol_col,
            "content_len": content_len,
            "content_sha256": pa.array(sha_hex, type=pa.string()),
        }
        cols = {}
        for name in batch.schema.names:
            if name in (self.content_col, self.sha_col):
                continue  # content stays in stage 1; never shuffled
            cols[name] = batch.column(name)
        cols.update(out)
        return pa.table(cols)


def _arr(batch: pa.Table, name: str) -> pa.Array:
    col = batch.column(name)
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


_VIOL_TYPE = pa.list_(pa.struct([("json_path", pa.string()),
                                 ("keyword", pa.string()),
                                 ("message", pa.string())]))


def _violations_list_column(viols, n: int):
    """Vectorized assembly of a list<struct> violations column from the
    per-keyword fail masks."""
    if not viols:
        empty = pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, dtype=np.int32)),
            pa.array([], type=_VIOL_TYPE.value_type))
        return empty, np.zeros(n, dtype=np.int32)
    rows_l, path_l, kw_l, msg_l = [], [], [], []
    for v in viols:
        idx = np.nonzero(v.fail_mask)[0]
        if idx.size == 0:
            continue
        rows_l.append(idx)
        path_l.append(np.full(idx.size, v.path, dtype=object))
        kw_l.append(np.full(idx.size, v.keyword, dtype=object))
        msg_l.append(np.full(idx.size, v.message, dtype=object))
    if not rows_l:
        return _violations_list_column([], n)
    rows = np.concatenate(rows_l)
    order = np.argsort(rows, kind="stable")
    rows = rows[order]
    struct = pa.StructArray.from_arrays(
        [pa.array(np.concatenate(path_l)[order], type=pa.string()),
         pa.array(np.concatenate(kw_l)[order], type=pa.string()),
         pa.array(np.concatenate(msg_l)[order], type=pa.string())],
        names=["json_path", "keyword", "message"])
    counts = np.bincount(rows, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets), struct), counts.astype(np.int32)


# --------------------------------------------------------------------------- orchestration
def _shards(files: List[str], shard_files: int) -> Dict[str, List[str]]:
    out = {}
    for i in range(0, len(files), shard_files):
        chunk = files[i:i + shard_files]
        sid = f"shard-{i // shard_files:05d}"
        out[sid] = chunk
    return out


def run_validation(corpus_path: str, out_dir: str,
                   schema_json: str = CORPUS_SCHEMA_JSON,
                   registry: Optional[Sequence[str]] = None,
                   shard_files: Optional[int] = None,
                   batch_size: int = 16384,
                   concurrency=None,
                   resume: bool = True,
                   drift_baseline: Optional[str] = None,
                   check_unique: bool = True) -> Dict:
    """Run the full flagship pipeline. Returns a summary dict; artifacts:

    out/validated/<shard>/   keys+verdict flags+violations (parquet)
    out/violations/          flattened violation rows (parquet)
    out/verdicts.parquet     per-shard pass/fail
    out/stats.json           column statistics (HLL/KLL/hist)
    out/drift.json           drift verdict vs baseline (if baseline given)
    out/manifest.json        per-partition lineage + metrics (resume)
    """
    import ray.data as rd

    registry = list(registry) if registry is not None else list(LANGS)
    files = sorted(glob.glob(os.path.join(corpus_path, "*.parquet"))) \
        if os.path.isdir(corpus_path) else [corpus_path]
    if shard_files is None:
        shard_files = max(1, len(files) // 16) if len(files) > 16 else 1
    shards = _shards(files, shard_files)

    manifest = Manifest(os.path.join(out_dir, "manifest.json"))
    manifest.meta.update({"corpus": corpus_path, "schema": json.loads(schema_json)})

    if concurrency is None:
        # actor pool sized to the cluster: leave headroom for read/write tasks
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(2, ncpu - 2))

    # ---- stage 1: per-shard validation (resume skips done shards)
    for sid, shard_fs in shards.items():
        rec = manifest.partitions.get(sid)
        if resume and rec is not None and rec.status == "done":
            continue
        t0 = time.time()
        ds = rd.read_parquet(shard_fs)
        aug = ds.map_batches(
            ValidateStage,
            fn_constructor_kwargs={"schema_json": schema_json, "registry": registry,
                                   "shard": sid},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, zero_copy_batch=True)
        shard_out = os.path.join(out_dir, "validated", sid)
        aug.write_parquet(shard_out)
        manifest.record(PartitionRecord(
            partition_id=sid, input_file=";".join(shard_fs),
            status="written", wall_s=round(time.time() - t0, 3)))
        manifest.save()

    # ---- stage 2: verdicts / violations / stats / uniqueness / drift over the
    # small validated dataset (content excluded by design)
    validated = rd.read_parquet(os.path.join(out_dir, "validated"))

    from ray.data.aggregate import Count, Sum

    per_shard = (validated
                 .map_batches(_verdict_partial, batch_format="pyarrow")
                 .groupby("shard")
                 .aggregate(Sum("rows", alias_name="rows"),
                            Sum("passed", alias_name="passed"),
                            Sum("failed", alias_name="failed"),
                            Sum("sha_mismatch", alias_name="sha_mismatch"),
                            Sum("violations", alias_name="violations"))
                 .to_pandas())
    for _, r in per_shard.iterrows():
        manifest.mark_done(str(r["shard"]), row_count=int(r["rows"]),
                           pass_count=int(r["passed"]), fail_count=int(r["failed"]),
                           sha_mismatch=int(r["sha_mismatch"]),
                           violations=int(r["violations"]))
    manifest.save()
    per_shard.to_parquet(os.path.join(out_dir, "verdicts.parquet"), index=False)

    (validated
     .filter(expr="n_violations > 0")
     .map_batches(_flatten_violations, batch_format="pyarrow")
     .write_parquet(os.path.join(out_dir, "violations"), mode="overwrite"))

    stats = dataset_stats(validated,
                          columns=["repo", "path", "commit", "lang", "content_len"],
                          freq_columns=["lang"])
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1, default=str)

    dup_summary = {}
    if check_unique:
        dups = duplicate_key_counts(validated, list(KEY_COLS)).to_pandas()
        dups.to_parquet(os.path.join(out_dir, "duplicates.parquet"), index=False)
        dup_summary = {"duplicate_keys": int(len(dups)),
                       "duplicate_rows": int((dups["n"] - 1).sum()) if len(dups) else 0}

    snap = snapshot_from_stats(stats, "content_len", "lang")
    drift_res = None
    baseline_path = drift_baseline or os.path.join(out_dir, "drift_baseline.json")
    base = load_baseline(baseline_path)
    if base is not None:
        drift_res = compare(base, snap)
        with open(os.path.join(out_dir, "drift.json"), "w") as f:
            json.dump(drift_res, f, indent=1)
    else:
        save_baseline(baseline_path, snap)

    summary = {**manifest.summary(), **dup_summary,
               "drift": drift_res, "out_dir": out_dir}
    return summary


def _verdict_partial(b: pa.Table) -> pa.Table:
    """Per-batch verdict partials (combine before the tiny shard groupby)."""
    import pandas as pd

    df = pd.DataFrame({
        "shard": b.column("shard").to_pandas(),
        "valid": b.column("valid").to_pandas(),
        "sha_ok": b.column("sha_ok").to_pandas(),
        "n_violations": b.column("n_violations").to_pandas(),
    })
    g = df.groupby("shard").agg(
        rows=("valid", "size"), passed=("valid", "sum"),
        sha_mismatch=("sha_ok", lambda s: int((~s).sum())),
        violations=("n_violations", "sum")).reset_index()
    g["failed"] = g["rows"] - g["passed"]
    g["passed"] = g["passed"].astype("int64")
    g["violations"] = g["violations"].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)


def _flatten_violations(b: pa.Table) -> pa.Table:
    """validated rows -> one output row per violation (repo, path, commit,
    json_path, keyword, message)."""
    v = _arr(b, "violations")
    off = np.asarray(v.offsets)
    lo, hi = off[0], off[-1]
    counts = np.diff(off)
    idx = np.repeat(np.arange(b.num_rows), counts)
    flat = v.values.slice(lo, hi - lo)
    out = {}
    for key in ("repo", "path", "commit", "lang", "shard"):
        if key in b.schema.names:
            out[key] = _arr(b, key).take(pa.array(idx))
    out["json_path"] = flat.field("json_path")
    out["keyword"] = flat.field("keyword")
    out["message"] = flat.field("message")
    return pa.table(out)
