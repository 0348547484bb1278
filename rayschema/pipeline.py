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

from rayschema import validate as V

from rayschema.compile import compile_validator
from rayschema.corpus import CORPUS_SCHEMA_JSON, LANGS
from rayschema.drift import compare, load_baseline, save_baseline, snapshot_from_stats
from rayschema.manifest import Manifest, PartitionRecord
from rayschema.serde import schema_from_json
from rayschema.stats import dataset_stats

KEY_COLS = ("repo", "path", "commit")

# Content-scan patterns (vectorized RE2 over the content column): the
# canonical source-code-corpus checks — credentials/keys must not appear.
# Public pattern shapes (AWS key id, private key PEM headers, bearer-ish
# tokens); extend via ValidateStage(content_patterns={...}).
CONTENT_SCAN_PATTERNS = {
    "private-key": r"-----BEGIN [A-Z ]*PRIVATE KEY-----",
    "aws-key-id": r"AKIA[0-9A-Z]{16}",
    "bearer-token": r"[Bb]earer [A-Za-z0-9_\-\.=]{30,}",
}


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
                 shard: str = "all",
                 content_patterns: Optional[Dict[str, str]] = None):
        self.validator = compile_validator(schema_from_json(schema_json))
        self.registry = pa.array(sorted(registry)) if registry is not None else None
        self.content_col = content_col
        self.sha_col = sha_col
        self.ref_col = ref_col
        self.shard = shard
        self.content_patterns = (CONTENT_SCAN_PATTERNS if content_patterns is None
                                 else content_patterns)

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

        # per-row invariant: sha256(content) equality (BASELINE.json input_hint).
        # Hashing walks the Arrow data buffer directly via memoryview slices —
        # no per-row bytes allocation; the digest compare is a vectorized
        # pc.equal against the expected column.
        content = _arr(batch, self.content_col) if self.content_col in batch.schema.names else None
        sha_arr: Optional[pa.Array] = None
        if content is not None:
            sha_arr = _sha256_column(content)
        sha_ok = np.ones(n, dtype=bool)
        if self.sha_col in batch.schema.names and sha_arr is not None:
            eq = pc.equal(sha_arr, _arr(batch, self.sha_col))
            # null == null counts as ok
            both_null = pc.and_(pc.is_null(sha_arr), pc.is_null(_arr(batch, self.sha_col)))
            sha_ok = (pc.fill_null(eq, False).to_numpy(zero_copy_only=False)
                      | both_null.to_numpy(zero_copy_only=False)).astype(bool)

        content_len = (pc.utf8_length(content).cast(pa.int64())
                       if content is not None
                       else pa.nulls(n, type=pa.int64()))

        # content scan: vectorized RE2 search per pattern; a hit is a
        # violation (keyword "content-scan", message names the pattern)
        scan_ok = np.ones(n, dtype=bool)
        if content is not None and self.content_patterns:
            from rayschema.compile import Violation

            for pname, pat in self.content_patterns.items():
                hit = pc.fill_null(pc.match_substring_regex(content, pat), False)
                hit_np = hit.to_numpy(zero_copy_only=False).astype(bool)
                if hit_np.any():
                    viols = viols + [Violation("$.content", "content-scan", hit_np,
                                               f"content matches {pname}")]
                    scan_ok &= ~hit_np

        viol_col, n_viol = _violations_list_column(viols, n)
        from rayschema.unique import key_hash

        uk = key_hash(batch, [c for c in KEY_COLS if c in batch.schema.names]) \
            if any(c in batch.schema.names for c in KEY_COLS) else np.zeros(n, dtype=np.uint64)
        out = {
            "uk": pa.array(uk.view(np.int64), type=pa.int64()),
            "shard": pa.array([self.shard] * n, type=pa.string()),
            "schema_valid": pa.array(mask),
            "ref_valid": pa.array(ref_ok),
            "sha_ok": pa.array(sha_ok),
            "scan_ok": pa.array(scan_ok),
            "valid": pa.array(mask & ref_ok & sha_ok & scan_ok),
            "n_violations": pa.array(n_viol, type=pa.int32()),
            "violations": viol_col,
            "content_len": content_len,
            "content_sha256": sha_arr if sha_arr is not None
            else pa.nulls(n, type=pa.string()),
        }
        cols = {}
        for name in batch.schema.names:
            if name in (self.content_col, self.sha_col):
                continue  # content stays in stage 1; never shuffled
            cols[name] = batch.column(name)
        cols.update(out)
        return pa.table(cols)


# Worker-process-global compiled-stage cache: a STATELESS task function with
# per-process memoized state compiles the validator once per worker process
# (Ray reuses workers across tasks) while keeping the stage task-based — so
# Ray Data fuses read -> validate -> write into ONE task per input file: no
# actor-pool spawn latency, no object-store handoff between stages. Use the
# ValidateStage actor class instead when per-worker state is heavy (models).
_STAGE_CACHE: Dict[tuple, ValidateStage] = {}


def validate_stage_fn(batch: pa.Table, *, schema_json: str,
                      registry: Optional[tuple] = None,
                      shard: str = "all") -> pa.Table:
    key = (schema_json, registry, shard)
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        stage = ValidateStage(schema_json=schema_json,
                              registry=list(registry) if registry else None,
                              shard=shard)
        _STAGE_CACHE[key] = stage
    return stage(batch)


def _arr(batch: pa.Table, name: str) -> pa.Array:
    col = batch.column(name)
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _sha256_column(content: pa.Array) -> pa.Array:
    """Vectorized-as-possible sha256 hex of a (large_)string/binary column:
    one pass over the raw Arrow data buffer with memoryview slices."""
    arr = content.cast(pa.large_binary())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64,
                            count=n + 1, offset=arr.offset * 8)
    data = memoryview(buffers[2]) if buffers[2] is not None else memoryview(b"")
    valid = V.valid_mask(arr) if arr.null_count else None
    sha = hashlib.sha256
    out: List[Optional[str]] = [None] * n
    if valid is None:
        for i in range(n):
            out[i] = sha(data[offsets[i]:offsets[i + 1]]).hexdigest()
    else:
        for i in range(n):
            if valid[i]:
                out[i] = sha(data[offsets[i]:offsets[i + 1]]).hexdigest()
    return pa.array(out, type=pa.string())


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
                   batch_size: Optional[int] = None,
                   concurrency=None,   # unused: stage 1 is stateless fused tasks
                   resume: bool = True,
                   drift_baseline: Optional[str] = None,
                   check_unique: bool = True,
                   stage2: bool = True) -> Dict:
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

    phase_s: Dict[str, float] = {}

    # ---- stage 1: per-shard validation (resume skips done shards)
    t_stage1 = time.time()
    for sid, shard_fs in shards.items():
        rec = manifest.partitions.get(sid)
        # "written" = stage-1 output complete (recorded AFTER the write);
        # "done" additionally has stage-2 verdicts. Both are safe to skip.
        if resume and rec is not None and rec.status in ("written", "done"):
            continue
        t0 = time.time()
        # one read task per file: our corpus files are written ~40-250MB so
        # Ray's split heuristic (which re-plans each file into sub-reads)
        # only adds overhead (measured 4x on an 8M-row corpus)
        ds = rd.read_parquet(shard_fs, override_num_blocks=len(shard_fs))
        # stateless-task stage (worker-global compiled validator) -> Ray Data
        # fuses read -> validate -> write into one task per file
        aug = ds.map_batches(
            validate_stage_fn,
            fn_kwargs={"schema_json": schema_json,
                       "registry": tuple(registry) if registry else None,
                       "shard": sid},
            batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True)
        shard_out = os.path.join(out_dir, "validated", sid)
        # overwrite: a half-written shard (crash before the manifest record)
        # is replaced, never appended to — reruns stay idempotent
        # zstd over the default snappy: the validated output is key
        # strings + hex digests (dictionary+entropy coding halves it) and
        # at 100 TB — or on a write-throttled device — output BYTES are
        # the stage-1 bottleneck after compute. Round-4 A/B on a healthy
        # disk (60 MB/s) confirmed zstd; RAYSCHEMA_SINK_COMPRESSION
        # overrides for environments where sink CPU outweighs bytes.
        aug.write_parquet(
            shard_out, mode="overwrite",
            compression=os.environ.get("RAYSCHEMA_SINK_COMPRESSION",
                                       "zstd"))
        try:  # per-stage wall/cpu/memory breakdown for tuning (ds.stats())
            with open(os.path.join(out_dir, f"ray_stats_{sid}.txt"), "w") as f:
                f.write(aug.stats())
        except Exception:
            pass
        manifest.record(PartitionRecord(
            partition_id=sid, input_file=";".join(shard_fs),
            status="written", wall_s=round(time.time() - t0, 3)))
        manifest.save()

    phase_s["validate"] = round(time.time() - t_stage1, 2)

    if not stage2:
        # stage-1-only mode (scaling bench measures the north-star metric:
        # validated rows/sec through the full constraint suite)
        manifest.save()
        return {**manifest.summary(), "out_dir": out_dir, "phase_s": phase_s}

    # ---- stage 2: verdicts / violations / stats / uniqueness / drift over the
    # small validated dataset (content excluded by design). The three passes
    # below are independent reads of the (small) validated dataset — they run
    # CONCURRENTLY on driver threads so wall time is max(), not sum().
    vfiles = sorted(glob.glob(os.path.join(out_dir, "validated", "*", "*.parquet")))
    validated = rd.read_parquet(vfiles or os.path.join(out_dir, "validated"),
                                override_num_blocks=max(1, len(vfiles)) if vfiles else None)

    import pandas as pd
    from concurrent.futures import ThreadPoolExecutor

    def run_stats_verdicts():
        # ONE aggregate pass computes column stats AND per-shard verdict
        # counters (partial/combiner tree merge; single read)
        t0 = time.time()
        stats, verdicts = dataset_stats(
            validated, columns=["repo", "path", "commit", "lang", "content_len"],
            freq_columns=["lang"], with_verdicts=True)
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=1, default=str)
        phase_s["stats_verdicts"] = round(time.time() - t0, 2)
        return stats, verdicts

    def run_violations():
        t0 = time.time()
        (validated
         .filter(expr="n_violations > 0")
         .map_batches(_flatten_violations, batch_format="pyarrow")
         .write_parquet(os.path.join(out_dir, "violations"), mode="overwrite"))
        phase_s["violations"] = round(time.time() - t0, 2)

    def run_unique():
        if not check_unique:
            return {}
        t0 = time.time()
        import pyarrow.parquet as _pqm

        from rayschema.unique import duplicate_key_counts_adaptive

        # adaptive path selection from parquet footers (no execution).
        # NOTE: the shared `validated` dataset + select_columns inside the
        # check beats an explicit read_parquet(columns=...) here — Ray's
        # projection pushdown handles the pruning and the shared read plan
        # caches better (measured 1.37 s vs 2.35 s standalone).
        n_rows = sum(_pqm.ParquetFile(f).metadata.num_rows
                     for f in vfiles) if vfiles else None
        dups = duplicate_key_counts_adaptive(
            validated, list(KEY_COLS), uk_col="uk", n_rows=n_rows)
        dups.to_parquet(os.path.join(out_dir, "duplicates.parquet"), index=False)
        phase_s["unique"] = round(time.time() - t0, 2)
        return {"duplicate_keys": int(len(dups)),
                "duplicate_rows": int((dups["n"] - 1).sum()) if len(dups) else 0}

    t_stage2 = time.time()
    with ThreadPoolExecutor(max_workers=3) as ex:
        f_sv = ex.submit(run_stats_verdicts)
        f_vi = ex.submit(run_violations)
        f_un = ex.submit(run_unique)
        stats, verdicts = f_sv.result()
        f_vi.result()
        dup_summary = f_un.result()
    phase_s["stage2_wall"] = round(time.time() - t_stage2, 2)

    rows_v = []
    for shard, rec in sorted(verdicts.items()):
        failed = rec["rows"] - rec["passed"]
        manifest.mark_done(str(shard), row_count=rec["rows"], pass_count=rec["passed"],
                           fail_count=failed, sha_mismatch=rec["sha_mismatch"],
                           violations=rec["violations"])
        rows_v.append({"shard": shard, "rows": rec["rows"], "passed": rec["passed"],
                       "failed": failed, "sha_mismatch": rec["sha_mismatch"],
                       "violations": rec["violations"]})
    manifest.save()
    pd.DataFrame(rows_v).to_parquet(os.path.join(out_dir, "verdicts.parquet"), index=False)

    snap = snapshot_from_stats(
        stats, "content_len", "lang",
        per_partition={shard: rec["len_kll"] for shard, rec in verdicts.items()
                       if "len_kll" in rec})
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
               "drift": drift_res, "out_dir": out_dir, "phase_s": phase_s}
    return summary


def top_violating_repos(out_dir: str, k: int = 20):
    """Reporting helper (SURVEY.md §2.E sorts/top-k): repos ranked by
    violation count from the validated output — per-batch partials ->
    small groupby -> sort desc with deterministic tie-break -> limit(k)."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    vfiles = sorted(glob.glob(os.path.join(out_dir, "validated", "*", "*.parquet")))
    validated = rd.read_parquet(
        vfiles or os.path.join(out_dir, "validated"),
        columns=["repo", "n_violations"],          # prune at the read
        override_num_blocks=max(1, len(vfiles)) if vfiles else None)

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"repo": b.column("repo").to_pandas(),
                           "n_violations": b.column("n_violations").to_pandas()})
        g = (df.groupby("repo", as_index=False)
               .agg(violations=("n_violations", "sum"), rows=("n_violations", "size")))
        g["violations"] = g["violations"].astype("int64")
        g["rows"] = g["rows"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    # TREE combine instead of a keyed shuffle: with ~N_distinct keys PER BLOCK
    # the per-block partials barely compress, and Ray's sort-based aggregate
    # over blocks*N_distinct rows is minutes of work. Summation is
    # associative, so coalescing blocks and re-aggregating (fanout stage) then
    # merging the few remaining blocks on the driver gives the same result in seconds.
    def merge_stage(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"repo": b.column("repo").to_pandas(),
                           "violations": b.column("violations").to_pandas(),
                           "rows": b.column("rows").to_pandas()})
        g = df.groupby("repo", as_index=False)[["violations", "rows"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = (validated.map_batches(partial, batch_format="pyarrow")
                .repartition(8)
                .map_batches(merge_stage, batch_format="pyarrow"))
    df = partials.to_pandas()
    top = (df.groupby("repo", as_index=False)[["violations", "rows"]].sum()
             .sort_values(["violations", "repo"], ascending=[False, True])
             .head(k).reset_index(drop=True))
    return top


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
