"""Minimal versioned-table format (the Iceberg/Delta snapshot idea at
its core): a table directory holds immutable parquet data files plus
one JSON manifest per committed version listing exactly the files (and
their row counts) visible in that snapshot. Readers resolve a VERSION
to a file list and read only those — time travel is free, appends
never rewrite old data, and a failed write is invisible (the manifest
is the atomic commit point, written last via os.replace).

Layout:
    <dir>/data/<uuid-ish>.parquet     immutable data files
    <dir>/_manifests/v<N>.json        {"version": N, "files": [...],
                                       "rows": M, "parent": N-1}
    <dir>/_latest                     text: highest committed N

Scale note: manifests are O(files) metadata — the same footer-only
discipline as compact_parquet_dir; no data bytes ever pass through
the driver.
"""
from __future__ import annotations

import hashlib
import json
import os

MANIFEST_DIR = "_manifests"
LATEST = "_latest"


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, MANIFEST_DIR, f"v{version}.json")


def latest_version(root: str) -> int:
    p = os.path.join(root, LATEST)
    if not os.path.exists(p):
        return 0
    return int(open(p).read().strip())


def read_manifest(root: str, version: int | None = None) -> dict:
    v = latest_version(root) if version is None else version
    if v == 0:
        return {"version": 0, "files": [], "rows": 0, "parent": None}
    with open(_manifest_path(root, v)) as f:
        return json.load(f)


def commit_version(root: str, ds, mode: str = "append") -> dict:
    """Write ``ds`` as a new snapshot. mode='append' keeps the parent
    version's files visible; 'overwrite' starts the file list fresh
    (old files stay on disk for older versions — time travel).
    The new data lands first; the manifest (the commit) lands LAST
    via an atomic rename, so a crash mid-write leaves the previous
    version intact and the partial files unreferenced."""
    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(os.path.join(root, MANIFEST_DIR), exist_ok=True)
    parent = latest_version(root)
    base = read_manifest(root, parent)

    def write_block(b, _dir=data_dir):
        import pyarrow as pa
        import pyarrow.parquet as pq

        h = hashlib.sha1(
            b"".join(c.to_string().encode() for c in b.columns[:1])
            + str(b.num_rows).encode()).hexdigest()[:16]
        fp = os.path.join(_dir, f"part-{h}.parquet")
        pq.write_table(b, fp)
        return pa.table({"file": pa.array([fp]),
                         "rows": pa.array([b.num_rows])})

    marker = ds.map_batches(write_block,
                            batch_format="pyarrow").to_pandas()
    new_files = [{"path": r["file"], "rows": int(r["rows"])}
                 for _, r in marker.iterrows()]
    files = (list(base["files"]) if mode == "append" else []) \
        + sorted(new_files, key=lambda f: f["path"])
    man = {"version": parent + 1,
           "files": files,
           "rows": sum(f["rows"] for f in files),
           "parent": parent or None}
    tmp = _manifest_path(root, man["version"]) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, _manifest_path(root, man["version"]))
    ltmp = os.path.join(root, LATEST + ".tmp")
    with open(ltmp, "w") as f:
        f.write(str(man["version"]))
    os.replace(ltmp, os.path.join(root, LATEST))
    return man


def read_version(root: str, version: int | None = None,
                 columns=None):
    """Time-travel read: a Ray Dataset over exactly the snapshot's
    files (one read task per file, columns pruned at the scan)."""
    import ray.data as rd

    man = read_manifest(root, version)
    if not man["files"]:
        raise ValueError(f"version {version!r} of {root!r} is empty")
    paths = [f["path"] for f in man["files"]]
    return rd.read_parquet(paths, columns=columns,
                           override_num_blocks=len(paths))


def upsert_version(root: str, new_ds, key_col: str) -> dict:
    """MERGE (upsert) into the latest snapshot: rows of ``new_ds``
    REPLACE current rows sharing ``key_col``; everything else carries
    over. The ingest batch is the SMALL side (the dedup_incremental
    assumption): its distinct keys broadcast once as a sorted int64
    array, the current snapshot streams through one stateless
    anti-join filter (searchsorted + verify — no shuffle), and the
    union commits as a new overwrite version. Old versions stay
    readable (time travel); a crash before the manifest rename leaves
    the parent version intact. Driver state is O(ingest keys), never
    corpus-sized."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    old = read_version(root)
    cols = [f for f in old.schema().names]
    kdf = new_ds.select_columns([key_col]).to_pandas()
    keys = np.unique(kdf[key_col].to_numpy(np.int64))
    kref = ray.put(keys)

    def drop_matched(b: pa.Table, _k=kref) -> pa.Table:
        ks = ray.get(_k)
        kv = b.column(key_col).to_numpy(zero_copy_only=False)
        valid = ~pc.is_null(b.column(key_col)).to_numpy(
            zero_copy_only=False)
        kv = np.where(valid, kv, 0).astype(np.int64)
        if len(ks) == 0:
            return b
        pos = np.clip(np.searchsorted(ks, kv), 0, len(ks) - 1)
        hit = (ks[pos] == kv) & valid
        return b.filter(pa.array(~hit))

    merged = old.map_batches(drop_matched, batch_format="pyarrow") \
        .union(new_ds.select_columns(cols))
    return commit_version(root, merged, mode="overwrite")


def compact_version(root: str, target_rows: int = 1_000_000) -> dict:
    """Small-files compaction as a SNAPSHOT operation: bin-pack the
    latest manifest's files to ~``target_rows`` outputs (plan built
    from manifest metadata only — O(files) driver state, no data
    bytes), merge each bin in its own Ray task, and commit the merged
    file list as a new version. History is untouched: the parent
    version still reads the original small files. Row conservation is
    verified before the commit."""
    import pyarrow as pa
    import ray.data as rd

    parent = latest_version(root)
    man = read_manifest(root, parent)
    if not man["files"]:
        raise ValueError(f"nothing to compact under {root!r}")
    bins, cur, acc = [], [], 0
    for f in man["files"]:
        if cur and acc + f["rows"] > target_rows:
            bins.append(cur)
            cur, acc = [], 0
        cur.append(f["path"])
        acc += f["rows"]
    if cur:
        bins.append(cur)
    data_dir = os.path.join(root, "data")
    ver = parent + 1

    def merge_bin(b: "pa.Table", _dir=data_dir, _v=ver) -> "pa.Table":
        import pyarrow.parquet as pq

        outs, rows = [], []
        for i, fl in zip(b.column("bin").to_pylist(),
                         b.column("files").to_pylist()):
            t = pa.concat_tables([pq.read_table(f) for f in fl])
            fp = os.path.join(_dir, f"compact-v{_v}-{int(i):05d}.parquet")
            pq.write_table(t, fp)
            outs.append(fp)
            rows.append(t.num_rows)
        return pa.table({"file": pa.array(outs),
                         "rows": pa.array(rows, type=pa.int64())})

    plan = rd.from_arrow(pa.table({
        "bin": pa.array(range(len(bins)), type=pa.int64()),
        "files": pa.array(bins, type=pa.list_(pa.string()))})) \
        .repartition(min(len(bins), 32))
    marker = plan.map_batches(merge_bin, batch_format="pyarrow").to_pandas()
    new_files = sorted(
        ({"path": r["file"], "rows": int(r["rows"])}
         for _, r in marker.iterrows()), key=lambda f: f["path"])
    rows_out = sum(f["rows"] for f in new_files)
    if rows_out != man["rows"]:
        raise RuntimeError(
            f"compaction lost rows: {man['rows']} in, {rows_out} out")
    new_man = {"version": ver, "files": new_files, "rows": rows_out,
               "parent": parent}
    tmp = _manifest_path(root, ver) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(new_man, f)
    os.replace(tmp, _manifest_path(root, ver))
    ltmp = os.path.join(root, LATEST + ".tmp")
    with open(ltmp, "w") as f:
        f.write(str(ver))
    os.replace(ltmp, os.path.join(root, LATEST))
    return new_man
