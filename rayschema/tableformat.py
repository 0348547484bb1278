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
