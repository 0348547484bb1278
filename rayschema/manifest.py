"""Checkpoint manifest: per-partition lineage + metrics enabling exact resume.

North-rule requirement (SURVEY.md §4): every partition (= input Parquet file,
tracked via ``read_parquet(include_paths=True)``) records
``(partition_id, input_file, row_count, pass_count, fail_count,
sha_mismatch, status, wall_s)``. On resume, ``pending_files`` filters the
input file list against partitions already ``done`` — finished partitions are
skipped entirely (their outputs are already on disk under a per-partition
subdirectory, so re-running is idempotent).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Dict, List, Optional, Sequence


@dataclass
class PartitionRecord:
    partition_id: str
    input_file: str
    row_count: int = 0
    pass_count: int = 0
    fail_count: int = 0
    sha_mismatch: int = 0
    violations: int = 0
    status: str = "pending"         # pending | done | failed
    wall_s: float = 0.0
    extra: Dict = field(default_factory=dict)


class Manifest:
    def __init__(self, path: str):
        self.path = path
        self.partitions: Dict[str, PartitionRecord] = {}
        self.meta: Dict = {}
        if os.path.exists(path):
            self._load()

    def _load(self) -> None:
        with open(self.path) as f:
            doc = json.load(f)
        self.meta = doc.get("meta", {})
        for row in doc.get("partitions", []):
            rec = PartitionRecord(**row)
            self.partitions[rec.partition_id] = rec

    def save(self) -> None:
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"meta": self.meta,
                       "updated_at": time.time(),
                       "partitions": [asdict(r) for r in self.partitions.values()]},
                      f, indent=1, default=str)
        os.replace(tmp, self.path)  # atomic

    # ------------------------------------------------------------- resume
    def pending_files(self, input_files: Sequence[str]) -> List[str]:
        done = {r.input_file for r in self.partitions.values() if r.status == "done"}
        return [f for f in input_files if f not in done]

    def record(self, rec: PartitionRecord) -> None:
        self.partitions[rec.partition_id] = rec

    def mark_done(self, partition_id: str, **metrics) -> None:
        rec = self.partitions.get(partition_id)
        if rec is None:
            rec = PartitionRecord(partition_id=partition_id, input_file=partition_id)
            self.partitions[partition_id] = rec
        for k, v in metrics.items():
            if hasattr(rec, k):
                setattr(rec, k, v)
            else:
                rec.extra[k] = v
        rec.status = "done"

    def summary(self) -> Dict:
        recs = list(self.partitions.values())
        return {
            "partitions": len(recs),
            "done": sum(r.status == "done" for r in recs),
            "rows": sum(r.row_count for r in recs),
            "passed": sum(r.pass_count for r in recs),
            "failed": sum(r.fail_count for r in recs),
            "violations": sum(r.violations for r in recs),
            "sha_mismatch": sum(r.sha_mismatch for r in recs),
        }
