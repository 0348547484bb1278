"""Multimodal (binary) column plumbing.

Images / audio / video are opaque ``binary`` columns with typed metadata
columns beside them. The Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested; the actual decode kernels are
STUBBED (the codec libraries are not in this container): ``decode_fn=None``
raises ``NotImplementedError`` at the decode site, and a deterministic fake
decoder is provided for tests.

Scale notes baked into the stage defaults: binary payloads are large, so
``suggest_batch_size`` keeps batch bytes under a budget (payload x concurrency
must fit worker heap; ray_guide "Memory-aware"), and stages run as actor
pools so any model/codec state loads once per worker.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Dict, Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("mime", pa.string()),
    ("payload", pa.large_binary()),   # opaque encoded bytes
    ("width", pa.int32()),            # -1 when unknown / n.a.
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def suggest_batch_size(avg_payload_bytes: int, budget_bytes: int = 256 << 20,
                       concurrency: int = 8) -> int:
    """Batch size so payload x pool concurrency stays inside the budget."""
    per_actor = max(1, budget_bytes // max(1, concurrency))
    return max(1, min(4096, per_actor // max(1, avg_payload_bytes)))


def fake_decode(payload: bytes, kind: str) -> Dict[str, np.ndarray]:
    """Deterministic fake decoder: derives a tiny 'pixel'/'sample' tensor from
    the payload digest — stands in for PIL/libav so plumbing is testable."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0
    if kind == "image":
        return {"tensor": arr.reshape(4, 8), "n_frames": np.int32(1)}
    return {"tensor": arr, "n_frames": np.int32(len(payload) % 7 + 1)}


class MediaFeatureStage:
    """Actor-pool stage: decode -> feature-extract binary media batches.

    ``decode_fn(payload: bytes, kind: str) -> {'tensor': np.ndarray, ...}``
    is the pluggable codec; None = stub (raises NotImplementedError, making
    the missing-codec dependency explicit). Emits per-row feature columns:
    payload_sha256, payload_bytes, feat_mean, feat_std, feat_dim.
    """

    def __init__(self, decode_fn: Optional[Callable] = None,
                 payload_col: str = "payload", kind_col: str = "kind"):
        self.decode = decode_fn
        self.payload_col = payload_col
        self.kind_col = kind_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode is None:
            raise NotImplementedError(
                "media decode kernel not available in this environment: "
                "pass decode_fn (e.g. PIL/libav-backed) or use "
                "rayschema.multimodal.fake_decode for plumbing tests")
        payloads = batch.column(self.payload_col).to_pylist()
        kinds = batch.column(self.kind_col).to_pylist()
        n = len(payloads)
        sha = np.empty(n, dtype=object)
        nbytes = np.zeros(n, dtype=np.int64)
        mean = np.zeros(n, dtype=np.float64)
        std = np.zeros(n, dtype=np.float64)
        dim = np.zeros(n, dtype=np.int32)
        for i, (p, k) in enumerate(zip(payloads, kinds)):
            if p is None:
                sha[i] = None
                continue
            sha[i] = hashlib.sha256(p).hexdigest()
            nbytes[i] = len(p)
            feat = self.decode(p, k)
            t = feat["tensor"]
            mean[i] = float(t.mean())
            std[i] = float(t.std())
            dim[i] = t.size
        return (batch
                .drop_columns([self.payload_col])   # features out, payload stays in stage 1
                .append_column("payload_sha256", pa.array(sha, type=pa.string()))
                .append_column("payload_bytes", pa.array(nbytes))
                .append_column("feat_mean", pa.array(mean))
                .append_column("feat_std", pa.array(std))
                .append_column("feat_dim", pa.array(dim)))


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table matching MEDIA_SCHEMA (tests/bench)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, int(ln), dtype=np.uint8).tobytes()
                for ln in rng.integers(64, 4096, n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds, type=pa.string()),
        "mime": pa.array(["application/octet-stream"] * n),
        "payload": pa.array(payloads, type=pa.large_binary()),
        "width": pa.array(np.where(kinds == "image", 8, -1).astype(np.int32)),
        "height": pa.array(np.where(kinds == "image", 4, -1).astype(np.int32)),
        "duration_ms": pa.array(np.where(kinds != "image", 1000, -1).astype(np.int32)),
    })
