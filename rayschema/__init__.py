"""rayschema — a Ray-Data-native JSON Schema (draft-07) constraint-validation engine.

From-scratch reimplementation of the semantics of swaggest/jsonschema-go
(reference at /root/reference, cited by file:line in docstrings) re-expressed as
vectorized predicate evaluation over Arrow batches of Parquet corpora, plus the
engine-level checks the north rule demands: column statistics, uniqueness,
referential integrity, distribution drift, and checkpoint/resume.

Layout (SURVEY.md §7.0):
  ir.py        Schema document model (draft-07 keyword set + unions)
  serde.py     JSON <-> IR with unknown-key (ExtraProperties) round trip
  trivial.py   is_trivial analysis (validator-compiler pruning)
  infer.py     Arrow schema -> IR ("Reflector" analog) + options/interceptors
  compile.py   IR -> vectorized predicate plan ($ref inlining, cycle guard)
  validate.py  map_batches kernels: masks, violation rows, sha256 stamp
  sketches.py  HyperLogLog + KLL quantile sketches (mergeable, numpy)
  stats.py     per-column statistics (partial per batch + merge)
  unique.py    uniqueness / exact dedup + referential broadcast join
  drift.py     KLL/frequency drift vs a baseline snapshot
  corpus.py    deterministic synthetic source-code corpus (BASELINE input_hint)
  skew.py      salted split for hot keys
  manifest.py  per-partition lineage + metrics, resume filter
  pipeline.py  end-to-end flagship validation pipeline
  dedup.py     MinHash-LSH / SimHash / n-gram Jaccard / embedding near-dup
  similarity.py brute-force + LSH-bucketed ANN over embedding columns
  text.py      language-ID, quality scoring, token counting, fingerprinting
  multimodal.py kind-routed binary-column stages (real codec table + stubs)
  mediaprobe.py metadata probes for the stubbed-decode formats (MP3/ADTS/H.264)
  jsoncol.py   dynamic JSON-string-column validation (shape-grouped fallback)
  sources.py   multi-format corpus sources + sinks (parquet/jsonl/csv)
  schemadocs.py schema documents as data (distributed parse/analyze)
  queries.py   driver-contract query pipelines (__ray_entry__ surface)
"""

from rayschema.ir import Schema, ABSENT
from rayschema.serde import schema_from_json, schema_to_json

__all__ = ["Schema", "ABSENT", "schema_from_json", "schema_to_json"]
