"""Corpus generator determinism + flagship pipeline end-to-end (small scale):
exact expected violation counts from the injected anomalies, resume semantics,
uniqueness, stats and drift artifacts."""

import glob
import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from rayschema.corpus import OVERSIZE, corpus_batch, generate_corpus, lang_registry_table
from rayschema.drift import compare
from rayschema.manifest import Manifest

N = 8_000
CORPUS = "/tmp/rayschema_test/corpus"
OUT = "/tmp/rayschema_test/out"


def expected_counts(n: int) -> dict:
    ids = np.arange(n)
    null_c = ids % 503 == 0
    empty_c = ids % 97 == 0
    over = (ids % 401 == 0) & ~null_c & ~empty_c
    return {
        "referential": int((ids % 211 == 0).sum()),
        "pattern_path": int((ids % 307 == 0).sum()),
        "maxLength": int(over.sum()),
        "required_content": int(null_c.sum()),
        "dup_rows": int(((ids % 997 == 0) & (ids > 0)).sum()),
        "secrets": int(((ids % 701 == 0) & ~null_c).sum()),
    }


def test_corpus_determinism():
    a = corpus_batch(np.arange(100, 200))
    b = corpus_batch(np.arange(150, 160))
    assert a.slice(50, 10).equals(b)


def test_corpus_anomalies():
    t = corpus_batch(np.arange(N))
    exp = expected_counts(N)
    langs = np.asarray(t["lang"])
    assert int((langs == "zz").sum()) == exp["referential"]
    assert t["content"].null_count == exp["required_content"]
    lens = [len(x) if x is not None else -1 for x in t["content"].to_pylist()]
    assert sum(1 for l in lens if l > 10_000) == exp["maxLength"]
    assert all(l == OVERSIZE or l <= 8000 for l in lens if l >= 0)


@pytest.fixture(scope="module")
def pipeline_run(ray_session):
    shutil.rmtree("/tmp/rayschema_test", ignore_errors=True)
    generate_corpus(CORPUS, N, num_blocks=4)
    from rayschema.pipeline import run_validation

    summary = run_validation(CORPUS, OUT, shard_files=1, concurrency=(1, 2))
    return summary


def test_pipeline_verdicts(pipeline_run):
    s = pipeline_run
    assert s["rows"] == N
    assert s["sha_mismatch"] == 0
    exp = expected_counts(N)
    assert s["duplicate_rows"] == exp["dup_rows"]
    # failed rows = union of anomaly rows (overlaps possible)
    ids = np.arange(N)
    bad = ((ids % 211 == 0) | (ids % 307 == 0) | (ids % 503 == 0)
           | ((ids % 401 == 0) & ~(ids % 503 == 0) & ~(ids % 97 == 0))
           | ((ids % 701 == 0) & ~(ids % 503 == 0)))
    assert s["failed"] == int(bad.sum())


def test_pipeline_violation_rows(pipeline_run):
    import duckdb

    exp = expected_counts(N)
    got = dict(duckdb.sql(
        f"select keyword, count(*) from read_parquet('{OUT}/violations/*.parquet') "
        "group by 1").fetchall())
    assert got["referential"] == exp["referential"]
    assert got["enum"] == exp["referential"]          # zz also violates enum
    assert got["pattern"] == exp["pattern_path"]
    assert got["maxLength"] == exp["maxLength"]
    assert got["required"] == exp["required_content"]
    assert got["content-scan"] == exp["secrets"]


def test_pipeline_stats(pipeline_run):
    stats = json.load(open(os.path.join(OUT, "stats.json")))
    assert stats["lang"]["nulls"] == 0
    assert stats["content_len"]["nulls"] == expected_counts(N)["required_content"]
    # HLL distinct of commit ~ N - duplicated commits, within 2%
    est = stats["commit"]["distinct_hll"]
    true = N - expected_counts(N)["dup_rows"]
    assert abs(est - true) / true < 0.05
    assert stats["lang"]["freq"]["zz"] == expected_counts(N)["referential"]


def test_pipeline_manifest_and_resume(pipeline_run, ray_session):
    m = Manifest(os.path.join(OUT, "manifest.json"))
    assert all(r.status == "done" for r in m.partitions.values())
    files = sorted(glob.glob(os.path.join(CORPUS, "*.parquet")))
    assert m.pending_files(";".join([f]) for f in files) is not None
    # resume: nothing re-runs; summary identical
    from rayschema.pipeline import run_validation

    s2 = run_validation(CORPUS, OUT, shard_files=1, concurrency=(1, 2))
    assert s2["rows"] == N and s2["failed"] == pipeline_run["failed"]
    # drift vs baseline from first run: same data -> no drift
    assert s2["drift"] is not None and s2["drift"]["drifted"] is False


def test_drift_detects_shift():
    base = {"quantiles": {"0.5": 100.0, "0.9": 500.0}, "freq": {"go": 0.5, "py": 0.5}}
    cur = {"quantiles": {"0.5": 140.0, "0.9": 510.0}, "freq": {"go": 0.2, "py": 0.8}}
    r = compare(base, cur)
    assert r["drifted"] and any("0.5" in f for f in r["flags"])
    same = compare(base, base)
    assert not same["drifted"]


def test_drift_tail_quantile_has_wider_tolerance():
    # q0.99 within KLL merge-order variance (35%) does NOT flag; a gross
    # tail shift (2x — e.g. a truncation-cap change) does
    base = {"quantiles": {"0.5": 100.0, "0.99": 1000.0}, "freq": {}}
    noisy = {"quantiles": {"0.5": 100.0, "0.99": 1350.0}, "freq": {}}
    assert not compare(base, noisy)["drifted"]
    shifted = {"quantiles": {"0.5": 100.0, "0.99": 2000.0}, "freq": {}}
    r = compare(base, shifted)
    assert r["drifted"] and any("0.99" in f for f in r["flags"])
    # an inner quantile at the same 35% relative change DOES flag
    inner = {"quantiles": {"0.5": 135.0, "0.99": 1000.0}, "freq": {}}
    assert compare(base, inner)["drifted"]


def test_registry_table():
    t = lang_registry_table()
    assert t.num_rows == 7 and "zz" not in t["lang"].to_pylist()


def test_stage1_only_then_full_run_is_idempotent(pipeline_run, ray_session):
    """Regression: Ray write_parquet defaults to APPEND; a stage1-only run
    followed by a full run (or any rerun) must not duplicate rows."""
    import shutil

    from rayschema.pipeline import run_validation

    out = "/tmp/rayschema_test/out_resume"
    shutil.rmtree(out, ignore_errors=True)
    run_validation(CORPUS, out, shard_files=1, stage2=False)
    s2 = run_validation(CORPUS, out, shard_files=1)
    assert s2["rows"] == N
    s3 = run_validation(CORPUS, out, shard_files=1, resume=False)
    assert s3["rows"] == N


def test_top_violating_repos(pipeline_run, ray_session):
    from rayschema.pipeline import top_violating_repos

    top = top_violating_repos(OUT, k=5)
    assert len(top) == 5
    # the hot repo owns ~20% of rows, so it accumulates the most violations
    assert top.iloc[0]["repo"] == "org0/mono"
    assert (top["violations"].diff().dropna() <= 0).all()  # sorted desc


def test_per_partition_drift_snapshot(pipeline_run):
    """North rule: per-partition KLL quantiles recorded in the drift baseline
    and compared when partition ids match."""
    baseline = json.load(open(os.path.join(OUT, "drift_baseline.json")))
    pp = baseline.get("per_partition")
    assert pp and all(k.startswith("shard-") for k in pp)
    for quants in pp.values():
        assert quants["0.5"] > 0
    # identical per-partition snapshots -> no drift; perturbed -> flagged
    same = compare(baseline, baseline)
    assert not same["drifted"]
    import copy

    cur = copy.deepcopy(baseline)
    sid = next(iter(cur["per_partition"]))
    cur["per_partition"][sid] = {q: v * 2 for q, v in cur["per_partition"][sid].items()}
    r = compare(baseline, cur)
    assert r["drifted"] and sid in r["per_partition_drift"]


def test_drift_query_matches_compare_rule(ray_session):
    """drift_lang_by_source's integer drift rule must agree with
    drift.compare's float freq-L1 verdict (freq_tol=0.1) on every source."""
    import pyarrow.parquet as pq

    from rayschema.queries import drift_lang_by_source

    sf = "/root/testdata/sf0.001"
    out = drift_lang_by_source(sf).set_index("source")
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["source", "lang"]).to_pandas()
    docs["source"] = docs["source"].fillna("__null__")
    docs["lang"] = docs["lang"].fillna("__null__")
    base = docs["lang"].value_counts(normalize=True).to_dict()
    for src, grp in docs.groupby("source"):
        cur = grp["lang"].value_counts(normalize=True).to_dict()
        verdict = compare({"freq": base, "quantiles": {}},
                          {"freq": cur, "quantiles": {}}, freq_tol=0.1)
        got = bool(out.loc[src, "drifted"])
        # integer rule is exact; compare() floats can only disagree within
        # rounding of an l1 EXACTLY equal to 0.1 — assert the l1s match first
        l1 = out.loc[src, "l1_num"] / out.loc[src, "denom"]
        # compare() reports freq_l1 rounded to 4 decimals
        assert abs(l1 - verdict["freq_l1"]) < 1e-4, src
        if abs(l1 - 0.1) > 1e-4:
            assert got == verdict["drifted"], src


def test_mid_crash_resume_replaces_half_written_shard(ray_session):
    """Crash simulation: a shard whose stage-1 output was partially
    written but whose manifest record was NEVER committed (the crash
    window the manifest protocol defends) must be fully REPLACED on
    resume — stale partial files gone, totals exact, done shards
    skipped."""
    import pyarrow as pa

    from rayschema.pipeline import run_validation

    out = "/tmp/rayschema_test/out_crash"
    shutil.rmtree(out, ignore_errors=True)
    s1 = run_validation(CORPUS, out, shard_files=1)
    assert s1["rows"] == N

    m = Manifest(os.path.join(out, "manifest.json"))
    victim = sorted(m.partitions)[0]
    survivors = [s for s in sorted(m.partitions) if s != victim]
    # simulate the crash: drop the victim's manifest record and dirty
    # its output dir with a bogus half-written parquet file
    del m.partitions[victim]
    m.save()
    shard_dir = os.path.join(out, "validated", victim)
    bogus = os.path.join(shard_dir, "zz_halfwritten.parquet")
    pq.write_table(pa.table({"repo": pa.array(["junk"] * 7)}), bogus)
    survivor_mtimes = {
        s: sorted(os.path.getmtime(f) for f in glob.glob(
            os.path.join(out, "validated", s, "*.parquet")))
        for s in survivors}

    s2 = run_validation(CORPUS, out, shard_files=1)
    # exact totals: the half-written shard was overwritten, not appended
    assert s2["rows"] == N
    assert not os.path.exists(bogus)
    # done shards were skipped (outputs untouched)
    for s in survivors:
        assert survivor_mtimes[s] == sorted(
            os.path.getmtime(f) for f in glob.glob(
                os.path.join(out, "validated", s, "*.parquet")))
    m2 = Manifest(os.path.join(out, "manifest.json"))
    assert m2.partitions[victim].status == "done"
    shutil.rmtree(out, ignore_errors=True)
