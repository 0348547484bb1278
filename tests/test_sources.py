"""Multi-format corpus sources: the same validate stage over parquet, jsonl
and csv representations of the same data must agree."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayschema.corpus import corpus_batch
from rayschema.sources import detect_format, read_corpus


@pytest.fixture(scope="module")
def tri_format_corpus(ray_session):
    base = "/tmp/rayschema_sources"
    shutil.rmtree(base, ignore_errors=True)
    t = corpus_batch(np.arange(2000)).drop_columns(["content", "content_sha256"])
    os.makedirs(f"{base}/parquet", exist_ok=True)
    pq.write_table(t, f"{base}/parquet/part0.parquet")
    os.makedirs(f"{base}/json", exist_ok=True)
    with open(f"{base}/json/part0.jsonl", "w") as f:
        for row in t.to_pylist():
            f.write(json.dumps(row) + "\n")
    os.makedirs(f"{base}/csv", exist_ok=True)
    import pandas as pd

    t.to_pandas().to_csv(f"{base}/csv/part0.csv", index=False)
    return base


def test_detect_format(tri_format_corpus):
    b = tri_format_corpus
    assert detect_format(f"{b}/parquet") == "parquet"
    assert detect_format(f"{b}/json") == "json"
    assert detect_format(f"{b}/csv") == "csv"


def test_same_verdicts_across_formats(tri_format_corpus):
    from rayschema.compile import compile_validator
    from rayschema.corpus import CORPUS_SCHEMA_JSON
    from rayschema.serde import schema_from_json

    b = tri_format_corpus
    results = {}
    for fmt in ("parquet", "json", "csv"):
        ds = read_corpus(f"{b}/{fmt}", columns=["id", "repo", "path", "commit", "lang"])

        def verdict(batch: pa.Table) -> pa.Table:
            v = compile_validator(schema_from_json(CORPUS_SCHEMA_JSON))
            return pa.table({"id": batch.column("id"),
                             "valid": pa.array(v.probe(batch))})

        df = ds.map_batches(verdict, batch_format="pyarrow").to_pandas()
        results[fmt] = df.sort_values("id").reset_index(drop=True)
    assert results["parquet"]["valid"].equals(results["json"]["valid"])
    assert results["parquet"]["valid"].equals(results["csv"]["valid"])
    # the injected anomalies actually fail (content excluded -> only
    # pattern/enum/commit checks fire here)
    assert not results["parquet"]["valid"].all()


def test_write_corpus_roundtrip(tri_format_corpus, tmp_path):
    """write_corpus -> read_corpus round-trips identical rows per format."""
    from rayschema.sources import write_corpus

    src = read_corpus(f"{tri_format_corpus}/parquet",
                      columns=["id", "repo", "lang"])
    want = src.to_pandas().sort_values("id").reset_index(drop=True)
    for fmt in ("parquet", "json", "csv"):
        out = write_corpus(src, str(tmp_path / fmt), fmt=fmt)
        got = (read_corpus(out, fmt=fmt).to_pandas()
               .sort_values("id").reset_index(drop=True)[want.columns.tolist()])
        assert got.equals(want), fmt


def test_write_corpus_partitioned(tri_format_corpus, tmp_path):
    import os

    from rayschema.sources import write_corpus

    src = read_corpus(f"{tri_format_corpus}/parquet", columns=["id", "lang"])
    out = write_corpus(src, str(tmp_path / "by_lang"), fmt="parquet",
                       partition_cols=["lang"])
    assert any(d.startswith("lang=") for d in os.listdir(out))


def test_gzip_jsonl_and_csv_sources(ray_session, tmp_path):
    """Transport-compressed ingest: .jsonl.gz / .csv.gz read through the
    same read_corpus path (gzip peeled by extension, Arrow decompresses
    in-stream) and produce identical rows to the uncompressed forms."""
    import csv
    import gzip
    import json
    import os

    from rayschema.sources import detect_format, read_corpus

    rows = [{"doc_id": i, "text": f"doc {i}", "lang": "en"}
            for i in range(25)]
    d1 = tmp_path / "gzjson"
    d1.mkdir()
    with gzip.open(os.path.join(d1, "docs.jsonl.gz"), "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    assert detect_format(str(d1)) == "json.gz"
    df = (read_corpus(str(d1)).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert len(df) == 25 and df.loc[7, "text"] == "doc 7"

    d2 = tmp_path / "gzcsv"
    d2.mkdir()
    with gzip.open(os.path.join(d2, "docs.csv.gz"), "wt", newline="") as f:
        w = csv.writer(f)
        w.writerow(["doc_id", "text", "lang"])
        for r in rows:
            w.writerow([r["doc_id"], r["text"], r["lang"]])
    assert detect_format(str(d2)) == "csv.gz"
    df2 = (read_corpus(str(d2), columns=["doc_id", "text"]).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(df2.columns) == ["doc_id", "text"] and len(df2) == 25

    # zstd transport (the web-corpus dump convention), Arrow in-stream
    import pyarrow as _pa

    d3 = tmp_path / "zstjson"
    d3.mkdir()
    raw = "".join(json.dumps(r) + "\n" for r in rows).encode()
    with _pa.output_stream(os.path.join(d3, "docs.jsonl.zst"),
                           compression="zstd") as f:
        f.write(raw)
    assert detect_format(str(d3)) == "json.zst"
    df3 = (read_corpus(str(d3)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(df3) == 25 and df3.loc[11, "text"] == "doc 11"


def test_compact_parquet_dir(ray_session, tmp_path):
    """40 tiny files bin-pack into few outputs; rows and content survive
    exactly; rerun is idempotent (stale compact files are replaced)."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayschema.sources import compact_parquet_dir

    src = tmp_path / "small"
    out = tmp_path / "big"
    os.makedirs(src)
    rng = np.random.default_rng(3)
    all_ids = []
    for i in range(40):
        ids = rng.integers(0, 10_000, size=50).astype(np.int64)
        all_ids.append(ids)
        pq.write_table(pa.table({"id": pa.array(ids)}),
                       os.path.join(src, f"part-{i:03d}.parquet"))
    res = compact_parquet_dir(str(src), str(out), target_mb=1)
    assert res["files_in"] == 40 and res["rows"] == 2000
    assert res["files_out"] < 40
    outs = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(outs) == res["files_out"]
    got = np.sort(np.concatenate([
        pq.read_table(os.path.join(out, f)).column("id").to_numpy()
        for f in outs]))
    assert (got == np.sort(np.concatenate(all_ids))).all()
    # rerun: same result, no stale leftovers
    res2 = compact_parquet_dir(str(src), str(out), target_mb=1)
    assert res2 == res
    assert len([f for f in os.listdir(out)
                if f.endswith(".parquet")]) == res["files_out"]


def test_table_format_snapshots(ray_session, tmp_path):
    """Snapshot semantics: v1 stays readable and UNCHANGED after an
    append commits v2; overwrite starts a fresh file list but old
    versions still read; an empty version raises."""
    import ray.data as rd
    import pytest

    from rayschema.tableformat import (commit_version, latest_version,
                                       read_version)

    root = str(tmp_path / "tbl")
    ds1 = rd.from_items([{"a": 1}, {"a": 2}])
    m1 = commit_version(root, ds1, mode="overwrite")
    assert m1["version"] == 1 and m1["rows"] == 2
    ds2 = rd.from_items([{"a": 10}])
    m2 = commit_version(root, ds2, mode="append")
    assert m2["version"] == 2 and m2["rows"] == 3
    assert latest_version(root) == 2
    assert sorted(read_version(root, 1).to_pandas()["a"]) == [1, 2]
    assert sorted(read_version(root, 2).to_pandas()["a"]) == [1, 2, 10]
    m3 = commit_version(root, rd.from_items([{"a": 7}]),
                        mode="overwrite")
    assert m3["rows"] == 1
    assert sorted(read_version(root, 2).to_pandas()["a"]) == [1, 2, 10]
    assert sorted(read_version(root).to_pandas()["a"]) == [7]
    with pytest.raises(ValueError):
        read_version(root, 0)


def test_wds_shard_codec_exact(tmp_path):
    """WebDataset tar codec: schema-exact round trip incl. nulls,
    unicode, timestamps and shortest-repr doubles."""
    from rayschema.sources import read_wds_shard, write_wds_shard

    t = pa.table({
        "doc_id": pa.array([1, 2, None], type=pa.int64()),
        "lang": pa.array(["en", None, "zh"]),
        "text": pa.array(["héllo", None, "中文 text\nline2"]),
        "ts": pa.array([1, 2, 3], type=pa.int64()).cast(pa.timestamp("us")),
        "v": pa.array([0.1, 1e-17, None], type=pa.float64())})
    fp = os.path.join(tmp_path, "s.tar")
    write_wds_shard(t, fp)
    back = read_wds_shard(open(fp, "rb").read())
    assert back.equals(t)
    # deterministic bytes: same input -> identical shard
    fp2 = os.path.join(tmp_path, "s2.tar")
    write_wds_shard(t, fp2)
    assert open(fp, "rb").read() == open(fp2, "rb").read()


def test_wds_corpus_roundtrip_distributed(ray_session, tmp_path):
    """write_corpus/read_corpus with fmt='wds': distributed tar shards
    round-trip the documents table row-exactly."""
    import pandas as pd
    import ray.data as rd

    from rayschema.sources import read_corpus, write_corpus

    src = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                          columns=["doc_id", "lang", "text"])
    out = os.path.join(tmp_path, "wds")
    write_corpus(src, out, fmt="wds")
    assert detect_format(out) == "wds"
    back = read_corpus(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    want = src.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[sorted(back.columns)],
                                  want[sorted(want.columns)])


def test_table_format_upsert_semantics(ray_session, tmp_path):
    """Planted MERGE: matched keys replaced, unmatched kept, v1
    untouched (time travel)."""
    import pandas as pd
    import ray.data as rd

    from rayschema.tableformat import (commit_version, read_version,
                                       upsert_version)

    root = os.path.join(tmp_path, "tbl")
    v1 = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                   "lang": pa.array(["en", "de", "fr", "es"]),
                   "n_chars": pa.array([10, 20, 30, 40],
                                       type=pa.int64())})
    commit_version(root, rd.from_arrow(v1), mode="overwrite")
    up = pa.table({"doc_id": pa.array([2, 5], type=pa.int64()),
                   "lang": pa.array(["xx", "xx"]),
                   "n_chars": pa.array([999, 50], type=pa.int64())})
    man = upsert_version(root, rd.from_arrow(up), key_col="doc_id")
    assert man["version"] == 2
    got = read_version(root, 2).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    want = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                         "lang": ["en", "xx", "fr", "es", "xx"],
                         "n_chars": [10, 999, 30, 40, 50]})
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": np.int64, "n_chars": np.int64}), want.astype(
            {"doc_id": np.int64, "n_chars": np.int64}))
    # v1 unchanged
    old = read_version(root, 1).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert old["n_chars"].tolist() == [10, 20, 30, 40]


def test_table_format_compact_shrinks_files(ray_session, tmp_path):
    """Compaction: fewer files, identical rows, parent version intact."""
    import ray.data as rd

    from rayschema.tableformat import (commit_version, compact_version,
                                       read_manifest, read_version)

    root = os.path.join(tmp_path, "tbl")
    t = pa.table({"doc_id": pa.array(np.arange(1000), type=pa.int64())})
    commit_version(root, rd.from_arrow(t).repartition(16),
                   mode="overwrite")
    n1 = len(read_manifest(root, 1)["files"])
    man2 = compact_version(root, target_rows=10_000)
    assert len(man2["files"]) < n1
    assert man2["rows"] == 1000
    got = np.sort(read_version(root, 2).to_pandas()["doc_id"].to_numpy())
    assert (got == np.arange(1000)).all()
    # history intact
    old = np.sort(read_version(root, 1).to_pandas()["doc_id"].to_numpy())
    assert (old == np.arange(1000)).all()


def test_zonemap_prunes_files(ray_session):
    """The zone-map scan must actually SKIP files on the clustered
    copy and still compute the exact filtered aggregate."""
    import duckdb

    from rayschema.queries import _zonemap_scan

    out, n_total, n_read = _zonemap_scan("/root/testdata/sf0.001")
    assert n_read < n_total, (n_read, n_total)
    want = duckdb.sql(
        "SELECT count(*), coalesce(sum(doc_id), 0), "
        "coalesce(sum(n_chars), 0) "
        "FROM '/root/testdata/sf0.001/documents.parquet' "
        "WHERE n_chars >= 150 AND n_chars < 300").fetchone()
    assert out.iloc[0].tolist() == [int(want[0]), int(want[1]),
                                    int(want[2])]
