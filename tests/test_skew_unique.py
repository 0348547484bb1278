"""Skew handling (hot-key discovery + salted groupby) and the three
uniqueness strategies agreeing with each other."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def skewed_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 20_000
    keys = np.where(rng.random(n) < 0.4, "hot/repo",
                    np.char.add("repo", (rng.integers(0, 50, n)).astype("U3")))
    t = pa.table({
        "repo": pa.array(keys.astype(object), type=pa.string()),
        "path": pa.array([f"p{i}" for i in range(n)]),
        "commit": pa.array([f"c{i % 5000}" for i in range(n)]),
        "x": pa.array(rng.integers(0, 100, n), type=pa.int64()),
    })
    return rd.from_arrow(t), t


def test_hot_keys_discovery(skewed_ds):
    from rayschema.skew import hot_keys

    ds, _ = skewed_ds
    hot = hot_keys(ds, "repo", frac_threshold=0.1)
    assert "hot/repo" in hot
    assert all(v / 20_000 >= 0.1 for v in hot.values())


def test_salted_groupby_matches_plain(skewed_ds):
    from rayschema.skew import salted_groupby_sum

    ds, t = skewed_ds
    got = salted_groupby_sum(ds, "repo", "path", ["x"], hot={"hot/repo"}, k=8)
    exp = (t.to_pandas().groupby("repo", as_index=False)["x"].sum())
    merged = got.merge(exp, on="repo", suffixes=("_got", "_exp"))
    assert len(merged) == len(exp)
    assert (merged["x_got"] == merged["x_exp"]).all()


def test_unique_strategies_agree(skewed_ds):
    from rayschema.unique import (
        add_key_hash,
        duplicate_key_counts,
        duplicate_key_counts_hashed,
        duplicate_key_counts_sorted,
    )

    ds, t = skewed_ds
    cols = ["repo", "path", "commit"]
    a = duplicate_key_counts(ds, cols).to_pandas()

    ds_uk = ds.map_batches(lambda b: add_key_hash(b, cols), batch_format="pyarrow")
    # uk comes back as uint64; the pipeline stores int64 — both work
    b = duplicate_key_counts_hashed(ds_uk, cols, uk_col="uk")
    c = duplicate_key_counts_sorted(ds_uk, cols, uk_col="uk")

    def norm(df):
        return (df.sort_values(cols).reset_index(drop=True)[cols + ["n"]]
                if len(df) else pd.DataFrame({k: [] for k in cols + ["n"]}))

    na, nb, nc = norm(a), norm(b), norm(c)
    # paths are unique in this fixture -> no duplicate triples anywhere
    assert len(na) == len(nb) == len(nc)
    if len(na):
        assert na.equals(nb) and na.equals(nc)


def test_unique_strategies_find_real_dupes(ray_session):
    import ray.data as rd

    from rayschema.unique import add_key_hash, duplicate_key_counts_sorted

    rows = [{"repo": "r", "path": f"p{i}", "commit": "c"} for i in range(1000)]
    rows += [{"repo": "r", "path": "p7", "commit": "c"}] * 3  # p7 appears 4x
    ds = rd.from_items(rows).map_batches(
        lambda b: add_key_hash(b, ["repo", "path", "commit"]), batch_format="pyarrow")
    got = duplicate_key_counts_sorted(ds, ["repo", "path", "commit"], uk_col="uk")
    assert len(got) == 1
    assert got.iloc[0]["path"] == "p7" and got.iloc[0]["n"] == 4


def test_distinct_rows(ray_session):
    import ray.data as rd

    from rayschema.unique import distinct_rows

    rows = [{"k": i % 10, "v": i} for i in range(100)]
    ds = rd.from_items(rows)
    out = distinct_rows(ds, ["k"]).to_pandas()
    assert len(out) == 10
    assert sorted(out["k"]) == list(range(10))


def test_dedup_shuffle_is_narrow(ray_session):
    """Scale evidence for exact dedup: the bytes entering the groupby shuffle
    (hash, min_id, n partials) are a small fraction of the corpus bytes —
    document text never crosses the exchange."""
    import ray.data as rd

    from rayschema.queries import _dedup_partial

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"]).materialize()
    input_bytes = ds.size_bytes()
    pre = ds.map_batches(_dedup_partial, batch_format="pyarrow").materialize()
    assert pre.size_bytes() < 0.35 * input_bytes, (pre.size_bytes(), input_bytes)


def test_exact_dedup_distributed_verify_matches_groupby(ray_session):
    """The distributed collision verify (bitmap broadcast + hash-grouped
    min-per-text, no driver text) must equal a plain GROUP BY text on a
    dup-heavy corpus — including 1-row bitmap false-positive groups, which
    must not double-emit ids already kept as singles."""
    import pyarrow.parquet as pq

    from rayschema.queries import exact_dedup_documents

    sf = "/root/testdata/sf0.001"
    got = exact_dedup_documents(sf).to_pandas()["doc_id"].sort_values()
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    exp = (docs.groupby("text", dropna=False)["doc_id"].min().sort_values())
    assert list(got) == sorted(exp.tolist())
    assert got.is_unique


def test_exact_dedup_losers_partition_kept(ray_session):
    """emit='losers' is the exact complement of emit='kept' — together they
    partition the corpus ids, and losers are precisely the non-min members
    of duplicate-text groups."""
    import ray.data as rd

    from rayschema.queries import _exact_dedup_core

    rows = ([{"doc_id": i, "text": f"unique text {i}"} for i in range(50)]
            + [{"doc_id": 100 + i, "text": f"dup text {i % 5}"}
               for i in range(30)])
    ds = rd.from_items(rows).repartition(4)
    kept = set(_exact_dedup_core(ds, emit="kept").to_pandas()["doc_id"])
    losers = set(_exact_dedup_core(ds, emit="losers").to_pandas()["doc_id"])
    all_ids = {r["doc_id"] for r in rows}
    assert kept | losers == all_ids
    assert kept & losers == set()
    # dup groups: ids 100..129 sharing 5 texts -> min of each kept
    assert losers == {100 + i for i in range(30)} - {100, 101, 102, 103, 104}


def test_curation_pipeline_matches_sql(ray_session):
    import duckdb

    from rayschema.queries import curation_pipeline_documents

    sf = "/root/testdata/sf0.001"
    got = (curation_pipeline_documents(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
    want = con.sql("""
        WITH base AS (
          SELECT doc_id, text, lang FROM documents
          WHERE text IS NOT NULL AND lang IN ('en','de','fr','es','zh')
            AND n_chars IS NOT NULL AND n_chars >= 50),
        wc AS (SELECT doc_id, word, count(*)::BIGINT c
               FROM (SELECT doc_id, unnest(string_split(text,' ')) word
                     FROM base) GROUP BY doc_id, word),
        rep AS (SELECT doc_id, sum(c)::BIGINT n_words,
                       (sum(c)-count(*))::BIGINT n_dup FROM wc GROUP BY doc_id),
        pass AS (SELECT b.doc_id, b.lang, r.n_words, b.text
                 FROM base b JOIN rep r ON b.doc_id = r.doc_id
                 WHERE r.n_words >= 10 AND r.n_dup * 2 < r.n_words),
        kept AS (SELECT min(doc_id) doc_id FROM pass GROUP BY text)
        SELECT p.doc_id, p.lang, p.n_words AS n_tok,
               CASE WHEN p.doc_id % 10 = 0 THEN 'test'
                    WHEN p.doc_id % 10 = 1 THEN 'val'
                    ELSE 'train' END AS split
        FROM pass p JOIN kept k ON p.doc_id = k.doc_id ORDER BY p.doc_id
    """).df()
    want["doc_id"] = want["doc_id"].astype(np.int64)
    want["n_tok"] = want["n_tok"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def test_duplicate_key_counts_adaptive_paths_equal(ray_session):
    """The driver-merge fast path (round 4) and the 8-byte global sort
    path must emit identical duplicate-key tables on a dup-heavy corpus
    — incl. within-batch dups, cross-batch dups, and clean keys."""
    import ray.data as rd

    from rayschema.unique import (
        add_key_hash,
        duplicate_key_counts_adaptive,
        duplicate_key_counts_sorted,
    )

    rows = ([{"repo": f"r{i}", "path": f"p{i}", "commit": f"c{i}"}
             for i in range(400)]
            + [{"repo": f"r{i % 7}", "path": f"p{i % 7}",
                "commit": f"c{i % 7}"} for i in range(60)])
    cols = ["repo", "path", "commit"]
    ds = rd.from_items(rows).map_batches(
        lambda b: add_key_hash(b, cols), batch_format="pyarrow") \
        .repartition(5).materialize()
    a = (duplicate_key_counts_adaptive(ds, cols, n_rows=len(rows))
         .sort_values(cols).reset_index(drop=True))
    b = (duplicate_key_counts_sorted(ds, cols)
         .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 7 and (a["n"] > 1).all()
