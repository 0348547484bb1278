"""cap_per_source / doc_rarity_score edge-case tests (tiny local corpora,
DuckDB oracles on the same parquet)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, df: pd.DataFrame) -> str:
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _docs_view(sf_dir: str):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    return con


def test_cap_per_source_thresholds(ray_session, tmp_path):
    from rayschema.queries import cap_per_source

    rng = np.random.RandomState(11)
    srcs = rng.choice(["web", "books", "wiki"], size=400)
    srcs[:3] = "rare"                      # a source far below the cap
    df = pd.DataFrame({
        "doc_id": np.arange(400, dtype=np.int64),
        "text": ["t"] * 400,
        "lang": ["en"] * 400,
        "source": srcs,
        "n_chars": np.ones(400, dtype=np.int64),
    })
    sf = _write_docs(tmp_path, df.sample(frac=1, random_state=3))
    got = (cap_per_source(sf, cap=20).to_pandas()
           .sort_values("doc_id").reset_index(drop=True)[["doc_id", "source"]])
    con = _docs_view(sf)      # keep a strong ref: relations don't hold one
    want = con.sql("""
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source ORDER BY doc_id) rn
          FROM documents) WHERE rn <= 20 ORDER BY doc_id""").df()
    want["doc_id"] = want["doc_id"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)
    # the sub-cap source survives whole
    assert (got["source"] == "rare").sum() == 3


def test_doc_rarity_score_matches_sql(ray_session, tmp_path):
    from rayschema.queries import doc_rarity_score

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["the cat sat", "the the the", "", None,
                 "cat", "unique words only here"],
        "lang": ["en"] * 6,
        "source": ["web"] * 6,
        "n_chars": np.ones(6, dtype=np.int64),
    })
    sf = _write_docs(tmp_path, df)
    got = (doc_rarity_score(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = _docs_view(sf)      # keep a strong ref: relations don't hold one
    want = con.sql("""
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                   FROM documents WHERE text IS NOT NULL),
        cf AS (SELECT word, count(*)::BIGINT AS c FROM w GROUP BY word)
        SELECT w.doc_id, sum(cf.c)::BIGINT AS cf_sum,
               count(*)::BIGINT AS n_words
        FROM w JOIN cf USING (word)
        GROUP BY w.doc_id ORDER BY doc_id""").df()
    want["doc_id"] = want["doc_id"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)
    # hand oracle: doc 0 = the(4) + cat(2) + sat(1) = 7 over 3 words
    row0 = got[got["doc_id"] == 0].iloc[0]
    assert (row0["cf_sum"], row0["n_words"]) == (7, 3)
    # null text dropped, empty text = one '' word counted once
    assert 3 not in set(got["doc_id"])
    row2 = got[got["doc_id"] == 2].iloc[0]
    assert (row2["cf_sum"], row2["n_words"]) == (1, 1)
