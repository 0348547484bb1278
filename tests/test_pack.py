"""Sequence-packing / distributed-prefix-sum tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _oracle(df: pd.DataFrame, seq_len: int) -> pd.DataFrame:
    d = df[df["text"].notna()].sort_values("doc_id").reset_index(drop=True)
    tok = d["text"].map(lambda t: 0 if len(t) == 0 else t.count(" ") + 1)
    off = tok.cumsum().shift(fill_value=0)
    return pd.DataFrame({
        "doc_id": d["doc_id"].astype(np.int64),
        "tok": tok.astype(np.int64),
        "seq_id": (off // seq_len).astype(np.int64),
        "offset_in_seq": (off % seq_len).astype(np.int64),
    })


def test_pack_sequences_small_shards(ray_session):
    import ray.data as rd

    from rayschema.pack import pack_sequences

    rng = np.random.RandomState(7)
    rows = [{"doc_id": int(i),
             "text": " ".join(["w"] * rng.randint(1, 40))}
            for i in range(300)]
    rows[17]["text"] = ""            # empty doc -> 0 tokens
    rows[42]["text"] = None          # null doc -> dropped
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df).repartition(7)
    # shard_size=16 -> ~19 shards across 7 blocks: exercises partial sums,
    # driver prefix, block kernel AND boundary-group stitching
    got = (pack_sequences(ds, seq_len=64, shard_size=16)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _oracle(df, 64)
    pd.testing.assert_frame_equal(got, want)


def test_pack_sequences_matches_duckdb(ray_session, sf_dir):
    import duckdb

    from rayschema.queries import pack_sequences_documents

    got = (pack_sequences_documents(sf_dir)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.sql("""
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN length(text) = 0 THEN 0
                      ELSE length(text) - length(replace(text, ' ', '')) + 1
                 END::BIGINT AS tok
          FROM documents WHERE text IS NOT NULL),
        c AS (SELECT doc_id, tok,
                     coalesce(sum(tok) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0)::BIGINT AS o
              FROM t)
        SELECT doc_id, tok, (o // 512)::BIGINT AS seq_id,
               (o % 512)::BIGINT AS offset_in_seq
        FROM c ORDER BY doc_id
    """).df()
    for c in want.columns[1:]:
        want[c] = want[c].astype(np.int64)
    want["doc_id"] = want["doc_id"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def test_pack_sequences_offsets_are_contiguous(ray_session, sf_dir):
    """The packed layout is gapless: global offsets reconstruct the exact
    running sum (the invariant that makes a writer able to cut sequences)."""
    from rayschema.queries import pack_sequences_documents

    got = (pack_sequences_documents(sf_dir)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    off = got["seq_id"].to_numpy() * 512 + got["offset_in_seq"].to_numpy()
    expect = np.concatenate([[0], np.cumsum(got["tok"].to_numpy())[:-1]])
    assert (off == expect).all()
