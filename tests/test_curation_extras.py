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


def test_dup_span_stats_edges(ray_session, tmp_path):
    """Cross-doc window counting on crafted edges: a shared 30-char span
    (counted), a phrase repeated only WITHIN one doc (not counted), a doc
    shorter than k (0 windows), null text (dropped), and multi-byte text
    (codepoint windows, matching SQL substr)."""
    from rayschema.queries import dup_span_stats

    shared = "alpha beta gamma delta epsilon"           # 30 chars
    cjk = "日本語のテキストという共有された長い文字列です" * 2
    df = pd.DataFrame({
        "doc_id": np.arange(7, dtype=np.int64),
        "text": [
            "X " + shared + " one tail here",           # shares w/ doc 1
            "Y " + shared + " two other end",
            "repeat me now! repeat me now! repeat me now!",  # self-only
            "short",                                    # < k -> 0 windows
            None,                                       # dropped
            "A " + cjk,                                 # shares w/ doc 6
            "B " + cjk,
        ],
        "lang": ["en"] * 7, "source": ["web"] * 7,
        "n_chars": np.ones(7, dtype=np.int64),
    })
    sf = _write_docs(tmp_path, df)
    got = (dup_span_stats(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = _docs_view(sf)
    want = con.sql("""
        WITH d AS (SELECT doc_id, text, length(text)::BIGINT AS n
                   FROM documents WHERE text IS NOT NULL),
        w AS (SELECT doc_id, unnest(generate_series(1,
                  greatest(n - 19, 0)::INT)) AS pos, text FROM d),
        wt AS (SELECT doc_id, substr(text, pos::INT, 20) AS wt FROM w),
        g AS (SELECT wt, count(DISTINCT doc_id) AS nd FROM wt GROUP BY wt),
        dup AS (SELECT wt.doc_id, count(*)::BIGINT AS n_dup
                FROM wt JOIN g ON wt.wt = g.wt WHERE g.nd >= 2
                GROUP BY wt.doc_id)
        SELECT d.doc_id, greatest(d.n - 19, 0)::BIGINT AS n_windows,
               coalesce(dup.n_dup, 0)::BIGINT AS n_dup_windows
        FROM d LEFT JOIN dup USING (doc_id) ORDER BY doc_id""").df()
    for c in want.columns:
        want[c] = want[c].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "n_dup_windows"] > 0            # shared span found
    assert by_id.loc[2, "n_dup_windows"] == 0           # within-doc only
    assert by_id.loc[3, "n_windows"] == 0               # too short
    assert 4 not in by_id.index                         # null dropped
    assert by_id.loc[5, "n_dup_windows"] > 0            # multi-byte shared


def test_chunk_documents_edges(ray_session, tmp_path):
    """Chunk boundaries: empty text -> 0 chunks, n == stride -> 1 chunk,
    n == stride+1 -> 2 chunks (second is 1 char), multi-byte codepoint
    slicing == SQL substr, null dropped."""
    from rayschema.queries import chunk_documents

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["", "a" * 150, "b" * 151, None,
                 "日" * 310, "x" * 475],
        "lang": ["en"] * 6, "source": ["web"] * 6,
        "n_chars": np.ones(6, dtype=np.int64),
    })
    sf = _write_docs(tmp_path, df)
    got = (chunk_documents(sf).to_pandas()
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    con = _docs_view(sf)
    want = con.sql("""
        WITH d AS (SELECT doc_id, text, length(text)::BIGINT AS n
                   FROM documents WHERE text IS NOT NULL),
        c AS (SELECT doc_id, unnest(generate_series(0,
                  ((n - 1) // 150)::INT)) AS chunk_id, text
              FROM d WHERE n >= 1)
        SELECT doc_id, chunk_id::BIGINT AS chunk_id,
               substr(text, (chunk_id * 150 + 1)::INT, 200) AS chunk_text
        FROM c ORDER BY doc_id, chunk_id""").df()
    for c in ("doc_id", "chunk_id"):
        want[c] = want[c].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)
    counts = got.groupby("doc_id").size()
    assert 0 not in counts.index                       # empty -> no chunks
    assert counts[1] == 1 and counts[2] == 2
    assert len(got[(got.doc_id == 2) & (got.chunk_id == 1)]
               ["chunk_text"].iloc[0]) == 1
    assert counts[4] == 3                              # 310 cp -> 3 chunks
    assert got[(got.doc_id == 4) & (got.chunk_id == 0)
               ]["chunk_text"].iloc[0] == "日" * 200


def test_split_leakage_audit_invariant(ray_session, sf_dir):
    """The audit must find pairs (the fixture corpora contain near-dups in
    the doc_id < 300 scope) and ZERO cross-split pairs."""
    from rayschema.queries import split_leakage_audit

    r = split_leakage_audit(sf_dir).iloc[0]
    assert r["n_docs"] > 0
    assert r["n_cross_split"] == 0


def test_ngram_decontaminate_window_hits(ray_session, tmp_path):
    """Doc 7 (doc_id % 17 == 7) is the bench doc; docs sharing any full
    8-token window with it are flagged with the exact window count."""
    from rayschema.queries import ngram_decontaminate_documents

    bench = "a b c d e f g h i j"           # windows: a..h, b..i, c..j
    df = pd.DataFrame({
        "doc_id": np.array([7, 1, 2, 3, 4], dtype=np.int64),
        "text": [
            bench,
            "x " + bench,        # shares all 3 bench windows
            "a b c d e f g h zz",  # shares exactly window a..h
            "a b c d e f g zz",    # 7-token overlap only -> clean
            None,                  # null text -> skipped
        ],
    })
    sf = _write_docs(tmp_path, df)
    got = (ngram_decontaminate_documents(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [1, 2]
    assert got["n_hit_windows"].tolist() == [3, 1]


def test_gopher_flags_thresholds(ray_session, tmp_path):
    """Integer cross-product thresholds decide pass/fail exactly at the
    boundary; nulls dropped; non-alpha and stopword rules enforced."""
    from rayschema.queries import gopher_quality_flags

    ok = "the a " + " ".join(["word"] * 48)          # 50 words, mwl in range
    few = "the a " + " ".join(["word"] * 10)         # 12 words < 50
    longw = "the a " + " ".join(["w" * 11] * 48)     # mean word len > 10
    digits = "the a " + " ".join(["123"] * 48)       # alpha frac 2/50 < 4/5
    nostop = " ".join(["word"] * 50)                 # 0 stopword hits
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [ok, few, longw, digits, nostop, None],
    })
    sf = _write_docs(tmp_path, df)
    got = (gopher_quality_flags(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 1, 2, 3, 4]   # null dropped
    assert got["gopher_pass"].tolist() == [1, 0, 0, 0, 0]
    assert got.loc[0, "n_words"] == 50
    assert got.loc[0, "n_stop_hits"] == 2
    assert got.loc[3, "alpha_word_frac"] == 2 / 50


def test_shuffle_shard_deterministic_permutation(ray_session, tmp_path):
    """Every doc appears exactly once; positions are dense 0..k-1 per
    shard; the assignment is identical across runs (seeded)."""
    from rayschema.queries import shuffle_shard_documents

    df = pd.DataFrame({
        "doc_id": np.arange(257, dtype=np.int64),
        "text": ["t"] * 257,
        "lang": ["en"] * 257,
        "source": ["s"] * 257,
        "n_chars": np.ones(257, dtype=np.int64),
    })
    sf = _write_docs(tmp_path, df)
    a = (shuffle_shard_documents(sf).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert sorted(a["doc_id"]) == list(range(257))
    for s, g in a.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))
    b = (shuffle_shard_documents(sf).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_source_mixture_weights_cap(ray_session, tmp_path):
    """A source holding more than the equal-share cap gets a fractional
    weight; tiny sources get exactly 1.0 (1e6 millionths)."""
    from rayschema.queries import source_mixture_weights

    texts = (["big " * 99 + "big"] * 20        # 100 tokens x 20 docs
             + ["small one two"] * 2)          # 3 tokens x 2 docs
    df = pd.DataFrame({
        "doc_id": np.arange(22, dtype=np.int64),
        "text": texts,
        "lang": ["en"] * 22,
        "source": ["hot"] * 20 + ["cold"] * 2,
        "n_chars": np.ones(22, dtype=np.int64),
    })
    sf = _write_docs(tmp_path, df)
    got = source_mixture_weights(sf).set_index("source")
    # total = 2006, cap = 2006 // 4 = 501
    assert got.loc["hot", "n_tokens"] == 2000
    assert got.loc["hot", "weight_millionths"] == 501 * 10 ** 6 // 2000
    assert got.loc["cold", "weight_millionths"] == 10 ** 6


def test_dup_span_removal_planted(ray_session, tmp_path):
    """ExactSubstr removal on crafted docs: the shared 30-char span (plus
    every window overlapping it) is cut from BOTH carriers, within-doc-only
    repeats survive, short/unique docs come back verbatim, and clean_text
    equals a brute-force reimplementation."""
    from rayschema.queries import dup_span_removal

    shared = "alpha beta gamma delta epsilon"           # 30 chars
    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [
            "X " + shared + " one tail here",
            "Y " + shared + " two other end",
            "repeat me now! repeat me now! repeat me now!",  # self-only
            "short",
            "a wholly unique document body with no twins",
        ],
    })
    sf = _write_docs(tmp_path, df)
    got = (dup_span_removal(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # brute force: dup windows = 20-grams in >= 2 distinct docs
    k = 20
    texts = df["text"].tolist()
    from collections import defaultdict
    owners = defaultdict(set)
    for i, t in enumerate(texts):
        for p in range(len(t) - k + 1):
            owners[t[p:p + k]].add(i)
    for i, t in enumerate(texts):
        cov = np.zeros(len(t), dtype=bool)
        for p in range(len(t) - k + 1):
            if len(owners[t[p:p + k]]) >= 2:
                cov[p:p + k] = True
        clean = "".join(ch for ch, c in zip(t, cov) if not c)
        assert got.loc[i, "clean_text"] == clean, i
        assert got.loc[i, "n_removed"] == int(cov.sum()), i
    # the planted span really is removed from both carriers, others intact
    assert shared not in got.loc[0, "clean_text"]
    assert shared not in got.loc[1, "clean_text"]
    assert got.loc[2, "clean_text"] == texts[2]
    assert got.loc[3, "clean_text"] == "short"
    assert got.loc[4, "n_removed"] == 0


def test_keep_best_per_cluster_winners(ray_session, tmp_path):
    """Longest member wins its cluster, min doc_id breaks exact ties,
    singletons pass through, out-of-scope (doc_id >= 300) ignored."""
    from rayschema.queries import keep_best_per_cluster

    a = "abcdefghij klmnopqrst uvwxyz0123 456789ABCD"     # 43 cp
    b = a + " EXTENDED"                                   # superset shingles
    t = "duplicated text body here 123"
    df = pd.DataFrame({
        "doc_id": np.array([0, 1, 2, 3, 4, 500], dtype=np.int64),
        "text": [a, b, "a singleton document with its own words",
                 t, t, "out of scope entirely"],
    })
    sf = _write_docs(tmp_path, df)
    got = (keep_best_per_cluster(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [1, 2, 3]
    assert got.loc[0, "cluster_rep"] == 0      # cluster {0,1}, winner 1
    assert got.loc[2, "cluster_rep"] == 3      # tie -> min doc_id wins


def test_keep_best_winner_scan_many_clusters(ray_session, tmp_path):
    """The rep-keyed sorted_group_scan winner selection (round 4: replaces
    the driver pandas merge — driver state is the O(#clusters) winner-id
    array only) must pick (max n_len, min doc_id) per cluster across MANY
    clusters, i.e. including groups that straddle sorted-block boundaries
    and go through the driver residual path."""
    from rayschema.queries import keep_best_per_cluster

    rows = []
    for i in range(60):
        # nearly every char-5-gram contains the cluster digits, so
        # cross-cluster jaccard stays far below the 0.5 threshold
        base = " ".join(f"a{i:03d}b{j:02d}" for j in range(12))   # ~95 cp
        rows.append((3 * i, base))
        rows.append((3 * i + 1, base + " ZZ"))
        rows.append((3 * i + 2, base + " ZZ QQ"))                # longest
    rows.append((290, "a lonely singleton body of text"))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    sf = _write_docs(tmp_path, df)
    got = (keep_best_per_cluster(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    expect = sorted([3 * i + 2 for i in range(60)] + [290])
    assert got["doc_id"].tolist() == expect
    # every cluster winner carries its cluster rep = min member id
    reps = got.set_index("doc_id")["cluster_rep"]
    for i in range(60):
        assert reps[3 * i + 2] == 3 * i
    assert reps[290] == 290


def test_events_hourly_anomaly_integer_ztest(ray_session, tmp_path):
    """Planted spike hour is flagged, uniform hours are not; the 2-sigma
    rule is the exact cleared-denominator integer comparison."""
    import pyarrow.parquet as _pq

    from rayschema.queries import events_hourly_anomaly

    # 9 hours at 10 events + 1 hour at 100: mean=19, var=729 -> only the
    # spike has (c-mean)^2 = 6561 > 4*729
    hours = np.repeat(np.arange(10), [10] * 9 + [100])
    ts = (hours * 3600 + 7) * 1_000_000    # microseconds, in-hour offset
    tab = pa.table({
        "event_id": pa.array(np.arange(len(ts), dtype=np.int64)),
        "user_id": pa.array(np.zeros(len(ts), dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * len(ts)),
        "value": pa.array(np.ones(len(ts))),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = events_hourly_anomaly(str(tmp_path))
    assert got["is_anomaly"].sum() == 1
    assert got.loc[got["is_anomaly"] == 1, "n_events"].iloc[0] == 100


def test_bigram_next_word_counts_and_ties(ray_session, tmp_path):
    """Pair counts aggregate across docs and batches; lexicographic
    tie-break picks the smaller next word on equal counts."""
    from rayschema.queries import bigram_next_word

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["go b go a go a", "go b stop", None],
    })
    sf = _write_docs(tmp_path, df)
    got = bigram_next_word(sf).set_index("w1")
    # bigrams: go->b x2, go->a x2, b->go, b->stop, a->go x2, stop: none
    assert got.loc["go", "w1_count"] == 4
    assert got.loc["go", "next_word"] == "a"        # tie 2-2 -> lexicographic
    assert got.loc["go", "pair_count"] == 2
    assert got.loc["a", "next_word"] == "go"


def test_bigram_coverage_score_hits_and_scope(ray_session, tmp_path,
                                              monkeypatch):
    """Coverage counts duplicate occurrences, docs with <2 words are out
    of scope, and only the top-K bigram table counts as a hit."""
    import rayschema.queries as Q

    monkeypatch.setattr(Q, "BIGRAM_COVERAGE_TOP_K", 2)
    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["a b a b", "a b c", "single", None, "c d"],
    })
    sf = _write_docs(tmp_path, df)
    got = (Q.bigram_coverage_score(sf).to_pandas()
           .set_index("doc_id").sort_index())
    # pair counts: (a,b)x3, (b,a)x1, (b,c)x1, (c,d)x1 -> top-2 by
    # (count desc, w1, w2) = {(a,b), (b,a)}
    assert got.index.tolist() == [0, 1, 4]        # doc 2 single word, 3 null
    assert got.loc[0, "n_pairs"] == 3 and got.loc[0, "n_hits"] == 3
    assert got.loc[1, "n_pairs"] == 2 and got.loc[1, "n_hits"] == 1
    assert got.loc[4, "n_pairs"] == 1 and got.loc[4, "n_hits"] == 0


def test_bpe_top_pairs_codepoints_and_boundaries(ray_session, tmp_path):
    """Pairs never cross spaces or document boundaries; multi-byte
    codepoints count as single units; ties rank lexicographically."""
    import rayschema.queries as Q

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["abab ba", "ab", None, "héé x"],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    got = Q.bpe_top_pairs(str(tmp_path))
    got = got.set_index(got["c1"] + got["c2"])
    # counts: ab x3 (2 in doc0 + doc1), ba x2 (doc0 word1 has 1... 'abab'
    # -> ab,ba,ab; 'ba' -> ba; 'ab' -> ab), hé x1, éé x1
    assert got.loc["ab", "n"] == 3 and got.loc["ab", "rk"] == 1
    assert got.loc["ba", "n"] == 2 and got.loc["ba", "rk"] == 2
    assert got.loc["hé", "n"] == 1 and got.loc["éé", "n"] == 1
    # tie between hé and éé broken lexicographically: 'h' (0x68) < 'é'
    assert got.loc["hé", "rk"] < got.loc["éé", "rk"]
    # no pair crosses the doc0|doc1 boundary ('a'+'a') or a space
    assert "aa" not in got.index and "bb" not in got.index


def test_chars_quartiles_by_lang_lower_quantile_rule(ray_session, tmp_path):
    """Lower-quantile rule: smallest value whose cumulative count reaches
    q/4 of the group; singleton groups return that value everywhere."""
    import rayschema.queries as Q

    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "lang": ["en"] * 8 + ["zh", None],
        "n_chars": [10, 20, 30, 40, 50, 60, 70, 80, 7, 99],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    got = Q.chars_quartiles_by_lang(str(tmp_path)).set_index("lang")
    # en: 8 values; p25 -> cum*4 >= 8 at the 2nd value (20), p50 -> 4th
    # (40), p75 -> 6th (60)
    assert got.loc["en", ["p25", "p50", "p75", "n"]].tolist() == [20, 40, 60, 8]
    assert got.loc["zh", ["p25", "p50", "p75", "n"]].tolist() == [7, 7, 7, 1]
    assert len(got) == 2        # NULL lang out of scope


def test_events_rolling_window_matches_pandas(ray_session, tmp_path):
    """Rolling 3-row sums reset per user, survive block boundaries, and
    order ties by event_id."""
    import rayschema.queries as Q

    rng = np.random.RandomState(7)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 5, n).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 50, n), unit="s"),  # many ties
        "value": rng.uniform(0, 10, n).round(2),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    got = (Q.events_rolling_window(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    exp = df.copy()
    exp["cents"] = np.round(exp["value"].to_numpy() * 100).astype(np.int64)
    exp = exp.sort_values(["user_id", "ts", "event_id"])
    exp["roll_cents"] = (exp.groupby("user_id")["cents"]
                         .transform(lambda s: s.rolling(3, min_periods=1)
                                    .sum()).astype(np.int64))
    exp["roll_n"] = (exp.groupby("user_id")["cents"]
                     .transform(lambda s: s.rolling(3, min_periods=1)
                                .count()).astype(np.int64))
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert got["roll_cents"].tolist() == exp["roll_cents"].tolist()
    assert got["roll_n"].tolist() == exp["roll_n"].tolist()


def test_lang_source_pivot_and_range_bounds(ray_session, tmp_path):
    import rayschema.queries as Q

    df = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "source": ["s1", "s1", "s2", None, "s2", "s1", "s2", "s2"],
        "lang": ["en", "xx", "de", "en", None, "en", "de", "zh"],
        "n_chars": [10, 20, 30, 40, 50, 60, 70, 80],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    got = Q.lang_source_pivot(str(tmp_path)).set_index("source")
    assert got.loc["s1", ["n_en", "n_other"]].tolist() == [2, 1]
    assert got.loc["s2", ["n_de", "n_zh", "n_other"]].tolist() == [2, 1, 1]
    assert got.loc["__null__", "n_en"] == 1
    bounds = Q.range_partition_bounds(str(tmp_path))
    assert len(bounds) == 15
    # 8 values into 16 buckets: boundary i = smallest v with
    # cum*16 >= i*8, i.e. value ceil(i/2) in sorted order
    v = sorted(df["n_chars"])
    exp = [v[(i * 8 - 1) // 16] for i in range(1, 16)]
    assert bounds["bound"].tolist() == exp


def test_global_sort_rank_exact_total_order(ray_session, tmp_path):
    """Ranks are the exact row_number over (n_chars, doc_id) even when a
    single hot value spans many blocks."""
    import rayschema.queries as Q

    rng = np.random.RandomState(3)
    n = 3000
    df = pd.DataFrame({
        "doc_id": rng.permutation(n).astype(np.int64),
        # 5 distinct lengths only -> every value group is hot
        "n_chars": rng.choice([10, 20, 20, 30, 99], n).astype(np.int64),
    })
    df.loc[df.index[:7], "n_chars"] = pd.array([None] * 7,
                                               dtype=pd.Int64Dtype())
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    got = (Q.global_sort_rank(str(tmp_path)).to_pandas()
           .sort_values("global_rank").reset_index(drop=True))
    exp = (df.dropna(subset=["n_chars"])
           .sort_values(["n_chars", "doc_id"]).reset_index(drop=True))
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["global_rank"].tolist() == list(range(1, len(exp) + 1))


def test_first_event_per_day_keeps_earliest_per_type(ray_session, tmp_path):
    """Keyed windowed dedup: earliest (ts, event_id) survives per
    (user, type, day); different days/types/users all survive."""
    import rayschema.queries as Q

    base = pd.Timestamp("2024-05-01")
    df = pd.DataFrame({
        "event_id": np.arange(7, dtype=np.int64),
        "user_id": np.array([1, 1, 1, 1, 2, 1, 1], dtype=np.int64),
        "event_type": ["c", "c", "v", "c", "c", "c", "c"],
        "ts": [base + pd.Timedelta(hours=5),    # 0: kept (first c day 0)
               base + pd.Timedelta(hours=6),    # 1: dup c day 0
               base + pd.Timedelta(hours=6),    # 2: kept (type v)
               base + pd.Timedelta(days=1),     # 3: kept (day 1)
               base + pd.Timedelta(hours=5),    # 4: kept (user 2)
               base + pd.Timedelta(hours=5),    # 5: ts tie with 0 -> loses
               base + pd.Timedelta(hours=4)],   # 6: earlier -> beats 0
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    got = Q.first_event_per_day(str(tmp_path)).to_pandas()
    assert sorted(got["event_id"].tolist()) == [2, 3, 4, 6]


def test_dedup_incremental_hash_index_and_verify(ray_session, tmp_path):
    """New-batch docs drop iff their exact text exists in the old
    snapshot; within-batch dups keep the min id; old ids never appear."""
    import rayschema.queries as Q

    texts = {}
    # old snapshot ids 0..9 (INCR_OLD_LIMIT=250 so all < 250)
    for i in range(10):
        texts[i] = f"old text {i}"
    rows = [(i, texts[i]) for i in range(10)]
    rows += [(300, "old text 3"),       # exact dup of old -> dropped
             (301, "brand new a"),      # kept
             (302, "brand new a"),      # within-batch dup -> dropped
             (303, None),               # null text -> out of scope
             (304, "brand new b")]      # kept
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    got = Q.dedup_incremental(str(tmp_path))
    assert got["doc_id"].tolist() == [301, 304]


def test_cohort_retention_d7_membership(ray_session, tmp_path):
    """retained_d7 = 1 iff the user is active exactly first_day + 7;
    duplicate same-day events don't distort anything."""
    import rayschema.queries as Q

    base = pd.Timestamp("2024-01-01")  # UTC day d0
    rows = []
    # user 1: active d0 (twice) and d7 -> retained
    rows += [(1, base), (1, base + pd.Timedelta(hours=2)),
             (1, base + pd.Timedelta(days=7))]
    # user 2: active d0 and d6, d8 -> NOT retained
    rows += [(2, base), (2, base + pd.Timedelta(days=6)),
             (2, base + pd.Timedelta(days=8))]
    # user 3: first day is d3, active d10 -> retained
    rows += [(3, base + pd.Timedelta(days=3)),
             (3, base + pd.Timedelta(days=10))]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["user_id"] = df["user_id"].astype(np.int64)
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    got = (Q.cohort_retention_d7(str(tmp_path)).to_pandas()
           .set_index("user_id").sort_index())
    d0 = int(base.value // 86_400_000_000_000)
    assert got.loc[1].tolist() == [d0, 1]
    assert got.loc[2].tolist() == [d0, 0]
    assert got.loc[3].tolist() == [d0 + 3, 1]


def test_rollup_normalize_histogram_small_fixture(ray_session, tmp_path):
    """Rollup levels sum consistently; normalization lowercases, squashes
    and trims; log2 histogram buckets split at powers of two."""
    import rayschema.queries as Q

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "source": ["s1", "s1", "s2", "s2"],
        "lang": ["en", "de", "en", None],
        "text": ["  A  B ", "one two three", "w " + "x y z " * 20, None],
        "n_chars": [7, 13, 100, 5],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    roll = Q.lang_source_rollup(str(tmp_path))
    tot = roll[(roll["source"] == "__all__")]["n"].iloc[0]
    mids = roll[(roll["source"] != "__all__") & (roll["lang"] == "__all__")]
    fine = roll[(roll["lang"] != "__all__") & (roll["source"] != "__all__")]
    assert tot == 4 and mids["n"].sum() == 4 and fine["n"].sum() == 4
    assert roll[(roll["source"] == "s2")
                & (roll["lang"] == "__null__")]["n"].iloc[0] == 1

    norm = (Q.normalize_text_documents(str(tmp_path)).to_pandas()
            .set_index("doc_id"))
    assert norm.loc[0, "norm_text"] == "a b"
    assert norm.loc[0, "n_norm_chars"] == 3
    assert 3 not in norm.index                     # null text out of scope

    hist = Q.token_log2_histogram(str(tmp_path)).set_index("bucket")
    # token counts: doc0 "  A  B " -> 7 chars? tokens = spaces+1 = 6;
    # doc1 -> 3; doc2 -> 61 (w + 20*3 words: "w x y z x ..." trailing
    # space adds one empty token)
    assert hist["n_docs"].sum() == 3
    assert set(hist.index) == {
        int(np.frexp(float(t))[1] - 1)
        for t in (6, 3, 62)}


def test_trending_and_degree_and_supplier(ray_session, tmp_path):
    import rayschema.queries as Q

    base = pd.Timestamp("2024-03-01")
    ev = pd.DataFrame({
        "event_id": np.arange(5, dtype=np.int64),
        "user_id": np.ones(5, dtype=np.int64),
        "event_type": ["a", "b", "b", "a", "a"],
        "ts": [base, base + pd.Timedelta(minutes=1),
               base + pd.Timedelta(minutes=2),
               base + pd.Timedelta(hours=1),
               base + pd.Timedelta(hours=1, minutes=5)],
    })
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    tr = Q.trending_event_types(str(tmp_path)).sort_values("hour_bucket")
    assert tr["top_type"].tolist() == ["b", "a"]
    assert tr["n"].tolist() == [2, 2]

    sup = pd.DataFrame({
        "s_suppkey": np.arange(3, dtype=np.int64),
        "s_name": ["x", "y", "z"],
        "s_nationkey": np.array([0, 0, 1], dtype=np.int32),
        "s_acctbal": [10.005, -3.0, 7.5],
    })
    nat = pd.DataFrame({
        "n_nationkey": np.array([0, 1], dtype=np.int64),
        "n_name": ["ALPHA", "BETA"],
    })
    pq.write_table(pa.Table.from_pandas(sup, preserve_index=False),
                   os.path.join(tmp_path, "supplier.parquet"))
    pq.write_table(pa.Table.from_pandas(nat, preserve_index=False),
                   os.path.join(tmp_path, "nation.parquet"))
    bal = Q.supplier_nation_balance(str(tmp_path)).set_index("n_name")
    assert bal.loc["ALPHA", "n_suppliers"] == 2
    assert bal.loc["ALPHA", "sum_acctbal_cents"] in (700, 701)  # rounding
    assert bal.loc["BETA", "max_acctbal_cents"] == 750


def test_shuffle_shard_paths_identical(ray_session, tmp_path, monkeypatch):
    """The two-phase rank (scale path) emits exactly the map_groups
    path's rows."""
    import rayschema.queries as Q

    df = pd.DataFrame({"doc_id": np.arange(3000, dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    small = (Q.shuffle_shard_documents(str(tmp_path)).to_pandas()
             .sort_values(["shard", "pos"]).reset_index(drop=True))
    monkeypatch.setattr(Q, "SHUF_GROUP_CAP", 0)   # force two-phase
    big = (Q.shuffle_shard_documents(str(tmp_path)).to_pandas()
           .sort_values(["shard", "pos"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        small[["doc_id", "shard", "pos"]].astype("int64"),
        big[["doc_id", "shard", "pos"]].astype("int64"))


def test_trainer_export_pipeline_stage_effects(ray_session, tmp_path):
    """Each stage visibly removes what it should: quality-fail, bench
    docs, contaminated docs, exact dups — survivors get deterministic
    (shard, pos) with contiguous per-shard positions."""
    import rayschema.queries as Q

    good = ("the code of " + "alpha beta gamma delta " * 15).strip()
    # 63 words, 2 stopword hits, mean word length ~4.5 -> gopher-passes
    bench = " ".join(f"marker{i}" for i in range(12))   # disjoint 8-grams
    rows = []
    rows.append((0, good))                        # kept
    rows.append((1, good + " tail"))              # kept (distinct text)
    rows.append((2, good))                        # exact dup of 0 -> dropped
    rows.append((3, "short text"))                # gopher fail (words < 50)
    rows.append((7, bench))                       # doc 7 = benchmark doc
    # gopher-passing but contaminated: carries an 8-token bench window
    rows.append((4, good + " " + " ".join(
        f"marker{i}" for i in range(8))))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    got = Q.trainer_export_pipeline(str(tmp_path)).to_pandas()
    assert set(got["doc_id"]) == {0, 1}
    # positions contiguous from 0 within each shard
    for _, g in got.groupby("shard"):
        assert sorted(g["pos"].tolist()) == list(range(len(g)))


def test_trainer_export_two_phase_rank_equal(ray_session, tmp_path,
                                             monkeypatch):
    """trainer_export's stage-3 shared rank emits identical rows on the
    map_groups path and the two-phase histogram-offset path (round 4: the
    rank is _shuffle_shard_rank, so forcing SHUF_GROUP_CAP=0 flips it)."""
    import rayschema.queries as Q

    # per-doc-unique words: no 8-gram is shared with the bench docs
    # (ids 7 and 24 under the %17==7 rule), so gates keep everything else
    rows = [(i, "the is " + " ".join(f"w{i}q{j}" for j in range(60)))
            for i in range(25)]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    small = (Q.trainer_export_pipeline(str(tmp_path)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    monkeypatch.setattr(Q, "SHUF_GROUP_CAP", 0)
    big = (Q.trainer_export_pipeline(str(tmp_path)).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(small, big)
    assert len(small) == 23   # 25 minus the two bench docs


def test_quality_rank_in_source_edges(ray_session, tmp_path):
    """Per-group FULL rank: tie on n_chars breaks by doc_id, singleton
    sources rank 1/1, null source/n_chars dropped, many groups exercise
    the string-keyed scan's boundary residual."""
    from rayschema.queries import quality_rank_in_source

    rows = []
    for s in range(40):
        for j in range(4):
            # two docs tie at the top length within each source
            rows.append((s * 4 + j, f"s{s:02d}", 100 if j < 2 else 10 - j))
    rows.append((997, "solo", 5))
    rows.append((998, None, 5))
    rows.append((999, "x", None))
    df = pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    sf = _write_docs(tmp_path, df)
    got = (quality_rank_in_source(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(got) == 161                    # nulls dropped
    by = got.set_index("doc_id")
    for s in range(40):
        base = s * 4
        assert by.loc[base, "rnk"] == 1       # tie -> lower doc_id first
        assert by.loc[base + 1, "rnk"] == 2
        assert by.loc[base + 2, "rnk"] == 3   # 8 > 7
        assert by.loc[base + 3, "rnk"] == 4
        assert by.loc[base, "n_in_source"] == 4
    assert (by.loc[997, "rnk"], by.loc[997, "n_in_source"]) == (1, 1)


def test_q5_broadcast_equals_hash_join(ray_session, monkeypatch):
    """q5's adaptive custkey join: the broadcast-lookup path and the
    Dataset.join hash-exchange path emit identical nation revenues on the
    real sf0.001 tables."""
    import rayschema.queries as Q

    sf = "/root/testdata/sf0.001"
    a = (Q.q5_local_supplier_volume(sf)
         .sort_values("n_name").reset_index(drop=True))
    monkeypatch.setattr(Q, "Q3_BROADCAST_CAP", 0)   # force hash join
    b = (Q.q5_local_supplier_volume(sf)
         .sort_values("n_name").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) >= 1 and (a["revenue_e4"] > 0).all()


def test_funnel_view_purchase_edges(ray_session, tmp_path):
    """Funnel semantics pinned: conversion window is (fv, fv+24h]
    (exactly-24h converts, purchase AT the first view does not), purchases
    BEFORE the first view don't count, users without views are absent,
    later views don't open new windows."""
    import pyarrow.parquet as _pq

    from rayschema.queries import funnel_view_purchase

    H = 3_600_000_000
    rows = []  # (event_id, user, ts_us, type)
    rows += [(0, 1, 10 * H, "view"), (1, 1, 34 * H, "purchase")]   # = +24h
    rows += [(2, 2, 10 * H, "view"), (3, 2, 34 * H + 1, "purchase")]
    rows += [(12, 7, 10 * H, "view"), (13, 7, 20 * H, "purchase")]
    rows += [(4, 3, 10 * H, "purchase"), (5, 3, 11 * H, "view")]
    rows += [(6, 4, 5 * H, "purchase")]                # no view at all
    rows += [(7, 5, 1 * H, "view"), (8, 5, 40 * H, "view"),
             (9, 5, 41 * H, "purchase")]               # 2nd view irrelevant
    rows += [(10, 6, 10 * H, "view"), (11, 6, 10 * H, "purchase")]  # same ts
    ts = pa.array(np.array([r[2] for r in rows], np.int64)) \
        .cast(pa.timestamp("us"))
    tab = pa.table({
        "event_id": pa.array(np.array([r[0] for r in rows], np.int64)),
        "user_id": pa.array(np.array([r[1] for r in rows], np.int64)),
        "ts": ts,
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array(np.ones(len(rows))),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = (funnel_view_purchase(str(tmp_path)).to_pandas()
           .sort_values("day").reset_index(drop=True))
    # users with a view: 1,2,3,5,6,7 (user 4 has no view)
    assert got["n_users"].sum() == 6
    # conversions: user 1 (exactly +24h: window is inclusive) and user 7
    # (inside); user 2 is 1 us past the window; user 3's purchase precedes
    # its view; user 5's window expired; user 6's purchase is same-ts
    assert got["n_converted"].sum() == 2


def test_curation_antijoin_equals_broadcast(ray_session, monkeypatch):
    """curation_pipeline's removal: the broadcast-losers path and the
    distributed doc_id-keyed anti-join scan emit identical rows on real
    sf0.001 documents (cap forced to 0 flips the path)."""
    import rayschema.queries as Q

    sf = "/root/testdata/sf0.001"
    cols = ["doc_id", "lang", "n_tok", "split"]
    a = (Q.curation_pipeline_documents(sf).to_pandas()[cols]
         .sort_values("doc_id").reset_index(drop=True))
    monkeypatch.setattr(Q, "CURATION_REMOVAL_BROADCAST_CAP", 0)
    b = (Q.curation_pipeline_documents(sf).to_pandas()[cols]
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 50


def test_value_quartile_ntile_semantics(ray_session, tmp_path):
    """NTILE(4) edge semantics pinned: n=6 -> bucket sizes 2,2,1,1 (extra
    rows to EARLIER buckets); n=3 -> sizes 1,1,1 (bucket 4 absent); ties
    ordered by event_id."""
    import pyarrow.parquet as _pq

    from rayschema.queries import value_quartile_by_type

    rows = []
    # type A: 6 events, values 1..6 (cents 100..600)
    for i, v in enumerate([6, 5, 4, 3, 2, 1]):
        rows.append((i, "A", float(v)))
    # type B: 3 events, all tied at value 9 -> order by event_id
    for i in range(3):
        rows.append((100 + i, "B", 9.0))
    tab = pa.table({
        "event_id": pa.array(np.array([r[0] for r in rows], np.int64)),
        "user_id": pa.array(np.zeros(len(rows), np.int64)),
        "ts": pa.array(np.arange(len(rows), dtype=np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows]),
        "value": pa.array(np.array([r[2] for r in rows])),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = (value_quartile_by_type(str(tmp_path)).to_pandas()
           .sort_values(["event_type", "quartile"]).reset_index(drop=True))
    a = got[got["event_type"] == "A"]
    assert a["quartile"].tolist() == [1, 2, 3, 4]
    assert a["n_events"].tolist() == [2, 2, 1, 1]
    # quartile 1 = the two SMALLEST values (100, 200 cents)
    assert a["sum_cents"].tolist() == [300, 700, 500, 600]
    b = got[got["event_type"] == "B"]
    assert b["quartile"].tolist() == [1, 2, 3]
    assert b["n_events"].tolist() == [1, 1, 1]


def test_weighted_sample_deterministic_and_weighted(ray_session, tmp_path):
    """Same input -> identical sample; heavier docs oversampled: with
    weights 1000 vs 1, the top-50 draw is dominated by heavy docs."""
    from rayschema.queries import weighted_sample_documents

    df = pd.DataFrame({
        "doc_id": np.arange(400, dtype=np.int64),
        "n_chars": np.where(np.arange(400) % 2 == 0, 1000, 1)
        .astype(np.int64),
    })
    df["text"] = "x"
    sf = _write_docs(tmp_path, df)
    a = weighted_sample_documents(sf, k=50).to_pandas()
    b = weighted_sample_documents(sf, k=50).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    heavy = (a["doc_id"] % 2 == 0).mean()
    assert heavy > 0.9


def test_q4_broadcast_equals_hash_join(ray_session, monkeypatch):
    """q4's EXISTS semi-join: broadcast membership and the hash-join
    fallback agree on the real sf0.001 tables."""
    import rayschema.queries as Q

    sf = "/root/testdata/sf0.001"
    a = (Q.q4_priority_exists(sf).to_pandas()
         .sort_values("o_orderpriority").reset_index(drop=True))
    monkeypatch.setattr(Q, "Q3_BROADCAST_CAP", 0)
    b = (Q.q4_priority_exists(sf).to_pandas()
         .sort_values("o_orderpriority").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert a["n_orders"].sum() > 0


def test_events_cusum_detects_level_shift(ray_session, tmp_path):
    """Planted level shift: 20 hours at rate 10 then 10 hours at rate 40 —
    CUSUM accumulates only after the shift and alarms within it; the
    pre-shift hours never alarm. Values equal the hand recurrence."""
    import pyarrow.parquet as _pq

    from rayschema.queries import events_cusum_change

    counts = [10] * 20 + [40] * 10
    ts = []
    for h, c in enumerate(counts):
        ts.extend(h * 3600_000_000 + np.arange(c) * 1000)
    ts = np.array(ts, dtype=np.int64)
    tab = pa.table({
        "event_id": pa.array(np.arange(len(ts), dtype=np.int64)),
        "user_id": pa.array(np.zeros(len(ts), np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * len(ts)),
        "value": pa.array(np.ones(len(ts))),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = (events_cusum_change(str(tmp_path))
           .sort_values("hour_bucket").reset_index(drop=True))
    H, S = 30, sum(counts)
    s, exp_c, exp_a = 0, [], []
    for c in counts:
        s = max(0, s + (c * H - S))
        exp_c.append(s)
        exp_a.append(1 if s > 8 * S else 0)
    assert got["cusum"].tolist() == exp_c
    assert got["is_alarm"].tolist() == exp_a
    assert got.loc[:19, "is_alarm"].sum() == 0      # pre-shift quiet
    assert got.loc[20:, "is_alarm"].sum() > 0       # shift alarms


def test_hourly_trend_slope_hand_case(ray_session, tmp_path):
    """Planted linear ramp y = 2x + 3 over 5 hours -> slope exactly 2/1
    (num/den reduce to 2); a flat type -> slope_num 0; a gap hour counts
    as zero activity."""
    import pyarrow.parquet as _pq

    from rayschema.queries import hourly_trend_slope

    rows = []
    eid = 0
    for x in range(5):                       # ramp: 3,5,7,9,11 events
        for _ in range(2 * x + 3):
            rows.append((eid, "ramp", x * 3600_000_000 + eid % 1000))
            eid += 1
    for x in (0, 2):                         # flat-with-gap: 4,0,4
        for _ in range(4):
            rows.append((eid, "gap", x * 3600_000_000 + eid % 1000))
            eid += 1
    tab = pa.table({
        "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "user_id": pa.array(np.zeros(len(rows), np.int64)),
        "ts": pa.array(np.array([r[2] for r in rows], np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows]),
        "value": pa.array(np.ones(len(rows))),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = hourly_trend_slope(str(tmp_path)).set_index("event_type")
    r = got.loc["ramp"]
    # n=5, x=0..4: slope = 2 exactly -> num/den == 2
    assert r["slope_num"] == 2 * r["slope_den"] and r["slope_den"] > 0
    g = got.loc["gap"]                       # y = 4,0,4 -> slope 0
    assert g["slope_num"] == 0 and g["n_hours"] == 3


def test_lang_source_residuals_hand_case(ray_session, tmp_path):
    """Perfect independence -> every residual exactly 0; a planted
    over-represented cell -> positive residual, its complements negative."""
    from rayschema.queries import lang_source_residuals

    # independent 2x2: counts 10,20 / 20,40 (rows x cols proportional)
    rows = (["en"] * 10 + ["en"] * 20 + ["de"] * 20 + ["de"] * 40)
    srcs = (["a"] * 10 + ["b"] * 20 + ["a"] * 20 + ["b"] * 40)
    df = pd.DataFrame({"doc_id": np.arange(90, dtype=np.int64),
                       "text": "t", "lang": rows, "source": srcs,
                       "n_chars": np.ones(90, dtype=np.int64)})
    sf = _write_docs(tmp_path, df)
    got = lang_source_residuals(sf)
    assert (got["resid_num"] == 0).all()

    # skew one cell: +30 extra (en, a)
    df2 = pd.concat([df, pd.DataFrame({
        "doc_id": np.arange(90, 120, dtype=np.int64), "text": "t",
        "lang": ["en"] * 30, "source": ["a"] * 30,
        "n_chars": np.ones(30, dtype=np.int64)})])
    sf2 = _write_docs(tmp_path, df2)
    got2 = lang_source_residuals(sf2).set_index(["lang", "source"])
    assert got2.loc[("en", "a"), "resid_num"] > 0
    assert got2.loc[("en", "b"), "resid_num"] < 0
    assert got2.loc[("de", "a"), "resid_num"] < 0
    assert got2.loc[("de", "b"), "resid_num"] > 0


def test_benford_digit_audit_planted(ray_session, tmp_path):
    """Hand-built totals hitting every first-digit branch, including the
    exact-power-of-ten ulp edges (1.00 -> cents 100 -> digit 1; 10.00 ->
    1000 -> 1; 99.99 -> 9999 -> 9) and a zero row that must be dropped."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from rayschema.queries import benford_digit_audit

    totals = [1.00, 10.00, 100.00, 99.99, 0.00, 2.34, 23.45, 0.05,
              55.00, 0.09, 9.00, 876.54]
    tab = _pa.table({
        "o_orderkey": _pa.array(range(len(totals)), type=_pa.int64()),
        "o_totalprice": _pa.array(totals, type=_pa.float64()),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "orders.parquet"))
    got = benford_digit_audit(str(tmp_path))
    # first digits of cents: 100->1,1000->1,10000->1,9999->9,(0 drop),
    # 234->2,2345->2,5->5,5500->5,9->9,900->9,87654->8
    exp_n = {1: 3, 2: 2, 5: 2, 8: 1, 9: 3}
    assert dict(zip(got["digit"], got["n"])) == exp_n
    total = sum(exp_n.values())
    for _, r in got.iterrows():
        assert r["resid_millionths"] == (1_000_000 * r["n"]
                                         - total * r["expected_millionths"])
    assert got["digit"].is_monotonic_increasing


def test_fd_audit_source_lang_planted(ray_session, tmp_path):
    """One clean source (FD holds: 0 violations), one 2-lang source with a
    clear mode, one tie broken lexicographically."""
    import os

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from rayschema.queries import fd_audit_source_lang

    rows = ([("clean", "en")] * 3
            + [("mixed", "en")] * 3 + [("mixed", "de")]
            + [("tied", "fr"), ("tied", "de")]
            + [(None, "en"), ("mixed", None)])
    tab = _pa.table({
        "doc_id": _pa.array(range(len(rows)), type=_pa.int64()),
        "text": _pa.array(["x"] * len(rows)),
        "source": _pa.array([r[0] for r in rows]),
        "lang": _pa.array([r[1] for r in rows]),
        "n_chars": _pa.array([1] * len(rows), type=_pa.int64()),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "documents.parquet"))
    got = fd_audit_source_lang(str(tmp_path)).set_index("source")
    assert got.loc["clean"].tolist() == [1, 3, "en", 0]
    assert got.loc["mixed"].tolist() == [2, 4, "en", 1]
    assert got.loc["tied"].tolist() == [2, 2, "de", 1]   # tie -> lex min


def test_value_mad_outliers_planted(ray_session, tmp_path):
    """Hand case: type A = {1,2,3,4,100} (cents 100..10000) -> median is
    the 3rd of 5 = 300 cents; devs {200,100,0,100,9700} -> MAD = 100;
    outliers = dev > 300 -> only the 100.0 row. Type B constant -> MAD 0,
    zero outliers. Null value/type rows drop."""
    import os

    import numpy as np
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from rayschema.queries import value_mad_outliers

    vals = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0), ("A", 100.0),
            ("B", 7.0), ("B", 7.0), ("B", 7.0), ("A", None), (None, 5.0)]
    tab = _pa.table({
        "event_id": _pa.array(range(len(vals)), type=_pa.int64()),
        "ts": _pa.array([0] * len(vals), type=_pa.timestamp("us")),
        "user_id": _pa.array([1] * len(vals), type=_pa.int64()),
        "event_type": _pa.array([v[0] for v in vals]),
        "value": _pa.array([v[1] for v in vals], type=_pa.float64()),
        "props": _pa.array(["{}"] * len(vals)),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = value_mad_outliers(str(tmp_path)).set_index("event_type")
    assert got.loc["A"].tolist() == [5, 300, 100, 1]
    assert got.loc["B"].tolist() == [3, 700, 0, 0]


def test_skyline_kernel_matches_bruteforce():
    from rayschema.queries import _skyline_2d

    rng = np.random.RandomState(7)
    for trial in range(20):
        n = int(rng.randint(1, 60))
        # small domains force heavy ties in both dimensions
        price = rng.randint(0, 8, n).astype(np.int64)
        size = rng.randint(0, 8, n).astype(np.int64)
        key = np.arange(n, dtype=np.int64)
        got = _skyline_2d(key, price, size)
        want = np.array([
            not any((price[j] <= price[i] and size[j] >= size[i]
                     and (price[j] < price[i] or size[j] > size[i]))
                    for j in range(n))
            for i in range(n)])
        assert np.array_equal(got, want), (trial, price, size)


def test_part_skyline_is_pareto_frontier(ray_session):
    from rayschema.queries import part_skyline

    sf = "/root/testdata/sf0.001"
    out = part_skyline(sf).to_pandas()
    con = duckdb.connect()
    full = con.sql(
        f"SELECT p_partkey, CAST(round(p_retailprice*100) AS BIGINT) AS pc,"
        f" CAST(p_size AS BIGINT) AS ps FROM"
        f" read_parquet('{sf}/part.parquet')").df()
    # every emitted row is non-dominated; every omitted row is dominated
    pc_, ps_ = full["pc"].to_numpy(), full["ps"].to_numpy()
    emitted = set(out["p_partkey"])
    for _, r in full.iterrows():
        dom = bool(np.any((pc_ <= r["pc"]) & (ps_ >= r["ps"])
                          & ((pc_ < r["pc"]) | (ps_ > r["ps"]))))
        assert (r["p_partkey"] in emitted) == (not dom)


def test_char_entropy_hand_cases(ray_session, tmp_path):
    from rayschema.queries import char_entropy_documents

    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["aaaa",            # entropy exactly 0
                 "abab",            # exactly 1 bit
                 "abcd",            # exactly 2 bits
                 "héllo wörld",     # multi-byte codepoints count once
                 None],             # dropped
        "lang": ["en"] * 5, "source": ["src1"] * 5,
        "n_chars": np.array([4, 4, 4, 11, 0], dtype=np.int64)})
    sf = _write_docs(tmp_path, df)
    out = char_entropy_documents(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [0, 1, 2, 3]
    assert list(out["n_cp"]) == [4, 4, 4, 11]
    assert list(out["n_distinct"]) == [1, 2, 4, 9]
    assert list(out["entropy_mbits"])[:3] == [0, 1000, 2000]
    # h('héllo wörld'): 9 distinct over 11 cps, only 'l'x3 repeats
    h = np.log2(11.0) - (3 * np.log2(3.0)) / 11.0
    assert out["entropy_mbits"][3] == int(np.floor(h * 1000))


def test_q13_includes_zero_order_customers(ray_session):
    from rayschema.queries import q13_customer_distribution

    sf = "/root/testdata/sf0.001"
    out = q13_customer_distribution(sf)
    con = duckdb.connect()
    want = con.sql(f"""
        WITH oc AS (
          SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
          FROM read_parquet('{sf}/customer.parquet') c
          LEFT JOIN read_parquet('{sf}/orders.parquet') o
            ON o.o_custkey = c.c_custkey
           AND o.o_orderpriority = '1-URGENT'
          GROUP BY c.c_custkey)
        SELECT c_count, count(*)::BIGINT AS custdist
        FROM oc GROUP BY c_count ORDER BY c_count""").df()
    got = out.sort_values("c_count").reset_index(drop=True)
    assert got["c_count"].tolist() == want["c_count"].tolist()
    assert got["custdist"].tolist() == want["custdist"].tolist()
    # the distribution must account for EVERY customer, incl. zero-order
    ncust = con.sql(f"SELECT count(*) FROM "
                    f"read_parquet('{sf}/customer.parquet')").fetchone()[0]
    assert int(got["custdist"].sum()) == ncust


def test_q17_integer_threshold_semantics(ray_session):
    from rayschema.queries import q17_small_quantity_revenue

    sf = "/root/testdata/sf0.001"
    out = q17_small_quantity_revenue(sf)
    con = duckdb.connect()
    want = con.sql(f"""
        WITH pk AS (SELECT p_partkey FROM
                    read_parquet('{sf}/part.parquet')
                    WHERE p_brand = 'Brand#13'),
        li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
                      CAST(round(l_extendedprice*100) AS BIGINT) AS cents
               FROM read_parquet('{sf}/lineitem.parquet')
               JOIN pk ON l_partkey = p_partkey),
        ag AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS sq,
                      count(*)::BIGINT AS cnt
               FROM li GROUP BY l_partkey)
        SELECT count(*)::BIGINT AS n_li,
               (CAST(COALESCE(sum(li.cents), 0) AS BIGINT) / 100.0) / 7.0
                   AS avg_yearly
        FROM li JOIN ag ON li.l_partkey = ag.l_partkey
        WHERE 5 * li.q * ag.cnt < ag.sq""").df()
    assert int(out["n_li"][0]) == int(want["n_li"][0])
    assert out["avg_yearly"][0] == want["avg_yearly"][0]


def test_lang_source_cube_sets_consistent(ray_session):
    from rayschema.queries import lang_source_cube

    out = lang_source_cube("/root/testdata/sf0.001")
    fine = out[(out["lang"] != "__all__") & (out["source"] != "__all__")]
    top = out[(out["lang"] == "__all__") & (out["source"] == "__all__")]
    by_lang = out[(out["lang"] != "__all__") & (out["source"] == "__all__")]
    by_src = out[(out["lang"] == "__all__") & (out["source"] != "__all__")]
    assert len(top) == 1
    for sub in (fine, by_lang, by_src):
        assert int(sub["n_docs"].sum()) == int(top["n_docs"].iloc[0])
        assert int(sub["sum_chars"].sum()) == int(top["sum_chars"].iloc[0])


def test_q14_promo_share_semantics(ray_session):
    from rayschema.queries import q14_promo_revenue

    sf = "/root/testdata/sf0.001"
    out = q14_promo_revenue(sf)
    con = duckdb.connect()
    want = con.sql(f"""
        WITH li AS (
          SELECT l_partkey,
                 CAST(round(l_extendedprice*100) AS BIGINT)
                   * CAST(round((1-l_discount)*100) AS BIGINT) AS rev
          FROM read_parquet('{sf}/lineitem.parquet')
          WHERE l_shipdate >= TIMESTAMP '1996-03-01'
            AND l_shipdate < TIMESTAMP '1996-04-01')
        SELECT CAST(COALESCE(sum(CASE WHEN p.p_type = 'PROMO'
                                      THEN li.rev END), 0) AS BIGINT) AS p,
               CAST(COALESCE(sum(li.rev), 0) AS BIGINT) AS t
        FROM li LEFT JOIN read_parquet('{sf}/part.parquet') p
          ON li.l_partkey = p.p_partkey""").fetchone()
    assert int(out["promo_rev_e4"][0]) == want[0]
    assert int(out["total_rev_e4"][0]) == want[1]
    assert int(out["promo_ppm"][0]) == want[0] * 1_000_000 // want[1]
    assert 0 < int(out["promo_ppm"][0]) < 1_000_000


def test_q22_exact_threshold_and_antijoin(ray_session, tmp_path):
    from rayschema.queries import q22_no_order_customers

    # 3 customers, avg positive balance = (300 + 600)/2 = 450.00:
    #   cust 0 bal 300.00 -> below avg, excluded even without orders
    #   cust 1 bal 600.00, no urgent order -> KEPT
    #   cust 2 bal 600.00, has an urgent order -> anti-joined away
    #   cust 3 bal -50.00 -> negative, not in avg, below threshold
    # exact-rational check: cust 4 bal 450.00 == avg -> strict >, excluded
    cust = pd.DataFrame({
        "c_custkey": np.arange(5, dtype=np.int64),
        "c_acctbal": [300.0, 600.0, 600.0, -50.0, 450.0],
        "c_mktsegment": ["SEG_A", "SEG_A", "SEG_A", "SEG_B", "SEG_B"],
    })
    # avg positive = (300+600+600+450)/4 = 487.50; recompute expectations:
    #   threshold cents*4 > 195000 -> bal > 487.50: custs 1, 2 qualify
    orders = pd.DataFrame({
        "o_custkey": np.array([2, 0], dtype=np.int64),
        "o_orderpriority": ["1-URGENT", "1-URGENT"],
    })
    pq.write_table(pa.Table.from_pandas(cust, preserve_index=False),
                   os.path.join(tmp_path, "customer.parquet"))
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                   os.path.join(tmp_path, "orders.parquet"))
    out = q22_no_order_customers(str(tmp_path))
    assert out["c_mktsegment"].tolist() == ["SEG_A"]
    assert out["n_cust"].tolist() == [1]
    assert out["sum_bal_cents"].tolist() == [60000]


def test_q10_top20_matches_oracle(ray_session):
    from rayschema.queries import q10_returned_items

    sf = "/root/testdata/sf0.001"
    out = q10_returned_items(sf)
    con = duckdb.connect()
    want = con.sql(f"""
        WITH o AS (SELECT o_orderkey, o_custkey
                   FROM read_parquet('{sf}/orders.parquet')
                   WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                     AND o_orderdate < TIMESTAMP '1996-04-01'),
        li AS (SELECT l_orderkey,
                      CAST(round(l_extendedprice*100) AS BIGINT)
                        * CAST(round((1-l_discount)*100) AS BIGINT) AS rev
               FROM read_parquet('{sf}/lineitem.parquet')
               WHERE l_returnflag = 'R'),
        percust AS (SELECT o.o_custkey AS c_custkey,
                           CAST(sum(li.rev) AS BIGINT) AS revenue_e4
                    FROM li JOIN o ON li.l_orderkey = o.o_orderkey
                    GROUP BY o.o_custkey)
        SELECT c_custkey, revenue_e4 FROM percust
        ORDER BY revenue_e4 DESC, c_custkey LIMIT 20""").df()
    assert out["c_custkey"].tolist() == want["c_custkey"].tolist()
    assert out["revenue_e4"].tolist() == want["revenue_e4"].tolist()
    assert out["c_name"].notna().all() and out["n_name"].notna().all()


def test_q7_both_directions_and_years(ray_session):
    from rayschema.queries import q7_volume_shipping

    sf = "/root/testdata/sf0.01"    # the pair is empty at sf0.001
    out = q7_volume_shipping(sf)
    # cross-nation only, both directions present as distinct group keys
    assert (out["supp_nation"] != out["cust_nation"]).all()
    dirs = set(zip(out["supp_nation"], out["cust_nation"]))
    assert dirs == {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    con = duckdb.connect()
    want = con.sql(f"""
        SELECT CAST(COALESCE(sum(
                   CAST(round(l.l_extendedprice*100) AS BIGINT)
                   * CAST(round((1-l.l_discount)*100) AS BIGINT)), 0)
                    AS BIGINT)
        FROM read_parquet('{sf}/lineitem.parquet') l
        JOIN read_parquet('{sf}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        JOIN read_parquet('{sf}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        JOIN read_parquet('{sf}/supplier.parquet') s
          ON l.l_suppkey = s.s_suppkey
        JOIN read_parquet('{sf}/nation.parquet') ns
          ON s.s_nationkey = ns.n_nationkey
        JOIN read_parquet('{sf}/nation.parquet') nc
          ON c.c_nationkey = nc.n_nationkey
        WHERE ns.n_name IN ('NATION_1','NATION_2')
          AND nc.n_name IN ('NATION_1','NATION_2')
          AND s.s_nationkey <> c.c_nationkey""").fetchone()[0]
    assert int(out["revenue_e4"].sum()) == int(want)


def test_ttr_hand_cases(ray_session, tmp_path):
    from rayschema.queries import ttr_documents

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a a a a",        # 4 tokens, 1 type, 0 hapax
                 "a b c d",        # 4 tokens, 4 types, 4 hapax
                 "a a b",          # 3 tokens, 2 types, 1 hapax
                 "x  y"],          # double space -> empty token: 3 tokens
        "lang": ["en"] * 4, "source": ["src1"] * 4,
        "n_chars": np.array([7, 7, 5, 4], dtype=np.int64)})
    sf = _write_docs(tmp_path, df)
    out = ttr_documents(sf).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert out["n_tokens"].tolist() == [4, 4, 3, 3]
    assert out["n_types"].tolist() == [1, 4, 2, 3]
    assert out["n_hapax"].tolist() == [0, 4, 1, 3]
    assert out["ttr_ppm"].tolist() == [250000, 1000000, 666666, 1000000]


def test_max_token_run_ties_and_runs(ray_session, tmp_path):
    from rayschema.queries import max_token_run_documents

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["x batch batch batch y",   # clear max run of 3
                 "b b a a c",               # tie run=2: min token 'a' wins
                 "solo",                    # single token -> run 1
                 "z z z z z z"],            # whole doc one run
        "lang": ["en"] * 4, "source": ["src1"] * 4,
        "n_chars": np.array([21, 9, 4, 11], dtype=np.int64)})
    sf = _write_docs(tmp_path, df)
    out = max_token_run_documents(sf).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert out["max_run"].tolist() == [3, 2, 1, 6]
    assert out["run_token"].tolist() == ["batch", "a", "solo", "z"]


def test_bloom_filter_no_false_negatives():
    from rayschema.queries import _bloom_build, _bloom_member

    rng = np.random.RandomState(5)
    keys = np.unique(rng.randint(0, 1 << 40, 30000).astype(np.int64))
    packed = _bloom_build(keys)
    assert _bloom_member(keys, packed).all()     # zero false negatives
    probe = np.unique(rng.randint(0, 1 << 40, 100000).astype(np.int64))
    probe = np.setdiff1d(probe, keys)
    fp = _bloom_member(probe, packed).mean()
    assert fp < 0.01                              # fp ~1e-4 at this load


def test_bloom_semi_join_matches_oracle_and_join_path(ray_session):
    from rayschema.queries import bloom_semi_join_orders

    sf = "/root/testdata/sf0.001"
    out = bloom_semi_join_orders(sf)
    con = duckdb.connect()
    want = con.sql(f"""
        SELECT o.o_orderpriority, count(*)::BIGINT AS n_orders,
               CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT))
                    AS BIGINT) AS sum_total_cents
        FROM read_parquet('{sf}/orders.parquet') o
        WHERE EXISTS (SELECT 1 FROM read_parquet('{sf}/customer.parquet') c
                      WHERE c.c_custkey = o.o_custkey
                        AND c.c_mktsegment = 'BUILDING')
        GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""").df()
    got = out.sort_values("o_orderpriority").reset_index(drop=True)
    assert got["o_orderpriority"].tolist() == want["o_orderpriority"].tolist()
    assert got["n_orders"].tolist() == want["n_orders"].tolist()
    assert got["sum_total_cents"].tolist() == want["sum_total_cents"].tolist()
    # the >cap hash-exchange verify path returns the identical answer
    got2 = bloom_semi_join_orders(sf, verify_cap=0) \
        .sort_values("o_orderpriority").reset_index(drop=True)
    assert got2.equals(got)


def test_distinct_users_per_type_planted(ray_session, tmp_path):
    from rayschema.queries import distinct_users_per_type

    ev = pd.DataFrame({
        "event_id": np.arange(8, dtype=np.int64),
        "ts": pd.to_datetime(["2024-01-01"] * 8),
        "user_id": np.array([1, 1, 1, 2, 2, 3, 9, 9], dtype=np.int64),
        "event_type": ["view", "view", "click", "view", "view",
                       "view", "click", "click"],
        "value": np.ones(8), "props": ["{}"] * 8})
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    out = distinct_users_per_type(str(tmp_path))
    assert out["event_type"].tolist() == ["click", "view"]
    assert out["n_users"].tolist() == [2, 3]


def test_q10_hash_join_path_equals_broadcast(ray_session, monkeypatch):
    import rayschema.queries as Q

    sf = "/root/testdata/sf0.001"
    want = Q.q10_returned_items(sf)
    monkeypatch.setattr(Q, "Q3_BROADCAST_CAP", 0)
    got = Q.q10_returned_items(sf)
    assert got["c_custkey"].tolist() == want["c_custkey"].tolist()
    assert got["revenue_e4"].tolist() == want["revenue_e4"].tolist()


def test_q7_hash_join_path_equals_broadcast(ray_session, monkeypatch):
    import rayschema.queries as Q

    sf = "/root/testdata/sf0.01"
    want = Q.q7_volume_shipping(sf)
    monkeypatch.setattr(Q, "Q3_BROADCAST_CAP", 0)
    got = Q.q7_volume_shipping(sf)
    assert got.equals(want)


def test_q19_disjunction_matches_oracle(ray_session):
    from rayschema.queries import q19_discounted_revenue

    sf = "/root/testdata/sf0.001"
    out = q19_discounted_revenue(sf)
    con = duckdb.connect()
    want = con.sql(f"""
        WITH li AS (
          SELECT CAST(l.l_quantity AS BIGINT) AS q,
                 CAST(round(l.l_extendedprice*100) AS BIGINT)
                   * CAST(round((1-l.l_discount)*100) AS BIGINT) AS rev,
                 p.p_brand, CAST(p.p_size AS BIGINT) AS p_size
          FROM read_parquet('{sf}/lineitem.parquet') l
          JOIN read_parquet('{sf}/part.parquet') p
            ON l.l_partkey = p.p_partkey)
        SELECT count(*)::BIGINT,
               CAST(COALESCE(sum(rev), 0) AS BIGINT)
        FROM li
        WHERE (p_brand='Brand#11' AND p_size BETWEEN 1 AND 5
               AND q BETWEEN 1 AND 11)
           OR (p_brand='Brand#22' AND p_size BETWEEN 1 AND 10
               AND q BETWEEN 10 AND 20)
           OR (p_brand='Brand#33' AND p_size BETWEEN 1 AND 15
               AND q BETWEEN 20 AND 30)""").fetchone()
    assert int(out["n_li"][0]) == want[0] and want[0] > 0
    assert int(out["revenue_e4"][0]) == want[1]


def test_q12_late_boundary_exact_day(ray_session, tmp_path):
    from rayschema.queries import q12_late_shipments

    # one order, three lineitems: 90 days = ON TIME (<=), 91 = late
    orders = pd.DataFrame({
        "o_orderkey": np.array([1], dtype=np.int64),
        "o_custkey": np.array([1], dtype=np.int64),
        "o_orderstatus": ["O"], "o_totalprice": [1.0],
        "o_orderdate": pd.to_datetime(["2024-01-01"]),
        "o_orderpriority": ["1-URGENT"]})
    li = pd.DataFrame({
        "l_orderkey": np.array([1, 1, 1], dtype=np.int64),
        "l_shipdate": pd.to_datetime(
            ["2024-03-31", "2024-03-31", "2024-04-01"])})
    # 2024-01-01 + 90 days = 2024-03-31
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                   os.path.join(tmp_path, "orders.parquet"))
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   os.path.join(tmp_path, "lineitem.parquet"))
    out = q12_late_shipments(str(tmp_path))
    assert out["o_orderpriority"].tolist() == ["1-URGENT"]
    assert out["n_late"].tolist() == [1]
    assert out["n_ontime"].tolist() == [2]


def test_q12_join_path_equals_broadcast(ray_session, monkeypatch):
    import rayschema.queries as Q

    sf = "/root/testdata/sf0.001"
    want = Q.q12_late_shipments(sf)
    monkeypatch.setattr(Q, "Q3_BROADCAST_CAP", 0)
    got = Q.q12_late_shipments(sf)
    assert got.equals(want)


def test_q8_share_ppm_invariants(ray_session):
    from rayschema.queries import q8_market_share

    sf = "/root/testdata/sf0.001"
    out = q8_market_share(sf)
    assert len(out) > 0
    assert (out["nation_e4"] <= out["total_e4"]).all()
    assert ((out["share_ppm"] >= 0) & (out["share_ppm"] <= 1000000)).all()
    # ppm is the exact floor of the integer ratio
    exp = (out["nation_e4"] * 1_000_000) // out["total_e4"]
    assert out["share_ppm"].tolist() == exp.tolist()
    # share sums: every year's total must equal the region revenue
    con = duckdb.connect()
    want = con.sql(f"""
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS y,
               CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                    * CAST(round((1-l.l_discount)*100) AS BIGINT))
                    AS BIGINT) AS t
        FROM read_parquet('{sf}/lineitem.parquet') l
        JOIN read_parquet('{sf}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        JOIN read_parquet('{sf}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        JOIN read_parquet('{sf}/nation.parquet') n
          ON c.c_nationkey = n.n_nationkey
        JOIN read_parquet('{sf}/region.parquet') r
          ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'AFRICA'
        GROUP BY 1 ORDER BY 1""").df()
    got = out.sort_values("o_year")
    assert got["o_year"].tolist() == want["y"].tolist()
    assert got["total_e4"].tolist() == want["t"].tolist()


def test_q8_join_paths_equal(ray_session, monkeypatch):
    import rayschema.queries as Q

    sf = "/root/testdata/sf0.001"
    want = Q.q8_market_share(sf)
    monkeypatch.setattr(Q, "Q3_BROADCAST_CAP", 0)
    got = Q.q8_market_share(sf)
    assert got.equals(want)


def test_parts_supplier_diversity_planted(ray_session, tmp_path):
    from rayschema.queries import parts_supplier_diversity

    part = pd.DataFrame({
        "p_partkey": np.array([1, 2, 3], dtype=np.int64),
        "p_name": ["a", "b", "c"],
        "p_brand": ["B1", "B1", "B2"],
        "p_type": ["T"] * 3,
        "p_size": np.array([5, 5, 9], dtype=np.int32),
        "p_retailprice": [1.0, 2.0, 3.0]})
    li = pd.DataFrame({
        "l_partkey": np.array([1, 1, 2, 2, 3, 3, 3], dtype=np.int64),
        "l_suppkey": np.array([10, 10, 10, 11, 12, 12, 13],
                              dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                   os.path.join(tmp_path, "part.parquet"))
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   os.path.join(tmp_path, "lineitem.parquet"))
    out = parts_supplier_diversity(str(tmp_path))
    # (B1,5): suppliers {10,11} across parts 1+2; (B2,9): {12,13}
    assert out["p_brand"].tolist() == ["B1", "B2"]
    assert out["p_size"].tolist() == [5, 9]
    assert out["n_suppliers"].tolist() == [2, 2]


def test_parts_supplier_diversity_paths_equal(ray_session, monkeypatch):
    """The >cap sorted boundary-corrected scale path must emit exactly
    the driver-merge path's result (sf0.01: 988 (brand,size) cells,
    multi-block sort so boundary keys genuinely span blocks)."""
    import rayschema.queries as Q

    sf = "/root/testdata/sf0.01"
    want = Q.parts_supplier_diversity(sf)
    monkeypatch.setattr(Q, "TRIPLE_DRIVER_MERGE_CAP", 0)
    got = Q.parts_supplier_diversity(sf)
    assert got.equals(want)


def test_ttr_and_runs_random_cross_check(ray_session, tmp_path):
    """200 random docs from a 6-word alphabet (heavy ties, empty tokens
    from double spaces) cross-checked against pure-Python references."""
    from collections import Counter

    from rayschema.queries import max_token_run_documents, ttr_documents

    rng = np.random.RandomState(42)
    words = ["a", "b", "ab", "batch", "", "x"]
    texts = []
    for _ in range(200):
        n = rng.randint(1, 30)
        texts.append(" ".join(words[i] for i in rng.randint(0, 6, n)))
    df = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64), "text": texts,
        "lang": ["en"] * 200, "source": ["s"] * 200,
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)})
    sf = _write_docs(tmp_path, df)

    out = ttr_documents(sf).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    runs = max_token_run_documents(sf).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        c = Counter(toks)
        assert out["n_tokens"][i] == len(toks)
        assert out["n_types"][i] == len(c)
        assert out["n_hapax"][i] == sum(1 for v in c.values() if v == 1)
        assert out["ttr_ppm"][i] == len(c) * 1_000_000 // len(toks)
        # reference run-length scan
        best, cur, best_toks = 1, 1, {toks[0]}
        for a, b in zip(toks, toks[1:]):
            cur = cur + 1 if a == b else 1
            if cur > best:
                best, best_toks = cur, {b}
            elif cur == best:
                best_toks.add(b)
        assert runs["max_run"][i] == best
        assert runs["run_token"][i] == min(best_toks)


def test_char_entropy_random_cross_check(ray_session, tmp_path):
    from collections import Counter

    from rayschema.queries import char_entropy_documents

    rng = np.random.RandomState(7)
    alphabet = list("abc é世")       # multi-byte chars included
    texts = ["".join(alphabet[i] for i in rng.randint(0, 6,
                                                      rng.randint(1, 60)))
             for _ in range(150)]
    df = pd.DataFrame({
        "doc_id": np.arange(150, dtype=np.int64), "text": texts,
        "lang": ["en"] * 150, "source": ["s"] * 150,
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)})
    sf = _write_docs(tmp_path, df)
    out = char_entropy_documents(sf).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    for i, t in enumerate(texts):
        c = Counter(t)
        n = len(t)
        assert out["n_cp"][i] == n
        assert out["n_distinct"][i] == len(c)
        s = sum(k * np.log2(k) for k in c.values())
        h = np.log2(float(n)) - s / n
        assert out["entropy_mbits"][i] == int(np.floor(h * 1000))


def test_snapshot_diff_classes_planted(ray_session, tmp_path):
    from rayschema.queries import snapshot_diff_documents

    # doc ids chosen so every class occurs:
    #   7,14 -> removed (%7==0); 5 -> changed (%5==0); 11 -> unchanged
    #   AND re-added under 10_000_011 (%11==0); 1,2 -> unchanged
    ids = np.array([1, 2, 5, 7, 11, 14], dtype=np.int64)
    df = pd.DataFrame({
        "doc_id": ids,
        "text": [f"t{i}" for i in ids],
        "lang": ["en"] * 6, "source": ["s"] * 6,
        "n_chars": np.array([2] * 6, dtype=np.int64)})
    sf = _write_docs(tmp_path, df)
    out = snapshot_diff_documents(sf).set_index("class")["n_docs"]
    assert out["removed"] == 2          # 7, 14
    assert out["changed"] == 1          # 5
    assert out["added"] == 1            # 10_000_011
    assert out["unchanged"] == 3        # 1, 2, 11


def test_q15_max_with_ties(ray_session, tmp_path):
    from rayschema.queries import q15_top_supplier

    # two suppliers tie at the max: both must be emitted
    li = pd.DataFrame({
        "l_suppkey": np.array([1, 1, 2, 3], dtype=np.int64),
        "l_extendedprice": [100.0, 100.0, 200.0, 50.0],
        "l_discount": [0.0, 0.0, 0.0, 0.0],
        "l_shipdate": pd.to_datetime(["1996-02-01"] * 4)})
    sup = pd.DataFrame({
        "s_suppkey": np.array([1, 2, 3], dtype=np.int64),
        "s_name": ["S1", "S2", "S3"],
        "s_nationkey": np.array([0, 0, 0], dtype=np.int32),
        "s_acctbal": [1.0, 2.0, 3.0]})
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   os.path.join(tmp_path, "lineitem.parquet"))
    pq.write_table(pa.Table.from_pandas(sup, preserve_index=False),
                   os.path.join(tmp_path, "supplier.parquet"))
    out = q15_top_supplier(str(tmp_path))
    assert out["s_suppkey"].tolist() == [1, 2]
    assert out["s_name"].tolist() == ["S1", "S2"]
    assert out["total_revenue_e4"].nunique() == 1


def test_q18_threshold_and_q6_band(ray_session):
    from rayschema.queries import (q6_forecast_revenue,
                                   q18_large_volume_customers)

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    out18 = q18_large_volume_customers(sf, qty_threshold=150)
    want18 = con.sql(f"""
        WITH big AS (SELECT l_orderkey,
                            CAST(sum(l_quantity) AS BIGINT) AS sq
                     FROM read_parquet('{sf}/lineitem.parquet')
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        SELECT b.l_orderkey, b.sq FROM big b ORDER BY b.l_orderkey""").df()
    got = out18.sort_values("o_orderkey")
    assert got["o_orderkey"].tolist() == want18["l_orderkey"].tolist()
    assert got["sum_qty"].tolist() == want18["sq"].tolist()
    assert (got["sum_qty"] > 150).all()
    out6 = q6_forecast_revenue(sf)
    want6 = con.sql(f"""
        SELECT count(*),
               CAST(COALESCE(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                    * CAST(round(l_discount*100) AS BIGINT)), 0) AS BIGINT)
        FROM read_parquet('{sf}/lineitem.parquet')
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_quantity < 24
          AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7""") \
        .fetchone()
    assert int(out6["n_li"][0]) == want6[0] and want6[0] > 0
    assert int(out6["revenue_e6"][0]) == want6[1]


def test_out_of_order_events_planted(ray_session, tmp_path):
    from rayschema.queries import out_of_order_events

    # user 1: arrival order (by event_id) has ts 10, 30, 20, 25, 40:
    #   e2 (20 < 30) late by 10us, e3 (25 < 30) late by 5us -> n_late 2
    # user 2: strictly increasing -> 0 late
    base = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame({
        "event_id": np.array([1, 2, 3, 4, 5, 6, 7], dtype=np.int64),
        "ts": [base + pd.Timedelta(microseconds=u)
               for u in [10, 30, 20, 25, 40, 100, 200]],
        "user_id": np.array([1, 1, 1, 1, 1, 2, 2], dtype=np.int64),
        "event_type": ["view"] * 7, "value": np.ones(7),
        "props": ["{}"] * 7})
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    out = out_of_order_events(str(tmp_path)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert out["user_id"].tolist() == [1, 2]
    assert out["n_events"].tolist() == [5, 2]
    assert out["n_late"].tolist() == [2, 0]
    assert out["max_disorder_us"].tolist() == [10, 0]


def test_sliding_distinct_users_dedups_across_hours(ray_session, tmp_path):
    from rayschema.queries import sliding_distinct_users

    # user 1 active at hours 0 and 1 -> the hour-1 window must count them
    # ONCE (a rolling sum of hourly distincts would say 2); user 2 only at
    # hour 0; hour 30 is outside every earlier 24h window.
    base = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame({
        "event_id": np.arange(5, dtype=np.int64),
        "ts": [base, base, base + pd.Timedelta(hours=1),
               base + pd.Timedelta(hours=1, minutes=30),
               base + pd.Timedelta(hours=30)],
        "user_id": np.array([1, 2, 1, 1, 9], dtype=np.int64),
        "event_type": ["view"] * 5, "value": np.ones(5),
        "props": ["{}"] * 5})
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    out = sliding_distinct_users(str(tmp_path))
    got = dict(zip(out["hour_ts"], out["n_users"]))
    assert got[base] == 2                                  # users {1,2}
    assert got[base + pd.Timedelta(hours=1)] == 2          # still {1,2}
    assert got[base + pd.Timedelta(hours=30)] == 1         # {9} only
    assert len(out) == 3                # only observed hours emit windows


def test_concat_ranges_kernel():
    from rayschema.queries import _concat_ranges

    assert _concat_ranges(np.array([3, 1, 2])).tolist() == [0, 1, 2, 0,
                                                            0, 1]
    assert _concat_ranges(np.array([], dtype=np.int64)).tolist() == []
    assert _concat_ranges(np.array([1])).tolist() == [0]


def test_orc_feather_roundtrip_preserve_unicode(ray_session, tmp_path):
    from rayschema.sources import detect_format, read_corpus, write_corpus

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "lang": ["en", "de", "zh", "en"],
        "text": ["plain", "straße", "世界 你好", None]})
    import ray.data as rd
    ds = rd.from_pandas(df)
    for fmt, ext in (("orc", "orc"), ("feather", "feather")):
        out = os.path.join(tmp_path, fmt)
        write_corpus(ds, out, fmt=fmt)
        assert detect_format(out) == fmt
        back = read_corpus(out).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert back["text"].tolist()[:3] == df["text"].tolist()[:3]
        assert pd.isna(back["text"][3])
        assert back["lang"].tolist() == df["lang"].tolist()


def test_bigram_lm_perplexity_hand_case(ray_session, tmp_path):
    """Corpus 'a b a b' + 'a b c' + 'solo': V=4 (the single-word doc
    still feeds the vocabulary), cab(a,b)=3 cab(b,a)=1 cab(b,c)=1,
    ca(a)=3 ca(b)=2; per-position millibit costs verified against the
    closed form; single-word and null docs emit no score row."""
    from rayschema.queries import bigram_lm_perplexity

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a b a b", "a b c", "solo", None],
        "lang": ["en"] * 4, "source": ["src1"] * 4,
        "n_chars": np.array([7, 5, 4, 0], dtype=np.int64)})
    sf = _write_docs(tmp_path, df)
    out = bigram_lm_perplexity(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    def mb(ca, cab, v=4):
        return int(np.floor(1000.0 * (np.log2(float(ca + v))
                                      - np.log2(float(cab + 1)))))

    c_ab, c_ba, c_bc = mb(3, 3), mb(2, 1), mb(2, 1)
    assert list(out["doc_id"]) == [0, 1]
    assert list(out["n_bigrams"]) == [3, 2]
    assert out["cost_mbits"][0] == c_ab + c_ba + c_ab
    assert out["cost_mbits"][1] == c_ab + c_bc


def test_corr_quantity_price_planted(ray_session, tmp_path):
    """Perfect linear -> +-1000000 ppm exactly (integer-friendly values
    make the sqrt exact); zero x-variance -> corr_ppm 0."""
    from rayschema.queries import corr_quantity_price

    t = pa.table({
        "l_returnflag": pa.array(["A"] * 3 + ["N"] * 3 + ["R"] * 3),
        "l_quantity": pa.array([1.0, 2.0, 3.0, 1.0, 2.0, 3.0,
                                5.0, 5.0, 5.0]),
        "l_extendedprice": pa.array([100.0, 200.0, 300.0,
                                     300.0, 200.0, 100.0,
                                     10.0, 20.0, 30.0])})
    pq.write_table(t, os.path.join(tmp_path, "lineitem.parquet"))
    out = corr_quantity_price(str(tmp_path))
    got = dict(zip(out["l_returnflag"], out["corr_ppm"]))
    assert got == {"A": 1000000, "N": -1000000, "R": 0}
    a = out[out["l_returnflag"] == "A"].iloc[0]
    assert (a["n"], a["sum_x"], a["sum_y"], a["sum_xy"],
            a["sum_x2"], a["sum_y2"]) == (3, 6, 600, 1400, 14, 140000)


def test_embedding_covariance_by_label_hand(ray_session, tmp_path):
    """2 labels, hand vectors: every grid cell is the exact integer
    product-sum of millionths-quantized components."""
    from tests.test_dedup_similarity import _write_emb

    from rayschema.queries import embedding_covariance_by_label

    sf = _write_emb(tmp_path, [0, 1, 2],
                    [[0.5, -0.25], [0.5, 0.25], [1.0, 0.0]],
                    [7, 7, 9])
    out = embedding_covariance_by_label(sf).to_pandas() \
        .sort_values(["label", "d1", "d2"]).reset_index(drop=True)
    q = np.array([[500000, -250000], [500000, 250000],
                  [1000000, 0]], dtype=np.int64)
    m7 = q[:2].T @ q[:2]
    m9 = q[2:].T @ q[2:]
    assert len(out) == 8
    for (lab, mat, n) in ((7, m7, 2), (9, m9, 1)):
        sub = out[out["label"] == lab]
        assert list(sub["n_vecs"]) == [n] * 4
        got = sub.sort_values(["d1", "d2"])["s_q12"] \
            .to_numpy(np.int64).reshape(2, 2)
        assert (got == mat).all()


def test_pca_project_dominant_direction(ray_session, tmp_path):
    """Variance planted on one axis: the power-iteration direction locks
    onto it, so projections are monotone in that coordinate and the
    orthogonal noise axis contributes ~nothing; output is deterministic
    across runs."""
    from tests.test_dedup_similarity import _write_emb

    from rayschema.queries import pca_project_embeddings

    rng = np.random.RandomState(11)
    n = 40
    vecs = np.zeros((n, 8))
    vecs[:, 3] = np.linspace(-1.0, 1.0, n)          # dominant axis
    vecs[:, 6] = rng.uniform(-0.01, 0.01, n)        # tiny noise
    sf = _write_emb(tmp_path, np.arange(n), vecs, np.zeros(n))
    out = pca_project_embeddings(sf).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    proj = out["pc1_q"].to_numpy(np.int64)
    sign = 1 if proj[-1] > proj[0] else -1
    assert (np.diff(sign * proj) > 0).all()         # monotone in axis 3
    out2 = pca_project_embeddings(sf).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert (out2["pc1_q"].to_numpy(np.int64) == proj).all()


def test_events_props_extract_fallback_paths(ray_session, tmp_path):
    """Flat ints ride the regex fast path; nested / float / string /
    missing-key / null docs hit the exact json.loads fallback and are
    classified exactly like the DuckDB oracle."""
    from rayschema.queries import events_props_extract

    props = ['{"k": 5}', '{"k": -3}',            # fast path
             ' { "k" :  7 , "z": 1 } ',          # flat but multi-key
             '{"k": 1.5}',                       # float -> missing
             '{"k": "x"}',                       # string -> missing
             '{"z": 2}',                         # absent -> missing
             None,                               # null doc -> missing
             '{"k": true}']                      # bool -> missing
    t = pa.table({
        "event_id": pa.array(np.arange(8, dtype=np.int64)),
        "ts": pa.array([pd.Timestamp("2024-01-01")] * 8),
        "user_id": pa.array(np.zeros(8, dtype=np.int64)),
        "event_type": pa.array(["view"] * 8),
        "value": pa.array(np.ones(8)),
        "props": pa.array(props, type=pa.string())})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = events_props_extract(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_events"], r["sum_k"], r["min_k"], r["max_k"],
            r["n_missing"]) == (8, 9, -3, 7, 5)


def test_user_hourly_locf_hand_case(ray_session, tmp_path):
    """Gaps forward-fill from the last observed hour; an hour's value is
    its LAST event by (ts, event_id); users never leak into each other."""
    from rayschema.queries import user_hourly_locf

    h = 3_600_000_000  # us
    ts = [1 * h, 1 * h + 5, 4 * h,          # user 1: hours 1,1,4
          7 * h]                            # user 2: hour 7
    t = pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
        "user_id": pa.array(np.array([1, 1, 1, 2], dtype=np.int64)),
        "event_type": pa.array(["view"] * 4),
        "value": pa.array([10.0, 11.0, 40.0, 70.0]),
        "props": pa.array(['{}'] * 4)})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = user_hourly_locf(str(tmp_path)).to_pandas() \
        .sort_values(["user_id", "hour_bucket"]).reset_index(drop=True)
    assert list(out["user_id"]) == [1, 1, 1, 1, 2]
    assert list(out["hour_bucket"]) == [1, 2, 3, 4, 7]
    # hour 1 takes the LATER event (ts 1h+5us -> 11.00)
    assert list(out["value_cents"]) == [1100, 1100, 1100, 4000, 7000]
    assert list(out["is_observed"]) == [1, 0, 0, 1, 1]


def test_perplexity_bucket_filter_per_lang_quartile(ray_session,
                                                    tmp_path):
    """Each language keeps exactly its own best-quartile mass (value-
    cutoff semantics): repeated docs make the cutoff land mid-value and
    every doc at the cutoff value survives."""
    from rayschema.queries import perplexity_bucket_filter

    # 8 'en' docs: 4 identical low-cost, 4 distinct high-cost;
    # 4 'de' docs: all identical -> everything ties at the cutoff
    texts_en = ["a b a b"] * 4 + ["q w e r t y u i o p %d" % i
                                  for i in range(4)]
    texts_de = ["x y x y"] * 4
    df = pd.DataFrame({
        "doc_id": np.arange(12, dtype=np.int64),
        "text": texts_en + texts_de,
        "lang": ["en"] * 8 + ["de"] * 4,
        "source": ["src1"] * 12,
        "n_chars": np.full(12, 7, dtype=np.int64)})
    sf = _write_docs(tmp_path, df)
    out = perplexity_bucket_filter(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    en = out[out["lang"] == "en"]
    de = out[out["lang"] == "de"]
    # en cutoff = the low-cost value (rank ceil(8/4)=2 of 8) -> the 4
    # identical cheap docs all pass, none of the distinct junk does
    assert list(en["doc_id"]) == [0, 1, 2, 3]
    # de: all docs share one value -> all at the cutoff survive
    assert list(de["doc_id"]) == [8, 9, 10, 11]


def test_orders_reconciliation_audit_hand_case(ray_session, tmp_path):
    """A perfectly reconciled order, a mismatched one, and one with no
    line items are classified separately with exact e6 diffs."""
    from rayschema.queries import orders_reconciliation_audit

    li = pa.table({
        "l_orderkey": pa.array(np.array([1, 1, 2], dtype=np.int64)),
        "l_extendedprice": pa.array([100.0, 50.0, 10.0]),
        "l_discount": pa.array([0.0, 0.10, 0.0]),
        "l_tax": pa.array([0.0, 0.0, 0.05])})
    # order 1 true total: 100 + 50*0.9 = 145.00; order 2: 10*1.05=10.50
    od = pa.table({
        "o_orderkey": pa.array(np.array([1, 2, 3], dtype=np.int64)),
        "o_orderstatus": pa.array(["F", "F", "O"]),
        "o_totalprice": pa.array([145.0, 11.0, 20.0])})
    pq.write_table(li, os.path.join(tmp_path, "lineitem.parquet"))
    pq.write_table(od, os.path.join(tmp_path, "orders.parquet"))
    out = orders_reconciliation_audit(str(tmp_path)) \
        .sort_values("o_orderstatus").reset_index(drop=True)
    f = out[out["o_orderstatus"] == "F"].iloc[0]
    o = out[out["o_orderstatus"] == "O"].iloc[0]
    # F: order1 reconciles, order2 off by 0.50 = 50 cents x 1e4
    assert (f["n_orders"], f["n_no_lineitems"], f["n_mismatched"],
            f["sum_absdiff_e6"]) == (2, 0, 1, 500_000)
    # O: no line items -> whole 20.00 total unreconciled
    assert (o["n_orders"], o["n_no_lineitems"], o["n_mismatched"],
            o["sum_absdiff_e6"]) == (1, 1, 1, 20_000_000)


def test_throttled_events_debounce_semantics(ray_session, tmp_path):
    """Lag semantics: each event compares to its immediate predecessor,
    so a burst inside one hour keeps only its first event, and a
    predecessor inside the window suppresses even if the LAST KEPT
    event is over an hour back."""
    from rayschema.queries import throttled_events

    MIN = 60_000_000
    ts = [0, 30 * MIN, 70 * MIN,       # u1/view: keep, drop, drop (chain)
          0, 61 * MIN,                 # u1/click: keep, keep
          0]                           # u2/view: keep
    t = pa.table({
        "event_id": pa.array(np.arange(6, dtype=np.int64)),
        "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
        "user_id": pa.array(np.array([1, 1, 1, 1, 1, 2],
                                     dtype=np.int64)),
        "event_type": pa.array(["view", "view", "view",
                                "click", "click", "view"]),
        "value": pa.array(np.ones(6)),
        "props": pa.array(['{}'] * 6)})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = throttled_events(str(tmp_path)).to_pandas() \
        .sort_values(["user_id", "event_type"]).reset_index(drop=True)
    rows = {(r["user_id"], r["event_type"]): (r["n_events"], r["n_kept"])
            for _, r in out.iterrows()}
    # u1/view: 70min event is only 40min after its (dropped) predecessor
    assert rows[(1, "view")] == (3, 1)
    assert rows[(1, "click")] == (2, 2)
    assert rows[(2, "view")] == (1, 1)


def test_value_median_interp_hand_case(ray_session, tmp_path):
    """Even group -> med2 = sum of the two middles (half-cent exact);
    odd group -> med2 = 2x the middle."""
    from rayschema.queries import value_median_interp_by_type

    t = pa.table({
        "event_id": pa.array(np.arange(7, dtype=np.int64)),
        "ts": pa.array(np.zeros(7, dtype="datetime64[us]")),
        "user_id": pa.array(np.zeros(7, dtype=np.int64)),
        "event_type": pa.array(["a"] * 4 + ["b"] * 3),
        "value": pa.array([1.0, 2.0, 3.0, 10.0, 5.0, 6.0, 7.0]),
        "props": pa.array(['{}'] * 7)})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = value_median_interp_by_type(str(tmp_path))
    got = {r["event_type"]: (r["n"], r["med2_cents"])
           for _, r in out.iterrows()}
    assert got == {"a": (4, 500), "b": (3, 1200)}


def test_psi_value_drift_identity_and_shift(ray_session, tmp_path):
    """A single type IS the global distribution -> every smoothed
    contribution is exactly zero; a second, disjointly-shifted type
    drifts positive on its own buckets."""
    from rayschema.queries import psi_value_drift

    def write(vals, types, path):
        n = len(vals)
        t = pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.zeros(n, dtype="datetime64[us]")),
            "user_id": pa.array(np.zeros(n, dtype=np.int64)),
            "event_type": pa.array(types),
            "value": pa.array(vals),
            "props": pa.array(['{}'] * n)})
        pq.write_table(t, os.path.join(path, "events.parquet"))

    write([1.0, 5.0, 9.0, 2.0], ["x"] * 4, tmp_path)
    out = psi_value_drift(str(tmp_path))
    assert (out["psi_contrib_micro"] == 0).all()

    # type 'hi' lives in bucket 39 (10000 cents >> 8), 'lo' in bucket 0
    write([1.0] * 8 + [100.0] * 8,
          ["lo"] * 8 + ["hi"] * 8, tmp_path)
    out = psi_value_drift(str(tmp_path)).set_index(
        ["event_type", "bucket"])
    assert out.loc[("hi", 39), "psi_contrib_micro"] > 0   # overrepresented
    assert out.loc[("hi", 0), "psi_contrib_micro"] > 0    # underrepresented
    assert out.loc[("lo", 39), "psi_contrib_micro"] > 0


def test_pmi_top_pairs_hand_case(ray_session, tmp_path):
    """Exclusive collocation beats a promiscuous pair; the min-count
    floor drops rare pairs entirely."""
    from rayschema.queries import pmi_top_pairs

    # 'q r' occurs 5x and q/r occur nowhere else -> max PMI;
    # 'a b' occurs 5x but a and b also pair with much else;
    # 'z z' occurs once -> under the count floor
    texts = (["q r"] * 5 + ["a b"] * 5
             + ["a c a d a e a f a g"] * 3 + ["h b i b j b k b"] * 3
             + ["z z"])
    df = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts, "lang": ["en"] * len(texts),
        "source": ["src1"] * len(texts),
        "n_chars": np.full(len(texts), 3, dtype=np.int64)})
    sf = _write_docs(tmp_path, df)
    out = pmi_top_pairs(sf)
    assert list(out.iloc[0][["w1", "w2"]]) == ["q", "r"]
    pairs = set(zip(out["w1"], out["w2"]))
    assert ("z", "z") not in pairs
    qr = out[(out["w1"] == "q") & (out["w2"] == "r")].iloc[0]
    ab = out[(out["w1"] == "a") & (out["w2"] == "b")].iloc[0]
    assert qr["pmi_mbits"] > ab["pmi_mbits"]


def test_normalized_exact_dedup_planted(ray_session, tmp_path):
    """Case/digit/punctuation/extra-space variants collapse to one kept
    doc (min id); genuinely different text survives."""
    from rayschema.queries import normalized_exact_dedup

    texts = ["Hello,  World! 42",      # id 0 -> "hello world"
             "hello world",            # id 1 -> dup of 0
             "HELLO... woRLD 7",       # id 2 -> dup of 0
             "goodbye world",          # id 3 -> unique
             "hello  worlds"]          # id 4 -> "hello worlds" unique
    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64), "text": texts,
        "lang": ["en"] * 5, "source": ["s"] * 5,
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    kept = sorted(normalized_exact_dedup(str(tmp_path))
                  .to_pandas()["doc_id"].tolist())
    assert kept == [0, 3, 4]


def test_winsorize_events_planted(ray_session, tmp_path):
    """percentile_disc rule: with n=20 values 1..20 cents, p5 = rank-1
    value (cum>=1) = 1, p95 = rank-19 value = 19; sum clips only the
    top value (20 -> 19)."""
    from rayschema.queries import winsorize_events

    vals = np.arange(1, 21, dtype=np.float64) / 100.0
    t = pa.table({
        "event_id": pa.array(np.arange(20, dtype=np.int64)),
        "ts": pa.array(np.zeros(20, dtype="datetime64[us]")),
        "user_id": pa.array(np.ones(20, dtype=np.int64)),
        "event_type": pa.array(["view"] * 20),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * 20)})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = winsorize_events(str(tmp_path))
    r = out.iloc[0]
    assert (r["n"], r["lo_cents"], r["hi_cents"]) == (20, 1, 19)
    assert r["sum_clipped_cents"] == sum(range(1, 21)) - 1


def test_token_fertility_planted(ray_session, tmp_path):
    """'a b' = 2 words; 'a, b!' = 2 words but 4 bpeish tokens
    (a , b !) -> fertility 6/4 words = 1.5e6 ppm."""
    from rayschema.queries import token_fertility_by_lang

    df = pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": ["a b", "a, b!"],
        "lang": ["en", "en"], "source": ["s", "s"],
        "n_chars": np.array([3, 5], dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    out = token_fertility_by_lang(str(tmp_path))
    r = out.iloc[0]
    assert (r["n_docs"], r["sum_words"], r["sum_bpe"]) == (2, 4, 6)
    assert r["fertility_ppm"] == 1_500_000


def test_curriculum_bins_planted(ray_session, tmp_path):
    """n=10, k=4 -> NTILE buckets of 3,3,2,2; all-tied token counts
    split across bins purely by count."""
    from rayschema.queries import curriculum_bins

    texts = ["w"] * 10                     # every doc = 1 token
    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64), "text": texts,
        "lang": ["en"] * 10, "source": ["s"] * 10,
        "n_chars": np.ones(10, dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    out = curriculum_bins(str(tmp_path)).sort_values("bin")
    assert out["n_docs"].tolist() == [3, 3, 2, 2]
    assert out["sum_tokens"].tolist() == [3, 3, 2, 2]


def test_ols_planted_slopes(ray_session, tmp_path):
    """A perfect +2-cents/hour line gives slope_ppm exactly 2e6; the
    mirrored series gives -2e6 (explicit-sign floor division)."""
    from rayschema.queries import ols_value_on_hour

    H = 3_600_000_000
    ts = np.array([i * H for i in range(5)] * 2, dtype="datetime64[us]")
    up = [0.02 * i for i in range(5)]
    dn = [0.02 * (4 - i) for i in range(5)]
    t = pa.table({
        "event_id": pa.array(np.arange(10, dtype=np.int64)),
        "ts": pa.array(ts),
        "user_id": pa.array(np.ones(10, dtype=np.int64)),
        "event_type": pa.array(["up"] * 5 + ["down"] * 5),
        "value": pa.array(up + dn),
        "props": pa.array(["{}"] * 10)})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = ols_value_on_hour(str(tmp_path)).set_index("event_type")
    assert out.loc["up", "slope_ppm"] == 2_000_000
    assert out.loc["down", "slope_ppm"] == -2_000_000


def test_label_conflict_audit_planted(ray_session, tmp_path):
    """Identical text under two langs is flagged (all member docs);
    duplicates within ONE lang are not."""
    from rayschema.queries import label_conflict_audit

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["same text here", "same text here", "same text here",
                 "dup one lang", "dup one lang", "unique"],
        "lang": ["en", "de", "en", "fr", "fr", "es"],
        "source": ["s"] * 6,
        "n_chars": np.array([14, 14, 14, 12, 12, 6], dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    out = label_conflict_audit(str(tmp_path))
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["lang"].tolist() == ["en", "de", "en"]


def test_ab_test_value_audit_planted(ray_session, tmp_path):
    """Arm A (pre-cutoff) all 1.00, arm B (post) all 3.00 with one 5.00:
    exact moments and a hand-computed Welch t^2."""
    from rayschema.queries import AB_CUTOFF_US, ab_test_value_audit

    pre = AB_CUTOFF_US - 10_000_000
    post = AB_CUTOFF_US + 10_000_000
    ts = np.array([pre] * 3 + [post] * 3, dtype="datetime64[us]")
    vals = [1.0, 1.0, 1.0, 3.0, 3.0, 5.0]
    t = pa.table({
        "event_id": pa.array(np.arange(6, dtype=np.int64)),
        "ts": pa.array(ts),
        "user_id": pa.array(np.ones(6, dtype=np.int64)),
        "event_type": pa.array(["view"] * 6),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * 6)})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = ab_test_value_audit(str(tmp_path)).iloc[0]
    assert (out["n_a"], out["sum_a"], out["n_b"], out["sum_b"]) \
        == (3, 300, 3, 1100)
    # ma=100, mb=1100/3; va=0, vb=430000/3 - (1100/3)^2 -> t2 = 24
    ma, mb = 100.0, 1100.0 / 3
    vb = 430000.0 / 3 - mb * mb
    want = (ma - mb) ** 2 / (0.0 / 3 + vb / 3)
    assert abs(out["t2"] - want) < 1e-6


def test_inter_event_gap_quantiles_planted(ray_session, tmp_path):
    """Two users with known gaps; cross-user boundaries contribute no
    gap; quantiles follow the percentile_disc rule."""
    from rayschema.queries import inter_event_gap_quantiles

    S = 1_000_000
    # user 1 at t=0,10s,30s -> gaps 10,20 ; user 2 at t=0,5s -> gap 5
    ts = np.array([0, 10 * S, 30 * S, 0, 5 * S], dtype="datetime64[us]")
    t = pa.table({
        "event_id": pa.array(np.arange(5, dtype=np.int64)),
        "ts": pa.array(ts),
        "user_id": pa.array(np.array([1, 1, 1, 2, 2], dtype=np.int64)),
        "event_type": pa.array(["view"] * 5),
        "value": pa.array(np.ones(5)),
        "props": pa.array(["{}"] * 5)})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = inter_event_gap_quantiles(str(tmp_path)).iloc[0]
    # gaps sorted: 5,10,20 ; p50 -> cum>=1.5 -> 10 ; p90/p99 -> 20
    assert (out["n_gaps"], out["p50_s"], out["p90_s"], out["p99_s"]) \
        == (3, 10, 20, 20)


def test_last_touch_attribution_planted(ray_session, tmp_path):
    """Purchase credits the LATEST prior view/click within 1 h; an
    out-of-window touch or another user's touch yields 'none'; lag
    semantics (a touch at the same row order position before counts,
    the purchase itself never does)."""
    from rayschema.queries import last_touch_attribution

    M = 60_000_000
    rows = [
        # user 1: view @0, click @10m, purchase @30m -> click
        (1, "view", 0), (1, "click", 10 * M), (1, "purchase", 30 * M),
        # user 1: purchase @200m -> last touch click@10m is stale -> none
        (1, "purchase", 200 * M),
        # user 2: purchase @5m with no touch -> none (user 1's don't leak)
        (2, "purchase", 5 * M),
        # user 3: view @0, purchase @60m exactly -> view (<= window)
        (3, "view", 0), (3, "purchase", 60 * M),
    ]
    t = pa.table({
        "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "ts": pa.array(np.array([r[2] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array(np.array([r[0] for r in rows],
                                     dtype=np.int64)),
        "event_type": pa.array([r[1] for r in rows]),
        "value": pa.array(np.ones(len(rows))),
        "props": pa.array(["{}"] * len(rows))})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = last_touch_attribution(str(tmp_path)).set_index("attributed")
    assert out.loc["click", "n_purchases"] == 1
    assert out.loc["view", "n_purchases"] == 1
    assert out.loc["none", "n_purchases"] == 2


def test_k_anonymity_audit_planted(ray_session, tmp_path):
    """Cells with >= 5 members pass; smaller cells are flagged with
    their exact counts and bucket = n_chars // 100."""
    from rayschema.queries import k_anonymity_audit

    nch = [50] * 5 + [150] * 2 + [250]
    df = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": ["x" * 60] * 8,
        "lang": ["en"] * 8,
        "source": ["s1"] * 7 + ["s2"],
        "n_chars": np.array(nch, dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    out = k_anonymity_audit(str(tmp_path))
    # (en,s1,0) has 5 -> safe; (en,s1,1)=2 and (en,s2,2)=1 flagged
    assert [tuple(r) for r in out.itertuples(index=False)] \
        == [("en", "s1", 1, 2), ("en", "s2", 2, 1)]


def test_suggest_constraints_planted(ray_session, tmp_path):
    """Observed bounds, shortest text, and sorted low-cardinality enum
    lists come out exactly; a high-cardinality column would be dropped
    (cap is module-level, exercised via the enum list ordering here)."""
    from rayschema.queries import suggest_constraints_documents

    df = pd.DataFrame({
        "doc_id": np.array([7, 3, 9], dtype=np.int64),
        "text": ["abcdef", "xy", "hello"],
        "lang": ["fr", "en", "fr"],
        "source": ["s2", "s1", "s2"],
        "n_chars": np.array([6, 2, 5], dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    out = suggest_constraints_documents(str(tmp_path))
    got = {(r.column_name, r.keyword): r.value
           for r in out.itertuples(index=False)}
    assert got[("doc_id", "minimum")] == "3"
    assert got[("doc_id", "maximum")] == "9"
    assert got[("n_chars", "minimum")] == "2"
    assert got[("n_chars", "maximum")] == "6"
    assert got[("text", "minLength")] == "2"
    assert got[("lang", "enum")] == "en,fr"
    assert got[("source", "enum")] == "s1,s2"


def test_curriculum_bins_random_cross_check(ray_session, tmp_path):
    """120 docs with heavy token-count ties vs a brute-force NTILE
    emulation (rank-split with the first-(n%4)-buckets-larger rule)."""
    from rayschema.queries import curriculum_bins

    rng = np.random.RandomState(7)
    n = 120
    toks = rng.randint(1, 6, n)           # 1..5 tokens, many ties
    texts = [" ".join(["w"] * int(t)) for t in toks]
    srcs = [f"s{i % 3}" for i in range(n)]
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64), "text": texts,
        "lang": ["en"] * n, "source": srcs,
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    out = curriculum_bins(str(tmp_path))

    ref_rows = {}
    for src in sorted(set(srcs)):
        sub = df[df["source"] == src].sort_values(["doc_id"])
        tt = np.sort(sub["text"].str.count(" ").to_numpy() + 1)
        m = len(tt)
        q, r = divmod(m, 4)
        pos = 0
        for b in range(1, 5):
            size = q + (1 if b <= r else 0)
            if size:
                ref_rows[(src, b)] = (size, int(tt[pos:pos + size].sum()))
            pos += size
    got = {(r.source, r.bin): (r.n_docs, r.sum_tokens)
           for r in out.itertuples(index=False)}
    assert got == ref_rows


def test_winsorize_random_cross_check(ray_session, tmp_path):
    """300 random cent values vs a brute-force percentile_disc +
    clip reference."""
    from rayschema.queries import winsorize_events

    rng = np.random.RandomState(11)
    cents = rng.randint(-50, 5000, 300)
    t = pa.table({
        "event_id": pa.array(np.arange(300, dtype=np.int64)),
        "ts": pa.array(np.zeros(300, dtype="datetime64[us]")),
        "user_id": pa.array(np.ones(300, dtype=np.int64)),
        "event_type": pa.array(["view"] * 300),
        "value": pa.array(cents / 100.0),
        "props": pa.array(["{}"] * 300)})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = winsorize_events(str(tmp_path)).iloc[0]
    s = np.sort(np.round(cents / 100.0 * 100).astype(np.int64))
    n = len(s)

    def pdisc(q):
        # smallest value with cum >= q*n, cum = 1-based rank
        k = int(np.ceil(q * n))
        return int(s[max(k - 1, 0)])

    lo, hi = pdisc(0.05), pdisc(0.95)
    assert (out["lo_cents"], out["hi_cents"]) == (lo, hi)
    assert out["sum_clipped_cents"] == int(np.clip(s, lo, hi).sum())


def test_last_touch_random_cross_check(ray_session, tmp_path):
    """400 random events over 20 users vs a per-user Python scan
    reference (same (ts, event_id) ordering and 1 h window)."""
    from rayschema.queries import ATTRIB_WINDOW_US, last_touch_attribution

    rng = np.random.RandomState(3)
    n = 400
    users = rng.randint(1, 21, n).astype(np.int64)
    ts_us = rng.randint(0, 10 * 3_600_000_000, n).astype(np.int64)
    types = np.array(["view", "click", "purchase", "error"])[
        rng.randint(0, 4, n)]
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts_us.astype("datetime64[us]")),
        "user_id": pa.array(users),
        "event_type": pa.array(types),
        "value": pa.array(np.ones(n)),
        "props": pa.array(["{}"] * n)})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = last_touch_attribution(str(tmp_path)).set_index("attributed")

    ref = {"none": 0, "view": 0, "click": 0}
    df = pd.DataFrame({"u": users, "ts": ts_us, "ty": types,
                       "eid": np.arange(n)})
    for _, g in df.groupby("u"):
        g = g.sort_values(["ts", "eid"])
        last = None          # (type, ts)
        for _, r in g.iterrows():
            if r["ty"] == "purchase":
                if last is not None and \
                        r["ts"] - last[1] <= ATTRIB_WINDOW_US:
                    ref[last[0]] += 1
                else:
                    ref["none"] += 1
            if r["ty"] in ("view", "click"):
                last = (r["ty"], r["ts"])
    got = {k: 0 for k in ref}
    for k, v in out["n_purchases"].items():
        got[k] = int(v)
    assert got == ref


def test_gap_quantiles_random_cross_check(ray_session, tmp_path):
    """500 random events over 10 users vs numpy reference gaps +
    percentile_disc rule."""
    from rayschema.queries import inter_event_gap_quantiles

    rng = np.random.RandomState(5)
    n = 500
    users = rng.randint(1, 11, n).astype(np.int64)
    ts_us = rng.randint(0, 3_600_000_000, n).astype(np.int64)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts_us.astype("datetime64[us]")),
        "user_id": pa.array(users),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(np.ones(n)),
        "props": pa.array(["{}"] * n)})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = inter_event_gap_quantiles(str(tmp_path)).iloc[0]

    gaps = []
    df = pd.DataFrame({"u": users, "ts": ts_us,
                       "eid": np.arange(n)})
    for _, g in df.groupby("u"):
        tt = g.sort_values(["ts", "eid"])["ts"].to_numpy()
        gaps.extend(((tt[1:] - tt[:-1]) // 1_000_000).tolist())
    s = np.sort(np.array(gaps, dtype=np.int64))
    m = len(s)

    def pdisc(q):
        return int(s[max(int(np.ceil(q * m)) - 1, 0)])

    assert out["n_gaps"] == m
    assert (out["p50_s"], out["p90_s"], out["p99_s"]) \
        == (pdisc(0.50), pdisc(0.90), pdisc(0.99))


def test_value_mode_by_type_planted(ray_session, tmp_path):
    """Tie between two equally-frequent values resolves to the SMALLER
    cents value; totals are exact."""
    from rayschema.queries import value_mode_by_type

    vals = [2.0, 2.0, 1.0, 1.0, 3.0]     # 200 and 100 tie -> 100 wins
    t = pa.table({
        "event_id": pa.array(np.arange(5, dtype=np.int64)),
        "ts": pa.array(np.zeros(5, dtype="datetime64[us]")),
        "user_id": pa.array(np.ones(5, dtype=np.int64)),
        "event_type": pa.array(["view"] * 5),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * 5)})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = value_mode_by_type(str(tmp_path)).iloc[0]
    assert (out["mode_cents"], out["n_mode"], out["n_total"]) \
        == (100, 2, 5)


def test_session_path_trigrams_planted(ray_session, tmp_path):
    """Trigrams never cross user boundaries; counts and the
    (count desc, lexicographic) ranking are exact."""
    from rayschema.queries import session_path_trigrams

    # user 1: v,c,p,v,c,p -> trigrams vcp,cpv,pvc,vcp ; user 2: v,c,p
    seq1 = ["view", "click", "purchase", "view", "click", "purchase"]
    seq2 = ["view", "click", "purchase"]
    types = seq1 + seq2
    users = [1] * 6 + [2] * 3
    t = pa.table({
        "event_id": pa.array(np.arange(9, dtype=np.int64)),
        "ts": pa.array(np.arange(9, dtype=np.int64)
                       .astype("datetime64[us]")),
        "user_id": pa.array(np.array(users, dtype=np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(np.ones(9)),
        "props": pa.array(["{}"] * 9)})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = session_path_trigrams(str(tmp_path))
    got = {(r.t1, r.t2, r.t3): r.cnt for r in out.itertuples(index=False)}
    assert got == {("view", "click", "purchase"): 3,
                   ("click", "purchase", "view"): 1,
                   ("purchase", "view", "click"): 1}
    assert out.iloc[0]["cnt"] == 3


def test_order_fulfillment_latency_planted(ray_session, tmp_path):
    """Hand case: delays 1,2,3,100 days for one priority -> p50=2
    (cum>=2 at value 2), p90=100 (cum>=3.6 -> rank-4 value), max=100;
    orphan lineitems (no order) drop like the inner join."""
    from rayschema.queries import order_fulfillment_latency

    D = 86_400_000_000
    orders = pa.table({
        "o_orderkey": pa.array(np.array([1, 2, 3, 4], dtype=np.int64)),
        "o_custkey": pa.array(np.ones(4, dtype=np.int64)),
        "o_orderstatus": pa.array(["F"] * 4),
        "o_totalprice": pa.array(np.ones(4)),
        "o_orderdate": pa.array(np.zeros(4, dtype="datetime64[us]")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4)})
    li = pa.table({
        "l_orderkey": pa.array(np.array([1, 2, 3, 4, 99],
                                        dtype=np.int64)),
        "l_shipdate": pa.array(np.array([1 * D, 2 * D, 3 * D, 100 * D,
                                         5 * D]).astype("datetime64[us]"))})
    pq.write_table(orders, os.path.join(tmp_path, "orders.parquet"))
    pq.write_table(li, os.path.join(tmp_path, "lineitem.parquet"))
    out = order_fulfillment_latency(str(tmp_path)).iloc[0]
    assert (out["n"], out["p50_days"], out["p90_days"], out["max_days"]) \
        == (4, 2, 100, 100)


def test_event_transition_matrix_planted(ray_session, tmp_path):
    """v->c,c->v,v->c for user 1; user 2 contributes v->p; probabilities
    are exact floor-ppm of row totals and never cross users."""
    from rayschema.queries import event_transition_matrix

    types = ["view", "click", "view", "click", "view", "purchase"]
    users = [1, 1, 1, 1, 2, 2]
    t = pa.table({
        "event_id": pa.array(np.arange(6, dtype=np.int64)),
        "ts": pa.array(np.arange(6, dtype=np.int64)
                       .astype("datetime64[us]")),
        "user_id": pa.array(np.array(users, dtype=np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(np.ones(6)),
        "props": pa.array(["{}"] * 6)})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = event_transition_matrix(str(tmp_path))
    got = {(r.t1, r.t2): (r.n, r.p_ppm)
           for r in out.itertuples(index=False)}
    # view rows: v->c x2, v->p x1 -> totals 3
    assert got[("view", "click")] == (2, 666_666)
    assert got[("view", "purchase")] == (1, 333_333)
    assert got[("click", "view")] == (1, 1_000_000)


def test_revenue_pareto_share_planted(ray_session, tmp_path):
    """10 customers, one whale: top ceil(10/10)=1 customer holds
    1000/1900 of revenue -> share_ppm = 526315."""
    from rayschema.queries import revenue_pareto_share

    cust = np.arange(1, 11, dtype=np.int64)
    price = np.array([1000.0] + [100.0] * 9)
    t = pa.table({
        "o_orderkey": pa.array(cust),
        "o_custkey": pa.array(cust),
        "o_orderstatus": pa.array(["F"] * 10),
        "o_totalprice": pa.array(price),
        "o_orderdate": pa.array(np.zeros(10, dtype="datetime64[us]")),
        "o_orderpriority": pa.array(["1-URGENT"] * 10)})
    pq.write_table(t, os.path.join(tmp_path, "orders.parquet"))
    out = revenue_pareto_share(str(tmp_path)).iloc[0]
    assert (out["n_customers"], out["top_customers"]) == (10, 1)
    assert (out["top_cents"], out["total_cents"]) == (100000, 190000)
    assert out["share_ppm"] == (1_000_000 * 100000) // 190000


def test_langid_confusion_matrix_planted(ray_session, tmp_path):
    """An English doc labeled 'de' lands in the (de, en) off-diagonal
    cell; correct docs land on the diagonal."""
    from rayschema.queries import langid_confusion_matrix

    en = "the cat and the dog went to the house with it for a while"
    de = "der hund und die katze ist nicht ein tier mit auf von haus"
    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": [en, de, en],
        "lang": ["en", "de", "de"],       # third is mislabeled
        "source": ["s"] * 3,
        "n_chars": np.array([len(en), len(de), len(en)],
                            dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    out = langid_confusion_matrix(str(tmp_path))
    got = {(r.lang, r.lang_pred): r.n for r in out.itertuples(index=False)}
    assert got == {("en", "en"): 1, ("de", "de"): 1, ("de", "en"): 1}


def test_churned_users_planted(ray_session, tmp_path):
    """User 1's last event (a click) is 2 days before the corpus max ->
    churned under the 36 h window; user 2 is active; ties at the last
    timestamp resolve by event_id (highest wins)."""
    from rayschema.queries import churned_users_by_last_event

    D = 86_400_000_000
    rows = [(1, "view", 0), (1, "click", 8 * D),
            (2, "view", 10 * D), (2, "purchase", 10 * D)]
    t = pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "ts": pa.array(np.array([r[2] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array(np.array([r[0] for r in rows],
                                     dtype=np.int64)),
        "event_type": pa.array([r[1] for r in rows]),
        "value": pa.array(np.ones(4)),
        "props": pa.array(["{}"] * 4)})
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = churned_users_by_last_event(str(tmp_path))
    assert out["event_type"].tolist() == ["click"]
    assert out["n_churned"].tolist() == [1]


def test_dup_cluster_size_histogram_planted(ray_session, tmp_path):
    """3 singletons, one pair, one triple -> {(1,3),(2,1),(3,1)}."""
    from rayschema.queries import dup_cluster_size_histogram

    texts = ["a", "b", "c", "dd", "dd", "eee", "eee", "eee"]
    df = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64), "text": texts,
        "lang": ["en"] * 8, "source": ["s"] * 8,
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    out = dup_cluster_size_histogram(str(tmp_path))
    got = {int(r.group_size): int(r.n_groups)
           for r in out.itertuples(index=False)}
    assert got == {1: 3, 2: 1, 3: 1}


def _write(tmp_path, name, df):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, f"{name}.parquet"))


def test_q2_argmax_ties_and_eligibility(ray_session, tmp_path):
    from rayschema.queries import q2_best_supplier_per_part

    # part 1: suppliers 1 (bal 5.00) and 2 (bal 5.00) tie -> min suppkey;
    # part 2: only supplier 3 (non-ASIA) ships it -> dropped entirely;
    # part 3: size != 15 -> out of scope; duplicate pair rows collapse
    _write(tmp_path, "region", pd.DataFrame({
        "r_regionkey": np.array([0, 2], dtype=np.int64),
        "r_name": ["AFRICA", "ASIA"]}))
    _write(tmp_path, "nation", pd.DataFrame({
        "n_nationkey": np.array([0, 1], dtype=np.int64),
        "n_name": ["N_AF", "N_AS"],
        "n_regionkey": np.array([0, 2], dtype=np.int64)}))
    _write(tmp_path, "supplier", pd.DataFrame({
        "s_suppkey": np.array([1, 2, 3], dtype=np.int64),
        "s_nationkey": np.array([1, 1, 0], dtype=np.int64),
        "s_name": ["S1", "S2", "S3"],
        "s_acctbal": [5.0, 5.0, 99.0]}))
    _write(tmp_path, "part", pd.DataFrame({
        "p_partkey": np.array([1, 2, 3], dtype=np.int64),
        "p_size": np.array([15, 15, 7], dtype=np.int64)}))
    _write(tmp_path, "lineitem", pd.DataFrame({
        "l_partkey": np.array([1, 1, 1, 2, 3], dtype=np.int64),
        "l_suppkey": np.array([1, 1, 2, 3, 1], dtype=np.int64)}))
    out = q2_best_supplier_per_part(str(tmp_path))
    assert out["p_partkey"].tolist() == [1]
    assert out["s_suppkey"].tolist() == [1]        # tie -> min suppkey
    assert out["s_name"].tolist() == ["S1"]
    assert out["n_name"].tolist() == ["N_AS"]
    assert out["s_acctbal_cents"].tolist() == [500]


def test_q2_negative_balance_packs_correctly(ray_session, tmp_path):
    from rayschema.queries import q2_best_supplier_per_part

    # a negative balance must still beat a MORE negative one
    _write(tmp_path, "region", pd.DataFrame({
        "r_regionkey": np.array([2], dtype=np.int64),
        "r_name": ["ASIA"]}))
    _write(tmp_path, "nation", pd.DataFrame({
        "n_nationkey": np.array([0], dtype=np.int64),
        "n_name": ["N0"],
        "n_regionkey": np.array([2], dtype=np.int64)}))
    _write(tmp_path, "supplier", pd.DataFrame({
        "s_suppkey": np.array([1, 2], dtype=np.int64),
        "s_nationkey": np.array([0, 0], dtype=np.int64),
        "s_name": ["S1", "S2"],
        "s_acctbal": [-8.25, -2.50]}))
    _write(tmp_path, "part", pd.DataFrame({
        "p_partkey": np.array([1], dtype=np.int64),
        "p_size": np.array([15], dtype=np.int64)}))
    _write(tmp_path, "lineitem", pd.DataFrame({
        "l_partkey": np.array([1, 1], dtype=np.int64),
        "l_suppkey": np.array([1, 2], dtype=np.int64)}))
    out = q2_best_supplier_per_part(str(tmp_path))
    assert out["s_suppkey"].tolist() == [2]
    assert out["s_acctbal_cents"].tolist() == [-250]


def test_q9_widget_filter_and_year_groups(ray_session, tmp_path):
    from rayschema.queries import q9_profit_by_nation_year

    _write(tmp_path, "part", pd.DataFrame({
        "p_partkey": np.array([1, 2], dtype=np.int64),
        "p_name": ["red widget", "red bolt"]}))
    _write(tmp_path, "supplier", pd.DataFrame({
        "s_suppkey": np.array([1, 2], dtype=np.int64),
        "s_nationkey": np.array([0, 1], dtype=np.int64)}))
    _write(tmp_path, "nation", pd.DataFrame({
        "n_nationkey": np.array([0, 1], dtype=np.int64),
        "n_name": ["NA", "NB"]}))
    _write(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": np.array([10, 11], dtype=np.int64),
        "o_orderdate": pd.to_datetime(["1996-06-01", "1997-06-01"])}))
    _write(tmp_path, "lineitem", pd.DataFrame({
        "l_orderkey": np.array([10, 10, 11, 11], dtype=np.int64),
        "l_partkey": np.array([1, 2, 1, 1], dtype=np.int64),
        "l_suppkey": np.array([1, 1, 1, 2], dtype=np.int64),
        "l_extendedprice": [100.0, 999.0, 200.0, 300.0],
        "l_discount": [0.0, 0.0, 0.1, 0.0]}))
    out = q9_profit_by_nation_year(str(tmp_path))
    # bolt row excluded; (NA,1996)=100*1.0, (NA,1997)=200*0.9, (NB,1997)=300
    got = {(r.n_name, int(r.o_year)): int(r.profit_e4)
           for r in out.itertuples(index=False)}
    assert got == {("NA", 1996): 10000 * 100,
                   ("NA", 1997): 20000 * 90,
                   ("NB", 1997): 30000 * 100}


def test_q20_threshold_boundary_and_distinct(ray_session, tmp_path):
    from rayschema.queries import q20_heavy_shippers

    _write(tmp_path, "part", pd.DataFrame({
        "p_partkey": np.array([1, 2, 3], dtype=np.int64),
        "p_name": ["red rod", "red gear", "blue rod"]}))
    _write(tmp_path, "supplier", pd.DataFrame({
        "s_suppkey": np.array([1, 2, 3], dtype=np.int64),
        "s_name": ["S1", "S2", "S3"],
        "s_nationkey": np.array([0, 0, 0], dtype=np.int64)}))
    _write(tmp_path, "nation", pd.DataFrame({
        "n_nationkey": np.array([0], dtype=np.int64),
        "n_name": ["N0"]}))
    _write(tmp_path, "lineitem", pd.DataFrame({
        # s1 ships 61 of part1 (qualifies) AND 61 of part2 (still ONE row);
        # s2 ships exactly 60 (boundary: excluded); s3 ships blue (excluded);
        # one 1996 row for s2/part1 must not leak into the 1997 window
        "l_partkey": np.array([1, 1, 2, 1, 3, 1], dtype=np.int64),
        "l_suppkey": np.array([1, 1, 1, 2, 3, 2], dtype=np.int64),
        "l_quantity": [31.0, 30.0, 61.0, 60.0, 99.0, 50.0],
        "l_shipdate": pd.to_datetime(
            ["1997-03-01", "1997-04-01", "1997-05-01", "1997-06-01",
             "1997-07-01", "1996-01-01"])}))
    out = q20_heavy_shippers(str(tmp_path))
    assert out["s_suppkey"].tolist() == [1]
    assert out["s_name"].tolist() == ["S1"]
    assert out["n_name"].tolist() == ["N0"]


def test_q21_sole_blocker_semantics(ray_session, tmp_path):
    from rayschema.queries import q21_sole_blocker

    _write(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": np.array([1, 2, 3, 4, 5], dtype=np.int64),
        "o_orderstatus": ["F", "F", "F", "F", "O"]}))
    _write(tmp_path, "supplier", pd.DataFrame({
        "s_suppkey": np.array([1, 2, 3], dtype=np.int64),
        "s_name": ["S1", "S2", "S3"]}))
    d = pd.to_datetime
    _write(tmp_path, "lineitem", pd.DataFrame({
        # order 1: s1 late alone -> s1 blocks;
        # order 2: s1 and s2 BOTH at the max -> nobody blocks;
        # order 3: single-supplier order -> excluded (nd < 2);
        # order 4: s2 late alone (two rows at max, same supplier -> still
        #          one blocker);
        # order 5: status 'O' -> out of scope entirely
        "l_orderkey": np.array([1, 1, 2, 2, 3, 4, 4, 4, 5, 5],
                               dtype=np.int64),
        "l_suppkey": np.array([1, 2, 1, 2, 1, 2, 2, 1, 1, 2],
                              dtype=np.int64),
        "l_shipdate": d(["1997-02-01", "1997-01-01",
                         "1997-03-01", "1997-03-01",
                         "1997-01-01",
                         "1997-05-01", "1997-05-01", "1997-04-01",
                         "1997-09-01", "1997-01-01"])}))
    out = q21_sole_blocker(str(tmp_path))
    got = dict(zip(out["s_suppkey"], out["numwait"]))
    assert got == {1: 1, 2: 1}
    assert set(out["s_name"]) == {"S1", "S2"}


def test_q21_matches_oracle_sf001(ray_session):
    from rayschema.queries import q21_sole_blocker

    sf = "/root/testdata/sf0.01"
    out = q21_sole_blocker(sf)
    con = duckdb.connect()
    want = con.sql(f"""
        WITH li AS (
          SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
          FROM read_parquet('{sf}/lineitem.parquet') l
          JOIN read_parquet('{sf}/orders.parquet') o
            ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderstatus = 'F'),
        g AS (SELECT l_orderkey, max(l_shipdate) AS mx,
                     count(DISTINCT l_suppkey) AS nd
              FROM li GROUP BY 1),
        w AS (SELECT DISTINCT li.l_orderkey, li.l_suppkey
              FROM li JOIN g USING (l_orderkey)
              WHERE g.nd >= 2 AND li.l_shipdate = g.mx),
        solo AS (SELECT l_orderkey, min(l_suppkey) AS s
                 FROM w GROUP BY 1 HAVING count(*) = 1)
        SELECT s AS s_suppkey, count(*)::BIGINT AS numwait
        FROM solo GROUP BY 1
        ORDER BY numwait DESC, s_suppkey LIMIT 20""").df()
    assert out["s_suppkey"].tolist() == want["s_suppkey"].tolist()
    assert out["numwait"].tolist() == want["numwait"].tolist()


def test_naive_bayes_langid_planted(ray_session, tmp_path):
    from rayschema.queries import naive_bayes_langid

    # train (even ids): en = {cat, dog}, fr = {chat, chien};
    # test (odd ids): doc 1 "cat cat" -> en, doc 3 "chat" -> fr,
    # doc 5 "dog chat" -> tie broken by exact integer costs
    df = pd.DataFrame({
        "doc_id": np.array([0, 2, 4, 6, 1, 3, 5], dtype=np.int64),
        "text": ["cat dog", "cat cat", "chat chien", "chat chat",
                 "cat cat", "chat", "dog chat"],
        "lang": ["en", "en", "fr", "fr", "en", "fr", "en"]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    out = naive_bayes_langid(str(tmp_path))
    con = duckdb.connect()
    con.execute(f"""CREATE VIEW documents AS SELECT * FROM
                    read_parquet('{tmp_path}/documents.parquet')""")
    import __ray_entry__ as E

    want = con.execute(E.oracle_sql()["naive_bayes_langid"]).df() \
        .sort_values(["lang", "pred_lang"]).reset_index(drop=True)
    got = out.sort_values(["lang", "pred_lang"]).reset_index(drop=True)
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["pred_lang"].tolist() == want["pred_lang"].tolist()
    assert got["n_docs"].tolist() == want["n_docs"].tolist()
    # the two unambiguous docs really classify correctly
    m = {(r.lang, r.pred_lang): int(r.n_docs)
         for r in out.itertuples(index=False)}
    assert m.get(("en", "en"), 0) >= 1     # "cat cat"
    assert m.get(("fr", "fr"), 0) >= 1     # "chat"


def test_value_gini_by_type_planted_and_fuzz(ray_session, tmp_path):
    """Equal values -> gini 0; one-holder concentration -> the exact
    closed form; randomized histogram fold matches a naive row_number
    rank-sum computed in arbitrary-precision ints."""
    import pyarrow.parquet as _pq

    from rayschema.queries import value_gini_by_type

    rng = np.random.default_rng(7)
    # eq: 40 equal values. conc: n=50, 49 hold 1 cent, one holds 951.
    # fz: random cents with heavy ties across batches.
    vals = {"eq": np.full(40, 2.50),
            "conc": np.concatenate([np.full(49, 0.01), [9.51]]),
            "fz": rng.integers(1, 40, size=300) / 100.0}
    et = np.concatenate([[k] * len(v) for k, v in vals.items()])
    vv = np.concatenate(list(vals.values()))
    n = len(vv)
    ts = np.arange(n, dtype=np.int64) * 1_000_000
    tab = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(et),
        "value": pa.array(vv),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = value_gini_by_type(str(tmp_path)).set_index("event_type")

    def ref_gini(v):
        c = np.sort(np.round(np.asarray(v) * 100).astype(np.int64))
        nn, s = len(c), int(c.sum())
        s1 = sum(int(i + 1) * int(x) for i, x in enumerate(c))
        return (1_000_000 * (2 * s1 - (nn + 1) * s)) // (nn * s)

    assert got.loc["eq", "gini_ppm"] == 0
    for k, v in vals.items():
        assert got.loc[k, "gini_ppm"] == ref_gini(v), k
        assert got.loc[k, "n_events"] == len(v)
    # one-holder closed form: G = (n-1)/n - 2*(n-1)*s_small/(n*S) exact
    assert got.loc["conc", "gini_ppm"] == ref_gini(vals["conc"])


def test_assortativity_star_is_minus_one(ray_session, tmp_path):
    """A trade star (one customer, four suppliers) is perfectly
    disassortative: r_ppm = -1,000,000 exactly, and the four integer
    moments match the hand computation (M=8, sum_jk=32, sum_j=20,
    sum_j2=68 on the symmetric edge list)."""
    import pyarrow.parquet as _pq

    from rayschema.queries import assortativity_trade_graph

    orders = pa.table({
        "o_orderkey": pa.array(np.arange(1, 5, dtype=np.int64)),
        "o_custkey": pa.array(np.full(4, 5, dtype=np.int64))})
    li = pa.table({
        "l_orderkey": pa.array(np.arange(1, 5, dtype=np.int64)),
        "l_suppkey": pa.array(np.arange(1, 5, dtype=np.int64))})
    _pq.write_table(orders, os.path.join(tmp_path, "orders.parquet"))
    _pq.write_table(li, os.path.join(tmp_path, "lineitem.parquet"))
    got = assortativity_trade_graph(str(tmp_path)).iloc[0]
    assert (got["n_edges"], got["sum_jk"], got["sum_j"],
            got["sum_j2"]) == (8, 32, 20, 68)
    assert got["assort_num"] == -144 and got["assort_den"] == 144
    assert got["r_ppm"] == -1_000_000


def test_source_vocab_overlap_planted(ray_session, tmp_path):
    """Hand-checkable three-source overlap through the bitmask fold:
    vocab(a) = {x,y,z}, vocab(b) = {y,z,w}, vocab(c) = {q} — (a,b)
    intersect 2 / union 4 = 500000 ppm; c intersects nothing and emits
    no pair rows."""
    import pyarrow.parquet as _pq

    from rayschema.queries import source_vocab_overlap

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "source": ["a", "a", "b", "c"],
        "text": ["x y", "y z", "y z w", "q"],
        "lang": ["en"] * 4})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = source_vocab_overlap(str(tmp_path))
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["source_a"], r["source_b"]) == ("a", "b")
    assert (r["n_inter"], r["n_union"], r["jaccard_ppm"]) \
        == (2, 4, 500_000)


def test_copurchase_lift_planted(ray_session, tmp_path):
    """Hand-checkable basket: parts (1,2) co-occur in 2 of 4 orders with
    n_1 = n_2 = 2 -> lift = 2*4/(2*2) = 2000000 ppm exactly; a
    within-order duplicate partkey must NOT inflate any count; a
    singleton pair (n_ab=1) is cut by minsup=2."""
    import pyarrow.parquet as _pq

    from rayschema.queries import copurchase_lift_pairs

    # orders: 1:{1,2}, 2:{1,2,3} (part 2 listed twice), 3:{2? no->3}, 4:{3,4}
    ok = np.array([1, 1, 2, 2, 2, 2, 3, 4, 4], dtype=np.int64)
    pk = np.array([1, 2, 1, 2, 2, 3, 3, 3, 4], dtype=np.int64)
    tab = pa.table({"l_orderkey": pa.array(ok),
                    "l_partkey": pa.array(pk)})
    _pq.write_table(tab, os.path.join(tmp_path, "lineitem.parquet"))
    got = copurchase_lift_pairs(str(tmp_path))
    # qualifying pairs (>=2 orders): only (1,2) [orders 1,2] and (2,3)? ->
    # (2,3) only in order 2; (3,4) only in order 4 -> single survivor
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["part_a"], r["part_b"], r["n_both"], r["n_a"], r["n_b"]) \
        == (1, 2, 2, 2, 2)
    assert r["lift_ppm"] == (1_000_000 * 2 * 4) // (2 * 2)
    assert r["rk"] == 1


def test_perceptron_matches_reference_simulation(ray_session, tmp_path):
    """Bit-exact vs a driver-side simulation of the documented full-batch
    rule on a mixed corpus (digits, multi-space runs, non-en langs), and
    the separable toy set reaches n_mis = 0."""
    import pyarrow.parquet as _pq

    from rayschema.queries import perceptron_train_langid

    rng = np.random.default_rng(11)
    texts, langs = [], []
    words = ["aa", "b3b", "cc7", "d", "e5"]
    for i in range(60):
        lang = ["en", "de", "zh"][i % 3]
        t = " ".join(rng.choice(words, size=rng.integers(1, 8)))
        if i % 7 == 0:
            t += "  99"      # double space + digits
        texts.append(t + ("!" * (i % 3 if lang == "en" else 5)))
        langs.append(lang)
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "source": ["s"] * 60, "lang": langs,
                       "text": texts})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = perceptron_train_langid(str(tmp_path), iters=3)

    y = np.where(np.array(langs) == "en", 1, -1).astype(np.int64)
    x = np.stack([np.ones(60, dtype=np.int64),
                  np.array([len(t) for t in texts], dtype=np.int64),
                  np.array([t.count(" ") + 1 for t in texts],
                           dtype=np.int64),
                  np.array([sum(c in "0123456789" for c in t)
                            for t in texts], dtype=np.int64)], axis=1)
    w = np.zeros(4, dtype=np.int64)
    for it in range(3):
        mis = y * (x @ w) <= 0
        row = got.iloc[it]
        assert row["n_mis"] == int(mis.sum()), it
        w = w + (y[mis, None] * x[mis]).sum(axis=0)
        assert (row[["w_bias", "w_chars", "w_words", "w_digits"]]
                .to_numpy(np.int64) == w).all(), it


def test_events_ewma_planted_spike(ray_session, tmp_path):
    """Flat series then a 3x spike: the spike hour flags, the flat hours
    do not, and the milli-unit recurrence matches a hand replay."""
    import pyarrow.parquet as _pq

    from rayschema.queries import events_ewma_anomaly

    counts = [10, 10, 10, 30, 10]
    hours = np.repeat(np.arange(5), counts)
    ts = (hours * 3600 + 5) * 1_000_000
    n = len(ts)
    tab = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * n),
        "value": pa.array(np.ones(n))})
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = events_ewma_anomaly(str(tmp_path))
    e, exp_e, exp_a = None, [], []
    for c in counts:
        if e is None:
            e, a = c * 1000, 0
        else:
            a = 1 if 2 * abs(c * 1000 - e) > e else 0
            e = (250 * c * 1000 + 750 * e) // 1000
        exp_e.append(e)
        exp_a.append(a)
    assert got["ewma_milli"].tolist() == exp_e
    assert got["is_anomaly"].tolist() == exp_a
    assert got["is_anomaly"].sum() == 1
    assert got.loc[got["is_anomaly"] == 1, "n_events"].iloc[0] == 30


def test_hapax_ratio_planted(ray_session, tmp_path):
    """source a: 'x x y' -> distinct {x,y}, hapax {y} -> 500000 ppm;
    source b: 'z w' -> all hapax -> 1000000 ppm; cross-source words do
    not leak (y in b stays a's hapax)."""
    import pyarrow.parquet as _pq

    from rayschema.queries import hapax_ratio_by_source

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "source": ["a", "a", "b"],
        "text": ["x x", "y", "z w y y"],
        "lang": ["en"] * 3})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = hapax_ratio_by_source(str(tmp_path)).set_index("source")
    assert (got.loc["a", "n_distinct"], got.loc["a", "n_hapax"]) == (2, 1)
    assert got.loc["a", "hapax_ppm"] == 500_000
    assert (got.loc["b", "n_distinct"], got.loc["b", "n_hapax"]) == (3, 2)
    assert got.loc["b", "hapax_ppm"] == 666_666


def test_quantile_normalize_planted_and_alignment(ray_session, tmp_path):
    """Two equal-size sources with shifted distributions: after
    normalization both sources carry the IDENTICAL value multiset (the
    defining property), and a hand-computed rank mapping checks exactly."""
    import pyarrow.parquet as _pq

    from rayschema.queries import quantile_normalize_chars

    # source a: chars 10,20,30,40 ; source b: 110,120,130,140
    chars = np.array([10, 20, 30, 40, 110, 120, 130, 140],
                     dtype=np.int64)
    src = ["a"] * 4 + ["b"] * 4
    df = pd.DataFrame({"doc_id": np.arange(8, dtype=np.int64),
                       "source": src,
                       "text": ["x" * int(c) for c in chars],
                       "lang": ["en"] * 8,
                       "n_chars": chars})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = quantile_normalize_chars(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # rank r of 4 -> global rank ceil(r*8/4) = 2r -> global sorted values
    # at ranks 2,4,6,8 = 20, 40, 120, 140 for BOTH sources
    exp = np.array([20, 40, 120, 140], dtype=np.int64)
    a = got.loc[got["doc_id"] < 4, "qnorm_chars"].to_numpy(np.int64)
    b = got.loc[got["doc_id"] >= 4, "qnorm_chars"].to_numpy(np.int64)
    assert (np.sort(a) == exp).all()
    assert (np.sort(b) == exp).all()
    assert (np.sort(a) == np.sort(b)).all()   # distributions aligned


def test_event_burstiness_fano_planted(ray_session, tmp_path):
    """Constant hourly counts -> Fano 0; a bursty series matches the
    hand-computed cleared-denominator ratio."""
    import pyarrow.parquet as _pq

    from rayschema.queries import event_burstiness_fano

    flat = [7, 7, 7, 7]                  # var 0
    burst = [1, 1, 1, 13]                # mean 4, pop-var 27 -> fano 6.75
    hours = np.concatenate([np.repeat(np.arange(4), flat),
                            np.repeat(np.arange(4), burst)])
    et = ["flat"] * sum(flat) + ["burst"] * sum(burst)
    ts = (hours * 3600 + 3) * 1_000_000
    n = len(ts)
    tab = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(et),
        "value": pa.array(np.ones(n))})
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = event_burstiness_fano(str(tmp_path)).set_index("event_type")
    assert got.loc["flat", "fano_ppm"] == 0
    # (h*s2 - s*s) / (h*s) = (4*172 - 256) / (4*16) = 432/64 = 6.75
    assert got.loc["burst", "fano_ppm"] == 6_750_000
    assert (got.loc["burst", "n_hours"], got.loc["burst", "n_events"]) \
        == (4, 16)


def test_bpe_train_merges_planted(ray_session, tmp_path):
    """Hand-traced 3 rounds incl. the non-overlapping replace subtlety:
    corpus words 'aaaa' x2, 'abab' x3, 'ab' x5 (len>=2 filter keeps all).
    Round 1 pairs: (a,a): 3x2=6 from 'aaaa'; (a,b): 2x3+5=11; (b,a): 3.
    Winner (a,b) n=11. After merge: 'aaaa'->a|a|a|a (no ab), 'abab'->
    ab|ab, 'ab'->ab. Round 2: (a,a) 6, (ab,ab) 3 -> winner (a,a) n=6.
    After: 'aaaa'->aa|aa (non-overlap: TWO merges, not three).
    Round 3: (aa,aa) 2, (ab,ab) 3 -> winner (ab,ab) n=3."""
    import pyarrow.parquet as _pq

    from rayschema.queries import bpe_train_merges

    texts = ["aaaa aaaa", "abab abab abab", "ab ab ab ab ab"]
    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                       "source": ["s"] * 3, "lang": ["en"] * 3,
                       "text": texts})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = bpe_train_merges(str(tmp_path), rounds=3)
    assert got[["merge_left", "merge_right"]].values.tolist() == \
        [["a", "b"], ["a", "a"], ["ab", "ab"]]
    assert got["n"].tolist() == [11, 6, 3]


def test_markov_stationary_planted(ray_session, tmp_path):
    """Hand-traced 5 exact integer supersteps on one user's stream
    A A B A B A B C: core transitions A->A 1, A->B 3, B->A 2 (B->C
    drops — C has no outgoing edge so it is not a state), kept-mass row
    totals r_A=4, r_B=2, p_0 = 10^12 // 2.  Recurrence
    q_A = p_A//4 + p_B, q_B = (3*p_A)//4 lands on exact multiples of 4
    throughout, so every floor is exact division."""
    import pyarrow.parquet as _pq

    from rayschema.queries import markov_stationary_events

    seq = ["A", "A", "B", "A", "B", "A", "B", "C"]
    n = len(seq)
    tab = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "ts": pa.array((np.arange(n, dtype=np.int64) * 60 + 1)
                       * 1_000_000).cast(pa.timestamp("us")),
        "event_type": pa.array(seq),
        "value": pa.array(np.ones(n)),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = markov_stationary_events(str(tmp_path)).set_index("event_type")
    assert list(got.index) == ["A", "B"]          # C is not a state
    assert got.loc["A", "stat_p12"] == 588_378_906_250
    assert got.loc["B", "stat_p12"] == 411_621_093_750
    assert got.loc["A", "rk"] == 1 and got.loc["B", "rk"] == 2
    assert int(got["stat_p12"].sum()) == 10 ** 12   # no floor loss here


def test_auc_en_by_chars_planted(ray_session, tmp_path):
    """Hand-traced tie-corrected AUC: source 's' has en scores {10, 20}
    vs non-en {10, 15} -> pairwise (0.5 + 0 + 1 + 1)/4 = 0.625; the
    all-en source 't' is degenerate and drops."""
    import pyarrow.parquet as _pq

    from rayschema.queries import auc_en_by_chars

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["x" * 60] * 6,
        "lang": ["en", "de", "de", "en", "en", "en"],
        "source": ["s", "s", "s", "s", "t", "t"],
        "n_chars": np.array([10, 10, 15, 20, 30, 40], dtype=np.int64),
    })
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = auc_en_by_chars(str(tmp_path))
    assert list(got["source"]) == ["s"]
    assert got.loc[0, "n_pos"] == 2 and got.loc[0, "n_neg"] == 2
    assert got.loc[0, "auc_ppm"] == 625_000


def test_isotonic_hourly_value_planted(ray_session, tmp_path):
    """Violating means [200, 100, 300] cents with weights [2, 1, 1] pool
    hours 0-1 to 500/3 cents: fit = [166666666, 166666666, 300000000]
    micro-cents, matching hand-run PAVA and non-decreasing."""
    import pyarrow.parquet as _pq

    from rayschema.queries import isotonic_hourly_value

    hours = np.array([0, 0, 1, 2], dtype=np.int64)
    cents = np.array([300, 100, 100, 300], dtype=np.int64)
    tab = pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "user_id": pa.array(np.zeros(4, dtype=np.int64)),
        "ts": pa.array(hours * 3_600_000_000 + 7).cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 4),
        "value": pa.array(cents / 100.0),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = isotonic_hourly_value(str(tmp_path))
    assert got["hour"].tolist() == [0, 1, 2]
    assert got["iso_ucents"].tolist() == [166_666_666, 166_666_666,
                                          300_000_000]
    assert (np.diff(got["iso_ucents"].to_numpy()) >= 0).all()


def test_shannon_vocab_codes_planted(ray_session, tmp_path):
    """counts a=5, b=2, c=1 of total 8: l = smallest with n<<l >= 8
    gives 1, 2, 3 — ceil(log2(1/p)) exactly."""
    import pyarrow.parquet as _pq

    from rayschema.queries import shannon_vocab_codes

    df = pd.DataFrame({"doc_id": np.array([0], dtype=np.int64),
                       "text": ["a a a a a b b c"]})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = shannon_vocab_codes(str(tmp_path))
    assert got["word"].tolist() == ["a", "b", "c"]
    assert got["code_len"].tolist() == [1, 2, 3]
    assert got["bits"].tolist() == [5, 4, 3]


def test_rrf_fuse_keyword_rankings_planted(ray_session, tmp_path):
    """3 docs, hand-computed 1e9//(60+r) sums: d0 wins list A and is 2nd
    in B (32522474), d2 wins B (32266457), d1 trails (32002047)."""
    import pyarrow.parquet as _pq

    from rayschema.queries import rrf_fuse_keyword_rankings

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["join join hash", "scan", "merge merge"]})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = rrf_fuse_keyword_rankings(str(tmp_path))
    assert got["doc_id"].tolist() == [0, 2, 1]
    assert got["rrf_e9"].tolist() == [32_522_474, 32_266_457, 32_002_047]
    assert got["rk"].tolist() == [1, 2, 3]


def test_langid_f1_planted(ray_session, tmp_path):
    """Confusion en:{TP 2, FN 1} de:{TP 1, FP 1} from one mislabeled
    German doc -> hand-computed floor-ppm P/R/F1 per class."""
    import pyarrow.parquet as _pq

    from rayschema.queries import langid_f1_by_class

    en = "the cat and the dog of this town is that it for with"
    de = "der die und das ist nicht ein mit auf von"
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [en, en + " extra", de, de + " mehr"],
        "lang": ["en", "en", "en", "de"],     # third doc mislabeled
        "source": ["s"] * 4,
        "n_chars": np.array([len(en)] * 4, dtype=np.int64)})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = langid_f1_by_class(str(tmp_path)).set_index("lang")
    assert got.loc["en", ["tp", "fp", "fn"]].tolist() == [2, 0, 1]
    assert got.loc["en", "precision_ppm"] == 1_000_000
    assert got.loc["en", "recall_ppm"] == 666_666
    assert got.loc["en", "f1_ppm"] == 800_000
    assert got.loc["de", ["tp", "fp", "fn"]].tolist() == [1, 1, 0]
    assert got.loc["de", "f1_ppm"] == 666_666


def test_simpson_diversity_planted(ray_session, tmp_path):
    """source s = [en, en, de]: 1e6 - (1e6 * 2) // 6 = 666667; the
    single-doc source t is undefined and drops."""
    import pyarrow.parquet as _pq

    from rayschema.queries import simpson_diversity_by_source

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["x" * 60] * 4,
        "lang": ["en", "en", "de", "fr"],
        "source": ["s", "s", "s", "t"],
        "n_chars": np.array([60] * 4, dtype=np.int64)})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = simpson_diversity_by_source(str(tmp_path))
    assert list(got["source"]) == ["s"]
    assert got.loc[0, "n_docs"] == 3
    assert got.loc[0, "simpson_ppm"] == 666_667


def test_coverage_select_planted(ray_session, tmp_path):
    """Greedy trace: d0 'a b c' (3) -> d2 'c d' (+d, id beats d3) ->
    d3 'e' -> d1 fully covered picks at gain 0; round 5 has no doc."""
    import pyarrow.parquet as _pq

    from rayschema.queries import coverage_select_documents

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a b c", "a b", "c d", "e"]})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = coverage_select_documents(str(tmp_path))
    assert got.values.tolist() == [[1, 0, 3], [2, 2, 1],
                                   [3, 3, 1], [4, 1, 0]]


def test_dup_cross_source_matrix_planted(ray_session, tmp_path):
    """Text X spans {src1, src2}; Y spans {src1, src2, src3} -> matrix
    (src1,src2)=2, (src1,src3)=1, (src2,src3)=1; the single-source Z
    and repeated same-source copies contribute nothing."""
    import pyarrow.parquet as _pq

    from rayschema.queries import dup_cross_source_matrix

    df = pd.DataFrame({
        "doc_id": np.arange(7, dtype=np.int64),
        "text": ["X", "X", "Y", "Y", "Y", "Z", "Z"],
        "source": ["src1", "src2", "src1", "src3", "src2",
                   "src1", "src1"]})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = dup_cross_source_matrix(str(tmp_path))
    assert got.values.tolist() == [["src1", "src2", 2],
                                   ["src1", "src3", 1],
                                   ["src2", "src3", 1]]


def test_ks_chars_two_sources_planted(ray_session, tmp_path):
    """src0 = {1, 2}, src1 = {2, 3}: sup |2*cumA - 2*cumB| = 2 at v=1
    -> ks_ppm = 1e6 * 2 // 4 = 500000."""
    import pyarrow.parquet as _pq

    from rayschema.queries import ks_chars_two_sources

    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["x" * 60] * 5,
        "lang": ["en"] * 5,
        "source": ["src0", "src0", "src1", "src1", "src9"],
        "n_chars": np.array([1, 2, 2, 3, 7], dtype=np.int64)})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = ks_chars_two_sources(str(tmp_path))
    assert got.values.tolist() == [[2, 2, 2, 500_000]]


def test_readability_fk_planted(ray_session, tmp_path):
    """'Hi there. Go now!': W=4, S=2, Y=5 vowel runs ->
    fk_num = 39*16 + 1180*10 - 1559*8 = -48, fk_den = 800; a text with
    no [.!?] clamps S to 1."""
    import pyarrow.parquet as _pq

    from rayschema.queries import readability_fk_documents

    df = pd.DataFrame({
        "doc_id": np.array([0, 1], dtype=np.int64),
        "text": ["Hi there. Go now!", "no punct here"]})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = readability_fk_documents(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.loc[0, ["n_words", "n_sentences", "n_vowel_runs"]] \
        .tolist() == [4, 2, 5]
    assert got.loc[0, "fk_num"] == -48 and got.loc[0, "fk_den"] == 800
    assert got.loc[1, "n_sentences"] == 1


def test_holt_forecast_planted(ray_session, tmp_path):
    """counts [4,6,5] -> level 6500, trend 1250, forecast 7750; [5,1]
    exercises NEGATIVE trend with truncate-toward-zero division
    (level 1000, trend -4000); a 1-hour type drops."""
    import pyarrow.parquet as _pq

    from rayschema.queries import holt_forecast_events

    hours = np.array([0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2,
                      0, 0, 0, 0, 0, 1, 0], dtype=np.int64)
    types = ["e"] * 15 + ["t"] * 6 + ["solo"]
    n = len(hours)
    tab = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "ts": pa.array(hours * 3_600_000_000 + 7).cast(pa.timestamp("us")),
        "event_type": pa.array(types),
        "value": pa.array(np.ones(n)),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = holt_forecast_events(str(tmp_path)).set_index("event_type")
    assert got.loc["e", ["n_hours", "level_milli", "trend_milli",
                         "forecast_milli"]].tolist() == \
        [3, 6500, 1250, 7750]
    assert got.loc["t", ["level_milli", "trend_milli",
                         "forecast_milli"]].tolist() == \
        [1000, -4000, -3000]
    assert "solo" not in got.index


def test_join_fanout_histogram_planted(ray_session, tmp_path):
    """orders {0,1,2}; lineitems 0 x2, 1 x1 -> one order in each of the
    0/1/2 fanout buckets."""
    import pyarrow.parquet as _pq

    from rayschema.queries import join_fanout_histogram

    _pq.write_table(pa.table({"o_orderkey": pa.array(
        np.array([0, 1, 2], dtype=np.int64))}),
        os.path.join(tmp_path, "orders.parquet"))
    _pq.write_table(pa.table({"l_orderkey": pa.array(
        np.array([0, 0, 1], dtype=np.int64))}),
        os.path.join(tmp_path, "lineitem.parquet"))
    got = join_fanout_histogram(str(tmp_path))
    assert got.values.tolist() == [[0, 1], [1, 1], [2, 1]]


def test_seasonal_index_planted(ray_session, tmp_path):
    """type a: hours [0,0,1] -> idx 24e6*2//3 = 16000000 and 8000000."""
    import pyarrow.parquet as _pq

    from rayschema.queries import seasonal_index_by_type

    hours = np.array([0, 0, 1], dtype=np.int64)
    tab = pa.table({
        "event_id": pa.array(np.arange(3, dtype=np.int64)),
        "user_id": pa.array(np.zeros(3, dtype=np.int64)),
        "ts": pa.array(hours * 3_600_000_000 + 7).cast(pa.timestamp("us")),
        "event_type": pa.array(["a"] * 3),
        "value": pa.array(np.ones(3)),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = seasonal_index_by_type(str(tmp_path))
    assert got[["hour", "n_events", "idx_ppm"]].values.tolist() == \
        [[0, 2, 16_000_000], [1, 1, 8_000_000]]


def test_q11_threshold_planted(ray_session, tmp_path):
    """Values 2000 vs 1 of total 2001: only the big part clears
    1000 * v > total; the other-nation supplier never contributes."""
    import pyarrow.parquet as _pq

    from rayschema.queries import q11_important_stock

    _pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "n_nationkey": np.array([1, 2], dtype=np.int64),
        "n_name": ["NATION_1", "NATION_2"]}), preserve_index=False),
        os.path.join(tmp_path, "nation.parquet"))
    _pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "s_suppkey": np.array([1, 2], dtype=np.int64),
        "s_nationkey": np.array([1, 2], dtype=np.int64)}),
        preserve_index=False),
        os.path.join(tmp_path, "supplier.parquet"))
    _pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "l_partkey": np.array([10, 11, 12], dtype=np.int64),
        "l_suppkey": np.array([1, 1, 2], dtype=np.int64),
        "l_quantity": [1.0, 1.0, 9.0],
        "l_extendedprice": [20.00, 0.01, 99.0]}), preserve_index=False),
        os.path.join(tmp_path, "lineitem.parquet"))
    got = q11_important_stock(str(tmp_path))
    assert got.values.tolist() == [[10, 2000, 1]]


def test_q16_supplier_cnt_planted(ray_session, tmp_path):
    """Excluded brand, out-of-set size, negative-balance supplier and
    duplicate lineitems all drop; one (brand, type, size) survives with
    ONE distinct supplier."""
    import pyarrow.parquet as _pq

    from rayschema.queries import q16_supplier_cnt

    _pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "p_partkey": np.array([1, 2, 3], dtype=np.int64),
        "p_brand": ["BrandA", "Brand#13", "BrandA"],
        "p_type": ["typeX", "typeX", "typeX"],
        "p_size": np.array([1, 1, 2], dtype=np.int64)}),
        preserve_index=False), os.path.join(tmp_path, "part.parquet"))
    _pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "s_suppkey": np.array([1, 2], dtype=np.int64),
        "s_acctbal": [10.0, -5.0]}), preserve_index=False),
        os.path.join(tmp_path, "supplier.parquet"))
    _pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "l_partkey": np.array([1, 1, 1, 2, 3], dtype=np.int64),
        "l_suppkey": np.array([1, 1, 2, 1, 1], dtype=np.int64)}),
        preserve_index=False),
        os.path.join(tmp_path, "lineitem.parquet"))
    got = q16_supplier_cnt(str(tmp_path))
    assert got.values.tolist() == [["BrandA", "typeX", 1, 1]]


def test_cumulative_gains_planted(ray_session, tmp_path):
    """4 docs, 2 positives; decile depth 1 lands INSIDE the n_chars=5
    tie group, forcing the phase-2 doc_id-ordered resolution (en doc 0
    ranks before de doc 1 at equal score)."""
    import pyarrow.parquet as _pq

    from rayschema.queries import cumulative_gains_en

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["x" * 60] * 4,
        "lang": ["en", "de", "en", "de"],
        "source": ["s"] * 4,
        "n_chars": np.array([5, 5, 4, 3], dtype=np.int64)})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = cumulative_gains_en(str(tmp_path))
    assert got["depth"].tolist() == [1, 1, 2, 2, 2, 3, 3, 4, 4, 4]
    assert got["n_pos_cum"].tolist() == [1, 1, 1, 1, 1, 2, 2, 2, 2, 2]
    assert got["gain_ppm"].tolist() == [500_000] * 5 + [1_000_000] * 5


def test_hoover_value_planted(ray_session, tmp_path):
    """cents [100 x3, 500]: D = 3*400 + 1200 = 2400 over 2nS = 6400 ->
    375000 ppm — the 300/800 value share a Robin Hood would move."""
    import pyarrow.parquet as _pq

    from rayschema.queries import hoover_value_by_type

    tab = pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "user_id": pa.array(np.zeros(4, dtype=np.int64)),
        "ts": pa.array(np.arange(4, dtype=np.int64) * 60_000_000)
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 4),
        "value": pa.array([1.0, 1.0, 1.0, 5.0]),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = hoover_value_by_type(str(tmp_path))
    assert got.values.tolist() == [["e", 4, 800, 375_000]]


def test_autocorr_hourly_planted(ray_session, tmp_path):
    """counts [1,2,3] -> lag pairs on a perfect line: num = den_x =
    den_y = 1 (r = +1); a 2-hour type (1 pair) drops."""
    import pyarrow.parquet as _pq

    from rayschema.queries import autocorr_hourly_by_type

    hours = np.array([0, 1, 1, 2, 2, 2, 5, 6], dtype=np.int64)
    types = ["e"] * 6 + ["short"] * 2
    n = len(hours)
    tab = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "ts": pa.array(hours * 3_600_000_000 + 7).cast(pa.timestamp("us")),
        "event_type": pa.array(types),
        "value": pa.array(np.ones(n)),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = autocorr_hourly_by_type(str(tmp_path))
    assert got.values.tolist() == [["e", 2, 1, 1, 1]]


def test_kendall_tau_planted(ray_session, tmp_path):
    """tfa = [1,2,0], tfb = [1,0,1] over 3 docs: 2 discordant pairs +
    1 tie on the B side, nothing concordant."""
    import pyarrow.parquet as _pq

    from rayschema.queries import kendall_tau_keyword_rankings

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["join hash", "join join", "merge"]})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = kendall_tau_keyword_rankings(str(tmp_path))
    assert got.values.tolist() == [[3, 0, 2, 0, 1, 0]]


def test_user_hourly_lerp_planted(ray_session, tmp_path):
    """Rising gap 100->400 cents over 3 hours lerps to 200k/300k milli;
    the falling non-exact gap 200->100 over 3 hours pins
    truncate-toward-zero: 166667 (floor would say 166666)."""
    import pyarrow.parquet as _pq

    from rayschema.queries import user_hourly_lerp

    users = np.array([0, 0, 1, 1], dtype=np.int64)
    hours = np.array([0, 3, 0, 3], dtype=np.int64)
    vals = [1.00, 4.00, 2.00, 1.00]
    tab = pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "user_id": pa.array(users),
        "ts": pa.array(hours * 3_600_000_000 + 7).cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 4),
        "value": pa.array(vals),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = user_hourly_lerp(str(tmp_path))
    assert got.values.tolist() == [
        [0, 1, 200_000], [0, 2, 300_000],
        [1, 1, 166_667], [1, 2, 133_334]]


def test_mmr_rerank_planted(ray_session, tmp_path):
    """Hand-traced greedy: the duplicate top-relevance doc 1 is fully
    penalized (Jaccard 1.0 with pick 0) and falls behind the less
    relevant but novel doc 2; round 5 has no pool left."""
    import pyarrow.parquet as _pq

    from rayschema.queries import mmr_rerank_documents

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["join join hash c1 c2", "join join hash c1 c2",
                 "join x y z w", "a b"]})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = mmr_rerank_documents(str(tmp_path))
    assert got.values.tolist() == [[1, 0, 1_000_000], [2, 2, 208_333],
                                   [3, 1, 0], [4, 3, 0]]


def test_mutual_nn_planted(ray_session, tmp_path):
    """Two tight 2-vector clusters -> exactly the two within-cluster
    mutual pairs, none across."""
    import pyarrow.parquet as _pq

    from rayschema.queries import mutual_nn_embeddings

    vecs = [[1.0, 0.0], [1.0, 0.01], [0.0, 1.0], [0.01, 1.0]]
    tab = pa.table({
        "vec_id": pa.array(np.arange(4, dtype=np.int64)),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(4, dtype=np.int32))})
    _pq.write_table(tab, os.path.join(tmp_path, "embeddings.parquet"))
    got = mutual_nn_embeddings(str(tmp_path))
    assert got[["vec_a", "vec_b"]].values.tolist() == [[0, 1], [2, 3]]
    assert (got["cosine"] > 0.99).all()


def test_self_overlap_planted(ray_session, tmp_path):
    """Two 9-token docs sharing their first 8-gram: each has 2 windows,
    1 shared -> 500000 ppm; a doc under 8 tokens emits nothing."""
    import pyarrow.parquet as _pq

    from rayschema.queries import self_overlap_documents

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a b c d e f g h i", "a b c d e f g h x",
                 "short text"]})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = self_overlap_documents(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [0, 1]
    assert got["n_windows"].tolist() == [2, 2]
    assert got["n_shared"].tolist() == [1, 1]
    assert got["overlap_ppm"].tolist() == [500_000, 500_000]


def test_ngram_doc_frequency_planted(ray_session, tmp_path):
    """Same fixture: grams 'a..h' in 2 docs, 'b..i' and 'b..x' in 1
    each -> histogram (1, 2), (2, 1)."""
    import pyarrow.parquet as _pq

    from rayschema.queries import ngram_doc_frequency_histogram

    df = pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": ["a b c d e f g h i", "a b c d e f g h x"]})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = ngram_doc_frequency_histogram(str(tmp_path))
    assert got.values.tolist() == [[1, 2], [2, 1]]


def test_max_event_type_run_planted(ray_session, tmp_path):
    """user 0 stream A A B B B A -> max run 3 of B; user 1 ties A-run 1
    vs B-run 1 -> lexicographic winner A."""
    import pyarrow.parquet as _pq

    from rayschema.queries import max_event_type_run

    users = np.array([0, 0, 0, 0, 0, 0, 1, 1], dtype=np.int64)
    types = ["A", "A", "B", "B", "B", "A", "B", "A"]
    n = len(users)
    tab = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(users),
        "ts": pa.array(np.arange(n, dtype=np.int64) * 60_000_000)
        .cast(pa.timestamp("us")),
        "event_type": pa.array(types),
        "value": pa.array(np.ones(n)),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = max_event_type_run(str(tmp_path))
    assert got.values.tolist() == [[0, 3, "B"], [1, 1, "A"]]


def test_part_reorder_gap_planted(ray_session, tmp_path):
    """part 1 ordered on days {0, 2, 5} -> gaps (2, 3), mean 2500 milli;
    part 2 has one date and drops; duplicate same-day lineitems
    collapse."""
    import pyarrow.parquet as _pq

    from rayschema.queries import part_reorder_gap

    base = np.datetime64("2024-01-01", "us")
    od = pd.DataFrame({
        "o_orderkey": np.arange(4, dtype=np.int64),
        "o_orderdate": [base, base + np.timedelta64(2, "D"),
                        base + np.timedelta64(5, "D"), base]})
    _pq.write_table(pa.Table.from_pandas(od, preserve_index=False),
                    os.path.join(tmp_path, "orders.parquet"))
    li = pd.DataFrame({
        "l_partkey": np.array([1, 1, 1, 1, 2], dtype=np.int64),
        "l_orderkey": np.array([0, 1, 2, 3, 0], dtype=np.int64)})
    _pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                    os.path.join(tmp_path, "lineitem.parquet"))
    got = part_reorder_gap(str(tmp_path))
    assert got.values.tolist() == [[1, 2, 5, 2500, 1]]


def test_mix_hash_hand_values():
    """The multiplicative high-bits hash against hand-computed values;
    keys congruent mod 64 (1, 65, 129) land in DISTINCT buckets —
    the property an affine-mod hash cannot have."""
    from rayschema.queries import _mix_hash

    u = np.array([1, 65, 129], dtype=np.int64)
    assert _mix_hash(u, 2654435761, 64).tolist() == [55, 21, 52]
    assert _mix_hash(u, 2246822519, 64).tolist() == [43, 30, 17]


def test_cms_user_event_counts_properties(ray_session, tmp_path):
    """CMS one-sided guarantee on a planted corpus: est >= true for
    every reported user, top-10 ordered by (true desc, user asc), and
    overcount == est - true."""
    import pyarrow.parquet as _pq

    from rayschema.queries import cms_user_event_counts

    users = np.array([1] * 3 + [2] * 2 + [3], dtype=np.int64)
    n = len(users)
    tab = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(users),
        "ts": pa.array(np.arange(n, dtype=np.int64) * 60_000_000)
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * n),
        "value": pa.array(np.ones(n)),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = cms_user_event_counts(str(tmp_path))
    assert got["user_id"].tolist() == [1, 2, 3]
    assert got["true_count"].tolist() == [3, 2, 1]
    assert (got["cms_est"] >= got["true_count"]).all()
    assert (got["overcount"] ==
            got["cms_est"] - got["true_count"]).all()


def test_bloom_fpr_audit_planted(ray_session, tmp_path):
    """Members {1..5} probed by customers {1..10}: members always hit
    (no false negatives by construction) and the false-positive count
    matches an independent set-based recomputation."""
    import pyarrow.parquet as _pq

    from rayschema.queries import (BLOOM_CFG, BLOOM_M, _mix_hash,
                                   bloom_fpr_audit)

    members = np.arange(1, 6, dtype=np.int64)
    probes = np.arange(1, 11, dtype=np.int64)
    _pq.write_table(pa.table({"o_custkey": pa.array(members)}),
                    os.path.join(tmp_path, "orders.parquet"))
    _pq.write_table(pa.table({"c_custkey": pa.array(probes)}),
                    os.path.join(tmp_path, "customer.parquet"))
    got = bloom_fpr_audit(str(tmp_path))
    bits = {(j, int(h)) for j, a in BLOOM_CFG
            for h in _mix_hash(members, a, BLOOM_M)}
    fp = sum(1 for u in probes[5:]
             if all((j, int(_mix_hash(np.array([u]), a, BLOOM_M)[0]))
                    in bits for j, a in BLOOM_CFG))
    assert got.values.tolist() == \
        [[5, 10, fp, (1_000_000 * fp) // 5]]


def test_frequent_triples_planted(ray_session, tmp_path):
    """Baskets {1,2,3,4} (with a dup row), {1,2,3}, {2,3,4}: triples
    (1,2,3) and (2,3,4) hit support 2, all others stay at 1."""
    import pyarrow.parquet as _pq

    from rayschema.queries import frequent_triples_parts

    li = pd.DataFrame({
        "l_orderkey": np.array([0, 0, 0, 0, 0, 1, 1, 1, 2, 2, 2],
                               dtype=np.int64),
        "l_partkey": np.array([1, 2, 2, 3, 4, 1, 2, 3, 2, 3, 4],
                              dtype=np.int64)})
    _pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                    os.path.join(tmp_path, "lineitem.parquet"))
    got = frequent_triples_parts(str(tmp_path))
    assert got.values.tolist() == [[1, 2, 3, 2, 1], [2, 3, 4, 2, 2]]


def test_mrr_knn_labels_planted(ray_session, tmp_path):
    """Query 0's nearest is the other-label decoy, the first same-label
    sits at rank 2 (rr 500000); query 1's label is unique so it emits
    no row; query 2 mirrors rank 2."""
    import pyarrow.parquet as _pq

    from rayschema.queries import mrr_knn_labels

    vecs = [[1.0, 0.0], [1.0, 0.001], [0.9, 0.1], [0.0, 1.0]]
    tab = pa.table({
        "vec_id": pa.array(np.arange(4, dtype=np.int64)),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        "label": pa.array(np.array([0, 1, 0, 0], dtype=np.int32))})
    _pq.write_table(tab, os.path.join(tmp_path, "embeddings.parquet"))
    got = mrr_knn_labels(str(tmp_path))
    assert got.values.tolist() == [[0, 2, 2, 500_000],
                                   [2, 0, 2, 500_000]]


def test_frequent_triples_path_equality(ray_session, tmp_path):
    """fold_cap=0 forces the 3-key groupby path; results must be
    identical to the packed driver fold."""
    import pyarrow.parquet as _pq

    from rayschema.queries import frequent_triples_parts

    rng = np.random.RandomState(11)
    n_orders = 60
    rows_k, rows_p = [], []
    for o in range(n_orders):
        for p in rng.choice(30, size=rng.randint(2, 6), replace=False):
            rows_k.append(o)
            rows_p.append(p)
    li = pd.DataFrame({"l_orderkey": np.array(rows_k, dtype=np.int64),
                       "l_partkey": np.array(rows_p, dtype=np.int64)})
    _pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                    os.path.join(tmp_path, "lineitem.parquet"))
    fast = frequent_triples_parts(str(tmp_path))
    slow = frequent_triples_parts(str(tmp_path), fold_cap=0)
    pd.testing.assert_frame_equal(fast, slow)


def test_xcorr_peak_lag_planted(ray_session, tmp_path):
    """views at hours {0,1}, purchases at {1,2}: the +1h lag aligns
    both pairs (xcorr 2, rank 1); lags 0 and +2 each catch one."""
    import pyarrow.parquet as _pq

    from rayschema.queries import xcorr_peak_lag

    hours = np.array([0, 1, 1, 2], dtype=np.int64)
    types = ["view", "view", "purchase", "purchase"]
    tab = pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "user_id": pa.array(np.zeros(4, dtype=np.int64)),
        "ts": pa.array(hours * 3_600_000_000 + 7).cast(pa.timestamp("us")),
        "event_type": pa.array(types),
        "value": pa.array(np.ones(4)),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = xcorr_peak_lag(str(tmp_path)).set_index("lag")
    assert got.loc[1, ["xcorr", "rk"]].tolist() == [2, 1]
    assert got.loc[0, "xcorr"] == 1 and got.loc[2, "xcorr"] == 1
    assert got.loc[-1, "xcorr"] == 0
    assert len(got) == 25


def test_nation_revenue_share_planted(ray_session, tmp_path):
    """Two nations in one region with 3.00 vs 1.00 revenue ->
    750000 / 250000 ppm."""
    import pyarrow.parquet as _pq

    from rayschema.queries import nation_revenue_share

    _pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "r_regionkey": np.array([1], dtype=np.int64),
        "r_name": ["R1"]}), preserve_index=False),
        os.path.join(tmp_path, "region.parquet"))
    _pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "n_nationkey": np.array([1, 2], dtype=np.int64),
        "n_name": ["NA", "NB"],
        "n_regionkey": np.array([1, 1], dtype=np.int64)}),
        preserve_index=False),
        os.path.join(tmp_path, "nation.parquet"))
    _pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "c_custkey": np.array([10, 20], dtype=np.int64),
        "c_nationkey": np.array([1, 2], dtype=np.int64)}),
        preserve_index=False),
        os.path.join(tmp_path, "customer.parquet"))
    _pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "o_custkey": np.array([10, 20], dtype=np.int64),
        "o_totalprice": [3.00, 1.00]}), preserve_index=False),
        os.path.join(tmp_path, "orders.parquet"))
    got = nation_revenue_share(str(tmp_path))
    assert got.values.tolist() == [["R1", "NA", 300, 750_000],
                                   ["R1", "NB", 100, 250_000]]


def test_quarterly_order_growth_planted(ray_session, tmp_path):
    """Q1'95 two 1.00 orders, Q2'95 one 2.50: only Q2 emits, with
    delta_n = -1 and delta_cents = +50."""
    import pyarrow.parquet as _pq

    from rayschema.queries import quarterly_order_growth

    dates = pd.to_datetime(["1995-01-15", "1995-02-20", "1995-05-20"])
    od = pd.DataFrame({"o_orderdate": dates,
                       "o_totalprice": [1.00, 1.00, 2.50]})
    _pq.write_table(pa.Table.from_pandas(od, preserve_index=False),
                    os.path.join(tmp_path, "orders.parquet"))
    got = quarterly_order_growth(str(tmp_path))
    assert got.values.tolist() == [[1995, 2, 1, 250, -1, 50]]


def test_value_moments_planted(ray_session, tmp_path):
    """dollars [1, 2, 2]: s1=5, s2=9, s3=17, s4=33."""
    import pyarrow.parquet as _pq

    from rayschema.queries import value_moments_by_type

    tab = pa.table({
        "event_id": pa.array(np.arange(3, dtype=np.int64)),
        "user_id": pa.array(np.zeros(3, dtype=np.int64)),
        "ts": pa.array(np.arange(3, dtype=np.int64) * 60_000_000)
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 3),
        "value": pa.array([1.2, 2.9, 2.0]),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = value_moments_by_type(str(tmp_path))
    assert got.values.tolist() == [["e", 3, 5, 9, 17, 33]]


def test_funnel3_planted(ray_session, tmp_path):
    """user 0 completes view->click->purchase in strict order; user 1's
    click precedes its view (stalls at view); user 2 never views; a
    purchase BEFORE the click (user 3) does not count as full."""
    import pyarrow.parquet as _pq

    from rayschema.queries import funnel3_view_click_purchase

    rows = [
        (0, "view", 0), (0, "click", 1), (0, "purchase", 2),
        (1, "click", 0), (1, "view", 1),
        (2, "click", 0), (2, "purchase", 1),
        (3, "view", 0), (3, "purchase", 1), (3, "click", 2),
    ]
    users = np.array([r[0] for r in rows], dtype=np.int64)
    types = [r[1] for r in rows]
    ts = np.array([r[2] for r in rows], dtype=np.int64) * 60_000_000
    tab = pa.table({
        "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "user_id": pa.array(users),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(types),
        "value": pa.array(np.ones(len(rows))),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = funnel3_view_click_purchase(str(tmp_path))
    assert got.values.tolist() == [[4, 3, 2, 1]]


def test_target_encode_planted(ray_session, tmp_path):
    """source s: 2 en of 3 -> (2+1)*1e6 // (3+2) = 600000; source t
    with 0 en -> 1e6 // 3 = 333333 (the prior pull, never 0)."""
    import pyarrow.parquet as _pq

    from rayschema.queries import target_encode_source

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["x" * 60] * 4,
        "lang": ["en", "en", "de", "fr"],
        "source": ["s", "s", "s", "t"],
        "n_chars": np.array([60] * 4, dtype=np.int64)})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = target_encode_source(str(tmp_path))
    assert got.values.tolist() == [["s", 3, 2, 600_000],
                                   ["t", 1, 0, 333_333]]


def test_lorenz_points_planted(ray_session, tmp_path):
    """4 events with cents [100, 100, 100, 500] (tot 800): depth
    sequence ceil(4k/10) = [1,1,2,2,2,3,3,4,4,4]; cum value splits the
    100-bucket exactly -> shares [125000 x5, 250000, 250000,
    375000 x..., 1000000]."""
    import pyarrow.parquet as _pq

    from rayschema.queries import lorenz_points_by_type

    tab = pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "user_id": pa.array(np.zeros(4, dtype=np.int64)),
        "ts": pa.array(np.arange(4, dtype=np.int64) * 60_000_000)
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 4),
        "value": pa.array([1.0, 1.0, 1.0, 5.0]),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = lorenz_points_by_type(str(tmp_path))
    assert got["depth"].tolist() == [1, 1, 2, 2, 2, 3, 3, 4, 4, 4]
    assert got["cum_cents"].tolist() == [100, 100, 200, 200, 200,
                                         300, 300, 800, 800, 800]
    assert got["share_ppm"].tolist() == [125_000, 125_000, 250_000,
                                         250_000, 250_000, 375_000,
                                         375_000, 1_000_000,
                                         1_000_000, 1_000_000]


def test_haar_decompose_planted(ray_session, tmp_path):
    """Counts [3,1] at hours 0,1 (rest zero): d1[0]=3-1=2, s1[0]=4;
    d2[0]=4-0=4, s2[0]=4; d3[0]=4, s3=[4,0,0,0]; all other detail
    coefficients zero."""
    import pyarrow.parquet as _pq

    from rayschema.queries import haar_hourly_decompose

    ts = np.array([0, 0, 0, 3_600_000_000], dtype=np.int64)
    tab = pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "user_id": pa.array(np.zeros(4, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 4),
        "value": pa.array(np.ones(4)),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = haar_hourly_decompose(str(tmp_path))
    m = {(k, i): c for k, i, c in got.values.tolist()}
    assert m[("d1", 0)] == 2 and m[("d2", 0)] == 4 \
        and m[("d3", 0)] == 4 and m[("s3", 0)] == 4
    assert sum(abs(v) for (k, _), v in m.items() if k != "s3") == 10
    assert [m[("s3", i)] for i in range(4)] == [4, 0, 0, 0]
    assert len(got) == 16 + 8 + 4 + 4


def test_vocab_coverage_planted(ray_session, tmp_path):
    """Words: a x4, b x2, c x1 (total 7). top-10 covers all 3 words
    (n_words_at_k=3, coverage 7/7); ties/truncation exercised."""
    import pyarrow.parquet as _pq

    from rayschema.queries import vocab_coverage_curve

    df = pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": ["a a b c", "a a b"],
        "lang": ["en", "en"],
        "source": ["s", "s"],
        "n_chars": np.array([7, 5], dtype=np.int64)})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = vocab_coverage_curve(str(tmp_path))
    assert got.values.tolist() == [
        [10, 3, 7, 7, 1_000_000],
        [100, 3, 7, 7, 1_000_000],
        [1000, 3, 7, 7, 1_000_000]]


def test_user_lifetime_survival_planted(ray_session, tmp_path):
    """user 0 spans 2.5 days (life 2), user 1 a single event (life 0):
    day0 -> 2 users, day1/day2 -> 1 user, day3+ -> 0."""
    import pyarrow.parquet as _pq

    from rayschema.queries import user_lifetime_survival

    day = 86_400_000_000
    ts = np.array([0, day * 5 // 2, day], dtype=np.int64)
    tab = pa.table({
        "event_id": pa.array(np.arange(3, dtype=np.int64)),
        "user_id": pa.array(np.array([0, 0, 1], dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 3),
        "value": pa.array(np.ones(3)),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = user_lifetime_survival(str(tmp_path))
    assert got["n_surviving"].tolist() == [2, 1, 1] + [0] * 27
    assert got["survival_ppm"].tolist()[:3] == [1_000_000, 500_000,
                                                500_000]


def test_spearman_planted(ray_session, tmp_path):
    """qty [1,1,2], price [10,20,30]: qty r2 for value 1 = 2*2-2+1 = 3
    (both rows), for 2 = 2*3-1+1 = 6; price r2 = 1,3,5 doubled ->
    2*1-1+1=2, 2*2-1+1=4, 2*3-1+1=6. sums: x=3+3+6=12, y=2+4+6=12,
    xy=6+12+36=54, x2=9+9+36=54, y2=4+16+36=56."""
    import pyarrow.parquet as _pq

    from rayschema.queries import spearman_quantity_price

    tab = pa.table({
        "l_orderkey": pa.array(np.arange(3, dtype=np.int64)),
        "l_quantity": pa.array([1.0, 1.0, 2.0]),
        "l_extendedprice": pa.array([10.0, 20.0, 30.0]),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "lineitem.parquet"))
    got = spearman_quantity_price(str(tmp_path))
    assert got[["n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"]] \
        .values.tolist() == [[3, 12, 12, 54, 54, 56]]


def test_chi2_word_lang_planted(ray_session, tmp_path):
    """10 docs: 5 en, 5 de. 'foo' in all 5 en docs and 1 de doc
    (dfw=6): for en a=5,b=1,c=0,d=4 -> delta=20, chi2_ppm =
    1e6*10*400 // (6*4*5*5) = 6666666. For de delta = 1*0-5*4 < 0
    (dropped). 'bar' in 3 de docs only (dfw=3 < 5: dropped).
    Filler words 'pad0..pad9' appear once each (dfw=1: dropped)."""
    import pyarrow.parquet as _pq

    from rayschema.queries import chi2_word_lang

    texts, langs = [], []
    for i in range(5):
        texts.append("foo pad%d" % i)
        langs.append("en")
    texts.append("foo bar pad5")
    langs.append("de")
    for i in range(2):
        texts.append("bar pad%d" % (6 + i))
        langs.append("de")
    texts.extend(["pad8", "pad9"])
    langs.extend(["de", "de"])
    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": texts, "lang": langs, "source": ["s"] * 10,
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    got = chi2_word_lang(str(tmp_path))
    assert got.values.tolist() == [["en", "foo", 5, 6666666, 1]]


def test_gini_stump_planted(ray_session, tmp_path):
    """values 1,2,3,4 cents with purchase flags 0,0,1,1: the perfect
    split at 2 has aL=0,bL=2,aR=2,bR=0 -> score 0; split at 1:
    (0*1*3 + 2*1*2)//... = 1e12*4 // 3; split at 3: symmetric.
    Winner = threshold 200 cents (value 2.0), score_p12 0."""
    import pyarrow.parquet as _pq

    from rayschema.queries import gini_stump_value_purchase

    tab = pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "user_id": pa.array(np.zeros(4, dtype=np.int64)),
        "ts": pa.array(np.zeros(4, dtype=np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["view", "click", "purchase", "purchase"]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0]),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = gini_stump_value_purchase(str(tmp_path))
    assert got.values.tolist() == [[200, 2, 0, 2, 2, 0]]


def test_conversion_latency_planted(ray_session, tmp_path):
    """Three converting users with gaps 10, 20, 40 min (user 3 purchases
    BEFORE viewing: excluded). n=3: q1 pos4=2 -> lo=0,r=2 ->
    10*2+20*2=60; q2 pos4=4 -> lo=1,r=0 -> 20*4=80; q3 pos4=6 ->
    lo=1,r=2 -> 20*2+40*2=120."""
    import pyarrow.parquet as _pq

    from rayschema.queries import conversion_latency_quartiles

    m = 60_000_000
    rows = [
        (0, 0, "view"), (0, 10 * m, "purchase"),
        (1, 0, "view"), (1, 20 * m, "purchase"),
        (2, 0, "view"), (2, 40 * m, "purchase"),
        (3, 5 * m, "purchase"), (3, 10 * m, "view"),
    ]
    tab = pa.table({
        "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "user_id": pa.array(np.array([r[0] for r in rows],
                                     dtype=np.int64)),
        "ts": pa.array(np.array([r[1] for r in rows], dtype=np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array(np.ones(len(rows))),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = conversion_latency_quartiles(str(tmp_path))
    assert got.values.tolist() == [[1, 3, 60], [2, 3, 80], [3, 3, 120]]


def test_feature_hash_buckets_planted(ray_session, tmp_path):
    """Tokens 'ab' x3 (two docs) and 'c' x1: expected buckets/signs
    recomputed from the documented polynomial-hash formula in pure
    Python ints, independent of the vectorized implementation."""
    from rayschema.queries import feature_hash_buckets

    def hash_of(tok):
        m, h1, h2 = 2147483647, 0, 0
        for ch in tok:
            h1 = (h1 * 1000003 + ord(ch) + 1) % m
            h2 = (h2 * 999983 + ord(ch) + 1) % m
        return (h1 << 31) + h2

    df = pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": ["ab ab c", "ab"],
        "lang": ["en", "en"],
        "source": ["s", "s"],
        "n_chars": np.array([7, 2], dtype=np.int64)})
    got = feature_hash_buckets(_write_docs(tmp_path, df))

    exp = {}
    for tok, cnt, docs in (("ab", 3, 2), ("c", 1, 1)):
        h = hash_of(tok)
        b = h % 64
        sgn = -1 if (h >> 6) & 1 else 1
        e = exp.setdefault(b, [0, 0, set()])
        e[0] += cnt
        e[1] += sgn * cnt
        e[2].add(tok)
    # distinct-doc counts: 'ab' reaches both docs, 'c' only doc 0;
    # if both tokens collide into one bucket n_docs is still 2
    nd = {b: (2 if "ab" in toks else 1) for b, (_, _, toks) in exp.items()}
    want = sorted((b, n, s, nd[b]) for b, (n, s, _) in exp.items())
    assert got.values.tolist() == [list(w) for w in want]


def test_scd2_user_state_planted(ray_session, tmp_path):
    """user 0: types A,A,B,A at ts 0,1,2,3 us -> three validity rows
    (A:[0,2) n=2, B:[2,3) n=1, A:[3,open) n=1); user 1: one open row."""
    from rayschema.queries import scd2_user_state

    tab = pa.table({
        "event_id": pa.array(np.arange(5, dtype=np.int64)),
        "user_id": pa.array(np.array([0, 0, 0, 0, 1], dtype=np.int64)),
        "ts": pa.array(np.array([0, 1, 2, 3, 7], dtype=np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["A", "A", "B", "A", "Z"]),
        "value": pa.array(np.ones(5)),
    })
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = scd2_user_state(str(tmp_path))
    assert got.values.tolist() == [
        [0, 1, "A", 0, 2, 2],
        [0, 2, "B", 2, 3, 1],
        [0, 3, "A", 3, -1, 1],
        [1, 1, "Z", 7, -1, 1]]


def test_orders_in_flight_planted(ray_session, tmp_path, monkeypatch):
    """ok=1 spans 1995-01-15..1995-03-10 (open at Feb and Mar month
    starts), ok=2 placed exactly ON 1995-02-01 and ships 02-20 (Feb
    only — start-equals-month-start edge), ok=3 has no lineitems and
    drops. Scale path (cap=0, Ray groupby + in-map delta partials)
    must agree exactly."""
    import rayschema.queries as Q
    from rayschema.queries import orders_in_flight_monthly

    day_us = 86_400_000_000

    def d(y, m, dd):
        return (np.datetime64(f"{y:04d}-{m:02d}-{dd:02d}")
                .astype("datetime64[us]").astype(np.int64))

    orders = pa.table({
        "o_orderkey": pa.array(np.array([1, 2, 3], dtype=np.int64)),
        "o_custkey": pa.array(np.zeros(3, dtype=np.int64)),
        "o_orderstatus": pa.array(["O"] * 3),
        "o_totalprice": pa.array(np.ones(3)),
        "o_orderdate": pa.array(np.array(
            [d(1995, 1, 15), d(1995, 2, 1), d(1995, 6, 1)],
            dtype=np.int64)).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 3)})
    li = pa.table({
        "l_orderkey": pa.array(np.array([1, 1, 2], dtype=np.int64)),
        "l_shipdate": pa.array(np.array(
            [d(1995, 2, 5), d(1995, 3, 10), d(1995, 2, 20)],
            dtype=np.int64)).cast(pa.timestamp("us"))})
    pq.write_table(orders, os.path.join(tmp_path, "orders.parquet"))
    pq.write_table(li, os.path.join(tmp_path, "lineitem.parquet"))

    want = [[1995, 2, 2], [1995, 3, 1]]
    got = orders_in_flight_monthly(str(tmp_path))
    assert got.values.tolist() == want

    monkeypatch.setattr(Q, "TRIPLE_DRIVER_MERGE_CAP", 0)
    got2 = orders_in_flight_monthly(str(tmp_path))
    assert got2.values.tolist() == want


def test_dbscan_embeddings_planted(ray_session, tmp_path):
    """x-axis line: three points at 0 and two at 1 (each sees >= 5
    in-eps incl self -> core, one component labeled 0), one at 2 (3
    in-eps -> border of that component), one at 10 (noise). eps ~= 1.19
    in raw coords (1.42e12 on 1e-6-quantized ints)."""
    from rayschema.queries import dbscan_embeddings

    xs = [0.0, 0.0, 0.0, 1.0, 1.0, 2.0, 10.0]
    emb = [[x] + [0.0] * 63 for x in xs]
    tab = pa.table({
        "vec_id": pa.array(np.arange(7, dtype=np.int64)),
        "embedding": pa.array(emb, type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(7, dtype=np.int32))})
    pq.write_table(tab, os.path.join(tmp_path, "embeddings.parquet"))
    got = dbscan_embeddings(str(tmp_path))
    assert got.values.tolist() == [
        [0, "core", 0], [1, "core", 0], [2, "core", 0],
        [3, "core", 0], [4, "core", 0],
        [5, "border", 0], [6, "noise", -1]]


def test_bootstrap_ci_value_planted(ray_session, tmp_path):
    """Two events (ids 0/1, cents 100/300): expected weights recomputed
    from the documented hash formula in pure Python; replicates with
    zero total weight drop."""
    from rayschema.queries import bootstrap_ci_value

    tab = pa.table({
        "event_id": pa.array(np.array([0, 1], dtype=np.int64)),
        "user_id": pa.array(np.zeros(2, dtype=np.int64)),
        "ts": pa.array(np.array([0, 1], dtype=np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["e", "e"]),
        "value": pa.array([1.0, 3.0])})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = bootstrap_ci_value(str(tmp_path))

    want = []
    for b in range(16):
        w0 = ((0 * 2654435761 + b * 97) % 1000003) % 3
        w1 = ((1 * 2654435761 + b * 97) % 1000003) % 3
        if w0 + w1 > 0:
            want.append(["e", b, w0 + w1,
                         1000 * (w0 * 100 + w1 * 300) // (w0 + w1)])
    assert got.values.tolist() == want
    assert len(want) >= 12   # the planted ids must exercise most reps


def test_hll_registers_cert_planted(ray_session, tmp_path):
    """user 0 hashes to 0 (register 0, all-zero window -> rho 27);
    user 1 hashes to 2654435761 (register 39, 26-bit window -> rho 1).
    Duplicates of user 1 must not move the max."""
    from rayschema.queries import hll_registers_cert

    tab = pa.table({
        "event_id": pa.array(np.arange(3, dtype=np.int64)),
        "user_id": pa.array(np.array([0, 1, 1], dtype=np.int64)),
        "ts": pa.array(np.zeros(3, dtype=np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 3),
        "value": pa.array(np.ones(3))})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = hll_registers_cert(str(tmp_path))
    h1 = (1 * 2654435761) % (1 << 32)
    assert got.values.tolist() == [
        [0, 27], [h1 >> 26, 27 - (h1 & ((1 << 26) - 1)).bit_length()]]


def test_twap_user_value_planted(ray_session, tmp_path):
    """user 0: cents 100 for 3us then 300 for 1us -> (300+300)/4=150
    -> 150000 milli; the last value never weighs in. user 1: single
    event drops; user 2: two events at the SAME ts (zero duration)
    drop."""
    from rayschema.queries import twap_user_value

    tab = pa.table({
        "event_id": pa.array(np.arange(6, dtype=np.int64)),
        "user_id": pa.array(np.array([0, 0, 0, 1, 2, 2],
                                     dtype=np.int64)),
        "ts": pa.array(np.array([0, 3, 4, 9, 5, 5], dtype=np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 6),
        "value": pa.array([1.0, 3.0, 9.0, 2.0, 4.0, 4.0])})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = twap_user_value(str(tmp_path))
    assert got.values.tolist() == [[0, 4, 150_000]]


def test_kcenter_select_planted(ray_session, tmp_path):
    """1-D line at x = 0, 10, 3, 9: seed 0; round 2 picks 1 (x=10,
    d2=(1e7)^2); round 3 picks 3 (x=9 is 1 from x=10 but 9 from 0 ->
    dmin 1e12... no: dmin to {0,10} is min(81,1)=1 -> x=3 has
    min(9,49)=9 -> picks id 2 (x=3, d2=9e12); round 4 takes the
    leftover id 3 (x=9, d2=1e12); rounds 5+ have no candidates and
    stop early."""
    from rayschema.queries import kcenter_select_embeddings

    xs = [0.0, 10.0, 3.0, 9.0]
    emb = [[x] + [0.0] * 63 for x in xs]
    tab = pa.table({
        "vec_id": pa.array(np.arange(4, dtype=np.int64)),
        "embedding": pa.array(emb, type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(4, dtype=np.int32))})
    pq.write_table(tab, os.path.join(tmp_path, "embeddings.parquet"))
    got = kcenter_select_embeddings(str(tmp_path))
    M = 10**12
    assert got.values.tolist() == [
        [1, 0, -1],
        [2, 1, 100 * M],
        [3, 2, 9 * M],
        [4, 3, 1 * M]]


def test_corr_matrix_planted(ray_session, tmp_path):
    """Two rows: qty [1,2], price [10,20], disc_bp [500,1000],
    tax_bp [800,0] — every pair is perfectly +/- correlated; moments
    hand-traced (e.g. disc-tax: num -400000, den 400000 -> -1e6)."""
    from rayschema.queries import corr_matrix_lineitem

    tab = pa.table({
        "l_quantity": pa.array([1.0, 2.0]),
        "l_extendedprice": pa.array([10.0, 20.0]),
        "l_discount": pa.array([0.05, 0.10]),
        "l_tax": pa.array([0.08, 0.0])})
    pq.write_table(tab, os.path.join(tmp_path, "lineitem.parquet"))
    got = corr_matrix_lineitem(str(tmp_path))
    assert got.values.tolist() == [
        ["disc", "tax", 2, 1500, 800, 400000, 1250000, 640000,
         -1000000],
        ["price", "disc", 2, 30, 1500, 25000, 500, 1250000, 1000000],
        ["price", "tax", 2, 30, 800, 8000, 500, 640000, -1000000],
        ["qty", "disc", 2, 3, 1500, 2500, 5, 1250000, 1000000],
        ["qty", "price", 2, 3, 30, 50, 5, 500, 1000000],
        ["qty", "tax", 2, 3, 800, 800, 5, 640000, -1000000]]


def test_revenue_recognition_planted(ray_session, tmp_path, monkeypatch):
    """ok=1 (10001 cents over Feb+Mar) splits 5001/5000 — the
    remainder cent lands on the EARLIEST month; ok=2 (10000 cents,
    Feb only) takes its full value; ok=3 has no lineitems and drops.
    Scale path (cap=0) must agree."""
    import rayschema.queries as Q
    from rayschema.queries import revenue_recognition_monthly

    def d(y, m, dd):
        return (np.datetime64(f"{y:04d}-{m:02d}-{dd:02d}")
                .astype("datetime64[us]").astype(np.int64))

    orders = pa.table({
        "o_orderkey": pa.array(np.array([1, 2, 3], dtype=np.int64)),
        "o_custkey": pa.array(np.zeros(3, dtype=np.int64)),
        "o_orderstatus": pa.array(["O"] * 3),
        "o_totalprice": pa.array([100.01, 100.0, 7.0]),
        "o_orderdate": pa.array(np.array(
            [d(1995, 1, 15), d(1995, 2, 1), d(1995, 6, 1)],
            dtype=np.int64)).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 3)})
    li = pa.table({
        "l_orderkey": pa.array(np.array([1, 1, 2], dtype=np.int64)),
        "l_shipdate": pa.array(np.array(
            [d(1995, 2, 5), d(1995, 3, 10), d(1995, 2, 20)],
            dtype=np.int64)).cast(pa.timestamp("us"))})
    pq.write_table(orders, os.path.join(tmp_path, "orders.parquet"))
    pq.write_table(li, os.path.join(tmp_path, "lineitem.parquet"))

    want = [[1995, 2, 15001], [1995, 3, 5000]]
    assert revenue_recognition_monthly(str(tmp_path)) \
        .values.tolist() == want
    monkeypatch.setattr(Q, "TRIPLE_DRIVER_MERGE_CAP", 0)
    assert revenue_recognition_monthly(str(tmp_path)) \
        .values.tolist() == want


def test_rfm_user_scores_planted(ray_session, tmp_path):
    """Three users, n=3 so ntile(5) gives each position its own
    bucket: u0 (last day 2, 2 events, 100 cents — null value counts
    0), u1 (day 2, 1 event, 300), u2 (day 0, 1 event, 200); scores
    hand-traced with the user_id tiebreak on equal recency."""
    from rayschema.queries import rfm_user_scores

    day = 86_400_000_000
    tab = pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "user_id": pa.array(np.array([0, 0, 1, 2], dtype=np.int64)),
        "ts": pa.array(np.array([0, 2 * day, 2 * day, 0],
                                dtype=np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 4),
        "value": pa.array([1.0, None, 3.0, 2.0])})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = rfm_user_scores(str(tmp_path))
    assert got.values.tolist() == [
        [0, 0, 2, 100, 1, 1, 3, 113],
        [1, 0, 1, 300, 2, 2, 1, 221],
        [2, 2, 1, 200, 3, 3, 2, 332]]


def test_cohort_retention_matrix_planted(ray_session, tmp_path):
    """u0 active weeks 0 and 2 (cohort 0, offsets 0 and 2 — twice in
    week 0 counts ONCE), u1 first active week 1 only, u2 weeks 1 and
    2 (cohort 1 offsets 0,1)."""
    from rayschema.queries import cohort_retention_matrix

    wk = 604_800_000_000
    ts = np.array([0, 1, 2 * wk, wk, wk + 5, 2 * wk + 5],
                  dtype=np.int64)
    tab = pa.table({
        "event_id": pa.array(np.arange(6, dtype=np.int64)),
        "user_id": pa.array(np.array([0, 0, 0, 1, 2, 2],
                                     dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 6),
        "value": pa.array(np.ones(6))})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = cohort_retention_matrix(str(tmp_path))
    assert got.values.tolist() == [
        [0, 0, 1], [0, 2, 1],
        [1, 0, 2], [1, 1, 1]]


def test_session_length_histogram_planted(ray_session, tmp_path):
    """u0: two events 10s apart (one 2-session) then one 31 min later
    (a 1-session bounce); u1: one event. Histogram: size 1 x2
    (666666 ppm), size 2 x1 (333333 ppm)."""
    from rayschema.queries import session_length_histogram

    m = 60_000_000
    ts = np.array([0, 10_000_000, 41 * m, 5], dtype=np.int64)
    tab = pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "user_id": pa.array(np.array([0, 0, 0, 1], dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 4),
        "value": pa.array(np.ones(4))})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = session_length_histogram(str(tmp_path))
    assert got.values.tolist() == [
        [1, 2, 666_666], [2, 1, 333_333]]


def test_silhouette_kmeans_planted(ray_session, tmp_path):
    """Four tight 2-point groups at x = 0, 10, 20, 30 (+1 offsets):
    k-means (init ids 0..3) settles each group into its own cluster.
    Hand-traced: id0 a_milli = 1000 * (1e6)^2 = 1e15; nearest other
    cluster {x=10, 11} gives b_milli = 1000 * (1e14 + 1.21e14) // 2;
    s_ppm = 1e6 * (b - a) // b = 990950. id4 (x=1) sees b from
    (9e6)^2 + (10e6)^2 -> s_ppm = 988950."""
    from rayschema.queries import silhouette_kmeans

    xs = [0.0, 10.0, 20.0, 30.0, 1.0, 11.0, 21.0, 31.0]
    emb = [[x] + [0.0] * 63 for x in xs]
    tab = pa.table({
        "vec_id": pa.array(np.arange(8, dtype=np.int64)),
        "embedding": pa.array(emb, type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(8, dtype=np.int32))})
    pq.write_table(tab, os.path.join(tmp_path, "embeddings.parquet"))
    got = silhouette_kmeans(str(tmp_path))
    assert got["cluster"].tolist() == [0, 1, 2, 3, 0, 1, 2, 3]
    r0 = got[got.vec_id == 0].iloc[0]
    assert r0["a_milli"] == 10**15
    assert r0["b_milli"] == 1000 * (10**14 + 121 * 10**12) // 2
    assert r0["s_ppm"] == 990950
    r4 = got[got.vec_id == 4].iloc[0]
    assert r4["s_ppm"] == 988950
    assert (got["s_ppm"] > 900_000).all()


def test_debounced_events_planted(ray_session, tmp_path):
    """u0 type A at 0s, 3s, 7s: the 3s event drops (gap 3s <= 5s), the
    7s one survives (gap to RAW predecessor 4s... no: 7-3=4 <= 5 so it
    drops too under raw-predecessor semantics — exactly the trap this
    pins). Interleaved type B at 1s never debounces A. u1 type A at
    100s is independent."""
    from rayschema.queries import debounced_events

    s = 1_000_000
    tab = pa.table({
        "event_id": pa.array(np.arange(5, dtype=np.int64)),
        "user_id": pa.array(np.array([0, 0, 0, 0, 1], dtype=np.int64)),
        "ts": pa.array(np.array([0, 3 * s, 7 * s, 1 * s, 100 * s],
                                dtype=np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["A", "A", "A", "B", "A"]),
        "value": pa.array(np.ones(5))})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = debounced_events(str(tmp_path))
    assert got.values.tolist() == [
        ["A", 4, 2, 2],
        ["B", 1, 1, 0]]


def test_wau_stickiness_planted(ray_session, tmp_path):
    """Week 0: u0 active days 0 and 1 (two pairs — twice on day 0
    counts once), u1 day 0 -> wau 2, sum_dau 3, stickiness
    1e6*3 // 14 = 214285. Week 1: u0 day 7 -> wau 1, sum_dau 1."""
    from rayschema.queries import wau_stickiness

    day = 86_400_000_000
    ts = np.array([0, 5, day, 0, 7 * day], dtype=np.int64)
    tab = pa.table({
        "event_id": pa.array(np.arange(5, dtype=np.int64)),
        "user_id": pa.array(np.array([0, 0, 0, 1, 0], dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 5),
        "value": pa.array(np.ones(5))})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = wau_stickiness(str(tmp_path))
    assert got.values.tolist() == [
        [0, 2, 3, 214_285],
        [1, 1, 1, 142_857]]


def test_embedding_norm_audit_planted(ray_session, tmp_path):
    """label 0: a zero vector and a unit-x vector (n2 = 1e12);
    label 1: one vector at x=2 (n2 = 4e12)."""
    from rayschema.queries import embedding_norm_audit

    emb = [[0.0] * 64, [1.0] + [0.0] * 63, [2.0] + [0.0] * 63]
    tab = pa.table({
        "vec_id": pa.array(np.arange(3, dtype=np.int64)),
        "embedding": pa.array(emb, type=pa.list_(pa.float32())),
        "label": pa.array(np.array([0, 0, 1], dtype=np.int32))})
    pq.write_table(tab, os.path.join(tmp_path, "embeddings.parquet"))
    got = embedding_norm_audit(str(tmp_path))
    T = 10**12
    assert got.values.tolist() == [
        [0, 2, 1, 0, T, T],
        [1, 1, 0, 4 * T, 4 * T, 4 * T]]


def test_optimal_segmentation_planted(ray_session, tmp_path):
    """Counts: hours 0-7 flat 2/hour, hours 8-15 flat 5/hour, rest 0
    -> optimal 3 segments are exactly [0,8) [8,16) [16,24), each with
    zero SSE; n_events = 16, 40, 0."""
    from rayschema.queries import optimal_segmentation_hourly

    hr = 3_600_000_000
    hours = [h for h in range(8) for _ in range(2)] \
        + [h for h in range(8, 16) for _ in range(5)]
    ts = np.array([h * hr for h in hours], dtype=np.int64)
    n = len(ts)
    tab = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * n),
        "value": pa.array(np.ones(n))})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = optimal_segmentation_hourly(str(tmp_path))
    assert got.values.tolist() == [
        [1, 0, 8, 16, 0],
        [2, 8, 16, 40, 0],
        [3, 16, 24, 0, 0]]


def test_theil_sen_planted(ray_session, tmp_path):
    """Counts exactly h+1 per hour (perfect slope 1): every pairwise
    slope is 1000 milli -> median 1000, 276 pairs."""
    from rayschema.queries import theil_sen_hourly

    hr = 3_600_000_000
    hours = [h for h in range(24) for _ in range(h + 1)]
    ts = np.array([h * hr for h in hours], dtype=np.int64)
    n = len(ts)
    tab = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * n),
        "value": pa.array(np.ones(n))})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = theil_sen_hourly(str(tmp_path))
    assert got.values.tolist() == [[276, 1000]]


def test_user_activity_gini_planted(ray_session, tmp_path):
    """Counts [1, 1, 6]: num = (2*1-4)*1 + (2*2-4)*1 + (2*3-4)*6 = -2
    + 0 + 12 = 10; gini = 1e6*10 // (3*8) = 416666."""
    from rayschema.queries import user_activity_gini

    uid = np.array([0, 1] + [2] * 6, dtype=np.int64)
    n = len(uid)
    tab = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(uid),
        "ts": pa.array(np.arange(n, dtype=np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * n),
        "value": pa.array(np.ones(n))})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = user_activity_gini(str(tmp_path))
    assert got.values.tolist() == [[3, 8, 416_666]]


def test_padding_waste_planted(ray_session, tmp_path):
    """Docs of 100 and 200 whitespace tokens land in buckets 128/256
    with waste 28 and 56; a 20000-token doc clips to the 16384 top
    (zero waste after clipping)."""
    from rayschema.queries import padding_waste_audit

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["w " * 99 + "w", "w " * 199 + "w",
                 "w " * 19999 + "w"],
        "lang": ["en"] * 3, "source": ["s"] * 3,
        "n_chars": np.array([0, 0, 0], dtype=np.int64)})
    got = padding_waste_audit(_write_docs(tmp_path, df))
    assert got.values.tolist() == [
        [128, 1, 100, 28, 218_750],
        [256, 1, 200, 56, 218_750],
        [16384, 1, 16384, 0, 0]]


def test_user_type_venn_planted(ray_session, tmp_path):
    """u0 view-only, u1 view+click (click twice — OR not count), u2
    all three, u3 only 'error' events (excluded entirely)."""
    from rayschema.queries import user_type_venn

    et = ["view", "view", "click", "click",
          "view", "click", "purchase", "error"]
    uid = np.array([0, 1, 1, 1, 2, 2, 2, 3], dtype=np.int64)
    n = len(et)
    tab = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(uid),
        "ts": pa.array(np.arange(n, dtype=np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array(et),
        "value": pa.array(np.ones(n))})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = user_type_venn(str(tmp_path))
    assert got.values.tolist() == [
        [1, "view", 1],
        [3, "view+click", 1],
        [7, "view+click+purchase", 1]]


def test_orders_aging_planted(ray_session, tmp_path):
    """Anchor = max order date over ALL orders (day 100, a closed
    order). Open orders at ages 100, 31, 30 land in 90+/31-60/0-30;
    the closed order itself is excluded from the buckets."""
    from rayschema.queries import orders_aging_buckets

    day_us = 86_400_000_000
    days = np.array([0, 69, 70, 100], dtype=np.int64)
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(4, dtype=np.int64)),
        "o_custkey": pa.array(np.zeros(4, dtype=np.int64)),
        "o_orderstatus": pa.array(["O", "O", "O", "F"]),
        "o_totalprice": pa.array([1.0, 2.0, 3.0, 9.0]),
        "o_orderdate": pa.array(days * day_us)
        .cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4)})
    pq.write_table(orders, os.path.join(tmp_path, "orders.parquet"))
    got = orders_aging_buckets(str(tmp_path))
    assert got.values.tolist() == [
        ["0-30", 0, 30, 1, 300],
        ["31-60", 31, 60, 1, 200],
        ["90+", 91, -1, 1, 100]]


def test_customer_order_cadence_planted(ray_session, tmp_path):
    """cust 0: orders on days 0, 0, 10 -> 3 orders, 2 distinct dates,
    span 10, mean gap 10000 milli; cust 1 single-date drops."""
    from rayschema.queries import customer_order_cadence

    day_us = 86_400_000_000
    days = np.array([0, 0, 10, 5], dtype=np.int64)
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(4, dtype=np.int64)),
        "o_custkey": pa.array(np.array([0, 0, 0, 1], dtype=np.int64)),
        "o_orderstatus": pa.array(["O"] * 4),
        "o_totalprice": pa.array(np.ones(4)),
        "o_orderdate": pa.array(days * day_us)
        .cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4)})
    pq.write_table(orders, os.path.join(tmp_path, "orders.parquet"))
    got = customer_order_cadence(str(tmp_path))
    assert got.values.tolist() == [[0, 3, 2, 10, 10_000]]


def test_hhi_planted(ray_session, tmp_path):
    """Nation 0: two customers with 300/100 cents -> hhi = 1e6 *
    (90000 + 10000) // 160000 = 625000. Nation 1: monopoly -> 1e6.
    An order from an unknown custkey drops (inner-join semantics)."""
    from rayschema.queries import hhi_customer_concentration

    cust = pa.table({
        "c_custkey": pa.array(np.array([1, 2, 3], dtype=np.int64)),
        "c_name": pa.array(["a", "b", "c"]),
        "c_nationkey": pa.array(np.array([0, 0, 1], dtype=np.int32)),
        "c_acctbal": pa.array(np.zeros(3)),
        "c_mktsegment": pa.array(["M"] * 3)})
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(5, dtype=np.int64)),
        "o_custkey": pa.array(np.array([1, 1, 2, 3, 99],
                                       dtype=np.int64)),
        "o_orderstatus": pa.array(["O"] * 5),
        "o_totalprice": pa.array([1.0, 2.0, 1.0, 5.0, 7.0]),
        "o_orderdate": pa.array(np.zeros(5, dtype=np.int64))
        .cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 5)})
    pq.write_table(cust, os.path.join(tmp_path, "customer.parquet"))
    pq.write_table(orders, os.path.join(tmp_path, "orders.parquet"))
    got = hhi_customer_concentration(str(tmp_path))
    assert got.values.tolist() == [
        [0, 2, 400, 625_000],
        [1, 1, 500, 1_000_000]]


def test_journey_archetypes_planted(ray_session, tmp_path):
    """u0 A,B,A -> 'A>B' (repeat A dedups); u1 A,B -> 'A>B'; u2 B,A at
    the SAME ts -> event_id breaks the tie -> 'B>A' (B has the lower
    event_id). Top list: A>B x2 then B>A."""
    from rayschema.queries import journey_archetypes

    tab = pa.table({
        "event_id": pa.array(np.array([0, 1, 2, 3, 4, 5, 6],
                                      dtype=np.int64)),
        "user_id": pa.array(np.array([0, 0, 0, 1, 1, 2, 2],
                                     dtype=np.int64)),
        "ts": pa.array(np.array([0, 1, 2, 0, 1, 5, 5],
                                dtype=np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["A", "B", "A", "A", "B", "B", "A"]),
        "value": pa.array(np.ones(7))})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = journey_archetypes(str(tmp_path))
    assert got.values.tolist() == [
        ["A>B", 2, 1], ["B>A", 1, 2]]


def test_token_budget_sample_planted(ray_session, tmp_path):
    """Three 5-token docs (total 15, budget 7): only the first doc in
    hash order fits (cum 5 <= 7, next cum 10 > 7) — expected order
    recomputed from the documented hash formula in pure Python."""
    from rayschema.queries import token_budget_sample

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a b c d e"] * 3,
        "lang": ["en"] * 3,
        "source": ["s"] * 3,
        "n_chars": np.array([9] * 3, dtype=np.int64)})
    got = token_budget_sample(_write_docs(tmp_path, df))
    hs = sorted(range(3),
                key=lambda i: (((i % 100003) * 2654435761)
                               % (1 << 32), i))
    assert hs  # order exists; greedy prefix keeps exactly one doc
    assert got.values.tolist() == [["en", 15, 7, 1, 5]]


def test_cms_join_size_planted(ray_session, tmp_path):
    """Users [0, 0, 1]: true self-join size 2^2 + 1 = 5; every plane's
    dot >= 5 (AGMS bound), equality when the two keys don't collide
    in that plane — expected dots recomputed from the documented
    hash in pure Python."""
    from rayschema.queries import cms_join_size_estimate

    tab = pa.table({
        "event_id": pa.array(np.arange(3, dtype=np.int64)),
        "user_id": pa.array(np.array([0, 0, 1], dtype=np.int64)),
        "ts": pa.array(np.zeros(3, dtype=np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 3),
        "value": pa.array(np.ones(3))})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = cms_join_size_estimate(str(tmp_path))

    def cell(u, a):
        return ((u * a) % (1 << 32) >> 16) % 64

    want = []
    for j, a in ((0, 2654435761), (1, 2246822519),
                 (2, 3266489917), (3, 668265263)):
        if cell(0, a) == cell(1, a):
            dot = 9
        else:
            dot = 4 + 1
        want.append([j, dot, 5, dot - 5])
    assert got.values.tolist() == want
    assert (got["overcount"] >= 0).all()


def test_dedup_rate_curve_planted(ray_session, tmp_path):
    """1500 docs: ids 0..999 all distinct; ids 1000..1499 duplicate
    text 'dup'. depth 1000 -> 0 ppm; depth 2000 -> 1500 docs, 1001
    distinct, dup_ppm = 1e6*499//1500 = 332666."""
    from rayschema.queries import dedup_rate_curve

    n = 1500
    texts = [f"unique {i}" for i in range(1000)] + ["dup"] * 500
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": ["en"] * n, "source": ["s"] * n,
        "n_chars": np.zeros(n, dtype=np.int64)})
    got = dedup_rate_curve(_write_docs(tmp_path, df))
    assert got.values.tolist()[:2] == [
        [1000, 1000, 1000, 0],
        [2000, 1500, 1001, 1_000_000 * 499 // 1500]]
    # every later depth sees the same cumulative counts
    assert (got["n_docs"] == [1000] + [1500] * (len(got) - 1)).all()


def test_jaccard_threshold_sweep_planted(ray_session, tmp_path):
    """Two docs: 'abcdefghij' vs 'abcdefghiX' share 5 of 6+6-5=7
    5-grams... hand count: doc0 grams {abcde,bcdef,cdefg,defgh,efghi,
    fghij}, doc1 swaps the last gram (fghiX) -> inter 5, union 7,
    j = 0.714286: in pairs for cutoffs 20..70, out at 80. A third
    unrelated doc never pairs."""
    from rayschema.queries import jaccard_threshold_sweep

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["abcdefghij", "abcdefghiX", "zzzzzzzz"],
        "lang": ["en"] * 3, "source": ["s"] * 3,
        "n_chars": np.array([10, 10, 8], dtype=np.int64)})
    got = jaccard_threshold_sweep(_write_docs(tmp_path, df))
    assert got.values.tolist() == [
        [20, 1, 2], [30, 1, 2], [40, 1, 2], [50, 1, 2],
        [60, 1, 2], [70, 1, 2], [80, 0, 0]]


def test_schema_migration_impact_planted(ray_session, tmp_path):
    """doc 0 passes both (len 250, n_chars 250); doc 1 passes v1 only
    (len 60 < 200); doc 2 is zh (v1 yes, v2 enum drop); doc 3 fails
    both (len 10). newly_invalid counts exactly the v1-pass/v2-fail
    rows."""
    from rayschema.queries import schema_migration_impact

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["x" * 250, "y" * 60, "z" * 250, "w" * 10],
        "lang": ["en", "en", "zh", "en"],
        "source": ["src1"] * 4,
        "n_chars": np.array([250, 60, 250, 10], dtype=np.int64)})
    got = schema_migration_impact(_write_docs(tmp_path, df))
    assert got.values.tolist() == [
        ["en", 3, 2, 1, 1],
        ["zh", 1, 1, 0, 1]]


def test_dedup_waterfall_planted(ray_session, tmp_path):
    """4 docs: 'Hi  there'/'hi there' collapse at lower+ws; 'hi,
    there!' additionally collapses at alpha-only; 'bye' stays. Stages:
    4 -> 4 distinct exact; 4 -> 3 at lower+ws; 3 -> 2 at alpha-only."""
    from rayschema.queries import dedup_waterfall

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["Hi  there", "hi there", "hi, there!", "bye"],
        "lang": ["en"] * 4, "source": ["s"] * 4,
        "n_chars": np.zeros(4, dtype=np.int64)})
    got = dedup_waterfall(_write_docs(tmp_path, df))
    assert got.values.tolist() == [
        [1, "exact", 4, 4, 0],
        [2, "lower+ws", 4, 3, 1],
        [3, "alpha-only", 3, 2, 1]]


def test_part_price_dispersion_planted(ray_session, tmp_path):
    """Part 1 sells at unit prices 10.00 and 5.00 (milli-CENTS 1e6 /
    5e5, dispersion 500000); part 2 at a constant 2.00/unit
    (200000 milli-cents, 0 ppm); a zero-quantity row drops
    entirely."""
    from rayschema.queries import part_price_dispersion

    li = pa.table({
        "l_partkey": pa.array(np.array([1, 1, 2, 3], dtype=np.int64)),
        "l_quantity": pa.array([1.0, 2.0, 3.0, 0.0]),
        "l_extendedprice": pa.array([10.0, 10.0, 6.0, 9.0])})
    pq.write_table(li, os.path.join(tmp_path, "lineitem.parquet"))
    got = part_price_dispersion(str(tmp_path))
    assert got.values.tolist() == [
        [1, 2, 500_000, 1_000_000, 500_000],
        [2, 1, 200_000, 200_000, 0]]


def test_retention_by_first_type_planted(ray_session, tmp_path):
    """u0 first event 'view' day 0, returns day 3 -> retained; u1
    first 'view' day 0, next activity day 9 (outside the window) ->
    not retained; u2 first 'click' with a same-day-only burst -> not
    retained. view: 1/2 retained = 500000 ppm."""
    from rayschema.queries import retention_by_first_type

    day = 86_400_000_000
    ts = np.array([0, 3 * day, 5, 9 * day, 10, 20], dtype=np.int64)
    tab = pa.table({
        "event_id": pa.array(np.arange(6, dtype=np.int64)),
        "user_id": pa.array(np.array([0, 0, 1, 1, 2, 2],
                                     dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(["view", "click", "view", "view",
                                "click", "view"]),
        "value": pa.array(np.ones(6))})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = retention_by_first_type(str(tmp_path))
    assert got.values.tolist() == [
        ["click", 1, 0, 0],
        ["view", 2, 1, 500_000]]


def test_blocking_quality_planted(ray_session, tmp_path):
    """4 docs: two true dups ('same') split across DIFFERENT sources
    (block misses that pair -> completeness 0 of 1); three docs share
    block en|s|4 -> 3 candidate pairs of the total C(4,2)=6 ->
    reduction 500000 ppm."""
    from rayschema.queries import blocking_quality_audit

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["same", "same", "aaaa", "bbbb"],
        "lang": ["en"] * 4,
        "source": ["s", "t", "s", "s"],
        "n_chars": np.array([4, 4, 4, 4], dtype=np.int64)})
    got = blocking_quality_audit(_write_docs(tmp_path, df))
    assert got.values.tolist() == [[4, 3, 1, 0, 0, 500_000]]


def test_source_scorecard_planted(ray_session, tmp_path):
    """source s: two IDENTICAL English docs (dup 500000 ppm, langid
    en == declared, Gopher passes: 60 words, 12 stop hits); source t:
    one 2-word doc declared zh but ASCII -> langid 'unknown'
    (mismatch), Gopher fails. All ppms hand-traced."""
    from rayschema.queries import source_scorecard

    a = ("the quick brown fox jumps over the lazy dog again " * 6
         ).strip()
    b = "hola mundo"
    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": [a, a, b],
        "lang": ["en", "en", "zh"],
        "source": ["s", "s", "t"],
        "n_chars": np.array([len(a), len(a), len(b)],
                            dtype=np.int64)})
    got = source_scorecard(_write_docs(tmp_path, df))
    assert got.values.tolist() == [
        ["s", 2, 2 * len(a), 500_000, 0, 1_000_000],
        ["t", 1, len(b), 0, 1_000_000, 0]]


def test_sample_fidelity_planted(ray_session, tmp_path):
    """Expected KS recomputed independently in the test from the
    documented hash: doc_ids 0..39 with n_chars = doc_id % 4 (a
    4-value distribution); the 10%-bucket sample's exact cleared-
    denominator supremum must match the reference sweep."""
    from rayschema.queries import sample_fidelity_audit

    n = 40
    ids = np.arange(n)
    v = (ids % 4).astype(np.int64)
    df = pd.DataFrame({
        "doc_id": ids.astype(np.int64),
        "text": ["x"] * n, "lang": ["en"] * n, "source": ["s"] * n,
        "n_chars": v})
    got = sample_fidelity_audit(_write_docs(tmp_path, df))

    in_s = ((ids % 100003) * 2654435761 % 100 < 10)
    ns, nf = int(in_s.sum()), n
    d = 0
    a_s = a_f = 0
    for val in range(4):
        a_s += int(in_s[v == val].sum())
        a_f += int((v == val).sum())
        d = max(d, abs(ns * a_f - nf * a_s))
    if ns == 0:
        assert got.empty
    else:
        assert got.values.tolist() == [
            [nf, ns, d, 1_000_000 * d // (nf * ns)]]


def test_validation_drift_by_day_planted(ray_session, tmp_path):
    """Day 0: valid k=5 + invalid k=99 (out of range) -> 500000 ppm;
    day 1: null props counts VALID (absent doc convention) ->
    1000000."""
    from rayschema.queries import validation_drift_by_day

    day = 86_400_000_000
    tab = pa.table({
        "event_id": pa.array(np.arange(3, dtype=np.int64)),
        "user_id": pa.array(np.zeros(3, dtype=np.int64)),
        "ts": pa.array(np.array([0, 1, day], dtype=np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 3),
        "value": pa.array(np.ones(3)),
        "props": pa.array(['{"k": 5}', '{"k": 99}', None])})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = validation_drift_by_day(str(tmp_path))
    assert got.values.tolist() == [
        [0, 2, 1, 500_000],
        [1, 1, 1, 1_000_000]]


def test_region_quarter_lift_planted(ray_session, tmp_path):
    """2x2 grid: region 0 concentrates in Q1 (300 of its 400), region
    1 in Q2. Cell (0, Q1): lift = 1e6 * 300 * 800 // (400 * 400) =
    1500000 (50% over independence)."""
    from rayschema.queries import region_quarter_lift

    def d(m):
        return (np.datetime64(f"1995-{m:02d}-15")
                .astype("datetime64[us]").astype(np.int64))

    cust = pa.table({
        "c_custkey": pa.array(np.array([1, 2], dtype=np.int64)),
        "c_name": pa.array(["a", "b"]),
        "c_nationkey": pa.array(np.array([10, 20], dtype=np.int32)),
        "c_acctbal": pa.array(np.zeros(2)),
        "c_mktsegment": pa.array(["M"] * 2)})
    nat = pa.table({
        "n_nationkey": pa.array(np.array([10, 20], dtype=np.int32)),
        "n_name": pa.array(["N10", "N20"]),
        "n_regionkey": pa.array(np.array([0, 1], dtype=np.int32))})
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(4, dtype=np.int64)),
        "o_custkey": pa.array(np.array([1, 1, 2, 2], dtype=np.int64)),
        "o_orderstatus": pa.array(["O"] * 4),
        "o_totalprice": pa.array([3.0, 1.0, 1.0, 3.0]),
        "o_orderdate": pa.array(np.array(
            [d(2), d(5), d(2), d(5)], dtype=np.int64))
        .cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4)})
    pq.write_table(cust, os.path.join(tmp_path, "customer.parquet"))
    pq.write_table(nat, os.path.join(tmp_path, "nation.parquet"))
    pq.write_table(orders, os.path.join(tmp_path, "orders.parquet"))
    got = region_quarter_lift(str(tmp_path))
    assert got.values.tolist() == [
        [0, 1995, 1, 300, 1_500_000],
        [0, 1995, 2, 100, 500_000],
        [1, 1995, 1, 100, 500_000],
        [1, 1995, 2, 300, 1_500_000]]


def test_repeat_revenue_share_planted(ray_session, tmp_path):
    """cust 1: orders on the SAME day (orderkey breaks the tie — the
    lower key is first, the other is repeat) plus a later-quarter
    order; cust 2 single order. Q1: 300 total, 100 repeat -> 333333
    ppm; Q2: all repeat -> 1e6."""
    from rayschema.queries import repeat_revenue_share

    def d(m):
        return (np.datetime64(f"1995-{m:02d}-10")
                .astype("datetime64[us]").astype(np.int64))

    orders = pa.table({
        "o_orderkey": pa.array(np.array([5, 4, 9, 7], dtype=np.int64)),
        "o_custkey": pa.array(np.array([1, 1, 1, 2], dtype=np.int64)),
        "o_orderstatus": pa.array(["O"] * 4),
        "o_totalprice": pa.array([1.0, 1.0, 5.0, 1.0]),
        "o_orderdate": pa.array(np.array(
            [d(2), d(2), d(5), d(3)], dtype=np.int64))
        .cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4)})
    pq.write_table(orders, os.path.join(tmp_path, "orders.parquet"))
    got = repeat_revenue_share(str(tmp_path))
    assert got.values.tolist() == [
        [1995, 1, 300, 100, 333_333],
        [1995, 2, 500, 500, 1_000_000]]


def test_vocab_growth_curve_planted(ray_session, tmp_path):
    """1200 docs: ids < 1000 all say 'common'; ids >= 1000 each carry
    one new word. depth 1000 -> vocab 1; depth 2000 -> 1200 docs,
    vocab 201."""
    from rayschema.queries import vocab_growth_curve

    n = 1200
    texts = ["common"] * 1000 + [f"common new{i}" for i in range(200)]
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": ["en"] * n, "source": ["s"] * n,
        "n_chars": np.zeros(n, dtype=np.int64)})
    got = vocab_growth_curve(_write_docs(tmp_path, df))
    assert got.values.tolist()[:2] == [
        [1000, 1000, 1, 1],
        [2000, 1200, 201, 1000 * 201 // 1200]]


def test_user_gap_median_histogram_planted(ray_session, tmp_path):
    """u0 gaps [1s, 3s] -> lower median 1s -> band 1 (lo 1); u1 gaps
    [6s] -> band 3 (lo 4); u2 two events at the SAME ts -> median 0
    -> band 0; u3 single event drops."""
    from rayschema.queries import user_gap_median_histogram

    s = 1_000_000
    ts = np.array([0, s, 4 * s, 0, 6 * s, 10, 10, 50], dtype=np.int64)
    uid = np.array([0, 0, 0, 1, 1, 2, 2, 3], dtype=np.int64)
    tab = pa.table({
        "event_id": pa.array(np.arange(8, dtype=np.int64)),
        "user_id": pa.array(uid),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 8),
        "value": pa.array(np.ones(8))})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = user_gap_median_histogram(str(tmp_path))
    assert got.values.tolist() == [
        [0, 0, 1], [1, 1, 1], [3, 4, 1]]


def test_discount_by_qty_band_planted(ray_session, tmp_path):
    """Quantities 5 and 10 share band 1-10 (discounts 500+1000 bp ->
    mean fraction 0.075 = 75000 micro); quantity 11 opens band
    11-20 (0.02 -> 20000 micro)."""
    from rayschema.queries import discount_by_qty_band

    li = pa.table({
        "l_quantity": pa.array([5.0, 10.0, 11.0]),
        "l_discount": pa.array([0.05, 0.10, 0.02])})
    pq.write_table(li, os.path.join(tmp_path, "lineitem.parquet"))
    got = discount_by_qty_band(str(tmp_path))
    assert got.values.tolist() == [
        [1, 10, 2, 1500, 75_000],
        [11, 20, 1, 200, 20_000]]


def test_stuttered_events_planted(ray_session, tmp_path):
    """u0: A@1.00, A@1.00 (stutter), A@2.00 (value differs — no),
    B@2.00 (type differs — no), B@2.00 (stutter). Interleaving user
    u1 never affects u0's adjacency."""
    from rayschema.queries import stuttered_events

    tab = pa.table({
        "event_id": pa.array(np.arange(6, dtype=np.int64)),
        "user_id": pa.array(np.array([0, 0, 0, 0, 0, 1],
                                     dtype=np.int64)),
        "ts": pa.array(np.arange(6, dtype=np.int64) * 1_000_000)
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["A", "A", "A", "B", "B", "A"]),
        "value": pa.array([1.0, 1.0, 2.0, 2.0, 2.0, 1.0])})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = stuttered_events(str(tmp_path))
    assert got.values.tolist() == [
        ["A", 4, 1],
        ["B", 2, 1]]


def test_hour_of_week_profile_planted(ray_session, tmp_path):
    """Epoch 0 is Thursday 00:00 -> slot 96 (the anchor pin). Three
    events at epoch-hour 0 and one at hour 1: peak slot 96 n=3,
    trough slot 0 n=0, peak/mean = 1e6*168*3//4 = 126000000."""
    from rayschema.queries import hour_of_week_profile

    hr = 3_600_000_000
    ts = np.array([0, 10, 20, hr], dtype=np.int64)
    tab = pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "user_id": pa.array(np.zeros(4, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(["e"] * 4),
        "value": pa.array(np.ones(4))})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = hour_of_week_profile(str(tmp_path))
    assert got.values.tolist() == [
        ["e", 96, 3, 0, 0, 1_000_000 * 168 * 3 // 4]]


def test_lang_trigram_cosine_planted(ray_session, tmp_path):
    """en docs 'abcd' x2 (trigrams abc, bcd each x2) vs de doc 'abcz'
    (abc, bcz): dot = 2*1 = 2, norms 8 and 2, cos = 1e6*2/sqrt(16)
    = 500000. Doc boundaries never create cross-doc trigrams (two
    2-char docs contribute nothing)."""
    from rayschema.queries import lang_trigram_cosine

    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["abcd", "abcd", "abcz", "xy", "zw"],
        "lang": ["en", "en", "de", "fr", "fr"],
        "source": ["s"] * 5,
        "n_chars": np.array([4, 4, 4, 2, 2], dtype=np.int64)})
    got = lang_trigram_cosine(_write_docs(tmp_path, df))
    assert got.values.tolist() == [
        ["de", "en", 2, 2, 8, 500_000]]


def test_label_centroid_cosine_planted(ray_session, tmp_path):
    """Label 0 sums to the x axis (two vectors), label 1 to y
    (orthogonal -> 0 ppm), label 2 to x again (parallel to label 0 ->
    1e6 with floor)."""
    from rayschema.queries import label_centroid_cosine

    def vec(x, y):
        return [float(x), float(y)] + [0.0] * 62

    emb = [vec(1, 0), vec(3, 0), vec(0, 2), vec(5, 0)]
    tab = pa.table({
        "vec_id": pa.array(np.arange(4, dtype=np.int64)),
        "embedding": pa.array(emb, type=pa.list_(pa.float32())),
        "label": pa.array(np.array([0, 0, 1, 2], dtype=np.int32))})
    pq.write_table(tab, os.path.join(tmp_path, "embeddings.parquet"))
    got = label_centroid_cosine(str(tmp_path))
    M = 10**6
    assert got.values.tolist() == [
        [0, 1, 2, 1, 0, 0],
        [0, 2, 2, 1, 4 * M * 5 * M, 1_000_000],
        [1, 2, 1, 1, 0, 0]]


def test_common_prefix_boilerplate_planted(ray_session, tmp_path):
    """Two docs share a 40-char header (same 32-prefix); two short
    docs saying exactly 'hi' also pair; a unique doc never
    surfaces."""
    from rayschema.queries import common_prefix_boilerplate

    hdr = "COPYRIGHT 2024 ACME CORPORATION " + "extra tail "
    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [hdr + "one", hdr + "two", "hi", "hi", "unique doc"],
        "lang": ["en"] * 5, "source": ["s"] * 5,
        "n_chars": np.zeros(5, dtype=np.int64)})
    got = common_prefix_boilerplate(_write_docs(tmp_path, df))
    assert got.values.tolist() == [
        [hdr[:32], 2, 1], ["hi", 2, 2]]


def test_purchase_value_trend_planted(ray_session, tmp_path):
    """u0 purchases 1.00 then 3.00 -> up; u1 2.00 then 2.00 -> flat;
    u2 has one purchase (drops); a 'view' event never counts."""
    from rayschema.queries import purchase_value_trend_users

    tab = pa.table({
        "event_id": pa.array(np.arange(7, dtype=np.int64)),
        "user_id": pa.array(np.array([0, 0, 1, 1, 2, 0, 0],
                                     dtype=np.int64)),
        "ts": pa.array(np.arange(7, dtype=np.int64) * 1_000_000)
        .cast(pa.timestamp("us")),
        "event_type": pa.array(["purchase", "purchase", "purchase",
                                "purchase", "purchase", "view",
                                "view"]),
        "value": pa.array([1.0, 3.0, 2.0, 2.0, 9.0, 100.0, 0.5])})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = purchase_value_trend_users(str(tmp_path))
    assert got.values.tolist() == [
        ["flat", 1, 200, 200],
        ["up", 1, 100, 300]]


def test_mg_heavy_hitters_planted(ray_session, tmp_path):
    """u7 owns 60% of events, u3 owns 30%; 100 singleton users ride
    along as sketch noise, and both true heavy hitters (> n/200)
    must survive the Misra-Gries prefilter and verify exactly."""
    from rayschema.queries import mg_heavy_hitters_events

    users = np.concatenate([
        np.full(600, 7), np.full(300, 3),
        np.arange(1000, 1100).repeat(1)]).astype(np.int64)
    n = len(users)
    tab = pa.table({"event_id": pa.array(np.arange(n, dtype=np.int64)),
                    "user_id": pa.array(users),
                    "ts": pa.array(np.arange(n, dtype=np.int64))
                    .cast(pa.timestamp("us")),
                    "event_type": pa.array(["view"] * n),
                    "value": pa.array(np.ones(n)),
                    "props": pa.array(["{}"] * n)})
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = mg_heavy_hitters_events(str(tmp_path))
    # n = 1000 -> threshold 200*cnt > 1000 i.e. cnt > 5
    assert got.values.tolist() == [[3, 300], [7, 600]]


def test_elasticity_by_brand_planted(ray_session, tmp_path):
    """Brand A: (d,q) = (0,1),(100,2) -> slope 1/100 = 10000 ppm;
    brand B: perfectly inverse (0,5),(200,1) -> -20000 ppm; brand C
    has constant discount (zero variance) and must drop."""
    from rayschema.queries import elasticity_by_brand

    part = pa.table({
        "p_partkey": pa.array([1, 2, 3], type=pa.int64()),
        "p_brand": pa.array(["A", "B", "C"]),
        "p_name": pa.array(["x", "y", "z"]),
        "p_type": pa.array(["t", "t", "t"]),
        "p_size": pa.array([1, 1, 1], type=pa.int32()),
        "p_retailprice": pa.array([1.0, 1.0, 1.0])})
    li = pa.table({
        "l_orderkey": pa.array(np.arange(6, dtype=np.int64)),
        "l_partkey": pa.array([1, 1, 2, 2, 3, 3], type=pa.int64()),
        "l_discount": pa.array([0.0, 0.01, 0.0, 0.02, 0.05, 0.05]),
        "l_quantity": pa.array([1.0, 2.0, 5.0, 1.0, 4.0, 9.0])})
    pq.write_table(part, os.path.join(tmp_path, "part.parquet"))
    pq.write_table(li, os.path.join(tmp_path, "lineitem.parquet"))
    got = elasticity_by_brand(str(tmp_path))
    assert got.values.tolist() == [["A", 2, 10000], ["B", 2, -20000]]


def test_l_diversity_audit_planted(ray_session, tmp_path):
    """(en, bucket 0) has one source (l=1, flagged); (en, bucket 2)
    has three sources (l=3, passes the gate and must NOT appear)."""
    from rayschema.queries import l_diversity_audit

    docs = pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "text": pa.array(["t"] * 6),
        "lang": pa.array(["en"] * 6),
        "source": pa.array(["s1", "s1", "s1", "s2", "s3", "s1"]),
        "n_chars": pa.array([10, 20, 30, 120, 130, 140],
                            type=pa.int64())})
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    got = l_diversity_audit(str(tmp_path))
    assert got.values.tolist() == [["en", 0, 3, 1]]


def test_part_reorder_gap_broadcast_vs_join_paths_equal(ray_session):
    """broadcast_cap=0 forces the Dataset.join hash-exchange path for
    the orderkey -> orderdate side (orders is fact-scale; r4 verdict
    flagged the unconditional driver pull); both paths must agree."""
    from rayschema.queries import part_reorder_gap

    sf = "/root/testdata/sf0.001"
    fast = part_reorder_gap(sf)
    slow = part_reorder_gap(sf, broadcast_cap=0)
    assert fast.values.tolist() == slow.values.tolist()
    assert list(fast.columns) == list(slow.columns)
    assert len(fast) > 0


def test_region_quarter_lift_broadcast_vs_join_paths_equal(ray_session):
    """broadcast_cap=0 forces the orders x customer hash join (customer
    scales with the corpus); the 25-row nation map stays broadcast."""
    from rayschema.queries import region_quarter_lift

    sf = "/root/testdata/sf0.001"
    fast = region_quarter_lift(sf)
    slow = region_quarter_lift(sf, broadcast_cap=0)
    assert fast.values.tolist() == slow.values.tolist()
    assert list(fast.columns) == list(slow.columns)
    assert len(fast) > 0


def test_hhi_broadcast_vs_join_paths_equal(ray_session):
    """broadcast_cap=0 forces the orders x customer hash join for the
    customer -> nation resolution; per-nation HHI must be identical."""
    from rayschema.queries import hhi_customer_concentration

    sf = "/root/testdata/sf0.001"
    fast = hhi_customer_concentration(sf)
    slow = hhi_customer_concentration(sf, broadcast_cap=0)
    assert fast.values.tolist() == slow.values.tolist()
    assert list(fast.columns) == list(slow.columns)
    assert len(fast) > 0


def test_sliding_distinct_users_fold_vs_groupby_paths_equal(ray_session):
    """fold_cap=0 forces the two-Ray-groupby scale path; the single-task
    user-major fold (default under the 20M-event gate) must agree row
    for row — including the user-boundary slice alignment (a user split
    across expansion slices would double-count its windows)."""
    from rayschema.queries import sliding_distinct_users

    sf = "/root/testdata/sf0.001"
    fast = sliding_distinct_users(sf)
    slow = sliding_distinct_users(sf, fold_cap=0)
    assert len(fast) > 0
    assert fast.values.tolist() == slow.values.tolist()


def test_sliding_distinct_users_slice_boundary_planted(ray_session,
                                                       monkeypatch):
    """Tiny expansion budget forces many slices; planted events where one
    user spans hours on both sides of a slice boundary must still count
    once per window."""
    import rayschema.queries as q

    ev = pd.DataFrame({
        "event_id": np.arange(8, dtype=np.int64),
        "ts": pd.to_datetime([
            "2024-01-01 00:10", "2024-01-01 01:10", "2024-01-01 02:10",
            "2024-01-01 03:10", "2024-01-01 00:20", "2024-01-01 01:20",
            "2024-01-01 02:20", "2024-01-01 03:20"]),
        "user_id": np.array([7, 7, 7, 7, 9, 9, 9, 9], dtype=np.int64),
        "event_type": ["view"] * 8, "value": np.ones(8),
        "props": ["{}"] * 8})
    import os
    import tempfile
    d = tempfile.mkdtemp()
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   os.path.join(d, "events.parquet"))
    out = q.sliding_distinct_users(d, window_hours=2)
    # every observed hour window sees both users except none partial
    assert out["n_users"].tolist() == [2, 2, 2, 2]


def test_self_overlap_inproc_equals_distributed(ray_session, monkeypatch):
    """The footer-gated in-process path of self_overlap_documents and
    ngram_doc_frequency_histogram must equal the two-execution
    distributed plan row for row (the minhash-inproc parity discipline)."""
    import rayschema.queries as Q
    sf = "/root/testdata/sf0.001"

    def _norm(r, keys):
        df = r.to_pandas() if hasattr(r, "to_pandas") else r
        return df.sort_values(keys).reset_index(drop=True)

    a1 = _norm(Q.self_overlap_documents(sf), ["doc_id"])
    h1 = _norm(Q.ngram_doc_frequency_histogram(sf), ["n_docs"])
    c1 = _norm(Q.coverage_select_documents(sf), ["round"])
    m1 = _norm(Q.dup_cross_source_matrix(sf), ["src_a", "src_b"])
    d1 = _norm(Q.dup_span_stats(sf), ["doc_id"])
    monkeypatch.setattr(Q, "EXACT_DEDUP_INPROC_CAP", -1)  # force distributed
    a2 = _norm(Q.self_overlap_documents(sf), ["doc_id"])
    h2 = _norm(Q.ngram_doc_frequency_histogram(sf), ["n_docs"])
    c2 = _norm(Q.coverage_select_documents(sf), ["round"])
    m2 = _norm(Q.dup_cross_source_matrix(sf), ["src_a", "src_b"])
    d2 = _norm(Q.dup_span_stats(sf), ["doc_id"])
    pd.testing.assert_frame_equal(a1, a2, check_dtype=False)
    pd.testing.assert_frame_equal(h1, h2, check_dtype=False)
    pd.testing.assert_frame_equal(c1, c2, check_dtype=False)
    pd.testing.assert_frame_equal(m1, m2, check_dtype=False)
    pd.testing.assert_frame_equal(d1, d2, check_dtype=False)


def test_orders_reconciliation_fold_equals_sort_plan(ray_session,
                                                     monkeypatch):
    """The footer-gated in-process fold of orders_reconciliation_audit
    must equal the one-sort distributed plan row for row."""
    import rayschema.queries as Q
    sf = "/root/testdata/sf0.001"
    a = Q.orders_reconciliation_audit(sf)
    monkeypatch.setattr(Q, "TRADE_PAIR_FOLD_CAP", -1)
    b = Q.orders_reconciliation_audit(sf)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True),
                                  check_dtype=False)


def test_source_scorecard_fused_equals_two_pass(ray_session, monkeypatch):
    """The fused one-pass kind-marked scorecard path must equal the
    two-pass + hash-groupby plan (forced by faking a huge footer count,
    which flips every footer gate to its at-scale path)."""
    import rayschema.queries as Q
    sf = "/root/testdata/sf0.001"
    a = Q.source_scorecard(sf)
    monkeypatch.setattr(Q, "_table_rows", lambda sf_dir, table: 10**9)
    b = Q.source_scorecard(sf)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True),
                                  check_dtype=False)


def test_brute_force_topk_inproc_equals_actor_path(ray_session):
    """brute_force_topk's footer-gated in-process path must equal the
    actor-pool streaming path row for row (same BatchTopK kernel)."""
    import rayschema.queries as Q
    from rayschema.similarity import brute_force_topk
    sf = "/root/testdata/sf0.001"
    ds = Q._read(sf, "embeddings", columns=["vec_id", "embedding"])
    q = Q._query_vecs(sf, ["vec_id", "embedding"])
    queries = np.stack(q["embedding"].to_numpy())
    a = brute_force_topk(ds, queries, k=10, n_rows=100)       # in-proc
    b = brute_force_topk(ds, queries, k=10, n_rows=None)      # actors
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
