"""Text-analysis operator tests: token counting (incl. the SQL-mirror
formula), language ID, quality scoring, fingerprints, repetition metrics,
redaction."""

import numpy as np
import pandas as pd
import pyarrow as pa

from rayschema.text import (
    BpeishTokenCounter,
    Fingerprinter,
    LangId,
    quality_batch,
    redact_batch,
    redact_text_batch,
    repetition_stats_batch,
    token_count_batch,
)


def test_token_count_matches_sql_formula():
    t = pa.table({"text": ["a b c", "", "single", "double  space", None]})
    out = token_count_batch(t)
    # SQL: len(string_split(text,' ')) with empty->0, null->null
    assert out["token_count"].to_pylist() == [3, 0, 1, 3, None]


def test_bpeish_counter():
    t = pa.table({"text": ["hello, world!", "", None]})
    out = BpeishTokenCounter()(t)
    assert out["bpeish_tokens"].to_pylist() == [4, 0, 0]  # hello , world !


def test_langid_heuristic():
    t = pa.table({"text": [
        "the cat and the dog went to the house of the king",
        "der Hund und die Katze sind nicht auf der Strasse",
        "le chat est dans la maison pour les vacances",
        "el perro y el gato es una historia para todos",
        "你好世界这是一个中文文本的例子用来测试语言识别",
        "zzz qqq xxx",
    ]})
    out = LangId()(t)
    assert out["lang_pred"].to_pylist()[:5] == ["en", "de", "fr", "es", "zh"]
    assert out["lang_pred"].to_pylist()[5] == "unknown"


def test_quality_batch():
    t = pa.table({"text": [
        "A well formed English sentence with reasonable length and words.",
        "!!!???!!!",
        "",
        None,
    ]})
    out = quality_batch(t)
    q = out["quality"].to_pylist()
    assert q[0] > q[1] > q[2]
    assert out["alpha_ratio"].to_pylist()[1] == 0.0
    assert out["q_len"].to_pylist()[3] == 0


def test_repetition_stats_hand_computed():
    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["a b a b a", "x y z", "", None]})
    out = repetition_stats_batch(t)
    # doc 1: words a,b,a,b,a -> 5 words, 2 distinct, dups=3, max freq a=3
    #        2-grams: ab,ba,ab,ba -> 4 grams, 2 distinct, dups=2
    # doc 2: all unique, 2 grams xy,yz distinct
    # doc 3: SQL string_split('',' ') = [''] -> 1 word, 0 dups, 0 grams
    # doc 4: null text dropped (mirrors oracle WHERE)
    df = out.to_pandas().set_index("doc_id")
    assert list(df.index) == [1, 2, 3]
    assert df.loc[1].tolist() == [5, 3, 3, 2]
    assert df.loc[2].tolist() == [3, 0, 1, 0]
    assert df.loc[3].tolist() == [1, 0, 1, 0]


def test_repetition_stats_matches_duckdb():
    import duckdb

    texts = ["m n m n o p m", "q r", None, "s s s s", "lone"]
    t = pa.table({"doc_id": list(range(5)), "text": texts})
    got = repetition_stats_batch(t).to_pandas().sort_values("doc_id")
    con = duckdb.connect()
    con.register("documents", t)
    want = con.sql("""
        WITH w AS (SELECT doc_id, string_split(text,' ') ws
                   FROM documents WHERE text IS NOT NULL),
        words AS (SELECT doc_id, unnest(ws) word FROM w),
        wc AS (SELECT doc_id, word, count(*)::BIGINT c FROM words
               GROUP BY doc_id, word),
        pw AS (SELECT doc_id, sum(c)::BIGINT n_words,
                      (sum(c)-count(*))::BIGINT n_dup_words,
                      max(c)::BIGINT max_word_freq FROM wc GROUP BY doc_id),
        g AS (SELECT doc_id, unnest(list_zip(ws, ws[2:])) g FROM w),
        g2 AS (SELECT doc_id, g[1] w1, g[2] w2 FROM g WHERE g[2] IS NOT NULL),
        gc AS (SELECT doc_id, w1, w2, count(*)::BIGINT c FROM g2
               GROUP BY doc_id, w1, w2),
        pg AS (SELECT doc_id, (sum(c)-count(*))::BIGINT n_dup_2grams
               FROM gc GROUP BY doc_id)
        SELECT pw.doc_id, n_words, n_dup_words, max_word_freq,
               coalesce(pg.n_dup_2grams, 0)::BIGINT n_dup_2grams
        FROM pw LEFT JOIN pg ON pw.doc_id = pg.doc_id ORDER BY pw.doc_id
    """).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_redact_batch_counts_and_scrub():
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["the key and the hash and keyhash",
                           "no match here", None]})
    out = redact_batch(t, pattern=r"\b(key|hash)\b", replacement="<R>")
    df = out.to_pandas()
    # 'keyhash' has no word boundary match; key + hash = 2 matches
    assert df["n_matches"].tolist() == [2, 0]
    assert df["redacted_len"].tolist() == [
        len("the <R> and the <R> and keyhash"), len("no match here")]
    scrubbed = redact_text_batch(t, pattern=r"\b(key|hash)\b",
                                 replacement="<R>")
    assert scrubbed["text"].to_pylist()[0] == "the <R> and the <R> and keyhash"
    assert scrubbed.schema.names == t.schema.names


def test_fingerprinter_deterministic_and_sensitive():
    t = pa.table({"text": ["the quick brown fox jumps over the lazy dog",
                           "the quick brown fox jumps over the lazy dog",
                           "a completely different sentence here",
                           None]})
    out = Fingerprinter()(t)
    fp = out["fingerprint"].to_pylist()
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]
    assert fp[3] == 0
    mins = out["fp_minhashes"].to_pylist()
    # 43-char doc, w=16 -> 28 shingles -> k=8 mins, sorted
    assert len(mins[0]) == 8 and mins[0] == sorted(mins[0])


def test_decontaminator_flags_containing_docs(ray_session):
    import ray
    import ray.data as rd

    from rayschema.text import Decontaminator

    snippet = "this is the benchmark prompt text"
    docs = [
        (0, snippet + " with a continuation"),          # contains -> hit
        (7, snippet),                                   # the bench doc itself
        (2, "completely unrelated content here"),       # no hit
        (3, "prefix then " + snippet + " embedded"),    # contains -> hit
    ]
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in docs])
    ref = ray.put((np.array([7], dtype=np.int64), [snippet]))
    out = (ds.map_batches(Decontaminator, batch_format="pyarrow",
                          fn_constructor_kwargs=dict(snippets_ref=ref),
                          concurrency=1)
           .to_pandas().sort_values("doc_id"))
    assert out["doc_id"].tolist() == [0, 3]       # bench doc itself excluded
    assert out["n_hits"].tolist() == [1, 1]


def test_decontaminator_rk_path_equals_scan(ray_session):
    """Above DECON_SCAN_MAX_SNIPPETS the anchored Rabin-Karp index takes
    over — it must emit EXACTLY the per-snippet match_substring result on
    a corpus with multi-occurrence hits, unicode, anchor-length edge
    snippets, shared 16-char prefixes (candidate runs > 1), nulls, and
    self-bench exclusions."""
    import ray
    import ray.data as rd

    from rayschema.text import Decontaminator

    rng = np.random.RandomState(5)
    # 150 snippets: shared prefixes force multi-snippet hash runs; a few
    # are shorter than the 16-cp anchor (fallback kernel); one unicode
    snips = [f"benchmark prompt {i:04d} tail{i % 7}" for i in range(120)]
    snips += [f"benchmark prompt {i:04d} other" for i in range(20)]
    snips += ["tiny snip", "short", "日本語のベンチマーク断片ですよ 0123",
              "exact sixteen ch", "x" * 16]
    bench_ids = np.arange(1000, 1000 + len(snips), dtype=np.int64)
    docs = []
    for d in range(80):
        parts = [f"filler words {d} " * 3]
        for j in rng.choice(len(snips), size=rng.randint(0, 4),
                            replace=False):
            parts.append(snips[j])
            if rng.rand() < 0.3:
                parts.append(" mid " + snips[j])       # second occurrence
        docs.append((d, " ".join(parts)))
    docs.append((1003, snips[3]))                      # self-bench doc
    docs.append((999, None))                           # null text
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in docs]) \
        .repartition(4)
    ref = ray.put((bench_ids, snips))

    def run(scan_max):
        return (ds.map_batches(
            Decontaminator, batch_format="pyarrow",
            fn_constructor_kwargs=dict(snippets_ref=ref,
                                       scan_max=scan_max),
            concurrency=1).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))

    rk, scan = run(0), run(10 ** 9)
    pd.testing.assert_frame_equal(rk, scan)
    assert len(rk) > 10          # the corpus really contains hits


def test_vocabulary_top_words_query(ray_session, sf_dir):
    import duckdb

    from rayschema.queries import vocabulary_top_words

    got = vocabulary_top_words(sf_dir)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.sql("""
        WITH wc AS (
          SELECT lang, word, count(*)::BIGINT AS n
          FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
                FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL)
          GROUP BY lang, word),
        r AS (SELECT lang, word, n, row_number() OVER (
                PARTITION BY lang ORDER BY n DESC, word) AS rk FROM wc)
        SELECT lang, word, n, rk::BIGINT AS rk FROM r WHERE rk <= 10
        ORDER BY lang, rk
    """).df()
    want["n"] = want["n"].astype(np.int64)
    want["rk"] = want["rk"].astype(np.int64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_tfidf_top_term_vs_bruteforce(ray_session, sf_dir):
    from collections import Counter

    from rayschema.queries import tfidf_top_term

    got = (tfidf_top_term(sf_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    df = pd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    df = df[df["text"].notna()]
    dfreq = Counter()
    per_doc = {}
    for _, r in df.iterrows():
        tf = Counter(r["text"].split(" "))
        per_doc[r["doc_id"]] = tf
        dfreq.update(tf.keys())
    rows = []
    for did in sorted(per_doc):
        tf = per_doc[did]
        # max by (tf/df desc, word asc) — same float64 ratio as the engine
        best = min(tf.items(), key=lambda kv: (-(kv[1] / dfreq[kv[0]]), kv[0]))
        rows.append({"doc_id": did, "top_word": best[0],
                     "tf": np.int64(best[1]), "df": np.int64(dfreq[best[0]])})
    want = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(got, want)


def test_length_quantile_filter_exact_p90(ray_session, sf_dir):
    from rayschema.queries import length_quantile_filter

    got = (length_quantile_filter(sf_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    df = pd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    s = np.sort(df["n_chars"].dropna().to_numpy(np.int64))
    cum = np.arange(1, len(s) + 1)
    thresh = s[np.nonzero(cum * 10 >= len(s) * 9)[0][0]]
    want = (df[df["n_chars"] >= thresh].sort_values("doc_id")
            .reset_index(drop=True))
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    # at least ~10% of docs kept and every kept doc is above the threshold
    assert len(got) >= len(s) // 10
    assert (got["n_chars"] >= thresh).all()


def test_inverted_index_words_vs_bruteforce(ray_session, sf_dir):
    from collections import defaultdict

    from rayschema.queries import inverted_index_words

    got = (inverted_index_words(sf_dir).to_pandas()
           .sort_values("word").reset_index(drop=True))
    df = pd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    postings = defaultdict(set)
    for _, r in df[df["text"].notna()].iterrows():
        for w in set(r["text"].split(" ")):
            postings[w].add(r["doc_id"])
    want = pd.DataFrame(
        [{"word": w, "df": np.int64(len(ids)),
          "postings": ",".join(map(str, sorted(ids)))}
         for w, ids in sorted(postings.items())])
    pd.testing.assert_frame_equal(got, want)


def test_embedding_mean_by_lang_integer_exact(ray_session, sf_dir):
    from rayschema.dedup import round_half_away
    from rayschema.queries import embedding_mean_by_lang

    got = (embedding_mean_by_lang(sf_dir).to_pandas()
           .sort_values("lang").reset_index(drop=True))
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    m = emb.merge(docs, left_on="vec_id", right_on="doc_id")
    m = m[m["lang"].notna()]
    mat = np.stack(m["embedding"].to_numpy()).astype(np.float64)[:, :8]
    q = round_half_away(mat * 1_000_000, 0).astype(np.int64)
    rows = []
    for lang, idx in m.groupby("lang").groups.items():
        sel = m.index.get_indexer(idx)
        rows.append({"lang": lang, "n": np.int64(len(sel)),
                     **{f"s{k}": q[sel, k].sum() for k in range(8)}})
    want = pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_bm25_scores_hand_case(ray_session, tmp_path):
    """BM25 (log-free idf) on a 3-doc corpus with hand-derivable tf/df/dl:
    matches the closed-form value; docs with no query term are absent."""
    import os

    import pyarrow.parquet as _pq

    from rayschema.queries import bm25_scores

    docs = ["key key other words",          # tf(key)=2, dl=4
            "hash alone",                   # tf(hash)=1, dl=2
            "nothing matching here"]        # absent
    tab = pa.table({"doc_id": pa.array(np.arange(3, dtype=np.int64)),
                    "text": pa.array(docs)})
    _pq.write_table(tab, os.path.join(tmp_path, "documents.parquet"))
    got = (bm25_scores(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 1]
    N, S = 3, 9
    avgdl = S * 1.0 / N

    def term(tf, df, dl):
        idf = (2.0 * N - 2.0 * df + 1.0) / (2.0 * df + 1.0)
        return idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))

    assert abs(got.loc[0, "bm25"] - round(term(2, 1, 4), 6)) < 2e-6
    assert abs(got.loc[1, "bm25"] - round(term(1, 1, 2), 6)) < 2e-6


def test_event_type_cooccurrence_hand_case(ray_session, tmp_path):
    import os

    import pyarrow.parquet as _pq

    from rayschema.queries import event_type_cooccurrence

    rows = [(1, "view"), (1, "click"), (1, "view"),
            (2, "view"), (2, "purchase"),
            (3, "click"), (3, "view"),
            (4, "error")]
    tab = pa.table({
        "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "user_id": pa.array(np.array([r[0] for r in rows], np.int64)),
        "ts": pa.array(np.arange(len(rows), dtype=np.int64))
        .cast(pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows]),
        "value": pa.array(np.ones(len(rows))),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    got = (event_type_cooccurrence(str(tmp_path)).to_pandas()
           .sort_values(["type_a", "type_b"]).reset_index(drop=True))
    pairs = {(a, b): n for a, b, n in
             zip(got["type_a"], got["type_b"], got["n_users"])}
    assert pairs == {("click", "view"): 2, ("purchase", "view"): 1}


def test_levenshtein_batch_vs_reference_dp():
    import random

    from rayschema.text import levenshtein_batch

    def ref(a, b):
        la, lb = len(a), len(b)
        d = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, d[0] = d[0], i
            for j in range(1, lb + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return d[lb]

    rng = random.Random(9)
    alpha = "abcde"
    words = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 9)))
             for _ in range(60)] + ["", "a", "kitten", "sitting", "flaw",
                                    "lawn", "naïve", "naive"]
    pairs = [(rng.choice(words), rng.choice(words)) for _ in range(400)]
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    assert got.tolist() == [ref(a, b) for a, b in pairs]


def test_deletion_keys_symspell_guarantee():
    """ED(a,b) <= 2 ==> the <=2-deletion key sets intersect (the SymSpell
    candidate-completeness property the fuzzy matcher relies on)."""
    import itertools
    import random

    import pyarrow as _pa

    from rayschema.text import deletion_keys, levenshtein_batch

    rng = random.Random(4)
    words = sorted({"".join(rng.choice("ab") for _ in range(rng.randint(3, 6)))
                    for _ in range(40)})
    keys, idx = deletion_keys(_pa.array(words), max_del=2)
    ksets = {}
    for k, i in zip(keys.to_pylist(), idx):
        ksets.setdefault(words[int(i)], set()).add(k)
    for a, b in itertools.combinations(words, 2):
        d = int(levenshtein_batch([a], [b])[0])
        if d <= 2:
            assert ksets[a] & ksets[b], (a, b, d)


def test_fuzzy_word_pairs_planted(ray_session, tmp_path):
    """Planted typo clusters: the deletion-neighborhood pipeline finds
    exactly the brute-force levenshtein<=2 pairs over the distinct
    vocabulary (substitution, insertion, deletion, transposition-as-2,
    and a far word contributing nothing)."""
    import itertools
    import os

    import pandas as pd
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from rayschema.queries import fuzzy_word_pairs
    from rayschema.text import levenshtein_batch

    docs = [
        "tokenizer tokeniser tokenizers stream steam streams",
        "window windew widow quantum",
        "tokenizer stream window shuffle shufle schuffle",
        "quantum quantas entirely unrelated wording here",
    ]
    tab = _pa.table({
        "doc_id": _pa.array(range(len(docs)), type=_pa.int64()),
        "text": _pa.array(docs),
        "lang": _pa.array(["en"] * len(docs)),
        "source": _pa.array(["t"] * len(docs)),
        "n_chars": _pa.array([len(d) for d in docs], type=_pa.int64()),
    })
    _pq.write_table(tab, os.path.join(tmp_path, "documents.parquet"))
    got = (fuzzy_word_pairs(str(tmp_path)).to_pandas()
           .sort_values(["word_a", "word_b"]).reset_index(drop=True))

    vocab = sorted({w for d in docs for w in d.split(" ")
                    if 4 <= len(w) <= 20})
    exp = []
    for a, b in itertools.combinations(vocab, 2):
        d = int(levenshtein_batch([a], [b])[0])
        if d <= 2:
            exp.append({"word_a": a, "word_b": b, "dist": d})
    exp = pd.DataFrame(exp).sort_values(["word_a", "word_b"]) \
        .reset_index(drop=True)
    assert len(got) == len(exp) and len(got) >= 6
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
