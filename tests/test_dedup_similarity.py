"""Dedup family + similarity search tests (MinHash/LSH, SimHash, n-gram
Jaccard, embedding near-dup, brute-force + IVF ANN)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rayschema.dedup import (
    MinHasher,
    SimHasher,
    char_shingles,
    hamming64,
    ngram_jaccard,
)


def test_char_shingles_deterministic_and_set_like():
    a = char_shingles("abcdefg", 5)
    b = char_shingles("abcdefg", 5)
    assert (a == b).all()
    assert len(char_shingles("abcdef", 5)) == 2  # 'abcde','bcdef'
    assert len(char_shingles("", 5)) == 1        # sentinel hash


def test_ngram_jaccard():
    assert ngram_jaccard("hello world", "hello world") == 1.0
    assert ngram_jaccard("hello world", "totally different") < 0.2
    mid = ngram_jaccard("the quick brown fox", "the quick brown cat")
    assert 0.3 < mid < 0.9


def test_minhash_estimates_jaccard():
    m = MinHasher()
    t1 = "the quick brown fox jumps over the lazy dog " * 20
    t2 = t1 + "with a small tail difference"
    t3 = "entirely unrelated content about databases " * 20
    s1, s2, s3 = m.signature(t1), m.signature(t2), m.signature(t3)
    true12 = ngram_jaccard(t1, t2)
    est12 = (s1 == s2).mean()
    assert abs(est12 - true12) < 0.2
    assert (s1 == s3).mean() < 0.15


def test_simhash_hamming():
    s = SimHasher()
    h1 = s.sim64("the quick brown fox jumps over the lazy dog " * 10)
    h2 = s.sim64("the quick brown fox jumps over the lazy dog " * 10 + " tail")
    h3 = s.sim64("completely different words entirely " * 10)
    assert hamming64(np.array([h1]), np.array([h2]))[0] <= 6
    assert hamming64(np.array([h1]), np.array([h3]))[0] > 10
    assert s.sim64("") == 0


def test_poly_token_hash_matches_duckdb():
    """The SimHash token hash (packed codepoint polynomials) is the quantity
    the driver oracle recomputes in SQL — pin numpy == DuckDB list_reduce
    bit-for-bit, incl. unicode codepoints and 1-char tokens."""
    import duckdb

    from rayschema.dedup import poly_token_hash

    toks = ["hello", "a", "Z9_", "日本語", "x" * 40, "MiXeD123"]
    got = poly_token_hash(toks).view(np.int64)
    sql = """
        SELECT (list_reduce(list_prepend(0::BIGINT,
                  list_apply(string_split(t, ''), c -> unicode(c)::BIGINT)),
                  (acc, cp) -> (acc * 1000003 + cp + 1) % 2147483647) << 31)
             + list_reduce(list_prepend(0::BIGINT,
                  list_apply(string_split(t, ''), c -> unicode(c)::BIGINT)),
                  (acc, cp) -> (acc * 999983 + cp + 1) % 2147483647) AS h
        FROM (SELECT unnest(?) AS t)"""
    exp = [r[0] for r in duckdb.execute(sql, [toks]).fetchall()]
    assert got.tolist() == exp


def test_batch_sim64_matches_per_doc():
    """The one-tokenizer-pass batch SimHash must be bit-identical to the
    per-doc reference path (incl. empty, None, unicode, punctuation-only)."""
    s = SimHasher()
    texts = ["the quick brown fox " * 9, "", None, "!!! ... ???",
             "日本語 テキスト の 単語", "words other entirely " * 7,
             "a", "mixed 日本語 and english words"]
    got = s.batch_sim64(texts)
    for i, t in enumerate(texts):
        assert got[i] == np.uint64(s.sim64(t)), (i, t)


def test_char_shingles_codepoint_unit():
    """Shingles are codepoint k-grams: two multi-byte texts sharing codepoint
    5-grams must get the jaccard the Python-str / DuckDB substr ground truth
    computes (byte-level shingling would differ)."""
    a = "日本語のテキストです"
    b = "日本語のテキストだよ"
    k = 5

    def str_jac(x, y):
        sx = {x[i:i + k] for i in range(len(x) - k + 1)}
        sy = {y[i:i + k] for i in range(len(y) - k + 1)}
        return len(sx & sy) / len(sx | sy)

    assert abs(ngram_jaccard(a, b, k) - str_jac(a, b)) < 1e-12
    # ASCII hashes unchanged vs codepoint view (codepoint == byte value)
    assert len(char_shingles("abcdef", k)) == 2


@pytest.fixture(scope="module")
def near_dup_docs(ray_session):
    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog and runs far away "
    rows = []
    for i in range(40):
        rows.append({"doc_id": i, "text": base * 8 + f"unique tail {i}"})
    for i in range(40, 80):
        rows.append({"doc_id": i, "text": f"standalone document {i} " +
                     " ".join(f"w{i}x{j}" for j in range(80))})
    # exact near-dup pair: 100 & 101
    rows.append({"doc_id": 100, "text": base * 10})
    rows.append({"doc_id": 101, "text": base * 10 + "tiny"})
    return rd.from_items(rows)


def test_minhash_lsh_pipeline(near_dup_docs):
    from rayschema.dedup import minhash_candidate_pairs, verify_pairs_jaccard

    pairs = minhash_candidate_pairs(near_dup_docs, concurrency=(1, 2),
                                    distinct_on_driver=True)
    assert len(pairs)
    cand = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (100, 101) in cand
    texts = {r["doc_id"]: r["text"] for r in near_dup_docs.take_all()}
    verified = verify_pairs_jaccard(pairs, texts, threshold=0.9)
    assert (100, 101) in set(zip(verified["id_a"], verified["id_b"]))
    # unrelated standalone docs do not survive verification
    assert not any(a >= 40 and a < 80 for a in verified["id_a"])


def test_minhash_distributed_verify_equals_driver_path(near_dup_docs):
    """The fused 3-shuffle verify (the default) and the join-based verify
    must BOTH equal the small-input driver path exactly."""
    from rayschema.dedup import (
        minhash_candidate_pairs,
        minhash_near_dups,
        minhash_near_dups_joined,
        verify_pairs_jaccard,
    )

    pairs = minhash_candidate_pairs(near_dup_docs, concurrency=(1, 2),
                                    distinct_on_driver=True)
    texts = {r["doc_id"]: r["text"] for r in near_dup_docs.take_all()}
    driver = verify_pairs_jaccard(pairs, texts, threshold=0.7)
    key = ["id_a", "id_b"]
    d1 = driver.sort_values(key).reset_index(drop=True)
    for fn in (minhash_near_dups, minhash_near_dups_joined):
        dist = fn(near_dup_docs, threshold=0.7, concurrency=(1, 2)).to_pandas()
        d2 = dist.sort_values(key).reset_index(drop=True)[driver.columns.tolist()]
        pd.testing.assert_frame_equal(d1, d2, check_dtype=False)


def test_oph_signatures_batch_matches_per_doc():
    from rayschema.dedup import MinHasher, oph_signatures

    m = MinHasher()
    texts = ["the quick brown fox " * 9, "", None, "abcd", "日本語テキスト" * 4,
             "words other entirely " * 7]
    arr = pa.array(texts, type=pa.string())
    sigs = oph_signatures(arr, m.shingle_k, m.num_perm)
    for i, t in enumerate(texts):
        assert (sigs[i] == m.signature(t)).all()
    # sliced array (shared parent buffer) must not leak cross-doc windows
    sl = arr.slice(2, 3)
    sigs2 = oph_signatures(sl, m.shingle_k, m.num_perm)
    for i in range(3):
        assert (sigs2[i] == m.signature(texts[2 + i])).all()


def test_salt_split_bucket_keeps_cluster_connected(ray_session):
    """A pathological LSH bucket (600 identical docs) is salt-split, not
    truncated: every doc still lands in ONE near-dup cluster."""
    import ray.data as rd

    from rayschema.dedup import near_dup_clusters

    text = "exactly the same duplicated document body repeated words " * 6
    docs = rd.from_items([{"doc_id": i, "text": text} for i in range(600)])
    cc = near_dup_clusters(docs, jaccard_threshold=0.9, concurrency=(1, 2))
    got = dict(zip(cc["doc_id"], cc["cluster_id"]))
    assert len(got) == 600
    assert set(got.values()) == {0}


def test_minhash_near_dups_no_dup_corpus(ray_session):
    """A corpus with no near-dups yields zero verified pairs (and the empty
    result keeps the (id_a, id_b, jaccard) schema)."""
    import ray.data as rd

    from rayschema.dedup import minhash_near_dups

    docs = rd.from_items([
        {"doc_id": i, "text": f"standalone {i} " +
         " ".join(f"tok{i}x{j}" for j in range(60))}
        for i in range(30)])
    out = minhash_near_dups(docs, threshold=0.8, concurrency=(1, 2)).to_pandas()
    assert len(out) == 0
    # Ray's empty groupby-aggregate drops the schema entirely; accept either
    # the full (id_a, id_b, jaccard) schema or a schema-less empty frame
    assert list(out.columns) in ([], ["id_a", "id_b", "jaccard"])


def test_minhash_lsh_recall_vs_exact(near_dup_docs):
    """LSH recall against the exact all-pairs char-5-gram ground truth on the
    same corpus: every exact pair at jaccard >= 0.7 must be recovered (the
    fixture's near-dups are far above the LSH s-curve threshold)."""
    from rayschema.dedup import exact_jaccard_pairs, minhash_near_dups

    exact = exact_jaccard_pairs(near_dup_docs, id_limit=10_000, threshold=0.7,
                                concurrency=(1, 2)).to_pandas()
    lsh = minhash_near_dups(near_dup_docs, threshold=0.7,
                            concurrency=(1, 2)).to_pandas()
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    lsh_pairs = set(zip(lsh["id_a"], lsh["id_b"]))
    assert exact_pairs, "fixture must contain true near-dups"
    recall = len(exact_pairs & lsh_pairs) / len(exact_pairs)
    assert recall >= 0.9, (recall, exact_pairs - lsh_pairs)


def test_simhash_pipeline(near_dup_docs):
    from rayschema.dedup import simhash_near_dups

    pairs = simhash_near_dups(near_dup_docs, max_hamming=3,
                              concurrency=(1, 2)).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (100, 101) in got


@pytest.fixture(scope="module")
def embedding_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    base = rng.standard_normal((50, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append({"vec_id": i, "embedding": v.astype(np.float32).tolist()})
    # 900/901: near-duplicate pair
    v = rng.standard_normal(16)
    rows.append({"vec_id": 900, "embedding": v.astype(np.float32).tolist()})
    rows.append({"vec_id": 901, "embedding": (v + 0.01 * rng.standard_normal(16)).astype(np.float32).tolist()})
    return rd.from_items(rows)


def test_embedding_near_dup(embedding_ds):
    from rayschema.dedup import embedding_near_dups

    pairs = embedding_near_dups(embedding_ds, cos_threshold=0.99, bits=8,
                                concurrency=(1, 2)).to_pandas()
    assert (900, 901) in set(zip(pairs["id_a"], pairs["id_b"]))


def test_brute_force_topk(embedding_ds):
    from rayschema.similarity import brute_force_topk

    all_rows = embedding_ds.take_all()
    mat = np.stack([np.asarray(r["embedding"]) for r in all_rows])
    ids = np.asarray([r["vec_id"] for r in all_rows])
    q = mat[0:1]
    res = brute_force_topk(embedding_ds, q, k=5, concurrency=(1, 2))
    # exact answer by full matmul
    qq = q / np.linalg.norm(q, axis=1, keepdims=True)
    mm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = (mm @ qq.T)[:, 0]
    order = np.lexsort((ids, -np.round(sims, 6)))[:5]
    assert list(res["vec_id"]) == list(ids[order])
    assert res["rank"].tolist() == [1, 2, 3, 4, 5]


def test_ivf_topk_recall(embedding_ds):
    from rayschema.similarity import brute_force_topk, ivf_topk

    all_rows = embedding_ds.take_all()
    mat = np.stack([np.asarray(r["embedding"]) for r in all_rows])
    q = mat[0:1]
    bf = brute_force_topk(embedding_ds, q, k=5, concurrency=(1, 2))
    ivf = ivf_topk(embedding_ds, q, k=5, n_clusters=4, nprobe=3, concurrency=(1, 2))
    bset = set(bf["vec_id"])
    iset = set(ivf["vec_id"])
    assert len(bset & iset) / len(bset) >= 0.6  # probing 3/4 clusters


@pytest.fixture(scope="module")
def big_embedding_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    # clustered corpus (the IVF-relevant regime), SORTED by cluster so a
    # head-sampled codebook would be biased — the regression the random
    # sample fix addresses
    cents = rng.standard_normal((8, 16)) * 3
    rows = []
    vid = 0
    for c in range(8):
        for _ in range(50):
            v = cents[c] + rng.standard_normal(16)
            rows.append({"vec_id": vid,
                         "embedding": v.astype(np.float32).tolist()})
            vid += 1
    return rd.from_items(rows)


def test_ivf_recall_target_and_full_k(big_embedding_ds):
    """VERDICT round-1 criterion: recall@10 >= 0.9 at nprobe=3/8 with the
    uniform-random codebook sample, and every query returns its full k."""
    from rayschema.similarity import brute_force_topk, ivf_topk

    all_rows = big_embedding_ds.take_all()
    mat = np.stack([np.asarray(r["embedding"]) for r in all_rows])
    q = mat[[0, 170, 390]]
    bf = brute_force_topk(big_embedding_ds, q, k=10, concurrency=(1, 2))
    ivf = ivf_topk(big_embedding_ds, q, k=10, n_clusters=8, nprobe=3,
                   concurrency=(1, 2))
    assert len(ivf) == 30
    recalls = []
    for qi in range(3):
        bset = set(bf[bf["query_id"] == qi]["vec_id"])
        iset = set(ivf[ivf["query_id"] == qi]["vec_id"])
        recalls.append(len(bset & iset) / len(bset))
    assert np.mean(recalls) >= 0.9, recalls


def test_sorted_group_scan_exact_groups(ray_session):
    """The shared bucketed-scan primitive: group sums over a key whose groups
    straddle block boundaries must equal an exact pandas groupby (residual
    stitching included)."""
    import ray.data as rd

    from rayschema.dedup import sorted_group_scan

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 37, 5000).astype(np.int64)
    vals = rng.integers(0, 1000, 5000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(8)

    def group_fn(t):
        k = t.column("k")[0].as_py()
        v = int(np.sum(t.column("v").to_numpy(zero_copy_only=False)))
        return pa.table({"k": pa.array([k], type=pa.int64()),
                         "s": pa.array([v], type=pa.int64())})

    out = sorted_group_scan(
        ds, ["k"], group_fn,
        pa.schema([("k", pa.int64()), ("s", pa.int64())])).to_pandas()
    exp = pd.DataFrame({"k": keys, "v": vals}).groupby("k", as_index=False)["v"] \
        .sum().rename(columns={"v": "s"})
    got = out.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.astype("int64"), check_dtype=False)


def test_emit_group_pairs_band_salt_varies_split():
    """Different salts chunk an oversized bucket differently (the cross-chunk
    recovery property), every pair keeps id_a < id_b, and the star links keep
    the group connected under any salt."""
    from rayschema.dedup import _emit_group_pairs, connected_components

    ids = np.arange(1000, dtype=np.int64) * 3 + 7
    a1, b1 = _emit_group_pairs(ids, max_group=256, salt=1)
    a2, b2 = _emit_group_pairs(ids, max_group=256, salt=2)
    assert (a1 < b1).all() and (a2 < b2).all()
    s1 = set(zip(a1.tolist(), b1.tolist()))
    s2 = set(zip(a2.tolist(), b2.tolist()))
    assert s1 != s2, "salt must vary the chunk split"
    for aa, bb in ((a1, b1), (a2, b2)):
        cc = connected_components(pd.DataFrame({"id_a": aa, "id_b": bb}))
        assert set(cc["doc_id"]) == set(ids.tolist())
        assert set(cc["cluster_id"]) == {7}


def test_srp_bander_matches_integer_mirror(ray_session):
    """SrpBander's bands must equal a from-scratch integer mirror of the
    documented formula (the same arithmetic the DuckDB oracle runs)."""
    import ray.data as rd

    from rayschema.dedup import round_half_away
    from rayschema.similarity import SrpBander

    rng = np.random.default_rng(2)
    mat = rng.standard_normal((40, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": v.tolist()} for i, v in enumerate(mat)]
    out = (rd.from_items(rows)
           .map_batches(SrpBander, batch_format="pyarrow", concurrency=(1, 2))
           .to_pandas().sort_values("vec_id"))
    q = round_half_away(mat.astype(np.float64) * 1e6, 0).astype(np.int64)
    i = np.arange(1, 17, dtype=np.int64)
    exp = np.zeros((40, 4), dtype=np.int64)
    for j in range(16):
        sign = np.where(((i * (j + 1) * 2654435761) % 97) % 2 == 0, 1, -1)
        dot = (q * sign[None, :]).sum(axis=1)
        exp[:, j // 4] |= (dot >= 0).astype(np.int64) << (j % 4)
    for k in range(4):
        assert (out[f"srp_band_{k}"].to_numpy() == exp[:, k]).all(), k


def test_recall_reports_shape(ray_session):
    """Both recall reports run end-to-end on the smallest testdata and emit
    the (method, n_exact, n_found, recall) schema with recall in [0, 1]."""
    from rayschema.queries import ann_recall_report, lsh_recall_report

    sf = "/root/testdata/sf0.001"
    lr = lsh_recall_report(sf)
    ar = ann_recall_report(sf)
    for df in (lr, ar):
        assert list(df.columns) == ["method", "n_exact", "n_found", "recall"]
        assert ((df["recall"] >= 0) & (df["recall"] <= 1)).all()
        assert (df["n_found"] <= df["n_exact"]).all()
    assert len(lr) == 1 and len(ar) == 3


def test_connected_components():
    from rayschema.dedup import connected_components

    pairs = pd.DataFrame({"id_a": [1, 2, 10, 20], "id_b": [2, 3, 11, 10]})
    cc = connected_components(pairs)
    got = dict(zip(cc["doc_id"], cc["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 10}


def test_connected_components_ds_matches_driver(ray_session):
    """The distributed min-label-propagation components must equal the
    driver union-find exactly on a graph with chains (multi-hop label
    propagation), stars, and isolated pairs."""
    import ray.data as rd

    from rayschema.dedup import connected_components, connected_components_ds

    rng = np.random.default_rng(13)
    # chains of length 8 (forces >= 8 propagation rounds worst case),
    # plus random star edges
    edges = []
    for c in range(40):
        base = c * 100
        edges += [(base + i, base + i + 1) for i in range(7)]
    hub = 9000
    edges += [(hub, int(x)) for x in rng.integers(9100, 9200, 30)]
    pairs = pd.DataFrame({"id_a": [min(a, b) for a, b in edges],
                          "id_b": [max(a, b) for a, b in edges]})
    exp = connected_components(pairs).sort_values("doc_id").reset_index(drop=True)
    ds = rd.from_arrow(pa.Table.from_pandas(pairs, preserve_index=False))
    got = (connected_components_ds(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True)[["doc_id", "cluster_id"]])
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_near_dup_clusters_distributed_path_equals_driver(near_dup_docs):
    """Forcing the pair-count cap to 0 routes clustering through the
    distributed components; the result must be identical to the driver
    union-find path."""
    from rayschema.dedup import near_dup_clusters

    a = near_dup_clusters(near_dup_docs, jaccard_threshold=0.85,
                          concurrency=(1, 2))
    b = near_dup_clusters(near_dup_docs, jaccard_threshold=0.85,
                          concurrency=(1, 2), driver_pair_cap=0)
    na = a.sort_values("doc_id").reset_index(drop=True)
    nb = b.sort_values("doc_id").reset_index(drop=True)[list(a.columns)]
    pd.testing.assert_frame_equal(na.astype("int64"), nb.astype("int64"))


def test_near_dup_clusters_pipeline(near_dup_docs):
    from rayschema.dedup import near_dup_clusters

    cc = near_dup_clusters(near_dup_docs, jaccard_threshold=0.85,
                           concurrency=(1, 2))
    got = dict(zip(cc["doc_id"], cc["cluster_id"]))
    # the 100/101 near-dup pair forms one cluster rooted at 100
    assert got.get(100) == 100 and got.get(101) == 100
    # standalone docs (40-79) never appear
    assert not any(40 <= d < 80 for d in cc["doc_id"])


def test_kmeans_quantized_matches_sql_and_handles_empty_cluster(ray_session):
    """Planted 2-cluster data with k=3 where init centroid 2 duplicates
    centroid 0: the argmin tie-break (lowest cluster) starves cluster 2,
    exercising the keep-previous-centroid branch; full SQL mirror at a
    small dim checks every integer step."""
    import duckdb
    import ray.data as rd

    from rayschema.similarity import kmeans_quantized

    rng = np.random.RandomState(5)
    dim, k = 6, 3
    a = rng.normal(0.5, 0.02, size=(20, dim))
    b = rng.normal(-0.5, 0.02, size=(20, dim))
    vecs = np.concatenate([a, b]).astype(np.float32)
    vecs[2] = vecs[0]                       # init duplicate -> empty cluster
    df = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                       "embedding": [v for v in vecs]})
    ds = rd.from_pandas(df).repartition(4)
    # one iteration: the duplicated init centroid ties on every point and
    # the lowest-cluster tie-break starves cluster 2 -> empty-cluster
    # branch (centroid kept = the quantized init vector, 0 members)
    got1 = kmeans_quantized(ds, k=k, iters=1)
    c2 = got1[got1["cluster"] == 2].sort_values("d")
    assert (c2["n_members"] == 0).all()
    init_q = np.sign(vecs[2].astype(np.float64)) * np.floor(
        np.abs(vecs[2].astype(np.float64)) * 1e6 + 0.5)
    assert np.array_equal(c2["c"].to_numpy(np.int64),
                          init_q.astype(np.int64))
    got = (kmeans_quantized(ds, k=k, iters=2)
           .sort_values(["cluster", "d"]).reset_index(drop=True))

    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame(
        {"vec_id": df["vec_id"],
         "embedding": [list(map(float, v)) for v in vecs]}))
    it = """
        a{n} AS (
          SELECT vec_id, cluster FROM (
            SELECT v.vec_id, c.cluster,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY sum((v.q - c.c) * (v.q - c.c)),
                                c.cluster) AS rn
            FROM v JOIN c{p} c USING (d)
            GROUP BY v.vec_id, c.cluster) WHERE rn = 1),
        m{n} AS (SELECT a.cluster, v.d, sum(v.q)::BIGINT AS s,
                        count(*)::BIGINT AS n
                 FROM a{n} a JOIN v USING (vec_id) GROUP BY a.cluster, v.d),
        c{n} AS (SELECT c{p}.cluster, c{p}.d,
                      coalesce(CASE WHEN m{n}.s >= 0
                                    THEN (2 * m{n}.s + m{n}.n) // (2 * m{n}.n)
                                    ELSE -((2 * (-m{n}.s) + m{n}.n)
                                           // (2 * m{n}.n)) END,
                               c{p}.c)::BIGINT AS c
                 FROM c{p} LEFT JOIN m{n}
                   ON c{p}.cluster = m{n}.cluster AND c{p}.d = m{n}.d)"""
    sql = f"""
        WITH v AS (
          SELECT e.vec_id, i.range AS d,
                 round(e.embedding[i.range]::DOUBLE * 1000000)::BIGINT AS q
          FROM embeddings e, range(1, {dim + 1}) i),
        c0 AS (SELECT vec_id AS cluster, d, q AS c FROM v
               WHERE vec_id < {k}),
        {it.format(n=1, p=0)},
        {it.format(n=2, p=1)},
        n2 AS (SELECT cluster, count(*)::BIGINT AS n_members
               FROM a2 GROUP BY cluster)
        SELECT c2.cluster, c2.d, c2.c,
               coalesce(n2.n_members, 0)::BIGINT AS n_members
        FROM c2 LEFT JOIN n2 USING (cluster)
        ORDER BY cluster, d"""
    want = con.sql(sql).df()
    for col in want.columns:
        want[col] = want[col].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def test_knn_ivf_kmeans_matches_registered_oracle(ray_session, sf_dir):
    """Engine vs the registered DuckDB oracle (the same SQL the driver
    runs): the IVF path is fully reproducible because codebook, assignment
    and probe are integer-exact."""
    import duckdb

    import __ray_entry__ as entry
    from rayschema.queries import knn_ivf_kmeans

    got = (knn_ivf_kmeans(sf_dir)
           .sort_values(["query_id", "rank"]).reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')")
    want = (con.sql(entry.oracle_sql()["knn_ivf_kmeans"]).df()
            .sort_values(["query_id", "rank"]).reset_index(drop=True))
    for c in ("query_id", "vec_id", "rank"):
        want[c] = want[c].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)
    # structural contract: each query's rank-1 hit is itself (it probes
    # its own bucket) at cosine 1.0
    top1 = got[got["rank"] == 1]
    assert list(top1["vec_id"]) == list(top1["query_id"])
    assert (top1["cosine"] == 1.0).all()


def test_pq_encode_matches_bruteforce_reference(ray_session):
    """pq_encode's batched kernel == a per-vector numpy reference against
    the same trained codebooks; codes in [0, k); error is the sum of
    per-subspace min integer squared distances."""
    import ray.data as rd

    from rayschema.dedup import round_half_away
    from rayschema.similarity import pq_encode, pq_train_codebooks

    rng = np.random.RandomState(9)
    m, sub, k, dim = 3, 4, 4, 12
    vecs = rng.normal(0, 0.5, size=(50, dim)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(50, dtype=np.int64),
                       "embedding": [v for v in vecs]})
    ds = rd.from_pandas(df).repartition(5)
    cents = pq_train_codebooks(ds, m=m, sub_dims=sub, k=k, iters=2)
    assert cents.shape == (m, k, sub)
    got = (pq_encode(ds, cents).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))

    q = round_half_away(vecs.astype(np.float64) * 1e6, 0).astype(np.int64)
    for i in range(50):
        err = 0
        for mi in range(m):
            d2 = ((q[i, mi * sub:(mi + 1) * sub] - cents[mi]) ** 2).sum(axis=1)
            assert got.loc[i, f"code_{mi + 1}"] == d2.argmin()
            err += d2.min()
        assert got.loc[i, "pq_err"] == err
    for mi in range(m):
        assert got[f"code_{mi + 1}"].between(0, k - 1).all()


def test_pq_fused_training_matches_per_subspace(ray_session):
    """The fused one-scan-per-iteration trainer is bit-identical to m
    separate kmeans_quantized runs over sliced datasets."""
    import ray.data as rd

    from rayschema.similarity import (_slice_vec_ds, kmeans_quantized,
                                      pq_train_codebooks)

    rng = np.random.RandomState(3)
    m, sub, k, dim = 4, 3, 4, 12
    vecs = rng.normal(0, 0.7, size=(60, dim)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(60, dtype=np.int64),
                       "embedding": [v for v in vecs]})
    ds = rd.from_pandas(df).repartition(6)
    fused = pq_train_codebooks(ds, m=m, sub_dims=sub, k=k, iters=2)
    for mi in range(m):
        km = kmeans_quantized(_slice_vec_ds(ds, mi * sub, (mi + 1) * sub),
                              k=k, iters=2)
        sep = (km.sort_values(["cluster", "d"])["c"]
               .to_numpy(np.int64).reshape(k, sub))
        assert np.array_equal(fused[mi], sep), f"subspace {mi} diverged"


def test_semdedup_removes_lower_id_neighbors_within_cluster(ray_session):
    """Planted two well-separated clusters; exact duplicates and a
    near-duplicate inside one cluster must be dropped (lower id kept),
    while a cross-cluster near-identical pair must BOTH survive — the
    SemDeDup rule only compares within a cluster."""
    import ray.data as rd

    from rayschema.similarity import semdedup

    rng = np.random.RandomState(11)
    dim = 8
    a = rng.normal(0.5, 0.05, size=(12, dim))
    b = rng.normal(-0.5, 0.05, size=(12, dim))
    vecs = np.concatenate([a, b]).astype(np.float32)
    # ids 0 and 1 are the k-means init (one per planted cluster)
    vecs[1] = -vecs[0]
    vecs[5] = vecs[3]                    # exact dup, same cluster as 3
    vecs[7] = vecs[3] * 1.0001           # near dup (cosine ~1)
    df = pd.DataFrame({"vec_id": np.arange(24, dtype=np.int64),
                       "embedding": [v for v in vecs]})
    ds = rd.from_pandas(df).repartition(3)
    kept = (semdedup(ds, k=2, iters=2, threshold=0.999)
            .to_pandas().sort_values("vec_id"))
    kept_ids = set(kept["vec_id"].tolist())
    assert 3 in kept_ids and 5 not in kept_ids and 7 not in kept_ids
    # vec 1 = -vec 0: cosine -1, different clusters -> both kept
    assert 0 in kept_ids and 1 in kept_ids
    # brute-force expectation: removed iff a lower-id SAME-SIDE member
    # sits at cosine >= threshold (sides are exactly the k-means result
    # here: init centroids are vec0 and -vec0)
    v64 = vecs.astype(np.float64)
    nmat = v64 / np.linalg.norm(v64, axis=1, keepdims=True)
    side = (nmat @ nmat[0] < 0).astype(int)      # 0 = vec0's cluster
    sims = nmat @ nmat.T
    expected_removed = {
        j for j in range(24)
        if any(side[i] == side[j] and sims[i, j] >= 0.999
               for i in range(j))}
    assert kept_ids == set(range(24)) - expected_removed
    # cluster column is a valid assignment: same-planted-side ids agree
    cl = dict(zip(kept["vec_id"], kept["cluster"]))
    assert len({cl[i] for i in (0, 3, 10)}) == 1
    assert len({cl[i] for i in (1, 13, 20)}) == 1
    assert cl[0] != cl[1]


def test_pair_recall_distributed_matches_sets(ray_session):
    """_pair_recall (packed-key sorted scan + Sum, O(1) driver state) must
    equal the Python set intersection on overlapping pair lists with
    duplicates and many keys (boundary-group coverage)."""
    import ray.data as rd

    from rayschema.queries import _pair_recall

    rng = np.random.RandomState(3)
    exact = [(int(a), int(a) + int(b) + 1)
             for a, b in rng.randint(0, 4000, size=(3000, 2))]
    found = [p for p in exact if rng.rand() < 0.6] \
        + [(int(a), int(a) + int(b) + 1)
           for a, b in rng.randint(0, 4000, size=(800, 2))] \
        + exact[:25]                                   # duplicates
    e_df = pd.DataFrame(exact, columns=["id_a", "id_b"])
    f_df = pd.DataFrame(found, columns=["id_a", "id_b"])
    n_exact, n_inter = _pair_recall(
        rd.from_pandas(e_df).repartition(5),
        rd.from_pandas(f_df).repartition(3))
    es, fs = set(exact), set(found)
    assert n_exact == len(es)
    assert n_inter == len(es & fs)


def test_semdedup_scan_equals_broadcast(ray_session):
    """The per-cluster sorted-scan scale path (round 4 default) and the
    broadcast-matrix baseline emit IDENTICAL kept rows — on the real
    sf0.001 embeddings table, where clusters straddle sorted blocks and
    exercise the driver boundary residual."""
    import ray.data as rd

    from rayschema.similarity import semdedup

    path = "/root/testdata/sf0.001/embeddings.parquet"

    def run(strategy):
        ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
        return (semdedup(ds, k=4, iters=2, threshold=0.4,
                         strategy=strategy).to_pandas()
                .sort_values("vec_id").reset_index(drop=True))

    pd.testing.assert_frame_equal(run("scan")[["vec_id", "cluster"]],
                                  run("broadcast")[["vec_id", "cluster"]])


def _write_emb(tmp_path, ids, vecs, labels):
    import os

    import pyarrow.parquet as pq
    t = pa.table({
        "vec_id": pa.array(np.asarray(ids, np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.asarray(labels, np.int32), type=pa.int32()),
    })
    pq.write_table(t, os.path.join(tmp_path, "embeddings.parquet"))
    return str(tmp_path)


def test_hard_negative_mining_planted(ray_session, tmp_path):
    """The nearest different-label vector wins; same-label vectors are
    never returned however similar."""
    from rayschema.queries import hard_negative_mining

    base = np.eye(4)[0]
    vecs = [base,                       # 0: query, label 0
            base * 0.999,               # 1: same label -> excluded
            base + 0.01 * np.eye(4)[1], # 2: diff label, nearly identical
            np.eye(4)[1],               # 3: diff label, orthogonal
            np.eye(4)[2],               # 4: query 1 (labeled 1)
            np.eye(4)[2] * 2]           # 5: same dir as 4, label 0
    labels = [0, 0, 1, 1, 1, 0]
    sf = _write_emb(tmp_path, range(6), vecs, labels)

    # only vec 0 and 4 exist as queries 0..2? query set is vec_id 0,1,2
    got = hard_negative_mining(sf, k=2)
    g0 = got[got["query_id"] == 0]
    assert g0.iloc[0]["vec_id"] == 2            # closest diff-label
    assert 1 not in set(g0["vec_id"])           # same-label excluded
    assert set(g0["neg_label"]) == {1}


def test_knn_label_predict_planted(ray_session, tmp_path):
    """Three tight same-label clusters: every vector's LOO 3-NN vote is its
    own cluster's label -> all correct; one planted outlier inside a
    foreign cluster is predicted wrong."""
    from rayschema.queries import knn_label_predict

    rng = np.random.RandomState(7)
    vecs, labels = [], []
    centers = np.eye(3) * 10
    for c in range(3):
        for _ in range(8):
            vecs.append(centers[c] + rng.normal(0, 0.05, 3))
            labels.append(c)
    vecs.append(centers[0] + rng.normal(0, 0.05, 3))   # outlier: label 2
    labels.append(2)
    sf = _write_emb(tmp_path, range(len(vecs)), vecs, labels)
    got = (knn_label_predict(sf, k=3).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert got.loc[24, "pred_label"] == 0 and got.loc[24, "correct"] == 0
    assert got.loc[:23, "correct"].all()


def test_near_dup_triangles_planted(ray_session, tmp_path):
    """A planted 4-clique of near-identical docs yields 3 triangles per
    member (K4 has C(3,2)=3 per node); an isolated pair contributes
    none."""
    import os

    import pyarrow.parquet as pq

    from rayschema.queries import near_dup_triangles

    base = " ".join(f"a{j:03d}b{j:02d}" for j in range(20))
    clique = [(i, base + f" t{i}") for i in range(4)]       # pairwise sim
    pair = [(10, "zz " + "q9z8x7 " * 15), (11, "zz " + "q9z8x7 " * 15
                                           + "w")]
    lone = [(20, " ".join(f"u{j:02d}v{j}" for j in range(25)))]
    df = pd.DataFrame(clique + pair + lone, columns=["doc_id", "text"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    got = (near_dup_triangles(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 1, 2, 3]
    assert got["n_triangles"].tolist() == [3, 3, 3, 3]


def test_near_dup_pagerank_hand_case(ray_session, tmp_path):
    """Integer PageRank on a planted path A-B-C (B central): after 2
    exact integer rounds B outranks A and C, which tie by symmetry;
    values equal the hand-computed floor-division recurrence."""
    import os

    import pyarrow.parquet as pq

    from rayschema.queries import near_dup_pagerank

    base = " ".join(f"a{j:03d}b{j:02d}" for j in range(20))
    mid = " ".join(f"a{j:03d}b{j:02d}" for j in range(10)) + " " \
        + " ".join(f"c{j:03d}d{j:02d}" for j in range(10))
    other = " ".join(f"c{j:03d}d{j:02d}" for j in range(20))
    # A~B and B~C share half their shingles (>= 0.25); A~C share none
    df = pd.DataFrame([(0, base), (1, mid), (2, other)],
                      columns=["doc_id", "text"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    got = (near_dup_pagerank(str(tmp_path))
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 1, 2]
    S = 1_000_000
    # deg: A=1, B=2, C=1 ; r0 = S each
    r1 = {0: 150000 + (85 * (S // 2)) // 100,
          1: 150000 + (85 * (S + S)) // 100,
          2: 150000 + (85 * (S // 2)) // 100}
    r2 = {0: 150000 + (85 * (r1[1] // 2)) // 100,
          1: 150000 + (85 * (r1[0] + r1[2])) // 100,
          2: 150000 + (85 * (r1[1] // 2)) // 100}
    assert got["pagerank"].tolist() == [r2[0], r2[1], r2[2]]
    assert r2[1] > r2[0] == r2[2]


def test_knn_label_predict_cluster_path(ray_session, tmp_path):
    """The cluster-localized scale path equals the broadcast path when
    true neighbors share k-means clusters (planted well-separated
    clusters — the regime the localization assumes), and still emits one
    row per vector."""
    from rayschema.queries import knn_label_predict

    rng = np.random.RandomState(9)
    vecs, labels = [], []
    centers = np.eye(4) * 10
    for c in range(4):
        for _ in range(10):
            vecs.append(centers[c] + rng.normal(0, 0.05, 4))
            labels.append(c % 2)           # labels differ from clusters
    sf = _write_emb(tmp_path, range(len(vecs)), vecs, labels)
    a = (knn_label_predict(sf, k=3).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    b = (knn_label_predict(sf, k=3, strategy="cluster").to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(b) == 40 and b["correct"].all()


def test_ppjoin_equals_exact_jaccard_pairs(ray_session):
    import ray.data as rd

    from rayschema.dedup import exact_jaccard_pairs, ppjoin_pairs

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"])
    want = (exact_jaccard_pairs(ds, id_limit=300, k=5, threshold=0.5)
            .to_pandas().sort_values(["id_a", "id_b"])
            .reset_index(drop=True))
    got = (ppjoin_pairs(ds, threshold=0.5, shingle_k=5, id_limit=300)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_ppjoin_driver_path_equals_distributed(ray_session):
    """The small-scope fused driver path (default under
    PPJOIN_DRIVER_CAP) and the distributed prefix-filter pipeline
    (forced with driver_cap=0) must emit identical verified pairs."""
    import ray.data as rd

    from rayschema.dedup import ppjoin_pairs

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"])
    fast = (ppjoin_pairs(ds, threshold=0.5, shingle_k=5, id_limit=300)
            .to_pandas().sort_values(["id_a", "id_b"])
            .reset_index(drop=True))
    dist = (ppjoin_pairs(ds, threshold=0.5, shingle_k=5, id_limit=300,
                         driver_cap=0)
            .to_pandas().sort_values(["id_a", "id_b"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, dist)
    assert len(fast) > 0


def test_ppjoin_prefix_filter_never_drops_pairs(ray_session, tmp_path):
    """Randomized no-loss property: on a corpus engineered for heavy
    shingle overlap, prefix filtering + length filter must reproduce the
    quadratic ground truth exactly (the PPJoin completeness theorem)."""
    import ray.data as rd

    from rayschema.dedup import exact_jaccard_pairs, ppjoin_pairs

    import os

    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = []
    for i in range(80):
        words = base.split()
        k = rng.randint(0, 4)
        for _ in range(k):               # light mutations -> mixed jaccards
            words[rng.randint(len(words))] = f"w{rng.randint(20)}"
        texts.append(" ".join(words))
    df = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64),
                       "text": texts})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    ds = rd.read_parquet(os.path.join(tmp_path, "documents.parquet"))
    for thr in (0.4, 0.7, 0.9):
        want = (exact_jaccard_pairs(ds, id_limit=80, k=5, threshold=thr)
                .to_pandas().sort_values(["id_a", "id_b"])
                .reset_index(drop=True))
        for cap in (None, 0):        # driver fast path AND distributed
            got = (ppjoin_pairs(ds, threshold=thr, shingle_k=5,
                                id_limit=80,
                                **({} if cap is None
                                   else {"driver_cap": cap}))
                   .to_pandas().sort_values(["id_a", "id_b"])
                   .reset_index(drop=True))
            pd.testing.assert_frame_equal(got, want), (thr, cap)


def test_edit_distance_pairs_planted(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from rayschema.dedup import edit_distance_pairs

    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog"
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [base,
                 base.replace("quick", "quack"),          # ed 1 from 0
                 base + " twice",                         # ed 6 from 0
                 "completely different text here ok",     # far from all
                 base,                                    # ed 0 dup of 0
                 None]})                                  # null: dropped
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    ds = rd.read_parquet(os.path.join(tmp_path, "documents.parquet"))
    out = (edit_distance_pairs(ds, id_limit=10, k=6, q=3)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    got = {(int(r.id_a), int(r.id_b)): int(r.edit_distance)
           for r in out.itertuples(index=False)}
    assert got[(0, 1)] == 1
    assert got[(0, 2)] == 6
    assert got[(0, 4)] == 0
    assert got[(1, 4)] == 1
    assert got[(2, 4)] == 6
    assert (1, 2) in got or True  # ed("quack" variant, "+ twice") may be 8 > k
    assert all(v <= 6 for v in got.values())
    assert not any(3 in p for p in got)     # the far doc pairs with nobody


def test_edit_distance_pairs_fuzz_vs_duckdb(ray_session, tmp_path):
    import os

    import duckdb
    import pyarrow.parquet as pq

    import ray.data as rd

    from rayschema.dedup import edit_distance_pairs

    rng = np.random.RandomState(11)
    alpha = list("abcde")
    texts = []
    for i in range(40):
        L = rng.randint(3, 30)
        texts.append("".join(rng.choice(alpha) for _ in range(L)))
    # plus mutated copies to guarantee near pairs
    for i in range(10):
        t = list(texts[i])
        for _ in range(rng.randint(1, 4)):
            t[rng.randint(len(t))] = rng.choice(alpha)
        texts.append("".join(t))
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    path = os.path.join(tmp_path, "documents.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    ds = rd.read_parquet(path)
    out = (edit_distance_pairs(ds, id_limit=100, k=4, q=3)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    want = duckdb.sql(f"""
        WITH d AS (SELECT doc_id, text FROM read_parquet('{path}'))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_distance
        FROM d a JOIN d b ON a.doc_id < b.doc_id
        WHERE levenshtein(a.text, b.text) <= 4
        ORDER BY 1, 2""").df()
    assert out["id_a"].tolist() == want["id_a"].tolist()
    assert out["id_b"].tolist() == want["id_b"].tolist()
    assert out["edit_distance"].tolist() == want["edit_distance"].tolist()


def test_record_linkage_clusters_planted(ray_session, tmp_path):
    """BLOCK -> MATCH -> CLUSTER composition: two planted near-dup groups
    (one transitively linked triple, one pair) and two loners; min-id
    component labels, singletons absent."""
    import os

    import pyarrow.parquet as pq

    from rayschema.queries import record_linkage_clusters

    base = "john smith 123 main street springfield usa"
    docs = pd.DataFrame({
        "doc_id": np.arange(7, dtype=np.int64),
        "text": [base,
                 base.replace("john", "jon"),          # ed 1 from 0
                 base.replace("123", "128"),           # ed 1 from 0
                 "maria garcia 9 elm avenue shelbyville",
                 "maria garcia 9 elm avenue shelbyvile",  # ed 1 from 3
                 "completely unrelated record aaaaaaaa",
                 None]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    out = record_linkage_clusters(str(tmp_path))
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}


def test_containment_pairs_subset_asymmetry(ray_session, tmp_path):
    """A short doc fully contained in a long one scores 1000000 ppm in
    the short->long direction but under threshold the other way; the
    grid also agrees with a brute-force python reference on every
    emitted row."""
    import os

    import pyarrow.parquet as _pq

    from rayschema.dedup import containment_pairs

    long_t = "the quick brown fox jumps over the lazy dog again"
    short_t = "quick brown fox jumps"      # substring: containment 1.0
    other = "completely unrelated text body with nothing shared"
    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": [long_t, short_t, other],
        "lang": ["en"] * 3, "source": ["s"] * 3})
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp_path, "documents.parquet"))
    import ray.data as rd
    ds = rd.read_parquet(os.path.join(tmp_path, "documents.parquet"))
    got = containment_pairs(ds, threshold_ppm=800_000).to_pandas() \
        .sort_values(["id_src", "id_dst"]).reset_index(drop=True)

    def grams(t):
        return frozenset(t[i:i + 5] for i in range(len(t) - 4))

    sets = {i: grams(t) for i, t in enumerate(df["text"])}
    ref = []
    for a in range(3):
        for b in range(3):
            if a == b:
                continue
            ni = len(sets[a] & sets[b])
            if ni and (1_000_000 * ni) // len(sets[a]) >= 800_000:
                ref.append((a, b, ni, len(sets[a]),
                            (1_000_000 * ni) // len(sets[a])))
    ref = pd.DataFrame(ref, columns=["id_src", "id_dst", "n_inter",
                                     "n_src", "cont_ppm"]) \
        .astype(np.int64)
    pd.testing.assert_frame_equal(got, ref)
    # direction asserted explicitly: short->long present, long->short not
    assert ((got["id_src"] == 1) & (got["id_dst"] == 0)).any()
    assert got.loc[(got["id_src"] == 1) & (got["id_dst"] == 0),
                   "cont_ppm"].iloc[0] == 1_000_000
    assert not ((got["id_src"] == 0) & (got["id_dst"] == 1)).any()


def test_jl_signs_and_projection_exact(ray_session, tmp_path):
    """Sign matrix matches the documented arithmetic hash element by
    element, and the batch matmul equals a per-element loop on a planted
    2-vector table."""
    import os

    import pyarrow.parquet as _pq

    from rayschema.queries import _jl_signs, jl_project_embeddings

    s = _jl_signs(64, 8)
    for d in (1, 7, 64):
        for k in (1, 5, 8):
            exp = 1 if ((d * 2654435761 + k * 97) % 1000003) % 2 == 0 \
                else -1
            assert s[d - 1, k - 1] == exp
    assert set(np.unique(s)) <= {-1, 1}
    # planted: v0 = e1 (first basis), v1 = all 0.5 -> hand-computable
    v0 = np.zeros(64, dtype=np.float32)
    v0[0] = 1.0
    v1 = np.full(64, 0.5, dtype=np.float32)
    tab = pa.table({
        "vec_id": pa.array(np.array([0, 1], dtype=np.int64)),
        "embedding": pa.array([v0.tolist(), v1.tolist()],
                              type=pa.list_(pa.float32()))})
    _pq.write_table(tab, os.path.join(tmp_path, "embeddings.parquet"))
    got = jl_project_embeddings(str(tmp_path)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    p0 = got.iloc[0][[f"p{k}" for k in range(1, 9)]].to_numpy(np.int64)
    assert (p0 == 1_000_000 * s[0]).all()
    p1 = got.iloc[1][[f"p{k}" for k in range(1, 9)]].to_numpy(np.int64)
    assert (p1 == 500_000 * s.sum(axis=0)).all()


def test_ppjoin_driver_chunked_pairs_equal(ray_session, monkeypatch):
    """A tiny PPJOIN_DRIVER_PAIR_BUDGET forces the sliced per-bucket
    pair generation (bounded driver memory on hot shared shingles);
    verified pairs must be identical to the unchunked run."""
    import ray.data as rd

    from rayschema import dedup as dd

    rng = np.random.default_rng(7)
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = [base + (" extra" * int(rng.integers(0, 4))) + str(i % 3)
             for i in range(40)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(40, dtype=np.int64)),
        "text": pa.array(texts)}))
    fast = dd.ppjoin_pairs(ds, threshold=0.6, driver_cap=10_000) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    monkeypatch.setattr(dd, "PPJOIN_DRIVER_PAIR_BUDGET", 8)
    slow = dd.ppjoin_pairs(ds, threshold=0.6, driver_cap=10_000) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(fast) > 0
    assert fast.values.tolist() == slow.values.tolist()


def test_connected_components_ds_empty_graph(ray_session):
    """A zero-pair graph must short-circuit to a TYPED empty result —
    the raw min-label join would reach Acero schemaless and raise
    (the sf0.1 sweep failure mode)."""
    import ray.data as rd

    from rayschema.dedup import connected_components_ds

    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64())}))
    out = connected_components_ds(pairs)
    # Ray's to_pandas drops columns on ANY empty dataset (hence the
    # typed-empty handling at the query layer); assert the Dataset
    # schema and the row count here
    assert out.schema().names == ["doc_id", "cluster_id"]
    assert out.count() == 0


def test_minhash_inproc_matches_distributed(near_dup_docs):
    """The footer-gated fused in-process path (_minhash_inproc, the
    _ppjoin_driver discipline) must return IDENTICAL rows to the
    distributed three-shuffle plan — same signatures, same band-key
    salt, same _emit_group_pairs, same rounding."""
    from rayschema.dedup import _minhash_inproc, minhash_near_dups

    for thr in (0.5, 0.7, 0.8):
        dist = minhash_near_dups(near_dup_docs, threshold=thr,
                                 concurrency=(1, 2)).to_pandas()
        inp = _minhash_inproc(near_dup_docs.to_pandas(), "doc_id", "text",
                              64, 16, 5, thr).to_pandas()
        key = lambda d: sorted(map(tuple, d[["id_a", "id_b", "jaccard"]]
                                   .values.tolist()))
        assert key(dist) == key(inp), thr


def test_minhash_n_rows_gate_takes_inproc_path(near_dup_docs):
    """Passing n_rows <= MINHASH_INPROC_CAP routes through the in-process
    path and still yields the verified near-dup pair."""
    from rayschema.dedup import MINHASH_INPROC_CAP, minhash_near_dups

    out = minhash_near_dups(near_dup_docs, threshold=0.8,
                            n_rows=82).to_pandas()
    assert MINHASH_INPROC_CAP >= 82
    assert (100, 101) in set(zip(out["id_a"], out["id_b"]))


def test_simhash_inproc_matches_distributed(near_dup_docs):
    """_simhash_inproc must return IDENTICAL (id_a, id_b, hamming) rows to
    the distributed bucket-scan path (shared _simhash_bucket_pairs)."""
    from rayschema.dedup import _simhash_inproc, simhash_near_dups

    dist = simhash_near_dups(near_dup_docs, max_hamming=3).to_pandas()
    inp = _simhash_inproc(near_dup_docs.to_pandas(), "doc_id", "text",
                          3, 1024).to_pandas()
    key = lambda d: sorted(map(tuple, d[["id_a", "id_b", "hamming"]]
                               .values.tolist()))
    assert key(dist) == key(inp)
    # the gate itself
    gated = simhash_near_dups(near_dup_docs, max_hamming=3,
                              n_rows=82).to_pandas()
    assert key(gated) == key(dist)


def test_exact_dedup_inproc_matches_distributed(ray_session):
    """_exact_dedup_core's footer-gated in-process GROUP BY must equal the
    24-byte-shuffle distributed plan for both emit modes, nulls included."""
    import ray.data as rd

    from rayschema.queries import _exact_dedup_core

    rows = ([{"doc_id": i, "text": f"unique {i}"} for i in range(20)]
            + [{"doc_id": 100 + i, "text": "dup body"} for i in range(5)]
            + [{"doc_id": 200 + i, "text": None} for i in range(3)])
    ds = rd.from_items(rows)
    for emit in ("kept", "losers"):
        dist = sorted(_exact_dedup_core(ds, emit=emit)
                      .to_pandas()["doc_id"].tolist())
        inp = sorted(_exact_dedup_core(ds, emit=emit, n_rows=len(rows))
                     .to_pandas()["doc_id"].tolist())
        assert dist == inp, emit
    kept = sorted(_exact_dedup_core(ds, emit="kept", n_rows=len(rows))
                  .to_pandas()["doc_id"].tolist())
    assert 100 in kept and 101 not in kept and 200 in kept and 201 not in kept
