"""Driver contract for the rayschema engine.

``entry()`` runs the flagship validation pipeline over
/root/testdata/sf0.001/documents.parquet; ``queries()`` exposes every
implemented operator family (SURVEY.md §2); ``oracle_sql()`` mirrors the
SQL-expressible ones in DuckDB with IDENTICAL column names. Ray is initialised
by the driver — nothing here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from rayschema import queries as Q

SF0001 = "/root/testdata/sf0.001"

# Shared CTE chain for the exact near-dup pairs (char-5-gram jaccard,
# doc_id < 300 scope), min-label clusters, and the leakage-safe split.
# Used by split_by_cluster and re-used by split_leakage_audit. The head
# "WITH RECURSIVE" is supplied by the caller.
_SPLIT_CTES = """docs AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id < 300 AND text IS NOT NULL AND length(text) >= 5),
            sh AS (
              SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 5) AS s
              FROM (SELECT doc_id, text,
                           unnest(generate_series(1, length(text) - 4)) AS i
                    FROM docs)),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT i.id_a, i.id_b
              FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
                           JOIN sizes sb ON sb.doc_id = i.id_b
              WHERE i.ni * 1.0 / (sa.n + sb.n - i.ni) >= 0.5),
            edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            lab(node, label) AS (
              SELECT a, a FROM (SELECT DISTINCT a FROM edges)
              UNION
              SELECT e.a, l.label FROM edges e JOIN lab l ON l.node = e.b),
            clusters AS (SELECT node, min(label) AS cl FROM lab GROUP BY node),
            rep AS (
              SELECT d.doc_id,
                     CAST(COALESCE(c.cl, d.doc_id) AS BIGINT) AS cluster_rep
              FROM docs d LEFT JOIN clusters c ON c.node = d.doc_id),
            spl AS (
              SELECT doc_id, cluster_rep,
                     CASE WHEN (cluster_rep % 100003) * 2654435761 % 10 < 8
                            THEN 'train'
                          WHEN (cluster_rep % 100003) * 2654435761 % 10 = 8
                            THEN 'val'
                          ELSE 'test' END AS split
              FROM rep)"""

# Shared CTE chain for the integer-exact distributed k-means (matches
# similarity.kmeans_quantized step for step): quantized vectors, two
# unrolled assign/update rounds. Parameterized by name suffix + 1-based
# dim range so the PQ oracle can instantiate one chain per subspace;
# the suffix-free instance backs the kmeans_embeddings oracle and is
# re-used by knn_ivf_kmeans (which adds a final assignment + probe).


def _kmeans_chain(p: str = "", lo: int = 1, hi: int = 65,
                  k: int = 4) -> str:
    return f"""
            v{p} AS (
              SELECT e.vec_id, i.range AS d,
                     round(e.embedding[i.range]::DOUBLE * 1000000)::BIGINT AS q
              FROM embeddings e, range({lo}, {hi}) i),
            c0{p} AS (SELECT vec_id AS cluster, d, q AS c FROM v{p}
                   WHERE vec_id < {k}),
            a1{p} AS (
              SELECT vec_id, cluster FROM (
                SELECT v.vec_id, c.cluster,
                       row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY sum((v.q - c.c) * (v.q - c.c)),
                                    c.cluster) AS rn
                FROM v{p} v JOIN c0{p} c USING (d)
                GROUP BY v.vec_id, c.cluster) WHERE rn = 1),
            m1{p} AS (SELECT a.cluster, v.d, sum(v.q)::BIGINT AS s,
                          count(*)::BIGINT AS n
                   FROM a1{p} a JOIN v{p} v USING (vec_id)
                   GROUP BY a.cluster, v.d),
            c1{p} AS (SELECT c0.cluster, c0.d,
                          coalesce(CASE WHEN m1.s >= 0
                                        THEN (2 * m1.s + m1.n) // (2 * m1.n)
                                        ELSE -((2 * (-m1.s) + m1.n)
                                               // (2 * m1.n)) END,
                                   c0.c)::BIGINT AS c
                   FROM c0{p} c0 LEFT JOIN m1{p} m1
                     ON c0.cluster = m1.cluster AND c0.d = m1.d),
            a2{p} AS (
              SELECT vec_id, cluster FROM (
                SELECT v.vec_id, c.cluster,
                       row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY sum((v.q - c.c) * (v.q - c.c)),
                                    c.cluster) AS rn
                FROM v{p} v JOIN c1{p} c USING (d)
                GROUP BY v.vec_id, c.cluster) WHERE rn = 1),
            m2{p} AS (SELECT a.cluster, v.d, sum(v.q)::BIGINT AS s,
                          count(*)::BIGINT AS n
                   FROM a2{p} a JOIN v{p} v USING (vec_id)
                   GROUP BY a.cluster, v.d),
            c2{p} AS (SELECT c1.cluster, c1.d,
                          coalesce(CASE WHEN m2.s >= 0
                                        THEN (2 * m2.s + m2.n) // (2 * m2.n)
                                        ELSE -((2 * (-m2.s) + m2.n)
                                               // (2 * m2.n)) END,
                                   c1.c)::BIGINT AS c
                   FROM c1{p} c1 LEFT JOIN m2{p} m2
                     ON c1.cluster = m2.cluster AND c1.d = m2.d)"""


_KMEANS_CTES = _kmeans_chain()


def _kcenter_sql(k: int = 8) -> str:
    """Unrolled farthest-point-first chain mirroring
    rayschema.queries.kcenter_select_embeddings round for round
    (integer squared distances on the same 1e-6 quantization)."""
    # distances via ||a||^2 + ||b||^2 - 2<a,b> on DOUBLE lists: every
    # intermediate is an integer-valued double < 2^53, so the native
    # inner-product kernel is EXACT (equality-tested vs the BIGINT
    # lambda form) and ~3000x faster than a per-dimension lambda
    parts = ["""v AS MATERIALIZED (
              SELECT vec_id,
                     list_transform(embedding,
                         x -> round(x::DOUBLE * 1000000)) AS qd
              FROM embeddings)""",
             """n AS MATERIALIZED (
              SELECT vec_id, qd,
                     list_inner_product(qd, qd) AS nn FROM v)""",
             """dall AS MATERIALIZED (
              SELECT a.vec_id AS ia, b.vec_id AS ib,
                     (a.nn + b.nn
                      - 2 * list_inner_product(a.qd, b.qd))::BIGINT
                       AS d2
              FROM n a, n b)""",
             """s1 AS (SELECT min(vec_id) AS vec_id,
                              -1::BIGINT AS d2, 1 AS rnd FROM v)"""]
    prev = ["s1"]
    for r in range(2, k + 1):
        sel = " UNION ALL ".join(f"SELECT vec_id FROM {s}"
                                 for s in prev)
        parts.append(f"""p{r} AS (
              SELECT ia AS vec_id, min(d2) AS dmin FROM dall
              WHERE ib IN ({sel}) AND ia NOT IN ({sel})
              GROUP BY ia)""")
        parts.append(f"""s{r} AS (
              SELECT vec_id, dmin::BIGINT AS d2, {r} AS rnd FROM p{r}
              ORDER BY dmin DESC, vec_id LIMIT 1)""")
        prev.append(f"s{r}")
    final = " UNION ALL ".join(
        f"SELECT rnd, vec_id, d2 FROM {s}" for s in prev)
    return ("WITH " + ",\n".join(parts)
            + f""" SELECT rnd::BIGINT AS rnd, vec_id::BIGINT AS vec_id,
                     d2::BIGINT AS d2
              FROM ({final}) ORDER BY rnd""")


def _silhouette_sql() -> str:
    """Silhouette oracle: final-centroid assignment (a3, the knn_ivf
    convention) + exact pairwise distances (the kcenter
    list_inner_product identity) + floor-milli means; s_ppm uses
    DuckDB's native truncating BIGINT division, which the engine pins."""
    return f"""
            WITH {_KMEANS_CTES},
            a3 AS (
              SELECT vec_id, cluster FROM (
                SELECT v.vec_id, c.cluster,
                       row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY sum((v.q - c.c) * (v.q - c.c)),
                                    c.cluster) AS rn
                FROM v JOIN c2 c USING (d)
                GROUP BY v.vec_id, c.cluster) WHERE rn = 1),
            vq AS MATERIALIZED (
              SELECT vec_id,
                     list_transform(embedding,
                         x -> round(x::DOUBLE * 1000000)) AS qd
              FROM embeddings),
            nn AS MATERIALIZED (
              SELECT vec_id, qd,
                     list_inner_product(qd, qd) AS n2 FROM vq),
            dall AS MATERIALIZED (
              SELECT a.vec_id AS ia, b.vec_id AS ib,
                     (a.n2 + b.n2
                      - 2 * list_inner_product(a.qd, b.qd))::BIGINT
                       AS d2
              FROM nn a, nn b),
            pc AS (
              SELECT d.ia AS vec_id, a.cluster,
                     sum(d.d2)::BIGINT AS sd, count(*)::BIGINT AS n
              FROM dall d JOIN a3 a ON a.vec_id = d.ib
              GROUP BY 1, 2),
            own AS (
              SELECT p.vec_id, p.cluster, p.sd, p.n,
                     CASE WHEN p.n > 1 THEN (1000 * p.sd) // (p.n - 1)
                          ELSE 0 END AS a_milli
              FROM pc p JOIN a3 a
                ON a.vec_id = p.vec_id AND a.cluster = p.cluster),
            beta AS (
              SELECT p.vec_id,
                     min((1000 * p.sd) // p.n) AS b_milli
              FROM pc p JOIN a3 a
                ON a.vec_id = p.vec_id AND a.cluster <> p.cluster
              GROUP BY 1)
            SELECT o.vec_id, o.cluster::BIGINT AS cluster,
                   o.a_milli::BIGINT AS a_milli,
                   COALESCE(b.b_milli, 0)::BIGINT AS b_milli,
                   CASE WHEN o.n = 1 OR b.b_milli IS NULL
                          OR greatest(o.a_milli, b.b_milli) = 0 THEN 0
                        ELSE (1000000::HUGEINT
                              * (b.b_milli - o.a_milli))
                             // greatest(o.a_milli, b.b_milli)
                   END::BIGINT AS s_ppm
            FROM own o LEFT JOIN beta b USING (vec_id)
            ORDER BY o.vec_id"""


def _corr_matrix_sql() -> str:
    """Six unioned per-pair moment scans mirroring
    rayschema.queries.corr_matrix_lineitem (same integer scalings and
    the corr_quantity_price fixed-order float64 corr expression)."""
    ex = {"qty": "(CAST(round(l_quantity * 100) AS BIGINT) // 100)",
          "price": "(CAST(round(l_extendedprice * 100) AS BIGINT)"
                   " // 100)",
          "disc": "CAST(round(l_discount * 10000) AS BIGINT)",
          "tax": "CAST(round(l_tax * 10000) AS BIGINT)"}
    names = ("qty", "price", "disc", "tax")
    sels = []
    for i in range(4):
        for j in range(i + 1, 4):
            a, b = names[i], names[j]
            x, y = ex[a], ex[b]
            sels.append(f"""
              SELECT '{a}' AS var_a, '{b}' AS var_b,
                     count(*)::BIGINT AS n,
                     sum({x})::BIGINT AS sum_x,
                     sum({y})::BIGINT AS sum_y,
                     sum({x} * {y})::BIGINT AS sum_xy,
                     sum({x} * {x})::BIGINT AS sum_x2,
                     sum({y} * {y})::BIGINT AS sum_y2
              FROM lineitem""")
    return f"""
            WITH m AS ({" UNION ALL ".join(sels)})
            SELECT var_a, var_b, n, sum_x, sum_y, sum_xy, sum_x2,
                   sum_y2,
                   CASE WHEN sqrt((n::DOUBLE * sum_x2::DOUBLE
                                   - sum_x::DOUBLE * sum_x::DOUBLE)
                                  * (n::DOUBLE * sum_y2::DOUBLE
                                     - sum_y::DOUBLE * sum_y::DOUBLE))
                          > 0
                        THEN floor((1000000.0
                                    * (n::DOUBLE * sum_xy::DOUBLE
                                       - sum_x::DOUBLE * sum_y::DOUBLE))
                                   / sqrt((n::DOUBLE * sum_x2::DOUBLE
                                           - sum_x::DOUBLE
                                             * sum_x::DOUBLE)
                                          * (n::DOUBLE * sum_y2::DOUBLE
                                             - sum_y::DOUBLE
                                               * sum_y::DOUBLE)))
                        ELSE 0 END::BIGINT AS corr_ppm
            FROM m ORDER BY var_a, var_b"""


def _hits_sql(iters: int = 2) -> str:
    """Unrolled integer-ppb HITS CTEs mirroring rayschema.graph.hits half-
    step for half-step (divide-by-ceil normalization in BIGINT — DuckDB
    sum() widens to HUGEINT so the raw sums never overflow)."""
    ctes = ["""pairs AS (
              SELECT DISTINCT o.o_custkey * 2 AS c,
                              l.l_suppkey * 2 + 1 AS s
              FROM lineitem l JOIN orders o
                ON l.l_orderkey = o.o_orderkey)"""]
    prev_h = None
    for t in range(1, iters + 1):
        if prev_h is None:
            ctes.append(f"""a{t}r AS (
              SELECT s, count(*)::BIGINT * 1000000000 AS raw
              FROM pairs GROUP BY s)""")
        else:
            ctes.append(f"""a{t}r AS (
              SELECT p.s, sum(h.h)::BIGINT AS raw
              FROM pairs p JOIN {prev_h} h ON h.c = p.c GROUP BY p.s)""")
        ctes.append(f"""a{t} AS (
              SELECT s, raw // ((SELECT (max(raw) + 999999999)
                                 // 1000000000 FROM a{t}r)) AS a
              FROM a{t}r)""")
        ctes.append(f"""h{t}r AS (
              SELECT p.c, sum(a.a)::BIGINT AS raw
              FROM pairs p JOIN a{t} a ON a.s = p.s GROUP BY p.c)""")
        ctes.append(f"""h{t} AS (
              SELECT c, raw // ((SELECT (max(raw) + 999999999)
                                 // 1000000000 FROM h{t}r)) AS h
              FROM h{t}r)""")
        prev_h = f"h{t}"
    k = iters
    return f"""
            WITH {','.join(ctes)},
            th AS (SELECT c AS node, h AS score,
                          row_number() OVER (ORDER BY h DESC, c) AS rk
                   FROM h{k}),
            ta AS (SELECT s AS node, a AS score,
                          row_number() OVER (ORDER BY a DESC, s) AS rk
                   FROM a{k})
            SELECT 'hub' AS side, CAST(node // 2 AS BIGINT) AS entity_key,
                   CAST(score AS BIGINT) AS score, CAST(rk AS BIGINT) AS rk
            FROM th WHERE rk <= 10
            UNION ALL
            SELECT 'auth', CAST(node // 2 AS BIGINT),
                   CAST(score AS BIGINT), CAST(rk AS BIGINT)
            FROM ta WHERE rk <= 10"""


def _pagerank_sql(iters: int = 4) -> str:
    """Unrolled integer-ppb PageRank CTEs mirroring rayschema.graph.pagerank
    superstep for superstep (DuckDB // truncates = floor on these
    all-positive values; sum(BIGINT) widens to HUGEINT, so no overflow)."""
    ctes = ["""pairs AS (
              SELECT DISTINCT o.o_custkey * 2 AS c_node,
                              l.l_suppkey * 2 + 1 AS s_node
              FROM lineitem l JOIN orders o
                ON l.l_orderkey = o.o_orderkey)""",
            """edges AS (SELECT c_node AS src, s_node AS dst FROM pairs
                      UNION ALL SELECT s_node, c_node FROM pairs)""",
            """deg AS (SELECT src AS node, count(*)::BIGINT AS deg
                    FROM edges GROUP BY src)""",
            """pr0 AS (SELECT node, 1000000000::BIGINT AS pr FROM deg)"""]
    for t in range(iters):
        ctes.append(f"""pr{t + 1} AS (
              SELECT e.dst AS node,
                     150000000 + (85 * sum(p.pr // d.deg)) // 100 AS pr
              FROM edges e JOIN pr{t} p ON p.node = e.src
              JOIN deg d ON d.node = e.src
              GROUP BY e.dst)""")
    return f"""
            WITH {','.join(ctes)},
            top AS (SELECT node, pr,
                           row_number() OVER (ORDER BY pr DESC, node) AS rk
                    FROM pr{iters})
            SELECT CAST(node AS BIGINT) AS node_id,
                   CASE WHEN node % 2 = 0 THEN 'customer'
                        ELSE 'supplier' END AS node_type,
                   CAST(node // 2 AS BIGINT) AS entity_key,
                   CAST(pr AS BIGINT) AS pagerank,
                   CAST(rk AS BIGINT) AS rk
            FROM top WHERE rk <= 20"""

def _bpe_sql(rounds: int = 3) -> str:
    """Unrolled BPE-trainer CTEs mirroring rayschema.queries.
    bpe_train_merges round for round: separator-joined token sequences
    (US = chr(31)), SQL replace() = str.replace non-overlapping
    left-to-right merge, winner by (count desc, pair lex asc)."""
    ctes = ["""w0 AS (
              SELECT word, count(*)::BIGINT AS c
              FROM (SELECT unnest(string_split(text, ' ')) AS word
                    FROM documents WHERE text IS NOT NULL)
              WHERE length(word) >= 2
                AND word NOT LIKE '%' || chr(31) || '%'
              GROUP BY word)""",
            """s1 AS (SELECT c, array_to_string(
                         regexp_extract_all(word, '(?s).'),
                         chr(31)) AS seq
                   FROM w0)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""t{r} AS (
              SELECT c, string_split(seq, chr(31)) AS t FROM s{r})""")
        ctes.append(f"""p{r} AS (
              SELECT pair, sum(c)::BIGINT AS n
              FROM (SELECT c,
                           unnest([t[i] || chr(31) || t[i + 1]
                                   FOR i IN range(1, len(t))]) AS pair
                    FROM t{r})
              GROUP BY pair)""")
        ctes.append(f"""m{r} AS (
              SELECT pair, n FROM p{r} ORDER BY n DESC, pair LIMIT 1)""")
        if r < rounds:
            ctes.append(f"""s{r + 1} AS (
              SELECT c, replace(seq, (SELECT pair FROM m{r}),
                                replace((SELECT pair FROM m{r}),
                                        chr(31), '')) AS seq
              FROM s{r})""")
    sel = "\nUNION ALL\n".join(
        f"""SELECT {r}::BIGINT AS rnd,
                   string_split(pair, chr(31))[1] AS merge_left,
                   string_split(pair, chr(31))[2] AS merge_right,
                   n
            FROM m{r}""" for r in range(1, rounds + 1))
    return f"WITH {','.join(ctes)}\n{sel}"


def _perceptron_sql(iters: int = 3) -> str:
    """Unrolled full-batch perceptron mirroring
    rayschema.queries.perceptron_train_langid iteration for iteration:
    the update is an order-independent SUM over the misclassified set
    at the iteration's entry weights, so plain aggregate CTEs reproduce
    every weight bit."""
    ctes = ["""f AS (
              SELECT CASE WHEN lang = 'en' THEN 1
                          ELSE -1 END::BIGINT AS y,
                     1::BIGINT AS x0,
                     length(text)::BIGINT AS x1,
                     (length(text) - length(replace(text, ' ', ''))
                      + 1)::BIGINT AS x2,
                     (length(text) - length(regexp_replace(
                          text, '[0-9]', '', 'g')))::BIGINT AS x3
              FROM documents
              WHERE text IS NOT NULL AND lang IS NOT NULL)""",
            "w0 AS (SELECT 0::BIGINT AS w0, 0::BIGINT AS w1, "
            "0::BIGINT AS w2, 0::BIGINT AS w3)"]
    for t in range(1, iters + 1):
        mis = (f"f.y * (w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2 "
               f"+ w.w3 * f.x3) <= 0")
        ctes.append(f"""s{t} AS (
              SELECT count(*) FILTER ({mis})::BIGINT AS n_mis,
                     coalesce(sum(f.y * f.x0) FILTER ({mis}), 0)
                       ::BIGINT AS u0,
                     coalesce(sum(f.y * f.x1) FILTER ({mis}), 0)
                       ::BIGINT AS u1,
                     coalesce(sum(f.y * f.x2) FILTER ({mis}), 0)
                       ::BIGINT AS u2,
                     coalesce(sum(f.y * f.x3) FILTER ({mis}), 0)
                       ::BIGINT AS u3
              FROM f CROSS JOIN w{t - 1} w)""")
        ctes.append(f"""w{t} AS (
              SELECT w.w0 + s.u0 AS w0, w.w1 + s.u1 AS w1,
                     w.w2 + s.u2 AS w2, w.w3 + s.u3 AS w3
              FROM w{t - 1} w CROSS JOIN s{t} s)""")
    sel = "\nUNION ALL\n".join(
        f"""SELECT {t}::BIGINT AS iter, s{t}.n_mis,
                   w{t}.w0 AS w_bias, w{t}.w1 AS w_chars,
                   w{t}.w2 AS w_words, w{t}.w3 AS w_digits
            FROM s{t} CROSS JOIN w{t}""" for t in range(1, iters + 1))
    return f"WITH {','.join(ctes)}\n{sel}"


def _weighted_pagerank_sql(iters: int = 3) -> str:
    """Unrolled weighted-PageRank CTEs mirroring graph.pagerank with
    weight_col: edge weight = distinct orders pairing the parties; the
    floor is PER EDGE — sum((p.pr * e.w) // d.wout) — exactly as the
    Ray path computes it."""
    ctes = ["""pw AS (
              SELECT c_node, s_node, count(*)::BIGINT AS w
              FROM (SELECT DISTINCT l.l_orderkey,
                           o.o_custkey * 2 AS c_node,
                           l.l_suppkey * 2 + 1 AS s_node
                    FROM lineitem l JOIN orders o
                      ON l.l_orderkey = o.o_orderkey)
              GROUP BY c_node, s_node)""",
            """edges AS (SELECT c_node AS src, s_node AS dst, w FROM pw
                      UNION ALL SELECT s_node, c_node, w FROM pw)""",
            """deg AS (SELECT src AS node, sum(w)::BIGINT AS wout
                    FROM edges GROUP BY src)""",
            """pr0 AS (SELECT node, 1000000000::BIGINT AS pr FROM deg)"""]
    for t in range(iters):
        ctes.append(f"""pr{t + 1} AS (
              SELECT e.dst AS node,
                     150000000 + (85 * sum((p.pr * e.w) // d.wout))
                       // 100 AS pr
              FROM edges e JOIN pr{t} p ON p.node = e.src
              JOIN deg d ON d.node = e.src
              GROUP BY e.dst)""")
    return f"""
            WITH {','.join(ctes)},
            top AS (SELECT node, pr,
                           row_number() OVER (ORDER BY pr DESC, node) AS rk
                    FROM pr{iters})
            SELECT CAST(node AS BIGINT) AS node_id,
                   CASE WHEN node % 2 = 0 THEN 'customer'
                        ELSE 'supplier' END AS node_type,
                   CAST(node // 2 AS BIGINT) AS entity_key,
                   CAST(pr AS BIGINT) AS pagerank,
                   CAST(rk AS BIGINT) AS rk
            FROM top WHERE rk <= 20"""


def _lpa_sql(iters: int = 3) -> str:
    """Unrolled label-propagation CTEs mirroring
    rayschema.graph.label_propagation superstep for superstep: the
    (count desc, label asc) winner is ONE integer max over the packed
    key n * 2^32 + (2^32 - 1 - label), exactly as the Ray path packs it
    (symmetric trade edges: every node has in-edges, so the inner join
    is the keep-old-label rule's no-op case)."""
    ctes = ["""pairs AS (
              SELECT DISTINCT o.o_custkey * 2 AS c_node,
                              l.l_suppkey * 2 + 1 AS s_node
              FROM lineitem l JOIN orders o
                ON l.l_orderkey = o.o_orderkey)""",
            """edges AS (SELECT c_node AS src, s_node AS dst FROM pairs
                      UNION ALL SELECT s_node, c_node FROM pairs)""",
            """lab0 AS (SELECT src AS node, src AS lab
                     FROM edges GROUP BY src)"""]
    for t in range(iters):
        ctes.append(f"""lab{t + 1} AS (
              SELECT node, 4294967295 - (max(key) % 4294967296) AS lab
              FROM (SELECT e.dst AS node,
                           count(*)::BIGINT * 4294967296
                             + (4294967295 - l.lab) AS key
                    FROM edges e JOIN lab{t} l ON l.node = e.src
                    GROUP BY e.dst, l.lab)
              GROUP BY node)""")
    return f"""
            WITH {','.join(ctes)},
            sizes AS (SELECT lab, count(*)::BIGINT AS n_members
                      FROM lab{iters} GROUP BY lab),
            top AS (SELECT lab, n_members,
                           row_number() OVER (ORDER BY n_members DESC,
                                              lab) AS rk
                    FROM sizes)
            SELECT CAST(lab AS BIGINT) AS community_id,
                   CAST(n_members AS BIGINT) AS n_members,
                   CAST(rk AS BIGINT) AS rk
            FROM top WHERE rk <= 20"""


def _score_sql(k: int = 32, rounds: int = 3) -> str:
    """Unrolled s-core (weighted k-core) peel mirroring
    rayschema.graph.kcore with weight_col round for round: STRENGTH over
    edges whose BOTH endpoints survive, >= k cut, final induced
    strength."""
    ctes = ["""pw AS (
              SELECT c_node, s_node, count(*)::BIGINT AS w
              FROM (SELECT DISTINCT l.l_orderkey,
                           o.o_custkey * 2 AS c_node,
                           l.l_suppkey * 2 + 1 AS s_node
                    FROM lineitem l JOIN orders o
                      ON l.l_orderkey = o.o_orderkey)
              GROUP BY c_node, s_node)""",
            """edges AS (SELECT c_node AS src, s_node AS dst, w FROM pw
                      UNION ALL SELECT s_node, c_node, w FROM pw)""",
            """alive0 AS (SELECT src AS node FROM edges GROUP BY src)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""alive{r} AS (
              SELECT e.dst AS node
              FROM edges e
              JOIN alive{r - 1} a ON a.node = e.src
              JOIN alive{r - 1} b ON b.node = e.dst
              GROUP BY e.dst
              HAVING sum(e.w) >= {int(k)})""")
    return f"""
            WITH {','.join(ctes)},
            final AS (SELECT e.dst AS node, sum(e.w)::BIGINT AS st
                      FROM edges e
                      JOIN alive{rounds} a ON a.node = e.src
                      JOIN alive{rounds} b ON b.node = e.dst
                      GROUP BY e.dst),
            top AS (SELECT node, st,
                           row_number() OVER (ORDER BY st DESC,
                                              node) AS rk
                    FROM final)
            SELECT CAST(node AS BIGINT) AS node_id,
                   CASE WHEN node % 2 = 0 THEN 'customer'
                        ELSE 'supplier' END AS node_type,
                   CAST(node // 2 AS BIGINT) AS entity_key,
                   CAST(st AS BIGINT) AS core_strength,
                   CAST(rk AS BIGINT) AS rk
            FROM top WHERE rk <= 20"""


def _bfs_sql(max_hops: int = 6) -> str:
    """Recursive BFS walk mirroring rayschema.graph.bfs_hops: the
    UNION-deduplicated (node, hops) exploration capped at
    hops < max_hops, min(hops) per node = first-visit level, grouped
    into the (hops, node_type) histogram. Source = smallest src node
    (the lowest trading customer, node parity even)."""
    return f"""
            WITH RECURSIVE pairs AS (
              SELECT DISTINCT o.o_custkey * 2 AS c_node,
                              l.l_suppkey * 2 + 1 AS s_node
              FROM lineitem l JOIN orders o
                ON l.l_orderkey = o.o_orderkey),
            edges AS (SELECT c_node AS src, s_node AS dst FROM pairs
                      UNION ALL SELECT s_node, c_node FROM pairs),
            walk(node, hops) AS (
              SELECT min(src), 0 FROM edges
              UNION
              SELECT e.dst, w.hops + 1
              FROM walk w JOIN edges e ON e.src = w.node
              WHERE w.hops < {int(max_hops)}),
            dist AS (SELECT node, min(hops) AS hops
                     FROM walk GROUP BY node)
            SELECT CAST(hops AS BIGINT) AS hops,
                   CASE WHEN node % 2 = 0 THEN 'customer'
                        ELSE 'supplier' END AS node_type,
                   count(*)::BIGINT AS n_nodes
            FROM dist GROUP BY hops, node_type
            ORDER BY hops, node_type"""


def _markov_sql(iters: int = 5) -> str:
    """Unrolled integer power iteration mirroring
    rayschema.queries.markov_stationary_events superstep for superstep:
    states = event types with >= 1 outgoing transition, transitions into
    non-states dropped with KEPT-mass row totals, p_0 = 10^12 // k, and
    p_{t+1}(j) = sum_i (p_t(i) * n_ij) // r_i with the floor PER TERM —
    HUGEINT keeps p * n exact at any corpus size. States with no
    incoming core transition survive each round at mass 0 via the LEFT
    JOIN from states."""
    ctes = ["""e AS (SELECT user_id, event_type, ts, event_id
                     FROM events
                     WHERE user_id IS NOT NULL AND ts IS NOT NULL
                       AND event_type IS NOT NULL)""",
            """w AS (SELECT event_type AS t1,
                            lead(event_type) OVER
                              (PARTITION BY user_id
                               ORDER BY ts, event_id) AS t2
                     FROM e)""",
            """tm AS (SELECT t1, t2, count(*)::HUGEINT AS n
                      FROM w WHERE t2 IS NOT NULL GROUP BY t1, t2)""",
            """states AS (SELECT DISTINCT t1 AS st FROM tm)""",
            """core AS (SELECT tm.t1, tm.t2, tm.n
                        FROM tm JOIN states s ON s.st = tm.t2)""",
            """r AS (SELECT t1, sum(n)::HUGEINT AS rt
                     FROM core GROUP BY t1)""",
            """k AS (SELECT count(*)::HUGEINT AS ns FROM states)""",
            """p0 AS (SELECT st, (1000000000000::HUGEINT // k.ns) AS m
                      FROM states, k)"""]
    for t in range(iters):
        ctes.append(f"""p{t + 1} AS (
              SELECT s.st,
                     COALESCE(sum((p.m * c.n) // r.rt), 0)::HUGEINT AS m
              FROM states s
              LEFT JOIN core c ON c.t2 = s.st
              LEFT JOIN p{t} p ON p.st = c.t1
              LEFT JOIN r ON r.t1 = c.t1
              GROUP BY s.st)""")
    return f"""
            WITH {','.join(ctes)}
            SELECT st AS event_type, m::BIGINT AS stat_p12,
                   row_number() OVER (ORDER BY m DESC, st ASC)::BIGINT AS rk
            FROM p{iters}
            ORDER BY event_type"""


def _ppr_sql(iters: int = 4) -> str:
    """Unrolled personalized-PageRank CTEs mirroring
    rayschema.queries.ppr_trade_graph: all initial mass on the seed
    (min customer node = min c_node), the 15% teleport returns to the
    seed each superstep, floors per edge identical to _pagerank_sql."""
    ctes = ["""pairs AS (
              SELECT DISTINCT o.o_custkey * 2 AS c_node,
                              l.l_suppkey * 2 + 1 AS s_node
              FROM lineitem l JOIN orders o
                ON l.l_orderkey = o.o_orderkey)""",
            """edges AS (SELECT c_node AS src, s_node AS dst FROM pairs
                      UNION ALL SELECT s_node, c_node FROM pairs)""",
            """deg AS (SELECT src AS node, count(*)::BIGINT AS deg
                    FROM edges GROUP BY src)""",
            """sd AS (SELECT min(c_node) AS s FROM pairs)""",
            """pr0 AS (SELECT node,
                    CASE WHEN node = sd.s THEN 1000000000::BIGINT
                         ELSE 0::BIGINT END AS pr
                    FROM deg CROSS JOIN sd)"""]
    for t in range(iters):
        ctes.append(f"""pr{t + 1} AS (
              SELECT e.dst AS node,
                     (CASE WHEN e.dst = sd.s THEN 150000000
                           ELSE 0 END)
                       + (85 * sum(p.pr // d.deg)) // 100 AS pr
              FROM edges e JOIN pr{t} p ON p.node = e.src
              JOIN deg d ON d.node = e.src
              CROSS JOIN sd
              GROUP BY e.dst, sd.s)""")
    return f"""
            WITH {','.join(ctes)},
            top AS (SELECT node, pr,
                           row_number() OVER (ORDER BY pr DESC, node) AS rk
                    FROM pr{iters})
            SELECT CAST(node AS BIGINT) AS node_id,
                   CASE WHEN node % 2 = 0 THEN 'customer'
                        ELSE 'supplier' END AS node_type,
                   CAST(node // 2 AS BIGINT) AS entity_key,
                   CAST(pr AS BIGINT) AS ppr,
                   CAST(rk AS BIGINT) AS rk
            FROM top WHERE rk <= 15"""


def _mmr_sql(picks: int = 5) -> str:
    """Unrolled greedy MMR CTEs mirroring
    rayschema.queries.mmr_rerank_documents round for round: top-20
    {join, hash}-tf pool, rel normalized to floor-ppm of the pool max,
    penalty = max distinct-word Jaccard (floor-ppm) against the picked
    set, winner by (score desc, doc_id asc)."""
    ctes = ["""w AS (SELECT doc_id, unnest(string_split(text, ' '))
                       AS word
                     FROM documents WHERE text IS NOT NULL)""",
            """tf AS (SELECT d.doc_id, COALESCE(x.rel, 0) AS rel
                   FROM (SELECT doc_id FROM documents
                         WHERE text IS NOT NULL) d
                   LEFT JOIN (SELECT doc_id,
                                count(*) FILTER (WHERE word IN
                                  ('join', 'hash'))::BIGINT AS rel
                              FROM w GROUP BY doc_id) x
                   USING (doc_id))""",
            """pool AS (SELECT doc_id, rel FROM
                     (SELECT doc_id, rel, row_number() OVER
                        (ORDER BY rel DESC, doc_id) AS rk FROM tf)
                     WHERE rk <= 20)""",
            """mx AS (SELECT max(rel)::HUGEINT AS m FROM pool)""",
            """pr AS (SELECT p.doc_id,
                     CASE WHEN mx.m = 0 THEN 0
                          ELSE (1000000::HUGEINT * p.rel) // mx.m
                     END AS rel_ppm
                   FROM pool p, mx)""",
            """pw AS (SELECT doc_id, word FROM w JOIN pool
                     USING (doc_id) GROUP BY doc_id, word)""",
            """cw AS (SELECT doc_id, count(*)::HUGEINT AS nw
                   FROM pw GROUP BY doc_id)""",
            """inter AS (SELECT x.doc_id AS da, y.doc_id AS db,
                            count(*)::HUGEINT AS i
                     FROM pw x JOIN pw y ON x.word = y.word
                                        AND x.doc_id <> y.doc_id
                     GROUP BY x.doc_id, y.doc_id)""",
            """sim AS (SELECT da, db,
                          (1000000::HUGEINT * i)
                            // (ca.nw + cb.nw - i) AS s
                    FROM inter JOIN cw ca ON ca.doc_id = da
                    JOIN cw cb ON cb.doc_id = db)""",
            """r1 AS (SELECT doc_id, rel_ppm AS sc FROM pr
                   ORDER BY sc DESC, doc_id LIMIT 1)""",
            """pk1 AS (SELECT doc_id FROM r1)"""]
    for k in range(2, picks + 1):
        ctes.append(f"""g{k} AS (
              SELECT pr.doc_id,
                     pr.rel_ppm - COALESCE(
                       (SELECT max(s.s) FROM sim s
                        JOIN pk{k - 1} p2 ON p2.doc_id = s.db
                        WHERE s.da = pr.doc_id), 0) AS sc
              FROM pr WHERE pr.doc_id NOT IN
                   (SELECT doc_id FROM pk{k - 1}))""")
        ctes.append(f"""r{k} AS (SELECT doc_id, sc FROM g{k}
                   ORDER BY sc DESC, doc_id LIMIT 1)""")
        ctes.append(f"""pk{k} AS (SELECT doc_id FROM pk{k - 1}
                   UNION ALL SELECT doc_id FROM r{k})""")
    sel = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS round, doc_id, sc::BIGINT AS mmr_score "
        f"FROM r{i}" for i in range(1, picks + 1))
    return f"""
            WITH {','.join(ctes)}
            SELECT * FROM ({sel}) ORDER BY round"""


def _kcore_sql(k: int = 12, rounds: int = 3) -> str:
    """Unrolled bounded k-core peel mirroring rayschema.graph.kcore round
    for round: in-degree over edges whose BOTH endpoints survive, >= k
    cut, final induced degree (zero-induced-degree survivors drop on
    both sides)."""
    ctes = ["""pairs AS (
              SELECT DISTINCT o.o_custkey * 2 AS c_node,
                              l.l_suppkey * 2 + 1 AS s_node
              FROM lineitem l JOIN orders o
                ON l.l_orderkey = o.o_orderkey)""",
            """edges AS (SELECT c_node AS src, s_node AS dst FROM pairs
                      UNION ALL SELECT s_node, c_node FROM pairs)""",
            """alive0 AS (SELECT src AS node FROM edges GROUP BY src)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""alive{r} AS (
              SELECT e.dst AS node
              FROM edges e
              JOIN alive{r - 1} a ON a.node = e.src
              JOIN alive{r - 1} b ON b.node = e.dst
              GROUP BY e.dst
              HAVING count(*) >= {int(k)})""")
    return f"""
            WITH {','.join(ctes)},
            final AS (SELECT e.dst AS node, count(*)::BIGINT AS core_deg
                      FROM edges e
                      JOIN alive{rounds} a ON a.node = e.src
                      JOIN alive{rounds} b ON b.node = e.dst
                      GROUP BY e.dst),
            top AS (SELECT node, core_deg,
                           row_number() OVER (ORDER BY core_deg DESC,
                                              node) AS rk
                    FROM final)
            SELECT CAST(node AS BIGINT) AS node_id,
                   CASE WHEN node % 2 = 0 THEN 'customer'
                        ELSE 'supplier' END AS node_type,
                   CAST(node // 2 AS BIGINT) AS entity_key,
                   CAST(core_deg AS BIGINT) AS core_deg,
                   CAST(rk AS BIGINT) AS rk
            FROM top WHERE rk <= 20"""


# Per-subspace final assignment for the PQ oracle: code + integer
# squared-euclidean quantization error against the trained c2 centroids.
_PQ_SUBSPACES = 4
_PQ_SUB_DIMS = 16


def _pq_assign(p: str) -> str:
    return f"""
            s{p} AS (
              SELECT vec_id, cluster AS code, dist FROM (
                SELECT v.vec_id, c.cluster,
                       sum((v.q - c.c) * (v.q - c.c))::BIGINT AS dist,
                       row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY sum((v.q - c.c) * (v.q - c.c)),
                                    c.cluster) AS rn
                FROM v{p} v JOIN c2{p} c USING (d)
                GROUP BY v.vec_id, c.cluster) WHERE rn = 1)"""


def _pq_oracle() -> str:
    chains = ",".join(
        _kmeans_chain(f"_{m}", 1 + m * _PQ_SUB_DIMS,
                      1 + (m + 1) * _PQ_SUB_DIMS)
        + "," + _pq_assign(f"_{m}")
        for m in range(_PQ_SUBSPACES))
    codes = ", ".join(f"s_{m}.code AS code_{m + 1}"
                      for m in range(_PQ_SUBSPACES))
    err = " + ".join(f"s_{m}.dist" for m in range(_PQ_SUBSPACES))
    joins = " ".join(f"JOIN s_{m} USING (vec_id)"
                     for m in range(1, _PQ_SUBSPACES))
    return f"""
            WITH {chains}
            SELECT s_0.vec_id, {codes}, ({err})::BIGINT AS pq_err
            FROM s_0 {joins}"""


def entry() -> Any:
    """Flagship: full constraint suite over documents -> per-lang verdicts."""
    return Q.validate_documents_verdicts(SF0001)


def queries() -> dict[str, Callable[[str], Any]]:
    # Ordering: the driver's correctness window covers the FIRST 50
    # entries. Round-5 policy (r4 verdict #1): contract growth is
    # FROZEN at 308 queries; each round's window takes the flagship
    # plus the 49 oldest queries never yet checked by any driver
    # round (r01-r04 cumulatively covered 114 of 308) — this window
    # is the lang_trigram_cosine..record_linkage_clusters block, led
    # by the graph/linkage/TPC-H session-4/5 operators the verdict
    # called out. Below the window: first the remaining 145 never-
    # checked queries in rotation order (rounds 6-8 inherit them
    # window by window), then everything already driver-green. The
    # full 308-query contract is swept green at sf0.01 every session
    # with the driver-identical mirror (scripts/check_correctness.py;
    # BASELINE.md session records).
    return {
        # -- flagship (keep first) ------------------------------------
        "validate_documents_verdicts": Q.validate_documents_verdicts,
        # -- round-5 window: 49 oldest never-driver-checked queries ---
        "lang_trigram_cosine": Q.lang_trigram_cosine,
        "label_centroid_cosine": Q.label_centroid_cosine,
        "common_prefix_boilerplate": Q.common_prefix_boilerplate,
        "purchase_value_trend_users": Q.purchase_value_trend_users,  # -- round-4 additions: never driver-checked by any round ----------
        "bfs_hops_trade": Q.bfs_hops_trade,
        "dup_span_removal": Q.dup_span_removal,
        "quality_rank_in_source": Q.quality_rank_in_source,
        "hard_negative_mining": Q.hard_negative_mining,
        "knn_label_predict": Q.knn_label_predict,
        "q5_local_supplier_volume": Q.q5_local_supplier_volume,
        "funnel_view_purchase": Q.funnel_view_purchase,
        "decontaminate_rk_documents": Q.decontaminate_rk_documents,
        "dup_cluster_size_histogram": Q.dup_cluster_size_histogram,
        "event_type_cooccurrence": Q.event_type_cooccurrence,
        "bm25_scores": Q.bm25_scores,
        "weighted_sample_documents": Q.weighted_sample_documents,
        "value_quartile_by_type": Q.value_quartile_by_type,
        "near_dup_triangles": Q.near_dup_triangles,
        "near_dup_pagerank": Q.near_dup_pagerank,
        "q4_priority_exists": Q.q4_priority_exists,
        "events_cusum_change": Q.events_cusum_change,
        "hourly_trend_slope": Q.hourly_trend_slope,
        "lang_source_residuals": Q.lang_source_residuals,
        "fuzzy_word_pairs": Q.fuzzy_word_pairs,
        "q2_best_supplier_per_part": Q.q2_best_supplier_per_part,
        "q9_profit_by_nation_year": Q.q9_profit_by_nation_year,
        "q20_heavy_shippers": Q.q20_heavy_shippers,  # -- never checked by driver OR judge: session-4/5 rewrites first
        "embedding_covariance_by_label": Q.embedding_covariance_by_label,
        "pca_project_embeddings": Q.pca_project_embeddings,
        "parts_supplier_diversity": Q.parts_supplier_diversity,
        "orders_reconciliation_audit": Q.orders_reconciliation_audit,
        "normalized_exact_dedup": Q.normalized_exact_dedup,
        "q21_sole_blocker": Q.q21_sole_blocker,
        "token_fertility_by_lang": Q.token_fertility_by_lang,
        "curriculum_bins": Q.curriculum_bins,
        "ols_value_on_hour": Q.ols_value_on_hour,
        "label_conflict_audit": Q.label_conflict_audit,
        "ab_test_value_audit": Q.ab_test_value_audit,
        "inter_event_gap_quantiles": Q.inter_event_gap_quantiles,
        "ppjoin_near_dup_exact": Q.ppjoin_near_dup_exact,
        "naive_bayes_langid": Q.naive_bayes_langid,
        "suggest_constraints_documents": Q.suggest_constraints_documents,
        "value_median_interp_by_type": Q.value_median_interp_by_type,
        "psi_value_drift": Q.psi_value_drift,
        "pmi_top_pairs": Q.pmi_top_pairs,
        "bigram_lm_perplexity": Q.bigram_lm_perplexity,
        "perplexity_bucket_filter": Q.perplexity_bucket_filter,
        "edit_distance_pairs_documents": Q.edit_distance_pairs_documents,
        "record_linkage_clusters": Q.record_linkage_clusters,
        # -- never driver-checked yet: rounds 6+ rotate these up ------
        "pagerank_customer_supplier": Q.pagerank_customer_supplier,
        "triangle_parts_copurchase": Q.triangle_parts_copurchase,
        "hits_trade_graph": Q.hits_trade_graph,  # -- below the 50-slot window: driver-green or judge-green rows
        "tfidf_top_term": Q.tfidf_top_term,
        "inverted_index_words": Q.inverted_index_words,
        "embedding_mean_by_lang": Q.embedding_mean_by_lang,
        "length_quantile_filter": Q.length_quantile_filter,
        "chars_quartiles_by_lang": Q.chars_quartiles_by_lang,
        "cap_per_source": Q.cap_per_source,
        "doc_rarity_score": Q.doc_rarity_score,
        "kmeans_embeddings": Q.kmeans_embeddings,
        "knn_ivf_kmeans": Q.knn_ivf_kmeans,
        "semdedup_embeddings": Q.semdedup_embeddings,
        "supplier_nation_balance": Q.supplier_nation_balance,
        "q3_shipping_priority": Q.q3_shipping_priority,
        "events_orders_asof": Q.events_orders_asof,
        "events_orders_range": Q.events_orders_range,
        "top_orders_per_customer": Q.top_orders_per_customer,
        "events_rolling_window": Q.events_rolling_window,
        "first_event_per_day": Q.first_event_per_day,
        "trending_event_types": Q.trending_event_types,
        "cohort_retention_d7": Q.cohort_retention_d7,
        "lang_source_pivot": Q.lang_source_pivot,
        "lang_source_rollup": Q.lang_source_rollup,
        "normalize_text_documents": Q.normalize_text_documents,
        "range_partition_bounds": Q.range_partition_bounds,
        "global_sort_rank": Q.global_sort_rank,
        "drift_lang_by_source": Q.drift_lang_by_source,
        "partitioned_write_roundtrip": Q.partitioned_write_roundtrip,
        "zorder_documents": Q.zorder_documents,
        "dup_span_stats": Q.dup_span_stats,
        "chunk_documents": Q.chunk_documents,
        "part_skyline": Q.part_skyline,
        "lang_source_cube": Q.lang_source_cube,
        "char_entropy_documents": Q.char_entropy_documents,
        "q17_small_quantity_revenue": Q.q17_small_quantity_revenue,
        "q13_customer_distribution": Q.q13_customer_distribution,
        "q14_promo_revenue": Q.q14_promo_revenue,
        "q22_no_order_customers": Q.q22_no_order_customers,
        "q10_returned_items": Q.q10_returned_items,
        "q7_volume_shipping": Q.q7_volume_shipping,
        "ttr_documents": Q.ttr_documents,
        "max_token_run_documents": Q.max_token_run_documents,
        "bloom_semi_join_orders": Q.bloom_semi_join_orders,
        "distinct_users_per_type": Q.distinct_users_per_type,
        "q19_discounted_revenue": Q.q19_discounted_revenue,
        "q12_late_shipments": Q.q12_late_shipments,
        "q8_market_share": Q.q8_market_share,
        "q6_forecast_revenue": Q.q6_forecast_revenue,
        "q15_top_supplier": Q.q15_top_supplier,
        "q18_large_volume_customers": Q.q18_large_volume_customers,
        "sliding_distinct_users": Q.sliding_distinct_users,
        "orc_roundtrip": Q.orc_roundtrip,
        "feather_roundtrip": Q.feather_roundtrip,
        "avro_roundtrip": Q.avro_roundtrip,
        "corr_quantity_price": Q.corr_quantity_price,
        "value_mode_by_type": Q.value_mode_by_type,
        "session_path_trigrams": Q.session_path_trigrams,
        "order_fulfillment_latency": Q.order_fulfillment_latency,
        "event_transition_matrix": Q.event_transition_matrix,
        "revenue_pareto_share": Q.revenue_pareto_share,
        "langid_confusion_matrix": Q.langid_confusion_matrix,
        "churned_users_by_last_event": Q.churned_users_by_last_event,
        "jsonl_roundtrip": Q.jsonl_roundtrip,
        "benford_digit_audit": Q.benford_digit_audit,
        "fd_audit_source_lang": Q.fd_audit_source_lang,
        "value_mad_outliers": Q.value_mad_outliers,
        "winsorize_events": Q.winsorize_events,
        "last_touch_attribution": Q.last_touch_attribution,
        "k_anonymity_audit": Q.k_anonymity_audit,
        "events_props_extract": Q.events_props_extract,
        "user_hourly_locf": Q.user_hourly_locf,
        "throttled_events": Q.throttled_events,
        "snapshot_diff_documents": Q.snapshot_diff_documents,
        "out_of_order_events": Q.out_of_order_events,
        "lpa_communities_trade": Q.lpa_communities_trade,
        "kcore_trade_graph": Q.kcore_trade_graph,
        "value_gini_by_type": Q.value_gini_by_type,
        "assortativity_trade_graph": Q.assortativity_trade_graph,
        "source_vocab_overlap": Q.source_vocab_overlap,
        "copurchase_lift_pairs": Q.copurchase_lift_pairs,
        "perceptron_train_langid": Q.perceptron_train_langid,
        "weighted_pagerank_trade": Q.weighted_pagerank_trade,
        "containment_pairs_documents": Q.containment_pairs_documents,
        "jl_project_embeddings": Q.jl_project_embeddings,
        "score_trade_graph": Q.score_trade_graph,
        "events_ewma_anomaly": Q.events_ewma_anomaly,
        "hapax_ratio_by_source": Q.hapax_ratio_by_source,
        "quantile_normalize_chars": Q.quantile_normalize_chars,
        "event_burstiness_fano": Q.event_burstiness_fano,
        "bpe_train_merges": Q.bpe_train_merges,
        "clustering_coeff_parts": Q.clustering_coeff_parts,
        "markov_stationary_events": Q.markov_stationary_events,
        "auc_en_by_chars": Q.auc_en_by_chars,
        "isotonic_hourly_value": Q.isotonic_hourly_value,
        "shannon_vocab_codes": Q.shannon_vocab_codes,
        "rrf_fuse_keyword_rankings": Q.rrf_fuse_keyword_rankings,
        "langid_f1_by_class": Q.langid_f1_by_class,
        "simpson_diversity_by_source": Q.simpson_diversity_by_source,
        "coverage_select_documents": Q.coverage_select_documents,
        "dup_cross_source_matrix": Q.dup_cross_source_matrix,
        "ks_chars_two_sources": Q.ks_chars_two_sources,
        "ppr_trade_graph": Q.ppr_trade_graph,
        "readability_fk_documents": Q.readability_fk_documents,
        "holt_forecast_events": Q.holt_forecast_events,
        "join_fanout_histogram": Q.join_fanout_histogram,
        "seasonal_index_by_type": Q.seasonal_index_by_type,
        "q11_important_stock": Q.q11_important_stock,
        "q16_supplier_cnt": Q.q16_supplier_cnt,
        "cumulative_gains_en": Q.cumulative_gains_en,
        "hoover_value_by_type": Q.hoover_value_by_type,
        "autocorr_hourly_by_type": Q.autocorr_hourly_by_type,
        "kendall_tau_keyword_rankings": Q.kendall_tau_keyword_rankings,
        "user_hourly_lerp": Q.user_hourly_lerp,
        "mmr_rerank_documents": Q.mmr_rerank_documents,
        "mutual_nn_embeddings": Q.mutual_nn_embeddings,
        "self_overlap_documents": Q.self_overlap_documents,
        "ngram_doc_frequency_histogram": Q.ngram_doc_frequency_histogram,
        "max_event_type_run": Q.max_event_type_run,
        "part_reorder_gap": Q.part_reorder_gap,
        "cms_user_event_counts": Q.cms_user_event_counts,
        "bloom_fpr_audit": Q.bloom_fpr_audit,
        "frequent_triples_parts": Q.frequent_triples_parts,
        "mrr_knn_labels": Q.mrr_knn_labels,
        "xcorr_peak_lag": Q.xcorr_peak_lag,
        "nation_revenue_share": Q.nation_revenue_share,
        "quarterly_order_growth": Q.quarterly_order_growth,
        "value_moments_by_type": Q.value_moments_by_type,
        "funnel3_view_click_purchase": Q.funnel3_view_click_purchase,
        "target_encode_source": Q.target_encode_source,
        "lorenz_points_by_type": Q.lorenz_points_by_type,
        "haar_hourly_decompose": Q.haar_hourly_decompose,
        "vocab_coverage_curve": Q.vocab_coverage_curve,
        "user_lifetime_survival": Q.user_lifetime_survival,
        "spearman_quantity_price": Q.spearman_quantity_price,
        "chi2_word_lang": Q.chi2_word_lang,
        "gini_stump_value_purchase": Q.gini_stump_value_purchase,
        "conversion_latency_quartiles": Q.conversion_latency_quartiles,  # -- session-13 additions (queued for the round-5 window) -------
        "wds_roundtrip": Q.wds_roundtrip,
        "table_format_upsert": Q.table_format_upsert,
        "table_format_compact": Q.table_format_compact,
        "zonemap_pruned_stats": Q.zonemap_pruned_stats,
        "l_diversity_audit": Q.l_diversity_audit,
        "mg_heavy_hitters_events": Q.mg_heavy_hitters_events,
        "elasticity_by_brand": Q.elasticity_by_brand,
        # -- driver-green in r01-r04 ----------------------------------
        "simhash_near_dup_documents": Q.simhash_near_dup_documents,
        "keep_best_per_cluster": Q.keep_best_per_cluster,  # -- session-12 additions (newest first: never checked anywhere) ---
        "feature_hash_buckets": Q.feature_hash_buckets,
        "scd2_user_state": Q.scd2_user_state,
        "orders_in_flight_monthly": Q.orders_in_flight_monthly,
        "dbscan_embeddings": Q.dbscan_embeddings,
        "bootstrap_ci_value": Q.bootstrap_ci_value,
        "hll_registers_cert": Q.hll_registers_cert,
        "twap_user_value": Q.twap_user_value,
        "kcenter_select_embeddings": Q.kcenter_select_embeddings,
        "corr_matrix_lineitem": Q.corr_matrix_lineitem,
        "revenue_recognition_monthly": Q.revenue_recognition_monthly,
        "rfm_user_scores": Q.rfm_user_scores,
        "cohort_retention_matrix": Q.cohort_retention_matrix,
        "session_length_histogram": Q.session_length_histogram,
        "silhouette_kmeans": Q.silhouette_kmeans,
        "debounced_events": Q.debounced_events,
        "wau_stickiness": Q.wau_stickiness,
        "embedding_norm_audit": Q.embedding_norm_audit,
        "optimal_segmentation_hourly": Q.optimal_segmentation_hourly,
        "theil_sen_hourly": Q.theil_sen_hourly,
        "user_activity_gini": Q.user_activity_gini,
        "padding_waste_audit": Q.padding_waste_audit,
        "user_type_venn": Q.user_type_venn,
        "orders_aging_buckets": Q.orders_aging_buckets,
        "customer_order_cadence": Q.customer_order_cadence,
        "tfrecord_roundtrip": Q.tfrecord_roundtrip,
        "hhi_customer_concentration": Q.hhi_customer_concentration,
        "journey_archetypes": Q.journey_archetypes,
        "table_format_time_travel": Q.table_format_time_travel,
        "token_budget_sample": Q.token_budget_sample,
        "cms_join_size_estimate": Q.cms_join_size_estimate,
        "dedup_rate_curve": Q.dedup_rate_curve,
        "jaccard_threshold_sweep": Q.jaccard_threshold_sweep,
        "schema_migration_impact": Q.schema_migration_impact,
        "dedup_waterfall": Q.dedup_waterfall,
        "part_price_dispersion": Q.part_price_dispersion,
        "retention_by_first_type": Q.retention_by_first_type,
        "blocking_quality_audit": Q.blocking_quality_audit,
        "source_scorecard": Q.source_scorecard,
        "sample_fidelity_audit": Q.sample_fidelity_audit,
        "validation_drift_by_day": Q.validation_drift_by_day,
        "region_quarter_lift": Q.region_quarter_lift,
        "repeat_revenue_share": Q.repeat_revenue_share,
        "vocab_growth_curve": Q.vocab_growth_curve,
        "user_gap_median_histogram": Q.user_gap_median_histogram,
        "discount_by_qty_band": Q.discount_by_qty_band,
        "stuttered_events": Q.stuttered_events,
        "hour_of_week_profile": Q.hour_of_week_profile,
        "trainer_export_pipeline": Q.trainer_export_pipeline,
        "pricing_summary": Q.pricing_summary,
        "top_revenue_customers": Q.top_revenue_customers,
        "events_hourly_window": Q.events_hourly_window,
        "events_sliding_window": Q.events_sliding_window,
        "part_brand_stats": Q.part_brand_stats,
        "nation_region_join": Q.nation_region_join,
        "lineitem_topk": Q.lineitem_topk,
        "distinct_mktsegment": Q.distinct_mktsegment,
        "orders_priority_count": Q.orders_priority_count,
        "order_revenue_join": Q.order_revenue_join,
        "events_sessionization": Q.events_sessionization,
        "customer_running_totals": Q.customer_running_totals,
        "salted_lang_chars": Q.salted_lang_chars,
        "validate_events_props": Q.validate_events_props,
        "schema_docs_analysis": Q.schema_docs_analysis,  # rows-only
        "multimodal_features": Q.multimodal_features,  # rows-only
        "multimodal_pipeline": Q.multimodal_pipeline,  # rows-only
        "validate_documents_violations": Q.validate_documents_violations,
        "referential_docs_lang": Q.referential_docs_lang,
        "column_stats_lang": Q.column_stats_lang,
        "column_stats_quantity": Q.column_stats_quantity,
        "stats_documents_sketch": Q.stats_documents_sketch,  # rows-only
        "duplicate_events": Q.duplicate_events,
        "exact_dedup_documents": Q.exact_dedup_documents,
        "minhash_near_dup_documents": Q.minhash_near_dup_documents,  # rows-only
        "minhash_near_dup_exact": Q.minhash_near_dup_exact,
        "near_dup_clusters_documents": Q.near_dup_clusters_documents,  # rows-only
        "near_dup_clusters_exact": Q.near_dup_clusters_exact,
        "near_dup_degree": Q.near_dup_degree,
        "near_dup_clusters_distributed": Q.near_dup_clusters_distributed,
        "dedup_corpus_exact": Q.dedup_corpus_exact,
        "dedup_incremental": Q.dedup_incremental,
        "curation_pipeline_documents": Q.curation_pipeline_documents,
        "split_by_cluster": Q.split_by_cluster,
        "split_leakage_audit": Q.split_leakage_audit,
        "stratified_sample_documents": Q.stratified_sample_documents,
        "embedding_near_dup": Q.embedding_near_dup,
        "embedding_near_dup_lsh": Q.embedding_near_dup_lsh,  # rows-only
        "knn_bruteforce": Q.knn_bruteforce,
        "knn_ivf": Q.knn_ivf,  # rows-only
        "lsh_recall_report": Q.lsh_recall_report,
        "ann_recall_report": Q.ann_recall_report,  # rows-only
        "token_counts_documents": Q.token_counts_documents,
        "token_log2_histogram": Q.token_log2_histogram,
        "bpeish_token_counts": Q.bpeish_token_counts,
        "char_class_counts": Q.char_class_counts,
        "langid_documents": Q.langid_documents,
        "quality_documents": Q.quality_documents,
        "fingerprint_documents": Q.fingerprint_documents,  # rows-only
        "repetition_stats_documents": Q.repetition_stats_documents,
        "decontaminate_documents": Q.decontaminate_documents,
        "ngram_decontaminate_documents": Q.ngram_decontaminate_documents,
        "gopher_quality_flags": Q.gopher_quality_flags,
        "shuffle_shard_documents": Q.shuffle_shard_documents,
        "source_mixture_weights": Q.source_mixture_weights,
        "pq_encode_embeddings": Q.pq_encode_embeddings,
        "events_hourly_anomaly": Q.events_hourly_anomaly,
        "bigram_next_word": Q.bigram_next_word,
        "bigram_coverage_score": Q.bigram_coverage_score,
        "bpe_top_pairs": Q.bpe_top_pairs,
        "regex_redact_documents": Q.regex_redact_documents,
        "vocabulary_top_words": Q.vocabulary_top_words,
        "pack_sequences_documents": Q.pack_sequences_documents,  # -- round-4 continuation additions ---------------------------------
    }


# the langid heuristic replayed in SQL (shared by the confusion-matrix and
# per-class-F1 oracles so the two can never drift); ends with CTE `p`
# emitting (lang, lang_pred) per document
_LANGID_PRED_CTES = """h AS (SELECT doc_id, lang,
                              substr(COALESCE(text, ''), 1, 2000) AS hd
                       FROM documents),
            c AS (SELECT doc_id, lang,
                    len(regexp_extract_all(hd, '[A-Za-z]+')) AS nw,
                    len(regexp_extract_all(hd, '(?i)\\b(the|and|of|to|in|is|that|it|for|with)\\b')) AS c_en,
                    len(regexp_extract_all(hd, '(?i)\\b(der|die|und|das|ist|nicht|ein|mit|auf|von)\\b')) AS c_de,
                    len(regexp_extract_all(hd, '(?i)\\b(le|la|les|et|est|pour|que|une|dans|des)\\b')) AS c_fr,
                    len(regexp_extract_all(hd, '(?i)\\b(el|la|los|que|de|es|por|una|con|para)\\b')) AS c_es,
                    len(regexp_extract_all(hd, '[\\x{4e00}-\\x{9fff}]')) AS c_cjk,
                    length(hd) AS hl
                  FROM h),
            sc AS (SELECT doc_id, lang,
                     c_en * 1.0 / greatest(nw, 1) AS s_en,
                     c_de * 1.0 / greatest(nw, 1) AS s_de,
                     c_fr * 1.0 / greatest(nw, 1) AS s_fr,
                     c_es * 1.0 / greatest(nw, 1) AS s_es,
                     c_cjk * 1.0 / least(greatest(hl, 1), 400) AS zr
                   FROM c),
            p AS (SELECT lang,
              CASE WHEN zr > 0.2 THEN 'zh'
                   WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'unknown'
                   WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                   WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                   WHEN s_fr >= s_es THEN 'fr'
                   ELSE 'es' END AS lang_pred
            FROM sc)"""


def _coverage_sql(rounds: int = 5) -> str:
    """Unrolled greedy max-coverage mirroring
    rayschema.queries.coverage_select_documents round for round: each
    round scores every unpicked doc's count of not-yet-covered distinct
    words, picks (gain desc, doc_id asc), and folds the winner's words
    into the covered set."""
    ctes = ["""w AS (SELECT doc_id, word
                     FROM (SELECT doc_id,
                                  unnest(string_split(text, ' ')) AS word
                           FROM documents WHERE text IS NOT NULL)
                     GROUP BY doc_id, word)""",
            """docs AS (SELECT DISTINCT doc_id FROM w)""",
            """g1 AS (SELECT doc_id, count(*)::BIGINT AS gain
                      FROM w GROUP BY doc_id)""",
            """r1 AS (SELECT doc_id, gain FROM g1
                      ORDER BY gain DESC, doc_id LIMIT 1)""",
            """c1 AS (SELECT DISTINCT word FROM w
                      JOIN r1 USING (doc_id))"""]
    for k in range(2, rounds + 1):
        picked = " UNION ALL ".join(
            f"SELECT doc_id FROM r{i}" for i in range(1, k))
        ctes.append(f"""g{k} AS (
              SELECT d.doc_id, count(x.word)::BIGINT AS gain
              FROM docs d
              LEFT JOIN (SELECT doc_id, word FROM w
                         WHERE word NOT IN (SELECT word FROM c{k - 1}))
                   x USING (doc_id)
              WHERE d.doc_id NOT IN ({picked})
              GROUP BY d.doc_id)""")
        ctes.append(f"""r{k} AS (SELECT doc_id, gain FROM g{k}
                      ORDER BY gain DESC, doc_id LIMIT 1)""")
        ctes.append(f"""c{k} AS (SELECT word FROM c{k - 1}
                      UNION
                      SELECT word FROM w JOIN r{k} USING (doc_id))""")
    rounds_sel = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS round, doc_id, gain FROM r{i}"
        for i in range(1, rounds + 1))
    return f"""
            WITH {','.join(ctes)}
            SELECT * FROM ({rounds_sel}) ORDER BY round"""


_PASS_COND = (
    "doc_id IS NOT NULL AND doc_id >= 0 "
    "AND text IS NOT NULL AND length(text) >= 50 "
    "AND lang IS NOT NULL AND lang IN ('en','de','fr','es','zh') "
    "AND source IS NOT NULL AND regexp_matches(source, '^src[0-9]+$') "
    "AND n_chars IS NOT NULL AND n_chars >= 0 AND n_chars <= 100000"
)


def oracle_sql() -> dict[str, str]:
    return {
        "validate_documents_verdicts": f"""
            SELECT lang,
                   count(*)::BIGINT AS n_rows,
                   sum(CASE WHEN {_PASS_COND} THEN 1 ELSE 0 END)::BIGINT AS passed,
                   sum(CASE WHEN {_PASS_COND} THEN 0 ELSE 1 END)::BIGINT AS failed
            FROM documents GROUP BY lang""",
        "validate_documents_violations": """
            SELECT doc_id, 'minimum' AS keyword, 'doc_id' AS column_name
              FROM documents WHERE doc_id IS NOT NULL AND doc_id < 0
            UNION ALL
            SELECT doc_id, 'minLength', 'text' FROM documents
              WHERE text IS NOT NULL AND length(text) < 50
            UNION ALL
            SELECT doc_id, 'enum', 'lang' FROM documents
              WHERE lang IS NOT NULL AND lang NOT IN ('en','de','fr','es','zh')
            UNION ALL
            SELECT doc_id, 'pattern', 'source' FROM documents
              WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]+$')
            UNION ALL
            SELECT doc_id, 'minimum', 'n_chars' FROM documents
              WHERE n_chars IS NOT NULL AND n_chars < 0
            UNION ALL
            SELECT doc_id, 'maximum', 'n_chars' FROM documents
              WHERE n_chars IS NOT NULL AND n_chars > 100000
            UNION ALL
            SELECT doc_id, 'required', col FROM (
              SELECT doc_id, 'doc_id' AS col FROM documents WHERE doc_id IS NULL
              UNION ALL SELECT doc_id, 'text' FROM documents WHERE text IS NULL
              UNION ALL SELECT doc_id, 'lang' FROM documents WHERE lang IS NULL
              UNION ALL SELECT doc_id, 'source' FROM documents WHERE source IS NULL
              UNION ALL SELECT doc_id, 'n_chars' FROM documents WHERE n_chars IS NULL
            )""",
        "referential_docs_lang": """
            SELECT doc_id, lang FROM documents
            WHERE lang IS NULL OR lang NOT IN ('en','de','fr','es')""",
        "column_stats_lang": """
            SELECT count(*)::BIGINT AS n,
                   sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls,
                   count(DISTINCT lang)::BIGINT AS n_distinct,
                   min(lang) AS min_v, max(lang) AS max_v
            FROM documents""",
        "column_stats_quantity": """
            SELECT count(*)::BIGINT AS n,
                   sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls,
                   min(l_quantity) AS min_v, max(l_quantity) AS max_v,
                   CAST(sum(CAST(round(l_quantity * 10) AS BIGINT)) AS BIGINT) AS sum_deci
            FROM lineitem""",
        "duplicate_events": """
            SELECT user_id, event_type, count(*)::BIGINT AS n
            FROM events GROUP BY user_id, event_type HAVING count(*) > 1""",
        "exact_dedup_documents": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text""",
        # aggregates of the JSONL-round-tripped rows vs the parquet source:
        # null lang rows survive the trip and group under NULL on both sides
        "jsonl_roundtrip": """
            SELECT lang, count(*)::BIGINT AS n_rows,
                   sum(doc_id)::BIGINT AS id_sum,
                   coalesce(sum(length(text)), 0)::BIGINT AS text_chars
            FROM documents GROUP BY lang""",
        "lang_source_residuals": """
            WITH c AS (SELECT lang, source, count(*)::BIGINT AS n
                       FROM documents
                       WHERE lang IS NOT NULL AND source IS NOT NULL
                       GROUP BY 1, 2)
            SELECT lang, source, n AS n_docs,
                   (sum(n) OVER () * n
                    - sum(n) OVER (PARTITION BY lang)
                    * sum(n) OVER (PARTITION BY source))::BIGINT
                     AS resid_num,
                   sum(n) OVER ()::BIGINT AS total
            FROM c""",
        # SymSpell deletion-neighborhood fuzzy matching, verified exact:
        # distinct 4..20-codepoint vocabulary, all pairs at levenshtein <= 2
        "fuzzy_word_pairs": """
            WITH v AS (
              SELECT DISTINCT word
              FROM (SELECT unnest(string_split(text, ' ')) AS word
                    FROM documents WHERE text IS NOT NULL)
              WHERE length(word) BETWEEN 4 AND 20)
            SELECT a.word AS word_a, b.word AS word_b,
                   levenshtein(a.word, b.word)::BIGINT AS dist
            FROM v a JOIN v b ON a.word < b.word
            WHERE levenshtein(a.word, b.word) <= 2""",
        # Benford first-digit audit in cleared-integer form: the expected
        # millionths are the same hardcoded constants on both sides, so no
        # float log crosses the engine/oracle boundary
        "benford_digit_audit": """
            WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                         AS cents
                       FROM orders WHERE round(o_totalprice * 100) > 0),
            d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                    AS digit, count(*)::BIGINT AS n
                  FROM c GROUP BY 1),
            e(digit, expected_millionths) AS (VALUES (1,301030),(2,176091),
              (3,124939),(4,96910),(5,79181),(6,66947),(7,57992),(8,51153),
              (9,45757))
            SELECT d.digit, d.n,
                   e.expected_millionths::BIGINT AS expected_millionths,
                   (1000000 * d.n
                    - (SELECT sum(n) FROM d) * e.expected_millionths)::BIGINT
                     AS resid_millionths
            FROM d JOIN e USING (digit)""",
        # functional-dependency audit source -> lang: distinct-rhs count,
        # modal lang (count desc, lang asc), minimum repair size
        "fd_audit_source_lang": """
            WITH c AS (SELECT source, lang, count(*)::BIGINT AS n
                       FROM documents
                       WHERE source IS NOT NULL AND lang IS NOT NULL
                       GROUP BY 1, 2),
            r AS (SELECT source, lang, n,
                         row_number() OVER (PARTITION BY source
                                            ORDER BY n DESC, lang) AS rk,
                         count(*) OVER (PARTITION BY source)::BIGINT
                           AS n_langs,
                         sum(n) OVER (PARTITION BY source)::BIGINT AS n_rows
                  FROM c)
            SELECT source, n_langs, n_rows, lang AS modal_lang,
                   (n_rows - n)::BIGINT AS n_violations
            FROM r WHERE rk = 1""",
        # MAD outlier screen: quantile_disc(0.5) IS the engine's integer
        # lower-median rule (probed), so everything stays integer-exact
        "value_mad_outliers": """
            WITH c AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cents
                       FROM events
                       WHERE event_type IS NOT NULL AND value IS NOT NULL),
            m AS (SELECT event_type,
                         quantile_disc(cents, 0.5)::BIGINT AS med_cents,
                         count(*)::BIGINT AS n
                  FROM c GROUP BY 1),
            d AS (SELECT c.event_type, abs(c.cents - m.med_cents) AS dev
                  FROM c JOIN m USING (event_type)),
            md AS (SELECT event_type,
                          quantile_disc(dev, 0.5)::BIGINT AS mad_cents
                   FROM d GROUP BY 1)
            SELECT m.event_type, m.n, m.med_cents, md.mad_cents,
                   (SELECT count(*) FROM d
                    WHERE d.event_type = m.event_type
                      AND d.dev > 3 * md.mad_cents)::BIGINT AS n_outliers
            FROM m JOIN md USING (event_type)""",
        # least-squares trend slope in denominator-cleared integer form;
        # missing hours inside each type's observed range count as y=0
        "hourly_trend_slope": """
            WITH h AS (SELECT event_type,
                              (epoch_us(ts) // 3600000000)::BIGINT AS hour,
                              count(*)::BIGINT AS n
                       FROM events WHERE event_type IS NOT NULL
                       GROUP BY 1, 2),
            rng AS (SELECT event_type, min(hour) AS h0, max(hour) AS h1
                    FROM h GROUP BY 1),
            grid AS (SELECT r.event_type, r.h0,
                            unnest(generate_series(r.h0, r.h1)) AS hour
                     FROM rng r),
            f AS (SELECT g.event_type, (g.hour - g.h0)::BIGINT AS x,
                         coalesce(h.n, 0)::BIGINT AS y
                  FROM grid g LEFT JOIN h
                    ON h.event_type = g.event_type AND h.hour = g.hour)
            SELECT event_type,
                   (count(*) * sum(x*y) - sum(x) * sum(y))::BIGINT
                     AS slope_num,
                   (count(*) * sum(x*x) - sum(x) * sum(x))::BIGINT
                     AS slope_den,
                   count(*)::BIGINT AS n_hours
            FROM f GROUP BY event_type""",
        # CUSUM replayed as a recursive CTE over the ordered hour series
        # (drift allowance = exact integer mean with cleared denominator)
        "events_cusum_change": """
            WITH RECURSIVE hrs AS (
              SELECT (epoch_us(ts) // 3600000000)::BIGINT AS hour_bucket,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1),
            st AS (SELECT count(*)::BIGINT AS h, sum(n)::BIGINT AS s
                   FROM hrs),
            ord AS (SELECT hour_bucket, n,
                           row_number() OVER (ORDER BY hour_bucket) AS rn
                    FROM hrs),
            cus(rn, hour_bucket, n, c) AS (
              SELECT o.rn, o.hour_bucket, o.n,
                     greatest(0, o.n * st.h - st.s)
              FROM ord o, st WHERE o.rn = 1
              UNION ALL
              SELECT o.rn, o.hour_bucket, o.n,
                     greatest(0, cus.c + (o.n * st.h - st.s))
              FROM cus JOIN ord o ON o.rn = cus.rn + 1, st)
            SELECT cus.hour_bucket, cus.n AS n_events,
                   cus.c::BIGINT AS cusum,
                   (CASE WHEN cus.c > 8 * st.s THEN 1 ELSE 0 END)::BIGINT
                     AS is_alarm
            FROM cus, st""",
        "q4_priority_exists": """
            SELECT o.o_orderpriority, count(*)::BIGINT AS n_orders
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1996-04-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_returnflag = 'R')
            GROUP BY o.o_orderpriority""",
        "value_quartile_by_type": """
            WITH e AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cents,
                              event_id
                       FROM events
                       WHERE event_type IS NOT NULL
                         AND value IS NOT NULL),
            r AS (SELECT event_type, cents,
                         ntile(4) OVER (PARTITION BY event_type
                                        ORDER BY cents, event_id)
                           AS quartile
                  FROM e)
            SELECT event_type, quartile::BIGINT AS quartile,
                   count(*)::BIGINT AS n_events,
                   sum(cents)::BIGINT AS sum_cents
            FROM r GROUP BY 1, 2""",
        "weighted_sample_documents": """
            SELECT doc_id,
                   (((doc_id::HUGEINT * 2654435761 + 42) % 4294967296)
                    * n_chars)::BIGINT AS priority
            FROM documents
            WHERE n_chars IS NOT NULL AND n_chars > 0
            ORDER BY priority DESC, doc_id LIMIT 200""",
        # log-free BM25: every op is IEEE +,*,/ over integer-derived
        # doubles in the same evaluation order as the engine (see
        # queries.bm25_scores) — term order t1..t5, left-assoc sum
        "bm25_scores": """
            WITH w AS (SELECT doc_id,
                              unnest(string_split(text, ' ')) AS word
                       FROM documents WHERE text IS NOT NULL),
            dl AS (SELECT doc_id, count(*)::BIGINT AS dl
                   FROM w GROUP BY doc_id),
            st AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS s
                   FROM dl),
            tf AS (SELECT doc_id,
                     sum(CASE WHEN word='key' THEN 1 ELSE 0 END)::BIGINT
                       AS tf1,
                     sum(CASE WHEN word='hash' THEN 1 ELSE 0 END)::BIGINT
                       AS tf2,
                     sum(CASE WHEN word='table' THEN 1 ELSE 0 END)::BIGINT
                       AS tf3,
                     sum(CASE WHEN word='sort' THEN 1 ELSE 0 END)::BIGINT
                       AS tf4,
                     sum(CASE WHEN word='batch' THEN 1 ELSE 0 END)::BIGINT
                       AS tf5
                   FROM w GROUP BY doc_id),
            df AS (SELECT
                     count(DISTINCT CASE WHEN word='key' THEN doc_id END)
                       ::BIGINT AS df1,
                     count(DISTINCT CASE WHEN word='hash' THEN doc_id END)
                       ::BIGINT AS df2,
                     count(DISTINCT CASE WHEN word='table' THEN doc_id END)
                       ::BIGINT AS df3,
                     count(DISTINCT CASE WHEN word='sort' THEN doc_id END)
                       ::BIGINT AS df4,
                     count(DISTINCT CASE WHEN word='batch' THEN doc_id END)
                       ::BIGINT AS df5
                   FROM w)
            SELECT t.doc_id,
              round(
                (CASE WHEN tf1 > 0 THEN
                  ((2.0*st.n - 2.0*df.df1 + 1.0)/(2.0*df.df1 + 1.0))
                  * (tf1*2.2)
                  / (tf1 + 1.2*(0.25 + 0.75*(d.dl/(st.s*1.0/st.n))))
                 ELSE 0.0 END)
                + (CASE WHEN tf2 > 0 THEN
                  ((2.0*st.n - 2.0*df.df2 + 1.0)/(2.0*df.df2 + 1.0))
                  * (tf2*2.2)
                  / (tf2 + 1.2*(0.25 + 0.75*(d.dl/(st.s*1.0/st.n))))
                 ELSE 0.0 END)
                + (CASE WHEN tf3 > 0 THEN
                  ((2.0*st.n - 2.0*df.df3 + 1.0)/(2.0*df.df3 + 1.0))
                  * (tf3*2.2)
                  / (tf3 + 1.2*(0.25 + 0.75*(d.dl/(st.s*1.0/st.n))))
                 ELSE 0.0 END)
                + (CASE WHEN tf4 > 0 THEN
                  ((2.0*st.n - 2.0*df.df4 + 1.0)/(2.0*df.df4 + 1.0))
                  * (tf4*2.2)
                  / (tf4 + 1.2*(0.25 + 0.75*(d.dl/(st.s*1.0/st.n))))
                 ELSE 0.0 END)
                + (CASE WHEN tf5 > 0 THEN
                  ((2.0*st.n - 2.0*df.df5 + 1.0)/(2.0*df.df5 + 1.0))
                  * (tf5*2.2)
                  / (tf5 + 1.2*(0.25 + 0.75*(d.dl/(st.s*1.0/st.n))))
                 ELSE 0.0 END), 6) AS bm25
            FROM tf t JOIN dl d USING (doc_id), st, df
            WHERE tf1 + tf2 + tf3 + tf4 + tf5 > 0""",
        "event_type_cooccurrence": """
            WITH u AS (SELECT DISTINCT user_id, event_type FROM events
                       WHERE event_type IS NOT NULL)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*)::BIGINT AS n_users
            FROM u a JOIN u b ON a.user_id = b.user_id
                             AND a.event_type < b.event_type
            GROUP BY 1, 2""",
        "funnel_view_purchase": """
            WITH fv AS (SELECT user_id, min(ts) AS fv FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            conv AS (SELECT f.user_id,
                            max(CASE WHEN e.event_type = 'purchase'
                                      AND e.ts > f.fv
                                      AND e.ts <= f.fv + INTERVAL 24 HOURS
                                THEN 1 ELSE 0 END) AS c
                     FROM fv f JOIN events e ON e.user_id = f.user_id
                     GROUP BY f.user_id)
            SELECT date_trunc('day', f.fv) AS day,
                   count(*)::BIGINT AS n_users,
                   sum(c.c)::BIGINT AS n_converted
            FROM fv f JOIN conv c USING (user_id)
            GROUP BY 1""",
        "q5_local_supplier_volume": """
            SELECT n.n_name,
                   CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l.l_discount) * 100) AS BIGINT))
                     AS BIGINT) AS revenue_e4
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
                           AND c.c_nationkey = s.s_nationkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n.n_name""",
        "hard_negative_mining": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe,
                              label AS ql
                       FROM embeddings WHERE vec_id IN (0, 1, 2)),
            s AS (SELECT q.query_id, e.vec_id,
                         e.label::BIGINT AS neg_label,
                         list_cosine_similarity(q.qe::DOUBLE[],
                                                e.embedding::DOUBLE[]) AS cs
                  FROM q JOIN embeddings e ON e.label != q.ql),
            r AS (SELECT query_id, vec_id, neg_label, cs,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY cs DESC, vec_id) AS rk
                  FROM s)
            SELECT query_id, vec_id, neg_label, round(cs, 6) AS cosine,
                   CAST(rk AS BIGINT) AS "rank"
            FROM r WHERE rk <= 5""",
        "knn_label_predict": """
            WITH s AS (SELECT a.vec_id, a.label AS tl, b.vec_id AS nb,
                              b.label AS nl,
                              list_cosine_similarity(
                                  a.embedding::DOUBLE[],
                                  b.embedding::DOUBLE[]) AS cs
                       FROM embeddings a JOIN embeddings b
                         ON a.vec_id != b.vec_id),
            r AS (SELECT vec_id, tl, nl,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY cs DESC, nb) AS rk
                  FROM s),
            v AS (SELECT vec_id, tl, nl, count(*) AS c
                  FROM r WHERE rk <= 5 GROUP BY vec_id, tl, nl),
            p AS (SELECT vec_id, tl, nl,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY c DESC, nl) AS pk
                  FROM v)
            SELECT vec_id, tl::BIGINT AS true_label,
                   nl::BIGINT AS pred_label,
                   (CASE WHEN nl = tl THEN 1 ELSE 0 END)::BIGINT AS correct
            FROM p WHERE pk = 1""",
        "quality_rank_in_source": """
            SELECT doc_id, source, n_chars::BIGINT AS n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id)
                     ::BIGINT AS rnk,
                   count(*) OVER (PARTITION BY source)::BIGINT
                     AS n_in_source
            FROM documents
            WHERE source IS NOT NULL AND n_chars IS NOT NULL""",
        # ExactSubstr span removal (Lee et al. 2022): dup windows = char
        # 20-grams in >= 2 distinct docs; covered positions cut; the oracle
        # reconstructs clean_text itself from the uncovered substr chars
        "dup_span_removal": """
            WITH d AS (SELECT doc_id, text FROM documents
                       WHERE doc_id < 300 AND text IS NOT NULL),
            w AS (SELECT doc_id, i,
                         substr(text, CAST(i AS INTEGER), 20) AS s
                  FROM (SELECT doc_id, text,
                               unnest(generate_series(1,
                                      length(text) - 19)) AS i
                        FROM d)),
            duph AS (SELECT s FROM w
                     GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
            dpos AS (SELECT w.doc_id, w.i FROM w JOIN duph USING (s)),
            cover AS (SELECT DISTINCT doc_id, j
                      FROM (SELECT doc_id,
                                   unnest(generate_series(i, i + 19)) AS j
                            FROM dpos)),
            chars AS (SELECT doc_id, j,
                             substr(text, CAST(j AS INTEGER), 1) AS c
                      FROM (SELECT doc_id, text,
                                   unnest(generate_series(1,
                                          length(text))) AS j
                            FROM d)),
            clean AS (SELECT ch.doc_id,
                             string_agg(ch.c, '' ORDER BY ch.j)
                               AS clean_text
                      FROM chars ch LEFT JOIN cover v
                        ON ch.doc_id = v.doc_id AND ch.j = v.j
                      WHERE v.j IS NULL GROUP BY ch.doc_id),
            ncov AS (SELECT doc_id, count(*)::BIGINT AS n_removed
                     FROM cover GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(cl.clean_text, '') AS clean_text,
                   COALESCE(nc.n_removed, 0)::BIGINT AS n_removed
            FROM d LEFT JOIN clean cl USING (doc_id)
                   LEFT JOIN ncov nc USING (doc_id)""",
        # SimHash: full SQL recomputation of every signature — the token
        # hash is two codepoint polynomials mod 2^31-1 (list_reduce) packed
        # to 62 bits, signature bits j via (h >> j) & 1 majority vote,
        # pairs via bit_count(xor(...)) <= 3 (dedup.poly_token_hash /
        # SimHasher mirror this bit for bit; null texts hash to sig 0).
        "simhash_near_dup_documents": """
            WITH d AS (SELECT doc_id, text FROM documents),
            tok AS (SELECT doc_id,
                           unnest(regexp_extract_all(text,
                                  '[A-Za-z0-9_]+')) AS t
                    FROM d WHERE text IS NOT NULL),
            th AS (SELECT doc_id,
                    (list_reduce(list_prepend(0::BIGINT,
                        list_apply(string_split(t, ''),
                                   c -> unicode(c)::BIGINT)),
                        (acc, cp) -> (acc * 1000003 + cp + 1)
                                     % 2147483647) << 31)
                    + list_reduce(list_prepend(0::BIGINT,
                        list_apply(string_split(t, ''),
                                   c -> unicode(c)::BIGINT)),
                        (acc, cp) -> (acc * 999983 + cp + 1)
                                     % 2147483647) AS h
                   FROM tok),
            bits AS (SELECT doc_id, j,
                            SUM(CASE WHEN (h >> j) & 1 = 1
                                THEN 1 ELSE -1 END) AS acc
                     FROM th CROSS JOIN
                          (SELECT unnest(generate_series(0, 61)) AS j)
                     GROUP BY doc_id, j),
            sig0 AS (SELECT doc_id,
                            SUM(CASE WHEN acc > 0 THEN (1::BIGINT << j)
                                ELSE 0 END)::BIGINT AS sig
                     FROM bits GROUP BY doc_id),
            sigs AS (SELECT d.doc_id, COALESCE(s.sig, 0)::BIGINT AS sig
                     FROM d LEFT JOIN sig0 s USING (doc_id))
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
            FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sig, b.sig)) <= 3""",
        # hashing-trick feature histogram: the same 62-bit codepoint
        # polynomial token hash as simhash; bucket = h % 64, sign from
        # bit 6; empty buckets drop on both sides
        "feature_hash_buckets": """
            WITH d AS (SELECT doc_id, text FROM documents
                       WHERE text IS NOT NULL),
            tok AS (SELECT doc_id,
                           unnest(regexp_extract_all(text,
                                  '[A-Za-z0-9_]+')) AS t
                    FROM d),
            th AS (SELECT doc_id,
                    (list_reduce(list_prepend(0::BIGINT,
                        list_apply(string_split(t, ''),
                                   c -> unicode(c)::BIGINT)),
                        (acc, cp) -> (acc * 1000003 + cp + 1)
                                     % 2147483647) << 31)
                    + list_reduce(list_prepend(0::BIGINT,
                        list_apply(string_split(t, ''),
                                   c -> unicode(c)::BIGINT)),
                        (acc, cp) -> (acc * 999983 + cp + 1)
                                     % 2147483647) AS h
                   FROM tok),
            f AS (SELECT doc_id, h % 64 AS bucket,
                         CASE WHEN (h >> 6) & 1 = 1 THEN -1
                              ELSE 1 END AS sgn
                  FROM th)
            SELECT bucket::BIGINT AS bucket,
                   COUNT(*)::BIGINT AS n_tokens,
                   SUM(sgn)::BIGINT AS signed_sum,
                   COUNT(DISTINCT doc_id)::BIGINT AS n_docs
            FROM f GROUP BY 1 ORDER BY 1""",
        # SCD2 validity intervals: rn - rn_by_type islands + LEAD over
        # first-event order; open intervals close at -1
        "scd2_user_state": """
            WITH e AS (SELECT user_id, event_type,
                              epoch_us(ts) AS ts_us, event_id
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_type IS NOT NULL),
            o AS (SELECT user_id, event_type, ts_us,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY ts_us, event_id)
                           AS rn,
                         row_number() OVER (PARTITION BY user_id,
                                                         event_type
                                            ORDER BY ts_us, event_id)
                           AS rnt
                  FROM e),
            isl AS (SELECT user_id, event_type,
                           min(ts_us) AS vf, count(*) AS n_events,
                           min(rn) AS first_rn
                    FROM o GROUP BY user_id, event_type, rn - rnt),
            w AS (SELECT user_id, event_type, vf, n_events,
                         COALESCE(LEAD(vf) OVER (PARTITION BY user_id
                                                 ORDER BY first_rn),
                                  -1) AS vt,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY first_rn)
                           AS scd_rn
                  FROM isl)
            SELECT user_id, scd_rn::BIGINT AS scd_rn, event_type,
                   vf::BIGINT AS valid_from_us,
                   vt::BIGINT AS valid_to_us,
                   n_events::BIGINT AS n_events
            FROM w ORDER BY user_id, scd_rn""",
        # k-center greedy selection: unrolled farthest-point rounds
        "kcenter_select_embeddings": _kcenter_sql(),
        # full 4-variable Pearson matrix, exact integer moments
        "corr_matrix_lineitem": _corr_matrix_sql(),
        # per-point silhouette off the integer k-means assignment
        "silhouette_kmeans": _silhouette_sql(),
        # first-vs-last purchase value direction per user
        "purchase_value_trend_users": """
            WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us,
                              event_id,
                              CAST(round(value * 100) AS BIGINT)
                                AS cents
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_type = 'purchase'
                         AND value IS NOT NULL),
            o AS (SELECT user_id, cents,
                         row_number() OVER w AS rn,
                         count(*) OVER (PARTITION BY user_id) AS n
                  FROM p
                  WINDOW w AS (PARTITION BY user_id
                               ORDER BY ts_us, event_id)),
            fl AS (SELECT f.user_id, f.cents AS first_c,
                          l.cents AS last_c
                   FROM (SELECT user_id, cents FROM o
                         WHERE rn = 1 AND n >= 2) f
                   JOIN (SELECT user_id, cents FROM o
                         WHERE rn = n AND n >= 2) l
                     USING (user_id)),
            t AS (SELECT CASE WHEN last_c > first_c THEN 'up'
                              WHEN last_c < first_c THEN 'down'
                              ELSE 'flat' END AS trend,
                         first_c, last_c
                  FROM fl)
            SELECT trend, count(*)::BIGINT AS n_users,
                   sum(first_c)::BIGINT AS sum_first_cents,
                   sum(last_c)::BIGINT AS sum_last_cents
            FROM t GROUP BY 1 ORDER BY 1""",
        # cosine between label SUM vectors (1e-6 quantization)
        "label_centroid_cosine": """
            WITH v AS (SELECT label::BIGINT AS label, i.range AS d,
                              round(e.embedding[i.range]::DOUBLE
                                    * 1000000)::BIGINT AS q
                       FROM embeddings e, range(1, 65) i),
            n AS (SELECT label::BIGINT AS label,
                         count(*)::BIGINT AS n
                  FROM embeddings GROUP BY 1),
            sv AS (SELECT label, d, sum(q)::BIGINT AS s
                   FROM v GROUP BY 1, 2),
            pr AS (SELECT a.label AS la, b.label AS lb
                   FROM n a JOIN n b ON a.label < b.label),
            dt AS (SELECT p.la, p.lb,
                          sum(sa.s::HUGEINT * sb.s) AS dot
                   FROM pr p
                   JOIN sv sa ON sa.label = p.la
                   JOIN sv sb ON sb.label = p.lb AND sb.d = sa.d
                   GROUP BY 1, 2),
            nr AS (SELECT label, sum(s::HUGEINT * s) AS q2
                   FROM sv GROUP BY 1)
            SELECT d2.la AS label_a, d2.lb AS label_b,
                   na.n AS n_a, nb.n AS n_b,
                   d2.dot::BIGINT AS dot,
                   (CASE WHEN qa.q2 > 0 AND qb.q2 > 0
                         THEN floor((1000000.0 * d2.dot)
                                    / sqrt(qa.q2::DOUBLE
                                           * qb.q2::DOUBLE))
                         ELSE 0 END)::BIGINT AS cos_ppm
            FROM dt d2
            JOIN n na ON na.label = d2.la
            JOIN n nb ON nb.label = d2.lb
            JOIN nr qa ON qa.label = d2.la
            JOIN nr qb ON qb.label = d2.lb
            ORDER BY 1, 2""",
        # repeated 32-char document prefixes (boilerplate headers)
        "common_prefix_boilerplate": """
            WITH p AS (SELECT substr(text, 1, 32) AS prefix
                       FROM documents WHERE text IS NOT NULL),
            g AS (SELECT prefix, count(*)::BIGINT AS n_docs
                  FROM p GROUP BY 1 HAVING count(*) >= 2)
            SELECT prefix, n_docs,
                   row_number() OVER (ORDER BY n_docs DESC, prefix)
                     ::BIGINT AS rk
            FROM g ORDER BY rk LIMIT 20""",
        # char-trigram cosine distance between declared languages
        "lang_trigram_cosine": """
            WITH d AS (SELECT lang, text FROM documents
                       WHERE text IS NOT NULL AND lang IS NOT NULL),
            t AS (SELECT lang,
                         substr(text, CAST(i AS INTEGER), 3) AS tri
                  FROM (SELECT lang, text,
                               unnest(generate_series(1,
                                      length(text) - 2)) AS i
                        FROM d)),
            v AS (SELECT lang, tri, count(*)::BIGINT AS n
                  FROM t GROUP BY 1, 2),
            l AS (SELECT DISTINCT lang FROM v),
            pr AS (SELECT a.lang AS lang_a, b.lang AS lang_b
                   FROM l a JOIN l b ON a.lang < b.lang),
            dt AS (SELECT p.lang_a, p.lang_b,
                          COALESCE(sum(va.n::HUGEINT * vb.n), 0)
                            AS dot
                   FROM pr p
                   LEFT JOIN v va ON va.lang = p.lang_a
                   LEFT JOIN v vb ON vb.lang = p.lang_b
                                 AND vb.tri = va.tri
                   GROUP BY 1, 2),
            nrm AS (SELECT lang, sum(n::HUGEINT * n) AS n2
                    FROM v GROUP BY 1)
            SELECT d2.lang_a, d2.lang_b, d2.dot::BIGINT AS dot,
                   na.n2::BIGINT AS norm_a2,
                   nb.n2::BIGINT AS norm_b2,
                   (CASE WHEN na.n2 > 0 AND nb.n2 > 0
                         THEN floor((1000000.0 * d2.dot)
                                    / sqrt(na.n2::DOUBLE
                                           * nb.n2::DOUBLE))
                         ELSE 0 END)::BIGINT AS cos_ppm
            FROM dt d2 JOIN nrm na ON na.lang = d2.lang_a
                       JOIN nrm nb ON nb.lang = d2.lang_b
            ORDER BY 1, 2""",
        # 168-slot hour-of-week extremes per type (slot 0 = Mon 00)
        "hour_of_week_profile": """
            WITH e AS (SELECT event_type,
                              (epoch_us(ts) // 3600000000 + 96) % 168
                                AS slot
                       FROM events
                       WHERE ts IS NOT NULL
                         AND event_type IS NOT NULL),
            types AS (SELECT DISTINCT event_type FROM e),
            grid AS (SELECT t.event_type, r.range AS slot
                     FROM types t, range(0, 168) r),
            h AS (SELECT g.event_type, g.slot,
                         COALESCE(c.n, 0)::BIGINT AS n
                  FROM grid g LEFT JOIN
                       (SELECT event_type, slot,
                               count(*)::BIGINT AS n
                        FROM e GROUP BY 1, 2) c
                    USING (event_type, slot)),
            tot AS (SELECT event_type, sum(n) AS tot FROM h
                    GROUP BY 1),
            pk AS (SELECT event_type, slot AS peak_slot,
                          n AS peak_n
                   FROM (SELECT *, row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY n DESC, slot) AS rn FROM h)
                   WHERE rn = 1),
            tr AS (SELECT event_type, slot AS trough_slot,
                          n AS trough_n
                   FROM (SELECT *, row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY n, slot) AS rn FROM h)
                   WHERE rn = 1)
            SELECT p.event_type,
                   p.peak_slot::BIGINT AS peak_slot,
                   p.peak_n::BIGINT AS peak_n,
                   t2.trough_slot::BIGINT AS trough_slot,
                   t2.trough_n::BIGINT AS trough_n,
                   ((1000000 * 168 * p.peak_n)
                    // tot.tot)::BIGINT AS peak_over_mean_ppm
            FROM pk p JOIN tr t2 USING (event_type)
                      JOIN tot USING (event_type)
            ORDER BY 1""",
        # mean discount per quantity band (1-10, 11-20, ...)
        "discount_by_qty_band": """
            WITH u AS (SELECT greatest((CAST(round(l_quantity * 100)
                                             AS BIGINT) // 100 - 1)
                                       // 10, 0) AS band,
                              CAST(round(l_discount * 10000)
                                   AS BIGINT) AS bp
                       FROM lineitem),
            g AS (SELECT band, count(*)::BIGINT AS n_lines,
                         sum(bp)::BIGINT AS sum_disc_bp
                  FROM u GROUP BY 1)
            SELECT (band * 10 + 1)::BIGINT AS band_lo,
                   (band * 10 + 10)::BIGINT AS band_hi,
                   n_lines, sum_disc_bp,
                   ((100 * sum_disc_bp) // n_lines)::BIGINT
                     AS mean_disc_micro
            FROM g ORDER BY band_lo""",
        # consecutive identical (type, cents) repeats per user
        "stuttered_events": """
            WITH e AS (SELECT user_id, event_type,
                              epoch_us(ts) AS ts_us, event_id,
                              COALESCE(CAST(round(value * 100)
                                            AS BIGINT), -1) AS cents
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_type IS NOT NULL),
            o AS (SELECT event_type,
                         CASE WHEN event_type = lag(event_type)
                                OVER w
                               AND cents = lag(cents) OVER w
                              THEN 1 ELSE 0 END AS st
                  FROM e
                  WINDOW w AS (PARTITION BY user_id
                               ORDER BY ts_us, event_id))
            SELECT event_type, count(*)::BIGINT AS n_events,
                   sum(st)::BIGINT AS n_stutters
            FROM o GROUP BY 1 ORDER BY 1""",
        # per-user median gap in log2 seconds bands
        "user_gap_median_histogram": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
                              event_id
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_type IS NOT NULL),
            g AS (SELECT user_id,
                         (ts_us - lag(ts_us) OVER (
                            PARTITION BY user_id
                            ORDER BY ts_us, event_id)) // 1000000
                           AS gap
                  FROM e),
            m AS (SELECT user_id,
                         CAST(percentile_disc(0.5)
                              WITHIN GROUP (ORDER BY gap) AS BIGINT)
                           AS med
                  FROM g WHERE gap IS NOT NULL GROUP BY 1),
            b AS (SELECT CASE WHEN med = 0 THEN 0
                              ELSE length(format('{:b}', med))
                         END AS band
                  FROM m)
            , h AS (SELECT band, count(*)::BIGINT AS n_users
                    FROM b GROUP BY band)
            SELECT band::BIGINT AS band,
                   (CASE WHEN band = 0 THEN 0
                         ELSE 1 << (band - 1) END)::BIGINT AS lo_s,
                   n_users
            FROM h ORDER BY band""",
        # Heaps'-law vocabulary growth at ingestion prefixes
        "vocab_growth_curve": """
            WITH d AS (SELECT doc_id, text FROM documents
                       WHERE text IS NOT NULL),
            w AS (SELECT min(doc_id) AS fid
                  FROM (SELECT doc_id,
                               unnest(string_split(text, ' ')) AS wd
                        FROM d)
                  GROUP BY wd),
            g AS (SELECT unnest([1000, 2000, 4000, 8000, 16000,
                                 32000, 64000, 128000, 256000,
                                 512000, 1024000]) AS depth),
            s AS (SELECT g.depth,
                         (SELECT count(*) FROM d
                          WHERE doc_id < g.depth) AS n_docs,
                         (SELECT count(*) FROM w
                          WHERE fid < g.depth) AS vocab
                  FROM g)
            SELECT depth::BIGINT AS depth, n_docs::BIGINT AS n_docs,
                   vocab::BIGINT AS vocab_size,
                   ((1000 * vocab) // n_docs)::BIGINT
                     AS words_per_kdoc
            FROM s WHERE n_docs > 0 ORDER BY depth""",
        # quarterly revenue share from repeat orders
        "repeat_revenue_share": """
            WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
                              CAST(round(o_totalprice * 100)
                                   AS BIGINT) AS cents,
                              row_number() OVER (
                                PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey)
                                AS rn
                       FROM orders),
            g AS (SELECT year(o_orderdate)::BIGINT AS yr,
                         ((month(o_orderdate) - 1) // 3 + 1)::BIGINT
                           AS q,
                         sum(cents)::BIGINT AS total_cents,
                         sum(CASE WHEN rn > 1 THEN cents
                             ELSE 0 END)::BIGINT AS repeat_cents
                  FROM o GROUP BY 1, 2 HAVING sum(cents) > 0)
            SELECT yr, q, total_cents, repeat_cents,
                   ((1000000 * repeat_cents) // total_cents)::BIGINT
                     AS repeat_ppm
            FROM g ORDER BY 1, 2""",
        # revenue lift per region x quarter cell vs independence
        "region_quarter_lift": """
            WITH o AS (SELECT n.n_regionkey AS rk,
                              year(o.o_orderdate)::BIGINT AS yr,
                              ((month(o.o_orderdate) - 1) // 3 + 1)
                                ::BIGINT AS q,
                              CAST(round(o.o_totalprice * 100)
                                   AS BIGINT) AS cents
                       FROM orders o
                       JOIN customer c ON c.c_custkey = o.o_custkey
                       JOIN nation n
                         ON n.n_nationkey = c.c_nationkey),
            g AS (SELECT rk, yr, q, sum(cents)::HUGEINT AS cents
                  FROM o GROUP BY 1, 2, 3),
            t AS (SELECT sum(cents) AS total FROM g),
            r AS (SELECT rk, sum(cents) AS rt FROM g GROUP BY 1),
            c2 AS (SELECT yr, q, sum(cents) AS ct FROM g
                   GROUP BY 1, 2)
            SELECT g.rk::BIGINT AS r_regionkey, g.yr, g.q,
                   g.cents::BIGINT AS cents,
                   ((1000000::HUGEINT * g.cents
                     * (SELECT total FROM t))
                    // (r.rt * c2.ct))::BIGINT AS lift_ppm
            FROM g JOIN r USING (rk) JOIN c2 USING (yr, q)
            ORDER BY 1, 2, 3""",
        # props pass rate per event day (ops drift dashboard)
        "validation_drift_by_day": """
            WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
                              CASE WHEN props IS NULL THEN TRUE
                                   ELSE COALESCE(
                                     json_valid(props)
                                     AND json_extract(props, '$.k')
                                         IS NOT NULL
                                     AND (json_type(json_extract(
                                            props, '$.k'))
                                          IN ('INTEGER','UBIGINT',
                                              'BIGINT')
                                          OR (json_type(json_extract(
                                                props, '$.k'))
                                              = 'DOUBLE'
                                              AND CAST(json_extract(
                                                    props, '$.k')
                                                  AS DOUBLE)
                                                  = floor(CAST(
                                                    json_extract(
                                                      props, '$.k')
                                                    AS DOUBLE))))
                                     AND CAST(json_extract(props,
                                              '$.k') AS DOUBLE)
                                         BETWEEN 0 AND 50,
                                     FALSE)
                              END AS v
                       FROM events WHERE ts IS NOT NULL)
            SELECT day::BIGINT AS day, count(*)::BIGINT AS n_events,
                   sum(CASE WHEN v THEN 1 ELSE 0 END)::BIGINT
                     AS n_valid,
                   ((1000000 * sum(CASE WHEN v THEN 1 ELSE 0 END))
                    // count(*))::BIGINT AS valid_ppm
            FROM e GROUP BY 1 ORDER BY 1""",
        # sample-vs-full exact KS on n_chars (10% hash sample)
        "sample_fidelity_audit": """
            WITH d AS (SELECT doc_id, n_chars FROM documents
                       WHERE n_chars IS NOT NULL),
            t AS (SELECT n_chars AS v,
                         CASE WHEN (doc_id % 100003) * 2654435761
                                   % 100 < 10
                              THEN 1 ELSE 0 END AS s
                  FROM d),
            h AS (SELECT v, sum(s)::HUGEINT AS cs,
                         count(*)::HUGEINT AS cf
                  FROM t GROUP BY 1),
            n AS (SELECT sum(cs) AS ns, sum(cf) AS nf FROM h),
            c AS (SELECT v,
                         sum(cs) OVER (ORDER BY v
                                       ROWS UNBOUNDED PRECEDING)
                           AS a_s,
                         sum(cf) OVER (ORDER BY v
                                       ROWS UNBOUNDED PRECEDING)
                           AS a_f
                  FROM h)
            SELECT (SELECT nf FROM n)::BIGINT AS n_full,
                   (SELECT ns FROM n)::BIGINT AS n_sample,
                   max(abs((SELECT ns FROM n) * a_f
                           - (SELECT nf FROM n) * a_s))::BIGINT
                     AS d_num,
                   ((1000000 * max(abs((SELECT ns FROM n) * a_f
                                       - (SELECT nf FROM n) * a_s)))
                    // ((SELECT nf FROM n)
                        * (SELECT ns FROM n)))::BIGINT AS ks_ppm
            FROM c""",
        # per-source scorecard: volume + dup + langid mismatch + gopher
        "source_scorecard": """
            WITH d AS (SELECT doc_id, text, lang, source
                       FROM documents WHERE text IS NOT NULL),
            base AS (SELECT source, count(*)::BIGINT AS n_docs,
                            sum(length(text))::BIGINT AS chars_sum,
                            count(DISTINCT md5(text))::BIGINT AS nd
                     FROM d GROUP BY 1),
            h AS (SELECT source, lang,
                         substr(text, 1, 2000) AS hd FROM d),
            c AS (SELECT source, lang,
                    len(regexp_extract_all(hd, '[A-Za-z]+')) AS nw,
                    len(regexp_extract_all(hd, '(?i)\\b(the|and|of|to|in|is|that|it|for|with)\\b')) AS c_en,
                    len(regexp_extract_all(hd, '(?i)\\b(der|die|und|das|ist|nicht|ein|mit|auf|von)\\b')) AS c_de,
                    len(regexp_extract_all(hd, '(?i)\\b(le|la|les|et|est|pour|que|une|dans|des)\\b')) AS c_fr,
                    len(regexp_extract_all(hd, '(?i)\\b(el|la|los|que|de|es|por|una|con|para)\\b')) AS c_es,
                    len(regexp_extract_all(hd, '[\\x{4e00}-\\x{9fff}]')) AS c_cjk,
                    length(hd) AS hl
                  FROM h),
            sc AS (SELECT source, lang,
                     c_en * 1.0 / greatest(nw, 1) AS s_en,
                     c_de * 1.0 / greatest(nw, 1) AS s_de,
                     c_fr * 1.0 / greatest(nw, 1) AS s_fr,
                     c_es * 1.0 / greatest(nw, 1) AS s_es,
                     c_cjk * 1.0 / least(greatest(hl, 1), 400) AS zr
                   FROM c),
            p AS (SELECT source, lang,
              CASE WHEN zr > 0.2 THEN 'zh'
                   WHEN greatest(s_en, s_de, s_fr, s_es) = 0
                     THEN 'unknown'
                   WHEN s_en >= s_de AND s_en >= s_fr
                     AND s_en >= s_es THEN 'en'
                   WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                   WHEN s_fr >= s_es THEN 'fr'
                   ELSE 'es' END AS lang_pred
              FROM sc),
            mm AS (SELECT source,
                          sum(CASE WHEN lang IS NOT NULL
                                    AND lang_pred != lang
                              THEN 1 ELSE 0 END)::BIGINT AS mism
                   FROM p GROUP BY 1),
            w AS (SELECT doc_id, source,
                         unnest(string_split(text, ' ')) AS word
                  FROM d),
            per AS (SELECT doc_id, source,
                           count(*)::BIGINT AS n_words,
                           sum(length(word))::BIGINT AS sum_wlen,
                           sum(CASE WHEN regexp_matches(word,
                                         '[A-Za-z]')
                               THEN 1 ELSE 0 END)::BIGINT
                             AS n_alpha_words,
                           sum(CASE WHEN word IN ('the','a','of',
                                                  'to','and','that',
                                                  'is')
                               THEN 1 ELSE 0 END)::BIGINT
                             AS n_stop_hits
                    FROM w GROUP BY 1, 2),
            gp AS (SELECT source,
                          sum(CASE WHEN n_words BETWEEN 50 AND 100000
                               AND sum_wlen BETWEEN 3 * n_words
                                   AND 10 * n_words
                               AND 5 * n_alpha_words >= 4 * n_words
                               AND n_stop_hits >= 2
                              THEN 1 ELSE 0 END)::BIGINT AS gpass
                   FROM per GROUP BY 1)
            SELECT b.source, b.n_docs, b.chars_sum,
                   ((1000000 * (b.n_docs - b.nd))
                    // b.n_docs)::BIGINT AS dup_ppm,
                   ((1000000 * mm.mism) // b.n_docs)::BIGINT
                     AS langid_mismatch_ppm,
                   ((1000000 * gp.gpass) // b.n_docs)::BIGINT
                     AS gopher_pass_ppm
            FROM base b JOIN mm USING (source)
                        JOIN gp USING (source)
            ORDER BY b.source""",
        # blocking evaluation: pair completeness + reduction ratio
        "blocking_quality_audit": """
            WITH d AS (SELECT md5(text) AS h,
                              lang || '|' || source || '|'
                              || n_chars::VARCHAR AS blk
                       FROM documents
                       WHERE text IS NOT NULL AND lang IS NOT NULL
                         AND source IS NOT NULL
                         AND n_chars IS NOT NULL),
            nb AS (SELECT count(*)::HUGEINT AS n FROM d),
            cb AS (SELECT sum(c * (c - 1) // 2) AS p FROM (
                     SELECT count(*)::HUGEINT AS c FROM d
                     GROUP BY blk)),
            tb AS (SELECT sum(c * (c - 1) // 2) AS p FROM (
                     SELECT count(*)::HUGEINT AS c FROM d
                     GROUP BY h)),
            fb AS (SELECT sum(c * (c - 1) // 2) AS p FROM (
                     SELECT count(*)::HUGEINT AS c FROM d
                     GROUP BY blk, h))
            SELECT (SELECT n FROM nb)::BIGINT AS n_docs,
                   (SELECT p FROM cb)::BIGINT AS cand_pairs,
                   (SELECT p FROM tb)::BIGINT AS true_pairs,
                   (SELECT p FROM fb)::BIGINT AS found_pairs,
                   (CASE WHEN (SELECT p FROM tb) > 0
                         THEN (1000000 * (SELECT p FROM fb))
                              // (SELECT p FROM tb)
                         ELSE 1000000 END)::BIGINT
                     AS completeness_ppm,
                   (CASE WHEN (SELECT n FROM nb) > 1
                         THEN (1000000
                               * ((SELECT n FROM nb)
                                  * ((SELECT n FROM nb) - 1) // 2
                                  - (SELECT p FROM cb)))
                              // ((SELECT n FROM nb)
                                  * ((SELECT n FROM nb) - 1) // 2)
                         ELSE 0 END)::BIGINT AS reduction_ppm""",
        # unit-price spread per part, top-20 most dispersed
        "part_price_dispersion": """
            WITH u AS (SELECT l_partkey,
                              (1000 * CAST(round(l_extendedprice
                                                 * 100) AS BIGINT))
                              // (CAST(round(l_quantity * 100)
                                       AS BIGINT) // 100) AS unit
                       FROM lineitem
                       WHERE CAST(round(l_quantity * 100) AS BIGINT)
                             // 100 > 0),
            g AS (SELECT l_partkey, count(*)::BIGINT AS n_lines,
                         min(unit)::BIGINT AS min_unit_milli,
                         max(unit)::BIGINT AS max_unit_milli
                  FROM u GROUP BY 1 HAVING max(unit) > 0)
            SELECT l_partkey, n_lines, min_unit_milli,
                   max_unit_milli,
                   ((1000000 * (max_unit_milli - min_unit_milli))
                    // max_unit_milli)::BIGINT AS dispersion_ppm
            FROM g
            ORDER BY dispersion_ppm DESC, l_partkey LIMIT 20""",
        # first-event-type cohorts: 7-day return rate
        "retention_by_first_type": """
            WITH e AS (SELECT user_id, event_type,
                              epoch_us(ts) AS ts_us, event_id
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_type IS NOT NULL),
            f AS (SELECT user_id, event_type AS first_type,
                         ts_us // 86400000000 AS d0
                  FROM (SELECT *, row_number() OVER (
                          PARTITION BY user_id
                          ORDER BY ts_us, event_id) AS rn FROM e)
                  WHERE rn = 1),
            r AS (SELECT f.user_id, f.first_type,
                         max(CASE WHEN e.ts_us // 86400000000
                                   BETWEEN f.d0 + 1 AND f.d0 + 7
                                  THEN 1 ELSE 0 END) AS retained
                  FROM f JOIN e USING (user_id)
                  GROUP BY 1, 2),
            g AS (SELECT first_type, count(*)::BIGINT AS n_users,
                         sum(retained)::BIGINT AS n_retained
                  FROM r GROUP BY 1)
            SELECT first_type, n_users, n_retained,
                   ((1000000 * n_retained) // n_users)::BIGINT
                     AS retention_ppm
            FROM g ORDER BY first_type""",
        # three-stage dedup waterfall as distinct-counts
        "dedup_waterfall": """
            WITH d AS (SELECT text FROM documents
                       WHERE text IS NOT NULL),
            c AS (SELECT count(*) AS n_total,
                         count(DISTINCT md5(text)) AS d1,
                         count(DISTINCT md5(
                            trim(regexp_replace(lower(text), ' +',
                                                ' ', 'g'), ' ')))
                           AS d2,
                         count(DISTINCT md5(
                            trim(regexp_replace(
                              regexp_replace(lower(text), '[^a-z ]',
                                             '', 'g'),
                              ' +', ' ', 'g'), ' '))) AS d3
                  FROM d)
            SELECT 1::BIGINT AS stage, 'exact' AS label,
                   n_total::BIGINT AS docs_in, d1::BIGINT
                     AS n_distinct, (n_total - d1)::BIGINT AS removed
            FROM c
            UNION ALL
            SELECT 2, 'lower+ws', d1::BIGINT, d2::BIGINT,
                   (d1 - d2)::BIGINT FROM c
            UNION ALL
            SELECT 3, 'alpha-only', d2::BIGINT, d3::BIGINT,
                   (d2 - d3)::BIGINT FROM c
            ORDER BY stage""",
        # schema-evolution what-if: v1 pass vs stricter v2 pass
        "schema_migration_impact": f"""
            WITH m AS (
              SELECT COALESCE(lang, 'NULL') AS lang,
                     CASE WHEN {_PASS_COND} THEN 1 ELSE 0 END AS v1,
                     CASE WHEN doc_id IS NOT NULL AND doc_id >= 0
                           AND text IS NOT NULL
                           AND length(text) >= 200
                           AND lang IS NOT NULL
                           AND lang IN ('en','de','fr','es')
                           AND source IS NOT NULL
                           AND regexp_matches(source, '^src[0-9]+$')
                           AND n_chars IS NOT NULL AND n_chars >= 0
                           AND n_chars <= 5000
                          THEN 1 ELSE 0 END AS v2
              FROM documents)
            SELECT lang, count(*)::BIGINT AS n,
                   sum(v1)::BIGINT AS valid_v1,
                   sum(v2)::BIGINT AS valid_v2,
                   sum(CASE WHEN v1 = 1 AND v2 = 0 THEN 1
                       ELSE 0 END)::BIGINT AS newly_invalid
            FROM m GROUP BY lang ORDER BY lang""",
        # Jaccard cutoff sensitivity from one exact all-pairs pass
        "jaccard_threshold_sweep": """
            WITH docs AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id < 300 AND text IS NOT NULL
                AND length(text) >= 5),
            sh AS (
              SELECT DISTINCT doc_id,
                     substr(text, CAST(i AS INTEGER), 5) AS s
              FROM (SELECT doc_id, text,
                           unnest(generate_series(1,
                                  length(text) - 4)) AS i
                    FROM docs)),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh
                      GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS ni
              FROM sh a JOIN sh b
                ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pr AS (
              SELECT i.id_a, i.id_b,
                     round(i.ni * 1.0 / (sa.n + sb.n - i.ni), 6)
                       AS j
              FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
                           JOIN sizes sb ON sb.doc_id = i.id_b
              WHERE i.ni * 1.0 / (sa.n + sb.n - i.ni) >= 0.2),
            t AS (SELECT unnest([20, 30, 40, 50, 60, 70, 80]) AS tp)
            SELECT t.tp::BIGINT AS threshold_pct,
                   (SELECT count(*) FROM pr
                    WHERE j >= t.tp / 100.0)::BIGINT AS n_pairs,
                   (SELECT count(*) FROM (
                      SELECT id_a AS d FROM pr WHERE j >= t.tp / 100.0
                      UNION
                      SELECT id_b FROM pr WHERE j >= t.tp / 100.0))
                     ::BIGINT AS n_docs
            FROM t ORDER BY 1""",
        # dedup-rate growth curve at ingestion-order prefixes
        "dedup_rate_curve": """
            WITH d AS (SELECT doc_id, md5(text) AS h
                       FROM documents WHERE text IS NOT NULL),
            f AS (SELECT min(doc_id) AS fid FROM d GROUP BY h),
            g AS (SELECT unnest([1000, 2000, 4000, 8000, 16000,
                                 32000, 64000, 128000, 256000,
                                 512000, 1024000]) AS depth),
            s AS (SELECT g.depth,
                         (SELECT count(*) FROM d
                          WHERE doc_id < g.depth) AS n_docs,
                         (SELECT count(*) FROM f
                          WHERE fid < g.depth) AS n_distinct
                  FROM g)
            SELECT depth::BIGINT AS depth, n_docs::BIGINT AS n_docs,
                   n_distinct::BIGINT AS n_distinct,
                   ((1000000 * (n_docs - n_distinct))
                    // n_docs)::BIGINT AS dup_ppm
            FROM s WHERE n_docs > 0 ORDER BY depth""",
        # CMS self-join-size estimate: per plane sum(cell^2) >= true
        "cms_join_size_estimate": """
            WITH u AS (SELECT user_id FROM events
                       WHERE user_id IS NOT NULL),
            tru AS (SELECT sum(n::HUGEINT * n)::BIGINT AS t
                    FROM (SELECT count(*) AS n FROM u
                          GROUP BY user_id)),
            d AS (
              SELECT 0 AS plane,
                     (SELECT sum(c::HUGEINT * c) FROM (
                        SELECT count(*) AS c FROM u GROUP BY
                          ((user_id * 2654435761) % 4294967296
                           // 65536) % 64))::BIGINT AS dot
              UNION ALL
              SELECT 1,
                     (SELECT sum(c::HUGEINT * c) FROM (
                        SELECT count(*) AS c FROM u GROUP BY
                          ((user_id * 2246822519) % 4294967296
                           // 65536) % 64))::BIGINT
              UNION ALL
              SELECT 2,
                     (SELECT sum(c::HUGEINT * c) FROM (
                        SELECT count(*) AS c FROM u GROUP BY
                          ((user_id * 3266489917) % 4294967296
                           // 65536) % 64))::BIGINT
              UNION ALL
              SELECT 3,
                     (SELECT sum(c::HUGEINT * c) FROM (
                        SELECT count(*) AS c FROM u GROUP BY
                          ((user_id * 668265263) % 4294967296
                           // 65536) % 64))::BIGINT)
            SELECT plane::BIGINT AS plane, dot AS dot_product,
                   (SELECT t FROM tru) AS true_size,
                   (dot - (SELECT t FROM tru))::BIGINT AS overcount
            FROM d ORDER BY plane""",
        # hash-ordered token-budget prefix per language
        "token_budget_sample": """
            WITH d AS (SELECT doc_id, lang,
                              CASE WHEN length(text) = 0 THEN 0
                                   ELSE length(text)
                                        - length(replace(text, ' ',
                                                         '')) + 1
                              END AS toks,
                              ((doc_id % 100003) * 2654435761)
                                % 4294967296 AS h
                       FROM documents
                       WHERE text IS NOT NULL AND lang IS NOT NULL),
            t AS (SELECT lang, sum(toks) AS tot FROM d GROUP BY 1),
            c AS (SELECT d.lang, d.toks, t.tot,
                         sum(d.toks) OVER (PARTITION BY d.lang
                                           ORDER BY d.h, d.doc_id
                                           ROWS UNBOUNDED PRECEDING)
                           AS cum
                  FROM d JOIN t USING (lang))
            SELECT lang, tot::BIGINT AS total_tokens,
                   (tot // 2)::BIGINT AS budget,
                   sum(CASE WHEN cum <= tot // 2 THEN 1
                       ELSE 0 END)::BIGINT AS n_kept,
                   coalesce(max(CASE WHEN cum <= tot // 2
                                THEN cum END), 0)::BIGINT
                     AS tokens_kept
            FROM c GROUP BY lang, tot ORDER BY lang""",
        # snapshot time travel: v1 = even ids, v2 = v1 + odd ids
        "table_format_time_travel": """
            WITH v1 AS (SELECT 1 AS version,
                               count(*)::BIGINT AS n_rows,
                               sum(doc_id)::BIGINT AS id_sum,
                               coalesce(sum(length(text)), 0)::BIGINT
                                 AS text_chars
                        FROM documents WHERE doc_id % 2 = 0),
            v2 AS (SELECT 2 AS version, count(*)::BIGINT,
                          sum(doc_id)::BIGINT,
                          coalesce(sum(length(text)), 0)::BIGINT
                   FROM documents)
            SELECT version::BIGINT AS version, n_rows, id_sum,
                   text_chars
            FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
            ORDER BY version""",
        # first-occurrence journey archetypes, top-20 by user count
        "journey_archetypes": """
            WITH e AS (SELECT user_id, event_type,
                              epoch_us(ts) AS ts_us, event_id
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_type IS NOT NULL),
            f1 AS (SELECT user_id, event_type, min(ts_us) AS t0
                   FROM e GROUP BY 1, 2),
            f2 AS (SELECT e.user_id, e.event_type, f1.t0,
                          min(e.event_id) AS eid0
                   FROM e JOIN f1 USING (user_id, event_type)
                   WHERE e.ts_us = f1.t0
                   GROUP BY 1, 2, 3),
            j AS (SELECT user_id,
                         string_agg(event_type, '>'
                                    ORDER BY t0, eid0) AS journey
                  FROM f2 GROUP BY 1),
            g AS (SELECT journey, count(*)::BIGINT AS n_users
                  FROM j GROUP BY 1)
            SELECT journey, n_users,
                   row_number() OVER (ORDER BY n_users DESC, journey)
                     ::BIGINT AS rk
            FROM g ORDER BY rk LIMIT 20""",
        # HHI revenue concentration per nation (HUGEINT squares)
        "hhi_customer_concentration": """
            WITH r AS (SELECT o.o_custkey AS ck, c.c_nationkey AS nk,
                              sum(CAST(round(o.o_totalprice * 100)
                                       AS BIGINT)) AS cents
                       FROM orders o
                       JOIN customer c ON c.c_custkey = o.o_custkey
                       GROUP BY 1, 2),
            n AS (SELECT nk, count(*)::BIGINT AS n_cust,
                         sum(cents)::BIGINT AS total_cents,
                         sum(cents::HUGEINT * cents::HUGEINT) AS sq
                  FROM r GROUP BY 1 HAVING sum(cents) > 0)
            SELECT nk::BIGINT AS n_nationkey, n_cust, total_cents,
                   ((1000000::HUGEINT * sq)
                    // (total_cents::HUGEINT
                        * total_cents::HUGEINT))::BIGINT AS hhi_ppm
            FROM n ORDER BY 1""",
        # repeat-purchase cadence: telescoping distinct-date gaps
        "customer_order_cadence": """
            WITH d AS (SELECT o_custkey,
                              epoch_us(o_orderdate) // 86400000000
                                AS day,
                              count(*)::BIGINT AS n
                       FROM orders GROUP BY 1, 2),
            g AS (SELECT o_custkey, sum(n)::BIGINT AS n_orders,
                         count(*)::BIGINT AS n_dates,
                         (max(day) - min(day))::BIGINT AS span_days
                  FROM d GROUP BY 1 HAVING count(*) >= 2)
            SELECT o_custkey, n_orders, n_dates, span_days,
                   ((1000 * span_days) // (n_dates - 1))::BIGINT
                     AS mean_gap_milli
            FROM g ORDER BY o_custkey""",
        # open-order aging vs the corpus max order date
        "orders_aging_buckets": """
            WITH mx AS (SELECT max(epoch_us(o_orderdate)
                                   // 86400000000) AS anchor
                        FROM orders),
            o AS (SELECT (SELECT anchor FROM mx)
                         - epoch_us(o_orderdate) // 86400000000
                           AS age,
                         CAST(round(o_totalprice * 100) AS BIGINT)
                           AS cents
                  FROM orders WHERE o_orderstatus = 'O'),
            b AS (SELECT CASE WHEN age <= 30 THEN '0-30'
                              WHEN age <= 60 THEN '31-60'
                              WHEN age <= 90 THEN '61-90'
                              ELSE '90+' END AS bucket,
                         CASE WHEN age <= 30 THEN 0
                              WHEN age <= 60 THEN 31
                              WHEN age <= 90 THEN 61
                              ELSE 91 END AS age_lo,
                         CASE WHEN age <= 30 THEN 30
                              WHEN age <= 60 THEN 60
                              WHEN age <= 90 THEN 90
                              ELSE -1 END AS age_hi,
                         cents
                  FROM o)
            SELECT bucket, age_lo::BIGINT AS age_lo,
                   age_hi::BIGINT AS age_hi,
                   count(*)::BIGINT AS n_orders,
                   sum(cents)::BIGINT AS open_cents
            FROM b GROUP BY 1, 2, 3 ORDER BY age_lo""",
        # 3-set engagement Venn: per-user bit maxes == distributed OR
        "user_type_venn": """
            WITH e AS (SELECT DISTINCT user_id, event_type
                       FROM events
                       WHERE user_id IS NOT NULL
                         AND event_type IN ('view', 'click',
                                            'purchase')),
            m AS (SELECT user_id,
                         max(CASE WHEN event_type = 'view'
                             THEN 1 ELSE 0 END)
                         + 2 * max(CASE WHEN event_type = 'click'
                                   THEN 1 ELSE 0 END)
                         + 4 * max(CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END) AS mask
                  FROM e GROUP BY 1),
            g AS (SELECT mask, count(*)::BIGINT AS n_users
                  FROM m GROUP BY 1)
            SELECT mask::BIGINT AS mask,
                   CASE mask WHEN 1 THEN 'view' WHEN 2 THEN 'click'
                        WHEN 3 THEN 'view+click' WHEN 4
                          THEN 'purchase'
                        WHEN 5 THEN 'view+purchase'
                        WHEN 6 THEN 'click+purchase'
                        ELSE 'view+click+purchase' END AS region,
                   n_users
            FROM g ORDER BY mask""",
        # exact Gini of events-per-user (tie-invariant rank formula)
        "user_activity_gini": """
            WITH u AS (SELECT user_id, count(*)::BIGINT AS n
                       FROM events WHERE user_id IS NOT NULL
                       GROUP BY 1),
            r AS (SELECT n, row_number() OVER (ORDER BY n) AS i,
                         (SELECT count(*) FROM u) AS nu
                  FROM u)
            SELECT (SELECT count(*) FROM u)::BIGINT AS n_users,
                   (SELECT sum(n) FROM u)::BIGINT AS total_events,
                   ((1000000 * sum((2 * i - nu - 1) * n))
                    // ((SELECT count(*) FROM u)
                        * (SELECT sum(n) FROM u)))::BIGINT
                     AS gini_ppm
            FROM r""",
        # padding waste per power-of-two sequence bucket (whitespace
        # token counts, clipped at the ladder top)
        "padding_waste_audit": """
            WITH t AS (SELECT CASE WHEN length(text) = 0 THEN 0
                              ELSE length(text)
                                   - length(replace(text, ' ', ''))
                                   + 1 END AS tc
                       FROM documents WHERE text IS NOT NULL),
            bkt AS (SELECT LEAST(tc, 16384) AS tc2,
                           CASE WHEN tc <= 128 THEN 128
                                WHEN tc <= 256 THEN 256
                                WHEN tc <= 512 THEN 512
                                WHEN tc <= 1024 THEN 1024
                                WHEN tc <= 2048 THEN 2048
                                WHEN tc <= 4096 THEN 4096
                                WHEN tc <= 8192 THEN 8192
                                ELSE 16384 END AS bucket
                    FROM t),
            g AS (SELECT bucket, count(*)::BIGINT AS n_docs,
                         sum(tc2)::BIGINT AS sum_tokens
                  FROM bkt GROUP BY 1)
            SELECT bucket::BIGINT AS bucket, n_docs, sum_tokens,
                   (bucket * n_docs - sum_tokens)::BIGINT
                     AS padded_tokens,
                   ((1000000 * (bucket * n_docs - sum_tokens))
                    // (bucket * n_docs))::BIGINT AS waste_ppm
            FROM g ORDER BY bucket""",
        # optimal 3-segmentation of the 24h curve: enumerate C(23,2)
        # boundary pairs over shared prefix sums, floor-milli SSE
        "optimal_segmentation_hourly": """
            WITH h AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS hr
                       FROM events WHERE ts IS NOT NULL),
            c AS (SELECT g.range AS hr, COALESCE(cnt.n, 0)::BIGINT
                           AS n
                  FROM range(0, 24) g
                  LEFT JOIN (SELECT hr, count(*)::BIGINT AS n
                             FROM h GROUP BY 1) cnt
                    ON cnt.hr = g.range),
            p AS (SELECT hr,
                         sum(n) OVER (ORDER BY hr) AS s,
                         sum(n * n) OVER (ORDER BY hr) AS q
                  FROM c),
            pb AS (SELECT 0 AS b, 0::BIGINT AS s, 0::BIGINT AS q
                   UNION ALL
                   SELECT hr + 1, s::BIGINT, q::BIGINT FROM p),
            costs AS (SELECT a.b AS a, bb.b AS b,
                             ((1000 * ((bb.b - a.b) * (bb.q - a.q)
                                       - (bb.s - a.s)
                                         * (bb.s - a.s)))
                              // (bb.b - a.b))::BIGINT AS c,
                             (bb.s - a.s)::BIGINT AS n_events
                      FROM pb a JOIN pb bb ON bb.b > a.b),
            best AS (SELECT c1.b AS b1, c2.b AS b2
                     FROM costs c1
                     JOIN costs c2 ON c2.a = c1.b
                     JOIN costs c3 ON c3.a = c2.b
                     WHERE c1.a = 0 AND c3.b = 24
                     ORDER BY c1.c + c2.c + c3.c, c1.b, c2.b
                     LIMIT 1)
            SELECT seg, start_h, end_h, k.n_events, k.c AS cost_milli
            FROM (SELECT 1::BIGINT AS seg, 0::BIGINT AS start_h,
                         b1::BIGINT AS end_h FROM best
                  UNION ALL
                  SELECT 2, b1, b2 FROM best
                  UNION ALL
                  SELECT 3, b2, 24 FROM best) s
            JOIN costs k ON k.a = s.start_h AND k.b = s.end_h
            ORDER BY seg""",
        # Theil-Sen slope: lower median of floor-milli pair slopes
        "theil_sen_hourly": """
            WITH h AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS hr
                       FROM events WHERE ts IS NOT NULL),
            c AS (SELECT g.range AS hr, COALESCE(cnt.n, 0)::BIGINT
                           AS n
                  FROM range(0, 24) g
                  LEFT JOIN (SELECT hr, count(*)::BIGINT AS n
                             FROM h GROUP BY 1) cnt
                    ON cnt.hr = g.range),
            sl AS (SELECT ((1000 * (b.n - a.n))
                           // (b.hr - a.hr))::BIGINT AS s
                   FROM c a JOIN c b ON b.hr > a.hr)
            SELECT (SELECT count(*) FROM sl)::BIGINT AS n_pairs,
                   (SELECT s FROM (SELECT s, row_number()
                                     OVER (ORDER BY s) AS rn FROM sl)
                    WHERE rn = (SELECT (count(*) + 1) // 2 FROM sl))
                     ::BIGINT AS median_slope_milli""",
        # WAU + DAU/WAU stickiness off distinct (user, day) pairs
        "wau_stickiness": """
            WITH e AS (SELECT user_id,
                              epoch_us(ts) // 86400000000 AS day
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            d AS (SELECT DISTINCT user_id, day FROM e),
            w AS (SELECT user_id, day, day // 7 AS wk FROM d),
            g AS (SELECT wk, count(DISTINCT user_id)::BIGINT AS wau,
                         count(*)::BIGINT AS sum_dau
                  FROM w GROUP BY 1)
            SELECT wk::BIGINT AS wk, wau, sum_dau,
                   ((1000000 * sum_dau) // (7 * wau))::BIGINT
                     AS stickiness_ppm
            FROM g ORDER BY wk""",
        # per-label integer squared-norm QA over the 1e-6 quantization
        "embedding_norm_audit": """
            WITH q AS (SELECT label::BIGINT AS label,
                              list_inner_product(
                                list_transform(embedding,
                                  x -> round(x::DOUBLE * 1000000)),
                                list_transform(embedding,
                                  x -> round(x::DOUBLE * 1000000)))
                                ::BIGINT AS n2
                       FROM embeddings)
            SELECT label, count(*)::BIGINT AS n,
                   sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END)::BIGINT
                     AS n_zero,
                   min(n2)::BIGINT AS min_n2,
                   max(n2)::BIGINT AS max_n2,
                   sum(n2)::BIGINT AS sum_n2
            FROM q GROUP BY 1 ORDER BY 1""",
        # 5s same-(user,type) debounce: gap to the raw predecessor
        "debounced_events": """
            WITH e AS (SELECT user_id, event_type,
                              epoch_us(ts) AS ts_us, event_id
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_type IS NOT NULL),
            o AS (SELECT event_type,
                         CASE WHEN ts_us - lag(ts_us) OVER (
                                PARTITION BY user_id, event_type
                                ORDER BY ts_us, event_id) <= 5000000
                              THEN 1 ELSE 0 END AS dropped
                  FROM e)
            SELECT event_type, count(*)::BIGINT AS n_total,
                   sum(1 - dropped)::BIGINT AS n_kept,
                   sum(dropped)::BIGINT AS n_dropped
            FROM o GROUP BY 1 ORDER BY 1""",
        # weekly cohort retention triangle over distinct (user, week)
        "cohort_retention_matrix": """
            WITH e AS (SELECT user_id,
                              epoch_us(ts) // 604800000000 AS wk
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            d AS (SELECT DISTINCT user_id, wk FROM e),
            c AS (SELECT user_id, min(wk) AS cw FROM d GROUP BY 1)
            SELECT c.cw::BIGINT AS cohort_week,
                   (d.wk - c.cw)::BIGINT AS offset_weeks,
                   count(*)::BIGINT AS n_users
            FROM d JOIN c USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2""",
        # session-size histogram over the shared 30-min-gap islands
        "session_length_histogram": """
            WITH g AS (
              SELECT user_id, ts,
                     CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          OR lag(ts) OVER w IS NULL THEN 1
                          ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
              SELECT *, sum(new_s) OVER (PARTITION BY user_id
                                         ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING)
                          AS sid
              FROM g
            ), sess AS (
              SELECT user_id, sid, count(*)::BIGINT AS n_events
              FROM s GROUP BY user_id, sid
            ), h AS (
              SELECT n_events, count(*)::BIGINT AS n_sessions
              FROM sess GROUP BY 1)
            SELECT n_events, n_sessions,
                   ((1000000 * n_sessions)
                    // (SELECT sum(n_sessions) FROM h))::BIGINT
                     AS share_ppm
            FROM h ORDER BY n_events""",
        # RFM per user: deterministic ntile(5) windows (user_id
        # tiebreak), null values count 0 cents
        "rfm_user_scores": """
            WITH e AS (SELECT user_id,
                              epoch_us(ts) // 86400000000 AS day,
                              CASE WHEN value IS NULL THEN 0
                                   ELSE CAST(round(value * 100)
                                             AS BIGINT) END AS cents
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            u AS (SELECT user_id, max(day) AS last_day,
                         count(*)::BIGINT AS freq,
                         sum(cents)::BIGINT AS m
                  FROM e GROUP BY 1),
            r AS (SELECT user_id,
                         (SELECT max(last_day) FROM u) - last_day
                           AS recency_days,
                         freq, m
                  FROM u),
            s AS (SELECT user_id, recency_days, freq, m,
                         ntile(5) OVER (ORDER BY recency_days,
                                        user_id) AS r_score,
                         ntile(5) OVER (ORDER BY freq DESC,
                                        user_id) AS f_score,
                         ntile(5) OVER (ORDER BY m DESC,
                                        user_id) AS m_score
                  FROM r)
            SELECT user_id, recency_days::BIGINT AS recency_days,
                   freq, m AS monetary_cents,
                   r_score::BIGINT AS r_score,
                   f_score::BIGINT AS f_score,
                   m_score::BIGINT AS m_score,
                   (100 * r_score + 10 * f_score + m_score)::BIGINT
                     AS rfm
            FROM s ORDER BY user_id""",
        # even revenue spreading across in-flight month starts,
        # remainder cents to the earliest months (exact conservation)
        "revenue_recognition_monthly": """
            WITH oe AS (SELECT l_orderkey AS ok,
                               max(l_shipdate) AS e
                        FROM lineitem GROUP BY 1),
            iv AS (SELECT o.o_orderkey AS ok, o.o_orderdate AS s,
                          oe.e,
                          CAST(round(o.o_totalprice * 100) AS BIGINT)
                            AS cents
                   FROM orders o JOIN oe ON o.o_orderkey = oe.ok),
            m AS (SELECT unnest(generate_series(DATE '1990-01-01',
                                 DATE '2009-12-01',
                                 INTERVAL 1 MONTH))::DATE AS ms),
            j AS (SELECT iv.ok, iv.cents, m.ms,
                         row_number() OVER (PARTITION BY iv.ok
                                            ORDER BY m.ms) AS t,
                         count(*) OVER (PARTITION BY iv.ok) AS len
                  FROM iv JOIN m
                    ON iv.s <= m.ms::TIMESTAMP
                   AND m.ms::TIMESTAMP <= iv.e)
            SELECT year(ms)::BIGINT AS yr, month(ms)::BIGINT AS mon,
                   SUM(cents // len
                       + CASE WHEN t <= cents % len THEN 1
                              ELSE 0 END)::BIGINT AS recognized_cents
            FROM j GROUP BY 1, 2 ORDER BY 1, 2""",
        # time-weighted average value per user: LEAD gaps, exact
        # integer numerator, floor-milli; zero-duration users drop
        "twap_user_value": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                              CAST(round(value * 100) AS BIGINT)
                                AS cents
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND value IS NOT NULL),
            o AS (SELECT user_id, cents, ts_us,
                         LEAD(ts_us) OVER (PARTITION BY user_id
                                           ORDER BY ts_us, event_id)
                           AS nxt
                  FROM e),
            g AS (SELECT user_id,
                         SUM(cents * (nxt - ts_us)) AS num,
                         SUM(nxt - ts_us) AS den
                  FROM o WHERE nxt IS NOT NULL GROUP BY 1)
            SELECT user_id, den::BIGINT AS dur_us,
                   ((1000 * num) // den)::BIGINT AS twa_milli_cents
            FROM g WHERE den > 0 ORDER BY 1""",
        # HLL register build: 32-bit multiplicative hash, top-6-bit
        # register, rho = leading zeros of the 26-bit window + 1
        # (binary-string length mirrors numpy frexp exactly)
        "hll_registers_cert": """
            WITH u AS (SELECT user_id FROM events
                       WHERE user_id IS NOT NULL),
            h AS (SELECT (user_id * 2654435761) % 4294967296 AS h
                  FROM u),
            rw AS (SELECT h // 67108864 AS register,
                          h % 67108864 AS w
                   FROM h),
            r AS (SELECT register,
                         CASE WHEN w = 0 THEN 27
                              ELSE 27 - length(format('{:b}', w))
                         END AS rho
                  FROM rw)
            SELECT register::BIGINT AS register,
                   max(rho)::BIGINT AS max_rho
            FROM r GROUP BY 1 ORDER BY 1""",
        # deterministic multiplier bootstrap: 16 hash-weighted
        # replicate means per type; the oracle pays the 16x cross
        # join the engine's fused per-block passes avoid
        "bootstrap_ci_value": """
            WITH e AS (SELECT event_type, event_id % 1000003 AS eid,
                              CAST(round(value * 100) AS BIGINT)
                                AS cents
                       FROM events
                       WHERE value IS NOT NULL
                         AND event_type IS NOT NULL),
            r AS (SELECT unnest(generate_series(0, 15)) AS b),
            w AS (SELECT e.event_type, r.b,
                         ((e.eid * 2654435761 + r.b * 97) % 1000003)
                           % 3 AS w,
                         e.cents
                  FROM e CROSS JOIN r)
            SELECT event_type, b::BIGINT AS b,
                   SUM(w)::BIGINT AS n_eff,
                   ((1000 * SUM(w * cents)) // SUM(w))::BIGINT
                     AS mean_milli_cents
            FROM w GROUP BY 1, 2 HAVING SUM(w) > 0
            ORDER BY 1, 2""",
        # DBSCAN at the vec_id<300 ground-truth scope: integer squared
        # euclidean on 1e-6-quantized coords, core iff >=5 in-eps
        # (self included), recursive min-label over core-core edges,
        # border takes min core-neighbor label, noise -1
        "dbscan_embeddings": """
            WITH RECURSIVE v AS (
              SELECT e.vec_id, i.range AS d,
                     round(e.embedding[i.range]::DOUBLE
                           * 1000000)::BIGINT AS q
              FROM embeddings e, range(1, 65) i
              WHERE e.vec_id < 300),
            dd AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
                          sum((a.q - b.q) * (a.q - b.q)) AS d2
                   FROM v a JOIN v b
                     ON a.d = b.d AND a.vec_id <> b.vec_id
                   GROUP BY 1, 2),
            nbr AS (SELECT ia, ib FROM dd
                    WHERE d2 <= 1420000000000),
            core AS (SELECT ia AS vec_id FROM nbr GROUP BY ia
                     HAVING count(*) + 1 >= 5),
            ce AS (SELECT n.ia AS a, n.ib AS b FROM nbr n
                   JOIN core x ON x.vec_id = n.ia
                   JOIN core y ON y.vec_id = n.ib),
            lab(node, label) AS (
              SELECT vec_id, vec_id FROM core
              UNION
              SELECT e.a, l.label FROM ce e JOIN lab l ON l.node = e.b),
            clab AS (SELECT node, min(label) AS cluster
                     FROM lab GROUP BY node),
            allv AS (SELECT DISTINCT vec_id FROM v)
            SELECT av.vec_id,
                   CASE WHEN c.node IS NOT NULL THEN 'core'
                        WHEN bl.cluster IS NOT NULL THEN 'border'
                        ELSE 'noise' END AS role,
                   COALESCE(c.cluster, bl.cluster, -1)::BIGINT
                     AS cluster
            FROM allv av
            LEFT JOIN clab c ON c.node = av.vec_id
            LEFT JOIN (SELECT n.ia AS vec_id,
                              min(cl.cluster) AS cluster
                       FROM nbr n JOIN clab cl ON cl.node = n.ib
                       GROUP BY 1) bl ON bl.vec_id = av.vec_id
            ORDER BY av.vec_id""",
        # orders in flight at each month start: inner-join intervals
        # [orderdate, max shipdate] against the month grid
        "orders_in_flight_monthly": """
            WITH oe AS (SELECT l_orderkey AS ok,
                               max(l_shipdate) AS e
                        FROM lineitem GROUP BY 1),
            iv AS (SELECT o.o_orderdate AS s, oe.e
                   FROM orders o JOIN oe ON o.o_orderkey = oe.ok),
            m AS (SELECT unnest(generate_series(DATE '1990-01-01',
                                 DATE '2009-12-01',
                                 INTERVAL 1 MONTH))::DATE AS ms)
            SELECT year(m.ms)::BIGINT AS yr,
                   month(m.ms)::BIGINT AS mon,
                   COUNT(*)::BIGINT AS n_open
            FROM m JOIN iv
              ON iv.s <= m.ms::TIMESTAMP AND m.ms::TIMESTAMP <= iv.e
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "minhash_near_dup_exact": """
            WITH docs AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id < 300 AND text IS NOT NULL AND length(text) >= 5),
            sh AS (
              SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 5) AS s
              FROM (SELECT doc_id, text,
                           unnest(generate_series(1, length(text) - 4)) AS i
                    FROM docs)),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT i.id_a, i.id_b,
                   round(i.ni * 1.0 / (sa.n + sb.n - i.ni), 6) AS jaccard
            FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
                         JOIN sizes sb ON sb.doc_id = i.id_b
            WHERE i.ni * 1.0 / (sa.n + sb.n - i.ni) >= 0.5""",
        "near_dup_clusters_exact": """
            WITH RECURSIVE docs AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id < 300 AND text IS NOT NULL AND length(text) >= 5),
            sh AS (
              SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 5) AS s
              FROM (SELECT doc_id, text,
                           unnest(generate_series(1, length(text) - 4)) AS i
                    FROM docs)),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT i.id_a, i.id_b
              FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
                           JOIN sizes sb ON sb.doc_id = i.id_b
              WHERE i.ni * 1.0 / (sa.n + sb.n - i.ni) >= 0.5),
            edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            lab(node, label) AS (
              SELECT a, a FROM (SELECT DISTINCT a FROM edges)
              UNION
              SELECT e.a, l.label FROM edges e JOIN lab l ON l.node = e.b)
            SELECT CAST(node AS BIGINT) AS doc_id,
                   CAST(min(label) AS BIGINT) AS cluster_id
            FROM lab GROUP BY node""",
        "near_dup_clusters_distributed": """
            WITH RECURSIVE docs AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id < 300 AND text IS NOT NULL AND length(text) >= 5),
            sh AS (
              SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 5) AS s
              FROM (SELECT doc_id, text,
                           unnest(generate_series(1, length(text) - 4)) AS i
                    FROM docs)),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT i.id_a, i.id_b
              FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
                           JOIN sizes sb ON sb.doc_id = i.id_b
              WHERE i.ni * 1.0 / (sa.n + sb.n - i.ni) >= 0.5),
            edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            lab(node, label) AS (
              SELECT a, a FROM (SELECT DISTINCT a FROM edges)
              UNION
              SELECT e.a, l.label FROM edges e JOIN lab l ON l.node = e.b)
            SELECT CAST(node AS BIGINT) AS doc_id,
                   CAST(min(label) AS BIGINT) AS cluster_id
            FROM lab GROUP BY node""",
        # Incremental ingest dedup: new batch [250,500) vs ingested <250.
        "dedup_incremental": """
            WITH old AS (SELECT text FROM documents
                         WHERE doc_id < 250 AND text IS NOT NULL),
            new AS (SELECT doc_id, text FROM documents
                    WHERE doc_id >= 250 AND doc_id < 500
                      AND text IS NOT NULL),
            k AS (SELECT min(doc_id) AS doc_id, text FROM new
                  GROUP BY text)
            SELECT doc_id FROM k
            WHERE text NOT IN (SELECT text FROM old)""",
        "dedup_corpus_exact": """
            WITH RECURSIVE docs AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id < 300 AND text IS NOT NULL AND length(text) >= 5),
            sh AS (
              SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 5) AS s
              FROM (SELECT doc_id, text,
                           unnest(generate_series(1, length(text) - 4)) AS i
                    FROM docs)),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT i.id_a, i.id_b
              FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
                           JOIN sizes sb ON sb.doc_id = i.id_b
              WHERE i.ni * 1.0 / (sa.n + sb.n - i.ni) >= 0.5),
            edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            lab(node, label) AS (
              SELECT a, a FROM (SELECT DISTINCT a FROM edges)
              UNION
              SELECT e.a, l.label FROM edges e JOIN lab l ON l.node = e.b),
            clusters AS (SELECT node, min(label) AS cl FROM lab GROUP BY node)
            SELECT doc_id FROM docs
            WHERE doc_id NOT IN (SELECT node FROM clusters WHERE cl < node)""",
        "split_by_cluster": f"""
            WITH RECURSIVE {_SPLIT_CTES}
            SELECT doc_id, cluster_rep, split FROM spl""",
        # Canonical selection: collapse each near-dup cluster to its
        # longest member (min doc_id on ties); singletons pass through.
        "keep_best_per_cluster": f"""
            WITH RECURSIVE {_SPLIT_CTES},
            q AS (SELECT r.doc_id, r.cluster_rep,
                         length(d.text)::BIGINT AS n_len
                  FROM rep r JOIN docs d USING (doc_id))
            SELECT doc_id, cluster_rep, n_len FROM (
              SELECT q.*, row_number() OVER (PARTITION BY cluster_rep
                  ORDER BY n_len DESC, doc_id) AS rn FROM q)
            WHERE rn = 1""",
        # Invariant audit of the leakage-safe split: a verified near-dup
        # pair must never straddle splits (the split follows the cluster
        # representative BY CONSTRUCTION — this query proves it holds).
        "split_leakage_audit": f"""
            WITH RECURSIVE {_SPLIT_CTES}
            SELECT (SELECT count(*) FROM pairs)::BIGINT AS n_pairs,
                   (SELECT count(*) FROM pairs p
                      JOIN spl x ON x.doc_id = p.id_a
                      JOIN spl y ON y.doc_id = p.id_b
                    WHERE x.split <> y.split)::BIGINT AS n_cross_split,
                   (SELECT count(*) FROM spl)::BIGINT AS n_docs""",
        # Degree of each doc in the verified near-dup pair graph
        # (chains the shared exact-pair CTEs; unreferenced CTEs are inert).
        "near_dup_degree": f"""
            WITH RECURSIVE {_SPLIT_CTES},
            e AS (SELECT id_a AS doc_id FROM pairs
                  UNION ALL SELECT id_b FROM pairs)
            SELECT doc_id, count(*)::BIGINT AS degree
            FROM e GROUP BY doc_id""",
        # integer-exact PageRank, 2 rounds unrolled as CTEs (floor-div
        # damping update in millionths — bit-reproducible on both sides)
        "near_dup_pagerank": """
            WITH docs AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id < 300 AND text IS NOT NULL
                AND length(text) >= 5),
            sh AS (
              SELECT DISTINCT doc_id,
                     substr(text, CAST(i AS INTEGER), 5) AS s
              FROM (SELECT doc_id, text,
                           unnest(generate_series(1, length(text) - 4))
                             AS i
                    FROM docs)),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh
                      GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT i.id_a, i.id_b
              FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
                           JOIN sizes sb ON sb.doc_id = i.id_b
              WHERE i.ni * 1.0 / (sa.n + sb.n - i.ni) >= 0.25),
            edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                      UNION ALL SELECT id_b, id_a FROM pairs),
            deg AS (SELECT u, count(*)::BIGINT AS d FROM edges
                    GROUP BY u),
            r0 AS (SELECT u AS node, 1000000::BIGINT AS r FROM deg),
            r1 AS (SELECT e.v AS node,
                          150000 + (85 * sum(r0.r // deg.d)) // 100 AS r
                   FROM edges e JOIN r0 ON r0.node = e.u
                                JOIN deg ON deg.u = e.u
                   GROUP BY e.v),
            r2 AS (SELECT e.v AS node,
                          150000 + (85 * sum(r1.r // deg.d)) // 100 AS r
                   FROM edges e JOIN r1 ON r1.node = e.u
                                JOIN deg ON deg.u = e.u
                   GROUP BY e.v)
            SELECT node AS doc_id, r::BIGINT AS pagerank FROM r2""",
        # triangles enumerated once at a < b < c via a 3-way pair join;
        # jaccard >= 0.25 (denser than the 0.5 dedup graph, where the
        # synthetic corpus has no transitive structure)
        "near_dup_triangles": """
            WITH docs AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id < 300 AND text IS NOT NULL
                AND length(text) >= 5),
            sh AS (
              SELECT DISTINCT doc_id,
                     substr(text, CAST(i AS INTEGER), 5) AS s
              FROM (SELECT doc_id, text,
                           unnest(generate_series(1, length(text) - 4))
                             AS i
                    FROM docs)),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh
                      GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT i.id_a, i.id_b
              FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
                           JOIN sizes sb ON sb.doc_id = i.id_b
              WHERE i.ni * 1.0 / (sa.n + sb.n - i.ni) >= 0.25),
            tri AS (SELECT p1.id_a AS a, p1.id_b AS b, p2.id_b AS c
                    FROM pairs p1
                    JOIN pairs p2 ON p2.id_a = p1.id_b
                    JOIN pairs p3 ON p3.id_a = p1.id_a
                                 AND p3.id_b = p2.id_b),
            nodes AS (SELECT a AS doc_id FROM tri
                      UNION ALL SELECT b FROM tri
                      UNION ALL SELECT c FROM tri)
            SELECT doc_id, count(*)::BIGINT AS n_triangles
            FROM nodes GROUP BY doc_id""",
        # Power-of-two token-count histogram; bucket = floor(log2(tok))
        # via binary-digit length (integer-exact on both sides).
        "token_log2_histogram": """
            WITH t AS (SELECT CASE WHEN length(text) = 0 THEN 0
                              ELSE length(text)
                                   - length(replace(text, ' ', '')) + 1
                              END::BIGINT AS tok
                       FROM documents WHERE text IS NOT NULL),
            f AS (SELECT tok,
                         (length(format('{:b}', tok)) - 1)::BIGINT AS bucket
                  FROM t WHERE tok >= 1)
            SELECT bucket, count(*)::BIGINT AS n_docs,
                   min(tok)::BIGINT AS min_tok, max(tok)::BIGINT AS max_tok
            FROM f GROUP BY bucket""",
        "stratified_sample_documents": """
            SELECT doc_id, lang FROM documents
            WHERE lang IS NOT NULL
              AND (doc_id % 100003) * 2654435761 % 100 <
                  CASE lang WHEN 'en' THEN 47 WHEN 'de' THEN 31
                            WHEN 'fr' THEN 23 WHEN 'es' THEN 61
                            WHEN 'zh' THEN 13 ELSE 0 END""",
        "quality_documents": """
            WITH t AS (
              SELECT doc_id,
                     COALESCE(length(text), 0) AS len,
                     COALESCE(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')), 0) AS na,
                     COALESCE(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')), 0) AS nd,
                     COALESCE(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')), 0) AS npp
              FROM documents),
            r AS (
              SELECT doc_id, len,
                     na * 1.0 / greatest(len, 1) AS ar,
                     nd * 1.0 / greatest(len, 1) AS dr,
                     npp * 1.0 / greatest(len, 1) AS pr,
                     least(greatest(ln(1 + len) / ln(1000.0), 0.0), 1.0) AS ls
              FROM t)
            SELECT doc_id, CAST(len AS BIGINT) AS q_len,
                   round(ar, 6) AS alpha_ratio,
                   round(least(greatest(0.4 * ls + 0.5 * ar - 0.2 * dr
                                        - 0.1 * greatest(pr - 0.2, 0.0),
                                        0.0), 1.0), 6) AS quality
            FROM r""",
        "langid_documents": """
            WITH h AS (SELECT doc_id, lang,
                              substr(COALESCE(text, ''), 1, 2000) AS hd
                       FROM documents),
            c AS (SELECT doc_id, lang,
                    len(regexp_extract_all(hd, '[A-Za-z]+')) AS nw,
                    len(regexp_extract_all(hd, '(?i)\\b(the|and|of|to|in|is|that|it|for|with)\\b')) AS c_en,
                    len(regexp_extract_all(hd, '(?i)\\b(der|die|und|das|ist|nicht|ein|mit|auf|von)\\b')) AS c_de,
                    len(regexp_extract_all(hd, '(?i)\\b(le|la|les|et|est|pour|que|une|dans|des)\\b')) AS c_fr,
                    len(regexp_extract_all(hd, '(?i)\\b(el|la|los|que|de|es|por|una|con|para)\\b')) AS c_es,
                    len(regexp_extract_all(hd, '[\\x{4e00}-\\x{9fff}]')) AS c_cjk,
                    length(hd) AS hl
                  FROM h),
            sc AS (SELECT doc_id, lang,
                     c_en * 1.0 / greatest(nw, 1) AS s_en,
                     c_de * 1.0 / greatest(nw, 1) AS s_de,
                     c_fr * 1.0 / greatest(nw, 1) AS s_fr,
                     c_es * 1.0 / greatest(nw, 1) AS s_es,
                     c_cjk * 1.0 / least(greatest(hl, 1), 400) AS zr
                   FROM c)
            SELECT doc_id, lang,
              CASE WHEN zr > 0.2 THEN 'zh'
                   WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'unknown'
                   WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                   WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                   WHEN s_fr >= s_es THEN 'fr'
                   ELSE 'es' END AS lang_pred,
              CASE WHEN zr > 0.2 THEN round(zr, 4)
                   ELSE round(greatest(s_en, s_de, s_fr, s_es), 4)
              END AS lang_conf
            FROM sc""",
        "embedding_near_dup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.4""",
        "lsh_recall_report": """
            WITH expl AS (
              SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                     unnest(list_transform(embedding,
                            e -> CAST(round(e*1000000) AS BIGINT))) AS q
              FROM embeddings),
            dots AS (
              SELECT e.vec_id, j.j,
                     sum(CASE WHEN ((e.i * (j.j+1) * 2654435761) % 97) % 2 = 0
                              THEN e.q ELSE -e.q END) AS dot
              FROM expl e CROSS JOIN
                   (SELECT unnest(generate_series(0, 15)) AS j) j
              GROUP BY e.vec_id, j.j),
            bands AS (
              SELECT vec_id, (j // 4) AS band,
                     sum(CASE WHEN dot >= 0 THEN (1::BIGINT << (j % 4))
                              ELSE 0 END)::BIGINT AS bb
              FROM dots GROUP BY vec_id, (j // 4)),
            exact AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM embeddings a, embeddings b
              WHERE a.vec_id < b.vec_id
                AND list_cosine_similarity(a.embedding::DOUBLE[],
                                           b.embedding::DOUBLE[]) >= 0.4),
            fnd AS (
              SELECT DISTINCT e.id_a, e.id_b FROM exact e
              JOIN bands x ON x.vec_id = e.id_a
              JOIN bands y ON y.vec_id = e.id_b
                          AND y.band = x.band AND y.bb = x.bb)
            SELECT 'srp_lsh_4x4' AS method,
                   (SELECT count(*) FROM exact)::BIGINT AS n_exact,
                   (SELECT count(*) FROM fnd)::BIGINT AS n_found,
                   round((SELECT count(*) FROM fnd) * 1.0 /
                         greatest((SELECT count(*) FROM exact), 1), 6) AS recall""",
        "knn_bruteforce": """
            WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
                       WHERE vec_id IN (0, 1, 2)),
            s AS (SELECT q.query_id, e.vec_id,
                         list_cosine_similarity(q.embedding::DOUBLE[],
                                                e.embedding::DOUBLE[]) AS cs
                  FROM q, embeddings e),
            r AS (SELECT query_id, vec_id, cs,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY cs DESC, vec_id) AS rk
                  FROM s)
            SELECT query_id, vec_id, round(cs, 6) AS cosine,
                   CAST(rk AS BIGINT) AS "rank"
            FROM r WHERE rk <= 10""",
        "char_class_counts": """
            SELECT doc_id,
                   length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
                   length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
                   length(text) - length(replace(text, ' ', '')) AS n_space
            FROM documents""",
        "token_counts_documents": """
            SELECT doc_id,
                   CASE WHEN text IS NULL THEN NULL
                        WHEN length(text) = 0 THEN 0
                        ELSE length(text) - length(replace(text, ' ', '')) + 1
                   END::BIGINT AS token_count
            FROM documents""",
        "repetition_stats_documents": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents WHERE text IS NOT NULL),
            words AS (SELECT doc_id, unnest(ws) AS word FROM w),
            wc AS (SELECT doc_id, word, count(*)::BIGINT AS c
                   FROM words GROUP BY doc_id, word),
            per_word AS (
              SELECT doc_id, sum(c)::BIGINT AS n_words,
                     (sum(c) - count(*))::BIGINT AS n_dup_words,
                     max(c)::BIGINT AS max_word_freq
              FROM wc GROUP BY doc_id),
            grams AS (SELECT doc_id, unnest(list_zip(ws, ws[2:])) AS g FROM w),
            g2 AS (SELECT doc_id, g[1] AS w1, g[2] AS w2 FROM grams
                   WHERE g[2] IS NOT NULL),
            gc AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS c
                   FROM g2 GROUP BY doc_id, w1, w2),
            per_gram AS (SELECT doc_id, (sum(c) - count(*))::BIGINT AS n_dup_2grams
                         FROM gc GROUP BY doc_id)
            SELECT p.doc_id, p.n_words, p.n_dup_words, p.max_word_freq,
                   coalesce(pg.n_dup_2grams, 0)::BIGINT AS n_dup_2grams
            FROM per_word p LEFT JOIN per_gram pg ON p.doc_id = pg.doc_id""",
        "decontaminate_documents": """
            WITH bench AS (
              SELECT doc_id AS bench_id, substr(text, 1, 32) AS snippet
              FROM documents
              WHERE doc_id % 17 = 7 AND text IS NOT NULL AND length(text) >= 32)
            SELECT d.doc_id, count(*)::BIGINT AS n_hits
            FROM documents d, bench b
            WHERE d.text IS NOT NULL AND d.doc_id <> b.bench_id
              AND contains(d.text, b.snippet)
            GROUP BY d.doc_id""",
        # the Rabin-Karp-path twin of decontaminate_documents: 125 snippets
        # at sf0.01 exceed the 100-snippet scan cap, so this row checks the
        # anchored multi-pattern index against the exact contains() oracle
        "decontaminate_rk_documents": """
            WITH bench AS (
              SELECT doc_id AS bench_id, substr(text, 1, 32) AS snippet
              FROM documents
              WHERE doc_id % 4 = 1 AND text IS NOT NULL
                AND length(text) >= 32)
            SELECT d.doc_id, count(*)::BIGINT AS n_hits
            FROM documents d, bench b
            WHERE d.text IS NOT NULL AND d.doc_id <> b.bench_id
              AND contains(d.text, b.snippet)
            GROUP BY d.doc_id""",
        "regex_redact_documents": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\b(key|hash)\\b'))::BIGINT
                     AS n_matches,
                   length(regexp_replace(text, '\\b(key|hash)\\b', '<R>', 'g'))::BIGINT
                     AS redacted_len
            FROM documents WHERE text IS NOT NULL""",
        "curation_pipeline_documents": """
            WITH base AS (
              SELECT doc_id, text, lang FROM documents
              WHERE text IS NOT NULL
                AND lang IN ('en', 'de', 'fr', 'es', 'zh')
                AND n_chars IS NOT NULL AND n_chars >= 50),
            wc AS (SELECT doc_id, word, count(*)::BIGINT AS c
                   FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                         FROM base)
                   GROUP BY doc_id, word),
            rep AS (SELECT doc_id, sum(c)::BIGINT AS n_words,
                           (sum(c) - count(*))::BIGINT AS n_dup
                    FROM wc GROUP BY doc_id),
            pass AS (SELECT b.doc_id, b.lang, b.text, r.n_words
                     FROM base b JOIN rep r ON b.doc_id = r.doc_id
                     WHERE r.n_words >= 10 AND r.n_dup * 2 < r.n_words),
            kept AS (SELECT min(doc_id) AS doc_id FROM pass GROUP BY text)
            SELECT p.doc_id, p.lang, p.n_words AS n_tok,
                   CASE WHEN p.doc_id % 10 = 0 THEN 'test'
                        WHEN p.doc_id % 10 = 1 THEN 'val'
                        ELSE 'train' END AS split
            FROM pass p JOIN kept k ON p.doc_id = k.doc_id""",
        # Composed trainer export: Gopher gate -> 8-gram benchmark
        # decontamination -> exact dedup -> seeded shuffle-shard placement.
        "trainer_export_pipeline": """
            WITH d AS (SELECT doc_id, text FROM documents
                       WHERE text IS NOT NULL),
            sp AS (SELECT doc_id, string_split(text, ' ') AS sp FROM d),
            w8 AS (SELECT doc_id, array_to_string(sp[i:i+7], ' ') AS g
                   FROM (SELECT doc_id, sp,
                                unnest(generate_series(1, len(sp) - 7)) AS i
                         FROM sp)),
            bench AS (SELECT DISTINCT g FROM w8 WHERE doc_id % 17 = 7),
            contaminated AS (
              SELECT DISTINCT w8.doc_id FROM w8 JOIN bench USING (g)
              WHERE w8.doc_id % 17 <> 7),
            gw AS (SELECT doc_id, unnest(sp) AS word FROM sp
                   WHERE doc_id % 17 <> 7),
            per AS (SELECT doc_id, count(*)::BIGINT AS n_words,
                           sum(length(word))::BIGINT AS sum_wlen,
                           sum(CASE WHEN regexp_matches(word, '[A-Za-z]')
                               THEN 1 ELSE 0 END)::BIGINT AS n_alpha,
                           sum(CASE WHEN word IN ('the','a','of','to',
                                                  'and','that','is')
                               THEN 1 ELSE 0 END)::BIGINT AS n_stop
                    FROM gw GROUP BY doc_id),
            pass AS (SELECT doc_id FROM per
                     WHERE n_words BETWEEN 50 AND 100000
                       AND sum_wlen BETWEEN 3 * n_words AND 10 * n_words
                       AND 5 * n_alpha >= 4 * n_words AND n_stop >= 2
                       AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
            kept AS (SELECT min(d.doc_id) AS doc_id
                     FROM d JOIN pass USING (doc_id) GROUP BY d.text),
            h AS (SELECT doc_id,
                         (doc_id * 2654435761 + 42) % 4294967296 AS h1
                  FROM kept),
            s AS (SELECT doc_id, (h1 % 16)::BIGINT AS shard,
                         ((h1::HUGEINT * 2246822519)
                          % 4294967296)::BIGINT AS h2
                  FROM h)
            SELECT doc_id, shard,
                   (row_number() OVER (PARTITION BY shard
                                       ORDER BY h2, doc_id) - 1)::BIGINT
                       AS pos
            FROM s""",
        "tfidf_top_term": """
            WITH words AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents WHERE text IS NOT NULL),
            tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf
                   FROM words GROUP BY doc_id, word),
            df AS (SELECT word, count(DISTINCT doc_id)::BIGINT AS df
                   FROM words GROUP BY word),
            s AS (SELECT tf.doc_id, tf.word, tf.tf, df.df,
                         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY (tf.tf::DOUBLE / df.df) DESC, tf.word)
                           AS rk
                  FROM tf JOIN df USING (word))
            SELECT doc_id, word AS top_word, tf, df FROM s WHERE rk = 1""",
        "inverted_index_words": """
            WITH dw AS (
              SELECT DISTINCT word, doc_id
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                    FROM documents WHERE text IS NOT NULL))
            SELECT word, count(*)::BIGINT AS df,
                   string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
            FROM dw GROUP BY word""",
        "embedding_mean_by_lang": """
            SELECT d.lang, count(*)::BIGINT AS n,
                   sum(round(e.embedding[1]::DOUBLE * 1000000)::BIGINT)::BIGINT AS s0,
                   sum(round(e.embedding[2]::DOUBLE * 1000000)::BIGINT)::BIGINT AS s1,
                   sum(round(e.embedding[3]::DOUBLE * 1000000)::BIGINT)::BIGINT AS s2,
                   sum(round(e.embedding[4]::DOUBLE * 1000000)::BIGINT)::BIGINT AS s3,
                   sum(round(e.embedding[5]::DOUBLE * 1000000)::BIGINT)::BIGINT AS s4,
                   sum(round(e.embedding[6]::DOUBLE * 1000000)::BIGINT)::BIGINT AS s5,
                   sum(round(e.embedding[7]::DOUBLE * 1000000)::BIGINT)::BIGINT AS s6,
                   sum(round(e.embedding[8]::DOUBLE * 1000000)::BIGINT)::BIGINT AS s7
            FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
            WHERE d.lang IS NOT NULL
            GROUP BY d.lang""",
        "length_quantile_filter": """
            WITH c AS (SELECT n_chars, count(*)::BIGINT AS cnt
                       FROM documents WHERE n_chars IS NOT NULL
                       GROUP BY n_chars),
            t AS (SELECT n_chars,
                         sum(cnt) OVER (ORDER BY n_chars)::BIGINT AS cum,
                         (SELECT count(*) FROM documents
                          WHERE n_chars IS NOT NULL)::BIGINT AS tot
                  FROM c),
            thr AS (SELECT min(n_chars) AS l FROM t WHERE cum * 10 >= tot * 9)
            SELECT doc_id, n_chars FROM documents, thr
            WHERE n_chars >= thr.l""",
        # Grouped exact quartiles: integer lower-quantile rule (smallest
        # value whose cumulative count clears q/4 of the group total).
        "chars_quartiles_by_lang": """
            WITH c AS (SELECT lang, n_chars, count(*)::BIGINT AS cnt
                       FROM documents
                       WHERE lang IS NOT NULL AND n_chars IS NOT NULL
                       GROUP BY lang, n_chars),
            t AS (SELECT lang, n_chars,
                         sum(cnt) OVER (PARTITION BY lang
                                        ORDER BY n_chars) AS cum,
                         sum(cnt) OVER (PARTITION BY lang) AS tot
                  FROM c)
            SELECT lang,
                   min(CASE WHEN cum * 4 >= tot THEN n_chars END)::BIGINT
                       AS p25,
                   min(CASE WHEN cum * 4 >= 2 * tot THEN n_chars END)::BIGINT
                       AS p50,
                   min(CASE WHEN cum * 4 >= 3 * tot THEN n_chars END)::BIGINT
                       AS p75,
                   CAST(min(tot) AS BIGINT) AS n
            FROM t GROUP BY lang""",
        "cap_per_source": """
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY doc_id) AS rn
              FROM documents) WHERE rn <= 50""",
        "doc_rarity_score": """
            WITH w AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents WHERE text IS NOT NULL),
            cf AS (SELECT word, count(*)::BIGINT AS c FROM w GROUP BY word)
            SELECT w.doc_id,
                   sum(cf.c)::BIGINT AS cf_sum,
                   count(*)::BIGINT AS n_words
            FROM w JOIN cf USING (word)
            GROUP BY w.doc_id""",
        # GPT-3-style token-n-gram decontamination: 8-token windows joined
        # with one space (injective for space-free tokens, so comparing
        # window TEXT == comparing token sequences); engine compares
        # window hashes, oracle the text.
        "ngram_decontaminate_documents": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS sp
                       FROM documents WHERE text IS NOT NULL),
            w AS (SELECT doc_id, array_to_string(sp[i:i+7], ' ') AS g
                  FROM (SELECT doc_id, sp,
                               unnest(generate_series(1,
                                   len(sp) - 7)) AS i
                        FROM d)),
            bench AS (SELECT DISTINCT g FROM w WHERE doc_id % 17 = 7)
            SELECT w.doc_id, count(*)::BIGINT AS n_hit_windows
            FROM w JOIN bench USING (g)
            WHERE w.doc_id % 17 <> 7
            GROUP BY w.doc_id""",
        # Gopher doc-quality rules: thresholds as integer cross-products so
        # pass/fail is exact; ratios are single int/int divisions (bitwise
        # identical float64 on both sides).
        "gopher_quality_flags": """
            WITH d AS (SELECT doc_id, text FROM documents
                       WHERE text IS NOT NULL),
            w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM d),
            per AS (SELECT doc_id,
                           count(*)::BIGINT AS n_words,
                           sum(length(word))::BIGINT AS sum_wlen,
                           sum(CASE WHEN regexp_matches(word, '[A-Za-z]')
                               THEN 1 ELSE 0 END)::BIGINT AS n_alpha_words,
                           sum(CASE WHEN word IN ('the','a','of','to',
                                                  'and','that','is')
                               THEN 1 ELSE 0 END)::BIGINT AS n_stop_hits
                    FROM w GROUP BY doc_id)
            SELECT doc_id, n_words,
                   sum_wlen * 1.0 / n_words AS mean_word_len,
                   n_alpha_words * 1.0 / n_words AS alpha_word_frac,
                   n_stop_hits,
                   (CASE WHEN n_words BETWEEN 50 AND 100000
                          AND sum_wlen BETWEEN 3 * n_words AND 10 * n_words
                          AND 5 * n_alpha_words >= 4 * n_words
                          AND n_stop_hits >= 2
                    THEN 1 ELSE 0 END)::BIGINT AS gopher_pass
            FROM per""",
        # Deterministic seeded shuffle-shard: 32-bit multiplicative hashes
        # (HUGEINT keeps the second product exact) + per-shard rank.
        "shuffle_shard_documents": """
            WITH h AS (SELECT doc_id,
                              (doc_id * 2654435761 + 42) % 4294967296 AS h1
                       FROM documents),
            s AS (SELECT doc_id, (h1 % 16)::BIGINT AS shard,
                         ((h1::HUGEINT * 2246822519)
                          % 4294967296)::BIGINT AS h2
                  FROM h)
            SELECT doc_id, shard,
                   (row_number() OVER (PARTITION BY shard
                                       ORDER BY h2, doc_id) - 1)::BIGINT
                       AS pos
            FROM s""",
        # Token-budget mixture: per-source cap = total // (2*n_sources),
        # weight in millionths — all integer floor arithmetic.
        "source_mixture_weights": """
            WITH per AS (SELECT source,
                                sum(len(string_split(text, ' ')))::BIGINT
                                    AS n_tokens,
                                count(*)::BIGINT AS n_docs
                         FROM documents WHERE text IS NOT NULL
                         GROUP BY source),
            t AS (SELECT sum(n_tokens)::BIGINT AS total,
                         count(*)::BIGINT AS nsrc FROM per)
            SELECT per.source, per.n_tokens, per.n_docs,
                   least(1000000,
                         ((t.total // (2 * t.nsrc)) * 1000000)
                         // per.n_tokens)::BIGINT AS weight_millionths
            FROM per, t""",
        "chunk_documents": """
            WITH d AS (SELECT doc_id, text, length(text)::BIGINT AS n
                       FROM documents WHERE text IS NOT NULL),
            c AS (SELECT doc_id,
                         unnest(generate_series(0,
                             ((n - 1) // 150)::INT)) AS chunk_id, text
                  FROM d WHERE n >= 1)
            SELECT doc_id, chunk_id::BIGINT AS chunk_id,
                   substr(text, (chunk_id * 150 + 1)::INT, 200)
                       AS chunk_text
            FROM c""",
        # Lee et al. duplicated-span signal: window positions whose char
        # 20-gram occurs in >= 2 distinct docs (codepoint windows ==
        # substr windows; engine hashes them, oracle compares the text).
        "dup_span_stats": """
            WITH d AS (SELECT doc_id, text, length(text)::BIGINT AS n
                       FROM documents WHERE text IS NOT NULL),
            w AS (SELECT doc_id,
                         unnest(generate_series(1,
                             greatest(n - 19, 0)::INT)) AS pos, text
                  FROM d),
            wt AS (SELECT doc_id, substr(text, pos::INT, 20) AS wt FROM w),
            g AS (SELECT wt, count(DISTINCT doc_id) AS nd FROM wt
                  GROUP BY wt),
            dup AS (SELECT wt.doc_id, count(*)::BIGINT AS n_dup
                    FROM wt JOIN g ON wt.wt = g.wt WHERE g.nd >= 2
                    GROUP BY wt.doc_id)
            SELECT d.doc_id, greatest(d.n - 19, 0)::BIGINT AS n_windows,
                   coalesce(dup.n_dup, 0)::BIGINT AS n_dup_windows
            FROM d LEFT JOIN dup USING (doc_id)""",
        # Distributed Lloyd k-means, 2 unrolled assign/update rounds in
        # integer-exact quantized arithmetic (matches
        # similarity.kmeans_quantized step for step): squared-euclidean
        # argmin with lowest-cluster tie-break, centroid update =
        # sign(s) * ((2|s| + n) // (2n)) (round-half-away integer mean),
        # empty clusters keep their previous centroid via the LEFT JOIN.
        "pq_encode_embeddings": _pq_oracle(),
        "kmeans_embeddings": f"""
            WITH {_KMEANS_CTES},
            n2 AS (SELECT cluster, count(*)::BIGINT AS n_members
                   FROM a2 GROUP BY cluster)
            SELECT c2.cluster, c2.d, c2.c,
                   coalesce(n2.n_members, 0)::BIGINT AS n_members
            FROM c2 LEFT JOIN n2 USING (cluster)""",
        # IVF ANN with every stage reproducible: final assignment and the
        # per-query probe choice are integer argmins over the k-means
        # centroids; the within-probe ranking reuses the exact-cosine
        # convention knn_bruteforce already hash-matches.
        "knn_ivf_kmeans": f"""
            WITH {_KMEANS_CTES},
            a3 AS (
              SELECT vec_id, cluster FROM (
                SELECT v.vec_id, c.cluster,
                       row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY sum((v.q - c.c) * (v.q - c.c)),
                                    c.cluster) AS rn
                FROM v JOIN c2 c USING (d)
                GROUP BY v.vec_id, c.cluster) WHERE rn = 1),
            p AS (
              SELECT vec_id AS query_id, cluster FROM (
                SELECT v.vec_id, c.cluster,
                       row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY sum((v.q - c.c) * (v.q - c.c)),
                                    c.cluster) AS rn
                FROM v JOIN c2 c USING (d)
                WHERE v.vec_id IN (0, 1, 2)
                GROUP BY v.vec_id, c.cluster) WHERE rn <= 2),
            qv AS (SELECT vec_id AS query_id, embedding FROM embeddings
                   WHERE vec_id IN (0, 1, 2)),
            s AS (SELECT qv.query_id, a3.vec_id,
                         list_cosine_similarity(qv.embedding::DOUBLE[],
                                                e.embedding::DOUBLE[]) AS cs
                  FROM qv JOIN p USING (query_id)
                  JOIN a3 ON a3.cluster = p.cluster
                  JOIN embeddings e ON e.vec_id = a3.vec_id),
            r AS (SELECT query_id, vec_id, cs,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY cs DESC, vec_id) AS rk
                  FROM s)
            SELECT query_id, vec_id, round(cs, 6) AS cosine,
                   CAST(rk AS BIGINT) AS "rank"
            FROM r WHERE rk <= 10""",
        # SemDeDup: k-means localizes the near-dup check; a vector is
        # dropped iff a LOWER-id same-cluster member sits at exact cosine
        # >= 0.4. Assignment (a3) is the same integer argmin the IVF
        # oracle uses; the cosine convention is the one embedding_near_dup
        # already hash-matches.
        "semdedup_embeddings": f"""
            WITH {_KMEANS_CTES},
            a3 AS (
              SELECT vec_id, cluster FROM (
                SELECT v.vec_id, c.cluster,
                       row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY sum((v.q - c.c) * (v.q - c.c)),
                                    c.cluster) AS rn
                FROM v JOIN c2 c USING (d)
                GROUP BY v.vec_id, c.cluster) WHERE rn = 1),
            rm AS (
              SELECT DISTINCT b.vec_id
              FROM a3 a JOIN a3 b
                ON a.cluster = b.cluster AND a.vec_id < b.vec_id
              JOIN embeddings ea ON ea.vec_id = a.vec_id
              JOIN embeddings eb ON eb.vec_id = b.vec_id
              WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
                                           eb.embedding::DOUBLE[]) >= 0.4)
            SELECT a3.vec_id, a3.cluster FROM a3
            WHERE a3.vec_id NOT IN (SELECT vec_id FROM rm)""",
        "pack_sequences_documents": """
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN length(text) = 0 THEN 0
                          ELSE length(text) - length(replace(text, ' ', '')) + 1
                     END::BIGINT AS tok
              FROM documents WHERE text IS NOT NULL),
            c AS (
              SELECT doc_id, tok,
                     coalesce(sum(tok) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0)::BIGINT AS o
              FROM t)
            SELECT doc_id, tok, (o // 512)::BIGINT AS seq_id,
                   (o % 512)::BIGINT AS offset_in_seq
            FROM c""",
        "vocabulary_top_words": """
            WITH wc AS (
              SELECT lang, word, count(*)::BIGINT AS n
              FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
                    FROM documents
                    WHERE text IS NOT NULL AND lang IS NOT NULL)
              GROUP BY lang, word),
            r AS (SELECT lang, word, n,
                         row_number() OVER (PARTITION BY lang
                                            ORDER BY n DESC, word) AS rk
                  FROM wc)
            SELECT lang, word, n, rk::BIGINT AS rk FROM r WHERE rk <= 10""",
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                     AS sum_base_price_cents,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                     AS sum_disc_price_e4,
                   count(*)::BIGINT AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus""",
        "top_revenue_customers": """
            SELECT t.o_custkey AS c_custkey, c.c_name AS c_name, t.revenue_cents
            FROM (SELECT o_custkey,
                         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                           AS revenue_cents
                  FROM orders GROUP BY o_custkey
                  ORDER BY revenue_cents DESC, o_custkey LIMIT 10) t
            LEFT JOIN customer c ON c.c_custkey = t.o_custkey""",
        # 2-sigma hourly anomaly flag with the z-test in cleared-denominator
        # integer form: (H*c - S)^2 > 4*(H*SS - S^2); HUGEINT keeps the
        # SQL products exact (the engine uses Python big ints).
        "events_hourly_anomaly": """
            WITH h AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT)
                                  AS hour_bucket,
                              count(*)::BIGINT AS n_events
                       FROM events GROUP BY hour_bucket),
            t AS (SELECT count(*)::HUGEINT AS nh,
                         sum(n_events)::HUGEINT AS s,
                         sum(n_events::HUGEINT * n_events)::HUGEINT AS ss
                  FROM h)
            SELECT h.hour_bucket, h.n_events,
                   (CASE WHEN (t.nh * h.n_events - t.s)
                              * (t.nh * h.n_events - t.s)
                              > 4 * (t.nh * t.ss - t.s * t.s)
                    THEN 1 ELSE 0 END)::BIGINT AS is_anomaly
            FROM h, t""",
        # Bigram LM "most likely next word" for the top-20 first words;
        # exact counts, lexicographic tie-breaks on both rankings.
        "bigram_next_word": """
            WITH w AS (SELECT string_split(text, ' ') AS ws
                       FROM documents WHERE text IS NOT NULL),
            g AS (SELECT unnest(list_zip(ws, ws[2:])) AS p FROM w),
            b AS (SELECT p[1] AS w1, p[2] AS w2 FROM g
                  WHERE p[2] IS NOT NULL),
            c AS (SELECT w1, w2, count(*)::BIGINT AS pair_count
                  FROM b GROUP BY w1, w2),
            f AS (SELECT w1, sum(pair_count)::BIGINT AS w1_count
                  FROM c GROUP BY w1),
            top AS (SELECT w1, w1_count FROM (
                      SELECT f.*, row_number() OVER (
                          ORDER BY w1_count DESC, w1) AS rn FROM f)
                    WHERE rn <= 20),
            best AS (SELECT w1, w2 AS next_word, pair_count FROM (
                       SELECT c.*, row_number() OVER (PARTITION BY w1
                           ORDER BY pair_count DESC, w2) AS rn FROM c)
                     WHERE rn = 1)
            SELECT t.w1, t.w1_count, b2.next_word, b2.pair_count
            FROM top t JOIN best b2 USING (w1)""",
        # First BPE merge step: adjacent codepoint pairs within words
        # (substr is codepoint-indexed, matching the engine's utf-32
        # kernel); ties broken by pair lexicographic order = packed-key
        # order on the engine side.
        "bpe_top_pairs": """
            WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                       FROM documents WHERE text IS NOT NULL),
            p AS (SELECT substr(word, i::INT, 1) AS c1,
                         substr(word, i::INT + 1, 1) AS c2
                  FROM (SELECT word,
                               unnest(generate_series(1, length(word) - 1))
                                   AS i
                        FROM w)),
            c AS (SELECT c1, c2, count(*)::BIGINT AS n FROM p
                  GROUP BY c1, c2)
            SELECT c1, c2, n, rk FROM (
              SELECT c.*, row_number() OVER (
                  ORDER BY n DESC, c1, c2)::BIGINT AS rk FROM c)
            WHERE rk <= 20""",
        # Bigram-LM coverage score: per-doc hits against the corpus
        # top-1000 bigram table in exact-rational (n_hits, n_pairs) form;
        # docs with zero adjacent pairs (<2 words) are out of scope on
        # both sides.
        "bigram_coverage_score": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents WHERE text IS NOT NULL),
            g AS (SELECT doc_id, unnest(list_zip(ws, ws[2:])) AS p FROM w),
            b AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM g
                  WHERE p[2] IS NOT NULL),
            c AS (SELECT w1, w2, count(*)::BIGINT AS n FROM b
                  GROUP BY w1, w2),
            top AS (SELECT w1, w2 FROM (
                      SELECT c.*, row_number() OVER (
                          ORDER BY n DESC, w1, w2) AS rn FROM c)
                    WHERE rn <= 1000),
            per AS (SELECT doc_id, count(*)::BIGINT AS n_pairs FROM b
                    GROUP BY doc_id),
            hit AS (SELECT b.doc_id, count(*)::BIGINT AS n_hits
                    FROM b JOIN top USING (w1, w2) GROUP BY b.doc_id)
            SELECT per.doc_id, per.n_pairs,
                   coalesce(hit.n_hits, 0)::BIGINT AS n_hits
            FROM per LEFT JOIN hit USING (doc_id)""",
        "events_hourly_window": """
            SELECT user_id,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
                   count(*)::BIGINT AS n_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                     AS sum_value_cents
            FROM events GROUP BY user_id, hour_bucket""",
        "bpeish_token_counts": """
            SELECT doc_id,
                   CAST(COALESCE(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')), 0)
                        AS BIGINT) AS bpeish_tokens
            FROM documents""",
        "events_sliding_window": """
            WITH e AS (
              SELECT user_id,
                     CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events),
            w AS (SELECT user_id, h AS window_start, cents FROM e
                  UNION ALL
                  SELECT user_id, h - 1, cents FROM e)
            SELECT user_id, window_start,
                   count(*)::BIGINT AS n_events,
                   CAST(sum(cents) AS BIGINT) AS sum_value_cents
            FROM w GROUP BY user_id, window_start""",
        "part_brand_stats": """
            SELECT p_brand, count(p_size)::BIGINT AS n,
                   min(p_size)::BIGINT AS min_size, max(p_size)::BIGINT AS max_size,
                   CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
                     AS sum_price_cents
            FROM part GROUP BY p_brand""",
        "supplier_nation_balance": """
            SELECT n.n_name,
                   count(*)::BIGINT AS n_suppliers,
                   CAST(sum(CAST(round(s.s_acctbal * 100) AS BIGINT))
                     AS BIGINT) AS sum_acctbal_cents,
                   CAST(min(CAST(round(s.s_acctbal * 100) AS BIGINT))
                     AS BIGINT) AS min_acctbal_cents,
                   CAST(max(CAST(round(s.s_acctbal * 100) AS BIGINT))
                     AS BIGINT) AS max_acctbal_cents
            FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
            GROUP BY n.n_name""",
        "nation_region_join": """
            SELECT n.n_name, r.r_name
            FROM nation n LEFT JOIN region r ON r.r_regionkey = n.n_regionkey""",
        "lineitem_topk": """
            SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
            FROM lineitem
            ORDER BY price_cents DESC, l_orderkey, l_linenumber LIMIT 10""",
        "distinct_mktsegment": """
            SELECT DISTINCT c_mktsegment FROM customer""",
        "orders_priority_count": """
            SELECT o_orderpriority, count(*)::BIGINT AS n
            FROM orders WHERE o_totalprice > 100000.0 GROUP BY o_orderpriority""",
        "order_revenue_join": """
            SELECT o.o_orderpriority,
                   CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                     AS revenue_cents,
                   count(*)::BIGINT AS n_items
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderpriority""",
        # TPC-H Q3-shaped 3-way join + exact integer-e4 revenue + top-10
        # (synthetic orders carries no o_shippriority column).
        "q3_shipping_priority": """
            SELECT l.l_orderkey, o.o_orderdate,
                   CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l.l_discount) * 100) AS BIGINT))
                     AS BIGINT) AS revenue_e4
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1995-03-15'
              AND l.l_shipdate > TIMESTAMP '1995-03-15'
            GROUP BY l.l_orderkey, o.o_orderdate
            ORDER BY revenue_e4 DESC, l.l_orderkey LIMIT 10""",
        "events_orders_asof": """
            WITH e AS (
              SELECT event_id, user_id,
                     epoch_us(TIMESTAMP '1995-01-01')
                       + (epoch_us(ts) % (epoch_us(TIMESTAMP '2001-08-02')
                                          - epoch_us(TIMESTAMP '1995-01-01')))
                       AS cut_us
              FROM events),
            j AS (
              SELECT e.event_id, o.o_orderkey, o.o_totalprice,
                     row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rk
              FROM e LEFT JOIN orders o
                ON o.o_custkey = e.user_id
               AND epoch_us(o.o_orderdate) <= e.cut_us)
            SELECT event_id, o_orderkey AS asof_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS asof_price_cents
            FROM j WHERE rk = 1""",
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, price_cents, "rank" FROM (
              SELECT o_custkey, o_orderkey,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
                     CAST(row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                                o_orderkey) AS BIGINT) AS "rank"
              FROM orders)
            WHERE "rank" <= 3""",
        "events_orders_range": """
            WITH e AS (
              SELECT event_id, user_id,
                     epoch_us(TIMESTAMP '1995-01-01')
                       + (epoch_us(ts) % (epoch_us(TIMESTAMP '2001-08-02')
                                          - epoch_us(TIMESTAMP '1995-01-01')))
                       AS cut_us
              FROM events)
            SELECT e.event_id, o.o_orderkey AS range_orderkey,
                   CAST(round(o.o_totalprice * 100) AS BIGINT)
                     AS range_price_cents
            FROM e JOIN orders o
              ON o.o_custkey = e.user_id
             AND e.cut_us BETWEEN epoch_us(o.o_orderdate)
                              AND epoch_us(o.o_orderdate)
                                  + 180 * 86400 * 1000000::BIGINT""",
        "events_sessionization": """
            WITH g AS (
              SELECT user_id, ts, value,
                     CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
              SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS sid
              FROM g
            )
            SELECT user_id, min(ts) AS session_start, count(*)::BIGINT AS n_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                     AS sum_value_cents
            FROM s GROUP BY user_id, sid""",
        "customer_running_totals": """
            SELECT o_custkey, o_orderkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
            FROM orders""",
        # Bounded ROWS window: 3-row rolling sum/count per user ordered by
        # (ts, event_id) — event_id makes the frame deterministic.
        "events_rolling_window": """
            WITH e AS (SELECT event_id, user_id, ts,
                              CAST(round(value * 100) AS BIGINT) AS cents
                       FROM events)
            SELECT event_id,
                   CAST(sum(cents) OVER w AS BIGINT) AS roll_cents,
                   CAST(count(*) OVER w AS BIGINT) AS roll_n
            FROM e WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
        # Hourly "trending" top event type (count desc, type lex ties).
        "trending_event_types": """
            WITH c AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT)
                              AS hour_bucket,
                              event_type, count(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2)
            SELECT hour_bucket, event_type AS top_type, n FROM (
              SELECT c.*, row_number() OVER (PARTITION BY hour_bucket
                  ORDER BY n DESC, event_type) AS rn FROM c)
            WHERE rn = 1""",
        # Day-7 cohort retention per user.
        "cohort_retention_d7": """
            WITH d AS (SELECT DISTINCT user_id,
                              CAST(floor(epoch(ts) / 86400) AS BIGINT)
                                  AS day
                       FROM events),
            f AS (SELECT user_id, min(day) AS first_day FROM d
                  GROUP BY user_id)
            SELECT f.user_id, f.first_day,
                   (CASE WHEN r.user_id IS NULL THEN 0 ELSE 1
                    END)::BIGINT AS retained_d7
            FROM f LEFT JOIN d r ON r.user_id = f.user_id
                               AND r.day = f.first_day + 7""",
        # Windowed keyed dedup: first event per (user, type, UTC day).
        "first_event_per_day": """
            SELECT event_id, user_id, day, event_type FROM (
              SELECT event_id, user_id, event_type,
                     CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                     row_number() OVER (
                       PARTITION BY user_id, event_type,
                                    CAST(floor(epoch(ts) / 86400) AS BIGINT)
                       ORDER BY ts, event_id) AS rn
              FROM events) WHERE rn = 1""",
        "lang_source_pivot": """
            SELECT COALESCE(source, '__null__') AS source,
                   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
                   sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT AS n_de,
                   sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END)::BIGINT AS n_fr,
                   sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END)::BIGINT AS n_es,
                   sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END)::BIGINT AS n_zh,
                   sum(CASE WHEN lang IS NULL
                             OR lang NOT IN ('en','de','fr','es','zh')
                       THEN 1 ELSE 0 END)::BIGINT AS n_other
            FROM documents GROUP BY 1""",
        "partitioned_write_roundtrip": """
            SELECT lang, sum(n_chars)::BIGINT AS sum_chars,
                   count(*)::BIGINT AS n_docs
            FROM documents
            WHERE lang IS NOT NULL AND n_chars IS NOT NULL
            GROUP BY lang""",
        "normalize_text_documents": """
            SELECT doc_id,
                   trim(regexp_replace(lower(text), ' +', ' ', 'g'), ' ')
                       AS norm_text,
                   length(trim(regexp_replace(lower(text), ' +', ' ', 'g'),
                               ' '))::BIGINT AS n_norm_chars
            FROM documents WHERE text IS NOT NULL""",
        # GROUP BY ROLLUP levels from one pass; grouping-set NULLs map to
        # '__all__', genuine NULL values to '__null__'.
        "lang_source_rollup": """
            SELECT COALESCE(CASE WHEN GROUPING(source) = 1
                                 THEN '__all__' ELSE source END,
                            '__null__') AS source,
                   COALESCE(CASE WHEN GROUPING(lang) = 1
                                 THEN '__all__' ELSE lang END,
                            '__null__') AS lang,
                   count(*)::BIGINT AS n
            FROM documents
            GROUP BY ROLLUP (source, lang)""",
        # Equi-depth range-partition planning: boundary i = smallest value
        # whose cumulative count reaches i/16 of the total.
        "range_partition_bounds": """
            WITH c AS (SELECT n_chars, count(*)::BIGINT AS cnt
                       FROM documents WHERE n_chars IS NOT NULL
                       GROUP BY n_chars),
            t AS (SELECT n_chars,
                         sum(cnt) OVER (ORDER BY n_chars) AS cum,
                         (SELECT count(*) FROM documents
                          WHERE n_chars IS NOT NULL) AS tot
                  FROM c)
            SELECT i.i::BIGINT AS bucket,
                   min(CASE WHEN t.cum * 16 >= i.i * t.tot
                            THEN t.n_chars END)::BIGINT AS bound
            FROM t, (SELECT unnest(generate_series(1, 15)) AS i) i
            GROUP BY i.i""",
        # Z-order (Morton) clustering keys: bit-interleave of
        # (n_chars, doc_id), 20 bits each; bucket = top 8 bits.
        "zorder_documents": """
            WITH d AS (SELECT doc_id, n_chars FROM documents
                       WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
            bits AS (SELECT doc_id, n_chars,
                            sum((((n_chars >> i.i) & 1) << (2 * i.i))
                                + (((doc_id >> i.i) & 1) << (2 * i.i + 1)))
                                ::BIGINT AS zkey
                     FROM d, (SELECT unnest(generate_series(0, 19)) AS i) i
                     GROUP BY doc_id, n_chars)
            SELECT doc_id, zkey, (zkey >> 32)::BIGINT AS zbucket
            FROM bits""",
        # Distributed total-order sort rank over (n_chars, doc_id).
        "global_sort_rank": """
            SELECT doc_id, n_chars,
                   CAST(row_number() OVER (ORDER BY n_chars, doc_id)
                     AS BIGINT) AS global_rank
            FROM documents WHERE n_chars IS NOT NULL""",
        "salted_lang_chars": """
            SELECT lang, sum(n_chars)::BIGINT AS sum_chars
            FROM documents GROUP BY lang""",
        "drift_lang_by_source": """
            WITH t AS (SELECT COALESCE(source, '__null__') AS source,
                              COALESCE(lang, '__null__') AS lang
                       FROM documents),
            n AS (SELECT count(*) AS N FROM t),
            b AS (SELECT lang, count(*) AS bn FROM t GROUP BY lang),
            s AS (SELECT source, count(*) AS ns FROM t GROUP BY source),
            c AS (SELECT source, lang, count(*) AS cn
                  FROM t GROUP BY source, lang),
            grid AS (
              SELECT s.source, b.lang, b.bn, s.ns, COALESCE(c.cn, 0) AS cn
              FROM s CROSS JOIN b
              LEFT JOIN c ON c.source = s.source AND c.lang = b.lang),
            l AS (
              SELECT source,
                     CAST(sum(abs(cn * (SELECT N FROM n) - bn * ns)) AS BIGINT)
                       AS l1_num,
                     CAST(min(ns) * (SELECT N FROM n) AS BIGINT) AS denom
              FROM grid GROUP BY source)
            SELECT source, l1_num, denom,
                   (10 * l1_num > denom) AS drifted
            FROM l""",
        "validate_events_props": """
            SELECT event_id,
                   CASE WHEN props IS NULL THEN TRUE  -- null doc = absent (engine convention)
                        ELSE COALESCE(
                          json_valid(props)
                          AND json_extract(props, '$.k') IS NOT NULL
                          AND (json_type(json_extract(props, '$.k'))
                                 IN ('INTEGER','UBIGINT','BIGINT')
                               OR (json_type(json_extract(props, '$.k')) = 'DOUBLE'
                                   AND CAST(json_extract(props, '$.k') AS DOUBLE)
                                       = floor(CAST(json_extract(props, '$.k') AS DOUBLE))))
                          AND CAST(json_extract(props, '$.k') AS DOUBLE) BETWEEN 0 AND 50,
                          FALSE)
                   END AS valid
            FROM events""",
        "part_skyline": """
            WITH p AS (SELECT p_partkey,
                              CAST(round(p_retailprice * 100) AS BIGINT)
                                  AS price_cents,
                              CAST(p_size AS BIGINT) AS p_size
                       FROM part)
            SELECT a.p_partkey, a.price_cents, a.p_size
            FROM p a
            WHERE NOT EXISTS (
                SELECT 1 FROM p b
                WHERE b.price_cents <= a.price_cents
                  AND b.p_size >= a.p_size
                  AND (b.price_cents < a.price_cents
                       OR b.p_size > a.p_size))""",
        "lang_source_cube": """
            SELECT COALESCE(lang, '__all__') AS lang,
                   COALESCE(source, '__all__') AS source,
                   count(*)::BIGINT AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM (SELECT lang, source, n_chars FROM documents
                  WHERE lang IS NOT NULL AND source IS NOT NULL)
            GROUP BY CUBE (lang, source)""",
        "char_entropy_documents": """
            WITH d AS (SELECT doc_id, text FROM documents
                       WHERE text IS NOT NULL AND length(text) > 0),
            ch AS (SELECT doc_id, unnest(string_split_regex(text, '')) AS c
                   FROM d),
            cc AS (SELECT doc_id, c, count(*)::DOUBLE AS k
                   FROM ch GROUP BY doc_id, c),
            ag AS (SELECT doc_id,
                          CAST(sum(k) AS BIGINT) AS n_cp,
                          count(*)::BIGINT AS n_distinct,
                          sum(k * log2(k)) AS s
                   FROM cc GROUP BY doc_id)
            SELECT doc_id, n_cp, n_distinct,
                   CAST(floor((log2(CAST(n_cp AS DOUBLE))
                               - s / CAST(n_cp AS DOUBLE)) * 1000)
                        AS BIGINT) AS entropy_mbits
            FROM ag""",
        "q17_small_quantity_revenue": """
            WITH pk AS (SELECT p_partkey FROM part
                        WHERE p_brand = 'Brand#13'),
            li AS (SELECT l_partkey,
                          CAST(l_quantity AS BIGINT) AS q,
                          CAST(round(l_extendedprice * 100) AS BIGINT)
                              AS cents
                   FROM lineitem JOIN pk ON l_partkey = p_partkey),
            ag AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS sq,
                          count(*)::BIGINT AS cnt
                   FROM li GROUP BY l_partkey)
            SELECT count(*)::BIGINT AS n_li,
                   (CAST(COALESCE(sum(li.cents), 0) AS BIGINT) / 100.0)
                       / 7.0 AS avg_yearly
            FROM li JOIN ag ON li.l_partkey = ag.l_partkey
            WHERE 5 * li.q * ag.cnt < ag.sq""",
        "q13_customer_distribution": """
            WITH oc AS (
              SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
              FROM customer c LEFT JOIN orders o
                ON o.o_custkey = c.c_custkey
               AND o.o_orderpriority = '1-URGENT'
              GROUP BY c.c_custkey)
            SELECT c_count, count(*)::BIGINT AS custdist
            FROM oc GROUP BY c_count""",
        "q14_promo_revenue": """
            WITH li AS (
              SELECT l_partkey,
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l_discount) * 100) AS BIGINT)
                       AS rev
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-03-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'),
            ag AS (
              SELECT CAST(COALESCE(sum(CASE WHEN p.p_type = 'PROMO'
                                            THEN li.rev END), 0) AS BIGINT)
                         AS promo_rev_e4,
                     CAST(COALESCE(sum(li.rev), 0) AS BIGINT)
                         AS total_rev_e4
              FROM li LEFT JOIN part p ON li.l_partkey = p.p_partkey)
            SELECT promo_rev_e4, total_rev_e4,
                   CASE WHEN total_rev_e4 = 0 THEN 0
                        ELSE promo_rev_e4 * 1000000 // total_rev_e4
                   END AS promo_ppm
            FROM ag""",
        "q22_no_order_customers": """
            WITH c AS (SELECT c_custkey, c_mktsegment,
                              CAST(round(c_acctbal * 100) AS BIGINT)
                                  AS cents
                       FROM customer),
            thr AS (SELECT CAST(COALESCE(sum(cents), 0) AS BIGINT) AS s,
                           count(*)::BIGINT AS n
                    FROM c WHERE cents > 0)
            SELECT c_mktsegment, count(*)::BIGINT AS n_cust,
                   CAST(sum(cents) AS BIGINT) AS sum_bal_cents
            FROM c, thr
            WHERE c.cents * thr.n > thr.s
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
            GROUP BY c_mktsegment""",
        "q10_returned_items": """
            WITH o AS (SELECT o_orderkey, o_custkey FROM orders
                       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                         AND o_orderdate < TIMESTAMP '1996-04-01'),
            li AS (SELECT l_orderkey,
                          CAST(round(l_extendedprice * 100) AS BIGINT)
                            * CAST(round((1 - l_discount) * 100) AS BIGINT)
                            AS rev
                   FROM lineitem WHERE l_returnflag = 'R'),
            percust AS (
              SELECT o.o_custkey AS c_custkey,
                     CAST(sum(li.rev) AS BIGINT) AS revenue_e4
              FROM li JOIN o ON li.l_orderkey = o.o_orderkey
              GROUP BY o.o_custkey),
            top AS (SELECT * FROM percust
                    ORDER BY revenue_e4 DESC, c_custkey LIMIT 20)
            SELECT t.c_custkey, c.c_name, n.n_name, t.revenue_e4
            FROM top t JOIN customer c ON t.c_custkey = c.c_custkey
            LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey""",
        "q7_volume_shipping": """
            WITH ln AS (
              SELECT s.s_nationkey AS sn, c.c_nationkey AS cn,
                     CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                     CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l.l_discount) * 100) AS BIGINT)
                       AS rev
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
              JOIN nation ns ON s.s_nationkey = ns.n_nationkey
              JOIN nation nc ON c.c_nationkey = nc.n_nationkey
              WHERE ns.n_name IN ('NATION_1', 'NATION_2')
                AND nc.n_name IN ('NATION_1', 'NATION_2')
                AND s.s_nationkey <> c.c_nationkey)
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   ln.l_year, CAST(sum(ln.rev) AS BIGINT) AS revenue_e4
            FROM ln JOIN nation ns ON ln.sn = ns.n_nationkey
                    JOIN nation nc ON ln.cn = nc.n_nationkey
            GROUP BY 1, 2, 3""",
        "ttr_documents": """
            WITH w AS (SELECT doc_id, unnest(string_split(text, ' '))
                              AS word
                       FROM documents WHERE text IS NOT NULL),
            tc AS (SELECT doc_id, count(*)::BIGINT AS n_tokens
                   FROM w GROUP BY doc_id),
            ty AS (SELECT doc_id, word, count(*)::BIGINT AS k
                   FROM w GROUP BY doc_id, word),
            ag AS (SELECT doc_id, count(*)::BIGINT AS n_types,
                          CAST(COALESCE(sum(CASE WHEN k = 1 THEN 1 END),
                                        0) AS BIGINT) AS n_hapax
                   FROM ty GROUP BY doc_id)
            SELECT tc.doc_id, tc.n_tokens, ag.n_types, ag.n_hapax,
                   ag.n_types * 1000000 // tc.n_tokens AS ttr_ppm
            FROM tc JOIN ag USING (doc_id)""",
        "max_token_run_documents": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents WHERE text IS NOT NULL),
            pos AS (SELECT doc_id, unnest(range(len(ws))) AS i,
                           unnest(ws) AS word FROM w),
            marked AS (SELECT doc_id, i, word,
                              CASE WHEN lag(word) OVER (
                                       PARTITION BY doc_id ORDER BY i)
                                   IS DISTINCT FROM word
                                   THEN 1 ELSE 0 END AS brk
                       FROM pos),
            runs AS (SELECT doc_id, i, word,
                            sum(brk) OVER (PARTITION BY doc_id
                                           ORDER BY i) AS rid
                     FROM marked),
            rl AS (SELECT doc_id, word, rid, count(*)::BIGINT AS rlen
                   FROM runs GROUP BY doc_id, word, rid),
            best AS (SELECT doc_id, max(rlen) AS max_run
                     FROM rl GROUP BY doc_id)
            SELECT rl.doc_id, CAST(b.max_run AS BIGINT) AS max_run,
                   min(rl.word) AS run_token
            FROM rl JOIN best b
              ON rl.doc_id = b.doc_id AND rl.rlen = b.max_run
            GROUP BY rl.doc_id, b.max_run""",
        "bloom_semi_join_orders": """
            SELECT o.o_orderpriority, count(*)::BIGINT AS n_orders,
                   CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_total_cents
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey
                            AND c.c_mktsegment = 'BUILDING')
            GROUP BY o.o_orderpriority""",
        "distinct_users_per_type": """
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
            FROM events
            WHERE event_type IS NOT NULL AND user_id IS NOT NULL
            GROUP BY event_type""",
        "q19_discounted_revenue": """
            WITH li AS (
              SELECT l.l_partkey,
                     CAST(l.l_quantity AS BIGINT) AS q,
                     CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l.l_discount) * 100) AS BIGINT)
                       AS rev,
                     p.p_brand, CAST(p.p_size AS BIGINT) AS p_size
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
            sel AS (SELECT rev FROM li
                    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
                           AND q BETWEEN 1 AND 11)
                       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 10
                           AND q BETWEEN 10 AND 20)
                       OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 15
                           AND q BETWEEN 20 AND 30))
            SELECT count(*)::BIGINT AS n_li,
                   CAST(COALESCE(sum(rev), 0) AS BIGINT) AS revenue_e4
            FROM sel""",
        "q12_late_shipments": """
            SELECT o.o_orderpriority,
                   CAST(COALESCE(sum(CASE WHEN l.l_shipdate >
                                 o.o_orderdate + INTERVAL 90 DAY
                                 THEN 1 END), 0) AS BIGINT) AS n_late,
                   CAST(COALESCE(sum(CASE WHEN l.l_shipdate <=
                                 o.o_orderdate + INTERVAL 90 DAY
                                 THEN 1 END), 0) AS BIGINT) AS n_ontime
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority""",
        "q8_market_share": """
            WITH ln AS (
              SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                     CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l.l_discount) * 100) AS BIGINT)
                       AS rev,
                     s.s_nationkey AS sn
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation nc ON c.c_nationkey = nc.n_nationkey
              JOIN region r ON nc.n_regionkey = r.r_regionkey
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
              WHERE r.r_name = 'AFRICA'),
            tk AS (SELECT n_nationkey FROM nation
                   WHERE n_name = 'NATION_5'),
            ag AS (SELECT o_year,
                          CAST(sum(rev) AS BIGINT) AS total_e4,
                          CAST(COALESCE(sum(CASE WHEN ln.sn =
                               (SELECT n_nationkey FROM tk)
                               THEN rev END), 0) AS BIGINT) AS nation_e4
                   FROM ln GROUP BY o_year)
            SELECT o_year, total_e4, nation_e4,
                   CASE WHEN total_e4 > 0
                        THEN nation_e4 * 1000000 // total_e4
                        ELSE 0 END AS share_ppm
            FROM ag""",
        "parts_supplier_diversity": """
            SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
                   count(DISTINCT l.l_suppkey)::BIGINT AS n_suppliers
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand, p.p_size""",
        "snapshot_diff_documents": """
            WITH v1 AS (SELECT doc_id, text, n_chars FROM documents),
            v2b AS (SELECT doc_id,
                           CASE WHEN doc_id % 5 = 0 THEN text || '!'
                                ELSE text END AS text,
                           CASE WHEN doc_id % 5 = 0 THEN n_chars + 1
                                ELSE n_chars END AS n_chars
                    FROM documents WHERE doc_id % 7 <> 0),
            v2 AS (SELECT * FROM v2b
                   UNION ALL
                   SELECT doc_id + 10000000, text, n_chars FROM v2b
                   WHERE doc_id % 11 = 0),
            tagged AS (
              SELECT CASE WHEN v1.doc_id IS NULL THEN 'added'
                          WHEN v2.doc_id IS NULL THEN 'removed'
                          WHEN v1.text IS DISTINCT FROM v2.text
                            OR v1.n_chars IS DISTINCT FROM v2.n_chars
                            THEN 'changed'
                          ELSE 'unchanged' END AS class
              FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
            SELECT class, count(*)::BIGINT AS n_docs
            FROM tagged GROUP BY class""",
        "q6_forecast_revenue": """
            WITH li AS (
              SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round(l_discount * 100) AS BIGINT) AS rev
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'
                AND l_quantity < 24
                AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7)
            SELECT count(*)::BIGINT AS n_li,
                   CAST(COALESCE(sum(rev), 0) AS BIGINT) AS revenue_e6
            FROM li""",
        "q15_top_supplier": """
            WITH rev AS (
              SELECT l_suppkey,
                     CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * CAST(round((1 - l_discount) * 100) AS BIGINT))
                          AS BIGINT) AS total_revenue_e4
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey)
            SELECT s.s_suppkey, s.s_name, r.total_revenue_e4
            FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
            WHERE r.total_revenue_e4 = (SELECT max(total_revenue_e4)
                                        FROM rev)""",
        "q18_large_volume_customers": """
            WITH big AS (
              SELECT l_orderkey,
                     CAST(sum(l_quantity) AS BIGINT) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(l_quantity) > 250)
            SELECT o.o_custkey AS c_custkey, c.c_name, o.o_orderkey,
                   CAST(round(o.o_totalprice * 100) AS BIGINT)
                       AS total_cents,
                   b.sum_qty
            FROM big b
            JOIN orders o ON b.l_orderkey = o.o_orderkey
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey""",
        "out_of_order_events": """
            WITH w AS (
              SELECT user_id, ts,
                     max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS prev_max
              FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL)
            SELECT user_id, count(*)::BIGINT AS n_events,
                   CAST(COALESCE(sum(CASE WHEN ts < prev_max THEN 1 END),
                                 0) AS BIGINT) AS n_late,
                   CAST(COALESCE(max(CASE WHEN ts < prev_max THEN
                                 epoch_us(prev_max) - epoch_us(ts) END),
                                 0) AS BIGINT) AS max_disorder_us
            FROM w GROUP BY user_id""",
        "sliding_distinct_users": """
            WITH hu AS (SELECT DISTINCT date_trunc('hour', ts) AS h,
                               user_id
                        FROM events
                        WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            hours AS (SELECT DISTINCT h FROM hu)
            SELECT h1.h AS hour_ts,
                   count(DISTINCT hu.user_id)::BIGINT AS n_users
            FROM hours h1 JOIN hu
              ON hu.h > h1.h - INTERVAL 24 HOUR AND hu.h <= h1.h
            GROUP BY h1.h""",
        "tfrecord_roundtrip": """
            SELECT lang, count(*)::BIGINT AS n_rows,
                   sum(doc_id)::BIGINT AS id_sum,
                   coalesce(sum(length(text)), 0)::BIGINT AS text_chars
            FROM documents GROUP BY lang""",
        "orc_roundtrip": """
            SELECT lang, count(*)::BIGINT AS n_rows,
                   sum(doc_id)::BIGINT AS id_sum,
                   coalesce(sum(length(text)), 0)::BIGINT AS text_chars
            FROM documents GROUP BY lang""",
        "feather_roundtrip": """
            SELECT lang, count(*)::BIGINT AS n_rows,
                   sum(doc_id)::BIGINT AS id_sum,
                   coalesce(sum(length(text)), 0)::BIGINT AS text_chars
            FROM documents GROUP BY lang""",
        "avro_roundtrip": """
            SELECT lang, count(*)::BIGINT AS n_rows,
                   sum(doc_id)::BIGINT AS id_sum,
                   coalesce(sum(length(text)), 0)::BIGINT AS text_chars
            FROM documents GROUP BY lang""",
        # CCNet-style bigram-LM cross-entropy: per-position add-one cost
        # floor(1000*(log2(ca+V)-log2(cab+1))) millibits is ONE identical
        # float expression per bigram on both sides; doc scores are sums
        # of those INTEGERS, so summation order can't move the hash
        "bigram_lm_perplexity": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents WHERE text IS NOT NULL),
            bg AS (SELECT doc_id, ws[CAST(i AS INTEGER)] AS w1,
                          ws[CAST(i AS INTEGER) + 1] AS w2
                   FROM (SELECT doc_id, ws,
                                unnest(generate_series(1, len(ws) - 1))
                                  AS i
                         FROM d WHERE len(ws) >= 2)),
            pc AS (SELECT w1, w2, count(*)::BIGINT AS cab
                   FROM bg GROUP BY 1, 2),
            cc AS (SELECT w1, sum(cab)::BIGINT AS ca FROM pc GROUP BY 1),
            vv AS (SELECT count(DISTINCT word)::BIGINT AS v
                   FROM (SELECT unnest(string_split(text, ' ')) AS word
                         FROM documents WHERE text IS NOT NULL)),
            sc AS (SELECT b.doc_id,
                          floor(1000 * (log2((cc.ca + vv.v)::DOUBLE)
                                        - log2((pc.cab + 1)::DOUBLE)))
                            ::BIGINT AS mb
                   FROM bg b JOIN pc USING (w1, w2)
                             JOIN cc USING (w1), vv)
            SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                   sum(mb)::BIGINT AS cost_mbits
            FROM sc GROUP BY doc_id""",
        # exact integer moments over cents-floored whole units; corr_ppm
        # is one fixed-order float64 expression evaluated identically
        "corr_quantity_price": """
            WITH m AS (
              SELECT l_returnflag, count(*)::BIGINT AS n,
                     sum(CAST(round(l_quantity * 100) AS BIGINT) // 100)
                       ::BIGINT AS sum_x,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         // 100)::BIGINT AS sum_y,
                     sum((CAST(round(l_quantity * 100) AS BIGINT) // 100)
                         * (CAST(round(l_extendedprice * 100) AS BIGINT)
                            // 100))::BIGINT AS sum_xy,
                     sum((CAST(round(l_quantity * 100) AS BIGINT) // 100)
                         * (CAST(round(l_quantity * 100) AS BIGINT)
                            // 100))::BIGINT AS sum_x2,
                     sum((CAST(round(l_extendedprice * 100) AS BIGINT)
                          // 100)
                         * (CAST(round(l_extendedprice * 100) AS BIGINT)
                            // 100))::BIGINT AS sum_y2
              FROM lineitem GROUP BY l_returnflag)
            SELECT l_returnflag, n, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
                   CASE WHEN sqrt((n::DOUBLE * sum_x2::DOUBLE
                                   - sum_x::DOUBLE * sum_x::DOUBLE)
                                  * (n::DOUBLE * sum_y2::DOUBLE
                                     - sum_y::DOUBLE * sum_y::DOUBLE)) > 0
                        THEN floor((1000000.0
                                    * (n::DOUBLE * sum_xy::DOUBLE
                                       - sum_x::DOUBLE * sum_y::DOUBLE))
                                   / sqrt((n::DOUBLE * sum_x2::DOUBLE
                                           - sum_x::DOUBLE
                                             * sum_x::DOUBLE)
                                          * (n::DOUBLE * sum_y2::DOUBLE
                                             - sum_y::DOUBLE
                                               * sum_y::DOUBLE)))::BIGINT
                        ELSE 0 END AS corr_ppm
            FROM m""",
        # per-label uncentered covariance grid over millionths-quantized
        # embeddings (the kmeans_quantized convention)
        "embedding_covariance_by_label": """
            WITH v AS (SELECT e.vec_id, e.label::BIGINT AS label,
                              i.range AS d,
                              round(e.embedding[i.range]::DOUBLE
                                    * 1000000)::BIGINT AS q
                       FROM embeddings e, range(1, 65) i)
            SELECT a.label, a.d AS d1, b.d AS d2,
                   sum(a.q * b.q)::BIGINT AS s_q12,
                   count(*)::BIGINT AS n_vecs
            FROM v a JOIN v b ON a.vec_id = b.vec_id
            GROUP BY 1, 2, 3""",
        # integer power iteration (2 unrolled rounds) in HUGEINT: matvec
        # against the global moment grid, max-|component| renormalization
        # to millionths with explicit-sign floor division, then the int64
        # projection — mirrors queries.pca_project_embeddings exactly
        "pca_project_embeddings": """
            WITH v AS (SELECT e.vec_id, i.range AS d,
                              round(e.embedding[i.range]::DOUBLE
                                    * 1000000)::BIGINT AS q
                       FROM embeddings e, range(1, 65) i),
            m AS (SELECT a.d AS d1, b.d AS d2,
                         sum(a.q::HUGEINT * b.q)::HUGEINT AS s
                  FROM v a JOIN v b ON a.vec_id = b.vec_id
                  GROUP BY 1, 2),
            w1 AS (SELECT d1 AS d,
                          sum(s * 1000000::HUGEINT)::HUGEINT AS w
                   FROM m GROUP BY d1),
            x1 AS (SELECT max(abs(w))::HUGEINT AS mx FROM w1),
            v1 AS (SELECT d,
                          (CASE WHEN w >= 0
                                THEN (abs(w) * 1000000::HUGEINT) // mx
                                ELSE -((abs(w) * 1000000::HUGEINT)
                                       // mx) END)::HUGEINT AS vc
                   FROM w1, x1),
            w2 AS (SELECT m.d1 AS d, sum(m.s * v1.vc)::HUGEINT AS w
                   FROM m JOIN v1 ON v1.d = m.d2 GROUP BY m.d1),
            x2 AS (SELECT max(abs(w))::HUGEINT AS mx FROM w2),
            v2 AS (SELECT d,
                          (CASE WHEN w >= 0
                                THEN (abs(w) * 1000000::HUGEINT) // mx
                                ELSE -((abs(w) * 1000000::HUGEINT)
                                       // mx) END)::HUGEINT AS vc
                   FROM w2, x2)
            SELECT v.vec_id, sum(v.q::HUGEINT * v2.vc)::BIGINT AS pc1_q
            FROM v JOIN v2 USING (d)
            GROUP BY v.vec_id""",
        # schema-on-read JSON extraction (integer-valued field contract:
        # the engine marks non-integer k invalid, the data is machine-
        # written flat {"k": int} documents)
        "events_props_extract": """
            SELECT event_type, count(*)::BIGINT AS n_events,
                   coalesce(sum(TRY_CAST(json_extract(props, '$.k')
                                         AS BIGINT)), 0)::BIGINT AS sum_k,
                   coalesce(min(TRY_CAST(json_extract(props, '$.k')
                                         AS BIGINT)), 0)::BIGINT AS min_k,
                   coalesce(max(TRY_CAST(json_extract(props, '$.k')
                                         AS BIGINT)), 0)::BIGINT AS max_k,
                   (count(*) - count(TRY_CAST(json_extract(props, '$.k')
                                              AS BIGINT)))::BIGINT
                     AS n_missing
            FROM events WHERE event_type IS NOT NULL
            GROUP BY event_type""",
        # LOCF gap-fill resample: hour observation = LAST event by
        # (ts, event_id); forward fill via last_value IGNORE NULLS
        "user_hourly_locf": """
            WITH e AS (SELECT user_id,
                              (epoch_us(ts) // 3600000000)::BIGINT AS h,
                              ts, event_id,
                              CAST(round(value * 100) AS BIGINT) AS cents
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND value IS NOT NULL),
            ob AS (SELECT user_id, h, cents FROM (
                     SELECT user_id, h, cents,
                            row_number() OVER (PARTITION BY user_id, h
                                ORDER BY ts DESC, event_id DESC) AS rn
                     FROM e) WHERE rn = 1),
            rng AS (SELECT user_id, min(h) AS h0, max(h) AS h1
                    FROM ob GROUP BY 1),
            grid AS (SELECT r.user_id,
                            unnest(generate_series(r.h0, r.h1)) AS h
                     FROM rng r),
            f AS (SELECT g.user_id, g.h, ob.cents,
                         (CASE WHEN ob.cents IS NOT NULL
                               THEN 1 ELSE 0 END)::BIGINT AS is_observed
                  FROM grid g LEFT JOIN ob USING (user_id, h))
            SELECT user_id, h AS hour_bucket,
                   (last_value(cents IGNORE NULLS) OVER (
                        PARTITION BY user_id ORDER BY h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                     ::BIGINT AS value_cents,
                   is_observed
            FROM f""",
        # CCNet selection: per-lang best-quartile by integer mean
        # millibits; cutoff = quantile_disc(0.25) (rank ceil(n/4))
        "perplexity_bucket_filter": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents WHERE text IS NOT NULL),
            bg AS (SELECT doc_id, ws[CAST(i AS INTEGER)] AS w1,
                          ws[CAST(i AS INTEGER) + 1] AS w2
                   FROM (SELECT doc_id, ws,
                                unnest(generate_series(1, len(ws) - 1))
                                  AS i
                         FROM d WHERE len(ws) >= 2)),
            pc AS (SELECT w1, w2, count(*)::BIGINT AS cab
                   FROM bg GROUP BY 1, 2),
            cc AS (SELECT w1, sum(cab)::BIGINT AS ca FROM pc GROUP BY 1),
            vv AS (SELECT count(DISTINCT word)::BIGINT AS v
                   FROM (SELECT unnest(string_split(text, ' ')) AS word
                         FROM documents WHERE text IS NOT NULL)),
            sc AS (SELECT b.doc_id,
                          floor(1000 * (log2((cc.ca + vv.v)::DOUBLE)
                                        - log2((pc.cab + 1)::DOUBLE)))
                            ::BIGINT AS mb
                   FROM bg b JOIN pc USING (w1, w2)
                             JOIN cc USING (w1), vv),
            s AS (SELECT doc_id, count(*)::BIGINT AS nb,
                         sum(mb)::BIGINT AS cost
                  FROM sc GROUP BY doc_id),
            sl AS (SELECT s.doc_id, dd.lang,
                          ((s.cost * 1000) // s.nb)::BIGINT AS mean_mbits
                   FROM s JOIN documents dd USING (doc_id)
                   WHERE dd.lang IS NOT NULL),
            cut AS (SELECT lang, quantile_disc(mean_mbits, 0.25) AS q
                    FROM sl GROUP BY lang)
            SELECT sl.doc_id, sl.lang, sl.mean_mbits
            FROM sl JOIN cut USING (lang)
            WHERE sl.mean_mbits <= cut.q""",
        # ledger reconciliation: exact e6 pricing formula vs header total;
        # orders with no line items surface via the LEFT JOIN coalesce
        "orders_reconciliation_audit": """
            WITH s AS (SELECT l_orderkey,
                              sum(CAST(round(l_extendedprice * 100)
                                       AS BIGINT)
                                  * CAST(round((1 - l_discount) * 100)
                                         AS BIGINT)
                                  * CAST(round((1 + l_tax) * 100)
                                         AS BIGINT))::BIGINT AS e6
                       FROM lineitem GROUP BY 1)
            SELECT o.o_orderstatus, count(*)::BIGINT AS n_orders,
                   sum(CASE WHEN s.e6 IS NULL THEN 1 ELSE 0 END)::BIGINT
                     AS n_no_lineitems,
                   sum(CASE WHEN coalesce(
                            s.e6 - CAST(round(o.o_totalprice * 100)
                                        AS BIGINT) * 10000,
                            CAST(round(o.o_totalprice * 100)
                                 AS BIGINT) * 10000) != 0
                        THEN 1 ELSE 0 END)::BIGINT AS n_mismatched,
                   sum(abs(coalesce(
                            s.e6 - CAST(round(o.o_totalprice * 100)
                                        AS BIGINT) * 10000,
                            CAST(round(o.o_totalprice * 100)
                                 AS BIGINT) * 10000)))::BIGINT
                     AS sum_absdiff_e6
            FROM orders o LEFT JOIN s ON s.l_orderkey = o.o_orderkey
            GROUP BY 1""",
        # debounce: keep first-or->=1h-after-PREDECESSOR (lag semantics)
        "throttled_events": """
            WITH e AS (SELECT user_id, event_type,
                              epoch_us(ts)::BIGINT AS us, event_id
                       FROM events
                       WHERE user_id IS NOT NULL
                         AND event_type IS NOT NULL AND ts IS NOT NULL),
            l AS (SELECT user_id, event_type, us,
                         lag(us) OVER (PARTITION BY user_id, event_type
                                       ORDER BY us, event_id) AS pus
                  FROM e)
            SELECT user_id, event_type, count(*)::BIGINT AS n_events,
                   sum(CASE WHEN pus IS NULL
                             OR us - pus >= 3600000000
                        THEN 1 ELSE 0 END)::BIGINT AS n_kept
            FROM l GROUP BY 1, 2""",
        # interpolated median in doubled units: lower+upper mid stays int
        "value_median_interp_by_type": """
            WITH c AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cents
                       FROM events
                       WHERE event_type IS NOT NULL AND value IS NOT NULL)
            SELECT event_type, count(*)::BIGINT AS n,
                   CAST(round(2 * quantile_cont(cents, 0.5)) AS BIGINT)
                     AS med2_cents
            FROM c GROUP BY event_type""",
        # PSI drift vs global, +1 smoothing over the global bucket domain;
        # per-bucket contribution is ONE identical float expression
        "psi_value_drift": """
            WITH c AS (SELECT event_type,
                              (CAST(round(value * 100) AS BIGINT) >> 8)
                                AS bucket
                       FROM events
                       WHERE event_type IS NOT NULL
                         AND value IS NOT NULL),
            g AS (SELECT event_type, bucket, count(*)::BIGINT AS na
                  FROM c GROUP BY 1, 2),
            gl AS (SELECT bucket, count(*)::BIGINT AS nb
                   FROM c GROUP BY 1),
            kk AS (SELECT count(*)::BIGINT AS k, sum(nb)::BIGINT AS nbt
                   FROM gl),
            ta AS (SELECT event_type, sum(na)::BIGINT AS nat
                   FROM g GROUP BY 1),
            f AS (SELECT t.event_type, b.bucket,
                         coalesce(g.na, 0)::BIGINT AS na, b.nb, ta.nat
                  FROM (SELECT DISTINCT event_type FROM c) t
                  CROSS JOIN gl b
                  LEFT JOIN g ON g.event_type = t.event_type
                             AND g.bucket = b.bucket
                  JOIN ta ON ta.event_type = t.event_type)
            SELECT event_type, bucket, na AS n_type, nb AS n_global,
                   floor(1000000.0
                         * (((na + 1.0) / (nat + kk.k)
                             - (nb + 1.0) / (kk.nbt + kk.k))
                            * (log2((na + 1.0) * (kk.nbt + kk.k))
                               - log2((nb + 1.0) * (nat + kk.k)))))
                     ::BIGINT AS psi_contrib_micro
            FROM f, kk""",
        # PMI collocations: floor-millibits of one identical expression
        "pmi_top_pairs": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents WHERE text IS NOT NULL),
            bg AS (SELECT ws[CAST(i AS INTEGER)] AS w1,
                          ws[CAST(i AS INTEGER) + 1] AS w2
                   FROM (SELECT doc_id, ws,
                                unnest(generate_series(1, len(ws) - 1))
                                  AS i
                         FROM d WHERE len(ws) >= 2)),
            p AS (SELECT w1, w2, count(*)::BIGINT AS c
                  FROM bg GROUP BY 1, 2),
            nt AS (SELECT sum(c)::BIGINT AS n FROM p),
            ca AS (SELECT w1, sum(c)::BIGINT AS a FROM p GROUP BY 1),
            cb AS (SELECT w2, sum(c)::BIGINT AS b FROM p GROUP BY 1),
            s AS (SELECT p.w1, p.w2, p.c AS pair_count,
                         floor(1000.0 * (log2(p.c::DOUBLE * nt.n)
                                         - log2(ca.a::DOUBLE * cb.b)))
                           ::BIGINT AS pmi_mbits
                  FROM p JOIN ca USING (w1) JOIN cb USING (w2), nt
                  WHERE p.c >= 5)
            SELECT w1, w2, pair_count, pmi_mbits FROM s
            ORDER BY pmi_mbits DESC, w1, w2 LIMIT 40""",
        # CCNet-style normalized exact dedup: min doc_id per normalized form
        "normalized_exact_dedup": """
            SELECT min(doc_id)::BIGINT AS doc_id
            FROM documents
            GROUP BY trim(regexp_replace(regexp_replace(lower(text),
                                                        '[^a-z ]', '', 'g'),
                                         ' +', ' ', 'g'), ' ')""",
        # exact integer winsorization: percentile_disc p5/p95 per type
        "winsorize_events": """
            WITH v AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS c
                       FROM events
                       WHERE event_type IS NOT NULL
                         AND value IS NOT NULL),
            th AS (SELECT event_type, count(*)::BIGINT AS n,
                          percentile_disc(0.05)
                            WITHIN GROUP (ORDER BY c)::BIGINT AS lo_cents,
                          percentile_disc(0.95)
                            WITHIN GROUP (ORDER BY c)::BIGINT AS hi_cents
                   FROM v GROUP BY event_type)
            SELECT th.event_type, th.n, th.lo_cents, th.hi_cents,
                   sum(least(greatest(v.c, th.lo_cents),
                             th.hi_cents))::BIGINT AS sum_clipped_cents
            FROM v JOIN th USING (event_type)
            GROUP BY th.event_type, th.n, th.lo_cents, th.hi_cents""",
        # tokenizer fertility: BPE-ish tokens per whitespace word, exact ppm
        "token_fertility_by_lang": """
            WITH t AS (SELECT lang,
                              CASE WHEN length(text) = 0 THEN 0
                                   ELSE length(text)
                                        - length(replace(text, ' ', ''))
                                        + 1 END::BIGINT AS w,
                              COALESCE(len(regexp_extract_all(
                                  text, '\\w+|[^\\w\\s]')), 0)::BIGINT AS bpe
                       FROM documents
                       WHERE lang IS NOT NULL AND text IS NOT NULL)
            SELECT lang, count(*)::BIGINT AS n_docs,
                   sum(w)::BIGINT AS sum_words,
                   sum(bpe)::BIGINT AS sum_bpe,
                   (CASE WHEN sum(w) > 0
                         THEN (1000000::HUGEINT * sum(bpe)) // sum(w)
                         ELSE 0 END)::BIGINT AS fertility_ppm
            FROM t GROUP BY lang""",
        # curriculum binning: NTILE(4) by token count within source
        "curriculum_bins": """
            WITH t AS (SELECT doc_id, source,
                              CASE WHEN length(text) = 0 THEN 0
                                   ELSE length(text)
                                        - length(replace(text, ' ', ''))
                                        + 1 END::BIGINT AS tok
                       FROM documents
                       WHERE source IS NOT NULL AND text IS NOT NULL),
            b AS (SELECT source, tok,
                         NTILE(4) OVER (PARTITION BY source
                                        ORDER BY tok, doc_id)::BIGINT
                           AS bin
                  FROM t)
            SELECT source, bin, count(*)::BIGINT AS n_docs,
                   sum(tok)::BIGINT AS sum_tokens
            FROM b GROUP BY source, bin""",
        # grouped integer OLS: explicit-sign HUGEINT floor division
        "ols_value_on_hour": """
            WITH e AS (SELECT event_type,
                              ((epoch_us(ts) // 3600000000)
                               - 490000)::BIGINT AS h,
                              CAST(round(value * 100) AS BIGINT) AS y
                       FROM events
                       WHERE event_type IS NOT NULL AND ts IS NOT NULL
                         AND value IS NOT NULL),
            m AS (SELECT event_type, count(*)::HUGEINT AS n,
                         sum(h)::HUGEINT AS sh, sum(y)::HUGEINT AS sy,
                         sum(h::HUGEINT * h)::HUGEINT AS shh,
                         sum(h::HUGEINT * y)::HUGEINT AS shy
                  FROM e GROUP BY event_type)
            SELECT event_type, n::BIGINT AS n, sh::BIGINT AS sum_h,
                   sy::BIGINT AS sum_y,
                   (CASE WHEN (n * shh - sh * sh) = 0 THEN 0
                         WHEN (n * shy - sh * sy) >= 0
                         THEN (1000000::HUGEINT * (n * shy - sh * sy))
                              // (n * shh - sh * sh)
                         ELSE -((1000000::HUGEINT * (sh * sy - n * shy))
                                // (n * shh - sh * sh))
                    END)::BIGINT AS slope_ppm
            FROM m""",
        # label-conflict audit: same exact text under >= 2 distinct langs
        "label_conflict_audit": """
            WITH c AS (SELECT text FROM documents
                       WHERE text IS NOT NULL AND lang IS NOT NULL
                       GROUP BY text HAVING count(DISTINCT lang) >= 2)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN c USING (text)
            WHERE d.lang IS NOT NULL""",
        # Welch t^2 pre/post a fixed cutoff; DOUBLE from identical int
        # moments in the identical operation order (compared at 6 dp)
        "ab_test_value_audit": """
            WITH e AS (SELECT event_type,
                              epoch_us(ts) AS us,
                              CAST(round(value * 100) AS BIGINT) AS y
                       FROM events
                       WHERE event_type IS NOT NULL AND ts IS NOT NULL
                         AND value IS NOT NULL),
            m AS (SELECT event_type,
                         sum(CASE WHEN us < 1705363200000000
                                  THEN 1 ELSE 0 END)::BIGINT AS n_a,
                         sum(CASE WHEN us < 1705363200000000
                                  THEN y ELSE 0 END)::BIGINT AS sum_a,
                         sum(CASE WHEN us < 1705363200000000
                                  THEN y * y ELSE 0 END)::BIGINT AS ss_a,
                         sum(CASE WHEN us >= 1705363200000000
                                  THEN 1 ELSE 0 END)::BIGINT AS n_b,
                         sum(CASE WHEN us >= 1705363200000000
                                  THEN y ELSE 0 END)::BIGINT AS sum_b,
                         sum(CASE WHEN us >= 1705363200000000
                                  THEN y * y ELSE 0 END)::BIGINT AS ss_b
                  FROM e GROUP BY event_type)
            SELECT event_type, n_a, sum_a, n_b, sum_b,
                   (CASE WHEN n_a > 0 AND n_b > 0
                              AND ((ss_a::DOUBLE / n_a
                                    - (sum_a::DOUBLE / n_a)
                                      * (sum_a::DOUBLE / n_a)) / n_a
                                   + (ss_b::DOUBLE / n_b
                                      - (sum_b::DOUBLE / n_b)
                                        * (sum_b::DOUBLE / n_b)) / n_b)
                                  > 0
                         THEN (sum_a::DOUBLE / n_a - sum_b::DOUBLE / n_b)
                              * (sum_a::DOUBLE / n_a - sum_b::DOUBLE / n_b)
                              / ((ss_a::DOUBLE / n_a
                                  - (sum_a::DOUBLE / n_a)
                                    * (sum_a::DOUBLE / n_a)) / n_a
                                 + (ss_b::DOUBLE / n_b
                                    - (sum_b::DOUBLE / n_b)
                                      * (sum_b::DOUBLE / n_b)) / n_b)
                         ELSE 0.0 END) AS t2
            FROM m""",
        # exact inter-arrival quantiles: LAG diffs + percentile_disc
        "inter_event_gap_quantiles": """
            WITH o AS (SELECT user_id, epoch_us(ts) AS us,
                              lag(epoch_us(ts)) OVER
                                (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            g AS (SELECT ((us - prev) // 1000000)::BIGINT AS gap_s
                  FROM o WHERE prev IS NOT NULL)
            SELECT count(*)::BIGINT AS n_gaps,
                   percentile_disc(0.50)
                     WITHIN GROUP (ORDER BY gap_s)::BIGINT AS p50_s,
                   percentile_disc(0.90)
                     WITHIN GROUP (ORDER BY gap_s)::BIGINT AS p90_s,
                   percentile_disc(0.99)
                     WITHIN GROUP (ORDER BY gap_s)::BIGINT AS p99_s
            FROM g""",
        # last-touch attribution: IGNORE NULLS last_value lag window
        "last_touch_attribution": """
            WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
                              event_id
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_type IS NOT NULL),
            w AS (SELECT event_type, us,
                         last_value(CASE WHEN event_type IN
                                         ('view', 'click')
                                         THEN event_type END IGNORE NULLS)
                           OVER (PARTITION BY user_id
                                 ORDER BY us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS touch_type,
                         last_value(CASE WHEN event_type IN
                                         ('view', 'click')
                                         THEN us END IGNORE NULLS)
                           OVER (PARTITION BY user_id
                                 ORDER BY us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS touch_us
                  FROM e)
            SELECT CASE WHEN touch_us IS NOT NULL
                             AND us - touch_us <= 3600000000
                        THEN touch_type ELSE 'none' END AS attributed,
                   count(*)::BIGINT AS n_purchases
            FROM w WHERE event_type = 'purchase'
            GROUP BY 1""",
        # k-anonymity: quasi-identifier cells under the K=5 threshold
        "k_anonymity_audit": """
            SELECT lang, source, (n_chars // 100)::BIGINT AS bucket,
                   count(*)::BIGINT AS n
            FROM documents
            WHERE lang IS NOT NULL AND source IS NOT NULL
              AND n_chars IS NOT NULL
            GROUP BY 1, 2, 3 HAVING count(*) < 5""",
        # schema induction: draft-07 constraint candidates from profiling
        "suggest_constraints_documents": """
            SELECT 'doc_id' AS column_name, 'minimum' AS keyword,
                   CAST(min(doc_id) AS VARCHAR) AS value FROM documents
            UNION ALL
            SELECT 'doc_id', 'maximum', CAST(max(doc_id) AS VARCHAR)
              FROM documents
            UNION ALL
            SELECT 'n_chars', 'minimum', CAST(min(n_chars) AS VARCHAR)
              FROM documents
            UNION ALL
            SELECT 'n_chars', 'maximum', CAST(max(n_chars) AS VARCHAR)
              FROM documents
            UNION ALL
            SELECT 'text', 'minLength',
                   CAST(min(length(text)) AS VARCHAR) FROM documents
            UNION ALL
            SELECT 'lang', 'enum',
                   string_agg(DISTINCT lang, ',' ORDER BY lang)
              FROM documents WHERE lang IS NOT NULL
            HAVING count(DISTINCT lang) BETWEEN 1 AND 32
            UNION ALL
            SELECT 'source', 'enum',
                   string_agg(DISTINCT source, ',' ORDER BY source)
              FROM documents WHERE source IS NOT NULL
            HAVING count(DISTINCT source) BETWEEN 1 AND 32""",
        # grouped mode with the explicit (count desc, value asc) tie rule
        "value_mode_by_type": """
            WITH v AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS c
                       FROM events
                       WHERE event_type IS NOT NULL
                         AND value IS NOT NULL),
            h AS (SELECT event_type, c, count(*)::BIGINT AS cnt
                  FROM v GROUP BY event_type, c),
            r AS (SELECT event_type, c, cnt,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY cnt DESC, c ASC)
                           AS rk,
                         sum(cnt) OVER (PARTITION BY event_type)
                           AS n_total
                  FROM h)
            SELECT event_type, c AS mode_cents, cnt AS n_mode,
                   n_total::BIGINT AS n_total
            FROM r WHERE rk = 1""",
        # top-20 user-journey trigrams: LEAD x 2 window
        "session_path_trigrams": """
            WITH e AS (SELECT user_id, event_type, ts, event_id
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_type IS NOT NULL),
            w AS (SELECT event_type AS t1,
                         lead(event_type, 1) OVER
                           (PARTITION BY user_id
                            ORDER BY ts, event_id) AS t2,
                         lead(event_type, 2) OVER
                           (PARTITION BY user_id
                            ORDER BY ts, event_id) AS t3
                  FROM e)
            SELECT t1, t2, t3, count(*)::BIGINT AS cnt
            FROM w WHERE t2 IS NOT NULL AND t3 IS NOT NULL
            GROUP BY t1, t2, t3
            ORDER BY cnt DESC, t1, t2, t3 LIMIT 20""",
        # fulfillment latency: exact day-quantiles over an order join
        "order_fulfillment_latency": """
            WITH j AS (SELECT o.o_orderpriority AS pri,
                              (l.l_shipdate::DATE
                               - o.o_orderdate::DATE)::BIGINT AS d
                       FROM lineitem l
                       JOIN orders o ON l.l_orderkey = o.o_orderkey)
            SELECT pri AS o_orderpriority, count(*)::BIGINT AS n,
                   percentile_disc(0.5)
                     WITHIN GROUP (ORDER BY d)::BIGINT AS p50_days,
                   percentile_disc(0.9)
                     WITHIN GROUP (ORDER BY d)::BIGINT AS p90_days,
                   max(d)::BIGINT AS max_days
            FROM j GROUP BY pri""",
        # Markov transitions: LEAD window + exact floor-ppm rows
        "event_transition_matrix": """
            WITH e AS (SELECT user_id, event_type, ts, event_id
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_type IS NOT NULL),
            w AS (SELECT event_type AS t1,
                         lead(event_type) OVER
                           (PARTITION BY user_id
                            ORDER BY ts, event_id) AS t2
                  FROM e),
            p AS (SELECT t1, t2, count(*)::BIGINT AS n
                  FROM w WHERE t2 IS NOT NULL GROUP BY t1, t2),
            r AS (SELECT t1, sum(n)::HUGEINT AS tot FROM p GROUP BY t1)
            SELECT p.t1, p.t2, p.n,
                   ((1000000::HUGEINT * p.n) // r.tot)::BIGINT AS p_ppm
            FROM p JOIN r USING (t1)""",
        # revenue concentration: exact top-decile share, deterministic ties
        "revenue_pareto_share": """
            WITH pc AS (SELECT o_custkey,
                               sum(CAST(round(o_totalprice * 100)
                                        AS BIGINT))::BIGINT AS cents
                        FROM orders GROUP BY o_custkey),
            r AS (SELECT cents,
                         row_number() OVER (ORDER BY cents DESC,
                                            o_custkey ASC) AS rk
                  FROM pc),
            k AS (SELECT count(*)::BIGINT AS n,
                         ((count(*) * 10 + 99) // 100)::BIGINT AS topk
                  FROM pc)
            SELECT k.n AS n_customers, k.topk AS top_customers,
                   sum(CASE WHEN r.rk <= k.topk THEN r.cents
                            ELSE 0 END)::BIGINT AS top_cents,
                   sum(r.cents)::BIGINT AS total_cents,
                   ((1000000::HUGEINT *
                     sum(CASE WHEN r.rk <= k.topk THEN r.cents
                              ELSE 0 END))
                    // sum(r.cents))::BIGINT AS share_ppm
            FROM r, k GROUP BY k.n, k.topk""",
        # langid confusion matrix: the langid_documents heuristic, GROUP BYd
        "langid_confusion_matrix": f"""
            WITH {_LANGID_PRED_CTES}
            SELECT lang, lang_pred, count(*)::BIGINT AS n
            FROM p GROUP BY lang, lang_pred""",
        # churn: last event per user older than max(ts) - 36 hours
        "churned_users_by_last_event": """
            WITH e AS (SELECT user_id, event_type, ts, event_id
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_type IS NOT NULL),
            r AS (SELECT user_id, event_type, ts,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY ts DESC,
                                                     event_id DESC) AS rk
                  FROM e),
            mx AS (SELECT max(ts) AS m FROM events)
            SELECT r.event_type, count(*)::BIGINT AS n_churned
            FROM r, mx
            WHERE rk = 1 AND epoch_us(r.ts) < epoch_us(mx.m)
                                              - 36 * 3600000000
            GROUP BY r.event_type""",
        # duplicate-mass histogram: GROUP BY text sizes, then size counts
        "dup_cluster_size_histogram": """
            WITH g AS (SELECT count(*)::BIGINT AS group_size
                       FROM documents GROUP BY text)
            SELECT group_size, count(*)::BIGINT AS n_groups
            FROM g GROUP BY group_size""",
        "q2_best_supplier_per_part": """
            WITH rel AS (SELECT DISTINCT l_partkey, l_suppkey
                         FROM lineitem),
            el AS (SELECT s.s_suppkey, s.s_name,
                          CAST(round(s.s_acctbal * 100) AS BIGINT)
                            AS bal, n.n_name
                   FROM supplier s
                   JOIN nation n ON s.s_nationkey = n.n_nationkey
                   JOIN region r ON n.n_regionkey = r.r_regionkey
                   WHERE r.r_name = 'ASIA'),
            c AS (SELECT p.p_partkey, e.s_suppkey, e.s_name, e.n_name,
                         e.bal,
                         row_number() OVER (PARTITION BY p.p_partkey
                             ORDER BY e.bal DESC, e.s_suppkey) AS rn
                  FROM part p
                  JOIN rel ON p.p_partkey = rel.l_partkey
                  JOIN el e ON rel.l_suppkey = e.s_suppkey
                  WHERE p.p_size = 15)
            SELECT p_partkey, s_suppkey, s_name, n_name,
                   bal AS s_acctbal_cents
            FROM c WHERE rn = 1""",
        "q9_profit_by_nation_year": """
            SELECT n.n_name,
                   CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l.l_discount) * 100) AS BIGINT))
                       AS BIGINT) AS profit_e4
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE split_part(p.p_name, ' ', 2) = 'widget'
            GROUP BY 1, 2""",
        "q20_heavy_shippers": """
            WITH heavy AS (
              SELECT l_suppkey,
                     sum(CAST(round(l_quantity) AS BIGINT)) AS q
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
              WHERE p.p_name LIKE 'red %'
                AND l.l_shipdate >= TIMESTAMP '1997-01-01'
                AND l.l_shipdate < TIMESTAMP '1998-01-01'
              GROUP BY l_suppkey, l_partkey HAVING q > 60)
            SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
            FROM heavy h
            JOIN supplier s ON h.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey""",
        "q21_sole_blocker": """
            WITH li AS (
              SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE o.o_orderstatus = 'F'),
            g AS (SELECT l_orderkey, max(l_shipdate) AS mx,
                         count(DISTINCT l_suppkey) AS nd
                  FROM li GROUP BY 1),
            w AS (SELECT DISTINCT li.l_orderkey, li.l_suppkey
                  FROM li JOIN g USING (l_orderkey)
                  WHERE g.nd >= 2 AND li.l_shipdate = g.mx),
            solo AS (SELECT l_orderkey, min(l_suppkey) AS s
                     FROM w GROUP BY 1 HAVING count(*) = 1),
            cnt AS (SELECT s AS s_suppkey, count(*)::BIGINT AS numwait
                    FROM solo GROUP BY 1)
            SELECT c.s_suppkey, s.s_name, c.numwait
            FROM cnt c JOIN supplier s USING (s_suppkey)
            ORDER BY c.numwait DESC, c.s_suppkey LIMIT 20""",
        "ppjoin_near_dup_exact": """
            WITH docs AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id < 300 AND text IS NOT NULL AND length(text) >= 5),
            sh AS (
              SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 5) AS s
              FROM (SELECT doc_id, text,
                           unnest(generate_series(1, length(text) - 4)) AS i
                    FROM docs)),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT i.id_a, i.id_b,
                   round(i.ni * 1.0 / (sa.n + sb.n - i.ni), 6) AS jaccard
            FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
                         JOIN sizes sb ON sb.doc_id = i.id_b
            WHERE i.ni * 1.0 / (sa.n + sb.n - i.ni) >= 0.5""",
        "naive_bayes_langid": """
            WITH tr AS (SELECT doc_id, lang, text FROM documents
                        WHERE doc_id % 2 = 0 AND text IS NOT NULL
                          AND lang IS NOT NULL),
            te AS (SELECT doc_id, lang, text FROM documents
                   WHERE doc_id % 2 = 1 AND text IS NOT NULL
                     AND lang IS NOT NULL),
            tw AS (SELECT lang, unnest(string_split(text, ' ')) AS w
                   FROM tr),
            cw AS (SELECT lang, w, count(*)::BIGINT AS c
                   FROM tw GROUP BY 1, 2),
            cl AS (SELECT lang, count(*)::BIGINT AS ct FROM tw GROUP BY 1),
            v AS (SELECT count(DISTINCT w)::BIGINT AS v FROM tw),
            nl AS (SELECT lang, count(*)::BIGINT AS nd FROM tr GROUP BY 1),
            nt AS (SELECT count(*)::BIGINT AS n,
                          count(DISTINCT lang)::BIGINT AS l FROM tr),
            pr AS (SELECT nl.lang,
                          CAST(floor(1000 * (log2(nt.n + nt.l)
                               - log2(nl.nd + 1))) AS BIGINT) AS p
                   FROM nl CROSS JOIN nt),
            ew AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                   FROM te),
            wc AS (SELECT e.doc_id, l.lang,
                          CAST(floor(1000 * (log2(l.ct + v.v)
                               - log2(COALESCE(c.c, 0) + 1)))
                               AS BIGINT) AS cost
                   FROM ew e CROSS JOIN v CROSS JOIN cl l
                   LEFT JOIN cw c ON c.lang = l.lang AND c.w = e.w),
            tot AS (SELECT doc_id, lang, sum(cost)::BIGINT AS c
                    FROM wc GROUP BY 1, 2),
            sc AS (SELECT t.doc_id, t.lang, t.c + pr.p AS cost
                   FROM tot t JOIN pr ON t.lang = pr.lang),
            pred AS (SELECT doc_id, lang AS pred_lang FROM (
                       SELECT doc_id, lang,
                              row_number() OVER (PARTITION BY doc_id
                                  ORDER BY cost, lang) AS rn
                       FROM sc) WHERE rn = 1)
            SELECT te.lang, p.pred_lang, count(*)::BIGINT AS n_docs
            FROM te JOIN pred p USING (doc_id)
            GROUP BY 1, 2""",
        "edit_distance_pairs_documents": """
            WITH d AS (SELECT doc_id, text FROM documents
                       WHERE doc_id < 200 AND text IS NOT NULL)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(levenshtein(a.text, b.text) AS BIGINT)
                     AS edit_distance
            FROM d a JOIN d b ON a.doc_id < b.doc_id
            WHERE levenshtein(a.text, b.text) <= 10""",
        "record_linkage_clusters": """
            WITH RECURSIVE d AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id < 200 AND text IS NOT NULL),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM d a JOIN d b ON a.doc_id < b.doc_id
              WHERE levenshtein(a.text, b.text) <= 10),
            edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            lab(node, label) AS (
              SELECT a, a FROM (SELECT DISTINCT a FROM edges)
              UNION
              SELECT e.a, l.label FROM edges e JOIN lab l ON l.node = e.b)
            SELECT CAST(node AS BIGINT) AS doc_id,
                   CAST(min(label) AS BIGINT) AS cluster_id
            FROM lab GROUP BY node""",
        "pagerank_customer_supplier": _pagerank_sql(4),
        "triangle_parts_copurchase": """
            WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM lineitem),
            e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                  FROM lp x JOIN lp y ON x.l_orderkey = y.l_orderkey
                                     AND x.l_partkey < y.l_partkey),
            tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                    FROM e e1 JOIN e e2 ON e2.a = e1.b
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
            nodes AS (SELECT x AS node FROM tri
                      UNION ALL SELECT y FROM tri
                      UNION ALL SELECT z FROM tri),
            cnt AS (SELECT node, count(*)::BIGINT AS n_triangles
                    FROM nodes GROUP BY node),
            top AS (SELECT node, n_triangles,
                           row_number() OVER (ORDER BY n_triangles DESC,
                                              node) AS rk
                    FROM cnt)
            SELECT CAST(node AS BIGINT) AS part_key, n_triangles,
                   CAST(rk AS BIGINT) AS rk
            FROM top WHERE rk <= 15""",
        "hits_trade_graph": _hits_sql(2),
        "lpa_communities_trade": _lpa_sql(3),
        "kcore_trade_graph": _kcore_sql(12, 3),
        "bfs_hops_trade": _bfs_sql(6),
        "perceptron_train_langid": _perceptron_sql(3),
        "weighted_pagerank_trade": _weighted_pagerank_sql(3),
        "score_trade_graph": _score_sql(32, 3),
        "events_ewma_anomaly": """
            WITH RECURSIVE hrs AS (
              SELECT event_type,
                     (epoch_us(ts) // 3600000000)::BIGINT AS hour_bucket,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2),
            ord AS (SELECT event_type, hour_bucket, n,
                           row_number() OVER (PARTITION BY event_type
                                              ORDER BY hour_bucket)
                             AS rn
                    FROM hrs),
            ew(event_type, rn, hour_bucket, n, e, a) AS (
              SELECT event_type, rn, hour_bucket, n,
                     n * 1000, 0::BIGINT
              FROM ord WHERE rn = 1
              UNION ALL
              SELECT o.event_type, o.rn, o.hour_bucket, o.n,
                     (250 * o.n * 1000 + 750 * ew.e) // 1000,
                     (CASE WHEN 2 * abs(o.n * 1000 - ew.e) > ew.e
                           THEN 1 ELSE 0 END)::BIGINT
              FROM ew JOIN ord o
                ON o.event_type = ew.event_type AND o.rn = ew.rn + 1)
            SELECT event_type, hour_bucket, n AS n_events,
                   e::BIGINT AS ewma_milli, a::BIGINT AS is_anomaly
            FROM ew""",
        "hapax_ratio_by_source": """
            WITH wc AS (
              SELECT source, word, count(*)::BIGINT AS n
              FROM (SELECT source,
                           unnest(string_split(text, ' ')) AS word
                    FROM documents
                    WHERE text IS NOT NULL AND source IS NOT NULL)
              GROUP BY source, word)
            SELECT source,
                   count(*)::BIGINT AS n_distinct,
                   (count(*) FILTER (n = 1))::BIGINT AS n_hapax,
                   ((1000000 * count(*) FILTER (n = 1)) // count(*))
                     ::BIGINT AS hapax_ppm
            FROM wc GROUP BY source ORDER BY source""",
        "quantile_normalize_chars": """
            WITH f AS (SELECT doc_id, source, n_chars::BIGINT AS chars
                       FROM documents
                       WHERE source IS NOT NULL
                         AND n_chars IS NOT NULL),
            r AS (SELECT doc_id, chars,
                         row_number() OVER (PARTITION BY source
                                            ORDER BY chars, doc_id)
                           ::BIGINT AS r,
                         (count(*) OVER (PARTITION BY source))::BIGINT
                           AS ns
                  FROM f),
            n AS (SELECT count(*)::BIGINT AS nn FROM f),
            gl AS (SELECT chars,
                          row_number() OVER (ORDER BY chars, doc_id)
                            ::BIGINT AS gr
                   FROM f)
            SELECT r.doc_id, r.chars AS n_chars,
                   gl.chars AS qnorm_chars
            FROM r CROSS JOIN n
            JOIN gl ON gl.gr = (r.r * n.nn + r.ns - 1) // r.ns""",
        "event_burstiness_fano": """
            WITH hrs AS (
              SELECT event_type,
                     (epoch_us(ts) // 3600000000)::BIGINT AS hour_bucket,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2)
            SELECT event_type,
                   count(*)::BIGINT AS n_hours,
                   sum(n)::BIGINT AS n_events,
                   CAST((1000000::HUGEINT
                         * (count(*) * sum(n * n) - sum(n) * sum(n)))
                        // (count(*) * sum(n)) AS BIGINT) AS fano_ppm
            FROM hrs GROUP BY event_type ORDER BY event_type""",
        "bpe_train_merges": _bpe_sql(3),
        "clustering_coeff_parts": """
            WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM lineitem),
            e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                  FROM lp x JOIN lp y ON x.l_orderkey = y.l_orderkey
                                     AND x.l_partkey < y.l_partkey),
            tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                    FROM e e1 JOIN e e2 ON e2.a = e1.b
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
            cnt AS (SELECT node, count(*)::BIGINT AS n_triangles
                    FROM (SELECT x AS node FROM tri
                          UNION ALL SELECT y FROM tri
                          UNION ALL SELECT z FROM tri)
                    GROUP BY node),
            deg AS (SELECT node, count(*)::BIGINT AS deg
                    FROM (SELECT a AS node FROM e
                          UNION ALL SELECT b FROM e)
                    GROUP BY node),
            cc AS (SELECT d.node, d.deg,
                          coalesce(c.n_triangles, 0)::BIGINT AS tri,
                          (2000000 * coalesce(c.n_triangles, 0))
                            // (d.deg * (d.deg - 1)) AS cc_ppm
                   FROM deg d LEFT JOIN cnt c ON c.node = d.node
                   WHERE d.deg >= 2),
            top AS (SELECT node, deg, tri, cc_ppm,
                           row_number() OVER (ORDER BY cc_ppm DESC,
                                              node) AS rk
                    FROM cc)
            SELECT CAST(node AS BIGINT) AS part_key,
                   deg, tri AS n_triangles,
                   CAST(cc_ppm AS BIGINT) AS cc_ppm,
                   CAST(rk AS BIGINT) AS rk
            FROM top WHERE rk <= 15""",
        "containment_pairs_documents": """
            WITH docs AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id < 300 AND text IS NOT NULL
                AND length(text) >= 5),
            sh AS (
              SELECT DISTINCT doc_id,
                     substr(text, CAST(i AS INTEGER), 5) AS s
              FROM (SELECT doc_id, text,
                           unnest(generate_series(1, length(text) - 4))
                             AS i
                    FROM docs)),
            sizes AS (SELECT doc_id, count(*)::BIGINT AS n
                      FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_src, b.doc_id AS id_dst,
                     count(*)::BIGINT AS ni
              FROM sh a JOIN sh b
                ON a.s = b.s AND a.doc_id <> b.doc_id
              GROUP BY 1, 2)
            SELECT i.id_src, i.id_dst, i.ni AS n_inter,
                   s.n AS n_src,
                   (1000000 * i.ni) // s.n AS cont_ppm
            FROM inter i JOIN sizes s ON s.doc_id = i.id_src
            WHERE (1000000 * i.ni) // s.n >= 800000
            ORDER BY id_src, id_dst""",
        "jl_project_embeddings": """
            WITH v AS (SELECT e.vec_id, i.range AS d,
                              round(e.embedding[i.range]::DOUBLE
                                    * 1000000)::BIGINT AS q
                       FROM embeddings e, range(1, 65) i),
            s AS (SELECT d.range AS d, k.range AS k,
                         CASE WHEN ((d.range * 2654435761
                                     + k.range * 97) % 1000003) % 2 = 0
                              THEN 1 ELSE -1 END::BIGINT AS sgn
                  FROM range(1, 65) d, range(1, 9) k),
            p AS (SELECT v.vec_id, s.k,
                         sum(v.q * s.sgn)::BIGINT AS p
                  FROM v JOIN s ON s.d = v.d GROUP BY 1, 2)
            SELECT vec_id,
                   CAST(max(CASE WHEN k = 1 THEN p END) AS BIGINT) AS p1,
                   CAST(max(CASE WHEN k = 2 THEN p END) AS BIGINT) AS p2,
                   CAST(max(CASE WHEN k = 3 THEN p END) AS BIGINT) AS p3,
                   CAST(max(CASE WHEN k = 4 THEN p END) AS BIGINT) AS p4,
                   CAST(max(CASE WHEN k = 5 THEN p END) AS BIGINT) AS p5,
                   CAST(max(CASE WHEN k = 6 THEN p END) AS BIGINT) AS p6,
                   CAST(max(CASE WHEN k = 7 THEN p END) AS BIGINT) AS p7,
                   CAST(max(CASE WHEN k = 8 THEN p END) AS BIGINT) AS p8
            FROM p GROUP BY vec_id ORDER BY vec_id""",
        "value_gini_by_type": """
            WITH x AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cents
                       FROM events),
            r AS (SELECT event_type, cents,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY cents) AS rk
                  FROM x),
            g AS (SELECT event_type, count(*)::BIGINT AS n,
                         sum(cents) AS s, sum(rk * cents) AS s1
                  FROM r GROUP BY event_type)
            SELECT event_type,
                   CAST(n AS BIGINT) AS n_events,
                   CAST(s AS BIGINT) AS sum_cents,
                   CAST((1000000 * (2 * s1 - (n + 1) * s)) // (n * s)
                        AS BIGINT) AS gini_ppm
            FROM g ORDER BY event_type""",
        "assortativity_trade_graph": """
            WITH pairs AS (
              SELECT DISTINCT o.o_custkey * 2 AS c_node,
                              l.l_suppkey * 2 + 1 AS s_node
              FROM lineitem l JOIN orders o
                ON l.l_orderkey = o.o_orderkey),
            edges AS (SELECT c_node AS src, s_node AS dst FROM pairs
                      UNION ALL SELECT s_node, c_node FROM pairs),
            deg AS (SELECT src AS node, count(*)::BIGINT AS deg
                    FROM edges GROUP BY src),
            mm AS (SELECT count(*)::BIGINT AS m,
                          sum(d1.deg * d2.deg)::BIGINT AS sjk,
                          sum(d1.deg)::BIGINT AS sj,
                          sum(d1.deg * d1.deg)::BIGINT AS sj2
                   FROM edges e
                   JOIN deg d1 ON d1.node = e.src
                   JOIN deg d2 ON d2.node = e.dst)
            SELECT m AS n_edges, sjk AS sum_jk, sj AS sum_j,
                   sj2 AS sum_j2,
                   (m * sjk - sj * sj) AS assort_num,
                   (m * sj2 - sj * sj) AS assort_den,
                   CAST(CASE WHEN m * sj2 - sj * sj = 0 THEN 0
                        ELSE (1000000::HUGEINT * (m * sjk - sj * sj))
                             // (m * sj2 - sj * sj) END
                        AS BIGINT) AS r_ppm
            FROM mm""",
        "source_vocab_overlap": """
            WITH w AS (
              SELECT DISTINCT source, word
              FROM (SELECT source, unnest(string_split(text, ' ')) AS word
                    FROM documents
                    WHERE text IS NOT NULL AND source IS NOT NULL)),
            sz AS (SELECT source, count(*)::BIGINT AS n
                   FROM w GROUP BY source),
            inter AS (SELECT a.source AS sa, b.source AS sb,
                             count(*)::BIGINT AS ni
                      FROM w a JOIN w b
                        ON a.word = b.word AND a.source < b.source
                      GROUP BY a.source, b.source)
            SELECT i.sa AS source_a, i.sb AS source_b,
                   i.ni AS n_inter,
                   (x.n + y.n - i.ni) AS n_union,
                   (1000000 * i.ni) // (x.n + y.n - i.ni) AS jaccard_ppm
            FROM inter i
            JOIN sz x ON x.source = i.sa
            JOIN sz y ON y.source = i.sb
            ORDER BY source_a, source_b""",
        "copurchase_lift_pairs": """
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM lineitem),
            n AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS nord
                  FROM lineitem),
            pf AS (SELECT l_partkey, count(*)::BIGINT AS np
                   FROM op GROUP BY l_partkey),
            pr AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                          count(*)::BIGINT AS nab
                   FROM op a JOIN op b
                     ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
                   GROUP BY 1, 2 HAVING count(*) >= 2),
            lf AS (SELECT pr.pa, pr.pb, pr.nab, x.np AS na, y.np AS nb,
                          (1000000::HUGEINT * pr.nab * n.nord)
                            // (x.np * y.np) AS lift_ppm
                   FROM pr CROSS JOIN n
                   JOIN pf x ON x.l_partkey = pr.pa
                   JOIN pf y ON y.l_partkey = pr.pb),
            top AS (SELECT *, row_number() OVER (ORDER BY lift_ppm DESC,
                                                 pa, pb) AS rk
                    FROM lf)
            SELECT CAST(pa AS BIGINT) AS part_a,
                   CAST(pb AS BIGINT) AS part_b,
                   nab AS n_both, na AS n_a, nb AS n_b,
                   CAST(lift_ppm AS BIGINT) AS lift_ppm,
                   CAST(rk AS BIGINT) AS rk
            FROM top WHERE rk <= 20""",
        "markov_stationary_events": _markov_sql(5),
        # tie-corrected Mann-Whitney AUC via the average-rank histogram
        # closed form with halves cleared (2R integer throughout)
        "auc_en_by_chars": """
            WITH d AS (SELECT source, n_chars::BIGINT AS v,
                              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                       FROM documents
                       WHERE source IS NOT NULL AND lang IS NOT NULL
                         AND n_chars IS NOT NULL),
            h AS (SELECT source, v, sum(y)::HUGEINT AS pos,
                         count(*)::HUGEINT AS c
                  FROM d GROUP BY source, v),
            e AS (SELECT source, v, pos, c,
                         COALESCE(sum(c) OVER (PARTITION BY source
                             ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS ebelow
                  FROM h),
            s AS (SELECT source,
                         sum(pos * (2 * ebelow + c + 1))::HUGEINT AS r2,
                         sum(pos)::HUGEINT AS np,
                         sum(c - pos)::HUGEINT AS nn
                  FROM e GROUP BY source)
            SELECT source, np::BIGINT AS n_pos, nn::BIGINT AS n_neg,
                   ((1000000::HUGEINT * (r2 - np * (np + 1)))
                    // (2 * np * nn))::BIGINT AS auc_ppm
            FROM s WHERE np > 0 AND nn > 0
            ORDER BY source""",
        # isotonic fit by the exact minimax characterization over the
        # bounded hour grid; micro-cent floors commute with the minimax
        "isotonic_hourly_value": """
            WITH e AS (SELECT extract(hour FROM ts)::BIGINT AS h,
                              CAST(round(value * 100) AS BIGINT) AS cents
                       FROM events
                       WHERE ts IS NOT NULL AND value IS NOT NULL
                         AND value >= 0),
            hh AS (SELECT h, sum(cents)::HUGEINT AS s,
                          count(*)::HUGEINT AS c
                   FROM e GROUP BY h),
            iv AS (SELECT j.h AS j, k.h AS k,
                          ((1000000::HUGEINT * sum(x.s)) // sum(x.c)) AS m
                   FROM hh j JOIN hh k ON k.h >= j.h
                   JOIN hh x ON x.h BETWEEN j.h AND k.h
                   GROUP BY j.h, k.h),
            mn AS (SELECT iv.j, i.h AS i, min(iv.m) AS v
                   FROM iv JOIN hh i ON iv.j <= i.h AND iv.k >= i.h
                   GROUP BY iv.j, i.h),
            fit AS (SELECT i AS hour, max(v) AS g FROM mn GROUP BY i)
            SELECT f.hour, hh.c::BIGINT AS n_events,
                   hh.s::BIGINT AS sum_cents, f.g::BIGINT AS iso_ucents
            FROM fit f JOIN hh ON hh.h = f.hour
            ORDER BY f.hour""",
        # Shannon code length = smallest l with n * 2^l >= total
        "shannon_vocab_codes": """
            WITH wc AS (
              SELECT word, count(*)::BIGINT AS n
              FROM (SELECT unnest(string_split(text, ' ')) AS word
                    FROM documents WHERE text IS NOT NULL)
              GROUP BY word),
            tot AS (SELECT sum(n)::HUGEINT AS t FROM wc),
            top AS (SELECT word, n,
                           row_number() OVER (ORDER BY n DESC, word) AS rk
                    FROM wc),
            lens AS (SELECT word, n, rk,
                            (SELECT min(i) FROM range(0, 64) r(i)
                             WHERE (top.n::HUGEINT << CAST(i AS INTEGER))
                                   >= tot.t) AS code_len
                     FROM top, tot WHERE rk <= 30)
            SELECT word, n, code_len::BIGINT AS code_len,
                   (n * code_len)::BIGINT AS bits, rk::BIGINT AS rk
            FROM lens ORDER BY rk""",
        # Reciprocal Rank Fusion of the two keyword-tf rankings,
        # deterministic (tf desc, doc_id asc) ranks, top-100 lists, k=60
        "rrf_fuse_keyword_rankings": """
            WITH w AS (SELECT doc_id,
                              unnest(string_split(text, ' ')) AS word
                       FROM documents WHERE text IS NOT NULL),
            tf AS (SELECT d.doc_id,
                          COALESCE(x.tfa, 0) AS tfa,
                          COALESCE(x.tfb, 0) AS tfb
                   FROM (SELECT doc_id FROM documents
                         WHERE text IS NOT NULL) d
                   LEFT JOIN (SELECT doc_id,
                                count(*) FILTER (WHERE word IN
                                  ('join', 'scan'))::BIGINT AS tfa,
                                count(*) FILTER (WHERE word IN
                                  ('hash', 'merge'))::BIGINT AS tfb
                              FROM w GROUP BY doc_id) x
                   USING (doc_id)),
            ra AS (SELECT doc_id, row_number() OVER
                     (ORDER BY tfa DESC, doc_id) AS r FROM tf),
            rb AS (SELECT doc_id, row_number() OVER
                     (ORDER BY tfb DESC, doc_id) AS r FROM tf),
            f AS (SELECT doc_id, (1000000000::HUGEINT // (60 + r)) AS c
                  FROM ra WHERE r <= 100
                  UNION ALL
                  SELECT doc_id, (1000000000::HUGEINT // (60 + r))
                  FROM rb WHERE r <= 100),
            g AS (SELECT doc_id, sum(c)::BIGINT AS rrf_e9
                  FROM f GROUP BY doc_id),
            t AS (SELECT doc_id, rrf_e9,
                         row_number() OVER (ORDER BY rrf_e9 DESC,
                                            doc_id) AS rk
                  FROM g)
            SELECT doc_id, rrf_e9, rk::BIGINT AS rk
            FROM t WHERE rk <= 20""",
        # per-class P/R/F1 over the shared langid-predictor CTEs
        "langid_f1_by_class": f"""
            WITH {_LANGID_PRED_CTES},
            cm AS (SELECT lang, lang_pred, count(*)::HUGEINT AS n
                   FROM p GROUP BY lang, lang_pred),
            cls AS (SELECT DISTINCT lang FROM cm),
            st AS (SELECT c.lang,
                     COALESCE((SELECT sum(n) FROM cm
                               WHERE cm.lang = c.lang
                                 AND cm.lang_pred = c.lang), 0) AS tp,
                     COALESCE((SELECT sum(n) FROM cm
                               WHERE cm.lang != c.lang
                                 AND cm.lang_pred = c.lang), 0) AS fp,
                     COALESCE((SELECT sum(n) FROM cm
                               WHERE cm.lang = c.lang
                                 AND cm.lang_pred != c.lang), 0) AS fneg
                   FROM cls c)
            SELECT lang, tp::BIGINT AS tp, fp::BIGINT AS fp,
                   fneg::BIGINT AS fn,
                   (CASE WHEN tp + fp = 0 THEN 0
                         ELSE (1000000::HUGEINT * tp) // (tp + fp)
                    END)::BIGINT AS precision_ppm,
                   (CASE WHEN tp + fneg = 0 THEN 0
                         ELSE (1000000::HUGEINT * tp) // (tp + fneg)
                    END)::BIGINT AS recall_ppm,
                   (CASE WHEN 2 * tp + fp + fneg = 0 THEN 0
                         ELSE (2000000::HUGEINT * tp)
                              // (2 * tp + fp + fneg)
                    END)::BIGINT AS f1_ppm
            FROM st ORDER BY lang""",
        # Simpson diversity 1 - sum n_i(n_i-1)/(N(N-1)) in floor-ppm
        "simpson_diversity_by_source": """
            WITH c AS (SELECT source, lang, count(*)::HUGEINT AS n
                       FROM documents
                       WHERE source IS NOT NULL AND lang IS NOT NULL
                       GROUP BY source, lang),
            s AS (SELECT source, sum(n)::HUGEINT AS tot,
                         sum(n * (n - 1))::HUGEINT AS same
                  FROM c GROUP BY source HAVING sum(n) >= 2)
            SELECT source, tot::BIGINT AS n_docs,
                   (1000000 - (1000000::HUGEINT * same)
                    // (tot * (tot - 1)))::BIGINT AS simpson_ppm
            FROM s ORDER BY source""",
        "coverage_select_documents": _coverage_sql(5),
        # distinct texts shared verbatim by each unordered source pair
        "dup_cross_source_matrix": """
            WITH ts AS (SELECT DISTINCT text, source FROM documents
                        WHERE text IS NOT NULL AND source IS NOT NULL),
            p AS (SELECT a.source AS src_a, b.source AS src_b
                  FROM ts a JOIN ts b
                    ON a.text = b.text AND a.source < b.source)
            SELECT src_a, src_b, count(*)::BIGINT AS n_texts
            FROM p GROUP BY src_a, src_b ORDER BY src_a, src_b""",
        # exact two-sample KS distance in cleared-denominator integers
        "ks_chars_two_sources": """
            WITH d AS (SELECT source, n_chars::BIGINT AS v
                       FROM documents
                       WHERE n_chars IS NOT NULL
                         AND source IN ('src0', 'src1')),
            h AS (SELECT v,
                         sum(CASE WHEN source = 'src0' THEN 1
                                  ELSE 0 END)::HUGEINT AS ca,
                         sum(CASE WHEN source = 'src1' THEN 1
                                  ELSE 0 END)::HUGEINT AS cb
                  FROM d GROUP BY v),
            c AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cum_a,
                         sum(cb) OVER (ORDER BY v) AS cum_b FROM h),
            t AS (SELECT sum(ca)::HUGEINT AS na,
                         sum(cb)::HUGEINT AS nb FROM h),
            m AS (SELECT max(abs(t.nb * c.cum_a
                                 - t.na * c.cum_b))::HUGEINT AS dnum
                  FROM c, t)
            SELECT t.na::BIGINT AS n_a, t.nb::BIGINT AS n_b,
                   m.dnum::BIGINT AS d_num,
                   ((1000000::HUGEINT * m.dnum)
                    // (t.na * t.nb))::BIGINT AS ks_ppm
            FROM m, t WHERE t.na > 0 AND t.nb > 0""",
        "ppr_trade_graph": _ppr_sql(4),
        # Flesch-Kincaid as one exact rational: no division on either side
        "readability_fk_documents": """
            WITH c AS (SELECT doc_id,
                         (length(text) - length(replace(text, ' ', ''))
                          + 1)::BIGINT AS w,
                         greatest(len(regexp_extract_all(text,
                                      '[.!?]+')), 1)::BIGINT AS s,
                         len(regexp_extract_all(text,
                             '(?i)[aeiouy]+'))::BIGINT AS y
                       FROM documents
                       WHERE text IS NOT NULL AND length(text) > 0)
            SELECT doc_id, w AS n_words, s AS n_sentences,
                   y AS n_vowel_runs,
                   (39 * w * w + 1180 * y * s
                    - 1559 * s * w)::BIGINT AS fk_num,
                   (100 * s * w)::BIGINT AS fk_den
            FROM c""",
        # Holt level+trend recurrence, alpha=beta=1/2, DuckDB-truncating //
        "holt_forecast_events": """
            WITH RECURSIVE
            e AS (SELECT event_type,
                         epoch_us(ts) // 3600000000 AS hb
                  FROM events),
            h AS (SELECT event_type, hb, count(*)::BIGINT AS c
                  FROM e GROUP BY event_type, hb),
            o AS (SELECT event_type, hb, c,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY hb) AS rn
                  FROM h),
            cnt AS (SELECT event_type, max(rn)::BIGINT AS nh
                    FROM o GROUP BY event_type),
            rec(event_type, rn, lv, tr) AS (
              SELECT b.event_type, 1::BIGINT,
                     b.c * 1000, (n.c - b.c) * 1000
              FROM o b JOIN o n ON n.event_type = b.event_type
                               AND n.rn = 2
              WHERE b.rn = 1
              UNION ALL
              SELECT r.event_type, r.rn + 1,
                     (o.c * 1000 + r.lv + r.tr) // 2,
                     (((o.c * 1000 + r.lv + r.tr) // 2)
                      - r.lv + r.tr) // 2
              FROM rec r JOIN o ON o.event_type = r.event_type
                               AND o.rn = r.rn + 1)
            SELECT r.event_type, c.nh AS n_hours,
                   r.lv::BIGINT AS level_milli,
                   r.tr::BIGINT AS trend_milli,
                   (r.lv + r.tr)::BIGINT AS forecast_milli
            FROM rec r JOIN cnt c ON c.event_type = r.event_type
                                 AND r.rn = c.nh
            WHERE c.nh >= 2 ORDER BY r.event_type""",
        # children-per-order histogram + zero bucket from scalar counts
        "join_fanout_histogram": """
            WITH pk AS (SELECT l_orderkey, count(*)::BIGINT AS fanout
                        FROM lineitem GROUP BY l_orderkey),
            h AS (SELECT fanout, count(*)::BIGINT AS n_orders
                  FROM pk GROUP BY fanout),
            z AS (SELECT (SELECT count(*) FROM orders)
                         - (SELECT count(*) FROM pk) AS n0)
            SELECT fanout, n_orders FROM h
            UNION ALL
            SELECT 0::BIGINT, n0::BIGINT FROM z WHERE n0 > 0
            ORDER BY fanout""",
        # hour-of-day mass vs the uniform 1/24 share, floor-ppm
        "seasonal_index_by_type": """
            WITH e AS (SELECT event_type,
                              (epoch_us(ts) // 3600000000) % 24 AS hour
                       FROM events),
            h AS (SELECT event_type, hour, count(*)::BIGINT AS n
                  FROM e GROUP BY event_type, hour),
            t AS (SELECT event_type, sum(n)::HUGEINT AS tot
                  FROM h GROUP BY event_type)
            SELECT h.event_type, h.hour::BIGINT AS hour,
                   h.n AS n_events,
                   ((24000000::HUGEINT * h.n) // t.tot)::BIGINT AS idx_ppm
            FROM h JOIN t USING (event_type)
            ORDER BY event_type, hour""",
        # Q11 shape: national supply value per part, > 1/1000 of total
        "q11_important_stock": """
            WITH sk AS (SELECT s_suppkey FROM supplier s
                        JOIN nation n ON n.n_nationkey = s.s_nationkey
                        WHERE n.n_name = 'NATION_1'),
            v AS (SELECT l_partkey,
                         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                             * CAST(floor(l_quantity)
                                    AS BIGINT))::HUGEINT AS val
                  FROM lineitem l JOIN sk ON sk.s_suppkey = l.l_suppkey
                  GROUP BY l_partkey),
            t AS (SELECT sum(val)::HUGEINT AS tot FROM v)
            SELECT l_partkey, val::BIGINT AS value_cq,
                   (row_number() OVER (ORDER BY val DESC,
                                       l_partkey))::BIGINT AS rk
            FROM v, t WHERE val * 1000 > t.tot
            ORDER BY rk""",
        # Q16 shape: distinct suppliers per (brand, type, size)
        "q16_supplier_cnt": """
            WITH bad AS (SELECT s_suppkey FROM supplier
                         WHERE s_acctbal < 0),
            rel AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
                    WHERE l_suppkey NOT IN (SELECT s_suppkey FROM bad)),
            pp AS (SELECT p_partkey, p_brand, p_type, p_size FROM part
                   WHERE p_brand <> 'Brand#13'
                     AND p_size IN (1, 5, 9, 14, 23, 36, 45, 49)),
            j AS (SELECT DISTINCT pp.p_brand, pp.p_type, pp.p_size,
                                  rel.l_suppkey
                  FROM rel JOIN pp ON pp.p_partkey = rel.l_partkey)
            SELECT p_brand, p_type, p_size::BIGINT AS p_size,
                   count(*)::BIGINT AS supplier_cnt
            FROM j GROUP BY p_brand, p_type, j.p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
        # cumulative gains at exact ceil(kN/10) depths of the
        # (n_chars desc, doc_id asc) ranking
        "cumulative_gains_en": """
            WITH d AS (SELECT doc_id, n_chars::BIGINT AS v,
                              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                       FROM documents
                       WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
            r AS (SELECT y, row_number() OVER
                    (ORDER BY v DESC, doc_id) AS rn FROM d),
            t AS (SELECT count(*)::HUGEINT AS n,
                         sum(y)::HUGEINT AS p FROM d),
            ks AS (SELECT g.i AS decile,
                          ((g.i * t.n + 9) // 10)::BIGINT AS depth
                   FROM range(1, 11) g(i), t),
            c AS (SELECT ks.decile, ks.depth,
                         (SELECT COALESCE(sum(y), 0) FROM r
                          WHERE r.rn <= ks.depth)::BIGINT AS n_pos_cum
                  FROM ks)
            SELECT c.decile::BIGINT AS decile, c.depth, c.n_pos_cum,
                   ((1000000::HUGEINT * c.n_pos_cum) // t.p)::BIGINT
                     AS gain_ppm
            FROM c, t WHERE t.p > 0 ORDER BY decile""",
        # Hoover index: sum c|n*v - S| / (2nS) over the value histogram
        "hoover_value_by_type": """
            WITH h AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cents,
                              count(*)::HUGEINT AS n
                       FROM events GROUP BY event_type, cents),
            s AS (SELECT event_type, sum(n)::HUGEINT AS nn,
                         sum(n * cents)::HUGEINT AS ss
                  FROM h GROUP BY event_type),
            d AS (SELECT h.event_type,
                         sum(h.n * abs(s.nn * h.cents
                                       - s.ss))::HUGEINT AS dd
                  FROM h JOIN s USING (event_type)
                  GROUP BY h.event_type)
            SELECT s.event_type, s.nn::BIGINT AS n_events,
                   s.ss::BIGINT AS sum_cents,
                   ((1000000::HUGEINT * d.dd)
                    // (2 * s.nn * s.ss))::BIGINT AS hoover_ppm
            FROM s JOIN d USING (event_type)
            WHERE s.ss > 0 ORDER BY s.event_type""",
        # lag-1 Pearson components over consecutive observed buckets
        "autocorr_hourly_by_type": """
            WITH e AS (SELECT event_type,
                              epoch_us(ts) // 3600000000 AS hb
                       FROM events),
            h AS (SELECT event_type, hb, count(*)::HUGEINT AS c
                  FROM e GROUP BY event_type, hb),
            l AS (SELECT event_type, c AS x,
                         lead(c) OVER (PARTITION BY event_type
                                       ORDER BY hb) AS y
                  FROM h),
            p AS (SELECT event_type, count(*)::HUGEINT AS m,
                         sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
                         sum(x * y)::HUGEINT AS sxy,
                         sum(x * x)::HUGEINT AS sxx,
                         sum(y * y)::HUGEINT AS syy
                  FROM l WHERE y IS NOT NULL
                  GROUP BY event_type HAVING count(*) >= 2)
            SELECT event_type, m::BIGINT AS n_pairs,
                   (m * sxy - sx * sy)::BIGINT AS num,
                   (m * sxx - sx * sx)::BIGINT AS den_x,
                   (m * syy - sy * sy)::BIGINT AS den_y
            FROM p ORDER BY event_type""",
        # Kendall tau-b components over the common top-50 docs
        "kendall_tau_keyword_rankings": """
            WITH w AS (SELECT doc_id,
                              unnest(string_split(text, ' ')) AS word
                       FROM documents WHERE text IS NOT NULL),
            tf AS (SELECT d.doc_id,
                          COALESCE(x.tfa, 0) AS tfa,
                          COALESCE(x.tfb, 0) AS tfb
                   FROM (SELECT doc_id FROM documents
                         WHERE text IS NOT NULL) d
                   LEFT JOIN (SELECT doc_id,
                                count(*) FILTER (WHERE word IN
                                  ('join', 'scan'))::BIGINT AS tfa,
                                count(*) FILTER (WHERE word IN
                                  ('hash', 'merge'))::BIGINT AS tfb
                              FROM w GROUP BY doc_id) x
                   USING (doc_id)),
            ra AS (SELECT doc_id, tfa, tfb, row_number() OVER
                     (ORDER BY tfa DESC, doc_id) AS r FROM tf),
            rb AS (SELECT doc_id, row_number() OVER
                     (ORDER BY tfb DESC, doc_id) AS r FROM tf),
            com AS (SELECT ra.doc_id, ra.tfa, ra.tfb
                    FROM ra JOIN rb USING (doc_id)
                    WHERE ra.r <= 50 AND rb.r <= 50),
            p AS (SELECT a.tfa AS a1, a.tfb AS b1,
                         b.tfa AS a2, b.tfb AS b2
                  FROM com a JOIN com b ON a.doc_id < b.doc_id)
            SELECT (SELECT count(*) FROM com)::BIGINT AS n_common,
                   COALESCE(sum(CASE WHEN (a1 - a2) * (b1 - b2) > 0
                                     THEN 1 ELSE 0 END), 0)::BIGINT
                     AS concordant,
                   COALESCE(sum(CASE WHEN (a1 - a2) * (b1 - b2) < 0
                                     THEN 1 ELSE 0 END), 0)::BIGINT
                     AS discordant,
                   COALESCE(sum(CASE WHEN a1 = a2 AND b1 <> b2
                                     THEN 1 ELSE 0 END), 0)::BIGINT
                     AS ties_a,
                   COALESCE(sum(CASE WHEN b1 = b2 AND a1 <> a2
                                     THEN 1 ELSE 0 END), 0)::BIGINT
                     AS ties_b,
                   COALESCE(sum(CASE WHEN a1 = a2 AND b1 = b2
                                     THEN 1 ELSE 0 END), 0)::BIGINT
                     AS ties_both
            FROM p""",
        # linear gap fill: milli-cent lerp, truncating division
        "user_hourly_lerp": """
            WITH obs AS (SELECT user_id,
                                epoch_us(ts) // 3600000000 AS hb,
                                sum(CAST(round(value * 100)
                                         AS BIGINT))::BIGINT AS cents
                         FROM events
                         WHERE user_id IS NOT NULL AND ts IS NOT NULL
                           AND value IS NOT NULL
                         GROUP BY 1, 2),
            b AS (SELECT user_id, min(hb) AS mn, max(hb) AS mx
                  FROM obs GROUP BY user_id),
            grid AS (SELECT user_id,
                            unnest(generate_series(mn, mx)) AS hb
                     FROM b),
            j AS (SELECT g.user_id, g.hb, o.cents
                  FROM grid g LEFT JOIN obs o USING (user_id, hb)),
            f AS (SELECT user_id, hb, cents,
                         last_value(cents IGNORE NULLS) OVER w AS pv,
                         last_value(CASE WHEN cents IS NOT NULL
                                         THEN hb END IGNORE NULLS)
                           OVER w AS ph,
                         first_value(cents IGNORE NULLS) OVER w2 AS nv,
                         first_value(CASE WHEN cents IS NOT NULL
                                          THEN hb END IGNORE NULLS)
                           OVER w2 AS nh
                  FROM j
                  WINDOW w AS (PARTITION BY user_id ORDER BY hb
                               ROWS UNBOUNDED PRECEDING),
                         w2 AS (PARTITION BY user_id ORDER BY hb
                                ROWS BETWEEN CURRENT ROW
                                AND UNBOUNDED FOLLOWING))
            SELECT user_id, hb AS hour_bucket,
                   (pv * 1000 + ((nv - pv)::HUGEINT * 1000 * (hb - ph))
                    // (nh - ph))::BIGINT AS lerp_milli
            FROM f WHERE cents IS NULL
            ORDER BY user_id, hour_bucket""",
        "mmr_rerank_documents": _mmr_sql(5),
        # mutual top-1 cosine pairs over the vec_id < 200 scope
        "mutual_nn_embeddings": """
            WITH v AS (SELECT vec_id, embedding FROM embeddings
                       WHERE vec_id < 200),
            s AS (SELECT a.vec_id AS va, b.vec_id AS vb,
                         list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[])
                           AS cs
                  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
            nn AS (SELECT va, vb, cs,
                          row_number() OVER (PARTITION BY va
                                             ORDER BY cs DESC, vb) AS rk
                   FROM s),
            n1 AS (SELECT va, vb, cs FROM nn WHERE rk = 1)
            SELECT x.va::BIGINT AS vec_a, x.vb::BIGINT AS vec_b,
                   round(x.cs, 6) AS cosine
            FROM n1 x JOIN n1 y ON y.va = x.vb AND y.vb = x.va
            WHERE x.va < x.vb ORDER BY vec_a""",
        # fraction of each doc's 8-token windows occurring in OTHER docs
        "self_overlap_documents": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS sp
                       FROM documents WHERE text IS NOT NULL),
            w AS (SELECT doc_id, array_to_string(sp[i:i+7], ' ') AS g
                  FROM (SELECT doc_id, sp,
                               unnest(generate_series(1,
                                   len(sp) - 7)) AS i
                        FROM d)),
            shared AS (SELECT g FROM
                       (SELECT g, count(DISTINCT doc_id) AS nd
                        FROM w GROUP BY g) WHERE nd >= 2),
            per AS (SELECT w.doc_id, count(*)::HUGEINT AS nw,
                           sum(CASE WHEN s.g IS NOT NULL
                                    THEN 1 ELSE 0 END)::HUGEINT AS ns
                    FROM w LEFT JOIN shared s USING (g)
                    GROUP BY w.doc_id)
            SELECT doc_id, nw::BIGINT AS n_windows,
                   ns::BIGINT AS n_shared,
                   ((1000000::HUGEINT * ns) // nw)::BIGINT
                     AS overlap_ppm
            FROM per""",
        # how many docs each distinct 8-gram occurs in, histogrammed
        "ngram_doc_frequency_histogram": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS sp
                       FROM documents WHERE text IS NOT NULL),
            w AS (SELECT doc_id, array_to_string(sp[i:i+7], ' ') AS g
                  FROM (SELECT doc_id, sp,
                               unnest(generate_series(1,
                                   len(sp) - 7)) AS i
                        FROM d)),
            h AS (SELECT g, count(DISTINCT doc_id)::BIGINT AS nd
                  FROM w GROUP BY g)
            SELECT nd AS n_docs, count(*)::BIGINT AS n_grams
            FROM h GROUP BY nd ORDER BY n_docs""",
        # longest same-type run per user: rn - rn_by_type islands
        "max_event_type_run": """
            WITH e AS (SELECT user_id, event_type, ts, event_id
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_type IS NOT NULL),
            o AS (SELECT user_id, event_type,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS rn,
                         row_number() OVER (PARTITION BY user_id,
                                                         event_type
                                            ORDER BY ts, event_id)
                           AS rnt
                  FROM e),
            runs AS (SELECT user_id, event_type,
                            count(*)::BIGINT AS len
                     FROM o GROUP BY user_id, event_type, rn - rnt),
            best AS (SELECT user_id, event_type AS run_type, len,
                            row_number() OVER (PARTITION BY user_id
                                               ORDER BY len DESC,
                                                        event_type)
                              AS rk
                     FROM runs)
            SELECT user_id, len AS max_run, run_type
            FROM best WHERE rk = 1 ORDER BY user_id""",
        # fastest-reordered parts: mean day gap between distinct order
        # dates, floor-milli, inner-join order-date lookup
        "part_reorder_gap": """
            WITH dd AS (SELECT DISTINCT l.l_partkey,
                               epoch_us(o.o_orderdate)
                                 // 86400000000 AS day
                        FROM lineitem l
                        JOIN orders o ON o.o_orderkey = l.l_orderkey),
            g AS (SELECT l_partkey, day,
                         lead(day) OVER (PARTITION BY l_partkey
                                         ORDER BY day) AS nxt
                  FROM dd),
            s AS (SELECT l_partkey, count(*)::BIGINT AS n_gaps,
                         sum(nxt - day)::BIGINT AS sum_gap_days
                  FROM g WHERE nxt IS NOT NULL GROUP BY l_partkey),
            r AS (SELECT l_partkey, n_gaps, sum_gap_days,
                         ((1000 * sum_gap_days)
                          // n_gaps)::BIGINT AS mean_gap_milli
                  FROM s),
            t AS (SELECT *, row_number() OVER
                    (ORDER BY mean_gap_milli, l_partkey) AS rk
                  FROM r)
            SELECT l_partkey, n_gaps, sum_gap_days, mean_gap_milli,
                   rk::BIGINT AS rk
            FROM t WHERE rk <= 20 ORDER BY rk""",
        # depth-4 x width-64 Count-Min with arithmetic hashes: cell sums
        # are GROUP BY arithmetic, est = min over the 4 cells
        "cms_user_event_counts": """
            WITH cfg(j, a) AS (VALUES (0, 2654435761),
                               (1, 2246822519), (2, 3266489917),
                               (3, 668265263)),
            u AS (SELECT user_id FROM events
                  WHERE user_id IS NOT NULL),
            cells AS (SELECT cfg.j,
                             ((((cfg.a::HUGEINT * user_id)
                                % 4294967296) // 65536) % 64)::BIGINT
                               AS bkt,
                             count(*)::BIGINT AS n
                      FROM u, cfg GROUP BY cfg.j, bkt),
            tc AS (SELECT user_id, count(*)::BIGINT AS true_count
                   FROM u GROUP BY user_id),
            top AS (SELECT user_id, true_count,
                           row_number() OVER (ORDER BY true_count DESC,
                                              user_id) AS rk
                    FROM tc),
            est AS (SELECT t.user_id, t.true_count,
                           min(ce.n)::BIGINT AS cms_est
                    FROM top t CROSS JOIN cfg
                    JOIN cells ce ON ce.j = cfg.j
                      AND ce.bkt = ((((cfg.a::HUGEINT * t.user_id)
                                      % 4294967296) // 65536) % 64)
                    WHERE t.rk <= 10
                    GROUP BY t.user_id, t.true_count)
            SELECT user_id, true_count, cms_est,
                   (cms_est - true_count)::BIGINT AS overcount
            FROM est ORDER BY true_count DESC, user_id""",
        # 256-bit k=3 Bloom over customers-with-orders, probed by all
        "bloom_fpr_audit": """
            WITH cfg(j, a) AS (VALUES (0, 2654435761),
                               (1, 2246822519), (2, 3266489917)),
            mem AS (SELECT DISTINCT o_custkey AS k FROM orders),
            bitset AS (SELECT DISTINCT cfg.j,
                              ((((cfg.a::HUGEINT * mem.k)
                                 % 4294967296) // 65536) % 256)::BIGINT
                                AS bkt
                       FROM mem, cfg),
            ph AS (SELECT c.c_custkey AS k, cfg.j,
                          ((((cfg.a::HUGEINT * c.c_custkey)
                             % 4294967296) // 65536) % 256)::BIGINT
                            AS bkt
                   FROM customer c, cfg),
            hits AS (SELECT k, count(bs.j)::BIGINT AS nhit
                     FROM ph LEFT JOIN bitset bs USING (j, bkt)
                     GROUP BY k),
            fp AS (SELECT h.k, (h.nhit = 3 AND m.k IS NULL) AS is_fp,
                          (m.k IS NOT NULL) AS is_mem
                   FROM hits h LEFT JOIN mem m ON m.k = h.k)
            SELECT (SELECT count(*) FROM mem)::BIGINT AS n_members,
                   count(*)::BIGINT AS n_probes,
                   sum(CASE WHEN is_fp THEN 1 ELSE 0 END)::BIGINT
                     AS n_false_pos,
                   ((1000000::HUGEINT *
                     sum(CASE WHEN is_fp THEN 1 ELSE 0 END))
                    // greatest(count(*) -
                        sum(CASE WHEN is_mem THEN 1 ELSE 0 END),
                        1))::BIGINT AS fpr_ppm
            FROM fp""",
        # frequent 3-itemsets, support >= 2 over distinct order baskets
        "frequent_triples_parts": """
            WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM lineitem),
            t AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                         c.l_partkey AS pc
                  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
                                     AND a.l_partkey < b.l_partkey
                  JOIN lp c ON a.l_orderkey = c.l_orderkey
                           AND b.l_partkey < c.l_partkey),
            g AS (SELECT pa, pb, pc, count(*)::BIGINT AS support
                  FROM t GROUP BY pa, pb, pc HAVING count(*) >= 2),
            f AS (SELECT *, row_number() OVER (ORDER BY support DESC,
                                               pa, pb, pc) AS rk
                  FROM g)
            SELECT pa::BIGINT AS part_a, pb::BIGINT AS part_b,
                   pc::BIGINT AS part_c, support, rk::BIGINT AS rk
            FROM f WHERE rk <= 15""",
        # rank of the first same-label neighbor per fixed query vector
        "mrr_knn_labels": """
            WITH q AS (SELECT vec_id AS qid, label AS qlab,
                              embedding AS qe
                       FROM embeddings WHERE vec_id IN (0, 1, 2)),
            s AS (SELECT q.qid, q.qlab, e.vec_id, e.label,
                         round(list_cosine_similarity(q.qe::DOUBLE[],
                               e.embedding::DOUBLE[]), 6) AS cs
                  FROM q, embeddings e WHERE e.vec_id <> q.qid),
            r AS (SELECT qid, qlab, vec_id, label, cs,
                         row_number() OVER (PARTITION BY qid
                                            ORDER BY cs DESC, vec_id)
                           AS rn
                  FROM s),
            f AS (SELECT qid, vec_id, rn,
                         row_number() OVER (PARTITION BY qid
                                            ORDER BY rn) AS ff
                  FROM r WHERE label = qlab)
            SELECT qid::BIGINT AS query_id,
                   vec_id::BIGINT AS best_vec_id,
                   rn::BIGINT AS "rank",
                   (1000000 // rn)::BIGINT AS rr_ppm
            FROM f WHERE ff = 1 ORDER BY query_id""",
        # integer cross-correlation of view vs purchase hourly counts
        "xcorr_peak_lag": """
            WITH e AS (SELECT event_type,
                              epoch_us(ts) // 3600000000 AS hb
                       FROM events
                       WHERE event_type IN ('view', 'purchase')),
            x AS (SELECT hb, count(*)::HUGEINT AS n FROM e
                  WHERE event_type = 'view' GROUP BY hb),
            y AS (SELECT hb, count(*)::HUGEINT AS n FROM e
                  WHERE event_type = 'purchase' GROUP BY hb),
            lags AS (SELECT (i - 12)::BIGINT AS lag
                     FROM range(0, 25) t(i)),
            s AS (SELECT l.lag,
                         COALESCE((SELECT sum(x.n * y.n)
                                   FROM x JOIN y
                                     ON y.hb = x.hb + l.lag),
                                  0)::BIGINT AS xcorr
                  FROM lags l),
            r AS (SELECT lag, xcorr,
                         row_number() OVER (ORDER BY xcorr DESC,
                                            lag) AS rk
                  FROM s)
            SELECT lag, xcorr, rk::BIGINT AS rk FROM r ORDER BY lag""",
        # each nation's revenue share of its region, floor-ppm
        "nation_revenue_share": """
            WITH pn AS (SELECT n.n_nationkey, n.n_name, r.r_name
                        FROM nation n JOIN region r
                          ON r.r_regionkey = n.n_regionkey),
            a AS (SELECT c.c_nationkey AS nkey,
                         sum(CAST(round(o.o_totalprice * 100)
                                  AS BIGINT))::HUGEINT AS cents
                  FROM orders o JOIN customer c
                    ON c.c_custkey = o.o_custkey
                  GROUP BY c.c_nationkey),
            j AS (SELECT pn.r_name, pn.n_name, a.cents
                  FROM a JOIN pn ON pn.n_nationkey = a.nkey),
            t AS (SELECT r_name, sum(cents)::HUGEINT AS tot
                  FROM j GROUP BY r_name)
            SELECT j.r_name, j.n_name, j.cents::BIGINT AS revenue_cents,
                   ((1000000::HUGEINT * j.cents) // t.tot)::BIGINT
                     AS share_ppm
            FROM j JOIN t USING (r_name)
            ORDER BY j.r_name, j.n_name""",
        # quarterly counts/revenue + deltas vs the previous observed q
        "quarterly_order_growth": """
            WITH q AS (SELECT extract(year FROM o_orderdate)::BIGINT
                                AS y,
                              ((extract(month FROM o_orderdate) - 1)
                               // 3 + 1)::BIGINT AS q,
                              CAST(round(o_totalprice * 100)
                                   AS BIGINT) AS cents
                       FROM orders WHERE o_orderdate IS NOT NULL),
            a AS (SELECT y, q, count(*)::BIGINT AS n,
                         sum(cents)::BIGINT AS s
                  FROM q GROUP BY y, q),
            l AS (SELECT y, q, n, s, lag(n) OVER w AS pn,
                         lag(s) OVER w AS ps
                  FROM a WINDOW w AS (ORDER BY y, q))
            SELECT y AS o_year, q AS o_quarter, n AS n_orders,
                   s AS rev_cents, (n - pn)::BIGINT AS delta_n,
                   (s - ps)::BIGINT AS delta_cents
            FROM l WHERE pn IS NOT NULL ORDER BY o_year, o_quarter""",
        # raw power sums s1..s4 of floor-dollar values per type
        "value_moments_by_type": """
            WITH v AS (SELECT event_type,
                              CAST(floor(value) AS HUGEINT) AS d
                       FROM events WHERE value IS NOT NULL)
            SELECT event_type, count(*)::BIGINT AS n_events,
                   sum(d)::BIGINT AS s1,
                   sum(d * d)::BIGINT AS s2,
                   sum(d * d * d)::BIGINT AS s3,
                   sum(d * d * d * d)::BIGINT AS s4
            FROM v GROUP BY event_type ORDER BY event_type""",
        # strict-order 3-step funnel on each step's FIRST occurrence
        "funnel3_view_click_purchase": """
            WITH e AS (SELECT user_id, event_type, ts FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_type IS NOT NULL),
            v AS (SELECT user_id, min(ts) AS tv FROM e
                  WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, min(e.ts) AS tc
                  FROM e JOIN v USING (user_id)
                  WHERE e.event_type = 'click' AND e.ts > v.tv
                  GROUP BY e.user_id),
            p AS (SELECT e.user_id FROM e JOIN c USING (user_id)
                  WHERE e.event_type = 'purchase' AND e.ts > c.tc
                  GROUP BY e.user_id)
            SELECT (SELECT count(DISTINCT user_id)
                    FROM e)::BIGINT AS n_users,
                   (SELECT count(*) FROM v)::BIGINT AS n_view,
                   (SELECT count(*) FROM c)::BIGINT AS n_view_click,
                   (SELECT count(*) FROM p)::BIGINT AS n_full""",
        # Laplace-smoothed P(lang='en') per source, floor-ppm
        "target_encode_source": """
            WITH d AS (SELECT source,
                              CASE WHEN lang = 'en' THEN 1
                                   ELSE 0 END AS y
                       FROM documents
                       WHERE source IS NOT NULL AND lang IS NOT NULL)
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(y)::BIGINT AS n_en,
                   ((1000000::HUGEINT * (sum(y) + 1))
                    // (count(*) + 2))::BIGINT AS enc_ppm
            FROM d GROUP BY source ORDER BY source""",
        # Lorenz points: cumulative value share at exact count deciles;
        # boundary buckets split as extra * value (equal-valued ties)
        "lorenz_points_by_type": """
            WITH h AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT)
                                AS cents,
                              count(*)::HUGEINT AS n
                       FROM events WHERE value IS NOT NULL
                       GROUP BY event_type, cents),
            c AS (SELECT event_type, cents, n,
                         COALESCE(sum(n) OVER w, 0) AS cum_before,
                         COALESCE(sum(n * cents) OVER w, 0)
                           AS cumv_before
                  FROM h
                  WINDOW w AS (PARTITION BY event_type ORDER BY cents
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING)),
            t AS (SELECT event_type, sum(n)::HUGEINT AS nn,
                         sum(n * cents)::HUGEINT AS tot
                  FROM h GROUP BY event_type),
            ks AS (SELECT t.event_type, g.i AS decile,
                          ((g.i * t.nn + 9) // 10) AS depth, t.tot
                   FROM t, range(1, 11) g(i)
                   WHERE t.nn > 0 AND t.tot > 0),
            j AS (SELECT ks.event_type, ks.decile, ks.depth, ks.tot,
                         (c.cumv_before
                          + (ks.depth - c.cum_before) * c.cents) AS cv
                  FROM ks JOIN c ON c.event_type = ks.event_type
                               AND c.cum_before < ks.depth
                               AND ks.depth <= c.cum_before + c.n)
            SELECT event_type, decile::BIGINT AS decile,
                   depth::BIGINT AS depth, cv::BIGINT AS cum_cents,
                   ((1000000::HUGEINT * cv) // tot)::BIGINT
                     AS share_ppm
            FROM j ORDER BY event_type, decile""",
        # unnormalized integer Haar: pair sums/diffs, 3 unrolled levels
        "haar_hourly_decompose": """
            WITH h AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
                              count(*)::BIGINT AS n
                       FROM events WHERE ts IS NOT NULL GROUP BY 1),
            grid AS (SELECT g.i AS idx, COALESCE(h.n, 0)::BIGINT AS v
                     FROM range(0, 32) g(i)
                     LEFT JOIN h ON h.hour = g.i),
            l1 AS (SELECT a.idx // 2 AS idx, a.v + b.v AS s,
                          a.v - b.v AS d
                   FROM grid a JOIN grid b ON b.idx = a.idx + 1
                   WHERE a.idx % 2 = 0),
            l2 AS (SELECT a.idx // 2 AS idx, a.s + b.s AS s,
                          a.s - b.s AS d
                   FROM l1 a JOIN l1 b ON b.idx = a.idx + 1
                   WHERE a.idx % 2 = 0),
            l3 AS (SELECT a.idx // 2 AS idx, a.s + b.s AS s,
                          a.s - b.s AS d
                   FROM l2 a JOIN l2 b ON b.idx = a.idx + 1
                   WHERE a.idx % 2 = 0)
            SELECT 'd1' AS kind, idx::BIGINT AS idx, d::BIGINT AS coef
            FROM l1
            UNION ALL SELECT 'd2', idx::BIGINT, d::BIGINT FROM l2
            UNION ALL SELECT 'd3', idx::BIGINT, d::BIGINT FROM l3
            UNION ALL SELECT 's3', idx::BIGINT, s::BIGINT FROM l3
            ORDER BY kind, idx""",
        # token-mass coverage of the top-10/100/1000 vocabulary ranks
        "vocab_coverage_curve": """
            WITH wc AS (SELECT word, count(*)::BIGINT AS n
                        FROM (SELECT unnest(string_split(text, ' '))
                                AS word
                              FROM documents WHERE text IS NOT NULL)
                        GROUP BY word),
            r AS (SELECT n, row_number() OVER (ORDER BY n DESC, word)
                           AS rk
                  FROM wc),
            t AS (SELECT sum(n)::HUGEINT AS total,
                         count(*)::BIGINT AS nw FROM wc),
            ks AS (SELECT unnest([10, 100, 1000]) AS top_k),
            c AS (SELECT ks.top_k,
                         least(ks.top_k, t.nw) AS n_words_at_k,
                         (SELECT sum(n) FROM r
                          WHERE rk <= ks.top_k)::HUGEINT AS covered,
                         t.total
                  FROM ks, t)
            SELECT top_k::BIGINT AS top_k,
                   n_words_at_k::BIGINT AS n_words_at_k,
                   covered::BIGINT AS covered, total::BIGINT AS total,
                   ((1000000::HUGEINT * covered) // total)::BIGINT
                     AS coverage_ppm
            FROM c ORDER BY top_k""",
        # share of users with lifetime >= d days, d in 0..29
        "user_lifetime_survival": """
            WITH u AS (SELECT user_id,
                              (epoch_us(max(ts)) - epoch_us(min(ts)))
                                // 86400000000 AS life
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                       GROUP BY user_id),
            t AS (SELECT count(*)::HUGEINT AS n FROM u),
            d AS (SELECT g.i::BIGINT AS day FROM range(0, 30) g(i))
            SELECT d.day,
                   (SELECT count(*) FROM u
                    WHERE u.life >= d.day)::BIGINT AS n_surviving,
                   ((1000000::HUGEINT * (SELECT count(*) FROM u
                     WHERE u.life >= d.day)) // t.n)::BIGINT
                     AS survival_ppm
            FROM d, t ORDER BY d.day""",
        # Pearson moments over doubled tie-average ranks (all integers)
        "spearman_quantity_price": """
            WITH r AS (SELECT CAST(round(l_quantity * 100) AS BIGINT)
                              // 100 AS x,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                              // 100 AS y
                       FROM lineitem),
            hx AS (SELECT x AS val, count(*)::HUGEINT AS cnt
                   FROM r GROUP BY 1),
            rx AS (SELECT val, 2 * sum(cnt) OVER
                          (ORDER BY val ROWS UNBOUNDED PRECEDING)
                          - cnt + 1 AS r2
                   FROM hx),
            hy AS (SELECT y AS val, count(*)::HUGEINT AS cnt
                   FROM r GROUP BY 1),
            ry AS (SELECT val, 2 * sum(cnt) OVER
                          (ORDER BY val ROWS UNBOUNDED PRECEDING)
                          - cnt + 1 AS r2
                   FROM hy),
            m AS (SELECT rx.r2 AS rx2, ry.r2 AS ry2
                  FROM r JOIN rx ON rx.val = r.x
                         JOIN ry ON ry.val = r.y)
            SELECT count(*)::BIGINT AS n,
                   sum(rx2)::BIGINT AS sum_x, sum(ry2)::BIGINT AS sum_y,
                   sum(rx2 * ry2)::BIGINT AS sum_xy,
                   sum(rx2 * rx2)::BIGINT AS sum_x2,
                   sum(ry2 * ry2)::BIGINT AS sum_y2
            FROM m""",
        # 2x2 chi-squared over doc-level word presence, top-10 per lang
        "chi2_word_lang": """
            WITH base AS (SELECT doc_id, lang, text FROM documents
                          WHERE text IS NOT NULL AND lang IS NOT NULL),
            dw AS (SELECT DISTINCT doc_id, lang, word FROM (
                     SELECT doc_id, lang,
                            unnest(string_split(text, ' ')) AS word
                     FROM base)),
            wl AS (SELECT word, lang, count(*)::HUGEINT AS a
                   FROM dw GROUP BY 1, 2),
            df AS (SELECT word, sum(a)::HUGEINT AS dfw
                   FROM wl GROUP BY 1),
            nl AS (SELECT lang, count(*)::HUGEINT AS nl
                   FROM base GROUP BY 1),
            tot AS (SELECT count(*)::HUGEINT AS n FROM base),
            sc AS (SELECT wl.lang, wl.word, wl.a, df.dfw, nl.nl, t.n,
                          (wl.a * (t.n - nl.nl - (df.dfw - wl.a))
                           - (df.dfw - wl.a) * (nl.nl - wl.a)) AS delta
                   FROM wl JOIN df USING (word)
                           JOIN nl USING (lang), tot t
                   WHERE df.dfw >= 5 AND df.dfw < t.n
                     AND nl.nl < t.n),
            scored AS (SELECT lang, word, a,
                              ((1000000::HUGEINT * n * delta * delta)
                               // (dfw * (n - dfw) * nl * (n - nl)))
                                AS chi2
                       FROM sc WHERE delta > 0),
            rnk AS (SELECT lang, word, a, chi2,
                           row_number() OVER (PARTITION BY lang
                             ORDER BY chi2 DESC, word) AS rk
                    FROM scored)
            SELECT lang, word, a::BIGINT AS n_docs,
                   chi2::BIGINT AS chi2_ppm, rk::BIGINT AS rk
            FROM rnk WHERE rk <= 10 ORDER BY lang, rk""",
        # weighted-Gini stump: minimize (aL*bL*nR + aR*bR*nL)/(nL*nR)
        "gini_stump_value_purchase": """
            WITH h AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents,
                              count(*)::HUGEINT AS n,
                              sum(CASE WHEN event_type = 'purchase'
                                  THEN 1 ELSE 0 END)::HUGEINT AS a
                       FROM events WHERE value IS NOT NULL GROUP BY 1),
            t AS (SELECT sum(n)::HUGEINT AS n_t, sum(a)::HUGEINT AS a_t
                  FROM h),
            c AS (SELECT cents, sum(n) OVER w AS nl, sum(a) OVER w AS al
                  FROM h WINDOW w AS (ORDER BY cents
                                      ROWS UNBOUNDED PRECEDING)),
            s AS (SELECT c.cents, c.nl, c.al, t.n_t - c.nl AS nr,
                         t.a_t - c.al AS ar
                  FROM c, t WHERE t.n_t - c.nl > 0),
            sc AS (SELECT cents, nl, al, nr, ar,
                          ((1000000000000::HUGEINT
                            * (al * (nl - al) * nr + ar * (nr - ar) * nl))
                           // (nl * nr)) AS score
                   FROM s)
            SELECT cents::BIGINT AS threshold_cents, nl::BIGINT AS n_left,
                   al::BIGINT AS n_purchase_left, nr::BIGINT AS n_right,
                   ar::BIGINT AS n_purchase_right,
                   score::BIGINT AS score_p12
            FROM sc ORDER BY score, cents LIMIT 1""",
        # first-view -> first-purchase gap quartiles in quadrupled minutes
        "conversion_latency_quartiles": """
            WITH u AS (SELECT user_id,
                              min(CASE WHEN event_type = 'view'
                                  THEN ts END) AS v,
                              min(CASE WHEN event_type = 'purchase'
                                  THEN ts END) AS p
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                       GROUP BY 1),
            g AS (SELECT (epoch_us(p) - epoch_us(v)) // 60000000
                           AS gap_min
                  FROM u WHERE v IS NOT NULL AND p IS NOT NULL
                    AND p > v),
            r AS (SELECT gap_min,
                         row_number() OVER (ORDER BY gap_min) - 1 AS i
                  FROM g),
            t AS (SELECT count(*)::BIGINT AS n FROM g),
            qs AS (SELECT unnest([1, 2, 3]) AS q),
            pos AS (SELECT qs.q, ((t.n - 1) * qs.q) // 4 AS lo,
                           ((t.n - 1) * qs.q) % 4 AS r4, t.n
                    FROM qs, t WHERE t.n > 0)
            SELECT pos.q::BIGINT AS q, pos.n AS n_users,
                   (a.gap_min * (4 - pos.r4)
                    + b.gap_min * pos.r4)::BIGINT AS gap4_min
            FROM pos JOIN r a ON a.i = pos.lo
            JOIN r b ON b.i = least(pos.lo + CASE WHEN pos.r4 > 0
                                    THEN 1 ELSE 0 END, pos.n - 1)
            ORDER BY q""",
        # WebDataset tar-shard round trip: same aggregate contract as
        # the ORC/Feather/Avro round trips
        "wds_roundtrip": """
            SELECT lang, count(*)::BIGINT AS n_rows,
                   sum(doc_id)::BIGINT AS id_sum,
                   coalesce(sum(length(text)), 0)::BIGINT AS text_chars
            FROM documents GROUP BY lang""",
        # versioned-table MERGE: v2 = unmatched v1 rows + the changed
        # batch (doc_id % 7 = 0 -> lang 'xx', n_chars + 1000)
        "table_format_upsert": """
            WITH up AS (SELECT doc_id, 'xx' AS lang,
                               n_chars + 1000 AS n_chars
                        FROM documents WHERE doc_id % 7 = 0),
            keep AS (SELECT doc_id, lang, n_chars FROM documents
                     WHERE doc_id % 7 <> 0),
            m AS (SELECT * FROM keep UNION ALL SELECT * FROM up)
            SELECT lang, count(*)::BIGINT AS n_rows,
                   sum(doc_id)::BIGINT AS id_sum,
                   sum(n_chars)::BIGINT AS chars_sum
            FROM m GROUP BY lang""",
        # compaction conserves rows: both snapshots aggregate the table
        "table_format_compact": """
            WITH a AS (SELECT count(*)::BIGINT AS n_rows,
                              sum(doc_id)::BIGINT AS id_sum,
                              sum(n_chars)::BIGINT AS chars_sum
                       FROM documents)
            SELECT 1::BIGINT AS version, n_rows, id_sum, chars_sum FROM a
            UNION ALL
            SELECT 2::BIGINT, n_rows, id_sum, chars_sum FROM a
            ORDER BY version""",
        # zone-map pruned scan == plain predicate scan
        "zonemap_pruned_stats": """
            SELECT count(*)::BIGINT AS n_rows,
                   coalesce(sum(doc_id), 0)::BIGINT AS id_sum,
                   coalesce(sum(n_chars), 0)::BIGINT AS chars_sum
            FROM documents WHERE n_chars >= 150 AND n_chars < 300""",
        # l-diversity: QI groups with < 3 distinct sensitive values
        "l_diversity_audit": """
            WITH g AS (SELECT lang, n_chars // 50 AS bucket,
                              count(*)::BIGINT AS n_rows,
                              count(DISTINCT source)::BIGINT AS l
                       FROM documents
                       WHERE lang IS NOT NULL AND source IS NOT NULL
                         AND n_chars IS NOT NULL
                       GROUP BY 1, 2)
            SELECT lang, bucket::BIGINT AS bucket, n_rows, l
            FROM g WHERE l < 3 ORDER BY lang, bucket""",
        # Misra-Gries candidates + exact verify == plain HAVING
        "mg_heavy_hitters_events": """
            WITH c AS (SELECT user_id, count(*)::BIGINT AS n_events
                       FROM events WHERE user_id IS NOT NULL
                       GROUP BY 1),
            t AS (SELECT count(*)::BIGINT AS n FROM events
                  WHERE user_id IS NOT NULL)
            SELECT user_id, n_events FROM c, t
            WHERE 200 * n_events > n ORDER BY user_id""",
        # grouped OLS slope of quantity on discount (bps), HUGEINT
        "elasticity_by_brand": """
            WITH j AS (SELECT p.p_brand,
                              CAST(round(l.l_discount * 10000) AS BIGINT)
                                AS d,
                              CAST(round(l.l_quantity) AS BIGINT) AS q
                       FROM lineitem l
                       JOIN part p ON p.p_partkey = l.l_partkey
                       WHERE l.l_discount IS NOT NULL
                         AND l.l_quantity IS NOT NULL),
            m AS (SELECT p_brand, count(*)::HUGEINT AS n,
                         sum(d)::HUGEINT AS sd, sum(q)::HUGEINT AS sq,
                         sum(d * q)::HUGEINT AS sdq,
                         sum(d * d)::HUGEINT AS sdd
                  FROM j GROUP BY 1)
            SELECT p_brand, n::BIGINT AS n,
                   (CASE WHEN n * sdq - sd * sq >= 0 THEN 1 ELSE -1 END
                    * ((1000000::HUGEINT * abs(n * sdq - sd * sq))
                       // (n * sdd - sd * sd)))::BIGINT AS slope_ppm
            FROM m WHERE n * sdd - sd * sd > 0 ORDER BY p_brand""",
    }
