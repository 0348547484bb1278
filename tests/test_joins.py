"""asof_join (rayschema.joins): backward inclusive as-of semantics vs a
brute-force reference — ties, exact-timestamp matches, unmatched lefts,
groups straddling sorted blocks."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def asof_data():
    rng = np.random.default_rng(21)
    n_keys, n_left, n_right = 37, 4000, 3000
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left).astype(np.int64),
        "lt": rng.integers(0, 1000, n_left).astype(np.int64),
        "lid": np.arange(n_left, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys + 5, n_right).astype(np.int64),  # some keys have no lefts
        "rt": rng.integers(0, 1000, n_right).astype(np.int64),
        "rid": np.arange(n_right, dtype=np.int64),
        "payload": rng.integers(0, 10**6, n_right).astype(np.int64),
    })
    # force exact-timestamp ties: duplicate some right timestamps
    right.loc[:50, "rt"] = right.loc[51:101, "rt"].to_numpy()[:51]
    return left, right


def brute_asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    out = []
    for _, lrow in left.iterrows():
        cand = right[(right["k"] == lrow["k"]) & (right["rt"] <= lrow["lt"])]
        if len(cand):
            best = cand.sort_values(["rt", "rid"]).iloc[-1]   # latest; tie -> max rid
            out.append((lrow["lid"], best["rid"], best["payload"]))
        else:
            out.append((lrow["lid"], None, None))
    return pd.DataFrame(out, columns=["lid", "rid", "payload"])


def test_asof_join_matches_bruteforce(ray_session, asof_data):
    import ray.data as rd

    from rayschema.joins import asof_join

    left, right = asof_data
    lds = rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)) \
        .repartition(8)
    rds = rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)) \
        .repartition(8)
    got = asof_join(lds, rds, key_col="k", left_ts_col="lt", right_ts_col="rt",
                    left_keep={"lid": pa.int64()},
                    right_keep={"rid": pa.int64(), "payload": pa.int64()},
                    tie_col="rid").to_pandas()
    exp = brute_asof(left, right)
    g = got.sort_values("lid").reset_index(drop=True)
    e = exp.sort_values("lid").reset_index(drop=True)
    assert len(g) == len(e) == len(left)
    pd.testing.assert_frame_equal(
        g[["lid", "rid", "payload"]].astype("float64"),
        e.astype("float64"), check_dtype=False)


def test_asof_join_all_unmatched(ray_session):
    import ray.data as rd

    from rayschema.joins import asof_join

    left = pd.DataFrame({"k": [1, 2], "lt": [5, 5],
                         "lid": np.array([0, 1], dtype=np.int64)})
    right = pd.DataFrame({"k": [1], "rt": [9],
                          "rid": np.array([7], dtype=np.int64)})
    got = asof_join(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
        rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
        key_col="k", left_ts_col="lt", right_ts_col="rt",
        left_keep={"lid": pa.int64()}, right_keep={"rid": pa.int64()},
        tie_col="rid").to_pandas()
    assert len(got) == 2
    assert got["rid"].isna().all()


def test_range_join_matches_bruteforce(ray_session, asof_data):
    import ray.data as rd

    from rayschema.joins import range_join

    left, right = asof_data
    r = right.copy()
    r["rt_end"] = r["rt"] + 50      # closed 50-tick windows
    lds = rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)) \
        .repartition(8)
    rds = rd.from_arrow(pa.Table.from_pandas(r, preserve_index=False)) \
        .repartition(8)
    got = range_join(lds, rds, key_col="k", left_ts_col="lt",
                     right_start_col="rt", right_end_col="rt_end",
                     right_id_col="rid",
                     left_keep={"lid": pa.int64()},
                     right_keep={"rid": pa.int64(), "payload": pa.int64()}) \
        .to_pandas()
    exp = left.merge(r, on="k")
    exp = exp[(exp["lt"] >= exp["rt"]) & (exp["lt"] <= exp["rt_end"])]
    got_set = set(zip(got["lid"], got["rid"], got["payload"]))
    exp_set = set(zip(exp["lid"], exp["rid"], exp["payload"]))
    assert len(got) == len(exp)
    assert got_set == exp_set
    # closed-bound edges: an interval starting or ending exactly at lt counts
    assert ((exp["lt"] == exp["rt"]) | (exp["lt"] == exp["rt_end"])).any()


def test_q3_shipping_priority_three_way_join(ray_session, tmp_path):
    """3-way join + exact revenue + top-10 against an in-test DuckDB
    mirror on a corner-case fixture (boundary dates, excluded segment,
    orders with no lineitem after the ship cut)."""
    import duckdb
    import pyarrow.parquet as pq

    from rayschema.queries import q3_shipping_priority

    cust = pd.DataFrame({
        "c_custkey": [1, 2, 3],
        "c_name": ["a", "b", "c"],
        "c_mktsegment": ["BUILDING", "AUTO", "BUILDING"],
    })
    orders = pd.DataFrame({
        "o_orderkey": [10, 11, 12, 13],
        "o_custkey": [1, 1, 2, 3],
        "o_totalprice": [1.0, 2.0, 3.0, 4.0],
        # order 11 ON the cut date -> excluded by the strict <
        "o_orderdate": pd.to_datetime(
            ["1995-01-01", "1995-03-15", "1995-01-02", "1995-02-01"]),
        "o_orderpriority": ["1-URGENT"] * 4,
    })
    li = pd.DataFrame({
        "l_orderkey": [10, 10, 12, 13, 13],
        "l_extendedprice": [100.0, 200.0, 300.0, 400.0, 500.0],
        "l_discount": [0.1, 0.0, 0.05, 0.02, 0.02],
        # one of order 13's items ships ON the cut -> excluded (strict >)
        "l_shipdate": pd.to_datetime(
            ["1995-06-01", "1995-07-01", "1995-06-01", "1995-03-15",
             "1995-04-01"]),
    })
    for name, df in (("customer", cust), ("orders", orders),
                     ("lineitem", li)):
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(tmp_path / f"{name}.parquet"))
    got = q3_shipping_priority(str(tmp_path))
    con = duckdb.connect()
    for name, df in (("customer", cust), ("orders", orders),
                     ("lineitem", li)):
        con.register(name, df)
    exp = con.execute("""
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
        GROUP BY 1, 2 ORDER BY revenue_e4 DESC, l.l_orderkey LIMIT 10
    """).df()
    assert got["l_orderkey"].tolist() == exp["l_orderkey"].tolist()
    assert got["revenue_e4"].tolist() == exp["revenue_e4"].tolist()
    # order 10 only (cust 1, BUILDING, pre-cut); order 12 is AUTO,
    # order 11 on the date cut; order 13 keeps one post-cut item
    assert set(got["l_orderkey"]) == {10, 13}
