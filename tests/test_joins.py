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
