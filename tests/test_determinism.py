"""Determinism certification: every contract query must be
bit-reproducible run-to-run (same session, same input) — the property
all the hash-exact oracles rely on. Guards against future
nondeterminism creeping in (unordered folds, set iteration, float
reductions) for a representative spread of shapes: broadcast
selection, hash shuffle-shard, keyed sorted scan, OR-fold groupby,
stateless token hashing."""

import pandas as pd

SF = "/root/testdata/sf0.001"


def _frame(r):
    if hasattr(r, "to_pandas"):
        r = r.to_pandas()
    df = r.reset_index(drop=True)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_twice(fn):
    a, b = _frame(fn(SF)), _frame(fn(SF))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_kcenter_deterministic(ray_session):
    from rayschema.queries import kcenter_select_embeddings
    _assert_twice(kcenter_select_embeddings)


def test_shuffle_shard_deterministic(ray_session):
    from rayschema.queries import shuffle_shard_documents
    _assert_twice(shuffle_shard_documents)


def test_sessionization_deterministic(ray_session):
    from rayschema.queries import events_sessionization
    _assert_twice(events_sessionization)


def test_venn_deterministic(ray_session):
    from rayschema.queries import user_type_venn
    _assert_twice(user_type_venn)


def test_feature_hash_deterministic(ray_session):
    from rayschema.queries import feature_hash_buckets
    _assert_twice(feature_hash_buckets)
