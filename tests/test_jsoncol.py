"""Dynamic JSON-column validation: homogeneous fast path, shape-grouped
heterogeneous fallback, parse failures."""

import pyarrow as pa

from rayschema.jsoncol import JsonColumnValidator

SCHEMA = '{"type":"object","required":["k"],"properties":{"k":{"type":"integer","minimum":0,"maximum":50}}}'


def run(texts):
    v = JsonColumnValidator(SCHEMA, json_col="props", keep_cols=["event_id"])
    t = pa.table({"event_id": list(range(len(texts))),
                  "props": pa.array(texts, type=pa.string())})
    return v(t)


def test_homogeneous_batch():
    out = run(['{"k": 3}', '{"k": 99}', '{"k": -1}', None, "{}"])
    assert out["valid"].to_pylist() == [True, False, False, True, False]
    assert out["json_ok"].to_pylist() == [True] * 5


def test_bad_json_rows():
    out = run(['{"k": 1}', "{nope", ""])
    assert out["json_ok"].to_pylist() == [True, False, False]
    assert out["valid"].to_pylist() == [True, False, False]


def test_heterogeneous_shapes_grouped():
    # k as int vs string vs nested object in ONE batch: pa.array over the
    # whole batch fails, the shape-grouped fallback validates each shape
    # vectorized and keeps per-row verdicts independent
    out = run([
        '{"k": 3}',
        '{"k": "three"}',            # wrong type -> invalid
        '{"k": {"deep": 1}}',        # wrong type -> invalid
        '{"k": 50, "extra": [1,2]}',  # valid (extra allowed)
        '{"k": 51}',                 # above maximum -> invalid
        '[1, 2, 3]',                 # not an object -> invalid
    ])
    assert out["valid"].to_pylist() == [True, False, False, True, False, False]
    assert out["json_ok"].to_pylist() == [True] * 6
    assert out["n_violations"].to_pylist()[0] == 0
    assert out["n_violations"].to_pylist()[1] >= 1
