"""Run the vendored-style draft-07 corpus (tests/draft7_suite_data/ — a
reconstruction of the public json-schema-org/JSON-Schema-Test-Suite draft7
layout; see the _gen_part*.py provenance notes) against the engine's
dynamic-JSON column validator, the round-4 verdict's #4 ask.

Each suite group runs as ONE columnar batch: every test instance is JSON-
encoded into a string column and validated by JsonColumnValidator with the
group's schema — so the corpus exercises the exact code path the engine
uses for `events.props`-style dynamic JSON columns (shape-grouped Arrow
conversion + the shared compiled vectorized validator).

Documented adaptations (the engine is columnar, not instance-oriented):

1. **null instances**: the engine's convention is null-as-absent (a null
   cell passes value constraints and a null object member counts as an
   absent member), matching SQL/Arrow semantics rather than JSON-instance
   semantics — a deliberate, tested design choice (see
   tests/test_compile.py). Any test whose instance IS or CONTAINS a JSON
   null is skipped: even where the verdicts happen to coincide they do so
   for different reasons, so counting them would overstate fidelity.
2. **Arrow-unrepresentable instances**: mixed-type arrays (e.g.
   [1, "foo"]) and other shapes pa.array() cannot hold are treated by the
   engine as unconvertible -> invalid (jsoncol.py's documented fallback).
   Such tests are skipped in BOTH directions — when the official verdict
   is "invalid" the engine agrees, but for the wrong reason, so counting
   it as a pass would overstate fidelity.

Everything else must pass exactly. The skip counter is asserted small so
silent skip growth cannot hide regressions.
"""

import glob
import json
import os

import pyarrow as pa
import pytest

from rayschema.jsoncol import JsonColumnValidator

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "draft7_suite_data")

_SKIPPED = []
_RAN = [0]


def _load_groups():
    groups = []
    for path in sorted(glob.glob(os.path.join(DATA_DIR, "*.json"))):
        fname = os.path.basename(path)[:-5]
        with open(path) as f:
            for gi, group in enumerate(json.load(f)):
                groups.append(pytest.param(
                    group, id=f"{fname}:{group['description'][:60]}"))
    return groups


def _representable(data) -> bool:
    try:
        pa.array([data])
        return True
    except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
        return False


def _contains_null(x) -> bool:
    if x is None:
        return True
    if isinstance(x, dict):
        return any(_contains_null(v) for v in x.values())
    if isinstance(x, list):
        return any(_contains_null(v) for v in x)
    return False


def _skip_reason(test):
    data = test["data"]
    if _contains_null(data):
        return "null-as-absent convention"
    if not _representable(data):
        return "not Arrow-representable"
    return None


@pytest.mark.parametrize("group", _load_groups())
def test_draft7_corpus_group(group):
    tests = group["tests"]
    runnable = [t for t in tests if _skip_reason(t) is None]
    for t in tests:
        r = _skip_reason(t)
        if r is not None:
            _SKIPPED.append((group["description"], t["description"], r))
    if not runnable:
        pytest.skip("no Arrow-runnable tests in group")
    v = JsonColumnValidator(json.dumps(group["schema"]), json_col="j")
    col = pa.array([json.dumps(t["data"]) for t in runnable],
                   type=pa.string())
    out = v(pa.table({"j": col}))
    got = out.column("valid").to_pylist()
    _RAN[0] += len(runnable)
    bad = [(t["description"], t["data"], t["valid"], g)
           for t, g in zip(runnable, got) if g != t["valid"]]
    assert not bad, bad


def test_draft7_corpus_coverage_summary():
    """Runs last (file ordering): the corpus must have actually executed
    the vast majority of its cases — skips are the exception, not the
    rule, and growth in the skip list is a visible failure."""
    total = 0
    for path in glob.glob(os.path.join(DATA_DIR, "*.json")):
        with open(path) as f:
            total += sum(len(g["tests"]) for g in json.load(f))
    assert total >= 500
    assert _RAN[0] >= total * 0.9, (_RAN[0], total, _SKIPPED)
