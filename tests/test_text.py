"""Text-analysis operator tests: token counting (incl. the SQL-mirror
formula), language ID, quality scoring, fingerprints."""

import numpy as np
import pandas as pd
import pyarrow as pa

from rayschema.text import (
    BpeishTokenCounter,
    Fingerprinter,
    LangId,
    quality_batch,
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
