"""Text analysis stages for large-scale training-data pipelines:
language-ID (n-gram/stopword heuristic), quality scoring, token counting,
document fingerprinting (rolling hash). All vectorized or actor-pool
map_batches stages over the `documents` table shape
(doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# --------------------------------------------------------------------------- token counting


def token_count_batch(batch: pa.Table, text_col: str = "text",
                      out: str = "token_count") -> pa.Table:
    """Whitespace token count = count(' ') + 1 (0 for empty/null).

    Exactly mirrors SQL ``len(string_split(text, ' '))`` so the DuckDB oracle
    matches value-for-value."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    spaces = pc.count_substring(col, " ")
    n = pc.add(spaces, 1)
    empty = pc.equal(pc.utf8_length(col), 0)
    n = pc.if_else(empty, pa.scalar(0, type=n.type), n)
    return batch.append_column(out, n.cast(pa.int64()))


_BPE_ISH = re.compile(r"\w+|[^\w\s]")


class BpeishTokenCounter:
    """Stage: regex token count (word + punctuation tokens), the BPE-ish
    approximation — vectorized with Arrow's RE2 count kernel."""

    def __init__(self, text_col: str = "text", out: str = "bpeish_tokens"):
        self.text_col = text_col
        self.out = out

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        counts = pc.fill_null(
            pc.count_substring_regex(col, r"\w+|[^\w\s]"), 0).cast(pa.int64())
        return batch.append_column(self.out, counts)


# --------------------------------------------------------------------------- language ID

# Tiny per-language stopword lists (public knowledge, high-frequency words).
STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "von"],
    "fr": ["le", "la", "les", "et", "est", "pour", "que", "une", "dans", "des"],
    "es": ["el", "la", "los", "que", "de", "es", "por", "una", "con", "para"],
    "zh": [],  # CJK handled by codepoint-range ratio
}


class LangId:
    """Actor stage: heuristic language ID — fully vectorized.

    Scoring: per-language stopword OCCURRENCE rate over word tokens (one
    RE2 count kernel per language, compiled once per actor) with a
    CJK-codepoint-ratio shortcut for zh. Deterministic; emits ``lang_pred``
    and ``lang_conf``."""

    def __init__(self, text_col: str = "text", head: int = 2000):
        self.text_col = text_col
        self.head = head
        # one alternation per language, word-bounded, case-insensitive
        self.lang_patterns = {
            lang: r"(?i)\b(" + "|".join(words) + r")\b"
            for lang, words in STOPWORDS.items() if words
        }
        self.cjk = r"[\x{4e00}-\x{9fff}]"

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # Arrow-native head slice (codepoints) — no pandas round-trip
        col = pc.utf8_slice_codeunits(pc.fill_null(col.cast(pa.string()), ""),
                                      0, self.head)
        n = len(col)
        n_words = pc.count_substring_regex(col, r"[A-Za-z]+").to_numpy(zero_copy_only=False)
        denom = np.maximum(n_words, 1).astype(np.float64)
        langs = list(self.lang_patterns)
        scores = np.zeros((n, len(langs)))
        for j, lang in enumerate(langs):
            hits = pc.count_substring_regex(col, self.lang_patterns[lang])
            scores[:, j] = hits.to_numpy(zero_copy_only=False) / denom
        best_j = scores.argmax(axis=1)
        best_score = scores[np.arange(n), best_j]
        preds = np.array(langs, dtype=object)[best_j]
        preds = np.where(best_score == 0.0, "unknown", preds)
        from rayschema.dedup import round_half_away

        confs = round_half_away(best_score, 4)   # DuckDB round() semantics
        # CJK shortcut: ratio of CJK codepoints in the head
        cjk_counts = pc.count_substring_regex(
            col, self.cjk).to_numpy(zero_copy_only=False)
        head_len = np.maximum(
            pc.utf8_length(col).to_numpy(zero_copy_only=False), 1)
        cjk_ratio = cjk_counts / np.minimum(head_len, 400)
        is_zh = cjk_ratio > 0.2
        preds = np.where(is_zh, "zh", preds)
        confs = np.where(is_zh, round_half_away(cjk_ratio, 4), confs)
        return (batch
                .append_column("lang_pred", pa.array(preds, type=pa.string()))
                .append_column("lang_conf", pa.array(confs, type=pa.float64())))


# --------------------------------------------------------------------------- quality scoring


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized quality signals: length, alpha ratio, digit ratio,
    punct ratio, mean token length, and a composite [0,1] quality score.
    Heuristics in the style of C4/Gopher text-quality filters (public)."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    length = pc.fill_null(pc.utf8_length(col), 0).cast(pa.float64())
    n = len(col)

    def count_rx(pattern: str) -> pa.Array:
        return pc.fill_null(pc.count_substring_regex(col, pattern), 0).cast(pa.float64())

    alpha = count_rx(r"[A-Za-z]")
    digit = count_rx(r"[0-9]")
    punct = count_rx(r"[^\w\s]")
    spaces = count_rx(r" ")
    denom = pc.max_element_wise(length, pa.scalar(1.0))
    alpha_ratio = pc.divide(alpha, denom)
    digit_ratio = pc.divide(digit, denom)
    punct_ratio = pc.divide(punct, denom)
    tokens = pc.add(spaces, 1.0)
    mean_tok = pc.divide(length, tokens)
    ln = length.to_numpy(zero_copy_only=False)
    # ln(1+x) (not log1p) so the DuckDB oracle's ln(1 + length) mirrors the
    # same float64 ops; 1+len is integer-exact so precision is identical
    len_score = np.clip(np.log(1.0 + ln) / np.log(1000.0), 0.0, 1.0)
    a = alpha_ratio.to_numpy(zero_copy_only=False)
    d = digit_ratio.to_numpy(zero_copy_only=False)
    p = punct_ratio.to_numpy(zero_copy_only=False)
    score = np.clip(0.4 * len_score + 0.5 * a - 0.2 * d - 0.1 * np.maximum(p - 0.2, 0), 0.0, 1.0)
    return (batch
            .append_column("q_len", length.cast(pa.int64()))
            .append_column("alpha_ratio", alpha_ratio)
            .append_column("digit_ratio", digit_ratio)
            .append_column("punct_ratio", punct_ratio)
            .append_column("mean_token_len", mean_tok)
            .append_column("quality", pa.array(score)))


# --------------------------------------------------------------------------- repetition metrics


def _flatten_words_arrow(col):
    """Split a string column on single spaces and flatten, keeping the
    word array AS ARROW so callers feed it straight to the C++ hash
    kernels (pc.value_counts / pc.index_in / dictionary_encode) —
    measured ~5x the numpy-object path. Returns (flat_words_arrow,
    words_per_doc, doc_index_per_word). Mirrors SQL
    ``unnest(string_split(text, ' '))`` exactly (empty text -> one empty
    word; consecutive spaces -> empty words)."""
    words = pc.split_pattern(col, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(col), dtype=np.int64), counts)
    return words.flatten(), counts, doc_idx


def _distinct_word_pairs(words, docs: np.ndarray):
    """Distinct (doc, word) pairs + per-pair multiplicities via ONE lexsort.
    Returns (doc_per_pair, word_per_pair, count_per_pair) in (doc, word)
    order. ``words`` may be a numpy array (strings or integer word-ids) or
    an ARROW string array — the Arrow form takes the fast path: C++
    dictionary_encode hashes every occurrence, only the (small) dictionary
    is argsorted for lexicographic ranks, and the big lexsort runs over
    int codes instead of Python objects. Output is identical either way.
    The single source of this kernel for TF-IDF (df/tf), the inverted
    index, and repetition stats."""
    if isinstance(words, (pa.Array, pa.ChunkedArray)):
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        enc = words.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dict_np = enc.dictionary.to_numpy(zero_copy_only=False)
        rank = np.empty(len(dict_np), dtype=np.int64)
        rank[np.argsort(dict_np)] = np.arange(len(dict_np))
        w_key = rank[codes]
    else:
        codes = dict_np = None
        w_key = words
    order = np.lexsort((w_key, docs))
    d_s, k_s = docs[order], w_key[order]
    new = np.ones(len(d_s), dtype=bool)
    new[1:] = (d_s[1:] != d_s[:-1]) | (k_s[1:] != k_s[:-1])
    starts = np.nonzero(new)[0]
    mult = np.diff(np.append(starts, len(d_s))).astype(np.int64)
    w_out = dict_np[codes[order][new]] if codes is not None else k_s[new]
    return d_s[new], w_out, mult


def repetition_stats_batch(batch: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Gopher/C4-style within-document repetition signals, fully vectorized:
    per doc the word count, duplicate-word count (occurrences beyond the
    first), the max single-word frequency, and the duplicate word-2-gram
    count. One split kernel + numpy unique/lexsort per batch — no per-doc
    Python. Null texts are dropped (mirrors the oracle's WHERE)."""
    valid = pc.is_valid(batch.column(text_col))
    batch = batch.filter(valid)
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "n_words": pa.array([], type=pa.int64()),
            "n_dup_words": pa.array([], type=pa.int64()),
            "max_word_freq": pa.array([], type=pa.int64()),
            "n_dup_2grams": pa.array([], type=pa.int64()),
        })
    flat_a, n_words, doc_idx = _flatten_words_arrow(col)
    # word identity codes from the C++ dictionary hash (order-free: only
    # equality matters for multiplicities and 2-grams)
    wid = (flat_a.dictionary_encode().indices
           .to_numpy(zero_copy_only=False).astype(np.int64))

    # per-doc word multiplicities: the shared distinct-pair kernel over
    # integer word-ids (cheaper to sort than the strings)
    d_new, _, mult = _distinct_word_pairs(wid, doc_idx)
    n_distinct = np.bincount(d_new, minlength=n)
    max_freq = np.zeros(n, dtype=np.int64)
    np.maximum.at(max_freq, d_new, mult)

    # word 2-grams: adjacent positions in flat order share a doc
    same = doc_idx[1:] == doc_idx[:-1]
    g_doc = doc_idx[:-1][same]
    g1, g2 = wid[:-1][same], wid[1:][same]
    n_2grams = np.bincount(g_doc, minlength=n)
    gorder = np.lexsort((g2, g1, g_doc))
    gd, ga, gb = g_doc[gorder], g1[gorder], g2[gorder]
    gnew = np.ones(len(gd), dtype=bool)
    gnew[1:] = (gd[1:] != gd[:-1]) | (ga[1:] != ga[:-1]) | (gb[1:] != gb[:-1])
    n_distinct_2 = np.bincount(gd[gnew], minlength=n)

    return pa.table({
        "doc_id": batch.column(id_col).cast(pa.int64()),
        "n_words": pa.array(n_words.astype(np.int64)),
        "n_dup_words": pa.array((n_words - n_distinct).astype(np.int64)),
        "max_word_freq": pa.array(max_freq),
        "n_dup_2grams": pa.array((n_2grams - n_distinct_2).astype(np.int64)),
    })


GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "that", "is")
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3, 10          # mean word length bounds
GOPHER_ALPHA_NUM, GOPHER_ALPHA_DEN = 4, 5       # alpha-word fraction >= 4/5
GOPHER_MIN_STOP_HITS = 2


def gopher_flags_batch(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """Gopher-style document quality rules (Rae et al. 2021, public
    heuristics), doc-level and fully vectorized: word-count bounds, mean
    word length bounds, fraction of words containing an alphabetic
    character, and a stopword-presence check. The pass flag compares
    integer cross-products (3*n <= sum_len <= 10*n, 5*n_alpha >= 4*n) so
    threshold decisions are exact on both the engine and the SQL oracle;
    the reported ratios are single divisions of exact integers, so the
    float64 bits match DuckDB's. Null texts are dropped (mirrors the
    oracle's WHERE). One split kernel + three bincounts per batch."""
    batch = batch.filter(pc.is_valid(batch.column(text_col)))
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "n_words": pa.array([], type=pa.int64()),
            "mean_word_len": pa.array([], type=pa.float64()),
            "alpha_word_frac": pa.array([], type=pa.float64()),
            "n_stop_hits": pa.array([], type=pa.int64()),
            "gopher_pass": pa.array([], type=pa.int64()),
        })
    flat, n_words, doc_idx = _flatten_words_arrow(col)
    wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    sum_wlen = np.bincount(doc_idx, weights=wlen,
                           minlength=n).astype(np.int64)
    alpha = pc.match_substring_regex(flat, r"[A-Za-z]") \
        .to_numpy(zero_copy_only=False)
    n_alpha = np.bincount(doc_idx[alpha], minlength=n).astype(np.int64)
    stop = pc.is_in(flat, value_set=pa.array(list(GOPHER_STOPWORDS))) \
        .to_numpy(zero_copy_only=False)
    n_stop = np.bincount(doc_idx[stop], minlength=n).astype(np.int64)
    nw = n_words.astype(np.int64)
    ok = ((nw >= GOPHER_MIN_WORDS) & (nw <= GOPHER_MAX_WORDS)
          & (sum_wlen >= GOPHER_MIN_MWL * nw)
          & (sum_wlen <= GOPHER_MAX_MWL * nw)
          & (GOPHER_ALPHA_DEN * n_alpha >= GOPHER_ALPHA_NUM * nw)
          & (n_stop >= GOPHER_MIN_STOP_HITS))
    # nw is never 0 for a non-null text (split_pattern mirrors SQL
    # string_split: "" -> one empty word), but guard the division anyway
    # so a zero-word row can never emit NaN or a divide warning
    safe = np.maximum(nw, 1)
    return pa.table({
        "doc_id": batch.column(id_col).cast(pa.int64()),
        "n_words": pa.array(nw),
        "mean_word_len": pa.array(np.where(nw > 0, sum_wlen / safe, 0.0)),
        "alpha_word_frac": pa.array(np.where(nw > 0, n_alpha / safe, 0.0)),
        "n_stop_hits": pa.array(n_stop),
        "gopher_pass": pa.array(ok.astype(np.int64)),
    })


# --------------------------------------------------------------------------- decontamination


DECON_SCAN_MAX_SNIPPETS = 100   # above this, the Rabin-Karp path kicks in
DECON_RK_ANCHOR = 16            # anchor-prefix length for the RK index


class Decontaminator:
    """Actor stage: benchmark decontamination by snippet containment — the
    n-gram-overlap discipline of GPT-3/The Pile eval decontamination (public
    method), expressed as literal substring hits so the DuckDB oracle can
    recompute it exactly. The benchmark snippet set is broadcast ONCE via
    ray.put and resolved per actor in __init__.

    Two equality-tested execution paths (identical output):

    * <= ``DECON_SCAN_MAX_SNIPPETS`` snippets: one match_substring kernel
      per snippet per batch (O(snippets) — cheapest for handfuls).
    * above it (round 4 — the 10^4+-snippet scale path): an anchored
      multi-pattern Rabin-Karp index built once per actor — every
      snippet's first-``DECON_RK_ANCHOR``-codepoint rolling hash in one
      sorted array; each batch runs ONE rolling-hash pass over its
      concatenated codepoints + a searchsorted membership test
      (O(batch_chars), independent of snippet count), then verifies the
      rare candidates by direct position-anchored slice compare (hash
      collisions are killed exactly). Snippets shorter than the anchor
      fall back to the per-snippet kernel."""

    def __init__(self, snippets_ref, id_col: str = "doc_id",
                 text_col: str = "text",
                 scan_max: int = DECON_SCAN_MAX_SNIPPETS):
        import ray

        self.bench_ids, self.snippets = ray.get(snippets_ref)
        self.id_col = id_col
        self.text_col = text_col
        self.use_rk = len(self.snippets) > scan_max
        if not self.use_rk:
            self._short = list(range(len(self.snippets)))
            return
        from rayschema.dedup import _rolling_hashes

        A = DECON_RK_ANCHOR
        self._anchor = A
        self._short = [i for i, s in enumerate(self.snippets)
                       if len(s) < A]
        long_idx = [i for i, s in enumerate(self.snippets) if len(s) >= A]
        hs = np.empty(len(long_idx), dtype=np.uint64)
        for j, i in enumerate(long_idx):
            cps = np.frombuffer(
                self.snippets[i][:A].encode("utf-32-le"), dtype=np.uint32)
            hs[j] = _rolling_hashes(cps, A)[0]
        order = np.argsort(hs, kind="stable")
        self._rk_hash = hs[order]
        self._rk_idx = np.asarray(long_idx, dtype=np.int64)[order]

    def _scan_hits(self, col, ids: np.ndarray, idxs) -> np.ndarray:
        hits = np.zeros(len(ids), dtype=np.int64)
        for i in idxs:
            m = pc.fill_null(pc.match_substring(col, self.snippets[i]),
                             False)
            hits += m.to_numpy(zero_copy_only=False) \
                & (ids != self.bench_ids[i])
        return hits

    def _rk_hits(self, col, ids: np.ndarray) -> np.ndarray:
        from rayschema.dedup import _codepoint_parts, _rolling_hashes

        n = len(ids)
        hits = np.zeros(n, dtype=np.int64)
        if not len(self._rk_hash):
            return hits
        A = self._anchor
        _, cpo, cps, _ = _codepoint_parts(col)
        if len(cps) < A:
            return hits
        hh = _rolling_hashes(cps, A)
        pos = np.arange(len(hh), dtype=np.int64)
        inside = (pos >= cpo[0]) & (pos + A <= cpo[-1])
        hh, pos = hh[inside], pos[inside]
        lo = np.searchsorted(self._rk_hash, hh, side="left")
        hi = np.searchsorted(self._rk_hash, hh, side="right")
        m = hi > lo
        if not m.any():
            return hits
        p, a, cnt = pos[m], lo[m], (hi - lo)[m]
        dd = np.searchsorted(cpo, p, side="right") - 1
        ok = (dd >= 0) & (dd < n)
        ok &= p + A <= cpo[np.minimum(dd, n - 1) + 1]   # window fits its doc
        p, a, cnt, dd = p[ok], a[ok], cnt[ok], dd[ok]
        # expand [a, a+cnt) hash runs -> candidate (doc, snippet, start)
        total = int(cnt.sum())
        doc_r = np.repeat(dd, cnt)
        start_r = np.repeat(p - cpo[dd], cnt)
        first = np.repeat(a, cnt)
        offs = np.arange(total, dtype=np.int64) \
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
        sn_r = self._rk_idx[first + offs]
        # group candidate windows by (doc, snippet) with one sort, then
        # verify exactly: the anchor-position prefix must extend to the
        # full snippet at SOME window (position-anchored containment);
        # a snippet counts once per doc however many windows match
        key = doc_r * np.int64(len(self.snippets) + 1) + sn_r
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        doc_s, sn_s, st_s = doc_r[order], sn_r[order], start_r[order]
        grp = np.ones(len(key_s), dtype=bool)
        grp[1:] = key_s[1:] != key_s[:-1]
        g_starts = np.nonzero(grp)[0]
        g_ends = np.append(g_starts[1:], len(key_s))
        texts = col.to_pylist()
        for gs, ge in zip(g_starts, g_ends):
            d, si = int(doc_s[gs]), int(sn_s[gs])
            if ids[d] == self.bench_ids[si]:
                continue
            s = self.snippets[si]
            t = texts[d]
            if t is None:
                continue
            for st in st_s[gs:ge]:
                st = int(st)
                if t[st:st + len(s)] == s:
                    hits[d] += 1
                    break
        return hits

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        if self.use_rk:
            hits = self._rk_hits(col, ids) \
                + self._scan_hits(col, ids, self._short)
        else:
            hits = self._scan_hits(col, ids, self._short)
        keep = hits > 0
        return pa.table({
            "doc_id": pa.array(ids[keep], type=pa.int64()),
            "n_hits": pa.array(hits[keep], type=pa.int64()),
        })


# --------------------------------------------------------------------------- pattern redaction


def redact_batch(batch: pa.Table, pattern: str, replacement: str = "<R>",
                 text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """PII-style pattern scrubbing, vectorized: RE2 count + global
    replace per batch. Emits (doc_id, n_matches, redacted_len); callers
    wanting the scrubbed text itself use ``redact_text_batch``. Null texts
    are dropped (mirrors the oracle's WHERE)."""
    batch = batch.filter(pc.is_valid(batch.column(text_col)))
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_matches = pc.count_substring_regex(col, pattern).cast(pa.int64())
    red = pc.replace_substring_regex(col, pattern, replacement)
    return pa.table({
        "doc_id": batch.column(id_col).cast(pa.int64()),
        "n_matches": n_matches,
        "redacted_len": pc.utf8_length(red).cast(pa.int64()),
    })


def redact_text_batch(batch: pa.Table, pattern: str, replacement: str = "<R>",
                      text_col: str = "text") -> pa.Table:
    """In-place scrub variant: returns the batch with ``text_col`` replaced
    by its redacted form (the shape a write-back pipeline uses)."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    red = pc.replace_substring_regex(col, pattern, replacement)
    i = batch.schema.get_field_index(text_col)
    return batch.set_column(i, text_col, red)


# --------------------------------------------------------------------------- fingerprinting
class Fingerprinter:
    """Actor stage: document fingerprint = the k smallest 64-bit rolling-hash
    values over character w-shingles (winnowing-style min-sampling; Schleimer
    et al., "Winnowing: Local Algorithms for Document Fingerprinting", 2003).
    Emits ``fingerprint`` (uint64 = min shingle hash) and ``fp_minhashes``
    (list of k mins) usable for containment estimation. Per-doc work is the
    vectorized rolling hash from rayschema.dedup (no substring objects)."""

    def __init__(self, text_col: str = "text", w: int = 16, k: int = 8):
        self.text_col = text_col
        self.w = w
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from rayschema.dedup import (
            _rolling_hashes,
            _string_parts,
            char_shingles,
        )

        col = batch.column(self.text_col)
        arr, off, data, valid = _string_parts(col)
        n = len(arr)
        import pyarrow.compute as pc

        clen = pc.fill_null(pc.utf8_length(arr), 0).to_numpy(zero_copy_only=False)
        empty = (~valid) | (clen == 0)
        short = (~empty) & (clen < self.w)
        # one rolling-hash pass over the batch's raw buffer; per-position doc
        # assignment, then per-doc unique + first-k via ONE lexsort — no
        # per-doc Python in the common path
        doc = np.empty(0, dtype=np.int64)
        h = np.empty(0, dtype=np.uint64)
        if (~(empty | short)).any() and len(data) >= self.w:
            hh = _rolling_hashes(data, self.w)
            pos = np.arange(len(hh), dtype=np.int64)
            inside = (pos >= off[0]) & (pos + self.w <= off[-1])
            hh, pos = hh[inside], pos[inside]
            dd = np.searchsorted(off, pos, side="right") - 1
            ok = (pos + self.w <= off[dd + 1]) & ~(empty | short)[dd]
            doc, h = dd[ok], hh[ok]
        if short.any():
            idx = np.nonzero(short)[0]
            sh = np.concatenate([char_shingles(arr[int(i)].as_py(), self.w)
                                 for i in idx])
            doc = np.concatenate([doc, idx])
            h = np.concatenate([h, sh])
        order = np.lexsort((h, doc))
        d, hh = doc[order], h[order]
        keep = np.ones(len(d), dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])
        d, hh = d[keep], hh[keep]
        starts = np.searchsorted(d, np.arange(n))
        rank = np.arange(len(d)) - starts[d] if len(d) else np.empty(0, np.int64)
        sel = rank < self.k
        d, hh = d[sel], hh[sel]
        counts = np.bincount(d, minlength=n)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        mins = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                        pa.array(hh, type=pa.uint64()))
        fps = np.zeros(n, dtype=np.uint64)
        first = counts > 0
        fps[first] = hh[offsets[:-1][first]]
        return (batch
                .append_column("fingerprint", pa.array(fps, type=pa.uint64()))
                .append_column("fp_minhashes", mins))


# --------------------------------------------------------------------- fuzzy
# SymSpell-style edit-distance matching (Garbe's deletion-neighborhood
# method, public algorithm): candidates via shared <=k-deletion keys,
# verified by an exact vectorized Levenshtein DP. Reference has no fuzzy
# matching; this is a §2.F engine operator (typo-dedup / fuzzy vocab join).

def pad_codepoint_matrix(words) -> tuple:
    """list[str] -> ((n, Lmax) uint32 codepoint matrix zero-padded on the
    right, int64 lengths). One encode of the joined corpus + one masked
    scatter — no per-word numpy allocation."""
    n = len(words)
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=n)
    if n == 0 or lens.max() == 0:
        return np.zeros((n, 0), dtype=np.uint32), lens
    flat = np.frombuffer("".join(words).encode("utf-32-le", "surrogatepass"),
                         dtype=np.uint32)
    L = int(lens.max())
    mat = np.zeros((n, L), dtype=np.uint32)
    mat[np.arange(L)[None, :] < lens[:, None]] = flat
    return mat, lens


def levenshtein_batch(words_a, words_b) -> np.ndarray:
    """Exact Levenshtein distance for n string PAIRS at once: the DP runs
    vectorized ACROSS pairs (both loops are over character positions, <=
    Lmax each — ~L^2 numpy ops total regardless of pair count), instead of
    one python DP per pair. Right-padding is harmless: row i's answer is
    snapshotted at DP row la[i], and DP column j never reads past j."""
    A, la = pad_codepoint_matrix(words_a)
    B, lb = pad_codepoint_matrix(words_b)
    n = len(la)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    La, Lb = A.shape[1], B.shape[1]
    dp = np.tile(np.arange(Lb + 1, dtype=np.int32), (n, 1))
    sel0 = la == 0
    out[sel0] = lb[sel0]
    for i in range(1, La + 1):
        prev = dp
        dp = np.empty_like(prev)
        dp[:, 0] = i
        cost = (A[:, i - 1][:, None] != B).astype(np.int32)
        m = np.minimum(prev[:, :-1] + cost, prev[:, 1:] + 1)
        for j in range(1, Lb + 1):
            dp[:, j] = np.minimum(m[:, j - 1], dp[:, j - 1] + 1)
        sel = la == i
        if sel.any():
            out[sel] = dp[sel, lb[sel]]
    return out


def deletion_keys(words: pa.Array, max_del: int = 2):
    """All <=``max_del``-deletion variants (including the word itself) of a
    DISTINCT-word array, vectorized by deletion position: one Arrow
    slice+join kernel pass per position (or position pair), each over only
    the words long enough. Returns (keys arrow string array, int64 index
    of the source word per key). Duplicate (key, word) rows (e.g. 'aab'
    deleting either 'a') are emitted as-is — callers dedupe."""
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    n = len(words)
    lens = pc.utf8_length(words).to_numpy(zero_copy_only=False) \
        .astype(np.int64) if n else np.empty(0, np.int64)
    maxlen = int(lens.max()) if n else 0
    BIG = 1 << 30
    keys = [words]
    idxs = [np.arange(n, dtype=np.int64)]
    for i in range(maxlen):
        sel = np.nonzero(lens > i)[0]
        w = words.take(pa.array(sel))
        k = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(w, 0, i),
            pc.utf8_slice_codeunits(w, i + 1, BIG), "")
        keys.append(k)
        idxs.append(sel)
    if max_del >= 2:
        for i in range(maxlen - 1):
            for j in range(i + 1, maxlen):
                sel = np.nonzero(lens > j)[0]
                w = words.take(pa.array(sel))
                k = pc.binary_join_element_wise(
                    pc.utf8_slice_codeunits(w, 0, i),
                    pc.utf8_slice_codeunits(w, i + 1, j),
                    pc.utf8_slice_codeunits(w, j + 1, BIG), "")
                keys.append(k)
                idxs.append(sel)
    if max_del >= 3:
        raise ValueError("deletion_keys supports max_del <= 2")
    flat = pa.concat_arrays(
        [k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
         for k in keys])
    return flat, np.concatenate(idxs)
