"""Text-analysis expression builders for LLM training-data pipelines.

All pure Column expressions (JVM-side); each has a matching SQL
rendering used by the DuckDB oracle so the driver can hash-verify the
exact same formula.  These operate on the ``documents`` table
(doc_id, text, lang, source, n_chars).

Scale note: every function here is a stateless per-row projection —
embarrassingly parallel, no shuffle, survives any scale-up as a single
codegen'd stage over the parquet scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword markers for the n-gram/stopword heuristic
# language ID.  Deliberately small + deterministic (no model deps).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "que", "de", "es"),
}

EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "was", "as", "with", "be", "at", "by",
)


def tokens(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def tokens_sql(text: str) -> str:
    return f"list_filter(regexp_split_to_array({text}, '\\s+'), t -> t <> '')"


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def token_count_sql(text: str) -> str:
    return f"len({tokens_sql(text)})::BIGINT"


def bpe_ish_token_count(text: Column) -> Column:
    """Token counting with a BPE-ish regex: words, numbers, and
    punctuation runs each count as a token (a cheap deterministic proxy
    for tokenizer cost estimates at corpus scale)."""
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).cast("bigint")


def bpe_ish_token_count_sql(text: str) -> str:
    return (
        f"len(regexp_extract_all({text}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT"
    )


def word_markers_hits(text: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens of ``text`` are in ``markers`` (case-folded)."""
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("bigint")


def word_markers_hits_sql(text: str, markers: tuple[str, ...]) -> str:
    lst = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    toks = f"list_transform({tokens_sql(text)}, t -> lower(t))"
    return f"len(list_filter({toks}, t -> list_contains({lst}, t)))::BIGINT"


def lang_id(text: Column) -> Column:
    """Pick the language whose marker words hit most; ties break to the
    lexically smallest code; 'und' = undetermined when no marker hits.
    Rendered as scalar greatest() + ordered CASE so the oracle SQL is
    formula-identical (DuckDB greatest() rejects struct args)."""
    hits = {c: word_markers_hits(text, LANG_MARKERS[c]) for c in LANG_MARKERS}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    for code in sorted(LANG_MARKERS, reverse=True):
        out = F.when((best > 0) & (hits[code] == best), F.lit(code)).otherwise(out)
    return out


def lang_id_sql(text: str) -> str:
    hits = {c: word_markers_hits_sql(text, LANG_MARKERS[c]) for c in LANG_MARKERS}
    best = f"greatest({', '.join(hits.values())})"
    whens = " ".join(
        f"WHEN {best} > 0 AND {hits[c]} = {best} THEN '{c}'"
        for c in sorted(LANG_MARKERS)
    )
    return f"(CASE {whens} ELSE 'und' END)"


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return (n_punct.cast("double") / F.greatest(F.length(text), F.lit(1))).alias(
        "punct_ratio"
    )


def punct_ratio_sql(text: str) -> str:
    return (
        f"(length(regexp_replace({text}, '[^.,;:!?]', '', 'g'))::DOUBLE"
        f" / greatest(length({text}), 1))"
    )


def stopword_ratio(text: Column) -> Column:
    return word_markers_hits(text, EN_STOPWORDS).cast("double") / F.greatest(
        token_count(text), F.lit(1)
    )


def stopword_ratio_sql(text: str) -> str:
    return (
        f"({word_markers_hits_sql(text, EN_STOPWORDS)}::DOUBLE"
        f" / greatest({token_count_sql(text)}, 1))"
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, not punct-soup,
    healthy stopword density.  Deterministic + closed form so the oracle
    can replay it."""
    len_score = F.least(F.length(text).cast("double") / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - punct_ratio(text) * 5.0, F.lit(0.0))
    stop_score = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    return (len_score * 0.4 + punct_pen * 0.3 + stop_score * 0.3).alias("quality")


def quality_score_sql(text: str) -> str:
    len_score = f"least(length({text})::DOUBLE / 500.0, 1.0)"
    punct_pen = f"greatest(1.0 - {punct_ratio_sql(text)} * 5.0, 0.0)"
    stop_score = f"least({stopword_ratio_sql(text)} * 4.0, 1.0)"
    return f"({len_score} * 0.4 + {punct_pen} * 0.3 + {stop_score} * 0.3)"


def normalized_text(text: Column) -> Column:
    """lowercase + whitespace-collapse + trim — canonical form for exact
    dedup fingerprints."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def normalized_text_sql(text: str) -> str:
    return f"trim(regexp_replace(lower({text}), '\\s+', ' ', 'g'))"


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of the normalized text (md5 matches
    between Spark and DuckDB, so it is oracle-verifiable)."""
    return F.md5(normalized_text(text))


def fingerprint_sql(text: str) -> str:
    return f"md5({normalized_text_sql(text)})"


# ---------------------------------------------------------------------------
# Deterministic integer hashing for dedup (minhash / simhash / shingles).
#
# Engine-portable by construction: a polynomial rolling hash over
# character code points with exact int64 arithmetic — both Spark and
# DuckDB evaluate it bit-identically, so the oracle can replay every
# signature.  (Spark's murmur `hash()` / DuckDB's `hash()` are
# engine-specific and would break the oracle.)
# ---------------------------------------------------------------------------

HASH_P = 1_000_000_007  # modulus; keeps acc*MULT within int64
CHAR_MULT = 31
TOK_MULT = 1_315_423_911  # combines token hashes into shingle hashes


def char_hash(t: Column) -> Column:
    """Polynomial rolling hash of a string's code points, mod HASH_P."""
    return F.aggregate(
        F.split(t, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * CHAR_MULT + F.ascii(c)) % HASH_P,
    )


def char_hash_sql(t: str) -> str:
    chars = f"list_transform(generate_series(1, length({t})), i -> ascii(substr({t}, i, 1))::BIGINT)"
    return (
        f"list_reduce(list_prepend(0::BIGINT, {chars}),"
        f" (acc, c) -> (acc * {CHAR_MULT} + c) % {HASH_P})"
    )


def token_hashes(text: Column) -> Column:
    """int64 hash per token of the normalized text."""
    return F.transform(tokens(normalized_text(text)), char_hash)


def token_hashes_sql(text: str) -> str:
    toks = tokens_sql(normalized_text_sql(text))
    return f"list_transform({toks}, t -> {char_hash_sql('t')})"


def shingle_hashes(th: Column, n: int = 3) -> Column:
    """Hashes of word n-grams, combined from consecutive token hashes.
    Empty when the document has fewer than n tokens.

    Built as slice+zip_with (not element_at inside a transform lambda):
    higher-order lambdas are interpreted, and an element_at on the full
    ``th`` expression tree re-evaluates that tree per element — slices
    evaluate it a constant number of times per row instead."""
    m = F.size(th) - (n - 1)
    out = F.slice(th, 1, m)
    for k in range(1, n):
        out = F.zip_with(
            out, F.slice(th, k + 1, m), lambda a, b: (a * TOK_MULT + b) % HASH_P
        )
    return F.when(F.size(th) >= n, out).otherwise(
        F.array().cast("array<bigint>")
    )


def shingle_hashes_sql(th: str, n: int = 3) -> str:
    h = f"{th}[i]"
    for k in range(1, n):
        h = f"(({h}) * {TOK_MULT} + {th}[i+{k}]) % {HASH_P}"
    return (
        f"(CASE WHEN len({th}) >= {n} THEN"
        f" list_transform(generate_series(1, len({th}) - {n - 1}), i -> {h})"
        f" ELSE [] END)"
    )


import re as _re

_WS = _re.compile(r"\s+")


def _token_hash_list(t: str | None) -> list:
    """Per-token polynomial hashes of one document — the single Python
    replay of ``token_hashes`` (char_hash over tokens of the normalized
    text) that every Arrow UDF builds on, so tokenization/hash changes
    stay bit-identical across all of them.  Tokenization caveat:
    Python ``\\s`` is unicode-aware while Spark/Java's is ASCII —
    identical on this corpus and on any ASCII-spaced text."""
    if t is None:
        return []
    th = []
    for tok in _WS.split(t.lower().strip()):
        if not tok:
            continue
        h = 0
        for ch in tok:
            h = (h * CHAR_MULT + ord(ch)) % HASH_P
        th.append(h)
    return th


def _doc_shingles(text: "pd.Series", n: int) -> list:
    """Per-doc word-n-gram shingle hashes — the Python replay of
    ``shingle_hashes(token_hashes(text))`` with exact integer
    arithmetic, so the DuckDB oracle reproduces it bit-for-bit."""
    out = []
    for t in text:
        th = _token_hash_list(t)
        if len(th) >= n:
            sh = th[: len(th) - (n - 1)]
            for k in range(1, n):
                sh = [
                    (a * TOK_MULT + b) % HASH_P
                    for a, b in zip(sh, th[k : k + len(th) - (n - 1)])
                ]
        else:
            sh = []
        out.append(sh)
    return out


# ---------------------------------------------------------------------------
# Vectorized batch tokenizer (r16, VERDICT r15 item 7).
#
# _token_hash_list's per-character Python fold dominated every Arrow
# tokenize pass (DSIR scoring, shingle/minhash/simhash/wide-gram
# priming).  The flat core below computes the IDENTICAL hashes with
# numpy over a whole batch: one utf-32 decode of the batch's lowered
# text, a vectorized whitespace-run split, and a Horner fold across
# tokens (one vector op per character POSITION over the prefix of
# tokens still that long, so total work is O(total chars) in numpy
# rather than O(total chars) in interpreted Python).  Bit-exactness is
# property-tested against the scalar replay (which stays as the
# reference implementation): same unicode \s split, same str.lower,
# same (h*MULT + ord) % P fold per character in order.
# ---------------------------------------------------------------------------

_WS_LUT = None  # bool[0x110000]: Python re \s membership (lazy, per process)
_WS_ASCII_OK = None  # formula check for the ASCII fast path


def _ws_lut():
    global _WS_LUT, _WS_ASCII_OK
    if _WS_LUT is None:
        import numpy as np

        # Every codepoint \s matches is in the BMP; scan it once per
        # worker process (~40 ms, amortized by worker reuse) so the
        # set is DERIVED from the same regex the scalar replay uses
        # and can never silently drift from it.  Full-plane bool LUT
        # (1.1 MB) so membership is one fancy index per batch.
        lut = np.zeros(0x110000, dtype=bool)
        for c in range(0x10000):
            if _WS.match(chr(c)):
                lut[c] = True
        # The ASCII fast path tests 9<=c<=32 and not 14<=c<=27 with
        # three vector compares instead of a gather; verify that
        # formula against the regex-derived set so it can never drift.
        _WS_ASCII_OK = all(
            bool(lut[c]) == (9 <= c <= 32 and not 14 <= c <= 27)
            for c in range(128)
        )
        _WS_LUT = lut
    return _WS_LUT


def _token_hash_flat(texts, wide: bool = False):
    """Vectorized twin of ``_token_hash_list`` over a whole batch.
    Returns ``(counts, h1, h2)``: ``counts`` int64[n_docs] tokens per
    doc; ``h1`` the flat per-token chain-1 hashes in document order;
    ``h2`` the chain-2 hashes (``_token_hash_pair_list``'s second
    chain) when ``wide`` else None."""
    import numpy as np

    lowered = [(t.lower() if t is not None else "") for t in texts]
    n_docs = len(lowered)
    empty = np.zeros(0, dtype=np.int64)
    counts = np.zeros(n_docs, dtype=np.int64)
    joined = "\n".join(lowered)
    if not joined:
        return counts, empty, (empty if wide else None)
    # ASCII fast path: one memcpy-speed encode and 1-byte codepoints
    # (the common case for this corpus); the utf-32 path is the exact
    # general form.  Hash arithmetic below is on int64 accumulators
    # either way, so the fold is bit-identical.
    lut = _ws_lut()
    try:
        cp = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
        if _WS_ASCII_OK:
            ws = (cp >= 9) & (cp <= 32) & ~((cp >= 14) & (cp <= 27))
        else:  # pragma: no cover — formula verified at LUT build
            ws = lut[cp]
    except UnicodeEncodeError:
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        ws = lut[cp]
    nonws = ~ws
    # token boundaries from the +1/-1 edges of the nonws run signal
    d = np.diff(nonws.view(np.int8))
    tok_starts = np.flatnonzero(d == 1) + 1
    tok_ends = np.flatnonzero(d == -1)
    if nonws[0]:
        tok_starts = np.concatenate(([0], tok_starts))
    if nonws[-1]:
        tok_ends = np.concatenate((tok_ends, [len(cp) - 1]))
    if tok_starts.size == 0:
        return counts, empty, (empty if wide else None)
    tok_lens = tok_ends - tok_starts + 1
    # assign tokens to docs via the joined-string offsets ("\n" is
    # whitespace, so no token ever crosses a doc boundary)
    doc_lens = np.fromiter(
        (len(s) for s in lowered), dtype=np.int64, count=n_docs
    )
    doc_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(doc_lens + 1, out=doc_off[1:])
    tok_doc = np.searchsorted(doc_off, tok_starts, side="right") - 1
    counts = np.bincount(tok_doc, minlength=n_docs).astype(np.int64)
    # Horner fold by character position over tokens sorted by length
    # descending (the active set is then always a prefix); int32 keys
    # keep the radix sort to half the passes
    order = np.argsort(-tok_lens.astype(np.int32), kind="stable")
    s_starts = tok_starts[order]
    neg_lens = -tok_lens[order]  # ascending
    n_tok = s_starts.size
    h1 = np.zeros(n_tok, dtype=np.int64)
    h2 = np.zeros(n_tok, dtype=np.int64) if wide else None
    # Deferred modulo: mod is a ring homomorphism, so folding G
    # characters between reductions gives bit-identical hashes as long
    # as the accumulator stays inside int64 — h < P (~2^30) grows by
    # CHAR_MULT (2^5) / CHAR_MULT2 (2^7.03) per char plus a <2^21
    # codepoint term, so 6 narrow / 4 wide steps stay under 2^63.
    group = 4 if wide else 6
    maxlen = int(tok_lens.max())
    i = 0
    while i < maxlen:
        k0 = int(np.searchsorted(neg_lens, -i, side="left"))
        if k0 == 0:
            break
        for j in range(min(group, maxlen - i)):
            k = int(np.searchsorted(neg_lens, -(i + j), side="left"))
            if k == 0:
                break
            c = cp[s_starts[:k] + (i + j)]
            v1 = h1[:k]
            v1 *= CHAR_MULT
            v1 += c
            if wide:
                v2 = h2[:k]
                v2 *= CHAR_MULT2
                v2 += c
        h1[:k0] %= HASH_P
        if wide:
            h2[:k0] %= HASH_P2
        i += group
    inv = np.empty(n_tok, dtype=np.int64)
    inv[order] = np.arange(n_tok)
    h1_out = h1[inv]
    h2_out = h2[inv] if wide else None
    return counts, h1_out, h2_out


def _shingle_flat(counts, h1, h2=None, n: int = 3):
    """Flat word-n-gram shingle hashes from flat token hashes: returns
    ``(m_doc, sh)`` where ``m_doc[d] = max(counts[d] - (n-1), 0)`` is
    the shingles per doc and ``sh`` the flat shingle values in doc
    order — the narrow ``(...*TOK_MULT + h)%HASH_P`` chain, or the
    injective wide ``g1*HASH_P2 + g2`` key when ``h2`` is given.  The
    arithmetic per shingle is identical to ``_doc_shingles`` /
    ``shingle_hashes_wide_pandas``'s list folds."""
    import numpy as np

    m_doc = np.maximum(counts - (n - 1), 0)
    total = int(counts.sum())
    if total == 0 or int(m_doc.sum()) == 0:
        return m_doc, np.zeros(0, dtype=np.int64)
    tok_off = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=tok_off[1:])
    pos_doc = np.repeat(np.arange(len(counts)), counts)
    local = np.arange(total) - tok_off[pos_doc]
    starts = np.flatnonzero(local < m_doc[pos_doc])
    g1 = h1[starts]
    for k in range(1, n):
        g1 = (g1 * TOK_MULT + h1[starts + k]) % HASH_P
    if h2 is None:
        return m_doc, g1
    g2 = h2[starts]
    for k in range(1, n):
        g2 = (g2 * TOK_MULT2 + h2[starts + k]) % HASH_P2
    return m_doc, g1 * HASH_P2 + g2


def token_hashes_pandas():
    """Arrow-batched per-token polynomial hashes — the vectorized twin
    of ``token_hashes`` (char_hash over tokens of the normalized
    text), for consumers that need PER-TOKEN rows (hashed-feature
    models, token entropy): the char-level fold is an interpreted
    higher-order lambda in Catalyst (~10x slower — see
    shingle_hashes_pandas), so the Python replay wins on any
    token-stream scan."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<bigint>")
    def _udf(text: pd.Series) -> pd.Series:
        counts, h1, _ = _token_hash_flat(text)
        return pd.Series(
            [a.tolist() for a in np.split(h1, np.cumsum(counts)[:-1])]
        )

    return _udf


def shingle_hashes_pandas(n: int = 3):
    """Arrow-batched pandas UDF computing the SAME shingle hashes as
    ``shingle_hashes(token_hashes(text))``.

    Why a UDF here when everything else is built-ins: the char-level
    polynomial fold is a higher-order lambda chain, which Catalyst
    evaluates *interpreted* (no whole-stage codegen) — measured
    ~1.1 ms/doc at sf0.1, i.e. the dominant cost of every dedup
    signature.  The Arrow-vectorized Python loop is ~10x faster and
    stays embarrassingly parallel (one batch per partition, no
    shuffle).  r16: runs on the flat numpy core (_token_hash_flat /
    _shingle_flat — another ~5-10x on the same pass); _doc_shingles
    stays as the scalar reference the property tests pin against."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<bigint>")
    def _udf(text: pd.Series) -> pd.Series:
        counts, h1, _ = _token_hash_flat(text)
        m_doc, sh = _shingle_flat(counts, h1, None, n)
        return pd.Series(
            [a.tolist() for a in np.split(sh, np.cumsum(m_doc)[:-1])]
        )

    return _udf


# ---------------------------------------------------------------------------
# WIDE shingle key for exact span-level dedup (round 15).
#
# The single polynomial hash lives in a ~2^30 space (HASH_P) — fine for
# SKETCHES (minhash/simhash/containment estimate similarity and absorb
# rare collisions by construction), but the span-removal pair treats a
# gram-hash equality as EXACT duplication and EDITS text on it.  The
# round-15 fully-duplicated-corpus probe measured the saturation curve
# directly: at 92M grams ~19% of known-unique docs had at least one
# false-positive flagged span, 34% at 185M, 53% at 370M — pure
# birthday-collision density in a 1e9 space, and at cluster scale
# (1e12 grams) the space saturates entirely.  The wide key combines
# two INDEPENDENT polynomial chains (different char/token multipliers,
# different prime moduli) into the injective 60-bit value
# gh1 * HASH_P2 + gh2: pair-collision probability ~1e-18 (the same
# probe re-run measures 0 affected docs), still exact int64 arithmetic
# on both engines so every oracle replays it bit-for-bit.
# ---------------------------------------------------------------------------

HASH_P2 = 998_244_353  # second prime modulus (keeps acc*mult in int64)
CHAR_MULT2 = 131
TOK_MULT2 = 2_654_435_761  # max acc*TOK_MULT2 + b ~ 2.7e18 < 2^63-1


def _token_hash_pair_list(t: str | None) -> tuple[list, list]:
    """Both per-token chains in ONE pass over the characters (the
    second chain adds ~30% to the tokenize-hash cost, not 2x)."""
    if t is None:
        return [], []
    th1: list = []
    th2: list = []
    for tok in _WS.split(t.lower().strip()):
        if not tok:
            continue
        h1 = 0
        h2 = 0
        for ch in tok:
            oc = ord(ch)
            h1 = (h1 * CHAR_MULT + oc) % HASH_P
            h2 = (h2 * CHAR_MULT2 + oc) % HASH_P2
        th1.append(h1)
        th2.append(h2)
    return th1, th2


def shingle_hashes_wide_pandas(n: int = 3):
    """Arrow-batched wide shingle keys: per gram,
    ``gh1 * HASH_P2 + gh2`` where gh1/gh2 are the two independent
    polynomial chains.  ``wide // HASH_P2`` equals the narrow
    ``shingle_hashes`` value exactly (tests/test_properties.py pins
    this), so the wide key strictly refines the narrow one.  r16: runs
    on the flat numpy core with both chains folded in one pass
    (wide=True); _token_hash_pair_list stays as the scalar reference
    the property tests pin against."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<bigint>")
    def _udf(text: pd.Series) -> pd.Series:
        counts, h1, h2 = _token_hash_flat(text, wide=True)
        m_doc, sh = _shingle_flat(counts, h1, h2, n)
        return pd.Series(
            [a.tolist() for a in np.split(sh, np.cumsum(m_doc)[:-1])]
        )

    return _udf


def char_hash2_sql(t: str) -> str:
    chars = f"list_transform(generate_series(1, length({t})), i -> ascii(substr({t}, i, 1))::BIGINT)"
    return (
        f"list_reduce(list_prepend(0::BIGINT, {chars}),"
        f" (acc, c) -> (acc * {CHAR_MULT2} + c) % {HASH_P2})"
    )


def token_hashes2_sql(text: str) -> str:
    toks = tokens_sql(normalized_text_sql(text))
    return f"list_transform({toks}, t -> {char_hash2_sql('t')})"


def shingle_hashes_wide_sql(th1: str, th2: str, n: int = 3) -> str:
    """DuckDB replay of ``shingle_hashes_wide_pandas`` given the two
    token-hash lists (same length by construction)."""
    h1 = f"{th1}[i]"
    h2 = f"{th2}[i]"
    for k in range(1, n):
        h1 = f"(({h1}) * {TOK_MULT} + {th1}[i+{k}]) % {HASH_P}"
        h2 = f"(({h2}) * {TOK_MULT2} + {th2}[i+{k}]) % {HASH_P2}"
    return (
        f"(CASE WHEN len({th1}) >= {n} THEN"
        f" list_transform(generate_series(1, len({th1}) - {n - 1}),"
        f" i -> ({h1}) * {HASH_P2} + ({h2}))"
        f" ELSE [] END)"
    )


def minhash_sig_pandas(perm_a, perm_b, n: int = 3):
    """Arrow-batched minhash signature: per doc, ``sig[j] = min over
    shingle hashes h of (perm_a[j]*h + perm_b[j]) % HASH_P``; NULL when
    the doc has fewer than ``n`` tokens.

    Scale shape: signature computation is per-document LOCAL — this
    replaces the explode(shingles) -> groupBy(doc_id).agg(16 mins)
    formulation, which multiplied the row count by ~|shingles| and
    shuffled all of it.  The permutation minima are numpy
    ``minimum.reduceat`` passes over the batch's flat shingle stream
    (16 vectorized passes, no per-shingle Python).  Max intermediate:
    31 * HASH_P ~ 3.1e10, well inside int64."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    a = np.asarray(perm_a, dtype=np.int64)
    b = np.asarray(perm_b, dtype=np.int64)

    @pandas_udf("array<bigint>")
    def _udf(text: pd.Series) -> pd.Series:
        counts, h1, _ = _token_hash_flat(text)
        lens, flat = _shingle_flat(counts, h1, None, n)
        out = [None] * len(lens)
        nz = np.flatnonzero(lens)
        if nz.size:
            offs = np.zeros(nz.size, dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=offs[1:])
            sigs = np.empty((len(a), nz.size), dtype=np.int64)
            for j in range(len(a)):
                sigs[j] = np.minimum.reduceat((a[j] * flat + b[j]) % HASH_P, offs)
            for k, i in enumerate(nz):
                out[i] = sigs[:, k].tolist()
        return pd.Series(out)

    return _udf


def dsir_score_pandas(lr_q, n_buckets: int):
    """Arrow-batched one-pass DSIR scorer (r15): per document, the
    token count and the EXACT int64 sum of quantized per-bucket
    log-ratios.  Replaces explode(tokens) + broadcast join + corpus-
    sized groupBy with a stateless scan: the trained model is only
    ``n_buckets`` rows, so it rides into the workers as a numpy lookup
    table (the PQ-codebook pattern).  Bit-exactness: token buckets are
    ``_token_hash_flat % n_buckets`` (the vectorized twin of
    ``_token_hash_list``, property-tested bit-identical — the pinned
    replay of ``char_hash(tok)``), ``lr_q`` is quantized ONCE driver-side with
    the same Spark ``round(lr*1e6)`` (HALF_UP) that ``fpsum`` applied
    per row, and the int64 sum is order-free — so
    ``s_q/1e6/n_tokens`` reproduces the old aggregate to the last
    bit."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    table = np.ascontiguousarray(lr_q, dtype=np.int64)

    @pandas_udf("struct<n_tokens:bigint, s_q:bigint>")
    def _udf(text: pd.Series) -> pd.DataFrame:
        import numpy as np

        counts, h1, _ = _token_hash_flat(text)
        s_q = np.zeros(len(counts), dtype=np.int64)
        nz = np.flatnonzero(counts)
        if nz.size:
            offs = np.zeros(nz.size, dtype=np.int64)
            np.cumsum(counts[nz][:-1], out=offs[1:])
            s_q[nz] = np.add.reduceat(table[h1 % n_buckets], offs)
        return pd.DataFrame({"n_tokens": counts, "s_q": s_q})

    # the n_tokens>0 filter on the UDF's output would otherwise be
    # pushed below it AND re-projected above — two ArrowEvalPython
    # nodes scoring every row twice (guide §4.4); the marker forbids
    # the optimizer from duplicating the (pure) expression
    return _udf.asNondeterministic()


def simhash_pandas(bits: int = 32, n: int = 3):
    """Arrow-batched simhash: bit ``b`` of the signature is set iff
    ``sum over shingle hashes of (bit b of h ? +1 : -1) > 0``; NULL when
    the doc has no shingles.  Same local-per-document shape as
    :func:`minhash_sig_pandas` — one ``add.reduceat`` pass per bit
    plane over the batch's flat shingle stream."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _udf(text: pd.Series) -> pd.Series:
        counts, h1, _ = _token_hash_flat(text)
        lens, flat = _shingle_flat(counts, h1, None, n)
        out = [None] * len(lens)
        nz = np.flatnonzero(lens)
        if nz.size:
            offs = np.zeros(nz.size, dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=offs[1:])
            sig = np.zeros(nz.size, dtype=np.int64)
            for bit in range(bits):
                plane = (((flat >> bit) & 1) * 2 - 1).astype(np.int64)
                sig |= (np.add.reduceat(plane, offs) > 0).astype(np.int64) << bit
            for k, i in enumerate(nz):
                out[i] = int(sig[k])
        return pd.Series(out)

    return _udf


def word_shingles(text: Column, n: int = 3) -> Column:
    """String word n-grams of the normalized text (for exact Jaccard)."""
    toks = tokens(normalized_text(text))
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + k) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles_sql(text: str, n: int = 3) -> str:
    toks = tokens_sql(normalized_text_sql(text))
    parts = " || ' ' || ".join(f"{toks}[i+{k}]" if k else f"{toks}[i]" for k in range(n))
    return (
        f"(CASE WHEN len({toks}) >= {n} THEN"
        f" list_transform(generate_series(1, len({toks}) - {n - 1}), i -> {parts})"
        f" ELSE [] END)"
    )


# ---------------------------------------------------------------------------
# Single-pass Arrow-batched document features.
#
# Same rationale as shingle_hashes_pandas: the tokenizing feature
# expressions above are higher-order lambda chains that Catalyst
# evaluates interpreted AND re-evaluates wherever pushdown duplicates
# them (no CSE outside codegen).  One Arrow pass computes all four
# features per document; Catalyst extracts the Python UDF into a
# single ArrowEvalPython node, so it runs exactly once per row no
# matter how the surrounding plan is rewritten.
#
# Formula parity with the Column/SQL versions is bit-exact (same IEEE
# operation order; Java-\s-equivalent whitespace class) and pinned by
# tests/test_properties.py::test_doc_features_udf_matches_expressions.
# ---------------------------------------------------------------------------

_JAVA_WS = _re.compile(r"[ \t\n\x0b\f\r]+")
_PUNCT_SET = frozenset(".,;:!?")
_LANG_SETS = {c: frozenset(m) for c, m in LANG_MARKERS.items()}
_EN_STOP_SET = frozenset(EN_STOPWORDS)
_LANG_ORDER = sorted(LANG_MARKERS)  # ties break to lexically smallest


def _doc_features_one(text):
    if text is None:
        return (None, None, None, None)
    toks = [t for t in _JAVA_WS.split(text) if t != ""]
    low = [t.lower() for t in toks]
    ws = len(toks)
    hits = {c: sum(1 for t in low if t in s) for c, s in _LANG_SETS.items()}
    best = max(hits.values())
    lang = "und"
    if best > 0:
        lang = next(c for c in _LANG_ORDER if hits[c] == best)
    n = len(text)
    n_punct = sum(1 for ch in text if ch in _PUNCT_SET)
    len_score = min(n / 500.0, 1.0)
    punct_pen = max(1.0 - (n_punct / max(n, 1)) * 5.0, 0.0)
    n_stop = sum(1 for t in low if t in _EN_STOP_SET)
    stop_score = min((n_stop / max(ws, 1)) * 4.0, 1.0)
    q = len_score * 0.4 + punct_pen * 0.3 + stop_score * 0.3
    import hashlib

    norm = _JAVA_WS.sub(" ", text.lower()).strip()
    fp = hashlib.md5(norm.encode("utf-8")).hexdigest()
    return (lang, q, fp, ws)


def doc_features_pandas():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "struct<lang_detected:string, q:double, fp:string, ws:bigint>"
    )
    def _udf(text: pd.Series) -> pd.DataFrame:
        rows = [_doc_features_one(t) for t in text]
        return pd.DataFrame(
            rows, columns=["lang_detected", "q", "fp", "ws"]
        )

    return _udf


def _word_ngrams(toks: list, n: int) -> list:
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def word_shingles_pandas(n: int = 3):
    """Arrow-batched replay of ``word_shingles`` (string word n-grams
    of the normalized text).  Same rationale as shingle_hashes_pandas:
    the Column version's element_at lambda chain is interpreted and
    re-tokenizes per output element (O(tokens²) per doc); one Python
    pass is linear and stays per-partition parallel.  Parity with
    ``word_shingles_sql`` is exact: same normalization (lower,
    ws-collapse, trim), same Java-\\s-equivalent splitter, same
    space-joined shingle strings."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _udf(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if t is None:
                out.append([])
                continue
            toks = [x for x in _JAVA_WS.split(t.lower().strip()) if x]
            out.append(_word_ngrams(toks, n))
        return pd.Series(out)

    return _udf


_SENT_SPLIT = _re.compile(r"[.!?]+")


def repetition_counts_pandas():
    """Arrow-batched within-doc repetition counts for the Gopher-style
    filter: (n_sents, dup_sents, n_g2, dup_g2, n_g3, dup_g3) per doc.
    Counts only — the fractions and their rounding stay in codegen'd
    built-ins so round() semantics match the SQL oracle exactly.
    Sentences = trimmed non-empty splits of lower(text) on [.!?]+;
    n-grams over the normalized-text tokens, both identical to the
    oracle's formulas."""
    from pyspark.sql.functions import pandas_udf

    schema = (
        "n_sents bigint, dup_sents bigint, n_g2 bigint, "
        "dup_g2 bigint, n_g3 bigint, dup_g3 bigint"
    )

    @pandas_udf(schema)
    def _udf(text: pd.Series) -> pd.DataFrame:
        rows = []
        for t in text:
            if t is None:
                rows.append((0, 0, 0, 0, 0, 0))
                continue
            low = t.lower()
            sents = [s.strip() for s in _SENT_SPLIT.split(low)]
            sents = [s for s in sents if s]
            toks = [x for x in _JAVA_WS.split(low.strip()) if x]
            g2 = _word_ngrams(toks, 2)
            g3 = _word_ngrams(toks, 3)
            rows.append(
                (
                    len(sents), len(sents) - len(set(sents)),
                    len(g2), len(g2) - len(set(g2)),
                    len(g3), len(g3) - len(set(g3)),
                )
            )
        return pd.DataFrame(
            rows,
            columns=["n_sents", "dup_sents", "n_g2", "dup_g2", "n_g3", "dup_g3"],
        )

    return _udf


def bm25_tf_pandas(terms: tuple):
    """Arrow-batched per-doc term frequencies + doc length for a fixed
    term list (lowercased whitespace tokens).  Same rationale as
    shingle_hashes_pandas: per-term interpreted array-filter lambdas
    cost ~70us/doc/term; one vectorized pass is ~10x faster.  Counts
    are exact integers, so oracle parity is unaffected (DuckDB replays
    the list_filter formulation).
    Tokenization caveat: Python \\s is unicode-aware vs Java's ASCII
    \\s — identical on ASCII-spaced corpora (same caveat as every
    text UDF here)."""
    from pyspark.sql.functions import pandas_udf

    fields = ", ".join(f"tf_{t}:bigint" for t in terms)

    @pandas_udf(f"struct<{fields}, dl:bigint>")
    def _udf(text: pd.Series) -> pd.DataFrame:
        rows = []
        for t in text:
            toks = [x for x in _WS.split(t.lower()) if x] if t else []
            row = [toks.count(term) for term in terms]
            row.append(len(toks))
            rows.append(row)
        return pd.DataFrame(
            rows, columns=[f"tf_{t}" for t in terms] + ["dl"]
        )

    return _udf
