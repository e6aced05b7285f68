"""Text-analysis column functions for large-scale training-data pipelines.

All hot-path functions are JVM-side Column expressions (split / regexp /
higher-order functions) — no Python UDFs — so they stay inside whole-stage
codegen and scale linearly with the scan. Charter extension beyond the
reference's surface (BASELINE.json north star; SURVEY.md §7 Phase 5).

Determinism contract: everything here is a pure function of the input
string, reproducible across engines (md5-based hashing, no seeds), so the
oracle-compatible subset can be hash-compared against DuckDB.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# ---------------------------------------------------------------------------
# tokenization


def normalize_text(c: Column | str) -> Column:
    """Lowercase + collapse all whitespace runs to single spaces + trim.
    The canonical form shared by tokenizers and fingerprints."""
    c = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column | str) -> Column:
    """Whitespace tokens of the normalized text (ARRAY<STRING>)."""
    return F.split(normalize_text(c), " ")


def token_count(c: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    n = normalize_text(c)
    return F.when(F.length(n) == 0, F.lit(0)).otherwise(F.size(F.split(n, " ")))


def bpe_ish_token_count(c: Column | str) -> Column:
    """A BPE-ish sub-word proxy: count of letter-runs, digit-runs, and
    individual punctuation marks (what a byte-level BPE roughly yields
    pre-merge). Cheap, JVM-side, good enough for token budgeting."""
    c = F.col(c) if isinstance(c, str) else c
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces)


def let(value: Column, fn) -> Column:
    """Let-binding for Catalyst expressions: evaluate ``value`` ONCE and
    bind it as a higher-order-function lambda variable inside ``fn``.

    Catalyst does not common-subexpression-eliminate inside HOF lambdas, so
    an expression like ``transform(idx, i -> element_at(toks, i))`` re-runs
    the whole ``toks`` subtree per element — quadratic blowup for
    tokenize/hash pipelines (measured 10-180 s per 5k-doc scan before this).
    ``element_at(transform(array(v), x -> fn(x)), 1)`` materializes ``v``
    exactly once; every reference to the bound variable is a cheap slot
    read. Pure expression-level fix: stays inside whole-stage codegen.
    """
    return F.element_at(F.transform(F.array(value), fn), 1)


def shingles(c: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle set (ARRAY<STRING>, distinct) of the text —
    the unit for MinHash / Jaccard near-dup detection."""

    def build(toks: Column) -> Column:
        # sequence(1, 0) yields a DESCENDING [1, 0] in Spark — guard short texts
        idx = F.when(
            F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        grams = F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])
        )
        return F.array_distinct(grams)

    return let(tokens(c), build)


# ---------------------------------------------------------------------------
# quality scoring (length / punctuation / stopword ratios)

_STOPWORDS = (
    "the a an and or of to in is are was for on with as by at from it this that "
    "be not have has had but if then than so no yes we you they he she i"
).split()


def char_count(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.length(c)


def punct_ratio(c: Column | str) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    c = F.col(c) if isinstance(c, str) else c
    n = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def digit_ratio(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    n = F.length(c)
    digits = F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return F.when(n > 0, digits.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(c: Column | str) -> Column:
    """Fraction of tokens that are English stopwords — the classic
    prose-vs-garbage signal (high for natural text, ~0 for code/noise)."""
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])

    def build(toks: Column) -> Column:
        hits_all = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        return F.when(F.size(toks) > 0, hits_all.cast("double") / F.size(toks)).otherwise(
            F.lit(0.0)
        )

    return let(tokens(c), build)


def mean_word_len(c: Column | str) -> Column:
    def build(toks: Column) -> Column:
        total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(
            F.lit(0.0)
        )

    return let(tokens(c), build)


def text_metrics(c: Column | str) -> Column:
    """STRUCT<stop_r, mean_wl, quality>: every token-derived quality
    signal from ONE let-bound tokenization. Composing stopword_ratio +
    mean_word_len + quality_score as separate columns tokenizes the text
    three times per row (each has its own let binding); this computes the
    shared fold once and emits the same values bit-for-bit (identical
    arithmetic, so oracle hashes are unchanged)."""
    length_ok = F.least(char_count(c).cast("double") / 200.0, F.lit(1.0))
    noise = punct_ratio(c) + digit_ratio(c)
    sw_arr = F.array(*[F.lit(w) for w in _STOPWORDS])

    def build(toks: Column) -> Column:
        n = F.size(toks)
        total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        mean_wl = F.when(n > 0, total_len.cast("double") / n).otherwise(F.lit(0.0))
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, t)))
        stop_r = F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))
        words_ok = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), F.lit(1.0)).otherwise(
            F.lit(0.5)
        )
        sw = F.least(stop_r * 4.0, F.lit(1.0))
        quality = F.round(
            0.35 * length_ok
            + 0.25 * words_ok
            + 0.25 * sw
            + 0.15 * (1.0 - F.least(noise * 2.0, F.lit(1.0))),
            6,
        )
        return F.struct(
            stop_r.alias("stop_r"), mean_wl.alias("mean_wl"), quality.alias("quality")
        )

    return let(tokens(c), build)


def quality_score(c: Column | str) -> Column:
    """Composite [0,1] quality heuristic: rewards stopword presence and
    sane word lengths, penalizes punctuation/digit noise and extreme
    shortness. Deterministic arithmetic only.

    Tokenizes ONCE (let-bound) — the naive composition of the ratio
    functions would tokenize three times per row."""
    length_ok = F.least(char_count(c).cast("double") / 200.0, F.lit(1.0))
    noise = punct_ratio(c) + digit_ratio(c)
    sw_arr = F.array(*[F.lit(w) for w in _STOPWORDS])

    def build(toks: Column) -> Column:
        n = F.size(toks)
        total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        mean_wl = F.when(n > 0, total_len.cast("double") / n).otherwise(F.lit(0.0))
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, t)))
        stop_r = F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))
        words_ok = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), F.lit(1.0)).otherwise(
            F.lit(0.5)
        )
        sw = F.least(stop_r * 4.0, F.lit(1.0))
        return (
            0.35 * length_ok
            + 0.25 * words_ok
            + 0.25 * sw
            + 0.15 * (1.0 - F.least(noise * 2.0, F.lit(1.0)))
        )

    return F.round(let(tokens(c), build), 6)


def ngram_repetition(c: Column | str, n: int = 2) -> Column:
    """STRUCT<total, n_distinct, top_count>: word n-gram repetition stats
    for Gopher-style repetitive-text filtering (duplicate-n-gram fraction
    = 1 − n_distinct/total; top-n-gram fraction = top_count/total).

    ``top_count`` (the most frequent n-gram's multiplicity) is computed
    WITHOUT a per-document group-by: sort the gram array and fold the max
    equal-adjacent run length — O(L log L) per row, one pass, entirely
    inside whole-stage codegen. No shuffle is ever needed: repetition is
    a per-row signal, so at 100 TB this stays a narrow map over the scan.
    """

    def build(toks: Column) -> Column:
        idx = F.when(
            F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        grams = F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])
        )

        def stats(g: Column) -> Column:
            init = F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).alias("run"),
                F.lit(0).alias("best"),
            )

            def merge(s: Column, x: Column) -> Column:
                run = F.when(x == s.getField("prev"), s.getField("run") + 1).otherwise(
                    F.lit(1)
                )
                return F.struct(
                    x.alias("prev"),
                    run.alias("run"),
                    F.greatest(s.getField("best"), run).alias("best"),
                )

            top = F.aggregate(
                F.array_sort(g), init, merge, lambda s: s.getField("best")
            )
            return F.struct(
                F.size(g).alias("total"),
                F.size(F.array_distinct(g)).alias("n_distinct"),
                top.alias("top_count"),
            )

        return let(grams, stats)

    return let(tokens(c), build)


# ---------------------------------------------------------------------------
# PII redaction (regex scrubbing — the standard pre-training privacy pass)

# Patterns restricted to the RE2 ∩ java.util.regex common subset (no
# lookaround, no backreferences) so the DuckDB oracle can run the SAME
# patterns. Order matters: email before phone (digits in local parts),
# IP before SSN/phone (dotted quads contain 3-digit runs).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # \b is only placed adjacent to digits ('(' and '+' are non-word chars,
    # so \b( / \b+ can never match after a space — a classic regex trap)
    (
        r"(?:\(\d{3}\)|\+?\b\d{1,2}[ .-](?:\(\d{3}\)|\d{3})|\b\d{3})"
        r"[ .-]?\d{3}[ .-]\d{4}\b",
        "<PHONE>",
    ),
]


def redact_pii(c: Column | str) -> Column:
    """Replace emails / IPv4s / SSNs / US-style phone numbers with typed
    placeholder tokens. A chain of JVM-side ``regexp_replace`` calls — a
    narrow map with no shuffle, the right shape for a 100 TB scrub pass."""
    out = F.col(c) if isinstance(c, str) else c
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


# ---------------------------------------------------------------------------
# language identification (n-gram / stopword heuristic)

# tiny per-language marker lexicons; presence-weighted voting. Public-knowledge
# stopword markers, good enough to route a corpus — NOT a unicode-aware model.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "with", "for"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "por"],
    "de": ["der", "die", "das", "und", "nicht", "mit", "ist", "für"],
    "fr": ["le", "la", "les", "des", "et", "est", "que", "pour"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def lang_scores(c: Column | str) -> Column:
    """MAP<STRING,DOUBLE> of per-language marker-hit ratios.

    Occurrence counting is ONE anchored-regex pass per language over the
    normalized text (``regexp_count``, JVM-side) rather than a per-token
    HOF lambda filter — HOF lambdas are interpreted per element, and the
    lambda formulation measured ~2.6× slower on the sf0.1 documents scan
    (round-4 regression triage). Semantics are identical: the normalized
    text is single-spaced with no leading/trailing space, so a TOKEN
    equals a marker iff the marker occurs bounded by start/space and
    space/end; the lookarounds consume no characters, so adjacent marker
    tokens each count (occurrences, not distinct markers)."""
    def build(norm: Column) -> Column:
        n = F.greatest(F.size(F.split(norm, " ")), F.lit(1))
        entries = []
        for lang, markers in _LANG_MARKERS.items():
            alts = "|".join(markers)  # plain word markers, no metachars
            pat = f"(?:^|(?<= ))(?:{alts})(?=$| )"
            hits = F.regexp_count(norm, F.lit(pat))
            entries += [F.lit(lang), hits.cast("double") / n]
        return F.create_map(*entries)

    return let(normalize_text(c), build)


def lang_id(c: Column | str) -> Column:
    """Best-scoring language code, or 'und' when no marker hits at all.
    Deterministic tie-break: lexicographically smallest language wins.

    Argmax as ONE struct-compare ``greatest`` over (score, −lang_rank)
    pairs — max score, ties resolved to the smallest language by the
    negated rank — instead of the former 2×L-deep CASE-WHEN fold. The
    fold's nested tree dominated the query's cost through per-call
    analysis/codegen time, not execution (round-4 regression triage:
    the sf0.1 battery entry spent ~0.4 s planning a 5 k-row scan)."""
    langs = sorted(_LANG_MARKERS)

    def build(norm: Column) -> Column:
        n = F.greatest(F.size(F.split(norm, " ")), F.lit(1))
        structs = []
        for i, lang in enumerate(langs):
            alts = "|".join(_LANG_MARKERS[lang])
            pat = f"(?:^|(?<= ))(?:{alts})(?=$| )"
            s = F.regexp_count(norm, F.lit(pat)).cast("double") / n
            structs.append(F.struct(s.alias("s"), F.lit(-i).alias("r")))
        best = F.greatest(*structs)
        lang_arr = F.array(*[F.lit(lg) for lg in langs])
        # NULL text: regexp_count yields NULL scores, best["s"] <= 0 is
        # NULL, and when() would fall through to a phantom language —
        # require a strictly positive score explicitly
        return F.when(best["s"] > 0, F.element_at(lang_arr, (-best["r"] + 1).cast("int"))).otherwise(
            F.lit("und")
        )

    return let(normalize_text(c), build)


# ---------------------------------------------------------------------------
# fingerprints

def fingerprint_md5(c: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (exact-dup key).
    md5 is engine-portable (same hex in Spark and DuckDB)."""
    return F.md5(normalize_text(c))


def _hash64(c: Column) -> Column:
    """Portable 60-bit hash of a string: first 15 hex chars of md5 as a
    BIGINT. Engine-portable alternative to xxhash64 (which is Spark-only)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def winnow_fingerprints(c: Column | str, k: int = 4, window: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — the MOSS algorithm): the POSITIONAL sequence of word
    ``k``-gram rolling hashes, reduced to the distinct set of per-window
    minima over every ``window`` consecutive hashes
    (ARRAY<BIGINT>, sorted ascending).

    Guarantee (the paper's Theorem): any shared run of at least
    ``window + k - 1`` tokens between two documents selects at least one
    common fingerprint — so fingerprint overlap detects long shared
    passages with a bounded-size signature, the copy-detection /
    substring-level near-dup primitive of a crawl pipeline.

    Boundary: fewer than ``k`` tokens → empty (no grams); fewer than
    ``window`` grams → one fingerprint, the min over all gram hashes
    (a single truncated window — standard short-document handling).

    Shape: a single Catalyst expression (tokenize → positional gram
    build → md5-fold hash → sliding ``array_min`` over ``slice``), all
    whole-stage codegen, one pass per row, no shuffle, no Python.
    ``let`` bindings keep the token and hash arrays evaluated once
    (Catalyst does not CSE inside HOF lambdas). The md5-based
    ``_hash64`` keeps the fingerprints engine-portable — the DuckDB
    oracle re-derives every fingerprint from raw text.
    """
    if k < 1 or window < 1:
        raise ValueError("k and window must be >= 1")

    def build(toks: Column) -> Column:
        gidx = F.when(
            F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - (k - 1))
        ).otherwise(F.array().cast("array<int>"))
        grams = F.transform(
            gidx,
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
        )

        def windows(hs: Column) -> Column:
            wlen = F.least(F.lit(window), F.size(hs))
            widx = F.when(
                F.size(hs) > 0, F.sequence(F.lit(1), F.size(hs) - wlen + 1)
            ).otherwise(F.array().cast("array<int>"))
            return F.array_sort(
                F.array_distinct(
                    F.transform(widx, lambda j: F.array_min(F.slice(hs, j, wlen)))
                )
            )

        return let(F.transform(grams, lambda g: _hash64(g)), windows)

    return let(tokens(c), build)


def simhash64(c: Column | str, bits: int = 60) -> Column:
    """SimHash over whitespace tokens using the portable 60-bit hash
    (same value as ``_hash64``): per-bit majority vote of token hashes.
    Near-identical texts differ in few bits (compare with
    ``bit_count(a ^ b)``).

    Arrow-batched pandas UDF, not a Catalyst expression: higher-order
    functions are interpreted (never whole-stage-codegen'd), and the
    bits × tokens fold measured ~1 ms/row that way; the NumPy majority
    vote over md5 digests is ~20× faster. Values are identical to the
    expression formulation (md5-derived hashes, same majority rule).
    """
    col = F.col(c) if isinstance(c, str) else c

    @F.pandas_udf(LongType())
    def sh(texts: pd.Series) -> pd.Series:
        ws = re.compile(r"\s+")
        shifts = np.arange(bits, dtype=np.uint64)
        out: list[int | None] = []
        for t in texts.to_numpy(dtype=object):
            if t is None:
                out.append(None)  # NULL in → NULL out (expression semantics)
                continue
            toks = set(ws.sub(" ", str(t).lower()).strip().split(" "))
            toks.discard("")
            if not toks:
                out.append(0)
                continue
            hs = np.fromiter(
                (int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) for tok in toks),
                dtype=np.uint64,
                count=len(toks),
            )
            ones = ((hs[:, None] >> shifts[None, :]) & 1).sum(axis=0)
            mask = (2 * ones) >= len(toks)
            out.append(int((np.uint64(1) << shifts)[mask].sum()))
        return pd.Series(out, dtype="Int64")

    return sh(col)


def minhash_from_shingles(sh: Column, num_hashes: int = 16) -> Column:
    """MinHash signature (ARRAY<BIGINT>) from a precomputed shingle-array
    column. One md5 per shingle, then ``num_hashes`` cheap mixes of that
    base hash (h_i = (a_i * h + b_i) mod p — the standard universal-hash
    family), instead of ``num_hashes`` md5 passes: keeps the expression
    tree small and the scan cost O(shingles), not O(shingles × hashes)."""
    # 31-bit field keeps a_i * h + b_i < 2^63 (Spark 4 runs ANSI mode:
    # bigint overflow throws, so the arithmetic must provably fit)
    p = (1 << 31) - 1  # Mersenne prime 2^31-1
    coeffs = [
        ((2654435761 * (i + 1)) % p or 1, (40503 * (i + 7) + 12345) % p)
        for i in range(num_hashes)
    ]

    def _mix(a: int, b: int):
        # closure factory: PySpark infers lambda arity from the signature,
        # so default-arg capture (lambda h, a=a: ...) would read as 2-ary
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(p))

    def build(sh_v: Column) -> Column:
        def sig(base: Column) -> Column:
            return F.array(*[F.array_min(F.transform(base, _mix(a, b))) for a, b in coeffs])

        return F.when(
            F.size(sh_v) > 0, let(F.transform(sh_v, lambda s: F.pmod(_hash64(s), F.lit(p))), sig)
        )

    return let(sh, build)


def minhash_signature(c: Column | str, num_hashes: int = 16, shingle_n: int = 3) -> Column:
    """MinHash signature (ARRAY<BIGINT> length ``num_hashes``) over word
    shingles: h_i = min over mixed shingle hashes. Empty shingle set ⇒
    NULL signature (callers should filter).

    Jaccard(a, b) ≈ fraction of agreeing signature positions — the
    LSH-banding input for near-dup detection at scale.
    """
    return minhash_from_shingles(shingles(c, shingle_n), num_hashes)
