"""Property-based text-function fidelity: Hypothesis generates adversarial
texts (whitespace runs, punctuation soup, marker-word mixes); every
JVM-side Column function must agree with an independent Python replica.

One Spark job per example is too slow, so examples are BATCHES of texts
evaluated as one DataFrame pass (same batching trick as
test_predicates_property). The replicas use ASCII-explicit whitespace
classes because Java's ``\\s`` is ASCII-only while Python's is Unicode —
the strategies stay in ASCII so the oracle is exact.
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.functions import text as T

_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_NONALNUM = re.compile(r"[^A-Za-z0-9 \t\n\x0b\f\r]")
_DIGIT = re.compile(r"[0-9]")

_MARKERS = [m for ms in T._LANG_MARKERS.values() for m in ms if m.isascii()]

_word = st.one_of(
    st.sampled_from(_MARKERS + ["xyz", "q1w2", "...", "42"]),
    st.text(alphabet="abcXY01.,!?-_", max_size=6),
)
_text = st.one_of(
    st.text(alphabet="abz09 .,!?\t\n-", max_size=60),
    st.lists(_word, max_size=15).map(" ".join),
)
_batch = st.lists(_text, min_size=1, max_size=25)


def _norm(t: str) -> str:
    return _WS.sub(" ", t.lower()).strip()


def _toks(t: str) -> list[str]:
    return _norm(t).split(" ")


def _token_count(t: str) -> int:
    n = _norm(t)
    return 0 if not n else len(n.split(" "))


def _shingles(t: str) -> set[str]:
    tk = _toks(t)
    if len(tk) < 3:
        return set()
    return {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}


def _punct_ratio(t: str) -> float:
    return len(_NONALNUM.findall(t)) / len(t) if t else 0.0


def _digit_ratio(t: str) -> float:
    return len(_DIGIT.findall(t)) / len(t) if t else 0.0


def _lang_id(t: str) -> str:
    tk = _toks(t)
    n = max(len(tk), 1)
    best, bs = "und", 0.0
    for lang in sorted(T._LANG_MARKERS):
        s = sum(1 for x in tk if x in T._LANG_MARKERS[lang]) / n
        if s > bs:
            best, bs = lang, s
    return best


_P = (1 << 31) - 1
_COEFFS = [
    ((2654435761 * (i + 1)) % _P or 1, (40503 * (i + 7) + 12345) % _P)
    for i in range(16)
]


def _minhash(t: str) -> list[int] | None:
    sh = _shingles(t)
    if not sh:
        return None
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % _P for s in sh]
    return [min((a * h + b) % _P for h in hs) for a, b in _COEFFS]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_batch)
def test_text_functions_match_python_replicas(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    rows = {
        r["i"]: r
        for r in df.select(
            "i",
            T.token_count("text").alias("tc"),
            T.shingles("text").alias("sh"),
            F.round(T.punct_ratio("text"), 9).alias("pr"),
            F.round(T.digit_ratio("text"), 9).alias("dr"),
            T.quality_score("text").alias("q"),
            T.lang_id("text").alias("lang"),
            T.minhash_signature("text").alias("sig"),
            T.fingerprint_md5("text").alias("fp"),
        ).collect()
    }
    for i, t in enumerate(texts):
        r = rows[i]
        assert r["tc"] == _token_count(t), (t, r["tc"])
        assert set(r["sh"]) == _shingles(t), (t, r["sh"])
        assert abs(r["pr"] - round(_punct_ratio(t), 9)) < 1e-9, t
        assert abs(r["dr"] - round(_digit_ratio(t), 9)) < 1e-9, t
        assert 0.0 <= r["q"] <= 1.0, (t, r["q"])
        assert r["lang"] == _lang_id(t), (t, r["lang"], _lang_id(t))
        want_sig = _minhash(t)
        got_sig = list(r["sig"]) if r["sig"] is not None else None
        assert got_sig == want_sig, (t, got_sig, want_sig)
        assert r["fp"] == hashlib.md5(_norm(t).encode()).hexdigest(), t
