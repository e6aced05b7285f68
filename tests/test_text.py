from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint_md5,
    lang_id,
    minhash_signature,
    punct_ratio,
    quality_score,
    shingles,
    simhash64,
    token_count,
    tokens,
)


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], ["text"]).select(expr.alias("v")).head()["v"]


def test_token_count(spark):
    assert _one(spark, "Hello  world\tfoo\nbar ", token_count("text")) == 4
    assert _one(spark, "", token_count("text")) == 0
    assert _one(spark, "   ", token_count("text")) == 0
    assert _one(spark, "one", token_count("text")) == 1


def test_bpe_ish_token_count(spark):
    # "don't stop2" -> don / ' / t / stop / 2
    assert _one(spark, "don't stop2", bpe_ish_token_count("text")) == 5


def test_shingles(spark):
    got = _one(spark, "a b c d", shingles("text", 3))
    assert got == ["a b c", "b c d"]
    assert _one(spark, "a b", shingles("text", 3)) == []


def test_punct_ratio(spark):
    assert _one(spark, "ab!!", punct_ratio("text")) == pytest.approx(0.5)
    assert _one(spark, "", punct_ratio("text")) == 0.0


def test_quality_prose_beats_garbage(spark):
    prose = (
        "The quick brown fox jumps over the lazy dog and then it runs to the "
        "river where the water is cold and the trees are tall in the forest."
    )
    garbage = "@@@@ #### $$$$ 1234 5678 !!!! ???? %%%% ^^^^ &&&& <<<< >>>>"
    assert _one(spark, prose, quality_score("text")) > _one(
        spark, garbage, quality_score("text")
    )


def test_lang_id(spark):
    cases = {
        "the cat and the dog went to the market": "en",
        "el perro y la casa de los árboles que vimos": "es",
        "der Hund und die Katze ist nicht mit uns": "de",
        "le chien et les arbres est pour la maison": "fr",
        "xyzzy qwerty plugh": "und",
    }
    for text, exp in cases.items():
        assert _one(spark, text, lang_id("text")) == exp, text


def test_fingerprint_normalization(spark):
    a = _one(spark, "Hello   World", fingerprint_md5("text"))
    b = _one(spark, "hello world", fingerprint_md5("text"))
    c = _one(spark, "hello worlds", fingerprint_md5("text"))
    assert a == b != c


def test_simhash_similar_texts_close(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base + " again"
    far = "completely different words about spark clusters and parquet columnar files"
    h = lambda t: _one(spark, t, simhash64("text"))  # noqa: E731
    d = lambda x, y: bin(x ^ y).count("1")  # noqa: E731
    assert d(h(base), h(near)) < d(h(base), h(far))
    assert d(h(base), h(base)) == 0


def test_minhash_signature_estimates_jaccard(spark):
    base = " ".join(f"w{i}" for i in range(50))
    near = " ".join(f"w{i}" for i in range(2, 52))  # high shingle overlap
    far = " ".join(f"z{i}" for i in range(50))
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], ["id", "text"])
    sigs = {
        r["id"]: r["sig"]
        for r in df.select("id", minhash_signature("text", 32).alias("sig")).collect()
    }
    agree = lambda a, b: sum(x == y for x, y in zip(a, b)) / len(a)  # noqa: E731
    assert agree(sigs[1], sigs[2]) > 0.5
    assert agree(sigs[1], sigs[3]) < 0.2
    assert _one(spark, "a b", minhash_signature("text", 8)) is None  # no shingles


def test_tokens_are_normalized(spark):
    assert _one(spark, "  FOO   Bar ", tokens("text")) == ["foo", "bar"]


def test_text_metrics_equals_individual_functions(spark):
    """The fused single-tokenization struct must emit bit-identical values
    to the standalone ratio functions it replaces."""
    import acorn_hybrid_vector_search_spark.functions.text as T
    from pyspark.sql import functions as F

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    m = T.text_metrics("text")
    rows = d.select(
        m.getField("stop_r").alias("f_stop"),
        m.getField("mean_wl").alias("f_wl"),
        m.getField("quality").alias("f_q"),
        T.stopword_ratio("text").alias("s_stop"),
        T.mean_word_len("text").alias("s_wl"),
        T.quality_score("text").alias("s_q"),
    ).collect()
    for r in rows:
        assert r["f_stop"] == r["s_stop"]
        assert r["f_wl"] == r["s_wl"]
        assert r["f_q"] == r["s_q"]


def test_ngram_repetition_stats(spark):
    from acorn_hybrid_vector_search_spark.functions.text import ngram_repetition

    s = _one(spark, "a b a b a b c", ngram_repetition("text", 2))
    # bigrams: [a b, b a, a b, b a, a b, b c] -> total 6, distinct 3, top "a b" x3
    assert (s["total"], s["n_distinct"], s["top_count"]) == (6, 3, 3)
    s = _one(spark, "", ngram_repetition("text", 2))
    assert (s["total"], s["n_distinct"], s["top_count"]) == (0, 0, 0)
    s = _one(spark, "one", ngram_repetition("text", 2))
    assert (s["total"], s["n_distinct"], s["top_count"]) == (0, 0, 0)
    s = _one(spark, "tok " * 50 + "uniq", ngram_repetition("text", 2))
    assert (s["total"], s["n_distinct"], s["top_count"]) == (50, 2, 49)
    # trigram variant
    s = _one(spark, "x y z x y z x y", ngram_repetition("text", 3))
    assert (s["total"], s["n_distinct"], s["top_count"]) == (6, 3, 2)


def test_redact_pii(spark):
    from acorn_hybrid_vector_search_spark.functions.text import redact_pii

    got = _one(
        spark,
        "mail bob.smith+1@foo-bar.io call (555) 010-1234 or +1 555-010-9999 "
        "ip 192.168.0.1 ssn 123-45-6789 end",
        redact_pii("text"),
    )
    assert got == "mail <EMAIL> call <PHONE> or <PHONE> ip <IP> ssn <SSN> end"
    # clean text untouched; bare small numbers and versions are not PII
    clean = "release 1.2 of part 456 weighs 1.5 pounds, built in 2018"
    assert _one(spark, clean, redact_pii("text")) == clean


def test_lang_id_null_and_empty_are_und(spark):
    """NULL/empty text must classify as 'und', not a phantom language
    (regexp_count over NULL propagates NULL scores; the argmax must not
    fall through to index 0)."""
    from pyspark.sql import functions as F

    from acorn_hybrid_vector_search_spark.functions import text as T

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "der und das ist")],
        ["id", "txt"],
    )
    got = {r["id"]: r["lang"] for r in df.select("id", T.lang_id("txt").alias("lang")).collect()}
    assert got[1] == "und"
    assert got[2] == "und"
    assert got[3] == "und"
    assert got[4] == "de"
