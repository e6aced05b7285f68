"""Distributed BPE training (operators/bpe.py): parity against an
independent pure-python Sennrich reference, greedy-fold semantics,
deterministic tie-breaks, early stop, segmentation reconstruction."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from acorn_hybrid_vector_search_spark.operators.bpe import (
    EOW,
    bpe_segment,
    bpe_train,
)


def _py_bpe(texts, num_merges, min_count=2):
    """Independent reference: the textbook dict-of-tuples formulation
    (Sennrich et al. 2016, learn_bpe), same tie-break contract."""
    words = Counter()
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w and all("a" <= c <= "z" for c in w):
                words[w] += 1
    state = {w: tuple(list(w) + [EOW]) for w in words}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in state.items():
            for j in range(len(syms) - 1):
                pairs[(syms[j], syms[j + 1])] += words[w]
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        new_state = {}
        for w, syms in state.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new_state[w] = tuple(out)
        state = new_state
    return merges, state


CORPUS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new"),
    (2, "low new lower newer newest"),
    (3, "the lowest of the low"),
]


def test_train_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got, state = bpe_train(df, 12)
    want, want_state = _py_bpe([t for _, t in CORPUS], 12)
    assert got == want
    got_segs = {r["word"]: tuple(r["syms"]) for r in state.collect()}
    assert got_segs == want_state


def test_overlapping_merge_is_greedy_left_to_right(spark):
    """aaaa + merge (a,a) must give [aa, aa, </w>] (leftmost
    non-overlapping), never [a, aa, a] or [aaa, a]."""
    df = spark.createDataFrame([(0, "aaaa aaaa aa")], "doc_id long, text string")
    merges, state = bpe_train(df, 1)
    assert merges[0][:2] == ("a", "a")
    segs = {r["word"]: list(r["syms"]) for r in state.collect()}
    assert segs["aaaa"] == ["aa", "aa", EOW]
    assert segs["aa"] == ["aa", EOW]


def test_min_count_early_stop(spark):
    """Every pair is a hapax → zero merges learned."""
    df = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    merges, _ = bpe_train(df, 5)
    assert merges == []


def test_non_alpha_words_excluded(spark):
    df = spark.createDataFrame(
        [(0, "beta beta beta x9 x9 x9 x9 !! !!")], "doc_id long, text string"
    )
    merges, state = bpe_train(df, 3)
    words = {r["word"] for r in state.collect()}
    assert words == {"beta"}  # x9 / !! fail the [a-z]+ gate
    assert all(
        "9" not in a + b and "!" not in a + b for a, b, _ in merges
    )


def test_segment_reconstructs_words_randomized(spark):
    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "alphabet", "gambit", "beam"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(12))) for i in range(6)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges, _ = bpe_train(df, 8)
    seg = bpe_segment(df, merges)
    rows = seg.collect()
    # group subwords per (doc, word) occurrence is lost after explode;
    # instead check totals: per word, concat of its final symbols == word+EOW
    by_word = {}
    for r in rows:
        by_word.setdefault(r["word"], []).append(r["subword"])
    stream = Counter()
    for _, t in docs:
        for w in t.split():
            stream[w] += 1
    for w, subs in by_word.items():
        per_occurrence = len(subs) // stream[w]
        assert len(subs) % stream[w] == 0
        one = subs[:per_occurrence]
        assert "".join(one) == w + EOW


def test_merge_order_is_deterministic_tiebreak(spark):
    """Equal-count pairs resolve lexicographically: corpus 'xy xy ab ab'
    has pairs (a,b) (b,</w>) (x,y) (y,</w>) all count 2 — (a,b) wins."""
    df = spark.createDataFrame([(0, "xy xy ab ab")], "doc_id long, text string")
    merges, _ = bpe_train(df, 1)
    assert merges[0][:2] == ("a", "b")


def test_prefix_tiebreak_matches_duckdb_oracle(spark):
    """ADVICE r5: a count-tied pair where one symbol is a strict prefix
    of another ('a' vs 'ab') must resolve identically in Spark (raw
    symbols) and the DuckDB oracle (~-wrapped symbols): '~' (0x7E)
    sorts above lowercase, so ordering the WRAPPED forms would pick
    ('ab','c') where raw order picks ('a','c'). Corpus engineered so
    round 2's max count (3) ties exactly that shape."""
    import duckdb

    text = "ab acx acx acx abcy abcy abcy"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    merges, _ = bpe_train(df, 2)
    assert merges[0][:2] == ("a", "b")
    assert merges[1][:2] == ("a", "c")  # raw order: 'a' < 'ab'

    import __spark_entry__ as m

    sql = m._bpe_oracle_sql(2, """
        SELECT 1 AS rank, replace(a, '~', '') AS l, replace(b, '~', '') AS r
        FROM best1
        UNION ALL
        SELECT 2, replace(a, '~', ''), replace(b, '~', '') FROM best2
        ORDER BY rank
    """)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT 0 AS doc_id, '{text}' AS text"
    )
    got = con.execute(sql).fetchall()
    assert [(r[1], r[2]) for r in got] == [(a, b) for a, b, _ in merges]


def test_state_persist_roundtrip(spark, tmp_path):
    """r5 verdict ask #7: training from a persisted word-state parquet
    yields the identical merge table; the persisted final state equals
    the in-memory one; segmentation via the persisted seg_state equals
    the fold-chain path."""
    from acorn_hybrid_vector_search_spark.operators.bpe import (
        bpe_state_read,
        bpe_state_write,
        bpe_word_state,
    )

    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges_direct, final_direct = bpe_train(df, 6)

    wp = str(tmp_path / "words")
    bpe_state_write(bpe_word_state(df), wp)
    merges_persisted, final_p = bpe_train(None, 6, state=bpe_state_read(spark, wp))
    assert merges_persisted == merges_direct

    sp = str(tmp_path / "state")
    bpe_state_write(final_p, sp)
    back = {
        r["word"]: (r["freq"], tuple(r["syms"]))
        for r in bpe_state_read(spark, sp).collect()
    }
    direct = {
        r["word"]: (r["freq"], tuple(r["syms"])) for r in final_direct.collect()
    }
    assert back == direct

    plain = bpe_segment(df, merges_direct).collect()
    via_state = bpe_segment(
        df, merges_direct, seg_state=bpe_state_read(spark, sp)
    ).collect()
    key = lambda r: (r["doc_id"], r["word"], r["subword"])
    assert sorted(map(key, plain)) == sorted(map(key, via_state))

    # out-of-state words still segment through the fold chain
    df2 = spark.createDataFrame(
        CORPUS + [(9, "unseenword low")], ["doc_id", "text"]
    )
    mixed = bpe_segment(df2, merges_direct, seg_state=bpe_state_read(spark, sp))
    assert mixed.filter("word = 'unseenword'").count() > 0


def test_distributed_loop_matches_driver_local(spark, monkeypatch):
    """r14: bpe_train gained a size-gated driver-local fast path (the
    vocab state is tiny, rounds were pure job overhead). The tiny test
    corpora all take that path, so pin the DISTRIBUTED per-round loop —
    forced by zeroing the gate — against both the driver-local result
    and the independent python reference: same merges (incl. the
    weighted counts), same final segmentation, incl. the overlapping
    greedy case the string encoding must get right."""
    from acorn_hybrid_vector_search_spark.operators import bpe as bpemod

    corpus = CORPUS + [(4, "aaaa aaaa aa abab ababab")]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    local_merges, local_state = bpe_train(df, 12)
    monkeypatch.setattr(bpemod, "DRIVER_VOCAB_MAX", 0)
    dist_merges, dist_state = bpe_train(df, 12)
    assert dist_merges == local_merges
    want, want_state = _py_bpe([t for _, t in corpus], 12)
    assert dist_merges == want
    dist_segs = {r["word"]: tuple(r["syms"]) for r in dist_state.collect()}
    local_segs = {r["word"]: tuple(r["syms"]) for r in local_state.collect()}
    assert dist_segs == local_segs == want_state
