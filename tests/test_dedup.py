from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.operators.dedup import (
    embedding_near_dups,
    exact_dedup,
    exact_dedup_groups,
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash_near_dups,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the river runs cold "
    "and the tall trees sway in the evening wind near the old stone bridge"
)
NEAR = BASE.replace("evening", "morning")
FAR = (
    "spark executes declarative dataframe plans with catalyst optimizing "
    "predicate pushdown column pruning and adaptive shuffle partitioning"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE, "s1"),
        (2, "The  QUICK brown fox jumps over the lazy dog while the river runs cold "
            "and the tall trees sway in the evening wind near the old stone bridge", "s1"),
        (3, NEAR, "s1"),
        (4, FAR, "s1"),
        (5, BASE, "s2"),  # exact dup of 1, different source
        (6, "totally unrelated tiny text", "s2"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"]).cache()


def test_exact_dedup_groups(docs):
    groups = {r["keep_id"]: r["dup_count"] for r in exact_dedup_groups(docs).collect()}
    # 1, 2, 5 normalize to the same text → keep 1, count 3
    assert groups[1] == 3
    assert groups[3] == 1 and groups[4] == 1 and groups[6] == 1


def test_exact_dedup_survivors(docs):
    kept = sorted(r["doc_id"] for r in exact_dedup(docs).collect())
    assert kept == [1, 3, 4, 6]


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, 0.8).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # normalization-identical
    assert (1, 5) in pairs and pairs[(1, 5)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.9  # one-word swap
    assert not any(4 in p or 6 in p for p in pairs)


def test_ngram_jaccard_bucket_confinement(docs):
    pairs = set(
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, 0.8, bucket_col="source").collect()
    )
    assert (1, 2) in pairs
    assert (1, 5) not in pairs  # cross-bucket pair excluded by design


def test_minhash_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dups(docs, num_hashes=16, bands=8, verify_threshold=0.5).collect()
    }
    assert (1, 2) in pairs and (1, 5) in pairs and (2, 5) in pairs
    assert (1, 3) in pairs  # near-dup caught by some band
    assert not any(4 in p or 6 in p for p in pairs)


def test_simhash_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in simhash_near_dups(docs, max_hamming=6).collect()}
    assert (1, 2) in pairs and (1, 5) in pairs
    far_pairs = {p for p in pairs if 4 in p}
    assert not far_pairs


def test_banded_pairs_emitted_exactly_once(docs):
    """First-agreeing-band emission replaces the dropDuplicates shuffle —
    a pair colliding in several bands/chunks must still appear once."""
    sim = simhash_near_dups(docs, max_hamming=6).collect()
    assert len(sim) == len({(r["id_a"], r["id_b"]) for r in sim})
    mh = minhash_near_dups(docs, num_hashes=16, bands=8, verify_threshold=0.5).collect()
    assert len(mh) == len({(r["id_a"], r["id_b"]) for r in mh})
    # near-identical docs collide in MANY bands — they are the case that
    # would duplicate without the no-earlier-agreement conjunct
    assert any(r["sig_agreement"] >= 0.9 for r in mh)


def test_embedding_near_dups(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0], 0),
        (3, [0.0, 1.0, 0.0], 0),
        (4, [1.0, 0.0, 0.0], 1),  # same direction as 1, other bucket
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_near_dups(df, 0.99).collect()}
    assert pairs == {(1, 2), (1, 4), (2, 4)}
    bucketed = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(df, 0.99, bucket_col="label").collect()
    }
    assert bucketed == {(1, 2)}


def test_near_dup_components_and_collapse(spark):
    """Chain a-b-c plus pair d-e plus singleton f: components collapse to
    min ids; survivors keep one representative per cluster."""
    from acorn_hybrid_vector_search_spark.operators.dedup import (
        collapse_near_dups,
        near_dup_components,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id_a long, id_b long"
    )
    comp = {
        r["doc_id"]: r["component"]
        for r in near_dup_components(docs, pairs).collect()
    }
    assert comp == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}
    kept = sorted(r["doc_id"] for r in collapse_near_dups(docs, pairs).collect())
    assert kept == [0, 3, 5]


def test_components_chain_pointer_jumping(spark):
    """A 64-node chain (the adversarial diameter shape): pointer jumping
    must converge inside the default budget, match plain propagation,
    and plain propagation must RAISE (not silently return partial
    merges) when its round budget is smaller than the diameter."""
    import pytest as pt
    from pyspark.sql import functions as F

    from acorn_hybrid_vector_search_spark.operators.dedup import (
        near_dup_components,
    )

    n = 64
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    got = near_dup_components(docs, pairs).collect()
    assert all(r["component"] == 0 for r in got) and len(got) == n

    # the same fixpoint via plain propagation (enough rounds)
    slow = near_dup_components(docs, pairs, shortcut=False, max_iter=70).collect()
    assert sorted(map(tuple, slow)) == sorted(map(tuple, got))

    # diameter > budget without the shortcut → loud failure
    with pt.raises(RuntimeError, match="did not converge"):
        near_dup_components(docs, pairs, shortcut=False, max_iter=5)


def test_components_random_graph_parity(spark):
    """Random sparse graph: shortcut and plain propagation agree with a
    pure-Python union-find oracle."""
    import random

    from pyspark.sql import functions as F

    from acorn_hybrid_vector_search_spark.operators.dedup import (
        near_dup_components,
    )

    rng = random.Random(42)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id canonical labels
    exp = {}
    for v in range(n):
        root = find(v)
        exp.setdefault(root, v)  # first (smallest) member seen
    want = {v: exp[find(v)] for v in range(n)}

    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    pdf = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["doc_id"]: r["component"]
        for r in near_dup_components(docs, pdf).collect()
    }
    assert got == want


def test_components_phantom_pair_endpoints(spark):
    """Pair endpoints absent from df (externally-derived pairs): the
    transitive closure must still route THROUGH the phantom id, the
    phantom must not leak into the output, and convergence must not be
    declared early (ADVICE r4: NULL _old rows never counted toward
    `changed`). Chain a-900-b connects a and b only via phantom 900."""
    from acorn_hybrid_vector_search_spark.operators.dedup import (
        near_dup_components,
    )

    docs = spark.createDataFrame(
        [(1,), (2,), (3,), (4,)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(2, 900), (900, 4)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in near_dup_components(docs, pairs).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 4: 2}


def test_route_dedup_matrix():
    """Pin the dedup router's decision matrix (STRATEGY.md §Dedup
    routing, r4 verdict ask #7)."""
    import pytest as pt

    from acorn_hybrid_vector_search_spark.plans.router import (
        minhash_banding,
        route_dedup,
    )

    # exact-only tolerance → exact, regardless of size/length
    assert route_dedup(10**9, 500, threshold=1.0).strategy == "exact"
    assert route_dedup(100, 5, threshold=1.0).strategy == "exact"
    # substring granularity wins over everything else
    assert route_dedup(10**9, 500, granularity="substring").strategy == "substring"
    # passage granularity → winnowing fingerprint overlap (provenance
    # of long copied passages, vs substring's remove-the-span)
    passage = route_dedup(10**9, 500, granularity="passage")
    assert passage.strategy == "winnow"
    assert passage.params == {
        "k": 4, "window": 4, "min_shared": 2, "bucket_cap": 126492,
    }
    # rule 6: every pair-emitting rung carries the emission cap
    # bucket_cap = max(64, ceil(4*sqrt(n))) (VERDICT r6 ask #1)
    assert route_dedup(10**6, 300, threshold=0.7).params["bucket_cap"] == 4000
    assert route_dedup(10**6, 300, threshold=0.95).params["bucket_cap"] == 4000
    assert route_dedup(100, 300, threshold=0.7).params["bucket_cap"] == 64  # floor
    # the semantic rung is pair-emitting too (r7 /code-review finding):
    # its LSH bucket carries the same cap
    emb = route_dedup(10**6, 50, threshold=0.8, semantic=True, has_embeddings=True)
    assert emb.params["bucket_cap"] == 4000 and emb.params["n_planes"] == 8
    # the exact rung emits no pairs -> no cap in its params
    assert "bucket_cap" not in route_dedup(10**6, 300, threshold=1.0).params
    with pt.raises(ValueError, match="granularity"):
        route_dedup(10**6, 50, granularity="sentence")
    # near-exact on long docs → simhash; short docs fall to minhash
    assert route_dedup(10**6, 300, threshold=0.95).strategy == "simhash"
    assert route_dedup(10**6, 30, threshold=0.95).strategy == "minhash"
    # looser tolerance → minhash even on long docs
    assert route_dedup(10**6, 300, threshold=0.7).strategy == "minhash"
    # semantic → embedding, and demands the column
    assert (
        route_dedup(10**6, 50, threshold=0.8, semantic=True, has_embeddings=True).strategy
        == "embedding"
    )
    with pt.raises(ValueError, match="embedding column"):
        route_dedup(10**6, 50, threshold=0.8, semantic=True)
    # banding follows the MMDS S-curve midpoint rule
    for threshold, expect in [(0.95, (2, 8)), (0.7, (4, 4)), (0.4, (8, 2))]:
        assert minhash_banding(threshold, 16) == expect
    # simhash hamming budget scales with dissimilarity tolerance
    assert route_dedup(10**6, 300, threshold=0.97).params["max_hamming"] == 2
    assert route_dedup(10**6, 300, threshold=0.90).params["max_hamming"] == 6


def test_dedup_search_dispatch(spark):
    """dedup_search applies the routed strategy end-to-end: exact route
    returns survivors; minhash route returns verified pairs."""
    from acorn_hybrid_vector_search_spark.plans.router import (
        dedup_search,
        route_dedup,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "completely different text about spark physical planning"),
        ],
        "doc_id long, text string",
    )
    exact = dedup_search(docs, route_dedup(3, 11, threshold=1.0))
    assert sorted(r["doc_id"] for r in exact.collect()) == [1, 3]

    pairs = dedup_search(docs, route_dedup(3, 11, threshold=0.7)).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}

    wpairs = dedup_search(
        docs, route_dedup(3, 11, granularity="passage")
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in wpairs} == {(1, 2)}
    assert wpairs[0]["overlap"] == 1.0

    # r7: the semantic rung dispatches END-TO-END with rule 6 — LSH
    # buckets generated, bucket_cap applied (a template cluster's
    # near-identical vectors all land in one bucket)
    vecs = spark.createDataFrame(
        [
            (1, "a", [1.0, 0.0, 0.1, 0.0]),
            (2, "b", [0.999, 0.01, 0.1, 0.0]),
            (3, "c", [0.0, 1.0, 0.0, 0.2]),
        ],
        "doc_id long, text string, embedding array<float>",
    )
    epairs = dedup_search(
        vecs, route_dedup(3, 1, threshold=0.95, semantic=True, has_embeddings=True)
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in epairs} == {(1, 2)}


def test_minhash_store_roundtrip_and_incremental_probe(spark, tmp_path):
    """r6 incremental dedup: (a) the persisted signature store reads
    back exactly what minhash_signatures computes; (b) probing a NEW
    batch against the store finds exactly the cross-relation subset of
    the full self-join's pairs (same banding, same verification) —
    i.e. incremental ingestion loses nothing vs recomputing the corpus."""
    from acorn_hybrid_vector_search_spark.operators.dedup import (
        minhash_near_dups,
        minhash_probe_pairs,
        minhash_read,
        minhash_signatures,
        minhash_write,
    )
    from acorn_hybrid_vector_search_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    store_docs = docs.filter("doc_id % 3 != 0")
    new_docs = docs.filter("doc_id % 3 = 0")

    path = str(tmp_path / "store")
    minhash_write(store_docs, path)
    back = {
        r["id"]: (r["n"], tuple(r["sig"]), tuple(sorted(r["sh"])))
        for r in minhash_read(spark, path).collect()
    }
    direct = {
        r["id"]: (r["n"], tuple(r["sig"]), tuple(sorted(r["sh"])))
        for r in minhash_signatures(store_docs).collect()
    }
    assert back == direct

    probe = minhash_probe_pairs(
        minhash_signatures(new_docs), minhash_read(spark, path),
        bands=8, verify_threshold=0.5,
    )
    got = {
        frozenset((r["id_new"], r["id_store"])): r["jaccard"]
        for r in probe.collect()
    }
    full = minhash_near_dups(docs, num_hashes=16, bands=8, verify_threshold=0.5)
    want = {
        frozenset((r["id_a"], r["id_b"])): r["jaccard"]
        for r in full.collect()
        if (r["id_a"] % 3 == 0) != (r["id_b"] % 3 == 0)  # cross-side only
    }
    assert got == want


def test_exact_dedup_null_text_survivor(spark):
    """NULL-text rows (fingerprint_md5 -> NULL) are ONE dup group whose
    min-id row survives (ADVICE r6: a plain == semi-join dropped every
    null-text row; eqNullSafe restores the window plan's semantics)."""
    rows = [(1, None, "s"), (2, None, "s"), (3, "real text here", "s")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    groups = {r["keep_id"]: r["dup_count"] for r in exact_dedup_groups(df).collect()}
    assert groups == {1: 2, 3: 1}
    kept = sorted(r["doc_id"] for r in exact_dedup(df).collect())
    assert kept == [1, 3]


# ---------------------------------------------------------------------------
# LSH band-bucket emission cap (VERDICT r6 ask #1)


@pytest.fixture(scope="module")
def template_docs(spark):
    """A planted boilerplate TEMPLATE cluster: 30 near-identical-but-not-
    exact docs (each ends in a unique token, so fingerprints differ and
    the exact rung cannot collapse them) + 10 unrelated docs. Uncapped,
    the template bucket emits C(30,2)=435 pairs — quadratic by
    construction; the cap must bound it."""
    tpl = " ".join(
        f"tpl{i} word{i} common shared template boiler plate text body"
        for i in range(5)
    )
    rows = [(i, f"{tpl} unique{i}", "s") for i in range(30)]
    rows += [
        (100 + i,
         f"totally different document number {i} with its own words {i*7} {i*13}",
         "s")
        for i in range(10)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string").cache()


def test_minhash_bucket_cap_bounds_template_emission(template_docs):
    un = minhash_near_dups(
        template_docs, num_hashes=16, bands=8, verify_threshold=0.5
    ).count()
    assert un == 435  # C(30,2): the quadratic blowup is real
    capped = minhash_near_dups(
        template_docs, num_hashes=16, bands=8, verify_threshold=0.5, bucket_cap=8
    ).count()
    assert capped == 28  # C(8,2): bounded regardless of bucket size
    # non-binding cap == uncapped, pair-for-pair
    big = minhash_near_dups(
        template_docs, num_hashes=16, bands=8, verify_threshold=0.5, bucket_cap=1000
    )
    unc = minhash_near_dups(template_docs, num_hashes=16, bands=8, verify_threshold=0.5)
    assert sorted(map(tuple, big.collect())) == sorted(map(tuple, unc.collect()))


def test_bucket_cap_deterministic_across_partitioning(template_docs):
    a = sorted(
        map(tuple, minhash_near_dups(
            template_docs, num_hashes=16, bands=8, verify_threshold=0.5, bucket_cap=8
        ).collect())
    )
    b = sorted(
        map(tuple, minhash_near_dups(
            template_docs.repartition(7), num_hashes=16, bands=8,
            verify_threshold=0.5, bucket_cap=8,
        ).collect())
    )
    assert a == b and len(a) == 28


def test_winnow_and_simhash_bucket_caps(template_docs):
    from acorn_hybrid_vector_search_spark.operators.dedup import winnow_near_dups

    w_un = winnow_near_dups(template_docs).count()
    w_cap = winnow_near_dups(template_docs, bucket_cap=8).count()
    assert w_un == 435 and 28 <= w_cap < 120  # bounded: sum over fp buckets
    s_un = simhash_near_dups(template_docs, max_hamming=3).count()
    s_cap = simhash_near_dups(template_docs, max_hamming=3, bucket_cap=8).count()
    assert s_cap < s_un and s_cap <= 5 * 28  # ≤ C(8,2) per chunk band
    # capped winnow scores never inflate: overlap denominator is pre-cap
    for r in winnow_near_dups(template_docs, bucket_cap=8).collect():
        assert r["overlap"] <= 1.0


def test_bucket_cap_stats_disclosure(template_docs):
    st = {
        r["bucket"]: r
        for r in minhash_near_dups(
            template_docs, num_hashes=16, bands=8, verify_threshold=0.5,
            bucket_cap=8, cap_stats=True,
        ).collect()
    }
    assert st, "the planted template must surface in the stats"
    for r in st.values():
        assert r["bucket_n"] > 8
        assert r["kept_n"] == 8 and r["dropped_n"] == r["bucket_n"] - 8
        assert r["pairs_uncapped"] == r["bucket_n"] * (r["bucket_n"] - 1) // 2
        assert r["pairs_capped"] == 28
    # the 30-doc template bucket is disclosed with its would-be emission
    assert any(r["bucket_n"] == 30 and r["pairs_uncapped"] == 435 for r in st.values())


def test_bucket_cap_validation(template_docs):
    with pytest.raises(ValueError, match="bucket_cap must be >= 2"):
        minhash_near_dups(template_docs, bucket_cap=1).count()
    with pytest.raises(ValueError, match="cap_stats=True requires bucket_cap"):
        minhash_near_dups(template_docs, cap_stats=True)


def test_probe_caps_and_joint_hotness(spark, template_docs):
    """The incremental probes carry the same emission cap as the
    self-joins (r7): capped < uncapped, non-binding ≡ uncapped — and
    the JOINT hotness routing is complete: a bucket over cap on the
    STORE side only (new batch small) still emits its cross pairs (a
    per-side-only split would silently drop them into neither join)."""
    from acorn_hybrid_vector_search_spark.operators.dedup import (
        minhash_probe_pairs,
        minhash_signatures,
        winnow_fingerprint_table,
        winnow_probe_pairs,
    )

    # new batch: only 4 template docs (every bucket under cap on the
    # new side); store: 26 template docs (over cap at 8)
    new = template_docs.filter("doc_id < 4")
    store = template_docs.filter("doc_id >= 4")
    ns, ss = minhash_signatures(new), minhash_signatures(store)
    un = minhash_probe_pairs(ns, ss, bands=8, verify_threshold=0.5).count()
    capped = minhash_probe_pairs(
        ns, ss, bands=8, verify_threshold=0.5, bucket_cap=8
    ).count()
    assert un == 4 * 26  # every new template doc pairs with every stored one
    assert 0 < capped < un  # store-side-hot buckets still emit (joint routing)
    big = minhash_probe_pairs(ns, ss, bands=8, verify_threshold=0.5, bucket_cap=10**6)
    unc = minhash_probe_pairs(ns, ss, bands=8, verify_threshold=0.5)
    assert sorted(map(tuple, big.collect())) == sorted(map(tuple, unc.collect()))

    nf, sf2 = winnow_fingerprint_table(new), winnow_fingerprint_table(store)
    w_un = winnow_probe_pairs(nf, sf2).count()
    w_cap = winnow_probe_pairs(nf, sf2, bucket_cap=8).count()
    assert w_un == 4 * 26 and 0 < w_cap < w_un
    for r in winnow_probe_pairs(nf, sf2, bucket_cap=8).collect():
        assert r["overlap"] <= 1.0  # pre-cap denominator never inflates


def test_materialize_invalidated_on_store_rewrite(spark, tmp_path):
    """Stale-pin guard (r7 /code-review): semantic dedup in the
    materialize cache compares canonicalized plans, and two reads of
    the same parquet root are equal EVEN AFTER a rewrite — store
    writers must invalidate, so a probe after an in-session rewrite
    sees the NEW store, never the pinned pre-rewrite snapshot."""
    from acorn_hybrid_vector_search_spark.operators.dedup import (
        winnow_fingerprint_table,
        winnow_probe_pairs,
        winnow_read,
        winnow_write,
    )

    tpl = "the shared template passage repeated across documents verbatim body"
    path = str(tmp_path / "store")
    v1 = spark.createDataFrame(
        [(10, tpl + " ten"), (11, "completely unrelated words here indeed")],
        "doc_id long, text string",
    )
    winnow_write(v1, path)
    new = winnow_fingerprint_table(
        spark.createDataFrame([(1, tpl + " one")], "doc_id long, text string")
    )
    # capped probe: pins the capped store relation
    first = winnow_probe_pairs(new, winnow_read(spark, path), bucket_cap=8).collect()
    assert {r["id_store"] for r in first} == {10}
    # REWRITE the store in-session: doc 10 replaced by doc 20
    v2 = spark.createDataFrame(
        [(20, tpl + " twenty"), (21, "different filler text entirely here")],
        "doc_id long, text string",
    )
    winnow_write(v2, path)
    second = winnow_probe_pairs(new, winnow_read(spark, path), bucket_cap=8).collect()
    assert {r["id_store"] for r in second} == {20}, (
        "stale pinned store served after rewrite"
    )


def test_materialize_evicts_dead_sessions(spark):
    """The materialize LRU must not retain (or serve) frames pinned under
    a different/stopped SparkSession (r8 ADVICE: _PINNED was process-global
    with no session key — the same bug class the prepared-query cache
    fixed in r7, test_prepared_cache_evicts_dead_sessions)."""
    from acorn_hybrid_vector_search_spark.operators import _cache

    class _DeadFrame:
        unpersisted = False

        def unpersist(self):
            self.unpersisted = True

    dead = _DeadFrame()
    _cache._PINNED.insert(0, ("app-dead-999", 0, dead))
    out = _cache.materialize(spark.range(3))
    assert out.count() == 3
    assert all(pa != "app-dead-999" for pa, _, _ in _cache._PINNED)
    assert dead.unpersisted


def test_dedup_search_embedding_empty_corpus(spark):
    """dedup_search's embedding rung derives the LSH dim from a head()
    scan; on an EMPTY corpus head() returns None (r8 ADVICE defect) —
    the route must answer with an empty pairs frame, not a TypeError."""
    from acorn_hybrid_vector_search_spark.plans.router import (
        dedup_search,
        route_dedup,
    )

    route = route_dedup(
        0, 50.0, threshold=0.9, semantic=True, has_embeddings=True
    )
    assert route.strategy == "embedding"
    empty = spark.createDataFrame(
        [], "doc_id long, text string, embedding array<double>"
    )
    pairs = dedup_search(empty, route)
    assert pairs.count() == 0
    assert set(pairs.columns) == {"id_a", "id_b", "cosine"}


def test_cap_bypass_when_not_binding(spark):
    """r8 non-binding bypass (_cap_binds): a cap far above every bucket
    must (a) return exactly the uncapped pairs and (b) build a plan with
    NO window/rank machinery — the probe proved the cap can't bind, so
    the count-join/rank/union pipeline must not run. A binding cap on
    the same corpus must still build it (the plan-shape pins cover the
    flagship queries; this is the direct operator-level regression)."""
    from acorn_hybrid_vector_search_spark.operators.dedup import minhash_near_dups

    tpl = "the shared boilerplate template text repeated across documents"
    docs = spark.createDataFrame(
        [(i, tpl + f" tail{i % 3}") for i in range(12)]
        + [(100 + i, f"unique document number {i} content words") for i in range(6)],
        "doc_id long, text string",
    )
    uncapped = minhash_near_dups(docs, bands=8, verify_threshold=0.5)
    loose = minhash_near_dups(docs, bands=8, verify_threshold=0.5, bucket_cap=10**6)
    assert sorted(map(tuple, uncapped.collect())) == sorted(
        map(tuple, loose.collect())
    )
    p = loose._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in p and "Window" not in p
    tight = minhash_near_dups(docs, bands=8, verify_threshold=0.5, bucket_cap=3)
    pt = tight._jdf.queryExecution().executedPlan().toString()
    assert "Window" in pt  # binding cap keeps the rank machinery


def test_cap_probe_memo_invalidated_on_store_rewrite(spark, tmp_path):
    """_cap_binds' memoized verdict must be dropped by invalidate() (the
    store-writer hook): after an in-session rewrite makes a bucket hot,
    a semantically-equal probe plan must re-probe and see it bind."""
    from acorn_hybrid_vector_search_spark.operators import _cache
    from acorn_hybrid_vector_search_spark.operators.dedup import _cap_binds

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, i % 5) for i in range(10)], "id long, b long"
    ).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    assert _cap_binds(df, ["b"], 3) is False
    # memo hit: same verdict without recompute (presence in _PROBE)
    assert any(e[2] == ("cap_binds", 3) for e in _cache._PROBE)
    # rewrite: all rows in one bucket → binds; writers call invalidate()
    spark.createDataFrame(
        [(i, 0) for i in range(10)], "id long, b long"
    ).write.mode("overwrite").parquet(path)
    _cache.invalidate()
    assert _cap_binds(spark.read.parquet(path), ["b"], 3) is True


def test_components_driver_equals_distributed(spark, monkeypatch):
    """r14: near_dup_components gained a size-gated driver-local
    union-find (tiny graphs were paying per-round job overhead). Force
    the distributed loop by zeroing the gate and pin it equal to the
    driver path on a graph with chains, singletons, and a phantom
    endpoint (an edge id absent from df)."""
    from acorn_hybrid_vector_search_spark.operators import dedup as dmod
    from acorn_hybrid_vector_search_spark.operators.dedup import (
        near_dup_components,
    )

    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(12)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [
            (11, 3),   # chain tail
            (3, 7),
            (5, 2),
            (2, 0),
            (99, 8),   # phantom endpoint 99 bridges 8 and 9
            (9, 99),
        ],
        "id_a long, id_b long",
    )
    local = {
        (r["doc_id"], r["component"])
        for r in near_dup_components(df, pairs).collect()
    }
    monkeypatch.setattr(dmod, "DRIVER_CC_MAX", 0)
    dist = {
        (r["doc_id"], r["component"])
        for r in near_dup_components(df, pairs).collect()
    }
    assert local == dist
    comp = dict(local)
    assert comp[11] == comp[3] == comp[7] == 3
    assert comp[5] == comp[2] == comp[0] == 0
    assert comp[8] == comp[9] == 8  # closure THROUGH the phantom
    assert comp[1] == 1 and comp[10] == 10  # singletons
