"""Deduplication operators for 100 TB training-data pipelines.

Charter extension (BASELINE.json north star). Five families, each designed
around its shuffle profile:

- **exact**: one hash aggregate on the md5 fingerprint — a single shuffle
  on a high-entropy key (no skew), map-side partial agg.
- **MinHash + LSH banding**: signature → band keys → groupBy band →
  candidate pairs → verified Jaccard. The self-join is confined to LSH
  buckets, so cost is Σ|bucket|² instead of N² — the standard
  scale-out near-dup pattern.
- **SimHash**: 60-bit fingerprint; near-dups = small hamming distance.
  Banding on bit-chunks gives the same bucketed-join shape.
- **n-gram Jaccard**: exact verified pairwise similarity, for use inside
  buckets or small partitions (it IS quadratic — never run unbucketed at
  scale; ``ngram_jaccard_pairs`` takes a bucket column for that reason).
- **embedding cosine**: near-dup by vector similarity, bucketed the same
  way (or via similarity.lsh buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.functions.text import (
    _hash64,
    fingerprint_md5,
    shingles,
    simhash64,
    tokens,
    winnow_fingerprints,
)


# Pinned materialization for signature relations a pair self-join
# consumes on BOTH sides — shared LRU semantics live in _cache.py.
from acorn_hybrid_vector_search_spark.operators._cache import (
    materialize as _materialize,
)


def _probe_parallelism(df: DataFrame) -> int:
    """Target partition count for the probe side of a pair self-join:
    max(shuffle partitions, cluster parallelism). Small inputs arrive as
    one file → one partition, which would serialize the O(N²) probe.
    Session-conf only — touching ``df.rdd`` here would force RDD
    materialization of the plan (driver-side planning cost per call)."""
    sp = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(sp, df.sparkSession.sparkContext.defaultParallelism)


# ---------------------------------------------------------------------------
# LSH band-bucket emission cap (VERDICT r6 ask #1)


def _cap_draw(bucket_cols: list[str], id_col: str) -> Column:
    """Deterministic per-(bucket, member) draw: the portable 60-bit md5
    hash of 'lshcap:<bucket cols>:<id>' — engine-portable (DuckDB
    replays it via _h64_sql), so WHICH members survive a capped bucket
    is a pure function of the data, reproducible on any engine or
    partitioning."""
    return _hash64(
        F.concat_ws(
            ":",
            F.lit("lshcap"),
            *[F.col(c).cast("string") for c in bucket_cols],
            F.col(id_col).cast("string"),
        )
    )


def _cap_binds(banded: DataFrame, bucket_cols: list[str], cap: int) -> bool:
    """Does ANY bucket exceed ``cap``? One bounded partial-agg probe —
    a 1-row scalar collect, the router-stats / BPE-argmax class.

    The r8 non-binding bypass (VERDICT r7 routed_dedup_pairs triage):
    rule 6 puts the cap at 4·√n, far above organic bucket sizes, so in
    the overwhelmingly common case the answer is NO — and the full cap
    machinery (count join-back, salted rank, bounded sort-agg,
    semi-join, union, the callers' materialize + g×g grid branch) would
    run to keep nothing. Callers probe first and skip ALL of it when
    the cap cannot bind; output is identical by construction (an
    all-under-cap relation passes through the machinery unchanged).
    Measured on the routed minhash rung at sf0.1: 1.49 → 0.86 s/call
    (isolated median-of-5; PLANS.md §triage-r8). When the probe finds
    an over-cap bucket, the machinery is built exactly as before — the
    probe's counts are recomputed in-plan; the rescan of the (always
    caller-materialized) banded relation is the cheap part.

    The verdict is MEMOIZED per (session, plan semantics, cap)
    (_cache.probe_memo): repeat calls — bench loops, notebooks — would
    otherwise pay the probe's fixed job overhead per call on every
    BINDING capped query too. Store writers invalidate() the memo, so
    an in-session store rewrite re-probes."""
    from acorn_hybrid_vector_search_spark.operators._cache import probe_memo

    def compute() -> bool:
        mx = (
            banded.select(*bucket_cols)  # keys only — no payload shuffled
            .groupBy(*bucket_cols)
            .agg(F.count(F.lit(1)).alias("_bn"))
            .agg(F.max("_bn"))
            .head()
        )
        return mx is not None and mx[0] is not None and int(mx[0]) > cap

    return probe_memo(banded, ("cap_binds", cap), compute)


def _cap_bucket_members(
    banded: DataFrame,
    bucket_cols: list[str],
    cap: int,
    *,
    id_col: str = "id",
    flag_col: str | None = None,
) -> DataFrame:
    """Bound pair EMISSION from a banded LSH self-join: keep at most
    ``cap`` members per band bucket, chosen by the deterministic md5
    draw (ties → id) — so a bucket's pair output is ≤ cap·(cap−1)/2
    regardless of bucket size.

    Why this exists (VERDICT r6 'what's missing' #2): the banded join's
    cost is Σ|bucket|², which is fine when buckets are small — but a
    boilerplate TEMPLATE shared by 10⁶ near-identical-but-not-exact
    docs (survives the exact rung: fingerprints differ) puts 10⁶
    members in ONE bucket and its pair output alone is ~5·10¹¹ rows,
    quadratic by construction on any engine. The join KEY is
    AQE-splittable, but nothing bounds the OUTPUT. Standard practice
    caps over-cap buckets with a disclosed recall trade; the companion
    ``_bucket_cap_stats`` surfaces exactly what was capped (the repo's
    no-silent-caps rule).

    Plan shape: same two-phase de-skew as sampling.cap_per_group — the
    hot bucket is exactly the key a ``Window.partitionBy(bucket)`` rank
    would serialize, so (1) partial-agg bucket counts join back
    (AQE-splittable), (2) buckets ≤ cap — the overwhelming majority —
    bypass ranking entirely, (3) over-cap buckets rank per 32-way salt
    sub-bucket then an exact bounded sort-agg (≤ 32·cap candidates per
    bucket) picks the global top-cap, semi-joined back. No Window on
    the bare bucket key (pinned by tests/test_plan_shapes.py).

    Bucket keys (band indices, band-key strings, chunk values, winnow
    fingerprints) are non-null by construction, so plain equi-joins are
    safe here (cf. the eqNullSafe fix in cap_per_group, whose group
    keys are user data).

    ``flag_col``: when set, the output carries a boolean column marking
    rows whose bucket WAS over cap — the caller routes those buckets'
    pair generation through the g×g grid join (``_grid_side``), because
    even the capped C(cap,2) pairs of one bucket are one join key = one
    task otherwise (measured: 17.8 s max task at cap=1132 on the
    x16tmpl ladder before the grid landed).
    """
    if cap < 2:
        raise ValueError(f"bucket_cap must be >= 2 (pairs need 2 members), got {cap}")
    from pyspark.sql.window import Window

    n_salt = 32
    cols = list(banded.columns)
    counts = banded.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("_bn"))
    joined = banded.join(counts, bucket_cols)
    under = joined.where(F.col("_bn") <= cap).select(*cols)
    over = (
        joined.where(F.col("_bn") > cap)
        .withColumn("_h", _cap_draw(bucket_cols, id_col))
        .withColumn(
            "_sb",
            F.pmod(
                _hash64(F.concat_ws(":", F.lit("lshcapb"), F.col(id_col).cast("string"))),
                F.lit(n_salt),
            ),
        )
    )
    wb = Window.partitionBy(*bucket_cols, "_sb").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    local = (
        over.withColumn("_rk", F.row_number().over(wb))
        .where(F.col("_rk") <= cap)
        .drop("_rk", "_sb")
    )
    keep = (
        local.groupBy(*bucket_cols)
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_h"), F.col(id_col).alias("_k")))
                ),
                1,
                cap,
            ).alias("_cand")
        )
        .select(
            *[F.col(c).alias(f"_kg{i}") for i, c in enumerate(bucket_cols)],
            F.explode(F.col("_cand._k")).alias("_kk"),
        )
    )
    survivors = local.join(
        keep,
        on=[F.col(c) == F.col(f"_kg{i}") for i, c in enumerate(bucket_cols)]
        + [F.col(id_col) == F.col("_kk")],
        how="left_semi",
    ).select(*cols)
    if flag_col is None:
        return under.unionByName(survivors)
    return under.withColumn(flag_col, F.lit(False)).unionByName(
        survivors.withColumn(flag_col, F.lit(True))
    )


_GRID_G = 8

# near_dup_components' driver-local gate: an edge list AND id set at or
# under this row count run exact union-find in-process (the bpe_train
# hand-off pattern); larger graphs take the distributed O(log d) loop.
DRIVER_CC_MAX = 1 << 16


def _grid_side(
    df: DataFrame,
    side: str,
    bucket_cols: list[str],
    *,
    id_col: str = "id",
    g: int = _GRID_G,
) -> DataFrame:
    """One side of the g×g pair-generation grid for OVER-cap buckets.

    Even after the member cap, one bucket's C(cap,2) pairs share ONE
    join key — one task, no AQE escape (OptimizeSkewedJoin splits by
    INPUT partition size; a hot bucket's input is only ``cap`` rows but
    its join OUTPUT is quadratic). The grid decomposes that work: each
    member gets a deterministic cell coordinate p = h(id) mod g; the
    LEFT side replicates to cells (p, 0..g−1), the RIGHT to cells
    (0..g−1, p), and the join key gains (_ca, _cb) — so the pair (a, b)
    matches in EXACTLY one cell (p_a, p_b), the hot bucket fans out
    over g² join keys, and per-task pair work drops to ~(cap/g)².
    Replication cost is g× the (already ≤ cap-bounded) hot-bucket rows
    — bounded, never corpus-scaled. Output pair set is IDENTICAL to
    the plain join (cell uniqueness), so oracles are unaffected.

    The LEFT side is pinned into an EXPLICIT-numPartitions repartition
    on the full (bucket, cell) join key. Without it the grid silently
    re-serializes: the hot side is only ~cap·g·n_hot rows (tens of MB),
    so AQE coalesces its shuffle to ONE partition and broadcast-joins
    it — partition sizing sees join INPUT bytes, not the quadratic join
    OUTPUT — and every cell's pairs run in one task again (measured:
    max/p50 95 on x16tmpl before this pin). Explicit numPartitions
    disables AQE coalescing, so the g²·n_hot cells stay spread.
    """
    p = F.pmod(
        _hash64(F.concat_ws(":", F.lit("lshgrid"), F.col(id_col).cast("string"))),
        F.lit(g),
    ).cast("int")
    if side == "a":
        cells = F.array(
            *[F.struct(p.alias("ca"), F.lit(j).cast("int").alias("cb")) for j in range(g)]
        )
    else:
        cells = F.array(
            *[F.struct(F.lit(i).cast("int").alias("ca"), p.alias("cb")) for i in range(g)]
        )
    out = (
        df.withColumn("_cell", F.explode(cells))
        .withColumn("_ca", F.col("_cell.ca"))
        .withColumn("_cb", F.col("_cell.cb"))
        .drop("_cell")
    )
    if side == "a":
        out = out.repartition(
            _probe_parallelism(df),
            *[F.col(c) for c in bucket_cols],
            F.col("_ca"),
            F.col("_cb"),
        )
    return out


def _joint_hot_split(
    flagged_a: DataFrame, flagged_b: DataFrame, bucket_cols: list[str]
):
    """Split BOTH sides of a capped cross-relation join by JOINT bucket
    hotness: a bucket is hot iff it was over cap on EITHER side (per-
    side flags alone would route a cold-new × hot-store bucket into
    neither the plain nor the grid join and silently drop its pairs).
    The hot-key set is one row per over-cap bucket — bounded by
    construction, broadcast into map-side semi/anti joins. Returns
    (a_cold, a_hot, b_cold, b_hot); plain-join the colds, grid-join the
    hots — disjoint and complete."""
    hot_keys = (
        flagged_a.where(F.col("_hot"))
        .select(*bucket_cols)
        .unionByName(flagged_b.where(F.col("_hot")).select(*bucket_cols))
        .distinct()
    )

    def split(flagged: DataFrame):
        kept = flagged.drop("_hot")
        cold = kept.join(F.broadcast(hot_keys), bucket_cols, "left_anti")
        hot = kept.join(F.broadcast(hot_keys), bucket_cols, "left_semi")
        return cold, hot

    a_cold, a_hot = split(flagged_a)
    b_cold, b_hot = split(flagged_b)
    return a_cold, a_hot, b_cold, b_hot


def _bucket_cap_stats(
    banded: DataFrame, bucket_cols: list[str], cap: int
) -> DataFrame:
    """The no-silent-caps disclosure for ``_cap_bucket_members``: one row
    per OVER-cap bucket — (bucket, bucket_n, kept_n, dropped_n,
    pairs_uncapped, pairs_capped). ``pairs_uncapped`` is what the bucket
    WOULD have emitted (n·(n−1)/2); ``pairs_capped`` its bound after the
    cap. Partial-agg only — never row-scaled state."""
    bn = F.col("bucket_n")
    return (
        banded.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .where(bn > cap)
        .select(
            F.concat_ws(
                ":", *[F.col(c).cast("string") for c in bucket_cols]
            ).alias("bucket"),
            bn,
            F.lit(cap).cast("long").alias("kept_n"),
            (bn - cap).cast("long").alias("dropped_n"),
            # integer halving (shiftright): bn·(bn−1) is even, and the
            # double division a cast-after-/2 would round loses exactness
            # past 2^53 — inside the 10^8-multiplicity regime this
            # module documents (/code-review r7)
            F.shiftright(bn * (bn - 1), 1).alias("pairs_uncapped"),
            F.lit(cap * (cap - 1) // 2).cast("long").alias("pairs_capped"),
        )
    )


# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct normalized text: (fingerprint, keep_id = min id,
    dup_count). The survivor-selection policy of hash-based dedup."""
    return (
        df.withColumn("fingerprint", fingerprint_md5(text_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The deduplicated table: keep the min-id row per fingerprint.

    Scale shape (VERDICT r5 'what's wrong' #1): duplicate multiplicity in
    a web corpus is power-law — a boilerplate/empty page occurs 10^6-10^8
    times, so a ``Window.partitionBy(fingerprint)`` row_number puts the
    hottest fingerprint in ONE task with no AQE escape (Spark only
    skew-splits joins, never window partitions). Instead: the survivor
    policy is already a partial aggregate — ``exact_dedup_groups``
    computes (fingerprint, keep_id=min(id)) with map-side combine, one
    row per fingerprint per mapper regardless of multiplicity — and the
    survivor ROWS are a left-semi equi-join of df on
    (fingerprint, id) = (fingerprint, keep_id), which
    OptimizeSkewedJoin can split. No Window anywhere in the plan
    (pinned by tests/test_plan_shapes.py).

    Precondition: ``id_col`` is unique per row (it is the row
    identity). If the same (text, id) row appears twice — a malformed
    re-ingested batch — every copy of the surviving id passes the
    semi-join; run exact row-level dedup (``df.dropDuplicates()``)
    upstream first, the same contract as any keyed merge here
    (scd2_apply, merge_upsert).
    """
    groups = exact_dedup_groups(df, text_col=text_col, id_col=id_col).select(
        "fingerprint", "keep_id"
    )
    # eqNullSafe on the fingerprint (ADVICE r6): fingerprint_md5(NULL
    # text) is NULL, and a plain == semi-join would drop EVERY null-text
    # row — the window plan this replaced kept the min-id survivor of
    # the null-fingerprint partition. <=> preserves that: all null-text
    # rows form one group whose min-id row survives. Still an equi-join
    # key (hash-joinable, AQE-splittable).
    return (
        df.withColumn("_fp", fingerprint_md5(text_col))
        .join(
            groups,
            on=[
                F.col("_fp").eqNullSafe(groups["fingerprint"]),
                F.col(id_col) == groups["keep_id"],
            ],
            how="left_semi",
        )
        .drop("_fp")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (verified pairwise similarity)


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two ARRAY<STRING> treated as sets."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_col: str | None = None,
    size_band: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with token-set Jaccard ≥ threshold.

    Quadratic within a bucket: pass ``bucket_col`` (e.g. a source, an LSH
    band, a length band) to confine the self-join — at 100 TB an
    unbucketed pairwise join is never acceptable. ``size_band`` composes a
    token-count band of that width into the bucket (lang × length-band),
    multiplying bucket count by the corpus's length diversity: Σ|bucket|²
    shrinks accordingly, at the cost of missing the rare pair that strides
    a band boundary (candidate-blocking semantics, like any LSH scheme;
    at threshold t a pair's counts differ ≤ (1−t)·n, so wide bands lose
    almost nothing — measured 462/467 pairs at width 4, sf0.01).
    Token sets, not shingles: matches the simple "n-gram Jaccard" oracle
    (use minhash_near_dups for shingle-based detection at scale).
    """
    t = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokens(text_col)).alias("toks"),
        *([F.col(bucket_col).alias("bucket")] if bucket_col else []),
    ).withColumn("n", F.size("toks"))
    if size_band is not None:
        t = t.withColumn("band", F.floor(F.col("n") / F.lit(size_band)))
    # Parallelize the probe: a small single-file input scans as ONE
    # partition, which would run the entire quadratic probe on one core.
    # The row shuffle is tiny (rows, not pairs). Materialized once — both
    # join sides read the cached token sets instead of re-tokenizing.
    t = _materialize(t.repartition(_probe_parallelism(df)))
    a = t.alias("a")
    b = t.alias("b")
    # |A∪B| = |A| + |B| − |A∩B| (inputs are distinct arrays): one array op
    # per surviving pair instead of intersect + union.
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.col("a.n") + F.col("b.n") - inter
    sim = F.round(
        F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)), 6
    )
    # Conjunct order is the optimization: a filter applied AFTER the join
    # would be pushed into the join condition in front of everything else,
    # evaluating the intersection for every candidate pair. Building the
    # condition ourselves puts the lossless size-band prune first —
    # J(A,B) ≥ t ⟹ t·|B| ≤ |A| ≤ |B|/t — so at threshold 0.95 nearly all
    # of the quadratic stream is rejected by two integer compares (the
    # standard length filter from set-similarity joins) and only
    # near-equal-size pairs pay for the intersection.
    cond = (
        (F.col("a.id") < F.col("b.id"))
        & (F.col("a.n").cast("double") >= threshold * F.col("b.n"))
        & (F.col("b.n").cast("double") >= threshold * F.col("a.n"))
    )
    if bucket_col:
        cond = cond & (F.col("a.bucket") == F.col("b.bucket"))
    if size_band is not None:
        cond = (F.col("a.band") == F.col("b.band")) & cond
    cond = cond & (sim >= threshold)
    return a.join(b, cond).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        sim.alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# near-dup cluster collapse (connected components + survivor selection)


def near_dup_components(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    shortcut: bool = True,
) -> DataFrame:
    """(id, component) for every row of ``df``, where component = the
    smallest id transitively reachable through ``pairs`` — the step that
    turns near-dup PAIR detection into corpus dedup (singletons map to
    themselves).

    Min-label propagation with POINTER JUMPING after a grace period:
    every round pushes the current label across edges (both directions)
    and keeps the per-node min; from round 5 on, each round additionally
    shortcuts every label through its own label —
    ``component(u) ← component(component(u))`` — which is sound because
    a label is itself a node id and label values only ever decrease.
    Propagation alone moves a min ONE hop per round (O(diameter) rounds
    — a chain-shaped near-dup cluster of depth d, e.g. drifting
    boilerplate where each revision only matches its neighbors, needs d
    rounds); the jump doubles compressed path length per round, giving
    O(log d) totals, the same bound as GraphX/Pregel CC and the
    MapReduce star-contraction algorithms. The 4-round grace period
    means the common corpus shape (shallow clusters, converged in 2-3
    propagations) pays zero extra joins, while the adversarial chain
    shape stays safe at 100 TB. Propagation's fixpoint is jump-stable,
    so the convergence test (any label decreased this round?) is
    unchanged and rides the same materialized relation as the labels.

    Exhausting ``max_iter`` without converging raises instead of
    silently returning partially-merged components (with ``shortcut``
    the default budget covers clusters of diameter ~2^20).
    """
    # materialize the edge list: ``pairs`` is usually an (expensive)
    # near-dup detection plan, and the propagation loop joins edges once
    # per round — without this the whole detection pipeline re-runs
    # every iteration.
    edges = _materialize(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    # Phantom-endpoint contract (r4 ADVICE): a pair endpoint absent
    # from ``df`` (externally-derived pairs) first enters the label
    # relation as a propagated row whose ``_old`` is NULL. Transitive
    # closure THROUGH such ids already works (they join ``labels`` from
    # the next round on); the two hazards are (a) their first
    # appearance never counted toward ``changed`` — a cluster reachable
    # only through a phantom could be declared converged one round
    # early — and (b) they leaked into the output. Fix (a) by counting
    # NULL-_old rows as changes (zero extra cost: in the normal
    # endpoints ⊆ df case ``_old`` is never NULL, so no extra rounds),
    # and (b) by a final df-id semi-join applied ONLY when a phantom
    # was actually observed — the common case pays nothing.
    labels = df.select(F.col(id_col).alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    labels = labels.persist()
    n_ids = labels.count()

    # r14 driver-local gate (guide §1.2 step 1 + the bpe_train hand-off
    # pattern): when BOTH relations are provably tiny (the edge list is
    # already pinned; two cheap counts), run union-find in-process —
    # identical semantics by construction (component = the smallest df
    # id transitively reachable; phantom endpoints relay closure but
    # never contribute a label, exactly like the propagated rows
    # below). The distributed O(log d) loop below is unchanged for
    # real-scale graphs. Pinned equal by pytest
    # (test_components_driver_equals_distributed). ``shortcut=False``
    # opts OUT (callers pinning plain-propagation semantics — its
    # round-budget RuntimeError contract — get exactly that).
    if (
        shortcut
        and n_ids <= DRIVER_CC_MAX
        and edges.count() <= DRIVER_CC_MAX
    ):
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        ids = [r["id"] for r in labels.collect()]
        labels.unpersist()
        for e in edges.collect():
            # parity with the distributed loop (r15, ADVICE r14): a NULL
            # endpoint never equi-joins a label there, so the edge is
            # inert — treating None as a real node here would merge
            # components the distributed path keeps separate
            if e["src"] is None or e["dst"] is None:
                continue
            ra, rb = find(e["src"]), find(e["dst"])
            if ra != rb:
                parent[ra] = rb
        comp_min: dict = {}
        for i in ids:
            r = find(i)
            if r not in comp_min or i < comp_min[r]:
                comp_min[r] = i
        spark = df.sparkSession
        out_rows = [(i, comp_min[find(i)]) for i in ids]
        id_type = df.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            out_rows, f"{id_col} {id_type}, component {id_type}"
        )

    changed = 0
    phantom_seen = False
    for _round in range(max_iter):
        prop = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"),
            "component",
            F.lit(None).cast(labels.schema["component"].dataType).alias("_old"),
        )
        new = (
            labels.withColumn("_old", F.col("component"))
            .unionByName(prop)
            .groupBy("id")
            # min ignores nulls: _old is each id's previous label (one
            # tagged row per id); propagated rows contribute null
            .agg(F.min("component").alias("component"), F.min("_old").alias("_old"))
        )
        interim = None
        if shortcut and _round >= 4:
            # component(u) ← component(component(u)). Every label value
            # is a node id, so the inner self-join is total; the parent's
            # label is ≤ the child's by min-monotonicity. The first 4
            # rounds stay jump-free: shallow clusters (the common corpus
            # shape — near-dup groups converge in 2-3 propagations)
            # never pay the extra join; a deep chain switches to
            # doubling afterwards, keeping the O(log d) total bound.
            # Persist the propagation aggregate FIRST: the self-join
            # consumes it on both sides, and without this each jump
            # round would execute the edges-join + union + groupBy
            # subtree twice.
            interim = new.persist()
            parent = interim.select(
                F.col("id").alias("_pid"), F.col("component").alias("_pcomp")
            )
            new = (
                interim.join(parent, interim.component == parent._pid)
                .select("id", F.col("_pcomp").alias("component"), "_old")
            )
        # Lineage control: an iterative self-referencing plan grows its
        # TREE 2-3× per round — by ~10 rounds the logical plan alone
        # OOMs the driver (plan stringification is O(tree)). persist()
        # caches data but not lineage, so truncate with a localCheckpoint
        # every few rounds; between checkpoints persist keeps the round
        # cheap (one job, no eager block write). The standard pattern
        # for iterative graph algorithms on Spark.
        if (_round + 1) % 4 == 0:
            new = new.localCheckpoint(eager=False)
        else:
            new = new.persist()
        counts = new.agg(
            F.count(F.when(F.col("component") < F.col("_old"), 1)).alias("dec"),
            F.count(F.when(F.col("_old").isNull(), 1)).alias("fresh"),
        ).collect()[0]
        changed = counts["dec"] + counts["fresh"]
        phantom_seen = phantom_seen or counts["fresh"] > 0
        labels.unpersist()
        if interim is not None:
            interim.unpersist()
        labels = new.drop("_old")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"near_dup_components did not converge in {max_iter} rounds "
            f"({changed} labels still decreasing) — raise max_iter"
        )
    if phantom_seen:
        df_ids = df.select(F.col(id_col).alias("id")).distinct()
        labels = labels.join(df_ids, "id", "left_semi")
    return labels.select(F.col("id").alias(id_col), "component")


def collapse_near_dups(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The deduplicated table: one survivor (min id) per near-dup
    component, singletons kept — ``df`` minus every non-representative
    member of each cluster."""
    comp = near_dup_components(df, pairs, id_col=id_col, id_a=id_a, id_b=id_b)
    survivors = comp.filter(F.col(id_col) == F.col("component")).select(id_col)
    return df.join(survivors, id_col)


# ---------------------------------------------------------------------------
# MinHash + LSH banding


def minhash_signatures(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sh, n, sig) — the MinHash signature relation: word-shingle
    arrays, their count, and the ``num_hashes``-wide signature. This IS
    the persistable dedup index of a 100 TB pipeline: signatures are
    computed once per document at ingest (one md5 per shingle + cheap
    mixes — the expensive pass over text) and stored; dedup runs join
    signatures, never re-derive them from the corpus.

    Repartitions BEFORE the shingle/signature projection: a single-file
    input would otherwise compute every signature on one core."""
    from acorn_hybrid_vector_search_spark.functions.text import (
        minhash_from_shingles,
    )

    base = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
        .repartition(_probe_parallelism(df))
        .select("id", shingles("_txt", shingle_n).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    return base.select(
        "id",
        "sh",
        F.size("sh").alias("n"),
        minhash_from_shingles(F.col("sh"), num_hashes).alias("sig"),
    )


def minhash_write(
    df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> None:
    """Persist the signature store (the nsw_write pattern for dedup):
    ingest pays the text scan once; every later batch probes the
    parquet store (``minhash_probe_pairs``) instead of re-shingling
    the corpus."""
    from acorn_hybrid_vector_search_spark.operators._cache import invalidate

    minhash_signatures(
        df,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        shingle_n=shingle_n,
    ).write.mode("overwrite").parquet(path)
    # a rewrite must not be served stale pins or a stale memoized read
    # (semantic dedup cannot see file changes — the r7 stale-pin class)
    invalidate()


def minhash_read(spark, path: str) -> DataFrame:
    """Load a persisted signature store (session-memoized read — the
    per-call footer/schema job was a fixed cost on every probe;
    minhash_write's invalidate() keeps rewrites visible)."""
    from acorn_hybrid_vector_search_spark.operators._cache import read_parquet

    return read_parquet(spark, path)


def minhash_probe_pairs(
    new_sigs: DataFrame,
    store_sigs: DataFrame,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    verify_threshold: float | None = 0.7,
    bucket_cap: int | None = None,
) -> DataFrame:
    """INCREMENTAL near-dup detection: pairs between a NEW batch's
    signatures and the persisted store — the continuous-ingestion shape
    (every production dedup pipeline is incremental: comparing each new
    crawl snapshot against the full corpus from scratch is quadratic in
    snapshots).

    Plan: band-explode BOTH relations, equi-join on (band index, band
    key) — cost Σ|new-bucket|·|store-bucket|, never |new|·|store| — with
    first-agreeing-band emission (no dropDuplicates shuffle) and the
    same size-band prune + exact shingle-Jaccard verification as the
    self-join form. The store side never re-derives anything from text.
    Returns (id_new, id_store, sig_agreement[, jaccard]).

    ``bucket_cap`` (r7): the probe has the same Σ|bucket|² emission
    shape as the self-join — a boilerplate template present in BOTH the
    store and every new crawl makes one bucket's cross-product
    quadratic per snapshot — so each SIDE's bucket membership is capped
    independently with the same deterministic draw as
    ``minhash_near_dups`` (per-pair output ≤ cap², hot buckets on the
    g×g grid, same recall trade, same no-silent-caps stats available
    via the self-join's ``cap_stats``)."""
    rows_per_band = num_hashes // bands

    def banded(rel: DataFrame) -> DataFrame:
        band_keys = F.array(
            *[
                F.concat_ws(
                    "|",
                    *[
                        F.element_at("sig", b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                )
                for b in range(bands)
            ]
        )
        return rel.select(
            "id", "sh", "n", "sig", F.posexplode(band_keys).alias("bi", "band_key")
        )

    ban_new, ban_store = banded(new_sigs), banded(store_sigs)
    hot_new = hot_store = None
    # joint probe (r8 bypass): the grid route is needed iff EITHER side
    # has an over-cap bucket — when neither does, skip both sides'
    # machinery (a one-side-only binding still caps/flags both, since
    # joint hotness must route cold×hot pairs through the grid too)
    if bucket_cap is not None and (
        _cap_binds(ban_new, ["bi", "band_key"], bucket_cap)
        or _cap_binds(ban_store, ["bi", "band_key"], bucket_cap)
    ):
        fn = _materialize(
            _cap_bucket_members(ban_new, ["bi", "band_key"], bucket_cap, flag_col="_hot")
        )
        fs = _materialize(
            _cap_bucket_members(ban_store, ["bi", "band_key"], bucket_cap, flag_col="_hot")
        )
        ban_new, hot_new, ban_store, hot_store = _joint_hot_split(
            fn, fs, ["bi", "band_key"]
        )
    a = ban_new.alias("a")
    b = ban_store.alias("b")

    def band_eq(j: int) -> Column:
        eq = F.lit(True)
        for r in range(rows_per_band):
            k = j * rows_per_band + r + 1
            eq = eq & (
                F.element_at(F.col("a.sig"), k) == F.element_at(F.col("b.sig"), k)
            )
        return eq

    earlier_agrees = F.lit(False)
    for j in range(bands - 1):
        earlier_agrees = earlier_agrees | ((F.col("a.bi") > j) & band_eq(j))

    cond = (
        (F.col("a.bi") == F.col("b.bi"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.id") != F.col("b.id"))
        & ~earlier_agrees
    )
    verify_cols = []
    if verify_threshold is not None:
        t = float(verify_threshold)
        inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
        union = F.col("a.n") + F.col("b.n") - inter
        jac = F.round(
            F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)), 6
        )
        cond = (
            cond
            & (F.col("a.n").cast("double") >= t * F.col("b.n"))
            & (F.col("b.n").cast("double") >= t * F.col("a.n"))
            & (jac >= t)
        )
        verify_cols = [jac.alias("jaccard")]

    agree = F.size(
        F.filter(
            F.zip_with(
                F.col("a.sig"), F.col("b.sig"), lambda x, y: (x == y).cast("int")
            ),
            lambda v: v == 1,
        )
    )
    out = [
        F.col("a.id").alias("id_new"),
        F.col("b.id").alias("id_store"),
        F.round(agree.cast("double") / num_hashes, 6).alias("sig_agreement"),
        *verify_cols,
    ]
    pairs = a.join(b, cond).select(*out)
    if hot_new is not None:
        ha = _grid_side(hot_new, "a", ["bi", "band_key"]).alias("a")
        hb = _grid_side(hot_store, "b", ["bi", "band_key"]).alias("b")
        grid_cond = (
            cond
            & (F.col("a._ca") == F.col("b._ca"))
            & (F.col("a._cb") == F.col("b._cb"))
        )
        pairs = pairs.unionByName(ha.join(hb, grid_cond).select(*out))
    return pairs


def minhash_near_dups(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    verify_threshold: float | None = 0.7,
    bucket_cap: int | None = None,
    cap_stats: bool = False,
) -> DataFrame:
    """Near-duplicate pairs via MinHash signatures + LSH banding.

    Plan shape: signature projection (map-only) → explode to ``bands``
    band-key rows → shuffle on band key → per-bucket pair generation →
    optional exact shingle-Jaccard verification of candidates only.
    Returns (id_a, id_b, sig_agreement[, jaccard]).

    ``bucket_cap`` bounds pair EMISSION per (band, band-key) bucket to
    cap·(cap−1)/2 via deterministic member sampling
    (``_cap_bucket_members`` — VERDICT r6 ask #1: a boilerplate
    template shared by 10⁶ near-identical docs survives the exact rung
    and makes one bucket's output quadratic by construction).
    Disclosed recall trade: (a) dropped members lose their pairs in
    that bucket; (b) a pair whose FIRST signature-agreeing band's
    bucket dropped either member is not re-emitted from later bands —
    re-checking kept-membership per band would reintroduce the very
    emission the cap bounds. ``cap_stats=True`` returns the
    no-silent-caps disclosure instead of pairs: one row per capped
    bucket (bucket, bucket_n, kept_n, dropped_n, pairs_uncapped,
    pairs_capped).
    """
    rows_per_band = num_hashes // bands
    # materialized once (see _materialize): the shingle arrays + signature
    # feed BOTH sides of the banded self-join
    sig = _materialize(
        minhash_signatures(
            df,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            shingle_n=shingle_n,
        )
    )

    band_keys = F.array(
        *[
            F.concat_ws(
                "|",
                *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)],
            )
            for b in range(bands)
        ]
    )
    # payloads ride along through the band explode: `bands`× shuffle volume
    # buys a single self-join with NO payload re-join and NO signature
    # recompute (3 scans → 1). For very large corpora where shuffle bytes
    # dominate, persist `sig` as a table and band over ids instead.
    banded = sig.select(
        "id", "sh", "n", "sig", F.posexplode(band_keys).alias("bi", "band_key")
    )
    if cap_stats:
        if bucket_cap is None:
            raise ValueError("cap_stats=True requires bucket_cap")
        return _bucket_cap_stats(banded, ["bi", "band_key"], bucket_cap)
    hot = None
    if bucket_cap is not None and _cap_binds(banded, ["bi", "band_key"], bucket_cap):
        # materialized: the flagged relation feeds BOTH the cold and hot
        # branches — without pinning, the whole cap pipeline (count
        # join-back + salted window + bounded sort-agg + semi-join)
        # recomputes per consumer (measured 2-4x the query cost)
        flagged = _materialize(
            _cap_bucket_members(banded, ["bi", "band_key"], bucket_cap, flag_col="_hot")
        )
        banded = flagged.where(~F.col("_hot")).drop("_hot")
        hot = flagged.where(F.col("_hot")).drop("_hot")

    a, b = banded.alias("a"), banded.alias("b")

    # first-agreeing-band emission (see simhash_near_dups): a pair that
    # collides in several bands is emitted only from the lowest one, so no
    # dropDuplicates shuffle is needed afterwards.
    def band_eq(j: int) -> Column:
        eq = F.lit(True)
        for r in range(rows_per_band):
            k = j * rows_per_band + r + 1
            eq = eq & (
                F.element_at(F.col("a.sig"), k) == F.element_at(F.col("b.sig"), k)
            )
        return eq

    earlier_agrees = F.lit(False)
    for j in range(bands - 1):
        earlier_agrees = earlier_agrees | ((F.col("a.bi") > j) & band_eq(j))

    cond = (
        (F.col("a.bi") == F.col("b.bi"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.id") < F.col("b.id"))
        & ~earlier_agrees
    )
    verify_cols = []
    if verify_threshold is not None:
        # size-band prune, then exact shingle Jaccard — both inside the
        # join condition, cheap conjuncts first (see ngram_jaccard_pairs)
        t = float(verify_threshold)
        inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
        union = F.col("a.n") + F.col("b.n") - inter
        jac = F.round(
            F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)), 6
        )
        cond = (
            cond
            & (F.col("a.n").cast("double") >= t * F.col("b.n"))
            & (F.col("b.n").cast("double") >= t * F.col("a.n"))
            & (jac >= t)
        )
        verify_cols = [jac.alias("jaccard")]

    agree = F.size(
        F.filter(
            F.zip_with(F.col("a.sig"), F.col("b.sig"), lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    out = [
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.round(agree.cast("double") / num_hashes, 6).alias("sig_agreement"),
        *verify_cols,
    ]
    pairs = a.join(b, cond).select(*out)
    if hot is not None:
        # over-cap buckets pair-generate on the g×g cell grid: same
        # pair set (cell uniqueness), per-task work (cap/g)² not cap²
        ha = _grid_side(hot, "a", ["bi", "band_key"]).alias("a")
        hb = _grid_side(hot, "b", ["bi", "band_key"]).alias("b")
        grid_cond = (
            cond
            & (F.col("a._ca") == F.col("b._ca"))
            & (F.col("a._cb") == F.col("b._cb"))
        )
        pairs = pairs.unionByName(ha.join(hb, grid_cond).select(*out))
    return pairs


# ---------------------------------------------------------------------------
# SimHash


def simhash_near_dups(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    bits: int = 60,
    chunks: int = 5,
    bucket_cap: int | None = None,
    cap_stats: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: split the ``bits``-bit hash into ``chunks`` chunks;
    any pair within distance < chunks must agree on ≥1 chunk, so the
    self-join runs per chunk-value bucket, then verifies true hamming
    distance. (With max_hamming ≥ chunks this is a recall-biased heuristic
    blocking scheme — standard practice; full recall needs more chunks.)

    ``bucket_cap`` / ``cap_stats``: per-(chunk-index, chunk-value)
    emission bound + its disclosure — same contract and recall trade as
    ``minhash_near_dups`` (see there; VERDICT r6 ask #1).
    """
    chunk_bits = bits // chunks
    mask = (1 << chunk_bits) - 1
    # materialized once: the pandas-UDF fingerprint pass would otherwise
    # run on each join side (measured 2x the query cost at sf0.1)
    h = _materialize(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
        .repartition(_probe_parallelism(df))
        .select("id", simhash64("_txt", bits).alias("sh"))
    )
    chunk_vals = F.array(
        *[
            F.shiftrightunsigned(F.col("sh"), i * chunk_bits).bitwiseAND(F.lit(mask))
            for i in range(chunks)
        ]
    )
    banded = h.select("id", "sh", F.posexplode(chunk_vals).alias("ci", "ck"))
    if cap_stats:
        if bucket_cap is None:
            raise ValueError("cap_stats=True requires bucket_cap")
        return _bucket_cap_stats(banded, ["ci", "ck"], bucket_cap)
    hot = None
    if bucket_cap is not None and _cap_binds(banded, ["ci", "ck"], bucket_cap):
        flagged = _materialize(
            _cap_bucket_members(banded, ["ci", "ck"], bucket_cap, flag_col="_hot")
        )
        banded = flagged.where(~F.col("_hot")).drop("_hot")
        hot = flagged.where(F.col("_hot")).drop("_hot")
    a, b = banded.alias("a"), banded.alias("b")
    # hamming verify goes INTO the join condition (cheap: one xor+popcount
    # on two longs) so only true pairs survive the join.
    hamming = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))

    # first-agreeing-chunk emission: a pair agreeing on several chunks
    # would surface once per chunk; requiring "no earlier chunk agrees"
    # makes exactly ONE (ci, ck) bucket emit it — which deletes the
    # dropDuplicates shuffle stage entirely (dedupe becomes two shifted
    # compares per candidate, evaluated inside the join).
    def chunk_eq(j: int) -> Column:
        return (
            F.shiftrightunsigned(F.col("a.sh"), j * chunk_bits).bitwiseAND(F.lit(mask))
            == F.shiftrightunsigned(F.col("b.sh"), j * chunk_bits).bitwiseAND(F.lit(mask))
        )

    earlier_agrees = F.lit(False)
    for j in range(chunks - 1):
        earlier_agrees = earlier_agrees | ((F.col("a.ci") > j) & chunk_eq(j))

    cond = (
        (F.col("a.ci") == F.col("b.ci"))
        & (F.col("a.ck") == F.col("b.ck"))
        & (F.col("a.id") < F.col("b.id"))
        & (hamming <= max_hamming)
        & ~earlier_agrees
    )
    out = [
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        hamming.alias("hamming"),
    ]
    pairs = a.join(b, cond).select(*out)
    if hot is not None:
        ha = _grid_side(hot, "a", ["ci", "ck"]).alias("a")
        hb = _grid_side(hot, "b", ["ci", "ck"]).alias("b")
        grid_cond = (
            cond
            & (F.col("a._ca") == F.col("b._ca"))
            & (F.col("a._cb") == F.col("b._cb"))
        )
        pairs = pairs.unionByName(ha.join(hb, grid_cond).select(*out))
    return pairs


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def embedding_near_dups(
    df: DataFrame,
    threshold: float,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_col: str | None = None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Pairs of rows whose embeddings have cosine similarity ≥ threshold.
    Pass ``bucket_col`` (label, LSH bucket, …) to confine the quadratic
    join; see operators/similarity.py for LSH bucket generation.

    ``bucket_cap`` (r7, requires ``bucket_col``): the same emission
    bound as the token-sketch rungs — the r6 adversary's embedding form
    is a template cluster whose near-identical VECTORS all land in one
    LSH bucket, so per-bucket membership is capped with the
    deterministic draw and over-cap buckets pair-generate on the g×g
    grid (the router's rule 6 applies to EVERY pair-emitting rung,
    including this one)."""
    from acorn_hybrid_vector_search_spark.functions.distance import dot_product, l2_norm

    if bucket_cap is not None and not bucket_col:
        raise ValueError("bucket_cap requires bucket_col (the capped unit)")
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if bucket_col:
        cols.append(F.col(bucket_col).alias("bucket"))
    # Factor the norms out of the pair loop: ‖v‖ is computed once per ROW
    # (O(N)) instead of once per PAIR (O(N²)); the per-pair work is a single
    # dot product. dot/(na·nb) is the exact arithmetic cosine_similarity
    # uses, so results (and the DuckDB oracle hash) are bit-identical.
    # no _materialize here: the per-row projection is just a norm (cheap);
    # recomputing it on each join side costs less than an eager cache pass
    t = df.select(*cols).withColumn("nv", l2_norm(F.col("v")))
    t = t.repartition(_probe_parallelism(df))
    hot = None
    if bucket_cap is not None and _cap_binds(t, ["bucket"], bucket_cap):
        flagged = _materialize(
            _cap_bucket_members(t, ["bucket"], bucket_cap, flag_col="_hot")
        )
        t = flagged.where(~F.col("_hot")).drop("_hot")
        hot = flagged.where(F.col("_hot")).drop("_hot")
    a, b = t.alias("a"), t.alias("b")
    denom = F.col("a.nv") * F.col("b.nv")
    sim = F.round(
        F.when(denom != 0.0, dot_product(F.col("a.v"), F.col("b.v")) / denom), 6
    )
    # Threshold goes LAST in the join condition (see ngram_jaccard_pairs):
    # a post-join filter would be pushed in FRONT of the cheap conjuncts
    # and the dot product would run for every candidate pair twice.
    cond = F.col("a.id") < F.col("b.id")
    if bucket_col:
        cond = cond & (F.col("a.bucket") == F.col("b.bucket"))
    cond = cond & (sim >= threshold)
    out = [
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        sim.alias("cosine"),
    ]
    pairs = a.join(b, cond).select(*out)
    if hot is not None:
        ha = _grid_side(hot, "a", ["bucket"]).alias("a")
        hb = _grid_side(hot, "b", ["bucket"]).alias("b")
        grid_cond = (
            cond
            & (F.col("a._ca") == F.col("b._ca"))
            & (F.col("a._cb") == F.col("b._cb"))
        )
        pairs = pairs.unionByName(ha.join(hb, grid_cond).select(*out))
    return pairs


# ---------------------------------------------------------------------------
# winnowing (rolling-hash document fingerprints — MOSS)


def winnow_fingerprint_table(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    window: int = 4,
) -> DataFrame:
    """(id, fps, n_fp) — the winnowing-fingerprint relation: the
    persistable passage-dedup index (the ``minhash_signatures`` twin).
    Fingerprints are the expensive text pass; computed once per doc at
    ingest and stored, every later batch probes the store instead of
    re-fingerprinting the corpus. Repartitions BEFORE the projection:
    a single-file input would otherwise fold every md5 on one core."""
    return (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
        .repartition(_probe_parallelism(df))
        .select(
            "id", winnow_fingerprints("_txt", k=k, window=window).alias("fps")
        )
        .withColumn("n_fp", F.size("fps"))
        .where(F.col("n_fp") > 0)
    )


def winnow_write(
    df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    window: int = 4,
) -> None:
    """Persist the winnow fingerprint store (VERDICT r6 ask #5 — the
    minhash_write pattern applied to the passage-dedup rung): ingest
    pays the fingerprint scan once; later batches probe the parquet
    store (``winnow_probe_pairs``) instead of re-fingerprinting.
    Invalidates the pinned-materialization cache (see minhash_write)."""
    from acorn_hybrid_vector_search_spark.operators._cache import invalidate

    invalidate()
    winnow_fingerprint_table(
        df, text_col=text_col, id_col=id_col, k=k, window=window
    ).write.mode("overwrite").parquet(path)


def winnow_read(spark, path: str) -> DataFrame:
    """Load a persisted winnow fingerprint store (session-memoized read;
    winnow_write's invalidate() keeps rewrites visible)."""
    from acorn_hybrid_vector_search_spark.operators._cache import read_parquet

    return read_parquet(spark, path)


def winnow_probe_pairs(
    new_fps: DataFrame,
    store_fps: DataFrame,
    *,
    min_shared: int = 2,
    bucket_cap: int | None = None,
) -> DataFrame:
    """INCREMENTAL passage-dedup: (id_new, id_store, shared_fps,
    overlap) pairs between a NEW batch's fingerprint relation and the
    persisted store — the continuous-ingestion shape for the winnow
    rung (the router's 'passage' granularity had no ingestion path
    before r7; its minhash twin is ``minhash_probe_pairs``).

    Plan: explode both relations to (fp, id), equi-join on the
    fingerprint — cost Σ|new-bucket|·|store-bucket|, never
    |new|·|store| — then a partial-agg groupBy(pair) counts shared
    fingerprints. ``overlap`` = shared / min(|fps_new|, |fps_store|),
    the same containment score as the self-join form, so probe results
    are a SUBSET of ``winnow_near_dups`` over the union (pytest-pinned
    and oracle-replayed). ``id_new != id_store`` guards re-ingested
    ids.

    ``bucket_cap`` (r7): same cross-relation emission bound as
    ``minhash_probe_pairs`` — each side's per-fingerprint membership is
    capped independently (same draw as the self-join), buckets hot on
    EITHER side route through the g×g grid; ``shared_fps`` counts only
    fingerprints where both members were kept (disclosed undercount
    near the cap), the overlap denominator stays pre-cap."""
    ex_new = new_fps.select("id", "n_fp", F.explode("fps").alias("fp"))
    ex_store = store_fps.select("id", "n_fp", F.explode("fps").alias("fp"))
    hot_new = hot_store = None
    # joint probe (r8 bypass) — see minhash_probe_pairs
    if bucket_cap is not None and (
        _cap_binds(ex_new, ["fp"], bucket_cap)
        or _cap_binds(ex_store, ["fp"], bucket_cap)
    ):
        fn = _materialize(
            _cap_bucket_members(ex_new, ["fp"], bucket_cap, flag_col="_hot")
        )
        fs = _materialize(
            _cap_bucket_members(ex_store, ["fp"], bucket_cap, flag_col="_hot")
        )
        ex_new, hot_new, ex_store, hot_store = _joint_hot_split(fn, fs, ["fp"])
    a, b = ex_new.alias("a"), ex_store.alias("b")
    cond = (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") != F.col("b.id"))
    out = [
        F.col("a.id").alias("id_new"),
        F.col("b.id").alias("id_store"),
        F.col("a.n_fp").alias("_na"),
        F.col("b.n_fp").alias("_nb"),
    ]
    matched = a.join(b, cond).select(*out)
    if hot_new is not None:
        ha = _grid_side(hot_new, "a", ["fp"]).alias("a")
        hb = _grid_side(hot_store, "b", ["fp"]).alias("b")
        grid_cond = (
            cond
            & (F.col("a._ca") == F.col("b._ca"))
            & (F.col("a._cb") == F.col("b._cb"))
        )
        matched = matched.unionByName(ha.join(hb, grid_cond).select(*out))
    return (
        matched.groupBy("id_new", "id_store")
        .agg(
            F.count(F.lit(1)).alias("shared_fps"),
            F.first("_na").alias("_na"),
            F.first("_nb").alias("_nb"),
        )
        .where(F.col("shared_fps") >= min_shared)
        .select(
            "id_new",
            "id_store",
            "shared_fps",
            F.round(
                F.col("shared_fps").cast("double") / F.least("_na", "_nb"), 6
            ).alias("overlap"),
        )
    )


def winnow_near_dups(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    window: int = 4,
    min_shared: int = 2,
    bucket_cap: int | None = None,
    cap_stats: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by winnowing-fingerprint overlap
    (functions.text.winnow_fingerprints — Schleimer/Wilkerson/Aiken
    SIGMOD 2003): documents sharing at least ``min_shared`` selected
    rolling-hash minima. Detects long shared PASSAGES (any common run of
    ``window + k - 1`` tokens guarantees a shared fingerprint), the
    copy-detection complement to MinHash's whole-document Jaccard.

    Returns (id_a < id_b, shared_fps, overlap) where ``overlap`` is
    shared_fps / min(|fps_a|, |fps_b|) — the containment-style score, so
    a short document wholly embedded in a long one still scores ~1.0.

    Plan shape: one fingerprint projection per document (map-only,
    all-JVM), materialized ONCE for both sides; explode to (fp, id)
    rows; equi-self-join on the fingerprint (each fingerprint is a
    bucket — cost Σ|bucket|², never N², and a fingerprint shared by a
    boilerplate passage across many docs is an AQE-splittable join key,
    not a window partition); partial-agg groupBy(pair) counts the
    shared fingerprints (map-side combine).

    ``bucket_cap`` / ``cap_stats``: per-fingerprint emission bound +
    its disclosure (VERDICT r6 ask #1 — same contract as
    ``minhash_near_dups``). Capping drops (fp, id) membership rows, so
    a surviving pair's ``shared_fps`` counts only fingerprints where
    BOTH members were kept (may undercount near the cap, disclosed);
    ``overlap``'s denominator stays the TRUE min fingerprint count
    (n_fp is computed before the cap), so scores never inflate.
    """
    fps = _materialize(
        winnow_fingerprint_table(
            df, text_col=text_col, id_col=id_col, k=k, window=window
        )
    )
    ex = fps.select("id", "n_fp", F.explode("fps").alias("fp"))
    if cap_stats:
        if bucket_cap is None:
            raise ValueError("cap_stats=True requires bucket_cap")
        return _bucket_cap_stats(ex, ["fp"], bucket_cap)
    hot = None
    if bucket_cap is not None and _cap_binds(ex, ["fp"], bucket_cap):
        flagged = _materialize(
            _cap_bucket_members(ex, ["fp"], bucket_cap, flag_col="_hot")
        )
        ex = flagged.where(~F.col("_hot")).drop("_hot")
        hot = flagged.where(F.col("_hot")).drop("_hot")
    a, b = ex.alias("a"), ex.alias("b")
    cond = (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id"))
    out = [
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.n_fp").alias("_na"),
        F.col("b.n_fp").alias("_nb"),
    ]
    matched = a.join(b, cond).select(*out)
    if hot is not None:
        ha = _grid_side(hot, "a", ["fp"]).alias("a")
        hb = _grid_side(hot, "b", ["fp"]).alias("b")
        grid_cond = (
            cond
            & (F.col("a._ca") == F.col("b._ca"))
            & (F.col("a._cb") == F.col("b._cb"))
        )
        matched = matched.unionByName(ha.join(hb, grid_cond).select(*out))
    pairs = (
        matched.groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("shared_fps"),
            F.first("_na").alias("_na"),
            F.first("_nb").alias("_nb"),
        )
        .where(F.col("shared_fps") >= min_shared)
    )
    return pairs.select(
        "id_a",
        "id_b",
        "shared_fps",
        F.round(
            F.col("shared_fps").cast("double") / F.least("_na", "_nb"), 6
        ).alias("overlap"),
    )
