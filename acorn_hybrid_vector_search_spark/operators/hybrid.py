"""K2/K3/K4/K5 — the reference's three hybrid-search strategies, Spark-first.

The single logical query shape (SURVEY.md §2.2):

    SELECT id, dist(embedding, :q) AS score, ...
    FROM   collection
    WHERE  <metadata conjunction>
    ORDER  BY score ASC LIMIT :k

The reference hand-implements three physical strategies; here each is a
DataFrame plan and the *exact* pre-filter is the default (Catalyst already
gives it the optimizations the other two strategies approximate):

- ``prefilter_search`` (K2, /root/reference/pre-filter.py:183-229): filter
  first, then exact top-k on survivors. Predicate + column pruning push to
  the scan; top-k is TakeOrderedAndProject. Exact, and at Spark scale
  usually also fastest — the filter shrinks the expensive distance work.
- ``postfilter_search`` (K3, /root/reference/acorn.py:52-144): top
  ``large_k`` by distance FIRST, then apply the predicate, truncate to k.
  Kept because its semantics differ (it can return < k rows when the
  filter is selective — the reference's accuracy-collapse case) and the
  oversampling knob is the research surface.
- ``acorn_search`` (K4, /root/reference/acorn.py:149-238): the reference's
  iterative budgeted-HNSW traversal. Its traversal-time mechanics
  (max_visits budget, blocked set, livelock escape) are pointwise engine
  internals with no set-oriented analog; the *contract* — "exact-or-better
  results for (filter, top-k) with bounded work" — is delivered by an
  escalating-oversample post-filter loop that falls back to the exact
  pre-filter plan, which dominates it in a batch engine (SURVEY.md §4).
- ``attribute_partitioned_search`` (K5,
  /root/reference/acorn_attribute_specific.py:44-77): route queries
  constrained on a sparse attribute to a materialized subset. With
  Parquet + partitioned materializations this is partition pruning.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.functions.predicates import (
    AttributeAccessor,
    build_predicate,
)
from acorn_hybrid_vector_search_spark.operators.knn import knn_exact

Predicates = Mapping[str, Sequence[Any]]


def _resolve_predicate(
    df: DataFrame,
    predicates: Predicates | Column | None,
    accessors: Mapping[str, AttributeAccessor] | None,
) -> Column:
    if predicates is None:
        return F.lit(True)
    if isinstance(predicates, Column):
        return predicates
    if accessors is None:
        from acorn_hybrid_vector_search_spark.functions.predicates import flat_accessors

        accessors = flat_accessors(df)
    return build_predicate(predicates, accessors)


def prefilter_search(
    df: DataFrame,
    query_vec: Column | Sequence[float],
    predicates: Predicates | Column | None,
    k: int,
    *,
    accessors: Mapping[str, AttributeAccessor] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dist_col: str = "dist",
) -> DataFrame:
    """K2: exact hybrid search — the reference's ground-truth strategy."""
    cond = _resolve_predicate(df, predicates, accessors)
    return knn_exact(
        df.filter(cond), query_vec, k, vec_col=vec_col, id_col=id_col, dist_col=dist_col
    )


def postfilter_search(
    df: DataFrame,
    query_vec: Column | Sequence[float],
    predicates: Predicates | Column | None,
    k: int,
    *,
    large_k: int = 50,
    accessors: Mapping[str, AttributeAccessor] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dist_col: str = "dist",
) -> DataFrame:
    """K3: vector-first — top-``large_k`` candidates, then the predicate.

    Mirrors /root/reference/acorn.py:52-144 (ef=50, large_k=50 defaults)
    with an exact candidate stage instead of HNSW: results are therefore a
    superset-in-quality of the reference's (same semantics, no ANN miss).
    May legitimately return fewer than k rows — that IS the post-filter
    failure mode the reference studies.
    """
    cand = knn_exact(df, query_vec, large_k, vec_col=vec_col, id_col=id_col, dist_col=dist_col)
    cond = _resolve_predicate(cand, predicates, accessors)
    return cand.filter(cond).orderBy(F.col(dist_col).asc(), F.col(id_col).asc()).limit(k)


def acorn_search(
    df: DataFrame,
    query_vec: Column | Sequence[float],
    predicates: Predicates | Column | None,
    k: int,
    *,
    initial_oversample: int = 4,
    max_rounds: int = 3,
    accessors: Mapping[str, AttributeAccessor] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dist_col: str = "dist",
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """K4: ACORN-equivalent hybrid search with bounded escalation.

    The reference escalates an HNSW visit budget round-by-round, pruning
    predicate-failing nodes (/root/reference/acorn.py:149-238). The batch
    equivalent: try post-filter with an escalating oversample factor
    (4·k, 16·k, 64·k, … — mirroring the visit-budget growth), and if the
    filtered candidate set still can't fill k, run the exact pre-filter
    plan. Each round is lazily planned; rounds after the first only
    execute when the previous round under-filled, so the common case costs
    one top-``4k`` scan — and every round is a TakeOrderedAndProject, never
    a full sort.

    Returns exactly the pre-filter answer whenever that answer has ≥ k
    rows reachable — i.e. recall 1.0 against the reference's oracle
    strategy, the property ACORN approximates.

    ONE-PASS PLAN: all rounds share one scan. The largest round's
    candidate set (top ``initial_oversample·4^(max_rounds−1)·k`` rows —
    a TakeOrderedAndProject, never a global sort) is computed once with a
    per-row predicate verdict, and the bounded result (≤ max_large_k rows,
    a query-size constant independent of table size) is collected; round
    selection — "smallest round whose candidate prefix holds ≥ k passing
    rows" — is then driver-side arithmetic on rows already in hand, so no
    escalation round ever re-scans, and the returned DataFrame is a local
    relation the consumer can't accidentally recompute. Only when even
    the largest round under-fills does the exact pre-filter plan run
    (its scan is the one the escalation was trying to avoid).

    ``payload_cols``: columns the caller will actually keep (must include
    every column the predicate reads). Default is all of ``df``'s columns
    — but the candidate collect then ships max_large_k full rows INCLUDING
    the vectors; at 2048-dim that is ~5 MB of floats the caller usually
    drops. Passing the projection keeps the collect to a few KB.
    """
    cond = _resolve_predicate(df, predicates, accessors)
    if payload_cols is None:
        proj, drop_vec = df, False
    else:
        keep = list(dict.fromkeys([id_col, *payload_cols]))
        drop_vec = vec_col not in keep
        proj = df.select(*dict.fromkeys([*keep, vec_col]))
    max_large_k = initial_oversample * (4 ** (max_rounds - 1)) * k
    cand = knn_exact(
        proj, query_vec, max_large_k, vec_col=vec_col, id_col=id_col, dist_col=dist_col
    ).withColumn("_passes", cond)
    if payload_cols is not None and drop_vec:
        cand = cand.drop(vec_col)
    rows = sorted(cand.collect(), key=lambda r: (r[dist_col], r[id_col]))

    for round_i in range(max_rounds):
        large_k = initial_oversample * (4**round_i) * k
        hits = [r for r in rows[:large_k] if r["_passes"]]
        if len(hits) >= k:
            out = df.sparkSession.createDataFrame(hits[:k], schema=cand.schema)
            return out.drop("_passes")
    return prefilter_search(
        df, query_vec, cond, k, vec_col=vec_col, id_col=id_col, dist_col=dist_col
    )


def attribute_presence_cond(
    attrs: Sequence[str],
    accessors: Mapping[str, AttributeAccessor],
) -> Column:
    """The exact condition K5 routing assumes a subset was materialized
    with: the conjunction of the attributes' presence expressions — no
    more, no less. Build subsets with this (not an arbitrary filter)."""
    cond = F.lit(True)
    for a in attrs:
        cond = cond & accessors[a].present
    return cond


def materialize_attribute_subset(
    df: DataFrame,
    present_cond: Column,
    path: str,
    *,
    partition_cols: Sequence[str] = (),
) -> None:
    """K5 build side: persist the rows possessing a sparse attribute as
    their own Parquet table (the reference builds a second HNSW graph over
    the subset, /root/reference/acorn_attribute_specific.py:44-65). At
    scale this is the materialization partition pruning routes into.

    CONTRACT: ``present_cond`` must be exactly the attribute-presence
    condition for the attributes the subset will be routed on — i.e.
    ``attribute_presence_cond(attrs, accessors)``. Routing
    (``attribute_partitioned_search``) sends ANY query constraining one of
    ``subset_attrs`` to the subset; because every predicate carries a
    strict missing-attribute-rejection conjunct (functions/predicates.py),
    that is lossless iff the subset contains every row where the attribute
    is present. A narrower materialization filter silently loses matches."""
    w = df.filter(present_cond).write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def attribute_partitioned_search(
    df: DataFrame,
    subset_df: DataFrame,
    subset_attrs: frozenset[str] | set[str],
    query_vec: Column | Sequence[float],
    predicates: Predicates | None,
    k: int,
    *,
    accessors: Mapping[str, AttributeAccessor] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """K5 query side: route to the attribute subset when the query
    constrains one of its attributes; otherwise search the full table.
    (Routing policy itself lives in plans/router.py.)

    Soundness precondition: ``subset_df`` holds EVERY row where the
    ``subset_attrs`` are present (see materialize_attribute_subset's
    contract) — routing relies on the predicate's missing-attribute
    rejection to discard subset-external rows, so a subset built with a
    narrower filter would silently drop matches."""
    constrained = set(predicates or ())
    target = subset_df if constrained & set(subset_attrs) else df
    return prefilter_search(
        target, query_vec, predicates, k, accessors=accessors, vec_col=vec_col, id_col=id_col
    )
