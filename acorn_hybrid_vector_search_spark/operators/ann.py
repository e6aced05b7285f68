"""Approximate nearest-neighbor search at scale: IVF (inverted-file) index.

The reference's ANN index is a single-process HNSW graph
(/root/reference/acorn.py:26-49, modified hnswlib). A pointer-chasing
graph doesn't distribute; the standard cluster-scale design is IVF:

- **build**: learn C centroids (distributed KMeans on a sample), assign
  every row to its nearest centroid, store ``cluster_id`` as a column —
  at 100 TB, write the table ``partitionBy("cluster_id")`` so each list
  is its own file group.
- **search**: rank centroids by distance to the query (driver-side — the
  centroid table is tiny), take the ``nprobe`` nearest, scan ONLY those
  clusters (partition pruning via ``cluster_id IN (...)``), exact top-k
  inside. Recall is tunable via nprobe; nprobe = C degrades gracefully to
  exact search.

This mirrors the reference's attribute-specific-index insight
(/root/reference/acorn_attribute_specific.py:44-65 — "search a smaller
index") with a data-driven partitioning instead of a metadata-driven one.

Assignment/search distance runs on NumPy via an Arrow-batched pandas UDF:
one (batch × dim) @ (dim × C) matmul per batch — BLAS replaces the
reference's hand-SIMD (hnswlib/hnswlib/space_l2.h).
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType

from acorn_hybrid_vector_search_spark.operators.knn import knn_exact


@dataclass
class IVFIndex:
    """Driver-side handle: the indexed table + its (tiny) codebook."""

    df: DataFrame  # original columns + cluster_id
    centroids: np.ndarray  # (C, dim) float64
    vec_col: str
    id_col: str
    radii: np.ndarray | None = None  # (C,) max L2 member distance per cluster
    # r10 zone maps on the inverted lists — {attr: {cluster_id:
    # {value_str: n}}}, the SAME per-(partition, attr, value) exact-count
    # contract as the graph store's _shard_attr_stats (graph_ann.py):
    # ivf_search_exact(match=...) skips zero-passing lists outright
    attr_counts: dict | None = None
    # r10b numeric zone maps — {attr: {cluster_id: (vmin, vmax,
    # n_present)}}, the graph store's _shard_numeric_stats contract on
    # the lists: ivf_search_exact(range_pred=...) skips provably-
    # failing lists under §2.3 range ops
    numeric_stats: dict | None = None

    @property
    def n_clusters(self) -> int:
        return int(self.centroids.shape[0])


def _ivf_attr_counts(
    assigned: DataFrame, attrs: Sequence[str]
) -> dict:
    """Exact per-list value counts — one partial-agg pass per attr over
    (cluster_id, value), C×V-row collects (zone-map economics: meant
    for categorical/low-cardinality attributes). Values canonicalize
    to strings, mirroring the graph store's sidecar exactly."""
    missing = [a for a in attrs if a not in assigned.columns]
    if missing:
        raise ValueError(
            f"attr stats requested for columns not in the indexed "
            f"table: {missing}"
        )
    out: dict = {}
    for a in attrs:
        rows = (
            assigned.groupBy(
                "cluster_id", F.col(a).cast("string").alias("value")
            )
            .agg(F.count("*").alias("n"))
            .collect()
        )
        per = out.setdefault(a, {})
        for r in rows:
            per.setdefault(int(r["cluster_id"]), {})[r["value"]] = int(r["n"])
    return out


def _ivf_numeric_stats(
    assigned: DataFrame, attrs: Sequence[str]
) -> dict:
    """Per-list (vmin, vmax, n_present) numeric zone maps — the graph
    store's ``_shard_numeric_stats`` shape on the inverted lists. Like
    ``nsw_stats_write(numeric_attrs=...)``, non-numeric columns are
    refused (lexicographic min/max would silently break the range
    bound)."""
    from pyspark.sql.types import NumericType

    by_name = {f.name: f.dataType for f in assigned.schema.fields}
    bad = [
        a for a in attrs
        if a not in by_name or not isinstance(by_name[a], NumericType)
    ]
    if bad:
        raise ValueError(
            f"numeric zone maps requested for non-numeric or missing "
            f"columns in the indexed table: {bad}"
        )
    out: dict = {}
    for a in attrs:
        rows = (
            assigned.groupBy("cluster_id")
            .agg(
                F.min(F.col(a).cast("double")).alias("vmin"),
                F.max(F.col(a).cast("double")).alias("vmax"),
                F.count(F.col(a)).alias("n_present"),
            )
            .collect()
        )
        out[a] = {
            int(r["cluster_id"]): (r["vmin"], r["vmax"], int(r["n_present"]))
            for r in rows
        }
    return out


def _kmeans(sample: np.ndarray, n_clusters: int, n_iter: int, seed: int) -> np.ndarray:
    """Plain Lloyd's iterations on a driver-side sample (NumPy). The sample
    is bounded (≤ ~100k rows regardless of table size) — training cost is
    independent of data scale; only assignment is distributed."""
    rng = np.random.RandomState(seed)
    n = sample.shape[0]
    k = min(n_clusters, n)
    centroids = sample[rng.choice(n, size=k, replace=False)]
    for _ in range(n_iter):
        d2 = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                centroids[c] = sample[m].mean(axis=0)
            else:  # re-seed empty cluster deterministically
                centroids[c] = sample[rng.randint(n)]
    return centroids.astype(np.float64)


def assign_clusters(
    df: DataFrame, centroids: np.ndarray, *, vec_col: str = "embedding"
) -> DataFrame:
    """Add ``cluster_id`` = argmin_c ‖v − centroid_c‖². Arrow-batched: one
    BLAS matmul per batch, no per-row Python."""
    cent = centroids  # captured; broadcast with the serialized UDF
    cent_sq = (cent**2).sum(axis=1)  # (C,)

    @F.pandas_udf(IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        x = np.asarray(list(v), dtype=np.float64)  # (B, dim)
        # argmin over ‖x‖² − 2x·c + ‖c‖²; ‖x‖² is constant per row → drop
        scores = -2.0 * (x @ cent.T) + cent_sq[None, :]
        return pd.Series(scores.argmin(axis=1).astype(np.int32))

    return df.withColumn("cluster_id", assign(F.col(vec_col)))


def ivf_build(
    df: DataFrame,
    n_clusters: int = 16,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 20_000,
    n_iter: int = 10,
    seed: int = 42,
    with_radii: bool = False,
    stats_attrs: Sequence[str] = (),
    numeric_stats_attrs: Sequence[str] = (),
) -> IVFIndex:
    """Train the codebook on a bounded sample and tag every row with its
    cluster. (Persist with ``index.df.write.partitionBy('cluster_id')`` to
    make nprobe pruning a file-skip at rest.)

    ``with_radii=True`` additionally computes each cluster's radius (max
    member L2 distance to its centroid) with one extra aggregate pass —
    the build artifact ``ivf_search_exact`` needs for provably-exact
    pruned search. Build-time-only cost, like the reference's index
    construction (/root/reference/acorn.py:274-277).

    ``stats_attrs`` (r10): payload columns to aggregate exact per-LIST
    value counts for — the zone-map sidecar contract shared with the
    graph store (``nsw_stats_write(attrs=...)``), consumed by
    ``ivf_search_exact(match=...)`` to skip zero-passing lists under
    an exact-match predicate. ``numeric_stats_attrs`` (r10b): numeric
    payload columns to aggregate per-list (vmin, vmax, n_present)
    zone maps for — ``ivf_search_exact(range_pred=...)``'s evidence
    under §2.3 range ops, mirroring
    ``nsw_stats_write(numeric_attrs=...)``.
    """
    n = df.count()
    frac = min(1.0, sample_rows / max(n, 1))
    sample_df = df.select(vec_col) if frac >= 1.0 else df.select(vec_col).sample(frac, seed=seed)
    sample = np.asarray([r[0] for r in sample_df.collect()], dtype=np.float64)
    centroids = _kmeans(sample, n_clusters, n_iter, seed)
    assigned = assign_clusters(df, centroids, vec_col=vec_col)
    radii = None
    if with_radii:
        radii = _cluster_radii(assigned, centroids, vec_col=vec_col)
    attr_counts = _ivf_attr_counts(assigned, stats_attrs) if stats_attrs else None
    numeric_stats = (
        _ivf_numeric_stats(assigned, numeric_stats_attrs)
        if numeric_stats_attrs
        else None
    )
    return IVFIndex(
        df=assigned,
        centroids=centroids,
        vec_col=vec_col,
        id_col=id_col,
        radii=radii,
        attr_counts=attr_counts,
        numeric_stats=numeric_stats,
    )


def _cluster_radii(
    assigned: DataFrame, centroids: np.ndarray, *, vec_col: str
) -> np.ndarray:
    """(C,) max L2 distance of any member to its own centroid — a tiny
    groupBy over one Arrow-batched distance projection (map-side partial
    max, C-row result)."""
    cent = centroids

    @F.pandas_udf(DoubleType())
    def dist_to_own(v: pd.Series, cid: pd.Series) -> pd.Series:
        x = np.asarray(list(v), dtype=np.float64)
        c = cent[cid.to_numpy(dtype=np.int64)]
        d = x - c
        return pd.Series(np.sqrt(np.einsum("ij,ij->i", d, d)))

    rows = (
        assigned.select(
            F.col("cluster_id"),
            dist_to_own(F.col(vec_col), F.col("cluster_id")).alias("d"),
        )
        .groupBy("cluster_id")
        .agg(F.max("d").alias("r"))
        .collect()
    )
    radii = np.zeros(cent.shape[0], dtype=np.float64)
    for r in rows:
        radii[int(r["cluster_id"])] = float(r["r"])
    return radii


def refresh_radii(index: IVFIndex) -> IVFIndex:
    """Recompute cluster radii over the index's CURRENT lists — restores
    ``ivf_search_exact``'s pruning bound after streaming ingest appended
    members beyond the build-time radii. One bounded aggregate pass; the
    codebook stays frozen."""
    return IVFIndex(
        df=index.df,
        centroids=index.centroids,
        vec_col=index.vec_col,
        id_col=index.id_col,
        radii=_cluster_radii(index.df, index.centroids, vec_col=index.vec_col),
        # zone-map counts stay: radii refresh doesn't change membership,
        # and post-ingest loads already recompute them (ivf_read)
        attr_counts=index.attr_counts,
        numeric_stats=index.numeric_stats,
    )


def ivf_write(index: IVFIndex, path: str) -> None:
    """Persist the index: rows partitioned BY cluster_id (each inverted
    list is its own directory → nprobe pruning is a file skip, verified
    via PartitionFilters in the scan plan) + the codebook as a tiny
    parquet sidecar. The reference rebuilds its HNSW graph every run
    (~51 s, /root/reference/acorn.py:274-277, README.md:232); here build
    once, prune forever."""
    # a REBUILD owns the WHOLE store: clearing only the tombstone
    # sidecar while mode('overwrite') replaces only batch=-1 would let
    # old streaming lists/batch=<id> subtrees survive — resurrecting
    # ids whose tombstones were just wiped and duplicating every
    # re-ingested id (review r9b); drop lists/ and the sidecar together.
    # The cleanup is os-level and LOCAL-ONLY — on a remote store it
    # cannot run, and silently skipping it would re-open exactly that
    # resurrection/duplication window (ADVICE r9), so a remote REBUILD
    # fails fast like every other lifecycle op: rebuild a remote index
    # under a FRESH versioned prefix and flip a manifest pointer. A
    # first write to a provably-absent remote prefix has nothing to
    # pre-clean and proceeds (review r10 — creation must stay
    # possible); unprovable existence fails fast conservatively.
    import shutil

    from acorn_hybrid_vector_search_spark.operators.graph_ann import (
        _remote_path_exists,
        _tombstones_path,
    )

    if "://" in path:
        if _remote_path_exists(index.df.sparkSession, path):
            raise ValueError(
                f"ivf_write's rebuild pre-clean (stale lists/batch=<id> "
                f"subtrees + the tombstone sidecar) is os-level and only "
                f"supports local paths; got {path!r} — write a fresh "
                f"versioned prefix and flip a manifest pointer on remote "
                f"stores"
            )
    else:
        shutil.rmtree(f"{path}/lists", ignore_errors=True)
        shutil.rmtree(_tombstones_path(path), ignore_errors=True)
    # base rows live under batch=-1: streaming ingest appends sibling
    # batch=<id> directories (streaming/indexing.py), so every writer owns
    # exactly one subtree and a replayed micro-batch can overwrite its own
    # idempotently. Partition discovery needs consistent depth, hence the
    # level exists from the start.
    index.df.write.mode("overwrite").partitionBy("cluster_id").parquet(
        f"{path}/lists/batch=-1"
    )
    spark = index.df.sparkSession
    rows = [
        (
            i,
            [float(x) for x in c],
            float(index.radii[i]) if index.radii is not None else None,
        )
        for i, c in enumerate(index.centroids)
    ]
    spark.createDataFrame(
        rows, "cluster_id INT, centroid ARRAY<DOUBLE>, radius DOUBLE"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebook")
    # r10: persist the per-list zone maps (same row shape as the graph
    # store's _shard_attr_stats sidecar — one contract, two stores); a
    # rebuild without stats must also DROP a stale sidecar (the
    # _clear_sidecars rule)
    shutil.rmtree(f"{path}/attr_stats", ignore_errors=True)
    if index.attr_counts:
        arows = [
            (int(c), a, v, int(n))
            for a, per in index.attr_counts.items()
            for c, vals in per.items()
            for v, n in vals.items()
        ]
        spark.createDataFrame(
            arows, "cluster_id INT, attr STRING, value STRING, n LONG"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/attr_stats")
    shutil.rmtree(f"{path}/numeric_stats", ignore_errors=True)
    if index.numeric_stats:
        nrows = [
            (int(c), a, vmin, vmax, int(np_))
            for a, per in index.numeric_stats.items()
            for c, (vmin, vmax, np_) in per.items()
        ]
        spark.createDataFrame(
            nrows,
            "cluster_id INT, attr STRING, vmin DOUBLE, vmax DOUBLE, "
            "n_present LONG",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{path}/numeric_stats"
        )
    # store writers drop pinned materializations: a semantically-equal
    # read plan over this path must never serve the pre-rewrite
    # snapshot (the r7 rule every other writer already follows)
    from acorn_hybrid_vector_search_spark.operators._cache import invalidate
    from acorn_hybrid_vector_search_spark.operators.graph_ann import (
        _bump_store_version,
    )

    _bump_store_version(path)
    invalidate()


def ivf_read(
    spark, path: str, *, vec_col: str = "embedding", id_col: str = "vec_id"
) -> IVFIndex:
    """Load a persisted index. The lists DataFrame carries cluster_id as a
    PARTITION column, so `cluster_id IN (...)` prunes at file-listing time.

    Tombstones (r9): ids deleted via ``ivf_delete`` are filtered out HERE
    — one broadcast join at load, so every search over the returned
    handle (nprobe, exact-pruned, predicate) honors deletions with zero
    per-search cost. Version-aware on the ``batch`` ownership level: a
    streaming micro-batch that re-adds a deleted id lands above the
    tombstone's ceiling and stays live (the graph store's part_ceiling
    contract, graph_ann.py). Radii stay sound — they upper-bound a
    superset of the live members."""
    from acorn_hybrid_vector_search_spark.operators.graph_ann import (
        _read_tombstones,
        _tombstone_ceiling,
    )

    cb = spark.read.parquet(f"{path}/codebook").orderBy("cluster_id").collect()
    centroids = np.asarray([r["centroid"] for r in cb], dtype=np.float64)
    radii = None
    if cb and "radius" in cb[0].asDict() and cb[0]["radius"] is not None:
        radii = np.asarray([r["radius"] for r in cb], dtype=np.float64)
    df = spark.read.parquet(f"{path}/lists")
    tomb = _read_tombstones(spark, path, id_col)
    if tomb is not None:
        ceil = _tombstone_ceiling(tomb, id_col, ceiling_col="batch_ceiling")
        df = (
            df.join(F.broadcast(ceil), id_col, "left")
            .filter(
                F.col("_tomb_ceiling").isNull()
                | (F.col("batch") > F.col("_tomb_ceiling"))
            )
            .drop("_tomb_ceiling")
        )
    # `batch` is a writer-ownership detail (base load vs streaming
    # micro-batches) — drop it from the logical schema; cluster_id pruning
    # is unaffected (both are partition levels).
    has_extra_batches = _ivf_has_stream_batches(path)
    df = df.drop("batch")
    attr_counts = None
    apath = f"{path}/attr_stats"
    if os.path.exists(apath):
        persisted_attrs = sorted(
            {r["attr"] for r in spark.read.parquet(apath).select("attr").distinct().collect()}
        )
        if has_extra_batches:
            # streaming ingest appended rows the persisted counts never
            # saw — a zero-count list could now hold passing members,
            # so zero-skip would be UNSOUND on stale counts. Recompute
            # from the LIVE view (tombstones applied above): exact and
            # fresh, one bounded aggregate per attr at load time.
            attr_counts = _ivf_attr_counts(df, persisted_attrs)
        else:
            # tombstones alone keep persisted counts sound for skipping:
            # deletions only SHRINK a list's passing set, so zero stays
            # zero (a stale-high count just prunes less — never wrong)
            attr_counts = {}
            for r in spark.read.parquet(apath).collect():
                attr_counts.setdefault(r["attr"], {}).setdefault(
                    int(r["cluster_id"]), {}
                )[r["value"]] = int(r["n"])
    numeric_stats = None
    npath = f"{path}/numeric_stats"
    if os.path.exists(npath):
        persisted_nums = sorted(
            {r["attr"] for r in spark.read.parquet(npath).select("attr").distinct().collect()}
        )
        if has_extra_batches:
            # same staleness argument: appended rows can widen a
            # list's [vmin, vmax] — a none-pass verdict on stale
            # bounds would skip passing members
            numeric_stats = _ivf_numeric_stats(df, persisted_nums)
        else:
            # deletions only NARROW the true range, so stale-wide
            # bounds stay sound (a straddle verdict where none-pass
            # now holds just prunes less)
            numeric_stats = {}
            for r in spark.read.parquet(npath).collect():
                numeric_stats.setdefault(r["attr"], {})[
                    int(r["cluster_id"])
                ] = (r["vmin"], r["vmax"], int(r["n_present"]))
    return IVFIndex(
        df=df, centroids=centroids, vec_col=vec_col, id_col=id_col,
        radii=radii, attr_counts=attr_counts, numeric_stats=numeric_stats,
    )


def _ivf_has_stream_batches(path: str) -> bool:
    """True when streaming ingest added lists/batch=<id> subtrees beyond
    the base batch=-1 (local stores only — ivf_write refuses remote)."""
    lists = f"{path}/lists"
    if "://" in path or not os.path.isdir(lists):
        return False
    return any(
        d.startswith("batch=") and d != "batch=-1" for d in os.listdir(lists)
    )


def ivf_delete(
    spark, path: str, ids, *, id_col: str = "vec_id", strict: bool = True
) -> None:
    """Mark ids deleted in a persisted IVF store — the same tombstone
    sidecar contract as the graph store (graph_ann.py nsw_delete / the
    hnswlib mark_deleted analog): O(|ids|) sidecar rows appended, no
    list rewrite at any store size. The ceiling is the store's max
    ``batch`` ownership id, so a later streaming micro-batch re-adding
    the id stays live. ``ivf_read`` applies tombstones at load;
    ``ivf_reclaim`` is the physical delete."""
    from acorn_hybrid_vector_search_spark.operators._cache import invalidate
    from acorn_hybrid_vector_search_spark.operators.graph_ann import (
        _ids_frame,
        _tombstones_path,
    )

    ids_df = _ids_frame(spark, ids, id_col)
    lists = spark.read.parquet(f"{path}/lists")
    ceiling = lists.agg(F.max("batch")).head()[0]
    if strict:
        miss = ids_df.join(lists.select(id_col), id_col, "left_anti")
        sample_rows = miss.take(6)
        if sample_rows:
            sample = sorted(r[0] for r in sample_rows[:5])
            more = " (and more)" if len(sample_rows) > 5 else ""
            raise ValueError(
                f"ivf_delete: id(s) not present in the store at {path} "
                f"(first few: {sample}{more}); pass strict=False to "
                f"tombstone regardless"
            )
    (
        ids_df.withColumn("batch_ceiling", F.lit(int(ceiling)).cast("long"))
        .write.mode("append")
        .parquet(_tombstones_path(path))
    )
    from acorn_hybrid_vector_search_spark.operators.graph_ann import (
        _bump_store_version,
    )

    _bump_store_version(path)
    invalidate()


def ivf_reclaim(spark, path: str, *, id_col: str = "vec_id") -> int:
    """Physical delete for the IVF store — the nsw_compact analog, far
    cheaper here because lists are flat rows (no graph rebuild): rewrite
    the lists with tombstoned rows dropped, collapse streaming batch
    history into the base subtree, and clear the sidecar (required, as
    in nsw_compact: the collapsed rows land at batch=-1, below every
    ceiling). Returns the live row count. Local paths only (directory
    swap)."""
    import shutil

    from acorn_hybrid_vector_search_spark.operators._cache import invalidate
    from acorn_hybrid_vector_search_spark.operators.graph_ann import (
        _swap_dir,
        _tombstones_path,
    )

    if "://" in path:
        raise ValueError(
            f"ivf_reclaim swaps directories and only supports local "
            f"paths; got {path!r}"
        )
    live = ivf_read(spark, path, id_col=id_col).df
    n_live = live.count()
    if n_live == 0:
        raise ValueError(
            f"ivf_reclaim would empty the store at {path}: every row is "
            f"tombstoned — drop the store directory instead"
        )
    lists = f"{path}/lists"
    tmp = lists + "__tmp"
    try:
        live.write.mode("overwrite").partitionBy("cluster_id").parquet(
            f"{tmp}/batch=-1"
        )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    _swap_dir(lists, tmp)
    shutil.rmtree(_tombstones_path(path), ignore_errors=True)
    from acorn_hybrid_vector_search_spark.operators.graph_ann import (
        _bump_store_version,
    )

    _bump_store_version(path)
    invalidate()
    return int(n_live)


def ivf_search(
    index: IVFIndex,
    query_vec: Sequence[float],
    k: int,
    *,
    nprobe: int = 4,
    predicate: Column | None = None,
) -> DataFrame:
    """Top-k by L2² among the ``nprobe`` clusters nearest the query.

    The cluster ranking is a C-row NumPy computation on the driver; the
    scan applies ``cluster_id IN (...)`` FIRST (partition-prunable), then
    the optional metadata predicate, then exact top-k — so the expensive
    distance work touches ~nprobe/C of the data.
    """
    q = np.asarray(list(query_vec), dtype=np.float64)
    d2 = ((index.centroids - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(d2, kind="stable")[:nprobe]]
    scan = index.df.filter(F.col("cluster_id").isin(probe))
    if predicate is not None:
        scan = scan.filter(predicate)
    return knn_exact(scan, list(query_vec), k, vec_col=index.vec_col, id_col=index.id_col)


def ivf_search_exact(
    index: IVFIndex,
    query_vec: Sequence[float],
    k: int,
    *,
    match: tuple[str, object] | None = None,
    range_pred: tuple[str, str, float] | None = None,
    conj=None,
) -> DataFrame:
    """PROVABLY EXACT top-k with data-adaptive cluster pruning — the
    IVF answer to "approximate is not acceptable, full scan is too much".

    Ball-bound argument (triangle inequality): for any member x of
    cluster c, ‖x−q‖ ≥ ‖q−centroid_c‖ − radius_c. So after finding a
    candidate k-th distance d_k from the nearest cluster, any cluster
    whose lower bound exceeds d_k provably contains no better neighbor
    and is skipped — same guarantee as ball-tree pruning, expressed as
    partition pruning:

      phase 1: exact top-k inside the single nearest cluster (scans
               ~1/C of the data; bounded k-row collect);
      phase 2: one plan over the clusters whose ball could still beat
               d_k (often just a few; worst case — e.g. uniform data
               with overlapping balls — degrades to the full scan, still
               exact).

    Requires ``with_radii=True`` at build. How much phase 2 prunes is a
    property of the data's cluster structure; exactness never depends
    on it.

    SOUNDNESS CAVEAT: radii describe the lists at build time. Streaming
    ingest (streaming/indexing.py) appends members that may exceed a
    stored radius — recompute radii after ingest (one cheap aggregate)
    before using exact pruned search on a grown index.

    ``match`` (r10, the graph store's ``prune_match`` on the IVF lists
    — one shared zone-map contract): ``(attr, value)`` exact-match
    predicate with per-list exact value counts (``ivf_build(
    stats_attrs=[attr])`` / loaded by ``ivf_read``): zero-passing
    lists are skipped at EVERY stage (their directories are never
    read — the cluster_id filter is partition pruning), phase 1 runs
    in the nearest list that actually holds passing members, and the
    ball lower bound applies unchanged to the passing subset (every
    passing member is a member), so the result is the exact filtered
    top-k. Counts persisted at build stay sound under deletions
    (passing sets only shrink; zero stays zero) and are recomputed at
    load when streaming batches appended rows the counts never saw
    (``ivf_read``).

    ``range_pred`` (r10b): ``(attr, op, value)`` with op in
    ``< <= > >=`` (+ ``leq``/``geq``) — the numeric zone-map form
    over per-list (vmin, vmax, n_present) stats (``ivf_build(
    numeric_stats_attrs=[attr])``): lists whose whole value range
    fails are skipped at every stage, straddling/all-pass lists are
    scanned with the predicate pushed into the parquet read, and the
    ball lower bound applies unchanged to the passing subset —
    exact filtered top-k, the graph store's ``prune_range`` on the
    inverted lists. Mutually exclusive with ``match``.

    ``conj`` (r11): ``{attr: (op, value)}`` — a CONJUNCTION of exact /
    substring / range constraints, the graph store's ``prune_conj`` on
    the inverted lists (the reference's literal class-2 shape,
    acorn.py:296-298). The IVF form needs NO Bonferroni counts: the
    two-phase scan's exactness comes from the ball bound plus the
    predicate-filtered top-k, so it suffices to skip lists where ANY
    constraint provably passes nowhere (exact/substring: zero summed
    value counts; range: none-pass verdict) and to AND the constraint
    masks into both scans. Every exact/substring attr needs per-list
    value counts, every range attr numeric zone maps. Mutually
    exclusive with ``match``/``range_pred``.
    """
    from acorn_hybrid_vector_search_spark.operators.graph_ann import (
        _RANGE_OPS,
        _range_shard_verdict,
    )

    if index.radii is None:
        raise ValueError("ivf_search_exact requires an index built with_radii=True")
    if sum(x is not None for x in (match, range_pred, conj)) > 1:
        raise ValueError(
            "pass at most one of match / range_pred / conj — one "
            "predicate drives both the list pruning and the row filter"
        )
    pred = None
    passing = None
    if conj is not None:
        from acorn_hybrid_vector_search_spark.operators.graph_ann import (
            _conj_pred_col,
            _normalize_conj,
        )

        normalized = _normalize_conj(conj)
        passing = np.ones(index.n_clusters, dtype=np.int64)
        for attr, (c_op, c_val) in normalized.items():
            passing &= _ivf_passing_lists(
                index, (attr, c_op, c_val)
            ).astype(np.int64)
        pred = _conj_pred_col(normalized)
        if not (passing > 0).any():
            return knn_exact(
                index.df.filter(F.lit(False)), list(query_vec), k,
                vec_col=index.vec_col, id_col=index.id_col,
            )
    if range_pred is not None:
        r_attr, r_op_raw, r_val = range_pred
        r_op = _RANGE_OPS.get(r_op_raw)
        if r_op is None:
            raise ValueError(
                f"range_pred op must be one of {sorted(_RANGE_OPS)}, "
                f"got {r_op_raw!r}"
            )
        if not index.numeric_stats or r_attr not in index.numeric_stats:
            covered = sorted(index.numeric_stats or ())
            raise ValueError(
                f"ivf_search_exact(range_pred=({r_attr!r}, …)) needs "
                f"per-list numeric zone maps for {r_attr!r} (covered: "
                f"{covered}) — build with ivf_build("
                f"numeric_stats_attrs=[{r_attr!r}])"
            )
        zones = index.numeric_stats[r_attr]
        passing = np.asarray(
            [
                1
                if _range_shard_verdict(
                    *zones.get(c, (None, None, 0)), r_op, float(r_val)
                )[1]
                else 0
                for c in range(index.n_clusters)
            ],
            dtype=np.int64,
        )
        col = F.col(r_attr)
        pred = {
            "<": col < F.lit(r_val),
            "<=": col <= F.lit(r_val),
            ">": col > F.lit(r_val),
            ">=": col >= F.lit(r_val),
        }[r_op]
        if not (passing > 0).any():
            return knn_exact(
                index.df.filter(F.lit(False)), list(query_vec), k,
                vec_col=index.vec_col, id_col=index.id_col,
            )
    if match is not None:
        m_attr, m_val = match
        if not index.attr_counts or m_attr not in index.attr_counts:
            covered = sorted(index.attr_counts or ())
            raise ValueError(
                f"ivf_search_exact(match=({m_attr!r}, …)) needs per-list "
                f"value counts for {m_attr!r} (covered: {covered}) — "
                f"build with ivf_build(stats_attrs=[{m_attr!r}])"
            )
        from acorn_hybrid_vector_search_spark.operators.graph_ann import (
            _canon_value_count,
        )

        per = index.attr_counts[m_attr]
        passing = np.asarray(
            [
                _canon_value_count(per.get(c, {}), m_val)
                for c in range(index.n_clusters)
            ],
            dtype=np.int64,
        )
        pred = F.col(m_attr) == F.lit(m_val)
        if not (passing > 0).any():
            return knn_exact(
                index.df.filter(F.lit(False)), list(query_vec), k,
                vec_col=index.vec_col, id_col=index.id_col,
            )
    q = np.asarray(list(query_vec), dtype=np.float64)
    dc = np.sqrt(((index.centroids - q[None, :]) ** 2).sum(axis=1))  # (C,) L2
    order = np.argsort(dc, kind="stable")
    if passing is not None:
        order = np.asarray([c for c in order if passing[int(c)] > 0])
    first = int(order[0])

    scan1 = index.df.filter(F.col("cluster_id") == first)
    if pred is not None:
        scan1 = scan1.filter(pred)
    top1 = knn_exact(
        scan1,
        list(query_vec),
        k,
        vec_col=index.vec_col,
        id_col=index.id_col,
    ).collect()
    if len(top1) < k:
        probe = [int(c) for c in order]  # nearest cluster can't fill k: no bound
    else:
        d_k = float(np.sqrt(top1[-1]["dist"]))  # dist is squared L2
        lower = dc - index.radii  # per-cluster best-case distance
        probe = [first] + [
            int(c) for c in order[1:] if lower[int(c)] <= d_k + 1e-9
        ]
    scan = index.df.filter(F.col("cluster_id").isin(probe))
    if pred is not None:
        scan = scan.filter(pred)
    return knn_exact(
        scan,
        list(query_vec),
        k,
        vec_col=index.vec_col,
        id_col=index.id_col,
    )


def _ivf_passing_lists(index: IVFIndex, constraint) -> np.ndarray:
    """Per-list may-hold-a-passing-member mask for ONE §2.3 constraint
    ``(attr, op, value)`` with op 'exact'/'substring' (per-list exact
    value counts — substring sums the distinct keys containing the
    needle, exactly like the graph store's `_substring_value_count`)
    or a range spelling (numeric zone-map verdicts) — the single-query
    ``ivf_search_exact`` arms' verdict arithmetic, shaped for the r11
    conj/batch forms. Raises on uncovered attrs exactly like the
    single-query arms do (callers route only covered constraints)."""
    from acorn_hybrid_vector_search_spark.operators.graph_ann import (
        _RANGE_OPS,
        _canon_value_count,
        _range_shard_verdict,
        _substring_value_count,
    )

    attr, op, value = constraint
    if op in ("exact", "substring"):
        if not index.attr_counts or attr not in index.attr_counts:
            covered = sorted(index.attr_counts or ())
            raise ValueError(
                f"{op} constraint on {attr!r} needs per-list value "
                f"counts (covered: {covered}) — build with "
                f"ivf_build(stats_attrs=[{attr!r}])"
            )
        per = index.attr_counts[attr]
        counter = (
            _canon_value_count if op == "exact" else _substring_value_count
        )
        return np.asarray(
            [
                counter(per.get(c, {}), value) > 0
                for c in range(index.n_clusters)
            ],
            dtype=bool,
        )
    r_op = _RANGE_OPS.get(op)
    if r_op is None:
        raise ValueError(
            f"batch range op must be one of {sorted(_RANGE_OPS)}, got {op!r}"
        )
    if not index.numeric_stats or attr not in index.numeric_stats:
        covered = sorted(index.numeric_stats or ())
        raise ValueError(
            f"batch range_pred on {attr!r} needs per-list numeric zone "
            f"maps (covered: {covered}) — build with "
            f"ivf_build(numeric_stats_attrs=[{attr!r}])"
        )
    zones = index.numeric_stats[attr]
    return np.asarray(
        [
            _range_shard_verdict(
                *zones.get(c, (None, None, 0)), r_op, float(value)
            )[1]
            for c in range(index.n_clusters)
        ],
        dtype=bool,
    )


def ivf_search_exact_batch(
    index: IVFIndex,
    queries: Sequence[tuple[int, Sequence[float]]],
    k: int,
    *,
    match=None,
    range_pred=None,
    conj=None,
    query_id_col: str = "query_id",
    salt_buckets: int = 32,
) -> DataFrame:
    """``ivf_search_exact`` for a QUERY BATCH — the IVF rung at the
    serving shape (r11, VERDICT r10 ask #6): per query the result is
    IDENTICAL to the single-query two-phase exact scan (pytest-pinned),
    but the whole batch pays TWO list scans total instead of two per
    query.

    ``match`` / ``range_pred``: per-query mappings ``{query_id: (attr,
    value)}`` / ``{query_id: (attr, op, value)}`` — each query's own
    zone-map verdicts (the SAME `_canon_value_count` /
    `_range_shard_verdict` arithmetic as the single-query arms) skip
    its provably-empty lists at every stage; a query in neither mapping
    probes on plain ball bounds; ``conj``: per-query CONJUNCTION dicts
    ``{query_id: {attr: (op, value)}}`` with exact / substring / range
    terms (the graph store's per-query prune_conj shape — a query's
    lists must survive EVERY term's verdict). A query whose constraint
    provably passes nowhere contributes an empty per-query result,
    exactly like the single-query arms.

    Plan (both phases are broadcast EQUI-joins — no nested-loop pair
    explosion, and cluster_id stays partition-prunable at rest):

      phase 1: each query's nearest PASSING list, as a broadcast hash
               join of the lists scan against the bounded query table
               carrying ``_first`` per query; per-query exact top-k via
               the salted two-phase rank; ONE bounded ≤ |Q|·k collect
               gives every query's candidate d_k.
      phase 2: per-query ball-bound probe sets (driver-side C-row
               arithmetic; a query whose phase 1 under-fills probes
               every passing list), EXPLODED to (query, cluster) rows
               on the broadcast side — the lists scan hash-joins on
               cluster_id, so each (row, query) pair exists exactly
               once and only probed lists are read.

    §2.3 predicate semantics per query ride the broadcast parameter
    columns (``_batch_predicate`` — the r8 batched-hybrid machinery),
    so NULL attrs reject and each query filters only its own rows."""
    from pyspark.sql.window import Window

    from acorn_hybrid_vector_search_spark.functions.distance import (
        l2_sq_distance,
    )
    from acorn_hybrid_vector_search_spark.functions.predicates import (
        flat_accessors,
    )
    from acorn_hybrid_vector_search_spark.operators.hybrid import (
        _batch_predicate,
        _batch_query_table,
        _check_batch_collisions,
    )

    if index.radii is None:
        raise ValueError(
            "ivf_search_exact_batch requires an index built with_radii=True"
        )
    match = {int(q): t for q, t in dict(match or {}).items()}
    range_pred = {int(q): t for q, t in dict(range_pred or {}).items()}
    conj = {int(q): dict(c) for q, c in dict(conj or {}).items()}
    overlapping = sorted(
        (set(match) & set(range_pred))
        | (set(match) & set(conj))
        | (set(range_pred) & set(conj))
    )
    if overlapping:
        raise ValueError(
            f"queries {overlapping} appear in both match and range_pred "
            f"(or conj) — one constraint set drives both the list "
            f"pruning and the row filter"
        )
    qids = [int(q) for q, _ in queries]
    qset = set(qids)
    if unknown := [
        q for q in sorted({*match, *range_pred, *conj}) if q not in qset
    ]:
        raise ValueError(f"constraints for ids not in the batch: {unknown}")

    # driver-side per-query verdicts: passing-list masks, centroid
    # ordering, nearest passing list (C-row numpy — query-batch-sized
    # work, independent of data scale). Every constraint shape
    # normalizes to a conjunction dict {attr: (op, value)} — match and
    # range are its one-term special cases (the graph store's
    # prune_conj unification).
    from acorn_hybrid_vector_search_spark.operators.graph_ann import (
        _RANGE_OPS,
    )

    def _spell_range(op: str) -> str:
        # canonicalize the range spelling to the §2.3 op the row-filter
        # grammar ENFORCES ('<=' → 'leq', '>=' → 'geq'): the predicate
        # parameter table silently ignores unsupported spellings, so an
        # un-normalized '<=' would prune lists by the zone maps but
        # never filter rows (review r11 — the single-query arm enforces
        # every _RANGE_OPS spelling through its own Catalyst predicate)
        canon = _RANGE_OPS.get(op)
        if canon is None:
            raise ValueError(
                f"batch range op must be one of {sorted(_RANGE_OPS)}, "
                f"got {op!r}"
            )
        return {"<=": "leq", ">=": "geq", "<": "<", ">": ">"}[canon]

    from acorn_hybrid_vector_search_spark.functions.predicates import (
        flat_accessors as _facc,
    )

    acc_kinds = {a: x.kind for a, x in _facc(index.df).items()}
    constraints: dict[int, dict] = {}
    for q, (attr, value) in match.items():
        constraints[q] = {attr: ("exact", value)}
    for q, (attr, op, value) in range_pred.items():
        constraints[q] = {attr: (_spell_range(op), value)}
    for q, terms in conj.items():
        normalized = {}
        for attr, spec in terms.items():
            c_op, c_val = list(spec)[0], list(spec)[1]
            if c_op == "exact":
                pass
            elif c_op == "substring":
                # the batch row filter runs through the §2.3 parameter
                # grammar, which IGNORES substring on non-string kinds
                # — accepting it would prune lists without filtering
                # rows (the review-r11 hazard, closed at the gate)
                if acc_kinds.get(attr) != "string":
                    raise ValueError(
                        f"substring constraint on non-string column "
                        f"{attr!r} — the §2.3 grammar ignores it, so "
                        f"pruning by it would change results"
                    )
            else:
                c_op = _spell_range(c_op)
            normalized[attr] = (c_op, c_val)
        if not normalized:
            raise ValueError(f"empty conj for query {q}")
        constraints[q] = normalized
    qmat = np.asarray([list(v) for _, v in queries], dtype=np.float64)
    dc_all = np.sqrt(
        ((index.centroids[None, :, :] - qmat[:, None, :]) ** 2).sum(axis=2)
    )  # (|Q|, C) L2
    passing_by_q: dict[int, np.ndarray] = {}
    order_by_q: dict[int, np.ndarray] = {}
    first_by_q: dict[int, int] = {}
    for qi, q in enumerate(qids):
        passing = np.ones(index.n_clusters, dtype=bool)
        for c_attr, (c_op, c_val) in constraints.get(q, {}).items():
            passing &= _ivf_passing_lists(index, (c_attr, c_op, c_val))
        order = np.argsort(dc_all[qi], kind="stable")
        order = order[passing[order]]
        passing_by_q[q] = passing
        order_by_q[q] = order
        if order.size:
            first_by_q[q] = int(order[0])
    live = [(q, v) for q, v in queries if int(q) in first_by_q]
    spark = index.df.sparkSession
    if not live:
        empty = index.df.filter(F.lit(False)).select(
            F.lit(0).cast("long").alias(query_id_col),
            F.col(index.id_col),
        )
        return empty.withColumn("dist", F.lit(0.0))

    preds_323 = {
        q: {a: [c_op, c_val] for a, (c_op, c_val) in constraints[q].items()}
        for q in constraints
        if q in first_by_q
    }
    acc = flat_accessors(index.df)
    qt, used = _batch_query_table(
        spark,
        [(q, v, preds_323.get(int(q))) for q, v in live],
        acc,
        query_id_col=query_id_col,
        query_vec_col="_qv",
    )
    _check_batch_collisions(
        index.df, qt, extra=("_first", "_probe_c", "_sb", "_rn", "dist")
    )
    first_map = F.element_at(
        F.create_map(
            *[
                c
                for q in first_by_q
                for c in (F.lit(int(q)), F.lit(first_by_q[q]))
            ]
        ),
        F.col(query_id_col),
    )
    order_cols = [F.col("dist").asc(), F.col(index.id_col).asc()]

    def _per_query_topk(scored: DataFrame, limit: int) -> DataFrame:
        w_local = Window.partitionBy(query_id_col, "_sb").orderBy(*order_cols)
        w_global = Window.partitionBy(query_id_col).orderBy(*order_cols)
        return (
            scored.withColumn(
                "_sb",
                F.pmod(F.xxhash64(F.col(index.id_col)), F.lit(salt_buckets)),
            )
            .withColumn("_rn", F.row_number().over(w_local))
            .filter(F.col("_rn") <= limit)
            .drop("_rn")
            .withColumn("_rn", F.row_number().over(w_global))
            .filter(F.col("_rn") <= limit)
            .drop("_rn", "_sb")
        )

    qt1 = qt.withColumn("_first", first_map)
    pairs1 = index.df.join(
        F.broadcast(qt1), on=F.col("cluster_id") == F.col("_first")
    ).where(_batch_predicate(used, acc))
    top1 = (
        _per_query_topk(
            pairs1.withColumn(
                "dist", l2_sq_distance(F.col(index.vec_col), F.col("_qv"))
            ).select(query_id_col, index.id_col, "dist"),
            k,
        )
        .collect()
    )  # bounded: ≤ |Q|·k rows — the single-query phase-1 collect, batched

    filled: dict[int, list] = {}
    for r in top1:
        filled.setdefault(int(r[query_id_col]), []).append(float(r["dist"]))
    probe_by_q: dict[int, list[int]] = {}
    for qi, q in enumerate(qids):
        if q not in first_by_q:
            continue
        order = order_by_q[q]
        dists = filled.get(q, [])
        if len(dists) < k:
            probe_by_q[q] = [int(c) for c in order]  # no bound: all passing
            continue
        d_k = float(np.sqrt(max(dists)))
        lower = dc_all[qi] - index.radii
        first = first_by_q[q]
        probe_by_q[q] = [first] + [
            int(c) for c in order[1:] if lower[int(c)] <= d_k + 1e-9
        ]

    probe_map = F.element_at(
        F.create_map(
            *[
                c
                for q, probe in probe_by_q.items()
                for c in (
                    F.lit(int(q)),
                    F.array(*[F.lit(int(p)) for p in probe]),
                )
            ]
        ),
        F.col(query_id_col),
    )
    qt2 = qt.withColumn("_probe_c", F.explode(probe_map))
    pairs2 = index.df.join(
        F.broadcast(qt2), on=F.col("cluster_id") == F.col("_probe_c")
    ).where(_batch_predicate(used, acc))
    return _per_query_topk(
        pairs2.withColumn(
            "dist", l2_sq_distance(F.col(index.vec_col), F.col("_qv"))
        ).select(query_id_col, index.id_col, "dist"),
        k,
    )


def ivf_search_batch(
    index: IVFIndex,
    queries: Sequence[tuple[int, Sequence[float]]],
    k: int,
    *,
    nprobe: int = 4,
    predicates=None,
    accessors=None,
    query_id_col: str = "query_id",
    salt_buckets: int = 32,
) -> DataFrame:
    """``ivf_search`` for a QUERY BATCH (r11): each query's ``nprobe``
    nearest lists, answered from ONE scan of the probed-list union —
    the (query, cluster) probe pairs ride the bounded broadcast side
    (exploded array per query), the lists scan hash-joins on
    cluster_id (equi-join, partition-prunable, never a nested loop),
    each query's own §2.3 predicate (``predicates``: ``{query_id:
    {attr: [op, value]}}``) applies via the broadcast parameter
    columns, and the per-query exact top-k uses the salted two-phase
    rank. Per query ≡ ``ivf_search`` (pytest-pinned) — same nprobe
    recall contract, batch-shaped cost."""
    from pyspark.sql.window import Window

    from acorn_hybrid_vector_search_spark.functions.distance import (
        l2_sq_distance,
    )
    from acorn_hybrid_vector_search_spark.functions.predicates import (
        flat_accessors,
    )
    from acorn_hybrid_vector_search_spark.operators.hybrid import (
        _batch_predicate,
        _batch_query_table,
        _check_batch_collisions,
    )

    predicates = {int(q): p for q, p in dict(predicates or {}).items()}
    qids = [int(q) for q, _ in queries]
    if unknown := [q for q in sorted(predicates) if q not in set(qids)]:
        raise ValueError(f"predicates for ids not in the batch: {unknown}")
    qmat = np.asarray([list(v) for _, v in queries], dtype=np.float64)
    d2 = ((index.centroids[None, :, :] - qmat[:, None, :]) ** 2).sum(axis=2)
    probe_by_q = {
        q: [int(c) for c in np.argsort(d2[qi], kind="stable")[:nprobe]]
        for qi, q in enumerate(qids)
    }
    acc = accessors or flat_accessors(index.df)
    qt, used = _batch_query_table(
        index.df.sparkSession,
        [(q, v, predicates.get(int(q))) for q, v in queries],
        acc,
        query_id_col=query_id_col,
        query_vec_col="_qv",
    )
    _check_batch_collisions(
        index.df, qt, extra=("_probe_c", "_sb", "_rn", "dist")
    )
    probe_map = F.element_at(
        F.create_map(
            *[
                c
                for q, probe in probe_by_q.items()
                for c in (
                    F.lit(int(q)),
                    F.array(*[F.lit(int(p)) for p in probe]),
                )
            ]
        ),
        F.col(query_id_col),
    )
    qt2 = qt.withColumn("_probe_c", F.explode(probe_map))
    pairs = index.df.join(
        F.broadcast(qt2), on=F.col("cluster_id") == F.col("_probe_c")
    ).where(_batch_predicate(used, acc))
    scored = pairs.withColumn(
        "dist", l2_sq_distance(F.col(index.vec_col), F.col("_qv"))
    ).select(query_id_col, index.id_col, "dist").withColumn(
        "_sb", F.pmod(F.xxhash64(F.col(index.id_col)), F.lit(salt_buckets))
    )
    order = [F.col("dist").asc(), F.col(index.id_col).asc()]
    w_local = Window.partitionBy(query_id_col, "_sb").orderBy(*order)
    w_global = Window.partitionBy(query_id_col).orderBy(*order)
    return (
        scored.withColumn("_rn", F.row_number().over(w_local))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .withColumn("_rn", F.row_number().over(w_global))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_sb")
    )
