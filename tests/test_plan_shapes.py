"""Physical-plan regression guards: the plan SHAPES are the scale
contract (SURVEY.md §4 / README design rules). If a future change turns a
broadcast join into a cartesian product or drops TakeOrderedAndProject,
these fail before any benchmark does."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries(spark):
    import __spark_entry__ as m

    return {n: f(spark, SF) for n, f in m.queries().items()}


def test_topk_queries_use_take_ordered(queries):
    for name in ("pure_topk", "prefilter_exact", "prefilter_range", "ann_cosine_topk"):
        assert "TakeOrderedAndProject" in _plan(queries[name]), name


# queries whose INTENDED plan is a broadcast nested-loop join: knn_batch
# pairs every row with the bounded broadcast query batch (there is no
# equi-key by construction). Everything else must stay equi-join.
_BNLJ_BY_DESIGN = {
    "knn_batch_topk",
    # BM25's corpus-stats table is a broadcast 1-row cross join
    "bm25_topk_docs",
    "hybrid_rrf_retrieval",
    # bounded broadcast query batch, label-mismatch filtered map-side
    "hard_negatives_topk",
    "mined_contrastive_pairs",
}


def test_no_cartesian_products_anywhere(queries):
    for name, df in queries.items():
        p = _plan(df)
        assert "CartesianProduct" not in p, name
        # nested-loop joins are only acceptable broadcast-side, and only
        # where the broadcast side is a bounded query batch
        if name not in _BNLJ_BY_DESIGN:
            assert "BroadcastNestedLoopJoin" not in p, name


def test_dim_joins_broadcast(queries):
    assert "BroadcastHashJoin" in _plan(queries["join_revenue_by_nation"])


def test_aggregates_are_partial_before_shuffle(queries):
    # partial (map-side) HashAggregate must appear below the exchange
    p = _plan(queries["agg_lineitem_pricing"])
    assert p.count("HashAggregate") >= 2 and "Exchange" in p


def test_scans_prune_columns(queries):
    # the lineitem scan must not read all 8+ columns for a 5-column agg
    p = _plan(queries["agg_lineitem_pricing"])
    read = p.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_pair_joins_keep_threshold_out_of_project(queries):
    # near-dup joins evaluate similarity inside the join condition; the
    # post-join Project must not re-introduce a Filter over all pairs
    p = _plan(queries["ngram_jaccard_near_dups"])
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p


def test_nested_items_scan_prunes_and_pushes(queries):
    """Nested-schema scale contract: a hybrid query constraining brand +
    item_weight must scan ONLY those attribute subtrees of the items
    table (nestedSchemaPruning) and push the presence IsNotNulls into the
    parquet source — at 100 TB the unread nested columns are the bulk of
    the bytes."""
    p = _plan(queries["nested_prefilter_weight_brand"])
    import re

    items_schemas = [
        m.group(1)
        for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", p)
        if "brand" in m.group(1)
    ]
    assert items_schemas, "items scan not found in plan"
    for s in items_schemas:
        assert "color" not in s and "model_year" not in s and "country" not in s, s
    pushed = re.search(r"PushedFilters: \[([^\]]*)\].*brand", p)
    assert pushed and "IsNotNull" in pushed.group(1), p[:500]


def test_global_rank_filter_pushes_to_take_ordered(queries):
    """rn <= 1000 over a global row_number must rewrite to
    TakeOrderedAndProject feeding a 1000-row Window — never a
    corpus-sized single-partition Window."""
    p = _plan(queries["global_sort_orders"])
    assert "TakeOrderedAndProject" in p
    assert p.index("TakeOrderedAndProject") > p.index("Window")
