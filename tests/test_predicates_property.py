"""Property-based predicate fidelity: Hypothesis generates random §2.3
queries; the Column built by build_predicate must agree row-for-row with
an independent Python evaluator on the ABO fixture. One Spark job per
example is too slow, so examples are batched: generate a LIST of queries,
evaluate all of them in one pass as computed boolean columns."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.functions.predicates import (
    abo_accessors,
    build_predicate,
)

_STRING_VALUES = ["Amazon", "AmazonBasics", "Rivet", "Multi", "Black", "IN", "US", "zzz", ""]
_NUMERIC_VALUES = [0, 1.95, 2, 2018, 2020, 9.99, -1]
_OPS = ["exact", "leq", "geq", "<", ">", "substring", "bogus_op"]

_attr_kind = {
    "brand": "string",
    "color": "string",
    "country": "string",
    "model_year": "numeric",
    "item_weight": "numeric",
}

_constraint = st.sampled_from(list(_attr_kind)).flatmap(
    lambda attr: st.tuples(
        st.just(attr),
        st.sampled_from(_OPS),
        st.sampled_from(
            _NUMERIC_VALUES if _attr_kind[attr] == "numeric" else _STRING_VALUES
        ),
    )
)

_query = st.lists(_constraint, min_size=1, max_size=3).map(
    lambda cs: {attr: [op, val] for attr, op, val in cs}
)


def _py_eval(row, q):
    """Independent §2.3 evaluator (mirrors the reference's strict rules)."""
    for attr, (op, value) in q.items():
        meta = row[attr]
        if attr == "country":
            if meta is None:
                return False
            v = meta
        else:
            if meta is None or len(meta) == 0:
                return False
            v = (
                meta[0]["normalized_value"]["value"]
                if attr == "item_weight"
                else meta[0]["value"]
            )
        kind = _attr_kind[attr]
        sup = {"exact", "leq", "geq", "<", ">"} if kind == "numeric" else {"exact", "substring"}
        if op not in sup:
            continue  # unsupported ⇒ constraint ignored (presence still applied)
        if op == "exact" and not v == value:
            return False
        if op == "leq" and not v <= value:
            return False
        if op == "geq" and not v >= value:
            return False
        if op == "<" and not v < value:
            return False
        if op == ">" and not v > value:
            return False
        if op == "substring" and value not in v:
            return False
    return True


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(queries=st.lists(_query, min_size=1, max_size=8))
def test_predicate_builder_agrees_with_python(items_df, items_rows, queries):
    acc = abo_accessors()
    cols = [
        build_predicate(q, acc).alias(f"q{i}") for i, q in enumerate(queries)
    ]
    got = items_df.select(F.col("item_id"), *cols).collect()
    for r in got:
        row = items_rows[r["item_id"]]
        for i, q in enumerate(queries):
            want = _py_eval(row, q)
            have = bool(r[f"q{i}"]) if r[f"q{i}"] is not None else False
            assert have == want, f"query {q} disagreed on item {r['item_id']}"
