"""Table-driven tests of the §2.3 predicate matrix (SURVEY.md), validated
against a pure-Python re-implementation of the reference's declared
semantics run over the same fixture rows."""

from __future__ import annotations

import pytest

from acorn_hybrid_vector_search_spark.functions.predicates import (
    abo_accessors,
    build_predicate,
    flat_accessors,
)
from tests.conftest import make_items_rows

CASES = [
    # (name, predicate dict)
    ("empty", {}),
    ("brand_substring", {"brand": ["substring", "Amazon"]}),
    ("brand_exact", {"brand": ["exact", "AmazonBasics"]}),
    ("color_substring_case", {"color": ["substring", "Multicolor"]}),  # not 'multi-colored'
    ("country_exact", {"country": ["exact", "IN"]}),
    ("country_substring", {"country": ["substring", "I"]}),  # documented deviation: supported
    ("weight_lt", {"item_weight": ["<", 2]}),
    ("weight_leq", {"item_weight": ["leq", 2]}),
    ("weight_geq", {"item_weight": ["geq", 5]}),
    ("weight_exact", {"item_weight": ["exact", 1.5]}),
    ("year_leq", {"model_year": ["leq", 2018]}),
    ("year_gt", {"model_year": [">", 2015]}),
    ("class2_conj", {"item_weight": ["<", 2], "brand": ["substring", "Amazon"]}),
    ("class3_sparse", {"model_year": ["leq", 2018], "color": ["substring", "Multicolor"]}),
    # unsupported (attr, op) ⇒ op ignored, presence still required
    ("brand_leq_ignored", {"brand": ["leq", 5]}),
    ("weight_substring_ignored", {"item_weight": ["substring", "x"]}),
    ("bogus_op_ignored", {"color": ["frobnicate", "Black"]}),
]


def _py_matches(row: dict, q: dict) -> bool:
    """The reference's declared semantics (strict missing-attr rejection,
    first-element-only, normalized pounds, case-sensitive substring)."""
    for attr, (op, val) in q.items():
        v = row.get(attr)
        if v is None or (isinstance(v, list) and len(v) == 0):
            return False
        if attr in ("brand", "color"):
            first = v[0]["value"]
            if op == "exact" and not (first == val):
                return False
            if op == "substring" and val not in first:
                return False
        elif attr == "model_year":
            first = v[0]["value"]
            if op == "exact" and not (first == val):
                return False
            if op == "leq" and not (first <= val):
                return False
            if op == "geq" and not (first >= val):
                return False
            if op == "<" and not (first < val):
                return False
            if op == ">" and not (first > val):
                return False
        elif attr == "item_weight":
            first = v[0]["normalized_value"]["value"]
            if op == "exact" and not (first == val):
                return False
            if op == "leq" and not (first <= val):
                return False
            if op == "geq" and not (first >= val):
                return False
            if op == "<" and not (first < val):
                return False
            if op == ">" and not (first > val):
                return False
        elif attr == "country":
            if op == "exact" and not (v == val):
                return False
            if op == "substring" and val not in v:
                return False
    return True


@pytest.mark.parametrize("name,q", CASES, ids=[c[0] for c in CASES])
def test_matrix_vs_python_oracle(items_df, name, q):
    got = {
        r["item_id"]
        for r in items_df.filter(build_predicate(q, abo_accessors())).select("item_id").collect()
    }
    exp = {row["item_id"] for row in make_items_rows() if _py_matches(row, q)}
    assert got == exp, f"{name}: spark={len(got)} python={len(exp)}"
    # sanity: the core cases must be non-degenerate (select some, reject some)
    if name in ("brand_substring", "country_exact", "weight_lt", "year_leq",
                "class2_conj", "brand_leq_ignored"):
        assert 0 < len(exp) < 200


def test_first_element_only(spark):
    """Second array element must never satisfy a constraint ([0]-only)."""
    from acorn_hybrid_vector_search_spark.schemas import ITEMS_SCHEMA

    rows = [
        {
            "item_id": 1,
            "filename": "a.jpg",
            "brand": [
                {"language_tag": "en", "value": "Nope"},
                {"language_tag": "en", "value": "AmazonBasics"},
            ],
            "color": None,
            "item_weight": None,
            "model_year": None,
            "country": "US",
        }
    ]
    df = spark.createDataFrame(rows, schema=ITEMS_SCHEMA)
    got = df.filter(
        build_predicate({"brand": ["substring", "Amazon"]}, abo_accessors())
    ).count()
    assert got == 0


def test_missing_attribute_rejects_even_with_ignored_op(items_df):
    """Rows lacking model_year must be rejected even when the op is bogus."""
    n_with = items_df.filter("model_year IS NOT NULL AND size(model_year) > 0").count()
    got = items_df.filter(
        build_predicate({"model_year": ["frobnicate", 0]}, abo_accessors())
    ).count()
    assert got == n_with
    assert 0 < n_with < 50  # sparse attribute (~3%)


def test_unknown_attribute_raises(items_df):
    with pytest.raises(ValueError):
        build_predicate({"nonexistent": ["exact", 1]}, abo_accessors())


def test_flat_accessors_infer_types(embeddings_df):
    acc = flat_accessors(embeddings_df)
    assert acc["label"].kind == "numeric"
    got = embeddings_df.filter(build_predicate({"label": ["exact", 3]}, acc)).count()
    assert got == embeddings_df.filter("label = 3").count() > 0


@pytest.mark.parametrize("name,q", CASES, ids=[f"x_{c[0]}" for c in CASES])
def test_extracted_payloads_decision_equivalent(items_df, name, q):
    """r8b covering-index extraction: for every §2.3 case, filtering on
    the FLAT extracted columns (extract_attribute_payloads) selects
    exactly the rows the nested predicate selects — the contract that
    lets an index store extracted payloads and serve nested semantics."""
    from acorn_hybrid_vector_search_spark.functions.predicates import (
        extract_attribute_payloads,
    )

    acc = abo_accessors()
    cols, flat = extract_attribute_payloads(acc, prefix="_v_")
    flat_df = items_df.select(
        "item_id", *(c.alias(n) for n, c in cols.items())
    )
    nested = {
        r["item_id"]
        for r in items_df.filter(build_predicate(q, acc))
        .select("item_id")
        .collect()
    }
    extracted = {
        r["item_id"]
        for r in flat_df.filter(build_predicate(q, flat))
        .select("item_id")
        .collect()
    }
    assert nested == extracted, name


def test_extracted_payloads_presence_only_with_null_value(spark):
    """r8 ADVICE: a row whose attribute is PRESENT but whose value is
    NULL passes the nested acc.present conjunct under a presence-only
    constraint (unsupported-op fallthrough) — the flat extracted
    accessors must agree, which requires the stored ``__present``
    boolean (value-isNotNull presence would wrongly reject the row).
    Also pins that a VALUE constraint still rejects it on both paths
    (NULL value under a comparison is SQL-NULL → filtered)."""
    from acorn_hybrid_vector_search_spark.functions.predicates import (
        extract_attribute_payloads,
    )
    from acorn_hybrid_vector_search_spark.schemas import ITEMS_SCHEMA

    rows = [
        {  # brand present, value NULL — the ADVICE row
            "item_id": 1,
            "filename": "a.jpg",
            "brand": [{"language_tag": "en", "value": None}],
            "color": None, "item_weight": None, "model_year": None,
            "country": "US",
        },
        {  # brand present with a real value
            "item_id": 2,
            "filename": "b.jpg",
            "brand": [{"language_tag": "en", "value": "AmazonBasics"}],
            "color": None, "item_weight": None, "model_year": None,
            "country": "US",
        },
        {  # brand absent
            "item_id": 3,
            "filename": "c.jpg",
            "brand": None,
            "color": None, "item_weight": None, "model_year": None,
            "country": "US",
        },
    ]
    df = spark.createDataFrame(rows, schema=ITEMS_SCHEMA)
    acc = abo_accessors()
    cols, flat = extract_attribute_payloads(acc, prefix="_v_")
    flat_df = df.select("item_id", *(c.alias(n) for n, c in cols.items()))
    for q, expect in [
        ({"brand": ["frobnicate", 0]}, {1, 2}),  # presence-only keeps NULL-value row
        ({"brand": ["substring", "Amazon"]}, {2}),  # value constraint rejects it
    ]:
        nested = {
            r["item_id"]
            for r in df.filter(build_predicate(q, acc)).select("item_id").collect()
        }
        extracted = {
            r["item_id"]
            for r in flat_df.filter(build_predicate(q, flat))
            .select("item_id")
            .collect()
        }
        assert nested == expect, q
        assert extracted == expect, q
