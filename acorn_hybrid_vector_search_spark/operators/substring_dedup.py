"""Cross-document duplicate n-gram SPAN removal (substring-level dedup).

Document-level dedup (operators/dedup.py) drops whole near-duplicate
documents; training corpora additionally need SUBSTRING-level dedup —
boilerplate headers, license blocks, templated sentences repeated across
otherwise-distinct documents (Lee et al., "Deduplicating Training Data
Makes Language Models Better", 2021, which uses suffix arrays for exact
repeated substrings). The standard distributed adaptation is n-gram
granular: mark every k-token gram whose corpus occurrence count is ≥ 2,
take the per-document union of the marked token intervals, and emit the
document with those spans cut out.

Plan shape (and why it scales to 100 TB):

1. tokenize ONCE (narrow map, materialized — the normalize+split corpus
   pass must not run per consumer) and keep the token ARRAY — the gram
   hashes are built JVM-side from ``slice`` + ``concat_ws`` + ``md5``
   inside one ``transform`` HOF, so no Python touches the hot path;
2. explode grams → (doc_id, pos, hash): O(total tokens) rows, the same
   row-scale as any inverted-index/TF-IDF build over the corpus — and
   the md5 pass over every gram is the expensive stage, so it runs
   exactly once;
3. duplicate marking is a partial-aggregating ``groupBy(hash).count()``
   joined back to the gram relation — NOT a window over the hash.
   Boilerplate grams (license blocks, templated headers) are power-law
   heavy hitters at web scale: a single gram can occur 10⁶–10⁹ times,
   and a ``Window.partitionBy(hash)`` puts every occurrence of the
   hottest key in ONE task with no mitigation path (AQE has no
   skew-splitting for window partitions). The groupBy's map-side
   combine means the count shuffle carries at most one row per hash
   per mapper regardless of key frequency, and the join-back is a
   shuffled hash join that AQE's ``OptimizeSkewedJoin`` can split
   across tasks;
4. interval union + text reassembly shuffle on doc_id: positions →
   ``collect_list`` → ``array_sort`` → ``concat_ws``, all codegen.

Total: two shuffle keys (hash, doc_id), no cartesian anything, no
driver-side state. A suffix-array build (the paper's exact method) is
inherently sequential over the concatenated corpus; at 100 TB the
n-gram relaxation is the standard trade (it can only over-mark, never
miss, a duplicated span ≥ k tokens; spans shorter than k are kept).

md5 is the gram key so DuckDB replays the whole pipeline bit-for-bit
(__spark_entry__.py ``dup_ngram_removal`` oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.functions.text import tokens as _tokens
from acorn_hybrid_vector_search_spark.operators._cache import materialize


def _tokenized(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token array), tokenized ONCE: the gram build, the token
    re-explode, and the per-doc counts all consume this relation, so it
    is materialized (the tokenize-once rule — at 100 TB the
    normalize+split pass over the corpus is the expensive stage and
    must not run per consumer)."""
    return materialize(df.select(id_col, _tokens(text_col).alias("t")))


def duplicate_ngram_spans(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
    _toks: DataFrame | None = None,
) -> DataFrame:
    """Occurrences of k-token grams whose corpus-wide count ≥ min_count.

    Returns (id_col, pos, h) — one row per duplicated-gram occurrence,
    ``pos`` the 0-based token offset.
    """
    toks = _toks if _toks is not None else _tokenized(df, text_col, id_col)
    n = F.size("t")
    # guard n < k: sequence(0, n-k) would DESCEND for negative bounds
    gram_hashes = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.md5(F.concat_ws(" ", F.slice("t", i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # Duplicate marking: partial-agg groupBy + join-back, NOT a window
    # over the raw gram hash. A window count buffers every occurrence
    # of a hash in one task — and boilerplate grams are exactly the
    # 10⁶–10⁹-occurrence heavy hitters at corpus scale, with no AQE
    # skew mitigation for window partitions. Here the count shuffle is
    # map-side combined (≤ one row per hash per mapper, key frequency
    # irrelevant), the dup-hash relation it produces holds one row per
    # DISTINCT duplicated hash (small relative to occurrences), and
    # the join back to the gram relation is a shuffled hash join AQE's
    # OptimizeSkewedJoin can split. The gram relation is materialized
    # so the expensive explode+md5 pass still runs exactly once across
    # both sides of the join.
    grams = materialize(
        toks.select(id_col, F.posexplode(gram_hashes).alias("pos", "h"))
    )
    dup_hashes = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("h")
    )
    return grams.join(dup_hashes, "h").select(id_col, "pos", "h")


def remove_duplicate_ngrams(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """The cleaned corpus: every token covered by a duplicated k-gram
    removed, remaining tokens rejoined in order.

    Output: (id_col, n_tokens, n_removed, cleaned) — ``cleaned`` is ''
    for a document whose every token sat under some duplicated gram.
    """
    toks = _tokenized(df, text_col, id_col)
    occ = duplicate_ngram_spans(
        df, text_col=text_col, id_col=id_col, k=k, min_count=min_count,
        _toks=toks,
    )
    removed = (
        occ.select(
            id_col,
            F.explode(F.sequence("pos", F.col("pos") + (k - 1))).alias("p"),
        )
        .distinct()
    )
    tokpos = toks.select(id_col, F.posexplode("t").alias("p", "tok"))
    kept = tokpos.join(removed, [id_col, "p"], "left_anti")
    cleaned = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("cleaned"),
    )
    base = toks.select(id_col, F.size("t").alias("n_tokens"))
    return (
        base.join(cleaned, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce("cleaned", F.lit("")).alias("cleaned"),
        )
    )
