"""Corpus unigram-LM quality scoring — the statistical text-quality
filter (CCNet-style) that complements the heuristic signals in
functions/text.py.

A document whose tokens are improbable under the corpus' own unigram
distribution is OOV-heavy, garbled, or foreign to the corpus — the
classic cheap LM filter used to rank/prune web-scale training data
(perplexity filtering with the simplest possible LM). Not in the
reference (no text analysis at all, SURVEY.md §2.1); charter extension.

Plan shape at 100 TB:
- tokenize + explode ONCE (codegen, no Python; pinned — both the count
  aggregate and the join probe read the materialized token relation),
- token→count aggregation (one shuffle on token, map-side partial),
- score join token→count: SHUFFLE join co-partitioned on token — the
  vocabulary of a web corpus is itself huge, so broadcasting it is
  wrong; both sides arrive token-partitioned from the same exchange,
- per-doc aggregation (one shuffle on doc_id).
  The 1-row (total, vocab) relation rides along as a broadcast.

Determinism contract (the oracle gate hashes 6-dp values): each token's
log10-prob is rounded to 12 dp and summed as DECIMAL(28,12) — exact,
order-free addition in both engines — so the only cross-engine wiggle
is a ≤1-ulp libm log10 difference per token, bounded far below the
final 6-dp rounding. A raw double sum would be partial-aggregation-
order-dependent run to run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.functions.text import normalize_text, tokens
from acorn_hybrid_vector_search_spark.operators._cache import materialize

__all__ = ["bigram_logprob_scores", "unigram_logprob_scores"]


def unigram_logprob_scores(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean token log10-probability under the corpus'
    add-``alpha``-smoothed unigram LM:

        p(tok) = (count(tok) + α) / (total_tokens + α·|vocab|)
        score(doc) = mean over its tokens of log10 p(tok)

    Output: (id_col, n_tokens BIGINT, mean_logprob DOUBLE 6dp). Docs with
    zero tokens after normalization carry no distribution mass and are
    omitted (consistent in the SQL oracle). Higher is more typical of
    the corpus; rank ascending to surface junk."""
    # The tokenized/exploded corpus feeds BOTH the count aggregate and
    # the probe side of the token join; without pinning it the most
    # expensive stage (normalize+tokenize+explode of the whole corpus)
    # runs twice per query (round-3 advisor finding). Materialized once —
    # at pipeline scale this relation is the tokens intermediate table.
    toks = materialize(
        docs.where(F.length(normalize_text(text_col)) > 0).select(
            id_col, F.explode(tokens(text_col)).alias("tok")
        )
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    stats = F.broadcast(
        counts.agg(
            F.sum("cnt").cast("double").alias("_total"),
            F.count(F.lit(1)).cast("double").alias("_vocab"),
        )
    )
    logp = F.round(
        F.log10((F.col("cnt") + F.lit(alpha)) / (F.col("_total") + F.lit(alpha) * F.col("_vocab"))),
        12,
    ).cast("decimal(28,12)")
    return (
        toks.join(counts, "tok")
        .crossJoin(stats)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                (F.sum(logp).cast("double") / F.count(F.lit(1))), 6
            ).alias("mean_logprob"),
        )
    )


def bigram_logprob_scores(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    lam: float = 0.7,
) -> DataFrame:
    """Per-document mean transition log10-probability under the corpus'
    own INTERPOLATED BIGRAM LM — one rung up the perplexity-filter
    ladder from ``unigram_logprob_scores`` (CCNet uses a 5-gram LM; the
    bigram captures the word-order signal the unigram is blind to, e.g.
    shuffled-token junk scores high under the unigram but low here):

        p(cur | prev) = λ·(c(prev,cur)+α)/(c(prev)+α·|V|)
                      + (1−λ)·(c(cur)+α)/(total+α·|V|)
        score(doc) = mean over transitions of log10 p

    Output: (id_col, n_transitions BIGINT, mean_logprob DOUBLE 6dp);
    docs with < 2 tokens have no transitions and are omitted.

    Plan shape at 100 TB: the TRANSITION relation (doc_id, prev, cur)
    is materialized once (arrays_zip of two slices — all codegen, no
    Python) and feeds the bigram-count aggregate AND the probe; counts
    join back shuffle-co-partitioned on their keys exactly like the
    unigram plan (vocab/bigram tables are corpus-scaled — never
    broadcast); the 1-row totals relation broadcasts. Per-token
    log10 rounded to 12 dp and summed as DECIMAL(28,12): exact
    order-free addition, so the oracle hash is stable (same contract
    as the unigram scorer).
    """
    t = tokens(text_col)
    n = F.size(t)
    pairs_col = F.arrays_zip(
        F.slice(t, 1, n - 1).alias("prev"), F.slice(t, 2, n - 1).alias("cur")
    )
    trans = materialize(
        docs.where(F.size(tokens(text_col)) >= 2).select(
            id_col, F.explode(pairs_col).alias("p")
        ).select(id_col, F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
    )
    bi = trans.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("bcnt"))
    # unigram stats over the FULL token stream (not just transition
    # endpoints): same distribution the unigram scorer uses
    toks = materialize(
        docs.where(F.length(normalize_text(text_col)) > 0).select(
            id_col, F.explode(tokens(text_col)).alias("tok")
        )
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("ucnt"))
    stats = F.broadcast(
        uni.agg(
            F.sum("ucnt").cast("double").alias("_total"),
            F.count(F.lit(1)).cast("double").alias("_vocab"),
        )
    )
    a, l_ = F.lit(alpha), F.lit(lam)
    p_bi = (F.col("bcnt") + a) / (F.col("_prevcnt") + a * F.col("_vocab"))
    p_uni = (F.col("_curcnt") + a) / (F.col("_total") + a * F.col("_vocab"))
    logp = F.round(F.log10(l_ * p_bi + (F.lit(1.0) - l_) * p_uni), 12).cast(
        "decimal(28,12)"
    )
    return (
        trans.join(bi, ["prev", "cur"])
        .join(uni.select(F.col("tok").alias("prev"), F.col("ucnt").alias("_prevcnt")), "prev")
        .join(uni.select(F.col("tok").alias("cur"), F.col("ucnt").alias("_curcnt")), "cur")
        .crossJoin(stats)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.round(
                F.sum(logp).cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_logprob"),
        )
    )
