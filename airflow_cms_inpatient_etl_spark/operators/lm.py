"""Model-based quality scoring: CCNet-style n-gram LM perplexity.

The reference pipeline family (CCNet, Wenzek et al. 2019) scores every
document with a language-model perplexity against a trusted reference corpus
and buckets the corpus into head/middle/tail quality terciles.  Re-expressed
Spark-first: the "model" is a bigram count table trained with one
shuffle over the reference slice, scoring is a broadcast join of that table
against each document's exploded bigrams, and the per-document log-prob sum
is a FIXED-ORDER fold (position order) so the score is bit-reproducible and
DuckDB-oracle-checkable — no external LM runtime, zero Python stages.

Scale shape (100 TB): training cost is one groupBy over the reference slice
(bounded — reference corpora are small relative to the corpus being scored);
the count tables are the broadcast side (CCNet's 5-gram models are a few GB;
a bigram table over a reference slice is far smaller — prune with min_count
if needed); scoring is scan → explode → two broadcast joins → per-doc
aggregation: one shuffle per scored corpus, no self-joins, no iteration.

Smoothing: add-one (Laplace) over the reference vocabulary with a single
OOV bucket — p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V) where c(w1) is the
history count and V = |vocab| + 1.  Unseen histories fall back to 1/V.
The score emitted is bits-per-token: -(Σ log2 p) / n_bigrams, the log-scale
perplexity (ppl = 2^bits) — monotone-equivalent and numerically tame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.operators.text import words


def exploded_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, w1, w2) rows — one per consecutive token pair, position
    1-based.  Position order is what makes the downstream log-prob fold
    deterministic.

    Formulation matters: arrays_zip over two ``slice``s of the token array
    evaluates the tokenizer ONCE per row.  The tempting alternative —
    ``transform(sequence(...), i -> element_at(w, i))`` — re-evaluates the
    whole regex split PER ELEMENT ACCESS (Catalyst does no intra-row CSE),
    i.e. O(tokens²) per document: measured 18× slower on the documents
    table.  Short documents (< 2 tokens) yield an empty zip and drop out.
    """
    w = words(F.col(text_col))
    n_pairs = F.greatest(F.size(w) - 1, F.lit(0))
    pairs = F.arrays_zip(F.slice(w, 1, n_pairs), F.slice(w, 2, n_pairs))
    return df.select(
        F.col(id_col), F.posexplode(pairs).alias("pos0", "bg")
    ).select(
        id_col,
        (F.col("pos0") + 1).cast("long").alias("pos"),
        F.col("bg.0").alias("w1"),
        F.col("bg.1").alias("w2"),
    )


def train_bigram_lm(
    ref: DataFrame, text_col: str = "text", min_count: int | None = None
) -> tuple[DataFrame, DataFrame, int]:
    """Train the count model over a reference corpus slice.

    Returns (bigram_counts(w1, w2, c2), history_counts(w1, c1), vocab) where
    vocab = |distinct reference tokens| + 1 (the +1 is the OOV bucket).
    ``vocab`` is ONE driver-side scalar — a model parameter, the same
    legitimate coordination pagerank uses for its node count.

    ``min_count`` prunes bigrams rarer than the floor from the model (the
    knob that keeps the broadcast side small for huge reference corpora);
    history counts are NOT pruned, so smoothed probabilities stay proper.
    """
    ref = ref.select(F.lit(0).alias("__rid"), F.col(text_col).alias("__text"))
    bg = exploded_bigrams(ref, "__rid", "__text")
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    if min_count is not None:
        c2 = c2.filter(F.col("c2") >= min_count)
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        ref.select(F.explode(words(F.col("__text"))).alias("tok")).distinct().count()
        + 1
    )
    return c2, c1, vocab


def score_bits_per_token(
    docs: DataFrame,
    c2: DataFrame,
    c1: DataFrame,
    vocab: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document LM score: (id, n_bigrams, bits_per_token).

    bits_per_token = -(Σ_pos log2 p(w2|w1)) / n_bigrams, summed in POSITION
    order via an ordered fold — bit-identical to an independent engine's
    LIST_REDUCE(LIST(logp ORDER BY pos)).  Documents with < 2 tokens get no
    row (callers left-join and decide).  Joins against the count tables are
    broadcast (the model is the small side by construction); the only
    shuffle is the per-document aggregation.  Final score rounded to 6
    decimals: the fold is order-pinned, but log2 itself may differ by an
    ulp across engines (same contract as the entropy scorer).
    """
    bg = exploded_bigrams(docs, id_col, text_col)
    scored = (
        bg.join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(c1), ["w1"], "left")
        .select(
            id_col,
            "pos",
            F.expr(
                f"LOG2((COALESCE(c2, 0) + 1.0) / (COALESCE(c1, 0) + {vocab}.0))"
            ).alias("logp"),
        )
    )
    folded = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "logp"))),
            F.lit(0.0),
            lambda acc, x: acc + x.getField("logp"),
        ).alias("logp_sum"),
    )
    return folded.select(
        id_col,
        "n_bigrams",
        F.round(-F.col("logp_sum") / F.col("n_bigrams"), 6).alias("bits_per_token"),
    )
