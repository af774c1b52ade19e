"""Trained quality classifier for corpus filtering (multinomial NB).

The third classic curation filter alongside the bigram-LM perplexity
scorer (`retrieval.bigram_lm_scores`) and DSIR importance resampling
(`dsir.dsir_importance`): GPT-3 (Brown et al. 2020, Appendix A) and
CCNet (Wenzek et al. 2020) keep web documents that a classifier —
trained to distinguish a curated corpus from raw crawl — scores as
curated-like. The published linear classifier over token features is
exactly a log-linear score; multinomial Naive Bayes with add-one
smoothing IS that shape with closed-form training — two groupBys
instead of SGD — which keeps every step a DataFrame aggregation and
the whole program exactly SQL-expressible for the oracle.

Score of document d with token instances t₁..tₙ:

    score(d) = ln(N⁺/N⁻) + Σᵢ ln( P(tᵢ|+) / P(tᵢ|−) )

with P(t|c) = (count(t,c)+1)/(T_c+V) over the TRAIN split only; V is
the train vocabulary size, T_c the class token total. Integer
fixed-point (millinats, the module convention) so sums are exact
BIGINTs: per-token weight = floor(1000·ln(((n⁺+1)·(T⁻+V)) /
((n⁻+1)·(T⁺+V)))); tokens unseen in training get the same formula at
n⁺=n⁻=0 (a constant). predicted = score ≥ 0.

Plan shape at scale: one token-instance shuffle to train the model
(groupBy token), one token⋈model join keyed on the token string (at
100 TB swap for hashed feature buckets → broadcast, the DSIR trade),
one per-doc sum. Class totals are a 1-row aggregate → driver literals,
the bigram-LM/DSIR precedent.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nb_quality_scores(
    docs: DataFrame,
    label_pred: Column,
    train_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train on the ``train_pred`` split, score EVERY document.

    ``label_pred`` marks curated-like positives (the class the filter
    keeps); ``train_pred`` marks the training split — evaluation rows
    outside it are the honest held-out measure. Returns one row per
    document:

    ``(doc_id, is_positive, in_train, n_tokens, score_milli, predicted)``
    """
    from webcrawler_go_spark.operators.textanalysis import word_tokens

    d = docs.select(
        F.col(id_col),
        F.col(text_col),
        label_pred.alias("is_positive"),
        train_pred.alias("in_train"),
    )
    toks = d.select(
        id_col,
        "is_positive",
        "in_train",
        F.explode(F.array_remove(word_tokens(F.col(text_col)), "")).alias("token"),
    )
    train = toks.filter(F.col("in_train"))
    model = train.groupBy("token").agg(
        F.sum(F.when(F.col("is_positive"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("is_positive"), 0).otherwise(1)).alias("n_neg"),
    )
    # class token totals + vocab size + doc-count prior: tiny aggregates
    # → driver literals (cached in production), keeping the scoring join
    # a single map-side expression over the model
    tot = model.agg(
        F.sum("n_pos").alias("tp"),
        F.sum("n_neg").alias("tn"),
        F.count(F.lit(1)).alias("v"),
    ).first()
    t_pos, t_neg, vocab = int(tot["tp"] or 0), int(tot["tn"] or 0), int(tot["v"])
    nd = d.groupBy().agg(
        F.sum(F.when(F.col("is_positive") & F.col("in_train"), 1).otherwise(0)),
        F.sum(F.when(~F.col("is_positive") & F.col("in_train"), 1).otherwise(0)),
    ).first()
    n_pos_docs, n_neg_docs = int(nd[0] or 0), int(nd[1] or 0)
    if n_pos_docs == 0 or n_neg_docs == 0:
        # a single-class train split has no log-odds prior; fail loudly
        # rather than with ZeroDivisionError / math domain error
        raise ValueError(
            "quality classifier needs both classes in the train split "
            f"(got n_pos_docs={n_pos_docs}, n_neg_docs={n_neg_docs})"
        )
    # NOTE on float portability: ln() on data-dependent values is not
    # bit-portable across libms (1-ulp divergence possible; see
    # sketches.py). The floor(1000*ln(...)) fixed-point here follows the
    # documented tfidf convention — accepted, with the boundary risk
    # carried knowingly (a flip needs a value within 1 ulp of an exact
    # millinat boundary, measure-zero for real corpora).
    prior_milli = math.floor(1000.0 * math.log(n_pos_docs / n_neg_docs))
    # weight at n_pos=n_neg=0 — what any token unseen in training earns
    unseen_milli = math.floor(
        1000.0 * math.log((t_neg + vocab) / (t_pos + vocab))
    )

    weights = model.select(
        "token",
        F.floor(
            1000.0
            * F.log(
                ((F.col("n_pos") + 1).cast("double") * F.lit(float(t_neg + vocab)))
                / ((F.col("n_neg") + 1).cast("double") * F.lit(float(t_pos + vocab)))
            )
        ).alias("w_milli"),
    )
    per_doc = (
        toks.join(weights, "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce("w_milli", F.lit(unseen_milli))).alias("_tok_sum"),
        )
    )
    score = (F.lit(prior_milli) + F.coalesce("_tok_sum", F.lit(0))).cast("long")
    return (
        d.select(id_col, "is_positive", "in_train")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "is_positive",
            "in_train",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            score.alias("score_milli"),
            (score >= 0).alias("predicted"),
        )
    )
