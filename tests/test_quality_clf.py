"""Multinomial-NB quality classifier (operators/quality_clf.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from webcrawler_go_spark.operators.quality_clf import nb_quality_scores


def _corpus(spark):
    """Train rows 0-5 carry clean class signal; rows 6-7 are held out;
    row 8 is all-unseen vocabulary; row 9 is empty."""
    rows = [
        (0, "clean prose clean article", True, True),
        (1, "clean article prose", True, True),
        (2, "prose article clean clean", True, True),
        (3, "spam casino spam pills", False, True),
        (4, "casino pills spam", False, True),
        (5, "pills spam casino casino", False, True),
        (6, "clean prose article article", True, False),   # held-out positive
        (7, "casino spam pills pills", False, False),      # held-out negative
        (8, "zebra quark", False, False),                  # unseen tokens only
        (9, "", False, True),                              # empty text
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, label boolean, train boolean"
    )


def _scores(spark):
    return {
        r["doc_id"]: r
        for r in nb_quality_scores(
            _corpus(spark), label_pred=F.col("label"), train_pred=F.col("train")
        ).collect()
    }


def test_held_out_classification(spark):
    out = _scores(spark)
    assert out[6]["predicted"] and not out[6]["in_train"]
    assert not out[7]["predicted"] and not out[7]["in_train"]
    assert out[6]["score_milli"] > 0 > out[7]["score_milli"]


def test_train_rows_separate(spark):
    out = _scores(spark)
    for i in (0, 1, 2):
        assert out[i]["predicted"], i
    for i in (3, 4, 5):
        assert not out[i]["predicted"], i


def test_unseen_and_empty_edges(spark):
    out = _scores(spark)
    # all-unseen doc: score = prior + n_tokens·unseen_weight; with the
    # balanced corpus here t_pos=11, t_neg=11, V=6 → unseen weight 0,
    # prior = floor(1000·ln(3/4)) = -288
    prior = math.floor(1000 * math.log(3 / 4))
    assert out[8]["n_tokens"] == 2 and out[8]["score_milli"] == prior
    # empty doc: no tokens, score is exactly the prior
    assert out[9]["n_tokens"] == 0 and out[9]["score_milli"] == prior


def test_golden_token_weight(spark):
    """Train counts: clean 5×/0×, prose 3×/0×, article 3×/0× (pos/neg);
    class totals tie (T⁺=T⁻=11, V=6) so the smoothing factor is 1 and
    w(n⁺,n⁻) = floor(1000·ln((n⁺+1)/(n⁻+1))); doc 6 =
    prior + w(clean) + w(prose) + 2·w(article)."""
    out = _scores(spark)
    w = lambda np_, nn_: math.floor(1000 * math.log((np_ + 1) / (nn_ + 1)))
    prior = math.floor(1000 * math.log(3 / 4))
    assert out[6]["score_milli"] == prior + w(5, 0) + w(3, 0) + 2 * w(3, 0)
