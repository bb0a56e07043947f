"""Model-inference/eval operators (operators/classify.py): nearest-
class-mean classifier, grouped ROC-AUC, hashed linear text scoring.

Covers the properties the sf0.01 oracle can't: hand-computed golden
values on tiny inputs and partition-invariance of the exact integer
arithmetic."""

import pytest
from pyspark.sql import functions as F

from geist_spark.operators.classify import (
    centroid_classify,
    confusion_matrix,
    grouped_auc,
    hashed_linear_score,
    linear_score_fx,
    train_label_centroids,
)


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


@pytest.fixture(scope="module")
def separated(spark):
    # two well-separated 4-dim clusters around (0,0,0,0) and (10,10,10,10)
    rows = []
    for i in range(6):
        d = i * 0.01
        rows.append((i, [0.0 + d, 0.1, 0.0, 0.2 + d], 0))
        rows.append((100 + i, [10.0 - d, 9.9, 10.0, 10.2 - d], 1))
    return _emb_df(spark, rows)


def test_centroid_classifier_perfect_on_separated(separated):
    cents = train_label_centroids(separated, dim=4)
    assert [lab for lab, _ in cents] == [0, 1]
    cm = confusion_matrix(centroid_classify(separated, cents)).collect()
    as_map = {(r["label"], r["predicted"]): r["n"] for r in cm}
    assert as_map == {(0, 0): 6, (1, 1): 6}


def test_centroid_training_partition_invariant(separated):
    c1 = train_label_centroids(separated, dim=4)
    c2 = train_label_centroids(separated.repartition(7), dim=4)
    assert c1 == c2  # exact long arithmetic: no float drift


def test_centroid_tie_breaks_to_lowest_label(spark):
    # identical centroids for labels 3 and 5 -> tie resolves to 3
    df = _emb_df(spark, [(0, [1.0, 1.0], 3), (1, [1.0, 1.0], 5)])
    cents = train_label_centroids(df, dim=2)
    out = centroid_classify(df, cents).collect()
    assert {r["predicted"] for r in out} == {3}


def test_grouped_auc_perfect_and_random(spark):
    # group 0: scores perfectly separate positives -> AUC 1.0
    # group 1: all scores tied -> AUC exactly 0.5
    rows = (
        [(0, s, 0) for s in (1, 2, 3)]
        + [(0, s, 1) for s in (10, 11, 12)]
        + [(1, 5, 0), (1, 5, 0), (1, 5, 1), (1, 5, 1)]
    )
    df = spark.createDataFrame(rows, "grp int, score long, is_pos int")
    out = {r["grp"]: r for r in grouped_auc(df).collect()}
    assert out[0]["auc"] == 1.0 and out[0]["n_pos"] == 3
    assert out[1]["auc"] == 0.5  # average-rank tie handling is exact


def test_grouped_auc_hand_computed_with_ties(spark):
    # scores: neg 1, pos 2, neg 2, pos 3
    # avg ranks: 1, 2.5, 2.5, 4 -> R+ = 6.5, U = 6.5 - 3 = 3.5, AUC = 3.5/4
    df = spark.createDataFrame(
        [(0, 1, 0), (0, 2, 1), (0, 2, 0), (0, 3, 1)],
        "grp int, score long, is_pos int",
    )
    r = grouped_auc(df).collect()[0]
    assert r["u2"] == 7 and r["auc"] == 3.5 / 4


def test_linear_score_partition_invariant(spark):
    df = _emb_df(
        spark,
        [(i, [0.1 * i, -0.2 * i, 0.3], i % 2) for i in range(20)],
    )
    w = [3, -5, 7]
    a = sorted(
        df.select("vec_id", linear_score_fx(F.col("embedding"), w).alias("s"))
        .collect()
    )
    b = sorted(
        df.repartition(9)
        .select("vec_id", linear_score_fx(F.col("embedding"), w).alias("s"))
        .collect()
    )
    assert a == b


def test_hashed_linear_score_shape_and_empty_doc(spark):
    docs = spark.createDataFrame(
        [(1, "spark makes scans fast"), (2, "   "), (3, "spark spark")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in hashed_linear_score(docs).collect()}
    assert out[2]["n_tokens"] == 0 and out[2]["score_fx"] == 0
    assert out[2]["predicted"] is False
    assert out[1]["n_tokens"] == 4
    # same token twice -> exactly double the single-token weight
    single = hashed_linear_score(
        spark.createDataFrame([(9, "spark")], "doc_id long, text string")
    ).collect()[0]
    assert out[3]["score_fx"] == 2 * single["score_fx"]


def test_knn_classify_majority_beats_nearest(spark):
    """The vote, not the single nearest neighbor, decides: query 0's
    closest vector has label 9 but two of its top-3 carry label 1; and
    vote ties break to the LOWEST label."""
    from geist_spark.operators.classify import knn_classify

    rows = [
        # query: unit-x
        (0, [1.0, 0.0], 1),
        # nearest (cos ~ .9998) with the odd label
        (1, [0.99, 0.02], 9),
        # two slightly farther with label 1
        (2, [0.97, 0.06], 1),
        (3, [0.96, 0.08], 1),
        # far away, other labels
        (4, [0.0, 1.0], 2),
        (5, [-1.0, 0.0], 3),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = knn_classify(df, query_ids=[0], k=3).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["pred_label"], r["n_votes"], r["correct"]) == (1, 2, 1)

    # tie: k=2 -> one vote each for labels 9 and 1 -> lowest label wins
    tie = knn_classify(df, query_ids=[0], k=2).collect()[0]
    assert tie["pred_label"] == 1 and tie["n_votes"] == 1


def test_matryoshka_recall_full_dim_is_perfect(spark):
    """Truncating to the FULL dimension must give recall 1.0 for every
    query (the degenerate sanity bound), and n_overlap is capped by k."""
    from geist_spark.operators.similarity import matryoshka_recall

    import hashlib

    def vec(i):
        h = hashlib.md5(str(i).encode()).digest()
        return [b / 255.0 - 0.5 for b in h[:8]]

    df = spark.createDataFrame(
        [(i, vec(i)) for i in range(30)], "vec_id long, embedding array<double>"
    )
    full = matryoshka_recall(df, query_ids=[0, 1, 2], k=5, trunc_dim=8)
    for r in full.collect():
        assert r["n_overlap"] == 5 and r["recall"] == 1.0

    part = matryoshka_recall(df, query_ids=[0, 1, 2], k=5, trunc_dim=2)
    for r in part.collect():
        assert 0 <= r["n_overlap"] <= 5
        assert r["recall"] == r["n_overlap"] / 5


# ---------------------------------------------------------- label noise


def test_label_noise_flags_planted_mislabel(spark):
    """A tight cluster of label 0 with ONE row labeled 1: the audit
    must flag exactly that row (its neighbors unanimously vote 0) and
    leave the correctly-labeled rows unflagged."""
    from geist_spark.operators.classify import label_noise_audit

    rows = []
    for i in range(8):
        d = i * 0.01
        rows.append((i, [1.0 + d, 0.0, 0.0, 0.0], 1 if i == 3 else 0))
    # far-away cluster with its own consistent label
    for i in range(4):
        rows.append((100 + i, [0.0, 9.0 + i * 0.01, 0.0, 0.0], 2))
    df = _emb_df(spark, rows)
    out = {
        r["vec_id"]: r
        for r in label_noise_audit(
            df, audit_ids=list(range(8)), k=5
        ).collect()
    }
    assert set(out) == set(range(8))
    assert out[3]["suspect"] == 1 and out[3]["pred_label"] == 0
    # the planted row's own label gets zero neighbor votes
    assert out[3]["n_votes_own"] == 0
    for i in set(range(8)) - {3}:
        assert out[i]["suspect"] == 0, i
        assert out[i]["pred_label"] == out[i]["label"]
        # own-label votes == winner votes when the row agrees
        assert out[i]["n_votes_own"] == out[i]["n_votes_pred"]


def test_label_noise_excludes_only_self(spark):
    """Audited rows stay in each OTHER's neighbor sets (leave-one-out,
    not panel-holdout): with a 3-row corpus and k=2, every audit row
    gets exactly 2 votes — its two peers."""
    from geist_spark.operators.classify import label_noise_audit

    df = _emb_df(
        spark,
        [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [1.0, 0.1], 0)],
    )
    out = label_noise_audit(df, audit_ids=[0, 1, 2], k=2).collect()
    assert len(out) == 3
    for r in out:
        assert r["n_votes_pred"] == 2 and r["suspect"] == 0
