"""Distributed model inference + evaluation operators.

A 100 TB training-data pipeline doesn't only filter and dedup — it
scores every document/embedding with small models (quality
classifiers, linear probes) and evaluates them with rank metrics. The
reference engine has no model surface at all (its transforms are
single-event, entity/transform/transformer.go:43-84); these operators
supply the Spark-native pattern for it:

- the MODEL is tiny (a weight vector, per-class centroids, a hashed
  linear head) and lives driver-side / as literals or a broadcast;
- the DATA is huge and is scored in a map-only pass — no shuffle, no
  Python, whole-stage codegen end to end;
- evaluation (confusion matrix, grouped ROC-AUC) is one aggregation.

Determinism: all arithmetic is fixed-point/integer (same FX scheme as
similarity.train_ivf_centroids), so results are bit-identical at any
partition count and replayable exactly in the DuckDB oracles.

Scale notes per operator are in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from geist_spark.functions.litx import long_array
from geist_spark.operators.dedup import tokens
from geist_spark.operators.similarity import FX_SCALE, _fx


def train_label_centroids(
    embeddings: DataFrame,
    dim: int,
    value_col: str = "embedding",
    label_col: str = "label",
) -> list[tuple[int, list[int]]]:
    """Per-label mean centroid in fixed point (floor(x*2^20) longs,
    floored mean) — the training half of a nearest-class-mean
    classifier.

    Plan: ONE groupBy(label) with per-dim long sums (map-side partial
    agg), k rows to the driver. At 100 TB that is a single scan + a
    k-row shuffle — the canonical "tiny model from huge data" shape.
    Exact long arithmetic: bit-identical at any parallelism.

    Returns [(label, [dim longs])] sorted by label.
    """
    stats = (
        embeddings.select(
            F.col(label_col).alias("label"), _fx(F.col(value_col)).alias("fx")
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            *[F.sum(F.col("fx")[i]).alias(f"s{i}") for i in range(dim)],
        )
        .collect()
    )

    def fdiv(s: int, c: int) -> int:  # floor division, like the k-means update
        return int(s) // int(c)

    return sorted(
        (int(r["label"]), [fdiv(r[f"s{i}"], r["cnt"]) for i in range(dim)])
        for r in stats
    )


def centroid_classify(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[int]]],
    value_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-class-mean inference: assign every vector to the label
    of the closest centroid (squared L2 in fixed point; tie -> lowest
    label).

    Map-only over centroid LITERALS (k*dim longs inside the generated
    code): zero shuffle, zero Python — inference cost is a linear scan.
    For k beyond a few hundred classes swap the literal for a broadcast
    join (same plan shape as similarity.ivf_topk).

    Returns (vec_id, <label_col>, predicted, sq_dist).
    """
    # whole centroid table as ONE expr literal (functions/litx.py):
    # per-element F.lit would cost k*(dim+1) py4j round trips; the
    # BIGINT spelling comes from litx._longs so it cannot diverge from
    # the other literal-table operators
    from geist_spark.functions.litx import _longs

    cent_lit = F.expr(
        "array("
        + ",".join(
            f"named_struct('c', {_longs(c)}, 'lab', {int(lab)})"
            for lab, c in centroids
        )
        + ")"
    )
    fxd = embeddings.select(
        "vec_id", F.col(label_col), _fx(F.col(value_col)).alias("fx")
    )
    scores = F.transform(
        cent_lit,
        lambda s: F.struct(
            F.aggregate(
                F.zip_with(F.col("fx"), s["c"], lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
            s["lab"].alias("lab"),
        ),
    )
    m = F.array_min(scores)  # lexicographic: min dist, then min label
    return fxd.select(
        "vec_id",
        label_col,
        m["lab"].alias("predicted"),
        m["d"].alias("sq_dist"),
    )


def confusion_matrix(
    assigned: DataFrame, label_col: str = "label", pred_col: str = "predicted"
) -> DataFrame:
    """(label, predicted, n) counts — one k^2-row aggregation."""
    return (
        assigned.groupBy(label_col, pred_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def linear_score_fx(emb_col: F.Column, weights: list[int]) -> F.Column:
    """Integer linear probe: dot(fixed-point(embedding), weights) as a
    long. Weights are literals (a trained probe head is a few hundred
    ints); all-long arithmetic makes the score exact and
    order-independent, so downstream rank metrics are deterministic."""
    w = long_array(weights)
    return F.aggregate(
        F.zip_with(_fx(emb_col), w, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def grouped_auc(
    scored: DataFrame,
    group_col: str = "grp",
    label_col: str = "is_pos",
    score_col: str = "score",
) -> DataFrame:
    """Exact grouped ROC-AUC via the Mann-Whitney rank-sum statistic
    with average-rank tie handling.

    AUC = (R+ - P(P+1)/2) / (P*N) where R+ is the positives' rank sum.
    Everything up to the final division is integer (scores are exact
    longs): avg_rank*2 = 2*min_rank + (ties-1), u2 = 2*R+ - P(P+1),
    auc = u2 / (2*P*N) — ONE IEEE division on exact longs, so the
    result is bit-identical across engines and partitionings.

    Plan: two window passes over one shuffle on group_col, then a
    per-group aggregation — rank metrics over any corpus size with a
    single data movement. Output: (grp, n_pos, n_neg, u2, auc).
    """
    w_rank = Window.partitionBy(group_col).orderBy(score_col)
    w_tie = Window.partitionBy(group_col, score_col)
    ranked = scored.select(
        group_col,
        label_col,
        (
            F.lit(2) * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_tie)
            - F.lit(1)
        ).cast("long").alias("avg_rank2"),
    )
    pos = F.col(label_col).cast("long")
    agg = ranked.groupBy(group_col).agg(
        F.sum(pos).alias("n_pos"),
        F.sum(F.lit(1) - pos).alias("n_neg"),
        F.sum(pos * F.col("avg_rank2")).alias("r2_pos"),
    )
    u2 = F.col("r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    return agg.select(
        group_col,
        "n_pos",
        "n_neg",
        u2.alias("u2"),
        (
            u2.cast("double")
            / (F.lit(2) * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
    )


def hashed_linear_score(
    documents: DataFrame,
    num_buckets: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """fastText-style hashed bag-of-tokens linear classifier inference:
    token -> hash bucket -> integer weight, document score = sum of
    token weights.

    The weight table here is DERIVED from the bucket id
    (md5-pseudo-random ints in [-1000, 1000]) — a deterministic
    stand-in for a trained head; swapping in real trained weights is a
    broadcast join on `bucket` with the identical plan. Inference is
    tokenize + per-token md5 + one aggregate per row: map-only, zero
    shuffle, whole-stage codegen — the shape that scores 100 TB at
    scan speed. (fastText: Joulin et al. 2016, "Bag of Tricks for
    Efficient Text Classification" — hashing trick per
    Weinberger et al. 2009.)

    Returns (doc_id, n_tokens, score_fx, predicted) with all-integer
    score (exact, engine-independent).
    """
    toks = documents.select(
        "doc_id", tokens(F.col(text_col)).alias("toks")
    )
    bucket = lambda t: (
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        % num_buckets
    )
    weight = lambda t: (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("w|"), bucket(t).cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 2001
        - 1000
    )
    score = F.aggregate(
        F.filter(F.col("toks"), lambda t: t != F.lit("")),
        F.lit(0).cast("long"),
        lambda acc, t: acc + weight(t),
    )
    return toks.select(
        "doc_id",
        F.size(F.filter(F.col("toks"), lambda t: t != F.lit(""))).alias(
            "n_tokens"
        ),
        score.alias("score_fx"),
        (score > 0).alias("predicted"),
    )


def weak_label(
    df: DataFrame,
    rules: list[tuple[str, Column, str]],
    abstain: str = "abstain",
) -> DataFrame:
    """Snorkel-style weak supervision: apply N labeling functions
    (each a boolean Column expression voting for a label, or
    abstaining when false) and resolve by majority vote —
    deterministic tiebreak on label name, `abstain` when nothing
    fires or the vote ties across different labels... the standard
    programmatic-labeling pass that bootstraps classifier training
    sets from rules at corpus scale.

    rules: [(rule_name, predicate_column, label)].

    Everything compiles to conditional expressions in ONE projection —
    no shuffle, no Python, adding a rule adds a column not a pass —
    then a per-row argmax over the (tiny, fixed) label set. Output:
    input columns + weak_label + n_votes + per-rule vote flags
    (`lf_<rule_name>`), the audit trail label-model training reads.
    """
    if not rules:
        raise ValueError("need at least one labeling rule")
    labels = sorted({lab for _, _, lab in rules})
    out = df
    for name, pred, _lab in rules:
        out = out.withColumn(f"lf_{name}", pred.cast("boolean"))
    # votes per label: sum of fired rules voting for it
    per_label = [
        sum(
            (F.col(f"lf_{name}").cast("int") for name, _p, lab2 in rules if lab2 == lab),
            F.lit(0),
        ).alias(f"__votes_{lab}")
        for lab in labels
    ]
    out = out.select("*", *per_label)
    best = F.greatest(*[F.col(f"__votes_{lab}") for lab in labels])
    # winner = lexicographically FIRST label reaching the max vote
    # count (deterministic); ties between DIFFERENT labels with equal
    # max votes resolve to that first label only if unique, else the
    # tie stands — detect ties by counting labels at max
    n_at_max = sum(
        ((F.col(f"__votes_{lab}") == best).cast("int") for lab in labels),
        F.lit(0),
    )
    winner = F.lit(abstain)
    for lab in reversed(labels):
        winner = F.when(F.col(f"__votes_{lab}") == best, F.lit(lab)).otherwise(
            winner
        )
    label = (
        F.when(best <= 0, F.lit(abstain))
        .when(n_at_max > 1, F.lit(abstain))
        .otherwise(winner)
    )
    out = out.withColumn("weak_label", label).withColumn(
        "n_votes", best.cast("int")
    )
    return out.drop(*[f"__votes_{lab}" for lab in labels])


def calibration_bins(
    scored: DataFrame,
    n_bins: int = 10,
    score_col: str = "score",
    label_col: str = "is_pos",
) -> DataFrame:
    """Reliability-diagram data: fixed-width score bins with per-bin
    count, positives, and positive rate — the calibration readout next
    to grouped_auc's ranking readout.

    Deliberately NOT equal-count (ntile) bins: a global ntile is a
    single-partition sort of every row — the exact anti-pattern the
    window-spec validator refuses. Fixed-width binning is a 1-row
    min/max aggregate broadcast back plus a map-side bin expression
    and ONE groupBy(bin): the same cost as any histogram at 100 TB.
    Bin ids are exact integer arithmetic ((score-lo)*n // span), so
    the oracle replays them bit-for-bit; pos_rate is one int/int
    double division.
    """
    rng = scored.agg(
        F.min(score_col).alias("__lo"), F.max(score_col).alias("__hi")
    )
    span = F.col("__hi") - F.col("__lo") + 1
    shifted = (F.col(score_col) - F.col("__lo")) * n_bins
    bin_ = ((shifted - F.pmod(shifted, span)) / span).cast("long")
    return (
        scored.join(F.broadcast(rng))
        .withColumn("bin", bin_)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(label_col).cast("long")).alias("n_pos"),
            (
                F.sum(F.col(label_col).cast("long")).cast("double")
                / F.count(F.lit(1))
            ).alias("pos_rate"),
            F.min(score_col).alias("lo_score"),
            F.max(score_col).alias("hi_score"),
        )
    )


def _knn_votes(q: DataFrame, c: DataFrame, k: int) -> DataFrame:
    """Shared kNN scoring pipeline for knn_classify and
    label_noise_audit: broadcast the bounded query panel
    (query_id, own_label, q_emb, q_nrm) against the corpus
    (neighbor_id, n_label, c_emb, c_nrm), exclude self-matches,
    rank<=k via WindowGroupLimit partials, count votes.

    The cosine rounding (6dp) and tie-breaks (cosine desc ->
    neighbor_id asc) are encoded HERE ONCE — they must stay in
    lockstep with the DuckDB oracles of every caller.

    Returns votes at (query_id, own_label, n_label) grain."""
    from geist_spark.operators.similarity import _dot

    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "own_label",
            "n_label",
            "neighbor_id",
            F.round(cos, 6).alias("cosine"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    top = scored.withColumn("rank", F.row_number().over(wk)).filter(
        F.col("rank") <= k
    )
    return top.groupBy("query_id", "own_label", "n_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )


def knn_classify(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    label_col: str = "label",
    value_col: str = "embedding",
) -> DataFrame:
    """k-nearest-neighbor majority-vote classification over an
    embedding column: each query vector takes the label most common
    among its k cosine-nearest LABELED neighbors (query rows are held
    out of the corpus). The non-parametric sibling of
    centroid_classify — no training pass, robust to non-spherical
    classes, and the standard probe for "are these embeddings any
    good?" during data prep.

    Plan shape (same as similarity.cosine_topk): the bounded query
    side is BROADCAST against the corpus scan — one pass, no corpus
    shuffle; the rank<=k filter compiles to WindowGroupLimit partials
    so each map task forwards at most k rows per query. Votes then
    aggregate over |Q|*k rows. Cosine rounded to 6dp before ranking;
    ties: cosine desc -> neighbor_id asc, votes desc -> label asc —
    all integer afterward, so the DuckDB oracle replays exactly.

    Returns (query_id, true_label, pred_label, n_votes, correct).
    """
    from geist_spark.operators.bucketing import fan_out
    from geist_spark.operators.similarity import _norm

    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col(label_col).alias("own_label"),
        F.col(value_col).alias("q_emb"),
        _norm(F.col(value_col)).alias("q_nrm"),
    )
    c = fan_out(
        embeddings.filter(~F.col("vec_id").isin(query_ids))
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col(label_col).alias("n_label"),
        F.col(value_col).alias("c_emb"),
        _norm(F.col(value_col)).alias("c_nrm"),
    )
    votes = _knn_votes(q, c, k)
    wv = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("n_label").asc()
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            F.col("own_label").alias("true_label"),
            F.col("n_label").alias("pred_label"),
            "n_votes",
            (F.col("n_label") == F.col("own_label"))
            .cast("int")
            .alias("correct"),
        )
    )


def label_noise_audit(
    embeddings: DataFrame,
    audit_ids: list[int],
    k: int = 10,
    label_col: str = "label",
    value_col: str = "embedding",
) -> DataFrame:
    """Leave-one-out kNN label-noise audit (confident-learning-lite):
    each audited point is re-classified by the majority vote of its k
    cosine-nearest OTHER points; a disagreement between the vote and
    the point's own label flags a likely mislabel. The standard triage
    pass before training on crowd- or heuristically-labeled data —
    run it on a sampled panel, re-queue the suspects for review.

    Differs from knn_classify in the holdout rule: the audited rows
    stay IN the corpus (each excludes only itself), because the audit
    asks "does the rest of the data agree with this row's label?",
    not "can held-out queries be classified?".

    Plan shape is knn_classify's: bounded audit panel BROADCAST
    against one corpus scan, rank<=k via WindowGroupLimit partials,
    then integer votes over |panel|*k rows. At 100 TB the full-corpus
    audit swaps the brute-force scan for the IVF/LSH candidate stage
    (similarity.py) in front of the same vote — the vote plan is
    unchanged.

    Returns (vec_id, label, pred_label, n_votes_pred, n_votes_own,
    suspect) — n_votes_own = votes for the row's own label (0 when
    none of the k neighbors carries it); suspect = pred != own.
    """
    from geist_spark.operators.bucketing import fan_out
    from geist_spark.operators.similarity import _norm

    q = embeddings.filter(F.col("vec_id").isin(audit_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col(label_col).alias("own_label"),
        F.col(value_col).alias("q_emb"),
        _norm(F.col(value_col)).alias("q_nrm"),
    )
    c = fan_out(embeddings).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col(label_col).alias("n_label"),
        F.col(value_col).alias("c_emb"),
        _norm(F.col(value_col)).alias("c_nrm"),
    )
    votes = _knn_votes(q, c, k)
    wv = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("n_label").asc()
    )
    pred = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            "own_label",
            F.col("n_label").alias("pred_label"),
            F.col("n_votes").alias("n_votes_pred"),
        )
    )
    own = votes.filter(F.col("n_label") == F.col("own_label")).select(
        "query_id", F.col("n_votes").alias("n_votes_own")
    )
    # votes is |panel|-grain; broadcast the own-votes side explicitly —
    # Catalyst's static estimate of the window-derived frame would
    # otherwise fall back to a sort-merge join over two tiny tables
    return pred.join(F.broadcast(own), "query_id", "left").select(
        F.col("query_id").alias("vec_id"),
        F.col("own_label").alias("label"),
        "pred_label",
        "n_votes_pred",
        F.coalesce(F.col("n_votes_own"), F.lit(0).cast("long")).alias(
            "n_votes_own"
        ),
        (F.col("pred_label") != F.col("own_label"))
        .cast("int")
        .alias("suspect"),
    )
