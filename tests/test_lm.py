"""N-gram LM quality scoring (operators/lm.py)."""

from pyspark.sql import functions as F

from geist_spark.operators.lm import lm_score, train_ngram_lm


def _docs(spark, *texts: str):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_counts(spark):
    ref = _docs(spark, "the cat sat", "the cat ran", "a dog ran")
    uni, bi = train_ngram_lm(ref)
    u = {r.token: r.cnt for r in uni.collect()}
    assert u == {"the": 2, "cat": 2, "sat": 1, "ran": 2, "a": 1, "dog": 1}
    b = {(r.w1, r.w2): r.cnt for r in bi.collect()}
    assert b[("the", "cat")] == 2
    assert b[("cat", "sat")] == 1
    assert ("sat", "the") not in b  # no cross-document pairs


def test_min_count_filter(spark):
    ref = _docs(spark, "the cat sat", "the cat ran")
    uni, bi = train_ngram_lm(ref, min_count=2)
    assert {r.token for r in uni.collect()} == {"the", "cat"}
    assert {(r.w1, r.w2) for r in bi.collect()} == {("the", "cat")}


def test_score_features(spark):
    ref = _docs(spark, "the cat sat", "the cat ran")
    uni, bi = train_ngram_lm(ref)
    scored = {
        r.doc_id: r
        for r in lm_score(
            _docs(spark, "the cat sat", "zz qq", "the zz", "cat"), uni, bi
        ).collect()
    }
    # doc 0: fully in-reference
    assert scored[0].oov_rate == 0.0 and scored[0].bigram_hit_rate == 1.0
    assert scored[0].min_unigram_cnt == 1  # 'sat'
    # doc 1: fully OOV
    assert scored[1].oov_rate == 1.0 and scored[1].bigram_hit_rate == 0.0
    assert scored[1].min_unigram_cnt is None
    assert scored[1].avg_freq_digits is None
    # doc 2: half OOV, pair unseen
    assert scored[2].oov_rate == 0.5 and scored[2].bigram_hit_rate == 0.0
    # doc 3: single token -> no pairs -> NULL hit rate
    assert scored[3].bigram_hit_rate is None
    assert scored[3].n_tokens == 1


def test_collocation_lift_ranks_fixed_phrases(spark):
    from geist_spark.operators.lm import collocation_lift

    # "new york" always co-occurs; "the cat"/"the dog" split "the"
    docs = _docs(
        spark,
        "new york is big",
        "new york is old",
        "the cat is here",
        "the dog is here",
    )
    out = {(r.w1, r.w2): r for r in collocation_lift(docs, min_count=2).collect()}
    ny = out[("new", "york")]
    # exact: n_ab=2, n_a=2, n_b=2, N=16 -> lift = 32/4 = 8.0
    assert (ny.n_ab, ny.n_a, ny.n_b) == (2, 2, 2)
    assert ny.lift_num == 32 and ny.lift_den == 4 and ny.lift == 8.0
    # "is here" (2/4*2) has lower lift than the fixed phrase
    assert out[("is", "here")].lift < ny.lift
    # min_count prunes hapax bigrams like ("york", "is")? no — that
    # occurs twice; ("is", "big") occurs once and must be absent
    assert ("is", "big") not in out


def test_shuffle_join_path_matches_broadcast(spark):
    ref = _docs(spark, "the cat sat on the mat", "the dog sat")
    docs = _docs(spark, "the cat", "dog sat on", "x y the")
    uni, bi = train_ngram_lm(ref)
    a = lm_score(docs, uni, bi, broadcast_vocab=True)
    b = lm_score(docs, uni, bi, broadcast_vocab=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
