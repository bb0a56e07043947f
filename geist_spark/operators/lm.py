"""N-gram language-model quality scoring (CCNet-style), log-free.

CCNet (Wenzek et al. 2020) filters a crawl corpus by perplexity under
an LM trained on a clean reference corpus (Wikipedia). The same shape
here: `train_ngram_lm` counts unigrams/bigrams over a reference slice,
`lm_score` scores every document against those tables.

Deliberately LOG-FREE: ln()/log() rounding differs between engines
(the same reason drift.py uses TVD/chi2 instead of KL), so instead of
log-probabilities the scorer emits exact-arithmetic proxies that carry
the same signal for filtering:

- `oov_rate` — fraction of tokens unseen in the reference unigrams
  (the dominant perplexity driver on noisy text),
- `bigram_hit_rate` — fraction of adjacent pairs seen in the
  reference bigrams (local fluency),
- `avg_freq_digits` — mean decimal-digit-count of the matched unigram
  counts (an exact integer floor(log10)+1: commoner tokens -> higher),
- `min_unigram_cnt` — the rarest matched token.

All ratios are single IEEE divisions of exact integers (division is
correctly rounded, so cross-engine stable); no float summation ever
happens.

Scale design: training is two vocabulary-grain aggregations (the
corpus scan dominates; the outputs are vocab-sized). Scoring is ONE
explode of (token, next-token) structs built array-side (zip of the
token array with its shifted self — no window, no per-doc shuffle),
two vocabulary joins (broadcast below threshold, shuffle-hash above),
and one doc-grain aggregation. The corpus is never shuffled at
document grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from geist_spark.operators.dedup import tokens


def _pairs(toks: F.Column) -> F.Column:
    """Array of (w1, w2) adjacent-pair structs, built array-side."""
    n = F.size(toks)
    return F.arrays_zip(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
    )


def train_ngram_lm(
    reference: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Count tables from a clean reference corpus: unigrams
    (token, cnt) and bigrams (w1, w2, cnt), each filtered to
    cnt >= min_count.

    Two vocabulary-grain aggregations; each shuffles only
    (token, partial-count) pairs, never documents. At 100 TB the
    reference slice is typically a small curated corpus anyway
    (CCNet uses Wikipedia), so both outputs are broadcast-sized.
    """
    toks = tokens(F.col(text_col))
    uni = (
        reference.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    bi = (
        reference.select(F.explode(_pairs(toks)).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    return uni, bi


def oov_rate(
    documents: DataFrame,
    unigrams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-doc OOV rate alone — the cheap subset of lm_score for
    filter gates that only need the unigram signal: one token explode,
    one vocab join, one doc-grain agg; the bigram table is never
    built."""
    uni = unigrams.select(
        F.col("token").alias("u_tok"), F.lit(1).alias("known")
    )
    if broadcast_vocab:
        uni = F.broadcast(uni)
    ex = documents.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    )
    return (
        ex.join(uni, F.col("w") == F.col("u_tok"), "left")
        .groupBy(id_col)
        .agg(
            (
                F.sum(F.when(F.col("known").isNull(), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("oov_rate")
        )
    )


def lm_score(
    documents: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document LM-quality features against reference count tables
    (see module docstring for the exact feature definitions).

    Plan: one explode of array-side (w, w_next) structs — adjacency
    comes from zipping the token array with its shifted self, so there
    is NO per-doc window shuffle — then two vocab joins and one
    doc-grain aggregation.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    ex = documents.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                toks.alias("w"),
                F.concat(
                    F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                    F.array(F.lit(None).cast("string")),
                ).alias("w_next"),
            )
        ).alias("p"),
    ).select(
        id_col,
        F.col("p.w").alias("w"),
        F.col("p.w_next").alias("w_next"),
    )
    uni = unigrams.select(
        F.col("token").alias("u_tok"), F.col("cnt").alias("cnt_u")
    )
    bi = bigrams.select(
        F.col("w1").alias("bw1"),
        F.col("w2").alias("bw2"),
        F.col("cnt").alias("cnt_b"),
    )
    if broadcast_vocab:
        # reference vocab tables are curated-corpus-sized; past the
        # broadcast threshold pass False for shuffle-hash joins on token
        uni, bi = F.broadcast(uni), F.broadcast(bi)
    j = (
        ex.join(uni, F.col("w") == F.col("u_tok"), "left")
        .join(
            bi,
            (F.col("w") == F.col("bw1")) & (F.col("w_next") == F.col("bw2")),
            "left",
        )
    )
    n_tokens = F.count(F.lit(1))
    n_oov = F.sum(F.when(F.col("cnt_u").isNull(), 1).otherwise(0))
    n_known = n_tokens - n_oov
    n_pairs = F.sum(F.when(F.col("w_next").isNotNull(), 1).otherwise(0))
    n_pair_hits = F.sum(F.when(F.col("cnt_b").isNotNull(), 1).otherwise(0))
    digit_sum = F.sum(
        F.when(
            F.col("cnt_u").isNotNull(),
            F.length(F.col("cnt_u").cast("string")),
        ).otherwise(0)
    )
    return j.groupBy(id_col).agg(
        n_tokens.alias("n_tokens"),
        (n_oov / n_tokens).alias("oov_rate"),
        F.when(n_pairs > 0, n_pair_hits / n_pairs).alias("bigram_hit_rate"),
        F.when(n_known > 0, digit_sum / n_known).alias("avg_freq_digits"),
        F.min("cnt_u").alias("min_unigram_cnt"),
    )


def collocation_lift(
    documents: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Collocation (phrase) mining: bigrams ranked by lift —
    n_ab * N / (n_a * n_b), the monotone core of PMI without the log
    (log is rank-preserving, and ln() rounds differently across
    engines — the repo's standing log-free discipline). High-lift
    bigrams are multi-word units worth protecting as single tokens in
    vocabulary curation (tokenizer merges, phrase-aware dedup).

    Exact arithmetic: numerator and denominator are exact BIGINT
    products (emitted as columns for downstream exact comparison);
    `lift` is their single IEEE division. min_count prunes the noisy
    tail BEFORE the join (at corpus scale most bigrams are hapax).

    Plan: the train_ngram_lm aggregations (vocabulary grain), two
    unigram joins onto the pruned bigram table (broadcast while the
    vocabulary fits — broadcast_vocab=False switches to shuffle-hash
    joins at vocabulary grain for crawl-scale vocabularies), a 1-row
    token-total broadcast. Nothing document-grain ever shuffles.
    """
    uni, bi = train_ngram_lm(documents, text_col=text_col)
    n_total = uni.agg(F.sum("cnt").alias("__n"))
    ua = uni.select(F.col("token").alias("w1"), F.col("cnt").alias("n_a"))
    ub = uni.select(F.col("token").alias("w2"), F.col("cnt").alias("n_b"))
    if broadcast_vocab:
        # fine while the corpus vocabulary is broadcast-sized; over a
        # full crawl corpus pass False — the joins shuffle-hash on
        # token at vocabulary grain (same escape hatch as oov_rate)
        ua, ub = F.broadcast(ua), F.broadcast(ub)
    else:
        # merge hint ONLY here: stacking hint("merge") on an
        # F.broadcast frame silently discards the broadcast (Spark
        # keeps the outermost hint), which would make broadcast_vocab
        # dead code. The hint guards the Catalyst static-size
        # mis-estimate on the self-derived vocab side (see SCALE.md
        # merge-hint policy).
        ua, ub = ua.hint("merge"), ub.hint("merge")
    return (
        bi.filter(F.col("cnt") >= min_count)
        .join(ua, "w1")
        .join(ub, "w2")
        .join(F.broadcast(n_total))
        .select(
            "w1",
            "w2",
            F.col("cnt").alias("n_ab"),
            "n_a",
            "n_b",
            (F.col("cnt") * F.col("__n")).alias("lift_num"),
            (F.col("n_a") * F.col("n_b")).alias("lift_den"),
            (
                (F.col("cnt") * F.col("__n"))
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )
