"""Deterministic dataset splitting & sampling for training-data prep.

Scale design: split/sample assignment is a pure per-row expression on
md5 of the key — zero shuffles, zero state, reproducible across runs,
engines, and cluster sizes (no RNG, no partition dependence). The
md5-hex prefix is compared LEXICOGRAPHICALLY, which is identical in
every engine (the oracle uses the same expression in DuckDB), avoiding
hex->int conversions that differ across SQL dialects.

A 2-hex-char prefix gives 256 buckets (~0.4% split granularity); the
4-char sampling variant gives 65536 (~0.0015%). At 100 TB both are a
single codegen'd projection over the scan — the cheapest possible
operator — and downstream writes can `partitionBy("split")`.

No reference equivalent (zpiroux/geist has no sampling surface; the
closest is the spec's event filters, entity/spec.go:260-285) — this is
part of the driver's LLM-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _hex_threshold(cum_fraction: float, chars: int) -> str:
    """Hex string h such that P(md5_prefix < h) ~= cum_fraction."""
    buckets = 16**chars
    cut = min(buckets, max(0, round(cum_fraction * buckets)))
    return format(cut, f"0{chars + 1}x")[-chars:] if cut < buckets else "g" * chars


def split_column(key: Column, weights: dict[str, float], chars: int = 2) -> Column:
    """CASE expression assigning each row a split name with probability
    proportional to `weights`, keyed on md5(key) so the assignment is
    stable under reshuffling, re-runs, and incremental appends."""
    total = sum(weights.values())
    names = list(weights)
    prefix = F.substring(F.md5(key.cast("string")), 1, chars)
    cum = 0.0
    expr = F.lit(names[-1])
    cases: list[tuple[str, str]] = []
    for name in names[:-1]:
        cum += weights[name] / total
        cases.append((name, _hex_threshold(cum, chars)))
    for name, threshold in reversed(cases):
        expr = F.when(prefix < threshold, F.lit(name)).otherwise(expr)
    return expr


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic train/val/test (or custom) split column."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(out_col, split_column(F.col(key), weights))


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~`fraction` of rows, chosen by md5(key || salt) — stable
    and engine-portable, unlike rand()-based sampling. Different salts
    draw independent samples; the same salt always draws the same one."""
    threshold = _hex_threshold(fraction, 4)
    keyed = F.md5(F.concat(F.col(key).cast("string"), F.lit(salt)))
    return df.filter(F.substring(keyed, 1, 4) < threshold)


def split_oracle_case(key_sql: str, weights: dict[str, float]) -> str:
    """The DuckDB-side CASE expression equivalent to split_column —
    kept next to the operator so query and oracle can't drift."""
    total = sum(weights.values())
    names = list(weights)
    parts = []
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        parts.append(
            f"WHEN substr(md5(CAST({key_sql} AS VARCHAR)), 1, 2) <"
            f" '{_hex_threshold(cum, 2)}' THEN '{name}'"
        )
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    sources, keep all rare ones): each stratum value gets its own
    md5-threshold. Same zero-shuffle / reproducible properties as
    deterministic_sample; strata not listed get default_fraction."""
    keyed = F.md5(F.concat(F.col(key).cast("string"), F.lit(salt)))
    prefix = F.substring(keyed, 1, 4)
    expr = F.lit(_hex_threshold(default_fraction, 4))
    for stratum, frac in fractions.items():
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(_hex_threshold(frac, 4))
        ).otherwise(expr)
    return df.filter(prefix < expr)


def temperature_mix(
    df: DataFrame,
    source_col: str,
    key: str,
    target_rows_expr: str = "total / 2",
    salt: str = "",
) -> DataFrame:
    """Temperature-based source re-mixing (the multilingual/multi-source
    rebalancing rule, alpha = 0.5): sample source s at a rate giving it
    a target share proportional to sqrt(n_s) — boosting rare sources,
    damping dominant ones — with expected output size `target_rows`.

    rate_s = min(1, ((sqrt(n_s) / sum_s sqrt(n_s)) * target) / n_s)

    alpha is fixed at 0.5 because sqrt is IEEE-correctly-rounded in
    every engine while pow() may differ in the last ulp — the whole
    pipeline (rates included) replays bit-for-bit in the DuckDB
    oracle. Per-row keep is the usual md5-threshold draw (u32 prefix
    vs floor(rate * 2^32)), so membership is stable across runs,
    engines, and cluster sizes.

    Scale shape: ONE tiny shuffle (per-source counts), rates broadcast
    back onto the corpus, keep-filter is pure codegen. No collect —
    the whole thing is one lazy plan."""
    n_s = F.col("__n_s").cast("double")
    counts = df.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("__n_s")
    )
    totals = counts.agg(
        F.sum("__n_s").alias("__total"),
        F.sum(F.sqrt(F.col("__n_s").cast("double"))).alias("__qd"),
    ).withColumn(
        "__target",
        F.expr(target_rows_expr.replace("total", "CAST(__total AS DOUBLE)")),
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        "__src",
        F.least(
            F.lit(1.0),
            ((F.sqrt(n_s) / F.col("__qd")) * F.col("__target")) / n_s,
        ).alias("__rate"),
    )
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key).cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (
        df.join(
            F.broadcast(rates), df[source_col] == F.col("__src"), "left"
        )
        .filter(u32 < F.floor(F.col("__rate") * F.lit(4294967296.0)))
        .drop("__src", "__rate")
    )


def leakage_safe_split(
    documents: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment that cannot leak through near-
    duplicates: every doc in a near-dup cluster is keyed by its
    cluster REPRESENTATIVE, so the whole cluster lands in one split.
    Plain per-doc hashing puts two 99%-similar docs on opposite sides
    of the train/test fence — the classic eval-contamination bug this
    operator exists to kill.

    `pairs` is any near-dup pair table (minhash_lsh_pairs,
    verified_near_dup_pairs, incremental probe output). Shape: cluster
    labels via min-label propagation (O(diameter) rounds over the PAIR
    graph only, not the corpus), then one left join of labels onto the
    corpus and the same zero-shuffle md5 CASE as hash_split, keyed on
    coalesce(cluster_id, doc_id). The label join uses the same
    count-gated broadcast as keep_canonical: labels are already
    materialized (dedup_clusters ends on an eager localCheckpoint) so
    the count is free; duplicate-heavy corpora fall through to AQE."""
    from geist_spark.operators.dedup import dedup_clusters

    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    labels = dedup_clusters(pairs)
    if labels.count() <= 2_000_000:
        labels = F.broadcast(labels)
    rep = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    return documents.join(labels, "doc_id", "left").withColumn(
        out_col, split_column(rep, weights)
    ).drop("cluster_id")


def assign_shards(
    df: DataFrame, key_col: str, n_shards: int, shard_col: str = "shard"
) -> DataFrame:
    """Deterministic shard id per row: md5-bucket of the key. The
    assignment depends only on the KEY VALUE — not on partitioning,
    row order, or cluster size — so a re-run, a backfill, or another
    engine lands every row in the same shard (the property a
    resumable multi-stage export needs). Pure projection, no shuffle."""
    key = F.col(key_col).cast("string")
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return df.withColumn(shard_col, (h % n_shards).cast("int"))


def shard_manifest(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    content_cols: list[str] | None = None,
) -> DataFrame:
    """Per-shard export manifest: row count, byte size, and an
    ORDER-INDEPENDENT content digest (sum of 56-bit row fingerprints,
    operators/integrity.py) — what a training job validates before
    trusting a sharded export, and what an incremental re-export
    diffs against to find shards needing rewrite.

    One shuffle (the groupBy on shard); everything else is a narrow
    map. Engine-exact: the DuckDB oracle replays the identical md5
    arithmetic."""
    from geist_spark.operators.integrity import row_fingerprint

    cols = content_cols or df.columns
    sized = assign_shards(df, key_col, n_shards).withColumn(
        "__bytes",
        sum(
            F.octet_length(F.coalesce(F.col(c).cast("string"), F.lit("")))
            for c in cols
        ),
    )
    return sized.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("__bytes").alias("total_bytes"),
        F.sum(row_fingerprint(list(cols)))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("content_digest"),
    )


def write_sharded(
    df: DataFrame, path: str, key_col: str, n_shards: int
) -> None:
    """Materialize a sharded export: one directory per shard
    (shard=N/), rows routed by the deterministic assignment. The
    repartition ON the shard column means each output directory is
    written by the executors owning that shard's rows — no small-file
    spray (without it, every task writes a sliver of every shard:
    n_tasks x n_shards files). Readers prune by shard directory."""
    assign_shards(df, key_col, n_shards).repartition(
        n_shards, F.col("shard")
    ).write.mode("overwrite").partitionBy("shard").parquet(path)


def sample_negatives(
    docs: DataFrame,
    clusters: DataFrame | None = None,
    k: int = 3,
    oversample: int = 3,
    n_docs: int | None = None,
    id_col: str = "doc_id",
    seed: str = "neg",
) -> DataFrame:
    """Leakage-aware contrastive negative sampling: k pseudo-random
    negatives per anchor, excluding self and anything in the anchor's
    near-dup cluster (a near-duplicate "negative" is a false negative
    that poisons a contrastive objective — the same leakage class
    leakage_safe_split guards splits against).

    Candidates are md5(seed|anchor|j) % n for j in [0, k*oversample):
    GENERATION is O(n*k) map-only (never an n^2 candidate join), fully
    deterministic, and invariant to partitioning/order. Survivors of
    the self/cluster filters are ranked by probe index j and the first
    k kept — `oversample` absorbs filtered-out probes (an anchor in a
    huge cluster can still come up short; rows emitted are the
    survivors, never padded).

    Requires ids dense in [0, n) (compose with a zipWithIndex-style
    re-keying otherwise). `clusters` is (doc_id, cluster_id) as
    produced by dedup_clusters; docs absent from it are singletons.

    Plan: one explode, two label joins (label table is near-dup docs
    only — AQE broadcasts it when small, exactly the keep_canonical
    lesson), one per-anchor window. Output (anchor_id, neg_id, slot).
    """
    n = n_docs or docs.count()
    probes = docs.select(F.col(id_col).alias("anchor_id")).select(
        "anchor_id",
        F.explode(F.sequence(F.lit(0), F.lit(k * oversample - 1))).alias("j"),
    )
    cand = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed + "|"),
                        F.col("anchor_id").cast("string"),
                        F.lit("|"),
                        F.col("j").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % n
    )
    probes = probes.select("anchor_id", "j", cand.alias("neg_id")).filter(
        F.col("neg_id") != F.col("anchor_id")
    )
    # independent probes can collide on the same candidate (~k^2/n of
    # anchors at small n); keep one row per (anchor, candidate) at its
    # earliest probe index so the k slots are k DISTINCT negatives
    probes = probes.groupBy("anchor_id", "neg_id").agg(
        F.min("j").alias("j")
    )
    if clusters is not None:
        la = clusters.select(
            F.col("doc_id").alias("__a_id"), F.col("cluster_id").alias("__a_cl")
        )
        lc = clusters.select(
            F.col("doc_id").alias("__c_id"), F.col("cluster_id").alias("__c_cl")
        )
        probes = (
            probes.join(la, probes.anchor_id == la.__a_id, "left")
            .join(lc, probes.neg_id == lc.__c_id, "left")
            .filter(
                F.col("__a_cl").isNull()
                | F.col("__c_cl").isNull()
                | (F.col("__a_cl") != F.col("__c_cl"))
            )
            .select("anchor_id", "j", "neg_id")
        )
    w = Window.partitionBy("anchor_id").orderBy("j")
    return (
        probes.withColumn("slot", F.row_number().over(w))
        .filter(F.col("slot") <= k)
        .select("anchor_id", "neg_id", "slot")
    )


def kfold_split(
    docs: DataFrame,
    k: int = 5,
    clusters: DataFrame | None = None,
    id_col: str = "doc_id",
    salt: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: fold = md5(salt|key) % k,
    where key is the near-dup CLUSTER representative when `clusters`
    is given (whole clusters land in one fold — the same leakage
    guard as leakage_safe_split, because a near-dup of a training doc
    sitting in the validation fold inflates every metric it touches).

    Zero-shuffle projection without clusters; one left join against
    the (near-dup docs only) label table with them. Invariant to
    partitioning, order, and engine — folds are a pure function of
    ids. Output: input columns + fold (int in [0, k))."""
    if k < 2:
        raise ValueError("k must be >= 2")
    key = F.col(id_col).cast("string")
    out = docs
    if clusters is not None:
        lab = clusters.select(
            F.col("doc_id").alias("__l_id"), F.col("cluster_id").alias("__l_cl")
        )
        out = out.join(lab, out[id_col] == lab.__l_id, "left")
        key = F.coalesce(F.col("__l_cl"), F.col(id_col)).cast("string")
    fold = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + "|"), key)), 1, 8), 16, 10
        ).cast("long")
        % k
    ).cast("int")
    out = out.withColumn("fold", fold)
    if clusters is not None:
        out = out.drop("__l_id", "__l_cl")
    return out


def importance_sample(
    docs: DataFrame,
    weight_col: str,
    target_fraction: float,
    id_col: str = "doc_id",
    salt: str = "imp",
) -> DataFrame:
    """Deterministic importance sampling: keep a row with probability
    min(1, target_fraction * w / mean_w) against an md5-uniform draw —
    doc-level quality weighting for training mixtures (the doc-grain
    companion to temperature_mix's source-grain re-weighting).

    The draw is u = md5(salt|id)/2^32: a pure function of the id, so
    the sample is reproducible across runs/engines/partitionings and
    DISJOINT salts give independent draws. Plan: one 1-row mean
    aggregate (decimal-exact) broadcast back, then a map-side filter —
    no shuffle of the data. Rows whose scaled weight exceeds 1 are
    always kept, so the realized fraction tracks target_fraction only
    while acceptance stays unsaturated (documented bias of the
    standard capped scheme).
    """
    mean_w = docs.agg(
        (
            F.sum(F.col(weight_col).cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__mean_w")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt + "|"), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(2**32))
    )
    accept = F.least(
        F.lit(1.0),
        F.lit(float(target_fraction))
        * F.col(weight_col)
        / F.col("__mean_w"),
    )
    return (
        docs.join(F.broadcast(mean_w))
        .filter(u < accept)
        .drop("__mean_w")
    )


def mixture_plan(
    corpus_stats: DataFrame,
    weights: DataFrame,
    total_tokens: int,
    max_epochs: int = 4,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    weight_col: str = "weight_parts",
) -> DataFrame:
    """Data-mixture epoch planning: given per-source available tokens
    and integer target-weight PARTS, compute how much of each source a
    `total_tokens` training budget takes — the Chinchilla/Llama-style
    "how many epochs of web vs books vs code" computation.

    weights carries integer parts (not floats) so every allocation is
    exact: target_i = floor(total * parts_i / sum(parts)). Sources cap
    at `max_epochs` repetitions (repeating data past a few epochs hurts
    — Muennighoff et al. 2023, arXiv:2305.16264); planned_i =
    min(target_i, available_i * max_epochs). `epochs` and
    `achieved_weight` are single IEEE divisions of exact integers.

    Everything here is METADATA grain (one row per source): the two
    inputs are aggregates, sum-of-parts and sum-of-planned are 1-row
    broadcasts, and the output feeds token_budget_quota /
    temperature_mix for doc-level enforcement. Zero corpus cost.

    Output: (source, available_tokens, weight_parts, target_tokens,
    planned_tokens, epochs, achieved_weight).
    """
    j = corpus_stats.select(
        F.col(source_col).alias("source"),
        F.col(tokens_col).cast("long").alias("available_tokens"),
    ).join(
        weights.select(
            F.col(source_col).alias("source"),
            F.col(weight_col).cast("long").alias("weight_parts"),
        ),
        "source",
    )
    parts_sum = j.agg(F.sum("weight_parts").alias("__parts_sum"))
    j = j.join(F.broadcast(parts_sum))
    # integral `div`, never IEEE `/`: total * parts can pass 2^53 for
    # real LLM budgets (e.g. 15T tokens), where double division would
    # round before truncating
    target = F.expr(
        f"(CAST({int(total_tokens)} AS BIGINT) * weight_parts)"
        " div __parts_sum"
    )
    planned = F.least(
        target, F.col("available_tokens") * F.lit(int(max_epochs))
    )
    j = j.select(
        "source",
        "available_tokens",
        "weight_parts",
        target.alias("target_tokens"),
        planned.alias("planned_tokens"),
    )
    planned_sum = j.agg(F.sum("planned_tokens").alias("__planned_sum"))
    return (
        j.join(F.broadcast(planned_sum))
        .select(
            "source",
            "available_tokens",
            "weight_parts",
            "target_tokens",
            "planned_tokens",
            (F.col("planned_tokens") / F.col("available_tokens")).alias(
                "epochs"
            ),
            (F.col("planned_tokens") / F.col("__planned_sum")).alias(
                "achieved_weight"
            ),
        )
    )


def epoch_shuffle(
    df: DataFrame,
    n_epochs: int,
    n_batches: int,
    key: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch global reshuffle for training-data
    loading: every row gains (epoch, batch, sort_key) for each of
    n_epochs epochs, where sort_key = 32-bit md5('epoch<e>|' || key)
    and batch = sort_key div ceil(2^32 / n_batches) — equal-width hash
    ranges, so batch sizes concentrate tightly around n/n_batches
    without any global sort or row_number (a single-reducer
    anti-pattern at 100 TB). Writing the reordered epoch is then
    `partitionBy(epoch, batch)` + sort within partitions by sort_key:
    fully parallel, byte-stable across runs and cluster sizes.

    `batch_e0` carries the row's epoch-0 batch in the same projection
    (no self-join) so downstream audits can measure how thoroughly
    epochs decorrelate. Map-only: the fan-out is an explode over
    n_epochs literals; no shuffle happens here at all."""
    if n_epochs < 1 or n_batches < 1:
        raise ValueError("need n_epochs >= 1 and n_batches >= 1")
    width = (1 << 32) // n_batches + (1 if (1 << 32) % n_batches else 0)

    def h(epoch: Column) -> Column:
        seed = F.concat(
            F.lit("epoch"), epoch.cast("string"), F.lit("|"),
            F.col(key).cast("string"),
        )
        return F.conv(F.substring(F.md5(seed), 1, 8), 16, 10).cast("long")

    ep = F.explode(
        F.sequence(F.lit(0), F.lit(n_epochs - 1))
    ).alias("epoch")
    # batch_e0 is computed BEFORE the explode — once per input row,
    # not once per (row, epoch) pair (the epoch-0 hash is
    # epoch-independent, so evaluating it post-explode would redo the
    # same md5 n_epochs times per row).
    e0 = df.select(
        *df.columns,
        F.floor(h(F.lit(0)) / F.lit(width)).cast("int").alias("batch_e0"),
    )
    out = e0.select(*e0.columns, ep)
    hk = h(F.col("epoch"))
    return out.select(
        *df.columns,
        "epoch",
        hk.alias("sort_key"),
        # explicit floor: Spark's double->int cast truncates but
        # DuckDB's ROUNDS, so the oracle replays floor() on both sides.
        # The double quotient is safe: |true - floor boundary| >= 1/width
        # which dwarfs the division's half-ULP rounding error.
        F.floor(hk / F.lit(width)).cast("int").alias("batch"),
        "batch_e0",
    )


def epoch_shuffle_manifest(
    df: DataFrame,
    n_epochs: int,
    n_batches: int,
    key: str = "doc_id",
    size_col: str | None = None,
) -> DataFrame:
    """Shuffle-plan manifest: per (epoch, batch) row counts, payload
    totals, and n_stayers = rows whose batch index equals their
    epoch-0 batch (for epoch 0 that is n_rows; for e > 0 it should
    hover near n_rows/n_batches — the evidence the reshuffle actually
    decorrelates epochs). One partial-agg shuffle carrying
    n_epochs * n_batches groups; the fan-out never leaves the map
    side."""
    assigned = epoch_shuffle(df, n_epochs, n_batches, key)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (F.col("batch") == F.col("batch_e0")).cast("long")
        ).alias("n_stayers"),
    ]
    if size_col is not None:
        aggs.append(F.sum(size_col).alias("total_size"))
    return assigned.groupBy("epoch", "batch").agg(*aggs)
