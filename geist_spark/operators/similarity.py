"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k: exact; query set broadcast against the
  corpus, dot products via zip_with/aggregate (JVM-side, sequential
  index-order summation -> bit-identical with an index-order oracle).
- LSH-bucketed (random hyperplane signs): the 100 TB path — candidates
  only within matching sign-buckets, then exact re-rank. Hyperplanes
  are derived deterministically from md5 so the oracle can reproduce
  them if needed (rows-only checked otherwise).

Floats: cosine is computed in double and rounded (6dp) before ranking
so Spark/DuckDB hash-compare deterministically; ties broken by vec_id.
"""

from __future__ import annotations

from geist_spark.operators.bucketing import fan_out
from geist_spark.functions.litx import double_array, long_array, long_matrix
from geist_spark.functions.localdf import local_df
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Sequential index-order dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _exact_corpus_guard(
    corpus: DataFrame, cap: int | None, op: str, scale_hint: str
) -> None:
    """Bounded-size gate for exact-baseline (scan-product) ANN paths:
    one limit(cap+1) probe (never a full count of a 100 TB table) that
    raises with a pointer to the bucketed scale path when the corpus
    exceeds the documented exact-baseline regime. cap=None opts out
    (fully lazy composition) — the dedup_clusters probe pattern
    (dedup.py:dedup_clusters)."""
    if cap is None:
        return
    n = corpus.select(F.lit(1).alias("one")).limit(cap + 1).count()
    if n > cap:
        raise ValueError(
            f"{op}: corpus exceeds max_exact_vectors={cap}; the exact "
            f"baseline is O(|Q|*N)/O(N^2) by definition — {scale_hint} "
            "(or pass max_exact_vectors=None to force the exact path)"
        )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    max_exact_vectors: int | None = 100_000,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is a handful of rows -> broadcast; the corpus side
    streams through one pass, no shuffle until the final per-query
    top-k window over ~|Q|*N rows filtered down by rank.

    Exact baseline regime: scoring work is |Q| full-corpus passes —
    right up to ~1e5 vectors, a non-starter at 100 TB. A bounded probe
    enforces that bound (raises above `max_exact_vectors`, pointing at
    lsh_bucketed_topk / ivf_topk); None disables the probe."""
    _exact_corpus_guard(
        embeddings,
        max_exact_vectors,
        "cosine_topk",
        "use lsh_bucketed_topk or ivf_topk",
    )
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    c = fan_out(embeddings).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_nrm"),
    )
    pairs = F.broadcast(q).crossJoin(c).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cos, 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 — reproducible
    anywhere (no RNG state, no numpy on executors)."""
    import hashlib

    vals: list[float] = []
    for d in range(dim):
        h = hashlib.md5(f"plane|{plane_idx}|{d}".encode()).hexdigest()
        # map first 8 hex chars to [-1, 1)
        vals.append(int(h[:8], 16) / 2**31 - 1.0)
    return vals


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature buckets prune the
    corpus before exact cosine re-rank. This is the plan shape that
    survives 100 TB: the bucket join replaces the full cross join; the
    per-bucket candidate sets are small and re-ranked exactly."""
    planes = [_hyperplane(dim, p) for p in range(num_planes)]

    def signature(emb: F.Column) -> F.Column:
        bits = []
        for p_idx, plane in enumerate(planes):
            arr = double_array(plane)
            bit = F.when(_dot(emb, arr) >= 0, F.lit(1)).otherwise(F.lit(0))
            bits.append(bit * (2**p_idx))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    base = fan_out(embeddings).withColumn(
        "bucket", signature(F.col("embedding"))
    ).withColumn("nrm", _norm(F.col("embedding")))
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket"),
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
        F.col("bucket"),
    )
    pairs = F.broadcast(q).join(c, "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    scored = pairs.select(
        "query_id", "neighbor_id", F.round(cos, 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def adaptive_num_planes(n_vectors: int, target_bucket: int = 32, floor: int = 4) -> int:
    """Plane count sized so expected bucket ~= target_bucket vectors.

    Buckets must scale with the corpus or within-bucket pair counts
    grow O(n^2 / 2^planes): 500 vectors -> 4 planes, 5k -> 8, 5M -> 17.
    More planes = fewer candidates = lower recall; that's the LSH
    tradeoff knob, made explicit here."""
    import math

    if n_vectors <= target_bucket:
        return floor
    return max(floor, math.ceil(math.log2(n_vectors / target_bucket)))


def _bucket_signature(num_planes: int, dim: int) -> F.Column:
    """Hyperplane sign-bit bucket id for F.col('embedding') — the ONE
    signature function shared by the batch near-dup pass, the stored
    index builder, and the incremental probe, so all three agree on
    bucket boundaries by construction."""
    bits = []
    for p_idx in range(num_planes):
        arr = double_array(_hyperplane(dim, p_idx))
        bits.append(
            F.when(_dot(F.col("embedding"), arr) >= 0, F.lit(1)).otherwise(
                F.lit(0)
            )
            * (2**p_idx)
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def embedding_buckets(
    embeddings: DataFrame, num_planes: int = 8, dim: int = 64
) -> DataFrame:
    """Persistable hyperplane-bucket index rows for a corpus slice:
    (vec_id, embedding, bucket, nrm, num_planes, dim). This IS the
    stored ANN index of the streaming ingest path — each micro-batch
    appends its rows (parquet/Delta append), later batches probe it
    with incremental_embedding_near_dup. Buckets and norms are
    deterministic (md5 hyperplanes, no RNG state), so index rows
    written on any executor at any time agree bit-for-bit.

    num_planes/dim travel WITH the index rows (constant columns —
    parquet RLE makes them free): a stored index probed with
    mismatched parameters would silently produce near-zero recall
    (disjoint bucket spaces), so the probe validates them up front
    instead of joining into the void."""
    return fan_out(embeddings).select(
        "vec_id",
        "embedding",
        _bucket_signature(num_planes, dim).alias("bucket"),
        _norm(F.col("embedding")).alias("nrm"),
        F.lit(num_planes).alias("num_planes"),
        F.lit(dim).alias("dim"),
    )


def check_embedding_index_meta(
    index: DataFrame, num_planes: int, dim: int
) -> None:
    """Validate a stored embedding_buckets index's pinned layout
    parameters against a probe's — one BOUNDED limit(1) Spark job
    (eager, driver-blocking). A mismatched probe would silently
    return near-zero recall (disjoint bucket spaces), the worst
    failure mode; rows with NULL metadata (pre-metadata appends
    NULL-filled by parquet schema merge) are skipped, and a fully
    legacy index skips the check. Callable directly to validate ONCE
    at stream start, pairing with meta_check='skip'/'once' on the
    per-trigger probe."""
    if not {"num_planes", "dim"} <= set(index.columns):
        return
    meta = (
        index.select("num_planes", "dim")
        .filter(F.col("num_planes").isNotNull() & F.col("dim").isNotNull())
        .limit(1)
        .collect()
    )
    if meta and (
        meta[0]["num_planes"] != num_planes or meta[0]["dim"] != dim
    ):
        raise ValueError(
            "incremental_embedding_near_dup: stored index was built "
            f"with num_planes={meta[0]['num_planes']}, "
            f"dim={meta[0]['dim']} but the probe was called with "
            f"num_planes={num_planes}, dim={dim} — bucket spaces are "
            "disjoint; probe with the index's parameters"
        )


# (index_token, num_planes, dim) triples whose stored metadata already
# validated in this process — the meta_check='once' cache
_META_VALIDATED: set[tuple[str, int, int]] = set()


def incremental_embedding_near_dup(
    new_vectors: DataFrame,
    index: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    dim: int = 64,
    meta_check: str = "always",
    index_token: str | None = None,
) -> DataFrame:
    """Probe a NEW ingest batch against a STORED embedding_buckets
    index — the semantic-dedup twin of dedup.incremental_dedup_pairs:
    never re-bucket or re-scan the corpus, only bucket the batch and
    equi-join the index on the bucket id (O(batch), not O(corpus)).

    Returns (new_vec_id, corpus_vec_id, cosine) pairs at or above
    `threshold`. Each vector owns exactly ONE bucket (single
    signature, not banded), so a pair can join at most once — no
    distinct pass needed.

    Delivery contract: AT-LEAST-ONCE under foreachBatch retries. If a
    retry fires AFTER the failed attempt already appended the batch's
    rows to the index, the replayed probe re-emits every pair AND
    emits within-batch pairs in both orientations (the join predicate
    is `!=`, not `<`, because the new/corpus roles are asymmetric).
    Sinks needing set-idempotency should normalize downstream —
    `least(new_vec_id, corpus_vec_id), greatest(...)` + dedup by that
    key — or append the index only after the pair sink commits.

    Parameter safety (check_embedding_index_meta): when the stored
    index carries the num_planes/dim metadata columns
    (embedding_buckets writes them), the first metadata-CARRYING row
    is validated against this probe's parameters — a mismatched probe
    would otherwise silently return near-zero recall (disjoint bucket
    spaces), the worst failure mode (no error, wrong answer). NOTE
    this is an EAGER bounded limit(1) Spark job at DataFrame-
    construction time. `meta_check` controls when it runs:

    - "always" (default): every call — right for ad-hoc/batch use.
    - "once": first call per `index_token` (required — e.g. the index
      path) per process; later triggers of a streaming foreachBatch
      loop skip the job. The token PINS the layout: rebuilding the
      index at the same path with different parameters mid-stream is
      outside the contract (same class as the keyed-table
      mergeBuckets sidecar pin).
    - "skip": never — pair with an explicit
      check_embedding_index_meta(...) at stream start.

    The check is deliberately bounded either way: an index whose rows
    disagree WITH EACH OTHER is corrupt by construction and is only
    probabilistically caught — proving internal consistency would
    cost a full metadata scan.

    The stored index side carries hint('merge'): the corpus index
    must never be a misestimated broadcast build side (the measured
    16x failure mode of derived-frame broadcasts); the batch side is
    left to AQE, which sees its true (small) shuffle size."""
    if meta_check not in ("always", "once", "skip"):
        raise ValueError("meta_check must be 'always', 'once' or 'skip'")
    if meta_check == "once":
        if not index_token:
            raise ValueError(
                "meta_check='once' needs an index_token identifying the "
                "stored index (e.g. its path)"
            )
        key = (index_token, num_planes, dim)
        if key not in _META_VALIDATED:
            check_embedding_index_meta(index, num_planes, dim)
            _META_VALIDATED.add(key)
    elif meta_check == "always":
        check_embedding_index_meta(index, num_planes, dim)
    probe = embedding_buckets(new_vectors, num_planes=num_planes, dim=dim)
    n, c = probe.alias("n"), index.hint("merge").alias("c")
    cos = _dot(F.col("n.embedding"), F.col("c.embedding")) / (
        F.col("n.nrm") * F.col("c.nrm")
    )
    return (
        n.join(
            c,
            (F.col("n.bucket") == F.col("c.bucket"))
            & (F.col("n.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("n.vec_id").alias("new_vec_id"),
            F.col("c.vec_id").alias("corpus_vec_id"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_planes: int | None = 8,
    dim: int = 64,
    corpus_size: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs: bucket by hyperplane signature,
    exact cosine within buckets, keep pairs above threshold.

    num_planes=None sizes the bucket count from the corpus
    (adaptive_num_planes); pass `corpus_size` when the caller already
    knows it to skip the count() action (one job saved per run on a
    100 TB corpus). Norms are computed ONCE per vector before
    the self-join — the pair stage only does one dot product, not a
    dot plus two norms."""
    if num_planes is None:
        num_planes = adaptive_num_planes(
            corpus_size if corpus_size is not None else embeddings.count()
        )
    # materialize the bucketed corpus ONCE (eager checkpoint, repo
    # cache policy): both salted sides below read it, and the upstream
    # may be a full-corpus Python embed stage (m_embed_near_dup's
    # embed_stub — 12.8 s at sf0.1) that must not run per side. This
    # makes composition run an action, like semantic_dedup /
    # dedup_clusters already do; at scale it is the standard
    # materialize-before-pair-join step of an ANN dedup run.
    base = embedding_buckets(
        embeddings, num_planes=num_planes, dim=dim
    ).localCheckpoint(eager=True)
    # SALTED within-bucket self-join (the semantic_dedup shape): the
    # pair stage costs CPU by PAIR count — quadratic in bucket size —
    # while its shuffle is byte-light, so an unsalted (bucket) join
    # gets AQE-coalesced onto a handful of tasks and serializes the
    # cosines (measured: 93.5 s of pair CPU on 9 tasks in
    # m_embed_near_dup). The a-side replicates over
    # B = defaultParallelism salt values, the b-side buckets by
    # vec_id % B; each pair is produced exactly once, at
    # salt = b.vec_id % B, for ANY B. The explicit repartition
    # (REPARTITION_BY_NUM — AQE never coalesces it) carries the salt
    # distribution into the join; shuffle_hash keeps AQE from
    # rewriting it as a broadcast of the corpus.
    width = embeddings.sparkSession.sparkContext.defaultParallelism
    a = base.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(width - 1)))
    ).alias("a")
    b = (
        base.withColumn(
            "salt", F.pmod(F.col("vec_id"), F.lit(width)).cast("int")
        )
        .repartition(width, "bucket", "salt")
        .alias("b")
    )
    cos = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cross_corpus_leakage(
    train: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Semantic decontamination: training docs whose EMBEDDING is a
    near-duplicate of an evaluation/benchmark doc — the
    cross-corpus counterpart of embedding_near_dup_pairs, catching
    paraphrased benchmark leakage that exact/13-gram decontamination
    (prep.decontaminate, bloom_decontaminate) misses by construction.

    Both sides are bucketed with the SAME hyperplane signatures, so a
    contaminated pair collides with probability 1 - (theta/pi)^planes
    per band, exactly like the self-join variant; exact cosine
    confirms within buckets.

    Plan for 100 TB: the EVAL side is benchmark-sized (10^3-10^6
    rows), so it is explicitly broadcast — the train corpus is scanned
    ONCE, map-side, with NO shuffle of training vectors at all
    (bucket + dot products run inside the scan stage). The output is
    pair-grain, bounded by |eval| x bucket-collision rate.

    Returns (eval_id, train_id, cosine), cosine rounded to 6dp.
    """
    planes = [_hyperplane(dim, p) for p in range(num_planes)]

    def bucketed(df: DataFrame) -> DataFrame:
        bits = []
        for p_idx, plane in enumerate(planes):
            arr = double_array(plane)
            bits.append(
                F.when(
                    _dot(F.col("embedding"), arr) >= 0, F.lit(1)
                ).otherwise(F.lit(0))
                * (2**p_idx)
            )
        sig = bits[0]
        for b in bits[1:]:
            sig = sig + b
        return df.select(
            "vec_id",
            "embedding",
            sig.alias("bucket"),
            _norm(F.col("embedding")).alias("nrm"),
        )

    t = bucketed(fan_out(train)).alias("t")
    e = bucketed(eval_df).alias("e")
    cos = _dot(F.col("t.embedding"), F.col("e.embedding")) / (
        F.col("t.nrm") * F.col("e.nrm")
    )
    return (
        t.join(F.broadcast(e), F.col("t.bucket") == F.col("e.bucket"))
        .select(
            F.col("e.vec_id").alias("eval_id"),
            F.col("t.vec_id").alias("train_id"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _centroid_scores(
    emb: F.Column, cents: list[tuple[int, list[float]]]
) -> F.Column:
    """array<struct<cos,cid>> of rounded cosine to each centroid —
    the shared cell-assignment arithmetic of ivf_topk and ivf_pq_topk
    (one spelling, one oracle replay)."""
    entries = []
    for cid, vec in cents:
        arr = double_array(vec)
        cos = F.round(_dot(emb, arr) / (_norm(emb) * _norm(arr)), 6)
        entries.append(
            F.struct(cos.alias("cos"), F.lit(int(cid)).alias("cid"))
        )
    return F.array(*entries)


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: assign every vector to its
    nearest centroid cell, probe only the query's `nprobe` closest
    cells, exact cosine re-rank within the candidate set.

    Centroid "training" is deterministic (the first `n_cells` vectors
    by id) so an oracle can replay the whole algorithm; pass
    `centroids=[(cid, vector), ...]` to plug real trained cells in —
    e.g. train_ivf_centroids output via
    `[(i, [v / FX_SCALE for v in c]) for i, c in enumerate(cents)]` —
    the plan shape is identical. Scale
    shape: assignment is a per-row expression over a centroid array
    literal (NO shuffle, no cross join — the aggregate runs inside
    WholeStageCodegen); the only shuffle is the bucket join, with the
    tiny probe side broadcast."""
    emb = F.col("embedding")

    if centroids is None:
        rows = (
            embeddings.filter(F.col("vec_id") < n_cells)
            .select("vec_id", "embedding")
            .orderBy("vec_id")
            .collect()
        )
        cents = [(int(r["vec_id"]), list(r["embedding"])) for r in rows]
    else:
        cents = centroids
        if len({len(v) for _, v in cents}) != 1:
            # zip_with would silently truncate to the shorter array
            raise ValueError("centroid vectors must share one dimensionality")

    def cell_scores() -> F.Column:
        return _centroid_scores(emb, cents)

    # argmax by (cos, cid): array_max on struct<cos,cid> — ties on the
    # rounded cosine resolve to the larger cid, mirrored in the oracle
    # per-vector assignment = n_cells dot products: the CPU-heavy
    # stage — widen skinny inputs so it parallelizes
    assigned = fan_out(embeddings).select(
        "vec_id",
        "embedding",
        _norm(emb).alias("nrm"),
        F.array_max(cell_scores())["cid"].alias("cell"),
    )
    probes = (
        assigned.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.slice(F.reverse(F.array_sort(cell_scores())), 1, nprobe).alias("cells"),
        )
        .select(
            "query_id", "q_emb", "q_nrm", F.explode(F.col("cells")["cid"]).alias("cell")
        )
    )
    cand = F.broadcast(probes).join(assigned, "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("q_emb"), emb) / (F.col("q_nrm") * F.col("nrm"))
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cos, 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def quantize_embeddings(
    embeddings: DataFrame, value_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = 127/max|x|,
    q_i = floor(x_i * scale + 0.5) — 4x storage cut for embedding
    corpora (the standard pre-ANN compression), dequantize by q/scale.

    Pure JVM-side array expressions (transform/aggregate) — zero
    shuffle, zero Python; at 100 TB this is a map-only rewrite of the
    embedding column. floor(x+0.5) is used instead of round() so the
    arithmetic is bit-identical across engines (the DuckDB oracle
    replays the same expression)."""
    v = F.col(value_col)
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(max_abs == 0, F.lit(0.0)).otherwise(F.lit(127.0) / max_abs)
    q = F.transform(v, lambda x: F.floor(x * scale + F.lit(0.5)).cast("byte"))
    return embeddings.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        q.alias("q"),
    )


def binary_quantize(
    embeddings: DataFrame, value_col: str = "embedding"
) -> DataFrame:
    """1-bit (sign) embedding quantization: bit d = 1 iff x_d > 0,
    packed MSB-first into 32-dim words (array<long>) — a 32x storage
    cut over float32 and the cheapest pre-filter in modern retrieval
    stacks (binary rescore-then-refine). 32 bits per word, not 64,
    so the MSB-first integer fold (acc*2 + bit) can never overflow a
    signed long regardless of dimension; the last word packs the
    remaining dims with fewer doublings.

    Pure JVM array expressions (sequence/transform/aggregate) — zero
    shuffle, map-only at 100 TB; the DuckDB oracle replays the same
    fold."""
    v = F.col(value_col)
    nw = (F.floor((F.size(v) - 1) / 32) + 1).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), nw),
        lambda w: F.aggregate(
            F.sequence((w - 1) * 32 + 1, F.least(w * 32, F.size(v))),
            F.lit(0).cast("long"),
            lambda acc, i: acc * 2
            + (F.element_at(v, i) > 0).cast("long"),
        ),
    )
    # guard: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty
    # (DuckDB's generate_series(1, 0) IS empty) — an empty embedding
    # must pack to an empty word array in both engines
    words = (
        F.when(v.isNull(), F.lit(None).cast("array<long>"))
        .when(F.size(v) > 0, words)
        .otherwise(F.array().cast("array<long>"))
    )
    return embeddings.select("vec_id", words.alias("bits"))


def hamming_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    max_exact_vectors: int | None = 1_000_000,
) -> DataFrame:
    """Exact top-k by Hamming distance over sign-quantized bits: the
    binary twin of cosine_topk — query side broadcast, one corpus
    pass, distance = sum of bit_count(xor) per word (whole-stage
    codegen, ~32x less data touched than float scoring, which is why
    the exact-baseline bound is 10x cosine_topk's). Ties break on
    neighbor_id for engine-exact output."""
    _exact_corpus_guard(
        embeddings,
        max_exact_vectors,
        "hamming_topk",
        "pre-filter with lsh_bucketed_topk buckets",
    )
    bits = binary_quantize(embeddings)
    q = bits.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("bits").alias("q_bits")
    )
    c = fan_out(bits).select(
        F.col("vec_id").alias("neighbor_id"), F.col("bits").alias("c_bits")
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # heterogeneous dimensions: zip_with pads the shorter bits
        # array with NULL -> NULL distance; an ascending sort would
        # rank such garbage pairs FIRST, so drop them outright
        .filter(F.size("q_bits") == F.size("c_bits"))
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("q_bits"),
            F.col("c_bits"),
            lambda a, b: F.bit_count(a.bitwiseXOR(b)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc_nulls_last(), F.col("neighbor_id").asc()
    )
    return (
        pairs.select("query_id", "neighbor_id", dist.alias("hamming"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "hamming", "rank")
    )


FX_SCALE = 1 << 20  # fixed-point grid: 2^-20 resolution


def _fx(col: F.Column) -> F.Column:
    """Fixed-point projection: floor(x * 2^20) as long. Exact in both
    engines (float->double cast is exact; double mul + floor is IEEE)."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * FX_SCALE).cast("long")
    )


def _fx_cell_scores_over(cents_col: F.Column) -> F.Column:
    """array<struct<d,cid>> of exact squared fixed-point distances from
    F.col("fx") to each entry of `cents_col` (array<struct<cid,c>>) —
    the SAME arithmetic as the literal-matrix transform in
    train_ivf_centroids, expressed over a DATA column instead of a
    codegen literal, so the two assignment paths are bit-identical by
    construction."""
    return F.transform(
        cents_col,
        lambda s: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col("fx"), s["c"], lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
            s["cid"].alias("cid"),
        ),
    )


def assign_cells_fx(fxd: DataFrame, centroids_df: DataFrame) -> DataFrame:
    """Broadcast-table cell assignment for LARGE k: instead of a
    k*dim literal matrix (whose generated code grows with k until
    Janino compilation dominates — fine at k<=~256, wrong at k=10^5),
    the centroid table rides in as ONE broadcast row (array of
    structs) cross-joined to the corpus. Plan: BroadcastNestedLoopJoin
    against a 1-row build side — map-only over the corpus, NO corpus
    shuffle, no per-vector row explosion (the k candidates stay inside
    one array expression per row, exactly like the literal path).

    fxd: (vec_id, fx array<long>); centroids_df: (cid int, c
    array<long>). Returns (vec_id, fx, cell, sq_dist) — bit-identical
    to the literal-matrix assignment (same exact long arithmetic, same
    lexicographic (d, cid) argmin; verified by property test)."""
    cent_row = centroids_df.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cid"), F.col("c")))
        ).alias("__cents")
    )
    m = F.array_min(_fx_cell_scores_over(F.col("__cents")))
    return (
        fxd.join(F.broadcast(cent_row))
        .select(
            "vec_id",
            "fx",
            m["cid"].alias("cell"),
            m["d"].alias("sq_dist"),
        )
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    value_col: str = "embedding",
    assignment: str = "literal",
    with_assignments: bool = True,
):
    """Distributed Lloyd k-means for IVF cell training, on FIXED-POINT
    embeddings: every distance and centroid update is exact long
    arithmetic, so the result is bit-identical at any partition count
    and any execution order — the reproducibility property float
    k-means fundamentally lacks (float sums reorder under shuffle).
    Resolution loss is 2^-20 per dim — far below float32 noise.

    Plan shape per iteration (the canonical scalable k-means):
      - assignment: per-row expression over k*dim centroid LITERALS —
        map-only, no shuffle, no cross join, runs in codegen;
      - update: one groupBy("cell") with per-dim long sums (partial
        aggregation map-side), k rows collected to the driver.
    Init is deterministic: the k lowest vec_ids. Empty cells keep
    their previous centroid. Returns (centroids, assignments) where
    assignments = (vec_id, cell, sq_dist) — all exact longs.

    At 100 TB: per-iteration cost is one scan + one k-row shuffle;
    centroids (k*dim longs) stay driver-side like the 8-row IVF
    centroid collect in ivf_topk. For huge k pass
    assignment="broadcast": the centroid matrix rides as ONE broadcast
    data row (assign_cells_fx) instead of a codegen literal whose
    Janino compile time grows with k — same exact arithmetic, same
    map-only no-corpus-shuffle plan, bit-identical output (property
    test pins literal == broadcast).

    with_assignments=False skips the final assignment pass entirely
    and returns (cents, None): the last Lloyd iteration exists ONLY to
    produce assignments (its stats never feed a centroid update), so
    centroid-only callers (ivf_pq_topk, ivf_pq_residual_topk,
    s_ann_ivf_trained) were paying a full corpus HOF pass plus an
    eager checkpoint for a frame they immediately discarded.
    """
    if assignment not in ("literal", "broadcast"):
        raise ValueError("assignment must be 'literal' or 'broadcast'")
    fxd = fan_out(embeddings).select(
        "vec_id", _fx(F.col(value_col)).alias("fx")
    )
    # iterative training drives one action per Lloyd update plus the
    # final assignment — without a persist each action re-parses and
    # re-fixes the whole corpus from parquet. The cached form is
    # (vec_id, dim longs): small relative to the raw table, and
    # exactly what a cluster job would persist before k-means.
    # The persist is UNDONE before returning (see below): a fragment
    # left in the CacheManager gets substituted into downstream
    # self-joins that share this lineage (semantic_dedup's cellmates)
    # and miscompiles to INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND
    # ("Could not find fx#N") whenever any earlier plan ran in the
    # session.
    fxd = fxd.persist()
    try:
        return _train_ivf_fx(
            fxd,
            k=k,
            iters=iters,
            assignment=assignment,
            with_assignments=with_assignments,
        )
    finally:
        fxd.unpersist()


def _train_ivf_fx(
    fxd: DataFrame,
    k: int,
    iters: int,
    assignment: str = "literal",
    with_assignments: bool = True,
    init_rows: list | None = None,
):
    """Lloyd core over a PRE-MATERIALIZED (vec_id, fx array<long>)
    frame (persisted by train_ivf_centroids, or an eager
    localCheckpoint shared with a PQ trainer — ivf_pq_topk). Takes an
    optional pre-collected init row list so two trainers sharing one
    frame can also share ONE bounded init collect; rows must cover
    vec_id 0..k-1 (extra rows are ignored). Arithmetic and outputs are
    bit-identical to the historical inline body."""
    if init_rows is None:
        init_rows = (
            fxd.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
        )
    init = [r for r in init_rows if r["vec_id"] < k]
    if len(init) < k:
        raise ValueError(f"need vec_id 0..{k-1} present for deterministic init")
    cents = [list(r["fx"]) for r in init]
    dim = len(cents[0])

    assigned = None
    for it in range(iters):
        if it == iters - 1 and not with_assignments:
            break
        # centroids as ONE array-of-arrays literal + a generic transform
        # loop: the generated code is a small nested loop over literal
        # DATA, not k unrolled copies of the distance expression —
        # k unrolled copies made Janino compilation (seconds) dominate
        # execution (milliseconds) on small inputs; the matrix is ONE
        # expr call (per-element F.lit cost 10+ s of py4j round trips
        # per iteration on high-latency hosts — functions/litx.py)
        if assignment == "broadcast":
            cents_df = local_df(
                fxd.sparkSession,
                [(ci, c) for ci, c in enumerate(cents)],
                "cid int, c array<bigint>",
            )
            assigned = assign_cells_fx(fxd, cents_df)
        else:
            cent_lit = long_matrix(cents)
            scores = F.transform(
                cent_lit,
                lambda c, i: F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col("fx"), c, lambda a, b: (a - b) * (a - b)
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    i.alias("cid"),
                ),
            )
            m = F.array_min(scores)  # lexicographic: min dist, then min cid
            # intermediate passes feed ONLY the stats agg (cell + fx
            # sums); the final pass carries the whole struct so cid
            # and d can be split AFTER the checkpoint — extracting
            # both fields here would duplicate the interpreted
            # array_min-over-HOF tree in the projection (2x the
            # first-evaluation cost; see _pq_train_encode_fx)
            if it == iters - 1:
                assigned = fxd.select("vec_id", m.alias("__m"))
            else:
                assigned = fxd.select(
                    "vec_id", "fx", m["cid"].alias("cell")
                )
        if it == iters - 1:
            break
        stats = (
            assigned.groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                *[F.sum(F.col("fx")[i]).alias(f"s{i}") for i in range(dim)],
            )
            .collect()
        )
        by_cell = {r["cell"]: r for r in stats}
        cents = [
            [int(by_cell[ci][f"s{i}"]) // int(by_cell[ci]["cnt"]) for i in range(dim)]
            if ci in by_cell
            else cents[ci]  # empty cell: keep previous centroid
            for ci in range(k)
        ]
    # materialize the final assignment OFF the cached lineage, then drop
    # the cache entry: callers get a checkpoint with fixed output
    # attributes (safe under any downstream self-join), and the fragment
    # can't be cache-substituted into later plans. The literal path
    # checkpoints the (vec_id, struct) form and splits cid/d above the
    # materialized scan — one HOF evaluation per row instead of two.
    if not with_assignments:
        out = None
    elif assignment == "literal":
        out = assigned.localCheckpoint(eager=True).select(
            "vec_id",
            F.col("__m")["cid"].alias("cell"),
            F.col("__m")["d"].alias("sq_dist"),
        )
    else:
        out = assigned.select("vec_id", "cell", "sq_dist").localCheckpoint(
            eager=True
        )
    return cents, out


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication of an embedding corpus — k-means cluster the space,
    find cosine near-duplicate PAIRS only within each cluster, form
    connected components, keep the lowest vec_id per component.

    Returns (vec_id, rep, keep): rep = canonical representative of the
    semantic-dup group (itself when unpaired), keep = vec_id == rep.

    Scale design — the whole point of SemDeDup: clustering bounds the
    quadratic pair term to sum_cells(|cell|^2) instead of N^2. The
    cluster assignment is the exact fixed-point k-means
    (train_ivf_centroids), so results are reproducible at any
    parallelism. Cosines are rounded to 6dp before thresholding,
    mirrored in the oracle. Clustering of the pair graph reuses
    dedup_clusters' min-label propagation (O(diameter) rounds).

    The within-cell self-join is SALTED: k cells = k join keys, far
    fewer than the cores, so the CPU-heavy cosine stage (interpreted
    HOF lambdas) would serialize on however many cells have data. The
    a-side replicates over B = defaultParallelism salt values and the
    b-side buckets by vec_id % B, so joining on (cell, salt) spreads
    each cell's |cell|^2 pair work over B tasks — every pair (a < b)
    is produced exactly once, at salt = b.vec_id % B, for ANY B. This
    replaced a repartition + localCheckpoint of the candidate pairs
    WITH their embedding payloads (~122 MB shuffled at sf0.1 and
    growing with the pair count) by a B-fold replication of the
    corpus itself (~17 MB — grows with the corpus, not the pairs);
    the cosine is projected inside the join stage so pair payloads
    never move. The explicit repartition carries the salt
    distribution into the join (REPARTITION_BY_NUM, which AQE never
    coalesces — unhinted, AQE folds the ~17 MB shuffle to one task
    and serializes the cosines again). It also doubles as the hot-key
    splitter: a skewed cell is exactly what the salt dimension
    spreads.
    """
    from geist_spark.operators.dedup import dedup_clusters

    _, asg = train_ivf_centroids(embeddings, k=k, iters=iters)
    # per-ROW norms here: N norm evaluations instead of 2 per PAIR —
    # same doubles (a deterministic scalar of the row's array), so the
    # rounded cosine is bit-identical, but the interpreted-HOF work
    # left per pair is one dot product.
    cellmates = (
        embeddings.select("vec_id", "embedding")
        .join(asg.select("vec_id", "cell"), "vec_id")
        .withColumn("nrm", _norm(F.col("embedding")))
    )
    width = embeddings.sparkSession.sparkContext.defaultParallelism
    a = cellmates.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(width - 1)))
    ).alias("a")
    # the explicit repartition rides the STREAM side into the join
    # (REPARTITION_BY_NUM — AQE never coalesces it: the post-filter
    # pair stream is a few hundred KB, so unhinted AQE folds the
    # stream to ~8 tasks and serializes the per-pair cosines, which
    # cost CPU by PAIR count, not by byte count). The shuffle_hash
    # hint keeps AQE from rewriting the join as a broadcast for the
    # same reason — build the small unreplicated side per partition
    # instead.
    b = (
        cellmates.withColumn(
            "salt", F.pmod(F.col("vec_id"), F.lit(width)).cast("int")
        )
        .repartition(width, "cell", "salt")
        .alias("b")
    )
    ea, eb = F.col("a.embedding"), F.col("b.embedding")
    cos = F.round(_dot(ea, eb) / (F.col("a.nrm") * F.col("b.nrm")), 6)
    pairs = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("doc_a"),
            F.col("b.vec_id").alias("doc_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        # materialize the SKINNY thresholded pairs before
        # dedup_clusters: its bounded edge probe is an incremental
        # limit() (1, 4, 16, ... partitions per round), which over a
        # live plan runs the quadratic cosine stage a few partitions
        # at a time — serially. One eager checkpoint computes it once
        # at full width; the probe then re-reads materialized KBs.
        # (The OLD checkpoint here carried the pair embeddings —
        # ~122 MB; post-filter pairs are 3 scalars/row.)
        .localCheckpoint(eager=True)
    )
    labels = dedup_clusters(pairs).withColumnRenamed("doc_id", "vec_id")
    rep = F.coalesce("cluster_id", F.col("vec_id"))
    return (
        embeddings.select("vec_id")
        .join(labels, "vec_id", "left")
        .select(
            "vec_id",
            rep.alias("rep"),
            (rep == F.col("vec_id")).alias("keep"),
        )
    )


def ann_recall_report(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_planes: int = 4,
    max_exact_vectors: int | None = 100_000,
) -> DataFrame:
    """Recall@k of the LSH-bucketed ANN against exact brute force —
    the accuracy meter an approximate-retrieval deployment tunes
    num_planes/probes against. Both sides run in ONE lazy plan (the
    corpus is scanned for each, but nothing is collected); the match
    join is on (query_id, neighbor_id), per-query recall = |approx ∩
    exact| / k. At 100 TB this runs on a sampled probe set — recall
    is a statistic, not a per-corpus pass. The exact side inherits the
    exact-baseline size gate (guarded ONCE here, followable at this
    API; None opts out)."""
    _exact_corpus_guard(
        embeddings, max_exact_vectors, "ann_recall_report",
        "sample the probe corpus or raise max_exact_vectors",
    )
    exact = cosine_topk(
        embeddings, query_ids, k=k, max_exact_vectors=None
    ).select(
        "query_id", "neighbor_id"
    )
    approx = lsh_bucketed_topk(
        embeddings, query_ids=query_ids, k=k, num_planes=num_planes
    ).select("query_id", "neighbor_id")
    matched = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    qs = exact.select("query_id").distinct()
    return qs.join(matched, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_matched"),
        F.round(F.coalesce(F.col("n"), F.lit(0)) / F.lit(float(k)), 6).alias(
            "recall"
        ),
    )


def pq_train_encode(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    value_col: str = "embedding",
):
    """Product quantization (Jegou et al., PAMI 2011): split each
    vector into `m` contiguous subspaces, train a k-entry codebook per
    subspace with fixed-point Lloyd (exact long arithmetic — the same
    bit-identical-at-any-parallelism property as train_ivf_centroids),
    and encode every vector as `m` small codes. Compression here:
    dim*4 bytes -> m codes (m bytes at k<=256).

    All m subspaces train in ONE pass per iteration: subvectors are
    posexploded to (vec_id, sub_id, sfx) rows and the Lloyd update is
    a single groupBy(sub_id, cell) — m*k result rows — instead of m
    separate scan+aggregate rounds. Assignment is a map-only
    expression over the [m][k][dsub] codebook literal. Init is
    deterministic (subvectors of the k lowest vec_ids).

    Returns (codebooks, codes) where codebooks[j][c] is a list of dsub
    longs and codes = (vec_id, codes array<int> of length m).
    """
    fxd = fan_out(embeddings).select(
        "vec_id", _fx(F.col(value_col)).alias("fx")
    )
    return _pq_train_encode_fx(fxd, m=m, k=k, iters=iters)


def _pq_train_encode_fx(
    fxd: DataFrame,
    m: int,
    k: int,
    iters: int,
    init_rows: list | None = None,
):
    """PQ Lloyd core over a PRE-FIXED (vec_id, fx array<long>) frame —
    shared by pq_train_encode (raw vectors) and ivf_pq_residual_topk
    (IVF residuals, which are already exact longs). Same deterministic
    init (subvectors of the k lowest vec_ids) and exact long
    arithmetic. `init_rows` lets a caller that already collected the
    low-vec_id rows (ivf_pq_topk's shared init) skip the collect; rows
    beyond vec_id k-1 are ignored."""
    # ONE bounded collect serves both the dim probe and the
    # deterministic init (subvectors of the k lowest vec_ids), instead
    # of a separate first() job
    if init_rows is None:
        init_rows = (
            fxd.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
        )
    init_rows = [r for r in init_rows if r["vec_id"] < k]
    if len(init_rows) < k:
        raise ValueError(f"need vec_id 0..{k-1} present for deterministic init")
    dim = len(init_rows[0]["fx"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    # books[j][c] = centroid c of subspace j (driver-side slicing of the
    # same rows the executor-side posexplode would produce)
    books = [
        [list(r["fx"][j * dsub : (j + 1) * dsub]) for r in init_rows]
        for j in range(m)
    ]

    # (vec_id, sub_id, sfx): one row per subspace — the training grain
    sub = fxd.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.slice(
                    F.col("fx"), j * dsub + 1, dsub
                ),
            )
        ).alias("sub_id", "sfx"),
    ).persist()

    assigned = None
    for it in range(iters):
        # one expr call per subspace matrix (see functions/litx.py)
        book_lit = F.array(*[long_matrix(books[j]) for j in range(m)])
        scores = F.transform(
            F.element_at(book_lit, F.col("sub_id") + 1),
            lambda c, i: F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("sfx"), c, lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("d"),
                i.alias("cid"),
            ),
        )
        mn = F.array_min(scores)  # lexicographic: min dist, then min cid
        # only the winning cid is consumed downstream (stats needs
        # cell+sfx, codes needs cell) — extracting the distance too
        # would evaluate the interpreted array_min-over-HOF a second
        # time per row (no CSE for interpreted HOFs)
        assigned = sub.select(
            "vec_id",
            "sub_id",
            "sfx",
            mn["cid"].alias("cell"),
        )
        if it == iters - 1:
            break
        stats = (
            assigned.groupBy("sub_id", "cell")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                *[
                    F.sum(F.col("sfx")[i]).alias(f"s{i}")
                    for i in range(dsub)
                ],
            )
            .collect()
        )
        by_key = {(r["sub_id"], r["cell"]): r for r in stats}
        books = [
            [
                [
                    int(by_key[(j, ci)][f"s{i}"]) // int(by_key[(j, ci)]["cnt"])
                    for i in range(dsub)
                ]
                if (j, ci) in by_key
                else books[j][ci]  # empty cell keeps previous centroid
                for ci in range(k)
            ]
            for j in range(m)
        ]
    codes = (
        assigned.groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("sub_id", "cell"))
                ),
                lambda s: s.getField("cell").cast("int"),
            ).alias("codes")
        )
    )
    # same cache hygiene as train_ivf_centroids: materialize the result
    # off the cached lineage, then drop the cache entry so the fragment
    # can't be substituted into a later plan in the session
    codes = codes.localCheckpoint(eager=True)
    sub.unpersist()
    return books, codes


def _adc_distance_tables(
    embeddings: DataFrame,
    query_ids: list[int],
    books: list,
    fx_col: str | None = None,
) -> DataFrame:
    """Per-query ADC distance tables: exact squared distance from each
    query SUBvector to every codebook entry — an m x k long table per
    query, built driver-side from one bounded |Q|-row collect (m*k is
    tiny). Shared by pq_adc_topk and ivf_pq_topk so the ADC arithmetic
    has exactly one spelling. `fx_col` names a column that ALREADY
    carries _fx(embedding) (ivf_pq_topk's shared checkpoint) — same
    values, one fewer HOF evaluation. Output:
    (query_id, dt array<array<long>>).
    """
    m = len(books)
    dsub = len(books[0][0])
    qfx_expr = (
        F.col(fx_col) if fx_col is not None else _fx(F.col("embedding"))
    )
    q = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select("vec_id", qfx_expr.alias("qfx"))
        .collect()
    )
    rows = []
    for r in q:
        qfx = list(r["qfx"])
        dt = [
            [
                sum((qfx[j * dsub + i] - c[i]) ** 2 for i in range(dsub))
                for c in books[j]
            ]
            for j in range(m)
        ]
        rows.append((r["vec_id"], dt))
    return local_df(
        embeddings.sparkSession, rows, "query_id long, dt array<array<long>>"
    )


def _adc_score_topk(cand: DataFrame, k_top: int) -> DataFrame:
    """Shared ADC scoring tail: sum_j dt[j][code_j] in pure long table
    lookups over (query_id, vec_id, codes, dt) candidate rows, then the
    per-query top-k window (ties by neighbor id)."""
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.aggregate(
            F.zip_with(
                F.col("codes"),
                F.col("dt"),
                lambda code, row: F.element_at(row, code + 1),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("approx_sq_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_sq_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select("query_id", "neighbor_id", "approx_sq_dist", "rank")
    )


def pq_adc_topk(
    embeddings: DataFrame,
    codes: DataFrame,
    books: list,
    query_ids: list[int],
    k_top: int = 5,
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ search: per query, precompute the
    exact squared distance from each query SUBvector to every codebook
    entry (an m x k long table, driver-side — m*k tiny), then score
    the whole corpus with a pure table lookup:
    approx_dist = sum_j dt[j][code_j].

    This is the PQ payoff at 100 TB: the scan reads m ints per vector
    (not dim floats), the per-row work is m array lookups in codegen,
    there is NO shuffle until the final per-query top-k window, and
    the distance tables ride along as literals (the query side is a
    broadcast of |Q| rows). All-long arithmetic -> oracle bit-exact.
    """
    qdf = _adc_distance_tables(embeddings, query_ids, books)
    cand = codes.crossJoin(F.broadcast(qdf)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    return _adc_score_topk(cand, k_top)


def lsh_multiprobe_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Multi-probe LSH (Lv et al., VLDB 2007 shape): each QUERY probes
    its own bucket plus every Hamming-distance-1 bucket (one sign bit
    flipped — the buckets a near neighbor most likely fell into), then
    exact cosine re-rank. Recall rises toward brute-force at the cost
    of (num_planes+1)x more candidate pairs — but ONLY the tiny query
    side fans out; the corpus is still bucketed once and never
    replicated, so the plan is the same broadcast bucket join as
    single-probe LSH with a slightly larger broadcast.

    The standard recall/latency lever when adding planes (smaller
    buckets) starts missing neighbors: probe more, don't bucket less.
    """
    planes = [_hyperplane(dim, p) for p in range(num_planes)]

    def signature(emb: F.Column) -> F.Column:
        bits = []
        for p_idx, plane in enumerate(planes):
            arr = double_array(plane)
            bit = F.when(_dot(emb, arr) >= 0, F.lit(1)).otherwise(F.lit(0))
            bits.append(bit * (2**p_idx))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    base = fan_out(embeddings).withColumn(
        "bucket", signature(F.col("embedding"))
    ).withColumn("nrm", _norm(F.col("embedding")))
    # query side: own bucket + each single-bit flip (XOR with 2^i)
    probe_buckets = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(2**i))
            for i in range(num_planes)
        ],
    )
    q = (
        base.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.explode(probe_buckets).alias("bucket"),
        )
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
        F.col("bucket"),
    )
    pairs = F.broadcast(q).join(c, "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    # a neighbor can match through several probes: reduce to one row
    # per (query, neighbor) before ranking
    scored = (
        pairs.select(
            "query_id", "neighbor_id", F.round(cos, 6).alias("cosine")
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hard_negative_mining(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_planes: int = 4,
    dim: int = 64,
    near_dup_threshold: float = 0.999,
    overfetch: int = 4,
) -> DataFrame:
    """Hard negatives for contrastive training: each anchor's NEAREST
    neighbors that are NOT its near-duplicates. sample_negatives draws
    easy random negatives; the informative ones sit close to the
    anchor — but the closest candidates of all are duplicates, which
    would be FALSE negatives. So: ANN candidates (bucketed LSH,
    overfetched k*overfetch), minus the anchor's near-dup cluster
    (embedding_near_dup_pairs -> connected components), re-ranked.

    Plan: the LSH candidate join + one clusters computation over the
    near-dup PAIR graph (not the corpus) + two label lookups + a
    re-rank window. Overfetch bounds the risk of losing all k to
    cluster exclusion (an anchor inside a dup family bigger than
    k*(overfetch-1) can come up short — rows are survivors, never
    padding).
    """
    from geist_spark.operators.dedup import dedup_clusters

    cand = lsh_bucketed_topk(
        embeddings, query_ids, k=k * overfetch, num_planes=num_planes, dim=dim
    )
    pairs = embedding_near_dup_pairs(
        embeddings,
        threshold=near_dup_threshold,
        num_planes=num_planes,
        dim=dim,
    ).select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    labels = dedup_clusters(pairs)
    la = labels.select(
        F.col("doc_id").alias("__qid"), F.col("cluster_id").alias("__qcl")
    )
    lb = labels.select(
        F.col("doc_id").alias("__nid"), F.col("cluster_id").alias("__ncl")
    )
    kept = (
        cand.join(la, cand.query_id == la.__qid, "left")
        .join(lb, cand.neighbor_id == lb.__nid, "left")
        .filter(
            F.col("__qcl").isNull()
            | F.col("__ncl").isNull()
            | (F.col("__qcl") != F.col("__ncl"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        kept.withColumn("hn_rank", F.row_number().over(w))
        .filter(F.col("hn_rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "hn_rank")
    )


def source_centroid_drift(
    embeddings: DataFrame,
    doc_meta: DataFrame,
    dim: int = 64,
) -> DataFrame:
    """Embedding-space drift between sources: fixed-point centroid per
    source (exact integer sums + floor division — bit-identical at any
    parallelism, like the Lloyd family), then pairwise cosine between
    centroids. Low cross-source centroid cosine = the sources occupy
    different regions (expected); a previously-distinct source
    drifting toward another is the signal worth alerting on.

    Plan: one join (embedding id -> source), ONE aggregation with
    dim sum columns per source, then a self-join over the
    sources-sized (metadata-grain) centroid table. Nothing here
    scales with corpus size except the first aggregation scan.

    Output: (src_a, src_b, cosine) for src_a < src_b.
    """
    joined = embeddings.join(
        doc_meta.select(
            F.col("doc_id").alias("vec_id"), "source"
        ),
        "vec_id",
    ).select("source", _fx(F.col("embedding")).alias("fx"))
    sums = joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("cnt"),
        *[F.sum(F.col("fx")[i]).alias(f"s{i}") for i in range(dim)],
    )
    # exact floor division for possibly-negative sums: pmod yields the
    # non-negative remainder, so (s - pmod(s, cnt)) is exactly
    # divisible and the double division is lossless
    cent = sums.select(
        "source",
        F.array(
            *[
                (
                    (F.col(f"s{i}") - F.pmod(F.col(f"s{i}"), F.col("cnt")))
                    / F.col("cnt")
                ).cast("long")
                for i in range(dim)
            ]
        ).alias("c"),
    )
    a = cent.select(F.col("source").alias("src_a"), F.col("c").alias("ca"))
    b = cent.select(F.col("source").alias("src_b"), F.col("c").alias("cb"))
    # the centroid table is source-count-sized (metadata grain), but an
    # unhinted inequality self-join still plans as CartesianProduct,
    # which re-partitions both sides n^2 ways; broadcasting one side
    # keeps it a single-stage BroadcastNestedLoopJoin
    pairs = a.join(F.broadcast(b), F.col("src_a") < F.col("src_b"))
    cos = _dot(F.col("ca"), F.col("cb")) / (
        _norm(F.col("ca")) * _norm(F.col("cb"))
    )
    return pairs.select(
        "src_a", "src_b", F.round(cos, 6).alias("cosine")
    )


def lsh_tuning_curve(
    embeddings: DataFrame,
    min_planes: int = 2,
    max_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """LSH tuning curve — candidate-pair count at EVERY plane count in
    [min_planes, max_planes] from ONE self-join: buckets at p+1 planes
    refine buckets at p planes (the signature is a bit-prefix), so a
    single join on the COARSEST bucket finds every pair any setting
    would, and each pair's deepest agreeing signature prefix says
    which settings keep it. The "how many planes do I need" question
    answered in one pass instead of max-min+1 reruns.

    Output: (planes, n_candidate_pairs), monotonically non-increasing
    in planes. Join volume is the min_planes-bucket pair count — pick
    min_planes high enough that the coarse join itself is tractable
    (the same consideration as running LSH at min_planes).
    """
    planes = [_hyperplane(dim, p) for p in range(max_planes)]
    bit_cols = []
    for p_idx, plane in enumerate(planes):
        arr = double_array(plane)
        bit_cols.append(
            F.when(_dot(F.col("embedding"), arr) >= 0, F.lit(1))
            .otherwise(F.lit(0))
            .alias(f"b{p_idx}")
        )
    base = fan_out(embeddings).select(
        F.col("vec_id").alias("vid"), *bit_cols
    )
    coarse = sum(
        (F.col(f"b{i}") * (2**i) for i in range(min_planes)), F.lit(0)
    )
    base = base.withColumn("bucket", coarse)
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vid") < F.col("b.vid")),
    )
    # deepest agreeing prefix: min_planes + consecutive agreement of
    # the remaining bits, stopping at the first disagreement
    depth = F.lit(min_planes)
    alive = F.lit(True)
    for i in range(min_planes, max_planes):
        agree = F.col(f"a.b{i}") == F.col(f"b.b{i}")
        alive = alive & agree
        depth = depth + alive.cast("int")
    hist = pairs.select(depth.alias("agree_depth")).groupBy(
        "agree_depth"
    ).agg(F.count(F.lit(1)).alias("n"))
    # cumulative: pairs at depth >= p survive p planes
    w = Window.orderBy(F.col("agree_depth").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        hist.withColumn("n_candidate_pairs", F.sum("n").over(w))
        .select(
            F.col("agree_depth").alias("planes"),
            "n_candidate_pairs",
        )
    )


def hybrid_search(
    documents: DataFrame,
    embeddings: DataFrame,
    query_ids: list[int],
    k_list: int = 10,
    k_top: int = 5,
    k_rrf: int = 60,
    max_exact_vectors: int | None = 100_000,
) -> DataFrame:
    """Hybrid retrieval: BM25 (lexical) and exact cosine (semantic)
    candidate lists fused by Reciprocal Rank Fusion (Cormack et al.
    2009) — the standard two-tower + keyword production pattern.

    Each query is a document (query_ids index both tables): its first
    3 tokens form the lexical query; its embedding is the semantic
    query. RRF contribution per list = 1e9 div (k_rrf + rank) — pure
    INTEGER division of exact ranks, so fused scores are exact BIGINT
    sums (no IEEE anywhere) and the fusion is bit-replayable. A doc in
    only one list contributes only that list's term (full outer
    merge).

    Scale shape: both rankers are the existing operators (bm25_topk's
    query-term broadcast; cosine_topk's broadcast query side — swap in
    lsh_bucketed_topk for ANN at corpus scale, same interface); the
    fusion joins two k_list-per-query tables — metadata-sized — and
    takes a per-query top-k window.
    """
    from geist_spark.operators.dedup import tokens
    from geist_spark.operators.text import bm25_topk

    qterms = (
        documents.filter(F.col("doc_id").isin(query_ids))
        .select(
            F.col("doc_id").cast("int").alias("query_id"),
            F.explode(F.slice(tokens(F.col("text")), 1, 3)).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()  # a repeated token among the first 3 must not
        # double-count its BM25 contribution
    )
    # rank parity with cosine_topk (which excludes self BEFORE
    # ranking): overfetch one slot, drop the self-match, re-rank on
    # the exact integer scores — otherwise the best lexical hit could
    # never earn rank 1 for a corpus-held query and the fusion would
    # systematically underweight the lexical list
    bm_raw = bm25_topk(documents, qterms, k_top=k_list + 1).filter(
        F.col("doc_id") != F.col("query_id")
    )
    wb = Window.partitionBy("query_id").orderBy(
        F.col("score_nanos").desc(), F.col("doc_id").asc()
    )
    bm = (
        bm_raw.withColumn("rank", F.row_number().over(wb))
        .filter(F.col("rank") <= k_list)
    )
    cos = cosine_topk(
        embeddings, query_ids, k=k_list, max_exact_vectors=max_exact_vectors
    )

    rrf = lambda r: F.expr(f"1000000000 div ({k_rrf} + {r})")  # noqa: E731
    bm_c = bm.select(
        "query_id", "doc_id", rrf("rank").alias("bm_rrf")
    )
    cos_c = cos.select(
        F.col("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        rrf("rank").alias("cos_rrf"),
    )
    fused = (
        bm_c.join(cos_c, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            (
                F.coalesce(F.col("bm_rrf"), F.lit(0))
                + F.coalesce(F.col("cos_rrf"), F.lit(0))
            ).alias("rrf_nanos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_nanos").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select("query_id", "rank", "doc_id", "rrf_nanos")
    )


def mutual_knn_graph(
    embeddings: DataFrame,
    k: int = 5,
    candidates: DataFrame | None = None,
    max_exact_vectors: int | None = 100_000,
) -> DataFrame:
    """Mutual k-NN graph over an embedding corpus: undirected edges
    (id_a < id_b) where EACH endpoint ranks the other inside its own
    cosine top-k. Mutuality is the standard symmetrization for
    graph-based corpus analysis (SemDeDup-style clustering, label
    propagation, coreset selection): one-sided kNN edges from dense
    hubs are exactly the edges mutuality drops.

    Default path is the exact baseline: corpus x corpus scored
    all-pairs (one side broadcast). That is O(N^2) BY DEFINITION of
    exact kNN and is the right plan only up to ~1e5 vectors. The 100
    TB path passes `candidates` — (id_a, id_b) pairs from
    lsh_bucketed_topk / ivf_topk bucketing (never all-pairs); ranks
    are then computed within the candidate graph only, so recall
    follows the candidate generator's recall while the plan stays
    bucket-local.

    Ranking mirrors cosine_topk exactly: cosine in double, rounded to
    6dp BEFORE ranking, ties by neighbor id — so a DuckDB oracle
    replays it bit-for-bit. Output: (id_a, id_b, cosine) with both
    directed ranks <= k (enforced by requiring BOTH directions to
    survive the per-source top-k window).
    """
    e = embeddings.select(
        F.col("vec_id"),
        F.col("embedding").alias("emb"),
        _norm(F.col("embedding")).alias("nrm"),
    )
    if candidates is None:
        # the default broadcasts the WHOLE corpus — a scan-product that
        # must never reach cluster scale unguarded; the bounded probe
        # raises above the documented exact-baseline regime
        _exact_corpus_guard(
            embeddings,
            max_exact_vectors,
            "mutual_knn_graph",
            "pass candidates= from lsh_bucketed_topk/ivf_topk bucketing",
        )
        a = e.select(
            F.col("vec_id").alias("src"),
            F.col("emb").alias("a_emb"),
            F.col("nrm").alias("a_nrm"),
        )
        b = fan_out(e).select(
            F.col("vec_id").alias("dst"),
            F.col("emb").alias("b_emb"),
            F.col("nrm").alias("b_nrm"),
        )
        # score each UNORDERED pair once: dot(a,b)==dot(b,a) and
        # nrm_a*nrm_b==nrm_b*nrm_a bitwise (IEEE multiply is
        # commutative and the sum order is index order either way),
        # so the mirrored direction is emitted from the computed
        # cosine by explode — halving the O(N^2) kernel stage
        # (measured 63 s -> ~32 s executor CPU at sf0.1)
        scored = (
            F.broadcast(a)
            .crossJoin(b)
            .filter(F.col("src") < F.col("dst"))
        )
    else:
        # candidate pairs are unordered; a directed rank needs both
        # directions present, so mirror them before scoring. Distinct
        # + self-pair drop are load-bearing: raw candidate generators
        # (an LSH band join before dedup) emit duplicates, mirrored
        # orientations, and (x,x) rows — a duplicated directed edge
        # would occupy a rank slot AND break the count==2 mutuality
        # test below in both directions (double-counted mutual pairs
        # dropped, duplicated one-sided pairs kept)
        cand = candidates.select(
            F.col(candidates.columns[0]).alias("src"),
            F.col(candidates.columns[1]).alias("dst"),
        )
        # normalize to UNORDERED distinct pairs; the mirrored
        # direction is emitted post-scoring (see directed below).
        # Distinct + self-pair drop are load-bearing: raw candidate
        # generators (an LSH band join before dedup) emit duplicates,
        # mirrored orientations, and (x,x) rows — a duplicated
        # directed edge would occupy a rank slot AND break the
        # count==2 mutuality test in both directions
        both = (
            cand.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        ea = e.select(
            F.col("vec_id").alias("src"),
            F.col("emb").alias("a_emb"),
            F.col("nrm").alias("a_nrm"),
        )
        eb = e.select(
            F.col("vec_id").alias("dst"),
            F.col("emb").alias("b_emb"),
            F.col("nrm").alias("b_nrm"),
        )
        # merge hints: ea/eb are the corpus embedding table
        scored = both.join(ea.hint("merge"), "src").join(
            eb.hint("merge"), "dst"
        )
    cos = _dot(F.col("a_emb"), F.col("b_emb")) / (
        F.col("a_nrm") * F.col("b_nrm")
    )
    once = scored.select("src", "dst", F.round(cos, 6).alias("cosine"))
    # both directions from the ONE computed cosine (a union of two
    # selects would re-run the kernel subtree per branch)
    directed = once.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src"), F.col("dst"), F.col("cosine")
                ),
                F.struct(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    F.col("cosine"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst", "e.cosine")
    w = Window.partitionBy("src").orderBy(
        F.col("cosine").desc(), F.col("dst").asc()
    )
    topk = directed.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    # an undirected edge survives iff BOTH directed edges did: the
    # unordered-pair groupBy sees exactly 2 rows for mutual pairs
    # (cosine is symmetric and rounded identically on both sides)
    return (
        topk.groupBy(
            F.least("src", "dst").alias("id_a"),
            F.greatest("src", "dst").alias("id_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.max("cosine").alias("cosine"),
        )
        .filter(F.col("__n") == 2)
        .select("id_a", "id_b", "cosine")
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k_top: int = 5,
    n_cells: int = 8,
    ivf_iters: int = 2,
    nprobe: int = 2,
    m: int = 4,
    k_codes: int = 16,
    pq_iters: int = 2,
) -> DataFrame:
    """IVF+PQ composed ANN search (the FAISS IVFPQ architecture,
    Jegou et al. 2011): a trained coarse quantizer restricts the
    candidate set to `nprobe` cells, and PQ asymmetric distance (ADC
    table lookup) ranks the candidates — the configuration that
    actually runs billion-vector search in production.

    Composition of the two existing operators, so each stage keeps
    its independently-verified exactness: train_ivf_centroids
    (fixed-point Lloyd, bit-identical at any parallelism) for the
    cells, pq_train_encode for the codebooks/codes, the shared
    _centroid_scores cosine assignment for probes. One honest delta
    from production IVFPQ: codes quantize RAW vectors, not residuals
    (x - centroid) — residual encoding improves recall but couples
    the stages; the PLAN (scan reads m ints/vector, candidates only
    from probed cells, no shuffle before the per-query top-k window)
    is identical, which is what matters at 100 TB.

    Output: (query_id, neighbor_id, approx_sq_dist, rank) — exact
    long ADC distances, ties by neighbor_id.
    """
    # The coarse (IVF) and fine (PQ) trainers are INDEPENDENT — both
    # read only `embeddings` — and overlap from two driver threads
    # (guide §2.6: actions are only sequential because the driver calls
    # them sequentially); each training's own jobs back-fill the other's
    # driver gaps. Results are unchanged: both trainers are
    # deterministic and share no state.
    #
    # Both trainers, the corpus cell assignment, the query probes, and
    # the ADC tables all derive from the SAME (vec_id, embedding, fx)
    # rows — previously each re-derived fan_out(embeddings) + _fx from
    # parquet behind its own persist (two scans, two round-robin
    # shuffles, and two persist/unpersist windows racing on one
    # lineage — the cache-substitution hazard documented at
    # train_ivf_centroids). ONE eager localCheckpoint materializes the
    # frame with truncated lineage and fixed output attributes; every
    # consumer reads stored blocks, and the trainers share ONE bounded
    # init collect (vec_id < max(n_cells, k_codes)) instead of two.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    emb = F.col("embedding")
    fxe = (
        fan_out(embeddings)
        .select("vec_id", "embedding", _fx(emb).alias("fx"))
        .localCheckpoint(eager=True)
    )
    fxd = fxe.select("vec_id", "fx")
    init_rows = (
        fxd.filter(F.col("vec_id") < max(n_cells, k_codes))
        .orderBy("vec_id")
        .collect()
    )
    # inheritable_thread_target: propagate the driver thread's job
    # group/description into the pool threads under pinned-thread mode
    # (ADVICE r9) — no semantics change, the trainers stay independent
    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_ivf = pool.submit(
            inheritable_thread_target(
                lambda: _train_ivf_fx(
                    fxd,
                    k=n_cells,
                    iters=ivf_iters,
                    with_assignments=False,
                    init_rows=init_rows,
                )
            )
        )
        fut_pq = pool.submit(
            inheritable_thread_target(
                lambda: _pq_train_encode_fx(
                    fxd, m=m, k=k_codes, iters=pq_iters,
                    init_rows=init_rows,
                )
            )
        )
        cents_fx, _ = fut_ivf.result()
        books, codes = fut_pq.result()
    cd = [
        (i, [v / float(FX_SCALE) for v in c])
        for i, c in enumerate(cents_fx)
    ]
    scores = _centroid_scores(emb, cd)
    assigned = fxe.select(
        "vec_id", F.array_max(scores)["cid"].alias("cell")
    )
    probes = (
        fxe.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.slice(F.reverse(F.array_sort(scores)), 1, nprobe)["cid"]
            ).alias("cell"),
        )
    )
    qdf = _adc_distance_tables(fxe, query_ids, books, fx_col="fx")
    # candidates = codes of vectors whose IVF cell is probed by the
    # query: the probe side is |Q|*nprobe rows -> broadcast; the codes
    # scan reads m ints per vector and only probed cells shuffle on
    cand = (
        # codes and assigned are both corpus-grain: merge hint (the
        # probe side below IS the broadcast side, explicitly)
        codes.join(assigned.hint("merge"), "vec_id")
        .join(F.broadcast(probes.join(qdf, "query_id")), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    return _adc_score_topk(cand, k_top)


def ivf_pq_residual_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k_top: int = 5,
    n_cells: int = 8,
    ivf_iters: int = 2,
    nprobe: int = 2,
    m: int = 4,
    k_codes: int = 16,
    pq_iters: int = 2,
) -> DataFrame:
    """IVF+PQ with RESIDUAL encoding — the production FAISS IVFPQ
    recipe (Jegou et al., PAMI 2011 §V: quantize x - q1(x), the
    residual from the coarse centroid, not x itself). Residuals
    concentrate around the origin, so the same PQ bit budget spends
    its resolution on the informative part of the vector — the recall
    improvement over raw-vector PQ that closes ivf_pq_topk's
    documented delta.

    Exactness chain: residuals are computed in the SAME 2^-20
    fixed-point grid as the IVF centroids (long - long, exact), PQ
    trains on those longs (the shared _pq_train_encode_fx core), and
    the per-(query, probed-cell) ADC tables use the query's residual
    w.r.t. THAT cell's centroid — all-long arithmetic end to end, so
    the DuckDB oracle replays it bit-for-bit.

    Plan shape is IDENTICAL to ivf_pq_topk (what matters at 100 TB):
    coarse assignment is a map-only expression over centroid
    literals; the residual is one zip_with against a literal
    element_at lookup (still map-only, in codegen); candidates only
    from probed cells; the broadcast side is |Q| x nprobe dt tables
    (m*k longs each — tiny); the corpus-grain code/cell join carries
    the merge hint; no shuffle before the per-query top-k window.
    """
    # ONE materialized (vec_id, embedding, fx) frame feeds the IVF
    # trainer, the coarse assignment, AND the query-side collect —
    # previously the trainer re-derived fan_out+_fx behind its own
    # persist and the assignment ran a second fan_out shuffle over
    # parquet (same dedup as ivf_pq_topk; arithmetic unchanged).
    emb = F.col("embedding")
    fxe = (
        fan_out(embeddings)
        .select("vec_id", "embedding", _fx(emb).alias("fx"))
        .localCheckpoint(eager=True)
    )
    cents_fx, _ = _train_ivf_fx(
        fxe.select("vec_id", "fx"),
        k=n_cells,
        iters=ivf_iters,
        with_assignments=False,
    )
    cd = [
        (i, [v / float(FX_SCALE) for v in c])
        for i, c in enumerate(cents_fx)
    ]
    scores = _centroid_scores(emb, cd)
    cent_lit = long_matrix(cents_fx)
    # two-stage select: the n_cells x dim score array is HOF-built
    # (CodegenFallback — no subexpression elimination), so the cell
    # argmax must be computed ONCE as a named column, not inlined
    # twice (the ua_json_expr duplicated-subtree lesson); the residual
    # then derives from the cell column
    assigned_fx = fxe.select(
        "vec_id",
        F.col("fx").alias("vfx"),
        F.array_max(scores)["cid"].alias("cell"),
    )
    res = assigned_fx.select(
        "vec_id",
        "cell",
        F.zip_with(
            F.col("vfx"),
            F.element_at(cent_lit, F.col("cell") + 1),
            lambda a, b: a - b,
        ).alias("fx"),
        # res feeds THREE jobs (PQ init collect, the persisted subspace
        # build, the candidate join): materialize once, eagerly, per
        # the repo checkpoint policy (no persist fragments)
    ).localCheckpoint(eager=True)
    # per-(query, probed cell) ADC tables: the query residual depends
    # on WHICH cell is probed, so dt is keyed by (query_id, cell) —
    # |Q| x nprobe tables of m*k longs, built from two bounded collects
    # ONE bounded collect serves both the query fx vectors and their
    # probed cells (was two scans of the same |Q|-row filter).
    # The PQ training (reads the checkpointed `res`) and the query-side
    # collect (reads `embeddings` + centroid literals) are independent
    # once `res` is materialized: overlap them from two driver threads
    # (guide §2.6) so the bounded collect hides inside the training's
    # driver gaps instead of adding its own ~0.3 s action latency.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    def _qrows():
        return (
            fxe.filter(F.col("vec_id").isin(query_ids))
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("fx").alias("qfx"),
                F.slice(F.reverse(F.array_sort(scores)), 1, nprobe)["cid"]
                .alias("cells"),
            )
            .collect()
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_pq = pool.submit(
            inheritable_thread_target(
                lambda: _pq_train_encode_fx(
                    res.select("vec_id", "fx"),
                    m=m,
                    k=k_codes,
                    iters=pq_iters,
                )
            )
        )
        fut_q = pool.submit(inheritable_thread_target(_qrows))
        books, codes = fut_pq.result()
        qrows = fut_q.result()
    dsub = len(cents_fx[0]) // m
    dt_rows = []
    for r in qrows:
        qid, qfx = int(r["query_id"]), list(r["qfx"])
        for cell in (int(c) for c in r["cells"]):
            qres = [q - c for q, c in zip(qfx, cents_fx[cell])]
            dt = [
                [
                    sum(
                        (qres[j * dsub + i] - bc[i]) ** 2
                        for i in range(dsub)
                    )
                    for bc in books[j]
                ]
                for j in range(m)
            ]
            dt_rows.append((qid, cell, dt))
    qdt = local_df(
        embeddings.sparkSession,
        dt_rows,
        "query_id long, cell int, dt array<array<long>>",
    )
    cand = (
        codes.join(res.select("vec_id", "cell").hint("merge"), "vec_id")
        .join(F.broadcast(qdt), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    return _adc_score_topk(cand, k_top)


def matryoshka_recall(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    trunc_dim: int = 16,
    max_exact_vectors: int | None = 100_000,
) -> DataFrame:
    """Matryoshka-style dimension-truncation audit: retrieval recall@k
    of the FIRST trunc_dim coordinates against full-dimension exact
    top-k (Kusupati et al. 2022 — MRL embeddings keep most retrieval
    quality in a prefix). The number a pipeline owner wants before
    cutting index cost 4x: 'what recall do I keep at dim/4?'.

    Two broadcast-query corpus passes (full + sliced) — each the
    cosine_topk plan — then an overlap join over |Q|*k rows. At 100 TB
    the corpus is scanned twice but never shuffled; a fused single-pass
    variant would save one scan at the cost of 2x state per row, not
    worth it below memory pressure.

    Returns (query_id, n_overlap, recall) with recall = n_overlap/k.
    The exact-baseline size gate runs ONCE here (followable at this
    API, one probe for both passes; None opts out).
    """
    _exact_corpus_guard(
        embeddings, max_exact_vectors, "matryoshka_recall",
        "sample the probe corpus or raise max_exact_vectors",
    )
    full = cosine_topk(embeddings, query_ids, k, max_exact_vectors=None)
    sliced = embeddings.select(
        "vec_id", F.slice("embedding", 1, trunc_dim).alias("embedding")
    )
    trunc = cosine_topk(sliced, query_ids, k, max_exact_vectors=None)
    overlap = (
        full.select("query_id", "neighbor_id")
        # both sides are |Q|*k rows; broadcast one — Catalyst's static
        # estimate of the window-derived frames would SMJ two tiny tables
        .join(F.broadcast(trunc.select("query_id", "neighbor_id")),
              ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    qs = full.select("query_id").distinct()
    n = F.coalesce(F.col("n_overlap"), F.lit(0).cast("long"))
    return qs.join(F.broadcast(overlap), "query_id", "left").select(
        "query_id",
        n.alias("n_overlap"),
        (n / F.lit(k)).alias("recall"),
    )


RP_SCALE = 1 << 10  # projection fixed-point grid: keeps every dot
# product exact in double (|y_j| <= dim * 2^10, so y*y sums stay far
# below 2^53 — integers are exact in IEEE754, engine-independent)


def _rp_signs(dim: int, out_dim: int, seed: str = "rp") -> list[list[int]]:
    """Deterministic +-1 Rademacher sign matrix from md5 — the
    Achlioptas-style database-friendly JL projection (signs suffice;
    no Gaussians needed). signs[j][i] is the coefficient of input
    dim i in output dim j; shared verbatim by the DuckDB oracle."""
    import hashlib

    return [
        [
            1
            if int(
                hashlib.md5(f"{seed}|{i}|{j}".encode()).hexdigest()[:8], 16
            )
            % 2
            == 0
            else -1
            for i in range(dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    embeddings: DataFrame,
    dim: int,
    out_dim: int = 16,
    value_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss sign projection: each output coordinate
    is an exact integer dot product of the fixed-point input
    (floor(x * 2^10)) with a deterministic +-1 row — dimensionality
    reduction whose distance distortion is bounded by the JL lemma,
    at the cost of ONE map-only pass (the sign matrix lives in the
    generated code as literals; no shuffle, no Python).

    Unlike matryoshka truncation (which needs MRL-trained
    embeddings), this works on ANY embedding column — the generic
    'shrink the index 4x' tool. All-integer outputs: bit-identical at
    any parallelism and below the 2^53 double mantissa, so the DuckDB
    oracle replays cosine over them exactly.

    Returns (vec_id, embedding) with the projected array<double>
    (integer-valued), ready for any downstream similarity operator.

    Raises ValueError when `dim` does not match the data: zip_with
    pads the shorter side with NULLs, so a silent mismatch would
    yield all-NULL projections and a downstream recall audit full of
    NULL cosines — fail fast instead (one LIMIT-1 probe, the same
    bounded control-plane action train_label_centroids uses).
    """
    probe = embeddings.select(F.size(value_col).alias("n")).limit(1).collect()
    if probe and probe[0]["n"] != dim:
        raise ValueError(
            f"random_projection: dim={dim} but {value_col} has "
            f"{probe[0]['n']} elements"
        )
    signs = _rp_signs(dim, out_dim)
    fx = F.transform(
        F.col(value_col),
        lambda x: F.floor(x.cast("double") * F.lit(RP_SCALE)).cast("long"),
    )
    proj = embeddings.select(
        "vec_id", fx.alias("__fx")
    ).select(
        "vec_id",
        F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        F.col("__fx"),
                        long_array(row),
                        lambda a, b: a * b,
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).cast("double")
                for row in signs
            ]
        ).alias("embedding"),
    )
    return proj


def rp_recall(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    out_dim: int = 16,
    max_exact_vectors: int | None = 100_000,
) -> DataFrame:
    """Retrieval recall@k of JL sign-projected vectors against the
    full-dimension exact top-k — matryoshka_recall's generic sibling
    for embeddings WITHOUT prefix training. Same two broadcast-query
    corpus passes + metadata-grain overlap join; the projection rides
    the corpus scan as a map expression.

    Returns (query_id, n_overlap, recall). The exact-baseline size
    gate runs ONCE here (one probe for both passes; None opts out)."""
    _exact_corpus_guard(
        embeddings, max_exact_vectors, "rp_recall",
        "sample the probe corpus or raise max_exact_vectors",
    )
    full = cosine_topk(embeddings, query_ids, k, max_exact_vectors=None)
    proj = random_projection(embeddings, dim=dim, out_dim=out_dim)
    red = cosine_topk(proj, query_ids, k, max_exact_vectors=None)
    overlap = (
        full.select("query_id", "neighbor_id")
        .join(
            # |Q|*k rows — broadcast, same reasoning as matryoshka_recall
            F.broadcast(red.select("query_id", "neighbor_id")),
            ["query_id", "neighbor_id"],
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    qs = full.select("query_id").distinct()
    n = F.coalesce(F.col("n_overlap"), F.lit(0).cast("long"))
    return qs.join(F.broadcast(overlap), "query_id", "left").select(
        "query_id",
        n.alias("n_overlap"),
        (n / F.lit(k)).alias("recall"),
    )


def coreset_select(
    embeddings: DataFrame,
    n_per_cell: int,
    k: int = 8,
    iters: int = 2,
    policy: str = "central",
    value_col: str = "embedding",
) -> DataFrame:
    """Cluster-balanced coreset selection: train exact fixed-point
    k-means cells (train_ivf_centroids — bit-identical at any
    parallelism), then keep n_per_cell vectors per cell. The
    data-curation move behind prototype/diversity subset selection
    (SemDeDup's sibling: that REMOVES redundancy inside cells, this
    PICKS a budgeted representative subset) — a capped per-cell quota
    guarantees every region of embedding space survives the cut, where
    a global top-n by any score would collapse onto the densest
    cluster.

    policy='central' keeps the vectors CLOSEST to their centroid
    (prototypes — clean exemplars for few-shot pools and eval
    anchors); policy='spread' keeps the FARTHEST (boundary/hard
    examples — the active-learning pick). Both deterministic:
    (sq_dist, vec_id) ties.

    Plan: k-means is one scan + k-row shuffle per iteration; selection
    is ONE per-cell window whose rank<=n filter compiles to
    WindowGroupLimit partials — map tasks forward at most n rows per
    cell, so the select stage moves |cells|*n rows, not the corpus.

    Returns (vec_id, cell, sq_dist, rank), rank 1..n_per_cell within
    the cell under the chosen policy.
    """
    if policy not in ("central", "spread"):
        raise ValueError(f"unknown policy: {policy!r}")
    _, assigned = train_ivf_centroids(
        embeddings, k=k, iters=iters, value_col=value_col
    )
    order = (
        [F.col("sq_dist").asc(), F.col("vec_id").asc()]
        if policy == "central"
        else [F.col("sq_dist").desc(), F.col("vec_id").asc()]
    )
    w = Window.partitionBy("cell").orderBy(*order)
    return (
        assigned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_per_cell)
        .select("vec_id", "cell", "sq_dist", "rank")
    )


def mmr_select(
    embeddings: DataFrame,
    query_id: int,
    k: int = 5,
    lam_num: int = 7,
    lam_den: int = 10,
    candidates: DataFrame | None = None,
    max_exact_vectors: int | None = 100_000,
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein,
    SIGIR 1998): greedily pick k items maximizing
    lambda*sim(q,d) - (1-lambda)*max_{s in S} sim(d,s) — relevance
    traded against redundancy to the already-selected set. THE
    diversity-selection step of training-data curation and RAG context
    assembly (near-identical top hits waste the budget a diverse set
    spends well).

    Exact integer selection: cosines are rounded to 6dp (the repo-wide
    convention) then scaled to micro-units as longs, and the MMR score
    is `lam_num*rel6 - (lam_den-lam_num)*red6` — pure long arithmetic,
    so argmax ties (broken by lowest vec_id) are engine-exact and a
    DuckDB oracle replays the whole greedy chain bit-for-bit.

    Plan shape: k bounded iterations, each ONE map-only corpus pass
    (relevance and row norms are precomputed once; redundancy is a
    materialized column folded with each round's single new pick) +
    a 1-row argmax aggregate. No shuffle of the candidate set, ever;
    the newest selected vector rides as a literal (functions/litx). At 100 TB you pre-pool
    candidates with cosine_topk/ivf_topk (pass `candidates=`) so the
    k passes scan the pool, not the corpus — same code path. The
    default (candidates=None) is k full corpus passes, so it carries
    the exact-baseline size gate its siblings have (bounded probe,
    raises above `max_exact_vectors`; None opts out). A caller-supplied
    candidate pool is already the scale path and is not probed.

    Returns (rank, vec_id, rel6, red6, score_fx): selection order,
    micro-scaled relevance/redundancy, and the integer MMR score.
    """
    if not 0 < lam_num <= lam_den:
        raise ValueError("need 0 < lam_num <= lam_den")
    emb = F.col("embedding")
    if candidates is None:
        _exact_corpus_guard(
            embeddings, max_exact_vectors, "mmr_select",
            "pre-pool candidates with cosine_topk/ivf_topk and pass "
            "candidates=",
        )
    pool = candidates if candidates is not None else embeddings
    qrow = embeddings.filter(F.col("vec_id") == query_id).select(
        "embedding"
    ).collect()
    if not qrow:
        raise ValueError(f"query vec_id {query_id} not found")
    qv = [float(x) for x in qrow[0]["embedding"]]
    qarr = double_array(qv)

    def cos6(dot: F.Column, nrm_a: F.Column, nrm_b: F.Column) -> F.Column:
        # micro-scaled rounded cosine as LONG (6dp round then *1e6 is
        # exact in double for |cos| <= 1)
        c = F.round(dot / (nrm_a * nrm_b), 6)
        return F.round(c * F.lit(1_000_000.0), 0).cast("long")

    # red6 is carried as a MATERIALIZED column updated incrementally:
    # red6_r = max(red6_{r-1}, cos6(row, newest pick)), which equals
    # the max over all picks (long max is exact) — EXCEPT the first
    # update, which REPLACES the 0 seed: cos6 can be negative and the
    # legacy semantics are max over picks with no zero floor (the 0
    # seed exists only so round 1's score term is exactly 0, matching
    # the old lit(0) arm). The former
    # formulation rebuilt greatest(cos6(row, s) for every s) inside
    # each round's argmax — r interpreted-HOF dot products per row per
    # round, each evaluated TWICE (once for the red6 column, once
    # inside score_fx; HOFs run interpreted, so no common-subexpr
    # elimination) — and re-derived _norm(row) and _norm(literal) per
    # row per pick on top. Now: the row norm is computed once at base
    # build, each pick's norm is COLLECTED with its embedding (the
    # same JVM double, never recomputed), and each round does exactly
    # ONE new dot per row. The per-round update rides a LAZY
    # checkpoint that materializes inside the next argmax (an
    # all-partition agg — safe from the partial-materialization
    # miscompile train_bpe documents).
    base = (
        fan_out(pool)
        .filter(F.col("vec_id") != query_id)
        .withColumn("nrm", _norm(emb))
        .select(
            "vec_id",
            "embedding",
            "nrm",
            cos6(_dot(emb, qarr), F.col("nrm"), _norm(qarr)).alias(
                "rel6"
            ),
            F.lit(0).cast("long").alias("red6"),
        )
        # the argmax passes re-read this frame: materialize once, off
        # lineage (repo cache policy: eager checkpoint, no persist
        # fragments)
        .localCheckpoint(eager=True)
    )
    mu = lam_den - lam_num
    out_rows = []
    for rank in range(1, k + 1):
        # 1-row argmax: max score, ties -> LOWEST vec_id (negated id in
        # the lexicographic struct max)
        top = base.agg(
            F.max(
                F.struct(
                    (F.lit(lam_num) * F.col("rel6")
                     - F.lit(mu) * F.col("red6")).alias("score_fx"),
                    (-F.col("vec_id")).alias("nid"),
                    F.col("rel6"),
                    F.col("red6"),
                    F.col("embedding"),
                    F.col("nrm"),
                )
            ).alias("m")
        ).collect()[0]["m"]
        if top is None:
            break
        vid = -int(top["nid"])
        out_rows.append(
            (rank, vid, int(top["rel6"]), int(top["red6"]),
             int(top["score_fx"]))
        )
        if rank < k:
            sv = double_array([float(x) for x in top["embedding"]])
            new_cos = cos6(
                _dot(emb, sv), F.col("nrm"), F.lit(float(top["nrm"]))
            )
            upd = (
                new_cos
                if rank == 1
                else F.greatest(F.col("red6"), new_cos)
            )
            base = base.filter(F.col("vec_id") != vid).select(
                "vec_id",
                "embedding",
                "nrm",
                "rel6",
                upd.alias("red6"),
            ).localCheckpoint(eager=False)
    return local_df(
        embeddings.sparkSession,
        out_rows,
        "rank int, vec_id long, rel6 long, red6 long, score_fx long",
    )
