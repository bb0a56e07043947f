"""Deduplication operators for large-scale (LLM-)data pipelines.

All variants are built from JVM-side primitives (md5/xxhash64, explode,
groupBy, self-join) — no Python in the hot path — and designed so each
stage is one shuffle on an explicit key:

- exact:    hash-groupBy on md5(text)                   (1 shuffle)
- minhash:  shingle explode -> 1 groupBy for signatures -> band
            explode -> self-join on band hash           (2 shuffles + join)
- simhash:  token explode -> weighted bit vote          (1 shuffle)
- n-gram Jaccard: inverted-index self-join on shingle   (join on shingle)

Determinism: every hash is md5 (identical in DuckDB), so the oracles
in __spark_entry__ hash-match exactly. Seeded minhash uses
md5(shingle || '|' || seed).

At 100 TB: shingle explosion dominates — keep shingles k-token (not
char) to bound blowup; band self-joins are skew-prone (hot bands) and
run under AQE skew handling; cap per-band bucket size upstream with a
count filter when needed (cap column emitted for observability).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql import types as T

TOKEN_SPLIT_RE = r"\s+"


def normalize_text(col: F.Column) -> F.Column:
    """lower + collapse whitespace (identical expression in oracles)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup_groups(documents: DataFrame) -> DataFrame:
    """Group exact duplicates by content hash; emit one row per distinct
    content with representative doc and multiplicity."""
    return (
        documents.select(
            F.md5(normalize_text(F.col("text"))).alias("content_hash"),
            F.col("doc_id"),
        )
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count("*").alias("n_dups"))
    )


def tokens(col: F.Column) -> F.Column:
    return F.split(normalize_text(col), TOKEN_SPLIT_RE)


def shingles(documents: DataFrame, k: int = 3) -> DataFrame:
    """k-token shingles: (doc_id, shingle), all in codegen — no UDF.

    The token array is materialized in its own projection first:
    referencing the split expression inside the higher-order lambda
    would re-tokenize the document once PER ELEMENT (O(n^2) regex
    work); a column attribute is evaluated once per row."""
    from geist_spark.operators.bucketing import fan_out

    # shingling is the CPU-heavy stage of every dedup family; widen
    # skinny inputs so it never serializes on one core
    toked = fan_out(documents).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    toks = F.col("toks")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    return toked.select(
        "doc_id", F.explode(F.array_distinct(sh)).alias("shingle")
    ).filter(F.col("shingle") != "")


MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) per hash for universal hashing
    sig_s = min((a*h + b) mod P). a < 2^30 keeps a*h under 2^62 for a
    32-bit h, so the arithmetic is exact in int64 in BOTH engines
    (the DuckDB oracle replays the identical expressions)."""
    import random

    rng = random.Random(0x9E1157)
    return [
        (rng.randrange(1, 1 << 30), rng.randrange(0, MINHASH_P))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    documents: DataFrame, num_hashes: int = 16, k: int = 3
) -> DataFrame:
    """One min-hash per seed as columns sig_0..sig_{n-1}.

    Single groupBy(doc_id) with `num_hashes` conditional mins — the
    seed dimension lives in the aggregate list, NOT an exploded join,
    so the shuffle volume is exactly the shingle table once. ONE md5
    per shingle (32-bit prefix), then `num_hashes` two-multiply
    universal hashes — at 100 TB the md5 over every shingle is the
    dominant CPU term, so it is paid once, not num_hashes times."""
    sh = shingles(documents, k=k)
    h = (
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10)
        .cast("long")
        .alias("h")
    )
    hashed = sh.select("doc_id", h)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)).alias(
            f"sig_{s}"
        )
        for s, (a, b) in enumerate(minhash_params(num_hashes))
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_bands(
    documents: DataFrame, num_hashes: int = 16, bands: int = 4, k: int = 3
) -> DataFrame:
    """LSH band rows (doc_id, band_id, band_hash) — the persistable
    near-dup INDEX of a corpus. rows-per-band = num_hashes // bands;
    two docs are near-dup candidates when any band row collides.

    This is the artifact an incremental pipeline stores (append-only,
    partitioned by band_hash prefix): each ingest batch computes its
    own bands (O(batch), never O(corpus)), probes the stored index,
    and appends its rows. Pure per-doc computation — no shuffle beyond
    the signature groupBy."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(documents, num_hashes=num_hashes, k=k)
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"sig_{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")


def incremental_dedup_pairs(
    new_docs: DataFrame,
    index: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Probe a NEW ingest batch against an EXISTING corpus band index
    (a stored `minhash_bands` output) — the 100 TB incremental-dedup
    pattern: never re-shingle or re-cluster the corpus, only hash the
    batch and equi-join the index on (band_id, band_hash).

    Returns distinct (new_doc_id, corpus_doc_id) candidate pairs; docs
    already in the index are skipped via the id inequality, so the
    operator is idempotent under replayed batches. `max_bucket_size`
    caps degenerate index buckets exactly like minhash_lsh_pairs.
    """
    probe = minhash_bands(new_docs, num_hashes=num_hashes, bands=bands, k=k)
    if max_bucket_size is not None:
        # degenerate-bucket cap via aggregate + anti-join (the hot
        # bucket list is tiny by definition), not a window sort over
        # the whole index — same rows kept, no index-sized sort
        hot = (
            index.groupBy("band_id", "band_hash")
            .agg(F.count(F.lit(1)).alias("__bucket_n"))
            .filter(F.col("__bucket_n") > max_bucket_size)
            .select("band_id", "band_hash")
        )
        index = index.join(hot, ["band_id", "band_hash"], "left_anti")
    # merge hint on the INDEX side: the stored corpus index must never
    # be the broadcast build side (the probe batch may be; AQE decides
    # from actual shuffle sizes)
    n, c = probe.alias("n"), index.hint("merge").alias("c")
    return (
        n.join(
            c,
            (F.col("n.band_id") == F.col("c.band_id"))
            & (F.col("n.band_hash") == F.col("c.band_hash"))
            & (F.col("n.doc_id") != F.col("c.doc_id")),
        )
        .select(
            F.col("n.doc_id").alias("new_doc_id"),
            F.col("c.doc_id").alias("corpus_doc_id"),
        )
        .distinct()
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    max_bucket_size: int | None = None,
    dedup_key: str | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over minhash signatures.

    rows-per-band = num_hashes // bands; two docs are candidates when
    any band's concatenated signature matches. Self-join is on
    (band_id, band_hash) — co-located, equi-join, AQE handles hot
    bands.

    `max_bucket_size` is the 100 TB guard: a band hash shared by m docs
    yields m^2/2 candidate pairs, so one degenerate bucket (empty docs,
    boilerplate) can dominate the whole job. Buckets above the cap are
    dropped BEFORE the pair join (their members are near-certain exact
    dups — route them through exact_dedup_groups instead, which is
    linear). The cap count rides the same hash partitioning as the join
    key, so it adds no extra shuffle.

    `dedup_key` ("doc_a" or "doc_b") fuses the pair-dedup shuffle with
    the consumer's next re-key: hash-partitioning on ONE pair column
    still satisfies the (doc_a, doc_b) dedup clustering (same doc_a =>
    co-located), so a consumer that immediately joins on that column
    (verified_near_dup_pairs' confirm join) gets its partitioning from
    the dedup exchange instead of paying a second full shuffle of the
    pair set. Output rows are identical; the trade is losing the
    map-side partial dedup (pairs shuffle with band-collision
    multiplicity <= bands), paid in tiny 16-byte rows."""
    banded = minhash_bands(documents, num_hashes=num_hashes, bands=bands, k=k)
    if max_bucket_size is not None:
        w = Window.partitionBy("band_id", "band_hash")
        banded = (
            banded.withColumn("__bucket_n", F.count(F.lit(1)).over(w))
            .filter(F.col("__bucket_n") <= max_bucket_size)
            .drop("__bucket_n")
        )
    a = banded.alias("a")
    # merge hint: both sides are the corpus-sized index. Static size
    # estimates UNDER-count exploded/derived frames (measured at 16x:
    # Catalyst picked BuildRight broadcast of the full index and
    # aborted on driver maxResultSize), so the hint pins the safe
    # shuffle plan; AQE still re-splits skewed partitions at runtime.
    b = banded.hint("merge").alias("b")
    pairs = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )
    if dedup_key is None:
        return pairs.distinct()
    return pairs.repartition(F.col(dedup_key)).dropDuplicates()


def simhash(documents: DataFrame, bits: int = 32) -> DataFrame:
    """Per-doc SimHash fingerprint from token hashes (bit-vote).

    Token hash = first 8 hex chars of md5 (32-bit, fits signed 64 in
    both engines). Bit b of the fingerprint is 1 when more tokens have
    bit b set than not. One explode + one groupBy."""
    from geist_spark.operators.bucketing import fan_out

    tok = fan_out(documents).select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    ).filter(F.col("tok") != "")
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    with_bits = tok.select("doc_id", h.alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{b}")
        for b in range(bits)
    ]
    voted = with_bits.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"v_{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return voted.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_near_dup_pairs(
    documents: DataFrame,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_band_freq: int | None = 1000,
) -> DataFrame:
    """SimHash NEAR-duplicate pairs (Manku, Jain & Das Sarma, WWW
    2007): docs whose fingerprints differ in at most `max_hamming`
    bits. `simhash` alone only groups EXACT signatures; this is the
    Hamming-ball variant actual web dedup uses.

    Candidate generation is the pigeonhole band trick: split the
    `bits`-bit fingerprint into `bands` contiguous bands — any pair
    within Hamming distance < `bands` must agree exactly on at least
    one band — then equi-join per band and confirm with
    bit_count(xor) <= max_hamming. Requires max_hamming < bands
    (pigeonhole soundness; validated) and bits <= 32: simhash token
    hashes are 32-bit md5 prefixes, so higher fingerprint bits would
    be constant zero — upper bands would agree for EVERY pair and the
    band join would degenerate toward all-pairs (validated; widening
    to Manku's 64-bit needs a 64-bit token hash first).

    Scale shape: fingerprints are one explode + one groupBy
    (simhash); the candidate join is a band-keyed EQUI-join over
    fingerprint rows (corpus never self-joins all-pairs).
    `max_band_freq` caps degenerate bands (a band value shared by
    millions of near-identical docs — the hot-bucket guard, same role
    as minhash's max_bucket_size). Pairs found via multiple bands
    dedupe with one groupBy on (doc_a, doc_b).
    """
    if not 1 <= bits <= 32:
        raise ValueError(
            f"bits must be in [1, 32] (token hashes are 32-bit), got {bits}"
        )
    fp = simhash(documents, bits=bits)
    return banded_hamming_pairs(
        fp, "doc_id", "simhash", bits, bands, max_hamming, max_band_freq
    ).select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "hamming",
    )


def banded_hamming_pairs(
    hashes: DataFrame,
    id_col: str,
    hash_col: str,
    bits: int,
    bands: int,
    max_hamming: int,
    max_band_freq: int | None = 1000,
) -> DataFrame:
    """The ONE banded Hamming-pairs kernel shared by simhash text
    dedup and dhash image dedup (multimodal.dhash_near_dup): split
    each `bits`-bit hash into `bands` contiguous slices, equi-join on
    (band, value) under the pigeonhole guarantee (max_hamming <
    bands), confirm with bit_count(xor). Returns (id_a, id_b,
    hamming), a < b, multi-band hits deduped by a groupBy min.

    Hashes may occupy the SIGNED 64-bit range (dhash packs two's
    complement) — banding shifts with shiftrightunsigned, and the
    width==64 single-band case skips the mask (a 64-bit all-ones
    literal does not fit a signed long). Pass the TRUE hash width as
    `bits`: declaring 64 for sub-64-bit hashes would make the upper
    bands constant zero and degenerate the band join toward
    all-pairs. `max_band_freq` caps degenerate buckets (flat images /
    boilerplate docs hashing identically — the hot-bucket guard); the
    merge hint on the band join is the measured static-misestimate
    defense from the minhash path."""
    if not 0 <= max_hamming < bands:
        raise ValueError(
            f"need max_hamming < bands for pigeonhole soundness, got "
            f"hamming={max_hamming} bands={bands}"
        )
    if bits % bands != 0:
        raise ValueError(f"bits {bits} not divisible by bands {bands}")
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64], got {bits}")
    width = bits // bands

    def band_val(b: int) -> F.Column:
        v = F.shiftrightunsigned(F.col(hash_col), b * width)
        if width < 64:
            v = v.bitwiseAND(F.lit((1 << width) - 1))
        return v

    banded = hashes.select(
        F.col(id_col).alias("__id"),
        F.col(hash_col).alias("__h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), band_val(b).alias("val")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bv"),
    ).select(
        "__id", "__h", F.col("bv.band").alias("band"),
        F.col("bv.val").alias("val"),
    )
    if max_band_freq is not None:
        # window count rides the same hash partitioning as the pair
        # join (the minhash max_bucket_size pattern) — no extra join,
        # and the uncached hash pipeline is not recomputed for a
        # separate counts branch
        wb = Window.partitionBy("band", "val")
        banded = (
            banded.withColumn("__bf", F.count(F.lit(1)).over(wb))
            .filter(F.col("__bf") <= max_band_freq)
            .drop("__bf")
        )
    a = banded.select(
        F.col("band"), F.col("val"),
        F.col("__id").alias("id_a"), F.col("__h").alias("__ha"),
    )
    b = banded.select(
        F.col("band"), F.col("val"),
        F.col("__id").alias("id_b"), F.col("__h").alias("__hb"),
    )
    dist = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        # merge hint: corpus-sized hash bands on both sides (same
        # measured static-misestimate hazard as minhash bands)
        a.join(b.hint("merge"), ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("id_a", "id_b")
        .agg(F.min("hamming").alias("hamming"))
    )


def _shingle_candidate_counts(
    documents: DataFrame,
    k: int,
    max_shingle_freq: int | None,
) -> DataFrame:
    """Shared candidate stage of ngram_jaccard_pairs and
    ngram_containment_pairs: shingle inverted-index self-join (only
    pairs sharing >=1 surviving shingle, never all-pairs) with the
    hot-shingle document-frequency cap, joined to the PRE-cap per-doc
    sizes. Output: (doc_a, doc_b, n_common, n_a, n_b), doc_a < doc_b —
    both similarity measures are thin projections over these counts.
    """
    sh = shingles(documents, k=k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    if max_shingle_freq is not None:
        w = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("__df", F.count(F.lit(1)).over(w))
            .filter(F.col("__df") <= max_shingle_freq)
            .drop("__df")
        )
    a = sh.alias("a")
    # merge hint: both sides are the corpus-sized index. Static size
    # estimates UNDER-count exploded/derived frames (measured at 16x:
    # Catalyst picked BuildRight broadcast of the full index and
    # aborted on driver maxResultSize), so the hint pins the safe
    # shuffle plan; AQE still re-splits skewed partitions at runtime.
    b = sh.hint("merge").alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    # sizes is doc-grain — corpus-sized too (it scales with the
    # corpus, so no broadcast), but shuffle_hash beats merge here:
    # the pair set arrives unsorted and doc-grain (doc_id, n_sh)
    # rows hash-build cheaply per partition, so SHJ skips the two
    # full sorts of the pair set that the merge hint forced
    # (guide §3.1; measured ~1.3x on the sizes-attach stages)
    sa = sizes.hint("shuffle_hash").alias("sa")
    sb = sizes.hint("shuffle_hash").alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.col("sa.n_sh").alias("n_a"),
            F.col("sb.n_sh").alias("n_b"),
        )
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard near-dup pairs via shingle inverted index.

    Candidate generation = self-join on shingle (only pairs sharing at
    least one shingle are compared — never all-pairs), then
    |A∩B| from the join, |A|,|B| from per-doc counts.

    `max_shingle_freq` is the 100 TB guard (the analogue of
    minhash_lsh_pairs' max_bucket_size): a shingle shared by m docs
    contributes m^2/2 rows to the self-join, so one stop-phrase can
    dominate the whole job. Shingles above the document-frequency cap
    are dropped from the index — |A∩B| then undercounts by the capped
    shingles, so reported jaccard is a LOWER BOUND for pairs sharing
    them (|A|,|B| stay exact, computed pre-cap). That bias is the
    standard trade: a capped shingle appears in ~every doc and carries
    no discriminating signal, so true near-dups still clear the
    threshold on their remaining shingles. The frequency count rides
    the same hash partitioning as the join key."""
    counts = _shingle_candidate_counts(documents, k, max_shingle_freq)
    return (
        counts.withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def ngram_containment_pairs(
    documents: DataFrame,
    k: int = 3,
    threshold_pct: int = 80,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Asymmetric containment near-dup pairs (Broder 1997's
    containment coefficient): C = |A∩B| / min(|A|,|B|) over distinct
    k-token shingles. Catches SUB-document duplication — a short doc
    fully embedded in a long one (quoted articles, boilerplate
    expansions, mirrored fragments) has containment 1.0 but Jaccard
    |A|/|B|, far below any symmetric threshold, so Jaccard-only dedup
    ships both copies to training.

    The predicate is pure BIGINT arithmetic —
    100*n_common >= threshold_pct*min(n_a,n_b) — no IEEE division
    decides membership, so the oracle replays it exactly.

    Same candidate shape as ngram_jaccard_pairs: shingle inverted
    index self-join (only pairs sharing >=1 shingle are counted,
    never all-pairs), with the identical `max_shingle_freq` hot-key
    cap and the identical lower-bound trade when it fires (|A∩B|
    undercounts by capped shingles; |A|,|B| stay exact, pre-cap).

    Output: (doc_a, doc_b, n_common, n_a, n_b), doc_a < doc_b, all
    BIGINT.
    """
    return _shingle_candidate_counts(documents, k, max_shingle_freq).filter(
        F.lit(100) * F.col("n_common")
        >= F.lit(threshold_pct) * F.least("n_a", "n_b")
    )


def dedup_clusters(
    pairs: DataFrame,
    vertices: DataFrame | None = None,
    max_iterations: int = 20,
    max_driver_edges: int | None = 200_000,
) -> DataFrame:
    """Connected components over near-dup pairs -> (doc_id, cluster_id),
    cluster_id = min doc_id reachable. This turns pairwise near-dup
    output (minhash_lsh_pairs / ngram_jaccard_pairs) into dedup groups
    so a pipeline can keep one canonical doc per cluster.

    When `vertices` is supplied, clustering runs on the vertex-INDUCED
    subgraph: edges touching a doc outside `vertices` are ignored and
    only vertex rows appear in the output (both paths, by
    construction). NULL endpoints are dropped. NOTE: this operator
    runs Spark actions at composition time on EITHER path — the
    bounded edge probe, and (distributed path) the eager checkpoint +
    per-round convergence counts; iterative CC cannot compose lazily.
    max_driver_edges=None skips only the probe (always the
    distributed path) — it does NOT make composition action-free.

    Two paths, gated on a BOUNDED edge probe (limit(cap+1).collect() —
    never a full count of a 100 TB pair set), the same scale gate
    keep_canonical uses for its broadcast:

    - |edges| <= max_driver_edges: driver-side union-find (path
      compression, min-id roots). Near-dup pair sets are edge-sparse
      (LSH/banding emits only candidate pairs), so this is the common
      case far up the scale curve; it replaces ~2 Spark jobs per
      propagation round with exactly one collect. The fixed point is
      IDENTICAL to the distributed path: cluster_id = min reachable
      doc_id.
    - above the cap: iterative min-label propagation (the standard
      Spark formulation, same as GraphFrames' default CC): each round
      every vertex takes min(own label, neighbors' labels); converges
      in O(graph diameter) rounds — near-dup clusters are shallow
      (dups of dups of one canonical doc), so typically 2-4 rounds.

    Scale notes (distributed path): labels are hash-partitioned on
    doc_id each round and localCheckpoint()ed to truncate lineage
    (without it, round N replays rounds 1..N-1 — quadratic). The
    per-round convergence check rides the same aggregation as the
    join. Each round is 2 shuffles (join + groupBy) over |edges|,
    not |docs|^2.

    No reference equivalent (geist has no joins at all,
    README.md:21); built for the driver's dedup-pipeline mandate.
    """
    # NULL endpoints are no-ops on the distributed path (null join keys
    # never match) — drop them explicitly so the union-find path agrees
    # instead of raising TypeError on None<int, and so nulls never
    # become a shuffle hot key.
    one_way = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if vertices is not None:
        # BOTH paths operate on the vertex-INDUCED subgraph: the
        # distributed propagation implicitly blocks any path through a
        # doc absent from `vertices` (its endpoint has no label row),
        # so the fast path must see the same restricted edge set or the
        # two fixed points diverge on exactly the inputs where the
        # caller filtered the universe.
        verts = vertices.select("doc_id").distinct()
        one_way = (
            one_way.join(
                verts.withColumnRenamed("doc_id", "src"), "src", "left_semi"
            ).join(
                verts.withColumnRenamed("doc_id", "dst"), "dst", "left_semi"
            )
            # USING-joins move the join column FIRST; restore (src, dst)
            # order or the positional union() below swaps directions
            .select("src", "dst")
        )
    # probe and fetch in ONE action: limit(cap+1).collect() returns the
    # COMPLETE edge set iff it is under the cap (and cap+1 rows — all
    # discarded — iff not, without scanning the rest of a 100 TB pair
    # set).  Deliberately no checkpoint before the probe: partially
    # materializing a lazy checkpoint under limit() trips a Catalyst
    # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND when the caller's pair frame
    # carries its own checkpoint barrier (semantic_dedup).
    # max_driver_edges=None opts out of the probe (always the
    # distributed path); note the distributed path still runs eager
    # actions at composition (checkpoint + convergence counts) — see
    # the docstring.
    if max_driver_edges is not None:
        probe = one_way.limit(max_driver_edges + 1).collect()
        if len(probe) <= max_driver_edges:
            return _union_find_clusters(
                one_way.sparkSession, probe, one_way.schema, vertices
            )
    # above the cap: materialize ONCE (eager — safe now, no limit in
    # flight) so the propagation rounds reuse stored blocks instead of
    # recomputing the pair join every round. The probe's map-side pass
    # is the one extra computation the gate costs at this scale.
    one_way = one_way.localCheckpoint(eager=True)
    edges = one_way.union(
        one_way.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if vertices is None:
        verts = edges.select(F.col("src").alias("doc_id")).distinct()
    else:
        verts = vertices.select("doc_id").distinct()
    labels = verts.select("doc_id", F.col("doc_id").alias("cluster_id"))
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")
                ).alias("cluster_id"),
                (
                    F.coalesce("nbr_min", "cluster_id") < F.col("cluster_id")
                ).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter("__changed").limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    return labels


def _union_find_clusters(
    spark, rows, edge_schema, vertices: DataFrame | None
) -> DataFrame:
    """Driver-side connected components for the bounded-edge case:
    classic union-find with path compression, roots kept at the MIN
    doc_id so the result is bit-identical to the distributed
    min-label fixed point. Vertices outside the edge set (when a
    `vertices` frame is supplied) stay identity-labeled WITHOUT being
    collected — they join back lazily, so a huge mostly-unpaired
    corpus never reaches the driver."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ra, rb = find(r["src"]), find(r["dst"])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    touched = sorted({x for r in rows for x in (r["src"], r["dst"])})
    id_type = edge_schema["src"].dataType
    schema = T.StructType(
        [
            T.StructField("doc_id", id_type),
            T.StructField("cluster_id", id_type),
        ]
    )
    from geist_spark.functions.localdf import local_df

    labels = local_df(spark, [(x, find(x)) for x in touched], schema)
    if vertices is None:
        return labels
    verts = vertices.select("doc_id").distinct()
    rest = verts.join(labels, "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    )
    return labels.unionByName(rest)


def distinct_event_keys(events: DataFrame) -> DataFrame:
    """insertId-style dedup (SURVEY §2.2 bigquery insertIdFromId):
    distinct on the declared key columns."""
    return events.select("user_id", "event_type").distinct()


def _span_shuffle_partitions(
    documents: DataFrame, k: int, stride: int
) -> int | None:
    """Derive a shuffle width for the char-gram frames from a cheap
    row estimate: docs x max(avg_len - k + 1, 0) / stride gram rows,
    targeting ~2M rows (~100 MB) per partition. The 64x probe showed
    the gram self-join's per-partition SMJ sort spilling at the
    session default (SCALE.md): the operator owns the sizing now
    instead of relying on every caller to scale
    spark.sql.shuffle.partitions with input. Estimate cost: one
    column-pruned count (parquet-metadata fast for raw scans; a real
    job for derived frames) + one bounded-sample length average. The
    sample rows are whichever limit(4096) fetches first, so the RAW
    estimate can wobble run-to-run on length-skewed corpora — the
    derived width is therefore rounded UP to a power of two, which
    absorbs estimate noise into stable plan widths (results are
    identical at any width; only the exchange fan-out varies). Returns
    None when the session default already suffices (no repartition,
    no behavior change)."""
    sess = int(
        documents.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    n_docs = documents.count()
    if n_docs == 0:
        return None
    avg_len = (
        documents.select(F.length("text").alias("L"))
        .limit(4096)
        .agg(F.avg("L"))
        .collect()[0][0]
    ) or 0.0
    est_rows = n_docs * max(avg_len - k + 1, 0.0) / max(stride, 1)
    need = int(est_rows // 2_000_000) + 1
    if need <= sess:
        return None
    need = 1 << (need - 1).bit_length()  # stable power-of-two width
    return min(need, 16_384)  # runaway-estimate backstop


def _dup_span_runs(
    documents: DataFrame,
    min_len: int = 40,
    stride: int = 1,
    max_gram_freq: int | None = None,
    shuffle_partitions: int | str | None = "auto",
) -> DataFrame:
    """Exact shared-substring spans between document pairs — the
    suffix-array dedup family (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"), reformulated for
    Spark: a distributed suffix array is impractical, but its OUTPUT
    (all maximal verbatim overlaps >= min_len chars) is reproduced by

      1. char min_len-gram inverted index: (doc_id, pos, md5(gram)) —
         pure codegen (sequence+explode+substring+md5), no UDF;
      2. self-join on the gram hash (only positions sharing a gram are
         compared — never all-pairs);
      3. maximal-run merge: matching positions with equal diagonal
         (pos_a - pos_b) and consecutive pos_a belong to one maximal
         shared span; a lag-window streak-break + cumsum groups them,
         span_len = max(pos_a) - min(pos_a) + min_len.

    Returns ONE ROW PER MAXIMAL RUN: (doc_a, doc_b, diag, run_id,
    pa_min, pa_max), doc_a < doc_b — the grain both the pair summary
    (substring_dup_spans) and the cutter (remove_dup_spans) consume.

    Scale levers at 100 TB:
    - `stride` samples index positions (pos % stride == 0 on ONE
      side): detection stays guaranteed for spans >= min_len+stride-1
      (a window of `stride` consecutive probe grams always hits one
      sampled index gram) while index size drops stride-fold; stride=1
      is exact at min_len. Reported span bounds are then approximate —
      re-scan candidate pairs with stride=1 to tighten (two-stage, the
      paper's own shape).
    - `max_gram_freq` drops boilerplate grams whose m^2 join blow-up
      dominates (same cap contract as ngram_jaccard_pairs; spans
      bridged only by capped grams split/shrink — counts stay a lower
      bound).
    - the join shuffles once on the gram hash; the run-merge window
      re-shuffles once on (pair, diag): two exchanges total.
    - `shuffle_partitions`: width of those two exchanges. "auto"
      (default) derives it from a cheap gram-row estimate
      (_span_shuffle_partitions) so the SMJ sort volume per partition
      stays bounded as input grows — the measured 64x wall was
      exactly this (fixed 32 partitions: 208 s; scaled: 133 s).
      An int pins it; None keeps the session default untouched.
    """
    from geist_spark.operators.bucketing import fan_out

    if shuffle_partitions == "auto":
        n_parts = _span_shuffle_partitions(documents, min_len, stride)
    else:
        n_parts = shuffle_partitions

    k = min_len
    t = F.col("text")
    pos_seq = F.sequence(F.lit(1), F.greatest(F.length(t) - k + 1, F.lit(0)))
    grams = (
        fan_out(documents)
        .select("doc_id", F.explode(pos_seq).alias("pos"), t)
        # docs shorter than k must emit ZERO grams: Spark's
        # sequence(1, 0) yields a DESCENDING [1, 0] (DuckDB's
        # generate_series(1, 0) is empty), so without this guard every
        # short doc emits md5 grams of ''/truncated text that match
        # across all short docs and fabricate shared spans. BOTH
        # bounds are load-bearing: a doc of length exactly k-1 has
        # n = 0, and its pos=0 row passes the upper bound alone
        # (substring(t, 0, k) reads from position 1 — the whole text)
        .filter((F.col("pos") >= 1) & (F.col("pos") <= F.length(t) - k + 1))
        .select("doc_id", "pos", F.md5(F.substring(t, F.col("pos"), k)).alias("g"))
    )
    if max_gram_freq is not None:
        # hot-gram cap via aggregate + anti-join, NOT a window: a
        # window partitioned on the gram must SORT every gram row; the
        # aggregate is a map-side partial agg down to distinct grams,
        # and the over-cap (hot) list is small by definition
        # (<= total_grams / cap), so AQE broadcasts the anti-join in
        # the common case. Trade, stated: the gram pipeline is
        # computed twice (counts branch + main branch) — measured
        # cheaper than the window's corpus-sized sort-spill here, the
        # opposite of minhash_lsh_pairs' cap, where recomputing means
        # re-shingling the corpus and the window shares the join's
        # exchange AND its SMJ sort.
        hot = (
            grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("__gf"))
            .filter(F.col("__gf") > max_gram_freq)
            .select("g")
        )
        grams = grams.join(hot, "g", "left_anti")
    probe = grams
    if stride > 1:
        grams = grams.filter(F.col("pos") % stride == 0)
    if n_parts is not None:
        # pre-shape BOTH exchanges the plan needs anyway: the SMJ
        # reuses HashPartitioning(g, n) on each side (same keys, same
        # width -> no extra exchange), so this widens the join's
        # per-partition sort instead of adding a shuffle
        probe = probe.repartition(n_parts, "g")
        grams = grams.repartition(n_parts, "g")
    a = probe.alias("a")
    # merge hint: the gram inverted index (one row per char position)
    # is the most explosion-prone frame in the repo — at 16x Catalyst
    # statically broadcast it (driver maxResultSize abort, measured)
    b = grams.hint("merge").alias("b")
    matches = a.join(
        b,
        (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pa"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    if n_parts is not None:
        # same trick for the run-merge window's exchange: the window
        # (and the final groupBy, whose keys are a superset) reuse
        # HashPartitioning(pair, diag, n)
        matches = matches.repartition(n_parts, "doc_a", "doc_b", "diag")
    wd = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = matches.withColumn(
        "brk",
        F.when(F.col("pa") - F.lag("pa").over(wd) == 1, F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn("run_id", F.sum("brk").over(wd))
    # one row per maximal run: the shared grain substring_dup_spans
    # aggregates and remove_dup_spans cuts from
    return runs.groupBy("doc_a", "doc_b", "diag", "run_id").agg(
        F.min("pa").alias("pa_min"), F.max("pa").alias("pa_max")
    )


def substring_dup_spans(
    documents: DataFrame,
    min_len: int = 40,
    stride: int = 1,
    max_gram_freq: int | None = None,
    shuffle_partitions: int | str | None = "auto",
) -> DataFrame:
    """Per-pair summary of the maximal shared spans _dup_span_runs
    finds (see its docstring for the algorithm and the 100 TB levers).
    Returns (doc_a, doc_b, n_spans, max_span, total_shared),
    doc_a < doc_b — integers, engine-exact."""
    k = min_len
    spans = _dup_span_runs(
        documents, min_len, stride, max_gram_freq, shuffle_partitions
    ).select(
        "doc_a",
        "doc_b",
        (F.col("pa_max") - F.col("pa_min") + k).alias("span"),
    )
    return spans.groupBy("doc_a", "doc_b").agg(
        F.count("*").alias("n_spans"),
        F.max("span").alias("max_span"),
        F.sum("span").alias("total_shared"),
    )


def remove_dup_spans(
    documents: DataFrame,
    min_len: int = 40,
    stride: int = 1,
    max_gram_freq: int | None = None,
    shuffle_partitions: int | str | None = "auto",
) -> DataFrame:
    """Cut duplicated substrings OUT of the corpus — the second half
    of Lee et al. 2022 (the paper removes one copy of every >=min_len
    shared span; substring_dup_spans only reports them). Policy: the
    copy in the LOWEST doc_id survives; every maximal shared span is
    cut from the higher-id doc of its pair. Deterministic, idempotent
    on the surviving copy.

    All codegen, three shuffles past the shared run stage:
      1. per-doc span extraction from _dup_span_runs (the b side of a
         run covers chars [pa_min-diag, pa_max-diag+min_len-1]);
      2. overlap merge: running-max-of-end window per doc -> group ids
         (strictly overlapping spans merge; adjacent spans stay
         separate and just contribute an empty kept piece);
      3. rebuild: each merged span keeps the gap BEFORE it via a lag
         window, one ordered concat per doc plus the tail after the
         last span. Untouched docs pass through via anti-join + union.

    Output per doc (every input doc appears exactly once):
    (doc_id, text_md5, n_chars_removed, n_spans_removed) — md5 of the
    rebuilt text so the result stays a scalar row, exact integers.
    """
    runs = _dup_span_runs(
        documents, min_len, stride, max_gram_freq, shuffle_partitions
    )
    raw_spans = runs.select(
        F.col("doc_b").alias("doc_id"),
        (F.col("pa_min") - F.col("diag")).alias("start"),
        (F.col("pa_max") - F.col("diag") + min_len - 1).alias("end"),
    ).distinct()  # the same b-span can arrive from several doc_a pairs
    wm = Window.partitionBy("doc_id").orderBy("start", "end")
    prev_max = F.max("end").over(
        wm.rowsBetween(Window.unboundedPreceding, -1)
    )
    merged = (
        raw_spans.withColumn(
            "grp_brk",
            F.when(
                F.col("start") > F.coalesce(prev_max, F.lit(0)), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn("grp", F.sum("grp_brk").over(wm))
        .groupBy("doc_id", "grp")
        .agg(F.min("start").alias("start"), F.max("end").alias("end"))
    )
    wp = Window.partitionBy("doc_id").orderBy("start")
    pieces = merged.withColumn(
        "piece_start",
        F.coalesce(F.lag("end").over(wp), F.lit(0)) + F.lit(1),
    )
    per_doc = pieces.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("start", "piece_start"))
        ).alias("cuts"),
        F.max("end").alias("last_end"),
        F.count(F.lit(1)).alias("n_spans_removed"),
    )
    t = F.col("text")
    # ONE left join rebuilds touched and untouched docs alike (an
    # inner+anti+union pair would scan documents twice and re-evaluate
    # the whole span pipeline as two join subtrees)
    joined = documents.join(per_doc, "doc_id", "left")
    kept = F.concat(
        F.array_join(
            F.transform(
                F.col("cuts"),
                lambda c: F.substring(
                    t, c["piece_start"], c["start"] - c["piece_start"]
                ),
            ),
            "",
        ),
        F.substring(
            t, F.col("last_end") + 1, F.greatest(
                F.length(t) - F.col("last_end"), F.lit(0)
            )
        ),
    )
    new_text = F.when(F.col("last_end").isNotNull(), kept).otherwise(t)
    return joined.select(
        "doc_id",
        F.md5(new_text).alias("text_md5"),
        (F.length(t) - F.length(new_text)).cast("long").alias(
            "n_chars_removed"
        ),
        F.coalesce(F.col("n_spans_removed"), F.lit(0)).cast("long").alias(
            "n_spans_removed"
        ),
    )


def keep_canonical(
    documents: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_broadcast_labels: int = 2_000_000,
) -> DataFrame:
    """End-to-end corpus dedup: cluster the near-dup pair graph and
    keep ONE canonical doc (min id) per cluster; docs in no pair pass
    through untouched. This is the step a training-data pipeline
    actually runs after minhash_lsh_pairs/ngram_jaccard_pairs.

    The label table has one row per doc appearing in ANY near-dup
    pair — on a crawl-like corpus that is a double-digit percentage of
    all docs, far past any broadcast limit. So the broadcast hint is
    GATED: labels are already materialized (dedup_clusters ends on an
    eager localCheckpoint), making count() free; small label sets
    broadcast (corpus never shuffles), large ones get an explicit
    shuffle-join hint — merely omitting the broadcast hint is not
    enough now that labels build as a LocalTableScan whose accurate
    size stats would make the planner auto-broadcast past the gate."""
    labels = dedup_clusters(pairs)
    lab = labels.withColumnRenamed("doc_id", "__lbl_id")
    if labels.count() <= max_broadcast_labels:
        lab = F.broadcast(lab)
    else:
        lab = lab.hint("shuffle_hash")
    out = documents.join(lab, documents[id_col] == lab["__lbl_id"], "left")
    return out.filter(
        F.col("cluster_id").isNull() | (F.col("cluster_id") == documents[id_col])
    ).drop("__lbl_id", "cluster_id")


def verified_near_dup_pairs(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """The full LSH contract: banded-minhash CANDIDATES verified by
    exact shingle Jaccard, keeping pairs >= threshold. LSH alone
    over-reports (band collisions are probabilistic); verification
    computes the true overlap — but only for the candidate set, never
    all pairs, so the quadratic term stays bounded by what LSH emits.

    Shape: candidates (bucketed band join) -> join each side's shingle
    set on (doc_id, shingle) to count the intersection. Per-doc
    shingle COUNTS ride along as a window over the shingle table
    instead of a separate aggregate + two post-group joins: the
    count-over-doc_id window needs exactly the exchange+sort the
    doc_a confirm join needs anyway, so n_a/n_b arrive for free and
    the plan drops three joins' worth of exchanges (14 -> 11 and
    SMJ 5 -> 3 at sf0.01, audited round 6). All equi-joins on doc/shingle keys; the
    exact-confirm cost is O(candidate pairs x avg shingles), the same
    prefilter->confirm economics as bloom_decontaminate."""
    cands = minhash_lsh_pairs(
        documents,
        num_hashes=num_hashes,
        bands=bands,
        k=k,
        max_bucket_size=max_bucket_size,
        # fuse the pair-dedup shuffle with the doc_a confirm join's
        # re-key: one Exchange(doc_a) serves both (xchg 15 -> 14)
        dedup_key="doc_a",
    )
    sh = shingles(documents, k=k)
    sized = sh.withColumn(
        "n_sh", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    xa = sized.select(
        F.col("doc_id").alias("doc_a"), "shingle", F.col("n_sh").alias("n_a")
    )
    xb = sized.select(
        F.col("doc_id").alias("doc_b"), "shingle", F.col("n_sh").alias("n_b")
    )
    inter = (
        # merge hints: xa/xb are the corpus shingle table (candidate
        # pairs are LSH-bounded, but the shingle sides are not)
        cands.join(xa.hint("merge"), "doc_a")
        .join(xb.hint("merge"), ["doc_b", "shingle"])
        # n_a/n_b are constant per (doc_a, doc_b); grouping by them
        # keeps the single pair-grain exchange
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.round(
        F.col("n_common")
        / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        6,
    )
    return inter.select(
        "doc_a", "doc_b", "n_common", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def source_overlap_matrix(documents: DataFrame) -> DataFrame:
    """Cross-source duplication census: for every source pair, how many
    DISTINCT normalized contents appear in both — the corpus-analytics
    view that tells you which feeds mirror each other (and therefore
    which quota/dedup order matters) before any pair-level work.

    Shape: contents reduce to (content_hash, source) DISTINCT rows
    first (one shuffle, output bounded by distinct contents), then a
    self-join on content_hash. A hash shared by s sources emits
    s(s-1)/2 pairs — bounded by the source count squared, not docs."""
    h = documents.select(
        F.md5(normalize_text(F.col("text"))).alias("content_hash"),
        "source",
    ).distinct()
    a, b = h.alias("a"), h.hint("merge").alias("b")
    return (
        a.join(
            b,
            (F.col("a.content_hash") == F.col("b.content_hash"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def near_dup_rate_by_source(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Corpus-health census: per source, the fraction of docs that
    appear in ANY minhash near-dup pair — the number that decides
    which feeds are worth aggressive dedup before the expensive
    cluster/keep-canonical passes run. Pair graph is LSH-bounded; the
    doc membership check is one semi-join-shaped aggregation, never a
    per-pair scan of the corpus."""
    pairs = minhash_lsh_pairs(
        documents, num_hashes=num_hashes, bands=bands, k=k
    )
    dup_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    marked = documents.select("doc_id", "source").join(
        dup_docs, "doc_id", "left"
    )
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce(F.col("__dup"), F.lit(0))).alias("n_dup_docs"),
        F.round(
            F.sum(F.coalesce(F.col("__dup"), F.lit(0))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_rate"),
    )


def fuzzy_match_pairs(
    records: DataFrame,
    id_col: str = "rec_id",
    text_col: str = "name",
    max_dist: int = 2,
    gram: int = 3,
    max_gram_freq: int | None = 200,
) -> DataFrame:
    """Entity-resolution fuzzy join: pairs of records whose normalized
    strings are within `max_dist` Levenshtein edits, WITHOUT the
    all-pairs comparison a naive edit-distance join implies.

    Blocking = character q-gram inverted index: two strings within d
    edits share at least max(|a|,|b|) - gram + 1 - d*gram q-grams, so
    any pair with NO shared q-gram (short strings aside) cannot match;
    the candidate join runs on the gram key only. Three cheap residual
    guards run BEFORE the O(|a|*|b|) levenshtein: the length gap
    (|len_a - len_b| <= d, a necessary condition), pair dedup via
    groupBy, and the shared-gram COUNT filter (see inline comment —
    cap-aware, types-based, also a necessary condition).
    `max_gram_freq` is the hot-key cap (same trade as
    ngram_jaccard_pairs' max_shingle_freq — a gram in every record
    contributes m^2/2 candidates and no discrimination).

    Both Spark's levenshtein() and DuckDB's are the classic
    unit-cost edit distance, so the confirm step has an exact oracle.

    Shuffle discipline (the 100 TB shape): the gram index and the
    candidate-pair dedup shuffle carry ONLY (rid, g, len) / (id_a,
    id_b) — never the strings. A pair sharing c grams lands in c
    different join partitions, so the pair-dedup exchange moves every
    incidence; with strings attached that was ~262 MB at sf0.1 vs
    ~90 MB ids-only. The strings move exactly once, re-attached to
    the DEDUPED pairs by two record-grain joins for the levenshtein
    confirm (broadcast when small, shuffle-hash at scale — pairs are
    the smaller side after dedup).

    Output: (id_a, id_b, dist), id_a < id_b.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    base = records.select(
        F.col(id_col).alias("rid"), norm.alias("s")
    ).filter(F.length("s") >= gram)
    idx = F.sequence(F.lit(1), F.length("s") - gram + 1)
    grams_precap = base.select(
        "rid",
        F.length("s").alias("ln"),
        F.explode(
            F.array_distinct(
                F.transform(idx, lambda i: F.col("s").substr(i, F.lit(gram)))
            )
        ).alias("g"),
    )
    grams = grams_precap
    if max_gram_freq is not None:
        # window cap HERE (unlike substring_dup_spans' anti-join): the
        # pair self-join right below keys on the same `g`, so the
        # window's exchange AND its sort are reused by the SMJ — the
        # cap is effectively free — whereas a counts branch recomputes
        # the gram explode. Measured: the anti-join variant was 1.7x
        # slower at sf0.1 (9.4 s vs 5.5 s).
        w = Window.partitionBy("g")
        grams = (
            grams.withColumn("__gf", F.count(F.lit(1)).over(w))
            .filter(F.col("__gf") <= max_gram_freq)
            .drop("__gf")
        )
    # merge hint on the self-join: same corpus-sized-index rationale
    # as substring spans (static estimates under-count the explode)
    a, b = grams.alias("a"), grams.hint("merge").alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.rid") < F.col("b.rid"))
            # length-gap guard inside the join: prunes before the
            # pair-dedup shuffle, not just before levenshtein
            & (F.abs(F.col("a.ln") - F.col("b.ln")) <= max_dist),
        )
        .groupBy(
            F.col("a.rid").alias("id_a"),
            F.col("b.rid").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    # q-gram COUNT filter before the string attach + levenshtein
    # (Gravano et al. 2001, adapted to distinct gram TYPES and the
    # hot-gram cap): an edit destroys at most `gram` distinct types,
    # so |types_a ∩ types_b| >= max(nt_a, nt_b) - d*gram; a shared
    # type is missing from the INDEX count only if it was capped,
    # and the cap is global per gram, so at most
    # min(nt_a - tc_a, nt_b - tc_b) shared types are missing
    # (tc = types surviving the cap). Necessary condition only —
    # survivors are a superset of the true matches and the
    # levenshtein confirm is unchanged — but it prunes the candidate
    # tail that shares only a gram or two: measured 7.70 M -> ~41 k
    # pairs entering the two string joins + levenshtein at sf0.1
    # (94% of candidates shared exactly ONE indexed gram). The stats
    # frames are record-grain aggregates of the (already tiny)
    # gram index — AQE broadcasts them.
    nt = grams_precap.groupBy("rid").agg(F.count(F.lit(1)).alias("nt"))
    tc = grams.groupBy("rid").agg(F.count(F.lit(1)).alias("tc"))
    stats = nt.join(tc, "rid", "left").select(
        "rid", "nt", F.coalesce(F.col("tc"), F.lit(0)).alias("tc")
    )
    sta = stats.select(
        F.col("rid").alias("id_a"),
        F.col("nt").alias("nt_a"),
        F.col("tc").alias("tc_a"),
    )
    stb = stats.select(
        F.col("rid").alias("id_b"),
        F.col("nt").alias("nt_b"),
        F.col("tc").alias("tc_b"),
    )
    cand = (
        cand.join(sta, "id_a")
        .join(stb, "id_b")
        .filter(
            F.col("__shared")
            >= F.greatest("nt_a", "nt_b")
            - F.lit(max_dist * gram)
            - F.least(
                F.col("nt_a") - F.col("tc_a"),
                F.col("nt_b") - F.col("tc_b"),
            )
        )
        .select("id_a", "id_b")
    )
    sa = base.select(F.col("rid").alias("id_a"), F.col("s").alias("s_a"))
    sb = base.select(F.col("rid").alias("id_b"), F.col("s").alias("s_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def keep_best(
    documents: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    max_broadcast_labels: int = 2_000_000,
) -> DataFrame:
    """Quality-aware corpus dedup: like keep_canonical, but the
    survivor of each near-dup cluster is the HIGHEST-`score_col` doc
    (ties: lowest id), not the lowest id. Pipelines keep the longest /
    cleanest / most-recent copy of a near-dup family, not an
    arbitrary one — min-id survival systematically favors whatever
    was crawled first.

    Same scale shape as keep_canonical: cluster labels (bounded by
    docs-in-pairs, count-gated broadcast), one left join onto the
    corpus, then ONE extra window over cluster members only
    (singletons skip it via the null label — the window input is the
    clustered minority, not the corpus).
    """
    labels = dedup_clusters(pairs)
    lab = labels.withColumnRenamed("doc_id", "__lbl_id")
    if labels.count() <= max_broadcast_labels:
        lab = F.broadcast(lab)
    else:
        # see keep_canonical: the gate must force a non-broadcast join
        lab = lab.hint("shuffle_hash")
    out = documents.join(lab, documents[id_col] == lab["__lbl_id"], "left")
    singletons = out.filter(F.col("cluster_id").isNull()).drop(
        "__lbl_id", "cluster_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    best = (
        out.filter(F.col("cluster_id").isNotNull())
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .drop("__lbl_id", "cluster_id", "__r")
    )
    return singletons.unionByName(best)


def sorted_neighborhood_pairs(
    records: DataFrame,
    id_col: str = "rec_id",
    text_col: str = "name",
    window: int = 3,
    max_dist: int = 2,
    prefix_len: int = 4,
) -> DataFrame:
    """Sorted-neighborhood entity resolution (Hernandez & Stolfo):
    sort records by a normalized key and compare each to its next
    `window` neighbors — a FIXED candidate budget (n*window pairs,
    no hot-block blowup possible), complementary to
    fuzzy_match_pairs' q-gram blocking.

    Distributed form: a truly global sorted window is a one-task
    WindowExec, so neighborhoods run INSIDE prefix blocks
    (partitionBy(first prefix_len chars), orderBy(key) — partition-
    local sort after one hash shuffle). Cross-prefix neighbors are
    the method's known blind spot; the classic fix is multi-pass
    with a second key ordering, implemented here as a REVERSED-string
    pass in the same job (prefix typos sort far apart forward but
    adjacent backward). Pairs from both passes are deduped, then
    Levenshtein-confirmed.

    Output: (id_a, id_b, dist), id_a < id_b.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    base = records.select(F.col(id_col).alias("rid"), norm.alias("s"))

    def one_pass(key: Column) -> DataFrame:
        keyed = base.withColumn("__k", key)
        w = Window.partitionBy(
            F.substring(F.col("__k"), 1, prefix_len)
        ).orderBy(F.col("__k"), F.col("rid"))
        out = None
        for j in range(1, window + 1):
            nxt = keyed.select(
                "rid",
                "s",
                F.lead("rid", j).over(w).alias("rid2"),
                F.lead("s", j).over(w).alias("s2"),
            ).filter(F.col("rid2").isNotNull())
            out = nxt if out is None else out.unionByName(nxt)
        return out

    fwd = one_pass(F.col("s"))
    rev = one_pass(F.reverse(F.col("s")))
    # distance computed per candidate ROW (levenshtein is symmetric,
    # so duplicate pair sightings across passes agree), THEN deduped —
    # aggregating the two strings independently could pair fields from
    # different rows of a swapped-role duplicate
    return (
        fwd.unionByName(rev)
        .select(
            F.least(F.col("rid"), F.col("rid2")).alias("id_a"),
            F.greatest(F.col("rid"), F.col("rid2")).alias("id_b"),
            F.levenshtein("s", "s2").alias("dist"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.min("dist").alias("dist"))
        .filter(F.col("dist") <= max_dist)
    )


def novelty_score(
    documents: DataFrame, k: int = 3
) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct
    k-token shingles that appear in no other document. The curation
    signal between exact dedup (all shingles shared) and quality
    scoring (content-free): low novelty marks template/boilerplate
    families worth down-weighting even when no single pair crosses a
    dedup threshold; high novelty marks unique content worth keeping.

    Shape: the same shingle inverted index every dedup operator
    builds — distinct (doc, shingle), shingle-grain doc-frequency
    partial agg, one merge-hinted join back (both sides corpus-sized;
    SCALE.md policy), one doc-grain agg. No pairwise anything: cost
    is index + two aggregations regardless of duplication structure.

    Returns (doc_id, n_shingles, n_novel, novelty) with novelty =
    round(n_novel / n_shingles, 6). Shingle semantics follow
    `shingles()` exactly: a doc shorter than k tokens contributes its
    whole text as one short shingle (so such docs ARE scored); only
    empty-token docs are absent.
    """
    sh = shingles(documents, k=k).distinct()
    df_freq = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("__df")
    )
    return (
        sh.join(df_freq.hint("merge"), "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("__df") == 1).cast("long")).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias(
                "novelty"
            ),
        )
    )
