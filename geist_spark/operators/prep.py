"""Training-corpus preparation operators: decontamination, sequence
packing, PII redaction, per-source quota capping.

All pure JVM-side column/window expressions (no Python UDFs) with
exact DuckDB oracles — these are the post-dedup steps an LLM data
pipeline runs before tokenization.

No reference equivalent (zpiroux/geist is a stream-ETL runtime with no
corpus operators, README.md:21); built for the driver's LLM-pipeline
extension mandate alongside operators/dedup.py and operators/text.py.

Scale design notes are on each operator; the common theme is one
shuffle maximum, broadcast for the small side, and deterministic
md5-based ordering so results are reproducible at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from geist_spark.operators.dedup import shingles, tokens

# simple, RE2-safe patterns that parse identically in Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9\-\s]{7,14}[0-9]"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def decontaminate(
    documents: DataFrame,
    eval_docs: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    k-token shingle with an evaluation/benchmark set (the GPT-3
    appendix-C n-gram-overlap method, done as a join instead of a
    bloom filter so the result is exact).

    Plan shape for 100 TB: the eval side is benchmark-sized (thousands
    of docs), so its distinct shingle set is BROADCAST and the corpus
    side streams through map-side — no shuffle of the corpus. Output
    is one row per doc with the contaminated-shingle count (0 = clean),
    so the caller can either drop or audit.
    """
    corpus_sh = shingles(documents, k=k)
    eval_sh = F.broadcast(
        shingles(eval_docs, k=k).select(
            F.col("shingle").alias("__eval_shingle")
        ).distinct()
    )
    hits = (
        corpus_sh.join(
            eval_sh, corpus_sh.shingle == eval_sh.__eval_shingle, "inner"
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        documents.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_contaminated_shingles"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def pack_sequences(
    documents: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
) -> DataFrame:
    """Streaming sequence packing: assign docs (in deterministic
    (group, doc_id) order) to consecutive token-budget bins —
    bin_id = floor(exclusive-running-token-sum / budget). The last doc
    of a bin may straddle the boundary (bins overflow by < 1 doc);
    that is the standard streaming approximation of bin packing — the
    exact greedy is inherently sequential and O(n) per group, while
    this is ONE shuffle on the group + a partition-local window, and
    its output is a pure function of the data (engine/parallelism
    independent, DuckDB-replayable).

    Returns per-bin rollups: (group, bin_id, n_docs, total_tokens).
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = F.size(tokens(F.col("text")))
    per_doc = documents.select(
        group_col, "doc_id", n_tok.alias("n_tokens")
    ).withColumn(
        "bin_id",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            / F.lit(budget_tokens)
        ),
    )
    return per_doc.groupBy(group_col, "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def redact_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrub: redact emails, phone-like number runs, and IPv4
    addresses with typed placeholders; reports per-doc match counts so
    a pipeline can route high-PII docs to review. Map-only codegen —
    the cheapest possible pass at 100 TB — using patterns restricted
    to the common subset of Java regex and RE2 so the DuckDB oracle
    replays them byte-identically."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    redacted = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(redacted, F.lit(IPV4_RE), F.lit(0)))
    redacted = F.regexp_replace(redacted, IPV4_RE, "<IP>")
    n_phones = F.size(F.regexp_extract_all(redacted, F.lit(PHONE_RE), F.lit(0)))
    redacted = F.regexp_replace(redacted, PHONE_RE, "<PHONE>")
    return documents.select(
        "doc_id",
        redacted.alias("redacted_text"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
    )


def source_quota(
    documents: DataFrame,
    cap_per_source: int,
    group_col: str = "source",
    salt: str = "",
) -> DataFrame:
    """Per-source quota capping: keep at most `cap_per_source` docs per
    group, chosen by deterministic md5(doc_id || salt) order (an
    unbiased, reproducible draw — different salts give independent
    draws). The absolute-count twin of stratified_sample's fractional
    downsampling: one shuffle on the group, partition-local window."""
    rank_key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(rank_key.asc(), F.col("doc_id").asc())
    return (
        documents.withColumn("__qr", F.row_number().over(w))
        .filter(F.col("__qr") <= cap_per_source)
        .drop("__qr")
    )


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into fixed-size token chunks with overlap — the
    RAG / context-window prep step that turns a corpus into training or
    retrieval units. Chunk starts advance by `stride` tokens
    (stride < chunk_tokens ⇒ overlap of chunk_tokens - stride).

    Pure per-row array work (sequence → slice → posexplode): zero
    shuffle, output size is n_tokens/stride rows per doc. At 100 TB
    the explode multiplies rows ~chunk/stride×, but each output row is
    narrow and the stage stays map-only — downstream writers see
    partition sizes grow by the same factor, so pair with
    `spark.sql.files.maxPartitionBytes` sized for the post-explode
    width, not the input width.
    """
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    from geist_spark.operators.bucketing import fan_out

    toked = fan_out(documents).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    t = F.col("toks")
    starts = F.sequence(F.lit(1), F.greatest(F.size(t), F.lit(1)), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.slice(t, s, chunk_tokens))
    ex = toked.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
    return ex.select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(" ", F.col("chunk")).alias("chunk_text"),
        F.size("chunk").alias("n_tokens"),
    )
