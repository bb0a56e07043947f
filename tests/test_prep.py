"""Corpus-prep operators (operators/prep.py): decontamination, sequence
packing, PII redaction, per-source quotas."""

from geist_spark.operators.prep import (
    decontaminate,
    pack_sequences,
    redact_pii,
    source_quota,
)


def test_decontaminate_flags_ngram_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated content about databases and spark"),
            (3, "we saw the quick brown fox jumps over a fence"),
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "benchmark says the quick brown fox jumps over things")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in decontaminate(docs, eval_docs, k=5).collect()}
    # docs 1 and 3 share the 5-gram "the quick brown fox jumps"
    assert got[1]["contaminated"] and got[3]["contaminated"]
    assert not got[2]["contaminated"]
    assert got[2]["n_contaminated_shingles"] == 0
    assert got[1]["n_contaminated_shingles"] >= 1


def test_pack_sequences_bins_by_running_token_sum(spark):
    # 4 docs x 3 tokens in one source; budget 5 tokens:
    # exclusive cumsums 0,3,6,9 -> bins 0,0,1,1
    docs = spark.createDataFrame(
        [(i, "s1", "a b c") for i in range(1, 5)],
        "doc_id long, source string, text string",
    )
    got = sorted(
        (r["bin_id"], r["n_docs"], r["total_tokens"])
        for r in pack_sequences(docs, budget_tokens=5).collect()
    )
    assert got == [(0, 2, 6), (1, 2, 6)]


def test_redact_pii_strips_and_counts(spark):
    docs = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org or 192.168.0.1 "
             "call +1 555-010-2345 please")],
        "doc_id long, text string",
    )
    r = redact_pii(docs).collect()[0]
    t = r["redacted_text"]
    assert "<EMAIL>" in t and "<IP>" in t and "<PHONE>" in t
    assert "bob.smith" not in t and "192.168" not in t and "555-010" not in t
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 1)


def test_source_quota_caps_and_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "a" if i < 20 else "b", "t") for i in range(30)],
        "doc_id long, source string, text string",
    )
    kept1 = sorted(r["doc_id"] for r in source_quota(docs, 5).collect())
    kept2 = sorted(r["doc_id"] for r in source_quota(docs, 5).collect())
    assert kept1 == kept2  # deterministic
    by_src = source_quota(docs, 5).groupBy("source").count().collect()
    assert all(r["count"] == 5 for r in by_src)
    # a different salt draws a different subset
    kept3 = sorted(r["doc_id"] for r in source_quota(docs, 5, salt="z").collect())
    assert kept1 != kept3
