"""line_dedup + PQ invariants the DuckDB oracle can't observe:
partition-count independence, order preservation, exemption rules."""

import pytest

from pyspark.sql import functions as F


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_drops_cross_doc_lines_keeps_order(spark):
    from geist_spark.operators.text import line_dedup

    d = docs(
        spark,
        [
            (1, "unique first line one\nshared boilerplate line\nunique tail line one"),
            (2, "unique first line two\nshared boilerplate line\nunique tail line two"),
        ],
    )
    out = {r["doc_id"]: r for r in line_dedup(d).collect()}
    assert out[1]["text"] == "unique first line one\nunique tail line one"
    assert out[2]["text"] == "unique first line two\nunique tail line two"
    assert out[1]["n_lines_dropped"] == 1 and out[1]["n_lines_kept"] == 2


def test_line_dedup_short_lines_exempt_and_doc_survives_total_loss(spark):
    from geist_spark.operators.text import line_dedup

    # "hi" (< min_chars) repeats everywhere but is exempt; doc 3 loses
    # every eligible line yet still appears with the short lines kept
    d = docs(
        spark,
        [
            (1, "hi\nshared boilerplate line\nsomething original here"),
            (2, "hi\nshared boilerplate line\nother original content"),
            (3, "hi\nshared boilerplate line"),
        ],
    )
    out = {r["doc_id"]: r for r in line_dedup(d).collect()}
    assert out[3]["text"] == "hi"
    assert out[3]["n_lines_kept"] == 1 and out[3]["n_lines_dropped"] == 1
    assert out[1]["text"].startswith("hi\n")


def test_line_dedup_normalizes_case_and_whitespace(spark):
    from geist_spark.operators.text import line_dedup

    d = docs(
        spark,
        [
            (1, "  Shared Boilerplate Line \nkeep this one please"),
            (2, "shared boilerplate line\nkeep this other please"),
        ],
    )
    out = {r["doc_id"]: r for r in line_dedup(d).collect()}
    assert out[1]["text"] == "keep this one please"
    assert out[2]["text"] == "keep this other please"


def test_line_dedup_freq_threshold(spark):
    from geist_spark.operators.text import line_dedup

    d = docs(
        spark,
        [
            (1, "twice repeated line here\nalways repeated line here"),
            (2, "twice repeated line here\nalways repeated line here"),
            (3, "only here once for real\nalways repeated line here"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in line_dedup(d, min_doc_freq=3).collect()
    }
    # freq-2 line survives a min_doc_freq=3 threshold; freq-3 dies
    assert out[1]["text"] == "twice repeated line here"
    assert out[3]["text"] == "only here once for real"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_pq_codes_partition_invariant(spark, emb):
    from geist_spark.operators.similarity import pq_train_encode

    _, codes1 = pq_train_encode(emb.repartition(1), m=4, k=8, iters=2)
    books32, codes32 = pq_train_encode(emb.repartition(32), m=4, k=8, iters=2)
    r1 = {r["vec_id"]: list(r["codes"]) for r in codes1.collect()}
    r32 = {r["vec_id"]: list(r["codes"]) for r in codes32.collect()}
    assert r1 == r32  # fixed-point Lloyd: bit-identical at any parallelism
    assert all(len(c) == 4 for c in r1.values())
    assert len(books32) == 4 and len(books32[0]) == 8


def test_pq_adc_ranks_true_neighbor_first(spark, emb):
    from geist_spark.operators.similarity import pq_adc_topk, pq_train_encode

    books, codes = pq_train_encode(emb, m=4, k=16, iters=2)
    out = pq_adc_topk(emb, codes, books, query_ids=[0, 1], k_top=3)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1}
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3]
        # distances are non-decreasing with rank and never negative
        ds = [r["approx_sq_dist"] for r in rs]
        assert ds == sorted(ds) and ds[0] >= 0
        assert all(r["neighbor_id"] != q for r in rs)


def test_fuzzy_match_pairs_distance_gate_and_blocking(spark):
    from geist_spark.operators.dedup import fuzzy_match_pairs

    recs = spark.createDataFrame(
        [
            (1, "jonathan smithers"),
            (2, "jonathan smithres"),   # transposition: dist 2
            (3, "jonathan smith"),      # 3 deletions from 1: dist 3
            (4, "completely different"),
        ],
        "rec_id long, name string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_match_pairs(recs, max_dist=2).collect()
    }
    assert out == {(1, 2): 2}  # dist-3 and unrelated names excluded

    wide = fuzzy_match_pairs(recs, max_dist=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in wide}
    assert (1, 3) in got and (1, 2) in got and (2, 3) in got


def test_pagerank_partition_invariant_and_mass_bounded(spark):
    from geist_spark.operators.graph import PR_SCALE, pagerank

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (4, 0)],
        "src long, dst long",
    )
    r1 = {
        r["node"]: r["pr"]
        for r in pagerank(edges.repartition(1), iters=4).collect()
    }
    r8 = {
        r["node"]: r["pr"]
        for r in pagerank(edges.repartition(8), iters=4).collect()
    }
    assert r1 == r8  # fixed-point: bit-identical at any parallelism
    assert set(r1) == {0, 1, 2, 3, 4}
    # node 0 has 3 in-edges, node 4 has none: ranks must reflect that
    assert r1[0] > r1[4]
    # total mass stays at/below the scale grid (floor losses only)
    assert 0 < sum(r1.values()) <= PR_SCALE


def test_line_dedup_null_text_doc_survives(spark):
    from geist_spark.operators.text import line_dedup

    d = spark.createDataFrame(
        [
            (1, "shared boilerplate line\nkeep this sentence here"),
            (2, "shared boilerplate line\nkeep this other sentence"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(d).collect()}
    assert set(out) == {1, 2, 3}  # NULL-text doc must not vanish
    assert out[3]["text"] == "" and out[3]["n_lines_dropped"] == 0


def test_triangle_counts_known_graph(spark):
    from geist_spark.operators.graph import triangle_counts

    # K4 on {0,1,2,3} (4 triangles, each vertex in 3) plus a pendant
    # edge 3-4 (no triangle) and a duplicate/reversed edge to dedupe
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (1, 0), (2, 1)],
        "src long, dst long",
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # partition invariance
    got8 = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(edges.repartition(8)).collect()
    }
    assert got8 == got


# --------------------------------------------------------------- BM25


def test_bm25_ranking_and_determinism(spark):
    from geist_spark.operators.text import bm25_topk

    rows = [
        (1, "spark table join"),          # both query terms
        (2, "spark row filter"),          # one common term
        (3, "table scan table table"),    # repeated rarer term
        (4, "totally unrelated words"),
        (5, "spark spark spark spark"),   # tf saturation: still 1 term
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(docs, [(0, ["spark", "table"])], k_top=5).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    # doc 4 matches nothing and must be absent
    assert 4 not in ranked
    # the doc matching both terms outranks every single-term doc
    assert ranked[0] == 1
    # tf saturation: 4x 'spark' must not overtake the two-term match
    assert ranked.index(5) > 0
    # scores are exact integers (nanos) -> stable across runs
    again = bm25_topk(docs, [(0, ["spark", "table"])], k_top=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_term_stats_incremental_merge_equals_full(spark):
    """Index-maintenance IVM: term stats from disjoint corpus slices
    merge into exactly the full recompute."""
    from geist_spark.operators.text import merge_term_stats, term_stats

    rows = [(i, t) for i, t in enumerate(
        ["spark table join", "spark row", "table scan table", "row row row"]
    )]
    full = spark.createDataFrame(rows, "doc_id long, text string")
    a = full.filter("doc_id < 2")
    b = full.filter("doc_id >= 2")
    merged = {
        r.term: (r.df, r.cnt)
        for r in merge_term_stats(term_stats(a), term_stats(b)).collect()
    }
    want = {
        r.term: (r.df, r.cnt) for r in term_stats(full).collect()
    }
    assert merged == want
    assert want["table"] == (2, 3) and want["row"] == (2, 4)


def test_hybrid_search_rrf_fusion(spark):
    """RRF fusion: a doc ranked in both lists beats docs in one list;
    integer nanos make scores exact."""
    from geist_spark.operators.similarity import hybrid_search

    docs = spark.createDataFrame(
        [
            (0, "spark table join engine"),
            (1, "spark table join engine extra"),  # lexical + semantic twin
            (2, "spark unrelated content here"),   # lexical-only overlap
            (3, "zz qq ww rr"),                    # neither
        ],
        "doc_id long, text string",
    )
    embs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.99, 0.14, 0.0]),   # close to query 0
            (2, [0.0, 1.0, 0.0]),
            (3, [0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = hybrid_search(docs, embs, query_ids=[0], k_list=3, k_top=3)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert rows[0].doc_id == 1  # in both lists -> two RRF terms
    assert all(r.doc_id != 0 for r in rows)  # self excluded
    # exact integer check: rank 1 in BOTH lists — BM25 excludes the
    # self-match BEFORE final ranks (rank parity with cosine), so the
    # best real lexical hit earns rank 1 and neither list is
    # systematically underweighted in the fusion
    assert rows[0].rrf_nanos == 2 * (10**9 // 61)


def test_universal_tokens_cjk_char_grain(spark):
    """CJK text tokenizes at character grain (no word spaces to split
    on); latin runs inside CJK text stay whole; pure-latin text yields
    exactly the whitespace tokens."""
    from geist_spark.operators.text import universal_tokens

    df = spark.createDataFrame(
        [
            (1, "我是学生 GPU很快"),
            (2, "the quick brown fox"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id", universal_tokens(F.col("text")).alias("toks")
        ).collect()
    }
    assert out[1] == ["我", "是", "学", "生", "gpu", "很", "快"]
    assert out[2] == ["the", "quick", "brown", "fox"]


def test_quality_features_lang_aware_stopwords(spark):
    """Per-row stopword selection: a German doc scores against the de
    list (not en), real Chinese text gets a nonzero zh-stopword ratio
    via char-grain tokens, and unknown languages score 0 instead of
    being silently scored against English."""
    from geist_spark.operators.text import quality_features

    df = spark.createDataFrame(
        [
            (1, "der hund und die katze", "de"),
            (2, "the cat and the dog", "en"),
            (3, "我是学生人", "zh"),
            (4, "the cat and the dog", "xx"),  # unknown lang
        ],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: r for r in quality_features(df, lang_col="lang").collect()
    }
    # de: der/und/die = 3 of 5 distinct tokens
    assert out[1]["stopword_ratio"] == round(3 / 5, 6)
    # en: the/and = 2 of 4 distinct tokens
    assert out[2]["stopword_ratio"] == round(2 / 4, 6)
    # zh char tokens: 我 是 学 生 人 -> 我,是,人 are zh stopwords
    assert out[3]["n_tokens"] == 5
    assert out[3]["stopword_ratio"] == round(3 / 5, 6)
    # unknown lang: empty stopword set, ratio 0 (NOT the en score)
    assert out[4]["stopword_ratio"] == 0.0
    # lang rides along in the output for downstream gating
    assert out[1]["lang"] == "de"


def test_language_id_detects_real_chinese(spark):
    """The universal tokenizer makes zh detectable: a real Chinese
    sentence (no spaces) predicts zh; whitespace languages are
    unaffected."""
    from geist_spark.operators.text import language_id

    df = spark.createDataFrame(
        [
            (1, "我是学生我有人", "zh"),
            (2, "the cat and the dog is here", "en"),
            (3, "der hund und die katze ist da", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in language_id(df).collect()}
    assert out[1]["predicted_lang"] == "zh" and out[1]["score_zh"] > 0
    assert out[2]["predicted_lang"] == "en"
    assert out[3]["predicted_lang"] == "de"


def test_language_id_detects_japanese_kana(spark):
    """Kana chars tokenize at char grain (hiragana/katakana ranges in
    the universal tokenizer), so a real Japanese sentence — no spaces,
    kana particles — predicts ja; zh text keeps predicting zh (ja is
    last in STOPWORDS, so zh wins any tie)."""
    from geist_spark.operators.text import language_id

    df = spark.createDataFrame(
        [
            # これはペンですがノートもある: particles は/が/も are ja
            # stopword chars; katakana ペン/ノート are char tokens
            (1, "これはペンですがノートもある", "ja"),
            (2, "我是学生我有人", "zh"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in language_id(df).collect()}
    assert out[1]["predicted_lang"] == "ja" and out[1]["score_ja"] > 0
    assert out[2]["predicted_lang"] == "zh"


def test_language_id_detects_korean_hangul(spark):
    """Hangul syllables tokenize at char grain (ac00-d7af in the
    universal tokenizer), so a real Korean sentence — agglutinated
    particles, no token-level separation of 은/는/이/가 — predicts ko;
    ja text keeps predicting ja (ko is last in STOPWORDS, so ja wins
    any tie)."""
    from geist_spark.operators.text import language_id

    df = spark.createDataFrame(
        [
            # 나는학생이다그는의사다: particles 는/이/의 are ko stopword
            # syllables once the text tokenizes at char grain
            (1, "나는학생이다그는의사다", "ko"),
            (2, "これはペンですがノートもある", "ja"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in language_id(df).collect()}
    assert out[1]["predicted_lang"] == "ko" and out[1]["score_ko"] > 0
    assert out[2]["predicted_lang"] == "ja"


def test_rake_ko_char_grain(spark):
    """lang='ko' routes through the char-grain tokenizer: the
    single-syllable particle stopwords delimit runs inside eojeol,
    which whitespace tokens would keep glued to their noun. (Known
    char-grain caveat: a stopword syllable INSIDE a content word —
    e.g. 이 in 데이터 — also splits it; that is inherent to the
    dependency-free heuristic, same as zh 的 inside names.)"""
    from geist_spark.operators.text import rake_keywords

    # 품질은중요하다 — 은 is a ko stopword syllable and must split the
    # (space-free) sentence into two runs
    df = spark.createDataFrame(
        [(1, "품질은중요하다")], "doc_id long, text string"
    )
    rows = rake_keywords(df, lang="ko", top_k=10).collect()
    phrases = {r["phrase"] for r in rows}
    assert phrases == {"품 질", "중 요 하 다"}


def test_rake_ja_char_grain(spark):
    """lang='ja' routes through the char-grain tokenizer: kana
    particles delimit runs over mixed kanji+katakana text."""
    from geist_spark.operators.text import rake_keywords

    # 東京の会社でデータ分析 — の and で are ja stopword chars
    df = spark.createDataFrame(
        [(1, "東京の会社でデータ分析")], "doc_id long, text string"
    )
    phrases = {
        r["phrase"] for r in rake_keywords(df, lang="ja", top_k=10).collect()
    }
    assert "東 京" in phrases and "会 社" in phrases
    assert "デ ー タ 分 析" in phrases


def test_rake_lang_selection_and_unknown_raises(spark):
    """lang= selects the stopword list; unknown languages raise a
    typed error instead of silently scoring against en."""
    from geist_spark.operators.text import rake_keywords

    df = spark.createDataFrame(
        [(1, "der schnelle hund und die kluge katze")],
        "doc_id long, text string",
    )
    # de stopwords split the phrase runs at der/und/die
    phrases = {
        r["phrase"] for r in rake_keywords(df, lang="de", top_k=10).collect()
    }
    assert "schnelle hund" in phrases and "kluge katze" in phrases
    with pytest.raises(ValueError, match="stopword"):
        rake_keywords(df, lang="sw")


def test_rake_zh_char_grain(spark):
    """lang='zh' tokenizes at Han-char grain: the single-char zh
    stopwords (的/了/是/在) actually delimit runs, so phrases are short
    char runs — never the whole (space-free) sentence as one token."""
    from geist_spark.operators.text import rake_keywords

    # "模型的训练数据是大规模语料" — 的 and 是 are zh stopwords and
    # must split the sentence into three candidate runs
    df = spark.createDataFrame(
        [(1, "模型的训练数据是大规模语料"), (2, "训练数据的质量")],
        "doc_id long, text string",
    )
    rows = rake_keywords(df, lang="zh", top_k=10).collect()
    phrases = {r["phrase"]: r["n_words"] for r in rows}
    # char-grain phrases are space-joined characters
    assert "模 型" in phrases and phrases["模 型"] == 2
    assert "训 练 数 据" in phrases and phrases["训 练 数 据"] == 4
    assert "大 规 模 语 料" in phrases
    # the un-split whole sentence must NOT appear anywhere
    assert all(len(p.split(" ")) <= 6 for p in phrases)
    # shared run across docs counted once per occurrence
    assert rows and all(r["n_occ"] >= 1 for r in rows)


def test_textrank_zh_char_grain(spark):
    """lang='zh' builds the co-occurrence graph between adjacent Han
    CHARACTERS (stopword chars removed), not whole sentences."""
    from geist_spark.operators.text import textrank_keywords

    df = spark.createDataFrame(
        [(1, "训练数据的训练数据"), (2, "数据质量")],
        "doc_id long, text string",
    )
    rows = textrank_keywords(df, lang="zh", top_n=10).collect()
    words = {r["word"] for r in rows}
    # nodes are single characters; 的 (stopword) is absent
    assert words <= {"训", "练", "数", "据", "质", "量"}
    assert "的" not in words and len(words) >= 4


def test_winnow_fingerprints_reference(spark):
    """winnow_fingerprints matches a direct python implementation of
    Schleimer et al. winnowing (rightmost min per window, distinct
    selections, 1-based positions), including docs shorter than k."""
    import hashlib

    from geist_spark.operators.text import winnow_fingerprints

    def ref(text, k=5, w=4):
        norm = " ".join(text.lower().split())
        n = max(len(norm) - k + 1, 1)
        grams = [
            int(hashlib.md5(norm[i:i + k].encode()).hexdigest()[:8], 16)
            for i in range(n)
        ]
        sels = set()
        for j in range(max(len(grams) - w + 1, 1)):
            win = grams[j:j + w]
            h = min(win)
            p = max(i for i, g in enumerate(win) if g == h) + j
            sels.add((p + 1, h))
        return sels

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "a quick brown fox jumps over a lazy cat",
        3: "ab",                       # shorter than k: one partial gram
        4: "aaaaaaaaaaaaaaaa",         # all-equal hashes: tie handling
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    rows = winnow_fingerprints(df, k=5, window=4).collect()
    for did, text in texts.items():
        got = {(r["pos"], r["fp_hash"]) for r in rows if r["doc_id"] == did}
        assert got == ref(text), did


def test_winnow_overlap_pairs(spark):
    """Docs sharing a long substring pair up (the w+k-1 guarantee);
    unrelated docs do not; the stop-fingerprint cap drops
    corpus-wide hashes; parameter guards raise."""
    import pytest

    from geist_spark.operators.text import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "a quick brown fox jumps over a lazy cat"),
         (3, "completely unrelated text with nothing shared")],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["shared_fps"]
             for r in winnow_overlap_pairs(df, min_shared=2).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert not any(3 in p for p in pairs)
    # a hash present in all three docs is dropped by max_hash_docs=2
    df2 = spark.createDataFrame(
        [(i, "common shared prefix text") for i in range(1, 4)],
        "doc_id long, text string",
    )
    assert winnow_overlap_pairs(df2, max_hash_docs=2).count() == 0
    with pytest.raises(ValueError, match="k and window"):
        winnow_fingerprints(df, k=0).collect()


def test_srt_parse(spark):
    """SRT and VTT cues: index/cue-id lines on line 1 are skipped
    (timestamp may sit on line 1 or 2), comma and dot millis both
    parse, multi-line text joins with newline, WEBVTT/NOTE blocks
    drop, file-final newline is trimmed, and cue_idx follows file
    order per media id."""
    from geist_spark.operators.text import srt_parse

    srt = (
        "1\n00:00:01,000 --> 00:00:02,500\nHello there\nsecond line\n\n"
        "2\n00:00:03,000 --> 00:00:04,000\nBye\n"
    )
    vtt = (
        "WEBVTT\n\nNOTE a comment\n\n"
        "intro-cue\n00:01:00.000 --> 00:01:02.000\nVTT cue\n\n"
        "01:00:00.500 --> 01:00:01.000\nbare cue\n"
    )
    df = spark.createDataFrame(
        [(1, srt), (2, vtt), (3, "no cues here\njust text")],
        "media_id long, srt string",
    )
    rows = {(r["media_id"], r["cue_idx"]): r
            for r in srt_parse(df).collect()}
    assert len(rows) == 4  # media 3 contributes nothing
    assert rows[(1, 1)]["start_ms"] == 1000
    assert rows[(1, 1)]["end_ms"] == 2500
    assert rows[(1, 1)]["text"] == "Hello there\nsecond line"
    assert rows[(1, 2)]["text"] == "Bye"
    assert rows[(2, 1)]["start_ms"] == 60000
    assert rows[(2, 1)]["text"] == "VTT cue"
    assert rows[(2, 2)]["start_ms"] == 3600500
    assert rows[(2, 2)]["text"] == "bare cue"


def test_language_id_ru_ar_hi(spark):
    """Cyrillic, Arabic and Devanagari text route through the
    universal tokenizer's word branch and score against the new
    stopword sets; existing languages keep winning their own text."""
    from geist_spark.operators.text import language_id

    df = spark.createDataFrame(
        [
            (1, "ru", "я не знаю что это как он в на"),
            (2, "ar", "هذا من على كان في مع عن هو"),
            (3, "hi", "यह है और का की के में से को पर"),
            (4, "en", "the cat and the dog in the house"),
        ],
        "doc_id long, lang string, text string",
    )
    out = {r["doc_id"]: r for r in language_id(df).collect()}
    assert out[1]["predicted_lang"] == "ru" and out[1]["score_ru"] > 0.5
    assert out[2]["predicted_lang"] == "ar" and out[2]["score_ar"] > 0.5
    assert out[3]["predicted_lang"] == "hi" and out[3]["score_hi"] > 0.5
    assert out[4]["predicted_lang"] == "en"
    assert out[4]["score_ru"] == 0.0


def test_markdown_strip_rules(spark):
    from geist_spark.operators.text import markdown_strip

    md = (
        "# Head\n\nA [link](http://x/a) and ![im](y.png), **b** *i* "
        "`c` snake_case __dd__\n\n- li\n12. num\n\n> q\n\n"
        "```js\ncode line\n```\n\n---\n\nS\n===\n\n"
        "auto <https://a.example/z> <em>t</em> end"
    )
    df = spark.createDataFrame([(1, md)], "doc_id long, text string")
    row = markdown_strip(df).collect()[0]
    assert row["plain"] == (
        "Head\n\nA link and im, b i c snake_case dd\n\nli\nnum\n\nq"
        "\n\ncode line\n\nS\n\nauto https://a.example/z t end"
    )
    assert row["n_links"] == 2      # inline + image
    assert row["n_headers"] == 1    # ATX only
    assert row["n_code_spans"] == 1


def test_chunk_text_invariants(spark):
    from geist_spark.operators.text import chunk_text

    df = spark.createDataFrame(
        [(1, "abcdefghij" * 5), (2, "short"), (3, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_text(df, chunk_chars=20, overlap=5).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    d1 = [r for r in rows if r["doc_id"] == 1]
    assert [r["chunk_text"] for r in d1] == [
        "abcdefghijabcdefghij", "fghijabcdefghijabcde",
        "abcdefghijabcdefghij",
    ]
    # consecutive chunks share exactly `overlap` characters
    assert d1[0]["chunk_text"][-5:] == d1[1]["chunk_text"][:5]
    assert d1[0]["chunk_id"] == 100000 and d1[2]["chunk_id"] == 100002
    # min-1-chunk rule: short and empty docs keep one row
    assert [r["chunk_text"] for r in rows if r["doc_id"] == 2] == ["short"]
    assert [r["n_chars"] for r in rows if r["doc_id"] == 3] == [0]
    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_text(df, chunk_chars=10, overlap=10)


def test_vtt_dialect(spark):
    from geist_spark.operators.text import srt_parse

    vtt = (
        "WEBVTT\n\nNOTE a comment\nspanning lines\n\n"
        "intro-cue\n00:03.500 --> 00:05.100 align:start position:10%\n"
        "Hello <c.yellow>world</c>\n<v Ann>Second line\n\n"
        "01:02:03.400 --> 01:02:04.000\nplain\n"
    )
    rows = sorted(
        srt_parse(
            spark.createDataFrame([(1, vtt)], "media_id long, srt string"),
            dialect="vtt",
        ).collect(),
        key=lambda r: r["cue_idx"],
    )
    assert [(r["start_ms"], r["end_ms"], r["text"]) for r in rows] == [
        (3500, 5100, "Hello world\nSecond line"),
        (3723400, 3724000, "plain"),
    ]
    import pytest

    with pytest.raises(ValueError, match="dialect"):
        srt_parse(
            spark.createDataFrame([(1, vtt)], "media_id long, srt string"),
            dialect="ass",
        )
