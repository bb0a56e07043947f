"""Text-analysis operators for training-data pipelines.

All JVM-side column expressions (split/regexp/aggregate) — no Python
UDFs — so they run at scan speed and have exact DuckDB oracles.

- quality features: token/char stats, punctuation + stopword ratios
- language-ID: stopword-overlap heuristic over small per-language sets
- token counting: whitespace + BPE-ish subword estimate
- fingerprinting: min-hash of character 8-grams (winnowing-lite)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from geist_spark.operators.dedup import normalize_text, tokens

# deliberately tiny, deterministic stopword sets (heuristic lang-id).
# Public lists: top function words per language; zh entries are the
# highest-frequency particles/pronouns (的 了 是 在 我 有 和 就 不 人),
# ja the highest-frequency single-kana particles (の は に を が …),
# ko the highest-frequency single-syllable particles (은 는 이 가 …).
# The CJK entries MUST stay last, zh before ja before ko: ties in
# language_id resolve to the earliest language in this dict order, and
# the existing oracles pin that ordering.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "que"],
    "es": ["el", "la", "los", "las", "y", "de", "un", "una", "es", "por"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "就", "不", "人"],
    "ja": ["の", "は", "に", "を", "が", "と", "で", "て", "も", "だ"],
    "ko": ["은", "는", "이", "가", "을", "를", "의", "에", "도", "로"],
    # whitespace-delimited scripts: the universal tokenizer's
    # non-space-run branch already yields whole words for Cyrillic,
    # Arabic and Devanagari (no char-grain routing needed)
    "ru": ["и", "в", "не", "на", "я", "что", "с", "он", "как", "это"],
    "ar": ["في", "من", "على", "أن", "إلى", "هذا", "كان", "مع", "عن",
           "هو"],
    "hi": ["है", "और", "का", "की", "के", "में", "से", "को", "पर",
           "यह"],
}

# CJK Unified Ideographs base block — the deterministic, engine-portable
# core (Java and RE2 both accept \x{...}; script names are spelled
# differently per engine, so the explicit range is used in oracles too)
_HAN = r"\x{4e00}-\x{9fff}"
# hiragana (3040-309f) + katakana (30a0-30ff): one contiguous block
_KANA = r"\x{3040}-\x{30ff}"
# Hangul precomposed syllables (ac00-d7af)
_HANGUL = r"\x{ac00}-\x{d7af}"
# one Han/kana/Hangul character per token; everything else tokenizes
# as non-space runs (identical to whitespace tokenization on
# whitespace-delimited text — zh/ja have no word spaces and ko
# agglutinates particles onto eojeol, so char-grain is the standard
# dependency-free fallback for all three)
_CJK = rf"{_HAN}{_KANA}{_HANGUL}"
UNIVERSAL_TOKEN_RE = rf"[{_CJK}]|[^\s{_CJK}]+"


def universal_tokens(text: F.Column) -> F.Column:
    """Language-agnostic tokenization: single Han/kana/Hangul
    characters + non-space runs over lowercased text. On
    whitespace-delimited languages this yields exactly the whitespace
    tokens (runs between spaces); on CJK it falls back to character
    grain instead of treating a whole sentence (zh/ja) or a
    particle-agglutinated eojeol (ko) as one token. Used where the
    language is unknown or mixed (language_id, lang_col quality
    scoring)."""
    return F.regexp_extract_all(F.lower(text), F.lit(UNIVERSAL_TOKEN_RE), 0)


def lang_stopword_sets(lang_col: F.Column) -> F.Column:
    """Per-row stopword array selected by a language column; languages
    outside STOPWORDS get an EMPTY set (ratio 0), never silently scored
    against English — the mis-scoring trap of a hardcoded en list."""
    expr = F.expr("CAST(array() AS array<string>)")
    for lang, words in STOPWORDS.items():
        expr = F.when(
            lang_col == lang, F.array(*[F.lit(w) for w in words])
        ).otherwise(expr)
    return expr


def _ratio_in(toks: F.Column, words: list[str]) -> F.Column:
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
    # overlap of DISTINCT tokens (deterministic, set semantics)
    return hits / F.greatest(F.size(F.array_distinct(toks)), F.lit(1))


def quality_features(
    documents: DataFrame, lang_col: str | None = None
) -> DataFrame:
    """Per-doc quality scoring features (length/punct/stopword ratios,
    rounded for cross-engine stability).

    lang_col=None keeps the original English-corpus contract
    (whitespace tokens, en stopword list). Passing a language column
    makes scoring language-aware per ROW: tokens come from the
    universal tokenizer (CJK char-grain fallback) and the stopword
    ratio is computed against THAT row's language list
    (lang_stopword_sets — unknown languages score 0, not en)."""
    if lang_col is None:
        toks = tokens(F.col("text"))
        sw: F.Column | None = None
    else:
        toks = universal_tokens(F.col("text"))
        sw = lang_stopword_sets(F.col(lang_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col("text"))
    punct = F.length(F.regexp_replace(F.col("text"), r"[^\.,;:!\?]", ""))
    stop_hits = F.size(
        F.array_intersect(
            toks,
            sw if sw is not None
            else F.array(*[F.lit(w) for w in STOPWORDS["en"]]),
        )
    )
    return documents.select(
        "doc_id",
        *([F.col(lang_col)] if lang_col is not None else []),
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(n_chars / F.greatest(n_tok, F.lit(1)), 4).alias("avg_token_len"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(F.size(F.array_distinct(toks)), F.lit(1)), 6).alias(
            "stopword_ratio"
        ),
    )


def predicted_lang_col(text: F.Column) -> F.Column:
    """The language_id argmax as ONE self-contained column expression
    (no score_ columns, no join): distinct universal tokens scored
    against each stopword set, max-wins with the fixed language-order
    tiebreak (array_position = first occurrence), 'unknown' when
    nothing scores. Zero shuffle — a free rider on the scan (the
    compiler pipeline's langFilter step builds on this).

    Shape matters here: the naive formulation (inline the tokenizer
    into greatest(...) + one `when` arm per language) duplicates the
    regexp_extract_all tree ~20x, which blows janino's 64 KB
    generated-method limit — the stage silently falls back to
    interpreted eval AND re-tokenizes the document per arm (round-8
    verdict defect). Instead the token array and the 10-score array
    are each bound ONCE via `transform` over a single-element array
    (a let-binding the optimizer cannot inline apart); the lambda
    body references the bound variable, so the document is tokenized
    exactly once per row and each score computed once. The
    higher-order functions evaluate via CodegenFallback inside a
    still-codegen'd stage — no 64 KB method, no CodeGenerator ERROR."""
    lang_names = F.array(*[F.lit(lang) for lang in STOPWORDS])

    def _argmax(scores: F.Column) -> F.Column:
        best = F.array_max(scores)
        return F.when(
            best > 0,
            F.element_at(
                lang_names, F.array_position(scores, best).cast("int")
            ),
        ).otherwise(F.lit("unknown"))

    # bind the score array once so array_max + array_position do not
    # each re-run the tokenization + 10 intersections
    return F.element_at(
        F.transform(F.array(lang_scores_col(text)), _argmax), 1
    )


def lang_scores_col(text: F.Column) -> F.Column:
    """All 10 language stopword-overlap scores as ONE array<double>
    column, with the document tokenized exactly once: the distinct
    universal-token array is bound via a single-element `transform`
    let-binding, and the lambda maps the 10 literal stopword arrays to
    rounded overlap ratios. The binding is deliberate — inlining the
    tokenizer per score is what blew janino's 64 KB method limit when
    a downstream filter substituted the aliases (round-8 defect)."""
    sw_arrays = F.array(
        *[
            F.array(*[F.lit(w) for w in words])
            for words in STOPWORDS.values()
        ]
    )
    toks0 = F.array_distinct(universal_tokens(text))
    return F.element_at(
        F.transform(
            F.array(toks0),
            lambda toks: F.transform(
                sw_arrays,
                lambda sw: F.round(
                    F.size(F.array_intersect(toks, sw))
                    / F.greatest(F.size(toks), F.lit(1)),
                    6,
                ),
            ),
        ),
        1,
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Heuristic language-ID: distinct-token overlap with per-language
    stopword sets; argmax with fixed language order tiebreak
    (array_position = first occurrence on ties). Tokenization is the
    UNIVERSAL tokenizer (not whitespace): CJK text has no word spaces,
    so whitespace tokens would make zh structurally undetectable; on
    whitespace-delimited text the two tokenizers agree (verified
    value-identical on the synthetic corpus).

    Plan shape: the 10 scores materialize as one `_scores`
    array<double> column (lang_scores_col — one tokenization, HOF
    let-binding), and every output column is a cheap element_at /
    array_max over that attribute. CollapseProject won't inline a
    non-cheap multi-referenced alias, and even if a downstream filter
    pushes the predicted_lang expression through the projection, the
    substituted tree holds ONE tokenizer, not 20 — the round-8
    greatest+when formulation re-tokenized per arm and silently fell
    back to interpreted eval when consumed by a filter."""
    langs = list(STOPWORDS)
    scored = documents.select(
        "doc_id",
        "lang",
        lang_scores_col(F.col("text")).alias("_scores"),
    )
    lang_names = F.array(*[F.lit(lang) for lang in langs])
    best = F.array_max(F.col("_scores"))
    pred = F.when(
        best > 0,
        F.element_at(
            lang_names,
            F.array_position(F.col("_scores"), best).cast("int"),
        ),
    ).otherwise(F.lit("unknown"))
    return scored.select(
        "doc_id",
        "lang",
        *[
            F.element_at(F.col("_scores"), i + 1).alias(f"score_{lang}")
            for i, lang in enumerate(langs)
        ],
        pred.alias("predicted_lang"),
    )


def token_stats(documents: DataFrame) -> DataFrame:
    """Corpus token statistics per source: whitespace tokens plus a
    BPE-ish subword estimate (ceil(chars/4) per token — the standard
    ~4-chars-per-token heuristic), aggregated per source."""
    toks = tokens(F.col("text"))
    subword_est = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"),
    )
    per_doc = documents.select(
        "source",
        F.size(toks).alias("n_tokens"),
        subword_est.alias("n_subwords"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_subwords").alias("total_subwords"),
        # sum and count are exact longs, so a single double division is
        # bit-identical across engines; round(avg(...)) is not (round-1
        # driver-hash mismatch)
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1)))
        .alias("avg_tokens"),
    )


def _run_length_stats(grams: F.Column) -> F.Column:
    """(max_count, dup_occurrences) over an array of grams, computed as
    a linear pass over the sorted array — stays entirely in codegen,
    zero shuffle, O(n log n) per row.

    dup_occurrences counts every occurrence of a gram whose total count
    is >= 2 (when a run reaches 2 both elements are counted, then +1
    per further repeat) — the Gopher "fraction of tokens in duplicated
    n-grams" numerator."""
    state0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("dup"),
    )

    def step(s, g):
        run = F.when(g == s.prev, s.run + 1).otherwise(F.lit(1).cast("long"))
        dup = (
            s.dup
            + F.when(run == 2, F.lit(2))
            .when(run > 2, F.lit(1))
            .otherwise(F.lit(0))
        )
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.greatest(s.best, run).alias("best"),
            dup.alias("dup"),
        )

    return F.aggregate(
        F.array_sort(grams),
        state0,
        step,
        lambda s: F.struct(s.best.alias("best"), s.dup.alias("dup")),
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021, A1.1),
    token-based: duplicate-token fraction, most-common-bigram fraction,
    duplicate-trigram fraction. High values flag boilerplate/spam docs
    for corpus filtering.

    All numerators/denominators are exact longs; each fraction is a
    single long/long double division, so values are bit-identical
    across engines (the round-1 driver-gate float lesson). Per-doc
    arrays only — zero shuffle, scales linearly with corpus size."""
    from geist_spark.operators.bucketing import fan_out

    toked = fan_out(documents).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    t = F.col("toks")
    n = F.size(t)

    def grams(k: int) -> F.Column:
        if k == 1:
            return t
        idx = F.sequence(F.lit(1), n - (k - 1))
        made = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, k)))
        return F.when(n >= k, made).otherwise(
            F.array().cast("array<string>")
        )

    staged = toked.select(
        "doc_id",
        n.alias("n_tokens"),
        _run_length_stats(t).alias("s1"),
        _run_length_stats(grams(2)).alias("s2"),
        _run_length_stats(grams(3)).alias("s3"),
    )
    return staged.select(
        "doc_id",
        "n_tokens",
        (F.col("s1.dup").cast("double") / F.greatest(F.col("n_tokens"), F.lit(1)))
        .alias("dup_token_frac"),
        (
            F.col("s2.best").cast("double")
            / F.greatest(F.col("n_tokens") - 1, F.lit(1))
        ).alias("top_bigram_frac"),
        (
            F.col("s3.dup").cast("double")
            / F.greatest(F.col("n_tokens") - 2, F.lit(1))
        ).alias("dup_trigram_frac"),
    )


def doc_fingerprint(documents: DataFrame, gram: int = 8, num_mins: int = 4) -> DataFrame:
    """Rolling-hash document fingerprint: the `num_mins` smallest md5s
    of character `gram`-grams (winnowing-lite), concatenated. Stable
    across engines; array ops stay in codegen."""
    from geist_spark.operators.bucketing import fan_out

    # materialize norm first: referencing the regexp_replace inside the
    # per-position lambda would re-normalize once per character; widen
    # skinny inputs — one md5 per char position is the most CPU-heavy
    # map stage in the repo
    normed = fan_out(documents).select(
        "doc_id", normalize_text(F.col("text")).alias("norm")
    )
    norm = F.col("norm")
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - gram + 1, F.lit(1)))
    grams = F.transform(idx, lambda i: F.md5(norm.substr(i, F.lit(gram))))
    mins = F.slice(F.array_sort(F.array_distinct(grams)), 1, num_mins)
    return normed.select("doc_id", F.concat_ws("|", mins).alias("fingerprint"))


def winnow_fingerprints(
    documents: DataFrame, k: int = 5, window: int = 4
) -> DataFrame:
    """POSITIONAL winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every character k-gram of
    the normalized text (md5-prefix 32-bit, the repo's engine-exact
    hash), slide a window of `window` consecutive k-gram hashes, keep
    the minimum hash per window (RIGHTMOST on ties, per the paper),
    and deduplicate repeated selections. Guarantee: any substring
    shared between two documents of length >= window + k - 1
    contributes at least one shared fingerprint — with its position,
    so overlaps can be localized. doc_fingerprint above is the
    global-min "winnowing-lite" sketch (no guarantee, no positions);
    this is the real windowed algorithm.

    Output: (doc_id, pos, fp_hash), pos the 1-based char position of
    the selected k-gram in the normalized text.

    Scale shape: pure JVM array expressions (sequence / transform /
    nested aggregate) — map-only, zero shuffle, O(n * window)
    comparisons per doc inside codegen; docs shorter than k hash as
    one partial gram (the doc_fingerprint rule). At 100 TB this is
    scan -> explode; downstream overlap detection joins at HASH grain
    (winnow_overlap_pairs), never all-pairs.

    Reference: the reference engine ships no text analytics by design
    (README.md:21) — LLM-pipeline extension surface."""
    from geist_spark.operators.bucketing import fan_out
    from geist_spark.operators.dedup import normalize_text

    if k < 1 or window < 1:
        raise ValueError("k and window must be >= 1")
    normed = fan_out(documents).select(
        "doc_id", normalize_text(F.col("text")).alias("norm")
    )
    norm = F.col("norm")
    n_grams = F.greatest(F.length(norm) - k + 1, F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.conv(
            F.md5(norm.substr(i, F.lit(k))).substr(1, 8), 16, 10
        ).cast("long"),
    )
    g = normed.select("doc_id", grams.alias("grams"))
    gcol = F.col("grams")
    # one struct (h, p) per window: rightmost min via <= in the fold;
    # element_at past the array end is NULL, so short docs' lone
    # window folds over only the real grams
    wins = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size(gcol) - window + 1, F.lit(1))
        ),
        lambda j: F.aggregate(
            F.sequence(F.lit(0), F.lit(window - 1)),
            F.struct(
                F.lit(1 << 40).cast("long").alias("h"),
                F.lit(0).alias("p"),
            ),
            lambda acc, off: F.when(
                F.element_at(gcol, j + off) <= acc["h"],
                F.struct(
                    F.element_at(gcol, j + off).alias("h"),
                    (j + off).alias("p"),
                ),
            ).otherwise(acc),
        ),
    )
    return g.select(
        "doc_id", F.explode(F.array_distinct(wins)).alias("fp")
    ).select(
        "doc_id",
        F.col("fp.p").alias("pos"),
        F.col("fp.h").alias("fp_hash"),
    )


def winnow_overlap_pairs(
    documents: DataFrame,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_hash_docs: int = 64,
) -> DataFrame:
    """Plagiarism-style overlap candidates from winnowing fingerprints:
    docs sharing >= min_shared distinct fingerprint hashes. The join
    is at HASH grain (the MinHash-LSH shape) — never all-pairs — and
    hashes appearing in more than `max_hash_docs` docs are dropped
    first (stop-fingerprints: corpus-wide boilerplate would otherwise
    join quadratically — the hot-bucket cap every band join in
    dedup.py applies). Output: (doc_a, doc_b, shared_fps),
    doc_a < doc_b."""
    fps = winnow_fingerprints(documents, k, window)
    # group doc ids per hash and expand pairs IN-ROW (sorted array ->
    # ordered combinations): one shuffle to hash grain, one to pair
    # grain — no self-join, so the fingerprint map stage runs once
    # and the hot-hash cap bounds the in-row expansion at
    # max_hash_docs^2/2 structs
    byhash = (
        fps.groupBy("fp_hash")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("docs"))
        .filter(F.size("docs").between(2, max_hash_docs))
    )
    docs = F.col("docs")
    pairs = F.explode(
        F.flatten(
            F.transform(
                docs,
                lambda x, i: F.transform(
                    F.slice(docs, i + F.lit(2), F.size(docs)),
                    lambda y: F.struct(
                        x.alias("doc_a"), y.alias("doc_b")
                    ),
                ),
            )
        )
    )
    return (
        byhash.select(pairs.alias("p"))
        .groupBy(
            F.col("p.doc_a").alias("doc_a"),
            F.col("p.doc_b").alias("doc_b"),
        )
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def top_terms_per_source(
    documents: DataFrame, top_n: int = 5, min_tf: int = 5
) -> DataFrame:
    """Distinctive vocabulary per source: terms ranked by frequency
    LIFT — (term share within source) / (term share in the corpus) —
    the TF-IDF-style signal for corpus drift monitoring and source
    profiling, expressed in pure rational arithmetic (no log, whose
    last-ulp behavior differs across libms; lift preserves the exact
    ranking property that makes top-N deterministic).

    Shape: one token explode (the dominant cost, paid once), one
    groupBy (source, term), a broadcast join of per-term corpus
    totals (vocabulary-sized), and a per-source top-N window.
    `min_tf` prunes the hapax tail BEFORE the join — at 100 TB the
    vocabulary's long tail is most of the rows and none of the
    signal."""
    tok = documents.select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    per_src = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).filter(F.col("tf") >= min_tf)
    src_totals = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("src_tokens")
    )
    term_totals = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("term_total")
    )
    all_total = tok.agg(F.count(F.lit(1)).alias("all_tokens"))
    lift = (
        (F.col("tf") / F.col("src_tokens"))
        / (F.col("term_total") / F.col("all_tokens"))
    )
    scored = (
        per_src.join(F.broadcast(src_totals), "source")
        .join(term_totals, "term")
        .crossJoin(F.broadcast(all_total))
        .select(
            "source",
            "term",
            "tf",
            F.round(lift, 6).alias("lift"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("lift").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
    )


def boilerplate_ngrams(
    documents: DataFrame,
    k: int = 3,
    top_n: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Boilerplate candidates: the k-token shingles appearing in the
    most DISTINCT documents (headers, footers, cookie banners,
    license blurbs). The output feeds exclusion filters and explains
    hot LSH buckets — it is the same shingle table every dedup family
    already pays for, aggregated the other way (by shingle, not doc).

    Counting distinct docs (not occurrences) keeps within-doc
    repetition from masquerading as boilerplate; `min_docs` prunes the
    singleton tail before the top-N heap."""
    from geist_spark.operators.dedup import shingles

    sh = shingles(documents, k=k)
    counts = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    return counts.orderBy(
        F.col("n_docs").desc(), F.col("shingle").asc()
    ).limit(top_n)


_SRT_TS_RE = (
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})"
    r"\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})"
)

# WebVTT: hours are OPTIONAL (MM:SS.mmm legal), '.' only, and cue
# settings may trail the arrow target — the pattern anchors the
# timestamp pair and ignores the rest of the line
_VTT_TS_RE = (
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})"
    r"[ \t]*-->[ \t]*"
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})"
)


def srt_parse(
    subs: DataFrame,
    id_col: str = "media_id",
    text_col: str = "srt",
    dialect: str = "srt",
) -> DataFrame:
    """SubRip/WebVTT cue extraction — the video-to-text bridge for
    training-data pipelines (subtitles are a major text source for
    video corpora). Blocks split on blank lines; a cue's timestamp
    line ("HH:MM:SS,mmm --> HH:MM:SS,mmm", VTT uses '.') may sit on
    line 1 (VTT/bare SRT) or line 2 (after an index/cue-id line —
    the first-two-lines rule is the documented dialect); remaining
    lines join with '\\n' as the cue text. Non-cue blocks (WEBVTT
    header, NOTE/STYLE) drop. Output: (id, cue_idx 1-based in file
    order, start_ms, end_ms, text).

    ALL JVM (split/posexplode/regexp_extract/slice) + one window
    shuffle at file grain for cue_idx — subtitle files are small, so
    at 100 TB this is scan -> explode with per-file ordering, never
    a global sort. The DuckDB oracle replays the same regexp
    arithmetic (pattern is RE2-compatible).

    dialect='vtt' switches to the WebVTT grammar: hours OPTIONAL in
    timestamps (MM:SS.mmm), cue settings after the arrow target
    tolerated, and inline markup (<c>, <v Speaker>, <i>, ...)
    stripped from cue text."""
    if dialect not in ("srt", "vtt"):
        raise ValueError("dialect must be 'srt' or 'vtt'")
    ts_re = _SRT_TS_RE if dialect == "srt" else _VTT_TS_RE
    blocks = subs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), r"\r?\n[ \t]*\r?\n+")
        ).alias("pos", "block"),
    )
    lines = F.split(F.col("block"), r"\r?\n")
    l1, l2 = F.element_at(lines, 1), F.element_at(lines, 2)
    tsi = (
        F.when(l1.rlike(ts_re), 1)
        .when(l2.rlike(ts_re), 2)
    )
    with_ts = blocks.select(
        id_col, "pos", lines.alias("lines"), tsi.alias("tsi")
    ).filter(F.col("tsi").isNotNull())
    ts_line = F.element_at(F.col("lines"), F.col("tsi"))

    def ms(base: int) -> F.Column:
        def g(i: int) -> F.Column:
            c = F.regexp_extract(ts_line, ts_re, base + i)
            if dialect == "vtt" and i == 0:
                # optional-hours group extracts '' when absent
                return F.coalesce(
                    F.nullif(c, F.lit("")).cast("long"), F.lit(0)
                )
            return c.cast("long")

        return (
            g(0) * 3600000 + g(1) * 60000 + g(2) * 1000 + g(3)
        )

    cue_text = F.regexp_replace(
        F.array_join(
            F.slice(
                F.col("lines"),
                F.col("tsi") + 1,
                F.size(F.col("lines")),
            ),
            "\n",
        ),
        r"\n+$",  # file-final newline lands as an empty line
        "",
    )
    if dialect == "vtt":
        cue_text = F.regexp_replace(cue_text, r"</?[A-Za-z][^<>\n]*>", "")
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        with_ts.withColumn("cue_idx", F.row_number().over(w))
        .select(
            id_col,
            "cue_idx",
            ms(1).alias("start_ms"),
            ms(5).alias("end_ms"),
            cue_text.alias("text"),
        )
    )


def line_dedup(
    documents: DataFrame,
    sep: str = "\n",
    min_doc_freq: int = 2,
    min_chars: int = 10,
) -> DataFrame:
    """C4/CCNet-style exact line-level dedup: drop every line whose
    normalized form (lower + trim) appears in >= `min_doc_freq`
    DISTINCT documents (cookie banners, nav bars, footers, license
    blurbs), preserving the order of surviving lines per doc.

    Lines shorter than `min_chars` after trimming are EXEMPT — they
    are dropped from consideration, not from the doc. That is both the
    C4 semantic (short fragments aren't boilerplate evidence) and the
    skew guard: empty/near-empty lines are the hottest keys in a web
    corpus and would otherwise dominate the count shuffle.

    Scale shape: one explode, a partial-agg distinct-doc count on
    md5(line) (uniform key — no salting needed), a LEFT ANTI join of
    lines against the duplicated-key set (bounded by the number of
    DISTINCT boilerplate lines, far smaller than the line table), and
    one groupBy(doc_id) to reassemble. Every doc survives, even if all
    its lines are dropped (left join back to the input).

    Output: doc_id, text (deduped), n_lines_kept, n_lines_dropped.
    """
    norm = lambda c: F.lower(F.trim(c))  # noqa: E731
    # NULL text is treated as empty: split(NULL) is NULL and posexplode
    # would emit no rows, silently dropping the doc — violating the
    # every-doc-survives contract below
    lines = documents.select(
        "doc_id",
        F.posexplode(
            F.split(F.coalesce(F.col("text"), F.lit("")), F.lit(sep), -1)
        ).alias("pos", "line"),
    )
    eligible = F.length(norm(F.col("line"))) >= min_chars
    dup_keys = (
        lines.filter(eligible)
        .select(F.md5(norm(F.col("line"))).alias("lkey"), "doc_id")
        .distinct()
        .groupBy("lkey")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_doc_freq)
        .select("lkey")
    )
    keyed = lines.withColumn(
        "lkey", F.when(eligible, F.md5(norm(F.col("line"))))
    )
    survivors = keyed.join(dup_keys, "lkey", "left_anti")
    rebuilt = survivors.groupBy("doc_id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("line")))
                ),
                lambda s: s.getField("line"),
            ),
        ).alias("text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    totals = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__n_total")
    )
    return (
        # doc-grain both sides: pin the shuffle join (AQE may still
        # localize it; a misestimated broadcast of the rebuilt-text
        # table would collect the corpus to the driver)
        totals.join(rebuilt.hint("merge"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            F.coalesce(F.col("n_lines_kept"), F.lit(0)).alias(
                "n_lines_kept"
            ),
            (
                F.col("__n_total")
                - F.coalesce(F.col("n_lines_kept"), F.lit(0))
            ).alias("n_lines_dropped"),
        )
    )


# common UTF-8-decoded-as-cp1252 mojibake sequences and invisible
# characters (escaped so the source stays ASCII), in fix order.
# Pure literal replacements -- identical semantics in any engine.
MOJIBAKE_FIXES = [
    ("\u00e2\u20ac\u2122", "'"),      # a-hat euro TM   -> right single quote
    ("\u00e2\u20ac\u02dc", "'"),      # a-hat euro ~    -> left single quote
    ("\u00e2\u20ac\u0153", '"'),      # a-hat euro oe   -> left double quote
    ("\u00e2\u20ac\u201d", "-"),      # a-hat euro rdq  -> em dash
    ("\u00e2\u20ac\u201c", "-"),      # a-hat euro ldq  -> en dash
    ("\u00e2\u20ac\u00a6", "..."),    # a-hat euro brokenbar -> ellipsis
    ("\u00c3\u00a9", "\u00e9"),       # A-tilde (c)     -> e-acute
    ("\u00c3\u00a8", "\u00e8"),       #                 -> e-grave
    ("\u00c3\u00bc", "\u00fc"),       #                 -> u-umlaut
    ("\u00c3\u00b6", "\u00f6"),       #                 -> o-umlaut
    ("\u00c3\u00a4", "\u00e4"),       #                 -> a-umlaut
    ("\u00c3\u00b1", "\u00f1"),       #                 -> n-tilde
    ("\u00c2\u00a0", " "),             # A-circ + nbsp   -> space
    ("\u00a0", " "),                    # bare nbsp       -> space
    ("\u200b", ""),                     # zero-width space
    ("\ufeff", ""),                     # BOM / zero-width no-break
]


def fix_text(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """ftfy-lite text repair for crawl corpora: undo the most common
    UTF-8-read-as-cp1252 mojibake sequences, drop zero-width
    characters, normalize non-breaking spaces, strip C0 control
    characters (except tab/newline), and collapse space runs.

    The fix table is a literal `replace` chain (no regex except the
    control-strip and space-collapse), so the whole repair is ONE
    map-only codegen stage -- no shuffle, no Python -- and any engine
    that chains replace() reproduces it exactly.

    Output: doc_id, fixed text, and a changed flag (computed in the
    same pass, no second scan).
    """
    c = fixed_text_col(F.col(text_col))
    return documents.select(
        "doc_id",
        c.alias("text"),
        (c != F.col(text_col)).alias("changed"),
    )


def fixed_text_col(c: "F.Column") -> "F.Column":
    """The fix_text repair chain as a reusable column expression
    (used in-place by the declarative prep pipeline so other columns
    survive the step)."""
    for bad, good in MOJIBAKE_FIXES:
        c = F.replace(c, F.lit(bad), F.lit(good))
    # strip C0 controls except tab/newline, collapse space/tab runs
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0b-\\x1f\\x7f]", "")
    c = F.regexp_replace(c, "[ \\t]{2,}", " ")
    return F.trim(c)


def inverted_index(
    documents: DataFrame,
    min_df: int = 2,
    max_postings: int = 20,
) -> DataFrame:
    """Inverted-index construction: term -> document frequency + a
    capped, sorted posting list — the retrieval-side artifact a RAG
    corpus build emits next to its chunk table.

    Scale levers, both explicit: `min_df` prunes the hapax tail BEFORE
    the posting aggregation (at corpus scale most distinct terms occur
    once and index nothing useful), and `max_postings` caps the list a
    stop-ish term materializes (a term in every doc would otherwise
    build one row holding the whole corpus's ids — the classic
    inverted-index hot-row). df stays EXACT (counted pre-cap) so
    ranking signals are unaffected; only the stored list truncates,
    keeping the lowest doc_ids (deterministic).

    One token explode (distinct per doc), one groupBy(term). Postings
    serialize as a comma-joined string: a scalar column hashes/stores
    anywhere (the round-1 driver lesson on array outputs).
    """
    from geist_spark.operators.dedup import tokens

    term_doc = documents.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("term"),
    ).filter(F.col("term") != "")
    return (
        term_doc.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(
                        F.array_sort(F.collect_list("doc_id")),
                        1,
                        max_postings,
                    ),
                    lambda d: d.cast("string"),
                ),
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def corpus_oov_rate(
    documents: DataFrame, vocab_size: int = 100, min_tf: int = 2
) -> DataFrame:
    """Out-of-vocabulary rate per doc against the corpus's OWN top-N
    vocabulary (renamed from oov_rate: lm.oov_rate scores against an
    EXTERNAL reference vocab — same name, different contract, and the
    collision made call sites ambiguous) — the OCR-garbage / encoding-noise detector: clean text
    draws mostly from the head of the corpus distribution, mojibake
    and OCR spray draw from the tail.

    The vocabulary is the corpus's `vocab_size` most frequent tokens
    (freq desc, token asc tiebreak — deterministic), built with one
    explode + groupBy and BROADCAST back (vocab_size rows); the per-doc
    rate is then a map-side array intersection. Rates are exact
    int/int single divisions.

    Output: doc_id, n_tokens, n_oov, oov_rate.
    """
    from geist_spark.operators.dedup import tokens

    tok = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("t")
    ).filter(F.col("t") != "")
    vocab = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("tf"))
        .filter(F.col("tf") >= min_tf)
        .orderBy(F.col("tf").desc(), F.col("t").asc())
        .limit(vocab_size)
        .select(F.col("t").alias("__v"))
    )
    hits = (
        tok.join(F.broadcast(vocab), tok.t == F.col("__v"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("__v").isNull().cast("long")).alias("n_oov"),
        )
    )
    return hits.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        (
            F.col("n_oov").cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1))
        ).alias("oov_rate"),
    )


def bm25_topk(
    documents: DataFrame,
    queries: list[tuple[int, list[str]]] | DataFrame,
    k_top: int = 5,
) -> DataFrame:
    """BM25 retrieval (k1=6/5, b=3/4) over the corpus, top-k docs per
    query — the ranking-side counterpart of inverted_index.

    Determinism discipline: with the rational parameter choices every
    per-term contribution is a ratio of two exact BIGINT products —
    Robertson idf (N-df+1/2)/(df+1/2) becomes (2N-2df+1)/(2df+1), and
    clearing the tf-normalization denominators of avgdl = totlen/N
    gives

        num = (2N - 2*df + 1) * 22 * tf * totlen
        den = (2*df + 1) * (10*totlen*tf + 3*totlen + 9*dl*N)

    The ratio is materialized as floor(1e9 * num/den) nanos (one
    correctly-rounded IEEE division + exact floor, the same dodge
    CUSUM uses for round()-divergence), summed EXACTLY as BIGINTs per
    (query, doc), with one final division for display.

    Exactness bound, honestly: num and den are cast to double before
    the division, so the nanos value equals the true rational only
    while BOTH stay under 2^53 — num ~ 44*N*tf*totlen blows that at
    e.g. N=1e5 docs, totlen=1e7 tokens, tf > ~2 (NOT at "~10^5 docs"
    unconditionally).  Past the bound the score is still fully
    DETERMINISTIC and cross-engine reproducible — Spark and the DuckDB
    oracle perform the identical IEEE-754 double division and floor —
    it just may differ from the infinitely-precise ratio by an ULP's
    worth of floor flip, which can reorder two docs whose true scores
    are within ~1e-16 relative of each other.  If bit-exactness to the
    rational matters at corpus scale, compute num/den in
    DECIMAL(38,0); that requires pinning BOTH engines' decimal
    division scale rules (they differ), so it is deliberately not the
    default here.

    Plan: query terms are a driver literal (broadcast); the tf table
    joins on term so only matching postings shuffle; corpus stats are
    a 1-row broadcast; the final top-k is a per-query window. The
    corpus itself is scanned twice (doc lengths + tf) and never
    shuffled at document grain.
    """
    from geist_spark.operators.dedup import tokens

    spark = documents.sparkSession
    toks = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("totlen")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))

    if isinstance(queries, DataFrame):
        # (query_id, term) rows — must be broadcast-sized (a query
        # workload, not a corpus)
        qterms = queries.select("query_id", "term")
    else:
        from geist_spark.functions.localdf import local_df

        qterms = local_df(
            spark,
            [(qid, t) for qid, ts in queries for t in ts],
            "query_id int, term string",
        )
    # restrict to query-term postings FIRST: document frequency is
    # only needed for the query's terms, so df_ stays |query terms|
    # rows instead of the full corpus vocabulary (which must never be
    # collected or broadcast)
    tfq = tf.join(F.broadcast(qterms.select("term").distinct()), "term")
    df_ = tfq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    j = (
        tfq.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
    )
    n, totlen = F.col("n_docs"), F.col("totlen")
    num = (2 * n - 2 * F.col("df") + 1) * 22 * F.col("tf") * totlen
    den = (2 * F.col("df") + 1) * (
        10 * totlen * F.col("tf") + 3 * totlen + 9 * F.col("dl") * n
    )
    nanos = F.floor(
        num.cast("double") / den.cast("double") * F.lit(1000000000.0)
    )
    scored = (
        j.select("query_id", "doc_id", nanos.alias("nanos"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("nanos").alias("score_nanos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_nanos").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k_top)
        .select(
            "query_id",
            F.col("rn").alias("rank"),
            "doc_id",
            "score_nanos",
        )
    )


def term_stats(documents: DataFrame) -> DataFrame:
    """Per-term corpus statistics (df = docs containing the term,
    cnt = total occurrences) — the mergeable state behind
    inverted_index/bm25_topk. One token explode, one groupBy(term)."""
    from geist_spark.operators.dedup import tokens

    tok = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    return tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("cnt"),
    )


def merge_term_stats(*parts: DataFrame) -> DataFrame:
    """Merge term-stat states from DISJOINT document partitions (e.g.
    yesterday's index state + today's delta) by summation — the IVM
    pattern (see relational.mergeable_rollup): maintaining a 100 TB
    retrieval index costs one pass over the DELTA, never a rescan of
    history. Exact only when the same doc never appears in two parts
    (df sums assume disjoint doc sets); dedup upstream."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cnt").alias("cnt")
    )


# languages where whitespace tokens are the wrong keyword grain:
# zh/ja are not whitespace-delimited at all (whole sentences would
# become single "words" and stopword delimiting would never fire —
# silently meaningless phrases); ko has spaces but agglutinates
# particles onto eojeol, so char grain lets the single-syllable
# particle stopwords actually delimit runs
CHAR_GRAIN_LANGS = frozenset({"zh", "ja", "ko"})


def _keyword_tokens(col: F.Column, lang: str) -> F.Column:
    """Tokenizer selection for keyword extraction: whitespace tokens()
    for space-delimited languages, universal_tokens (Han + kana +
    Hangul char grain) for CJK. Punctuation is NOT a special delimiter
    on either path —
    whitespace tokens keep trailing punctuation attached, char-grain
    keeps punctuation runs as ordinary tokens — matching the existing
    en contract."""
    if lang in CHAR_GRAIN_LANGS:
        return universal_tokens(col)
    from geist_spark.operators.dedup import tokens

    return tokens(col)


def _resolve_stopwords(
    stopwords: list[str] | None, lang: str
) -> list[str]:
    """Explicit list wins; otherwise select STOPWORDS[lang], raising a
    typed error for unknown languages instead of silently scoring a
    non-English corpus against the en list."""
    if stopwords is not None:
        return stopwords
    if lang not in STOPWORDS:
        raise ValueError(
            f"no stopword list for lang={lang!r}; known: "
            f"{sorted(STOPWORDS)} — pass stopwords= explicitly"
        )
    return STOPWORDS[lang]


def rake_keywords(
    documents: DataFrame,
    stopwords: list[str] | None = None,
    max_words: int = 6,
    top_k: int = 20,
    lang: str = "en",
) -> DataFrame:
    """RAKE keyword/phrase extraction (Rose et al. 2010): candidate
    phrases are maximal stopword-free token runs (<= max_words);
    each word scores degree/freq over the candidate corpus (degree =
    occurrence-weighted total length of phrases containing the word);
    a phrase scores the sum of its words' scores. Scores are kept in
    exact integers — word_score_fx = (degree * 1e6) div freq, summed
    per phrase — so ranking is order-independent and the DuckDB oracle
    replays it bit-for-bit (same `div` trick as lm.py's log-free
    proxies).

    Plan shape at 100 TB: run detection is one per-doc window
    (partitionBy doc_id — fully parallel); documents collapse to
    phrase grain in one agg; word stats and the score join are
    VOCABULARY-grain (distinct candidate phrases x words), never
    per-document. The final global top-k is orderBy+limit, which
    compiles to TakeOrderedAndProject — each map task forwards only
    its local top k, so no single reducer ever sorts the phrase table
    (an unpartitioned rank window would; Spark's WindowGroupLimit
    rewrite does NOT fire for empty partition specs — verified). The
    rank column is then numbered on the k surviving rows.

    Language handling: `lang` selects BOTH the stopword list and the
    tokenizer — CHAR_GRAIN_LANGS (zh/ja/ko) route through
    universal_tokens (Han + kana + Hangul char grain), so a CJK
    document yields single-character tokens and the single-char
    stopwords (的 了 是 … / の は に … / 은 는 이 …) actually delimit
    runs; whitespace tokenization would hand the whole sentence over
    as one token and emit sentence-sized "phrases". Char-grain phrases
    are still space-joined internally (the word-stat split depends on
    it); n_words counts CHARACTERS for CJK. An explicit stopwords=
    list does not change the tokenizer — lang alone picks it.

    Returns (phrase, n_words, n_occ, score_fx, rank), rank 1..top_k by
    score_fx desc then phrase asc.
    """
    from geist_spark.operators.bucketing import fan_out

    stop = _resolve_stopwords(stopwords, lang)
    stop_arr = F.array(*[F.lit(w) for w in stop])
    tok = fan_out(documents).select(
        "doc_id",
        F.posexplode(_keyword_tokens(F.col("text"), lang)).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    ns = tok.filter(~F.array_contains(stop_arr, F.col("tok")))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    runs = ns.withColumn(
        "grp", F.col("pos") - F.row_number().over(wd)
    )
    ph = (
        runs.groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .filter(F.col("n_words") <= max_words)
    )
    # cand feeds TWO branches (word stats + the score join) — eager
    # checkpoint so the document scan/tokenize/run-detect pipeline runs
    # once, and per repo cache policy no persist fragment is left behind
    cand = (
        ph.groupBy("phrase", "n_words")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .localCheckpoint(eager=True)
    )
    wx = cand.select(
        "phrase", "n_words", "n_occ",
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
    )
    ws = wx.groupBy("w").agg(
        F.sum("n_occ").alias("freq"),
        F.sum(F.col("n_occ") * F.col("n_words")).alias("degree"),
    ).select("w", F.expr("(degree * 1000000) div freq").alias("wscore"))
    scored = (
        wx.join(ws, "w")
        .groupBy("phrase", "n_words", "n_occ")
        .agg(F.sum("wscore").alias("score_fx"))
    )
    top = scored.orderBy(
        F.col("score_fx").desc(), F.col("phrase").asc()
    ).limit(top_k)
    # non-foldable constant partition key over the limit-bounded rows
    # (see bucketing.nonfoldable_zero for why a literal won't do)
    from geist_spark.operators.bucketing import nonfoldable_zero

    wr = Window.partitionBy(nonfoldable_zero("phrase")).orderBy(
        F.col("score_fx").desc(), F.col("phrase").asc()
    )
    return top.withColumn("rank", F.row_number().over(wr)).select(
        "phrase", "n_words", "n_occ", "score_fx", "rank"
    )


def textrank_keywords(
    documents: DataFrame,
    stopwords: list[str] | None = None,
    iters: int = 3,
    top_n: int = 20,
    lang: str = "en",
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): build the
    word co-occurrence graph — an undirected edge between two
    non-stopword tokens directly ADJACENT in a document — and rank
    words by PageRank over it. The graph-centrality complement to
    RAKE's frequency/degree scoring: RAKE surfaces long distinctive
    phrases, TextRank surfaces the words the corpus keeps arranging
    around.

    Composition, not reimplementation: the graph is ranked by
    graph.pagerank — the same fixed-point integer arithmetic
    (PR_SCALE grid, floor division), so the DuckDB oracle replays the
    edge build plus the identical unrolled iterations bit-for-bit.

    Shape at 100 TB: tokenize + adjacency detection is one per-doc
    window (partitionBy doc_id, fully parallel); the edge list then
    collapses to DISTINCT vocabulary-grain pairs — all pagerank
    iterations run at vocabulary grain, never touching documents
    again. Final top-n is orderBy+limit (TakeOrderedAndProject — map
    tasks forward local top-n only, no global sort), numbered on the
    n survivors.

    Language handling matches rake_keywords: `lang` picks the
    tokenizer too — CHAR_GRAIN_LANGS (zh/ja/ko) tokenize at Han +
    kana + Hangul char grain via universal_tokens, so the
    co-occurrence graph is between adjacent CHARACTERS and the
    single-char stopwords actually drop out; whitespace tokens would
    make every zh/ja sentence one node.

    Returns (word, pr, rank), rank 1..top_n by pr desc then word asc.
    """
    from geist_spark.operators.graph import pagerank

    from geist_spark.operators.bucketing import fan_out

    stop = _resolve_stopwords(stopwords, lang)
    stop_arr = F.array(*[F.lit(w) for w in stop])
    # adjacency array-side (the lm.quality pattern): zip the token
    # array with its shifted self, so an edge is (toks[i], toks[i+1])
    # with both endpoints non-empty non-stopwords. This is exactly the
    # old posexplode + per-doc lag-window formulation (pos diff == 1
    # on the ORIGINAL positions with both survivors) minus the
    # window's exchange + sort over every token row — adjacency never
    # leaves the document row.
    toks = _keyword_tokens(F.col("text"), lang)
    n = F.size(toks)
    adj = fan_out(documents).select(
        F.explode(
            F.arrays_zip(
                toks.alias("w1"),
                F.concat(
                    F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                    F.array(F.lit(None).cast("string")),
                ).alias("w2"),
            )
        ).alias("p"),
    ).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    ).filter(
        F.col("w2").isNotNull()
        & (F.col("w1") != "")
        & (F.col("w2") != "")
        & (F.col("w1") != F.col("w2"))
        & ~F.array_contains(stop_arr, F.col("w1"))
        & ~F.array_contains(stop_arr, F.col("w2"))
    )
    # undirected: both directions, DISTINCT — vocabulary-grain from
    # here on (multiplicity deliberately dropped: classic TextRank is
    # unweighted; a weighted variant would carry the pair count into
    # pagerank's share term)
    # both directions from ONE pass over the edges (a union of two
    # selects over `adj` would re-run the tokenize+explode subtree
    # per branch — measured as a doubled 64-task stage at sf0.1)
    und = (
        adj.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("w1").alias("src"), F.col("w2").alias("dst")
                    ),
                    F.struct(
                        F.col("w2").alias("src"), F.col("w1").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    pr = pagerank(und, iters=iters)
    top = pr.orderBy(F.col("pr").desc(), F.col("node").asc()).limit(top_n)
    # non-foldable constant partition key (bucketing.nonfoldable_zero)
    from geist_spark.operators.bucketing import nonfoldable_zero

    wr = Window.partitionBy(nonfoldable_zero("node")).orderBy(
        F.col("pr").desc(), F.col("node").asc()
    )
    return top.withColumn("rank", F.row_number().over(wr)).select(
        F.col("node").alias("word"), "pr", "rank"
    )


def readability(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch readability scores (Flesch 1948 / Kincaid et al. 1975 —
    the standard text-difficulty features of corpus quality filters),
    computed EXACTLY in micro-scaled long arithmetic so the score is
    engine-identical (no IEEE division until never: the two rational
    terms are put over the common denominator S*W and floor-divided).

    Syllable estimation is the documented corpus-grain heuristic:
    vowel-group runs ([aeiouy]+ in the lowercased text — word breaks
    split runs, so the corpus total equals the per-word sum) minus
    consonant+'e' word endings (silent e), floored at one per word.
    Sentences = [.!?]+ runs, floored at 1. Patterns restricted to the
    Java-regex/RE2 common subset (no lookahead) so a DuckDB oracle
    replays them byte-identically.

    ENGLISH-ONLY heuristic: the silent-e rule and vowel set are
    English orthography; on other languages the score is meaningless
    (not merely noisy). Gate rows through language_id / a lang column
    first — quality_features(lang_col=...) is the language-aware
    feature path.

    grade_micro = 10^6 * (0.39*W/S + 11.8*Y/W - 15.59)  [FK grade]
    ease_micro  = 10^6 * (206.835 - 1.015*W/S - 84.6*Y/W)  [ease]
    both as exact floor divisions. Map-only, zero shuffle at any scale.
    """
    t = F.lower(F.col(text_col))
    words = F.size(tokens(F.col(text_col)))
    vruns = F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), F.lit(0)))
    silent_e = F.size(
        F.regexp_extract_all(t, F.lit(r"[^aeiouy\s]e\b"), F.lit(0))
    )
    syll = F.greatest(words, vruns - silent_e).cast("long")
    sents = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), F.lit(0))),
    ).cast("long")
    w = words.cast("long")

    staged = documents.select(
        "doc_id", w.alias("w"), sents.alias("s"), syll.alias("y")
    )
    # BIGINT-wrap guard (the association_rules/autocorrelation defect
    # class): every product below is coefficient * pair where each
    # factor is <= 2^31-ish, so the PAIR products (w*w, y*s, s*w)
    # themselves cannot wrap — bound them so coefficient*pair stays
    # under (2^63-1)/3 (three terms are then summed) and nothing in
    # gn/en can overflow. The limits allow ~1.7M-word documents;
    # beyond that the operator raises instead of emitting garbage.
    lim = (2**63 - 1) // 3
    staged = staged.withColumn(
        "__ok",
        (F.col("s") * F.col("w") <= F.lit(lim // 206_835_000))
        & (F.col("w") * F.col("w") <= F.lit(lim // 1_015_000))
        & (F.col("y") * F.col("s") <= F.lit(lim // 84_600_000)),
    )
    gn = "390000*w*w + 11800000*y*s - 15590000*s*w"
    en = "206835000*s*w - 1015000*w*w - 84600000*y*s"

    def fdiv(num: str) -> F.Column:
        # exact floor division: pmod aligns the numerator to the floor
        # multiple, then `div` (true integer division — NOT `/`, which
        # is IEEE double and silently truncates wrong past 2^53 on
        # long inputs, e.g. a 100k-word document) divides exactly
        return F.expr(
            f"CASE WHEN NOT __ok THEN"
            f" raise_error('readability: document too large for the"
            f" micro-scaled BIGINT form (~1.7M-word bound)')"
            f" WHEN w > 0 THEN"
            f" (({num}) - pmod(({num}), s*w)) div (s*w) END"
        )

    return staged.select(
        "doc_id",
        F.col("w").alias("n_words"),
        F.col("s").alias("n_sentences"),
        F.col("y").alias("n_syllables"),
        fdiv(gn).alias("grade_micro"),
        fdiv(en).alias("ease_micro"),
    )


# Ordered markdown-strip rules: (pattern, replacement) applied as a
# sequential global-replace chain. Patterns are the Java-regex /
# RE2 COMMON SUBSET (no lookaround, no backreferences), replacements
# use the neutral {1} group token rendered as $1 (Spark) or \1
# (DuckDB) — so the ORACLE replays the identical chain and any
# drift in one engine's rendering hash-mismatches. Dialect notes:
# fence/marker LINES are removed but fenced code CONTENT is kept
# (training-data extraction keeps code); underscore emphasis is NOT
# stripped (snake_case false positives); autolink URLs are kept,
# other inline HTML tags dropped; `1999. ` at line start reads as an
# ordered-list marker (the classic md-strip tradeoff, accepted).
MARKDOWN_STRIP_RULES = [
    (r"(?m)^ {0,3}```[^\n]*$\n?", ""),            # fence lines
    (r"(?m)^ {0,3}#{1,6} +", ""),                 # ATX header marks
    (r"!\[([^\]\n]*)\]\([^()\n]*\)", "{1}"),      # images -> alt text
    (r"\[([^\]\n]*)\]\([^()\n]*\)", "{1}"),       # inline links -> text
    (r"\[([^\]\n]*)\]\[[^\]\n]*\]", "{1}"),       # reference links
    (r"(?m)^ {0,3}\[[^\]\n]+\]: *[^\n]*$\n?", ""),  # link definitions
    (r"\*\*([^*\n]+)\*\*", "{1}"),                # bold
    (r"__([^_\n]+)__", "{1}"),                    # bold (underscore)
    (r"\*([^*\n]+)\*", "{1}"),                    # italic
    (r"`([^`\n]+)`", "{1}"),                      # inline code spans
    (r"(?m)^ {0,3}(?:[-*_] *){3,}$", ""),         # horizontal rules
    (r"(?m)^ {0,3}> ?", ""),                      # blockquote markers
    (r"(?m)^ {0,3}[-*+] +", ""),                  # unordered list marks
    (r"(?m)^ {0,3}\d{1,3}[.)] +", ""),            # ordered list marks
    (r"(?m)^ {0,3}(?:=+|-{2,}) *$", ""),          # setext underlines
    (r"<(https?://[^<>\s]+)>", "{1}"),            # autolinks keep URL
    (r"</?[A-Za-z][^<>\n]*>", ""),                # inline HTML tags
    (r"\n{3,}", "\n\n"),                          # blank-line collapse
]


def markdown_plain_col(c: "F.Column") -> "F.Column":
    """The markdown-strip chain as one reusable column expression —
    pure JVM regexp_replace chain, whole-stage codegen, no Python."""
    for pat, rep in MARKDOWN_STRIP_RULES:
        c = F.regexp_replace(c, pat, rep.replace("{1}", "$1"))
    return F.trim(c)


def markdown_strip(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Markdown -> plain text for README/docs/forum-dump corpora:
    strips headers, emphasis, links (keeping anchor/alt text), code
    fences (keeping code content), list/blockquote markers,
    horizontal rules and inline HTML via the MARKDOWN_STRIP_RULES
    chain, plus structure counts from the SAME scan (n_links incl.
    images, n_headers ATX, n_code_spans inline) — one map-only
    codegen stage, no shuffle, no Python; scan-rider cheap at 100 TB.
    """
    orig = F.col(text_col)
    return documents.select(
        "doc_id",
        markdown_plain_col(orig).alias("plain"),
        F.regexp_count(orig, F.lit(r"\]\(")).alias("n_links"),
        F.regexp_count(
            orig, F.lit(r"(?m)^ {0,3}#{1,6} ")
        ).alias("n_headers"),
        F.regexp_count(orig, F.lit(r"`[^`\n]+`")).alias("n_code_spans"),
    )


def chunk_text(
    documents: DataFrame,
    chunk_chars: int = 1000,
    overlap: int = 200,
    text_col: str = "text",
) -> DataFrame:
    """RAG-style document chunking: fixed character windows with
    overlap. Chunk i covers [i*stride, i*stride + chunk_chars) where
    stride = chunk_chars - overlap; a document of length n yields
    ceil((n - overlap) / stride) chunks (min 1, so empty docs keep a
    row), each tagged with a stable (doc_id, chunk_idx) key and
    chunk_id = doc_id * 100000 + chunk_idx for downstream embedding
    tables.

    Pure JVM — sequence + posexplode + substring, whole-stage
    codegen, no Python; the explode is map-side (no shuffle), so at
    100 TB chunking rides the scan exactly like the markdown strip.
    Every non-final chunk is exactly chunk_chars long and consecutive
    chunks share `overlap` characters — the invariants embedding
    pipelines assume."""
    if overlap < 0 or chunk_chars <= overlap:
        raise ValueError("need 0 <= overlap < chunk_chars")
    stride = chunk_chars - overlap
    n = F.length(F.col(text_col))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride))
    ).cast("int")
    e = documents.select(
        "doc_id",
        F.col(text_col).alias("__t"),
        F.posexplode(
            F.sequence(F.lit(0), n_chunks - 1)
        ).alias("chunk_idx", "__i"),
    )
    chunk = F.substring(
        F.col("__t"), F.col("chunk_idx") * stride + 1, chunk_chars
    )
    return e.select(
        "doc_id",
        "chunk_idx",
        (F.col("doc_id") * 100000 + F.col("chunk_idx")).alias("chunk_id"),
        chunk.alias("chunk_text"),
        F.length(chunk).alias("n_chars"),
    )
