"""Distributed BPE tokenizer training (Sennrich et al. 2016).

Byte-pair encoding trains on a WORD-FREQUENCY table, not the corpus:
the corpus is scanned ONCE to count words (vocabulary-grain shuffle of
(word, partial-count) pairs), and every merge round thereafter runs on
the vocab table — pair counting is a groupBy over symbol bigrams
weighted by word frequency, the argmax is a 1-row collect, and the
merge itself is a vocab-grain projection. At 100 TB the corpus pass is
the only corpus-sized cost; M merge rounds cost M tiny vocab-table
jobs (each localCheckpoint'ed so round N never replays rounds 1..N-1).

The merge step is GREEDY LEFT-TO-RIGHT (the BPE contract: in
`a a a a a`, merging (a,a) yields `aa aa a`, never `aa a aa`). A
plain string replace() gets this wrong on overlapping runs, so the
merge is an explicit fold over the symbol array (F.aggregate — same
higher-order fold the DuckDB oracle replays with list_reduce): state
is (emitted-output, pending-symbol) packed into one string with a
\\x01 separator; a (pending==left AND next==right) step emits the
merged symbol and clears pending.

Ties in pair counts break deterministically (freq DESC, left ASC,
right ASC) so the learned merge table is a pure function of the data.

`bpe_apply` replays a learned merge list over any word table as ONE
chained projection (merge k folds the output of merge k-1) — encoding
a 100 TB corpus is a distinct-word join, not a per-token scan: encode
the vocabulary once, broadcast it, join tokens against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from geist_spark.operators.dedup import tokens

_E = "\x01"  # state separator: acc = emitted-output || _E || pending
END_TOKEN = "</w>"


def word_freqs(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the single corpus-sized pass of
    BPE training; everything after runs at vocabulary grain.

    Words containing the fold-state separator \\x01 are excluded (a
    dirty corpus can carry control bytes through whitespace
    tokenization; such a word would corrupt the packed fold state).
    """
    return (
        documents.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter((F.col("word") != "") & ~F.col("word").contains(_E))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def char_symbols(word: F.Column, end_token: str = END_TOKEN) -> F.Column:
    """Initial symbol string: space-joined characters + end marker
    ('low' -> 'l o w </w>')."""
    return F.concat(F.regexp_replace(word, "(.)", "$1 "), F.lit(end_token))


def merge_fold(sym: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right merge of the (left, right) symbol pair in a
    space-joined symbol string — the exact BPE merge semantics (see
    module docstring for why replace() is wrong on overlapping runs).
    """
    arr = F.split(sym, " ")
    n = F.size(arr)
    init = F.concat(F.lit(_E), F.element_at(arr, 1))
    merged = F.lit(left + right)

    def step(acc: F.Column, x: F.Column) -> F.Column:
        out = F.substring_index(acc, _E, 1)
        prev = F.substring_index(acc, _E, -1)
        out_sp = F.when(out == "", F.lit("")).otherwise(
            F.concat(out, F.lit(" "))
        )
        joined = (
            F.when(prev == "", out)
            .when(out == "", prev)
            .otherwise(F.concat(out, F.lit(" "), prev))
        )
        return F.when(
            (prev == left) & (x == right),
            F.concat(out_sp, merged, F.lit(_E)),
        ).otherwise(F.concat(joined, F.lit(_E), x))

    def fin(acc: F.Column) -> F.Column:
        out = F.substring_index(acc, _E, 1)
        prev = F.substring_index(acc, _E, -1)
        return (
            F.when(prev == "", out)
            .when(out == "", prev)
            .otherwise(F.concat(out, F.lit(" "), prev))
        )

    return F.aggregate(
        F.slice(arr, 2, F.greatest(n - 1, F.lit(0))), init, step, fin
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    arr = F.split(F.col("sym"), " ")
    n = F.size(arr)
    pairs = F.arrays_zip(
        F.slice(arr, 1, F.greatest(n - 1, F.lit(0))).alias("a"),
        F.slice(arr, 2, F.greatest(n - 1, F.lit(0))).alias("b"),
    )
    return (
        syms.select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def train_bpe(
    documents: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
    end_token: str = END_TOKEN,
) -> list[tuple[int, str, str, str, int]]:
    """Learn `num_merges` BPE merges from the corpus. Returns
    [(merge_rank, left, right, merged, pair_freq)], rank 0 first.

    One corpus pass (word_freqs); each round is a vocab-grain pair
    count + 1-row argmax collect + vocab-grain merge projection,
    localCheckpoint'ed so round N's plan doesn't replay rounds 1..N-1.
    """
    syms = word_freqs(documents, text_col).select(
        "word", "freq", char_symbols(F.col("word"), end_token).alias("sym")
    )
    syms = syms.localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        best = (
            _pair_counts(syms)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0].a, best[0].b, best[0].cnt
        merges.append((rank, a, b, a + b, int(cnt)))
        # LAZY checkpoint: the next round's argmax is a
        # TakeOrderedAndProject (orderBy+limit), which evaluates EVERY
        # partition — so the merged table materializes fully inside
        # that action instead of costing its own eager job (and the
        # final round's merge, which nothing consumes, never
        # materializes at all). Safe from the partial-materialization
        # miscompile because no short-circuit CollectLimit ever runs
        # over this frame.
        syms = syms.select(
            "word", "freq", merge_fold(F.col("sym"), a, b).alias("sym")
        ).localCheckpoint(eager=False)
    return merges


def bpe_apply(
    words: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    word_col: str = "word",
    end_token: str = END_TOKEN,
) -> DataFrame:
    """Encode a word table with a learned merge list: ONE chained
    projection (fold k over the output of fold k-1) adding `sym`
    (space-joined subwords) and `n_subwords`.

    Encode the distinct vocabulary, broadcast it, join tokens against
    it — never re-encode per token occurrence.

    Each fold is its own projection over the previous one, with a
    localCheckpoint barrier per merge: merge_fold references its input
    several times, so letting CollapseProject inline M nested folds
    into one expression would re-evaluate lower folds exponentially
    (same hazard semantic_dedup documents). The barriers cost M tiny
    vocabulary-grain jobs.

    Words containing the fold-state separator \\x01 cannot run through
    merge_fold (the packed accumulator would split at the embedded
    byte); they keep their plain character segmentation — lossless,
    just unmerged — instead of silently corrupting.
    """
    dirty = words.filter(F.col(word_col).contains(_E)).withColumn(
        "sym", char_symbols(F.col(word_col), end_token)
    )
    df = words.filter(~F.col(word_col).contains(_E)).withColumn(
        "sym", char_symbols(F.col(word_col), end_token)
    )
    for _, a, b, _, _ in merges:
        # lazy: each barrier still blocks CollapseProject (it is an RDD
        # boundary either way), but all M levels materialize inside ONE
        # action instead of M eager jobs here
        df = df.withColumn(
            "sym", merge_fold(F.col("sym"), a, b)
        ).localCheckpoint(eager=False)
    if merges:
        # ...and that one action is THIS eager checkpoint, not the
        # consumer's: a public operator cannot control the consumer's
        # first action, and a CollectLimit (.show(), .limit()) would
        # partially materialize the lazy chain — the documented
        # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND precondition
        # (similarity.semantic_dedup). Materializing level M computes
        # every partition of every lazy level below it, so the whole
        # chain lands in stored blocks in one job.
        df = df.localCheckpoint(eager=True)
    return df.unionByName(dirty).withColumn(
        "n_subwords", F.size(F.split(F.col("sym"), " "))
    )


# ---------------------------------------------------------------------------
# Unigram LM tokenizer training (Kudo 2018 / SentencePiece's other half)
# ---------------------------------------------------------------------------

def _bl(x: int) -> int:
    """Binary digit count (floor(log2(x))+1 for x>=1) — the exact
    integer log the unigram dialect scores with. DuckDB replays it as
    length(printf('%b', x))."""
    return max(x, 1).bit_length()


def substring_counts(
    words: DataFrame, max_piece_len: int = 4
) -> DataFrame:
    """(piece, cnt) for every substring of every word up to
    max_piece_len, weighted by word frequency and occurrence
    multiplicity — the unigram seed-vocabulary pass. Pure JVM
    (sequence + transform + flatten + explode) at VOCABULARY grain:
    O(vocab * len * max_piece_len) rows, one partial-agg shuffle at
    piece grain; the corpus itself is never rescanned."""
    w = F.col("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length(w) - i + 1),
                ),
                lambda ln: F.substring(w, i, ln),
            ),
        )
    )
    return (
        words.select(F.col("freq"), F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )


def _viterbi_segment(word: str, costs: dict, max_piece_len: int,
                     unk_cost: int) -> list[str]:
    """Exact integer Viterbi: minimize (total cost, piece count,
    space-joined piece string) lexicographically over all
    segmentations whose pieces are in `costs` (single characters not
    in the vocabulary fall back to unk_cost, so every word segments).
    Deterministic and replayed verbatim by the DuckDB oracle's
    exhaustive recursive-CTE argmin."""
    n = len(word)
    INF = (1 << 62, 1 << 62, "")
    best: list[tuple] = [INF] * (n + 1)
    best[0] = (0, 0, "")
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            if best[i][0] >= (1 << 62):
                continue
            piece = word[i:j]
            c = costs.get(piece)
            if c is None:
                if j - i > 1:
                    continue
                c = unk_cost
            seq = best[i][2] + (" " if best[i][2] else "") + piece
            cand = (best[i][0] + c, best[i][1] + 1, seq)
            if cand < best[j]:
                best[j] = cand
    return best[n][2].split(" ")


def train_unigram(
    documents: DataFrame,
    vocab_size: int = 60,
    rounds: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 200,
    text_col: str = "text",
    max_word_len: int = 64,
) -> list[tuple[str, int, int]]:
    """Unigram-LM tokenizer training (the SentencePiece algorithm's
    shape, Kudo 2018) with HARD EM in exact integer log space so the
    whole run is engine-exact and DuckDB-replayable:

      * piece cost = BL(total) - BL(max(cnt,1)) where BL is the
        binary digit count — an integer -log2 surrogate; lower cost
        = more probable piece (the fixed-point discipline of
        train_ivf_centroids applied to the tokenizer),
      * E-step = Viterbi segmentation minimizing (cost, piece count,
        lexicographic piece string) — deterministic argmin, no float
        anywhere,
      * M-step = piece counts from the Viterbi segmentations,
        weighted by word frequency; new costs from new counts,
      * final prune keeps every single character plus the top
        (vocab_size - n_chars) multi-character pieces by
        (count DESC, piece ASC).

    Scale shape = train_bpe's: ONE corpus pass (word_freqs), then
    every round runs at VOCABULARY grain — seed substring explode is
    pure JVM, the Viterbi E-step is one Arrow mapInPandas stage over
    the word table with the (<= seed_size)-entry cost dict broadcast
    in the closure, the M-step a piece-grain partial agg whose
    result (<= seed_size rows, control-plane bounded like the IVF
    centroid fetch) is collected to re-derive costs.
    localCheckpoint pins the word table once. Words longer than
    max_word_len are excluded from training (the DP is O(len *
    max_piece_len); URL-shaped 'words' would dominate it).

    Returns [(piece, cnt, cost)] for the final vocabulary, sorted by
    (cost ASC, piece ASC).
    """
    import pandas as pd

    if vocab_size < 1 or rounds < 0 or max_piece_len < 1:
        raise ValueError("vocab_size/rounds/max_piece_len must be positive")
    wf = (
        word_freqs(documents, text_col)
        .filter(F.length("word") <= max_word_len)
        .localCheckpoint()
    )

    # seed: top multi-char substrings by count + ALL single chars
    seed = substring_counts(wf, max_piece_len)
    chars = {
        (r["piece"], int(r["cnt"]))
        for r in seed.filter(F.length("piece") == 1).collect()
    }
    multi = (
        seed.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(seed_size)
        .collect()
    )
    counts = {p: c for p, c in chars}
    counts.update({r["piece"]: int(r["cnt"]) for r in multi})

    def costs_from(cnts: dict) -> tuple[dict, int]:
        total = sum(cnts.values())
        tb = _bl(total)
        return {p: tb - _bl(c) for p, c in cnts.items()}, tb

    costs, tbl = costs_from(counts)

    for _ in range(rounds):
        cost_map, unk = dict(costs), tbl  # captured by the closure

        def segment(batches):
            for pdf in batches:
                out_w, out_p, out_f = [], [], []
                for w, fq in zip(pdf["word"], pdf["freq"]):
                    for piece in _viterbi_segment(
                        w, cost_map, max_piece_len, unk
                    ):
                        out_w.append(w)
                        out_p.append(piece)
                        out_f.append(fq)
                yield pd.DataFrame(
                    {"word": out_w, "piece": out_p, "freq": out_f}
                )

        new = (
            wf.mapInPandas(
                segment, "word string, piece string, freq long"
            )
            .groupBy("piece")
            .agg(F.sum("freq").alias("cnt"))
            .collect()  # <= seed_size + n_chars rows: control-plane
        )
        got = {r["piece"]: int(r["cnt"]) for r in new}
        # vocabulary is CLOSED during EM: unused pieces drop to 0
        # count (cost from max(cnt,1)), chars always survive
        counts = {p: got.get(p, 0) for p in counts}
        costs, tbl = costs_from(counts)

    n_chars = sum(1 for p in counts if len(p) == 1)
    keep_multi = max(vocab_size - n_chars, 0)
    kept = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:keep_multi]
    final = {p: c for p, c in counts.items() if len(p) == 1}
    final.update(dict(kept))
    costs, _ = costs_from(final)
    return sorted(
        ((p, final[p], costs[p]) for p in final),
        key=lambda t: (t[2], t[0]),
    )


def unigram_apply(
    words: DataFrame,
    vocab: list[tuple[str, int, int]],
    word_col: str = "word",
    max_piece_len: int = 4,
) -> DataFrame:
    """Segment a word table with a trained unigram vocabulary: adds
    `sym` (space-joined pieces, the bpe_apply convention) and
    `n_pieces`. Same Viterbi argmin as training (single characters
    outside the vocabulary fall back to the max cost + 1 so any word
    segments). One Arrow stage at vocabulary grain — encode the
    distinct vocabulary once and broadcast-join it onto the token
    stream, never re-segment per occurrence."""
    import pandas as pd

    cost_map = {p: cost for p, _c, cost in vocab}
    unk = max(cost_map.values(), default=1) + 1

    def run(batches):
        for pdf in batches:
            syms, nps = [], []
            for w in pdf[word_col]:
                pieces = _viterbi_segment(w, cost_map, max_piece_len, unk)
                syms.append(" ".join(pieces))
                nps.append(len(pieces))
            out = pdf.copy()
            out["sym"] = syms
            out["n_pieces"] = nps
            yield out

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in words.schema.fields
    )
    return words.mapInPandas(run, f"{fields}, sym string, n_pieces int")
