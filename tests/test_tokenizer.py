"""Distributed BPE training (operators/tokenizer.py)."""

from pyspark.sql import functions as F

from geist_spark.operators.tokenizer import (
    bpe_apply,
    merge_fold,
    train_bpe,
    word_freqs,
)


def _docs(spark, *texts: str):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_merge_fold_greedy_left_to_right(spark):
    df = spark.createDataFrame(
        [("a a a a a </w>",), ("l o w </w>",), ("a </w>",)], "sym string"
    )
    got = [
        r.m
        for r in df.select(merge_fold(F.col("sym"), "a", "a").alias("m")).collect()
    ]
    # greedy merges (1,2) then (3,4), never the overlapping (2,3)
    assert got == ["aa aa a </w>", "l o w </w>", "a </w>"]


def test_train_bpe_golden(spark):
    # classic Sennrich corpus shape: 'er' dominates
    docs = _docs(spark, "lower newer fewer", "new few lower", "er er")
    merges = train_bpe(docs, num_merges=2)
    rank0 = merges[0]
    assert (rank0[1], rank0[2], rank0[3]) == ("e", "r", "er")
    assert rank0[4] == 6  # lower newer fewer lower + er er
    # rank 1 must be counted AFTER the first merge applied
    assert merges[1][0] == 1


def test_train_bpe_deterministic_tiebreak(spark):
    # (a,b), (b,a), (a,</w>) all tie at freq 2 -> lexicographically
    # smallest pair wins and '<' sorts before 'b'
    docs = _docs(spark, "aba aba")
    merges = train_bpe(docs, num_merges=1)
    assert (merges[0][1], merges[0][2]) == ("a", "</w>")


def test_bpe_apply_roundtrip(spark):
    train = _docs(spark, "lower lower newer fewer new")
    merges = train_bpe(train, num_merges=4)
    vocab = word_freqs(_docs(spark, "lowest newest tower")).select("word")
    enc = bpe_apply(vocab, merges)
    for r in enc.collect():
        # subwords reassemble exactly to word + end marker
        assert "".join(r.sym.split(" ")) == r.word + "</w>"
        assert r.n_subwords == len(r.sym.split(" "))
        assert r.n_subwords <= len(r.word) + 1


def _greedy_merge_py(symbols: list[str], a: str, b: str) -> list[str]:
    """Reference greedy left-to-right BPE merge (the textbook scan)."""
    out, i = [], 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def test_merge_fold_randomized_parity(spark):
    # seeded random symbol runs (heavy on repeats to stress overlap
    # handling), checked in ONE batch against the textbook scan
    import random

    rng = random.Random(42)
    alphabet = ["a", "b", "ab", "c"]
    cases = []
    for _ in range(300):
        syms = [rng.choice(alphabet) for _ in range(rng.randint(1, 12))]
        pair = (rng.choice(alphabet), rng.choice(alphabet))
        cases.append((" ".join(syms), pair[0], pair[1]))
    # group by pair so each distinct pair is one column expression
    by_pair: dict[tuple, list[str]] = {}
    for sym, a, b in cases:
        by_pair.setdefault((a, b), []).append(sym)
    for (a, b), syms_list in by_pair.items():
        df = spark.createDataFrame([(s,) for s in syms_list], "sym string")
        got = [
            r.m
            for r in df.select(
                "sym", merge_fold(F.col("sym"), a, b).alias("m")
            ).collect()
        ]
        want = [
            " ".join(_greedy_merge_py(s.split(" "), a, b)) for s in syms_list
        ]
        assert got == want, (a, b)


def test_bpe_apply_separator_word_survives_unmerged(spark):
    train = _docs(spark, "lower lower newer")
    merges = train_bpe(train, num_merges=2)
    vocab = spark.createDataFrame(
        [("lower",), ("a\x01b",)], "word string"
    )
    enc = {r.word: r for r in bpe_apply(vocab, merges).collect()}
    # dirty word keeps plain char segmentation, no corruption
    assert "".join(enc["a\x01b"].sym.split(" ")) == "a\x01b</w>"
    assert enc["a\x01b"].n_subwords == 4
    # clean word still merges
    assert enc["lower"].n_subwords < 6


def test_train_bpe_exhausted_pairs_stops(spark):
    docs = _docs(spark, "ab")  # one word, one pair ('a','b') then ('ab','</w>')
    merges = train_bpe(docs, num_merges=10)
    assert len(merges) < 10  # breaks when no pairs remain
    final = merges[-1]
    assert final[3] == "ab</w>"


def test_train_unigram_golden(spark):
    """Unigram hard-EM golden on a corpus built to have obvious
    pieces: 'low'/'new'/'er'/'est' must land in the learned
    vocabulary; costs are exact integer BLs; the vocabulary always
    keeps every single character; output sorted (cost, piece)."""
    from geist_spark.operators.tokenizer import train_unigram

    docs = _docs(
        spark,
        "low lower lowest new newer newest",
        "low low newer newest wide wider",
        "the new low the new wide",
    )
    vocab = train_unigram(docs, vocab_size=25, rounds=2,
                          max_piece_len=4, seed_size=40)
    pieces = {p for p, _, _ in vocab}
    assert {"low", "new", "er"} <= pieces
    chars = {c for p, _, _ in vocab for c in p}
    assert chars <= pieces  # every char of every piece is a piece
    # exact integer cost law: cost = BL(total) - BL(max(cnt,1))
    total = sum(c for _, c, _ in vocab)
    for p, c, cost in vocab:
        assert cost == max(total, 1).bit_length() - max(c, 1).bit_length()
    assert vocab == sorted(vocab, key=lambda t: (t[2], t[0]))
    # determinism: second run is identical
    assert vocab == train_unigram(docs, vocab_size=25, rounds=2,
                                  max_piece_len=4, seed_size=40)


def test_unigram_apply_viterbi(spark):
    """unigram_apply segments with the exact Viterbi argmin: known
    words split into their learned pieces; characters outside the
    vocabulary fall back to single-char pieces (never an error);
    n_pieces matches the segmentation."""
    from geist_spark.operators.tokenizer import train_unigram, unigram_apply

    docs = _docs(
        spark,
        "low lower lowest new newer newest",
        "low low newer newest wide wider",
    )
    vocab = train_unigram(docs, vocab_size=25, rounds=2,
                          max_piece_len=4, seed_size=40)
    wdf = spark.createDataFrame(
        [("lowest",), ("newer",), ("zzz",), ("lownew",)], "word string"
    )
    out = {r["word"]: r for r in unigram_apply(wdf, vocab).collect()}
    assert out["lowest"]["sym"] == "low est"
    assert out["newer"]["sym"] == "new er"
    assert out["zzz"]["sym"] == "z z z"  # unknown chars fall back
    assert out["lownew"]["sym"] == "low new"
    assert out["lownew"]["n_pieces"] == 2


def test_viterbi_segment_exact_ordering():
    """The DP tie-break is (cost, n_pieces, lexicographic seq) — the
    exact ordering the DuckDB oracle's exhaustive argmin replays."""
    from geist_spark.operators.tokenizer import _viterbi_segment

    # 'abab': pieces ab(1) a(2) b(2) -> 'ab ab' cost 2 beats chars
    costs = {"ab": 1, "a": 2, "b": 2}
    assert _viterbi_segment("abab", costs, 4, 9) == ["ab", "ab"]
    # equal cost, fewer pieces wins: 'abc' as abc(4) vs a+bc(2+2)
    costs = {"abc": 4, "a": 2, "bc": 2, "b": 3, "c": 3}
    assert _viterbi_segment("abc", costs, 4, 9) == ["abc"]
    # equal cost AND count: lexicographically smaller seq wins
    # 'ab': 'a b' vs 'ab'? different counts. use 'aa' with x/y pieces
    costs = {"aa": 2, "a": 1}
    # 'aaaa': aa+aa (4) vs a*4 (4) vs aa+a+a (4): counts 2 < 3 < 4
    assert _viterbi_segment("aaaa", costs, 4, 9) == ["aa", "aa"]


def test_train_unigram_validation(spark):
    import pytest

    from geist_spark.operators.tokenizer import train_unigram

    docs = _docs(spark, "a b")
    with pytest.raises(ValueError, match="positive"):
        train_unigram(docs, vocab_size=0)
