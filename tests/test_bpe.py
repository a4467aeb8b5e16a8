"""Contracts for the BPE tokenizer: the distributed trainer and the
Arrow-batched encoder are pinned against hand-worked merges, a
from-scratch reference recount, and round-trip properties."""

from __future__ import annotations

import random

from skrub_spark.operators.bpe import (
    EOW,
    BPEModel,
    _encode_word,
    _train_merges,
    bpe_encode,
    bpe_token_stats,
    train_bpe,
)


def _reference_merges(word_freq, n_merges):
    """Naive recount-from-scratch BPE trainer (the textbook loop):
    the incremental implementation must match this exactly."""
    words = {w: [*w, EOW] for w in word_freq}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + word_freq[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] <= 0:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for w, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(joined)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[w] = out
    return merges


def test_hand_worked_merges():
    # "aaab" x10: pairs (a,a)=20, (a,b)=10, (b,</w>)=10 -> merge (a,a)
    # then (aa,a)=10 ties (a,b)=10, (b,</w>)=10 -> lexicographic: (a,b)
    merges = _train_merges({"aaab": 10}, 2)
    assert merges[0] == ("a", "a")
    assert merges[1] == ("a", "b")


def test_incremental_matches_reference_recount():
    rng = random.Random(7)
    alphabet = "abcde"
    words = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))): rng.randint(1, 50)
        for _ in range(120)
    }
    assert _train_merges(dict(words), 60) == _reference_merges(dict(words), 60)


def test_encode_word_roundtrip_and_zero_merges():
    assert _encode_word("abc", {}) == ["a", "b", "c", EOW]
    ranks = BPEModel(merges=[("a", "b"), ("ab", "c")]).ranks
    assert _encode_word("abc", ranks) == ["abc", EOW]
    # every encoding concatenates back to word + EOW
    for w in ["hello", "aaab", "x"]:
        toks = _encode_word(w, ranks)
        assert "".join(toks) == w + EOW


def test_train_and_encode_on_spark(spark):
    df = spark.createDataFrame(
        [(i, "low lower lowest newer newest") for i in range(4)],
        "doc_id long, text string",
    )
    model = train_bpe(df, n_merges=30)
    # trained on 4 identical docs == trained on the word dict directly
    ref = _reference_merges(
        {"low": 4, "lower": 4, "lowest": 4, "newer": 4, "newest": 4}, 30
    )
    assert model.merges == ref

    out = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, model).collect()}
    toks = out[0]
    assert "".join(toks) == "low" + EOW + "lower" + EOW + "lowest" + EOW + \
        "newer" + EOW + "newest" + EOW
    # all four docs identical -> identical encodings (determinism)
    assert all(out[i] == toks for i in range(4))
    # with 30 merges on 5 distinct short words everything fuses whole
    assert "low" + EOW in toks

    stats = {r["doc_id"]: r for r in bpe_token_stats(df, model).collect()}
    s = stats[0]
    assert s["n_words"] == 5
    assert s["n_bpe_tokens"] == len(toks)
    total_chars = len("lowlowerlowestnewernewest")
    assert abs(s["chars_per_token"] - round(total_chars / len(toks), 6)) < 1e-12


def test_encode_handles_null_and_unknown_chars(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "ZZ-42!")], "doc_id long, text string"
    )
    model = BPEModel(merges=[("4", "2")])
    out = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, model).collect()}
    assert out[1] == []
    # lowercased, split on non-[a-z0-9]: words 'zz' and '42'
    assert out[2] == ["z", "z", EOW, "42", EOW]
