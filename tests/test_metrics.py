"""Standard metric library (eval/metrics.py) vs reference semantics.

Oracles: levenshtein/anls follow lmms_eval/api/metrics.py:278-321 exactly
(hand-computed cases); f1/mcc are checked against their closed forms;
corpus_bleu against hand-derivable cases (perfect match, brevity penalty,
zero n-gram overlap).
"""

import math

import pytest

from videoitg_tpu.eval.metrics import (
    anls,
    bits_per_byte,
    bootstrap_stderr,
    corpus_bleu,
    exact_match,
    f1_binary,
    levenshtein_distance,
    matthews_corrcoef,
    mean,
    median,
    perplexity,
    weighted_perplexity,
)


def test_levenshtein():
    assert levenshtein_distance("", "") == 0
    assert levenshtein_distance("abc", "abc") == 0
    assert levenshtein_distance("kitten", "sitting") == 3
    assert levenshtein_distance("abc", "") == 3
    assert levenshtein_distance("flaw", "lawn") == 2


def test_anls_reference_semantics():
    # identical -> 1.0
    assert anls(["Hello World"], "hello  world") == 1.0
    # one edit over length 11 -> 1 - 1/11
    assert abs(anls(["hello world"], "helo world") - (1 - 1 / 11)) < 1e-9
    # below the 0.5 threshold floors to 0 (reference metrics.py:318-320)
    assert anls(["abcdefgh"], "zzzzzzzz") == 0.0
    # best-matching reference wins
    assert anls(["wrong", "right answer"], "right answer") == 1.0
    assert anls([], "x") == 0.0


def test_exact_match():
    assert exact_match("Yes", ["yes"]) == 1.0
    assert exact_match("Yes", ["yes"], ignore_case=False) == 0.0
    assert exact_match("yes!", ["yes"], ignore_punctuation=True) == 1.0
    assert exact_match("no", ["yes", "no"]) == 1.0


def test_f1_and_mcc():
    golds = [1, 1, 0, 0, 1]
    preds = [1, 0, 0, 1, 1]
    # tp=2, fp=1, fn=1 -> f1 = 4/6
    assert abs(f1_binary(golds, preds) - 2 / 3) < 1e-9
    # perfect prediction
    assert f1_binary([1, 0], [1, 0]) == 1.0
    assert abs(matthews_corrcoef([1, 0, 1, 0], [1, 0, 1, 0]) - 1.0) < 1e-9
    assert abs(matthews_corrcoef([1, 0, 1, 0], [0, 1, 0, 1]) + 1.0) < 1e-9
    # degenerate: all one class -> 0 denominator -> 0
    assert matthews_corrcoef([1, 1], [1, 1]) == 0.0


def test_corpus_bleu():
    # perfect match -> 100
    assert abs(corpus_bleu(["the cat sat on the mat"],
                           [["the cat sat on the mat"]]) - 100.0) < 1e-9
    # brevity penalty: short exact prefix scores below 100
    score = corpus_bleu(["the cat sat on"], [["the cat sat on the mat"]])
    assert 0 < score < 100
    assert abs(score - 100 * math.exp(1 - 6 / 4)) < 1e-6


def test_corpus_bleu_matches_sacrebleu():
    """Exact parity with sacrebleu defaults (13a + exp smoothing) — the
    reference's BLEU path IS sacrebleu (lmms_eval/api/metrics.py:74-88)."""
    import random

    sacrebleu = pytest.importorskip("sacrebleu")

    rng = random.Random(0)
    vocab = ("the cat dog sat ran on mat rug fast 3.5 100,000 & x-ray "
             "hello, world! why? (brackets) \"quoted\"").split()

    def sentence(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    cases = [
        (["the cat sat on the mat"], [["the cat sat on the mat"]]),
        (["a b c"], [["x y z"]]),                      # smoothed zero-match
        (["the cat"], [["the cat sat on the mat"]]),   # short hyp (total[3]=0)
        (["Punct, heavy! (case)? 3.5 vs 100,000 x-ray"],
         [["punct, heavy! (case) 3.5 vs 100,000 ray"]]),
    ]
    for _ in range(12):  # random corpora, 1-2 refs per segment
        n_seg = rng.randint(1, 4)
        preds = [sentence(rng.randint(1, 12)) for _ in range(n_seg)]
        refs = [[sentence(rng.randint(1, 12)) for _ in range(rng.randint(1, 2))]
                for _ in range(n_seg)]
        cases.append((preds, refs))

    for preds, refs in cases:
        # sacrebleu wants reference STREAMS: stream i holds each segment's
        # i-th reference (None when a segment has fewer).
        streams = [[r[i] if i < len(r) else None for r in refs]
                   for i in range(max(len(r) for r in refs))]
        want = sacrebleu.corpus_bleu(preds, streams).score
        got = corpus_bleu(preds, refs)
        assert abs(got - want) < 1e-6, (preds, refs, got, want)


def test_aggregations():
    assert mean([1.0, 2.0, 3.0]) == 2.0
    assert median([3.0, 1.0, 2.0]) == 2.0
    assert median([4.0, 1.0, 2.0, 3.0]) == 2.5
    assert abs(perplexity([math.log(0.5)] * 4) - 2.0) < 1e-9
    assert abs(weighted_perplexity([(-math.log(2.0) * 3, 3)]) - 2.0) < 1e-9
    assert abs(bits_per_byte([(-math.log(2.0) * 3, 3)]) - 1.0) < 1e-9
    # deterministic bootstrap
    r = list(range(32))
    a = bootstrap_stderr(r, lambda xs: sum(xs) / len(xs), iters=100)
    b = bootstrap_stderr(r, lambda xs: sum(xs) / len(xs), iters=100)
    assert a == b > 0
