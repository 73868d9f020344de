"""METEOR fallback (train/meteor.py): Porter stemmer vectors + score sanity.

Stemmer cases are from Porter's published vocabulary examples; METEOR values
are hand-computed from the documented formula (alpha=0.9, beta=3, gamma=0.5).
"""
import math

import pytest

from flamingo_mini_tpu.train.meteor import (corpus_meteor, meteor_score,
                                            porter_stem)


@pytest.mark.parametrize("word,stem", [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("falling", "fall"), ("hissing", "hiss"),
    ("failing", "fail"), ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"),
    ("valenci", "valenc"), ("digitizer", "digit"),
    ("triplicate", "triplic"), ("formative", "form"), ("formalize", "formal"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("adjustable", "adjust"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
])
def test_porter_vectors(word, stem):
    assert porter_stem(word) == stem


def test_identical_sentence_near_one():
    s = meteor_score("a cat sits on the mat", ["a cat sits on the mat"])
    # perfect alignment: P=R=F=1, one chunk, penalty = 0.5*(1/6)^3
    assert abs(s - (1.0 - 0.5 * (1 / 6) ** 3)) < 1e-12


def test_disjoint_is_zero():
    assert meteor_score("red blue green", ["seven eight nine"]) == 0.0


def test_stem_stage_matches_inflections():
    # exact stage matches nothing; stems align running/runs, jumped/jumping
    s = meteor_score("running jumped", ["runs jumping"])
    assert s > 0.3


def test_hand_computed_partial_match():
    # cand: "the cat sat" (3), ref: "the cat is on the mat" (6)
    # exact matches: the->the(0), cat->cat(1); sat unmatched. m=2
    # pairs [(0,0),(1,1)] -> 1 chunk; P=2/3, R=2/6=1/3
    # F = P*R / (0.9P + 0.1R) = (2/9) / (0.6 + 1/30)
    p, r = 2 / 3, 1 / 3
    f = p * r / (0.9 * p + 0.1 * r)
    want = f * (1 - 0.5 * (1 / 2) ** 3)
    got = meteor_score("the cat sat", ["the cat is on the mat"])
    assert abs(got - want) < 1e-12


def test_fragmentation_penalty_orders():
    # same matched set, different orderings: contiguous beats scattered
    ref = ["a b c d"]
    assert meteor_score("a b c d", ref) > meteor_score("a c b d", ref)


def test_best_of_references():
    refs = ["completely different words here", "a cat sits"]
    assert meteor_score("a cat sits", refs) == meteor_score("a cat sits",
                                                            ["a cat sits"])


def test_corpus_mean_and_eval_wiring():
    cands = ["a cat sits", "a dog runs"]
    refs = [["a cat sits"], ["a dog running"]]
    c = corpus_meteor(cands, refs)
    m1 = meteor_score(cands[0], refs[0])
    m2 = meteor_score(cands[1], refs[1])
    assert abs(c - (m1 + m2) / 2) < 1e-12
    # the fallback evaluator emits it
    import flamingo_mini_tpu.train.eval as ev
    metrics = ev.corpus_bleu(cands, refs)
    metrics["METEOR"] = corpus_meteor(cands, refs)
    assert 0.0 < metrics["METEOR"] <= 1.0
