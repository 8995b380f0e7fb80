"""Interleave metrics tests."""

from memory_augmented_vlm_tpu.eval.evaluate_interleave import (
    evaluate,
    judge_multi_choice,
    normalize_answer,
    rouge_l_f,
)


def test_normalize():
    assert normalize_answer("The Cat, sat!") == "cat sat"


def test_rouge_l():
    assert rouge_l_f("a cat sat", "a cat sat") == 1.0
    assert rouge_l_f("dog", "cat") == 0.0
    assert 0 < rouge_l_f("the cat sat down", "a cat sat") < 1.0


def test_multi_choice_judging():
    choices = ["red apple", "green pear", "blue car"]
    assert judge_multi_choice("green pear", "green pear", choices)
    assert judge_multi_choice("b", "green pear", choices)
    assert judge_multi_choice("I think it is the green pear.", "green pear", choices)
    assert not judge_multi_choice("red apple", "green pear", choices)


def test_evaluate_grouping():
    preds = [
        {"dataset": "RAVEN", "question_type": "multi-choice",
         "prediction": "A", "answer": "x", "choices": ["x", "y"]},
        {"dataset": "RAVEN", "question_type": "multi-choice",
         "prediction": "y", "answer": "x", "choices": ["x", "y"]},
        {"dataset": "Spot-the-Diff", "question_type": "open-ended",
         "prediction": "a red ball appears", "answer": "a red ball appears"},
    ]
    r = evaluate(preds)
    assert r["puzzle"] == 0.5
    assert r["spot_the_diff"] == 1.0
    assert abs(r["overall"] - (0.5 * 2 + 1.0) / 3) < 1e-9
