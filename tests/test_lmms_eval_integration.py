"""Adapter integration against the lmms_eval harness API (vendored subset in
third_party/ when the real package isn't installed): generate_until with
`until` stopping, loglikelihood multiple-choice, and DP chunking — the eval
protocol of reference README.md:41-49 driven through real Instance objects.
"""

import numpy as np
import pytest
from PIL import Image

from tests.test_builder_roundtrip import ckpt_dir  # fixture


@pytest.fixture(scope="module")
def adapter(ckpt_dir):
    from memory_augmented_vlm_tpu.eval.lmms_adapter import _HAVE_LMMS, MavlmTpu

    assert _HAVE_LMMS, "vendored lmms_eval subset must be importable"
    return MavlmTpu(pretrained=ckpt_dir, max_frames_num=8)


def _docs(n=2):
    rng = np.random.default_rng(0)
    return [
        {"doc_id": i,
         "question": f"what is shown? (doc {i})",
         "answer": "A",
         "image": Image.fromarray(
             rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))}
        for i in range(n)
    ]


def test_adapter_registered_in_lmms_registry(adapter):
    from lmms_eval.api.registry import MODEL_REGISTRY, get_model

    assert "mavlm_tpu" in MODEL_REGISTRY
    assert get_model("mavlm_tpu") is type(adapter)


def test_generate_until_through_harness(adapter):
    from lmms_eval import evaluate_task

    out = evaluate_task(
        adapter, "tiny_vqa", _docs(),
        doc_to_text=lambda d: d["question"],
        doc_to_visual=lambda d: [d["image"]],
        doc_to_target=lambda d: d["answer"],
        request_type="generate_until",
        gen_kwargs={"max_new_tokens": 4, "temperature": 0,
                    "until": ["\n", "</s>"]},
    )
    assert len(out["responses"]) == 2
    assert all(isinstance(r, str) for r in out["responses"])
    assert 0.0 <= out["metrics"]["exact_match"] <= 1.0


def test_loglikelihood_through_harness(adapter):
    from lmms_eval import evaluate_task

    out = evaluate_task(
        adapter, "tiny_mc", _docs(),
        doc_to_text=lambda d: d["question"],
        doc_to_visual=lambda d: [d["image"]],
        doc_to_target=lambda d: d["answer"],
        request_type="loglikelihood",
        choices=lambda d: ["A", "B", "C"],
    )
    assert len(out["responses"]) == 2
    assert all(r in ("A", "B", "C") for r in out["responses"])


def test_loglikelihood_scores_are_sane(adapter):
    # longer continuations accumulate more (negative) log mass; scores finite
    ll_short, greedy_short = adapter.score("hi", " yes")
    ll_long, _ = adapter.score("hi", " yes yes yes yes yes")
    assert np.isfinite(ll_short) and np.isfinite(ll_long)
    assert ll_long < ll_short
    assert isinstance(greedy_short, bool)


def test_loglikelihood_matches_manual_forward(adapter):
    """Pin the scoring math against a direct full-vocab forward."""
    import jax.numpy as jnp

    from memory_augmented_vlm_tpu.models import qwen2, vlm

    tok = adapter.tokenizer
    model = adapter.model
    ctx_ids = tok.encode("the sky")
    cont_ids = tok.encode(" is blue", add_special_tokens=False)
    full = np.asarray(ctx_ids + cont_ids, np.int64)
    embeds = qwen2.embed_tokens(
        model.params["language_model"], jnp.asarray(full, jnp.int32),
        model.cfg.lm)
    got_ll, got_greedy = vlm.score_continuation(
        model.params, model.cfg, embeds, np.asarray(cont_ids))

    positions = jnp.arange(len(full))[None]
    hidden, _ = qwen2.forward(model.params["language_model"], model.cfg.lm,
                              embeds[None], positions)
    logits = np.asarray(qwen2.unembed(model.params["language_model"],
                                      model.cfg.lm, hidden))[0]
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True))
                           .sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
    want = sum(logp[len(ctx_ids) - 1 + j, t] for j, t in enumerate(cont_ids))
    np.testing.assert_allclose(got_ll, want, rtol=1e-4, atol=1e-4)
    want_greedy = all(int(np.argmax(logp[len(ctx_ids) - 1 + j])) == t
                      for j, t in enumerate(cont_ids))
    assert got_greedy == want_greedy


def test_dp_chunking_partitions_docs(adapter):
    from lmms_eval import evaluate_task

    docs = _docs(5)
    outs = [
        evaluate_task(
            adapter, "tiny_vqa_dp", docs,
            doc_to_text=lambda d: d["question"],
            doc_to_visual=lambda d: [d["image"]],
            doc_to_target=lambda d: d["answer"],
            request_type="generate_until",
            gen_kwargs={"max_new_tokens": 2, "temperature": 0},
            rank=r, world_size=2,
        )
        for r in range(2)
    ]
    assert len(outs[0]["responses"]) + len(outs[1]["responses"]) == 5


def test_generate_until_multi_round(adapter):
    from lmms_eval.api.instance import Instance

    doc = _docs(1)[0]
    adapter.task_dict = {"tiny_mr": {"test": {0: doc}}}
    req = Instance(
        request_type="generate_until_multi_round",
        arguments=(["what is this?", "and why?"],
                   {"max_new_tokens": 4, "temperature": 0},
                   lambda d: [d["image"]], 0, "tiny_mr", "test"),
        idx=0,
        metadata=("tiny_mr", 0, 1),
    )
    out = adapter.generate_until_multi_round([req])
    assert len(out) == 1 and len(out[0]) == 2
    assert all(isinstance(t, str) for t in out[0])


def test_multi_round_history_grows(adapter):
    rng = np.random.default_rng(3)
    vis = rng.integers(0, 255, (4, 48, 64, 3), dtype=np.uint8)
    answers = adapter.answer_multi_round(
        ["first question", "second question"], visuals=vis,
        modality="video", max_new_tokens=3)
    assert len(answers) == 2
