"""Best-of-N sampler + dataset auto-formatting — parity with the reference's
vendored TRL extras (trl/extras/best_of_n_sampler.py,
trl/extras/dataset_formatting.py) at the semantics level: query form
handling, full-sequence decoding before scoring, descending-score candidate
selection, and schema sniffing."""

import numpy as np
import pytest

import jax

from memory_augmented_vlm_tpu.config import LMConfig, VLMConfig
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.train.best_of_n import BestOfNSampler, LengthSampler
from memory_augmented_vlm_tpu.train import dataset_formatting as dfmt

TINY_LM = dict(vocab_size=50000, hidden_size=32, intermediate_size=64,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, head_dim=8, rope_theta=10000.0,
               tie_word_embeddings=True)


def _decode(ids):
    return " ".join(f"t{int(i)}" for i in ids)


@pytest.fixture(scope="module")
def tiny_model():
    lm_cfg = LMConfig(**TINY_LM)
    cfg = VLMConfig(lm=lm_cfg)
    params = {"language_model": qwen2.init_params(lm_cfg, jax.random.key(0))}
    return cfg, params


def _sampler(tiny_model, scores_fn, **kw):
    cfg, params = tiny_model
    kw.setdefault("sample_size", 4)
    kw.setdefault("seed", 7)
    # eos outside the tiny vocab => every sample runs the full length
    return BestOfNSampler(params, cfg, scores_fn, LengthSampler(4, 5),
                          decode=_decode, eos_token_ids=(49999,), **kw)


def test_best_of_n_selects_top_scored(tiny_model):
    seen = {}

    def scores(texts):
        s = [float(len(set(t.split()))) for t in texts]
        seen["texts"], seen["scores"] = texts, s
        return s

    bon = _sampler(tiny_model, scores, n_candidates=2)
    query = [5, 17, 23]
    out = bon.generate(query)
    assert len(out) == 1 and len(out[0]) == 2
    # candidates are the argmax of the recorded scores, descending
    order = np.argsort(-np.asarray(seen["scores"]), kind="stable")
    assert out[0] == [seen["texts"][i] for i in order[:2]]
    # every candidate decodes the FULL sequence: query prefix + completion
    prefix = _decode(query) + " "
    assert all(t.startswith(prefix) for t in seen["texts"])
    # length_sampler bounds the completion
    assert all(len(t.split()) == len(query) + 4 for t in seen["texts"])


def test_best_of_n_batch_forms_and_determinism(tiny_model):
    scores = lambda texts: [float(sum(map(ord, t))) for t in texts]
    q1, q2 = [5, 17, 23], [40, 2]
    # batch of queries: list of lists and 2-D array (padded to equal len not
    # required for the list form)
    out = _sampler(tiny_model, scores).generate([q1, q2])
    assert len(out) == 2 and all(len(c) == 1 for c in out)
    assert out[0][0].startswith(_decode(q1))
    assert out[1][0].startswith(_decode(q2))
    # same seed => same winners; different seed => same shape
    a = _sampler(tiny_model, scores).generate(q1)
    b = _sampler(tiny_model, scores).generate(q1)
    assert a == b
    # 1-D ndarray query form
    c = _sampler(tiny_model, scores).generate(np.asarray(q1, np.int32))
    assert a == c


def test_best_of_n_validates_args(tiny_model):
    scores = lambda texts: [0.0 for _ in texts]
    with pytest.raises(ValueError):
        _sampler(tiny_model, scores, n_candidates=9)
    bon = _sampler(tiny_model, scores)
    with pytest.raises(TypeError):
        bon.generate([1, 2], num_beams=2)
    with pytest.raises(ValueError):
        bon.generate([])


CHAT = [{"role": "user", "content": "What is 2+2?"},
        {"role": "assistant", "content": "4"}]
CHAT_RENDERED = ("<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
                 "<|im_start|>user\nWhat is 2+2?<|im_end|>\n"
                 "<|im_start|>assistant\n4<|im_end|>\n")


def test_formatting_chatml_single_and_batch():
    fn = dfmt.get_formatting_func_from_dataset([{"messages": CHAT}])
    assert fn is not None
    assert fn({"messages": CHAT}) == CHAT_RENDERED
    assert fn({"messages": [CHAT, CHAT]}) == [CHAT_RENDERED, CHAT_RENDERED]
    # "conversations" column with from/value keys (ShareGPT style)
    conv = [{"from": "human", "value": "What is 2+2?"},
            {"from": "gpt", "value": "4"}]
    fn2 = dfmt.get_formatting_func_from_dataset([{"conversations": conv}])
    assert fn2({"conversations": conv}) == CHAT_RENDERED


def test_formatting_instruction_and_unknown():
    ds = [{"prompt": "What is 2+2?", "completion": "4"}]
    fn = dfmt.get_formatting_func_from_dataset(ds)
    assert fn(ds[0]) == CHAT_RENDERED
    batch = {"prompt": ["What is 2+2?"], "completion": ["4"]}
    assert fn(batch) == [CHAT_RENDERED]
    assert dfmt.get_formatting_func_from_dataset([{"text": "x"}]) is None
    assert dfmt.get_formatting_func_from_dataset("not a dataset") is None


def test_formatting_system_override():
    msgs = [{"role": "system", "content": "Be terse."}] + CHAT
    fn = dfmt.conversations_formatting_function("messages")
    out = fn({"messages": msgs})
    assert out.startswith("<|im_start|>system\nBe terse.<|im_end|>\n")


def test_formatting_unknown_role_raises():
    """Unknown roles must fail loudly, not render a headerless ChatML body
    (ADVICE round 3); case variants of known roles still map."""
    import pytest

    fn = dfmt.conversations_formatting_function("messages")
    with pytest.raises(ValueError, match="unknown chat role 'tool'"):
        fn({"messages": [{"role": "tool", "content": "result"}]})
    # case-insensitive mapping of the known roles
    up = [{"role": "Human", "content": "What is 2+2?"},
          {"role": "GPT", "content": "4"}]
    assert fn({"messages": up}) == CHAT_RENDERED


def test_best_of_n_length_bucket_single_compile(tiny_model):
    """A wide LengthSampler range must not create one jit compile per draw:
    draws in the same 32-token bucket share a compile, and returned counts
    trim to the sampled length."""
    from memory_augmented_vlm_tpu.models import vlm

    cfg, params = tiny_model
    draws = iter([5, 17, 29])
    sampler = BestOfNSampler(
        params, cfg, lambda texts: [float(len(t)) for t in texts],
        lambda: next(draws),
        decode=lambda ids: "".join(chr(97 + int(t) % 26) for t in ids),
        sample_size=2, seed=0)
    vlm._jit_generate.cache_clear()
    before = vlm._jit_generate.cache_info().misses
    for _ in range(3):
        sampler.generate([3, 5, 7])
    misses = vlm._jit_generate.cache_info().misses - before
    assert misses == 1, misses
