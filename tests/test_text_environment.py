"""TextEnvironment semantics vs the reference's vendored TRL
(trl/environment/base_environment.py): the request/call/response/submit
protocol, end checks, PPO query/response/mask splits, and the batched decode
model turn."""

import numpy as np
import pytest

import jax

from memory_augmented_vlm_tpu.config import LMConfig, VLMConfig
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.train.text_environment import (
    CALL_TOKEN, REQUEST_TOKEN, RESPONSE_TOKEN, SUBMIT_TOKEN,
    TextEnvironment, TextHistory)


def encode(s):
    return [ord(c) for c in s]


def decode(ids):
    return "".join(chr(int(t)) for t in ids)


def scripted(turns):
    """generate_fn that replays per-turn outputs for every active row."""
    state = {"i": 0}

    def fn(rows):
        out = [encode(turns[min(state["i"], len(turns) - 1)]) for _ in rows]
        state["i"] += 1
        return out

    return fn


def env_with(turns, tools=None, **kw):
    kw.setdefault("reward_fn", lambda texts: [float(len(t)) for t in texts])
    return TextEnvironment(
        encode=encode, decode=decode,
        tools=tools if tools is not None else {"Calc": lambda q: str(eval(q))},
        generate_fn=scripted(turns), eos_text="<eos>", prompt="P: ", **kw)


def test_tool_call_episode_and_ppo_split():
    env = env_with([f"{REQUEST_TOKEN}<Calc>2+2{CALL_TOKEN}",
                    f"The answer is 4.{SUBMIT_TOKEN}"])
    queries, responses, masks, rewards, histories = env.run(["what is 2+2?"])
    h = histories[0]
    assert h.completed and not h.truncated
    # turn 1 (model) + tool response (system) + turn 2 (model)
    assert h.text == ("P: what is 2+2?"
                      f"{REQUEST_TOKEN}<Calc>2+2{CALL_TOKEN}"
                      f"4{RESPONSE_TOKEN}"
                      f"The answer is 4.{SUBMIT_TOKEN}")
    assert decode(queries[0]) == "P: what is 2+2?"
    assert decode(responses[0]) == h.text[len("P: what is 2+2?"):]
    # mask: 1 on model tokens, 0 on the spliced tool response
    m = masks[0]
    t1 = len(encode(f"{REQUEST_TOKEN}<Calc>2+2{CALL_TOKEN}"))
    tr = len(encode(f"4{RESPONSE_TOKEN}"))
    assert m[:t1].all() and not m[t1:t1 + tr].any() and m[t1 + tr:].all()
    # reward computed on the LAST segment only
    assert rewards[0] == float(len(f"The answer is 4.{SUBMIT_TOKEN}"))


def test_unknown_tool_and_malformed_call():
    env = env_with([f"{REQUEST_TOKEN}<Nope>x{CALL_TOKEN}",
                    f"done{SUBMIT_TOKEN}"])
    *_, histories = env.run(["t"])
    assert "Unknown tool Nope." in histories[0].text
    env = env_with([f"{REQUEST_TOKEN}no name here{CALL_TOKEN}",
                    f"done{SUBMIT_TOKEN}"])
    *_, histories = env.run(["t"])
    assert "Unknown tool call:" in histories[0].text


def test_host_side_stop_trim_for_non_atomic_markers():
    """When the tokenizer does not treat <call>/<submit> as atomic special
    tokens (here: char-level encode), the token-suffix stop cannot fire —
    the host-side fallback must trim the decoded turn at the first marker
    (the reference's StringStoppingCriteria semantics)."""
    env = env_with([f"{REQUEST_TOKEN}<Calc>2+2{CALL_TOKEN}overrun text",
                    f"ok{SUBMIT_TOKEN}trailing junk"])
    *_, histories = env.run(["q"])
    h = histories[0]
    assert "overrun" not in h.text and "trailing junk" not in h.text
    assert h.text.endswith(SUBMIT_TOKEN)
    # tokens stay consistent with the trimmed text
    assert decode(h.tokens) == h.text


def test_tool_error_and_response_truncation():
    def boom(q):
        raise RuntimeError("nope")

    env = env_with([f"{REQUEST_TOKEN}<Calc>1{CALL_TOKEN}", f"x{SUBMIT_TOKEN}"],
                   tools={"Calc": boom})
    *_, histories = env.run(["t"])
    assert "Tool error: nope" in histories[0].text

    env = env_with([f"{REQUEST_TOKEN}<Calc>9{CALL_TOKEN}", f"x{SUBMIT_TOKEN}"],
                   tools={"Calc": lambda q: "z" * 50}, max_tool_response=10)
    *_, histories = env.run(["t"])
    assert ("z" * 7 + "..." + RESPONSE_TOKEN) in histories[0].text
    assert "z" * 8 not in histories[0].text


def test_end_conditions():
    # a model turn with no request/submit ends the episode
    env = env_with(["just rambling"])
    *_, histories = env.run(["t"])
    assert histories[0].completed and len(histories[0].text_spans) == 2
    # eos text anywhere ends it
    env = env_with(["oops <eos> trailing"])
    *_, histories = env.run(["t"])
    assert histories[0].completed and not histories[0].truncated
    # max_length marks truncated
    env = env_with([f"{REQUEST_TOKEN}<Calc>2+2{CALL_TOKEN}"] * 8, max_length=20)
    *_, histories = env.run(["a long task string"])
    assert histories[0].completed and histories[0].truncated
    # max_turns bounds the loop without completing histories
    env = env_with([f"{REQUEST_TOKEN}<Calc>1+1{CALL_TOKEN}"] * 10, max_turns=3)
    *_, histories = env.run(["t"])
    assert len([s for s in histories[0].system_spans if not s]) == 3


def test_batch_mixed_completion():
    # row 0 submits on turn 1; row 1 keeps calling the tool: the scripted fn
    # sees shrinking active batches
    calls = []

    def fn(rows):
        calls.append(len(rows))
        outs = []
        for r in rows:
            if decode(r).startswith("P: a"):
                outs.append(encode(f"done{SUBMIT_TOKEN}"))
            else:
                outs.append(encode(f"{REQUEST_TOKEN}<Calc>1+1{CALL_TOKEN}"))
        return outs

    env = TextEnvironment(
        encode=encode, decode=decode, tools={"Calc": lambda q: str(eval(q))},
        reward_fn=lambda texts: [1.0] * len(texts), generate_fn=fn,
        eos_text="<eos>", prompt="P: ", max_turns=2)
    _, responses, masks, rewards, histories = env.run(["a", "b"])
    assert calls == [2, 1]
    assert histories[0].completed
    assert rewards == [1.0, 1.0]
    assert len(responses[1]) == len(masks[1])


def test_parse_tool_call_forms():
    tool, q = TextEnvironment.parse_tool_call(
        f"{REQUEST_TOKEN}<Wiki>a>b{CALL_TOKEN}")
    assert (tool, q) == ("Wiki", "a>b")
    assert TextEnvironment.parse_tool_call("no markers") == (None, None)


def test_real_lm_model_turn_runs():
    """The default batched-decode model turn on a tiny random LM: random
    text contains no request so episodes end after one turn, with model
    tokens masked 1."""
    lm = LMConfig(vocab_size=50000, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, head_dim=8, rope_theta=10000.0)
    cfg = VLMConfig(lm=lm)
    params = {"language_model": qwen2.init_params(lm, jax.random.key(0))}
    env = TextEnvironment(
        params, cfg, encode=lambda s: [ord(c) % 50000 for c in s],
        decode=lambda ids: "".join(chr(32 + int(t) % 90) for t in ids),
        tools={"Calc": lambda q: q}, reward_fn=lambda t: [0.5] * len(t),
        eos_text="§", eos_token_ids=(49999,), max_new_tokens=8,
        max_turns=2)
    queries, responses, masks, rewards, histories = env.run(["hi", "there"])
    assert all(h.completed for h in histories)
    assert rewards == [0.5, 0.5]
    for r, m in zip(responses, masks):
        assert len(r) == len(m) and (len(r) == 0 or m.all())
