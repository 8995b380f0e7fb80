"""Conversation template goldens — the rendered prompt strings must match the
reference's `Conversation.get_prompt` output exactly (eval prompts feed the
tokenizer; a one-character drift changes every benchmark answer)."""

from memory_augmented_vlm_tpu.data.conversation import conv_templates


def test_qwen_chatml_golden():
    conv = conv_templates["qwen_1_5"].copy()
    conv.append_message(conv.roles[0], "<image>\nWhat is this?")
    conv.append_message(conv.roles[1], None)
    expected = (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\n<image>\nWhat is this?<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    assert conv.get_prompt() == expected


def test_qwen_multiturn_golden():
    conv = conv_templates["qwen_1_5"].copy()
    conv.append_message(conv.roles[0], "hi")
    conv.append_message(conv.roles[1], "hello!")
    conv.append_message(conv.roles[0], "bye")
    conv.append_message(conv.roles[1], None)
    expected = (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\nhello!<|im_end|>\n"
        "<|im_start|>user\nbye<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    assert conv.get_prompt() == expected


def test_vicuna_v1_golden():
    conv = conv_templates["vicuna_v1"].copy()
    conv.append_message(conv.roles[0], "hi")
    conv.append_message(conv.roles[1], None)
    out = conv.get_prompt()
    assert out.startswith("A chat between a curious user")
    assert out.endswith("USER: hi ASSISTANT:")


def test_plain_golden():
    conv = conv_templates["plain"].copy()
    conv.append_message(conv.roles[0], "<image>")
    conv.append_message(conv.roles[1], "a caption")
    assert conv.get_prompt() == "<image>\na caption\n"


def test_copy_isolated():
    conv = conv_templates["qwen_1_5"].copy()
    conv.append_message(conv.roles[0], "x")
    assert not conv_templates["qwen_1_5"].messages


# ---------------------------------------------------------------------------
# Byte-exact cross-check of ALL templates against the reference renderer
# ---------------------------------------------------------------------------

import importlib.util
import os

import pytest

_REF_PATH = "/root/reference/llava/conversation.py"


def _load_reference_conversation():
    spec = importlib.util.spec_from_file_location("ref_llava_conversation",
                                                  _REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_conv():
    if not os.path.exists(_REF_PATH):
        pytest.skip("reference repo not present")
    return _load_reference_conversation()


def test_all_reference_template_names_registered(ref_conv):
    missing = set(ref_conv.conv_templates) - set(conv_templates)
    assert not missing, f"templates missing from registry: {sorted(missing)}"


def _render_pair(ours, theirs, turns):
    a, b = ours.copy(), theirs.copy()
    for role_idx, msg in turns:
        a.append_message(a.roles[role_idx], msg)
        b.append_message(b.roles[role_idx], msg)
    return a.get_prompt(), b.get_prompt()


_TURN_SETS = [
    # plain QA turn awaiting generation
    [(0, "hi there"), (1, None)],
    # image first-turn tuple (exercises the preamble incl. mmtag rewrite)
    [(0, ("describe the scene <image>", ["img"], "Default")), (1, None)],
    # full multi-turn with completed assistant answers
    [(0, "<image>\nwhat is this?"), (1, "a cat."), (0, "why?"), (1, None)],
]


def test_every_template_renders_byte_exact(ref_conv):
    for name, theirs in ref_conv.conv_templates.items():
        ours = conv_templates[name]
        if theirs.sep_style.name == "LLAMA_3" and theirs.tokenizer is None:
            # reference raises without its gated HF tokenizer; our explicit
            # renderer covers this template (pinned separately below)
            continue
        for turns in _TURN_SETS:
            if theirs.sep_style.name == "GEMMA" and turns[0][1] is None:
                continue
            try:
                got, want = _render_pair(ours, theirs, turns)
            except TypeError:
                # the reference renderer itself crashes on some combos
                # (PLAIN with sep2=None on a completed assistant turn)
                continue
            assert got == want, (
                f"template {name!r} diverges for {turns}:\n"
                f"ours:   {got!r}\nthiers: {want!r}")


def test_llama3_template_explicit_render():
    conv = conv_templates["llava_llama_3"].copy()
    conv.append_message(conv.roles[0], "<image>\nwhat?")
    conv.append_message(conv.roles[1], None)
    assert conv.get_prompt() == (
        "<|begin_of_text|><|start_header_id|>system<|end_header_id|>\n\n"
        "You are a helpful language and vision assistant. You are able to "
        "understand the visual content that the user provides, and assist "
        "the user with a variety of tasks using natural language.<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\n<image>\nwhat?<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
    )


def test_mmtag_preamble_rewrite(ref_conv):
    for name in ("llava_v0_mmtag", "llava_v1_mmtag", "llava_llama_2_mmtag"):
        ours = conv_templates[name].copy()
        theirs = ref_conv.conv_templates[name].copy()
        msg = ("what is here? <image>", ["img"], "Default")
        ours.append_message(ours.roles[0], msg)
        ours.append_message(ours.roles[1], None)
        theirs.append_message(theirs.roles[0], msg)
        theirs.append_message(theirs.roles[1], None)
        got, want = ours.get_prompt(), theirs.get_prompt()
        assert "<Image><image></Image>" in got
        assert got == want, f"{name}: {got!r} != {want!r}"
