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
    assert out.startswith("A chat between a curious human")
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
