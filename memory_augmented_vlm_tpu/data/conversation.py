"""Conversation / prompt templates.

Capability parity with llava/conversation.py: a `Conversation` dataclass with
separator styles and a template registry. The active video recipe uses
`qwen_1_5` (ChatML, conversation.py:443-452,578-579); the other styles cover
the alternative LM backbones (L11 of SURVEY.md §1).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple


class SeparatorStyle(enum.Enum):
    SINGLE = enum.auto()
    TWO = enum.auto()
    MPT = enum.auto()
    PLAIN = enum.auto()
    CHATML = enum.auto()
    LLAMA_2 = enum.auto()
    LLAMA_3 = enum.auto()
    GEMMA = enum.auto()
    QWEN = enum.auto()


@dataclasses.dataclass
class Conversation:
    """A conversation with history; `get_prompt` renders the LM input string."""

    system: str
    roles: Tuple[str, str]
    messages: List[List]
    offset: int = 0
    sep_style: SeparatorStyle = SeparatorStyle.SINGLE
    sep: str = "###"
    sep2: Optional[str] = None
    version: str = "Unknown"
    tokenizer_id: str = ""
    stop_str: Optional[str] = None
    stop_token_ids: Optional[List[int]] = None

    def get_prompt(self) -> str:
        messages = self.messages
        if len(messages) > 0 and type(messages[0][1]) is tuple:
            messages = self.messages.copy()
            init_role, init_msg = messages[0]
            init_msg = init_msg[0]
            messages[0] = (init_role, "<image>" + init_msg)

        if self.sep_style == SeparatorStyle.SINGLE:
            ret = self.system + self.sep
            for role, message in messages:
                if message:
                    if type(message) is tuple:
                        message = message[0]
                    ret += role + ": " + message + self.sep
                else:
                    ret += role + ":"
            return ret
        if self.sep_style == SeparatorStyle.TWO:
            seps = [self.sep, self.sep2]
            ret = self.system + seps[0]
            for i, (role, message) in enumerate(messages):
                if message:
                    if type(message) is tuple:
                        message = message[0]
                    ret += role + ": " + message + seps[i % 2]
                else:
                    ret += role + ":"
            return ret
        if self.sep_style in (SeparatorStyle.CHATML, SeparatorStyle.QWEN,
                              SeparatorStyle.MPT):
            # ChatML: <|im_start|>role\ncontent<|im_end|>\n
            ret = self.system + self.sep + "\n" if self.system else ""
            for role, message in messages:
                if message:
                    if type(message) is tuple:
                        message = message[0]
                    ret += role + "\n" + message + self.sep + "\n"
                else:
                    ret += role + "\n"
            return ret
        if self.sep_style == SeparatorStyle.PLAIN:
            ret = self.system
            for i, (role, message) in enumerate(messages):
                if message:
                    if type(message) is tuple:
                        message = message[0]
                    ret += message + (self.sep if i % 2 == 0 else (self.sep2 or self.sep))
            return ret
        if self.sep_style == SeparatorStyle.LLAMA_2:
            def wrap_sys(msg):
                return f"<<SYS>>\n{msg}\n<</SYS>>\n\n" if msg else ""

            ret = ""
            for i, (role, message) in enumerate(messages):
                if message:
                    if type(message) is tuple:
                        message = message[0]
                    if i == 0:
                        message = wrap_sys(self.system) + message
                    if i % 2 == 0:
                        ret += f"<s>[INST] {message} [/INST]"
                    else:
                        ret += f" {message} </s>"
            return ret
        if self.sep_style == SeparatorStyle.LLAMA_3:
            ret = (
                f"<|begin_of_text|><|start_header_id|>system<|end_header_id|>\n\n"
                f"{self.system}<|eot_id|>"
            ) if self.system else "<|begin_of_text|>"
            for role, message in messages:
                if message:
                    if type(message) is tuple:
                        message = message[0]
                    ret += f"<|start_header_id|>{role}<|end_header_id|>\n\n{message}<|eot_id|>"
                else:
                    ret += f"<|start_header_id|>{role}<|end_header_id|>\n\n"
            return ret
        if self.sep_style == SeparatorStyle.GEMMA:
            ret = ""
            for role, message in messages:
                if message:
                    if type(message) is tuple:
                        message = message[0]
                    ret += role + message + self.sep
                else:
                    ret += role
            return ret
        raise ValueError(f"Invalid style: {self.sep_style}")

    def append_message(self, role: str, message) -> None:
        self.messages.append([role, message])

    def copy(self) -> "Conversation":
        return Conversation(
            system=self.system,
            roles=self.roles,
            messages=[[x, y] for x, y in self.messages],
            offset=self.offset,
            sep_style=self.sep_style,
            sep=self.sep,
            sep2=self.sep2,
            version=self.version,
            stop_str=self.stop_str,
            stop_token_ids=self.stop_token_ids,
        )


conv_qwen = Conversation(
    system="<|im_start|>system\nYou are a helpful assistant.",
    roles=("<|im_start|>user", "<|im_start|>assistant"),
    version="qwen",
    messages=[],
    sep_style=SeparatorStyle.CHATML,
    sep="<|im_end|>",
)

conv_vicuna_v1 = Conversation(
    system=(
        "A chat between a curious human and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the human's questions."
    ),
    roles=("USER", "ASSISTANT"),
    version="v1",
    messages=[],
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2="</s>",
)

conv_llava_plain = Conversation(
    system="",
    roles=("", ""),
    version="plain",
    messages=[],
    sep_style=SeparatorStyle.PLAIN,
    sep="\n",
)

conv_llama_2 = Conversation(
    system=(
        "You are a helpful language and vision assistant. You are able to understand the "
        "visual content that the user provides, and assist the user with a variety of tasks "
        "using natural language."
    ),
    roles=("USER", "ASSISTANT"),
    version="llama_v2",
    messages=[],
    sep_style=SeparatorStyle.LLAMA_2,
    sep="<s>",
    sep2="</s>",
)

conv_llava_llama_3 = Conversation(
    system="You are a helpful language and vision assistant.",
    roles=("user", "assistant"),
    version="llama_v3",
    messages=[],
    sep_style=SeparatorStyle.LLAMA_3,
    sep="<|eot_id|>",
)

conv_mistral_instruct = Conversation(
    system="",
    roles=("USER", "ASSISTANT"),
    version="llama_v2",
    messages=[],
    sep_style=SeparatorStyle.LLAMA_2,
    sep="",
    sep2="</s>",
)

conv_gemma_instruct = Conversation(
    system="",
    roles=("<start_of_turn>user\n", "<start_of_turn>model\n"),
    version="gemma",
    messages=[],
    sep_style=SeparatorStyle.GEMMA,
    sep="<end_of_turn>\n",
)

conv_mpt = Conversation(
    system="<|im_start|>system\nA conversation between a user and an LLM-based AI assistant. The assistant gives helpful and honest answers.",
    roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
    version="mpt",
    messages=[],
    sep_style=SeparatorStyle.MPT,
    sep="<|im_end|>",
)

conv_templates = {
    "default": conv_vicuna_v1,
    "v1": conv_vicuna_v1,
    "vicuna_v1": conv_vicuna_v1,
    "plain": conv_llava_plain,
    "llava_plain": conv_llava_plain,
    "llava_v1": conv_vicuna_v1,
    "llama_2": conv_llama_2,
    "llava_llama_2": conv_llama_2,
    "llava_llama_3": conv_llava_llama_3,
    "mistral_instruct": conv_mistral_instruct,
    "gemma_instruct": conv_gemma_instruct,
    "mpt": conv_mpt,
    "qwen_1_5": conv_qwen,
    "qwen_2": conv_qwen,
}

default_conversation = conv_qwen
