"""DPO preference dataset — the `DPODataset` of train_dpo.py (SURVEY.md §2.7).

Items carry a shared prompt (+ optional video/image) and a chosen/rejected
response pair:
  {"id", "video"?, "image"?, "prompt": str,
   "chosen": str, "rejected": str}
or conversation-style {"chosen": [...], "rejected": [...]} where each is a
full conversations list (the reference's format); only the final assistant
turn differs.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict

import numpy as np

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.config import PipelineConfig
from memory_augmented_vlm_tpu.data.dataset import LazySupervisedDataset


class DPODataset(LazySupervisedDataset):
    """Preference pairs over the supervised dataset machinery."""

    def _conversations_for(self, item: Dict[str, Any], side: str):
        if isinstance(item.get(side), list):
            return copy.deepcopy(item[side])
        prompt = item.get("prompt", "")
        if ("image" in item or "video" in item) and \
                constants.DEFAULT_IMAGE_TOKEN not in prompt:
            prompt = constants.DEFAULT_IMAGE_TOKEN + "\n" + prompt
        return [
            {"from": "human", "value": prompt},
            {"from": "gpt", "value": item[side]},
        ]

    def _get_item(self, i: int) -> Dict[str, Any]:
        item = self.items[i]
        base = dict(item)
        base["conversations"] = self._conversations_for(item, "chosen")
        self.items[i] = base
        out = super()._get_item(i)
        self.items[i] = item  # restore

        rejected = self.preprocess_fn(self._conversations_for(item, "rejected"),
                                      self.tokenizer)
        out["chosen_input_ids"] = out.pop("input_ids")
        out["chosen_labels"] = out.pop("labels")
        out["rejected_input_ids"] = rejected["input_ids"]
        out["rejected_labels"] = rejected["labels"]
        return out
