"""SFT trainer capability — the reference's vendored TRL `SFTTrainer`
(trl/trainer/sft_trainer.py, 480 LoC) on the TPU harness.

The SFTTrainer's value-add over plain CE training is data preparation:
  - constant-length packing (trl/trainer/utils.py:341-457
    `ConstantLengthDataset`): concatenate eos-joined tokenized samples and
    emit fixed `seq_length` chunks, dropping the ragged tail;
  - completion-only label masking (trl/trainer/utils.py:119-192
    `DataCollatorForCompletionOnlyLM`): supervise only tokens after the
    response template, including the multi-turn instruction/response variant.

Both are re-derived here as pure-numpy dataset utilities feeding the
existing CE train step (train/trainer.py); `make_sft_train_step` packages a
jitted text-only step. Parity with the reference masking logic is pinned in
tests/test_ppo_sft.py against the vendored TRL collator.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import optax

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.train import trainer as trainer_mod
from memory_augmented_vlm_tpu.train.optimizer import OptimizerConfig, build_optimizer


@dataclasses.dataclass(frozen=True)
class SFTConfig:
    seq_length: int = 1024
    packing: bool = True
    append_concat_token: bool = True
    ignore_index: int = constants.IGNORE_INDEX


def pack_constant_length(
    tokenized: Iterable[Sequence[int]],
    seq_length: int,
    concat_token_id: int,
    *,
    append_concat_token: bool = True,
    shuffle: bool = False,
    seed: int = 0,
) -> List[np.ndarray]:
    """ConstantLengthDataset packing over pre-tokenized samples: join with
    the eos/concat token, slice fixed-length chunks, drop the ragged tail
    (trl/trainer/utils.py:421-457). labels == input_ids for packed chunks."""
    all_ids: List[int] = []
    for ids in tokenized:
        ids = list(ids)
        if append_concat_token:
            ids = ids + [concat_token_id]
        all_ids.extend(ids)
    examples = [
        np.asarray(all_ids[i:i + seq_length], np.int64)
        for i in range(0, len(all_ids) - seq_length + 1, seq_length)
    ]
    if shuffle:
        rng = np.random.default_rng(seed)
        rng.shuffle(examples)
    return examples


def completion_only_labels(
    input_ids: np.ndarray,
    response_template_ids: Sequence[int],
    instruction_template_ids: Optional[Sequence[int]] = None,
    ignore_index: int = constants.IGNORE_INDEX,
) -> np.ndarray:
    """DataCollatorForCompletionOnlyLM label masking for one sequence
    (trl/trainer/utils.py:119-192): supervise only response spans.

    Single-template mode masks everything through the END of the (last)
    response template; instruction mode masks every [instruction, response)
    span across multi-turn sequences, plus any trailing instruction."""
    ids = np.asarray(input_ids)
    labels = ids.copy()
    resp = list(response_template_ids)

    def _matches(template: List[int]) -> List[int]:
        starts = []
        for idx in np.where(labels == template[0])[0]:
            if ids[idx:idx + len(template)].tolist() == template:
                starts.append(int(idx))
        return starts

    if instruction_template_ids is None:
        start = None
        for idx in _matches(resp):
            start = idx
        if start is None:
            labels[:] = ignore_index
        else:
            labels[: start + len(resp)] = ignore_index
        return labels

    instr = list(instruction_template_ids)
    response_idxs = [s + len(resp) for s in _matches(resp)]
    human_idxs = _matches(instr)
    if not response_idxs or not human_idxs:
        labels[:] = ignore_index
        return labels
    if human_idxs[0] > response_idxs[0]:
        human_idxs = [0] + human_idxs
    for i, (start, end) in enumerate(zip(human_idxs, response_idxs)):
        labels[(start if i != 0 else 0):end] = ignore_index
    if len(response_idxs) < len(human_idxs):
        labels[human_idxs[-1]:] = ignore_index
    return labels


def sft_loss(params, cfg: VLMConfig, input_ids, labels, valid_len):
    """Next-token CE over supervised positions (the HF Trainer objective the
    reference SFTTrainer delegates to)."""
    embeds = qwen2.embed_tokens(params["language_model"], input_ids, cfg.lm)
    positions = jnp.broadcast_to(jnp.arange(embeds.shape[1])[None],
                                 embeds.shape[:2])
    hidden, _ = qwen2.forward(params["language_model"], cfg.lm, embeds,
                              positions, valid_len=valid_len, remat=True,
                              differentiable_attention=True)
    return trainer_mod.cross_entropy(params, cfg, hidden, labels, valid_len)


def make_sft_train_step(cfg: VLMConfig, opt_cfg: OptimizerConfig):
    def step(state: trainer_mod.TrainState, input_ids, labels, valid_len):
        def loss_fn(p):
            loss, n = sft_loss(p, cfg, input_ids, labels, valid_len)
            return loss, {"loss": loss, "supervised_tokens": n}

        (loss, metrics), grads = trainer_mod.value_and_grad_params(loss_fn, state.params)
        optimizer = build_optimizer(state.params, opt_cfg)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                  state.params, updates)
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        return trainer_mod.TrainState(new_params, new_opt, state.step + 1), metrics

    return step
