"""Drive the adaptive speculative BatchEngine on the real TPU backend:
tiny LM, one repetitive prompt (lookup hits + acceptance expected) and one
incompressible prompt (no verify forwards expected), outputs compared to a
plain (non-speculative) engine bit-for-bit."""
import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import LMConfig, VLMConfig, PipelineConfig
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.serve.batch_engine import BatchEngine

print("backend:", jax.default_backend(), jax.devices(), flush=True)

lm = LMConfig(vocab_size=50000, hidden_size=128, intermediate_size=256,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, head_dim=32, rope_theta=10000.0,
              dtype="bfloat16")
cfg = VLMConfig(lm=lm, pipeline=PipelineConfig())
params = {"language_model": qwen2.init_params(lm, jax.random.key(0),
                                              jnp.bfloat16)}


def embeds(ids):
    emb = params["language_model"]["embed_tokens"]
    return np.asarray(jnp.take(emb, jnp.asarray(ids), axis=0))


rep_ids = np.array([7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8], np.int32)
uniq_ids = np.arange(100, 111, dtype=np.int32)

plain = BatchEngine(params, cfg, num_slots=2, max_len=128).start()
try:
    want_rep = plain.generate(embeds(rep_ids), max_new_tokens=24,
                              eos_token_ids=(49999,))
    want_uni = plain.generate(embeds(uniq_ids), max_new_tokens=4,
                              eos_token_ids=(49999,))
finally:
    plain.shutdown()

spec = BatchEngine(params, cfg, num_slots=2, max_len=128,
                   speculative=4).start()
try:
    got_rep = spec.generate(embeds(rep_ids), max_new_tokens=24,
                            eos_token_ids=(49999,), draft_ids=rep_ids)
    st1 = dict(spec.stats)
    got_uni = spec.generate(embeds(uniq_ids), max_new_tokens=4,
                            eos_token_ids=(49999,), draft_ids=uniq_ids)
    st2 = dict(spec.stats)
finally:
    spec.shutdown()

np.testing.assert_array_equal(got_rep, want_rep)
np.testing.assert_array_equal(got_uni, want_uni)
print("repetitive stats:", st1, flush=True)
print("cumulative stats:", st2, flush=True)
assert st1["tokens"] >= st1["decode_forwards"], st1
print("OK: speculative engine bit-matches plain greedy on TPU;",
      f"{st1['tokens']} tokens in {st1['decode_forwards']} forwards",
      f"({st1['spec_forwards']} verify rounds)")
