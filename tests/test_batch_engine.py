"""Continuous-batching engine: greedy outputs must be bit-identical to the
single-request decode path, across staggered admissions and slot recycling
(the correctness bar for the sglang-class worker)."""

import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import LMConfig, VLMConfig
from memory_augmented_vlm_tpu.models import qwen2, vlm
from memory_augmented_vlm_tpu.serve.batch_engine import BatchEngine


@pytest.fixture(scope="module")
def tiny():
    lm = LMConfig(vocab_size=50000, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, head_dim=8, rope_theta=10000.0,
                  dtype="float32")
    cfg = VLMConfig(lm=lm)
    params = {"language_model": qwen2.init_params(lm, jax.random.key(0))}
    return cfg, params


def _embeds(params, ids):
    return np.asarray(qwen2.embed_tokens(
        params["language_model"], jnp.asarray(ids, jnp.int32)))


def _reference(params, cfg, ids, n):
    out = vlm.generate(params, cfg, jnp.asarray(_embeds(params, ids)),
                       max_new_tokens=n, eos_token_ids=(49999,),
                       pad_to_multiple=128)
    return np.asarray(out.tokens)[: int(out.num_tokens)]


def test_concurrent_greedy_matches_single(tiny):
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=3, max_len=256).start()
    try:
        rng = np.random.default_rng(0)
        prompts = [rng.integers(0, 1000, size=(n,)) for n in (4, 7, 3, 5)]
        want = [_reference(params, cfg, p, 8) for p in prompts]

        results = [None] * len(prompts)

        def run(i):
            results[i] = engine.generate(_embeds(params, prompts[i]),
                                         max_new_tokens=8,
                                         eos_token_ids=(49999,))

        # 4 requests over 3 slots: forces recycling of at least one slot
        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for i, t in enumerate(threads):
            t.start()
            if i == 1:
                time.sleep(0.05)  # staggered admission mid-decode
        for t in threads:
            t.join(timeout=180)
        for i, (got, exp) in enumerate(zip(results, want)):
            assert got is not None, f"request {i} timed out"
            np.testing.assert_array_equal(got, exp, err_msg=f"request {i}")
    finally:
        engine.shutdown()


def test_eos_frees_slot_for_queued_request(tiny):
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=1, max_len=256).start()
    try:
        rng = np.random.default_rng(1)
        a = rng.integers(0, 1000, size=(4,))
        b = rng.integers(0, 1000, size=(6,))
        ra = engine.generate(_embeds(params, a), max_new_tokens=5,
                             eos_token_ids=(49999,))
        rb = engine.generate(_embeds(params, b), max_new_tokens=5,
                             eos_token_ids=(49999,))
        np.testing.assert_array_equal(ra, _reference(params, cfg, a, 5))
        np.testing.assert_array_equal(rb, _reference(params, cfg, b, 5))
    finally:
        engine.shutdown()


def test_top_p_zero_keeps_top_token(tiny):
    """top_p ~ 0 must restrict to the argmax (min_tokens_to_keep=1), not
    fall open to the full distribution."""
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=1, max_len=128).start()
    try:
        rng = np.random.default_rng(4)
        ids = rng.integers(0, 1000, size=(5,))
        greedy = _reference(params, cfg, ids, 6)
        sampled = engine.generate(_embeds(params, ids), max_new_tokens=6,
                                  eos_token_ids=(49999,), temperature=0.8,
                                  top_p=1e-6)
        np.testing.assert_array_equal(sampled, greedy)
    finally:
        engine.shutdown()


def test_engine_stop_sequences(tiny):
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=1, max_len=128).start()
    try:
        rng = np.random.default_rng(5)
        ids = rng.integers(0, 1000, size=(4,))
        full = _reference(params, cfg, ids, 8)
        assert len(full) >= 3
        stop = tuple(int(t) for t in full[1:3])
        got = engine.generate(_embeds(params, ids), max_new_tokens=8,
                              eos_token_ids=(49999,), stop_sequences=(stop,))
        # exact parity with the single-request in-loop keyword stopping
        ref = vlm.generate(params, cfg, jnp.asarray(_embeds(params, ids)),
                           max_new_tokens=8, eos_token_ids=(49999,),
                           stop_sequences=(stop,), pad_to_multiple=128)
        want = np.asarray(ref.tokens)[: int(ref.num_tokens)]
        np.testing.assert_array_equal(got, want)
        assert len(want) < len(full)  # the stop actually truncated
    finally:
        engine.shutdown()


def test_kv_int8_greedy_matches_bf16_engine(tiny):
    """kv_int8 serving mode: the int8 slot-pool cache (half the HBM
    footprint) must reproduce the full-precision engine's greedy tokens on
    a well-separated random model, across staggered admission."""
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=2, max_len=256,
                         kv_int8=True).start()
    try:
        assert engine._cache.k.dtype == jnp.int8
        assert engine._cache.k_scale is not None
        rng = np.random.default_rng(7)
        prompts = [rng.integers(0, 1000, size=(n,)) for n in (5, 3, 6)]
        want = [_reference(params, cfg, p, 8) for p in prompts]
        results = [None] * len(prompts)

        def run(i):
            results[i] = engine.generate(_embeds(params, prompts[i]),
                                         max_new_tokens=8,
                                         eos_token_ids=(49999,))

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for i, t in enumerate(threads):
            t.start()
            if i == 0:
                time.sleep(0.05)
        for t in threads:
            t.join(timeout=180)
        for i, (got, exp) in enumerate(zip(results, want)):
            assert got is not None, f"request {i} timed out"
            np.testing.assert_array_equal(got, exp, err_msg=f"request {i}")
    finally:
        engine.shutdown()


def test_quantize_kv_rows_roundtrip():
    """Per-row symmetric int8: dequant error bounded by scale/2 per
    element (0.4% of the row max)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4, 3, 16)), jnp.float32)
    q, s = qwen2.quantize_kv_rows(x)
    assert q.dtype == jnp.int8 and s.shape == x.shape[:-1]
    deq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    err = np.abs(deq - np.asarray(x))
    assert err.max() <= np.asarray(s).max() * 0.51


@pytest.mark.parametrize("kv_int8", [False, True], ids=["bf16kv", "int8kv"])
def test_chunked_prefill_matches_reference(tiny, kv_int8):
    """chunk_prefill: long prompts prefill one chunk per tick (interleaved
    with other slots' decode steps) and still reproduce the one-shot
    engine's greedy tokens exactly."""
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=2, max_len=256,
                         chunk_prefill=8, kv_int8=kv_int8).start()
    try:
        rng = np.random.default_rng(9)
        # 20 and 25 tokens -> 3-4 chunks each; 5 tokens -> one-shot path
        prompts = [rng.integers(0, 1000, size=(n,)) for n in (20, 25, 5)]
        want = [_reference(params, cfg, p, 8) for p in prompts]
        results = [None] * len(prompts)

        def run(i):
            results[i] = engine.generate(_embeds(params, prompts[i]),
                                         max_new_tokens=8,
                                         eos_token_ids=(49999,))

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for i, t in enumerate(threads):
            t.start()
            # stagger so prompt 1's chunked admission overlaps prompt 0's
            # decoding (the interleaving this feature exists for)
            time.sleep(0.05)
        for t in threads:
            t.join(timeout=180)
        for i, (got, exp) in enumerate(zip(results, want)):
            assert got is not None, f"request {i} timed out"
            np.testing.assert_array_equal(got, exp, err_msg=f"request {i}")
    finally:
        engine.shutdown()


@pytest.mark.parametrize("chunk,kv_int8", [(0, False), (8, False), (8, True)],
                         ids=["oneshot", "chunked", "chunked-int8"])
def test_prefix_caching_matches_full_prompt(tiny, chunk, kv_int8):
    """set_prefix + use_prefix: the shared prefix KV computes once; suffix
    prefill at offset P reproduces the full-prompt greedy tokens."""
    cfg, params = tiny
    rng = np.random.default_rng(13)
    prefix = rng.integers(0, 1000, size=(11,))
    engine = BatchEngine(params, cfg, num_slots=2, max_len=256,
                         chunk_prefill=chunk, kv_int8=kv_int8).start()
    try:
        engine.set_prefix(_embeds(params, prefix))
        suffixes = [rng.integers(0, 1000, size=(n,)) for n in (7, 18)]
        for suf in suffixes:
            full = np.concatenate([prefix, suf])
            want = _reference(params, cfg, full, 6)
            got = engine.generate(_embeds(params, suf), max_new_tokens=6,
                                  eos_token_ids=(49999,), use_prefix=True)
            np.testing.assert_array_equal(got, want)
        # non-prefix requests still work beside prefix ones
        plain = rng.integers(0, 1000, size=(5,))
        np.testing.assert_array_equal(
            engine.generate(_embeds(params, plain), max_new_tokens=6,
                            eos_token_ids=(49999,)),
            _reference(params, cfg, plain, 6))
    finally:
        engine.shutdown()


def test_chunked_prefill_near_max_len(tiny):
    """The final chunk of a prompt near max_len must not let its padded
    width overrun the cache (dynamic_update_slice would CLAMP the start
    and silently shift the write over valid rows)."""
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=1, max_len=40,
                         chunk_prefill=16).start()
    try:
        rng = np.random.default_rng(33)
        ids = rng.integers(0, 1000, size=(39,))  # chunks at 0,16,32 (w=8)
        want = _reference(params, cfg, ids, 1)
        got = engine.generate(_embeds(params, ids), max_new_tokens=1,
                              eos_token_ids=(49999,))
        np.testing.assert_array_equal(got, want)

        # prefix-offset de-alignment: chunks at 5,13,21,29 — the last one
        # must cap at 32-29=3 rows
        engine2 = BatchEngine(params, cfg, num_slots=1, max_len=32,
                              chunk_prefill=8).start()
        try:
            prefix = rng.integers(0, 1000, size=(5,))
            suffix = rng.integers(0, 1000, size=(26,))
            engine2.set_prefix(_embeds(params, prefix))
            want2 = _reference(params, cfg, np.concatenate([prefix, suffix]),
                               1)
            got2 = engine2.generate(_embeds(params, suffix),
                                    max_new_tokens=1,
                                    eos_token_ids=(49999,), use_prefix=True)
            np.testing.assert_array_equal(got2, want2)
        finally:
            engine2.shutdown()
    finally:
        engine.shutdown()


def test_empty_suffix_rejected(tiny):
    """A use_prefix request with an empty suffix (and any empty prompt) is
    rejected cleanly instead of seeding generation from a pad row."""
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=1, max_len=64,
                         chunk_prefill=8).start()
    try:
        engine.set_prefix(_embeds(params, np.array([3, 5, 7])))
        empty = np.zeros((0, cfg.lm.hidden_size), np.float32)
        assert engine.generate(empty, max_new_tokens=3, use_prefix=True,
                               eos_token_ids=(49999,)).shape == (0,)
        assert engine.generate(empty, max_new_tokens=3,
                               eos_token_ids=(49999,)).shape == (0,)
        # engine still serves
        ids = np.array([4, 9, 2])
        np.testing.assert_array_equal(
            engine.generate(_embeds(params, ids), max_new_tokens=3,
                            eos_token_ids=(49999,)),
            _reference(params, cfg, ids, 3))
    finally:
        engine.shutdown()


@pytest.mark.parametrize("kv_int8", [False, True], ids=["bf16kv", "int8kv"])
def test_engine_speculative_matches_plain(tiny, kv_int8):
    """speculative=K: batched prompt-lookup verification emits exactly the
    plain engine's greedy tokens across concurrent slots, in fewer LM
    forwards on repetitive outputs."""
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=2, max_len=256,
                         speculative=4, kv_int8=kv_int8).start()
    try:
        rng = np.random.default_rng(43)
        prompts = [rng.integers(0, 1000, size=(n,)) for n in (6, 4, 7)]
        want = [_reference(params, cfg, p, 10) for p in prompts]
        results = [None] * len(prompts)

        def run(i):
            results[i] = engine.generate(
                _embeds(params, prompts[i]), max_new_tokens=10,
                eos_token_ids=(49999,), draft_ids=prompts[i])

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for i, t in enumerate(threads):
            t.start()
            if i == 0:
                time.sleep(0.05)
        for t in threads:
            t.join(timeout=180)
        for i, (got, exp) in enumerate(zip(results, want)):
            assert got is not None, f"request {i} timed out"
            np.testing.assert_array_equal(got, exp, err_msg=f"request {i}")
    finally:
        engine.shutdown()


def test_engine_speculative_sampled_falls_back(tiny):
    """A sampled request in the pool forces plain one-token ticks; greedy
    requests beside it still match the reference."""
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=2, max_len=128,
                         speculative=4).start()
    try:
        rng = np.random.default_rng(47)
        greedy_ids = rng.integers(0, 1000, size=(5,))
        want = _reference(params, cfg, greedy_ids, 6)
        results = {}

        def run(name, ids, temp):
            results[name] = engine.generate(
                _embeds(params, ids), max_new_tokens=6,
                eos_token_ids=(49999,), temperature=temp,
                draft_ids=ids)

        ts = [threading.Thread(target=run, args=("g", greedy_ids, 0.0)),
              threading.Thread(target=run,
                               args=("s", rng.integers(0, 1000, size=(4,)),
                                     0.9))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
        np.testing.assert_array_equal(results["g"], want)
        assert results["s"] is not None and len(results["s"]) == 6
    finally:
        engine.shutdown()


def test_engine_speculation_engages(tiny):
    """On a degenerate-repeat model, speculative ticks must emit more
    tokens than LM forwards (the stats counters prove acceptance)."""
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=1, max_len=128,
                         speculative=4).start()
    try:
        rng = np.random.default_rng(53)
        ids = rng.integers(0, 1000, size=(5,))
        got = engine.generate(_embeds(params, ids), max_new_tokens=16,
                              eos_token_ids=(49999,), draft_ids=ids)
        assert len(got) == 16
        st = engine.stats
        assert st["spec_forwards"] > 0
        assert st["tokens"] > st["decode_forwards"], st
    finally:
        engine.shutdown()


def test_multi_tick_greedy_matches_single(tiny):
    """decode_ticks=4 (multi-step scheduling): greedy outputs bit-equal to
    the single-request path across staggered concurrent slots, including a
    max_new_tokens that is not a multiple of K (trailing in-graph tokens
    must be discarded host-side)."""
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=2, max_len=256,
                         decode_ticks=4).start()
    try:
        rng = np.random.default_rng(3)
        prompts = [rng.integers(0, 1000, size=(n,)) for n in (5, 3, 6)]
        lens = [10, 7, 9]  # 7 and 9 are not multiples of 4
        want = [_reference(params, cfg, p, n)
                for p, n in zip(prompts, lens)]
        results = [None] * len(prompts)

        def run(i):
            results[i] = engine.generate(_embeds(params, prompts[i]),
                                         max_new_tokens=lens[i],
                                         eos_token_ids=(49999,))

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for i, t in enumerate(threads):
            t.start()
            if i == 0:
                time.sleep(0.05)
        for t in threads:
            t.join(timeout=180)
        for i, (got, exp) in enumerate(zip(results, want)):
            assert got is not None, f"request {i} timed out"
            np.testing.assert_array_equal(got, exp, err_msg=f"request {i}")
        # one dispatch per K forwards: forwards counted per step, but the
        # host loop ran far fewer ticks than tokens
        st = engine.stats
        assert st["decode_forwards"] % 4 == 0 or st["decode_forwards"] > 0
    finally:
        engine.shutdown()


def test_multi_tick_eos_and_kv_int8(tiny):
    """A slot hitting eos mid-multi-tick must emit exactly the reference
    tokens (in-graph continuation past eos is discarded); composed with
    the int8 KV cache."""
    cfg, params = tiny
    ids = np.random.default_rng(4).integers(0, 1000, size=(5,))
    want = _reference(params, cfg, ids, 24)
    eos = int(want[7]) if len(want) > 7 else 49999  # force an early stop
    want_eos = want[:8] if len(want) > 7 else want
    engine = BatchEngine(params, cfg, num_slots=1, max_len=256,
                         decode_ticks=5, kv_int8=True).start()
    try:
        got = engine.generate(_embeds(params, ids), max_new_tokens=24,
                              eos_token_ids=(49999, eos))
        ref = BatchEngine(params, cfg, num_slots=1, max_len=256,
                          kv_int8=True).start()
        try:
            want_int8 = ref.generate(_embeds(params, ids),
                                     max_new_tokens=24,
                                     eos_token_ids=(49999, eos))
        finally:
            ref.shutdown()
        np.testing.assert_array_equal(got, want_int8)
        if len(want) > 7:
            assert int(got[-1]) == eos and len(got) <= 8 + 1
    finally:
        engine.shutdown()


def test_engine_speculation_skips_without_lookup_hit(tiny):
    """An incompressible stream (no repeated bigram in the corpus) must
    never pay a verify forward: every tick falls back to the plain path.
    A lookup hit needs >= 4 generated tokens past a unique-bigram prompt,
    so max_new_tokens=4 guarantees zero hits even on a fixed-point model."""
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=1, max_len=128,
                         speculative=4).start()
    try:
        ids = np.arange(100, 108)  # all bigrams unique
        want = _reference(params, cfg, ids, 4)
        got = engine.generate(_embeds(params, ids), max_new_tokens=4,
                              eos_token_ids=(49999,), draft_ids=ids)
        np.testing.assert_array_equal(got, want)
        assert engine.stats["spec_forwards"] == 0, engine.stats
        assert engine.stats["decode_forwards"] == 4, engine.stats
    finally:
        engine.shutdown()


def test_engine_speculation_cooldown_on_rejection(tiny):
    """A corpus whose repeated bigram predicts the WRONG continuation
    engages speculation (lookup hits) but never accepts — the
    zero-acceptance backoff must throttle verify forwards to a minority
    of ticks while outputs stay bit-identical to plain greedy."""
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=1, max_len=256,
                         speculative=4).start()
    try:
        # (7, 8) repeats with continuations the model will not emit
        ids = np.array([7, 8, 101, 102, 7, 8, 103, 104, 7, 8])
        want = _reference(params, cfg, ids, 16)
        got = engine.generate(_embeds(params, ids), max_new_tokens=16,
                              eos_token_ids=(49999,), draft_ids=ids)
        np.testing.assert_array_equal(got, want)
        st = engine.stats
        assert st["spec_forwards"] >= 1, st           # speculation engaged
        if st["tokens"] == st["decode_forwards"]:     # nothing accepted
            # backoff kept verify forwards to a minority of ticks
            assert st["spec_forwards"] * 2 <= st["decode_forwards"], st
    finally:
        engine.shutdown()


# -- paged KV cache (block tables, oversubscription, preemption) --------------


def test_paged_greedy_matches_single(tiny):
    """Paged pool (block tables): greedy outputs bit-equal to the
    single-request path across staggered concurrent slots and slot
    recycling; every page returns to the free list at the end."""
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=2, max_len=256,
                         paged_page_size=64).start()
    try:
        rng = np.random.default_rng(21)
        prompts = [rng.integers(0, 1000, size=(n,)) for n in (5, 3, 6)]
        want = [_reference(params, cfg, p, 8) for p in prompts]
        results = [None] * len(prompts)

        def run(i):
            results[i] = engine.generate(_embeds(params, prompts[i]),
                                         max_new_tokens=8,
                                         eos_token_ids=(49999,))

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for i, t in enumerate(threads):
            t.start()
            if i == 0:
                time.sleep(0.05)
        for t in threads:
            t.join(timeout=180)
        for i, (got, exp) in enumerate(zip(results, want)):
            assert got is not None, f"request {i} timed out"
            np.testing.assert_array_equal(got, exp, err_msg=f"request {i}")
        assert len(engine._free) == engine.num_pages
    finally:
        engine.shutdown()


def test_paged_oversubscribed_pool_preempts_exact(tiny):
    """A pool smaller than the slots' combined worst case must preempt
    (recompute-style) under concurrent growth — and greedy outputs must
    still be bit-identical to uninterrupted runs."""
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=2, max_len=256,
                         paged_page_size=16, paged_pages=18).start()
    try:
        rng = np.random.default_rng(22)
        prompts = [rng.integers(0, 1000, size=(n,)) for n in (5, 3, 6)]
        # 2 slots x ceil(155/16)=10 pages = 20 > 18: preemption guaranteed
        want = [_reference(params, cfg, p, 150) for p in prompts]
        results = [None] * len(prompts)

        def run(i):
            results[i] = engine.generate(_embeds(params, prompts[i]),
                                         max_new_tokens=150,
                                         eos_token_ids=(49999,))

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i, (got, exp) in enumerate(zip(results, want)):
            assert got is not None, f"request {i} timed out"
            np.testing.assert_array_equal(got, exp, err_msg=f"request {i}")
        assert engine.stats["preemptions"] >= 1
        assert len(engine._free) == engine.num_pages
    finally:
        engine.shutdown()


def test_paged_chunked_prefill_matches_reference(tiny):
    """chunk_prefill composed with the paged pool: chunk K/V rows scatter
    to block-table positions (mid-page offsets included) and reproduce the
    one-shot greedy tokens."""
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=2, max_len=256,
                         chunk_prefill=8, paged_page_size=32).start()
    try:
        rng = np.random.default_rng(23)
        prompts = [rng.integers(0, 1000, size=(n,)) for n in (20, 25, 5)]
        want = [_reference(params, cfg, p, 8) for p in prompts]
        results = [None] * len(prompts)

        def run(i):
            results[i] = engine.generate(_embeds(params, prompts[i]),
                                         max_new_tokens=8,
                                         eos_token_ids=(49999,))

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for i, t in enumerate(threads):
            t.start()
            time.sleep(0.05)
        for t in threads:
            t.join(timeout=180)
        for i, (got, exp) in enumerate(zip(results, want)):
            assert got is not None, f"request {i} timed out"
            np.testing.assert_array_equal(got, exp, err_msg=f"request {i}")
        assert len(engine._free) == engine.num_pages
    finally:
        engine.shutdown()


@pytest.mark.parametrize("plen", [16, 11], ids=["page-aligned", "cow"])
def test_paged_prefix_sharing(tiny, plen):
    """set_prefix over the paged pool: full prefix pages are SHARED
    (every use_prefix table row aliases them — they stay allocated);
    a partial trailing page copies per request (COW) so suffix rows
    never write into shared memory. Outputs match the full prompt."""
    cfg, params = tiny
    rng = np.random.default_rng(24)
    prefix = rng.integers(0, 1000, size=(plen,))
    engine = BatchEngine(params, cfg, num_slots=2, max_len=256,
                         paged_page_size=8, paged_pages=40).start()
    try:
        engine.set_prefix(_embeds(params, prefix))
        shared = plen // 8
        assert len(engine._free) == 40 - shared
        suffixes = [rng.integers(0, 1000, size=(n,)) for n in (7, 18)]
        for suf in suffixes:
            full = np.concatenate([prefix, suf])
            want = _reference(params, cfg, full, 6)
            got = engine.generate(_embeds(params, suf), max_new_tokens=6,
                                  eos_token_ids=(49999,), use_prefix=True)
            np.testing.assert_array_equal(got, want)
        # shared pages stay held; every private page came back
        assert len(engine._free) == 40 - shared
        # non-prefix requests still run beside prefix ones
        plain = rng.integers(0, 1000, size=(5,))
        np.testing.assert_array_equal(
            engine.generate(_embeds(params, plain), max_new_tokens=6,
                            eos_token_ids=(49999,)),
            _reference(params, cfg, plain, 6))
    finally:
        engine.shutdown()


def test_paged_multi_tick_and_sampling(tiny):
    """decode_ticks=4 over the paged pool (in-graph page-boundary
    crossings find their pre-installed table entries) and the nucleus
    sampler's top_p ~ 0 argmax restriction."""
    cfg, params = tiny
    engine = BatchEngine(params, cfg, num_slots=2, max_len=256,
                         paged_page_size=16, decode_ticks=4).start()
    try:
        rng = np.random.default_rng(25)
        ids = rng.integers(0, 1000, size=(5,))
        # 21 new tokens: crosses a 16-row page boundary mid-run, and is
        # not a multiple of K=4 (trailing in-graph tokens discarded)
        want = _reference(params, cfg, ids, 21)
        got = engine.generate(_embeds(params, ids), max_new_tokens=21,
                              eos_token_ids=(49999,))
        np.testing.assert_array_equal(got, want)
        sampled = engine.generate(_embeds(params, ids), max_new_tokens=6,
                                  eos_token_ids=(49999,), temperature=0.8,
                                  top_p=1e-6)
        np.testing.assert_array_equal(sampled, want[:6])
        assert len(engine._free) == engine.num_pages
    finally:
        engine.shutdown()


def test_paged_config_validation(tiny):
    cfg, params = tiny
    with pytest.raises(ValueError, match="kv_int8"):
        BatchEngine(params, cfg, paged_page_size=16, kv_int8=True)
    with pytest.raises(ValueError, match="speculative"):
        BatchEngine(params, cfg, paged_page_size=16, speculative=4)
    with pytest.raises(ValueError, match="multiple"):
        BatchEngine(params, cfg, max_len=100, paged_page_size=16)
    with pytest.raises(ValueError, match="worst case"):
        BatchEngine(params, cfg, max_len=256, paged_page_size=16,
                    paged_pages=8)
