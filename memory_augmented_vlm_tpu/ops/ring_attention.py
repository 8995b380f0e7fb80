"""Ring attention — sequence/context parallelism for long-video prefill.

Beyond-reference capability (the reference is DP-only, SURVEY.md §2.8): the
fused video+text stream of a 128-frame clip is ~19k tokens, and prefill
attention is quadratic in it. Sharding the *sequence* axis over an `sp` mesh
axis splits that cost P ways: each device holds S/P query rows and its K/V
chunk, and the K/V chunks rotate around the ring via `lax.ppermute` (one
ICI hop per step — the canonical TPU ring schedule), merging each chunk's
partial attention with streaming-softmax statistics exactly like flash
attention does across its KV tiles.

Works under `jax.shard_map` (`ring_attention` builds the shard_map; callers
inside a `jax.set_mesh` context just call it like `flash_attention`). The
whole thing is plain jnp + ppermute, so JAX autodiff differentiates it (the
transpose of ppermute is the reverse rotation) — it serves training as well
as inference. Numerics: fp32 softmax statistics and fp32 output
accumulation regardless of input dtype (repo-wide rule), masks as finite
NEG_INF logits.

The per-chunk attention is the XLA einsum path; on real multi-chip TPU the
chunk matmuls are MXU-friendly (block = S/P) and XLA overlaps the ppermute
with compute. A Pallas per-chunk kernel can slot in later without changing
the ring schedule.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

NEG_INF = -1e30


def _ring_shard(q, k, v, kv_valid, *, axis_name: str, causal: bool,
                scale: Optional[float]):
    """Per-shard body: q/k/v are (B, S/P, H, D) local shards; kv_valid is the
    GLOBAL valid length (B,) replicated over the ring."""
    nring = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, sl, h, d = q.shape
    s = scale if scale is not None else d**-0.5
    qpos = idx * sl + jnp.arange(sl)
    perm = [(i, (i + 1) % nring) for i in range(nring)]

    def step(carry, t):
        o, m, l, kc, vc = carry
        # after t forward rotations, this device holds the chunk that
        # originated on ring position (idx - t) mod P
        src = (idx - t) % nring
        kpos = src * sl + jnp.arange(sl)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, kc, preferred_element_type=jnp.float32
        ).astype(jnp.float32) * s
        ok = kpos[None, None, None, :] < kv_valid[:, None, None, None]
        if causal:
            ok = ok & (kpos[None, :] <= qpos[:, None])[None, None]
        logits = jnp.where(ok, logits, NEG_INF)
        m_c = logits.max(axis=-1)                      # (B, H, Sq)
        m_new = jnp.maximum(m, m_c)
        # explicit zeroing: when every entry seen so far is masked, m_new
        # stays at NEG_INF and exp(logits - m_new) would be 1, not 0
        p = jnp.where(ok, jnp.exp(logits - m_new[..., None]), 0.0)
        alpha = jnp.exp(m - m_new)                     # (B, H, Sq)
        l_new = l * alpha + p.sum(axis=-1)
        o_c = jnp.einsum("bhqk,bkhd->bqhd", p.astype(vc.dtype), vc)
        o_new = o * alpha.transpose(0, 2, 1)[..., None] + o_c.astype(jnp.float32)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (o_new, m_new, l_new, kc, vc), None

    o0 = jnp.zeros((b, sl, h, d), jnp.float32)
    m0 = jnp.full((b, h, sl), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, sl), jnp.float32)
    (o, _, l, _, _), _ = jax.lax.scan(
        step, (o0, m0, l0, k, v), jnp.arange(nring))
    return (o / jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]).astype(
        q.dtype)


def sp_size(mesh=None) -> int:
    """Size of the ambient mesh's `sp` axis (1 when absent / no mesh)."""
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty:
        return 1
    return dict(mesh.shape).get("sp", 1)


def _group(mesh, names: Tuple[str, ...], dim: int):
    """The subset of `names` present in the mesh whose product divides dim
    (used to shard batch/head dims only when legal)."""
    have = [n for n in names if n in mesh.axis_names]
    size = 1
    for n in have:
        size *= dict(mesh.shape)[n]
    if have and dim % size == 0:
        return tuple(have)
    return None


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_valid_len: Optional[jax.Array] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    axis_name: str = "sp",
) -> jax.Array:
    """Sequence-parallel attention over the ambient mesh's `sp` axis.

    q, k, v: (B, S, H, D) full (logical) arrays — same H (repeat GQA first)
    and same S. The wrapper pads S to a multiple of the ring size, shard_maps
    the ring body (batch over data/fsdp, sequence over sp, heads over tp when
    divisible), and slices the pad rows back off. Falls back to the caller's
    responsibility when no `sp` axis exists (check `sp_size()` first).
    """
    mesh = jax.sharding.get_abstract_mesh()
    nring = sp_size(mesh)
    if nring <= 1:
        raise ValueError("ring_attention requires an ambient mesh with sp>1")
    b, s0, h, d = q.shape
    if kv_valid_len is None:
        kv_valid_len = jnp.full((b,), s0, jnp.int32)
    pad = (-s0) % nring
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        # pad keys sit at positions >= s0 >= kv_valid_len -> already masked

    batch_axes = _group(mesh, ("data", "fsdp"), b)
    head_axes = _group(mesh, ("tp",), h)
    spec = P(batch_axes, axis_name, head_axes, None)
    vspec = P(batch_axes)

    out = jax.shard_map(
        lambda q_, k_, v_, vl_: _ring_shard(
            q_, k_, v_, vl_, axis_name=axis_name, causal=causal, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec, vspec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, kv_valid_len)
    if pad:
        # the sliced length no longer divides the sp axis; pin a nameable
        # sharding (GSPMD otherwise picks a partial tiling that cannot be
        # expressed as a NamedSharding over this mesh and jit output
        # conversion fails)
        out = jax.lax.with_sharding_constraint(
            out[:, :s0], P(batch_axes, None, head_axes, None))
    return out
