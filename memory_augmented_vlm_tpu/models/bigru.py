"""Bi-GRU temporal encoder — parity with the reference's dormant
`TemporalGRUEncoder` (llava/model/memory_module/bigru.py:14-75): mean-pool
each frame's patches, run a 1-layer bidirectional GRU over frames, broadcast
the per-frame context back over patches as a residual.

The GRU recurrence is a `lax.scan` with torch `nn.GRU` gate math and layout
(weight_ih rows packed [r; z; n]); parity pinned against torch in
tests/test_bigru.py. fp32 recurrence accumulation (numerics rule)."""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


def init_params(input_dim: int = 896, hidden_size: int = 448,
                key: jax.Array = None, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 8)
    bound = 1.0 / math.sqrt(hidden_size)

    def u(k, shape):
        return jax.random.uniform(k, shape, dtype, -bound, bound)

    def direction(koff):
        return {
            "wi": u(ks[koff], (input_dim, 3 * hidden_size)),
            "wh": u(ks[koff + 1], (hidden_size, 3 * hidden_size)),
            "bi": u(ks[koff + 2], (3 * hidden_size,)),
            "bh": u(ks[koff + 3], (3 * hidden_size,)),
        }

    return {"fwd": direction(0), "bwd": direction(4)}


def _gru_scan(p, xs: jax.Array, hidden_size: int) -> jax.Array:
    """xs: (T, D) -> (T, H). torch GRU cell:
    r = sig(Wir x + bir + Whr h + bhr); z = sig(...); n = tanh(Win x + bin
    + r * (Whn h + bhn)); h' = (1 - z) * n + z * h."""
    x_gates = xs.astype(jnp.float32) @ p["wi"].astype(jnp.float32) + p["bi"].astype(jnp.float32)

    def cell(h, xg):
        h_gates = h @ p["wh"].astype(jnp.float32) + p["bh"].astype(jnp.float32)
        xr, xz, xn = jnp.split(xg, 3)
        hr, hz, hn = jnp.split(h_gates, 3)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((hidden_size,), jnp.float32)
    _, out = jax.lax.scan(cell, h0, x_gates)
    return out


def forward(params, visual_feats: jax.Array) -> jax.Array:
    """(F, P, D) patch features -> (F, P, D) temporally enriched features."""
    f, p_, d = visual_feats.shape
    hidden = params["fwd"]["wh"].shape[0]
    frame_vecs = visual_feats.mean(axis=1)                   # (F, D)
    out_f = _gru_scan(params["fwd"], frame_vecs, hidden)     # (F, H)
    out_b = _gru_scan(params["bwd"], frame_vecs[::-1], hidden)[::-1]
    ctx = jnp.concatenate([out_f, out_b], axis=-1).astype(visual_feats.dtype)
    return visual_feats + ctx[:, None, :]


def convert_torch(sd: Dict) -> Dict:
    """Map torch `nn.GRU` state_dict keys (gru.weight_ih_l0[,_reverse], ...)."""
    def direction(suffix):
        return {
            "wi": jnp.asarray(sd[f"gru.weight_ih_l0{suffix}"]).T,
            "wh": jnp.asarray(sd[f"gru.weight_hh_l0{suffix}"]).T,
            "bi": jnp.asarray(sd[f"gru.bias_ih_l0{suffix}"]),
            "bh": jnp.asarray(sd[f"gru.bias_hh_l0{suffix}"]),
        }

    return {"fwd": direction(""), "bwd": direction("_reverse")}
