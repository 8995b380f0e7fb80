"""Pipeline parallelism — a GPipe-schedule pipelined layer scan over a `pp`
mesh axis.

Beyond-reference capability (the reference is DP-only, SURVEY.md §2.8),
completing the dp/fsdp/tp/sp/ep axis set: the stacked LM layer pytree
(L, ...) shards over `pp` on its layer axis, so each device holds L/P
contiguous layers (one *stage*). The batch splits into M microbatches that
stream through the stages; activations hop stage-to-stage with
`lax.ppermute` (one ICI hop, the canonical TPU pipeline transport), and the
last stage's outputs reassemble with a masked `psum`.

Schedule: plain GPipe fill-and-drain — T = M + P - 1 steps, bubble fraction
(P-1)/T. 1F1B / circular schedules are possible refinements on the same
transport. The whole loop is jnp + ppermute inside one `lax.scan`, so JAX
autodiff derives the reverse (backward) pipeline automatically — the
transpose of the forward ppermute is exactly the backward hop.

Within a stage the layer compute is the ordinary unsharded code; fsdp/tp
mesh axes are gathered at the shard_map boundary (pp composes with data
parallelism here — in-stage tensor parallelism would need manual-collective
layers, out of scope).

Correctness of the bubble: stages compute on zero-filled activations at
fill/drain steps; those chains only feed outputs the collection mask zeroes,
so both the values and (by zero cotangents) the gradients of garbage steps
vanish. Zero activations are NaN-safe through LN/attention/MLP (LN(0)=0,
fully-masked softmax is uniform, not NaN).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from memory_augmented_vlm_tpu.ops.ring_attention import _group


def pp_size(mesh=None) -> int:
    """Size of the ambient mesh's `pp` axis (1 when absent / no mesh)."""
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty:
        return 1
    return dict(mesh.shape).get("pp", 1)


def _leaf_spec(leaf, first) -> P:
    return P(*((first,) + (None,) * (leaf.ndim - 1)))


def _local_batch(mesh, b: int) -> int:
    """Per-shard batch after data/fsdp sharding (what microbatches divide)."""
    axes = _group(mesh, ("data", "fsdp"), b)
    size = 1
    for n in axes or ():
        size *= dict(mesh.shape)[n]
    return b // size


def pp_viable(b: int, nlayers: int, num_microbatches: Optional[int] = None,
              mesh=None) -> bool:
    """Whether pipeline_scan can run for this batch/layer geometry on the
    ambient mesh (callers fall back to the plain scan otherwise)."""
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
    nstages = pp_size(mesh)
    if nstages <= 1:
        return False
    m = num_microbatches or nstages
    return nlayers % nstages == 0 and _local_batch(mesh, b) % m == 0


def pipeline_scan(
    body: Callable[[Any, Any], Tuple[Any, Any]],
    payload: Any,
    layers: Any,
    *,
    num_microbatches: Optional[int] = None,
    axis_name: str = "pp",
) -> Any:
    """Run `lax.scan(body, payload, layers)` pipelined over the `pp` axis.

    body: (payload, layer_params) -> (payload, aux). aux is DISCARDED (the
      pipeline serves the training/loss path; per-layer caches stay on the
      plain scan).
    payload: pytree whose every leaf has a leading batch axis (the hidden
      states plus anything per-batch the body needs — rope tables, valid
      lengths). Only the payload flows through the ring; layer params stay
      put.
    layers: stacked pytree (L, ...); L must divide the pp size.

    Returns the final payload, identical (up to fp reassociation) to the
    plain scan's.
    """
    mesh = jax.sharding.get_abstract_mesh()
    nstages = pp_size(mesh)
    if nstages <= 1:
        raise ValueError("pipeline_scan requires an ambient mesh with pp>1")
    leaves = jax.tree.leaves(payload)
    b = leaves[0].shape[0]
    nlayers = jax.tree.leaves(layers)[0].shape[0]
    if nlayers % nstages != 0:
        raise ValueError(f"{nlayers} layers do not divide {nstages} stages")
    m = num_microbatches or nstages
    if _local_batch(mesh, b) % m != 0:
        raise ValueError(
            f"local batch {_local_batch(mesh, b)} (global {b} over the "
            f"data/fsdp shards) does not divide {m} microbatches")

    batch_axes = _group(mesh, ("data", "fsdp"), b)
    pay_specs = jax.tree.map(lambda x: _leaf_spec(x, batch_axes), payload)
    layer_specs = jax.tree.map(lambda x: _leaf_spec(x, axis_name), layers)

    def _pipe(pay, layers_loc):
        b_loc = jax.tree.leaves(pay)[0].shape[0]
        mb = b_loc // m
        mbs = jax.tree.map(
            lambda x: x.reshape((m, mb) + x.shape[1:]), pay)
        idx = jax.lax.axis_index(axis_name)
        nsteps = m + nstages - 1
        perm = [(i, i + 1) for i in range(nstages - 1)]  # no wraparound:
        # stage 0 reads fresh microbatches, drained outputs exit at the end

        init_act = jax.tree.map(lambda x: jnp.zeros_like(x[0]), mbs)
        init_out = jax.tree.map(jnp.zeros_like, mbs)

        def step(carry, t):
            act, out = carry
            take = jnp.clip(t, 0, m - 1)
            mb_t = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, take, 0, keepdims=False), mbs)
            x = jax.tree.map(
                lambda a, c: jnp.where(idx == 0, a, c), mb_t, act)
            y, _ = jax.lax.scan(body, x, layers_loc)
            tout = t - (nstages - 1)
            valid = (idx == nstages - 1) & (tout >= 0)
            # masked write: non-final stages and fill steps write zeros into
            # slot 0, all strictly before the real slot-0 write lands
            out = jax.tree.map(
                lambda o, v: jax.lax.dynamic_update_index_in_dim(
                    o, jnp.where(valid, v, 0), jnp.clip(tout, 0, m - 1), 0),
                out, y)
            act = jax.tree.map(
                lambda v: jax.lax.ppermute(v, axis_name, perm), y)
            return (act, out), None

        (_, out), _ = jax.lax.scan(
            step, (init_act, init_out), jnp.arange(nsteps))
        # only the last stage holds real outputs; sum-broadcast them to all
        # stages so the surrounding (replicated-over-pp) code continues
        out = jax.tree.map(lambda x: jax.lax.psum(x, axis_name), out)
        return jax.tree.map(
            lambda x: x.reshape((b_loc,) + x.shape[2:]), out)

    return jax.shard_map(
        _pipe,
        mesh=mesh,
        in_specs=(pay_specs, layer_specs),
        out_specs=pay_specs,
        check_vma=False,
    )(payload, layers)
