"""Pipeline parallelism: GPipe-style stage loop over a 'stage' mesh axis.

The reference's per-layer `SyncPoint {layer_id, requires_grad}` markers
(`diffuse-llm-rs/src/lib.rs:440-445`) sketch layer-boundary synchronization
with no transport behind them (SURVEY.md §2.1: pipeline parallel "absent").
This module realizes that intent TPU-natively: transformer blocks are split
into contiguous stages, each stage's parameters live on one ring position,
and microbatch activations flow stage-to-stage via `ppermute` (one ICI
neighbor hop per pipeline tick) inside a single `lax.fori_loop` — fully
static shapes, one compiled SPMD program, no per-stage processes.

Schedule: plain GPipe. With M microbatches and K stages the loop runs
M + K - 1 ticks; stage s works on microbatch (tick - s) when that index is
valid and idles (masked, result discarded) in the bubble. Embedding/timestep
injection happens before the pipeline and the final LN/head after it, both
replicated — only the block stack is staged.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.ops.matmul import linear


def make_stage_mesh(n_stages: int = None, axis_name: str = "stage") -> Mesh:
    """1-D mesh over pipeline stages."""
    import numpy as np
    devices = jax.devices()
    n = n_stages or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def stack_stage_params(params: Any, n_stages: int):
    """Split `params['blocks']` into n_stages contiguous groups and stack
    each leaf with a leading stage axis (shard it over 'stage')."""
    blocks = params["blocks"]
    L = len(blocks)
    if L % n_stages:
        raise ValueError(f"{L} blocks not divisible by {n_stages} stages")
    per = L // n_stages
    groups: List[Any] = [blocks[s * per:(s + 1) * per]
                         for s in range(n_stages)]
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *groups)


def place_stage_params(stacked, mesh: Mesh, axis_name: str = "stage"):
    """Device-put the stacked stage params with the stage axis sharded."""
    def put(leaf):
        spec = P(axis_name, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, stacked)


def _apply_blocks(blocks_local, cfg: DiffusionConfig, h: jax.Array):
    """Run this stage's block group. blocks_local is a list (len = blocks
    per stage) of block dicts whose leaves carry a leading size-1 stage axis
    from shard_map; index it off."""
    B, S, D = h.shape
    H = cfg.num_attention_heads
    for blk in blocks_local:
        blk = jax.tree_util.tree_map(lambda l: l[0], blk)
        hn = dn.layer_norm(h, blk["ln1"])
        a = blk["attn"]
        qkv = linear(hn, a["wqkv"])
        q = dn._split_heads(qkv[..., :D], H)
        k = dn._split_heads(qkv[..., D:2 * D], H)
        v = dn._split_heads(qkv[..., 2 * D:], H)
        attn_out = dn.attention(q, k, v)
        h = h + linear(attn_out.reshape(B, S, D), a["wo"])
        hn = dn.layer_norm(h, blk["ln2"])
        m = blk["mlp"]
        h = h + linear(linear(hn, m["w1"], m["b1"], activation="gelu"),
                       m["w2"], m["b2"])
    return h


def pipeline_blocks(stage_blocks, cfg: DiffusionConfig, h_micro: jax.Array,
                    axis_name: str, n_stages: int) -> jax.Array:
    """GPipe loop body (runs inside shard_map on every stage device).

    h_micro: [n_micro, Bm, S, D] post-embedding activations, replicated.
    Returns the fully-processed microbatches, replicated (psum-broadcast
    from the last stage).
    """
    stage = jax.lax.axis_index(axis_name)
    n_micro = h_micro.shape[0]
    ticks = n_micro + n_stages - 1
    state = jnp.zeros_like(h_micro[0])
    outputs = jnp.zeros_like(h_micro)
    perm = [(j, (j + 1) % n_stages) for j in range(n_stages)]

    def tick(t, carry):
        state, outputs = carry
        # stage 0 ingests microbatch t
        inject = h_micro[jnp.clip(t, 0, n_micro - 1)]
        state = jnp.where((stage == 0) & (t < n_micro), inject, state)
        worked = _apply_blocks(stage_blocks, cfg, state)
        mb = t - stage  # microbatch this stage holds at tick t
        valid = (mb >= 0) & (mb < n_micro)
        worked = jnp.where(valid, worked, state)
        # last stage emits its finished microbatch
        done = (stage == n_stages - 1) & valid
        slot = jnp.clip(mb, 0, n_micro - 1)
        outputs = jnp.where(
            done, outputs.at[slot].set(worked), outputs)
        # one ICI hop: every stage forwards to its successor
        state = jax.lax.ppermute(worked, axis_name, perm)
        return state, outputs

    _, outputs = jax.lax.fori_loop(0, ticks, tick, (state, outputs))
    # results live on the last stage only; broadcast to all ring positions
    return jax.lax.psum(
        jnp.where(stage == n_stages - 1, outputs, jnp.zeros_like(outputs)),
        axis_name)


def make_pp_forward(cfg: DiffusionConfig, mesh: Mesh, n_micro: int,
                    axis_name: str = "stage"):
    """Jitted pipeline-parallel denoiser forward.

    Takes the FULL param tree (embeddings/head replicated) plus stacked stage
    blocks from `stack_stage_params`. Batch B is split into `n_micro`
    microbatches; B % n_micro must be 0.
    """
    n_stages = mesh.shape[axis_name]

    def fwd(stage_blocks_loc, params_rep, xx, tt):
        B, S, D = xx.shape  # replicated inputs: global shapes
        Bm = B // n_micro
        dtype = xx.dtype
        temb = dn.timestep_embedding(tt, D)
        tm = params_rep["time_mlp"]
        temb = linear(linear(temb.astype(dtype), tm["w1"], tm["b1"],
                             activation="gelu"), tm["w2"], tm["b2"])
        h = xx + params_rep["pos_embed"][:S].astype(dtype)[None] \
            + temb[:, None, :]
        h_micro = h.reshape(n_micro, Bm, S, D)
        out = pipeline_blocks(stage_blocks_loc, cfg, h_micro,
                              axis_name, n_stages)
        h = out.reshape(B, S, D)
        h = dn.layer_norm(h, params_rep["ln_f"])
        return linear(h, params_rep["head"]["w"])

    # shard_map + jit built once (keyed on tree structure), not per call —
    # the sampler calls the forward every denoise step and a fresh jit
    # wrapper each time would retrace/relower every step.
    jitted: dict = {}

    def run(params, stage_blocks, x, t):
        B = x.shape[0]
        if B % n_micro:
            raise ValueError(f"batch {B} not divisible by {n_micro}")
        lead = jax.tree_util.tree_leaves(stage_blocks)[0].shape[0]
        if lead != n_stages:
            raise ValueError(
                f"stage_blocks stacked for {lead} stages but mesh "
                f"'{axis_name}' has {n_stages} devices")
        # blocks travel via stage_blocks; don't also replicate them
        params = {k: v for k, v in params.items() if k != "blocks"}
        key = (jax.tree_util.tree_structure(stage_blocks),
               jax.tree_util.tree_structure(params),
               tuple(l.ndim for l in jax.tree_util.tree_leaves(stage_blocks)))
        if key not in jitted:
            bspecs = jax.tree_util.tree_map(
                lambda l: P(axis_name, *([None] * (l.ndim - 1))),
                stage_blocks)
            pspecs = jax.tree_util.tree_map(lambda _: P(), params)
            jitted[key] = jax.jit(shard_map(
                fwd, mesh=mesh, in_specs=(bspecs, pspecs, P(), P()),
                out_specs=P(), check_vma=False))
        return jitted[key](stage_blocks, params, x, t)

    return run
