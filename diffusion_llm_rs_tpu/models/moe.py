"""Mixture-of-experts denoiser variant + expert-parallel sharding.

The reference has no MoE (SURVEY.md §2.1: expert parallel "absent"); this
supplies the expert-parallel growth path in the TPU idiom. The MLP of each
transformer block is replaced by a top-1-routed expert bank (GShard-style
dense dispatch): tokens are routed by a learned router, packed into per-expert
capacity-bounded slots with one-hot dispatch tensors, processed by batched
expert matmuls [E, C, ·] — which XLA maps straight onto the MXU — and combined
back weighted by the router gate. Everything is static-shaped; tokens
overflowing an expert's capacity fall through the residual (standard GShard
drop policy).

Expert parallelism = shard the leading E axis of the expert weights and the
dispatched [E, C, D] activations over an 'expert' mesh axis; GSPMD inserts
the all_to_all pair around the expert matmuls. `place_ep_params` +
`make_ep_forward` wire that up.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.ops.matmul import linear

Params = Dict[str, Any]


def init_moe_denoiser_params(key: jax.Array, cfg: DiffusionConfig,
                             num_experts: int) -> Params:
    """Denoiser params with each block's MLP replaced by an expert bank."""
    params = dn.init_denoiser_params(key, cfg)
    D = cfg.hidden_size
    M = cfg.mlp_ratio * D
    out_scale = 0.02 / math.sqrt(2 * cfg.num_layers)
    for i, blk in enumerate(params["blocks"]):
        bk = jax.random.split(jax.random.fold_in(key, 1000 + i), 3)
        blk.pop("mlp")
        blk["moe"] = {
            "router": jax.random.normal(bk[0], (D, num_experts)) * 0.02,
            "w1": jax.random.normal(bk[1], (num_experts, D, M)) * 0.02,
            "b1": jnp.zeros((num_experts, M)),
            "w2": jax.random.normal(bk[2], (num_experts, M, D)) * out_scale,
            "b2": jnp.zeros((num_experts, D)),
        }
    return params


def load_balancing_loss(gates: jax.Array, expert: jax.Array) -> jax.Array:
    """GShard/Switch auxiliary load-balancing loss: E * sum_e f_e * P_e,
    where f_e is the fraction of tokens dispatched to expert e and P_e the
    mean router probability of e. Minimized (=1) at a uniform assignment.
    Add `aux_weight * load_balancing_loss(...)` to the training objective if
    this MoE is ever trained — without it top-1 routing can collapse onto a
    few experts. Inference (this repo's use) is unaffected by collapse risk.
    """
    E = gates.shape[-1]
    frac = jnp.mean(jax.nn.one_hot(expert, E, dtype=jnp.float32), axis=0)
    prob = jnp.mean(gates, axis=0)
    return E * jnp.sum(frac * prob)


def moe_mlp(p: Params, h: jax.Array, capacity_factor: float = 1.25,
            ep_axis: str = None, mesh: Mesh = None,
            return_aux: bool = False, dispatch: str = "auto") -> jax.Array:
    """Top-1 routed expert MLP. h [B, S, D]. SURVEY.md §2.1 EP row.

    Two dispatch strategies with IDENTICAL semantics (first-come-first-kept
    GShard drop policy; parity pinned in tests):
      - "dense": GShard one-hot dispatch tensor [T, E, C] — two extra
        einsums, O(T * E*C * D) work; fine at serving batch sizes and very
        MXU-friendly, but E*C ≈ capacity_factor*T makes it O(T^2 D).
      - "sorted": ragged dispatch — stable-sort tokens by expert, compute
        within-expert positions from segment offsets, scatter kept rows into
        the [E*C, D] slot buffer and gather back. O(T log T + T D): the
        scaling path for large T or many experts.
    "auto" picks sorted once the dense dispatch tensor would outweigh the
    token activations by 8x (E*C > 8*D).

    With return_aux=True, also returns `load_balancing_loss` (add to the
    training objective — top-1 routing collapses without it).
    """
    B, S, D = h.shape
    E = p["router"].shape[1]
    T = B * S
    C = max(1, int(math.ceil(capacity_factor * T / E)))
    dtype = h.dtype
    x = h.reshape(T, D)

    logits = x.astype(jnp.float32) @ p["router"].astype(jnp.float32)
    gates = jax.nn.softmax(logits, axis=-1)          # [T, E]
    expert = jnp.argmax(gates, axis=-1)              # [T]
    gate = jnp.max(gates, axis=-1)                   # [T]

    if dispatch == "auto":
        dispatch = "sorted" if E * C > 8 * D else "dense"

    if dispatch == "sorted":
        # ragged dispatch: stable sort keeps the first-come-first-kept drop
        # order identical to the dense path
        order = jnp.argsort(expert, stable=True)               # [T]
        sorted_e = expert[order]
        counts = jnp.sum(jax.nn.one_hot(expert, E, dtype=jnp.int32), axis=0)
        offsets = jnp.cumsum(counts) - counts                  # [E] exclusive
        seg_pos = jnp.arange(T, dtype=jnp.int32) - offsets[sorted_e]
        kept = seg_pos < C
        # dropped tokens scatter to a trash row E*C
        dest = jnp.where(kept, sorted_e * C + jnp.minimum(seg_pos, C - 1),
                         E * C)
        xe_flat = jnp.zeros((E * C + 1, D), jnp.float32)
        xe_flat = xe_flat.at[dest].set(x[order].astype(jnp.float32))
        xe = xe_flat[:-1].reshape(E, C, D)
    else:
        onehot = jax.nn.one_hot(expert, E, dtype=jnp.float32)   # [T, E]
        pos = jnp.cumsum(onehot, axis=0) - 1.0                  # slot/expert
        keep = (pos < C) * onehot                               # [T, E]
        slot = jnp.clip(jnp.sum(pos * onehot, axis=-1), 0,
                        C - 1).astype(jnp.int32)
        # dispatch tensor [T, E, C]: token t -> (its expert, its slot)
        de = keep[:, :, None] * jax.nn.one_hot(
            slot, C, dtype=jnp.float32)[:, None, :]
        xe = jnp.einsum("tec,td->ecd", de, x.astype(jnp.float32))

    if ep_axis is not None:
        xe = jax.lax.with_sharding_constraint(
            xe, NamedSharding(mesh, P(ep_axis, None, None)))
    he = jax.nn.gelu(jnp.einsum("ecd,edm->ecm", xe,
                                p["w1"].astype(jnp.float32))
                     + p["b1"][:, None, :].astype(jnp.float32))
    ye = jnp.einsum("ecm,emd->ecd", he, p["w2"].astype(jnp.float32)) \
        + p["b2"][:, None, :].astype(jnp.float32)
    if ep_axis is not None:
        ye = jax.lax.with_sharding_constraint(
            ye, NamedSharding(mesh, P(ep_axis, None, None)))

    if dispatch == "sorted":
        ye_flat = jnp.concatenate(
            [ye.reshape(E * C, D), jnp.zeros((1, D), jnp.float32)])
        y_sorted = ye_flat[dest]                              # [T, D]
        inv = jnp.argsort(order, stable=True)
        y = y_sorted[inv] * gate[:, None]
    else:
        y = jnp.einsum("tec,ecd->td", de, ye) * gate[:, None]
    out = y.reshape(B, S, D).astype(dtype)
    if return_aux:
        return out, load_balancing_loss(gates, expert)
    return out


def moe_denoiser_forward(params: Params, cfg: DiffusionConfig, x: jax.Array,
                         t: jax.Array, capacity_factor: float = 1.25,
                         ep_axis: str = None, mesh: Mesh = None) -> jax.Array:
    """Transformer denoiser forward with MoE MLPs. Mirrors
    `denoiser.denoiser_forward` (dense attention, pre-LN, eps head)."""
    B, S, D = x.shape
    H = cfg.num_attention_heads
    dtype = x.dtype

    temb = dn.timestep_embedding(t, D)
    tm = params["time_mlp"]
    temb = linear(linear(temb.astype(dtype), tm["w1"], tm["b1"],
                         activation="gelu"), tm["w2"], tm["b2"])
    h = x + params["pos_embed"][:S].astype(dtype)[None] + temb[:, None, :]

    for blk in params["blocks"]:
        hn = dn.layer_norm(h, blk["ln1"])
        a = blk["attn"]
        qkv = linear(hn, a["wqkv"])
        q = dn._split_heads(qkv[..., :D], H)
        k = dn._split_heads(qkv[..., D:2 * D], H)
        v = dn._split_heads(qkv[..., 2 * D:], H)
        attn_out = dn.attention(q, k, v)
        h = h + linear(attn_out.reshape(B, S, D), a["wo"])

        hn = dn.layer_norm(h, blk["ln2"])
        h = h + moe_mlp(blk["moe"], hn, capacity_factor, ep_axis, mesh)

    h = dn.layer_norm(h, params["ln_f"])
    return linear(h, params["head"]["w"])


def make_expert_mesh(n_devices: int = None, axis_name: str = "expert") -> Mesh:
    import numpy as np
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def place_ep_params(params: Params, mesh: Mesh,
                    axis_name: str = "expert") -> Params:
    """Shard expert banks over 'expert'; everything else replicated."""
    moe_keys = {"w1", "b1", "w2", "b2"}

    def place(path, leaf):
        names = [str(getattr(pp, "key", getattr(pp, "idx", pp)))
                 for pp in path]
        if not hasattr(leaf, "ndim"):
            return leaf
        if "moe" in names and names[-1] in moe_keys:
            spec = P(axis_name, *([None] * (leaf.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def make_ep_forward(cfg: DiffusionConfig, mesh: Mesh,
                    axis_name: str = "expert",
                    capacity_factor: float = 1.25):
    """Jitted expert-parallel MoE forward: GSPMD emits the all_to_all pair
    around the sharded expert matmuls from the [E, C, D] constraints."""

    @jax.jit
    def run(params, x, t):
        with mesh:
            return moe_denoiser_forward(params, cfg, x, t, capacity_factor,
                                        ep_axis=axis_name, mesh=mesh)

    return run
