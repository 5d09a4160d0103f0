"""Sequence parallelism: ring attention over a 'seq' mesh axis.

The reference bounds sequence length by config (`diffuse-llm-rs/src/lib.rs:67-68`)
and has no compute-side long-context strategy (SURVEY.md §5.7 "Absent. No ring
attention, no context parallel"). This module supplies the TPU-native growth
path §5.7 names: the sequence axis sharded over the mesh, with attention
computed as a ring — K/V blocks rotate device-to-device via `ppermute` (ICI
neighbor hops) while each device accumulates an online-softmax partial for its
resident Q block. No device ever materializes the full [S, S] logits or the
full K/V, so max sequence length scales linearly with the ring size.

Diffusion denoising attends bidirectionally over the whole sequence every
step (SURVEY.md §7 "every denoise step touches the *whole* sequence"), which
makes the ring fully dense — there is no causal skip, and every hop carries
useful work.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.ops.matmul import linear


def make_seq_mesh(n_devices: int = None, axis_name: str = "seq") -> Mesh:
    """1-D mesh over the sequence axis."""
    import numpy as np
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   axis_name: str, ring_size: int) -> jax.Array:
    """Bidirectional flash attention with K/V rotating around the ring.

    q/k/v are the LOCAL sequence shards [B, S_loc, H, Hd]; the result equals
    full attention over the global sequence. Accumulation is the standard
    online softmax (running max `m`, normalizer `l`, weighted accumulator) in
    f32; each of the `ring_size` iterations processes the currently-resident
    K/V block and forwards it to the next device over ICI.
    """
    Hd = q.shape[-1]
    scale = 1.0 / math.sqrt(Hd)
    qf = q.astype(jnp.float32)
    B, S_loc, H, _ = q.shape
    acc = jnp.zeros((B, S_loc, H, Hd), jnp.float32)
    m = jnp.full((B, S_loc, H), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, S_loc, H), jnp.float32)
    perm = [(j, (j + 1) % ring_size) for j in range(ring_size)]

    # Unrolled double-buffered ring (ring_size is static, <= mesh size):
    # each hop's ppermute is issued BEFORE the resident block's attention
    # math, and the math has no data dependency on the in-flight transfer,
    # so XLA's latency-hiding scheduler overlaps the ICI hop with the
    # einsums ("collectives overlapped with compute", BASELINE.md north
    # star; VERDICT r1 item 10). The final hop is skipped entirely — the
    # rotated block would never be read.
    k_cur, v_cur = k, v
    for step in range(ring_size):
        if step + 1 < ring_size:
            k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        logits = jnp.einsum("bshd,bthd->bsht", qf,
                            k_cur.astype(jnp.float32),
                            preferred_element_type=jnp.float32) * scale
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bsht,bthd->bshd", p, v_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        m = m_new
        if step + 1 < ring_size:
            k_cur, v_cur = k_nxt, v_nxt
    return (acc / l[..., None]).astype(q.dtype)


def sp_denoiser_forward(params: Any, cfg: DiffusionConfig, x: jax.Array,
                        t: jax.Array, axis_name: str,
                        ring_size: int) -> jax.Array:
    """Denoiser forward on a LOCAL sequence shard x [B, S_loc, D].

    Weights are replicated; every op except attention is per-token, so only
    attention needs the ring. Positional embeddings are sliced by ring index
    so each shard sees its global positions.
    """
    B, S_loc, D = x.shape
    H = cfg.num_attention_heads
    dtype = x.dtype

    idx = jax.lax.axis_index(axis_name)
    pos = jax.lax.dynamic_slice_in_dim(params["pos_embed"], idx * S_loc,
                                       S_loc, 0)
    temb = dn.timestep_embedding(t, D)
    tm = params["time_mlp"]
    temb = linear(linear(temb.astype(dtype), tm["w1"], tm["b1"],
                         activation="gelu"), tm["w2"], tm["b2"])
    h = x + pos.astype(dtype)[None] + temb[:, None, :]

    for blk in params["blocks"]:
        hn = dn.layer_norm(h, blk["ln1"])
        a = blk["attn"]
        qkv = linear(hn, a["wqkv"])
        q = dn._split_heads(qkv[..., :D], H)
        k = dn._split_heads(qkv[..., D:2 * D], H)
        v = dn._split_heads(qkv[..., 2 * D:], H)
        attn_out = ring_attention(q, k, v, axis_name, ring_size)
        h = h + linear(attn_out.reshape(B, S_loc, D), a["wo"])

        hn = dn.layer_norm(h, blk["ln2"])
        mlp = blk["mlp"]
        h = h + linear(linear(hn, mlp["w1"], mlp["b1"], activation="gelu"),
                       mlp["w2"], mlp["b2"])

    h = dn.layer_norm(h, params["ln_f"])
    return linear(h, params["head"]["w"])


def make_sp_forward(cfg: DiffusionConfig, mesh: Mesh,
                    axis_name: str = "seq"):
    """Jitted shard_map denoiser forward with x sharded on the sequence axis.

    Params replicated, x [B, S, D] sharded on axis 1, t replicated; output
    sharded like x. S must divide evenly by the ring size.
    """
    ring = mesh.shape[axis_name]
    # shard_map + jit built ONCE here (not per call): the diffusion loop calls
    # the forward every denoise step, and a fresh jit wrapper per call would
    # retrace/relower every step (TPU compiles run 20-280s).
    jitted: dict = {}

    def run(params, x, t):
        if x.shape[1] % ring:
            raise ValueError(f"seq len {x.shape[1]} not divisible by "
                             f"ring size {ring}")
        if x.shape[1] > cfg.max_sequence_length:
            # same guard as the dense denoiser_forward: beyond max_seq the
            # pos_embed dynamic_slice would clamp and silently reuse the tail
            # positional rows on upper ring shards
            raise ValueError(
                f"sequence length {x.shape[1]} exceeds max_sequence_length "
                f"{cfg.max_sequence_length}")
        if "f" not in jitted:
            jitted["f"] = jax.jit(shard_map(
                lambda p, xx, tt: sp_denoiser_forward(p, cfg, xx, tt,
                                                      axis_name, ring),
                mesh=mesh,
                in_specs=(jax.tree_util.tree_map(lambda _: P(), params),
                          P(None, axis_name, None), P()),
                out_specs=P(None, axis_name, None),
                check_vma=False))
        return jitted["f"](params, x, t)

    return run
