"""Denoiser models: transformer denoiser + tiny linear model for tests.

TPU-native analogue of the reference's `DiffusionModel` trait and its
implementations (`diffuse-llm-rs/src/lib.rs:748-836`): models are (init, apply)
pure-function pairs over parameter pytrees, so quantized weights
(`quant.QuantizedTensor` leaves) flow through `ops.matmul.linear` dispatch
unchanged, and the whole forward jits/shards under GSPMD.

The reference's cached-inference protocol is three calls per step
(`update_kv_cache` -> `forward_with_cache` -> `cache.update`,
`diffuse-llm-rs/src/lib.rs:907-918`), which runs the K/V projections twice. We
fuse it: one forward pass that *attends over* the (dequantized) cached K/V from
the previous denoise step and *returns* this step's fresh K/V for the cache —
identical semantics, half the projection work.

Shapes: x [B, S, D] continuous token embeddings; t [B] per-sample timesteps
(the reference's `t: Array1<usize>`, `lib.rs:619`); cached K/V [L, B, S, H, Hd].

Architecture (GPT-2-shaped per the reference defaults, `lib.rs:476-493`):
pre-LN bidirectional transformer (denoising attends to the full sequence — no
causal mask), sinusoidal timestep embedding through a 2-layer MLP added to every
position, learned positional embeddings, GELU MLP, weight-tied logits head.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.ops.matmul import linear

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Simple linear denoiser (reference `SimpleDiffusionModel`, lib.rs:775-836)
# ---------------------------------------------------------------------------


def init_simple_denoiser(key: jax.Array, input_dim: int,
                         output_dim: Optional[int] = None) -> Params:
    output_dim = output_dim or input_dim
    w = jax.random.normal(key, (input_dim, output_dim), jnp.float32) * 0.02
    return {"w": w, "b": jnp.zeros((output_dim,), jnp.float32)}


def simple_denoiser_forward(params: Params, x: jax.Array,
                            t: jax.Array) -> jax.Array:
    """y = x @ W + b; timestep ignored (`lib.rs:806-813`)."""
    del t
    return linear(x, params["w"], params["b"])


# ---------------------------------------------------------------------------
# Transformer denoiser
# ---------------------------------------------------------------------------


def timestep_embedding(t: jax.Array, dim: int,
                       max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep features [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _init_linear(key, d_in, d_out, scale=0.02):
    return jax.random.normal(key, (d_in, d_out), jnp.float32) * scale


def init_denoiser_params(key: jax.Array, cfg: DiffusionConfig) -> Params:
    D = cfg.hidden_size
    keys = jax.random.split(key, 8 + cfg.num_layers)
    out_scale = 0.02 / math.sqrt(2 * cfg.num_layers)

    params: Params = {
        "tok_embed": jax.random.normal(keys[0], (cfg.vocab_size, D)) * 0.02,
        "pos_embed": jax.random.normal(keys[1], (cfg.max_sequence_length, D)) * 0.01,
        "time_mlp": {
            "w1": _init_linear(keys[2], D, 4 * D),
            "b1": jnp.zeros((4 * D,)),
            "w2": _init_linear(keys[3], 4 * D, D),
            "b2": jnp.zeros((D,)),
        },
        "ln_f": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "head": {"w": _init_linear(keys[4], D, D)},  # eps-prediction head
        "blocks": [],
    }
    M = cfg.mlp_ratio * D
    for i in range(cfg.num_layers):
        bk = jax.random.split(keys[8 + i], 6)
        params["blocks"].append({
            "ln1": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
            "attn": {
                # fused QKV: one [D, 3D] matmul per block instead of three —
                # fewer kernel launches, larger MXU tiles
                "wqkv": _init_linear(bk[0], D, 3 * D),
                "wo": _init_linear(bk[3], D, D, scale=out_scale),
            },
            "ln2": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
            "mlp": {
                "w1": _init_linear(bk[4], D, M),
                "b1": jnp.zeros((M,)),
                "w2": _init_linear(bk[5], M, D, scale=out_scale),
                "b2": jnp.zeros((D,)),
            },
        })
    return params


def layer_norm(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    B, S, D = x.shape
    return x.reshape(B, S, num_heads, D // num_heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_fold(qf, kf, vf, sm_scale):
    """Folded [BH, S, Hd] flash attention with a differentiable XLA
    backward: the Pallas kernel has no VJP, so training at Skv >= 1024
    would otherwise fail at trace time (review r5). The backward pass
    recomputes standard softmax-attention gradients (materializes the
    [BH, Sq, Skv] probs — fine for the occasional long-S training step;
    the forward stays flash)."""
    from diffusion_llm_rs_tpu.ops.pallas_attention import dense_attention

    out = dense_attention(qf, kf, vf, sm_scale=sm_scale, out_dtype=qf.dtype)
    if out is None:  # kernel-unfriendly shape: same math via XLA
        logits = jnp.einsum("bsd,btd->bst", qf, kf,
                            preferred_element_type=jnp.float32) * sm_scale
        p = jax.nn.softmax(logits, axis=-1).astype(vf.dtype)
        out = jnp.einsum("bst,btd->bsd", p, vf,
                         preferred_element_type=jnp.float32).astype(qf.dtype)
    return out


def _flash_fold_fwd(qf, kf, vf, sm_scale):
    return _flash_fold(qf, kf, vf, sm_scale), (qf, kf, vf)


def _flash_fold_bwd(sm_scale, res, g):
    qf, kf, vf = res
    q32, k32, v32 = (a.astype(jnp.float32) for a in (qf, kf, vf))
    g32 = g.astype(jnp.float32)
    logits = jnp.einsum("bsd,btd->bst", q32, k32) * sm_scale
    p = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("bst,bsd->btd", p, g32)
    dp = jnp.einsum("bsd,btd->bst", g32, v32)
    dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bst,btd->bsd", dl, k32) * sm_scale
    dk = jnp.einsum("bst,bsd->btd", dl, q32) * sm_scale
    return dq.astype(qf.dtype), dk.astype(kf.dtype), dv.astype(vf.dtype)


_flash_fold.defvjp(_flash_fold_fwd, _flash_fold_bwd)


def attention(
    q: jax.Array,  # [B, S, H, Hd]
    k: jax.Array,  # [B, Skv, H, Hd]
    v: jax.Array,
    mask: Optional[jax.Array] = None,  # [B, 1, S, Skv] additive
    flash: bool = True,
) -> jax.Array:
    Hd = q.shape[-1]
    if flash and mask is None and k.shape[1] >= 1024:
        # unmasked long-S attention: Pallas flash kernel — the [S, Skv]
        # logits never touch HBM. At short S the fold/unfold transposes
        # cost more than the einsum path's materialization (measured:
        # benchmarks/profile_step.py round 4), so the short-S hot path is
        # the XLA einsum below (`fused_qkv_attention` lost the same
        # measurement and is benchmark-only — see the note at the dispatch
        # site further down). `flash=False` forces the einsum path — the
        # GSPMD sharded steps use it (a single-chip Mosaic kernel inside a
        # pjit program needs shard_map; parallel/mesh.py).
        from diffusion_llm_rs_tpu.ops.matmul import use_pallas
        if use_pallas():
            B, S, H, _ = q.shape

            def fold(x):  # [B, S, H, Hd] -> [B*H, S, Hd]
                return x.transpose(0, 2, 1, 3).reshape(B * H, -1, Hd)

            out = _flash_fold(fold(q), fold(k), fold(v),
                              1.0 / math.sqrt(Hd))
            return out.reshape(B, H, S, Hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bshd,bthd->bhst", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(Hd)
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhst,bthd->bshd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def denoiser_forward(
    params: Params,
    cfg: DiffusionConfig,
    x: jax.Array,                 # [B, S, D] noisy embeddings
    t: jax.Array,                 # [B]
    cached_kv: Optional[Tuple[jax.Array, jax.Array]] = None,  # ([L,B,Skv,H,Hd], ...)
    attn_mask: Optional[jax.Array] = None,  # [B, S] 1=keep
    return_kv: bool = False,
    return_hidden: bool = False,
    cached_qkv=None,  # list per layer of (QuantKV k, QuantKV v) — packed path
    attend_fn=None,   # (layer_idx, q, k, v, mask) -> attn_out, all [B,S,H,Hd]
    flash_attn=True,  # False forces the XLA einsum attention (GSPMD steps)
    tap=None,         # (param_path, x) called with each linear's INPUT —
                      # calibration hook (GPTQ Hessian accumulation)
):
    """Predict noise; optionally consume cached K/V and emit fresh K/V.

    With `cached_kv`, attention keys/values come from the cache (the previous
    denoise step, possibly dequantized from a quantized page store) — the
    reference's `forward_with_cache` (`lib.rs:910-915`). With `return_kv`, this
    step's fresh K/V are returned for the cache update — the reference's
    `update_kv_cache` (`lib.rs:826-835`) fused into the same pass.
    """
    B, S, D = x.shape
    if S > cfg.max_sequence_length:
        raise ValueError(
            f"sequence length {S} exceeds max_sequence_length "
            f"{cfg.max_sequence_length}")
    H = cfg.num_attention_heads
    dtype = x.dtype

    has_tap = tap is not None
    if tap is None:
        tap = lambda name, val: None
    temb = timestep_embedding(t, D)
    tm = params["time_mlp"]
    tap("time_mlp/w1", temb)
    t_in = linear(temb.astype(dtype), tm["w1"], tm["b1"], activation="gelu")
    tap("time_mlp/w2", t_in)
    temb = linear(t_in, tm["w2"], tm["b2"])
    h = x + params["pos_embed"][:S].astype(dtype)[None] + temb[:, None, :]

    mask = None
    if attn_mask is not None:
        mask = (1.0 - attn_mask[:, None, None, :].astype(jnp.float32)) * -1e9

    from diffusion_llm_rs_tpu.ops.matmul import Int8Weight, int8_mlp

    new_ks, new_vs = [], []
    for li, blk in enumerate(params["blocks"]):
        hn = layer_norm(h, blk["ln1"])
        a = blk["attn"]
        tap(f"blocks/{li}/attn/wqkv", hn)
        qkv = linear(hn, a["wqkv"])  # [B, S, 3D]
        # Kernel choice (measured, benchmarks/microbench_ops.py r4): at
        # S=256 XLA's batched einsum+softmax runs this attention in
        # ~31 us/layer vs ~70 us for an in-VMEM fused-QKV Pallas kernel
        # (pallas_attention.fused_qkv_attention) — per-head MXU dots are too
        # small to beat two large batched matmuls, so Pallas kernels are
        # reserved for the long-S regime (`attention()` dispatches to
        # dense_attention at Skv >= 1024, where einsum's S^2 f32
        # materialization loses).
        q = _split_heads(qkv[..., :D], H)
        k = _split_heads(qkv[..., D:2 * D], H)
        v = _split_heads(qkv[..., 2 * D:], H)
        if return_kv:
            new_ks.append(k)
            new_vs.append(v)
        if attend_fn is not None:
            # serving path: the caller owns attention (e.g. paged
            # quantized KV — update pages with fresh K/V, then attend
            # over them, preserving the reference's update-then-read
            # order, `diffuse-llm-rs/src/lib.rs:907-918`)
            attn_out = attend_fn(li, q, k, v, mask).astype(dtype)
        elif cached_qkv is not None:
            if mask is not None:
                # the quantized-KV kernel has no mask input; silently
                # attending over padding would be wrong (review r5)
                raise ValueError(
                    "attn_mask is not supported with cached_qkv — use the "
                    "einsum path (cached_kv) or attend_fn")
            # packed path: Pallas flash attention reads quantized K/V
            from diffusion_llm_rs_tpu.ops import pallas_attention as pa
            qk, qv = cached_qkv[li]
            q_r = q.transpose(0, 2, 1, 3).reshape(B * H, S, D // H)
            attn_out = pa.attention(q_r.astype(dtype), qk, qv)
            attn_out = attn_out.reshape(
                B, H, S, D // H).transpose(0, 2, 1, 3)
            attn_out = attn_out.astype(dtype)
        else:
            if cached_kv is not None:
                k = cached_kv[0][li].astype(dtype)
                v = cached_kv[1][li].astype(dtype)
            attn_out = attention(q, k, v, mask, flash=flash_attn)
        ao = attn_out.reshape(B, S, D)
        tap(f"blocks/{li}/attn/wo", ao)
        h = linear(ao, a["wo"], residual=h)

        hn = layer_norm(h, blk["ln2"])
        m = blk["mlp"]
        tap(f"blocks/{li}/mlp/w1", hn)
        if (isinstance(m["w1"], Int8Weight) and isinstance(m["w2"], Int8Weight)
                and not has_tap):
            # fused MLP kernel: the [B, S, 4D] inner activation never
            # round-trips HBM (same act-quant math as two linears)
            h = int8_mlp(hn, m["w1"], m["b1"], m["w2"], m["b2"], residual=h)
        else:
            inner = linear(hn, m["w1"], m["b1"], activation="gelu")
            tap(f"blocks/{li}/mlp/w2", inner)
            h = linear(inner, m["w2"], m["b2"], residual=h)

    h = layer_norm(h, params["ln_f"])
    tap("head/w", h)
    eps = linear(h, params["head"]["w"])

    outs = [eps]
    if return_kv:
        outs.append((jnp.stack(new_ks), jnp.stack(new_vs)))  # [L, B, S, H, Hd]
    if return_hidden:
        outs.append(h)
    return outs[0] if len(outs) == 1 else tuple(outs)


def embed_tokens(params: Params, token_ids: jax.Array,
                 dtype=jnp.float32) -> jax.Array:
    """Token ids [B, S] -> continuous embeddings [B, S, D]."""
    emb = params["tok_embed"]
    if hasattr(emb, "dequantize"):
        emb = emb.dequantize()
    return jnp.take(emb, token_ids, axis=0).astype(dtype)


def logits_from_hidden(params: Params, h: jax.Array) -> jax.Array:
    """Weight-tied readout: hidden [B, S, D] -> logits [B, S, V].

    Implements the real logits path the reference only sketches in comments
    (`diffusion_prefill/src/lib.rs:148-152`).
    """
    emb = params["tok_embed"]
    if hasattr(emb, "dequantize"):
        emb = emb.dequantize()
    return jnp.einsum("bsd,vd->bsv", h.astype(jnp.float32),
                      emb.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


def decode_tokens(params: Params, x: jax.Array) -> jax.Array:
    """Map denoised embeddings [B, S, D] to nearest-token ids [B, S]."""
    return jnp.argmax(logits_from_hidden(params, x), axis=-1)
