"""Pallas TPU kernel: flash attention reading quantized K/V directly.

SURVEY.md §2.2 item 4: the reference dequantizes the ENTIRE cache every
timestep (`KVCacheEntry::get_keys` -> full-tensor dequantize,
`diffuse-llm-rs/src/lib.rs:178-205`) and then runs attention over the f32
copy — 2x the HBM traffic of the cache plus a full materialization. Here the
packed uint8 K/V stay packed; dequantization happens in-register inside the
flash-attention loop.

Layout (`QuantKV`, built by `quantize_kv`):
  - K/V [BH, S, D] quantized per-token (one scale/zp per [bh, s] row, the
    per-token-per-head granularity of `cache.kv_cache._quantize_kv`).
  - data: uint8 [BH, S, D/vpb], *block-packed* along D: byte (s, d) holds the
    levels of X[s, d + p*Dp] in bit-field p (Dp = D/vpb). Unpacking is
    shift+mask+concat along lanes — natural order, no interleave.
  - scale/zero_point: f32 [BH, S] row sidecars.

Kernel math — the per-token affine folds into row-vector corrections so the
MXU only ever sees integer-level matmuls:
  logits = (q @ lv_k^T) * scale_k - (q @ 1) * (scale_k * zp_k)     [row vecs]
  out    = (P * scale_v) @ lv_v - ((P * scale_v) @ zp_v) * 1^T
with a standard online-softmax (flash) accumulation over KV tiles.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class QuantKV:
    """Block-packed per-token-quantized K or V tensor [BH, S, D]."""

    data: jax.Array        # uint8 [BH, S, D/vpb]
    scale: jax.Array       # f32 [BH, S]
    zero_point: jax.Array  # f32 [BH, S]
    bits: int
    D: int

    def tree_flatten(self):
        return ((self.data, self.scale, self.zero_point), (self.bits, self.D))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def shape(self) -> Tuple[int, int, int]:
        return (self.data.shape[0], self.data.shape[1], self.D)

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        vpb = 8 // self.bits
        mask = jnp.uint8((1 << self.bits) - 1)
        parts = [((self.data >> jnp.uint8(p * self.bits)) & mask)
                 for p in range(vpb)]
        lv = jnp.concatenate(parts, axis=-1).astype(jnp.float32)  # [BH,S,D]
        out = (lv - self.zero_point[..., None]) * self.scale[..., None]
        return out.astype(dtype)


def quantize_kv(x: jax.Array, bits: int) -> QuantKV:
    """Quantize [BH, S, D] per-token into the kernel's block-packed layout."""
    BH, S, D = x.shape
    vpb = 8 // bits
    if D % vpb != 0:
        raise ValueError(f"D={D} not divisible by {vpb}")
    x = x.astype(jnp.float32)
    qmax = float((1 << bits) - 1)
    mn = jnp.min(x, axis=-1)
    mx = jnp.max(x, axis=-1)
    rng = mx - mn
    scale = jnp.where(rng > 0, rng / qmax, 1.0)
    zp = -mn / scale
    lv = jnp.clip(jnp.round(x / scale[..., None] + zp[..., None]),
                  0.0, qmax).astype(jnp.uint8)
    if bits == 8:
        packed = lv
    else:
        Dp = D // vpb
        parts = [lv[..., p * Dp:(p + 1) * Dp] for p in range(vpb)]
        packed = parts[0]
        for p in range(1, vpb):
            packed = packed | (parts[p] << jnp.uint8(p * bits))
    return QuantKV(data=packed, scale=scale.astype(jnp.float32),
                   zero_point=zp.astype(jnp.float32), bits=bits, D=D)


def _attn_kernel(q_ref, k_ref, ks_ref, kz_ref, v_ref, vs_ref, vz_ref,
                 out_ref, *, bits: int, D: int, TK: int, sm_scale: float):
    """One (bh, q-tile): online softmax over KV tiles resident in VMEM."""
    vpb = 8 // bits
    Dp = D // vpb
    mask = (1 << bits) - 1
    q = q_ref[0]                      # [TQ, D] bf16
    TQ = q.shape[0]
    Skv = k_ref.shape[1]
    qsum = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)  # [TQ,1]

    def unpack(ref, j):
        tile = ref[0, pl.ds(j * TK, TK), :]  # [TK, Dp] uint8
        # Mosaic legalizes neither 8-bit vector shifts nor uint8->bf16 casts:
        # widen to int32, shift/mask there, then f32 -> bf16.
        t32 = tile.astype(jnp.int32)
        parts = [((t32 >> (p * bits)) & int(mask))
                 .astype(jnp.float32).astype(jnp.bfloat16)
                 for p in range(vpb)]
        return jnp.concatenate(parts, axis=-1)  # [TK, D] levels

    m = jnp.full((TQ, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((TQ, 1), jnp.float32)
    acc = jnp.zeros((TQ, D), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k_lv = unpack(k_ref, j)                        # [TK, D]
        ks = ks_ref[0, 0:1, pl.ds(j * TK, TK)]         # [1, TK]
        kz = kz_ref[0, 0:1, pl.ds(j * TK, TK)]
        raw = jax.lax.dot_general(
            q, k_lv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [TQ, TK]
        logits = (raw * ks - qsum * (ks * kz)) * sm_scale

        m_new = jnp.maximum(m, jnp.max(logits, axis=1, keepdims=True))
        p = jnp.exp(logits - m_new)                    # [TQ, TK]
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)

        v_lv = unpack(v_ref, j)                        # [TK, D]
        vs = vs_ref[0, 0:1, pl.ds(j * TK, TK)]
        vz = vz_ref[0, 0:1, pl.ds(j * TK, TK)]
        ps = (p * vs).astype(jnp.bfloat16)             # fold V scale into P
        pv = jax.lax.dot_general(
            ps, v_lv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [TQ, D]
        corr = jnp.sum(p * vs * vz, axis=1, keepdims=True)  # [TQ, 1]
        acc_new = acc * alpha + pv - corr
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, Skv // TK, body, (m, l, acc))
    out_ref[0] = (acc / l).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def attention(q: jax.Array, k: QuantKV, v: QuantKV,
              sm_scale: Optional[float] = None) -> jax.Array:
    """Flash attention over quantized KV.

    q: [BH, Sq, D] (flatten batch*heads outside). Returns [BH, Sq, D] f32.
    Falls back to the XLA-fused dequantize path off-TPU-unfriendly shapes.
    """
    BH, Sq, D = q.shape
    Skv = k.shape[1]
    sm_scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
    TQ = next((t for t in (256, 128, 64, 32, 16, 8) if Sq % t == 0), None)
    TK = next((t for t in (512, 256, 128) if Skv % t == 0), None)
    # VMEM budget per grid cell: packed K+V [Skv, Dp] x2 resident, plus
    # sidecars (4 x [1, Skv] f32), q/out/acc tiles — without this guard
    # long Skv fails Mosaic compilation instead of falling back (mirrors
    # dense_attention's check; review r5)
    Dp_est = D // (8 // k.bits)
    vmem_est = (2 * Skv * Dp_est + 4 * Skv * 4 +
                (TQ or 0) * D * (2 + 4 + 4))
    if (TQ is None or TK is None or D % (8 * (8 // k.bits)) != 0 or
            vmem_est > 12 * 1024 * 1024):
        return _attention_fallback(q, k, v, sm_scale)

    kernel = functools.partial(_attn_kernel, bits=k.bits, D=D, TK=TK,
                               sm_scale=sm_scale)
    Dp = D // (8 // k.bits)
    interpret = jax.default_backend() != "tpu"
    # sidecars as [BH, 1, S]: TPU block shapes need the last-two dims either
    # tile-aligned or equal to the array dims
    side = pl.BlockSpec((1, 1, Skv), lambda b, i: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(BH, Sq // TQ),
        in_specs=[
            pl.BlockSpec((1, TQ, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Skv, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            side, side,
            pl.BlockSpec((1, Skv, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            side, side,
        ],
        out_specs=pl.BlockSpec((1, TQ, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Sq, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Sq * Skv * D,
            bytes_accessed=BH * (Sq * D * 2 + 2 * Skv * Dp + Sq * D * 4),
            transcendentals=BH * Sq * Skv,
        ),
        interpret=interpret,
    )(q.astype(jnp.bfloat16), k.data, k.scale[:, None, :],
      k.zero_point[:, None, :], v.data, v.scale[:, None, :],
      v.zero_point[:, None, :])


def _dense_kernel(q_ref, k_ref, v_ref, out_ref, *, TK: int, sm_scale: float):
    """One (bh, q-tile) of dense bf16 flash attention: online softmax over
    KV tiles resident in VMEM — the [Sq, Skv] logits matrix is never
    materialized in HBM (the XLA einsum+softmax path writes it f32)."""
    q = q_ref[0]                       # [TQ, D] bf16
    TQ = q.shape[0]
    D = q.shape[1]
    Skv = k_ref.shape[1]

    m = jnp.full((TQ, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((TQ, 1), jnp.float32)
    acc = jnp.zeros((TQ, D), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * TK, TK), :]             # [TK, D] bf16
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # [TQ, TK]
        m_new = jnp.maximum(m, jnp.max(logits, axis=1, keepdims=True))
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, pl.ds(j * TK, TK), :]             # [TK, D] bf16
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc * alpha + pv

    m, l, acc = jax.lax.fori_loop(0, Skv // TK, body, (m, l, acc))
    out_ref[0] = (acc / l).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "out_dtype"))
def dense_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    sm_scale: Optional[float] = None,
                    out_dtype=jnp.bfloat16) -> Optional[jax.Array]:
    """Dense (unquantized) flash attention: q/k/v [BH, S, D] -> [BH, Sq, D].

    The bf16 fast path for the sampler's full-sequence bidirectional
    attention and the honest bf16 flash baseline at long S (so the paged
    quantized kernel's win is measured against flash, not against an
    S^2-materializing strawman). Returns None for kernel-unfriendly shapes
    (caller falls back to the XLA einsum path — same math).
    """
    BH, Sq, D = q.shape
    Skv = k.shape[1]
    sm_scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
    TQ = next((t for t in (512, 256, 128, 64, 32, 16, 8) if Sq % t == 0), None)
    TK = next((t for t in (512, 256, 128) if Skv % t == 0), None)
    if TQ is None or TK is None or D % 8 != 0 or k.shape != v.shape:
        return None
    # whole K and V resident per grid cell: bound them (plus the q tile,
    # output tile and f32 accumulator) to VMEM or Mosaic fails to compile
    # instead of falling back (~Skv >= 16-32k at D=128 otherwise)
    if 2 * Skv * D * 2 + TQ * (D * 8 + TK * 4) > 12 * 1024 * 1024:
        return None
    kernel = functools.partial(_dense_kernel, TK=TK, sm_scale=sm_scale)
    kv_spec = pl.BlockSpec((1, Skv, D), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(BH, Sq // TQ),
        in_specs=[
            pl.BlockSpec((1, TQ, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, kv_spec,
        ],
        out_specs=pl.BlockSpec((1, TQ, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Sq, D), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Sq * Skv * D,
            bytes_accessed=BH * (Sq * D * 2 + 2 * Skv * D * 2 + Sq * D * 2),
            transcendentals=BH * Sq * Skv,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))


def _qkv_kernel(qkv_ref, out_ref, *, H: int, D: int, sm_scale: float):
    """One batch row of fused-QKV attention: all H heads computed in-kernel
    from the packed [S, 3D] projection, no head transposes, logits never
    leave VMEM. Lane-slicing per head costs a VPU shuffle; it replaces two
    [B,S,H,Hd]<->[B*H,S,Hd] HBM transpose round trips per layer."""
    Hd = D // H
    qkv = qkv_ref[0]                      # [S, 3D] bf16
    for h in range(H):
        q = qkv[:, h * Hd:(h + 1) * Hd]
        k = qkv[:, D + h * Hd: D + (h + 1) * Hd]
        v = qkv[:, 2 * D + h * Hd: 2 * D + (h + 1) * Hd]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale     # [S, S]
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [S, Hd]
        out_ref[0, :, h * Hd:(h + 1) * Hd] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "sm_scale",
                                             "out_dtype"))
def fused_qkv_attention(qkv: jax.Array, num_heads: int,
                        sm_scale: Optional[float] = None,
                        out_dtype=jnp.bfloat16) -> Optional[jax.Array]:
    """Full-sequence bidirectional attention straight off the fused QKV
    projection: qkv [B, S, 3D] -> out [B, S, D] (head-concatenated).

    The sampler-hot-loop fast path: one HBM read of the projection and one
    write of the output per layer — no [B,S,H,Hd] split/transpose traffic
    and no [B,H,S,S] logits materialization (the XLA einsum path pays both).
    Returns None when S doesn't fit the whole-row VMEM budget (long-S goes
    through `dense_attention`'s KV-tiled online softmax instead).
    """
    B, S, threeD = qkv.shape
    D = threeD // 3
    if threeD % 3 or D % num_heads or (D // num_heads) % 8:
        return None
    # whole [S, 3D] + [S, S] logits + out resident per program
    if S % 8 or S * threeD * 2 + S * S * 4 + S * D * 2 > 8 * 1024 * 1024:
        return None
    sm_scale = sm_scale if sm_scale is not None else \
        1.0 / math.sqrt(D // num_heads)
    return pl.pallas_call(
        functools.partial(_qkv_kernel, H=num_heads, D=D, sm_scale=sm_scale),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, S, threeD), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, D), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * S * S * (D // num_heads),
            bytes_accessed=B * S * (threeD + D) * 2,
            transcendentals=B * num_heads * S * S,
        ),
        interpret=jax.default_backend() != "tpu",
    )(qkv.astype(jnp.bfloat16))


def _attention_fallback(q, k: QuantKV, v: QuantKV, sm_scale: float):
    kd = k.dequantize(jnp.bfloat16)
    vd = v.dequantize(jnp.bfloat16)
    logits = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.bfloat16), kd,
                        preferred_element_type=jnp.float32) * sm_scale
    p = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bqk,bkd->bqd", p, vd,
                      preferred_element_type=jnp.float32)
