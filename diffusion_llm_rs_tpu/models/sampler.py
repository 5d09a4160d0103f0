"""Phase-aware quantized sampling loop — THE hot path (SURVEY.md §3.2).

TPU-native re-design of `DiffuseLLM::sample` (`diffuse-llm-rs/src/lib.rs:853-955`):

Reference behavior reproduced:
  - phase switch at t = T/2: first half of the reverse loop is the "prefill"
    phase (higher KV bits), second half "decode" (lower bits) (`lib.rs:886-887`)
  - progressive precision: during decode, target bits interpolate from
    decode_bits down to min_decode_bits with progress (`lib.rs:893-904`)
  - per step: produce fresh K/V, attend over the *quantized* cache from the
    previous step, re-quantize the cache (`lib.rs:907-918`)

TPU-first re-design (SURVEY.md §7):
  - The Python-loop-with-host-cache becomes a handful of `lax.scan` segments,
    one per (phase, bit-width) bucket. Bit-widths are static per segment, so
    packed cache shapes stay static and XLA compiles each segment once.
    Progressive precision's fractional bit targets are bucketed onto the
    supported power-of-two widths {8,4,2,1} ("bucketed recompilation" option
    from SURVEY.md §7 hard parts).
  - Quantize/dequantize of the KV cache runs *inside* the scan as jnp ops —
    XLA fuses them with the attention; the Pallas attention kernel consumes the
    packed pages directly and removes the materialization.
  - Schedule tables precomputed once (vs. per-step rebuild at `lib.rs:1160`).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.models.diffusion import DiffusionSchedule, p_sample
from diffusion_llm_rs_tpu.quant.core import QuantizedTensor, dequantize, quantize

SUPPORTED = (8, 4, 2, 1)


def bucket_bits(target: float) -> int:
    """Round a fractional target bit-width down onto a supported width."""
    for b in SUPPORTED:
        if target >= b:
            return b
    return SUPPORTED[-1]


def bucket_bits_up(target: float) -> int:
    """Smallest supported width >= target — the FLOOR bucketing: a
    configured min_decode_bits of 3 must floor the schedule at 4, not be
    rounded down to 2 (review r5: bucket_bits(max(target, 3)) == 2 ran the
    decode phase BELOW the configured minimum)."""
    for b in reversed(SUPPORTED):
        if b >= target:
            return b
    return SUPPORTED[0]


def plan_segments(num_steps: int, cfg: DiffusionConfig) -> List[Tuple[int, int, int]]:
    """Static (bits, t_hi, t_lo) segments for the reverse loop t = T-1 .. 0.

    Reproduces the reference's phase/progress arithmetic (`lib.rs:886-904`):
    prefill phase iff t > num_steps/2 at prefill_bits; decode phase bits
    interpolate decode_bits -> min_decode_bits with progress = (T-t)/(T/2).
    Returns segments in execution order (t descending); t_lo is inclusive.
    """
    qc = cfg.quant_config
    half = num_steps // 2
    segs: List[Tuple[int, int, int]] = []
    for t in range(num_steps - 1, -1, -1):
        is_prefill = t > half
        if not cfg.use_phase_aware_quant:
            # bucket like the serving router does: an unsupported width
            # (e.g. 3) otherwise crashes pack_bits mid-sampling
            bits = bucket_bits(cfg.kv_quant_bits or 8)
        elif is_prefill:
            bits = bucket_bits(qc.prefill_bits)
        elif qc.progressive_precision:
            # Interpolate decode_bits -> min_decode_bits across the decode
            # phase. The reference's progress = (T-t)/(T/2) (`lib.rs:895`)
            # evaluates to 1.0 at the START of decode and 2.0 at t=0 (driving
            # target_bits to 0) — clearly not the documented intent of
            # "progressive precision reduction during decoding" (`lib.rs:90-91`).
            # We use progress = (half - t)/half over t in [half, 0].
            progress = min(max((half - t) / max(half, 1), 0.0), 1.0)
            target = qc.decode_bits * (1.0 - progress) + qc.min_decode_bits * progress
            # round DOWN onto supported widths (deliberate: precision drops
            # early, conservative on memory — and identical to the serving
            # router's pick), but never below the ceil-bucketed floor
            bits = max(bucket_bits(max(target, qc.min_decode_bits)),
                       bucket_bits_up(qc.min_decode_bits))
        else:
            bits = bucket_bits(qc.decode_bits)
        if segs and segs[-1][0] == bits:
            segs[-1] = (bits, segs[-1][1], t)
        else:
            segs.append((bits, t, t))
    return segs


def _quantize_kv_pair(kv: Tuple[jax.Array, jax.Array], bits: int):
    """Per-token-per-head quantization of stacked K/V [L, B, S, H, Hd]:
    one (scale, zp) per (layer, batch, token, head) vector — a single group
    spanning the head_dim axis. Matches the kernel path's per-token scales
    (`ops/pallas_attention.py quantize_kv`); DESIGN.md's granularity row
    ("ONE scale for the whole cache tensor is catastrophic") rules out any
    coarser choice, so kernel_cache=True/False have the same numerics."""
    def q(arr):
        return quantize(arr.astype(jnp.float32), bits,
                        granularity="group", group_size=arr.shape[-1],
                        axis=arr.ndim - 1)
    return q(kv[0]), q(kv[1])


def _quantize_kv_packed(kv: Tuple[jax.Array, jax.Array], bits: int):
    """Quantize stacked K/V [L, B, S, H, Hd] into per-layer packed QuantKV
    pairs ([B*H, S, Hd] layout) for the Pallas attention kernel."""
    from diffusion_llm_rs_tpu.ops import pallas_attention as pa
    L, B, S, H, Hd = kv[0].shape

    def fold(arr):
        return arr.transpose(0, 1, 3, 2, 4).reshape(L, B * H, S, Hd)

    kf, vf = fold(kv[0]), fold(kv[1])
    return tuple((pa.quantize_kv(kf[li], bits), pa.quantize_kv(vf[li], bits))
                 for li in range(L))


def _dequantize_kv_pair(qkv) -> Tuple[jax.Array, jax.Array]:
    return dequantize(qkv[0]), dequantize(qkv[1])


def phase_aware_sample(
    params,
    cfg: DiffusionConfig,
    schedule: DiffusionSchedule,
    shape: Tuple[int, int],          # (batch, seq_len)
    key: jax.Array,
    num_steps: Optional[int] = None,
    *,
    use_cache: bool = True,
    kernel_cache: bool = True,
    forward_fn: Optional[Callable] = None,
) -> jax.Array:
    """Sample [batch, seq, hidden] embeddings via phase-aware quantized KV.

    `forward_fn(params, cfg, x, t, cached_kv, return_kv)` defaults to the
    transformer denoiser. Returns the denoised embeddings; token decode is a
    separate readout (`models.denoiser.decode_tokens`).
    """
    batch, seq_len = shape
    T = num_steps or cfg.num_timesteps
    fwd = forward_fn or dn.denoiser_forward
    H, Hd = cfg.num_attention_heads, cfg.head_dim
    L = cfg.num_layers

    key, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, (batch, seq_len, cfg.hidden_size), jnp.float32)

    if not use_cache or not cfg.use_kv_cache:
        def step(carry, t_scalar):
            x, key = carry
            key, sub = jax.random.split(key)
            t_vec = jnp.full((batch,), t_scalar, jnp.int32)
            eps = fwd(params, cfg, x, t_vec)
            return (p_sample(schedule, x, t_vec, eps, sub), key), None
        ts = jnp.arange(T - 1, -1, -1)
        (x, _), _ = jax.lax.scan(step, (x, key), ts)
        return x

    segments = plan_segments(T, cfg)

    # Bootstrap step (t = T-1): no cache yet — fresh K/V, quantized at the
    # first segment's bits (the reference starts from an empty cache entry,
    # `lib.rs:958-980`; attending over it is degenerate, so the first step is
    # cache-free by construction).
    first_bits, t_hi, t_lo = segments[0]
    key, sub = jax.random.split(key)
    t_vec = jnp.full((batch,), T - 1, jnp.int32)
    eps, kv = fwd(params, cfg, x, t_vec, return_kv=True)
    x = p_sample(schedule, x, t_vec, eps, sub)

    if kernel_cache:
        # packed carry: per-layer QuantKV pairs, attention kernel reads them
        # directly — the cache is never materialized in fp between steps
        qkv = _quantize_kv_packed(kv, first_bits)

        def make_step(bits):
            def step(carry, t_scalar):
                x, qkv, key = carry
                key, sub = jax.random.split(key)
                t_vec = jnp.full((batch,), t_scalar, jnp.int32)
                eps, kv = fwd(params, cfg, x, t_vec, cached_qkv=qkv,
                              return_kv=True)
                nqkv = _quantize_kv_packed(kv, bits)
                x = p_sample(schedule, x, t_vec, eps, sub)
                return (x, nqkv, key), None
            return step

        remaining = list(segments)
        bits0, hi0, lo0 = remaining[0]
        remaining[0] = (bits0, hi0 - 1, lo0)
        for bits, hi, lo in remaining:
            if hi < lo:
                continue
            if qkv[0][0].bits != bits:
                # segment boundary: requantize the carry at the new width
                deq = tuple((k.dequantize(), v.dequantize()) for k, v in qkv)
                from diffusion_llm_rs_tpu.ops import pallas_attention as pa
                qkv = tuple((pa.quantize_kv(k, bits), pa.quantize_kv(v, bits))
                            for k, v in deq)
            ts = jnp.arange(hi, lo - 1, -1)
            (x, qkv, key), _ = jax.lax.scan(
                make_step(bits), (x, qkv, key), ts)
        return x

    qkv = _quantize_kv_pair(kv, first_bits)

    def make_step(bits):
        def step(carry, t_scalar):
            x, qk, qv, key = carry
            key, sub = jax.random.split(key)
            t_vec = jnp.full((batch,), t_scalar, jnp.int32)
            cached = _dequantize_kv_pair((qk, qv))
            eps, kv = fwd(params, cfg, x, t_vec, cached_kv=cached,
                          return_kv=True)
            nqk, nqv = _quantize_kv_pair(kv, bits)
            x = p_sample(schedule, x, t_vec, eps, sub)
            return (x, nqk, nqv, key), None
        return step

    remaining = [(bits, hi, lo) for (bits, hi, lo) in segments]
    # first segment already consumed one step (t = T-1)
    bits0, hi0, lo0 = remaining[0]
    remaining[0] = (bits0, hi0 - 1, lo0)

    for bits, hi, lo in remaining:
        if hi < lo:
            continue
        # segment boundary: re-quantize carry cache at this segment's width
        if qkv[0].bits != bits:
            qkv = _quantize_kv_pair(_dequantize_kv_pair(qkv), bits)
        ts = jnp.arange(hi, lo - 1, -1)
        (x, qk, qv, key), _ = jax.lax.scan(
            make_step(bits), (x, qkv[0], qkv[1], key), ts)
        qkv = (qk, qv)

    return x
