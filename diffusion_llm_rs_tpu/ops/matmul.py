"""Quantized matmul dispatch: Pallas fused dequant+matmul on TPU, jnp fallback.

The reference dequantizes full tensors to f32 and then `dot`s
(`diffuse-llm-rs/src/lib.rs:178-190,812`); the fused dequant-in-matmul kernel is
the centerpiece TPU-native op (SURVEY.md §2.2 item 3, BASELINE.json north star).

`linear(x, w, b)` is the single entry point used by all models: `w` may be a
plain array (bf16/f32), a `QuantizedTensor` (1/2/4/8-bit packed), or an
`Fp8Tensor`. Dispatch:
  - plain array        -> jnp.dot (MXU)
  - QuantizedTensor    -> Pallas fused dequant+matmul kernel on TPU
                          (ops/pallas_matmul.py); jnp unpack+scale+dot fallback
                          on CPU / when the kernel doesn't apply
  - Fp8Tensor          -> upcast-in-dot (XLA fuses the scale)
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Union

import jax
import jax.numpy as jnp

from diffusion_llm_rs_tpu.quant.core import (
    Fp8Tensor,
    QuantizedTensor,
    dequantize,
)

Weight = Union[jax.Array, QuantizedTensor, Fp8Tensor]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Int8Weight:
    """Decoded int8 weight for the compute-bound int8-MXU path.

    The packed sub-byte weight (canonical, checkpointed) is re-gridded ONCE
    at load time onto its per-column signed-int8 grid and stored decoded in
    HBM: 2x the int4 packed bytes but half the bf16 traffic, zero in-kernel
    unpack work, and plain XLA int8 dots run the MXU at its 1.85x int8 rate
    (act-quant + scale epilogues fuse in XLA). Values are IDENTICAL to the
    Pallas `act_bits=8` kernel's (same re-grid math); use that kernel instead
    when weight-read bandwidth dominates (small-batch decode).
    """

    data: jax.Array        # int8 [K, N]
    col_scale: jax.Array   # f32 [1, N]

    def tree_flatten(self):
        return ((self.data, self.col_scale), ())

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return 2

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        return (self.data.astype(jnp.float32) * self.col_scale).astype(dtype)


def decode_to_int8(w) -> Int8Weight:
    """MatmulWeight -> Int8Weight (exact same column grid as the a8 kernel)."""
    from diffusion_llm_rs_tpu.ops.pallas_matmul import MatmulWeight, prepare

    if isinstance(w, QuantizedTensor):
        w = prepare(w, act_bits=8)
    if not isinstance(w, MatmulWeight):
        raise TypeError(f"cannot decode {type(w).__name__}")
    if w.col_scale is None:
        w = dataclasses.replace(
            w, act_bits=8,
            col_scale=jnp.maximum(
                jnp.max(jnp.abs(w.dequantize(jnp.float32)), axis=0,
                        keepdims=True) / 127.0, 1e-12))
    vpb = 8 // w.bits
    mask = jnp.uint8((1 << w.bits) - 1)
    parts = [((w.data >> jnp.uint8(s * w.bits)) & mask) for s in range(vpb)]
    lv = jnp.concatenate(parts, axis=0).astype(jnp.float32)      # [K, N]
    G = w.K // w.scale.shape[0]
    lv = lv.reshape(-1, G, w.N)
    inv_cs = 1.0 / w.col_scale
    val = (lv - w.zero_point[:, None, :]) * (w.scale[:, None, :] *
                                             inv_cs[:, None, :])
    data = (jnp.clip(jnp.round(val), -127.0, 127.0)
            .astype(jnp.int32).astype(jnp.int8).reshape(w.K, w.N))
    return Int8Weight(data=data, col_scale=w.col_scale)


def int8_linear(x: jax.Array, w: Int8Weight,
                b: Optional[jax.Array] = None,
                activation: Optional[str] = None,
                residual: Optional[jax.Array] = None,
                out_dtype=jnp.float32) -> jax.Array:
    """y = act(quant_act(x) @ w8 * sx * col_scale + b) (+ residual).

    On TPU this fuses act-quant + int8 MXU dot + scale/bias/gelu/residual
    epilogue into one Pallas tile (`pallas_matmul.int8w_matmul`) — one pass
    over x instead of XLA's separate amax/quantize/dot/scale passes;
    identical math. XLA path elsewhere / for kernel-unfriendly shapes."""
    if use_pallas():
        from diffusion_llm_rs_tpu.ops import pallas_matmul
        out = pallas_matmul.int8w_matmul(x, w.data, w.col_scale, bias=b,
                                         activation=activation,
                                         residual=residual,
                                         out_dtype=out_dtype)
        if out is not None:
            return out
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    xi = jnp.round(x2 / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(xi, w.data, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * w.col_scale
    if b is not None:
        y = y + b.reshape(1, -1).astype(jnp.float32)
    if activation == "gelu":
        y = jax.nn.gelu(y)
    y = y.reshape(*x.shape[:-1], w.data.shape[1]).astype(out_dtype)
    if residual is not None:
        y = y + residual.astype(out_dtype)
    return y


def int8_mlp(x: jax.Array, w1: Int8Weight, b1: jax.Array, w2: Int8Weight,
             b2: jax.Array, residual: Optional[jax.Array] = None,
             out_dtype=None) -> jax.Array:
    """Fused MLP block gelu(x @ w1 + b1) @ w2 + b2 (+ residual) over
    decoded int8 weights — the [.., 4D] inner activation never round-trips
    HBM on TPU (`pallas_matmul.int8w_mlp`). Falls back to two
    `int8_linear` calls (identical activation-quantization math)."""
    out_dtype = out_dtype or x.dtype
    if use_pallas():
        from diffusion_llm_rs_tpu.ops import pallas_matmul
        out = pallas_matmul.int8w_mlp(
            x, w1.data, w1.col_scale, b1, w2.data, w2.col_scale, b2,
            residual=residual, out_dtype=out_dtype)
        if out is not None:
            return out
    inner = int8_linear(x, w1, b1, activation="gelu", out_dtype=out_dtype)
    return int8_linear(inner, w2, b2, residual=residual,
                       out_dtype=out_dtype)

_FORCE_FALLBACK = os.environ.get("DLM_TPU_NO_PALLAS", "0") == "1"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def use_pallas() -> bool:
    return _on_tpu() and not _FORCE_FALLBACK


def quantized_matmul(
    x: jax.Array,
    qt: QuantizedTensor,
    *,
    preferred_dtype=jnp.float32,
) -> jax.Array:
    """x @ dequant(qt) where qt is a 2-D weight [K, N].

    On TPU this routes to the fused Pallas kernel (unpack + scale inside the
    matmul tile loop, weights stay packed in HBM); elsewhere it dequantizes
    through jnp (XLA still fuses the affine transform into the dot).
    """
    if qt.ndim != 2:
        raise ValueError(f"quantized_matmul expects 2-D weights, got {qt.shape}")
    if use_pallas():
        try:
            from diffusion_llm_rs_tpu.ops import pallas_matmul
        except ImportError:  # pragma: no cover
            pallas_matmul = None
        if pallas_matmul is not None:
            out = pallas_matmul.fused_dequant_matmul(x, qt)
            if out is not None:
                return out.astype(preferred_dtype)
    w = dequantize(qt, dtype=x.dtype)
    return jnp.dot(x, w, preferred_element_type=preferred_dtype)


def linear(
    x: jax.Array,
    w: Weight,
    b: Optional[jax.Array] = None,
    *,
    preferred_dtype=None,
    activation: Optional[str] = None,
    residual: Optional[jax.Array] = None,
) -> jax.Array:
    """Dense layer y = act(x @ w + b) (+ residual) with quantization-aware
    dispatch.

    `activation` ("gelu" or None) and `residual` fuse into the Pallas
    kernel epilogue for int8-decoded weights; other paths apply them after
    (XLA fuses them there).
    """
    out_dtype = preferred_dtype or x.dtype
    # validate up front: the Int8Weight/MatmulWeight kernel epilogues only
    # implement gelu and would silently SKIP an unknown activation (the
    # generic path below raises — review r5)
    if activation not in (None, "gelu"):
        raise ValueError(f"unknown activation {activation!r}")
    if isinstance(w, Int8Weight):
        return int8_linear(x, w, b, activation, residual, out_dtype)
    # MatmulWeight: kernel-ready packed layout -> Pallas fused dequant+matmul
    from diffusion_llm_rs_tpu.ops.pallas_matmul import MatmulWeight
    if isinstance(w, MatmulWeight):
        from diffusion_llm_rs_tpu.ops import pallas_matmul
        # kernel accumulates f32 on the MXU and writes out_dtype directly;
        # bias + activation run in the kernel epilogue
        y = pallas_matmul.matmul(x, w, out_dtype=out_dtype, bias=b,
                                 activation=activation)
        return y if residual is None else y + residual.astype(y.dtype)
    if isinstance(w, QuantizedTensor):
        y = quantized_matmul(x, w, preferred_dtype=jnp.float32).astype(out_dtype)
    elif isinstance(w, Fp8Tensor):
        y = jnp.dot(x, w.data.astype(x.dtype),
                    preferred_element_type=jnp.float32)
        y = (y * w.scale).astype(out_dtype)
    else:
        y = jnp.dot(x, w.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(out_dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    if activation == "gelu":
        y = jax.nn.gelu(y)
    elif activation is not None:
        raise ValueError(f"unknown activation {activation!r}")
    if residual is not None:
        y = y + residual.astype(y.dtype)
    return y
