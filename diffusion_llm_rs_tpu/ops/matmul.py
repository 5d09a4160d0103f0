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
) -> jax.Array:
    """Dense layer y = act(x @ w + b) with quantization-aware dispatch.

    `activation` ("gelu" or None) fuses into the Pallas kernel epilogue for
    packed weights; other paths apply it after (XLA fuses it there).
    """
    out_dtype = preferred_dtype or x.dtype
    # MatmulWeight: kernel-ready packed layout -> Pallas fused dequant+matmul
    from diffusion_llm_rs_tpu.ops.pallas_matmul import MatmulWeight
    if isinstance(w, MatmulWeight):
        from diffusion_llm_rs_tpu.ops import pallas_matmul
        # kernel accumulates f32 on the MXU and writes out_dtype directly;
        # bias + activation run in the kernel epilogue
        return pallas_matmul.matmul(x, w, out_dtype=out_dtype, bias=b,
                                    activation=activation)
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
    return y
