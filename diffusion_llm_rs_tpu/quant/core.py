"""Core quantization: 1/2/4/8-bit affine quantize/dequantize with bit-packing.

TPU-native re-implementation of the reference's three duplicate quantizer stacks
(`diffuse-llm-rs/src/quantization.rs:38-85`, `prefill-kvquant-rs/lib.rs:34-53`,
`quantization/src/quantize.rs:93-189`, `diffusion_prefill/src/prefill_kv.rs:42-67`),
unified into ONE module per SURVEY.md §1 ("the duplication is an artifact, not a
feature").

Scheme (matches the reference's unsigned-affine semantics at
`diffuse-llm-rs/src/quantization.rs:38-68`):

    q  = clamp(round(x / scale) + zero_point, 0, 2^bits - 1)     # unsigned carrier
    x' = (q - zero_point) * scale

Sub-byte widths (1/2/4) are bit-packed little-endian into a uint8 carrier along the
last axis — the layout the Pallas fused dequant+matmul kernels unpack in-register
(SURVEY.md §2.2 item 1-3). Scales/zero-points are float32 sidecar arrays at
per-tensor, per-channel, or per-group granularity (group_size=128 default per the
reference's GPTQ-style config, `quantization/src/types.rs:126`).

Everything here is pure jnp: it runs on CPU for tests and fuses under jit on TPU.
The Pallas kernels in `ops/` consume the packed layout directly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Literal, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SUPPORTED_BITS = (1, 2, 4, 8)

Granularity = Literal["tensor", "channel", "group"]


def qmax_for_bits(bits: int) -> int:
    """Max level of the unsigned carrier, 2^bits - 1."""
    return (1 << bits) - 1


# ---------------------------------------------------------------------------
# Bit packing (little-endian within each carrier byte, along the last axis)
# ---------------------------------------------------------------------------


def packed_last_dim(last: int, bits: int) -> int:
    vpb = 8 // bits
    return -(-last // vpb)  # ceil


def pack_bits(q: jax.Array, bits: int) -> jax.Array:
    """Pack unsigned levels (values in [0, 2^bits-1]) into a uint8 carrier.

    Packs along the last axis; value i of each byte occupies bits
    [i*bits, (i+1)*bits) (little-endian). 8-bit is the identity (cast).
    """
    if bits not in SUPPORTED_BITS:
        raise ValueError(f"bits must be one of {SUPPORTED_BITS}, got {bits}")
    q = q.astype(jnp.uint8)
    if bits == 8:
        return q
    vpb = 8 // bits
    *lead, last = q.shape
    pad = (-last) % vpb
    if pad:
        q = jnp.pad(q, [(0, 0)] * len(lead) + [(0, pad)])
    q = q.reshape(*lead, -1, vpb)
    out = q[..., 0]
    for i in range(1, vpb):
        out = out | (q[..., i] << jnp.uint8(i * bits))
    return out


def unpack_bits(packed: jax.Array, bits: int, last: int) -> jax.Array:
    """Inverse of pack_bits: uint8 carrier -> unsigned levels, last axis = `last`."""
    if bits == 8:
        return packed
    vpb = 8 // bits
    mask = jnp.uint8(qmax_for_bits(bits))
    *lead, _ = packed.shape
    parts = [(packed >> jnp.uint8(i * bits)) & mask for i in range(vpb)]
    vals = jnp.stack(parts, axis=-1).reshape(*lead, -1)
    return vals[..., :last]


# ---------------------------------------------------------------------------
# QuantizedTensor pytree
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class QuantizedTensor:
    """A quantized tensor: packed uint8 carrier + affine sidecar params.

    TPU-native analogue of the reference's `QuantizedTensor`
    (`diffuse-llm-rs/src/quantization.rs:89-125`, `quantization/src/types.rs:43-82`)
    and `CompressedVector` (`prefill-kvquant-rs/lib.rs:62-67`) — the lingua-franca
    type of the whole system (SURVEY.md §1).

    data: uint8, shape = shape[:-1] + (packed_last_dim(shape[-1], bits),)
    scale/zero_point: float32, shape per `granularity`:
        tensor  -> ()
        channel -> shape with all axes 1 except `axis`
        group   -> shape with `axis` replaced by n_groups
    """

    data: jax.Array
    scale: jax.Array
    zero_point: jax.Array
    bits: int = dataclasses.field(metadata=dict(static=True))
    shape: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    granularity: Granularity = "tensor"
    group_size: int = 128
    axis: int = -1
    symmetric: bool = False

    def tree_flatten(self):
        children = (self.data, self.scale, self.zero_point)
        aux = (self.bits, self.shape, self.granularity, self.group_size,
               self.axis, self.symmetric)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, scale, zero_point = children
        bits, shape, granularity, group_size, axis, symmetric = aux
        return cls(data, scale, zero_point, bits, shape, granularity,
                   group_size, axis, symmetric)

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def dtype(self):
        return jnp.float32

    def num_elements(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1

    def packed_nbytes(self) -> int:
        n = self.num_elements()
        return (n * self.bits + 7) // 8

    def sidecar_nbytes(self) -> int:
        return int(np.prod(self.scale.shape or (1,))) * 4 * 2

    def compression_ratio(self, include_sidecar: bool = False) -> float:
        """Original f32 bytes / compressed bytes.

        Mirrors `QuantizedTensor::compression_ratio`
        (`diffuse-llm-rs/src/quantization.rs:120-124`), which counts packed data
        only; pass include_sidecar=True for the honest number.
        """
        original = self.num_elements() * 4
        compressed = self.packed_nbytes()
        if include_sidecar:
            compressed += self.sidecar_nbytes()
        return original / max(compressed, 1)

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        return dequantize(self, dtype=dtype)


# ---------------------------------------------------------------------------
# Parameter computation
# ---------------------------------------------------------------------------


def _norm_axis(axis: int, ndim: int) -> int:
    return axis % ndim


def compute_qparams(
    x: jax.Array,
    bits: int,
    *,
    symmetric: bool = False,
    granularity: Granularity = "tensor",
    group_size: int = 128,
    axis: int = -1,
) -> Tuple[jax.Array, jax.Array]:
    """Compute (scale, zero_point) float32 arrays for the given granularity.

    Asymmetric (default) matches `quantize_tensor`
    (`diffuse-llm-rs/src/quantization.rs:48-56`):
        scale = (max - min) / (2^bits - 1)   (1.0 where the range is 0)
        zp    = clamp(round(-min / scale), 0, 2^bits - 1)
    Symmetric centers the range on zero:
        scale = max|x| / 2^(bits-1)          (1.0 where 0)
        zp    = 2^(bits-1)
    """
    if bits not in SUPPORTED_BITS:
        raise ValueError(f"bits must be one of {SUPPORTED_BITS}, got {bits}")
    x = x.astype(jnp.float32)
    qmax = float(qmax_for_bits(bits))

    if granularity == "tensor":
        reduce_axes = tuple(range(x.ndim))
        keepdims = False
    elif granularity == "channel":
        ax = _norm_axis(axis, x.ndim)
        reduce_axes = tuple(i for i in range(x.ndim) if i != ax)
        keepdims = True
    elif granularity == "group":
        ax = _norm_axis(axis, x.ndim)
        if x.shape[ax] % group_size != 0:
            raise ValueError(
                f"axis {ax} dim {x.shape[ax]} not divisible by group_size {group_size}")
        new_shape = x.shape[:ax] + (x.shape[ax] // group_size, group_size) + x.shape[ax + 1:]
        xg = x.reshape(new_shape)
        mn = jnp.min(xg, axis=ax + 1)
        mx = jnp.max(xg, axis=ax + 1)
        return _params_from_minmax(mn, mx, qmax, symmetric)
    else:
        raise ValueError(f"unknown granularity {granularity!r}")

    mn = jnp.min(x, axis=reduce_axes, keepdims=keepdims)
    mx = jnp.max(x, axis=reduce_axes, keepdims=keepdims)
    return _params_from_minmax(mn, mx, qmax, symmetric)


def _params_from_minmax(mn, mx, qmax, symmetric):
    if symmetric:
        amax = jnp.maximum(jnp.abs(mn), jnp.abs(mx))
        half = (qmax + 1.0) / 2.0  # 2^(bits-1)
        scale = jnp.where(amax > 0, amax / half, 1.0)
        zp = jnp.full_like(scale, half)
    else:
        # Float (unclamped) zero_point = -min/scale, so min maps exactly to
        # level 0 and max to level qmax. The reference's `quantize_tensor`
        # clamps zp to [0, qmax] (`diffuse-llm-rs/src/quantization.rs:56`),
        # which saturates any tensor with min > 0 — its own roundtrip test
        # ([1..5] @ 4 bits, err < 0.1) only passes with the unclamped form its
        # other quantizer uses (`diffusion_prefill/src/prefill_kv.rs:104-115`).
        rng = mx - mn
        scale = jnp.where(rng > 0, rng / qmax, 1.0)
        zp = -mn / scale
    return scale.astype(jnp.float32), zp.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Quantize / dequantize
# ---------------------------------------------------------------------------


def quantize(
    x: jax.Array,
    bits: int,
    *,
    symmetric: bool = False,
    granularity: Granularity = "tensor",
    group_size: int = 128,
    axis: int = -1,
    scale: Optional[jax.Array] = None,
    zero_point: Optional[jax.Array] = None,
) -> QuantizedTensor:
    """Quantize `x` to `bits` with the given granularity; returns QuantizedTensor.

    Pass precomputed (scale, zero_point) (e.g. from calibration,
    `quant/calibrate.py`) to skip the min/max pass.
    """
    x = jnp.asarray(x, jnp.float32)
    if scale is None or zero_point is None:
        scale, zero_point = compute_qparams(
            x, bits, symmetric=symmetric, granularity=granularity,
            group_size=group_size, axis=axis)
    qmax = float(qmax_for_bits(bits))
    ax = _norm_axis(axis, max(x.ndim, 1)) if x.ndim else 0

    if granularity == "group":
        n_groups = x.shape[ax] // group_size
        gshape = x.shape[:ax] + (n_groups, group_size) + x.shape[ax + 1:]
        xg = x.reshape(gshape)
        s = jnp.expand_dims(scale, ax + 1)
        z = jnp.expand_dims(zero_point, ax + 1)
        q = jnp.clip(jnp.round(xg / s + z), 0.0, qmax).astype(jnp.uint8)
        q = q.reshape(x.shape)
    else:
        q = jnp.clip(jnp.round(x / scale + zero_point), 0.0, qmax).astype(jnp.uint8)

    packed = pack_bits(q, bits)
    return QuantizedTensor(
        data=packed, scale=scale, zero_point=zero_point, bits=bits,
        shape=tuple(x.shape), granularity=granularity, group_size=group_size,
        axis=ax if x.ndim else -1, symmetric=symmetric)


def dequantize(qt: QuantizedTensor, dtype=jnp.float32) -> jax.Array:
    """Dequantize back to floats: (q - zp) * scale.

    Mirrors `dequantize_tensor` (`diffuse-llm-rs/src/quantization.rs:81-85`).
    """
    last = qt.shape[-1] if qt.shape else 1
    q = unpack_bits(qt.data, qt.bits, last).astype(jnp.float32)
    q = q.reshape(qt.shape)
    if qt.granularity == "group":
        ax = _norm_axis(qt.axis, len(qt.shape))
        n_groups = qt.shape[ax] // qt.group_size
        gshape = qt.shape[:ax] + (n_groups, qt.group_size) + qt.shape[ax + 1:]
        qg = q.reshape(gshape)
        s = jnp.expand_dims(qt.scale, ax + 1)
        z = jnp.expand_dims(qt.zero_point, ax + 1)
        out = (qg - z) * s
        out = out.reshape(qt.shape)
    else:
        out = (q - qt.zero_point) * qt.scale
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# FP8 (reference QuantizationType::Float8, quantization/src/quantize.rs:66)
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Fp8Tensor:
    """Per-tensor-scaled float8_e4m3 storage (8-bit float path)."""

    data: jax.Array  # float8_e4m3fn
    scale: jax.Array  # f32 scalar

    def tree_flatten(self):
        return (self.data, self.scale), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.data.shape

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        return self.data.astype(dtype) * self.scale.astype(dtype)


FP8_MAX = 448.0  # float8_e4m3fn finite max


def quantize_fp8(x: jax.Array) -> Fp8Tensor:
    x = jnp.asarray(x, jnp.float32)
    amax = jnp.max(jnp.abs(x))
    scale = jnp.where(amax > 0, amax / FP8_MAX, 1.0).astype(jnp.float32)
    data = (x / scale).astype(jnp.float8_e4m3fn)
    return Fp8Tensor(data=data, scale=scale)


# ---------------------------------------------------------------------------
# Convenience: quantize a pytree of weights (used by models/ and engine)
# ---------------------------------------------------------------------------


def quantize_tree(params, bits: int, *, min_size: int = 1024,
                  symmetric: bool = False, granularity: Granularity = "group",
                  group_size: int = 128, axis: int = 0,
                  exclude: Sequence[str] = ("pos_embed",)):
    """Quantize every large >=2D leaf of a parameter pytree.

    Small tensors (biases, layernorm gains) stay in full precision — standard
    weight-only quantization. Group axis defaults to 0 (the contraction axis of
    `x @ W`), matching GPTQ-style per-input-channel groups
    (`quantization/src/types.rs:112-132`). Leaves whose path contains any
    `exclude` substring stay fp (positional embeddings are sliced per-sequence
    and must remain indexable).
    """

    def _is_quantized(l):
        # QuantizedTensor / Fp8Tensor / ops layouts (MatmulWeight, Int8Weight)
        return hasattr(l, "dequantize")

    def _q(path, leaf):
        if _is_quantized(leaf):
            return leaf  # already quantized (e.g. by GPTQ) — leave intact
        path_str = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if any(e in path_str for e in exclude):
            return leaf
        if not isinstance(leaf, jnp.ndarray) and not isinstance(leaf, np.ndarray):
            return leaf
        if leaf.ndim < 2 or leaf.size < min_size or not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
        gs = group_size
        if leaf.shape[axis] % gs != 0:
            # Fall back to per-channel when the axis isn't group-divisible.
            return quantize(leaf, bits, symmetric=symmetric,
                            granularity="channel", axis=1 if leaf.ndim > 1 else 0)
        return quantize(leaf, bits, symmetric=symmetric, granularity=granularity,
                        group_size=gs, axis=axis)

    return jax.tree_util.tree_map_with_path(_q, params, is_leaf=_is_quantized)


def dequantize_tree(params, dtype=jnp.float32):
    def _is_q(l):
        # duck-typed: QuantizedTensor, Fp8Tensor, ops.pallas_matmul
        # .MatmulWeight, and ops.matmul.Int8Weight (which has dequantize +
        # col_scale but no .bits — review r5: it was silently left packed)
        return (hasattr(l, "dequantize") and
                (hasattr(l, "bits") or hasattr(l, "col_scale"))) or \
            isinstance(l, (QuantizedTensor, Fp8Tensor))

    def _d(leaf):
        if _is_q(leaf):
            return leaf.dequantize(dtype)
        return leaf
    return jax.tree_util.tree_map(_d, params, is_leaf=_is_q)
