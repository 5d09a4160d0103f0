"""Pallas TPU kernel: fused dequant + matmul for 1/2/4/8-bit weights.

The per-chip speed-of-light item (SURVEY.md §2.2 item 3, BASELINE.json north
star): the reference dequantizes whole tensors to f32 on host then `dot`s
(`diffuse-llm-rs/src/lib.rs:178-190,812`); here the packed weights stay packed
in HBM and are unpacked in-register inside the matmul tile loop.

Layout (`MatmulWeight`, produced once at weight-load time by `prepare`):
  - W [K, N] quantized at `bits` with groups of `group_size` along K.
  - data: uint8 [K/vpb, N], *block-packed* along K: byte (k, n) holds the
    levels of W[s*Kp + k, n] in bit-field s (Kp = K/vpb, vpb = 8/bits).
    Because matmul sums over K, the contraction order is free — block packing
    means in-kernel unpacking is a shift+mask per part with NO sublane/lane
    interleave (each part is a contiguous row block of x).
  - scale/zero_point: f32 [K/G, N] sidecars (or [1, N] per-channel, [1, 1]
    per-tensor).

Kernel math per (part s, K-segment g):
    acc += (x_g @ q_g - rowsum(x_g) * zp_g) * scale_g
i.e. the affine zero-point folds into a per-segment rank-1 correction, so the
MXU sees a plain int->bf16 matmul; the VPU applies per-group scales to the
(TM, TN) f32 accumulator tile. Segment width = gcd(group_size, Kp) keeps
segments inside both one group and one part (width 128 for int4/int8 with
G=128 — exactly the MXU contraction size).
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

from diffusion_llm_rs_tpu.quant.core import (
    QuantizedTensor,
    dequantize,
    unpack_bits,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MatmulWeight:
    """Kernel-ready quantized weight (see module docstring for layout).

    With `act_bits=8` (set at `prepare` time) the matmul runs the MXU in
    int8×int8→int32 — 1.85x the bf16 rate on v5e (measured 349 vs 189 TOPS).
    The packed levels are unpacked in-kernel onto a per-COLUMN signed-int8
    grid (`col_scale` = max |dequantized| per column / 127, computed exactly
    at prepare time), activations are quantized per token at call time, and
    the int32 accumulator picks up the rank-1 scale sx[m]·col_scale[n].
    Re-gridding int4 levels onto the 255-level column grid adds ≤0.4%
    relative error — an order below the int4 step itself.
    """

    data: jax.Array         # uint8 [Kp, N]
    scale: jax.Array        # f32 [K/G, N]
    zero_point: jax.Array   # f32 [K/G, N]
    bits: int
    K: int
    N: int
    group_size: int         # effective group size along K
    act_bits: int = 16      # 16 = bf16 activations; 8 = int8 MXU path
    col_scale: Optional[jax.Array] = None  # f32 [1, N] (act_bits=8 only)

    def tree_flatten(self):
        return ((self.data, self.scale, self.zero_point, self.col_scale),
                (self.bits, self.K, self.N, self.group_size, self.act_bits))

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, scale, zp, col_scale = children
        bits, K, N, group_size, act_bits = aux
        return cls(data=data, scale=scale, zero_point=zp, bits=bits, K=K,
                   N=N, group_size=group_size, act_bits=act_bits,
                   col_scale=col_scale)

    @property
    def shape(self):
        return (self.K, self.N)

    @property
    def ndim(self):
        return 2

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        vpb = 8 // self.bits
        Kp = self.K // vpb
        mask = jnp.uint8((1 << self.bits) - 1)
        parts = [((self.data >> jnp.uint8(s * self.bits)) & mask)
                 for s in range(vpb)]
        levels = jnp.concatenate(parts, axis=0).astype(jnp.float32)  # [K, N]
        G = self.group_size
        lv = levels.reshape(self.K // G, G, self.N)
        out = (lv - self.zero_point[:, None, :]) * self.scale[:, None, :]
        return out.reshape(self.K, self.N).astype(dtype)


def prepare(qt: QuantizedTensor, act_bits: int = 16) -> MatmulWeight:
    """One-time repack of a core QuantizedTensor (packed along N) into the
    kernel's block-packed-along-K layout. Run at weight-load time.

    act_bits=8 opts this weight into the int8-activation MXU path (see
    `MatmulWeight`); the exact per-column max |dequantized weight| is
    computed here for the column grid."""
    if qt.ndim != 2:
        raise ValueError(f"expected 2-D weight, got {qt.shape}")
    K, N = qt.shape
    bits = qt.bits
    vpb = 8 // bits
    if K % vpb != 0:
        raise ValueError(f"K={K} not divisible by values-per-byte {vpb}")
    levels = unpack_bits(qt.data, bits, N)  # [K, N] uint8

    if qt.granularity == "group":
        if qt.axis != 0:
            raise ValueError("matmul weights must be grouped along K (axis 0)")
        G = qt.group_size
        scale = qt.scale.astype(jnp.float32)
        zp = qt.zero_point.astype(jnp.float32)
    elif qt.granularity == "channel":
        G = K
        scale = qt.scale.reshape(1, -1).astype(jnp.float32)
        zp = qt.zero_point.reshape(1, -1).astype(jnp.float32)
        if scale.shape[1] == 1:  # channel along K: expand to [K, N] groups of 1
            raise ValueError("per-K-channel weights unsupported; use group")
    else:  # tensor
        G = K
        scale = jnp.broadcast_to(qt.scale.reshape(1, 1), (1, N)).astype(jnp.float32)
        zp = jnp.broadcast_to(qt.zero_point.reshape(1, 1), (1, N)).astype(jnp.float32)

    Kp = K // vpb
    if bits == 8:
        packed = levels
    else:
        parts = levels.reshape(vpb, Kp, N)
        acc = parts[0]
        for s in range(1, vpb):
            acc = acc | (parts[s] << jnp.uint8(s * bits))
        packed = acc
    col_scale = None
    if act_bits == 8:
        lv = levels.astype(jnp.float32).reshape(K // G, G, N)
        wabs = jnp.abs((lv - zp[:, None, :]) * scale[:, None, :])
        col_scale = jnp.maximum(jnp.max(wabs, axis=(0, 1), keepdims=False)
                                .reshape(1, N) / 127.0, 1e-12)
    elif act_bits != 16:
        raise ValueError(f"act_bits must be 8 or 16, got {act_bits}")
    return MatmulWeight(data=packed, scale=scale, zero_point=zp, bits=bits,
                        K=K, N=N, group_size=G, act_bits=act_bits,
                        col_scale=col_scale)


def _dequant_column(w_ref, scale_ref, zp_ref, w_bf, *,
                    bits: int, K: int, seg: int, n_scale_rows: int):
    """Unpack+dequantize one packed weight column into the bf16 scratch.

    Grid is (N/TN, M/TM) with the N-column OUTER, so this runs once per column
    (i == 0) and is reused by every M-tile — at steady state the MXU sees one
    full-width bf16 matmul per tile, and the only extra HBM traffic vs a bf16
    matmul is the (bits/16)x smaller packed weight read.
    """
    vpb = 8 // bits
    Kp = K // vpb
    mask = (1 << bits) - 1
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        # Mosaic legalizes neither 8-bit vector shifts (arith.shrui on i8)
        # nor direct uint8->bf16 casts: widen to int32 for shift/mask, then
        # convert straight to bf16 (levels <= 255 are exact in bf16) and do
        # the affine in bf16 — minimal VPU traffic.
        w32 = w_ref[:].astype(jnp.int32)
        for s in range(vpb):
            lv = ((w32 >> (s * bits)) & mask).astype(jnp.float32)  # [Kp, TN]
            for g in range(Kp // seg):
                k0 = g * seg
                grow = (s * Kp + k0) // (K // n_scale_rows)
                sc = scale_ref[grow:grow + 1, :]
                zp = zp_ref[grow:grow + 1, :]
                w_bf[s * Kp + k0: s * Kp + k0 + seg, :] = (
                    (lv[k0:k0 + seg, :] - zp) * sc).astype(jnp.bfloat16)


def _kernel(x_ref, w_ref, scale_ref, zp_ref, out_ref, w_bf, *,
            bits: int, K: int, seg: int, n_scale_rows: int,
            activation: Optional[str] = None):
    """One (TM, TN) output tile; full K resident in VMEM."""
    _dequant_column(w_ref, scale_ref, zp_ref, w_bf,
                    bits=bits, K=K, seg=seg, n_scale_rows=n_scale_rows)
    y = jnp.dot(x_ref[:], w_bf[:], preferred_element_type=jnp.float32)
    if activation == "gelu":
        y = jax.nn.gelu(y)
    out_ref[:] = y.astype(out_ref.dtype)


def _kernel_full(x_ref, w_ref, scale_ref, zp_ref, *args, bits: int, K: int,
                 seg: int, n_scale_rows: int,
                 activation: Optional[str] = None, has_bias: bool = False):
    """Full-width variant: grid=(M/TM,) — the WHOLE dequantized weight sits in
    the VMEM scratch, filled once on the first M-tile, so dequant runs exactly
    once per matmul and x streams through. Used when K*N*2B fits the VMEM
    budget; the (j,i) column variant handles bigger weights."""
    if has_bias:
        b_ref, out_ref, w_bf = args
    else:
        out_ref, w_bf = args
        b_ref = None
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        vpb = 8 // bits
        Kp = K // vpb
        mask = (1 << bits) - 1
        w32 = w_ref[:].astype(jnp.int32)
        for s in range(vpb):
            lv = ((w32 >> (s * bits)) & mask).astype(jnp.float32)  # [Kp, TN]
            for g in range(Kp // seg):
                k0 = g * seg
                grow = (s * Kp + k0) // (K // n_scale_rows)
                sc = scale_ref[grow:grow + 1, :]
                zp = zp_ref[grow:grow + 1, :]
                w_bf[s * Kp + k0: s * Kp + k0 + seg, :] = (
                    (lv[k0:k0 + seg, :] - zp) * sc).astype(jnp.bfloat16)

    y = jnp.dot(x_ref[:], w_bf[:], preferred_element_type=jnp.float32)
    if b_ref is not None:
        y = y + b_ref[0:1, :].astype(jnp.float32)
    if activation == "gelu":
        y = jax.nn.gelu(y)
    out_ref[:] = y.astype(out_ref.dtype)


def _kernel_bias(x_ref, w_ref, scale_ref, zp_ref, b_ref, out_ref, w_bf, *,
                 bits: int, K: int, seg: int, n_scale_rows: int,
                 activation: Optional[str] = None):
    """_kernel + fused bias row (and optional activation) in the epilogue —
    saves the full-activation HBM round trip a separate bias/act pass costs."""
    _dequant_column(w_ref, scale_ref, zp_ref, w_bf,
                    bits=bits, K=K, seg=seg, n_scale_rows=n_scale_rows)
    y = jnp.dot(x_ref[:], w_bf[:], preferred_element_type=jnp.float32)
    y = y + b_ref[0:1, :].astype(jnp.float32)
    if activation == "gelu":
        y = jax.nn.gelu(y)
    out_ref[:] = y.astype(out_ref.dtype)


def quantize_act_i8(x2: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic per-token symmetric int8 activation quantization.

    [M, K] -> (int8 levels [M, K], f32 scale [M, 1]); one XLA pass that fuses
    with the producing op."""
    x2 = x2.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x2), axis=1, keepdims=True)
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    xi = jnp.round(x2 / sx).astype(jnp.int8)
    return xi, sx


def _fill_w_i8(w_ref, scale_ref, zp_ref, cs_ref, w_i8, *, bits: int, K: int,
               seg: int, n_scale_rows: int, grid_axis: int):
    """Unpack one packed weight column onto the per-column int8 grid (runs on
    the first M-tile only; the int8 scratch is reused by every M-tile)."""
    vpb = 8 // bits
    Kp = K // vpb
    mask = (1 << bits) - 1
    i = pl.program_id(grid_axis)

    @pl.when(i == 0)
    def _():
        w32 = w_ref[:].astype(jnp.int32)
        inv_cs = 1.0 / cs_ref[0:1, :]
        for s in range(vpb):
            lv = ((w32 >> (s * bits)) & mask).astype(jnp.float32)
            for g in range(Kp // seg):
                k0 = g * seg
                grow = (s * Kp + k0) // (K // n_scale_rows)
                sc = scale_ref[grow:grow + 1, :]
                zp = zp_ref[grow:grow + 1, :]
                val = (lv[k0:k0 + seg, :] - zp) * (sc * inv_cs)
                w_i8[s * Kp + k0: s * Kp + k0 + seg, :] = (
                    jnp.clip(jnp.round(val), -127.0, 127.0)
                    .astype(jnp.int32).astype(jnp.int8))


def _kernel_i8(x_ref, xs_ref, w_ref, scale_ref, zp_ref, cs_ref, *args,
               bits: int, K: int, seg: int, n_scale_rows: int,
               activation: Optional[str] = None, has_bias: bool = False,
               grid_axis: int = 1):
    """int8×int8→int32 MXU tile: 1.85x the bf16 rate on v5e. The int32
    accumulator picks up the rank-1 scales sx[m]·col_scale[n] on the VPU."""
    if has_bias:
        b_ref, out_ref, w_i8 = args
    else:
        out_ref, w_i8 = args
        b_ref = None
    _fill_w_i8(w_ref, scale_ref, zp_ref, cs_ref, w_i8, bits=bits, K=K,
               seg=seg, n_scale_rows=n_scale_rows, grid_axis=grid_axis)
    acc = jnp.dot(x_ref[:], w_i8[:], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs_ref[:, 0:1] * cs_ref[0:1, :]
    if b_ref is not None:
        y = y + b_ref[0:1, :].astype(jnp.float32)
    if activation == "gelu":
        y = jax.nn.gelu(y)
    out_ref[:] = y.astype(out_ref.dtype)


def _quant_rows(xf: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization of a VMEM-resident f32 tile."""
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    return jnp.round(xf / sx).astype(jnp.int8), sx


def _kernel_i8w(x_ref, w_ref, cs_ref, *args,
                activation: Optional[str] = None, has_bias: bool = False,
                has_resid: bool = False):
    """Decoded-int8 fused tile: in-kernel per-ROW activation quantization
    (amax over the tile's K axis — rows are complete, so scales are exact),
    int8x8->int32 MXU dot, rank-1 scale + bias + gelu + residual epilogue.
    One pass over x instead of XLA's three (amax pass, quantize pass, dot),
    and the residual add costs no separate [M, N] HBM round trip."""
    args = list(args)
    b_ref = args.pop(0) if has_bias else None
    r_ref = args.pop(0) if has_resid else None
    (out_ref,) = args
    xf = x_ref[:].astype(jnp.float32)
    xi, sx = _quant_rows(xf)
    acc = jnp.dot(xi, w_ref[:], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * cs_ref[0:1, :]
    if b_ref is not None:
        y = y + b_ref[0:1, :].astype(jnp.float32)
    if activation == "gelu":
        y = jax.nn.gelu(y)
    if r_ref is not None:
        y = y + r_ref[:].astype(jnp.float32)
    out_ref[:] = y.astype(out_ref.dtype)


def int8w_matmul(x: jax.Array, data: jax.Array, col_scale: jax.Array,
                 bias: Optional[jax.Array] = None,
                 activation: Optional[str] = None,
                 residual: Optional[jax.Array] = None,
                 out_dtype=jnp.float32) -> Optional[jax.Array]:
    """x [..., K] @ int8 weight [K, N] (decoded `ops.matmul.Int8Weight`
    layout) via the fused Pallas tile. `residual` [..., N] adds in the
    epilogue. Returns None for kernel-unfriendly shapes or weights too
    large for VMEM (caller falls back to the XLA path — same math)."""
    lead = x.shape[:-1]
    K, N = data.shape
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    tiles = _pick_tile(M, N)
    # full int8 weight resident in VMEM; rows must tile the 32x128 int8 regs
    if tiles is None or K * N > 6 * 1024 * 1024 or K % 32 or M % 8:
        return None
    TM = tiles[0]
    specs = [
        pl.BlockSpec((TM, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [x2.astype(jnp.bfloat16), data,
              col_scale.reshape(1, N).astype(jnp.float32)]
    if bias is not None:
        specs.append(pl.BlockSpec((1, N), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))
        inputs.append(bias.reshape(1, N).astype(jnp.float32))
    if residual is not None:
        specs.append(pl.BlockSpec((TM, N), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))
        inputs.append(residual.reshape(-1, N))
    out = pl.pallas_call(
        functools.partial(_kernel_i8w, activation=activation,
                          has_bias=bias is not None,
                          has_resid=residual is not None),
        grid=(M // TM,),
        in_specs=specs,
        out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K * 2 + K * N + M * N * 4,
            transcendentals=M * N if activation else 0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*inputs)
    return out.reshape(*lead, N)


def _kernel_i8_mlp(x_ref, w1_ref, cs1_ref, b1_ref, w2_ref, cs2_ref, b2_ref,
                   *args, has_resid: bool = False):
    """Fused transformer-MLP tile: quant -> int8 dot (w1) -> bias+gelu ->
    re-quant -> int8 dot (w2) -> bias (+residual). The [TM, 4D] inner
    activation lives and dies in VMEM — the separate-matmul path writes it
    to HBM and reads it back (2 x M x 4D x 2B per layer, the single largest
    activation stream in the block)."""
    args = list(args)
    r_ref = args.pop(0) if has_resid else None
    (out_ref,) = args
    xf = x_ref[:].astype(jnp.float32)
    xi, sx = _quant_rows(xf)
    acc1 = jnp.dot(xi, w1_ref[:], preferred_element_type=jnp.int32)
    y1 = acc1.astype(jnp.float32) * sx * cs1_ref[0:1, :] \
        + b1_ref[0:1, :].astype(jnp.float32)
    y1 = jax.nn.gelu(y1)
    yi, sy = _quant_rows(y1)
    acc2 = jnp.dot(yi, w2_ref[:], preferred_element_type=jnp.int32)
    y2 = acc2.astype(jnp.float32) * sy * cs2_ref[0:1, :] \
        + b2_ref[0:1, :].astype(jnp.float32)
    if r_ref is not None:
        y2 = y2 + r_ref[:].astype(jnp.float32)
    out_ref[:] = y2.astype(out_ref.dtype)


def int8w_mlp(x: jax.Array, w1_data: jax.Array, cs1: jax.Array,
              b1: jax.Array, w2_data: jax.Array, cs2: jax.Array,
              b2: jax.Array, residual: Optional[jax.Array] = None,
              out_dtype=jnp.bfloat16) -> Optional[jax.Array]:
    """Fused x @ w1 -> gelu -> @ w2 (+residual) over decoded int8 weights.

    Activation-quantization math is identical to chaining two
    `int8w_matmul` calls (per-row symmetric int8 at each matmul input);
    only the HBM round trip of the inner activation is removed. Returns
    None when both weights + the inner tile don't fit VMEM."""
    lead = x.shape[:-1]
    K, N1 = w1_data.shape
    K2, N2 = w2_data.shape
    if N1 != K2:
        return None
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    TM = next((t for t in (256, 128, 64, 32, 16, 8) if M % t == 0), None)
    vmem = (K * N1 + K2 * N2) + TM * N1 * 4 if TM else 0
    if TM is None or vmem > 11 * 1024 * 1024 or K % 32 or N1 % 32:
        return None
    specs = [
        pl.BlockSpec((TM, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, N1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K2, N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [x2.astype(jnp.bfloat16), w1_data,
              cs1.reshape(1, N1).astype(jnp.float32),
              b1.reshape(1, N1).astype(jnp.float32), w2_data,
              cs2.reshape(1, N2).astype(jnp.float32),
              b2.reshape(1, N2).astype(jnp.float32)]
    if residual is not None:
        specs.append(pl.BlockSpec((TM, N2), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))
        inputs.append(residual.reshape(-1, N2))
    out = pl.pallas_call(
        functools.partial(_kernel_i8_mlp, has_resid=residual is not None),
        grid=(M // TM,),
        in_specs=specs,
        out_specs=pl.BlockSpec((TM, N2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N2), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N1 + 2 * M * K2 * N2,
            bytes_accessed=M * K * 2 + K * N1 + K2 * N2 + M * N2 * 2,
            transcendentals=M * N1,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*inputs)
    return out.reshape(*lead, N2)


def a8_matmul_reference(x2: jax.Array, w: MatmulWeight,
                        bias: Optional[jax.Array] = None,
                        activation: Optional[str] = None,
                        out_dtype=jnp.float32) -> jax.Array:
    """XLA twin of the int8-activation kernel (same math & operation order) —
    the fallback for kernel-unfriendly shapes and the test oracle."""
    xi, sx = quantize_act_i8(x2)
    vpb = 8 // w.bits
    Kp = w.K // vpb
    mask = jnp.uint8((1 << w.bits) - 1)
    parts = [((w.data >> jnp.uint8(s * w.bits)) & mask) for s in range(vpb)]
    lv = jnp.concatenate(parts, axis=0).astype(jnp.float32)      # [K, N]
    G = w.K // w.scale.shape[0]
    lv = lv.reshape(-1, G, w.N)
    inv_cs = 1.0 / w.col_scale
    val = (lv - w.zero_point[:, None, :]) * (w.scale[:, None, :] *
                                             inv_cs[:, None, :])
    w8 = (jnp.clip(jnp.round(val), -127.0, 127.0)
          .astype(jnp.int32).astype(jnp.int8).reshape(w.K, w.N))
    acc = jax.lax.dot_general(xi, w8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * w.col_scale
    if bias is not None:
        y = y + bias.reshape(1, w.N).astype(jnp.float32)
    if activation == "gelu":
        y = jax.nn.gelu(y)
    return y.astype(out_dtype)


def _matmul_a8(x2: jax.Array, w: MatmulWeight, lead, out_dtype,
               bias: Optional[jax.Array], activation: Optional[str]):
    """int8-activation dispatch: full-width or column-tiled kernel, XLA twin
    for odd shapes."""
    M, K = x2.shape
    vpb = 8 // w.bits
    Kp = K // vpb
    seg = math.gcd(w.group_size, Kp)
    VMEM_W_BUDGET = 6 * 1024 * 1024
    # full-width mode's (K, N) int8 scratch is bounded by its own check
    # below; only the column path needs the (K, TN) scratch bound
    full = K * w.N <= VMEM_W_BUDGET
    tiles = _pick_tile(M, w.N, K=None if full else K, scratch_itemsize=1)
    if tiles is None or seg % 8 != 0:
        return a8_matmul_reference(x2, w, bias, activation,
                                   out_dtype).reshape(*lead, w.N)
    TM, TN = tiles
    n_scale_rows = w.scale.shape[0]
    interpret = jax.default_backend() != "tpu"
    xi, sx = quantize_act_i8(x2)
    common = dict(bits=w.bits, K=K, seg=seg, n_scale_rows=n_scale_rows,
                  activation=activation, has_bias=bias is not None)
    cost = pl.CostEstimate(
        flops=2 * M * K * w.N,
        bytes_accessed=M * K + Kp * w.N + M * w.N * 4,
        transcendentals=M * w.N if activation else 0,
    )

    if full:
        grid = (M // TM,)
        idx = lambda i: (0, 0)                    # noqa: E731
        x_spec = pl.BlockSpec((TM, K), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        xs_spec = pl.BlockSpec((TM, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((TM, w.N), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        wn, grid_axis = w.N, 0
    else:
        grid = (w.N // TN, M // TM)
        idx = lambda j, i: (0, j)                 # noqa: E731
        x_spec = pl.BlockSpec((TM, K), lambda j, i: (i, 0),
                              memory_space=pltpu.VMEM)
        xs_spec = pl.BlockSpec((TM, 1), lambda j, i: (i, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((TM, TN), lambda j, i: (i, j),
                                memory_space=pltpu.VMEM)
        wn, grid_axis = TN, 1
    specs = [
        x_spec, xs_spec,
        pl.BlockSpec((Kp, wn), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((n_scale_rows, wn), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((n_scale_rows, wn), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, wn), idx, memory_space=pltpu.VMEM),
    ]
    inputs = [xi, sx, w.data, w.scale, w.zero_point, w.col_scale]
    if bias is not None:
        specs.append(pl.BlockSpec((1, wn), idx, memory_space=pltpu.VMEM))
        inputs.append(bias.reshape(1, w.N).astype(jnp.float32))
    out = pl.pallas_call(
        functools.partial(_kernel_i8, grid_axis=grid_axis, **common),
        grid=grid,
        in_specs=specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((M, w.N), out_dtype),
        scratch_shapes=[pltpu.VMEM((K, wn), jnp.int8)],
        cost_estimate=cost,
        interpret=interpret,
    )(*inputs)
    return out.reshape(*lead, w.N)


def _pick_tile(M: int, N: int, K: Optional[int] = None,
               scratch_itemsize: int = 2) -> Optional[Tuple[int, int]]:
    """Output tile for the matmul kernels. With K given, the N tile is also
    bounded so the column path's (K, TN) dequant scratch fits VMEM —
    K=8192-wide MLPs (12L/2048d) overflowed the 16 MiB budget at TN=512."""
    tm = next((t for t in (256, 128, 64, 32, 16, 8) if M % t == 0), None)
    tn = next((t for t in (512, 384, 256, 128) if N % t == 0 and
               (K is None or K * t * scratch_itemsize <= 4_500_000)), None)
    if tm is None or tn is None:
        return None
    return tm, tn


@functools.partial(jax.jit, static_argnames=("out_dtype", "activation"))
def matmul(x: jax.Array, w: MatmulWeight, out_dtype=jnp.float32,
           bias: Optional[jax.Array] = None,
           activation: Optional[str] = None) -> jax.Array:
    """x [..., K] @ W (+bias, +activation) -> [..., N], dequant in-kernel.

    bias [N] and activation ("gelu") fuse into the kernel epilogue, avoiding a
    separate elementwise pass over the full activation tensor.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    if K != w.K:
        raise ValueError(f"contraction mismatch: x K={K}, w K={w.K}")
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    if w.act_bits == 8:
        return _matmul_a8(x2, w, lead, out_dtype, bias, activation)
    vpb = 8 // w.bits
    Kp = K // vpb
    seg = math.gcd(w.group_size, Kp)
    # Full-width mode keeps the whole dequantized weight as a (K, N) VMEM
    # scratch under its own budget check; the column path's (K, TN) scratch
    # bound must not gate it, or large-K narrow-N shapes (K*TN over the
    # bound but K*N*2 under budget) lose the kernel entirely.
    full = K * w.N * 2 <= 6 * 1024 * 1024
    tiles = _pick_tile(M, w.N, K=None if full else K)
    if tiles is None or seg % 8 != 0:
        # shape not kernel-friendly: fused XLA fallback
        out = jnp.dot(x2.astype(jnp.bfloat16), w.dequantize(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        if activation == "gelu":
            out = jax.nn.gelu(out)
        return out.reshape(*lead, w.N).astype(out_dtype)
    TM, TN = tiles
    n_scale_rows = w.scale.shape[0]
    interpret = jax.default_backend() != "tpu"
    common = dict(bits=w.bits, K=K, seg=seg, n_scale_rows=n_scale_rows,
                  activation=activation)

    # Full-width mode: whole dequantized weight in VMEM, dequant once.
    if full:
        specs = [
            pl.BlockSpec((TM, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, w.N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_scale_rows, w.N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_scale_rows, w.N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs = [x2.astype(jnp.bfloat16), w.data, w.scale, w.zero_point]
        if bias is not None:
            specs.append(pl.BlockSpec((1, w.N), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
            inputs.append(bias.reshape(1, w.N).astype(jnp.float32))
        out = pl.pallas_call(
            functools.partial(_kernel_full, has_bias=bias is not None,
                              **common),
            grid=(M // TM,),
            in_specs=specs,
            out_specs=pl.BlockSpec((TM, w.N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, w.N), out_dtype),
            scratch_shapes=[pltpu.VMEM((K, w.N), jnp.bfloat16)],
            cost_estimate=pl.CostEstimate(
                flops=2 * M * K * w.N,
                bytes_accessed=M * K * 2 + Kp * w.N + M * w.N * 4,
                transcendentals=M * w.N if activation else 0,
            ),
            interpret=interpret,
        )(*inputs)
        return out.reshape(*lead, w.N)
    w_specs = [
        pl.BlockSpec((TM, K), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, TN), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_scale_rows, TN), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_scale_rows, TN), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    call = dict(
        grid=(w.N // TN, M // TM),   # N-column outer: scratch reused over M
        out_specs=pl.BlockSpec((TM, TN), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, w.N), out_dtype),
        scratch_shapes=[pltpu.VMEM((K, TN), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * w.N,
            bytes_accessed=M * K * 2 + Kp * w.N + M * w.N * 4,
            transcendentals=M * w.N if activation else 0,
        ),
        interpret=interpret,
    )
    if bias is None:
        out = pl.pallas_call(
            functools.partial(_kernel, **common),
            in_specs=w_specs, **call,
        )(x2.astype(jnp.bfloat16), w.data, w.scale, w.zero_point)
    else:
        bias2 = bias.reshape(1, w.N).astype(jnp.float32)
        out = pl.pallas_call(
            functools.partial(_kernel_bias, **common),
            in_specs=w_specs + [pl.BlockSpec((1, TN), lambda j, i: (0, j),
                                             memory_space=pltpu.VMEM)],
            **call,
        )(x2.astype(jnp.bfloat16), w.data, w.scale, w.zero_point, bias2)
    return out.reshape(*lead, w.N)


def fused_dequant_matmul(x: jax.Array,
                         qt: QuantizedTensor) -> Optional[jax.Array]:
    """Dispatch entry used by ops.matmul for raw QuantizedTensors.

    Repacking per call would double weight traffic, so this only fires for
    kernel-ready `MatmulWeight`s (see `ops.matmul.linear` dispatch); for plain
    QuantizedTensors it returns None and the caller uses the XLA-fused path.
    """
    return None
