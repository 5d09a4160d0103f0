"""Tensor-parallel denoiser via shard_map — quantized weights included.

GSPMD (`parallel/mesh.py`) auto-partitions the fp model, but Pallas kernels
are opaque to GSPMD: to run the fused dequant+matmul kernels under tensor
parallelism the computation must be *explicitly* local — which is exactly
Megatron TP (SURVEY.md §2.1 "required: weights + quantized KV sharded ...
scales/zero-points sharded alongside packed int data"):

  - wqkv / mlp.w1 column-sharded over 'model' (each shard owns H/tp heads /
    M/tp mlp features): local matmul, no collective
  - attention is head-local (heads split over 'model')
  - wo / mlp.w2 row-sharded: local matmul then psum over 'model'
  - layernorms / embeddings replicated

`shard_tp_params` splits a (possibly MatmulWeight-quantized) param tree into
per-shard locals — packed uint8 data and scale/zero-point sidecars split on
the same logical axis. `make_tp_forward` returns a shard_map forward that
runs the Pallas kernels per shard with XLA psum over ICI between sublayers.
"""

from __future__ import annotations

import functools
import math
from typing import Any, List, Optional

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
from diffusion_llm_rs_tpu.quant.core import QuantizedTensor
from diffusion_llm_rs_tpu.ops.pallas_matmul import MatmulWeight, prepare
from diffusion_llm_rs_tpu.quant.core import quantize


def _unpack_levels(w: MatmulWeight) -> jax.Array:
    """Block-packed data -> [K, N] uint8 levels."""
    vpb = 8 // w.bits
    mask = (1 << w.bits) - 1
    w32 = w.data.astype(jnp.int32)
    parts = [((w32 >> (s * w.bits)) & mask) for s in range(vpb)]
    return jnp.concatenate(parts, axis=0).astype(jnp.uint8)


def _repack_levels(levels: jax.Array, bits: int) -> jax.Array:
    vpb = 8 // bits
    K = levels.shape[0]
    lp = levels.reshape(vpb, K // vpb, levels.shape[1])
    acc = lp[0].astype(jnp.int32)
    for s in range(1, vpb):
        acc = acc | (lp[s].astype(jnp.int32) << (s * bits))
    return acc.astype(jnp.uint8)


def _split_weight(w, axis: int, tp: int, idx: int):
    """Slice shard `idx` of a weight along `axis` (fp array or MatmulWeight)."""
    if isinstance(w, MatmulWeight):
        if axis == 1:  # column shard: split N in data + sidecars
            n_loc = w.N // tp
            sl = slice(idx * n_loc, (idx + 1) * n_loc)
            cs = None if w.col_scale is None else w.col_scale[:, sl]
            return MatmulWeight(data=w.data[:, sl], scale=w.scale[:, sl],
                                zero_point=w.zero_point[:, sl], bits=w.bits,
                                K=w.K, N=n_loc, group_size=w.group_size,
                                act_bits=w.act_bits, col_scale=cs)
        # row shard (split K): data is block-packed along K, so extract
        # levels, slice rows, repack locally.
        k_loc = w.K // tp
        vpb = 8 // w.bits
        if k_loc % vpb:
            raise ValueError(f"local K {k_loc} not packable at {w.bits} bits")
        levels = _unpack_levels(w)
        loc_levels = levels[idx * k_loc:(idx + 1) * k_loc]
        if k_loc % w.group_size == 0:
            # groups align with the shard boundary: sidecars slice exactly
            g_rows = w.scale.shape[0] // tp
            # a K-shard keeps the full-column grid: the global
            # col_scale still bounds |levels| <= 127, just slightly coarser
            return MatmulWeight(
                data=_repack_levels(loc_levels, w.bits),
                scale=w.scale[idx * g_rows:(idx + 1) * g_rows],
                zero_point=w.zero_point[idx * g_rows:(idx + 1) * g_rows],
                bits=w.bits, K=k_loc, N=w.N, group_size=w.group_size,
                act_bits=w.act_bits, col_scale=w.col_scale)
        # groups straddle the boundary: requantize the local block with a
        # group size that divides it (values unchanged up to re-rounding)
        g_new = math.gcd(w.group_size, k_loc)
        local_fp = w.dequantize()[idx * k_loc:(idx + 1) * k_loc]
        qt = quantize(local_fp, w.bits, granularity="group",
                      group_size=g_new, axis=0)
        return prepare(qt, act_bits=w.act_bits)
    # fp array
    size = w.shape[axis] // tp
    sl = [slice(None)] * w.ndim
    sl[axis] = slice(idx * size, (idx + 1) * size)
    return w[tuple(sl)]


def _split_wqkv(w, tp: int, idx: int):
    """Fused QKV [K, 3D] columns are laid out [Q | K | V]: a TP shard needs
    its head-slice of EACH third, so split the thirds separately and re-fuse."""
    if isinstance(w, MatmulWeight):
        D = w.N // 3
        d_loc = D // tp
        cols = []
        has_cs = w.col_scale is not None
        for third in range(3):
            start = third * D + idx * d_loc
            cols.append((w.data[:, start:start + d_loc],
                         w.scale[:, start:start + d_loc],
                         w.zero_point[:, start:start + d_loc],
                         w.col_scale[:, start:start + d_loc]
                         if has_cs else None))
        return MatmulWeight(
            data=jnp.concatenate([c[0] for c in cols], axis=1),
            scale=jnp.concatenate([c[1] for c in cols], axis=1),
            zero_point=jnp.concatenate([c[2] for c in cols], axis=1),
            bits=w.bits, K=w.K, N=3 * d_loc, group_size=w.group_size,
            act_bits=w.act_bits,
            col_scale=jnp.concatenate([c[3] for c in cols], axis=1)
            if has_cs else None)
    D = w.shape[1] // 3
    d_loc = D // tp
    return jnp.concatenate(
        [w[:, third * D + idx * d_loc: third * D + (idx + 1) * d_loc]
         for third in range(3)], axis=1)


_COLUMN = ("mlp/w1", "time_mlp/w1")
_COLUMN_BIAS = ("mlp/b1", "time_mlp/b1")
_ROW = ("attn/wo", "mlp/w2", "time_mlp/w2")


def shard_tp_params(params, tp: int) -> List[Any]:
    """Return `tp` local param trees (Megatron split; quantized-aware)."""

    def split_one(idx):
        def go(path, leaf):
            # raw QuantizedTensors must be prepare()d into MatmulWeight
            # first: slicing their packed uint8 data as if fp (and keeping
            # the global static shape aux) silently corrupts the shard
            # (review r5) — reject loudly instead
            if isinstance(leaf, QuantizedTensor):
                raise TypeError(
                    "shard_tp_params cannot split a raw QuantizedTensor — "
                    "run pallas_matmul.prepare() (or decode_to_int8) on the "
                    "tree first so packed data + sidecars split together")
            pstr = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in path)
            if "attn/wqkv" in pstr:
                return _split_wqkv(leaf, tp, idx)
            if any(s in pstr for s in _COLUMN):
                return _split_weight(leaf, 1, tp, idx)
            if any(s in pstr for s in _COLUMN_BIAS):
                return _split_weight(leaf, 0, tp, idx)
            if any(s in pstr for s in _ROW):
                return _split_weight(leaf, 0, tp, idx)
            return leaf
        return jax.tree_util.tree_map_with_path(
            go, params,
            is_leaf=lambda l: isinstance(l, (MatmulWeight, QuantizedTensor)))

    return [split_one(i) for i in range(tp)]


def tp_denoiser_forward(params_local, cfg: DiffusionConfig, x, t, tp: int,
                        axis_name: str = "model", attend_fn=None):
    """Megatron-TP forward on LOCAL shards; psum after row-parallel matmuls.

    Mirrors `models.denoiser.denoiser_forward` with H/tp local heads; the
    per-layer psum boundaries realize the reference's per-layer `SyncPoint`
    markers (`diffuse-llm-rs/src/lib.rs:440-445`) as real collectives.

    `attend_fn(layer_idx, q, k, v, mask)` (all [B, S, H_local, Hd]) overrides
    the dense attention — the sharded paged-serving step injects the
    quantized paged-KV kernel here (attention is head-local under TP, so the
    kernel runs unmodified on the shard's own heads).
    """
    B, S, D = x.shape
    if cfg.num_attention_heads % tp:
        # a non-dividing tp silently regroups head boundaries (each shard's
        # D//tp columns mix fractions of true heads under a wrong softmax
        # scale) — the output would be wrong with no error (review r5)
        raise ValueError(f"num_attention_heads {cfg.num_attention_heads} "
                         f"not divisible by tp {tp}")
    H_local = cfg.num_attention_heads // tp
    dtype = x.dtype

    temb = dn.timestep_embedding(t, D)
    tm = params_local["time_mlp"]
    tloc = linear(linear(temb.astype(dtype), tm["w1"], tm["b1"],
                         activation="gelu"), tm["w2"])
    temb_full = jax.lax.psum(tloc, axis_name) + tm["b2"].astype(dtype)
    h = x + params_local["pos_embed"][:S].astype(dtype)[None] \
        + temb_full[:, None, :]

    for li, blk in enumerate(params_local["blocks"]):
        hn = dn.layer_norm(h, blk["ln1"])
        a = blk["attn"]
        qkv = linear(hn, a["wqkv"])  # [B, S, 3*D/tp] — local heads
        d_loc = qkv.shape[-1] // 3
        q = dn._split_heads(qkv[..., :d_loc], H_local)
        k = dn._split_heads(qkv[..., d_loc:2 * d_loc], H_local)
        v = dn._split_heads(qkv[..., 2 * d_loc:], H_local)
        if attend_fn is not None:
            attn_out = attend_fn(li, q, k, v, None).astype(q.dtype)
        else:
            attn_out = dn.attention(q, k, v)
        attn_loc = linear(attn_out.reshape(B, S, d_loc), a["wo"])
        h = h + jax.lax.psum(attn_loc, axis_name)

        hn = dn.layer_norm(h, blk["ln2"])
        m = blk["mlp"]
        inner = linear(hn, m["w1"], m["b1"], activation="gelu")
        out_loc = linear(inner, m["w2"])
        h = h + jax.lax.psum(out_loc, axis_name) + m["b2"].astype(dtype)

    h = dn.layer_norm(h, params_local["ln_f"])
    return linear(h, params_local["head"]["w"])


def place_tp_params(params, mesh: Mesh):
    """Split + stack (leading shard axis) + device_put for `make_tp_forward`."""
    tp = mesh.shape["model"]
    locals_list = shard_tp_params(params, tp)
    stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *locals_list)

    def put(leaf):
        spec = P("model", *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, stacked)


def make_tp_forward(cfg: DiffusionConfig, mesh: Mesh,
                    axis_name: str = "model"):
    """Jitted shard_map TP forward over 'model'. Inputs x/t replicated (shard
    the batch over 'data' outside for DP x TP)."""
    tp = mesh.shape[axis_name]
    # shard_map + jit built once per param-tree structure (not per call):
    # the denoise loop calls this forward every step and a fresh jit wrapper
    # each call would retrace/relower every step.
    jitted: dict = {}

    def run(stacked_params, x, t):
        key = (jax.tree_util.tree_structure(stacked_params),
               tuple(l.ndim for l in
                     jax.tree_util.tree_leaves(stacked_params)))
        if key not in jitted:
            specs = jax.tree_util.tree_map(
                lambda l: P(axis_name, *([None] * (l.ndim - 1))),
                stacked_params)
            jitted[key] = jax.jit(shard_map(
                lambda p, xx, tt: tp_denoiser_forward(
                    jax.tree_util.tree_map(lambda l: l[0], p), cfg, xx, tt,
                    tp, axis_name),
                mesh=mesh,
                in_specs=(specs, P(), P()),
                out_specs=P(),
                check_vma=False))
        return jitted[key](stacked_params, x, t)

    return run
