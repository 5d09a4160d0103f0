"""GPTQ: error-compensated weight quantization (OBQ / GPTQ algorithm).

The reference's weight-quant config is explicitly GPTQ-shaped —
`QuantizationConfig {quant_method: "gptq", bits: 4, group_size: 128, sym,
desc_act, true_sequential}` (`/root/reference/quantization/src/types.rs:112-132`)
— but ships no implementation (round-to-nearest only). This module implements
the real thing so those fields mean something:

  - Hessian H = sum x x^T over calibration activations per linear layer
    (collected through `models.denoiser.denoiser_forward(tap=...)`).
  - Rows of W [K, N] (the input features of `x @ W`) are quantized one at a
    time; the residual error of each row, scaled by the inverse-Hessian
    Cholesky factor, is propagated into the not-yet-quantized rows — the
    standard GPTQ block update.
  - `desc_act`: rows are processed in DESCENDING diag(H) order (most
    activation-salient inputs quantized first, so compensation pushes error
    onto the least-salient ones). Group grids stay on the ORIGINAL contiguous
    layout ("static groups"), so the packed tensor and its sidecars are
    byte-identical in layout to the RTN path and the Pallas fused-matmul
    kernels consume them unchanged — no runtime permutation of activations.
  - `true_sequential`: layers are quantized in forward order and each
    forward recapture sees the ALREADY-QUANTIZED upstream weights, so every
    Hessian reflects the inputs the quantized model will actually produce.

Output is an ordinary `quant.core.QuantizedTensor` (group granularity along
axis 0) — identical storage, strictly lower ||X(W - Wq)|| than RTN.

Pure host-side load-time work (numpy float64 for the Cholesky); the hot path
is untouched.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_llm_rs_tpu.quant.core import (
    QuantizedTensor,
    pack_bits,
    qmax_for_bits,
)


class HessianCollector:
    """Accumulates H = sum x x^T per tapped linear-layer input.

    Pass `.tap` as `denoiser_forward(tap=...)`; run the forward EAGERLY (not
    under jit) so the hook sees concrete arrays. `names` optionally restricts
    collection (true_sequential re-captures one stage at a time).
    """

    def __init__(self, names: Optional[Sequence[str]] = None):
        self.names = set(names) if names is not None else None
        self.h: Dict[str, np.ndarray] = {}
        self.count: Dict[str, int] = {}

    def tap(self, name: str, x) -> None:
        if self.names is not None and name not in self.names:
            return
        x2 = np.asarray(x, np.float64).reshape(-1, x.shape[-1])
        if name not in self.h:
            self.h[name] = np.zeros((x2.shape[1], x2.shape[1]), np.float64)
            self.count[name] = 0
        self.h[name] += x2.T @ x2
        self.count[name] += x2.shape[0]


def _group_params(w: np.ndarray, qmax: float, symmetric: bool):
    """RTN grid for one group slice w [gs, N] -> (scale [N], zp [N]).

    Matches `quant.core._params_from_minmax` exactly (same grid as RTN, so
    GPTQ differs only in WHICH level each weight lands on)."""
    if symmetric:
        amax = np.max(np.abs(w), axis=0)
        half = (qmax + 1.0) / 2.0
        scale = np.where(amax > 0, amax / half, 1.0)
        zp = np.full_like(scale, half)
    else:
        mn, mx = np.min(w, axis=0), np.max(w, axis=0)
        rng = mx - mn
        scale = np.where(rng > 0, rng / qmax, 1.0)
        zp = -mn / scale
    return scale, zp


def gptq_quantize_matrix(
    w: jax.Array,
    hessian: np.ndarray,
    bits: int,
    *,
    group_size: int = 128,
    symmetric: bool = True,
    desc_act: bool = True,
    damp: float = 0.01,
    block_size: int = 128,
) -> QuantizedTensor:
    """GPTQ-quantize one weight W [K, N] (contraction axis K) given its input
    Hessian H [K, K]. Returns a group-axis-0 QuantizedTensor, same layout as
    `quant.core.quantize(..., granularity="group", axis=0)`.
    """
    W = np.asarray(w, np.float64).copy()
    K, N = W.shape
    H = np.asarray(hessian, np.float64).copy()
    if H.shape != (K, K):
        raise ValueError(f"hessian {H.shape} does not match W rows {K}")
    qmax = float(qmax_for_bits(bits))
    gs = group_size if K % group_size == 0 else K
    n_groups = K // gs

    # dead inputs: never activated -> weight value is irrelevant, zero it
    diag = np.diag(H).copy()
    dead = diag == 0
    H[dead, dead] = 1.0
    W[dead, :] = 0.0

    perm = np.argsort(-diag) if desc_act else np.arange(K)
    W = W[perm]
    H = H[perm][:, perm]

    scales = np.empty((n_groups, N), np.float64)
    zps = np.empty((n_groups, N), np.float64)
    if desc_act:
        # static groups: grids precomputed on the ORIGINAL group layout so
        # the sidecar stays contiguous (AutoGPTQ's desc_act+static_groups)
        W_orig = np.asarray(w, np.float64)
        for g in range(n_groups):
            scales[g], zps[g] = _group_params(
                W_orig[g * gs:(g + 1) * gs], qmax, symmetric)

    # damped inverse-Hessian upper Cholesky factor: inv(H) = U^T U
    H[np.diag_indices(K)] += damp * float(np.mean(np.diag(H)))
    try:
        Hinv = np.linalg.inv(H)
        U = np.linalg.cholesky(Hinv).T
    except np.linalg.LinAlgError:
        # pathological calibration: fall back to diagonal compensation
        U = np.diag(1.0 / np.sqrt(np.maximum(np.diag(H), 1e-12)))

    levels = np.empty((K, N), np.uint8)
    for i0 in range(0, K, block_size):
        i1 = min(i0 + block_size, K)
        Wb = W[i0:i1]
        Err = np.zeros_like(Wb)
        for j in range(i1 - i0):
            gj = i0 + j
            orig = perm[gj]
            g = orig // gs
            if not desc_act and gj % gs == 0:
                # dynamic grid from the error-compensated weights (perm is
                # identity here, so rows gj:gj+gs are the original group)
                scales[g], zps[g] = _group_params(W[gj:gj + gs], qmax,
                                                  symmetric)
            lv = np.clip(np.round(Wb[j] / scales[g] + zps[g]), 0.0, qmax)
            levels[orig] = lv.astype(np.uint8)
            qval = (lv - zps[g]) * scales[g]
            err = (Wb[j] - qval) / U[gj, gj]
            Wb[j + 1:] -= U[gj, gj + 1:i1, None] * err[None, :]
            Err[j] = err
        W[i1:] -= U[i0:i1, i1:].T @ Err

    packed = pack_bits(jnp.asarray(levels), bits)
    return QuantizedTensor(
        data=packed,
        scale=jnp.asarray(scales, jnp.float32),
        zero_point=jnp.asarray(zps, jnp.float32),
        bits=bits, shape=(K, N), granularity="group", group_size=gs,
        axis=0, symmetric=symmetric)


def _forward_order_names(params) -> List[List[str]]:
    """Tapped weight names grouped into forward-order stages."""
    stages = [["time_mlp/w1", "time_mlp/w2"]]
    for i in range(len(params["blocks"])):
        stages.append([f"blocks/{i}/attn/wqkv", f"blocks/{i}/attn/wo",
                       f"blocks/{i}/mlp/w1", f"blocks/{i}/mlp/w2"])
    stages.append(["head/w"])
    return stages


def _get_by_path(params, name: str):
    node = params
    for part in name.split("/"):
        node = node[int(part)] if part.isdigit() else node[part]
    return node


def _set_by_path(params, name: str, value) -> None:
    parts = name.split("/")
    node = params
    for part in parts[:-1]:
        node = node[int(part)] if part.isdigit() else node[part]
    last = parts[-1]
    if last.isdigit():
        node[int(last)] = value
    else:
        node[last] = value


def gptq_quantize_tree(
    params,
    cfg,
    calib_batches: Sequence[Tuple[jax.Array, jax.Array]],
    *,
    bits: Optional[int] = None,
    group_size: Optional[int] = None,
    symmetric: Optional[bool] = None,
    desc_act: Optional[bool] = None,
    true_sequential: Optional[bool] = None,
    damp: float = 0.01,
):
    """GPTQ-quantize the denoiser's linear weights in place of RTN.

    `calib_batches` is a sequence of (x [B,S,D] noisy embeddings, t [B])
    calibration inputs — the distribution the denoiser actually sees.
    Settings default to `cfg.weight_quant` (the reference's GPTQ config
    schema, `quantization/src/types.rs:112-132`). Returns a NEW param tree
    whose tapped 2-D weights are QuantizedTensors; embeddings and the
    positional table are left fp (quantize separately via `quantize_tree`
    if desired — they are lookup tables, not matmul operands).

    With `true_sequential`, each transformer block's Hessians are recaptured
    AFTER all upstream weights are quantized, so compensation targets the
    activations the quantized model really produces.
    """
    from diffusion_llm_rs_tpu.models import denoiser as dn

    wq = cfg.weight_quant
    bits = wq.bits if bits is None else bits
    group_size = wq.group_size if group_size is None else group_size
    symmetric = wq.sym if symmetric is None else symmetric
    desc_act = wq.desc_act if desc_act is None else desc_act
    true_sequential = (wq.true_sequential if true_sequential is None
                       else true_sequential)

    params = jax.tree_util.tree_map(lambda l: l, params)  # shallow copy tree
    stages = _forward_order_names(params)
    if not true_sequential:
        stages = [[n for stage in stages for n in stage]]

    def capture(names):
        col = HessianCollector(names)
        for x, t in calib_batches:
            dn.denoiser_forward(params, cfg, x, t, tap=col.tap)
        return col

    for stage_names in stages:
        col = capture(stage_names)
        for name in stage_names:
            leaf = _get_by_path(params, name)
            if not hasattr(leaf, "ndim") or leaf.ndim != 2:
                continue
            if name not in col.h:
                continue
            qt = gptq_quantize_matrix(
                leaf, col.h[name], bits, group_size=group_size,
                symmetric=symmetric, desc_act=desc_act, damp=damp)
            _set_by_path(params, name, qt)
    return params


def make_calib_batches(params, cfg, schedule, token_batches, key,
                       timesteps: Sequence[int] = (1, 10, 25)):
    """Build (noisy-embedding, t) calibration batches from token-id arrays —
    the forward-process inputs the denoiser sees during sampling."""
    from diffusion_llm_rs_tpu.models import denoiser as dn
    from diffusion_llm_rs_tpu.models.diffusion import add_noise

    batches = []
    for ids in token_batches:
        ids = jnp.asarray(ids, jnp.int32)
        if ids.ndim == 1:
            ids = ids[None]
        x0 = dn.embed_tokens(params, ids)
        for t in timesteps:
            t = min(t, cfg.num_timesteps - 1)
            key, sub = jax.random.split(key)
            t_vec = jnp.full((ids.shape[0],), t, jnp.int32)
            x_t, _ = add_noise(schedule, x0, t_vec, key=sub)
            batches.append((x_t, t_vec))
    return batches
