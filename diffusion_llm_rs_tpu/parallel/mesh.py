"""GSPMD parallelism: device mesh, sharding rules, sharded train/infer steps.

The reference has NO working distributed backend — only a tokio Barrier
`SyncManager` stub and doc-comment rank/world_size semantics
(`diffuse-llm-rs/src/lib.rs:406-445`; SURVEY.md §2.1/§5.8). This module is the
TPU-native realization of that intent, per BASELINE.json config 5:

  - one `('data', 'model')` mesh spanning the slice (ICI) / pod (DCN)
  - Megatron-style tensor parallelism over the 'model' axis: attention QKV and
    MLP up-projections column-sharded, output projections row-sharded, so each
    block needs one all-reduce per sublayer (XLA inserts psum over ICI)
  - data parallelism over the 'data' axis: batch sharded, gradient psum
    emitted by GSPMD (the reference SyncManager's documented purpose)
  - quantized weights shard like their fp counterparts: the packed uint8 data
    and the per-group scale/zero-point sidecars carry the same PartitionSpec
    on the un-packed axes (SURVEY.md §2.1 TP row)

The reference's per-layer `SyncPoint` markers (`lib.rs:440-445`) map to
`jax.lax.with_sharding_constraint` at block boundaries.

Multi-host testing runs on a virtual CPU mesh (tests/conftest.py forces 8 CPU
devices); `dryrun_multichip` in `__graft_entry__.py` compiles the full sharded
training step the same way.
"""

from __future__ import annotations

import functools
import re
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.models.diffusion import DiffusionSchedule, p_losses
from diffusion_llm_rs_tpu.quant.core import QuantizedTensor


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (`jax.distributed.initialize`); no-op single-host."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(shape: Tuple[int, int] = None,
              axis_names: Tuple[str, str] = ("data", "model"),
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        # split the pow-2 factor across both axes so DP and TP are both live
        p2 = _largest_pow2_divisor(n)
        model = 1
        while model * model < p2:
            model *= 2
        shape = (n // model, model)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def _largest_pow2_divisor(n: int) -> int:
    p = 1
    while n % (p * 2) == 0:
        p *= 2
    return p


# ---------------------------------------------------------------------------
# Sharding rules (name-path driven)
# ---------------------------------------------------------------------------

# (regex over the param path, PartitionSpec). First match wins. Specs refer to
# the *logical* fp weight axes; quantized sidecars derive from these.
_RULES = [
    (r"tok_embed$", P("model", None)),          # vocab-sharded embedding
    (r"pos_embed$", P(None, None)),
    (r"attn/wqkv$", P(None, "model")),          # column parallel (fused QKV)
    (r"attn/w[qkv]$", P(None, "model")),        # column parallel
    (r"attn/wo$", P("model", None)),            # row parallel
    (r"mlp/w1$", P(None, "model")),
    (r"mlp/b1$", P("model")),
    (r"mlp/w2$", P("model", None)),
    (r"time_mlp/w1$", P(None, "model")),
    (r"time_mlp/b1$", P("model")),
    (r"time_mlp/w2$", P("model", None)),
    (r"head/w$", P(None, None)),
    (r"", P()),                                  # default: replicated
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_path(path_str: str) -> P:
    for pattern, spec in _RULES:
        if re.search(pattern, path_str):
            return spec
    return P()


def _quantized_sharding(qt: QuantizedTensor, spec: P, mesh: Mesh):
    """Shardings for (data, scale, zero_point) of a quantized weight.

    The packed uint8 data has the same rank as the fp weight (packing shrinks
    the last axis but keeps it), so it takes `spec` directly. Group sidecars
    [n_groups, N] follow the weight's axes (the group axis replaces the quant
    axis); channel sidecars broadcast, so unsharded axes stay None.
    """
    data_s = NamedSharding(mesh, spec)
    if qt.granularity == "tensor":
        side = NamedSharding(mesh, P())
    elif qt.granularity == "group":
        side = NamedSharding(mesh, P(*[spec[i] if i < len(spec) else None
                                       for i in range(qt.ndim)]))
    else:  # channel: keepdims shape, axis `qt.axis` full, others size-1
        parts = [None] * qt.ndim
        if qt.axis < len(spec):
            parts[qt.axis] = spec[qt.axis]
        side = NamedSharding(mesh, P(*parts))
    return QuantizedTensor(
        data=jax.device_put(qt.data, data_s),
        scale=jax.device_put(qt.scale, side),
        zero_point=jax.device_put(qt.zero_point, side),
        bits=qt.bits, shape=qt.shape, granularity=qt.granularity,
        group_size=qt.group_size, axis=qt.axis, symmetric=qt.symmetric)


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree onto the mesh per the TP rules."""

    def place(path, leaf):
        spec = spec_for_path(_path_str(path))
        if isinstance(leaf, QuantizedTensor):
            return _quantized_sharding(leaf, spec, mesh)
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return leaf
        if leaf.ndim < len([a for a in spec if a is not None]):
            spec = P()
        # trim spec to leaf rank
        spec = P(*(list(spec) + [None] * leaf.ndim)[: leaf.ndim])
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(
        place, params, is_leaf=lambda l: isinstance(l, QuantizedTensor))


def shard_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Shard the leading (batch) axis over 'data'."""
    spec = P(*(["data"] + [None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


# ---------------------------------------------------------------------------
# Sharded steps
# ---------------------------------------------------------------------------


def make_sharded_infer_step(cfg: DiffusionConfig, mesh: Mesh):
    """jit-compiled denoiser forward with batch over 'data', TP over 'model'."""

    @functools.partial(jax.jit,
                       out_shardings=NamedSharding(mesh, P("data", None, None)))
    def infer_step(params, x, t):
        # flash_attn=False: a single-chip Mosaic kernel inside a pjit
        # program would need shard_map; GSPMD partitions the einsum path
        eps = dn.denoiser_forward(params, cfg, x, t, flash_attn=False)
        return eps

    return infer_step


def make_sharded_sample_step(cfg: DiffusionConfig, mesh: Mesh, schedule):
    """Sharded reverse-diffusion sampling: batch over 'data', TP over 'model'.

    Uses the XLA attention path (GSPMD partitions it automatically); the
    Pallas kernels are single-chip ops — under a mesh they'd need shard_map,
    which is the round-2 fast path.
    """
    from diffusion_llm_rs_tpu.models.diffusion import sample as _sample

    jitted: dict = {}

    def run(params, key, batch: int, seq_len: int, num_steps: int):
        # memoize per shape: a fresh lambda per call would retrace and
        # RECOMPILE the whole sampling loop every time (20-280 s on TPU,
        # CLAUDE.md) — review r5
        shape_key = (batch, seq_len, num_steps)
        if shape_key not in jitted:
            def body(params, k):
                def model_fn(x, t):
                    x = jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, P("data", None, None)))
                    return dn.denoiser_forward(params, cfg, x, t,
                                               flash_attn=False)
                return _sample(model_fn, schedule,
                               (batch, seq_len, cfg.hidden_size), k,
                               num_steps=num_steps)
            jitted[shape_key] = jax.jit(
                body,
                out_shardings=NamedSharding(mesh, P("data", None, None)))
        with mesh:
            return jitted[shape_key](params, key)

    return run


def make_sharded_train_step(cfg: DiffusionConfig, mesh: Mesh,
                            schedule: DiffusionSchedule, lr: float = 1e-4):
    """Full sharded training step: p_losses grad + SGD update.

    GSPMD emits the gradient all-reduce over 'data' (the reference
    SyncManager's documented job, `lib.rs:406-427`) and the TP collectives over
    'model' automatically from the shardings.
    """

    def loss_fn(params, x0, t, noise):
        losses = p_losses(
            lambda x, tt: dn.denoiser_forward(params, cfg, x, tt,
                                              flash_attn=False),
            schedule, x0, t, noise=noise)
        return jnp.mean(losses)

    @jax.jit
    def train_step(params, x0, t, noise):
        loss, grads = jax.value_and_grad(loss_fn)(params, x0, t, noise)
        new_params = jax.tree_util.tree_map(
            lambda p, g: (p - lr * g).astype(p.dtype) if g is not None else p,
            params, grads)
        return new_params, loss

    return train_step
