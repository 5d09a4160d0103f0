"""Core data types: TokenizedVector, Normalizer, WeightManager, PrefillKVQuant.

API-parity types for reference components that don't map onto a bigger
subsystem:
  - `TokenizedVector` {id, tokens, embeddings, attention_mask, offset} with
    `apply_mask` (`diffuse-llm-rs/src/lib.rs:664-742`) and JSON round-trip
    (the reference's serde Array2 shims, :676-714)
  - `Normalizer` zero-mean/unit-variance input normalization
    (`diffuse-llm-rs/src/lib.rs:352-357`)
  - `WeightManager` named weight/gradient storage with `apply_gradients`
    (`diffuse-llm-rs/src/lib.rs:395-400`) — in the TPU build real training
    state lives in param pytrees (parallel/mesh.py); this is the keyed
    accumulation facade for host-side tooling
  - `PrefillKVQuant` (`prefill-kvquant-rs/lib.rs:99-147`): per-bit-width
    quantizer bank with round-robin `quantize_vectors`
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_llm_rs_tpu.index.anns import CompressedVector
from diffusion_llm_rs_tpu.quant.core import quantize


@dataclasses.dataclass
class TokenizedVector:
    """`diffuse-llm-rs/src/lib.rs:664-742`."""

    id: str
    tokens: List[int]
    embeddings: np.ndarray                      # [n_tokens, dim]
    attention_mask: Optional[np.ndarray] = None
    offset: int = 0

    def apply_mask(self, mask: np.ndarray, offset: int) -> None:
        """Elementwise-mask embedding rows [offset, offset+len(mask))
        (`lib.rs:729-742`)."""
        end = min(offset + mask.shape[0], self.embeddings.shape[0])
        self.embeddings = self.embeddings.copy()
        self.embeddings[offset:end] *= mask[: end - offset]
        self.attention_mask = mask
        self.offset = offset

    def to_json(self) -> str:
        return json.dumps({
            "id": self.id, "tokens": list(map(int, self.tokens)),
            "embeddings": self.embeddings.ravel().tolist(),
            "shape": list(self.embeddings.shape),
            "attention_mask": (self.attention_mask.ravel().tolist()
                               if self.attention_mask is not None else None),
            "mask_shape": (list(self.attention_mask.shape)
                           if self.attention_mask is not None else None),
            "offset": self.offset})

    @classmethod
    def from_json(cls, s: str) -> "TokenizedVector":
        d = json.loads(s)
        emb = np.asarray(d["embeddings"], np.float32).reshape(d["shape"])
        mask = None
        if d.get("attention_mask") is not None:
            mask = np.asarray(d["attention_mask"],
                              np.float32).reshape(d["mask_shape"])
        return cls(id=d["id"], tokens=d["tokens"], embeddings=emb,
                   attention_mask=mask, offset=d.get("offset", 0))


class Normalizer:
    """Zero-mean/unit-variance normalization fit on data statistics
    (`diffuse-llm-rs/src/lib.rs:347-357`)."""

    def __init__(self, mean: float = 0.0, std: float = 1.0):
        self.mean = mean
        self.std = std

    @classmethod
    def fit(cls, data) -> "Normalizer":
        arr = jnp.asarray(data, jnp.float32)
        std = float(jnp.std(arr))
        return cls(mean=float(jnp.mean(arr)), std=std if std > 0 else 1.0)

    def normalize(self, x):
        return (jnp.asarray(x, jnp.float32) - self.mean) / self.std

    def denormalize(self, x):
        return jnp.asarray(x, jnp.float32) * self.std + self.mean


class WeightManager:
    """Named weight + gradient store with gradient application
    (`diffuse-llm-rs/src/lib.rs:362-400`). Weights live as jnp arrays
    (bf16 by default, the reference's f16 intent)."""

    def __init__(self, dtype=jnp.bfloat16):
        self.dtype = dtype
        self.weights: Dict[str, jax.Array] = {}
        self.gradients: Dict[str, jax.Array] = {}

    def set_weight(self, name: str, value) -> None:
        self.weights[name] = jnp.asarray(value).astype(self.dtype)

    def get_weight(self, name: str) -> Optional[jax.Array]:
        return self.weights.get(name)

    def update_gradient(self, name: str, grad) -> None:
        g = jnp.asarray(grad).astype(self.dtype)
        if name in self.gradients:
            self.gradients[name] = self.gradients[name] + g
        else:
            self.gradients[name] = g

    def get_gradient(self, name: str) -> Optional[jax.Array]:
        return self.gradients.get(name)

    def apply_gradients(self, lr: float = 1e-3) -> None:
        for name, g in self.gradients.items():
            if name in self.weights:
                self.weights[name] = (self.weights[name] -
                                      lr * g).astype(self.dtype)
        self.gradients.clear()


class PrefillKVQuant:
    """Bit-width quantizer bank (`prefill-kvquant-rs/lib.rs:99-147`).

    `quantize_vectors` cycles the requested bit widths over the tokenized
    vectors (the reference's `bits.iter().cycle()`, :132) and returns
    CompressedVectors — the lingua-franca type.
    """

    def __init__(self, quantization_bits: Sequence[int] = (8, 4, 2, 1)):
        from diffusion_llm_rs_tpu.quant.core import SUPPORTED_BITS
        for b in quantization_bits:
            if b not in SUPPORTED_BITS:
                raise ValueError(f"unsupported bit width {b}")
        self.quantization_bits = tuple(quantization_bits)
        self.compression_ratio = 1.0

    def quantize_vectors(self, tokens: Sequence[TokenizedVector],
                         bits: Optional[Sequence[int]] = None
                         ) -> List[CompressedVector]:
        bits = tuple(bits) if bits else self.quantization_bits
        out: List[CompressedVector] = []
        orig_bytes = comp_bytes = 0
        for i, tv in enumerate(tokens):
            b = int(bits[i % len(bits)])
            flat = jnp.asarray(tv.embeddings, jnp.float32).ravel()
            qt = quantize(flat, b)
            out.append(CompressedVector(
                id=tv.id, data=np.asarray(qt.data), bits=b,
                original_shape=tuple(tv.embeddings.shape),
                quant_scale=float(qt.scale),
                quant_zero_point=float(qt.zero_point)))
            orig_bytes += flat.size * 4
            comp_bytes += qt.packed_nbytes()
        if comp_bytes:
            self.compression_ratio = orig_bytes / comp_bytes
        return out
