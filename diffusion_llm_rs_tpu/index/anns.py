"""Fusion-ANNS: quantized-vector similarity index (IVF + batched MXU scans).

Re-implementation of both reference variants (SURVEY.md §2 items 15/16):
  - `fusion-anns/src/lib.rs`: IVF skeleton {vectors, centroids, inverted_lists},
    `index_vectors`/`query` (:91-117), top-k linear scan (:171-192) with a
    `DistanceCalculator::compute` that returns 0.0 (stub)
  - `diffusion_prefill/src/fusion_ann.rs`: PQ codebooks, per-row scalar
    quantization with cycling bit widths (:53-88), cosine top-k `search`
    (:109-136)

TPU-native design: vectors live as ONE packed quantized matrix (8-bit rows by
default) plus f32 sidecars; distance scans are batched matmuls (q @ X^T) that
run on the MXU, dequantizing on the fly inside the fused XLA computation —
not a per-vector Python loop. IVF coarse centroids are k-means on host numpy;
query probes the nearest `nprobe` lists and scans candidates.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_llm_rs_tpu.quant.core import QuantizedTensor, dequantize, quantize


@dataclasses.dataclass
class CompressedVector:
    """Per-row compressed vector (`prefill-kvquant-rs/lib.rs:62-67`,
    `diffusion_prefill/src/prefill_kv.rs:25-33`) — the lingua-franca type."""

    id: str
    data: np.ndarray          # packed uint8
    bits: int
    original_shape: Tuple[int, ...]
    quant_scale: float
    quant_zero_point: float   # float zp: (q - zp) * scale

    def to_quantized_tensor(self) -> QuantizedTensor:
        return QuantizedTensor(
            data=jnp.asarray(self.data), scale=jnp.float32(self.quant_scale),
            zero_point=jnp.float32(self.quant_zero_point), bits=self.bits,
            shape=tuple(self.original_shape))

    def dequantize(self) -> np.ndarray:
        return np.asarray(dequantize(self.to_quantized_tensor()))


def compress_rows(vectors, bits_cycle: Sequence[int],
                  ids: Optional[Sequence[str]] = None) -> List[CompressedVector]:
    """Quantize each row with cycling bit widths (`fusion_ann.rs:53-88`)."""
    arr = np.asarray(vectors, np.float32)
    out = []
    for i, row in enumerate(arr):
        bits = int(bits_cycle[i % len(bits_cycle)])
        qt = quantize(jnp.asarray(row), bits)
        out.append(CompressedVector(
            id=ids[i] if ids is not None else str(i),
            data=np.asarray(qt.data), bits=bits,
            original_shape=tuple(qt.shape),
            quant_scale=float(qt.scale),
            quant_zero_point=float(qt.zero_point)))
    return out


def _kmeans(x: np.ndarray, k: int, iters: int = 10,
            seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    k = min(k, x.shape[0])
    centroids = x[rng.choice(x.shape[0], size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - centroids[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(k):
            m = assign == j
            if m.any():
                centroids[j] = x[m].mean(0)
    return centroids


class FusionANNS:
    """IVF index over quantized vectors with MXU-batched scans."""

    def __init__(self, embedding_dim: int, num_centroids: int = 16,
                 nprobe: int = 4, storage_bits: int = 8):
        self.embedding_dim = embedding_dim
        self.num_centroids = num_centroids
        self.nprobe = nprobe
        self.storage_bits = storage_bits
        self._ids: List[str] = []
        self._id_to_row: Dict[str, int] = {}
        self._matrix: Optional[QuantizedTensor] = None  # [N, D] quantized
        self._norms: Optional[jax.Array] = None
        self.centroids: Optional[np.ndarray] = None     # [C, D]
        self.inverted_lists: Dict[int, List[int]] = {}

    def __len__(self) -> int:
        return len(self._ids)

    # -- indexing (`fusion-anns/src/lib.rs:91-101`) -------------------------

    def index_vectors(self, ids: Sequence[str], vectors) -> None:
        """Add vectors (float [N, D]); stored quantized at storage_bits."""
        arr = np.asarray(vectors, np.float32)
        if arr.ndim != 2 or arr.shape[1] != self.embedding_dim:
            raise ValueError(f"expected [N, {self.embedding_dim}], got {arr.shape}")
        existing = (np.asarray(dequantize(self._matrix))
                    if self._matrix is not None else
                    np.zeros((0, self.embedding_dim), np.float32))
        full = np.concatenate([existing, arr], 0)
        for vid in ids:
            if vid in self._id_to_row:
                raise ValueError(f"duplicate vector id {vid!r}")
            self._id_to_row[vid] = len(self._ids)
            self._ids.append(vid)
        # Per-channel (per-row) quantization: one scale per vector.
        self._matrix = quantize(jnp.asarray(full), self.storage_bits,
                                granularity="channel", axis=0)
        deq = dequantize(self._matrix)
        self._norms = jnp.linalg.norm(deq, axis=1)
        # (Re)build IVF structure.
        self.centroids = _kmeans(full, self.num_centroids)
        d = ((full[:, None, :] - self.centroids[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        self.inverted_lists = {}
        for row, c in enumerate(assign):
            self.inverted_lists.setdefault(int(c), []).append(row)

    def index_compressed(self, vectors: Sequence[CompressedVector]) -> None:
        """Index pre-compressed vectors (the reference's entry point,
        `fusion-anns/src/lib.rs:91`)."""
        if not vectors:
            return
        arr = np.stack([v.dequantize() for v in vectors])
        self.index_vectors([v.id for v in vectors], arr)

    # -- query (`fusion-anns/src/lib.rs:104-117,171-192`) -------------------

    def query(self, query_vector, k: int,
              metric: str = "cosine") -> List[Tuple[str, float]]:
        """Top-k neighbours as (id, similarity). Empty index -> []."""
        if self._matrix is None or not self._ids:
            return []
        q = jnp.asarray(np.asarray(query_vector, np.float32))
        cand = self._candidate_rows(np.asarray(q))
        mat = dequantize(self._matrix)[cand]  # [M, D]
        sims = mat @ q
        if metric == "cosine":
            qn = jnp.linalg.norm(q)
            denom = self._norms[cand] * qn
            sims = jnp.where(denom > 0, sims / denom, 0.0)
        elif metric == "l2":
            sims = -jnp.sum((mat - q[None]) ** 2, axis=1)
        k = min(k, cand.size)
        top = jax.lax.top_k(sims, k)
        vals, idx = np.asarray(top[0]), np.asarray(top[1])
        return [(self._ids[int(cand[i])], float(v)) for v, i in zip(vals, idx)]

    def search(self, query_vector, k: int) -> List[Tuple[str, float]]:
        """Cosine top-k (`diffusion_prefill/src/fusion_ann.rs:109-136`)."""
        return self.query(query_vector, k, metric="cosine")

    def _candidate_rows(self, q: np.ndarray) -> np.ndarray:
        if self.centroids is None or len(self.inverted_lists) <= 1:
            return np.arange(len(self._ids))
        d = ((self.centroids - q[None]) ** 2).sum(-1)
        probe = np.argsort(d)[: self.nprobe]
        rows: List[int] = []
        for c in probe:
            rows.extend(self.inverted_lists.get(int(c), []))
        if not rows:
            return np.arange(len(self._ids))
        return np.asarray(sorted(rows))

    # -- PQ-style batch quantization (`fusion_ann.rs:53-88`) ----------------

    def quantize(self, vectors, bits: Sequence[int]) -> List[CompressedVector]:
        return compress_rows(vectors, bits)

    def predict_next_token(self, context_vectors, vocab_size: int) -> np.ndarray:
        """Mean-pool context stub (`fusion_ann.rs:91-106`) — superseded by the
        real logits path in `models.denoiser.logits_from_hidden`."""
        if len(context_vectors):
            _ = np.mean(np.asarray(context_vectors, np.float32), axis=0)
        return np.full((vocab_size,), 1.0 / vocab_size, np.float32)


def cosine_similarity(a, b) -> float:
    """`fusion_ann.rs:139-150`."""
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na > 0 and nb > 0:
        return float(a @ b / (na * nb))
    return 0.0
