"""Salience engine: access-pattern scoring -> cache decisions & bit allocation.

Unifies the reference's two salience engines (SURVEY.md §1 dedup note):
  - standalone `salience-engine/src/lib.rs`: ImportanceScorer + AccessPattern
    {frequency, recency, importance}, CacheOptimizer, PrefillPredictor,
    combined score 0.7*base + 0.3*pred (:143-150)
  - embedded `diffusion_prefill/src/salience.rs`: word-frequency scorer with a
    bounded cache (:28-69)

TPU-native extension (BASELINE.json config 4, SURVEY.md §7): `allocate_bits`
turns salience scores into a per-block bit-width assignment under an average-
bits budget — the driver for salience-guided mixed 1/2/4/8-bit quantization of
KV pages and stored vectors.
"""

from __future__ import annotations

import dataclasses
import time
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class AccessPattern:
    """`salience-engine/src/lib.rs:24-29`."""

    frequency: int = 0
    recency: float = 0.0  # unix timestamp of last access
    importance_score: float = 0.0


class ImportanceScorer:
    """Access-pattern scorer (`salience-engine/src/lib.rs:19-29,68-90`).

    Score combines frequency with exponential recency decay (the reference
    stores both but only echoes the stored score back; we implement the
    documented intent of frequency+recency-driven importance).
    """

    def __init__(self, half_life_s: float = 300.0):
        self.half_life_s = half_life_s
        self.access_patterns: Dict[str, AccessPattern] = {}
        self.weights: Dict[str, float] = {}

    def update(self, vector_id: str, now: Optional[float] = None) -> None:
        now = time.time() if now is None else now
        pat = self.access_patterns.setdefault(vector_id, AccessPattern())
        pat.frequency += 1
        pat.recency = now
        pat.importance_score = self.score(vector_id, now)

    def score(self, vector_id: str, now: Optional[float] = None) -> float:
        pat = self.access_patterns.get(vector_id)
        if pat is None:
            return 0.0
        now = time.time() if now is None else now
        age = max(now - pat.recency, 0.0)
        decay = 0.5 ** (age / self.half_life_s)
        return float(pat.frequency) * decay


class CacheOptimizer:
    """Eviction-order selection (`salience-engine/src/lib.rs:31-34,92-100`).

    The reference truncates a sort-by-id to cache_size ("Simple LRU"); we keep
    the interface but order by salience so the kept set is the important one.
    """

    def __init__(self, cache_size: int, eviction_policy: str = "salience"):
        self.cache_size = cache_size
        self.eviction_policy = eviction_policy

    def optimize(self, ids: Sequence[str], scorer: ImportanceScorer) -> List[str]:
        ranked = sorted(ids, key=lambda i: -scorer.score(i))
        return ranked[: self.cache_size]


class PrefillPredictor:
    """Linear reuse-probability predictor (`salience-engine/src/lib.rs:36-44,102-118`)."""

    def __init__(self, feature_dim: int = 2):
        self.weights = np.zeros((feature_dim,), np.float32)
        self.bias = 0.0
        self.accuracy = 0.0

    def predict(self, pattern: Optional[AccessPattern]) -> float:
        if pattern is None:
            return 0.0
        feats = np.array([pattern.frequency,
                          pattern.importance_score], np.float32)
        return float(feats[: self.weights.size] @ self.weights + self.bias)


class SalienceEngine:
    """Combined engine (`salience-engine/src/lib.rs:13-17,130-151` +
    `diffusion_prefill/src/salience.rs:28-69`)."""

    def __init__(self, cache_size: int = 1 << 20, half_life_s: float = 300.0):
        self.scorer = ImportanceScorer(half_life_s=half_life_s)
        self.cache_optimizer = CacheOptimizer(cache_size)
        self.prefill_predictor = PrefillPredictor()
        self.cache_size = cache_size
        self._word_cache: "OrderedDict[str, float]" = OrderedDict()

    # -- vector-id interface (standalone variant) ---------------------------

    def update(self, vector_id: str) -> None:
        self.scorer.update(vector_id)

    def optimize(self, ids: Sequence[str]) -> List[str]:
        return self.cache_optimizer.optimize(ids, self.scorer)

    def predict(self, vector_id: str) -> float:
        return self.prefill_predictor.predict(
            self.scorer.access_patterns.get(vector_id))

    def score(self, vector_id: str) -> float:
        """0.7 * base + 0.3 * predicted (`salience-engine/src/lib.rs:143-150`)."""
        return 0.7 * self.scorer.score(vector_id) + 0.3 * self.predict(vector_id)

    # -- text interface (embedded variant, salience.rs:43-69) ---------------

    def calculate(self, text: str) -> Dict[str, float]:
        """Word-frequency salience with a bounded FIFO cache."""
        scores: Dict[str, float] = {}
        for word in text.split():
            w = word.lower()
            scores[w] = scores.get(w, 0.0) + 1.0
        for word, score in scores.items():
            self._word_cache[word] = score
            self._word_cache.move_to_end(word)
            while len(self._word_cache) > self.cache_size:
                self._word_cache.popitem(last=False)
        return scores

    def get_cached_score(self, word: str) -> Optional[float]:
        return self._word_cache.get(word.lower())

    # -- TPU-native: salience-driven per-block bit allocation ---------------

    def allocate_bits(
        self,
        scores: np.ndarray,
        budget_bits: float,
        bit_options: Sequence[int] = (8, 4, 2, 1),
    ) -> np.ndarray:
        """Assign a bit-width per block so mean(bits) <= budget_bits, giving
        the most salient blocks the highest precision (BASELINE.json config 4).

        Greedy: start everything at the lowest width, then upgrade blocks in
        descending-salience order while the budget allows.
        """
        return allocate_bits(scores, budget_bits, bit_options)


def allocate_bits(scores, budget_bits: float,
                  bit_options: Sequence[int] = (8, 4, 2, 1)) -> np.ndarray:
    scores = np.asarray(scores, np.float32).ravel()
    opts = sorted(set(int(b) for b in bit_options))  # ascending
    n = scores.size
    if n == 0:
        return np.zeros((0,), np.int32)
    bits = np.full(n, opts[0], np.int32)
    # visit blocks most-salient first; give each the highest width the
    # remaining budget affords (later blocks keep at least the floor width).
    # f32 accumulator: bit-for-bit the same arithmetic as the on-device twin
    # `allocate_bits_jnp`, so the fused serving chunk routes identically.
    extra = np.float32(np.float32(budget_bits) * n) - np.float32(bits.sum())
    for i in np.argsort(-scores, kind="stable"):
        for level in reversed(opts):
            delta = np.float32(level - bits[i])
            if delta <= extra:
                bits[i] = level
                extra = np.float32(extra - delta)
                break
    return bits


def allocate_bits_jnp(scores, budget_bits, valid=None,
                      bit_options: Sequence[int] = (8, 4, 2, 1)):
    """On-device twin of `allocate_bits` (jit/scan-safe), used by the fused
    serving chunk to re-route per-page precision every scan step without a
    host round trip. Same greedy, same visiting order (stable descending
    sort), same f32 budget arithmetic — bit-identical assignments.

    `scores` [n] f32; `budget_bits` scalar; `valid` optional [n] bool —
    invalid blocks are skipped entirely (sorted last, zero budget impact,
    floor width returned), mirroring the host path's slicing to the active
    page count. Returns int32 [n].
    """
    import jax
    import jax.numpy as jnp

    opts = tuple(sorted(set(int(b) for b in bit_options)))
    n = scores.shape[0]
    scores = scores.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones((n,), bool)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # invalid blocks sort last (score -inf) and are never upgraded
    order = jnp.argsort(jnp.where(valid, -scores, jnp.inf), stable=True)
    floor = jnp.int32(opts[0])
    extra0 = (jnp.float32(budget_bits) * n_valid.astype(jnp.float32)
              - (floor * n_valid).astype(jnp.float32))

    def body(extra, idx):
        ok = valid[idx]
        level = floor
        taken = jnp.float32(0.0)
        done = jnp.logical_not(ok)
        for lv in reversed(opts):       # highest affordable width wins
            delta = jnp.float32(lv - opts[0])
            afford = jnp.logical_and(jnp.logical_not(done), delta <= extra)
            level = jnp.where(afford, jnp.int32(lv), level)
            taken = jnp.where(afford, delta, taken)
            done = jnp.logical_or(done, afford)
        return extra - taken, (idx, level)

    _, (idxs, levels) = jax.lax.scan(body, extra0, order)
    out = jnp.zeros((n,), jnp.int32).at[idxs].set(levels)
    return out
