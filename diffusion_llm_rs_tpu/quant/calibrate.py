"""Calibration: streaming min/max, histogram, per-channel stats, quantile sketch.

TPU-native re-implementation of the reference's calibration stack:
  - `CalibrationData` min/max + histogram + per-channel
    (`quantization/src/calibrate.rs:19-110`)
  - CKMS quantile-sketch `AdaptiveQuantizer`
    (`diffuse-llm-rs/src/quantization.rs:179-235`, eps=0.01)

Reductions run as jnp ops (device-side); the small streaming state lives on host.

NOTE on exact-value parity (SURVEY.md §7 gate): the reference's own calibration
test (`quantization/src/calibrate.rs:123-132`) expects scale≈0.0235 (=6/255) and
zero_point=-43 for 8-bit asymmetric over data [1..6], which its code (scale =
(max-min)/255 = 5/255) does NOT produce — the reference does not compile or run.
We define the behavior that matches the *documented expected values*: the scale
range is widened to include zero (min(0,min)..max(0,max)), which guarantees an
exactly-representable zero, and zero_point = round_half_away(-min_observed/scale).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _round_half_away(x: float) -> int:
    """Rust's f32::round — half away from zero (numpy rounds half to even)."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


@dataclasses.dataclass
class QuantizationParams:
    """Computed calibration parameters (`quantization/src/types.rs:21-39`)."""

    bits: int
    scale: float
    zero_point: int
    symmetric: bool
    axis: Optional[int] = None


class CalibrationData:
    """Streaming calibration collector (min/max + histogram + per-channel).

    Mirrors `CalibrationData` (`quantization/src/calibrate.rs:19-69`): `update`
    folds a new tensor into global min/max, the histogram (re-binned against the
    running range), and optional per-channel (min, max) stats.
    """

    def __init__(self, num_bins: int = 2048, per_channel: bool = False):
        self.num_bins = num_bins
        self.min = float("inf")
        self.max = float("-inf")
        self.histogram = np.zeros(num_bins, dtype=np.int64)
        self.total_samples = 0
        self.per_channel_stats: Optional[Dict[int, Tuple[float, float]]] = (
            {} if per_channel else None)

    def update(self, data, channel: Optional[int] = None) -> None:
        arr = jnp.asarray(data, jnp.float32)
        mn = float(jnp.min(arr))
        mx = float(jnp.max(arr))
        self.min = min(self.min, mn)
        self.max = max(self.max, mx)
        self.total_samples += int(arr.size)

        if channel is not None and self.per_channel_stats is not None:
            old = self.per_channel_stats.get(channel, (float("inf"), float("-inf")))
            self.per_channel_stats[channel] = (min(old[0], mn), max(old[1], mx))

        if self.max > self.min:
            hist, _ = np.histogram(
                np.asarray(arr).ravel(), bins=self.num_bins,
                range=(self.min, self.max))
            # The reference re-bins each batch against the *current* running
            # range (`calibrate.rs:59-67`); earlier batches keep their old bins.
            self.histogram += hist

    def compute_params(self, bits: int, symmetric: bool) -> QuantizationParams:
        """Compute quantization parameters from observed statistics.

        Semantics per the module docstring (defined to match the reference's
        expected test values at `quantization/src/calibrate.rs:130-131`):
        8-bit asymmetric over [1, 6] -> scale = 6/255 ≈ 0.0235, zero_point = -43.
        """
        if self.total_samples == 0:
            raise ValueError("calibration requires at least one update()")
        num_levels = float(1 << bits)

        rng_lo = min(self.min, 0.0)
        rng_hi = max(self.max, 0.0)
        if (rng_hi - rng_lo) <= np.finfo(np.float32).eps:
            return QuantizationParams(bits=bits, scale=1.0, zero_point=0,
                                      symmetric=symmetric)

        if symmetric:
            max_abs = max(abs(self.max), abs(self.min))
            scale = max_abs * 2.0 / (num_levels - 1.0)
            zero_point = int(num_levels / 2.0 - 1.0)
        else:
            scale = (rng_hi - rng_lo) / (num_levels - 1.0)
            zero_point = _round_half_away(-self.min / scale)

        return QuantizationParams(bits=bits, scale=float(scale),
                                  zero_point=zero_point, symmetric=symmetric)

    def get_per_channel_stats(self):
        return self.per_channel_stats


class QuantileSketch:
    """Mergeable streaming quantile estimate with bounded error.

    Host-side replacement for the reference's CKMS sketch
    (`diffuse-llm-rs/src/quantization.rs:185-218`, eps=0.01 — 1% rank error).
    Uses a fixed uniform-rank reservoir of size ceil(1/(2*eps)) compressed from
    the sorted stream; query(q) has rank error <= eps, matching the CKMS
    contract for the quantiles this codebase uses (0.0 and 1.0 are exact).
    """

    def __init__(self, eps: float = 0.01):
        self.eps = eps
        self._k = max(int(math.ceil(1.0 / (2.0 * eps))), 2)
        self._summary: Optional[np.ndarray] = None  # sorted rank-uniform sample
        self.count = 0
        self._exact_min = float("inf")
        self._exact_max = float("-inf")

    def insert(self, data) -> None:
        arr = np.asarray(jax.device_get(jnp.asarray(data, jnp.float32))).ravel()
        if arr.size == 0:
            return
        self.count += int(arr.size)
        self._exact_min = min(self._exact_min, float(arr.min()))
        self._exact_max = max(self._exact_max, float(arr.max()))
        merged = np.sort(arr if self._summary is None
                         else np.concatenate([self._summary, arr]))
        if merged.size > 4 * self._k:
            idx = np.linspace(0, merged.size - 1, 4 * self._k).round().astype(int)
            merged = merged[idx]
        self._summary = merged

    def query(self, q: float) -> float:
        if self._summary is None:
            raise ValueError("sketch is empty")
        if q <= 0.0:
            return self._exact_min
        if q >= 1.0:
            return self._exact_max
        idx = int(round(q * (self._summary.size - 1)))
        return float(self._summary[idx])


class AdaptiveQuantizer:
    """Distribution-adaptive quantizer driven by a streaming quantile sketch.

    Mirrors `AdaptiveQuantizer` (`diffuse-llm-rs/src/quantization.rs:179-235`):
    `update_stats` feeds the sketch; `compute_params` derives (scale, zero_point)
    from the [q0, q1] range (optionally clipped to inner quantiles to shed
    outliers); `quantize` applies them.
    """

    def __init__(self, bits: int, target_ratio: float = 4.0, eps: float = 0.01,
                 clip_quantile: float = 0.0):
        self.bits = bits
        self.target_ratio = target_ratio
        self.clip_quantile = clip_quantile
        self.stats = QuantileSketch(eps=eps)

    def update_stats(self, data) -> None:
        self.stats.insert(data)

    def compute_params(self) -> Tuple[float, float]:
        try:
            lo = self.stats.query(self.clip_quantile)
            hi = self.stats.query(1.0 - self.clip_quantile)
        except ValueError:
            lo, hi = 0.0, 1.0  # reference defaults when the sketch is empty
        q_max = float((1 << self.bits) - 1)
        scale = (hi - lo) / q_max
        if scale == 0.0:
            scale = 1.0
        zero_point = float(np.clip(_round_half_away(-lo / scale), 0.0, q_max))
        return scale, zero_point

    def quantize(self, data) -> Tuple[jax.Array, float, float]:
        scale, zero_point = self.compute_params()
        q_max = float((1 << self.bits) - 1)
        x = jnp.asarray(data, jnp.float32)
        q = jnp.clip(jnp.round(x / scale) + zero_point, 0.0, q_max).astype(jnp.uint8)
        return q, scale, zero_point
