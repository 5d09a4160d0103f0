"""Configuration dataclass tree (json-serializable, SURVEY.md §5.6).

One unified config tree mirroring the reference's per-crate serde config structs:
  - `DiffusionConfig` (`diffuse-llm-rs/src/lib.rs:52-81`, defaults :476-493)
  - phase-aware `QuantizationConfig` (`diffuse-llm-rs/src/lib.rs:85-105`)
  - GPTQ-style `QuantizationConfig` (`quantization/src/types.rs:112-132`)
  - prefill `Config` (`diffusion_prefill/src/lib.rs:46-65`)
  - top-level `SystemConfig` (`lib.rs:36-44`)
  - kvquant `SystemConfig` (`prefill-kvquant-rs/lib.rs:77-91`)
"""

from __future__ import annotations

import dataclasses
import json
from typing import List, Optional, Tuple

from diffusion_llm_rs_tpu.models.diffusion import BetaSchedule


@dataclasses.dataclass
class PhaseQuantConfig:
    """Phase-aware quantization (`diffuse-llm-rs/src/lib.rs:85-105`)."""

    prefill_bits: int = 8
    decode_bits: int = 4
    progressive_precision: bool = True
    min_decode_bits: int = 2


@dataclasses.dataclass
class WeightQuantConfig:
    """GPTQ-style weight quantization (`quantization/src/types.rs:112-132`)."""

    quant_method: str = "gptq"
    bits: int = 4
    group_size: int = 128
    sym: bool = True
    desc_act: bool = True
    true_sequential: bool = True
    # 16 = bf16 activations; 8 = dynamic per-token int8 activations, running
    # the MXU in int8xint8 (1.85x the bf16 rate on v5e)
    act_bits: int = 16


@dataclasses.dataclass
class DiffusionConfig:
    """Model + diffusion hyperparameters (`diffuse-llm-rs/src/lib.rs:52-81`).

    Defaults are GPT-2-small-shaped per the reference (`lib.rs:476-493`).
    """

    num_timesteps: int = 1000
    use_phase_aware_quant: bool = True
    quant_config: PhaseQuantConfig = dataclasses.field(default_factory=PhaseQuantConfig)
    weight_quant: WeightQuantConfig = dataclasses.field(default_factory=WeightQuantConfig)
    hidden_size: int = 768
    num_layers: int = 12
    num_attention_heads: int = 12
    vocab_size: int = 50257
    max_sequence_length: int = 1024
    beta_start: float = 1e-4
    beta_end: float = 0.02
    beta_schedule: BetaSchedule = BetaSchedule.LINEAR
    use_kv_cache: bool = True
    kv_quant_bits: int = 4
    max_cache_size: int = 2 * 1024 * 1024 * 1024  # 2 GiB (`lib.rs:490`)
    mlp_ratio: int = 4
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, **kw) -> "DiffusionConfig":
        """Small config for tests (reference tests use tiny literal models)."""
        defaults = dict(num_timesteps=50, hidden_size=64, num_layers=2,
                        num_attention_heads=4, vocab_size=256,
                        max_sequence_length=32,
                        dtype="float32")  # tests compare at f32 tolerances
        defaults.update(kw)
        return cls(**defaults)


@dataclasses.dataclass
class PrefillConfig:
    """Prefill/cache system config (`diffusion_prefill/src/lib.rs:46-65`)."""

    cache_size: int = 1024 * 1024 * 1024  # 1 GiB
    embedding_dim: int = 768
    num_quantizers: int = 4
    quant_bits: Tuple[int, ...] = (4, 8)  # reference lists (4,6,8,16); TPU
    # packing supports power-of-two sub-byte widths (SURVEY.md §7 hard parts)
    max_sequence_length: int = 2048
    page_size: int = 64  # tokens per KV page (TPU paged-cache design)


@dataclasses.dataclass
class SystemConfig:
    """Top-level coordinator config (`lib.rs:36-44`)."""

    quantization_bits: Tuple[int, ...] = (1, 2, 4, 8)
    ssd_path: str = "/tmp/diffusion_llm_rs_tpu_store.bin"
    hbm_size_gb: int = 16
    batch_size: int = 32
    num_blocks: int = 64          # reference `num_gpu_blocks`
    enable_direct_io: bool = False
    dedup_buffer_size_mb: int = 256
    mesh_shape: Tuple[int, ...] = (1, 1)   # (data, model)
    mesh_axis_names: Tuple[str, ...] = ("data", "model")


def _to_jsonable(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _to_jsonable(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, BetaSchedule):
        return obj.value
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(x) for x in obj]
    return obj


def to_json(cfg) -> str:
    return json.dumps(_to_jsonable(cfg), indent=2)


def diffusion_config_from_json(s: str) -> DiffusionConfig:
    d = json.loads(s)
    if "quant_config" in d and isinstance(d["quant_config"], dict):
        d["quant_config"] = PhaseQuantConfig(**d["quant_config"])
    if "weight_quant" in d and isinstance(d["weight_quant"], dict):
        d["weight_quant"] = WeightQuantConfig(**d["weight_quant"])
    if "beta_schedule" in d:
        d["beta_schedule"] = BetaSchedule(d["beta_schedule"])
    return DiffusionConfig(**d)
