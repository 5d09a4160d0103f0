"""diffusion_llm_rs_tpu — TPU-native quantized inference engine for
diffusion-style language models.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
`zetareticula/diffusion-llm-rs` (see SURVEY.md): DDPM-style iterative-denoising
text generation, 1/2/4/8-bit weight & KV-cache quantization with fused
dequant+matmul Pallas kernels, phase-aware/progressive KV precision, salience-
driven per-block bit allocation, quantized-vector ANN index, deduplicated vector
store, shard router, BPE tokenizer, and GSPMD multi-host scaling.

This top-level module mirrors the reference's re-export shim
(`src/lib.rs:1-19`) and coordinator (`lib.rs:17-87`).
"""

__version__ = "0.1.0"

from diffusion_llm_rs_tpu import quant
from diffusion_llm_rs_tpu.config import (
    DiffusionConfig,
    PhaseQuantConfig,
    PrefillConfig,
    SystemConfig,
    WeightQuantConfig,
)


def __getattr__(name):
    # Lazy imports keep `import diffusion_llm_rs_tpu` light; the Engine pulls
    # in every subsystem.
    if name == "Engine":
        from diffusion_llm_rs_tpu.engine import Engine
        return Engine
    if name in ("ContinuousBatcher", "PagedContinuousBatcher", "Request"):
        from diffusion_llm_rs_tpu import serving
        return getattr(serving, name)
    if name in ("models", "cache", "index", "router", "storage", "parallel",
                "tokenizer", "ops", "utils"):
        import importlib
        return importlib.import_module(f"diffusion_llm_rs_tpu.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "quant", "Engine", "DiffusionConfig", "PhaseQuantConfig", "PrefillConfig",
    "SystemConfig", "WeightQuantConfig", "ContinuousBatcher",
    "PagedContinuousBatcher", "Request",
]
