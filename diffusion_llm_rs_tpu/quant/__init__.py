"""Unified quantization library (reference: `quantization/` crate + the three
duplicate per-crate quantizer stacks, unified per SURVEY.md §1)."""

from diffusion_llm_rs_tpu.quant.core import (
    SUPPORTED_BITS,
    Fp8Tensor,
    QuantizedTensor,
    compute_qparams,
    dequantize,
    dequantize_tree,
    pack_bits,
    packed_last_dim,
    qmax_for_bits,
    quantize,
    quantize_fp8,
    quantize_tree,
    unpack_bits,
)
from diffusion_llm_rs_tpu.quant.calibrate import (
    AdaptiveQuantizer,
    CalibrationData,
    QuantizationParams,
    QuantileSketch,
)

__all__ = [
    "SUPPORTED_BITS",
    "Fp8Tensor",
    "QuantizedTensor",
    "compute_qparams",
    "dequantize",
    "dequantize_tree",
    "pack_bits",
    "packed_last_dim",
    "qmax_for_bits",
    "quantize",
    "quantize_fp8",
    "quantize_tree",
    "unpack_bits",
    "AdaptiveQuantizer",
    "CalibrationData",
    "QuantizationParams",
    "QuantileSketch",
]
