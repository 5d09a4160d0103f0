"""Quantization library walkthrough (mirrors `quantization/examples/basic.rs`
and `salience-engine`/`fusion-anns` examples).

Run: python examples/quantization_basic.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffusion_llm_rs_tpu.utils.platform import honor_platform_env

honor_platform_env()

import jax.numpy as jnp
import numpy as np

from diffusion_llm_rs_tpu import quant
from diffusion_llm_rs_tpu.cache.salience import SalienceEngine
from diffusion_llm_rs_tpu.index.anns import FusionANNS


def main():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 128)),
                    jnp.float32)
    for bits in (8, 4, 2, 1):
        qt = quant.quantize(x, bits)
        err = float(jnp.mean(jnp.abs(qt.dequantize() - x)))
        print(f"int{bits}: ratio {qt.compression_ratio():.1f}x, "
              f"mean|err| {err:.4f}")

    calib = quant.CalibrationData()
    calib.update(x)
    p = calib.compute_params(8, symmetric=False)
    print(f"calibrated: scale={p.scale:.5f} zp={p.zero_point}")

    sal = SalienceEngine()
    scores = sal.calculate("the quick brown fox jumps over the lazy dog")
    print("salience('the'):", scores["the"])
    bits = sal.allocate_bits(np.array([9.0, 1.0, 5.0, 0.1]), budget_bits=4)
    print("salience-driven bit allocation:", bits.tolist())

    ann = FusionANNS(embedding_dim=128, num_centroids=4)
    ann.index_vectors([f"v{i}" for i in range(64)], np.asarray(x))
    hits = ann.search(np.asarray(x[3]), k=3)
    print("ANN top-3 for v3:", hits)


if __name__ == "__main__":
    main()
