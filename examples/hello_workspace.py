"""End-to-end hello: the coordinator pipeline on a tiny model.

Mirrors `examples/hello_workspace.rs` + `ZetaReticula::process_model`
(`lib.rs:66-86`): tokenize -> quantize -> dedup-store -> route -> index,
then prefill + generate + diffusion-sample.

Run: python examples/hello_workspace.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffusion_llm_rs_tpu.utils.platform import honor_platform_env

honor_platform_env()

from diffusion_llm_rs_tpu import DiffusionConfig, SystemConfig
from diffusion_llm_rs_tpu.engine import Engine


def main():
    cfg = DiffusionConfig.tiny(vocab_size=512)
    with tempfile.TemporaryDirectory() as tmp:
        engine = Engine(config=cfg, system_config=SystemConfig(
            ssd_path=os.path.join(tmp, "store.bin")))

        stats = engine.process_model(
            "the quick brown fox jumps over the lazy dog")
        print("process_model:", stats)

        n = engine.prefill("diffusion language models on TPU")
        print(f"prefilled {n} tokens")

        text = engine.generate("the quick", max_length=8)
        print("generate:", repr(text))

        samples = engine.sample(batch_size=1, seq_len=8, num_steps=10)
        print("diffusion sample:", repr(samples[0]))
        print("engine stats:", engine.stats())


if __name__ == "__main__":
    main()
