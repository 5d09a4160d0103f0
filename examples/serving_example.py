"""Continuous-batching serving walkthrough (BASELINE configs 4 + 5).

Three tiers of the same serving stack on a tiny model:
  1. `PagedContinuousBatcher` — quantized paged-KV pools, phase-aware
     per-slot precision, one jitted step
  2. the same batcher with salience routing — per-PAGE bit allocation from
     the in-step attention-mass proxy under the phase router's budget
  3. `ShardedPagedBatcher` — the identical scheduler over a
     ('data','model') mesh (run with
     JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
     to see a real 2x2 mesh on CPU)

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python examples/serving_example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffusion_llm_rs_tpu.utils.platform import honor_platform_env

honor_platform_env()

import jax

from diffusion_llm_rs_tpu import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.serving import PagedContinuousBatcher, Request


def drive(b, tag):
    for i, steps in enumerate([10, 6, 14, 4]):
        b.submit(Request(f"{tag}{i}", seq_len=16, num_steps=steps))
    done = b.run_until_drained()
    for c in sorted(done, key=lambda c: c.request_id):
        print(f"  {c.request_id}: {c.steps} steps, "
              f"{c.tokens.size} tokens, {c.latency_s * 1e3:.0f} ms")
    return done


def main():
    cfg = DiffusionConfig.tiny(vocab_size=256)
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)

    print("1) paged quantized-KV serving (phase-aware per-slot bits)")
    b = PagedContinuousBatcher(params, cfg, num_slots=2, seq_len=16,
                               page_size=8, attend_mode="paged")
    drive(b, "phase-")
    print(f"  KV pool HBM: {b.cache_memory_bytes()} bytes "
          f"(buckets {b.buckets})")

    print("2) salience-routed per-page precision")
    bs = PagedContinuousBatcher(params, cfg, num_slots=2, seq_len=16,
                                page_size=8, salience_routing=True,
                                attend_mode="paged")
    drive(bs, "salient-")
    print(f"  page attention-mass EMA (slot 0): {bs.page_scores[0].round(3)}")

    if len(jax.devices()) >= 4:
        from diffusion_llm_rs_tpu.parallel.mesh import make_mesh
        from diffusion_llm_rs_tpu.parallel.serving import ShardedPagedBatcher
        mesh = make_mesh((2, 2), devices=jax.devices()[:4])
        print(f"3) sharded paged serving over mesh "
              f"{dict(zip(mesh.axis_names, mesh.devices.shape))}")
        sb = ShardedPagedBatcher(params, cfg, mesh, num_slots=2, seq_len=16,
                                 page_size=8)
        drive(sb, "sharded-")
    else:
        print("3) sharded serving skipped (need >= 4 devices; set "
              "XLA_FLAGS=--xla_force_host_platform_device_count=8)")


if __name__ == "__main__":
    main()
