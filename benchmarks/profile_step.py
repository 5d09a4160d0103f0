"""Ablation profile of one fused denoise step on the real TPU.

Decomposes where the step time goes (VERDICT r3 weak #3: W4A8 banks only 39%
of the int8 MXU peak) by timing the full sampler loop with components
selectively stubbed out:

  - attn=flash   : Pallas dense flash attention (production path)
  - attn=einsum  : XLA einsum + softmax (materializes [B,H,S,S] f32)
  - attn=identity: attention replaced by q (upper bound for attention cost)
  - ln=identity  : layer_norm replaced by identity (cost of LN passes)

Run: python benchmarks/profile_step.py   (real TPU; single JSON dict on stdout)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("DLM_TPU_CACHE", "/tmp/dlm_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.models.diffusion import DiffusionSchedule, sample
from diffusion_llm_rs_tpu.ops import pallas_matmul
from diffusion_llm_rs_tpu.ops.matmul import decode_to_int8
from diffusion_llm_rs_tpu.quant.core import QuantizedTensor, quantize_tree

BATCH = int(os.environ.get("BENCH_BATCH", 8))
SEQ = int(os.environ.get("BENCH_SEQ", 256))
STEPS = int(os.environ.get("BENCH_STEPS", 32))
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


from diffusion_llm_rs_tpu.ops import pallas_attention as _pa

_orig_attention = dn.attention
_orig_layer_norm = dn.layer_norm
_orig_fused_qkv = _pa.fused_qkv_attention


def _einsum_attention(q, k, v, mask=None):
    import math
    Hd = q.shape[-1]
    logits = jnp.einsum("bshd,bthd->bhst", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(Hd)
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhst,bthd->bshd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def build(cfg, params, attn="flash", ln=True):
    schedule = DiffusionSchedule.create(cfg.num_timesteps)

    def model_fn(x, t):
        # "fused" = production path (fused_qkv_attention); other variants
        # disable the fused kernel so the dn.attention patch takes effect
        if attn == "einsum":
            dn.attention = _einsum_attention
        elif attn == "identity":
            dn.attention = lambda q, k, v, mask=None: q
        else:
            dn.attention = _orig_attention
        _pa.fused_qkv_attention = (_orig_fused_qkv if attn == "fused"
                                   else (lambda *a, **k: None))
        dn.layer_norm = (_orig_layer_norm if ln
                         else (lambda x, p, eps=1e-5: x))
        try:
            eps = dn.denoiser_forward(params, cfg, x.astype(jnp.bfloat16), t)
        finally:
            dn.attention = _orig_attention
            dn.layer_norm = _orig_layer_norm
            _pa.fused_qkv_attention = _orig_fused_qkv
        return eps.astype(jnp.float32)

    @jax.jit
    def run(key):
        return sample(model_fn, schedule, (BATCH, SEQ, cfg.hidden_size), key,
                      num_steps=STEPS)

    return run


def time_run(run, label):
    """Slope-based (chain n1 vs n2 calls, one sync each): the ~23 ms tunnel
    sync cancels instead of adding 23/STEPS ms to every step (CLAUDE.md)."""
    t0 = time.perf_counter()
    float(jnp.sum(run(jax.random.PRNGKey(0))))
    log(f"{label}: compile+first {time.perf_counter() - t0:.2f}s")

    def chain(n, seed0):
        t0 = time.perf_counter()
        r = None
        for i in range(n):
            r = run(jax.random.PRNGKey(seed0 + i))
        float(jnp.sum(r))
        return time.perf_counter() - t0

    slopes = []
    for i in range(REPEATS):
        t1 = chain(1, 100 + 16 * i)
        t2 = chain(4, 200 + 16 * i)
        slopes.append((t2 - t1) / 3)
    best = min(slopes)
    ms_per_step = best / STEPS * 1e3
    log(f"{label}: {ms_per_step:.3f} ms/step  "
        f"({BATCH * SEQ * STEPS / best:.0f} step-tokens/s)")
    return ms_per_step


def main():
    log(f"backend={jax.default_backend()} B={BATCH} S={SEQ} steps={STEPS}")
    cfg = DiffusionConfig(num_timesteps=1000, hidden_size=768, num_layers=12,
                          num_attention_heads=12, vocab_size=50257,
                          max_sequence_length=max(SEQ, 256), dtype="bfloat16")
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    params_bf16 = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if hasattr(p, "astype") else p,
        params)

    qparams = quantize_tree(params, 4, symmetric=True, granularity="group",
                            group_size=128, axis=0)

    def _prep(leaf):
        if isinstance(leaf, QuantizedTensor) and leaf.ndim == 2:
            try:
                return decode_to_int8(pallas_matmul.prepare(leaf, act_bits=8))
            except ValueError:
                return leaf
        return leaf

    qparams = jax.tree_util.tree_map(
        _prep, qparams, is_leaf=lambda l: isinstance(l, QuantizedTensor))
    qparams = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if hasattr(p, "astype") and hasattr(p, "dtype")
        and p.dtype == jnp.float32 else p, qparams,
        is_leaf=lambda l: not isinstance(l, jax.Array))

    out = {}
    for pname, p in [("bf16", params_bf16), ("int4a8", qparams)]:
        for variant, kw in [
            ("fused", dict(attn="fused")),
            ("einsum", dict(attn="einsum")),
            ("attn_identity", dict(attn="identity")),
            ("no_ln", dict(attn="fused", ln=False)),
        ]:
            out[f"{pname}/{variant}"] = round(
                time_run(build(cfg, p, **kw), f"{pname}/{variant}"), 3)

    # ideal MXU times at this shape for context
    flops_lin = 2 * (3 + 1 + 4 + 4) * cfg.hidden_size ** 2 * cfg.num_layers \
        + 2 * cfg.hidden_size ** 2  # head
    flops_attn = 4 * SEQ * cfg.hidden_size * cfg.num_layers
    per_tok = flops_lin + flops_attn
    toks = BATCH * SEQ
    out["ideal_ms_bf16_189T"] = round(per_tok * toks / 189e12 * 1e3, 3)
    out["ideal_ms_int8_349T"] = round(
        (flops_lin * toks / 349e12 + flops_attn * toks / 189e12) * 1e3, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
