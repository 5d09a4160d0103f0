"""Per-op microbenches for the round-4 fusion candidates (real TPU).

Times each op inside a lax.scan (CLAUDE.md: tunnel dispatch floor ~0.6 ms,
so per-op timing must amortize over N scanned calls). One JSON dict on
stdout; diagnostics on stderr.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("DLM_TPU_CACHE", "/tmp/dlm_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffusion_llm_rs_tpu.ops import pallas_matmul as pmm
from diffusion_llm_rs_tpu.ops import pallas_attention as pa
from diffusion_llm_rs_tpu.ops.matmul import decode_to_int8, int8_linear
from diffusion_llm_rs_tpu.quant.core import quantize

M, D = 2048, 768
N_REP = int(os.environ.get("MB_NREP", 4096))
B, S, H = 8, 256, 12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(label, fn, *args):
    """Slope timing: per-call = (t(4 chained) - t(1)) / 3 — cancels the
    ~23 ms tunnel sync (CLAUDE.md) that otherwise swamps every op."""
    jfn = jax.jit(fn)
    r = jfn(*args)
    jax.block_until_ready(r)

    def chain(n):
        t0 = time.perf_counter()
        out = args[0]
        for _ in range(n):
            out = jfn(out, *args[1:])
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      .astype(jnp.float32)))
        return time.perf_counter() - t0

    slopes = []
    for _ in range(5):
        slopes.append((chain(3) - chain(1)) / 2)
    slopes.sort()
    ms = slopes[len(slopes) // 2] / N_REP * 1e3   # median: sync jitter is
    # heavy-tailed, min() can go negative on the slope estimator
    log(f"{label}: {ms:.4f} ms  (slopes {[round(x/N_REP*1e6,1) for x in slopes]} us)")
    return round(ms, 4)


def scan(body):
    def fn(x, *rest):
        def step(c, _):
            return body(c, *rest), None
        out, _ = jax.lax.scan(step, x, None, length=N_REP)
        return out
    return fn


def main():
    log(f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    out = {}

    def mkw(K, N, seed):
        w = jax.random.normal(jax.random.PRNGKey(seed), (K, N)) * 0.02
        qt = quantize(w, bits=4, symmetric=True, granularity="group",
                      group_size=128, axis=0)
        return decode_to_int8(pmm.prepare(qt, act_bits=8))

    w1 = mkw(D, 4 * D, 1)
    w2 = mkw(4 * D, D, 2)
    b1 = jnp.zeros((4 * D,))
    b2 = jnp.zeros((D,))
    x = jax.random.normal(key, (M, D), jnp.float32).astype(jnp.bfloat16)
    r = jnp.zeros((M, D), jnp.bfloat16)

    # --- MLP: chained int8 linears (XLA-visible) vs fused kernel ----------
    def chained(c):
        inner = int8_linear(c, w1, b1, activation="gelu",
                            out_dtype=jnp.bfloat16)
        y = int8_linear(inner, w2, b2, out_dtype=jnp.bfloat16)
        return (c + 0.001 * y).astype(jnp.bfloat16)

    def chained_resid(c):
        inner = int8_linear(c, w1, b1, activation="gelu",
                            out_dtype=jnp.bfloat16)
        y = int8_linear(inner, w2, b2, residual=c, out_dtype=jnp.bfloat16)
        return (0.999 * y).astype(jnp.bfloat16)

    def fused(c):
        y = pmm.int8w_mlp(c, w1.data, w1.col_scale, b1, w2.data,
                          w2.col_scale, b2, residual=c,
                          out_dtype=jnp.bfloat16)
        return (0.999 * y).astype(jnp.bfloat16)

    out["mlp_chained_ms"] = timeit("mlp chained", scan(chained), x)
    out["mlp_chained_resid_ms"] = timeit("mlp chained+resid-in-kernel",
                                         scan(chained_resid), x)
    out["mlp_fused_ms"] = timeit("mlp fused kernel", scan(fused), x)

    # --- wo-style linear: residual epilogue vs separate add ---------------
    wo = mkw(D, D, 3)

    def wo_sep(c):
        y = int8_linear(c, wo, out_dtype=jnp.bfloat16)
        return (c + y).astype(jnp.bfloat16) * jnp.bfloat16(0.999)

    def wo_fusedr(c):
        y = int8_linear(c, wo, residual=c, out_dtype=jnp.bfloat16)
        return y * jnp.bfloat16(0.999)

    out["wo_separate_add_ms"] = timeit("wo + separate add", scan(wo_sep), x)
    out["wo_residual_kernel_ms"] = timeit("wo residual-in-kernel",
                                          scan(wo_fusedr), x)

    # --- attention: einsum vs fused-qkv kernel vs per-head flash ----------
    qkv = jax.random.normal(key, (B, S, 3 * D), jnp.bfloat16)
    Hd = D // H

    def att_einsum(c):
        q = c[..., :D].reshape(B, S, H, Hd)
        k = c[..., D:2 * D].reshape(B, S, H, Hd)
        v = c[..., 2 * D:].reshape(B, S, H, Hd)
        lg = jnp.einsum("bshd,bthd->bhst", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(Hd)
        p = jax.nn.softmax(lg, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhst,bthd->bshd", p, v,
                       preferred_element_type=jnp.float32)
        o = o.reshape(B, S, D).astype(c.dtype)
        return c + 0.001 * jnp.tile(o, (1, 1, 3))

    def att_fusedqkv(c):
        o = pa.fused_qkv_attention(c, H)
        return c + 0.001 * jnp.tile(o, (1, 1, 3))

    def att_flash_v1(c):
        def fold(z):
            return (z.reshape(B, S, H, Hd).transpose(0, 2, 1, 3)
                    .reshape(B * H, S, Hd))
        o = pa.dense_attention(fold(c[..., :D]), fold(c[..., D:2 * D]),
                               fold(c[..., 2 * D:]))
        o = (o.reshape(B, H, S, Hd).transpose(0, 2, 1, 3)
             .reshape(B, S, D).astype(c.dtype))
        return c + 0.001 * jnp.tile(o, (1, 1, 3))

    out["attn_einsum_ms"] = timeit("attn einsum", scan(att_einsum), qkv)
    out["attn_fused_qkv_ms"] = timeit("attn fused-qkv kernel",
                                      scan(att_fusedqkv), qkv)
    out["attn_flash_v1_ms"] = timeit("attn per-head flash + transposes",
                                     scan(att_flash_v1), qkv)

    # context: ideal MXU ms for the MLP pair and attention at these shapes
    out["ideal_mlp_int8_ms"] = round(
        2 * M * D * 4 * D * 2 / 349e12 * 1e3, 4)
    out["ideal_attn_bf16_ms"] = round(
        4 * B * H * S * S * Hd / 189e12 * 1e3, 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
