"""Long-sequence regime: where the paged quantized-KV path WINS.

VERDICT r2 item 2: all serving benches ran S=128-256, where dense bf16
attention is trivially cheap — the paged machinery's justification
(SURVEY.md §5.7/§7: shrink cache reads, stream pages at long context;
`/root/reference/diffuse-llm-rs/src/lib.rs:67-68` caps seq at 1024
aspirationally) was never demonstrated. This bench measures, at
S ∈ {1024, 2048, 4096}:

  1. attention-op level: batched paged flash kernel (int4/int2 pools) vs
     dense bf16 attention vs dense fake-quant (the attend_mode="dense"
     reconstruction) — ms per attention call, scanned inside one jit;
  2. KV memory: packed pool bytes vs bf16 KV bytes at the same shape.

Prints one JSON line per row to stdout; diagnostics to stderr. Run on the
real TPU: `python benchmarks/bench_longseq.py` (env: LONGSEQ_SLOTS,
LONGSEQ_STEPS, LONGSEQ_SEQS comma-list).

The measured crossover feeds PagedContinuousBatcher's attend_mode="auto"
threshold (serving.py) and DESIGN.md's round-3 perf log.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("DLM_TPU_CACHE", "/tmp/dlm_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffusion_llm_rs_tpu.cache.paged import dequantize_page, quantize_page
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.ops.pallas_paged_attention import (
    batched_paged_attention)

B = int(os.environ.get("LONGSEQ_SLOTS", 2))
N = int(os.environ.get("LONGSEQ_STEPS", 24))      # scanned reps per timing
SEQS = [int(s) for s in
        os.environ.get("LONGSEQ_SEQS", "1024,2048,4096").split(",")]
H, Hd, G = 12, 64, 2                              # GPT-2 shape, grouped pages
PG = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, n_rep=None):
    """Slope timing (chain 3 calls vs 1, one sync each): cancels the ~23 ms
    tunnel sync instead of adding 23/N ms per scanned call (CLAUDEmd); the
    per-call work must be large vs the ~15 ms sync jitter, so short-S rows
    scale the scan length up (run_row's n_rep)."""
    n_rep = n_rep or N
    r = fn(*args)
    jax.block_until_ready(r)

    def chain(n):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
        return time.perf_counter() - t0

    slopes = sorted((chain(3) - chain(1)) / 2 for _ in range(3))
    return slopes[1] / n_rep * 1e3                # ms per scanned call


def make_pool(S, bits, key):
    """Quantized K/V pools for B slots of S tokens (grouped layout, one
    layer's worth — the per-layer cost is what we time)."""
    nps = S // PG
    vpb = 8 // bits
    HG = H // G
    kv = jax.random.normal(key, (2, B * nps, H, PG, Hd), jnp.float32)

    def grouped(x):
        d, s, z = quantize_page(x.reshape(B * nps * H, PG, Hd), bits)
        d = d.reshape(B * nps, H, PG // vpb, Hd)
        d = (d.reshape(B * nps, HG, G, PG // vpb, Hd)
             .transpose(0, 1, 3, 2, 4).reshape(B * nps, HG, PG // vpb, G * Hd))
        s = s.reshape(B * nps, HG, G * PG)
        z = z.reshape(B * nps, HG, G * PG)
        return d, s, z

    kd, ks, kz = grouped(kv[0])
    vd, vs, vz = grouped(kv[1])
    pt = jnp.arange(B * nps, dtype=jnp.int32).reshape(B, nps)
    nt = jnp.full((B, nps), PG, jnp.int32)
    npg = jnp.full((B,), nps, jnp.int32)
    return (kd, ks, kz, vd, vs, vz, pt, nt, npg)


def _einsum_attention(q, k, v):
    """The S^2-materializing XLA path (what attend_mode='dense' serving
    runs — its additive padding mask forces this path in production)."""
    import math
    logits = jnp.einsum("bshd,bthd->bhst", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(
                            q.shape[-1])
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhst,bthd->bshd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def run_row(S, bits_list=(4, 2)):
    """Measure one sequence length; returns the JSON row dict."""
    key = jax.random.PRNGKey(0)
    n_rep = N * max(1, (4096 // max(S, 1)) ** 2)
    if True:
        nps = S // PG
        kq = jax.random.normal(jax.random.PRNGKey(1), (B, H, S, Hd),
                               jnp.bfloat16)
        q4 = kq.transpose(0, 2, 1, 3)             # [B, S, H, Hd]
        k4 = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, Hd),
                               jnp.bfloat16)
        v4 = jax.random.normal(jax.random.PRNGKey(3), (B, S, H, Hd),
                               jnp.bfloat16)

        # --- dense bf16 attention, S^2-materializing XLA path -----------
        @jax.jit
        def dense_scan(q, k, v):
            def body(c, _):
                o = _einsum_attention(c, k, v)
                return c + 0.001 * o, None
            out, _ = jax.lax.scan(body, q, None, length=n_rep)
            return out
        dense_ms = timeit(dense_scan, q4, k4, v4, n_rep=n_rep)

        # --- dense bf16 FLASH attention (the fair unquantized baseline:
        # separates the don't-materialize-S^2 win from the quantized-KV
        # bandwidth win — VERDICT r3 missing #2) -------------------------
        from diffusion_llm_rs_tpu.ops.pallas_attention import dense_attention

        @jax.jit
        def flash_scan(q, k, v):
            qf = q.transpose(0, 2, 1, 3).reshape(B * H, S, Hd)
            kf = k.transpose(0, 2, 1, 3).reshape(B * H, S, Hd)
            vf = v.transpose(0, 2, 1, 3).reshape(B * H, S, Hd)

            def body(c, _):
                o = dense_attention(c, kf, vf)
                return c + 0.001 * o.astype(c.dtype), None
            out, _ = jax.lax.scan(body, qf, None, length=n_rep)
            return out
        flash_ms = timeit(flash_scan, q4, k4, v4, n_rep=n_rep)

        # --- dense fake-quant int4 (attend_mode="dense" reconstruction) -
        @jax.jit
        def fq_scan(q, k, v):
            def body(c, _):
                def fq(z):
                    zz = z.transpose(0, 2, 1, 3).reshape(B * H, S, Hd)
                    d, s, zp = quantize_page(zz, 4)
                    out = dequantize_page(d, s, zp, 4)
                    return (out.reshape(B, H, S, Hd).transpose(0, 2, 1, 3)
                            .astype(z.dtype))
                o = _einsum_attention(c, fq(k), fq(v))
                return c + 0.001 * o, None
            out, _ = jax.lax.scan(body, q, None, length=n_rep)
            return out
        fq_ms = timeit(fq_scan, q4, k4, v4, n_rep=n_rep)

        row = {"seq_len": S, "batch": B,
               "dense_bf16_ms": round(dense_ms, 3),
               "flash_bf16_ms": round(flash_ms, 3),
               "dense_fakequant_int4_ms": round(fq_ms, 3)}

        # --- paged kernel at each bit width: exact bf16 dots (the serving
        # default — also the fastest on v5e, DESIGN.md r5) and the
        # int8-MXU act_bits=8 variant ------------------------------------
        for bits in bits_list:
            pool = make_pool(S, bits, key)
            kd, ks, kz, vd, vs, vz, pt, nt, npg = pool

            for ab, suffix in ((16, ""), (8, "_a8")):
                @jax.jit
                def paged_scan(q, kd, ks, kz, vd, vs, vz, ab=ab):
                    def body(c, _):
                        o = batched_paged_attention(
                            c, pt, nt, npg, kd, ks, kz, vd, vs, vz,
                            bits=bits, head_group=G, act_bits=ab)
                        return c + 0.001 * o.astype(c.dtype), None
                    out, _ = jax.lax.scan(body, q, None, length=n_rep)
                    return out
                row[f"paged_int{bits}{suffix}_ms"] = round(
                    timeit(paged_scan, kq, kd, ks, kz, vd, vs, vz,
                           n_rep=n_rep), 3)
            packed = sum(int(a.size) * a.dtype.itemsize
                         for a in (kd, ks, kz, vd, vs, vz))
            row[f"kv_bytes_int{bits}"] = packed

        row["kv_bytes_bf16"] = 2 * B * S * H * Hd * 2
        # paged_int4_ms is the SERVING-DEFAULT kernel config (exact bf16
        # dots); *_a8_ms is the int8-MXU variant (slower on v5e — the
        # kernel is VPU-bound; DESIGN.md r5)
        row["paged_int4_vs_dense_bf16"] = round(
            row["dense_bf16_ms"] / row["paged_int4_ms"], 3)
        # the honest headline: quantized paged kernel vs bf16 FLASH — any
        # flash kernel avoids the S^2 blowup, so this ratio isolates the
        # KV-bandwidth win of the quantized pools
        row["paged_int4_vs_flash_bf16"] = round(
            row["flash_bf16_ms"] / row["paged_int4_ms"], 3)
        row["paged_int4_vs_fakequant"] = round(
            row["dense_fakequant_int4_ms"] / row["paged_int4_ms"], 3)
        log(f"S={S}: dense bf16 {dense_ms:.3f} ms, flash bf16 "
            f"{flash_ms:.3f} ms, fake-quant int4 {fq_ms:.3f} ms, "
            f"paged int4 {row['paged_int4_ms']:.3f} ms, "
            f"paged int4 a8 {row['paged_int4_a8_ms']:.3f} ms"
            + (f", paged int2 {row['paged_int2_ms']:.3f} ms"
               if "paged_int2_ms" in row else ""))
        return row


def main():
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    for S in SEQS:
        print(json.dumps(run_row(S)), flush=True)


if __name__ == "__main__":
    main()
