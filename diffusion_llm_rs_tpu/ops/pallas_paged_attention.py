"""Pallas TPU kernel: flash attention over PAGED quantized KV pools.

Completes the paged-cache design (SURVEY.md §7 "attention kernel must stream
pages"): K/V pages live packed in HBM pools (`cache/paged.py` layout), a
per-sequence page table names the slots, and the kernel gathers pages by
table lookup with double-buffered async DMA — no host-side gather, no fp
materialization of the cache.

Layout (matches `cache/paged.py` pools — TOKEN-block packed, so page DMA
blocks keep the last dim at D and stay lane-aligned at every bit width):
  - k_data/v_data: uint8 [n_slots, BH, P/vpb, D]
  - k_scale/k_zp/v_scale/v_zp: f32 [n_slots, BH, P]  (per-token sidecars)
  - page_table: int32 [n_pages]  (slot per logical page, scalar-prefetched)

Per (bh, q-tile) grid cell the kernel walks the page list: DMA page j+1's six
buffers into the alternate VMEM slot while computing online-softmax flash
attention over page j (same folded-affine math as `pallas_attention`).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(pt_ref,                                  # scalar prefetch [n_pages]
            nt_ref,                                  # scalar prefetch [n_pages]
            q_ref, kd_ref, ks_ref, kz_ref, vd_ref, vs_ref, vz_ref,
            out_ref, lse_ref,
            kbuf, ksbuf, kzbuf, vbuf, vsbuf, vzbuf, sems,
            *, bits: int, D: int, P: int, n_pages: int, sm_scale: float):
    vpb = 8 // bits
    mask = (1 << bits) - 1
    bh = pl.program_id(0)
    q = q_ref[0]                       # [TQ, D] bf16
    TQ = q.shape[0]
    qsum = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)

    def start_dma(j, slot_buf):
        slot = pt_ref[j]
        copies = [
            pltpu.make_async_copy(kd_ref.at[slot, bh], kbuf.at[slot_buf],
                                  sems.at[slot_buf, 0]),
            pltpu.make_async_copy(ks_ref.at[slot, bh], ksbuf.at[slot_buf],
                                  sems.at[slot_buf, 1]),
            pltpu.make_async_copy(kz_ref.at[slot, bh], kzbuf.at[slot_buf],
                                  sems.at[slot_buf, 2]),
            pltpu.make_async_copy(vd_ref.at[slot, bh], vbuf.at[slot_buf],
                                  sems.at[slot_buf, 3]),
            pltpu.make_async_copy(vs_ref.at[slot, bh], vsbuf.at[slot_buf],
                                  sems.at[slot_buf, 4]),
            pltpu.make_async_copy(vz_ref.at[slot, bh], vzbuf.at[slot_buf],
                                  sems.at[slot_buf, 5]),
        ]
        for c in copies:
            c.start()

    def wait_dma(j, slot_buf):
        slot = pt_ref[j]
        pltpu.make_async_copy(kd_ref.at[slot, bh], kbuf.at[slot_buf],
                              sems.at[slot_buf, 0]).wait()
        pltpu.make_async_copy(ks_ref.at[slot, bh], ksbuf.at[slot_buf],
                              sems.at[slot_buf, 1]).wait()
        pltpu.make_async_copy(kz_ref.at[slot, bh], kzbuf.at[slot_buf],
                              sems.at[slot_buf, 2]).wait()
        pltpu.make_async_copy(vd_ref.at[slot, bh], vbuf.at[slot_buf],
                              sems.at[slot_buf, 3]).wait()
        pltpu.make_async_copy(vs_ref.at[slot, bh], vsbuf.at[slot_buf],
                              sems.at[slot_buf, 4]).wait()
        pltpu.make_async_copy(vz_ref.at[slot, bh], vzbuf.at[slot_buf],
                              sems.at[slot_buf, 5]).wait()

    def unpack(buf_ref, slot_buf):
        t32 = buf_ref[slot_buf].astype(jnp.int32)      # [P/vpb, D]
        parts = [((t32 >> (p * bits)) & mask)
                 .astype(jnp.float32).astype(jnp.bfloat16)
                 for p in range(vpb)]
        return jnp.concatenate(parts, axis=0)          # [P, D] token order

    start_dma(0, 0)

    m = jnp.full((TQ, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((TQ, 1), jnp.float32)
    acc = jnp.zeros((TQ, D), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        slot_buf = j % 2

        @pl.when(j + 1 < n_pages)
        def _():
            start_dma(j + 1, (j + 1) % 2)

        wait_dma(j, slot_buf)

        k_lv = unpack(kbuf, slot_buf)                  # [P, D]
        ks = ksbuf[slot_buf][0:1, :]                   # [1, P]
        kz = kzbuf[slot_buf][0:1, :]
        raw = jax.lax.dot_general(
            q, k_lv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [TQ, P]
        logits = (raw * ks - qsum * (ks * kz)) * sm_scale
        # partial last page: token rows >= nt_ref[j] are pad, mask them out
        valid = nt_ref[j]
        tok = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(tok < valid, logits, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(logits, axis=1, keepdims=True))
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)

        v_lv = unpack(vbuf, slot_buf)
        vs = vsbuf[slot_buf][0:1, :]
        vz = vzbuf[slot_buf][0:1, :]
        ps = (p * vs).astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            ps, v_lv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        corr = jnp.sum(p * vs * vz, axis=1, keepdims=True)
        return m_new, l_new, acc * alpha + pv - corr

    m, l, acc = jax.lax.fori_loop(0, n_pages, body, (m, l, acc))
    out_ref[0] = (acc / l).astype(out_ref.dtype)
    # log-sum-exp residual enables exact flash-merge of partial results
    # (mixed-precision page chains run one kernel call per bit bucket)
    lse_ref[...] = (m + jnp.log(l)).reshape(1, 1, 1, -1)


@functools.partial(jax.jit,
                   static_argnames=("bits", "sm_scale", "return_lse"))
def paged_attention(
    q: jax.Array,              # [BH, Sq, D]
    page_table: jax.Array,     # int32 [n_pages]
    k_data: jax.Array,         # uint8 [n_slots, BH, P/vpb, D]
    k_scale: jax.Array,        # f32 [n_slots, BH, P]
    k_zp: jax.Array,
    v_data: jax.Array,
    v_scale: jax.Array,
    v_zp: jax.Array,
    bits: int,
    sm_scale: Optional[float] = None,
    page_tokens: Optional[jax.Array] = None,  # int32 [n_pages] valid tokens
    return_lse: bool = False,
):
    """Flash attention over a paged quantized KV sequence.

    `page_tokens[j]` marks how many leading tokens of page j are valid
    (partial last page); defaults to all-full. With `return_lse` the
    per-query log-sum-exp is returned alongside the output so partial
    results over disjoint page sets merge exactly (`merge_partials`).
    """
    BH, Sq, D = q.shape
    n_slots, BH2, Pp, D2 = k_data.shape
    assert BH2 == BH and D2 == D
    vpb = 8 // bits
    P = Pp * vpb
    n_pages = page_table.shape[0]
    if page_tokens is None:
        page_tokens = jnp.full((n_pages,), P, jnp.int32)
    sm = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
    TQ = next((t for t in (256, 128, 64, 32, 16, 8) if Sq % t == 0), None)
    # TPU DMA needs the page block's last dim lane-aligned (token-block
    # packing keeps it at D for every bit width) and the packed token axis
    # sublane-aligned.
    if TQ is None or D % 128 != 0 or Pp % 8 != 0 or P % 128 != 0:
        return _fallback(q, page_table, k_data, k_scale, k_zp,
                         v_data, v_scale, v_zp, bits, sm, page_tokens,
                         return_lse)

    # sidecars reshaped so DMA'd blocks are [1, P] (lane-aligned)
    ks3 = k_scale[:, :, None, :]
    kz3 = k_zp[:, :, None, :]
    vs3 = v_scale[:, :, None, :]
    vz3 = v_zp[:, :, None, :]

    kernel = functools.partial(_kernel, bits=bits, D=D, P=P,
                               n_pages=n_pages, sm_scale=sm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BH, Sq // TQ),
        in_specs=[
            pl.BlockSpec((1, TQ, D), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # k_data (HBM)
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),  # v_data
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, TQ, D), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # lse kept 4-D with a unit axis before the lane axis: the last
            # TWO block dims must be (divisible by (8,128)) or equal to the
            # array dims — (1, TQ) over a unit dim is always legal, even
            # when Sq/TQ > 1 (long sequences)
            pl.BlockSpec((1, 1, 1, TQ), lambda b, i, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Pp, D), jnp.uint8),    # k pages (token-packed)
            pltpu.VMEM((2, 1, P), jnp.float32),   # k scale
            pltpu.VMEM((2, 1, P), jnp.float32),   # k zp
            pltpu.VMEM((2, Pp, D), jnp.uint8),    # v pages
            pltpu.VMEM((2, 1, P), jnp.float32),
            pltpu.VMEM((2, 1, P), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((BH, Sq, D), jnp.float32),
                   jax.ShapeDtypeStruct((BH, Sq // TQ, 1, TQ), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(page_table.astype(jnp.int32), page_tokens.astype(jnp.int32),
      q.astype(jnp.bfloat16), k_data, ks3, kz3, v_data, vs3, vz3)
    lse = lse.reshape(BH, Sq)
    return (out, lse) if return_lse else out


def merge_partials(parts) -> jax.Array:
    """Exact flash-merge of attention partials over disjoint key sets.

    parts: list of (out [BH, Sq, D], lse [BH, Sq]) from `paged_attention(...,
    return_lse=True)` calls over disjoint page sets (e.g. one per bit-width
    bucket of a salience-allocated mixed-precision chain)."""
    if len(parts) == 1:
        return parts[0][0]
    lses = jnp.stack([p[1] for p in parts])            # [n, BH, Sq]
    outs = jnp.stack([p[0] for p in parts])            # [n, BH, Sq, D]
    m = jnp.max(lses, axis=0, keepdims=True)
    w = jnp.exp(lses - m)                              # [n, BH, Sq]
    denom = jnp.sum(w, axis=0)                         # [BH, Sq]
    num = jnp.sum(outs * w[..., None], axis=0)         # [BH, Sq, D]
    # a slot with no pages in ANY bucket has all lse=-inf -> denom 0; keep
    # its output at 0 instead of NaN (inactive continuous-batching slot)
    return num / jnp.where(denom > 0, denom, 1.0)[..., None]


def _fallback(q, page_table, k_data, k_scale, k_zp, v_data, v_scale, v_zp,
              bits, sm, page_tokens, return_lse=False):
    """XLA gather + dequant + attention (kernel-unfriendly shapes)."""
    def deq(data, scale, zp):
        pages = data[page_table]        # [n_pages, BH, P/vpb, D]
        sc = scale[page_table]          # [n_pages, BH, P]
        z = zp[page_table]
        vpb = 8 // bits
        mask = (1 << bits) - 1
        d32 = pages.astype(jnp.int32)
        parts = [((d32 >> (p * bits)) & mask) for p in range(vpb)]
        lv = jnp.concatenate(parts, axis=2).astype(jnp.float32)  # token order
        full = (lv - z[..., None]) * sc[..., None]     # [n_pages, BH, P, D]
        return jnp.moveaxis(full, 1, 0).reshape(
            pages.shape[1], -1, lv.shape[-1])           # [BH, S, D]

    kd = deq(k_data, k_scale, k_zp)
    vd = deq(v_data, v_scale, v_zp)
    n_pages = page_table.shape[0]
    P = kd.shape[1] // n_pages
    tok = jnp.arange(P)[None, :]                        # [1, P]
    valid = (tok < page_tokens[:, None]).reshape(-1)    # [n_pages*P]
    logits = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32), kd) * sm
    logits = jnp.where(valid[None, None, :], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bqk,bkd->bqd", p, vd)
    if return_lse:
        return out, jax.scipy.special.logsumexp(logits, axis=-1)
    return out


# ---------------------------------------------------------------------------
# Batched multi-sequence variant (continuous-batching serving path)
# ---------------------------------------------------------------------------


def _batched_kernel(pt_ref,      # scalar prefetch [B, n_pages_max]
                    nt_ref,      # scalar prefetch [B, n_pages_max]
                    np_ref,      # scalar prefetch [B] pages per slot
                    q_ref, kd_ref, vd_ref, side_ref,
                    out_ref, lse_ref,
                    kbuf, vbuf, sbuf, acc_ref, ml_ref, qi_ref, qm_ref,
                    sems,
                    *, bits: int, D: int, P: int, sm_scale: float,
                    G: int = 1, QC: int = 2048, act_bits: int = 16,
                    NP: int = 1):
    """One (batch-slot, head-group) grid cell; the page LOOP BOUND is the
    slot's dynamic page count (scalar-prefetched), so inactive slots cost
    nothing and sequence lengths vary per slot without recompilation.

    Round-4 restructure: the WHOLE query sequence lives in the cell (chunked
    at QC rows) and pages are the outer loop, so each page is DMA'd and
    unpacked exactly ONCE per (slot, head-group) — the previous per-q-tile
    grid re-fetched and re-unpacked every page Sq/TQ times, which at S=4096
    made the kernel 3.4x slower than the dense bf16 flash kernel. All
    accumulation is TRANSPOSED ([GD, Sq]: channels in sublanes, query
    positions in lanes) so online-softmax stats are cheap [1, Sq] lane
    rows and the head-g accumulator band is a contiguous sublane slice.

    With G > 1 (head grouping, for head_dim D < 128), G heads share the
    128-lane page block and q is zero-masked to head g's lanes before each
    full-width dot (the contraction never mixes heads); head g's output is
    rows [g*D, (g+1)*D) of the transposed accumulator.

    Round-5: 3 DMAs per page (packed K, packed V, one consolidated
    [4G, P] sidecar block) instead of 6, and `act_bits=8` runs QK^T and AV
    on the int8 MXU (1.85x the bf16 rate on v5e, CLAUDE.md) — the one lever
    VERDICT r4 named behind paged-int4's 0.70x-vs-flash loss:
      - KV levels are ALREADY integers: widen packed bytes to int8,
        centered at 2^(bits-1) (offset folds into the zero-points — see
        the `off` comment below for why centering matters at every width).
      - q is quantized per (head, row) symmetric-int8 ONCE per cell into
        the qi/qm scratch (the bf16 path re-masked q per page); the rank-1
        scale sq[query] rides the int32 accumulator on the VPU.
      - AV folds the per-token V scale into P (as the bf16 path does), then
        quantizes the folded weights per QUERY column to int8 (w <= its
        column max by construction); the column scale factors back out.
      - pages are processed in GROUPS of NP (a8 only): the int8 MXU rate on
        v5e is gated by the CONTRACTION size (measured in-kernel: 119 T/s
        at K=128, 262 T/s at K=512, vs bf16's flat ~97), and AV contracts
        the page-token axis — grouping NP=4 pages turns the AV dot into a
        K=512 int8 matmul. V levels are transposed once per group so both
        dots run in standard MXU orientation (a transposed-LHS int8 dot
        drops to bf16 speed).
    Accuracy (measured, tests/test_paged_attention.py): log-sum-exp within
    4e-3 of the exact kernel and output relative error 1.6-2.9% across KV
    widths (P's column scale spans the NP-page group) — a third of the
    int4 KV step itself; end-to-end ppl cost measured in BENCH_QUALITY.md's
    kv-int4+a8attn row.
    """
    vpb = 8 // bits
    mask = (1 << bits) - 1
    a8 = act_bits == 8
    # page grouping exists only on the a8 path; the bf16 path's DMAs copy
    # single-page sources into the full buffer slot and its unpack reads
    # the whole buffer, so NP > 1 would misread it
    assert a8 or NP == 1, "NP page grouping requires act_bits=8"
    # a8 levels are CENTERED (lv - 2^(bits-1), folded into the zero-points):
    # for bits=8 it is what makes 0..255 fit signed int8 at all, and for
    # every width it kills the coherent error term — the int8 dots'
    # rounding errors multiply |lv|, and sum(q) / sum(P·sv) corrections are
    # exact, so an uncentered mean(lv) turns random ±0.5-level noise into a
    # bias that scales with the zero-point cancellation (measured 2.5x
    # error reduction at 2-4 bit KV)
    off = (1 << (bits - 1)) if a8 else 0
    b = pl.program_id(0)
    h = pl.program_id(1)               # head-group index
    count = np_ref[b]
    # q arrives TRANSPOSED ([G*D, Sq]: channels in sublanes, queries in
    # lanes, matching the accumulator layout): every dot below is then in
    # standard (contract LHS lanes with RHS sublanes) orientation — the
    # row-major q of rounds <=4 made Mosaic relayout the RHS per dot, which
    # on the int8 path erased the MXU win (measured +33% at S=2048) — and
    # all per-query stats ([1, QC] rows) fall out of axis-0 reductions with
    # no [QC,1]->[1,QC] transposes.
    q = q_ref[0, 0]                    # [G*D, Sq] bf16
    Sq = q.shape[1]
    GD = G * D
    n_chunks = max(Sq // QC, 1)
    QC = min(QC, Sq)

    subl = jax.lax.broadcasted_iota(jnp.int32, (GD, 1), 0)
    band_masks = [(subl // D == g).astype(jnp.float32) for g in range(G)]

    refs = (kd_ref, vd_ref, side_ref)
    bufs = (kbuf, vbuf, sbuf)

    def start_dma(j, slot_buf):
        slot = pt_ref[b, j]
        for i, (r, sc) in enumerate(zip(refs, bufs)):
            pltpu.make_async_copy(r.at[slot, h], sc.at[slot_buf],
                                  sems.at[slot_buf, i, 0]).start()

    def wait_dma(j, slot_buf):
        slot = pt_ref[b, j]
        for i, (r, sc) in enumerate(zip(refs, bufs)):
            pltpu.make_async_copy(r.at[slot, h], sc.at[slot_buf],
                                  sems.at[slot_buf, i, 0]).wait()

    def unpack(buf_ref, slot_buf):
        t32 = buf_ref[slot_buf].astype(jnp.int32)      # [P/vpb, G*D]
        if a8:
            parts = [(((t32 >> (p * bits)) & mask) - off).astype(jnp.int8)
                     for p in range(vpb)]
        else:
            parts = [((t32 >> (p * bits)) & mask)
                     .astype(jnp.float32).astype(jnp.bfloat16)
                     for p in range(vpb)]
        return jnp.concatenate(parts, axis=0)          # [P, G*D] token order

    acc_ref[...] = jnp.zeros((GD, Sq), jnp.float32)
    # per-head online-softmax stats in scratch (Mosaic has no
    # dynamic_update_slice on values): m_g at row g, l_g at row G+g
    ml_ref[0:G, :] = jnp.full((G, Sq), NEG_INF, jnp.float32)
    ml_ref[G:2 * G, :] = jnp.zeros((G, Sq), jnp.float32)

    # q preparation runs ONCE per cell (both paths) — rounds <= 4 re-did
    # the head mask + cast + channel sum for EVERY page (~0.3 ms of pure
    # VPU work at S=4096); the page loop below only reads scratch.
    if a8:
        # head g's band-masked channels -> int8 levels (qi scratch, kept
        # transposed [GD, Sq]) + [1, Sq] rows of scale and quantized-q sum
        # (qm scratch: row g = sq_g, row G+g = sum(q̂_g)).
        for g in range(G):
            for c in range(n_chunks):
                q0 = c * QC
                qc = q[:, q0:q0 + QC].astype(jnp.float32)   # [GD, QC]
                if G > 1:
                    qc = qc * band_masks[g]
                amax = jnp.max(jnp.abs(qc), axis=0, keepdims=True)  # [1,QC]
                sq = jnp.where(amax > 0, amax / 127.0, 1.0)
                qi = jnp.round(qc / sq).astype(jnp.int8)
                qi_ref[g, :, q0:q0 + QC] = qi
                qm_ref[g:g + 1, q0:q0 + QC] = sq
                qm_ref[G + g:G + g + 1, q0:q0 + QC] = jnp.sum(
                    qi.astype(jnp.float32), axis=0, keepdims=True) * sq
    else:
        # bf16 path: masked q (G > 1 reuses the qi scratch at bf16) +
        # per-query channel sums into qm rows
        for g in range(G):
            for c in range(n_chunks):
                q0 = c * QC
                qc = q[:, q0:q0 + QC].astype(jnp.float32)   # [GD, QC]
                if G > 1:
                    qc = qc * band_masks[g]
                    qi_ref[g, :, q0:q0 + QC] = qc.astype(jnp.bfloat16)
                qm_ref[g:g + 1, q0:q0 + QC] = jnp.sum(
                    qc, axis=0, keepdims=True)

    if not a8:
        @pl.when(count > 0)
        def _():
            start_dma(0, 0)

        def body(j, carry):
            slot_buf = j % 2

            @pl.when(j + 1 < count)
            def _():
                start_dma(j + 1, (j + 1) % 2)

            wait_dma(j, slot_buf)
            k_lv = unpack(kbuf, slot_buf)              # [P, G*D]
            v_lv = unpack(vbuf, slot_buf)
            # consolidated sidecars [4G, P] -> per-head [P, 1] columns
            side = sbuf[slot_buf]
            valid = nt_ref[b, j]
            tokcol = jax.lax.broadcasted_iota(jnp.int32, (P, QC), 0)

            # fold the per-token V scale into the PAGE ([P, GD], one pass
            # per page, lane-selected per head) instead of into P ([P, QC]
            # per chunk per head — 16x the elements at QC=2048): band g of
            # the AV dot then reads v[t,d]*vs_g[t], exactly the fold the
            # old w = p*vs did, and the zero-point correction keeps its
            # own per-head column c_g = vs_g*vz_g
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, GD), 1)
            vs_full = jnp.zeros((P, GD), jnp.float32)
            for g in range(G):
                vs_g = side[2 * G + g:2 * G + g + 1, :].reshape(P, 1)
                vs_full = vs_full + jnp.where(
                    lane // D == g, vs_g, 0.0) if G > 1 else vs_g
            v_sc = (v_lv.astype(jnp.float32) * vs_full).astype(jnp.bfloat16)

            for g in range(G):
                # fold sm_scale into the per-token K scale: one [P, 1]
                # multiply instead of a [P, QC] pass per chunk
                ks = side[g:g + 1, :].reshape(P, 1) * sm_scale
                kz = side[G + g:G + g + 1, :].reshape(P, 1)
                vs = side[2 * G + g:2 * G + g + 1, :].reshape(P, 1)
                vz = side[3 * G + g:3 * G + g + 1, :].reshape(P, 1)
                cg = vs * vz                           # [P, 1]
                for c in range(n_chunks):
                    q0 = c * QC
                    m = ml_ref[g:g + 1, q0:q0 + QC]    # [1, QC]
                    l = ml_ref[G + g:G + g + 1, q0:q0 + QC]
                    qg = (qi_ref[g, :, q0:q0 + QC] if G > 1
                          else q[:, q0:q0 + QC])       # [GD, QC] bf16
                    qsum = qm_ref[g:g + 1, q0:q0 + QC]  # [1, QC]
                    raw = jax.lax.dot_general(
                        k_lv, qg, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)    # [P, QC]
                    logits = raw * ks - (ks * kz) * qsum
                    # NOTE: branch-skipping this mask for full pages via
                    # lax.cond was measured SLOWER (+0.25 ms at S=4096) —
                    # the branch splits Mosaic's fused elementwise chain
                    # and the logits round-trip VMEM around it
                    logits = jnp.where(tokcol < valid, logits, NEG_INF)

                    m_new = jnp.maximum(
                        m, jnp.max(logits, axis=0, keepdims=True))
                    p = jnp.exp(logits - m_new)            # [P, QC]
                    alpha = jnp.exp(m - m_new)             # [1, QC]
                    l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)

                    pv = jax.lax.dot_general(
                        v_sc, p.astype(jnp.bfloat16),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)    # [GD, QC]
                    corr = jnp.sum(p * cg, axis=0, keepdims=True)  # [1, QC]
                    band = acc_ref[g * D:(g + 1) * D, q0:q0 + QC]
                    acc_ref[g * D:(g + 1) * D, q0:q0 + QC] = (
                        band * alpha + pv[g * D:(g + 1) * D, :] - corr)
                    ml_ref[g:g + 1, q0:q0 + QC] = m_new
                    ml_ref[G + g:G + g + 1, q0:q0 + QC] = l_new
            return carry

        jax.lax.fori_loop(0, count, body, 0)
    else:
        # --- int8-MXU path: pages in groups of NP -----------------------
        Pp = P // vpb
        NPP = NP * P
        npmax = nt_ref.shape[1]
        n_groups = (count + NP - 1) // NP

        def start_group(j, slot_buf):
            for i in range(NP):
                jj = j * NP + i

                @pl.when(jj < count)
                def _():
                    slot = pt_ref[b, jj]
                    pltpu.make_async_copy(
                        kd_ref.at[slot, h],
                        kbuf.at[slot_buf, pl.ds(i * Pp, Pp)],
                        sems.at[slot_buf, 0, i]).start()
                    pltpu.make_async_copy(
                        vd_ref.at[slot, h],
                        vbuf.at[slot_buf, pl.ds(i * Pp, Pp)],
                        sems.at[slot_buf, 1, i]).start()
                    pltpu.make_async_copy(
                        side_ref.at[slot, h],
                        sbuf.at[slot_buf, pl.ds(i * 4 * G, 4 * G)],
                        sems.at[slot_buf, 2, i]).start()

        def wait_group(j, slot_buf):
            for i in range(NP):
                jj = j * NP + i

                @pl.when(jj < count)
                def _():
                    slot = pt_ref[b, jj]
                    pltpu.make_async_copy(
                        kd_ref.at[slot, h],
                        kbuf.at[slot_buf, pl.ds(i * Pp, Pp)],
                        sems.at[slot_buf, 0, i]).wait()
                    pltpu.make_async_copy(
                        vd_ref.at[slot, h],
                        vbuf.at[slot_buf, pl.ds(i * Pp, Pp)],
                        sems.at[slot_buf, 1, i]).wait()
                    pltpu.make_async_copy(
                        side_ref.at[slot, h],
                        sbuf.at[slot_buf, pl.ds(i * 4 * G, 4 * G)],
                        sems.at[slot_buf, 2, i]).wait()

        def unpack_group(buf_ref, slot_buf):
            """[NP*Pp, GD] packed bytes -> [NP*P, GD] centered int8 levels
            (token order within each page; pages stacked)."""
            t32 = buf_ref[slot_buf].astype(jnp.int32)
            pages = []
            for i in range(NP):
                sub = t32[i * Pp:(i + 1) * Pp]
                parts = [(((sub >> (p * bits)) & mask) - off)
                         .astype(jnp.int8) for p in range(vpb)]
                pages.append(jnp.concatenate(parts, axis=0))   # [P, GD]
            return jnp.concatenate(pages, axis=0)              # [NPP, GD]

        rowtok = jax.lax.broadcasted_iota(jnp.int32, (NPP, 1), 0) % P

        @pl.when(count > 0)
        def _():
            start_group(0, 0)

        def gbody(j, carry):
            slot_buf = j % 2

            @pl.when(j + 1 < n_groups)
            def _():
                start_group(j + 1, (j + 1) % 2)

            wait_group(j, slot_buf)
            k_lv = unpack_group(kbuf, slot_buf)        # [NPP, GD] int8
            v_t = unpack_group(vbuf, slot_buf).T       # [GD, NPP] int8
            side = sbuf[slot_buf]                      # [NP*4G, P]
            # per-page valid token counts -> one [NPP, 1] row bound
            vals = [jnp.where(
                j * NP + i < count,
                nt_ref[b, jnp.minimum(j * NP + i, npmax - 1)], 0)
                for i in range(NP)]
            valid_rows = jnp.concatenate(
                [jnp.full((P, 1), v, jnp.int32) for v in vals], axis=0)
            row_ok = rowtok < valid_rows               # [NPP, 1]

            for g in range(G):
                def col(base):
                    return jnp.concatenate(
                        [side[i * 4 * G + base:i * 4 * G + base + 1, :]
                         .reshape(P, 1) for i in range(NP)], axis=0)
                ks = col(g) * sm_scale                 # [NPP, 1] (sm folded)
                kz = col(G + g) - off
                vs = col(2 * G + g)
                # invalid-page rows were never DMA'd: a non-finite garbage
                # value times the (already-zeroed) w row is still NaN
                vz = jnp.where(row_ok, col(3 * G + g) - off, 0.0)
                for c in range(n_chunks):
                    q0 = c * QC
                    m = ml_ref[g:g + 1, q0:q0 + QC]    # [1, QC]
                    l = ml_ref[G + g:G + g + 1, q0:q0 + QC]
                    qi = qi_ref[g, :, q0:q0 + QC]      # [GD, QC] int8
                    sq = qm_ref[g:g + 1, q0:q0 + QC]   # [1, QC]
                    qsum = qm_ref[G + g:G + g + 1, q0:q0 + QC]
                    raw_i = jax.lax.dot_general(
                        k_lv, qi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)  # [NPP, QC]
                    raw = raw_i.astype(jnp.float32) * sq
                    logits = raw * ks - (ks * kz) * qsum
                    logits = jnp.where(row_ok, logits, NEG_INF)

                    m_new = jnp.maximum(
                        m, jnp.max(logits, axis=0, keepdims=True))
                    p = jnp.exp(logits - m_new)            # [NPP, QC]
                    alpha = jnp.exp(m - m_new)             # [1, QC]
                    l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)

                    # fold V scale in; invalid-page rows carry p=0 but an
                    # UNWRITTEN sidecar buffer (0 * garbage = NaN) — mask
                    w = jnp.where(row_ok, p * vs, 0.0)
                    wmax = jnp.max(w, axis=0, keepdims=True)   # [1, QC]
                    sw = jnp.where(wmax > 0, wmax / 127.0, 1.0)
                    wi = jnp.round(w / sw).astype(jnp.int8)
                    pv_i = jax.lax.dot_general(
                        v_t, wi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)  # [GD, QC]
                    pv = pv_i.astype(jnp.float32) * sw
                    corr = jnp.sum(w * vz, axis=0, keepdims=True)  # [1, QC]
                    band = acc_ref[g * D:(g + 1) * D, q0:q0 + QC]
                    acc_ref[g * D:(g + 1) * D, q0:q0 + QC] = (
                        band * alpha + pv[g * D:(g + 1) * D, :] - corr)
                    ml_ref[g:g + 1, q0:q0 + QC] = m_new
                    ml_ref[G + g:G + g + 1, q0:q0 + QC] = l_new
            return carry

        jax.lax.fori_loop(0, n_groups, gbody, 0)
    acc = acc_ref[...]
    lses = []
    inv = jnp.zeros((GD, Sq), jnp.float32)
    for g in range(G):
        m = ml_ref[g:g + 1, :]
        l = ml_ref[G + g:G + g + 1, :]
        safe_l = jnp.where(l > 0, l, 1.0)
        inv_g = (1.0 / safe_l)                         # [1, Sq]
        inv = inv + (band_masks[g] * inv_g if G > 1 else inv_g)
        lses.append(jnp.where(l > 0, m + jnp.log(safe_l), NEG_INF))
    out_ref[0, 0] = (acc * inv).astype(out_ref.dtype)  # [GD, Sq] transposed
    # lse rows: head g at sublane g
    lse_ref[0, 0] = jnp.concatenate(lses, axis=0)      # [G, Sq]


def degroup_pool(data: jax.Array, G: int):
    """[n_slots, H/G, Pp, G*D] grouped pages -> [n_slots, H, Pp, D]."""
    n, HG, Pp, GD = data.shape
    D = GD // G
    return (data.reshape(n, HG, Pp, G, D).transpose(0, 1, 3, 2, 4)
            .reshape(n, HG * G, Pp, D))


def degroup_sidecar(s: jax.Array, G: int):
    """[n_slots, H/G, G*P] grouped sidecars -> [n_slots, H, P]."""
    n, HG, GP = s.shape
    return s.reshape(n, HG * G, GP // G)


@functools.partial(jax.jit,
                   static_argnames=("bits", "sm_scale", "return_lse",
                                    "head_group", "act_bits"))
def batched_paged_attention(
    q: jax.Array,               # [B, H, Sq, D]
    page_tables: jax.Array,     # int32 [B, n_pages_max]
    page_tokens: jax.Array,     # int32 [B, n_pages_max]
    n_pages: jax.Array,         # int32 [B]
    k_data: jax.Array,          # uint8 [n_slots, H/G, P/vpb, G*D]
    k_scale: jax.Array,         # f32 [n_slots, H/G, G*P]
    k_zp: jax.Array,
    v_data: jax.Array,
    v_scale: jax.Array,
    v_zp: jax.Array,
    bits: int,
    sm_scale: Optional[float] = None,
    return_lse: bool = False,
    head_group: int = 1,
    act_bits: int = 16,
):
    """Flash attention for B independent sequences over one page pool.

    The serving-path kernel: each batch slot names its own page chain
    (vLLM-style), lengths differ per slot, and empty slots (n_pages=0) are
    skipped by the dynamic loop bound. Slots with zero pages return zeros
    (lse=-inf), so inactive continuous-batching slots are free.

    head_group=G > 1 supports head_dim < 128 (e.g. the GPT-2 shape's 64):
    pools store G heads per 128-lane page block ([.. | head g | ..] along
    the last dim; sidecars concat per head along tokens), and the kernel
    runs G per-head online softmaxes via lane masks (see _batched_kernel).

    act_bits=8 runs QK^T/AV on the int8 MXU (q per-row, folded P·scale_v
    per-column symmetric int8; ~0.4% relative error — see _batched_kernel).
    The XLA fallback for kernel-unfriendly shapes always computes the exact
    bf16/f32 math regardless of act_bits.
    """
    B, H, Sq, D = q.shape
    G = head_group
    n_slots, HG, Pp, GD = k_data.shape
    assert HG == H // G and GD == G * D, (k_data.shape, q.shape, G)
    vpb = 8 // bits
    P = Pp * vpb
    sm = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
    if bits == 1:
        # 1-bit pages unpack to Pp=P/8 sublanes per part — below the int8
        # (32, 128) register tile; keep the exact bf16 path there
        act_bits = 16
    # largest q tile whose persistent VMEM (q 2B + transposed acc 4B +
    # out 4B per element, + G B/elem of int8-q scratch on the a8 path)
    # fits; beyond TQ the grid tiles Sq, re-walking the page list once per
    # 4096 queries (vs once per 256 before round 4)
    # persistent bytes per (TQ x GD) element: q 2 + acc 4 + out 4, plus the
    # prepared-q scratch (G int8 on a8; 2G bf16 on grouped-head bf16).
    # When Sq > TQ (multi-tile grid) Mosaic double-buffers the q/out/lse
    # blocks across cells — budget the extra 6 B/elem or Sq=8192 OOMs VMEM.
    per_elem = 10 + (G if act_bits == 8 else 2 * G if G > 1 else 0)
    budget = 8 * 1024 * 1024
    TQ = next((t for t in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8)
               if Sq % t == 0 and
               t * GD * (per_elem + (6 if Sq > t else 0)) <= budget), None)
    # a8: pages per DMA/compute group — the AV dot's contraction is NP*P
    # tokens, and the v5e int8 MXU rate is contraction-gated (measured
    # in-kernel 119 T/s at K=128 vs 262 at K=512). MEASURED OUTCOME
    # (LONGSEQ r5, DESIGN.md): NP=4 is SLOWER end-to-end — the kernel is
    # VPU-bound, so faster dots buy nothing while the group's sidecar
    # assembly adds VPU work. NP_A8=1 is the best a8 config and is kept;
    # the grouping machinery stays for chips where the MXU is the bound.
    # The lever applies to the a8 path ONLY: the bf16 path's DMA/unpack is
    # single-page (its dots are not contraction-starved), so its scratch
    # and semaphores must stay NP=1-sized regardless.
    NP_A8 = 1
    NP = NP_A8 if act_bits == 8 else 1
    QC = min(TQ or 0, 2048 if NP == 1 else 1024) or None
    if (QC is None or GD % 128 != 0 or Pp % 8 != 0 or P % 128 != 0):
        if G > 1:  # ungroup for the XLA fallback
            k_data, v_data = degroup_pool(k_data, G), degroup_pool(v_data, G)
            k_scale = degroup_sidecar(k_scale, G)
            k_zp = degroup_sidecar(k_zp, G)
            v_scale = degroup_sidecar(v_scale, G)
            v_zp = degroup_sidecar(v_zp, G)
        return _batched_fallback(q, page_tables, page_tokens, n_pages,
                                 k_data, k_scale, k_zp, v_data, v_scale,
                                 v_zp, bits, sm, return_lse)

    # group q heads into lanes then TRANSPOSE to [B, H/G, G*D, Sq]
    # (channels in sublanes, queries in lanes) — the kernel's native
    # orientation for both the MXU dots and the online-softmax stat rows;
    # XLA folds this transpose into its producer
    qk = (q.reshape(B, HG, G, Sq, D).transpose(0, 1, 2, 4, 3)
          .reshape(B, HG, GD, Sq))
    # sidecars consolidated into ONE [4G, P] DMA block per page: rows
    # [ks_0..ks_{G-1}, kz_*, vs_*, vz_*] (kernel slices sublane bands) —
    # 3 DMAs per page instead of 6
    side = jnp.concatenate([
        k_scale.reshape(n_slots, HG, G, P),
        k_zp.reshape(n_slots, HG, G, P),
        v_scale.reshape(n_slots, HG, G, P),
        v_zp.reshape(n_slots, HG, G, P),
    ], axis=2)                                   # [n_slots, HG, 4G, P]

    kernel = functools.partial(_batched_kernel, bits=bits, D=D, P=P,
                               sm_scale=sm, G=G, QC=QC, act_bits=act_bits,
                               NP=NP)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, HG, Sq // TQ),
        in_specs=[
            pl.BlockSpec((1, 1, GD, TQ), lambda b, h, i, *_: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # k_data (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # v_data
            pl.BlockSpec(memory_space=pl.ANY),  # consolidated sidecars
        ],
        out_specs=[
            # TRANSPOSED output [GD, TQ]: XLA transposes outside (fuses
            # with the consumer) — cheaper than an in-kernel relayout
            pl.BlockSpec((1, 1, GD, TQ), lambda b, h, i, *_: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G, TQ), lambda b, h, i, *_: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NP * Pp, GD), jnp.uint8),    # k page group
            pltpu.VMEM((2, NP * Pp, GD), jnp.uint8),    # v page group
            pltpu.VMEM((2, NP * 4 * G, P), jnp.float32),  # sidecar blocks
            pltpu.VMEM((GD, TQ), jnp.float32),    # transposed accumulator
            pltpu.VMEM((2 * G, TQ), jnp.float32),  # m/l online-softmax stats
            # prepared-q scratch (transposed, like q): int8 levels on the
            # a8 path, masked bf16 on the grouped-head bf16 path (tile-
            # sized dummy when G == 1 reads q directly); + scale/qsum rows
            (pltpu.VMEM((G, GD, TQ), jnp.int8) if act_bits == 8 else
             pltpu.VMEM((G, GD, TQ), jnp.bfloat16) if G > 1 else
             pltpu.VMEM((1, 16, 128), jnp.bfloat16)),
            pltpu.VMEM((2 * G, TQ), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3, NP)),
        ],
    )
    out_t, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, HG, GD, Sq), jnp.float32),
                   jax.ShapeDtypeStruct((B, HG, G, Sq), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(page_tables.astype(jnp.int32), page_tokens.astype(jnp.int32),
      n_pages.astype(jnp.int32), qk.astype(jnp.bfloat16),
      k_data, v_data, side)
    # [B, HG, GD, Sq] -> per-head [B, H, Sq, D]
    out = (out_t.reshape(B, HG, G, D, Sq).transpose(0, 1, 2, 4, 3)
           .reshape(B, H, Sq, D))
    lse = lse.reshape(B, H, Sq)
    return (out, lse) if return_lse else out


def _batched_fallback(q, page_tables, page_tokens, n_pages, k_data, k_scale,
                      k_zp, v_data, v_scale, v_zp, bits, sm,
                      return_lse=False):
    """XLA reference: gather every slot's chain, mask invalid tokens/pages."""
    B, H, Sq, D = q.shape
    n_pages_max = page_tables.shape[1]
    P = (k_data.shape[2] * (8 // bits))

    def deq(data, scale, zp):
        pages = data[page_tables.reshape(-1)]   # [B*n_max, H, P/vpb, D]
        sc = scale[page_tables.reshape(-1)]
        z = zp[page_tables.reshape(-1)]
        vpb = 8 // bits
        mask = (1 << bits) - 1
        d32 = pages.astype(jnp.int32)
        parts = [((d32 >> (p * bits)) & mask) for p in range(vpb)]
        lv = jnp.concatenate(parts, axis=2).astype(jnp.float32)
        full = (lv - z[..., None]) * sc[..., None]  # [B*n_max, H, P, D]
        full = full.reshape(B, n_pages_max, H, P, D)
        return jnp.moveaxis(full, 2, 1).reshape(B, H, n_pages_max * P, D)

    kd = deq(k_data, k_scale, k_zp)
    vd = deq(v_data, v_scale, v_zp)
    # validity: page j valid iff j < n_pages[b]; token t < page_tokens[b, j]
    page_idx = jnp.arange(n_pages_max)[None, :]
    page_ok = page_idx < n_pages[:, None]                       # [B, n_max]
    tok = jnp.arange(P)[None, None, :]
    tok_ok = tok < page_tokens[:, :, None]                      # [B, n_max, P]
    valid = (page_ok[:, :, None] & tok_ok).reshape(B, 1, 1, -1)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kd) * sm
    logits = jnp.where(valid, logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, vd)
    any_valid = valid.any(axis=-1)                              # [B, 1, 1]
    out = jnp.where(any_valid[..., None], out, 0.0)
    if return_lse:
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        lse = jnp.where(any_valid, lse, NEG_INF)
        return out, lse
    return out
