"""ShardedPagedBatcher: paged quantized-KV serving over a ('data','model') mesh.

BASELINE config 5 evidence (VERDICT r1 item 1): continuous batching of denoise
steps with sharded weights + sharded quantized paged KV pools runs as ONE
jitted shard_map step, and its per-slot trajectories match the single-device
`PagedContinuousBatcher` (per-slot PRNG keys make the slot streams independent
of data-parallel placement; TP introduces only psum reassociation error).

Runs on the 8-virtual-CPU-device mesh (tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_llm_rs_tpu.config import DiffusionConfig
from diffusion_llm_rs_tpu.models import denoiser as dn
from diffusion_llm_rs_tpu.parallel.mesh import make_mesh
from diffusion_llm_rs_tpu.parallel.serving import ShardedPagedBatcher
from diffusion_llm_rs_tpu.serving import PagedContinuousBatcher, Request


def _setup(num_heads=4, hidden=64, **kw):
    cfg = DiffusionConfig.tiny(vocab_size=128, hidden_size=hidden,
                               num_attention_heads=num_heads, **kw)
    params = dn.init_denoiser_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _drive(batcher, requests):
    for r in requests:
        batcher.submit(r)
    return {c.request_id: c for c in batcher.run_until_drained()}


@pytest.mark.parametrize("mesh_shape", [(2, 2), (4, 1), (1, 2)])
def test_sharded_matches_single_device(mesh_shape):
    """End-to-end parity: same requests, same seed, same completions."""
    cfg, params = _setup()
    dp, tp = mesh_shape
    devs = jax.devices()[: dp * tp]
    mesh = make_mesh((dp, tp), devices=devs)

    reqs = [Request("a", seq_len=8, num_steps=6),
            Request("b", seq_len=4, num_steps=3),
            Request("c", seq_len=8, num_steps=9)]
    single = PagedContinuousBatcher(params, cfg, num_slots=4, seq_len=8,
                                    page_size=4, seed=5, attend_mode="paged")
    sharded = ShardedPagedBatcher(params, cfg, mesh, num_slots=4, seq_len=8,
                                  page_size=4, seed=5, attend_mode="paged")
    done_s = _drive(single, [Request(r.request_id, r.seq_len, r.num_steps)
                             for r in reqs])
    done_m = _drive(sharded, reqs)

    assert sorted(done_s) == sorted(done_m)
    for rid in done_s:
        np.testing.assert_allclose(done_m[rid].embeddings,
                                   done_s[rid].embeddings,
                                   rtol=2e-4, atol=2e-4)
        if tp == 1:
            # pure DP: no collectives at all -> bit-identical trajectories
            np.testing.assert_array_equal(done_m[rid].tokens,
                                          done_s[rid].tokens)


def test_sharded_grouped_heads():
    """head_dim 32 with TP=2: head grouping adapts to the local head count
    and the sharded kernel path still matches the single-device batcher."""
    cfg, params = _setup(num_heads=4, hidden=128)  # head_dim 32
    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    single = PagedContinuousBatcher(params, cfg, num_slots=2, seq_len=8,
                                    page_size=8, seed=3, attend_mode="paged")
    sharded = ShardedPagedBatcher(params, cfg, mesh, num_slots=2, seq_len=8,
                                  page_size=8, seed=3, attend_mode="paged")
    assert single.head_group == 4      # 128/32 lanes -> 4 heads per group
    assert sharded.head_group == 2     # 2 local heads per shard
    reqs = [Request("g", seq_len=8, num_steps=5)]
    done_s = _drive(single, [Request("g", 8, 5)])
    done_m = _drive(sharded, reqs)
    np.testing.assert_allclose(done_m["g"].embeddings,
                               done_s["g"].embeddings, rtol=2e-4, atol=2e-4)


def test_sharded_continuous_admission():
    """Batch membership churn (queue > slots, mixed step counts) under the
    sharded step: all requests drain, slots freed across the mesh."""
    cfg, params = _setup()
    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    b = ShardedPagedBatcher(params, cfg, mesh, num_slots=2, seq_len=8,
                            page_size=4, seed=1)
    for i, steps in enumerate([6, 3, 5, 2]):
        b.submit(Request(f"q{i}", seq_len=8, num_steps=steps))
    n = b.step()
    assert n == 2 and b.stats()["queued"] == 2
    done = b.run_until_drained()
    assert sorted(c.request_id for c in done) == ["q0", "q1", "q2", "q3"]
    for c in done:
        assert np.all(np.isfinite(c.embeddings))


def test_sharded_state_shardings():
    """Slot state shards over 'data'; pools over ('data','model');
    weights over 'model'."""
    cfg, params = _setup()
    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    b = ShardedPagedBatcher(params, cfg, mesh, num_slots=4, seq_len=8,
                            page_size=4, attend_mode="paged")
    assert b.x.sharding.spec == jax.sharding.PartitionSpec("data", None, None)
    pool = b.pools[b.buckets[0]]
    assert pool["k_data"].sharding.spec[:2] == ("data", "model")
    wqkv = jax.tree_util.tree_leaves(b.params)[0]
    # stacked TP params: leading axis over 'model'
    specs = {l.sharding.spec[0]
             for l in jax.tree_util.tree_leaves(b.params)
             if hasattr(l, "sharding")}
    assert specs == {"model"}


def test_sharded_salience_routing():
    """Salience routing under the mesh: per-page attention-mass proxy is
    pmean'd over 'model' (full-model signal on every shard), bits allocated
    per page, requests drain finite."""
    cfg, params = _setup()
    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    b = ShardedPagedBatcher(params, cfg, mesh, num_slots=2, seq_len=16,
                            page_size=4, salience_routing=True)
    b.submit(Request("s", seq_len=16, num_steps=8))
    done = b.run_until_drained()
    assert np.all(np.isfinite(done[0].embeddings))
    s = b.page_scores[0]
    assert np.all(np.isfinite(s)) and np.all(s >= 0)
    assert abs(float(s.sum()) - 1.0) < 1e-2


def test_sharded_quantized_weights():
    """Megatron TP split of GPTQ/RTN-packed MatmulWeights feeds the sharded
    serving step (packed data + sidecars split on the same logical axis)."""
    from diffusion_llm_rs_tpu.ops.pallas_matmul import prepare
    from diffusion_llm_rs_tpu.quant.core import QuantizedTensor, quantize_tree

    cfg, params = _setup()
    qp = quantize_tree(params, 4, symmetric=True, granularity="group",
                       group_size=32, axis=0, min_size=256)
    qp = jax.tree_util.tree_map(
        lambda l: prepare(l) if isinstance(l, QuantizedTensor) and l.ndim == 2
        else l, qp, is_leaf=lambda l: isinstance(l, QuantizedTensor))
    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    b = ShardedPagedBatcher(qp, cfg, mesh, num_slots=2, seq_len=8,
                            page_size=4)
    b.submit(Request("q", seq_len=8, num_steps=4))
    done = b.run_until_drained()
    assert len(done) == 1 and np.all(np.isfinite(done[0].embeddings))


def test_sharded_validates_divisibility():
    cfg, params = _setup(num_heads=3)
    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    with pytest.raises(ValueError):
        ShardedPagedBatcher(params, cfg, mesh, num_slots=4, seq_len=8)
    cfg2, params2 = _setup()
    with pytest.raises(ValueError):
        ShardedPagedBatcher(params2, cfg2, mesh, num_slots=3, seq_len=8)
