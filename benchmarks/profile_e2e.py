"""Component-level timing breakdown of the headline e2e train step.

Plays the role of the reference's nsys analysis scripts
(corelib/dynamicemb/benchmark/nsys_breakdown.py, PERF_ANALYSIS.md): times
each phase of the jitted train step separately so the MFU gap can be
attributed — sparse embedding phases, dense forward, dense fwd+bwd, the
attention kernel alone, and the raw GEMM ladder at the same shapes.

Usage: python benchmarks/profile_e2e.py [--hist 2048] [--batch 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from recsys_examples_tpu.utils.backend import honor_platform_env  # noqa: E402

honor_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hist", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--cap", type=int, default=22, help="log2 table capacity")
    args = ap.parse_args()

    from recsys_examples_tpu.data.hstu_batch import random_hstu_batch
    from recsys_examples_tpu.dynamicemb.batched_table import (
        DynamicEmbeddingTable,
    )
    from recsys_examples_tpu.dynamicemb.dynamicemb_config import (
        DynamicEmbTableOptions,
    )
    from recsys_examples_tpu.dynamicemb.optimizer import SparseOptimizerArgs
    from recsys_examples_tpu.dynamicemb.sharded_collection import (
        ShardedDynamicEmbedding,
    )
    from recsys_examples_tpu.models.ranking_gr import RankingGR
    from recsys_examples_tpu.modules.config import (
        HSTUConfig, KernelBackend, PositionEncodingConfig, RankingConfig,
    )
    from recsys_examples_tpu.training.train_state import make_optimizer
    from recsys_examples_tpu.training.trainer import GRTrainer
    from recsys_examples_tpu.utils.perf import (
        device_peak_tflops, hstu_train_flops,
    )

    HIDDEN, HEADS, DH = 1024, 4, 256
    EMB_DIM = 128
    hstu_cfg = HSTUConfig(
        hidden_size=HIDDEN, num_layers=args.layers,
        num_attention_heads=HEADS, kv_channels=DH, hidden_dropout=0.0,
        kernel_backend=KernelBackend.PALLAS, dtype=jnp.bfloat16,
        position_encoding_config=PositionEncodingConfig(
            num_position_buckets=8192),
        target_group_size=1, recompute_layer=False,
        item_embedding_dim=EMB_DIM,
    )
    task_cfg = RankingConfig(
        embedding_configs=(), prediction_head_arch=(512, 1), num_tasks=1,
    )
    table = DynamicEmbeddingTable(
        DynamicEmbTableOptions(
            embedding_dim=EMB_DIM, max_capacity=1 << args.cap,
            bucket_capacity=128,
        ),
        SparseOptimizerArgs(optimizer="rowwise_adagrad", learning_rate=0.01),
    )
    sparse = {"item": ShardedDynamicEmbedding(table, mesh=None)}
    model = RankingGR(hstu_cfg, task_cfg)
    trainer = GRTrainer(model, make_optimizer(1e-3, "adam"), sparse)

    batch = random_hstu_batch(
        seed=0, batch_size=args.batch, max_history_len=args.hist,
        item_vocab=50_000_000, max_num_candidates=128, num_tasks=1,
        zipf_a=1.2, token_capacity=-1,
    )
    batch = jax.device_put(batch)  # producers yield host (numpy) leaves
    rng = jax.random.PRNGKey(0)
    state = trainer.init(rng, batch)

    item_len = np.asarray(batch.features["item"].lengths)
    T_cap = batch.features["item"].capacity
    flops = hstu_train_flops(item_len, HIDDEN, HEADS, DH, args.layers)
    peak = device_peak_tflops()
    print(f"tokens={item_len.sum()} cap={T_cap} "
          f"model_flops={flops/1e12:.3f}TF peak={peak}TF")

    # ---- full step
    step = jax.jit(trainer.train_step)
    ms_full = timeit(step, state, batch, rng)
    print(f"full train step:      {ms_full:8.2f} ms "
          f"({flops/ms_full/1e9:.1f} TFLOPS, "
          f"{100*flops/ms_full/1e9/peak:.1f}% MFU)")

    # ---- phase A: sparse fwd alone
    def phase_a(state, batch):
        sparse_st = dict(state.sparse)
        emb = {}
        for name, tbl in trainer.sparse_tables.items():
            ids = batch.features[name].values
            sparse_st[name], e, res = tbl.forward(
                sparse_st[name], ids, train=True)
            emb[name] = e
        return sparse_st, emb

    pa = jax.jit(phase_a)
    ms_a = timeit(pa, state, batch)
    print(f"phase A sparse fwd:   {ms_a:8.2f} ms")
    _, emb0 = jax.block_until_ready(pa(state, batch))

    # ---- phase B: dense fwd only
    def dense_fwd(params, emb):
        loss, aux = model.apply(
            {"params": params}, batch, train=True, embeddings=emb,
            rngs={"dropout": rng},
        )
        return loss

    dfwd = jax.jit(dense_fwd)
    ms_fwd = timeit(dfwd, state.params, emb0)
    print(f"dense fwd only:       {ms_fwd:8.2f} ms")

    # ---- phase B: dense fwd+bwd
    dgrad = jax.jit(jax.value_and_grad(dense_fwd, argnums=(0, 1)))
    ms_fb = timeit(dgrad, state.params, emb0)
    print(f"dense fwd+bwd:        {ms_fb:8.2f} ms")

    # ---- phase C (estimate): full - A - B - dense opt
    print(f"residual (C+opt+...): {ms_full - ms_a - ms_fb:8.2f} ms")

    # ---- attention kernel alone at block shapes (interleaved lengths)
    from recsys_examples_tpu.modules.hstu_attention import (
        create_hstu_attention,
    )
    from recsys_examples_tpu.ops.jagged import lengths_to_offsets

    T = T_cap
    q = jax.random.normal(rng, (T, HEADS, DH), jnp.bfloat16)
    k = jax.random.normal(rng, (T, HEADS, DH), jnp.bfloat16)
    v = jax.random.normal(rng, (T, HEADS, DH), jnp.bfloat16)
    offs = lengths_to_offsets(batch.features["item"].lengths)
    attn = create_hstu_attention(hstu_cfg)

    def attn_fwd(q, k, v):
        return attn(q, k, v, offs, args.hist + 128,
                    num_targets=batch.num_candidates,
                    scaling_seqlen=args.hist + 128)

    af = jax.jit(attn_fwd)
    ms_attn = timeit(af, q, k, v)
    att_fl = float((2.0 * 2.0 * HEADS * DH *
                    (item_len.astype(np.float64) ** 2) * 0.5).sum())
    print(f"attn fwd (1 layer):   {ms_attn:8.2f} ms "
          f"({att_fl/ms_attn/1e9:.1f} TFLOPS)")

    ab = jax.jit(jax.grad(lambda q, k, v: attn_fwd(q, k, v).sum()))
    ms_attnb = timeit(ab, q, k, v)
    print(f"attn bwd (1 layer):   {ms_attnb:8.2f} ms")

    # ---- raw GEMM ladder (uvqk + proj shapes)
    x = jax.random.normal(rng, (T, HIDDEN), jnp.bfloat16)
    w1 = jax.random.normal(rng, (HIDDEN, 4 * HEADS * DH), jnp.bfloat16)
    w2 = jax.random.normal(rng, (HEADS * DH, HIDDEN), jnp.bfloat16)

    def gemms(x):
        y = jax.nn.silu(x @ w1)
        return y[:, :HEADS * DH] @ w2

    gm = jax.jit(gemms)
    ms_gemm = timeit(gm, x)
    gfl = 2.0 * T * HIDDEN * 4 * HEADS * DH + 2.0 * T * HEADS * DH * HIDDEN
    print(f"gemm ladder (1 layer):{ms_gemm:8.2f} ms "
          f"({gfl/ms_gemm/1e9:.1f} TFLOPS)")

    # ---- speed-of-light probe: one big square bf16 matmul
    a = jax.random.normal(rng, (8192, 8192), jnp.bfloat16)
    b = jax.random.normal(rng, (8192, 8192), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    ms_sol = timeit(mm, a, b)
    solfl = 2.0 * 8192 ** 3
    print(f"SOL 8k matmul:        {ms_sol:8.2f} ms "
          f"({solfl/ms_sol/1e9:.1f} TFLOPS)")

    # ---- chained gemm ladder (x10 inside one dispatch, hides tunnel latency)
    def gemms10(x):
        def body(i, x):
            y = jax.nn.silu(jnp.dot(x, w1,
                                    preferred_element_type=jnp.bfloat16))
            return jnp.dot(y[:, :HEADS * DH], w2,
                           preferred_element_type=jnp.bfloat16)
        return jax.lax.fori_loop(0, 10, body, x)

    gm10 = jax.jit(gemms10)
    ms_gemm10 = timeit(gm10, x) / 10.0
    print(f"gemm ladder (chained):{ms_gemm10:8.2f} ms "
          f"({gfl/ms_gemm10/1e9:.1f} TFLOPS)")

    # ---- per-layer dense accounting
    print(f"\nlayers={args.layers}; dense fwd+bwd per layer: "
          f"{(ms_fb)/args.layers:.2f} ms")


if __name__ == "__main__":
    main()
