"""Headline benchmark: HSTU ranking e2e train step on one TPU chip.

Mirrors the reference's E2E benchmark configuration
(examples/hstu/training/benchmark/E2E_BENCHMARK.md: 8 HSTU layers, hidden
1024, 4 heads, head dim 256, batch 32/chip, max seqlen 4096, Zipf(1.2)
lengths, dynamic item/user embedding tables) scaled to a single chip's HBM.

Prints ONE JSON line:
  {"metric": "hstu_e2e_train_mfu", "value": <achieved MFU %>,
   "unit": "%", "vs_baseline": <MFU ratio vs reference exp5 31.40% MFU>}

The reference's best published number is 310.6 avg TFLOPS/GPU on H100
(989 bf16 peak) = 31.40% MFU (E2E_BENCHMARK.md exp 5). MFU-vs-MFU is the
hardware-neutral comparison.
"""
import json
import sys
import time

import os

import jax
import jax.numpy as jnp
import numpy as np

# compiles are expensive on this host (single core, remote TPU compile);
# persist them across bench runs
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
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
        HSTUConfig,
        KernelBackend,
        PositionEncodingConfig,
        RankingConfig,
    )
    from recsys_examples_tpu.training.train_state import make_optimizer
    from recsys_examples_tpu.training.trainer import GRTrainer
    from recsys_examples_tpu.utils.perf import (
        device_peak_tflops,
        hstu_train_flops,
    )

    on_tpu = jax.default_backend() == "tpu"
    # Benchmark shape = the reference E2E config's single-chip slice
    # (E2E_BENCHMARK.md: batch 32/GPU, max seqlen 4096, Zipf(1.2), two
    # 50M-row dim-128 item/user tables sharded over 16 GPUs -> ~3.1M rows
    # per device; we give each table a 4.2M-row per-chip shard).
    BATCH = 32 if on_tpu else 4
    MAX_HIST = 4096 if on_tpu else 64
    LAYERS = 8 if on_tpu else 2
    HIDDEN, HEADS, DH = (1024, 4, 256) if on_tpu else (64, 2, 32)
    CAND = 128 if on_tpu else 8
    EMB_DIM = 128 if on_tpu else 32  # table dim (reference: dim-128 tables)

    hstu_cfg = HSTUConfig(
        hidden_size=HIDDEN,
        num_layers=LAYERS,
        num_attention_heads=HEADS,
        kv_channels=DH,
        hidden_dropout=0.0,
        kernel_backend=KernelBackend.PALLAS if on_tpu else KernelBackend.JNP,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        position_encoding_config=PositionEncodingConfig(
            num_position_buckets=8192
        ),
        target_group_size=1,
        # tight token capacity keeps activations small; full activations
        # fit HBM so remat's extra forward pass is not worth it
        recompute_layer=False,
        item_embedding_dim=EMB_DIM,
        contextual_embedding_dim=EMB_DIM,
    )
    task_cfg = RankingConfig(
        embedding_configs=(),  # all tables dynamic
        prediction_head_arch=(512, 1) if on_tpu else (16, 1),
        num_tasks=1,
    )
    def mk_table():
        return DynamicEmbeddingTable(
            DynamicEmbTableOptions(
                embedding_dim=EMB_DIM,
                max_capacity=(1 << 22) if on_tpu else (1 << 12),
                bucket_capacity=128,
            ),
            SparseOptimizerArgs(
                optimizer="rowwise_adagrad", learning_rate=0.01
            ),
        )

    # two dynamic tables, matching the reference's item + user tables
    sparse = {
        "item": ShardedDynamicEmbedding(mk_table(), mesh=None),
        "user": ShardedDynamicEmbedding(mk_table(), mesh=None),
    }

    model = RankingGR(hstu_cfg, task_cfg)
    trainer = GRTrainer(model, make_optimizer(1e-3, "adam"), sparse)

    batch = random_hstu_batch(
        seed=0, batch_size=BATCH, max_history_len=MAX_HIST,
        item_vocab=50_000_000,
        contextual_vocabs={"user": 50_000_000},
        max_num_candidates=CAND, num_tasks=1,
        zipf_a=1.2, token_capacity=-1,
    )
    rng = jax.random.PRNGKey(0)
    state = trainer.init(rng, batch)
    step = jax.jit(trainer.train_step, donate_argnums=(0,))

    state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])

    iters = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters

    # analytic FLOPs from the preprocessed lengths (item+candidates plus
    # the 1-token user contextual prefix per sample)
    item_len = np.asarray(batch.features["item"].lengths) + 1
    flops = hstu_train_flops(
        item_len, HIDDEN, HEADS, DH, LAYERS, causal=True
    )
    peak = device_peak_tflops() if on_tpu else 1.0
    tflops = flops / dt / 1e12
    mfu = 100.0 * tflops / peak
    baseline_mfu = 31.40  # reference exp5 (310.6 / 989 H100 bf16 peak)
    print(json.dumps({
        "metric": "hstu_e2e_train_mfu",
        "value": round(mfu, 3),
        "unit": "%",
        "vs_baseline": round(mfu / baseline_mfu, 4),
        "detail": {
            "step_ms": round(dt * 1e3, 2),
            "achieved_tflops": round(tflops, 2),
            "peak_tflops": peak,
            "tokens": int(item_len.sum()),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
