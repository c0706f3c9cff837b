"""Headline benchmark: HSTU ranking e2e train step on one TPU chip.

Runs the FULL reference E2E benchmark workload
(examples/hstu/training/benchmark/E2E_BENCHMARK.md + the generated config
from scripts/generate_gin_config.py):

  - 8 HSTU layers, hidden 1024, 4 heads, head dim 256
  - item + action features, Zipf(1.2) jagged lengths, max seqlen 4096;
    history is item/action-interleaved by the preprocessor -> ~2x tokens
  - 3 contextual features (user_id, user_age, item_category_l1)
  - 5 embedding tables: item (50M, dynamic), user_id (50M, dynamic),
    action (100, static), user_age (100, static), item_category_l1 (50,
    static) — all dim 128
  - item/user_id ids drawn from Zipf(1.05) over the 50M vocab
  - prediction head [512, 8], 8 BCE tasks (bit-encoded labels)
  - batch 32/chip, max_num_candidates=0, Adam lr=1e-3
  - a rotating pool of distinct pre-generated batches (the reference
    cycles `num_generated_batches=20`), so every timed step streams
    different Zipf keys through unique/lookup/insert

FLOPs use the reference's exact accounting (hstu_flops_exact ==
cal_hstu_flops_single_rank, examples/commons/utils/perf.py:540) so the MFU
is directly comparable to the published table.

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

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS; honor an explicit cpu request (smoke tests) via the
# config knob, which still wins if applied before first backend use.
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

# compiles are expensive on this host (single core, remote TPU compile);
# persist them across bench runs
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def _probe_backend(timeout_s: int = 240) -> None:
    """First device use dials the axon tunnel, which HANGS in native code
    (not errors, and not interruptibly — SIGALRM never reaches Python) if
    the relay is down. Probe in a KILLABLE subprocess and emit a failure
    JSON line instead of wedging the bench harness."""
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
    except subprocess.TimeoutExpired:
        print(json.dumps({
            "metric": "hstu_e2e_train_mfu", "value": 0.0, "unit": "%",
            "vs_baseline": 0.0,
            "detail": {"error": f"backend unreachable after {timeout_s}s "
                                "(axon tunnel down?)"},
        }), flush=True)
        os._exit(3)


def main():
    _probe_backend()
    from recsys_examples_tpu.data.hstu_batch import (
        _zipf_lengths,
        random_hstu_batch,
    )
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
        EmbeddingConfig,
        HSTUConfig,
        KernelBackend,
        PositionEncodingConfig,
        RankingConfig,
    )
    from recsys_examples_tpu.training.train_state import make_optimizer
    from recsys_examples_tpu.training.trainer import GRTrainer
    from recsys_examples_tpu.utils.perf import (
        device_peak_tflops,
        hstu_flops_exact,
    )

    on_tpu = jax.default_backend() == "tpu"
    # Reference E2E config, single-chip slice. The two 50M-row dim-128
    # dynamic tables are sharded over 16 GPUs in the reference run
    # (~3.1M rows/device); each gets a 4.2M-row per-chip shard here.
    BATCH = 32 if on_tpu else 4
    MAX_HIST = 4096 if on_tpu else 64
    LAYERS = 8 if on_tpu else 2
    HIDDEN, HEADS, DH = (1024, 4, 256) if on_tpu else (64, 2, 32)
    EMB_DIM = 128 if on_tpu else 32
    NUM_TASKS = 8
    N_CTX = 3           # user_id, user_age, item_category_l1
    NBATCH = 12 if on_tpu else 3   # rotating pre-generated batch pool
    ITERS = 10 if on_tpu else 2

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
        # full activations fit HBM at this shape; remat's extra forward
        # pass is not worth it
        recompute_layer=False,
        item_embedding_dim=EMB_DIM,
        contextual_embedding_dim=EMB_DIM,
    )
    task_cfg = RankingConfig(
        # static (DP) side tables; item/user_id are dynamic below
        embedding_configs=(
            EmbeddingConfig(("action",), "action", 100, EMB_DIM),
            EmbeddingConfig(("user_age",), "user_age", 100, EMB_DIM),
            EmbeddingConfig(("item_category_l1",), "item_category_l1", 50, EMB_DIM),
        ),
        prediction_head_arch=(512, NUM_TASKS) if on_tpu else (16, NUM_TASKS),
        num_tasks=NUM_TASKS,
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

    sparse = {
        "item": ShardedDynamicEmbedding(mk_table(), mesh=None),
        "user_id": ShardedDynamicEmbedding(mk_table(), mesh=None),
    }

    model = RankingGR(hstu_cfg, task_cfg)
    trainer = GRTrainer(model, make_optimizer(1e-3, "adam"), sparse)

    # Per-batch bucketed token capacity: the reference runs fully dynamic
    # shapes (every CUDA varlen batch is exact), so a single static
    # capacity = pool max would make every batch pay the pool's worst-case
    # dense GEMMs (~33% padding at this pool). Instead round each batch's
    # total up to a multiple of 2048 -> a handful of cached executables,
    # each within 5% of the exact shape. Reproduce each seed's length draw
    # (first rng use in random_hstu_batch) to size the buffer.
    BUCKET = 2048 if on_tpu else 64
    totals = []
    for s in range(NBATCH):
        rng_s = np.random.default_rng(s)
        totals.append(int(_zipf_lengths(rng_s, 1.2, BATCH, MAX_HIST).sum()))
    caps = [-(-t // BUCKET) * BUCKET for t in totals]
    token_cap = max(caps)

    batches = [
        random_hstu_batch(
            seed=s, batch_size=BATCH, max_history_len=MAX_HIST,
            item_vocab=50_000_000,
            action_vocab=100,
            contextual_vocabs={
                "user_id": 50_000_000,
                "user_age": 100,
                "item_category_l1": 50,
            },
            max_num_candidates=0, num_tasks=NUM_TASKS,
            zipf_a=1.2, token_capacity=caps[s],
            value_zipf={"item": 1.05, "user_id": 1.05},
        )
        for s in range(NBATCH)
    ]

    # producers yield HOST (numpy) batches (thread-safety contract,
    # data/hstu_batch.host_array); stage the pool on device once so the
    # timed loop measures compute, not H2D
    batches = jax.device_put(batches)
    jax.block_until_ready(batches)

    rng = jax.random.PRNGKey(0)
    state = trainer.init(rng, batches[0])
    step = jax.jit(trainer.train_step, donate_argnums=(0,))

    # Warmup = one full cycle over the pool: compiles the executable and
    # brings the tables to the reference's measured steady state (the
    # reference measures iters 199+ over 20 cycled batches, i.e. with the
    # pool's keys already resident; score updates + unique/lookup/insert
    # still run every step).
    for b in batches:
        state, m = step(state, b, rng)
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, m = step(state, batches[i % NBATCH], rng)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / ITERS

    # Exact FLOPs (reference accounting) per timed batch: post-preprocess
    # seqlen = 3 contextual tokens + interleaved (2x) item history.
    flops = 0.0
    tokens = 0
    for i in range(ITERS):
        b = batches[i % NBATCH]
        item_len = np.asarray(b.features["item"].lengths)
        seqlens = N_CTX + 2 * item_len
        flops += hstu_flops_exact(
            seqlens, N_CTX, 0, HIDDEN, HEADS, DH, LAYERS,
        )
        tokens += int(seqlens.sum())
    flops /= ITERS
    tokens //= ITERS

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
            "tokens": tokens,
            "token_capacity": token_cap,
            "mean_capacity": round(
                sum(caps[i % NBATCH] for i in range(ITERS)) / ITERS, 1),
            "batch_pool": NBATCH,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
