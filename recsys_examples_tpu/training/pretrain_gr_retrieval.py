"""HSTU retrieval pre-training entry (gin-configured).

Counterpart of the reference's examples/hstu/training/pretrain_gr_retrieval.py:
HSTU encoder + in-batch-negative sampled softmax, eval = HR@k/NDCG@k/MRR
by ranking the held-out next item against the embedded candidate corpus
(reference: modules/metrics/metric_modules.py RetrievalTaskMetricWithSampling).
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from recsys_examples_tpu.data.hstu_batch import random_hstu_batch
from recsys_examples_tpu.dynamicemb.batched_table import DynamicEmbeddingTable
from recsys_examples_tpu.dynamicemb.dynamicemb_config import (
    DynamicEmbScoreStrategy,
    DynamicEmbTableOptions,
)
from recsys_examples_tpu.dynamicemb.optimizer import SparseOptimizerArgs
from recsys_examples_tpu.dynamicemb.sharded_collection import (
    ShardedDynamicEmbedding,
)
from recsys_examples_tpu.models.retrieval_gr import RetrievalGR
from recsys_examples_tpu.modules.config import EmbeddingConfig, RetrievalConfig
from recsys_examples_tpu.modules.metrics import (
    RetrievalMetricState,
    retrieval_compute,
    retrieval_update,
)
from recsys_examples_tpu.training.gin_args import (  # noqa: F401 (register)
    DatasetArgs,
    DynamicEmbeddingArgs,
    NetworkArgs,
    OptimizerArgs,
    RetrievalArgs,
    TensorModelParallelArgs,
    TrainerArgs,
)
from recsys_examples_tpu.training.pretrain_gr_ranking import (
    batch_iterator,
    build_hstu_config,
)
from recsys_examples_tpu.training.train_state import make_optimizer
from recsys_examples_tpu.training.trainer import GRTrainer
from recsys_examples_tpu.utils import gin_config
from recsys_examples_tpu.utils.logger import StepTimer, print_rank_0
from recsys_examples_tpu.utils.perf import device_peak_tflops, hstu_train_flops
from recsys_examples_tpu.utils.watchdog import watched_iter


def _parse_ks(eval_metrics) -> tuple:
    ks = []
    for m in eval_metrics:
        if "@" in m:
            ks.append(int(m.split("@")[1]))
    return tuple(sorted(set(ks))) or (10,)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gin-config-file", default=None)
    p.add_argument("--max-train-iters", type=int, default=None)
    args = p.parse_args(argv)
    if args.gin_config_file:
        gin_config.parse_config_file(args.gin_config_file)

    trainer_args = gin_config.make("TrainerArgs")
    if args.max_train_iters is not None:
        import dataclasses

        trainer_args = dataclasses.replace(
            trainer_args, max_train_iters=args.max_train_iters
        )
    ds = gin_config.make("DatasetArgs")
    net = gin_config.make("NetworkArgs")
    opt = gin_config.make("OptimizerArgs")
    demb = gin_config.make("DynamicEmbeddingArgs")
    tpa = gin_config.make("TensorModelParallelArgs")
    ret_args = gin_config.make("RetrievalArgs")

    hstu_cfg = build_hstu_config(net, tpa.tensor_model_parallel_size)
    task_cfg = RetrievalConfig(
        embedding_configs=()
        if demb.use_dynamic_embedding
        else (
            EmbeddingConfig(
                ("item",), "item_table", ds.item_vocab_size, net.hidden_size
            ),
        ),
        temperature=ret_args.temperature,
        num_negatives=ret_args.num_negatives,
        eval_metrics=tuple(ret_args.eval_metrics),
    )

    # dp x tp mesh (see pretrain_gr_ranking): one device -> no mesh
    from recsys_examples_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    tp = tpa.tensor_model_parallel_size
    mesh = make_mesh(dp=-1, tp=tp) if (n_dev > 1 or tp > 1) else None
    dp = 1 if mesh is None else mesh.shape["data"]

    sparse = {}
    if demb.use_dynamic_embedding:
        table = DynamicEmbeddingTable(
            DynamicEmbTableOptions(
                embedding_dim=net.hidden_size,
                max_capacity=demb.capacity,
                bucket_capacity=demb.bucket_capacity,
                score_strategy=DynamicEmbScoreStrategy(demb.score_strategy),
                admission_threshold=demb.admission_threshold,
            ),
            SparseOptimizerArgs(
                optimizer=demb.optimizer, learning_rate=demb.learning_rate,
                weight_decay=getattr(demb, "weight_decay", 0.0),
            ),
            world_size=dp,
        )
        sparse["item"] = ShardedDynamicEmbedding(table, mesh=mesh)
        if ds.action_vocab_size > 0:
            # action table for item/action-interleaved histories (same
            # wiring as the ranking entry)
            atable = DynamicEmbeddingTable(
                DynamicEmbTableOptions(
                    embedding_dim=net.hidden_size,
                    max_capacity=1 << 12,
                    bucket_capacity=demb.bucket_capacity,
                ),
                SparseOptimizerArgs(
                    optimizer=demb.optimizer,
                    learning_rate=demb.learning_rate,
                    weight_decay=getattr(demb, "weight_decay", 0.0),
                ),
                world_size=dp,
            )
            sparse["action"] = ShardedDynamicEmbedding(atable, mesh=mesh)

    model = RetrievalGR(hstu_cfg, task_cfg)
    trainer = GRTrainer(
        model,
        make_optimizer(
            opt.learning_rate, opt.optimizer_str, opt.adam_beta1,
            opt.adam_beta2, opt.adam_eps, opt.weight_decay,
        ),
        sparse,
    )

    from recsys_examples_tpu.data.sequence_dataset import PrefetchIterator
    from recsys_examples_tpu.training.pretrain_gr_ranking import (
        shard_hstu_batch,
    )

    it = PrefetchIterator(
        batch_iterator(ds, trainer_args, dp=dp),
        depth=int(os.environ.get("REXTPU_PREFETCH_DEPTH", "2")),
    )
    first = next(it)
    if mesh is not None:
        first = shard_hstu_batch(first, mesh, dp)
    rng = jax.random.PRNGKey(trainer_args.seed)
    import contextlib
    mesh_ctx = jax.set_mesh(mesh) if mesh is not None else (
        contextlib.nullcontext()
    )
    with mesh_ctx:
        state = trainer.init(rng, first)
    step_fn = jax.jit(trainer.train_step, donate_argnums=(0,))
    eval_fn = jax.jit(trainer.eval_step)

    # a2a overflow watchdog (see pretrain_gr_ranking; VERDICT r3 #2)
    from recsys_examples_tpu.dynamicemb.sharded_collection import (
        AdaptiveBucketing,
    )
    bucketing = (
        AdaptiveBucketing(sparse.values())
        if sparse and mesh is not None else None
    )

    peak = device_peak_tflops()
    timer = StepTimer()
    print_rank_0(
        f"start retrieval training: {trainer_args.max_train_iters} iters, "
        f"backend={jax.default_backend()}"
    )
    losses = []
    t_start = time.perf_counter()
    try:
        for i, batch in enumerate(
            watched_iter(it, timeout=trainer_args.watchdog_timeout_s)
        ):
            if i >= trainer_args.max_train_iters:
                break
            timer.start()
            if mesh is not None:
                batch = shard_hstu_batch(batch, mesh, dp)
                with jax.set_mesh(mesh):
                    state, metrics = step_fn(state, batch, rng)
            else:
                state, metrics = step_fn(state, batch, rng)
            loss = float(metrics["loss"])
            dt = timer.stop()
            losses.append(loss)
            ovf = int(metrics.get("emb_overflow", 0))
            if ovf:
                print_rank_0(
                    f"[a2a-overflow] iter {i + 1}: {ovf} unique ids past "
                    f"their owner bucket cap"
                )
            if bucketing is not None and bucketing.observe(ovf):
                print_rank_0(
                    "[a2a-overflow] sustained overflow: bucket_factor -> "
                    + ", ".join(
                        f"{n}={t.bucket_factor:.2f}"
                        for n, t in sparse.items()
                    )
                    + "; re-jitting train step"
                )
                step_fn = jax.jit(trainer.train_step, donate_argnums=(0,))
            if (i + 1) % trainer_args.log_interval == 0:
                item_len = np.asarray(batch.features["item"].lengths)
                fl = hstu_train_flops(
                    item_len * (2 if ds.action_vocab_size else 1),
                    net.hidden_size, net.num_attention_heads, net.kv_channels,
                    net.num_layers,
                )
                tflops = fl / dt / 1e12
                print_rank_0(
                    f"iter {i + 1}: "
                    f"loss={np.mean(losses[-trainer_args.log_interval:]):.5f} "
                    f"step={dt * 1e3:.1f}ms tflops={tflops:.1f} "
                    f"mfu={100 * tflops / peak:.2f}%"
                )
            if trainer_args.eval_interval and (i + 1) % trainer_args.eval_interval == 0:
                run_eval(eval_fn, state, ds, trainer_args, ret_args)
    finally:
        it.close()

    total = time.perf_counter() - t_start
    print_rank_0(f"done: {total:.1f}s, final loss {losses[-1]:.5f}")
    run_eval(eval_fn, state, ds, trainer_args, ret_args)
    return state


LAST_EVAL = None
EVAL_HISTORY = []


def _eval_batches(ds, trainer_args, iters):
    """Holdout batches for file datasets (leave-one-out: the target is
    the true held-out next item); synthetic random otherwise."""
    if ds.dataset_name == "random":
        for j in range(iters):
            yield random_hstu_batch(
                seed=77771 + j,
                batch_size=ds.batch_size,
                max_history_len=ds.max_history_len,
                item_vocab=ds.item_vocab_size,
                action_vocab=ds.action_vocab_size,
                max_num_candidates=ds.max_num_candidates,
                num_tasks=ds.num_tasks,
            )
        return
    from recsys_examples_tpu.data.sequence_dataset import (
        make_sequence_dataset,
    )

    nc_eval = getattr(ds, "eval_max_num_candidates", 0) or (
        ds.max_num_candidates
    )
    sd = make_sequence_dataset(ds, max_num_candidates=nc_eval)
    yield from sd.batches(ds.batch_size, train=False, seed=0, shuffle=False)


def run_eval(eval_fn, state, ds, trainer_args, ret_args, iters=8):
    """Rank the true next item among in-batch targets
    (reference: RetrievalTaskMetricWithSampling — sampled corpus)."""
    ks = _parse_ks(ret_args.eval_metrics)
    mstate = RetrievalMetricState.init(len(ks))
    for batch in _eval_batches(ds, trainer_args, iters):
        _, aux = eval_fn(state, batch)
        q = aux["query_emb"].astype(jnp.float32)          # [Tq, D]
        tids = aux["target_ids"]
        valid = aux["valid"]
        # candidate corpus = the batch's (unique) target embeddings; the
        # true item's rank among them by dot-product score
        temb = aux["target_emb"].astype(jnp.float32)
        scores = q @ temb.T                               # [Tq, Tq]
        own = jnp.take_along_axis(
            scores, jnp.arange(q.shape[0])[:, None], axis=1
        )[:, 0]
        same_item = tids[None, :] == tids[:, None]
        better = (scores > own[:, None]) & ~same_item
        rank = 1 + better.sum(axis=1)
        mstate = retrieval_update(mstate, rank, valid, ks)
    vals = retrieval_compute(mstate, ks)
    global LAST_EVAL
    LAST_EVAL = {k: float(v) for k, v in vals.items()}
    EVAL_HISTORY.append(LAST_EVAL)
    print_rank_0(
        "eval " + ", ".join(f"{k}={float(v):.4f}" for k, v in vals.items())
    )


if __name__ == "__main__":
    main()
