"""HSTU ranking pretraining entry point.

Counterpart of the reference entry
(examples/hstu/training/pretrain_gr_ranking.py:76): gin config -> mesh ->
dataloader -> model -> trainer -> jitted train loop with watchdog, MFU
logging, periodic eval (AUC) and checkpointing.

Usage:
    python -m recsys_examples_tpu.training.pretrain_gr_ranking \
        --gin-config-file configs/ranking_random.gin \
        [--max-train-iters N]
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
from recsys_examples_tpu.models.ranking_gr import RankingGR
from recsys_examples_tpu.modules.config import (
    EmbeddingConfig,
    HSTUConfig,
    KernelBackend,
    PositionEncodingConfig,
    RankingConfig,
)
from recsys_examples_tpu.modules.losses import decode_bits
from recsys_examples_tpu.modules.metrics import (
    AUCState,
    auc_compute,
    auc_update,
)
from recsys_examples_tpu.training import gin_args  # noqa: F401 (registers)
from recsys_examples_tpu.training.checkpoint import save_checkpoint
from recsys_examples_tpu.training.train_state import make_optimizer
from recsys_examples_tpu.training.trainer import GRTrainer
from recsys_examples_tpu.utils import gin_config
from recsys_examples_tpu.utils.logger import StepTimer, print_rank_0
from recsys_examples_tpu.utils.perf import device_peak_tflops, hstu_train_flops
from recsys_examples_tpu.utils.watchdog import watched_iter


def build_hstu_config(net, tp: int, sequence_parallel: bool = False) -> HSTUConfig:
    return HSTUConfig(
        sequence_parallel=sequence_parallel and tp > 1,
        hidden_size=net.hidden_size,
        num_layers=net.num_layers,
        num_attention_heads=net.num_attention_heads,
        kv_channels=net.kv_channels,
        hidden_dropout=net.hidden_dropout,
        kernel_backend=KernelBackend(net.kernel_backend),
        dtype=jnp.bfloat16 if net.dtype == "bfloat16" else jnp.float32,
        target_group_size=net.target_group_size,
        max_attn_len=net.max_attn_len,
        position_encoding_config=PositionEncodingConfig(
            num_position_buckets=net.position_num_buckets,
            use_time_encoding=net.use_time_encoding,
        ),
        recompute_layer=net.recompute_layer,
        scaling_seqlen=net.scaling_seqlen,
        tensor_model_parallel_size=tp,
    )


def batch_iterator(ds, trainer_args, dp: int = 1):
    """Synthetic or file-backed batch stream of GLOBAL batches
    (per-shard batch_size x dp samples), host-side; wrap in
    PrefetchIterator for overlap."""
    if ds.dataset_name == "random":
        i = 0
        while True:
            yield random_hstu_batch(
                seed=trainer_args.seed + i,
                batch_size=ds.batch_size * dp,
                max_history_len=ds.max_history_len,
                item_vocab=ds.item_vocab_size,
                action_vocab=ds.action_vocab_size,
                max_num_candidates=ds.max_num_candidates,
                num_tasks=ds.num_tasks,
            )
            i += 1
    else:
        from recsys_examples_tpu.data.sequence_dataset import (
            make_sequence_dataset,
        )

        sd = make_sequence_dataset(ds)
        yield from sd.batches(
            ds.batch_size * dp, train=True, seed=trainer_args.seed,
            shuffle=ds.shuffle,
        )


def shard_hstu_batch(batch, mesh, dp: int):
    """Place batch leaves on the mesh: per-sample arrays sharded over
    'data', the rest replicated. (Sequence-boundary-aligned token
    sharding is handled inside the embedding shard_map; dense ops run
    under GSPMD global semantics.)"""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def leaf(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % dp == 0:
            return jax.device_put(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
            )
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(leaf, batch)


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
    rank_args = gin_config.make("RankingArgs")

    # ---- device mesh (dp x tp). One device -> no mesh (single-chip path);
    # multi-device -> dynamic tables row-sharded over "data" with a2a
    # exchange, dense params TP-partitioned over "model" via GSPMD
    # (reference: make_optimizer_and_shard, sharding.py:270 +
    # initialize_model_parallel, initialize.py:60).
    from recsys_examples_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    tp = tpa.tensor_model_parallel_size
    mesh = make_mesh(dp=-1, tp=tp) if (n_dev > 1 or tp > 1) else None
    dp = 1 if mesh is None else mesh.shape["data"]

    hstu_cfg = build_hstu_config(
        net, tpa.tensor_model_parallel_size,
        sequence_parallel=getattr(tpa, "sequence_parallel", False),
    )
    task_cfg = RankingConfig(
        embedding_configs=()
        if demb.use_dynamic_embedding
        else (
            EmbeddingConfig(
                ("item",), "item_table", ds.item_vocab_size, net.hidden_size
            ),
        ),
        prediction_head_arch=tuple(rank_args.prediction_head_arch),
        prediction_head_act_type=rank_args.prediction_head_act_type,
        prediction_head_bias=rank_args.prediction_head_bias,
        num_tasks=rank_args.num_tasks,
        eval_metrics=tuple(rank_args.eval_metrics),
    )

    sparse = {}
    hybrid = None
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
        hybrid = None
        if demb.caching:
            # device table as cache over a host tier: a host-side prefetch
            # stage onboards each batch's missing rows before the jitted
            # step so it never misses (reference: prefetch pipeline,
            # train_pipeline.py:862 + dynamicemb_prefetch). Composes with
            # the row-sharded path: under a mesh each rank's shard caches
            # the keys it owns and prefetch routes per-owner buckets
            # (reference: HybridStorage under row-wise sharding,
            # key_value_table.py:2107).
            from recsys_examples_tpu.dynamicemb.hybrid_storage import (
                HybridDynamicEmbedding,
            )

            hybrid = HybridDynamicEmbedding(table, mesh=mesh)
        if ds.action_vocab_size > 0:
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

    model = RankingGR(hstu_cfg, task_cfg)
    trainer = GRTrainer(
        model,
        make_optimizer(
            opt.learning_rate, opt.optimizer_str, opt.adam_beta1,
            opt.adam_beta2, opt.adam_eps, opt.weight_decay,
        ),
        sparse,
    )

    from recsys_examples_tpu.data.batch_shuffler import shuffle_hstu_batch
    from recsys_examples_tpu.data.sequence_dataset import PrefetchIterator

    raw_it = batch_iterator(ds, trainer_args, dp=dp)
    if ds.balanced_shuffler and dp > 1:
        # workload-balanced DP shuffling (reference E2E exp 1: +53%)
        base_it = raw_it

        def shuffled():
            for b in base_it:
                yield shuffle_hstu_batch(b, dp)

        raw_it = shuffled()
    # host-side prefetch overlaps batch assembly with the device step
    # (reference 3-stream train pipeline, train_pipeline.py:95)
    it = PrefetchIterator(
        raw_it,
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

    # a2a overflow watchdog: sustained bucket overflow grows the exchange
    # cap and re-jits the step (cap is a trace-time constant), so sparse
    # rows can never be silently under-trained (VERDICT r3 #2)
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
        f"start training: {trainer_args.max_train_iters} iters, "
        f"backend={jax.default_backend()}"
    )
    losses = []
    _nan_reported = [False]
    t_start = time.perf_counter()
    try:
        for i, batch in enumerate(
            watched_iter(it, timeout=trainer_args.watchdog_timeout_s)
        ):
            if i >= trainer_args.max_train_iters:
                break
            if trainer_args.profile and i == trainer_args.profile_step_start:
                jax.profiler.start_trace("/tmp/rextpu_trace")
            timer.start()
            if hybrid is not None:
                new_sparse = dict(state.sparse)
                new_sparse["item"] = hybrid.prefetch(
                    state.sparse["item"],
                    np.asarray(batch.features["item"].values),
                )
                state = state.replace(sparse=new_sparse)
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
                    f"their owner bucket cap (trained on transient init "
                    f"this step)"
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
            if loss != loss and not _nan_reported[0]:
                # NaN tripwire (reference: ASSERT_LOSS_HAS_NAN,
                # train_pipeline.py:196): report which state parts went
                # non-finite once, so intermittent numeric faults are
                # diagnosable from logs
                _nan_reported[0] = True
                bad = []
                for path, leaf in jax.tree_util.tree_flatten_with_path(
                    (state.params, state.sparse)
                )[0]:
                    arr = np.asarray(leaf)
                    if (np.issubdtype(arr.dtype, np.floating)
                            and not np.isfinite(arr).all()):
                        bad.append(jax.tree_util.keystr(path))
                    if len(bad) >= 8:
                        break
                print_rank_0(
                    f"[nan-tripwire] loss NaN at iter {i + 1}; non-finite "
                    f"state leaves: {bad or 'none (transient batch?)'}"
                )
                # also sanity-check the BATCH: a corrupted host->device
                # transfer (observed on the experimental axon client under
                # heavy host contention) shows up as garbage ids/lengths
                # here, distinguishing transfer corruption from a genuine
                # optimization divergence
                probs = []
                for name, feat in batch.features.items():
                    ln = np.asarray(feat.lengths)
                    vals = np.asarray(feat.values)
                    if (ln < 0).any() or ln.sum() > vals.shape[0]:
                        probs.append(f"{name}.lengths bad (sum={ln.sum()})")
                    if np.issubdtype(vals.dtype, np.integer) and (
                            vals < 0).any():
                        probs.append(f"{name}.values negative ids")
                print_rank_0(
                    f"[nan-tripwire] batch check: "
                    f"{probs or 'batch leaves look sane'}"
                )
                if os.environ.get("REXTPU_HALT_ON_NAN"):
                    raise FloatingPointError("loss NaN")
            if trainer_args.profile and i == trainer_args.profile_step_end:
                jax.profiler.stop_trace()
            if (i + 1) % trainer_args.log_interval == 0:
                item_len = np.asarray(batch.features["item"].lengths)
                fl = hstu_train_flops(
                    item_len * (2 if ds.action_vocab_size else 1),
                    net.hidden_size, net.num_attention_heads, net.kv_channels,
                    net.num_layers,
                )
                tflops = fl / dt / 1e12
                print_rank_0(
                    f"iter {i + 1}: loss={np.mean(losses[-trainer_args.log_interval:]):.5f} "
                    f"step={dt * 1e3:.1f}ms tflops={tflops:.1f} "
                    f"mfu={100 * tflops / peak:.2f}%"
                )
            if (
                trainer_args.ckpt_save_interval
                and (i + 1) % trainer_args.ckpt_save_interval == 0
            ):
                save_checkpoint(
                    f"{trainer_args.ckpt_dir}/iter_{i + 1:07d}",
                    state, state.sparse,
                    {n: t.table for n, t in sparse.items()},
                )
            if trainer_args.eval_interval and (i + 1) % trainer_args.eval_interval == 0:
                run_eval(trainer, eval_fn, state, ds, trainer_args, rank_args,
                         iters=getattr(trainer_args, "eval_iters", 8),
                         mesh=mesh)
    finally:
        it.close()

    total = time.perf_counter() - t_start
    print_rank_0(f"done: {total:.1f}s, final loss {losses[-1]:.5f}")
    run_eval(trainer, eval_fn, state, ds, trainer_args, rank_args,
             iters=getattr(trainer_args, "eval_iters", 8), mesh=mesh)
    return state


# last run_eval result (per-task AUC ndarray), for tools that drive main()
LAST_EVAL_AUC = None
EVAL_AUC_HISTORY = []


def eval_batches(ds, trainer_args, iters):
    """Real holdout batches for file-backed datasets; synthetic only for
    dataset_name == "random" (reference: the eval loop iterates the eval
    dataloader, trainer/training.py:42)."""
    nc_eval = getattr(ds, "eval_max_num_candidates", 0) or (
        ds.max_num_candidates
    )
    if ds.dataset_name == "random":
        for j in range(iters or 8):
            yield random_hstu_batch(
                seed=99991 + j,
                batch_size=ds.batch_size,
                max_history_len=ds.max_history_len,
                item_vocab=ds.item_vocab_size,
                action_vocab=ds.action_vocab_size,
                max_num_candidates=nc_eval,
                num_tasks=ds.num_tasks,
            )
        return
    from recsys_examples_tpu.data.sequence_dataset import (
        make_sequence_dataset,
    )

    sd = make_sequence_dataset(ds, max_num_candidates=nc_eval)
    import itertools

    # honor eval_iters for file datasets too (0/None = full holdout)
    it = sd.batches(ds.batch_size, train=False, seed=0, shuffle=False)
    yield from (itertools.islice(it, iters) if iters else it)


def run_eval(trainer, eval_fn, state, ds, trainer_args, rank_args, iters=8,
             mesh=None):
    import contextlib

    num_tasks = rank_args.num_tasks
    auc = AUCState.init(num_tasks)
    nb = 0
    mesh_ctx = jax.set_mesh(mesh) if mesh is not None else (
        contextlib.nullcontext()
    )
    with mesh_ctx:
        for batch in eval_batches(ds, trainer_args, iters):
            loss, aux = eval_fn(state, batch)
            labels01 = decode_bits(aux["labels"], num_tasks)
            auc = auc_update(auc, aux["logits"], labels01, aux["valid"])
            nb += 1
    vals = np.asarray(auc_compute(auc))
    global LAST_EVAL_AUC
    LAST_EVAL_AUC = vals
    EVAL_AUC_HISTORY.append(vals)
    print_rank_0(
        f"eval ({nb} batches) AUC: "
        + ", ".join(f"{v:.4f}" for v in vals)
    )
    return vals


if __name__ == "__main__":
    main()
