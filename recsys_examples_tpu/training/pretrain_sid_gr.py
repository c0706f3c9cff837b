"""SID-GR pretraining entry point
(reference: examples/sid_gr/training/pretrain_sid_gr.py:71).

Usage:
    python -m recsys_examples_tpu.training.pretrain_sid_gr \
        [--gin-config-file configs/sid_random.gin] [--max-train-iters N]
"""
from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recsys_examples_tpu.data.sid_batch import random_sid_batch
from recsys_examples_tpu.models.sid_gr import SIDGRConfig, SIDGRModel
from recsys_examples_tpu.modules.sid_eval_metrics import sid_eval_metrics
from recsys_examples_tpu.utils import gin_config
from recsys_examples_tpu.utils.gin_config import configurable
from recsys_examples_tpu.utils.logger import print_rank_0
from recsys_examples_tpu.utils.watchdog import watched_iter


@configurable
@dataclasses.dataclass(frozen=True)
class SIDTrainerArgs:
    max_train_iters: int = 100
    log_interval: int = 10
    eval_interval: int = 0
    eval_iters: int = 4
    batch_size: int = 32
    max_history_items: int = 64
    seed: int = 1234
    learning_rate: float = 1e-3


@configurable
@dataclasses.dataclass(frozen=True)
class SIDDatasetArgs:
    """Real-data knobs (reference: SIDSequenceDataset ctor,
    examples/commons/datasets/sid_sequence_dataset.py:32). dataset_name
    "random" keeps the synthetic generator; "file" trains from a
    preprocessed sequence npz/parquet + PID->SID mapping file."""

    dataset_name: str = "random"
    sequence_path: str = ""
    sid_mapping_path: str = ""
    shuffle: bool = True


@configurable
@dataclasses.dataclass(frozen=True)
class SIDNetworkArgs:
    num_hierarchies: int = 4
    codebook_size: int = 256
    hidden_size: int = 256
    num_layers: int = 4
    num_heads: int = 4
    head_dim: int = 64
    ffn_hidden: int = 1024
    dropout: float = 0.0
    share_lm_head: bool = False
    beam_width: int = 32
    dtype: str = "float32"


# final-eval metrics of the last main() run (consumed by harnesses,
# e.g. tools/convergence_sid.py)
LAST_EVAL: dict = {}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gin-config-file", default=None)
    p.add_argument("--max-train-iters", type=int, default=None)
    args = p.parse_args(argv)
    if args.gin_config_file:
        gin_config.parse_config_file(args.gin_config_file)
    ta = gin_config.make("SIDTrainerArgs")
    if args.max_train_iters is not None:
        ta = dataclasses.replace(ta, max_train_iters=args.max_train_iters)
    na = gin_config.make("SIDNetworkArgs")
    da = gin_config.make("SIDDatasetArgs")

    cfg = SIDGRConfig(
        num_hierarchies=na.num_hierarchies,
        codebook_size=na.codebook_size,
        hidden_size=na.hidden_size,
        num_layers=na.num_layers,
        num_heads=na.num_heads,
        head_dim=na.head_dim,
        ffn_hidden=na.ffn_hidden,
        dropout=na.dropout,
        share_lm_head=na.share_lm_head,
        beam_width=na.beam_width,
        dtype=jnp.bfloat16 if na.dtype == "bfloat16" else jnp.float32,
    )
    model = SIDGRModel(cfg)
    tx = optax.adam(ta.learning_rate)

    if da.dataset_name == "file":
        from recsys_examples_tpu.data.sid_sequence_dataset import (
            SIDSequenceDataset,
            load_sequences,
            load_sid_mapping,
        )

        flat, offs, _users, _n_items = load_sequences(da.sequence_path)
        mapping = load_sid_mapping(da.sid_mapping_path, na.num_hierarchies)
        assert int(mapping.max()) < na.codebook_size, (
            "SID mapping exceeds codebook_size"
        )
        train_ds = SIDSequenceDataset(
            flat, offs, mapping, batch_size=ta.batch_size,
            max_history_items=ta.max_history_items, split="train",
            shuffle=da.shuffle, seed=ta.seed, drop_last=True,
        )
        eval_ds = SIDSequenceDataset(
            flat, offs, mapping, batch_size=ta.batch_size,
            max_history_items=ta.max_history_items, split="eval",
            shuffle=False, drop_last=True,
        )
        _train_iter = [iter(train_ds)]

        def make_batch(i):
            # cycle epochs, reshuffling each pass
            try:
                return next(_train_iter[0])
            except StopIteration:
                train_ds.seed += 1
                _train_iter[0] = iter(train_ds)
                return next(_train_iter[0])

        def make_eval_batches():
            return iter(eval_ds)
    else:
        def make_batch(i):
            return random_sid_batch(
                ta.seed + i, ta.batch_size, ta.max_history_items,
                na.num_hierarchies, na.codebook_size,
            )

        def make_eval_batches():
            return (
                random_sid_batch(
                    777 + j, ta.batch_size, ta.max_history_items,
                    na.num_hierarchies, na.codebook_size,
                )
                for j in range(ta.eval_iters)
            )

    batch0 = make_batch(0)
    rng = jax.random.PRNGKey(ta.seed)
    params = model.init(
        {"params": rng, "dropout": rng}, batch0, train=False
    )["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            loss, aux = model.apply(
                {"params": p}, batch, train=True, rngs={"dropout": rng}
            )
            return loss, aux

        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    print_rank_0(f"SID-GR training: {ta.max_train_iters} iters")
    losses = []
    t0 = time.perf_counter()
    for i in watched_iter(range(ta.max_train_iters), timeout=600):
        batch = make_batch(i)
        params, opt_state, loss = step(params, opt_state, batch, rng)
        losses.append(float(loss))
        if (i + 1) % ta.log_interval == 0:
            print_rank_0(
                f"iter {i + 1}: loss="
                f"{np.mean(losses[-ta.log_interval:]):.5f}"
            )
        if ta.eval_interval and (i + 1) % ta.eval_interval == 0:
            run_eval(model, params, ta, na,
                     eval_batches=make_eval_batches())
    print_rank_0(f"done in {time.perf_counter() - t0:.1f}s")
    agg = run_eval(model, params, ta, na, eval_batches=make_eval_batches())
    LAST_EVAL.clear()
    LAST_EVAL.update(agg)
    return params


def run_eval(model, params, ta, na, eval_batches=None):
    import itertools

    if eval_batches is None:
        eval_batches = (
            random_sid_batch(
                777 + j, ta.batch_size, ta.max_history_items,
                na.num_hierarchies, na.codebook_size,
            )
            for j in range(ta.eval_iters)
        )
    ms = []
    for batch in itertools.islice(eval_batches, ta.eval_iters):
        paths, scores = model.apply(
            {"params": params}, batch,
            method=SIDGRModel.generate_beam_decode,
        )
        ms.append(sid_eval_metrics(paths, batch.candidate_sids))
    if not ms:
        print_rank_0("eval: no batches")
        return {}
    agg = {
        k: float(np.mean([float(m[k]) for m in ms])) for k in ms[0]
    }
    print_rank_0(
        "eval: " + ", ".join(f"{k}={v:.4f}" for k, v in agg.items())
    )
    return agg


if __name__ == "__main__":
    main()
