"""End-to-end convergence run on a planted-structure synthetic dataset.

The reference's quality contract is convergence parity on MovieLens /
KuaiRand (BASELINE.md "Model quality"); this host has no network access
and no dataset mirror, so this tool demonstrates the SAME full pipeline —
ratings file -> preprocess_movielens -> SequenceDataset (leave-one-out
holdout) -> pretrain_gr_ranking entry -> eval AUC — on generated data
with known learnable structure:

  items belong to K latent clusters; each user has a preference vector
  over clusters; rating ~ Bernoulli(sigmoid(pref . cluster)) -> 1..5.
  A model that learns item co-cluster structure from histories beats
  AUC 0.5 by a wide margin; the Bayes AUC of the generator is printed
  for reference.

Usage: python tools/convergence_synthetic.py [--iters 2000]
Prints one JSON line with the final holdout AUC.
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from recsys_examples_tpu.utils.backend import honor_platform_env  # noqa: E402

honor_platform_env()

import numpy as np


def gen_ratings(path, n_users=2000, n_items=2000, k=16, seed=0,
                min_len=20, max_len=120, task="pref"):
    rng = np.random.default_rng(seed)
    item_cluster = rng.integers(0, k, n_items)
    if task == "item_bias":
        # diagnostic: like-ness depends on the ITEM only — learnable from
        # the candidate embedding alone (pipeline sanity check)
        user_pref = np.tile(
            np.linspace(-2.0, 2.0, k)[None, :], (n_users, 1)
        )
    else:
        user_pref = rng.normal(0, 1.5, (n_users, k))
    rows = []
    p_all = []
    for u in range(n_users):
        n = int(rng.integers(min_len, max_len))
        items = rng.integers(0, n_items, n)
        logits = user_pref[u, item_cluster[items]]
        p = 1.0 / (1.0 + np.exp(-logits))
        like = rng.random(n) < p
        rating = np.where(like, rng.choice([4, 5], n), rng.choice([1, 2, 3], n))
        ts = np.arange(n)
        p_all.append((p, like))
        for i in range(n):
            rows.append(f"{u}::{items[i]}::{rating[i]}::{ts[i]}")
    with open(path, "w") as f:
        f.write("\n".join(rows))
    # Bayes AUC of the generator (upper bound for an oracle that KNOWS
    # each user's true preference vector)
    ps = np.concatenate([p for p, _ in p_all])
    ys = np.concatenate([y for _, y in p_all])
    return float(_auc(ps, ys)), item_cluster


def _auc(ps, ys):
    ps = np.asarray(ps, float)
    ys = np.asarray(ys, bool)
    order = np.argsort(ps)
    ranks = np.empty_like(order, float)
    ranks[order] = np.arange(len(ps))
    return (ranks[ys].mean() - (ys.sum() - 1) / 2) / max((~ys).sum(), 1)


def holdout_oracle_auc(npz_path, item_cluster, k=16, smooth=4.0):
    """History-conditional oracle: the ACHIEVABLE bound for any model that
    sees only the user's history (the generator Bayes bound assumes the
    true preference vector, which no amount of training can recover from
    a finite history). Knows the true item clusters; estimates each
    user's per-cluster like-rate from the train prefix with Beta
    smoothing toward the global rate, then scores the held-out last item.
    Matches the eval protocol exactly (leave-one-out, label = rating>=4)."""
    d = np.load(npz_path)
    items, actions, offs = d["item_ids"], d["action_ids"], d["offsets"]
    like = actions >= 4
    # global like-rate over train prefixes only
    num = den = 0
    for u in range(len(offs) - 1):
        s, e = offs[u], offs[u + 1]
        num += like[s:e - 1].sum()
        den += max(e - 1 - s, 0)
    g = num / max(den, 1)
    ps, ys = [], []
    for u in range(len(offs) - 1):
        s, e = offs[u], offs[u + 1]
        if e - s < 2:
            continue
        c = item_cluster[items[s:e]]
        hl = like[s:e - 1].astype(float)
        cnum = np.bincount(c[:-1], weights=hl, minlength=k) + smooth * g
        cden = np.bincount(c[:-1], minlength=k) + smooth
        ps.append((cnum / cden)[c[-1]])
        ys.append(like[e - 1])
    return float(_auc(ps, ys))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--dtype", default=None, help="bfloat16|float32")
    ap.add_argument("--kernel", default=None, help="pallas|jnp")
    ap.add_argument("--lr", type=float, default=0.001)
    ap.add_argument("--task", default="pref", choices=["pref", "item_bias"])
    ap.add_argument("--users", type=int, default=2000)
    ap.add_argument("--candidates", type=int, default=8,
                    help="train-time candidate window (eval always 1)")
    ap.add_argument("--weight-decay", type=float, default=0.0)
    ap.add_argument("--demb-lr", type=float, default=0.01,
                    help="sparse-table rowwise_adagrad lr")
    ap.add_argument("--sparse-wd", type=float, default=0.0,
                    help="L2 weight decay on looked-up table rows — the "
                         "dense adamw decay never touches the hash "
                         "tables, this is the anti-memorization knob")
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--eval-every", type=int, default=0,
                    help="eval cadence in iters (0 = iters//8); best-AUC "
                         "needs a cadence finer than the overfit onset")
    ap.add_argument("--eval-iters", type=int, default=0,
                    help="eval batches per eval (0 = full holdout); large "
                         "--users runs cap this so eval stays cheap — 120 "
                         "batches is ~7.7k labels, AUC CI ~±0.01")
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--reuse", action="store_true",
                    help="reuse ratings/seq.npz already present in "
                         "--workdir (skips the ~minutes of regeneration "
                         "on this 1-core host); the planted clusters are "
                         "re-derived from the generator seed")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from recsys_examples_tpu.data.sequence_dataset import (
        preprocess_movielens,
    )
    from recsys_examples_tpu.training import pretrain_gr_ranking
    from recsys_examples_tpu.utils import gin_config

    wd = args.workdir or tempfile.mkdtemp(prefix="convergence_")
    os.makedirs(wd, exist_ok=True)
    ratings = os.path.join(wd, "ratings.dat")
    npz = os.path.join(wd, "seq.npz")
    meta = os.path.join(wd, "meta.npz")
    if args.reuse and os.path.exists(npz) and os.path.exists(meta):
        m = np.load(meta)
        bayes_auc = float(m["bayes_auc"])
        item_cluster = m["item_cluster"]
        oracle_auc = float(m["oracle_auc"])
    else:
        bayes_auc, item_cluster = gen_ratings(
            ratings, n_users=args.users, task=args.task
        )
        preprocess_movielens(ratings, npz, min_seq_len=10)
        oracle_auc = holdout_oracle_auc(npz, item_cluster)
        np.savez(meta, bayes_auc=bayes_auc, item_cluster=item_cluster,
                 oracle_auc=oracle_auc)

    on_tpu = jax.default_backend() == "tpu"
    dtype = args.dtype or ("bfloat16" if on_tpu else "float32")
    kernel = args.kernel or ("pallas" if on_tpu else "jnp")
    cfg = os.path.join(wd, "conv.gin")
    with open(cfg, "w") as f:
        f.write("\n".join([
            f"TrainerArgs.max_train_iters = {args.iters}",
            f"TrainerArgs.log_interval = {args.log_every}",
            f"TrainerArgs.eval_iters = {args.eval_iters}",  # 0 = full holdout
            f"TrainerArgs.eval_interval = "
            f"{args.eval_every or max(args.iters // 8, 1)}",
            'DatasetArgs.dataset_name = "synthetic-movielens"',
            f'DatasetArgs.dataset_path = "{npz}"',
            "DatasetArgs.batch_size = 64",
            "DatasetArgs.max_history_len = 128",
            # dense supervision: train on the last-8 candidates of each
            # user's train split (the reference trains ml-20m with
            # max_num_candidates=20) but eval scores ONLY the holdout
            f"DatasetArgs.max_num_candidates = {args.candidates}",
            "DatasetArgs.eval_max_num_candidates = 1",
            "DatasetArgs.item_vocab_size = 2000",
            "DatasetArgs.action_vocab_size = 6",
            f"NetworkArgs.hidden_size = {args.hidden}",
            f"NetworkArgs.num_layers = {args.layers}",
            f"NetworkArgs.num_attention_heads = {args.heads}",
            f"NetworkArgs.kv_channels = {args.hidden // args.heads}",
            f"NetworkArgs.hidden_dropout = {args.dropout}",
            f'NetworkArgs.kernel_backend = "{kernel}"',
            f'NetworkArgs.dtype = "{dtype}"',
            "NetworkArgs.position_num_buckets = 256",
            f"OptimizerArgs.learning_rate = {args.lr}",
            f"OptimizerArgs.weight_decay = {args.weight_decay}",
            # weight decay only acts through adamw
            f'OptimizerArgs.optimizer_str = '
            f'"{"adamw" if args.weight_decay else "adam"}"',
            "DynamicEmbeddingArgs.capacity = 8192",
            "DynamicEmbeddingArgs.bucket_capacity = 32",
            'DynamicEmbeddingArgs.optimizer = "rowwise_adagrad"',
            f"DynamicEmbeddingArgs.learning_rate = {args.demb_lr}",
            f"DynamicEmbeddingArgs.weight_decay = {args.sparse_wd}",
            "RankingArgs.prediction_head_arch = [64, 1]",
            "RankingArgs.num_tasks = 1",
        ]))
    gin_config.clear_config()
    pretrain_gr_ranking.EVAL_AUC_HISTORY.clear()
    pretrain_gr_ranking.main(["--gin-config-file", cfg])
    hist = [float(v[0]) for v in pretrain_gr_ranking.EVAL_AUC_HISTORY]
    auc = pretrain_gr_ranking.LAST_EVAL_AUC
    print(json.dumps({
        "bench": "convergence_synthetic_ranking",
        "task": args.task,
        "iters": args.iters,
        "holdout_auc": None if auc is None else round(float(auc[0]), 4),
        "best_holdout_auc": round(max(hist), 4) if hist else None,
        "auc_history": [round(v, 4) for v in hist],
        "bayes_auc_upper_bound": round(bayes_auc, 4),
        # the ACHIEVABLE bound: history-conditional oracle that knows the
        # true item clusters (the generator bound assumes the true user
        # preference vector, unknowable from a finite history)
        "holdout_oracle_auc": round(oracle_auc, 4),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
