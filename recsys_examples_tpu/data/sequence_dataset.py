"""Sequence dataset loaders + preprocessor (MovieLens / KuaiRand).

Counterpart of the reference's dataset stack
(examples/commons/datasets/hstu_sequence_dataset.py and the preprocessor
CLI examples/commons/datasets/hstu_data_preprocessor.py: ml-1m, ml-20m,
kuairand-pure/1k/27k).

Raw data -> per-user chronological item/action sequences -> HSTUBatch
stream. The preprocessor produces a compact .npz (user -> item ids, action
ids, timestamps) once; the loader slices train/eval batches host-side.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

from recsys_examples_tpu.data.hstu_batch import HSTUBatch, JaggedIds


def preprocess_movielens(
    ratings_path: str, out_path: str, min_seq_len: int = 5
) -> dict:
    """ml-1m/ml-20m ratings.dat/.csv -> sequences .npz
    (reference: hstu_data_preprocessor.py ml-1m/ml-20m branches).

    Ratings become 'actions' (0..5 scaled); items are movie ids."""
    import pandas as pd

    if ratings_path.endswith(".dat"):
        df = pd.read_csv(
            ratings_path, sep="::", engine="python", header=None,
            names=["user_id", "movie_id", "rating", "ts"],
        )
    else:
        df = pd.read_csv(ratings_path)
        df.columns = ["user_id", "movie_id", "rating", "ts"][: len(df.columns)]
    df = df.sort_values(["user_id", "ts"], kind="stable")
    users, items, actions, tss, offsets = [], [], [], [], [0]
    for uid, grp in df.groupby("user_id", sort=False):
        if len(grp) < min_seq_len:
            continue
        users.append(uid)
        items.append(grp["movie_id"].to_numpy(np.int64))
        actions.append(grp["rating"].to_numpy(np.int64))
        tss.append(grp["ts"].to_numpy(np.int64))
        offsets.append(offsets[-1] + len(grp))
    data = {
        "user_ids": np.asarray(users, np.int64),
        "item_ids": np.concatenate(items),
        "action_ids": np.concatenate(actions),
        "timestamps": np.concatenate(tss),
        "offsets": np.asarray(offsets, np.int64),
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **data)
    return data


# KuaiRand event -> bit weight (reference: hstu_data_preprocessor.py
# DLRMKuaiRandProcessor._event_merge_weight)
KUAIRAND_EVENT_WEIGHTS = {
    "is_click": 1,
    "is_like": 2,
    "is_follow": 4,
    "is_comment": 8,
    "is_forward": 16,
    "is_hate": 32,
    "long_view": 64,
    "is_profile_enter": 128,
}

KUAIRAND_CONTEXTUAL_COLS = (
    "user_active_degree",
    "follow_user_num_range",
    "fans_user_num_range",
    "friend_user_num_range",
    "register_days_range",
)


def preprocess_kuairand(
    log_paths,
    user_features_path: Optional[str],
    out_path: str,
    min_seq_len: int = 5,
) -> dict:
    """KuaiRand (pure/1k/27k) log CSVs -> sequences .npz.

    Counterpart of the reference's DLRMKuaiRandProcessor
    (examples/commons/hstu_data_preprocessor.py:429
    `preprocess_training`:544): per-user video_id sequences ordered by
    time_ms, per-event binary columns bit-merged into one action_weights
    int (is_click=1, is_like=2, ..., is_profile_enter=128), and user
    contextual features (categorical ranges) label-encoded.

    The npz uses the same schema as `preprocess_movielens` (user_ids,
    item_ids, action_ids, timestamps, offsets) plus `ctx_<name>` columns
    [num_users] when user features are provided, so `SequenceDataset`
    loads either dataset.
    """
    import pandas as pd

    if isinstance(log_paths, str):
        log_paths = [log_paths]
    frames = [pd.read_csv(p) for p in log_paths]
    df = pd.concat(frames, ignore_index=True)
    events = [e for e in KUAIRAND_EVENT_WEIGHTS if e in df.columns]
    aw = np.zeros(len(df), np.int64)
    for e in events:
        aw |= (df[e].to_numpy() != 0).astype(np.int64) * (
            KUAIRAND_EVENT_WEIGHTS[e]
        )
    df = df.assign(action_weights=aw)
    time_col = "time_ms" if "time_ms" in df.columns else "timestamp"
    df = df.sort_values(["user_id", time_col], kind="stable")

    ctx_maps = {}
    if user_features_path:
        uf = pd.read_csv(user_features_path).set_index("user_id")
        for col in KUAIRAND_CONTEXTUAL_COLS:
            if col in uf.columns:
                # label-encode the categorical range strings (reference
                # one-hot encodes to an integer id: _one_hot_encode)
                cats = {v: i for i, v in enumerate(sorted(
                    uf[col].astype(str).unique()))}
                ctx_maps[col] = (uf[col].astype(str).map(cats), len(cats))

    users, items, actions, tss, offsets = [], [], [], [], [0]
    ctx_vals = {c: [] for c in ctx_maps}
    for uid, grp in df.groupby("user_id", sort=False):
        if len(grp) < min_seq_len:
            continue
        users.append(uid)
        items.append(grp["video_id"].to_numpy(np.int64))
        actions.append(grp["action_weights"].to_numpy(np.int64))
        tss.append(grp[time_col].to_numpy(np.int64))
        offsets.append(offsets[-1] + len(grp))
        for c, (series, _) in ctx_maps.items():
            ctx_vals[c].append(
                int(series.get(uid, 0)) if uid in series.index else 0
            )
    data = {
        "user_ids": np.asarray(users, np.int64),
        "item_ids": np.concatenate(items) if items else np.zeros(0, np.int64),
        "action_ids": np.concatenate(actions)
        if actions else np.zeros(0, np.int64),
        "timestamps": np.concatenate(tss) if tss else np.zeros(0, np.int64),
        "offsets": np.asarray(offsets, np.int64),
    }
    for c in ctx_maps:
        data[f"ctx_{c}"] = np.asarray(ctx_vals[c], np.int64)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **data)
    return data


class SequenceDataset:
    """Per-user sequences with leave-last-N-out train/eval split
    (reference: hstu_sequence_dataset.py)."""

    def __init__(
        self,
        npz_path: str,
        max_history_len: int,
        max_num_candidates: int = 1,
        num_tasks: int = 1,
        eval_holdout: int = 1,
        action_vocab_size: int = 0,
        label_mode: str = "rating_ge4",   # rating_ge4 | action_bits
        contextual_feature_names: Tuple[str, ...] = (),
    ):
        d = np.load(npz_path)
        self.user_ids = d["user_ids"]
        self.item_ids = d["item_ids"]
        self.action_ids = d["action_ids"] if "action_ids" in d else None
        self.timestamps = d["timestamps"] if "timestamps" in d else None
        self.offsets = d["offsets"]
        self.max_history_len = max_history_len
        self.max_num_candidates = max_num_candidates
        self.num_tasks = num_tasks
        self.eval_holdout = eval_holdout
        self.action_vocab_size = action_vocab_size
        self.label_mode = label_mode
        self.contextual_feature_names = tuple(contextual_feature_names)
        self.contextual = {
            n: d[f"ctx_{n}"]
            for n in self.contextual_feature_names
            if f"ctx_{n}" in d
        }
        # "user" contextual = the user id itself (reference: user_id is
        # always the first contextual feature)
        self.num_users = len(self.user_ids)

    def _user_seq(self, u: int, train: bool):
        s, e = self.offsets[u], self.offsets[u + 1]
        items = self.item_ids[s:e]
        actions = (
            self.action_ids[s:e] if self.action_ids is not None else None
        )
        if train:
            items = items[: len(items) - self.eval_holdout]
            if actions is not None:
                actions = actions[: len(actions) - self.eval_holdout]
        # truncate oldest
        if len(items) > self.max_history_len + self.max_num_candidates:
            cut = len(items) - (self.max_history_len + self.max_num_candidates)
            items = items[cut:]
            if actions is not None:
                actions = actions[cut:]
        return items, actions

    def _assemble(self, uids: np.ndarray, train: bool, cap: int):
        """Pack one batch. Native C++ fast path (csrc/batch_assembler.cpp)
        with a Python fallback."""
        from recsys_examples_tpu.utils.native import (
            _ptr,
            batch_assembler_lib,
        )

        batch_size = len(uids)
        iv = np.zeros((cap,), np.int64)
        av = np.zeros((cap,), np.int64)
        lens = np.zeros((batch_size,), np.int32)
        ncand = np.zeros((batch_size,), np.int32)
        labels = np.zeros(
            (batch_size * max(self.max_num_candidates, 1),), np.int32
        )
        lab_len = np.zeros((batch_size,), np.int32)
        lib = batch_assembler_lib()
        if (lib is not None and self.action_ids is not None
                and self.label_mode == "rating_ge4"):
            uids64 = np.ascontiguousarray(uids, np.int64)
            items = np.ascontiguousarray(self.item_ids, np.int64)
            acts = np.ascontiguousarray(self.action_ids, np.int64)
            offs = np.ascontiguousarray(self.offsets, np.int64)
            total = int(lib.assemble_batch(
                _ptr(items), _ptr(acts), _ptr(offs), _ptr(uids64),
                batch_size, int(train), self.eval_holdout,
                self.max_history_len, self.max_num_candidates, cap, 4,
                _ptr(iv), _ptr(av), _ptr(lens), _ptr(ncand), _ptr(labels),
                _ptr(lab_len),
            ))
            assert total >= 0, "token capacity overflow in assembler"
            return iv, av, lens, ncand, labels, lab_len
        pos = 0
        for j, u in enumerate(uids):
            items, actions = self._user_seq(int(u), train)
            n = len(items)
            nc = min(self.max_num_candidates, max(n - 1, 0))
            iv[pos:pos + n] = items
            if actions is not None:
                av[pos:pos + n] = actions
            lens[j] = n
            ncand[j] = nc
            # labels from actions on candidates: MovieLens rating>=4, or
            # KuaiRand bit-encoded multi-event weights (decode_bits
            # unpacks bit t as task t's label)
            if nc > 0 and actions is not None:
                if self.label_mode == "action_bits":
                    task_mask = (1 << self.num_tasks) - 1
                    pos_lab = (actions[n - nc:] & task_mask).astype(np.int32)
                else:
                    pos_lab = (actions[n - nc:] >= 4).astype(np.int32)
                labels[
                    j * self.max_num_candidates:
                    j * self.max_num_candidates + nc
                ] = pos_lab
                lab_len[j] = nc
            pos += n
        return iv, av, lens, ncand, labels, lab_len

    def batches(
        self, batch_size: int, *, train: bool = True, seed: int = 0,
        shuffle: bool = True,
    ) -> Iterator[HSTUBatch]:
        # host (numpy) leaves ONLY: this generator runs on the prefetch
        # worker thread — see data.hstu_batch.host_array
        from recsys_examples_tpu.data.hstu_batch import host_array

        rng = np.random.default_rng(seed)
        order = np.arange(self.num_users)
        while True:
            if shuffle:
                rng.shuffle(order)
            for i in range(0, self.num_users - batch_size + 1, batch_size):
                uids = order[i:i + batch_size]
                item_max = self.max_history_len + self.max_num_candidates
                cap = batch_size * item_max
                iv, av, lens, ncand, labels, lab_len = self._assemble(
                    uids, train, cap
                )
                feats = {
                    "item": JaggedIds(
                        values=host_array(iv),
                        lengths=host_array(lens),
                        offsets=np.concatenate(
                            [[0], np.cumsum(lens)]
                        ).astype(np.int32),
                        max_len=item_max,
                    )
                }
                f2m = {"item": item_max}
                act_name = None
                if self.action_ids is not None and self.action_vocab_size:
                    act_name = "action"
                    feats["action"] = JaggedIds(
                        values=host_array(av),
                        lengths=feats["item"].lengths,
                        offsets=feats["item"].offsets,
                        max_len=item_max,
                    )
                    f2m["action"] = item_max
                ctx_names = []
                for cname in self.contextual_feature_names:
                    if cname == "user":
                        src = self.user_ids
                    elif cname in self.contextual:
                        src = self.contextual[cname]
                    else:
                        continue
                    vals = np.asarray(src)[uids].astype(np.int64)
                    feats[cname] = JaggedIds(
                        values=host_array(vals),
                        lengths=np.ones((batch_size,), np.int32),
                        offsets=np.arange(batch_size + 1, dtype=np.int32),
                        max_len=1,
                    )
                    f2m[cname] = 1
                    ctx_names.append(cname)
                yield HSTUBatch(
                    features=feats,
                    batch_size=batch_size,
                    feature_to_max_seqlen=f2m,
                    item_feature_name="item",
                    action_feature_name=act_name,
                    contextual_feature_names=tuple(ctx_names),
                    max_num_candidates=self.max_num_candidates,
                    num_candidates=host_array(ncand)
                    if self.max_num_candidates
                    else None,
                    labels=host_array(labels),
                    label_lengths=host_array(lab_len),
                )
            if not train:
                return


def sequence_dataset_iterator(ds_args, trainer_args) -> Iterator[HSTUBatch]:
    """Entry used by pretrain_gr_ranking when dataset_name != random."""
    ds = make_sequence_dataset(ds_args)
    yield from ds.batches(
        ds_args.batch_size, train=True, seed=trainer_args.seed,
        shuffle=ds_args.shuffle,
    )


def make_sequence_dataset(ds_args, max_num_candidates=None) -> "SequenceDataset":
    """`max_num_candidates` overrides ds_args (used by the eval loop:
    train on the last-N candidates of the train split, but score the
    holdout alone so eval labels never overlap training labels)."""
    label_mode = (
        "action_bits" if ds_args.dataset_name.startswith("kuairand")
        else "rating_ge4"
    )
    return SequenceDataset(
        ds_args.dataset_path,
        max_history_len=ds_args.max_history_len,
        max_num_candidates=ds_args.max_num_candidates
        if max_num_candidates is None else max_num_candidates,
        num_tasks=ds_args.num_tasks,
        action_vocab_size=ds_args.action_vocab_size,
        label_mode=label_mode,
        contextual_feature_names=tuple(ds_args.contextual_feature_names),
    )


class PrefetchIterator:
    """Background-thread batch prefetch: overlaps host-side batch assembly
    with the device step (the reference's multi-stream train pipeline's
    H2D/data-dist overlap, examples/commons/pipeline/train_pipeline.py:95,
    re-expressed for TPU as host prefetch + XLA async dispatch)."""

    def __init__(self, it: Iterator[HSTUBatch], depth: int = 2):
        import queue
        import threading

        # depth <= 0 = synchronous pass-through (no worker thread). The
        # test suite pins REXTPU_PREFETCH_DEPTH=0: a background thread
        # touching the jax client concurrently with the main thread's
        # compiled SPMD steps intermittently aborts the CPU runtime when
        # many training mains share one process (observed as a silent
        # SIGABRT in Array._value); real single-run processes keep the
        # overlap.
        self._it = it if depth <= 0 else None
        if self._it is not None:
            return
        self._q = queue.Queue(maxsize=depth)
        self._done = object()
        self._stop = threading.Event()

        def worker():
            try:
                for item in it:
                    # bounded put so close() can unblock and stop us —
                    # an abandoned daemon worker otherwise keeps
                    # assembling batches (and touching the jax client)
                    # concurrently with whatever the process does next
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            finally:
                try:
                    self._q.put_nowait(self._done)
                except queue.Full:
                    pass

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def close(self, timeout: float = 5.0):
        """Stop the worker and drain; idempotent. Training entries call
        this after the loop so no background thread outlives the run."""
        if self._it is not None:
            return
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except Exception:
                break
        self._t.join(timeout)

    def __iter__(self):
        return self

    def __next__(self):
        if self._it is not None:
            return next(self._it)
        item = self._q.get()
        if item is self._done:
            raise StopIteration
        return item


def _cli(argv=None):
    """Preprocessor CLI (reference: hstu_data_preprocessor.py __main__).

    python -m recsys_examples_tpu.data.sequence_dataset \
        --preprocess ml-1m --ratings ratings.dat --out ml1m_seq.npz
    python -m recsys_examples_tpu.data.sequence_dataset \
        --preprocess kuairand --logs a.csv,b.csv \
        --user-features user_features_pure.csv --out kuairand_seq.npz
    """
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--preprocess", required=True,
                   choices=["ml-1m", "ml-20m", "kuairand"])
    p.add_argument("--ratings", default=None)
    p.add_argument("--logs", default=None, help="comma-separated log CSVs")
    p.add_argument("--user-features", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--min-seq-len", type=int, default=5)
    args = p.parse_args(argv)
    if args.preprocess in ("ml-1m", "ml-20m"):
        assert args.ratings, "--ratings required for MovieLens"
        d = preprocess_movielens(args.ratings, args.out, args.min_seq_len)
    else:
        assert args.logs, "--logs required for KuaiRand"
        d = preprocess_kuairand(
            args.logs.split(","), args.user_features, args.out,
            args.min_seq_len,
        )
    print(f"wrote {args.out}: {len(d['user_ids'])} users, "
          f"{len(d['item_ids'])} events")


if __name__ == "__main__":
    _cli()
