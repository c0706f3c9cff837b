"""SID-GR real-data pipeline: raw interactions -> sequences -> SID batches.

Counterpart of the reference's parquet SID dataset
(examples/commons/datasets/sid_sequence_dataset.py: pandas parquet of
user_id + sequence_data, item_id_to_sid_mapping tensor [H, num_items],
history = sequence[:-1], candidate = last item) and of its PID->SID
mapping consumption (examples/sid_gr/model/gpt_model.py:377).

Two deliberate TPU-design differences from the reference:
  - No cross-hierarchy codebook offsets: the reference flattens all
    hierarchies into ONE embedding table and disambiguates by adding
    cumulative codebook offsets (deduplicate_data_across_hierarchy);
    our SIDGRModel keeps one codebook per hierarchy, so raw per-level
    ids in [0, codebook_size) are already unambiguous.
  - Static shapes: every batch is padded to [B * max_history_tokens] so
    one executable serves the whole epoch.

The mapping file may be .npy / .npz (key "mapping") / torch .pt, laid out
[H, num_items] (reference layout) or [num_items, H].
"""
from __future__ import annotations

import dataclasses
import os
from typing import Iterator, Optional, Sequence

import numpy as np

from recsys_examples_tpu.data.sid_batch import SIDBatch


# ----------------------------------------------------------- preprocessing
def preprocess_interactions(
    interactions_path: str,
    out_path: str,
    user_col: str = "user_id",
    item_col: str = "item_id",
    time_col: Optional[str] = "timestamp",
    min_seq_len: int = 2,
    max_seq_len: Optional[int] = None,
    relabel_items: bool = True,
) -> dict:
    """Raw interaction log (csv/tsv/parquet/json) -> per-user sequence npz.

    Mirrors the offline step that produces the reference's
    `raw_sequence_data_path` parquet (user_id + ordered item list; e.g.
    Amazon Beauty reviews). Output npz: flat_items [total] int64,
    offsets [N+1] int64, user_ids [N] int64, num_items scalar.
    Returns summary stats.
    """
    import pandas as pd

    ext = os.path.splitext(interactions_path)[1].lower()
    if ext in (".parquet", ".pq"):
        df = pd.read_parquet(interactions_path)
    elif ext in (".json", ".jsonl"):
        df = pd.read_json(interactions_path, lines=ext == ".jsonl")
    else:
        sep = "\t" if ext in (".tsv", ".dat") else ","
        df = pd.read_csv(interactions_path, sep=sep)
    cols = [user_col, item_col] + ([time_col] if time_col in df else [])
    df = df[cols].dropna()
    if relabel_items:
        # contiguous item ids so the SID mapping table is dense
        codes, _ = pd.factorize(df[item_col], sort=True)
        df[item_col] = codes
    if time_col in df:
        df = df.sort_values([user_col, time_col], kind="stable")
    else:
        df = df.sort_values([user_col], kind="stable")

    flat, offsets, users = [], [0], []
    for uid, grp in df.groupby(user_col, sort=True):
        seq = grp[item_col].to_numpy(np.int64)
        if len(seq) < min_seq_len:
            continue
        if max_seq_len is not None:
            seq = seq[-max_seq_len:]
        flat.append(seq)
        offsets.append(offsets[-1] + len(seq))
        users.append(uid)
    if not flat:
        raise ValueError("no user has a sequence >= min_seq_len")
    flat_items = np.concatenate(flat)
    num_items = int(flat_items.max()) + 1
    np.savez(
        out_path,
        flat_items=flat_items,
        offsets=np.asarray(offsets, np.int64),
        user_ids=np.asarray(users, np.int64),
        num_items=np.int64(num_items),
    )
    return {
        "num_users": len(users),
        "num_items": num_items,
        "num_interactions": int(flat_items.shape[0]),
        "out_path": out_path,
    }


def load_sequences(path: str):
    """(flat_items, offsets, user_ids, num_items) from a preprocessed npz
    or a reference-style parquet (user_id + list column)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".parquet", ".pq"):
        import pandas as pd

        df = pd.read_parquet(path)
        seq_col = next(
            c for c in df.columns
            if c != "user_id" and df[c].map(
                lambda x: isinstance(x, (list, np.ndarray))
            ).all()
        )
        seqs = [np.asarray(s, np.int64) for s in df[seq_col]]
        offsets = np.zeros(len(seqs) + 1, np.int64)
        np.cumsum([len(s) for s in seqs], out=offsets[1:])
        flat = np.concatenate(seqs) if seqs else np.zeros(0, np.int64)
        users = (
            df["user_id"].to_numpy(np.int64)
            if "user_id" in df else np.arange(len(seqs), dtype=np.int64)
        )
        return flat, offsets, users, int(flat.max()) + 1 if len(flat) else 0
    data = np.load(path)
    return (
        data["flat_items"],
        data["offsets"],
        data["user_ids"],
        int(data["num_items"]),
    )


def load_sid_mapping(path: str, num_hierarchies: int) -> np.ndarray:
    """PID -> SID mapping as [num_items, H] int32.

    Accepts .npy / .npz (key "mapping") / torch .pt in either the
    reference layout [H, num_items]
    (sid_sequence_dataset.py item_id_to_sid_mapping_tensor) or
    [num_items, H]."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npz":
        arr = np.load(path)["mapping"]
    elif ext == ".npy":
        arr = np.load(path)
    else:
        import torch

        t = torch.load(path, map_location="cpu", weights_only=True)
        arr = np.asarray(t)
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError(f"SID mapping must be 2D, got {arr.shape}")
    if arr.shape[0] == num_hierarchies and arr.shape[1] != num_hierarchies:
        arr = arr.T  # reference layout [H, num_items]
    if arr.shape[1] != num_hierarchies:
        raise ValueError(
            f"SID mapping {arr.shape} incompatible with "
            f"num_hierarchies={num_hierarchies}"
        )
    return np.ascontiguousarray(arr, np.int32)


def build_rq_sid_mapping(
    item_embeddings: np.ndarray,
    codebook_sizes: Sequence[int],
    iters: int = 25,
    seed: int = 0,
    make_unique: bool = True,
) -> np.ndarray:
    """Residual k-means quantization: item embeddings -> SID tuples.

    Offline analogue of the reference's RQ-VAE codebook construction
    (BASELINE quality contract trains SID-GR on RQ-coded Amazon Beauty):
    level h quantizes the residual left by levels < h, so hierarchy 0
    captures coarse item structure and later levels refine it. Returns
    [num_items, H] int32. With make_unique, ties in the final level are
    re-assigned so every item has a distinct tuple when capacity allows
    (the reference dedups collisions the same way in its codebook export).
    """
    rng = np.random.default_rng(seed)
    x = np.asarray(item_embeddings, np.float64).copy()
    n = x.shape[0]
    codes = np.zeros((n, len(codebook_sizes)), np.int32)
    for h, K in enumerate(codebook_sizes):
        K = min(K, n)
        centers = x[rng.choice(n, size=K, replace=False)].copy()
        assign = np.zeros(n, np.int64)
        for _ in range(iters):
            d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for k in range(K):
                m = assign == k
                if m.any():
                    centers[k] = x[m].mean(0)
        codes[:, h] = assign.astype(np.int32)
        x = x - centers[assign]
    if make_unique and n <= int(np.prod([int(k) for k in codebook_sizes])):
        # disambiguate colliding tuples: odometer search outward from the
        # item's own code, fastest-varying last level so reassignments stay
        # as close to the quantization as possible
        sizes = [int(k) for k in codebook_sizes]
        seen = set()
        for i in range(n):
            t = tuple(int(c) for c in codes[i])
            if t not in seen:
                seen.add(t)
                continue
            found = False
            # widen the search level by level from the back
            for lvl in range(len(sizes) - 1, -1, -1):
                prefix = list(t)
                idx = list(range(lvl, len(sizes)))
                total = int(np.prod([sizes[j] for j in idx]))
                for step in range(1, total):
                    x = step
                    cand = prefix[:]
                    for j in reversed(idx):
                        cand[j] = (t[j] + x) % sizes[j]
                        x //= sizes[j]
                    ct = tuple(cand)
                    if ct not in seen:
                        codes[i] = np.asarray(ct, np.int32)
                        seen.add(ct)
                        found = True
                        break
                if found:
                    break
    return codes


# ------------------------------------------------------------- the dataset
@dataclasses.dataclass
class SIDSequenceDataset:
    """Iterable SID batches from preprocessed sequences + a PID->SID map.

    Leave-one-out protocol (the reference's max_candidate_length=1 split,
    sid_sequence_dataset.py:163 history = seq[:-1], candidate = seq[-1]):
    eval candidate is each user's LAST item; train candidate is the
    second-to-last with history truncated before it, so eval labels are
    never trained on.
    """

    flat_items: np.ndarray     # [total] int64
    offsets: np.ndarray        # [N+1] int64
    sid_mapping: np.ndarray    # [num_items, H] int32
    batch_size: int
    max_history_items: int
    split: str = "train"       # "train" | "eval"
    shuffle: bool = True
    seed: int = 0
    drop_last: bool = False

    def __post_init__(self):
        lengths = np.diff(self.offsets)
        need = 2 if self.split == "train" else 1
        self._rows = np.nonzero(lengths >= need + 1)[0]
        self._H = self.sid_mapping.shape[1]
        if int(self.flat_items.max()) >= self.sid_mapping.shape[0]:
            raise ValueError(
                "sequence contains item ids outside the SID mapping"
            )

    def __len__(self) -> int:
        n = len(self._rows)
        b = self.batch_size
        return n // b if self.drop_last else (n + b - 1) // b

    def _example(self, row: int):
        s, e = int(self.offsets[row]), int(self.offsets[row + 1])
        seq = self.flat_items[s:e]
        if self.split == "train":
            seq = seq[:-1]  # hold out the eval candidate entirely
        cand = seq[-1]
        hist = seq[:-1][-self.max_history_items:]
        return hist, cand

    def __iter__(self) -> Iterator[SIDBatch]:
        import jax.numpy as jnp

        rows = self._rows
        if self.shuffle and self.split == "train":
            rows = np.random.default_rng(self.seed).permutation(rows)
        H = self._H
        B = self.batch_size
        cap = B * self.max_history_items * H
        for i in range(len(self)):
            chunk = rows[i * B:(i + 1) * B]
            bsz = len(chunk)
            sids = np.zeros((cap,), np.int32)
            lengths = np.zeros((B,), np.int32)
            cand = np.zeros((B, H), np.int32)
            off = 0
            for j, row in enumerate(chunk):
                hist, c = self._example(int(row))
                toks = self.sid_mapping[hist].reshape(-1)  # [n*H]
                sids[off:off + len(toks)] = toks
                lengths[j] = len(toks)
                cand[j] = self.sid_mapping[c]
                off += len(toks)
            offsets = np.zeros((B + 1,), np.int32)
            np.cumsum(lengths, out=offsets[1:])
            yield SIDBatch(
                history_sids=jnp.asarray(sids),
                history_lengths=jnp.asarray(lengths),
                history_offsets=jnp.asarray(offsets),
                candidate_sids=jnp.asarray(cand),
                batch_size=B,
                num_hierarchies=H,
                max_history_tokens=self.max_history_items * H,
            )


if __name__ == "__main__":  # preprocess CLI
    import argparse

    p = argparse.ArgumentParser(
        description="raw interaction log -> per-user sequence npz"
    )
    p.add_argument("interactions", help="csv/tsv/parquet/jsonl of events")
    p.add_argument("out", help="output .npz path")
    p.add_argument("--user-col", default="user_id")
    p.add_argument("--item-col", default="item_id")
    p.add_argument("--time-col", default="timestamp")
    p.add_argument("--min-seq-len", type=int, default=2)
    p.add_argument("--max-seq-len", type=int, default=None)
    a = p.parse_args()
    stats = preprocess_interactions(
        a.interactions, a.out, user_col=a.user_col, item_col=a.item_col,
        time_col=a.time_col, min_seq_len=a.min_seq_len,
        max_seq_len=a.max_seq_len,
    )
    print(stats)
