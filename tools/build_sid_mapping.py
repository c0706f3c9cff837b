"""Build a PID->SID mapping file via residual k-means quantization.

Offline analogue of the reference's RQ-VAE codebook export (the
item_id_to_sid_mapping tensor consumed by
examples/commons/datasets/sid_sequence_dataset.py:97). Input item
embeddings come from a .npy [num_items, D] file, or are derived from a
preprocessed sequence npz via item co-occurrence SVD (--from-sequences):
items that appear in similar contexts land near each other, so the RQ
hierarchy captures real item structure rather than random ids.

Usage:
  python tools/build_sid_mapping.py --embeddings items.npy --out map.npy
  python tools/build_sid_mapping.py --from-sequences seq.npz --out map.npy \
      --codebook-sizes 256,256,256,256
"""
import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from recsys_examples_tpu.data.sid_sequence_dataset import (
    build_rq_sid_mapping,
    load_sequences,
)


def cooccurrence_embeddings(
    flat_items: np.ndarray,
    offsets: np.ndarray,
    num_items: int,
    dim: int = 64,
    window: int = 3,
    seed: int = 0,
) -> np.ndarray:
    """Item embeddings from windowed co-occurrence + randomized SVD."""
    rows, cols = [], []
    for u in range(len(offsets) - 1):
        seq = flat_items[offsets[u]:offsets[u + 1]]
        for i in range(len(seq)):
            for j in range(i + 1, min(i + 1 + window, len(seq))):
                rows.append(seq[i])
                cols.append(seq[j])
    C = np.zeros((num_items, num_items), np.float64)
    np.add.at(C, (rows, cols), 1.0)
    C = C + C.T
    # PPMI-ish normalization keeps hubs from dominating
    C = np.log1p(C)
    rng = np.random.default_rng(seed)
    # randomized range finder: C @ G -> QR -> small SVD
    G = rng.normal(size=(num_items, min(dim + 8, num_items)))
    Q, _ = np.linalg.qr(C @ G)
    B = Q.T @ C
    _, s, vt = np.linalg.svd(B, full_matrices=False)
    emb = (C @ vt[:dim].T) / np.maximum(s[:dim], 1e-6)
    return emb.astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--embeddings", help=".npy [num_items, D]")
    p.add_argument("--from-sequences", help="preprocessed sequence .npz")
    p.add_argument("--out", required=True)
    p.add_argument("--codebook-sizes", default="256,256,256,256")
    p.add_argument("--iters", type=int, default=25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--svd-dim", type=int, default=64)
    args = p.parse_args()
    sizes = [int(s) for s in args.codebook_sizes.split(",")]
    if args.embeddings:
        emb = np.load(args.embeddings)
    elif args.from_sequences:
        flat, offs, _users, n_items = load_sequences(args.from_sequences)
        emb = cooccurrence_embeddings(
            flat, offs, n_items, dim=args.svd_dim, seed=args.seed
        )
    else:
        p.error("need --embeddings or --from-sequences")
    mapping = build_rq_sid_mapping(
        emb, sizes, iters=args.iters, seed=args.seed
    )
    np.save(args.out, mapping)
    uniq = len({tuple(r) for r in mapping})
    print(
        f"wrote {args.out}: [{mapping.shape[0]}, {mapping.shape[1]}] "
        f"unique_tuples={uniq}/{mapping.shape[0]}"
    )


if __name__ == "__main__":
    main()
