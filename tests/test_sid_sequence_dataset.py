"""SID real-data pipeline: preprocess -> mapping -> dataset -> entry
(reference: examples/commons/datasets/sid_sequence_dataset.py)."""
import numpy as np
import pytest

from recsys_examples_tpu.data.sid_sequence_dataset import (
    SIDSequenceDataset,
    build_rq_sid_mapping,
    load_sequences,
    load_sid_mapping,
    preprocess_interactions,
)


def _write_interactions(path, n_users=12, n_items=30, seed=0):
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        n = rng.integers(2, 9)
        ts = np.sort(rng.integers(0, 10_000, size=n))
        for t in ts:
            rows.append((u, int(rng.integers(0, n_items)), int(t)))
    pd.DataFrame(rows, columns=["user_id", "item_id", "timestamp"]).to_csv(
        path, index=False
    )


def test_preprocess_and_load_roundtrip(tmp_path):
    raw = tmp_path / "inter.csv"
    out = tmp_path / "seq.npz"
    _write_interactions(str(raw))
    stats = preprocess_interactions(str(raw), str(out))
    assert stats["num_users"] > 0 and stats["num_items"] > 0
    flat, offs, users, n_items = load_sequences(str(out))
    assert offs[0] == 0 and offs[-1] == len(flat)
    assert len(users) == len(offs) - 1 == stats["num_users"]
    assert int(flat.max()) < n_items
    # per-user sequences are time-ordered by construction (stable sort)
    assert (np.diff(offs) >= 2).all()


def test_load_sid_mapping_layouts(tmp_path):
    H, N = 3, 17
    m = np.arange(H * N, dtype=np.int32).reshape(N, H) % 7
    p1 = tmp_path / "a.npy"
    np.save(p1, m)
    np.testing.assert_array_equal(load_sid_mapping(str(p1), H), m)
    # reference layout [H, num_items] transposes back
    p2 = tmp_path / "b.npy"
    np.save(p2, m.T)
    np.testing.assert_array_equal(load_sid_mapping(str(p2), H), m)
    p3 = tmp_path / "c.npz"
    np.savez(p3, mapping=m)
    np.testing.assert_array_equal(load_sid_mapping(str(p3), H), m)
    with pytest.raises(ValueError):
        load_sid_mapping(str(p1), 5)


def test_rq_mapping_unique_and_structured():
    rng = np.random.default_rng(0)
    # two well-separated clusters -> hierarchy 0 should recover them
    centers = np.array([[5.0, 0.0], [-5.0, 0.0]])
    labels = rng.integers(0, 2, size=64)
    emb = centers[labels] + rng.normal(0, 0.3, size=(64, 2))
    codes = build_rq_sid_mapping(emb, [2, 8, 8], iters=15, seed=1)
    assert codes.shape == (64, 3)
    # level 0 is a relabeling of the true clusters
    for c in (0, 1):
        assert len(set(codes[labels == c, 0])) == 1
    assert codes[labels == 0, 0][0] != codes[labels == 1, 0][0]
    # tuples unique (capacity 2*8*8 = 128 >= 64)
    assert len({tuple(r) for r in codes}) == 64


def test_dataset_leave_one_out(tmp_path):
    # 3 users with known sequences
    flat = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9], np.int64)
    offs = np.array([0, 4, 7, 10], np.int64)  # seqs: 0123 | 456 | 789
    H = 2
    mapping = np.stack(
        [np.arange(10, dtype=np.int32), np.arange(10, dtype=np.int32) * 2],
        axis=1,
    )
    ev = SIDSequenceDataset(
        flat, offs, mapping, batch_size=3, max_history_items=8,
        split="eval", shuffle=False,
    )
    batches = list(ev)
    assert len(batches) == 1
    b = batches[0]
    # eval candidate = last item of each sequence
    np.testing.assert_array_equal(
        np.asarray(b.candidate_sids), mapping[[3, 6, 9]]
    )
    # eval history = everything before it, SIDs flattened H-per-item
    np.testing.assert_array_equal(
        np.asarray(b.history_lengths), [3 * H, 2 * H, 2 * H]
    )
    np.testing.assert_array_equal(
        np.asarray(b.history_sids)[: 3 * H],
        mapping[[0, 1, 2]].reshape(-1),
    )
    tr = SIDSequenceDataset(
        flat, offs, mapping, batch_size=3, max_history_items=8,
        split="train", shuffle=False,
    )
    tb = list(tr)[0]
    # train candidate = second-to-last (eval label held out)
    np.testing.assert_array_equal(
        np.asarray(tb.candidate_sids), mapping[[2, 5, 8]]
    )
    np.testing.assert_array_equal(
        np.asarray(tb.history_lengths), [2 * H, 1 * H, 1 * H]
    )


def test_dataset_truncates_history():
    flat = np.arange(20, dtype=np.int64)
    offs = np.array([0, 20], np.int64)
    mapping = np.stack([np.arange(20, dtype=np.int32)] * 3, axis=1)
    ds = SIDSequenceDataset(
        flat, offs, mapping, batch_size=1, max_history_items=4,
        split="eval", shuffle=False,
    )
    b = list(ds)[0]
    assert int(b.history_lengths[0]) == 4 * 3
    # most recent 4 items before the candidate (19): 15..18
    np.testing.assert_array_equal(
        np.asarray(b.history_sids)[:12].reshape(4, 3)[:, 0], [15, 16, 17, 18]
    )


def test_entry_file_mode(tmp_path):
    """pretrain_sid_gr trains + evals end-to-end from files (reference:
    pretrain_sid_gr.py driven by sid parquet + mapping tensor)."""
    raw = tmp_path / "inter.csv"
    seq = tmp_path / "seq.npz"
    _write_interactions(str(raw), n_users=24, n_items=40, seed=3)
    preprocess_interactions(str(raw), str(seq))
    rng = np.random.default_rng(0)
    mapping = build_rq_sid_mapping(
        rng.normal(size=(40, 6)), [8, 8, 8], iters=5, seed=0
    )
    mpath = tmp_path / "map.npy"
    np.save(mpath, mapping)
    gin = tmp_path / "cfg.gin"
    gin.write_text(
        f'SIDDatasetArgs.dataset_name = "file"\n'
        f'SIDDatasetArgs.sequence_path = "{seq}"\n'
        f'SIDDatasetArgs.sid_mapping_path = "{mpath}"\n'
        "SIDTrainerArgs.max_train_iters = 3\n"
        "SIDTrainerArgs.batch_size = 4\n"
        "SIDTrainerArgs.max_history_items = 8\n"
        "SIDTrainerArgs.eval_iters = 2\n"
        "SIDNetworkArgs.num_hierarchies = 3\n"
        "SIDNetworkArgs.codebook_size = 8\n"
        "SIDNetworkArgs.hidden_size = 32\n"
        "SIDNetworkArgs.num_layers = 1\n"
        "SIDNetworkArgs.num_heads = 2\n"
        "SIDNetworkArgs.head_dim = 16\n"
        "SIDNetworkArgs.ffn_hidden = 64\n"
        "SIDNetworkArgs.beam_width = 4\n"
    )
    from recsys_examples_tpu.training import pretrain_sid_gr
    from recsys_examples_tpu.utils import gin_config

    gin_config.clear_config()
    try:
        params = pretrain_sid_gr.main(["--gin-config-file", str(gin)])
    finally:
        gin_config.clear_config()
    import jax

    assert all(
        bool(np.isfinite(np.asarray(x)).all())
        for x in jax.tree.leaves(params)
    )
