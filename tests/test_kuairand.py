"""KuaiRand preprocessor + loader tests (reference:
examples/commons/hstu_data_preprocessor.py:429 DLRMKuaiRandProcessor)."""
import numpy as np
import pytest

from recsys_examples_tpu.data.sequence_dataset import (
    KUAIRAND_EVENT_WEIGHTS,
    SequenceDataset,
    preprocess_kuairand,
)


@pytest.fixture()
def kuairand_npz(tmp_path):
    import pandas as pd

    rng = np.random.default_rng(0)
    rows = []
    for uid in range(12):
        n = int(rng.integers(6, 20))
        for t in range(n):
            rows.append({
                "user_id": uid,
                "video_id": int(rng.integers(0, 500)),
                "time_ms": 1000 * t + int(rng.integers(0, 10)),
                "is_click": int(rng.integers(0, 2)),
                "is_like": int(rng.integers(0, 2)),
                "is_follow": 0,
                "is_comment": 0,
                "is_forward": 0,
                "is_hate": 0,
                "long_view": int(rng.integers(0, 2)),
                "is_profile_enter": 0,
            })
    log1 = tmp_path / "log1.csv"
    # split rows across two files like the real 4_08/4_22 logs
    log2 = tmp_path / "log2.csv"
    df = pd.DataFrame(rows)
    df.iloc[::2].to_csv(log1, index=False)
    df.iloc[1::2].to_csv(log2, index=False)

    uf = pd.DataFrame({
        "user_id": np.arange(12),
        "user_active_degree": ["high_active", "full_active"] * 6,
        "follow_user_num_range": ["0", "(0,10]"] * 6,
        "fans_user_num_range": ["0"] * 12,
        "friend_user_num_range": ["0"] * 12,
        "register_days_range": ["15-30", "31-60"] * 6,
    })
    ufp = tmp_path / "user_features.csv"
    uf.to_csv(ufp, index=False)

    out = tmp_path / "kuairand.npz"
    data = preprocess_kuairand(
        [str(log1), str(log2)], str(ufp), str(out), min_seq_len=5
    )
    return str(out), data


def test_preprocess_kuairand_merges_events_and_sorts(kuairand_npz):
    path, data = kuairand_npz
    assert len(data["user_ids"]) > 0
    # action bits only use defined weights
    allowed = sum(KUAIRAND_EVENT_WEIGHTS.values())
    assert np.all(data["action_ids"] >= 0)
    assert np.all(data["action_ids"] <= allowed)
    # per-user timestamps non-decreasing (merge of two files re-sorted)
    offs = data["offsets"]
    for u in range(len(data["user_ids"])):
        ts = data["timestamps"][offs[u]:offs[u + 1]]
        assert np.all(np.diff(ts) >= 0)
    # contextual columns present and label-encoded
    assert "ctx_user_active_degree" in data
    assert data["ctx_user_active_degree"].shape == data["user_ids"].shape


def test_kuairand_dataset_multi_event_labels(kuairand_npz):
    path, _ = kuairand_npz
    ds = SequenceDataset(
        path, max_history_len=16, max_num_candidates=2, num_tasks=3,
        action_vocab_size=256, label_mode="action_bits",
        contextual_feature_names=("user", "user_active_degree"),
    )
    b = next(ds.batches(4, train=True, seed=0))
    assert b.contextual_feature_names == ("user", "user_active_degree")
    assert b.features["user"].values.shape == (4,)
    assert b.features["user_active_degree"].values.shape == (4,)
    labels = np.asarray(b.labels)
    # labels are masked to the first num_tasks bits
    assert labels.max() < (1 << 3)
    ll = np.asarray(b.label_lengths)
    assert ll.max() <= 2

    # eval split yields finite batches then stops
    n_eval = sum(1 for _ in ds.batches(4, train=False, shuffle=False))
    assert n_eval >= 1
