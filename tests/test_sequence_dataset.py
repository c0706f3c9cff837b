"""Dataset loader: native C++ assembler vs Python fallback equivalence,
preprocessor roundtrip, prefetch iterator (reference test model:
examples/hstu/test dataset tests)."""
import numpy as np
import pytest

from recsys_examples_tpu.data.sequence_dataset import (
    PrefetchIterator,
    SequenceDataset,
    preprocess_movielens,
)


@pytest.fixture(scope="module")
def npz_path(tmp_path_factory):
    """Synthetic ml-style ratings -> preprocessed npz."""
    tmp = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    rows = []
    for uid in range(1, 21):
        n = rng.integers(6, 40)
        ts = np.sort(rng.integers(0, 10_000, size=n))
        for t in ts:
            rows.append((uid, int(rng.integers(1, 500)),
                         int(rng.integers(1, 6)), int(t)))
    import pandas as pd

    df = pd.DataFrame(rows, columns=["user_id", "movie_id", "rating", "ts"])
    csv = tmp / "ratings.csv"
    df.to_csv(csv, index=False)
    out = tmp / "seq.npz"
    preprocess_movielens(str(csv), str(out))
    return str(out)


def test_native_assembler_matches_python(npz_path):
    from recsys_examples_tpu.utils.native import batch_assembler_lib

    if batch_assembler_lib() is None:
        pytest.skip("native assembler unavailable")
    ds = SequenceDataset(npz_path, max_history_len=16,
                         max_num_candidates=2, action_vocab_size=6)
    uids = np.arange(8)
    cap = 8 * 18
    native = ds._assemble(uids, train=True, cap=cap)

    # force the python path
    import recsys_examples_tpu.utils.native as nat

    saved = nat._asm_lib, nat._asm_tried
    nat._asm_lib, nat._asm_tried = None, True
    try:
        py = ds._assemble(uids, train=True, cap=cap)
    finally:
        nat._asm_lib, nat._asm_tried = saved
    for a, b, name in zip(native, py,
                          "iv av lens ncand labels lab_len".split()):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_batches_and_prefetch(npz_path):
    ds = SequenceDataset(npz_path, max_history_len=16,
                         max_num_candidates=2, action_vocab_size=6)
    it = ds.batches(4, train=False, shuffle=False)
    batches = list(PrefetchIterator(it))
    assert len(batches) == 5  # 20 users / 4
    b = batches[0]
    assert b.batch_size == 4
    lens = np.asarray(b.features["item"].lengths)
    assert (lens >= 1).all() and (lens <= 18).all()
    # eval includes the holdout item; train excludes it (both windows are
    # capped at max_history_len + max_num_candidates = 18, so users whose
    # raw history exceeds the window stay at 18 in both splits)
    it_tr = ds.batches(4, train=True, shuffle=False)
    tr = np.asarray(next(iter(it_tr)).features["item"].lengths)
    uncapped = lens < 18
    np.testing.assert_array_equal(tr[uncapped], lens[uncapped] - 1)
    np.testing.assert_array_equal(tr[~uncapped], 18)


def test_eval_candidate_override_scores_only_holdout(npz_path):
    """Train with a last-N candidate window but eval ONLY the holdout:
    the eval batch (train=False, nc=1) candidate must be each user's true
    last item, and train batches (nc=4) must never include it."""
    tr = SequenceDataset(npz_path, max_history_len=32, max_num_candidates=4)
    ev = SequenceDataset(npz_path, max_history_len=32, max_num_candidates=1)
    d = np.load(npz_path)
    items, offs = d["item_ids"], d["offsets"]
    B = 4
    ebatch = next(ev.batches(B, train=False, shuffle=False))
    evals = np.asarray(ebatch.features["item"].values)
    eoffs = np.asarray(ebatch.features["item"].offsets)
    elens = np.asarray(ebatch.features["item"].lengths)
    tbatch = next(tr.batches(B, train=True, shuffle=False))
    tvals = np.asarray(tbatch.features["item"].values)
    toffs = np.asarray(tbatch.features["item"].offsets)
    tlens = np.asarray(tbatch.features["item"].lengths)
    for u in range(B):
        true_last = items[offs[u + 1] - 1]
        # eval candidate (last of the nc=1 batch row) IS the holdout
        assert evals[eoffs[u] + elens[u] - 1] == true_last
        # the train row (holdout removed) never contains position e-1
        trow = tvals[toffs[u]:toffs[u] + tlens[u]]
        full = items[offs[u]:offs[u + 1]]
        np.testing.assert_array_equal(trow, full[:-1][-len(trow):])


def test_batch_producers_yield_host_arrays(npz_path):
    """Thread-safety contract: batch producers run on the prefetch worker
    thread and must NEVER create jax arrays (a second thread issuing
    transfers against the TPU client concurrently with the main thread's
    dispatches corrupts batch transfers — observed as nondeterministic
    non-finite params). Every pytree leaf must be host numpy."""
    import jax

    from recsys_examples_tpu.data.batch_shuffler import shuffle_hstu_batch
    from recsys_examples_tpu.data.hstu_batch import random_hstu_batch

    def assert_host(batch, what):
        leaves = jax.tree_util.tree_leaves(batch)
        assert leaves, what
        for leaf in leaves:
            assert isinstance(leaf, np.ndarray), (
                what, type(leaf))

    ds = SequenceDataset(npz_path, max_history_len=32, max_num_candidates=4)
    b = next(ds.batches(4, train=True, shuffle=False))
    assert_host(b, "SequenceDataset.batches")
    assert_host(shuffle_hstu_batch(b, 2), "shuffle_hstu_batch")
    rb = random_hstu_batch(
        seed=0, batch_size=4, max_history_len=16, item_vocab=100,
        action_vocab=8, max_num_candidates=2, num_tasks=1,
    )
    assert_host(rb, "random_hstu_batch")
    assert_host(shuffle_hstu_batch(rb, 2), "shuffle_hstu_batch(random)")
