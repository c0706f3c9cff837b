"""Runtime-validation behaviors: deterministic insertion, overflow
accounting, watchdog stack dump (reference: DynamicEmbCheckMode safe-check
counters, DEMB_DETERMINISM_MODE, commons/utils/watchdog.py)."""
import io
import sys
import time

import jax.numpy as jnp
import numpy as np
import pytest

from recsys_examples_tpu.dynamicemb.hashtable import (
    create_table_state,
    insert_and_evict,
    table_size,
)


def test_insertion_is_deterministic():
    """Two identical insert sequences produce bit-identical table state
    (reference: DEMB_DETERMINISM_MODE — here determinism is by
    construction: claims resolve to the lowest key index)."""
    rng = np.random.default_rng(0)
    keys = jnp.asarray(
        np.unique(rng.integers(0, 10_000, size=(256,))), jnp.int64
    )
    scores = jnp.arange(keys.shape[0], dtype=jnp.int64)
    vals = jnp.tile(
        jnp.arange(keys.shape[0], dtype=jnp.float32)[:, None], (1, 4)
    )
    states = []
    for _ in range(2):
        st = create_table_state(capacity=128, bucket_capacity=8, value_dim=4)
        st, slots, ev = insert_and_evict(st, keys, scores, vals)
        states.append((np.asarray(st.keys), np.asarray(st.scores),
                       np.asarray(st.values), np.asarray(slots)))
    for a, b in zip(*states[:1], *states[1:]):
        pass
    for a, b in zip(states[0], states[1]):
        np.testing.assert_array_equal(a, b)


def test_overflow_counter_accounts_for_failures():
    """More same-bucket keys than capacity+rounds can place -> the rest are
    counted as overflowed, not silently dropped (reference: safe-check
    counts of failed inserts, DynamicEmb_APIs.md:200)."""
    # capacity 8, 1 bucket of 8 -> 20 distinct keys cannot all fit
    st = create_table_state(capacity=8, bucket_capacity=8, value_dim=2)
    keys = jnp.arange(1, 21, dtype=jnp.int64)
    scores = jnp.arange(20, dtype=jnp.int64)
    vals = jnp.ones((20, 2), jnp.float32)
    st, slots, ev = insert_and_evict(st, keys, scores, vals, rounds=16)
    placed = int((np.asarray(slots) >= 0).sum())
    assert placed <= 8 + int(np.asarray(ev).sum())
    assert int(st.overflowed[0]) == 20 - placed
    assert int(table_size(st)) <= 8


def test_watchdog_dumps_on_stall(capsys):
    from recsys_examples_tpu.utils.watchdog import watched_iter

    def slow_gen():
        yield 1
        time.sleep(0.6)
        yield 2

    err = io.StringIO()
    old = sys.stderr
    sys.stderr = err
    try:
        list(watched_iter(slow_gen(), timeout=0.2))
    finally:
        sys.stderr = old
    out = err.getvalue()
    # faulthandler writes the stack dump to the real fd (needs fileno());
    # the banner goes through sys.stderr and is what we can capture here
    assert "watchdog" in out and "dumping all thread stacks" in out
