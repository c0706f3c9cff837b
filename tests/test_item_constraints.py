"""Trie catalog constraints + logits processors."""
import jax.numpy as jnp
import numpy as np

from recsys_examples_tpu.inference.sid_serving.item_constraints import (
    LogitsProcessor,
    TrieConstraint,
)


def test_trie_masks_invalid_prefixes():
    catalog = np.array([
        [0, 1, 2],
        [0, 1, 3],
        [1, 0, 0],
    ])
    trie = TrieConstraint(catalog, codebook_size=4)
    # root: tokens {0, 1} valid
    logits = jnp.zeros((1, 1, 4))
    nodes = jnp.zeros((1, 1), jnp.int32)
    m0 = np.asarray(trie.mask_logits(logits, nodes, 0))[0, 0]
    assert np.isfinite(m0[[0, 1]]).all() and np.isinf(m0[[2, 3]]).all()
    # take token 0 -> children {1}
    n1 = trie.advance(nodes, jnp.asarray([[0]], jnp.int32), 0)
    m1 = np.asarray(trie.mask_logits(logits, n1, 1))[0, 0]
    assert np.isfinite(m1[1]) and np.isinf(m1[[0, 2, 3]]).all()
    # take token 1 -> children {2, 3}
    n2 = trie.advance(n1, jnp.asarray([[1]], jnp.int32), 1)
    m2 = np.asarray(trie.mask_logits(logits, n2, 2))[0, 0]
    assert np.isfinite(m2[[2, 3]]).all() and np.isinf(m2[[0, 1]]).all()
    # catalog reload changes allowed set
    trie.reload(np.array([[2, 2, 2]]))
    m0b = np.asarray(
        trie.mask_logits(logits, jnp.zeros((1, 1), jnp.int32), 0)
    )[0, 0]
    assert np.isfinite(m0b[2]) and np.isinf(m0b[[0, 1, 3]]).all()


def test_logits_processor():
    lp = LogitsProcessor(temperature=2.0, top_k=2)
    x = jnp.asarray([[4.0, 2.0, 1.0, 3.0]])
    y = np.asarray(lp(x))
    np.testing.assert_allclose(y[0, 0], 2.0)
    assert np.isinf(y[0, 1]) and np.isinf(y[0, 2])
    np.testing.assert_allclose(y[0, 3], 1.5)
