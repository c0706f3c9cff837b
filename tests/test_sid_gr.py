"""SID-GR model tests: training forward, baseline generate vs KV-cached
beam decode equivalence (reference test model:
examples/sid_gr/tests/test_beam_decode_generate.py — asserts top-K beam-set
overlap between the two paths)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_examples_tpu.data.sid_batch import random_sid_batch
from recsys_examples_tpu.models.beam_search import (
    decode_paths,
    first_expand,
    init_beam,
    propagate,
)
from recsys_examples_tpu.models.sid_gr import SIDGRConfig, SIDGRModel
from recsys_examples_tpu.modules.sid_eval_metrics import sid_eval_metrics

CFG = SIDGRConfig(
    num_hierarchies=3,
    codebook_size=32,
    hidden_size=32,
    num_layers=2,
    num_heads=2,
    head_dim=16,
    ffn_hidden=64,
    beam_width=4,
)


@pytest.fixture(scope="module")
def model_and_params():
    batch = random_sid_batch(0, 4, max_history_items=6, num_hierarchies=3,
                             codebook_size=32)
    model = SIDGRModel(CFG)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )["params"]
    return model, params, batch


def test_train_forward_and_grad(model_and_params):
    model, params, batch = model_and_params
    loss, aux = model.apply({"params": params}, batch, train=False)
    assert np.isfinite(float(loss))
    assert aux["per_hierarchy_loss"].shape == (3,)

    g = jax.grad(
        lambda p: model.apply({"params": p}, batch, train=False)[0]
    )(params)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_beam_search_mechanics():
    state = init_beam(2, 3, 2)
    logp0 = jnp.log(jnp.array([
        [0.5, 0.3, 0.15, 0.05],
        [0.25, 0.25, 0.25, 0.25],
    ]))
    state = first_expand(state, logp0)
    np.testing.assert_array_equal(np.asarray(state.tokens[0, 0]), [0, 1, 2])
    # second hierarchy: beam 1 gets a strong continuation
    logp1 = jnp.full((2, 3, 4), jnp.log(0.01))
    logp1 = logp1.at[0, 1, 3].set(jnp.log(0.99))
    state = propagate(state, logp1)
    paths = np.asarray(decode_paths(state))
    # best path for sample 0 must be (token 1, token 3)
    np.testing.assert_array_equal(paths[0, 0], [1, 3])


def test_generate_beam_decode_matches_baseline(model_and_params):
    model, params, batch = model_and_params
    paths_a, scores_a = model.apply(
        {"params": params}, batch, beam_width=4, method=SIDGRModel.generate
    )
    paths_b, scores_b = model.apply(
        {"params": params}, batch, beam_width=4,
        method=SIDGRModel.generate_beam_decode,
    )
    np.testing.assert_allclose(
        np.asarray(scores_a), np.asarray(scores_b), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(paths_a), np.asarray(paths_b))


def test_sid_eval_metrics():
    paths = jnp.array([
        [[1, 2], [3, 4]],
        [[5, 6], [7, 8]],
    ])
    target = jnp.array([[3, 4], [9, 9]])
    m = sid_eval_metrics(paths, target, ks=(1, 2))
    assert float(m["recall@1"]) == 0.0
    assert float(m["recall@2"]) == 0.5
    assert 0.0 < float(m["ndcg@2"]) < 1.0
