"""End-to-end model smoke tests on CPU (JNP attention backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_examples_tpu.data.hstu_batch import random_hstu_batch
from recsys_examples_tpu.modules.config import (
    EmbeddingConfig,
    HSTUConfig,
    KernelBackend,
    PositionEncodingConfig,
    RankingConfig,
    RetrievalConfig,
)
from recsys_examples_tpu.models.ranking_gr import RankingGR
from recsys_examples_tpu.models.retrieval_gr import RetrievalGR
from recsys_examples_tpu.training.train_state import (
    TrainState,
    make_optimizer,
    make_train_step,
)

HSTU_CFG = HSTUConfig(
    hidden_size=32,
    num_layers=2,
    num_attention_heads=2,
    kv_channels=16,
    hidden_dropout=0.1,
    kernel_backend=KernelBackend.JNP,
    dtype=jnp.float32,
    position_encoding_config=PositionEncodingConfig(
        num_position_buckets=64, num_time_buckets=16
    ),
)

EMB = (
    EmbeddingConfig(("item",), "item_table", vocab_size=100, dim=32),
    EmbeddingConfig(("action",), "action_table", vocab_size=8, dim=32),
    EmbeddingConfig(("user",), "user_table", vocab_size=20, dim=32),
)


def make_batch(candidates=True):
    return random_hstu_batch(
        seed=0,
        batch_size=4,
        max_history_len=16,
        item_vocab=100,
        action_vocab=8,
        contextual_vocabs={"user": 20},
        max_num_candidates=4 if candidates else 0,
        num_tasks=2,
    )


def test_ranking_forward_and_step():
    batch = make_batch(candidates=True)
    cfg = RankingConfig(
        embedding_configs=EMB, prediction_head_arch=(16, 2), num_tasks=2
    )
    model = RankingGR(HSTU_CFG, cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng, "dropout": rng}, batch, train=False
    )["params"]
    loss, aux = model.apply(
        {"params": params}, batch, train=False
    )
    assert np.isfinite(float(loss))
    # logits rows = candidate capacity (de-interleaved)
    assert aux["logits"].shape == (4 * 4, 2)

    tx = make_optimizer(1e-3)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, tx))
    l0 = None
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        l = float(metrics["loss"])
        assert np.isfinite(l)
        if l0 is None:
            l0 = l
    assert float(metrics["loss"]) < l0 + 1e-3  # trending down on fixed batch


def test_ranking_no_candidates():
    batch = make_batch(candidates=False)
    cfg = RankingConfig(
        embedding_configs=EMB, prediction_head_arch=(16, 2), num_tasks=2
    )
    model = RankingGR(HSTU_CFG, cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch, train=False)[
        "params"
    ]
    loss, aux = model.apply({"params": params}, batch, train=False)
    assert np.isfinite(float(loss))


def test_retrieval_forward_and_step():
    batch = random_hstu_batch(
        seed=1, batch_size=4, max_history_len=16, item_vocab=100,
        action_vocab=8, num_tasks=1,
    )
    cfg = RetrievalConfig(embedding_configs=EMB[:2])
    model = RetrievalGR(HSTU_CFG, cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch, train=False)[
        "params"
    ]
    loss, aux = model.apply({"params": params}, batch, train=False)
    assert np.isfinite(float(loss))
    tx = make_optimizer(1e-3)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, tx))
    state, m1 = step(state, batch, rng)
    for _ in range(4):
        state, m = step(state, batch, rng)
    assert float(m["loss"]) < float(m1["loss"])


def test_ranking_with_relative_bias_trains():
    """HSTU layer with trainable rab: grads flow and loss is finite."""
    import dataclasses as _dc

    from recsys_examples_tpu.data.hstu_batch import random_hstu_batch
    from recsys_examples_tpu.models.ranking_gr import RankingGR
    from recsys_examples_tpu.modules.config import (
        HSTUConfig,
        KernelBackend,
        PositionEncodingConfig,
        RankingConfig,
    )

    cfg = HSTUConfig(
        hidden_size=32, num_layers=1, num_attention_heads=2, kv_channels=16,
        hidden_dropout=0.0, kernel_backend=KernelBackend.JNP,
        dtype=jnp.float32,
        position_encoding_config=PositionEncodingConfig(
            num_position_buckets=64
        ),
        use_relative_attention_bias=True,
        relative_bias_num_buckets=16,
        relative_bias_max_distance=64,
        item_embedding_dim=32,
    )
    task = RankingConfig(embedding_configs=(), prediction_head_arch=(8, 1),
                         num_tasks=1)
    model = RankingGR(cfg, task)
    batch = random_hstu_batch(seed=0, batch_size=2, max_history_len=16,
                              item_vocab=100, max_num_candidates=2,
                              num_tasks=1)
    emb = jax.random.normal(
        jax.random.PRNGKey(0),
        (batch.features["item"].values.shape[0], 32), jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(1), batch, embeddings={"item": emb})
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert any("relative_bias" in jax.tree_util.keystr(kp) for kp, _ in flat)

    def loss_fn(p):
        loss, _ = model.apply(p, batch, embeddings={"item": emb})
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = sum(
        float(jnp.abs(g).sum())
        for kp, g in jax.tree_util.tree_leaves_with_path(grads)
        if "relative_bias" in jax.tree_util.keystr(kp)
    )
    assert gnorm > 0, "rab received no gradient"


def test_ranking_label_alignment_variable_candidates():
    """Candidate logits are jagged-packed; labels must be repacked from
    the b-major [b*max_nc + j] layout to match (regression: misalignment
    when any sample has nc < max_num_candidates)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from recsys_examples_tpu.data.hstu_batch import HSTUBatch, JaggedIds
    from recsys_examples_tpu.models.ranking_gr import RankingGR
    from recsys_examples_tpu.modules.config import (
        HSTUConfig, KernelBackend, RankingConfig,
    )

    cfg = HSTUConfig(
        hidden_size=16, num_layers=1, num_attention_heads=2, kv_channels=8,
        hidden_dropout=0.0, kernel_backend=KernelBackend.JNP,
        dtype=jnp.float32, position_encoding_config=None,
    )
    task = RankingConfig(
        embedding_configs=(), prediction_head_arch=(8, 1), num_tasks=1,
    )
    model = RankingGR(cfg, task)
    # 2 samples: nc = [1, 2], max_nc = 2 -> b-major labels have a gap
    item = JaggedIds(
        values=jnp.asarray([1, 2, 3, 4, 5, 6, 7, 0], jnp.int64),
        lengths=jnp.asarray([3, 4], jnp.int32),
        offsets=jnp.asarray([0, 3, 7], jnp.int32),
        max_len=4,
    )
    labels = jnp.asarray([1, 9, 0, 1], jnp.int32)  # 9 = padding slot
    batch = HSTUBatch(
        features={"item": item}, batch_size=2,
        feature_to_max_seqlen={"item": 4}, item_feature_name="item",
        max_num_candidates=2,
        num_candidates=jnp.asarray([1, 2], jnp.int32),
        labels=labels,
        label_lengths=jnp.asarray([1, 2], jnp.int32),
    )
    emb = {"item": jax.random.normal(jax.random.PRNGKey(0), (8, 16))}
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, train=False,
        embeddings=emb,
    )["params"]
    loss, aux = model.apply(
        {"params": params}, batch, train=False, embeddings=emb,
    )
    got = np.asarray(aux["labels"])
    val = np.asarray(aux["valid"])
    # jagged-packed rows: [s0c0, s1c0, s1c1]; their labels must be
    # [labels[0], labels[2], labels[3]] — the padding slot 9 never appears
    assert val[:3].all()
    np.testing.assert_array_equal(got[:3], [1, 0, 1])
