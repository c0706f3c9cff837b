"""Tensor-parallel correctness: the same model, params, and batch must
produce identical results on a (data=4, model=2) mesh as on one device
(reference test model: examples/hstu/test/tensor_parallel/test_tp_* —
TP-N output/grads vs TP-1 debug layer)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from recsys_examples_tpu.data.hstu_batch import random_hstu_batch
from recsys_examples_tpu.models.ranking_gr import RankingGR
from recsys_examples_tpu.modules.config import (
    EmbeddingConfig,
    HSTUConfig,
    KernelBackend,
    RankingConfig,
)
from recsys_examples_tpu.parallel.mesh import make_mesh, shard_params

CFG = HSTUConfig(
    hidden_size=32,
    num_layers=2,
    num_attention_heads=2,
    kv_channels=16,
    hidden_dropout=0.0,
    kernel_backend=KernelBackend.JNP,
    dtype=jnp.float32,
    tensor_model_parallel_size=2,
)
EMB = (EmbeddingConfig(("item",), "item_table", 1000, 32),)
TASK = RankingConfig(embedding_configs=EMB, prediction_head_arch=(16, 1))


def test_tp_matches_single_device():
    batch = random_hstu_batch(
        seed=0, batch_size=8, max_history_len=16, item_vocab=1000,
        max_num_candidates=4, num_tasks=1,
    )
    model = RankingGR(CFG, TASK)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch, train=False)[
        "params"
    ]
    loss_single, aux_single = model.apply(
        {"params": params}, batch, train=False
    )
    grads_single = jax.grad(
        lambda p: model.apply({"params": p}, batch, train=False)[0]
    )(params)

    mesh = make_mesh(dp=4, tp=2)
    params_sh = shard_params(mesh, params)

    with jax.set_mesh(mesh):
        loss_tp, _ = jax.jit(
            lambda p, b: model.apply({"params": p}, b, train=False)
        )(params_sh, batch)
        grads_tp = jax.jit(
            jax.grad(lambda p: model.apply({"params": p}, batch, train=False)[0])
        )(params_sh)

    np.testing.assert_allclose(
        float(loss_single), float(loss_tp), rtol=1e-5
    )
    flat_s, _ = jax.tree.flatten(grads_single)
    flat_t, _ = jax.tree.flatten(jax.device_get(grads_tp))
    for a, b in zip(flat_s, flat_t):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_multislice_mesh_train_step():
    """2-slice x (2 dp x 2 tp) mesh on 8 virtual devices: the full train
    step compiles and runs with a 'dcn' axis in the mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from recsys_examples_tpu.parallel.mesh import make_multislice_mesh

    mesh = make_multislice_mesh(dp_dcn=2, dp=2, tp=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.shape["dcn"] == 2 and mesh.shape["data"] == 2

    # dense-only step over the 3-axis mesh (embedding a2a stays on "data")
    import jax.numpy as jnp

    from recsys_examples_tpu.data.hstu_batch import random_hstu_batch
    from recsys_examples_tpu.models.ranking_gr import RankingGR
    from recsys_examples_tpu.modules.config import (
        HSTUConfig,
        KernelBackend,
        PositionEncodingConfig,
        RankingConfig,
        EmbeddingConfig,
    )
    from recsys_examples_tpu.training.train_state import (
        make_optimizer,
        make_train_step,
        TrainState,
    )

    cfg = HSTUConfig(
        hidden_size=32, num_layers=1, num_attention_heads=2, kv_channels=16,
        hidden_dropout=0.0, kernel_backend=KernelBackend.JNP,
        dtype=jnp.float32,
        position_encoding_config=PositionEncodingConfig(num_position_buckets=32),
        tensor_model_parallel_size=2,
    )
    task = RankingConfig(
        embedding_configs=(
            EmbeddingConfig(("item",), "item_table", 128, 32),
        ),
        prediction_head_arch=(8, 1), num_tasks=1,
    )
    model = RankingGR(cfg, task)
    batch = random_hstu_batch(seed=0, batch_size=8, max_history_len=8,
                              item_vocab=128, max_num_candidates=2,
                              num_tasks=1)
    with jax.set_mesh(mesh):
        params = model.init(jax.random.PRNGKey(0), batch)["params"]
        tx = make_optimizer(1e-3)
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(model, tx))
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        loss = float(metrics["loss"])
    assert np.isfinite(loss)
