"""Sequence parallelism + multi-slice demonstrations (INVENTORY §2.9 SP /
§5 multi-slice rows — demonstrated, not asserted).

SP: the HSTU layer's token dim sharded over the "model" axis must (a)
produce the single-device result and (b) actually compile to a partitioned
module with collectives (GSPMD inserts the gathers around attention and
the reduce-scatters around the TP linears — reference semantics:
native_hstu_layer.py:85-99 Megatron SP).

Multi-slice: a full train step on a ("dcn", "data", "model") mesh from
make_multislice_mesh, dynamic table rows sharded over the combined
("dcn", "data") axis.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from recsys_examples_tpu.jagged.jagged_tensor import JaggedData
from recsys_examples_tpu.modules.config import HSTUConfig, KernelBackend
from recsys_examples_tpu.modules.hstu_layer import HSTULayer
from recsys_examples_tpu.parallel.mesh import make_mesh, make_multislice_mesh


def _layer_inputs(T=256, D=64):
    rng = np.random.default_rng(0)
    lens = np.array([100, 60, 96], np.int32)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    vals = rng.standard_normal((T, D)).astype(np.float32) * 0.1
    vals[offs[-1]:] = 0
    return jnp.asarray(vals), jnp.asarray(offs), lens


def test_sp_token_sharding_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = HSTUConfig(
        hidden_size=64, num_layers=1, num_attention_heads=2, kv_channels=32,
        hidden_dropout=0.0, kernel_backend=KernelBackend.JNP,
        dtype=jnp.float32, position_encoding_config=None,
    )
    layer = HSTULayer(cfg)
    vals, offs, lens = _layer_inputs()
    jd = JaggedData(
        values=vals, seqlen=jnp.asarray(lens), seqlen_offsets=offs,
        max_seqlen=128,
    )
    params = layer.init(jax.random.PRNGKey(0), jd, False)["params"]
    ref = layer.apply({"params": params}, jd, False).values

    mesh = make_mesh(dp=4, tp=2)
    # token dim of the activations sharded over "model" = SP
    sp_sharding = NamedSharding(mesh, P("model", None))
    with jax.set_mesh(mesh):
        vals_sp = jax.device_put(vals, sp_sharding)
        jd_sp = JaggedData(
            values=vals_sp, seqlen=jnp.asarray(lens), seqlen_offsets=offs,
            max_seqlen=128,
        )

        fn = jax.jit(
            lambda p, j: layer.apply({"params": p}, j, False).values,
            in_shardings=(None, jax.tree.map(lambda _: None, jd_sp)),
            out_shardings=sp_sharding,
        )
        lowered = fn.lower(params, jd_sp)
        compiled = lowered.compile()
        out = fn(params, jd_sp)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )
    # the compiled module must really be partitioned with collectives —
    # SP is demonstrated, not asserted
    txt = compiled.as_text()
    assert any(
        coll in txt
        for coll in ("all-gather", "all-reduce", "collective-permute",
                     "reduce-scatter", "all-to-all")
    ), "no collectives in compiled SP module"


def test_multislice_train_step_dcn_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from recsys_examples_tpu.data.hstu_batch import random_hstu_batch
    from recsys_examples_tpu.dynamicemb.batched_table import (
        DynamicEmbeddingTable,
    )
    from recsys_examples_tpu.dynamicemb.dynamicemb_config import (
        DynamicEmbTableOptions,
    )
    from recsys_examples_tpu.dynamicemb.optimizer import SparseOptimizerArgs
    from recsys_examples_tpu.dynamicemb.sharded_collection import (
        ShardedDynamicEmbedding,
    )
    from recsys_examples_tpu.models.ranking_gr import RankingGR
    from recsys_examples_tpu.modules.config import (
        PositionEncodingConfig, RankingConfig,
    )
    from recsys_examples_tpu.training.train_state import make_optimizer
    from recsys_examples_tpu.training.trainer import GRTrainer

    mesh = make_multislice_mesh(dp_dcn=2, dp=2, tp=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    cfg = HSTUConfig(
        hidden_size=64, num_layers=2, num_attention_heads=2, kv_channels=32,
        hidden_dropout=0.0, kernel_backend=KernelBackend.JNP,
        dtype=jnp.float32,
        position_encoding_config=PositionEncodingConfig(
            num_position_buckets=128),
        tensor_model_parallel_size=2,
    )
    task = RankingConfig(
        embedding_configs=(), prediction_head_arch=(32, 1), num_tasks=1,
    )
    table = DynamicEmbeddingTable(
        DynamicEmbTableOptions(
            embedding_dim=64, max_capacity=1 << 12, bucket_capacity=64,
        ),
        SparseOptimizerArgs(optimizer="rowwise_adagrad", learning_rate=0.01),
        world_size=4,
    )
    # table rows sharded over the COMBINED ("dcn", "data") axis
    sparse = {"item": ShardedDynamicEmbedding(
        table, mesh=mesh, axis=("dcn", "data"),
    )}
    model = RankingGR(cfg, task)
    trainer = GRTrainer(model, make_optimizer(1e-3), sparse)
    batch = random_hstu_batch(
        seed=0, batch_size=8, max_history_len=32, item_vocab=100_000,
        max_num_candidates=4, num_tasks=1,
    )

    def shard_leaf(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % 4 == 0:
            return jax.device_put(
                x, NamedSharding(
                    mesh, P(("dcn", "data"), *([None] * (x.ndim - 1)))
                )
            )
        return jax.device_put(x, NamedSharding(mesh, P()))

    batch = jax.tree.map(shard_leaf, batch)
    with jax.set_mesh(mesh):
        state = trainer.init(jax.random.PRNGKey(0), batch)
        step = jax.jit(trainer.train_step)
        state, m = step(state, batch, jax.random.PRNGKey(1))
        l1 = float(m["loss"])
        state, m = step(state, batch, jax.random.PRNGKey(1))
        l2 = float(m["loss"])
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l2 < l1  # the step actually learns on repeated data
