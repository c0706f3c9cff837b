"""HSTU pre/postprocessor unit tests vs hand-built expectations
(reference test model: examples/hstu/test/test_jagged_tensor.py etc.)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_examples_tpu.data.hstu_batch import HSTUBatch, JaggedIds
from recsys_examples_tpu.modules.config import HSTUConfig, KernelBackend
from recsys_examples_tpu.modules.hstu_block import (
    HSTUBlockPostprocessor,
    HSTUBlockPreprocessor,
)
from recsys_examples_tpu.jagged.jagged_tensor import JaggedData
from recsys_examples_tpu.ops.jagged import lengths_to_offsets

CFG = HSTUConfig(
    hidden_size=4,
    num_layers=1,
    num_attention_heads=1,
    kv_channels=4,
    hidden_dropout=0.0,
    kernel_backend=KernelBackend.JNP,
    dtype=jnp.float32,
    position_encoding_config=None,
)


def _mk_batch():
    # 2 samples: item lens [3, 2] (incl. 1 candidate each), action same
    item = JaggedIds(
        values=jnp.asarray([1, 2, 3, 4, 5, 0], jnp.int64),
        lengths=jnp.asarray([3, 2], jnp.int32),
        offsets=jnp.asarray([0, 3, 5], jnp.int32),
        max_len=3,
    )
    action = JaggedIds(
        values=jnp.asarray([7, 7, 7, 7, 7, 0], jnp.int64),
        lengths=item.lengths,
        offsets=item.offsets,
        max_len=3,
    )
    return HSTUBatch(
        features={"item": item, "action": action},
        batch_size=2,
        feature_to_max_seqlen={"item": 3, "action": 3},
        item_feature_name="item",
        action_feature_name="action",
        max_num_candidates=1,
        num_candidates=jnp.asarray([1, 1], jnp.int32),
        labels=jnp.asarray([1, 0], jnp.int32),
        label_lengths=jnp.asarray([1, 1], jnp.int32),
    )


def test_preprocess_interleave_and_candidates():
    batch = _mk_batch()
    emb = {
        "item": jnp.arange(24, dtype=jnp.float32).reshape(6, 4),
        "action": -jnp.arange(24, dtype=jnp.float32).reshape(6, 4),
    }
    pre = HSTUBlockPreprocessor(CFG)
    jd = pre.apply({"params": {}}, emb, batch, train=False)
    # HISTORY interleaved (2*(len-nc)); candidates appended UNinterleaved
    # (their actions are the prediction target and must not be fed —
    # reference: hstu_processor.py:59-68)
    np.testing.assert_array_equal(np.asarray(jd.seqlen), [5, 3])
    assert jd.max_seqlen == 6
    # candidate counts unchanged by the interleave
    np.testing.assert_array_equal(np.asarray(jd.num_candidates), [1, 1])
    # rows: i0 a0 i1 a1 c2 | i3 a3 c4
    np.testing.assert_allclose(np.asarray(jd.values[0]), np.asarray(emb["item"][0]))
    np.testing.assert_allclose(np.asarray(jd.values[1]), np.asarray(emb["action"][0]))
    np.testing.assert_allclose(np.asarray(jd.values[2]), np.asarray(emb["item"][1]))
    np.testing.assert_allclose(np.asarray(jd.values[3]), np.asarray(emb["action"][1]))
    np.testing.assert_allclose(np.asarray(jd.values[4]), np.asarray(emb["item"][2]))
    offs = np.asarray(jd.seqlen_offsets)
    np.testing.assert_allclose(
        np.asarray(jd.values[offs[1]]), np.asarray(emb["item"][3])
    )
    np.testing.assert_allclose(
        np.asarray(jd.values[offs[1] + 2]), np.asarray(emb["item"][4])
    )


def test_postprocess_candidates_deinterleaved_and_normalized():
    batch = _mk_batch()
    emb = {
        "item": jnp.arange(24, dtype=jnp.float32).reshape(6, 4) + 1.0,
        "action": jnp.arange(24, dtype=jnp.float32).reshape(6, 4) + 100.0,
    }
    pre = HSTUBlockPreprocessor(CFG)
    jd = pre.apply({"params": {}}, emb, batch, train=False)
    post = HSTUBlockPostprocessor()
    out = post.apply({"params": {}}, jd)
    # output rows = candidate capacity (B * max_num_candidates), item rows
    assert out.values.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(out.seqlen), [1, 1])
    # candidate of sample 0 = item row 2 (last item), L2 normalized
    src = np.asarray(emb["item"][2])
    np.testing.assert_allclose(
        np.asarray(out.values[0]), src / np.linalg.norm(src), rtol=1e-4
    )
    src1 = np.asarray(emb["item"][4])
    np.testing.assert_allclose(
        np.asarray(out.values[1]), src1 / np.linalg.norm(src1), rtol=1e-4
    )


def test_position_encoder_custom_vjp_matches_autodiff():
    """The scatter-free d(pos_w) path must match plain autodiff."""
    from recsys_examples_tpu.modules.position_encoder import (
        HSTUPositionalEncoder,
    )

    enc = HSTUPositionalEncoder(
        num_position_buckets=16, num_time_buckets=8, embedding_dim=8,
    )
    lens = jnp.asarray([5, 20, 1], jnp.int32)   # one sample clamps (20>16)
    offs = jnp.asarray([0, 5, 25, 26], jnp.int32)
    T, D = 32, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (T, D))
    tgt = jnp.asarray([1, 2, 0], jnp.int32)
    params = enc.init(
        jax.random.PRNGKey(1), x, lens, offs, num_targets=tgt,
    )["params"]

    def run(params, x, fast):
        return enc.apply(
            {"params": params}, x, lens, offs, num_targets=tgt,
            max_seqlen=32 if fast else 0,
        ).astype(jnp.float32)

    o_fast = run(params, x, True)
    o_slow = run(params, x, False)
    np.testing.assert_allclose(
        np.asarray(o_fast), np.asarray(o_slow), rtol=1e-6
    )
    g = jax.random.normal(jax.random.PRNGKey(2), o_fast.shape)
    gf = jax.grad(lambda p, x: (run(p, x, True) * g).sum(), argnums=(0, 1))(
        params, x
    )
    gs = jax.grad(lambda p, x: (run(p, x, False) * g).sum(), argnums=(0, 1))(
        params, x
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        gf, gs,
    )
