"""SID-GR serving engine + continuous scheduler tests (CPU, tiny model).

Reference test model: examples/sid-gr-inference/tests/ (scheduler, pools,
policies run CPU-side with stub backends)."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from recsys_examples_tpu.data.sid_batch import random_sid_batch
from recsys_examples_tpu.inference.sid_serving.engine import (
    GRServingEngine,
    ServingConfig,
)
from recsys_examples_tpu.inference.sid_serving.scheduler import (
    BeamPolicy,
    GRContinuousScheduler,
)
from recsys_examples_tpu.models.sid_gr import SIDGRConfig, SIDGRModel


@pytest.fixture(scope="module")
def engine():
    cfg = SIDGRConfig(
        num_hierarchies=3, codebook_size=16, hidden_size=32, num_layers=1,
        num_heads=2, head_dim=16, ffn_hidden=64, beam_width=4,
    )
    model = SIDGRModel(cfg)
    batch = random_sid_batch(0, 2, 4, 3, 16)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )["params"]
    scfg = ServingConfig(
        beam_width=4, ctx_buckets=(12, 24), batch_buckets=(1, 2, 4),
    )
    return GRServingEngine(model, params, scfg)


def test_engine_generate_and_bucket_reuse(engine):
    rng = np.random.default_rng(0)
    ctxs = [rng.integers(0, 16, size=(9,)), rng.integers(0, 16, size=(6,))]
    paths, scores = engine.generate(ctxs)
    assert paths.shape == (2, 4, 3)
    assert np.isfinite(scores).all()
    # beams sorted by score
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    n0 = engine.compile_count
    paths2, _ = engine.generate(
        [rng.integers(0, 16, size=(12,)), rng.integers(0, 16, size=(3,))]
    )
    assert engine.compile_count == n0  # bucket executable reused


def test_scheduler_end_to_end(engine):
    sched = GRContinuousScheduler(engine, max_batch=4)
    rng = np.random.default_rng(1)
    rids = [
        sched.submit(rng.integers(0, 16, size=(6,)), top_k=2)
        for _ in range(5)
    ]
    sched.run_until_empty()
    done = 0
    for rid in rids:
        res = sched.get_result(rid)
        assert res is not None and "sids" in res
        assert len(res["sids"]) == 2
        done += 1
    assert done == 5
    st = sched.status()
    assert st["completed"] == 5 and st["queue_depth"] == 0


def test_beam_policy():
    p = BeamPolicy(kind="scheduled", schedule=(64, 16, 8))
    assert p.width_for(0) == 64
    assert p.width_for(2) == 8
    assert p.width_for(9) == 8
    assert BeamPolicy(width=32).width_for(1) == 32


def test_score_margin_policy_and_prefix_cache():
    from recsys_examples_tpu.inference.sid_serving.scheduler import BeamPolicy
    import numpy as np

    pol = BeamPolicy(kind="score_margin", margin=1.0)
    paths = np.arange(12).reshape(4, 3)
    scores = np.asarray([-0.1, -0.5, -2.0, -9.0])
    p, s = pol.filter_results(paths, scores)
    assert len(s) == 2 and s.tolist() == [-0.1, -0.5]

    # prefix cache: a repeated context is served without decoding
    cfg = SIDGRConfig(
        num_hierarchies=3, codebook_size=16, hidden_size=32, num_layers=1,
        num_heads=2, head_dim=16, ffn_hidden=64, beam_width=4,
    )
    model = SIDGRModel(cfg)
    batch = random_sid_batch(0, 2, 4, 3, 16)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )["params"]
    scfg = ServingConfig(beam_width=4, ctx_buckets=(12,), batch_buckets=(1,))
    eng = GRServingEngine(model, params, scfg)
    sched = GRContinuousScheduler(eng, max_batch=1, prefix_cache_size=64)
    ctx = np.asarray([1, 2, 3, 4] * 2, np.int32)
    r1 = sched.submit(ctx, top_k=4)
    sched.run_until_empty()
    res1 = sched.get_result(r1)
    assert res1 and "sids" in res1
    r2 = sched.submit(ctx, top_k=4)
    res2 = sched.get_result(r2)
    assert res2 and res2.get("cached") is True
    assert res2["sids"] == res1["sids"]


def test_logits_processor_specs_and_builtin_processors():
    """Spec-built processors match the reference's pipeline semantics
    (gr_runtime/logits_processor.py: token_suppress/token_bias with
    phase gating, spec type aliases)."""
    import jax.numpy as jnp
    import numpy as np

    from recsys_examples_tpu.inference.sid_serving.logits_processor import (
        processors_from_specs,
    )

    chain = processors_from_specs([
        {"type": "suppress_tokens", "token_ids": [1, 3], "steps": [0]},
        {"type": "token_bias", "token_bias": {"2": 0.5}},
        {"type": "temperature", "temperature": 0.5},
    ])
    logp = jnp.log(jnp.full((1, 1, 4), 0.25))
    out0 = np.asarray(chain(0, logp, jnp.zeros((1, 1, 0), jnp.int32)))[0, 0]
    assert np.isneginf(out0[[1, 3]]).all()          # suppressed at step 0
    assert out0[2] > out0[0]                        # bias applied
    out1 = np.asarray(chain(1, logp, jnp.zeros((1, 1, 1), jnp.int32)))[0, 0]
    assert np.isfinite(out1[[1, 3]]).all()          # step gate: only step 0
    # temperature renormalizes: still a log-prob distribution
    assert abs(np.exp(out1).sum() - 1.0) < 1e-5
