"""One-off attribution experiment (not part of the bench suite): time the
dense fwd+bwd with attention swapped for a pass-through to separate GEMM
cost from attention-kernel cost inside the real jitted program."""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from recsys_examples_tpu.data.hstu_batch import random_hstu_batch
    from recsys_examples_tpu.models.ranking_gr import RankingGR
    from recsys_examples_tpu.modules.config import (
        HSTUConfig, KernelBackend, PositionEncodingConfig, RankingConfig,
    )
    import recsys_examples_tpu.modules.hstu_attention as ha
    import recsys_examples_tpu.modules.hstu_layer as hl

    HIDDEN, HEADS, DH, LAYERS = 1024, 4, 256, 8
    batch = random_hstu_batch(
        seed=0, batch_size=32, max_history_len=2048,
        item_vocab=50_000_000, max_num_candidates=128, num_tasks=1,
        zipf_a=1.2, token_capacity=-1,
    )
    batch = jax.device_put(batch)  # producers yield host (numpy) leaves
    rng = jax.random.PRNGKey(0)
    emb = {"item": jax.random.normal(
        rng, (batch.features["item"].capacity, 128), jnp.float32)}

    def build(nl, null_attn=False):
        cfg = HSTUConfig(
            hidden_size=HIDDEN, num_layers=nl, num_attention_heads=HEADS,
            kv_channels=DH, hidden_dropout=0.0,
            kernel_backend=KernelBackend.PALLAS, dtype=jnp.bfloat16,
            position_encoding_config=PositionEncodingConfig(
                num_position_buckets=8192),
            target_group_size=1, recompute_layer=False,
            item_embedding_dim=128,
        )
        task = RankingConfig(embedding_configs=(),
                             prediction_head_arch=(512, 1), num_tasks=1)
        model = RankingGR(cfg, task)
        if null_attn:
            orig = ha.create_hstu_attention

            def fake(cfg_):
                def attn(q, k, v, offsets, max_seqlen, **kw):
                    return v * 1.000001 + q * 0.000001 + k * 0.000001
                return attn
            ha.create_hstu_attention = fake
            hl.create_hstu_attention = fake
        params = model.init({"params": rng, "dropout": rng}, batch,
                            train=False, embeddings=emb)["params"]

        def loss_fn(params, emb):
            loss, aux = model.apply({"params": params}, batch, train=True,
                                    embeddings=emb, rngs={"dropout": rng})
            return loss

        g = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
        ms = timeit(g, params, emb)
        if null_attn:
            ha.create_hstu_attention = orig
            hl.create_hstu_attention = orig
        return ms

    for nl in (1, 8):
        ms_full = build(nl)
        ms_noat = build(nl, null_attn=True)
        print(f"layers={nl}: fwd+bwd full={ms_full:.2f} ms, "
              f"no-attn={ms_noat:.2f} ms, attn cost={ms_full - ms_noat:.2f}")


if __name__ == "__main__":
    main()
