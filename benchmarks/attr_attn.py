"""One-off: attention kernel timing at the e2e bench's Zipf shape, chained
x10 per dispatch, sweeping block sizes."""
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

from recsys_examples_tpu.data.hstu_batch import random_hstu_batch
from recsys_examples_tpu.ops.jagged import lengths_to_offsets
from recsys_examples_tpu.ops.pallas.hstu_attention import hstu_attn_varlen


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / 10 * 1e3


def main():
    H, D = 4, 256
    batch = random_hstu_batch(
        seed=0, batch_size=32, max_history_len=2048,
        item_vocab=50_000_000, max_num_candidates=128, num_tasks=1,
        zipf_a=1.2, token_capacity=-1,
    )
    batch = jax.device_put(batch)  # producers yield host (numpy) leaves
    item = batch.features["item"]
    T = item.capacity
    offs = lengths_to_offsets(item.lengths)
    ml = 2048 + 128
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (T, H, D), jnp.bfloat16)
    k = jax.random.normal(rng, (T, H, D), jnp.bfloat16)
    v = jax.random.normal(rng, (T, H, D), jnp.bfloat16)
    aux = (offs, None, batch.num_candidates)
    ln = np.asarray(item.lengths, np.float64)
    fl = float((2.0 * 2.0 * H * D * ln ** 2 / 2).sum())
    print(f"T={int(ln.sum())} flops={fl/1e9:.1f} GF")

    for bq, bk in ((128, 128), (128, 256), (256, 256), (256, 512),
                   (512, 512)):
        def fwd10(q, k, v):
            def body(i, acc):
                o = hstu_attn_varlen(
                    q, k, v, aux, max_seqlen=ml, alpha=1.0 / D,
                    scaling_seqlen=ml, block_q=bq, block_k=bk)
                return acc + o[0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

        ms = timeit(jax.jit(fwd10), q, k, v)
        print(f"fwd  BQ={bq} BK={bk}: {ms:7.3f} ms ({fl/ms/1e9:.1f} TFLOPS)")

    for bq, bk in ((128, 128), (256, 256)):
        def bwd10(q, k, v):
            g = jax.grad(lambda q, k, v: hstu_attn_varlen(
                q, k, v, aux, max_seqlen=ml, alpha=1.0 / D,
                scaling_seqlen=ml, block_q=bq, block_k=bk,
            ).astype(jnp.float32).sum(), argnums=(0, 1, 2))

            def body(i, acc):
                dq, dk, dv = g(q, k, v)
                return acc + dq[0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

        ms = timeit(jax.jit(bwd10), q, k, v)
        print(f"bwd  BQ={bq} BK={bk}: {ms:7.3f} ms")


if __name__ == "__main__":
    main()
