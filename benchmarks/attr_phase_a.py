"""One-off: break down phase A (sparse forward) cost at bench shapes.
Each piece is chained x10 inside one jit to hide per-dispatch latency."""
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


def timeit10(make_chained, *args, iters=5):
    fn = jax.jit(make_chained)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / 10 * 1e3  # ms per inner iter


def main():
    from recsys_examples_tpu.dynamicemb.batched_table import (
        DynamicEmbeddingTable,
    )
    from recsys_examples_tpu.dynamicemb.dynamicemb_config import (
        DynamicEmbTableOptions,
    )
    from recsys_examples_tpu.dynamicemb.hashtable import (
        insert_and_evict, lookup,
    )
    from recsys_examples_tpu.dynamicemb.initializer import (
        initialize_embeddings,
    )
    from recsys_examples_tpu.dynamicemb.optimizer import SparseOptimizerArgs
    from recsys_examples_tpu.dynamicemb.unique_op import segmented_unique

    n = 10752
    rng = np.random.default_rng(0)
    ids_np = rng.zipf(1.2, size=(n,)) % 50_000_000
    ids = jnp.asarray(ids_np, jnp.int64)

    tbl = DynamicEmbeddingTable(
        DynamicEmbTableOptions(embedding_dim=128, max_capacity=1 << 22,
                               bucket_capacity=128),
        SparseOptimizerArgs(optimizer="rowwise_adagrad", learning_rate=0.01),
    )
    st = tbl.init_state()
    # warm the table so inserts are hits
    uk, rev, _, nu = segmented_unique(ids)
    st, slots, emb = jax.jit(tbl.forward_train)(st, uk)
    jax.block_until_ready(emb)

    def chain(f, x):
        def body(i, x):
            return f(x)
        return lambda x0: jax.lax.fori_loop(0, 10, body, x0)

    # 1. segmented_unique
    def uq(x):
        uk, rev, _, _ = segmented_unique(x)
        return x + uk[0] * 0 + rev[0] * 0
    print(f"segmented_unique:   {timeit10(chain(uq, ids), ids):7.3f} ms")

    # 2. sort alone
    def so(x):
        return jnp.sort(x) * 0 + x
    print(f"sort int64 [10752]: {timeit10(chain(so, ids), ids):7.3f} ms")

    def ag(x):
        return jnp.argsort(x).astype(jnp.int64) * 0 + x
    print(f"argsort:            {timeit10(chain(ag, ids), ids):7.3f} ms")

    # 3. insert_and_evict warm (all hits)
    tstate = st.table

    def ins(keys):
        t2, slots, _ = insert_and_evict(
            tstate, keys, jnp.ones((n,), jnp.int64),
            jnp.zeros((n, 128), jnp.float32),
            jnp.zeros((n, tstate.opt_dim if hasattr(tstate, 'opt_dim') else 1),
                      jnp.float32) if False else None,
            rounds=16)
        return keys + slots[0] * 0
    print(f"insert (warm hits): {timeit10(chain(ins, uk), uk):7.3f} ms")

    # 4. lookup only
    def lk(keys):
        slots, found = lookup(tstate, keys)
        return keys + slots[0] * 0
    print(f"lookup:             {timeit10(chain(lk, uk), uk):7.3f} ms")

    # 5. value gather [u,128] from 4M-row table
    slots_c = jnp.clip(slots, 0, tstate.capacity - 1)

    def gv(s):
        e = tstate.values[s]
        return s + e[0, 0].astype(jnp.int32) * 0
    print(f"value gather:       {timeit10(chain(gv, slots_c), slots_c):7.3f} ms")

    # 6. initializer (uniform)
    opts = tbl.options

    def init(keys):
        e = initialize_embeddings(keys, 128, opts.initializer_args,
                                  opts.value_dtype)
        return keys + e[0, 0].astype(jnp.int64) * 0
    print(f"initializer:        {timeit10(chain(init, uk), uk):7.3f} ms")

    # 7. full forward_train warm
    def ft(keys):
        st2, slots, emb = tbl.forward_train(st, keys)
        return keys + slots[0] * 0 + emb[0, 0].astype(jnp.int64) * 0
    print(f"forward_train warm: {timeit10(chain(ft, uk), uk):7.3f} ms")


if __name__ == "__main__":
    main()
