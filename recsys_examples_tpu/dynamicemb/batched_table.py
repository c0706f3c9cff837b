"""Dynamic embedding table module: train/eval lookup, admission, scores,
sparse backward — functional state-in/state-out.

Counterpart of the reference's `BatchedDynamicEmbeddingTablesV2`
(corelib/dynamicemb/dynamicemb/batched_dynamicemb_tables.py:452) +
`DynamicEmbeddingFunction` autograd (batched_dynamicemb_function.py:1042)
+ admission (embedding_admission.py).

Train forward (mirrors `_generic_forward_path`
batched_dynamicemb_function.py:935):
  unique keys -> lookup -> init misses -> (admission filter) ->
  insert_and_evict -> gather rows -> embeddings.
Backward: reduce grads by reverse indices (done by autodiff on the gathered
unique embeddings) -> fused sparse optimizer on the rows.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from recsys_examples_tpu.dynamicemb.dynamicemb_config import (
    EMPTY_KEY,
    DynamicEmbScoreStrategy,
    DynamicEmbTableOptions,
)
from recsys_examples_tpu.dynamicemb.hashtable import (
    HashTableState,
    add_scores,
    create_table_state,
    insert_and_evict,
    lookup,
)
from recsys_examples_tpu.dynamicemb.initializer import initialize_embeddings
from recsys_examples_tpu.dynamicemb.optimizer import (
    SparseOptimizerArgs,
    initial_opt_row,
    opt_dim_for,
    sparse_update,
    value_dim_for,
)


@struct.dataclass
class DynamicEmbTableState:
    table: HashTableState
    counter: Optional[HashTableState]  # admission frequency counter
    step: jax.Array                    # [1] int64 monotonic score clock


class DynamicEmbeddingTable:
    """Static config + functional ops for one sharded dynamic table."""

    def __init__(
        self,
        options: DynamicEmbTableOptions,
        opt_args: SparseOptimizerArgs,
        world_size: int = 1,
    ):
        self.options = options
        self.opt_args = opt_args
        self.dim = options.embedding_dim
        self.opt_dim = opt_dim_for(opt_args.optimizer, self.dim)
        # total floats per row (memory accounting)
        self.value_dim = value_dim_for(opt_args.optimizer, self.dim)
        self.capacity = options.sharded_capacity(world_size)

    # ------------------------------------------------------------ state
    def init_state(self) -> DynamicEmbTableState:
        opts = self.options
        table = create_table_state(
            self.capacity, opts.bucket_capacity, self.dim,
            opts.value_dtype, opt_dim=self.opt_dim,
        )
        counter = None
        if opts.admission_threshold > 0:
            # counter table: scores hold frequencies, 1-wide dummy values
            counter = create_table_state(
                self.capacity, opts.bucket_capacity, 1, jnp.float32
            )
        return DynamicEmbTableState(
            table=table, counter=counter, step=jnp.zeros((1,), jnp.int64)
        )

    # ------------------------------------------------------------ scores
    def _scores(self, state: DynamicEmbTableState, n: int) -> jax.Array:
        strat = self.options.score_strategy
        if strat in (DynamicEmbScoreStrategy.TIMESTAMP, DynamicEmbScoreStrategy.STEP):
            return jnp.full((n,), 1, jnp.int64) * (state.step[0] + 1)
        if strat == DynamicEmbScoreStrategy.LFU:
            # counts accumulate via add_scores after insert; seed at 0
            return jnp.zeros((n,), jnp.int64)
        raise ValueError(f"CUSTOM scores must be passed explicitly")

    # ------------------------------------------------------------ forward
    def forward_train(
        self,
        state: DynamicEmbTableState,
        unique_keys: jax.Array,        # [u] int64, EMPTY_KEY padded
        custom_scores: Optional[jax.Array] = None,
        frequencies: Optional[jax.Array] = None,  # [u] per-batch counts
    ) -> Tuple[DynamicEmbTableState, jax.Array, jax.Array]:
        """Returns (state, slots [u], unique_embeddings [u, dim]).

        Misses are initialized and inserted (evicting if needed); keys
        failing admission get transient init embeddings and are NOT stored.
        """
        opts = self.options
        u = unique_keys.shape[0]
        active = unique_keys != EMPTY_KEY

        if custom_scores is not None:
            scores = custom_scores.astype(jnp.int64)
        else:
            scores = self._scores(state, u)

        # admission: bump counters for missed keys; admit if freq >= thresh
        # (the pre-lookup is only needed on this path — insert_and_evict
        # resolves hits itself)
        counter = state.counter
        insert_keys = unique_keys
        if counter is not None:
            slots0, found = lookup(state.table, unique_keys)
            freq = (
                frequencies.astype(jnp.int64)
                if frequencies is not None
                else jnp.ones((u,), jnp.int64)
            )
            miss_keys = jnp.where(found, EMPTY_KEY, unique_keys)
            counter, cslots, _ = insert_and_evict(
                counter, miss_keys, jnp.zeros((u,), jnp.int64), None,
                rounds=opts.insert_rounds,
            )
            counter = add_scores(counter, cslots, freq)
            csafe = jnp.clip(cslots, 0, counter.capacity - 1)
            counts = counter.scores.reshape(-1)[csafe]
            admitted = found | (
                (cslots >= 0) & (counts >= opts.admission_threshold)
            )
            insert_keys = jnp.where(admitted, unique_keys, EMPTY_KEY)
        else:
            admitted = active

        init_emb = initialize_embeddings(
            unique_keys, self.dim, opts.initializer_args,
            opts.value_dtype,
        )
        init_opt = initial_opt_row(
            self.opt_args.optimizer, u, self.dim, self.opt_args,
            opts.value_dtype,
        )
        # only misses insert new rows; hits refresh scores
        table, slots, _ = insert_and_evict(
            state.table,
            insert_keys,
            scores,
            init_emb,
            init_opt,
            update_existing_values=False,
            rounds=opts.insert_rounds,
        )
        if opts.score_strategy == DynamicEmbScoreStrategy.LFU:
            table = add_scores(
                table, slots,
                frequencies.astype(jnp.int64)
                if frequencies is not None
                else jnp.ones((u,), jnp.int64),
            )

        safe = jnp.clip(slots, 0, table.capacity - 1)
        emb = table.values[safe]
        stored = slots >= 0
        emb = jnp.where(stored[:, None], emb, init_emb)
        emb = jnp.where(active[:, None], emb, jnp.zeros((), emb.dtype))

        new_state = DynamicEmbTableState(
            table=table, counter=counter, step=state.step + 1
        )
        return new_state, slots, emb

    def forward_eval(
        self, state: DynamicEmbTableState, unique_keys: jax.Array
    ) -> jax.Array:
        """Eval lookup: missing keys get the eval initializer (zeros by
        default), nothing is inserted (reference: dynamicemb_eval_forward
        batched_dynamicemb_function.py:836)."""
        slots, found = lookup(state.table, unique_keys)
        safe = jnp.clip(slots, 0, state.table.capacity - 1)
        emb = state.table.values[safe]
        miss_emb = initialize_embeddings(
            unique_keys, self.dim, self.options.eval_initializer_args,
            self.options.value_dtype,
        )
        emb = jnp.where(found[:, None], emb, miss_emb)
        active = unique_keys != EMPTY_KEY
        return jnp.where(active[:, None], emb, jnp.zeros((), emb.dtype))

    # ------------------------------------------------------------ backward
    def backward(
        self,
        state: DynamicEmbTableState,
        slots: jax.Array,
        grads: jax.Array,   # [u, dim]
        step: Optional[jax.Array] = None,
    ) -> DynamicEmbTableState:
        step_val = step if step is not None else state.step[0]
        table = sparse_update(
            state.table, slots, grads, self.opt_args,
            step_val.astype(jnp.int32),
        )
        return dataclasses.replace(state, table=table)

    # ------------------------------------------------------------ scores API
    def get_score(
        self, state: DynamicEmbTableState, keys: jax.Array
    ) -> jax.Array:
        """Per-key scores (-1 for missing) — reference:
        BatchedDynamicEmbeddingTablesV2.get_score."""
        from recsys_examples_tpu.dynamicemb.hashtable import lookup

        slots, found = lookup(state.table, keys)
        C = state.table.bucket_capacity
        safe = jnp.clip(slots, 0, state.table.capacity - 1)
        sc = state.table.scores[safe // C, safe % C]
        return jnp.where(found, sc, jnp.int64(-1))

    def set_score(
        self,
        state: DynamicEmbTableState,
        keys: jax.Array,
        scores: jax.Array,
    ) -> DynamicEmbTableState:
        """Overwrite scores of present keys — reference: set_score."""
        from recsys_examples_tpu.dynamicemb.hashtable import (
            lookup,
            update_scores,
        )

        slots, _ = lookup(state.table, keys)
        return dataclasses.replace(
            state, table=update_scores(state.table, slots, scores)
        )

    # ------------------------------------------------------------ bulk ops
    def fill(
        self,
        state: DynamicEmbTableState,
        keys: jax.Array,
        values: jax.Array,
        scores: Optional[jax.Array] = None,
    ) -> DynamicEmbTableState:
        """Bulk insert (checkpoint load / FILL_DYNAMICEMB_TABLES path)."""
        from recsys_examples_tpu.dynamicemb.optimizer import initial_opt_row

        u = keys.shape[0]
        # insert_and_evict requires deduped keys (its hit-refresh scatter
        # writes one cell per key); external callers may pass duplicates,
        # so keep only the LAST occurrence of each key (dict semantics) by
        # masking earlier ones to EMPTY_KEY — static shapes throughout.
        order = jnp.argsort(keys, stable=True)
        ks = keys[order]
        is_last = jnp.concatenate(
            [ks[:-1] != ks[1:], jnp.ones((1,), bool)]
        )
        keep = jnp.zeros((u,), bool).at[order].set(is_last)
        keys = jnp.where(keep, keys, EMPTY_KEY)
        if scores is None:
            scores = jnp.full((u,), 1, jnp.int64) * (state.step[0] + 1)
        init_opt = initial_opt_row(
            self.opt_args.optimizer, u, self.dim, self.opt_args,
            self.options.value_dtype,
        )
        table, _, _ = insert_and_evict(
            state.table, keys, scores, values.astype(self.options.value_dtype),
            init_opt, update_existing_values=True,
            rounds=self.options.insert_rounds,
        )
        return dataclasses.replace(state, table=table)

    def expand(
        self, state: DynamicEmbTableState, factor: int = 2
    ) -> Tuple["DynamicEmbeddingTable", DynamicEmbTableState]:
        """Grow the table by `factor` and rehash all live entries — the
        TPU analogue of the reference's VMM-backed in-place doubling
        (corelib/dynamicemb/src/vmm_tensor.cu; expand_if_need_impl
        key_value_table.py:624). XLA arrays cannot grow in place, so this
        allocates the bigger table and re-inserts (one pass, batched)."""
        import dataclasses as _dc

        new_table = DynamicEmbeddingTable(
            _dc.replace(
                self.options, max_capacity=self.capacity * factor
            ),
            self.opt_args,
        )
        new_state = new_table.init_state()
        nt = new_state.table
        old = state.table
        live = (old.keys != EMPTY_KEY).reshape(-1)
        keys = old.keys.reshape(-1)
        scores = old.scores.reshape(-1)
        opt_rows = old.opt
        masked = jnp.where(live, keys, EMPTY_KEY)
        nt, slots, _ = insert_and_evict(
            nt, masked, scores, old.values, opt_rows,
            update_existing_values=True,
            rounds=self.options.insert_rounds,
        )
        new_state = DynamicEmbTableState(
            table=nt.replace(
                inserted=old.inserted, evicted=old.evicted,
                overflowed=old.overflowed,
            ),
            counter=new_state.counter,
            step=state.step,
        )
        return new_table, new_state
