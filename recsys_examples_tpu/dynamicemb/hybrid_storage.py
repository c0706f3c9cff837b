"""Hybrid HBM + host-RAM embedding storage with prefetch.

Counterpart of the reference's storage tiers
(corelib/dynamicemb/dynamicemb/key_value_table.py:2107 `HybridStorage`,
:1522 `DynamicEmbCache`, prefetch path
batched_dynamicemb_function.py:298 `_prefetch_cache_path`,
:699 `dynamicemb_prefetch`):

  - device tier: the bucketized HashTableState in HBM (the "cache")
  - host tier: numpy-backed key->row store (UVM/VMM equivalent on TPU is
    plain host RAM; capacity = RAM)
  - prefetch(keys): before the jitted train step, pull the batch's missing
    keys from host into the device table (insert_and_evict) and flush the
    evicted rows back to host. The train step then hits HBM only.

Prefetch runs host-side one batch ahead (the reference's dedicated
prefetch pipeline stage); overlap comes from dispatching the device insert
before the previous step's outputs are consumed.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recsys_examples_tpu.dynamicemb.batched_table import (
    DynamicEmbeddingTable,
    DynamicEmbTableState,
)
from recsys_examples_tpu.dynamicemb.dynamicemb_config import EMPTY_KEY
from recsys_examples_tpu.dynamicemb.hashtable import (
    export_batch,
    insert_and_evict,
    lookup,
)


class HostStorage:
    """Host-RAM key -> (value row, score) store backed by the native C++
    store (csrc/host_store.cpp) — counterpart of the reference's host/UVM
    tier (DynamicEmbStorage host side, key_value_table.py:2107) whose hot
    path is likewise native."""

    def __init__(self, value_dim: int):
        from recsys_examples_tpu.utils.native import NativeHostStore

        self.value_dim = value_dim
        self._store = NativeHostStore(value_dim)

    def __len__(self):
        return len(self._store)

    def get_batch(self, keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(values [n, vd], found [n]) for int64 keys."""
        return self._store.get(np.asarray(keys, np.int64))

    def put_batch(
        self, keys: np.ndarray, values: np.ndarray, scores: np.ndarray
    ) -> None:
        keys = np.asarray(keys, np.int64)
        live = keys != int(EMPTY_KEY)
        self._store.put(
            keys[live],
            np.asarray(values, np.float32)[live],
            np.asarray(scores, np.int64)[live],
        )

    def pop(self, key: int) -> None:
        self._store.erase(np.asarray([key], np.int64))

    def export(self, score_threshold: int = 0):
        return self._store.export(score_threshold)


class HybridDynamicEmbedding:
    """Device table (cache) + host tier; prefetch keeps the working set in
    HBM so the jitted step never misses to host."""

    def __init__(self, table: DynamicEmbeddingTable, host_storage=None):
        self.table = table
        # host tier: plain RAM store by default; pass a
        # tiered_storage.TieredHostStorage to cap RAM and spill the cold
        # tail to SSD (reference: FlexKV CPU/SSD tiers)
        self.host = host_storage or HostStorage(table.value_dim)
        # cache-stats probes (reference: commons/utils/dynamicemb_cache_stats
        # auto_install hit-rate tracking)
        self.stats = {
            "lookups": 0, "device_hits": 0, "host_onboards": 0,
            "evict_flushes": 0,
        }

    def init_state(self) -> DynamicEmbTableState:
        return self.table.init_state()

    def prefetch(
        self, state: DynamicEmbTableState, keys: np.ndarray
    ) -> DynamicEmbTableState:
        """Move the batch's host-resident keys into the device table,
        flushing evicted rows to host (reference: dynamicemb_prefetch
        batched_dynamicemb_function.py:699)."""
        ukeys = np.unique(keys[keys != int(EMPTY_KEY)])
        if len(ukeys) == 0:
            return state
        # pad to a power-of-two bucket so the jitted device lookup
        # compiles once per bucket, not once per batch
        nb = 1 << max(int(np.ceil(np.log2(max(len(ukeys), 1)))), 6)
        dk = np.full((nb,), int(EMPTY_KEY), np.int64)
        dk[: len(ukeys)] = ukeys
        _, found = lookup(state.table, jnp.asarray(dk))
        found = np.asarray(found)[: len(ukeys)]
        self.stats["lookups"] += len(ukeys)
        self.stats["device_hits"] += int(found.sum())
        missing = ukeys[~found]
        if len(missing) == 0:
            return state
        host_vals, host_found = self.host.get_batch(missing)
        # write-allocate: keys in NEITHER tier are inserted here with the
        # initializer (instead of silently during the train step, whose
        # evictions would bypass the host flush and lose rows) — the
        # jitted step then only ever hits HBM (reference:
        # _prefetch_cache_path inserts all misses, function.py:298)
        fresh = missing[~host_found]
        if len(fresh):
            from recsys_examples_tpu.dynamicemb.initializer import (
                initialize_embeddings,
            )
            from recsys_examples_tpu.dynamicemb.optimizer import (
                initial_opt_row,
            )

            init_e = np.asarray(initialize_embeddings(
                jnp.asarray(fresh), self.table.dim,
                self.table.options.initializer_args,
                self.table.options.value_dtype,
            ), np.float32)
            if self.table.opt_dim > 0:
                init_o = np.asarray(initial_opt_row(
                    self.table.opt_args.optimizer, len(fresh),
                    self.table.dim, self.table.opt_args,
                    self.table.options.value_dtype,
                ), np.float32)
                init_rows = np.concatenate([init_e, init_o], axis=1)
            else:
                init_rows = init_e
            hv = np.zeros(
                (len(missing), init_rows.shape[1]), np.float32
            )
            if host_vals.shape[1] == init_rows.shape[1]:
                hv[host_found] = host_vals[host_found]
            else:  # host rows stored without opt state
                hv[host_found, : host_vals.shape[1]] = (
                    host_vals[host_found]
                )
            hv[~host_found] = init_rows
            host_vals = hv
            host_found = np.ones((len(missing),), bool)
        bring = missing[host_found]
        if len(bring) == 0:
            return state
        vals = host_vals[host_found]
        self.stats["host_onboards"] += len(bring)
        dim = self.table.dim
        # snapshot victims: keys currently in the target buckets may be
        # evicted — capture the full table pre-insert to flush them after
        pre_keys = np.asarray(state.table.keys).reshape(-1)
        pre_scores = np.asarray(state.table.scores).reshape(-1)
        score = int(np.asarray(state.step)[0]) + 1
        # bucket the insert shapes too (EMPTY_KEY rows are skipped)
        nb = 1 << max(int(np.ceil(np.log2(max(len(bring), 1)))), 6)
        bring_p = np.full((nb,), int(EMPTY_KEY), np.int64)
        bring_p[: len(bring)] = bring
        vals_p = np.zeros((nb, vals.shape[1]), vals.dtype)
        vals_p[: len(bring)] = vals
        opt_rows = (
            jnp.asarray(vals_p[:, dim:], state.table.values.dtype)
            if self.table.opt_dim > 0
            else None
        )
        tstate, slots, evicted = insert_and_evict(
            state.table,
            jnp.asarray(bring_p),
            jnp.full((nb,), score, jnp.int64),
            jnp.asarray(vals_p[:, :dim], state.table.values.dtype),
            opt_rows,
            update_existing_values=True,
            rounds=self.table.options.insert_rounds,
        )
        slots_np = np.asarray(slots)[: len(bring)]
        ev_np = np.asarray(evicted)[: len(bring)]
        victim_slots = slots_np[ev_np & (slots_np >= 0)]
        if len(victim_slots):
            vkeys = pre_keys[victim_slots]
            vscores = pre_scores[victim_slots]
            vvals = np.asarray(state.table.values)[victim_slots]
            if state.table.opt is not None:
                vvals = np.concatenate(
                    [vvals, np.asarray(state.table.opt)[victim_slots]],
                    axis=1,
                )
            live = vkeys != int(EMPTY_KEY)
            self.host.put_batch(
                vkeys[live], vvals[live], vscores[live]
            )
            self.stats["evict_flushes"] += int(live.sum())
        # drop the keys now living on-device from host
        self.host._store.erase(np.asarray(bring, np.int64))
        return state.replace(table=tstate)

    def flush_all(self, state: DynamicEmbTableState) -> None:
        """Flush the whole device table to host (reference: flush_cache
        key_value_table.py:2776) — used before a full dump."""
        nb = state.table.num_buckets
        step = max(1, min(nb, 4096))
        for start in range(0, nb, step):
            cnt = min(step, nb - start)
            k, s, v, valid, o = export_batch(state.table, start, cnt)
            k, s, v, valid = map(np.asarray, (k, s, v, valid))
            if o is not None:
                v = np.concatenate([v, np.asarray(o)], axis=1)
            self.host.put_batch(k[valid], v[valid], s[valid])

    def hit_rate(self) -> float:
        """Device-tier hit rate since start (reference cache-stats probe)."""
        lk = self.stats["lookups"]
        return self.stats["device_hits"] / lk if lk else 1.0
