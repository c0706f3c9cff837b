"""Checkpoint save/load: orbax for the dense state + binary key/value dump
for dynamic tables.

Counterpart of the reference two-part checkpoint
(examples/commons/checkpoint/checkpoint.py:47-116: DynamicEmb binary dump
dir + per-rank torch.save). Here:
  - dense (params/opt/step): orbax PyTreeCheckpointer
  - dynamic tables: per-table compacted (key, score, value-row) arrays in a
    .npz + JSON meta — format-stable and world-size independent on load
    (keys are re-inserted through the hash path, so resharding works;
    reference requires matching world size for the dense part only).
"""
from __future__ import annotations

import json
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from recsys_examples_tpu.dynamicemb.batched_table import (
    DynamicEmbeddingTable,
    DynamicEmbTableState,
)
from recsys_examples_tpu.dynamicemb.dynamicemb_config import EMPTY_KEY
from recsys_examples_tpu.dynamicemb.hashtable import insert_and_evict


def save_dense(path: str, state) -> None:
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(os.path.abspath(path), "dense"), state, force=True)


def load_dense(path: str, target):
    ckpt = ocp.PyTreeCheckpointer()
    return ckpt.restore(os.path.join(os.path.abspath(path), "dense"),
                        item=target)


def dump_table(
    path: str,
    name: str,
    state: DynamicEmbTableState,
    score_threshold: int = 0,
) -> int:
    """Compacted dump of live (optionally score-filtered) entries.

    score_threshold > 0 gives incremental dumps by score — the reference's
    `incremental_dump` semantics (dynamicemb/incremental_dump.py).
    Returns number of entries written."""
    keys = np.asarray(state.table.keys).reshape(-1)
    scores = np.asarray(state.table.scores).reshape(-1)
    values = np.asarray(state.table.values)
    live = keys != int(EMPTY_KEY)
    if score_threshold > 0:
        live &= scores >= score_threshold
    os.makedirs(path, exist_ok=True)
    extra = {}
    if state.table.opt is not None:
        extra["opt"] = np.asarray(state.table.opt)[live]
    np.savez(
        os.path.join(path, f"{name}.npz"),
        keys=keys[live],
        scores=scores[live],
        values=values[live],
        **extra,
    )
    meta = {
        "name": name,
        "num_entries": int(live.sum()),
        "value_dim": int(values.shape[1]),
        "step": int(np.asarray(state.step)[0]),
        "score_threshold": score_threshold,
    }
    with open(os.path.join(path, f"{name}.meta.json"), "w") as f:
        json.dump(meta, f)
    return meta["num_entries"]


def load_table(
    path: str,
    name: str,
    table: DynamicEmbeddingTable,
    state: DynamicEmbTableState,
    batch: int = 65536,
) -> DynamicEmbTableState:
    """Re-insert dumped entries through the hash path (world-size agnostic;
    reference analogue: DynamicEmbLoad dynamicemb/dump_load.py:91)."""
    data = np.load(os.path.join(path, f"{name}.npz"))
    keys, scores, values = data["keys"], data["scores"], data["values"]
    opt = data["opt"] if "opt" in data.files else None
    tstate = state.table
    for i in range(0, len(keys), batch):
        k = jnp.asarray(keys[i:i + batch])
        pad = batch - k.shape[0]
        if pad:
            k = jnp.pad(k, (0, pad), constant_values=int(EMPTY_KEY))
        s = jnp.pad(jnp.asarray(scores[i:i + batch]), (0, pad))
        v = jnp.pad(jnp.asarray(values[i:i + batch]), ((0, pad), (0, 0)))
        o = None
        if opt is not None:
            o = jnp.pad(jnp.asarray(opt[i:i + batch]), ((0, pad), (0, 0)))
        tstate, _, _ = insert_and_evict(
            tstate, k, s, v, o, update_existing_values=True,
            rounds=table.options.insert_rounds,
        )
    with open(os.path.join(path, f"{name}.meta.json")) as f:
        meta = json.load(f)
    return DynamicEmbTableState(
        table=tstate,
        counter=state.counter,
        step=jnp.asarray([meta["step"]], jnp.int64),
    )


def save_checkpoint(
    path: str,
    dense_state,
    sparse_states: Dict[str, DynamicEmbTableState],
    tables: Dict[str, DynamicEmbeddingTable],
) -> None:
    os.makedirs(path, exist_ok=True)
    # strip sparse (saved separately) from the dense train state
    dense_only = dense_state.replace(sparse={})
    save_dense(path, dense_only)
    emb_dir = os.path.join(path, "dynamicemb_module")
    for name, st in sparse_states.items():
        dump_table(emb_dir, name, st)


def load_checkpoint(
    path: str,
    dense_target,
    tables: Dict[str, DynamicEmbeddingTable],
):
    dense_only = dense_target.replace(sparse={})
    dense = load_dense(path, dense_only)
    emb_dir = os.path.join(path, "dynamicemb_module")
    sparse = {}
    for name, table in tables.items():
        st = table.init_state()
        sparse[name] = load_table(emb_dir, name, table, st)
    return dense.replace(sparse=sparse)
