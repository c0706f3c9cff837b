"""Dynamic embedding configuration & types.

Counterpart of the reference config surface
(corelib/dynamicemb/dynamicemb/dynamicemb_config.py:308
`DynamicEmbTableOptions`, :113 `DynamicEmbScoreStrategy`,
:105 `DynamicEmbEvictStrategy`; capacity math :733 `get_sharded_table_capacity`).

TPU design: a table is a pytree of dense arrays (keys / values / scores /
opt-state) laid out as fixed-size buckets. All mutation is functional
(state-in/state-out) so every op jits; eviction is an argmin over a bucket.
"""
from __future__ import annotations

import dataclasses
import enum
import math
from typing import Optional, Tuple

import jax.numpy as jnp

# sentinel for an empty slot (reserved key; reference reserves 2^64-1 space
# via its own EMPTY_KEY in HKV)
EMPTY_KEY = jnp.int64(-(2 ** 63))


class DynamicEmbScoreStrategy(enum.Enum):
    """How per-key scores (eviction priority; larger = keep) are produced.

    TIMESTAMP: score = global step counter supplied per lookup (device-side
               monotonic proxy for the reference's GPU nanosecond clock).
    STEP:      score = user-incremented step.
    LFU:       score = access frequency count.
    CUSTOM:    caller passes scores per lookup.
    """

    TIMESTAMP = "timestamp"
    STEP = "step"
    LFU = "lfu"
    CUSTOM = "custom"


class DynamicEmbEvictStrategy(enum.Enum):
    LRU = "lru"
    LFU = "lfu"
    CUSTOM = "custom"


class DynamicEmbInitializerMode(enum.Enum):
    NORMAL = "normal"
    TRUNCATED_NORMAL = "truncated_normal"
    UNIFORM = "uniform"
    CONSTANT = "constant"
    DEBUG = "debug"   # value = key % vocab (deterministic, for tests)


@dataclasses.dataclass(frozen=True)
class DynamicEmbInitializerArgs:
    mode: DynamicEmbInitializerMode = DynamicEmbInitializerMode.UNIFORM
    mean: float = 0.0
    std_dev: float = 1.0
    lower: float = 0.0   # 0 => auto ±1/sqrt(dim) like the reference planner
    upper: float = 0.0
    value: float = 0.0


@dataclasses.dataclass(frozen=True)
class DynamicEmbTableOptions:
    """Per-table options (reference: dynamicemb_config.py:308)."""

    embedding_dim: int
    global_hbm_for_values: int = 0          # bytes budget (informational)
    max_capacity: int = 2 ** 16             # global slots across all shards
    bucket_capacity: int = 128              # slots per hash bucket
    initializer_args: DynamicEmbInitializerArgs = DynamicEmbInitializerArgs()
    eval_initializer_args: DynamicEmbInitializerArgs = DynamicEmbInitializerArgs(
        mode=DynamicEmbInitializerMode.CONSTANT, value=0.0
    )
    score_strategy: DynamicEmbScoreStrategy = DynamicEmbScoreStrategy.TIMESTAMP
    evict_strategy: DynamicEmbEvictStrategy = DynamicEmbEvictStrategy.LRU
    admission_threshold: int = 0            # >0 enables frequency admission
    value_dtype: jnp.dtype = jnp.float32
    # insert conflict-resolution rounds (vectorized claim/retry passes)
    insert_rounds: int = 16
    safe_check_mode: bool = False

    def sharded_capacity(self, world_size: int) -> int:
        """Per-shard slot count, bucket aligned (reference:
        get_sharded_table_capacity dynamicemb_config.py:733)."""
        per = math.ceil(self.max_capacity / world_size)
        buckets = max(1, math.ceil(per / self.bucket_capacity))
        return buckets * self.bucket_capacity


def hash_keys(keys, num_buckets: int):
    """64-bit mix hash -> bucket index. splitmix64 finalizer."""
    k = keys.astype(jnp.uint64)
    k = (k ^ (k >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    k = (k ^ (k >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    k = k ^ (k >> jnp.uint64(31))
    return (k % jnp.uint64(num_buckets)).astype(jnp.int32)
