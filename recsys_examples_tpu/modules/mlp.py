"""Simple MLP head (reference: examples/hstu/modules/mlp.py)."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax


_ACTS = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "silu": nn.silu,
    "none": lambda x: x,
}


class MLP(nn.Module):
    layer_sizes: Sequence[int]
    activation: str = "relu"
    use_bias: bool = True
    final_activation: bool = False
    dtype: jax.typing.DTypeLike = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = _ACTS[self.activation]
        for i, size in enumerate(self.layer_sizes):
            x = nn.Dense(size, use_bias=self.use_bias, dtype=self.dtype,
                         name=f"layer_{i}")(x)
            if i < len(self.layer_sizes) - 1 or self.final_activation:
                x = act(x)
        return x
