"""Logging helpers (reference: examples/commons/utils/logger.py)."""
from __future__ import annotations

import logging
import sys
import time

_logger = None


def get_logger():
    global _logger
    if _logger is None:
        _logger = logging.getLogger("recsys_examples_tpu")
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(
            logging.Formatter("[%(asctime)s %(levelname)s] %(message)s")
        )
        _logger.addHandler(h)
        _logger.setLevel(logging.INFO)
        _logger.propagate = False
    return _logger


def print_rank_0(msg: str):
    import jax

    if jax.process_index() == 0:
        get_logger().info(msg)


class StepTimer:
    """Wall-clock step timer with EMA (host-side; device time is captured by
    block_until_ready at the measurement boundary)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else (
            self.alpha * dt + (1 - self.alpha) * self.ema
        )
        return dt
