"""Streaming filters as explicit-state pytrees.

`MovingWindowFilter` mirrors the reference's O(1) moving average
(``legged_ctrl/include/utils/MovingWindowFilter.hpp:14-63``). The reference
uses Neumaier-compensated summation to fight f64 drift in an infinite-stream
deque; here the window lives in a fixed ring buffer and the average is an
exact masked mean, which is drift-free by construction and vmap-friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class WindowState(NamedTuple):
    buf: jnp.ndarray    # (..., window)
    idx: jnp.ndarray    # int32 scalar (or batch)
    count: jnp.ndarray  # int32 — #valid entries (saturates at window)


def window_init(window: int, shape=(), dtype=jnp.float32) -> WindowState:
    return WindowState(
        buf=jnp.zeros(shape + (window,), dtype=dtype),
        idx=jnp.zeros(shape, dtype=jnp.int32),
        count=jnp.zeros(shape, dtype=jnp.int32),
    )


def window_update(state: WindowState, value: jnp.ndarray) -> Tuple[WindowState, jnp.ndarray]:
    """Push `value`; returns (new_state, windowed average)."""
    window = state.buf.shape[-1]
    onehot = jnp.arange(window) == state.idx[..., None]
    buf = jnp.where(onehot, value[..., None], state.buf)
    count = jnp.minimum(state.count + 1, window)
    avg = jnp.sum(buf * (jnp.arange(window) < count[..., None]), axis=-1) / count
    return WindowState(buf=buf, idx=(state.idx + 1) % window, count=count), avg
