"""Dynamic loss scaling (reference loss_scaler.py:3-80).

On TPU the training path is bfloat16, which has float32's exponent range —
so loss scaling is unnecessary and the default path never uses this.  It is
provided for float16 experimentation parity: scale starts at 2**32, halves
on overflow, doubles after ``scale_window`` clean steps (the reference's
DynamicLossScaler semantics)."""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LossScalerState(NamedTuple):
    scale: jnp.ndarray          # current loss scale
    good_steps: jnp.ndarray     # consecutive overflow-free steps


def init_loss_scaler(init_scale: float = 2.0 ** 32) -> LossScalerState:
    return LossScalerState(jnp.float32(init_scale), jnp.int32(0))


def scale_loss(state: LossScalerState, loss: jnp.ndarray) -> jnp.ndarray:
    return loss * state.scale


def unscale_and_update(state: LossScalerState, grads,
                       scale_factor: float = 2.0,
                       scale_window: int = 1000
                       ) -> Tuple[object, LossScalerState, jnp.ndarray]:
    """Unscale grads; on overflow (inf/nan) halve the scale and signal the
    step should be skipped.  Returns (grads, new_state, overflow)."""
    grads = jax.tree_util.tree_map(lambda g: g / state.scale, grads)
    finite = jnp.array(True)
    for g in jax.tree_util.tree_leaves(grads):
        finite &= jnp.isfinite(g).all()
    overflow = ~finite

    new_scale = jnp.where(overflow, state.scale / scale_factor, state.scale)
    new_good = jnp.where(overflow, 0, state.good_steps + 1)
    grow = new_good >= scale_window
    new_scale = jnp.where(grow, new_scale * scale_factor, new_scale)
    new_good = jnp.where(grow, 0, new_good)
    return grads, LossScalerState(new_scale, new_good), overflow
