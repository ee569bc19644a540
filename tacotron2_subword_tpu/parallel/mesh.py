"""Device-mesh data parallelism for training.

The reference's entire parallelism story is data parallelism with NCCL:
rank-0 parameter broadcast + post-backward flat-bucket gradient all_reduce
(reference distributed.py:132-179) driven by a subprocess launcher
(distributed.py:181-200).  The TPU-native equivalent needs none of that
machinery: we lay out a ``jax.sharding.Mesh`` with a ``data`` axis spanning
ICI (and DCN across hosts), shard the batch over it, keep parameters
replicated, and jit the train step with those shardings — XLA then emits the
gradient all-reduce (psum over the data axis) from sharded-batch autodiff,
with its own bucketing/latency hiding, and parameter "broadcast" is just the
replicated layout.

A second ``model`` axis is reserved for tensor-sharding the vocoder
upsampling convolutions and large embeddings (BASELINE north star); size 1
under pure DP.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tacotron2_subword_tpu.config import TacotronConfig
from tacotron2_subword_tpu import train_lib as T


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Mesh with ('data', 'model') axes.  Defaults to all devices on the
    data axis."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dimension split over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def shard_train_state(state: T.TrainState, mesh: Mesh) -> T.TrainState:
    """Replicate parameters/optimizer state across the mesh (the functional
    analogue of the reference's rank-0 broadcast, distributed.py:138-141)."""
    rep = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)


def make_parallel_train_step(cfg: TacotronConfig, tx, mesh: Mesh):
    """jit-compiled data-parallel train step: batch sharded over 'data',
    state replicated; XLA inserts the gradient psum."""
    rep = replicate_sharding(mesh)
    data = batch_sharding(mesh)

    def step(state, batch, rng):
        return T.train_step(state, batch, rng, cfg, tx)

    return jax.jit(
        step,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
