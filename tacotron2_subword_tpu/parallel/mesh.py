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
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tacotron2_subword_tpu.config import TacotronConfig
from tacotron2_subword_tpu import train_lib as T


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None, model_across_processes: bool = False) -> Mesh:
    """Mesh with ('data', 'model') axes.  Defaults to all devices on the
    data axis.

    With the default device order the model axis is the INNER (fastest-
    varying) dimension, so under multi-process meshes TP collectives stay
    within a host's local devices (ICI on TPU) and only the data-axis grad
    psum crosses hosts — the layout you want in production.
    ``model_across_processes=True`` transposes the assignment so the model
    axis spans process boundaries instead, which exercises cross-host TP
    collectives (all-gather/reduce-scatter over DCN); used by
    tests/test_multihost.py to prove the TP path survives a process
    boundary."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev = np.asarray(devices[: n_data * n_model])
    if model_across_processes:
        dev = dev.reshape(n_model, n_data).T
    else:
        dev = dev.reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def collective_barrier(mesh: Mesh) -> None:
    """Run one tiny all-device reduction and block on its result.

    Under multi-process meshes the cross-process collective context (gloo
    on CPU, the ICI/DCN channels on TPU) is established lazily at the FIRST
    collective execution, with a rendezvous timeout (~30 s for gloo) far
    shorter than a full-size first compile — so if host A finishes compiling
    the train step long before host B, A's rendezvous times out while B is
    still in XLA.  Running this barrier right after mesh creation, while all
    hosts are in lockstep, establishes the context for the full device
    clique up front; the big compiles can then skew freely."""
    sharding = NamedSharding(mesh, P(("data", "model")))
    n = mesh.devices.size
    if jax.process_count() > 1:
        local = np.zeros(n // jax.process_count(), np.float32)
        x = jax.make_array_from_process_local_data(sharding, local)
    else:
        x = jax.device_put(np.zeros(n, np.float32), sharding)
    val = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    float(val)  # block until the collective ran everywhere


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dimension split over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def shard_train_state(state: T.TrainState, mesh: Mesh) -> T.TrainState:
    """Lay the train state out on the mesh: replicated under pure DP (the
    functional analogue of the reference's rank-0 broadcast,
    distributed.py:138-141), model-axis sharded when model > 1."""
    if mesh.shape["model"] > 1:
        shardings = train_state_shardings(state, mesh)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), state, shardings)
    rep = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)


def tacotron_param_sharding(params: Any, mesh: Mesh):
    """Parameter shardings over the ('data','model') mesh.

    DP keeps parameters replicated; with a model axis > 1 the large
    embedding tables shard by vocabulary row and the widest decoder matmuls
    shard by output column (Megatron-style column parallelism — XLA inserts
    the all-gathers/reduce-scatters).  Everything else stays replicated
    (the attention/projection weights are small).
    """
    rep = NamedSharding(mesh, P())
    shardings = jax.tree_util.tree_map(lambda _: rep, params)
    if mesh.shape["model"] == 1:
        return shardings

    row = NamedSharding(mesh, P("model"))          # shard dim 0

    # vocabulary-sharded embeddings (5500x512 and 313x512 tables)
    shardings["embedding"] = row
    shardings["embedding_sub"] = row
    # column-parallel fused LSTM input/hidden weights [4H, in] → shard 4H
    for name in ("attention_rnn", "attention_rnn_bert", "decoder_rnn"):
        shardings["decoder"][name]["w_ih"] = row
        shardings["decoder"][name]["w_hh"] = row
        shardings["decoder"][name]["b_ih"] = row
        shardings["decoder"][name]["b_hh"] = row
    return shardings


def hifigan_param_sharding(params: Any, mesh: Mesh):
    """HiFi-GAN generator shardings: channel-shard the wide upsampling
    stack over the model axis (the north star's "vocoder convs sharded
    where they exceed one chip").  Transposed-conv weights are [in, out, k]
    (torch layout): shard the out channel (dim 1); biases [out] shard dim 0;
    weight-norm g for convT is per-in-channel [in,1,1] and stays
    replicated."""
    rep = NamedSharding(mesh, P())
    shardings = jax.tree_util.tree_map(lambda _: rep, params)
    if mesh.shape["model"] == 1:
        return shardings
    out_dim0 = NamedSharding(mesh, P("model"))
    out_dim1 = NamedSharding(mesh, P(None, "model"))
    for i, up in enumerate(params["ups"]):
        if "v" in up:
            shardings["ups"][i]["v"] = out_dim1
        if "w" in up:
            shardings["ups"][i]["w"] = out_dim1
        if "b" in up:
            shardings["ups"][i]["b"] = out_dim0
    return shardings


def _path_keys(path) -> tuple:
    """Normalize a jax key path to a tuple of plain keys (dict keys, list
    indices, attribute names)."""
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(k.key)
        elif hasattr(k, "idx"):
            out.append(k.idx)
        elif hasattr(k, "name"):
            out.append(k.name)
        else:
            out.append(str(k))
    return tuple(out)


def train_state_shardings(state: T.TrainState, mesh: Mesh):
    """Shardings for the full TrainState: params via
    tacotron_param_sharding; optimizer moments get the matching param
    sharding by tree PATH (the moment pytrees mirror the param pytree under
    a chain/adam prefix, so a path-suffix match is exact — a shape-keyed
    match would collide for distinct equal-shaped params, e.g. the two
    encoder stacks); everything else replicated."""
    rep = replicate_sharding(mesh)
    pshard = tacotron_param_sharding(state.params, mesh)
    p_paths = jax.tree_util.tree_flatten_with_path(state.params)[0]
    by_path = {_path_keys(path): s
               for (path, _), s in zip(p_paths,
                                       jax.tree_util.tree_leaves(pshard))}

    def match(path, x):
        keys = _path_keys(path)
        # opt-state leaf paths are param paths under a wrapper prefix
        # (e.g. (2, 'mu', 'embedding')); match the longest suffix
        for i in range(len(keys)):
            s = by_path.get(keys[i:])
            if s is not None:
                return s
        return rep

    return T.TrainState(
        step=rep,
        params=pshard,
        bn_state=jax.tree_util.tree_map(lambda _: rep, state.bn_state),
        opt_state=jax.tree_util.tree_map_with_path(match, state.opt_state),
    )


def make_parallel_train_step(cfg: TacotronConfig, tx, mesh: Mesh,
                             state: Optional[T.TrainState] = None):
    """jit-compiled train step: batch sharded over 'data'; parameters
    replicated under pure DP, or model-axis sharded (embeddings + wide
    LSTM weights) when the mesh has a model axis > 1 and ``state`` is
    given.  XLA inserts the gradient psum and any TP collectives."""
    rep = replicate_sharding(mesh)
    data = batch_sharding(mesh)
    st_shard = (train_state_shardings(state, mesh)
                if state is not None and mesh.shape["model"] > 1 else rep)

    def step(state, batch, rng):
        return T.train_step(state, batch, rng, cfg, tx)

    return jax.jit(
        step,
        in_shardings=(st_shard, data, rep),
        out_shardings=(st_shard, rep),
        donate_argnums=(0,),
    )
