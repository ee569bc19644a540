"""Data-parallel mesh tests on the 8-virtual-device CPU backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_subword_tpu import train_lib as T
from tacotron2_subword_tpu.parallel import mesh as PM
from tests.test_model import SMALL
from tests.test_train import full_batch


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return PM.make_mesh(devices=jax.devices()[:8])


def test_mesh_axes(mesh8):
    assert mesh8.axis_names == ("data", "model")
    assert mesh8.devices.shape == (8, 1)


def test_parallel_step_matches_single_device(mesh8):
    """The DP-sharded step must produce the same loss and parameter update
    as the unsharded step — XLA's psum-from-autodiff semantics."""
    cfg = SMALL
    state, tx = T.create_train_state(jax.random.PRNGKey(0), cfg)
    batch = full_batch(cfg, B=8, T_out=8)
    rng = jax.random.PRNGKey(5)

    # single-device baseline
    ref_state, ref_metrics = T.train_step(state, batch, rng, cfg, tx)

    # 8-way data parallel
    pstate = PM.shard_train_state(state, mesh8)
    pbatch = PM.shard_batch(batch, mesh8)
    prng = jax.device_put(rng, PM.replicate_sharding(mesh8))
    step = PM.make_parallel_train_step(cfg, tx, mesh8)
    new_state, metrics = step(pstate, pbatch, prng)

    np.testing.assert_allclose(float(metrics["total"]),
                               float(ref_metrics["total"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.params["decoder"]["gate_layer"]["w"]),
        np.asarray(ref_state.params["decoder"]["gate_layer"]["w"]),
        rtol=1e-4, atol=1e-6)


def test_dryrun_multichip_entry():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g
    g.dryrun_multichip(8)  # asserts internally
