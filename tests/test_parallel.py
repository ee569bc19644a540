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


def test_tp_step_matches_dp(mesh8):
    """A data=4 x model=2 sharded step must produce the same loss/updates
    as the replicated single-device step (XLA TP collectives correct)."""
    cfg = SMALL.replace(n_symbols=24, sub_n_symbols=32)  # divisible by TP=2
    state, tx = T.create_train_state(jax.random.PRNGKey(0), cfg)
    batch = full_batch(cfg, B=8, T_out=8)
    rng = jax.random.PRNGKey(5)
    ref_state, ref_metrics = T.train_step(state, batch, rng, cfg, tx)

    mesh = PM.make_mesh(n_model=2, devices=jax.devices()[:8])
    assert mesh.shape == {"data": 4, "model": 2}
    sstate = PM.shard_train_state(state, mesh)
    # embeddings must actually be sharded over the model axis
    emb_shard = sstate.params["embedding"].sharding
    assert "model" in str(emb_shard.spec)
    sbatch = PM.shard_batch(batch, mesh)
    srng = jax.device_put(rng, PM.replicate_sharding(mesh))
    step = PM.make_parallel_train_step(cfg, tx, mesh, state=state)
    new_state, metrics = step(sstate, sbatch, srng)

    np.testing.assert_allclose(float(metrics["total"]),
                               float(ref_metrics["total"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.params["embedding"]),
        np.asarray(ref_state.params["embedding"]), rtol=1e-4, atol=1e-6)


def test_hifigan_model_sharding(mesh8):
    """HiFi-GAN generator with channel-sharded upsample convs must match
    the replicated result (the north star's sharded vocoder convs)."""
    from tacotron2_subword_tpu.models import hifigan as HG
    h = HG.HifiganConfig(
        resblock="1", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2, 3),), num_mels=8)
    params = HG.init_generator(jax.random.PRNGKey(0), h)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 12))
    ref = np.asarray(HG.generator_apply(params, h, mel))

    mesh = PM.make_mesh(n_model=2, devices=jax.devices()[:8])
    shardings = PM.hifigan_param_sharding(params, mesh)
    sparams = jax.tree_util.tree_map(jax.device_put, params, shardings)
    assert "model" in str(sparams["ups"][0]["v"].sharding.spec)
    out = np.asarray(jax.jit(
        lambda p, m: HG.generator_apply(p, h, m))(sparams, mel))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("n,tp", [(16, 4), (32, 4)])
def test_dryrun_wider_meshes_with_parity(n, tp):
    """The mesh logic must not be 8-device-shaped: run the full dryrun at
    16/32 virtual devices with TP=4 and assert loss parity against the
    unsharded single-device step (subprocess: device count is fixed at
    backend init, so the 8-device test process can't host these)."""
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import __graft_entry__ as g\n"
        f"g.dryrun_multichip({n}, n_model={tp}, check_parity=True)\n")
    env = dict(os.environ,
               XLA_FLAGS=f"--xla_force_host_platform_device_count={n}",
               JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert f"dryrun_multichip({n}): ok" in r.stdout
    assert f"data={n // tp} x model={tp}, parity-checked" in r.stdout
