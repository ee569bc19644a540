"""Checkpoint save/resume/warm-start/best-tracking tests (CPU)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_subword_tpu import train_lib as T
from tacotron2_subword_tpu.utils import checkpoint as CK
from tests.test_model import SMALL
from tests.test_train import full_batch


@pytest.fixture
def state_and_tx():
    return T.create_train_state(jax.random.PRNGKey(0), SMALL)


def _advance(state, tx, n=2):
    batch = full_batch(SMALL, T_out=6)
    for i in range(n):
        state, _ = T.train_step(state, batch, jax.random.PRNGKey(i), SMALL,
                                tx)
    return state


def test_save_load_roundtrip(tmp_path, state_and_tx):
    state, tx = state_and_tx
    state = _advance(state, tx, 3)
    path = CK.save_checkpoint(state, str(tmp_path), val_loss=1.5,
                              learning_rate=2e-4)
    assert path.endswith("checkpoint_3")

    fresh, _ = T.create_train_state(jax.random.PRNGKey(42), SMALL)
    restored, meta = CK.load_checkpoint(path, fresh)
    assert int(restored.step) == 3
    assert meta["val_loss"] == 1.5 and meta["learning_rate"] == 2e-4
    np.testing.assert_array_equal(np.asarray(restored.params["embedding"]),
                                  np.asarray(state.params["embedding"]))
    # optimizer state restored too (adam moments differ from fresh init)
    flat_r = jax.tree_util.tree_leaves(restored.opt_state)
    flat_s = jax.tree_util.tree_leaves(state.opt_state)
    for a, b in zip(flat_r, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # training continues from the restored state
    state2, metrics = T.train_step(restored, full_batch(SMALL, T_out=6),
                                   jax.random.PRNGKey(9), SMALL, tx)
    assert int(state2.step) == 4
    assert np.isfinite(float(metrics["total"]))


def test_scan_checkpoint_picks_newest(tmp_path, state_and_tx):
    state, tx = state_and_tx
    assert CK.scan_checkpoint(str(tmp_path)) is None
    CK.save_checkpoint(state, str(tmp_path))          # step 0
    state = _advance(state, tx, 2)
    CK.save_checkpoint(state, str(tmp_path))          # step 2
    newest = CK.scan_checkpoint(str(tmp_path))
    assert newest.endswith("checkpoint_2")


def test_warm_start_ignores_layers(tmp_path, state_and_tx):
    state, tx = state_and_tx
    path = CK.save_checkpoint(state, str(tmp_path))

    fresh, _ = T.create_train_state(jax.random.PRNGKey(99), SMALL)
    fresh_emb = np.asarray(fresh.params["embedding"])
    warmed = CK.warm_start(path, fresh, ignore_layers=("embedding",))
    # embedding kept from fresh init, decoder weights from checkpoint
    np.testing.assert_array_equal(np.asarray(warmed.params["embedding"]),
                                  fresh_emb)
    np.testing.assert_array_equal(
        np.asarray(warmed.params["decoder"]["gate_layer"]["w"]),
        np.asarray(state.params["decoder"]["gate_layer"]["w"]))
    assert int(warmed.step) == 0  # warm start does not restore step


def test_best_tracker(tmp_path, state_and_tx):
    state, _ = state_and_tx
    tracker = CK.BestTracker(str(tmp_path))
    assert tracker.update(state, 2.0, 1e-3)
    assert not tracker.update(state, 3.0, 1e-3)
    assert tracker.update(state, 1.0, 1e-3)
    assert os.path.isdir(os.path.join(str(tmp_path), "checkpoint_best"))
    # persisted best survives a new tracker instance
    tracker2 = CK.BestTracker(str(tmp_path))
    assert tracker2.best == 1.0
    assert not tracker2.update(state, 1.5, 1e-3)
