"""Parity tests for primitive layers against torch CPU equivalents.

These validate that reference PyTorch checkpoints can be imported verbatim:
identical weight layouts, gate orders, and numerics (reference layers.py:8-39
for Linear/Conv init, torch LSTMCell for gate math).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_subword_tpu.nn import layers as L

torch = pytest.importorskip("torch")


def test_linear_matches_torch():
    rng = np.random.RandomState(1)
    w = rng.randn(16, 8).astype(np.float32)  # torch layout [out, in]
    b = rng.randn(16).astype(np.float32)
    x = rng.randn(4, 8).astype(np.float32)

    tl = torch.nn.Linear(8, 16)
    with torch.no_grad():
        tl.weight.copy_(torch.from_numpy(w))
        tl.bias.copy_(torch.from_numpy(b))
    ref = tl(torch.from_numpy(x)).detach().numpy()

    p = {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}
    out = np.asarray(L.linear_apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_conv1d_matches_torch():
    rng = np.random.RandomState(2)
    w = rng.randn(32, 16, 5).astype(np.float32)
    b = rng.randn(32).astype(np.float32)
    x = rng.randn(2, 16, 40).astype(np.float32)

    tc = torch.nn.Conv1d(16, 32, 5, padding=2)
    with torch.no_grad():
        tc.weight.copy_(torch.from_numpy(w))
        tc.bias.copy_(torch.from_numpy(b))
    ref = tc(torch.from_numpy(x)).detach().numpy()

    p = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    out = np.asarray(L.conv1d_apply(p, jnp.asarray(x), padding=2))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_lstm_cell_matches_torch():
    rng = np.random.RandomState(3)
    H, D, B = 12, 7, 5
    cell = torch.nn.LSTMCell(D, H)
    p = {
        "w_ih": jnp.asarray(cell.weight_ih.detach().numpy()),
        "w_hh": jnp.asarray(cell.weight_hh.detach().numpy()),
        "b_ih": jnp.asarray(cell.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(cell.bias_hh.detach().numpy()),
    }
    x = rng.randn(B, D).astype(np.float32)
    h0 = rng.randn(B, H).astype(np.float32)
    c0 = rng.randn(B, H).astype(np.float32)
    th, tc_ = cell(torch.from_numpy(x),
                   (torch.from_numpy(h0), torch.from_numpy(c0)))
    h1, c1 = L.lstm_cell(p, jnp.asarray(x), jnp.asarray(h0), jnp.asarray(c0))
    np.testing.assert_allclose(np.asarray(h1), th.detach().numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), tc_.detach().numpy(),
                               rtol=1e-5, atol=1e-5)


def test_bilstm_matches_torch_packed():
    """Variable-length BiLSTM must match torch's pack_padded_sequence path
    (reference model.py:97-114) including zeros beyond each length."""
    rng = np.random.RandomState(4)
    B, T, D, H = 3, 11, 6, 5
    lengths = np.array([11, 7, 4])
    x = rng.randn(B, T, D).astype(np.float32)

    tl = torch.nn.LSTM(D, H, 1, batch_first=True, bidirectional=True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), lengths, batch_first=True, enforce_sorted=False)
    out, _ = tl(packed)
    ref, _ = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True,
                                                    total_length=T)
    ref = ref.detach().numpy()

    p = {
        "fwd": {"w_ih": jnp.asarray(tl.weight_ih_l0.detach().numpy()),
                "w_hh": jnp.asarray(tl.weight_hh_l0.detach().numpy()),
                "b_ih": jnp.asarray(tl.bias_ih_l0.detach().numpy()),
                "b_hh": jnp.asarray(tl.bias_hh_l0.detach().numpy())},
        "bwd": {"w_ih": jnp.asarray(tl.weight_ih_l0_reverse.detach().numpy()),
                "w_hh": jnp.asarray(tl.weight_hh_l0_reverse.detach().numpy()),
                "b_ih": jnp.asarray(tl.bias_ih_l0_reverse.detach().numpy()),
                "b_hh": jnp.asarray(tl.bias_hh_l0_reverse.detach().numpy())},
    }
    out = np.asarray(L.bilstm_apply(p, jnp.asarray(x), jnp.asarray(lengths)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_batchnorm_matches_torch_train_and_eval():
    rng = np.random.RandomState(5)
    C = 9
    x = rng.randn(4, C, 13).astype(np.float32)
    tb = torch.nn.BatchNorm1d(C)
    tb.train()
    ref_train = tb(torch.from_numpy(x)).detach().numpy()
    run_mean = tb.running_mean.detach().numpy()
    run_var = tb.running_var.detach().numpy()
    tb.eval()
    ref_eval = tb(torch.from_numpy(x)).detach().numpy()

    params, state = L.batchnorm_init(C)
    y, new_state = L.batchnorm_apply(params, state, jnp.asarray(x),
                                     training=True)
    np.testing.assert_allclose(np.asarray(y), ref_train, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]), run_mean,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]), run_var,
                               rtol=1e-4, atol=1e-5)
    y2, _ = L.batchnorm_apply(params, new_state, jnp.asarray(x),
                              training=False)
    np.testing.assert_allclose(np.asarray(y2), ref_eval, rtol=1e-4, atol=1e-4)


def test_dropout_scaling_and_determinism():
    x = jnp.ones((1000,))
    y = L.dropout(jax.random.PRNGKey(0), x, 0.5)
    kept = np.asarray(y) > 0
    assert 0.4 < kept.mean() < 0.6
    np.testing.assert_allclose(np.asarray(y)[kept], 2.0)
    y2 = L.dropout(jax.random.PRNGKey(0), x, 0.5)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    np.testing.assert_array_equal(
        np.asarray(L.dropout(jax.random.PRNGKey(0), x, 0.5, enabled=False)),
        np.asarray(x))
