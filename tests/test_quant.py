"""Weight-only int8 decode quantization (ops/quant.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from tacotron2_subword_tpu.ops import quant as Q
from tacotron2_subword_tpu.models import tacotron2 as M
from tests.test_model import SMALL, make_batch


def test_quantize_int8_roundtrip_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 96)) * 3.0
    w_q, scale = Q.quantize_int8(w, axis=0)
    assert w_q.dtype == jnp.int8
    assert scale.shape == (96,)
    err = np.abs(np.asarray(w) - np.asarray(w_q, np.float32) * np.asarray(scale))
    # symmetric rounding: error bounded by scale/2 per column
    assert (err <= np.asarray(scale) / 2 + 1e-6).all()


def test_matmul_dequant_ref_matches_pallas_interpret():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    S, B, K, N = 2, 8, 128, 512
    x = jax.random.normal(k1, (S, B, K), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(k2, (S, K, N), jnp.float32)
    w_q, scale = Q.quantize_int8(w, axis=1)
    ref = Q._ref_matmul(x, w_q, scale)
    out = Q.matmul_dequant_int8(x, w_q, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # and against the unquantized matmul: per-channel int8 keeps ~1% error
    exact = jnp.einsum("sbk,skn->sbn", x.astype(jnp.float32), w)
    rel = (np.abs(np.asarray(out) - np.asarray(exact)).mean()
           / (np.abs(np.asarray(exact)).mean() + 1e-9))
    assert rel < 0.02


def test_int8_decode_close_to_f32():
    """decode_quant="int8" must produce finite mels close to the f32 decode
    (same tolerance style as the bf16 test — the decode recurrence amplifies
    rounding, so compare means)."""
    cfg32 = SMALL
    cfg8 = SMALL.replace(parity_mode=False, compute_dtype="bfloat16",
                         decode_quant="int8")
    params, bn = M.init_tacotron2(jax.random.PRNGKey(0), cfg32)
    batch = make_batch(cfg32, T_out=10)

    o32 = M.infer(params, bn, cfg32, batch["text"], batch["sub"],
                  batch["cls_phone"], batch["cls_sub"],
                  rng=jax.random.PRNGKey(2), max_steps=8, gate_threshold=1.1)
    o8 = M.infer(params, bn, cfg8, batch["text"], batch["sub"],
                 batch["cls_phone"], batch["cls_sub"],
                 rng=jax.random.PRNGKey(2), max_steps=8, gate_threshold=1.1)
    a = np.asarray(o32["mel_postnet"], np.float32)
    b = np.asarray(o8["mel_postnet"], np.float32)
    assert np.isfinite(b).all()
    denom = np.abs(a).mean() + 1e-6
    assert np.abs(a - b).mean() / denom < 0.15
    # alignment rows must still be a distribution
    w = np.asarray(o8["alignments"], np.float32)
    sums = w.sum(-1)
    valid = sums > 0  # padded steps are zeroed
    np.testing.assert_allclose(sums[valid], 1.0, atol=3e-2)  # bf16 SMA sums
