"""Primitive NN layers as pure functions over explicit parameter pytrees.

Design: instead of a module framework, every layer is an ``*_init(key, ...)
-> params`` / ``*_apply(params, x, ...) -> y`` pair operating on plain dicts
of jnp arrays.  This keeps the whole model a pure function of (params, inputs,
rng), which is what pjit/shard_map want, makes sharding annotations trivial,
and allows direct import of PyTorch reference checkpoints for parity testing.

Initialisation matches the reference exactly:
 - Linear/Conv: Xavier-uniform with activation gain (reference layers.py:8-39)
   on weights; torch's default (fan-in uniform) on biases.
 - LSTM: torch default U(-1/sqrt(H), 1/sqrt(H)) on all weights and biases,
   gate order (i, f, g, o) so reference checkpoints load verbatim.
 - Embedding: the model-level custom uniform (reference model.py:503-506) is
   applied by the model, not here.

Compute notes (TPU):
 - conv1d is expressed via lax.conv_general_dilated with NCH layout; XLA maps
   k=5/31 1-D convs onto the MXU as implicit GEMMs.
 - lstm_cell is one fused [in+H] x [4H] matmul per step (MXU) instead of
   torch's two.
 - batchnorm keeps running stats explicitly in a separate "state" pytree
   (the functional analogue of torch BatchNorm1d buffers).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

GAINS = {
    "linear": 1.0,
    "sigmoid": 1.0,
    "tanh": 5.0 / 3.0,
    "relu": math.sqrt(2.0),
}


def xavier_uniform(key, shape, fan_in, fan_out, gain: float = 1.0,
                   dtype=jnp.float32):
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-a, maxval=a, dtype=dtype)


# -- Linear -----------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, bias: bool = True,
                gain: str = "linear"):
    kw, kb = jax.random.split(key)
    p = {"w": xavier_uniform(kw, (in_dim, out_dim), in_dim, out_dim,
                             GAINS[gain])}
    if bias:
        bound = 1.0 / math.sqrt(in_dim)
        p["b"] = jax.random.uniform(kb, (out_dim,), minval=-bound,
                                    maxval=bound)
    return p


def linear_apply(p, x):
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


# -- Conv1d -----------------------------------------------------------------

def conv1d_init(key, in_ch: int, out_ch: int, kernel_size: int,
                bias: bool = True, gain: str = "linear", groups: int = 1):
    kw, kb = jax.random.split(key)
    fan_in = (in_ch // groups) * kernel_size
    fan_out = (out_ch // groups) * kernel_size
    p = {"w": xavier_uniform(kw, (out_ch, in_ch // groups, kernel_size),
                             fan_in, fan_out, GAINS[gain])}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(kb, (out_ch,), minval=-bound, maxval=bound)
    return p


def conv1d_apply(p, x, stride: int = 1, padding: Optional[int] = None,
                 dilation: int = 1, groups: int = 1):
    """x: [B, C_in, T] → [B, C_out, T'] (same NCH layout as the reference).

    For bf16 inputs the conv output dtype is bf16 (the MXU still accumulates
    in f32 internally); requesting an f32 output there breaks the conv
    gradient (lax conv transpose rules require lhs/rhs dtypes to match the
    cotangent dtype)."""
    w = p["w"]
    if padding is None:
        padding = dilation * (w.shape[-1] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y.astype(x.dtype)


# -- ConvTranspose1d --------------------------------------------------------

def conv_transpose1d_init(key, in_ch: int, out_ch: int, kernel_size: int,
                          stride: int, bias: bool = True):
    """torch ConvTranspose1d-compatible params: w [in, out, k], torch default
    init U(-1/sqrt(out_ch*k), ...) uses fan computed from (out_ch, k)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(out_ch * kernel_size)
    p = {"w": jax.random.uniform(kw, (in_ch, out_ch, kernel_size),
                                 minval=-bound, maxval=bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_ch,), minval=-bound, maxval=bound)
    return p


def conv_transpose1d_apply(p, x, stride: int, padding: int = 0):
    """x: [B, C_in, T] → [B, C_out, (T-1)*stride - 2*padding + k].

    Exact torch semantics, expressed as an input-dilated convolution with a
    spatially-flipped, channel-transposed kernel (what XLA lowers a
    transposed conv to anyway).
    """
    w = p["w"]  # [in, out, k] torch layout
    k = w.shape[-1]
    w_conv = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # [out, in, k]
    y = jax.lax.conv_general_dilated(
        x, w_conv,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=x.dtype,  # see conv1d_apply docstring
    )
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y.astype(x.dtype)


# -- Weight norm ------------------------------------------------------------

def weight_norm_init(key, shape, dim: int = 0, init_std: Optional[float] = None):
    """Weight-norm parametrization w = g * v/||v|| with the norm over all
    dims except ``dim`` (torch weight_norm default dim=0).  ``init_std``
    draws v from N(0, std) (HiFi-GAN init_weights, reference
    hifigan_utils.py:22-25); otherwise caller supplies v."""
    v = jax.random.normal(key, shape) * (init_std or 0.01)
    axes = tuple(i for i in range(len(shape)) if i != dim)
    g = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
    return {"v": v, "g": g}


def weight_norm_weight(p, dim: int = 0):
    v, g = p["v"], p["g"]
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
    return g * v / jnp.maximum(norm, 1e-12)


def fuse_weight_norm(p, dim: int = 0):
    """Collapse {v, g} into a direct weight (torch remove_weight_norm)."""
    out = {k: v for k, v in p.items() if k not in ("v", "g")}
    out["w"] = weight_norm_weight(p, dim)
    return out


# -- BatchNorm1d ------------------------------------------------------------

def batchnorm_init(num_features: int):
    params = {"scale": jnp.ones(num_features), "bias": jnp.zeros(num_features)}
    state = {"mean": jnp.zeros(num_features), "var": jnp.ones(num_features)}
    return params, state


def batchnorm_apply(params, state, x, training: bool, momentum: float = 0.1,
                    eps: float = 1e-5, mask: Optional[jnp.ndarray] = None):
    """x: [B, C, T].  Returns (y, new_state).

    In training mode the batch statistics are computed over (B, T); with a
    ``mask`` [B, T] of valid frames the statistics exclude padding (the
    reference's BatchNorm1d naively includes padding — we fix that defect but
    keep unmasked behavior when mask is None for parity testing).
    """
    if training:
        xf = x.astype(jnp.float32)
        if mask is not None:
            m = mask.astype(jnp.float32)[:, None, :]
            n = jnp.maximum(m.sum(), 1.0)
            mean = (xf * m).sum(axis=(0, 2)) / n
            var = (((xf - mean[None, :, None]) ** 2) * m).sum(axis=(0, 2)) / n
            count = n
        else:
            mean = xf.mean(axis=(0, 2))
            var = xf.var(axis=(0, 2))
            count = xf.shape[0] * xf.shape[2]
        # torch tracks running var with Bessel correction.
        unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    y = (x - mean[None, :, None]) * inv[None, :, None] \
        + params["bias"][None, :, None]
    return y.astype(x.dtype), new_state


# -- Dropout ----------------------------------------------------------------

def dropout(key, x, rate: float, enabled: bool = True):
    if not enabled or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# -- Embedding --------------------------------------------------------------

def embedding_init(key, num_embeddings: int, dim: int,
                   scale: Optional[float] = None):
    if scale is None:
        return jax.random.normal(key, (num_embeddings, dim))
    return jax.random.uniform(key, (num_embeddings, dim), minval=-scale,
                              maxval=scale)


# -- LSTM -------------------------------------------------------------------

def lstm_cell_init(key, input_dim: int, hidden_dim: int):
    """torch LSTMCell-compatible params: w_ih [4H, in], w_hh [4H, H],
    b_ih/b_hh [4H], gate order (i, f, g, o); all U(-1/sqrt(H), 1/sqrt(H))."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden_dim)
    u = lambda k, shape: jax.random.uniform(k, shape, minval=-bound,
                                            maxval=bound)
    return {
        "w_ih": u(k1, (4 * hidden_dim, input_dim)),
        "w_hh": u(k2, (4 * hidden_dim, hidden_dim)),
        "b_ih": u(k3, (4 * hidden_dim,)),
        "b_hh": u(k4, (4 * hidden_dim,)),
    }


def lstm_prepare(p):
    """Fuse torch-layout LSTM params into one matmul-ready weight.

    MUST be called OUTSIDE any scan/while loop: the concat+transpose
    materializes a large buffer, and XLA does not hoist it out of loop
    bodies — doing it per decoder step doubles the weight HBM traffic
    (measured as the dominant cost of autoregressive decoding).
    """
    return {"w": jnp.concatenate([p["w_ih"], p["w_hh"]], axis=1).T,
            "b": p["b_ih"] + p["b_hh"]}


def _lstm_nonlin(gates, c, out_dtype):
    """Shared (i, f, g, o) gate nonlinearity; gates f32 [..., 4H]."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c.astype(jnp.float32) + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new.astype(out_dtype), c_new.astype(out_dtype)


def lstm_cell_prepared(pp, x, h, c, tap=None):
    """One LSTM step with prepared params {w: [in+H, 4H], b: [4H]}.

    ``tap`` optionally adds a (normally zero) [.., 4H] term to the gates —
    the gradient-tap used by the decoder's custom scan VJP to read per-step
    gate cotangents without accumulating full weight gradients inside the
    loop (models/tacotron2.py)."""
    gates = jnp.dot(jnp.concatenate([x, h], axis=-1), pp["w"],
                    preferred_element_type=jnp.float32)
    gates = gates + pp["b"]
    if tap is not None:
        gates = gates + tap
    return _lstm_nonlin(gates, c, x.dtype)


def lstm_quantize_stacked(pp):
    """Quantize prepared+stacked LSTM params {w: [S, K, 4H], b: [S, 4H]} to
    weight-only int8 with per-output-channel scales (ops/quant.py).  Call
    OUTSIDE the decode loop (like lstm_prepare)."""
    from tacotron2_subword_tpu.ops import quant as Q
    w_q, scale = Q.quantize_int8(pp["w"], axis=1)
    return {"w_q": w_q, "scale": scale,
            "b": pp["b"].astype(jnp.float32)}


def lstm_cell_quant_stacked(pq, x, h, c):
    """Stacked int8 LSTM step: x/h/c [S, B, .]; pq from
    lstm_quantize_stacked.  The int8 weight stream is the point: half the
    per-step HBM traffic of bf16."""
    from tacotron2_subword_tpu.ops import quant as Q
    xh = jnp.concatenate([x, h], axis=-1)
    gates = Q.matmul_dequant_int8(xh, pq["w_q"], pq["scale"])
    return _lstm_nonlin(gates + pq["b"][:, None, :], c, x.dtype)


def lstm_cell(p, x, h, c):
    """One LSTM step from torch-layout params.  x: [B, in], h/c: [B, H] →
    (h', c').  For loops, call lstm_prepare once outside and use
    lstm_cell_prepared inside."""
    return lstm_cell_prepared(lstm_prepare(p), x, h, c)


def _reverse_padded(x, lengths):
    """Reverse each sequence within its valid length: x [B, T, D]."""
    T = x.shape[1]
    t = jnp.arange(T)[None, :]
    idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def lstm_layer_init(key, input_dim: int, hidden_dim: int):
    return lstm_cell_init(key, input_dim, hidden_dim)


def _unidirectional_scan(p, x):
    """Run an LSTM over [B, T, D] → [B, T, H] via lax.scan (time-major)."""
    B = x.shape[0]
    H = p["w_hh"].shape[1]
    xt = jnp.swapaxes(x, 0, 1)  # [T, B, D]
    pp = lstm_prepare(p)  # outside the scan: see lstm_prepare docstring

    def step(carry, xi):
        h, c = carry
        h, c = lstm_cell_prepared(pp, xi, h, c)
        return (h, c), h

    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, ys = jax.lax.scan(step, init, xt)
    return jnp.swapaxes(ys, 0, 1)


def bilstm_init(key, input_dim: int, hidden_dim: int):
    kf, kb = jax.random.split(key)
    return {"fwd": lstm_cell_init(kf, input_dim, hidden_dim),
            "bwd": lstm_cell_init(kb, input_dim, hidden_dim)}


def bilstm_apply(p, x, lengths=None):
    """Bidirectional LSTM over [B, T, D] → [B, T, 2H].

    Replaces torch's pack_padded_sequence (reference model.py:105-112): the
    backward pass is made length-exact by reversing each row within its valid
    length, and outputs beyond each length are zeroed (pad_packed parity).
    """
    fwd = _unidirectional_scan(p["fwd"], x)
    if lengths is not None:
        xr = _reverse_padded(x, lengths)
        bwd = _unidirectional_scan(p["bwd"], xr)
        bwd = _reverse_padded(bwd, lengths)
    else:
        bwd = _unidirectional_scan(p["bwd"], x[:, ::-1])[:, ::-1]
    out = jnp.concatenate([fwd, bwd], axis=-1)
    if lengths is not None:
        valid = (jnp.arange(x.shape[1])[None, :] < lengths[:, None])
        out = out * valid[:, :, None].astype(out.dtype)
    return out


def cast_floating(tree, dtype):
    """Cast every floating leaf of a param pytree to ``dtype`` (bf16
    inference casting for the vocoders: the conv kernels accumulate in f32
    via preferred_element_type, so bf16 params/activations halve the HBM
    weight stream and double MXU throughput at ~1e-2 output tolerance)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)
