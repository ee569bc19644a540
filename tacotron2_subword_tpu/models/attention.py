"""Attention zoo for the dual-stream Tacotron 2 decoder.

Re-designs the reference's stateful nn.Module attention classes (reference
attention.py:25-505) as pure functions with *explicit* state pytrees so the
whole decoder compiles into a single ``lax.scan``:

    params = <variant>_init(key, cfg)
    state  = init_state(variant, B, T, cfg)           # per-utterance reset
    ctx, weights, state = attention_step(variant, params, query, memory,
                                         processed_memory, weights_cat,
                                         mask, state, cfg, training, key)

All variants share the reference protocol: a ``memory`` projection applied
once per utterance (memory_layer, reference model.py:258-262) and a per-step
call mapping (query, memory, processed_memory, prev+cum weights, mask,
state) → (context, weights, state).

Variants (reference attention.py):
 - "LocationSensitiveAttention"    (attention.py:25-85)
 - "ForwardAttentionV2"            (attention.py:87-151)
 - "ContentAttention"              (attention.py:153-192)
 - "DynamicConvolutionAttention"   (attention.py:195-289)
 - "StepwiseMonotonicAttention"    (attention.py:291-398, the default)
 - "GMMAttention"                  (attention.py:401-505)

The reference wires only SMA correctly into the dual-stream decoder
(model.py:158-191 builds `attention_layer_bert` only for SMA); here every
variant works for both streams — a deliberate, documented fix.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import betabinom

from tacotron2_subword_tpu.nn import layers as L

SCORE_MASK_VALUE = -1e9  # finite stand-in for -inf: softmax-safe on TPU

VARIANTS = (
    "LocationSensitiveAttention",
    "ForwardAttentionV2",
    "ContentAttention",
    "DynamicConvolutionAttention",
    "StepwiseMonotonicAttention",
    "GMMAttention",
)

# DCA constants (reference attention.py:202-208)
DCA_STATIC_CHANNELS = 8
DCA_STATIC_KERNEL = 21
DCA_DYNAMIC_CHANNELS = 8
DCA_DYNAMIC_KERNEL = 21
DCA_PRIOR_LENGTH = 11
DCA_ALPHA, DCA_BETA = 0.1, 0.9

GMM_K = 5
GMM_EPS = 1e-5
SMA_SIGMOID_NOISE = 2.0


def _torch_linear_init(key, in_dim, out_dim, bias=True):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"w": jax.random.uniform(kw, (in_dim, out_dim), minval=-bound,
                                 maxval=bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), minval=-bound,
                                    maxval=bound)
    return p


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def attention_init(key, variant: str, attention_rnn_dim: int,
                   embedding_dim: int, attention_dim: int,
                   location_n_filters: int, location_kernel_size: int) -> Dict[str, Any]:
    ks = jax.random.split(key, 10)
    p: Dict[str, Any] = {
        "memory": L.linear_init(ks[0], embedding_dim, attention_dim,
                                bias=False, gain="tanh"),
    }
    if variant in ("LocationSensitiveAttention", "ForwardAttentionV2"):
        p["query"] = L.linear_init(ks[1], attention_rnn_dim, attention_dim,
                                   bias=False, gain="tanh")
        p["v"] = L.linear_init(ks[2], attention_dim, 1, bias=False)
        p["loc_conv"] = L.conv1d_init(ks[3], 2, location_n_filters,
                                      location_kernel_size, bias=False)
        p["loc_dense"] = L.linear_init(ks[4], location_n_filters,
                                       attention_dim, bias=False, gain="tanh")
    elif variant == "ContentAttention":
        p["query"] = L.linear_init(ks[1], attention_rnn_dim, attention_dim,
                                   bias=False, gain="tanh")
        p["v"] = L.linear_init(ks[2], attention_dim, 1, bias=False)
    elif variant == "StepwiseMonotonicAttention":
        p["query"] = L.linear_init(ks[1], attention_rnn_dim, attention_dim,
                                   bias=False, gain="tanh")
        p["v"] = _torch_linear_init(ks[2], attention_dim, 1, bias=False)
    elif variant == "DynamicConvolutionAttention":
        p["W"] = _torch_linear_init(ks[1], attention_rnn_dim, attention_dim)
        p["V"] = _torch_linear_init(ks[2], attention_dim,
                                    DCA_DYNAMIC_CHANNELS * DCA_DYNAMIC_KERNEL,
                                    bias=False)
        bound = 1.0 / math.sqrt(DCA_STATIC_KERNEL)
        p["F"] = {"w": jax.random.uniform(
            ks[3], (DCA_STATIC_CHANNELS, 1, DCA_STATIC_KERNEL),
            minval=-bound, maxval=bound)}
        p["U"] = _torch_linear_init(ks[4], DCA_STATIC_CHANNELS, attention_dim,
                                    bias=False)
        p["T"] = _torch_linear_init(ks[5], DCA_DYNAMIC_CHANNELS, attention_dim)
        p["v"] = _torch_linear_init(ks[6], attention_dim, 1, bias=False)
        prior = betabinom.pmf(np.arange(DCA_PRIOR_LENGTH),
                              DCA_PRIOR_LENGTH - 1, DCA_ALPHA, DCA_BETA)
        p["prior"] = jnp.asarray(prior[::-1].copy(), dtype=jnp.float32)
    elif variant == "GMMAttention":
        p["mlp1"] = _torch_linear_init(ks[1], attention_rnn_dim, attention_dim)
        p["mlp2"] = _torch_linear_init(ks[2], attention_dim, 3 * GMM_K)
    else:
        raise ValueError(f"unknown attention variant {variant!r}")
    return p


def process_memory(params, memory):
    """memory_layer: [B, T, embed] → [B, T, attention_dim]."""
    return L.linear_apply(params["memory"], memory)


def init_state(variant: str, batch: int, max_time: int) -> Dict[str, jnp.ndarray]:
    """Per-utterance attention state (reference init_attention +
    Decoder.initialize_decoder_states log_alpha, model.py:237-270)."""
    s: Dict[str, jnp.ndarray] = {}
    if variant == "ForwardAttentionV2":
        la = jnp.full((batch, max_time), -1e4, jnp.float32)
        s["log_alpha"] = la.at[:, 0].set(0.0)
    elif variant == "StepwiseMonotonicAttention":
        a = jnp.zeros((batch, max_time), jnp.float32)
        s["alignment"] = a.at[:, 0].set(1.0)
    elif variant == "DynamicConvolutionAttention":
        a = jnp.zeros((batch, max_time), jnp.float32)
        s["alignment_pre"] = a.at[:, 0].set(1.0)
    elif variant == "GMMAttention":
        s["mu_prev"] = jnp.zeros((batch, GMM_K), jnp.float32)
    return s


# ---------------------------------------------------------------------------
# Per-variant energy/weight computation
# ---------------------------------------------------------------------------

def _location_features(params, weights_cat):
    """Location conv + dense (reference attention.py:7-23).
    weights_cat: [B, 2, T] → [B, T, attention_dim]."""
    conv = L.conv1d_apply(params["loc_conv"], weights_cat)  # [B, F, T]
    return L.linear_apply(params["loc_dense"], jnp.swapaxes(conv, 1, 2))


def _additive_energies(params, query, processed_memory, weights_cat=None):
    """v · tanh(W q + (loc) + processed_memory): [B, T]."""
    pq = L.linear_apply(params["query"], query)[:, None, :]
    e = pq + processed_memory
    if weights_cat is not None:
        e = e + _location_features(params, weights_cat)
    return L.linear_apply(params["v"], jnp.tanh(e))[..., 0]


def _masked(energies, mask):
    if mask is None:
        return energies
    return jnp.where(mask, energies, SCORE_MASK_VALUE)


def _context(weights, memory):
    return jnp.einsum("bt,btd->bd", weights, memory,
                      preferred_element_type=jnp.float32).astype(memory.dtype)


def attention_step(variant: str, params, query, memory, processed_memory,
                   weights_cat, mask, state, *, training: bool = False,
                   noise_key=None, noise=None):
    """One attention step.  mask is [B, T] True=valid (or None).
    Returns (context [B, D], weights [B, T], new_state).

    SMA training noise comes either from ``noise_key`` (drawn here) or a
    precomputed additive ``noise`` [B, T] — the decoder scan precomputes all
    steps' noise in one draw outside the loop because per-step threefry
    splits are measurably expensive scalar work (see models/tacotron2.py).
    """
    if variant == "LocationSensitiveAttention":
        e = _masked(_additive_energies(params, query, processed_memory,
                                       weights_cat), mask)
        w = jax.nn.softmax(e, axis=1)
        return _context(w, memory), w, state

    if variant == "ForwardAttentionV2":
        e = _masked(_additive_energies(params, query, processed_memory,
                                       weights_cat), mask)
        log_alpha = state["log_alpha"]
        shifted = jnp.pad(log_alpha[:, :-1], ((0, 0), (1, 0)),
                          constant_values=SCORE_MASK_VALUE)
        biased = jnp.logaddexp(log_alpha, shifted)
        log_alpha_new = biased + e
        w = jax.nn.softmax(log_alpha_new, axis=1)
        # NOTE: the reference never writes log_alpha back into the decoder
        # (attention.py:151 returns it commented out), so its forward
        # recursion is degenerate.  We propagate it properly — documented fix.
        return _context(w, memory), w, {**state, "log_alpha": log_alpha_new}

    if variant == "ContentAttention":
        e = _masked(_additive_energies(params, query, processed_memory), mask)
        w = jax.nn.softmax(e, axis=1)
        return _context(w, memory), w, state

    if variant == "StepwiseMonotonicAttention":
        e = _additive_energies(params, query, processed_memory)
        e = _masked(e, mask)
        if training and noise is not None:
            e = e + noise.astype(e.dtype)
        elif training and noise_key is not None:
            e = e + (jax.random.normal(noise_key, e.shape, e.dtype)
                     * SMA_SIGMOID_NOISE)
        p_i = jax.nn.sigmoid(e)
        prev = state["alignment"]
        # align_t = prev*p + shift_right(prev * (1-p))   (He et al. 2019 eq 8;
        # reference attention.py:330-338)
        moved = prev[:, :-1] * (1.0 - p_i[:, :-1])
        align = prev * p_i + jnp.pad(moved, ((0, 0), (1, 0)))
        return _context(align, memory), align, {**state, "alignment": align}

    if variant == "DynamicConvolutionAttention":
        return _dca_step(params, query, memory, mask, state)

    if variant == "GMMAttention":
        return _gmm_step(params, query, memory, mask, state)

    raise ValueError(f"unknown attention variant {variant!r}")


def _dca_step(params, query, memory, mask, state):
    """Dynamic convolution attention (reference attention.py:236-289):
    purely location-based energies = v·tanh(U·f + T·g) + log prior."""
    B, T, _ = memory.shape
    prev = state["alignment_pre"]  # [B, T]

    # log beta-binomial prior: causal conv of prev with flipped PMF.
    prior = params["prior"]  # [P] already flipped
    p = jax.lax.conv_general_dilated(
        prev[:, None, :], prior[None, None, :],
        window_strides=(1,), padding=[(DCA_PRIOR_LENGTH - 1, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"))[:, 0, :]
    p = jnp.log(jnp.maximum(p, 1e-6))

    # dynamic per-sample filters from the query
    G = L.linear_apply(params["V"], jnp.tanh(L.linear_apply(params["W"],
                                                            query)))
    filt = G.reshape(B * DCA_DYNAMIC_CHANNELS, 1, DCA_DYNAMIC_KERNEL)
    g = jax.lax.conv_general_dilated(
        prev[None, :, :], filt,
        window_strides=(1,), padding=[((DCA_DYNAMIC_KERNEL - 1) // 2,) * 2],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=B)
    g = g.reshape(B, DCA_DYNAMIC_CHANNELS, T).transpose(0, 2, 1)  # [B, T, C]

    # static filters
    f = L.conv1d_apply(params["F"], prev[:, None, :],
                       padding=(DCA_STATIC_KERNEL - 1) // 2)
    f = jnp.swapaxes(f, 1, 2)  # [B, T, C]

    e = L.linear_apply(params["v"], jnp.tanh(
        L.linear_apply(params["U"], f) + L.linear_apply(params["T"], g)
    ))[..., 0] + p
    e = _masked(e, mask)
    w = jax.nn.softmax(e, axis=1)
    return _context(w, memory), w, {**state, "alignment_pre": w}


def _gmm_step(params, query, memory, mask, state):
    """GMM-v2 attention (reference attention.py:427-472)."""
    T = memory.shape[1]
    h = jnp.tanh(L.linear_apply(params["mlp1"], query))
    interm = L.linear_apply(params["mlp2"], h)  # [B, 3K]
    omega_hat = interm[:, :GMM_K]
    delta_hat = interm[:, GMM_K:2 * GMM_K]
    sigma_hat = interm[:, 2 * GMM_K:]

    sigma = jax.nn.softplus(sigma_hat) + GMM_EPS          # [B, K]
    delta = jax.nn.softplus(delta_hat)
    omega = jax.nn.softmax(omega_hat, axis=-1)
    Z = jnp.sqrt(2 * np.pi * sigma ** 2)

    mu = state["mu_prev"] + delta                          # [B, K]
    j = jnp.arange(T, dtype=jnp.float32)[None, None, :]    # [1, 1, T]
    phi = (omega / Z)[:, :, None] * jnp.exp(
        -((j - mu[:, :, None]) ** 2) / (sigma[:, :, None] ** 2) / 2)
    e = _masked(phi.sum(axis=1), mask)
    w = jax.nn.softmax(e, axis=1)
    return _context(w, memory), w, {**state, "mu_prev": mu}
