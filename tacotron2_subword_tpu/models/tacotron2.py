"""Dual-stream BERT-Tacotron 2 as pure JAX functions, built for XLA/TPU.

Re-implements the capabilities of the reference BERT_Tacotron2
(reference model.py:494-582): two input streams (phoneme IDs and subword
token IDs), each with its own conv+BiLSTM encoder and its own attention,
both conditioned on a sentence-level BERT [CLS] vector, fused in one shared
autoregressive mel decoder with a postnet residual.

TPU-first design decisions (vs the reference's per-frame Python loop,
model.py:417-424, which launches ~20 small CUDA kernels per mel frame):

 - The teacher-forced decoder is ONE ``lax.scan`` over mel frames.  The
   prenet for all frames and both streams runs *before* the scan as a single
   batched matmul, and the mel/gate projections run *after* the scan on the
   stacked hidden states — so the scan body contains only the 3 LSTM cells
   and the attention math.
 - Inference is a ``lax.while_loop`` with static-shape output buffers
   (max_decoder_steps), per-sample gate-stop tracking, and early exit when
   every sample has fired its gate — JAX-compatible semantics for the
   reference's dynamic stop (model.py:461-488), including the
   gate_threshold / INFER_FLAG behavior.
 - All state (2 attention LSTMs, decoder LSTM, per-stream attention weights
   + cumulative weights + variant-specific state) lives in an explicit
   carry pytree with static shapes.

Parameters are plain nested dicts (see nn/layers.py) initialised exactly as
the reference initialises its torch modules.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tacotron2_subword_tpu.config import TacotronConfig
from tacotron2_subword_tpu.models import attention as A
from tacotron2_subword_tpu.nn import layers as L

GATE_PAD_VALUE = 1e3  # reference model.py:539


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths → [B, max_len] bool, True at valid positions."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def _compute_dtype(cfg: TacotronConfig):
    if cfg.parity_mode or cfg.compute_dtype == "float32":
        return jnp.float32
    return jnp.dtype(cfg.compute_dtype)


def _cast_floats(tree, dtype):
    """Cast float arrays in a pytree to ``dtype``.  Inside jit, XLA hoists
    these loop-invariant casts out of the decoder scan, so the weights are
    materialized once as bf16 and the per-step HBM traffic (the decode
    bottleneck: ~150 MB of LSTM weights per frame at f32) is halved."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _encoder_init(key, cfg: TacotronConfig):
    ks = jax.random.split(key, cfg.encoder_n_convolutions + 1)
    convs = []
    bns = []
    for i in range(cfg.encoder_n_convolutions):
        conv = L.conv1d_init(ks[i], cfg.encoder_embedding_dim,
                             cfg.encoder_embedding_dim,
                             cfg.encoder_kernel_size, gain="relu")
        bn_p, bn_s = L.batchnorm_init(cfg.encoder_embedding_dim)
        convs.append({"conv": conv, "bn": bn_p})
        bns.append(bn_s)
    lstm = L.bilstm_init(ks[-1], cfg.encoder_embedding_dim,
                         cfg.encoder_embedding_dim // 2)
    return {"convs": convs, "lstm": lstm}, bns


def _postnet_init(key, cfg: TacotronConfig):
    n = cfg.postnet_n_convolutions
    ks = jax.random.split(key, n)
    layers, bns = [], []
    for i in range(n):
        in_ch = cfg.n_mel_channels if i == 0 else cfg.postnet_embedding_dim
        out_ch = (cfg.n_mel_channels if i == n - 1
                  else cfg.postnet_embedding_dim)
        gain = "linear" if i == n - 1 else "tanh"
        conv = L.conv1d_init(ks[i], in_ch, out_ch, cfg.postnet_kernel_size,
                             gain=gain)
        bn_p, bn_s = L.batchnorm_init(out_ch)
        layers.append({"conv": conv, "bn": bn_p})
        bns.append(bn_s)
    return layers, bns


def _prenet_init(key, cfg: TacotronConfig):
    k1, k2 = jax.random.split(key)
    return [
        L.linear_init(k1, cfg.n_mel_channels * cfg.n_frames_per_step,
                      cfg.prenet_dim, bias=False),
        L.linear_init(k2, cfg.prenet_dim, cfg.prenet_dim, bias=False),
    ]


def _decoder_init(key, cfg: TacotronConfig):
    ks = jax.random.split(key, 9)
    attn = lambda k: A.attention_init(
        k, cfg.attention, cfg.attention_rnn_dim, cfg.encoder_embedding_dim,
        cfg.attention_dim, cfg.attention_location_n_filters,
        cfg.attention_location_kernel_size)
    return {
        "prenet": _prenet_init(ks[0], cfg),
        "prenet_bert": _prenet_init(ks[1], cfg),
        "attention_rnn": L.lstm_cell_init(
            ks[2], cfg.prenet_dim + cfg.encoder_embedding_dim,
            cfg.attention_rnn_dim),
        "attention_rnn_bert": L.lstm_cell_init(
            ks[3], cfg.prenet_dim + cfg.encoder_embedding_dim,
            cfg.attention_rnn_dim),
        "attention": attn(ks[4]),
        "attention_bert": attn(ks[5]),
        "decoder_rnn": L.lstm_cell_init(
            ks[6], 2 * cfg.attention_rnn_dim + 2 * cfg.encoder_embedding_dim,
            cfg.decoder_rnn_dim),
        "linear_projection": L.linear_init(
            ks[7], cfg.decoder_rnn_dim + 2 * cfg.encoder_embedding_dim,
            cfg.n_mel_channels * cfg.n_frames_per_step),
        "gate_layer": L.linear_init(
            ks[8], cfg.decoder_rnn_dim + 2 * cfg.encoder_embedding_dim, 1,
            gain="sigmoid"),
    }


def init_tacotron2(key, cfg: TacotronConfig):
    """Returns (params, batchnorm_state)."""
    ks = jax.random.split(key, 8)
    # reference model.py:503-506: uniform(-val, val) with val from n_symbols
    # (the SAME val is reused for the subword table — reference quirk kept).
    std = (2.0 / (cfg.n_symbols + cfg.symbols_embedding_dim)) ** 0.5
    val = (3.0 ** 0.5) * std
    enc, enc_bn = _encoder_init(ks[2], cfg)
    enc_sub, enc_sub_bn = _encoder_init(ks[3], cfg)
    post, post_bn = _postnet_init(ks[6], cfg)
    params = {
        "embedding": L.embedding_init(ks[0], cfg.n_symbols,
                                      cfg.symbols_embedding_dim, scale=val),
        "embedding_sub": L.embedding_init(ks[1], cfg.sub_n_symbols,
                                          cfg.symbols_embedding_dim,
                                          scale=val),
        "encoder": enc,
        "encoder_sub": enc_sub,
        "linear_converter": L.linear_init(
            ks[4], cfg.encoder_embedding_dim + cfg.bert_embedding_dim,
            cfg.encoder_embedding_dim),
        "linear_converter_sub": L.linear_init(
            ks[5], cfg.encoder_embedding_dim + cfg.bert_embedding_dim,
            cfg.encoder_embedding_dim),
        "decoder": _decoder_init(ks[7], cfg),
        "postnet": post,
    }
    bn_state = {"encoder": enc_bn, "encoder_sub": enc_sub_bn,
                "postnet": post_bn}
    return params, bn_state


# ---------------------------------------------------------------------------
# Sub-module application
# ---------------------------------------------------------------------------

def encoder_apply(params, bn_state, x, lengths, *, training: bool, rng):
    """x: [B, C, T] embedded inputs → ([B, T, C] outputs, new_bn_state).

    Conv stack (relu + batchnorm + dropout 0.5) then length-exact BiLSTM
    (reference model.py:97-114).
    """
    new_bn = []
    mask = sequence_mask(lengths, x.shape[-1]) if lengths is not None else None
    for i, layer in enumerate(params["convs"]):
        y = L.conv1d_apply(layer["conv"], x)
        y, bn_s = L.batchnorm_apply(layer["bn"], bn_state[i], y,
                                    training=training)
        y = jax.nn.relu(y)
        if training:
            rng, k = jax.random.split(rng)
            y = L.dropout(k, y, 0.5)
        new_bn.append(bn_s)
        x = y
    x = jnp.swapaxes(x, 1, 2)  # [B, T, C]
    out = L.bilstm_apply(params["lstm"], x, lengths)
    return out, new_bn


def prenet_apply(params, x, rng, dropout_on: bool, masks=None):
    """2x (linear → relu → dropout 0.5).  Reference model.py:13-24 applies
    dropout with training=True ALWAYS — replicated via dropout_on.

    ``masks`` optionally supplies precomputed scaled keep-masks (one per
    layer, each broadcastable to the layer output): the decode loop
    generates all its masks from ONE key split per step because per-layer
    threefry splits are pure scalar-unit work that measurably dominates the
    small-batch decode step (xprof: 18 us/step of u32 chains vs 21 us of
    matmul at B=8)."""
    for i, p in enumerate(params):
        x = jax.nn.relu(L.linear_apply(p, x))
        if masks is not None:
            x = x * masks[i]
        elif dropout_on:
            rng, k = jax.random.split(rng)
            x = L.dropout(k, x, 0.5)
    return x


def _prenet_masks(key, n, shape, dtype, rate: float = 0.5):
    """n scaled keep-masks [n, *shape] from a single key."""
    keep = 1.0 - rate
    m = jax.random.bernoulli(key, keep, (n,) + tuple(shape))
    return m.astype(dtype) / jnp.asarray(keep, dtype)


def postnet_apply(params, bn_state, x, *, training: bool, rng):
    """x: [B, n_mels, T] → residual [B, n_mels, T] (reference model.py:27-70):
    5 convs, tanh on all but last, dropout 0.5 (training) on every layer."""
    new_bn = []
    n = len(params)
    for i, layer in enumerate(params):
        y = L.conv1d_apply(layer["conv"], x)
        y, bn_s = L.batchnorm_apply(layer["bn"], bn_state[i], y,
                                    training=training)
        if i < n - 1:
            y = jnp.tanh(y)
        if training:
            rng, k = jax.random.split(rng)
            y = L.dropout(k, y, 0.5)
        new_bn.append(bn_s)
        x = y
    return x, new_bn


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class DecoderCarry(NamedTuple):
    """Decoder scan carry with the two attention streams STACKED on a
    leading axis of size 2 (phone stream = index 0, subword/bert = 1).

    Stacking turns the reference's duplicated per-stream ops (two attention
    LSTMCells, two attention computations — reference model.py:340-359)
    into single batched ops: one [2,B,.]x[2,.,.] batched matmul instead of
    two dispatches.  The subword memory is zero-padded to the phone
    stream's T; masks keep the math identical (padded positions get -1e9
    energies, so their weights are ~0 and the zero memory contributes
    nothing to the context).
    """
    h_att: jnp.ndarray      # [2, B, attention_rnn_dim]
    c_att: jnp.ndarray      # [2, B, attention_rnn_dim]
    h_dec: jnp.ndarray      # [B, decoder_rnn_dim]
    c_dec: jnp.ndarray      # [B, decoder_rnn_dim]
    ctx: jnp.ndarray        # [2, B, encoder_embedding_dim]
    w: jnp.ndarray          # [2, B, T]
    w_cum: jnp.ndarray      # [2, B, T]
    att_state: Dict[str, jnp.ndarray]  # leaves stacked on axis 0


def _stack_stream_params(dp, quant: str = ""):
    """Stack the per-stream decoder params on a leading axis and prepare
    the LSTM weights outside the scan (L.lstm_prepare): returns
    (attention_rnn_s_prepared, attention_s, decoder_rnn_prepared).

    With ``quant="int8"`` the prepared LSTM weights are quantized to
    weight-only int8 (per-output-channel scales) — done here, outside the
    loop, so the loop body streams int8 instead of bf16/f32 weights."""
    rnn_s = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]),
                                   L.lstm_prepare(dp["attention_rnn"]),
                                   L.lstm_prepare(dp["attention_rnn_bert"]))
    att_s = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]),
                                   dp["attention"], dp["attention_bert"])
    dec = L.lstm_prepare(dp["decoder_rnn"])
    if quant == "int8":
        rnn_s = L.lstm_quantize_stacked(rnn_s)
        dec = L.lstm_quantize_stacked(
            jax.tree_util.tree_map(lambda a: a[None], dec))
    return rnn_s, att_s, dec


def _pad_T(x, T, axis=-1, value=0.0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, T - x.shape[axis])
    return jnp.pad(x, pad, constant_values=value) if T > x.shape[axis] else x


def _decoder_carry_init(cfg: TacotronConfig, B: int, T: int,
                        dtype=jnp.float32) -> DecoderCarry:
    z = lambda *s: jnp.zeros(s, dtype)
    state0 = _cast_floats(A.init_state(cfg.attention, B, T), dtype)
    return DecoderCarry(
        h_att=z(2, B, cfg.attention_rnn_dim),
        c_att=z(2, B, cfg.attention_rnn_dim),
        h_dec=z(B, cfg.decoder_rnn_dim), c_dec=z(B, cfg.decoder_rnn_dim),
        ctx=z(2, B, cfg.encoder_embedding_dim),
        w=z(2, B, T), w_cum=z(2, B, T),
        att_state=jax.tree_util.tree_map(
            lambda s: jnp.stack([s, s]), state0),
    )


def _decode_step(rnn_s, att_s, dec_rnn, cfg: TacotronConfig,
                 carry: DecoderCarry,
                 pre_ts, memory_s, proc_mem_s, mask_s, training: bool,
                 extras=None, taps=None):
    """One decoder step (reference Decoder.decode, model.py:322-390) with
    both streams batched.  pre_ts: [2, B, prenet_dim] prenet outputs;
    memory_s/proc_mem_s: [2, B, T, .]; mask_s: [2, B, T] or None.
    Returns (new_carry, hidden_ctx [B, dec+2*embed], w_s [2, B, T],
             xh = (att_in, dec_in) LSTM input activations).

    NO randomness is drawn inside the step: per-step threefry key splits are
    sequential scalar-unit work (xprof: 18 us/step at B=8).  Training
    randomness (LSTM dropout masks, SMA sigmoid noise) arrives precomputed
    in ``extras`` — one draw for all steps, threaded through the scan's xs.

    ``taps``: optional ([2, B, 4H], [B, 4H]) zero-valued additions to the
    two big LSTMs' gates, used by the custom scan VJP (see _tf_scan_bwd).
    """
    # both attention LSTMs as one batched cell; dropout on h AND c
    # (reference model.py:340-346 drops both).
    att_in = jnp.concatenate([pre_ts, carry.ctx], -1)
    if "w_q" in rnn_s:
        h_att, c_att = L.lstm_cell_quant_stacked(rnn_s, att_in,
                                                 carry.h_att, carry.c_att)
    else:
        h_att, c_att = jax.vmap(L.lstm_cell_prepared)(
            rnn_s, att_in, carry.h_att, carry.c_att,
            None if taps is None else taps[0])
    if training and extras is not None:
        h_att = h_att * extras["att_h"]
        c_att = c_att * extras["att_c"]

    w_cat_s = jnp.stack([carry.w, carry.w_cum], axis=2)  # [2, B, 2, T]

    mask_ax = None if mask_s is None else 0
    if training and extras is not None:
        def one_stream(p, q, mem, pm, wc, m, st, nz):
            return A.attention_step(cfg.attention, p, q, mem, pm, wc, m, st,
                                    training=True, noise=nz)
        ctx, w, att_state = jax.vmap(
            one_stream, in_axes=(0, 0, 0, 0, 0, mask_ax, 0, 0))(
                att_s, h_att, memory_s, proc_mem_s, w_cat_s, mask_s,
                carry.att_state, extras["noise"])
    else:
        def one_stream(p, q, mem, pm, wc, m, st):
            return A.attention_step(cfg.attention, p, q, mem, pm, wc, m, st,
                                    training=training)
        ctx, w, att_state = jax.vmap(
            one_stream, in_axes=(0, 0, 0, 0, 0, mask_ax, 0))(
                att_s, h_att, memory_s, proc_mem_s, w_cat_s, mask_s,
                carry.att_state)

    w_cum = carry.w_cum + w

    # reference concat order (model.py:362): h_phone, ctx_phone, h_bert,
    # ctx_bert
    dec_in = jnp.concatenate([h_att[0], ctx[0], h_att[1], ctx[1]], -1)
    if "w_q" in dec_rnn:
        h1, c1 = L.lstm_cell_quant_stacked(
            dec_rnn, dec_in[None], carry.h_dec[None], carry.c_dec[None])
        h_dec, c_dec = h1[0], c1[0]
    else:
        h_dec, c_dec = L.lstm_cell_prepared(
            dec_rnn, dec_in, carry.h_dec, carry.c_dec,
            None if taps is None else taps[1])
    if training and extras is not None:
        h_dec = h_dec * extras["dec_h"]
        c_dec = c_dec * extras["dec_c"]

    hidden_ctx = jnp.concatenate([h_dec, ctx[0], ctx[1]], -1)

    new_carry = DecoderCarry(
        h_att=h_att, c_att=c_att, h_dec=h_dec, c_dec=c_dec, ctx=ctx,
        w=w, w_cum=w_cum, att_state=att_state)
    # full [x, h_prev] LSTM inputs — what dW = xhᵀ dG needs (XLA CSEs the
    # duplicate concat with the one inside the cells)
    xh_att = jnp.concatenate([att_in, carry.h_att], -1)
    xh_dec = jnp.concatenate([dec_in, carry.h_dec], -1)
    return new_carry, hidden_ctx, w, (xh_att, xh_dec)


def _tf_scan_plain(cfg: TacotronConfig, training: bool, rnn_s, att_s,
                   dec_rnn, memory_s, proc_mem_s, mask_s, xs,
                   save_xh: bool = False):
    """The teacher-forced decode loop as one lax.scan.  xs carries the
    per-step inputs: "pre" prenet outputs, training masks/noise, and
    (backward only) the gradient taps."""
    B, T = memory_s.shape[1], memory_s.shape[2]
    carry0 = _decoder_carry_init(cfg, B, T, memory_s.dtype)

    def step(carry, x_t):
        extras = {k: v for k, v in x_t.items()
                  if k not in ("pre", "tap_att", "tap_dec")} or None
        taps = ((x_t["tap_att"], x_t["tap_dec"])
                if "tap_att" in x_t else None)
        carry, hc, w_s, xh = _decode_step(
            rnn_s, att_s, dec_rnn, cfg, carry, x_t["pre"], memory_s,
            proc_mem_s, mask_s, training, extras, taps)
        return carry, ((hc, w_s, xh) if save_xh else (hc, w_s))

    _, ys = jax.lax.scan(step, carry0, xs,
                         unroll=cfg.decoder_scan_unroll)
    return ys


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tf_scan_custom(cfg: TacotronConfig, big, att_s, memory_s, proc_mem_s,
                    mask_s, xs):
    """Teacher-forced decode scan with a HAND-ROUTED weight gradient.

    Why: jax.grad of a scan accumulates the gradient of every captured
    weight INSIDE the backward loop — for the two big LSTM weights that is
    a [2,1792,4096] + [4096,4096] read-modify-write per mel frame, which
    xprof shows dominating the whole training step (15.7 of 19.9 ms of
    backward at B=8/T=128).  Here the backward instead:

      1. stop-gradients the big weights and adds zero-valued "taps" to the
         gates as scan inputs, so autodiff of the replayed scan yields the
         per-step gate cotangents dG_t as the taps' cotangent — with NO
         weight-sized accumulator in the loop;
      2. computes dW = Σ_t xh_tᵀ dG_t as ONE dense matmul over the stacked
         activations afterwards (f32 MXU accumulation — also *more*
         precise than the bf16 in-loop accumulator autodiff would use).

    The forward is replayed inside the backward (all randomness lives in
    xs, so the replay is bit-identical); that costs one extra forward scan
    but removes ~60 MB/step of accumulator traffic.
    """
    return _tf_scan_plain(cfg, True, big["rnn"], att_s, big["dec"],
                          memory_s, proc_mem_s, mask_s, xs)


def _tf_scan_custom_fwd(cfg, big, att_s, memory_s, proc_mem_s, mask_s, xs):
    out = _tf_scan_plain(cfg, True, big["rnn"], att_s, big["dec"],
                         memory_s, proc_mem_s, mask_s, xs)
    return out, (big, att_s, memory_s, proc_mem_s, mask_s, xs)


def _tf_scan_custom_bwd(cfg, res, g):
    big, att_s, memory_s, proc_mem_s, mask_s, xs = res
    T_out, _, B = xs["pre"].shape[:3]
    H4_att = big["rnn"]["w"].shape[-1]
    H4_dec = big["dec"]["w"].shape[-1]
    xs_tapped = dict(xs)
    xs_tapped["tap_att"] = jnp.zeros((T_out, 2, B, H4_att), jnp.float32)
    xs_tapped["tap_dec"] = jnp.zeros((T_out, B, H4_dec), jnp.float32)
    stop_big = jax.tree_util.tree_map(jax.lax.stop_gradient, big)

    def f(att_s_, mem_, pm_, xs_):
        return _tf_scan_plain(cfg, True, stop_big["rnn"], att_s_,
                              stop_big["dec"], mem_, pm_, mask_s, xs_,
                              save_xh=True)

    primals, vjp = jax.vjp(f, att_s, memory_s, proc_mem_s, xs_tapped)
    _, _, (xh_att, xh_dec) = primals
    zero_xh = (jnp.zeros_like(xh_att), jnp.zeros_like(xh_dec))
    datt, dmem, dpm, dxs = vjp((g[0], g[1], zero_xh))
    dg_att = dxs.pop("tap_att")   # [T, 2, B, 4H] = per-step gate cotangents
    dg_dec = dxs.pop("tap_dec")   # [T, B, 4H]

    # deferred weight grads: one dense matmul each, f32 accumulation
    cast = lambda d, like: d.astype(like.dtype)
    dW_att = jnp.einsum("tsbk,tsbn->skn", xh_att,
                        dg_att.astype(xh_att.dtype),
                        preferred_element_type=jnp.float32)
    dW_dec = jnp.einsum("tbk,tbn->kn", xh_dec,
                        dg_dec.astype(xh_dec.dtype),
                        preferred_element_type=jnp.float32)
    dbig = {"rnn": {"w": cast(dW_att, big["rnn"]["w"]),
                    "b": cast(dg_att.sum((0, 2)), big["rnn"]["b"])},
            "dec": {"w": cast(dW_dec, big["dec"]["w"]),
                    "b": cast(dg_dec.sum((0, 1)), big["dec"]["b"])}}
    dmask = np.zeros(mask_s.shape, dtype=jax.dtypes.float0)  # bool primal
    return dbig, datt, dmem, dpm, dmask, dxs


_tf_scan_custom.defvjp(_tf_scan_custom_fwd, _tf_scan_custom_bwd)


def decoder_teacher_forced(dp, cfg: TacotronConfig, memory, memory_b, mels,
                           text_lengths, sub_lengths, *, training: bool, rng):
    """Teacher-forced decoding (reference Decoder.forward, model.py:392-428)
    as one lax.scan.

    memory: [B, T_text, D]; memory_b: [B, T_sub, D]; mels: [B, n_mels, T_out].
    Returns (mel_outputs [B, n_mels, T_out], gate [B, T_out],
             alignments [B, T_steps, T_text], alignments_b [B, T_steps, T_sub])
    where T_steps = T_out / n_frames_per_step.

    n_frames_per_step r > 1 follows the reference's decoder semantics
    (model.py:272-320): each scan step consumes/produces a group of r frames
    flattened (r, n_mels)-row-major, the prenet/projection are sized r*n_mels,
    and alignments are per decoder step.  Divergence: the per-step gate
    energy is REPEATED r times to [B, T_out] so downstream masking and the
    BCE loss keep frame granularity — the reference as committed shape-errors
    at r > 1 (model.py:531-541 masks a [B, T_out/r] gate with a [B, T_out]
    mask; loss_function.py compares it to a [B, T_out] target).
    """
    B, _, T_out = mels.shape
    r = cfg.n_frames_per_step
    if T_out % r != 0:
        raise ValueError(
            f"mel length {T_out} is not divisible by n_frames_per_step={r}; "
            f"pad the batch mel length to a multiple of {r} "
            f"(BucketedLoader(frames_per_step=...) does this)")
    T_steps = T_out // r
    dtype = _compute_dtype(cfg)
    dp = _cast_floats(dp, dtype)
    memory = memory.astype(dtype)
    memory_b = memory_b.astype(dtype)
    mels = mels.astype(dtype)
    rng, k_pre, k_pre_b, k_scan = jax.random.split(rng, 4)

    # Teacher inputs: go frame + all-but-last target frame GROUPS (r frames
    # flattened per step), then the prenet over the whole sequence in one
    # batched matmul (hoisted out of the scan).
    frames = jnp.swapaxes(mels, 1, 2)  # [B, T, n_mels]
    groups = frames.reshape(B, T_steps, r * cfg.n_mel_channels)
    teacher = jnp.concatenate(
        [jnp.zeros((B, 1, r * cfg.n_mel_channels), mels.dtype),
         groups[:, :-1]], axis=1)  # [B, T_steps, r*n_mels]
    dropout_on = cfg.prenet_dropout_always_on or training
    pre = prenet_apply(dp["prenet"], teacher, k_pre, dropout_on)
    pre_b = prenet_apply(dp["prenet_bert"], teacher, k_pre_b, dropout_on)

    # stack both streams; subword memory zero-padded to the phone T
    T_text, T_sub = memory.shape[1], memory_b.shape[1]
    T = max(T_text, T_sub)
    rnn_s, att_s, dec_rnn = _stack_stream_params(dp)
    memory_s = jnp.stack([_pad_T(memory, T, axis=1),
                          _pad_T(memory_b, T, axis=1)])
    proc_mem_s = jnp.stack([
        _pad_T(A.process_memory(dp["attention"], memory), T, axis=1),
        _pad_T(A.process_memory(dp["attention_bert"], memory_b), T,
               axis=1)])
    mask_s = jnp.stack([sequence_mask(text_lengths, T),
                        sequence_mask(sub_lengths, T)])

    # [T_steps, 2, B, prenet_dim]
    xs = {"pre": jnp.stack([jnp.swapaxes(pre, 0, 1),
                            jnp.swapaxes(pre_b, 0, 1)], axis=1)}
    if training:
        # ALL per-step randomness drawn here, once, outside the scan
        # (scaled keep-masks for the LSTM dropouts + SMA sigmoid noise);
        # see the _decode_step docstring for why.
        ka, kb, kc, kd, kn = jax.random.split(k_scan, 5)
        def keep_masks(k, shape, rate):
            kp = 1.0 - rate
            return (jax.random.bernoulli(k, kp, shape).astype(dtype)
                    / jnp.asarray(kp, dtype))
        A_dim, D_dim = cfg.attention_rnn_dim, cfg.decoder_rnn_dim
        xs["att_h"] = keep_masks(ka, (T_steps, 2, B, A_dim),
                                 cfg.p_attention_dropout)
        xs["att_c"] = keep_masks(kb, (T_steps, 2, B, A_dim),
                                 cfg.p_attention_dropout)
        xs["dec_h"] = keep_masks(kc, (T_steps, B, D_dim),
                                 cfg.p_decoder_dropout)
        xs["dec_c"] = keep_masks(kd, (T_steps, B, D_dim),
                                 cfg.p_decoder_dropout)
        # only SMA consumes the noise; skip the draw for other variants
        if cfg.attention == "StepwiseMonotonicAttention":
            xs["noise"] = (jax.random.normal(kn, (T_steps, 2, B, T), dtype)
                           * A.SMA_SIGMOID_NOISE)
        else:
            xs["noise"] = jnp.zeros((T_steps, 2, B, T), dtype)

    if training and cfg.custom_decoder_vjp and "w_q" not in rnn_s:
        # custom VJP: defers the big LSTM weight gradients out of the scan
        # backward (see _tf_scan_custom) — the dominant train-step cost.
        hidden_ctx, ws_s = _tf_scan_custom(
            cfg, {"rnn": rnn_s, "dec": dec_rnn}, att_s, memory_s,
            proc_mem_s, mask_s, xs)
    else:
        hidden_ctx, ws_s = _tf_scan_plain(
            cfg, training, rnn_s, att_s, dec_rnn, memory_s, proc_mem_s,
            mask_s, xs)
    ws = ws_s[:, 0, :, :T_text]
    ws_b = ws_s[:, 1, :, :T_sub]

    # Mel/gate projections hoisted out of the scan: one big matmul each.
    mel_out = L.linear_apply(dp["linear_projection"],
                             hidden_ctx)  # [T_steps, B, r*M]
    gate_out = L.linear_apply(dp["gate_layer"], hidden_ctx)[..., 0]  # [T, B]

    # outputs back to f32 regardless of the internal compute dtype;
    # ungroup the r frames per step (reference parse_decoder_outputs view,
    # model.py:316-318: [B, T_steps, r*M] -> [B, T_out, M])
    mel_frames = jnp.transpose(mel_out, (1, 0, 2)).reshape(
        B, T_out, cfg.n_mel_channels)
    mel_outputs = jnp.swapaxes(mel_frames, 1, 2).astype(jnp.float32)
    gate_outputs = jnp.swapaxes(gate_out, 0, 1).astype(jnp.float32)
    if r > 1:
        # per-step gate energy repeated to frame granularity (see docstring)
        gate_outputs = jnp.repeat(gate_outputs, r, axis=1)
    alignments = jnp.swapaxes(ws, 0, 1).astype(jnp.float32)
    alignments_b = jnp.swapaxes(ws_b, 0, 1).astype(jnp.float32)
    return mel_outputs, gate_outputs, alignments, alignments_b


def decoder_infer(dp, cfg: TacotronConfig, memory, memory_b, *, rng,
                  max_steps: Optional[int] = None,
                  gate_threshold: Optional[float] = None,
                  text_lengths=None, sub_lengths=None):
    """Free-running decoding (reference Decoder.inference, model.py:430-492)
    as a lax.while_loop with static buffers and per-sample gate stop.

    Returns dict with mel [B, n_mels, S*r], gate [B, S] (per decoder step),
    alignments, mel lengths [B] (in FRAMES), and infer_ok [B] (False where
    max steps was hit — the reference's INFER_FLAG).  Each of the S decoder
    steps emits r = n_frames_per_step frames (reference model.py:272-320).
    """
    S = int(max_steps or cfg.max_decoder_steps)
    # may be a python float OR a traced scalar: keeping it dynamic lets a
    # jitted caller sweep thresholds without recompiling the decode loop
    thresh = (cfg.gate_threshold if gate_threshold is None
              else gate_threshold)
    B = memory.shape[0]
    M = cfg.n_mel_channels
    r = cfg.n_frames_per_step

    dtype = _compute_dtype(cfg)
    dp = _cast_floats(dp, dtype)
    memory = memory.astype(dtype)
    memory_b = memory_b.astype(dtype)

    T_text, T_sub = memory.shape[1], memory_b.shape[1]
    T = max(T_text, T_sub)
    rnn_s, att_s, dec_rnn = _stack_stream_params(dp, cfg.decode_quant)
    memory_s = jnp.stack([_pad_T(memory, T, axis=1),
                          _pad_T(memory_b, T, axis=1)])
    proc_mem_s = jnp.stack([
        _pad_T(A.process_memory(dp["attention"], memory), T, axis=1),
        _pad_T(A.process_memory(dp["attention_bert"], memory_b), T,
               axis=1)])
    if text_lengths is None:
        # reference inference runs unmasked (model.py:446); padded slots of
        # the stacked memories still need masking out
        mask_s = jnp.stack([
            sequence_mask(jnp.full((B,), T_text, jnp.int32), T),
            sequence_mask(jnp.full((B,), T_sub, jnp.int32), T)])
    else:
        mask_s = jnp.stack([sequence_mask(text_lengths, T),
                            sequence_mask(sub_lengths, T)])

    carry0 = _decoder_carry_init(cfg, B, T, memory.dtype)

    bufs0 = {
        "mel": jnp.zeros((S, B, M * r), memory.dtype),
        "gate": jnp.full((S, B), GATE_PAD_VALUE, memory.dtype),
        "align": jnp.zeros((S, 2, B, T), memory.dtype),
    }
    state0 = dict(step=jnp.array(0), finished=jnp.zeros(B, bool),
                  lengths=jnp.zeros(B, jnp.int32),
                  prev=jnp.zeros((B, M * r), memory.dtype),
                  carry=carry0, bufs=bufs0, rng=rng)

    def cond(s):
        return (s["step"] < S) & ~jnp.all(s["finished"])

    def body(s):
        if cfg.prenet_dropout_always_on:
            # ONE split + ONE bits-gen per step for all 4 prenet masks
            # (2 streams x 2 layers) — see prenet_apply docstring.
            rng, k_masks = jax.random.split(s["rng"])
            m = _prenet_masks(k_masks, 4, (B, cfg.prenet_dim), dtype)
            masks, masks_b = (m[0], m[1]), (m[2], m[3])
        else:
            rng, masks, masks_b = s["rng"], None, None
        pre_t = prenet_apply(dp["prenet"], s["prev"], None,
                             cfg.prenet_dropout_always_on, masks)
        pre_b_t = prenet_apply(dp["prenet_bert"], s["prev"], None,
                               cfg.prenet_dropout_always_on, masks_b)
        pre_ts = jnp.stack([pre_t, pre_b_t])
        carry, hidden_ctx, w_s, _ = _decode_step(
            rnn_s, att_s, dec_rnn, cfg, s["carry"], pre_ts, memory_s,
            proc_mem_s, mask_s, training=False)
        mel_t = L.linear_apply(dp["linear_projection"], hidden_ctx)
        gate_t = L.linear_apply(dp["gate_layer"], hidden_ctx)[..., 0]

        t = s["step"]
        bufs = {
            "mel": s["bufs"]["mel"].at[t].set(mel_t),
            "gate": s["bufs"]["gate"].at[t].set(gate_t),
            "align": s["bufs"]["align"].at[t].set(w_s),
        }
        fired = jax.nn.sigmoid(gate_t) > thresh
        newly_done = fired & ~s["finished"]
        # stop frame is included (reference model.py:452-461)
        lengths = jnp.where(newly_done, t + 1, s["lengths"])
        finished = s["finished"] | fired
        return dict(step=t + 1, finished=finished, lengths=lengths,
                    prev=mel_t, carry=carry, bufs=bufs, rng=rng)

    out = jax.lax.while_loop(cond, body, state0)
    # samples that never fired ran to max steps (INFER_FLAG=False)
    step_lengths = jnp.where(out["finished"], out["lengths"], out["step"])
    infer_ok = out["finished"]

    valid = sequence_mask(step_lengths, S)             # [B, S] per step
    frame_valid = jnp.repeat(valid, r, axis=1)         # [B, S*r] per frame
    # ungroup the r frames per step: [S, B, r*M] -> [B, M, S*r]
    mel_frames = jnp.transpose(out["bufs"]["mel"], (1, 0, 2)).reshape(
        B, S * r, M)
    mel = (jnp.swapaxes(mel_frames, 1, 2)
           * frame_valid[:, None, :]).astype(jnp.float32)
    gate = jnp.swapaxes(out["bufs"]["gate"], 0, 1).astype(jnp.float32)
    gate = jnp.where(valid, gate, GATE_PAD_VALUE)
    align = out["bufs"]["align"]  # [S, 2, B, T]
    return {
        "mel": mel,
        "gate": gate,
        "alignments": (jnp.transpose(align[:, 0, :, :T_text], (1, 0, 2))
                       * valid[:, :, None]).astype(jnp.float32),
        "alignments_bert": (jnp.transpose(align[:, 1, :, :T_sub], (1, 0, 2))
                            * valid[:, :, None]).astype(jnp.float32),
        "mel_lengths": step_lengths * r,
        "infer_ok": infer_ok,
    }


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def _encode_stream(params, bn_state, emb_table, conv_key, ids, lengths, cls,
                   converter, *, training, rng, dtype=jnp.float32):
    """embedding → encoder → concat CLS → linear converter → memory.

    ``dtype`` is the mixed-precision compute dtype: params and activations
    are cast once at entry (gradients flow back to the f32 master params
    through the casts; batchnorm statistics stay f32 inside
    L.batchnorm_apply)."""
    emb_table = emb_table.astype(dtype)
    params = _cast_floats(params, dtype)
    converter = _cast_floats(converter, dtype)
    emb = emb_table[ids]                     # [B, T, 512]
    emb = jnp.swapaxes(emb, 1, 2)            # [B, 512, T]
    enc, new_bn = encoder_apply(params, bn_state, emb, lengths,
                                training=training, rng=rng)
    if cls.ndim == 2:
        cls = jnp.broadcast_to(cls[:, None, :],
                               (cls.shape[0], enc.shape[1], cls.shape[1]))
    fused = jnp.concatenate([enc, cls.astype(enc.dtype)], axis=-1)
    return L.linear_apply(converter, fused), new_bn


def parse_output(mel, mel_postnet, gate, output_lengths, n_mel_channels,
                 mask_padding=True):
    """Zero padded mel frames and fill padded gate energies with 1e3
    (reference model.py:531-541)."""
    if not mask_padding or output_lengths is None:
        return mel, mel_postnet, gate
    valid = sequence_mask(output_lengths, mel.shape[-1])
    mel = mel * valid[:, None, :]
    mel_postnet = mel_postnet * valid[:, None, :]
    gate = jnp.where(valid, gate, GATE_PAD_VALUE)
    return mel, mel_postnet, gate


def forward(params, bn_state, cfg: TacotronConfig, batch, *, training: bool,
            rng):
    """Teacher-forced forward pass (reference BERT_Tacotron2.forward,
    model.py:543-560).

    batch dict keys: text [B,T_text] int, text_lengths [B], sub [B,T_sub]
    int, sub_lengths [B], mels [B,n_mels,T_out], output_lengths [B],
    cls_phone [B,768] or [B,T_text,768], cls_sub [B,768] or [B,T_sub,768].

    Returns (outputs dict, new_bn_state).
    """
    rng, k_enc, k_enc_b, k_dec, k_post = jax.random.split(rng, 5)
    dtype = _compute_dtype(cfg)

    memory, bn_enc = _encode_stream(
        params["encoder"], bn_state["encoder"], params["embedding"], None,
        batch["text"], batch["text_lengths"], batch["cls_phone"],
        params["linear_converter"], training=training, rng=k_enc,
        dtype=dtype)
    memory_b, bn_enc_b = _encode_stream(
        params["encoder_sub"], bn_state["encoder_sub"],
        params["embedding_sub"], None, batch["sub"], batch["sub_lengths"],
        batch["cls_sub"], params["linear_converter_sub"], training=training,
        rng=k_enc_b, dtype=dtype)

    mel, gate, align, align_b = decoder_teacher_forced(
        params["decoder"], cfg, memory, memory_b, batch["mels"],
        batch["text_lengths"], batch["sub_lengths"], training=training,
        rng=k_dec)

    residual, bn_post = postnet_apply(
        _cast_floats(params["postnet"], dtype), bn_state["postnet"],
        mel.astype(dtype), training=training, rng=k_post)
    mel_postnet = mel + residual.astype(jnp.float32)

    mel, mel_postnet, gate = parse_output(
        mel, mel_postnet, gate, batch.get("output_lengths"),
        cfg.n_mel_channels, cfg.mask_padding)

    outputs = {"mel": mel, "mel_postnet": mel_postnet, "gate": gate,
               "alignments": align, "alignments_bert": align_b}
    new_bn = {"encoder": bn_enc, "encoder_sub": bn_enc_b, "postnet": bn_post}
    return outputs, new_bn


def infer(params, bn_state, cfg: TacotronConfig, text, sub, cls_phone,
          cls_sub, *, rng, max_steps: Optional[int] = None,
          gate_threshold: Optional[float] = None,
          text_lengths=None, sub_lengths=None):
    """Free-running inference (reference BERT_Tacotron2.inference,
    model.py:562-582).  Accepts an optional batch with lengths for padded
    batch inference (reference only supports B=1, unmasked)."""
    rng, k_enc, k_enc_b, k_dec, k_post = jax.random.split(rng, 5)
    dtype = _compute_dtype(cfg)

    memory, _ = _encode_stream(
        params["encoder"], bn_state["encoder"], params["embedding"], None,
        text, text_lengths, cls_phone, params["linear_converter"],
        training=False, rng=k_enc, dtype=dtype)
    memory_b, _ = _encode_stream(
        params["encoder_sub"], bn_state["encoder_sub"],
        params["embedding_sub"], None, sub, sub_lengths, cls_sub,
        params["linear_converter_sub"], training=False, rng=k_enc_b,
        dtype=dtype)

    out = decoder_infer(params["decoder"], cfg, memory, memory_b, rng=k_dec,
                        max_steps=max_steps, gate_threshold=gate_threshold,
                        text_lengths=text_lengths, sub_lengths=sub_lengths)

    residual, _ = postnet_apply(
        _cast_floats(params["postnet"], dtype), bn_state["postnet"],
        out["mel"].astype(dtype), training=False, rng=k_post)
    out["mel_postnet"] = out["mel"] + residual.astype(jnp.float32)
    valid = sequence_mask(out["mel_lengths"], out["mel"].shape[-1])
    out["mel_postnet"] = out["mel_postnet"] * valid[:, None, :]
    return out
