"""Import reference PyTorch checkpoints into the JAX parameter tree.

Maps the reference BERT_Tacotron2 ``state_dict`` layout (reference
model.py:494-515 module names; train.py:116-123 checkpoint dict format)
onto our nested-dict params + batchnorm state.  Weight layout conventions:
torch Linear stores [out, in] → ours is [in, out] (transposed); Conv1d and
LSTM layouts match directly.

Works from a dict of numpy arrays so no torch import is required here; use
``load_torch_checkpoint`` to read a real ``checkpoint_{iter}`` file (needs
torch installed, CPU is fine).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from tacotron2_subword_tpu.config import TacotronConfig


def _lin(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, jnp.ndarray]:
    """LinearNorm: '{prefix}.linear_layer.weight' [out,in] (+ optional bias)."""
    p = {"w": jnp.asarray(np.asarray(sd[f"{prefix}.linear_layer.weight"]).T)}
    b = sd.get(f"{prefix}.linear_layer.bias")
    if b is not None:
        p["b"] = jnp.asarray(b)
    return p


def _plain_lin(sd, prefix) -> Dict[str, jnp.ndarray]:
    """torch.nn.Linear: '{prefix}.weight' (+ optional '.bias')."""
    p = {"w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T)}
    b = sd.get(f"{prefix}.bias")
    if b is not None:
        p["b"] = jnp.asarray(b)
    return p


def _conv(sd, prefix) -> Dict[str, jnp.ndarray]:
    """ConvNorm: '{prefix}.conv.weight' [out,in,k] (+ optional bias)."""
    p = {"w": jnp.asarray(sd[f"{prefix}.conv.weight"])}
    b = sd.get(f"{prefix}.conv.bias")
    if b is not None:
        p["b"] = jnp.asarray(b)
    return p


def _bn(sd, prefix):
    params = {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
              "bias": jnp.asarray(sd[f"{prefix}.bias"])}
    state = {"mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
             "var": jnp.asarray(sd[f"{prefix}.running_var"])}
    return params, state


def _lstm_cell(sd, prefix):
    return {"w_ih": jnp.asarray(sd[f"{prefix}.weight_ih"]),
            "w_hh": jnp.asarray(sd[f"{prefix}.weight_hh"]),
            "b_ih": jnp.asarray(sd[f"{prefix}.bias_ih"]),
            "b_hh": jnp.asarray(sd[f"{prefix}.bias_hh"])}


def _bilstm(sd, prefix):
    out = {}
    for name, suffix in (("fwd", ""), ("bwd", "_reverse")):
        out[name] = {
            "w_ih": jnp.asarray(sd[f"{prefix}.weight_ih_l0{suffix}"]),
            "w_hh": jnp.asarray(sd[f"{prefix}.weight_hh_l0{suffix}"]),
            "b_ih": jnp.asarray(sd[f"{prefix}.bias_ih_l0{suffix}"]),
            "b_hh": jnp.asarray(sd[f"{prefix}.bias_hh_l0{suffix}"]),
        }
    return out


def _encoder(sd, prefix, n_convs):
    convs, bns = [], []
    for i in range(n_convs):
        conv = _conv(sd, f"{prefix}.convolutions.{i}.0")
        bn_p, bn_s = _bn(sd, f"{prefix}.convolutions.{i}.1")
        convs.append({"conv": conv, "bn": bn_p})
        bns.append(bn_s)
    return {"convs": convs, "lstm": _bilstm(sd, f"{prefix}.lstm")}, bns


def _attention(sd, prefix, variant: str):
    p = {"memory": _lin(sd, f"{prefix}.memory_layer")}
    if variant in ("LocationSensitiveAttention", "ForwardAttentionV2"):
        p["query"] = _lin(sd, f"{prefix}.query_layer")
        p["v"] = _lin(sd, f"{prefix}.v")
        p["loc_conv"] = {"w": jnp.asarray(
            sd[f"{prefix}.location_layer.location_conv.conv.weight"])}
        p["loc_dense"] = _lin(sd, f"{prefix}.location_layer.location_dense")
    elif variant == "StepwiseMonotonicAttention":
        p["query"] = _lin(sd, f"{prefix}.query_layer")
        p["v"] = _plain_lin(sd, f"{prefix}.v")
    elif variant == "DynamicConvolutionAttention":
        p["W"] = _plain_lin(sd, f"{prefix}.W")
        p["V"] = _plain_lin(sd, f"{prefix}.V")
        p["F"] = {"w": jnp.asarray(sd[f"{prefix}.F.weight"])}
        p["U"] = _plain_lin(sd, f"{prefix}.U")
        p["T"] = _plain_lin(sd, f"{prefix}.T")
        p["v"] = _plain_lin(sd, f"{prefix}.v")
        p["prior"] = jnp.asarray(sd[f"{prefix}.P"])
    elif variant == "GMMAttention":
        p["mlp1"] = _plain_lin(sd, f"{prefix}.mlp.0")
        p["mlp2"] = _plain_lin(sd, f"{prefix}.mlp.2")
    return p


def params_from_torch_state_dict(sd: Mapping[str, np.ndarray],
                                 cfg: TacotronConfig
                                 ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (params, bn_state) matching models.tacotron2.init_tacotron2."""
    enc, enc_bn = _encoder(sd, "encoder", cfg.encoder_n_convolutions)
    enc_s, enc_s_bn = _encoder(sd, "encoder_sub", cfg.encoder_n_convolutions)

    post, post_bn = [], []
    for i in range(cfg.postnet_n_convolutions):
        conv = _conv(sd, f"postnet.convolutions.{i}.0")
        bn_p, bn_s = _bn(sd, f"postnet.convolutions.{i}.1")
        post.append({"conv": conv, "bn": bn_p})
        post_bn.append(bn_s)

    dec = {
        "prenet": [_lin(sd, "decoder.prenet.layers.0"),
                   _lin(sd, "decoder.prenet.layers.1")],
        "prenet_bert": [_lin(sd, "decoder.prenet_bert.layers.0"),
                        _lin(sd, "decoder.prenet_bert.layers.1")],
        "attention_rnn": _lstm_cell(sd, "decoder.attention_rnn"),
        "attention_rnn_bert": _lstm_cell(sd, "decoder.attention_rnn_bert"),
        "attention": _attention(sd, "decoder.attention_layer", cfg.attention),
        "decoder_rnn": _lstm_cell(sd, "decoder.decoder_rnn"),
        "linear_projection": _lin(sd, "decoder.linear_projection"),
        "gate_layer": _lin(sd, "decoder.gate_layer"),
    }
    # The reference builds attention_layer_bert only for SMA
    # (model.py:158-191); for other variants reuse the phone-stream weights
    # so imported checkpoints still drive both streams.
    if any(k.startswith("decoder.attention_layer_bert.") for k in sd):
        dec["attention_bert"] = _attention(sd, "decoder.attention_layer_bert",
                                           cfg.attention)
    else:
        dec["attention_bert"] = _attention(sd, "decoder.attention_layer",
                                           cfg.attention)

    params = {
        "embedding": jnp.asarray(sd["embedding.weight"]),
        "embedding_sub": jnp.asarray(sd["embedding_sub.weight"]),
        "encoder": enc,
        "encoder_sub": enc_s,
        "linear_converter": _lin(sd, "linear_converter"),
        "linear_converter_sub": _lin(sd, "linear_converter_sub"),
        "decoder": dec,
        "postnet": post,
    }
    bn_state = {"encoder": enc_bn, "encoder_sub": enc_s_bn,
                "postnet": post_bn}
    return params, bn_state


def load_torch_checkpoint(path: str, cfg: TacotronConfig):
    """Load a reference ``checkpoint_{iter}`` file (train.py:116-123 format:
    {iteration, state_dict, optimizer, val_loss, learning_rate}).
    Returns (params, bn_state, meta)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    params, bn_state = params_from_torch_state_dict(sd_np, cfg)
    meta = {k: ckpt[k] for k in ("iteration", "val_loss", "learning_rate")
            if isinstance(ckpt, dict) and k in ckpt}
    return params, bn_state, meta
