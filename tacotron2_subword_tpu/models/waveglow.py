"""WaveGlow flow vocoder in JAX (forward, inverse/infer, loss).

Re-implements the reference WaveGlow (reference glow.py:43-311): mel
upsampling via ConvTranspose1d(80→80, k1024, s256), audio grouped into
n_group=8 channels, 12 flows of [Invertible1x1Conv → WN affine coupling]
with early outputs of 2 channels every 4 flows, and the flow loss
z²/2σ² − Σlog s − Σlog det W (glow.py:43-59).

The reference's ``fused_add_tanh_sigmoid_multiply`` @torch.jit.script kernel
(glow.py:33-40) needs no counterpart here: XLA fuses the add/tanh/sigmoid/
multiply chain into the surrounding convs automatically.

The flow loop is a Python loop over 12 flows — each flow has distinct
shapes (early outputs shrink the channel count), so a scan is impossible
and full unrolling is exactly what XLA wants here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tacotron2_subword_tpu.nn import layers as L


@dataclasses.dataclass(frozen=True)
class WaveGlowConfig:
    n_mel_channels: int = 80
    n_flows: int = 12
    n_group: int = 8
    n_early_every: int = 4
    n_early_size: int = 2
    # WN config (reference waveglow/config.json)
    wn_layers: int = 8
    wn_channels: int = 256
    wn_kernel_size: int = 3
    upsample_kernel: int = 1024
    upsample_stride: int = 256


def _wn_conv_init(key, in_ch, out_ch, k, std=None):
    """Weight-normed conv1d, torch default-init v."""
    bound = 1.0 / np.sqrt(in_ch * k)
    v = jax.random.uniform(key, (out_ch, in_ch, k), minval=-bound,
                           maxval=bound)
    g = jnp.sqrt(jnp.sum(v * v, axis=(1, 2), keepdims=True))
    return {"v": v, "g": g, "b": jnp.zeros(out_ch)}


def _conv(p, x, dilation=1, padding=0):
    w = L.weight_norm_weight(p) if "v" in p else p["w"]
    return L.conv1d_apply({"w": w, "b": p["b"]}, x, dilation=dilation,
                          padding=padding)


def _wn_init(key, cfg: WaveGlowConfig, n_half: int):
    """WN coupling net (reference glow.py:105-151)."""
    ks = jax.random.split(key, 3 + 2 * cfg.wn_layers)
    p: Dict[str, Any] = {
        "start": _wn_conv_init(ks[0], n_half, cfg.wn_channels, 1),
        # end conv zero-init (identity coupling at start, glow.py:127-129)
        "end": {"w": jnp.zeros((2 * n_half, cfg.wn_channels, 1)),
                "b": jnp.zeros(2 * n_half)},
        "cond": _wn_conv_init(
            ks[1], cfg.n_mel_channels * cfg.n_group,
            2 * cfg.wn_channels * cfg.wn_layers, 1),
        "in_layers": [], "res_skip": [],
    }
    for i in range(cfg.wn_layers):
        p["in_layers"].append(_wn_conv_init(
            ks[2 + i], cfg.wn_channels, 2 * cfg.wn_channels,
            cfg.wn_kernel_size))
        rs_ch = (2 * cfg.wn_channels if i < cfg.wn_layers - 1
                 else cfg.wn_channels)
        p["res_skip"].append(_wn_conv_init(
            ks[2 + cfg.wn_layers + i], cfg.wn_channels, rs_ch, 1))
    return p


def _wn_apply(p, cfg: WaveGlowConfig, audio_half, spect):
    """audio_half [B, n_half, T] + grouped spect [B, 80*8, T] →
    [B, 2*n_half, T] (log_s | b stacked as reference does)."""
    C = cfg.wn_channels
    x = _conv(p["start"], audio_half)
    cond = _conv(p["cond"], spect)
    out = jnp.zeros_like(x)
    for i in range(cfg.wn_layers):
        d = 2 ** i
        pad = (cfg.wn_kernel_size * d - d) // 2
        acts_in = _conv(p["in_layers"][i], x, dilation=d, padding=pad)
        acts_in = acts_in + cond[:, i * 2 * C:(i + 1) * 2 * C]
        acts = jnp.tanh(acts_in[:, :C]) * jax.nn.sigmoid(acts_in[:, C:])
        rs = _conv(p["res_skip"][i], acts)
        if i < cfg.wn_layers - 1:
            x = x + rs[:, :C]
            out = out + rs[:, C:]
        else:
            out = out + rs
    return L.conv1d_apply(p["end"], out)


def init_waveglow(key, cfg: WaveGlowConfig):
    ks = jax.random.split(key, 1 + 2 * cfg.n_flows)
    params: Dict[str, Any] = {
        "upsample": L.conv_transpose1d_init(
            ks[0], cfg.n_mel_channels, cfg.n_mel_channels,
            cfg.upsample_kernel, cfg.upsample_stride),
        "convinv": [], "wn": [],
    }
    n_half = cfg.n_group // 2
    n_rem = cfg.n_group
    for k in range(cfg.n_flows):
        if k % cfg.n_early_every == 0 and k > 0:
            n_half -= cfg.n_early_size // 2
            n_rem -= cfg.n_early_size
        # random orthonormal with det +1 (reference glow.py:73-80)
        w = jax.random.normal(ks[1 + 2 * k], (n_rem, n_rem))
        q, _ = jnp.linalg.qr(w)
        q = jnp.where(jnp.linalg.det(q) < 0, q.at[:, 0].multiply(-1.0), q)
        params["convinv"].append({"w": q})
        params["wn"].append(_wn_init(ks[2 + 2 * k], cfg, n_half))
    return params


def _group_spect(spect_up, n_group):
    """Upsampled spect [B, 80, T] → [B, 80*n_group, T//n_group] matching the
    reference unfold/permute/view chain (glow.py:220-221): channel index =
    mel*n_group + within-group offset."""
    B, C, T = spect_up.shape
    Tg = T // n_group
    s = spect_up[:, :, :Tg * n_group].reshape(B, C, Tg, n_group)
    return s.transpose(0, 1, 3, 2).reshape(B, C * n_group, Tg)


def _group_audio(audio, n_group):
    """[B, T] → [B, n_group, T//n_group] (reference glow.py:223)."""
    B, T = audio.shape
    Tg = T // n_group
    return audio[:, :Tg * n_group].reshape(B, Tg, n_group).transpose(0, 2, 1)


def _ungroup_audio(audio):
    """[B, n_group, Tg] → [B, Tg*n_group] (reference glow.py:292)."""
    B, G, Tg = audio.shape
    return audio.transpose(0, 2, 1).reshape(B, Tg * G)


def forward(params, cfg: WaveGlowConfig, spect, audio):
    """Training direction: (mel [B,80,F], audio [B,T]) →
    (z, log_s_list, log_det_w_list) (reference glow.py:207-249)."""
    sp = L.conv_transpose1d_apply(params["upsample"], spect,
                                  stride=cfg.upsample_stride)
    T = audio.shape[1]
    sp = sp[:, :, :T]
    sp = _group_spect(sp, cfg.n_group)
    a = _group_audio(audio, cfg.n_group)
    B, _, Tg = a.shape

    out_audio = []
    log_s_list, log_det_w_list = [], []
    for k in range(cfg.n_flows):
        if k % cfg.n_early_every == 0 and k > 0:
            out_audio.append(a[:, :cfg.n_early_size])
            a = a[:, cfg.n_early_size:]

        W = params["convinv"][k]["w"]
        sign, logabs = jnp.linalg.slogdet(W)
        log_det_w_list.append(B * Tg * logabs)
        a = jnp.einsum("ij,bjt->bit", W, a,
                       preferred_element_type=jnp.float32).astype(a.dtype)

        n_half = a.shape[1] // 2
        a0, a1 = a[:, :n_half], a[:, n_half:]
        wn_out = _wn_apply(params["wn"][k], cfg, a0, sp)
        log_s = wn_out[:, n_half:]
        b = wn_out[:, :n_half]
        a1 = jnp.exp(log_s) * a1 + b
        log_s_list.append(log_s)
        a = jnp.concatenate([a0, a1], axis=1)

    out_audio.append(a)
    return jnp.concatenate(out_audio, axis=1), log_s_list, log_det_w_list


def loss(model_output, sigma: float = 1.0):
    """Flow NLL (reference glow.py:43-59)."""
    z, log_s_list, log_det_w_list = model_output
    log_s_total = sum(jnp.sum(s) for s in log_s_list)
    log_det_total = sum(log_det_w_list)
    l = (jnp.sum(z * z) / (2 * sigma * sigma) - log_s_total - log_det_total)
    return l / (z.shape[0] * z.shape[1] * z.shape[2])


def infer(params, cfg: WaveGlowConfig, spect, *, sigma: float = 1.0, key):
    """Reverse pass: mel [B, 80, F] → audio [B, T] (reference
    glow.py:251-293), with the same conv-artifact trim."""
    sp = L.conv_transpose1d_apply(params["upsample"], spect,
                                  stride=cfg.upsample_stride)
    cutoff = cfg.upsample_kernel - cfg.upsample_stride
    sp = sp[:, :, :-cutoff]
    sp = _group_spect(sp, cfg.n_group)
    B, _, Tg = sp.shape

    n_rem = cfg.n_group
    for k in range(cfg.n_flows):
        if k % cfg.n_early_every == 0 and k > 0:
            n_rem -= cfg.n_early_size

    # draw latents in f32 regardless of compute dtype (bf16 normals would
    # make the synthesis depend on dtype through the latent itself)
    key, k0 = jax.random.split(key)
    a = (sigma * jax.random.normal(k0, (B, n_rem, Tg), jnp.float32)
         ).astype(spect.dtype)

    for k in reversed(range(cfg.n_flows)):
        n_half = a.shape[1] // 2
        a0, a1 = a[:, :n_half], a[:, n_half:]
        wn_out = _wn_apply(params["wn"][k], cfg, a0, sp)
        s = wn_out[:, n_half:]
        b = wn_out[:, :n_half]
        a1 = (a1 - b) / jnp.exp(s)
        a = jnp.concatenate([a0, a1], axis=1)

        # invert in f32: lapack has no bf16 kernels, and an 8x8 inverse in
        # low precision would poison the whole reverse chain (the reference
        # caches a float inverse too, glow.py:262-268)
        W_inv = jnp.linalg.inv(
            params["convinv"][k]["w"].astype(jnp.float32)).astype(a.dtype)
        a = jnp.einsum("ij,bjt->bit", W_inv, a,
                       preferred_element_type=jnp.float32).astype(a.dtype)

        if k % cfg.n_early_every == 0 and k > 0:
            key, kz = jax.random.split(key)
            z = (sigma * jax.random.normal(
                kz, (B, cfg.n_early_size, Tg), jnp.float32)
                ).astype(a.dtype)
            a = jnp.concatenate([z, a], axis=1)

    return _ungroup_audio(a)


def import_torch_waveglow(sd, cfg: WaveGlowConfig):
    """Import a reference WaveGlow state_dict (the reference saves whole
    model objects, waveglow/train.py:52-60; call .state_dict() first).

    Accepts all three reference layouts:
     - the modern one (reference glow.py:119-152): fused per-WN
       ``cond_layer`` + fused ``res_skip_layers``;
     - the vendored-waveglow one (reference waveglow/glow.py:119-152):
       per-layer ``cond_layers.{i}`` (concatenated here along output
       channels in layer order, exactly the slicing _wn_apply uses);
     - the OLD one (reference waveglow/glow_old.py:30-64 +
       convert_model.py:11-38): per-layer ``cond_layers.{i}`` AND split
       ``res_layers``/``skip_layers`` — mirrored here by concatenating
       res|skip rows per layer like update_model does (the last layer has
       no res conv).  torch weight_norm is per-output-row (dim=0), so
       concatenating v/g/b rows is exact, no weight materialization.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def wn_conv(prefix):
        if f"{prefix}.weight_v" in sd:
            return {"v": jnp.asarray(sd[f"{prefix}.weight_v"]),
                    "g": jnp.asarray(sd[f"{prefix}.weight_g"]),
                    "b": jnp.asarray(sd[f"{prefix}.bias"])}
        return {"w": jnp.asarray(sd[f"{prefix}.weight"]),
                "b": jnp.asarray(sd[f"{prefix}.bias"])}

    def wn_concat(convs):
        """Row-concat weight-normed (or plain) convs along out-channels."""
        if all("v" in c for c in convs):
            return {"v": jnp.concatenate([c["v"] for c in convs]),
                    "g": jnp.concatenate([c["g"] for c in convs]),
                    "b": jnp.concatenate([c["b"] for c in convs])}
        def w_of(c):
            return c["w"] if "w" in c else L.weight_norm_weight(c)
        return {"w": jnp.concatenate([w_of(c) for c in convs]),
                "b": jnp.concatenate([c["b"] for c in convs])}

    def cond(k):
        if (f"WN.{k}.cond_layer.weight_v" in sd
                or f"WN.{k}.cond_layer.weight" in sd):
            return wn_conv(f"WN.{k}.cond_layer")
        return wn_concat([wn_conv(f"WN.{k}.cond_layers.{i}")
                          for i in range(cfg.wn_layers)])

    def res_skip(k, i):
        if (f"WN.{k}.res_skip_layers.{i}.weight_v" in sd
                or f"WN.{k}.res_skip_layers.{i}.weight" in sd):
            return wn_conv(f"WN.{k}.res_skip_layers.{i}")
        # glow_old split layout (convert_model.py:21-33)
        skip = wn_conv(f"WN.{k}.skip_layers.{i}")
        if i < cfg.wn_layers - 1:
            return wn_concat([wn_conv(f"WN.{k}.res_layers.{i}"), skip])
        return skip

    params = {
        "upsample": {"w": jnp.asarray(sd["upsample.weight"]),
                     "b": jnp.asarray(sd["upsample.bias"])},
        "convinv": [], "wn": [],
    }
    for k in range(cfg.n_flows):
        params["convinv"].append(
            {"w": jnp.asarray(sd[f"convinv.{k}.conv.weight"][:, :, 0])})
        wn = {
            "start": wn_conv(f"WN.{k}.start"),
            "end": {"w": jnp.asarray(sd[f"WN.{k}.end.weight"]),
                    "b": jnp.asarray(sd[f"WN.{k}.end.bias"])},
            "cond": cond(k),
            "in_layers": [wn_conv(f"WN.{k}.in_layers.{i}")
                          for i in range(cfg.wn_layers)],
            "res_skip": [res_skip(k, i) for i in range(cfg.wn_layers)],
        }
        params["wn"].append(wn)
    return params
