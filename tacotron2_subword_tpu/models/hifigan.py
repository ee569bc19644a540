"""HiFi-GAN vocoder (generator + discriminators + GAN losses) in JAX.

Re-implements the capabilities of the reference's vendored HiFi-GAN
(reference hifigan_infer/hifigan_model.py:11-281): Generator =
conv_pre(80→C k7) → N× [leaky_relu → ConvTranspose1d upsample → multi-
receptive-field fusion (ResBlock1/2 averaged)] → leaky_relu → conv_post →
tanh; MultiPeriodDiscriminator (periods 2,3,5,7,11), MultiScaleDiscriminator
(3 scales), LSGAN + feature-matching losses.

All training-form convs carry weight-norm {v, g} parametrizations;
``fuse_generator`` collapses them for inference (the reference's
``remove_weight_norm()``, hifigan_model.py:118-124).  On TPU the whole
generator is one fused XLA program — the 256× upsampling transposed convs
are input-dilated convolutions that XLA maps onto the MXU.

Config matches the reference JSON (hifigan_infer/config_v1/v2/v3.json).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tacotron2_subword_tpu.nn import layers as L

LRELU_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class HifiganConfig:
    resblock: str = "1"
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_mels: int = 80
    sampling_rate: int = 22050

    @classmethod
    def from_json(cls, path: str) -> "HifiganConfig":
        with open(path) as f:
            h = json.load(f)
        return cls(
            resblock=str(h["resblock"]),
            upsample_rates=tuple(h["upsample_rates"]),
            upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
            upsample_initial_channel=h["upsample_initial_channel"],
            resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in h["resblock_dilation_sizes"]),
            num_mels=h.get("num_mels", 80),
            sampling_rate=h.get("sampling_rate", 22050),
        )

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_rates))


def get_padding(kernel: int, dilation: int = 1) -> int:
    return (kernel * dilation - dilation) // 2


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------

def _wn_conv_init(key, in_ch, out_ch, k):
    p = L.weight_norm_init(key, (out_ch, in_ch, k), init_std=0.01)
    p["b"] = jnp.zeros(out_ch)
    return p


def _wn_convt_init(key, in_ch, out_ch, k):
    # torch ConvTranspose1d layout [in, out, k]; weight_norm dim=0
    p = L.weight_norm_init(key, (in_ch, out_ch, k), init_std=0.01)
    p["b"] = jnp.zeros(out_ch)
    return p


def _resblock_init(key, h: HifiganConfig, channels: int, kernel: int,
                   dilations: Sequence[int]):
    if h.resblock == "1":
        ks = jax.random.split(key, 2 * len(dilations))
        return {
            "convs1": [_wn_conv_init(ks[i], channels, channels, kernel)
                       for i in range(len(dilations))],
            "convs2": [_wn_conv_init(ks[len(dilations) + i], channels,
                                     channels, kernel)
                       for i in range(len(dilations))],
        }
    ks = jax.random.split(key, len(dilations))
    return {"convs": [_wn_conv_init(ks[i], channels, channels, kernel)
                      for i in range(len(dilations))]}


def init_generator(key, h: HifiganConfig):
    n_up = len(h.upsample_rates)
    ks = jax.random.split(key, 2 + n_up + n_up * len(h.resblock_kernel_sizes))
    ki = iter(ks)
    params: Dict[str, Any] = {
        "conv_pre": _wn_conv_init(next(ki), h.num_mels,
                                  h.upsample_initial_channel, 7),
    }
    ups, resblocks = [], []
    ch = h.upsample_initial_channel
    for i, (u, k) in enumerate(zip(h.upsample_rates,
                                   h.upsample_kernel_sizes)):
        ups.append(_wn_convt_init(next(ki), ch // (2 ** i),
                                  ch // (2 ** (i + 1)), k))
        out_ch = ch // (2 ** (i + 1))
        for kern, dil in zip(h.resblock_kernel_sizes,
                             h.resblock_dilation_sizes):
            resblocks.append(_resblock_init(next(ki), h, out_ch, kern, dil))
    params["ups"] = ups
    params["resblocks"] = resblocks
    params["conv_post"] = _wn_conv_init(next(ki), out_ch, 1, 7)
    return params


def _conv_w(p, dim=0):
    """Resolve weight-norm or fused weight."""
    if "v" in p:
        return L.weight_norm_weight(p, dim)
    return p["w"]


def _conv(p, x, dilation=1, padding=None):
    w = _conv_w(p)
    q = {"w": w}
    if "b" in p:
        q["b"] = p["b"]
    if padding is None:
        padding = get_padding(w.shape[-1], dilation)
    return L.conv1d_apply(q, x, padding=padding, dilation=dilation)


def _convt(p, x, stride, padding):
    q = {"w": _conv_w(p, dim=0)}
    if "b" in p:
        q["b"] = p["b"]
    return L.conv_transpose1d_apply(q, x, stride=stride, padding=padding)


def _resblock_apply(p, h: HifiganConfig, x, kernel, dilations):
    lrelu = lambda v: jax.nn.leaky_relu(v, LRELU_SLOPE)
    if h.resblock == "1":
        for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
            xt = _conv(c1, lrelu(x), dilation=d)
            xt = _conv(c2, lrelu(xt), dilation=1)
            x = xt + x
    else:
        for c, d in zip(p["convs"], dilations):
            x = _conv(c, lrelu(x), dilation=d) + x
    return x


def generator_apply(params, h: HifiganConfig, mel):
    """mel [B, 80, T] → waveform [B, 1, T * prod(upsample_rates)]."""
    x = _conv(params["conv_pre"], mel, padding=3)
    nk = len(h.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(h.upsample_rates,
                                   h.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = _convt(params["ups"][i], x, stride=u, padding=(k - u) // 2)
        xs = None
        for j in range(nk):
            r = _resblock_apply(params["resblocks"][i * nk + j], h, x,
                                h.resblock_kernel_sizes[j],
                                h.resblock_dilation_sizes[j])
            xs = r if xs is None else xs + r
        x = xs / nk
    x = jax.nn.leaky_relu(x)  # default slope 0.01 (reference :112)
    x = _conv(params["conv_post"], x, padding=3)
    return jnp.tanh(x)


def fuse_generator(params):
    """Collapse all weight-norm parametrizations (reference
    remove_weight_norm) so inference does no norm recomputation."""
    def fuse(p, dim=0):
        return L.fuse_weight_norm(p, dim) if "v" in p else p

    out = {"conv_pre": fuse(params["conv_pre"]),
           "conv_post": fuse(params["conv_post"]),
           "ups": [fuse(p, dim=0) for p in params["ups"]],
           "resblocks": []}
    for rb in params["resblocks"]:
        out["resblocks"].append(
            {k: [fuse(c) for c in v] for k, v in rb.items()})
    return out


def import_torch_generator(sd, h: HifiganConfig):
    """Import a reference HiFi-GAN checkpoint ({'generator': state_dict},
    reference hifigan_utils.py:38-41 / inference.py:184-188).  Accepts both
    weight-normed (weight_v/weight_g) and fused (weight) checkpoints."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def grab(prefix):
        if f"{prefix}.weight_v" in sd:
            return {"v": jnp.asarray(sd[f"{prefix}.weight_v"]),
                    "g": jnp.asarray(sd[f"{prefix}.weight_g"]),
                    "b": jnp.asarray(sd[f"{prefix}.bias"])}
        return {"w": jnp.asarray(sd[f"{prefix}.weight"]),
                "b": jnp.asarray(sd[f"{prefix}.bias"])}

    params = {"conv_pre": grab("conv_pre"), "conv_post": grab("conv_post"),
              "ups": [grab(f"ups.{i}") for i in range(len(h.upsample_rates))],
              "resblocks": []}
    nk = len(h.resblock_kernel_sizes)
    for i in range(len(h.upsample_rates) * nk):
        if h.resblock == "1":
            nd = len(h.resblock_dilation_sizes[i % nk])
            params["resblocks"].append({
                "convs1": [grab(f"resblocks.{i}.convs1.{j}")
                           for j in range(nd)],
                "convs2": [grab(f"resblocks.{i}.convs2.{j}")
                           for j in range(nd)],
            })
        else:
            nd = len(h.resblock_dilation_sizes[i % nk])
            params["resblocks"].append({
                "convs": [grab(f"resblocks.{i}.convs.{j}")
                          for j in range(nd)]})
    return params


# ---------------------------------------------------------------------------
# Discriminators (training support; reference hifigan_model.py:127-247)
# ---------------------------------------------------------------------------

def _wn_conv2d_init(key, in_ch, out_ch, kh, kw):
    p = L.weight_norm_init(key, (out_ch, in_ch, kh, kw), init_std=0.01)
    p["b"] = jnp.zeros(out_ch)
    return p


def _conv2d(p, x, stride=(1, 1), padding=((0, 0), (0, 0))):
    w = _conv_w(p)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=list(padding),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    return (y + p["b"][None, :, None, None]).astype(x.dtype)


PERIODS = (2, 3, 5, 7, 11)


def init_period_discriminator(key, period: int):
    ks = jax.random.split(key, 6)
    chans = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
    return {
        "convs": [_wn_conv2d_init(ks[i], cin, cout, 5, 1)
                  for i, (cin, cout) in enumerate(chans)],
        "conv_post": _wn_conv2d_init(ks[5], 1024, 1, 3, 1),
    }


def period_discriminator_apply(p, x, period: int):
    """x [B, 1, T] → (logits [B, n], feature maps)."""
    B, C, T = x.shape
    if T % period != 0:
        pad = period - (T % period)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)), mode="reflect")
        T += pad
    x = x.reshape(B, C, T // period, period)
    fmap = []
    for i, conv in enumerate(p["convs"]):
        stride = (3, 1) if i < 4 else (1, 1)
        x = _conv2d(conv, x, stride=stride, padding=((2, 2), (0, 0)))
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = _conv2d(p["conv_post"], x, padding=((1, 1), (0, 0)))
    fmap.append(x)
    return x.reshape(B, -1), fmap


# (in_ch, out_ch, kernel, stride, groups, padding) per layer — reference
# hifigan_model.py:194-203
SCALE_DISC_SPEC = ((1, 128, 15, 1, 1, 7), (128, 128, 41, 2, 4, 20),
                   (128, 256, 41, 2, 16, 20), (256, 512, 41, 4, 16, 20),
                   (512, 1024, 41, 4, 16, 20), (1024, 1024, 41, 1, 16, 20),
                   (1024, 1024, 5, 1, 1, 2))


def init_scale_discriminator(key):
    ks = jax.random.split(key, 8)
    convs = []
    for i, (cin, cout, k, s, g, pad) in enumerate(SCALE_DISC_SPEC):
        p = L.weight_norm_init(ks[i], (cout, cin // g, k), init_std=0.01)
        p["b"] = jnp.zeros(cout)
        convs.append(p)
    post = L.weight_norm_init(ks[7], (1, 1024, 3), init_std=0.01)
    post["b"] = jnp.zeros(1)
    return {"convs": convs, "conv_post": post}


def scale_discriminator_apply(p, x):
    fmap = []
    for c, (_, _, _, stride, groups, pad) in zip(p["convs"],
                                                 SCALE_DISC_SPEC):
        q = {"w": _conv_w(c), "b": c["b"]}
        x = L.conv1d_apply(q, x, stride=stride, padding=pad, groups=groups)
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    q = {"w": _conv_w(p["conv_post"]), "b": p["conv_post"]["b"]}
    x = L.conv1d_apply(q, x, padding=1)
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def init_discriminators(key):
    kp, ks_ = jax.random.split(key)
    kps = jax.random.split(kp, len(PERIODS))
    kss = jax.random.split(ks_, 3)
    return {
        "mpd": [init_period_discriminator(kps[i], p)
                for i, p in enumerate(PERIODS)],
        "msd": [init_scale_discriminator(k) for k in kss],
    }


def _avg_pool(x, k=4, s=2, pad=2):
    y = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k), (1, 1, s),
        [(0, 0), (0, 0), (pad, pad)])
    return y / k


def discriminators_apply(params, y, y_hat):
    """Returns (real_logits, gen_logits, real_fmaps, gen_fmaps) across
    MPD + MSD (reference hifigan_model.py:174-247)."""
    rs, gs, fr, fg = [], [], [], []
    for p, period in zip(params["mpd"], PERIODS):
        r, fm_r = period_discriminator_apply(p, y, period)
        g, fm_g = period_discriminator_apply(p, y_hat, period)
        rs.append(r); gs.append(g); fr.append(fm_r); fg.append(fm_g)
    yy, yh = y, y_hat
    for i, p in enumerate(params["msd"]):
        if i != 0:
            yy, yh = _avg_pool(yy), _avg_pool(yh)
        r, fm_r = scale_discriminator_apply(p, yy)
        g, fm_g = scale_discriminator_apply(p, yh)
        rs.append(r); gs.append(g); fr.append(fm_r); fg.append(fm_g)
    return rs, gs, fr, fg


def feature_loss(fmap_r, fmap_g):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2


def discriminator_loss(real_outs, gen_outs):
    loss = 0.0
    for dr, dg in zip(real_outs, gen_outs):
        loss += jnp.mean((1 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def generator_adv_loss(gen_outs):
    loss = 0.0
    for dg in gen_outs:
        loss += jnp.mean((1 - dg) ** 2)
    return loss
