"""SSIM on mel-spectrogram images (reference ssim.py:39-73 — wired into the
loss zoo there but commented out of the total, loss_function.py:10,24; kept
here as an available auxiliary loss)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    x = np.arange(window_size)
    g = np.exp(-((x - window_size // 2) ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)  # [W, W]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5, size_average: bool = True) -> jnp.ndarray:
    """img1/img2: [B, C, H, W] → scalar (or [B]) SSIM, matching the torch
    implementation's gaussian-window formulation."""
    C = img1.shape[1]
    w = jnp.asarray(_gaussian_window(window_size, sigma))
    w = jnp.broadcast_to(w[None, None], (C, 1, window_size, window_size))
    pad = window_size // 2

    conv = lambda x: jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
        preferred_element_type=jnp.float32)

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu12

    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = (((2 * mu12 + C1) * (2 * sigma12 + C2))
                / ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)))
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))
