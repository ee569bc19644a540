"""Weight-only int8 quantization for the autoregressive decode hot path.

Measured verdict (xprof, v5e, round 1): int8 weight quant does NOT pay on
chips whose VMEM holds the decoder weights.  The three LSTM weight matrices
(~63 MB bf16) are VMEM-RESIDENT on v5e — XLA keeps them on-chip across
while_loop steps, so the bf16 decode step runs at VMEM speed (~3.3 TB/s
effective; 29 us/step at B=8, ~70 us at B=128) and is matmul-bound, not
HBM-bound.  The int8 path's per-step int8→bf16 convert is VPU-bound and adds
more than the saved bandwidth.  Kept (off by default, cfg.decode_quant="")
because the math is exact-by-construction and it becomes the right lever on
configurations where the weights DO stream from HBM every step: larger
decoder dims, many-model serving, or smaller-VMEM parts.

The reference has no counterpart (its CUDA decode is kernel-launch-bound,
reference model.py:417-424); this is a TPU-native feature.

Design:
 - symmetric per-output-channel scales: w ≈ w_q * scale[n].  Both the int8
   values (|q| ≤ 127) and their bf16 casts are exact, and the MXU
   accumulates in f32, so the ONLY error is the weight rounding itself.
 - the scale is applied AFTER the matmul ((x @ W_q) * s == x @ (W_q * s))
   so the kernel's inner loop is a plain bf16 MXU matmul of the
   dequantized-by-cast tile — no per-element f32 multiply of the weights.
 - Pallas kernel streams [K, BLOCK_N] int8 tiles HBM→VMEM on a grid over
   (stack, N); the Pallas pipeline double-buffers the tile DMA against the
   MXU automatically.  Activations (x) stay VMEM-resident across the row
   of N-tiles (the index map is constant in n).
 - a jnp reference path (used on CPU and in tests) is numerically identical
   up to f32 summation order.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_int8(w: jnp.ndarray, axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization of ``w`` with scales per slice along all
    dims except ``axis`` (the contraction axis that gets reduced away).

    Returns (w_q int8 same shape, scale f32 with ``axis`` removed).
    """
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8).astype(jnp.float32) / 127.0
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return w_q.astype(jnp.int8), jnp.squeeze(scale, axis)


def _ref_matmul(x, w_q, scale):
    y = jnp.einsum("sbk,skn->sbn", x, w_q.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return y * scale[:, None, :].astype(jnp.float32)


def _pallas_available() -> bool:
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend in ("tpu", "axon")


def _kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[0]                       # [B, K] bf16
    w = w_ref[0].astype(x.dtype)       # [K, TN] int8 → bf16 (exact)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)  # MXU, f32 accum
    o_ref[0] = y * s_ref[0].astype(jnp.float32)  # [B,TN] * [1,TN] broadcast


def matmul_dequant_int8(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                        *, block_n: int = 512,
                        interpret: bool = False) -> jnp.ndarray:
    """Stacked weight-dequantizing matmul: x [S,B,K] float × w_q [S,K,N]
    int8, scale [S,N] → [S,B,N] f32.

    Uses the Pallas TPU kernel when on a TPU backend and shapes tile
    cleanly; otherwise an identical-semantics jnp path.
    """
    S, B, K = x.shape
    _, _, N = w_q.shape
    if not (interpret or _pallas_available()) or N % block_n or K % 8:
        return _ref_matmul(x, w_q, scale)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (S, N // block_n)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, B, K), lambda s, n: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, block_n), lambda s, n: (s, 0, n),
                         memory_space=pltpu.VMEM),
            # scale fed as [S, 1, N]: a 2-D [S, N] input would need block
            # (1, block_n), whose second-to-last dim (1) violates Mosaic's
            # trailing-dims rule (div by 8 or full) — found on real TPU;
            # interpret mode accepts it.
            pl.BlockSpec((1, 1, block_n), lambda s, n: (s, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, block_n), lambda s, n: (s, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, B, N), jnp.float32),
        interpret=interpret,
    )(x, w_q, scale[:, None, :])
