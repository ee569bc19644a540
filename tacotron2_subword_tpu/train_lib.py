"""Loss functions and the jitted training step.

Loss semantics mirror the reference Tacotron2Loss (reference
loss_function.py:6-66): MSE(mel) + MSE(mel_postnet) + BCE-with-logits(gate),
plus an optional alignment loss against duration-expanded 0/1 targets for
the first ``align_loss_max_iters`` iterations — "L2" (MSE) or "KL"
(per-sample masked KL).  The reference's KL wiring is broken as committed
(x[4] is a tuple, and the double [:][:] slice slices dim 0 twice,
loss_function.py:43-48); here the KL is computed over the valid
[T_mel x T_text] region with proper masks — a documented fix.

Optimizer matches reference train.py:210: Adam with torch-style L2 weight
decay (decay added to the gradient before the moment updates), global-norm
gradient clipping at 1.0 with NaN-skip (reference train.py:335-342).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tacotron2_subword_tpu.config import TacotronConfig
from tacotron2_subword_tpu.models import tacotron2 as M
from tacotron2_subword_tpu.ops import softdtw as SD


def bce_with_logits(logits, targets):
    """Numerically-stable BCEWithLogits, mean reduction (torch parity)."""
    return jnp.mean(jnp.maximum(logits, 0) - logits * targets
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def _masked_kl(align_out, align_target, text_lengths, mel_lengths):
    """Per-sample KL(align_target || align_out) over valid frames/positions,
    summed over the batch (reference accumulates with += and no division,
    loss_function.py:43-54)."""
    eps = 1e-6
    out = jnp.maximum(align_out, eps)
    tar = jnp.maximum(align_target, eps)
    T_mel, T_text = align_out.shape[1], align_out.shape[2]
    frame_valid = M.sequence_mask(mel_lengths - 1, T_mel)      # [B, T_mel]
    pos_valid = M.sequence_mask(text_lengths - 1, T_text)      # [B, T_text]
    kl_elem = align_target * (jnp.log(tar) - jnp.log(out))
    kl_elem = kl_elem * pos_valid[:, None, :]
    kl_per_frame = kl_elem.sum(axis=2)                          # [B, T_mel]
    kl_per_sample = ((kl_per_frame * frame_valid).sum(axis=1)
                     / jnp.maximum(frame_valid.sum(axis=1), 1.0))
    return kl_per_sample.sum()


def softdtw_mel_loss(mel_out: jnp.ndarray, mel_target: jnp.ndarray,
                     cfg: TacotronConfig,
                     w: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Soft-DTW between predicted and target mels as a differentiable loss
    term (the reference's SoftDTW module API, soft_dtw_cuda.py:273-352, used
    on mels by its eval scripts; here wired into training per BASELINE
    config 3).

    mel_out/mel_target: [B, n_mels, T].  The raw soft-DTW value grows like
    alignment-path-length x n_mels x per-bin squared error, so it is
    normalized by (N + M) * n_mels to sit on the mel-MSE scale.  Returns the
    (weight-)mean over the batch.

    Implementation choice (cfg.softdtw_impl): "auto" runs the fused fwd+bwd
    Pallas kernel (ops/softdtw.softdtw_pallas_diff) on TPU when the [T, T]
    matrix fits VMEM, else the diagonal-scan custom-VJP — both give
    identical values/grads (tests/test_softdtw.py).
    """
    x = jnp.swapaxes(mel_out, 1, 2).astype(jnp.float32)     # [B, T, n_mels]
    y = jnp.swapaxes(mel_target, 1, 2).astype(jnp.float32)
    N, M = x.shape[1], y.shape[1]
    D = SD.euclidean_dist_matrix(x, y)
    impl = cfg.softdtw_impl
    if impl == "auto":
        # measured-crossover dispatch (ops/softdtw.auto_impl): the fused
        # Pallas kernel only where it beats the scan on device time
        impl = SD.auto_impl(N, M)
    if impl == "pallas":
        vals = SD.softdtw_pallas_diff(D, cfg.softdtw_gamma,
                                      cfg.softdtw_bandwidth)
    elif impl == "scan":
        vals = SD.softdtw(D, cfg.softdtw_gamma, cfg.softdtw_bandwidth)
    else:
        raise ValueError(f"unknown softdtw_impl {cfg.softdtw_impl!r}")
    per = vals / float((N + M) * mel_out.shape[1])
    if w is None:
        return per.mean()
    return (per * w).sum() / jnp.maximum(w.sum(), 1.0)


def ssim_mel_loss(mel_out: jnp.ndarray, mel_target: jnp.ndarray,
                  w: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """1 - SSIM(mel_out, mel_target) on the mel images — the reference's
    commented `-self.ssim(mel_out.unsqueeze(1), mel_target.unsqueeze(1))`
    (loss_function.py:10,24) shifted by +1 so the term is non-negative
    (same gradient)."""
    from tacotron2_subword_tpu.ops.ssim import ssim
    s = ssim(mel_out[:, None].astype(jnp.float32),
             mel_target[:, None].astype(jnp.float32),
             size_average=w is None)
    if w is None:
        return 1.0 - s
    return ((1.0 - s) * w).sum() / jnp.maximum(w.sum(), 1.0)


def tacotron2_loss(outputs: Dict[str, jnp.ndarray], batch: Dict[str, Any],
                   cfg: TacotronConfig, iteration) -> Dict[str, jnp.ndarray]:
    """Returns dict(total, mel, gate, align, align_bert).

    An optional ``batch["weight"]`` [B] excludes padding duplicates that the
    bucketed loader appends to fill partial batches (data/dataset.py); with
    all-ones weights this reduces exactly to the reference's global means.
    """
    mel_target = batch["mels"]
    gate_target = batch["gate_target"]  # [B, T_out], 0 then 1 at/after end
    w = batch.get("weight")

    if w is None:
        mel_loss = (jnp.mean((outputs["mel"] - mel_target) ** 2)
                    + jnp.mean((outputs["mel_postnet"] - mel_target) ** 2))
        gate_loss = bce_with_logits(outputs["gate"].reshape(-1),
                                    gate_target.reshape(-1))
    else:
        wsum = jnp.maximum(w.sum(), 1.0)

        def wmean(x):  # per-sample mean over non-batch dims, then weighted
            per = x.reshape(x.shape[0], -1).mean(axis=1)
            return (per * w).sum() / wsum

        mel_loss = (wmean((outputs["mel"] - mel_target) ** 2)
                    + wmean((outputs["mel_postnet"] - mel_target) ** 2))
        g = outputs["gate"]
        t = gate_target
        bce = (jnp.maximum(g, 0) - g * t + jnp.log1p(jnp.exp(-jnp.abs(g))))
        gate_loss = wmean(bce)

    losses = {"mel": mel_loss, "gate": gate_loss,
              "align": jnp.float32(0.0), "align_bert": jnp.float32(0.0)}
    total = mel_loss + gate_loss

    if cfg.softdtw_loss_weight > 0.0:
        sdtw = softdtw_mel_loss(outputs["mel_postnet"], mel_target, cfg, w)
        losses["softdtw"] = sdtw
        total = total + cfg.softdtw_loss_weight * sdtw
    if cfg.ssim_loss_weight > 0.0:
        sl = ssim_mel_loss(outputs["mel_postnet"], mel_target, w)
        losses["ssim"] = sl
        total = total + cfg.ssim_loss_weight * sl

    if cfg.align_loss and "align_target" in batch:
        if cfg.n_frames_per_step != 1:
            raise ValueError(
                "align_loss requires n_frames_per_step=1: alignments are "
                "per decoder step [B, T_out/r, T_text] but duration-expanded "
                "align targets are per frame [B, T_out, T_text]")
        active = iteration < cfg.align_loss_max_iters
        # The duration-expanded target lives on the PHONE axis.  The
        # reference applies the same target to the subword-stream
        # alignment too (loss_function.py:31,48), which only type-checks
        # when T_sub == T_text — with real data the subword axis differs
        # and the term is unusable as committed (part of the broken KL
        # wiring documented above).  Repair: always train the phone
        # stream; add the bert term only in the degenerate equal-axes
        # case the reference's code implies.
        bert_ok = (outputs["alignments_bert"].shape
                   == batch["align_target"].shape)
        if cfg.align_loss == "L2":
            a = jnp.mean((outputs["alignments"] - batch["align_target"]) ** 2)
            ab = (jnp.mean((outputs["alignments_bert"]
                            - batch["align_target"]) ** 2)
                  if bert_ok else jnp.float32(0.0))
        elif cfg.align_loss == "KL":
            a = _masked_kl(outputs["alignments"], batch["align_target"],
                           batch["text_lengths"], batch["output_lengths"])
            ab = (_masked_kl(outputs["alignments_bert"],
                             batch["align_target"],
                             batch["sub_lengths"], batch["output_lengths"])
                  if bert_ok else jnp.float32(0.0))
        else:
            raise ValueError(f"unknown align_loss {cfg.align_loss!r}")
        a = jnp.where(active, a, 0.0)
        ab = jnp.where(active, ab, 0.0)
        losses["align"], losses["align_bert"] = a, ab
        total = total + a + ab

    losses["total"] = total
    return losses


# ---------------------------------------------------------------------------
# Optimizer / train state
# ---------------------------------------------------------------------------

class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    bn_state: Any
    opt_state: Any


def make_optimizer(cfg: TacotronConfig, learning_rate=None) -> optax.GradientTransformation:
    lr = cfg.learning_rate if learning_rate is None else learning_rate
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),  # torch Adam L2 style
        optax.clip_by_global_norm(cfg.grad_clip_thresh),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-lr),
    )


def create_train_state(key, cfg: TacotronConfig,
                       optimizer: Optional[optax.GradientTransformation] = None
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    params, bn = M.init_tacotron2(key, cfg)
    tx = optimizer or make_optimizer(cfg)
    return TrainState(jnp.zeros((), jnp.int32), params, bn,
                      tx.init(params)), tx


def train_step(state: TrainState, batch, rng, cfg: TacotronConfig,
               tx: optax.GradientTransformation):
    """One optimization step.  Pure; jit with cfg/tx static:

        step = jax.jit(train_step, static_argnums=(3, 4))

    Returns (new_state, metrics).  NaN/Inf grads skip the update (the
    reference's overflow-skip, train.py:335-342).
    """
    def loss_fn(params):
        outputs, new_bn = M.forward(params, state.bn_state, cfg, batch,
                                    training=True, rng=rng)
        losses = tacotron2_loss(outputs, batch, cfg, state.step)
        return losses["total"], (losses, new_bn)

    grads, (losses, new_bn) = jax.grad(loss_fn, has_aux=True)(state.params)
    grad_norm = optax.global_norm(grads)
    is_finite = jnp.isfinite(grad_norm)

    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    # skip the whole update on non-finite grad norm
    new_params = jax.tree_util.tree_map(
        lambda new, old: jnp.where(is_finite, new, old),
        new_params, state.params)
    new_opt = jax.tree_util.tree_map(
        lambda new, old: jnp.where(is_finite, new, old),
        new_opt, state.opt_state)

    metrics = dict(losses)
    metrics["grad_norm"] = grad_norm
    metrics["skipped"] = (~is_finite).astype(jnp.float32)
    return TrainState(state.step + 1, new_params, new_bn, new_opt), metrics


def eval_step(state: TrainState, batch, rng, cfg: TacotronConfig):
    outputs, _ = M.forward(state.params, state.bn_state, cfg, batch,
                           training=False, rng=rng)
    return tacotron2_loss(outputs, batch, cfg, state.step), outputs


def make_gate_target(output_lengths, max_len) -> jnp.ndarray:
    """0 until the last valid frame, 1 from it onward (reference
    data_utils.py stop_token construction + pad 1.0)."""
    t = jnp.arange(max_len)[None, :]
    return (t >= (output_lengths[:, None] - 1)).astype(jnp.float32)
