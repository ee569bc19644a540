"""Unified typed configuration for the TPU-native tacotron2_subword framework.

The reference spreads configuration across three systems (AttrDict hparams in
hparams.py:10-106, YAML for the G2P under conf/, JSON for the vocoders).  Here
everything model/training/audio-related lives in one frozen dataclass so it can
be passed as a static argument to jit-compiled functions; vocoder configs get
their own dataclasses in their modules.

Defaults mirror /root/reference/hparams.py:10-106 exactly (same operating
point: 22050 Hz, n_fft 1024, hop 256, 80 mels, n_symbols 313, etc.).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Tuple


@dataclasses.dataclass(frozen=True)
class TacotronConfig:
    # -- experiment -------------------------------------------------------
    epochs: int = 1500
    iters_per_checkpoint: int = 1000
    seed: int = 1234
    ignore_layers: Tuple[str, ...] = ("embedding",)

    # -- audio (reference hparams.py:50-57) -------------------------------
    max_wav_value: float = 32768.0
    sampling_rate: int = 22050
    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mel_channels: int = 80
    mel_fmin: float = 0.0
    mel_fmax: float = 8000.0

    # -- model (reference hparams.py:62-95) --------------------------------
    n_symbols: int = 313
    sub_n_symbols: int = 5500
    symbols_embedding_dim: int = 512
    attention: str = "StepwiseMonotonicAttention"
    align_loss: str = ""  # "", "L2", "KL"
    align_loss_max_iters: int = 40000

    encoder_kernel_size: int = 5
    encoder_n_convolutions: int = 3
    encoder_embedding_dim: int = 512
    bert_embedding_dim: int = 768

    n_frames_per_step: int = 1
    decoder_rnn_dim: int = 1024
    prenet_dim: int = 256
    max_decoder_steps: int = 1000
    gate_threshold: float = 0.001
    p_attention_dropout: float = 0.1
    p_decoder_dropout: float = 0.1
    # The reference prenet runs dropout unconditionally, even in eval
    # (model.py:23 `training=True`); keep that quirk behind a flag.
    prenet_dropout_always_on: bool = True

    attention_rnn_dim: int = 1024
    attention_dim: int = 128
    attention_location_n_filters: int = 32
    attention_location_kernel_size: int = 31

    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 5

    # -- optimization (reference hparams.py:100-105) ----------------------
    use_saved_learning_rate: bool = True
    learning_rate: float = 1e-3
    weight_decay: float = 1e-6
    grad_clip_thresh: float = 1.0
    batch_size: int = 8  # per device
    mask_padding: bool = True

    # -- auxiliary spectrogram losses --------------------------------------
    # Soft-DTW between mel_postnet and the target mel as a training loss.
    # The reference ships soft-DTW as an autograd.Function module built for
    # loss use (soft_dtw_cuda.py:273-352) and BASELINE config 3 names it in
    # the train-step workload; weight 0 disables the term (reference default:
    # not wired into Tacotron2Loss).  The raw soft-DTW value scales like
    # path_length * n_mels * per-bin-MSE, so the term is normalized by
    # (N + M) * n_mel_channels to land on the mel-MSE scale; weight 1.0 then
    # weighs it comparably to the MSE terms.
    softdtw_loss_weight: float = 0.0
    softdtw_gamma: float = 1.0          # reference SoftDTW gamma default
    softdtw_bandwidth: float = 0.0      # Sakoe-Chiba band; 0 = no pruning
    # "auto": fused Pallas kernel on TPU when the shape fits VMEM, else the
    # diagonal-scan custom-VJP; "scan"/"pallas" force an implementation.
    softdtw_impl: str = "auto"
    # SSIM on the mel image as a loss term: the reference wires
    # `-self.ssim(mel_out, mel_target)` into Tacotron2Loss but ships it
    # commented out (loss_function.py:10,24); weight 0 keeps that default,
    # weight w adds `w * (1 - SSIM)` (same gradient as the reference's
    # -ssim, shifted to be non-negative).
    ssim_loss_weight: float = 0.0

    # -- TPU-specific (no reference counterpart) --------------------------
    # Compute dtype for matmuls/activations; params and optimizer state stay
    # float32.  "parity" mode (float32 + highest matmul precision) is used by
    # the allclose-vs-reference tests.
    compute_dtype: str = "bfloat16"
    parity_mode: bool = False
    # Weight-only quantization of the decode-loop LSTM weights ("" or
    # "int8").  Inference-only: halves the per-step HBM weight stream that
    # bounds autoregressive decode (see ops/quant.py).
    decode_quant: str = ""
    # Unroll factor for the teacher-forced decoder scan.  Measured neutral-
    # to-negative on v5e once custom_decoder_vjp removes the in-loop weight
    # gradient accumulators; kept as a tuning knob.
    decoder_scan_unroll: int = 1
    # Hand-routed scan VJP (models/tacotron2.py _tf_scan_custom): computes
    # the big LSTM weight grads as one dense matmul after the backward scan
    # instead of a ~60 MB read-modify-write accumulator per mel frame.
    custom_decoder_vjp: bool = True

    def replace(self, **kw: Any) -> "TacotronConfig":
        return dataclasses.replace(self, **kw)

    @property
    def n_freqs(self) -> int:
        return self.filter_length // 2 + 1


def create_config(overrides: Mapping[str, Any] | None = None,
                  hparams_string: str | None = None) -> TacotronConfig:
    """Build a config, optionally applying overrides.

    ``hparams_string`` accepts the reference's bespoke "[k:v-k:v]" syntax
    (hparams.py:108-114) for CLI compatibility.
    """
    cfg = TacotronConfig()
    kw: dict[str, Any] = {}
    if hparams_string:
        body = hparams_string.strip()
        if body.startswith("["):
            body = body[1:]
        body = body.rstrip("]-")
        for item in body.split("-"):
            if not item or ":" not in item:
                continue
            k, v = item.split(":", 1)
            if hasattr(cfg, k):
                field_type = type(getattr(cfg, k))
                if field_type is bool:
                    # bool("False") is True — parse the words
                    kw[k] = v.strip().lower() in ("1", "true", "yes", "on")
                elif field_type is str:
                    kw[k] = v
                else:
                    kw[k] = field_type(v)
    if overrides:
        kw.update(overrides)
    return cfg.replace(**kw) if kw else cfg
