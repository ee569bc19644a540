"""TensorBoard logging + plotting (the reference's Tacotron2Logger /
plotting_utils, reference logger.py:1-95, plotting_utils.py:14-61).

Training scalars (total/mel/gate/align losses, grad norm, lr, step
duration), validation loss, parameter histograms, alignment/mel/gate
images, and optionally vocoded audio of a validation sample.  Uses
tensorboardX (baked in); matplotlib renders images with Agg.
"""

from __future__ import annotations

import io
from typing import Any, Dict, Optional

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pylab as plt  # noqa: E402


def _fig_to_array(fig) -> np.ndarray:
    buf = io.BytesIO()
    fig.savefig(buf, format="raw", dpi=100)
    buf.seek(0)
    w, h = fig.canvas.get_width_height()
    data = np.frombuffer(buf.getvalue(), dtype=np.uint8)
    data = data.reshape(h, w, 4)[:, :, :3]
    plt.close(fig)
    return data


def plot_alignment(alignment: np.ndarray, info: Optional[str] = None
                   ) -> np.ndarray:
    """[T_out, T_text] → HWC image (reference plotting_utils.py:14-29)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(alignment.T, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    xlabel = "Decoder timestep" + (f"\n\n{info}" if info else "")
    ax.set_xlabel(xlabel)
    ax.set_ylabel("Encoder timestep")
    fig.tight_layout()
    return _fig_to_array(fig)


def plot_spectrogram(spectrogram: np.ndarray) -> np.ndarray:
    """[n_mels, T] → HWC image (reference plotting_utils.py:32-44)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(spectrogram, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("Frames")
    ax.set_ylabel("Channels")
    fig.tight_layout()
    return _fig_to_array(fig)


def plot_gate_outputs(gate_targets: np.ndarray,
                      gate_outputs: np.ndarray) -> np.ndarray:
    """Gate target/output scatter (reference plotting_utils.py:47-61)."""
    fig, ax = plt.subplots(figsize=(8, 3))
    x = np.arange(len(gate_targets))
    ax.scatter(x, gate_targets, alpha=0.5, color="green", marker="+",
               s=1, label="target")
    ax.scatter(x, gate_outputs, alpha=0.5, color="red", marker=".",
               s=1, label="predicted")
    ax.set_xlabel("Frames (Green target, Red predicted)")
    ax.set_ylabel("Gate State")
    fig.tight_layout()
    return _fig_to_array(fig)


class Tacotron2Logger:
    def __init__(self, logdir: str, vocoder_fn=None,
                 sampling_rate: int = 22050,
                 max_histograms: Optional[int] = None):
        """``vocoder_fn``: optional mel [1, n_mels, T] → wav [T'] used to log
        validation audio (the reference loads a hardcoded HiFi-GAN
        universal checkpoint for this, logger.py:21-36).
        ``max_histograms``: cap on per-validation parameter histograms
        (None = all leaves, matching the reference's logger.py:77-79)."""
        from tensorboardX import SummaryWriter
        self.writer = SummaryWriter(logdir)
        self.vocoder_fn = vocoder_fn
        self.sampling_rate = sampling_rate
        self.max_histograms = max_histograms

    def log_training(self, metrics: Dict[str, Any], learning_rate: float,
                     duration: float, iteration: int) -> None:
        scalars = {
            "training.loss": metrics.get("total"),
            "training.mel_loss": metrics.get("mel"),
            "training.gate_loss": metrics.get("gate"),
            "training.align_loss": metrics.get("align"),
            "training.align_bert_loss": metrics.get("align_bert"),
            "grad.norm": metrics.get("grad_norm"),
            "learning.rate": learning_rate,
            "duration": duration,
        }
        for k, v in scalars.items():
            if v is not None:
                self.writer.add_scalar(k, float(v), iteration)

    def log_validation(self, val_loss: float, params, outputs, batch,
                       iteration: int, max_images: int = 1) -> None:
        self.writer.add_scalar("validation.loss", float(val_loss), iteration)
        # parameter histograms (reference logger.py:77-79)
        import jax
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        cap = self.max_histograms
        if cap is not None and len(flat) > cap:
            print(f"[logger] histogram cap: logging {cap}/{len(flat)} "
                  "param leaves", flush=True)
            flat = flat[:cap]
        for path, value in flat:
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in path)
            self.writer.add_histogram(name, np.asarray(value), iteration)

        idx = np.random.randint(0, outputs["alignments"].shape[0])
        align = np.asarray(outputs["alignments"][idx])
        mel = np.asarray(outputs["mel_postnet"][idx])
        gate_t = np.asarray(batch["gate_target"][idx])
        gate_o = np.asarray(outputs["gate"][idx])
        self.writer.add_image("alignment", plot_alignment(align), iteration,
                              dataformats="HWC")
        if "alignments_bert" in outputs:
            self.writer.add_image(
                "alignment_bert",
                plot_alignment(np.asarray(outputs["alignments_bert"][idx])),
                iteration, dataformats="HWC")
        self.writer.add_image("mel_predicted", plot_spectrogram(mel),
                              iteration, dataformats="HWC")
        self.writer.add_image(
            "mel_target",
            plot_spectrogram(np.asarray(batch["mels"][idx])), iteration,
            dataformats="HWC")
        self.writer.add_image(
            "gate",
            plot_gate_outputs(gate_t, 1 / (1 + np.exp(-gate_o))),
            iteration, dataformats="HWC")
        if self.vocoder_fn is not None:
            try:
                wav = np.asarray(self.vocoder_fn(mel[None]))
                wav = wav.reshape(-1)
                self.writer.add_audio("validation_audio", wav, iteration,
                                      sample_rate=self.sampling_rate)
            except Exception as e:  # mirror reference try/except logger.py:85-95
                print(f"audio logging failed: {e}")

    def close(self):
        self.writer.close()
