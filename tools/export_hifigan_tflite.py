"""Export the JAX HiFi-GAN generator to a .tflite flatbuffer (the reference
consumes TFLite HiFi-GANs at inference, reference best_checkpoint.py:230-260;
this tool closes the producer side with jax2tf → TFLiteConverter).

    python tools/export_hifigan_tflite.py --out hifigan.tflite \
        [--checkpoint g_00000000 --config config_v1.json] \
        [--frames 256] [--batch 1]

The exported model has a FIXED [batch, 80, frames] input (the TFLite
converter rejects the polymorphic-shape path with a tfl.squeeze
constraint error in this TF build); pad mels to ``--frames`` and slice the
waveform, as apps/inference.vocode_bucketed does for the jitted vocoders.
Verified against the JAX generator to ~1e-11 by
tests/test_vocoders.py::test_tflite_export_roundtrip.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

if not __package__:
    try:
        import tacotron2_subword_tpu  # noqa: F401 -- installed package
    except ImportError:  # running from a source checkout
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_tflite(params, h, out_path: str, frames: int = 256,
                  batch: int = 1) -> int:
    """Convert generator_apply(params, h, ·) at a fixed input shape to a
    .tflite flatbuffer; returns the blob size in bytes."""
    import jax
    from jax.experimental import jax2tf
    import tensorflow as tf
    from tacotron2_subword_tpu.models import hifigan as HG

    f = jax2tf.convert(lambda m: HG.generator_apply(params, h, m))
    tff = tf.function(
        f, input_signature=[tf.TensorSpec([batch, h.num_mels, frames],
                                          tf.float32)], autograph=False)
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [tff.get_concrete_function()], tff)
    conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS,
                                      tf.lite.OpsSet.SELECT_TF_OPS]
    blob = conv.convert()
    with open(out_path, "wb") as fo:
        fo.write(blob)
    return len(blob)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="torch HiFi-GAN checkpoint ({'generator': ...}); "
                         "random init when absent")
    ap.add_argument("--config", default=None, help="config_v1.json-style")
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from tacotron2_subword_tpu.models import hifigan as HG

    h = (HG.HifiganConfig.from_json(args.config) if args.config
         else HG.HifiganConfig())
    if args.checkpoint:
        import torch
        sd = torch.load(args.checkpoint, map_location="cpu",
                        weights_only=False)
        sd = sd.get("generator", sd)
        params = HG.fuse_generator(HG.import_torch_generator(
            {k: v.numpy() for k, v in sd.items()}, h))
    else:
        params = HG.fuse_generator(
            HG.init_generator(jax.random.PRNGKey(0), h))
    n = export_tflite(params, h, args.out, args.frames, args.batch)
    print(f"wrote {args.out}: {n} bytes, input "
          f"[{args.batch}, {h.num_mels}, {args.frames}]")


if __name__ == "__main__":
    main()
