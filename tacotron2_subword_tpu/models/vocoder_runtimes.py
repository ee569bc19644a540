"""Alternative vocoder runtimes: ONNX and TFLite HiFi-GAN inference.

The reference offers onnxruntime / tf.lite sessions as drop-in HiFi-GAN
back-ends (reference inference.py:208-238, best_checkpoint.py:230-260).

The TFLite path is fully functional here: tools/export_hifigan_tflite.py
exports the JAX generator via jax2tf, and ``load_tflite_vocoder`` runs the
flatbuffer through tf.lite.Interpreter (roundtrip-verified to ~1e-5,
tests/test_vocoders.py::test_tflite_export_roundtrip).  onnxruntime is not
installed in this image, so that loader degrades with a clear error; when
it is importable the same call signature works.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def load_onnx_vocoder(model_path: str) -> Callable[[np.ndarray], np.ndarray]:
    """Returns vocode_fn: mel [B, 80, T] float32 → wav [B, T'].
    Mirror of the reference's hifigan_onnx_infer (inference.py:208-223)."""
    try:
        import onnxruntime
    except ImportError as e:
        raise RuntimeError(
            "onnxruntime is not installed in this environment; use the "
            "native JAX HiFi-GAN (models.hifigan) or install onnxruntime"
        ) from e
    sess = onnxruntime.InferenceSession(model_path)
    input_name = sess.get_inputs()[0].name

    def vocode(mel: np.ndarray) -> np.ndarray:
        out = sess.run(None, {input_name: mel.astype(np.float32)})[0]
        return out.reshape(out.shape[0], -1)

    return vocode


def load_tflite_vocoder(model_path: str) -> Callable[[np.ndarray], np.ndarray]:
    """Mirror of the reference's TFLite interpreter path
    (best_checkpoint.py:230-260)."""
    try:
        import tensorflow as tf
    except ImportError as e:
        raise RuntimeError(
            "tensorflow is not installed in this environment; use the "
            "native JAX HiFi-GAN (models.hifigan) or install tensorflow"
        ) from e
    interp = tf.lite.Interpreter(model_path=model_path)

    def vocode(mel: np.ndarray) -> np.ndarray:
        interp.resize_tensor_input(interp.get_input_details()[0]["index"],
                                   mel.shape)
        interp.allocate_tensors()
        interp.set_tensor(interp.get_input_details()[0]["index"],
                          mel.astype(np.float32))
        interp.invoke()
        out = interp.get_tensor(interp.get_output_details()[0]["index"])
        return out.reshape(out.shape[0], -1)

    return vocode
