"""Alternative vocoder runtimes: ONNX and TFLite HiFi-GAN inference.

The reference offers onnxruntime / tf.lite sessions as drop-in HiFi-GAN
back-ends (reference inference.py:208-238, best_checkpoint.py:230-260).

The TFLite path is fully functional here: tools/export_hifigan_tflite.py
exports the JAX generator via jax2tf, and ``load_tflite_vocoder`` runs the
flatbuffer through tf.lite.Interpreter (roundtrip-verified to ~1e-5,
tests/test_vocoders.py::test_tflite_export_roundtrip).  The ONNX path is
produced by tools/export_hifigan_onnx.py (ModelProto emitted natively via
utils/onnx_lite.py) and served by ``load_onnx_vocoder`` — through
onnxruntime when importable, otherwise through the bundled numpy executor
(same op semantics; roundtrip-verified by test_onnx_export_roundtrip).
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def load_onnx_vocoder(model_path: str) -> Callable[[np.ndarray], np.ndarray]:
    """Returns vocode_fn: mel [B, 80, T] float32 → wav [B, T'].
    Mirror of the reference's hifigan_onnx_infer (inference.py:208-223).

    Uses onnxruntime when importable; otherwise falls back to the native
    numpy executor in utils/onnx_lite (Conv/ConvTranspose/LeakyRelu/Tanh/
    Add/Mul — the full HiFi-GAN generator op set)."""
    try:
        import onnxruntime
    except ImportError:
        from tacotron2_subword_tpu.utils import onnx_lite as OX
        with open(model_path, "rb") as f:
            decoded = OX.decode_model(f.read())

        def vocode_np(mel: np.ndarray) -> np.ndarray:
            nodes, inits, in_names, _ = decoded
            out = OX.run_model(decoded,
                               {in_names[0]: mel.astype(np.float32)})[0]
            return out.reshape(out.shape[0], -1)

        return vocode_np
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
