"""tacotron2_subword_tpu — a TPU-native (JAX/XLA/Pallas) re-implementation of
the capabilities of PhucNguyenAH/tacotron2_subword: a dual-stream (phoneme +
subword) Tacotron 2 Vietnamese TTS stack with BERT sentence conditioning,
HiFi-GAN / WaveGlow vocoders, G2P text front-end, and distributed training
over JAX device meshes.
"""

from tacotron2_subword_tpu.config import TacotronConfig, create_config

__all__ = ["TacotronConfig", "create_config"]
__version__ = "0.1.0"
