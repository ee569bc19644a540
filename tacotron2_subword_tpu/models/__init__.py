from tacotron2_subword_tpu.models import attention, tacotron2

__all__ = ["attention", "tacotron2"]
