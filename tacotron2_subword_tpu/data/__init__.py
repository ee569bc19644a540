from tacotron2_subword_tpu.data.dataset import (
    BertTacotron2Dataset,
    BucketedLoader,
    create_alignment_target,
    pad_batch,
)

__all__ = [
    "BertTacotron2Dataset",
    "BucketedLoader",
    "create_alignment_target",
    "pad_batch",
]
