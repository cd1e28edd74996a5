from multimodal_unlearning_tpu.data.tokenizer import ByteTokenizer, load_tokenizer
from multimodal_unlearning_tpu.data.processor import MMProcessor
from multimodal_unlearning_tpu.data.datasets import (
    ImageCaptioningDataset,
    MMDatasetQA,
    MMMixedDataset,
    MMMixedForgetDataset,
    SyntheticClearData,
)
from multimodal_unlearning_tpu.data.loader import DataLoader

__all__ = [
    "ByteTokenizer",
    "load_tokenizer",
    "MMProcessor",
    "MMDatasetQA",
    "ImageCaptioningDataset",
    "MMMixedDataset",
    "MMMixedForgetDataset",
    "SyntheticClearData",
    "DataLoader",
]
