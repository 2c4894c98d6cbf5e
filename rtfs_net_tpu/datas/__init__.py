"""Data pipeline (reference: ``src/datas/``)."""
from .avspeech_dataset import AVSpeechDataset, normalize_wav
from .transform import get_preprocessing_pipelines
from .loader import DataLoader, default_collate
from . import wavio

__all__ = [
    "AVSpeechDataset",
    "normalize_wav",
    "get_preprocessing_pipelines",
    "DataLoader",
    "default_collate",
    "wavio",
]
