"""Mouth-ROI video transforms (reference: ``src/datas/transform.py``).

numpy-native (cv2 only needed for RGB->gray conversion, which the LRS/Vox
mouth crops don't use — they ship grayscale npz). Train: Normalize(0,255)
-> RandomCrop(88x88) -> HFlip(0.5) -> Normalize(.421,.165); val/test:
CenterCrop instead of random ops.
"""
from __future__ import annotations

import random
from typing import Sequence, Tuple

import numpy as np


class Compose:
    def __init__(self, preprocess: Sequence):
        self.preprocess = list(preprocess)

    def __call__(self, sample):
        for t in self.preprocess:
            sample = t(sample)
        return sample


class RgbToGray:
    def __call__(self, frames):
        import cv2

        return np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in frames], axis=0)


class Normalize:
    def __init__(self, mean: float, std: float):
        self.mean = mean
        self.std = std

    def __call__(self, frames):
        return (frames - self.mean) / self.std


class CenterCrop:
    def __init__(self, size: Tuple[int, int]):
        self.size = size

    def __call__(self, frames):
        t, h, w = frames.shape
        th, tw = self.size
        dh = int(round(h - th) / 2.0)
        dw = int(round(w - tw) / 2.0)
        return frames[:, dh:dh + th, dw:dw + tw]


class RandomCrop:
    def __init__(self, size: Tuple[int, int]):
        self.size = size

    def __call__(self, frames):
        t, h, w = frames.shape
        th, tw = self.size
        dh = random.randint(0, h - th)
        dw = random.randint(0, w - tw)
        return frames[:, dh:dh + th, dw:dw + tw]


class HorizontalFlip:
    def __init__(self, flip_ratio: float):
        self.flip_ratio = flip_ratio

    def __call__(self, frames):
        if random.random() < self.flip_ratio:
            return np.ascontiguousarray(frames[:, :, ::-1])
        return frames


# net affine of the reference chain Normalize(0,255) -> Normalize(.421,.165):
# x/255/0.165 - 0.421/0.165 == (x - MOUTH_MEAN) / MOUTH_STD on raw uint8
MOUTH_MEAN = 0.421 * 255.0
MOUTH_STD = 0.165 * 255.0


def get_preprocessing_pipelines(device_normalize: bool = False):
    """Reference pipelines (``transform.py:151-167``). With
    ``device_normalize=True`` the val/test pipelines keep frames as raw
    uint8 (crop only) so the host->device transfer carries 1 byte/pixel;
    apply ``normalize_mouths`` on-device after upload (the normalization
    is one affine — see MOUTH_MEAN/MOUTH_STD)."""
    crop_size = (88, 88)
    mean, std = 0.421, 0.165
    pipelines = {
        "train": Compose([
            Normalize(0.0, 255.0),
            RandomCrop(crop_size),
            HorizontalFlip(0.5),
            Normalize(mean, std),
        ]),
        "val": Compose([Normalize(0.0, 255.0), CenterCrop(crop_size), Normalize(mean, std)]),
        "test": Compose([Normalize(0.0, 255.0), CenterCrop(crop_size), Normalize(mean, std)]),
    }
    if device_normalize:
        crop_only = Compose([CenterCrop(crop_size)])
        pipelines["val"] = crop_only
        pipelines["test"] = crop_only
    return pipelines


def normalize_mouths(frames):
    """On-device equivalent of the host Normalize chain, for uint8 frames
    uploaded via the ``device_normalize`` pipelines. Works on jax or
    numpy arrays; float inputs pass through unchanged (already
    normalized on host)."""
    if frames.dtype == np.uint8 or str(frames.dtype) == "uint8":
        return (frames.astype(np.float32) - MOUTH_MEAN) / MOUTH_STD
    return frames
