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


def get_preprocessing_pipelines():
    crop_size = (88, 88)
    mean, std = 0.421, 0.165
    return {
        "train": Compose([
            Normalize(0.0, 255.0),
            RandomCrop(crop_size),
            HorizontalFlip(0.5),
            Normalize(mean, std),
        ]),
        "val": Compose([Normalize(0.0, 255.0), CenterCrop(crop_size), Normalize(mean, std)]),
        "test": Compose([Normalize(0.0, 255.0), CenterCrop(crop_size), Normalize(mean, std)]),
    }
