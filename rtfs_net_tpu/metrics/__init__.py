"""Evaluation metrics (reference: ``src/metrics/``)."""
from .allwrapper import ALLMetricsTracker
from .stoi import stoi
from .pesq import pesq

__all__ = ["ALLMetricsTracker", "stoi", "pesq"]
