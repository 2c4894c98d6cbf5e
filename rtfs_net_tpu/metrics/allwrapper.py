"""Per-utterance metric tracker streaming to CSV
(reference: ``src/metrics/allwrapper.py``).

Computes SI-SNR(i) and SNR-SDR(i) via the PIT wrappers against the
mixture baseline, plus PESQ and STOI, one row per utterance with final
mean/std rows. All metric values are stored as positive dB improvements
(the reference's CSV writes some columns negated — accumulators here and
there agree).
"""
from __future__ import annotations

import csv
import numpy as np
import jax.numpy as jnp

from ..losses import PITLossWrapper, pairwise_neg_sisdr, pairwise_neg_snr
from .pesq import pesq
from .stoi import stoi


class ALLMetricsTracker:
    COLUMNS = ["snt_id", "sdr", "sdr_i", "si-snr", "si-snr_i", "pesq", "stoi"]

    def __init__(self, save_file: str = ""):
        self.all_sdrs = []
        self.all_sdrs_i = []
        self.all_sisnrs = []
        self.all_sisnrs_i = []
        self.all_pesqs = []
        self.all_stois = []
        self._fh = open(save_file, "w", newline="") if save_file else None
        self.writer = csv.DictWriter(self._fh, fieldnames=self.COLUMNS) if self._fh else None
        if self.writer:
            self.writer.writeheader()
        self.pit_snr = PITLossWrapper(pairwise_neg_snr, pit_from="pw_mtx")
        self.pit_sisnr = PITLossWrapper(pairwise_neg_sisdr, pit_from="pw_mtx")

    def __call__(self, mix, clean, estimate, key, sample_rate: int = 16000):
        """mix: (L,); clean/estimate: (n_src, L); key: utterance id."""
        mix = jnp.asarray(mix)
        clean = jnp.asarray(clean)
        estimate = jnp.asarray(estimate)

        sisnr = float(self.pit_sisnr(estimate[None], clean[None]))
        mix_rep = jnp.stack([mix] * clean.shape[0], axis=0)
        sisnr_base = float(self.pit_sisnr(mix_rep[None], clean[None]))
        sisnr_i = sisnr - sisnr_base

        sdr = float(self.pit_snr(estimate[None], clean[None]))
        sdr_base = float(self.pit_snr(mix_rep[None], clean[None]))
        sdr_i = sdr - sdr_base

        est0 = np.asarray(estimate[0] if estimate.ndim > 1 else estimate)
        cln0 = np.asarray(clean[0] if clean.ndim > 1 else clean)
        _pesq = pesq(est0, cln0, sample_rate)
        _stoi = stoi(cln0, est0, sample_rate, extended=False)

        row = {
            "snt_id": key,
            "sdr": -sdr,
            "sdr_i": -(sdr - sdr_base),
            "si-snr": -sisnr,
            "si-snr_i": -sisnr_i,
            "pesq": _pesq,
            "stoi": _stoi,
        }
        self.key = key
        if self.writer:
            self.writer.writerow(row)
        self.all_sdrs.append(-sdr)
        self.all_sdrs_i.append(-sdr_i)
        self.all_sisnrs.append(-sisnr)
        self.all_sisnrs_i.append(-sisnr_i)
        self.all_pesqs.append(_pesq)
        self.all_stois.append(_stoi)

    def get_mean(self):
        return {
            "sdr": float(np.mean(self.all_sdrs)),
            "sdr_i": float(np.mean(self.all_sdrs_i)),
            "si-snr": float(np.mean(self.all_sisnrs)),
            "si-snr_i": float(np.mean(self.all_sisnrs_i)),
            "pesq": float(np.nanmean(self.all_pesqs)),
            "stoi": float(np.mean(self.all_stois)),
        }

    def get_std(self):
        return {
            "sdr": float(np.std(self.all_sdrs)),
            "sdr_i": float(np.std(self.all_sdrs_i)),
            "si-snr": float(np.std(self.all_sisnrs)),
            "si-snr_i": float(np.std(self.all_sisnrs_i)),
            "pesq": float(np.nanstd(self.all_pesqs)),
            "stoi": float(np.std(self.all_stois)),
        }

    def final(self):
        if self.writer:
            mean = self.get_mean()
            std = self.get_std()
            self.writer.writerow({"snt_id": "avg", **{k: v for k, v in mean.items()}})
            self.writer.writerow({"snt_id": "std", **{k: v for k, v in std.items()}})
            self._fh.close()
            self.writer = None
