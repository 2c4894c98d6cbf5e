"""SDR-family losses (reference: ``src/losses/matrix.py``).

Pure functions over (B, n_src, T) arrays; all jit/grad-safe. EPS and
zero-mean/log semantics match the reference exactly (train loss =
pairwise neg-SNR, val/test = pairwise neg-SI-SDR).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp

EPS = 1e-8


def pairwise_neg_sdr(ests, targets, sdr_type: str = "sisdr",
                     zero_mean: bool = True, take_log: bool = True):
    """(B, n_src, T) x (B, n_src, T) -> (B, est_src, target_src) loss matrix."""
    assert ests.ndim == 3 and ests.shape == targets.shape
    if zero_mean:
        targets = targets - jnp.mean(targets, axis=2, keepdims=True)
        ests = ests - jnp.mean(ests, axis=2, keepdims=True)
    s_target = targets[:, None, :, :]  # (B, 1, n_src, T)
    s_est = ests[:, :, None, :]  # (B, n_src, 1, T)
    if sdr_type in ("sisdr", "sdsdr"):
        dot = jnp.sum(s_est * s_target, axis=3, keepdims=True)
        energy = jnp.sum(s_target ** 2, axis=3, keepdims=True) + EPS
        proj = dot * s_target / energy
    else:
        B, n_src, T = ests.shape
        proj = jnp.broadcast_to(s_target, (B, n_src, n_src, T))
    if sdr_type in ("sdsdr", "snr"):
        e_noise = s_est - s_target
    else:
        e_noise = s_est - proj
    ratio = jnp.sum(proj ** 2, axis=3) / (jnp.sum(e_noise ** 2, axis=3) + EPS)
    if take_log:
        ratio = 10 * jnp.log10(ratio + EPS)
    return -ratio


def singlesrc_neg_sdr(ests, targets, sdr_type: str = "sisdr",
                      zero_mean: bool = True, take_log: bool = True):
    """(B, T) x (B, T) -> (B,) losses."""
    assert ests.ndim == 2 and ests.shape == targets.shape
    if zero_mean:
        targets = targets - jnp.mean(targets, axis=1, keepdims=True)
        ests = ests - jnp.mean(ests, axis=1, keepdims=True)
    if sdr_type in ("sisdr", "sdsdr"):
        dot = jnp.sum(ests * targets, axis=1, keepdims=True)
        energy = jnp.sum(targets ** 2, axis=1, keepdims=True) + EPS
        scaled = dot * targets / energy
    else:
        scaled = targets
    e_noise = ests - targets if sdr_type in ("sdsdr", "snr") else ests - scaled
    ratio = jnp.sum(scaled ** 2, axis=1) / (jnp.sum(e_noise ** 2, axis=1) + EPS)
    if take_log:
        ratio = 10 * jnp.log10(ratio + EPS)
    return -ratio


def multisrc_neg_sdr(ests, targets, sdr_type: str = "sisdr",
                     zero_mean: bool = True, take_log: bool = True):
    """(B, n_src, T) -> (B,) per-batch mean over aligned sources."""
    assert ests.ndim == 3 and ests.shape == targets.shape
    if zero_mean:
        targets = targets - jnp.mean(targets, axis=2, keepdims=True)
        ests = ests - jnp.mean(ests, axis=2, keepdims=True)
    if sdr_type in ("sisdr", "sdsdr"):
        dot = jnp.sum(ests * targets, axis=2, keepdims=True)
        energy = jnp.sum(targets ** 2, axis=2, keepdims=True) + EPS
        scaled = dot * targets / energy
    else:
        scaled = targets
    e_noise = ests - targets if sdr_type in ("sdsdr", "snr") else ests - scaled
    ratio = jnp.sum(scaled ** 2, axis=2) / (jnp.sum(e_noise ** 2, axis=2) + EPS)
    if take_log:
        ratio = 10 * jnp.log10(ratio + EPS)
    return -jnp.mean(ratio, axis=-1)


# aliases mirroring the reference's module-level loss instances
pairwise_neg_sisdr = functools.partial(pairwise_neg_sdr, sdr_type="sisdr")
pairwise_neg_sdsdr = functools.partial(pairwise_neg_sdr, sdr_type="sdsdr")
pairwise_neg_snr = functools.partial(pairwise_neg_sdr, sdr_type="snr")
singlesrc_neg_sisdr = functools.partial(singlesrc_neg_sdr, sdr_type="sisdr")
singlesrc_neg_sdsdr = functools.partial(singlesrc_neg_sdr, sdr_type="sdsdr")
singlesrc_neg_snr = functools.partial(singlesrc_neg_sdr, sdr_type="snr")
multisrc_neg_sisdr = functools.partial(multisrc_neg_sdr, sdr_type="sisdr")
multisrc_neg_sdsdr = functools.partial(multisrc_neg_sdr, sdr_type="sdsdr")
multisrc_neg_snr = functools.partial(multisrc_neg_sdr, sdr_type="snr")
