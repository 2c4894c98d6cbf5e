"""Loss parity vs inline torch replicas of the reference formulas
(matrix.py / pit_wrapper.py), plus PIT invariants."""
from itertools import permutations

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rtfs_net_tpu.losses import (
    PITLossWrapper,
    pairwise_neg_sdr,
    singlesrc_neg_sdr,
    multisrc_neg_sdr,
    pairwise_neg_sisdr,
    pairwise_neg_snr,
)

EPS = 1e-8


def torch_pairwise_neg_sdr(ests, targets, sdr_type, zero_mean=True, take_log=True):
    """Inline replica of PairwiseNegSDR.forward (matrix.py:13-60)."""
    if zero_mean:
        targets = targets - targets.mean(dim=2, keepdim=True)
        ests = ests - ests.mean(dim=2, keepdim=True)
    s_target = targets.unsqueeze(1)
    s_estimate = ests.unsqueeze(2)
    if sdr_type in ("sisdr", "sdsdr"):
        dot = torch.sum(s_estimate * s_target, dim=3, keepdim=True)
        energy = torch.sum(s_target ** 2, dim=3, keepdim=True) + EPS
        proj = dot * s_target / energy
    else:
        proj = s_target.repeat(1, s_target.shape[2], 1, 1)
    e_noise = s_estimate - s_target if sdr_type in ("sdsdr", "snr") else s_estimate - proj
    sdr = torch.sum(proj ** 2, dim=3) / (torch.sum(e_noise ** 2, dim=3) + EPS)
    if take_log:
        sdr = 10 * torch.log10(sdr + EPS)
    return -sdr


@pytest.mark.parametrize("sdr_type", ["snr", "sisdr", "sdsdr"])
def test_pairwise_neg_sdr(rng, sdr_type):
    ests = rng.standard_normal((3, 2, 500)).astype(np.float32)
    targets = rng.standard_normal((3, 2, 500)).astype(np.float32)
    golden = torch_pairwise_neg_sdr(
        torch.from_numpy(ests), torch.from_numpy(targets), sdr_type
    ).numpy()
    got = pairwise_neg_sdr(jnp.asarray(ests), jnp.asarray(targets), sdr_type)
    np.testing.assert_allclose(np.asarray(got), golden, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("sdr_type", ["snr", "sisdr"])
def test_singlesrc_multisrc(rng, sdr_type):
    ests = rng.standard_normal((3, 2, 400)).astype(np.float32)
    targets = rng.standard_normal((3, 2, 400)).astype(np.float32)
    # singlesrc: diagonal of pairwise with matched sources
    got_single = singlesrc_neg_sdr(
        jnp.asarray(ests[:, 0]), jnp.asarray(targets[:, 0]), sdr_type
    )
    golden = torch_pairwise_neg_sdr(
        torch.from_numpy(ests[:, :1]), torch.from_numpy(targets[:, :1]), sdr_type
    )[:, 0, 0].numpy()
    np.testing.assert_allclose(np.asarray(got_single), golden, rtol=1e-4, atol=1e-4)
    # multisrc = mean of per-source singlesrc
    got_multi = multisrc_neg_sdr(jnp.asarray(ests), jnp.asarray(targets), sdr_type)
    ref = np.stack([
        np.asarray(singlesrc_neg_sdr(jnp.asarray(ests[:, i]), jnp.asarray(targets[:, i]), sdr_type))
        for i in range(2)
    ]).mean(axis=0)
    np.testing.assert_allclose(np.asarray(got_multi), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n_src", [1, 2, 3])
def test_pit_picks_best_permutation(rng, n_src):
    B, T = 4, 300
    targets = rng.standard_normal((B, n_src, T)).astype(np.float32)
    # estimates = permuted targets + noise: best perm must undo the shuffle
    perm = list(range(n_src))[::-1]
    ests = targets[:, perm] + 0.01 * rng.standard_normal((B, n_src, T)).astype(np.float32)

    pit = PITLossWrapper(pairwise_neg_sisdr, pit_from="pw_mtx")
    loss, reordered = pit(jnp.asarray(ests), jnp.asarray(targets), return_ests=True)

    # brute force over permutations
    best = np.inf
    for p in permutations(range(n_src)):
        mtx = np.asarray(pairwise_neg_sisdr(jnp.asarray(ests), jnp.asarray(targets)))
        val = np.mean([mtx[:, p[i], i] for i in range(n_src)], axis=0).mean()
        best = min(best, val)
    np.testing.assert_allclose(float(loss), best, rtol=1e-5)

    # reordered estimates align with targets
    aligned = np.asarray(reordered)
    np.testing.assert_allclose(aligned, targets, atol=0.05)


def test_pit_matches_torch_reference_impl(rng):
    """Full PIT path vs an inline replica of pit_wrapper.py's factorial
    einsum on the same pairwise matrix."""
    B, n_src, T = 3, 2, 200
    ests = rng.standard_normal((B, n_src, T)).astype(np.float32)
    targets = rng.standard_normal((B, n_src, T)).astype(np.float32)

    pwl = torch_pairwise_neg_sdr(torch.from_numpy(ests), torch.from_numpy(targets), "snr")
    pwl_t = pwl.transpose(-1, -2)
    perms = torch.tensor(list(permutations(range(n_src))), dtype=torch.long)
    idx = torch.unsqueeze(perms, 2)
    one_hot = pwl_t.new_zeros((*perms.size(), n_src)).scatter_(2, idx, 1)
    loss_set = torch.einsum("bij,pij->bp", [pwl_t, one_hot]) / n_src
    golden = loss_set.min(dim=1)[0].mean().item()

    pit = PITLossWrapper(pairwise_neg_snr, pit_from="pw_mtx")
    got = float(pit(jnp.asarray(ests), jnp.asarray(targets)))
    np.testing.assert_allclose(got, golden, rtol=1e-5)


def test_pit_pw_pt_and_perm_avg_agree(rng):
    B, n_src, T = 2, 2, 150
    ests = rng.standard_normal((B, n_src, T)).astype(np.float32)
    targets = rng.standard_normal((B, n_src, T)).astype(np.float32)
    l_mtx = PITLossWrapper(pairwise_neg_sisdr, "pw_mtx")(jnp.asarray(ests), jnp.asarray(targets))
    l_pt = PITLossWrapper(
        lambda e, t: singlesrc_neg_sdr(e, t, "sisdr"), "pw_pt"
    )(jnp.asarray(ests), jnp.asarray(targets))
    l_avg = PITLossWrapper(
        lambda e, t: multisrc_neg_sdr(e, t, "sisdr"), "perm_avg"
    )(jnp.asarray(ests), jnp.asarray(targets))
    np.testing.assert_allclose(float(l_mtx), float(l_pt), rtol=1e-5)
    np.testing.assert_allclose(float(l_mtx), float(l_avg), rtol=1e-5)


def test_pit_hungarian_n_src_4(rng):
    B, n_src, T = 2, 4, 100
    targets = rng.standard_normal((B, n_src, T)).astype(np.float32)
    perm = [3, 0, 2, 1]
    ests = targets[:, perm] + 0.01 * rng.standard_normal((B, n_src, T)).astype(np.float32)
    pit = PITLossWrapper(pairwise_neg_sisdr, "pw_mtx")
    loss, reordered = pit(jnp.asarray(ests), jnp.asarray(targets), return_ests=True)
    np.testing.assert_allclose(np.asarray(reordered), targets, atol=0.05)
    assert float(loss) < -20  # near-perfect alignment
