"""HyNet descriptor loss tests: numpy oracle + descent smoke test."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gims_tpu.carhynet.loss import (
    hynet_loss, l2_distance_matrix, cal_fpr95, DIST_TH, EPS_SQRT,
)


def np_dist(x, y):
    return np.sqrt(np.abs(2 * (1 - x @ y.T)) + EPS_SQRT)


def np_hynet_loss(dl, dr, rl, rr, margin, alpha, is_sosr, knn=8):
    n = len(dl)
    eye = np.eye(n)
    L, R, LR = np_dist(dl, dl), np_dist(dr, dr), np_dist(dl, dr)
    msk = lambda M: M + 2 * eye + 2 * (M <= DIST_TH)
    iL = np.argsort(msk(L), axis=1)
    iR = np.argsort(msk(R), axis=0)
    iLR = np.argsort(msk(LR), axis=1)
    iRL = np.argsort(msk(LR), axis=0)
    ar = np.arange(n)
    dpos = LR[ar, ar]
    dneg = np.stack([
        L[ar, iL[:, 0]], R[iR[0], ar], LR[ar, iLR[:, 0]], LR[iRL[0], ar],
    ]).min(0)
    f = lambda d: d + d * d / 2 * alpha
    loss = np.maximum(margin + f(dpos) - f(dneg), 0).sum()
    nl = np.sqrt((rl**2).sum(1) + EPS_SQRT)
    nr = np.sqrt((rr**2).sum(1) + EPS_SQRT)
    loss += 0.1 * ((nl - nr) ** 2).sum()
    if is_sosr:
        A_l = np.zeros((n, n)); A_l[ar[:, None], iL[:, :knn]] = 1
        A_r = np.zeros((n, n)); A_r[iR[:knn, :], ar[None, :]] = 1
        A_lr = np.zeros((n, n))
        A_lr[ar[:, None], iLR[:, :knn]] = 1
        A_lr[iRL[:knn, :], ar[None, :]] = 1
        sym = lambda a: ((a + a.T) > 0).astype(float)
        A = ((sym(A_l) + sym(A_r) + sym(A_lr)) > 0) * (1 - eye)
        dif = (L - R) * A
        loss += np.sqrt((dif**2).sum(1) + EPS_SQRT).sum()
    return loss, dpos.mean(), dneg.mean()


@pytest.mark.parametrize("is_sosr", [False, True])
def test_loss_vs_oracle(rng, is_sosr):
    n, d = 24, 16
    rl = rng.randn(n, d).astype(np.float32)
    rr = (rl + rng.randn(n, d).astype(np.float32) * 0.3)
    dl = rl / np.linalg.norm(rl, axis=1, keepdims=True)
    dr = rr / np.linalg.norm(rr, axis=1, keepdims=True)
    want, wdp, wdn = np_hynet_loss(dl, dr, rl, rr, 1.2, 2.0, is_sosr)
    got, gdp, gdn = hynet_loss(
        jnp.asarray(dl), jnp.asarray(dr), jnp.asarray(rl), jnp.asarray(rr),
        1.2, 2.0, is_sosr,
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-4)
    np.testing.assert_allclose(float(gdp), wdp, rtol=1e-5)
    np.testing.assert_allclose(float(gdn), wdn, rtol=1e-5)


def test_distance_matrix(rng):
    x = rng.randn(5, 8).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    got = np.asarray(l2_distance_matrix(jnp.asarray(x), jnp.asarray(x)))
    # f32 vs f64 catastrophically cancels near the diagonal; atol covers it
    np.testing.assert_allclose(got, np_dist(x, x), rtol=1e-4, atol=1e-3)
    # diagonal ~ 0 (up to eps)
    assert (np.diag(got) < 2e-3).all()


def test_fpr95():
    pos = np.linspace(0.0, 1.0, 100)
    neg = np.linspace(0.5, 1.5, 100)
    rate = cal_fpr95(pos, neg)
    # threshold at 95th pct of pos ~= 0.95; negatives <= 0.95 ~= 45%
    assert 0.40 < rate < 0.50


def test_descriptor_training_descends():
    from gims_tpu.carhynet.train import train_descriptor

    losses = []
    train_descriptor(
        steps=6, batch_points=16, lr=3e-4, seed=0, log_every=1,
        log_fn=lambda s: losses.append(float(s.split("loss=")[1].split()[0])),
    )
    assert len(losses) == 6
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5  # not diverging
