"""Soft-DTW tests: parity vs an independent numpy DP and vs the reference's
CPU implementation semantics; gradient correctness; Pallas kernel parity."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_subword_tpu.ops import softdtw as SD


def np_softdtw(D, gamma=1.0, bandwidth=0.0):
    """Direct numpy DP implementing the reference recursion
    (soft_dtw_cuda.py:186-208 CPU kernel semantics)."""
    B, N, M = D.shape
    R = np.full((B, N + 2, M + 2), np.inf)
    R[:, 0, 0] = 0.0
    for b in range(B):
        for j in range(1, M + 1):
            for i in range(1, N + 1):
                if 0 < bandwidth < abs(i - j):
                    continue
                r0 = -R[b, i - 1, j - 1] / gamma
                r1 = -R[b, i - 1, j] / gamma
                r2 = -R[b, i, j - 1] / gamma
                rmax = max(r0, r1, r2)
                rsum = (math.exp(r0 - rmax) + math.exp(r1 - rmax)
                        + math.exp(r2 - rmax))
                softmin = -gamma * (math.log(rsum) + rmax)
                R[b, i, j] = D[b, i - 1, j - 1] + softmin
    return R[:, N, M]


@pytest.mark.parametrize("shape", [(2, 5, 7), (3, 8, 8), (1, 12, 4)])
def test_forward_matches_numpy_dp(shape):
    rng = np.random.RandomState(0)
    D = rng.rand(*shape).astype(np.float32) * 4
    out = np.asarray(SD.softdtw(jnp.asarray(D), 1.0, 0.0))
    ref = np_softdtw(D)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("gamma", [0.1, 1.0, 4.0])
def test_forward_gamma(gamma):
    rng = np.random.RandomState(1)
    D = rng.rand(2, 6, 9).astype(np.float32)
    out = np.asarray(SD.softdtw(jnp.asarray(D), gamma, 0.0))
    np.testing.assert_allclose(out, np_softdtw(D, gamma), rtol=1e-4,
                               atol=1e-4)


def test_forward_bandwidth_pruning():
    rng = np.random.RandomState(2)
    D = rng.rand(2, 10, 10).astype(np.float32)
    out = np.asarray(SD.softdtw(jnp.asarray(D), 1.0, 3.0))
    np.testing.assert_allclose(out, np_softdtw(D, 1.0, 3.0), rtol=1e-4,
                               atol=1e-4)


def test_gradient_matches_finite_differences():
    rng = np.random.RandomState(3)
    D = rng.rand(1, 5, 6).astype(np.float64) * 2

    f = lambda d: jnp.sum(SD.softdtw(d, 1.0, 0.0))
    grad = np.asarray(jax.grad(f)(jnp.asarray(D, jnp.float32)))

    eps = 1e-3
    for (i, j) in [(0, 0), (2, 3), (4, 5), (1, 1)]:
        Dp, Dm = D.copy(), D.copy()
        Dp[0, i, j] += eps
        Dm[0, i, j] -= eps
        fd = (np_softdtw(Dp)[0] - np_softdtw(Dm)[0]) / (2 * eps)
        np.testing.assert_allclose(grad[0, i, j], fd, rtol=2e-2, atol=2e-3)


def test_gradient_matches_torch_reference_cpu():
    """End-to-end gradient through the euclidean distance vs the reference
    CPU autograd implementation run from /root/reference (numba-free: we
    re-derive with torch autograd on the same recursion via our numpy DP is
    not differentiable, so compare against finite differences of the full
    pipeline instead)."""
    rng = np.random.RandomState(4)
    x = rng.randn(2, 6, 3).astype(np.float32)
    y = rng.randn(2, 8, 3).astype(np.float32)

    f = lambda xx: jnp.sum(SD.softdtw_distance(xx, jnp.asarray(y), gamma=1.0))
    grad = np.asarray(jax.grad(f)(jnp.asarray(x)))

    eps = 1e-2
    for idx in [(0, 0, 0), (1, 3, 2), (0, 5, 1)]:
        xp, xm = x.copy(), x.copy()
        xp[idx] += eps
        xm[idx] -= eps
        Dp = np.asarray(SD.euclidean_dist_matrix(jnp.asarray(xp),
                                                 jnp.asarray(y)))
        Dm = np.asarray(SD.euclidean_dist_matrix(jnp.asarray(xm),
                                                 jnp.asarray(y)))
        fd = (np_softdtw(Dp).sum() - np_softdtw(Dm).sum()) / (2 * eps)
        np.testing.assert_allclose(grad[idx], fd, rtol=5e-2, atol=5e-3)


def test_normalized_distance_is_zero_for_identical():
    rng = np.random.RandomState(5)
    x = rng.randn(2, 7, 4).astype(np.float32)
    d = np.asarray(SD.softdtw_distance(jnp.asarray(x), jnp.asarray(x),
                                       gamma=1.0, normalize=True))
    np.testing.assert_allclose(d, 0.0, atol=1e-3)


def test_pallas_kernel_matches_scan():
    rng = np.random.RandomState(6)
    D = rng.rand(3, 8, 11).astype(np.float32) * 3
    ref = np.asarray(SD.softdtw(jnp.asarray(D), 1.0, 0.0))
    out = np.asarray(SD.softdtw_pallas(jnp.asarray(D), 1.0, 0.0,
                                       interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_kernel_bandwidth():
    rng = np.random.RandomState(7)
    D = rng.rand(2, 9, 9).astype(np.float32)
    ref = np_softdtw(D, 1.0, 2.0)
    out = np.asarray(SD.softdtw_pallas(jnp.asarray(D), 1.0, 2.0,
                                       interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_banded_gradient_no_nans_and_matches_fd():
    """Regression: with bandwidth > 0 the backward used to propagate NaNs
    from banned cells (R=-INF successors) across the whole E matrix."""
    rng = np.random.default_rng(5)
    D = jnp.asarray(rng.standard_normal((2, 14, 14)).astype(np.float32) ** 2)
    bw = 4.0
    g = jax.grad(lambda d: jnp.sum(SD.softdtw(d, 1.0, bw)))(D)
    assert not bool(jnp.isnan(g).any())
    # finite differences on a few in-band entries
    f = lambda d: float(jnp.sum(SD.softdtw(d, 1.0, bw)))
    eps = 1e-2
    for (b, i, j) in [(0, 3, 3), (1, 5, 7), (0, 10, 8)]:
        fd = (f(D.at[b, i, j].add(eps)) - f(D.at[b, i, j].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g[b, i, j]), fd, rtol=5e-2, atol=1e-3)
    # banned cells have exactly zero gradient
    band = np.abs(np.arange(1, 15)[:, None] - np.arange(1, 15)[None, :]) <= bw
    assert float(jnp.abs(jnp.where(jnp.asarray(band)[None], 0.0, g)).max()) == 0.0


@pytest.mark.parametrize("shape,bw", [((3, 17, 15), 0.0), ((2, 24, 24), 5.0),
                                      ((2, 20, 30), 12.0)])
def test_pallas_fused_grad_matches_scan(shape, bw):
    """The fused Pallas forward+backward kernel (interpret mode in CI; run
    on real TPU by tools/tpu_kernel_evidence.py) must reproduce the scan
    custom-VJP exactly."""
    rng = np.random.default_rng(0)
    B, N, M = shape
    x = jnp.asarray(rng.standard_normal((B, N, 2), dtype=np.float32))
    y = jnp.asarray(rng.standard_normal((B, M, 2), dtype=np.float32))
    D = SD.euclidean_dist_matrix(x, y)
    v_scan, g_scan = jax.value_and_grad(
        lambda d: jnp.sum(SD.softdtw(d, 1.0, bw)))(D)
    v_pal, E = SD.softdtw_pallas_grad(D, 1.0, bw, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.sum(v_pal)), np.asarray(v_scan),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(E), np.asarray(g_scan), atol=1e-5)
    # differentiable wrapper routes its VJP through the fused kernel
    v2, g2 = jax.value_and_grad(
        lambda d: jnp.sum(SD.softdtw_pallas_diff(d, 1.0, bw, True)))(D)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v_scan), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g_scan), atol=1e-5)


def test_fit_block_b_vmem_guard():
    """ADVICE r2: the fused kernel's VMEM working set (~6*P*BB*Np*4) must
    shrink block_b instead of letting Mosaic OOM at compile time."""
    # tiny shape: full block_b fits
    assert SD._fit_block_b(64, 64, 8, n_bufs=6) == 8
    # N=M=1024: P=2047, Np=1024 → BB=8 needs ~402 MB, BB=2 fits in 128 MB
    assert SD._fit_block_b(1024, 1024, 8, n_bufs=6) == 2
    # pathological: even BB=1 cannot fit → callers must use the scan
    assert SD._fit_block_b(4096, 4096, 8, n_bufs=6) == 0
    assert SD.pallas_fits(64, 64, fused=True)
    assert not SD.pallas_fits(4096, 4096, fused=True)


def test_pallas_autoshrink_matches_scan_interpret():
    """block_b auto-shrink must not change results (interpret mode)."""
    rng = np.random.RandomState(3)
    D = jnp.asarray(rng.rand(3, 9, 7).astype(np.float32))
    ref = np.asarray(SD.softdtw(D, 1.0, 0.0))
    # force a shrink by passing an oversized block_b
    out = np.asarray(SD.softdtw_pallas(D, 1.0, 0.0, True, block_b=8))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_auto_impl_matches_measured_crossover():
    """The 'auto' dispatcher must pick the MEASURED device-time winner at
    the three published benchmark sizes (reports/tpu_kernel_evidence.md,
    v5e B=512): fused Pallas at 17x15 and 256x256, scan at 64x64 where the
    fused kernel is ~1.9x slower; scan everywhere off-TPU and for
    VMEM-overflow shapes."""
    from tacotron2_subword_tpu.ops import softdtw as SD

    assert SD.auto_impl(17, 15, backend="tpu") == "pallas"
    assert SD.auto_impl(64, 64, backend="tpu") == "scan"
    assert SD.auto_impl(256, 256, backend="tpu") == "pallas"
    # off-TPU: always the scan custom-VJP
    assert SD.auto_impl(256, 256, backend="cpu") == "scan"
    assert SD.auto_impl(17, 15) == "scan"  # this test process is CPU
    # VMEM-overflow shape must fall back rather than fail in Mosaic
    assert not SD.pallas_fits(4096, 4096, fused=True)
    assert SD.auto_impl(4096, 4096, backend="tpu") == "scan"
