"""Soft-DTW on TPU: anti-diagonal wavefront as lax.scan + a Pallas kernel.

The reference implements batched soft-DTW as numba CUDA kernels — one block
per pair, one thread per row, anti-diagonal wavefront with block sync per
diagonal (reference soft_dtw_cuda.py:33-111), plus a numba CPU fallback and
an autograd.Function wrapper (soft_dtw_cuda.py:114-270).  Semantics (He
2017 / Cuturi-Blondel): R[i,j] = D[i,j] + softmin_gamma(R[i-1,j], R[i,j-1],
R[i-1,j-1]) with optional Sakoe-Chiba bandwidth pruning, backward pass
computing E = dLoss/dD by the reversed recursion.

TPU design: the wavefront dependency (2L-1 sequential anti-diagonals) can't
be parallelized over, but each diagonal is a vector op over (batch x rows).
We therefore:
 1. *skew* the distance matrix so each anti-diagonal becomes a contiguous
    column: Dskew[b, i, i+j] = D[b, i, j]; then
 2. scan over columns carrying the two previous diagonal vectors.

``softdtw`` is the differentiable public op (custom_vjp; the backward is the
same scan pattern reversed).  ``softdtw_pallas`` runs the forward as a
Pallas kernel (grid over batch, diagonals in VMEM) — the direct analogue of
the reference's CUDA kernel with the block-sync replaced by the sequential
fori_loop a single core executes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INF = 1e30


def euclidean_dist_matrix(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared euclidean distances: x [B,N,D], y [B,M,D] →
    [B,N,M] (reference soft_dtw_cuda.py:319-329)."""
    x2 = jnp.sum(x * x, axis=-1)[:, :, None]
    y2 = jnp.sum(y * y, axis=-1)[:, None, :]
    xy = jnp.einsum("bnd,bmd->bnm", x, y, preferred_element_type=jnp.float32)
    return jnp.maximum(x2 + y2 - 2 * xy, 0.0).astype(x.dtype)


def _softmin3(a, b, c, gamma):
    """-gamma * logsumexp(-[a,b,c]/gamma), numerically stable."""
    r0, r1, r2 = -a / gamma, -b / gamma, -c / gamma
    rmax = jnp.maximum(jnp.maximum(r0, r1), r2)
    rsum = (jnp.exp(r0 - rmax) + jnp.exp(r1 - rmax) + jnp.exp(r2 - rmax))
    return -gamma * (jnp.log(rsum) + rmax)


def _band_mask(N: int, M: int, bandwidth: float) -> np.ndarray:
    """True where |i-j| <= bandwidth (or everywhere when bandwidth<=0)."""
    if bandwidth is None or bandwidth <= 0:
        return np.ones((N, M), bool)
    i = np.arange(1, N + 1)[:, None]
    j = np.arange(1, M + 1)[None, :]
    return np.abs(i - j) <= bandwidth


def _forward_scan(D, gamma, bandwidth):
    """Returns (final [B], R [B, N+1, M+1] interior alignment costs with
    R[.,0,0]=0 edges +INF) via diagonal scan."""
    B, N, M = D.shape
    band = jnp.asarray(_band_mask(N, M, bandwidth))
    Dm = jnp.where(band[None], D, INF)

    n_passes = N + M - 1
    # diagonal tensor: diag[p, b, i] = Dm[b, i, p-i] (else INF)
    i_idx = np.arange(N)
    diags = []
    p_idx = np.arange(n_passes)
    j_mat = p_idx[:, None] - i_idx[None, :]               # [P, N]
    valid = (j_mat >= 0) & (j_mat < M)
    j_cl = np.clip(j_mat, 0, M - 1)
    diag_D = Dm[:, i_idx[None, :], j_cl]                  # [B, P, N]
    diag_D = jnp.where(valid[None], diag_D, INF)
    diag_D = jnp.swapaxes(diag_D, 0, 1)                   # [P, B, N]
    valid_j = jnp.asarray(valid)

    def shift_down(r):  # index i-1, with +INF at i=0
        return jnp.pad(r[:, :-1], ((0, 0), (1, 0)), constant_values=INF)

    def step(carry, xs):
        r1, r2 = carry          # diagonals p-1, p-2: [B, N]
        d_p, v_p, p = xs
        up = r1                                   # (i, j-1)
        down = shift_down(r1)                     # (i-1, j)
        dd = shift_down(r2)                       # (i-1, j-1)
        # boundary: cell (0, j) has predecessors (0, j-1) only via up;
        # R edge values start at +INF except R[0,0]=0 handled by seeding.
        i = jnp.arange(N)
        # seed: for cell (0,0) (p=0, i=0) predecessors are R[0,0]=0 edge
        is_origin = (p == 0) & (i[None, :] == 0)
        dd = jnp.where(is_origin, 0.0, dd)
        sm = _softmin3(down, up, dd, gamma)
        r_new = d_p + sm
        r_new = jnp.where(v_p[None], r_new, INF)
        return (r_new, r1), r_new

    r_init = jnp.full((B, N), INF, D.dtype)
    xs = (diag_D, valid_j, jnp.arange(n_passes))
    (_, _), r_diags = jax.lax.scan(step, (r_init, r_init), xs)  # [P, B, N]
    final = r_diags[-1, :, N - 1]
    return final, r_diags


def _backward_scan(D, r_diags, gamma, bandwidth):
    """E = dLoss/dD via the reversed wavefront (reference
    soft_dtw_cuda.py:78-111), in the same diagonal layout."""
    B, N, M = D.shape
    n_passes = N + M - 1
    band = jnp.asarray(_band_mask(N, M, bandwidth))

    i_idx = np.arange(N)
    p_idx = np.arange(n_passes)
    j_mat = p_idx[:, None] - i_idx[None, :]
    valid = jnp.asarray((j_mat >= 0) & (j_mat < M))

    Dm = jnp.where(band[None], D, 0.0)
    j_cl = np.clip(np.asarray(j_mat), 0, M - 1)
    diag_D = jnp.swapaxes(jnp.where(valid[None], Dm[:, i_idx[None, :], j_cl],
                                    0.0), 0, 1)           # [P, B, N]

    R = jnp.where(jnp.isfinite(r_diags) & (jnp.abs(r_diags) < INF / 2),
                  r_diags, -INF)                           # [P, B, N]
    final = r_diags[-1, :, N - 1]                          # R[N,M]

    def shift_up(e):  # index i+1, pad with 0
        return jnp.pad(e[:, 1:], ((0, 0), (0, 1)))

    def get_R(p, shift):
        """R diagonal p, optionally shifted to index i+1; out-of-range → -INF."""
        in_range = (p >= 0) & (p < n_passes)
        r = jnp.where(in_range, R[jnp.clip(p, 0, n_passes - 1)], -INF)
        if shift:
            r = jnp.pad(r[:, 1:], ((0, 0), (0, 1)), constant_values=-INF)
        return r

    def get_D(p, shift):
        in_range = (p >= 0) & (p < n_passes)
        d = jnp.where(in_range, diag_D[jnp.clip(p, 0, n_passes - 1)], 0.0)
        if shift:
            d = jnp.pad(d[:, 1:], ((0, 0), (0, 1)))
        return d

    def step(carry, xs):
        e1, e2 = carry     # E diagonals p+1, p+2: [B, N]
        p = xs
        r_p = get_R(p, False)
        # successor terms (reference soft_dtw_cuda.py:105-108):
        #  a: (i+1, j)   on diag p+1, row i+1
        #  b: (i, j+1)   on diag p+1, row i
        #  c: (i+1, j+1) on diag p+2, row i+1
        ra = (get_R(p + 1, True) - r_p - get_D(p + 1, True)) / gamma
        rb = (get_R(p + 1, False) - r_p - get_D(p + 1, False)) / gamma
        rc = (get_R(p + 2, True) - r_p - get_D(p + 2, True)) / gamma
        ea = shift_up(e1)
        eb = e1
        ec = shift_up(e2)
        # the final cell (N-1, M-1) seeds E=1: its successor (i+1,j+1) in the
        # padded reference grid carries E=1 with R[-1,-1]=R[N,M], D=0.
        i = jnp.arange(N)
        is_final = (p == n_passes - 1) & (i[None, :] == N - 1)
        rc = jnp.where(is_final, (final[:, None] - r_p) / gamma, rc)
        ec = jnp.where(is_final, 1.0, ec)
        e_new = (ea * jnp.exp(ra) + eb * jnp.exp(rb) + ec * jnp.exp(rc))
        valid_p = valid[jnp.clip(p, 0, n_passes - 1)]
        # a cell is live only if on-grid AND inside the Sakoe-Chiba band:
        # banned cells have R = -INF, whose exp terms are NaN (-INF - -INF)
        # and would otherwise propagate through the whole E matrix
        e_new = jnp.where(valid_p[None] & (r_p > -INF / 2), e_new, 0.0)
        return (e_new, e1), e_new

    e_init = jnp.zeros((B, N), D.dtype)
    ps = jnp.arange(n_passes - 1, -1, -1)
    (_, _), e_diags = jax.lax.scan(step, (e_init, e_init), ps)
    # e_diags[k] is diagonal p = n_passes-1-k; scatter back to [B, N, M]
    e_diags = e_diags[::-1]                                # [P, B, N]
    j_mat_cl = np.clip(np.asarray(j_mat), 0, M - 1)
    E = jnp.zeros((B, N, M), D.dtype)
    p_ar = np.arange(n_passes)
    E = E.at[:, i_idx[None, :], j_mat_cl].add(
        jnp.swapaxes(jnp.where(valid[:, None, :], e_diags, 0.0), 0, 1))
    return E


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def softdtw(D: jnp.ndarray, gamma: float = 1.0,
            bandwidth: float = 0.0) -> jnp.ndarray:
    """Batched soft-DTW value from a distance matrix D [B, N, M] → [B]."""
    final, _ = _forward_scan(D, gamma, bandwidth)
    return final


def _softdtw_fwd(D, gamma, bandwidth):
    final, r_diags = _forward_scan(D, gamma, bandwidth)
    return final, (D, r_diags)


def _softdtw_bwd(gamma, bandwidth, res, g):
    D, r_diags = res
    E = _backward_scan(D, r_diags, gamma, bandwidth)
    return (g[:, None, None] * E,)


softdtw.defvjp(_softdtw_fwd, _softdtw_bwd)


def softdtw_distance(x: jnp.ndarray, y: jnp.ndarray, *, gamma: float = 1.0,
                     bandwidth: float = 0.0,
                     normalize: bool = False) -> jnp.ndarray:
    """Soft-DTW between batched sequences x [B,N,D], y [B,M,D] (the
    reference SoftDTW module API, soft_dtw_cuda.py:273-352)."""
    if normalize:
        d_xy = softdtw(euclidean_dist_matrix(x, y), gamma, bandwidth)
        d_xx = softdtw(euclidean_dist_matrix(x, x), gamma, bandwidth)
        d_yy = softdtw(euclidean_dist_matrix(y, y), gamma, bandwidth)
        return d_xy - 0.5 * (d_xx + d_yy)
    return softdtw(euclidean_dist_matrix(x, y), gamma, bandwidth)


# ---------------------------------------------------------------------------
# Pallas forward kernel (diagonal-as-column skewed layout)
# ---------------------------------------------------------------------------

def _skew(D: jnp.ndarray) -> jnp.ndarray:
    """[B, N, M] → [B, N, N+M-1] with Dskew[b,i,i+j] = D[b,i,j], INF
    elsewhere — every anti-diagonal becomes a contiguous column."""
    B, N, M = D.shape
    P = N + M - 1
    out = jnp.full((B, N, P), INF, D.dtype)
    i = np.arange(N)[:, None]
    j = np.arange(M)[None, :]
    return out.at[:, i, i + j].set(D)


def profile(batch_size: int = 128, seq_len_a: int = 17, seq_len_b: int = 15,
            dims: int = 2, n_iters: int = 6):
    """Self-profiling harness (the reference's soft_dtw_cuda.py:382-428):
    times forward+backward for the scan implementation and, on TPU, the
    Pallas forward kernel, and checks they agree."""
    import time

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch_size, seq_len_a, dims),
                                        dtype=np.float32))
    y = jnp.asarray(rng.standard_normal((batch_size, seq_len_b, dims),
                                        dtype=np.float32))
    D = euclidean_dist_matrix(x, y)

    fwd_bwd = jax.jit(jax.value_and_grad(
        lambda d: jnp.sum(softdtw(d, 1.0, 0.0))))
    v, g = fwd_bwd(D)
    np.asarray(g)
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        v, g = fwd_bwd(D)
        np.asarray(g)
        times.append(time.perf_counter() - t0)
    print(f"scan fwd+bwd: avg {np.mean(times) * 1e3:.2f} ms "
          f"(B={batch_size}, {seq_len_a}x{seq_len_b})")

    try:
        pf = jax.jit(lambda d: softdtw_pallas(d, 1.0, 0.0))
        r2 = np.asarray(pf(D))
        t0 = time.perf_counter()
        for _ in range(n_iters):
            r2 = np.asarray(pf(D))
        print(f"pallas fwd: avg {(time.perf_counter() - t0) / n_iters * 1e3:.2f} ms, "
              f"max |diff| vs scan {np.abs(np.asarray(softdtw(D, 1.0, 0.0)) - r2).max():.2e}")
    except Exception as e:
        print(f"pallas kernel unavailable on this backend: {type(e).__name__}")
    return float(jnp.sum(v))


VMEM_BYTES = 128 * 1024 * 1024  # physical v5e VMEM


def _padded_dims(N: int, M: int) -> Tuple[int, int]:
    """(P, Np): diagonal count and lane-padded row length (see _skew_blocked)."""
    return N + M - 1, max(128, -(-N // 128) * 128)


def _fit_block_b(N: int, M: int, block_b: int, n_bufs: int) -> int:
    """Largest batch block <= ``block_b`` whose VMEM working set
    (~n_bufs * P * BB * Np f32: double-buffered in/out blocks + the
    persistent R scratch) fits physical VMEM; 0 when even BB=1 does not —
    callers must then fall back to the scan implementation instead of
    letting Mosaic fail at compile time on an over-budget allocation."""
    P, Np = _padded_dims(N, M)
    bb = block_b
    while bb >= 1 and n_bufs * P * bb * Np * 4 > VMEM_BYTES:
        bb //= 2
    return bb


def pallas_fits(N: int, M: int, *, fused: bool = True) -> bool:
    """True when the (fused) Pallas kernel can run [.., N, M] distance
    matrices within VMEM at some batch block size."""
    return _fit_block_b(N, M, 8, 6 if fused else 4) >= 1


# Measured fused-kernel-vs-scan crossover (xprof DEVICE times, v5e, B=512,
# reports/tpu_kernel_evidence.md): the fused Pallas fwd+bwd wins at small
# sizes (17x15: one launch beats the scan's launch chain) and at large
# sizes (256x256: 14.5 vs 18.1 ms), but LOSES in the mid range where the
# E-block HBM streaming dominates (64x64: 1.92 vs 1.02 ms; 128x128
# measured round 5).  These constants encode that curve for auto dispatch.
PALLAS_SMALL_MAX = 24    # <= this: pallas (launch-bound regime)
PALLAS_LARGE_MIN = 192   # >= this: pallas (compute-bound regime)


def auto_impl(N: int, M: int, backend: Optional[str] = None) -> str:
    """'pallas' or 'scan': the measured winner for an [N, M] soft-DTW on
    this backend (see the crossover constants above; scan everywhere off
    TPU and whenever the fused kernel cannot fit VMEM)."""
    backend = backend or jax.default_backend()
    if backend != "tpu" or not pallas_fits(N, M, fused=True):
        return "scan"
    size = max(N, M)
    if size <= PALLAS_SMALL_MAX or size >= PALLAS_LARGE_MIN:
        return "pallas"
    return "scan"


def _skew_blocked(D: jnp.ndarray, bandwidth: float, block_b: int):
    """Host-side prep shared by the Pallas kernels: band-mask, skew so every
    anti-diagonal is a lane-contiguous row, pad lanes to the 128 boundary,
    pad batch to a multiple of ``block_b`` (padding rows are all-INF, which
    both passes treat as dead cells), and fold the batch block into the
    SUBLANE dim: [G, P, BB, Np] so one grid step processes BB rows as full
    (8, 128) VPU tiles (a [1, Np] diagonal would waste 7/8 of the VPU
    sublanes).  Perf standing (xprof DEVICE times, v5e,
    reports/tpu_kernel_evidence.md): the forward-only kernel is 2.1-2.3x
    the scan at 17x15 and 256x256 and at parity at 64x64; the FUSED
    fwd+bwd kernel vs jax.grad-of-scan is ~1.2x faster at 17x15/256x256
    but ~1.9x SLOWER at 64x64 (E-block streaming dominates mid sizes) —
    its robust win is one launch and no R round-trip through HBM, not raw
    compute time at every shape."""
    B, N, M = D.shape
    band = jnp.asarray(_band_mask(N, M, bandwidth)[None], D.dtype)
    Dm = jnp.where(band > 0, D, INF)
    Ds = jnp.swapaxes(_skew(Dm), 1, 2)  # [B, P, N]: diagonal rows
    P = N + M - 1
    Np = max(128, -(-N // 128) * 128)
    Bp = -(-B // block_b) * block_b
    Ds = jnp.pad(Ds, ((0, Bp - B), (0, 0), (0, Np - N)),
                 constant_values=INF)
    Ds = Ds.reshape(Bp // block_b, block_b, P, Np).transpose(0, 2, 1, 3)
    return Ds, P, Np, Bp


def softdtw_pallas_grad(D: jnp.ndarray, gamma: float = 1.0,
                        bandwidth: float = 0.0,
                        interpret: bool = False, *, block_b: int = 8
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FUSED forward + backward soft-DTW as one Pallas TPU kernel:
    (value [B], E = d(value)/dD [B, N, M]).

    The reference ships the backward as a second CUDA wavefront kernel over
    reversed anti-diagonals (soft_dtw_cuda.py:78-111).  Here both passes run
    in one kernel launch per block of ``block_b`` batch rows: the forward
    fori_loop writes every R diagonal to a VMEM scratch, the backward
    fori_loop walks the diagonals in reverse computing E[i,j] = sum over the
    three successors of E[succ] * exp((R[succ] - R[i,j] - D[succ]) / gamma),
    seeded with E[N-1,M-1] = 1 — so R never round-trips through HBM between
    the passes.  Diagonals live on lanes, the batch block on sublanes
    (see _skew_blocked).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, M = D.shape
    BB = _fit_block_b(N, M, block_b, n_bufs=6)
    if BB < 1:
        raise ValueError(
            f"soft-DTW fused Pallas kernel does not fit VMEM at N={N}, "
            f"M={M} even at block_b=1; use the scan implementation "
            f"(softdtw) for this shape")
    Ds, P, Np, Bp = _skew_blocked(D, bandwidth, BB)
    G = Bp // BB

    def kernel(d_ref, val_ref, e_ref, r_scr):
        row = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)

        def shift_down(r, fill):  # lane i ← i-1
            return jnp.where(row == 0, fill, pltpu.roll(r, 1, axis=1))

        def shift_up(r, fill):    # lane i ← i+1 (lane N-1 pulls padding,
            return jnp.where(row == Np - 1, fill,   # masked by validity)
                             pltpu.roll(r, Np - 1, axis=1))

        # ---- forward: write every diagonal of R to scratch -------------
        def fwd_body(p, carry):
            r1, r2 = carry
            d_p = d_ref[0, p]                  # [BB, Np]
            down = shift_down(r1, INF)
            dd = shift_down(r2, INF)
            dd = jnp.where((p == 0) & (row == 0), 0.0, dd)
            sm = _softmin3(down, r1, dd, gamma)
            r_new = jnp.where(d_p >= INF / 2, INF, d_p + sm)
            r_scr[p] = r_new
            return (r_new, r1)

        r_init = d_ref[0, 0] * 0.0 + INF       # [BB, Np]
        r_last, _ = jax.lax.fori_loop(0, P, fwd_body, (r_init, r_init))
        val_ref[0, 0] = r_last

        # ---- backward: reversed wavefront over the scratch diagonals ---
        def load_R(p):
            r = r_scr[p]                       # [BB, Np]
            return jnp.where(r >= INF / 2, -INF, r)  # invalid → -INF

        def load_D(p):
            d = d_ref[0, p]
            return jnp.where(d >= INF / 2, 0.0, d)

        def exp_term(succ_r, succ_d, r_p):
            # exp((R[succ] - R - D[succ]) / gamma); -INF successors → 0
            return jnp.exp((succ_r - r_p - succ_d) / gamma)

        def bwd_body(k, carry):
            e1, e2 = carry  # E diagonals p+1, p+2
            p = P - 1 - k
            r_p = load_R(p)
            in1 = p + 1 < P
            r_n1 = jnp.where(in1, load_R(jnp.minimum(p + 1, P - 1)), -INF)
            d_n1 = jnp.where(in1, load_D(jnp.minimum(p + 1, P - 1)), 0.0)
            in2 = p + 2 < P
            r_n2 = jnp.where(in2, load_R(jnp.minimum(p + 2, P - 1)), -INF)
            d_n2 = jnp.where(in2, load_D(jnp.minimum(p + 2, P - 1)), 0.0)

            ea = shift_up(e1, 0.0) * exp_term(shift_up(r_n1, -INF),
                                              shift_up(d_n1, 0.0), r_p)
            eb = e1 * exp_term(r_n1, d_n1, r_p)
            ec = shift_up(e2, 0.0) * exp_term(shift_up(r_n2, -INF),
                                              shift_up(d_n2, 0.0), r_p)
            e_new = ea + eb + ec
            # seed: the final interior cell (N-1, M-1) has E = 1
            e_new = jnp.where((p == P - 1) & (row == N - 1), 1.0, e_new)
            # zero everywhere the cell itself is invalid (off-grid / band)
            e_new = jnp.where(r_p <= -INF / 2, 0.0, e_new)
            e_ref[0, p] = e_new
            return (e_new, e1)

        e_init = r_init * 0.0
        jax.lax.fori_loop(0, P, bwd_body, (e_init, e_init))

    mem = pl.ANY if interpret else pltpu.VMEM
    # in + out-E blocks are double-buffered by the Pallas pipeline and the
    # R scratch persists: ~5x P*BB*Np floats.  The 16 MB default scoped-vmem
    # limit OOMs at 256x256xBB=8 (measured on v5e); raise it — v5e has
    # 128 MB VMEM.
    vmem_budget = min(128 * 1024 * 1024,
                      max(32 * 1024 * 1024, 6 * P * BB * Np * 4))
    params = (None if interpret
              else pltpu.CompilerParams(vmem_limit_bytes=vmem_budget))
    val, e_skew = pl.pallas_call(
        kernel,
        compiler_params=params,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, P, BB, Np), lambda g: (g, 0, 0, 0),
                               memory_space=mem)],
        out_specs=[pl.BlockSpec((1, 1, BB, Np), lambda g: (g, 0, 0, 0),
                                memory_space=mem),
                   pl.BlockSpec((1, P, BB, Np), lambda g: (g, 0, 0, 0),
                                memory_space=mem)],
        out_shape=[jax.ShapeDtypeStruct((G, 1, BB, Np), D.dtype),
                   jax.ShapeDtypeStruct((G, P, BB, Np), D.dtype)],
        scratch_shapes=[pltpu.VMEM((P, BB, Np), D.dtype)],
        interpret=interpret,
    )(Ds)
    # unblock + unskew: E[b, i, j] = e_skew[b, i+j, i]
    e_skew = e_skew.transpose(0, 2, 1, 3).reshape(Bp, P, Np)[:B]
    i = np.arange(N)[:, None]
    j = np.arange(M)[None, :]
    E = e_skew[:, i + j, i]
    return val.transpose(0, 2, 1, 3).reshape(Bp, Np)[:B, N - 1], E


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def softdtw_pallas_diff(D: jnp.ndarray, gamma: float = 1.0,
                        bandwidth: float = 0.0,
                        interpret: bool = False) -> jnp.ndarray:
    """Differentiable soft-DTW running BOTH passes as Pallas kernels — the
    TPU analogue of the reference's autograd.Function over its two CUDA
    kernels (soft_dtw_cuda.py:114-174)."""
    return softdtw_pallas(D, gamma, bandwidth, interpret)


def _softdtw_pallas_fwd(D, gamma, bandwidth, interpret):
    value, E = softdtw_pallas_grad(D, gamma, bandwidth, interpret)
    return value, E


def _softdtw_pallas_bwd(gamma, bandwidth, interpret, E, g):
    return (g[:, None, None] * E,)


softdtw_pallas_diff.defvjp(_softdtw_pallas_fwd, _softdtw_pallas_bwd)


def softdtw_pallas(D: jnp.ndarray, gamma: float = 1.0,
                   bandwidth: float = 0.0,
                   interpret: bool = False, *,
                   block_b: int = 8) -> jnp.ndarray:
    """Forward soft-DTW as a Pallas TPU kernel: grid over batch blocks,
    skewed D in VMEM, fori_loop over anti-diagonal columns with [BB, Np]
    vector tiles — the reference CUDA wavefront (soft_dtw_cuda.py:33-75)
    with ``cuda.syncthreads`` replaced by the sequential column loop and
    ``block_b`` batch rows per step filling the VPU sublanes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, M = D.shape
    BB = _fit_block_b(N, M, block_b, n_bufs=4)
    if BB < 1:
        raise ValueError(
            f"soft-DTW Pallas kernel does not fit VMEM at N={N}, M={M} "
            f"even at block_b=1; use the scan implementation (softdtw)")
    Ds, P, Np, Bp = _skew_blocked(D, bandwidth, BB)
    G = Bp // BB

    def kernel(d_ref, out_ref):
        row = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)

        def shift(r):  # index i-1 along lanes, +INF fill at lane 0
            return jnp.where(row == 0, INF, pltpu.roll(r, 1, axis=1))

        def body(p, carry):
            r1, r2 = carry
            d_p = d_ref[0, p]                  # [BB, Np]
            down = shift(r1)
            dd = shift(r2)
            dd = jnp.where((p == 0) & (row == 0), 0.0, dd)
            sm = _softmin3(down, r1, dd, gamma)
            r_new = jnp.where(d_p >= INF / 2, INF, d_p + sm)
            return (r_new, r1)

        # derive the carry init from loaded data so Mosaic assigns it the
        # same (non-replicated) layout as the loop body's output
        r_init = d_ref[0, 0] * 0.0 + INF
        r_last, _ = jax.lax.fori_loop(0, P, body, (r_init, r_init))
        out_ref[0, 0] = r_last

    mem = pl.ANY if interpret else pltpu.VMEM
    vmem_budget = min(128 * 1024 * 1024,
                      max(32 * 1024 * 1024, 4 * P * BB * Np * 4))
    params = (None if interpret
              else pltpu.CompilerParams(vmem_limit_bytes=vmem_budget))
    out = pl.pallas_call(
        kernel,
        compiler_params=params,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, P, BB, Np), lambda g: (g, 0, 0, 0),
                               memory_space=mem)],
        out_specs=pl.BlockSpec((1, 1, BB, Np), lambda g: (g, 0, 0, 0),
                               memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((G, 1, BB, Np), D.dtype),
        interpret=interpret,
    )(Ds)
    return out.transpose(0, 2, 1, 3).reshape(Bp, Np)[:B, N - 1]
