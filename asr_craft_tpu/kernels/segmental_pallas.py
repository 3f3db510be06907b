"""Pallas SCRF forward kernel: segmental lattice scoring without
materializing the (B, T, Dmax, L) potential tensor.

BASELINE names "segmental lattice scoring" as a Pallas kernel target, and
SURVEY.md §7.3 item 4 flags the memory blow-up: at production shapes the
dense segment-potential tensor is O(T * Dmax * L) per sequence (gigabytes).
This kernel streams the *cumulative frame scores* (same bytes as the frame
scores) and reconstructs each segment potential in VMEM:

    seg[t, d, l] = pool(cum[t+1, l] - cum[t-d, l]) + b_dur[d, l] + b_seg[l]

carrying rolling (Dmax, B, L) VMEM windows.  The duration-message
reduction rides the MXU via the same rescaled-exp trick as the
linear-chain kernels, computed ONCE per source frame (r4):

    q[u] = m_u + tmax + log(exp(alpha[u] - m_u) @ P);  msg[t, d] = q[t-1-d]

— one (B, L) @ (L, L) dot per frame instead of the (Dmax*B, L) window dot
(Dmax-fold redundant), identical numerics.

Log semiring only (training/scoring); segmental Viterbi decode stays on the
XLA path (max-plus over durations doesn't factor through exp).

Training at production shapes additionally needs the backward side (round-1
VERDICT missing #2): ``segmental_backward_pallas`` (beta pass, descending
grid) and ``segmental_grad_pallas`` (xi pass: frame/bias/trans gradient
pieces) — the in-kernel mirrors of ops.segmental_stream's scans, consumed
by its classical-fwd-bwd custom VJP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_craft_tpu.kernels.fwdbwd_pallas import _LANE, _SUBLANE, _round_up
from asr_craft_tpu.ops.semiring import NEG_INF


_TBLK = 8   # min frames per grid step: amortizes per-step issue/DMA
            # overhead (r4: grid=(T,) cost ~2-3 us/step of pure overhead
            # x 512); rounded up to a multiple of Dmax (see _tblk)


def _tblk(Dmax: int) -> int:
    """Frames per grid step: the smallest multiple of Dmax >= _TBLK.

    TB % Dmax == 0 makes every circular-slot index below a COMPILE-TIME
    constant (t = i*TB + k  =>  t ≡ k mod Dmax): the r4 kernels shifted
    2-3 whole (Dmax, B, L) windows per frame (4-6 full-window VPU passes
    of pure copy) and spent 2 more passes masking the d == t / d > t
    cases; with slots keyed by absolute frame (slot s holds frame u ≡ s
    mod Dmax), the rolls vanish and both masks fall out of buffer
    initialization (r5, VERDICT r4 next #1)."""
    return Dmax * max(1, -(-_TBLK // Dmax))


def _rot_tables(bias, invd, Dmax: int):
    """Rotation tables for slot-indexed windows: at frame t with
    r = t mod Dmax, slot s holds source frame u ≡ s (mod Dmax), whose
    duration is d = (t-1-s) mod Dmax — so row r of each table carries the
    per-slot bias/invd in slot order.  (Dmax, Dmax, width) f32."""
    r = jnp.arange(Dmax)
    d_of = (r[:, None] - 1 - r[None, :]) % Dmax            # [r, s]
    return bias[d_of], invd[d_of]


def _seg_fwd_kernel(TB, Dmax, len_ref, fs_ref, PT_ref, tmax_ref,
                    biasrot_ref, invdrot_ref, alphas_ref, q_buf, cs_buf,
                    cumrun):
    # Grid: (Tp/TB,); step i processes frames t = i*TB + k, consuming
    # cum[t+1] and emitting alpha[t].
    #
    # TRANSPOSED layout (r5): all (L, B) planes carry labels on SUBLANES
    # (L=48 is 6 exact sublane rows — the r4 (B, L) layout padded 48
    # labels to 128 lanes, a 2.7x element waste on every window pass)
    # and batch on LANES (full at B=128).
    #
    # The duration message for (t, d) is q[t-1-d] where
    #   q[u, l] = m_u + tmax[l] + log(P^T @ exp(alpha[u] - m_u))[l]
    # depends only on u — computed ONCE per frame on (L, B) (one MXU dot)
    # and stored in its STATIC slot u mod Dmax (see _tblk); the d-indexed
    # bias/invd are read from rotation tables.  Initialization carries
    # the structure the r4 kernel spent masks on:
    #   q_buf[s]  = NEG_INF            (u < -1: invalid duration d > t)
    #   q_buf[-1] = 0                  (u = -1: segment starts at frame 0)
    #   cs_buf[s] = 0                  (CS[u+1 <= 0] = 0)
    # — slots are only ever read before their first overwrite while they
    # still mean exactly these cases.
    i = pl.program_id(0)
    L, B = cs_buf.shape[1:]

    @pl.when(i == 0)
    def _():
        q_buf[:] = jnp.full_like(q_buf, NEG_INF)
        q_buf[Dmax - 1] = jnp.zeros((L, B), q_buf.dtype)
        cs_buf[:] = jnp.zeros_like(cs_buf)
        cumrun[:] = jnp.zeros_like(cumrun)

    for k in range(TB):
        t = i * TB + k
        r = k % Dmax
        # in-kernel running cumulative score: CS[t+1] (r5 — the XLA-side
        # jnp.cumsum was a ~9-pass log-depth scan over the whole tensor)
        cum_now = cumrun[:] + fs_ref[k]                     # (L, B)
        cumrun[:] = cum_now

        invd = invdrot_ref[r][:, 0:1].reshape(Dmax, 1, 1)
        seg = (cum_now[None] - cs_buf[:]) * invd \
            + biasrot_ref[r].reshape(Dmax, L, 1)            # (Dmax, L, B)

        cand = q_buf[:] + seg
        cm = jnp.maximum(jnp.max(cand, axis=0), NEG_INF)    # (L, B)
        alpha_t = cm + jnp.log(jnp.maximum(
            jnp.sum(jnp.exp(cand - cm[None]), axis=0), 1e-38))
        # padded frames: alpha stays NEG_INF (never read; logZ gathers
        # length-1)
        valid = len_ref[0:1, :] > t                         # (1, B)
        alpha_t = jnp.where(valid, alpha_t, NEG_INF)

        alphas_ref[k] = alpha_t
        # this frame's outgoing message: one (L, L) @ (L, B) MXU dot
        m_t = jnp.maximum(jnp.max(alpha_t, axis=0, keepdims=True),
                          NEG_INF)                          # (1, B)
        q_t = m_t + tmax_ref[:, 0:1] + jnp.log(jnp.maximum(
            jnp.dot(PT_ref[:], jnp.exp(alpha_t - m_t),
                    preferred_element_type=jnp.float32), 1e-38))
        # static slot write: frame t lands in slot t mod Dmax == r
        q_buf[r] = q_t
        cs_buf[r] = cum_now


@functools.partial(jax.jit, static_argnames=("max_dur", "mean_pool",
                                             "interpret"))
def segmental_forward_pallas(frame_scores_tm, trans, dur_bias, seg_bias,
                             lengths, max_dur: int, mean_pool: bool = True,
                             interpret: bool = False):
    """Fused SCRF alpha pass.

    ``frame_scores_tm``: (T, B, L) per-frame label scores (the feature-map
    matmul output); ``trans``: (L, L); ``dur_bias``: (Dmax, L) or None;
    ``seg_bias``: (L,) or None.  Returns (alphas (T, B, L), logZ (B,)) —
    allclose to ops.segmental.segmental_forward on potentials built with
    models.segmental.seg_potentials.

    Kernel-internal layout is TRANSPOSED (T, L, B): labels on sublanes
    (exact at L = 48), batch on lanes (full at B = 128); the public
    surface stays (T, B, L).
    """
    T, B, L = frame_scores_tm.shape
    Ls, Bk, bias, trans_p, lengths_p = _pad_seg_lb(
        L, B, trans, lengths, dur_bias, seg_bias, max_dur)
    Dmax = max_dur
    fs = jnp.swapaxes(frame_scores_tm, 1, 2)                # (T, L, B)
    if (Ls, Bk) != (L, B):
        fs = jnp.pad(fs, ((0, 0), (0, Ls - L), (0, Bk - B)))

    TB = _tblk(Dmax)
    Tp = _round_up(T, TB)
    if Tp != T:
        fs = jnp.pad(fs, ((0, Tp - T), (0, 0), (0, 0)))
    tmax = jnp.maximum(jnp.max(trans_p, axis=0), NEG_INF)   # (Ls,)
    PT = jnp.exp(trans_p - tmax[None, :]).T                 # (Ls=l, Ls=p)
    tmax2 = jnp.broadcast_to(tmax[:, None], (Ls, _LANE))
    invd = (1.0 / (jnp.arange(Dmax) + 1.0) if mean_pool
            else jnp.ones(Dmax))
    biasrot, invdrot = _rot_tables(bias, invd.astype(jnp.float32), Dmax)
    invdrot = jnp.broadcast_to(invdrot[..., None], (Dmax, Dmax, _LANE))
    len2d = jnp.broadcast_to(lengths_p[None, :].astype(jnp.int32),
                             (_SUBLANE, Bk))

    [alphas] = pl.pallas_call(
        functools.partial(_seg_fwd_kernel, TB, Dmax),
        grid=(Tp // TB,),
        in_specs=[
            pl.BlockSpec((_SUBLANE, Bk), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Ls, Bk), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls, Ls), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls, _LANE), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Dmax, Ls), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Dmax, _LANE), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, Ls, Bk), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((Tp, Ls, Bk), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((Dmax, Ls, Bk), jnp.float32),
            pltpu.VMEM((Dmax, Ls, Bk), jnp.float32),
            pltpu.VMEM((Ls, Bk), jnp.float32),
        ],
        interpret=interpret,
    )(len2d, fs, PT, tmax2, biasrot, invdrot)
    alphas = jnp.swapaxes(alphas[:T], 1, 2)[:, :B, :L]      # (T, B, L)
    last = jnp.take_along_axis(
        alphas, (lengths[:B] - 1)[None, :, None].astype(jnp.int32)
        .repeat(L, axis=2), axis=0)[0]                       # (B, L)
    m = jnp.maximum(jnp.max(last, axis=-1, keepdims=True), NEG_INF)
    logZ = (m + jnp.log(jnp.maximum(
        jnp.sum(jnp.exp(last - m), axis=-1, keepdims=True), 1e-38)))[:, 0]
    return alphas, logZ


def _pad_seg_lb(L, B, trans, lengths, dur_bias, seg_bias, Dmax):
    """Transposed-layout padding: labels to sublane multiples (Ls), batch
    to full lanes (Bk); padded labels carry NEG_INF bias/trans rows,
    padded batch lanes are length-1 rows (inert)."""
    Ls, Bk = _round_up(L, _SUBLANE), _round_up(B, _LANE)
    bias = jnp.zeros((Dmax, Ls), jnp.float32)
    if dur_bias is not None:
        bias = bias.at[:, :L].add(dur_bias)
    if seg_bias is not None:
        bias = bias.at[:, :L].add(seg_bias[None, :])
    if Ls != L:
        bias = bias.at[:, L:].set(NEG_INF)
        trans = jnp.pad(trans, ((0, Ls - L),) * 2, constant_values=NEG_INF)
    if Bk != B:
        lengths = jnp.pad(lengths, (0, Bk - B), constant_values=1)
    return Ls, Bk, bias, trans, lengths


def _cum_lb(cum, Ls, Bk, Tp):
    """(T, B, L) cumulative scores -> padded transposed (Tp, Ls, Bk)."""
    T, B, L = cum.shape
    cum = jnp.swapaxes(cum, 1, 2)
    if (Ls, Bk) != (L, B):
        cum = jnp.pad(cum, ((0, 0), (0, Ls - L), (0, Bk - B)))
    if Tp != T:
        cum = jnp.pad(cum, ((0, Tp - T), (0, 0), (0, 0)), mode="edge")
    return cum


def _len_lb(lengths, Bk):
    return jnp.broadcast_to(lengths[None, :].astype(jnp.int32),
                            (_SUBLANE, Bk))


def _rot_tables_bwd(bias, invd, Dmax: int):
    """Backward-window rotation tables: at frame t (r = t mod Dmax), slot
    s holds FUTURE frame v ≡ s (mod Dmax), v in [t+1, t+Dmax], whose
    segment duration is d = (v - t - 1) = (s - r - 1) mod Dmax."""
    r = jnp.arange(Dmax)
    d_of = (r[None, :] - r[:, None] - 1) % Dmax            # [r, s]
    return bias[d_of], invd[d_of]


def _seg_bwd_kernel(TB, Dmax, len_ref, fs_ref, total_ref, M_ref,
                    tmaxr_ref, biasrot_ref, invdrot_ref, betas_ref,
                    beta_buf, cs_buf, suf):
    # Descending grid over TB-frame blocks: step i handles block nb-1-i,
    # frames t descending inside; consumes cum[t] = CS[t+1].  Transposed
    # (L, B) planes (see _seg_fwd_kernel).
    #
    # Static circular slots (see _tblk): slot s holds beta[v] and CS[v+1]
    # for the future frame v ≡ s (mod Dmax); init beta = NEG_INF covers
    # v >= T (no path), so no masks.  The r4 kernel ran the logsumexp
    # matmul on the whole (Dmax*B, L) window — Dmax-fold redundant MXU
    # (8 passes/frame at production shape): the transition factor is
    # independent of d, so it factors OUT of the duration reduction,
    #   beta[t, l] = lse_{l'} trans[l, l'] + z[t, l'],
    #   z[t, l'] = lse_d seg[t+d+1, d, l'] + beta[t+d+1, l'],
    # leaving ONE (L, L) @ (L, B) dot per frame — identical math, the
    # backward mirror of the forward q-window (VERDICT r4 next #1).
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    base = (nb - 1 - i) * TB
    L, B = cs_buf.shape[1:]

    @pl.when(i == 0)
    def _():
        beta_buf[:] = jnp.full_like(beta_buf, NEG_INF)
        cs_buf[:] = jnp.zeros_like(cs_buf)
        suf[:] = jnp.zeros_like(suf)

    for j in range(TB):
        k = TB - 1 - j
        t = base + k
        r = k % Dmax
        # in-kernel descending cumulative score: CS[t+1] = total - suffix
        # (suf = sum of frames > t; updated after this frame)
        cs_next = total_ref[:] - suf[:]                     # (L, B)
        invd = invdrot_ref[r][:, 0:1].reshape(Dmax, 1, 1)
        seg_next = (cs_buf[:] - cs_next[None]) * invd \
            + biasrot_ref[r].reshape(Dmax, L, 1)            # seg (t+d+1, d)
        w = seg_next + beta_buf[:]
        cm = jnp.maximum(jnp.max(w, axis=0), NEG_INF)       # (L, B)
        z = cm + jnp.log(jnp.maximum(
            jnp.sum(jnp.exp(w - cm[None]), axis=0), 1e-38))
        zm = jnp.maximum(jnp.max(z, axis=0, keepdims=True), NEG_INF)
        prod = jnp.dot(M_ref[:], jnp.exp(z - zm),
                       preferred_element_type=jnp.float32)  # (L, B)
        beta_t = zm + tmaxr_ref[:, 0:1] + jnp.log(
            jnp.maximum(prod, 1e-38))
        lenv = len_ref[0:1, :]                              # (1, B)
        beta_t = jnp.where(t == lenv - 1, 0.0, beta_t)
        beta_t = jnp.where(t >= lenv, NEG_INF, beta_t)

        betas_ref[k] = beta_t
        # static slot write: frame t ≡ k ≡ r (mod Dmax)
        beta_buf[r] = beta_t
        cs_buf[r] = cs_next
        suf[:] = suf[:] + fs_ref[k]


@functools.partial(jax.jit, static_argnames=("max_dur", "mean_pool",
                                             "interpret"))
def segmental_backward_pallas(frame_scores_tm, trans, bias, lengths,
                              max_dur: int, mean_pool: bool = True,
                              interpret: bool = False):
    """Fused SCRF beta pass.  ``frame_scores_tm``: (T, B, L) per-frame
    label scores (r5: cumulative scores are accumulated IN-KERNEL —
    descending, as total minus a running suffix — instead of an XLA
    log-depth cumsum); ``bias``: (Dmax, L) combined segment bias.
    Returns betas (T, B, L) — allclose to
    ops.segmental_stream.seg_backward_stream."""
    T, B, L = frame_scores_tm.shape
    Dmax = max_dur
    Ls, Bk, bias, trans_p, lengths_p = _pad_seg_lb(
        L, B, trans, lengths, bias, None, Dmax)
    tmax_row = jnp.maximum(jnp.max(trans_p, axis=1), NEG_INF)
    M = jnp.exp(trans_p - tmax_row[:, None])                # (Ls=l, Ls=l')
    tmaxr2 = jnp.broadcast_to(tmax_row[:, None], (Ls, _LANE))
    invd = (1.0 / (jnp.arange(Dmax) + 1.0) if mean_pool
            else jnp.ones(Dmax))
    biasrot, invdrot = _rot_tables_bwd(bias, invd.astype(jnp.float32),
                                       Dmax)
    invdrot = jnp.broadcast_to(invdrot[..., None], (Dmax, Dmax, _LANE))

    TB = _tblk(Dmax)
    Tp = _round_up(T, TB)
    fs = jnp.swapaxes(frame_scores_tm, 1, 2)
    if (Ls, Bk) != (L, B):
        fs = jnp.pad(fs, ((0, 0), (0, Ls - L), (0, Bk - B)))
    if Tp != T:
        fs = jnp.pad(fs, ((0, Tp - T), (0, 0), (0, 0)))
    total = jnp.sum(fs, axis=0)                             # CS[T] (L, B)
    nb = Tp // TB
    [betas] = pl.pallas_call(
        functools.partial(_seg_bwd_kernel, TB, Dmax),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_SUBLANE, Bk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Ls, Bk), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls, Bk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls, Ls), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Dmax, Ls), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Dmax, _LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, Ls, Bk), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((Tp, Ls, Bk), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((Dmax, Ls, Bk), jnp.float32),
            pltpu.VMEM((Dmax, Ls, Bk), jnp.float32),
            pltpu.VMEM((Ls, Bk), jnp.float32),
        ],
        interpret=interpret,
    )(_len_lb(lengths_p, Bk), fs, total, M, tmaxr2, biasrot, invdrot)
    return jnp.swapaxes(betas[:T], 1, 2)[:, :B, :L]


def _seg_grad_kernel(TB, Dmax, Tlim, len_ref, g_ref, logz_ref, fs_ref,
                     alpha_ref, beta_ref, PT_ref, tmax_ref, biasrot_ref,
                     invdrot_ref,
                     A_ref, S_ref, Sfin_ref, Ffin_ref, gdacc_ref, gt_ref,
                     alpha_buf, cs_buf, q_buf, scale_buf, cumrun):
    # Ascending TB-frame blocks: xi[t, d] for all d in VMEM, accumulating
    # the gradient pieces (ops.segmental_stream._grad_scan, in-kernel),
    # on static circular slots (see _tblk; masks and rolls fall out of
    # initialization exactly as in _seg_fwd_kernel).
    #
    # The U^T V transition contraction no longer runs a (Dmax*B, L)-row
    # dot per frame (Dmax-fold redundant K — 8 MXU K-tiles at production
    # shape): factored by SOURCE frame u,
    #   gt[p, l] = sum_u exp(alpha[u, p] - m_u) * F[u, l],
    #   F[u, l]  = sum_d g * exp(x_v[u+d+1, d, l] + m_u),
    # F accumulates in LINEAR space in the slot for u (safe: x_v + m_u <=
    # max|trans| + log-margin, see scale note below), and the (B, L)^T
    # (B, L) contraction (ONE K=B MXU pass) fires when the slot retires —
    # at the end of frame u + Dmax, exactly when the slot is overwritten.
    # Init-era slot garbage (d > t) and the virtual-start pseudo-slot
    # (d == t, excluded from the trans grad) die in slot resets before
    # their first retirement, so the r4 masks are structural here too.
    #
    # Scale note: m_u = max_l alpha[u, l] (stored per-slot at write time);
    # exp(x_v + m_u) <= exp(max|trans|)-ish because alpha[u, p*] + x_v is
    # a path posterior term bounded by ~logZ.  NEG_INF is a finite
    # sentinel, so -1e30 + 1e30 = 0 -> exp = 1 pairs with F = 0 (no inf).
    i = pl.program_id(0)
    L, B = cs_buf.shape[1:]

    @pl.when(i == 0)
    def _():
        alpha_buf[:] = jnp.full_like(alpha_buf, NEG_INF)
        q_buf[:] = jnp.full_like(q_buf, NEG_INF)
        q_buf[Dmax - 1] = jnp.zeros((L, B), q_buf.dtype)  # u = -1: one
        cs_buf[:] = jnp.zeros_like(cs_buf)
        scale_buf[:] = jnp.full_like(scale_buf, NEG_INF)
        cumrun[:] = jnp.zeros_like(cumrun)
        Sfin_ref[:] = jnp.zeros_like(Sfin_ref)
        Ffin_ref[:] = jnp.zeros_like(Ffin_ref)
        gdacc_ref[:] = jnp.zeros_like(gdacc_ref)
        gt_ref[:] = jnp.zeros_like(gt_ref)

    for k in range(TB):
        t = i * TB + k
        r = k % Dmax
        cum_now = cumrun[:] + fs_ref[k]                     # (L, B)
        cumrun[:] = cum_now
        alpha_t = alpha_ref[k]
        beta_t = beta_ref[k]
        lenv = len_ref[0:1, :]                              # (1, B)
        gB = g_ref[0:1, :][None]                            # (1, 1, B)

        invd = invdrot_ref[r][:, 0:1].reshape(Dmax, 1, 1)
        seg = (cum_now[None] - cs_buf[:]) * invd \
            + biasrot_ref[r].reshape(Dmax, L, 1)
        x_v = seg + (beta_t - logz_ref[0:1, :])[None]       # (Dmax, L, B)
        valid = (lenv > t)[None]
        xi_g = jnp.where(valid, jnp.exp(q_buf[:] + x_v) * gB, 0.0)

        y = invd * xi_g
        A_ref[k] = jnp.sum(y, axis=0)
        Sfin_ref[:] = Sfin_ref[:] + y
        # duration-resolved xi accumulation (duration d lives in slot
        # (r - 1 - d) mod Dmax this frame — a static permutation)
        for d in range(Dmax):
            s = (r - 1 - d) % Dmax
            gdacc_ref[d] = gdacc_ref[d] + xi_g[s]
        # F accumulation: exp(x_v + m_u) per slot, linear space
        Ffin_ref[:] = Ffin_ref[:] + jnp.where(
            valid, jnp.exp(x_v + scale_buf[:, 0:1, :]), 0.0)

        @pl.when(t < Tlim)
        def _():
            # S emission: slot r holds completed S[t - Dmax + 1]
            S_ref[k] = Sfin_ref[r]
            Sfin_ref[r] = jnp.zeros((L, B), jnp.float32)

            # retire slot r (source frame u = t - Dmax): one K=B MXU pass
            def _retire():
                a_u = alpha_buf[r]
                U = jnp.exp(a_u - scale_buf[r][0:1, :])     # (L=p, B)
                V = Ffin_ref[r] * g_ref[0:1, :]             # (L=l, B)
                gt_ref[:] = gt_ref[:] + jax.lax.dot_general(
                    U, V, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (p, l)
            if k >= Dmax:
                _retire()
            else:
                pl.when(i > 0)(_retire)
            Ffin_ref[r] = jnp.zeros((L, B), jnp.float32)

            # window writes: frame t lands in slot r = t mod Dmax
            m_t = jnp.maximum(jnp.max(alpha_t, axis=0, keepdims=True),
                              NEG_INF)                      # (1, B)
            q_t = m_t + tmax_ref[:, 0:1] + jnp.log(jnp.maximum(
                jnp.dot(PT_ref[:], jnp.exp(alpha_t - m_t),
                        preferred_element_type=jnp.float32), 1e-38))
            q_buf[r] = q_t
            alpha_buf[r] = alpha_t
            cs_buf[r] = cum_now
            scale_buf[r] = jnp.broadcast_to(m_t, scale_buf[r].shape)


@functools.partial(jax.jit, static_argnames=("max_dur", "mean_pool",
                                             "interpret"))
def segmental_grad_pallas(frame_scores_tm, trans, bias, lengths, alphas,
                          betas, logZ, g,
                          max_dur: int, mean_pool: bool = True,
                          interpret: bool = False):
    """Fused xi pass: raw gradient pieces for the streaming SCRF VJP.

    Returns ``(A (T,B,L), S_emit (T,B,L), acc_fin (Dmax,B,L), gd (Dmax,L),
    gt (L,L))`` matching ops.segmental_stream._grad_scan (assembled there
    by ``_assemble_frame_grad`` / the exp(trans) contraction finish).

    Slot bookkeeping finished here on XLA (all static index juggling):
    the S leftovers come back slot-ordered (acc_fin[j] = slot of start
    frame T-j), and the last Dmax source frames' U^T V terms — whose
    slots never retire in-kernel — are contracted here from the returned
    F accumulators (same per-slot scale as in-kernel: m_u recomputed
    from the padded transposed alphas, bit-identical).

    ``frame_scores_tm``: (T, B, L) per-frame scores — cumulative scores
    accumulate in-kernel (r5, see segmental_backward_pallas)."""
    T, B, L = frame_scores_tm.shape
    Dmax = max_dur
    Ls, Bk, bias, trans_p, lengths_p = _pad_seg_lb(
        L, B, trans, lengths, bias, None, Dmax)
    TB = _tblk(Dmax)
    Tp = _round_up(T, TB)
    fs = jnp.swapaxes(frame_scores_tm, 1, 2)
    if (Ls, Bk) != (L, B):
        fs = jnp.pad(fs, ((0, 0), (0, Ls - L), (0, Bk - B)))
    if Tp != T:
        fs = jnp.pad(fs, ((0, Tp - T), (0, 0), (0, 0)))

    def _lb(x):                               # (T,B,L) -> (Tp, Ls, Bk)
        x = jnp.swapaxes(x, 1, 2)
        return jnp.pad(x, ((0, Tp - T), (0, Ls - L), (0, Bk - B)),
                       constant_values=NEG_INF)

    alphas = _lb(alphas)
    betas = _lb(betas)
    if Bk != B:
        logZ = jnp.pad(logZ, (0, Bk - B))
        g = jnp.pad(g, (0, Bk - B))                         # 0: inert rows
    tmax = jnp.maximum(jnp.max(trans_p, axis=0), NEG_INF)
    PT = jnp.exp(trans_p - tmax[None, :]).T
    tmax2 = jnp.broadcast_to(tmax[:, None], (Ls, _LANE))
    g2d = jnp.broadcast_to(g.astype(jnp.float32)[None, :],
                           (_SUBLANE, Bk))
    logz2d = jnp.broadcast_to(logZ.astype(jnp.float32)[None, :],
                              (_SUBLANE, Bk))
    invd = (1.0 / (jnp.arange(Dmax) + 1.0) if mean_pool
            else jnp.ones(Dmax))
    biasrot, invdrot = _rot_tables(bias, invd.astype(jnp.float32), Dmax)
    invdrot = jnp.broadcast_to(invdrot[..., None], (Dmax, Dmax, _LANE))

    whole = lambda i: (0, 0)
    whole3 = lambda i: (0, 0, 0)
    row = lambda i: (i, 0, 0)
    A, S_emit, S_fin, F_fin, gd_acc, gt = pl.pallas_call(
        functools.partial(_seg_grad_kernel, TB, Dmax, T),
        grid=(Tp // TB,),
        in_specs=[
            pl.BlockSpec((_SUBLANE, Bk), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, Bk), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, Bk), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Ls, Bk), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Ls, Bk), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Ls, Bk), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls, Ls), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls, _LANE), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Dmax, Ls), whole3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Dmax, _LANE), whole3,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, Ls, Bk), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Ls, Bk), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Ls, Bk), whole3, memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Ls, Bk), whole3, memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Ls, Bk), whole3, memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls, Ls), whole, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Ls, Bk), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Ls, Bk), jnp.float32),
            jax.ShapeDtypeStruct((Dmax, Ls, Bk), jnp.float32),
            jax.ShapeDtypeStruct((Dmax, Ls, Bk), jnp.float32),
            jax.ShapeDtypeStruct((Dmax, Ls, Bk), jnp.float32),
            jax.ShapeDtypeStruct((Ls, Ls), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Dmax, Ls, Bk), jnp.float32),
            pltpu.VMEM((Dmax, Ls, Bk), jnp.float32),
            pltpu.VMEM((Dmax, Ls, Bk), jnp.float32),
            pltpu.VMEM((Dmax, _SUBLANE, Bk), jnp.float32),
            pltpu.VMEM((Ls, Bk), jnp.float32),
        ],
        interpret=interpret,
    )(_len_lb(lengths_p, Bk), g2d, logz2d, fs, alphas, betas, PT, tmax2,
      biasrot, invdrot)

    import numpy as np
    # S leftovers: slot of start frame u' = T - j is (u' - 1) mod Dmax
    sj = (T - 1 - np.arange(Dmax)) % Dmax
    acc_fin = S_fin[jnp.asarray(sj)]
    gd = jnp.sum(gd_acc, axis=2)                               # (Dmax, Ls)
    # drain: slots never retired hold source frames u(s) = largest
    # u ≡ s (mod Dmax) with u <= T-1; alpha rows for u < 0 were never
    # written (init NEG_INF) -> their exp-scale product is exactly 0
    u_of = T - 1 - ((T - 1 - np.arange(Dmax)) % Dmax)
    live = u_of >= 0
    u_idx = jnp.asarray(np.where(live, u_of, 0))
    a_u = alphas[u_idx]                                        # (Dmax,Ls,Bk)
    m_u = jnp.maximum(jnp.max(a_u, axis=1, keepdims=True), NEG_INF)
    U = jnp.where(jnp.asarray(live)[:, None, None],
                  jnp.exp(a_u - m_u), 0.0)
    V = F_fin * g.astype(jnp.float32)[None, None, :]
    gt = gt + jnp.einsum("spb,slb->pl", U, V,
                         preferred_element_type=jnp.float32)
    A = jnp.swapaxes(A[:T], 1, 2)[:, :B, :L]
    S_emit = jnp.swapaxes(S_emit[:T], 1, 2)[:, :B, :L]
    return (A, S_emit, jnp.swapaxes(acc_fin, 1, 2)[:, :B, :L],
            gd[:, :L], gt[:L, :L])


# ---------------------------------------------------------------------------
# segmental max-plus decode (streaming Viterbi forward)
# ---------------------------------------------------------------------------

def _seg_vit_kernel(TB, Dmax, thr, len_ref, fs_ref, transS_ref,
                    biasrot_ref, invdrot_ref, deltas_ref, argd_ref, M_buf,
                    cs_buf, cumrun):
    """Max-plus analogue of the forward kernel with the M-window
    restructure: the duration message ``max_p delta[t-1-d, p] + trans[p,l]``
    depends only on ``u = t-1-d``, so ONE (L, L, B) max-plus per frame
    (computed when frame u's delta is emitted) rides the window — the
    naive per-frame (Dmax, L, L, B) tensor never exists.  Static circular
    slots and transposed (L, B) planes as in _seg_fwd_kernel (rolls and
    the d == t / d > t masks fall out of initialization); the duration
    argmax minimizes the REAL duration d = (t-1-s) mod Dmax over slots,
    preserving the XLA path's shortest-duration tie-break.
    ``transS_ref``: (L=p, L=l, 1) slab-major transitions so the
    predecessor max-plus is pure broadcasting (the r4 (B, L) layout paid
    a lane->sublane relayout per frame here).  Emits deltas and the
    duration argmax; predecessor argmaxes are re-derived per segment
    jump in the traceback."""
    i = pl.program_id(0)
    L, B = cs_buf.shape[1:]

    @pl.when(i == 0)
    def _():
        M_buf[:] = jnp.full_like(M_buf, NEG_INF)
        M_buf[Dmax - 1] = jnp.zeros((L, B), M_buf.dtype)  # u = -1: one
        cs_buf[:] = jnp.zeros_like(cs_buf)
        cumrun[:] = jnp.zeros_like(cumrun)

    for k in range(TB):
        t = i * TB + k
        r = k % Dmax
        cum_now = cumrun[:] + fs_ref[k]                     # (L, B)
        cumrun[:] = cum_now
        invd = invdrot_ref[r][:, 0:1].reshape(Dmax, 1, 1)
        seg = (cum_now[None] - cs_buf[:]) * invd \
            + biasrot_ref[r].reshape(Dmax, L, 1)
        cand = M_buf[:] + seg                               # (Dmax, L, B)
        delta_t = jnp.max(cand, axis=0)
        # real duration of slot s at this frame: d = (r - 1 - s) mod Dmax
        si = jax.lax.broadcasted_iota(jnp.int32, (Dmax, 1, 1), 0)
        d_of = r - 1 - si
        d_of = jnp.where(d_of < 0, d_of + Dmax, d_of)
        argd = jnp.min(jnp.where(cand == delta_t[None], d_of, Dmax),
                       axis=0)
        if thr is not None:
            rowm = jnp.max(delta_t, axis=0, keepdims=True)
            delta_t = jnp.where(delta_t >= rowm - thr, delta_t, NEG_INF)
        valid = len_ref[0:1, :] > t
        delta_t = jnp.where(valid, delta_t, NEG_INF)
        deltas_ref[k] = delta_t
        argd_ref[k] = argd

        # message window for later frames: max over predecessor slabs
        cand_p = delta_t[:, None, :] + transS_ref[:]        # (p, l, B)
        M_buf[r] = jnp.max(cand_p, axis=0)                  # (L, B)
        cs_buf[r] = cum_now


@functools.partial(jax.jit, static_argnames=("max_dur", "mean_pool",
                                             "beam_threshold", "interpret"))
def segmental_viterbi_pallas(frame_scores_tm, trans, dur_bias, seg_bias,
                             lengths, max_dur: int, mean_pool: bool = True,
                             beam_threshold: float | None = None,
                             interpret: bool = False):
    """Streaming segmental Viterbi forward.  Returns
    (deltas (T, B, L), arg_d (T, B, L) int32, lab0 (B,), scores (B,)) for
    the XLA traceback.  ``beam_threshold``: score-margin pruning on the
    per-frame deltas (None = exact)."""
    T, B, L = frame_scores_tm.shape
    Dmax = max_dur
    Ls, Bk, bias, trans_p, lengths_p = _pad_seg_lb(
        L, B, trans, lengths, dur_bias, seg_bias, Dmax)
    fs = jnp.swapaxes(frame_scores_tm, 1, 2)
    if (Ls, Bk) != (L, B):
        fs = jnp.pad(fs, ((0, 0), (0, Ls - L), (0, Bk - B)))
    TB = _tblk(Dmax)
    Tp = _round_up(T, TB)
    if Tp != T:
        fs = jnp.pad(fs, ((0, Tp - T), (0, 0), (0, 0)))
    invd = (1.0 / (jnp.arange(Dmax) + 1.0) if mean_pool
            else jnp.ones(Dmax))
    biasrot, invdrot = _rot_tables(bias, invd.astype(jnp.float32), Dmax)
    invdrot = jnp.broadcast_to(invdrot[..., None], (Dmax, Dmax, _LANE))
    transS = trans_p[:, :, None]                            # (p, l, 1)

    deltas, argd = pl.pallas_call(
        functools.partial(_seg_vit_kernel, TB, Dmax, beam_threshold),
        grid=(Tp // TB,),
        in_specs=[
            pl.BlockSpec((_SUBLANE, Bk), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Ls, Bk), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls, Ls, 1), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Dmax, Ls), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Dmax, _LANE), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, Ls, Bk), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Ls, Bk), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Ls, Bk), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Ls, Bk), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Dmax, Ls, Bk), jnp.float32),
            pltpu.VMEM((Dmax, Ls, Bk), jnp.float32),
            pltpu.VMEM((Ls, Bk), jnp.float32),
        ],
        interpret=interpret,
    )(_len_lb(lengths_p, Bk), fs, transS, biasrot, invdrot)

    deltas = jnp.swapaxes(deltas[:T], 1, 2)[:, :B, :L]
    argd = jnp.swapaxes(argd[:T], 1, 2)[:, :B, :L]
    # clip the final-frame gather and mask zero-length rows to NEG_INF,
    # matching the XLA seg_viterbi_stream (a raw lengths-1 would index
    # frame -1 and return garbage scores for length-0 padding rows)
    lastf = jnp.clip(lengths[:B] - 1, 0)
    last = jnp.take_along_axis(
        deltas, lastf[None, :, None].astype(jnp.int32)
        .repeat(L, axis=2), axis=0)[0]                      # (B, L)
    live = lengths[:B] > 0
    scores = jnp.where(live, jnp.max(last, axis=-1), NEG_INF)
    lab0 = jnp.where(live, jnp.argmax(last, axis=-1), 0).astype(jnp.int32)
    return deltas, argd, lab0, scores


def _seg_vit_tb_kernel(TB, len_ref, lab0_ref, deltas_ref, argd_ref,
                       trans_ref, out_lab_ref, out_start_ref, cur_t,
                       pending):
    """Segment traceback as a descending frame grid (single launch — the
    vmapped while_loop traceback is iteration-launch-bound on TPU), TB
    frames per grid step (r5: 512 one-frame steps paid ~0.7 us of pure
    per-step overhead each — 6x the kernel's compute).

    Deferred-resolution trick: when a segment [start, t] is identified at
    frame t, its PREDECESSOR's argmax needs deltas[start-1] — not loaded
    yet.  Instead of gathering across frames, the carry records
    ``cur_t = start-1`` and the ended segment's label; when the loop
    reaches frame start-1 its delta row is resident and the predecessor
    argmax (and that segment's own duration lookup) happen locally.

    Orientation: transposed (L, B) planes like the rest of the family —
    labels on sublanes, batch on lanes; (1, B) carries broadcast along
    sublanes.  ``trans_ref`` is the plain (L=p, L=l) transition matrix
    (the one-hot contraction below wants p rows out).
    """
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    L, B = deltas_ref.shape[1:]
    lab = jax.lax.broadcasted_iota(jnp.int32, (L, B), 0)

    @pl.when(i == 0)
    def _():
        cur_t[:] = len_ref[:] - 1
        pending[:] = jnp.full_like(pending, -1)

    for j in range(TB):
        k = TB - 1 - j
        t = (nb - 1 - i) * TB + k
        # padded tail frames (t >= the real T) are inert: cur_t starts at
        # length-1 < t, so `active` is false and the carries pass through
        active = cur_t[0:1, :] == t                          # (1, B)
        delta_u = deltas_ref[k]                              # (L, B)
        # trans column for each row's pending label:
        # v2[p, b] = trans[p, lab_b]
        onehot = jnp.where(lab == pending[0:1, :], 1.0, 0.0)
        v2 = jnp.dot(trans_ref[:], onehot,
                     preferred_element_type=jnp.float32)     # (L=p, B)
        cand = delta_u + v2
        m = jnp.max(cand, axis=0, keepdims=True)
        prev = jnp.min(jnp.where(cand == m, lab, L), axis=0,
                       keepdims=True)                        # (1, B)
        first = pending[0:1, :] < 0                          # initial seg
        lab_end = jnp.where(first, lab0_ref[0:1, :], prev)
        lab_end = jnp.clip(lab_end, 0, L - 1)                # (1, B)
        hot = jnp.where(lab == lab_end, 1.0, 0.0)
        d = jnp.sum(argd_ref[k].astype(jnp.float32) * hot, axis=0,
                    keepdims=True).astype(jnp.int32)         # (1, B)
        start = t - d

        out_lab_ref[k] = jnp.broadcast_to(
            jnp.where(active, lab_end, -1), out_lab_ref[k].shape)
        out_start_ref[k] = jnp.broadcast_to(
            jnp.where(active, start, 0), out_start_ref[k].shape)
        cur_t[:] = jnp.where(active, start - 1, cur_t[:])
        pending[:] = jnp.where(active, lab_end, pending[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def segmental_viterbi_traceback_pallas(deltas, argd, trans, lab0, lengths,
                                       interpret: bool = False):
    """(T, B, L) deltas/argd -> per-frame segment-end markers
    ``(end_lab (T, B) int32, -1 where no segment ends; start (T, B))``."""
    T, B, L = deltas.shape
    Ls, Bk = _round_up(L, _SUBLANE), _round_up(B, _LANE)
    deltas = jnp.swapaxes(deltas, 1, 2)
    argd = jnp.swapaxes(argd, 1, 2)
    if (Ls, Bk) != (L, B):
        deltas = jnp.pad(deltas, ((0, 0), (0, Ls - L), (0, Bk - B)),
                         constant_values=NEG_INF)
        argd = jnp.pad(argd, ((0, 0), (0, Ls - L), (0, Bk - B)))
        trans = jnp.pad(trans, ((0, Ls - L),) * 2, constant_values=NEG_INF)
        lab0 = jnp.pad(lab0, (0, Bk - B))
        lengths = jnp.pad(lengths, (0, Bk - B), constant_values=0)
    len2 = jnp.broadcast_to(lengths[None, :].astype(jnp.int32),
                            (_SUBLANE, Bk))
    lab02 = jnp.broadcast_to(lab0[None, :].astype(jnp.int32),
                             (_SUBLANE, Bk))
    TB = _TBLK
    Tp = _round_up(T, TB)
    if Tp != T:
        deltas = jnp.pad(deltas, ((0, Tp - T), (0, 0), (0, 0)),
                         constant_values=NEG_INF)
        argd = jnp.pad(argd, ((0, Tp - T), (0, 0), (0, 0)))
    nb = Tp // TB
    out_lab, out_start = pl.pallas_call(
        functools.partial(_seg_vit_tb_kernel, TB),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_SUBLANE, Bk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, Bk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Ls, Bk), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Ls, Bk), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls, Ls), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, _SUBLANE, Bk), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, _SUBLANE, Bk), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, _SUBLANE, Bk), jnp.int32),
            jax.ShapeDtypeStruct((Tp, _SUBLANE, Bk), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((_SUBLANE, Bk), jnp.int32),
                        pltpu.VMEM((_SUBLANE, Bk), jnp.int32)],
        interpret=interpret,
    )(len2, lab02, deltas, argd, trans)
    return out_lab[:T, 0, :B], out_start[:T, 0, :B]
