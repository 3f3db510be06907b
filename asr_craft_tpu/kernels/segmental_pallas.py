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


_TBLK = 8   # frames per grid step: amortizes per-step issue/DMA overhead
            # (r4: grid=(T,) cost ~2-3 us/step of pure overhead x 512)


def _seg_fwd_kernel(TB, len_ref, cum_ref, P_ref, tmax_ref, bias_ref,
                    invd_ref, alphas_ref, q_buf, cum_buf):
    # Grid: (Tp/TB,); step i processes frames t = i*TB + k, consuming
    # cum[t+1] and emitting alpha[t].
    #
    # The duration message for (t, d) is q[t-1-d] where
    #   q[u] = m_u + tmax + log(exp(alpha[u] - m_u) @ P)
    # depends only on u — so q is computed ONCE per frame on (B, L) and
    # rolled, instead of re-running the (Dmax*B, L) @ (L, L) dot over the
    # whole alpha window every frame (Dmax-fold redundant MXU + exp work;
    # identical numerics — same per-row max).  The Viterbi kernel has
    # used the same M-window restructure since r3.
    # q_buf[j] = q[t-1-j]; cum_buf[j] = cum[t-j]   (j < Dmax)
    i = pl.program_id(0)
    Dmax, B, L = q_buf.shape

    @pl.when(i == 0)
    def _():
        q_buf[:] = jnp.full_like(q_buf, NEG_INF)
        cum_buf[:] = jnp.zeros_like(cum_buf)   # cum[0] = 0

    for k in range(TB):
        t = i * TB + k
        cum_now = cum_ref[k]                                # (B, L): cum[t+1]

        msg = q_buf[:]                                      # (Dmax, B, L)
        # d == t: segment starts at frame 0 — no predecessor (semiring
        # one); d > t: structurally invalid.
        ds = jax.lax.broadcasted_iota(jnp.int32, (Dmax, 1, 1), 0)
        msg = jnp.where(ds == t, 0.0, msg)
        msg = jnp.where(ds > t, NEG_INF, msg)

        # segment potentials from the cumulative window
        invd = invd_ref[:, 0:1].reshape(Dmax, 1, 1)
        seg = (cum_now[None] - cum_buf[:]) * invd \
            + bias_ref[:].reshape(Dmax, 1, L)               # (Dmax, B, L)

        cand = msg + seg
        cm = jnp.maximum(jnp.max(cand, axis=0), NEG_INF)    # (B, L)
        alpha_t = cm + jnp.log(jnp.maximum(
            jnp.sum(jnp.exp(cand - cm[None]), axis=0), 1e-38))
        # padded frames: alpha stays NEG_INF (never read; logZ gathers
        # length-1)
        valid = len_ref[:, 0:1] > t
        alpha_t = jnp.where(valid, alpha_t, NEG_INF)

        alphas_ref[k] = alpha_t
        # this frame's outgoing message: one (B, L) @ (L, L) MXU dot
        m_t = jnp.maximum(jnp.max(alpha_t, axis=-1, keepdims=True),
                          NEG_INF)
        q_t = m_t + tmax_ref[0:1, :] + jnp.log(jnp.maximum(
            jnp.dot(jnp.exp(alpha_t - m_t), P_ref[:],
                    preferred_element_type=jnp.float32), 1e-38))
        # roll windows: newest first
        q_buf[:] = jnp.concatenate([q_t[None], q_buf[:-1]], axis=0)
        cum_buf[:] = jnp.concatenate([cum_now[None], cum_buf[:-1]], axis=0)


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
    """
    T, B, L = frame_scores_tm.shape
    Bp, Lp = _round_up(B, _SUBLANE), _round_up(L, _LANE)
    Dmax = max_dur
    fs = frame_scores_tm
    if (Bp, Lp) != (B, L):
        # padded labels contribute only through bias terms -> NEG_INF them
        fs = jnp.pad(fs, ((0, 0), (0, Bp - B), (0, Lp - L)))
        trans = jnp.pad(trans, ((0, Lp - L),) * 2, constant_values=NEG_INF)
        lengths = jnp.pad(lengths, (0, Bp - B), constant_values=1)
    bias = jnp.zeros((Dmax, Lp), jnp.float32)
    if dur_bias is not None:
        bias = bias.at[:, :L].add(dur_bias)
    if seg_bias is not None:
        bias = bias.at[:, :L].add(seg_bias[None, :])
    if Lp != L:
        bias = bias.at[:, L:].set(NEG_INF)

    TB = _TBLK
    Tp = _round_up(T, TB)
    if Tp != T:
        fs = jnp.pad(fs, ((0, Tp - T), (0, 0), (0, 0)))
    cum = jnp.cumsum(fs, axis=0)                            # cum[t] = sum 0..t
    tmax = jnp.maximum(jnp.max(trans, axis=0), NEG_INF)
    P = jnp.exp(trans - tmax[None, :])
    tmax8 = jnp.broadcast_to(tmax[None, :], (_SUBLANE, Lp))
    invd = (1.0 / (jnp.arange(Dmax) + 1.0) if mean_pool
            else jnp.ones(Dmax))
    invd2d = jnp.broadcast_to(invd[:, None].astype(jnp.float32),
                              (Dmax, _LANE))
    len2d = jnp.broadcast_to(lengths[:, None].astype(jnp.int32),
                             (Bp, _LANE))

    [alphas] = pl.pallas_call(
        functools.partial(_seg_fwd_kernel, TB),
        grid=(Tp // TB,),
        in_specs=[
            pl.BlockSpec((Bp, _LANE), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Bp, Lp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, Lp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, Lp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Lp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, _LANE), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, Bp, Lp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((Tp, Bp, Lp), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((Dmax, Bp, Lp), jnp.float32),
            pltpu.VMEM((Dmax, Bp, Lp), jnp.float32),
        ],
        interpret=interpret,
    )(len2d, cum, P, tmax8, bias, invd2d)
    alphas = alphas[:T]

    alphas = alphas[:, :B, :L]
    last = jnp.take_along_axis(
        alphas, (lengths[:B] - 1)[None, :, None].astype(jnp.int32)
        .repeat(L, axis=2), axis=0)[0]                       # (B, L)
    m = jnp.maximum(jnp.max(last, axis=-1, keepdims=True), NEG_INF)
    logZ = (m + jnp.log(jnp.maximum(
        jnp.sum(jnp.exp(last - m), axis=-1, keepdims=True), 1e-38)))[:, 0]
    return alphas, logZ


def _pad_seg_inputs(cum, trans, bias, lengths):
    """Shared padding for the backward kernels: (Bp, Lp) tiles, NEG_INF
    semantics for padded labels, length-1 padded batch rows."""
    T, B, L = cum.shape
    Bp, Lp = _round_up(B, _SUBLANE), _round_up(L, _LANE)
    if (Bp, Lp) != (B, L):
        cum = jnp.pad(cum, ((0, 0), (0, Bp - B), (0, Lp - L)))
        trans = jnp.pad(trans, ((0, Lp - L),) * 2, constant_values=NEG_INF)
        bias = jnp.pad(bias, ((0, 0), (0, Lp - L)), constant_values=NEG_INF)
        lengths = jnp.pad(lengths, (0, Bp - B), constant_values=1)
    return cum, trans, bias, lengths, Bp, Lp


def _invd2d(max_dur, mean_pool):
    invd = (1.0 / (jnp.arange(max_dur) + 1.0) if mean_pool
            else jnp.ones(max_dur))
    return jnp.broadcast_to(invd[:, None].astype(jnp.float32),
                            (max_dur, _LANE))


def _len2d(lengths, Bp):
    return jnp.broadcast_to(lengths[:, None].astype(jnp.int32), (Bp, _LANE))


def _seg_bwd_kernel(TB, len_ref, cum_ref, M_ref, tmaxr_ref, bias_ref,
                    invd_ref, betas_ref, beta_buf, cs_buf):
    # Descending grid over TB-frame blocks: step i handles block nb-1-i,
    # frames t descending inside; consumes cum[t] = CS[t+1].
    # beta_buf[j] = beta[t+1+j]; cs_buf[j] = CS[t+2+j].
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    base = (nb - 1 - i) * TB
    Dmax, B, L = beta_buf.shape

    @pl.when(i == 0)
    def _():
        beta_buf[:] = jnp.full_like(beta_buf, NEG_INF)
        cs_buf[:] = jnp.zeros_like(cs_buf)

    for j in range(TB):
        k = TB - 1 - j
        t = base + k
        cs_next = cum_ref[k]                                # (B, L): CS[t+1]
        invd = invd_ref[:, 0:1].reshape(Dmax, 1, 1)
        seg_next = (cs_buf[:] - cs_next[None]) * invd \
            + bias_ref[:].reshape(Dmax, 1, L)               # seg (t+d+1, d)
        w = seg_next + beta_buf[:]
        mw = jnp.maximum(jnp.max(w, axis=-1, keepdims=True), NEG_INF)
        prod = jnp.dot(jnp.exp(w - mw).reshape(Dmax * B, L), M_ref[:],
                       preferred_element_type=jnp.float32
                       ).reshape(Dmax, B, L)
        msg = mw + tmaxr_ref[0:1, :][None] + jnp.log(
            jnp.maximum(prod, 1e-38))
        cm = jnp.maximum(jnp.max(msg, axis=0), NEG_INF)     # (B, L)
        beta_t = cm + jnp.log(jnp.maximum(
            jnp.sum(jnp.exp(msg - cm[None]), axis=0), 1e-38))
        lenv = len_ref[:, 0:1]
        beta_t = jnp.where(t == lenv - 1, 0.0, beta_t)
        beta_t = jnp.where(t >= lenv, NEG_INF, beta_t)

        betas_ref[k] = beta_t
        beta_buf[:] = jnp.concatenate([beta_t[None], beta_buf[:-1]],
                                      axis=0)
        cs_buf[:] = jnp.concatenate([cs_next[None], cs_buf[:-1]], axis=0)


@functools.partial(jax.jit, static_argnames=("max_dur", "mean_pool",
                                             "interpret"))
def segmental_backward_pallas(cum, trans, bias, lengths, max_dur: int,
                              mean_pool: bool = True,
                              interpret: bool = False):
    """Fused SCRF beta pass.  ``cum``: (T, B, L) inclusive cumulative frame
    scores; ``bias``: (Dmax, L) combined segment bias.  Returns betas
    (T, B, L) — allclose to ops.segmental_stream.seg_backward_stream."""
    T, B, L = cum.shape
    Dmax = max_dur
    cum, trans, bias, lengths, Bp, Lp = _pad_seg_inputs(
        cum, trans, bias, lengths)
    tmax_row = jnp.maximum(jnp.max(trans, axis=1), NEG_INF)
    M = jnp.exp(trans - tmax_row[:, None]).T
    tmaxr8 = jnp.broadcast_to(tmax_row[None, :], (_SUBLANE, Lp))

    TB = _TBLK
    Tp = _round_up(T, TB)
    if Tp != T:
        cum = jnp.pad(cum, ((0, Tp - T), (0, 0), (0, 0)), mode="edge")
    nb = Tp // TB
    [betas] = pl.pallas_call(
        functools.partial(_seg_bwd_kernel, TB),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Bp, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Bp, Lp), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, Lp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, Lp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Lp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, Bp, Lp), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((Tp, Bp, Lp), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((Dmax, Bp, Lp), jnp.float32),
            pltpu.VMEM((Dmax, Bp, Lp), jnp.float32),
        ],
        interpret=interpret,
    )(_len2d(lengths, Bp), cum, M, tmaxr8, bias, _invd2d(Dmax, mean_pool))
    return betas[:T, :B, :L]


def _seg_grad_kernel(TB, Tlim, len_ref, g_ref, logz_ref, cum_ref, alpha_ref,
                     beta_ref, P_ref, tmax_ref, bias_ref, invd_ref,
                     A_ref, S_ref, acc_ref, gt_ref, gd_ref,
                     alpha_buf, cs_buf, q_buf):
    # Ascending TB-frame blocks: xi[t, d] for all d in VMEM, accumulating
    # the gradient pieces (ops.segmental_stream._grad_scan, in-kernel).
    # pred[t, d] = q[t-1-d] rides a rolled q window computed once per
    # frame (see _seg_fwd_kernel); the raw alpha window stays for the
    # U^T V transition contraction.
    i = pl.program_id(0)
    Dmax, B, L = alpha_buf.shape

    @pl.when(i == 0)
    def _():
        alpha_buf[:] = jnp.full_like(alpha_buf, NEG_INF)
        q_buf[:] = jnp.full_like(q_buf, NEG_INF)
        cs_buf[:] = jnp.zeros_like(cs_buf)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        gt_ref[:] = jnp.zeros_like(gt_ref)
        gd_ref[:] = jnp.zeros_like(gd_ref)

    for k in range(TB):
        t = i * TB + k
        cum_now = cum_ref[k]
        alpha_t = alpha_ref[k]
        beta_t = beta_ref[k]
        lenv = len_ref[:, 0:1]                              # (B, 1)
        gB = g_ref[:, 0:1][None]                            # (1, B, 1)
        ds = jax.lax.broadcasted_iota(jnp.int32, (Dmax, 1, 1), 0)

        pred = q_buf[:]
        pred = jnp.where(ds == t, 0.0, pred)
        pred = jnp.where(ds > t, NEG_INF, pred)
        m = jnp.maximum(jnp.max(alpha_buf[:], axis=-1, keepdims=True),
                        NEG_INF)

        invd = invd_ref[:, 0:1].reshape(Dmax, 1, 1)
        seg = (cum_now[None] - cs_buf[:]) * invd \
            + bias_ref[:].reshape(Dmax, 1, L)
        x_v = seg + (beta_t - logz_ref[:, 0:1])[None]       # (Dmax, B, L)
        valid = (lenv > t)[None]
        xi_g = jnp.where(valid, jnp.exp(pred + x_v) * gB, 0.0)

        acc = acc_ref[:] + invd * xi_g
        S_ref[k] = acc[Dmax - 1]

        # the roll count must be exactly Tlim (the real T): the assembler
        # reads acc_fin as "acc after T rolls"; padded tail frames (t >=
        # Tlim, xi identically 0) must not shift it further
        @pl.when(t < Tlim)
        def _(acc=acc):
            acc_ref[:] = jnp.concatenate(
                [jnp.zeros((1, B, L), acc.dtype), acc[:-1]], axis=0)

        A_ref[k] = jnp.sum(invd * xi_g, axis=0)
        gd_ref[:] = gd_ref[:] + jnp.sum(xi_g, axis=1)

        # trans contraction: xi over (p, l) = U^T V * exp(trans)
        # (finished on host)
        mV = jnp.maximum(jnp.max(x_v, axis=-1, keepdims=True), NEG_INF)
        w_sc = jnp.exp(m + mV) * gB
        w_sc = jnp.where(valid & (ds < t), w_sc, 0.0)
        U = (jnp.exp(alpha_buf[:] - m) * w_sc).reshape(Dmax * B, L)
        V = jnp.exp(x_v - mV).reshape(Dmax * B, L)
        gt_ref[:] = gt_ref[:] + jax.lax.dot_general(
            U, V, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        m_t = jnp.maximum(jnp.max(alpha_t, axis=-1, keepdims=True),
                          NEG_INF)
        q_t = m_t + tmax_ref[0:1, :] + jnp.log(jnp.maximum(
            jnp.dot(jnp.exp(alpha_t - m_t), P_ref[:],
                    preferred_element_type=jnp.float32), 1e-38))
        q_buf[:] = jnp.concatenate([q_t[None], q_buf[:-1]], axis=0)
        alpha_buf[:] = jnp.concatenate([alpha_t[None], alpha_buf[:-1]],
                                       axis=0)
        cs_buf[:] = jnp.concatenate([cum_now[None], cs_buf[:-1]], axis=0)


@functools.partial(jax.jit, static_argnames=("max_dur", "mean_pool",
                                             "interpret"))
def segmental_grad_pallas(cum, trans, bias, lengths, alphas, betas, logZ, g,
                          max_dur: int, mean_pool: bool = True,
                          interpret: bool = False):
    """Fused xi pass: raw gradient pieces for the streaming SCRF VJP.

    Returns ``(A (T,B,L), S_emit (T,B,L), acc_fin (Dmax,B,L), gd (Dmax,L),
    gt (L,L))`` matching ops.segmental_stream._grad_scan (assembled there
    by ``_assemble_frame_grad`` / the exp(trans) contraction finish)."""
    T, B, L = cum.shape
    Dmax = max_dur
    cum, trans, bias, lengths, Bp, Lp = _pad_seg_inputs(
        cum, trans, bias, lengths)
    if (Bp, Lp) != (B, L):
        pad3 = ((0, 0), (0, Bp - B), (0, Lp - L))
        alphas = jnp.pad(alphas, pad3, constant_values=NEG_INF)
        betas = jnp.pad(betas, pad3, constant_values=NEG_INF)
        logZ = jnp.pad(logZ, (0, Bp - B))
        g = jnp.pad(g, (0, Bp - B))                         # 0: inert rows
    tmax = jnp.maximum(jnp.max(trans, axis=0), NEG_INF)
    P = jnp.exp(trans - tmax[None, :])
    tmax8 = jnp.broadcast_to(tmax[None, :], (_SUBLANE, Lp))
    g2d = jnp.broadcast_to(g.astype(jnp.float32)[:, None], (Bp, _LANE))
    logz2d = jnp.broadcast_to(logZ.astype(jnp.float32)[:, None],
                              (Bp, _LANE))

    TB = _TBLK
    Tp = _round_up(T, TB)
    if Tp != T:
        cum = jnp.pad(cum, ((0, Tp - T), (0, 0), (0, 0)), mode="edge")
        pad_t = ((0, Tp - T), (0, 0), (0, 0))
        alphas = jnp.pad(alphas, pad_t, constant_values=NEG_INF)
        betas = jnp.pad(betas, pad_t, constant_values=NEG_INF)
    whole = lambda i: (0, 0)
    whole3 = lambda i: (0, 0, 0)
    row = lambda i: (i, 0, 0)
    A, S_emit, acc_fin, gt, gd = pl.pallas_call(
        functools.partial(_seg_grad_kernel, TB, T),
        grid=(Tp // TB,),
        in_specs=[
            pl.BlockSpec((Bp, _LANE), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, _LANE), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, _LANE), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Bp, Lp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Bp, Lp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Bp, Lp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, Lp), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, Lp), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Lp), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, _LANE), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, Bp, Lp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Bp, Lp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Bp, Lp), whole3, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, Lp), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Lp), whole, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, Lp), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Bp, Lp), jnp.float32),
            jax.ShapeDtypeStruct((Dmax, Bp, Lp), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Lp), jnp.float32),
            jax.ShapeDtypeStruct((Dmax, Lp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Dmax, Bp, Lp), jnp.float32),
            pltpu.VMEM((Dmax, Bp, Lp), jnp.float32),
            pltpu.VMEM((Dmax, Bp, Lp), jnp.float32),
        ],
        interpret=interpret,
    )(_len2d(lengths, Bp), g2d, logz2d, cum, alphas, betas, P, tmax8,
      bias, _invd2d(Dmax, mean_pool))
    return (A[:T, :B, :L], S_emit[:T, :B, :L], acc_fin[:, :B, :L],
            gd[:, :L], gt[:L, :L])


# ---------------------------------------------------------------------------
# segmental max-plus decode (streaming Viterbi forward)
# ---------------------------------------------------------------------------

def _seg_vit_kernel(lsub, thr, len_ref, cum_ref, trans_ref, bias_ref,
                    invd_ref, deltas_ref, argd_ref, M_buf, cum_buf):
    """Max-plus analogue of the forward kernel with the M-window
    restructure: the duration message ``max_p delta[t-1-d, p] + trans[p,l]``
    depends only on ``u = t-1-d``, so ONE (B, lsub, L) max-plus per frame
    (computed when frame u's delta is emitted) rides a rolling (Dmax, B, L)
    window — the naive per-frame (Dmax, B, L, L) tensor never exists.
    Emits deltas and the duration argmax; predecessor argmaxes are
    re-derived per segment jump in the XLA traceback (ops.segmental_stream
    seg_viterbi_stream)."""
    i = pl.program_id(0)
    TB = deltas_ref.shape[0]
    Dmax, B, L = M_buf.shape

    @pl.when(i == 0)
    def _():
        M_buf[:] = jnp.full_like(M_buf, NEG_INF)
        cum_buf[:] = jnp.zeros_like(cum_buf)

    for k in range(TB):
        t = i * TB + k
        cum_now = cum_ref[k]                                # (B, L)
        ds = jax.lax.broadcasted_iota(jnp.int32, (Dmax, 1, 1), 0)
        msg = jnp.where(ds == t, 0.0, M_buf[:])
        msg = jnp.where(ds > t, NEG_INF, msg)
        invd = invd_ref[:, 0:1].reshape(Dmax, 1, 1)
        seg = (cum_now[None] - cum_buf[:]) * invd \
            + bias_ref[:].reshape(Dmax, 1, L)
        cand = msg + seg                                    # (Dmax, B, L)
        delta_t = jnp.max(cand, axis=0)
        di = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
        argd = jnp.min(jnp.where(cand == delta_t[None], di, Dmax), axis=0)
        if thr is not None:
            rowm = jnp.max(delta_t, axis=-1, keepdims=True)
            delta_t = jnp.where(delta_t >= rowm - thr, delta_t, NEG_INF)
        valid = len_ref[:, 0:1] > t
        delta_t = jnp.where(valid, delta_t, NEG_INF)
        deltas_ref[k] = delta_t
        argd_ref[k] = argd

        # message window for later frames (one max-plus, reduction over
        # the real predecessor rows only)
        dl = jax.lax.slice(delta_t, (0, 0), (B, lsub))
        cand_p = dl[:, :, None] + trans_ref[0:lsub, :][None, :, :]
        M_new = jnp.max(cand_p, axis=1)                     # (B, L)
        M_buf[:] = jnp.concatenate([M_new[None], M_buf[:-1]], axis=0)
        cum_buf[:] = jnp.concatenate([cum_now[None], cum_buf[:-1]], axis=0)


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
    Bp, Lp = _round_up(B, _SUBLANE), _round_up(L, _LANE)
    Dmax = max_dur
    fs = frame_scores_tm
    if (Bp, Lp) != (B, L):
        fs = jnp.pad(fs, ((0, 0), (0, Bp - B), (0, Lp - L)))
        trans = jnp.pad(trans, ((0, Lp - L),) * 2, constant_values=NEG_INF)
        lengths = jnp.pad(lengths, (0, Bp - B), constant_values=1)
    bias = jnp.zeros((Dmax, Lp), jnp.float32)
    if dur_bias is not None:
        bias = bias.at[:, :L].add(dur_bias)
    if seg_bias is not None:
        bias = bias.at[:, :L].add(seg_bias[None, :])
    if Lp != L:
        bias = bias.at[:, L:].set(NEG_INF)
    TB = _TBLK
    Tp = _round_up(T, TB)
    if Tp != T:
        fs = jnp.pad(fs, ((0, Tp - T), (0, 0), (0, 0)))
    cum = jnp.cumsum(fs, axis=0)
    invd = (1.0 / (jnp.arange(Dmax) + 1.0) if mean_pool
            else jnp.ones(Dmax))
    invd2d = jnp.broadcast_to(invd[:, None].astype(jnp.float32),
                              (Dmax, _LANE))
    len2d = jnp.broadcast_to(lengths[:, None].astype(jnp.int32),
                             (Bp, _LANE))
    lsub = _round_up(L, _SUBLANE)

    deltas, argd = pl.pallas_call(
        functools.partial(_seg_vit_kernel, lsub, beam_threshold),
        grid=(Tp // TB,),
        in_specs=[
            pl.BlockSpec((Bp, _LANE), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Bp, Lp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, Lp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, Lp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dmax, _LANE), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, Bp, Lp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Bp, Lp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, Lp), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Bp, Lp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Dmax, Bp, Lp), jnp.float32),
            pltpu.VMEM((Dmax, Bp, Lp), jnp.float32),
        ],
        interpret=interpret,
    )(len2d, cum, trans, bias, invd2d)

    deltas = deltas[:T, :B, :L]
    argd = argd[:T, :B, :L]
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


def _seg_vit_tb_kernel(len_ref, lab0_ref, deltas_ref, argd_ref,
                       transT_ref, out_lab_ref, out_start_ref, cur_t,
                       pending):
    """Segment traceback as a descending frame grid (single launch — the
    vmapped while_loop traceback is iteration-launch-bound on TPU).

    Deferred-resolution trick: when a segment [start, t] is identified at
    frame t, its PREDECESSOR's argmax needs deltas[start-1] — not loaded
    yet.  Instead of gathering across frames, the carry records
    ``cur_t = start-1`` and the ended segment's label; when the grid
    reaches frame start-1 its delta block is resident and the predecessor
    argmax (and that segment's own duration lookup) happen locally.

    Orientation: batch on sublanes everywhere ((B, 1) carries broadcast
    along lanes) — Mosaic has no general small-transpose lowering.
    ``transT_ref`` is trans^T, precomputed by the wrapper.
    """
    i = pl.program_id(0)
    T = pl.num_programs(0)
    t = T - 1 - i
    B, L = deltas_ref.shape[1:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

    @pl.when(i == 0)
    def _():
        cur_t[:] = len_ref[:] - 1
        pending[:] = jnp.full_like(pending, -1)

    active = cur_t[:, 0:1] == t                              # (B, 1)
    delta_u = deltas_ref[0]                                  # (B, L)
    # trans column for each row's pending label: v2[b, p] = trans[p, lab_b]
    onehot = jnp.where(lane == pending[:, 0:1], 1.0, 0.0)
    v2 = jnp.dot(onehot, transT_ref[:],
                 preferred_element_type=jnp.float32)         # (B, L=p)
    cand = delta_u + v2
    m = jnp.max(cand, axis=-1, keepdims=True)
    prev = jnp.min(jnp.where(cand == m, lane, L), axis=-1,
                   keepdims=True)                            # (B, 1)
    first = pending[:, 0:1] < 0                              # initial segment
    lab_end = jnp.where(first, lab0_ref[:, 0:1], prev)
    lab_end = jnp.clip(lab_end, 0, L - 1)                    # (B, 1)
    hot = jnp.where(lane == lab_end, 1.0, 0.0)
    d = jnp.sum(argd_ref[0].astype(jnp.float32) * hot, axis=-1,
                keepdims=True).astype(jnp.int32)             # (B, 1)
    start = t - d

    out_lab_ref[0] = jnp.broadcast_to(
        jnp.where(active, lab_end, -1), out_lab_ref[0].shape)
    out_start_ref[0] = jnp.broadcast_to(
        jnp.where(active, start, 0), out_start_ref[0].shape)
    cur_t[:] = jnp.where(active, start - 1, cur_t[:])
    pending[:] = jnp.where(active, lab_end, pending[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def segmental_viterbi_traceback_pallas(deltas, argd, trans, lab0, lengths,
                                       interpret: bool = False):
    """(T, B, L) deltas/argd -> per-frame segment-end markers
    ``(end_lab (T, B) int32, -1 where no segment ends; start (T, B))``."""
    T, B, L = deltas.shape
    Bp, Lp = _round_up(B, _SUBLANE), _round_up(L, _LANE)
    if (Bp, Lp) != (B, L):
        deltas = jnp.pad(deltas, ((0, 0), (0, Bp - B), (0, Lp - L)),
                         constant_values=NEG_INF)
        argd = jnp.pad(argd, ((0, 0), (0, Bp - B), (0, Lp - L)))
        trans = jnp.pad(trans, ((0, Lp - L),) * 2, constant_values=NEG_INF)
        lab0 = jnp.pad(lab0, (0, Bp - B))
        lengths = jnp.pad(lengths, (0, Bp - B), constant_values=0)
    len2 = jnp.broadcast_to(lengths[:, None].astype(jnp.int32),
                            (Bp, _LANE))
    lab02 = jnp.broadcast_to(lab0[:, None].astype(jnp.int32),
                             (Bp, _LANE))
    out_lab, out_start = pl.pallas_call(
        _seg_vit_tb_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((Bp, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, Lp),
                         lambda i: (pl.num_programs(0) - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, Lp),
                         lambda i: (pl.num_programs(0) - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, Lp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Bp, _LANE),
                         lambda i: (pl.num_programs(0) - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, _LANE),
                         lambda i: (pl.num_programs(0) - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((T, Bp, _LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((Bp, _LANE), jnp.int32),
                        pltpu.VMEM((Bp, _LANE), jnp.int32)],
        interpret=interpret,
    )(len2, lab02, deltas, argd, jnp.transpose(trans))
    return out_lab[:, :B, 0], out_start[:, :B, 0]
