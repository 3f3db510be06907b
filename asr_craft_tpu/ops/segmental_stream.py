"""Streaming SCRF log-partition with a classical segmental fwd-bwd gradient.

Training a segmental CRF at production shapes (B=64, T=512, Dmax=16, L=48)
cannot materialize the ``(B, T, Dmax, L)`` segment-potential tensor that the
dense path (:mod:`asr_craft_tpu.ops.segmental` over
``models.segmental.seg_potentials``) differentiates through — SURVEY.md
§7.3 item 4's memory blow-up, and round-1 VERDICT missing #2.  This module
computes logZ *and its gradient* from the O(B·T·L) frame-score stream
alone: segment potentials are reconstructed on the fly from cumulative
frame scores inside rolling ``(Dmax, B, L)`` windows,

    seg[t, d, l] = invd[d] * (CS[t+1, l] - CS[t-d, l]) + bias[d, l],

where ``CS[k] = sum_{u<k} frame[u]`` and ``invd[d] = 1/(d+1)`` for mean
pooling (1 otherwise).

The gradient is not autodiff-through-scan (which stores the rolling carries
for every step) but the classical segmental forward-backward identities via
``jax.custom_vjp`` — the segmental analogue of the linear-chain design in
:mod:`asr_craft_tpu.ops.mxu` (reference ``CRF_NewGradBuilder`` expected
counts, SURVEY.md §3.1, generalized to segments §3.4):

    beta[t, l]    = logsumexp_{d, l'} trans[l, l'] + seg[t+d+1, d, l']
                                      + beta[t+d+1, l']        (beta[len-1]=0)
    xi[t, d, l]   = exp(pred[t, d, l] + seg[t, d, l] + beta[t, l] - logZ)
      with pred   = logsumexp_p alpha[t-d-1, p] + trans[p, l]  (0 if d == t)

    dlogZ/dbias[d, l]  = sum_{t} xi[t, d, l]
    dlogZ/dtrans[p, l] = sum_{t, d < t} exp(alpha[t-d-1, p] + trans[p, l]
                                            + seg[t, d, l] + beta[t, l] - logZ)
    dlogZ/dCS[k, l]    = A[k-1, l] - S[k, l]
      A[t] = sum_d invd[d]*xi[t, d]          (segments *ending* at t)
      S[k] = sum_d invd[d]*xi[k+d, d]        (segments *starting* at k)
    dlogZ/dframe[u]    = sum_{k > u} dlogZ/dCS[k]   (reverse cumulative sum)

All recursions ride the MXU via the rescaled-exp log-matmul trick
(``ops.mxu`` module docstring).  The forward primal dispatches to the fused
Pallas kernel on TPU (:mod:`asr_craft_tpu.kernels.segmental_pallas`);
backward passes dispatch to the fused Pallas beta/grad kernels when
available.  Parity: held to the dense materialized path (itself
enumeration-verified in tests/oracle/test_segmental_parity.py) in
tests/oracle/test_segmental_stream.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from asr_craft_tpu.ops.semiring import NEG_INF

__all__ = ["seg_log_partition_stream", "seg_forward_stream",
           "seg_backward_stream"]


def _safe_log(x):
    return jnp.log(jnp.maximum(x, 1e-38))


def _row_max(x):
    return jnp.maximum(jnp.max(x, axis=-1, keepdims=True), NEG_INF)


def _invd(max_dur: int, mean_pool: bool):
    d = jnp.arange(max_dur, dtype=jnp.float32)
    return 1.0 / (d + 1.0) if mean_pool else jnp.ones_like(d)


def _seg_window(cum_now, cs_buf, bias, invd):
    """Segment potentials for the Dmax segments ending at the current frame,
    from the cumulative-score window: (Dmax, B, L)."""
    return (cum_now[None] - cs_buf) * invd[:, None, None] + bias[:, None, :]


def seg_forward_stream(cum, bias, trans, lengths, invd):
    """Alpha pass over the (t, d) lattice from cumulative frame scores.

    ``cum``: (T, B, L) with ``cum[t] = CS[t+1]`` (inclusive cumsum of frame
    scores); ``bias``: (Dmax, L) additive segment bias (duration + label);
    ``trans``: (L, L).  Returns (alphas (T, B, L), logZ (B,)).  Mirrors the
    fused Pallas kernel (kernels/segmental_pallas.py) on the XLA path.
    """
    T, B, L = cum.shape
    Dmax = bias.shape[0]
    tmax = jnp.maximum(jnp.max(trans, axis=0), NEG_INF)         # (L,)
    P = jnp.exp(trans - tmax[None, :])
    ds = jnp.arange(Dmax)[:, None, None]

    def step(carry, inp):
        alpha_buf, cs_buf = carry          # alpha_buf[i]=alpha[t-1-i]; cs_buf[i]=CS[t-i]
        t, cum_now = inp                   # cum_now = CS[t+1]
        m = _row_max(alpha_buf)                                  # (Dmax,B,1)
        prod = jnp.dot(jnp.exp(alpha_buf - m).reshape(Dmax * B, L), P,
                       preferred_element_type=jnp.float32).reshape(Dmax, B, L)
        msg = m + tmax[None, None, :] + _safe_log(prod)
        msg = jnp.where(ds == t, 0.0, msg)      # segment starts at frame 0
        msg = jnp.where(ds > t, NEG_INF, msg)   # invalid duration
        cand = msg + _seg_window(cum_now, cs_buf, bias, invd)
        cm = jnp.maximum(jnp.max(cand, axis=0), NEG_INF)         # (B, L)
        alpha_t = cm + _safe_log(jnp.sum(jnp.exp(cand - cm[None]), axis=0))
        alpha_t = jnp.where((t < lengths)[:, None], alpha_t, NEG_INF)
        return (jnp.concatenate([alpha_t[None], alpha_buf[:-1]]),
                jnp.concatenate([cum_now[None], cs_buf[:-1]])), alpha_t

    init = (jnp.full((Dmax, B, L), NEG_INF, cum.dtype),
            jnp.zeros((Dmax, B, L), cum.dtype))
    _, alphas = jax.lax.scan(step, init, (jnp.arange(T), cum))

    last = jnp.take_along_axis(
        alphas, jnp.clip(lengths - 1, 0)[None, :, None]
        .astype(jnp.int32).repeat(L, axis=2), axis=0)[0]         # (B, L)
    m = _row_max(last)
    logZ = (m + _safe_log(jnp.sum(jnp.exp(last - m), axis=-1,
                                  keepdims=True)))[:, 0]
    return alphas, logZ


def seg_backward_stream(cum, bias, trans, lengths, invd):
    """Beta pass (descending t).  Returns betas (T, B, L) with
    ``beta[length-1] = 0`` and NEG_INF past the sequence end."""
    T, B, L = cum.shape
    Dmax = bias.shape[0]
    tmax_row = jnp.maximum(jnp.max(trans, axis=1), NEG_INF)      # (L,)
    # M[l', l] = exp(trans[l, l'] - tmax_row[l]): logsumexp over next label
    M = jnp.exp(trans - tmax_row[:, None]).T

    def step(carry, inp):
        beta_buf, cs_buf = carry      # beta_buf[i]=beta[t+1+i]; cs_buf[i]=CS[t+2+i]
        t, cs_next = inp              # cs_next = CS[t+1]
        # segment (end=t+d+1, dur=d+1) starting at t+1:
        seg_next = (cs_buf - cs_next[None]) * invd[:, None, None] \
            + bias[:, None, :]                                   # (Dmax,B,L)
        w = seg_next + beta_buf
        mw = _row_max(w)
        prod = jnp.dot(jnp.exp(w - mw).reshape(Dmax * B, L), M,
                       preferred_element_type=jnp.float32).reshape(Dmax, B, L)
        msg = mw + tmax_row[None, None, :] + _safe_log(prod)
        cm = jnp.maximum(jnp.max(msg, axis=0), NEG_INF)
        beta_t = cm + _safe_log(jnp.sum(jnp.exp(msg - cm[None]), axis=0))
        beta_t = jnp.where((t == lengths - 1)[:, None],
                           jnp.zeros_like(beta_t), beta_t)
        beta_t = jnp.where((t >= lengths)[:, None], NEG_INF, beta_t)
        return (jnp.concatenate([beta_t[None], beta_buf[:-1]]),
                jnp.concatenate([cs_next[None], cs_buf[:-1]])), beta_t

    init = (jnp.full((Dmax, B, L), NEG_INF, cum.dtype),
            jnp.zeros((Dmax, B, L), cum.dtype))
    _, betas = jax.lax.scan(step, init, (jnp.arange(T), cum), reverse=True)
    return betas


def _grad_scan(cum, bias, trans, lengths, invd, alphas, betas, logZ, g):
    """Ascending xi pass: accumulates all gradient pieces in one scan.

    Returns raw pieces ``(A (T,B,L), S_emit (T,B,L), acc_fin (Dmax,B,L),
    gd (Dmax,L), gt (L,L))`` for :func:`_assemble_frame_grad` / the
    exp(trans) contraction finish.  ``g``: (B,) cotangent of logZ, folded
    into every xi.
    """
    T, B, L = cum.shape
    Dmax = bias.shape[0]
    tmax = jnp.maximum(jnp.max(trans, axis=0), NEG_INF)
    P = jnp.exp(trans - tmax[None, :])
    ds = jnp.arange(Dmax)[:, None, None]
    gB = g[None, :, None]                                        # (1,B,1)

    def step(carry, inp):
        alpha_buf, cs_buf, acc, gt, gd = carry
        t, cum_now, alpha_t, beta_t = inp
        m = _row_max(alpha_buf)                                  # (Dmax,B,1)
        prod = jnp.dot(jnp.exp(alpha_buf - m).reshape(Dmax * B, L), P,
                       preferred_element_type=jnp.float32).reshape(Dmax, B, L)
        pred = m + tmax[None, None, :] + _safe_log(prod)
        pred = jnp.where(ds == t, 0.0, pred)
        pred = jnp.where(ds > t, NEG_INF, pred)
        seg = _seg_window(cum_now, cs_buf, bias, invd)
        x_v = seg + (beta_t - logZ[:, None])[None]               # (Dmax,B,L)
        valid = (t < lengths)[None, :, None]
        xi_g = jnp.where(valid, jnp.exp(pred + x_v) * gB, 0.0)

        acc = acc + invd[:, None, None] * xi_g
        s_emit = acc[Dmax - 1]
        acc = jnp.concatenate([jnp.zeros((1, B, L), acc.dtype), acc[:-1]])
        a_t = jnp.sum(invd[:, None, None] * xi_g, axis=0)        # (B, L)
        gd = gd + jnp.sum(xi_g, axis=1)                          # (Dmax, L)

        # trans contraction: xi over (p, l) factored as U^T V * exp(trans)
        mV = _row_max(x_v)
        w_sc = jnp.exp(m + mV) * gB
        w_sc = jnp.where(valid & (ds < t), w_sc, 0.0)
        U = jnp.exp(alpha_buf - m) * w_sc                        # (Dmax,B,P)
        V = jnp.exp(x_v - mV)                                    # (Dmax,B,L)
        gt = gt + jnp.einsum("dbp,dbl->pl", U, V,
                             preferred_element_type=jnp.float32)

        return (jnp.concatenate([alpha_t[None], alpha_buf[:-1]]),
                jnp.concatenate([cum_now[None], cs_buf[:-1]]),
                acc, gt, gd), (a_t, s_emit)

    init = (jnp.full((Dmax, B, L), NEG_INF, cum.dtype),
            jnp.zeros((Dmax, B, L), cum.dtype),
            jnp.zeros((Dmax, B, L), jnp.float32),
            jnp.zeros((L, L), jnp.float32),
            jnp.zeros((Dmax, L), jnp.float32))
    (_, _, acc_fin, gt, gd), (A, S_emit) = jax.lax.scan(
        step, init, (jnp.arange(T), cum, alphas, betas))
    return A, S_emit, acc_fin, gd, gt


def _assemble_frame_grad(A, S_emit, acc_fin):
    """Frame-score gradient from the xi-pass pieces.

    ``A[t]``: end-contributions of frame t; ``S_emit[t]``: completed
    start-contributions of frame t - (Dmax-1); ``acc_fin[j]``: leftover
    start-contributions of frame T - j (post-shift of the last step).
    """
    import numpy as np
    T, B, L = A.shape
    Dmax = acc_fin.shape[0]
    S = jnp.zeros((T, B, L), jnp.float32)
    if T >= Dmax:
        S = S.at[:T - Dmax + 1].set(S_emit[Dmax - 1:])
    js = np.arange(1, Dmax)
    frames = T - js
    keep = frames >= 0
    if keep.any():
        S = S.at[frames[keep]].set(acc_fin[js[keep]])

    # g_frame[u] = sum_{t >= u} A[t] - sum_{k >= u+1} S[k]
    ra = jnp.flip(jnp.cumsum(jnp.flip(A, 0), axis=0), 0)
    rs = jnp.flip(jnp.cumsum(jnp.flip(S, 0), axis=0), 0)
    rs_next = jnp.concatenate([rs[1:], jnp.zeros((1, B, L), rs.dtype)])
    return ra - rs_next


def _dispatch_forward(frame_tm, bias, trans, lengths, max_dur, mean_pool):
    from asr_craft_tpu import kernels
    if kernels.backend() == "pallas":
        return kernels.segmental_forward_pallas(
            frame_tm, trans, bias, None, lengths,
            max_dur=max_dur, mean_pool=mean_pool)
    cum = jnp.cumsum(frame_tm, axis=0)
    return seg_forward_stream(cum, bias, trans, lengths,
                              _invd(max_dur, mean_pool))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _log_partition_stream(frame_tm, bias, trans, lengths,
                          max_dur, mean_pool):
    _, logZ = _dispatch_forward(frame_tm, bias, trans, lengths,
                                max_dur, mean_pool)
    return logZ


def _lps_fwd(frame_tm, bias, trans, lengths, max_dur, mean_pool):
    alphas, logZ = _dispatch_forward(frame_tm, bias, trans, lengths,
                                     max_dur, mean_pool)
    return logZ, (frame_tm, bias, trans, lengths, alphas, logZ)


def _lps_bwd(max_dur, mean_pool, res, g):
    frame_tm, bias, trans, lengths, alphas, logZ = res
    from asr_craft_tpu import kernels
    invd = _invd(max_dur, mean_pool)
    cum = jnp.cumsum(frame_tm, axis=0)
    if kernels.backend() == "pallas":
        betas = kernels.segmental_backward_pallas(
            cum, trans, bias, lengths, max_dur=max_dur, mean_pool=mean_pool)
        A, S_emit, acc_fin, gd, gt = kernels.segmental_grad_pallas(
            cum, trans, bias, lengths, alphas, betas, logZ, g,
            max_dur=max_dur, mean_pool=mean_pool)
    else:
        betas = seg_backward_stream(cum, bias, trans, lengths, invd)
        A, S_emit, acc_fin, gd, gt = _grad_scan(
            cum, bias, trans, lengths, invd, alphas, betas, logZ, g)
    g_frame = _assemble_frame_grad(A, S_emit, acc_fin)
    # finish trans grad outside the scan: exp(trans) * sum(U^T V), in
    # log space for immunity to large learned transition weights (ops.mxu)
    g_trans = jnp.sign(gt) * jnp.exp(trans + _safe_log(jnp.abs(gt)))
    return g_frame, gd, g_trans, None


_log_partition_stream.defvjp(_lps_fwd, _lps_bwd)


def seg_log_partition_stream(frame_tm, bias, trans, lengths,
                             max_dur: int, mean_pool: bool = True):
    """SCRF logZ (B,) from frame scores, differentiable at production
    shapes: never materializes (B, T, Dmax, L), with the classical
    segmental forward-backward gradient (module docstring).

    ``frame_tm``: (T, B, L) per-frame label scores (time-major);
    ``bias``: (Dmax, L) combined duration/label segment bias;
    ``trans``: (L, L) segment-level transitions.
    """
    return _log_partition_stream(frame_tm, bias, trans, lengths,
                                 int(max_dur), bool(mean_pool))
