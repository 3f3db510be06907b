"""Pallas SCRF forward kernel: segmental lattice scoring without
materializing the (B, T, Dmax, L) potential tensor.

BASELINE names "segmental lattice scoring" as a Pallas kernel target, and
SURVEY.md §7.3 item 4 flags the memory blow-up: at production shapes the
dense segment-potential tensor is O(T * Dmax * L) per sequence (gigabytes).
This kernel streams the *cumulative frame scores* (same bytes as the frame
scores) and reconstructs each segment potential in VMEM:

    seg[t, d, l] = pool(cum[t+1, l] - cum[t-d, l]) + b_dur[d, l] + b_seg[l]

carrying two rolling (Dmax, B, L) VMEM windows: the last Dmax alphas and the
last Dmax cumulative rows.  The duration-message reduction rides the MXU via
the same rescaled-exp trick as the linear-chain kernels:

    msg[d] = m_d + tmax + log(exp(alpha[t-1-d] - m_d) @ P)

with the (Dmax*B, L) x (L, L) matmul batched over durations.

Log semiring only (training/scoring); segmental Viterbi decode stays on the
XLA path (max-plus over durations doesn't factor through exp).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_craft_tpu.kernels.fwdbwd_pallas import _LANE, _SUBLANE, _round_up
from asr_craft_tpu.ops.semiring import NEG_INF


def _seg_fwd_kernel(len_ref, cum_ref, P_ref, tmax_ref, bias_ref,
                    invd_ref, alphas_ref, alpha_buf, cum_buf):
    # Grid: (T,); step t consumes cum[t+1] and emits alpha[t].
    # alpha_buf[i] = alpha[t-1-i]; cum_buf[i] = cum[t-i]   (i < Dmax)
    t = pl.program_id(0)
    Dmax, B, L = alpha_buf.shape

    @pl.when(t == 0)
    def _():
        alpha_buf[:] = jnp.full_like(alpha_buf, NEG_INF)
        cum_buf[:] = jnp.zeros_like(cum_buf)   # cum[0] = 0

    cum_now = cum_ref[0]                                    # (B, L): cum[t+1]

    # duration messages on the MXU: (Dmax*B, L) @ (L, L)
    a = alpha_buf[:]                                        # (Dmax, B, L)
    m = jnp.maximum(jnp.max(a, axis=-1, keepdims=True), NEG_INF)
    prod = jnp.dot(jnp.exp(a - m).reshape(Dmax * B, L), P_ref[:],
                   preferred_element_type=jnp.float32).reshape(Dmax, B, L)
    msg = m + tmax_ref[0:1, :][None] + jnp.log(jnp.maximum(prod, 1e-38))
    # d == t: segment starts at frame 0 — no predecessor (semiring one);
    # d > t: structurally invalid.
    ds = jax.lax.broadcasted_iota(jnp.int32, (Dmax, 1, 1), 0)
    msg = jnp.where(ds == t, 0.0, msg)
    msg = jnp.where(ds > t, NEG_INF, msg)

    # segment potentials from the cumulative window
    invd = invd_ref[:, 0:1].reshape(Dmax, 1, 1)
    seg = (cum_now[None] - cum_buf[:]) * invd \
        + bias_ref[:].reshape(Dmax, 1, L)                   # (Dmax, B, L)

    cand = msg + seg
    cm = jnp.maximum(jnp.max(cand, axis=0), NEG_INF)        # (B, L)
    alpha_t = cm + jnp.log(jnp.maximum(
        jnp.sum(jnp.exp(cand - cm[None]), axis=0), 1e-38))
    # padded frames: alpha stays NEG_INF (never read; logZ gathers length-1)
    valid = len_ref[:, 0:1] > t
    alpha_t = jnp.where(valid, alpha_t, NEG_INF)

    alphas_ref[0] = alpha_t
    # roll windows: newest first
    alpha_buf[:] = jnp.concatenate([alpha_t[None], alpha_buf[:-1]], axis=0)
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
        _seg_fwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((Bp, _LANE), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, Lp), lambda t: (t, 0, 0),
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
            pl.BlockSpec((1, Bp, Lp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, Bp, Lp), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((Dmax, Bp, Lp), jnp.float32),
            pltpu.VMEM((Dmax, Bp, Lp), jnp.float32),
        ],
        interpret=interpret,
    )(len2d, cum, P, tmax8, bias, invd2d)

    alphas = alphas[:, :B, :L]
    last = jnp.take_along_axis(
        alphas, (lengths[:B] - 1)[None, :, None].astype(jnp.int32)
        .repeat(L, axis=2), axis=0)[0]                       # (B, L)
    m = jnp.maximum(jnp.max(last, axis=-1, keepdims=True), NEG_INF)
    logZ = (m + jnp.log(jnp.maximum(
        jnp.sum(jnp.exp(last - m), axis=-1, keepdims=True), 1e-38)))[:, 0]
    return alphas, logZ
