"""Pallas TPU kernels: fused alpha/beta scans with VMEM-resident carry.

The XLA ``lax.scan`` path (ops.mxu) dispatches one small matmul per frame —
latency-bound at production shapes (512 sequential HLO steps).  These
kernels move the time loop *inside* a single Pallas grid: the grid dimension
is T (TPU Pallas grids execute sequentially on a core), the alpha carry
lives in a VMEM scratch buffer across grid steps, and the per-frame state
potentials are streamed HBM -> VMEM by the Pallas pipeline (double-buffered
automatically).  The inner step is the same rescaled-exp MXU matmul as
ops.mxu (see that module's docstring for the math; SURVEY.md §7.1 step 6 /
§7.3 item 2 for the design intent).

Layout: time-major ``(T, B, L)`` so each streamed block ``(1, B, L)`` has
hardware-aligned trailing dims; wrappers pad B to 8 (f32 sublanes) and L to
128 (lanes).  Padded labels carry NEG_INF potentials — structural semiring
zeros (tests/kernels verifies padding inertness).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_craft_tpu.ops.semiring import NEG_INF

_LANE = 128
_SUBLANE = 8
# Frames per grid step: amortizes per-step pipeline overhead (512 one-frame
# steps were overhead-bound); bounded by VMEM (block bytes ~ TBLOCK*B*L*4 x2
# buffers x in+out).
_TBLOCK = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_tbl(state_tm, trans, lengths, tblock: int = 1,
            bmult: int = _SUBLANE):
    """Pad (T, B, L) / (L, L) / (B,) to hardware tiles (and T to a multiple
    of ``tblock``, B to a multiple of ``bmult``; padded frames exceed every
    length, so the masking makes them inert)."""
    T, B, L = state_tm.shape
    Tp = _round_up(T, tblock)
    Bp, Lp = _round_up(B, bmult), _round_up(L, _LANE)
    if (Tp, Bp, Lp) != (T, B, L):
        state_tm = jnp.pad(state_tm,
                           ((0, Tp - T), (0, Bp - B), (0, Lp - L)),
                           constant_values=NEG_INF)
        trans = jnp.pad(trans, ((0, Lp - L), (0, Lp - L)),
                        constant_values=NEG_INF)
        lengths = jnp.pad(lengths, (0, Bp - B), constant_values=1)
    return state_tm, trans, lengths, T, B, L


def _lse_rows(x):
    m = jnp.maximum(jnp.max(x, axis=-1, keepdims=True), NEG_INF)
    return m + jnp.log(jnp.maximum(
        jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True), 1e-38))


def _fwd_kernel(len_ref, state_ref, P_ref, tmax_ref,
                alphas_ref, logZ_ref, carry):
    i = pl.program_id(0)

    def frame(k, _):
        t = i * _TBLOCK + k
        state_t = state_ref[k]                         # (B, L)

        @pl.when(t == 0)
        def _():
            carry[:] = state_t

        @pl.when(t > 0)
        def _():
            alpha = carry[:]
            m = jnp.maximum(jnp.max(alpha, axis=-1, keepdims=True), NEG_INF)
            prod = jnp.dot(jnp.exp(alpha - m), P_ref[:],
                           preferred_element_type=jnp.float32)
            new = (m + tmax_ref[0:1, :]
                   + jnp.log(jnp.maximum(prod, 1e-38)) + state_t)
            valid = len_ref[:, 0:1] > t                # (B, 1)
            carry[:] = jnp.where(valid, new, alpha)

        alphas_ref[k] = carry[:]
        return 0

    jax.lax.fori_loop(0, _TBLOCK, frame, 0, unroll=True)
    logZ_ref[:] = jnp.broadcast_to(_lse_rows(carry[:]), logZ_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def forward_pallas(state_tm, trans, lengths, interpret: bool = False):
    """Fused alpha pass, time-major.  ``state_tm``: (T, B, L) f32,
    ``trans``: (L, L), ``lengths``: (B,).
    Returns (alphas (T, B, L), logZ (B,))."""
    state_tm, trans, lengths, T0, B0, L0 = pad_tbl(state_tm, trans, lengths,
                                                   _TBLOCK)
    T, B, L = state_tm.shape
    tmax = jnp.maximum(jnp.max(trans, axis=0), NEG_INF)
    P = jnp.exp(trans - tmax[None, :])
    tmax8 = jnp.broadcast_to(tmax[None, :], (_SUBLANE, L))
    len2d = jnp.broadcast_to(lengths[:, None].astype(jnp.int32), (B, _LANE))

    alphas, logZ = pl.pallas_call(
        _fwd_kernel,
        grid=(T // _TBLOCK,),
        in_specs=[
            pl.BlockSpec((B, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TBLOCK, B, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TBLOCK, B, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, _LANE), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, L), jnp.float32)],
        interpret=interpret,
    )(len2d, state_tm, P, tmax8)
    return alphas[:T0, :B0, :L0], logZ[:B0, 0]


def _bwd_kernel(len_ref, cur_ref, nxt_ref, Pt_ref, tmaxr_ref,
                betas_ref, carry):
    # Grid step i handles the i-th time-block from the END; frames inside
    # are processed high -> low.  beta[t] needs state at t+1, which for the
    # block's last frame lives in the NEXT time-block (nxt_ref).
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    base = (nb - 1 - i) * _TBLOCK

    def frame(j, _):
        k = _TBLOCK - 1 - j
        t = base + k
        state_next = jnp.where(
            k == _TBLOCK - 1, nxt_ref[0],
            cur_ref[jnp.minimum(k + 1, _TBLOCK - 1)])
        beta = carry[:]
        x = beta + state_next
        m = jnp.maximum(jnp.max(x, axis=-1, keepdims=True), NEG_INF)
        prod = jnp.dot(jnp.exp(x - m), Pt_ref[:],
                       preferred_element_type=jnp.float32)
        new = m + tmaxr_ref[0:1, :] + jnp.log(jnp.maximum(prod, 1e-38))
        valid = len_ref[:, 0:1] > t + 1
        carry[:] = jnp.where(valid, new, jnp.zeros_like(new))
        betas_ref[k] = carry[:]
        return 0

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    jax.lax.fori_loop(0, _TBLOCK, frame, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def backward_pallas(state_tm, trans, lengths, interpret: bool = False):
    """Fused beta pass, time-major.  Returns betas (T, B, L)."""
    state_tm, trans, lengths, T0, B0, L0 = pad_tbl(state_tm, trans, lengths,
                                                   _TBLOCK)
    T, B, L = state_tm.shape
    nb = T // _TBLOCK
    tmax_r = jnp.maximum(jnp.max(trans, axis=1), NEG_INF)
    Pt = jnp.exp(trans.T - tmax_r[None, :])
    tmaxr8 = jnp.broadcast_to(tmax_r[None, :], (_SUBLANE, L))
    len2d = jnp.broadcast_to(lengths[:, None].astype(jnp.int32), (B, _LANE))

    [betas] = pl.pallas_call(
        _bwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((B, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TBLOCK, B, L), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TBLOCK, B, L),
                         lambda i: (jnp.minimum(nb - i, nb - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TBLOCK, B, L), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, B, L), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B, L), jnp.float32)],
        interpret=interpret,
    )(len2d, state_tm, state_tm, Pt, tmaxr8)
    return betas[:T0, :B0, :L0]
