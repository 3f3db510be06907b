"""Pallas Viterbi: fused max-plus scan + delta-based traceback.

Replaces the hot path of ``CRF_ViterbiDecoder`` (SURVEY.md §3.3) on TPU.

Design note: a naive kernel emits argmax backpointers in the forward pass,
but the in-kernel argmax costs two extra full passes over the (tile, L, L)
candidate tensor on the VPU — measured slower than XLA.  Instead the
forward kernel stores only the per-frame delta vectors (same memory as the
alpha tensor), and the traceback kernel re-derives each backpointer from

    path[t] = argmax_p( delta[t][p] + trans[p, path[t+1]] )

which needs only (B, L) work per frame: the ``trans[:, path[t+1]]`` column
gather is a one-hot MXU matmul, and the argmax is a single (B, L) pass with
first-occurrence tie-breaking (matching ``np.argmax`` / the oracle).

Threshold beam pruning (reference beam semantics) masks sub-margin deltas
to the semiring zero in the forward pass; ``None`` = exact search.

Layout: time-major (T, B, L) like the alpha/beta kernels; B padded to 8,
L to 128.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_craft_tpu.kernels.fwdbwd_pallas import (_LANE, _SUBLANE, _TBLOCK,
                                                 pad_tbl)
from asr_craft_tpu.ops.semiring import NEG_INF

_BTILE = 16


def _vit_fwd_kernel(len_ref, thr_ref, state_ref, trans_ref,
                    deltas_ref, carry):
    i = pl.program_id(1)

    def frame(k, _):
        t = i * _TBLOCK + k
        state_t = state_ref[k]                              # (tile, L)

        @pl.when(t == 0)
        def _():
            carry[:] = state_t

        @pl.when(t > 0)
        def _():
            delta = carry[:]                                # (tile, L)
            # cand[b, p, l] = delta[b, p] + trans[p, l], reduced over p.
            # (The lane-reduction variant with trans^T measured 2x slower
            # in Mosaic — keep this orientation.)
            cand = delta[:, :, None] + trans_ref[:][None, :, :]
            new = jnp.max(cand, axis=1) + state_t
            mrow = jnp.max(new, axis=-1, keepdims=True)
            new = jnp.where(new >= mrow - thr_ref[0, 0], new, NEG_INF)
            valid = len_ref[:, 0:1] > t
            carry[:] = jnp.where(valid, new, delta)

        deltas_ref[k] = carry[:]
        return 0

    jax.lax.fori_loop(0, _TBLOCK, frame, 0, unroll=True)


def _vit_bwd_kernel(len_ref, last_ref, deltas_ref, transT_ref,
                    path_ref, onehot):
    # Block i (from the END) writes frames high -> low.
    #   lab_t = last                                  for t >= length-1
    #   lab_t = argmax_p(delta[t][p] + trans[p, lab_{t+1}])  otherwise
    # (first-occurrence argmax ties, matching np.argmax / the oracle).
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    base = (nb - 1 - i) * _TBLOCK
    L = deltas_ref.shape[-1]
    l_iota = jax.lax.broadcasted_iota(jnp.int32, onehot.shape, 1)
    last = last_ref[:, 0:1]                                 # (B, 1)

    @pl.when(i == 0)
    def _():
        onehot[:] = (l_iota == last).astype(jnp.float32)

    def frame(j, _):
        k = _TBLOCK - 1 - j
        t = base + k
        # trans[:, lab_{t+1}] rows for every b: onehot (B, L) @ trans^T
        cols = jnp.dot(onehot[:], transT_ref[:],
                       preferred_element_type=jnp.float32)  # (B, L)
        x = deltas_ref[k] + cols
        m = jnp.max(x, axis=-1, keepdims=True)
        prev = jnp.min(jnp.where(x >= m, l_iota, L), axis=-1,
                       keepdims=True)                       # (B, 1) first max
        lab = jnp.where(t >= len_ref[:, 0:1] - 1, last, prev)
        onehot[:] = (l_iota == lab).astype(jnp.float32)
        path_ref[k] = jnp.broadcast_to(lab, path_ref.shape[1:])
        return 0

    jax.lax.fori_loop(0, _TBLOCK, frame, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("interpret", "beam_threshold"))
def viterbi_pallas(state_tm, trans, lengths, beam_threshold=None,
                   interpret: bool = False):
    """Fused Viterbi. ``state_tm``: (T, B, L); ``trans``: (L, L).
    Returns (path (B, T) int32, score (B,)).  Path entries at padded frames
    repeat the final label (inert for scoring)."""
    state_tm, trans, lengths, T0, B0, L0 = pad_tbl(state_tm, trans, lengths,
                                                   _TBLOCK, bmult=_BTILE)
    T, B, L = state_tm.shape
    nb = T // _TBLOCK
    len2d = jnp.broadcast_to(lengths[:, None].astype(jnp.int32), (B, _LANE))
    thr = jnp.full((1, 1), jnp.inf if beam_threshold is None
                   else float(beam_threshold), jnp.float32)

    [deltas] = pl.pallas_call(
        _vit_fwd_kernel,
        grid=(B // _BTILE, nb),
        in_specs=[
            pl.BlockSpec((_BTILE, _LANE), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TBLOCK, _BTILE, L), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TBLOCK, _BTILE, L), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, B, L), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((_BTILE, L), jnp.float32)],
        interpret=interpret,
    )(len2d, thr, state_tm, trans)

    # final deltas live at frame length-1 per row; padded frames carried
    # them through, so frame T-1 holds them for every row.
    final = deltas[T - 1, :, :L0]                            # (B, L0)
    score = jnp.max(final, axis=-1)
    last = jnp.argmax(final, axis=-1).astype(jnp.int32)
    last2d = jnp.broadcast_to(last[:, None], (B, _LANE))

    [path_tm] = pl.pallas_call(
        _vit_bwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((B, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TBLOCK, B, L), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TBLOCK, B, _LANE), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, B, _LANE), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((B, L), jnp.float32)],
        interpret=interpret,
    )(len2d, last2d, deltas, trans.T)
    return path_tm[:T0, :B0, 0].T, score[:B0]
