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


def _pick_btile(B0: int) -> int:
    """Batch-tile: bigger tiles amortize per-instruction overhead in the
    frame-serial scan (64 rows measured ~10% faster than 16 at B=64), but
    small batches shouldn't pad up to 64 rows."""
    return 64 if B0 >= 64 else (32 if B0 >= 32 else 16)


def _beam_mask(new, thr, beam_width):
    """Score-margin + top-k (max-active) beam mask, matching the XLA
    path's prune (ops.viterbi): threshold first, then keep entries >= the
    k-th largest surviving value (ties at the k-th value all kept).  The
    k-th value is found by extracting distinct maxima — at most k rounds of
    (row-max, count) VPU reductions, no sort needed on TPU."""
    mrow = jnp.max(new, axis=-1, keepdims=True)
    new = jnp.where(new >= mrow - thr, new, NEG_INF)
    if beam_width is None:
        return new
    k = beam_width

    def body(_, carry):
        cur, kth, found = carry
        m = jnp.max(cur, axis=-1, keepdims=True)
        cnt = jnp.sum((new >= m).astype(jnp.float32), axis=-1,
                      keepdims=True)
        kth = jnp.where(found, kth, m)
        found = found | (cnt >= k)
        cur = jnp.where(cur >= m, NEG_INF, cur)
        return cur, kth, found

    init = (new, jnp.full_like(new[:, 0:1], NEG_INF),
            jnp.zeros((new.shape[0], 1), jnp.bool_))
    _, kth, _ = jax.lax.fori_loop(0, k, body, init)
    return jnp.where(new >= kth, new, NEG_INF)


def _vit_fwd_kernel(lsub, beam_width, len_ref, thr_ref, state_ref, trans_ref,
                    deltas_ref, carry):
    # ``lsub``: true label count rounded to the f32 sublane (8) — the
    # reduction runs over only the real predecessor rows instead of the
    # 128-lane-padded count (144 vs 256 for the flagship: measured 1.5x).
    i = pl.program_id(1)

    def frame(k, _):
        t = i * _TBLOCK + k
        state_t = state_ref[k]                              # (tile, L)

        @pl.when(t == 0)
        def _():
            carry[:] = _beam_mask(state_t, thr_ref[0, 0], beam_width)

        @pl.when(t > 0)
        def _():
            delta = carry[:]                                # (tile, L)
            # cand[b, p, l] = delta[b, p] + trans[p, l], reduced over p.
            # (The lane-reduction variant with trans^T measured 2x slower
            # in Mosaic — keep this orientation.)
            dl = jax.lax.slice(delta, (0, 0), (delta.shape[0], lsub))
            cand = dl[:, :, None] + trans_ref[0:lsub, :][None, :, :]
            new = jnp.max(cand, axis=1) + state_t
            new = _beam_mask(new, thr_ref[0, 0], beam_width)
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


@functools.partial(jax.jit, static_argnames=("interpret", "beam_threshold",
                                             "beam_width"))
def viterbi_pallas(state_tm, trans, lengths, beam_threshold=None,
                   beam_width=None, interpret: bool = False):
    """Fused Viterbi. ``state_tm``: (T, B, L); ``trans``: (L, L).
    Returns (path (B, T) int32, score (B,)).  Path entries at padded frames
    repeat the final label (inert for scoring).  ``beam_threshold`` /
    ``beam_width``: see ops.viterbi (same pruning semantics)."""
    bt = _pick_btile(state_tm.shape[1])
    state_tm, trans, lengths, T0, B0, L0 = pad_tbl(state_tm, trans, lengths,
                                                   _TBLOCK, bmult=bt)
    T, B, L = state_tm.shape
    nb = T // _TBLOCK
    len2d = jnp.broadcast_to(lengths[:, None].astype(jnp.int32), (B, _LANE))
    thr = jnp.full((1, 1), jnp.inf if beam_threshold is None
                   else float(beam_threshold), jnp.float32)
    if beam_width is not None and beam_width >= L0:
        beam_width = None

    lsub = ((L0 + _SUBLANE - 1) // _SUBLANE) * _SUBLANE
    [deltas] = pl.pallas_call(
        functools.partial(_vit_fwd_kernel, lsub, beam_width),
        grid=(B // bt, nb),
        in_specs=[
            pl.BlockSpec((bt, _LANE), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TBLOCK, bt, L), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TBLOCK, bt, L), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, B, L), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((bt, L), jnp.float32)],
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


# --------------- n-state topology-factored path ----------------
#
# For the left-to-right n-state topology (CRF_StdNStateNode — SURVEY.md
# §2.1) the (L', L') transition matrix is structurally sparse: of L'^2
# entries only self-loops, within-phone advances, and (last state ->
# first state) cross-phone arcs are legal (models/topology.py).  The dense
# kernel spends O(L'^2) VPU work per frame mostly maxing over NEG_INF.
#
# This path factors the step into
#   self:    delta + w_self                       O(L')  elementwise
#   advance: shift(delta, one plane) + w_adv      O(L')  elementwise
#   cross:   max_q(delta_last[q] + w_cross[q,q']) O(P^2) max-plus matvec
# using a flat plane-major layout l = s * Pp + q (Pp = P padded to 128
# lanes), so every slice is lane-tile aligned.  For 48 phones x 3 states
# this is ~6x less VPU work than the dense (144->256-padded) step.
#
# The traceback reuses the dense delta-traceback kernel unchanged, on a
# plane-major permutation of the transition matrix.


def _vit_fwd_nstate_kernel(ns, pp, psub, beam_width, len_ref, thr_ref,
                           state_ref, wself_ref, wadv_ref, wcross_ref,
                           deltas_ref, carry):
    i = pl.program_id(1)

    def frame(k, _):
        t = i * _TBLOCK + k
        state_t = state_ref[k]                             # (tile, ns*pp)

        @pl.when(t == 0)
        def _():
            carry[:] = _beam_mask(state_t, thr_ref[0, 0], beam_width)

        @pl.when(t > 0)
        def _():
            delta = carry[:]                               # (tile, ns*pp)
            bt = delta.shape[0]
            best = delta + wself_ref[0:1, :]
            if ns > 1:
                shifted = jnp.concatenate(
                    [jnp.full((bt, pp), NEG_INF, jnp.float32),
                     jax.lax.slice(delta, (0, 0), (bt, (ns - 1) * pp))],
                    axis=1)
                best = jnp.maximum(best, shifted + wadv_ref[0:1, :])
            dlast = jax.lax.slice(delta, (0, (ns - 1) * pp), (bt, ns * pp))
            dl = jax.lax.slice(dlast, (0, 0), (bt, psub))
            cand = dl[:, :, None] + wcross_ref[0:psub, :][None, :, :]
            cross = jnp.max(cand, axis=1)                  # (tile, pp)
            if ns > 1:
                cross = jnp.concatenate(
                    [cross,
                     jnp.full((bt, (ns - 1) * pp), NEG_INF, jnp.float32)],
                    axis=1)
            new = jnp.maximum(best, cross) + state_t
            new = _beam_mask(new, thr_ref[0, 0], beam_width)
            valid = len_ref[:, 0:1] > t
            carry[:] = jnp.where(valid, new, delta)

        deltas_ref[k] = carry[:]
        return 0

    jax.lax.fori_loop(0, _TBLOCK, frame, 0, unroll=True)


def _factored_weights(trans, P: int, ns: int, pp: int):
    """Extract (w_self, w_adv, w_cross) from a topology-masked dense
    (L', L') transition matrix, in flat plane-major layout."""
    q = jnp.arange(P)
    s = jnp.arange(ns)
    p_idx = q[None, :] * ns + s[:, None]                   # (ns, P)
    wself = trans[p_idx, p_idx]                            # (ns, P)
    prev_idx = q[None, :] * ns + jnp.maximum(s[:, None] - 1, 0)
    wadv = jnp.where(s[:, None] >= 1, trans[prev_idx, p_idx], NEG_INF)
    wcross = trans[(q * ns + ns - 1)[:, None], (q * ns)[None, :]]  # (P, P)
    pad = ((0, 0), (0, pp - P))
    wself = jnp.pad(wself, pad, constant_values=NEG_INF).reshape(1, ns * pp)
    wadv = jnp.pad(wadv, pad, constant_values=NEG_INF).reshape(1, ns * pp)
    wcross = jnp.pad(wcross, ((0, pp - P), (0, pp - P)),
                     constant_values=NEG_INF)
    return wself, wadv, wcross


def _plane_trans(trans, P: int, ns: int, pp: int):
    """Permute a dense (L', L') transition matrix into the flat plane-major
    coordinate l = s * pp + q (NEG_INF rows/cols at padded lanes)."""
    lidx = jnp.arange(ns * pp)
    s, q = lidx // pp, lidx % pp
    valid = q < P
    p_of = jnp.where(valid, q * ns + s, 0)
    tp = trans[p_of][:, p_of]
    return jnp.where(valid[:, None] & valid[None, :], tp, NEG_INF)


@functools.partial(jax.jit,
                   static_argnames=("num_states", "beam_threshold",
                                    "beam_width", "interpret"))
def viterbi_pallas_nstate(state_tm, trans, lengths, num_states: int,
                          beam_threshold=None, beam_width=None,
                          interpret: bool = False):
    """Topology-factored fused Viterbi for the n-state left-to-right case.

    ``state_tm``: (T, B, L') with L' = P * num_states (index q*ns + s);
    ``trans``: dense (L', L') with illegal transitions at ~NEG_INF (as
    produced by models.crf.potentials).  Same contract as viterbi_pallas.
    """
    ns = num_states
    T0, B0, L0 = state_tm.shape
    P = L0 // ns
    assert P * ns == L0 and ns > 1 and P <= _LANE, (P, ns)
    pp = _round_up_v(P, _LANE)
    psub = _round_up_v(P, _SUBLANE)
    Tp = _round_up_v(T0, _TBLOCK)
    bt = _pick_btile(B0)
    Bp = _round_up_v(B0, bt)
    LF = ns * pp                                           # flat width

    # plane-major relayout + padding (padded entries are semiring zeros)
    sp = state_tm.reshape(T0, B0, P, ns).transpose(0, 1, 3, 2)
    sp = jnp.pad(sp, ((0, Tp - T0), (0, Bp - B0), (0, 0), (0, pp - P)),
                 constant_values=NEG_INF)
    state_flat = sp.reshape(Tp, Bp, LF)
    lengths_p = jnp.pad(lengths, (0, Bp - B0), constant_values=1)

    wself, wadv, wcross = _factored_weights(trans, P, ns, pp)
    wself8 = jnp.broadcast_to(wself, (_SUBLANE, LF))
    wadv8 = jnp.broadcast_to(wadv, (_SUBLANE, LF))

    nb = Tp // _TBLOCK
    len2d = jnp.broadcast_to(lengths_p[:, None].astype(jnp.int32),
                             (Bp, _LANE))
    thr = jnp.full((1, 1), jnp.inf if beam_threshold is None
                   else float(beam_threshold), jnp.float32)
    if beam_width is not None and beam_width >= L0:
        beam_width = None

    [deltas] = pl.pallas_call(
        functools.partial(_vit_fwd_nstate_kernel, ns, pp, psub, beam_width),
        grid=(Bp // bt, nb),
        in_specs=[
            pl.BlockSpec((bt, _LANE), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TBLOCK, bt, LF), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, LF), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, LF), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pp, pp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TBLOCK, bt, LF), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((Tp, Bp, LF), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((bt, LF), jnp.float32)],
        interpret=interpret,
    )(len2d, thr, state_flat, wself8, wadv8, wcross)

    final = deltas[Tp - 1]                                 # (Bp, LF)
    score = jnp.max(final, axis=-1)
    last = jnp.argmax(final, axis=-1).astype(jnp.int32)
    last2d = jnp.broadcast_to(last[:, None], (Bp, _LANE))

    [path_tm] = pl.pallas_call(
        _vit_bwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Bp, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TBLOCK, Bp, LF), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LF, LF), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TBLOCK, Bp, _LANE), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((Tp, Bp, _LANE), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((Bp, LF), jnp.float32)],
        interpret=interpret,
    )(len2d, last2d, deltas, _plane_trans(trans, P, ns, pp).T)

    lab = path_tm[:T0, :B0, 0].T                           # flat plane coords
    path = (lab % pp) * ns + lab // pp                     # -> q*ns + s
    return path, score[:B0]


def _round_up_v(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
