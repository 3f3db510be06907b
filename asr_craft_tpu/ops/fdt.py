"""Frame-dependent transition features, topology-factored (the real config 2).

The reference's ``CRF_StdFeatureMap`` ties a weight to every (input dim,
prev-label, label) triple (SURVEY.md §2.1 "Std feature map"), so with
``crf_transftr_end > 0`` the transition potentials depend on the frame:
``trans[b, t, p, l] = x[b, t] . w_trans[:, p, l] + b_trans[p, l]``.  The
generic path materializes that as a ``(B, T, L', L')`` tensor (2.7 GB at
flagship shapes) and runs the VPU scan (``ops/fwdbwd.py``) — the round-2
VERDICT's #1 gap.

TPU-first observation: under the n-state left-to-right topology
(``models/topology.py``) only three classes of transitions are legal —

    self     (s, s)            L'  entries per frame
    advance  (s, s+1)          L' - P entries (within-phone)
    cross    (last_i, first_j) P^2 entries (phone bigram)

i.e. ``2 L' + P^2`` ≈ 1/8 of the ``L'^2`` plane at ns=3.  Illegal pairs are
semiring zeros: they contribute nothing to logZ or to the gradient of any
legal-path objective, so scoring only the legal classes is EXACT, not an
approximation.  This module computes per-frame *factored potential planes*

    selfp (B, T, L')   advp (B, T, L')   crossp (B, T, P, P)

by three (gathered-weight) matmuls and runs the dual-lattice recursion on
them directly; for ``ns == 1`` every pair is legal and ``crossp`` IS the
full frame-dependent matrix (self/adv unused — no double count).

Two backends:
 - XLA (this file): ``lax.scan`` with remat, autodiff gradient — the
   reference path on CPU and the parity oracle for the kernel.
 - Pallas (kernels/fdt_pallas.py): plane formation fused *into* the scan
   kernel (one MXU matmul per time block; the planes never touch HBM) with
   a classical-gradient custom VJP.  Dispatch in :func:`fdt_nll_dual`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from asr_craft_tpu.ops.semiring import NEG_INF

__all__ = ["factored_trans_weights", "factored_planes", "fdt_logZ_pair",
           "fdt_nll_dual", "fdt_viterbi", "fdt_posteriors"]


def _adv_valid(Lp: int, ns: int) -> np.ndarray:
    """(L',) 1.0 where state-major label l has an advance edge (st < ns-1)."""
    st = np.arange(Lp) % ns
    return (st < ns - 1).astype(np.float32)


def factored_trans_weights(params: dict, Lp: int, ns: int):
    """Gather the legal-transition columns of the canonical parameters.

    ``params`` follow models.feature_map (``w_trans (Dt, L', L')``,
    ``b_trans (L', L')``); returns
    ``(w_self (Dt, L'), b_self (L',), w_adv, b_adv, w_cross (Dt, P, P),
    b_cross (P, P))`` — all plain gathers, so autodiff scatters gradients
    back into the canonical tensors (illegal pairs get zero gradient,
    matching the generic path's NEG_INF-masked lattice).

    For ``ns == 1`` only the cross pair is meaningful (it is the full
    matrix); self/adv are returned as zeros and must not be used.
    """
    w = params["w_trans"]
    b = params.get("b_trans")
    Dt = w.shape[0]
    P = Lp // ns
    if b is None:
        b = jnp.zeros((Lp, Lp), w.dtype)
    if ns == 1:
        z = jnp.zeros((Dt, Lp), w.dtype)
        zb = jnp.zeros((Lp,), w.dtype)
        return z, zb, z, zb, w, b
    lab = np.arange(Lp)
    adv_mask = jnp.asarray(_adv_valid(Lp, ns))
    w_self = jnp.diagonal(w, axis1=1, axis2=2)            # (Dt, L')
    b_self = jnp.diagonal(b)
    nxt = np.minimum(lab + 1, Lp - 1)                     # dummy at last col
    w_adv = w[:, lab, nxt] * adv_mask[None, :]
    b_adv = b[lab, nxt] * adv_mask
    last = np.arange(P) * ns + (ns - 1)
    first = np.arange(P) * ns
    w_cross = w[:, last][:, :, first]                     # (Dt, P, P)
    b_cross = b[last][:, first]
    return w_self, b_self, w_adv, b_adv, w_cross, b_cross


def factored_planes(params: dict, feats, Lp: int, ns: int,
                    state_range, trans_range, use_state_bias=True,
                    precision="highest"):
    """feats (B, T, D) -> (state (B,T,L'), selfp, advp, crossp (B,T,P,P)).

    The state plane is the standard dense map (models.feature_map
    semantics); the transition planes contract the gathered legal-pair
    weights with the ``trans_range`` feature slice.
    """
    # "bf16x3" is the kernel-side 3-pass mode; XLA has it natively as HIGH
    prec = {"default": None, "bf16x3": "high"}.get(precision, precision)
    xs = feats[..., state_range[0]:state_range[1]]
    xt = feats[..., trans_range[0]:trans_range[1]]
    state = jnp.einsum("...td,dl->...tl", xs, params["w_state"],
                       precision=prec, preferred_element_type=jnp.float32)
    if use_state_bias and "b_state" in params:
        state = state + params["b_state"]
    w_self, b_self, w_adv, b_adv, w_cross, b_cross = \
        factored_trans_weights(params, Lp, ns)
    P = Lp // ns
    crossp = jnp.einsum("...td,dpq->...tpq", xt, w_cross, precision=prec,
                        preferred_element_type=jnp.float32) + b_cross
    if ns == 1:
        return state, None, None, crossp
    selfp = jnp.einsum("...td,dl->...tl", xt, w_self, precision=prec,
                       preferred_element_type=jnp.float32) + b_self
    advp = (jnp.einsum("...td,dl->...tl", xt, w_adv, precision=prec,
                       preferred_element_type=jnp.float32) + b_adv)
    # keep illegal advance slots at the semiring zero regardless of bias
    advp = jnp.where(jnp.asarray(_adv_valid(Lp, ns))[None, None, :] > 0,
                     advp, NEG_INF)
    return state, selfp, advp, crossp


def _boundary_state(state, lengths, ns: int, boundaries: bool):
    """Fold start/end n-state masking into the state plane (state-major)."""
    if ns == 1 or not boundaries:
        return state
    Lp = state.shape[-1]
    T = state.shape[-2]
    st = jnp.arange(Lp) % ns
    start = jnp.where(st == 0, 0.0, NEG_INF)
    end = jnp.where(st == ns - 1, 0.0, NEG_INF)
    state = state.at[..., 0, :].add(start)
    at_end = (jnp.arange(T)[None, :] == (lengths - 1)[:, None])
    return state + jnp.where(at_end[..., None], end[None, None, :], 0.0)


def _clamp_row(labels_t, Lp: int, clamp_ns: int):
    """(B,) labels -> (B, L') additive clamp penalty (state-major)."""
    lane = jnp.arange(Lp)
    return jnp.where(lane[None, :] // clamp_ns == labels_t[:, None],
                     0.0, NEG_INF)


def _factored_update(alpha, f_t, a_t, c_t, ns: int):
    """One factored semiring matvec: alpha (B, L') -> (B, L') candidates
    (before adding the state plane)."""
    if ns == 1:
        return _lse(alpha[:, :, None] + c_t, axis=1)
    Lp = alpha.shape[-1]
    st = jnp.arange(Lp) % ns
    self_c = alpha + f_t
    adv_c = jnp.roll(alpha + a_t, 1, axis=-1)
    adv_c = jnp.where(st[None, :] > 0, adv_c, NEG_INF)
    alpha_last = alpha[:, ns - 1::ns]                       # (B, P)
    crossed = _lse(alpha_last[:, :, None] + c_t, axis=1)    # (B, P)
    cross_c = jnp.where(st[None, :] == 0,
                        jnp.repeat(crossed, ns, axis=-1), NEG_INF)
    return jnp.logaddexp(self_c, jnp.logaddexp(adv_c, cross_c))


def _lse(x, axis):
    m = jnp.maximum(jnp.max(x, axis=axis, keepdims=True), NEG_INF)
    out = m + jnp.log(jnp.maximum(
        jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True), 1e-35))
    return jnp.squeeze(out, axis)


@functools.partial(jax.jit, static_argnames=("ns", "clamp_ns", "boundaries"))
def fdt_logZ_pair(state, selfp, advp, crossp, labels, lengths,
                  ns: int, clamp_ns: int, boundaries: bool = True):
    """Free + clamped log-partitions over the factored lattice.

    All planes batched (B, T, ...), state-major expanded labels; ``labels``
    (B, T) int32 at ``clamp_ns`` granularity (ns = phone labels, 1 = state
    labels).  Returns (zf, zc): (B,) each.
    """
    B, T, Lp = state.shape
    state = _boundary_state(state, lengths, ns, boundaries)
    state_tm = jnp.moveaxis(state, 1, 0)
    labels_tm = jnp.moveaxis(labels, 1, 0)
    cross_tm = jnp.moveaxis(crossp, 1, 0)
    if ns > 1:
        self_tm = jnp.moveaxis(selfp, 1, 0)
        adv_tm = jnp.moveaxis(advp, 1, 0)
    else:  # unused; keep the scan signature uniform
        self_tm = adv_tm = jnp.zeros((T, B, 1), state.dtype)

    clamp0 = _clamp_row(labels_tm[0], Lp, clamp_ns)
    af0 = state_tm[0]
    ac0 = state_tm[0] + clamp0

    @jax.checkpoint
    def step(carry, inp):
        af, ac = carry
        t, s_t, f_t, a_t, c_t, y_t = inp
        cand_f = _factored_update(af, f_t, a_t, c_t, ns) + s_t
        cand_c = (_factored_update(ac, f_t, a_t, c_t, ns) + s_t
                  + _clamp_row(y_t, Lp, clamp_ns))
        valid = (t < lengths)[:, None]
        return (jnp.where(valid, cand_f, af),
                jnp.where(valid, cand_c, ac)), None

    ts = jnp.arange(1, T)
    (af, ac), _ = jax.lax.scan(
        step, (af0, ac0),
        (ts, state_tm[1:], self_tm[1:], adv_tm[1:], cross_tm[1:],
         labels_tm[1:]))
    return _dead_guard(_lse(af, -1)), _dead_guard(_lse(ac, -1))


def _dead_guard(z):
    """Zero the gradient of sequences whose lattice has no legal path
    (z == NEG_INF, e.g. a clamp made inconsistent by a mid-phone length
    cut): the 'gradient' there is a softmax over garbage.  The Pallas
    kernel applies the same rule (its `live` gate)."""
    return jnp.where(z > NEG_INF * 0.5, z, jax.lax.stop_gradient(z))


def fdt_nll_dual(fmap_cfg, ns: int, params, feats, labels, lengths,
                 clamp_ns: int | None = None, boundaries: bool = True,
                 grad_feats: bool = False):
    """Fused dual-lattice objective for frame-dependent transitions.

    Mirrors ops.mxu.nll_dual's contract: returns per-sequence
    ``(nll, logZ, numerator)``.  Backend dispatch: the fused Pallas kernel
    (plane formation on the in-kernel MXU, classical-gradient VJP) on TPU
    when the shape is eligible; the factored XLA scan elsewhere.

    ``grad_feats``: uniform contract on BOTH backends — when False, feats
    is stop_gradient'ed, so ``dfeats`` is exactly zero regardless of
    whether the Pallas kernel or the factored XLA scan runs (the Pallas
    path additionally skips computing the cotangent at all).
    """
    from asr_craft_tpu import kernels
    if not grad_feats:
        feats = jax.lax.stop_gradient(feats)
    Lp = fmap_cfg.num_expanded
    clamp_ns = ns if clamp_ns is None else clamp_ns
    P = Lp // ns
    # P cap 128: the (P8^2 + 3 L') x (TB Bk) plane at TB=1 plus dplane
    # must fit VMEM (kernels.fdt_pallas._auto_tb shrinks TB with P; at
    # P=128, R ~ 17.5k rows -> TB=2/1).  The r3 cap was 64.
    if kernels.backend() == "pallas" and P <= 128:
        from asr_craft_tpu.kernels.fdt_pallas import fdt_nll_dual_pallas
        return fdt_nll_dual_pallas(fmap_cfg, ns, params, feats, labels,
                                   lengths, clamp_ns, boundaries,
                                   grad_feats=grad_feats)
    state, selfp, advp, crossp = factored_planes(
        params, feats, Lp, ns, fmap_cfg.state_range, fmap_cfg.trans_range,
        fmap_cfg.use_state_bias, fmap_cfg.precision)
    zf, zc = fdt_logZ_pair(state, selfp, advp, crossp, labels, lengths,
                           ns, clamp_ns, boundaries)
    return zf - zc, zf, zc


@functools.partial(jax.jit, static_argnames=("ns", "boundaries"))
def fdt_posteriors(state, selfp, advp, crossp, lengths, ns: int,
                   boundaries: bool = True):
    """(B, T, L') frame posteriors over the factored frame-dependent
    lattice — the parity tensor surface at shapes where the materialized
    ``(B, T, L', L')`` path (ops.fwdbwd.posteriors_batch) cannot exist.
    Forward + backward factored scans; gamma = alpha + beta - logZ.
    Held to the materialized path at small shapes (tests/oracle/test_fdt).
    """
    B, T, Lp = state.shape
    state = _boundary_state(state, lengths, ns, boundaries)
    state_tm = jnp.moveaxis(state, 1, 0)
    cross_tm = jnp.moveaxis(crossp, 1, 0)
    if ns > 1:
        self_tm = jnp.moveaxis(selfp, 1, 0)
        adv_tm = jnp.moveaxis(advp, 1, 0)
    else:
        self_tm = adv_tm = jnp.zeros((T, B, 1), state.dtype)
    st_ = jnp.arange(Lp) % ns

    @jax.checkpoint
    def fwd_step(af, inp):
        t, s_t, f_t, a_t, c_t = inp
        cand = _factored_update(af, f_t, a_t, c_t, ns) + s_t
        valid = (t < lengths)[:, None]
        new = jnp.where(valid, cand, af)
        return new, new

    ts = jnp.arange(1, T)
    af_last, alphas_rest = jax.lax.scan(
        fwd_step, state_tm[0],
        (ts, state_tm[1:], self_tm[1:], adv_tm[1:], cross_tm[1:]))
    alphas = jnp.concatenate([state_tm[0][None], alphas_rest], axis=0)
    logZ = _lse(af_last, -1)                                # (B,)

    @jax.checkpoint
    def bwd_step(bt, inp):
        # planes at frame t+1; bt = beta[t+1]
        t, s_n, f_n, a_n, c_n = inp
        x = bt + s_n                                        # (B, L')
        if ns == 1:
            # beta[t][p] = lse_q(x[q] + c_{t+1}[p, q])
            nb = _lse(x[:, None, :] + c_n, axis=2)
        else:
            self_c = x + f_n
            adv_c = jnp.where(st_[None, :] < ns - 1,
                              jnp.roll(x, -1, axis=-1) + a_n, NEG_INF)
            x_first = x[:, 0::ns]                           # (B, P)
            crossed = _lse(x_first[:, None, :] + c_n, axis=2)   # (B, P)
            cross_c = jnp.where(st_[None, :] == ns - 1,
                                jnp.repeat(crossed, ns, axis=-1), NEG_INF)
            nb = jnp.logaddexp(self_c, jnp.logaddexp(adv_c, cross_c))
        # frames at/after length-1 keep beta = 0 (the init)
        valid_next = (t + 1 < lengths)[:, None]
        nb = jnp.where(valid_next, nb, bt)
        return nb, nb

    beta_last = jnp.zeros((B, Lp), state.dtype)
    _, betas_rev = jax.lax.scan(
        bwd_step, beta_last,
        (jnp.arange(T - 1), state_tm[1:], self_tm[1:], adv_tm[1:],
         cross_tm[1:]), reverse=True)
    betas = jnp.concatenate([betas_rev, beta_last[None]], axis=0)
    gamma = alphas + betas - logZ[None, :, None]
    post = jnp.exp(jnp.minimum(gamma, 0.0))
    Tidx = jnp.arange(T)[:, None, None]
    post = jnp.where(Tidx < lengths[None, :, None], post, 0.0)
    return jnp.moveaxis(post, 0, 1)


@functools.partial(jax.jit, static_argnames=("ns", "boundaries",
                                             "beam_width", "beam_threshold"))
def fdt_viterbi(state, selfp, advp, crossp, lengths, ns: int,
                boundaries: bool = True, beam_width: int | None = None,
                beam_threshold: float | None = None):
    """Max-plus decode over the factored lattice with traceback.

    Returns (paths (B, T) int32 state-major expanded labels, scores (B,)).
    Beam options mirror ops.viterbi (None = exact).  Backpointers name the
    predecessor expanded label directly (self: l, advance: l-1, cross: the
    argmax phone's last state), so the traceback is the standard gather.
    """
    B, T, Lp = state.shape
    P = Lp // ns
    state = _boundary_state(state, lengths, ns, boundaries)
    state_tm = jnp.moveaxis(state, 1, 0)
    cross_tm = jnp.moveaxis(crossp, 1, 0)
    if ns > 1:
        self_tm = jnp.moveaxis(selfp, 1, 0)
        adv_tm = jnp.moveaxis(advp, 1, 0)
    else:
        self_tm = adv_tm = jnp.zeros((T, B, 1), state.dtype)
    lab = jnp.arange(Lp, dtype=jnp.int32)
    st = lab % ns

    def prune(delta):
        if beam_threshold is not None:
            delta = jnp.where(
                delta >= jnp.max(delta, axis=-1, keepdims=True)
                - beam_threshold, delta, NEG_INF)
        if beam_width is not None and beam_width < Lp:
            kth = jax.lax.top_k(delta, beam_width)[0][..., -1:]
            delta = jnp.where(delta >= kth, delta, NEG_INF)
        return delta

    def step(carry, inp):
        t, s_t, f_t, a_t, c_t = inp
        if ns == 1:
            cand = carry[:, :, None] + c_t                  # (B, P_prev, P)
            best = jnp.max(cand, axis=1)
            bp = jnp.argmax(cand, axis=1).astype(jnp.int32)
        else:
            self_c = carry + f_t
            adv_c = jnp.roll(carry + a_t, 1, axis=-1)
            adv_c = jnp.where(st[None, :] > 0, adv_c, NEG_INF)
            alpha_last = carry[:, ns - 1::ns]
            camd = alpha_last[:, :, None] + c_t             # (B, P, P)
            cross_best = jnp.max(camd, axis=1)
            cross_arg = jnp.argmax(camd, axis=1).astype(jnp.int32)
            cross_c = jnp.where(st[None, :] == 0,
                                jnp.repeat(cross_best, ns, axis=-1), NEG_INF)
            cross_bp = jnp.repeat(cross_arg * ns + (ns - 1), ns, axis=-1)
            stacked = jnp.stack([self_c, adv_c, cross_c], axis=0)
            which = jnp.argmax(stacked, axis=0)
            best = jnp.max(stacked, axis=0)
            bp = jnp.where(which == 0, lab[None, :],
                           jnp.where(which == 1, lab[None, :] - 1, cross_bp))
        new = prune(best + s_t)
        valid = (t < lengths)[:, None]
        new = jnp.where(valid, new, carry)
        bp = jnp.where(valid, bp, lab[None, :])
        return new, bp

    ts = jnp.arange(1, T)
    # init frame is pruned too — matching ops.viterbi, viterbi_pallas and
    # the fdt kernel (symmetric-beam contract of models.crf.decode)
    final, bps = jax.lax.scan(
        step, prune(state_tm[0]),
        (ts, state_tm[1:], self_tm[1:], adv_tm[1:], cross_tm[1:]))
    scores = jnp.max(final, axis=-1)
    last_lab = jnp.argmax(final, axis=-1).astype(jnp.int32)

    def back(labels_b, bp_t):
        prev = jnp.take_along_axis(bp_t, labels_b[:, None], axis=-1)[:, 0]
        return prev, labels_b

    first_lab, rest = jax.lax.scan(back, last_lab, bps, reverse=True)
    paths = jnp.concatenate([first_lab[None], rest], axis=0)
    return jnp.moveaxis(paths, 0, 1), scores
