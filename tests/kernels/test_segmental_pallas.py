"""SCRF Pallas forward kernel (interpret mode) vs the jnp scan on
materialized potentials."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_craft_tpu.kernels.segmental_pallas import segmental_forward_pallas
from asr_craft_tpu.models.segmental import SegCrfConfig, seg_potentials
from asr_craft_tpu.ops import segmental as seg_ops

TOL = dict(rtol=5e-4, atol=5e-5)


def _setup(rng, B, T, D, L, Dmax):
    cfg = SegCrfConfig(num_labels=L, feat_dim=D, max_dur=Dmax)
    params = cfg.init_params(jax.random.PRNGKey(0), scale=0.4)
    feats = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lengths = rng.integers(1, T + 1, size=B).astype(np.int32)
    lengths[0] = T
    return cfg, params, feats, jnp.asarray(lengths)


@pytest.mark.parametrize("B,T,D,L,Dmax", [
    (2, 6, 4, 3, 2), (3, 12, 5, 4, 4), (2, 10, 6, 48, 8), (4, 9, 4, 144, 3),
])
def test_seg_kernel_matches_scan(rng, B, T, D, L, Dmax):
    cfg, params, feats, lengths = _setup(rng, B, T, D, L, Dmax)
    seg, trans = seg_potentials(cfg, params, feats)
    _, logZ_ref = seg_ops.segmental_forward_batch(seg, trans, lengths)

    prec = jax.lax.Precision.HIGHEST
    frame = jnp.einsum("btd,dl->btl", feats, params["w_frame"],
                       precision=prec)
    alphas, logZ = segmental_forward_pallas(
        jnp.moveaxis(frame, 1, 0), trans, params.get("b_dur"),
        params.get("b_seg"), lengths, max_dur=Dmax, interpret=True)
    np.testing.assert_allclose(np.asarray(logZ), np.asarray(logZ_ref), **TOL)
    # alphas match on valid frames
    _, logZs = seg_ops.segmental_forward_batch(seg, trans, lengths)
    alphas_ref, _ = jax.vmap(
        lambda s, n: seg_ops.segmental_forward(s, trans, n))(seg, lengths)
    a_k = np.asarray(jnp.moveaxis(alphas, 0, 1))
    a_r = np.asarray(alphas_ref)
    for b in range(B):
        n = int(lengths[b])
        np.testing.assert_allclose(a_k[b, :n], a_r[b, :n], **TOL)


def test_seg_kernel_sum_pooling(rng):
    B, T, D, L, Dmax = 2, 8, 4, 5, 3
    cfg = SegCrfConfig(num_labels=L, feat_dim=D, max_dur=Dmax, pooling="sum",
                       use_dur_feature=False, use_seg_bias=False)
    params = cfg.init_params(jax.random.PRNGKey(1), scale=0.3)
    feats = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lengths = jnp.asarray([8, 5], jnp.int32)
    seg, trans = seg_potentials(cfg, params, feats)
    _, logZ_ref = seg_ops.segmental_forward_batch(seg, trans, lengths)
    prec = jax.lax.Precision.HIGHEST
    frame = jnp.einsum("btd,dl->btl", feats, params["w_frame"],
                       precision=prec)
    _, logZ = segmental_forward_pallas(
        jnp.moveaxis(frame, 1, 0), trans, None, None, lengths,
        max_dur=Dmax, mean_pool=False, interpret=True)
    np.testing.assert_allclose(np.asarray(logZ), np.asarray(logZ_ref), **TOL)


def test_seg_backward_kernel_matches_scan(rng):
    """Fused beta kernel == streaming beta scan (variable lengths)."""
    from asr_craft_tpu.kernels.segmental_pallas import segmental_backward_pallas
    from asr_craft_tpu.ops.segmental_stream import (_invd,
                                                    seg_backward_stream)
    B, T, L, Dmax = 3, 10, 5, 4
    frame = jnp.asarray(rng.normal(size=(T, B, L)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(Dmax, L)) * 0.5, jnp.float32)
    trans = jnp.asarray(rng.normal(size=(L, L)) * 0.5, jnp.float32)
    lengths = jnp.asarray([10, 6, 1], jnp.int32)
    cum = jnp.cumsum(frame, axis=0)
    ref = seg_backward_stream(cum, bias, trans, lengths, _invd(Dmax, True))
    out = segmental_backward_pallas(frame, trans, bias, lengths,
                                    max_dur=Dmax, interpret=True)
    for b in range(B):
        n = int(lengths[b])
        np.testing.assert_allclose(np.asarray(out)[:n, b],
                                   np.asarray(ref)[:n, b], **TOL)


def test_seg_grad_kernel_matches_scan(rng):
    """Fused xi kernel pieces == streaming grad scan pieces."""
    from asr_craft_tpu.kernels.segmental_pallas import (
        segmental_backward_pallas, segmental_grad_pallas)
    from asr_craft_tpu.ops.segmental_stream import (_grad_scan, _invd,
                                                    seg_backward_stream,
                                                    seg_forward_stream)
    B, T, L, Dmax = 3, 9, 5, 3
    frame = jnp.asarray(rng.normal(size=(T, B, L)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(Dmax, L)) * 0.5, jnp.float32)
    trans = jnp.asarray(rng.normal(size=(L, L)) * 0.5, jnp.float32)
    lengths = jnp.asarray([9, 5, 2], jnp.int32)
    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
    cum = jnp.cumsum(frame, axis=0)
    invd = _invd(Dmax, True)
    alphas, logZ = seg_forward_stream(cum, bias, trans, lengths, invd)
    betas = seg_backward_stream(cum, bias, trans, lengths, invd)
    ref = _grad_scan(cum, bias, trans, lengths, invd, alphas, betas, logZ, g)
    out = segmental_grad_pallas(frame, trans, bias, lengths, alphas,
                                betas, logZ, g, max_dur=Dmax,
                                interpret=True)
    for r, o, name in zip(ref, out, ("A", "S_emit", "acc_fin", "gd", "gt")):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_seg_stream_vjp_pallas_backend(rng):
    """Full custom-VJP through the fused kernels (interpret mode, forced
    pallas backend) == the dense-path autodiff gradient."""
    from asr_craft_tpu import kernels
    from asr_craft_tpu.models.segmental import scrf_loss, scrf_loss_fused
    cfg = SegCrfConfig(num_labels=4, feat_dim=4, max_dur=3)
    params = cfg.init_params(jax.random.PRNGKey(5), scale=0.3)
    feats = jnp.asarray(rng.normal(size=(2, 8, 4)), jnp.float32)
    labels = jnp.asarray(np.repeat(rng.integers(0, 4, size=(2, 4)), 2,
                                   axis=1), jnp.int32)
    lengths = jnp.asarray([8, 5], jnp.int32)
    gd = jax.grad(lambda p: scrf_loss(cfg, p, feats, labels, lengths)[0])(
        params)
    # interpret-mode pallas: monkeypatch the interpret default via backend
    kernels.set_backend("pallas")
    try:
        import asr_craft_tpu.kernels.segmental_pallas as sp
        orig_fwd, orig_bwd, orig_grad = (sp.segmental_forward_pallas,
                                         sp.segmental_backward_pallas,
                                         sp.segmental_grad_pallas)
        kernels.segmental_forward_pallas = \
            lambda *a, **k: orig_fwd(*a, **{**k, "interpret": True})
        kernels.segmental_backward_pallas = \
            lambda *a, **k: orig_bwd(*a, **{**k, "interpret": True})
        kernels.segmental_grad_pallas = \
            lambda *a, **k: orig_grad(*a, **{**k, "interpret": True})
        lf, _ = scrf_loss_fused(cfg, params, feats, labels, lengths)
        gf = jax.grad(lambda p: scrf_loss_fused(cfg, p, feats, labels,
                                                lengths)[0])(params)
    finally:
        kernels.set_backend("auto")
        kernels.segmental_forward_pallas = orig_fwd
        kernels.segmental_backward_pallas = orig_bwd
        kernels.segmental_grad_pallas = orig_grad
    ld, _ = scrf_loss(cfg, params, feats, labels, lengths)
    np.testing.assert_allclose(float(lf), float(ld), rtol=1e-5)
    for k in gd:
        np.testing.assert_allclose(np.asarray(gf[k]), np.asarray(gd[k]),
                                   rtol=5e-4, atol=1e-5, err_msg=k)


def test_segmental_viterbi_kernel_matches_dense(rng):
    """Fused max-plus forward kernel (M-window) + deltas traceback == the
    dense materialized segmental Viterbi."""
    import jax.numpy as jnp
    from asr_craft_tpu import kernels
    from asr_craft_tpu.models.segmental import (SegCrfConfig,
                                                scrf_decode_dense,
                                                _frame_scores_and_bias)
    from asr_craft_tpu.ops.segmental_stream import _seg_traceback_deltas

    cfg = SegCrfConfig(num_labels=5, feat_dim=6, max_dur=4)
    params = cfg.init_params(jax.random.PRNGKey(10), scale=0.4)
    feats = jnp.asarray(rng.normal(size=(3, 11, 6)), jnp.float32)
    lengths = jnp.asarray([11, 8, 4], jnp.int32)
    frame, bias = _frame_scores_and_bias(cfg, params, feats)
    T = feats.shape[1]
    deltas, argd, lab0, scores = kernels.segmental_viterbi_pallas(
        jnp.moveaxis(frame, 1, 0), params["b_trans"], bias, None, lengths,
        cfg.max_dur, True, interpret=True)
    starts, labels, n = _seg_traceback_deltas(argd, deltas,
                                              params["b_trans"], lab0,
                                              lengths, T)
    s2, l2, n2, sc2 = scrf_decode_dense(cfg, params, feats, lengths)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(sc2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(n), np.asarray(n2))
    for b in range(3):
        k = int(n[b])
        np.testing.assert_array_equal(np.asarray(starts)[b, :k],
                                      np.asarray(s2)[b, :k])
        np.testing.assert_array_equal(np.asarray(labels)[b, :k],
                                      np.asarray(l2)[b, :k])


def test_segmental_viterbi_traceback_kernel(rng):
    """Forward kernel + in-kernel traceback + marker packing == dense."""
    import jax.numpy as jnp
    from asr_craft_tpu import kernels
    from asr_craft_tpu.models.segmental import (SegCrfConfig,
                                                scrf_decode_dense,
                                                _frame_scores_and_bias)
    from asr_craft_tpu.ops.segmental_stream import _pack_segment_markers

    cfg = SegCrfConfig(num_labels=5, feat_dim=6, max_dur=4)
    params = cfg.init_params(jax.random.PRNGKey(11), scale=0.4)
    feats = jnp.asarray(rng.normal(size=(3, 13, 6)), jnp.float32)
    lengths = jnp.asarray([13, 9, 4], jnp.int32)
    frame, bias = _frame_scores_and_bias(cfg, params, feats)
    deltas, argd, lab0, scores = kernels.segmental_viterbi_pallas(
        jnp.moveaxis(frame, 1, 0), params["b_trans"], bias, None, lengths,
        cfg.max_dur, True, interpret=True)
    end_lab, end_start = kernels.segmental_viterbi_traceback_pallas(
        deltas, argd, params["b_trans"], lab0, lengths, interpret=True)
    starts, labels, n = _pack_segment_markers(end_lab, end_start)
    s2, l2, n2, sc2 = scrf_decode_dense(cfg, params, feats, lengths)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(sc2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(n), np.asarray(n2))
    for b in range(3):
        k = int(n[b])
        np.testing.assert_array_equal(np.asarray(starts)[b, :k],
                                      np.asarray(s2)[b, :k], err_msg=f"{b}")
        np.testing.assert_array_equal(np.asarray(labels)[b, :k],
                                      np.asarray(l2)[b, :k], err_msg=f"{b}")


def test_segmental_viterbi_zero_length_rows(rng):
    """Length-0 rows (real, not loader-rewritten padding) must return
    NEG_INF scores and empty segments, matching the XLA streaming path
    (ADVICE r3: the unclipped lengths-1 gather indexed frame -1)."""
    import jax.numpy as jnp
    from asr_craft_tpu import kernels
    from asr_craft_tpu.models.segmental import (SegCrfConfig,
                                                _frame_scores_and_bias)
    from asr_craft_tpu.ops.segmental_stream import seg_viterbi_stream
    from asr_craft_tpu.ops.semiring import NEG_INF

    cfg = SegCrfConfig(num_labels=5, feat_dim=6, max_dur=4)
    params = cfg.init_params(jax.random.PRNGKey(12), scale=0.4)
    feats = jnp.asarray(rng.normal(size=(3, 11, 6)), jnp.float32)
    lengths = jnp.asarray([11, 0, 4], jnp.int32)
    frame, bias = _frame_scores_and_bias(cfg, params, feats)
    deltas, argd, lab0, scores = kernels.segmental_viterbi_pallas(
        jnp.moveaxis(frame, 1, 0), params["b_trans"], bias, None, lengths,
        cfg.max_dur, True, interpret=True)
    s_ref, l_ref, n_ref, sc_ref = seg_viterbi_stream(
        jnp.moveaxis(frame, 1, 0), bias, params["b_trans"], lengths,
        cfg.max_dur)
    assert float(scores[1]) <= NEG_INF * 0.5
    np.testing.assert_allclose(np.asarray(scores)[[0, 2]],
                               np.asarray(sc_ref)[[0, 2]],
                               rtol=1e-5, atol=1e-5)
    assert int(n_ref[1]) == 0
