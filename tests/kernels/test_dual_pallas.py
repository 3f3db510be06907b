"""Dual (free + clamped) kernels and the fused nll_dual objective vs the
two-pass reference path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_craft_tpu.kernels.dual_pallas import (backward_dual_pallas,
                                               forward_dual_pallas)
from asr_craft_tpu.ops import mxu, oracle
from asr_craft_tpu.ops.mxu import _clamp_penalty

TOL = dict(rtol=5e-4, atol=5e-5)


def _problem(rng, B, T, L, num_states=1):
    nphones = L // num_states
    state = rng.normal(size=(B, T, L)).astype(np.float32)
    trans = rng.normal(size=(L, L)).astype(np.float32)
    # topology-legal-ish labels: runs of num_states+1 frames
    run = num_states + 1
    labels = np.repeat(rng.integers(0, nphones, size=(B, T // run + 1)),
                       run, axis=1)[:, :T].astype(np.int32)
    lengths = rng.integers(1, T + 1, size=B).astype(np.int32)
    lengths[0] = T
    return (jnp.asarray(state), jnp.asarray(trans), jnp.asarray(labels),
            jnp.asarray(lengths))


@pytest.mark.parametrize("B,T,L,ns", [(2, 7, 4, 1), (3, 12, 6, 2),
                                      (2, 9, 144, 3)])
def test_forward_dual_matches_separate(rng, B, T, L, ns):
    state, trans, labels, lengths = _problem(rng, B, T, L, ns)
    af, ac, zf, zc = forward_dual_pallas(
        jnp.moveaxis(state, 1, 0), trans, jnp.moveaxis(labels, 1, 0),
        lengths, num_states=ns, interpret=True)
    _, zf_ref = mxu.forward_mxu(state, trans, lengths)
    clamp = _clamp_penalty(labels, L, ns)
    ac_ref, zc_ref = mxu.forward_mxu(state + clamp, trans, lengths)
    np.testing.assert_allclose(np.asarray(zf), np.asarray(zf_ref), **TOL)
    np.testing.assert_allclose(np.asarray(zc), np.asarray(zc_ref), **TOL)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(ac, 0, 1)),
                               np.asarray(ac_ref), **TOL)


def test_backward_dual_matches_separate(rng):
    B, T, L, ns = 2, 10, 6, 2
    state, trans, labels, lengths = _problem(rng, B, T, L, ns)
    bf, bc = backward_dual_pallas(
        jnp.moveaxis(state, 1, 0), trans, jnp.moveaxis(labels, 1, 0),
        lengths, num_states=ns, interpret=True)
    for b in range(B):
        n = int(lengths[b])
        ref_f = oracle.backward_np(np.asarray(state)[b], np.asarray(trans), n)
        np.testing.assert_allclose(np.asarray(bf)[:n, b], ref_f, **TOL)
        clamp = np.asarray(_clamp_penalty(labels, L, ns))[b]
        ref_c = oracle.backward_np(np.asarray(state)[b] + clamp,
                                   np.asarray(trans), n)
        np.testing.assert_allclose(np.asarray(bc)[:n, b], ref_c, **TOL)


@pytest.mark.parametrize("ns", [1, 2])
def test_nll_dual_value_and_grad_match_two_pass(rng, ns):
    B, T, L = 3, 11, 6
    state, trans, labels, lengths = _problem(rng, B, T, L, ns)

    def loss_dual(s, t):
        nll, _, _ = mxu.nll_dual(s, t, labels, lengths, ns)
        return jnp.sum(nll)

    def loss_ref(s, t):
        zf = mxu.log_partition_mxu(s, t, lengths)
        clamp = _clamp_penalty(labels, L, ns)
        zc = mxu.log_partition_mxu(s + clamp, t, lengths)
        return jnp.sum(zf - zc)

    v1, g1 = jax.value_and_grad(loss_dual, argnums=(0, 1))(state, trans)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1))(state, trans)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5, atol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=2e-5)


def test_nll_dual_weighted_outputs_grad(rng):
    """Cotangents flowing through all three outputs (nll, logZ, num)."""
    B, T, L = 2, 8, 4
    state, trans, labels, lengths = _problem(rng, B, T, L, 1)

    def f_dual(s):
        nll, zf, zc = mxu.nll_dual(s, trans, labels, lengths, 1)
        return jnp.sum(nll * 2.0 + zf * 0.5 - zc * 0.25)

    def f_ref(s):
        zf = mxu.log_partition_mxu(s, trans, lengths)
        clamp = _clamp_penalty(labels, L, 1)
        zc = mxu.log_partition_mxu(s + clamp, trans, lengths)
        return jnp.sum((zf - zc) * 2.0 + zf * 0.5 - zc * 0.25)

    g1 = jax.grad(f_dual)(state)
    g2 = jax.grad(f_ref)(state)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=3e-3, atol=2e-5)


@pytest.mark.parametrize("ns", [1, 3])
def test_nll_dual_pallas_branch_glue(rng, monkeypatch, ns):
    """The fused-pallas branch of nll_dual's fwd/bwd (ops/mxu.py
    _make_nll_dual with kernels.backend() == 'pallas') vs the xla branch —
    covers the moveaxis/arg-wiring glue, not just the kernels in isolation
    (ADVICE r2 item 1)."""
    import functools

    from asr_craft_tpu import kernels

    B, T, L = 2, 11, 3 * ns
    state, trans, labels, lengths = _problem(rng, B, T, L, ns)

    def f(s, t):
        nll, zf, zc = mxu.nll_dual(s, t, labels, lengths, ns)
        return jnp.sum(nll * 2.0 + zf * 0.5 - zc * 0.25)

    kernels.set_backend("xla")
    try:
        v_ref, g_ref = jax.value_and_grad(f, argnums=(0, 1))(state, trans)

        for name in ("forward_dual_pallas", "backward_dual_pallas",
                     "backward_dual_grad_pallas"):
            monkeypatch.setattr(kernels, name, functools.partial(
                getattr(kernels, name), interpret=True))
        kernels.set_backend("pallas")
        v_pl, g_pl = jax.value_and_grad(f, argnums=(0, 1))(state, trans)
    finally:
        kernels.set_backend("auto")

    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=1e-5,
                               atol=1e-5)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=2e-5)


@pytest.mark.parametrize("B,T,L,ns", [(2, 9, 4, 1), (3, 13, 6, 2),
                                      (2, 10, 144, 3)])
def test_backward_dual_grad_fused_matches_classical(rng, B, T, L, ns):
    """Fused beta+gradient kernel == the two-kernel + XLA-assembly path."""
    from asr_craft_tpu.kernels.dual_pallas import backward_dual_grad_pallas

    state, trans, labels, lengths = _problem(rng, B, T, L, ns)
    state_tm = jnp.moveaxis(state, 1, 0)
    labels_tm = jnp.moveaxis(labels, 1, 0)
    af, ac, zf, zc = forward_dual_pallas(state_tm, trans, labels_tm,
                                         lengths, num_states=ns,
                                         interpret=True)
    wf = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
    wc = jnp.asarray(rng.normal(size=(B,)), jnp.float32)

    g_state_tm, UV = backward_dual_grad_pallas(
        state_tm, trans, labels_tm, lengths, af, ac, zf, zc, wf, wc,
        num_states=ns, interpret=True)

    # classical reference (the XLA assembly path, as in _make_nll_dual.bwd)
    bf, bc = backward_dual_pallas(state_tm, trans, labels_tm, lengths,
                                  num_states=ns, interpret=True)
    valid = (jnp.arange(T)[:, None] < lengths[None, :])
    gamma_f = jnp.exp(af + bf - zf[None, :, None])
    gamma_c = jnp.exp(ac + bc - zc[None, :, None])
    ref_g_state = jnp.where(
        valid[..., None],
        gamma_f * wf[None, :, None] + gamma_c * wc[None, :, None], 0.0)
    np.testing.assert_allclose(np.asarray(g_state_tm),
                               np.asarray(ref_g_state), **TOL)

    clamp = _clamp_penalty(labels, L, ns)
    Uf, Vf = mxu._xi_uv(af, bf, state, zf, lengths, wf)
    Uc, Vc = mxu._xi_uv(ac, bc, state + clamp, zc, lengths, wc)
    U = jnp.concatenate([Uf, Uc], axis=0)
    V = jnp.concatenate([Vf, Vc], axis=0)
    ref_UV = jnp.einsum("tbp,tbl->pl", U, V)
    np.testing.assert_allclose(np.asarray(UV), np.asarray(ref_UV),
                               rtol=2e-3, atol=2e-4)
