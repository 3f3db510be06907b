"""Pallas Viterbi kernel (interpret mode) vs oracle and XLA path."""
import jax.numpy as jnp
import numpy as np
import pytest

from asr_craft_tpu.kernels.viterbi_pallas import viterbi_pallas
from asr_craft_tpu.ops import oracle
from asr_craft_tpu.ops.viterbi import viterbi_batch


def _problem(rng, B, T, L):
    state = rng.normal(size=(B, T, L)).astype(np.float32)
    trans = rng.normal(size=(L, L)).astype(np.float32)
    lengths = rng.integers(1, T + 1, size=B).astype(np.int32)
    lengths[0] = T
    return state, trans, lengths


@pytest.mark.parametrize("B,T,L", [(2, 6, 4), (3, 11, 48), (4, 9, 144)])
def test_viterbi_kernel_matches_oracle(rng, B, T, L):
    state, trans, lengths = _problem(rng, B, T, L)
    path, score = viterbi_pallas(
        jnp.moveaxis(jnp.asarray(state), 1, 0), jnp.asarray(trans),
        jnp.asarray(lengths), interpret=True)
    assert path.shape == (B, T)
    for b in range(B):
        ref_path, ref_score = oracle.viterbi_np(state[b], trans, lengths[b])
        np.testing.assert_allclose(np.asarray(score)[b], ref_score,
                                   rtol=5e-4, atol=5e-5)
        np.testing.assert_array_equal(np.asarray(path)[b, :lengths[b]],
                                      ref_path)


def test_viterbi_kernel_matches_xla_path(rng):
    B, T, L = 4, 13, 10
    state, trans, lengths = _problem(rng, B, T, L)
    s, t, n = jnp.asarray(state), jnp.asarray(trans), jnp.asarray(lengths)
    p_ref, s_ref = viterbi_batch(s, t, n)
    p_k, s_k = viterbi_pallas(jnp.moveaxis(s, 1, 0), t, n, interpret=True)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                               rtol=1e-5, atol=1e-6)
    for b in range(B):
        np.testing.assert_array_equal(np.asarray(p_k)[b, :lengths[b]],
                                      np.asarray(p_ref)[b, :lengths[b]])


def test_viterbi_kernel_beam_threshold(rng):
    """A huge threshold equals exact search; a tiny one still returns a
    valid path (greedy-ish)."""
    B, T, L = 2, 8, 6
    state, trans, lengths = _problem(rng, B, T, L)
    s_tm = jnp.moveaxis(jnp.asarray(state), 1, 0)
    t, n = jnp.asarray(trans), jnp.asarray(lengths)
    p_exact, s_exact = viterbi_pallas(s_tm, t, n, interpret=True)
    p_wide, s_wide = viterbi_pallas(s_tm, t, n, beam_threshold=1e9,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(p_exact), np.asarray(p_wide))
    np.testing.assert_allclose(np.asarray(s_exact), np.asarray(s_wide))
    p_narrow, s_narrow = viterbi_pallas(s_tm, t, n, beam_threshold=0.5,
                                        interpret=True)
    assert (np.asarray(s_narrow) <= np.asarray(s_exact) + 1e-5).all()
    assert np.asarray(p_narrow).max() < L


def test_viterbi_kernel_topology(rng):
    from asr_craft_tpu.models.topology import Topology
    topo = Topology(num_labels=3, num_states=2)
    L = topo.num_expanded
    state = rng.normal(size=(2, 10, L)).astype(np.float32)
    trans = (rng.normal(size=(L, L)).astype(np.float32)
             + topo.transition_penalty())
    lengths = np.asarray([10, 7], np.int32)
    path, score = viterbi_pallas(
        jnp.moveaxis(jnp.asarray(state), 1, 0), jnp.asarray(trans),
        jnp.asarray(lengths), interpret=True)
    mask = topo.transition_mask()
    p = np.asarray(path)
    for b in range(2):
        for t in range(1, int(lengths[b])):
            assert mask[p[b, t - 1], p[b, t]]


@pytest.mark.parametrize("P,NS,B,T", [(3, 2, 2, 10), (48, 3, 3, 17),
                                      (5, 4, 2, 9)])
def test_viterbi_nstate_factored_matches_dense(rng, P, NS, B, T):
    """The topology-factored kernel equals the dense kernel (and the
    oracle) on topology-masked transition matrices."""
    from asr_craft_tpu.kernels.viterbi_pallas import viterbi_pallas_nstate
    from asr_craft_tpu.models.topology import Topology
    topo = Topology(num_labels=P, num_states=NS)
    L = topo.num_expanded
    state = rng.normal(size=(B, T, L)).astype(np.float32)
    # start/end boundary masking like apply_boundaries, to exercise the
    # realistic potentials shape
    state[:, 0] += topo.start_penalty()
    trans = (rng.normal(size=(L, L)).astype(np.float32)
             + topo.transition_penalty())
    lengths = rng.integers(NS, T + 1, size=B).astype(np.int32)
    lengths[0] = T
    s_tm = jnp.moveaxis(jnp.asarray(state), 1, 0)
    t, n = jnp.asarray(trans), jnp.asarray(lengths)
    p_ref, s_ref = viterbi_pallas(s_tm, t, n, interpret=True)
    p_f, s_f = viterbi_pallas_nstate(s_tm, t, n, NS, interpret=True)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_ref),
                               rtol=1e-5, atol=1e-5)
    for b in range(B):
        np.testing.assert_array_equal(np.asarray(p_f)[b, :lengths[b]],
                                      np.asarray(p_ref)[b, :lengths[b]])
        ref_path, ref_score = oracle.viterbi_np(state[b], trans, lengths[b])
        np.testing.assert_allclose(np.asarray(s_f)[b], ref_score,
                                   rtol=5e-4, atol=5e-5)
        np.testing.assert_array_equal(np.asarray(p_f)[b, :lengths[b]],
                                      ref_path)


def test_viterbi_nstate_beam_threshold(rng):
    from asr_craft_tpu.kernels.viterbi_pallas import viterbi_pallas_nstate
    from asr_craft_tpu.models.topology import Topology
    topo = Topology(num_labels=6, num_states=3)
    L = topo.num_expanded
    B, T = 2, 12
    state = rng.normal(size=(B, T, L)).astype(np.float32)
    trans = (rng.normal(size=(L, L)).astype(np.float32)
             + topo.transition_penalty())
    lengths = np.asarray([T, 8], np.int32)
    s_tm = jnp.moveaxis(jnp.asarray(state), 1, 0)
    t, n = jnp.asarray(trans), jnp.asarray(lengths)
    p_exact, s_exact = viterbi_pallas_nstate(s_tm, t, n, 3, interpret=True)
    p_wide, s_wide = viterbi_pallas_nstate(s_tm, t, n, 3, beam_threshold=1e9,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(p_exact), np.asarray(p_wide))
    p_nar, s_nar = viterbi_pallas_nstate(s_tm, t, n, 3, beam_threshold=0.5,
                                         interpret=True)
    assert (np.asarray(s_nar) <= np.asarray(s_exact) + 1e-5).all()
    mask = topo.transition_mask()
    p = np.asarray(p_nar)
    for b in range(B):
        for tt in range(1, int(lengths[b])):
            assert mask[p[b, tt - 1], p[b, tt]]


def test_viterbi_kernel_beam_width_matches_xla(rng):
    """Symmetric beams (VERDICT r1 weak #5): in-kernel top-k == the XLA
    top_k prune, exactly, incl. frame 0 and tie handling."""
    B, T, L = 3, 9, 12
    state, trans, lengths = _problem(rng, B, T, L)
    s, t, n = jnp.asarray(state), jnp.asarray(trans), jnp.asarray(lengths)
    for k in (1, 2, 5, 12):
        p_ref, s_ref = viterbi_batch(s, t, n, beam_width=k)
        p_k, s_k = viterbi_pallas(jnp.moveaxis(s, 1, 0), t, n,
                                  beam_width=k, interpret=True)
        np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                                   rtol=1e-5, atol=1e-6, err_msg=f"k={k}")
        for b in range(B):
            np.testing.assert_array_equal(
                np.asarray(p_k)[b, :lengths[b]],
                np.asarray(p_ref)[b, :lengths[b]], err_msg=f"k={k} b={b}")


def test_viterbi_kernel_beam_threshold_matches_xla(rng):
    """beam_threshold now exists on the XLA path too; both prune
    identically (incl. frame 0)."""
    B, T, L = 3, 9, 8
    state, trans, lengths = _problem(rng, B, T, L)
    s, t, n = jnp.asarray(state), jnp.asarray(trans), jnp.asarray(lengths)
    for thr in (0.5, 2.0, 1e9):
        p_ref, s_ref = viterbi_batch(s, t, n, beam_threshold=thr)
        p_k, s_k = viterbi_pallas(jnp.moveaxis(s, 1, 0), t, n,
                                  beam_threshold=thr, interpret=True)
        np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                                   rtol=1e-5, atol=1e-6, err_msg=f"thr={thr}")
        for b in range(B):
            np.testing.assert_array_equal(
                np.asarray(p_k)[b, :lengths[b]],
                np.asarray(p_ref)[b, :lengths[b]], err_msg=f"thr={thr}")


def test_viterbi_nstate_beam_width_matches_xla(rng):
    from asr_craft_tpu.kernels.viterbi_pallas import viterbi_pallas_nstate
    from asr_craft_tpu.models.topology import Topology
    topo = Topology(num_labels=4, num_states=3)
    L = topo.num_expanded
    state = rng.normal(size=(2, 12, L)).astype(np.float32)
    trans = (rng.normal(size=(L, L)).astype(np.float32)
             + np.asarray(topo.transition_penalty()))
    lengths = np.asarray([12, 7], np.int32)
    s, t, n = jnp.asarray(state), jnp.asarray(trans), jnp.asarray(lengths)
    for k in (2, 4):
        p_ref, s_ref = viterbi_batch(s, t, n, beam_width=k)
        p_k, s_k = viterbi_pallas_nstate(jnp.moveaxis(s, 1, 0), t, n, 3,
                                         beam_width=k, interpret=True)
        np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                                   rtol=1e-5, atol=1e-6, err_msg=f"k={k}")
        for b in range(2):
            np.testing.assert_array_equal(
                np.asarray(p_k)[b, :lengths[b]],
                np.asarray(p_ref)[b, :lengths[b]], err_msg=f"k={k}")
