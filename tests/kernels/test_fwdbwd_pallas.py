"""Pallas alpha/beta kernels in interpret mode vs the oracle and the jnp
MXU path (SURVEY.md §4.2 item 6)."""
import jax.numpy as jnp
import numpy as np
import pytest

from asr_craft_tpu.kernels.fwdbwd_pallas import backward_pallas, forward_pallas
from asr_craft_tpu.ops import mxu, oracle

TOL = dict(rtol=5e-4, atol=5e-5)


def _problem(rng, B, T, L):
    state = rng.normal(size=(B, T, L)).astype(np.float32)
    trans = rng.normal(size=(L, L)).astype(np.float32)
    lengths = rng.integers(1, T + 1, size=B).astype(np.int32)
    lengths[0] = T
    return state, trans, lengths


@pytest.mark.parametrize("B,T,L", [(2, 5, 4), (3, 12, 48), (8, 7, 128), (5, 9, 144)])
def test_forward_kernel_matches_oracle(rng, B, T, L):
    state, trans, lengths = _problem(rng, B, T, L)
    state_tm = jnp.moveaxis(jnp.asarray(state), 1, 0)
    alphas, logZ = forward_pallas(state_tm, jnp.asarray(trans),
                                  jnp.asarray(lengths), interpret=True)
    assert alphas.shape == (T, B, L)
    for b in range(B):
        ref_a, ref_z = oracle.forward_np(state[b], trans, lengths[b])
        np.testing.assert_allclose(np.asarray(alphas)[:lengths[b], b],
                                   ref_a, **TOL)
        np.testing.assert_allclose(np.asarray(logZ)[b], ref_z, **TOL)


@pytest.mark.parametrize("B,T,L", [(2, 6, 4), (3, 10, 48), (4, 8, 144)])
def test_backward_kernel_matches_oracle(rng, B, T, L):
    state, trans, lengths = _problem(rng, B, T, L)
    state_tm = jnp.moveaxis(jnp.asarray(state), 1, 0)
    betas = backward_pallas(state_tm, jnp.asarray(trans),
                            jnp.asarray(lengths), interpret=True)
    for b in range(B):
        ref_b = oracle.backward_np(state[b], trans, lengths[b])
        np.testing.assert_allclose(np.asarray(betas)[:lengths[b], b],
                                   ref_b, **TOL)
        # padded region holds the semiring one (zeros)
        np.testing.assert_array_equal(np.asarray(betas)[lengths[b]:, b], 0.0)


def test_kernels_match_jnp_mxu_path(rng):
    B, T, L = 4, 15, 6
    state, trans, lengths = _problem(rng, B, T, L)
    s, t, n = jnp.asarray(state), jnp.asarray(trans), jnp.asarray(lengths)
    a_ref, z_ref = mxu.forward_mxu(s, t, n)
    s_tm = jnp.moveaxis(s, 1, 0)
    a_k, z_k = forward_pallas(s_tm, t, n, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(a_k, 0, 1)),
                               np.asarray(a_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-6)


def test_kernel_with_topology_mask(rng):
    from asr_craft_tpu.models.topology import Topology
    topo = Topology(num_labels=4, num_states=3)
    L = topo.num_expanded
    state = rng.normal(size=(2, 9, L)).astype(np.float32)
    trans = (rng.normal(size=(L, L)).astype(np.float32)
             + topo.transition_penalty())
    lengths = np.asarray([9, 6], np.int32)
    s_tm = jnp.moveaxis(jnp.asarray(state), 1, 0)
    _, logZ = forward_pallas(s_tm, jnp.asarray(trans), jnp.asarray(lengths),
                             interpret=True)
    for b in range(2):
        _, ref = oracle.forward_np(state[b], trans, lengths[b])
        np.testing.assert_allclose(np.asarray(logZ)[b], ref, **TOL)
