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
