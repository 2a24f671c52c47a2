"""Op-level gradient parity vs torch autograd (VERDICT r3 ask #2, the
per-op half): the RoIAlign input gradient against the pure-torch
mmcv-semantics stub's autograd, through BOTH our XLA formulation and
the Pallas kernel's RMW backward (interpret mode on CPU).

(The window-attention flash backward is pinned against the lax
reference in tests/test_ops/test_window_attention.py; that lax
reference's gradients are pinned against torch end-to-end by
test_grad_parity.py — this file closes the same loop for RoIAlign
directly.)
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _setup(sr):
    import torch
    rs = np.random.RandomState(0)
    feat = rs.randn(1, 24, 32, 8).astype(np.float32)
    rois = np.array([
        [0, 4.3, 2.1, 27.9, 18.4],
        [0, 0.0, 0.0, 31.0, 23.0],
        [0, 10.2, 9.9, 14.8, 20.1],    # tall sliver
        [0, 1.0, 15.5, 30.5, 17.2],    # wide sliver
    ], np.float32)
    g = rs.randn(len(rois), 7, 7, 8).astype(np.float32)
    return feat, rois, g


@pytest.mark.parametrize('sr', [0, 2])
def test_roi_align_input_grad_vs_torch(sr):
    import torch
    from tests.test_golden._stubs.mmcv.ops.roi_align import RoIAlign
    from swindet_tpu.ops.roi_align import roi_align_single

    feat, rois, g = _setup(sr)
    t_feat = torch.tensor(feat.transpose(0, 3, 1, 2),
                          requires_grad=True)
    op = RoIAlign(output_size=7, spatial_scale=1.0, sampling_ratio=sr,
                  aligned=True)
    out = op(t_feat, torch.tensor(rois))
    out.backward(torch.tensor(g.transpose(0, 3, 1, 2)))
    t_grad = t_feat.grad.numpy().transpose(0, 2, 3, 1)

    def f(x):
        return roi_align_single(x, jnp.asarray(rois), 1.0, 7,
                                sampling_ratio=sr)
    out_j, vjp = jax.vjp(f, jnp.asarray(feat))
    (j_grad,) = vjp(jnp.asarray(g))
    # forward parity first (sanity)
    np.testing.assert_allclose(
        np.asarray(out_j), out.detach().numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_grad), t_grad,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('sr', [0, 2])
def test_pallas_rmw_backward_vs_torch(sr):
    """The Pallas strip kernel's read-modify-write backward (interpret
    mode — same kernel code that runs on TPU) vs torch autograd."""
    import torch
    from tests.test_golden._stubs.mmcv.ops.roi_align import RoIAlign
    from swindet_tpu.ops import roi_align_pallas as rap

    feat, rois, g = _setup(sr)
    t_feat = torch.tensor(feat.transpose(0, 3, 1, 2),
                          requires_grad=True)
    op = RoIAlign(output_size=7, spatial_scale=1.0, sampling_ratio=sr,
                  aligned=True)
    out = op(t_feat, torch.tensor(rois))
    out.backward(torch.tensor(g.transpose(0, 3, 1, 2)))
    t_grad = t_feat.grad.numpy().transpose(0, 2, 3, 1)

    def f(x):
        return rap.multilevel_roi_align_pallas(
            [x], jnp.asarray(rois), [1], 7, sampling_ratio=sr,
            interpret=True)
    out_j, vjp = jax.vjp(f, jnp.asarray(feat))
    (j_grad,) = vjp(jnp.asarray(g))
    np.testing.assert_allclose(
        np.asarray(out_j), out.detach().numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_grad), t_grad,
                               rtol=1e-4, atol=1e-5)
