"""RepPoints points2bbox parity vs the reference torch head
(mmdet/models/dense_heads/reppoints_head.py:165): minmax /
partial_minmax / moment transforms on identical point sets (with a
shared nonzero moment_transfer)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')


@pytest.mark.parametrize('method', ['minmax', 'partial_minmax', 'moment'])
def test_points2bbox_parity(method):
    import torch
    refbridge.install()
    from mmdet.models.dense_heads.reppoints_head import \
        RepPointsHead as RefHead
    from swindet_tpu.models.dense_heads.reppoints_head import \
        RepPointsHead

    num_points = 9
    ref = RefHead.__new__(RefHead)
    torch.nn.Module.__init__(ref)
    ref.num_points = num_points
    ref.transform_method = method
    ref.moment_mul = 0.01
    ref.moment_transfer = torch.nn.Parameter(
        torch.tensor([0.3, -0.2]), requires_grad=True)

    rs = np.random.RandomState(0)
    pts = rs.randn(6, 2 * num_points).astype(np.float32) * 10

    with torch.no_grad():
        r = ref.points2bbox(torch.tensor(pts), y_first=True)

    ours = RepPointsHead(num_classes=4, in_channels=8,
                         feat_channels=8, point_feat_channels=8,
                         num_points=num_points,
                         transform_method=method, moment_mul=0.01)
    variables = ours.init(jax.random.PRNGKey(0),
                          [jnp.zeros((1, 8, 8, 8))])
    if method == 'moment':
        params = dict(variables['params'])
        params['moment_transfer'] = jnp.asarray([0.3, -0.2], jnp.float32)
        variables = {'params': params}
    bound = ours.bind(variables)
    o = bound.points2bbox(jnp.asarray(pts), y_first=True)
    np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_gen_grid_from_reg_parity():
    """Grid-RepPoints box→point-grid parity (reference
    reppoints_head.py:216 gen_grid_from_reg): same y-first interleaved
    channel order and regressed box."""
    import torch
    refbridge.install()
    from mmdet.models.dense_heads.reppoints_head import \
        RepPointsHead as RefHead
    from swindet_tpu.models.dense_heads.reppoints_head import \
        RepPointsHead

    ref = RefHead.__new__(RefHead)
    torch.nn.Module.__init__(ref)
    ref.num_points = 9
    ref.dcn_kernel = 3

    rs = np.random.RandomState(1)
    b, h, w = 2, 5, 6
    reg = rs.randn(b, 4, h, w).astype(np.float32) * 0.5
    prev = np.asarray([-2., -2., 2., 2.], np.float32)

    with torch.no_grad():
        r_grid, r_box = ref.gen_grid_from_reg(
            torch.tensor(reg),
            torch.tensor(prev).view(1, 4, 1, 1).repeat(b, 1, h, w))

    ours = RepPointsHead(num_classes=4, in_channels=8, feat_channels=8,
                         point_feat_channels=8, num_points=9,
                         use_grid_points=True)
    # NHWC in ours; reference is NCHW
    o_grid, o_box = ours.gen_grid_from_reg(
        jnp.asarray(reg.transpose(0, 2, 3, 1)), jnp.asarray(prev))
    np.testing.assert_allclose(
        np.asarray(o_grid).transpose(0, 3, 1, 2), r_grid.numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(o_box).transpose(0, 3, 1, 2), r_box.numpy(),
        rtol=1e-4, atol=1e-4)
