"""Caffe-style ResNet Bottleneck parity vs the reference torch block
(mmdet/models/backbones/resnet.py Bottleneck: style='caffe' puts the
stage stride on conv1, 'pytorch' on conv2): identical weights + input →
identical output for both styles, incl. the downsample path."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_golden import refbridge

pytestmark = pytest.mark.skipif(
    not refbridge.reference_available(), reason='reference not mounted')

CIN, PLANES = 16, 8  # block out = PLANES * 4 = 32


def _conv(t):
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))


def _bn(ref_bn):
    return dict(scale=jnp.asarray(ref_bn.weight.detach().numpy()),
                bias=jnp.asarray(ref_bn.bias.detach().numpy()))


def _bn_stats(ref_bn):
    return dict(mean=jnp.asarray(ref_bn.running_mean.numpy()),
                var=jnp.asarray(ref_bn.running_var.numpy()))


@pytest.mark.parametrize('style', ['pytorch', 'caffe'])
def test_bottleneck_style_parity(style):
    import torch
    refbridge.install()
    from mmdet.models.backbones.resnet import Bottleneck as Ref
    from swindet_tpu.models.backbones.resnet import Bottleneck

    torch.manual_seed(0)
    ref = Ref(inplanes=CIN, planes=PLANES, stride=2, style=style,
              downsample=torch.nn.Sequential(
                  torch.nn.Conv2d(CIN, PLANES * 4, 1, stride=2,
                                  bias=False),
                  torch.nn.BatchNorm2d(PLANES * 4)))
    # give the running stats some texture
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    rs = np.random.RandomState(0)
    x = rs.randn(2, CIN, 16, 20).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.tensor(x))

    ours = Bottleneck(planes=PLANES, stride=2, downsample=True,
                      style=style)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = ours.init(jax.random.PRNGKey(0), xj)
    params = {
        'conv1': dict(kernel=_conv(ref.conv1.weight)),
        'bn1': _bn(ref.bn1),
        'conv2': dict(kernel=_conv(ref.conv2.weight)),
        'bn2': _bn(ref.bn2),
        'conv3': dict(kernel=_conv(ref.conv3.weight)),
        'bn3': _bn(ref.bn3),
        'downsample.0': dict(kernel=_conv(ref.downsample[0].weight)),
        'downsample.1': _bn(ref.downsample[1]),
    }
    stats = {'bn1': _bn_stats(ref.bn1), 'bn2': _bn_stats(ref.bn2),
             'bn3': _bn_stats(ref.bn3),
             'downsample.1': _bn_stats(ref.downsample[1])}
    o = ours.apply({'params': params, 'batch_stats': stats}, xj)
    np.testing.assert_allclose(np.asarray(o),
                               r.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
