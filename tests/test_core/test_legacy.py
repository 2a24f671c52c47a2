"""Legacy (v1.x) anchor generator and delta coder parity values."""
import numpy as np
import jax.numpy as jnp


def test_legacy_anchor_generator_doc_example():
    from swindet_tpu.core.anchors import LegacyAnchorGenerator
    gen = LegacyAnchorGenerator(strides=[16], ratios=[1.], scales=[1.],
                                base_sizes=[9])
    a = np.asarray(gen.grid_anchors([(2, 2)])[0])
    exp = np.array([[0, 0, 8, 8], [16, 0, 24, 8],
                    [0, 16, 8, 24], [16, 16, 24, 24]], np.float32)
    np.testing.assert_allclose(a, exp, atol=1e-5)


def test_legacy_coder_doc_example():
    from swindet_tpu.core.bbox.coders import LegacyDeltaXYWHBBoxCoder
    rois = jnp.asarray([[0., 0., 1., 1.], [0., 0., 1., 1.],
                        [0., 0., 1., 1.], [5., 5., 5., 5.]])
    deltas = jnp.asarray([[0., 0., 0., 0.], [1., 1., 1., 1.],
                          [0., 0., 2., -1.], [0.7, -1.9, -0.5, 0.3]])
    out = np.asarray(LegacyDeltaXYWHBBoxCoder().decode(
        rois, deltas, max_shape=(32, 32)))
    exp = np.array([[0.0000, 0.0000, 1.5000, 1.5000],
                    [0.0000, 0.0000, 5.2183, 5.2183],
                    [0.0000, 0.1321, 7.8891, 0.8679],
                    [5.3967, 2.4251, 6.0033, 3.7749]], np.float32)
    np.testing.assert_allclose(out, exp, atol=1e-3)
