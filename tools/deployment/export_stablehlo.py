"""Export the detector's inference function as serialized StableHLO
(the TPU-native counterpart of the reference's ONNX export,
tools/deployment/pytorch2onnx.py) via jax.export."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), '..', '..'))
import argparse


def main():
    p = argparse.ArgumentParser(description='Export detector StableHLO')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--shape', type=int, nargs=2, default=[800, 1344],
                   help='static H W canvas')
    p.add_argument('--out', default='model.stablehlo')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jax_export
    from swindet_tpu.apis.inference import init_detector

    handle = init_detector(args.config, args.checkpoint)
    h, w = args.shape
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    shp = jnp.asarray([[h, w]], jnp.int32)
    sf = jnp.ones((1, 4), jnp.float32)

    def fn(img, shp, sf):
        return handle.module.apply(handle.variables, img, shp, sf,
                                   method='simple_test')

    exported = jax_export.export(jax.jit(fn))(img, shp, sf)
    blob = exported.serialize()
    with open(args.out, 'wb') as f:
        f.write(blob)
    print(f'wrote {args.out} ({len(blob)/1e6:.1f} MB), '
          f'outputs: {[str(s) for s in exported.out_avals]}')


if __name__ == '__main__':
    main()
