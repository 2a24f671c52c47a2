"""Strip optimizer state from a checkpoint for release
(reference: tools/model_converters/publish_model.py)."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), '..', '..'))
import argparse
import hashlib


def main():
    p = argparse.ArgumentParser(description='Publish a model checkpoint')
    p.add_argument('in_ckpt', help='orbax train-state checkpoint dir')
    p.add_argument('out_ckpt', help='output weights-only checkpoint dir')
    args = p.parse_args()
    import jax
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(_osp.abspath(args.in_ckpt))
    state = payload['state']
    variables = {'params': state['params']}
    for k, v in state.get('model_state', {}).items():
        variables[k] = v
    out = dict(variables=variables,
               meta=dict(payload.get('meta', {}), published=True))
    ckptr.save(_osp.abspath(args.out_ckpt), out, force=True)
    print(f'published weights-only checkpoint to {args.out_ckpt}')


if __name__ == '__main__':
    main()
