"""Convert a torch .pth detection checkpoint to a native orbax checkpoint
(the reference loads .pth directly; this tool materializes the converted
flax param tree — see swindet_tpu/checkpoint.py for the semantics)."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), '..', '..'))
import argparse


def main():
    p = argparse.ArgumentParser(description='torch .pth -> orbax')
    p.add_argument('config')
    p.add_argument('pth')
    p.add_argument('out')
    args = p.parse_args()
    from swindet_tpu.apis.inference import init_detector
    from swindet_tpu.checkpoint import save_checkpoint
    handle = init_detector(args.config, args.pth)
    save_checkpoint(args.out, handle.variables,
                    meta=dict(CLASSES=handle.CLASSES,
                              source=args.pth))
    print(f'converted {args.pth} -> {args.out}')


if __name__ == '__main__':
    main()
