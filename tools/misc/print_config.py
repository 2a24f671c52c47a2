"""Print the fully-resolved config (reference: tools/misc/print_config.py)."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), '..', '..'))
import argparse

from swindet_tpu.utils import Config, DictAction


def main():
    p = argparse.ArgumentParser(description='Print resolved config')
    p.add_argument('config')
    p.add_argument('--cfg-options', nargs='+', action=DictAction)
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    print(cfg.pretty_text)


if __name__ == '__main__':
    main()
