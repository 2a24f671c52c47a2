"""Convert pycls RegNet pretrained weights to the naming this
framework's RegNet backbone + checkpoint converter expect (reference:
mmdetection tools/model_converters/regnet2mmdet.py — stem.conv →
conv1, s{i}.b{j} → layer{i}.{j}, a/b/c branch convs → conv1/2/3,
se → se.conv1/conv2).

Usage:
  python tools/model_converters/regnet2jax.py regnet.pyth out.pth
"""
import argparse
from collections import OrderedDict

import torch


def convert_stem(k, v, sd, seen):
    new = (k.replace('stem.conv', 'conv1')
           .replace('stem.bn', 'bn1'))
    if new != k:
        sd[new] = v
        seen.add(k)
        return True
    return False


def convert_head(k, v, sd, seen):
    if k.startswith('head.'):
        sd[k.replace('head.fc', 'fc')] = v
        seen.add(k)
        return True
    return False


def convert_reslayer(k, v, sd, seen):
    split = k.split('.')
    if not split[0].startswith('s'):
        return False
    # s{stage}.b{block}.<rest>
    stage = int(split[0][1:])
    block = int(split[1][1:]) - 1
    rest = '.'.join(split[2:])
    rest = (rest.replace('proj_block.', '')
            .replace('proj.', 'downsample.0.')
            .replace('f.a.', 'conv1.').replace('f.a_bn', 'bn1')
            .replace('f.b.', 'conv2.').replace('f.b_bn', 'bn2')
            .replace('f.c.', 'conv3.').replace('f.c_bn', 'bn3')
            .replace('f.se.f_ex.0', 'se.conv1')
            .replace('f.se.f_ex.2', 'se.conv2'))
    if rest.startswith('bn.'):                 # proj bn
        rest = 'downsample.1.' + rest[3:]
    sd[f'layer{stage}.{block}.{rest}'] = v
    seen.add(k)
    return True


def convert(src, dst):
    ckpt = torch.load(src, map_location='cpu')
    weights = ckpt.get('model_state', ckpt.get('state_dict', ckpt))
    sd = OrderedDict()
    seen = set()
    for k, v in weights.items():
        if convert_stem(k, v, sd, seen):
            continue
        if convert_head(k, v, sd, seen):
            continue
        if convert_reslayer(k, v, sd, seen):
            continue
        print(f'Not converted: {k}')
    torch.save(dict(state_dict=sd), dst)
    print(f'saved {len(sd)} tensors -> {dst}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src')
    p.add_argument('dst')
    args = p.parse_args()
    convert(args.src, args.dst)


if __name__ == '__main__':
    main()
