"""Convert Detectron (caffe2) pretrained ResNet weights to a
torchvision-style .pth that the framework's checkpoint converter
(swindet_tpu/checkpoint.py torch2jax path) consumes directly
(reference: tools/model_converters/detectron2pytorch.py — same blob
naming: conv1_w, res{i}_{j}_branch2{a,b,c}(_bn), affine-channel BN).

Usage:
  python tools/model_converters/detectron2jax.py model.pkl out.pth 50
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)),
                              '..', '..'))
import argparse
import pickle
from collections import OrderedDict

import numpy as np
import torch

ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def _bn(blobs, sd, caffe, name, seen):
    # detectron's affine-channel layer: scale/bias, identity statistics
    sd[name + '.bias'] = torch.from_numpy(np.asarray(blobs[caffe + '_b']))
    sd[name + '.weight'] = torch.from_numpy(
        np.asarray(blobs[caffe + '_s']))
    n = sd[name + '.weight'].numel()
    sd[name + '.running_mean'] = torch.zeros(n)
    sd[name + '.running_var'] = torch.ones(n)
    seen.update({caffe + '_b', caffe + '_s'})


def _conv(blobs, sd, caffe, name, seen):
    sd[name + '.weight'] = torch.from_numpy(
        np.asarray(blobs[caffe + '_w']))
    seen.add(caffe + '_w')
    if caffe + '_b' in blobs:
        sd[name + '.bias'] = torch.from_numpy(
            np.asarray(blobs[caffe + '_b']))
        seen.add(caffe + '_b')


def convert(src, dst, depth):
    blocks = ARCH[depth]
    with open(src, 'rb') as f:
        model = pickle.load(f, encoding='latin1')
    blobs = model.get('blobs', model)
    sd = OrderedDict()
    seen = set()
    _conv(blobs, sd, 'conv1', 'conv1', seen)
    _bn(blobs, sd, 'res_conv1_bn', 'bn1', seen)
    for i in range(1, len(blocks) + 1):
        for j in range(blocks[i - 1]):
            if j == 0:
                _conv(blobs, sd, f'res{i + 1}_{j}_branch1',
                      f'layer{i}.{j}.downsample.0', seen)
                _bn(blobs, sd, f'res{i + 1}_{j}_branch1_bn',
                    f'layer{i}.{j}.downsample.1', seen)
            for k, letter in enumerate('abc'):
                _conv(blobs, sd, f'res{i + 1}_{j}_branch2{letter}',
                      f'layer{i}.{j}.conv{k + 1}', seen)
                _bn(blobs, sd, f'res{i + 1}_{j}_branch2{letter}_bn',
                    f'layer{i}.{j}.bn{k + 1}', seen)
    for key in blobs:
        if key not in seen:
            print(f'Not converted: {key}')
    torch.save(dict(state_dict=sd), dst)
    print(f'saved {len(sd)} tensors -> {dst}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src')
    p.add_argument('dst')
    p.add_argument('depth', type=int, choices=sorted(ARCH))
    args = p.parse_args()
    convert(args.src, args.dst, args.depth)


if __name__ == '__main__':
    main()
