"""Loader/batching tests: group sampling, static-canvas collation,
threaded loader ordering."""
import numpy as np
import pytest

from swindet_tpu.datasets import (DetDataLoader, GroupBatchSampler,
                                  collate_detection)


def test_group_sampler_groups_and_determinism():
    flags = np.array([0] * 10 + [1] * 6, np.uint8)
    s = GroupBatchSampler(flags, batch_size=4, seed=1)
    s.set_epoch(0)
    batches1 = list(s)
    for b in batches1:
        g = set(flags[i] for i in b)
        assert len(g) == 1, 'batch mixes aspect-ratio groups'
        assert len(b) == 4
    s2 = GroupBatchSampler(flags, batch_size=4, seed=1)
    s2.set_epoch(0)
    assert list(s2) == batches1, 'not deterministic per epoch'
    s.set_epoch(1)
    assert list(s) != batches1, 'epoch does not reshuffle'


def test_group_sampler_dist_sharding():
    flags = np.zeros(32, np.uint8)
    r0 = GroupBatchSampler(flags, 4, num_replicas=2, rank=0, seed=0)
    r1 = GroupBatchSampler(flags, 4, num_replicas=2, rank=1, seed=0)
    b0, b1 = list(r0), list(r1)
    assert len(b0) == len(b1) == 4
    for a, b in zip(b0, b1):
        assert not (set(a) & set(b)), 'ranks overlap'


def test_collate_static_canvas():
    samples = []
    for h, w, n in [(40, 60, 2), (48, 52, 3)]:
        samples.append(dict(
            img=np.ones((h, w, 3), np.float32),
            img_metas=dict(img_shape=(h, w)),
            gt_bboxes=np.arange(n * 4, dtype=np.float32).reshape(n, 4),
            gt_labels=np.arange(n, dtype=np.int64),
            gt_masks=np.ones((n, h, w), np.uint8)))
    b = collate_detection(samples, canvas=(64, 64), max_gts=5)
    assert b['img'].shape == (2, 64, 64, 3)
    assert b['gt_bboxes'].shape == (2, 5, 4)
    assert b['gt_valid'].sum() == 5
    assert b['gt_masks'].shape == (2, 5, 64, 64)
    np.testing.assert_array_equal(b['img_shapes'], [[40, 60], [48, 52]])
    # padding beyond img region must be zero
    assert b['img'][0, 41:, :, :].sum() == 0


class _FakeDs:
    def __init__(self, n=12):
        self.flag = np.array([i % 2 for i in range(n)], np.uint8)
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        h, w = (60, 40) if self.flag[i] == 0 else (40, 60)
        return dict(img=np.full((h, w, 3), float(i), np.float32),
                    img_metas=dict(img_shape=(h, w)),
                    gt_bboxes=np.array([[1, 1, 10, 10]], np.float32),
                    gt_labels=np.array([0], np.int64),
                    gt_masks=np.ones((1, h, w), np.uint8))


def test_loader_iterates_all_batches():
    ds = _FakeDs(12)
    loader = DetDataLoader(ds, batch_size=2, canvas_long=64,
                           canvas_short=64, max_gts=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(loader) == 6
    for b in batches:
        assert b['img'].shape == (2, 64, 64, 3)
        assert len(b['img_metas']) == 2


def test_derive_canvas():
    """Static canvas derivation from pipeline geometry (the COCO
    default on a small-res config is ~99.6% zero padding, whose
    constant tokens explode LayerNorm gradients — round-4 smoke-run
    find)."""
    from swindet_tpu.datasets.builder import derive_canvas

    tiny = [dict(type='LoadImageFromFile'),
            dict(type='Resize', img_scale=(64, 64), keep_ratio=True),
            dict(type='Pad', size_divisor=64)]
    assert derive_canvas(tiny) == (64, 64)

    mstrain = [dict(type='LoadImageFromFile'),
               dict(type='Resize', img_scale=[(1333, 480), (1333, 800)],
                    multiscale_mode='range', keep_ratio=True),
               dict(type='Pad', size_divisor=32)]
    assert derive_canvas(mstrain) == (1344, 800)

    # AutoAugment branches: max over branches
    autoaug = [dict(type='AutoAugment', policies=[
        [dict(type='Resize', img_scale=[(480, 1333), (800, 1333)],
              multiscale_mode='value', keep_ratio=True)],
        [dict(type='Resize', img_scale=[(400, 1333)], keep_ratio=True),
         dict(type='RandomCrop', crop_size=(384, 600)),
         dict(type='Resize', img_scale=[(480, 1333), (800, 1333)],
              multiscale_mode='value', override=True,
              keep_ratio=True)]]),
        dict(type='Pad', size_divisor=32)]
    assert derive_canvas(autoaug) == (1344, 800)

    # Expand re-bounded by a later exact Resize (SSD recipe)
    ssd = [dict(type='Expand', ratio_range=(1, 4)),
           dict(type='MinIoURandomCrop'),
           dict(type='Resize', img_scale=(300, 300), keep_ratio=False)]
    assert derive_canvas(ssd) == (320, 320)

    # unknown spatial transform → conservative default
    assert derive_canvas([dict(type='Albu', transforms=[])]) \
        == (1344, 832)
    # Resize with ratio_range upscaling
    rr = [dict(type='Resize', img_scale=(100, 80),
               ratio_range=(0.8, 1.5), keep_ratio=True)]
    assert derive_canvas(rr) == (160, 128)
