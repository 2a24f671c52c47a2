"""Config system tests: _base_ inheritance, _delete_, merge_from_dict."""
import os.path as osp

import pytest

from swindet_tpu.utils import Config, Registry, build_from_cfg
from swindet_tpu.utils.config import parse_value


def write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(content)
    return str(p)


class TestConfig:
    def test_simple(self, tmp_path):
        f = write(tmp_path, 'a.py', "x = 1\nmodel = dict(type='M', d=2)\n")
        cfg = Config.fromfile(f)
        assert cfg.x == 1
        assert cfg.model.type == 'M'
        assert cfg.model['d'] == 2

    def test_base_merge(self, tmp_path):
        write(tmp_path, 'base.py',
              "model = dict(type='M', backbone=dict(type='B', depth=50))\n"
              "lr = 0.1\n")
        f = write(tmp_path, 'child.py',
                  "_base_ = ['./base.py']\n"
                  "model = dict(backbone=dict(depth=101))\n")
        cfg = Config.fromfile(f)
        assert cfg.model.type == 'M'
        assert cfg.model.backbone.depth == 101
        assert cfg.model.backbone.type == 'B'
        assert cfg.lr == 0.1

    def test_delete_key(self, tmp_path):
        write(tmp_path, 'base.py',
              "optimizer = dict(type='SGD', momentum=0.9, lr=0.1)\n")
        f = write(tmp_path, 'child.py',
                  "_base_ = ['./base.py']\n"
                  "optimizer = dict(_delete_=True, type='AdamW', lr=1e-4)\n")
        cfg = Config.fromfile(f)
        assert cfg.optimizer.type == 'AdamW'
        assert 'momentum' not in cfg.optimizer

    def test_multi_base(self, tmp_path):
        write(tmp_path, 'b1.py', "a = 1\n")
        write(tmp_path, 'b2.py', "b = 2\n")
        f = write(tmp_path, 'c.py', "_base_ = ['./b1.py', './b2.py']\nc = 3\n")
        cfg = Config.fromfile(f)
        assert (cfg.a, cfg.b, cfg.c) == (1, 2, 3)

    def test_nested_base(self, tmp_path):
        write(tmp_path, 'g.py', "x = dict(y=1, z=2)\n")
        write(tmp_path, 'p.py', "_base_ = './g.py'\nx = dict(y=10)\n")
        f = write(tmp_path, 'c.py', "_base_ = './p.py'\nx = dict(w=3)\n")
        cfg = Config.fromfile(f)
        assert cfg.x.y == 10 and cfg.x.z == 2 and cfg.x.w == 3

    def test_merge_from_dict(self, tmp_path):
        f = write(tmp_path, 'a.py',
                  "model = dict(backbone=dict(depth=50))\n"
                  "data = dict(samples_per_gpu=2)\n")
        cfg = Config.fromfile(f)
        cfg.merge_from_dict({'model.backbone.depth': 101,
                             'data.samples_per_gpu': 4})
        assert cfg.model.backbone.depth == 101
        assert cfg.data.samples_per_gpu == 4

    def test_merge_list_index(self, tmp_path):
        f = write(tmp_path, 'a.py',
                  "pipeline = [dict(type='Load'), dict(type='Resize', s=1)]\n")
        cfg = Config.fromfile(f)
        cfg.merge_from_dict({'pipeline.1.s': 2})
        assert cfg.pipeline[1].s == 2

    def test_reference_swin_config_loads(self):
        # the real swin config family must parse with our Config
        ref = ('/root/reference/configs/swin/'
               'mask_rcnn_swin_tiny_patch4_window7_mstrain_480-800_'
               'adamw_1x_coco.py')
        if not osp.exists(ref):
            pytest.skip('reference not mounted')
        cfg = Config.fromfile(ref)
        assert cfg.model.type == 'MaskRCNN'
        assert cfg.model.backbone.embed_dim == 96
        assert cfg.optimizer.type == 'AdamW'
        assert cfg.model.test_cfg.rcnn.max_per_img == 100
        # _delete_ replaced the SGD optimizer entirely
        assert 'momentum' not in cfg.optimizer

    def test_parse_value(self):
        assert parse_value('1') == 1
        assert parse_value('1.5') == 1.5
        assert parse_value('true') is True
        assert parse_value('None') is None
        assert parse_value('[1,2]') == [1, 2]
        assert parse_value('a,b') == ('a', 'b')
        assert parse_value('xyz') == 'xyz'


class TestRegistry:
    def test_register_and_build(self):
        reg = Registry('thing')

        @reg.register_module()
        class Foo:
            def __init__(self, a=1):
                self.a = a

        obj = build_from_cfg(dict(type='Foo', a=5), reg)
        assert isinstance(obj, Foo) and obj.a == 5

    def test_duplicate_raises(self):
        reg = Registry('thing')

        @reg.register_module()
        class Foo:
            pass

        with pytest.raises(KeyError):
            reg.register_module(module=Foo)

    def test_missing_type(self):
        reg = Registry('thing')
        with pytest.raises(KeyError):
            build_from_cfg(dict(type='Nope'), reg)

    def test_default_args(self):
        reg = Registry('thing')

        @reg.register_module()
        class Bar:
            def __init__(self, a, b=2):
                self.a, self.b = a, b

        obj = build_from_cfg(dict(type='Bar'), reg, dict(a=7))
        assert obj.a == 7 and obj.b == 2
