"""Config-zoo structural regression: build the model from EVERY config
file (reference test model: tests/test_runtime/test_config.py:418)."""
import glob
import os.path as osp

import pytest

from swindet_tpu.models import build_detector
from swindet_tpu.utils import Config

CFG_ROOT = osp.join(osp.dirname(__file__), '..', '..', 'configs')
ALL_CONFIGS = sorted(
    p for p in glob.glob(osp.join(CFG_ROOT, '*', '*.py'))
    if '_base_' not in p)


def test_zoo_nonempty():
    assert len(ALL_CONFIGS) >= 10


@pytest.mark.parametrize('cfg_path', ALL_CONFIGS,
                         ids=[osp.basename(p) for p in ALL_CONFIGS])
def test_build_from_config(cfg_path):
    cfg = Config.fromfile(cfg_path)
    assert 'model' in cfg
    model = build_detector(dict(cfg.model))
    assert model is not None
    # data pipeline must also be constructible (unwrap dataset wrappers)
    from swindet_tpu.datasets.pipelines import Compose

    def pipeline_of(ds):
        while 'pipeline' not in ds:
            ds = ds['dataset']
        return ds['pipeline']

    Compose([dict(p) for p in pipeline_of(cfg.data.train)])
    Compose([dict(p) for p in pipeline_of(cfg.data.test)])
    # schedules must be well-formed
    assert 'optimizer' in cfg and 'lr_config' in cfg
