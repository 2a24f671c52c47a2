"""Bridge to the REFERENCE mmdet source for golden-parity testing.

Inserts the pure-torch shim packages (tests/test_golden/_stubs) and the
read-only reference checkout on sys.path, then imports the reference's
own model code. Golden tests run the reference model and the swindet_tpu
model on identical inputs/weights and assert numerical agreement — this
is the end-to-end parity gate VERDICT.md round 1 asked for.

Nothing here is imported by the framework itself; test-only.
"""
import os
import sys

_STUBS = os.path.join(os.path.dirname(__file__), '_stubs')
_REFERENCE = os.environ.get('SWINDET_REFERENCE', '/root/reference')

_installed = False


def reference_available():
    return os.path.isdir(os.path.join(_REFERENCE, 'mmdet'))


def install():
    """Make `import mmdet` resolve to the reference (idempotent)."""
    global _installed
    if _installed:
        return
    for p in (_STUBS, _REFERENCE):
        if p not in sys.path:
            sys.path.insert(0, p)
    # If the real pytest env ever gains these packages, the stubs still
    # win (inserted ahead) — deliberate: shims are what make the
    # reference runnable on CPU without compiled ops.
    import mmdet  # noqa: F401
    import mmdet.models  # noqa: F401
    _installed = True


def build_ref_detector(cfg_dict, train_cfg=None, test_cfg=None):
    """Build a reference detector from a plain config dict."""
    install()
    from mmdet.models import build_detector
    from mmcv.utils import ConfigDict
    cfg = ConfigDict(cfg_dict)
    return build_detector(cfg, train_cfg=ConfigDict(train_cfg)
                          if train_cfg else None,
                          test_cfg=ConfigDict(test_cfg)
                          if test_cfg else None)
