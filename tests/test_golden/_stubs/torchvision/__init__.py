"""torchvision stub: reference mmcv_custom imports it; only the lazy
torchvision:// checkpoint scheme touches it, which golden tests never use."""
from . import models  # noqa
