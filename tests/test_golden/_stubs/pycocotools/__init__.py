from . import mask  # noqa
