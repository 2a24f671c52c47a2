from . import layers  # noqa
