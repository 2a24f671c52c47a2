__version__ = '0.1.0'

short_version = __version__


def version_info():
    return tuple(int(x) for x in __version__.split('.')[:3])
