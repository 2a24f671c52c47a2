"""Rank-aware root logger (reference: mmdet/utils/logger.py:19)."""
from __future__ import annotations

import logging
import os
from typing import Optional

_initialized = set()


def get_root_logger(log_file: Optional[str] = None,
                    log_level: int = logging.INFO,
                    name: str = 'swindet') -> logging.Logger:
    """Get (and lazily initialise) the framework logger.

    Only process 0 logs at ``log_level``; other processes log errors only,
    mirroring the reference's rank-aware behaviour.
    """
    logger = logging.getLogger(name)
    if name in _initialized:
        return logger

    fmt = logging.Formatter(
        '%(asctime)s - %(name)s - %(levelname)s - %(message)s')
    stream = logging.StreamHandler()
    stream.setFormatter(fmt)
    logger.addHandler(stream)

    try:
        import jax
        rank = jax.process_index()
    except Exception:
        rank = int(os.environ.get('JAX_PROCESS_INDEX', 0))

    if rank == 0 and log_file is not None:
        fh = logging.FileHandler(log_file, 'w')
        fh.setFormatter(fmt)
        logger.addHandler(fh)

    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    _initialized.add(name)
    return logger


def print_log(msg: str, logger=None, level: int = logging.INFO) -> None:
    if logger is None:
        print(msg)
    elif logger == 'silent':
        pass
    elif isinstance(logger, str):
        get_root_logger(name=logger).log(level, msg)
    else:
        logger.log(level, msg)
