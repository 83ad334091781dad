"""Timestamped file+stream logger (reference `logger.py:13-21`).

The reference demotes non-rank-0 processes to ERROR when torch.distributed
is initialized; the JAX equivalent keys off `jax.process_index()`."""
from __future__ import annotations

import logging
import os
import time


def setup_logger(name: str = "Net", logpth: str = "logs") -> logging.Logger:
    os.makedirs(logpth, exist_ok=True)
    logfile = "{}-{}.log".format(name, time.strftime("%Y-%m-%d-%H-%M-%S"))
    logfile = os.path.join(logpth, logfile)
    fmt = "%(levelname)s %(filename)s(%(lineno)d): %(message)s"
    level = logging.INFO
    try:
        import jax
        if jax.process_index() != 0:
            level = logging.ERROR
    except Exception:
        pass
    log = logging.getLogger(name)
    log.setLevel(level)
    if not log.handlers:
        fh = logging.FileHandler(logfile)
        fh.setFormatter(logging.Formatter(fmt))
        sh = logging.StreamHandler()
        sh.setFormatter(logging.Formatter(fmt))
        log.addHandler(fh)
        log.addHandler(sh)
    return log
