"""Logging for the framework.

Reproduces the reference's two-logger (engine/app) x two-sink (stderr +
``backlog.log``) layout (ref: Engine/src/Engine/Core/Log.cpp:13-41) with the
``file:line`` prefix the reference builds via compile-time FileInfo defaults
(ref: Engine/src/Engine/Core/Utils.h:10-29).  Python's logging module already
records callsite file:line, so this is just configuration, not machinery.
"""
from __future__ import annotations

import logging
import os
import sys

_FMT = "[%(asctime)s] %(name)s %(levelname)s %(filename)s:%(lineno)d: %(message)s"
_initialised = False


def _init() -> None:
    global _initialised
    if _initialised:
        return
    _initialised = True
    level = os.environ.get("RTM_LOG_LEVEL", "INFO").upper()
    root = logging.getLogger("rtm")
    root.setLevel(level)
    stream = logging.StreamHandler(sys.stderr)
    stream.setFormatter(logging.Formatter(_FMT))
    root.addHandler(stream)
    logfile = os.environ.get("RTM_LOG_FILE")
    if logfile:
        fh = logging.FileHandler(logfile)
        fh.setFormatter(logging.Formatter(_FMT))
        root.addHandler(fh)
    root.propagate = False


def get_logger(name: str = "app") -> logging.Logger:
    """Two named loggers, mirroring the reference's ENGINE/APP split."""
    _init()
    return logging.getLogger(f"rtm.{name}")


_default = None


def _logger():
    global _default
    if _default is None:
        _default = get_logger("app")
    return _default


def log_debug(msg, *a):
    _logger().debug(msg, *a, stacklevel=2)


def log_info(msg, *a):
    _logger().info(msg, *a, stacklevel=2)


def log_warn(msg, *a):
    _logger().warning(msg, *a, stacklevel=2)


def log_error(msg, *a):
    _logger().error(msg, *a, stacklevel=2)
