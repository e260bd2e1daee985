"""Scoped logging with the same subsystem-scope discipline as the
reference's ``std.log.scoped`` loggers (``src/helpers.zig:12-22``;
scopes listed in SURVEY §5.5).

Format mirrors the reference's custom log fn ``"(scope) [level]: msg"``
(``src/main.zig:15-18``).
"""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "(%(name)s) [%(levelname)s]: %(message)s"
_configured = False


def _configure_root() -> None:
    global _configured
    if _configured:
        return
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT))
    root = logging.getLogger("fontrx")
    root.addHandler(handler)
    root.propagate = False
    level = os.environ.get("FONTRX_LOG", "WARNING").upper()
    root.setLevel(getattr(logging, level, logging.WARNING))
    _configured = True


def get_logger(scope: str) -> logging.Logger:
    """Return a logger scoped under the ``fontrx`` namespace.

    Scopes in use mirror the reference's: ``Font``, ``Glyph``, ``Engine``,
    ``CacheManager``, ``Config``, ``timer``, ``renderGlyph``.
    """
    _configure_root()
    return logging.getLogger(f"fontrx.{scope}")
