"""Logging setup (reference ``utils/logging_config.py`` analogue).

The reference configures a package logger with console + optional file
handlers and a level knob. Spark adds one twist: the JVM side logs through
log4j, not Python logging — ``configure_logging`` handles both so one call
quiets (or opens up) the whole engine.
"""

from __future__ import annotations

import logging
import sys

__all__ = ["configure_logging", "get_logger"]

_PKG = "pandera_unified_validator_spark"
_FORMAT = "%(asctime)s %(levelname)s %(name)s: %(message)s"


def configure_logging(
    level: int | str = logging.INFO,
    log_file: str | None = None,
    spark=None,
    spark_level: str = "WARN",
) -> logging.Logger:
    """Configure the package logger (idempotent — handlers are replaced,
    not stacked). When a SparkSession is passed, the JVM log4j level is set
    too (Python logging cannot reach executor/driver JVM logs)."""
    logger = logging.getLogger(_PKG)
    logger.setLevel(level if isinstance(level, int) else level.upper())
    # close before clearing: repeated reconfiguration with log_file would
    # otherwise leak one open file descriptor per call
    for h in logger.handlers:
        h.close()
    logger.handlers.clear()
    fmt = logging.Formatter(_FORMAT)
    console = logging.StreamHandler(sys.stderr)
    console.setFormatter(fmt)
    logger.addHandler(console)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    if spark is not None:
        spark.sparkContext.setLogLevel(spark_level)
    return logger


def get_logger(name: str | None = None) -> logging.Logger:
    """Child logger under the package namespace."""
    return logging.getLogger(f"{_PKG}.{name}" if name else _PKG)
