"""Configuration, paths and logging for pyvisim_tpu.

Capability parity with the reference's constants module + YAML logging
bootstrap (reference: pyvisim/_config.py:8-31), redesigned as plain Python
(no YAML dependency on the hot path) with env-var overrides.
"""
from __future__ import annotations

import logging
import logging.handlers
import os
import pathlib

ROOT = pathlib.Path(__file__).parent
RES_FOLDER = ROOT / "res"
MODEL_FILES_PATH = RES_FOLDER / "model_files"

_LOG_DIR_ENV = "PYVISIM_TPU_LOG_DIR"
_CACHE_DIR_ENV = "PYVISIM_TPU_CACHE_DIR"


def log_dir() -> pathlib.Path:
    d = pathlib.Path(os.environ.get(_LOG_DIR_ENV, str(ROOT.parent / "res" / "logs")))
    return d


def cache_dir() -> pathlib.Path:
    """Root cache dir for datasets (reference caches under
    platformdirs.user_cache_dir('pyvisim'); reference: pyvisim/datasets/datasets.py:24)."""
    env = os.environ.get(_CACHE_DIR_ENV)
    if env:
        return pathlib.Path(env)
    try:
        from platformdirs import user_cache_dir

        return pathlib.Path(user_cache_dir("pyvisim_tpu"))
    except Exception:  # pragma: no cover - platformdirs is expected to exist
        return pathlib.Path.home() / ".cache" / "pyvisim_tpu"


_LOGGING_CONFIGURED = False


def setup_logging(level: int = logging.WARNING, log_to_file: bool = True) -> None:
    """Configure package logging: console + optional rotating file handler.

    Mirrors the reference's rotating-file + console setup
    (reference: pyvisim/res/logging_config.yaml, pyvisim/_config.py:19-31)
    without a YAML dependency. Idempotent.
    """
    global _LOGGING_CONFIGURED
    if _LOGGING_CONFIGURED:
        return
    logger = logging.getLogger("pyvisim_tpu")
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    console = logging.StreamHandler()
    console.setFormatter(fmt)
    logger.addHandler(console)
    if log_to_file:
        try:
            d = log_dir()
            d.mkdir(parents=True, exist_ok=True)
            fh = logging.handlers.RotatingFileHandler(
                d / "pyvisim_tpu.log", maxBytes=256 * 1024, backupCount=1
            )
            fh.setFormatter(fmt)
            logger.addHandler(fh)
        except OSError:
            pass
    _LOGGING_CONFIGURED = True


def get_logger(name: str) -> logging.Logger:
    setup_logging()
    return logging.getLogger(f"pyvisim_tpu.{name}")
