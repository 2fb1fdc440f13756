"""Logging setup (reference registration/train.py:208-209: FileHandler to
<work_dir>/train.log + StreamHandler)."""

from __future__ import annotations

import logging
import os


def setup_logging(log_dir: str | None = None, filename: str = "train.log"):
    handlers = [logging.StreamHandler()]
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        handlers.append(logging.FileHandler(os.path.join(log_dir, filename)))
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(message)s",
        handlers=handlers,
        force=True,
    )
    return logging.getLogger("houv_tpu")
