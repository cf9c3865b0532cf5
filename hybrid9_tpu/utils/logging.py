"""Structured logging.

Replaces the reference's unstructured ``WRITE(*,*)`` progress lines
(e.g. INIT.f90:44,476; HYBRID9.f90:509,571) with standard Python logging;
one logger per module, host-rank-tagged under multi-host runs.
"""

from __future__ import annotations

import logging
import os
import sys


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logging.getLogger("hybrid9_tpu").handlers:
        root = logging.getLogger("hybrid9_tpu")
        handler = logging.StreamHandler(sys.stderr)
        rank = os.environ.get("JAX_PROCESS_INDEX", "0")
        handler.setFormatter(logging.Formatter(
            f"%(asctime)s [h9tpu r{rank}] %(levelname)s %(name)s: "
            "%(message)s", datefmt="%H:%M:%S"))
        root.addHandler(handler)
        root.setLevel(os.environ.get("H9TPU_LOGLEVEL", "INFO"))
    return logger
