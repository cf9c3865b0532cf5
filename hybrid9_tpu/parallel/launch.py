"""Multi-host launch helpers.

TPU-native replacement for the reference's SLURM + mpirun launch path
(EXECUTE/slurm_submit:17-21,71-90; MPI_INIT at INIT.f90:26-38): one Python
process per host calls :func:`initialize_distributed`; JAX's coordination
service plays the role of MPI_COMM_WORLD, and GSPMD handles all data
placement afterwards — there is no token-ring config read (INIT.f90:
167-244) because every host parses the same declarative Config.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from ..utils.logging import get_logger

log = get_logger(__name__)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialise JAX's distributed runtime when running multi-host.

    No-op for single-host runs (including the virtual-device CPU mesh used
    in tests).  Arguments default to the standard JAX environment
    variables, so TPU pod slices need no explicit configuration.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        log.info("single-process run: skipping jax.distributed")
        return
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info("distributed initialised: process %d/%d, %d local / %d "
             "global devices", jax.process_index(), num_processes,
             jax.local_device_count(), jax.device_count())


def host_shard_bounds(n: int) -> tuple[int, int]:
    """[start, end) slice of the packed cell axis owned by this host.

    The multi-host analog of the per-rank hyperslab each reference rank
    reads for itself (READ_NET_CDF_3DR.f90:95-97): each host ingests only
    its own cells and jax.make_array_from_process_local_data assembles the
    global array.
    """
    p = jax.process_count()
    i = jax.process_index()
    if n % p != 0:
        raise ValueError(
            f"padded cell count {n} not divisible by host count {p}; "
            f"set Config.cell_block to a multiple of {p} (cells are "
            f"padded to a cell_block multiple, so any such block size "
            f"makes the shard split exact)")
    per = n // p
    return i * per, (i + 1) * per
