"""Device-mesh helpers.

The reference's distributed layer is NCCL DDP (reference:
DCVC-family/DCVC/train_dcvc_sq_2to7_data_ddp.py:514-521); the TPU-native
equivalent is a jax.sharding.Mesh with a data axis (gradients reduced by
XLA collectives over ICI) plus a spatial axis for partitioning large
frames across chips (GSPMD inserts halo exchanges for the convs).
"""

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None):
    """Multi-host (DCN) runtime init — the TPU-native analogue of the
    reference's rank-env + NCCL process-group setup
    (DCVC-family/DCVC/train_dcvc_sq_2to7_data_ddp.py:501-521).

    After this, jax.devices() spans every host's chips and make_mesh()
    builds a global mesh; GSPMD then routes dp gradient reductions and
    sp halo exchanges over ICI within a slice and DCN across slices —
    no application-level NCCL/MPI calls.

    Arguments fall back to env: OPENDCVC_TPU_COORDINATOR (host:port),
    OPENDCVC_TPU_NUM_PROCS, OPENDCVC_TPU_PROC_ID, then the SLURM vars
    the reference uses (SLURM_NTASKS / SLURM_PROCID, coordinator from
    MASTER_ADDR:MASTER_PORT).  On TPU pods all of this is autodetected
    by jax.distributed and every argument may be None.  Idempotent:
    repeated calls are no-ops.  Gate startup with OPENDCVC_TPU_DIST=1
    so single-host runs never pay the coordinator round-trip.
    """
    if getattr(init_distributed, "_done", False):
        return
    if coordinator_address is None:
        coordinator_address = os.environ.get("OPENDCVC_TPU_COORDINATOR")
        if coordinator_address is None and os.environ.get("MASTER_ADDR"):
            coordinator_address = (os.environ["MASTER_ADDR"] + ":"
                                   + os.environ.get("MASTER_PORT", "1234"))
    if num_processes is None:
        v = os.environ.get("OPENDCVC_TPU_NUM_PROCS",
                           os.environ.get("SLURM_NTASKS"))
        num_processes = int(v) if v is not None else None
    if process_id is None:
        v = os.environ.get("OPENDCVC_TPU_PROC_ID",
                           os.environ.get("SLURM_PROCID"))
        process_id = int(v) if v is not None else None
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)
    init_distributed._done = True


def maybe_init_distributed():
    """Call init_distributed() iff OPENDCVC_TPU_DIST is truthy; entry
    points call this so multi-host launches need only set the env."""
    from ..utils.common import env_flag
    if env_flag("OPENDCVC_TPU_DIST"):
        init_distributed()


def make_mesh(devices=None, axis_shapes=None, axis_names=("data", "spatial")):
    """Build a mesh over the available devices.

    axis_shapes: tuple matching axis_names; -1 entries are inferred.
    Default: all devices on 'data', 1 on 'spatial'.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_shapes is None:
        axis_shapes = (n, 1)
    shapes = list(axis_shapes)
    known = int(np.prod([s for s in shapes if s != -1]))
    for i, s in enumerate(shapes):
        if s == -1:
            shapes[i] = n // known
    assert int(np.prod(shapes)) == n, (shapes, n)
    dev_array = np.array(devices).reshape(shapes)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh, spatial_axis=None):
    """NHWC batch sharding: batch over 'data', optionally H over 'spatial'."""
    if spatial_axis:
        return NamedSharding(mesh, P("data", "spatial", None, None))
    return NamedSharding(mesh, P("data", None, None, None))


def replicate_sharding(mesh):
    return NamedSharding(mesh, P())
