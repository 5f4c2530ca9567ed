"""Device-mesh helpers.

The reference's distributed layer is NCCL DDP (reference:
DCVC-family/DCVC/train_dcvc_sq_2to7_data_ddp.py:514-521); the TPU-native
equivalent is a jax.sharding.Mesh with a data axis (gradients reduced by
XLA collectives over ICI) plus a spatial axis for partitioning large
frames across chips (GSPMD inserts halo exchanges for the convs).
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
