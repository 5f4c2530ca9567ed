"""Parallel layer: multi-host runtime init + spatial-sharding parity.

The reference's distributed layer is SLURM rank env + NCCL DDP
(DCVC-family/DCVC/train_dcvc_sq_2to7_data_ddp.py:501-521); here the
equivalents are jax.distributed (multi-host runtime) and GSPMD sharding
over a Mesh.  DDP's correctness is implicitly pinned by allreduce
semantics; GSPMD's spatial axis inserts halo exchanges for the convs,
so the parity must be asserted explicitly.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from opendcvc_tpu.parallel.mesh import make_mesh

_INIT_SNIPPET = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["OPENDCVC_TPU_COORDINATOR"] = "localhost:%d"
os.environ["OPENDCVC_TPU_NUM_PROCS"] = "1"
os.environ["OPENDCVC_TPU_PROC_ID"] = "0"
import jax, jax.numpy as jnp
# a sitecustomize may have pre-imported jax with a device-plugin
# platform; the env var alone is then ineffective (and a busy/dead
# device tunnel would hang backend init) — the config update is
# authoritative as long as no backend exists yet
jax.config.update("jax_platforms", "cpu")
from opendcvc_tpu.parallel.mesh import init_distributed, make_mesh
init_distributed()
assert jax.process_count() == 1, jax.process_count()
assert jax.process_index() == 0
init_distributed()  # idempotent
mesh = make_mesh()
x = jnp.arange(8.0)
print("dist ok", float(x.sum()), dict(zip(mesh.axis_names,
                                          mesh.devices.shape)))
"""


def test_init_distributed_single_process():
    """init_distributed joins a (1-process) jax.distributed cluster from
    the OPENDCVC_TPU_* env, is idempotent, and leaves make_mesh working.
    Runs in a subprocess because the runtime must initialize before the
    first backend touch (this test process already holds the virtual
    CPU mesh)."""
    port = 17645
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, "-c", _INIT_SNIPPET % port],
        capture_output=True, text=True, timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "dist ok 28.0" in r.stdout, r.stdout


@pytest.mark.slow
def test_spatial_sharded_dmc_decode_parity_1080p():
    """The decode-side NN (latent -> feature -> reconstructed frame)
    sharded over the mesh 'spatial' axis must reproduce the unsharded
    result at a real 1080p geometry — this pins GSPMD's halo exchanges
    for every conv in the decode path (the sp axis partitions H; each
    3x3 conv needs its neighbour's boundary rows).  Reference decode
    stages: video_model.py:100-163."""
    from opendcvc_tpu.models.dmc import (dmc_init, _stage_feature,
                                         _stage_recon_x)

    params = dmc_init(jax.random.PRNGKey(0))
    H, W = 1088, 1920  # padded 1080p; latent 1/16, ctx 1/8
    yh, yw = H // 16, W // 16
    rng = np.random.default_rng(0)
    y_hat = jnp.asarray(rng.normal(0, 1, (1, yh, yw, 128)), jnp.float32)
    ctx = jnp.asarray(rng.normal(0, 1, (1, 2 * yh, 2 * yw, 256)),
                      jnp.float32)
    qp = jnp.int32(21)

    def decode_nn(p, y_hat, ctx, qp):
        feat = _stage_feature(p, y_hat, ctx, qp)
        return _stage_recon_x(p, feat, qp)

    ref = jax.jit(decode_nn)(params, y_hat, ctx, qp)
    ref.block_until_ready()

    mesh = make_mesh(jax.devices()[:8], axis_shapes=(2, 4))
    sp = NamedSharding(mesh, P(None, "spatial", None, None))
    repl = NamedSharding(mesh, P())
    sharded = jax.jit(decode_nn,
                      in_shardings=(repl, sp, sp, repl),
                      out_shardings=repl)(params, y_hat, ctx, qp)
    sharded.block_until_ready()

    a = np.asarray(ref, np.float32)
    b = np.asarray(sharded, np.float32)
    # identical math, different reduction layout: f32 conv accumulation
    # order may differ at halo boundaries
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
