"""Numerical parity vs the reference PyTorch implementation.

Imports the reference modules (read-only, CPU) as a test oracle:
instantiates a randomly-initialised reference DMCI, ports its state
dict through utils/port_torch.py, and checks that this framework's
compiled stages reproduce the reference's pure-torch forward math
(reference: src/models/image_model.py:143-184 compress path).

This validates end-to-end wiring — channel orders across pixel
(un)shuffle, block structure, prior separation, checkerboard masks —
not just per-layer conv arithmetic. Skipped when the reference tree
is not present.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")),
    reason="reference tree not available")


@pytest.fixture(scope="module")
def torch_ref():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.models.image_model import DMCI as TorchDMCI
    torch.manual_seed(7)
    net = TorchDMCI()
    # non-trivial quant banks so the q_scale gather path is exercised
    with torch.no_grad():
        for qb in (net.q_scale_enc, net.q_scale_dec):
            qb.mul_(torch.rand_like(qb) * 0.5 + 0.75)
    net.eval()
    return torch, net


def _t2j(t):
    return np.ascontiguousarray(
        t.detach().numpy().transpose(0, 2, 3, 1))


def test_dmci_parity_with_reference_torch(torch_ref):
    torch, tnet = torch_ref
    import jax.numpy as jnp
    from opendcvc_tpu.models.dmci import DMCI
    from opendcvc_tpu.models import dmci as M
    from opendcvc_tpu.utils.port_torch import port_dmci

    qp = 37
    rng = np.random.default_rng(3)
    x_np = rng.random((1, 64, 96, 3), dtype=np.float32)

    # ---- reference forward math (pure torch, CPU) ----
    with torch.no_grad():
        x_t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        q_enc_t = tnet.q_scale_enc[qp:qp + 1]
        q_dec_t = tnet.q_scale_dec[qp:qp + 1]
        y_t = tnet.enc(x_t, q_enc_t)
        z_t = tnet.hyper_enc(tnet.pad_for_y(y_t))
        z_hat_t = torch.round(z_t)
        params_t = tnet.y_prior_fusion(tnet.hyper_dec(z_hat_t))
        params_t = params_t[:, :, :y_t.shape[2], :y_t.shape[3]]
        out = tnet.compress_prior_4x(
            y_t, params_t, tnet.y_spatial_prior_reduction,
            tnet.y_spatial_prior_adaptor_1, tnet.y_spatial_prior_adaptor_2,
            tnet.y_spatial_prior_adaptor_3, tnet.y_spatial_prior)
        y_hat_t = out[-1]
        x_hat_t = tnet.dec(y_hat_t, q_dec_t).clamp(0, 1)

    # ---- this framework, same weights ----
    net = DMCI()
    net.load_params(port_dmci(tnet.state_dict()))
    net.update()
    p = net.params

    x_j = jnp.asarray(x_np)
    y_j, z_hat_j, _ = M._stage_enc_front(p, x_j, np.int32(qp))

    # encoder tower output: deep conv stack, fp32 both sides
    y_ref = _t2j(y_t)
    assert np.max(np.abs(np.asarray(y_j) - y_ref)) < 5e-3, \
        np.max(np.abs(np.asarray(y_j) - y_ref))

    # hyperprior integer plane must agree exactly (rounding boundaries
    # are far from ties at these seeds)
    assert np.array_equal(np.asarray(z_hat_j), _t2j(z_hat_t))

    # full compress (entropy coding included) then compare recon
    enc = net.compress(x_np, qp)
    x_hat_ref = _t2j(x_hat_t)
    diff = np.abs(np.asarray(enc["x_hat"], np.float32) - x_hat_ref)
    assert np.mean(diff) < 1e-3 and np.percentile(diff, 99.9) < 2e-2, \
        (float(np.mean(diff)), float(np.max(diff)))

    # and the stream round-trips through our decoder to the same recon
    dec_net = DMCI()
    dec_net.load_params(p)
    dec_net.update()
    sps = {"sps_id": 0, "height": 64, "width": 96, "ec_part": 0,
           "use_ada_i": 0}
    dec = dec_net.decompress(enc["bit_stream"], sps, qp)
    assert np.array_equal(np.asarray(dec["x_hat"], np.float32),
                          np.asarray(enc["x_hat"], np.float32))


def test_dmc_port_shapes(torch_ref):
    """The video-model porter maps every reference parameter (no keys
    missed, every tensor lands with transposed shape)."""
    torch, _ = torch_ref
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.models.video_model import DMC as TorchDMC
    from opendcvc_tpu.models.dmc import DMC
    from opendcvc_tpu.utils.port_torch import port_dmc
    import jax

    torch.manual_seed(11)
    tnet = TorchDMC()
    ported = port_dmc(tnet.state_dict())

    net = DMC()
    ours = net.init_params(seed=0)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(ported)
    flat_o, _ = jax.tree_util.tree_flatten_with_path(ours)
    assert len(flat_p) == len(flat_o)
    shapes_p = {jax.tree_util.keystr(k): v.shape for k, v in flat_p}
    shapes_o = {jax.tree_util.keystr(k): v.shape for k, v in flat_o}
    assert shapes_p == shapes_o
    # every torch parameter consumed
    n_torch = len(tnet.state_dict())
    assert len(flat_p) == n_torch, (len(flat_p), n_torch)
